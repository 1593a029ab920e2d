"""akari_render_tpu — a TPU-native physically-based renderer.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
shiinamiyuki/akari_render (Rust + LuisaCompute): scenegraph JSON loading,
Cycles shader-graph subset compilation, wavefront path tracing with NEE+MIS,
Kelemen PSSMLT, gradient-domain PT, and AOV rendering — with multi-chip
data-parallel sharding over `jax.sharding.Mesh`.

Layering (mirrors reference /root/reference SURVEY.md layer map):
  scenegraph/  — scene-description model + IO      (ref: crates/akari_scenegraph)
  core/        — math, sampling, color, film, rng  (ref: crates/akari_render utils)
  accel/       — BVH build + ray traversal         (ref: LuisaCompute rtx::Accel)
  svm/         — shader graph compiler + BSDFs     (ref: crates/akari_render/src/svm)
  integrators/ — pt / mcmc / gpt / aov             (ref: crates/akari_integrator)
  parallel/    — multi-chip sharding               (new; reference is single-device)
"""

__version__ = "0.1.0"
