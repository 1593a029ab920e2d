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


def _enable_compilation_cache():
    """Persistent XLA compilation cache (AKR_XLA_CACHE=0 disables).

    Measured through the remote-TPU relay: a 13 s compile replays in 1.5 s
    from a second process — renders/benches/tests of unchanged code skip
    their (minutes-long, for the big integrator graphs) compiles entirely.
    Keyed by HLO hash, so code changes safely miss."""
    import os

    if os.environ.get("AKR_XLA_CACHE", "1") == "0":
        return
    cache = os.environ.get("AKR_CACHE_DIR") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache"
    )
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", os.path.join(cache, "xla"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass  # old jax without the knobs: run uncached


_enable_compilation_cache()
