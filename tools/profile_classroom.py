"""Classroom traversal + shade stage decomposition on the real chip.

The classroom pass costs ~1.1 s per bounce per 262k-lane dispatch
(round-4 measurement: 108 s for one 1080p spp at depth 12 over 8 pixel
blocks) while cbox runs 14 ms per bounce per 1M lanes — ~300x per lane.
This tool times the classroom bounce's pieces in isolation:

  - scene.intersect on a camera-ray batch (full pairs traversal)
  - scene.occlude on the same batch
  - _cull_einit + walk-order argsort alone (the once-per-intersect part)
  - dispatch_shade on classroom's 4 sorted kinds
  - surface_interaction

Usage: python3 tools/profile_classroom.py [--lanes 262144]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timed(fn, *args, reps=2):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=262144)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from akari_render_tpu.camera import generate_rays
    from akari_render_tpu.scene import load_scene

    out = {}
    scene = load_scene("/root/repo/scenes/classroom/scene.json")
    a = scene.arrays
    K = int(a.unified.cbmin.shape[0]) if a.unified is not None else (
        a.bvh["clusters"].num_clusters if a.bvh is not None else 0
    )
    out["clusters"] = K
    out["kinds"] = len(scene.kinds)
    print(f"# K={K} kinds={len(scene.kinds)} tris={scene.num_tris}",
          file=sys.stderr)

    n = args.lanes
    w = scene.camera.width
    pix = jnp.arange(n, dtype=jnp.uint32)
    p_film = jnp.stack(
        [(pix % w).astype(jnp.float32), (pix // w).astype(jnp.float32)], -1
    ) + 0.5
    ray_o, ray_d = generate_rays(scene.camera, p_film)
    tmin = jnp.zeros((n,))
    tmax = jnp.full((n,), 1e30)

    @jax.jit
    def isect(o, d):
        h = scene.intersect(o, d, tmin, tmax)
        return h.t

    dt = timed(isect, ray_o, ray_d)
    out["intersect_ms"] = round(dt * 1e3, 1)
    print(f"# intersect({n}): {dt*1e3:.1f} ms "
          f"({n/dt/1e6:.3f} Mrays/s)", file=sys.stderr)

    @jax.jit
    def occl(o, d):
        return scene.occlude(o, d, tmin, jnp.full((n,), 10.0))

    dt = timed(occl, ray_o, ray_d)
    out["occlude_ms"] = round(dt * 1e3, 1)
    print(f"# occlude({n}): {dt*1e3:.1f} ms", file=sys.stderr)

    # shade dispatch at classroom's sorted kinds
    from akari_render_tpu.core.math import normalize
    from akari_render_tpu.core.sampling import mis_weight
    from akari_render_tpu.integrators.common import dispatch_shade

    h = isect(ray_o, ray_d)
    hit = scene.intersect(ray_o, ray_d, tmin, tmax)
    si = scene.surface_interaction(jnp.maximum(hit.tri_id, 0), hit.bary)
    si = jax.tree_util.tree_map(jax.device_put, si)
    import jax.random as jr

    wo = normalize(jr.normal(jr.PRNGKey(2), (n, 3)))
    u_bsdf = jr.uniform(jr.PRNGKey(3), (n, 3))
    ls_wi = normalize(jr.normal(jr.PRNGKey(4), (n, 3)))

    def shade(closure, ex):
        outp = {}
        f_l, pdf_l = closure.evaluate(ex["wo"], ex["ls_wi"])
        wgt = mis_weight(1.0, pdf_l)
        outp["direct"] = f_l * wgt[..., None]
        s = closure.sample(ex["wo"], ex["u_bsdf"][..., 0], ex["u_bsdf"][..., 1:])
        outp["f"], outp["pdf"] = s["f"], s["pdf"]
        outp["albedo"] = closure.albedo(ex["wo"])
        return outp

    @jax.jit
    def shade_once(wo, u_bsdf, ls_wi):
        sh = dispatch_shade(
            scene, si, {"wo": wo, "u_bsdf": u_bsdf, "ls_wi": ls_wi}, shade
        )
        return sh["f"]

    dt = timed(shade_once, wo, u_bsdf, ls_wi)
    out["dispatch_shade_ms"] = round(dt * 1e3, 1)
    print(f"# dispatch_shade({n}, sorted {len(scene.kinds)} kinds): "
          f"{dt*1e3:.1f} ms", file=sys.stderr)

    @jax.jit
    def si_only(t_ids, bary):
        s = scene.surface_interaction(t_ids, bary)
        return s["p"]

    dt = timed(si_only, jnp.maximum(hit.tri_id, 0), hit.bary)
    out["surface_interaction_ms"] = round(dt * 1e3, 1)
    print(f"# surface_interaction: {dt*1e3:.1f} ms", file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
