"""Diffuse-bounce traversal decomposition on the real chip (round-5 tool).

The classroom wall is the pair sweep on INCOHERENT rays (VERDICT r4 weak #1:
"block-coherence of the pair sweep on diffuse bounce rays"). This tool
replays that exact regime in isolation:

  1. camera rays -> first hits (coherent; baseline timing)
  2. cosine-hemisphere bounce rays from those hits (the incoherent regime)
  3. times intersect() on both ray sets
  4. instruments the cursor walk: per-block round counts, candidate counts
     (kcnt), swept-candidate totals, live-block occupancy per round --
     the lockstep-waste evidence the round structure hides.

Usage: python3 tools/profile_diffuse.py [--lanes 262144] [--scene path]
Env: the usual AKR_BLOCK / AKR_MAXC / AKR_SWEEP_G knobs apply (import-time).
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timed(fn, *args, reps=3):
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
    ap.add_argument("--scene", default="/root/repo/scenes/classroom/scene.json")
    ap.add_argument("--skip-walk-stats", action="store_true")
    ap.add_argument("--key-modes", default="")
    ap.add_argument("--skip-timing", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import jax.random as jr
    import numpy as np

    from akari_render_tpu.camera import generate_rays
    from akari_render_tpu.core.math import normalize
    from akari_render_tpu.scene import load_scene

    out = {}
    scene = load_scene(args.scene)
    a = scene.arrays
    if a.unified is not None:
        cl = a.unified
    elif a.bvh is not None:
        cl = a.bvh["clusters"]
    else:
        print(json.dumps({"error": "no cluster accel"}))
        return
    K = int(cl.cbmin.shape[0])
    out["clusters"] = K
    print(f"# K={K} tris={scene.num_tris}", file=sys.stderr)

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
    def isect(o, d, tmx):
        h = scene.intersect(o, d, tmin, tmx)
        return h

    hit = isect(ray_o, ray_d, tmax)
    jax.block_until_ready(hit)
    dt = timed(lambda: isect(ray_o, ray_d, tmax).t)
    out["coherent_ms"] = round(dt * 1e3, 1)
    out["coherent_mrays_s"] = round(n / dt / 1e6, 3)
    print(f"# coherent intersect({n}): {dt*1e3:.1f} ms "
          f"({n/dt/1e6:.3f} Mrays/s)", file=sys.stderr)

    # build diffuse bounce rays: cosine hemisphere about the hit normal
    si = scene.surface_interaction(jnp.maximum(hit.tri_id, 0), hit.bary)
    p = si["p"]
    ns = si["ns"]
    u = jr.uniform(jr.PRNGKey(7), (n, 2))
    r = jnp.sqrt(u[:, 0])
    phi = 2 * jnp.pi * u[:, 1]
    lx, ly = r * jnp.cos(phi), r * jnp.sin(phi)
    lz = jnp.sqrt(jnp.maximum(0.0, 1 - u[:, 0]))
    # frame about ns
    up = jnp.where(jnp.abs(ns[:, 2:3]) < 0.999,
                   jnp.array([0.0, 0.0, 1.0]), jnp.array([1.0, 0.0, 0.0]))
    t1 = normalize(jnp.cross(up, ns))
    t2 = jnp.cross(ns, t1)
    d2 = normalize(t1 * lx[:, None] + t2 * ly[:, None] + ns * lz[:, None])
    o2 = p + ns * 1e-3
    live = hit.valid
    tmax2 = jnp.where(live, 1e30, -1.0)  # dead lanes trace dead, like the pass

    dt = timed(lambda: isect(o2, d2, tmax2).t)
    out["diffuse_ms"] = round(dt * 1e3, 1)
    out["diffuse_mrays_s"] = round(n / dt / 1e6, 3)
    out["live_frac"] = round(float(jnp.mean(live.astype(jnp.float32))), 3)
    print(f"# diffuse intersect({n}, {out['live_frac']*100:.0f}% live): "
          f"{dt*1e3:.1f} ms ({n/dt/1e6:.3f} Mrays/s)", file=sys.stderr)

    if args.skip_walk_stats:
        print(json.dumps(out))
        return

    # ---- walk instrumentation: replicate intersect_pairs' cull + cursor
    # walk on the HOST (numpy) from the device-computed e_init, counting
    # per-round live blocks and swept candidates. Exact same advance logic.
    from akari_render_tpu.accel import pairs as P

    modes = args.key_modes.split(",") if args.key_modes else [None]
    for name, (o_, d_, tmx_) in {
        "coherent": (ray_o, ray_d, tmax),
        "diffuse": (o2, d2, tmax2),
    }.items():
        for mode in modes:
            st = walk_stats(P, cl, o_, d_, tmin, tmx_, scene, key_mode=mode)
            tag = f"walk_{name}" + (f"[{mode}]" if mode else "")
            out[tag] = st
            print(f"# {tag}: {st}", file=sys.stderr)

    print(json.dumps(out))


def walk_stats(P, cl, o, d, tmin, tmax, scene, key_mode=None):
    """Host-side simulation of the cursor walk from the real e_init +
    per-round sweep results (runs the actual sweep via intersect on
    subsets is too slow; instead we bound rounds two ways: the optimistic
    bound assumes each round consumes a full window W, the conservative
    uses the real selection rule with kept<=MAXC; true best_t from a full
    intersect gives the final horizons)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    n = o.shape[0]
    BLOCK = P.BLOCK
    n_pad = ((n + BLOCK - 1) // BLOCK) * BLOCK
    B = n_pad // BLOCK
    K = int(cl.cbmin.shape[0])

    finite = jnp.isfinite(o).all(-1) & jnp.isfinite(d).all(-1)
    o = jnp.where(finite[:, None], o, 0.0)
    d = jnp.where(finite[:, None], d, 1.0)
    tmax = jnp.where(finite, tmax, -1.0)
    scene_lo = cl.cbmin.min(axis=0)
    scene_hi = cl.cbmax.max(axis=0)
    keys = P._morton_keys(o, d, scene_lo[None, :], scene_hi[None, :], mode=key_mode)
    keys = jnp.where(tmax <= tmin, jnp.uint32(0xFFFFFFFF), keys)
    perm = jnp.argsort(keys)
    pad = n_pad - n

    def srt(x, fill):
        return jnp.pad(x[perm], ((0, pad),) + ((0, 0),) * (x.ndim - 1),
                       constant_values=fill)

    os_ = srt(o, 0.0)
    ds_ = srt(d, 1.0)
    tmins = srt(tmin, 0.0)
    tlims = srt(jnp.minimum(tmax, 1e30), -1.0)
    ob = os_.reshape(B, BLOCK, 3)
    olo, ohi = ob.min(axis=1), ob.max(axis=1)
    inv_d = 1.0 / jnp.where(jnp.abs(ds_) < 1e-20,
                            jnp.where(ds_ < 0, -1e-20, 1e-20), ds_)
    ib = inv_d.reshape(B, BLOCK, 3)
    ilo, ihi = ib.min(axis=1), ib.max(axis=1)
    bt0 = tmins.reshape(B, BLOCK).min(axis=1)
    ent_raw, exit_raw = P._block_entries_raw(
        cl.cbmin, cl.cbmax, olo, ohi, ilo, ihi, bt0)
    e_init = jnp.where(ent_raw <= exit_raw, ent_raw, jnp.inf)

    # true best-t per lane from a full intersect (final horizon)
    hit = scene.intersect(o, d, tmin, tmax)
    t_true = jnp.where(hit.valid, hit.t, jnp.minimum(tmax, 1e30))
    ts = srt(t_true, -1.0)
    bt1_final = ts.reshape(B, BLOCK).max(axis=1)

    e = np.asarray(e_init)
    went = np.sort(e, axis=1)
    kcnt = np.isfinite(e).sum(axis=1)
    live0 = np.asarray((tlims > tmins).reshape(B, BLOCK).any(axis=1))
    bt1f = np.asarray(bt1_final)

    # candidates each block must CONSUME before its cursor passes the final
    # horizon (lower bound on total consumed; the walk consumes these over
    # ceil(consumed / W-or-less) rounds; swept ones are the <= MAXC/round)
    consumed = np.zeros(B, np.int64)
    for b in range(B):
        if not live0[b]:
            continue
        consumed[b] = np.searchsorted(went[b, : kcnt[b]], bt1f[b], "right")
    W = P.MAXC * P.WINDOW_MULT
    # optimistic rounds: every round advances a full window
    rounds_opt = np.ceil(consumed / max(W, 1)).astype(np.int64)
    # pessimistic: every round advances exactly MAXC (all selected)
    rounds_pes = np.ceil(consumed / max(P.MAXC, 1)).astype(np.int64)
    return {
        "B": int(B),
        "live_blocks": int(live0.sum()),
        "kcnt_mean": float(kcnt[live0].mean()) if live0.any() else 0.0,
        "kcnt_max": int(kcnt.max()),
        "consumed_mean": float(consumed[live0].mean()) if live0.any() else 0.0,
        "consumed_max": int(consumed.max()),
        "consumed_total": int(consumed.sum()),
        "rounds_lockstep_opt": int(rounds_opt.max()),
        "rounds_lockstep_pes": int(rounds_pes.max()),
        "rounds_sum_opt": int(rounds_opt.sum()),
        "rounds_sum_pes": int(rounds_pes.sum()),
    }


if __name__ == "__main__":
    main()
