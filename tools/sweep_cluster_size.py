"""Sweep cluster size C and per-round candidate count MAXC for the
pair-sweep traversal on the 2M-tri heightfield (tools/bench_accel.py's
fixture) on the real device.

Motivation (round-3 profile, tools/profile_accel.py): every stage of the
pairs round is OVERHEAD-bound, not flops/bytes-bound — the Pallas sweep
averages ~3 us/grid-step against ~0.2 us of VPU math, and the [B,K] cull /
top_k(W) / [B,BLOCK,W] refine each burn ~30-40 ms at <5% of the HBM
roofline. Larger clusters shrink ALL of it at once: K (cull matrix,
top_k), W (refine lanes), and the sweep grid (B x MAXC), trading cheap
extra MT tests for fewer fixed-cost steps.

BVH order is cached in .cache/ so re-runs skip the host build.

Usage: python tools/sweep_cluster_size.py [--tris 2000000] [--rays 131072]
       [--configs 128:64 256:32 512:16 512:8]
"""
from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def heightfield(tris, rng):
    side = int(np.sqrt(tris / 2))
    g = np.linspace(0, 10, side + 1)
    X, Y = np.meshgrid(g, g, indexing="ij")
    Z = np.sin(X * 1.7) * np.cos(Y * 1.3) + 0.1 * rng.standard_normal(X.shape)
    P = np.stack([X, Z, Y], -1).astype(np.float32)
    a = P[:-1, :-1].reshape(-1, 3)
    b = P[1:, :-1].reshape(-1, 3)
    c = P[:-1, 1:].reshape(-1, 3)
    d4 = P[1:, 1:].reshape(-1, 3)
    v0 = np.concatenate([a, b])
    e1 = np.concatenate([b - a, d4 - b])
    e2 = np.concatenate([c - a, c - b])
    return v0, e1, e2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=2_000_000)
    ap.add_argument("--rays", type=int, default=131_072)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--configs", nargs="*", default=["128:64", "256:32", "512:16", "512:8", "1024:8"])
    ap.add_argument("--check", action="store_true", help="verify hit equality across configs")
    ap.add_argument("--diffuse", action="store_true", help="bounce-like rays (surface origins, cosine hemisphere)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from akari_render_tpu.accel import pairs as pairs_mod
    from akari_render_tpu.accel.bvh import build_bvh
    from akari_render_tpu.accel.cluster import build_clusters
    from akari_render_tpu.accel.pairs import intersect_pairs

    rng = np.random.default_rng(0)
    v0, e1, e2 = heightfield(args.tris, rng)
    print(f"soup: {len(v0)} tris", flush=True)

    cache = Path(__file__).resolve().parent.parent / ".cache"
    cache.mkdir(exist_ok=True)
    ofile = cache / f"hf_order_{len(v0)}.npy"
    if ofile.exists():
        order = np.load(ofile)
        print("bvh order: cached", flush=True)
    else:
        t0 = time.time()
        bvh = build_bvh(v0, e1, e2)
        order = np.asarray(bvh.order)
        np.save(ofile, order)
        print(f"bvh build: {time.time()-t0:.1f}s", flush=True)

    n = args.rays
    lo = v0.min(axis=0)
    hi = v0.max(axis=0)
    if args.diffuse:
        # bounce-like: origins ON the surface (top-down projection), cosine
        # hemisphere around +y — mostly hits, sky-escapes exit the shallow
        # scene AABB quickly (the realistic miss pattern)
        gx = rng.uniform(lo[0], hi[0], n).astype(np.float32)
        gz = rng.uniform(lo[2], hi[2], n).astype(np.float32)
        gy = (np.sin(gx * 1.7) * np.cos(gz * 1.3)).astype(np.float32)
        o = np.stack([gx, gy + 0.01, gz], -1)
        r1, r2 = rng.uniform(0, 1, n), rng.uniform(0, 1, n)
        st = np.sqrt(r1)
        phi = 2 * np.pi * r2
        d = np.stack([st * np.cos(phi), np.sqrt(1 - r1), st * np.sin(phi)],
                     -1).astype(np.float32)
    else:
        # primary-like: spread origins above, downward cone (bench_accel.py)
        o = np.stack([
            rng.uniform(lo[0], hi[0], n), np.full(n, hi[1] + 3.0),
            rng.uniform(lo[2], hi[2], n),
        ], -1).astype(np.float32)
        d = np.stack([rng.normal(0, 0.25, n), -np.ones(n),
                      rng.normal(0, 0.25, n)], -1).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.asarray(o)
    d = jnp.asarray(d)
    tmin = jnp.zeros(n)
    tmax = jnp.full(n, 1e20)

    ref_t = ref_id = None
    for spec in args.configs:
        c_size, maxc = (int(x) for x in spec.split(":"))
        t0 = time.time()
        cl = build_clusters(v0, e1, e2, order, cluster_size=c_size)
        bt = time.time() - t0

        run_j = jax.jit(
            lambda o, d: intersect_pairs(cl, o, d, tmin, tmax, maxc=maxc)
        )

        def run():
            return run_j(o, d)

        hit = run()
        jax.block_until_ready(hit.t)
        t0 = time.time()
        for _ in range(args.reps):
            hit = run()
            jax.block_until_ready(hit.t)
        dt = (time.time() - t0) / args.reps
        mrs = n / dt / 1e6
        line = (f"C={c_size:5d} MAXC={maxc:3d} K={cl.num_clusters:6d}: "
                f"{dt*1e3:8.1f} ms  {mrs:6.3f} Mrays/s  (build {bt:.1f}s)")
        if args.check:
            if ref_t is None:
                ref_t, ref_id = np.asarray(hit.t), np.asarray(hit.tri_id)
                line += "  [reference]"
            else:
                same_id = float(np.mean(np.asarray(hit.tri_id) == ref_id))
                dt_max = float(np.max(np.abs(np.asarray(hit.t) - ref_t)))
                line += f"  [id match {same_id:.6f}, max |dt| {dt_max:.2e}]"
        print(line, flush=True)


if __name__ == "__main__":
    main()
