"""Acceleration-structure throughput benchmark: 2M-triangle heightfield,
128k rays, closest-hit Mrays/s — the STATUS.md item-2 workload. Compares the
flat cluster rounds against the hierarchical supercluster cull.

    python tools/bench_accel.py [--tris 2000000] [--rays 131072] [--cpu]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def heightfield(n_tris: int):
    """Displaced grid: spatially coherent, like real scan/terrain data."""
    side = int(np.sqrt(n_tris / 2))
    x = np.linspace(-10, 10, side + 1)
    z = np.linspace(-10, 10, side + 1)
    X, Z = np.meshgrid(x, z, indexing="ij")
    Y = np.sin(X * 1.7) * np.cos(Z * 1.3) + 0.3 * np.sin(X * 7 + Z * 5)
    V = np.stack([X, Y, Z], -1).reshape(-1, 3).astype(np.float32)
    idx = []
    for i in range(side):
        base = i * (side + 1)
        for j in range(side):
            a = base + j
            b = a + side + 1
            idx.append([a, b, b + 1])
            idx.append([a, b + 1, a + 1])
    I = np.asarray(idx, np.int64)
    v0 = V[I[:, 0]]
    e1 = V[I[:, 1]] - v0
    e2 = V[I[:, 2]] - v0
    return v0, e1, e2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=2_000_000)
    ap.add_argument("--rays", type=int, default=131072)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from akari_render_tpu.accel.bvh import build_bvh
    from akari_render_tpu.accel.cluster import build_clusters, intersect_clusters

    t0 = time.time()
    v0, e1, e2 = heightfield(args.tris)
    print(f"soup: {len(v0)} tris ({time.time()-t0:.1f}s)")
    t0 = time.time()
    bvh = build_bvh(v0, e1, e2)
    cl = build_clusters(v0, e1, e2, np.asarray(bvh.order))
    print(
        f"build: {cl.num_clusters} clusters"
        + (f", {cl.sc_bmin.shape[0]} superclusters" if cl.sc_bmin is not None else "")
        + f" ({time.time()-t0:.1f}s)"
    )

    rng = np.random.default_rng(9)
    n = args.rays
    o = jnp.asarray(
        np.stack(
            [
                rng.uniform(-10, 10, n),
                np.full(n, 6.0),
                rng.uniform(-10, 10, n),
            ],
            -1,
        ).astype(np.float32)
    )
    d = np.stack(
        [rng.normal(0, 0.25, n), -np.ones(n), rng.normal(0, 0.25, n)], -1
    ).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    tmin = jnp.zeros(n)
    tmax = jnp.full(n, 1e20)

    import os

    from akari_render_tpu.accel.pairs import intersect_pairs
    from akari_render_tpu.accel.wide import attach_wide, intersect_wide

    t0 = time.time()
    clw = attach_wide(cl)
    print(f"wide-BVH build: {clw.wide.shape[0]} nodes ({time.time()-t0:.1f}s)")

    results = {}
    for mode, env in (("wide", None), ("pairs", None), ("super", "1"), ("flat", "0")):
        if mode == "super" and cl.sc_bmin is None:
            continue
        if mode == "flat" and os.environ.get("AKR_BENCH_SKIP_FLAT"):
            continue
        if mode == "wide":
            fn = jax.jit(lambda o, d: intersect_wide(clw, o, d, tmin, tmax))
        elif mode == "pairs":
            fn = jax.jit(lambda o, d: intersect_pairs(cl, o, d, tmin, tmax))
        else:
            os.environ["AKR_SUPERCLUSTERS"] = env
            fn = jax.jit(lambda o, d: intersect_clusters(cl, o, d, tmin, tmax))
        hit = fn(o, d)
        jax.block_until_ready(hit)
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            hit = fn(o, d)
            jax.block_until_ready(hit)
        dt = (time.time() - t0) / reps
        mrays = n / dt / 1e6
        results[mode] = (mrays, hit)
        print(
            f"{mode:>6}: {mrays:8.3f} Mrays/s  ({dt*1e3:.1f} ms/{n} rays, "
            f"hit rate {float(hit.valid.mean()):.3f})"
        )
    if "flat" in results:
        hf = results["flat"][1]
        for mode in ("wide", "pairs", "super"):
            if mode not in results:
                continue
            hm = results[mode][1]
            same = np.allclose(np.asarray(hm.t), np.asarray(hf.t), rtol=1e-5)
            print(
                f"{mode}: {results[mode][0]/results['flat'][0]:.2f}x over flat, "
                f"results match: {same}"
            )

    # DIFFUSE bounce rays (the round-3 target workload): origins on the
    # surface (analytic heightfield y at random (x, z)), cosine hemisphere
    # around +y — mostly short hits, sky-escapes exit the shallow AABB
    o2 = np.stack([
        rng.uniform(-10, 10, n),
        np.sin(rng.uniform(-10, 10, n) * 0.0),  # placeholder, filled below
        rng.uniform(-10, 10, n),
    ], -1).astype(np.float32)
    o2[:, 1] = (np.sin(o2[:, 0] * 1.7) * np.cos(o2[:, 2] * 1.3)
                + 0.3 * np.sin(o2[:, 0] * 7 + o2[:, 2] * 5) + 0.01)
    r1 = rng.uniform(0, 1, n)
    phi = 2 * np.pi * rng.uniform(0, 1, n)
    st = np.sqrt(r1)
    d2 = np.stack([st * np.cos(phi), np.sqrt(1 - r1), st * np.sin(phi)],
                  -1).astype(np.float32)
    o2 = jnp.asarray(o2)
    d2 = jnp.asarray(d2)
    f_diff = jax.jit(lambda o, d: intersect_pairs(cl, o, d, tmin, tmax))
    hit = f_diff(o2, d2)
    jax.block_until_ready(hit)
    t0 = time.time()
    for _ in range(3):
        hit = f_diff(o2, d2)
        jax.block_until_ready(hit)
    dt = (time.time() - t0) / 3
    print(f"pairs DIFFUSE: {n/dt/1e6:8.3f} Mrays/s  ({dt*1e3:.1f} ms/{n} rays, "
          f"hit rate {float(hit.valid.mean()):.3f})")


if __name__ == "__main__":
    main()
