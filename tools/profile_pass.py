"""On-chip bisection profiler for the cbox pass core.

The round-3 roofline read 0.03% VPU / 0.5% HBM for the cbox pass — i.e. the
pass is bound by NEITHER roofline the hand model considers (and XLA's
cost_analysis cannot see inside pallas_call, so the Pallas brute intersect's
flops are invisible to it). This tool times each suspect in isolation on the
real chip and prints one JSON line per section:

  1. HBM bandwidth calibration (elementwise copy on 64M f32)
  2. device dispatch latency (tiny jit, per-call wall clock)
  3. brute Pallas intersect: per-traversal seconds at several ray-block sizes
     (the grid-step fixed cost amortization curve), closest-hit + any-hit
  4. full cbox pass at bench shape (16 spp, 1024x1024) for reference
  5. depth sweep: pass time at max_depth 1/2/4/12 -> per-bounce cost, which
     minus 2x the intersect cost is the per-bounce XLA (shade/sample/film)
     cost.

Run ON the TPU (default platform): `python3 tools/profile_pass.py`.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _timeit(fn, *args, n=3):
    fn(*args)  # compile + warm
    import jax

    jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    out = {"platform": jax.devices()[0].platform}
    print(f"# device: {jax.devices()[0]}", file=sys.stderr)

    # --- 1. HBM bandwidth ---------------------------------------------------
    x = jnp.arange(64 * 1024 * 1024, dtype=jnp.float32)

    @jax.jit
    def bw(x):
        def body(i, x):
            return x * 1.000001 + 1e-9

        return jax.lax.fori_loop(0, 32, body, x)

    dt = _timeit(bw, x)
    per_iter = dt / 32
    out["hbm_copy_gbs"] = round(64 * 4 * 2 / per_iter / 1e3, 1)  # MB -> GB/s
    print(f"# hbm copy: {out['hbm_copy_gbs']} GB/s", file=sys.stderr)

    # --- 2. dispatch latency ------------------------------------------------
    @jax.jit
    def tiny(s):
        return s + 1.0

    s = jnp.float32(0)
    tiny(s)
    t0 = time.time()
    for _ in range(20):
        s = tiny(s)
    jax.block_until_ready(s)
    out["dispatch_ms"] = round((time.time() - t0) / 20 * 1e3, 2)
    print(f"# dispatch: {out['dispatch_ms']} ms", file=sys.stderr)

    # --- 3. brute intersect block sweep --------------------------------------
    from akari_render_tpu.scene import load_scene

    scene = load_scene(
        "/root/reference/scenes/cbox/scene.json", width=1024, height=1024
    )
    a = scene.arrays
    from akari_render_tpu.accel.pallas_intersect import intersect_pallas, pack_tris

    tri = pack_tris(a.v0, a.e1, a.e2)
    n = 1024 * 1024
    key = jax.random.PRNGKey(0)
    o = jax.random.uniform(key, (n, 3)) * 2 - 1
    d_ = jax.random.normal(jax.random.PRNGKey(1), (n, 3))
    d_ = d_ / jnp.linalg.norm(d_, axis=-1, keepdims=True)
    tmin = jnp.zeros((n,))
    tmax = jnp.full((n,), 1e9)

    ITERS = 16
    out["intersect"] = {}
    for block in (2048, 8192, 32768, 131072):
        @jax.jit
        def loop(o, d_, tmin, tmax, _block=block):
            def body(i, carry):
                eps, acc = carry
                h = intersect_pallas(
                    tri, o + eps, d_, tmin, tmax, block=_block
                )
                # serial dependency: next iteration's rays depend on this hit
                return (jnp.min(h.t) * 0.0, acc + jnp.sum(h.t * 0.0))

            return jax.lax.fori_loop(0, ITERS, body, (jnp.float32(0), jnp.float32(0)))

        dt = _timeit(loop, o, d_, tmin, tmax, n=2) / ITERS
        out["intersect"][str(block)] = round(dt * 1e3, 2)  # ms per traversal
        print(f"# intersect block={block}: {dt*1e3:.2f} ms "
              f"({n/dt/1e6:.1f} Mrays/s)", file=sys.stderr)

    best_block = min(out["intersect"], key=lambda k: out["intersect"][k])
    bb = int(best_block)

    @jax.jit
    def loop_any(o, d_, tmin, tmax):
        def body(i, carry):
            eps, acc = carry
            occ = intersect_pallas(
                tri, o + eps, d_, tmin, tmax, any_hit=True, block=bb
            )
            return (jnp.sum(occ).astype(jnp.float32) * 0.0,
                    acc + jnp.sum(occ).astype(jnp.float32) * 0.0)

        return jax.lax.fori_loop(0, ITERS, body, (jnp.float32(0), jnp.float32(0)))

    dt = _timeit(loop_any, o, d_, tmin, tmax, n=2) / ITERS
    out["intersect_any_hit_ms"] = round(dt * 1e3, 2)
    print(f"# any-hit block={bb}: {dt*1e3:.2f} ms", file=sys.stderr)

    # --- 4/5. full pass + depth sweep ----------------------------------------
    from akari_render_tpu.core.film import Film
    from akari_render_tpu.core.filters import GaussianFilter
    from akari_render_tpu.integrators.common import PTSettings
    from akari_render_tpu.integrators.pt import _render_pass_fn

    spp = 16
    out["pass_depth_s"] = {}
    for depth in (1, 2, 4, 12):
        one_pass = _render_pass_fn(
            scene, PTSettings(max_depth=depth, rr_depth=5),
            GaussianFilter(1.5), 1024, 1024, spp,
        )

        def run(arrays, start):
            return one_pass(arrays, Film.new(1024, 1024), start)

        dt = _timeit(run, scene.arrays, jnp.uint32(0), n=1)
        out["pass_depth_s"][str(depth)] = round(dt, 3)
        mpaths = 1024 * 1024 * spp / dt / 1e6
        print(f"# pass depth={depth}: {dt:.3f} s ({mpaths:.2f} Mpaths/s)",
              file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
