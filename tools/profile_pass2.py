"""Bisection profiler, part 2: where do the ~17 ms/bounce of XLA time go?

Part 1 (tools/profile_pass.py) measured the Pallas brute intersect at 1.36 ms
per 1M-ray traversal (~VPU roofline for cbox) — so traversal is ~2.7 ms of the
~20 ms/bounce. This script times the remaining per-bounce components in
isolation on the chip:

  - full pass at max_depth 1/2/4/8/12 (marginal cost per bounce)
  - surface_interaction on 1M lanes (attribute gathers)
  - dispatch_shade with the real cbox closure (sample+evaluate+albedo)
  - sample_light_point (alias table + light attribute gathers)
  - PCG sampler draws (7 per bounce)
  - add_samples_aligned film update

Run ON the TPU: `python3 tools/profile_pass2.py`.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ITERS = 16


def _timeit_loop(make_body, n_warm=1, iters=ITERS):
    """Times a serially-dependent fori_loop of `iters` body applications."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(seed):
        def body(i, carry):
            return make_body(i, carry)

        return jax.lax.fori_loop(0, iters, body, seed)

    out = loop(jnp.float32(0))
    jax.block_until_ready(out)
    t0 = time.time()
    out = loop(jnp.float32(0))
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from akari_render_tpu.scene import load_scene

    out = {}
    scene = load_scene(
        "/root/reference/scenes/cbox/scene.json", width=1024, height=1024
    )
    n = 1024 * 1024
    print(f"# device: {jax.devices()[0]}", file=sys.stderr)

    # --- full pass depth sweep ------------------------------------------------
    from akari_render_tpu.core.film import Film
    from akari_render_tpu.core.filters import GaussianFilter
    from akari_render_tpu.integrators.common import PTSettings
    from akari_render_tpu.integrators.pt import _render_pass_fn

    spp = 4  # smaller than bench's 16: depth curve shape is what matters
    out["pass_depth_s"] = {}
    for depth in (1, 2, 4, 8, 12):
        one_pass = _render_pass_fn(
            scene, PTSettings(max_depth=depth, rr_depth=5),
            GaussianFilter(1.5), 1024, 1024, spp,
        )
        film = one_pass(scene.arrays, Film.new(1024, 1024), jnp.uint32(0))
        jax.block_until_ready(film)
        t0 = time.time()
        film = one_pass(scene.arrays, Film.new(1024, 1024), jnp.uint32(spp))
        jax.block_until_ready(film)
        dt = time.time() - t0
        out["pass_depth_s"][str(depth)] = round(dt, 3)
        print(f"# pass depth={depth}: {dt:.3f} s "
              f"({n*spp/dt/1e6:.2f} Mpaths/s)", file=sys.stderr)

    # --- components -----------------------------------------------------------
    key = jax.random.PRNGKey(0)
    tri_ids = jax.random.randint(key, (n,), 0, scene.num_tris)
    bary = jax.random.uniform(jax.random.PRNGKey(1), (n, 2)) * 0.4

    def si_body(i, s):
        si = scene.surface_interaction(tri_ids, bary + s * 0.0)
        return jnp.min(si["p"]) * 0.0 + s

    dt = _timeit_loop(si_body)
    out["surface_interaction_ms"] = round(dt * 1e3, 2)
    print(f"# surface_interaction: {dt*1e3:.2f} ms", file=sys.stderr)

    # dispatch_shade with the real closure
    from akari_render_tpu.core.math import normalize
    from akari_render_tpu.core.sampling import mis_weight
    from akari_render_tpu.integrators.common import dispatch_shade

    wo = normalize(jax.random.normal(jax.random.PRNGKey(2), (n, 3)))
    u_bsdf = jax.random.uniform(jax.random.PRNGKey(3), (n, 3))
    ls_wi = normalize(jax.random.normal(jax.random.PRNGKey(4), (n, 3)))
    ls_li = jnp.ones((n, 3))
    ls_pdf = jnp.ones((n,))

    def shade(closure, ex):
        outp = {}
        f_l, pdf_l = closure.evaluate(ex["wo"], ex["ls_wi"])
        w = mis_weight(ex["ls_pdf"], pdf_l)
        outp["direct"] = (
            ex["ls_li"] * f_l * (w / jnp.maximum(ex["ls_pdf"], 1e-20))[..., None]
        )
        s = closure.sample(ex["wo"], ex["u_bsdf"][..., 0], ex["u_bsdf"][..., 1:])
        outp["wi"], outp["f"], outp["pdf"], outp["valid"] = (
            s["wi"], s["f"], s["pdf"], s["valid"]
        )
        outp["albedo"] = closure.albedo(ex["wo"])
        return outp

    si0 = scene.surface_interaction(tri_ids, bary)

    def shade_body(i, s):
        extra = {
            "wo": wo, "u_bsdf": u_bsdf + s * 0.0, "ls_wi": ls_wi,
            "ls_li": ls_li, "ls_pdf": ls_pdf,
        }
        sh = dispatch_shade(scene, si0, extra, shade)
        return jnp.min(sh["f"]) * 0.0 + s

    dt = _timeit_loop(shade_body)
    out["dispatch_shade_ms"] = round(dt * 1e3, 2)
    print(f"# dispatch_shade: {dt*1e3:.2f} ms", file=sys.stderr)

    # light sampling
    from akari_render_tpu.lights import sample_light_point

    u3 = jax.random.uniform(jax.random.PRNGKey(5), (n, 3))

    def light_body(i, s):
        light, lc_pdf, ltri, lprim_pdf, lbary = sample_light_point(
            scene.arrays.lights, scene.arrays, u3[..., 0] + s * 0.0, u3[..., 1:]
        )
        return jnp.min(lc_pdf) * 0.0 + s

    dt = _timeit_loop(light_body)
    out["sample_light_ms"] = round(dt * 1e3, 2)
    print(f"# sample_light_point: {dt*1e3:.2f} ms", file=sys.stderr)

    # sampler draws (7 per bounce: 3+3+1)
    from akari_render_tpu.core.lds import make_sampler

    pix = jnp.arange(n, dtype=jnp.uint32)

    def rng_body(i, s):
        smp = make_sampler(None, pix, jnp.uint32(0), 0)
        smp, a3 = smp.next_3d()
        smp, b3 = smp.next_3d()
        smp, c1 = smp.next_1d()
        return jnp.min(a3) * 0.0 + jnp.min(b3) * 0.0 + c1.min() * 0.0 + s

    dt = _timeit_loop(rng_body)
    out["sampler_7draws_ms"] = round(dt * 1e3, 2)
    print(f"# sampler 7 draws: {dt*1e3:.2f} ms", file=sys.stderr)

    # film aligned add
    from akari_render_tpu.core.film import add_samples_aligned

    film = Film.new(1024, 1024)
    rad = jnp.ones((n, 3))
    fw = jnp.ones((n,))

    def film_body(i, s):
        f2 = add_samples_aligned(film, rad + s * 0.0, fw)
        return jnp.min(f2.accum) * 0.0 + s

    dt = _timeit_loop(film_body)
    out["film_add_ms"] = round(dt * 1e3, 2)
    print(f"# film add: {dt*1e3:.2f} ms", file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
