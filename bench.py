"""Benchmark: cbox path-tracing throughput on the current default device.

Protocol (BASELINE.md): Mpaths/s on the reference cbox workload
(scenes/cbox/pt.json geometry/method; resolution and spp scaled to a fixed
time budget). "Paths" = camera samples (spp x pixels); each path traces up to
max_depth bounces with NEE. Prints ONE JSON line for the driver.
"""
from __future__ import annotations

import json
import os
import sys
import time


def main():
    os.environ.setdefault("AKR_CACHE_DIR", os.path.join(os.path.dirname(__file__), ".cache"))
    import jax
    import jax.numpy as jnp

    from akari_render_tpu.config import PTConfig
    from akari_render_tpu.core.film import Film
    from akari_render_tpu.core.filters import GaussianFilter
    from akari_render_tpu.integrators.common import PTSettings
    from akari_render_tpu.integrators.pt import _render_pass_fn
    from akari_render_tpu.scene import load_scene

    res = int(os.environ.get("BENCH_RES", "1024"))
    spp = int(os.environ.get("BENCH_SPP", "16"))
    scene_path = os.environ.get(
        "BENCH_SCENE", "/root/reference/scenes/cbox/scene.json"
    )

    scene = load_scene(scene_path, width=res, height=res)
    settings = PTSettings(max_depth=12, rr_depth=5)  # reference pt.json config
    one_pass = _render_pass_fn(scene, settings, GaussianFilter(1.5), res, res, spp)
    film = Film.new(res, res)

    # warmup = compile + one full pass
    film = one_pass(scene.arrays, film, jnp.uint32(0))
    jax.block_until_ready(film)

    film2 = Film.new(res, res)
    t0 = time.time()
    film2 = one_pass(scene.arrays, film2, jnp.uint32(spp))  # fresh sample range
    jax.block_until_ready(film2)
    dt = time.time() - t0

    paths = res * res * spp
    mpaths_s = paths / dt / 1e6
    print(
        json.dumps(
            {
                "metric": ("cbox_pt_throughput" if "cbox" in scene_path else "scene_pt_throughput"),
                "value": round(mpaths_s, 3),
                "unit": "Mpaths/s",
                "vs_baseline": round(mpaths_s, 3),
                "detail": {
                    "res": res,
                    "spp": spp,
                    "max_depth": 12,
                    "seconds": round(dt, 3),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
