"""Benchmark: path-tracing throughput on the current default device.

Protocol (BASELINE.md): Mpaths/s on (a) the reference cbox workload
(scenes/cbox, 1024x1024) and (b) the classroom-class fixture
(scenes/classroom, 1920x1080, ~590k effective tris, 8 lights, instanced
desks) — the driver north-star pair. "Paths" = camera samples (spp x
pixels); each path traces up to max_depth bounces with NEE (2 rays/bounce).

Prints ONE JSON line for the driver: the primary metric is cbox Mpaths/s
(vs_baseline-comparable across rounds); classroom numbers + a first-order
compute-utilization estimate ride in "detail".

Env: BENCH_RES / BENCH_SPP / BENCH_SCENE override cbox; BENCH_SKIP_CLASSROOM=1
drops the second workload (e.g. for quick local runs).
"""
from __future__ import annotations

import json
import os
import sys
import time


def _measure(scene, res_w, res_h, spp, max_depth):
    """One warm pass + one timed pass; returns (Mpaths/s, seconds)."""
    import jax
    import jax.numpy as jnp

    from akari_render_tpu.core.film import Film
    from akari_render_tpu.core.filters import GaussianFilter
    from akari_render_tpu.integrators.common import PTSettings
    from akari_render_tpu.integrators.pt import _render_pass_fn

    settings = PTSettings(max_depth=max_depth, rr_depth=5)
    one_pass = _render_pass_fn(
        scene, settings, GaussianFilter(1.5), res_w, res_h, spp
    )
    film = Film.new(res_w, res_h)
    film = one_pass(scene.arrays, film, jnp.uint32(0))  # compile + warm
    jax.block_until_ready(film)

    film2 = Film.new(res_w, res_h)
    t0 = time.time()
    film2 = one_pass(scene.arrays, film2, jnp.uint32(spp))
    jax.block_until_ready(film2)
    dt = time.time() - t0
    paths = res_w * res_h * spp
    return paths / dt / 1e6, dt


def _flops_per_path(scene, max_depth):
    """First-order FLOP model of one path through the current accel tier —
    the denominator for a roofline-style utilization estimate. Counts only
    the dominant dense intersection math (Moller-Trumbore ~60 flops/test,
    AABB slab ~15-50), ignoring shading (cbox: shade is <10% of time)."""
    rays_per_bounce = 2  # closest-hit + shadow ray
    bounces = max_depth
    a = scene.arrays
    if a.unified is not None or a.bvh is not None:
        # pair-sweep tier (accel/pairs.py, the TPU default): per BLOCK of 512
        # sorted rays, ~2 rounds of [K] conservative interval cull (~150
        # flops) + per-ray window slab (W*30) + maxc swept clusters of 128
        # tris each, tested by every lane
        from akari_render_tpu.accel.pairs import BLOCK, MAXC, WINDOW_MULT

        K = (a.unified.num_clusters if a.unified is not None
             else a.bvh["clusters"].num_clusters)
        rounds = 2.0
        per_ray = rounds * (
            K * 150.0 / BLOCK + MAXC * WINDOW_MULT * 30.0 + MAXC * 128 * 60.0
        )
    else:
        per_ray = scene.num_tris * 60.0  # brute/pallas tiers
    return per_ray * rays_per_bounce * bounces


def main():
    os.environ.setdefault("AKR_CACHE_DIR", os.path.join(os.path.dirname(__file__), ".cache"))
    import jax

    from akari_render_tpu.scene import load_scene

    res = int(os.environ.get("BENCH_RES", "1024"))
    spp = int(os.environ.get("BENCH_SPP", "16"))
    scene_path = os.environ.get(
        "BENCH_SCENE", "/root/reference/scenes/cbox/scene.json"
    )
    max_depth = 12  # reference pt.json config

    scene = load_scene(scene_path, width=res, height=res)
    mpaths_s, dt = _measure(scene, res, res, spp, max_depth)

    detail = {
        "res": res,
        "spp": spp,
        "max_depth": max_depth,
        "seconds": round(dt, 3),
        "device": str(jax.devices()[0]),
    }

    # roofline-style utilization estimate: dense-intersection FLOPs per path
    # over an approximate v5e f32 VPU peak (~19.6 TFLOP/s; the MXU bf16 peak
    # of 197 TFLOP/s is not reachable by slab/MT elementwise math)
    VPU_PEAK_F32 = 19.6e12
    est_flops = _flops_per_path(scene, max_depth) * mpaths_s * 1e6
    detail["est_intersect_tflops"] = round(est_flops / 1e12, 3)
    detail["est_vpu_util"] = round(est_flops / VPU_PEAK_F32, 4)

    # classroom-class second workload (1920x1080, BASELINE.md north star)
    classroom = os.path.join(os.path.dirname(__file__), "scenes/classroom/scene.json")
    if os.path.exists(classroom) and not os.environ.get("BENCH_SKIP_CLASSROOM"):
        try:
            spp_c = int(os.environ.get("BENCH_CLASSROOM_SPP", "1"))
            sc = load_scene(classroom)  # native 1920x1080 camera
            mp_c, dt_c = _measure(sc, sc.camera.width, sc.camera.height, spp_c, max_depth)
            est_c = _flops_per_path(sc, max_depth) * mp_c * 1e6
            detail["classroom"] = {
                "mpaths_s": round(mp_c, 3),
                "seconds": round(dt_c, 3),
                "res": f"{sc.camera.width}x{sc.camera.height}",
                "spp": spp_c,
                "est_vpu_util": round(est_c / VPU_PEAK_F32, 4),
                "secs_to_1024spp": round(dt_c / spp_c * 1024, 1),
            }
        except Exception as e:  # classroom failure must not kill the metric
            detail["classroom"] = {"error": str(e)[:200]}

    # vs_baseline: ratio against the round-1 recorded number (the reference
    # publishes no benchmarks — BASELINE.md — so the baseline is our own
    # first-round measurement; > 1.0 means faster than round 1)
    rel = mpaths_s
    try:
        r01 = os.path.join(os.path.dirname(__file__), "BENCH_r01.json")
        with open(r01) as f:
            doc = json.load(f)
        # driver wrapper format: the metric JSON line rides in "tail"
        m = json.loads(doc["tail"][doc["tail"].index('{"metric"'):].splitlines()[0])
        if m.get("value"):
            rel = mpaths_s / float(m["value"])
    except Exception:
        pass

    print(
        json.dumps(
            {
                "metric": ("cbox_pt_throughput" if "cbox" in scene_path else "scene_pt_throughput"),
                "value": round(mpaths_s, 3),
                "unit": "Mpaths/s",
                "vs_baseline": round(rel, 3),
                "detail": detail,
            }
        )
    )


if __name__ == "__main__":
    main()
