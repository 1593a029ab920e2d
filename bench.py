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
    """One warm pass + one timed pass; returns (Mpaths/s, seconds, cost)
    where cost is XLA's cost_analysis() of the compiled pass executable
    ({'flops', 'bytes accessed', ...}) or None if the backend can't report
    it — the numerator for MEASURED (compiled-HLO counts / wall-clock)
    utilization, as opposed to the hand FLOP model below."""
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

    cost = None
    try:
        compiled = one_pass.lower(
            scene.arrays, Film.new(res_w, res_h), jnp.uint32(0)
        ).compile()
        ca = compiled.cost_analysis()
        cost = ca[0] if isinstance(ca, (list, tuple)) else ca
    except Exception:
        pass

    film2 = Film.new(res_w, res_h)
    t0 = time.time()
    film2 = one_pass(scene.arrays, film2, jnp.uint32(spp))
    jax.block_until_ready(film2)
    dt = time.time() - t0
    paths = res_w * res_h * spp
    return paths / dt / 1e6, dt, cost


def _measure_wavefront(scene, res_w, res_h, spp, max_depth):
    """Persistent-wavefront throughput (AKR_PERSISTENT path): first call
    compiles + calibrates the watchdog iteration budget, second call is
    timed (retrace cost rides the persistent XLA cache)."""
    import time as _t

    from akari_render_tpu.config import PTConfig
    from akari_render_tpu.integrators.wavefront import render_pt_wavefront

    cfg = PTConfig(spp=spp, max_depth=max_depth, rr_depth=5, spp_per_pass=spp)
    render_pt_wavefront(scene, cfg)
    t0 = _t.time()
    render_pt_wavefront(scene, cfg)
    dt = _t.time() - t0
    return res_w * res_h * spp / dt / 1e6, dt


def _measure_megakernel(scene, res_w, res_h, spp, max_depth):
    """Megakernel tier (integrators/megakernel.py): whole paths in one
    Pallas kernel, VMEM-resident state. Raises if the scene is outside the
    tier's static scope (the race just drops it)."""
    import time as _t

    from akari_render_tpu.config import PTConfig
    from akari_render_tpu.core.filters import GaussianFilter
    from akari_render_tpu.integrators.common import PTSettings
    from akari_render_tpu.integrators.megakernel import (
        megakernel_eligible, render_pt_megakernel,
    )

    if not megakernel_eligible(
        scene, PTSettings(max_depth=max_depth, rr_depth=5), None,
        GaussianFilter(1.5),
    ):
        raise RuntimeError("scene outside megakernel scope")
    cfg = PTConfig(spp=spp, max_depth=max_depth, rr_depth=5, spp_per_pass=spp)
    render_pt_megakernel(scene, cfg)  # compile + warm
    t0 = _t.time()
    render_pt_megakernel(scene, cfg)
    dt = _t.time() - t0
    return res_w * res_h * spp / dt / 1e6, dt


def _best_config(scene, res_w, res_h, spp, max_depth):
    """Race the integrator configurations and return the fastest:
    (pass | persistent wavefront | megakernel) x (pcg | stateless-hash
    RNG). The pass integrator with the reference-parity PCG stream is the
    always-works floor; each alternative is guarded so a failure just
    drops it. The megakernel carries its own in-kernel hash RNG, so it
    races once.

    The race is WALL-CLOCK BUDGETED (BENCH_BUDGET_SECONDS, default 1500):
    remote axon compiles can take 10+ min each, and the driver's bench run
    must always record at least the floor + classroom. Variants that don't
    fit are recorded as "skipped: budget"; compiles that DID finish live in
    the persistent XLA cache, so the next run gets further through the list.
    """
    results = {}
    deadline = time.time() + float(
        os.environ.get("BENCH_BUDGET_SECONDS", "1500")
    )

    def _note(key, val):
        print(f"[bench] {key}: {val}", file=sys.stderr, flush=True)

    t0 = time.time()
    mp, dt, cost = _measure(scene, res_w, res_h, spp, max_depth)
    results["pass,pcg"] = (mp, dt)
    _note("pass,pcg", f"{mp:.3f} Mpaths/s ({time.time()-t0:.0f}s total)")
    best = ("pass,pcg", mp, dt, cost)
    if os.environ.get("BENCH_FAST"):
        return best, results

    def _race(key, fn, env=None):
        nonlocal best
        if key in results:
            return
        if time.time() > deadline:
            results[key] = ("skipped: budget",)
            _note(key, "skipped: budget")
            return
        t0 = time.time()
        try:
            for k, v in (env or {}).items():
                os.environ[k] = v
            out = fn(scene, res_w, res_h, spp, max_depth)
            mp2, dt2 = out[0], out[1]
            results[key] = (mp2, dt2)
            _note(key, f"{mp2:.3f} Mpaths/s ({time.time()-t0:.0f}s total)")
            if mp2 > best[1]:
                best = (key, mp2, dt2, out[2] if len(out) > 2 else None)
        except Exception as e:
            results[key] = ("error: " + str(e)[:80],)
            _note(key, results[key][0])
        finally:
            for k in (env or {}):
                os.environ.pop(k, None)

    _race("mk", _measure_megakernel)
    _race("pass,pcg+fuse", _measure, {"AKR_FUSE_RAYS": "1"})
    _race("wf,pcg", _measure_wavefront)
    _race("pass,hash", _measure, {"AKR_RNG": "hash"})
    _race("wf,hash", _measure_wavefront, {"AKR_RNG": "hash"})

    def _mp(key):
        v = results.get(key)
        return v[0] if v and isinstance(v[0], float) else 0.0

    # fused-ray pipelining on top of the winning wf RNG (shadow + next
    # bounce in one traversal, common.py trace_paths fused mode)
    wf_rng = "hash" if _mp("wf,hash") > _mp("wf,pcg") else "pcg"
    env = {"AKR_FUSE_RAYS": "1"}
    if wf_rng == "hash":
        env["AKR_RNG"] = "hash"
    _race(f"wf,{wf_rng}+fuse", _measure_wavefront, env)
    if _mp("pass,hash") > _mp("pass,pcg"):
        _race("pass,hash+fuse", _measure,
              {"AKR_FUSE_RAYS": "1", "AKR_RNG": "hash"})
    return best, results


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


def _tpu_relay_alive(timeout_s: float) -> bool:
    """Probe the axon TPU relay in a SUBPROCESS with a hard timeout.

    The relay occasionally wedges for hours (observed 2026-08-18: >5 h);
    an in-process jnp op would then hang bench.py forever and the round
    would record nothing. The probe runs one tiny device computation +
    transfer; first-transfer latency on a healthy relay is 1-8 min, so
    the default budget is generous (BENCH_TPU_PROBE_SECONDS=900)."""
    import subprocess
    import sys as _sys

    code = (
        "import jax, jax.numpy as jnp;"
        "x = (jnp.ones((8, 8)) @ jnp.ones((8, 8))).sum();"
        "print('ok', float(x))"
    )
    try:
        r = subprocess.run(
            [_sys.executable, "-c", code], timeout=timeout_s,
            capture_output=True, text=True,
        )
        return r.returncode == 0 and "ok" in r.stdout
    except Exception:
        return False


def main():
    os.environ.setdefault("AKR_CACHE_DIR", os.path.join(os.path.dirname(__file__), ".cache"))
    import jax

    # Relay-down resilience: if the TPU tunnel does not answer a bounded
    # probe, fall back to an honestly-labeled CPU measurement (reduced spp,
    # race skipped) instead of hanging until the driver kills us.
    cpu_fallback = False
    if os.environ.get("BENCH_FORCE_CPU"):
        cpu_fallback = True
    elif os.environ.get("BENCH_SKIP_TPU_PROBE") != "1":
        probe_s = float(os.environ.get("BENCH_TPU_PROBE_SECONDS", "900"))
        if not _tpu_relay_alive(probe_s):
            cpu_fallback = True
    if cpu_fallback:
        jax.config.update("jax_platforms", "cpu")
        os.environ["BENCH_FAST"] = "1"
        os.environ.setdefault("BENCH_SPP", "4")
        os.environ.setdefault("BENCH_SKIP_CLASSROOM", "1")

    from akari_render_tpu.scene import load_scene

    res = int(os.environ.get("BENCH_RES", "1024"))
    spp = int(os.environ.get("BENCH_SPP", "16"))
    scene_path = os.environ.get(
        "BENCH_SCENE", "/root/reference/scenes/cbox/scene.json"
    )
    max_depth = 12  # reference pt.json config

    scene = load_scene(scene_path, width=res, height=res)
    (cfg_name, mpaths_s, dt, cost), variants = _best_config(
        scene, res, res, spp, max_depth
    )

    detail = {
        "res": res,
        "spp": spp,
        "max_depth": max_depth,
        "seconds": round(dt, 3),
        "device": str(jax.devices()[0]),
        "cpu_fallback_relay_down": cpu_fallback,
        "config": cfg_name,
        "variants": {
            k: (round(v[0], 3) if isinstance(v[0], float) else v[0])
            for k, v in variants.items()
        },
    }

    # roofline-style utilization estimate: dense-intersection FLOPs per path
    # over an approximate v5e f32 VPU peak (~19.6 TFLOP/s; the MXU bf16 peak
    # of 197 TFLOP/s is not reachable by slab/MT elementwise math)
    VPU_PEAK_F32 = 19.6e12
    HBM_PEAK = 819e9  # v5e HBM bandwidth, bytes/s
    est_flops = _flops_per_path(scene, max_depth) * mpaths_s * 1e6
    detail["est_intersect_tflops"] = round(est_flops / 1e12, 3)
    detail["est_vpu_util"] = round(est_flops / VPU_PEAK_F32, 4)

    # MEASURED utilization (VERDICT r2 item 3): XLA cost_analysis of the
    # compiled pass (actual HLO flop/byte counts) / measured wall-clock.
    # States which roofline (VPU flops vs HBM bytes) the render sits on.
    if cost:
        fl = float(cost.get("flops", 0.0))
        by = float(cost.get("bytes accessed", 0.0))
        if fl > 0 or by > 0:
            vu = fl / dt / VPU_PEAK_F32
            hu = by / dt / HBM_PEAK
            detail["measured"] = {
                "hlo_gflops_per_pass": round(fl / 1e9, 2),
                "hlo_gbytes_per_pass": round(by / 1e9, 2),
                "tflops_s": round(fl / dt / 1e12, 3),
                "hbm_gbs": round(by / dt / 1e9, 1),
                "vpu_util": round(vu, 4),
                "hbm_util": round(hu, 4),
                "bound": "hbm" if hu > vu else "vpu",
            }

    # classroom-class second workload (1920x1080, BASELINE.md north star)
    classroom = os.path.join(os.path.dirname(__file__), "scenes/classroom/scene.json")
    if os.path.exists(classroom) and not os.environ.get("BENCH_SKIP_CLASSROOM"):
        print(f"[bench] classroom (config={cfg_name})...",
              file=sys.stderr, flush=True)
        try:
            spp_c = int(os.environ.get("BENCH_CLASSROOM_SPP", "1"))
            sc = load_scene(classroom)  # native 1920x1080 camera
            # reuse the cbox-winning config; fall back to the pass floor
            cost_c = None
            try:
                if "hash" in cfg_name:
                    os.environ["AKR_RNG"] = "hash"
                if "fuse" in cfg_name:
                    os.environ["AKR_FUSE_RAYS"] = "1"
                if cfg_name.startswith("wf"):
                    mp_c, dt_c = _measure_wavefront(
                        sc, sc.camera.width, sc.camera.height, spp_c, max_depth
                    )
                else:
                    mp_c, dt_c, cost_c = _measure(
                        sc, sc.camera.width, sc.camera.height, spp_c, max_depth
                    )
            except Exception:
                os.environ.pop("AKR_RNG", None)
                os.environ.pop("AKR_FUSE_RAYS", None)
                mp_c, dt_c, cost_c = _measure(
                    sc, sc.camera.width, sc.camera.height, spp_c, max_depth
                )
            finally:
                os.environ.pop("AKR_RNG", None)
                os.environ.pop("AKR_FUSE_RAYS", None)
            est_c = _flops_per_path(sc, max_depth) * mp_c * 1e6
            detail["classroom"] = {
                "mpaths_s": round(mp_c, 3),
                "seconds": round(dt_c, 3),
                "res": f"{sc.camera.width}x{sc.camera.height}",
                "spp": spp_c,
                "est_vpu_util": round(est_c / VPU_PEAK_F32, 4),
                "secs_to_1024spp": round(dt_c / spp_c * 1024, 1),
            }
            if cost_c:
                fl = float(cost_c.get("flops", 0.0))
                by = float(cost_c.get("bytes accessed", 0.0))
                if fl > 0 or by > 0:
                    vu = fl / dt_c / VPU_PEAK_F32
                    hu = by / dt_c / HBM_PEAK
                    detail["classroom"]["measured"] = {
                        "tflops_s": round(fl / dt_c / 1e12, 3),
                        "hbm_gbs": round(by / dt_c / 1e9, 1),
                        "vpu_util": round(vu, 4),
                        "hbm_util": round(hu, 4),
                        "bound": "hbm" if hu > vu else "vpu",
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
                "metric": ("cbox_pt_throughput" if "cbox" in scene_path else "scene_pt_throughput")
                + ("_cpu_fallback" if cpu_fallback else ""),
                "value": round(mpaths_s, 3),
                "unit": "Mpaths/s",
                "vs_baseline": round(rel, 3),
                "detail": detail,
            }
        )
    )


if __name__ == "__main__":
    main()
