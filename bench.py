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


# Raceable integrator configurations: key -> (measure kind, env). The key
# doubles as the BENCH_VARIANT subprocess re-entry selector (see
# _run_variant_subprocess / main's child mode).
#
# Round-5 tier triage (VERDICT r4 weak #3 / next #3): megakernel (mk) and
# pallas-shade (pshade) are FROZEN — mk never produced an end-to-end number
# in two rounds of bench windows (remote-compile-helper OOM, see
# tools/repro_helper_oom.py) and pshade measured 23x slower than the XLA
# shade it replaces. Racing them burned the round-4 driver window (only 2
# of 8 variants recorded, VERDICT weak #6); they are dropped from the race
# but remain runnable via AKR_MEGAKERNEL=1 / AKR_PALLAS_SHADE=1. The six
# remaining variants all compile within the warm-cache window.
VARIANTS = {
    "pass,pcg": ("pass", {}),
    "pass,pcg+fuse": ("pass", {"AKR_FUSE_RAYS": "1"}),
    "wf,pcg": ("wf", {}),
    "pass,hash": ("pass", {"AKR_RNG": "hash"}),
    "wf,hash": ("wf", {"AKR_RNG": "hash"}),
    "wf,pcg+fuse": ("wf", {"AKR_FUSE_RAYS": "1"}),
    "wf,hash+fuse": ("wf", {"AKR_FUSE_RAYS": "1", "AKR_RNG": "hash"}),
    "pass,hash+fuse": ("pass", {"AKR_FUSE_RAYS": "1", "AKR_RNG": "hash"}),
    # frozen tiers: reachable via BENCH_VARIANT for manual measurement,
    # never raced (see triage note above)
    "mk": ("mk", {}),
    "pass,pshade": ("pass", {"AKR_PALLAS_SHADE": "1"}),
}

_MEASURE_FNS = {
    "pass": _measure,
    "wf": _measure_wavefront,
    "mk": _measure_megakernel,
}


def _note(key, val):
    print(f"[bench] {key}: {val}", file=sys.stderr, flush=True)


def _run_variant_subprocess(key, timeout_s, scene_path=None):
    """Run one race variant in a SUBPROCESS with a hard wall-clock cap.

    Why a subprocess: remote axon compiles are unbounded in practice
    (observed 2026-08-19: one megakernel compile > 35 min), and an
    in-process variant call blocks until the compile returns — a single
    slow variant would eat the driver's entire bench window and the run
    would record NOTHING. A killed child forfeits its compile (the XLA
    cache persists only completed compiles), but the parent always gets to
    print the metric line — which is the contract that matters.

    Returns (mpaths_s, seconds, cost_dict_or_None) or raises.
    """
    import subprocess

    env = dict(os.environ)
    env["BENCH_VARIANT"] = key
    env["BENCH_SKIP_TPU_PROBE"] = "1"  # parent already probed
    if scene_path:
        env["BENCH_VARIANT_SCENE"] = scene_path
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        timeout=timeout_s, capture_output=True, text=True, env=env,
    )
    for line in r.stdout.splitlines():
        if line.startswith("VARIANT_RESULT "):
            rec = json.loads(line[len("VARIANT_RESULT "):])
            mp, dt, cost = rec[:3]
            res_wh = tuple(rec[3:5]) if len(rec) >= 5 else None
            return mp, dt, cost, res_wh
    raise RuntimeError(
        "variant child failed: "
        + (r.stderr.strip().splitlines() or ["no output"])[-1][:120]
    )


def _variant_child_main(key):
    """Child mode: measure ONE variant and print a parse-able result line."""
    scene_path = os.environ.get("BENCH_VARIANT_SCENE")
    from akari_render_tpu.scene import load_scene

    kind, env = VARIANTS[key]
    os.environ.update(env)
    max_depth = 12
    if scene_path:  # native camera dims (classroom-class workloads)
        scene = load_scene(scene_path)
        res_w, res_h = scene.camera.width, scene.camera.height
        spp = int(os.environ.get("BENCH_CLASSROOM_SPP", "1"))
    else:
        res = int(os.environ.get("BENCH_RES", "1024"))
        spp = int(os.environ.get("BENCH_SPP", "16"))
        scene = load_scene(
            os.environ.get(
                "BENCH_SCENE", "/root/reference/scenes/cbox/scene.json"
            ),
            width=res, height=res,
        )
        res_w = res_h = res
    out = _MEASURE_FNS[kind](scene, res_w, res_h, spp, max_depth)
    cost = out[2] if len(out) > 2 else None
    cost = {k: float(v) for k, v in cost.items()} if cost else None
    print("VARIANT_RESULT "
          + json.dumps([out[0], out[1], cost, res_w, res_h]), flush=True)


def _best_config(scene, res_w, res_h, spp, max_depth, deadline,
                 after_floor=None):
    """Race the integrator configurations and return the fastest:
    (pass | persistent wavefront | megakernel) x (pcg | stateless-hash
    RNG). The pass integrator with the reference-parity PCG stream is the
    always-works floor (measured in-process); every other variant runs in
    a hard-timeout subprocess (_run_variant_subprocess) so one wedged
    remote compile cannot eat the bench window. Variants that don't fit
    the wall-clock budget are recorded as "skipped: budget"; compiles that
    DID finish live in the persistent XLA cache, so the next run gets
    further through the list.
    """
    results = {}
    variant_cap = float(os.environ.get("BENCH_VARIANT_SECONDS", "1500"))

    t0 = time.time()
    mp, dt, cost = _measure(scene, res_w, res_h, spp, max_depth)
    results["pass,pcg"] = (mp, dt)
    _note("pass,pcg", f"{mp:.3f} Mpaths/s ({time.time()-t0:.0f}s total)")
    # best carries the COST of the config it names (ADVICE r3 medium: the
    # old code paired the floor's cost_analysis with the winner's dt,
    # silently corrupting the cross-round roofline record when a non-floor
    # variant won)
    best = ("pass,pcg", mp, dt, cost)
    if after_floor is not None:
        after_floor(best)
    if os.environ.get("BENCH_FAST"):
        return best, results

    def _race(key, cap=None):
        nonlocal best
        if key in results:
            return
        remaining = deadline - time.time()
        if remaining < 60:
            results[key] = ("skipped: budget",)
            _note(key, "skipped: budget")
            return
        t0 = time.time()
        try:
            mp2, dt2, cost2, _ = _run_variant_subprocess(
                key, min(remaining, cap or variant_cap)
            )
            results[key] = (mp2, dt2)
            _note(key, f"{mp2:.3f} Mpaths/s ({time.time()-t0:.0f}s total)")
            if mp2 > best[1]:
                best = (key, mp2, dt2, cost2)
        except Exception as e:
            kind = ("timeout" if "TimeoutExpired" in type(e).__name__
                    else "error")
            results[key] = (f"{kind}: " + str(e)[:80],)
            _note(key, results[key][0])

    _race("pass,hash")
    _race("pass,pcg+fuse")
    _race("pass,hash+fuse")
    _race("wf,hash")
    _race("wf,pcg")

    def _mp(key):
        v = results.get(key)
        return v[0] if v and isinstance(v[0], float) else 0.0

    # fused-ray pipelining on top of the winning wf RNG (shadow + next
    # bounce in one traversal, common.py trace_paths fused mode); last
    # because wf is a frozen tier (round-5 triage) — raced for the record,
    # never expected to win
    wf_rng = "hash" if _mp("wf,hash") > _mp("wf,pcg") else "pcg"
    _race(f"wf,{wf_rng}+fuse")
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


def _bound_verdict(vu, hu):
    """Roofline verdict from measured utilizations. Below 5% on BOTH axes
    nothing is "bound" by compute or bandwidth — the pass is
    latency/serialization-limited (dispatch gaps, sort/argsort chains,
    kernel fixed costs), and labeling it "hbm" misdirected round-4's
    optimization target (VERDICT r4 weak #2)."""
    if max(vu, hu) < 0.05:
        return "latency/underutilized"
    return "hbm" if hu > vu else "vpu"


def main():
    os.environ.setdefault("AKR_CACHE_DIR", os.path.join(os.path.dirname(__file__), ".cache"))

    vkey = os.environ.get("BENCH_VARIANT")
    if vkey:  # subprocess child: one variant, one result line
        if os.environ.get("BENCH_FORCE_CPU"):
            import jax

            jax.config.update("jax_platforms", "cpu")
        _variant_child_main(vkey)
        return

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

    deadline = time.time() + float(
        os.environ.get("BENCH_BUDGET_SECONDS", "1500")
    )
    scene = load_scene(scene_path, width=res, height=res)

    # classroom-class second workload (1920x1080, BASELINE.md north star).
    # Measured BEFORE the variant race (right after the floor, via the
    # after_floor hook) so a slow race can never push it out of the bench
    # window; re-measured after the race iff a different config won and
    # budget remains. Runs in a hard-timeout subprocess for the same
    # reason the race variants do.
    classroom_path = os.path.join(
        os.path.dirname(__file__), "scenes/classroom/scene.json"
    )
    classroom = {}

    def _measure_classroom(key, cap=None):
        if (not os.path.exists(classroom_path)
                or os.environ.get("BENCH_SKIP_CLASSROOM")):
            return
        if cap is None:
            cap = float(os.environ.get("BENCH_CLASSROOM_SECONDS", "1500"))
        if cap < 120:
            return
        t0 = time.time()
        try:
            mp_c, dt_c, cost_c, res_wh = _run_variant_subprocess(
                key, cap, scene_path=classroom_path
            )
            _note("classroom," + key,
                  f"{mp_c:.3f} Mpaths/s ({time.time()-t0:.0f}s total)")
        except Exception as e:
            _note("classroom," + key, f"failed: {str(e)[:100]}")
            # don't shadow an earlier SUCCESSFUL measurement with an error
            # key (ADVICE r3 low)
            if "mpaths_s" not in classroom:
                classroom.setdefault(
                    "error", f"config {key}: {str(e)[:120]}"
                )
            return
        if classroom.get("mpaths_s", 0.0) >= mp_c:
            return
        classroom.pop("error", None)
        spp_c = int(os.environ.get("BENCH_CLASSROOM_SPP", "1"))
        classroom.update({
            "mpaths_s": round(mp_c, 3),
            "seconds": round(dt_c, 3),
            # actual camera dims as measured by the child (ADVICE r3 low:
            # a hardcoded label lies if the scene's resolution changes)
            "res": (f"{res_wh[0]}x{res_wh[1]}" if res_wh else "unknown"),
            "spp": spp_c,
            "config": key,
            "secs_to_1024spp": round(dt_c / spp_c * 1024, 1),
        })
        if cost_c:
            fl, by = cost_c.get("flops", 0.0), cost_c.get("bytes accessed", 0.0)
            if fl > 0 or by > 0:
                vu = fl / dt_c / VPU_PEAK_F32
                hu = by / dt_c / HBM_PEAK
                classroom["measured"] = {
                    "tflops_s": round(fl / dt_c / 1e12, 3),
                    "hbm_gbs": round(by / dt_c / 1e9, 1),
                    "vpu_util": round(vu, 4),
                    "hbm_util": round(hu, 4),
                    "bound": _bound_verdict(vu, hu),
                }

    VPU_PEAK_F32 = 19.6e12
    HBM_PEAK = 819e9  # v5e HBM bandwidth, bytes/s

    def _vs_baseline(mpaths_s):
        # ratio against the round-1 recorded number (the reference publishes
        # no benchmarks — BASELINE.md — so the baseline is our own
        # first-round measurement; > 1.0 means faster than round 1)
        rel = mpaths_s
        try:
            r01 = os.path.join(os.path.dirname(__file__), "BENCH_r01.json")
            with open(r01) as f:
                doc = json.load(f)
            # driver wrapper format: the metric JSON line rides in "tail"
            m = json.loads(
                doc["tail"][doc["tail"].index('{"metric"'):].splitlines()[0]
            )
            if m.get("value"):
                rel = mpaths_s / float(m["value"])
        except Exception:
            pass
        return rel

    def _emit(cfg_name, mpaths_s, dt, cost, variants, partial):
        """Print the driver metric line NOW. Called after every milestone
        (floor measured / classroom measured / race finished) so a
        driver-kill mid-run still leaves a parseable final line on stdout
        with everything measured so far (VERDICT r3 weak #2: the r3 run was
        killed before the single end-of-run print and recorded NOTHING)."""
        detail = {
            "res": res,
            "spp": spp,
            "max_depth": max_depth,
            "seconds": round(dt, 3),
            "device": str(jax.devices()[0]),
            "cpu_fallback_relay_down": cpu_fallback,
            "config": cfg_name,
            "partial": partial,
            "variants": {
                k: (round(v[0], 3) if isinstance(v[0], float) else v[0])
                for k, v in variants.items()
            },
        }

        # roofline-style utilization estimate: dense-intersection FLOPs per
        # path over an approximate v5e f32 VPU peak (~19.6 TFLOP/s; the MXU
        # bf16 peak of 197 TFLOP/s is not reachable by slab/MT elementwise
        # math)
        est_flops = _flops_per_path(scene, max_depth) * mpaths_s * 1e6
        detail["est_intersect_tflops"] = round(est_flops / 1e12, 3)
        detail["est_vpu_util"] = round(est_flops / VPU_PEAK_F32, 4)

        # MEASURED utilization (VERDICT r2 item 3): XLA cost_analysis of the
        # compiled executable of the config NAMED HERE (ADVICE r3 medium) /
        # its measured wall-clock. States which roofline (VPU flops vs HBM
        # bytes) the render sits on.
        if cost:
            fl = float(cost.get("flops", 0.0))
            by = float(cost.get("bytes accessed", 0.0))
            if fl > 0 or by > 0:
                vu = fl / dt / VPU_PEAK_F32
                hu = by / dt / HBM_PEAK
                detail["measured"] = {
                    "config": cfg_name,
                    "hlo_gflops_per_pass": round(fl / 1e9, 2),
                    "hlo_gbytes_per_pass": round(by / 1e9, 2),
                    "tflops_s": round(fl / dt / 1e12, 3),
                    "hbm_gbs": round(by / dt / 1e9, 1),
                    "vpu_util": round(vu, 4),
                    "hbm_util": round(hu, 4),
                    "bound": _bound_verdict(vu, hu),
                }

        if classroom:
            detail["classroom"] = classroom

        print(
            json.dumps(
                {
                    "metric": ("cbox_pt_throughput" if "cbox" in scene_path
                               else "scene_pt_throughput")
                    + ("_cpu_fallback" if cpu_fallback else ""),
                    "value": round(mpaths_s, 3),
                    "unit": "Mpaths/s",
                    "vs_baseline": round(_vs_baseline(mpaths_s), 3),
                    "detail": detail,
                }
            ),
            flush=True,
        )

    def _after_floor(floor):
        # milestone 1: the floor number exists — put a metric line on stdout
        # before anything slow (classroom child, race) can eat the window
        k, m, d, c = floor
        _emit(k, m, d, c, {"pass,pcg": (m, d)}, partial="floor")
        _measure_classroom("pass,pcg")
        # milestone 2: classroom (the north-star workload) is on record too
        _emit(k, m, d, c, {"pass,pcg": (m, d)}, partial="floor+classroom")

    (cfg_name, mpaths_s, dt, cost), variants = _best_config(
        scene, res, res, spp, max_depth, deadline, after_floor=_after_floor
    )

    # re-measure classroom with the race winner, bounded by what's left of
    # the window (+ a small grace) so the total run stays driver-sized
    if cfg_name != "pass,pcg":
        _measure_classroom(
            cfg_name,
            cap=min(
                float(os.environ.get("BENCH_CLASSROOM_SECONDS", "1500")),
                deadline + 600.0 - time.time(),
            ),
        )

    # milestone 3: the full record
    _emit(cfg_name, mpaths_s, dt, cost, variants, partial=False)


if __name__ == "__main__":
    main()
