"""Classroom end-to-end config sweep: (AKR_CLUSTER_SIZE, AKR_MAXC,
AKR_SWEEP_G) -> Mpaths/s at a reduced resolution (one dispatch), depth 12.

Round-4 decomposition: classroom's full pass costs ~1.1 s/bounce per 262k
lanes while coherent-ray probes cost ~0.28 s — diffuse bounce rays walk
many more cursor rounds, so round-count-vs-round-size is the tunable that
matters and only an END-TO-END measurement ranks configs.

Usage (one subprocess per config — the knobs are read at import):
    python3 tools/sweep_classroom.py 128:64:4     # child: one config
    python3 tools/sweep_classroom.py --sweep      # parent: default grid
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
DEFAULT_GRID = ["128:64:4", "128:128:4", "256:64:4", "256:32:8", "512:32:4"]
RES = (640, 360)
SPP = 1


def child(cfg: str):
    cs, mc, g = cfg.split(":")
    os.environ["AKR_CLUSTER_SIZE"] = cs
    os.environ["AKR_MAXC"] = mc
    os.environ["AKR_SWEEP_G"] = g
    sys.path.insert(0, str(ROOT))
    import jax

    from akari_render_tpu.config import PTConfig
    from akari_render_tpu.integrators.pt import render_pt
    from akari_render_tpu.scene import load_scene

    scene = load_scene(str(ROOT / "scenes/classroom/scene.json"),
                       width=RES[0], height=RES[1])
    c = PTConfig(spp=SPP, max_depth=12, rr_depth=5, spp_per_pass=SPP)
    render_pt(scene, c)  # compile + warm
    t0 = time.time()
    render_pt(scene, c)
    dt = time.time() - t0
    print(json.dumps({
        "config": cfg, "mpaths_s": round(RES[0] * RES[1] * SPP / dt / 1e6, 4),
        "seconds": round(dt, 2),
    }), flush=True)


def sweep(grid):
    results = []
    for cfg in grid:
        t0 = time.time()
        try:
            out = subprocess.run(
                [sys.executable, __file__, cfg],
                capture_output=True, text=True,
                timeout=float(os.environ.get("SWEEP_CFG_SECONDS", "1800")),
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("{")]
            if line:
                r = json.loads(line[-1])
                results.append(r)
                print(f"{cfg}: {r['mpaths_s']} Mpaths/s "
                      f"({time.time()-t0:.0f}s total)", flush=True)
            else:
                print(f"{cfg}: FAILED\n{out.stderr[-500:]}", flush=True)
        except subprocess.TimeoutExpired:
            print(f"{cfg}: timeout", flush=True)
    if results:
        best = max(results, key=lambda r: r["mpaths_s"])
        print("BEST: " + json.dumps(best), flush=True)
    return results


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] != "--sweep":
        child(sys.argv[1])
    else:
        sweep(sys.argv[2:] or DEFAULT_GRID)
