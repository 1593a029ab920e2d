"""Classroom MSE at the BENCH shape (VERDICT r4 item 6 / weak #7).

The committed classroom MSE evidence was measured at 96x96; this tool adds
rows at the bench resolution (the scene's native 1920x1080, the driver
protocol shape): PT at a few low spp vs a modest-spp ground truth, rendered
on the chip with the production defaults. MSE-vs-spp at a fixed shape is
the BASELINE.md §3 protocol; a 32-spp gt bounds the gt's own noise well
below the 1-4 spp rows being measured.

    python3 tools/classroom_mse_benchshape.py [--gt-spp 32] [--spp 1 2 4]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
ROOT = Path(__file__).resolve().parent.parent


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gt-spp", type=int, default=32)
    ap.add_argument("--spp", type=int, nargs="+", default=[1, 2, 4])
    ap.add_argument("--max-depth", type=int, default=12)
    args = ap.parse_args()

    import numpy as np

    from akari_render_tpu.config import PTConfig
    from akari_render_tpu.integrators.pt import render_pt
    from akari_render_tpu.scene import load_scene

    scene = load_scene(str(ROOT / "scenes/classroom/scene.json"))
    w, h = scene.camera.width, scene.camera.height
    print(f"bench shape {w}x{h}", flush=True)

    t0 = time.time()
    gt, _ = render_pt(
        scene,
        PTConfig(spp=args.gt_spp, max_depth=args.max_depth, spp_per_pass=1),
    )
    gt = np.asarray(gt)
    print(f"gt {args.gt_spp}spp {time.time()-t0:.0f}s "
          f"mean={float(gt.mean()):.5f}", flush=True)

    class T:
        sampler = None
        filter_config = None
        seed = 7  # decorrelate from the gt's seed-0 sample stream

    rows = []
    for spp in args.spp:
        t0 = time.time()
        img, _ = render_pt(
            scene,
            PTConfig(spp=spp, max_depth=args.max_depth, spp_per_pass=1),
            task=T(),
        )
        dt = time.time() - t0
        m = float(np.mean((np.asarray(img) - gt) ** 2))
        rows.append({"time": round(dt, 1), "spp": spp, "mse": m, "path": ""})
        print(f"pt spp={spp} mse={m:.5e} ({dt:.0f}s)", flush=True)

    path = ROOT / "BENCH_MSE_CLASSROOM.json"
    rec = json.loads(path.read_text()) if path.exists() else {}
    rec["bench_shape"] = {
        "res": [w, h],
        "gt_spp": args.gt_spp,
        "max_depth": args.max_depth,
        "series": {"pt": rows},
        "note": "measured on the chip at the driver bench shape with the "
                "production defaults (round-5: 128k-lane dispatch lid + "
                "split-compacted pass); gt seed 0, rows seed 7",
    }
    path.write_text(json.dumps(rec, indent=1) + "\n")
    print("record written", flush=True)


if __name__ == "__main__":
    main()
