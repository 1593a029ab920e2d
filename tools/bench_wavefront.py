"""A/B the persistent wavefront (integrators/wavefront.py) against the
pass-based PT on the real device: same scene/config, wall-clock per spp.

Usage: python tools/bench_wavefront.py [--res 1024] [--spp 8] [--depth 12]
       [--scene /root/reference/scenes/cbox/scene.json]
"""
from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--depth", type=int, default=12)
    ap.add_argument("--scene",
                    default="/root/reference/scenes/cbox/scene.json")
    ap.add_argument("--skip-pass", action="store_true")
    args = ap.parse_args()

    os.environ.setdefault(
        "AKR_CACHE_DIR",
        os.path.join(os.path.dirname(__file__), "..", ".cache"),
    )
    import numpy as np

    from akari_render_tpu.config import PTConfig
    from akari_render_tpu.integrators.pt import render_pt
    from akari_render_tpu.integrators.wavefront import render_pt_wavefront
    from akari_render_tpu.scene import load_scene

    scene = load_scene(args.scene, width=args.res, height=args.res)
    cfg = PTConfig(spp=args.spp, max_depth=args.depth, rr_depth=5,
                   spp_per_pass=args.spp)
    paths = args.res * args.res * args.spp

    results = {}
    runs = [("wavefront", render_pt_wavefront)]
    if not args.skip_pass:
        runs.append(("pass", render_pt))
    for name, fn in runs:
        img, stats = fn(scene, cfg)  # includes compile + calibration
        t0 = time.time()
        img, stats = fn(scene, cfg)
        dt = time.time() - t0
        results[name] = (paths / dt / 1e6, dt, img)
        print(f"{name:>10}: {paths/dt/1e6:7.3f} Mpaths/s  ({dt:.2f} s, "
              f"mean {float(np.mean(img)):.5f})")
    if len(results) == 2:
        mw, _, iw = results["wavefront"]
        mp, _, ip = results["pass"]
        print(f"wavefront/pass: {mw/mp:.2f}x;  image mean rel diff "
              f"{abs(float(np.mean(iw))-float(np.mean(ip)))/max(1e-9, float(np.mean(ip))):.2e}")


if __name__ == "__main__":
    main()
