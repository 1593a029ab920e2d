"""Re-measure the shift-mode A/B on ALL three fixtures (round 5).

Round-4 VERDICT item 4: the reconnection shift consistently LOST to plain
PSS replay on three fixtures in a row — suspected excess variance in the
implementation, not a formulation truth. Round 5 found two bugs
(integrators/gpt.py + gpt_reconnect.py):

1. Lumped pair weighting: the camera vertex's own contributions (depth-0
   Le + first-vertex NEE) are pure jacobian-1 PSS shifts in the reference's
   separate-weights scheme (gpt.rs:192-204, base_replay_throughput
   pt.rs:415-417) but were weighted by the RECONNECTION jacobian — noise
   proportional to the direct-lighting magnitude on every gradient sample.
2. No-vertex fallback: lanes whose base path had NO reconnection-eligible
   vertex failed the shift to `-base`, discarding the full-PSS-replay
   correlation the reference keeps.

This tool re-runs the equal-budget protocol (PT gt 3072 spp; GPT 6 spp,
96x96; multi-seed) on blinds / cbox / glossy and rewrites
BENCH_MSE_GLOSSY.json in one consistent multi-seed format. The relationships
it records are asserted by tests/test_integrators.py.

    AKR_FORCE_CPU=1 python3 tools/shift_ab_all.py [blinds cbox glossy]
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ROOT = Path(__file__).resolve().parent.parent
SEEDS = (0, 7, 23)


def measure(scene_path, max_depth, modes, seeds=SEEDS, res=96, spp=6,
            gt_spp=3072):
    import numpy as np

    from akari_render_tpu.config import GPTConfig, PTConfig
    from akari_render_tpu.integrators.gpt import render_gpt
    from akari_render_tpu.integrators.pt import render_pt
    from akari_render_tpu.scene import load_scene

    scene = load_scene(str(scene_path), width=res, height=res)
    t0 = time.time()
    gt, _ = render_pt(scene, PTConfig(spp=gt_spp, max_depth=max_depth,
                                      spp_per_pass=256))
    gt = np.asarray(gt)
    print(f"  gt {time.time()-t0:.0f}s mean={float(np.mean(gt)):.5f}",
          flush=True)

    class T:
        sampler = None
        filter_config = None
        seed = 0

    out = {}
    for label, (mode, minr) in modes.items():
        vals = []
        for seed in seeds:
            T.seed = seed
            t0 = time.time()
            img, _ = render_gpt(
                scene,
                GPTConfig(spp=spp, max_depth=max_depth,
                          shift_mapping_min_roughness=minr),
                task=T(),
                shift_mode=mode,
            )
            m = float(np.mean((np.asarray(img) - gt) ** 2))
            vals.append(m)
            print(f"  seed {seed} {label}: {m:.6e} ({time.time()-t0:.0f}s)",
                  flush=True)
        out[label] = vals
    return out, float(np.mean(gt))


def main():
    if os.environ.get("AKR_FORCE_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    which = sys.argv[1:] or ["blinds", "cbox", "glossy"]
    record_path = ROOT / "BENCH_MSE_GLOSSY.json"
    rec = json.loads(record_path.read_text())
    import jax

    plat = jax.devices()[0].platform

    def mean(v):
        return float(np.mean(v))

    if "cbox" in which:
        print("cbox:", flush=True)
        mse, gmean = measure(
            "/root/reference/scenes/cbox/scene.json", 5,
            {"reconnect": ("reconnect", 0.2), "pss": ("pss", 0.2)},
        )
        rec["cbox"] = {
            "protocol": "PT gt 3072 spp, GPT 6 spp, max_depth 5, 96x96, "
                        f"min_roughness 0.2, seeds {SEEDS}, {plat} "
                        "(round-5 re-measure after the separate-weights + "
                        "no-vertex-fallback fixes)",
            "mse": {k: v for k, v in mse.items()},
            "mse_mean": {k: mean(v) for k, v in mse.items()},
            "winner": min(mse, key=lambda k: mean(mse[k])),
        }
        print(json.dumps(rec["cbox"]["mse_mean"]), flush=True)

    if "glossy" in which:
        print("glossy:", flush=True)
        mse, gmean = measure(
            ROOT / "scenes/glossy/scene.json", 4,
            {
                "reconnect@0.1": ("reconnect", 0.1),
                "reconnect@0.25": ("reconnect", 0.25),
                "reconnect@0.4": ("reconnect", 0.4),
                "pss": ("pss", 0.25),
            },
        )
        rec["protocol"] = (
            "PT gt 3072 spp; GPT 6 spp, max_depth 4, 96x96, seeds "
            f"{SEEDS}, {plat} (round-5 re-measure)"
        )
        rec["ground_truth_mean"] = round(gmean, 4)
        rec["mse"] = {k: v for k, v in mse.items()}
        rec["mse_mean"] = {k: mean(v) for k, v in mse.items()}
        rec["winner"] = min(mse, key=lambda k: mean(mse[k]))
        print(json.dumps(rec["mse_mean"]), flush=True)

    if "blinds" in which:
        print("blinds:", flush=True)
        mse, gmean = measure(ROOT / "scenes/blinds/scene.json", 4,
                             {"reconnect": ("reconnect", 0.2),
                              "pss": ("pss", 0.2)})
        rec["blinds"]["mse"] = {k: v for k, v in mse.items()}
        rec["blinds"]["mse_mean"] = {k: mean(v) for k, v in mse.items()}
        rec["blinds"]["winner"] = min(mse, key=lambda k: mean(mse[k]))
        rec["blinds"]["protocol"] = (
            "PT gt 3072 spp, GPT 6 spp, max_depth 4, 96x96, min_roughness "
            f"0.2, seeds {SEEDS}, {plat} (round-5 re-measure)"
        )
        print(json.dumps(rec["blinds"]["mse_mean"]), flush=True)

    record_path.write_text(json.dumps(rec, indent=2) + "\n")
    print("record written", flush=True)


if __name__ == "__main__":
    main()
