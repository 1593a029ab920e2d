"""Fill BENCH_MSE_GLOSSY.json's cbox shift-mode entry (VERDICT r2 item 5).

Protocol documented in the record itself: cbox 96x96, max_depth 5,
PT ground truth 3072 spp, GPT 6 spp (~5 traced paths per sample = 30-path
budget), shift_mapping_min_roughness 0.2. Diffuse receivers are where the
reconnection shift must beat primary-sample-space replay (ref
crates/akari_integrator/src/gpt.rs:318-331); the recorded numbers are
asserted by tests/test_integrators.py::test_glossy_shift_mode_record.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import numpy as np

    from akari_render_tpu.config import GPTConfig, PTConfig
    from akari_render_tpu.integrators.gpt import render_gpt
    from akari_render_tpu.integrators.pt import render_pt
    from akari_render_tpu.scene import load_scene

    record_path = Path(__file__).resolve().parent.parent / "BENCH_MSE_GLOSSY.json"
    rec = json.loads(record_path.read_text())

    scene = load_scene("/root/reference/scenes/cbox/scene.json",
                       width=96, height=96)
    t0 = time.time()
    gt, _ = render_pt(scene, PTConfig(spp=3072, max_depth=5, spp_per_pass=256))
    print(f"gt done {time.time()-t0:.1f}s mean={float(np.mean(gt)):.5f}",
          flush=True)

    mse = {}
    for mode in ("reconnect", "pss"):
        t0 = time.time()
        img, _ = render_gpt(
            scene,
            GPTConfig(spp=6, max_depth=5, shift_mapping_min_roughness=0.2),
            shift_mode=mode,
        )
        mse[mode] = float(np.mean((img - gt) ** 2))
        print(f"{mode}: mse={mse[mode]:.6e} ({time.time()-t0:.1f}s)",
              flush=True)

    import jax

    plat = jax.devices()[0].platform
    rec["cbox"]["mse"] = mse
    rec["cbox"]["note"] = (
        f"measured on {plat}: reconnection beats PSS replay on the "
        "diffuse-receiver scene, the regime the shift exists for"
        if mse["reconnect"] < mse["pss"]
        else f"measured on {plat}: UNEXPECTED - pss <= reconnect on cbox"
    )
    record_path.write_text(json.dumps(rec, indent=2) + "\n")
    print(json.dumps(rec["cbox"], indent=2), flush=True)


if __name__ == "__main__":
    main()
