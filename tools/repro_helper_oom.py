"""Minimal reproducer for the remote-compile-helper OOM (VERDICT r4 #8).

The axon relay compiles TPU programs in a chipless helper process. Large
Pallas kernels — the fused-shade kernel above 512-lane blocks, and every
megakernel variant — make that helper's Mosaic backend OOM (SIGKILL /
opaque HTTP 500) or run >35 min. Local lowering of the same kernels takes
seconds, so the blocker is the helper's memory ceiling, not the kernel
graph. This script is the smallest artifact that exhibits it:

  1. builds the production fused-shade kernel on a 2-material scene at
     AKR_PSHADE_BLOCK=1024 (the smallest size observed to OOM the helper)
  2. lowers it locally (expected: seconds — prints the time)
  3. attempts the remote compile in a SUBPROCESS with a hard timeout and
     reports ok / timeout / helper-error

DECISION (round 5, recorded here + ARCHITECTURE.md): on this toolchain the
large-Pallas tiers (megakernel, pshade>512) are FROZEN. The production path
is the XLA shade + albedo-curve hoist + the static-refine pair walk — all
measured faster than the frozen tiers' best case anyway (pshade was 23x
slower where it DID compile). Re-evaluate if a future relay lifts the
helper's memory ceiling: rerun this script; if step 3 says "ok", unfreeze
by racing mk/pshade again in bench.py's VARIANTS.

Usage: python3 tools/repro_helper_oom.py [--timeout 900] [--block 1024]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def child(block: int):
    """Lower + compile the fused-shade kernel at the given block size."""
    os.environ["AKR_PSHADE_BLOCK"] = str(block)
    import jax
    import jax.numpy as jnp

    from akari_render_tpu.integrators.pallas_shade import (
        pallas_shade, shade_bake,
    )
    from akari_render_tpu.scene import load_scene

    scene = load_scene("/root/reference/scenes/cbox/scene.json",
                       width=64, height=64)
    assert shade_bake(scene) is not None, "scene outside pshade scope"
    n = 1 << 16

    def fn(ng, ft, fb, fn_, mat, wo, u_bsdf, ls_wi, ls_li, ls_pdf):
        si = {"ng": ng, "mat": mat, "frame": (ft, fb, fn_),
              "kind": jnp.zeros((n,), jnp.int32)}
        extra = {"wo": wo, "u_bsdf": u_bsdf, "ls_wi": ls_wi, "ls_li": ls_li,
                 "ls_pdf": ls_pdf}
        return pallas_shade(scene, si, extra)["f"]

    v3 = jnp.zeros((n, 3))
    args = (
        v3, v3, v3, v3, jnp.zeros((n,), jnp.int32), v3,
        v3, v3, v3, jnp.zeros((n,)),
    )
    t0 = time.time()
    lowered = jax.jit(fn).lower(*args)
    print(f"LOWER_OK {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    lowered.compile()
    print(f"COMPILE_OK {time.time()-t0:.1f}s", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=float, default=900.0)
    ap.add_argument("--block", type=int, default=1024)
    ap.add_argument("--child", action="store_true")
    args = ap.parse_args()
    if args.child:
        child(args.block)
        return
    r = {"block": args.block, "timeout_s": args.timeout}
    try:
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child",
             "--block", str(args.block)],
            timeout=args.timeout, capture_output=True, text=True,
        )
        r["lower"] = "ok" if "LOWER_OK" in p.stdout else "failed"
        r["compile"] = "ok" if "COMPILE_OK" in p.stdout else (
            "helper-error rc=%d: %s" % (
                p.returncode, (p.stderr.strip().splitlines() or [""])[-1][:200]
            )
        )
        r["stdout_tail"] = p.stdout.strip().splitlines()[-3:]
    except subprocess.TimeoutExpired:
        r["compile"] = f"timeout after {args.timeout:.0f}s (helper wedged/OOM)"
    print(json.dumps(r))


if __name__ == "__main__":
    main()
