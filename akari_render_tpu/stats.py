"""Render session stats + stage profiling.

Reference: crates/akari_integrator/src/lib.rs:8-37 (RenderSession,
RenderStats/IntermediateStats — the `{session}.json` time/spp/path series
used for MSE-vs-time curves) and crates/akari_render/src/util/profile.rs
(DispatchProfiler aggregating per-stage dispatch timings).
"""
from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from pathlib import Path


@dataclass
class RenderSession:
    """Mirrors RenderSession (lib.rs:8-23). `display` is the DisplayChannel
    analog (gui.rs:92-110): a callable taking the current [H, W, 3] image,
    fed at progress cadence by every integrator (see gui.DisplayServer)."""

    name: str = "render"
    save_intermediate: bool = False
    save_stats: bool = False
    out_dir: str = "."
    display: object = None


@dataclass
class RenderStats:
    """The reference's stats-JSON format: intermediate = [{time, spp, path}]."""

    intermediate: list = field(default_factory=list)

    def record(self, t: float, spp: int, path: str = ""):
        self.intermediate.append({"time": t, "spp": spp, "path": path})

    def write(self, session: RenderSession):
        p = Path(session.out_dir) / f"{session.name}.json"
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(json.dumps({"intermediate": self.intermediate}))
        return p


def profiler_from_env():
    """AKR_PROFILE=1 turns on per-stage dispatch profiling in the
    integrator host loops (the reference wires DispatchProfiler into wfpt,
    profile.rs:77-121; we gate it because profiling forces a block per
    dispatch, which serializes the host-device pipeline)."""
    import os

    return DispatchProfiler() if os.environ.get("AKR_PROFILE") else None


class DispatchProfiler:
    """Per-stage wall-clock aggregation (profile.rs:25-122): total/min/max/
    avg per named stage. Use as a context manager around blocking dispatches."""

    def __init__(self):
        self.stages: dict[str, list[float]] = {}

    def profile(self, name: str):
        prof = self

        class _Ctx:
            def __enter__(self):
                self.t0 = time.perf_counter()
                return self

            def __exit__(self, *exc):
                prof.stages.setdefault(name, []).append(time.perf_counter() - self.t0)

        return _Ctx()

    def report(self) -> dict:
        out = {}
        for name, ts in self.stages.items():
            out[name] = {
                "count": len(ts),
                "total": sum(ts),
                "min": min(ts),
                "max": max(ts),
                "avg": sum(ts) / len(ts),
            }
        return out

    def print_report(self, file=None):
        import sys

        f = file or sys.stderr
        for name, s in sorted(self.report().items(), key=lambda kv: -kv[1]["total"]):
            print(
                f"  {name:<24} n={s['count']:<6} total={s['total']*1e3:9.1f}ms "
                f"avg={s['avg']*1e3:7.2f}ms min={s['min']*1e3:7.2f}ms max={s['max']*1e3:7.2f}ms",
                file=f,
            )
