"""Path tracer integrator: per-pass wavefront rendering into a Film.

Reference: crates/akari_integrator/src/pt.rs:1056-1172 (PathTracer::render —
per-pixel kernel with spp_per_pass inner loop, host pass loop with progress
and intermediate stats). TPU: each pass jit-traces `spp_chunk` samples for
every pixel; the host loop accumulates into the film and collects the same
stats-JSON series (time, spp) the reference emits (lib.rs:24-37).
"""
from __future__ import annotations

import time
from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np

from ..camera import generate_rays
from ..config import PTConfig
from ..core.film import Film, add_samples, develop
from ..core.filters import filter_from_config
from ..core.samplers import IndependentSampler
from ..scene import Scene
from .common import PTSettings, trace_paths


def _render_pass_fn(scene: Scene, settings: PTSettings, filt, width, height, spp_chunk, seed=0, sampler_config=None):
    """Build the jitted one-pass function (traced once, reused every pass).

    Renders `spp_chunk` samples per pixel per call with the sample loop
    INSIDE jit (lax.fori_loop) so one device dispatch covers the whole pass —
    important under the remote-TPU relay where each dispatch has high latency.
    """

    npix = width * height
    from ..core.lds import make_sampler

    def one_sample(sample_idx, carry):
        film, arrays = carry
        sc = replace(scene, arrays=arrays)
        pix = jnp.arange(npix, dtype=jnp.uint32)
        sampler = make_sampler(sampler_config, pix, sample_idx.astype(jnp.uint32), seed)
        sampler, u_film = sampler.next_2d()
        off, fw = filt.sample(u_film)
        p_film = (
            jnp.stack(
                [(pix % width).astype(jnp.float32), (pix // width).astype(jnp.float32)], -1
            )
            + 0.5
            + off
        )
        ray_o, ray_d = generate_rays(sc.camera, p_film)
        radiance, aux, sampler = trace_paths(sc, settings, ray_o, ray_d, sampler)
        # lane i IS pixel i: no scatter (pt.rs:1100 binning semantics)
        from ..core.film import add_samples_aligned

        film = add_samples_aligned(film, radiance, fw)
        return film, arrays

    def one_pass(arrays, film: Film, start_sample):
        start = start_sample.astype(jnp.int32)
        film, _ = jax.lax.fori_loop(
            start, start + spp_chunk, one_sample, (film, arrays)
        )
        return film

    return jax.jit(one_pass, donate_argnums=(1,))


def render_pt(scene: Scene, config: PTConfig, task=None, progress_cb=None,
              checkpoint_path=None, checkpoint_every: int = 0, session=None):
    """Render, returning (image [H, W, 3] numpy, stats dict).

    checkpoint_path: if set, resume from it when compatible and save the
    film + pass counter there every `checkpoint_every` passes (new vs the
    reference, which cannot resume renders — SURVEY.md §5)."""
    width, height = scene.camera.width, scene.camera.height
    filt = filter_from_config(task.filter_config if task else None)
    settings = PTSettings(
        max_depth=config.max_depth,
        rr_depth=config.rr_depth,
        use_nee=config.use_nee,
        indirect_only=config.indirect_only,
        force_diffuse=config.force_diffuse,
        clamp_indirect=config.clamp_indirect,
    )
    # samples per dispatch: amortize device-dispatch latency without
    # blowing up per-pass wall time (the sample loop is fori inside jit)
    spp_chunk = min(config.spp, config.spp_per_pass)
    seed = task.seed if task else 0
    sampler_config = task.sampler if task else None
    pass_fns: dict = {}

    def get_pass(chunk):
        if chunk not in pass_fns:
            pass_fns[chunk] = _render_pass_fn(
                scene, settings, filt, width, height, chunk,
                seed=seed, sampler_config=sampler_config,
            )
        return pass_fns[chunk]

    from ..stats import RenderStats

    render_stats = RenderStats()
    film = Film.new(width, height)
    done = 0  # samples accumulated so far (absolute sample index is the
    # sampler key, so pass chunking is free to vary without bias)
    if checkpoint_path:
        from ..checkpoint import load_checkpoint

        ck = load_checkpoint(checkpoint_path)
        if ck is not None and ck[1].get("kind") == "pt":
            film, meta, _ = ck
            done = int(meta.get("samples_done", 0))
    stats = {"time": [], "spp": []}
    t0 = time.time()

    # Adaptive pass sizing (TPU only): the remote-TPU relay kills dispatches
    # after ~60s, so calibrate per-sample cost with a 1-spp probe and halve
    # spp_chunk until a pass fits the budget. Reference method configs ship
    # spp_per_pass=64, which exceeds the watchdog on slow scenes.
    import os

    from ..scene import _on_tpu

    try:
        budget = float(os.environ.get("AKR_MAX_PASS_SECONDS", "40"))
    except ValueError:
        budget = 40.0  # malformed env: fall back to the default budget
    if (
        _on_tpu()
        and budget > 0
        and spp_chunk > 1
        and config.spp - done > 2
        and os.environ.get("AKR_ADAPTIVE_PASS", "1") != "0"
    ):
        probe = get_pass(1)
        film = probe(scene.arrays, film, jnp.uint32(done))  # compile + run
        jax.block_until_ready(film)
        done += 1
        tp = time.time()
        film = probe(scene.arrays, film, jnp.uint32(done))
        jax.block_until_ready(film)
        done += 1
        per_spp = time.time() - tp
        max_chunk = max(1, int(budget / max(per_spp, 1e-6)))
        remaining = config.spp - done
        if spp_chunk > max_chunk:
            # balance chunks over the remaining samples (fewest equal-ish
            # passes within budget -> usually a single extra compile)
            n = -(-remaining // max_chunk)
            spp_chunk = -(-remaining // n)

    from ..stats import profiler_from_env

    prof = profiler_from_env()
    pass_no = 0
    while done < config.spp:
        chunk = min(spp_chunk, config.spp - done)
        if prof is not None:
            with prof.profile(f"pt_pass[spp={chunk}]"):
                film = get_pass(chunk)(scene.arrays, film, jnp.uint32(done))
                jax.block_until_ready(film)
        else:
            film = get_pass(chunk)(scene.arrays, film, jnp.uint32(done))
        done += chunk
        pass_no += 1
        last = done >= config.spp
        if progress_cb and (pass_no % 16 == 0 or last):
            jax.block_until_ready(film)
            stats["time"].append(time.time() - t0)
            stats["spp"].append(done)
            progress_cb(done, config.spp, stats)
        if checkpoint_path and checkpoint_every and pass_no % checkpoint_every == 0:
            from ..checkpoint import save_checkpoint

            jax.block_until_ready(film)
            save_checkpoint(
                checkpoint_path, film, {"kind": "pt", "samples_done": done}
            )
        if session is not None and session.save_intermediate:
            # per-pass EXR dumps + stats series (pt.rs:1138-1155 protocol)
            from pathlib import Path

            from ..core.image_io import write_image

            jax.block_until_ready(film)
            ipath = str(Path(session.out_dir) / f"{session.name}-{done}.exr")
            write_image(ipath, np.asarray(develop(film, width, height)))
            render_stats.record(time.time() - t0, done, ipath)
        if session is not None and session.display is not None and (
            pass_no % 4 == 0 or last
        ):
            jax.block_until_ready(film)
            session.display(np.asarray(develop(film, width, height)))
    jax.block_until_ready(film)
    if prof is not None:
        prof.print_report()
    stats["total_time"] = time.time() - t0
    stats["spp_total"] = done
    if session is not None:
        render_stats.record(stats["total_time"], stats["spp_total"])
        if session.save_stats:
            render_stats.write(session)
    img = np.asarray(develop(film, width, height))
    return img, stats
