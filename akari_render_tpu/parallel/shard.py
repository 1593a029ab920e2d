"""Multi-chip data-parallel rendering over a jax.sharding.Mesh.

The reference is strictly single-device (SURVEY.md §2.3: no NCCL/MPI
anywhere); this module is the net-new TPU scaling layer. Strategy (the
natural one for a replicated-scene renderer):

- scene arrays are REPLICATED on every chip (cbox ~KBs, big scenes ~100s MB —
  fits HBM; sharded-BVH is future work);
- pixels (lanes) are SHARDED over the mesh axis "d": each chip traces its
  slice of the image with its own sample streams;
- the film is merged with a `psum` over ICI at pass boundaries — the
  collective replacement for the reference's device-atomic film writes
  (film.rs:186-228).

MCMC shards chains, GPT shards tiles — same pattern, different lane meaning.
"""
from __future__ import annotations

from dataclasses import replace
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..camera import generate_rays
from ..core.film import Film, add_samples
from ..core.pcg import Pcg32, U64
from ..core.samplers import IndependentSampler
from ..integrators.common import PTSettings, trace_paths


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), ("d",))


def make_sharded_pass(scene, settings: PTSettings, filt, width: int, height: int, mesh: Mesh):
    """Build the jitted multi-chip one-pass function.

    Lanes = all pixels, sharded over "d". Returns fn(arrays, film, pass_idx)
    with film replicated (psum-merged every pass).
    """
    npix = width * height
    ndev = mesh.devices.size
    assert npix % ndev == 0, f"{npix} pixels not divisible by {ndev} devices"

    def shard_body(arrays, film, pix, pass_idx):
        # pix: [npix/ndev] local pixel ids; scene replicated, FILM SHARDED:
        # lane i of the shard IS film row pix[i], so accumulation is a pure
        # elementwise add and a pass needs ZERO inter-chip communication —
        # the film only gathers at develop time. (The psum-every-pass scheme
        # is only needed for splatting integrators; see render_mcmc_sharded.)
        sc = replace(scene, arrays=arrays)
        seq = U64(jnp.broadcast_to(pass_idx.astype(jnp.uint32), pix.shape), pix)
        sampler = IndependentSampler(Pcg32.new_seq(seq))
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
        radiance, aux, _ = trace_paths(sc, settings, ray_o, ray_d, sampler)
        from ..core.film import add_samples_aligned

        return add_samples_aligned(film, radiance, fw)

    sharded = shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(P(), P("d"), P("d"), P()),
        out_specs=P("d"),
        check_rep=False,
    )

    @jax.jit
    def one_pass(arrays, film, pass_idx):
        pix = jnp.arange(npix, dtype=jnp.uint32)
        return sharded(arrays, film, pix, pass_idx)

    return one_pass


def render_pt_sharded(scene, config, task=None, mesh: Mesh | None = None, progress_cb=None):
    """Multi-chip PT render (host pass loop, replicated film)."""
    import time

    from ..core.film import develop
    from ..core.filters import filter_from_config

    mesh = mesh or make_mesh()
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
    one_pass = make_sharded_pass(scene, settings, filt, width, height, mesh)
    film = Film.new(width, height)
    t0 = time.time()
    for p in range(config.spp):
        film = one_pass(scene.arrays, film, jnp.uint32(p))
    jax.block_until_ready(film)
    stats = {"total_time": time.time() - t0, "spp_total": config.spp, "devices": mesh.devices.size}
    img = np.asarray(develop(film, width, height))
    return img, stats
