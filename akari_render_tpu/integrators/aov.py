"""AOV (arbitrary output variable) renderer.

Reference: crates/akari_integrator/src/aov.rs:8-173 — renders shading
normal / geometric normal / tangent / albedo / roughness / first-hit
features with optional [-1,1] -> [0,1] remap. Output here is a dict of
images plus a primary `color` image (albedo) for the CLI.
"""
from __future__ import annotations

from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np

from ..camera import generate_rays
from ..config import AOVConfig
from ..core.film import Film, add_samples, develop
from ..core.filters import filter_from_config
from ..core.math import Frame
from ..core.pcg import Pcg32, U64
from ..core.samplers import IndependentSampler
from ..scene import Scene


def _aov_pass_fn(scene: Scene, width, height, remap: bool):
    npix = width * height
    from .pt import max_wavefront_lanes

    pb = min(npix, max_wavefront_lanes(scene))
    n_blocks = -(-npix // pb)

    def one_sample(sc: Scene, sample_idx, films, p0):
        a = sc.arrays
        # big frames trace pb-lane pixel blocks (one per dispatch, like pt):
        # out-of-range lanes clamp and fall out via add_samples' drop mode
        pix = jnp.minimum(
            p0 + jnp.arange(pb, dtype=jnp.uint32), jnp.uint32(npix - 1)
        )
        mask_lane = (p0 + jnp.arange(pb, dtype=jnp.uint32)) < npix
        sampler = IndependentSampler(Pcg32.new_seq(U64(sample_idx.astype(jnp.uint32), pix)))
        sampler, u_film = sampler.next_2d()
        p_film = (
            jnp.stack(
                [(pix % width).astype(jnp.float32), (pix // width).astype(jnp.float32)], -1
            )
            + 0.5
            + (u_film - 0.5)
        )
        ray_o, ray_d = generate_rays(sc.camera, p_film)
        n = pb
        hit = sc.intersect(ray_o, ray_d, jnp.zeros(n), jnp.full(n, 1e20))
        si = sc.surface_interaction(jnp.maximum(hit.tri_id, 0), hit.bary)
        wo = -ray_d
        t, b, nrm = si["frame"]
        albedo = jnp.zeros((n, 3))
        roughness = jnp.zeros((n,))
        ns_out = jnp.zeros((n, 3))
        sampler, u_sel = sampler.next_1d()
        for mask, closure in sc.dispatch_closures(si):
            alb = closure.albedo(wo) + closure.emission(wo)
            r = closure.roughness(wo, u_sel)
            nsv = closure.ns()
            albedo = jnp.where(mask[..., None], alb, albedo)
            roughness = jnp.where(mask, r, roughness)
            ns_out = jnp.where(mask[..., None], nsv, ns_out)

        def rm(v):
            return v * 0.5 + 0.5 if remap else v

        valid = hit.valid & mask_lane
        w = jnp.where(mask_lane, 1.0, 0.0)
        outs = {
            "albedo": albedo,
            "ns": rm(ns_out),
            "ng": rm(si["ng"]),
            "tangent": rm(t),
            "bitangent": rm(b),
            "roughness": roughness[..., None] * jnp.ones(3),
            "depth": hit.t[..., None] * jnp.ones(3),
        }
        new_films = {}
        for k, film in films.items():
            val = jnp.where(valid[..., None], outs[k], 0.0)
            new_films[k] = add_samples(film, p_film, val, w, width, height)
        return new_films

    def one_pass_blk(arrays, films, pass_idx, p0):
        return one_sample(replace(scene, arrays=arrays), pass_idx, films, p0)

    jitted = jax.jit(one_pass_blk)

    def run_pass(arrays, films, pass_idx):
        for b in range(n_blocks):
            films = jitted(arrays, films, pass_idx, jnp.uint32(b * pb))
        return films

    return run_pass


AOV_NAMES = ["albedo", "ns", "ng", "tangent", "bitangent", "roughness", "depth"]


def render_aov(scene: Scene, config: AOVConfig, task=None, remap: bool = True):
    import time

    width, height = scene.camera.width, scene.camera.height
    films = {k: Film.new(width, height) for k in AOV_NAMES}
    one_pass = _aov_pass_fn(scene, width, height, remap)
    t0 = time.time()
    for p in range(config.spp):
        films = one_pass(scene.arrays, films, jnp.uint32(p))
    jax.block_until_ready(films)
    stats = {"total_time": time.time() - t0, "spp_total": config.spp}
    images = {k: np.asarray(develop(f, width, height)) for k, f in films.items()}
    stats["aovs"] = list(images.keys())
    return images["albedo"], {**stats, "images": images}
