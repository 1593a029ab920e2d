"""Gradient-domain path tracing with screened-Poisson reconstruction.

Reference: crates/akari_integrator/src/gpt.rs — base path + 4 shifted paths
(±x, ±y, reflected at borders), gradient films Gx/Gy, accumulation + squared
films for variance, and iterative Jacobi screened-Poisson reconstruction
(gpt.rs:487-612) with optional inverse-variance weights.

Shift mapping: two modes.
- "reconnect" (default): replay prefix + deterministic reconnection to the
  base path's recorded vertex with the full jacobian (gpt_reconnect.py),
  the reference's hybrid shift (pt.rs:328-900).
- "pss": pure primary-sample-space replay (jacobian 1, weight 1/2) — a
  simpler unbiased fallback.
"""
from __future__ import annotations

import time
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..camera import generate_rays
from ..config import GPTConfig
from ..core.film import Film, add_samples, develop
from ..core.filters import filter_from_config
from ..core.pcg import Pcg32, U64, pcg32_next_f32
from ..scene import Scene
from .common import PTSettings, trace_paths
from .mcmc import ReplaySampler, sample_dimension

OFFSETS = np.array([[1, 0], [-1, 0], [0, 1], [0, -1]], np.int32)


def _eval_from_pixel(scene: Scene, settings, filt, pix_xy, pss, rng):
    """Trace one path per lane from integer pixel coords with replayed PSS."""
    sampler = ReplaySampler(pss, jnp.zeros(pss.shape[0], jnp.int32), rng)
    sampler, u_film = sampler.next_2d()
    off, fw = filt.sample(u_film)
    p_film = pix_xy.astype(jnp.float32) + 0.5 + off
    ray_o, ray_d = generate_rays(scene.camera, p_film)
    radiance, _, sampler = trace_paths(scene, settings, ray_o, ray_d, sampler)
    return p_film, radiance * fw[..., None], sampler.rng


def _reflect_offset(pix, off, width, height):
    """Shifted pixel with border reflection (gpt.rs:126-140)."""
    p = pix + off
    p = jnp.where(p < 0, -p, p)
    lim = jnp.array([width - 1, height - 1])
    p = jnp.where(p > lim, 2 * lim - p, p)
    return p


def render_gpt(scene: Scene, config: GPTConfig, task=None, progress_cb=None,
               shift_mode: str = "reconnect"):
    t0 = time.time()
    width, height = scene.camera.width, scene.camera.height
    npix = width * height
    filt = filter_from_config(task.filter_config if task else None)
    settings = PTSettings(
        max_depth=config.max_depth, rr_depth=config.rr_depth, use_nee=config.use_nee
    )
    D = sample_dimension(config.max_depth)
    seed = task.seed if task else 0

    def one_pass(arrays, films, sample_idx):
        from dataclasses import replace

        sc = replace(scene, arrays=arrays)
        primal, gx, gy, primal_sq, gx_sq, gy_sq = films
        pix_lin = jnp.arange(npix, dtype=jnp.uint32)
        pix = jnp.stack(
            [(pix_lin % width).astype(jnp.int32), (pix_lin // width).astype(jnp.int32)], -1
        )
        # PSS vector per pixel for this sample
        rng = Pcg32.new_seq(U64(sample_idx.astype(jnp.uint32) ^ jnp.uint32(seed), pix_lin))
        us = []
        for _ in range(D):
            rng, u = pcg32_next_f32(rng)
            us.append(u)
        pss = jnp.stack(us, -1)

        if shift_mode == "reconnect":
            from .gpt_reconnect import trace_base_record
            from .mcmc import ReplaySampler

            sampler = ReplaySampler(pss, jnp.zeros(npix, jnp.int32), rng)
            sampler, u_film = sampler.next_2d()
            off, fw = filt.sample(u_film)
            p_film = pix.astype(jnp.float32) + 0.5 + off
            ray_o, ray_d = generate_rays(sc.camera, p_film)
            base, rec, sampler = trace_base_record(
                sc, settings, ray_o, ray_d, sampler,
                min_dist=config.shift_mapping_min_dist,
                min_rough=config.shift_mapping_min_roughness,
            )
            base = base * fw[..., None]
            rng = sampler.rng
        else:
            rec = None
            p_film, base, rng = _eval_from_pixel(sc, settings, filt, pix, pss, rng)
        w1 = jnp.ones(npix)
        primal = add_samples(primal, p_film, base, w1, width, height)
        primal_sq = add_samples(primal_sq, p_film, base * base, w1, width, height)

        stride = config.stride
        for off in OFFSETS:  # offsets are static at trace time
            positive = int(off[0] + off[1]) > 0
            is_x = off[0] != 0
            off_j = jnp.asarray(off * stride)
            spix = _reflect_offset(pix, off_j, width, height)
            if shift_mode == "reconnect":
                from .gpt_reconnect import trace_shift_reconnect
                from .mcmc import ReplaySampler

                sampler = ReplaySampler(pss, jnp.zeros(npix, jnp.int32), rng)
                sampler, u_film = sampler.next_2d()
                soff, sfw = filt.sample(u_film)
                sp_film = spix.astype(jnp.float32) + 0.5 + soff
                s_o, s_d = generate_rays(sc.camera, sp_film)
                shifted, jac, sampler = trace_shift_reconnect(
                    sc, settings, s_o, s_d, sampler, rec,
                    min_dist=config.shift_mapping_min_dist,
                    min_rough=config.shift_mapping_min_roughness,
                )
                shifted = shifted * sfw[..., None]
                rng = sampler.rng
                # jacobian-aware pair MIS weight (gpt.rs:284-316)
                w = 1.0 / (1.0 + jac)
            else:
                _, shifted, rng = _eval_from_pixel(sc, settings, filt, spix, pss, rng)
                # PSS replay shift has jacobian 1 -> 1/(1+J) = 1/2
                w = jnp.full(npix, 0.5)
            # forward differences: G[p] = I[p + e] - I[p], stored at the
            # lower-index pixel of the pair
            grad = (shifted - base) if positive else (base - shifted)
            gpix = pix if positive else spix
            gp = gpix.astype(jnp.float32) + 0.5
            target = gx if is_x else gy
            tsq = gx_sq if is_x else gy_sq
            target = add_samples(target, gp, grad * w[..., None], w, width, height)
            tsq = add_samples(tsq, gp, grad * grad * w[..., None], w, width, height)
            if is_x:
                gx, gx_sq = target, tsq
            else:
                gy, gy_sq = target, tsq
        return (primal, gx, gy, primal_sq, gx_sq, gy_sq)

    one_pass = jax.jit(one_pass)
    films = tuple(Film.new(width, height) for _ in range(6))
    for s in range(config.spp):
        films = one_pass(scene.arrays, films, jnp.uint32(s))
    jax.block_until_ready(films)

    primal = develop(films[0], width, height)
    gx = develop(films[1], width, height)
    gy = develop(films[2], width, height)
    primal_sq = develop(films[3], width, height)
    gx_sq = develop(films[4], width, height)
    gy_sq = develop(films[5], width, height)

    var_p = jnp.maximum(primal_sq - primal**2, 1e-8)
    var_gx = jnp.maximum(gx_sq - gx**2, 1e-8)
    var_gy = jnp.maximum(gy_sq - gy**2, 1e-8)

    recon = screened_poisson(
        primal, gx, gy,
        None if config.uniform_weights else (var_p, var_gx, var_gy),
        iters=config.reconstruction_iter,
    )
    img = np.asarray(recon)
    stats = {
        "total_time": time.time() - t0,
        "spp_total": config.spp,
        "primal": np.asarray(primal),
        "gx": np.asarray(gx),
        "gy": np.asarray(gy),
    }
    return img, stats


def screened_poisson(primal, gx, gy, variances=None, iters: int = 30):
    """Jacobi iterations of the screened-Poisson system (gpt.rs:487-612).

    Solves argmin_R  a_p |R - P|^2 + |dx R - Gx|^2 + |dy R - Gy|^2 with
    optional inverse-variance weighting; pure stencil ops, ideal for TPU.
    Gx[i, j] estimates I[i, j+1] - I[i, j] (x = image column), Gy row-wise.
    """
    H, W, _ = primal.shape
    if variances is None:
        w_p = jnp.ones_like(primal)
        w_gx = jnp.ones_like(primal)
        w_gy = jnp.ones_like(primal)
    else:
        var_p, var_gx, var_gy = variances
        w_p = 1.0 / (var_p + 1e-6)
        w_gx = 1.0 / (var_gx + 1e-6)
        w_gy = 1.0 / (var_gy + 1e-6)
        # normalize primal weight like the reference's alpha schedule
        w_p = w_p * 0.2

    def prev(a, axis):  # value of the previous pixel along axis (j-1 / i-1)
        return jnp.roll(a, 1, axis=axis)

    def nxt(a, axis):  # value of the next pixel along axis (j+1 / i+1)
        return jnp.roll(a, -1, axis=axis)

    def body(i, r):
        # neighbor estimates through each gradient constraint:
        # Gx[p] = I[p+x] - I[p]  =>  R[p] ~ R[p-x] + Gx[p-x]  and  R[p] ~ R[p+x] - Gx[p]
        est_xp = prev(r, 1) + prev(gx, 1)  # from left neighbor
        est_xm = nxt(r, 1) - gx  # from right neighbor
        est_yp = prev(r, 0) + prev(gy, 0)  # from row above
        est_ym = nxt(r, 0) - gy  # from row below
        wxp = prev(w_gx, 1)
        wxm = w_gx
        wyp = prev(w_gy, 0)
        wym = w_gy
        # border: kill wrapped constraints
        col = jnp.arange(W)[None, :, None]
        row = jnp.arange(H)[:, None, None]
        wxp = jnp.where(col == 0, 0.0, wxp)
        wxm = jnp.where(col == W - 1, 0.0, wxm)
        wyp = jnp.where(row == 0, 0.0, wyp)
        wym = jnp.where(row == H - 1, 0.0, wym)
        num = primal * w_p + est_xp * wxp + est_xm * wxm + est_yp * wyp + est_ym * wym
        den = w_p + wxp + wxm + wyp + wym
        return num / jnp.maximum(den, 1e-12)

    return jax.lax.fori_loop(0, iters, body, primal)
