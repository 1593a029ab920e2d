"""Sampling warps and their inverses (needed for MCMC replay).

Reference semantics: crates/akari_render/src/sampling.rs:4-71.
All functions are batched: u is [..., 2] or [...], outputs broadcast.
"""
from __future__ import annotations

import jax.numpy as jnp

from .math import dot

PI = jnp.float32(jnp.pi)
INV_PI = jnp.float32(1.0 / jnp.pi)
TWO_PI = jnp.float32(2.0 * jnp.pi)
INV_2PI = jnp.float32(0.5 / jnp.pi)


def uniform_sample_disk(u):
    r = jnp.sqrt(u[..., 0])
    phi = u[..., 1] * TWO_PI
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def invert_uniform_sample_disk(p):
    r2 = p[..., 0] ** 2 + p[..., 1] ** 2
    phi = jnp.arctan2(p[..., 1], p[..., 0]) * INV_2PI
    return jnp.stack([r2, jnp.mod(phi, 1.0)], axis=-1)


def cos_sample_hemisphere(u):
    d = uniform_sample_disk(u)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - d[..., 0] ** 2 - d[..., 1] ** 2))
    return jnp.concatenate([d, z[..., None]], axis=-1)


def invert_cos_sample_hemisphere(w):
    return invert_uniform_sample_disk(w[..., :2])


def cos_hemisphere_pdf(cos_theta):
    return cos_theta * INV_PI


def uniform_sample_triangle(u):
    """Low-distortion triangle warp (ref sampling.rs:32-44), returns barycentric (b0, b1)."""
    ux, uy = u[..., 0], u[..., 1]
    lt = ux < uy
    b0 = jnp.where(lt, ux * 0.5, ux - uy * 0.5)
    b1 = jnp.where(lt, uy - ux * 0.5, uy * 0.5)
    return jnp.stack([b0, b1], axis=-1)


def erf_inv(x):
    """Inverse error function (Giles 2010 approximation, as in ref util/mod.rs)."""
    x = jnp.clip(x, -0.99999, 0.99999)
    w = -jnp.log((1.0 - x) * (1.0 + x))
    small = w < 5.0
    w1 = w - 2.5
    w2 = jnp.sqrt(jnp.maximum(w, 1e-12)) - 3.0
    p_small = 2.81022636e-08
    p_small = 3.43273939e-07 + p_small * w1
    p_small = -3.5233877e-06 + p_small * w1
    p_small = -4.39150654e-06 + p_small * w1
    p_small = 0.00021858087 + p_small * w1
    p_small = -0.00125372503 + p_small * w1
    p_small = -0.00417768164 + p_small * w1
    p_small = 0.246640727 + p_small * w1
    p_small = 1.50140941 + p_small * w1
    p_big = -0.000200214257
    p_big = 0.000100950558 + p_big * w2
    p_big = 0.00134934322 + p_big * w2
    p_big = -0.00367342844 + p_big * w2
    p_big = 0.00573950773 + p_big * w2
    p_big = -0.0076224613 + p_big * w2
    p_big = 0.00943887047 + p_big * w2
    p_big = 1.00167406 + p_big * w2
    p_big = 2.83297682 + p_big * w2
    return jnp.where(small, p_small, p_big) * x


def erf(x):
    """Error function (Abramowitz & Stegun 7.1.26)."""
    sign = jnp.sign(x)
    x = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * x)
    y = 1.0 - (((((1.061405429 * t - 1.453152027) * t) + 1.421413741) * t - 0.284496736) * t + 0.254829592) * t * jnp.exp(-x * x)
    return sign * y


def sample_gaussian(u):
    return jnp.sqrt(jnp.float32(2.0)) * erf_inv(2.0 * u - 1.0)


def uniform_discrete_choice_and_remap(n, u):
    """Pick i ∈ [0, n) uniformly from u, return (i, remapped u)."""
    i = jnp.clip(jnp.floor(u * n).astype(jnp.int32), 0, n - 1)
    return i, u * n - i.astype(jnp.float32)


def weighted_discrete_choice2_and_remap(weight_a, u):
    """Binary weighted choice: returns (pick_a_mask, remapped u).

    (ref sampling.rs:60-71 — used by all BSDF lobe selection).
    """
    first = u < weight_a
    remapped = jnp.where(
        first,
        u / jnp.maximum(weight_a, 1e-20),
        (u - weight_a) / jnp.maximum(1.0 - weight_a, 1e-20),
    )
    return first, jnp.clip(remapped, 0.0, 1.0)


def mis_weight(pdf_a, pdf_b, power: int = 1):
    """Balance (power=1) / power heuristic (ref pt.rs:962-973)."""
    a = pdf_a**power
    b = pdf_b**power
    return a / jnp.maximum(a + b, 1e-30)
