"""Texture sampling: atlas of 2D images + procedural noise.

TPU-native replacement for LuisaCompute BindlessArray tex2d sampling
(ref heap.rs bind_tex2d + eval.rs RgbImageTex): all images live in one
[n_layers, H, W, 4] padded array; sampling is manual bilinear with
address-mode index math — plain XLA gathers.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class TextureAtlas(NamedTuple):
    data: jnp.ndarray  # [L, H, W, 4] float32 (all images padded to max size)
    sizes: jnp.ndarray  # [L, 2] (width, height) actual sizes

    @staticmethod
    def build(images: list[np.ndarray]) -> "TextureAtlas":
        """images: list of [h, w, 4] float32 arrays (already linearized where
        needed happens at sample time for 8-bit srgb — we store raw values)."""
        if not images:
            images = [np.zeros((1, 1, 4), np.float32)]
        mh = max(im.shape[0] for im in images)
        mw = max(im.shape[1] for im in images)
        data = np.zeros((len(images), mh, mw, 4), np.float32)
        sizes = np.zeros((len(images), 2), np.int32)
        for i, im in enumerate(images):
            h, w = im.shape[:2]
            data[i, :h, :w] = im
            sizes[i] = (w, h)
        return TextureAtlas(jnp.asarray(data), jnp.asarray(sizes))


def _address(i, n, mode: str):
    if mode == "repeat":
        return jnp.mod(i, n)
    if mode == "mirror":
        period = 2 * n
        j = jnp.mod(i, period)
        return jnp.where(j >= n, period - 1 - j, j)
    if mode == "extend":
        return jnp.clip(i, 0, n - 1)
    # 'clip' handled by caller (zero outside)
    return jnp.clip(i, 0, n - 1)


def sample_texture(atlas: TextureAtlas | None, layer, uv, extension: str, interpolation: str):
    """Bilinear/nearest sample [N] layers at [N, 2] uvs -> [N, 4].

    v axis: images are stored flipped (load.rs:599 flipv) so v=0 is the
    bottom — we flip at load time instead and sample directly.
    """
    if atlas is None:
        return jnp.ones(uv.shape[:-1] + (4,))
    w = atlas.sizes[layer, 0].astype(jnp.float32)
    h = atlas.sizes[layer, 1].astype(jnp.float32)
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    wi_ = atlas.sizes[layer, 0]
    hi_ = atlas.sizes[layer, 1]

    def fetch(ix, iy):
        cx = _address(ix, wi_, extension)
        cy = _address(iy, hi_, extension)
        val = atlas.data[layer, cy, cx]
        if extension == "clip":
            inside = (ix >= 0) & (ix < wi_) & (iy >= 0) & (iy < hi_)
            val = jnp.where(inside[..., None], val, 0.0)
        return val

    if interpolation == "nearest":
        return fetch(jnp.round(x).astype(jnp.int32), jnp.round(y).astype(jnp.int32))
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    c00 = fetch(x0, y0)
    c10 = fetch(x0 + 1, y0)
    c01 = fetch(x0, y0 + 1)
    c11 = fetch(x0 + 1, y0 + 1)
    return (
        c00 * (1 - fx) * (1 - fy)
        + c10 * fx * (1 - fy)
        + c01 * (1 - fx) * fy
        + c11 * fx * fy
    )


# ---- Perlin noise (Blender-compatible shape; ref svm/texture/noise.rs) ------
def _hash2(x, y):
    h = x.astype(jnp.uint32) * jnp.uint32(73856093) ^ y.astype(jnp.uint32) * jnp.uint32(19349663)
    h ^= h >> 13
    h *= jnp.uint32(0x85EBCA6B)
    h ^= h >> 16
    return h


def perlin_noise(p, dim: int = 2):
    """2D gradient noise in [0, 1] (higher dims reduce to 2D uv for now)."""
    x, y = p[..., 0], p[..., 1]
    xi = jnp.floor(x)
    yi = jnp.floor(y)
    xf = x - xi
    yf = y - yi
    xi = xi.astype(jnp.int32)
    yi = yi.astype(jnp.int32)

    def grad(ix, iy, dx, dy):
        h = _hash2(ix, iy)
        ang = h.astype(jnp.float32) * (2.0 * jnp.pi / 4294967296.0)
        return jnp.cos(ang) * dx + jnp.sin(ang) * dy

    def fade(t):
        return t * t * t * (t * (t * 6.0 - 15.0) + 10.0)

    u, v = fade(xf), fade(yf)
    n00 = grad(xi, yi, xf, yf)
    n10 = grad(xi + 1, yi, xf - 1, yf)
    n01 = grad(xi, yi + 1, xf, yf - 1)
    n11 = grad(xi + 1, yi + 1, xf - 1, yf - 1)
    nx0 = n00 * (1 - u) + n10 * u
    nx1 = n01 * (1 - u) + n11 * u
    return (nx0 * (1 - v) + nx1 * v) * 0.5 + 0.5
