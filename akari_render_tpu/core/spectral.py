"""Spectral rendering scaffolding: hero-wavelength sampling + rgb2spec uplift.

Parity status mirrors the reference exactly: the reference carries
`SampledWavelengths` and a spectral `ColorRepr` but every spectral evaluation
path is `todo!()` (color.rs:71-73, texture/mod.rs:39-42) and renders RGB.
Here the scaffolding is FUNCTIONAL one level further: wavelengths sample and
pdf correctly, and the native rgb2spec optimizer (native/rgb2spec_opt.cpp,
the akari_cpp_ext rgb2spec counterpart) produces sigmoid-polynomial
coefficient tables that `uplift_eval` evaluates — but the integrators still
operate in RGB (spectral transport is future work, as in the reference).
"""
from __future__ import annotations

import ctypes
import os
from pathlib import Path
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

LAMBDA_MIN = 360.0
LAMBDA_MAX = 830.0
N_WAVELENGTHS = 4  # hero + 3 (color.rs SampledWavelengths is Float4)


class SampledWavelengths(NamedTuple):
    """Hero-wavelength sample (color.rs:49-76)."""

    lambdas: jnp.ndarray  # [N, 4]
    pdf: jnp.ndarray  # [N, 4]


def sample_wavelengths(u):
    """Stratified hero-wavelength sampling: u [N] -> 4 rotated wavelengths."""
    u = jnp.asarray(u)
    offsets = jnp.arange(N_WAVELENGTHS, dtype=jnp.float32) / N_WAVELENGTHS
    uu = jnp.mod(u[..., None] + offsets, 1.0)
    lam = LAMBDA_MIN + uu * (LAMBDA_MAX - LAMBDA_MIN)
    pdf = jnp.full(lam.shape, 1.0 / (LAMBDA_MAX - LAMBDA_MIN))
    return SampledWavelengths(lambdas=lam, pdf=pdf)


# ---- rgb2spec table ---------------------------------------------------------
_table_cache: dict[str, tuple] = {}


def _table_path(gamut: str) -> Path:
    d = Path(os.environ.get("AKR_CACHE_DIR", Path.home() / ".cache" / "akari_render_tpu"))
    d.mkdir(parents=True, exist_ok=True)
    return d / f"rgbspectrum_{gamut}"


def ensure_rgb2spec_table(gamut: str = "srgb", res: int = 24):
    """Generate (via the native optimizer) or load the coefficient table —
    same lazy-generation flow as the reference (data/rgb2spec.rs:26-95)."""
    if gamut in _table_cache:
        return _table_cache[gamut]
    path = _table_path(gamut)
    if not path.exists():
        from ..native import get_lib

        lib = get_lib()
        if lib is None:
            return None
        lib.akr_rgb2spec_opt.restype = ctypes.c_int
        lib.akr_rgb2spec_opt.argtypes = [ctypes.c_int, ctypes.c_char_p, ctypes.c_char_p]
        rc = lib.akr_rgb2spec_opt(res, str(path).encode(), gamut.encode())
        if rc != 0:
            return None
    raw = path.read_bytes()
    r = int(np.frombuffer(raw, np.uint32, 1)[0])
    scale = np.frombuffer(raw, np.float32, r, offset=4)
    coeffs = np.frombuffer(raw, np.float32, 3 * r * r * r * 3, offset=4 + 4 * r)
    coeffs = coeffs.reshape(3, r, r, r, 3)
    _table_cache[gamut] = (jnp.asarray(scale.copy()), jnp.asarray(coeffs.copy()))
    return _table_cache[gamut]


def uplift_coeffs(table, rgb):
    """RGB [N, 3] -> sigmoid-polynomial coefficients [N, 3] (nearest cell)."""
    scale, coeffs = table
    r = scale.shape[0]
    maxc = jnp.argmax(rgb, axis=-1)
    mx = jnp.take_along_axis(rgb, maxc[..., None], axis=-1)[..., 0]
    mx = jnp.maximum(mx, 1e-4)
    a = jnp.take_along_axis(rgb, ((maxc + 1) % 3)[..., None], axis=-1)[..., 0] / mx
    b = jnp.take_along_axis(rgb, ((maxc + 2) % 3)[..., None], axis=-1)[..., 0] / mx
    # invert the smoothstep scale spacing by nearest search
    z = jnp.argmin(jnp.abs(scale[None, :] - mx[..., None]), axis=-1)
    ai = jnp.clip(jnp.round(a * (r - 1)).astype(jnp.int32), 0, r - 1)
    bi = jnp.clip(jnp.round(b * (r - 1)).astype(jnp.int32), 0, r - 1)
    return coeffs[maxc, z, bi, ai]


def eval_reflectance(c, lambdas):
    """coefficients [N, 3] x wavelengths [N, W] -> reflectance [N, W]."""
    ln = (lambdas - LAMBDA_MIN) / (LAMBDA_MAX - LAMBDA_MIN)
    x = (c[..., 0:1] * ln + c[..., 1:2]) * ln + c[..., 2:3]
    return 0.5 * x / jnp.sqrt(1.0 + x * x) + 0.5
