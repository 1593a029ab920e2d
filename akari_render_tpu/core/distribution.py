"""Alias tables for O(1) discrete sampling.

Host-side Vose build (numpy) + device-side sample_and_remap, mirroring
crates/akari_render/src/util/distribution.rs:17-115. Used for per-light
triangle selection and the power-weighted light distribution.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class AliasTable(NamedTuple):
    prob: jnp.ndarray  # [N] acceptance probability of own bucket
    alias: jnp.ndarray  # [N] alias index
    pdf: jnp.ndarray  # [N] normalized pdf of each entry

    @staticmethod
    def build(weights: np.ndarray) -> "AliasTable":
        w = np.asarray(weights, dtype=np.float64)
        n = len(w)
        assert n > 0
        total = w.sum()
        if total <= 0.0:
            w = np.ones(n)
            total = float(n)
        pdf = w / total
        scaled = pdf * n
        prob = np.zeros(n)
        alias = np.zeros(n, dtype=np.uint32)
        small = [i for i in range(n) if scaled[i] < 1.0]
        large = [i for i in range(n) if scaled[i] >= 1.0]
        scaled = scaled.copy()
        while small and large:
            s = small.pop()
            l = large.pop()
            prob[s] = scaled[s]
            alias[s] = l
            scaled[l] = (scaled[l] + scaled[s]) - 1.0
            (small if scaled[l] < 1.0 else large).append(l)
        for i in large + small:
            prob[i] = 1.0
            alias[i] = i
        return AliasTable(
            prob=jnp.asarray(prob, jnp.float32),
            alias=jnp.asarray(alias, jnp.uint32),
            pdf=jnp.asarray(pdf, jnp.float32),
        )


def sample_and_remap(table: AliasTable, u):
    """u in [0,1) -> (index, pdf, remapped u). Batched (ref distribution.rs:61-89)."""
    n = table.prob.shape[0]
    scaled = u * n
    idx = jnp.clip(scaled.astype(jnp.int32), 0, n - 1)
    frac = scaled - idx.astype(jnp.float32)
    p = table.prob[idx]
    take_own = frac < p
    out = jnp.where(take_own, idx, table.alias[idx].astype(jnp.int32))
    remapped = jnp.where(
        take_own,
        frac / jnp.maximum(p, 1e-20),
        (frac - p) / jnp.maximum(1.0 - p, 1e-20),
    )
    return out, table.pdf[out], jnp.clip(remapped, 0.0, 1.0)


def pdf(table: AliasTable, idx):
    return table.pdf[idx]


def resample_with_f64(weights: np.ndarray, us: np.ndarray) -> np.ndarray:
    """CPU bootstrap resampling by inverse-CDF (ref distribution.rs:92-115).

    weights: [N] float; us: [M] uniforms -> [M] indices.
    """
    cdf = np.cumsum(np.asarray(weights, np.float64))
    total = cdf[-1]
    assert total > 0.0, "bootstrap failed: all-zero weights"
    return np.minimum(
        np.searchsorted(cdf, us * total, side="right"), len(weights) - 1
    ).astype(np.uint32)
