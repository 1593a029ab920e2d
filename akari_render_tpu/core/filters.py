"""Pixel reconstruction filters — filter importance sampling only.

Matches reference film.rs:24-55: the filter jitters the sample position and
always returns weight 1 (filter-importance-sampling), so the film never needs
neighborhood splatting for ordinary samples.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from .sampling import TWO_PI


@dataclass(frozen=True)
class BoxFilter:
    radius: float = 0.5

    def sample(self, u):
        """u: [..., 2] uniform; returns (offset [..., 2], weight [...])."""
        off = (u - 0.5) * self.radius
        return off, jnp.ones(u.shape[:-1], jnp.float32)


@dataclass(frozen=True)
class GaussianFilter:
    radius: float = 1.5

    def sample(self, u):
        sigma = self.radius / 3.0
        r = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u[..., 0], 1e-10)))
        theta = TWO_PI * u[..., 1]
        off = jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1) * sigma
        off = jnp.clip(off, -self.radius, self.radius)
        return off, jnp.ones(u.shape[:-1], jnp.float32)


def filter_from_config(cfg: dict | None):
    """Build a filter from the reference's JSON schema ({"type": "gaussian", "radius": r})."""
    if cfg is None:
        return GaussianFilter(1.5)
    t = cfg.get("type", "gaussian")
    if t == "box":
        return BoxFilter(cfg.get("radius", 0.5))
    if t == "gaussian":
        return GaussianFilter(cfg.get("radius", 1.5))
    raise ValueError(f"unknown filter type: {t}")
