"""Ray-scene intersection: batched Möller-Trumbore + dispatch over accel kind.

Replaces LuisaCompute's rtx::Accel (ref scene.rs:42-185). TPU has no RT
hardware, so traversal is software:

- brute force: test every ray against every triangle with broadcasting.
  For small scenes (cbox: ~36 tris) this IS speed-of-light on TPU — it's a
  dense [N, T] computation with perfect vectorization and zero divergence.
- BVH: wide-node traversal for large scenes (accel/bvh.py).

Self-intersection avoidance uses the reference's exclusion-id scheme
(geometry.rs:18-25): rays carry up to two excluded triangle ids instead of
epsilon offsets (we still offset origins like pt.rs:856 as belt+braces).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.math import RAY_TMAX, cross, dot


class Hit(NamedTuple):
    t: jnp.ndarray  # [N] hit distance (RAY_TMAX if miss)
    tri_id: jnp.ndarray  # [N] int32 global triangle id (-1 if miss)
    bary: jnp.ndarray  # [N, 2] barycentric (b1, b2) matching ref convention
    valid: jnp.ndarray  # [N] bool


_CHUNK_T = 2048  # triangles per brute-force chunk (bounds [N, CHUNK] temporaries)


def _ray_tri_chunk(o, d, tmin, tmax, v0, e1, e2):
    """Möller-Trumbore for all rays x all triangles in a chunk.

    o, d: [N, 3]; v0, e1, e2: [T, 3]. Returns (t [N,T], u [N,T], v [N,T], hit [N,T]).
    Watertight enough with f32 for parity with embree-style HW traversal.
    """
    # pvec = d x e2 : [N, T, 3]
    pvec = cross(d[:, None, :], e2[None, :, :])
    det = jnp.sum(pvec * e1[None, :, :], axis=-1)  # [N, T]
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tvec = o[:, None, :] - v0[None, :, :]
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = cross(tvec, e1[None, :, :])
    v = jnp.sum(qvec * d[:, None, :], axis=-1) * inv_det
    t = jnp.sum(qvec * e2[None, :, :], axis=-1) * inv_det
    hit = (
        (jnp.abs(det) > 1e-12)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > tmin[:, None])
        & (t < tmax[:, None])
    )
    return t, u, v, hit


def intersect_brute_force(
    o, d, tmin, tmax, v0, e1, e2, exclude0=None, exclude1=None
) -> Hit:
    """Closest-hit over the full triangle soup (chunked over T)."""
    n = o.shape[0]
    num_tris = v0.shape[0]
    best_t = jnp.full((n,), RAY_TMAX, jnp.float32)
    best_t = jnp.minimum(best_t, tmax)
    best_id = jnp.full((n,), -1, jnp.int32)
    best_uv = jnp.zeros((n, 2), jnp.float32)

    for start in range(0, num_tris, _CHUNK_T):
        end = min(start + _CHUNK_T, num_tris)
        t, u, v, hit = _ray_tri_chunk(
            o, d, tmin, best_t, v0[start:end], e1[start:end], e2[start:end]
        )
        tri_ids = jnp.arange(start, end, dtype=jnp.int32)[None, :]
        if exclude0 is not None:
            hit = hit & (tri_ids != exclude0[:, None])
        if exclude1 is not None:
            hit = hit & (tri_ids != exclude1[:, None])
        t = jnp.where(hit, t, RAY_TMAX)
        am = jnp.argmin(t, axis=-1)
        rows = jnp.arange(n)
        ct, cu, cv, chit = t[rows, am], u[rows, am], v[rows, am], hit[rows, am]
        better = chit & (ct < best_t)
        best_t = jnp.where(better, ct, best_t)
        best_id = jnp.where(better, jnp.int32(start) + am.astype(jnp.int32), best_id)
        best_uv = jnp.where(better[:, None], jnp.stack([cu, cv], -1), best_uv)

    return Hit(t=best_t, tri_id=best_id, bary=best_uv, valid=best_id >= 0)


def occlude_brute_force(o, d, tmin, tmax, v0, e1, e2, exclude0=None, exclude1=None):
    """Any-hit: returns bool [N] (True = occluded)."""
    n = o.shape[0]
    num_tris = v0.shape[0]
    occluded = jnp.zeros((n,), bool)
    for start in range(0, num_tris, _CHUNK_T):
        end = min(start + _CHUNK_T, num_tris)
        _, _, _, hit = _ray_tri_chunk(
            o, d, tmin, tmax, v0[start:end], e1[start:end], e2[start:end]
        )
        tri_ids = jnp.arange(start, end, dtype=jnp.int32)[None, :]
        if exclude0 is not None:
            hit = hit & (tri_ids != exclude0[:, None])
        if exclude1 is not None:
            hit = hit & (tri_ids != exclude1[:, None])
        occluded = occluded | jnp.any(hit, axis=-1)
    return occluded
