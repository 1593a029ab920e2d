"""Cluster-culled intersection: the TPU-native acceleration structure.

Per-lane BVH pointer chasing is hostile to TPU (each while-loop step costs a
full-batch sync; worst lane dominates — measured 100x slower than dense
work). This module replaces traversal with three DENSE phases, all
fixed-shape and fully vectorized:

1. CLUSTERS (host): triangles are reordered by binned-SAH BVH leaf order
   (accel/bvh.py build — spatial locality) and cut into K clusters of
   exactly C=128 triangles (padded); cluster AABBs are tight.
2. CULL (device): slab-test every ray against every cluster AABB in [K, N]
   SoA chunks — pure VPU math, ~15 flops per test.
3. SELECT + TEST (device): per ray, select the M nearest hit clusters by
   entry distance (streaming top-M merge, lax.top_k) and Möller-Trumbore
   their triangles in [N, C] batches (minor dim C=128 = exactly one lane
   register row). Rounds repeat with a distance threshold until every ray
   has either found a hit closer than all remaining clusters or exhausted
   them — exact, not approximate.

Replaces rtx::Accel for large scenes (ref mesh.rs:288-333); per-ray cost is
O(M*C + K) independent of total triangle count.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.math import RAY_TMAX

CLUSTER_SIZE = 128
SELECT_M = 8
CULL_CHUNK = 1024


class ClusterArrays(NamedTuple):
    cbmin: jnp.ndarray  # [K, 3]
    cbmax: jnp.ndarray  # [K, 3]
    tri: jnp.ndarray  # [K, C, 12] packed v0|e1|e2|(orig_id,pad,pad)
    # kept for parity with BvhArrays consumers
    order: jnp.ndarray  # [Tpad] original tri id per slot (-1 padding)

    @property
    def num_clusters(self) -> int:  # static: from array shape, jit-safe
        return self.cbmin.shape[0]


def build_clusters(v0: np.ndarray, e1: np.ndarray, e2: np.ndarray, order: np.ndarray) -> ClusterArrays:
    """Pack BVH-ordered triangles into padded clusters (host)."""
    T = len(v0)
    C = CLUSTER_SIZE
    K = (T + C - 1) // C
    Tp = K * C
    slot_order = np.full(Tp, -1, np.int64)
    slot_order[:T] = order
    sv0 = np.zeros((Tp, 3), np.float32)
    se1 = np.zeros((Tp, 3), np.float32)
    se2 = np.zeros((Tp, 3), np.float32)
    valid = slot_order >= 0
    sv0[valid] = v0[slot_order[valid]]
    se1[valid] = e1[slot_order[valid]]
    se2[valid] = e2[slot_order[valid]]
    # degenerate padding triangles never hit (e1 = e2 = 0)
    lo = np.minimum(np.minimum(sv0, sv0 + se1), sv0 + se2).reshape(K, C, 3)
    hi = np.maximum(np.maximum(sv0, sv0 + se1), sv0 + se2).reshape(K, C, 3)
    vmask = valid.reshape(K, C, 1)
    big = np.float32(1e30)
    cbmin = np.where(vmask, lo, big).min(axis=1)
    cbmax = np.where(vmask, hi, -big).max(axis=1)
    packed = np.concatenate(
        [sv0, se1, se2, slot_order[:, None].astype(np.float32), np.zeros((Tp, 2), np.float32)],
        axis=1,
    ).reshape(K, C, 12)
    return ClusterArrays(
        cbmin=jnp.asarray(cbmin),
        cbmax=jnp.asarray(cbmax),
        tri=jnp.asarray(packed),
        order=jnp.asarray(slot_order.astype(np.int32)),
    )


def _entries(cl: ClusterArrays, o, d, inv_d, tmin, tmax):
    """Entry distance per (cluster, ray): [K, N]; +inf on miss."""
    K = cl.num_clusters
    # [K, 1, 3] vs [N, 3] -> [K, N]
    def slab(bmin, bmax):
        t0 = (bmin[:, None, :] - o[None, :, :]) * inv_d[None, :, :]
        t1 = (bmax[:, None, :] - o[None, :, :]) * inv_d[None, :, :]
        tn = jnp.minimum(t0, t1).max(-1)
        tf = jnp.maximum(t0, t1).min(-1)
        near = jnp.maximum(tn, tmin[None, :])
        far = jnp.minimum(tf, tmax[None, :])
        return jnp.where(near <= far, near, jnp.inf)

    return slab(cl.cbmin, cl.cbmax)


def _select_topm(cl, o, d, inv_d, tmin, tmax, thresh_e, thresh_id, m, crange=None):
    """M nearest cluster entries strictly after the lexicographic
    (entry, cluster-id) threshold — id tie-breaking makes the round sweep
    exact even when many cluster AABBs share an entry distance.

    Returns (entries [N, M] ascending, ids [N, M]); inf entry = none.

    crange: optional per-lane (lo [N], hi [N]) — only clusters with
    lo <= id < hi participate (instanced two-level traversal restricts each
    lane to its instance's mesh cluster range).

    Small K (fits one [N, K] matrix): M iterative masked argmin passes —
    measured 1.5x faster than lax.top_k merging on TPU. Large K: streaming
    top_k merge over chunks."""
    n = o.shape[0]
    K = cl.num_clusters
    if K <= CULL_CHUNK * 2:
        e = _entries(cl, o, d, inv_d, tmin, tmax).T  # [N, K]
        ids_row = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None, :], e.shape)
        after = (e > thresh_e[:, None]) | (
            (e == thresh_e[:, None]) & (ids_row > thresh_id[:, None])
        )
        if crange is not None:
            after = after & (ids_row >= crange[0][:, None]) & (ids_row < crange[1][:, None])
        e = jnp.where(after, e, jnp.inf)
        sel_e, sel_i = [], []
        taken = jnp.zeros_like(e, bool)
        rows = jnp.arange(n)
        for _ in range(m):
            em = jnp.where(taken, jnp.inf, e)
            am = jnp.argmin(em, axis=1)  # ties -> lowest id (argmin is first)
            sel_e.append(em[rows, am])
            sel_i.append(am.astype(jnp.int32))
            taken = taken | (ids_row == am[:, None].astype(jnp.int32))
        return jnp.stack(sel_e, 1), jnp.stack(sel_i, 1)

    best_e = jnp.full((n, m), jnp.inf)
    best_i = jnp.full((n, m), jnp.iinfo(jnp.int32).max, jnp.int32)
    for start in range(0, K, CULL_CHUNK):
        end = min(start + CULL_CHUNK, K)
        sub = ClusterArrays(cl.cbmin[start:end], cl.cbmax[start:end], cl.tri, cl.order)
        e = _entries(sub, o, d, inv_d, tmin, tmax).T  # [N, chunk]
        ids = jnp.broadcast_to(
            jnp.arange(start, end, dtype=jnp.int32)[None, :], e.shape
        )
        after = (e > thresh_e[:, None]) | (
            (e == thresh_e[:, None]) & (ids > thresh_id[:, None])
        )
        if crange is not None:
            after = after & (ids >= crange[0][:, None]) & (ids < crange[1][:, None])
        e = jnp.where(after, e, jnp.inf)
        cat_e = jnp.concatenate([best_e, e], axis=1)
        cat_i = jnp.concatenate([best_i, ids], axis=1)
        # id-aware merge: top_k is stable (first = lower position = lower id
        # for equal entries since best_i ids come sorted and chunk ids grow)
        neg, idx = jax.lax.top_k(-cat_e, m)
        best_e = -neg
        best_i = jnp.take_along_axis(cat_i, idx, axis=1)
    return best_e, best_i


def _test_cluster(cl, cid, o, d, tmin, t_best, tri_best, u_best, v_best,
                  excludes, any_hit, occluded):
    """MT-test the C triangles of per-ray cluster cid ([N] ids, -1 = skip)."""
    safe = jnp.maximum(cid, 0)
    rows = cl.tri[safe]  # [N, C, 12] row gather
    live = (cid >= 0)[:, None]
    a = rows[..., 0:3]
    b1 = rows[..., 3:6]
    b2 = rows[..., 6:9]
    tri_id = rows[..., 9].astype(jnp.int32)
    dN = d[:, None, :]
    oN = o[:, None, :]
    pvec = jnp.cross(dN, b2)
    det = jnp.sum(pvec * b1, -1)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tvec = oN - a
    u = jnp.sum(tvec * pvec, -1) * inv_det
    qvec = jnp.cross(tvec, b1)
    v = jnp.sum(qvec * dN, -1) * inv_det
    t = jnp.sum(qvec * b2, -1) * inv_det
    hit = (
        live
        & (jnp.abs(det) > 1e-12)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > tmin[:, None])
        & (t < t_best[:, None])
        & (tri_id >= 0)
    )
    for ex in excludes:
        if ex is not None:
            hit = hit & (tri_id != ex[:, None])
    if any_hit:
        return t_best, tri_best, u_best, v_best, occluded | jnp.any(hit, -1)
    t_m = jnp.where(hit, t, jnp.inf)
    am = jnp.argmin(t_m, axis=-1)
    r = jnp.arange(o.shape[0])
    ct, cu, cv, cid_t = t_m[r, am], u[r, am], v[r, am], tri_id[r, am]
    better = jnp.isfinite(ct) & (ct < t_best)
    return (
        jnp.where(better, ct, t_best),
        jnp.where(better, cid_t, tri_best),
        jnp.where(better, cu, u_best),
        jnp.where(better, cv, v_best),
        occluded,
    )


def intersect_clusters(cl: ClusterArrays, o, d, tmin, tmax,
                       exclude0=None, exclude1=None, exclude2=None, any_hit=False,
                       crange=None, raw=False):
    """Exact closest-hit (or any-hit) through the cluster structure.

    crange: per-lane (lo, hi) cluster-id range restriction (see _select_topm).
    raw: return the (t, tri, u, v, occ) carry instead of a Hit — used by the
    instanced two-level traversal, whose tri ids are LOCAL and need remapping.
    """
    n = o.shape[0]
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-20, jnp.where(d < 0, -1e-20, 1e-20), d)
    t_best0 = jnp.minimum(jnp.full((n,), RAY_TMAX), tmax)

    def round_cond(carry):
        thresh_e, thresh_id, t_best, tri, u, v, occ, live = carry
        return jnp.any(live)

    def round_body(carry):
        thresh_e, thresh_id, t_best, tri, u, v, occ, live = carry
        entries, ids = _select_topm(
            cl, o, d, inv_d, tmin, t_best, thresh_e, thresh_id, SELECT_M,
            crange=crange,
        )
        for m in range(SELECT_M):
            useful = live & jnp.isfinite(entries[:, m]) & (entries[:, m] <= t_best)
            if any_hit:
                useful = useful & ~occ
            cid = jnp.where(useful, ids[:, m], -1)
            t_best, tri, u, v, occ = _test_cluster(
                cl, cid, o, d, tmin, t_best, tri, u, v,
                (exclude0, exclude1, exclude2), any_hit, occ,
            )
        # a ray stays live if its M-th selected entry was still closer than
        # its current best hit (more clusters may remain beyond it)
        last = entries[:, SELECT_M - 1]
        last_id = ids[:, SELECT_M - 1]
        live = live & jnp.isfinite(last) & (last < t_best)
        if any_hit:
            live = live & ~occ
        new_thresh_e = jnp.where(live, last, thresh_e)
        new_thresh_id = jnp.where(live, last_id, thresh_id)
        return (new_thresh_e, new_thresh_id, t_best, tri, u, v, occ, live)

    carry = (
        jnp.full((n,), -jnp.inf),
        jnp.full((n,), -1, jnp.int32),
        t_best0,
        jnp.full((n,), -1, jnp.int32),
        jnp.zeros((n,)),
        jnp.zeros((n,)),
        jnp.zeros((n,), bool),
        jnp.ones((n,), bool),
    )
    thresh_e, thresh_id, t_best, tri, u, v, occ, live = jax.lax.while_loop(
        round_cond, round_body, carry
    )
    if raw:
        return t_best, tri, u, v, occ
    if any_hit:
        return occ
    from .trace import Hit

    return Hit(t=t_best, tri_id=tri, bary=jnp.stack([u, v], -1), valid=tri >= 0)
