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

import os as _os

# AKR_CLUSTER_SIZE: scene-build override for end-to-end config sweeps
# (tools/sweep_cluster_size.py measured C=512/MAXC=8 ~1.8x the default on
# the 2M-tri heightfield pre-cursor-walk; the production default changes
# only with a recorded end-to-end win)
CLUSTER_SIZE = int(_os.environ.get("AKR_CLUSTER_SIZE", "128"))
SELECT_M = 8
CULL_CHUNK = 1024
# hierarchical cull: group G consecutive (BVH-leaf-ordered -> spatially
# coherent) clusters under one supercluster AABB; the dense [K, N] cull
# becomes [K/G, N] + per-visited-group [N, G] — at 2M tris (K=15625) that is
# a ~60x cut in slab work, the HBM-bound phase (round-1 STATUS item 2)
SUPER_GROUP = 64
SUPER_MIN_CLUSTERS = 512
SUPER_EXPAND = 8  # superclusters expanded per round (p95 hit count ~5)
SUPER_CAP = 16  # candidate clusters tested per round (p95 needed ~9)


class ClusterArrays(NamedTuple):
    cbmin: jnp.ndarray  # [K, 3]
    cbmax: jnp.ndarray  # [K, 3]
    tri: jnp.ndarray  # [K, C, 12] packed v0|e1|e2|(orig_id,pad,pad)
    # kept for parity with BvhArrays consumers
    order: jnp.ndarray  # [Tpad] original tri id per slot (-1 padding)
    # optional second level (built when K >= SUPER_MIN_CLUSTERS):
    sc_bmin: jnp.ndarray | None = None  # [K2, 3]
    sc_bmax: jnp.ndarray | None = None  # [K2, 3]
    cl_bounds: jnp.ndarray | None = None  # [K2, G, 6] child AABBs (min|max)
    # optional unified-instancing extension (accel/instanced.py
    # build_unified_clusters): candidate k's triangles live at tri[tri_row[k]]
    # in LOCAL space and the sweep applies xf[k] (world->local affine rows +
    # global-id offset) to the ray — N instances of a mesh share tri rows
    xf: jnp.ndarray | None = None  # [K, 16] minv(12) | id_off | pad(3)
    tri_row: jnp.ndarray | None = None  # [K] int32 row into tri
    # optional packed 8-wide BVH over cluster/candidate AABBs for the packet
    # traversal kernel (accel/wide.py attach_wide): [Nn, 128] int32
    wide: jnp.ndarray | None = None

    @property
    def num_clusters(self) -> int:  # static: from array shape, jit-safe
        return self.cbmin.shape[0]


def build_clusters(v0: np.ndarray, e1: np.ndarray, e2: np.ndarray, order: np.ndarray,
                   cluster_size: int = CLUSTER_SIZE) -> ClusterArrays:
    """Pack BVH-ordered triangles into padded clusters (host)."""
    T = len(v0)
    C = cluster_size
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

    sc_bmin = sc_bmax = cl_bounds = None
    if K >= SUPER_MIN_CLUSTERS:
        G = SUPER_GROUP
        K2 = (K + G - 1) // G
        pmin = np.full((K2 * G, 3), big, np.float32)
        pmax = np.full((K2 * G, 3), -big, np.float32)
        pmin[:K] = cbmin
        pmax[:K] = cbmax
        sc_bmin = jnp.asarray(pmin.reshape(K2, G, 3).min(axis=1))
        sc_bmax = jnp.asarray(pmax.reshape(K2, G, 3).max(axis=1))
        cl_bounds = jnp.asarray(
            np.concatenate([pmin, pmax], axis=1).reshape(K2, G, 6)
        )

    return ClusterArrays(
        cbmin=jnp.asarray(cbmin),
        cbmax=jnp.asarray(cbmax),
        tri=jnp.asarray(packed),
        order=jnp.asarray(slot_order.astype(np.int32)),
        sc_bmin=sc_bmin,
        sc_bmax=sc_bmax,
        cl_bounds=cl_bounds,
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


def _intersect_super(cl: ClusterArrays, o, d, tmin, tmax, excludes, any_hit):
    """Hierarchical exact traversal, candidate-list form. Per round:

    1. dense [K2, N] supercluster cull (cheap: K2 = K/G),
    2. expand the SUPER_EXPAND nearest superclusters after the lane's
       SC-threshold into child clusters ([N, G, 6] row gathers + slab),
    3. merge children into the SUPER_CAP nearest candidates (lax.top_k) after
       the lane's CLUSTER-threshold,
    4. test candidates in ascending entry order; skip once entry >= t_best.

    Typical scenes finish in ONE round (measured heightfield: p95 = 5 hit
    superclusters, 9 needed clusters per ray). Exactness across rounds uses
    two lexicographic (entry, id) thresholds: the SC threshold advances only
    when the candidate pool was fully tested (no overflow past SUPER_CAP);
    otherwise the cluster threshold advances within the same SC set. One of
    the two strictly advances every round, so termination is guaranteed, and
    every cluster whose AABB entry is closer than the final hit gets tested."""
    n = o.shape[0]
    G = cl.cl_bounds.shape[1]
    K2 = cl.sc_bmin.shape[0]
    SSC = min(SUPER_EXPAND, K2)
    CAP = SUPER_CAP
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-20, jnp.where(d < 0, -1e-20, 1e-20), d)
    t_best0 = jnp.minimum(jnp.full((n,), RAY_TMAX), tmax)
    rows = jnp.arange(n)
    INF = jnp.inf

    def sc_entries(t_best):
        t0 = (cl.sc_bmin[:, None, :] - o[None, :, :]) * inv_d[None, :, :]
        t1 = (cl.sc_bmax[:, None, :] - o[None, :, :]) * inv_d[None, :, :]
        tn = jnp.minimum(t0, t1).max(-1)
        tf = jnp.maximum(t0, t1).min(-1)
        near = jnp.maximum(tn, tmin[None, :])
        far = jnp.minimum(tf, t_best[None, :])
        return jnp.where(near <= far, near, INF)  # [K2, N]

    def round_cond(carry):
        return jnp.any(carry[-1])

    def round_body(carry):
        (sc_te, sc_ti, cl_te, cl_ti, t_best, tri, u, v, occ, live) = carry

        # --- select SSC nearest superclusters after the SC threshold ---
        e = sc_entries(t_best).T  # [N, K2]
        ids_row = jnp.broadcast_to(jnp.arange(K2, dtype=jnp.int32)[None, :], e.shape)
        after = (e > sc_te[:, None]) | ((e == sc_te[:, None]) & (ids_row > sc_ti[:, None]))
        e = jnp.where(after, e, INF)
        sel_e, sel_i = [], []
        taken = jnp.zeros_like(e, bool)
        for _ in range(SSC):
            em = jnp.where(taken, INF, e)
            am = jnp.argmin(em, axis=1)
            sel_e.append(em[rows, am])
            sel_i.append(am.astype(jnp.int32))
            taken = taken | (ids_row == am[:, None].astype(jnp.int32))
        sc_e = jnp.stack(sel_e, 1)  # [N, SSC] ascending by (entry, id)
        sc_i = jnp.stack(sel_i, 1)
        # entry of the first UNEXPANDED supercluster (continuation bound)
        em = jnp.where(taken, INF, e)
        sc_next = em.min(axis=1)

        # --- expand children of the selected superclusters ---
        # expansion order = ascending SC id (invalid -> K2, expanded as a
        # no-op), so candidate POSITION is monotone in global cluster id and
        # a stable argsort breaks entry ties by id — which makes the
        # lexicographic cluster threshold below exact even for tied entries
        # (axis-aligned grids produce many identical AABB faces)
        sc_exp = jnp.sort(jnp.where(jnp.isfinite(sc_e), sc_i, K2), axis=1)
        ce_parts, ci_parts = [], []
        for s in range(SSC):
            ok = sc_exp[:, s] < K2
            safe = jnp.minimum(sc_exp[:, s], K2 - 1)
            bounds = cl.cl_bounds[safe]  # [N, G, 6]
            t0 = (bounds[..., 0:3] - o[:, None, :]) * inv_d[:, None, :]
            t1 = (bounds[..., 3:6] - o[:, None, :]) * inv_d[:, None, :]
            tn = jnp.minimum(t0, t1).max(-1)
            tf = jnp.maximum(t0, t1).min(-1)
            near = jnp.maximum(tn, tmin[:, None])
            far = jnp.minimum(tf, t_best[:, None])
            ce = jnp.where(ok[:, None] & (near <= far), near, INF)
            ci = safe[:, None] * G + jnp.arange(G, dtype=jnp.int32)[None, :]
            ce_parts.append(ce)
            ci_parts.append(ci)
        cand_e = jnp.concatenate(ce_parts, axis=1)  # [N, SSC*G]
        cand_i = jnp.concatenate(ci_parts, axis=1)
        # cluster-threshold filter (re-entry into a partially tested SC set)
        after_c = (cand_e > cl_te[:, None]) | (
            (cand_e == cl_te[:, None]) & (cand_i > cl_ti[:, None])
        )
        cand_e = jnp.where(after_c, cand_e, INF)
        # nearest CAP candidates ascending (stable sort: ties by id)
        order = jnp.argsort(cand_e, axis=1)
        sorted_e = jnp.take_along_axis(cand_e, order, axis=1)
        sorted_i = jnp.take_along_axis(cand_i, order, axis=1)
        width = cand_e.shape[1]
        top_e = sorted_e[:, : min(CAP, width)]
        top_i = sorted_i[:, : min(CAP, width)]
        # entry of the first candidate BEYOND the cap (overflow bound)
        overflow_e = sorted_e[:, CAP] if width > CAP else jnp.full((n,), INF)

        # --- test candidates in order ---
        for c in range(top_e.shape[1]):
            visit = live & jnp.isfinite(top_e[:, c]) & (top_e[:, c] < t_best)
            if any_hit:
                visit = visit & ~occ
            cid = jnp.where(visit, top_i[:, c], -1)
            t_best, tri, u, v, occ = _test_cluster(
                cl, cid, o, d, tmin, t_best, tri, u, v, excludes, any_hit, occ
            )

        # --- continuation ---
        # untested-overflow candidates that could still matter?
        has_overflow = jnp.isfinite(overflow_e) & (overflow_e < t_best)
        # unexpanded superclusters that could still matter?
        has_more_sc = jnp.isfinite(sc_next) & (sc_next < t_best)
        live = live & (has_overflow | has_more_sc)
        if any_hit:
            live = live & ~occ
        # overflow -> advance the cluster threshold, keep the SC set;
        # else    -> advance the SC threshold, reset the cluster threshold
        last_e = top_e[:, -1]
        last_i = top_i[:, -1]
        sc_last_e = sc_e[:, -1]
        sc_last_i = sc_i[:, -1]
        new_sc_te = jnp.where(live & ~has_overflow, sc_last_e, sc_te)
        new_sc_ti = jnp.where(live & ~has_overflow, sc_last_i, sc_ti)
        new_cl_te = jnp.where(
            live & has_overflow, last_e, jnp.full((n,), -INF)
        )
        new_cl_ti = jnp.where(live & has_overflow, last_i, -1)
        return (
            new_sc_te, new_sc_ti, new_cl_te, new_cl_ti,
            t_best, tri, u, v, occ, live,
        )

    carry = (
        jnp.full((n,), -INF),
        jnp.full((n,), -1, jnp.int32),
        jnp.full((n,), -INF),
        jnp.full((n,), -1, jnp.int32),
        t_best0,
        jnp.full((n,), -1, jnp.int32),
        jnp.zeros((n,)),
        jnp.zeros((n,)),
        jnp.zeros((n,), bool),
        jnp.ones((n,), bool),
    )
    (_, _, _, _, t_best, tri, u, v, occ, _) = jax.lax.while_loop(
        round_cond, round_body, carry
    )
    return t_best, tri, u, v, occ


def intersect_clusters(cl: ClusterArrays, o, d, tmin, tmax,
                       exclude0=None, exclude1=None, exclude2=None, any_hit=False,
                       crange=None, raw=False):
    """Exact closest-hit (or any-hit) through the cluster structure.

    crange: per-lane (lo, hi) cluster-id range restriction (see _select_topm).
    raw: return the (t, tri, u, v, occ) carry instead of a Hit — used by the
    instanced two-level traversal, whose tri ids are LOCAL and need remapping.

    Scenes with a supercluster level (and no crange) take the hierarchical
    path — same result, ~G x less cull math.
    """
    import os

    # default OFF: measured slower than the flat rounds on the 2M heightfield
    # (tools/bench_accel.py) — candidate selection overheads dominate; kept
    # for workloads where the [K, N] cull matrix cannot fit
    if (
        cl.sc_bmin is not None
        and crange is None
        and os.environ.get("AKR_SUPERCLUSTERS", "0") == "1"
    ):
        t_best, tri, u, v, occ = _intersect_super(
            cl, o, d, tmin, tmax, (exclude0, exclude1, exclude2), any_hit
        )
        if raw:
            return t_best, tri, u, v, occ
        if any_hit:
            return occ
        from .trace import Hit

        return Hit(t=t_best, tri_id=tri, bary=jnp.stack([u, v], -1), valid=tri >= 0)
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
