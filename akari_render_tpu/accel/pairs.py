"""Block-coherent pair-sweep intersection: the large-scene fast path.

The flat cluster rounds (accel/cluster.py) slab-test every ray against every
cluster — a [K, N] matrix per round that is HBM-bound and repeats for the
worst lane (round-1 STATUS item 2: 2M tris ran ~0.04 Mrays/s). This module
replaces the per-RAY cull with a per-BLOCK cull plus a Pallas sweep:

1. SORT (XLA, in-jit): rays are keyed by (direction octant, 9-bit/axis
   morton of origin) and sorted, so consecutive BLOCK-ray windows are
   spatially coherent.
2. BLOCK CULL (XLA): each block is summarized by interval bounds (origin
   box, inv-direction interval per axis) and slab-tested against every
   cluster AABB with conservative interval arithmetic — [B, K] with
   B = N/BLOCK, i.e. BLOCK x less cull math than the per-ray matrix, and a
   strict superset of the per-ray pass set (never misses a hit).
3. SELECT: per block, the MAXC nearest candidate clusters by entry distance
   after a lexicographic (entry, id) threshold (same exactness device as
   cluster.py::_select_topm, at block granularity).
4. SWEEP (Pallas): grid (B, MAXC); the ray block + best-hit state stay
   VMEM-resident across the minor axis (revisiting pattern) while each
   step DMAs one candidate cluster's 128 triangles — indexed by a
   scalar-prefetched candidate table — and Möller-Trumbores them with the
   triangle loop statically unrolled (scalars become VPU immediates). No
   [K, N] or [N, C, 12] HBM intermediates exist anywhere.

Rounds repeat (jax.lax.while_loop) along a PRECOMPUTED per-block walk order:
step 3's selection is ONE stable argsort of the conservative entries per
intersect, and each round gathers the next W members at a per-block cursor
(the earlier formulation re-ranked all K candidates with a top_k every
round). A block terminates when the member at its cursor lies beyond its
worst live lane's best hit — the same termination proof as the flat rounds:
conservative block entry lower-bounds every lane's true entry and the walk
order ascends, so `entry >= max(best_t)` means no remaining cluster can
improve any lane. Replaces rtx::Accel for large scenes (ref
scene.rs:111-153, mesh.rs:288-333).

Measured (TPU v5e, 2M-tri heightfield, 128k coherent-ish rays,
tools/bench_accel.py): flat rounds 0.042 -> pairs ~8-20 Mrays/s.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.math import RAY_TMAX

import os as _os

BLOCK = int(_os.environ.get("AKR_BLOCK", "512"))  # rays per sorted block
# (VMEM-resident in the sweep); import-time env override for experiments —
# smaller blocks shrink each block's candidate union (less wasted MT per
# ray) at the cost of more sweep grid steps
MAXC = int(_os.environ.get("AKR_MAXC", "64"))  # candidate clusters swept
# per block per round (import-time env override for end-to-end sweeps)
WINDOW_MULT = int(_os.environ.get("AKR_WMULT", "16"))  # conservative candidates examined per swept candidate:
# each round walks a WINDOW = MAXC*WINDOW_MULT slice of the block's
# conservative enumeration and sweeps only members that pass >= 1 per-ray
# slab test — zero-pass members are skipped VACUOUSLY (the per-ray slab is
# conservative w.r.t. contained triangles, so no hit is possible), which
# advances the threshold past them for free. (512, 64, 16) won a sweep on
# the 2M-tri heightfield (0.237 -> 0.289 Mrays/s) and ties on classroom.


def _sort_key_mode() -> str:
    """AKR_SORT_KEY: ray sort key layout for the block former.

    - "o"  : octant(3) | origin morton 9 bits/axis (27)  [rounds 1-4 layout]
    - "dK" : octant(3) | direction morton K bits/axis | origin morton
             (9-K) bits/axis — direction-major beyond the octant, so blocks
             become narrow CONES. K in 1..9.
    - "i"  : octant(3) | 6-D interleave (origin+|dir|, ~5 bits/dim, origin
             bit first per level) — balances cone width and origin spread.

    Round-5 measurement (classroom 262k diffuse bounce rays, walk stats
    from tools/profile_diffuse.py): the octant-only key leaves a 512-ray
    block's direction spread at a full octant, so the conservative cull
    passes ~1325 of 4633 clusters per block and the block horizon (max
    over lanes) never terminates the walk — the round-4 "STRUCTURAL"
    classroom wall. Direction bits shrink the block frustum to a cone.
    """
    # default "i": measured best on the classroom diffuse-bounce regime
    # (682 -> 457 ms for the windowed walk at MAXC=64; see STATUS round 5)
    # with coherent rays unchanged.
    return _os.environ.get("AKR_SORT_KEY", "i")


def _spread3(x):  # 9+ bits -> every 3rd bit of 27
    x = (x | (x << 16)) & jnp.uint32(0x030000FF)
    x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
    x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
    x = (x | (x << 2)) & jnp.uint32(0x09249249)
    return x


def _morton3(v, bits):
    """v [N, 3] in [0, 1) -> interleaved morton, `bits` per axis."""
    g = jnp.clip(v * (1 << bits), 0.0, (1 << bits) - 1).astype(jnp.uint32)
    return (_spread3(g[:, 0]) | (_spread3(g[:, 1]) << 1)
            | (_spread3(g[:, 2]) << 2)) & jnp.uint32((1 << (3 * bits)) - 1)


def _morton_keys(o, d, lo, hi, mode=None):
    """uint32 ray sort key; layout per _sort_key_mode (see there)."""
    mode = mode or _sort_key_mode()
    on = (o - lo) / jnp.maximum(hi - lo, 1e-20)  # origin in [0,1)^3
    octant = (
        (d[:, 0] < 0).astype(jnp.uint32) * 4
        + (d[:, 1] < 0).astype(jnp.uint32) * 2
        + (d[:, 2] < 0).astype(jnp.uint32)
    )
    ad = jnp.abs(d)
    ad = ad / jnp.maximum(jnp.linalg.norm(ad, axis=-1, keepdims=True), 1e-20)
    if mode == "i":
        om = _morton3(on, 5)  # 15 bits (5 levels)
        dm = _morton3(ad, 4)  # 12 bits (4 levels)
        # interleave per level, origin triple first; the 5th (finest)
        # origin level trails: 4*(3+3) + 3 = 27 bits total
        key = jnp.zeros_like(om)
        for lvl in range(4):  # msb level first
            osh = (om >> jnp.uint32(3 * (4 - lvl))) & jnp.uint32(7)
            dsh = (dm >> jnp.uint32(3 * (3 - lvl))) & jnp.uint32(7)
            key = (key << 6) | (osh << 3) | dsh
        key = (key << 3) | (om & jnp.uint32(7))
        return (octant << 27) | key
    if mode.startswith("d") and mode != "d0":
        k = max(1, min(9, int(mode[1:] or 3)))
        dm = _morton3(ad, k)
        om = _morton3(on, 9 - k)
        return (octant << 27) | (dm << jnp.uint32(3 * (9 - k))) | om
    m = _morton3(on, 9)
    return (octant << 27) | m


def _block_entries_raw(cbmin, cbmax, olo, ohi, ilo, ihi, bt0, bt1max=None):
    """Conservative slab entry/exit of every (block, cluster): two [B, K].

    Interval arithmetic per axis: numerator n = b - o over the block's origin
    box, times the block's inv-direction interval (sign-straddling blocks
    simply produce huge intervals — still conservative-correct, never a
    missed hit). entry = max_axis lower(near) clamped by the block's min
    tmin; exit = min_axis upper(far). The pair is computed ONCE per
    intersect — each round then applies its shrinking horizon bt1 with one
    cheap masked compare instead of re-running the 36-pass interval math
    (round-3 profile: the per-round cull was ~38 ms of a ~190 ms round).

    bt1max (round 5): the block's max lane t-limit. A cluster whose
    conservative entry exceeds it cannot contain a valid hit for ANY lane
    (each lane's true entry >= the conservative entry and its t1 <= bt1max),
    so the exit is clamped to reject it. Two big effects: fully-dead blocks
    (all t1 = -1, the dead-lane-packed tail of deep bounces) reject EVERY
    cluster — _refine_all's tile predication then skips their slab math
    entirely — and shadow rays (t1 = light distance, finite) cull all
    geometry beyond the light before any per-ray work.
    """
    INF = jnp.inf
    entry = jnp.full((olo.shape[0], cbmin.shape[0]), -INF)
    exit_ = jnp.full((olo.shape[0], cbmin.shape[0]), INF)
    for a in range(3):
        bmin = cbmin[None, :, a]
        bmax = cbmax[None, :, a]
        n0lo, n0hi = bmin - ohi[:, None, a], bmin - olo[:, None, a]
        n1lo, n1hi = bmax - ohi[:, None, a], bmax - olo[:, None, a]
        il, ih = ilo[:, None, a], ihi[:, None, a]

        def iprod(nlo, nhi):
            p1, p2, p3, p4 = nlo * il, nlo * ih, nhi * il, nhi * ih
            return (
                jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4)),
                jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4)),
            )

        t0lo, t0hi = iprod(n0lo, n0hi)
        t1lo, t1hi = iprod(n1lo, n1hi)
        near_lo = jnp.minimum(t0lo, t1lo)
        far_hi = jnp.maximum(t0hi, t1hi)
        entry = jnp.maximum(entry, near_lo)
        exit_ = jnp.minimum(exit_, far_hi)
    if bt1max is not None:
        exit_ = jnp.minimum(exit_, bt1max[:, None])
    return jnp.maximum(entry, bt0[:, None]), exit_


def _block_entries(cbmin, cbmax, olo, ohi, ilo, ihi, bt0, bt1):
    """Single-round form of _block_entries_raw (kept for the profiler and
    A/B): +inf where the conservative test rejects within [bt0, bt1]."""
    entry, exit_ = _block_entries_raw(cbmin, cbmax, olo, ohi, ilo, ihi, bt0)
    exit_ = jnp.minimum(exit_, bt1[:, None])
    return jnp.where(entry <= exit_, entry, jnp.inf)


def _cull_kernel(summ_ref, cb_ref, out_ref):
    """Fused conservative cull for one ([Bt] blocks, [Kt] clusters) tile:
    the whole 36-op interval chain of _block_entries_raw runs on VMEM
    temporaries and emits e_init (+inf where rejected) directly — the XLA
    formulation materialized every [B, K] intermediate in HBM (measured
    <5% of the HBM roofline, i.e. pure traffic waste)."""
    INF = jnp.float32(jnp.inf)
    kt = out_ref.shape[1]
    bt = out_ref.shape[0]
    entry = jnp.full((bt, kt), -INF)
    exit_ = jnp.full((bt, kt), INF)
    for a in range(3):
        bmin = cb_ref[a, :][None, :]  # [1, Kt]
        bmax = cb_ref[3 + a, :][None, :]
        olo = summ_ref[:, a:a + 1]  # [Bt, 1]
        ohi = summ_ref[:, 3 + a:4 + a]
        il = summ_ref[:, 6 + a:7 + a]
        ih = summ_ref[:, 9 + a:10 + a]
        n0lo, n0hi = bmin - ohi, bmin - olo
        n1lo, n1hi = bmax - ohi, bmax - olo

        def iprod(nlo, nhi):
            p1, p2, p3, p4 = nlo * il, nlo * ih, nhi * il, nhi * ih
            return (
                jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4)),
                jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4)),
            )

        t0lo, t0hi = iprod(n0lo, n0hi)
        t1lo, t1hi = iprod(n1lo, n1hi)
        entry = jnp.maximum(entry, jnp.minimum(t0lo, t1lo))
        exit_ = jnp.minimum(exit_, jnp.maximum(t0hi, t1hi))
    entry = jnp.maximum(entry, summ_ref[:, 12:13])  # block min tmin
    exit_ = jnp.minimum(exit_, summ_ref[:, 13:14])  # block max t1 (horizon)
    out_ref[:] = jnp.where(entry <= exit_, entry, INF)


_CULL_BT = 8  # blocks per cull tile
_CULL_KT = 512  # clusters per cull tile


@functools.partial(jax.jit, static_argnames=("interpret",))
def _cull_einit(summ, cb6, interpret=False):
    """Pallas fused cull: summ [B, 16] block summaries (olo|ohi|ilo|ihi|bt0),
    cb6 [6, K] cluster bounds -> e_init [B, K] (entry, +inf on reject).
    Bit-exact vs the XLA _block_entries_raw chain (same ops, same order)."""
    B, K = summ.shape[0], cb6.shape[1]
    bt = min(_CULL_BT, max(B, 1))
    kt = min(_CULL_KT, max(K, 1))
    B_pad = ((B + bt - 1) // bt) * bt
    K_pad = ((K + kt - 1) // kt) * kt
    if B_pad != B:
        summ = jnp.pad(summ, ((0, B_pad - B), (0, 0)))
    if K_pad != K:
        cb6 = jnp.pad(cb6, ((0, 0), (0, K_pad - K)))
    out = pl.pallas_call(
        _cull_kernel,
        out_shape=jax.ShapeDtypeStruct((B_pad, K_pad), jnp.float32),
        grid=(B_pad // bt, K_pad // kt),
        in_specs=[
            pl.BlockSpec((bt, 16), lambda b, k: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, kt), lambda b, k: (0, k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, kt), lambda b, k: (b, k),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(summ, cb6)
    return out[:B, :K]


def _refine_kernel(wb_ref, o_ref, i_ref, lim_ref, out_ref):
    """Per-ray slab refinement for one (block, W-chunk): does ANY live lane's
    [tmin, t1] slab interval overlap candidate w? out [1, WCH] int32.

    Fuses the former XLA [B, BLOCK, W] refinement (near/far temps in HBM,
    ~30 ms/round) into VMEM: reads are the ray block SoA + gathered candidate
    bounds, the [BLOCK, WCH] temporaries never leave the core.
    """
    wch = out_ref.shape[2]
    near = jnp.full((o_ref.shape[1], wch), -jnp.inf)
    far = jnp.full((o_ref.shape[1], wch), jnp.inf)
    for a in range(3):
        bmin = wb_ref[0, a, :][None, :]  # [1, WCH] (W minor = lane axis)
        bmax = wb_ref[0, 3 + a, :][None, :]
        oa = o_ref[a, :][:, None]  # [BLOCK, 1]
        ia = i_ref[a, :][:, None]
        t0 = (bmin - oa) * ia
        t1 = (bmax - oa) * ia
        near = jnp.maximum(near, jnp.minimum(t0, t1))
        far = jnp.minimum(far, jnp.maximum(t0, t1))
    near = jnp.maximum(near, lim_ref[0, :][:, None])
    far = jnp.minimum(far, lim_ref[1, :][:, None])
    out_ref[:] = jnp.any(near <= far, axis=0).astype(jnp.int32)[None, None, :]


_REFINE_WCH = 256  # W-chunk per refine grid step ([BLOCK, WCH] VMEM temps)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _refine(wb, o_soa, i_soa, lim, interpret=False):
    """Pallas fused per-ray window refinement.

    wb: [B, 6, W] gathered candidate bounds (bminx|bminy|bminz|bmax...) with
    W minor (the VPU lane axis); o_soa/i_soa: [3, N] sorted ray origins /
    inverse directions; lim: [2, N] per-lane [tmin, t1] (t1 = current best,
    or -inf for occluded any-hit lanes). Returns [B, W] int32 any-lane-pass.
    """
    B, _, W = wb.shape
    wch = min(_REFINE_WCH, W)
    assert W % wch == 0
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B, W // wch),
        in_specs=[
            pl.BlockSpec((1, 6, wch), lambda b, w: (b, 0, w), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, BLOCK), lambda b, w: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, BLOCK), lambda b, w: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, BLOCK), lambda b, w: (0, b), memory_space=pltpu.VMEM),
        ],
        # Out block (1, 1, wch) over a [B, 1, W] array: Mosaic tiles the last
        # two dims, and (1, wch) vs (1, W) satisfies the equal-or-divisible
        # rule for ANY B.  A (1, wch) block over [B, W] does NOT when B > 1
        # (1 is neither 8-divisible nor equal to B) — the round-3 regression
        # that killed every >32k-tri scene on real TPU at compile time.
        out_specs=pl.BlockSpec((1, 1, wch), lambda b, w: (b, 0, w),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _refine_kernel,
        out_shape=jax.ShapeDtypeStruct((B, 1, W), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(wb, o_soa, i_soa, lim)
    return out[:, 0, :]


def _refine_all_kernel(cb_ref, o_ref, i_ref, lim_ref, con_ref, out_ref):
    """Per-ray slab refine of one (block, KT-cluster tile), emitting each
    cluster's MIN passing-lane entry (+inf if no lane's [tmin, t1] slab
    interval overlaps it) — the round-5 static-refine cull.

    Replaces BOTH the conservative block-interval cull (_cull_kernel) and
    the per-round window refine (_refine_kernel): per-ray slabs are
    strictly stronger than the block-interval test (every passing lane
    passes its own slab), and the min passing entry is a TIGHTER walk key
    than the conservative block entry. Reads the SHARED [6, K] bounds
    table directly — the round-1..4 formulation re-GATHERED walk-ordered
    bounds every round ([B, 6, W] rows), which profiling showed was the
    dominant per-round cost (23 ms/round of scattered row gathers on a
    512-block classroom dispatch)."""
    kt = out_ref.shape[2]
    nlane = o_ref.shape[1]
    # predication on the conservative block-interval cull (con_ref is
    # _cull_einit's tile): the per-ray slab pass set is a SUBSET of the
    # conservative pass set, so a tile the conservative cull fully rejects
    # is all-inf here too — skip its [BLOCK, KT] slab math entirely.
    # Coherent blocks reject ~99.9% of clusters, so most tiles skip.
    any_con = jnp.any(con_ref[0, 0, :] < jnp.inf)

    @pl.when(any_con)
    def _compute():
        near = jnp.full((nlane, kt), -jnp.inf)
        far = jnp.full((nlane, kt), jnp.inf)
        for a in range(3):
            bmin = cb_ref[a, :][None, :]  # [1, KT]
            bmax = cb_ref[3 + a, :][None, :]
            oa = o_ref[a, :][:, None]  # [BLOCK, 1]
            ia = i_ref[a, :][:, None]
            t0 = (bmin - oa) * ia
            t1 = (bmax - oa) * ia
            near_ = jnp.maximum(near, jnp.minimum(t0, t1))
            far_ = jnp.minimum(far, jnp.maximum(t0, t1))
            near, far = near_, far_
        near = jnp.maximum(near, lim_ref[0, :][:, None])
        far = jnp.minimum(far, lim_ref[1, :][:, None])
        entry = jnp.where(near <= far, near, jnp.inf)
        # out is [1, 1, KT] over a [B, 1, K] array: Mosaic tiles the last
        # two dims, and (1, kt) vs (1, K) satisfies the equal-or-divisible
        # rule for any B (same trap as _refine's out block, see there)
        out_ref[:] = jnp.min(entry, axis=0)[None, None, :]

    @pl.when(jnp.logical_not(any_con))
    def _reject():
        out_ref[:] = jnp.full((1, 1, kt), jnp.inf)


_RALL_KT = 512  # clusters per refine-all grid step ([BLOCK, KT] VMEM temps)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _refine_all(cb6, o_soa, i_soa, lim, e_con, interpret=False):
    """Static per-ray cull: [B, K] f32 min-passing-entry (+inf = no lane
    can hit the cluster within its initial [tmin, t1]).

    cb6: [6, K] cluster bounds; o_soa/i_soa: [3, n_pad] sorted origins /
    inverse directions; lim: [2, n_pad] per-lane [tmin, t1]; e_con: [B, K]
    conservative block-interval entries (_cull_einit) used to predicate
    whole tiles away."""
    K = cb6.shape[1]
    n = o_soa.shape[1]
    B = n // BLOCK
    kt = min(_RALL_KT, max(K, 1))
    K_pad = ((K + kt - 1) // kt) * kt
    if K_pad != K:  # never-pass padding boxes
        pad = jnp.broadcast_to(
            jnp.array([jnp.inf] * 3 + [-jnp.inf] * 3, jnp.float32)[:, None],
            (6, K_pad - K))
        cb6 = jnp.concatenate([cb6, pad], axis=1)
        e_con = jnp.pad(e_con, ((0, 0), (0, K_pad - K)),
                        constant_values=jnp.inf)
    out = pl.pallas_call(
        _refine_all_kernel,
        out_shape=jax.ShapeDtypeStruct((B, 1, K_pad), jnp.float32),
        grid=(B, K_pad // kt),
        in_specs=[
            pl.BlockSpec((6, kt), lambda b, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, BLOCK), lambda b, k: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, BLOCK), lambda b, k: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, BLOCK), lambda b, k: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kt), lambda b, k: (b, 0, k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, kt), lambda b, k: (b, 0, k),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(cb6, o_soa, i_soa, lim, e_con[:, None, :])
    return out[:, 0, :K]


def _sweep_kernel(tri_ix_ref, xf_ix_ref, o_ref, d_ref, lim_ref, ex_ref,
                  tri_ref, xf_ref, best_in_ref, out_ref, *, any_hit, c_size,
                  dummy_row):
    """MT-test one candidate cluster [C tris] against one ray block [B rays].

    Fully vectorized [C, B] outer-product math: triangle components ride as
    [C, 1] column vectors (no per-triangle scalar loads — the scalar-unrolled
    variant spent most of its 6 us/step on ~1300 scalar VMEM reads). The
    winning triangle per lane is reduced with a (t, slot) lexicographic pick
    so ties resolve to the FIRST slot, matching the sequential semantics.

    xf_ref carries the candidate's world->local affine rows + global-id
    offset (identity/0 for non-instanced candidates): the ray is transformed
    per candidate with an UNNORMALIZED local direction, so t stays the world
    ray parameter (instanced two-level semantics, ref mesh.rs:288-333).
    """
    m = pl.program_id(1)

    @pl.when(m == 0)
    def _init():  # first candidate of this block: seed from the carry
        out_ref[:] = best_in_ref[:]

    b = pl.program_id(0)
    valid = tri_ix_ref[b, m] < dummy_row

    @pl.when(valid)
    def _test():
        mt_block_update(tri_ref[0], xf_ref[0], o_ref, d_ref, lim_ref, ex_ref,
                        out_ref, any_hit=any_hit)


def mt_block_update(tri, x, o_ref, d_ref, lim_ref, ex_ref, out_ref, *,
                    any_hit):
    """MT-test one candidate cluster [C, 12] against the resident ray block
    and fold improvements into out_ref — the shared sweep core (used by the
    pair sweep and the wide-BVH walk's sweep; kept in ONE place so the two
    traversals stay bit-identical)."""
    if True:  # preserved indentation of the original kernel body
        a_x, a_y, a_z = tri[:, 0:1], tri[:, 1:2], tri[:, 2:3]
        e1x, e1y, e1z = tri[:, 3:4], tri[:, 4:5], tri[:, 5:6]
        e2x, e2y, e2z = tri[:, 6:7], tri[:, 7:8], tri[:, 8:9]
        gid = tri[:, 9:10]
        wd_x, wd_y, wd_z = d_ref[0:1, :], d_ref[1:2, :], d_ref[2:3, :]
        wo_x, wo_y, wo_z = o_ref[0:1, :], o_ref[1:2, :], o_ref[2:3, :]
        o_x = x[0, 0] * wo_x + x[0, 1] * wo_y + x[0, 2] * wo_z + x[0, 3]
        o_y = x[0, 4] * wo_x + x[0, 5] * wo_y + x[0, 6] * wo_z + x[0, 7]
        o_z = x[0, 8] * wo_x + x[0, 9] * wo_y + x[0, 10] * wo_z + x[0, 11]
        d_x = x[0, 0] * wd_x + x[0, 1] * wd_y + x[0, 2] * wd_z
        d_y = x[0, 4] * wd_x + x[0, 5] * wd_y + x[0, 6] * wd_z
        d_z = x[0, 8] * wd_x + x[0, 9] * wd_y + x[0, 10] * wd_z
        id_off = x[0, 12]
        tmin = lim_ref[0:1, :]
        ex0, ex1, ex2 = ex_ref[0:1, :], ex_ref[1:2, :], ex_ref[2:3, :]
        # row 3: per-LANE any-hit flag (fused shadow lanes): on first hit the
        # lane's best_t drops to -3e38 — no later candidate can beat it, the
        # per-ray refine and block horizon stop counting it, and the recorded
        # id >= 0 is the occlusion bit (the caller reads only `valid`)
        sh = ex_ref[3, :] > 0.5
        best_t = out_ref[0, :]
        best_id = out_ref[1, :]
        best_u = out_ref[2, :]
        best_v = out_ref[3, :]

        # [C, 1] x [1, B] -> [C, B]
        px = d_y * e2z - d_z * e2y
        py = d_z * e2x - d_x * e2z
        pz = d_x * e2y - d_y * e2x
        det = e1x * px + e1y * py + e1z * pz
        inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
        tx = o_x - a_x
        ty = o_y - a_y
        tz = o_z - a_z
        u = (tx * px + ty * py + tz * pz) * inv_det
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        v = (qx * d_x + qy * d_y + qz * d_z) * inv_det
        t = (qx * e2x + qy * e2y + qz * e2z) * inv_det
        gidw = gid + id_off  # global virtual id ([C,1] + scalar)
        hit = (
            (jnp.abs(det) > 1e-12)
            & (u >= 0.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (t > tmin)
            & (t < best_t[None, :])
            & (gid >= 0.0)  # padding check on the LOCAL id (offset-free)
            & (gidw != ex0)
            & (gidw != ex1)
            & (gidw != ex2)
        )
        if any_hit:
            got = jnp.any(hit, axis=0)
            gsel = jnp.min(jnp.where(hit, gidw, jnp.inf), axis=0)
            out_ref[1, :] = jnp.where(got, gsel, best_id)
        else:
            INF = jnp.float32(jnp.inf)
            t_m = jnp.where(hit, t, INF)
            t_min = jnp.min(t_m, axis=0)  # [B]
            slot = jax.lax.broadcasted_iota(jnp.int32, t_m.shape, 0)
            is_min = t_m == t_min[None, :]
            s_min = jnp.min(jnp.where(is_min, slot, jnp.int32(1 << 30)), axis=0)
            sel = is_min & (slot == s_min[None, :])  # exactly one per lane
            better = t_min < best_t
            u_sel = jnp.sum(jnp.where(sel, u, 0.0), axis=0)
            v_sel = jnp.sum(jnp.where(sel, v, 0.0), axis=0)
            g_sel = jnp.sum(jnp.where(sel, jnp.broadcast_to(gidw, t_m.shape), 0.0), axis=0)
            out_ref[0, :] = jnp.where(
                better, jnp.where(sh, jnp.float32(-3e38), t_min), best_t)
            out_ref[1, :] = jnp.where(better, g_sel, best_id)
            out_ref[2, :] = jnp.where(better, u_sel, best_u)
            out_ref[3, :] = jnp.where(better, v_sel, best_v)


def _sweep_ent_kernel(*refs, any_hit, dummy_row, g, packed):
    """_sweep_kernel + an in-kernel horizon early-out: the candidate's
    conservative entry distance is checked against the CURRENT block horizon
    (max live best-t), so candidates made obsolete by earlier hits in the
    same sweep are skipped without compute (their prefetch is pipelined
    anyway). Shared by the pair sweep and the wide-BVH walk's sweep.

    g candidates are processed per grid step (g (tri, xf) ref pairs ride the
    pipeline): the ~3 us/step Mosaic fixed cost (round-3 profile; the MT
    math itself is ~0.2 us) amortizes over g clusters. Order within the
    step matches the candidate order, so first-tested tie semantics are
    unchanged; the horizon re-tightens between sub-steps.

    packed: the (tri, xf) candidate tables ride ONE int32 prefetch table
    (tri + xf*2^16; see _sweep_ent) — halves the SMEM footprint that caps
    dispatch width."""
    if packed:
        (cd_ref, o_ref, d_ref, lim_ref, ex_ref, cent_ref), rest = (
            refs[:6], refs[6:])

        def tri_at(b, idx):
            return cd_ref[b, idx] % (1 << 16)
    else:
        (tri_ix_ref, _xf_ix_ref, o_ref, d_ref, lim_ref, ex_ref,
         cent_ref), rest = refs[:7], refs[7:]

        def tri_at(b, idx):
            return tri_ix_ref[b, idx]
    tri_refs = rest[:g]
    xf_refs = rest[g:2 * g]
    best_in_ref = rest[2 * g]
    out_ref = rest[2 * g + 1]
    m = pl.program_id(1)

    @pl.when(m == 0)
    def _init():
        out_ref[:] = best_in_ref[:]

    b = pl.program_id(0)
    for i in range(g):
        if any_hit:
            t1 = jnp.where(out_ref[1:2, :] >= 0.0, jnp.float32(-3e38),
                           lim_ref[1:2, :])
        else:
            t1 = out_ref[0:1, :]
        horizon = jnp.max(t1)
        idx = m * g + i
        valid = (tri_at(b, idx) < dummy_row) & (
            cent_ref[0, 0, idx] <= horizon)

        @pl.when(valid)
        def _test(i=i):
            mt_block_update(tri_refs[i][0], xf_refs[i][0], o_ref, d_ref,
                            lim_ref, ex_ref, out_ref, any_hit=any_hit)


def _sweep_group() -> int:
    import os

    try:
        return max(1, int(os.environ.get("AKR_SWEEP_G", "4")))
    except ValueError:
        return 4


@functools.partial(jax.jit, static_argnames=("any_hit", "interpret"))
def _sweep_ent(tri_ix, xf_ix, o_soa, d_soa, lim, ex, cent, tri, xf_tab,
               best_in, any_hit, interpret=False):
    B = tri_ix.shape[0]
    n = o_soa.shape[1]
    c_size = tri.shape[1]
    dummy_row = tri.shape[0] - 1
    maxc = tri_ix.shape[1]
    g = min(_sweep_group(), maxc)
    if maxc % g:  # pad the candidate tables to a group multiple
        padc = ((maxc + g - 1) // g) * g - maxc
        tri_ix = jnp.pad(tri_ix, ((0, 0), (0, padc)),
                         constant_values=dummy_row)
        xf_ix = jnp.pad(xf_ix, ((0, 0), (0, padc)))
        cent = jnp.pad(cent, ((0, 0), (0, 0), (0, padc)),
                       constant_values=jnp.inf)
        maxc += padc

    # SMEM packing: the scalar-prefetch tables are FULLY SMEM-resident
    # (that's what scalar prefetch means), and the 1 MB scoped-SMEM cap is
    # what forced round 4's dispatch-width lane cap (pt.py). When both row
    # spaces fit (tri rows 16 bits, xf rows 15 bits — keeps the packed
    # int32 positive so the index-map // and % are exact), ONE packed
    # table replaces two: packed = tri_ix + (xf_ix << 16).
    packed = tri.shape[0] <= (1 << 16) and xf_tab.shape[0] <= (1 << 15)
    if packed:
        cd = tri_ix + xf_ix * (1 << 16)

        def tri_spec(i):
            return pl.BlockSpec(
                (1, c_size, 12),
                lambda b, m, c, i=i: (c[b, m * g + i] % (1 << 16), 0, 0),
                memory_space=pltpu.VMEM)

        def xf_spec(i):
            return pl.BlockSpec(
                (1, 1, 16),
                lambda b, m, c, i=i: (c[b, m * g + i] // (1 << 16), 0, 0),
                memory_space=pltpu.VMEM)

        n_prefetch, tables = 1, (cd,)

        def vspec(shape):
            return pl.BlockSpec(shape, lambda b, m, c: (0, b),
                                memory_space=pltpu.VMEM)

        cent_spec = pl.BlockSpec((1, 1, maxc), lambda b, m, c: (b, 0, 0),
                                 memory_space=pltpu.SMEM)
    else:
        def tri_spec(i):
            return pl.BlockSpec(
                (1, c_size, 12),
                lambda b, m, c, x, i=i: (c[b, m * g + i], 0, 0),
                memory_space=pltpu.VMEM)

        def xf_spec(i):
            return pl.BlockSpec(
                (1, 1, 16),
                lambda b, m, c, x, i=i: (x[b, m * g + i], 0, 0),
                memory_space=pltpu.VMEM)

        n_prefetch, tables = 2, (tri_ix, xf_ix)

        def vspec(shape):
            return pl.BlockSpec(shape, lambda b, m, c, x: (0, b),
                                memory_space=pltpu.VMEM)

        cent_spec = pl.BlockSpec((1, 1, maxc), lambda b, m, c, x: (b, 0, 0),
                                 memory_space=pltpu.SMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_prefetch,
        grid=(B, maxc // g),
        in_specs=[
            vspec((3, BLOCK)),
            vspec((3, BLOCK)),
            vspec((2, BLOCK)),
            # ex is [4, n_pad] (exclude0|exclude1|exclude2|per-lane any-hit
            # flag): the block MUST cover all 4 rows — a (3, BLOCK) block
            # here is Mosaic-invalid AND would hide the shadow-flag row
            vspec((4, BLOCK)),
            cent_spec,
        ] + [tri_spec(i) for i in range(g)]
          + [xf_spec(i) for i in range(g)]
          + [vspec((4, BLOCK))],
        out_specs=(pl.BlockSpec((4, BLOCK), lambda b, m, c: (0, b),
                                memory_space=pltpu.VMEM) if packed else
                   pl.BlockSpec((4, BLOCK), lambda b, m, c, x: (0, b),
                                memory_space=pltpu.VMEM)),
    )
    return pl.pallas_call(
        functools.partial(_sweep_ent_kernel, any_hit=any_hit,
                          dummy_row=dummy_row, g=g, packed=packed),
        out_shape=jax.ShapeDtypeStruct((4, n), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(*tables, o_soa, d_soa, lim, ex, cent,
      *([tri] * g), *([xf_tab] * g), best_in)


@functools.partial(jax.jit, static_argnames=("any_hit", "interpret"))
def _sweep(tri_ix, xf_ix, o_soa, d_soa, lim, ex, tri, xf_tab, best_in,
           any_hit, interpret=False):
    B = tri_ix.shape[0]
    n = o_soa.shape[1]
    c_size = tri.shape[1]
    dummy_row = tri.shape[0] - 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # tri_ix [B, MAXC], xf_ix [B, MAXC]
        grid=(B, tri_ix.shape[1]),
        in_specs=[
            pl.BlockSpec((3, BLOCK), lambda b, m, c, x: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, BLOCK), lambda b, m, c, x: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, BLOCK), lambda b, m, c, x: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, BLOCK), lambda b, m, c, x: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_size, 12), lambda b, m, c, x: (c[b, m], 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 16), lambda b, m, c, x: (x[b, m], 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, BLOCK), lambda b, m, c, x: (0, b), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, BLOCK), lambda b, m, c, x: (0, b), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_sweep_kernel, any_hit=any_hit, c_size=c_size,
                          dummy_row=dummy_row),
        out_shape=jax.ShapeDtypeStruct((4, n), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(tri_ix, xf_ix, o_soa, d_soa, lim, ex, tri, xf_tab, best_in)


def intersect_pairs(cl, o, d, tmin, tmax, exclude0=None, exclude1=None,
                    exclude2=None, any_hit=False, raw=False, interpret=False,
                    maxc=MAXC, any_hit_mask=None):
    """Exact closest-hit (or any-hit) via sorted blocks + pair sweep.

    cl: ClusterArrays (accel/cluster.py). Returns Hit / occluded like
    intersect_clusters; raw returns the (t, tri, u, v, occ) carry.
    any_hit_mask: optional [n] bool — PER-LANE any-hit semantics inside a
    closest-hit call (fused shadow lanes): a flagged lane retires at its
    FIRST in-range hit (best_t -> -3e38, so refine/horizon stop counting
    it); callers read only `valid` for those lanes.
    """
    n = o.shape[0]
    K = cl.num_clusters
    n_pad = ((n + BLOCK - 1) // BLOCK) * BLOCK
    B = n_pad // BLOCK
    pad = n_pad - n

    # sanitize non-finite rays (a dead lane can legitimately carry NaN from
    # an invalid BSDF sample): one NaN origin/direction would otherwise
    # poison its whole block's interval summaries (olo/ohi/ilo/ihi) and the
    # conservative cull would silently reject EVERY candidate for the
    # block's live lanes. Non-finite lanes trace as dead (tmax = -1).
    finite = jnp.isfinite(o).all(-1) & jnp.isfinite(d).all(-1)
    o = jnp.where(finite[:, None], o, 0.0)
    d = jnp.where(finite[:, None], d, 1.0)
    tmax = jnp.where(finite, tmax, -1.0)

    scene_lo = cl.cbmin.min(axis=0)
    scene_hi = cl.cbmax.max(axis=0)
    keys = _morton_keys(o, d, scene_lo[None, :], scene_hi[None, :])
    # dead lanes (tmax <= tmin: nothing can ever pass `t > tmin, t < tlim`)
    # sort LAST (key above any octant|morton value) so they pack into
    # trailing blocks that terminate before their first round instead of
    # occupying lane slots inside live blocks (VERDICT r2 item 6). Exact:
    # per-lane results never depend on block membership, and removing lanes
    # from a block only shrinks its conservative interval summaries.
    keys = jnp.where(tmax <= tmin, jnp.uint32(0xFFFFFFFF), keys)
    perm = jnp.argsort(keys)

    def srt(x, fill):
        return jnp.pad(x[perm], ((0, pad),) + ((0, 0),) * (x.ndim - 1),
                       constant_values=fill)

    os_ = srt(o, 0.0)
    ds_ = srt(d, 1.0)
    tmins = srt(tmin, 0.0)
    # dead padding lanes: t-limit -1 -> nothing ever hits (t > tmin fails)
    tlims = srt(jnp.minimum(tmax, RAY_TMAX), -1.0)

    def pack_ex(e):
        return srt(e.astype(jnp.float32), -1.0) if e is not None else jnp.full((n_pad,), -1.0)

    sh_row = (srt(any_hit_mask.astype(jnp.float32), 0.0)
              if any_hit_mask is not None else jnp.zeros((n_pad,)))
    ex = jnp.stack([pack_ex(exclude0), pack_ex(exclude1), pack_ex(exclude2),
                    sh_row])
    o_soa = os_.T
    d_soa = ds_.T
    lim = jnp.stack([tmins, tlims])

    # block interval summaries (constant across rounds)
    ob = os_.reshape(B, BLOCK, 3)
    olo, ohi = ob.min(axis=1), ob.max(axis=1)
    inv_d = 1.0 / jnp.where(jnp.abs(ds_) < 1e-20,
                            jnp.where(ds_ < 0, -1e-20, 1e-20), ds_)
    ib = inv_d.reshape(B, BLOCK, 3)
    ilo, ihi = ib.min(axis=1), ib.max(axis=1)
    bt0 = tmins.reshape(B, BLOCK).min(axis=1)

    # triangle table with a trailing dummy cluster (all-degenerate, id -1)
    c_size = cl.tri.shape[1]
    dummy = jnp.zeros((1, c_size, 12), jnp.float32).at[0, :, 9].set(-1.0)
    tri = jnp.concatenate([cl.tri, dummy], axis=0)
    dummy_row = tri.shape[0] - 1
    tri_row = cl.tri_row if cl.tri_row is not None else jnp.arange(K, dtype=jnp.int32)
    ident = jnp.zeros((1, 16), jnp.float32).at[0, 0].set(1.0).at[0, 5].set(1.0).at[0, 10].set(1.0)
    # unified instancing: per-candidate world->local transform rows; plain
    # scenes share a single identity row (xf_ix stays 0). [KX, 1, 16]: the
    # Mosaic block (1, 1, 16) needs its last two dims to match the array's.
    xf_tab = (jnp.concatenate([cl.xf, ident], axis=0) if cl.xf is not None
              else ident)[:, None, :]

    best0 = jnp.stack([
        tlims,
        jnp.full((n_pad,), -1.0),
        jnp.zeros((n_pad,)),
        jnp.zeros((n_pad,)),
    ])
    INF = jnp.inf

    def block_lim(best):
        """Per-block cull horizon: worst live lane's best-t."""
        bt = best[0].reshape(B, BLOCK)
        if any_hit:
            occ = best[1].reshape(B, BLOCK) >= 0.0
            bt = jnp.where(occ, -INF, bt)
        return bt.max(axis=1)

    maxc_eff = min(maxc, K)
    W = min(maxc_eff * WINDOW_MULT, K)
    wch = min(_REFINE_WCH, W)
    W_pad = ((W + wch - 1) // wch) * wch
    posW = jnp.arange(W, dtype=jnp.int32)
    inv_soa = inv_d.T  # [3, n_pad] for the Pallas refine

    # ---- static-refine walk (round 5, default): ONE per-ray cull kernel
    # (_refine_all) computes every (block, cluster)'s min passing-lane
    # entry directly from the shared bounds table; the walk order over
    # THOSE entries enumerates only candidates some lane's initial
    # [tmin, t1] slab can reach, so rounds are sweep-only — no per-round
    # window gather, refine, or selection glue (profiled at ~42 ms/round
    # of the round-4 classroom bounce, the real "structural" cost).
    # Exactness: a lane's hit t in a cluster is >= its own slab near >=
    # the cluster's min passing entry, so the ascending walk + shrinking
    # block horizon keep the same termination proof; non-passing clusters
    # cannot contain a valid hit for any lane by the slab argument.
    # AKR_PAIRS_STATIC=0 reverts to the round-1..4 windowed walk.
    static_walk = _os.environ.get("AKR_PAIRS_STATIC", "1") != "0"
    # initial per-block horizon for the conservative cull (round 5): the
    # walk's own `e_at <= bt1` check with bt1 = block_lim(best) would reject
    # these members anyway (bt1 only shrinks from block_lim(best0)), so
    # clamping the cull exit at the INITIAL horizon is exact and shrinks
    # kcnt up-front — fully-dead blocks (all t1 = -1) reject every cluster
    # and shadow rays cull all geometry beyond the light distance.
    bt1_0 = block_lim(best0)
    if static_walk:
        cb6 = jnp.concatenate([cl.cbmin.T, cl.cbmax.T], axis=0)
        summ = jnp.concatenate(
            [olo, ohi, ilo, ihi, bt0[:, None], bt1_0[:, None],
             jnp.zeros((B, 2))], axis=1
        )
        e_con = _cull_einit(summ, cb6, interpret)
        e_init = _refine_all(cb6, o_soa, inv_soa, lim, e_con, interpret)
        worder = jnp.argsort(e_init, axis=1).astype(jnp.int32)
        went = jnp.take_along_axis(e_init, worder, axis=1)
        kcnt = jnp.sum(jnp.isfinite(e_init), axis=1).astype(jnp.int32)
        posC = jnp.arange(maxc_eff, dtype=jnp.int32)

        def win_live_s(cursor, bt1):
            c = jnp.minimum(cursor, K - 1)
            e_at = jnp.take_along_axis(went, c[:, None], axis=1)[:, 0]
            return (cursor < kcnt) & (e_at <= bt1)

        def round_body_s(carry):
            cursor, live, best = carry
            idx = cursor[:, None] + posC[None, :]
            idx_c = jnp.minimum(idx, K - 1)
            cand_i = jnp.take_along_axis(worder, idx_c, axis=1)
            cand_er = jnp.take_along_axis(went, idx_c, axis=1)
            ok = (idx < kcnt[:, None]) & live[:, None] & jnp.isfinite(cand_er)
            tri_ix = jnp.where(ok, tri_row[cand_i], dummy_row).astype(jnp.int32)
            if cl.xf is not None:
                xf_ix = jnp.where(ok, cand_i, K).astype(jnp.int32)
            else:
                xf_ix = jnp.zeros_like(tri_ix)
            cand_e = jnp.where(ok, cand_er, jnp.inf)[:, None, :].astype(jnp.float32)
            out = _sweep_ent(tri_ix, xf_ix, o_soa, d_soa, lim, ex, cand_e,
                             tri, xf_tab, best, any_hit, interpret)
            cursor_new = jnp.where(live, cursor + maxc_eff, cursor)
            new_live = live & win_live_s(cursor_new, block_lim(out))
            return (cursor_new, new_live, out)

        cur0 = jnp.zeros((B,), jnp.int32)
        carry = (cur0, win_live_s(cur0, block_lim(best0)), best0)
        _, _, best = jax.lax.while_loop(
            lambda c: jnp.any(c[1]), round_body_s, carry
        )
        return _unsort_hits(best, perm, n, raw, any_hit)

    # ---- cursor walk precompute: each block's full candidate order, ONCE.
    # The per-round top_k over [B, K] (the dominant XLA op of the threshold
    # formulation at large K) is replaced by ONE stable argsort here; rounds
    # then just gather the next W members at a per-block cursor. Exactness:
    # the walk order is ascending (entry, id) — identical to the lex
    # threshold's enumeration — and the block horizon bt1 only SHRINKS, so
    # the first member whose entry exceeds bt1 ends the block permanently
    # (every later member's entry is >= it). Members straddling a window
    # whose entry exceeds bt1, or that no live lane's [tmin, best_t] slab
    # interval can reach, fail the per-ray refine (block entry lower-bounds
    # every lane's true entry) and are consumed vacuously, exactly like the
    # threshold formulation's zero-pass members.
    if _os.environ.get("AKR_PALLAS_CULL", "1") != "0":
        # fused Pallas cull (bit-exact; see _cull_kernel)
        summ = jnp.concatenate(
            [olo, ohi, ilo, ihi, bt0[:, None], bt1_0[:, None],
             jnp.zeros((B, 2))], axis=1
        )
        cb6 = jnp.concatenate([cl.cbmin.T, cl.cbmax.T], axis=0)
        e_init = _cull_einit(summ, cb6, interpret)
    else:
        ent_raw, exit_raw = _block_entries_raw(
            cl.cbmin, cl.cbmax, olo, ohi, ilo, ihi, bt0, bt1max=bt1_0
        )
        e_init = jnp.where(ent_raw <= exit_raw, ent_raw, INF)
    worder = jnp.argsort(e_init, axis=1).astype(jnp.int32)  # stable: id asc
    went = jnp.take_along_axis(e_init, worder, axis=1)  # [B, K] ascending
    kcnt = jnp.sum(jnp.isfinite(e_init), axis=1).astype(jnp.int32)

    def win_live(cursor, bt1):
        """Is the member AT the cursor still consumable? (ascending order:
        no -> the whole remaining tail is dead too)."""
        c = jnp.minimum(cursor, K - 1)
        e_at = jnp.take_along_axis(went, c[:, None], axis=1)[:, 0]
        return (cursor < kcnt) & (e_at <= bt1)

    def round_cond2(carry):
        return jnp.any(carry[1])

    def round_body(carry):
        cursor, live, best = carry
        bt1 = block_lim(best)
        # window: next W members of the precomputed walk order ([B, W]
        # gathers replace the [B, K] top_k + masking of the old threshold
        # rounds)
        idx = cursor[:, None] + posW[None, :]
        idx_c = jnp.minimum(idx, K - 1)
        win_e = jnp.take_along_axis(went, idx_c, axis=1)
        win_i = jnp.take_along_axis(worder, idx_c, axis=1)
        win_e = jnp.where((idx < kcnt[:, None]) & live[:, None], win_e, INF)

        # per-ray slab refinement (Pallas, [BLOCK, wch] VMEM temps): which
        # window members can ANY live lane hit within [tmin, best_t]?
        # [B, 6, W]: W minor = the VPU lane axis inside the kernel
        wb = jnp.concatenate(
            [cl.cbmin[win_i], cl.cbmax[win_i]], axis=-1
        ).transpose(0, 2, 1)
        if W_pad != W:  # pad with never-pass boxes (min=+inf, max=-inf)
            fill = jnp.broadcast_to(
                jnp.array([INF] * 3 + [-INF] * 3, jnp.float32)[None, :, None],
                (B, 6, W_pad - W),
            )
            wb = jnp.concatenate([wb, fill], axis=2)
        lane_t1 = best[0]
        if any_hit:
            lane_t1 = jnp.where(best[1] >= 0.0, -INF, lane_t1)
        passed = _refine(wb, o_soa, inv_soa, jnp.stack([tmins, lane_t1]),
                         interpret)
        nonzero = (passed[:, :W] > 0) & jnp.isfinite(win_e)  # [B, W]

        # walk the window in conservative order: sweep the first maxc
        # nonzero-pass members; zero-pass members before the cut are consumed
        # vacuously (no ray can hit them)
        kept_rank = jnp.cumsum(nonzero.astype(jnp.int32), axis=1)
        selected = nonzero & (kept_rank <= maxc_eff)
        kept_count = kept_rank[:, -1]
        full_consume = kept_count <= maxc_eff
        cut = jnp.max(jnp.where(selected, posW[None, :], -1), axis=1)
        advance = jnp.where(full_consume, W, cut + 1)

        # compact the selected members (order-preserving) into [B, maxc_eff]
        key = jnp.where(selected, posW[None, :], W + posW[None, :])
        order = jnp.argsort(key, axis=1)[:, :maxc_eff]
        cand_ok = jnp.take_along_axis(selected, order, axis=1)
        cand_i = jnp.take_along_axis(win_i, order, axis=1)
        tri_ix = jnp.where(cand_ok, tri_row[cand_i], dummy_row).astype(jnp.int32)
        if cl.xf is not None:
            xf_ix = jnp.where(cand_ok, cand_i, K).astype(jnp.int32)
        else:
            xf_ix = jnp.zeros_like(tri_ix)
        # per-candidate conservative entry for the sweep's horizon early-out
        # (ascending within a block: the sweep skips the tail once the block's
        # best hits are all nearer)
        cand_e = jnp.where(
            cand_ok, jnp.take_along_axis(win_e, order, axis=1), jnp.inf
        )[:, None, :].astype(jnp.float32)
        out = _sweep_ent(tri_ix, xf_ix, o_soa, d_soa, lim, ex, cand_e,
                         tri, xf_tab, best, any_hit, interpret)
        cursor_new = jnp.where(live, cursor + advance, cursor)
        new_live = live & win_live(cursor_new, block_lim(out))
        return (cursor_new, new_live, out)

    cur0 = jnp.zeros((B,), jnp.int32)
    carry = (cur0, win_live(cur0, block_lim(best0)), best0)
    _, _, best = jax.lax.while_loop(round_cond2, round_body, carry)
    return _unsort_hits(best, perm, n, raw, any_hit)


def _unsort_hits(best, perm, n, raw, any_hit):
    """Undo the ray sort: sorted position p holds ray perm[p], so original
    ray i reads position inv[i]."""
    inv = jnp.zeros((n,), jnp.int32).at[perm].set(jnp.arange(n, dtype=jnp.int32))
    t = best[0][inv]
    tri_id = best[1][inv].astype(jnp.int32)
    u = best[2][inv]
    v = best[3][inv]
    occ = tri_id >= 0
    t = jnp.where(occ, t, RAY_TMAX)
    if raw:
        return t, tri_id, u, v, occ
    if any_hit:
        return occ
    from .trace import Hit

    return Hit(t=t, tri_id=tri_id, bary=jnp.stack([u, v], -1), valid=occ)
