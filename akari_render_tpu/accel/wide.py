"""Per-block wide-BVH traversal: a DMA-free walk kernel + pipelined sweep.

Round-2's pair sweep (accel/pairs.py) advanced all ray blocks in lockstep
ROUNDS: every round re-ran a [B, K] conservative interval cull, a W-wide
top_k over all K clusters and a [B, BLOCK, W] per-ray slab refinement before
handing MAXC candidates per block to the sweep kernel. Profiling (STATUS r2
"known gaps" 1) showed that round machinery — not the triangle math —
dominating on large scenes.

This module replaces the cull/top_k/refinement with a HIERARCHICAL walk:
per sorted 512-ray block, one Pallas program descends an 8-wide BVH built
over cluster AABBs (the packed node table stays VMEM-resident), testing all
8 children of a node against ALL lanes at once ([8, 512] slab tests, pure
VPU) and pushing passing children far-to-near on a per-block SMEM stack
using per-octant traversal orders precomputed at build time (rays in a
block share a direction octant by construction of the sort key). Leaf pops
EMIT the candidate cluster (triangle-table row, instance-transform index,
per-lane-refined entry distance) instead of intersecting it, because manual
HBM->VMEM DMAs (`pltpu.make_async_copy`) hard-fault the TPU worker through
the axon relay — measured on minimal repros (static row, unconditional, no
loop: still faults), while the Mosaic pipeline's scalar-prefetch-driven
block fetches (the pairs.py mechanism) are rock-solid. So candidates flow
to a SECOND kernel — the same [C, B] Möller-Trumbore sweep as pairs.py
(shared core: pairs.mt_block_update), extended with an in-kernel horizon
early-out: a candidate whose refined entry exceeds the block's worst live
best-t is skipped without compute.

The walk is RESUMABLE: its stack lives in SMEM during the walk and is
carried in/out as kernel operands, so when a block emits more than MAXC
candidates the round loop (a lax.while_loop, no host sync) re-enters the
walk with the tightened per-lane best-t from the sweep and the saved stack.
Blocks that finish keep an empty stack and pass through untouched. Most
blocks finish in one round — rounds are per-block adaptive, not global
lockstep: a finished block's walk is O(1) while a heavy block keeps
draining, and no [B, K] work ever recurs.

Exactness argument: a child's pushed entry is min over passing lanes of its
per-lane slab entry, clamped by per-lane [tmin, best_t] — a lower bound on
any contained triangle's hit t for every lane. A popped entry beyond the
block horizon (max over live lanes of best_t) can improve no lane, so
discarding its subtree is exact; emission order only affects efficiency.
The sweep's skip test re-checks the same bound against the CURRENT best
(tightened within the sweep itself).

Replaces rtx::Accel per-ray descent (ref mesh.rs:288-333, scene.rs:42-110)
with the TPU-native equivalent: VMEM-resident inner nodes, vector lanes as
the packet, pipelined leaf streaming.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.math import RAY_TMAX
from .pairs import BLOCK, _morton_keys, _sweep_ent

STACK_DEPTH = 192  # >= 7 * tree_depth + 8; builder asserts
MAXC_WIDE = 128  # candidates emitted per walk round (sweep minor grid size)
_EMPTY = np.float32(1e38)  # empty child-slot bounds: slab entry -> +inf
_NEG = -3e38  # python float: jnp module-level constants would be captured
_VMEM_NODE_BUDGET = 8 << 20  # nodes beyond this stay on the pairs path


# ---------------------------------------------------------------- host build
def build_wide(cbmin: np.ndarray, cbmax: np.ndarray,
               tri_row: np.ndarray | None = None) -> np.ndarray:
    """8-wide BVH over cluster AABBs, packed for VMEM residency.

    Returns [Nn, 128] int32: per node 8 child slots with
      cols 0:48   child AABBs as f32 bits (bminx[8] bminy bminz bmaxx bmaxy bmaxz)
      cols 48:56  child words: >=0 internal node id; -(cand+2) leaf; -1 empty
      cols 56:64  per-octant near-first slot permutations (8 nibbles each)
      cols 64:72  leaf triangle-table rows (tri_row[cand])
    int32 storage keeps small integer words exact (f32 bit patterns of small
    ints are denormals a float pipeline may flush).
    """
    K = len(cbmin)
    cbmin = np.asarray(cbmin, np.float32)
    cbmax = np.asarray(cbmax, np.float32)
    cent = 0.5 * (cbmin + cbmax)
    rows = (np.arange(K, dtype=np.int64) if tri_row is None
            else np.asarray(tri_row, np.int64))

    nb: list[np.ndarray] = []  # [8, 6] child bounds
    nc: list[np.ndarray] = []  # [8] child words
    nr: list[np.ndarray] = []  # [8] leaf tri rows
    no: list[np.ndarray] = []  # [8] octant order words

    def alloc() -> int:
        nb.append(np.full((8, 6), _EMPTY, np.float32))
        nc.append(np.full(8, -1, np.int64))
        nr.append(np.zeros(8, np.int64))
        no.append(np.zeros(8, np.int64))
        return len(nc) - 1

    def split8(ids: np.ndarray) -> list[np.ndarray]:
        groups = [ids]
        while len(groups) < 8:
            gi = max(range(len(groups)), key=lambda i: len(groups[i]))
            g = groups[gi]
            if len(g) <= 1:
                break
            c = cent[g]
            axis = int(np.argmax(c.max(0) - c.min(0)))
            order = np.argsort(c[:, axis], kind="stable")
            h = len(g) // 2
            groups[gi : gi + 1] = [g[order[:h]], g[order[h:]]]
        return [g for g in groups if len(g)]

    root = alloc()
    work = [(np.arange(K, dtype=np.int64), root, 1)]
    max_depth = 1
    while work:
        ids, ni, depth = work.pop()
        max_depth = max(max_depth, depth)
        groups = split8(ids)
        cents = np.zeros((8, 3), np.float32)
        for j, g in enumerate(groups):
            bmin = cbmin[g].min(0)
            bmax = cbmax[g].max(0)
            nb[ni][j] = np.concatenate([bmin, bmax])
            cents[j] = 0.5 * (bmin + bmax)
            if len(g) == 1:
                cand = int(g[0])
                nc[ni][j] = -(cand + 2)
                nr[ni][j] = rows[cand]
            else:
                ci = alloc()
                nc[ni][j] = ci
                work.append((g, ci, depth + 1))
        # per-octant near-first slot order (octant bit2=x<0, bit1=y<0, bit0=z<0
        # — matching pairs._morton_keys)
        ng = len(groups)
        for oc in range(8):
            s = np.array(
                [-1.0 if (oc >> 2) & 1 else 1.0,
                 -1.0 if (oc >> 1) & 1 else 1.0,
                 -1.0 if oc & 1 else 1.0], np.float32)
            keys = cents[:ng] @ s
            order = list(np.argsort(keys, kind="stable")) + list(range(ng, 8))
            word = 0
            for r, slot in enumerate(order):
                word |= int(slot) << (4 * r)
            no[ni][oc] = word

    assert 7 * max_depth + 8 <= STACK_DEPTH, (
        f"wide BVH depth {max_depth} exceeds stack budget")
    Nn = len(nc)
    out = np.zeros((Nn, 128), np.int32)
    b = np.stack(nb)  # [Nn, 8, 6]
    for c in range(6):
        out[:, 8 * c : 8 * (c + 1)] = b[:, :, c].view(np.int32)
    out[:, 48:56] = np.stack(nc).astype(np.int32)
    out[:, 56:64] = np.stack(no).astype(np.int32)
    out[:, 64:72] = np.stack(nr).astype(np.int32)
    return out


def attach_wide(cl):
    """Build + attach the packed wide-BVH node table to a ClusterArrays.
    Node tables beyond the VMEM residency budget are not attached (the
    router then keeps the pair-sweep path)."""
    tri_row = None if cl.tri_row is None else np.asarray(cl.tri_row)
    nodes = build_wide(np.asarray(cl.cbmin), np.asarray(cl.cbmax), tri_row)
    if nodes.nbytes > _VMEM_NODE_BUDGET:
        return cl
    return cl._replace(wide=jnp.asarray(nodes))


# ---------------------------------------------------------------- the walk
def _sel_i(vec_1x8, idx):
    """Dynamic extract from a (1, 8) int32 vector -> rank-0."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
    return jnp.sum(jnp.where(lane == idx, vec_1x8, 0))


def _sel_f(vec_1x8, idx, fill):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
    return jnp.sum(jnp.where(lane == idx, vec_1x8, fill))


def _walk_kernel(nodes_ref, o_ref, d_ref, lim_ref, best_in_ref,
                 sid_in, se_in, srow_in, sp_in,
                 crow_ref, cxf_ref, cent_ref, sid_out, se_out, srow_out,
                 cnt_ref, invd_ref, *, any_hit, maxc):
    """Resumable wide-BVH descent for one 512-ray block (no DMA, no MT).

    Pops the SMEM stack; internal nodes expand via [8, B] per-lane slab
    tests and push passing children far-to-near in this block's octant
    order; leaf pops emit (tri row, candidate id, entry) until `maxc`
    candidates are out or the stack drains. Stack state is carried through
    sid/se/srow + sp operands so the round loop can resume the walk after a
    sweep tightens the lanes' best-t.
    """
    d = d_ref[:]
    tiny = jnp.abs(d) < 1e-20
    invd_ref[:] = 1.0 / jnp.where(tiny, jnp.where(d < 0, -1e-20, 1e-20), d)
    oct_ = (
        (jnp.sum(d_ref[0:1, 0:1]) < 0).astype(jnp.int32) * 4
        + (jnp.sum(d_ref[1:2, 0:1]) < 0).astype(jnp.int32) * 2
        + (jnp.sum(d_ref[2:3, 0:1]) < 0).astype(jnp.int32)
    )

    # working stack = the OUT refs, seeded from the IN refs (only live rows)
    sp0 = sp_in[0, 0, 0]

    def _cp(i, _):
        sid_out[0, 0, i] = sid_in[0, 0, i]
        se_out[0, 0, i] = se_in[0, 0, i]
        srow_out[0, 0, i] = srow_in[0, 0, i]
        return 0

    jax.lax.fori_loop(0, sp0, _cp, 0)

    def _fill(i, _):
        crow_ref[0, 0, i] = jnp.int32(-1)
        cxf_ref[0, 0, i] = jnp.int32(-1)
        cent_ref[0, 0, i] = jnp.float32(_EMPTY)
        return 0

    jax.lax.fori_loop(0, maxc, _fill, 0)

    # per-lane t1: current best (closest) or -inf once occluded (any-hit);
    # fixed for the whole walk — the sweep re-checks against the live best
    if any_hit:
        t1 = jnp.where(best_in_ref[1:2, :] >= 0.0, _NEG, lim_ref[1:2, :])
    else:
        t1 = best_in_ref[0:1, :]  # (1, B)
    horizon = jnp.max(t1)
    t0r = lim_ref[0:1, :]

    def body(carry):
        sp, n = carry
        sp1 = sp - 1
        val = sid_out[0, 0, sp1]
        ent = se_out[0, 0, sp1]
        row = srow_out[0, 0, sp1]
        live = ent <= horizon

        new_n = jnp.where(live & (val < -1), n + 1, n)

        @pl.when(live & (val < -1))
        def _leaf():  # emit the candidate; the sweep intersects it
            crow_ref[0, 0, n] = row
            cxf_ref[0, 0, n] = -val - jnp.int32(2)
            cent_ref[0, 0, n] = ent

        # push count comes back through SMEM scratch (cnt_ref[0, 1]): zeroed
        # here, overwritten inside the node region, read after it — scalar
        # memory is sequentially consistent within a program
        cnt_ref[0, 0, 1] = jnp.int32(0)

        @pl.when(live & (val >= 0))
        def _node():
            nrow = nodes_ref[pl.ds(val, 1), :]  # (1, 128) int32

            def bounds(c):  # (8, 1) f32 from cols [8c : 8c+8]
                v = jax.lax.bitcast_convert_type(
                    nrow[:, 8 * c : 8 * (c + 1)], jnp.float32)
                return jnp.transpose(v, (1, 0))

            near = jnp.full((8, o_ref.shape[1]), _NEG)
            far = jnp.full((8, o_ref.shape[1]), -_NEG)
            for a in range(3):
                bmin = bounds(a)
                bmax = bounds(3 + a)
                oa = o_ref[a : a + 1, :]
                ia = invd_ref[a : a + 1, :]
                ta = (bmin - oa) * ia
                tb = (bmax - oa) * ia
                near = jnp.maximum(near, jnp.minimum(ta, tb))
                far = jnp.minimum(far, jnp.maximum(ta, tb))
            near = jnp.maximum(near, t0r)
            far = jnp.minimum(far, t1)
            passm = near <= far  # [8, B]
            entry8 = jnp.min(
                jnp.where(passm, near, jnp.float32(jnp.inf)),
                axis=1, keepdims=True)  # (8, 1)
            entry_l = jnp.transpose(entry8, (1, 0))  # (1, 8)
            cw = nrow[:, 48:56]
            rw = nrow[:, 64:72]
            ow = _sel_i(nrow[:, 56:64], oct_)  # this block's octant order
            off = jnp.int32(0)
            # push far-to-near: order nibbles are near-first
            for s in range(7, -1, -1):
                slot = (ow >> (4 * s)) & 7
                e_s = _sel_f(entry_l, slot, jnp.float32(0.0))
                c_s = _sel_i(cw, slot)
                r_s = _sel_i(rw, slot)
                do = (e_s < 1e30) & (c_s != -1)

                @pl.when(do)
                def _push(e_s=e_s, c_s=c_s, r_s=r_s, off=off):
                    sid_out[0, 0, sp1 + off] = c_s
                    se_out[0, 0, sp1 + off] = e_s
                    srow_out[0, 0, sp1 + off] = r_s

                off = off + do.astype(jnp.int32)
            cnt_ref[0, 0, 1] = off

        return sp1 + cnt_ref[0, 0, 1], new_n

    sp_f, n_f = jax.lax.while_loop(
        lambda c: (c[0] > 0) & (c[1] < maxc), body,
        (sp0, jnp.int32(0)),
    )
    cnt_ref[0, 0, 0] = sp_f
    cnt_ref[0, 0, 1] = n_f


@functools.partial(jax.jit, static_argnames=("any_hit", "interpret", "maxc"))
def _walk(nodes, o_soa, d_soa, lim, best_in, sid, se, srow, sp,
          any_hit, maxc, interpret=False):
    n = o_soa.shape[1]
    B = n // BLOCK
    SD = STACK_DEPTH
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(nodes.shape, lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, BLOCK), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, BLOCK), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, BLOCK), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, BLOCK), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, SD), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, SD), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, SD), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, maxc), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, maxc), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, maxc), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, SD), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, SD), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, SD), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 2), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((3, BLOCK), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_walk_kernel, any_hit=any_hit, maxc=maxc),
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, maxc), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, maxc), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, maxc), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, SD), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, SD), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, SD), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 2), jnp.int32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(nodes, o_soa, d_soa, lim, best_in, sid, se, srow, sp)


# ---------------------------------------------------------------- driver
def intersect_wide(cl, o, d, tmin, tmax, exclude0=None, exclude1=None,
                   exclude2=None, any_hit=False, raw=False, interpret=False,
                   maxc=MAXC_WIDE):
    """Exact closest-hit (or any-hit) via walk + sweep rounds.

    Drop-in for intersect_pairs (same ClusterArrays input; cl.wide must be
    attached via attach_wide at scene build).
    """
    assert cl.wide is not None, "call attach_wide(cl) at build time"
    n = o.shape[0]
    K = cl.num_clusters
    n_pad = ((n + BLOCK - 1) // BLOCK) * BLOCK
    B = n_pad // BLOCK
    pad = n_pad - n

    # non-finite rays trace as dead (see pairs.py: one NaN lane would poison
    # nothing here per-lane, but keep the two drivers' contracts identical)
    finite = jnp.isfinite(o).all(-1) & jnp.isfinite(d).all(-1)
    o = jnp.where(finite[:, None], o, 0.0)
    d = jnp.where(finite[:, None], d, 1.0)
    tmax = jnp.where(finite, tmax, -1.0)

    scene_lo = cl.cbmin.min(axis=0)
    scene_hi = cl.cbmax.max(axis=0)
    keys = _morton_keys(o, d, scene_lo[None, :], scene_hi[None, :])
    perm = jnp.argsort(keys)

    def srt(x, fill):
        return jnp.pad(x[perm], ((0, pad),) + ((0, 0),) * (x.ndim - 1),
                       constant_values=fill)

    os_ = srt(o, 0.0)
    ds_ = srt(d, 1.0)
    tmins = srt(tmin, 0.0)
    tlims = srt(jnp.minimum(tmax, RAY_TMAX), -1.0)

    def pack_ex(e):
        return (srt(e.astype(jnp.float32), -1.0) if e is not None
                else jnp.full((n_pad,), -1.0))

    ex = jnp.stack([pack_ex(exclude0), pack_ex(exclude1), pack_ex(exclude2),
                    jnp.zeros((n_pad,))])  # row 3: per-lane any-hit (unused)
    lim = jnp.stack([tmins, tlims])
    o_soa = os_.T
    d_soa = ds_.T

    # triangle table with a trailing dummy cluster (all-degenerate, id -1)
    c_size = cl.tri.shape[1]
    dummy = jnp.zeros((1, c_size, 12), jnp.float32).at[0, :, 9].set(-1.0)
    tri = jnp.concatenate([cl.tri, dummy], axis=0)
    dummy_row = tri.shape[0] - 1
    ident = (jnp.zeros((1, 16), jnp.float32)
             .at[0, 0].set(1.0).at[0, 5].set(1.0).at[0, 10].set(1.0))
    xf_tab = (jnp.concatenate([cl.xf, ident], axis=0) if cl.xf is not None
              else ident)[:, None, :]

    best0 = jnp.stack([
        tlims,
        jnp.full((n_pad,), -1.0),
        jnp.zeros((n_pad,)),
        jnp.zeros((n_pad,)),
    ])

    # initial stacks: the root node, entry -inf
    SD = STACK_DEPTH
    sid0 = jnp.zeros((B, 1, SD), jnp.int32)
    se0 = jnp.full((B, 1, SD), _NEG, jnp.float32)
    srow0 = jnp.zeros((B, 1, SD), jnp.int32)
    sp0 = jnp.ones((B, 1, 1), jnp.int32)

    def cond(carry):
        return jnp.any(carry[4][:, 0, 0] > 0)

    def body(carry):
        best, sid, se, srow, sp = carry
        crow, cxf, cent, sid, se, srow, cnt = _walk(
            cl.wide, o_soa, d_soa, lim, best, sid, se, srow, sp,
            any_hit, maxc, interpret,
        )
        crow, cxf = crow[:, 0], cxf[:, 0]  # cent stays (B, 1, maxc): SMEM 3-D
        ok = crow >= 0
        tri_ix = jnp.where(ok, crow, dummy_row).astype(jnp.int32)
        if cl.xf is not None:
            xf_ix = jnp.where(ok, cxf, K).astype(jnp.int32)
        else:
            xf_ix = jnp.zeros_like(tri_ix)
        best = _sweep_ent(tri_ix, xf_ix, o_soa, d_soa, lim, ex, cent,
                          tri, xf_tab, best, any_hit, interpret)
        return (best, sid, se, srow, cnt[:, :, 0:1])

    best, _, _, _, _ = jax.lax.while_loop(
        cond, body, (best0, sid0, se0, srow0, sp0)
    )

    inv = jnp.zeros((n,), jnp.int32).at[perm].set(
        jnp.arange(n, dtype=jnp.int32))
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
