"""Pallas TPU kernel: brute-force ray-triangle intersection.

The XLA brute-force path (accel/trace.py) materializes [T, N] intermediates
in HBM (~10 arrays per Möller-Trumbore pass); at 1M rays that is HBM-bound
~8x off compute. This kernel tiles rays into VMEM blocks and loops the
(small) triangle list entirely on-chip: per grid step everything lives in
VMEM/registers, so the VPU runs at compute bound.

Small scenes (T <= TRI_CHUNK, e.g. cbox's 36 triangles) run one triangle
chunk; mid-size scenes (up to Scene.PALLAS_MAX_TRIS) add an inner grid
dimension over TRI_CHUNK-triangle chunks — the per-ray-block output stays
VMEM-resident across consecutive chunk steps (Pallas TPU revisiting /
reduction pattern), so best-hit state never round-trips HBM. Beyond that the
cluster accel takes over. Layouts are SoA with the RAY axis minor ([3, N]
etc.) so vectors map onto full 128-wide lanes.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.math import RAY_TMAX

# Rays per grid step. VMEM cost is ~16 f32 rows x BLOCK x 4B (~2 MB at 32k),
# well inside the ~16 MB budget; a LARGE block amortizes the ~us-scale fixed
# cost per Mosaic grid step, which dominates for small triangle counts
# (cbox: 36 tris x 2048 rays is only ~4.4 MFLOP/step).
BLOCK = int(os.environ.get("AKR_BRUTE_BLOCK", "2048"))
TRI_CHUNK = 512  # triangles per inner grid step (static unroll per chunk)


def _kernel(tri_ref, o_ref, d_ref, lim_ref, ex_ref, out_ref, *, num_tris, any_hit):
    o_x, o_y, o_z = o_ref[0, :], o_ref[1, :], o_ref[2, :]
    d_x, d_y, d_z = d_ref[0, :], d_ref[1, :], d_ref[2, :]
    tmin = lim_ref[0, :]
    ex0 = ex_ref[0, :]
    ex1 = ex_ref[1, :]
    ex2 = ex_ref[2, :]

    chunk = pl.program_id(1) if num_tris > TRI_CHUNK else 0
    base = (chunk * TRI_CHUNK).astype(jnp.float32) if num_tris > TRI_CHUNK else 0.0

    @pl.when(chunk == 0)
    def _init():
        out_ref[0, :] = lim_ref[1, :]  # tmax as initial best
        out_ref[1, :] = jnp.full_like(ex0, -1.0)
        out_ref[2, :] = jnp.zeros_like(tmin)
        out_ref[3, :] = jnp.zeros_like(tmin)

    best_t = out_ref[0, :]
    best_id = out_ref[1, :]
    best_u = out_ref[2, :]
    best_v = out_ref[3, :]

    n_unroll = min(num_tris, TRI_CHUNK)
    for j in range(n_unroll):  # static unroll: tri scalars become constants
        ax, ay, az = tri_ref[j, 0], tri_ref[j, 1], tri_ref[j, 2]
        e1x, e1y, e1z = tri_ref[j, 3], tri_ref[j, 4], tri_ref[j, 5]
        e2x, e2y, e2z = tri_ref[j, 6], tri_ref[j, 7], tri_ref[j, 8]
        # pvec = d x e2
        px = d_y * e2z - d_z * e2y
        py = d_z * e2x - d_x * e2z
        pz = d_x * e2y - d_y * e2x
        det = e1x * px + e1y * py + e1z * pz
        inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
        tx = o_x - ax
        ty = o_y - ay
        tz = o_z - az
        u = (tx * px + ty * py + tz * pz) * inv_det
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        v = (qx * d_x + qy * d_y + qz * d_z) * inv_det
        t = (qx * e2x + qy * e2y + qz * e2z) * inv_det
        gid = base + j  # global triangle id (float: exact to 2^24)
        hit = (
            (jnp.abs(det) > 1e-12)
            & (u >= 0.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (t > tmin)
            & (t < best_t)
            & (gid != ex0)
            & (gid != ex1)
            & (gid != ex2)
        )
        if any_hit:
            best_id = jnp.where(hit, gid, best_id)
        else:
            best_t = jnp.where(hit, t, best_t)
            best_id = jnp.where(hit, gid, best_id)
            best_u = jnp.where(hit, u, best_u)
            best_v = jnp.where(hit, v, best_v)

    out_ref[0, :] = best_t
    out_ref[1, :] = best_id
    out_ref[2, :] = best_u
    out_ref[3, :] = best_v


@functools.partial(
    jax.jit, static_argnames=("num_tris", "any_hit", "interpret", "block")
)
def _run(tri, o_soa, d_soa, lim, ex, num_tris, any_hit, interpret=False,
         block=None):
    block = block or BLOCK
    n = o_soa.shape[1]
    if num_tris <= TRI_CHUNK:
        grid = (n // block,)
        tri_spec = pl.BlockSpec((tri.shape[0], 12), lambda i: (0, 0), memory_space=pltpu.VMEM)
        ray_ix = lambda i: (0, i)
    else:
        # inner (minor) grid dim walks triangle chunks; the out block index is
        # constant in j, so best-hit state stays resident in VMEM across chunks
        n_chunks = tri.shape[0] // TRI_CHUNK
        grid = (n // block, n_chunks)
        tri_spec = pl.BlockSpec((TRI_CHUNK, 12), lambda i, j: (j, 0), memory_space=pltpu.VMEM)
        ray_ix = lambda i, j: (0, i)
    return pl.pallas_call(
        functools.partial(_kernel, num_tris=num_tris, any_hit=any_hit),
        out_shape=jax.ShapeDtypeStruct((4, n), jnp.float32),
        grid=grid,
        in_specs=[
            tri_spec,
            pl.BlockSpec((3, block), ray_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, block), ray_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, block), ray_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, block), ray_ix, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, block), ray_ix, memory_space=pltpu.VMEM),
        interpret=interpret,
    )(tri, o_soa, d_soa, lim, ex)


def intersect_pallas(tri_packed, o, d, tmin, tmax, exclude0=None, exclude1=None,
                     exclude2=None, any_hit=False, interpret=False, block=None):
    """tri_packed: [T, 12] (v0|e1|e2|pad) f32; o/d: [N, 3]. Returns Hit / occluded.

    N is padded to the ray-block size internally.
    """
    from .trace import Hit

    block = block or BLOCK
    n = o.shape[0]
    n_pad = ((n + block - 1) // block) * block
    pad = n_pad - n

    def pad1(x, fill=0.0):
        return jnp.pad(x, ((0, pad),), constant_values=fill)

    o_soa = jnp.pad(o.T, ((0, 0), (0, pad)))
    d_soa = jnp.pad(d.T, ((0, 0), (0, pad)), constant_values=1.0)
    lim = jnp.stack([pad1(tmin), pad1(tmax, fill=-1.0)], axis=0)
    def pad_ex(e):
        return pad1(e.astype(jnp.float32), -1.0) if e is not None else jnp.full((n_pad,), -1.0)

    ex = jnp.stack([pad_ex(exclude0), pad_ex(exclude1), pad_ex(exclude2)], axis=0)
    out = _run(tri_packed, o_soa, d_soa, lim, ex, int(tri_packed.shape[0]),
               any_hit, interpret, block)
    t = out[0, :n]
    tri_id = out[1, :n].astype(jnp.int32)
    if any_hit:
        return tri_id >= 0
    return Hit(
        t=jnp.where(tri_id >= 0, t, RAY_TMAX),
        tri_id=tri_id,
        bary=jnp.stack([out[2, :n], out[3, :n]], -1),
        valid=tri_id >= 0,
    )


def pack_tris(v0, e1, e2):
    """[T,3]x3 -> [Tpad,12] block for the kernel.

    T > TRI_CHUNK is padded to a chunk multiple with degenerate triangles
    (e1 = e2 = 0 -> det == 0 -> never hit)."""
    T = v0.shape[0]
    packed = jnp.concatenate([v0, e1, e2, jnp.zeros((T, 3), jnp.float32)], axis=1)
    if T > TRI_CHUNK and T % TRI_CHUNK != 0:
        packed = jnp.pad(packed, ((0, TRI_CHUNK - T % TRI_CHUNK), (0, 0)))
    return packed
