"""Pallas bounce MEGAKERNEL tier: whole paths inside one kernel.

The wavefront integrator (integrators/common.py) is measured HBM-BOUND at
~2 flops/byte (bench.py cost_analysis): every bounce round-trips hundreds of
[N]-arrays through HBM between fused XLA kernels, and TPU needs ~24
flops/byte to reach the compute roofline. This tier is the reference's own
megakernel architecture (crates/akari_integrator/src/pt.rs:1075-1103 — one
GPU thread per pixel runs the whole path loop) rebuilt for TPU: one Pallas
program carries a 1024-lane pixel block through camera generation, ALL
bounces, NEE and film accumulation with every piece of path state resident
in VMEM/registers — the only HBM traffic is the triangle/attribute tables
(read once into VMEM per block) and the final film block.

v1 SCOPE (the round-4 plan in ARCHITECTURE.md widens shading): scenes whose
shading the kernel can evaluate without dynamic gathers —
  - brute-force-tier geometry (attr table VMEM-resident, <= 512 tris),
  - diffuse-only shading: force_diffuse mode (pt.rs:268-280 parity) or
    every kind statically a constant-reflectance Lambert,
  - constant emission (scene.arrays.const_emission present), no alpha,
  - independent/hash sampler, box/gaussian filter.
Everything else falls back to the wavefront integrator automatically.

Design notes (why it looks like this):
  - COMPONENT-WISE math throughout ([B]-shaped per-component arrays): a
    [B, 3] vector op inside Mosaic tiles its minor axis to 128 lanes and
    wastes 125 of them; the [N, 3] helpers from core/ are deliberately NOT
    reused.
  - Per-lane table fetches are one-hot contractions (iota == idx masks +
    jnp.dot for the [B, 41] attribute row) — the MXU replaces the gather
    unit, exactly like scene.surface_interaction's small-scene path.
  - RNG is the stateless counter-based stream of samplers.HashSampler with
    the SAME key derivation and draw order as the wavefront path under
    AKR_RNG=hash (camera 2; per bounce: light 3, bsdf 3, rr 1) — so images
    A/B against render_pt statistically (same estimator, different float
    association; the shading frame uses the ONB of ns rather than the dpdu
    tangent frame, which changes no distribution for the isotropic diffuse
    lobe).
  - The bounce loop is a lax.while_loop INSIDE the kernel with all-dead
    early exit; the spp loop is a fori_loop around it; the grid walks pixel
    blocks. Film is aligned (lane = pixel): out block [5, B] carries
    RGB + filter-weight sums + an FINITE-guarded accumulator, no scatters.
"""
from __future__ import annotations

import functools
import os as _os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_RAY_TMAX = 1e20  # core.math.RAY_TMAX as a python float (jnp module
# constants become captured tracers inside a pallas kernel)

BLOCK_MK = int(_os.environ.get("AKR_MK_BLOCK", "1024"))
_HI = jax.lax.Precision.HIGHEST

# offset_ray_origin constants (core/math.py:70-87)
_ORIGIN = 1.0 / 32.0
_FLOAT_SCALE = 1.0 / 65536.0
_INT_SCALE = 256.0
_INV_PI = float(1.0 / 3.14159265358979323846)


# ---------------------------------------------------------------- helpers
def _u32(x):
    return jnp.uint32(x)


def _hash_u64(hi, lo):
    """samplers._hash_u64 (splitmix-ish 2x32 mix)."""
    x = lo ^ (hi * _u32(0x9E3779B9))
    x ^= x >> 16
    x *= _u32(0x85EBCA6B)
    x ^= x >> 13
    x *= _u32(0xC2B2AE35)
    x ^= x >> 16
    return x


def _draw(key, ctr):
    """samplers.HashSampler.next_1d: one uniform from (key, counter)."""
    x = key ^ (ctr * _u32(0x9E3779B9))
    x ^= x >> 16
    x *= _u32(0x21F0AAAD)
    x ^= x >> 15
    x *= _u32(0x735A2D97)
    x ^= x >> 15
    # Mosaic has no uint32->f32 cast; (x >> 8) < 2^24 so the int32 detour
    # is value-exact (measured TPU failure: "Unsupported cast: uint32 ->
    # float32", 2026-08-18)
    u = ((x >> 8).astype(jnp.int32).astype(jnp.float32)
         * jnp.float32(1.0 / (1 << 24)))
    return ctr + _u32(1), u


def _dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _cross3(ax, ay, az, bx, by, bz):
    return ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx


def _normalize3(x, y, z):
    inv = jax.lax.rsqrt(jnp.maximum(x * x + y * y + z * z, 1e-30))
    return x * inv, y * inv, z * inv


def _onb(nx, ny, nz):
    """orthonormal_basis (core/math.py:91-104), component-wise."""
    sign = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + nz)
    b = nx * ny * a
    tx = 1.0 + sign * nx * nx * a
    ty = sign * b
    tz = -sign * nx
    bx = b
    by = sign + ny * ny * a
    bz = -ny
    return (tx, ty, tz), (bx, by, bz)


def _offset_ray_origin(px, py, pz, nx, ny, nz):
    """core/math.py offset_ray_origin, component-wise."""

    def one(p, n):
        of_i = (_INT_SCALE * n).astype(jnp.int32)
        ip = jax.lax.bitcast_convert_type(p, jnp.int32)
        ip_off = ip + jnp.where(p < 0.0, -of_i, of_i)
        p_i = jax.lax.bitcast_convert_type(ip_off, jnp.float32)
        return jnp.where(jnp.abs(p) < _ORIGIN, p + _FLOAT_SCALE * n, p_i)

    return one(px, nx), one(py, ny), one(pz, nz)


def _onehot(idx, n):
    """[B] int32 -> [B, n] f32 one-hot (iota compare, no gathers)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (idx.shape[0], n), 1)
    return (lane == idx[:, None]).astype(jnp.float32)


def _gather_row(tab_ref, idx, n_rows):
    """One-hot contraction: tab [R, C] x idx [B] -> [B, C] (f32 MXU)."""
    oh = _onehot(idx, n_rows)
    return jax.lax.dot_general(
        oh, tab_ref[...], (((1,), (0,)), ((), ())), precision=_HI
    )


def _gather1(row_ref, idx, n):
    """row [1, R] x idx [B] -> [B] via masked sum (VPU, no matmul)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (idx.shape[0], n), 1)
    return jnp.sum(
        jnp.where(lane == idx[:, None], row_ref[0, :][None, :], 0.0), axis=1
    )


# ------------------------------------------------- shading table (v1.5)
# Per-material constants for the REDUCED fused-principled closure
# (svm/principled_fused.py with static_zero >= {transmission, coat}):
# diffuse + metal + specular-layer lobes. Pure-diffuse kinds are the
# degenerate rows metallic = 0, spec_col = 0.
NC_ALBEDO = 16  # knots of the precompute table's cos axis (read_3d is
# piecewise-linear along cos with exactly these 16 knots, so a per-material
# cos-LUT baked at the knots reproduces ggx_dielectric_albedo exactly)
_MT_REFL = 0      # 0:3   base_color / pi
_MT_ALPHA = 3     # GGX alpha = max(roughness^2, MIN_ALPHA)
_MT_METAL = 4     # metallic lobe weight
_MT_SPEC_ETA = 5  # specular layer ior (spec_eta)
_MT_SPEC_COL = 6  # 6:9   specular_tint * specular_weight (f0)
_MT_N = 9         # 9:12  conductor fresnel n (artistic from base_color)
_MT_K = 12        # 12:15 conductor fresnel k
_MT_LUT = 16      # 16:+NC  spec-layer GGX albedo LUT over cos in [0,1]
MAT_COLS = _MT_LUT + NC_ALBEDO


def _fr_dielectric1(ci, eta):
    """svm/microfacet.py::fr_dielectric, component-wise [B] scalars."""
    ci = jnp.clip(ci, -1.0, 1.0)
    eta = jnp.where(ci > 0.0, eta, 1.0 / eta)
    ci = jnp.abs(ci)
    sin2_i = 1.0 - ci * ci
    sin2_t = sin2_i / jnp.maximum(eta * eta, 1e-12)
    tir = sin2_t >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_t))
    r_parl = (eta * ci - cos_t) / jnp.maximum(eta * ci + cos_t, 1e-12)
    r_perp = (ci - eta * cos_t) / jnp.maximum(ci + eta * cos_t, 1e-12)
    fr = 0.5 * (r_parl * r_parl + r_perp * r_perp)
    return jnp.where(tir, 1.0, jnp.clip(fr, 0.0, 1.0))


def _fr_complex1(ci, n, k):
    """svm/microfacet.py::fr_complex for ONE channel ([B] n, k): conductor
    Fresnel via real-pair complex arithmetic, identical guards."""
    ci = jnp.clip(ci, 0.0, 0.999)
    sin2 = 1.0 - ci * ci
    e2r = n * n - k * k  # eta^2
    e2i = 2.0 * n * k
    den = jnp.maximum(e2r * e2r + e2i * e2i, 1e-30)
    s2tr = sin2 * e2r / den  # sin2_t = sin2 / eta^2
    s2ti = -sin2 * e2i / den
    ar, ai = 1.0 - s2tr, -s2ti  # cos_t = sqrt(1 - sin2_t)
    r = jnp.sqrt(jnp.maximum(ar * ar + ai * ai, 0.0))
    ctr = jnp.sqrt(jnp.maximum((r + ar) * 0.5, 0.0))
    cti = jnp.sign(ai) * jnp.sqrt(jnp.maximum((r - ar) * 0.5, 0.0))
    # r_parl = (eta ci - cos_t) / (eta ci + cos_t)
    ecr, eci = n * ci, k * ci
    nr, ni = ecr - ctr, eci - cti
    dr, di = ecr + ctr, eci + cti
    rp2 = (nr * nr + ni * ni) / jnp.maximum(dr * dr + di * di, 1e-30)
    # r_perp = (ci - eta cos_t) / (ci + eta cos_t)
    ect_r = n * ctr - k * cti
    ect_i = n * cti + k * ctr
    nr, ni = ci - ect_r, -ect_i
    dr, di = ci + ect_r, ect_i
    rs2 = (nr * nr + ni * ni) / jnp.maximum(dr * dr + di * di, 1e-30)
    return 0.5 * (rp2 + rs2)


def _ggx_d1(a, whz):
    """Isotropic TrowbridgeReitz.d in local coords (cos_phi^2+sin_phi^2=1
    collapses the anisotropic term to tan2/a^2)."""
    cos2 = whz * whz
    cos4 = cos2 * cos2
    sin2 = jnp.maximum(1.0 - cos2, 0.0)
    zero_c = cos2 <= 0.0
    tan2 = sin2 / jnp.where(zero_c, 1.0, cos2)
    e = tan2 / (a * a)
    inv_d = np.float32(np.pi) * a * a * cos4 * (1.0 + e) ** 2
    bad = zero_c | (inv_d == 0.0) | ~jnp.isfinite(inv_d)
    return jnp.where(bad, 0.0, 1.0 / jnp.where(bad, 1.0, inv_d))


def _ggx_lambda1(a, wz):
    """Isotropic TrowbridgeReitz.lambda_ (0 at grazing like the ref)."""
    cos2 = wz * wz
    sin2 = jnp.maximum(1.0 - cos2, 0.0)
    zero_c = cos2 <= 0.0
    tan2 = sin2 / jnp.where(zero_c, 1.0, cos2)
    lam = (-1.0 + jnp.sqrt(1.0 + a * a * tan2)) * 0.5
    return jnp.where(zero_c, 0.0, lam)


def _ggx_refl_base1(a, ox, oy, oz, ix, iy, iz):
    """principled_fused._ggx_refl_base component-wise: (B, pdf, fcos).
    B = GGX reflection without color/Fresnel (includes |cos_i|), pdf =
    VNDF pdf / 4|wo.wh|, fcos = wi . face_forward(wh, +z)."""
    whx, why, whz = ox + ix, oy + iy, oz + iz
    dwho = _dot3(whx, why, whz, ox, oy, oz)
    dwhi = _dot3(ix, iy, iz, whx, why, whz)
    degen = (
        (dwho * dwhi < 0.0)
        | ((whx == 0.0) & (why == 0.0) & (whz == 0.0))
        | (iz == 0.0)
        | (oz == 0.0)
        | (oz * iz <= 0.0)  # ~same_hemisphere
    )
    whx, why, whz = _normalize3(whx, why, whz)
    sgn = jnp.where(whz < 0.0, -1.0, 1.0)
    fcos = _dot3(ix, iy, iz, whx, why, whz) * sgn
    d = _ggx_d1(a, whz)
    g = 1.0 / (1.0 + _ggx_lambda1(a, oz) + _ggx_lambda1(a, iz))
    denom = iz * oz
    B = jnp.abs(0.25 * d * g / jnp.where(denom == 0.0, 1.0, denom)) * jnp.abs(iz)
    dwo_wh = _dot3(ox, oy, oz, whx, why, whz)
    g1o = 1.0 / (1.0 + _ggx_lambda1(a, oz))
    pdf_wh = d * g1o * jnp.abs(dwo_wh) / jnp.maximum(jnp.abs(oz), 1e-12)
    pdf = pdf_wh / jnp.maximum(4.0 * jnp.abs(dwo_wh), 1e-12)
    B = jnp.where(degen, 0.0, B)
    pdf = jnp.where(degen, 0.0, pdf)
    return B, pdf, fcos


def _ggx_sample_wh1(a, ox, oy, oz, u0, u1):
    """TrowbridgeReitz._sample_wh_vndf (Heitz 2018), isotropic, local."""
    hx, hy, hz = _normalize3(a * ox, a * oy, oz)
    neg = hz < 0.0
    hx = jnp.where(neg, -hx, hx)
    hy = jnp.where(neg, -hy, hy)
    hz = jnp.where(neg, -hz, hz)
    # t1 = normalize(cross(+z, wh)) | x-axis at the pole
    big = hz >= 0.99999
    inv = jax.lax.rsqrt(jnp.maximum(hx * hx + hy * hy, 1e-30))
    t1x = jnp.where(big, 1.0, -hy * inv)
    t1y = jnp.where(big, 0.0, hx * inv)
    t1z = jnp.zeros_like(hz)
    t2x, t2y, t2z = _cross3(hx, hy, hz, t1x, t1y, t1z)
    t2x, t2y, t2z = _normalize3(t2x, t2y, t2z)
    r = jnp.sqrt(jnp.maximum(u0, 0.0))
    phi = u1 * np.float32(2.0 * np.pi)
    px = r * jnp.cos(phi)
    py0 = r * jnp.sin(phi)
    h = jnp.sqrt(jnp.maximum(0.0, 1.0 - px * px))
    lerp_t = (1.0 + hz) * 0.5
    py = h + (py0 - h) * lerp_t
    pz = jnp.sqrt(jnp.maximum(0.0, 1.0 - px * px - py * py))
    nx = px * t1x + py * t2x + pz * hx
    ny = px * t1y + py * t2y + pz * hy
    nz = px * t1z + py * t2z + pz * hz
    return _normalize3(a * nx, a * ny, jnp.maximum(nz, 1e-6))


def _lut1(lut, cos):
    """Per-lane linear interp of the [B, NC_ALBEDO] spec-albedo LUT slice at
    |cos| — reproduces ggx_dielectric_albedo's cos interpolation (the
    roughness/eta axes are baked into the per-material values)."""
    c = jnp.abs(jnp.clip(cos, -0.999, 0.999)) * np.float32(NC_ALBEDO - 1)
    i0 = jnp.clip(jnp.floor(c).astype(jnp.int32), 0, NC_ALBEDO - 2)
    t = c - i0.astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, lut.shape, 1)
    v0 = jnp.sum(jnp.where(lane == i0[:, None], lut, 0.0), axis=1)
    v1 = jnp.sum(jnp.where(lane == (i0 + 1)[:, None], lut, 0.0), axis=1)
    return v0 + (v1 - v0) * t


# ---------------------------------------------------------------- kernel
MT_CHUNK = 16  # triangle rows per in-kernel sweep step (see _mt_sweep)


def _mt_sweep(attr_ref, T, ox, oy, oz, dx, dy, dz, tmin, tmax, ex0, ex1,
              any_hit):
    """Moller-Trumbore over the VMEM tri table in MT_CHUNK-row steps.

    Returns (t, tri_id, b0, b1) closest (first-slot ties) or occluded bool.
    Same formulas/epsilons as accel/trace.py::_chunk_hits.

    The triangle axis is a PYTHON loop over [MT_CHUNK, B] tiles, not one
    [T, B] expression: Mosaic fully unrolls elementwise vector ops over
    (8, 128) hardware tiles, so a [512, 1024] intermediate costs 512 vregs
    PER OP and the ~20-op sweep alone blew the kernel up to a 35+ minute
    compile (round-3/4 measurements). Small static tiles keep each op at a
    few vreg-rows. NOT a lax.fori_loop: dynamic slices inside a fori
    nested under the bounce while_loop sent the remote TPU compiler into a
    pathological state (round-4 probe: a trivial nested-loop kernel
    compiled >10 min; the full kernel crashed the compile helper with
    HTTP 500), while the same math as static slices compiles normally.
    render_pt_megakernel pads the table to a MT_CHUNK multiple with
    degenerate rows (e1 = e2 = 0 -> det == 0 -> never hit)."""
    n_chunks = (T + MT_CHUNK - 1) // MT_CHUNK
    B = ox.shape[0]
    wdx, wdy, wdz = dx[None, :], dy[None, :], dz[None, :]
    wox, woy, woz = ox[None, :], oy[None, :], oz[None, :]

    def chunk_hits(c):
        """[MT_CHUNK, B] hit mask (+ t, u, v for closest-hit). c static."""
        rows0 = c * MT_CHUNK
        blk = attr_ref[rows0:rows0 + MT_CHUNK, :]
        a_x, a_y, a_z = blk[:, 0:1], blk[:, 1:2], blk[:, 2:3]
        e1x, e1y, e1z = blk[:, 3:4], blk[:, 4:5], blk[:, 5:6]
        e2x, e2y, e2z = blk[:, 6:7], blk[:, 7:8], blk[:, 8:9]
        px = wdy * e2z - wdz * e2y
        py = wdz * e2x - wdx * e2z
        pz = wdx * e2y - wdy * e2x
        det = e1x * px + e1y * py + e1z * pz
        inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
        tx = wox - a_x
        ty = woy - a_y
        tz = woz - a_z
        u = (tx * px + ty * py + tz * pz) * inv_det
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        v = (qx * wdx + qy * wdy + qz * wdz) * inv_det
        t = (qx * e2x + qy * e2y + qz * e2z) * inv_det
        rows = rows0 + jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
        hit = (
            (jnp.abs(det) > 1e-12)
            & (u >= 0.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (t > tmin[None, :])
            & (t < tmax[None, :])
            & (rows != ex0[None, :])
            & (rows != ex1[None, :])
        )
        return hit, t, u, v, rows

    if any_hit:
        occ = jnp.zeros((B,), bool)
        for c in range(n_chunks):
            hit, _, _, _, _ = chunk_hits(c)
            occ = occ | jnp.any(hit, axis=0)
        return occ

    carry = (
        jnp.full((B,), _RAY_TMAX, jnp.float32),
        jnp.full((B,), 1 << 30, jnp.int32),
        jnp.zeros((B,), jnp.float32),
        jnp.zeros((B,), jnp.float32),
    )
    for c in range(n_chunks):
        best_t, best_row, best_u, best_v = carry
        hit, t, u, v, rows = chunk_hits(c)
        t_m = jnp.where(hit, t, jnp.float32(_RAY_TMAX))
        t_min = jnp.min(t_m, axis=0)
        is_min = t_m == t_min[None, :]
        s_min = jnp.min(jnp.where(is_min, rows, jnp.int32(1 << 30)), axis=0)
        sel = is_min & (rows == s_min[None, :])
        b0 = jnp.sum(jnp.where(sel, u, 0.0), axis=0)
        b1 = jnp.sum(jnp.where(sel, v, 0.0), axis=0)
        # strict <: earlier chunks hold smaller row ids, so ties keep the
        # first slot exactly like the single-sweep formulation
        better = t_min < best_t
        carry = (
            jnp.where(better, t_min, best_t),
            jnp.where(better, s_min, best_row),
            jnp.where(better, b0, best_u),
            jnp.where(better, b1, best_v),
        )
    best_t, best_row, b0, b1 = carry
    got = best_t < jnp.float32(_RAY_TMAX)
    tri = jnp.where(got, best_row, -1)
    return best_t, tri, b0, b1, got


def _make_kernel(scene, settings, spp_chunk, seed, has_spec, has_metal,
                 filter_kind, filter_radius, npix):
    """Build the kernel body closed over all static scene config.

    has_spec / has_metal: static (python) flags — False compiles the
    specular-layer / metal-lobe math out entirely (cbox: has_spec False
    because every specular_weight is 0; a pure-diffuse scene sets both)."""
    cam = scene.camera
    r2c = np.asarray(cam.r2c, np.float64)
    c2w = np.asarray(cam.c2w, np.float64)
    width = cam.width
    # padded row count (MT_CHUNK multiple; render_pt_megakernel pads the
    # table with zero rows: e1 = e2 = 0 -> det == 0 -> never hit)
    T = -(-int(scene.arrays.attr.shape[0]) // MT_CHUNK) * MT_CHUNK
    M = int(scene.arrays.const_emission.shape[0])
    L = int(scene.arrays.lights.sel_prob.shape[0])
    S = int(scene.arrays.lights.tri_prob.shape[0])
    max_depth = settings.max_depth
    rr_depth = settings.rr_depth
    clamp_ind = settings.clamp_indirect
    # per-kind constant diffuse reflectance [K0] (force_diffuse: all 0.8)
    # refl_const: None -> use per-material base_color via param fetch is NOT
    # in v1; instead refl_const is [M, 3] per-MATERIAL constant reflectance.
    cam_o = c2w[:3, 3]  # world camera origin (pinhole)

    def kernel(s0_ref, attr_ref, ce_ref, lsel_ref, loff_ref, ltab_ref,
               mat_ref, out_ref):
        i = pl.program_id(0)
        B = BLOCK_MK
        pix = i * B + jax.lax.broadcasted_iota(jnp.int32, (B,), 0)
        pix_ok = pix < npix
        pixf_x = (pix % width).astype(jnp.float32)
        pixf_y = (pix // width).astype(jnp.float32)
        s0 = s0_ref[0]

        def one_sample(s, acc):
            ar, ag, ab, aw = acc
            sample_idx = (s0 + s).astype(jnp.uint32)
            # scrambled seed (0 unchanged): raw XOR only permutes sample sets
            key = _hash_u64(
                sample_idx ^ _u32((seed * 0x9E3779B9) & 0xFFFFFFFF),
                pix.astype(jnp.uint32))
            ctr = jnp.zeros((B,), jnp.uint32)

            # camera sample: 2 dims (filter jitter)
            ctr, u0 = _draw(key, ctr)
            ctr, u1 = _draw(key, ctr)
            if filter_kind == "gaussian":
                sigma = filter_radius / 3.0
                r = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u0, 1e-10)))
                th = 2.0 * np.pi * u1
                offx = jnp.clip(r * jnp.cos(th) * sigma, -filter_radius,
                                filter_radius)
                offy = jnp.clip(r * jnp.sin(th) * sigma, -filter_radius,
                                filter_radius)
            else:  # box
                offx = (u0 - 0.5) * filter_radius
                offy = (u1 - 0.5) * filter_radius
            fx = pixf_x + 0.5 + offx
            fy = pixf_y + 0.5 + offy
            # raster -> camera (z = 0 raster plane), then normalize
            cx = r2c[0, 0] * fx + r2c[0, 1] * fy + r2c[0, 3]
            cy = r2c[1, 0] * fx + r2c[1, 1] * fy + r2c[1, 3]
            cz = r2c[2, 0] * fx + r2c[2, 1] * fy + r2c[2, 3]
            cx, cy, cz = _normalize3(cx, cy, cz)
            dx = c2w[0, 0] * cx + c2w[0, 1] * cy + c2w[0, 2] * cz
            dy = c2w[1, 0] * cx + c2w[1, 1] * cy + c2w[1, 2] * cz
            dz = c2w[2, 0] * cx + c2w[2, 1] * cy + c2w[2, 2] * cz
            ox = jnp.full((B,), np.float32(cam_o[0]))
            oy = jnp.full((B,), np.float32(cam_o[1]))
            oz = jnp.full((B,), np.float32(cam_o[2]))

            def fetch_si(tri, b0, b1):
                """Attribute row -> (p, ng, ns, area, mat, light_id,
                prim_pdf); one one-hot MXU contraction."""
                rows = _gather_row(attr_ref, jnp.maximum(tri, 0), T)
                w0 = 1.0 - b0 - b1
                p_x = rows[:, 0] + rows[:, 3] * b0 + rows[:, 6] * b1
                p_y = rows[:, 1] + rows[:, 4] * b0 + rows[:, 7] * b1
                p_z = rows[:, 2] + rows[:, 5] * b0 + rows[:, 8] * b1
                ngx, ngy, ngz = rows[:, 9], rows[:, 10], rows[:, 11]
                area = rows[:, 12]
                nsx = w0 * rows[:, 13] + b0 * rows[:, 16] + b1 * rows[:, 19]
                nsy = w0 * rows[:, 14] + b0 * rows[:, 17] + b1 * rows[:, 20]
                nsz = w0 * rows[:, 15] + b0 * rows[:, 18] + b1 * rows[:, 21]
                nsx, nsy, nsz = _normalize3(nsx, nsy, nsz)
                mat = rows[:, 38].astype(jnp.int32)
                light_id = rows[:, 39].astype(jnp.int32)
                prim_pdf = rows[:, 40]
                return (p_x, p_y, p_z, ngx, ngy, ngz, nsx, nsy, nsz, area,
                        mat, light_id, prim_pdf)

            def emission_of(mat):
                e = _gather_row(ce_ref, mat, M)  # [B, 3]
                return e[:, 0], e[:, 1], e[:, 2]

            def pdf_direct_of(light_id, prim_pdf, area, ngx, ngy, ngz,
                              plx, ply, plz, fx_, fy_, fz_):
                lane = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
                sel = jnp.sum(
                    jnp.where(lane == jnp.maximum(light_id, 0)[:, None],
                              lsel_ref[2, :][None, :], 0.0), axis=1)
                choice = jnp.where(light_id >= 0, sel, 0.0)
                wix = plx - fx_
                wiy = ply - fy_
                wiz = plz - fz_
                d2 = wix * wix + wiy * wiy + wiz * wiz
                inv = jax.lax.rsqrt(jnp.maximum(d2, 1e-30))
                c = jnp.abs(_dot3(ngx, ngy, ngz, wix * inv, wiy * inv,
                                  wiz * inv))
                return (prim_pdf / jnp.maximum(area, 1e-20) * d2
                        / jnp.maximum(c, 1e-6)) * choice

            init = (
                jnp.int32(0),  # depth
                ox, oy, oz, dx, dy, dz,
                jnp.full((B,), -1, jnp.int32),  # exclude
                jnp.zeros((B,)), jnp.zeros((B,)), jnp.zeros((B,)),  # rad
                jnp.ones((B,)), jnp.ones((B,)), jnp.ones((B,)),  # beta
                pix_ok.astype(jnp.int32),  # active (i32: Mosaic can't
                # yield vector<i1> loop carries — "failed to legalize
                # scf.yield", TPU 2026-08-18)
                jnp.zeros((B,)),  # prev_bsdf_pdf
                jnp.zeros((B,)), jnp.zeros((B,)), jnp.zeros((B,)),  # replay
                ctr,
            )

            def bounce_cond(c):
                return (c[0] < max_depth) & jnp.any(c[14] > 0)  # active

            def do_emission(depth, rad, beta, tri, got, active, ngx, ngy,
                            ngz, dxx, dyy, dzz, mat, light_id, prim_pdf,
                            area, p_x, p_y, p_z, rox, roy, roz, prev_pdf):
                rr, rg, rb = rad
                br, bg, bb = beta
                front = _dot3(ngx, ngy, ngz, dxx, dyy, dzz) < 0.0
                ok = active & got & (light_id >= 0) & front
                ler, leg, leb = emission_of(mat)
                lpdf = pdf_direct_of(light_id, prim_pdf, area, ngx, ngy, ngz,
                                     p_x, p_y, p_z, rox, roy, roz)
                a = prev_pdf
                w = jnp.where(depth == 0, 1.0,
                              a / jnp.maximum(a + lpdf, 1e-30))
                rr = rr + jnp.where(ok, br * ler * w, 0.0)
                rg = rg + jnp.where(ok, bg * leg * w, 0.0)
                rb = rb + jnp.where(ok, bb * leb * w, 0.0)
                return rr, rg, rb

            def bounce_body(c):
                (depth, rox, roy, roz, rdx, rdy, rdz, excl,
                 rr, rg, rb, br, bg, bb, active, prev_pdf,
                 rpr, rpg, rpb, ctr) = c
                active = active > 0  # decode the i32 carry
                tmax = jnp.where(active, jnp.float32(_RAY_TMAX), -1.0)
                t, tri, b0, b1, got = _mt_sweep(
                    attr_ref, T, rox, roy, roz, rdx, rdy, rdz,
                    jnp.zeros((B,)), tmax, excl, jnp.full((B,), -1, jnp.int32),
                    any_hit=False,
                )
                (p_x, p_y, p_z, ngx, ngy, ngz, nsx, nsy, nsz, area, mat,
                 light_id, prim_pdf) = fetch_si(tri, b0, b1)
                lane_hit = active & got
                rr, rg, rb = do_emission(
                    depth, (rr, rg, rb), (br, bg, bb), tri, got, active,
                    ngx, ngy, ngz, rdx, rdy, rdz, mat, light_id, prim_pdf,
                    area, p_x, p_y, p_z, rox, roy, roz, prev_pdf,
                )
                first = depth == 0
                rpr = jnp.where(first, rr, rpr)
                rpg = jnp.where(first, rg, rpg)
                rpb = jnp.where(first, rb, rpb)
                active = lane_hit
                wox, woy, woz = -rdx, -rdy, -rdz

                # --- NEE (3 dims) ---
                ctr, ul0 = _draw(key, ctr)
                ctr, ul1 = _draw(key, ctr)
                ctr, ul2 = _draw(key, ctr)
                # light pick (alias over [L])
                scaled = ul0 * L
                li0 = jnp.clip(scaled.astype(jnp.int32), 0, L - 1)
                frac = scaled - li0.astype(jnp.float32)
                lane_l = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)

                def selrow(r, idx):
                    return jnp.sum(jnp.where(lane_l == idx[:, None],
                                             lsel_ref[r, :][None, :], 0.0),
                                   axis=1)

                p_own = selrow(0, li0)
                take = frac < p_own
                light = jnp.where(
                    take, li0, selrow(1, li0).astype(jnp.int32))
                u_rem = jnp.where(
                    take, frac / jnp.maximum(p_own, 1e-20),
                    (frac - p_own) / jnp.maximum(1.0 - p_own, 1e-20))
                choice_pdf = selrow(2, light)
                base = jnp.sum(jnp.where(lane_l == light[:, None],
                                         loff_ref[0, :][None, :], 0.0),
                               axis=1).astype(jnp.int32)
                cnt = jnp.sum(jnp.where(lane_l == light[:, None],
                                        loff_ref[1, :][None, :], 0.0),
                              axis=1).astype(jnp.int32)
                # triangle alias within [base, base+cnt)
                u_rem = jnp.clip(u_rem, 0.0, 1.0 - 1e-7)
                scaled2 = u_rem * cnt.astype(jnp.float32)
                i2 = jnp.clip(scaled2.astype(jnp.int32), 0, cnt - 1)
                frac2 = scaled2 - i2.astype(jnp.float32)
                gi = base + i2
                lane_s = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)

                def stab(r, idx):
                    return jnp.sum(jnp.where(lane_s == idx[:, None],
                                             ltab_ref[r, :][None, :], 0.0),
                                   axis=1)

                p2 = stab(0, gi)
                take2 = frac2 < p2
                local = jnp.where(take2, i2, stab(1, gi).astype(jnp.int32))
                lprim_pdf = stab(2, base + local)
                ltri = stab(3, base + local).astype(jnp.int32)
                # uniform triangle bary: low-distortion warp
                # (core/sampling.py::uniform_sample_triangle, sampling.rs:32-44)
                lt = ul1 < ul2
                lb0 = jnp.where(lt, ul1 * 0.5, ul1 - ul2 * 0.5)
                lb1 = jnp.where(lt, ul2 - ul1 * 0.5, ul2 * 0.5)
                (lpx, lpy, lpz, lngx, lngy, lngz, _, _, _, larea, lmat,
                 _, _) = fetch_si(ltri, lb0, lb1)
                # finish_light_sample (lights.py:141-167)
                wix = lpx - p_x
                wiy = lpy - p_y
                wiz = lpz - p_z
                d2 = wix * wix + wiy * wiy + wiz * wiz
                dist = jnp.sqrt(jnp.maximum(d2, 1e-30))
                wix, wiy, wiz = wix / dist, wiy / dist, wiz / dist
                front_l = _dot3(wix, wiy, wiz, lngx, lngy, lngz) < 0.0
                ler, leg, leb = emission_of(lmat)
                lir = jnp.where(front_l, ler, 0.0)
                lig = jnp.where(front_l, leg, 0.0)
                lib = jnp.where(front_l, leb, 0.0)
                cos_l = jnp.abs(_dot3(lngx, lngy, lngz, wix, wiy, wiz))
                ls_pdf = (lprim_pdf / jnp.maximum(larea, 1e-20) * d2
                          / jnp.maximum(cos_l, 1e-20)) * choice_pdf
                light_valid = (active & jnp.isfinite(ls_pdf) & (d2 > 0.0))

                # --- shade: reduced fused-principled closure (3 dims) ---
                # (principled_fused.py with static_zero >= {transmission,
                # coat}: diffuse + metal + specular layer; diffuse-only
                # rows degenerate to Lambert exactly)
                ctr, ub0 = _draw(key, ctr)
                ctr, ub1 = _draw(key, ctr)
                ctr, ub2 = _draw(key, ctr)
                rrow = _gather_row(mat_ref, mat, M)  # [B, MAT_COLS]
                ref_r = rrow[:, _MT_REFL]
                ref_g = rrow[:, _MT_REFL + 1]
                ref_b = rrow[:, _MT_REFL + 2]
                alpha_g = rrow[:, _MT_ALPHA]
                met = rrow[:, _MT_METAL]
                # shading frame = ONB(ns)
                (tx, ty, tz), (bx, by, bz) = _onb(nsx, nsy, nsz)

                def to_local(vx, vy, vz):
                    return (_dot3(vx, vy, vz, tx, ty, tz),
                            _dot3(vx, vy, vz, bx, by, bz),
                            _dot3(vx, vy, vz, nsx, nsy, nsz))

                def leak_ok(vx, vy, vz, wx, wy, wz):
                    # SurfaceClosure._valid_wo_wi
                    sgn = lambda x: jnp.where(x > 0.0, 1.0, -1.0)
                    flip = sgn(_dot3(ngx, ngy, ngz, nsx, nsy, nsz))
                    a1 = sgn(flip * _dot3(vx, vy, vz, nsx, nsy, nsz)) * sgn(
                        _dot3(vx, vy, vz, ngx, ngy, ngz)) > 0.0
                    a2 = sgn(flip * _dot3(wx, wy, wz, nsx, nsy, nsz)) * sgn(
                        _dot3(wx, wy, wz, ngx, ngy, ngz)) > 0.0
                    return a1 & a2

                lwo = to_local(wox, woy, woz)
                if has_spec:
                    lut = rrow[:, _MT_LUT:_MT_LUT + NC_ALBEDO]
                    sc_r = rrow[:, _MT_SPEC_COL]
                    sc_g = rrow[:, _MT_SPEC_COL + 1]
                    sc_b = rrow[:, _MT_SPEC_COL + 2]
                    alb_o = _lut1(lut, lwo[2])

                def bsdf_eval(lix, liy, liz):
                    """FusedPrincipled.evaluate reduced: (f rgb, pdf);
                    f includes |cos_i|."""
                    B_r, pdf_r, fcos = _ggx_refl_base1(
                        alpha_g, lwo[0], lwo[1], lwo[2], lix, liy, liz)
                    same = lwo[2] * liz > 0.0
                    cos_i = jnp.abs(liz)
                    f_r = jnp.where(same, ref_r * cos_i, 0.0)
                    f_g = jnp.where(same, ref_g * cos_i, 0.0)
                    f_b = jnp.where(same, ref_b * cos_i, 0.0)
                    pdf = jnp.where(same, cos_i * np.float32(_INV_PI), 0.0)
                    if has_spec:
                        alb_i = _lut1(lut, liz)
                        eo_r, eo_g, eo_b = sc_r * alb_o, sc_g * alb_o, sc_b * alb_o
                        ei_r, ei_g, ei_b = sc_r * alb_i, sc_g * alb_i, sc_b * alb_i
                        p_s = (eo_r + eo_g + eo_b) * np.float32(1.0 / 3.0)
                        frd = _fr_dielectric1(fcos, rrow[:, _MT_SPEC_ETA])
                        f_r = (B_r * frd * sc_r
                               + f_r * jnp.minimum(1.0 - eo_r, 1.0 - ei_r))
                        f_g = (B_r * frd * sc_g
                               + f_g * jnp.minimum(1.0 - eo_g, 1.0 - ei_g))
                        f_b = (B_r * frd * sc_b
                               + f_b * jnp.minimum(1.0 - eo_b, 1.0 - ei_b))
                        pdf = pdf_r * p_s + pdf * (1.0 - p_s)
                    if has_metal:
                        afc = jnp.abs(fcos)
                        fm_r = B_r * _fr_complex1(afc, rrow[:, _MT_N],
                                                  rrow[:, _MT_K])
                        fm_g = B_r * _fr_complex1(afc, rrow[:, _MT_N + 1],
                                                  rrow[:, _MT_K + 1])
                        fm_b = B_r * _fr_complex1(afc, rrow[:, _MT_N + 2],
                                                  rrow[:, _MT_K + 2])
                        f_r = f_r + (fm_r - f_r) * met
                        f_g = f_g + (fm_g - f_g) * met
                        f_b = f_b + (fm_b - f_b) * met
                        pdf = pdf + (pdf_r - pdf) * met
                    return f_r, f_g, f_b, pdf

                # NEE eval (closure.evaluate at the light direction)
                lwi = to_local(wix, wiy, wiz)
                el_r, el_g, el_b, pdf_l = bsdf_eval(lwi[0], lwi[1], lwi[2])
                ok_nee = leak_ok(wox, woy, woz, wix, wiy, wiz)
                pdf_l = jnp.where(ok_nee, pdf_l, 0.0)
                fl_r = jnp.where(ok_nee, el_r, 0.0)
                fl_g = jnp.where(ok_nee, el_g, 0.0)
                fl_b = jnp.where(ok_nee, el_b, 0.0)
                w_nee = ls_pdf / jnp.maximum(ls_pdf + pdf_l, 1e-30)
                scale = w_nee / jnp.maximum(ls_pdf, 1e-20)
                dir_r = lir * fl_r * scale
                dir_g = lig * fl_g * scale
                dir_b = lib * fl_b * scale

                # sample_wi cascade (FusedPrincipled.sample_wi, coat and
                # transmission levels statically skipped)
                u_sel = ub0
                pick_metal = jnp.zeros_like(u_sel, bool)
                if has_metal:
                    pick_metal = u_sel < met
                    u_sel = jnp.clip(
                        jnp.where(
                            pick_metal,
                            u_sel / jnp.maximum(met, 1e-20),
                            (u_sel - met) / jnp.maximum(1.0 - met, 1e-20),
                        ), 0.0, 1.0)
                pick_spec = jnp.zeros_like(u_sel, bool)
                if has_spec:
                    p_s_o = (sc_r + sc_g + sc_b) * np.float32(1.0 / 3.0) * alb_o
                    pick_spec = u_sel < p_s_o
                use_refl = pick_metal | pick_spec
                whx, why, whz = _ggx_sample_wh1(
                    alpha_g, lwo[0], lwo[1], lwo[2], ub1, ub2)
                dwh = _dot3(lwo[0], lwo[1], lwo[2], whx, why, whz)
                rxx = -lwo[0] + 2.0 * dwh * whx
                rxy = -lwo[1] + 2.0 * dwh * why
                rxz = -lwo[2] + 2.0 * dwh * whz
                # cosine hemisphere (same u_sample stream as the GGX wh)
                rdisk = jnp.sqrt(jnp.maximum(ub1, 0.0))
                phi = ub2 * (2.0 * np.pi)
                sx = rdisk * jnp.cos(phi)
                sy = rdisk * jnp.sin(phi)
                sz = jnp.sqrt(jnp.maximum(0.0, 1.0 - sx * sx - sy * sy))
                flip_wi = jnp.where(lwo[2] * sz > 0.0, 1.0, -1.0)
                sx, sy, sz = sx * flip_wi, sy * flip_wi, sz * flip_wi
                lix = jnp.where(use_refl, rxx, sx)
                liy = jnp.where(use_refl, rxy, sy)
                liz = jnp.where(use_refl, rxz, sz)
                # logical form of where(use_refl, cond, True): Mosaic can't
                # lower the boolean select's i8->i1 vector truncation
                valid_s = (~use_refl) | (lwo[2] * rxz > 0.0)
                nwx = lix * tx + liy * bx + liz * nsx
                nwy = lix * ty + liy * by + liz * nsy
                nwz = lix * tz + liy * bz + liz * nsz
                es_r, es_g, es_b, pdf_s = bsdf_eval(lix, liy, liz)
                ok_s = (valid_s & leak_ok(wox, woy, woz, nwx, nwy, nwz)
                        & (pdf_s > 0.0))
                pdf_s = jnp.where(ok_s, pdf_s, 0.0)
                fs_r = jnp.where(ok_s, es_r, 0.0)
                fs_g = jnp.where(ok_s, es_g, 0.0)
                fs_b = jnp.where(ok_s, es_b, 0.0)

                # --- shadow ray ---
                srx, sry, srz = _offset_ray_origin(
                    p_x, p_y, p_z,
                    jnp.where(_dot3(ngx, ngy, ngz, wix, wiy, wiz)[...] < 0.0,
                              -ngx, ngx),
                    jnp.where(_dot3(ngx, ngy, ngz, wix, wiy, wiz) < 0.0,
                              -ngy, ngy),
                    jnp.where(_dot3(ngx, ngy, ngz, wix, wiy, wiz) < 0.0,
                              -ngz, ngz),
                )
                sh_tmax = jnp.where(light_valid, dist * (1.0 - 1e-3), -1.0)
                occ = _mt_sweep(attr_ref, T, srx, sry, srz, wix, wiy, wiz,
                                jnp.zeros((B,)), sh_tmax, tri, ltri,
                                any_hit=True)
                direct_ok = light_valid & ~occ
                rr = rr + jnp.where(direct_ok, br * dir_r, 0.0)
                rg = rg + jnp.where(direct_ok, bg * dir_g, 0.0)
                rb = rb + jnp.where(direct_ok, bb * dir_b, 0.0)

                # --- continue ---
                sample_ok = ok_s & (pdf_s > 0.0)
                active = active & sample_ok
                thr = jnp.where(active, 1.0 / jnp.maximum(pdf_s, 1e-20), 0.0)
                br = br * jnp.where(active, fs_r * thr, 1.0)
                bg = bg * jnp.where(active, fs_g * thr, 1.0)
                bb = bb * jnp.where(active, fs_b * thr, 1.0)

                # RR (1 dim)
                ctr, urr = _draw(key, ctr)
                bmax = jnp.maximum(br, jnp.maximum(bg, bb))
                cont = jnp.where(depth + 1 > rr_depth,
                                 jnp.clip(bmax, 0.0, 1.0) * 0.95, 1.0)
                active = active & (urr < cont)
                inv_c = 1.0 / jnp.maximum(cont, 1e-20)
                br, bg, bb = br * inv_c, bg * inv_c, bb * inv_c

                nox, noy, noz = _offset_ray_origin(
                    p_x, p_y, p_z,
                    jnp.where(_dot3(ngx, ngy, ngz, nwx, nwy, nwz) < 0.0,
                              -ngx, ngx),
                    jnp.where(_dot3(ngx, ngy, ngz, nwx, nwy, nwz) < 0.0,
                              -ngy, ngy),
                    jnp.where(_dot3(ngx, ngy, ngz, nwx, nwy, nwz) < 0.0,
                              -ngz, ngz),
                )
                return (depth + 1, nox, noy, noz, nwx, nwy, nwz,
                        tri, rr, rg, rb, br, bg, bb,
                        active.astype(jnp.int32), pdf_s,
                        rpr, rpg, rpb, ctr)

            st = jax.lax.while_loop(bounce_cond, bounce_body, init)
            (_, rox, roy, roz, rdx, rdy, rdz, excl, rr, rg, rb,
             br, bg, bb, active, prev_pdf, rpr, rpg, rpb, ctr) = st
            active = active > 0  # decode the i32 carry
            # final emission tap (trace_paths.final_emission)
            tmax = jnp.where(active, jnp.float32(_RAY_TMAX), -1.0)
            t, tri, b0, b1, got = _mt_sweep(
                attr_ref, T, rox, roy, roz, rdx, rdy, rdz, jnp.zeros((B,)),
                tmax, excl, jnp.full((B,), -1, jnp.int32), any_hit=False)
            (p_x, p_y, p_z, ngx, ngy, ngz, _, _, _, area, mat, light_id,
             prim_pdf) = fetch_si(tri, b0, b1)
            rr, rg, rb = do_emission(
                jnp.int32(max_depth), (rr, rg, rb), (br, bg, bb), tri, got,
                active, ngx, ngy, ngz, rdx, rdy, rdz, mat, light_id,
                prim_pdf, area, p_x, p_y, p_z, rox, roy, roz, prev_pdf)

            # clamp_indirect + remove_nan + accumulate (fw == 1 filters)
            def clamp(tot, base):
                if clamp_ind > 0.0:
                    v = base + jnp.minimum(tot - base, clamp_ind)
                else:
                    v = tot
                return jnp.where(jnp.isfinite(v), v, 0.0)

            ar = ar + jnp.where(pix_ok, clamp(rr, rpr), 0.0)
            ag = ag + jnp.where(pix_ok, clamp(rg, rpg), 0.0)
            ab = ab + jnp.where(pix_ok, clamp(rb, rpb), 0.0)
            aw = aw + jnp.where(pix_ok, 1.0, 0.0)
            return ar, ag, ab, aw

        z = jnp.zeros((BLOCK_MK,))
        ar, ag, ab, aw = jax.lax.fori_loop(
            0, spp_chunk, one_sample, (z, z, z, z))
        out_ref[0, :] = ar
        out_ref[1, :] = ag
        out_ref[2, :] = ab
        out_ref[3, :] = aw

    return kernel


# ---------------------------------------------------------------- driver
def megakernel_eligible(scene, settings, sampler_config, filt) -> bool:
    """Conservative static predicate for the v1 scope."""
    from ..core.filters import BoxFilter, GaussianFilter

    a = scene.arrays
    if a.bvh is not None or a.instanced is not None or a.unified is not None:
        return False
    if scene.num_tris == 0 or scene.num_tris > 512:
        return False
    if scene.has_alpha or a.const_emission is None:
        return False
    if a.lights.num_lights < 1:
        return False
    if not isinstance(filt, (BoxFilter, GaussianFilter)):
        return False
    t = (sampler_config or {}).get("type", "independent")
    if t not in ("independent",):
        return False
    if settings.indirect_only or not settings.use_nee:
        return False
    if not settings.force_diffuse and _bake_shading(scene) is None:
        return False
    return True


def _bake_shading(scene):
    """([M, MAT_COLS] table, has_spec, has_metal) if EVERY kind statically
    reduces to the diffuse+metal+specular closure — constant-input diffuse
    or constant-input principled with transmission and coat statically 0 —
    else None.

    Constancy is by construction (node whitelist: only constant sources);
    the VALUES come from the real compiled closure via dispatch_closure per
    material row, so srgb->linear, spectral uplift, f0/spec_eta derivation
    and the GGX albedo precompute table match the wavefront path
    bit-for-bit. The spec-layer albedo is baked as a per-material cos-LUT
    at the precompute table's own 16 knots (exact — read_3d is piecewise-
    linear in cos)."""
    from ..svm.eval import EvalContext, dispatch_closure
    from ..svm.principled_fused import FusedPrincipled
    from ..svm.surface import DiffuseBsdf

    CONST_OPS = {"float", "float3", "float4", "rgb", "uplift", "diffuse",
                 "principled", "output"}
    for kind in scene.kinds:
        if any(nd[0] not in CONST_OPS for nd in kind.nodes):
            return None
        if kind.nodes[kind.output][0] != "output":
            return None
    M = int(scene.arrays.const_emission.shape[0])
    tab = np.zeros((M, MAT_COLS), np.float32)
    tab[:, _MT_N:_MT_N + 3] = 1.0  # benign conductor ior for unused rows
    zeros3 = jnp.zeros((M, 3))
    frame = (zeros3.at[:, 0].set(1.0), zeros3.at[:, 1].set(1.0),
             zeros3.at[:, 2].set(1.0))
    eye = np.asarray(frame).transpose(1, 0, 2)  # [M, 3(axis), 3]
    for ki, kind in enumerate(scene.kinds):
        ctx = EvalContext(
            params=scene.arrays.param_mats[ki],  # one row per material
            uv=jnp.zeros((M, 2)), p=zeros3, ng=frame[2], frame=frame,
            textures=scene.atlas,
            const_ranges=(scene.kind_const_ranges[ki]
                          if scene.kind_const_ranges is not None else None),
        )
        closure = dispatch_closure(kind, ctx, mode="surface")
        # unwrap nested SurfaceClosures (outer world frame + normal_map);
        # every intermediate frame must be the identity or the single
        # leak check in the kernel is not equivalent
        inner = closure
        depth = 0
        while hasattr(inner, "inner"):
            if depth > 0:  # inner normal-map closure: frame must be identity
                fr = np.stack([np.asarray(inner.t), np.asarray(inner.b),
                               np.asarray(inner.n)], 1)
                if not np.allclose(fr, eye, atol=1e-6):
                    return None
            inner = inner.inner
            depth += 1
        mats_of_kind = np.unique(np.asarray(scene.arrays.tri_mat)[
            np.asarray(scene.arrays.shader_kind) == ki
        ])
        rows = np.asarray(mats_of_kind, np.int64)
        if isinstance(inner, DiffuseBsdf):
            vals = np.asarray(inner.reflectance, np.float32)  # [M,3] * 1/pi
            tab[rows, _MT_REFL:_MT_REFL + 3] = vals[rows]
            tab[rows, _MT_ALPHA] = 1.0
        elif isinstance(inner, FusedPrincipled):
            if not {"transmission", "coat"} <= inner.static_zero:
                return None
            if not inner.dist_r.sample_visible:
                return None
            al = np.asarray(inner.dist_r.alpha, np.float32)
            if al.ndim == 2 and not np.allclose(al[:, 0], al[:, 1]):
                return None  # anisotropic: not in kernel scope
            tab[rows, _MT_REFL:_MT_REFL + 3] = (
                np.asarray(inner.color, np.float32) * np.float32(_INV_PI)
            )[rows]
            tab[rows, _MT_ALPHA] = (al[:, 0] if al.ndim == 2 else al)[rows]
            tab[rows, _MT_METAL] = np.asarray(inner.metallic, np.float32)[rows]
            tab[rows, _MT_SPEC_ETA] = np.asarray(
                inner.spec_eta, np.float32)[rows]
            spec_col = np.asarray(
                inner.specular_tint
                * jnp.asarray(inner.specular_weight)[..., None], np.float32)
            tab[rows, _MT_SPEC_COL:_MT_SPEC_COL + 3] = spec_col[rows]
            tab[rows, _MT_N:_MT_N + 3] = np.asarray(inner.n_m, np.float32)[rows]
            tab[rows, _MT_K:_MT_K + 3] = np.asarray(inner.k_m, np.float32)[rows]
            if np.any(spec_col[rows] != 0.0):
                for c_idx in range(NC_ALBEDO):
                    cos_v = jnp.full((M,), c_idx / (NC_ALBEDO - 1.0))
                    tab[rows, _MT_LUT + c_idx] = np.asarray(
                        inner.spec_albedo_fn(cos_v), np.float32)[rows]
        else:
            return None
    has_metal = bool(np.any(tab[:, _MT_METAL] != 0.0))
    has_spec = bool(np.any(tab[:, _MT_SPEC_COL:_MT_SPEC_COL + 3] != 0.0))
    return tab, has_spec, has_metal


_RUNS: dict = {}  # (scene id, static config) -> (jitted pass, scene ref)


def _light_tables(a):
    """Packed light alias tables for the kernel's VMEM blocks."""
    lsel = jnp.stack([a.lights.sel_prob,
                      a.lights.sel_alias.astype(jnp.float32),
                      a.lights.sel_pdf])  # [3, L]
    loff = jnp.stack([a.lights.offset.astype(jnp.float32),
                      a.lights.count.astype(jnp.float32)])  # [2, L]
    ltab = jnp.stack([a.lights.tri_prob,
                      a.lights.tri_alias.astype(jnp.float32),
                      a.lights.tri_pdf,
                      a.lights.tri_ids.astype(jnp.float32)])  # [4, S]
    return lsel, loff, ltab


def _pass_grid_spec(a, npix):
    """(padded attr table, PrefetchScalarGridSpec) for one megakernel pass.

    Shared between render_pt_megakernel and the Mosaic-lowering tripwire
    (tests/test_tpu_lowering.py) so the spec the tests validate is the one
    production dispatches. The tri table pads to a MT_CHUNK multiple (zero
    rows never hit) so the in-kernel chunked sweep's dynamic slices stay in
    bounds."""
    M = int(a.const_emission.shape[0])
    L = int(a.lights.sel_prob.shape[0])
    S = int(a.lights.tri_prob.shape[0])
    npad = ((npix + BLOCK_MK - 1) // BLOCK_MK) * BLOCK_MK
    nb = npad // BLOCK_MK
    T0 = int(a.attr.shape[0])
    T = -(-T0 // MT_CHUNK) * MT_CHUNK
    attr_in = a.attr if T == T0 else jnp.pad(a.attr, ((0, T - T0), (0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # s0 (start sample) [1]
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((T, 41), lambda i, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, 3), lambda i, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, L), lambda i, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, L), lambda i, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, S), lambda i, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, MAT_COLS), lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, BLOCK_MK), lambda i, s: (0, i),
                               memory_space=pltpu.VMEM),
    )
    return attr_in, grid_spec


def render_pt_megakernel(scene, config, task=None, progress_cb=None,
                         session=None):
    """Megakernel render path; caller must have checked megakernel_eligible.

    Returns (image [H, W, 3] numpy, stats dict) like integrators/pt.py."""
    from ..core.film import Film, develop
    from ..core.filters import BoxFilter, GaussianFilter, filter_from_config
    from ..integrators.common import PTSettings

    width, height = scene.camera.width, scene.camera.height
    npix = width * height
    filt = filter_from_config(task.filter_config if task else None)
    settings = PTSettings(
        max_depth=config.max_depth, rr_depth=config.rr_depth,
        use_nee=config.use_nee, indirect_only=config.indirect_only,
        force_diffuse=config.force_diffuse,
        clamp_indirect=config.clamp_indirect,
    )
    seed = task.seed if task else 0
    a = scene.arrays
    M = int(a.const_emission.shape[0])
    if settings.force_diffuse:
        tab = np.zeros((M, MAT_COLS), np.float32)
        tab[:, _MT_REFL:_MT_REFL + 3] = 0.8 * _INV_PI
        tab[:, _MT_ALPHA] = 1.0
        tab[:, _MT_N:_MT_N + 3] = 1.0
        has_spec = has_metal = False
    else:
        baked = _bake_shading(scene)
        assert baked is not None, "megakernel_eligible not checked"
        tab, has_spec, has_metal = baked
    filter_kind = "gaussian" if isinstance(filt, GaussianFilter) else "box"
    fr = float(filt.radius)

    npad = ((npix + BLOCK_MK - 1) // BLOCK_MK) * BLOCK_MK
    lsel, loff, ltab = _light_tables(a)
    tab_j = jnp.asarray(tab)

    import os

    interpret = (
        os.environ.get("AKR_MEGAKERNEL_INTERPRET") == "1"
        or jax.devices()[0].platform == "cpu"
    )

    spp_chunk = min(config.spp, config.spp_per_pass)
    attr_in, grid_spec = _pass_grid_spec(a, npix)

    def get_run(chunk):
        # process-wide memo: repeat renders of the same scene/config reuse
        # the traced+compiled pass instead of re-tracing the (large) kernel
        # graph every call — retraces cost seconds of host time per call
        key = (id(scene), repr(settings), chunk, seed, has_spec, has_metal,
               filter_kind, fr, npix, interpret)
        if key not in _RUNS:
            kernel = _make_kernel(scene, settings, chunk, seed, has_spec,
                                  has_metal, filter_kind, fr, npix)

            @jax.jit
            def run_pass(attr, ce, lsel, loff, ltab, mat_in, s0):
                return pl.pallas_call(
                    kernel,
                    out_shape=jax.ShapeDtypeStruct((4, npad), jnp.float32),
                    grid_spec=grid_spec,
                    interpret=interpret,
                )(s0, attr, ce, lsel, loff, ltab, mat_in)

            # the scene rides along so its id() can never be recycled onto a
            # live cache entry (the kernel closes over scene constants)
            _RUNS[key] = (run_pass, scene)
        return _RUNS[key][0]

    t0 = time.time()
    acc = np.zeros((4, npad), np.float32)
    done = 0
    stats = {"time": [], "spp": []}

    # adaptive watchdog sizing (same probe scheme as integrators/pt.py):
    # one whole-frame dispatch must stay under the ~60 s relay watchdog
    import os as _os

    from ..scene import _on_tpu

    try:
        _budget = float(_os.environ.get("AKR_MAX_PASS_SECONDS", "40"))
    except ValueError:
        _budget = 40.0
    if (
        _on_tpu()
        and _budget > 0
        and spp_chunk > 1
        and config.spp - done > 2
        and _os.environ.get("AKR_ADAPTIVE_PASS", "1") != "0"
    ):
        for _ in range(2):  # first run compiles, second times
            tp = time.time()
            out = get_run(1)(attr_in, a.const_emission, lsel, loff, ltab,
                             tab_j, jnp.asarray([done], jnp.int32))
            acc += np.asarray(out)
            done += 1
        per_spp = time.time() - tp
        max_chunk = max(1, int(_budget / max(per_spp, 1e-6)))
        if spp_chunk > max_chunk:
            remaining = config.spp - done
            n = -(-remaining // max_chunk)
            spp_chunk = -(-remaining // n)

    while done < config.spp:
        chunk = min(spp_chunk, config.spp - done)
        out = get_run(chunk)(attr_in, a.const_emission, lsel, loff, ltab,
                             tab_j, jnp.asarray([done], jnp.int32))
        acc += np.asarray(out)
        done += chunk
        if progress_cb:
            stats["time"].append(time.time() - t0)
            stats["spp"].append(done)
            progress_cb(done, config.spp, stats)
    stats["total_time"] = time.time() - t0
    stats["spp_total"] = done
    film = Film(
        accum=jnp.asarray(acc[:3, :npix].T),
        splat=jnp.zeros((npix, 3)),
        weight=jnp.asarray(acc[3, :npix]),
    )
    img = np.asarray(develop(film, width, height))
    return img, stats
