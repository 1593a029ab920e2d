"""Pallas fused-shade kernel: one dispatch_shade in ONE TPU kernel.

Round-4 bisection: after the albedo-curve hoist the cbox shade dispatch
still costs ~8 ms per 1M lanes against ~0.3 ms of roofline work — the XLA
formulation materializes dozens of [N]/[N,3] intermediates in HBM at every
fusion boundary. This kernel computes the ENTIRE per-bounce shade —
closure.evaluate at the NEE direction, the sample_wi cascade + evaluate at
the sampled direction, and the directional albedo — with every intermediate
VMEM/register-resident: HBM traffic is exactly the ~26 input rows + 14
output rows per lane.

Scope: kinds whose closures bake to the reduced fused-principled form
(diffuse + metal + specular layer; transmission/coat statically zero) with
constant material inputs — megakernel._bake_shading's scope, and it is
reused verbatim so every per-material constant (srgb->linear, uplift,
f0/spec_eta, the 16-knot GGX albedo cos-LUT) matches the XLA closure path
bit-for-bit. The shading math is the same component-wise cascade the
megakernel uses (imported helpers), which mirrors principled_fused.py /
SurfaceClosure exactly (leak check, MIS weight, VNDF sampling, choice
remap); equivalence is asserted numerically in tests/test_pallas_shade.py.

Default ON for eligible scenes when the device is a TPU (AKR_PALLAS_SHADE=0
reverts); the A/B win is recorded in BENCH detail.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .megakernel import (
    MAT_COLS,
    NC_ALBEDO,
    _MT_ALPHA,
    _MT_K,
    _MT_METAL,
    _MT_N,
    _MT_REFL,
    _MT_SPEC_COL,
    _MT_SPEC_ETA,
    _INV_PI,
    _bake_shading,
    _dot3,
    _fr_complex1,
    _fr_dielectric1,
    _gather_row,
    _ggx_refl_base1,
    _ggx_sample_wh1,
    _lut1,
)

# lanes per grid step: smaller blocks shrink the Mosaic register/compile
# footprint (each [B] f32 row is B/128 vregs and the kernel keeps ~100
# values live); the remote compile helper OOMed at 2048
BLOCK_PS = int(os.environ.get("AKR_PSHADE_BLOCK", "512"))

# input row layout ([NROWS_IN, n]):
_R_T = 0        # 0:3   shading frame tangent (world)
_R_B = 3        # 3:6   bitangent
_R_N = 6        # 6:9   shading normal ns
_R_NG = 9       # 9:12  geometric normal
_R_WO = 12      # 12:15 wo (world, unit)
_R_LWI = 15     # 15:18 NEE light direction (world, unit)
_R_LLI = 18     # 18:21 NEE radiance li
_R_LPDF = 21    # light sample pdf
_R_U = 22       # 22:25 u_select, u0, u1
_R_MAT = 25     # material id (f32, exact to 2^24)
NROWS_IN = 26

# output row layout ([NROWS_OUT, n]):
_O_DIR = 0      # 0:3   direct = li * f_l * mis / ls_pdf
_O_WI = 3       # 3:6   sampled wi (world)
_O_F = 6        # 6:9   f at sampled wi (includes |cos|)
_O_PDF = 9
_O_VALID = 10
_O_ALB = 11     # 11:14 directional albedo
NROWS_OUT = 16  # padded to a sublane multiple


def _kernel(tab_ref, in_ref, out_ref, *, n_mats, has_spec, has_metal):
    B = in_ref.shape[1]
    ld = lambda r: in_ref[r, :]
    tx, ty, tz = ld(_R_T), ld(_R_T + 1), ld(_R_T + 2)
    bx, by, bz = ld(_R_B), ld(_R_B + 1), ld(_R_B + 2)
    nx, ny, nz = ld(_R_N), ld(_R_N + 1), ld(_R_N + 2)
    ngx, ngy, ngz = ld(_R_NG), ld(_R_NG + 1), ld(_R_NG + 2)
    wox, woy, woz = ld(_R_WO), ld(_R_WO + 1), ld(_R_WO + 2)
    lwx, lwy, lwz = ld(_R_LWI), ld(_R_LWI + 1), ld(_R_LWI + 2)
    lir, lig, lib = ld(_R_LLI), ld(_R_LLI + 1), ld(_R_LLI + 2)
    ls_pdf = ld(_R_LPDF)
    u_sel, u0, u1 = ld(_R_U), ld(_R_U + 1), ld(_R_U + 2)
    mat = ld(_R_MAT).astype(jnp.int32)

    rrow = _gather_row(tab_ref, mat, n_mats)  # [B, MAT_COLS]
    ref_r = rrow[:, _MT_REFL]
    ref_g = rrow[:, _MT_REFL + 1]
    ref_b = rrow[:, _MT_REFL + 2]
    alpha_g = rrow[:, _MT_ALPHA]
    met = rrow[:, _MT_METAL]

    def to_local(vx, vy, vz):
        return (_dot3(vx, vy, vz, tx, ty, tz),
                _dot3(vx, vy, vz, bx, by, bz),
                _dot3(vx, vy, vz, nx, ny, nz))

    def leak_ok(vx, vy, vz, wx, wy, wz):
        # SurfaceClosure._valid_wo_wi, component-wise
        sgn = lambda x: jnp.where(x > 0.0, 1.0, -1.0)
        flip = sgn(_dot3(ngx, ngy, ngz, nx, ny, nz))
        a1 = sgn(flip * _dot3(vx, vy, vz, nx, ny, nz)) * sgn(
            _dot3(vx, vy, vz, ngx, ngy, ngz)) > 0.0
        a2 = sgn(flip * _dot3(wx, wy, wz, nx, ny, nz)) * sgn(
            _dot3(wx, wy, wz, ngx, ngy, ngz)) > 0.0
        return a1 & a2

    lwo = to_local(wox, woy, woz)
    if has_spec:
        lut = rrow[:, 16:16 + NC_ALBEDO]
        sc_r = rrow[:, _MT_SPEC_COL]
        sc_g = rrow[:, _MT_SPEC_COL + 1]
        sc_b = rrow[:, _MT_SPEC_COL + 2]
        alb_o = _lut1(lut, lwo[2])

    def bsdf_eval(lix, liy, liz):
        """FusedPrincipled.evaluate, reduced (see megakernel bounce_body)."""
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
            fm_r = B_r * _fr_complex1(afc, rrow[:, _MT_N], rrow[:, _MT_K])
            fm_g = B_r * _fr_complex1(afc, rrow[:, _MT_N + 1],
                                      rrow[:, _MT_K + 1])
            fm_b = B_r * _fr_complex1(afc, rrow[:, _MT_N + 2],
                                      rrow[:, _MT_K + 2])
            f_r = f_r + (fm_r - f_r) * met
            f_g = f_g + (fm_g - f_g) * met
            f_b = f_b + (fm_b - f_b) * met
            pdf = pdf + (pdf_r - pdf) * met
        return f_r, f_g, f_b, pdf

    # --- NEE evaluate (closure.evaluate(wo, ls_wi)) ---
    lwi = to_local(lwx, lwy, lwz)
    el_r, el_g, el_b, pdf_l = bsdf_eval(lwi[0], lwi[1], lwi[2])
    ok_nee = leak_ok(wox, woy, woz, lwx, lwy, lwz)
    pdf_l = jnp.where(ok_nee, pdf_l, 0.0)
    fl_r = jnp.where(ok_nee, el_r, 0.0)
    fl_g = jnp.where(ok_nee, el_g, 0.0)
    fl_b = jnp.where(ok_nee, el_b, 0.0)
    # mis_weight(ls_pdf, pdf_l) / max(ls_pdf, 1e-20)  (common.py shade())
    w_nee = ls_pdf / jnp.maximum(ls_pdf + pdf_l, 1e-30)
    scale = w_nee / jnp.maximum(ls_pdf, 1e-20)
    out_ref[_O_DIR, :] = lir * fl_r * scale
    out_ref[_O_DIR + 1, :] = lig * fl_g * scale
    out_ref[_O_DIR + 2, :] = lib * fl_b * scale

    # --- sample_wi cascade (FusedPrincipled.sample_wi, trans/coat zero) ---
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
    whx, why, whz = _ggx_sample_wh1(alpha_g, lwo[0], lwo[1], lwo[2], u0, u1)
    dwh = _dot3(lwo[0], lwo[1], lwo[2], whx, why, whz)
    rxx = -lwo[0] + 2.0 * dwh * whx
    rxy = -lwo[1] + 2.0 * dwh * why
    rxz = -lwo[2] + 2.0 * dwh * whz
    rdisk = jnp.sqrt(jnp.maximum(u0, 0.0))
    phi = u1 * np.float32(2.0 * np.pi)
    sx = rdisk * jnp.cos(phi)
    sy = rdisk * jnp.sin(phi)
    sz = jnp.sqrt(jnp.maximum(0.0, 1.0 - sx * sx - sy * sy))
    flip_wi = jnp.where(lwo[2] * sz > 0.0, 1.0, -1.0)
    sx, sy, sz = sx * flip_wi, sy * flip_wi, sz * flip_wi
    lix = jnp.where(use_refl, rxx, sx)
    liy = jnp.where(use_refl, rxy, sy)
    liz = jnp.where(use_refl, rxz, sz)
    valid_s = (~use_refl) | (lwo[2] * rxz > 0.0)  # same_hemisphere of refl
    nwx = lix * tx + liy * bx + liz * nx
    nwy = lix * ty + liy * by + liz * ny
    nwz = lix * tz + liy * bz + liz * nz
    es_r, es_g, es_b, pdf_s = bsdf_eval(lix, liy, liz)
    ok_s = leak_ok(wox, woy, woz, nwx, nwy, nwz)
    # closure.sample: f/pdf zeroed by the leak check (evaluate), valid =
    # sample_wi valid & leak & pdf > 0 (surface.py:556-561)
    pdf_s = jnp.where(ok_s, pdf_s, 0.0)
    out_ref[_O_WI, :] = nwx
    out_ref[_O_WI + 1, :] = nwy
    out_ref[_O_WI + 2, :] = nwz
    out_ref[_O_F, :] = jnp.where(ok_s, es_r, 0.0)
    out_ref[_O_F + 1, :] = jnp.where(ok_s, es_g, 0.0)
    out_ref[_O_F + 2, :] = jnp.where(ok_s, es_b, 0.0)
    out_ref[_O_PDF, :] = pdf_s
    out_ref[_O_VALID, :] = (valid_s & ok_s & (pdf_s > 0.0)).astype(jnp.float32)

    # --- albedo (FusedPrincipled.albedo, trans/coat zero) ---
    base_r = ref_r * np.float32(np.pi)
    base_g = ref_g * np.float32(np.pi)
    base_b = ref_b * np.float32(np.pi)
    if has_spec:
        al_r = sc_r * (sc_r * alb_o) + base_r * (1.0 - sc_r * alb_o)
        al_g = sc_g * (sc_g * alb_o) + base_g * (1.0 - sc_g * alb_o)
        al_b = sc_b * (sc_b * alb_o) + base_b * (1.0 - sc_b * alb_o)
    else:
        al_r, al_g, al_b = base_r, base_g, base_b
    if has_metal:
        al_r = al_r + (1.0 - al_r) * met
        al_g = al_g + (1.0 - al_g) * met
        al_b = al_b + (1.0 - al_b) * met
    out_ref[_O_ALB, :] = al_r
    out_ref[_O_ALB + 1, :] = al_g
    out_ref[_O_ALB + 2, :] = al_b
    for r in range(_O_ALB + 3, NROWS_OUT):
        out_ref[r, :] = jnp.zeros((B,))


@functools.partial(
    jax.jit, static_argnames=("n_mats", "has_spec", "has_metal", "interpret")
)
def _run(tab, inp, n_mats, has_spec, has_metal, interpret=False):
    n = inp.shape[1]
    grid = (n // BLOCK_PS,)
    return pl.pallas_call(
        functools.partial(_kernel, n_mats=n_mats, has_spec=has_spec,
                          has_metal=has_metal),
        out_shape=jax.ShapeDtypeStruct((NROWS_OUT, n), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((n_mats, MAT_COLS), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NROWS_IN, BLOCK_PS), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((NROWS_OUT, BLOCK_PS), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(tab, inp)


# bake cache keyed by the scene's KINDS tuple identity: dataclasses.replace
# swaps arrays but shares .kinds, so the traced copies integrators build
# inside jit hit the entry the load-time bake created. The kinds tuple
# rides along so its id() can never be recycled onto a live entry.
_BAKES: dict = {}


def ensure_shade_bake(scene):
    """Bake at LOAD time (concrete arrays). Called from load_scene;
    _bake_shading converts closure values to numpy, so it must never run
    under a jit trace (the integrators only read the cache)."""
    key = id(scene.kinds)
    if key not in _BAKES:
        baked = None
        a = scene.arrays
        if a.const_emission is not None and not scene.has_alpha:
            b = _bake_shading(scene)
            if b is not None:
                tab, has_spec, has_metal = b
                baked = (jnp.asarray(tab), has_spec, has_metal)
        _BAKES[key] = (baked, scene.kinds)
    return _BAKES[key][0]


def shade_bake(scene):
    """([M, MAT_COLS] jnp table, has_spec, has_metal) or None — cache READ
    only (safe inside jit traces; miss = not eligible)."""
    e = _BAKES.get(id(scene.kinds))
    return e[0] if e is not None else None


def pallas_shade_enabled() -> bool:
    # DEFAULT OFF: the kernel itself is correct (A/B suite) and lowers
    # through Mosaic, but embedding it in the bounce while_loop makes the
    # REMOTE compile helper exceed its memory budget (SIGKILL) on the
    # round-4 relay — the pass then cannot compile at all. Opt-in until
    # the helper-side OOM is resolved or the kernel is dispatched outside
    # the fused pass graph.
    return os.environ.get("AKR_PALLAS_SHADE", "0") != "0"


def pallas_shade(scene, si, extra, interpret=False):
    """Drop-in for dispatch_shade on eligible scenes: same sh dict
    (direct, wi, f, pdf, valid, albedo). Caller checked shade_bake."""
    tab, has_spec, has_metal = shade_bake(scene)
    t, b_, n_ = si["frame"]
    n = si["kind"].shape[0]
    n_pad = ((n + BLOCK_PS - 1) // BLOCK_PS) * BLOCK_PS
    pad = n_pad - n

    rows = [
        t[..., 0], t[..., 1], t[..., 2],
        b_[..., 0], b_[..., 1], b_[..., 2],
        n_[..., 0], n_[..., 1], n_[..., 2],
        si["ng"][..., 0], si["ng"][..., 1], si["ng"][..., 2],
        extra["wo"][..., 0], extra["wo"][..., 1], extra["wo"][..., 2],
        extra["ls_wi"][..., 0], extra["ls_wi"][..., 1], extra["ls_wi"][..., 2],
        extra["ls_li"][..., 0], extra["ls_li"][..., 1], extra["ls_li"][..., 2],
        extra["ls_pdf"],
        extra["u_bsdf"][..., 0], extra["u_bsdf"][..., 1],
        extra["u_bsdf"][..., 2],
        si["mat"].astype(jnp.float32),
    ]
    inp = jnp.stack(rows, axis=0)
    if pad:
        inp = jnp.pad(inp, ((0, 0), (0, pad)), constant_values=0.5)
    out = _run(tab, inp, int(tab.shape[0]), has_spec, has_metal, interpret)
    o = out[:, :n]
    return {
        "direct": o[_O_DIR:_O_DIR + 3].T,
        "wi": o[_O_WI:_O_WI + 3].T,
        "f": o[_O_F:_O_F + 3].T,
        "pdf": o[_O_PDF],
        "valid": o[_O_VALID] > 0.5,
        "albedo": o[_O_ALB:_O_ALB + 3].T,
    }
