"""Pallas fused-shade kernel vs the XLA closure path: numeric A/B.

The kernel must be a drop-in for dispatch_shade on baked-constant kinds —
same direct/wi/f/pdf/valid/albedo to fp tolerance — so the whole render
stays stream-identical when it is routed in (tests the round-4 HBM escape
for the shade dispatch)."""
from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402


@pytest.fixture(scope="module")
def cbox():
    from akari_render_tpu.scene import load_scene

    return load_scene(
        "/root/reference/scenes/cbox/scene.json", width=64, height=64
    )


def _shade_inputs(scene, n=4096, seed=0):
    import jax.random as jr

    from akari_render_tpu.core.math import normalize

    k = jr.PRNGKey(seed)
    tri = jr.randint(k, (n,), 0, scene.num_tris)
    bary = jr.uniform(jr.PRNGKey(seed + 1), (n, 2)) * 0.45
    si = scene.surface_interaction(tri, bary)
    wo = normalize(jr.normal(jr.PRNGKey(seed + 2), (n, 3)))
    ls_wi = normalize(jr.normal(jr.PRNGKey(seed + 3), (n, 3)))
    ls_li = jr.uniform(jr.PRNGKey(seed + 4), (n, 3)) * 3.0
    ls_pdf = jr.uniform(jr.PRNGKey(seed + 5), (n,)) * 2.0 + 1e-3
    u = jr.uniform(jr.PRNGKey(seed + 6), (n, 3))
    extra = {"wo": wo, "u_bsdf": u, "ls_wi": ls_wi, "ls_li": ls_li,
             "ls_pdf": ls_pdf}
    return si, extra


def test_matches_dispatch_shade(cbox):
    from akari_render_tpu.core.sampling import mis_weight
    from akari_render_tpu.integrators.common import dispatch_shade
    from akari_render_tpu.integrators.pallas_shade import (
        pallas_shade, shade_bake,
    )

    assert shade_bake(cbox) is not None, "cbox must be bake-eligible"
    si, extra = _shade_inputs(cbox)

    def shade(closure, ex):
        out = {}
        f_l, pdf_l = closure.evaluate(ex["wo"], ex["ls_wi"])
        w = mis_weight(ex["ls_pdf"], pdf_l)
        out["direct"] = (
            ex["ls_li"] * f_l
            * (w / jnp.maximum(ex["ls_pdf"], 1e-20))[..., None]
        )
        s = closure.sample(ex["wo"], ex["u_bsdf"][..., 0],
                           ex["u_bsdf"][..., 1:])
        out["wi"], out["f"], out["pdf"], out["valid"] = (
            s["wi"], s["f"], s["pdf"], s["valid"]
        )
        out["albedo"] = closure.albedo(ex["wo"])
        return out

    ref = dispatch_shade(cbox, si, extra, shade)
    got = pallas_shade(cbox, si, extra, interpret=True)

    for k_ in ("direct", "albedo"):
        a, b = np.asarray(ref[k_]), np.asarray(got[k_])
        assert np.allclose(a, b, atol=5e-5, rtol=5e-4), (
            k_, np.max(np.abs(a - b)))
    # f and pdf individually deviate up to ~0.5% RELATIVE at GGX spikes
    # (the kernel's component-wise D/lambda and the vector path's
    # Frame-phi formulation are mathematically equal but fp-diverge where
    # tan/cos guards kick in); the shared B_r factor cancels, so the
    # physically-consumed ratio f/pdf is tight — assert that, plus
    # elementwise agreement with a relative tolerance.
    fa, fb = np.asarray(ref["f"]), np.asarray(got["f"])
    pa, pb = np.asarray(ref["pdf"]), np.asarray(got["pdf"])
    rel = np.abs(fa - fb) / np.maximum(np.maximum(np.abs(fa), np.abs(fb)), 1e-4)
    assert rel.max() < 0.02, rel.max()
    relp = np.abs(pa - pb) / np.maximum(np.maximum(pa, pb), 1e-4)
    assert relp.max() < 0.02, relp.max()
    sel_p = (pa > 1e-4) & (pb > 1e-4)
    ra = fa / np.maximum(pa, 1e-20)[..., None]
    rb = fb / np.maximum(pb, 1e-20)[..., None]
    m = sel_p & (np.abs(ra).max(-1) < 1e3)
    d = np.abs(ra - rb)[m]
    assert d.max() < 2e-3, float(d.max())
    # wi only matters where the sample is valid (invalid lanes are masked
    # by the integrator)
    va, vb = np.asarray(ref["valid"]), np.asarray(got["valid"])
    assert (va == vb).mean() > 0.999, (va.sum(), vb.sum())
    sel = va & vb
    assert np.allclose(np.asarray(ref["wi"])[sel], np.asarray(got["wi"])[sel],
                       atol=2e-5), "wi mismatch"


def test_full_render_matches(cbox):
    """End-to-end: the pass with the kernel routed in equals the XLA-shade
    pass (same streams, fp-level differences only)."""
    import os

    from akari_render_tpu.config import PTConfig
    from akari_render_tpu.integrators.pt import render_pt

    cfg = PTConfig(spp=8, max_depth=4, spp_per_pass=8)
    os.environ["AKR_PALLAS_SHADE"] = "0"
    try:
        img_ref, _ = render_pt(cbox, cfg)
    finally:
        os.environ.pop("AKR_PALLAS_SHADE", None)
    os.environ["AKR_PALLAS_SHADE"] = "force"  # interpret on CPU
    try:
        img_ps, _ = render_pt(cbox, cfg)
    finally:
        os.environ.pop("AKR_PALLAS_SHADE", None)
    a, b = np.asarray(img_ref), np.asarray(img_ps)
    assert np.all(np.isfinite(b))
    assert np.allclose(a, b, atol=1e-3), float(np.max(np.abs(a - b)))


def test_lowering():
    """Mosaic lowering tripwire for the shade kernel (multi-block grid)."""
    from jax import export as jax_export

    from akari_render_tpu.integrators.pallas_shade import (
        BLOCK_PS, MAT_COLS, NROWS_IN, _run,
    )

    n = BLOCK_PS * 2
    tab = jnp.zeros((7, MAT_COLS))
    inp = jnp.zeros((NROWS_IN, n))
    jax_export.export(
        jax.jit(lambda t, i: _run(t, i, 7, True, True, False)),
        platforms=["tpu"],
    )(tab, inp)
