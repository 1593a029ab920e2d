"""Megakernel tier (integrators/megakernel.py): eligibility + A/B against
the wavefront integrator. Runs the kernel in interpret mode on CPU."""
import os

import numpy as np
import pytest

from akari_render_tpu.config import PTConfig
from akari_render_tpu.core.filters import GaussianFilter
from akari_render_tpu.integrators.common import PTSettings
from akari_render_tpu.integrators.megakernel import (
    megakernel_eligible, render_pt_megakernel,
)
from akari_render_tpu.integrators.pt import render_pt
from akari_render_tpu.scene import load_scene

CBOX = "/root/reference/scenes/cbox/scene.json"


def test_eligibility_predicate():
    scene = load_scene(CBOX, width=16, height=16)
    filt = GaussianFilter(1.5)
    # v1.5: cbox's real materials (constant-input fused principled with
    # varying metallic, transmission/coat statically 0) bake into the
    # in-kernel diffuse+metal+specular closure
    assert megakernel_eligible(scene, PTSettings(), None, filt)
    # force_diffuse (pt.rs:268-280 debug mode) is in scope
    assert megakernel_eligible(
        scene, PTSettings(force_diffuse=True), None, filt
    )
    # alpha / non-nee configs are excluded
    assert not megakernel_eligible(
        scene, PTSettings(force_diffuse=True, use_nee=False), None, filt
    )


def test_matches_wavefront_force_diffuse():
    """Same estimator + same stateless-hash sample streams as render_pt
    under AKR_RNG=hash: images agree at the per-pixel noise floor (the
    shading frame's in-plane rotation differs, nothing else)."""
    scene = load_scene(CBOX, width=32, height=32)
    cfg = PTConfig(spp=48, max_depth=5, rr_depth=3, spp_per_pass=48,
                   force_diffuse=True)
    os.environ["AKR_RNG"] = "hash"
    try:
        img_ref, _ = render_pt(scene, cfg)
    finally:
        del os.environ["AKR_RNG"]
    img_mk, stats = render_pt_megakernel(scene, cfg)
    assert np.isfinite(img_mk).all()
    m_ref, m_mk = float(np.mean(img_ref)), float(np.mean(img_mk))
    assert abs(m_ref - m_mk) / m_ref < 0.02, (m_ref, m_mk)
    assert float(np.mean(np.abs(img_mk - img_ref))) < 0.01
    assert stats["spp_total"] == 48


def test_matches_wavefront_principled():
    """v1.5 real-material path: cbox's fused-principled kind (one
    metallic-1 sphere, diffuse walls) baked into the in-kernel closure;
    same hash sample streams as render_pt, statistical agreement."""
    scene = load_scene(CBOX, width=32, height=32)
    cfg = PTConfig(spp=48, max_depth=5, rr_depth=3, spp_per_pass=48)
    os.environ["AKR_RNG"] = "hash"
    try:
        img_ref, _ = render_pt(scene, cfg)
    finally:
        del os.environ["AKR_RNG"]
    img_mk, _ = render_pt_megakernel(scene, cfg)
    assert np.isfinite(img_mk).all()
    m_ref, m_mk = float(np.mean(img_ref)), float(np.mean(img_mk))
    assert abs(m_ref - m_mk) / m_ref < 0.03, (m_ref, m_mk)
    assert float(np.mean(np.abs(img_mk - img_ref))) < 0.015


def test_routing_env_gate():
    """AKR_MEGAKERNEL=1 routes eligible renders through the tier (and the
    result still matches); ineligible configs fall through to wavefront."""
    scene = load_scene(CBOX, width=16, height=16)
    cfg = PTConfig(spp=8, max_depth=3, rr_depth=2, spp_per_pass=8,
                   force_diffuse=True)
    img_direct, _ = render_pt_megakernel(scene, cfg)
    os.environ["AKR_MEGAKERNEL"] = "1"
    try:
        img_routed, _ = render_pt(scene, cfg)
    finally:
        del os.environ["AKR_MEGAKERNEL"]
    np.testing.assert_allclose(img_routed, img_direct, rtol=1e-5, atol=1e-6)
