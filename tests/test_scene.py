"""Scene loading + light sampling + end-to-end render integration tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from akari_render_tpu.config import PTConfig
from akari_render_tpu.scene import load_scene


@pytest.fixture(scope="module")
def cbox(cbox_path):
    return load_scene(cbox_path, width=16, height=16)


class TestLoading:
    def test_cbox_structure(self, cbox):
        assert cbox.num_tris == 36
        assert len(cbox.kinds) == 1  # all 8 principled materials dedupe
        assert cbox.arrays.lights.num_lights == 1
        assert len(cbox.material_names) == 8

    def test_camera(self, cbox):
        c2w = np.asarray(cbox.camera.c2w)
        # Blender camera (0,-9,1) -> Akari Y-up (0,1,9) (load.rs:152-160)
        np.testing.assert_allclose(c2w[:3, 3], [0.0, 1.0, 9.0], atol=1e-5)

    def test_light_is_ceiling_quad(self, cbox):
        la = cbox.arrays.lights
        lit = np.asarray(la.tri_light_id)
        lit_tris = np.nonzero(lit >= 0)[0]
        assert len(lit_tris) == 2  # the light quad
        # light triangles are near the ceiling (y ~ 1.98)
        v0 = np.asarray(cbox.arrays.v0)[lit_tris]
        assert (v0[:, 1] > 1.9).all()

    def test_areas_positive(self, cbox):
        a = np.asarray(cbox.arrays.area)
        assert (a > 0).all()

    def test_prim_pdf_normalized(self, cbox):
        la = cbox.arrays.lights
        assert abs(float(la.tri_prim_pdf.sum()) - 1.0) < 1e-5


class TestSurfaceInteraction:
    def test_interpolation_matches_vertices(self, cbox):
        tri = jnp.array([0, 5, 10], jnp.int32)
        # bary (0,0) -> v0
        si = cbox.surface_interaction(tri, jnp.zeros((3, 2)))
        np.testing.assert_allclose(
            np.asarray(si["p"]), np.asarray(cbox.arrays.v0[tri]), atol=1e-6
        )
        # frame is orthonormal
        t, b, n = si["frame"]
        np.testing.assert_allclose(np.asarray((t * b).sum(-1)), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(n), axis=-1), 1.0, atol=1e-5)


class TestRenderIntegration:
    def test_small_render_statistics(self, cbox_path):
        """Golden-statistics test: 32x32 cbox render has stable mean brightness."""
        scene = load_scene(cbox_path, width=32, height=32)
        from akari_render_tpu.integrators.pt import render_pt

        img, stats = render_pt(scene, PTConfig(spp=16, max_depth=5, spp_per_pass=16))
        assert np.isfinite(img).all()
        mean = img.mean(axis=(0, 1))
        # reference value from high-spp runs of this renderer (cross-validated
        # NEE vs BSDF-only to <1%): [0.176, 0.114, 0.0327] at depth 5
        np.testing.assert_allclose(mean, [0.176, 0.114, 0.0327], rtol=0.15)
        # red wall tints the left, green the right (compare G/R ratios —
        # absolute G>R doesn't hold since base albedo is itself R-heavy)
        left = img[:, :10].mean(axis=(0, 1))
        right = img[:, 22:].mean(axis=(0, 1))
        assert left[0] / left[1] > right[0] / right[1], "left should be redder than right"

    def test_nee_vs_bsdf_sampling_agree(self, cbox_path):
        """The two estimators must converge to the same image (MIS check)."""
        scene = load_scene(cbox_path, width=16, height=16)
        from akari_render_tpu.integrators.pt import render_pt

        img_a, _ = render_pt(scene, PTConfig(spp=48, max_depth=4, use_nee=True, spp_per_pass=48))
        img_b, _ = render_pt(scene, PTConfig(spp=48, max_depth=4, use_nee=False, spp_per_pass=48))
        ma, mb = img_a.mean(axis=(0, 1)), img_b.mean(axis=(0, 1))
        np.testing.assert_allclose(ma, mb, rtol=0.1)


class TestSharding:
    def test_multichip_matches_film_weight(self, cbox_path):
        from akari_render_tpu.core.film import Film
        from akari_render_tpu.core.filters import GaussianFilter
        from akari_render_tpu.integrators.common import PTSettings
        from akari_render_tpu.parallel.shard import make_mesh, make_sharded_pass

        scene = load_scene(cbox_path, width=16, height=16)
        mesh = make_mesh(8)
        one_pass = make_sharded_pass(
            scene, PTSettings(max_depth=3, rr_depth=2), GaussianFilter(1.5), 16, 16, mesh
        )
        film = Film.new(16, 16)
        film = one_pass(scene.arrays, film, jnp.uint32(0))
        assert float(film.weight.sum()) == 16 * 16  # every pixel sampled once

    def test_sharded_matches_mean(self, cbox_path):
        """8-shard render statistically matches the single-device render."""
        from akari_render_tpu.core.film import develop
        from akari_render_tpu.parallel.shard import make_mesh, render_pt_sharded

        scene = load_scene(cbox_path, width=16, height=16)
        img, _ = render_pt_sharded(
            scene, PTConfig(spp=32, max_depth=4), mesh=make_mesh(8)
        )
        np.testing.assert_allclose(
            img.mean(axis=(0, 1)), [0.176, 0.114, 0.0327], rtol=0.25
        )
