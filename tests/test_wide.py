"""Wide-BVH packet traversal (accel/wide.py) vs brute-force ground truth.

Same fixture strategy as test_pairs.py: a random soup with small clusters so
the interpret-mode kernel stays fast, rays from all octants (the morton sort
groups them per block), exclusions + dead lanes, any-hit. Mirrors SURVEY.md
§7.2 step 3 ("validate against brute-force")."""
import jax.numpy as jnp
import numpy as np
import pytest

from akari_render_tpu.accel.bvh import build_bvh
from akari_render_tpu.accel.cluster import build_clusters
from akari_render_tpu.accel.trace import intersect_brute_force, occlude_brute_force
from akari_render_tpu.accel.wide import attach_wide, intersect_wide


@pytest.fixture(scope="module")
def soup():
    rng = np.random.default_rng(7)
    T = 2500
    c = rng.uniform(-5, 5, (T, 3)).astype(np.float32)
    return (
        c,
        rng.normal(0, 0.3, (T, 3)).astype(np.float32),
        rng.normal(0, 0.3, (T, 3)).astype(np.float32),
    )


@pytest.fixture(scope="module")
def clusters(soup):
    v0, e1, e2 = soup
    bvh = build_bvh(v0, e1, e2)
    cl = build_clusters(v0, e1, e2, np.asarray(bvh.order), cluster_size=16)
    return attach_wide(cl)


@pytest.fixture(scope="module")
def rays():
    rng = np.random.default_rng(3)
    N = 700
    o = jnp.asarray(rng.uniform(-8, 8, (N, 3)).astype(np.float32))
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, jnp.asarray(d), jnp.full(N, 1e-3), jnp.full(N, 1e20)


def test_closest_hit_exact(soup, clusters, rays):
    v0, e1, e2 = (jnp.asarray(a) for a in soup)
    o, d, tmin, tmax = rays
    ref = intersect_brute_force(o, d, tmin, tmax, v0, e1, e2)
    got = intersect_wide(clusters, o, d, tmin, tmax, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref.valid), np.asarray(got.valid))
    m = np.asarray(ref.valid)
    np.testing.assert_array_equal(
        np.asarray(ref.tri_id)[m], np.asarray(got.tri_id)[m]
    )
    np.testing.assert_allclose(
        np.asarray(ref.t)[m], np.asarray(got.t)[m], rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ref.bary)[m], np.asarray(got.bary)[m], rtol=1e-4, atol=1e-5
    )


def test_exclusions_and_tmax(soup, clusters, rays):
    v0, e1, e2 = (jnp.asarray(a) for a in soup)
    o, d, tmin, _ = rays
    n = o.shape[0]
    rng = np.random.default_rng(11)
    ex0 = jnp.asarray(rng.integers(0, v0.shape[0], n).astype(np.int32))
    ex1 = jnp.asarray(rng.integers(0, v0.shape[0], n).astype(np.int32))
    tmax = jnp.asarray(rng.uniform(0.5, 10.0, n).astype(np.float32)).at[:40].set(-1.0)
    ref = intersect_brute_force(o, d, tmin, tmax, v0, e1, e2, ex0, ex1)
    got = intersect_wide(clusters, o, d, tmin, tmax, ex0, ex1, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref.valid), np.asarray(got.valid))
    m = np.asarray(ref.valid)
    np.testing.assert_array_equal(
        np.asarray(ref.tri_id)[m], np.asarray(got.tri_id)[m]
    )


def test_any_hit_exact(soup, clusters, rays):
    v0, e1, e2 = (jnp.asarray(a) for a in soup)
    o, d, tmin, tmax = rays
    ref = occlude_brute_force(o, d, tmin, tmax, v0, e1, e2)
    got = intersect_wide(clusters, o, d, tmin, tmax, any_hit=True,
                         interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_matches_pairs_on_unified_instanced(rays):
    """Unified instanced candidates (xf rows + virtual global ids) through
    the packet kernel must match the pair sweep exactly."""
    from akari_render_tpu.accel.instanced import (
        build_instanced,
        build_unified_clusters,
    )
    from akari_render_tpu.accel.pairs import intersect_pairs

    rng = np.random.default_rng(5)
    T = 600
    v0 = rng.uniform(-1, 1, (T, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.2, (T, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.2, (T, 3)).astype(np.float32)
    mesh = {
        "v0": v0, "e1": e1, "e2": e2,
        "ns": np.zeros((T, 3, 3), np.float32),
        "uv": np.zeros((T, 3, 2), np.float32),
        "tangent": np.zeros((T, 3, 3), np.float32),
        "mat_slot": np.zeros(T, np.int32),
    }
    insts = []
    for i in range(3):
        m = np.eye(4, dtype=np.float32)
        m[:3, 3] = rng.uniform(-4, 4, 3)
        m[:3, :3] *= rng.uniform(0.5, 1.5)
        insts.append({
            "mesh": 0, "matrix": m, "slot_mat": [0], "slot_kind": [0],
            "inst_index": i,
        })
    ia, _ = build_instanced([mesh], insts, tri_base0=0)
    uni = attach_wide(build_unified_clusters(ia, None))
    o, d, tmin, tmax = rays
    ref = intersect_pairs(uni, o, d, tmin, tmax, interpret=True)
    got = intersect_wide(uni, o, d, tmin, tmax, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref.valid), np.asarray(got.valid))
    m = np.asarray(ref.valid)
    np.testing.assert_array_equal(
        np.asarray(ref.tri_id)[m], np.asarray(got.tri_id)[m]
    )
    np.testing.assert_allclose(np.asarray(ref.t)[m], np.asarray(got.t)[m],
                               rtol=1e-5)
    occ_ref = intersect_pairs(uni, o, d, tmin, tmax, any_hit=True,
                              interpret=True)
    occ_got = intersect_wide(uni, o, d, tmin, tmax, any_hit=True,
                             interpret=True)
    np.testing.assert_array_equal(np.asarray(occ_ref), np.asarray(occ_got))
