"""Pair-sweep traversal (accel/pairs.py) vs brute-force ground truth.

Small cluster_size keeps the statically-unrolled Pallas sweep fast in
interpret mode; tiny maxc forces MULTIPLE rounds so the lexicographic
(entry, id) threshold machinery is exercised, not just the happy one-round
path. Mirrors SURVEY.md §7.2 step 3 ("validate against brute-force")."""
import jax.numpy as jnp
import numpy as np
import pytest

from akari_render_tpu.accel.bvh import build_bvh
from akari_render_tpu.accel.cluster import build_clusters
from akari_render_tpu.accel.pairs import intersect_pairs
from akari_render_tpu.accel.trace import intersect_brute_force, occlude_brute_force


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
    return build_clusters(v0, e1, e2, np.asarray(bvh.order), cluster_size=16)


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
    got = intersect_pairs(clusters, o, d, tmin, tmax, interpret=True, maxc=6)
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
    # finite tmax plus some dead lanes (tmax < tmin: wavefront terminated rays)
    tmax = jnp.asarray(rng.uniform(0.5, 10.0, n).astype(np.float32)).at[:40].set(-1.0)
    ref = intersect_brute_force(o, d, tmin, tmax, v0, e1, e2, ex0, ex1)
    got = intersect_pairs(clusters, o, d, tmin, tmax, ex0, ex1,
                          interpret=True, maxc=6)
    np.testing.assert_array_equal(np.asarray(ref.valid), np.asarray(got.valid))
    m = np.asarray(ref.valid)
    np.testing.assert_array_equal(
        np.asarray(ref.tri_id)[m], np.asarray(got.tri_id)[m]
    )


def test_any_hit_exact(soup, clusters, rays):
    v0, e1, e2 = (jnp.asarray(a) for a in soup)
    o, d, tmin, tmax = rays
    ref = occlude_brute_force(o, d, tmin, tmax, v0, e1, e2)
    got = intersect_pairs(clusters, o, d, tmin, tmax, any_hit=True,
                          interpret=True, maxc=6)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_single_round_matches_multi_round(soup, clusters, rays):
    """A generous maxc (one round) and a tiny maxc (many rounds) must agree —
    isolates the threshold/round machinery from the sweep math."""
    o, d, tmin, tmax = rays
    one = intersect_pairs(clusters, o, d, tmin, tmax, interpret=True,
                          maxc=clusters.num_clusters)
    many = intersect_pairs(clusters, o, d, tmin, tmax, interpret=True, maxc=4)
    np.testing.assert_array_equal(np.asarray(one.tri_id), np.asarray(many.tri_id))
    np.testing.assert_allclose(np.asarray(one.t), np.asarray(many.t), rtol=1e-6)


def test_refine_kernel_matches_xla_reference():
    """pairs._refine (fused Pallas window refinement) must reproduce the
    exact any-lane-pass mask of the former XLA [B, BLOCK, W] formulation,
    including tmin/t1 clamps and dead lanes (t1 = -1)."""
    import jax
    import jax.numpy as jnp

    from akari_render_tpu.accel.pairs import BLOCK, _refine

    rng = np.random.default_rng(5)
    B, W = 3, 256
    n = B * BLOCK
    o = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    inv = 1.0 / d
    lo = rng.uniform(-3, 2, (B, W, 3)).astype(np.float32)
    hi = lo + rng.uniform(0, 2, (B, W, 3)).astype(np.float32)
    tmin = np.zeros(n, np.float32)
    t1 = rng.uniform(0.1, 5.0, n).astype(np.float32)
    t1[::7] = -1.0  # dead lanes never pass

    # XLA reference
    ob = o.reshape(B, BLOCK, 3)
    ib = inv.reshape(B, BLOCK, 3)
    near = np.full((B, BLOCK, W), -np.inf, np.float32)
    far = np.full((B, BLOCK, W), np.inf, np.float32)
    for a in range(3):
        t0x = (lo[:, None, :, a] - ob[..., a][:, :, None]) * ib[..., a][:, :, None]
        t1x = (hi[:, None, :, a] - ob[..., a][:, :, None]) * ib[..., a][:, :, None]
        near = np.maximum(near, np.minimum(t0x, t1x))
        far = np.minimum(far, np.maximum(t0x, t1x))
    near = np.maximum(near, tmin.reshape(B, BLOCK)[..., None])
    far = np.minimum(far, t1.reshape(B, BLOCK)[..., None])
    want = (near <= far).any(axis=1)

    wb = jnp.asarray(
        np.concatenate([lo, hi], axis=-1).transpose(0, 2, 1)
    )  # [B, 6, W]
    got = _refine(
        wb, jnp.asarray(o.T), jnp.asarray(inv.T),
        jnp.stack([jnp.asarray(tmin), jnp.asarray(t1)]), interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got) > 0, want)


def test_cull_kernel_matches_xla_reference():
    """pairs._cull_einit (fused Pallas conservative cull) must be BIT-exact
    vs the XLA _block_entries_raw chain (same ops, same order), including
    sign-straddling inverse-direction intervals and non-tile-multiple
    B / K (the kernel pads and slices)."""
    import jax.numpy as jnp

    from akari_render_tpu.accel.pairs import _block_entries_raw, _cull_einit

    rng = np.random.default_rng(11)
    B, K = 5, 700  # neither a multiple of the (8, 512) tile
    olo = rng.uniform(-3, 2, (B, 3)).astype(np.float32)
    ohi = olo + rng.uniform(0, 1, (B, 3)).astype(np.float32)
    ilo = rng.uniform(-8, 4, (B, 3)).astype(np.float32)
    ihi = ilo + rng.uniform(0, 8, (B, 3)).astype(np.float32)  # straddles 0
    bt0 = rng.uniform(0, 0.1, (B,)).astype(np.float32)
    # round-5 horizon column: one block fully dead (-1), the rest finite
    bt1 = rng.uniform(0.5, 6, (B,)).astype(np.float32)
    bt1[1] = -1.0
    cbmin = rng.uniform(-4, 3, (K, 3)).astype(np.float32)
    cbmax = cbmin + rng.uniform(0, 2, (K, 3)).astype(np.float32)

    ent, exi = _block_entries_raw(
        jnp.asarray(cbmin), jnp.asarray(cbmax), jnp.asarray(olo),
        jnp.asarray(ohi), jnp.asarray(ilo), jnp.asarray(ihi),
        jnp.asarray(bt0), bt1max=jnp.asarray(bt1),
    )
    want = np.asarray(jnp.where(ent <= exi, ent, jnp.inf))

    summ = jnp.concatenate(
        [jnp.asarray(olo), jnp.asarray(ohi), jnp.asarray(ilo),
         jnp.asarray(ihi), jnp.asarray(bt0)[:, None],
         jnp.asarray(bt1)[:, None], jnp.zeros((B, 2))],
        axis=1,
    )
    cb6 = jnp.concatenate([jnp.asarray(cbmin).T, jnp.asarray(cbmax).T], axis=0)
    got = np.asarray(_cull_einit(summ, cb6, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_per_lane_any_hit_mask(soup, clusters, rays):
    """any_hit_mask lanes (fused shadow rays) must report exactly the
    brute-force occlusion bit; unmasked lanes in the SAME call must still
    return the exact closest hit (the masked lanes' early retirement must
    not corrupt shared block state)."""
    v0, e1, e2 = (jnp.asarray(a) for a in soup)
    o, d, tmin, tmax = rays
    n = o.shape[0]
    mask = jnp.asarray((np.arange(n) % 2) == 1)  # half shadow, interleaved
    got = intersect_pairs(clusters, o, d, tmin, tmax, interpret=True, maxc=6,
                          any_hit_mask=mask)
    ref_occ = occlude_brute_force(o, d, tmin, tmax, v0, e1, e2)
    ref = intersect_brute_force(o, d, tmin, tmax, v0, e1, e2)
    m = np.asarray(mask)
    assert np.array_equal(np.asarray(got.valid)[m], np.asarray(ref_occ)[m])
    assert np.array_equal(np.asarray(got.tri_id)[~m], np.asarray(ref.tri_id)[~m])
    assert np.allclose(np.asarray(got.t)[~m], np.asarray(ref.t)[~m])


def test_nan_dead_lane_does_not_poison_block(soup, clusters, rays):
    """A dead lane carrying NaN (legal: invalid BSDF samples leave garbage
    in retired lanes) must not poison its block's interval summaries — the
    regression here was the conservative cull rejecting EVERY candidate for
    the whole block, silently missing all live-lane hits."""
    v0, e1, e2 = (jnp.asarray(a) for a in soup)
    o, d, tmin, tmax = rays
    o = np.asarray(o).copy()
    d = np.asarray(d).copy()
    tmax = np.asarray(tmax).copy()
    o[5] = np.nan
    d[5] = np.nan
    tmax[5] = -1.0
    got = intersect_pairs(clusters, jnp.asarray(o), jnp.asarray(d), tmin,
                          jnp.asarray(tmax), interpret=True, maxc=6)
    ref = intersect_brute_force(
        jnp.asarray(np.nan_to_num(o)), jnp.asarray(np.nan_to_num(d, nan=1.0)),
        tmin, jnp.asarray(tmax), v0, e1, e2)
    live = np.ones(o.shape[0], bool)
    live[5] = False
    assert np.array_equal(np.asarray(got.tri_id)[live],
                          np.asarray(ref.tri_id)[live])
    assert not bool(np.asarray(got.valid)[5])
