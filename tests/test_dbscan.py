"""Device DBSCAN vs sklearn (SURVEY.md §7 step 5: exact-semantics validation)."""
import numpy as np
import jax.numpy as jnp
from sklearn.cluster import DBSCAN

from llckbdm_tpu.ops.dbscan import compact_labels, dbscan, masked_median


def _partition(labels):
    """Canonical partition of clustered points: frozenset of frozensets."""
    labels = np.asarray(labels)
    return frozenset(
        frozenset(np.flatnonzero(labels == lab).tolist())
        for lab in set(labels.tolist()) - {-1})


def _compare_with_sklearn(feats, valid, eps, min_samples):
    got = np.asarray(dbscan(jnp.asarray(feats, jnp.float32),
                            jnp.asarray(valid), eps, min_samples))
    ref = DBSCAN(eps=eps, min_samples=min_samples).fit(feats[valid]).labels_
    full_ref = np.full(len(feats), -1)
    full_ref[valid] = ref
    # identical noise sets and identical cluster partitions
    np.testing.assert_array_equal(got == -1, full_ref == -1)
    assert _partition(got) == _partition(full_ref)


def test_dbscan_blobs_match_sklearn():
    rng = np.random.default_rng(0)
    centers = np.array([[0.0, 0.0], [1.0, 1.0], [-1.0, 0.5]])
    pts = np.concatenate(
        [c + 0.02 * rng.standard_normal((40, 2)) for c in centers] +
        [rng.uniform(-2, 2, (30, 2))])  # scattered noise
    valid = np.ones(len(pts), bool)
    _compare_with_sklearn(pts, valid, eps=0.1, min_samples=8)


def test_dbscan_masked_points_are_noise():
    rng = np.random.default_rng(1)
    pts = 0.01 * rng.standard_normal((64, 2))
    valid = np.ones(64, bool)
    valid[40:] = False
    got = np.asarray(dbscan(jnp.asarray(pts, jnp.float32),
                            jnp.asarray(valid), 0.1, 5))
    assert np.all(got[40:] == -1)
    assert np.all(got[:40] >= 0)  # one dense blob
    _compare_with_sklearn(pts, valid, eps=0.1, min_samples=5)


def test_dbscan_chain_cluster():
    """A 1-d chain where connectivity is transitive (core-core propagation)."""
    x = np.arange(50, dtype=np.float64)[:, None] * 0.05
    feats = np.concatenate([x, np.zeros_like(x)], axis=1)
    valid = np.ones(50, bool)
    _compare_with_sklearn(feats, valid, eps=0.06, min_samples=3)


def test_dbscan_all_noise():
    rng = np.random.default_rng(2)
    pts = rng.uniform(-10, 10, (32, 2))
    got = np.asarray(dbscan(jnp.asarray(pts, jnp.float32),
                            jnp.ones(32, bool), 1e-3, 5))
    assert np.all(got == -1)


def test_compact_labels_orders_by_size():
    labels = jnp.asarray(
        [3, 3, 3, 3, 7, 7, -1, 9, 9, 9], jnp.int32)
    member, counts = compact_labels(labels, 4)
    np.testing.assert_array_equal(np.asarray(counts), [4, 3, 2, 0])
    member = np.asarray(member)
    np.testing.assert_array_equal(member[:, 0], [1, 1, 1, 1, 0, 0, 0, 0, 0, 0])
    np.testing.assert_array_equal(member[:, 1], [0, 0, 0, 0, 0, 0, 0, 1, 1, 1])
    np.testing.assert_array_equal(member[:, 2], [0, 0, 0, 0, 1, 1, 0, 0, 0, 0])
    assert member[6].sum() == 0  # noise is in no cluster


def test_masked_median_matches_numpy():
    rng = np.random.default_rng(3)
    vals = rng.standard_normal(20).astype(np.float32)
    member = np.zeros((20, 3), np.float32)
    member[:7, 0] = 1      # odd count
    member[7:15, 1] = 1    # even count
    got = np.asarray(masked_median(jnp.asarray(vals), jnp.asarray(member)))
    np.testing.assert_allclose(got[0], np.median(vals[:7]), rtol=1e-6)
    np.testing.assert_allclose(got[1], np.median(vals[7:15]), rtol=1e-6)
    assert got[2] == 0.0


# ---------------------------------------------------------------------------
# 1-D sorted fast path (the pipeline default: damping_weight == 0)
# ---------------------------------------------------------------------------

from llckbdm_tpu.ops.dbscan import dbscan_1d  # noqa: E402


def _compare_1d(x, valid, eps, min_samples):
    x32 = jnp.asarray(x, jnp.float32)
    got = np.asarray(dbscan_1d(x32, jnp.asarray(valid), eps, min_samples))
    # vs sklearn on the valid points
    ref = DBSCAN(eps=eps, min_samples=min_samples).fit(
        np.asarray(x)[valid, None]).labels_
    full_ref = np.full(len(x), -1)
    full_ref[valid] = ref
    np.testing.assert_array_equal(got == -1, full_ref == -1)
    assert _partition(got) == _partition(full_ref)
    # vs the general O(n^2) kernel: EXACTLY equal labels (both use the
    # min-root-index convention, for cores and borders alike)
    feats2 = jnp.stack([x32, jnp.zeros_like(x32)], axis=-1)
    gen = np.asarray(dbscan(feats2, jnp.asarray(valid), eps, min_samples))
    np.testing.assert_array_equal(got, gen)


def test_dbscan_1d_lines_match_sklearn_and_general():
    rng = np.random.default_rng(3)
    x = np.concatenate([
        -0.06 + 0.001 * rng.standard_normal(30),   # dense cluster
        0.0075 + 0.0008 * rng.standard_normal(25),  # dense cluster
        rng.uniform(-0.1, 0.1, 40),                 # scattered junk
    ])
    valid = np.ones(len(x), bool)
    valid[90:] = False
    _compare_1d(x, valid, eps=2e-3, min_samples=10)


def test_dbscan_1d_chain_and_borders():
    # a chain of points eps apart (one cluster through transitivity) plus
    # border points hanging off both ends
    x = np.concatenate([np.arange(20) * 0.9, [-1.0, 20 * 0.9 + 0.05]])
    valid = np.ones(len(x), bool)
    _compare_1d(x, valid, eps=1.0, min_samples=3)


def test_dbscan_1d_all_noise_and_duplicates():
    x = np.array([0.0, 0.0, 0.0, 5.0, 9.0, 9.0])
    valid = np.ones(6, bool)
    _compare_1d(x, valid, eps=0.5, min_samples=3)
    # shuffled input (exercises the sort/scatter round trip)
    rng = np.random.default_rng(5)
    xs = np.concatenate([0.001 * rng.standard_normal(40),
                         3.0 + 0.001 * rng.standard_normal(7),
                         rng.uniform(5, 6, 10)])
    perm = rng.permutation(len(xs))
    _compare_1d(xs[perm], np.ones(len(xs), bool), eps=0.01, min_samples=5)
