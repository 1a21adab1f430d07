"""On-device NN (ops/knn.py) vs sklearn KDTree (the reference's backend,
optimizer.py:180-181, pose.py:136-137) and eval constants vs the reference's
pipelines/constants.py tensors."""

import numpy as np
import jax.numpy as jnp
import pytest

from sdflabel_tpu.ops import knn

from conftest import add_reference_paths


def test_pairwise_sq_dists_matches_numpy():
    rng = np.random.RandomState(0)
    a = rng.randn(60, 3).astype(np.float32)
    b = rng.randn(80, 3).astype(np.float32)
    got = np.asarray(knn.pairwise_sq_dists(jnp.asarray(a), jnp.asarray(b)))
    expect = ((a[:, None] - b[None]) ** 2).sum(-1)
    np.testing.assert_allclose(got, expect, atol=1e-4)
    assert (got >= 0).all()


def test_nearest_neighbor_matches_kdtree():
    sklearn = pytest.importorskip("sklearn.neighbors")
    rng = np.random.RandomState(1)
    data = rng.randn(500, 3).astype(np.float32) * 4
    query = rng.randn(200, 3).astype(np.float32) * 4
    dist, idx = knn.nearest_neighbor(jnp.asarray(query), jnp.asarray(data))
    tree = sklearn.KDTree(data)
    ref_dist, ref_idx = tree.query(query, k=1)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx[:, 0])
    np.testing.assert_allclose(np.asarray(dist), ref_dist[:, 0], atol=1e-4)


def test_nearest_neighbor_mask_excludes_points():
    rng = np.random.RandomState(2)
    data = rng.randn(50, 3).astype(np.float32)
    query = data[:10] + 1e-4  # nearest unmasked is the point itself
    mask = np.ones(50, bool)
    mask[:10] = False  # exclude the trivial matches
    dist, idx = knn.nearest_neighbor(
        jnp.asarray(query), jnp.asarray(data), jnp.asarray(mask)
    )
    assert (np.asarray(idx) >= 10).all()
    assert (np.asarray(dist) > 1e-3).all()


def test_eval_constants_match_reference():
    pytest.importorskip("torch")
    add_reference_paths()
    import importlib

    ref = importlib.import_module("pipelines.constants")
    from sdflabel_tpu.eval import constants as ours

    assert ours.KITTI_CLASS_NAMES == ref.KITTI_CLASS_NAMES
    np.testing.assert_array_equal(
        ours.KITTI_OVERLAP_THRESHOLDS, ref.KITTI_OVERLAP_THRESHOLDS
    )
    np.testing.assert_array_equal(
        ours.NU_OVERLAP_THRESHOLDS, ref.NU_OVERLAP_THRESHOLDS
    )
