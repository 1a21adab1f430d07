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


def _jnp_nn(query, data, mask=None):
    """The exact jnp oracle the fused kernel must reproduce (knn.py's
    non-TPU branch with inf masking)."""
    d2 = sum(jnp.square(jnp.asarray(query)[:, None, c]
                        - jnp.asarray(data)[None, :, c]) for c in range(3))
    if mask is not None:
        d2 = jnp.where(jnp.asarray(mask)[None, :], d2, jnp.inf)
    idx = jnp.argmin(d2, axis=-1)
    return np.sqrt(np.asarray(jnp.min(d2, axis=-1))), np.asarray(idx)


def test_nn_pallas_matches_jnp_oracle():
    """Fused streaming min/argmin kernel (ops/nn_pallas.py, the TPU
    production path for the 3D-loss NN) vs the jnp oracle in interpret
    mode: values bit-class-equal, FIRST-min tie-breaking, masked columns,
    ragged (padded) shapes."""
    from jax.experimental.pallas import tpu as pltpu

    from sdflabel_tpu.ops import nn_pallas

    rng = np.random.RandomState(3)
    for n, m in ((200, 300), (256, 512), (4096, 1000), (7, 130)):
        q = rng.randn(n, 3).astype(np.float32) * 3
        d = rng.randn(m, 3).astype(np.float32) * 3
        mask = rng.rand(m) > 0.3
        with pltpu.force_tpu_interpret_mode():
            dist, idx = nn_pallas.nearest_neighbor_fused(
                jnp.asarray(q), jnp.asarray(d), jnp.asarray(mask))
        rd, ri = _jnp_nn(q, d, mask)
        np.testing.assert_array_equal(np.asarray(idx), ri,
                                      err_msg=f"{n}x{m}")
        np.testing.assert_allclose(np.asarray(dist), rd, rtol=1e-6,
                                   err_msg=f"{n}x{m}")


def test_nn_pallas_ties_and_degenerate():
    from jax.experimental.pallas import tpu as pltpu

    from sdflabel_tpu.ops import nn_pallas

    # exact duplicate data points -> FIRST index must win (jnp.argmin
    # semantics), including duplicates across chunk boundaries
    d = np.zeros((700, 3), np.float32)
    d[:] = [1.0, 2.0, 3.0]
    q = np.asarray([[1.0, 2.0, 3.0], [0.0, 0.0, 0.0]], np.float32)
    with pltpu.force_tpu_interpret_mode():
        dist, idx = nn_pallas.nearest_neighbor_fused(
            jnp.asarray(q), jnp.asarray(d))
    np.testing.assert_array_equal(np.asarray(idx), [0, 0])
    np.testing.assert_allclose(np.asarray(dist)[0], 0.0)

    # fully-masked data: index 0, distance astronomically large (the
    # documented 1e15 sentinel -- fails every `dist < threshold` use)
    mask = np.zeros(700, bool)
    with pltpu.force_tpu_interpret_mode():
        dist, idx = nn_pallas.nearest_neighbor_fused(
            jnp.asarray(q), jnp.asarray(d), jnp.asarray(mask))
    np.testing.assert_array_equal(np.asarray(idx), [0, 0])
    assert (np.asarray(dist) > 1e12).all()


def test_nn_pallas_under_vmap():
    """parallel.batched_refine vmaps the 3D loss over crops — the kernel
    must batch correctly (pallas_call prepends a grid axis)."""
    import jax
    from jax.experimental.pallas import tpu as pltpu

    from sdflabel_tpu.ops import nn_pallas

    rng = np.random.RandomState(4)
    q = rng.randn(3, 64, 3).astype(np.float32)
    d = rng.randn(3, 150, 3).astype(np.float32)
    mask = rng.rand(3, 150) > 0.2
    with pltpu.force_tpu_interpret_mode():
        dist, idx = jax.vmap(nn_pallas.nearest_neighbor_fused)(
            jnp.asarray(q), jnp.asarray(d), jnp.asarray(mask))
    for b in range(3):
        rd, ri = _jnp_nn(q[b], d[b], mask[b])
        np.testing.assert_array_equal(np.asarray(idx)[b], ri)
        np.testing.assert_allclose(np.asarray(dist)[b], rd, rtol=1e-6)


def test_nn_pallas_zero_cotangent_under_grad():
    """The kernel is non-differentiable by contract (callers stop-gradient
    its inputs; the reference's KDTree carries no grads either) — under
    value_and_grad it must yield zero cotangents, not a trace error."""
    import jax
    from jax.experimental.pallas import tpu as pltpu

    from sdflabel_tpu.ops import nn_pallas

    rng = np.random.RandomState(5)
    q = jnp.asarray(rng.randn(32, 3), jnp.float32)
    d = jnp.asarray(rng.randn(64, 3), jnp.float32)

    def f(q, d):
        dist, _ = nn_pallas.nearest_neighbor_fused(q, d)
        return jnp.sum(dist)

    with pltpu.force_tpu_interpret_mode():
        val, grads = jax.value_and_grad(f, argnums=(0, 1))(q, d)
    assert np.isfinite(float(val))
    assert float(jnp.abs(grads[0]).sum()) == 0.0
    assert float(jnp.abs(grads[1]).sum()) == 0.0


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
