"""Fused Pallas splat kernel vs the dense oracle: values + gradients.

On CPU the kernel runs in interpreter mode (pltpu.force_tpu_interpret_mode);
on a real TPU the same tests compile (set SDFLABEL_TEST_TPU=1).
"""

import contextlib

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdflabel_tpu.ops import splat as splat_ops
from sdflabel_tpu.ops import splat_pallas
from sdflabel_tpu.renderer.rasterer import calibration_matrix


def _interpret_ctx():
    if jax.default_backend() == "tpu":
        return contextlib.nullcontext()
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.force_tpu_interpret_mode()


def _scene(n=300, seed=0, res=(32, 24)):
    rng = np.random.RandomState(seed)
    pts = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    pts[:, 2] += 4.0
    normals = rng.randn(n, 3).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    feats = rng.uniform(0, 1, (n, 8)).astype(np.float32)
    K = calibration_matrix(res).astype(np.float32)
    grid = splat_ops.pixel_grid(*res)
    kinv = np.linalg.inv(K)
    kg = np.concatenate(
        [np.asarray(grid), np.ones((grid.shape[0], 1), np.float32)], 1
    ) @ kinv.T
    mask = np.ones(n, bool)
    mask[-40:] = False
    return pts, normals, feats, K, grid, kg.astype(np.float32), mask


def _dense_composite(K, grid, pts, normals, feats, mask):
    prob = splat_ops.splat_surfel(
        jnp.asarray(K), grid, jnp.asarray(pts), jnp.asarray(normals),
        point_mask=jnp.asarray(mask), diam=0.04, softclamp=False,
        add_bg=False,
    )
    return prob.T @ jnp.asarray(feats)


def test_forward_matches_dense():
    pts, normals, feats, K, grid, kg, mask = _scene()
    dense = np.asarray(_dense_composite(K, grid, pts, normals, feats, mask))
    with _interpret_ctx():
        fused = splat_pallas.surfel_composite(
            jnp.asarray(pts), jnp.asarray(normals), jnp.asarray(feats),
            jnp.asarray(kg), point_mask=jnp.asarray(mask), diam=0.04,
            block_px=256,
        )
    fused = np.asarray(fused)
    # boundary pixels where the footprint bit can flip between the exact
    # and expanded distance forms
    mismatch = np.abs(fused - dense).max(axis=-1)
    ok = mismatch < 2e-4
    assert ok.mean() > 0.995, (1 - ok.mean(), mismatch.max())
    np.testing.assert_allclose(fused[ok], dense[ok], atol=2e-4)


def test_forward_no_mask_and_padding():
    pts, normals, feats, K, grid, kg, _ = _scene(n=200, seed=2)
    dense = np.asarray(_dense_composite(K, grid, pts, normals, feats,
                                        np.ones(200, bool)))
    with _interpret_ctx():
        fused = np.asarray(splat_pallas.surfel_composite(
            jnp.asarray(pts), jnp.asarray(normals), jnp.asarray(feats),
            jnp.asarray(kg), point_mask=None, diam=0.04, block_px=128,
        ))
    ok = np.abs(fused - dense).max(axis=-1) < 2e-4
    assert ok.mean() > 0.995


def test_gradients_match_dense():
    pts, normals, feats, K, grid, kg, mask = _scene(n=220, seed=3)

    def loss_dense(pts_j, normals_j, feats_j):
        img = _dense_composite(K, grid, pts_j, normals_j, feats_j, mask)
        return jnp.sum(img**2) + jnp.sum(img)

    def loss_fused(pts_j, normals_j, feats_j):
        img = splat_pallas.surfel_composite(
            pts_j, normals_j, feats_j, jnp.asarray(kg),
            point_mask=jnp.asarray(mask), diam=0.04, block_px=256,
        )
        return jnp.sum(img**2) + jnp.sum(img)

    args = (jnp.asarray(pts), jnp.asarray(normals), jnp.asarray(feats))
    ld, gd = jax.value_and_grad(loss_dense, argnums=(0, 1, 2))(*args)
    with _interpret_ctx():
        lf, gf = jax.value_and_grad(loss_fused, argnums=(0, 1, 2))(*args)

    np.testing.assert_allclose(float(lf), float(ld), rtol=1e-3)
    for a, b, name in zip(gf, gd, ("pts", "normals", "feats")):
        a, b = np.asarray(a), np.asarray(b)
        denom = np.maximum(np.abs(b).max(), 1e-6)
        close = np.abs(a - b) / denom < 5e-3
        assert close.mean() > 0.99, (name, (1 - close.mean()))


def test_empty_surface_is_zero():
    pts, normals, feats, K, grid, kg, _ = _scene(n=100, seed=4)
    mask = np.zeros(100, bool)
    with _interpret_ctx():
        fused = np.asarray(splat_pallas.surfel_composite(
            jnp.asarray(pts), jnp.asarray(normals), jnp.asarray(feats),
            jnp.asarray(kg), point_mask=jnp.asarray(mask), block_px=128,
        ))
    assert np.all(fused == 0)

def test_binned_matches_dense_kernel():
    """Row-binned sparse path == dense pallas sweep (values + grads).

    The binned kernels evaluate the exact footprint test on every visited
    pair, so only reduction order may differ (online-softmax
    reassociation); differences must stay at fp32 reassociation scale.
    Also covers degenerate points (behind-camera -> conservative
    full-window fallback) and masked points.
    """
    pts, normals, feats, K, grid, kg, mask = _scene(n=520, seed=5)
    # a few pathological points: behind the camera / straddling z=0
    pts[:4, 2] = np.array([-3.0, -0.01, 0.02, 0.0], np.float32)

    def loss(pts_j, normals_j, feats_j, bin_px):
        img = splat_pallas.surfel_composite(
            pts_j, normals_j, feats_j, jnp.asarray(kg),
            point_mask=jnp.asarray(mask), diam=0.04, block_px=256,
            bin_px=bin_px,
        )
        return jnp.sum(img**2) + jnp.sum(img), img

    args = (jnp.asarray(pts), jnp.asarray(normals), jnp.asarray(feats))
    with _interpret_ctx():
        (ld, img_d), gd = jax.value_and_grad(
            lambda *a: loss(*a, 0), argnums=(0, 1, 2), has_aux=True)(*args)
        (lb, img_b), gb = jax.value_and_grad(
            lambda *a: loss(*a, 128), argnums=(0, 1, 2), has_aux=True)(*args)

    np.testing.assert_allclose(np.asarray(img_b), np.asarray(img_d),
                               atol=2e-6)
    np.testing.assert_allclose(float(lb), float(ld), rtol=1e-5)
    for a, b, name in zip(gb, gd, ("pts", "normals", "feats")):
        a, b = np.asarray(a), np.asarray(b)
        denom = np.maximum(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(a / denom, b / denom, atol=2e-5,
                                   err_msg=name)


def test_binned_tiny_render_falls_back():
    # < 2 row-blocks: the wrapper must silently use the dense sweep
    pts, normals, feats, K, grid, kg, mask = _scene(n=64, seed=6,
                                                    res=(8, 8))
    with _interpret_ctx():
        out = np.asarray(splat_pallas.surfel_composite(
            jnp.asarray(pts), jnp.asarray(normals), jnp.asarray(feats),
            jnp.asarray(kg), point_mask=jnp.asarray(mask), bin_px=128,
        ))
    assert out.shape == (64, 8)
