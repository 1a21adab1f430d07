"""Fused Pallas cross-entropy kernel (ops/ce_pallas.py).

On CPU the kernel runs in interpreter mode; on a real TPU the same tests
compile. Checks: value parity and GRADIENT parity vs the jnp
cross_entropy_with_internal_softmax path (the analytic softmax-one_hot
backward must match autodiff through log_softmax), the shape contract,
and the css_losses fused_ce integration (including the masked
double-log-softmax quirk inputs).
"""

import contextlib

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdflabel_tpu.engine import css_train
from sdflabel_tpu.ops import ce_pallas


def _interpret_ctx():
    if jax.default_backend() == "tpu":
        return contextlib.nullcontext()
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.force_tpu_interpret_mode()


@pytest.mark.parametrize("c,dtype", [(256, jnp.float32), (2, jnp.float32),
                                     (256, jnp.bfloat16)])
def test_value_and_grad_parity(c, dtype):
    rng = np.random.RandomState(0)
    b, h, w = 2, 16, 128
    logits = jnp.asarray(rng.randn(b, c, h, w) * 3, dtype)
    targets = jnp.asarray(rng.randint(0, c, (b, h, w)), jnp.int32)
    assert ce_pallas.supported(logits.shape, targets.shape)

    ref_fn = lambda x: css_train.cross_entropy_with_internal_softmax(
        x, targets)
    want, dwant = jax.value_and_grad(ref_fn)(logits)
    with _interpret_ctx():
        got, dgot = jax.value_and_grad(
            lambda x: ce_pallas.fused_cross_entropy(x, targets))(logits)
    # bf16 inputs: the jnp path log-softmaxes IN bf16, the kernel upcasts
    # to f32 first — the kernel is the more accurate of the two; compare
    # at bf16 resolution there.
    np.testing.assert_allclose(float(got), float(want),
                               rtol=(2e-6 if dtype == jnp.float32 else 2e-3))
    assert dgot.dtype == logits.dtype
    np.testing.assert_allclose(
        np.asarray(dgot, np.float32), np.asarray(dwant, np.float32),
        atol=(1e-8 if dtype == jnp.float32 else 1e-6))


def test_upstream_cotangent_scaling():
    """The custom bwd must scale by the upstream cotangent (loss is summed
    with other terms, so g != 1 in production)."""
    rng = np.random.RandomState(1)
    logits = jnp.asarray(rng.randn(1, 8, 8, 128), jnp.float32)
    targets = jnp.asarray(rng.randint(0, 8, (1, 8, 128)), jnp.int32)
    with _interpret_ctx():
        g1 = jax.grad(
            lambda x: 3.5 * ce_pallas.fused_cross_entropy(x, targets))(
                logits)
        g0 = jax.grad(
            lambda x: ce_pallas.fused_cross_entropy(x, targets))(logits)
    np.testing.assert_allclose(np.asarray(g1), 3.5 * np.asarray(g0),
                               rtol=1e-6)


def test_supported_contract():
    assert ce_pallas.supported((2, 256, 128, 128), (2, 128, 128))
    assert not ce_pallas.supported((2, 256, 127, 128), (2, 127, 128))
    assert not ce_pallas.supported((2, 256, 128, 64), (2, 128, 64))
    assert not ce_pallas.supported((2, 256, 128, 128), (2, 128, 127))
    assert not ce_pallas.supported((2, 256, 128), (2, 128))


def test_css_losses_fused_matches_plain():
    """Production integration: css_losses(fused_ce=True) equals the plain
    path on real head shapes (already-log-softmaxed, mask-multiplied
    inputs — the double-log-softmax quirk)."""
    rng = np.random.RandomState(2)
    b, h, w = 2, 16, 128
    heads = rng.randn(b, 3, 256, h, w).astype(np.float32)
    logsm = jax.nn.log_softmax(jnp.asarray(heads), axis=2)
    pred = {
        "u": logsm[:, 0], "v": logsm[:, 1], "w": logsm[:, 2],
        "mask": jnp.asarray(rng.randn(b, 2, h, w), jnp.float32),
        "latent": jnp.asarray(rng.randn(b, 3), jnp.float32),
    }
    batch = {
        "uvw": jnp.asarray(rng.randint(0, 256, (b, 3, h, w))),
        "mask": jnp.asarray(rng.randint(0, 2, (b, h, w))),
        "latent": jnp.asarray(rng.randn(b, 3), jnp.float32),
    }
    plain = css_train.css_losses(pred, batch, fused_ce=False)
    with _interpret_ctx():
        fused = css_train.css_losses(pred, batch, fused_ce=True)
    for k in plain:
        np.testing.assert_allclose(
            float(fused[k]), float(plain[k]), rtol=3e-5,
            err_msg=f"loss term {k}")


def test_shard_train_step_rejects_fused_ce_on_multi_device_mesh():
    """The Pallas CE kernel has no partitioning rule: sharding a
    fused_ce=True step over a >1-device mesh must fail loudly, not
    mis-partition (css_train.shard_train_step guard)."""
    import pytest

    from sdflabel_tpu.engine import css_train
    from sdflabel_tpu.parallel import mesh as mesh_mod

    mesh = mesh_mod.make_mesh(n_data=8)
    step = css_train.make_train_step(1e-3, fused_ce=True)
    with pytest.raises(ValueError, match="fused_ce"):
        css_train.shard_train_step(step, mesh)
    # fused_ce=False shards fine; 1-device mesh accepts fused_ce
    import jax

    css_train.shard_train_step(css_train.make_train_step(1e-3), mesh)
    css_train.shard_train_step(
        step, mesh_mod.make_mesh(n_data=1, devices=jax.devices()[:1]))
