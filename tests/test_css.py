"""CSS network: golden parity vs reference resnet_css (torch CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdflabel_tpu.models import css

from conftest import add_reference_paths

torch = pytest.importorskip("torch")
add_reference_paths()

from networks.resnet_css import resnet18 as ref_resnet18  # noqa: E402


@pytest.fixture(scope="module")
def ref_and_ours():
    torch.manual_seed(0)
    ref = ref_resnet18(pretrained=False).eval()
    variables = css.params_from_torch_state(ref.state_dict())
    return ref, variables


def test_forward_parity(ref_and_ours):
    ref, variables = ref_and_ours
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 128, 128).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x))
    model = css.CSSNet(use_running_average=True)
    out = model.apply(variables, jnp.asarray(x))

    for key, atol in [("latent", 1e-4), ("mask", 1e-3), ("u", 1e-3),
                      ("v", 1e-3), ("w", 1e-3)]:
        np.testing.assert_allclose(
            np.asarray(out[key]), out_ref[key].numpy(), atol=atol,
            err_msg=key,
        )
    # expected-color decodings accumulate softmax error; compare loosely
    for key, atol in [("uvw_sm", 0.1), ("mask_sm", 1e-3),
                      ("uvw_sm_masked", 0.1)]:
        np.testing.assert_allclose(
            np.asarray(out[key]), out_ref[key].numpy(), atol=atol,
            err_msg=key,
        )


def test_latent_on_unit_sphere(ref_and_ours):
    _, variables = ref_and_ours
    rng = np.random.RandomState(1)
    x = rng.randn(3, 3, 128, 128).astype(np.float32)
    out = css.CSSNet().apply(variables, jnp.asarray(x))
    norms = np.linalg.norm(np.asarray(out["latent"]), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_train_mode_runs(ref_and_ours):
    _, variables = ref_and_ours
    rng = np.random.RandomState(2)
    x = rng.randn(2, 3, 128, 128).astype(np.float32)
    model = css.CSSNet(use_running_average=False)
    out, updates = model.apply(
        variables, jnp.asarray(x), mutable=["batch_stats"]
    )
    assert out["uvw_sm"].shape == (2, 3, 128, 128)
    assert "batch_stats" in updates


def test_mixed_precision_forward_close(ref_and_ours):
    """dtype=bfloat16 (conv compute only; params/BN/heads fp32) tracks the
    fp32 forward: same params, logits within bf16 accumulation tolerance,
    outputs still fp32."""
    _, variables = ref_and_ours
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 3, 128, 128).astype(np.float32))
    out32 = css.CSSNet(use_running_average=True).apply(variables, x)
    outbf = css.CSSNet(use_running_average=True,
                       dtype=jnp.bfloat16).apply(variables, x)
    assert np.asarray(outbf["u"]).dtype == np.float32
    np.testing.assert_allclose(np.asarray(outbf["latent"]),
                               np.asarray(out32["latent"]), atol=2e-2)
    # log-softmax logits: compare where either is non-negligible
    for key in ("u", "v", "w", "mask"):
        a, b = np.asarray(outbf[key]), np.asarray(out32[key])
        denom = np.maximum(np.abs(b), 1.0)
        assert np.median(np.abs(a - b) / denom) < 0.1, key
    # expected-color decode (the product output): within a few color bins
    assert np.median(np.abs(np.asarray(outbf["uvw_sm"])
                            - np.asarray(out32["uvw_sm"]))) < 8.0


def test_mixed_precision_train_step(ref_and_ours):
    """A bf16-compute train step runs, yields finite fp32 losses, and
    decreases the loss on a repeated batch."""
    from sdflabel_tpu.engine import css_train

    rng = np.random.RandomState(4)
    model = css.CSSNet(use_running_average=False, dtype=jnp.bfloat16,
                       width=8)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((2, 3, 64, 64)))
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
    state = css_train.init_train_state(variables, lr=1e-3)
    step = jax.jit(css_train.make_train_step(1e-3, model=model))
    batch = {
        "rgb": jnp.asarray(rng.rand(2, 3, 64, 64), jnp.float32),
        "uvw": jnp.asarray(rng.randint(0, 256, (2, 3, 64, 64))),
        "mask": jnp.asarray(rng.randint(0, 2, (2, 64, 64))),
        "latent": jnp.asarray(rng.rand(2, 3), jnp.float32),
    }
    state, m0 = step(state, batch)
    for _ in range(6):
        state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
    assert float(m["loss"]) < float(m0["loss"])


def test_trainable_mask_freezes_early_layers(ref_and_ours):
    _, variables = ref_and_ours
    mask = css.trainable_mask(variables["params"])
    flat = jax.tree.map(lambda x: x, mask)
    assert not jax.tree.leaves(flat["conv1"])[0]
    assert not jax.tree.leaves(flat["layer1_0"])[0]
    assert all(jax.tree.leaves(flat["layer2_0"]))
    assert all(jax.tree.leaves(flat["out_u"]))


def test_upsample_align_corners_matches_torch():
    rng = np.random.RandomState(3)
    x = rng.randn(1, 5, 7, 4).astype(np.float32)
    ours = np.asarray(css.upsample2x_align_corners(jnp.asarray(x)))
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    ref = torch.nn.functional.interpolate(
        xt, scale_factor=2, mode="bilinear", align_corners=True
    ).numpy()
    np.testing.assert_allclose(
        np.transpose(ours, (0, 3, 1, 2)), ref, atol=1e-5
    )
