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
