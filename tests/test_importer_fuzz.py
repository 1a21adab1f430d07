"""Torch-checkpoint import robustness (VERDICT r4 #8).

The released css.pt/deepsdf.pt are not present in this environment
(README caveat — value parity stays expected-but-unverified); what CAN
be closed offline is FORMAT robustness: the permutations real released
checkpoints arrive with — nn.DataParallel 'module.' prefixes
(reference workspace.py:176-180), fp16 tensors (workspace.py:191-195),
extra keys (samples_per_scene, BatchNorm num_batches_tracked, the dead
layer4 weights QUIRKS #12), and {'model_state_dict': ...} containers —
must all import to IDENTICAL parameters, and missing keys must fail
loudly rather than silently zero-init.
"""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdflabel_tpu.models import css as css_mod
from sdflabel_tpu.models import deepsdf

from conftest import add_reference_paths

torch = pytest.importorskip("torch")
add_reference_paths()


DSDF_CFG = deepsdf.DeepSDFConfig(
    latent_size=3, dims=(32, 32, 32, 32), norm_layers=(0, 1, 2, 3),
    latent_in=(2,), weight_norm=True,
)


def _tree_equal(a, b, atol=0.0):
    la, sa = jax.tree.flatten(a)[0], jax.tree.structure(a)
    lb, sb = jax.tree.flatten(b)[0], jax.tree.structure(b)
    assert sa == sb, f"pytree structure differs: {sa} vs {sb}"
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=0, atol=atol)


def _write_dsdf(tmp_path, name, state_obj):
    torch.save(state_obj, tmp_path / f"{name}.pt")
    (tmp_path / f"{name}.json").write_text(json.dumps({
        "CodeLength": DSDF_CFG.latent_size,
        "NetworkArch": "deep_sdf_decoder_scale",
        "NetworkSpecs": {
            "dims": list(DSDF_CFG.dims),
            "norm_layers": list(DSDF_CFG.norm_layers),
            "latent_in": list(DSDF_CFG.latent_in),
            "weight_norm": True,
        },
    }))
    return str(tmp_path / f"{name}.pt")


@pytest.fixture(scope="module")
def dsdf_base():
    params = deepsdf.init_params(DSDF_CFG, jax.random.PRNGKey(0))
    state_np = deepsdf.torch_state_from_params(DSDF_CFG, params)
    state = {k: torch.from_numpy(np.asarray(v).copy())
             for k, v in state_np.items()}
    return params, state


DSDF_CASES = ["plain", "container", "dataparallel", "fp16",
              "extra_keys", "dp_fp16_container_extra"]


@pytest.mark.parametrize("case", DSDF_CASES)
def test_deepsdf_import_permutations(tmp_path, dsdf_base, case):
    params, state = dsdf_base
    fp16 = "fp16" in case
    s = dict(state)
    if fp16:
        s = {k: v.half() for k, v in s.items()}
    if "dataparallel" in case or case.startswith("dp_"):
        s = {"module." + k: v for k, v in s.items()}
    if "extra" in case:
        s["samples_per_scene"] = torch.tensor(8)
        s["module.samples_per_scene" if case.startswith("dp_")
          else "samples_per_scene_2"] = torch.tensor(16)
    obj = s
    if "container" in case:
        obj = {"epoch": 7, "model_state_dict": s}

    path = _write_dsdf(tmp_path, case, obj)
    cfg2, params2 = deepsdf.load_torch_checkpoint(path)
    assert cfg2 == DSDF_CFG
    # every imported leaf is fp32 working precision
    for leaf in jax.tree.leaves(params2):
        assert leaf.dtype == jnp.float32
    if fp16:
        # exact equality to the fp16-quantized base
        expect = jax.tree.map(
            lambda x: np.asarray(x).astype(np.float16).astype(np.float32),
            params)
        _tree_equal(params2, expect)
    else:
        _tree_equal(params2, params)


def test_deepsdf_import_missing_key_fails(tmp_path, dsdf_base):
    _params, state = dsdf_base
    s = dict(state)
    del s["lin0.weight_v"]
    path = _write_dsdf(tmp_path, "missing", s)
    with pytest.raises(KeyError):
        deepsdf.load_torch_checkpoint(path)


def test_deepsdf_setup_dsdf_fp16_checkpoint(tmp_path, dsdf_base):
    """setup_dsdf on an fp16-saved checkpoint with bf16 requested: the
    double conversion (stored fp16 -> fp32 -> bf16) must be finite and
    close to the base."""
    from sdflabel_tpu.models import deepsdf_workspace as ws

    params, state = dsdf_base
    s = {k: v.half() for k, v in state.items()}
    path = _write_dsdf(tmp_path, "fp16ws", {"model_state_dict": s})
    cfg2, params2, lat = ws.setup_dsdf(path, precision="float16")
    assert lat == 3
    for leaf in jax.tree.leaves(params2):
        assert leaf.dtype == jnp.bfloat16
        assert np.isfinite(np.asarray(leaf, np.float32)).all()


# --------------------------- CSS permutations ---------------------------

from networks.resnet_css import resnet18 as ref_resnet18  # noqa: E402


@pytest.fixture(scope="module")
def css_base():
    torch.manual_seed(1)
    ref = ref_resnet18(pretrained=False).eval()
    state = ref.state_dict()
    variables = css_mod.params_from_torch_state(state)
    return ref, state, variables


def test_css_base_state_has_dead_and_counter_keys(css_base):
    """The REAL reference state dict already carries the permutation
    content: layer4 dead weights (QUIRKS #12) and BatchNorm
    num_batches_tracked counters — the importer must ignore both (they
    must not leak into the pytree)."""
    _ref, state, variables = css_base
    assert any(k.startswith("layer4") for k in state)
    assert any(k.endswith("num_batches_tracked") for k in state)
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    paths = ["/".join(str(p) for p in kp) for kp, _ in flat]
    assert not any("layer4" in p for p in paths)
    assert not any("num_batches" in p for p in paths)


def test_css_dataparallel_import_matches(css_base):
    _ref, state, variables = css_base
    wrapped = {"module." + k: v for k, v in state.items()}
    v2 = css_mod.params_from_torch_state(wrapped)
    _tree_equal(v2, variables)


def test_css_fp16_import_is_fp32_and_close(css_base):
    ref, state, variables = css_base
    half = {k: (v.half() if torch.is_floating_point(v) else v)
            for k, v in state.items()}
    v2 = css_mod.params_from_torch_state(half)
    for leaf in jax.tree.leaves(v2):
        assert leaf.dtype == jnp.float32
    expect = jax.tree.map(
        lambda x: np.asarray(x).astype(np.float16).astype(np.float32),
        variables)
    _tree_equal(v2, expect)


def test_css_missing_key_fails(css_base):
    _ref, state, _variables = css_base
    s = {k: v for k, v in state.items() if k != "conv1.weight"}
    with pytest.raises(KeyError):
        css_mod.params_from_torch_state(s)


def test_css_extra_keys_ignored(css_base):
    _ref, state, variables = css_base
    s = dict(state)
    s["totally_unknown.weight"] = torch.zeros(3)
    v2 = css_mod.params_from_torch_state(s)
    _tree_equal(v2, variables)
