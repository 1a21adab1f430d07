"""DeepSDF decoder: parity vs reference torch implementation."""

import numpy as np
import jax.numpy as jnp
import pytest

from sdflabel_tpu.models import deepsdf

from conftest import add_reference_paths

torch = pytest.importorskip("torch")
add_reference_paths()

from deepsdf.networks.deep_sdf_decoder_scale import Decoder as RefDecoder  # noqa: E402


CONFIGS = [
    # (latent, dims, norm_layers, latent_in, weight_norm, xyz_in_all, use_tanh)
    dict(latent_size=3, dims=[64, 64, 64, 64], norm_layers=(0, 1, 2, 3),
         latent_in=(2,), weight_norm=True, xyz_in_all=False, use_tanh=False),
    dict(latent_size=8, dims=[32, 32, 32, 32, 32, 32, 32, 32],
         norm_layers=(0, 1, 2, 3, 4, 5, 6, 7), latent_in=(4,),
         weight_norm=True, xyz_in_all=False, use_tanh=True),
    dict(latent_size=4, dims=[48, 48, 48], norm_layers=(0, 1, 2),
         latent_in=(), weight_norm=False, xyz_in_all=True, use_tanh=False),
    dict(latent_size=4, dims=[48, 48], norm_layers=(), latent_in=(1,),
         weight_norm=False, xyz_in_all=False, use_tanh=False),
]


@pytest.mark.parametrize("ci", range(len(CONFIGS)))
def test_decoder_parity(ci):
    kw = CONFIGS[ci]
    torch.manual_seed(ci)
    ref = RefDecoder(
        kw["latent_size"],
        list(kw["dims"]),
        dropout=None,
        dropout_prob=0.0,
        norm_layers=tuple(kw["norm_layers"]),
        latent_in=tuple(kw["latent_in"]),
        weight_norm=kw["weight_norm"],
        xyz_in_all=kw["xyz_in_all"],
        use_tanh=kw["use_tanh"],
        latent_dropout=False,
    ).eval()

    cfg = deepsdf.DeepSDFConfig(
        latent_size=kw["latent_size"],
        dims=tuple(kw["dims"]),
        norm_layers=tuple(kw["norm_layers"]),
        latent_in=tuple(kw["latent_in"]),
        weight_norm=kw["weight_norm"],
        xyz_in_all=kw["xyz_in_all"],
        use_tanh=kw["use_tanh"],
    )
    params = deepsdf.params_from_torch_state(cfg, ref.state_dict())

    n = 257
    rng = np.random.RandomState(ci)
    latent = rng.randn(kw["latent_size"]).astype(np.float32)
    pts = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    inputs = np.concatenate([np.tile(latent, (n, 1)), pts], axis=1)

    with torch.no_grad():
        sdf_ref, scale_ref = ref(torch.from_numpy(inputs))
    sdf_ours, scale_ours = deepsdf.decode(
        cfg, params, jnp.asarray(latent), jnp.asarray(pts)
    )

    np.testing.assert_allclose(
        np.asarray(sdf_ours), sdf_ref.numpy().reshape(-1), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(scale_ours).reshape(-1), scale_ref.numpy().reshape(-1), atol=2e-5
    )


def test_from_specs():
    specs = {
        "CodeLength": 3,
        "NetworkSpecs": {
            "dims": [512] * 8,
            "dropout": [0, 1, 2, 3, 4, 5, 6, 7],
            "dropout_prob": 0.2,
            "norm_layers": [0, 1, 2, 3, 4, 5, 6, 7],
            "latent_in": [4],
            "xyz_in_all": False,
            "use_tanh": False,
            "latent_dropout": False,
            "weight_norm": True,
            "samples_per_scene": 8192,
        },
    }
    cfg = deepsdf.DeepSDFConfig.from_specs(specs)
    assert cfg.latent_size == 3
    assert cfg.num_layers == 10
    # layer 3 output shrinks by input dim for latent re-injection at 4
    assert cfg.layer_io(3) == (512, 512 - 6)
    assert cfg.layer_io(4) == (512, 512)
    assert cfg.layer_io(8) == (512, 1)


def test_torch_checkpoint_roundtrip(tmp_path):
    """setup_dsdf-style checkpoint (DataParallel prefix, epoch dict) loads."""
    kw = CONFIGS[0]
    torch.manual_seed(7)
    ref = RefDecoder(
        kw["latent_size"], list(kw["dims"]), dropout=None,
        norm_layers=tuple(kw["norm_layers"]), latent_in=tuple(kw["latent_in"]),
        weight_norm=kw["weight_norm"],
    ).eval()
    wrapped = torch.nn.DataParallel(ref) if torch.cuda.is_available() else ref
    state = {("module." + k if not torch.cuda.is_available() else k): v
             for k, v in ref.state_dict().items()}
    path = tmp_path / "net.pt"
    torch.save({"epoch": 3, "model_state_dict": state}, path)
    import json

    specs = {
        "CodeLength": kw["latent_size"],
        "NetworkArch": "deep_sdf_decoder_scale",
        "NetworkSpecs": {
            "dims": list(kw["dims"]),
            "norm_layers": list(kw["norm_layers"]),
            "latent_in": list(kw["latent_in"]),
            "weight_norm": kw["weight_norm"],
        },
    }
    (tmp_path / "net.json").write_text(json.dumps(specs))

    cfg, params = deepsdf.load_torch_checkpoint(str(path))
    rng = np.random.RandomState(0)
    latent = rng.randn(kw["latent_size"]).astype(np.float32)
    pts = rng.uniform(-1, 1, (65, 3)).astype(np.float32)
    inputs = np.concatenate([np.tile(latent, (65, 1)), pts], axis=1)
    with torch.no_grad():
        sdf_ref, _ = ref(torch.from_numpy(inputs))
    sdf_ours, _ = deepsdf.decode(cfg, params, jnp.asarray(latent), jnp.asarray(pts))
    np.testing.assert_allclose(np.asarray(sdf_ours), sdf_ref.numpy().reshape(-1),
                               atol=2e-5)
