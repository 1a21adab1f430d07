"""Crops-DB generator: layout parity with data.crops.Crops and trainability.

The generator (pipelines.make_crops) must produce exactly what the crops
reader — and the reference's datasets/crops.py:17-30 — consumes:
crops.json + {idx:05d}_rgb.png/_uvw.png pairs whose mask convention is
uvw.sum(0) > 0 (crops.py:71).
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdflabel_tpu.pipelines import make_crops as mc


def sphere_decoder(latent, points):
    """Analytic distance-like SDF: radius modulated by the first latent."""
    r = 0.75 + 0.1 * latent[0]
    return jnp.linalg.norm(points, axis=-1) - r


@pytest.fixture(scope="module")
def crops_out(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("synth_crops"))
    latents = mc.sample_unit_latents(4, 3, np.random.RandomState(1))
    mc.make_crops(out, sphere_decoder, latents, n_crops=6, crop_px=96,
                  grid_density=24, capacity=1024, seed=0,
                  latent_jitter=0.05)
    return out


def test_layout_and_reader_roundtrip(crops_out):
    from sdflabel_tpu.data.crops import Crops

    with open(os.path.join(crops_out, "crops.json")) as f:
        db = json.load(f)
    assert len(db) == 6
    for idx in range(6):
        entry = db[str(idx)][0]
        assert len(entry["latent"]) == 3
        assert len(entry["extrinsics"]) == 16
        assert len(entry["intrinsics"]) == 9
        assert os.path.exists(os.path.join(crops_out, f"{idx:05d}_rgb.png"))
        assert os.path.exists(os.path.join(crops_out, f"{idx:05d}_uvw.png"))

    ds = Crops(crops_out, augment=False)
    s = ds[0]
    assert s["rgb"].shape == (3, 128, 128)
    assert s["uvw"].shape == (3, 128, 128)
    # object visible and background present
    assert 0 < s["mask"].sum() < 128 * 128
    np.testing.assert_array_equal(s["mask"], (s["uvw"].sum(0) > 0))
    assert s["pose"].shape == (4, 4)
    assert s["intrinsics"].shape == (3, 3)
    # unit-sphere latents survive the json roundtrip
    assert np.linalg.norm(s["latent"]) == pytest.approx(1.0, abs=1e-4)


def test_views_and_appearance_vary(crops_out):
    from PIL import Image

    rgbs = [np.asarray(Image.open(
        os.path.join(crops_out, f"{i:05d}_rgb.png"))) for i in range(3)]
    uvws = [np.asarray(Image.open(
        os.path.join(crops_out, f"{i:05d}_uvw.png"))) for i in range(3)]
    assert rgbs[0].shape == (96, 96, 3)
    # domain randomization: distinct appearance per crop
    assert not np.array_equal(rgbs[0], rgbs[1])
    assert not np.array_equal(uvws[0], uvws[1])
    # every on-object uvw pixel keeps the mask convention (no zero-sum holes)
    for uvw in uvws:
        obj = uvw.sum(-1) > 0
        assert obj.any()


def test_quantize_uvw_plugs_mask_holes():
    nocs = np.zeros((3, 4, 4), np.float32)  # NOCS at the origin corner
    mask = np.zeros((4, 4), bool)
    mask[1, 1] = True
    uvw = mc._quantize_uvw(nocs, mask)
    assert uvw[1, 1].sum() > 0  # hole plugged
    assert uvw[0, 0].sum() == 0  # background untouched


def test_latent_loaders(tmp_path):
    lat = mc.sample_unit_latents(5, 4, np.random.RandomState(0))
    np.testing.assert_allclose(np.linalg.norm(lat, axis=1), 1.0, atol=1e-6)

    npy = str(tmp_path / "codes.npy")
    np.save(npy, lat)
    np.testing.assert_allclose(mc.load_latents(npy, 4), lat)

    import torch

    pth = str(tmp_path / "codes.pth")
    torch.save({"epoch": 3, "latent_codes": torch.from_numpy(lat)}, pth)
    np.testing.assert_allclose(mc.load_latents(pth, 4), lat)

    with pytest.raises(ValueError):
        mc.load_latents(npy, 7)


def test_generated_crops_train_css(crops_out):
    from sdflabel_tpu.data.crops import Crops, batch_iterator
    from sdflabel_tpu.engine import css_train
    from sdflabel_tpu.models import css as css_mod

    ds = Crops(crops_out, augment=False)
    batch = next(batch_iterator(ds, 4, shuffle=False))
    batch = {k: jnp.asarray(v) for k, v in batch.items()
             if k in ("rgb", "uvw", "mask", "latent")}

    model = css_mod.CSSNet(use_running_average=False)
    variables = model.init(jax.random.PRNGKey(0), batch["rgb"][:1])
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
    state = css_train.init_train_state(variables, lr=1e-3)
    step = jax.jit(css_train.make_train_step(1e-3))
    state, m0 = step(state, batch)
    state, m1 = step(state, batch)
    assert np.isfinite(float(m0["loss"]))
    assert float(m1["loss"]) < float(m0["loss"])


def test_quantize_uvw_clips_out_of_range_nocs():
    """Composited NOCS slightly outside [0,1] (shapes beyond the unit
    cube / x-flip) must clip, not wrap around the uint8 cast."""
    nocs = np.full((3, 2, 2), -0.025, np.float32)
    nocs[:, 0, 0] = 1.04
    mask = np.ones((2, 2), bool)
    uvw = mc._quantize_uvw(nocs, mask)
    assert uvw.max() <= 255 and uvw[0, 0, 0] == 255
    # negative NOCS -> bin 0, then hole-plugged to 1 (NOT wrapped to ~250)
    assert (uvw[0, 1] <= 1).all() and (uvw[1, 1] <= 1).all()


def test_latent_jitter_preserves_norm():
    """Trained latent tables are not unit-norm; jitter must stay at the
    entry's original norm instead of projecting onto the sphere."""
    rng = np.random.RandomState(0)
    lat = np.array([0.6, 0.0, 0.0], np.float32)  # norm 0.6
    for _ in range(5):
        z = mc._jitter_latent(lat, rng, 0.05)
        assert np.linalg.norm(z) == pytest.approx(0.6, rel=1e-5)
        assert not np.allclose(z, lat)  # actually perturbed
