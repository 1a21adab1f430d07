"""Fast (cv2/numpy) crops input backend vs the PIL parity path.

The fast backend (data/crops.py `Crops(fast=True)`) exists because the
PIL decode+augment chain is the measured CSS-training input bottleneck
(BENCH_NOTES round 5). Contract under test:

  * identical augmentation PARAMETER stream — both backends draw from
    the same per-(seed, epoch, idx) rng sequence, so jitter factors,
    rotation angle, and crop geometry match exactly;
  * pixels numerically CLOSE but not bit-equal (cv2 resampling /
    rounding differ at the LSB; documented, opt-in via
    [train] fast_input);
  * deterministic, cache-transparent, and identical across the sync /
    thread-prefetch / process-worker execution paths.

Reference behavioral target for the PIL path: crops.py:44-71.
"""

import json
import os
import random

import numpy as np
import pytest

from sdflabel_tpu.data.crops import (
    Crops,
    IMAGENET_STD,
    _color_jitter,
    _color_jitter_params,
    batch_iterator,
    prefetch_iterator,
)


@pytest.fixture(scope="module")
def smooth_db(tmp_path_factory):
    """Crops DB with SMOOTH content (gradients + a disc mask).

    Noise images make nearest-resample comparisons meaningless (any
    sub-pixel sampling offset flips every pixel); smooth content is
    what real crops look like and what the closeness contract covers.
    """
    from PIL import Image

    root = tmp_path_factory.mktemp("crops_smooth")
    n, px = 8, 96
    yy, xx = np.mgrid[0:px, 0:px].astype(np.float32) / px
    gt = {}
    eye4 = np.eye(4).reshape(-1).tolist()
    eye3 = np.eye(3).reshape(-1).tolist()
    rng = np.random.RandomState(3)
    for i in range(n):
        phase = rng.rand() * 2 * np.pi
        rgb = np.stack([
            0.5 + 0.5 * np.sin(2 * np.pi * xx + phase),
            yy,
            0.5 + 0.5 * np.cos(3 * np.pi * yy),
        ], -1)
        rgb = (rgb * 255).astype(np.uint8)
        disc = ((xx - 0.5) ** 2 + (yy - 0.5) ** 2) < 0.12
        uvw = np.stack([xx * 200 + 30, yy * 200 + 30,
                        np.full_like(xx, 128.0)], -1)
        uvw = (uvw * disc[..., None]).astype(np.uint8)
        Image.fromarray(rgb).save(os.path.join(root, f"{i:05d}_rgb.png"))
        Image.fromarray(uvw).save(os.path.join(root, f"{i:05d}_uvw.png"))
        lat = rng.randn(3)
        gt[str(i)] = [{"latent": (lat / np.linalg.norm(lat)).tolist(),
                       "extrinsics": eye4, "intrinsics": eye3}]
    with open(os.path.join(root, "crops.json"), "w") as f:
        json.dump(gt, f)
    return str(root)


def _rgb_01_diff(a, b):
    """Mean abs diff of two normalized (3,H,W) rgb tensors, in [0,1]
    pixel units (undo the ImageNet std scaling)."""
    return float((np.abs(a - b) * IMAGENET_STD.reshape(3, 1, 1)).mean())


def test_param_stream_shared():
    """PIL _color_jitter and _color_jitter_params consume the SAME rng
    sequence: after running either on equal-seeded rngs, the next draw
    is identical (this is what makes (seed, epoch, idx) backend-
    portable)."""
    from PIL import Image

    img = Image.fromarray(
        (np.linspace(0, 255, 32 * 32 * 3) % 255).astype(np.uint8)
        .reshape(32, 32, 3))
    r1, r2 = random.Random("x"), random.Random("x")
    _color_jitter(img, r1)
    _color_jitter_params(r2)
    assert r1.random() == r2.random()


def test_params_deterministic():
    p1 = _color_jitter_params(random.Random("s/0/3"))
    p2 = _color_jitter_params(random.Random("s/0/3"))
    assert p1 == p2
    names = sorted(n for n, _ in p1)
    assert names == ["brightness", "color", "contrast", "hue"]


def test_fast_close_to_pil_augmented(smooth_db):
    pil = Crops(smooth_db, augment=True, seed=5)
    fast = Crops(smooth_db, augment=True, seed=5, fast=True)
    diffs, mask_agree, uvw_agree = [], [], []
    for i in range(len(pil)):
        a, b = pil[i], fast[i]
        assert b["rgb"].shape == (3, 128, 128)
        assert b["uvw"].dtype == np.uint8
        diffs.append(_rgb_01_diff(a["rgb"], b["rgb"]))
        mask_agree.append(
            (a["mask"].astype(np.int32) == b["mask"].astype(np.int32))
            .mean())
        # nearest-resample source positions differ by a half pixel
        # between PIL and cv2, so exact equality is the wrong contract
        # — on smooth content the disagreeing pixels are off by a few
        # counts, which is what matters to the CE loss target
        uvw_agree.append(
            (np.abs(a["uvw"].astype(np.int32)
                    - b["uvw"].astype(np.int32)) <= 8).mean())
        # non-pixel fields are bit-identical
        for k in ("latent", "crop_size", "intrinsics", "pose"):
            np.testing.assert_array_equal(a[k], b[k])
    # same geometry (angle/crop params shared) => masks nearly identical;
    # pixel values close in [0,1] units
    assert np.mean(mask_agree) > 0.97
    assert np.mean(uvw_agree) > 0.90
    assert np.mean(diffs) < 0.05


def test_fast_close_to_pil_noaug(smooth_db):
    pil = Crops(smooth_db, augment=False)
    fast = Crops(smooth_db, augment=False, fast=True)
    a, b = pil[0], fast[0]
    assert _rgb_01_diff(a["rgb"], b["rgb"]) < 0.02
    assert (a["mask"].astype(np.int32)
            == b["mask"].astype(np.int32)).mean() > 0.98


def test_fast_deterministic_and_cache_transparent(smooth_db):
    fast = Crops(smooth_db, augment=True, seed=2, fast=True)
    uncached = fast[1]
    fast.preload(num_threads=2)
    assert len(fast._cache) == len(fast)
    cached = fast[1]
    for k in uncached:
        np.testing.assert_array_equal(uncached[k], cached[k])


def test_fast_prefetch_threads_matches_sync(smooth_db):
    fast = Crops(smooth_db, augment=True, seed=9, fast=True)
    fast.preload()
    sync = list(batch_iterator(fast, 4, shuffle=True, seed=0))
    threaded = list(prefetch_iterator(fast, 4, num_threads=4, shuffle=True,
                                      seed=0))
    assert len(sync) == len(threaded)
    for sb, tb in zip(sync, threaded):
        for k in sb:
            np.testing.assert_array_equal(sb[k], tb[k])


def test_fast_process_workers_match_sync(smooth_db):
    fast = Crops(smooth_db, augment=True, seed=9, fast=True)
    sync = list(batch_iterator(fast, 4, shuffle=True, seed=0))
    proc = list(prefetch_iterator(fast, 4, num_procs=2, shuffle=True,
                                  seed=0))
    assert len(sync) == len(proc)
    for sb, pb in zip(sync, proc):
        for k in sb:
            np.testing.assert_array_equal(sb[k], pb[k])


def test_train_cfg_knob_default_off():
    import configparser

    from sdflabel_tpu.config import TrainCfg

    cfgp = configparser.ConfigParser()
    cfgp.read_dict({"train": {}})
    assert TrainCfg.from_ini(cfgp).fast_input is False
    cfgp.read_dict({"train": {"fast_input": "True"}})
    assert TrainCfg.from_ini(cfgp).fast_input is True


def test_uint8_staging_value_identical(smooth_db):
    """stage='uint8' ships raw jittered pixels; engine.css_train
    normalizes on device with the same fp32 (x/255 - mean)/std — the
    train step must produce value-identical losses/gradients vs the
    host-normalized f32 batch."""
    import jax
    import jax.numpy as jnp

    from sdflabel_tpu.engine import css_train
    from sdflabel_tpu.models import css as css_mod

    f32 = Crops(smooth_db, augment=True, seed=4, fast=True)
    u8 = Crops(smooth_db, augment=True, seed=4, fast=True, stage="uint8")
    bf = next(batch_iterator(f32, 4, shuffle=False))
    bu = next(batch_iterator(u8, 4, shuffle=False))
    assert bu["rgb"].dtype == np.uint8
    # the staged pixels really are the same image
    recon = (bu["rgb"].astype(np.float32) / 255.0
             - np.asarray([0.485, 0.456, 0.406], np.float32)
             .reshape(3, 1, 1)) / IMAGENET_STD.reshape(3, 1, 1)
    np.testing.assert_allclose(recon, bf["rgb"], atol=1e-6)

    model = css_mod.CSSNet(use_running_average=False, width=8)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 3, 128, 128)))
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
    step = jax.jit(css_train.make_train_step(
        1e-3, model=css_mod.CSSNet(use_running_average=False, width=8),
        direct_ce=True))
    keep = {"rgb", "uvw", "mask", "latent"}

    def run(b):
        st = css_train.init_train_state(variables, 1e-3)
        st, m = step(st, {k: jnp.asarray(v) for k, v in b.items()
                          if k in keep})
        return float(m["loss"]), st

    loss_f, st_f = run(bf)
    loss_u, st_u = run(bu)
    assert abs(loss_f - loss_u) < 1e-5 * max(1.0, abs(loss_f))
    # Adam rescales each gradient by 1/sqrt(v): a last-ulp fp32
    # difference in the normalize (XLA fuses it differently than the
    # host numpy chain) can move a near-zero coordinate's update by
    # O(lr) — bound params by the Adam step size, not gradient ulps
    for a, b in zip(jax.tree.leaves(st_f.variables["params"]),
                    jax.tree.leaves(st_u.variables["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-3)


def test_stage_uint8_requires_fast(smooth_db):
    with pytest.raises(ValueError, match="requires fast"):
        Crops(smooth_db, stage="uint8")
    with pytest.raises(ValueError, match="stage"):
        Crops(smooth_db, fast=True, stage="f16")
