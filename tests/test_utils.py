"""Aux subsystems: viz, checkpointing, profiling, HPR, config."""

import configparser
import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdflabel_tpu import config as cfg_mod
from sdflabel_tpu.ops import geometry
from sdflabel_tpu.utils import profiling, viz


def test_hpr_mask_visibility():
    """Points on the front of a sphere are visible; the back is hidden."""
    rng = np.random.RandomState(0)
    n = 800
    dirs = rng.randn(n, 3)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    pts = dirs * 1.0 + np.asarray([0, 0, 6.0])  # sphere at z=6
    # param=1.0: clean front/back separation. (The reference passes
    # param=pi in its disabled filter_hpr path, which makes the flip
    # radius 30^pi ~ 44000x and degenerates to all-visible.)
    mask = geometry.hpr_mask(pts, param=1.0)
    front = pts[:, 2] < 5.8  # camera-facing hemisphere
    back = pts[:, 2] > 6.2
    assert mask[front].mean() > 0.8
    assert mask[back].mean() < 0.2


def test_hpr_matches_reference():
    torch = pytest.importorskip("torch")
    import sys
    from conftest import add_reference_paths

    add_reference_paths()
    from renderer import utils_rasterer as ref_utils

    rng = np.random.RandomState(1)
    pts = rng.uniform(-1, 1, (200, 3)) + [0, 0, 5]
    pts_n = pts / pts.max()
    ours = geometry.spherical_flip(pts_n, np.zeros((1, 3)), math.pi)
    ref = ref_utils.sphericalFlip(pts_n.copy(), np.zeros((1, 3)), math.pi)
    np.testing.assert_allclose(ours, ref, atol=1e-9)


def test_viz_outputs(tmp_path):
    rend = np.random.rand(3, 16, 16).astype(np.float32)
    css = np.random.rand(3, 16, 16).astype(np.float32)
    img = viz.plot_patches(rend, css, path=str(tmp_path / "p.png"))
    assert img.shape == (16, 32, 3)

    frame = np.random.rand(64, 96, 3).astype(np.float32)
    out = viz.plot_full_frame(frame, rend, [10, 10, 40, 40])
    assert out.shape == frame.shape

    pts = np.random.rand(500, 3) * 20
    label = {"dimensions": [1.5, 1.6, 3.9], "location": [0, 1.6, 10],
             "rotation_y": 0.3}
    bev = viz.plot_bev(pts, label=label, gt_anno=label,
                       path=str(tmp_path / "bev.png"))
    assert bev.shape == (512, 512, 3)
    assert bev.sum() > 0

    curves = viz.plot_loss_curves({"loss": np.linspace(1, 0.1, 30)})
    assert curves.shape[1] == 30

    hm = viz.build_heatmap(np.linspace(0, 1, 10))
    assert hm.shape == (10, 3)


def test_orbax_checkpoint_roundtrip(tmp_path):
    from sdflabel_tpu.engine import css_train
    from sdflabel_tpu.models import css as css_mod
    from sdflabel_tpu.utils import checkpoint

    model = css_mod.CSSNet(use_running_average=False)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 3, 32, 32)))
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
    state = css_train.init_train_state(variables, 1e-3)
    path = checkpoint.save_train_state(str(tmp_path / "ckpt"), state)
    assert checkpoint.latest_checkpoint(str(tmp_path / "ckpt")) == path

    restored = checkpoint.restore_train_state(path, state)
    a = jax.tree.leaves(state.variables["params"])[0]
    b = jax.tree.leaves(restored.variables["params"])[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_throughput_meter():
    m = profiling.ThroughputMeter()
    m.tick(rays=1000, crops=2)
    r = m.rates()
    assert r["rays_per_s"] > 0
    assert r["crops_per_hour"] > 0


def test_config_parsing_reference_ini():
    cfgp = configparser.ConfigParser()
    cfgp.read("/root/reference/configs/config_refine.ini")
    cfg = cfg_mod.RefineCfg.from_ini(cfgp)
    assert cfg.grid_density == 40
    assert cfg.rendering_area == 32
    assert cfg.iters == 60
    assert cfg.pose_estimator == "kabsch"
    assert cfg.weight_2d == 0.3
    assert cfg.weight_3d == 0.5
    assert cfg.label_type == "maskrcnn"

    cfgp2 = configparser.ConfigParser()
    cfgp2.read("/root/reference/configs/config_train.ini")
    tcfg = cfg_mod.TrainCfg.from_ini(cfgp2)
    assert tcfg.batch_size == 13
    assert tcfg.lr == 0.001
    assert tcfg.log_dir == "log/demo/"
