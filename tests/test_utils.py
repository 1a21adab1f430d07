"""Aux subsystems: viz, checkpointing, profiling, HPR, config."""

import configparser
import dataclasses
import json
import math
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdflabel_tpu import config as cfg_mod
from sdflabel_tpu.ops import geometry
from sdflabel_tpu.utils import profiling, viz

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


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


def test_plot_correspondences_bev(tmp_path):
    """Headless analogue of the reference's live 3D correspondence view
    (visualizer.py:51-88): model + scene BEV points with heat-colored
    nearest-neighbor lines."""
    rng = np.random.RandomState(0)
    model = rng.uniform(-1, 1, (40, 3)) + [0, 0, 10]
    scene = model + rng.randn(40, 3) * 0.05
    idxs = np.arange(40)
    dists = np.linalg.norm(model - scene, axis=-1)
    mask_a = np.ones(40, bool)
    mask_a[-5:] = False
    out = str(tmp_path / "corr.png")
    img = viz.plot_correspondences_bev(model, scene, idxs, dists,
                                       mask_a=mask_a, path=out)
    assert img.shape == (512, 512, 3)
    assert img.sum() > 0
    assert (tmp_path / "corr.png").exists()

    # empty inputs must not crash (refinement can skip all points)
    img0 = viz.plot_correspondences_bev(
        np.zeros((0, 3)), np.zeros((0, 3)), np.zeros(0, int))
    assert img0.sum() == 0


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


def test_stock_configs_match_reference_semantics():
    """Our shipped configs/ mirror the reference's key-for-key: parsing
    ours and the reference's yields identical RefineCfg/TrainCfg (the TPU
    extension knobs in ours sit at their framework defaults — which since
    round 3/4 include select_pallas and warm_band ON, quality-gated by
    QUALITY_r04.json — except the deterministic seed which has no
    reference analogue)."""
    ours = configparser.ConfigParser()
    assert ours.read(os.path.join(REPO, "configs", "config_refine.ini"))
    ref = configparser.ConfigParser()
    assert ref.read("/root/reference/configs/config_refine.ini")
    assert cfg_mod.RefineCfg.from_ini(ours) == cfg_mod.RefineCfg.from_ini(ref)

    ours_t = configparser.ConfigParser()
    assert ours_t.read(os.path.join(REPO, "configs", "config_train.ini"))
    ref_t = configparser.ConfigParser()
    assert ref_t.read("/root/reference/configs/config_train.ini")
    a, b = cfg_mod.TrainCfg.from_ini(ours_t), cfg_mod.TrainCfg.from_ini(ref_t)
    assert dataclasses.replace(a, seed=b.seed) == b


def test_lookat():
    m = geometry.lookat([0, 0, 10], [0, 0, 0])
    p = m @ np.array([0, 0, 0, 1.0])
    # NOTE: the reference's lookat uses F = pos - target (refinement.py:267)
    # — inverted vs gluLookAt — so the target lands on +z at distance 10.
    np.testing.assert_allclose(p[:3], [0, 0, 10], atol=1e-9)
    # points left of view dir map consistently with s = cross(f, up)
    q = m @ np.array([1, 0, 0, 1.0])
    np.testing.assert_allclose(q[2], 10, atol=1e-9)


def test_deepsdf_workspace_conventions(tmp_path):
    import torch

    from sdflabel_tpu.models import deepsdf as dsdf
    from sdflabel_tpu.models import deepsdf_workspace as ws

    cfg = dsdf.DeepSDFConfig(latent_size=2, dims=(16, 16))
    params = dsdf.init_params(cfg, jax.random.PRNGKey(0))
    state = {}
    for ln in range(cfg.num_layers - 1):
        state[f"lin{ln}.weight"] = torch.from_numpy(
            np.asarray(params[f"lin{ln}"]["w"]).T.copy())
        state[f"lin{ln}.bias"] = torch.from_numpy(
            np.asarray(params[f"lin{ln}"]["b"]).copy())
    for i, li in enumerate((0, 2, 4)):
        state[f"scale_net.{li}.weight"] = torch.from_numpy(
            np.asarray(params["scale_net"][i]["w"]).T.copy())
        state[f"scale_net.{li}.bias"] = torch.from_numpy(
            np.asarray(params["scale_net"][i]["b"]).copy())

    exp = tmp_path / "exp"
    ws.get_model_params_dir(str(exp), True)
    ws.get_latent_codes_dir(str(exp), True)
    (exp / "specs.json").write_text(json.dumps({
        "CodeLength": 2,
        "NetworkSpecs": {"dims": [16, 16]},
    }))
    torch.save({"epoch": 7, "model_state_dict": state},
               exp / "ModelParameters" / "latest.pth")
    torch.save({"latent_codes": torch.randn(4, 1, 2)},
               exp / "LatentCodes" / "latest.pth")

    cfg2, params2, epoch = ws.load_decoder(str(exp), "latest")
    assert epoch == 7
    assert cfg2.latent_size == 2
    codes = ws.load_latent_vectors(str(exp), "latest")
    assert codes.shape == (4, 2)

    # single-file convention with bf16 precision
    import shutil

    torch.save({"epoch": 1, "model_state_dict": state}, tmp_path / "net.pt")
    (tmp_path / "net.json").write_text(json.dumps({
        "CodeLength": 2, "NetworkArch": "deep_sdf_decoder_scale",
        "NetworkSpecs": {"dims": [16, 16]},
    }))
    cfg3, params3, lat = ws.setup_dsdf(str(tmp_path / "net.pt"),
                                       precision="float16")
    assert lat == 2
    assert jax.tree.leaves(params3)[0].dtype == jnp.bfloat16


def test_deepsdf_dropout_train_mode():
    from sdflabel_tpu.models import deepsdf as dsdf

    cfg = dsdf.DeepSDFConfig(latent_size=2, dims=(16, 16), dropout=(0, 1),
                             dropout_prob=0.5, latent_dropout=True)
    params = dsdf.init_params(cfg, jax.random.PRNGKey(0))
    x = np.random.RandomState(0).randn(32, 5).astype(np.float32)
    eval_out = dsdf.apply_sdf(cfg, params, jnp.asarray(x))
    tr1 = dsdf.apply_sdf(cfg, params, jnp.asarray(x),
                         dropout_rng=jax.random.PRNGKey(1))
    tr2 = dsdf.apply_sdf(cfg, params, jnp.asarray(x),
                         dropout_rng=jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(tr1), np.asarray(tr2))
    assert not np.allclose(np.asarray(tr1), np.asarray(eval_out))
    assert np.isfinite(np.asarray(tr1)).all()


def test_latest_checkpoint_ignores_orbax_tmp_and_absolutizes(tmp_path,
                                                             monkeypatch):
    """A crash mid-save leaves 'step_N.orbax-checkpoint-tmp-<ts>' behind,
    which sorts AFTER the finished checkpoint — it must never be picked;
    and orbax rejects relative restore paths, so the result is absolute."""
    import os

    from sdflabel_tpu.utils import checkpoint as ck

    d = tmp_path / "ckpt"
    (d / "step_00000002").mkdir(parents=True)
    (d / "step_00000003").mkdir()
    (d / "step_00000003.orbax-checkpoint-tmp-1723940").mkdir()
    monkeypatch.chdir(tmp_path)
    latest = ck.latest_checkpoint("ckpt")  # relative input (valid CLI)
    assert os.path.isabs(latest)
    assert os.path.basename(latest) == "step_00000003"


def test_fast_preset_config():
    """configs/config_refine_fast.ini — the explicit production preset —
    parses and lands its acceleration knobs. Since round 4 the stock
    config ships the same warm-band default (quality-gated,
    QUALITY_r04.json); the preset differs only in viz_type = none."""
    fast = configparser.ConfigParser()
    assert fast.read(os.path.join(REPO, "configs", "config_refine_fast.ini"))
    cfg = cfg_mod.RefineCfg.from_ini(fast)
    assert cfg.warm_band == 8192
    assert cfg.warm_refresh == 10
    assert cfg.select_pallas is True
    assert cfg.stage2_pallas is False
    assert cfg.coarse_cells == 0
    assert cfg.viz_type == "none"  # throughput preset renders nothing
    # everything else the reference specifies stays at reference values
    stock = configparser.ConfigParser()
    assert stock.read(os.path.join(REPO, "configs", "config_refine.ini"))
    ref_cfg = cfg_mod.RefineCfg.from_ini(stock)
    assert dataclasses.replace(
        cfg, warm_band=ref_cfg.warm_band, warm_refresh=ref_cfg.warm_refresh,
        viz_type=ref_cfg.viz_type,
    ) == ref_cfg


def test_parity_preset_ini():
    """configs/config_refine_parity.ini pins EVERY extension knob to the
    exact-reference-semantics setting (round-4 VERDICT #6: with three
    perf knobs defaulting ON, bit-exact must not require tribal
    knowledge). It must equal the reference INI's RefineCfg with the
    extensions forced off, and its [train] section must select the
    reference's double-log-softmax CE formulation."""
    par = configparser.ConfigParser()
    assert par.read(os.path.join(REPO, "configs",
                                 "config_refine_parity.ini"))
    cfg = cfg_mod.RefineCfg.from_ini(par)
    # exact band semantics: no warm pool, no composed/c2f refresh, XLA
    # stage-1 decode, per-shape compilation
    assert cfg.warm_band == 0
    assert cfg.warm_refresh_cells == 0
    assert cfg.coarse_cells == 0
    assert cfg.select_pallas is False
    assert cfg.select_bf16 is False
    assert cfg.stage2_pallas is False
    assert cfg.render_bucket == 1

    # identical to the reference INI once the extension knobs are forced
    # to their exact-semantics values (the reference file has no such
    # keys, so from_ini fills framework defaults there)
    ref = configparser.ConfigParser()
    assert ref.read("/root/reference/configs/config_refine.ini")
    ref_cfg = cfg_mod.RefineCfg.from_ini(ref)
    assert cfg == dataclasses.replace(
        ref_cfg, warm_band=0, warm_refresh_cells=0, select_pallas=False,
        render_bucket=1,
    )

    # training parity: the same file drives --train with the reference CE
    tcfg = cfg_mod.TrainCfg.from_ini(par)
    assert tcfg.direct_ce is False
    assert tcfg.fused_ce is False
    assert tcfg.precision == "float32"
    assert tcfg.batch_size == 13
    assert tcfg.lr == 0.001


def test_tpu_parity_gate_logic():
    """scripts/tpu_parity.py's threshold gate: bit-identical arrays pass
    every row; a systematic perturbation fails its row and flips the
    verdict (the machine check that replaced the round-3 prose table)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "tpu_parity", os.path.join(REPO, "scripts", "tpu_parity.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    rng = np.random.RandomState(0)
    base = {
        "demo_mask": (rng.rand(1, 10, 20) > 0.5).astype(np.float64),
        "demo_color": rng.rand(3, 10, 20),
        "demo_depth": rng.rand(1, 10, 20) * 10,
        "demo_normals": rng.rand(3, 10, 20),
        "demo_loss": np.asarray(123.4),
        "demo_g_latent": rng.randn(3),
        "demo_g_pose": rng.randn(4, 4),
        "refine_loss": rng.rand(5) * 0.1,
        "refine_yaw": rng.randn(1),
        "refine_trans": rng.randn(3),
        "refine_scale": np.asarray([2.0]),
        "refine_latent": rng.randn(3),
        "select_sdf": rng.randn(64000) * 0.02,
    }
    rows = mod.gate(base, dict(base))
    assert all(r["pass"] for r in rows)
    names = [r["row"] for r in rows]
    assert "demo_mask_flip_count" in names
    assert "select_band_overlap_top4096" in names

    # systematic loss drift: its row fails, others still pass
    bad = dict(base)
    bad["refine_loss"] = base["refine_loss"] + 0.01
    rows = mod.gate(base, bad)
    by = {r["row"]: r for r in rows}
    assert not by["refine_loss_max_abs"]["pass"]
    assert by["refine_scale_max_abs"]["pass"]

    # shuffled selection values: band overlap collapses below 0.95
    bad2 = dict(base)
    bad2["select_sdf"] = rng.permutation(base["select_sdf"])
    rows = mod.gate(base, bad2)
    by = {r["row"]: r for r in rows}
    assert not by["select_band_overlap_top4096"]["pass"]


def test_viz3d_scene_export(tmp_path):
    """utils.viz3d: the interactive HTML export embeds a parseable scene
    (layer structure, decimation cap) and cuboid_edges produces a
    geometrically consistent 12-edge wireframe."""
    import json
    import re

    from sdflabel_tpu.utils import viz3d

    rng = np.random.RandomState(0)
    path = str(tmp_path / "scene.html")
    viz3d.export_scene_html(
        path,
        lidar=rng.randn(200000, 3),  # above the decimation cap
        model_points=rng.randn(50, 3),
        correspondences={"a": rng.randn(20, 3), "b": rng.randn(20, 3),
                         "heat": np.linspace(0, 1, 20)},
        est_boxes=[{"dimensions": [1.5, 1.6, 3.9],
                    "location": [1.0, 1.7, 12.0], "rotation_y": 0.3}],
    )
    html = open(path).read()
    m = re.search(r"const SCENE = (\{.*?\});\n", html, re.S)
    assert m, "embedded scene JSON not found"
    scene = json.loads(m.group(1))
    names = [ly["name"] for ly in scene["layers"]]
    assert names == ["lidar", "model", "correspondences", "est cuboids"]
    assert len(scene["layers"][0]["pts"]) == 60000  # decimated
    assert len(scene["layers"][2]["segs"]) == 20
    assert len(scene["layers"][3]["segs"]) == 12  # one cuboid wireframe
    assert max(scene["layers"][2]["heat"]) <= 1.0

    # cuboid geometry: edge lengths of an axis-aligned box recover
    # (w, h, l); rotation preserves them
    for yaw in (0.0, 0.7):
        edges = np.asarray(viz3d.cuboid_edges([1.5, 1.6, 3.9],
                                              [1.0, 1.7, 12.0], yaw))
        lengths = np.linalg.norm(edges[:, 0] - edges[:, 1], axis=1)
        # 12 edges: 4 of each dimension
        ls = np.sort(lengths)
        np.testing.assert_allclose(ls[:4], 1.5, atol=1e-9)  # h verticals
        np.testing.assert_allclose(ls[4:8], 1.6, atol=1e-9)  # w
        np.testing.assert_allclose(ls[8:], 3.9, atol=1e-9)  # l
        # bottom face sits at location y (bottom-center convention)
        assert abs(np.max(edges[..., 1]) - 1.7) < 1e-9
