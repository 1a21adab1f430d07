"""End-to-end pipeline integration tests on synthetic data.

Mirrors the reference's "demo as integration test" strategy
(SURVEY.md §4): build a self-consistent synthetic frame from our own
renderer + a small DeepSDF decoder, run the full refine_annotation path
(crop -> CSS -> surface -> reproject -> RANSAC -> refine -> label), and
check the recovered label against the known ground truth.
"""

import json
import math
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdflabel_tpu import config as cfg_mod
from sdflabel_tpu.engine import refine as refine_mod
from sdflabel_tpu.models import deepsdf
from sdflabel_tpu.ops import geometry, grid as grid_ops
from sdflabel_tpu.pipelines import refine_css as pipeline
from sdflabel_tpu.renderer import rasterer as rast_mod


class SyntheticRuntime(pipeline.RefineRuntime):
    """RefineRuntime with an oracle CSS: returns the GT NOCS render."""

    def __init__(self, cfg, dsdf_cfg, dsdf_params, oracle, **kw):
        super().__init__(cfg, css_variables=None, dsdf_cfg=dsdf_cfg,
                         dsdf_params=dsdf_params, **kw)
        self._oracle = oracle  # dict with 'nocs_crop' (3,128,128), 'latent'

    def css_forward(self, crop_rgb):
        return {
            "uvw_sm_masked": jnp.asarray(self._oracle["nocs_crop"][None]) * 255.0,
            "latent": jnp.asarray(self._oracle["latent"][None]),
        }


@pytest.fixture(scope="module")
def synthetic_world():
    """Build frame + GT from a small decoder, through our own renderer."""
    dsdf_cfg = deepsdf.DeepSDFConfig(
        latent_size=3, dims=(64,) * 4, norm_layers=(0, 1, 2, 3),
        latent_in=(2,), weight_norm=True,
    )
    dsdf_params = deepsdf.init_params(dsdf_cfg, jax.random.PRNGKey(3))
    decoder = deepsdf.sdf_fn(dsdf_cfg, dsdf_params)
    latent_gt = np.asarray([1.0, 0.0, 0.0], np.float32)

    grid_pts = grid_ops.generate_point_grid(28)
    surf, sdf = grid_ops.surface_from_decoder(
        decoder, jnp.asarray(latent_gt), grid_pts, capacity=3072
    )
    assert int(surf.mask.sum()) > 500

    # GT pose: azimuth-only rotation, object 8m in front of camera
    yaw_gt = 0.5
    scale_gt = 2.0
    trans_cam = np.asarray([0.0, 0.5, 8.0])
    H, W = 96, 144
    K = np.array([[110.0, 0, W / 2], [0, 110.0, H / 2], [0, 0, 1]],
                 np.float32)

    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = geometry.rot_from_yaw_np(yaw_gt) @ np.diag([1, -1, 1])
    pose[:3, 3] = trans_cam / scale_gt

    rendering, points = rast_mod.render(
        jnp.asarray(K), (W, H), surf.points, surf.normals, surf.normals,
        jnp.asarray(pose), point_mask=surf.mask, rot="dcm",
        primitives="disc", output_nocs=True,
    )
    nocs_img = np.asarray(rendering.color)  # (3,H,W) at unit scale
    depth_unit = np.asarray(rendering.depth)[0]  # camera depth at 1/scale
    mask_img = np.asarray(rendering.mask)[0] > 0.5
    depth = depth_unit * scale_gt * mask_img  # metric depth

    # image: BGR view of the NOCS (pipeline converts back to RGB)
    image = np.transpose(nocs_img, (1, 2, 0))[..., ::-1].copy()

    ys, xs = np.nonzero(mask_img)
    bbox = [int(xs.min()), int(ys.min()), int(xs.max() + 1),
            int(ys.max() + 1)]

    lidar_pts, _ = geometry.reproject_np(image, depth, K)

    sample = {
        "image": image.astype(np.float32),
        "depth": depth.astype(np.float32),
        "orig_cam": K.astype(np.float64),
        "world_to_cam": np.eye(4),
        "lidar": lidar_pts,
        "annos": {"easy": [], "medium": [], "hard": []},
    }
    anno = {
        "name": "Car",
        "bbox": bbox,
        "location": [0, 0, float(trans_cam[2])],
        "dimensions": [1.5, 1.6, 3.9],
        "rotation_y": 0.0,
        "alpha": 0.0,
        "score": 1,
        "truncated": 0.0,
        "occluded": 0,
    }
    gt = {
        "yaw": yaw_gt, "scale": scale_gt, "trans": trans_cam,
        "latent": latent_gt, "bbox": bbox,
    }
    return dsdf_cfg, dsdf_params, sample, anno, gt, (K, W, H)


def test_refine_annotation_end_to_end(synthetic_world):
    dsdf_cfg, dsdf_params, sample, anno, gt, (K, W, H) = synthetic_world

    cfg = cfg_mod.RefineCfg(
        label_type="gt", grid_density=28, rendering_area=32, iters=15,
        pose_estimator="kabsch",
    )
    # oracle CSS output: GT NOCS cropped + resized to 128x128
    l, t, r, b = gt["bbox"]
    # re-render GT NOCS to build the oracle crop from the stored image
    img_rgb = sample["image"][..., ::-1]  # back to RGB == NOCS
    crop = img_rgb[t:b, l:r]
    from PIL import Image

    crop128 = np.asarray(
        Image.fromarray((np.clip(crop, 0, 1) * 255).astype(np.uint8)).resize(
            (128, 128), Image.NEAREST
        ),
        np.float32,
    ) / 255.0
    oracle = {
        "nocs_crop": np.transpose(crop128, (2, 0, 1)),
        "latent": gt["latent"],
    }
    from sdflabel_tpu.ops import ransac as ransac_mod

    # production hypothesis budget (567): the reduced-budget variant was
    # seed-sensitive enough that stream changes in the sampler flipped the
    # location tolerance
    rt = SyntheticRuntime(
        cfg, dsdf_cfg, dsdf_params, oracle,
        surface_capacity=2048, frustum_capacity=4096,
        ransac_model_capacity=1024, ransac_scene_capacity=1024,
        ransac_cfg=ransac_mod.RansacConfig(hypothesis_chunk=8),
    )

    label = pipeline.refine_annotation(rt, sample, anno)
    assert label is not None

    # location: GT bottom-center in camera frame ~ trans + [0, ymin*scale, 0]
    loc = np.asarray(label["location"], np.float64)
    assert abs(loc[2] - gt["trans"][2]) < 1.0, loc
    assert abs(loc[0] - gt["trans"][0]) < 0.6, loc

    # rotation: global yaw should match GT yaw (mod pi ambiguity tolerated)
    ry = label["rotation_y"]
    expected_ry = geometry.roty_in_bev(
        np.pad(geometry.rot_from_yaw_np(gt["yaw"]) @ np.diag([1.0, -1.0, 1.0]),
               ((0, 1), (0, 1)))
    )
    dyaw = abs((ry - expected_ry + math.pi / 2) % math.pi - math.pi / 2)
    assert dyaw < 0.3, (ry, expected_ry)

    # dimensions: plausible metric size given scale 2 and unit shape
    dims = np.asarray(label["dimensions"])
    assert (dims > 0.3).all() and (dims < 6.0).all()


def test_refine_annotation_deterministic_without_global_seed(
        synthetic_world):
    """Library determinism (VERDICT r2 weak #7): refine_annotation depends
    only on the runtime's own RNGs (rng_seed -> PRNGKey + np_rng), never
    on global np.random state. Capacities are set BELOW the scene/frustum
    point counts so both subsampling draws actually execute."""
    dsdf_cfg, dsdf_params, sample, anno, gt, (K, W, H) = synthetic_world
    cfg = cfg_mod.RefineCfg(
        label_type="gt", grid_density=28, rendering_area=32, iters=4,
        pose_estimator="kabsch",
    )
    l, t, r, b = gt["bbox"]
    img_rgb = sample["image"][..., ::-1]
    from PIL import Image

    crop128 = np.asarray(
        Image.fromarray(
            (np.clip(img_rgb[t:b, l:r], 0, 1) * 255).astype(np.uint8)
        ).resize((128, 128), Image.NEAREST), np.float32) / 255.0
    oracle = {"nocs_crop": np.transpose(crop128, (2, 0, 1)),
              "latent": gt["latent"]}
    from sdflabel_tpu.ops import ransac as ransac_mod

    def run(global_seed):
        np.random.seed(global_seed)  # must NOT matter
        rt = SyntheticRuntime(
            cfg, dsdf_cfg, dsdf_params, oracle, rng_seed=7,
            surface_capacity=1024, frustum_capacity=512,
            ransac_model_capacity=512, ransac_scene_capacity=256,
            ransac_cfg=ransac_mod.RansacConfig(hypothesis_chunk=8),
        )
        # the subsampling paths are live: more crop/scene points than caps
        prep = pipeline.prepare_crop(rt, sample, anno)
        assert prep is not None and prep["fmask"].all()
        rt2 = SyntheticRuntime(
            cfg, dsdf_cfg, dsdf_params, oracle, rng_seed=7,
            surface_capacity=1024, frustum_capacity=512,
            ransac_model_capacity=512, ransac_scene_capacity=256,
            ransac_cfg=ransac_mod.RansacConfig(hypothesis_chunk=8),
        )
        return pipeline.refine_annotation(rt2, sample, anno, verbose=False)

    label_a = run(1)
    label_b = run(12345)
    assert label_a is not None and label_b is not None
    for k in ("location", "dimensions", "rotation_y", "alpha", "bbox"):
        np.testing.assert_array_equal(
            np.asarray(label_a[k]), np.asarray(label_b[k]), err_msg=k)


def test_stress_init_perturbation(synthetic_world):
    """[stress] knobs (round 5): prepare_crop applies a deterministic,
    seeded kick to the RANSAC init (yaw/trans/scale/latent) — the
    benchmark stressor that makes the warm-band staleness axis
    adversarial. Off by default; magnitudes match the config."""
    dsdf_cfg, dsdf_params, sample, anno, gt, _ = synthetic_world
    from sdflabel_tpu.ops import ransac as ransac_mod

    base = dict(label_type="gt", grid_density=28, rendering_area=32,
                iters=2, pose_estimator="kabsch")
    l, t, r, b = gt["bbox"]
    img_rgb = sample["image"][..., ::-1]
    from PIL import Image

    crop128 = np.asarray(
        Image.fromarray(
            (np.clip(img_rgb[t:b, l:r], 0, 1) * 255).astype(np.uint8)
        ).resize((128, 128), Image.NEAREST), np.float32) / 255.0
    oracle = {"nocs_crop": np.transpose(crop128, (2, 0, 1)),
              "latent": gt["latent"]}

    def prep_for(cfg, seed=7):
        rt = SyntheticRuntime(
            cfg, dsdf_cfg, dsdf_params, oracle, rng_seed=seed,
            surface_capacity=2048, frustum_capacity=4096,
            ransac_model_capacity=1024, ransac_scene_capacity=1024,
            ransac_cfg=ransac_mod.RansacConfig(hypothesis_chunk=8),
        )
        prep = pipeline.prepare_crop(rt, sample, anno)
        assert prep is not None
        return prep["params0"]

    p_plain = prep_for(cfg_mod.RefineCfg(**base))
    cfg_s = cfg_mod.RefineCfg(**base, stress_init_yaw_deg=25.0,
                              stress_init_trans_m=0.6,
                              stress_init_scale=0.12,
                              stress_init_latent=0.35)
    p_a = prep_for(cfg_s)
    p_b = prep_for(cfg_s)

    # deterministic per rng_seed
    for k in ("yaw", "trans", "scale", "latent"):
        np.testing.assert_array_equal(np.asarray(getattr(p_a, k)),
                                      np.asarray(getattr(p_b, k)), k)
    # yaw kicked by exactly +-25 deg
    dyaw = abs(float(p_a.yaw[0]) - float(p_plain.yaw[0]))
    np.testing.assert_allclose(dyaw, np.deg2rad(25.0), atol=1e-5)
    # scale kicked by exactly +-12%
    ratio = float(p_a.scale[0]) / float(p_plain.scale[0])
    assert abs(abs(ratio - 1.0) - 0.12) < 1e-5
    # trans and latent moved
    assert not np.allclose(np.asarray(p_a.trans), np.asarray(p_plain.trans))
    assert not np.allclose(np.asarray(p_a.latent),
                           np.asarray(p_plain.latent))


def test_batched_crops_matches_sequential(synthetic_world):
    """Letterboxed masked batched refinement == per-crop refinement."""
    dsdf_cfg, dsdf_params, sample, anno, gt, _ = synthetic_world
    from sdflabel_tpu.ops import ransac as ransac_mod

    cfg = cfg_mod.RefineCfg(
        label_type="gt", grid_density=28, rendering_area=32, iters=5,
        pose_estimator="kabsch",
    )
    l, t, r, b = gt["bbox"]
    img_rgb = sample["image"][..., ::-1]
    crop = img_rgb[t:b, l:r]
    from PIL import Image

    crop128 = np.asarray(
        Image.fromarray((np.clip(crop, 0, 1) * 255).astype(np.uint8)).resize(
            (128, 128), Image.NEAREST
        ), np.float32,
    ) / 255.0
    oracle = {"nocs_crop": np.transpose(crop128, (2, 0, 1)),
              "latent": gt["latent"]}
    rt = SyntheticRuntime(
        cfg, dsdf_cfg, dsdf_params, oracle,
        surface_capacity=2048, frustum_capacity=4096,
        ransac_model_capacity=1024, ransac_scene_capacity=1024,
        ransac_cfg=ransac_mod.RansacConfig(num_hypotheses=160,
                                           hypothesis_chunk=8),
    )
    np.random.seed(3)
    prep = pipeline.prepare_crop(rt, sample, anno)
    assert prep is not None

    refine_fn = rt.refine_fn(prep["crop_hw"])
    final_seq, _, _ext = refine_fn(
        prep["params0"], jnp.asarray(prep["intrinsics"]),
        jnp.asarray(prep["nocs_target"]), jnp.asarray(prep["frustum"]),
        jnp.asarray(prep["fmask"]),
    )
    [label_b] = pipeline.refine_crops_batched(rt, sample, [prep])
    label_s = pipeline.finish_label(rt, final_seq, sample, prep["anno"])
    np.testing.assert_allclose(
        np.asarray(label_b["location"]), np.asarray(label_s["location"]),
        atol=1e-3,
    )
    np.testing.assert_allclose(label_b["rotation_y"], label_s["rotation_y"],
                               atol=1e-3)


def test_demo_pipeline_via_cli_config(tmp_path, synthetic_world):
    """refine_css_demo through the config path with an npz sample."""
    dsdf_cfg, dsdf_params, sample, anno, gt, _ = synthetic_world

    # Save deepsdf checkpoint in reference format
    import torch

    state = {}
    p = dsdf_params
    for ln in range(dsdf_cfg.num_layers - 1):
        lp = p[f"lin{ln}"]
        if "v" in lp:
            state[f"lin{ln}.weight_v"] = torch.from_numpy(
                np.asarray(lp["v"]).T.copy())
            state[f"lin{ln}.weight_g"] = torch.from_numpy(
                np.asarray(lp["g"])[:, None].copy())
            state[f"lin{ln}.bias"] = torch.from_numpy(
                np.asarray(lp["b"]).copy())
        else:
            state[f"lin{ln}.weight"] = torch.from_numpy(
                np.asarray(lp["w"]).T.copy())
            state[f"lin{ln}.bias"] = torch.from_numpy(
                np.asarray(lp["b"]).copy())
    for i, li in enumerate((0, 2, 4)):
        state[f"scale_net.{li}.weight"] = torch.from_numpy(
            np.asarray(p["scale_net"][i]["w"]).T.copy())
        state[f"scale_net.{li}.bias"] = torch.from_numpy(
            np.asarray(p["scale_net"][i]["b"]).copy())
    ckpt = tmp_path / "deepsdf.pt"
    torch.save({"epoch": 1, "model_state_dict":
                {"module." + k: v for k, v in state.items()}}, ckpt)
    specs = {
        "CodeLength": 3,
        "NetworkArch": "deep_sdf_decoder_scale",
        "NetworkSpecs": {
            "dims": [64] * 4, "norm_layers": [0, 1, 2, 3],
            "latent_in": [2], "weight_norm": True,
        },
    }
    (tmp_path / "deepsdf.json").write_text(json.dumps(specs))

    cfg, params2 = deepsdf.load_torch_checkpoint(str(ckpt))
    # verify checkpoint round trip gives identical sdf
    pts = grid_ops.generate_point_grid(10)
    s1, _ = deepsdf.decode(dsdf_cfg, dsdf_params, jnp.asarray(gt["latent"]),
                           pts)
    s2, _ = deepsdf.decode(cfg, params2, jnp.asarray(gt["latent"]), pts)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)


@pytest.mark.slow
def test_bundled_demo_end_to_end(tmp_path, monkeypatch):
    """`--demo` runs from a clean checkout on the committed assets
    (data/optimization/*, generated by scripts/make_demo_assets.py) —
    the analogue of the reference's bundled kitti_sample.pt demo
    (refine_css_demo.py:23-204), including the MaskRCNN fusion branch
    (:62-77) and per-iteration viz, all headless."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    assets = os.path.join(repo, "data", "optimization")
    if not os.path.exists(os.path.join(assets, "kitti_sample.npz")):
        pytest.skip("bundled demo assets not present")
    monkeypatch.chdir(repo)

    out = str(tmp_path / "demo_out")
    cfg = cfg_mod.RefineCfg(
        css_path=os.path.join(assets, "css_demo.msgpack"), css_width=8,
        deepsdf_path=os.path.join(assets, "deepsdf_demo.pt"),
        label_type="maskrcnn", diff_annos="easy", grid_density=40,
        rendering_area=32, iters=20, pose_estimator="kabsch",
        viz_type="3d", viz_live=True, labels_out=out,
    )
    np.random.seed(1)
    annos, ests = pipeline.refine_css_demo(cfg)
    assert len(ests["location"]) == 1

    # refined label within coarse tolerance of the GT anno (20 iters only;
    # the full 60-iter run converges to ~1 cm)
    gt_loc = np.asarray(annos["location"][0], np.float64)
    est_loc = np.asarray(ests["location"][0], np.float64)
    assert np.linalg.norm(gt_loc - est_loc) < 0.8
    dyaw = abs(float(annos["rotation_y"][0]) - float(ests["rotation_y"][0]))
    assert min(dyaw, abs(dyaw - 2 * math.pi)) < 0.3

    # per-iteration trajectory PNGs + final BEV written
    viz_files = os.listdir(os.path.join(out, "viz"))
    assert any(f.endswith("_patches.png") for f in viz_files)
    assert any(f.endswith("_corr.png") for f in viz_files)
    assert os.path.exists(os.path.join(out, "demo_bev_0.png"))
    # interactive single-file 3D scenes (utils.viz3d): per-crop
    # correspondence view + the final cuboids-vs-GT view
    assert any(f.endswith("scene3d.html") for f in viz_files)
    assert os.path.exists(os.path.join(out, "demo_scene3d.html"))
    # live-file mode ([visualization] live): stable latest_* paths were
    # published alongside the trajectory (the headless live-window analogue)
    live = os.path.join(out, "viz", "live")
    assert os.path.exists(os.path.join(live, "latest_patches.png"))
    assert os.path.exists(os.path.join(live, "latest_corr.png"))


def test_runtime_warm_compose_policy(synthetic_world):
    """RefineRuntime's selection-acceleration policy: the stock defaults
    compose (warm pool + c2f refresh, both clamped to the grid), explicit
    coarse_cells wins over warm, and odd small grids where the warm pool
    cannot fit the cell pool fall back to a full-grid refresh."""
    dsdf_cfg, dsdf_params, _sample, _anno, _gt, _ = synthetic_world

    def rt_for(**kw):
        cfg = cfg_mod.RefineCfg(**kw)
        return SyntheticRuntime(cfg, dsdf_cfg, dsdf_params, oracle={},
                                surface_capacity=64)

    # stock defaults at reference grid density: plain warm (the composed
    # cell-pass refresh is OFF by default since round 5 — QUALITY_r05
    # measured it at -3.0 3D AP on distant objects)
    rt = rt_for(grid_density=40)
    assert rt.warm_band == 8192
    assert rt.warm_refresh_cells is None

    # opting in composes (clamped to the cell pool)
    rt = rt_for(grid_density=40, warm_refresh_cells=2048)
    assert rt.warm_band == 8192
    assert rt.warm_refresh_cells == 2048

    # small even grid: pool clamps to d^3, cells to (d/2)^3 — still fits
    rt = rt_for(grid_density=12, warm_refresh_cells=2048)
    assert rt.warm_band == 12 ** 3
    assert rt.warm_refresh_cells == 6 ** 3  # 1728 == 216 * 8 exactly

    # odd grid where (d//2)^3 * 8 < d^3: full-grid refresh fallback
    rt = rt_for(grid_density=15, warm_refresh_cells=2048)
    assert rt.warm_band == 15 ** 3
    assert rt.warm_refresh_cells is None

    # odd grid >= 23 where the pool-size guard alone would PASS
    # (8192 <= (25//2)^3 * 8 = 13824) but the cell pass cannot partition
    # an odd density — must fall back to full-grid refresh rather than
    # crash at trace time in _cell_children_np (round-4 advisor finding)
    rt = rt_for(grid_density=25, warm_refresh_cells=2048)
    assert rt.warm_band == 8192
    assert rt.warm_refresh_cells is None

    # explicit coarse_cells disables warm entirely (pure c2f path)
    rt = rt_for(grid_density=40, coarse_cells=1024)
    assert rt.warm_band == 0
    assert rt.coarse_cells == 1024

    # warm_band = 0 restores exact semantics (no warm, no compose)
    rt = rt_for(grid_density=40, warm_band=0)
    assert rt.warm_band == 0
    assert rt.warm_refresh_cells is None
