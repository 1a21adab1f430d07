"""KITTI3D dataset: parsing + preprocessing on a synthetic KITTI tree."""

import os

import numpy as np
import pytest

from sdflabel_tpu.data import kitti as kitti_mod
from sdflabel_tpu.ops import geometry

cv2 = pytest.importorskip("cv2")


def make_kitti_tree(root, n_frames=2):
    """Synthetic KITTI tree in the real on-disk layout (also used by the
    two-process driver-partition test and its worker)."""
    import pathlib

    root = pathlib.Path(root)
    training = root / "training"
    for sub in ("image_2", "label_2", "calib", "velodyne"):
        (training / sub).mkdir(parents=True)
    (root / "mv3d_kitti_split").mkdir()

    h, w = 96, 128
    fx = fy = 100.0
    cx, cy = w / 2, h / 2
    p2 = np.array([[fx, 0, cx, 0], [0, fy, cy, 0], [0, 0, 1, 0]])
    # velodyne -> camera: KITTI-style axis permutation
    velo_to_cam = np.array([
        [0.0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0]
    ])

    names = [f"{i:06d}" for i in range(n_frames)]
    rng = np.random.RandomState(0)
    for name in names:
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(training / "image_2" / f"{name}.png"), img)

        calib_lines = [
            "P0: " + " ".join(["0"] * 12),
            "P1: " + " ".join(["0"] * 12),
            "P2: " + " ".join(str(v) for v in p2.reshape(-1)),
            "P3: " + " ".join(["0"] * 12),
            "R0_rect: " + " ".join(str(v) for v in np.eye(3).reshape(-1)),
            "Tr_velo_to_cam: " + " ".join(
                str(v) for v in velo_to_cam.reshape(-1)),
            "Tr_imu_to_velo: " + " ".join(["0"] * 12),
        ]
        (training / "calib" / f"{name}.txt").write_text(
            "\n".join(calib_lines) + "\n")

        # LIDAR: a blob of points in front of the camera (camera z fwd ->
        # velodyne x fwd), plus a ground plane
        n = 3000
        cam_pts = np.stack([
            rng.uniform(-4, 4, n), rng.uniform(-1, 1.5, n),
            rng.uniform(5, 25, n),
        ], 1)
        velo = np.zeros((n, 4), np.float32)
        # invert the velo->cam rotation
        velo[:, :3] = (np.linalg.inv(velo_to_cam[:3, :3]) @ cam_pts.T).T
        velo.astype(np.float32).tofile(training / "velodyne" / f"{name}.bin")

        labels = [
            # type trunc occ alpha l t r b h w l x y z ry
            "Car 0.0 0 0.2 30 20 80 70 1.5 1.6 3.9 0.5 1.6 12.0 0.3",
            "Car 0.2 1 0.1 10 40 40 68 1.5 1.6 3.9 -2.0 1.6 15.0 -0.2",
            "Van 0.0 0 0.0 90 30 120 65 2.0 1.9 5.0 3.0 1.6 18.0 0.0",
            "DontCare -1 -1 -10 0 0 5 5 -1 -1 -1 -1000 -1000 -1000 -10",
        ]
        (training / "label_2" / f"{name}.txt").write_text(
            "\n".join(labels) + "\n")

    (root / "mv3d_kitti_split" / "trainval.txt").write_text(
        "\n".join(names) + "\n")
    return str(root)


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    return make_kitti_tree(tmp_path_factory.mktemp("kitti"))


def test_kitti_dataset_loads(kitti_root):
    ds = kitti_mod.KITTI3D(kitti_root)
    assert len(ds) == 2
    sample = ds[0]
    assert sample["image"].shape == (96, 128, 3)
    assert sample["orig_cam"].shape == (3, 3)
    np.testing.assert_allclose(sample["orig_cam"][0, 0], 100.0, atol=1e-6)
    assert sample["lidar"].shape[1] == 3
    # lidar transformed into camera frame: z mostly positive-forward
    assert (sample["lidar"][:, 2] > 0).mean() > 0.9

    gt = sample["gt"]
    assert len(gt) == 4
    car0 = gt[0]
    assert car0["name"] == "Car"
    assert car0["bbox"] == [30, 20, 80, 70]
    assert car0["dimensions"] == [1.5, 1.6, 3.9]
    assert car0["rotation_y"] == 0.3
    assert not car0["ignore"]
    assert gt[3]["ignore"]  # DontCare at x=-1000

    # difficulty split: car0 height 50 >= 40, occ 0, trunc 0 -> easy
    assert any(a["bbox"] == [30, 20, 80, 70] for a in sample["annos"]["easy"])
    # car1 occluded=1, trunc 0.2 -> moderate bucket
    assert any(a["bbox"] == [10, 40, 40, 68]
               for a in sample["annos"]["medium"])

    # preprocessing produced a depth map with hits
    assert sample["depth"].shape == (96, 128)
    assert (sample["depth"] > 0).sum() > 100


def test_estimate_normals_plane():
    """Points on a plane must get the plane normal."""
    rng = np.random.RandomState(1)
    pts = np.zeros((500, 3))
    pts[:, 0] = rng.uniform(-5, 5, 500)
    pts[:, 2] = rng.uniform(5, 15, 500)
    pts[:, 1] = 1.6 + rng.randn(500) * 0.01  # ~horizontal plane y=1.6
    normals = kitti_mod.estimate_normals(pts, radius=2.0)
    align = np.abs(normals @ np.asarray([0, 1, 0]))
    assert (align > 0.95).mean() > 0.9


def test_get_annos_depth_sorted(kitti_root):
    ds = kitti_mod.KITTI3D(kitti_root)
    sample = ds[0]
    annos = kitti_mod.get_annos("hard", sample)
    depths = [a["location"][2] for a in annos]
    assert depths == sorted(depths)


def test_compute_depth_map_roundtrip():
    K = np.array([[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1]])
    pts = np.array([[0.0, 0, 10], [1.0, 0.5, 20]])
    depth = geometry.compute_depth_map(pts, K, 128, 96)
    assert depth[48, 64] == 10.0
    v = int(0.5 / 20 * 100 + 48)
    u = int(1.0 / 20 * 100 + 64)
    assert depth[v, u] == 20.0


def write_refine_cfg(tmp_path, kitti_root, labels_dir="autolabels"):
    """Small deepsdf checkpoint (reference format) + refine .ini for driver
    tests. Returns a loaded ConfigParser."""
    import configparser
    import json as json_mod

    import jax
    import torch

    from sdflabel_tpu.models import deepsdf

    cfg = deepsdf.DeepSDFConfig(latent_size=3, dims=(32,) * 2)
    params = deepsdf.init_params(cfg, jax.random.PRNGKey(0))
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
    torch.save({"epoch": 1, "model_state_dict": state},
               tmp_path / "deepsdf.pt")
    (tmp_path / "deepsdf.json").write_text(json_mod.dumps({
        "CodeLength": 3, "NetworkArch": "deep_sdf_decoder_scale",
        "NetworkSpecs": {"dims": [32] * 2},
    }))

    ini = tmp_path / "refine.ini"
    ini.write_text(f"""[input]
kitti_path = {kitti_root}
css_path = missing.pt
deepsdf_path = {tmp_path / 'deepsdf.pt'}
label_type = gt
diff_annos = easy
grid_density = 12
rendering_area = 16
[optimization]
iters = 2
pose_estimator = kabsch
precision = float32
[visualization]
viz_type = none
[losses]
2d_weight = 0.3
3d_weight = 0.5
[output]
labels = {tmp_path / labels_dir}
""")
    cfgp = configparser.ConfigParser()
    cfgp.read(ini)
    return cfgp


def test_refine_css_driver_end_to_end(kitti_root, tmp_path, monkeypatch):
    """Full --refine driver on the synthetic KITTI tree with an untrained
    CSS net: frames load, crops process, RANSAC correctly finds no pose
    (garbage NOCS), pickles dump, and the evaluator runs on the empty
    estimations — the graceful no-detection path end to end."""
    import pickle

    from sdflabel_tpu.pipelines import refine_css as pipeline

    cfgp = write_refine_cfg(tmp_path, kitti_root)

    total_annos, total_estims = pipeline.refine_css(cfgp)
    out_files = list((tmp_path / "autolabels").glob("*.pkl"))
    assert len(out_files) == 2  # both frames have easy Car annos
    gt, est = pickle.load(open(out_files[0], "rb"))
    assert len(gt["bbox"]) >= 1
    # untrained CSS -> no ransac pose -> empty estimations, graceful
    assert len(np.asarray(est.get("bbox", []))) == 0

    # the evaluate pipeline consumes the dumps (backfills empties)
    from sdflabel_tpu.pipelines.evaluate_dump import evaluate

    results = evaluate(cfgp, difficulties=(0,))
    assert "Box3DAP" in results[0]


def test_refine_css_sequential_matches_batched(kitti_root, tmp_path,
                                               monkeypatch):
    """Both driver branches (batched=True/False) of refine_css produce the
    same labels, and both survive a finish_label() -> None skip (the empty
    surface-band condition, QUIRKS #15). Regression for the round-1 crash
    where the sequential branch called label.items() with no None guard
    (reference loop semantics: refine_css.py:94-250)."""
    from sdflabel_tpu.pipelines import refine_css as pipeline

    cfgp = write_refine_cfg(tmp_path, kitti_root)

    # Deterministic pose so refinement actually runs (the untrained CSS
    # net would otherwise never clear RANSAC). Fresh arrays each call:
    # prepare_crop mutates rot/tra in place (azimuth constraint).
    monkeypatch.setattr(
        pipeline.RefineRuntime, "estimate_pose",
        lambda self, *a, **k: {
            "scale": 4.0,
            "rot": np.eye(3),
            "tra": np.array([0.5, 1.6, 12.0]),
        },
    )

    # First finish_label of each run returns None — the empty-band skip.
    real_finish = pipeline.finish_label
    calls = {"n": 0}

    def flaky_finish(rt, final, sample, anno, extents=None):
        calls["n"] += 1
        if calls["n"] == 1:
            return None
        return real_finish(rt, final, sample, anno, extents=extents)

    monkeypatch.setattr(pipeline, "finish_label", flaky_finish)

    results = {}
    n_fetches = {}
    for batched, out in ((True, "lab_batched"), (False, "lab_seq")):
        cfgp.set("output", "labels", str(tmp_path / out))
        calls["n"] = 0
        pipeline.reset_transfer_stats()
        _, results[batched] = pipeline.refine_css(cfgp, batched=batched)
        assert calls["n"] >= 2  # at least one skipped + one emitted label
        n_fetches[batched] = pipeline.TRANSFER_STATS["fetches"]

    # Structural round-trip gate (the driver's host<->device traffic is a
    # measured budget, not an accident): the batched branch must stay at
    # <= 4 synchronous fetches per crop — one CSS+surface fetch per crop
    # plus one refine+label fetch per frame batch (pose init is stubbed
    # here; the real RANSAC adds exactly one more per crop).
    n_crops = sum(len(v["bbox"]) for v in results[True].values()) \
        + 1  # + the label-skipped crop
    assert n_fetches[True] <= 4 * n_crops, (n_fetches, n_crops)

    est_b, est_s = results[True], results[False]
    assert list(est_b.keys()) == list(est_s.keys())
    emitted = 0
    for frame in est_b:
        eb, es = est_b[frame], est_s[frame]
        assert len(eb["bbox"]) == len(es["bbox"])
        emitted += len(eb["bbox"])
        for key in ("location", "dimensions", "rotation_y", "alpha"):
            np.testing.assert_allclose(
                np.asarray(eb[key], np.float64),
                np.asarray(es[key], np.float64), atol=2e-3,
                err_msg=f"frame {frame} key {key}",
            )
    assert emitted >= 1  # the non-skipped labels actually exist


def test_prefetch_frames_order_skip_and_overlap(tmp_path):
    """prefetch_frames yields every frame in order, never loads skipped
    frames, and has the next load in flight while the current item is
    being consumed."""
    import threading
    import time

    from sdflabel_tpu.data.kitti import prefetch_frames

    loads = []
    load_threads = set()

    class FakeDataset:
        def __getitem__(self, i):
            load_threads.add(threading.get_ident())
            loads.append(i)
            time.sleep(0.01)
            return {"idx": i}

    skipped = {2, 3}
    out = list(prefetch_frames(FakeDataset(), range(6),
                               skip_fn=lambda i: i in skipped))
    assert [i for i, _ in out] == list(range(6))
    for i, s in out:
        if i in skipped:
            assert s is None
        else:
            assert s == {"idx": i}
    assert sorted(loads) == [0, 1, 4, 5]  # skipped frames never loaded
    # loading happened off the consumer thread
    assert threading.get_ident() not in load_threads
