"""End-to-end autolabel DRIVER throughput (host + device), synthetic KITTI.

bench.py's crops/hour times the refinement program alone; this times the
full `--refine` driver at production shapes: KITTI frame loading (PNG +
velodyne parsing), frustum culling, PCA normal estimation, depth-map
z-buffering, crop/letterbox + intrinsics adjustment, CSS forward
(reference width-64 net), refinement (60 iters, grid 40, render 32) for
every easy annotation, label generation, and idempotent pickle dumps.
Pose init is stubbed deterministic (an untrained CSS never clears
RANSAC on synthetic imagery — RANSAC's own cost is measured in
tests/bench elsewhere and is O(ms) per crop).

Frames are KITTI-sized (375 x 1242, 60k in-frustum lidar points) with
3 easy Cars each. Reports frames/hour and crops/hour including ALL host
work, and the host-only preprocessing share.

Usage: python scripts/measure_driver_throughput.py [--frames 6]
"""

import argparse
import configparser
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import cv2  # noqa: E402
import numpy as np  # noqa: E402


def build_tree(root: str, n_frames: int):
    """KITTI-layout tree at real KITTI scale (test_kitti.py fixture,
    scaled up)."""
    training = os.path.join(root, "training")
    for sub in ("image_2", "label_2", "calib", "velodyne"):
        os.makedirs(os.path.join(training, sub), exist_ok=True)
    os.makedirs(os.path.join(root, "mv3d_kitti_split"), exist_ok=True)

    h, w = 375, 1242
    fx = fy = 721.5
    cx, cy = w / 2, h / 2
    p2 = np.array([[fx, 0, cx, 0], [0, fy, cy, 0], [0, 0, 1, 0]])
    velo_to_cam = np.array(
        [[0.0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0]])

    rng = np.random.RandomState(0)
    names = [f"{i:06d}" for i in range(n_frames)]
    for name in names:
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(training, "image_2", f"{name}.png"), img)
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
        with open(os.path.join(training, "calib", f"{name}.txt"), "w") as f:
            f.write("\n".join(calib_lines) + "\n")

        n = 60000  # in-frustum lidar points at KITTI density
        cam_pts = np.stack([
            rng.uniform(-18, 18, n), rng.uniform(-1.0, 2.2, n),
            rng.uniform(4, 70, n),
        ], 1)
        velo = np.zeros((n, 4), np.float32)
        velo[:, :3] = (np.linalg.inv(velo_to_cam[:3, :3]) @ cam_pts.T).T
        velo.astype(np.float32).tofile(
            os.path.join(training, "velodyne", f"{name}.bin"))

        # 3 easy Cars (tall boxes, unoccluded)
        rows = []
        for j in range(3):
            x = -6.0 + 6.0 * j
            z = 10.0 + 4.0 * j
            u = fx * x / z + cx
            hpx = 1200.0 / z
            wpx = hpx * 2.2
            rows.append(
                f"Car 0.0 0 0.2 {u - wpx/2:.1f} {cy - hpx/3:.1f} "
                f"{u + wpx/2:.1f} {cy + hpx*2/3:.1f} "
                f"1.5 1.6 3.9 {x:.1f} 1.6 {z:.1f} 0.3")
        rows.append(
            "DontCare -1 -1 -10 0 0 5 5 -1 -1 -1 -1000 -1000 -1000 -10")
        with open(os.path.join(training, "label_2", f"{name}.txt"),
                  "w") as f:
            f.write("\n".join(rows) + "\n")
    with open(os.path.join(root, "mv3d_kitti_split", "trainval.txt"),
              "w") as f:
        f.write("\n".join(names) + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=6)
    args = ap.parse_args()

    print(f"backend: {jax.default_backend()}", file=sys.stderr, flush=True)
    tmp = tempfile.mkdtemp(prefix="drv_bench_")
    try:
        build_tree(tmp, args.frames)

        from sdflabel_tpu.models import deepsdf
        from sdflabel_tpu.pipelines import refine_css as pipeline
        from sdflabel_tpu.data import kitti as kitti_mod

        # reference-arch decoder checkpoint (8x512, weight norm)
        dcfg = deepsdf.DeepSDFConfig(latent_size=3, dims=(512,) * 8,
                                     norm_layers=tuple(range(8)),
                                     latent_in=(4,), weight_norm=True)
        params = deepsdf.init_params(dcfg, jax.random.PRNGKey(0))
        deepsdf.save_torch_checkpoint(
            os.path.join(tmp, "deepsdf.pt"), dcfg, params)

        ini = os.path.join(tmp, "refine.ini")
        with open(ini, "w") as f:
            f.write(f"""[input]
kitti_path = {tmp}
css_path = missing.pt
deepsdf_path = {os.path.join(tmp, 'deepsdf.pt')}
label_type = gt
diff_annos = easy
grid_density = 40
rendering_area = 32
[optimization]
iters = 60
pose_estimator = kabsch
precision = float32
[visualization]
viz_type = none
[losses]
2d_weight = 0.3
3d_weight = 0.5
[output]
labels = {os.path.join(tmp, 'autolabels')}
""")
        cfgp = configparser.ConfigParser()
        cfgp.read(ini)

        # deterministic pose init (see module docstring); fresh arrays per
        # call — prepare_crop mutates rot/tra in place
        pipeline.RefineRuntime.estimate_pose = (
            lambda self, *a, **k: {
                "scale": 4.0, "rot": np.eye(3),
                "tra": np.array([0.5, 1.6, 12.0]),
            })

        # host-only preprocessing share, measured separately first
        t0 = time.perf_counter()
        ds = kitti_mod.KITTI3D(tmp)
        for i in range(len(ds)):
            ds[i]
        host_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        n_annos, n_estims = pipeline.refine_css(cfgp)
        wall_cold = time.perf_counter() - t0
        # steady state: same program shapes, fresh output dir (the
        # idempotent skip-if-exists would otherwise skip every frame)
        cfgp.set("output", "labels", os.path.join(tmp, "autolabels2"))
        pipeline.reset_transfer_stats()
        t0 = time.perf_counter()
        n_annos, n_estims = pipeline.refine_css(cfgp)
        wall = time.perf_counter() - t0
        crops = args.frames * 3
        stats = dict(pipeline.TRANSFER_STATS)
        print(f"device->host fetches: {stats['fetches']} "
              f"({stats['fetches'] / crops:.1f} per crop, "
              f"{stats['arrays']} arrays)", flush=True)
        print(f"frames={args.frames} crops={crops} "
              f"(annos={n_annos} estims={n_estims})", flush=True)
        print(f"host preprocessing alone: {host_s / args.frames * 1e3:.0f} "
              f"ms/frame", flush=True)
        print(f"cold (incl. one-time compiles): {wall_cold:.1f} s",
              flush=True)
        print(f"driver end-to-end steady: {wall:.1f} s -> "
              f"{wall / args.frames:.2f} s/frame "
              f"({args.frames * 3600 / wall:.0f} frames/hour), "
              f"{wall / crops:.2f} s/crop "
              f"({crops * 3600 / wall:.0f} crops/hour incl. host)",
              flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
