"""KITTI-3D dataset: calib/label/LIDAR parsing + frame preprocessing.

Behavioral parity target: datasets/kitti.py (KITTI3D :50-205,
get_kitti_frame :12-47). Differences by design:
  * normal estimation uses scipy cKDTree (C-backed) + vectorized PCA
    instead of Open3D (not available; SURVEY.md §2.C.4);
  * the LIDAR->depth-map projection is vectorized (ops.geometry) instead
    of a python pixel loop.
"""

from __future__ import annotations

import os
from collections import OrderedDict

import numpy as np

from sdflabel_tpu.ops import geometry


def is_anno_easy(anno) -> bool:
    """refinement.py:15-27."""
    height = anno["bbox"][3] - anno["bbox"][1]
    return not (
        anno["occluded"] > 0 or anno["truncated"] > 0.15 or height < 40
    )


def is_anno_moderate(anno) -> bool:
    """refinement.py:30-41."""
    height = anno["bbox"][3] - anno["bbox"][1]
    return not (
        anno["occluded"] > 1 or anno["truncated"] > 0.30 or height < 25
    )


def is_anno_hard(anno) -> bool:
    """refinement.py:44-57."""
    height = anno["bbox"][3] - anno["bbox"][1]
    return not (
        anno["occluded"] > 2 or anno["truncated"] > 0.5 or height < 25
    )


def estimate_normals(points: np.ndarray, radius: float = 1.0,
                     max_nn: int = 30) -> np.ndarray:
    """k-NN PCA normals (replaces Open3D estimate_normals, kitti.py:22).

    For each point: take up to max_nn neighbors within radius, normal =
    smallest-eigenvalue eigenvector of the local covariance.
    """
    from scipy.spatial import cKDTree

    tree = cKDTree(points)
    dists, idxs = tree.query(points, k=max_nn,
                             distance_upper_bound=radius)
    n = len(points)
    valid = np.isfinite(dists)
    idxs = np.where(valid, idxs, 0)
    neigh = points[idxs]  # (N, K, 3)
    w = valid.astype(np.float64)[..., None]
    cnt = np.maximum(w.sum(axis=1), 1.0)
    mean = (neigh * w).sum(axis=1) / cnt
    centered = (neigh - mean[:, None, :]) * w
    cov = np.einsum("nki,nkj->nij", centered, centered) / cnt[..., None]
    # smallest eigenvector of each 3x3 covariance
    eigvals, eigvecs = np.linalg.eigh(cov)
    normals = eigvecs[:, :, 0]
    # orient towards the sensor origin (like Open3D's default tangent plane
    # orientation is unspecified; only |dot| is used downstream)
    flip = np.sign(-np.einsum("ni,ni->n", normals, points))
    flip = np.where(flip == 0, 1.0, flip)
    return normals * flip[:, None]


def get_kitti_frame(sample: dict):
    """Frame preprocessing (kitti.py:12-47): frustum cull, normals, road
    plane removal by normal check, depth map, colored reprojection."""
    h, w, _ = sample["image"].shape
    scene_lidar = sample["lidar"]
    frustum = geometry.build_view_frustum(sample["orig_cam"], 0, 0, w, h)
    scene_lidar = scene_lidar[
        np.logical_and.reduce(frustum @ scene_lidar.T > 0, axis=0)
    ]

    if len(scene_lidar) > 0:
        normals = estimate_normals(scene_lidar)
        ortho_to_cam = np.abs(normals @ np.asarray([0.0, 1.0, 0.0])) > 0.9
        scene_lidar = scene_lidar[~ortho_to_cam]

    scene_depth = geometry.compute_depth_map(
        scene_lidar, sample["orig_cam"], w, h
    )
    pts_scene, clrs_scene = geometry.reproject_np(
        sample["image"], scene_depth, sample["orig_cam"]
    )
    return scene_depth, (pts_scene, clrs_scene)


class KITTI3D:
    """KITTI-3D frames dataset (datasets/kitti.py:50-205)."""

    def __init__(self, path, training=True, data_split="trainval",
                 compute_frame=True):
        self.path = path
        self.train = training
        self.data_split = data_split
        self.compute_frame = compute_frame

        assert data_split in ["test", "train", "trainval", "val"]
        split_file = os.path.join(path, "mv3d_kitti_split",
                                  data_split + ".txt")
        with open(split_file) as f:
            self.names = [line.strip() for line in f]
        self.root = os.path.join(
            path, "testing" if data_split == "test" else "training"
        )
        self.images = [f"image_2/{n}.png" for n in self.names]
        self.label_files = [f"label_2/{n}.txt" for n in self.names]
        self.calibs = [f"calib/{n}.txt" for n in self.names]
        self.lidars = [f"velodyne/{n}.bin" for n in self.names]

    def __len__(self):
        return len(self.names)

    def __getitem__(self, index: int) -> dict:
        import cv2

        sample = OrderedDict()
        sample["idx"] = index
        sample["scale"] = 1
        sample["name"] = self.names[index]

        calib = open(os.path.join(self.root, self.calibs[index])).readlines()
        calib = [c.rstrip("\n").split(" ") for c in calib]
        p2 = np.asarray([float(f) for f in calib[2][1:]]).reshape(3, 4)
        velo_to_cam = np.asarray(
            [float(f) for f in calib[5][1:]]
        ).reshape(3, 4)

        velodyne = np.fromfile(
            os.path.join(self.root, self.lidars[index]), np.float32
        ).reshape(-1, 4)[:, :3]
        sample["lidar"] = (velo_to_cam[:3, :3] @ velodyne.T).T + \
            velo_to_cam[:3, 3]

        img = cv2.imread(os.path.join(self.root, self.images[index]), -1)
        sample["image"] = img.astype(np.float32) / 255.0
        sample["orig_hw"] = img.shape[:2]

        cam, rot, t = cv2.decomposeProjectionMatrix(p2)[:3]
        sample["orig_cam"] = cam.copy()
        sample["world_to_cam"] = np.eye(4)
        sample["world_to_cam"][:3, :3] = rot
        sample["world_to_cam"][:3, 3] = -t[:3, 0] / t[3, 0] if t[3, 0] != 0 \
            else -t[:3, 0]

        if self.data_split != "test" and self.train:
            sample["gt"] = self._parse_labels(
                os.path.join(self.root, self.label_files[index])
            )
            self._apply_ignore_heuristics(sample["gt"])

        annos = {"easy": [], "medium": [], "hard": []}
        for anno in sample.get("gt", []):
            if anno["name"] != "Car" or anno["ignore"]:
                continue
            if is_anno_easy(anno):
                annos["easy"].append(anno)
            elif is_anno_moderate(anno):
                annos["medium"].append(anno)
            else:
                annos["hard"].append(anno)
        sample["annos"] = annos

        if self.compute_frame:
            depth, pcd = get_kitti_frame(sample)
            sample["depth"] = depth
            sample["pcd"] = pcd
        return sample

    @staticmethod
    def _parse_labels(path: str) -> list[dict]:
        """KITTI label txt -> anno dicts (kitti.py:134-166)."""
        annos = []
        for line in open(path).readlines():
            label = line.rstrip("\n").split(" ")
            anno = {
                "name": label[0],
                "bbox": [int(float(b)) for b in label[4:8]],
                "location": [float(b) for b in label[11:14]],
                "dimensions": [float(b) for b in label[8:11]],
                "rotation_y": float(label[14]),
                "alpha": float(label[3]),
                "score": 1,
                "truncated": float(label[1]),
                "occluded": int(label[2]),
            }
            anno["ignore"] = anno["location"][0] < -100
            annos.append(anno)
        return annos

    @staticmethod
    def _apply_ignore_heuristics(gt: list[dict]) -> None:
        """Occlusion-subsumption heuristics (kitti.py:168-186)."""
        for i, anno_i in enumerate(gt):
            for j, anno_j in enumerate(gt):
                if anno_i["name"] != "Car" or j == i:
                    continue
                inter_lt = np.maximum(anno_i["bbox"][:2], anno_j["bbox"][:2])
                inter_br = np.minimum(anno_i["bbox"][2:], anno_j["bbox"][2:])
                inter_wh = np.maximum(
                    np.asarray(inter_br) - np.asarray(inter_lt), 0
                )
                area = (anno_i["bbox"][2] - anno_i["bbox"][0]) * (
                    anno_i["bbox"][3] - anno_i["bbox"][1]
                )
                intersection = inter_wh[0] * inter_wh[1] / max(area, 1)
                if intersection > 0.5 and anno_j["name"] == "DontCare":
                    anno_i["ignore"] = True
                if not anno_i["ignore"] and not anno_j["ignore"]:
                    if (anno_i["location"][2] > anno_j["location"][2]
                            and intersection > 0.95):
                        anno_i["ignore"] = True
                        break


def get_annos(diff_annos: str, sample: dict) -> list[dict]:
    """Select annotations by difficulty, depth-sorted (refinement.py:565-583)."""
    if diff_annos == "hard":
        annos = (sample["annos"]["easy"] + sample["annos"]["medium"]
                 + sample["annos"]["hard"])
    elif diff_annos == "medium":
        annos = sample["annos"]["easy"] + sample["annos"]["medium"]
    else:
        annos = sample["annos"]["easy"]
    return sorted(annos, key=lambda a: a["location"][2])


def prefetch_frames(dataset, indices, skip_fn=None, depth: int = 2):
    """Iterate (frame_idx, sample) with background frame loading.

    Host-side KITTI preprocessing (cKDTree PCA normals, depth-map
    z-buffering — get_kitti_frame) costs a sizable fraction of a frame's
    refinement time; loading the NEXT frame in a worker thread while the
    device refines the CURRENT one overlaps the two (the driver-level
    analogue of data.crops.prefetch_iterator; the reference's per-frame
    host loop, refine_css.py:65, is fully serial).

    skip_fn(idx) -> True marks a frame as skipped WITHOUT loading it
    (yielded as (idx, None)); the idempotent-output check belongs there so
    already-dumped frames cost no preprocessing. Evaluation happens at
    submit time — up to `depth` frames early — which only ever wastes a
    load when another process dumps the frame in that window (the
    multi-process partition assigns disjoint frames, so this does not
    change which frames get processed).
    """
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    indices = list(indices)
    with ThreadPoolExecutor(max_workers=1) as pool:
        q: deque = deque()
        pos = 0

        def fill():
            nonlocal pos
            while pos < len(indices) and len(q) < max(depth, 1):
                i = indices[pos]
                pos += 1
                if skip_fn is not None and skip_fn(i):
                    q.append((i, None))
                else:
                    q.append((i, pool.submit(dataset.__getitem__, i)))

        fill()
        while q:
            i, fut = q.popleft()
            fill()  # keep the next load in flight while this one processes
            yield i, (None if fut is None else fut.result())
