"""PnP pose init: parity vs reference utils/pose.py (cv2-backed)."""

import numpy as np
import pytest

from sdflabel_tpu.ops import pnp

from conftest import add_reference_paths

torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")
add_reference_paths()


def _synthetic_nocs(h=48, w=64, yaw=0.4, trans=(0.1, -0.2, 6.0), scale=2.0):
    """Project a synthetic NOCS point set into an image."""
    rng = np.random.RandomState(0)
    K = np.array([[90.0, 0, w / 2], [0, 90.0, h / 2], [0, 0, 1]])
    pts_local = rng.uniform(-0.9, 0.9, (400, 3))
    rot = np.array([
        [np.cos(yaw), 0, np.sin(yaw)], [0, 1, 0],
        [-np.sin(yaw), 0, np.cos(yaw)],
    ])
    cam_pts = (pts_local * scale) @ rot.T + np.asarray(trans)
    uv = cam_pts @ K.T
    uv = uv[:, :2] / uv[:, 2:3]
    nocs = np.zeros((3, h, w), np.float32)
    for p, (u, v) in zip(pts_local, uv):
        col, row = int(round(u)), int(round(v))
        if 0 <= row < h and 0 <= col < w:
            val = (p + 1) / 2
            if val[0] > 0:
                nocs[:, row, col] = val
    return K, nocs, rot, np.asarray(trans)


def test_init_pose_2d_recovers_pose():
    K, nocs, rot_gt, tra_gt = _synthetic_nocs()
    pose = pnp.init_pose_2d(K, nocs, scale_model=2.0)
    assert np.linalg.norm(pose["rot"] - rot_gt) < 0.15
    assert np.linalg.norm(pose["tra"] - tra_gt) < 0.3
    assert pose["scale"] == 2.0
    assert pose["quat"].shape == (4,)


def test_init_pose_2d_matches_reference():
    from utils.pose import PoseEstimator as RefPoseEstimator

    K, nocs, rot_gt, tra_gt = _synthetic_nocs(yaw=-0.3)
    np.random.seed(0)
    # The reference's R.from_dcm was renamed; skip if running against a
    # scipy without the legacy alias.
    import scipy.spatial.transform as sst

    if not hasattr(sst.Rotation, "from_dcm"):
        ours = pnp.init_pose_2d(K, nocs, scale_model=2.0)
        # at least verify the solve itself matches the reference wrapper
        from utils.pose import solvePnP as ref_solve

        mask = nocs[0] > 0
        vals = np.transpose(nocs, (1, 2, 0))[mask]
        p3 = ((vals * 2) - 1) * 2.0
        rr, cc = np.nonzero(mask)
        ip = np.stack([rr, cc], 1).astype(np.float64)
        ref_pose = ref_solve(K.copy(), ip.copy(), p3.copy())
        np.testing.assert_allclose(ours["rot"], ref_pose[:3, :3], atol=1e-6)
        np.testing.assert_allclose(ours["tra"], ref_pose[:3, 3], atol=1e-6)
        return

    ref = RefPoseEstimator("pnp", 2.0).estimate(
        None, None, None, None, torch.from_numpy(K),
        torch.from_numpy(nocs),
    )
    ours = pnp.init_pose_2d(K, nocs, scale_model=2.0)
    np.testing.assert_allclose(ours["rot"], ref["rot"], atol=1e-6)
    np.testing.assert_allclose(ours["tra"], ref["tra"], atol=1e-6)


def test_too_few_points_identity():
    K = np.eye(3) * 100
    K[2, 2] = 1
    nocs = np.zeros((3, 10, 10), np.float32)
    nocs[:, 5, 5] = 0.5  # single point
    pose = pnp.init_pose_2d(K, nocs)
    np.testing.assert_array_equal(pose["rot"], np.eye(3))
