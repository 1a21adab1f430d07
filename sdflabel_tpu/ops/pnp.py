"""PnP-based pose initialization (host-side, OpenCV RANSAC).

Behavioral parity target: utils/pose.py:40-81 (init_pose_2d) and
:236-278 (solvePnP wrapper). This is per-crop setup work on small arrays —
it stays host-side by design (SURVEY.md §7.4); the Kabsch/Procrustes paths
in ops.ransac are the on-device initializers.
"""

from __future__ import annotations

import numpy as np


def solve_pnp(cam: np.ndarray, image_points: np.ndarray,
              object_points: np.ndarray, return_inliers: bool = False):
    """cv2.solvePnPRansac wrapper (pose.py:236-278).

    image_points arrive as (row, col) and are swapped to (x, y) exactly
    like the reference (pose.py:257).
    """
    import cv2

    dist_coeffs = np.zeros((4, 1))
    if image_points.shape[0] < 4:
        pose = np.eye(4)
        inliers = []
    else:
        image_points = image_points.copy()
        image_points[:, [0, 1]] = image_points[:, [1, 0]]
        object_points = np.expand_dims(
            np.ascontiguousarray(object_points, np.float64), 1
        )
        image_points = np.expand_dims(
            np.ascontiguousarray(image_points, np.float64), 1
        )
        success, rvec, tvec, inliers = cv2.solvePnPRansac(
            object_points, image_points, np.asarray(cam, np.float64),
            dist_coeffs, iterationsCount=1000, reprojectionError=1.0,
        )[:4]
        pose = np.eye(4)
        if success:
            pose[:3, :3] = cv2.Rodrigues(rvec)[0]
            pose[:3, 3] = np.squeeze(tvec)
        if inliers is None:
            inliers = []
    if return_inliers:
        return pose, len(inliers)
    return pose


def init_pose_2d(cam: np.ndarray, nocs_region: np.ndarray,
                 scale_model: float = 1.0) -> dict:
    """NOCS image -> 2D-3D correspondences -> PnP pose (pose.py:40-81).

    nocs_region: (3, H, W) NOCS image in [0, 1]; nonzero red-channel
    pixels provide correspondences (pixel -> NOCS coord * 2 - 1, scaled).
    Returns the reference's pose dict {rot, quat, tra, scale}.
    """
    from scipy.spatial.transform import Rotation as R

    nocs = np.transpose(np.asarray(nocs_region), (1, 2, 0))
    nonzero_mask = nocs[:, :, 0] > 0
    nocs_values = nocs[nonzero_mask]
    points_3d = (nocs_values * 2.0) - 1.0

    grid_row, grid_col = np.nonzero(nonzero_mask)
    image_points = np.stack([grid_row, grid_col], axis=1).astype(np.float64)
    object_points = points_3d * scale_model

    predicted = solve_pnp(np.asarray(cam), image_points, object_points)

    rot = predicted[:3, :3]
    quat = R.from_matrix(rot).as_quat()
    quat = np.concatenate([quat[3:], quat[:3]])  # (w, x, y, z)
    return {
        "rot": rot,
        "quat": quat,
        "tra": predicted[:3, 3],
        "scale": scale_model,
    }
