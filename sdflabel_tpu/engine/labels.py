"""KITTI label generation from refined parameters.

Behavioral parity target: utils/refinement.py:501-562 (get_kitti_label):
re-decode the SDF at the final latent, measure metric extents of the scaled
surface points, build the camera->world transform, and emit a KITTI-format
label with global-frame rotation_y/alpha.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from sdflabel_tpu.ops import geometry, grid as grid_ops


def get_kitti_label(
    sdf_decoder,
    grid_points,
    latent,
    scale,
    trans,
    yaw,
    p_wc: np.ndarray,
    bbox,
    capacity: int = 4096,
):
    """Returns (label dict, scaled surface points, cam_T 4x4)."""
    yaw_f = float(np.asarray(yaw).reshape(-1)[0])
    scale_f = float(np.asarray(scale).reshape(-1)[0])
    trans_np = np.asarray(trans, np.float64).reshape(3)

    cam_t = np.eye(4)
    cam_t[:3, :3] = geometry.rot_from_yaw_np(yaw_f) @ np.diag([1.0, -1.0, 1.0])
    cam_t[:3, 3] = trans_np * scale_f

    global_t = np.linalg.inv(np.asarray(p_wc)) @ cam_t

    surf, _ = grid_ops.surface_from_decoder(
        sdf_decoder, jnp.asarray(latent).reshape(-1), grid_points,
        capacity=capacity,
    )
    pts = np.asarray(surf.points)[np.asarray(surf.mask)]
    if len(pts) == 0:
        # no |sdf| < threshold band at the final latent — no measurable
        # extent; callers skip the annotation (the reference would crash
        # on an empty masked_select here)
        return None, None, cam_t
    scaled_points = pts * scale_f

    xmin, xmax = scaled_points[:, 0].min(), scaled_points[:, 0].max()
    ymin, ymax = scaled_points[:, 1].min(), scaled_points[:, 1].max()
    zmin, zmax = scaled_points[:, 2].min(), scaled_points[:, 2].max()
    width, height, length = xmax - xmin, ymax - ymin, zmax - zmin
    bottom_center = np.asarray([0.0, ymin, 0.0])

    label = {"name": "Car"}
    label["bbox"] = np.asarray(bbox)
    label["location"] = global_t[:3, :3] @ bottom_center + global_t[:3, 3]
    label["dimensions"] = [height, width, length]
    label["rotation_y"] = geometry.roty_in_bev(global_t)
    label["alpha"] = geometry.alpha_in_bev(global_t, label["rotation_y"])
    label["score"] = 1
    return label, scaled_points, cam_t
