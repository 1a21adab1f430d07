"""KITTI label generation from refined parameters.

Behavioral parity target: utils/refinement.py:501-562 (get_kitti_label):
re-decode the SDF at the final latent, measure metric extents of the scaled
surface points, build the camera->world transform, and emit a KITTI-format
label with global-frame rotation_y/alpha.

TPU split: the expensive half (the full-grid re-decode + masked extent
reduction) is the jittable `surface_extents`, fused into the refinement
program by the driver so no surface cloud ever crosses the host boundary —
only a 7-float extent summary does. The label MATH stays host-side float64
(`kitti_label_from_extents`), numerically identical to the reference's
numpy path.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from sdflabel_tpu.ops import geometry, grid as grid_ops


class SurfaceExtents(NamedTuple):
    """Masked min/max of the UNSCALED surface band (model frame) + validity.

    Scaling by the refined scale happens on the host in float64
    (min/max commutes with positive scaling; kitti_label_from_extents
    re-sorts the bounds so a pathological negative scale stays correct).
    """

    mn: jax.Array  # (3,) +inf where the band is empty
    mx: jax.Array  # (3,) -inf where the band is empty
    valid: jax.Array  # () bool — any |sdf| < threshold point found


def surface_extents(
    sdf_decoder,
    grid_points,
    latent,
    capacity: int = 4096,
    threshold: float = 0.03,
) -> SurfaceExtents:
    """Jittable surface-band bounding box at `latent` (raw, unnormalized —
    get_kitti_label semantics, refinement.py:516-529)."""
    surf, _ = grid_ops.surface_from_decoder(
        sdf_decoder, jnp.reshape(latent, (-1,)), grid_points,
        capacity=capacity, threshold=threshold,
    )
    big = jnp.asarray(jnp.inf, surf.points.dtype)
    mask = surf.mask[:, None]
    mn = jnp.min(jnp.where(mask, surf.points, big), axis=0)
    mx = jnp.max(jnp.where(mask, surf.points, -big), axis=0)
    return SurfaceExtents(mn=mn, mx=mx, valid=jnp.any(surf.mask))


def kitti_label_from_extents(
    yaw: float,
    scale: float,
    trans,
    mn,
    mx,
    p_wc: np.ndarray,
    bbox,
):
    """Host float64 label math from model-frame band extents
    (refinement.py:530-562). mn/mx are the UNSCALED extents
    (SurfaceExtents); trans is the scale-normalized translation."""
    yaw_f = float(np.asarray(yaw).reshape(-1)[0])
    scale_f = float(np.asarray(scale).reshape(-1)[0])
    trans_np = np.asarray(trans, np.float64).reshape(3)

    cam_t = np.eye(4)
    cam_t[:3, :3] = geometry.rot_from_yaw_np(yaw_f) @ np.diag([1.0, -1.0, 1.0])
    cam_t[:3, 3] = trans_np * scale_f

    global_t = np.linalg.inv(np.asarray(p_wc)) @ cam_t

    a = np.asarray(mn, np.float64) * scale_f
    b = np.asarray(mx, np.float64) * scale_f
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    width, height, length = hi - lo
    bottom_center = np.asarray([0.0, lo[1], 0.0])

    label = {"name": "Car"}
    label["bbox"] = np.asarray(bbox)
    label["location"] = global_t[:3, :3] @ bottom_center + global_t[:3, 3]
    label["dimensions"] = [height, width, length]
    label["rotation_y"] = geometry.roty_in_bev(global_t)
    label["alpha"] = geometry.alpha_in_bev(global_t, label["rotation_y"])
    label["score"] = 1
    return label


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
    """Returns (label dict, scaled surface points, cam_T 4x4).

    Host-driven variant (decodes eagerly; used by asset generators and as
    the no-extents fallback). The driver's hot path fuses surface_extents
    into the refine program and calls kitti_label_from_extents instead.
    """
    yaw_f = float(np.asarray(yaw).reshape(-1)[0])
    scale_f = float(np.asarray(scale).reshape(-1)[0])
    trans_np = np.asarray(trans, np.float64).reshape(3)

    cam_t = np.eye(4)
    cam_t[:3, :3] = geometry.rot_from_yaw_np(yaw_f) @ np.diag([1.0, -1.0, 1.0])
    cam_t[:3, 3] = trans_np * scale_f

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

    label = kitti_label_from_extents(
        yaw_f, 1.0, trans_np * scale_f, scaled_points.min(0),
        scaled_points.max(0), p_wc, bbox,
    )
    return label, scaled_points, cam_t
