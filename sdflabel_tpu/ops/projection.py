"""Point projection: world -> camera -> pixel, DCM and quaternion variants.

Behavioral parity target: sdfrenderer/renderer/projection.py
(`project_in_2D` :7-101, `project_in_2D_quat` :104-199). Differences by
design (TPU-first):
  * No dynamic `masked_select` — back-face culling produces a boolean mask
    (`front_mask`) that downstream consumers combine with the surface
    validity mask; all shapes stay static.
  * The HPR (spherical-flip + convex hull) filter is a host-side numpy
    utility (see ops.geometry.hpr_mask) and not part of the jitted path,
    matching the reference default flags (filter_hpr=False everywhere).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# All projection matmuls are tiny (N,3)x(3,3) — run them at HIGHEST
# precision: TPU's default bf16 passes perturb camera-frame coordinates
# by ~1e-2, which flips splat footprint bits downstream.
_PREC = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_PREC)


def qrot(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vectors v (..., 3) by quaternions q (..., 4), w-first.

    Same math as utils_rasterer.py:6-24: v + 2*(w*(qv x v) + qv x (qv x v)).
    """
    qvec = q[..., 1:]
    uv = jnp.cross(qvec, v)
    uuv = jnp.cross(qvec, uv)
    return v + 2.0 * (q[..., :1] * uv + uuv)


class ProjectedPoints(NamedTuple):
    """Static-shape projection output (N = number of input points).

    points_3d:  (N, 3) camera-frame points
    normals_3d: (N, 3) rotated normals
    colors_3d:  (N, 3) colors (NOCS coords if output_nocs)
    points_2d:  (N, 2) pixel coords, clamped to [-1, res]
    front_mask: (N,)   True where the normal faces the camera
                       (dot(normal, point) < 0; projection.py:61-70)
    """

    points_3d: jax.Array
    normals_3d: jax.Array
    colors_3d: jax.Array
    points_2d: jax.Array
    front_mask: jax.Array


def _project_pixels(K: jax.Array, points_cam: jax.Array, resolution_px) -> jax.Array:
    res_x, res_y = resolution_px
    eps = jnp.finfo(K.dtype).eps
    p2h = _mm(points_cam, K.T)
    p2 = p2h[:, :2] / (p2h[:, 2:3] + eps)
    x = jnp.clip(p2[:, 0:1], -1.0, float(res_x))
    y = jnp.clip(p2[:, 1:2], -1.0, float(res_y))
    return jnp.concatenate([x, y], axis=-1)


def project_dcm(
    K: jax.Array,
    camera_pose: jax.Array,
    points: jax.Array,
    normals: jax.Array,
    colors: jax.Array,
    resolution_px,
    output_nocs: bool = True,
) -> ProjectedPoints:
    """DCM-rotation projection, parity with projection.py:7-101.

    camera_pose: (4, 4) homogeneous camera matrix.
    With output_nocs, colors become the (x-flipped) object coords
    (projection.py:53-55).
    """
    RT = camera_pose[:3, :]
    rot = RT[:, :3]
    points_cam = _mm(points, rot.T) + RT[:, 3]
    normals_cam = _mm(normals, rot.T)
    if output_nocs:
        colors = points * jnp.asarray([-1.0, 1.0, 1.0], dtype=points.dtype)
    dot = jnp.sum(normals_cam * points_cam, axis=-1)
    return ProjectedPoints(
        points_3d=points_cam,
        normals_3d=normals_cam,
        colors_3d=colors,
        points_2d=_project_pixels(K, points_cam, resolution_px),
        front_mask=dot < 0,
    )


def project_quat(
    K: jax.Array,
    camera_pose: jax.Array,
    points: jax.Array,
    normals: jax.Array,
    colors: jax.Array,
    resolution_px,
    output_nocs: bool = True,
) -> ProjectedPoints:
    """Quaternion projection, parity with projection.py:104-199.

    camera_pose: (7,) = [qw, qx, qy, qz, tx, ty, tz].
    Note: the quat variant does NOT x-flip NOCS colors (projection.py:148-150)
    and the reference defaults filter_normals=False; we still report
    front_mask for callers that want it.
    """
    q = camera_pose[:4]
    t = camera_pose[4:]
    points_cam = qrot(jnp.broadcast_to(q, (points.shape[0], 4)), points) + t
    normals_cam = qrot(jnp.broadcast_to(q, (normals.shape[0], 4)), normals)
    if output_nocs:
        colors = points
    dot = jnp.sum(normals_cam * points_cam, axis=-1)
    return ProjectedPoints(
        points_3d=points_cam,
        normals_3d=normals_cam,
        colors_3d=colors,
        points_2d=_project_pixels(K, points_cam, resolution_px),
        front_mask=dot < 0,
    )
