"""Geometry helpers: rotations, BEV angles, IoU, reprojection, frustums.

Behavioral parity target: utils/refinement.py (the reference's grab-bag of
~30 geometry helpers). Host-side helpers are numpy; everything used inside
the jitted refinement loop has a jnp twin.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Rotations / angles
# ---------------------------------------------------------------------------

def rot_from_yaw(yaw: jax.Array) -> jax.Array:
    """Yaw -> 3x3 rotation about +Y (refinement.py:108-125). jnp, jittable."""
    yaw = jnp.reshape(yaw, ())
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    z = jnp.zeros(())
    o = jnp.ones(())
    return jnp.stack(
        [c, z, s, z, o, z, -s, z, c]
    ).reshape(3, 3)


def rot_from_yaw_np(yaw: float) -> np.ndarray:
    c, s = math.cos(yaw), math.sin(yaw)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], dtype=np.float64)


def roty_in_bev_jnp(pose: jax.Array) -> jax.Array:
    """Jittable twin of roty_in_bev (refinement.py:201-227) for fully
    on-device drivers (bench driver_crop program). Host float64 callers
    should keep using roty_in_bev."""
    forward = pose[:3, :3] @ jnp.asarray([0.0, 0.0, 1.0], pose.dtype)
    r = jnp.arccos(jnp.clip(forward[0], -1.0, 1.0))
    return jnp.where(forward[2] > 0, -r, r)


def roty_in_bev(pose: np.ndarray) -> float:
    """Rotation about Y in BEV from a pose matrix (refinement.py:201-227)."""
    forward = pose[:3, :3] @ np.asarray([0.0, 0.0, 1.0])
    rotation_y = math.acos(float(np.clip(np.asarray([1.0, 0, 0]) @ forward, -1, 1)))
    if forward[2] > 0:
        rotation_y *= -1
    return rotation_y


def alpha_in_bev(pose: np.ndarray, rot_y: float) -> float:
    """Observation angle alpha from pose + rot_y (refinement.py:230-252)."""
    car = np.asarray([[0.0, 0, 1], [0, 0, 0]])
    car = ((pose[:3, :3] @ car.T).T + pose[:3, 3])[:, ::2]
    theta = np.arctan2(abs(car[1, 0]), abs(car[1, 1]))
    if car[1, 0] < 0:
        return rot_y + theta
    return rot_y - theta


# ---------------------------------------------------------------------------
# 2D box IoU (two conventions kept, as the reference has both)
# ---------------------------------------------------------------------------

def get_iou(a, b, epsilon: float = 1e-5) -> float:
    """LTRB IoU without the +1 convention (refinement.py:128-165)."""
    x1, y1 = max(a[0], b[0]), max(a[1], b[1])
    x2, y2 = min(a[2], b[2]), min(a[3], b[3])
    w, h = x2 - x1, y2 - y1
    if w < 0 or h < 0:
        return 0.0
    inter = w * h
    union = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / (union + epsilon)


def compute_iou(box_a, box_b) -> float:
    """LTRB IoU with the inclusive +1 convention (refinement.py:168-198)."""
    xa, ya = max(box_a[0], box_b[0]), max(box_a[1], box_b[1])
    xb, yb = min(box_a[2], box_b[2]), min(box_a[3], box_b[3])
    inter = max(0, xb - xa + 1) * max(0, yb - ya + 1)
    area_a = (box_a[2] - box_a[0] + 1) * (box_a[3] - box_a[1] + 1)
    area_b = (box_b[2] - box_b[0] + 1) * (box_b[3] - box_b[1] + 1)
    return inter / float(area_a + area_b - inter)


# ---------------------------------------------------------------------------
# Projection / reprojection
# ---------------------------------------------------------------------------

def project_np(K: np.ndarray, p3d: np.ndarray) -> np.ndarray:
    """Pinhole projection (refinement.py:470-472 without cv2)."""
    p2h = p3d @ K.T
    return (p2h[:, :2] / p2h[:, 2:3]).astype(np.float32)


def unproject_np(K: np.ndarray, p2d: np.ndarray) -> np.ndarray:
    """Pixel -> unit-depth ray (refinement.py:475-477 without cv2)."""
    ones = np.ones((p2d.shape[0], 1), dtype=np.float64)
    homo = np.concatenate([p2d.astype(np.float64), ones], axis=1)
    rays = homo @ np.linalg.inv(K).T
    return rays.astype(np.float32)


def reproject_np(
    color: np.ndarray, depth: np.ndarray, K: np.ndarray, filter_nocs: bool = False
) -> tuple[np.ndarray, np.ndarray]:
    """Depth map -> colored 3D points (refinement.py:360-410, numpy path).

    color: (H,W,3) or (3,H,W); depth: (H,W) or (1,H,W). Returns (pts, cols)
    of the nonzero-depth pixels; with filter_nocs, drops black colors.
    """
    depth = np.squeeze(np.asarray(depth))
    y, x = np.nonzero(depth)
    good_xy = np.stack((x, y), axis=1).astype(np.float32)
    homo = np.concatenate([good_xy, np.ones((len(good_xy), 1), np.float32)], axis=1)
    p3 = homo @ np.linalg.inv(K).T.astype(np.float32)
    pts = p3 * depth[y, x][:, None]
    color = np.asarray(color)
    if color.ndim == 3 and color.shape[0] == 3:
        cols = color[:, y, x].T
    else:
        cols = color[y, x]
    if filter_nocs:
        active = (cols > 0).sum(axis=1) > 0
        pts, cols = pts[active], cols[active]
    return pts.astype(np.float32), cols.astype(np.float32)


def build_view_frustum(K: np.ndarray, l, t, r, b) -> np.ndarray:
    """4 inward-pointing frustum plane normals (refinement.py:480-498)."""
    corners = np.asarray(
        [(l, t), (r - 1, t), (r - 1, b - 1), (l, b - 1)], dtype=np.float32
    )
    rays = unproject_np(K, corners)
    rays /= np.linalg.norm(rays, axis=1)[:, None]
    top = np.cross(rays[0], rays[1])
    right = np.cross(rays[1], rays[2])
    bottom = np.cross(rays[2], rays[3])
    left = np.cross(rays[3], rays[0])
    return np.stack((top, right, bottom, left))


def compute_depth_map(lidar: np.ndarray, cam: np.ndarray, w: int, h: int) -> np.ndarray:
    """Z-buffer-free LIDAR depth map (refinement.py:87-105; last-write-wins,
    vectorized instead of the reference's python loop)."""
    frustum = build_view_frustum(cam, 0, 0, w, h)
    inside = np.logical_and.reduce(frustum @ lidar.T > 0, axis=0)
    xyz = lidar[inside]
    depth = np.zeros((h, w), dtype=np.float32)
    if len(xyz) == 0:
        return depth
    uv = project_np(cam, xyz).astype(np.int32)
    ok = (uv[:, 0] >= 0) & (uv[:, 0] < w) & (uv[:, 1] >= 0) & (uv[:, 1] < h)
    depth[uv[ok, 1], uv[ok, 0]] = xyz[ok, 2]
    return depth


def lookat(pos, target, up=(0.0, 1.0, 0.0)) -> np.ndarray:
    """OpenGL-style lookat matrix (refinement.py:255-277)."""
    pos = np.asarray(pos, np.float64)
    up = np.asarray(up, np.float64)
    f_vec = pos - np.asarray(target, np.float64)
    f = f_vec / np.linalg.norm(f_vec)
    u = up / np.linalg.norm(up)
    s = np.cross(f, u)
    u2 = np.cross(s, f)
    m, t = np.eye(4), np.eye(4)
    m[:3, :3] = np.vstack([s, u2, -f])
    t[:3, 3] = -pos
    return m @ t


# ---------------------------------------------------------------------------
# Hidden point removal (HPR)
# ---------------------------------------------------------------------------

def spherical_flip(points: np.ndarray, center: np.ndarray,
                   param: float) -> np.ndarray:
    """Spherical flip for the HPR operator (utils_rasterer.py:27-45).

    NOTE: the reference mutates its input (negating y,z in place) — we
    operate on a copy with identical math.
    """
    pts = np.array(points, dtype=np.float64, copy=True)
    pts[:, 1] *= -1
    pts[:, 2] *= -1
    pts = pts - np.asarray(center).reshape(1, 3)
    norms = np.linalg.norm(pts, axis=1)
    radius = norms.max() * (30.0 ** param)
    flipped = 2.0 * ((radius - norms)[:, None] * pts) / np.maximum(
        norms[:, None], 1e-12
    )
    return flipped + pts


def hpr_mask(points_cam: np.ndarray, param: float = math.pi) -> np.ndarray:
    """Hidden-point-removal visibility mask (projection.py:72-85 semantics).

    Host-side numpy utility (scipy qhull), matching the reference's
    filter_hpr path: spherical flip about the camera origin + convex hull;
    hull vertices (minus the appended origin) are the visible points.
    """
    from scipy.spatial import ConvexHull

    pts = np.asarray(points_cam, np.float64)
    pts = pts / max(pts.max(), 1e-12)
    flipped = spherical_flip(pts, np.zeros((1, 3)), param)
    with_origin = np.append(flipped, [[0.0, 0.0, 0.0]], axis=0)
    hull = ConvexHull(with_origin)
    mask = np.zeros(len(pts), dtype=bool)
    visible = hull.vertices[hull.vertices < len(pts)]
    mask[visible] = True
    return mask


# ---------------------------------------------------------------------------
# KITTI label <-> cuboid
# ---------------------------------------------------------------------------

def transform_kitti_to_cuboid(width, height, length, location, rot_y) -> np.ndarray:
    """KITTI label -> 8 cuboid corners (refinement.py:424-447)."""
    w, h, l = width, height, length
    front = np.asarray(
        [[-w / 2, -h, l / 2], [w / 2, -h, l / 2], [w / 2, 0, l / 2], [-w / 2, 0, l / 2]]
    )
    back = front.copy()
    back[:, 2] *= -1
    local_box = np.vstack((front, back))
    angle = rot_y + np.pi / 2
    # pyquaternion Quaternion(axis=[0,1,0], radians=angle).rotation_matrix
    rot = np.array(
        [
            [math.cos(angle), 0, math.sin(angle)],
            [0, 1, 0],
            [-math.sin(angle), 0, math.cos(angle)],
        ]
    )
    return (rot @ local_box.T).T + np.asarray(location)


def transform_label(bbox3d: np.ndarray):
    """Cuboid corners -> (centroid, direction, extents) (refinement.py:448-467)."""
    centroid = np.mean(bbox3d, axis=0)
    direction = np.mean(bbox3d[:4], axis=0) - centroid
    direction /= np.linalg.norm(direction)
    width = np.linalg.norm(bbox3d[0] - bbox3d[1])
    height = np.linalg.norm(bbox3d[0] - bbox3d[3])
    length = np.linalg.norm(bbox3d[0] - bbox3d[4])
    return centroid, direction, np.asarray([width, height, length])


# ---------------------------------------------------------------------------
# Crop intrinsics
# ---------------------------------------------------------------------------

def adjust_intrinsics_crop(K, crop_size, bbox, max_crop_area):
    """Adjust intrinsics for a crop + area budget (refinement.py:586-609).

    Returns (new [h, w] crop size, scaled intrinsics, offset-only intrinsics).
    """
    l, t, r, b = bbox
    crop_h, crop_w = float(crop_size[0]), float(crop_size[1])
    ratio = math.sqrt(max_crop_area / (crop_h * crop_w))
    new_size = [int(crop_h * ratio), int(crop_w * ratio)]
    intrinsics = np.array(K, dtype=np.float32).reshape(3, 3).copy()
    intrinsics[0, 2] -= l
    intrinsics[1, 2] -= t
    off_intrinsics = intrinsics.copy()
    intrinsics[:2] *= ratio
    return new_size, intrinsics, off_intrinsics


# ---------------------------------------------------------------------------
# Procrustes / Kabsch (numpy, host-side; vmapped jnp twins in ops.ransac)
# ---------------------------------------------------------------------------

def kabsch_np(canonical_points: np.ndarray, predicted_points: np.ndarray):
    """Rigid alignment (pose.py:325-356): R maps canonical -> predicted frame."""
    cm = canonical_points.mean(axis=0)
    pm = predicted_points.mean(axis=0)
    cc = canonical_points - cm
    pc = predicted_points - pm
    cross = pc.T @ cc
    u, s, vt = np.linalg.svd(cross)
    rotation = u @ vt
    if np.linalg.det(rotation) < 0:
        vt[-1, :] *= -1.0
        rotation = u @ vt
    translation = pm - cm
    translation = rotation @ translation - rotation @ pm + pm
    return rotation, translation


def procrustes_np(from_points: np.ndarray, to_points: np.ndarray):
    """Similarity alignment (pose.py:281-322). Returns (scale, R, t) or None."""
    n, m = from_points.shape
    mean_from = from_points.mean(axis=0)
    mean_to = to_points.mean(axis=0)
    delta_from = from_points - mean_from
    delta_to = to_points - mean_to
    sigma_from = (delta_from * delta_from).sum(axis=1).mean()
    cov = delta_to.T @ delta_from / n
    u, d, vt = np.linalg.svd(cov, full_matrices=True)
    rank = np.linalg.matrix_rank(cov)
    s = np.eye(m)
    if rank >= m - 1 and np.linalg.det(cov) < 0:
        s[m - 1, m - 1] = -1
    elif rank < m - 1:
        return None
    r = u @ s @ vt
    c = (d * s.diagonal()).sum() / sigma_from
    t = mean_to - c * (r @ mean_from)
    return c, r, t
