"""Differentiable point-splat rasterizer (facade).

Behavioral parity target: sdfrenderer/renderer/rasterer.py:9-155 — project
points, splat with a chosen primitive, depth-softmax composite into
color/mask/depth/normals images, and emit the transformed point sets.

TPU design:
  * Image composition is expressed as `prob.T @ features` — one (P, N)x(N, C)
    matmul per output group instead of N-way broadcast sums; XLA fuses the
    clamping into the matmul epilogue. We concatenate all per-point feature
    channels (color 3, mask 1, depth 1, normals 3) into a single (N, 8)
    feature matrix so the whole composite is ONE matmul.
  * All outputs are computed unconditionally inside jit (static shapes, no
    python branching on flags inside the traced function); the facade simply
    selects what to return.
  * `point_mask` propagates the fixed-capacity surface set validity; the
    reference's filtered ("xyzf"/"rgbf") outputs become (points, mask) pairs
    with mask = point_mask & front_mask (projection.py:61-70).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from sdflabel_tpu.ops import splat as splat_ops
from sdflabel_tpu.ops.projection import project_dcm, project_quat

# Fused-splat policy for the 'disc' primitive: None = auto (fused on TPU,
# dense oracle elsewhere), True/False = force. The fused Pallas kernel
# (ops.splat_pallas) never materializes the (N, P) splat matrices.
USE_FUSED_SPLAT: bool | None = None


def _want_fused(use_bg: bool) -> bool:
    if use_bg:  # kernel does not model the background row (pipelines use none)
        return False
    if USE_FUSED_SPLAT is not None:
        return USE_FUSED_SPLAT
    return jax.default_backend() == "tpu"


def calibration_matrix(resolution_px, diagonal_mm=20.0, focal_len_mm=70.0, skew=0.0):
    """Default intrinsics from sensor geometry (utils_rasterer.py:59-83)."""
    res_x, res_y = resolution_px
    diagonal_px = float(np.sqrt(res_x**2 + res_y**2))
    m = diagonal_px / diagonal_mm  # px per mm (isotropic)
    alpha = focal_len_mm * m
    return np.array(
        [[alpha, skew, res_x / 2.0], [0.0, alpha, res_y / 2.0], [0.0, 0.0, 1.0]],
        dtype=np.float32,
    )


class Rendering(NamedTuple):
    """Rendered images: channel-first, (C, H, W)."""

    color: jax.Array  # (3, H, W), clamped to <=1
    mask: jax.Array  # (1, H, W)
    depth: jax.Array  # (1, H, W)
    normals: jax.Array  # (3, H, W)


class RenderedPoints(NamedTuple):
    """Transformed point sets (fixed capacity N with validity masks)."""

    xyz: jax.Array  # (N, 3) camera-frame points
    rgb: jax.Array  # (N, 3) (colors + 1) / 2
    mask: jax.Array  # (N,)  valid surface points
    front_mask: jax.Array  # (N,) valid AND facing the camera ("xyzf"/"rgbf")


def render(
    K: jax.Array,
    resolution_px: tuple[int, int],
    coords: jax.Array,
    normals: jax.Array,
    colors: jax.Array,
    camera_pose: jax.Array,
    point_mask: jax.Array | None = None,
    rot: str = "quat",
    primitives: str = "disc",
    output_nocs: bool = False,
    use_bg: bool = False,
    bg: jax.Array | None = None,
    splat_block_px: int = 0,
    splat_chunk: int = 0,
) -> tuple[Rendering, RenderedPoints]:
    """Render a point set. See Rasterer for the stateful wrapper.

    Matches Rasterer.forward (rasterer.py:49-155); primitives in {'circle',
    'circle_opt', 'disc'}. `bg` is an optional background color image
    ((3, H, W) or (P, 3)) composited through the background softmax row
    (rasterer.py:104-113); the pipelines pass bg=None. NOTE: the reference's
    bg paths for depth/normals are shape-broken (never exercised); here
    depth/normals composite from the object rows only, while color gets the
    bg contribution and mask includes the bg probability row (matching the
    reference's mask formula, which saturates to ~1 under a background).
    """
    res_x, res_y = resolution_px
    dtype = coords.dtype
    use_bg = use_bg or (bg is not None)
    grid = splat_ops.pixel_grid(res_x, res_y, dtype=dtype)

    if rot == "dcm":
        proj = project_dcm(K, camera_pose, coords, normals, colors, resolution_px,
                           output_nocs=output_nocs)
    elif rot == "quat":
        proj = project_quat(K, camera_pose, coords, normals, colors, resolution_px,
                            output_nocs=output_nocs)
    else:
        raise ValueError(f"unknown rot {rot!r}")

    v3d, v2d = proj.points_3d, proj.points_2d
    nrm, clr = proj.normals_3d, proj.colors_3d

    if primitives == "circle":
        prob = splat_ops.splat_circle(
            K, grid, v2d, v3d, point_mask, diam=0.02, add_bg=use_bg
        )
    elif primitives == "circle_opt":
        grid_prim = _primitive_grid(dtype)
        prob = splat_ops.splat_circle_opt(
            K, grid_prim, v2d, v3d, res_x, res_y, point_mask, diam=0.025,
            add_bg=use_bg,
        )
    elif primitives == "disc":
        prob = None  # computed below (fused kernel or dense oracle)
    else:
        raise ValueError(f"unknown primitives {primitives!r}")

    n = v3d.shape[0]

    if output_nocs:
        colors_ext = (clr + 1.0) / 2.0  # rasterer.py:116
    else:
        colors_ext = clr
    normals_ext = (nrm + 1.0) / 2.0

    # features = [color(3) | ones(1) | z(1) | normal(3)]
    feats = jnp.concatenate(
        [colors_ext, jnp.ones((n, 1), dtype), v3d[:, 2:3], normals_ext], axis=-1
    )  # (N, 8)

    if primitives == "disc" and _want_fused(use_bg):
        from sdflabel_tpu.ops import splat_pallas

        kinv_grid = splat_ops.kinv_pixel_rays(K, grid, dtype)
        tile_kw = {}
        # nonzero = explicit tile override (batched multi-crop refinement
        # shrinks tiles; engine.refine.RefineConfig.splat_block_px)
        if splat_block_px:
            tile_kw["block_px"] = splat_block_px
        if splat_chunk:
            tile_kw["chunk"] = splat_chunk
        img = splat_pallas.surfel_composite(
            v3d, nrm, feats, kinv_grid, point_mask=point_mask, diam=0.04,
            **tile_kw,
        )  # (P, 8)
    else:
        if primitives == "disc":
            prob = splat_ops.splat_surfel(
                K, grid, v3d, nrm, point_mask, diam=0.04, softclamp=False,
                add_bg=use_bg,
            )
        prob_pts = prob[:n]  # object rows (bg row handled below)
        img = prob_pts.T @ feats  # (P, 8) — MXU
        if use_bg and prob.shape[0] == n + 1:
            prob_bg = prob[n]  # (P,)
            if bg is not None:
                bg_flat = (bg.reshape(3, -1).T if bg.ndim == 3
                           else bg).astype(dtype)  # (P, 3)
                img = img.at[:, 0:3].add(prob_bg[:, None] * bg_flat)
            # mask formula includes the bg probability row (rasterer.py:124)
            img = img.at[:, 3].add(prob_bg)
    img = img.T.reshape(8, res_y, res_x)

    rendering = Rendering(
        color=jnp.clip(img[0:3], max=1.0),
        mask=jnp.clip(img[3:4], max=1.0),
        depth=img[4:5],
        normals=jnp.clip(img[5:8], max=1.0),
    )

    valid = (
        jnp.ones((n,), bool) if point_mask is None else point_mask.astype(bool)
    )
    points = RenderedPoints(
        xyz=v3d,
        rgb=(clr + 1.0) / 2.0,
        mask=valid,
        front_mask=valid & proj.front_mask,
    )
    return rendering, points


def _primitive_grid(dtype):
    """15x15 stamp offsets grid (rasterer.py:30-32)."""
    ys, xs = np.mgrid[-7:8, -7:8]
    g = np.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1)
    return jnp.asarray(g, dtype=dtype)


class Rasterer:
    """Stateful convenience wrapper mirroring the reference Rasterer module.

    Holds intrinsics + resolution; `__call__` is jit-friendly (pure function
    of its array arguments).
    """

    def __init__(self, K, resolution_px, diagonal_mm=20.0, focal_len_mm=70.0,
                 dtype=jnp.float32):
        self.res_x, self.res_y = int(resolution_px[0]), int(resolution_px[1])
        if K is None:
            K = calibration_matrix((self.res_x, self.res_y), diagonal_mm, focal_len_mm)
        self.K = jnp.asarray(K, dtype=dtype)

    def __call__(self, coords, normals, colors, camera_pose, point_mask=None,
                 rot="quat", primitives="disc", output_nocs=False,
                 use_bg=False, bg=None):
        return render(
            self.K, (self.res_x, self.res_y), coords, normals, colors,
            camera_pose, point_mask=point_mask, rot=rot, primitives=primitives,
            output_nocs=output_nocs, use_bg=use_bg, bg=bg,
        )
