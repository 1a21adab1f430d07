"""Refinement losses: 3D chamfer-to-LIDAR and projective 2D NOCS loss.

Behavioral parity targets:
  * loss_3d  <- Optimizer.compute_loss_3d (pipelines/optimizer.py:166-198)
  * loss_2d  <- Optimizer.compute_loss_2d (pipelines/optimizer.py:200-237)

TPU design: both losses are fully jittable with static shapes.
  * The reference's per-iteration KDTree host round-trip
    (optimizer.py:180-181: .detach().cpu() -> sklearn -> back to device) is
    replaced by an on-device brute-force NN (ops.knn) — the (N, M) distance
    matrix is one MXU matmul at these sizes.
  * The reference's dynamic `nonzero()` pixel gathers (optimizer.py:219)
    become dense per-pixel computations weighted by the nonzero indicator —
    identical values, static shapes.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from sdflabel_tpu.ops import knn


def loss_3d(
    rendered_pts: jax.Array,
    rendered_mask: jax.Array,
    frustum_pts: jax.Array,
    frustum_mask: jax.Array,
    scale: jax.Array,
    threshold: float = 0.2,
) -> jax.Array:
    """Mean distance of close NN pairs rendered->frustum (optimizer.py:166-198).

    Args:
      rendered_pts: (N,3) camera-frame model points (differentiable).
      rendered_mask: (N,) validity (surface capacity mask & front-facing).
      frustum_pts: (M,3) scene points ALREADY divided by scale — pass
        `frustum_raw / scale` so the scale gradient flows through the scene
        points exactly as in the reference (optimizer.py:84).
      frustum_mask: (M,) validity of padded scene points.
      scale: scalar; used (detached) for the distance threshold
        `threshold / scale` (optimizer.py:186).
    """
    total, cnt = loss_3d_terms(rendered_pts, rendered_mask, frustum_pts,
                               frustum_mask, scale, threshold)
    return jnp.where(cnt > 0, total / jnp.maximum(cnt, 1), 0.0)


def loss_3d_terms(
    rendered_pts: jax.Array,
    rendered_mask: jax.Array,
    frustum_pts: jax.Array,
    frustum_mask: jax.Array,
    scale: jax.Array,
    threshold: float = 0.2,
) -> tuple[jax.Array, jax.Array]:
    """(sum, count) partials of loss_3d — the mean decomposes over the
    rendered-point axis, which lets a sharded caller compute per-shard
    partials and psum them (parallel/sharded_refine.py)."""
    dists, idxs = knn.nearest_neighbor(
        jax.lax.stop_gradient(rendered_pts),
        jax.lax.stop_gradient(frustum_pts),
        frustum_mask,
    )
    thresh = threshold / jax.lax.stop_gradient(scale).reshape(())
    close = (dists < thresh) & rendered_mask
    # differentiable pair distances, matching the re-computed norm at
    # optimizer.py:189. Double-where guards sqrt(0): masked rows otherwise
    # contribute NaN cotangents (NaN * 0 = NaN in the backward pass).
    nn_pts = jnp.take(frustum_pts, idxs, axis=0)
    d2 = jnp.sum(jnp.square(nn_pts - rendered_pts), axis=-1)
    safe = d2 > 0
    pair_d = jnp.where(safe, jnp.sqrt(jnp.where(safe, d2, 1.0)), 0.0)
    cnt = jnp.sum(close)
    total = jnp.sum(jnp.where(close, pair_d, 0.0))
    return total, cnt


def disc_offsets(diam: float) -> tuple[int, list[tuple[int, int]],
                                       list[float]]:
    """(radius, integer offsets strictly inside the disc, their weights).

    The ONLY definition of the 2D-loss disc enumeration — the windowed
    single-device path below and parallel/sharded_refine's per-shard
    variant must use identical offset/weight arithmetic or their
    loss-parity contract silently breaks. Weight = diam - sqrt(dy^2+dx^2)
    as an exact small-integer sum, bit-equal to the dense path's
    pairwise_sq_dists + sqrt.
    """
    radius = int(math.ceil(diam)) - 1
    offsets = [
        (dy, dx)
        for dy in range(-radius, radius + 1)
        for dx in range(-radius, radius + 1)
        if dy * dy + dx * dx < diam * diam
    ]
    wgts = [diam - math.sqrt(dy * dy + dx * dx) for dy, dx in offsets]
    return radius, offsets, wgts


def loss_2d(
    rendering_nocs: jax.Array,
    css_nocs: jax.Array,
    diam: float = 5.0,
    threshold_nocs: float = 1.0,
    pixel_mask: jax.Array | None = None,
    windowed: bool | None = None,
) -> jax.Array:
    """Projective NOCS loss (optimizer.py:200-237).

    For every nonzero rendered pixel r, a disc of radius `diam` on the CSS
    NOCS image is weighted by clamp(diam - |p - r|, 0); the loss is the mean
    (over rendered pixels, subject to < threshold) of the minimum over p of
    ||css[p] * w(r,p) - rendered[r]||_2.

    Shapes: rendering_nocs, css_nocs: (3, H, W). Returns scalar. The
    reference returns NaN when no minimum clears the threshold (empty
    mean) — we return NaN as well so the caller's NaN guard semantics
    (optimizer.py:149-151) are preserved.

    pixel_mask: optional (H, W) or (P,) validity — used by the batched
    pipeline that letterboxes variable-size crops into one square render:
    padded pixels are excluded both as rendered pixels (r axis) and as
    CSS-disc candidates (p axis), making the masked square render exactly
    equivalent to the per-crop-size render.

    windowed: None (auto: windowed for crops above 64x64), or force the
    O(K^2 P) windowed formulation / the dense O(P^2) oracle. Both compute
    the SAME function: the disc weight clamp(diam - |p - r|, 0) depends
    only on the integer pixel offset p - r, so candidates outside the
    (2R+1)^2 window all reduce to the same value ||rend[r]|| (their w is
    0) — the windowed path enumerates in-disc offsets as shifted images
    plus that single fallback candidate, removing the reference's O(P^2)
    blow-up at demo scale (optimizer.py:215-219 materializes the full
    pixel-distance matrix; at 200x100 that is 4e8 entries).
    """
    c, h, w = rendering_nocs.shape
    if windowed is None:
        windowed = h * w > 64 * 64
    if windowed:
        return _loss_2d_windowed(rendering_nocs, css_nocs, diam,
                                 threshold_nocs, pixel_mask)
    p = h * w
    rend = rendering_nocs.reshape(c, p).T  # (P, 3)
    css = css_nocs.reshape(c, p).T  # (P, 3)

    nonzero = jnp.sum(rend, axis=-1) != 0  # (P,) rendered nonzero pixels
    if pixel_mask is not None:
        pm = pixel_mask.reshape(-1).astype(bool)
        nonzero = nonzero & pm

    ii = jnp.arange(h, dtype=rendering_nocs.dtype)
    jj = jnp.arange(w, dtype=rendering_nocs.dtype)
    gy, gx = jnp.meshgrid(ii, jj, indexing="ij")
    pix = jnp.stack([gy.reshape(-1), gx.reshape(-1)], axis=-1)  # (P,2) (row,col)

    # (R=P, P) pairwise pixel distances; weight = clamp(diam - d, 0)
    d = jnp.sqrt(knn.pairwise_sq_dists(pix, pix))
    wgt = jnp.maximum(diam - d, 0.0)  # (P_r, P_p)

    # diff(r, p) = || css[p] * w(r,p) - rend[r] ||_2 over channels
    # expanded: sum_c (css[p,c] * w - rend[r,c])^2
    css_sq = jnp.sum(css * css, axis=-1)  # (P,)
    rend_sq = jnp.sum(rend * rend, axis=-1)  # (P,)
    # HIGHEST: default TPU precision runs this as bf16 passes whose ~1e-2
    # error (amplified by w^2 up to diam^2) flips the per-pixel argmin and
    # the inlier threshold — same hazard class as pairwise_sq_dists above
    cross = jnp.matmul(rend, css.T,
                       precision=jax.lax.Precision.HIGHEST)  # (P_r, P_p)
    diff_sq = (
        wgt * wgt * css_sq[None, :] - 2.0 * wgt * cross + rend_sq[:, None]
    )
    # Double-where sqrt guard: zero-diff entries (e.g. empty rendered rows
    # against zero-weighted pixels) must not emit NaN gradients.
    pos = diff_sq > 0
    diff = jnp.where(pos, jnp.sqrt(jnp.where(pos, diff_sq, 1.0)), 0.0)

    if pixel_mask is not None:
        diff = jnp.where(pm[None, :], diff, jnp.inf)  # exclude padded p's
    diff_min = jnp.min(diff, axis=-1)  # (P_r,)
    sel = nonzero & (diff_min < threshold_nocs)
    cnt = jnp.sum(sel)
    mean = jnp.sum(jnp.where(sel, diff_min, 0.0)) / cnt  # NaN when cnt == 0
    any_nonzero = jnp.any(nonzero)
    return jnp.where(any_nonzero, mean, 0.0)


def _loss_2d_windowed(
    rendering_nocs: jax.Array,
    css_nocs: jax.Array,
    diam: float,
    threshold_nocs: float,
    pixel_mask: jax.Array | None,
) -> jax.Array:
    """Windowed loss_2d: identical values, O(K^2 P) memory (see loss_2d).

    The dense candidate set {all valid p} splits into (a) p within the
    integer offset disc dy^2+dx^2 < diam^2 of r — enumerated as shifted
    copies of the CSS image with per-OFFSET constant weights — and (b)
    every other p, whose weight is 0 and whose candidate value collapses
    to ||rend[r]||; (b) participates iff at least one valid p has zero
    weight, i.e. total_valid > (valid in-disc count at r).
    """
    c, h, w = rendering_nocs.shape
    dt = rendering_nocs.dtype
    radius, offsets, wgts_list = disc_offsets(diam)
    wgts = jnp.asarray(wgts_list, dt)

    valid = (jnp.ones((h, w), bool) if pixel_mask is None
             else pixel_mask.reshape(h, w).astype(bool))
    css_pad = jnp.pad(css_nocs, ((0, 0), (radius, radius), (radius, radius)))
    val_pad = jnp.pad(valid, ((radius, radius), (radius, radius)))

    css_sh = jnp.stack([
        jax.lax.dynamic_slice(css_pad, (0, radius + dy, radius + dx),
                              (c, h, w))
        for dy, dx in offsets
    ])  # (O, 3, H, W)
    val_sh = jnp.stack([
        jax.lax.dynamic_slice(val_pad, (radius + dy, radius + dx), (h, w))
        for dy, dx in offsets
    ])  # (O, H, W)

    rend_sq = jnp.sum(rendering_nocs * rendering_nocs, axis=0)  # (H, W)
    css_sq_sh = jnp.sum(css_sh * css_sh, axis=1)  # (O, H, W)
    cross_sh = jnp.sum(css_sh * rendering_nocs[None], axis=1)  # (O, H, W)
    wv = wgts[:, None, None]
    diff_sq = wv * wv * css_sq_sh - 2.0 * wv * cross_sh + rend_sq[None]
    diff_sq = jnp.where(val_sh, diff_sq, jnp.inf)
    win_min_sq = jnp.min(diff_sq, axis=0)  # (H, W)

    # fallback candidate ||rend[r]|| from any valid zero-weight p
    total_valid = jnp.sum(valid)
    in_disc_valid = jnp.sum(val_sh, axis=0)  # (H, W)
    has_fallback = total_valid > in_disc_valid
    fb_sq = jnp.where(has_fallback, rend_sq, jnp.inf)
    min_sq = jnp.minimum(win_min_sq, fb_sq)

    pos = (min_sq > 0) & jnp.isfinite(min_sq)
    diff_min = jnp.where(
        pos, jnp.sqrt(jnp.where(pos, min_sq, 1.0)),
        jnp.where(jnp.isfinite(min_sq), 0.0, jnp.inf))

    nonzero = (jnp.sum(rendering_nocs, axis=0) != 0) & valid
    sel = nonzero & (diff_min < threshold_nocs)
    cnt = jnp.sum(sel)
    mean = jnp.sum(jnp.where(sel, diff_min, 0.0)) / cnt  # NaN when cnt == 0
    return jnp.where(jnp.any(nonzero), mean, 0.0)
