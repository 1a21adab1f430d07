"""RANSAC pose initialization from NOCS correspondences — on-device.

Behavioral parity target: utils/pose.py:84-356 (init_pose_3d with
kabsch/procrustes steps). The reference runs ~567 sequential hypotheses
(p=0.99, outlier_prob=0.7, sample 4 — pose.py:127-134), each with two host
KDTree queries; here all hypotheses are evaluated as one vmapped batch:

  * the per-sample "closest NOCS color in the model" KDTree query
    (pose.py:146-149) is precomputed ONCE for every scene point as a
    brute-force NN matmul — hypothesis sampling then just gathers;
  * hypothesis fitting is a batched 3x3 SVD (Kabsch / Procrustes);
  * inlier scoring (transformed scene -> model NN, pose.py:174-197) is a
    chunked (hypotheses x N x M) distance computation on the MXU.

The returned pose follows the reference exactly: the winning hypothesis's
inliers are re-fit with the model->scene direction (pose.py:200-233).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sdflabel_tpu.ops import knn


@dataclasses.dataclass(frozen=True)
class RansacConfig:
    # pose.py:127-134 — derived iteration count for p=.99, outlier .7, n=4
    num_hypotheses: int = 567
    sample_size: int = 4
    metric_threshold: float = 0.15  # pose.py:91
    nocs_threshold: float = 0.15  # pose.py:92
    min_inliers: int = 5  # pose.py:135
    max_scale: float = 3.0  # pose.py:168 (procrustes scale rejection)
    hypothesis_chunk: int = 32  # scoring memory knob (no semantic effect)


class RansacPose(NamedTuple):
    scale: jax.Array  # ()
    rot: jax.Array  # (3, 3)
    tra: jax.Array  # (3,)
    num_inliers: jax.Array  # () int32 — < min_inliers means "no pose found"
    inlier_mask: jax.Array  # (N,) scene-point inliers of the best hypothesis


def kabsch(canonical: jax.Array, predicted: jax.Array):
    """Rigid alignment (pose.py:325-356). Batched-SVD friendly.

    Maps canonical -> predicted frame; returns (R, t) with
    x_pred ~= R @ x_canon + t.
    """
    cm = jnp.mean(canonical, axis=-2, keepdims=True)
    pm = jnp.mean(predicted, axis=-2, keepdims=True)
    cc = canonical - cm
    pc = predicted - pm
    cross = jnp.swapaxes(pc, -1, -2) @ cc
    u, s, vt = jnp.linalg.svd(cross)
    det = jnp.linalg.det(u @ vt)
    flip = jnp.where(det < 0, -1.0, 1.0)
    vt = vt.at[..., -1, :].multiply(flip[..., None])
    rot = u @ vt
    t = pm[..., 0, :] - cm[..., 0, :]
    t = (
        jnp.einsum("...ij,...j->...i", rot, t)
        - jnp.einsum("...ij,...j->...i", rot, pm[..., 0, :])
        + pm[..., 0, :]
    )
    return rot, t


def procrustes(from_pts: jax.Array, to_pts: jax.Array, eps: float = 1e-9):
    """Similarity alignment (pose.py:281-322); returns (c, R, t, valid)."""
    n = from_pts.shape[-2]
    mf = jnp.mean(from_pts, axis=-2, keepdims=True)
    mt = jnp.mean(to_pts, axis=-2, keepdims=True)
    df = from_pts - mf
    dt = to_pts - mt
    sigma_from = jnp.mean(jnp.sum(df * df, axis=-1), axis=-1)
    cov = jnp.swapaxes(dt, -1, -2) @ df / n
    u, d, vt = jnp.linalg.svd(cov)
    tol = d[..., :1] * 3 * jnp.finfo(d.dtype).eps  # numpy matrix_rank default
    rank = jnp.sum(d > tol, axis=-1)
    det = jnp.linalg.det(cov)
    s_last = jnp.where((rank >= 2) & (det < 0), -1.0, 1.0)
    valid = rank >= 2
    vt = vt.at[..., -1, :].multiply(s_last[..., None])
    rot = u @ vt
    sdiag = jnp.concatenate(
        [jnp.ones_like(d[..., :2]), s_last[..., None]], axis=-1
    )
    c = jnp.sum(d * sdiag, axis=-1) / jnp.maximum(sigma_from, eps)
    t = mt[..., 0, :] - c[..., None] * jnp.einsum(
        "...ij,...j->...i", rot, mf[..., 0, :]
    )
    return c, rot, t, valid


def ransac_pose(
    model_pts: jax.Array,
    model_cls: jax.Array,
    model_mask: jax.Array,
    scene_pts: jax.Array,
    scene_cls: jax.Array,
    scene_mask: jax.Array,
    key: jax.Array,
    method: str = "kabsch",
    scale_model: float = 1.0,
    cfg: RansacConfig = RansacConfig(),
) -> RansacPose:
    """Estimate SE(3)(+scale) from NOCS correspondences, reference semantics.

    All arrays are fixed-capacity with masks. method in {kabsch, procrustes}.
    With kabsch, model points are pre-scaled by scale_model (pose.py:121).
    """
    dtype = scene_pts.dtype
    if method == "kabsch":
        model_pts = model_pts * scale_model

    n = scene_pts.shape[0]
    m = model_pts.shape[0]

    # --- Precompute per-scene-point color correspondence (pose.py:146-149)
    color_d, color_idx = knn.nearest_neighbor(scene_cls, model_cls, model_mask)
    corr_pts = jnp.take(model_pts, color_idx, axis=0)  # (N, 3)

    # --- Sample hypotheses: sample_size scene indices each, WITHOUT
    # replacement like the reference (pose.py:139-144), via the exact
    # shifted-uniform draw: the j-th pick is uniform over the v-j
    # remaining valid ranks, shifted past previously chosen ranks in
    # ascending order. Every hypothesis with >= sample_size valid points
    # is therefore distinct-by-construction — rejection sampling would
    # instead LOSE hypotheses (up to ~70% at v=6), breaking the derived
    # p=.99 iteration-count guarantee for sparse masks.
    valid_order = jnp.argsort(~scene_mask)  # stable: valid positions first
    v = jnp.sum(scene_mask)

    def draw_distinct(k):
        ks = jax.random.split(k, cfg.sample_size)
        chosen: list = []
        for j in range(cfg.sample_size):
            r = jax.random.randint(ks[j], (), 0, jnp.maximum(v - j, 1))
            if chosen:
                prev = jnp.sort(jnp.stack(chosen))
                for t in range(j):
                    r = r + (r >= prev[t])
            chosen.append(r)
        return jnp.stack(chosen)

    ranks = jax.vmap(draw_distinct)(
        jax.random.split(key, cfg.num_hypotheses))  # (H, S) ranks < v
    idx = jnp.take(valid_order, ranks, axis=0)  # (H, S) scene indices
    # duplicates remain possible only when v < sample_size (the clamped
    # draw widths overlap); such hypotheses are rejected here
    distinct_ok = jnp.all(
        (idx[:, :, None] != idx[:, None, :])
        | jnp.eye(cfg.sample_size, dtype=bool),
        axis=(-1, -2),
    )

    samp_scene = jnp.take(scene_pts, idx, axis=0)  # (H, 4, 3)
    samp_corr = jnp.take(corr_pts, idx, axis=0)  # (H, 4, 3)
    samp_cd = jnp.take(color_d, idx, axis=0)  # (H, 4)

    # color-compatibility rejection (pose.py:151-153)
    color_ok = jnp.all(samp_cd <= cfg.nocs_threshold, axis=-1)

    # --- Fit hypothesis scene -> model (pose.py:160-168)
    if method == "procrustes":
        c, rot, tra, fit_ok = procrustes(samp_scene, samp_corr)
        fit_ok = fit_ok & (c <= cfg.max_scale)
        scale_h = c
    else:
        rot, tra = kabsch(samp_scene, samp_corr)
        scale_h = jnp.ones((cfg.num_hypotheses,), dtype)
        fit_ok = jnp.ones((cfg.num_hypotheses,), bool)

    hyp_ok = color_ok & fit_ok & distinct_ok

    # --- Score: transformed scene -> model NN inliers (pose.py:171-197)
    def score_chunk(args):
        rot_c, tra_c, scale_c = args  # (B,3,3),(B,3),(B,)
        ts = (
            jnp.einsum("bij,nj->bni", rot_c * scale_c[:, None, None], scene_pts)
            + tra_c[:, None, :]
        )  # (B, N, 3)
        # broadcast form, accumulated per coordinate: exact fp32 on the
        # VPU with a (B, N, M) max intermediate on every backend (the
        # K=3 einsum wastes the MXU contraction; see ops/knn.py)
        d2 = sum(
            jnp.square(ts[:, :, None, c] - model_pts[None, None, :, c])
            for c in range(3)
        )
        d2 = jnp.where(model_mask[None, None, :], d2, jnp.inf)
        nn_idx = jnp.argmin(d2, axis=-1)  # (B, N)
        # min(d2) == d2[argmin]; the reduce fuses where take_along_axis
        # would lower to a TPU serial-window gather (see ops/knn.py).
        nn_d = jnp.sqrt(jnp.maximum(jnp.min(d2, axis=-1), 0.0))
        nn_color = jnp.take(model_cls, nn_idx, axis=0)  # (B, N, 3)
        cd = jnp.linalg.norm(scene_cls[None] - nn_color, axis=-1)
        inlier = (
            (nn_d < cfg.metric_threshold)
            & (cd < cfg.nocs_threshold)
            & scene_mask[None, :]
        )
        return jnp.sum(inlier, axis=-1), inlier

    h = cfg.num_hypotheses
    chunk = min(cfg.hypothesis_chunk, h)
    pad = (-h) % chunk
    rot_p = jnp.concatenate([rot, jnp.tile(jnp.eye(3, dtype=dtype), (pad, 1, 1))])
    tra_p = jnp.concatenate([tra, jnp.zeros((pad, 3), dtype)])
    scale_p = jnp.concatenate([scale_h, jnp.ones((pad,), dtype)])
    counts, inliers = jax.lax.map(
        score_chunk,
        (
            rot_p.reshape(-1, chunk, 3, 3),
            tra_p.reshape(-1, chunk, 3),
            scale_p.reshape(-1, chunk),
        ),
    )
    counts = counts.reshape(-1)[:h]
    inliers = inliers.reshape(-1, n)[:h]
    counts = jnp.where(hyp_ok, counts, -1)

    best = jnp.argmax(counts)
    best_count = counts[best]
    best_inliers = inliers[best]  # (N,)

    # --- Final re-fit on inliers, model -> scene (pose.py:213-224).
    # Weighted (masked) fit: the reference gathers inlier rows; we fit on
    # all rows with inlier weights, which is the same LSQ problem.
    w = best_inliers.astype(dtype)
    wsum = jnp.maximum(jnp.sum(w), 1.0)

    # correspondences for the final fit re-query colors of inlier scene pts
    # (pose.py:216-218) — identical to the precomputed color_idx gather.
    fit_model = corr_pts

    def weighted_kabsch(canon, pred, w):
        cm = jnp.sum(canon * w[:, None], 0) / wsum
        pm = jnp.sum(pred * w[:, None], 0) / wsum
        cc = (canon - cm) * w[:, None]
        pc = pred - pm
        cross = pc.T @ cc
        u, s, vt = jnp.linalg.svd(cross)
        det = jnp.linalg.det(u @ vt)
        vt = vt.at[-1, :].multiply(jnp.where(det < 0, -1.0, 1.0))
        rotf = u @ vt
        t = pm - cm
        t = rotf @ t - rotf @ pm + pm
        return rotf, t

    def weighted_procrustes(from_pts, to_pts, w):
        mf = jnp.sum(from_pts * w[:, None], 0) / wsum
        mt = jnp.sum(to_pts * w[:, None], 0) / wsum
        df = (from_pts - mf) * jnp.sqrt(w)[:, None]
        dt = (to_pts - mt) * jnp.sqrt(w)[:, None]
        sigma_from = jnp.sum(jnp.sum(df * df, -1)) / wsum
        cov = dt.T @ df / wsum
        u, d, vt = jnp.linalg.svd(cov)
        det = jnp.linalg.det(cov)
        s_last = jnp.where(det < 0, -1.0, 1.0)
        vt = vt.at[-1, :].multiply(s_last)
        rotf = u @ vt
        sdiag = jnp.asarray([1.0, 1.0, 0.0], dtype) + jnp.asarray(
            [0.0, 0.0, 1.0], dtype
        ) * s_last
        c = jnp.sum(d * sdiag) / jnp.maximum(sigma_from, 1e-9)
        t = mt - c * (rotf @ mf)
        return c, rotf, t

    if method == "procrustes":
        c_f, rot_f, tra_f = weighted_procrustes(fit_model, scene_pts, w)
        scale_f = c_f
    else:
        rot_f, tra_f = weighted_kabsch(fit_model, scene_pts, w)
        scale_f = jnp.asarray(scale_model, dtype)

    return RansacPose(
        scale=scale_f,
        rot=rot_f,
        tra=tra_f,
        num_inliers=best_count.astype(jnp.int32),
        inlier_mask=best_inliers,
    )
