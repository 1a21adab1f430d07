"""Fused Pallas surfel-splat kernels: forward + custom VJP.

This is the production compute path for the differentiable renderer
(SURVEY.md §2.C.6, §7.3 "hard part #1"). Semantics match ops.splat.
splat_surfel(softclamp=False, add_bg=False) composed with the feature
matmul in renderer.rasterer — i.e. it returns the composited image
directly:

    img[p, :] = sum_i prob[i, p] * features[i, :]
    prob = softmax_i(masked scores) * footprint        (per pixel p)

computed BLOCKWISE: the (N x P) score/footprint/probability matrices are
never materialized in HBM. Three 2D-grid kernels (pixel blocks x point
chunks) with VMEM scratch accumulators:

  fwd:  [znorm]    — per-pixel z-norm reduction (primitives.py:229-231)
        [softmax]  — online softmax (flash-style running max/denominator)
                     + feature composite accumulation
  bwd:  [grads]    — point-major accumulation of dV, dN, dF; the per-pixel
                     softmax correction needs NO kernel pass at all —
                     corr_p = sum_i p_ip (g_p.f_i) = g_p . img_p, i.e. a
                     dot of the cotangent with the saved forward output

Layout discipline: every per-pixel vector rides the LANE dimension
((1, PB) rows; kg and the cotangent arrive pre-transposed) and every
per-point vector rides the SUBLANE dimension ((C, 1) columns), so the
kernels contain no transposes and no tiny-K matmuls — pure VPU broadcast
arithmetic, which at K=3 / F=8 contraction sizes beats MXU dispatch and
sidesteps Mosaic relayout blowups (the first formulation OOM'd scoped
VMEM on exactly those relayouts).

Distance form: ||v - g z||^2 expanded as vv - 2 (v.g) z + (g.g) z^2 —
no (N,P,3) tensor anywhere (the dense oracle in ops.splat keeps the
reference's explicit form for bit-parity with torch; this kernel trades
last-ulp footprint agreement for bandwidth).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NK_EPS_THRESHOLD = 0.01  # primitives.py:213 guard on n . Kinv p
NEG_BIG = -1e30
_EPS = float(np.finfo(np.float32).eps)
NUM_FEATURES = 8  # [color(3) | mask(1) | depth(1) | normal(3)]
# Tile sizes, env-overridable for on-chip sweeps
# (scripts/measure_splat_blocks.py). Round-3 sweep at the production
# 4096 x 1024 refine scale (rays/s of the full iteration, 240-iter scan):
# 256/512: 421k · 256/1024: 422k · 512/512: 447k (best, +6%) ·
# 512/1024: 444k · 1024/512: 441k · 1024/1024: VMEM OOM.
_DEF_BLOCK_PX = int(os.environ.get("SDFLABEL_SPLAT_BLOCK_PX", "512"))
_DEF_CHUNK = int(os.environ.get("SDFLABEL_SPLAT_CHUNK", "512"))
# Row-binned sparse splatting: pixel-block size for the binned kernels.
# -1 = auto (on at 512 for renders >= _BIN_MIN_PX pixels, off below — the
# measured crossover, see BENCH_NOTES "Row-binned splat"), 0 = always off.
_DEF_BIN_PX = int(os.environ.get("SDFLABEL_SPLAT_BIN_PX", "-1"))
_BIN_AUTO_PX = 512
_BIN_MIN_PX = 4096


def _round_up(x, m):
    return (x + m - 1) // m * m


def _geometry(pts_ref, kg_ref, diam):
    """Per-(chunk, pixel-block) geometry, transpose-free.

    pts_ref: (C, 8) [v(3), n(3), mask, pad]; kg_ref: (4, PB) ROWS
    [gx; gy; gz; gg]. Returns z (C,PB), nk, guard, fp.
    """
    v0, v1, v2 = pts_ref[:, 0:1], pts_ref[:, 1:2], pts_ref[:, 2:3]  # (C,1)
    n0, n1, n2 = pts_ref[:, 3:4], pts_ref[:, 4:5], pts_ref[:, 5:6]
    mask = pts_ref[:, 6:7]
    gx, gy, gz = kg_ref[0:1, :], kg_ref[1:2, :], kg_ref[2:3, :]  # (1,PB)
    gg = kg_ref[3:4, :]

    nv = n0 * v0 + n1 * v1 + n2 * v2  # (C,1)
    vv = v0 * v0 + v1 * v1 + v2 * v2
    nk_raw = n0 * gx + n1 * gy + n2 * gz  # (C,PB)
    guard = jnp.abs(nk_raw) < NK_EPS_THRESHOLD
    nk = jnp.where(guard, _EPS, nk_raw)
    z = nv / nk
    vk = v0 * gx + v1 * gy + v2 * gz
    dist_sq = vv - 2.0 * vk * z + gg * z * z
    # (diam - sqrt(dist_sq)) > 0  <=>  dist_sq < diam^2 — sqrt-free footprint
    fp = dist_sq < diam * diam
    fp = fp & (mask > 0.5)
    return z, nk, guard, fp


def _znorm_kernel(pts_ref, kg_ref, zn_ref, ssq_ref, *, diam):
    c_idx = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    z, _, _, fp = _geometry(pts_ref, kg_ref, diam)

    @pl.when(c_idx == 0)
    def _():
        ssq_ref[:, :] = jnp.zeros_like(ssq_ref)

    zm = jnp.where(fp, z, 0.0)
    ssq_ref[:, :] += jnp.sum(zm * zm, axis=0, keepdims=True)

    @pl.when(c_idx == n_chunks - 1)
    def _():
        zn_ref[:, :] = jnp.sqrt(ssq_ref[:, :])


def _softmax_kernel(pts_ref, feat_ref, kg_ref, zn_ref, img_ref, m_ref,
                    d_ref, sm_m, sm_d, sm_acc, *, diam, depth_constant):
    c_idx = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    # per-pixel reciprocal hoisted out of the (C, PB) interaction math —
    # one (1, PB) divide instead of a (C, PB) one (VPU divides are the
    # expensive op in this pass)
    inv_zn = 1.0 / (zn_ref[0:1, :] + _EPS)  # (1, PB)

    z, _, _, fp = _geometry(pts_ref, kg_ref, diam)
    s = jnp.maximum(-z * inv_zn + 1.0, 0.0) * depth_constant
    s = jnp.where(fp, s, NEG_BIG)

    @pl.when(c_idx == 0)
    def _():
        sm_m[:, :] = jnp.full_like(sm_m, NEG_BIG)
        sm_d[:, :] = jnp.zeros_like(sm_d)
        sm_acc[:, :] = jnp.zeros_like(sm_acc)

    m_prev = sm_m[0:1, :]
    cmax = jnp.max(s, axis=0, keepdims=True)
    new_m = jnp.maximum(m_prev, cmax)
    scale = jnp.exp(m_prev - new_m)  # (1, PB)
    w = jnp.where(fp, jnp.exp(s - new_m), 0.0)  # (C, PB)
    sm_m[:, :] = new_m
    sm_d[:, :] = sm_d[:, :] * scale + jnp.sum(w, axis=0, keepdims=True)
    for f in range(NUM_FEATURES):
        sm_acc[f : f + 1, :] = sm_acc[f : f + 1, :] * scale + jnp.sum(
            w * feat_ref[:, f : f + 1], axis=0, keepdims=True
        )

    @pl.when(c_idx == n_chunks - 1)
    def _():
        d = sm_d[:, :]
        inv = jnp.where(d > 0, 1.0 / jnp.maximum(d, 1e-30), 0.0)
        img_ref[:, :] = sm_acc[:, :] * inv
        m_ref[:, :] = sm_m[:, :]
        d_ref[:, :] = d


def _probs(pts_ref, kg_ref, inv_zn, m, inv_d, diam, depth_constant):
    z, nk, guard, fp = _geometry(pts_ref, kg_ref, diam)
    x = -z * inv_zn + 1.0
    s = jnp.maximum(x, 0.0) * depth_constant
    w = jnp.where(fp, jnp.exp(s - m), 0.0)
    p = w * inv_d
    return z, nk, guard, x, p


def _grads_kernel(pts_ref, feat_ref, kg_ref, gimg_ref, m_ref, d_ref, zn_ref,
                  corr_ref, dv_ref, dn_ref, df_ref, *, diam, depth_constant):
    # grid: (N_chunks, P_blocks) — point chunk OUTER, pixel block INNER so
    # the per-point gradient OUTPUT block is revisited across the inner
    # sweep (sequential grid) and accumulated in place.
    p_idx = pl.program_id(1)
    d = d_ref[0:1, :]
    inv_d = jnp.where(d > 0, 1.0 / jnp.maximum(d, 1e-30), 0.0)
    inv_zn = 1.0 / (zn_ref[0:1, :] + _EPS)
    z, nk, guard, x, p = _probs(pts_ref, kg_ref, inv_zn, m_ref[0:1, :],
                                inv_d, diam, depth_constant)
    v0, v1, v2 = pts_ref[:, 0:1], pts_ref[:, 1:2], pts_ref[:, 2:3]
    n0, n1, n2 = pts_ref[:, 3:4], pts_ref[:, 4:5], pts_ref[:, 5:6]

    @pl.when(p_idx == 0)
    def _():
        dv_ref[:, :] = jnp.zeros_like(dv_ref)
        dn_ref[:, :] = jnp.zeros_like(dn_ref)
        df_ref[:, :] = jnp.zeros_like(df_ref)

    # NOTE: expressing u/df/dn as dot_general MXU contractions was
    # measured at 0.986x (round 3) — Mosaic relayouts of the (C, PB)
    # operands cost more than the VPU loop they replace, confirming the
    # module-docstring layout rule. VPU broadcast loops stay.
    gx, gy, gz = kg_ref[0:1, :], kg_ref[1:2, :], kg_ref[2:3, :]
    u = jnp.zeros_like(p)
    for f in range(NUM_FEATURES):
        u = u + feat_ref[:, f : f + 1] * gimg_ref[f : f + 1, :]
    ds = p * (u - corr_ref[0:1, :])
    dx = jnp.where(x > 0, ds * depth_constant, 0.0)
    dz = -dx * inv_zn
    dnv = jnp.where(guard, 0.0, dz / nk)  # (C, PB)
    dnk = jnp.where(guard, 0.0, -dnv * z)  # == -dz*z/nk, one divide saved
    dnv_i = jnp.sum(dnv, axis=1, keepdims=True)  # (C, 1)

    for f in range(NUM_FEATURES):
        df_ref[:, f : f + 1] += jnp.sum(
            p * gimg_ref[f : f + 1, :], axis=1, keepdims=True
        )
    dn_ref[:, 0:1] += dnv_i * v0 + jnp.sum(dnk * gx, axis=1, keepdims=True)
    dn_ref[:, 1:2] += dnv_i * v1 + jnp.sum(dnk * gy, axis=1, keepdims=True)
    dn_ref[:, 2:3] += dnv_i * v2 + jnp.sum(dnk * gz, axis=1, keepdims=True)
    dv_ref[:, 0:1] += dnv_i * n0
    dv_ref[:, 1:2] += dnv_i * n1
    dv_ref[:, 2:3] += dnv_i * n2


# ---------------------------------------------------------------------------
# Row-binned kernels: skip (point-chunk, pixel-block) pairs that cannot
# interact.
#
# At refinement scale each splat's footprint is ~2 px radius while the
# dense kernels sweep every point chunk over every pixel block — ~4:1
# wasted VPU interaction math (the round-3 profile's dominant non-MXU
# cost). Binning: points are sorted by the FIRST pixel row-block their
# footprint can touch; each row-block then reads a contiguous window of
# the sorted array via scalar-prefetched chunk offsets, and chunks
# outside the window are predicated off with pl.when. Correctness never
# depends on the bin bounds being tight: the kernels evaluate the exact
# footprint test for every (point, pixel) pair they do visit, so the
# bounds only need to be CONSERVATIVE (a missed pair would be silent
# wrongness; an extra pair is just wasted work). Degenerate points
# (behind / straddling the camera plane, where no depth bound exists)
# conservatively overlap every block, gracefully degrading that
# iteration toward the dense sweep.
#
# Conservative row bound (no intrinsics needed — derived from the ray
# grid itself): a pixel ray g can only splat point v if the tangent-disc
# intersection x = g*z lands within diam of v, which needs
# |v_z - g_z z| <= diam and |v_y - g_y z| <= diam componentwise. With
# per-block bounds on g_z this caps z in [zlo/gz_hi, zhi/gz_lo] and
# therefore g_y in the corner range of (v_y ± diam)/z — compared against
# the block's actual [min g_y, max g_y]. Monotonicity of g_y over rows
# makes the touched blocks an interval, but even if it were not, the
# [first, last] interval is a superset and stays conservative.
# ---------------------------------------------------------------------------


def _compute_bins(pts, kg_t, diam, block_px, chunk):
    """Sort points by first touchable row-block; per-block chunk windows.

    Returns (order, start_chunk, n_chunks) — `order` a permutation of the
    padded point axis, and for each of the P//block_px row-blocks the
    first chunk index of its window in the sorted array and the number of
    chunks to visit. All int32. Pure XLA; runs once per iteration and is
    shared by the three kernel passes.
    """
    n_blocks = kg_t.shape[1] // block_px
    gy = kg_t[1].reshape(n_blocks, block_px)
    gz = kg_t[2].reshape(n_blocks, block_px)
    m_b, big_m = gy.min(1), gy.max(1)  # (B,)
    gz_lo, gz_hi = gz.min(1), gz.max(1)

    v_y, v_z, mask = pts[:, 1], pts[:, 2], pts[:, 6]
    zlo, zhi = v_z - diam, v_z + diam
    ylo, yhi = v_y - diam, v_y + diam

    safe_zlo = jnp.maximum(zlo, 1e-12)[:, None]
    safe_gzlo = jnp.maximum(gz_lo, 1e-12)[None, :]
    t_lo = safe_zlo / jnp.maximum(gz_hi, 1e-12)[None, :]  # (N, B)
    t_hi = zhi[:, None] / safe_gzlo
    gy_lo = jnp.minimum(ylo[:, None] / t_lo, ylo[:, None] / t_hi)
    gy_hi = jnp.maximum(yhi[:, None] / t_lo, yhi[:, None] / t_hi)
    ov = (gy_lo <= big_m[None, :]) & (gy_hi >= m_b[None, :])
    # no usable depth/ray bound -> conservatively touch everything
    ov = ov | (gz_lo <= 0)[None, :]
    ov = jnp.where((zlo > 0)[:, None], ov, True)
    ov = ov & (mask > 0.5)[:, None]  # masked/padded points touch nothing

    any_ov = ov.any(axis=1)
    first = jnp.argmax(ov, axis=1).astype(jnp.int32)
    last = (n_blocks - 1) - jnp.argmax(ov[:, ::-1], axis=1).astype(jnp.int32)
    span = jnp.where(any_ov, last - first, 0)
    # no-overlap points (masked / padded / out of frame) sort PAST every
    # window (keys run up to b == n_blocks - 1), so no kernel ever visits
    # them — with capacity padding they can be thousands of dead slots
    key = jnp.where(any_ov, first, n_blocks)

    order = jnp.argsort(key).astype(jnp.int32)
    key_sorted = jnp.take(key, order)
    smax = jnp.max(span)

    blocks = jnp.arange(n_blocks, dtype=jnp.int32)
    starts = jnp.searchsorted(key_sorted, blocks - smax, side="left")
    ends = jnp.searchsorted(key_sorted, blocks, side="right")
    start_chunk = (starts // chunk).astype(jnp.int32)
    end_chunk = ((ends + chunk - 1) // chunk).astype(jnp.int32)
    n_chunks = jnp.maximum(end_chunk - start_chunk, 0).astype(jnp.int32)
    return order, start_chunk, n_chunks


def _znorm_kernel_binned(sc_ref, nc_ref, pts_ref, kg_ref, zn_ref, ssq_ref,
                         *, diam):
    b = pl.program_id(0)
    c = pl.program_id(1)
    n_c = pl.num_programs(1)

    @pl.when(c == 0)
    def _():
        ssq_ref[:, :] = jnp.zeros_like(ssq_ref)

    @pl.when(c < nc_ref[b])
    def _():
        z, _, _, fp = _geometry(pts_ref, kg_ref, diam)
        zm = jnp.where(fp, z, 0.0)
        ssq_ref[:, :] += jnp.sum(zm * zm, axis=0, keepdims=True)

    @pl.when(c == n_c - 1)
    def _():
        zn_ref[:, :] = jnp.sqrt(ssq_ref[:, :])


def _softmax_kernel_binned(sc_ref, nc_ref, pts_ref, feat_ref, kg_ref, zn_ref,
                           img_ref, m_ref, d_ref, sm_m, sm_d, sm_acc, *,
                           diam, depth_constant):
    b = pl.program_id(0)
    c = pl.program_id(1)
    n_c = pl.num_programs(1)

    @pl.when(c == 0)
    def _():
        sm_m[:, :] = jnp.full_like(sm_m, NEG_BIG)
        sm_d[:, :] = jnp.zeros_like(sm_d)
        sm_acc[:, :] = jnp.zeros_like(sm_acc)

    @pl.when(c < nc_ref[b])
    def _():
        inv_zn = 1.0 / (zn_ref[0:1, :] + _EPS)  # hoisted, see dense kernel
        z, _, _, fp = _geometry(pts_ref, kg_ref, diam)
        s = jnp.maximum(-z * inv_zn + 1.0, 0.0) * depth_constant
        s = jnp.where(fp, s, NEG_BIG)
        m_prev = sm_m[0:1, :]
        cmax = jnp.max(s, axis=0, keepdims=True)
        new_m = jnp.maximum(m_prev, cmax)
        scale = jnp.exp(m_prev - new_m)
        w = jnp.where(fp, jnp.exp(s - new_m), 0.0)
        sm_m[:, :] = new_m
        sm_d[:, :] = sm_d[:, :] * scale + jnp.sum(w, axis=0, keepdims=True)
        for f in range(NUM_FEATURES):
            sm_acc[f : f + 1, :] = sm_acc[f : f + 1, :] * scale + jnp.sum(
                w * feat_ref[:, f : f + 1], axis=0, keepdims=True
            )

    @pl.when(c == n_c - 1)
    def _():
        d = sm_d[:, :]
        inv = jnp.where(d > 0, 1.0 / jnp.maximum(d, 1e-30), 0.0)
        img_ref[:, :] = sm_acc[:, :] * inv
        m_ref[:, :] = sm_m[:, :]
        d_ref[:, :] = d


def _grads_kernel_binned(sc_ref, nc_ref, pts_ref, feat_ref, kg_ref, gimg_ref,
                         m_ref, d_ref, zn_ref, corr_ref, dv_ref, dn_ref,
                         df_ref, *, diam, depth_constant):
    # grid: (global point chunk OUTER, pixel block INNER) — the per-point
    # gradient output block is revisited across the inner pixel sweep and
    # accumulated in place; inactive (chunk, block) pairs (the chunk is
    # outside the block's window) are predicated off.
    c = pl.program_id(0)
    b = pl.program_id(1)

    @pl.when(b == 0)
    def _():
        dv_ref[:, :] = jnp.zeros_like(dv_ref)
        dn_ref[:, :] = jnp.zeros_like(dn_ref)
        df_ref[:, :] = jnp.zeros_like(df_ref)

    @pl.when((c >= sc_ref[b]) & (c < sc_ref[b] + nc_ref[b]))
    def _():
        d = d_ref[0:1, :]
        inv_d = jnp.where(d > 0, 1.0 / jnp.maximum(d, 1e-30), 0.0)
        inv_zn = 1.0 / (zn_ref[0:1, :] + _EPS)
        z, nk, guard, x, p = _probs(pts_ref, kg_ref, inv_zn, m_ref[0:1, :],
                                    inv_d, diam, depth_constant)
        v0, v1, v2 = pts_ref[:, 0:1], pts_ref[:, 1:2], pts_ref[:, 2:3]
        n0, n1, n2 = pts_ref[:, 3:4], pts_ref[:, 4:5], pts_ref[:, 5:6]

        gx, gy, gz = kg_ref[0:1, :], kg_ref[1:2, :], kg_ref[2:3, :]
        u = jnp.zeros_like(p)
        for f in range(NUM_FEATURES):
            u = u + feat_ref[:, f : f + 1] * gimg_ref[f : f + 1, :]
        ds = p * (u - corr_ref[0:1, :])
        dx = jnp.where(x > 0, ds * depth_constant, 0.0)
        dz = -dx * inv_zn
        dnv = jnp.where(guard, 0.0, dz / nk)
        dnk = jnp.where(guard, 0.0, -dnv * z)
        dnv_i = jnp.sum(dnv, axis=1, keepdims=True)

        for f in range(NUM_FEATURES):
            df_ref[:, f : f + 1] += jnp.sum(
                p * gimg_ref[f : f + 1, :], axis=1, keepdims=True
            )
        dn_ref[:, 0:1] += dnv_i * v0 + jnp.sum(dnk * gx, axis=1,
                                               keepdims=True)
        dn_ref[:, 1:2] += dnv_i * v1 + jnp.sum(dnk * gy, axis=1,
                                               keepdims=True)
        dn_ref[:, 2:3] += dnv_i * v2 + jnp.sum(dnk * gz, axis=1,
                                               keepdims=True)
        dv_ref[:, 0:1] += dnv_i * n0
        dv_ref[:, 1:2] += dnv_i * n1
        dv_ref[:, 2:3] += dnv_i * n2


# ---------------------------------------------------------------------------
# Host-side wrapper with custom VJP
# ---------------------------------------------------------------------------


def _pack(points_cam, normals_cam, point_mask, features, kinv_grid, chunk,
          block_px):
    n = points_cam.shape[0]
    p = kinv_grid.shape[0]
    n_pad = _round_up(max(n, chunk), chunk)
    p_pad = _round_up(p, block_px)
    mask = (jnp.ones((n,), jnp.float32) if point_mask is None
            else point_mask.astype(jnp.float32))
    pts = jnp.concatenate(
        [points_cam.astype(jnp.float32), normals_cam.astype(jnp.float32),
         mask[:, None], jnp.zeros((n, 1), jnp.float32)], axis=-1,
    )
    pts = jnp.pad(pts, ((0, n_pad - n), (0, 0)))
    feats = jnp.pad(features.astype(jnp.float32), ((0, n_pad - n), (0, 0)))
    # kg transposed: rows [gx; gy; gz; gg], shape (4, p_pad)
    kg_t = jnp.concatenate(
        [kinv_grid.astype(jnp.float32).T,
         jnp.sum(kinv_grid * kinv_grid, -1)[None, :].astype(jnp.float32)], 0
    )
    kg_t = jnp.pad(kg_t, ((0, 0), (0, p_pad - p)), mode="edge")
    return pts, feats, kg_t, n_pad, p_pad


def _fwd_call(points_cam, normals_cam, features, kinv_grid, point_mask,
              diam, depth_constant, block_px, chunk, bin_px):
    p = kinv_grid.shape[0]
    f = features.shape[1]
    assert f == NUM_FEATURES, f
    pts, feats, kg_t, n_pad, p_pad = _pack(
        points_cam, normals_cam, point_mask, features, kinv_grid, chunk,
        block_px if not bin_px else bin_px,
    )
    n_chunks = n_pad // chunk

    if bin_px:
        pb = bin_px
        order, sc, nc = _compute_bins(pts, kg_t, diam, pb, chunk)
        pts = jnp.take(pts, order, axis=0)
        feats = jnp.take(feats, order, axis=0)
        max_chunk = n_chunks - 1

        pts_spec = pl.BlockSpec(
            (chunk, 8),
            lambda b, c, sc, nc: (jnp.minimum(sc[b] + c, max_chunk), 0),
            memory_space=pltpu.VMEM)
        feat_spec = pl.BlockSpec(
            (chunk, f),
            lambda b, c, sc, nc: (jnp.minimum(sc[b] + c, max_chunk), 0),
            memory_space=pltpu.VMEM)
        kg_spec = pl.BlockSpec((4, pb), lambda b, c, sc, nc: (0, b),
                               memory_space=pltpu.VMEM)
        row_spec = lambda w: pl.BlockSpec(
            (w, pb), lambda b, c, sc, nc: (0, b), memory_space=pltpu.VMEM)

        zn = pl.pallas_call(
            functools.partial(_znorm_kernel_binned, diam=diam),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(p_pad // pb, n_chunks),
                in_specs=[pts_spec, kg_spec],
                out_specs=row_spec(1),
                scratch_shapes=[pltpu.VMEM((1, pb), jnp.float32)],
            ),
            out_shape=jax.ShapeDtypeStruct((1, p_pad), jnp.float32),
        )(sc, nc, pts, kg_t)

        img_t, m, d = pl.pallas_call(
            functools.partial(_softmax_kernel_binned, diam=diam,
                              depth_constant=depth_constant),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(p_pad // pb, n_chunks),
                in_specs=[pts_spec, feat_spec, kg_spec, row_spec(1)],
                out_specs=[row_spec(f), row_spec(1), row_spec(1)],
                scratch_shapes=[
                    pltpu.VMEM((1, pb), jnp.float32),
                    pltpu.VMEM((1, pb), jnp.float32),
                    pltpu.VMEM((f, pb), jnp.float32),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((f, p_pad), jnp.float32),
                jax.ShapeDtypeStruct((1, p_pad), jnp.float32),
                jax.ShapeDtypeStruct((1, p_pad), jnp.float32),
            ],
        )(sc, nc, pts, feats, kg_t, zn)
        return img_t[:, :p].T, (pts, feats, kg_t, m, d, zn, img_t,
                                points_cam.shape[0], p, order, sc, nc)

    pb = block_px

    pts_spec = pl.BlockSpec((chunk, 8), lambda i, c: (c, 0),
                            memory_space=pltpu.VMEM)
    feat_spec = pl.BlockSpec((chunk, f), lambda i, c: (c, 0),
                             memory_space=pltpu.VMEM)
    kg_spec = pl.BlockSpec((4, pb), lambda i, c: (0, i),
                           memory_space=pltpu.VMEM)
    row_spec = lambda w: pl.BlockSpec((w, pb), lambda i, c: (0, i),
                                      memory_space=pltpu.VMEM)

    zn = pl.pallas_call(
        functools.partial(_znorm_kernel, diam=diam),
        grid=(p_pad // pb, n_chunks),
        in_specs=[pts_spec, kg_spec],
        out_specs=row_spec(1),
        out_shape=jax.ShapeDtypeStruct((1, p_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, pb), jnp.float32)],
    )(pts, kg_t)

    img_t, m, d = pl.pallas_call(
        functools.partial(_softmax_kernel, diam=diam,
                          depth_constant=depth_constant),
        grid=(p_pad // pb, n_chunks),
        in_specs=[pts_spec, feat_spec, kg_spec, row_spec(1)],
        out_specs=[row_spec(f), row_spec(1), row_spec(1)],
        out_shape=[
            jax.ShapeDtypeStruct((f, p_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, p_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, p_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, pb), jnp.float32),
            pltpu.VMEM((1, pb), jnp.float32),
            pltpu.VMEM((f, pb), jnp.float32),
        ],
    )(pts, feats, kg_t, zn)
    return img_t[:, :p].T, (pts, feats, kg_t, m, d, zn, img_t,
                            points_cam.shape[0], p, None, None, None)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _surfel_composite_core(points_cam, normals_cam, features, kinv_grid,
                           point_mask, diam, depth_constant, block_px,
                           chunk, bin_px):
    out, _ = _fwd_call(points_cam, normals_cam, features, kinv_grid,
                       point_mask, diam, depth_constant, block_px, chunk,
                       bin_px)
    return out


def _core_fwd(points_cam, normals_cam, features, kinv_grid, point_mask,
              diam, depth_constant, block_px, chunk, bin_px):
    out, res = _fwd_call(points_cam, normals_cam, features, kinv_grid,
                         point_mask, diam, depth_constant, block_px, chunk,
                         bin_px)
    return out, res


def _core_bwd(diam, depth_constant, block_px, chunk, bin_px, res, g_img):
    pts, feats, kg_t, m, d, zn, img_t, n, p, order, sc, nc = res
    n_pad, f = feats.shape
    n_chunks = n_pad // chunk
    p_pad = kg_t.shape[1]
    pb = bin_px if bin_px else block_px

    g_img_t = jnp.pad(g_img.astype(jnp.float32).T, ((0, 0), (0, p_pad - p)))

    # Softmax-correction identity: corr_p = sum_i p_ip (g_p . f_i)
    #                                     = g_p . (sum_i p_ip f_i) = g_p . img_p
    # — the forward output IS the probability-weighted feature sum, so the
    # whole correction pass collapses to one tiny elementwise reduction.
    corr = jnp.sum(g_img_t * img_t, axis=0, keepdims=True)  # (1, p_pad)

    if bin_px:
        max_chunk = n_chunks - 1  # noqa: F841 (kept for symmetry with fwd)
        pts_spec_b = pl.BlockSpec((chunk, 8), lambda c, b, sc, nc: (c, 0),
                                  memory_space=pltpu.VMEM)
        feat_spec_b = pl.BlockSpec((chunk, f), lambda c, b, sc, nc: (c, 0),
                                   memory_space=pltpu.VMEM)
        kg_spec_b = pl.BlockSpec((4, pb), lambda c, b, sc, nc: (0, b),
                                 memory_space=pltpu.VMEM)
        row_spec_b = lambda w: pl.BlockSpec(
            (w, pb), lambda c, b, sc, nc: (0, b), memory_space=pltpu.VMEM)
        pt_out_b = lambda w: pl.BlockSpec(
            (chunk, w), lambda c, b, sc, nc: (c, 0), memory_space=pltpu.VMEM)

        dv, dn, df = pl.pallas_call(
            functools.partial(_grads_kernel_binned, diam=diam,
                              depth_constant=depth_constant),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(n_chunks, p_pad // pb),
                in_specs=[pts_spec_b, feat_spec_b, kg_spec_b, row_spec_b(f),
                          row_spec_b(1), row_spec_b(1), row_spec_b(1),
                          row_spec_b(1)],
                out_specs=[pt_out_b(3), pt_out_b(3), pt_out_b(f)],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((n_pad, 3), jnp.float32),
                jax.ShapeDtypeStruct((n_pad, 3), jnp.float32),
                jax.ShapeDtypeStruct((n_pad, f), jnp.float32),
            ],
        )(sc, nc, pts, feats, kg_t, g_img_t, m, d, zn, corr)
        # grads are in sorted order; route each original point to its slot
        inv = jnp.argsort(order)[:n]
        return (jnp.take(dv, inv, axis=0), jnp.take(dn, inv, axis=0),
                jnp.take(df, inv, axis=0), None, None)

    # point-major sweep: grid (N_chunks, P_blocks), per-point outputs
    # revisited+accumulated across the inner pixel sweep
    pts_spec2 = pl.BlockSpec((chunk, 8), lambda c, i: (c, 0),
                             memory_space=pltpu.VMEM)
    feat_spec2 = pl.BlockSpec((chunk, f), lambda c, i: (c, 0),
                              memory_space=pltpu.VMEM)
    kg_spec2 = pl.BlockSpec((4, pb), lambda c, i: (0, i),
                            memory_space=pltpu.VMEM)
    row_spec2 = lambda w: pl.BlockSpec((w, pb), lambda c, i: (0, i),
                                       memory_space=pltpu.VMEM)
    pt_out = lambda w: pl.BlockSpec((chunk, w), lambda c, i: (c, 0),
                                    memory_space=pltpu.VMEM)

    dv, dn, df = pl.pallas_call(
        functools.partial(_grads_kernel, diam=diam,
                          depth_constant=depth_constant),
        grid=(n_chunks, p_pad // pb),
        in_specs=[pts_spec2, feat_spec2, kg_spec2, row_spec2(f),
                  row_spec2(1), row_spec2(1), row_spec2(1), row_spec2(1)],
        out_specs=[pt_out(3), pt_out(3), pt_out(f)],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 3), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 3), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, f), jnp.float32),
        ],
    )(pts, feats, kg_t, g_img_t, m, d, zn, corr)
    return dv[:n], dn[:n], df[:n], None, None


_surfel_composite_core.defvjp(_core_fwd, _core_bwd)


def surfel_composite(
    points_cam: jax.Array,
    normals_cam: jax.Array,
    features: jax.Array,
    kinv_grid: jax.Array,
    point_mask: jax.Array | None = None,
    diam: float = 0.04,
    depth_constant: float = 150.0,
    block_px: int = _DEF_BLOCK_PX,
    chunk: int = _DEF_CHUNK,
    bin_px: int | None = None,
) -> jax.Array:
    """Fused surfel splat + composite: (P, F=8) image rows.

    Equivalent to splat_surfel(softclamp=False, add_bg=False) followed by
    prob.T @ features. `point_mask` folds into the packed point buffer (a
    masked point has zero footprint — exact no-op). Gradients flow to
    points, normals, and features (footprint is hard/detached, depth
    softmax soft — reference semantics). `kinv_grid` is GRADIENT-DEAD
    here (zero cotangent): camera intrinsics are never optimized in this
    framework; the dense oracle does differentiate through it, so do not
    swap paths inside a loss that optimizes K. The result is returned in
    the input dtype (the kernel accumulates fp32 internally, like the
    oracle under HIGHEST precision).

    `bin_px`: row-binned sparse splatting (see the binned-kernel section
    above). None = module default (auto: on at 512-px blocks for renders
    >= 4096 px — measured 1.3x at 64x64 up to 3.9x at 200x100 — off at
    refinement scale where the sort/gather overhead exceeds the win);
    0 = force dense; > 0 = force that pixel-block size. Binned reductions
    accumulate in sorted point order: same values to fp32 reassociation
    scale, not bit-identical to the dense sweep.
    """
    pm = None
    if point_mask is not None:
        pm = jax.lax.stop_gradient(point_mask.astype(jnp.float32))
    chunk = min(chunk, _round_up(max(points_cam.shape[0], 128), 128))
    # don't pad tiny renders up to a full block (e.g. 16x16 crops)
    block_px = min(block_px, _round_up(max(kinv_grid.shape[0], 128), 128))
    if bin_px is None:
        bin_px = _DEF_BIN_PX
    if bin_px < 0:  # auto: measured win from _BIN_MIN_PX pixels up
        bin_px = _BIN_AUTO_PX if kinv_grid.shape[0] >= _BIN_MIN_PX else 0
    # binning needs >= 2 row-blocks to skip anything; fall back to dense
    if bin_px and kinv_grid.shape[0] < 2 * bin_px:
        bin_px = 0
    out = _surfel_composite_core(points_cam, normals_cam, features,
                                 kinv_grid, pm, diam, depth_constant,
                                 block_px, chunk, bin_px)
    return out.astype(points_cam.dtype)
