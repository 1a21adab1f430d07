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
    znorm = zn_ref[0:1, :]  # (1, PB)

    z, _, _, fp = _geometry(pts_ref, kg_ref, diam)
    s = jnp.maximum(-z / (znorm + _EPS) + 1.0, 0.0) * depth_constant
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


def _probs(pts_ref, kg_ref, zn, m, inv_d, diam, depth_constant):
    z, nk, guard, fp = _geometry(pts_ref, kg_ref, diam)
    x = -z / (zn + _EPS) + 1.0
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
    znorm = zn_ref[0:1, :]
    z, nk, guard, x, p = _probs(pts_ref, kg_ref, znorm, m_ref[0:1, :],
                                inv_d, diam, depth_constant)
    gx, gy, gz = kg_ref[0:1, :], kg_ref[1:2, :], kg_ref[2:3, :]
    v0, v1, v2 = pts_ref[:, 0:1], pts_ref[:, 1:2], pts_ref[:, 2:3]
    n0, n1, n2 = pts_ref[:, 3:4], pts_ref[:, 4:5], pts_ref[:, 5:6]

    @pl.when(p_idx == 0)
    def _():
        dv_ref[:, :] = jnp.zeros_like(dv_ref)
        dn_ref[:, :] = jnp.zeros_like(dn_ref)
        df_ref[:, :] = jnp.zeros_like(df_ref)

    u = jnp.zeros_like(p)
    for f in range(NUM_FEATURES):
        u = u + feat_ref[:, f : f + 1] * gimg_ref[f : f + 1, :]
    ds = p * (u - corr_ref[0:1, :])
    dx = jnp.where(x > 0, ds * depth_constant, 0.0)
    dz = -dx / (znorm + _EPS)
    dnv = jnp.where(guard, 0.0, dz / nk)  # (C, PB)
    dnk = jnp.where(guard, 0.0, -dz * z / nk)
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
              diam, depth_constant, block_px, chunk):
    p = kinv_grid.shape[0]
    f = features.shape[1]
    assert f == NUM_FEATURES, f
    pts, feats, kg_t, n_pad, p_pad = _pack(
        points_cam, normals_cam, point_mask, features, kinv_grid, chunk,
        block_px,
    )
    n_chunks = n_pad // chunk
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
                            points_cam.shape[0], p)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _surfel_composite_core(points_cam, normals_cam, features, kinv_grid,
                           point_mask, diam, depth_constant, block_px,
                           chunk):
    out, _ = _fwd_call(points_cam, normals_cam, features, kinv_grid,
                       point_mask, diam, depth_constant, block_px, chunk)
    return out


def _core_fwd(points_cam, normals_cam, features, kinv_grid, point_mask,
              diam, depth_constant, block_px, chunk):
    out, res = _fwd_call(points_cam, normals_cam, features, kinv_grid,
                         point_mask, diam, depth_constant, block_px, chunk)
    return out, res


def _core_bwd(diam, depth_constant, block_px, chunk, res, g_img):
    pts, feats, kg_t, m, d, zn, img_t, n, p = res
    n_pad, f = feats.shape
    n_chunks = n_pad // chunk
    p_pad = kg_t.shape[1]
    pb = block_px

    g_img_t = jnp.pad(g_img.astype(jnp.float32).T, ((0, 0), (0, p_pad - p)))

    pts_spec = pl.BlockSpec((chunk, 8), lambda i, c: (c, 0),
                            memory_space=pltpu.VMEM)
    feat_spec = pl.BlockSpec((chunk, f), lambda i, c: (c, 0),
                             memory_space=pltpu.VMEM)
    kg_spec = pl.BlockSpec((4, pb), lambda i, c: (0, i),
                           memory_space=pltpu.VMEM)
    row_spec = lambda w: pl.BlockSpec((w, pb), lambda i, c: (0, i),
                                      memory_space=pltpu.VMEM)

    # Softmax-correction identity: corr_p = sum_i p_ip (g_p . f_i)
    #                                     = g_p . (sum_i p_ip f_i) = g_p . img_p
    # — the forward output IS the probability-weighted feature sum, so the
    # whole correction pass collapses to one tiny elementwise reduction.
    corr = jnp.sum(g_img_t * img_t, axis=0, keepdims=True)  # (1, p_pad)

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
    """
    pm = None
    if point_mask is not None:
        pm = jax.lax.stop_gradient(point_mask.astype(jnp.float32))
    chunk = min(chunk, _round_up(max(points_cam.shape[0], 128), 128))
    # don't pad tiny renders up to a full block (e.g. 16x16 crops)
    block_px = min(block_px, _round_up(max(kinv_grid.shape[0], 128), 128))
    out = _surfel_composite_core(points_cam, normals_cam, features,
                                 kinv_grid, pm, diam, depth_constant,
                                 block_px, chunk)
    return out.astype(points_cam.dtype)
