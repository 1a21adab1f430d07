"""Pose/shape refinement engine — the reference's hot loop, fully jitted.

Behavioral parity target: pipelines/optimizer.py:13-164 —
  * params {yaw, trans, scale, latent} (optimizer.py:26-40)
  * MultipleOptimizer = Adam(yaw, trans; lr .01) + SGD(scale lr .01,
    latent lr 3e-5, momentum 0) (optimizer.py:34-52) -> optax.multi_transform
  * per iteration: scene / scale, pose-from-yaw with Y row flip, latent
    renormalized to the unit sphere, DeepSDF decode over the grid, surface
    extraction, surfel render, 3D NN loss + 2D NOCS loss, NaN/zero-loss
    skip guard (optimizer.py:84-157)

TPU design: the entire iteration runs inside a lax.scan with ZERO host
syncs — the reference pays a GPU->CPU->GPU round trip per iteration for its
sklearn KDTree 3D loss (optimizer.py:180-181) and a .item() per loss print;
here the scan compiles to one XLA program and the NaN guard is a jnp.where
on the parameter update. vmap(refine_crop) batches whole crops; see
parallel/ for the mesh sharding.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from sdflabel_tpu.engine import losses
from sdflabel_tpu.ops import geometry, grid as grid_ops
from sdflabel_tpu.renderer import rasterer as rast_mod


@dataclasses.dataclass(frozen=True)
class RefineConfig:
    iters: int = 60  # config_refine.ini [optimization] iters
    weight_2d: float = 0.3  # config_refine.ini [losses] 2d_weight
    weight_3d: float = 0.5  # config_refine.ini [losses] 3d_weight
    lr_yaw: float = 0.01  # optimizer.py:34
    lr_trans: float = 0.01  # optimizer.py:36
    lr_scale: float = 0.01  # optimizer.py:37
    lr_latent: float = 3e-5  # optimizer.py:38
    surface_capacity: int = 4096
    surface_threshold: float = 0.03  # grid.py:43 default
    # Opt-in coarse-to-fine surface decode (see grid.surface_from_decoder):
    # decode only `coarse_cells` grid cells' points in the selection pass.
    # Semantically identical valid-point set when the |sdf|<threshold band
    # fits in the cell budget; ~2-4x less decode FLOPs per iteration.
    coarse_cells: int | None = None
    coarse_factor: int = 2
    # Opt-in warm-started band selection (see grid.surface_from_candidates):
    # every `warm_refresh` iterations the FULL grid is scanned for the
    # `warm_band` smallest-|sdf| candidate points; in between, band top-k
    # runs only on that candidate set. The band depends solely on the
    # latent code (lr 3e-5), so inter-refresh drift is ~1e-4 latent units —
    # selected points are always exactly decoded and the validity mask
    # never admits an out-of-band point. warm_band=0 disables (exact
    # full-grid selection each iteration, the reference's semantics).
    warm_band: int = 0
    warm_refresh: int = 10
    # Composed refresh: run the candidate refresh through the
    # coarse-to-fine CELL pass with this many cells instead of the full
    # grid (grid.band_candidates(coarse_cells=...); measured +9.4% over
    # plain warm at the bench protocol). Same approximation contract as
    # coarse_cells; requires warm_band <= cells * coarse_factor^3.
    # None = full-grid refresh (plain warm). Distinct from coarse_cells
    # (the per-iteration c2f path) so warm_band=0 stays bit-exact.
    warm_refresh_cells: int | None = None
    loss3d_threshold: float = 0.2  # optimizer.py:166
    loss2d_diam: float = 5.0  # optimizer.py:200
    loss2d_threshold: float = 1.0  # optimizer.py:200
    # Fused-splat tile overrides (0 = ops.splat_pallas module defaults).
    # The single-crop-optimal tiles (512 px / 512 pts) regress under
    # vmapped multi-crop batching at B >= 4 (VMEM pressure, BENCH_NOTES
    # "Batched multi-crop"); the batched driver passes batch-aware values
    # (pipelines.refine_css.refine_crops_batched).
    splat_block_px: int = 0
    splat_chunk: int = 0


class RefineParams(NamedTuple):
    """Optimized parameters (leaf arrays; a pytree for optax)."""

    yaw: jax.Array  # (1,)
    trans: jax.Array  # (3,)
    scale: jax.Array  # (1,)
    latent: jax.Array  # (L,)


def make_optimizer(cfg: RefineConfig) -> optax.GradientTransformation:
    """Adam(yaw) + Adam(trans) + SGD(scale) + SGD(latent), per-param lrs
    (optimizer.py:34-52 — yaw and trans default to the same 0.01 but are
    INDEPENDENT param groups there, so lr_trans must take effect here
    too; two same-lr Adam groups step identically to one joint group
    because Adam state is elementwise)."""
    return optax.multi_transform(
        {
            "adam_yaw": optax.adam(cfg.lr_yaw),
            "adam_trans": optax.adam(cfg.lr_trans),
            "sgd_scale": optax.sgd(cfg.lr_scale),
            "sgd_latent": optax.sgd(cfg.lr_latent),
        },
        RefineParams(yaw="adam_yaw", trans="adam_trans",
                     scale="sgd_scale", latent="sgd_latent"),
    )


def build_render_pose(yaw: jax.Array, trans: jax.Array) -> jax.Array:
    """4x4 render pose: rot-from-yaw, Y row flipped, trans (optimizer.py:87-90).

    The Y flip happens BEFORE trans is written, so only the rotation row is
    flipped — translation y keeps its sign.
    """
    rot = geometry.rot_from_yaw(yaw)
    rot = rot * jnp.asarray([1.0, -1.0, 1.0])[:, None]
    pose = jnp.eye(4, dtype=trans.dtype)
    pose = pose.at[:3, :3].set(rot.astype(trans.dtype))
    pose = pose.at[:3, 3].set(trans)
    return pose


class RefineStepOut(NamedTuple):
    loss: jax.Array
    loss_2d: jax.Array
    loss_3d: jax.Array
    applied: jax.Array  # False when the NaN/zero guard skipped the update
    # Parameters USED by this iteration (pre-update), stacked over the scan:
    # enables post-hoc re-rendering of the optimization trajectory — the
    # headless analogue of the reference's per-iteration viz hooks
    # (optimizer.py:160-164). Tiny (iters x (L+5) floats), so always kept.
    params: RefineParams


def make_refine_fn(
    sdf_decoder,
    cfg: RefineConfig,
    grid_points: jax.Array,
    K: jax.Array,
    crop_hw: tuple[int, int],
    select_decoder=None,
    stage2_fn=None,
):
    """Build the jit-compiled refinement function for a fixed crop geometry.

    Args:
      sdf_decoder: fn(latent, points) -> (N,) sdf — e.g.
        deepsdf.sdf_fn(dsdf_cfg, dsdf_params), or any differentiable SDF.
      select_decoder: optional cheaper decoder (e.g.
        deepsdf.select_sdf_fn's bf16 twin) used ONLY for the
        non-differentiable band-selection pass each iteration; the K
        selected points are still decoded by `sdf_decoder` exactly. See
        grid.surface_from_decoder(select_decoder_fn=...).
      stage2_fn: optional fused stage-2 decode+normals
        (ops.mlp2_pallas.pallas_stage2_fn) — same numerics class as the
        XLA lowering of the same chain; see grid._stage2_surface.

    Returns refine(params0, nocs_target, frustum_pts, frustum_mask)
      -> (final RefineParams, RefineStepOut history over iters).

    nocs_target: (3, h, w) CSS NOCS prediction already resized to the crop
    (the reference F.interpolate's nearest resize happens outside, once —
    refine pipeline responsibility).
    frustum_pts/mask: (M, 3), (M,) fixed-capacity scene point cloud.
    """
    h, w = crop_hw
    opt = make_optimizer(cfg)
    use_warm = cfg.warm_band > 0
    if use_warm:
        if cfg.warm_band < cfg.surface_capacity:
            raise ValueError(
                f"warm_band {cfg.warm_band} must be >= surface_capacity "
                f"{cfg.surface_capacity}")
        if cfg.coarse_cells is not None:
            raise ValueError(
                "warm_band and coarse_cells are alternative selection "
                "accelerations; enable at most one (the composed refresh "
                "is warm_refresh_cells)")
        if cfg.warm_refresh < 1:
            raise ValueError(
                f"warm_refresh must be >= 1 (got {cfg.warm_refresh}); "
                "1 = refresh every iteration (bit-identical to the exact "
                "path)")

    def _normalize_latent(latent):
        # F.normalize to the sphere (optimizer.py:96): x / clamp(||x||, 1e-12).
        # sqrt(max(n2, eps^2)) == clamp(norm, eps) with a NaN-free gradient
        # at the zero vector.
        n2 = jnp.sum(jnp.square(latent))
        return latent / jnp.sqrt(jnp.maximum(n2, 1e-24))

    def iteration(params: RefineParams, nocs_target, frustum_pts,
                  frustum_mask, pixel_mask, cand_idx):
        # Scene / scale — scale gradient flows via the scene (optimizer.py:84)
        scene = frustum_pts / params.scale.reshape(())

        pose = build_render_pose(params.yaw, params.trans)

        latent = _normalize_latent(params.latent)

        if use_warm:
            surf = grid_ops.surface_from_candidates(
                sdf_decoder, latent, grid_points, cand_idx,
                capacity=cfg.surface_capacity,
                threshold=cfg.surface_threshold,
                select_decoder_fn=select_decoder,
                stage2_fn=stage2_fn,
            )
        else:
            surf, _sdf = grid_ops.surface_from_decoder(
                sdf_decoder, latent, grid_points,
                capacity=cfg.surface_capacity,
                threshold=cfg.surface_threshold,
                coarse_cells=cfg.coarse_cells,
                coarse_factor=cfg.coarse_factor,
                select_decoder_fn=select_decoder,
                stage2_fn=stage2_fn,
            )

        rendering, points = rast_mod.render(
            K, (w, h), surf.points, surf.normals, surf.normals, pose,
            point_mask=surf.mask, rot="dcm", primitives="disc",
            output_nocs=True,
            splat_block_px=cfg.splat_block_px, splat_chunk=cfg.splat_chunk,
        )

        l3d = losses.loss_3d(
            points.xyz, points.front_mask, scene, frustum_mask,
            params.scale, threshold=cfg.loss3d_threshold,
        )
        l2d = losses.loss_2d(
            rendering.color, nocs_target,
            diam=cfg.loss2d_diam, threshold_nocs=cfg.loss2d_threshold,
            pixel_mask=pixel_mask,
        )
        return cfg.weight_3d * l3d + cfg.weight_2d * l2d, (l2d, l3d)

    def step(carry, it):
        (params, opt_state, nocs_target, frustum_pts, frustum_mask,
         pixel_mask, cand_idx) = carry
        if use_warm:
            # Candidate refresh is selection-only (non-differentiable, like
            # stage 1), so it runs OUTSIDE value_and_grad on the current
            # latent. lax.cond executes only the taken branch: the full-grid
            # decode cost is paid once per warm_refresh iterations.
            latent = _normalize_latent(jax.lax.stop_gradient(params.latent))
            sel = select_decoder if select_decoder is not None else sdf_decoder
            cand_idx = jax.lax.cond(
                it % cfg.warm_refresh == 0,
                lambda c: grid_ops.band_candidates(
                    sel, latent, grid_points, cfg.warm_band,
                    coarse_cells=cfg.warm_refresh_cells,
                    coarse_factor=cfg.coarse_factor),
                lambda c: c,
                cand_idx,
            )
        (loss, (l2d, l3d)), grads = jax.value_and_grad(iteration, has_aux=True)(
            params, nocs_target, frustum_pts, frustum_mask, pixel_mask,
            cand_idx
        )
        # NaN / zero-loss guard (optimizer.py:149-151): skip the update.
        ok = jnp.isfinite(loss) & (loss != 0.0)
        grads = jax.tree.map(
            lambda g: jnp.where(ok & jnp.isfinite(g).all(), g, 0.0), grads
        )
        updates, new_opt_state = opt.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        new_params = jax.tree.map(
            lambda new, old: jnp.where(ok, new, old), new_params, params
        )
        new_opt_state = jax.tree.map(
            lambda new, old: jnp.where(ok, new, old), new_opt_state, opt_state
        )
        out = RefineStepOut(loss=loss, loss_2d=l2d, loss_3d=l3d, applied=ok,
                            params=params)
        return (new_params, new_opt_state, nocs_target, frustum_pts,
                frustum_mask, pixel_mask, cand_idx), out

    def refine(params0: RefineParams, nocs_target, frustum_pts, frustum_mask,
               pixel_mask=None):
        if pixel_mask is None:
            pixel_mask = jnp.ones((h, w), bool)
        opt_state = opt.init(params0)
        # Warm-band carry: iteration 0 always refreshes (0 % warm_refresh
        # == 0), so the zero init is never consumed.
        cand_idx = (jnp.zeros((cfg.warm_band,), jnp.int32) if use_warm
                    else jnp.zeros((0,), jnp.int32))
        carry = (params0, opt_state, nocs_target, frustum_pts, frustum_mask,
                 pixel_mask, cand_idx)
        carry, hist = jax.lax.scan(step, carry, jnp.arange(cfg.iters))
        return carry[0], hist

    return refine


def init_refine_params(
    yaw: float, trans, scale: float, latent, dtype=jnp.float32
) -> RefineParams:
    """Pack initial values (refine_css.py:192-196: trans pre-divided by
    scale is the caller's responsibility, matching `init_pose['tra'] /
    init_pose['scale']`)."""
    return RefineParams(
        yaw=jnp.asarray(yaw, dtype).reshape(1),
        trans=jnp.asarray(trans, dtype).reshape(3),
        scale=jnp.asarray(scale, dtype).reshape(1),
        latent=jnp.asarray(latent, dtype).reshape(-1),
    )
