"""Multi-chip refinement: grid-sharded decode + pixel-sharded render/loss.

This is the BASELINE.json north-star decomposition for one crop across a
mesh axis ('rays'):

  * the DeepSDF grid decode — the iteration's dominant FLOPs — shards the
    64k sample points across chips (embarrassingly parallel MLP,
    SURVEY.md §2.D "grid/point sharding" row); band selection runs a
    LOCAL top-k per chip followed by an all_gather of the (tiny)
    candidate sets and a replicated global top-k;
  * the surfel render and the 2D NOCS loss shard the pixel axis (each
    chip renders its pixel block against the replicated surface set; the
    softmax over points is per-pixel, so no cross-chip communication);
  * the stage-2 differentiable decode is ALSO sharded: each chip decodes
    its cap/n_dev slice of the selected band and the results are
    all_gathered for the per-pixel render;
  * both losses reduce via psum of (sum, count) partials — the 2D loss
    over the shard's pixels (preserving the reference's empty-selection
    NaN semantics, 0/0), the 3D loss over the shard's point slice;
  * parameter gradients: every loss path is shard-partial and passes
    exactly one forward psum, and each optimized parameter is routed
    through a pmean-on-backward identity (_pmean_on_backward) that turns
    the psum-transpose-inflated per-shard cotangent into the true full
    gradient — verified against the single-device engine per loss path.

Params stay replicated: every chip computes the identical psum'd loss and
applies the identical update. The whole 60-iteration loop stays inside one
shard_map'd lax.scan — zero host syncs, one compiled program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

from sdflabel_tpu.engine import losses as losses_mod
from sdflabel_tpu.engine import refine as refine_mod
from sdflabel_tpu.ops import knn
from sdflabel_tpu.ops.projection import project_dcm


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _pmean_on_backward(x, axis):
    """Identity forward; pmean over `axis` on the backward pass.

    Replicated-parameter gradient repair for the sharded iteration. Every
    differentiable loss path below goes through exactly ONE forward psum
    (the 2D and 3D loss numerators), and psum transposes to psum in JAX —
    so the cotangent each shard accumulates at a replicated parameter is
    n_dev * (its own shard partial). The pmean turns that into the true
    full gradient, identical on every shard: mean_r(n * partial_r) =
    sum_r partial_r. Verified against the single-device engine per loss
    path in isolation (tests/test_sharded_refine.py).
    """
    return x


def _pmean_on_backward_fwd(x, axis):
    return x, None


def _pmean_on_backward_bwd(axis, _, g):
    return (jax.lax.pmean(g, axis),)


_pmean_on_backward.defvjp(_pmean_on_backward_fwd, _pmean_on_backward_bwd)


def make_sharded_refine_fn(
    sdf_decoder,
    cfg: refine_mod.RefineConfig,
    grid_points: np.ndarray,
    K,
    crop_hw: tuple[int, int],
    mesh: Mesh,
    axis: str = "rays",
    use_fused: bool | None = None,
    windowed_2d: bool | None = None,
    select_decoder=None,
):
    """Build the sharded refine function.

    Returns refine(params0, nocs_target (3,h,w), frustum (M,3), fmask (M,))
      -> (final RefineParams, loss history (iters,)).
    Shapes/semantics match engine.refine.make_refine_fn; the computation
    is distributed over `mesh.shape[axis]` devices.

    use_fused: None = auto (Pallas fused splat on TPU, dense elsewhere —
    same policy as renderer.rasterer.USE_FUSED_SPLAT). Each shard runs the
    kernel on its own pixel block, so the (cap, P_blk) splat matrices are
    never materialized on any chip.

    cfg.coarse_cells enables the coarse-to-fine selection pass per shard
    (grid.surface_from_decoder semantics, distributed): the grid is
    re-laid-out cell-major so each chip owns whole coarse cells, scores
    each local cell from its 2 diagonal children (see cell_scores),
    keeps its ~coarse_cells/n_dev best cells, and band-selects only
    among their children. Same approximation contract as the
    single-device path, with the budget split per shard.

    cfg.warm_band enables warm-started band selection (the distributed
    analogue of engine.refine's warm_band; here only the pool ==
    surface_capacity form): the replicated selected point set is carried
    across scan iterations and the grid-sharded stage-1 (local decode +
    top-k + all_gather) runs only every cfg.warm_refresh iterations,
    inside a lax.cond whose predicate is the (replicated) loop counter —
    every chip takes the same branch, so the branch collectives stay
    SPMD-coherent. Warm iterations pay only the sharded stage-2 decode.
    cfg.warm_refresh_cells additionally composes the refresh with the
    sharded coarse-cell pass (stage-0 corners + surviving cells' children
    instead of the full grid), mirroring engine.refine's composed
    refresh; the grid is then laid out cell-major at build time.

    select_decoder: optional cheaper decoder for the NON-differentiable
    selection passes only (stage 0/1 and the warm refresh) — e.g.
    deepsdf.select_sdf_fn's bf16 twin or mlp_pallas.pallas_select_fn's
    fused kernel, which runs per-shard inside the shard_map exactly like
    the fused splat. Stage 2 always decodes with `sdf_decoder`, so
    surface values/normals/mask stay exact (same rank-only contract as
    engine.refine's select_decoder).
    """
    h, w = crop_hw
    n_dev = mesh.shape[axis]
    p_total = h * w
    p_pad = _round_up(p_total, n_dev)
    use_warm = cfg.warm_band > 0
    # Composed refresh (cfg.warm_refresh_cells, round 4): the periodic
    # warm refresh runs the coarse-to-fine CELL pass (sharded stage-0 +
    # the shared select_band tail) instead of the full grid-sharded
    # stage-1 — the distributed twin of engine.refine's composition.
    warm_cells = (cfg.warm_refresh_cells
                  if use_warm and cfg.warm_refresh_cells else None)
    if use_warm:
        if cfg.warm_band != cfg.surface_capacity:
            raise ValueError(
                "sharded warm_band supports only the pool == "
                f"surface_capacity form (got {cfg.warm_band} vs "
                f"{cfg.surface_capacity})")
        if cfg.coarse_cells is not None:
            raise ValueError(
                "warm_band and coarse_cells are alternative per-iteration "
                "selection accelerations; enable at most one (the "
                "composed refresh is warm_refresh_cells)")
        if cfg.warm_refresh < 1:
            raise ValueError(
                f"warm_refresh must be >= 1 (got {cfg.warm_refresh})")
    # same auto rule as engine.losses.loss_2d: windowed above 64x64
    # (always safe there: any such crop has far more pixels than the
    # ~diam^2 disc, so the zero-weight fallback candidate always exists)
    if windowed_2d is None:
        windowed_2d = p_total > 64 * 64

    grid_np = np.asarray(grid_points, np.float32)
    n_grid = len(grid_np)
    cap = cfg.surface_capacity

    cells_budget = (cfg.coarse_cells if cfg.coarse_cells is not None
                    else warm_cells)
    if cells_budget is not None:
        from sdflabel_tpu.ops.grid import _cell_children_np

        d = round(n_grid ** (1.0 / 3.0))
        if d**3 != n_grid:
            raise ValueError(f"grid ({n_grid}) is not a cube")
        r3children = _cell_children_np(d, cfg.coarse_factor)  # (Nc, r^3)
        n_cells, r3 = r3children.shape
        # cell-major re-layout, padded so each shard owns whole cells
        nc_pad = _round_up(n_cells, n_dev)
        grid_cm = grid_np[r3children.reshape(-1)]
        grid_padded = np.concatenate(
            [grid_cm, np.full(((nc_pad - n_cells) * r3, 3), 1e3, np.float32)]
        )
        g_pad = nc_pad * r3
        cells_local = nc_pad // n_dev
        kc_local = min(-(-min(cells_budget, n_cells) // n_dev),
                       cells_local)
        local_cap = min(cap, kc_local * r3)
        if n_dev * local_cap < cap:
            knob = ("coarse_cells" if cfg.coarse_cells is not None
                    else "warm_refresh_cells")
            raise ValueError(
                f"capacity {cap} exceeds the sharded coarse candidate pool "
                f"{n_dev}x{local_cap}; raise {knob}"
            )
    else:
        g_pad = _round_up(n_grid, n_dev)
        # pad grid with far-away points (|sdf| large -> never selected)
        grid_padded = np.concatenate(
            [grid_np, np.full((g_pad - n_grid, 3), 1e3, np.float32)]
        )
        local_cap = min(cap, g_pad // n_dev)

    # pixel-flat geometry
    K_np = np.asarray(K, np.float32)
    ys, xs = np.mgrid[0:h, 0:w]
    pix_rc = np.stack([ys.reshape(-1), xs.reshape(-1)], 1).astype(np.float32)
    pad_px = p_pad - p_total
    pix_rc = np.concatenate([pix_rc, np.full((pad_px, 2), 1e6, np.float32)])
    px_valid = np.concatenate(
        [np.ones(p_total, bool), np.zeros(pad_px, bool)])

    opt = refine_mod.make_optimizer(cfg)
    Kj = K_np  # numpy constant — see grid_j below for why
    fused = (use_fused if use_fused is not None
             else jax.default_backend() == "tpu")
    # stage-2 slice size per shard (selected points padded to a multiple)
    cap_pad = _round_up(cap, n_dev)
    c2_local = cap_pad // n_dev

    sel_dec = select_decoder if select_decoder is not None else sdf_decoder

    def select_band(latent, grid_block):
        """Grid-sharded stage-1: local decode + top-k, all_gather, global
        top-k -> replicated (cap, 3) selected points.

        Pad points (the 1e3 sentinel rows added for even sharding) are
        masked out of the ranking EXPLICITLY: the decoder ends in tanh, so
        a degenerate/untrained decoder can emit |sdf| ~ 0 at the sentinel
        coordinate and a pad point would otherwise beat real band points.
        Real grid coordinates live in [-1, 1], so coord > 10 identifies
        pads without extra plumbing.
        """
        sdf_local = jax.lax.stop_gradient(
            sel_dec(latent, grid_block).reshape(-1)
        )
        score = jnp.where(grid_block[:, 0] < 10.0,
                          -jnp.abs(sdf_local), -jnp.inf)
        neg_local, idx_local = jax.lax.top_k(score, local_cap)
        cand_pts = jnp.take(grid_block, idx_local, axis=0)
        all_neg = jax.lax.all_gather(neg_local, axis).reshape(-1)
        all_pts = jax.lax.all_gather(cand_pts, axis).reshape(-1, 3)
        _, sel = jax.lax.top_k(all_neg, cap)
        return jnp.take(all_pts, sel, axis=0)

    if cells_budget is not None:
        def cell_scores(latent, blk):
            """Shard-local coarse cell score: 2 DIAGONAL children
            (offsets 0 and (r-1,..)) — sign change across the main
            diagonal scores 0 (surface provably near), else min |sdf|.
            The shard-local approximation of ops.grid's shared-lattice
            8-corner score (the cell-major shard layout cannot share
            corner decodes across shard boundaries); 2x the coarse
            decode of the old single-representative score, which missed
            surface-crossing cells and measured a -3.0 3D AP
            distant-object regression (QUALITY_r05, BENCH_NOTES r5).
            Returns top_k-ready scores (higher = better), pads -inf."""
            s0 = jax.lax.stop_gradient(
                sel_dec(latent, blk[:, 0]).reshape(-1))
            s1 = jax.lax.stop_gradient(
                sel_dec(latent, blk[:, -1]).reshape(-1))
            sign_change = (jnp.minimum(s0, s1) < 0) \
                & (jnp.maximum(s0, s1) > 0)
            score = jnp.where(sign_change, 0.0,
                              jnp.minimum(jnp.abs(s0), jnp.abs(s1)))
            return jnp.where(blk[:, 0, 0] < 10.0, -score, -jnp.inf)

    if warm_cells is not None:
        def cell_refresh(latent, grid_block):
            """Composed warm refresh: sharded stage-0 cell pass, then the
            shared select_band tail on the surviving cells' children —
            the distributed twin of engine.refine's composed refresh
            (grid.band_candidates(coarse_cells=...))."""
            blk = grid_block.reshape(-1, r3, 3)  # (cells_local, r^3, 3)
            _, cell_idx = jax.lax.top_k(cell_scores(latent, blk),
                                        kc_local)
            cand_grid = jnp.take(blk, cell_idx, axis=0).reshape(-1, 3)
            return select_band(latent, cand_grid)

        refresh_band = cell_refresh
    else:
        refresh_band = select_band

    def iteration(params, css_flat, grid_block, rc_block,
                  pxv_block, frustum, fmask, pts_warm):
        # Every optimized parameter is routed through a pmean-on-backward
        # identity, and every loss path below is SHARD-PARTIAL (the 2D loss
        # over this shard's pixels, the 3D loss over this shard's point
        # slice), reduced by exactly one forward psum. The pmean repairs
        # the psum-transpose inflation so every chip computes the true
        # full gradient and applies the identical update (see
        # _pmean_on_backward).
        yaw = _pmean_on_backward(params.yaw, axis)
        trans = _pmean_on_backward(params.trans, axis)
        scale_p = _pmean_on_backward(params.scale, axis)
        latent_p = _pmean_on_backward(params.latent, axis)

        scene = frustum / scale_p.reshape(())
        pose = refine_mod.build_render_pose(yaw, trans)
        n2 = jnp.sum(jnp.square(latent_p))
        latent = latent_p / jnp.sqrt(jnp.maximum(n2, 1e-24))

        # ---- stage 1: grid-sharded selection decode ----
        if use_warm:
            # warm iteration: the carried replicated point set IS the
            # selection (pool == capacity keeps all); stage 2 computes the
            # validity mask, so no selection decode runs at all.
            pts_sel = jax.lax.stop_gradient(pts_warm)
        elif cfg.coarse_cells is not None:
            # stage 0: local coarse cell selection (diagonal 2-corner
            # score, see cell_scores), then the shared local-top-k/
            # all_gather/global-top-k tail
            blk = grid_block.reshape(-1, r3, 3)  # (cells_local, r^3, 3)
            _, cell_idx = jax.lax.top_k(cell_scores(latent, blk),
                                        kc_local)
            cand_grid = jnp.take(blk, cell_idx, axis=0).reshape(-1, 3)
            pts_sel = select_band(latent, cand_grid)
        else:
            pts_sel = select_band(latent, grid_block)

        # ---- stage 2: SHARDED differentiable decode + normals -----------
        # Each chip decodes its cap/n_dev slice of the selected points and
        # the results are all_gathered (transpose: psum_scatter, so each
        # shard backprops exactly its slice's cotangent). The latent is
        # routed through a psum-backward identity so its gradient is the
        # SUM of the per-shard partials, replicated — without it, each
        # chip would apply a different (partial) latent gradient and the
        # replicated parameters would silently diverge.
        rank = jax.lax.axis_index(axis)
        if cap_pad > cap:  # pad tail with copies of the last row
            pts_pad = jnp.concatenate(
                [pts_sel, jnp.tile(pts_sel[-1:], (cap_pad - cap, 1))]
            )
        else:
            pts_pad = pts_sel
        pts_slice = jax.lax.dynamic_slice_in_dim(
            pts_pad, rank * c2_local, c2_local
        )
        sdf_slice, vjp_fn = jax.vjp(
            lambda p: sdf_decoder(latent, p).reshape(-1), pts_slice
        )
        (g_slice,) = vjp_fn(jnp.ones_like(sdf_slice))
        g_slice = jax.lax.stop_gradient(g_slice)
        norm_s = jnp.linalg.norm(g_slice, axis=-1, keepdims=True)
        normals_slice = g_slice / jnp.maximum(norm_s,
                                              jnp.finfo(g_slice.dtype).tiny)
        surf_pts_slice = pts_slice - sdf_slice[:, None] * normals_slice
        idx_global = rank * c2_local + jnp.arange(c2_local)
        # the pts[:,0] < 10 term masks pad-sentinel points in the (cap >
        # valid candidates) corner where a pad survives selection
        mask_slice = (jnp.abs(sdf_slice) < cfg.surface_threshold) \
            & (idx_global < cap) & (pts_slice[:, 0] < 10.0)

        # gathered (replicated) arrays for the per-pixel render; their
        # backward psum_scatters pixel cotangents back to the owning slice
        sdf_sel = jax.lax.all_gather(sdf_slice, axis).reshape(-1)[:cap]
        grads = jax.lax.all_gather(g_slice, axis).reshape(-1, 3)[:cap]
        norm = jnp.linalg.norm(grads, axis=-1, keepdims=True)
        normals = grads / jnp.maximum(norm, jnp.finfo(grads.dtype).tiny)
        surf_pts = pts_sel - sdf_sel[:, None] * normals
        surf_mask = (jnp.abs(sdf_sel) < cfg.surface_threshold) \
            & (pts_sel[:, 0] < 10.0)

        # ---- project: full set for the render, slice for the 3D loss ----
        proj = project_dcm(Kj, pose, surf_pts, normals, normals, (w, h),
                           output_nocs=True)
        v3d, nrm, clr = proj.points_3d, proj.normals_3d, proj.colors_3d
        proj_slice = project_dcm(Kj, pose, surf_pts_slice, normals_slice,
                                 normals_slice, (w, h))

        # ---- pixel-sharded surfel render of the NOCS color block ----
        colors_ext = (clr + 1.0) / 2.0
        if fused:
            from sdflabel_tpu.ops import splat_pallas

            # kinv rows from the shard's pixel coords, via THE shared
            # definition (splat.kinv_pixel_rays) — an ulp-different
            # variant flips binarized footprint bits.
            from sdflabel_tpu.ops import splat as splat_ops_kinv

            kinv_block = splat_ops_kinv.kinv_pixel_rays(
                Kj, rc_block[:, ::-1])
            feats = jnp.concatenate(
                [colors_ext, jnp.ones((cap, 1), v3d.dtype), v3d[:, 2:3],
                 (nrm + 1.0) / 2.0], axis=-1)  # (cap, 8)
            img = splat_pallas.surfel_composite(
                v3d, nrm, feats, kinv_block, point_mask=surf_mask, diam=0.04,
            )  # (P_blk, 8)
            rend_block = jnp.clip(img[:, :3], max=1.0)
        else:
            from sdflabel_tpu.ops import splat as splat_ops

            prob = splat_ops.splat_surfel(
                Kj, rc_block[:, ::-1], v3d, nrm, point_mask=surf_mask,
                diam=0.04, softclamp=False, add_bg=False,
            )  # (cap, P_blk) — rc_block is (row,col); splat wants (x,y)
            rend_block = jnp.clip(prob.T @ colors_ext, max=1.0)  # (P_blk, 3)

        # ---- 3D loss: point-sharded partials (optimizer.py:166-198) ----
        # Each shard scores only ITS stage-2 slice so the backward stays
        # slice-local; the psum of (sum, count) reproduces the full-set
        # mean (and its 0-if-empty semantics) exactly.
        l3_sum, l3_cnt = losses_mod.loss_3d_terms(
            proj_slice.points_3d, mask_slice & proj_slice.front_mask,
            scene, fmask, scale_p, threshold=cfg.loss3d_threshold,
        )
        l3_sum = jax.lax.psum(l3_sum, axis)
        l3_cnt = jax.lax.psum(l3_cnt, axis)
        l3d = jnp.where(l3_cnt > 0, l3_sum / jnp.maximum(l3_cnt, 1), 0.0)

        # ---- 2D loss partials over the local pixel block ----
        nonzero = (jnp.sum(rend_block, -1) != 0) & pxv_block
        rend_sq = jnp.sum(rend_block * rend_block, -1)
        css_rgb = css_flat[:, 2:5]
        if windowed_2d:
            # Offset-window formulation (engine.losses._loss_2d_windowed,
            # layout-agnostic variant): candidates for block pixel (r, c)
            # are css pixels (r+dy, c+dx) over the in-disc offsets,
            # gathered from the replicated row-major css_flat; every
            # other pixel's candidate collapses to ||rend|| (weight 0),
            # present here since any crop exceeds the disc. O(K^2 P_blk)
            # per shard instead of (P_blk, P) = P^2/n.
            _, offs, wgts_list = losses_mod.disc_offsets(cfg.loss2d_diam)
            wgts = jnp.asarray(wgts_list, rend_block.dtype)
            rr = rc_block[:, 0].astype(jnp.int32)
            cc = rc_block[:, 1].astype(jnp.int32)
            dyx = jnp.asarray(offs, jnp.int32)  # (O, 2)
            pr = rr[None, :] + dyx[:, 0:1]  # (O, P_blk)
            pc = cc[None, :] + dyx[:, 1:2]
            inb = (pr >= 0) & (pr < h) & (pc >= 0) & (pc < w) & \
                pxv_block[None, :]
            idx = jnp.clip(pr, 0, h - 1) * w + jnp.clip(pc, 0, w - 1)
            cand = jnp.take(css_rgb, idx.reshape(-1), axis=0).reshape(
                idx.shape + (3,))  # (O, P_blk, 3)
            cand_sq = jnp.sum(cand * cand, -1)
            cross_o = jnp.sum(cand * rend_block[None], -1)
            wv = wgts[:, None]
            dsq = wv * wv * cand_sq - 2.0 * wv * cross_o + rend_sq[None]
            dsq = jnp.where(inb, dsq, jnp.inf)
            # the ||rend|| fallback exists iff some valid css pixel carries
            # zero weight, i.e. the disc does not cover the whole crop
            # (losses._loss_2d_windowed's has_fallback, same gating)
            in_disc = jnp.sum(inb, axis=0)  # (P_blk,)
            fb_sq = jnp.where(in_disc < p_total, rend_sq, jnp.inf)
            min_sq = jnp.minimum(jnp.min(dsq, axis=0), fb_sq)
            pos = (min_sq > 0) & jnp.isfinite(min_sq)
            diff_min = jnp.where(
                pos, jnp.sqrt(jnp.where(pos, min_sq, 1.0)),
                jnp.where(jnp.isfinite(min_sq), 0.0, jnp.inf))
        else:
            d = jnp.sqrt(knn.pairwise_sq_dists(rc_block, css_flat[:, :2]))
            wgt = jnp.maximum(cfg.loss2d_diam - d, 0.0)  # (P_blk, P_css)
            css_sq = jnp.sum(css_rgb * css_rgb, -1)
            # HIGHEST: see losses.loss_2d — bf16 passes here flip the
            # candidate argmin / inlier threshold
            cross = jnp.matmul(rend_block, css_rgb.T,
                               precision=jax.lax.Precision.HIGHEST)
            diff_sq = wgt * wgt * css_sq[None, :] - 2.0 * wgt * cross \
                + rend_sq[:, None]
            pos = diff_sq > 0
            diff = jnp.where(pos, jnp.sqrt(jnp.where(pos, diff_sq, 1.0)),
                             0.0)
            diff_min = jnp.min(diff, axis=-1)
        sel2 = nonzero & (diff_min < cfg.loss2d_threshold)
        l2_sum = jnp.sum(jnp.where(sel2, diff_min, 0.0))
        l2_cnt = jnp.sum(sel2)
        l2_sum = jax.lax.psum(l2_sum, axis)
        l2_cnt = jax.lax.psum(l2_cnt, axis)
        any_nz = jax.lax.psum(jnp.sum(nonzero), axis) > 0
        l2d = jnp.where(any_nz, l2_sum / l2_cnt, 0.0)  # 0/0 NaN preserved

        return cfg.weight_3d * l3d + cfg.weight_2d * l2d, (l2d, l3d)

    def shard_body(params0, css_flat, grid_block, rc_block,
                   pxv_block, frustum, fmask):
        def step(carry, it):
            params, opt_state, pts_warm = carry
            if use_warm:
                # Refresh is selection-only; it runs OUTSIDE value_and_grad
                # on the current latent. The predicate is a replicated loop
                # counter, so every chip takes the same cond branch and the
                # branch's collectives stay coherent.
                n2 = jnp.sum(jnp.square(
                    jax.lax.stop_gradient(params.latent)))
                lat = jax.lax.stop_gradient(params.latent) / jnp.sqrt(
                    jnp.maximum(n2, 1e-24))
                pts_warm = jax.lax.cond(
                    it % cfg.warm_refresh == 0,
                    lambda p: refresh_band(lat, grid_block),
                    lambda p: p,
                    pts_warm,
                )
            (loss, (l2d, l3d)), grads = jax.value_and_grad(
                iteration, has_aux=True
            )(params, css_flat, grid_block, rc_block,
              pxv_block, frustum, fmask, pts_warm)
            ok = jnp.isfinite(loss) & (loss != 0.0)
            grads = jax.tree.map(
                lambda g: jnp.where(ok & jnp.isfinite(g).all(), g, 0.0),
                grads,
            )
            updates, new_opt = opt.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            new_params = jax.tree.map(
                lambda n, o: jnp.where(ok, n, o), new_params, params)
            new_opt = jax.tree.map(
                lambda n, o: jnp.where(ok, n, o), new_opt, opt_state)
            return (new_params, new_opt, pts_warm), loss

        # Warm carry: iteration 0 always refreshes, so zeros are never
        # consumed (empty when warm is off).
        pts0 = jnp.zeros((cap if use_warm else 0, 3), jnp.float32)
        carry = (params0, opt.init(params0), pts0)
        carry, hist = jax.lax.scan(step, carry, jnp.arange(cfg.iters))
        return carry[0], hist

    sharded = jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )

    # Keep the closed-over geometry as NUMPY constants: inside the jit they
    # bake into the program (replicated at compile time on every process),
    # so the same refine fn works on multi-PROCESS global meshes, where a
    # closed-over single-device jax.Array would carry an incompatible
    # process-local sharding (tests/distributed_worker.py exercises this).
    grid_j = grid_padded
    rc_j = pix_rc
    pxv_j = px_valid

    @jax.jit
    def refine(params0, nocs_target, frustum, fmask):
        css_rgb = nocs_target.reshape(3, p_total).T  # (P, 3)
        css_flat = jnp.concatenate(
            [jnp.asarray(pix_rc[:p_total]), css_rgb], axis=-1
        )  # (P, 5): row, col, r, g, b
        final, hist = sharded(
            params0, css_flat, grid_j, rc_j, pxv_j, frustum, fmask
        )
        return final, hist

    return refine
