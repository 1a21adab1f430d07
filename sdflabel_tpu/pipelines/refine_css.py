"""Pose/shape refinement (autolabeling) pipeline.

Behavioral parity target: pipelines/refine_css.py:26-263 and the demo twin
refine_css_demo.py:23-204 — per KITTI frame: MaskRCNN label fusion, crop +
intrinsics adjustment, CSS forward, DeepSDF surface extraction, NOCS
reprojection, RANSAC pose init, azimuth constraint + height re-estimation,
refinement, KITTI label dump, in-process evaluation.

TPU design: everything from the CSS forward to the final refined params is
jit-compiled; the refinement loop is engine.refine's lax.scan. The jit
cache is keyed by crop shape — repeated crop sizes reuse compiled programs
(and the parallel.batched_refine path vmaps same-shape crops).
"""

from __future__ import annotations

import dataclasses
import math
import os
import pickle
from collections import OrderedDict, defaultdict

import numpy as np
import jax
import jax.numpy as jnp

from sdflabel_tpu import config as cfg_mod
from sdflabel_tpu.data import kitti as kitti_mod
from sdflabel_tpu.engine import labels as labels_mod
from sdflabel_tpu.engine import refine as refine_mod
from sdflabel_tpu.eval.detection3d import (
    CoordinateFrame,
    Detection3DEvaluator,
    clean_kitti_data,
)
from sdflabel_tpu.models import css as css_mod
from sdflabel_tpu.models import deepsdf
from sdflabel_tpu.ops import geometry, grid as grid_ops, ransac
from sdflabel_tpu.pipelines.train_css import setup_css

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

# Structural host<->device traffic counters (reset/read by
# scripts/measure_driver_throughput.py): every synchronous device->host
# fetch in the driver goes through _fetch so the per-crop round-trip count
# is a measured artifact, not an estimate.
TRANSFER_STATS = {"fetches": 0, "arrays": 0}


def _fetch(*arrays):
    """ONE synchronous device->host transfer for all arguments.

    jax.device_get on a tuple gathers every array in a single blocking
    round trip; fetching the same values through separate np.asarray calls
    pays one tunnel RTT each (~40-96 ms on a remote TPU backend,
    BENCH_NOTES 'End-to-end driver throughput')."""
    if any(isinstance(a, jax.Array) for a in arrays):
        TRANSFER_STATS["fetches"] += 1
        TRANSFER_STATS["arrays"] += len(arrays)
    out = jax.device_get(arrays)
    return out if len(arrays) > 1 else out[0]


def reset_transfer_stats():
    TRANSFER_STATS["fetches"] = 0
    TRANSFER_STATS["arrays"] = 0


def transform_bgr_crop(crop_bgr: np.ndarray):
    """BGR float crop -> normalized (3,128,128) tensor (refinement.py:60-84)."""
    from PIL import Image

    rgb8 = (np.clip(crop_bgr[..., ::-1], 0, 1) * 255).astype(np.uint8)
    im = Image.fromarray(rgb8).resize((128, 128), Image.BILINEAR)
    arr = np.asarray(im, np.float32) / 255.0
    norm = (arr - IMAGENET_MEAN) / IMAGENET_STD
    return np.transpose(norm, (2, 0, 1)), np.transpose(arr, (2, 0, 1))


def nearest_resize_chw(img: np.ndarray, hw: tuple[int, int]) -> np.ndarray:
    """F.interpolate(mode='nearest') for (C,H,W) numpy arrays."""
    c, h, w = img.shape
    th, tw = hw
    ys = (np.arange(th) * h // th).clip(max=h - 1)
    xs = (np.arange(tw) * w // tw).clip(max=w - 1)
    return img[:, ys[:, None], xs[None, :]]


class RefineRuntime:
    """Holds compiled models + per-crop-shape refine function cache."""

    def __init__(self, cfg: cfg_mod.RefineCfg, css_variables, dsdf_cfg,
                 dsdf_params, rng_seed: int = 1,
                 surface_capacity: int | None = None,
                 frustum_capacity: int = 8192,
                 ransac_model_capacity: int = 2048,
                 ransac_scene_capacity: int = 2048,
                 ransac_cfg: ransac.RansacConfig | None = None,
                 coarse_cells: int | None = None):
        self.cfg = cfg
        self.css_variables = css_variables
        self.dsdf_cfg = dsdf_cfg
        # Precision (config_refine.ini [optimization] precision): the
        # reference runs the decoder in fp16 (workspace.py:181); on TPU we
        # map float16 -> bfloat16 (SURVEY.md §5 precision row). The MLP
        # computes in the low dtype; SDF values are cast back to fp32 for
        # isosurface/top-k and everything downstream.
        self.compute_dtype = {
            "float16": jnp.bfloat16,
            "bfloat16": jnp.bfloat16,
            "float32": jnp.float32,
        }.get(cfg.precision, jnp.float32)
        if self.compute_dtype != jnp.float32:
            dsdf_params = jax.tree.map(
                lambda x: x.astype(self.compute_dtype), dsdf_params
            )
        self.dsdf_params = dsdf_params
        base_decoder = deepsdf.sdf_fn(dsdf_cfg, dsdf_params)
        if self.compute_dtype != jnp.float32:
            cdt = self.compute_dtype

            def decoder(latent, points):
                return base_decoder(
                    latent.astype(cdt), points.astype(cdt)
                ).astype(jnp.float32)

            self.decoder = decoder
        else:
            self.decoder = base_decoder
        # Hybrid selection precision ([optimization] select_bf16): bf16
        # band-selection decode + exact stage-2 re-decode. Only wired when
        # the main decoder is fp32 — under the default float16->bf16 map the
        # selection pass is already low-precision.
        self.select_decoder = None
        if (getattr(cfg, "select_bf16", False)
                and self.compute_dtype == jnp.float32):
            self.select_decoder = deepsdf.select_sdf_fn(
                dsdf_cfg, dsdf_params
            )
        # Fused Pallas selection decode ([optimization] select_pallas):
        # VMEM-resident stage-1 MLP (ops.mlp_pallas) — same rank-only
        # contract, no inter-layer HBM traffic. Wins over select_bf16 when
        # both are set; requires a TPU backend (the kernel is a Mosaic
        # program) and a supported architecture, else falls back silently.
        if (getattr(cfg, "select_pallas", False)
                and jax.default_backend() == "tpu"):
            from sdflabel_tpu.ops import mlp_pallas

            sel = mlp_pallas.pallas_select_fn(dsdf_cfg, dsdf_params)
            if sel is not None:
                self.select_decoder = sel
        # Fused stage-2 decode+normals ([optimization] stage2_pallas,
        # ops.mlp2_pallas): the differentiable band re-decode as one
        # VMEM-resident launch. Same numerics class as the XLA lowering
        # of the chain; silent fallback off-TPU / unsupported archs.
        self.stage2_fn = None
        if (getattr(cfg, "stage2_pallas", False)
                and jax.default_backend() == "tpu"):
            from sdflabel_tpu.ops import mlp2_pallas

            self.stage2_fn = mlp2_pallas.pallas_stage2_fn(
                dsdf_cfg, dsdf_params)
        self.grid_points = grid_ops.generate_point_grid(cfg.grid_density)
        self.surface_capacity = (
            surface_capacity if surface_capacity is not None
            else min(8192, cfg.grid_density ** 3)
        )
        self.frustum_capacity = frustum_capacity
        # Opt-in coarse-to-fine surface decode (grid.surface_from_decoder):
        # identical labels for a trained (distance-like) decoder, ~2x faster
        # refinement iterations; OFF by default to match the reference's
        # full-grid band selection exactly. Falls back to the INI knob
        # ([optimization] coarse_cells, 0 = off) when not passed explicitly.
        self.coarse_cells = (
            coarse_cells if coarse_cells is not None
            else (getattr(cfg, "coarse_cells", 0) or None)
        )
        # Warm-started band selection: the SHIPPING default since round 4
        # (QUALITY_r04.json: mAP identical to the exact path at the full
        # driver; 2.04x rays/s). Pool clamps to the grid size so small
        # grid_density configs stay valid (min(pool, density^3) is always
        # >= the surface capacity, which is itself <= density^3). An
        # explicit coarse_cells setting wins (pure coarse-to-fine; the
        # engine keeps the per-iteration paths mutually exclusive).
        wb = getattr(cfg, "warm_band", 0) or 0
        if self.coarse_cells:
            wb = 0
        self.warm_band = min(wb, cfg.grid_density ** 3) if wb else 0
        # Composed refresh ([optimization] warm_refresh_cells): the warm
        # candidate refresh runs through the c2f CELL pass (+9.4% rays/s
        # measured, quality-gated — BENCH_NOTES "Composed warm"). Clamped
        # to the cell count; falls back to full-grid refresh when the
        # warm pool wouldn't fit the cell pool (small grids).
        wrc = getattr(cfg, "warm_refresh_cells", 0) or 0
        if not self.warm_band:
            wrc = 0  # composition only exists on the warm path
        if cfg.grid_density % 2 != 0:
            # The cell pass partitions the grid into coarse_factor=2
            # children; an odd density has no such partition
            # (grid._cell_children_np raises). Fall back to full-grid
            # refresh, same as the small-grid case.
            wrc = 0
        if wrc:
            factor = 8  # coarse_factor=2 -> 2^3 children per cell
            n_cells = (cfg.grid_density // 2) ** 3
            wrc = min(wrc, n_cells)
            if self.warm_band > wrc * factor:
                wrc = 0
        self.warm_refresh_cells = wrc or None
        # RANSAC runs on a subsample of model/scene points: the inlier
        # scoring is H x N x M brute force on the MXU; 2048x2048 per
        # hypothesis matches KDTree-quality scoring at a fraction of the
        # FLOPs (pose.py scores against all points via KDTree, but inlier
        # COUNTS are rank statistics — subsampling preserves the argmax).
        self.ransac_model_capacity = min(ransac_model_capacity,
                                         self.surface_capacity)
        self.ransac_scene_capacity = ransac_scene_capacity
        self.ransac_cfg = ransac_cfg or ransac.RansacConfig(
            hypothesis_chunk=16
        )
        self.key = jax.random.PRNGKey(rng_seed)
        # Host-side RNG for scene/frustum subsampling: owned by the
        # runtime (NOT the global np.random state) so library callers of
        # refine_annotation/prepare_crop are deterministic per rng_seed
        # without any global seeding.
        self.np_rng = np.random.RandomState(rng_seed)
        # Optional device mesh for the batched driver path (set by
        # setup_runtime(mesh=...)): crops shard over its 'data' axis.
        self.mesh = None

        # latent head sized to the LOADED decoder (3 for the reference car
        # checkpoints; in-framework decoders may differ — models/css.py)
        self._css_model = css_mod.CSSNet(
            use_running_average=True, width=getattr(cfg, "css_width", 64),
            latent_size=dsdf_cfg.latent_size)
        self._css_apply = jax.jit(self._css_model.apply)
        self._surface = jax.jit(
            lambda latent: grid_ops.surface_from_decoder(
                self.decoder, latent, self.grid_points,
                capacity=self.surface_capacity,
            )
        )

        # Fused CSS forward + surface decode: ONE dispatch + ONE fetch per
        # crop instead of two of each (the surface decode consumes the CSS
        # latent directly on device).
        def _css_surf(variables, crop):
            out = self._css_model.apply(variables, crop)
            latent = out["latent"][0]
            surf, _sdf = grid_ops.surface_from_decoder(
                self.decoder, latent, self.grid_points,
                capacity=self.surface_capacity,
            )
            return out["uvw_sm_masked"][0], latent, surf

        self._css_surface = jax.jit(_css_surf)
        self._refine_cache: dict = {}
        rcfg = self.ransac_cfg
        self._ransac = jax.jit(
            lambda mp, mc, mm, sp, sc, sm, key: ransac.ransac_pose(
                mp, mc, mm, sp, sc, sm, key, method="kabsch",
                scale_model=2.0, cfg=rcfg,
            )
        )
        self._ransac_proc = jax.jit(
            lambda mp, mc, mm, sp, sc, sm, key: ransac.ransac_pose(
                mp, mc, mm, sp, sc, sm, key, method="procrustes", cfg=rcfg,
            )
        )
        self._ransac_method = cfg.pose_estimator

    def css_forward(self, crop_rgb: np.ndarray) -> dict:
        return self._css_apply(self.css_variables,
                               jnp.asarray(crop_rgb[None]))

    def surface(self, latent):
        return self._surface(jnp.asarray(latent))

    def css_and_surface(self, crop_rgb: np.ndarray):
        """(uvw_sm_masked (3,128,128), latent (L,), SurfacePoints) in one
        compiled dispatch. Falls back to the css_forward seam when a
        subclass provides an oracle CSS (tests) — css_forward overrides
        keep working, they just pay the second dispatch."""
        if (self.css_variables is not None
                and type(self).css_forward is RefineRuntime.css_forward
                and "css_forward" not in vars(self)):
            return self._css_surface(self.css_variables,
                                     jnp.asarray(crop_rgb[None]))
        pred = self.css_forward(crop_rgb)
        surf, _sdf = self.surface(pred["latent"][0])
        return pred["uvw_sm_masked"][0], pred["latent"][0], surf

    def refine_fn(self, crop_hw: tuple[int, int]):
        """Compiled refinement program for this crop shape (cached per
        shape; the intrinsics are a TRACED runtime argument, not a
        specialization key)."""
        key = crop_hw
        if key not in self._refine_cache:
            rcfg = refine_mod.RefineConfig(
                iters=self.cfg.iters,
                weight_2d=self.cfg.weight_2d,
                weight_3d=self.cfg.weight_3d,
                surface_capacity=self.surface_capacity,
                coarse_cells=self.coarse_cells,
                warm_band=self.warm_band,
                warm_refresh=getattr(self.cfg, "warm_refresh", 10),
                warm_refresh_cells=self.warm_refresh_cells,
            )

            def fn(params0, K_arr, nocs, fr, fm, pm=None):
                final, hist = refine_mod.make_refine_fn(
                    self.decoder, rcfg, self.grid_points, K_arr, crop_hw,
                    select_decoder=self.select_decoder,
                    stage2_fn=self.stage2_fn,
                )(params0, nocs, fr, fm, pm)
                # Final-latent band extents fused into the SAME program:
                # label finishing then fetches 7 floats instead of
                # re-decoding the surface eagerly and pulling the cloud.
                ext = labels_mod.surface_extents(
                    self.decoder, self.grid_points, final.latent,
                    capacity=self.surface_capacity,
                    threshold=rcfg.surface_threshold,
                )
                return final, hist, ext

            self._refine_cache[key] = jax.jit(fn)
        return self._refine_cache[key]

    def run_refine(self, prep, bucket: int | None = None):
        """Refine one prepared crop through a shape-BUCKETED program.

        (h, w) rounds up to multiples of `bucket` ([optimization]
        render_bucket, default 8) and the crop letterboxes into the
        bucket with a pixel validity mask — exactly equivalent rendering
        (padded pixels carry no loss terms; see refine_crops_batched,
        which letterboxes the same way), but ~16 bucket programs serve
        every crop shape where per-(h, w) compilation pays a fresh XLA
        compile per distinct shape (minutes each on a remote backend).
        bucket=1 reproduces exact per-shape compilation.

        Returns (final RefineParams, history, SurfaceExtents) — all
        device arrays from one compiled dispatch.
        """
        if bucket is None:
            bucket = getattr(self.cfg, "render_bucket", 8) or 1
        h, w = prep["crop_hw"]
        bh = -(-h // bucket) * bucket
        bw = -(-w // bucket) * bucket
        fn = self.refine_fn((bh, bw))
        # always pass an explicit pixel mask (an aligned crop calling the
        # 5-arg form would trace a SECOND program for the same bucket)
        nocs = np.zeros((3, bh, bw), np.float32)
        nocs[:, :h, :w] = prep["nocs_target"]
        pmask = np.zeros((bh, bw), bool)
        pmask[:h, :w] = True
        return fn(prep["params0"], jnp.asarray(prep["intrinsics"]),
                  jnp.asarray(nocs), jnp.asarray(prep["frustum"]),
                  jnp.asarray(prep["fmask"]), jnp.asarray(pmask))

    def next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def reset_rng(self, rng_seed: int = 1):
        """Re-seed the runtime-owned RNGs (used on cache reuse so repeated
        same-config driver runs stay deterministic; jit caches persist)."""
        self.key = jax.random.PRNGKey(rng_seed)
        self.np_rng = np.random.RandomState(rng_seed)

    def estimate_pose(self, pcd_dsdf, nocs_dsdf, model_mask, scene_pts,
                      scene_cls, off_intrinsics=None, nocs_pred_resized=None):
        """Pose init dispatch (pose.py:8-38): kabsch/procrustes on-device
        RANSAC, or host-side PnP."""
        method = self._ransac_method
        if method == "pnp":
            from sdflabel_tpu.ops import pnp

            pose = pnp.init_pose_2d(off_intrinsics, nocs_pred_resized,
                                    scale_model=2.0)
            return {"scale": float(pose["scale"]),
                    "rot": np.asarray(pose["rot"], np.float64),
                    "tra": np.asarray(pose["tra"], np.float64)}
        if scene_pts.shape[0] < 5:
            return None
        cap = self.ransac_scene_capacity
        n = min(scene_pts.shape[0], cap)
        sel = self.np_rng.choice(scene_pts.shape[0], n, replace=False) \
            if scene_pts.shape[0] > cap else np.arange(scene_pts.shape[0])
        sp = np.zeros((cap, 3), np.float32)
        sc = np.zeros((cap, 3), np.float32)
        sm = np.zeros(cap, bool)
        sp[:n] = scene_pts[sel[:n]]
        sc[:n] = scene_cls[sel[:n]]
        sm[:n] = True
        # subsample model points to the ransac capacity
        mcap = self.ransac_model_capacity
        pcd_dsdf = jnp.asarray(pcd_dsdf)[:mcap]
        nocs_dsdf = jnp.asarray(nocs_dsdf)[:mcap]
        model_mask = jnp.asarray(model_mask)[:mcap]
        fn = self._ransac if method == "kabsch" else self._ransac_proc
        pose = fn(
            pcd_dsdf, nocs_dsdf, model_mask, jnp.asarray(sp),
            jnp.asarray(sc), jnp.asarray(sm), self.next_key(),
        )
        num_inliers, pscale, prot, ptra = _fetch(
            pose.num_inliers, pose.scale, pose.rot, pose.tra)
        if int(num_inliers) < self.ransac_cfg.min_inliers:
            return None  # pose.py:135 "no pose found" threshold
        return {
            "scale": float(pscale),
            "rot": np.asarray(prot, np.float64),
            "tra": np.asarray(ptra, np.float64),
        }


# Process-wide runtime reuse: a fresh RefineRuntime rebuilds every jit
# closure, and re-tracing + compilation-cache DESERIALIZATION of the big
# refine executables costs ~5.3 s per program even on a warm persistent
# cache (BENCH_NOTES "End-to-end driver throughput"). Same config ->
# same compiled programs, so the runtime itself is cached; only its RNG
# state is reset per setup_runtime call, preserving the determinism
# contract (same seed -> same outputs) across repeated driver runs.
_RUNTIME_CACHE: dict = {}


def setup_runtime(cfgp_or_cfg, rng_seed: int = 1,
                  reuse: bool = True, mesh=None) -> RefineRuntime:
    """mesh: optional jax.sharding.Mesh with a 'data' axis — the batched
    driver path then shards the per-frame crop batch over it (each device
    refines its crop shard; no collectives, exactly the reference's MPI
    frame-partitioning pattern but on-chip). None = single device."""
    cfg = (cfgp_or_cfg if isinstance(cfgp_or_cfg, cfg_mod.RefineCfg)
           else cfg_mod.RefineCfg.from_ini(cfgp_or_cfg))
    key = (dataclasses.astuple(cfg), rng_seed, id(mesh))
    if reuse and key in _RUNTIME_CACHE:
        rt = _RUNTIME_CACHE[key]
        rt.reset_rng(rng_seed)
        return rt
    dsdf_cfg, dsdf_params = deepsdf.load_torch_checkpoint(cfg.deepsdf_path)
    css_variables = setup_css(cfg.css_path, width=cfg.css_width,
                              latent_size=dsdf_cfg.latent_size)
    rt = RefineRuntime(cfg, css_variables, dsdf_cfg, dsdf_params, rng_seed,
                       coarse_cells=cfg.coarse_cells or None)
    rt.mesh = mesh
    if reuse:
        _RUNTIME_CACHE[key] = rt
    return rt


def prepare_crop(rt: RefineRuntime, sample: dict, anno: dict,
                 maskrcnn=None, bbox_max_id=None):
    """Per-annotation setup: crop, CSS, surface, reproject, pose init.

    Mirrors refine_css.py:94-196. Returns a dict with everything the
    refinement loop needs (params0, intrinsics, crop size, NOCS target,
    frustum cloud) or None on any of the reference's skip conditions.
    """
    cfg = rt.cfg
    label_type = cfg.label_type

    max_crop_area = cfg.rendering_area ** 2
    l, t, r, b = [int(v) for v in anno["bbox"]]
    if r <= l + 2 or b <= t + 2:
        return None
    crop_bgr = sample["image"][t:b, l:r].copy()
    crop_dep = sample["depth"][t:b, l:r].copy()

    K = sample["orig_cam"]
    crop_size, intrinsics, off_intrinsics = geometry.adjust_intrinsics_crop(
        K, crop_bgr.shape[:2], anno["bbox"], max_crop_area
    )
    pcd_crop, _ = geometry.reproject_np(crop_bgr, crop_dep, off_intrinsics)

    if label_type == "maskrcnn" and maskrcnn is not None:
        mask = np.asarray(maskrcnn["masks"][bbox_max_id], np.float32)
        crop_bgr = crop_bgr * mask[..., None]

    crop_rgb, _ = transform_bgr_crop(crop_bgr)
    nocs_dev, latent_dev, surf = rt.css_and_surface(crop_rgb)
    # One combined fetch: CSS NOCS + latent + the surface cloud pieces the
    # host math below needs (height re-estimation). The device-side surf
    # arrays stay live for RANSAC — no re-upload.
    nocs_raw, latent_pred, surf_pts_np, surf_mask_np = _fetch(
        nocs_dev, latent_dev, surf.points, surf.mask)
    nocs_pred = np.asarray(nocs_raw) / 255.0
    pcd_dsdf, nocs_dsdf = surf.points, surf.nocs

    nocs_pred_resized = nearest_resize_chw(nocs_pred, crop_dep.shape[:2])
    nocs_3d_pts, nocs_3d_cls = geometry.reproject_np(
        nocs_pred_resized, crop_dep[None], off_intrinsics, filter_nocs=True
    )

    init_pose = rt.estimate_pose(pcd_dsdf, nocs_dsdf, surf.mask,
                                 nocs_3d_pts, nocs_3d_cls,
                                 off_intrinsics=off_intrinsics,
                                 nocs_pred_resized=nocs_pred_resized)
    if init_pose is None:
        print("NO RANSAC POSE FOUND!!!")
        return None
    scale, rot, tra = init_pose["scale"], init_pose["rot"], init_pose["tra"]

    # Azimuth-only constraint + yaw extraction (refine_css.py:176-178)
    rot[:, 1] = [0, 1, 0]
    rot[1, :] = [0, 1, 0]
    yaw = geometry.roty_in_bev(
        np.pad(rot @ np.diag([-1.0, 1.0, 1.0]), ((0, 1), (0, 1)))
    ) + math.pi / 2

    # Height re-estimation (refine_css.py:180-189)
    pcd_np = surf_pts_np[surf_mask_np]
    world_points = (rot @ (pcd_np * scale).T).T + tra
    proj_world = geometry.project_np(sample["orig_cam"], world_points)
    L, T = proj_world[:, 0].min(), proj_world[:, 1].min()
    R, B = proj_world[:, 0].max(), proj_world[:, 1].max()
    iou = geometry.compute_iou([l, t, r, b], [L, T, R, B])
    if iou < 0.7 and len(nocs_3d_pts):
        print("Restimating height")
        ymin, ymax = world_points[:, 1].min(), world_points[:, 1].max()
        tra[1] = nocs_3d_pts[:, 1].min() + (ymax - ymin) / 2

    # [stress] init perturbation (benchmark stressor, config.py): a
    # deterministic seeded kick to the RANSAC init so refinement must
    # travel far — makes the warm-band staleness axis adversarial.
    if (cfg.stress_init_yaw_deg or cfg.stress_init_trans_m
            or cfg.stress_init_scale or cfg.stress_init_latent):
        srng = rt.np_rng
        yaw = float(yaw) + math.radians(cfg.stress_init_yaw_deg) \
            * (1.0 if srng.rand() < 0.5 else -1.0)
        tra = np.asarray(tra, np.float64) \
            + srng.randn(3) * cfg.stress_init_trans_m
        scale = np.asarray(scale, np.float64) \
            * (1.0 + cfg.stress_init_scale
               * (1.0 if srng.rand() < 0.5 else -1.0))
        latent_pred = np.asarray(latent_pred) + (
            srng.randn(*np.shape(latent_pred))
            * cfg.stress_init_latent).astype(np.float32)

    # Pack refinement inputs (refine_css.py:192-214)
    params0 = refine_mod.init_refine_params(
        yaw, tra / scale, scale, latent_pred
    )
    h, w = int(crop_size[0]), int(crop_size[1])
    cap = rt.frustum_capacity
    frustum = np.zeros((cap, 3), np.float32)
    fmask = np.zeros(cap, bool)
    n = min(len(pcd_crop), cap)
    if n > 0:
        sel = (rt.np_rng.choice(len(pcd_crop), n, replace=False)
               if len(pcd_crop) > cap else np.arange(len(pcd_crop)))
        frustum[:n] = pcd_crop[sel[:n]]
        fmask[:n] = True

    nocs_target = nearest_resize_chw(nocs_pred, (h, w)).astype(np.float32)
    return {
        "params0": params0,
        "intrinsics": np.asarray(intrinsics, np.float32),
        "crop_hw": (h, w),
        "nocs_target": nocs_target,
        "frustum": frustum,
        "fmask": fmask,
        "anno": anno,
    }


def finish_label(rt: RefineRuntime, final, sample: dict, anno: dict,
                 extents=None):
    """Label generation from final params (refine_css.py:228-236).

    Returns None when the final latent decodes to an empty surface band.

    extents: SurfaceExtents already computed on device by the refinement
    program (run_refine / refine_crops_batched) — ONE 7-float fetch then
    pure host float64 label math. When None (legacy callers), falls back
    to the eager host-driven re-decode.
    """
    if extents is not None:
        yaw, scale, trans, mn, mx, valid = _fetch(
            final.yaw, final.scale, final.trans,
            extents.mn, extents.mx, extents.valid)
        if not bool(valid):
            return None
        return labels_mod.kitti_label_from_extents(
            yaw, scale, trans, mn, mx, sample["world_to_cam"],
            anno["bbox"])
    label, scaled_points, cam_t = labels_mod.get_kitti_label(
        rt.decoder, rt.grid_points, np.asarray(final.latent),
        np.asarray(final.scale), np.asarray(final.trans),
        np.asarray(final.yaw), sample["world_to_cam"], anno["bbox"],
        capacity=rt.surface_capacity,
    )
    return label


def render_trajectory(rt: RefineRuntime, prep: dict, sample: dict, hist,
                      out_dir: str, tag: str = "", max_frames: int = 8,
                      live_dir: str | None = None):
    """Post-hoc per-iteration visualization from the scan history.

    The reference plots patches / full frame / 3D correspondences LIVE every
    iteration (optimizer.py:160-164, visualizer.py:9-88); our loop is a
    single jitted lax.scan with zero host syncs, so instead the recorded
    per-iteration params (RefineStepOut.params) are re-rendered afterwards
    for `max_frames` evenly spaced iterations — same images, headless PNGs:
      *_patches.png  rendered-vs-CSS NOCS side by side (visualizer.py:9-19)
      *_frame.png    normals overlaid into the frame bbox (:22-48)
      *_corr.png     ('3d' only) BEV correspondence heat lines (:51-88)
    Returns the list of written paths.

    live_dir ([visualization] live = True): the headless analogue of the
    reference's cv2/Open3D windows — as each trajectory image is written
    it is also atomically published to `live_dir/latest_<kind>.png`
    (stable paths; point any auto-reloading viewer / `watch`-style tool
    at them to follow the optimization as the driver progresses). The
    granularity is per re-rendered iteration, right after each crop's
    jitted scan completes — per-iteration host callbacks inside the scan
    would reintroduce the GPU->CPU sync the engine exists to eliminate.
    """
    from sdflabel_tpu.renderer import rasterer as rast_mod
    from sdflabel_tpu.utils import viz

    viz_type = rt.cfg.viz_type
    if not viz_type or viz_type == "none":
        return []
    os.makedirs(out_dir, exist_ok=True)
    if live_dir is None and getattr(rt.cfg, "viz_live", False):
        live_dir = os.path.join(out_dir, "live")
    if live_dir is not None:
        os.makedirs(live_dir, exist_ok=True)

    def publish(path):
        if live_dir is None:
            return
        import shutil

        kind = path.rsplit("_", 1)[-1]  # patches.png / frame.png / corr.png
        tmp = os.path.join(live_dir, f".latest_{kind}.tmp")
        shutil.copyfile(path, tmp)
        os.replace(tmp, os.path.join(live_dir, f"latest_{kind}"))

    iters = len(np.asarray(hist.loss))
    sel = np.unique(np.linspace(0, iters - 1, max_frames).astype(int))
    h, w = prep["crop_hw"]
    K = jnp.asarray(prep["intrinsics"])
    written = []
    last_corr = None  # final-iteration data for the interactive 3D export
    for it in sel:
        p = jax.tree.map(lambda x: jnp.asarray(x[it]), hist.params)
        # same latent normalization as the refinement iteration
        lat = np.asarray(p.latent, np.float64)
        latent = jnp.asarray(
            lat / np.sqrt(max(float(np.sum(lat * lat)), 1e-24)),
            jnp.float32)
        surf, _sdf = rt.surface(latent)
        pose = refine_mod.build_render_pose(
            jnp.asarray(p.yaw, jnp.float32), jnp.asarray(p.trans, jnp.float32))
        rendering, points = rast_mod.render(
            K, (w, h), surf.points, surf.normals, surf.normals, pose,
            point_mask=surf.mask, rot="dcm", primitives="disc",
            output_nocs=True,
        )
        base = os.path.join(out_dir, f"{tag}iter{it:04d}")
        viz.plot_patches(np.asarray(rendering.color), prep["nocs_target"],
                         path=base + "_patches.png")
        written.append(base + "_patches.png")
        publish(base + "_patches.png")
        if "image" in sample:
            # sample['image'] is cv2-loaded BGR (data/kitti.py); _save
            # writes through PIL as RGB — swap channels for the overlay
            viz.plot_full_frame(np.asarray(sample["image"])[..., ::-1],
                                np.asarray(rendering.normals),
                                prep["anno"]["bbox"],
                                path=base + "_frame.png")
            written.append(base + "_frame.png")
            publish(base + "_frame.png")
        if viz_type == "3d":
            # model->scene nearest neighbors in the scale-normalized frame,
            # exactly the pairing the 3D loss uses (optimizer.py:180-181)
            xyz = np.asarray(points.xyz, np.float64)
            front = np.asarray(points.front_mask, bool)
            scale = max(float(np.asarray(p.scale).reshape(-1)[0]), 1e-9)
            scene = np.asarray(prep["frustum"], np.float64) / scale
            smask = np.asarray(prep["fmask"], bool)
            d = np.linalg.norm(xyz[:, None, :] - scene[None], axis=-1)
            d[:, ~smask] = np.inf
            idxs = d.argmin(1)
            dmin = d[np.arange(len(xyz)), idxs]
            ok = front & np.isfinite(dmin)
            viz.plot_correspondences_bev(
                xyz, scene, idxs, np.where(ok, dmin, 0.0),
                mask_a=ok, mask_b=smask, path=base + "_corr.png",
            )
            written.append(base + "_corr.png")
            publish(base + "_corr.png")
            last_corr = (xyz, scene, idxs, dmin, ok, smask)
    if viz_type == "3d" and last_corr is not None:
        # Interactive analogue of the reference's Open3D correspondence
        # window (visualizer.py:51-88): a self-contained orbitable HTML
        # scene at the final re-rendered iteration (utils.viz3d).
        from sdflabel_tpu.utils import viz3d

        xyz, scene, idxs, dmin, ok, smask = last_corr
        html = os.path.join(out_dir, f"{tag}scene3d.html")
        viz3d.export_scene_html(
            html,
            model_points=xyz[ok],
            scene_points=scene[smask],
            correspondences={"a": xyz[ok], "b": scene[idxs[ok]],
                             "heat": dmin[ok]},
            title=f"correspondences {tag or 'crop'}",
        )
        written.append(html)
    return written


def refine_annotation(rt: RefineRuntime, sample: dict, anno: dict,
                      maskrcnn=None, bbox_max_id=None, verbose=True,
                      viz_dir=None, viz_tag=""):
    """Process one annotation; returns label dict or None (skip)."""
    prep = prepare_crop(rt, sample, anno, maskrcnn, bbox_max_id)
    if prep is None:
        return None
    final, hist, ext = rt.run_refine(prep)
    if viz_dir is not None:
        render_trajectory(rt, prep, sample, hist, viz_dir, tag=viz_tag)
    if verbose:
        # loss summary (the reference prints per-iteration losses,
        # optimizer.py:154; one host sync at the end instead of 60)
        losses, l2d, l3d, applied = _fetch(
            hist.loss, hist.loss_2d, hist.loss_3d, hist.applied)
        print(
            "REFINE {} iters | loss {:.5f} -> {:.5f} "
            "(2D {:.5f} -> {:.5f}, 3D {:.5f} -> {:.5f}, applied {}/{})".format(
                len(losses), losses[0], losses[-1], l2d[0], l2d[-1],
                l3d[0], l3d[-1], int(applied.sum()), len(applied),
            )
        )
    return finish_label(rt, final, sample, prep["anno"], extents=ext)


def refine_crops_batched(rt: RefineRuntime, sample: dict, preps: list,
                         viz_dir: str | None = None, viz_tag: str = ""):
    """Refine a batch of prepared crops in ONE compiled program.

    Variable crop sizes letterbox into an (A, A) square render
    (A = rendering_area) with per-crop pixel validity masks — exactly
    equivalent to the per-size renders (see engine.losses.loss_2d), but
    every crop of the frame refines simultaneously (vmapped lax.scan;
    SURVEY.md §7.6 "this is where crops/hour is won").

    viz_dir: when set (and cfg.viz_type != 'none'), per-crop trajectory
    visualizations are re-rendered post hoc from the vmapped history —
    the batched twin of the sequential branch's render_trajectory call.
    """
    from sdflabel_tpu.parallel import batched_refine

    if not preps:
        return []
    b = len(preps)
    latent_dim = preps[0]["params0"].latent.shape[0]
    # Bucket = max crop extent in the batch, rounded up to the render
    # bucket ([optimization] render_bucket) — elongated boxes keep all
    # their pixels (h or w can exceed rendering_area for extreme aspect
    # ratios since only h*w <= area^2 is bounded).
    bucket = getattr(rt.cfg, "render_bucket", 8) or 1
    bh = -(-max(p["crop_hw"][0] for p in preps) // bucket) * bucket
    bw = -(-max(p["crop_hw"][1] for p in preps) // bucket) * bucket
    # Pad the batch to the next power of two: vmapped lanes are
    # independent, so duplicate lanes change nothing per crop, while the
    # program count stays O(log max-crops-per-frame) instead of one
    # compile per distinct crop COUNT (each a multi-minute XLA compile of
    # the full 60-iteration scan on a remote backend). Under a mesh the
    # batch additionally pads up to the 'data' axis size so the crop
    # shard is even across devices.
    mesh = getattr(rt, "mesh", None)
    min_b = b
    if mesh is not None:
        min_b = max(b, int(mesh.shape.get("data", 1)))
    pb = 1
    while pb < min_b:
        pb *= 2
    if mesh is not None:
        nd = int(mesh.shape.get("data", 1))
        while pb % nd:
            pb *= 2
    pad = [preps[-1]] * (pb - b)

    params0 = refine_mod.RefineParams(
        yaw=jnp.stack([p["params0"].yaw for p in preps + pad]),
        trans=jnp.stack([p["params0"].trans for p in preps + pad]),
        scale=jnp.stack([p["params0"].scale for p in preps + pad]),
        latent=jnp.stack([p["params0"].latent for p in preps + pad]),
    )
    Kb = np.stack([p["intrinsics"] for p in preps + pad])
    nocs = np.zeros((pb, 3, bh, bw), np.float32)
    pmask = np.zeros((pb, bh, bw), bool)
    for i, p in enumerate(preps + pad):
        h, w = p["crop_hw"]
        nocs[i, :, :h, :w] = p["nocs_target"]
        pmask[i, :h, :w] = True
    frustum = np.stack([p["frustum"] for p in preps + pad])
    fmask = np.stack([p["fmask"] for p in preps + pad])

    key = ("batched", bh, bw, pb, latent_dim)
    if key not in rt._refine_cache:
        tile_px, tile_chunk = batched_refine.batch_tile_hints(pb)
        rcfg = refine_mod.RefineConfig(
            iters=rt.cfg.iters, weight_2d=rt.cfg.weight_2d,
            weight_3d=rt.cfg.weight_3d,
            surface_capacity=rt.surface_capacity,
            coarse_cells=rt.coarse_cells,
            warm_band=rt.warm_band,
            warm_refresh=getattr(rt.cfg, "warm_refresh", 10),
            warm_refresh_cells=rt.warm_refresh_cells,
            splat_block_px=tile_px, splat_chunk=tile_chunk,
        )
        rt._refine_cache[key] = batched_refine.make_batched_refine(
            rt.decoder, rcfg, rt.grid_points, (bh, bw), mesh=mesh,
            select_decoder=rt.select_decoder, stage2_fn=rt.stage2_fn,
            with_extents=True,
        )
    fn = rt._refine_cache[key]
    final, hist, ext = fn(params0, jnp.asarray(Kb), jnp.asarray(nocs),
                          jnp.asarray(frustum), jnp.asarray(fmask),
                          jnp.asarray(pmask))
    # ONE fetch for every crop's label inputs (B x 7 floats + B x params);
    # finish_label then runs on host slices (its _fetch is a no-op on
    # numpy inputs), keeping the monkeypatchable seam.
    yaw_b, scale_b, trans_b, lat_b, mn_b, mx_b, valid_b = _fetch(
        final.yaw, final.scale, final.trans, final.latent,
        ext.mn, ext.mx, ext.valid)
    labels = []
    for i, p in enumerate(preps):
        one = refine_mod.RefineParams(
            yaw=yaw_b[i], trans=trans_b[i], scale=scale_b[i],
            latent=lat_b[i],
        )
        ext_i = labels_mod.SurfaceExtents(
            mn=mn_b[i], mx=mx_b[i], valid=valid_b[i])
        if viz_dir is not None and rt.cfg.viz_type not in (None, "",
                                                           "none"):
            hist_i = jax.tree.map(lambda x: x[i], hist)  # vmap axis 0
            render_trajectory(rt, p, sample, hist_i, viz_dir,
                              tag=f"{viz_tag}c{i:02d}_")
        label = finish_label(rt, one, sample, p["anno"], extents=ext_i)
        if label is not None:
            labels.append(label)
    return labels


def _fuse_maskrcnn(anno, maskrcnn_labels):
    """IoU-max MaskRCNN bbox fusion (refine_css.py:100-114)."""
    ious = [geometry.get_iou(np.asarray(bbox, np.float64), anno["bbox"])
            for bbox in np.asarray(maskrcnn_labels["bboxes"])]
    bbox_max_id = int(np.argmax(ious))
    if ious[bbox_max_id] < 0.5:
        return None, None
    bbox = np.asarray(maskrcnn_labels["bboxes"][bbox_max_id]).astype(int)
    return bbox, bbox_max_id


def refine_css(cfgp, subset_frames=None, batched=True, mesh=None):
    """Full KITTI autolabeling driver (refine_css.py:26).

    batched=True refines all of a frame's crops in one compiled program
    (refine_crops_batched); batched=False reproduces the reference's
    sequential per-annotation loop. mesh: optional Mesh with a 'data'
    axis — the batched path then shards each frame's crop batch over it
    (see setup_runtime).
    """
    np.random.seed(1)
    cfg = cfg_mod.RefineCfg.from_ini(cfgp)
    rt = setup_runtime(cfg, mesh=mesh)

    kitti = kitti_mod.KITTI3D(path=cfg.kitti_path)
    total_annotations, total_estimations = OrderedDict(), OrderedDict()
    os.makedirs(cfg.labels_out, exist_ok=True)

    if subset_frames is None:
        subset_frames = range(len(kitti))

    def _already_dumped(idx):
        return os.path.exists(os.path.join(cfg.labels_out, f"{idx}.pkl"))

    # Frame loading (host preprocessing: normals, depth map) overlaps the
    # previous frame's device refinement — see kitti_mod.prefetch_frames.
    for frame_idx, sample in kitti_mod.prefetch_frames(
            kitti, subset_frames, skip_fn=_already_dumped):
        print("Frame", frame_idx)
        out_path = os.path.join(cfg.labels_out, f"{frame_idx}.pkl")
        if sample is None or os.path.exists(out_path):
            print("file exists already!")
            continue

        if not [a for a in sample.get("gt", []) if a["name"] == "Car"]:
            continue

        frame_annos, frame_estimations = defaultdict(list), defaultdict(list)
        annos = kitti_mod.get_annos(cfg.diff_annos, sample)

        maskrcnn_labels = None
        if cfg.label_type != "gt":
            mpath = os.path.join(cfg.maskrcnn_labels_path,
                                 f"{frame_idx}.lbl")
            if not os.path.exists(mpath):
                print("Skip frame")
                continue
            import torch

            maskrcnn_labels = torch.load(mpath, map_location="cpu",
                                         weights_only=False)

        preps = []
        for anno_idx, anno in enumerate(annos):
            for key, value in anno.items():
                frame_annos[key].append(value)

            bbox_max_id = None
            if cfg.label_type != "gt":
                bbox, bbox_max_id = _fuse_maskrcnn(anno, maskrcnn_labels)
                if bbox is None:
                    print("Skip frame!")
                    continue
                anno = dict(anno, bbox=bbox)

            prep = prepare_crop(rt, sample, anno, maskrcnn_labels,
                                bbox_max_id)
            if prep is None:
                continue
            if batched:
                preps.append(prep)
            else:
                final, hist, ext = rt.run_refine(prep)
                if cfg.viz_type and cfg.viz_type != "none":
                    render_trajectory(
                        rt, prep, sample, hist,
                        os.path.join(cfg.labels_out, "viz"),
                        tag=f"f{frame_idx:06d}_a{anno_idx:02d}_",
                    )
                label = finish_label(rt, final, sample, prep["anno"],
                                     extents=ext)
                if label is None:
                    # finish_label returns None when the refined latent
                    # decodes to an empty surface band (QUIRKS #15) —
                    # skip exactly like the batched branch does.
                    continue
                for key, value in label.items():
                    frame_estimations[key].append(value)

        if batched and preps:
            viz_dir = (os.path.join(cfg.labels_out, "viz")
                       if cfg.viz_type and cfg.viz_type != "none" else None)
            for label in refine_crops_batched(
                    rt, sample, preps, viz_dir=viz_dir,
                    viz_tag=f"f{frame_idx:06d}_"):
                for key, value in label.items():
                    frame_estimations[key].append(value)

        if not frame_annos:
            continue

        necessary = ["alpha", "bbox", "dimensions", "location",
                     "rotation_y", "score"]
        for key in necessary:
            frame_annos[key] = np.asarray(frame_annos[key])
            frame_estimations[key] = np.asarray(frame_estimations[key])

        pickle.dump([frame_annos, frame_estimations], open(out_path, "wb"))
        total_annotations[frame_idx] = frame_annos
        total_estimations[frame_idx] = frame_estimations

    if not total_annotations:
        # every frame was skipped (idempotent re-run / disjoint process
        # partition already done) — nothing to evaluate; run --evaluate on
        # the dumps instead. The eval below would crash on zero frames.
        print("No frames processed (all outputs exist); skipping eval.")
        return total_annotations, total_estimations

    # Backfill empty predictions before the in-process eval (the reference
    # only does this in evaluate_dump.py:37-44; frames where every crop was
    # skipped would otherwise fail format validation).
    eval_estimations = []
    for est in total_estimations.values():
        if "name" not in est or len(est["name"]) == 0:
            est = dict(est)
            est["name"] = []
            est["location"] = np.zeros((0, 3))
            est["dimensions"] = np.zeros((0, 3))
            est["bbox"] = np.zeros((0, 4))
            est["rotation_y"] = np.zeros((0,))
            est["alpha"] = np.zeros((0,))
            est["score"] = np.zeros((0,))
        eval_estimations.append(est)

    from sdflabel_tpu.pipelines.evaluate_dump import FILTER_FNS

    filter_fn = FILTER_FNS[getattr(cfg, "eval_filter", "kitti")]
    for compute_nuscenes in (False, True):
        evaluator = Detection3DEvaluator(
            filter_fn, compute_nuscenes=compute_nuscenes,
            coordinate_frame=CoordinateFrame.CAMERA,
        )
        formatted, _ = evaluator.evaluate_detection_3d(
            list(total_annotations.values()), eval_estimations,
            ["Car"], difficulties=[0],
        )
        print(formatted)
    return total_annotations, total_estimations


def load_demo_sample(root: str = "data/optimization") -> dict:
    """Bundled demo frame (the reference ships kitti_sample.pt,
    refine_css_demo.py:51; we ship a synthetic kitti_sample.npz generated
    by scripts/make_demo_assets.py so --demo runs from a clean checkout).
    Paths are relative to the process cwd, like the reference's."""
    import json

    npz_path = os.path.join(root, "kitti_sample.npz")
    pt_path = os.path.join(root, "kitti_sample.pt")
    pkl_path = os.path.join(root, "kitti_sample.pkl")
    if os.path.exists(npz_path):
        data = np.load(npz_path)
        sample = {k: data[k] for k in
                  ("image", "depth", "orig_cam", "world_to_cam", "lidar")}
        meta = json.loads(str(data["annos_json"]))
        sample["annos"] = meta["annos"]
        sample["gt"] = meta.get("gt", [])
        return sample
    if os.path.exists(pt_path):
        import torch

        return torch.load(pt_path, map_location="cpu", weights_only=False)
    if os.path.exists(pkl_path):
        return pickle.load(open(pkl_path, "rb"))
    raise FileNotFoundError(
        "no demo sample found (data/optimization/kitti_sample.{npz,pt,pkl};"
        " run scripts/make_demo_assets.py)")


def load_demo_maskrcnn(root: str = "data/optimization") -> dict:
    """Bundled demo MaskRCNN labels (reference: data/optimization/
    maskrcnn.lbl, refine_css_demo.py:62). Ours is an .npz with `bboxes`
    (N,4) and per-instance crop-shaped masks `mask_i`."""
    npz_path = os.path.join(root, "maskrcnn.npz")
    lbl_path = os.path.join(root, "maskrcnn.lbl")
    if os.path.exists(npz_path):
        data = np.load(npz_path)
        bboxes = data["bboxes"]
        return {"bboxes": bboxes,
                "masks": [data[f"mask_{i}"] for i in range(len(bboxes))]}
    if os.path.exists(lbl_path):
        import torch

        return torch.load(lbl_path, map_location="cpu", weights_only=False)
    raise FileNotFoundError(
        "no maskrcnn demo labels (data/optimization/maskrcnn.{npz,lbl})")


def refine_css_demo(cfgp, sample=None):
    """Demo refinement on one pre-stored frame (refine_css_demo.py:23).

    `sample` may be passed directly (tests); otherwise loads
    data/optimization/kitti_sample.pt (torch) or .npz (ours).
    """
    np.random.seed(1)
    cfg = (cfgp if isinstance(cfgp, cfg_mod.RefineCfg)
           else cfg_mod.RefineCfg.from_ini(cfgp))
    rt = setup_runtime(cfg)

    if sample is None:
        sample = load_demo_sample()

    # MaskRCNN demo branch (refine_css_demo.py:62-77): argmax-IoU box
    # replaces the GT bbox (NO 0.5 threshold, unlike the driver's
    # _fuse_maskrcnn) and the instance mask multiplies the crop inside
    # prepare_crop when label_type == 'maskrcnn'.
    maskrcnn_labels = None
    if cfg.label_type != "gt":
        maskrcnn_labels = load_demo_maskrcnn()

    viz_dir = None
    if cfg.viz_type and cfg.viz_type != "none":
        viz_dir = os.path.join(cfg.labels_out, "viz")

    frame_annos, frame_estimations = defaultdict(list), defaultdict(list)
    est_anno_idx = []  # source annotation of each estimation (skips shift
    # estimation indices, so est i is NOT in general anno i)
    annos = kitti_mod.get_annos(cfg.diff_annos, sample)
    for anno_idx, anno in enumerate(annos):
        for key, value in anno.items():
            frame_annos[key].append(value)

        bbox_max_id = None
        if maskrcnn_labels is not None:
            ious = [geometry.get_iou(np.asarray(b, np.float64), anno["bbox"])
                    for b in np.asarray(maskrcnn_labels["bboxes"])]
            bbox_max_id = int(np.argmax(ious))
            anno = dict(anno, bbox=np.asarray(
                maskrcnn_labels["bboxes"][bbox_max_id]).astype(int))

        label = refine_annotation(rt, sample, anno,
                                  maskrcnn=maskrcnn_labels,
                                  bbox_max_id=bbox_max_id,
                                  viz_dir=viz_dir,
                                  viz_tag=f"demo_a{anno_idx:02d}_")
        if label is None:
            continue
        est_anno_idx.append(anno_idx)
        for key, value in label.items():
            frame_estimations[key].append(value)

    necessary = ["alpha", "bbox", "dimensions", "location", "rotation_y",
                 "score"]
    for key in necessary:
        frame_annos[key] = np.asarray(frame_annos[key])
        frame_estimations[key] = np.asarray(frame_estimations[key])

    # Headless stand-in for the reference's final Open3D view
    # (refine_css_demo.py:198 plot_3d_final): BEV schematic of the LIDAR
    # with estimated (red) vs GT (green) cuboids, saved to the labels dir
    # — PLUS the interactive single-file HTML scene (utils.viz3d), the
    # orbitable analogue of the Open3D window itself.
    if cfg.viz_type and cfg.viz_type != "none":
        from sdflabel_tpu.utils import viz, viz3d

        os.makedirs(cfg.labels_out, exist_ok=True)
        n_est = len(frame_estimations.get("location", []))
        box_keys = ("dimensions", "location", "rotation_y")
        viz3d.export_scene_html(
            os.path.join(cfg.labels_out, "demo_scene3d.html"),
            lidar=sample.get("lidar", np.zeros((0, 3))),
            est_boxes=[{k: frame_estimations[k][i] for k in box_keys}
                       for i in range(n_est)],
            gt_boxes=[{k: frame_annos[k][src] for k in box_keys}
                      for src in est_anno_idx],
            title="autolabels vs GT",
        )
        for i in range(n_est):
            est = {k: frame_estimations[k][i]
                   for k in ("dimensions", "location", "rotation_y")}
            # pair each estimation with ITS source annotation (skipped
            # annos shift estimation indices)
            src = est_anno_idx[i]
            gt_box = {k: frame_annos[k][src]
                      for k in ("dimensions", "location", "rotation_y")}
            viz.plot_bev(
                sample.get("lidar", np.zeros((0, 3))), label=est,
                gt_anno=gt_box,
                path=os.path.join(cfg.labels_out, f"demo_bev_{i}.png"),
            )
    return frame_annos, frame_estimations
