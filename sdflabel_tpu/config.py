"""Typed INI config system.

Behavioral parity target: utils/data.py:5-96 (read_cfg_{string,int,float,
bool,precision}) and the reference config files configs/config_refine.ini /
configs/config_train.ini — every key is preserved. `precision` maps to jnp
dtypes; 'float16' requests map to bfloat16 on TPU by default (see
SURVEY.md §5 precision row) unless strict fp16 is forced.
"""

from __future__ import annotations

import configparser
import dataclasses

import jax.numpy as jnp


def read_cfg_string(cfgp, section, key, default):
    if cfgp.has_option(section, key):
        return cfgp.get(section, key)
    return default


def read_cfg_int(cfgp, section, key, default):
    if cfgp.has_option(section, key):
        return cfgp.getint(section, key)
    return default


def read_cfg_float(cfgp, section, key, default):
    if cfgp.has_option(section, key):
        return cfgp.getfloat(section, key)
    return default


def read_cfg_bool(cfgp, section, key, default):
    if cfgp.has_option(section, key):
        return cfgp.get(section, key) in ["True", "true"]
    return default


def read_cfg_precision(cfgp, section, key, default, prefer_bf16=True):
    """'float16'/'float32' -> jnp dtype. On TPU, fp16 requests become bf16
    (same memory, no loss-scaling pain); pass prefer_bf16=False for strict
    torch-parity numerics."""
    if cfgp.has_option(section, key):
        s = cfgp.get(section, key)
        if s == "float32":
            return jnp.float32
        if s == "float16":
            return jnp.bfloat16 if prefer_bf16 else jnp.float16
        if s == "bfloat16":
            return jnp.bfloat16
    return default


@dataclasses.dataclass
class RefineCfg:
    """configs/config_refine.ini, all keys."""

    kitti_path: str = "data/db/kitti/"
    css_path: str = "data/nets/css.pt"
    # CSS channel width (extension): 64 = the reference ResNet18 arch;
    # smaller widths select the cheap CSSNet variant (bundled demo nets).
    css_width: int = 64
    deepsdf_path: str = "data/nets/deepsdf.pt"
    label_type: str = "maskrcnn"  # gt | rcnn | maskrcnn
    maskrcnn_labels_path: str = ""
    diff_annos: str = "easy"
    grid_density: int = 40
    rendering_area: int = 32
    iters: int = 60
    # 0 = exact full-grid band selection (reference semantics). >0 enables
    # the coarse-to-fine selection pass with that many coarse cells
    # (grid.surface_from_decoder; ~1.5x faster refinement, identical band
    # for trained decoders). TPU extension — no reference equivalent.
    # COMPOSES with the warm_band default when the warm pool fits
    # coarse_cells * 8 (the periodic candidate refresh then runs the c2f
    # cell pass, ~4x less refresh decode; engine.refine); a smaller
    # coarse pool disables warm and runs pure c2f.
    coarse_cells: int = 0
    pose_estimator: str = "kabsch"
    precision: str = "float16"
    # Hybrid precision for the refinement surface decode (TPU extension):
    # run the non-differentiable band-SELECTION decode in bf16 (halved
    # stage-1 activation traffic) while the K selected points are
    # re-decoded exactly at `precision`. Only meaningful when precision is
    # float32 — under the default float16->bf16 map the whole decoder is
    # already bf16. See deepsdf.select_sdf_fn / grid.surface_from_decoder.
    select_bf16: bool = False
    # Fused Pallas band-selection decode (TPU extension, ops.mlp_pallas):
    # the stage-1 selection MLP runs as one VMEM-resident kernel (weights
    # + point blocks on-chip across all layers — no inter-layer HBM
    # round-trips). Same rank-only contract as select_bf16; selected
    # points are always re-decoded exactly in stage 2. Requires a TPU
    # backend and a supported architecture; silently falls back otherwise.
    # Default ON since round 3: measured 1.10x on the exact refinement
    # path at reference scale on v5e (BENCH_NOTES.md "Fused selection
    # kernel"), stage-1 moves onto the MXU roofline.
    select_pallas: bool = True
    # Fused stage-2 decode + analytic normals (TPU extension,
    # ops.mlp2_pallas): the differentiable re-decode of the selected band
    # runs forward + normals reverse sweep in one VMEM-resident launch
    # (custom VJP for the loss backward). Numerics class = XLA's default
    # TPU precision for the same chain (bf16-operand matmuls, fp32
    # accumulation/activations) under either [optimization] precision.
    # Requires a TPU backend and a supported architecture; falls back
    # silently to the flax vjp path. Default OFF: measured 0.96x at
    # reference scale on v5e — the kernel's backward recomputes the
    # forward (60 vs 45 GFLOP) and loses to XLA's stored-activation
    # chains (BENCH_NOTES.md "Fused stage-2"). Kept for VMEM-starved
    # regimes where XLA's 29 MB activation stash is the constraint.
    stage2_pallas: bool = False
    # Warm-started band selection (TPU extension, engine.refine): full-grid
    # candidate refresh every `warm_refresh` iterations, band top-k on the
    # `warm_band`-point candidate set in between. 0 = off (exact full-grid
    # selection each iteration, reference semantics).
    # DEFAULT ON since round 4: the 60-frame autolabel-quality benchmark
    # (QUALITY_r04.json, scripts/run_quality_benchmark.py) measured
    # IDENTICAL KITTI + nuScenes mAP for warm refresh=10 vs the exact
    # path at the full driver, and the warm path is 2.04x refinement
    # rays/s / 1.5x crops-per-hour (BENCH_NOTES). The runtime clamps the
    # pool to the grid size (warm_band effective = min(warm_band,
    # grid_density^3)); set 0 to restore exact band semantics per
    # iteration (bit-level reference behavior, same measured labels).
    warm_band: int = 8192
    warm_refresh: int = 10
    # Composed refresh: the warm candidate refresh runs through the
    # coarse-to-fine CELL pass with this many cells instead of the full
    # grid. The runtime clamps to the cell count and falls back to a
    # full-grid refresh when the warm pool wouldn't fit cells*8 or the
    # density is odd. DEFAULT 0 (full-grid refresh) since round 5: the
    # DISCRIMINATIVE quality suite v2 measured the original
    # (representative-corner) cell pass at -3.0 KITTI 3D AP (easy @0.7,
    # distant-object degradation, QUALITY_r05.json) where plain
    # warm_band is quality-IDENTICAL to the exact path on every metric,
    # tier, and stress axis; the round-4 default flip to 2048 was gated
    # by the saturated v1 suite, v2 caught it. The corner-lattice cell
    # score (ops.grid._coarse_cell_candidates) then restored
    # distant-object accuracy, but the fixed pass measures only +3.8%
    # rays/s at bench scale / neutral at driver scale and one
    # deterministic borderline object still separates its mAP from
    # exact — so it stays opt-in (BENCH_NOTES "Corner-lattice cell
    # scoring").
    warm_refresh_cells: int = 0
    # Crop-shape bucketing for the sequential driver path (TPU extension):
    # (h, w) rounds up to multiples of this and the crop letterboxes into
    # the bucket with a pixel validity mask — exactly equivalent rendering
    # (the batched path letterboxes the same way), but ~16 compiled bucket
    # programs serve every crop shape instead of one XLA compile per
    # distinct (h, w). 1 = exact per-shape compilation.
    render_bucket: int = 8
    # --- [stress] benchmark stressors (round 5, TPU extension) ---
    # Deterministic perturbation of the RANSAC init before refinement
    # (drawn from the runtime's seeded np_rng), used by
    # scripts/run_quality_benchmark.py to make the warm-band STALENESS
    # axis adversarial: a large init error forces long pose/latent
    # trajectories, so a stale candidate pool (warm refresh 10 vs 20 vs
    # exact) can actually separate. 0 everywhere = off (reference
    # semantics; no reference equivalent).
    stress_init_yaw_deg: float = 0.0
    stress_init_trans_m: float = 0.0
    stress_init_scale: float = 0.0
    stress_init_latent: float = 0.0
    viz_type: str = "none"
    # [visualization] live: publish each trajectory image to stable
    # <viz_dir>/live/latest_*.png paths as it is written — the headless
    # analogue of the reference's live cv2/Open3D windows
    # (visualizer.py:9-120); point an auto-reloading viewer at them.
    viz_live: bool = False
    weight_2d: float = 0.3
    weight_3d: float = 0.5
    labels_out: str = "test_labels"
    # Evaluator GT filtering: 'kitti' = occlusion/truncation/height
    # difficulty tiers (clean_kitti_data, detection_3d.py:871-985);
    # 'distance' = depth-binned tiers (difficulty_by_distance,
    # detection_3d.py:760-868 — present but unwired in the reference).
    eval_filter: str = "kitti"

    @classmethod
    def from_ini(cls, cfgp: configparser.ConfigParser) -> "RefineCfg":
        return cls(
            kitti_path=read_cfg_string(cfgp, "input", "kitti_path", cls.kitti_path),
            css_path=read_cfg_string(cfgp, "input", "css_path", cls.css_path),
            css_width=read_cfg_int(cfgp, "input", "css_width", cls.css_width),
            deepsdf_path=read_cfg_string(cfgp, "input", "deepsdf_path", cls.deepsdf_path),
            label_type=read_cfg_string(cfgp, "input", "label_type", cls.label_type),
            maskrcnn_labels_path=read_cfg_string(
                cfgp, "input", "maskrcnn_labels_path", cls.maskrcnn_labels_path
            ),
            diff_annos=read_cfg_string(cfgp, "input", "diff_annos", cls.diff_annos),
            grid_density=read_cfg_int(cfgp, "input", "grid_density", cls.grid_density),
            rendering_area=read_cfg_int(cfgp, "input", "rendering_area", cls.rendering_area),
            iters=read_cfg_int(cfgp, "optimization", "iters", cls.iters),
            coarse_cells=read_cfg_int(
                cfgp, "optimization", "coarse_cells", cls.coarse_cells
            ),
            pose_estimator=read_cfg_string(
                cfgp, "optimization", "pose_estimator", cls.pose_estimator
            ),
            precision=read_cfg_string(cfgp, "optimization", "precision", cls.precision),
            select_bf16=read_cfg_bool(
                cfgp, "optimization", "select_bf16", cls.select_bf16
            ),
            select_pallas=read_cfg_bool(
                cfgp, "optimization", "select_pallas", cls.select_pallas
            ),
            stage2_pallas=read_cfg_bool(
                cfgp, "optimization", "stage2_pallas", cls.stage2_pallas
            ),
            warm_band=read_cfg_int(
                cfgp, "optimization", "warm_band", cls.warm_band
            ),
            warm_refresh=read_cfg_int(
                cfgp, "optimization", "warm_refresh", cls.warm_refresh
            ),
            warm_refresh_cells=read_cfg_int(
                cfgp, "optimization", "warm_refresh_cells",
                cls.warm_refresh_cells
            ),
            render_bucket=read_cfg_int(
                cfgp, "optimization", "render_bucket", cls.render_bucket
            ),
            stress_init_yaw_deg=read_cfg_float(
                cfgp, "stress", "init_yaw_deg", cls.stress_init_yaw_deg
            ),
            stress_init_trans_m=read_cfg_float(
                cfgp, "stress", "init_trans_m", cls.stress_init_trans_m
            ),
            stress_init_scale=read_cfg_float(
                cfgp, "stress", "init_scale_frac", cls.stress_init_scale
            ),
            stress_init_latent=read_cfg_float(
                cfgp, "stress", "init_latent_sigma", cls.stress_init_latent
            ),
            viz_type=read_cfg_string(cfgp, "visualization", "viz_type", cls.viz_type),
            viz_live=read_cfg_bool(cfgp, "visualization", "live",
                                   cls.viz_live),
            weight_2d=read_cfg_float(cfgp, "losses", "2d_weight", cls.weight_2d),
            weight_3d=read_cfg_float(cfgp, "losses", "3d_weight", cls.weight_3d),
            labels_out=read_cfg_string(cfgp, "output", "labels", cls.labels_out),
            eval_filter=read_cfg_string(
                cfgp, "evaluation", "filter", cls.eval_filter
            ),
        )


@dataclasses.dataclass
class TrainCfg:
    """configs/config_train.ini, all keys."""

    data_path: str = "data/db/crops/"
    css_path: str = "data/nets/css.pt"
    # Augmentation/shuffle seed (extension): deterministic, resume-exact
    # data streams. -1 = unseeded (the reference's effective behavior).
    seed: int = 1
    batch_size: int = 13
    # Mixed-precision conv compute (TPU extension): 'bfloat16' (or
    # 'float16', mapped to bf16 like the refine knob) runs the
    # backbone/decoder convs in bf16 (params/BN/losses fp32, torch-AMP
    # analogue); 'float32' (default) matches the reference's fp32 CUDA
    # training exactly. Any other value raises at pipeline start.
    precision: str = "float32"
    # Fused Pallas cross-entropy for the loss towers (TPU extension,
    # ops.ce_pallas): one streaming pass over the (B,256,H,W) logits, no
    # materialized log-probs. Value/gradient-identical to the jnp path
    # within fp32 reduction order. Requires a TPU backend and an
    # unsharded (or 1-device) train step; ignored otherwise.
    fused_ce: bool = False
    # CE on raw head logits (TPU extension): an EXACT rewrite of the
    # reference's double-log-softmax formulation (log_softmax is
    # idempotent, so train_css.py:70-74 computes each 256-channel tower
    # twice for the same loss/gradients — verified to 1e-10 in
    # test_direct_ce_mode); the dead model-side towers are eliminated
    # from the compiled train step. DEFAULT ON since round 4: measured
    # 1.13x at the reference batch 13 (36.14 -> 31.97 ms/step) and
    # 1.11x at batch 52 on v5e (scripts/measure_direct_ce.py,
    # BENCH_NOTES "Direct-CE"). Set False for the bit-level parity
    # formulation (same objective either way).
    direct_ce: bool = True
    # Fast input pipeline (TPU extension, data.crops fast backend):
    # cv2/numpy decode + augmentation with a decoded-uint8 preload cache
    # and GIL-releasing thread prefetch. Identical augmentation
    # PARAMETER stream to the PIL path (shared rng draws), but not
    # bit-equal pixels (resampling/rounding differ at the LSB level) —
    # so it stays opt-in; False keeps the reference-parity PIL chain
    # (torchvision's backend, reference crops.py:44-71). Measured in
    # BENCH_NOTES round-5 "CSS training end-to-end".
    fast_input: bool = False
    epochs: int = 5000000
    lr: float = 0.001
    queue_size: int = 10
    cpu_threads: int = 0
    analyse_epoch: int = 1
    plot: bool = True
    log_dir: str = "log/demo/"
    # Print training losses every N batches (TPU extension). 1 = the
    # reference's per-batch print (train_css.py:92-97) — but each print
    # forces a host sync, which on a remote-dispatch link costs more than
    # the step itself. N>1 keeps N steps in flight between syncs.
    log_every: int = 1

    @classmethod
    def from_ini(cls, cfgp: configparser.ConfigParser) -> "TrainCfg":
        return cls(
            data_path=read_cfg_string(cfgp, "input", "data_path", cls.data_path),
            css_path=read_cfg_string(cfgp, "input", "css_path", cls.css_path),
            seed=read_cfg_int(cfgp, "train", "seed", cls.seed),
            batch_size=read_cfg_int(cfgp, "train", "batch_size", cls.batch_size),
            precision=read_cfg_string(
                cfgp, "train", "precision", cls.precision
            ),
            fused_ce=read_cfg_bool(
                cfgp, "train", "fused_ce", cls.fused_ce
            ),
            direct_ce=read_cfg_bool(
                cfgp, "train", "direct_ce", cls.direct_ce
            ),
            fast_input=read_cfg_bool(
                cfgp, "train", "fast_input", cls.fast_input
            ),
            epochs=read_cfg_int(cfgp, "train", "epochs", cls.epochs),
            lr=read_cfg_float(cfgp, "train", "lr", cls.lr),
            queue_size=read_cfg_int(cfgp, "optimization", "queue_size", cls.queue_size),
            cpu_threads=read_cfg_int(cfgp, "optimization", "cpu_threads", cls.cpu_threads),
            analyse_epoch=read_cfg_int(cfgp, "log", "analyse_epoch", cls.analyse_epoch),
            log_every=read_cfg_int(cfgp, "log", "log_every", cls.log_every),
            plot=read_cfg_bool(cfgp, "log", "plot", cls.plot),
            log_dir=read_cfg_string(cfgp, "log", "dir", cls.log_dir),
        )


def load_ini(path: str) -> configparser.ConfigParser:
    cfgp = configparser.ConfigParser()
    read = cfgp.read(path)
    if not read:
        raise FileNotFoundError(f"could not read config file {path!r}")
    return cfgp
