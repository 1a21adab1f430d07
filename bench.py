"""Benchmark: refinement-loop rays/s per chip, forward+backward.

Workload = the production hot loop at reference scale (SURVEY.md §6):
DeepSDF decode of a 40^3 grid through an 8x512 MLP, isosurface projection,
32x32 surfel render, 2D NOCS + 3D NN losses, gradients w.r.t.
{yaw, trans, scale, latent} and optimizer update — i.e. ONE full
refinement iteration, fwd+bwd, jit-compiled as a lax.scan.

Metric: rays/s = rendered pixels per second of full fwd+bwd iterations
(each iteration marches H*W = 1024 camera rays against the surface set).

vs_baseline: ratio against the PyTorch reference implementation executing
the same-scale iteration on this host (CPU torch — the only runnable
reference backend here; the reference's GPU path needs CUDA). Reported for
context; measured fresh on every run.

Prints ONE JSON line.
"""

import json
import sys
import time
import warnings

import numpy as np

warnings.filterwarnings("ignore")

REPO = "/root/repo"
if REPO not in sys.path:
    sys.path.insert(0, REPO)

# Persistent compilation cache: the remote TPU compile of the full
# refinement program is minutes cold, seconds cached.
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

GRID_DENSITY = 40
CAPACITY = 4096
CROP = 32
FRUSTUM = 4096
DIMS, LAYERS, LATENT = 512, 8, 3
# One dispatch through the axon tunnel costs ~30-40 ms RTT; the scan is
# rolled (compile time is iteration-count independent), so a longer scan
# amortizes the RTT out of the per-iteration number. A device profile at
# 30 iters showed 2.52 ms/iter of kernels vs 3.58 ms/iter apparent —
# 480 iters bounds the dispatch inflation at <2%.
SCAN_ITERS = 480
# Crops/hour protocol (BASELINE.md "crops autolabeled per hour"): one
# 60-iteration refinement per dispatch at the reference's crop scale
# (config_refine.ini iters=60; capacity 8192 band).
CROP_ITERS = 60
CROP_CAPACITY = 8192
# CSS training protocol (BASELINE config #4): reference batch/resolution
# (config_train.ini batch_size=13, 128x128 crops), canonical CSSNet,
# 20-step pipelined bursts between host syncs.
CSS_BATCH, CSS_RES, CSS_BURST = 13, 128, 20

import os  # noqa: E402

# The DEFAULT benched program mirrors the shipping default: fused Pallas
# stage-1 selection on TPU (config.RefineCfg.select_pallas=True since
# round 3; measured 1.10x over the XLA selection path, BENCH_NOTES.md)
# PLUS warm-started band selection, pool == capacity, refresh 10
# (config.RefineCfg.warm_band=8192 since round 4 — quality-gated by
# QUALITY_r04.json: mAP identical to the exact path at the full driver).
# Env overrides for ad-hoc measurement runs:
#   BENCH_EXACT=1          force exact per-iteration band selection (the
#                          pre-round-4 headline protocol)
#   BENCH_SELECT_PALLAS=0  force the plain XLA selection path
#   BENCH_SELECT_BF16=1    bf16 selection decode variant
#   BENCH_WARM_BAND=N [BENCH_WARM_REFRESH=M]  custom warm pool/refresh
#   BENCH_SKIP_EXTRAS=1    headline only (skip variants/crops/css metrics)
SELECT_BF16 = bool(int(os.environ.get("BENCH_SELECT_BF16", "0")))
SELECT_PALLAS = bool(int(os.environ.get("BENCH_SELECT_PALLAS", "1")))
# default 0 = the shipping default (measured 0.96x non-win, BENCH_NOTES)
STAGE2_PALLAS = bool(int(os.environ.get("BENCH_STAGE2_PALLAS", "0")))
EXACT = bool(int(os.environ.get("BENCH_EXACT", "0")))
WARM_BAND = int(os.environ.get("BENCH_WARM_BAND", "0"))
WARM_REFRESH = int(os.environ.get("BENCH_WARM_REFRESH", "10"))
# shipping warm pool at the headline protocol (== CAPACITY; the INI's
# 8192 clamps to the surface capacity by the same pool==capacity rule)
SHIP_WARM = 0 if EXACT else (WARM_BAND or CAPACITY)
# composed refresh cells: DEFAULT 0 since round 5 — the discriminative
# quality suite measured the cell-pass refresh at -3.0 3D AP on distant
# objects (QUALITY_r05.json), so the shipping default is the plain
# full-grid warm refresh. BENCH_WARM_CELLS=1024 re-measures the composed
# variant (pool 4096 -> 1024 cells).
SHIP_CELLS = 0 if EXACT else int(os.environ.get("BENCH_WARM_CELLS", "0"))
SKIP_EXTRAS = bool(int(os.environ.get("BENCH_SKIP_EXTRAS", "0")))


def _timed(run, n_timing=3):
    """compile + warm + min-of-n wall time of run() (which must force a
    host transfer: on the axon tunnel block_until_ready returns at
    enqueue)."""
    run()  # compile
    run()  # warm
    times = []
    for _ in range(n_timing):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    return min(times)


def _deepsdf_setup():
    import jax

    from sdflabel_tpu.models import deepsdf

    cfg = deepsdf.DeepSDFConfig(
        latent_size=LATENT, dims=(DIMS,) * LAYERS,
        norm_layers=tuple(range(LAYERS)), latent_in=(LAYERS // 2,),
        weight_norm=True,
    )
    params = deepsdf.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, deepsdf.sdf_fn(cfg, params), params


def build_refine(select="default", warm_band=0, warm_refresh=10,
                 iters=SCAN_ITERS, capacity=CAPACITY, coarse_cells=None,
                 warm_refresh_cells=None):
    """Build a timed runner for one refinement program.

    select: 'default' (Pallas stage-1 on TPU — the shipping default),
    'xla' (plain two-stage XLA selection), or 'bf16'.
    """
    import jax
    import jax.numpy as jnp

    from sdflabel_tpu.engine import refine as refine_mod
    from sdflabel_tpu.models import deepsdf
    from sdflabel_tpu.ops import grid as grid_ops
    from sdflabel_tpu.renderer import rasterer as rast_mod

    cfg, decoder, params = _deepsdf_setup()
    sel = None
    stage2 = None
    if select == "bf16":
        sel = deepsdf.select_sdf_fn(cfg, params)
    elif select == "default" and jax.default_backend() == "tpu":
        from sdflabel_tpu.ops import mlp_pallas

        sel = mlp_pallas.pallas_select_fn(cfg, params)
        assert sel is not None, "bench arch must be kernel-supported"
    if STAGE2_PALLAS and jax.default_backend() == "tpu":
        from sdflabel_tpu.ops import mlp2_pallas

        stage2 = mlp2_pallas.pallas_stage2_fn(cfg, params)
    grid_pts = grid_ops.generate_point_grid(GRID_DENSITY)
    rcfg = refine_mod.RefineConfig(iters=iters,
                                   surface_capacity=capacity,
                                   warm_band=warm_band,
                                   warm_refresh=warm_refresh,
                                   coarse_cells=coarse_cells,
                                   warm_refresh_cells=warm_refresh_cells)
    K = jnp.asarray(rast_mod.calibration_matrix((CROP, CROP)))
    refine_fn = jax.jit(
        refine_mod.make_refine_fn(decoder, rcfg, grid_pts, K, (CROP, CROP),
                                  select_decoder=sel, stage2_fn=stage2)
    )

    rng = np.random.RandomState(0)
    params0 = refine_mod.init_refine_params(
        0.3, [0.0, 0.0, 4.0], 2.0, [1.0, 0.0, 0.0]
    )
    nocs = jnp.asarray(rng.rand(3, CROP, CROP), jnp.float32)
    frustum = jnp.asarray(rng.randn(FRUSTUM, 3) + [0, 0, 4.0], jnp.float32)
    fmask = jnp.ones((FRUSTUM,), bool)

    def run():
        final, hist = refine_fn(params0, nocs, frustum, fmask)
        # NOTE: on the axon-tunneled TPU, block_until_ready returns at
        # enqueue — force a host transfer to measure true device time.
        return float(final.yaw[0])

    return run


def bench_ours():
    sel = "bf16" if SELECT_BF16 else ("default" if SELECT_PALLAS
                                      else "xla")
    run = build_refine(select=sel, warm_band=SHIP_WARM,
                       warm_refresh=WARM_REFRESH,
                       warm_refresh_cells=SHIP_CELLS or None)
    # progress to stderr (stdout is reserved for the one JSON line); the
    # remote axon compile of the full scanned program is 300-500 s cold
    print("# compiling (cold remote compile can take ~5-8 min)...",
          file=sys.stderr, flush=True)
    dt = _timed(run)
    iters_per_sec = SCAN_ITERS / dt
    return iters_per_sec * CROP * CROP, iters_per_sec


def bench_variants(flops_iter=None, s1_flops=None):
    """rays/s of the selection-acceleration variants (BENCH_NOTES tables,
    captured as structured artifacts per VERDICT r2 weak #3), each with
    its OWN roofline: the warm variant amortizes the stage-1 decode
    (FLOPs and HBM bytes) over the refresh interval, the xla variant
    pays the non-fused stage-1 HBM traffic."""
    out = []
    for name, kw in (
        ("exact_selection", dict(select="default")),  # pre-r4 headline
        ("xla_select", dict(select="xla")),
    ):
        try:
            print(f"# variant {name}...", file=sys.stderr, flush=True)
            dt = _timed(build_refine(**kw))
            row = {"name": name,
                   "rays_per_s": round(SCAN_ITERS * CROP * CROP / dt, 1),
                   "iters_per_s": round(SCAN_ITERS / dt, 2)}
            if flops_iter:
                if name.startswith("warm_band") and s1_flops:
                    r = WARM_REFRESH
                    fv = flops_iter - s1_flops * (r - 1) / r
                    s1b, s2b = analytic_hbm_parts(pallas_stage1=True)
                    bv = (s1b + r * s2b) / r
                elif name == "xla_select":
                    fv = flops_iter
                    bv = analytic_hbm_bytes_per_iteration(False)
                elif name == "exact_selection":
                    fv = flops_iter
                    bv = analytic_hbm_bytes_per_iteration(True)
                else:
                    fv = bv = None
                if fv and bv:
                    bound_s = max(fv / (V5E_BF16_PEAK_TFLOPS * 1e12),
                                  bv / (V5E_HBM_GBPS * 1e9))
                    row["flops_per_iter"] = round(fv, 1)
                    row["pct_roofline"] = round(
                        100.0 * bound_s * row["iters_per_s"], 1)
            out.append(row)
        except Exception as e:  # pragma: no cover - defensive
            print(f"# variant {name} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
            out.append({"name": name, "error": str(e)[:200]})
    return out


def bench_crops_per_hour():
    """KITTI crops autolabeled per hour (BASELINE.md metric): a full
    60-iteration refinement per dispatch at reference crop scale, exact
    default path and the best variant (warm band)."""
    out = {}
    for name, kw in (
        # shipping default since round 5: warm pool == capacity, plain
        # full-grid refresh (the composed c2f refresh measured -3.0 3D AP
        # on distant objects, QUALITY_r05.json — no longer default)
        ("default_warm", dict(select="default",
                              warm_band=CROP_CAPACITY)),
        ("warm_c2f_refresh", dict(select="default",
                                  warm_band=CROP_CAPACITY,
                                  warm_refresh_cells=2048)),
        ("exact", dict(select="default")),
    ):
        try:
            print(f"# crops/hour {name}...", file=sys.stderr, flush=True)
            run = build_refine(iters=CROP_ITERS, capacity=CROP_CAPACITY,
                               **kw)
            run()  # compile
            run()  # warm
            n = 10
            t0 = time.perf_counter()
            for _ in range(n):
                run()
            s_per_crop = (time.perf_counter() - t0) / n
            out[name] = {"s_per_crop": round(s_per_crop, 4),
                         "crops_per_hour": round(3600.0 / s_per_crop, 1)}
        except Exception as e:  # pragma: no cover - defensive
            print(f"# crops/hour {name} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
            out[name] = {"error": str(e)[:200]}
    return out


def bench_driver_crop():
    """END-TO-END crops/hour: the full per-crop device program in ONE
    dispatch — CSS forward (reference width-64 net, 128x128 crop) ->
    surface decode (capacity 8192) -> on-device RANSAC init (kabsch,
    azimuth-constrained yaw extraction) -> 60-iteration refinement ->
    label extents (engine.labels.surface_extents). This is BASELINE.md's
    'KITTI crops autolabeled per hour' as a captured device artifact
    (VERDICT r3 next #5); bench_crops_per_hour's number covers the
    refinement dispatch alone. Host-side residue not measured here (image
    decode, PCA normals, pickle IO) is profiled separately by
    scripts/measure_driver_throughput.py (~0.9 s/frame, overlapped by
    prefetch). Reference flow: pipelines/refine_css.py:94-250.
    """
    import jax
    import jax.numpy as jnp

    from sdflabel_tpu.engine import labels as labels_mod
    from sdflabel_tpu.engine import refine as refine_mod
    from sdflabel_tpu.models import css as css_mod
    from sdflabel_tpu.ops import geometry, grid as grid_ops, ransac
    from sdflabel_tpu.renderer import rasterer as rast_mod

    cfg, decoder, dparams = _deepsdf_setup()
    sel = None
    if jax.default_backend() == "tpu":
        from sdflabel_tpu.ops import mlp_pallas

        sel = mlp_pallas.pallas_select_fn(cfg, dparams)

    css_model = css_mod.CSSNet(use_running_average=True,
                               latent_size=LATENT)
    css_vars = css_model.init(jax.random.PRNGKey(1),
                              jnp.zeros((1, 3, CSS_RES, CSS_RES)))
    grid_pts = grid_ops.generate_point_grid(GRID_DENSITY)
    rcfg = refine_mod.RefineConfig(iters=CROP_ITERS,
                                   surface_capacity=CROP_CAPACITY,
                                   warm_band=SHIP_WARM and CROP_CAPACITY,
                                   warm_refresh=WARM_REFRESH,
                                   warm_refresh_cells=(
                                       2048 if SHIP_WARM and SHIP_CELLS
                                       else None))
    K = jnp.asarray(rast_mod.calibration_matrix((CROP, CROP)))
    refine_fn = refine_mod.make_refine_fn(decoder, rcfg, grid_pts, K,
                                          (CROP, CROP),
                                          select_decoder=sel)
    rccfg = ransac.RansacConfig(hypothesis_chunk=16)
    mcap = 2048  # RefineRuntime.ransac_model_capacity default

    ys = (np.arange(CROP) * CSS_RES // CROP).clip(max=CSS_RES - 1)
    ys_j = jnp.asarray(ys)

    def program(variables, crop_rgb, scene_pts, scene_cls, scene_mask,
                frustum, fmask, key):
        out = css_model.apply(variables, crop_rgb)
        latent = out["latent"][0]
        nocs_pred = out["uvw_sm_masked"][0] / 255.0
        surf, _sdf = grid_ops.surface_from_decoder(
            decoder, latent, grid_pts, capacity=CROP_CAPACITY)
        pose = ransac.ransac_pose(
            surf.points[:mcap], surf.nocs[:mcap], surf.mask[:mcap],
            scene_pts, scene_cls, scene_mask, key, method="kabsch",
            scale_model=2.0, cfg=rccfg)
        # azimuth constraint + yaw extraction (refine_css.py:176-178)
        e_y = jnp.asarray([0.0, 1.0, 0.0])
        rot = pose.rot.at[:, 1].set(e_y).at[1, :].set(e_y)
        m4 = jnp.eye(4).at[:3, :3].set(
            rot @ jnp.diag(jnp.asarray([-1.0, 1.0, 1.0])))
        yaw = geometry.roty_in_bev_jnp(m4) + jnp.pi / 2
        params0 = refine_mod.RefineParams(
            yaw=yaw.reshape(1).astype(jnp.float32),
            trans=(pose.tra / pose.scale).astype(jnp.float32),
            scale=pose.scale.reshape(1).astype(jnp.float32),
            latent=latent,
        )
        nocs_target = nocs_pred[:, ys_j[:, None], ys_j[None, :]]
        final, _hist = refine_fn(params0, nocs_target, frustum, fmask)
        ext = labels_mod.surface_extents(decoder, grid_pts, final.latent,
                                         capacity=CROP_CAPACITY)
        return (final.yaw, final.trans, final.scale, ext.mn, ext.mx,
                ext.valid, pose.num_inliers)

    jitted = jax.jit(lambda c, *a: program(css_vars, c, *a))
    rng = np.random.RandomState(0)
    crop = jnp.asarray(rng.rand(1, 3, CSS_RES, CSS_RES), jnp.float32)
    scap = 2048  # RefineRuntime.ransac_scene_capacity default
    scene_pts = jnp.asarray(rng.randn(scap, 3) + [0, 0, 8.0], jnp.float32)
    scene_cls = jnp.asarray(rng.rand(scap, 3), jnp.float32)
    scene_mask = jnp.ones((scap,), bool)
    frustum = jnp.asarray(rng.randn(FRUSTUM, 3) + [0, 0, 8.0], jnp.float32)
    fmask = jnp.ones((FRUSTUM,), bool)
    key = jax.random.PRNGKey(0)

    def run():
        out = jitted(crop, scene_pts, scene_cls, scene_mask, frustum,
                     fmask, key)
        return float(out[0][0])

    print("# driver_crop (compiling)...", file=sys.stderr, flush=True)
    run()
    run()
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        run()
    s_per_crop = (time.perf_counter() - t0) / n

    # Pipelined dispatch (VERDICT r4 #7): keep one crop in flight —
    # dispatch crop N+1 BEFORE fetching crop N, hiding the result-fetch
    # RTT behind the next crop's device compute. depth=2 is exactly the
    # driver's double-buffer opportunity (prep N+1 while N refines).
    from collections import deque

    def run_pipelined(m, depth=2):
        q = deque()
        t1 = time.perf_counter()
        for _ in range(m):
            q.append(jitted(crop, scene_pts, scene_cls, scene_mask,
                            frustum, fmask, key))
            if len(q) >= depth:
                float(q.popleft()[0][0])
        while q:
            float(q.popleft()[0][0])
        return (time.perf_counter() - t1) / m

    run_pipelined(2)
    sp = run_pipelined(n)
    return {"s_per_crop": round(s_per_crop, 4),
            "crops_per_hour": round(3600.0 / s_per_crop, 1),
            "pipelined": {"s_per_crop": round(sp, 4),
                          "crops_per_hour": round(3600.0 / sp, 1),
                          "depth": 2}}


E2E_CASES = [(13, "float32", "threads"), (13, "float32", "procs"),
             (52, "float32", "procs"), (104, "float32", "procs"),
             (52, "bfloat16", "procs"),
             # fast input backend ([train] fast_input: cv2/numpy augs
             # from a decoded-uint8 preload cache, GIL-releasing thread
             # prefetch — data/crops.py fast path)
             (104, "float32", "fast"), (52, "bfloat16", "fast")]


def _ensure_bench_crops_db(n=2496, px=160):
    """Synthetic crops.json DB for the END-TO-END training bench (decode
    + augment + collate are what's being measured, so random content is
    the right fixture; layout = data.crops.Crops / reference crops.py
    schema). Cached across runs."""
    import json as json_mod

    from PIL import Image

    root = f"/tmp/sdflabel_bench_crops_{n}_{px}"
    marker = os.path.join(root, "crops.json")
    if os.path.exists(marker):
        return root
    os.makedirs(root, exist_ok=True)
    rng = np.random.RandomState(7)
    gt = {}
    eye4 = np.eye(4).reshape(-1).tolist()
    eye3 = np.eye(3).reshape(-1).tolist()
    for i in range(n):
        rgb = (rng.rand(px, px, 3) * 255).astype(np.uint8)
        uvw = (rng.rand(px, px, 3) * 255).astype(np.uint8)
        uvw[: px // 3] = 0  # background region -> nontrivial mask
        Image.fromarray(rgb).save(os.path.join(root, f"{i:05d}_rgb.png"))
        Image.fromarray(uvw).save(os.path.join(root, f"{i:05d}_uvw.png"))
        lat = rng.randn(3)
        gt[str(i)] = [{
            "latent": (lat / np.linalg.norm(lat)).tolist(),
            "extrinsics": eye4, "intrinsics": eye3,
        }]
    with open(marker, "w") as f:
        json_mod.dump(gt, f)
    return root


def bench_css_train_e2e():
    """END-TO-END CSS training (VERDICT r4 #5): host input pipeline
    (PNG decode + synchronized augs + collate, threaded prefetch — the
    reference's DataLoader-worker analogue, train_css.py:42-45)
    OVERLAPPED with the device step, at batch 13 / 52 / 104 and the bf16
    conv knob. Reports images/s end-to-end and the input-pipeline share
    vs the device-only step (bench_css_train's protocol)."""
    import jax
    import jax.numpy as jnp

    from sdflabel_tpu.data.crops import Crops, prefetch_iterator
    from sdflabel_tpu.engine import css_train
    from sdflabel_tpu.models import css as css_mod

    root = _ensure_bench_crops_db()
    ds = Crops(root, augment=True, seed=1)
    ds_fast = None  # built + preloaded lazily (first fast case)
    model = css_mod.CSSNet(use_running_average=False)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 3, CSS_RES, CSS_RES)))
    variables = jax.tree.map(jnp.asarray, variables)

    out = {}
    for batch, prec, mode in E2E_CASES:
        tag = (f"b{batch}" + ("_bf16" if prec == "bfloat16" else "")
               + ("_threads" if mode == "threads" else "")
               + ("_fast" if mode == "fast" else ""))
        if mode == "fast" and ds_fast is None:
            # uint8 staging: raw jittered pixels ship to the device and
            # are normalized there (engine.css_train) — 4x smaller rgb
            # upload on the step-critical path
            ds_fast = Crops(root, augment=True, seed=1, fast=True,
                            stage="uint8")
            t0 = time.perf_counter()
            ds_fast.preload(num_threads=8)
            print(f"# css e2e fast preload: "
                  f"{time.perf_counter() - t0:.1f}s for {len(ds_fast)}",
                  file=sys.stderr, flush=True)
        case_ds = ds_fast if mode == "fast" else ds
        m = (css_mod.CSSNet(use_running_average=False,
                            dtype=jnp.bfloat16)
             if prec == "bfloat16" else model)
        step = jax.jit(css_train.make_train_step(1e-3, model=m,
                                                 direct_ce=True))
        state = css_train.init_train_state(variables, 1e-3)
        keep = {"rgb", "uvw", "mask", "latent"}

        nw = 8
        def batches():
            epoch = 0
            while True:
                case_ds.set_epoch(epoch)
                yield from prefetch_iterator(
                    case_ds, batch, num_threads=nw,
                    num_procs=(nw if mode == "procs" else 0),
                    epoch=epoch, queue_size=10, seed=epoch,
                    drop_last=True)
                epoch += 1

        def stage(bnp):
            # uvw/mask ship as uint8 (cast to int32 on device by
            # css_losses) — int64 would 8x the per-step batch upload
            return {k: jnp.asarray(v.astype(np.uint8)
                                   if k in ("uvw", "mask") else v)
                    for k, v in bnp.items() if k in keep}

        it = batches()
        # warmup: compile + fill the prefetch queue
        for _ in range(3):
            state, metrics = step(state, stage(next(it)))
        float(metrics["loss"])
        steps = max(20, 416 // batch)
        t0 = time.perf_counter()
        for _ in range(steps):
            state, metrics = step(state, stage(next(it)))
        float(metrics["loss"])  # drain the device queue
        dt = (time.perf_counter() - t0) / steps

        # device-only step on a pre-staged batch (same protocol as
        # bench_css_train) for the input-pipeline share
        sb = {k: jnp.asarray(v) for k, v in next(it).items() if k in keep}

        def burst():
            s = state
            for _ in range(10):
                s, mm = step(s, sb)
            return float(mm["loss"])

        dev_dt = _timed(burst) / 10
        out[tag] = {
            "ms_per_step_e2e": round(dt * 1000, 2),
            "images_per_s_e2e": round(batch / dt, 1),
            "ms_per_step_device": round(dev_dt * 1000, 2),
            "input_share_pct": round(100.0 * max(dt - dev_dt, 0) / dt, 1),
        }
        print(f"# css e2e {tag}: {out[tag]}", file=sys.stderr, flush=True)
    # recommended config: the measured-best end-to-end images/s
    best = max(out, key=lambda k: out[k]["images_per_s_e2e"])
    out["recommended"] = best
    return out


def bench_css_train():
    """CSS training step at the reference config (BASELINE config #4):
    ms/step and images/s, pipelined-burst protocol (BENCH_NOTES 'CSS
    training')."""
    import jax
    import jax.numpy as jnp

    from sdflabel_tpu.engine import css_train
    from sdflabel_tpu.models import css as css_mod

    rng = np.random.RandomState(0)
    b, r = CSS_BATCH, CSS_RES
    batch = {
        "rgb": jnp.asarray(rng.rand(b, 3, r, r), jnp.float32),
        "uvw": jnp.asarray(rng.randint(0, 256, (b, 3, r, r)), jnp.int32),
        "mask": jnp.asarray(rng.randint(0, 2, (b, r, r)), jnp.int32),
        "latent": jnp.asarray(rng.randn(b, LATENT), jnp.float32),
    }
    model = css_mod.CSSNet(use_running_average=False)
    variables = model.init(jax.random.PRNGKey(0), batch["rgb"])
    fused = css_train.default_fused_ce()
    # direct_ce: the shipping default since round 4 (TrainCfg.direct_ce,
    # measured 1.13x at batch 13 — scripts/measure_direct_ce.py)
    step = jax.jit(css_train.make_train_step(1e-3, fused_ce=fused,
                                             direct_ce=True))
    state0 = css_train.init_train_state(
        jax.tree.map(jnp.asarray, variables), 1e-3)

    def burst():
        state = state0
        for _ in range(CSS_BURST):
            state, metrics = step(state, batch)
        return float(metrics["loss"])

    print("# css train step...", file=sys.stderr, flush=True)
    dt = _timed(burst) / CSS_BURST
    return {"ms_per_step": round(dt * 1000, 2),
            "images_per_s": round(b / dt, 1),
            "fused_ce": bool(fused), "direct_ce": True}


V5E_BF16_PEAK_TFLOPS = 197.0  # public v5e spec (bf16 MXU peak per chip)
V5E_HBM_GBPS = 819.0  # public v5e spec (HBM bandwidth per chip)


def flops_per_iteration():
    """Exact FLOPs of ONE refinement iteration from XLA's cost analysis.

    The program is lowered for CPU (identical HLO math; no TPU compile
    burned) with iters=1; XLA counts a lax.scan body ONCE regardless of
    trip count (measured: iters=1 vs iters=2 differ by <0.005%), so the
    reported total IS the per-iteration cost — dominated by the stage-1
    selection decode (2 * 1.84M MLP params * 64k grid points = 235 GFLOP
    of the ~281 GFLOP body; see BENCH_NOTES.md budget).
    """
    import jax
    import jax.numpy as jnp

    from sdflabel_tpu.engine import refine as refine_mod
    from sdflabel_tpu.models import deepsdf
    from sdflabel_tpu.ops import grid as grid_ops
    from sdflabel_tpu.renderer import rasterer as rast_mod

    cfg = deepsdf.DeepSDFConfig(
        latent_size=LATENT, dims=(DIMS,) * LAYERS,
        norm_layers=tuple(range(LAYERS)), latent_in=(LAYERS // 2,),
        weight_norm=True,
    )
    params = deepsdf.init_params(cfg, jax.random.PRNGKey(0))
    decoder = deepsdf.sdf_fn(cfg, params)
    grid_pts = grid_ops.generate_point_grid(GRID_DENSITY)
    rcfg = refine_mod.RefineConfig(iters=1, surface_capacity=CAPACITY)
    K = jnp.asarray(rast_mod.calibration_matrix((CROP, CROP)))
    fn = jax.jit(
        refine_mod.make_refine_fn(decoder, rcfg, grid_pts, K,
                                  (CROP, CROP)),
    )
    rng = np.random.RandomState(0)
    p0 = refine_mod.init_refine_params(0.3, [0.0, 0.0, 4.0], 2.0,
                                       [1.0, 0.0, 0.0])
    nocs = jnp.asarray(rng.rand(3, CROP, CROP), jnp.float32)
    frustum = jnp.asarray(rng.randn(FRUSTUM, 3) + [0, 0, 4.0],
                          jnp.float32)
    fmask = jnp.ones((FRUSTUM,), bool)
    ca = fn.lower(p0, nocs, frustum, fmask).compile().cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    return float(ca["flops"])


def stage1_flops():
    """Exact FLOPs of the stage-1 full-grid decode alone (cost analysis
    of the bare decoder over the 64k grid) — used to amortize the
    warm-band variant's per-iteration FLOPs (refresh iterations pay it,
    warm iterations skip it; BENCH_NOTES "Warm-started band selection")."""
    import jax
    import jax.numpy as jnp

    from sdflabel_tpu.models import deepsdf
    from sdflabel_tpu.ops import grid as grid_ops

    cfg = deepsdf.DeepSDFConfig(
        latent_size=LATENT, dims=(DIMS,) * LAYERS,
        norm_layers=tuple(range(LAYERS)), latent_in=(LAYERS // 2,),
        weight_norm=True,
    )
    params = deepsdf.init_params(cfg, jax.random.PRNGKey(0))
    decoder = deepsdf.sdf_fn(cfg, params)
    grid_pts = jnp.asarray(grid_ops.generate_point_grid(GRID_DENSITY))
    fn = jax.jit(lambda lat: decoder(lat, grid_pts))
    ca = fn.lower(jnp.zeros((LATENT,), jnp.float32)).compile().cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    return float(ca["flops"])


def analytic_hbm_bytes_per_iteration(pallas_stage1: bool = False):
    """HBM traffic model of one refinement iteration (fp32 path).

    XLA's cost-analysis 'bytes accessed' counts every HLO's operands with
    no fusion accounting (it reports 6.6 GB here, which would exceed the
    measured iteration time — useless as a bound). This model counts only
    what must physically cross HBM on TPU: matmul-chain activations are
    too large for VMEM residency across layers (64k x 512 = 64-131 MB),
    so each inter-layer boundary costs one write + one read; weights are
    read per pass; everything else (render, losses, top-k) is small.
    Under default matmul precision XLA stores the fp32 chain's
    intermediates as bf16 (visible as bf16 tensors in the optimized HLO;
    also why an explicit bf16 cast measured as a no-op), so boundary
    traffic is counted at 2 bytes; inputs/weights at their true fp32.

    pallas_stage1 (the TPU shipping default since round 3): stage 1 runs
    as the VMEM-resident fused kernel (ops.mlp_pallas) — activations
    never leave VMEM, weights stream once (bf16), HBM sees only the
    padded points in and the sdf out. Stage 1 then sits on the MXU
    roofline and the iteration bound is the MXU term.
    """
    B = 4  # fp32 bytes (inputs, weights)
    BA = 2  # bf16 activation storage between matmul layers
    n1 = GRID_DENSITY ** 3
    n2 = CAPACITY
    H = DIMS
    nb = LAYERS - 1  # inter-layer activation boundaries
    w_bytes = LAYERS * H * H * B  # decoder weights, read once per pass
    if pallas_stage1:
        # padded (N,4) fp32 points in + (N,1) f32 out + bf16 weight stack
        s1 = n1 * 4 * B + n1 * B + (LAYERS - 2) * H * H * 2
    else:
        # input + inter-layer boundaries + weights
        s1 = n1 * (H + LATENT + 3) * B + 2 * n1 * H * BA * nb + w_bytes
    # stage 2 (fwd + normals vjp + loss-grad bwd ~ 3 passes over a
    # CAPACITY-row chain; backward re-reads stored activations)
    s2 = 3 * (2 * n2 * H * BA * nb + w_bytes)
    return float(s1 + s2)


def analytic_hbm_parts(pallas_stage1: bool = True):
    """(stage-1 bytes, rest-of-iteration bytes) of the HBM model above —
    the warm-band variant amortizes stage 1 over its refresh interval."""
    total = analytic_hbm_bytes_per_iteration(pallas_stage1)
    # reconstruct s2 with the same constants
    B, BA = 4, 2
    n2, H, nb = CAPACITY, DIMS, LAYERS - 1
    w_bytes = LAYERS * H * H * B
    s2 = 3.0 * (2 * n2 * H * BA * nb + w_bytes)
    return total - s2, s2


def flops_per_iteration_subprocess(timeout=420):
    """Run flops_per_iteration in a CPU-forced child process (this process
    holds the axon TPU backend and cannot switch platforms)."""
    import subprocess

    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; sys.path.insert(0, %r);"
        "import bench;"
        "print('FLOPS', bench.flops_per_iteration(), bench.stage1_flops())"
        % REPO
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=timeout)
    for line in out.stdout.splitlines():
        if line.startswith("FLOPS "):
            parts = line.split()
            return float(parts[1]), float(parts[2])
    raise RuntimeError(out.stderr[-500:])


def bench_reference(max_seconds=120.0):
    """One reference refinement iteration (torch CPU), same scale.

    Uses the reference's own modules (renderer + decoder + losses) driven
    exactly as optimizer.py:84-157 does.
    """
    try:
        import types

        sys.path.insert(0, "/root/reference/sdfrenderer")
        sys.path.insert(0, "/root/reference")
        for name in ("open3d", "open3d.geometry", "open3d.utility",
                     "open3d.visualization"):
            if name not in sys.modules:
                sys.modules[name] = types.ModuleType(name)
        o3d = sys.modules["open3d"]
        for sub in ("geometry", "utility", "visualization"):
            setattr(o3d, sub, sys.modules[f"open3d.{sub}"])
        if "pyquaternion" not in sys.modules:
            pq = types.ModuleType("pyquaternion")
            pq.Quaternion = object
            sys.modules["pyquaternion"] = pq

        import torch

        torch.set_num_threads(max(1, (os.cpu_count() or 4)))
        from deepsdf.networks.deep_sdf_decoder_scale import Decoder
        from grid import Grid3D
        from pipelines.optimizer import Optimizer

        decoder = Decoder(
            LATENT, [DIMS] * LAYERS, dropout=None,
            norm_layers=tuple(range(LAYERS)), latent_in=(LAYERS // 2,),
            weight_norm=True,
        ).eval()
        grid = Grid3D(GRID_DENSITY, "cpu", torch.float32)

        params = {
            "yaw": np.array([0.3]),
            "trans": np.array([0.0, 0.0, 4.0]),
            "scale": np.array([2.0]),
            "latent": np.array([1.0, 0.0, 0.0]),
        }
        opt = Optimizer(params, "cpu", {"2d": 0.3, "3d": 0.5})
        rng = np.random.RandomState(0)
        nocs_pred = torch.from_numpy(
            rng.rand(3, CROP, CROP).astype(np.float32))
        frustum_np = (rng.randn(FRUSTUM, 3) + [0, 0, 4.0]).astype(np.float32)
        K = torch.eye(3)
        K[0, 0] = K[1, 1] = 140.0
        K[0, 2] = K[1, 2] = CROP / 2

        # time N iterations (the loop prints per iteration; silence stdout)
        import contextlib, io, os as _os

        n_iter = 3
        t0 = time.perf_counter()
        with contextlib.redirect_stdout(io.StringIO()):
            opt.optimize(n_iter, nocs_pred, frustum_np, decoder, grid, K,
                         [CROP, CROP], viz_type=None)
        dt = time.perf_counter() - t0
        iters_per_sec = n_iter / dt
        return iters_per_sec * CROP * CROP
    except Exception as e:
        print(f"# reference baseline failed: {type(e).__name__}: {e}",
              file=sys.stderr)
        return None


def probe_device(timeout_s: int = 600):
    """Fail fast (one diagnostic JSON line, rc=3) when the TPU backend is
    unreachable, instead of hanging forever in backend init.

    The axon backend retries init internally for tens of minutes when the
    tunnel/device is down (observed: 29 min before UNAVAILABLE), and a
    fresh boot's first-op warmup can itself take minutes — so the watchdog
    is generous but bounded. The timer thread fires os._exit because the
    main thread is stuck inside backend init and cannot be interrupted.
    """
    import threading

    done = threading.Event()

    def bail():
        if done.is_set():
            return
        print(json.dumps({
            "metric": "refine_rays_per_s_fwd_bwd",
            "value": 0.0,
            "unit": "rays/s/chip (32x32 render, full refine iter fwd+bwd)",
            "vs_baseline": 0.0,
            "error": f"device backend unavailable: no trivial op completed "
                     f"within {timeout_s}s",
        }), flush=True)
        os._exit(3)

    timer = threading.Timer(timeout_s, bail)
    timer.daemon = True
    timer.start()
    np.asarray(jax.numpy.ones((8, 8)) @ jax.numpy.ones((8, 8)))
    done.set()
    timer.cancel()


def main():
    probe_device()
    rays_per_sec, iters_per_sec = bench_ours()

    # Speed-of-light accounting (the actionable number): achieved FLOP/s
    # of the iteration vs the chip's bf16 MXU peak. The torch-CPU ratio is
    # kept as a secondary context field only. Only well-defined for the
    # exact-selection programs (the Pallas stage-1 computes the identical
    # matmul chain, so the XLA-counted FLOPs apply): under BENCH_WARM_BAND
    # the scan body holds a lax.cond whose branches the cost analysis BOTH
    # counts, and the useful FLOPs differ between refresh and warm
    # iterations.
    variant = None
    if WARM_BAND:
        variant = f"warm_band={WARM_BAND},refresh={WARM_REFRESH}"
    if EXACT:
        variant = (variant + "," if variant else "") + "exact_selection"
    if SELECT_BF16:
        variant = (variant + "," if variant else "") + "select_bf16"
    if not SELECT_PALLAS:
        variant = (variant + "," if variant else "") + "xla_select"
    try:
        print("# computing XLA cost analysis (CPU lowering)...",
              file=sys.stderr, flush=True)
        flops_iter, s1_flops = flops_per_iteration_subprocess()
    except Exception as e:  # never fail the bench on accounting
        print(f"# cost analysis failed: {type(e).__name__}: {e}",
              file=sys.stderr)
        flops_iter = s1_flops = None
    import jax as _jax

    pallas_default = SELECT_PALLAS and _jax.default_backend() == "tpu"
    # Per-iteration useful work of the HEADLINE program. The shipping
    # default is warm-band selection (QUALITY_r04-gated): refresh
    # iterations pay the full stage-1 decode, the other (refresh-1)/refresh
    # skip it — amortized FLOPs/bytes, same accounting bench_variants uses.
    bytes_iter = None
    flops_full = flops_iter  # UN-amortized: what bench_variants' exact/xla
    # rows must account with (the headline below amortizes its own copy)
    if flops_iter:
        if SHIP_WARM and s1_flops:
            r = WARM_REFRESH
            s1_refresh = s1_flops
            s1b, s2b = analytic_hbm_parts(pallas_stage1=pallas_default)
            s1b_refresh = s1b
            if SHIP_CELLS:
                # composed refresh decodes (d/2)^3 corners + cells*8
                # points instead of the full d^3 grid
                # corner-LATTICE coarse pass ((d/2+1)^3 shared corners,
                # ops.grid._cell_corner_lattice_np) + selected cells'
                # children
                ratio = ((GRID_DENSITY // 2 + 1) ** 3 + SHIP_CELLS * 8) \
                    / GRID_DENSITY ** 3
                s1_refresh *= ratio
                s1b_refresh *= ratio
            # EVERY warm iteration also decodes the warm_band candidate
            # pool through stage 1 (surface_from_candidates) to re-rank
            # the band — count that per-iteration, not just the periodic
            # refresh decode (round-4 advisor finding).
            pool_ratio = min(WARM_BAND, GRID_DENSITY ** 3) \
                / GRID_DENSITY ** 3
            pool_flops = s1_flops * pool_ratio
            pool_bytes = s1b * pool_ratio
            flops_iter = (flops_iter - s1_flops + pool_flops
                          + s1_refresh / r)
            bytes_iter = pool_bytes + (s1b_refresh + r * s2b) / r
        else:
            bytes_iter = analytic_hbm_bytes_per_iteration(pallas_default)
    achieved_tflops = (
        flops_iter * iters_per_sec / 1e12 if flops_iter else None
    )
    pct_peak = (
        100.0 * achieved_tflops / V5E_BF16_PEAK_TFLOPS
        if achieved_tflops else None
    )
    # Roofline: the iteration is limited by whichever is larger — MXU time
    # (flops / bf16 peak) or HBM time (bytes / bandwidth). At this
    # workload's fp32 activation sizes the stage-1 decode is
    # bandwidth-bound (2.3 GB/iter model vs 1.4 ms of MXU work), so
    # pct_roofline is the actionable fraction-of-speed-of-light number;
    # pct_peak_bf16 alone understates it. bytes from the analytic HBM
    # model above (XLA's bytes-accessed has no fusion accounting).
    pct_roofline = None
    if flops_iter and bytes_iter:
        bound_s = max(flops_iter / (V5E_BF16_PEAK_TFLOPS * 1e12),
                      bytes_iter / (V5E_HBM_GBPS * 1e9))
        pct_roofline = 100.0 * bound_s * iters_per_sec

    extras = {}
    if not SKIP_EXTRAS and variant is None:
        extras["variants"] = bench_variants(flops_full, s1_flops)
        extras["crops_per_hour"] = bench_crops_per_hour()
        try:
            extras["driver_crop"] = bench_driver_crop()
        except Exception as e:  # pragma: no cover - defensive
            print(f"# driver_crop bench failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
            extras["driver_crop"] = {"error": str(e)[:200]}
        try:
            extras["css_train"] = bench_css_train()
        except Exception as e:  # pragma: no cover - defensive
            print(f"# css train bench failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
            extras["css_train"] = {"error": str(e)[:200]}
        try:
            extras["css_train_e2e"] = bench_css_train_e2e()
        except Exception as e:  # pragma: no cover - defensive
            print(f"# css e2e bench failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
            extras["css_train_e2e"] = {"error": str(e)[:200]}

    ref_rays = bench_reference()
    vs = rays_per_sec / ref_rays if ref_rays else 0.0
    print(json.dumps({
        "metric": "refine_rays_per_s_fwd_bwd",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s/chip (32x32 render, full refine iter fwd+bwd)",
        "vs_baseline": round(vs, 2),
        "iters_per_s": round(iters_per_sec, 2),
        "flops_per_iter": flops_iter,
        "achieved_tflops": (round(achieved_tflops, 2)
                            if achieved_tflops else None),
        "pct_peak_bf16": round(pct_peak, 1) if pct_peak else None,
        "bytes_per_iter": bytes_iter,
        "pct_roofline": round(pct_roofline, 1) if pct_roofline else None,
        "peak_tflops_ref": V5E_BF16_PEAK_TFLOPS,
        "hbm_gbps_ref": V5E_HBM_GBPS,
        "vs_torch_cpu": round(vs, 2),
        "select": ("pallas" if pallas_default else
                   ("bf16" if SELECT_BF16 else "xla")),
        "band_selection": (
            f"warm_band={SHIP_WARM},refresh={WARM_REFRESH}"
            + (f",refresh_cells={SHIP_CELLS}" if SHIP_CELLS else "")
            if SHIP_WARM else "exact"),
        **({"variant": variant} if variant else {}),
        **extras,
    }))


if __name__ == "__main__":
    main()
