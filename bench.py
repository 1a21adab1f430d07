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
# 120 iters bounds the dispatch inflation at <12%.
SCAN_ITERS = 120
# BENCH_SELECT_BF16=1: hybrid precision variant — bf16 band-selection
# decode (deepsdf.select_sdf_fn) + exact fp32 stage-2 re-decode. Same
# rays/s metric; surface values stay fp32-exact by construction.
SELECT_BF16 = bool(int(__import__("os").environ.get("BENCH_SELECT_BF16",
                                                    "0")))
# BENCH_SELECT_PALLAS=1: fused Pallas stage-1 selection decode
# (ops.mlp_pallas — VMEM-resident MLP, no inter-layer HBM traffic). Same
# rank-only contract as SELECT_BF16; stage 2 stays fp32-exact.
SELECT_PALLAS = bool(int(__import__("os").environ.get(
    "BENCH_SELECT_PALLAS", "0")))
# BENCH_WARM_BAND=N: warm-started band selection variant — full-grid
# candidate refresh every BENCH_WARM_REFRESH iters, selection on the
# N-point candidate set in between (engine.refine warm_band knob).
WARM_BAND = int(__import__("os").environ.get("BENCH_WARM_BAND", "0"))
WARM_REFRESH = int(__import__("os").environ.get("BENCH_WARM_REFRESH", "10"))


def build_ours():
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
    select = deepsdf.select_sdf_fn(cfg, params) if SELECT_BF16 else None
    if SELECT_PALLAS:
        from sdflabel_tpu.ops import mlp_pallas

        select = mlp_pallas.pallas_select_fn(cfg, params)
        assert select is not None, "bench arch must be kernel-supported"
    grid_pts = grid_ops.generate_point_grid(GRID_DENSITY)
    rcfg = refine_mod.RefineConfig(iters=SCAN_ITERS,
                                   surface_capacity=CAPACITY,
                                   warm_band=WARM_BAND,
                                   warm_refresh=WARM_REFRESH)
    K = jnp.asarray(rast_mod.calibration_matrix((CROP, CROP)))
    refine_fn = jax.jit(
        refine_mod.make_refine_fn(decoder, rcfg, grid_pts, K, (CROP, CROP),
                                  select_decoder=select)
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
    run = build_ours()
    # progress to stderr (stdout is reserved for the one JSON line); the
    # remote axon compile of the full scanned program is 300-500 s cold
    print("# compiling (cold remote compile can take ~5-8 min)...",
          file=sys.stderr, flush=True)
    run()  # compile
    print("# compiled; timing...", file=sys.stderr, flush=True)
    run()  # warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    dt = min(times)
    iters_per_sec = SCAN_ITERS / dt
    return iters_per_sec * CROP * CROP, iters_per_sec


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


def analytic_hbm_bytes_per_iteration():
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
    """
    B = 4  # fp32 bytes (inputs, weights)
    BA = 2  # bf16 activation storage between matmul layers
    n1 = GRID_DENSITY ** 3
    n2 = CAPACITY
    H = DIMS
    nb = LAYERS - 1  # inter-layer activation boundaries
    w_bytes = LAYERS * H * H * B  # decoder weights, read once per pass
    # stage 1 (selection decode, fwd only): input + boundaries + weights
    s1 = n1 * (H + LATENT + 3) * B + 2 * n1 * H * BA * nb + w_bytes
    # stage 2 (fwd + normals vjp + loss-grad bwd ~ 3 passes over a
    # CAPACITY-row chain; backward re-reads stored activations)
    s2 = 3 * (2 * n2 * H * BA * nb + w_bytes)
    return float(s1 + s2)


def flops_per_iteration_subprocess(timeout=420):
    """Run flops_per_iteration in a CPU-forced child process (this process
    holds the axon TPU backend and cannot switch platforms)."""
    import subprocess

    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; sys.path.insert(0, %r);"
        "import bench; print('FLOPS', bench.flops_per_iteration())"
        % REPO
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=timeout)
    for line in out.stdout.splitlines():
        if line.startswith("FLOPS "):
            return float(line.split()[1])
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


import os  # noqa: E402  (used in bench_reference)


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
    # default exact program: under BENCH_WARM_BAND the scan body holds a
    # lax.cond whose branches the cost analysis BOTH counts, and the
    # useful FLOPs differ between refresh and warm iterations.
    variant = None
    if WARM_BAND:
        variant = f"warm_band={WARM_BAND},refresh={WARM_REFRESH}"
    if SELECT_BF16:
        variant = (variant + "," if variant else "") + "select_bf16"
    if SELECT_PALLAS:
        variant = (variant + "," if variant else "") + "select_pallas"
    try:
        if variant is not None:
            raise RuntimeError(
                f"flops/roofline accounting skipped for variant {variant}")
        print("# computing XLA cost analysis (CPU lowering)...",
              file=sys.stderr, flush=True)
        flops_iter = flops_per_iteration_subprocess()
    except Exception as e:  # never fail the bench on accounting
        print(f"# cost analysis failed: {type(e).__name__}: {e}",
              file=sys.stderr)
        flops_iter = None
    bytes_iter = analytic_hbm_bytes_per_iteration() if flops_iter else None
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
        **({"variant": variant} if variant else {}),
    }))


if __name__ == "__main__":
    main()
