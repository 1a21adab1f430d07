"""Crops/hour of the vmapped multi-crop refinement (parallel/batched_refine).

bench.py's crops/hour metric refines ONE crop per dispatch; the batched
driver path (pipelines.refine_css.refine_crops_batched) vmaps B crops
into one program. This measures whether batching buys throughput on one
chip (dispatch amortization + better utilization of the VPU-bound tail)
at the reference crop workload: 60 iterations, capacity 8192, 32x32
letterboxed renders, 8x512 decoder, 40^3 grid.

Usage: python scripts/measure_batched_crops.py [--batches 1,2,4,8]
                                               [--warm 0|8192]
"""

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sdflabel_tpu.engine import refine as refine_mod  # noqa: E402
from sdflabel_tpu.models import deepsdf  # noqa: E402
from sdflabel_tpu.ops import grid as grid_ops, mlp_pallas  # noqa: E402
from sdflabel_tpu.parallel import batched_refine  # noqa: E402
from sdflabel_tpu.renderer import rasterer as rast_mod  # noqa: E402

GRID, CAP, CROP, FRUSTUM, ITERS = 40, 8192, 32, 8192, 60


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,2,4,8")
    ap.add_argument("--warm", type=int, default=0)
    ap.add_argument("--block-px", type=int, default=0,
                    help="splat pixel-block override (0 = kernel default)")
    ap.add_argument("--chunk", type=int, default=0,
                    help="splat point-chunk override (0 = kernel default)")
    ap.add_argument("--auto-tiles", action="store_true",
                    help="use refine_crops_batched's batch-aware tiles")
    ap.add_argument("--refresh-cells", type=int, default=0,
                    help="composed warm refresh cell budget (0 = full)")
    args = ap.parse_args()

    print(f"backend: {jax.default_backend()}  warm={args.warm} "
          f"tiles={args.block_px}/{args.chunk} auto={args.auto_tiles}",
          file=sys.stderr, flush=True)
    dcfg = deepsdf.DeepSDFConfig(latent_size=3, dims=(512,) * 8,
                                 norm_layers=tuple(range(8)),
                                 latent_in=(4,), weight_norm=True)
    params = deepsdf.init_params(dcfg, jax.random.PRNGKey(0))
    decoder = deepsdf.sdf_fn(dcfg, params)
    select = None
    if jax.default_backend() == "tpu":
        select = mlp_pallas.pallas_select_fn(dcfg, params)
    base_cfg = refine_mod.RefineConfig(iters=ITERS, surface_capacity=CAP,
                                       warm_band=args.warm,
                                       warm_refresh=10 if args.warm else 0,
                                       warm_refresh_cells=(
                                           args.refresh_cells or None),
                                       splat_block_px=args.block_px,
                                       splat_chunk=args.chunk)
    grid_pts = np.asarray(grid_ops.generate_point_grid(GRID))
    K = np.asarray(rast_mod.calibration_matrix((CROP, CROP)))

    rng = np.random.RandomState(0)
    import dataclasses

    for b in [int(x) for x in args.batches.split(",")]:
        cfg = base_cfg
        if args.auto_tiles:
            px, ch = batched_refine.batch_tile_hints(b)
            cfg = dataclasses.replace(base_cfg, splat_block_px=px,
                                      splat_chunk=ch)
        fn = batched_refine.make_batched_refine(
            decoder, cfg, grid_pts, (CROP, CROP), select_decoder=select)
        p0 = jax.vmap(lambda i: refine_mod.init_refine_params(
            0.3 + 0.01 * i, jnp.asarray([0.0, 0.0, 4.0]), 2.0,
            jnp.asarray([1.0, 0.0, 0.0])))(jnp.arange(b, dtype=jnp.float32))
        Ks = jnp.asarray(np.tile(K, (b, 1, 1)))
        nocs = jnp.asarray(rng.rand(b, 3, CROP, CROP), jnp.float32)
        fr = jnp.asarray(rng.randn(b, FRUSTUM, 3) + [0, 0, 4.0],
                         jnp.float32)
        fm = jnp.ones((b, FRUSTUM), bool)
        pm = jnp.ones((b, CROP, CROP), bool)

        out = fn(p0, Ks, nocs, fr, fm, pm)
        jax.block_until_ready(out)  # compile
        n = max(1, 8 // b)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(n):
                out = fn(p0, Ks, nocs, fr, fm, pm)
            jax.block_until_ready(out)
            np.asarray(jax.tree.leaves(out)[0])
            ts.append((time.perf_counter() - t0) / n)
        dt = min(ts)
        print(f"B={b}: {dt * 1e3:.1f} ms/dispatch -> "
              f"{dt / b * 1e3:.1f} ms/crop -> "
              f"{b * 3600.0 / dt:.0f} crops/hour/chip", flush=True)


if __name__ == "__main__":
    main()
