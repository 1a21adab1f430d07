"""One-process TPU measurement: exact refine path vs fused-Pallas selection.

Runs the bench workload (40^3 grid, 8x512 decoder, 32x32 render, 120-iter
scan) three ways in a single process so the axon remote compiles are paid
once each and the numbers are same-process comparable:
  1. exact full-grid selection (the bench headline),
  2. select_pallas (fused VMEM-resident stage-1 kernel),
  3. select_pallas + warm_band==capacity refresh-10 (kernel also serves
     the periodic refresh pass).

Timing per the axon quirks ledger: block_until_ready returns at enqueue —
force a host transfer; one dispatch costs ~32 ms RTT, amortized by the
120-iter rolled scan.
"""

import sys
import time

import numpy as np

REPO = "/root/repo"
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from sdflabel_tpu.engine import refine as refine_mod  # noqa: E402
from sdflabel_tpu.models import deepsdf  # noqa: E402
from sdflabel_tpu.ops import grid as grid_ops, mlp_pallas  # noqa: E402
from sdflabel_tpu.renderer import rasterer as rast_mod  # noqa: E402

GRID_DENSITY, CAPACITY, CROP, FRUSTUM = 40, 4096, 32, 4096
DIMS, LAYERS, LATENT = 512, 8, 3
SCAN_ITERS = 120

cfg = deepsdf.DeepSDFConfig(
    latent_size=LATENT, dims=(DIMS,) * LAYERS,
    norm_layers=tuple(range(LAYERS)), latent_in=(LAYERS // 2,),
    weight_norm=True,
)
params = deepsdf.init_params(cfg, jax.random.PRNGKey(0))
decoder = deepsdf.sdf_fn(cfg, params)
pallas_sel = mlp_pallas.pallas_select_fn(cfg, params)
assert pallas_sel is not None
grid_pts = grid_ops.generate_point_grid(GRID_DENSITY)
K = jnp.asarray(rast_mod.calibration_matrix((CROP, CROP)))

rng = np.random.RandomState(0)
params0 = refine_mod.init_refine_params(
    0.3, [0.0, 0.0, 4.0], 2.0, [1.0, 0.0, 0.0])
nocs = jnp.asarray(rng.rand(3, CROP, CROP), jnp.float32)
frustum = jnp.asarray(rng.randn(FRUSTUM, 3) + [0, 0, 4.0], jnp.float32)
fmask = jnp.ones((FRUSTUM,), bool)


def build(select=None, warm_band=0, warm_refresh=10):
    rcfg = refine_mod.RefineConfig(
        iters=SCAN_ITERS, surface_capacity=CAPACITY,
        warm_band=warm_band, warm_refresh=warm_refresh)
    return jax.jit(refine_mod.make_refine_fn(
        decoder, rcfg, grid_pts, K, (CROP, CROP), select_decoder=select))


def measure(name, fn):
    t0 = time.perf_counter()
    final, _ = fn(params0, nocs, frustum, fmask)
    float(final.yaw[0])  # host transfer = real completion
    print(f"# {name}: compile+first run {time.perf_counter()-t0:.1f}s",
          flush=True)
    float(fn(params0, nocs, frustum, fmask)[0].yaw[0])  # warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(params0, nocs, frustum, fmask)[0].yaw[0])
        times.append(time.perf_counter() - t0)
    dt = min(times)
    rays = SCAN_ITERS * CROP * CROP / dt
    print(f"{name}: {rays:,.0f} rays/s  ({SCAN_ITERS/dt:.1f} iters/s, "
          f"{dt*1000/SCAN_ITERS:.3f} ms/iter)", flush=True)
    return rays


r_exact = measure("exact", build())
r_pallas = measure("select_pallas", build(select=pallas_sel))
r_warm = measure("pallas+warm4096r10",
                 build(select=pallas_sel, warm_band=CAPACITY))
print(f"speedup select_pallas vs exact: {r_pallas / r_exact:.3f}x")
print(f"speedup pallas+warm vs exact:   {r_warm / r_exact:.3f}x")
