"""On-chip sweep of the fused splat kernel's tile sizes.

The splat passes are the second-largest non-MXU chunk of the refinement
iteration after the NN fix (round-3 profile: znorm 72 + softmax 107 +
bwd 175 us/iter at the default 256-px blocks / 512-pt chunks). The grid
at that tiling is only (4, 8) steps — per-step pipeline overhead is a
real fraction — so sweep (block_px, chunk) at the production scale and
report rays/s of the full refinement iteration.

Run each point in a fresh subprocess: the tile sizes are bound at import
(env SDFLABEL_SPLAT_BLOCK_PX / SDFLABEL_SPLAT_CHUNK).
"""

import itertools
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import sys, time
sys.path.insert(0, %(repo)r)
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
from sdflabel_tpu.engine import refine as refine_mod
from sdflabel_tpu.models import deepsdf
from sdflabel_tpu.ops import grid as grid_ops, mlp_pallas
from sdflabel_tpu.renderer import rasterer as rast_mod

ITERS, CROP, CAP, FRUSTUM = 240, 32, 4096, 4096
cfg = deepsdf.DeepSDFConfig(latent_size=3, dims=(512,)*8,
                            norm_layers=tuple(range(8)), latent_in=(4,),
                            weight_norm=True)
params = deepsdf.init_params(cfg, jax.random.PRNGKey(0))
fn = jax.jit(refine_mod.make_refine_fn(
    deepsdf.sdf_fn(cfg, params),
    refine_mod.RefineConfig(iters=ITERS, surface_capacity=CAP),
    grid_ops.generate_point_grid(40),
    jnp.asarray(rast_mod.calibration_matrix((CROP, CROP))), (CROP, CROP),
    select_decoder=mlp_pallas.pallas_select_fn(cfg, params)))
rng = np.random.RandomState(0)
p0 = refine_mod.init_refine_params(0.3, [0,0,4.0], 2.0, [1.0,0,0])
nocs = jnp.asarray(rng.rand(3, CROP, CROP), jnp.float32)
fr = jnp.asarray(rng.randn(FRUSTUM,3)+[0,0,4.0], jnp.float32)
fm = jnp.ones((FRUSTUM,), bool)
run = lambda: float(fn(p0, nocs, fr, fm)[0].yaw[0])
run(); run()
ts = []
for _ in range(3):
    t0 = time.perf_counter(); run(); ts.append(time.perf_counter()-t0)
dt = min(ts)
print("RESULT", ITERS*CROP*CROP/dt, ITERS/dt, flush=True)
""" % {"repo": REPO}


def main():
    results = []
    for bp, ck in itertools.product((256, 512, 1024), (512, 1024)):
        env = dict(os.environ, SDFLABEL_SPLAT_BLOCK_PX=str(bp),
                   SDFLABEL_SPLAT_CHUNK=str(ck))
        r = subprocess.run([sys.executable, "-c", CHILD], env=env,
                           capture_output=True, text=True, timeout=1800)
        line = next((ln for ln in r.stdout.splitlines()
                     if ln.startswith("RESULT")), None)
        if line is None:
            print(f"block_px={bp:5d} chunk={ck:5d}  FAILED: "
                  f"{r.stderr.strip().splitlines()[-1][:160] if r.stderr else 'no output'}")
            continue
        rays = float(line.split()[1])
        results.append((bp, ck, rays))
        print(f"block_px={bp:5d} chunk={ck:5d}  {rays:12,.0f} rays/s",
              flush=True)
    if results:
        bp, ck, rays = max(results, key=lambda t: t[2])
        print(f"best: block_px={bp} chunk={ck} ({rays:,.0f} rays/s)")


if __name__ == "__main__":
    main()
