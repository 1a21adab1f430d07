"""Per-kernel device-time budget of the refinement iteration (TPU).

Traces a scanned run of the shipping-default program (Pallas stage-1
selection) with jax.profiler, then parses the trace.json.gz device lanes
and prints kernel time aggregated by fusion name, per iteration — the
evidence base for tail-attack decisions (VERDICT r2 next-steps #6).

Usage: python scripts/profile_refine.py [--variant warm|xla] [--iters N]
"""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from sdflabel_tpu.engine import refine as refine_mod  # noqa: E402
from sdflabel_tpu.models import deepsdf  # noqa: E402
from sdflabel_tpu.ops import grid as grid_ops, mlp_pallas  # noqa: E402
from sdflabel_tpu.renderer import rasterer as rast_mod  # noqa: E402

GRID, CAP, CROP, FRUSTUM = 40, 4096, 32, 4096
ITERS = int(next((sys.argv[i + 1] for i, a in enumerate(sys.argv)
                  if a == "--iters"), 30))
VARIANT = next((sys.argv[i + 1] for i, a in enumerate(sys.argv)
                if a == "--variant"), "default")

cfg = deepsdf.DeepSDFConfig(
    latent_size=3, dims=(512,) * 8, norm_layers=tuple(range(8)),
    latent_in=(4,), weight_norm=True)
params = deepsdf.init_params(cfg, jax.random.PRNGKey(0))
decoder = deepsdf.sdf_fn(cfg, params)
select = None if VARIANT == "xla" else mlp_pallas.pallas_select_fn(cfg, params)
# 'warm' = plain warm pool==capacity; 'ship' = the round-4 shipping
# default (warm + composed c2f refresh, 1024 cells at this pool)
warm = CAP if VARIANT in ("warm", "ship") else 0
rcfg = refine_mod.RefineConfig(iters=ITERS, surface_capacity=CAP,
                               warm_band=warm,
                               warm_refresh_cells=(
                                   1024 if VARIANT == "ship" else None))
K = jnp.asarray(rast_mod.calibration_matrix((CROP, CROP)))
fn = jax.jit(refine_mod.make_refine_fn(
    decoder, rcfg, grid_ops.generate_point_grid(GRID), K, (CROP, CROP),
    select_decoder=select))

rng = np.random.RandomState(0)
p0 = refine_mod.init_refine_params(0.3, [0, 0, 4.0], 2.0, [1.0, 0, 0])
nocs = jnp.asarray(rng.rand(3, CROP, CROP), jnp.float32)
fr = jnp.asarray(rng.randn(FRUSTUM, 3) + [0, 0, 4.0], jnp.float32)
fm = jnp.ones((FRUSTUM,), bool)


def run():
    return float(fn(p0, nocs, fr, fm)[0].yaw[0])


print(f"# compiling ({VARIANT})...", flush=True)
run()
run()
trace_dir = f"/tmp/refine_trace_{VARIANT}_{int(time.time())}"
with jax.profiler.trace(trace_dir):
    run()

files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                  recursive=True)
assert files, f"no trace.json.gz under {trace_dir}"
with gzip.open(sorted(files)[-1], "rt") as f:
    trace = json.load(f)

# device lanes: pid whose process_name mentions TPU / device
pid_names, tid_names = {}, {}
for ev in trace["traceEvents"]:
    if ev.get("ph") == "M" and ev.get("name") == "process_name":
        pid_names[ev["pid"]] = ev["args"].get("name", "")
    if ev.get("ph") == "M" and ev.get("name") == "thread_name":
        tid_names[(ev["pid"], ev["tid"])] = ev["args"].get("name", "")

device_pids = {p for p, n in pid_names.items()
               if "TPU" in n or "/device" in n.lower()}
agg = defaultdict(float)
total = 0.0
for ev in trace["traceEvents"]:
    if ev.get("ph") != "X" or ev.get("pid") not in device_pids:
        continue
    lane = tid_names.get((ev["pid"], ev["tid"]), "")
    if "step" in lane.lower():  # step/annotation lanes double-count ops
        continue
    dur = ev.get("dur", 0) / 1e3  # us -> ms
    agg[ev["name"]] += dur
    total += dur

print(f"\n# {VARIANT}: {total:.2f} ms device total over {ITERS} iters "
      f"({total / ITERS * 1000:.1f} us/iter) — top kernels:")
rows = sorted(agg.items(), key=lambda kv: -kv[1])
for name, ms in rows[:25]:
    print(f"{ms / ITERS * 1000:9.1f} us/iter  {ms:8.2f} ms total  {name[:90]}")
print(f"trace: {trace_dir}")
