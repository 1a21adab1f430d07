"""Compiler-derived communication budget of the sharded refinement step.

Real N-chip hardware is unavailable in this environment (BENCH_NOTES
"Multi-host scaling"), so the per-iteration collective traffic of the
north-star decomposition (parallel/sharded_refine.py) is extracted from
the program XLA actually compiles for an N-device mesh — op kinds,
shapes, and byte volumes from the optimized HLO — instead of an analytic
estimate. Run on the virtual CPU mesh; the HLO collectives are identical
to what a TPU mesh would execute (XLA partitions by sharding, the
backend only changes the collective implementation).

Writes one JSON line (and a readable table to stderr) with, per device
count: the collective op histogram, total bytes moved per refinement
call, bytes per iteration, and the compute-FLOPs-to-comm-bytes ratio.

Usage: python scripts/comm_budget.py [--devices 2,4,8] [--out FILE]
"""

import argparse
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

N_DEVICES_ENV = "8"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={N_DEVICES_ENV}"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "f64": 8, "s32": 4,
                "u32": 4, "s64": 8, "u64": 8, "pred": 1, "s8": 1, "u8": 1}
_COLLECTIVES = ("all-gather", "all-reduce", "reduce-scatter",
                "collective-permute", "all-to-all")


def _shape_bytes(shape_str: str) -> int:
    """'f32[4096,4]' -> bytes. Tuple shapes '(f32[..], ...)' sum parts."""
    total = 0
    for m in re.finditer(r"(\w+)\[([0-9,]*)\]", shape_str):
        dt, dims = m.group(1), m.group(2)
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def collect(hlo_text: str) -> dict:
    """Histogram of collective ops: count + output bytes per kind."""
    out = {}
    for line in hlo_text.splitlines():
        s = line.strip()
        m = re.match(r"(?:ROOT )?\S+ = (\S+) (\S+?)\(", s)
        if not m:
            continue
        shape_str, op = m.group(1), m.group(2)
        kind = next((c for c in _COLLECTIVES if op.startswith(c)), None)
        if kind is None or op.endswith("-start"):
            # -start/-done pairs: count the -done (has the real output)
            if kind is None or not op.endswith("-done"):
                continue
        ent = out.setdefault(kind, {"count": 0, "bytes": 0})
        ent["count"] += 1
        ent["bytes"] += _shape_bytes(shape_str)
    return out


def budget_for(n_dev: int, iters: int = 8):
    from sdflabel_tpu.engine import refine as refine_mod
    from sdflabel_tpu.models import deepsdf
    from sdflabel_tpu.ops import grid as grid_ops
    from sdflabel_tpu.parallel import mesh as mesh_mod
    from sdflabel_tpu.parallel import sharded_refine
    from sdflabel_tpu.renderer import rasterer as rast_mod

    # reference refinement scale: 8x512 decoder, 40^3 grid, 32x32 render,
    # 4096-point band — the headline bench's exact workload, sharded
    dcfg = deepsdf.DeepSDFConfig(latent_size=3, dims=(512,) * 8,
                                 norm_layers=tuple(range(8)),
                                 latent_in=(4,), weight_norm=True)
    params = deepsdf.init_params(dcfg, jax.random.PRNGKey(0))
    decoder = deepsdf.sdf_fn(dcfg, params)

    crop_hw = (32, 32)
    K = rast_mod.calibration_matrix(crop_hw)
    grid_pts = np.asarray(grid_ops.generate_point_grid(40))
    cfg = refine_mod.RefineConfig(iters=iters, surface_capacity=4096)
    mesh = mesh_mod.make_mesh(n_data=1, n_rays=n_dev,
                              devices=jax.devices()[:n_dev])
    fn = sharded_refine.make_sharded_refine_fn(
        decoder, cfg, grid_pts, K, crop_hw, mesh, axis="rays")

    init = refine_mod.init_refine_params(0.3, [0.0, 0.0, 4.0], 2.0,
                                         [1.0, 0.0, 0.0])
    nocs = jnp.zeros((3, *crop_hw), jnp.float32)
    frustum = jnp.zeros((2048, 3), jnp.float32)
    fmask = jnp.ones((2048,), bool)

    lowered = jax.jit(fn).lower(init, nocs, frustum, fmask)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    hist = collect(hlo)
    total_bytes = sum(e["bytes"] for e in hist.values())
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    flops = float(ca.get("flops", 0.0)) if ca else 0.0
    return {
        "devices": n_dev,
        "collectives": hist,
        "bytes_per_call": total_bytes,
        "bytes_per_iter": round(total_bytes / iters, 1),
        "flops_per_call_per_device": flops,
        "flops_per_comm_byte": round(flops / max(total_bytes, 1), 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default="2,4,8")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    rows = []
    for n in [int(x) for x in args.devices.split(",")]:
        r = budget_for(n)
        rows.append(r)
        print(f"# {n} devices: {r['bytes_per_iter'] / 1e3:.1f} KB/iter "
              f"({r['collectives']}), {r['flops_per_comm_byte']:.0f} "
              f"FLOP/comm-byte", file=sys.stderr, flush=True)
    payload = {"metric": "sharded_refine_comm_budget", "rows": rows,
               "note": ("optimized-HLO collectives of the rays-sharded "
                        "refinement step at reference scale (40^3 grid, "
                        "32x32 render, cap 4096), virtual CPU mesh; "
                        "partitioning identical on TPU meshes")}
    line = json.dumps(payload)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
