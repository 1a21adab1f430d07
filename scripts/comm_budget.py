"""Compiler-derived communication budget of the sharded refinement step.

Real N-chip hardware is unavailable in this environment (BENCH_NOTES
"Multi-host scaling"), so the per-iteration collective traffic of the
north-star decomposition (parallel/sharded_refine.py) is extracted from
the program XLA actually compiles for an N-device mesh — op kinds,
shapes, and byte volumes from the optimized HLO — instead of an analytic
estimate. Run on the virtual CPU mesh; the HLO collectives are identical
to what a TPU mesh would execute (XLA partitions by sharding, the
backend only changes the collective implementation).

The refinement loop is a lax.scan: its body computation appears ONCE in
the HLO text but executes once per iteration, so collectives are
attributed per-computation and the while-body computations (reached from
the while op's body/condition) are reported as per-iteration traffic;
everything else is once-per-call.

Writes one JSON line (and a readable table to stderr) with, per device
count: the collective op histogram, bytes moved per iteration and per
call, and the per-device per-iteration FLOPs-to-comm-bytes ratio.

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

# parse argv BEFORE importing jax: the virtual device count must cover
# the largest requested mesh and XLA_FLAGS is read at backend init
ap = argparse.ArgumentParser()
ap.add_argument("--devices", default="2,4,8")
ap.add_argument("--out", default=None)
ARGS = ap.parse_args()
DEVICE_COUNTS = [int(x) for x in ARGS.devices.split(",")]

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={max(DEVICE_COUNTS)}"
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
    """'f32[4096,4]' or '(f32[..], s32[..])' -> total bytes."""
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


def collect(hlo_text: str) -> tuple[dict, dict]:
    """Collective histograms: (per-iteration, once-per-call).

    Walks the HLO per computation; computations referenced as a while
    op's body/condition (transitively — called computations like fusion
    bodies inside the loop are attributed via the call graph) count as
    per-iteration.
    """
    comp_ops: dict[str, list] = {}
    comp_calls: dict[str, set] = {}
    while_bodies: set[str] = set()
    cur = None
    # shape part may be a tuple with spaces: match up to the op name by
    # anchoring on ' = <shape> <op>(' with a lazy shape group
    op_re = re.compile(r"(?:ROOT )?\S+ = (.+?) ([\w-]+)\(")
    callee_re = re.compile(
        r"(?:to_apply|body|condition|branch_computations|called_computations"
        r"|calls)=\{?%?([\w.\-]+(?:, *%?[\w.\-]+)*)\}?")

    for raw in hlo_text.splitlines():
        s = raw.strip()
        if not s:
            continue
        # computation header: '[ENTRY] %name (params...) -> shape {'
        if not raw.startswith(" ") and s.endswith("{") and "->" in s:
            toks = s.split()
            name = toks[1] if toks[0] == "ENTRY" else toks[0]
            cur = name.lstrip("%")
            comp_ops.setdefault(cur, [])
            comp_calls.setdefault(cur, set())
            continue
        if cur is None:
            continue
        m = op_re.match(s)
        if m:
            shape_str, op = m.group(1), m.group(2)
            kind = next((c for c in _COLLECTIVES if op.startswith(c)), None)
            if kind is not None and not op.endswith("-start"):
                comp_ops[cur].append((kind, _shape_bytes(shape_str)))
            if op == "while":
                for mm in re.finditer(r"(?:body|condition)=%?([\w.\-]+)", s):
                    while_bodies.add(mm.group(1))
        for mm in callee_re.finditer(s):
            for name in re.split(r", *", mm.group(1)):
                comp_calls[cur].add(name.lstrip("%"))

    # transitive closure: anything reachable from a while body is per-iter
    per_iter_comps = set()
    frontier = list(while_bodies)
    while frontier:
        c = frontier.pop()
        if c in per_iter_comps:
            continue
        per_iter_comps.add(c)
        frontier.extend(comp_calls.get(c, ()))

    per_iter, per_call = {}, {}
    for comp, ops in comp_ops.items():
        dst = per_iter if comp in per_iter_comps else per_call
        for kind, nbytes in ops:
            ent = dst.setdefault(kind, {"count": 0, "bytes": 0})
            ent["count"] += 1
            ent["bytes"] += nbytes
    return per_iter, per_call


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
    per_iter, per_call = collect(hlo)
    iter_bytes = sum(e["bytes"] for e in per_iter.values())
    call_bytes = sum(e["bytes"] for e in per_call.values())
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    # cost_analysis counts a scan body once -> per-device FLOPs of ONE
    # iteration plus the (small) outside-loop setup
    flops_iter = float(ca.get("flops", 0.0)) if ca else 0.0
    return {
        "devices": n_dev,
        "per_iteration": {"collectives": per_iter, "bytes": iter_bytes},
        "once_per_call": {"collectives": per_call, "bytes": call_bytes},
        "flops_per_iter_per_device": flops_iter,
        "flops_per_comm_byte": round(flops_iter / max(iter_bytes, 1), 1),
    }


def main():
    rows = []
    for n in DEVICE_COUNTS:
        r = budget_for(n)
        rows.append(r)
        print(f"# {n} devices: {r['per_iteration']['bytes'] / 1e3:.1f} "
              f"KB/iter ({r['per_iteration']['collectives']}) + "
              f"{r['once_per_call']['bytes'] / 1e3:.1f} KB once/call, "
              f"{r['flops_per_comm_byte']:.0f} FLOP/comm-byte",
              file=sys.stderr, flush=True)
    payload = {"metric": "sharded_refine_comm_budget", "rows": rows,
               "note": ("optimized-HLO collectives of the rays-sharded "
                        "refinement step at reference scale (40^3 grid, "
                        "32x32 render, cap 4096), virtual CPU mesh; "
                        "partitioning identical on TPU meshes; while-body "
                        "collectives attributed per iteration")}
    line = json.dumps(payload)
    print(line)
    if ARGS.out:
        with open(ARGS.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
