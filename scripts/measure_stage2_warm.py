"""Measure the fused stage-2 kernel ON THE WARM-BAND PATH (VERDICT r3 #2).

Round 3 judged ops/mlp2_pallas a 0.96x NON-win at the exact-path scale,
where stage-2 is ~15% of the iteration — but the warm-band path skips the
full-grid stage-1 decode on warm iterations, so there stage-2 DOMINATES
(ops/mlp2_pallas.py docstring) and was never measured. This script times
warm +/- stage2_pallas at BOTH bench protocols:

  headline   480-iter scan, capacity 4096, 32x32 crop (bench.py rays/s)
  crop       60-iter scan, capacity 8192 (bench.py crops/hour)

and exact +/- stage2 as the control row. Writes a markdown-ready table to
stdout; run on the real chip (the kernels are TPU Mosaic programs).

Usage: python scripts/measure_stage2_warm.py
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

os.environ.setdefault("BENCH_SKIP_EXTRAS", "1")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import bench  # noqa: E402


def main():
    assert jax.default_backend() == "tpu", "measure on the real chip"
    rows = []
    combos = [
        # (label, stage2, build_refine kwargs)
        ("exact headline", False, dict(select="default")),
        ("exact+s2 headline", True, dict(select="default")),
        ("warm headline", False,
         dict(select="default", warm_band=bench.CAPACITY)),
        ("warm+s2 headline", True,
         dict(select="default", warm_band=bench.CAPACITY)),
        ("warm crop60", False,
         dict(select="default", warm_band=bench.CROP_CAPACITY,
              iters=bench.CROP_ITERS, capacity=bench.CROP_CAPACITY)),
        ("warm+s2 crop60", True,
         dict(select="default", warm_band=bench.CROP_CAPACITY,
              iters=bench.CROP_ITERS, capacity=bench.CROP_CAPACITY)),
    ]
    for label, stage2, kw in combos:
        bench.STAGE2_PALLAS = stage2
        print(f"# {label} (compiling)...", file=sys.stderr, flush=True)
        dt = bench._timed(bench.build_refine(**kw))
        iters = kw.get("iters", bench.SCAN_ITERS)
        rows.append((label, dt, iters / dt,
                     iters / dt * bench.CROP * bench.CROP))
        print(f"# {label}: {dt:.3f}s {iters / dt:.1f} it/s",
              file=sys.stderr, flush=True)

    print("| variant | wall s | iters/s | rays/s |")
    print("|---|---|---|---|")
    for label, dt, ips, rps in rows:
        print(f"| {label} | {dt:.3f} | {ips:.1f} | {rps:,.0f} |")

    by = {r[0]: r for r in rows}
    for a, b in (("warm headline", "warm+s2 headline"),
                 ("warm crop60", "warm+s2 crop60"),
                 ("exact headline", "exact+s2 headline")):
        if a in by and b in by:
            print(f"# stage2 speedup on {a.split()[0]} "
                  f"({a.split()[-1]}): {by[a][1] / by[b][1]:.3f}x")


if __name__ == "__main__":
    main()
