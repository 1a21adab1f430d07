"""Measure composed warm + coarse-to-fine refresh and longer refresh.

The shipping default (warm pool == capacity, refresh 10) still pays a
FULL 64k-point grid decode every 10th iteration — the dominant remaining
stage-1 cost. Two candidate reductions, both quality-gateable on the
suite (scripts/run_quality_benchmark.py):

  compose   refresh through the coarse-to-fine cell pass
            (grid.band_candidates cell pass): 8000 corners +
            cells*8 points instead of 64000.
  refresh20 halve the refresh frequency.

Times each at the bench headline protocol (480-iter scan, capacity 4096,
pool == capacity) and the crop protocol (60 iters, capacity 8192).

Usage: python scripts/measure_warm_compose.py
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
    combos = [
        # (label, kwargs) — headline protocol: pool == CAPACITY 4096;
        # margin budget = 2x pool/8 cells
        ("warm r10 (default)", dict(warm_band=bench.CAPACITY)),
        ("warm r10 + c2f 1024", dict(warm_band=bench.CAPACITY,
                                     warm_refresh_cells=1024)),
        ("warm r20", dict(warm_band=bench.CAPACITY, warm_refresh=20)),
        ("warm r20 + c2f 1024", dict(warm_band=bench.CAPACITY,
                                     warm_refresh=20, warm_refresh_cells=1024)),
        # crop protocol (60 iters, capacity 8192, pool 8192; cells 2048 =
        # 2x margin)
        ("crop60 warm r10", dict(warm_band=bench.CROP_CAPACITY,
                                 iters=bench.CROP_ITERS,
                                 capacity=bench.CROP_CAPACITY)),
        ("crop60 warm r10 + c2f 2048",
         dict(warm_band=bench.CROP_CAPACITY, iters=bench.CROP_ITERS,
              capacity=bench.CROP_CAPACITY, warm_refresh_cells=2048)),
    ]
    rows = []
    for label, kw in combos:
        print(f"# {label} (compiling)...", file=sys.stderr, flush=True)
        dt = bench._timed(bench.build_refine(select="default", **kw))
        iters = kw.get("iters", bench.SCAN_ITERS)
        rows.append((label, dt, iters / dt,
                     iters / dt * bench.CROP * bench.CROP))
        print(f"# {label}: {dt:.3f}s {iters / dt:.1f} it/s",
              file=sys.stderr, flush=True)
    print("| variant | wall s | iters/s | rays/s |")
    print("|---|---|---|---|")
    for label, dt, ips, rps in rows:
        print(f"| {label} | {dt:.3f} | {ips:.1f} | {rps:,.0f} |")


if __name__ == "__main__":
    main()
