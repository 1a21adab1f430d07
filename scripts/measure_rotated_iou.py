"""Rotated-IoU kernel throughput vs the reference's in-repo claim.

The reference's ONLY in-repo performance number (BASELINE.md) is the
numba-CUDA rotated-IoU kernel docstring: "500x faster than cpu version
(take 5ms in one example)" (/root/reference/pipelines/rotate_iou.py:
290-291). This measures our branch-free vmapped JAX kernel
(ops/rotated_iou.py) at KITTI-eval scale on the available backends and —
when numba is importable — the reference's own CPU JIT path on this
host for a live ratio.

Workload: the eval pipeline's sharded BEV IoU matrices. A KITTI val
frame has ~10-40 GT x ~10-40 DT boxes; the evaluator batches frames
into shards of ~thousands of pairs (detection_3d.py:504-548). We time
an (N, K) = (512, 512) pair matrix (262k pairs — larger than the
reference's "one example") plus the per-frame (64, 64) shape.
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from sdflabel_tpu.ops import rotated_iou  # noqa: E402


def make_boxes(rng, n):
    b = np.zeros((n, 5), np.float32)
    b[:, 0:2] = rng.uniform(-40, 40, (n, 2))  # centers
    b[:, 2:4] = rng.uniform(1.5, 5.0, (n, 2))  # dims
    b[:, 4] = rng.uniform(-np.pi, np.pi, n)  # angles
    return b


def timeit_scanned(boxes_r, qboxes_r, reps=5):
    """Time REPS IoU matrices inside ONE dispatch (lax.scan over stacked
    inputs) — the axon tunnel costs ~40 ms per dispatch, which would
    otherwise dominate a 1-2 ms kernel."""
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def scanned(bs, qs):
        def step(carry, bq):
            b, q = bq
            m = rotated_iou._rotate_iou_any(b, q, -1)
            return carry + jnp.sum(m), None

        total, _ = lax.scan(step, jnp.zeros(()), (bs, qs))
        return total

    bs, qs = jnp.asarray(boxes_r), jnp.asarray(qboxes_r)
    np.asarray(scanned(bs, qs))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(scanned(bs, qs))  # host transfer = completion on axon
        ts.append(time.perf_counter() - t0)
    return min(ts) / boxes_r.shape[0]


def main():
    rng = np.random.RandomState(0)
    print(f"backend: {jax.default_backend()}")
    reps_in_scan = 32
    for n, k in ((64, 64), (512, 512)):
        boxes_r = np.stack([make_boxes(rng, n) for _ in range(reps_in_scan)])
        qboxes_r = np.stack([make_boxes(rng, k) for _ in range(reps_in_scan)])
        dt = timeit_scanned(boxes_r, qboxes_r)
        print(f"ours {n}x{k}: {dt * 1e3:.3f} ms/matrix "
              f"({n * k / dt / 1e6:.1f} M pairs/s)", flush=True)

    # Context for the ratio: the reference's CUDA kernel docstring claims
    # 5 ms for "one example" and 500x over the (upstream, not shipped)
    # CPU version; its numba-CUDA path needs a GPU and its JIT helpers
    # need numba — neither exists in this image. The golden-parity story
    # vs its math lives in tests/test_eval_golden.py (the numba functions
    # executed as pure Python).


if __name__ == "__main__":
    main()
