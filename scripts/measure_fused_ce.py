"""One-process TPU measurement: CSS train step, jnp CE vs fused Pallas CE.

Reference workload (BENCH_NOTES.md "CSS training"): batch 13, 128x128
crops, canonical CSSNet, fp32. Timing per the axon quirks ledger: force a
host transfer for real completion; pipeline a burst of steps between
syncs to amortize the ~32 ms dispatch RTT (same protocol as the earlier
CSS numbers: warm, then time a 20-step burst).
"""

import sys
import time

import numpy as np

REPO = "/root/repo"
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sdflabel_tpu.engine import css_train  # noqa: E402
from sdflabel_tpu.models import css as css_mod  # noqa: E402

B, H, W = 13, 128, 128
BURST = 20

rng = np.random.RandomState(0)
batch = {
    "rgb": jnp.asarray(rng.rand(B, 3, H, W), jnp.float32),
    "uvw": jnp.asarray(rng.randint(0, 256, (B, 3, H, W)), jnp.int32),
    "mask": jnp.asarray(rng.randint(0, 2, (B, H, W)), jnp.int32),
    "latent": jnp.asarray(rng.randn(B, 3), jnp.float32),
}

model = css_mod.CSSNet(use_running_average=False)
variables = model.init(jax.random.PRNGKey(0), batch["rgb"])


def measure(name, fused):
    step = jax.jit(css_train.make_train_step(1e-3, fused_ce=fused))
    state = css_train.init_train_state(
        jax.tree.map(jnp.asarray, variables), 1e-3)
    t0 = time.perf_counter()
    state, metrics = step(state, batch)
    loss0 = float(metrics["loss"])
    print(f"# {name}: compile+first {time.perf_counter()-t0:.1f}s "
          f"loss={loss0:.6f}", flush=True)
    for _ in range(3):  # warm
        state, metrics = step(state, batch)
    float(metrics["loss"])
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(BURST):
            state, metrics = step(state, batch)
        float(metrics["loss"])
        times.append((time.perf_counter() - t0) / BURST)
    dt = min(times)
    print(f"{name}: {dt*1000:.2f} ms/step  ({B/dt:.0f} images/s)  "
          f"loss_after={float(metrics['loss']):.6f}", flush=True)
    return dt, float(metrics["loss"])


dt_plain, loss_plain = measure("jnp CE", fused=False)
dt_fused, loss_fused = measure("fused Pallas CE", fused=True)
print(f"speedup: {dt_plain / dt_fused:.3f}x   "
      f"loss drift after {3+3*BURST} steps: {abs(loss_fused-loss_plain):.2e}")
