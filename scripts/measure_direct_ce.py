"""On-chip measurement: direct-CE trainer mode vs the parity formulation.

VERDICT r3 weak #5 / next #8: CSS training sits at ~10% of bf16 peak with
the log-softmax towers profiled at ~6.7 ms/step, and the "inherent to the
logits design" wall was asserted, not tested. [train] direct_ce = True
feeds the heads' RAW logits to the CE towers (an exact rewrite — loss
delta 0, grad max|Δ| ~1e-10, test_direct_ce_mode), letting XLA dead-code
eliminate the model-side u/v/w log-softmax towers from the compiled step.
This measures whether that actually moves ms/step at the reference batch
(13) and at 4x (52), same burst protocol as scripts/measure_fused_ce.py.

Usage: python scripts/measure_direct_ce.py
"""

import sys
import time

import numpy as np

REPO = "/root/repo"
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp  # noqa: E402

from sdflabel_tpu.engine import css_train  # noqa: E402
from sdflabel_tpu.models import css as css_mod  # noqa: E402

H = W = 128
BURST = 20


def measure(name, batch_size, direct):
    rng = np.random.RandomState(0)
    batch = {
        "rgb": jnp.asarray(rng.rand(batch_size, 3, H, W), jnp.float32),
        "uvw": jnp.asarray(rng.randint(0, 256, (batch_size, 3, H, W)),
                           jnp.int32),
        "mask": jnp.asarray(rng.randint(0, 2, (batch_size, H, W)),
                            jnp.int32),
        "latent": jnp.asarray(rng.randn(batch_size, 3), jnp.float32),
    }
    model = css_mod.CSSNet(use_running_average=False)
    variables = model.init(jax.random.PRNGKey(0), batch["rgb"])
    step = jax.jit(css_train.make_train_step(1e-3, direct_ce=direct))
    state = css_train.init_train_state(
        jax.tree.map(jnp.asarray, variables), 1e-3)
    t0 = time.perf_counter()
    state, metrics = step(state, batch)
    loss0 = float(metrics["loss"])
    print(f"# {name}: compile+first {time.perf_counter() - t0:.1f}s "
          f"loss={loss0:.6f}", file=sys.stderr, flush=True)
    for _ in range(3):
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
    print(f"{name}: {dt * 1000:.2f} ms/step ({batch_size / dt:.0f} "
          f"images/s) loss_after={float(metrics['loss']):.6f}", flush=True)
    return dt, float(metrics["loss"])


def main():
    for b in (13, 52):
        dt_p, loss_p = measure(f"parity CE     b={b}", b, direct=False)
        dt_d, loss_d = measure(f"direct CE     b={b}", b, direct=True)
        print(f"b={b}: direct-CE speedup {dt_p / dt_d:.3f}x, "
              f"loss drift after {3 + 3 * BURST} steps "
              f"{abs(loss_d - loss_p):.2e}", flush=True)


if __name__ == "__main__":
    main()
