"""Checkpoint / resume (orbax + flax msgpack + torch import).

SURVEY.md §5 checkpoint row: the reference only torch.saves state dicts
per epoch (train_css.py:100); here we add proper resumable training state
(params + optimizer + step) via orbax, with msgpack fallback, plus the
torch importers in models/ for reference-weight parity.
"""

from __future__ import annotations

import os
import re
from typing import Any

import jax

# exactly 'step_<digits>': orbax writes to sibling temp dirs named
# 'step_NNNNNNNN.orbax-checkpoint-tmp-<ts>' before the atomic rename — a
# prefix match would pick up a crash-orphaned temp dir (it sorts AFTER the
# finished checkpoint) and resume from garbage
_STEP_DIR = re.compile(r"^step_\d+$")


def save_train_state(ckpt_dir: str, state, step: int | None = None) -> str:
    """Save a full train state (any NamedTuple of arrays) with orbax.

    Works for engine.css_train.TrainState and
    engine.deepsdf_train.DeepSDFTrainState alike (state._asdict() is the
    checkpoint pytree); `state.step` names the directory.
    """
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)  # orbax requires absolute paths
    os.makedirs(ckpt_dir, exist_ok=True)
    step = int(state.step) if step is None else step
    path = os.path.join(ckpt_dir, f"step_{step:08d}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(state._asdict()), force=True)
    ckptr.wait_until_finished()
    return path


def restore_train_state(path: str, template) -> Any:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path, jax.device_get(template._asdict()))
    return type(template)(**restored)


def latest_checkpoint(ckpt_dir: str) -> str | None:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = sorted(
        d for d in os.listdir(ckpt_dir) if _STEP_DIR.fullmatch(d)
    )
    if not steps:
        return None
    # absolute: orbax rejects relative restore paths (relative log dirs
    # are valid CLI input)
    return os.path.abspath(os.path.join(ckpt_dir, steps[-1]))
