"""Fused Pallas cross-entropy for the CSS training losses.

Why this kernel exists: the CSS train step's remaining profile mass after
the one-hot pick fix (see BENCH_NOTES.md "CSS training") is the
loss-side log-softmax towers and the logits-gradient pass over the
(B, 256, H, W) class towers — XLA materializes the full log-probability
tensor between the reduce and the pick, and the backward re-streams it.
This kernel computes torch-``nn.CrossEntropyLoss(mean)`` semantics
(reference train_css.py:70-80 via engine.css_train) in ONE streaming
read of the logits forward (block-local max/exp/sum + target pick, no
materialized log-probs) and one read + one write backward
(softmax - one_hot, rescaled by the upstream cotangent), both entirely
in fp32 on-chip.

Semantics: exactly ``css_train.cross_entropy_with_internal_softmax``:
``-mean(log_softmax(logits, class_axis)[target])`` over every non-class
position — including the reference's double-log-softmax quirk (callers
pass already-log-softmaxed, mask-multiplied heads; the kernel just
applies CE's internal log-softmax again, QUIRKS ledger item 11). Values
match the jnp path to fp32 reduction-order tolerance; gradients are the
analytic ``(softmax - one_hot) / N``.

Layout: logits arrive NCHW (the model's torch-parity boundary layout,
models/css.py `to_nchw`). Blocks are (C, bh, W) with the class axis
leading — class reductions are vreg-wise accumulations over the leading
dim, pixels stay on the native (sublane, lane) = (bh, W) tile. `W` must
be a multiple of 128 lanes and `H` of the 8-row sublane tile (the CSS
crop is 128x128); `supported()` says no otherwise and callers fall back
to the jnp path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BH = 8  # pixel-row block: one (8, 128) sublane tile per vreg


def supported(logits_shape, targets_shape) -> bool:
    """Kernel contract: NCHW logits, (B, H, W) integer targets, H % 8 == 0,
    W % 128 == 0. The class count is free (looped over vregs)."""
    if len(logits_shape) != 4 or len(targets_shape) != 3:
        return False
    b, _, h, w = logits_shape
    return (tuple(targets_shape) == (b, h, w)
            and h % _BH == 0 and w % 128 == 0)


def _fwd_kernel(x_ref, t_ref, out_ref):
    x = x_ref[0].astype(jnp.float32)  # (C, bh, W)
    t = t_ref[0]  # (bh, W) int32
    m = jnp.max(x, axis=0)
    s = jnp.sum(jnp.exp(x - m[None]), axis=0)
    lse = m + jnp.log(s)
    iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    picked = jnp.sum(jnp.where(iota == t[None], x, 0.0), axis=0)
    contrib = lse - picked  # (bh, W) per-pixel CE terms
    # Per-image (bh, W) accumulator block, revisited across the row-block
    # axis j (innermost grid dim -> the block stays VMEM-resident between
    # steps). Mosaic rejects sub-(8,128) output tiles on hardware, so the
    # partial sums keep the native pixel tile instead of a scalar per
    # block (the (1, 1) SMEM output only ever worked in interpret mode).
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        out_ref[0] = contrib

    @pl.when(j != 0)
    def _acc():
        out_ref[0] += contrib


def _bwd_kernel(x_ref, t_ref, g_ref, dx_ref):
    x = x_ref[0].astype(jnp.float32)  # (C, bh, W)
    t = t_ref[0]
    m = jnp.max(x, axis=0)
    s = jnp.sum(jnp.exp(x - m[None]), axis=0)
    lse = m + jnp.log(s)
    p = jnp.exp(x - lse[None])  # softmax
    iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    one_hot = (iota == t[None]).astype(jnp.float32)
    dx_ref[0] = ((p - one_hot) * g_ref[0]).astype(dx_ref.dtype)


def _block_call(kernel, logits, targets, extra, out_shape, out_specs):
    b, c, h, w = logits.shape
    grid = (b, h // _BH)
    in_specs = [
        pl.BlockSpec((1, c, _BH, w), lambda i, j: (i, 0, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, _BH, w), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [logits, targets]
    if extra is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(extra)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=5 * b * c * h * w,
            bytes_accessed=(logits.size * logits.dtype.itemsize
                            + targets.size * 4),
            transcendentals=b * c * h * w,
        ),
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_cross_entropy(logits, targets):
    """torch nn.CrossEntropyLoss(mean) over NCHW logits — fused kernel.

    Drop-in for css_train.cross_entropy_with_internal_softmax(class_axis=1)
    on shapes passing `supported()`. Differentiable w.r.t. logits only.
    """
    return _fwd_value(logits, targets)


def _fwd_value(logits, targets):
    b, _, h, w = logits.shape
    partial = _block_call(
        _fwd_kernel, logits, targets.astype(jnp.int32), None,
        out_shape=jax.ShapeDtypeStruct((b, _BH, w), jnp.float32),
        out_specs=pl.BlockSpec((1, _BH, w), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return jnp.sum(partial) / (b * h * w)


def _fwd(logits, targets):
    return _fwd_value(logits, targets), (logits, targets)


def _bwd(res, g):
    logits, targets = res
    b, c, h, w = logits.shape
    scale = (g / (b * h * w)).astype(jnp.float32).reshape(1)
    dx = _block_call(
        _bwd_kernel, logits, targets.astype(jnp.int32), scale,
        out_shape=jax.ShapeDtypeStruct(logits.shape, logits.dtype),
        out_specs=pl.BlockSpec((1, c, _BH, w), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
    )
    return dx, None


fused_cross_entropy.defvjp(_fwd, _bwd)
