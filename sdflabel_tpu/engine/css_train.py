"""CSS network training: losses, train step, data-parallel sharding.

Behavioral parity target: pipelines/train_css.py:29-91 —
  * Adam over all parameters at cfg lr (train_css.py:29; frozen early
    layers get zero updates via an optax mask, matching requires_grad=False
    at resnet_css.py:156-158)
  * losses (train_css.py:70-80):
      loss_u/v/w = CE(logits * mask_ext, target * mask)   [note: the
        reference feeds log-softmax outputs re-masked back through CE's
        internal log-softmax — reproduced exactly]
      loss_mask = 2 * CE(mask_logits, mask_gt)
      loss_latent = MSE(latent_pred.squeeze(0), latent_gt)

TPU design: the train step is one pjit'd function; the batch is sharded
over the mesh 'data' axis and parameters are replicated — XLA inserts the
gradient psum automatically from the sharding annotations (no hand-written
collectives). Because jit programs have GLOBAL (single-logical-device)
semantics, BatchNorm batch statistics reduce over the full global batch
(XLA inserts the cross-chip all-reduce) — i.e. sync-BN over the same
batch-of-13 the reference's single GPU normalizes over, which is exactly
why the dp step matches the single-device step bit-for-bit
(test_train_and_parallel.py).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from sdflabel_tpu.models import css as css_mod


class TrainState(NamedTuple):
    variables: Any  # {'params', 'batch_stats'}
    opt_state: Any
    step: jax.Array


def cross_entropy_with_internal_softmax(logits, targets, class_axis=1):
    """torch nn.CrossEntropyLoss(mean) on raw inputs: applies log_softmax
    internally even if the inputs are already log-probabilities.

    TPU note: the class pick is a one-hot masked reduction, not
    take_along_axis — value-identical (the sum has exactly one nonzero
    term), but gather/scatter lowers to serial windows on TPU (profiled
    at 3.4 ms per (13,256,128,128) pick; the compare+select+reduce
    fuses into one pass over the log-probs).
    """
    logp = jax.nn.log_softmax(logits, axis=class_axis)
    tgt = jnp.expand_dims(targets, class_axis)
    iota = jax.lax.broadcasted_iota(tgt.dtype, logp.shape, class_axis)
    picked = jnp.sum(
        jnp.where(iota == tgt, logp, 0.0), axis=class_axis
    )
    return -jnp.mean(picked)


def css_losses(pred: dict, batch: dict, fused_ce: bool = False,
               direct_ce: bool = False) -> dict:
    """All training loss terms (train_css.py:70-80).

    fused_ce=True routes each CE tower through the fused Pallas kernel
    (ops.ce_pallas — one streaming pass, no materialized log-probs) when
    the shape is kernel-supported; semantics are identical (same
    internal log-softmax, mean over all pixels). TPU-only: callers gate
    on the backend.

    direct_ce=True: feeds the heads' RAW logits to the CE towers instead
    of their log-softmax outputs. This is an EXACT rewrite, not an
    objective change: log_softmax is idempotent (logsumexp of a
    log-softmax output is 0, so CE's internal log_softmax maps the
    model's log-probs to themselves), and the mask multiply behaves
    identically on raw logits (zeroed rows pick a constant log(1/256)
    with zero gradient either way). Measured: loss delta exactly 0 in
    fp32, gradient max|Δ| ~1e-10 (test_direct_ce_mode). What changes is
    the COMPILED program: the model-side u/v/w log-softmax towers carry
    no loss terms and XLA dead-code eliminates them — the reference's
    formulation (train_css.py:70-74) computes each 256-channel
    log-softmax twice for nothing.
    """
    # int32 (labels < 256): int64 is unavailable under default JAX config
    # and would silently truncate with a per-trace warning
    mask_gt = batch["mask"].astype(jnp.int32)  # (B,H,W)
    uvw_gt = batch["uvw"].astype(jnp.int32)  # (B,3,H,W)
    mask_ext = mask_gt[:, None].astype(pred["u"].dtype)  # (B,1,H,W)

    ce = cross_entropy_with_internal_softmax
    if fused_ce:
        from sdflabel_tpu.ops import ce_pallas

        def ce(logits, targets):  # noqa: F811
            if ce_pallas.supported(logits.shape, targets.shape):
                return ce_pallas.fused_cross_entropy(logits, targets)
            return cross_entropy_with_internal_softmax(logits, targets)

    uk, vk, wk = (("u_raw", "v_raw", "w_raw") if direct_ce
                  else ("u", "v", "w"))
    loss_u = ce(pred[uk] * mask_ext, uvw_gt[:, 0] * mask_gt)
    loss_v = ce(pred[vk] * mask_ext, uvw_gt[:, 1] * mask_gt)
    loss_w = ce(pred[wk] * mask_ext, uvw_gt[:, 2] * mask_gt)
    loss_uvw = loss_u + loss_v + loss_w
    loss_mask = ce(pred["mask"], mask_gt) * 2.0
    loss_latent = jnp.mean(
        jnp.square(pred["latent"] - batch["latent"].astype(pred["latent"].dtype))
    )
    total = loss_uvw + loss_latent + loss_mask
    return {
        "loss": total,
        "loss_uvw": loss_uvw,
        "loss_mask": loss_mask,
        "loss_latent": loss_latent,
    }


def default_fused_ce() -> bool:
    """Production default for the fused Pallas CE kernel: OFF.

    Measured on the real v5e (round 3, scripts/measure_fused_ce.py,
    reference batch-13 128x128 step): jnp CE 36.26 ms/step vs fused
    kernel 38.69 ms/step — a 0.94x NON-win. The kernel's fwd+bwd reads
    the logits twice plus one write, which is the same HBM traffic as
    XLA's already-fused log-softmax towers, and the per-block accumulator
    adds grid overhead. Value parity is exact to fp32 reduction order
    (loss delta 4e-6 at step 0). Kept opt-in (`[train] fused_ce`) for
    regimes with more classes per pixel where the no-materialized-
    log-probs property would dominate. See BENCH_NOTES.md "Fused CE"."""
    return False


def make_optimizer(lr: float, params: Any) -> optax.GradientTransformation:
    """Adam with frozen early layers (conv1/bn1/layer1).

    multi_transform + set_to_zero (NOT optax.masked, which passes raw
    gradients through for masked-out leaves)."""
    labels = jax.tree.map(
        lambda trainable: "train" if trainable else "freeze",
        css_mod.trainable_mask(params),
    )
    return optax.multi_transform(
        {"train": optax.adam(lr), "freeze": optax.set_to_zero()}, labels
    )


def init_train_state(variables: Any, lr: float) -> TrainState:
    opt = make_optimizer(lr, variables["params"])
    return TrainState(
        variables=variables,
        opt_state=opt.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )


def make_train_step(lr: float, sm_hardness: float = 100.0, model=None,
                    fused_ce: bool = False, direct_ce: bool = False):
    """Build the jittable train step: (state, batch) -> (state, metrics).

    model: optional flax module (e.g. css_fused.CSSNetFused for the
    grouped-conv fused-head variant); defaults to the canonical CSSNet.
    fused_ce: route the CE towers through the fused Pallas kernel
    (ops.ce_pallas). TPU-only; the kernel is not auto-partitionable, so it
    must stay off when the step is pjit-sharded over a >1-device mesh
    (shard_train_step raises on that combination).
    direct_ce: opt-in non-parity CE on raw logits (see css_losses).
    """
    if model is None:
        model = css_mod.CSSNet(use_running_average=False,
                               sm_hardness=sm_hardness)

    def train_step(state: TrainState, batch: dict):
        opt = make_optimizer(lr, state.variables["params"])

        rgb = batch["rgb"]
        if rgb.dtype == jnp.uint8:
            # Device-side ImageNet normalization: the host ships the
            # jittered pixels as uint8 (4x smaller step-critical
            # host->device upload; data.crops stage="uint8") and the
            # device computes the exact (x/255 - mean)/std the host
            # path computes, in the same fp32 — value-identical to the
            # host-normalized float batch (test_crops_fast).
            from sdflabel_tpu.data.crops import IMAGENET_MEAN, IMAGENET_STD

            rgb = (rgb.astype(jnp.float32) / 255.0
                   - jnp.asarray(IMAGENET_MEAN).reshape(3, 1, 1)) \
                / jnp.asarray(IMAGENET_STD).reshape(3, 1, 1)

        def loss_fn(params):
            pred, updates = model.apply(
                {"params": params,
                 "batch_stats": state.variables["batch_stats"]},
                rgb,
                mutable=["batch_stats"],
            )
            losses = css_losses(pred, batch, fused_ce=fused_ce,
                                direct_ce=direct_ce)
            return losses["loss"], (losses, updates["batch_stats"])

        (loss, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.variables["params"])
        updates, new_opt_state = opt.update(
            grads, state.opt_state, state.variables["params"]
        )
        new_params = optax.apply_updates(state.variables["params"], updates)
        new_state = TrainState(
            variables={"params": new_params, "batch_stats": new_stats},
            opt_state=new_opt_state,
            step=state.step + 1,
        )
        return new_state, metrics

    # inspected by shard_train_step: the Pallas CE kernel cannot be
    # partitioned over a >1-device mesh
    train_step.uses_fused_ce = fused_ce

    return train_step


def shard_train_step(train_step, mesh):
    """Data-parallel pjit: batch sharded over 'data', state replicated.

    XLA derives the gradient all-reduce from the shardings (SURVEY.md §2.D:
    replaces the reference's absent DP with mesh-native psum).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    if getattr(train_step, "uses_fused_ce", False) and mesh.size > 1:
        raise ValueError(
            "fused_ce is not partitionable over a >1-device mesh — build "
            "the step with make_train_step(fused_ce=False) for sharded "
            "training (the jnp CE path is value-identical)")

    replicated = NamedSharding(mesh, P())
    batch_sharded = NamedSharding(mesh, P("data"))

    return jax.jit(
        train_step,
        in_shardings=(replicated, batch_sharded),
        out_shardings=(replicated, replicated),
        donate_argnums=(0,),
    )
