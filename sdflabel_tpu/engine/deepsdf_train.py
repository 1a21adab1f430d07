"""DeepSDF decoder training: joint decoder + latent-code optimization.

The reference consumes decoders trained by the external DeepSDF trainer
(its checkpoints load via sdfrenderer/deepsdf/workspace.py:38-72 and
:167-188); sdflabel itself ships no trainer. This module reproduces that
trainer's semantics for the sdflabel decoder variant (scale head
included, deep_sdf_decoder_scale.py:68-75), so the framework can produce
its own `deepsdf.pt` end to end:

  * auto-decoder objective: per-scene latent codes (an embedding table)
    are optimized jointly with the decoder weights,
  * clamped-L1 data term: |clamp(pred, ±d) - clamp(gt, ±d)| summed over
    the step's samples / num_samples (ClampingDistance),
  * code regularization: lambda * min(1, epoch/100) * mean_scenes ||z||
    (CodeRegularizationLambda with its epoch-100 warmup; the external
    trainer sums per-ROW latent norms over B*S rows / num_sdf_samples,
    which reduces to the per-scene mean norm),
  * code init N(0, (CodeInitStdDev/sqrt(L))^2), optional CodeBound
    max-norm projection after each step,
  * two Adam groups (decoder lr / codes lr) with staircase step decay
    (StepLearningRateSchedule: lr * factor^(epoch // interval)),
  * optional scale-head supervision (sdflabel extension): MSE between
    apply_scale(code) and a per-scene metric scale where provided.

TPU design: one jitted step does EVERYTHING including the per-scene
subsampling — half positive / half negative rows drawn with replacement
(the external unpack_sdf_samples semantics) from a fixed-shape ScenePack
via jax.random.randint, so shapes are static and there is no host-side
sampling loop. The decode is a single (B*S, L+3) matmul chain (MXU-
friendly), and the step data-parallel-shards over the mesh 'data' axis
with the code table replicated (XLA derives the gradient all-reduce from
the shardings, engine/css_train.py:165-181 pattern).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sdflabel_tpu.models import deepsdf


@dataclasses.dataclass(frozen=True)
class DeepSDFTrainConfig:
    """Training hyper-parameters (external specs.json naming in parens)."""

    samples_per_scene: int = 16384    # SamplesPerScene
    scenes_per_batch: int = 64        # ScenesPerBatch
    clamp_dist: float = 0.1           # ClampingDistance
    code_reg: bool = True             # CodeRegularization
    code_reg_lambda: float = 1e-4     # CodeRegularizationLambda
    code_init_std: float = 1.0        # CodeInitStdDev (std = this/sqrt(L))
    code_bound: float | None = None   # CodeBound (max-norm projection)
    lr_decoder: float = 5e-4          # LearningRateSchedule[0].Initial
    lr_codes: float = 1e-3            # LearningRateSchedule[1].Initial
    lr_interval: int = 500            # [0].Interval (epochs)
    lr_factor: float = 0.5            # [0].Factor
    lr_interval_codes: int = 500      # [1].Interval (epochs)
    lr_factor_codes: float = 0.5      # [1].Factor
    scale_weight: float = 0.0         # sdflabel extension: scale-head MSE
    # GradientNormClipping: the external trainer clips the DECODER
    # parameters only (torch clip_grad_norm_(decoder.parameters())) —
    # latent-code gradients are never clipped.
    grad_clip: float | None = None

    @classmethod
    def from_specs(cls, specs: dict) -> "DeepSDFTrainConfig":
        """Read the external trainer's specs.json keys (missing -> defaults)."""
        kw: dict[str, Any] = {}
        if "SamplesPerScene" in specs:
            kw["samples_per_scene"] = int(specs["SamplesPerScene"])
        if "ScenesPerBatch" in specs:
            kw["scenes_per_batch"] = int(specs["ScenesPerBatch"])
        if "ClampingDistance" in specs:
            kw["clamp_dist"] = float(specs["ClampingDistance"])
        if "CodeRegularization" in specs:
            kw["code_reg"] = bool(specs["CodeRegularization"])
        if "CodeRegularizationLambda" in specs:
            kw["code_reg_lambda"] = float(specs["CodeRegularizationLambda"])
        if "CodeInitStdDev" in specs:
            kw["code_init_std"] = float(specs["CodeInitStdDev"])
        if "CodeBound" in specs and specs["CodeBound"] is not None:
            kw["code_bound"] = float(specs["CodeBound"])
        sched = specs.get("LearningRateSchedule")
        if sched:
            kw["lr_decoder"] = float(sched[0].get("Initial", cls.lr_decoder))
            kw["lr_interval"] = int(sched[0].get("Interval", cls.lr_interval))
            kw["lr_factor"] = float(sched[0].get("Factor", cls.lr_factor))
            if len(sched) > 1:
                kw["lr_codes"] = float(sched[1].get("Initial", cls.lr_codes))
                kw["lr_interval_codes"] = int(
                    sched[1].get("Interval", cls.lr_interval_codes))
                kw["lr_factor_codes"] = float(
                    sched[1].get("Factor", cls.lr_factor_codes))
        if specs.get("GradientNormClipping") is not None:
            kw["grad_clip"] = float(specs["GradientNormClipping"])
        if "ScaleSupervisionWeight" in specs:  # sdflabel_tpu extension key
            kw["scale_weight"] = float(specs["ScaleSupervisionWeight"])
        return cls(**kw)


class DeepSDFTrainState(NamedTuple):
    params: Any          # decoder pytree (models/deepsdf.py layout)
    codes: jax.Array     # (num_scenes, L) latent table
    opt_state: Any
    step: jax.Array      # global step counter (drives the lr schedule)


def init_codes(num_scenes: int, latent_size: int, key: jax.Array,
               code_init_std: float = 1.0) -> jax.Array:
    """N(0, (std/sqrt(L))^2) initialization of the latent table."""
    return (jax.random.normal(key, (num_scenes, latent_size), jnp.float32)
            * (code_init_std / np.sqrt(latent_size)))


def make_optimizer(tcfg: DeepSDFTrainConfig, steps_per_epoch: int):
    """Two Adam groups with the staircase epoch-interval decay.

    The external trainer applies lr * factor^(epoch // interval) with
    1-BASED epochs at the top of each epoch, so the decayed rate is live
    for the whole of 1-based epoch `interval` — hence the +1 below (a
    plain optax staircase on step count would decay one epoch late).
    Gradient clipping wraps the decoder group only (the reference clips
    decoder.parameters(); code gradients are never clipped).
    """
    spe = max(1, steps_per_epoch)

    def sched(initial, interval, factor):
        def lr(count):
            epoch_1based = count // spe + 1
            return initial * jnp.power(
                factor, (epoch_1based // max(1, interval)).astype(
                    jnp.float32))

        return lr

    def group(initial, interval, factor, clip):
        tx = optax.adam(sched(initial, interval, factor))
        if clip is not None:
            tx = optax.chain(optax.clip_by_global_norm(clip), tx)
        return tx

    return optax.multi_transform(
        {"dec": group(tcfg.lr_decoder, tcfg.lr_interval, tcfg.lr_factor,
                      tcfg.grad_clip),
         "codes": group(tcfg.lr_codes, tcfg.lr_interval_codes,
                        tcfg.lr_factor_codes, None)},
        lambda pc: (jax.tree.map(lambda _: "dec", pc[0]), "codes"),
    )


def init_train_state(cfg: deepsdf.DeepSDFConfig, tcfg: DeepSDFTrainConfig,
                     num_scenes: int, steps_per_epoch: int,
                     key: jax.Array) -> DeepSDFTrainState:
    kp, kc = jax.random.split(key)
    params = deepsdf.init_params(cfg, kp)
    codes = init_codes(num_scenes, cfg.latent_size, kc, tcfg.code_init_std)
    opt = make_optimizer(tcfg, steps_per_epoch)
    return DeepSDFTrainState(
        params=params, codes=codes,
        opt_state=opt.init((params, codes)),
        step=jnp.zeros((), jnp.int32),
    )


def make_train_step(cfg: deepsdf.DeepSDFConfig, tcfg: DeepSDFTrainConfig,
                    steps_per_epoch: int):
    """Build the jittable step:
    (state, pack_arrays, scene_idx, rng) -> (state, metrics).

    pack_arrays = (pos, neg, pos_count, neg_count, scales) — the device-
    resident ScenePack tensors. scene_idx is the step's (scenes_per_batch,)
    scene draw (host-side epoch shuffling, like the external DataLoader).
    The epoch used by the code-reg warmup is derived from state.step.
    """
    opt = make_optimizer(tcfg, steps_per_epoch)
    S = tcfg.samples_per_scene
    half = S // 2
    use_dropout = bool(cfg.dropout) or cfg.latent_dropout

    def train_step(state: DeepSDFTrainState, pos, neg, pos_count, neg_count,
                   scales, scene_idx, rng):
        B = scene_idx.shape[0]
        k_pos, k_neg, k_drop = jax.random.split(rng, 3)
        epoch = state.step // steps_per_epoch

        def draw(rows, counts, key, n_draw):
            # with-replacement draw of n_draw rows per scene from the
            # scene's true row population (pad rows repeat true rows, so
            # sampling below `count` is exact and static-shape)
            cnt = jnp.take(counts, scene_idx, axis=0)  # (B,)
            idx = jax.random.randint(key, (B, n_draw), 0, cnt[:, None])
            scene_rows = jnp.take(rows, scene_idx, axis=0)  # (B, P, 4)
            return jnp.take_along_axis(
                scene_rows, idx[:, :, None], axis=1)  # (B, n_draw, 4)

        samp = jnp.concatenate(
            [draw(pos, pos_count, k_pos, half),
             draw(neg, neg_count, k_neg, S - half)], axis=1)  # (B, S, 4)
        xyz = samp[..., :3]
        sdf_gt = jnp.clip(samp[..., 3], -tcfg.clamp_dist, tcfg.clamp_dist)
        num = B * S

        def loss_fn(params, codes):
            z = jnp.take(codes, scene_idx, axis=0)  # (B, L)
            inputs = jnp.concatenate(
                [jnp.broadcast_to(z[:, None, :], (B, S, cfg.latent_size)),
                 xyz], axis=-1).reshape(num, cfg.latent_size + 3)
            pred = deepsdf.apply_sdf(
                cfg, params, inputs,
                dropout_rng=k_drop if use_dropout else None)
            pred = jnp.clip(pred, -tcfg.clamp_dist, tcfg.clamp_dist)
            l1 = jnp.sum(jnp.abs(pred - sdf_gt.reshape(-1))) / num
            reg = 0.0
            if tcfg.code_reg:
                warm = jnp.minimum(1.0, (epoch + 1).astype(jnp.float32)
                                   / 100.0)
                # external trainer: sum ||z_row|| over the B*S per-sample
                # latent rows / num_sdf_samples — each scene contributes S
                # identical rows, so the term reduces to mean_scenes ||z||
                reg = (tcfg.code_reg_lambda * warm
                       * jnp.mean(jnp.linalg.norm(z, axis=-1)))
            lsc = 0.0
            if tcfg.scale_weight > 0.0:
                tgt = jnp.take(scales, scene_idx, axis=0)  # (B,)
                ok = jnp.isfinite(tgt)
                # double-where: NaN targets must not reach the residual or
                # their NaN would leak through the backward of the outer
                # where (engine/losses.py convention)
                tgt_safe = jnp.where(ok, tgt, 0.0)
                pred_sc = jax.vmap(
                    lambda zz: deepsdf.apply_scale(cfg, params, zz)[0])(z)
                se = jnp.where(ok, jnp.square(pred_sc - tgt_safe), 0.0)
                lsc = (tcfg.scale_weight * jnp.sum(se)
                       / jnp.maximum(jnp.sum(ok), 1))
            total = l1 + reg + lsc
            return total, {"loss": total, "loss_l1": l1, "loss_reg": reg,
                           "loss_scale": lsc,
                           "code_norm": jnp.mean(
                               jnp.linalg.norm(z, axis=-1))}

        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(state.params, state.codes)
        updates, new_opt = opt.update(grads, state.opt_state,
                                      (state.params, state.codes))
        new_params, new_codes = optax.apply_updates(
            (state.params, state.codes), updates)
        if tcfg.code_bound is not None:
            norms = jnp.linalg.norm(new_codes, axis=-1, keepdims=True)
            new_codes = new_codes * jnp.minimum(
                1.0, tcfg.code_bound / jnp.maximum(norms, 1e-12))
        return DeepSDFTrainState(new_params, new_codes, new_opt,
                                 state.step + 1), metrics

    return train_step


def shard_train_step(train_step, mesh):
    """Data-parallel pjit over the scene axis: scene_idx and the rng are
    per-step inputs; the ScenePack tensors and the state (decoder params,
    code table, optimizer moments) are replicated. XLA derives the
    cross-chip gradient all-reduce from the shardings (same pattern as
    css_train.shard_train_step). The step is one logical jit program, so
    sharding the scene axis leaves the sample draw and the update
    bit-identical to the single-device step."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    scene_sharded = NamedSharding(mesh, P("data"))
    return jax.jit(
        train_step,
        in_shardings=(rep, rep, rep, rep, rep, rep, scene_sharded, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )
