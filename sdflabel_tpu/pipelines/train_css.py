"""CSS network training pipeline.

Behavioral parity target: pipelines/train_css.py:12-116 — Adam over the
Crops dataloader, CE/MSE losses, per-epoch checkpoint + PNG dumps.

TPU design: the train step is jit-compiled once (engine.css_train) and
optionally data-parallel over the mesh; checkpoints are flax msgpack
(orbax-compatible params pytree) plus optional torch-format import.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from sdflabel_tpu import config as cfg_mod
from sdflabel_tpu.data.crops import Crops, prefetch_iterator
from sdflabel_tpu.engine import css_train
from sdflabel_tpu.models import css as css_mod


def save_checkpoint(path: str, variables) -> None:
    from flax import serialization

    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(variables)))


def load_checkpoint(path: str, template) -> dict:
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def setup_css(model_path: str | None = None, rng_seed: int = 0,
              width: int = 64, latent_size: int = 3):
    """Initialize (or load) CSS variables (resnet_css.py:265-296 analogue).

    model_path: .pt (torch state dict, imported; width must be 64 and
    latent_size 3 — the reference architecture) or .msgpack (ours, any
    width / latent size).
    """
    model = css_mod.CSSNet(use_running_average=True, width=width,
                           latent_size=latent_size)
    variables = model.init(
        jax.random.PRNGKey(rng_seed), jnp.zeros((1, 3, 128, 128))
    )
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
    if model_path and os.path.exists(model_path):
        if model_path.endswith(".pt"):
            variables = css_mod.load_torch_checkpoint(model_path)
            print("CSS net restored (torch checkpoint).")
        else:
            variables = load_checkpoint(model_path, variables)
            print("CSS net restored.")
    return variables


def _save_png(path, chw_array, normalize=True):
    from PIL import Image

    arr = np.asarray(chw_array)
    if arr.ndim == 4:  # grid of batch images side by side
        arr = np.concatenate(list(arr), axis=-1)
    img = np.transpose(arr, (1, 2, 0))
    if normalize:
        lo, hi = img.min(), img.max()
        img = (img - lo) / max(hi - lo, 1e-8)
    Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(path)


def train_css(cfgp, max_epochs: int | None = None, mesh=None):
    """Train the CSS network (train_css.py:12 entry point)."""
    cfg = cfg_mod.TrainCfg.from_ini(cfgp)
    # Fail fast on an unknown precision BEFORE touching data/checkpoints —
    # a typo here must not silently train fp32.
    if cfg.precision not in ("float32", "bfloat16", "float16"):
        raise ValueError(
            f"[train] precision must be float32|bfloat16|float16, got "
            f"{cfg.precision!r}")
    os.makedirs(cfg.log_dir, exist_ok=True)
    trainset = Crops(cfg.data_path,
                     seed=None if cfg.seed < 0 else cfg.seed,
                     fast=cfg.fast_input,
                     stage="uint8" if cfg.fast_input else "f32")
    if cfg.fast_input:
        # decode the whole DB once up front; epochs then augment from
        # the in-memory uint8 cache (data.crops fast backend). rgb ships
        # as raw uint8 pixels; engine.css_train normalizes on device.
        trainset.preload(num_threads=max(cfg.cpu_threads, 4))
    # latent head sized from the crops DB supervision (3 = the reference
    # architecture; in-framework DBs from make_crops may differ)
    latent_size = len(trainset.gt["0"][0]["latent"])
    variables = setup_css(cfg.css_path, latent_size=latent_size)

    state = css_train.init_train_state(variables, cfg.lr)

    # Auto-resume the FULL train state (params + opt state + step) from the
    # newest orbax checkpoint. The reference only ever saves params
    # (train_css.py:100) and restarts optimization from scratch; this
    # exceeds it per SURVEY.md §5 (checkpoint/resume row). Checkpoints are
    # indexed by epoch so the epoch loop (and its seed-per-epoch shuffle)
    # continues bit-identically.
    from sdflabel_tpu.utils import checkpoint as ckpt_mod

    ckpt_dir = os.path.join(cfg.log_dir, "ckpt")
    start_epoch = 0
    latest = ckpt_mod.latest_checkpoint(ckpt_dir)
    if latest is not None:
        state = ckpt_mod.restore_train_state(latest, state)
        start_epoch = int(os.path.basename(latest).split("_")[1])
        print(f"Resumed training from {latest} (epoch {start_epoch}).")

    # Mixed precision ([train] precision, validated above): bf16 conv
    # compute, fp32 params/BN/losses — the TPU analogue of torch AMP (the
    # reference trains fp32 CUDA). float32 default preserves reference
    # numerics; float16 maps to bf16 like the refine precision knob.
    train_model = css_mod.CSSNet(
        use_running_average=False, latent_size=latent_size,
        dtype=(jnp.bfloat16 if cfg.precision in ("bfloat16", "float16")
               else jnp.float32))
    # Fused Pallas CE ([train] fused_ce): TPU-only, and the kernel has no
    # partitioning rule — keep it off under a >1-device mesh.
    use_fused_ce = (cfg.fused_ce and jax.default_backend() == "tpu"
                    and (mesh is None or mesh.size == 1))
    step_fn = css_train.make_train_step(
        cfg.lr, model=train_model, fused_ce=use_fused_ce,
        direct_ce=getattr(cfg, "direct_ce", False))
    if mesh is not None:
        step_fn = css_train.shard_train_step(step_fn, mesh)
    else:
        step_fn = jax.jit(step_fn, donate_argnums=(0,))

    epochs = max_epochs if max_epochs is not None else cfg.epochs
    last_batch, last_pred_vis = None, None
    for epoch in range(start_epoch, epochs):
        trainset.set_epoch(epoch)
        # cpu_threads maps to worker PROCESSES when the aug stream is
        # seeded (the reference's num_workers are processes too,
        # train_css.py:42-45) — the PIL decode+augment chain is GIL-bound,
        # so threads cap near 1x single-core throughput (BENCH_NOTES r5).
        # The fast (cv2) backend releases the GIL and augments from the
        # preloaded cache, so it stays on THREADS — worker processes
        # would re-decode the DB per worker and pay IPC pickling.
        use_procs = (cfg.cpu_threads
                     if cfg.seed >= 0 and not cfg.fast_input else 0)
        for batch_idx, batch_np in enumerate(
            prefetch_iterator(trainset, cfg.batch_size,
                              num_threads=cfg.cpu_threads,
                              num_procs=use_procs, epoch=epoch,
                              queue_size=cfg.queue_size, shuffle=True,
                              seed=epoch)
        ):
            # uvw/mask upload as uint8 (labels < 256, mask 0/1): the
            # train step casts to int32 on device (css_losses), and the
            # int64 host arrays would otherwise dominate the
            # host->device batch upload 8:1 (BENCH_NOTES r5 e2e rows —
            # on a remote-dispatch link the upload is on the step path).
            batch = {
                k: jnp.asarray(v.astype(np.uint8)
                               if k in ("uvw", "mask") else v)
                for k, v in batch_np.items()
                if k in ("rgb", "uvw", "mask", "latent")
            }
            state, metrics = step_fn(state, batch)
            # float(...) forces a host sync; honoring log_every keeps
            # several steps in flight on remote-dispatch links.
            if (batch_idx + 1) % max(cfg.log_every, 1) == 0:
                print(
                    "Train Epoch: {} [{}/{}]\tLosses: global - {:.6f}, "
                    "uvw - {:.6f}, mask - {:.6f}, latent - {:.6f}".format(
                        epoch, batch_idx * len(batch_np["rgb"]),
                        len(trainset),
                        float(metrics["loss"]), float(metrics["loss_uvw"]),
                        float(metrics["loss_mask"]),
                        float(metrics["loss_latent"]),
                    )
                )
            last_batch = batch_np

        if (epoch + 1) % cfg.analyse_epoch == 0:
            net_dir = os.path.join(cfg.log_dir, "net")
            os.makedirs(net_dir, exist_ok=True)
            save_checkpoint(os.path.join(net_dir, "css.msgpack"),
                            state.variables)
            ckpt_mod.save_train_state(ckpt_dir, state, step=epoch + 1)
            if cfg.plot and last_batch is not None:
                vis_dir = os.path.join(cfg.log_dir, "vis")
                os.makedirs(vis_dir, exist_ok=True)
                model = css_mod.CSSNet(use_running_average=True)
                vis_rgb = np.asarray(last_batch["rgb"])
                if vis_rgb.dtype == np.uint8:  # fast_input uint8 staging
                    from sdflabel_tpu.data.crops import (IMAGENET_MEAN,
                                                         IMAGENET_STD)
                    vis_rgb = (vis_rgb.astype(np.float32) / 255.0
                               - IMAGENET_MEAN.reshape(3, 1, 1)) \
                        / IMAGENET_STD.reshape(3, 1, 1)
                pred = model.apply(state.variables, jnp.asarray(vis_rgb))
                masked = np.asarray(pred["uvw_sm_masked"])
                _save_png(os.path.join(vis_dir, f"uvw_predsm_{epoch}.png"),
                          masked)
                _save_png(os.path.join(vis_dir, f"uvw_gt{epoch}.png"),
                          last_batch["uvw"].astype(np.float32) / 255.0)
                _save_png(os.path.join(vis_dir, f"uvw_gt_rgb{epoch}.png"),
                          last_batch["rgb"])
    return state
