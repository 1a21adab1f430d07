"""DeepSDF decoder training pipeline (experiment-directory driver).

The reference loads externally-trained DeepSDF decoders
(sdfrenderer/deepsdf/workspace.py:38-72); this pipeline produces those
checkpoints in-framework. It follows the external trainer's experiment
conventions — ``specs.json`` (NetworkSpecs + schedule keys), a
``TrainSplit`` json resolving to ``SdfSamples`` npz scenes — and writes:

  * ``ModelParameters/<checkpoint>.pth``  {'epoch', 'model_state_dict'}
  * ``LatentCodes/<checkpoint>.pth``      {'epoch', 'latent_codes'}
  * ``<experiment>/deepsdf.pt`` + ``deepsdf.json`` — the single-file
    convention consumed directly by setup_dsdf / the refine pipeline.

Run: ``python -m sdflabel_tpu.pipelines.train_deepsdf EXPERIMENT_DIR``
(optionally ``--data SOURCE --devices N``).

TPU design: the whole step (subsampling included) is one jitted program
(engine/deepsdf_train.py); scenes shard data-parallel over the mesh.
Resume: full train state (decoder + code table + optimizer moments +
step) via orbax under ``Checkpoints/``, auto-resumed on restart —
exceeds the external trainer, which restores params only.
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from sdflabel_tpu.data import sdf_samples
from sdflabel_tpu.engine import deepsdf_train
from sdflabel_tpu.utils import checkpoint as ckpt_mod
from sdflabel_tpu.models import deepsdf, deepsdf_workspace as ws


def save_reference_checkpoints(experiment_dir: str, cfg, state,
                               names, checkpoint: str = "latest",
                               epoch: int = 0) -> None:
    """Write ModelParameters/LatentCodes in the reference layout plus the
    single-file pair at the experiment root."""
    import torch

    params = jax.device_get(state.params)
    mdir = ws.get_model_params_dir(experiment_dir, True)
    state_dict = {
        k: torch.from_numpy(np.array(v))
        for k, v in deepsdf.torch_state_from_params(cfg, params).items()
    }
    torch.save({"epoch": epoch, "model_state_dict": state_dict},
               os.path.join(mdir, checkpoint + ".pth"))
    ldir = ws.get_latent_codes_dir(experiment_dir, True)
    codes = torch.from_numpy(np.array(jax.device_get(state.codes)))
    torch.save({"epoch": epoch, "latent_codes": codes,
                "instance_names": list(names)},
               os.path.join(ldir, checkpoint + ".pth"))
    deepsdf.save_torch_checkpoint(
        os.path.join(experiment_dir, "deepsdf.pt"), cfg, params, epoch=epoch)


def _ckpt_dir(experiment_dir: str) -> str:
    return os.path.join(experiment_dir, "Checkpoints")


# Thin wrappers over the shared generic orbax helpers (utils/checkpoint):
# the experiment-dir layout puts resume state under Checkpoints/.


def save_resume_state(experiment_dir: str, state) -> str:
    return ckpt_mod.save_train_state(_ckpt_dir(experiment_dir), state)


def restore_resume_state(path: str, template):
    return ckpt_mod.restore_train_state(path, template)


def latest_resume_state(experiment_dir: str) -> str | None:
    return ckpt_mod.latest_checkpoint(_ckpt_dir(experiment_dir))


def train_deepsdf(
    experiment_dir: str,
    data_source: str | None = None,
    num_epochs: int | None = None,
    mesh=None,
    seed: int = 0,
    log_every: int = 10,
    resume: bool = True,
    scales: dict[str, float] | None = None,
) -> deepsdf_train.DeepSDFTrainState:
    """Train a decoder per the experiment dir's specs.json. Returns the
    final train state (decoder params in models/deepsdf.py layout)."""
    specs = ws.load_experiment_specifications(experiment_dir)
    cfg = deepsdf.DeepSDFConfig.from_specs(specs)
    tcfg = deepsdf_train.DeepSDFTrainConfig.from_specs(specs)
    data_source = data_source or specs.get("DataSource", experiment_dir)
    split = sdf_samples.load_split_file(
        os.path.join(experiment_dir, specs["TrainSplit"])
        if not os.path.isabs(specs["TrainSplit"]) else specs["TrainSplit"])
    pack = sdf_samples.load_scene_pack(data_source, split, scales=scales)
    num_epochs = int(num_epochs or specs.get("NumEpochs", 100))
    snapshot_every = int(specs.get("SnapshotFrequency", max(1, num_epochs)))

    n = pack.num_scenes
    bsz = min(tcfg.scenes_per_batch, n)
    steps_per_epoch = max(1, n // bsz)

    key = jax.random.PRNGKey(seed)
    key, k_init = jax.random.split(key)
    state = deepsdf_train.init_train_state(cfg, tcfg, n, steps_per_epoch,
                                           k_init)
    step_fn = deepsdf_train.make_train_step(cfg, tcfg, steps_per_epoch)
    if mesh is not None:
        step_fn = deepsdf_train.shard_train_step(step_fn, mesh)
        if bsz % mesh.shape["data"] != 0:
            raise ValueError(
                f"scenes_per_batch {bsz} must divide over the mesh "
                f"({mesh.shape['data']} data shards)")
    else:
        step_fn = jax.jit(step_fn, donate_argnums=(0,))

    start_epoch = 0
    if resume:
        latest = latest_resume_state(experiment_dir)
        if latest is not None:
            state = restore_resume_state(latest, state)
            start_epoch = int(state.step) // steps_per_epoch
            print(f"resumed from {latest} (epoch {start_epoch})")

    pos = jnp.asarray(pack.pos)
    neg = jnp.asarray(pack.neg)
    pos_count = jnp.asarray(pack.pos_count)
    neg_count = jnp.asarray(pack.neg_count)
    sc = jnp.asarray(pack.scales)

    metrics: dict[str, Any] = {}
    for epoch in range(start_epoch, num_epochs):
        # host-side epoch shuffle of scene order (external DataLoader
        # analogue); deterministic in (seed, epoch) for exact resume
        order = np.random.RandomState(seed * 100003 + epoch).permutation(n)
        t0 = time.time()
        for s in range(steps_per_epoch):
            scene_idx = jnp.asarray(order[s * bsz:(s + 1) * bsz], jnp.int32)
            # the step key derives from (seed, global step) so resumed
            # runs consume the identical key stream
            k_step = jax.random.fold_in(jax.random.PRNGKey(seed + 1),
                                        epoch * steps_per_epoch + s)
            state, metrics = step_fn(state, pos, neg, pos_count, neg_count,
                                     sc, scene_idx, k_step)
        if (epoch + 1) % log_every == 0 or epoch == num_epochs - 1:
            m = {k: float(v) for k, v in metrics.items()}
            print(f"epoch {epoch + 1}/{num_epochs} "
                  f"loss={m['loss']:.6f} l1={m['loss_l1']:.6f} "
                  f"reg={m['loss_reg']:.2e} scale={m['loss_scale']:.2e} "
                  f"|z|={m['code_norm']:.3f} "
                  f"({time.time() - t0:.1f}s/epoch)")
        if (epoch + 1) % snapshot_every == 0 or epoch == num_epochs - 1:
            save_reference_checkpoints(experiment_dir, cfg, state,
                                       pack.names, "latest",
                                       epoch=epoch + 1)
            save_resume_state(experiment_dir, state)
    return state


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("experiment_dir")
    ap.add_argument("--data", default=None, help="data source override")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--devices", type=int, default=0,
                    help="data-parallel over N devices (0 = single)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args(argv)
    mesh = None
    if args.devices > 1:
        from sdflabel_tpu.parallel import mesh as mesh_mod

        mesh = mesh_mod.make_mesh(devices=jax.devices()[:args.devices])
    train_deepsdf(args.experiment_dir, data_source=args.data,
                  num_epochs=args.epochs, mesh=mesh, seed=args.seed,
                  resume=not args.no_resume)


if __name__ == "__main__":
    main()
