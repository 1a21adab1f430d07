"""DeepSDF experiment-directory conventions + checkpoint loading.

Behavioral parity target: sdfrenderer/deepsdf/workspace.py — the DeepSDF
experiment layout (:10-22), specs loading (:26-35), decoder/state loading
(:38-72), latent-code loading (:75-92), directory helpers (:95-165), and
the single-file `setup_dsdf` convention (:167-188).

`setup_dsdf` here returns (DeepSDFConfig, params pytree, latent_size) for
the jax models in models/deepsdf.py; torch checkpoints load via
torch-CPU deserialization only.
"""

from __future__ import annotations

import json
import os

import numpy as np

from sdflabel_tpu.models import deepsdf

model_params_subdir = "ModelParameters"
optimizer_params_subdir = "OptimizerParameters"
latent_codes_subdir = "LatentCodes"
logs_filename = "Logs.pth"
reconstructions_subdir = "Reconstructions"
reconstruction_meshes_subdir = "Meshes"
reconstruction_codes_subdir = "Codes"
specifications_filename = "specs.json"
data_source_map_filename = ".datasources.json"
evaluation_subdir = "Evaluation"
sdf_samples_subdir = "SdfSamples"
surface_samples_subdir = "SurfaceSamples"
normalization_param_subdir = "NormalizationParameters"


def load_experiment_specifications(experiment_directory: str) -> dict:
    filename = os.path.join(experiment_directory, specifications_filename)
    if not os.path.isfile(filename):
        raise FileNotFoundError(
            f"experiment directory {experiment_directory!r} has no "
            f"{specifications_filename}"
        )
    with open(filename) as f:
        return json.load(f)


def load_decoder(experiment_directory: str, checkpoint: str):
    """Load a decoder from the experiment-dir convention
    (workspace.py:38-72). Returns (cfg, params, epoch)."""
    import torch

    specs = load_experiment_specifications(experiment_directory)
    cfg = deepsdf.DeepSDFConfig.from_specs(specs)
    filename = os.path.join(
        experiment_directory, model_params_subdir, checkpoint + ".pth"
    )
    if not os.path.isfile(filename):
        raise FileNotFoundError(filename)
    data = torch.load(filename, map_location="cpu", weights_only=False)
    params = deepsdf.params_from_torch_state(cfg, data["model_state_dict"])
    return cfg, params, data["epoch"]


def load_latent_vectors(experiment_directory: str, checkpoint: str):
    """Per-scene latent codes (workspace.py:75-92) -> (num, L) numpy."""
    import torch

    filename = os.path.join(
        experiment_directory, latent_codes_subdir, checkpoint + ".pth"
    )
    if not os.path.isfile(filename):
        raise FileNotFoundError(filename)
    data = torch.load(filename, map_location="cpu", weights_only=False)
    codes = data["latent_codes"]
    if hasattr(codes, "detach"):
        codes = codes.detach().cpu().numpy()
    return np.asarray(codes).reshape(len(codes), -1)


def get_model_params_dir(experiment_dir, create_if_nonexistent=False):
    d = os.path.join(experiment_dir, model_params_subdir)
    if create_if_nonexistent:
        os.makedirs(d, exist_ok=True)
    return d


def get_latent_codes_dir(experiment_dir, create_if_nonexistent=False):
    d = os.path.join(experiment_dir, latent_codes_subdir)
    if create_if_nonexistent:
        os.makedirs(d, exist_ok=True)
    return d


def get_evaluation_dir(experiment_dir, checkpoint, create_if_nonexistent=False):
    d = os.path.join(experiment_dir, evaluation_subdir, checkpoint)
    if create_if_nonexistent:
        os.makedirs(d, exist_ok=True)
    return d


def get_reconstructed_mesh_filename(experiment_dir, epoch, dataset,
                                    class_name, instance_name):
    return os.path.join(
        experiment_dir, reconstructions_subdir, str(epoch),
        reconstruction_meshes_subdir, dataset, class_name,
        instance_name + ".ply",
    )


def get_reconstructed_code_filename(experiment_dir, epoch, dataset,
                                    class_name, instance_name):
    return os.path.join(
        experiment_dir, reconstructions_subdir, str(epoch),
        reconstruction_codes_subdir, dataset, class_name,
        instance_name + ".pth",
    )


def setup_dsdf(path: str, mode: str = "eval", precision="float32"):
    """Single-file convention (workspace.py:167-188): <name>.pt next to
    <name>.json specs. Returns (cfg, params, latent_size).

    precision: 'float32' | 'float16' | 'bfloat16' — float16 maps to
    bfloat16 on TPU (the reference converts to torch fp16 keeping
    BatchNorm fp32; our decoder has no BatchNorm so the cast is uniform).
    """
    import jax
    import jax.numpy as jnp

    cfg, params = deepsdf.load_torch_checkpoint(path)
    dtype = {"float16": jnp.bfloat16, "bfloat16": jnp.bfloat16}.get(
        precision if isinstance(precision, str) else str(precision),
        jnp.float32,
    )
    if dtype != jnp.float32:
        params = jax.tree.map(lambda x: x.astype(dtype), params)
    return cfg, params, cfg.latent_size
