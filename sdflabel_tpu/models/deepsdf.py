"""DeepSDF latent decoder (+ scale head), TPU-native.

Behavioral parity target: the reference decoder at
sdfrenderer/deepsdf/networks/deep_sdf_decoder_scale.py:9-113 — an MLP
(latent+3) -> dims -> 1 with latent re-injection at `latent_in` layers,
optional weight-norm / LayerNorm, final tanh, plus a small latent -> 1
scale head (deep_sdf_decoder_scale.py:68-75,109-113).

TPU design: the decoder is evaluated on the full sample grid as one batched
matmul chain (N x (L+3) @ (L+3) x H ...) — N = density^3 = 64k rows keeps
the MXU busy; no per-point loop exists anywhere. Weight-norm is expressed as
a parameterization (w = g * v / ||v||_row) so imported PyTorch checkpoints
reproduce bit-comparable numerics while the module stays trainable.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DeepSDFConfig:
    latent_size: int
    dims: tuple[int, ...]
    dropout: tuple[int, ...] = ()
    dropout_prob: float = 0.0
    norm_layers: tuple[int, ...] = ()
    latent_in: tuple[int, ...] = ()
    weight_norm: bool = False
    xyz_in_all: bool = False
    use_tanh: bool = False
    latent_dropout: bool = False

    @property
    def layer_dims(self) -> tuple[int, ...]:
        """Full [in] + dims + [out] list, as deep_sdf_decoder_scale.py:29."""
        return (self.latent_size + 3, *self.dims, 1)

    @property
    def num_layers(self) -> int:
        return len(self.layer_dims)

    def layer_io(self, l: int) -> tuple[int, int]:
        """(in_dim, out_dim) of linear layer l, matching reference :42-49."""
        # NOTE: the reference constructor uses dims[l] directly as the input
        # width (deep_sdf_decoder_scale.py:51-54) — the concat bookkeeping is
        # baked into the *output* widths of the preceding layer (:42-46), so
        # at latent_in layers the previous out_dim is dims[l] - dims[0] and
        # the concat restores exactly dims[l].
        dims = self.layer_dims
        in_dim = dims[l]
        if l + 1 in self.latent_in:
            out_dim = dims[l + 1] - dims[0]
        else:
            out_dim = dims[l + 1]
            if self.xyz_in_all and l != self.num_layers - 2:
                out_dim -= 3
        return in_dim, out_dim

    @classmethod
    def from_specs(cls, specs: dict) -> "DeepSDFConfig":
        """Build from a DeepSDF specs.json dict (workspace.py:167-175)."""
        ns = dict(specs["NetworkSpecs"])
        ns.pop("samples_per_scene", None)
        return cls(
            latent_size=specs["CodeLength"],
            dims=tuple(ns.get("dims", ())),
            dropout=tuple(ns.get("dropout") or ()),
            dropout_prob=ns.get("dropout_prob", 0.0),
            norm_layers=tuple(ns.get("norm_layers") or ()),
            latent_in=tuple(ns.get("latent_in") or ()),
            weight_norm=bool(ns.get("weight_norm", False)),
            xyz_in_all=bool(ns.get("xyz_in_all", False)),
            use_tanh=bool(ns.get("use_tanh", False)),
            latent_dropout=bool(ns.get("latent_dropout", False)),
        )

    @classmethod
    def from_specs_file(cls, path: str) -> "DeepSDFConfig":
        with open(path) as f:
            return cls.from_specs(json.load(f))


def _dense_init(key, in_dim, out_dim, dtype):
    """torch nn.Linear default init: U(-1/sqrt(in), 1/sqrt(in))."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / np.sqrt(in_dim)
    w = jax.random.uniform(kw, (in_dim, out_dim), dtype, -bound, bound)
    b = jax.random.uniform(kb, (out_dim,), dtype, -bound, bound)
    return w, b


def init_params(cfg: DeepSDFConfig, key: jax.Array, dtype=jnp.float32) -> dict:
    """Initialize a parameter pytree.

    Layout:
      params['lin{l}'] = {'w': (in,out), 'b': (out,)} or, under weight-norm
      at layer l in norm_layers, {'v': (in,out), 'g': (out,), 'b': (out,)}.
      params['ln{l}'] = {'scale': (out,), 'bias': (out,)} for LayerNorm layers.
      params['scale_net'] = [{'w','b'} x3] for the latent->1 scale head.
    """
    params: dict[str, Any] = {}
    keys = jax.random.split(key, cfg.num_layers + 3)
    for l in range(cfg.num_layers - 1):
        in_dim, out_dim = cfg.layer_io(l)
        w, b = _dense_init(keys[l], in_dim, out_dim, dtype)
        if cfg.weight_norm and l in cfg.norm_layers:
            g = jnp.linalg.norm(w, axis=0)
            params[f"lin{l}"] = {"v": w, "g": g, "b": b}
        else:
            params[f"lin{l}"] = {"w": w, "b": b}
            if (not cfg.weight_norm) and l in cfg.norm_layers:
                params[f"ln{l}"] = {
                    "scale": jnp.ones((out_dim,), dtype),
                    "bias": jnp.zeros((out_dim,), dtype),
                }
    sn_dims = [(cfg.latent_size, 3), (3, 3), (3, 1)]
    sn = []
    for i, (di, do) in enumerate(sn_dims):
        w, b = _dense_init(keys[cfg.num_layers - 1 + i], di, do, dtype)
        sn.append({"w": w, "b": b})
    params["scale_net"] = sn
    return params


def _linear(p: dict, x: jax.Array) -> jax.Array:
    if "v" in p:  # weight-norm parameterization (dim=0 in torch == column here)
        v = p["v"]
        w = v * (p["g"] / jnp.linalg.norm(v, axis=0))[None, :]
    else:
        w = p["w"]
    return x @ w + p["b"]


def _layer_norm(p: dict, x: jax.Array) -> jax.Array:
    # torch nn.LayerNorm(eps=1e-5) over last dim
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-5) * p["scale"] + p["bias"]


def apply_sdf(cfg: DeepSDFConfig, params: dict, inputs: jax.Array,
              dropout_rng: jax.Array | None = None) -> jax.Array:
    """SDF MLP forward on (N, latent+3) inputs -> (N,) sdf.

    Mirrors deep_sdf_decoder_scale.py:78-107. dropout_rng=None is eval
    mode (dropout off, the only mode the reference pipelines use); pass a
    PRNG key for train-mode dropout at `cfg.dropout` layers (+ optional
    latent dropout, :85-89).
    """
    x = inputs
    if dropout_rng is not None and cfg.latent_dropout and inputs.shape[1] > 3:
        dropout_rng, sub = jax.random.split(dropout_rng)
        lat = inputs[:, :-3]
        keep = jax.random.bernoulli(sub, 0.8, lat.shape)
        x = jnp.concatenate([jnp.where(keep, lat / 0.8, 0.0),
                             inputs[:, -3:]], axis=-1)
    last = cfg.num_layers - 2
    for l in range(cfg.num_layers - 1):
        if l in cfg.latent_in:
            x = jnp.concatenate([x, inputs], axis=-1)
        elif l != 0 and cfg.xyz_in_all:
            x = jnp.concatenate([x, inputs[:, -3:]], axis=-1)
        x = _linear(params[f"lin{l}"], x)
        if l == last and cfg.use_tanh:
            x = jnp.tanh(x)
        if l < last:
            if (not cfg.weight_norm) and l in cfg.norm_layers:
                x = _layer_norm(params[f"ln{l}"], x)
            x = jax.nn.relu(x)
            if (dropout_rng is not None and cfg.dropout is not None
                    and l in cfg.dropout):
                dropout_rng, sub = jax.random.split(dropout_rng)
                keep_p = 1.0 - cfg.dropout_prob
                keep = jax.random.bernoulli(sub, keep_p, x.shape)
                x = jnp.where(keep, x / keep_p, 0.0)
    x = jnp.tanh(x)  # reference always applies self.th (`:106-107`)
    return x.reshape(-1)


def apply_scale(cfg: DeepSDFConfig, params: dict, latent: jax.Array) -> jax.Array:
    """Scale head on a single latent vector (L,) -> scalar (1,)."""
    x = latent
    for i, p in enumerate(params["scale_net"]):
        x = x @ p["w"] + p["b"]
        if i < 2:
            x = jax.nn.relu(x)
    return x


def decode(
    cfg: DeepSDFConfig, params: dict, latent: jax.Array, points: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Decode a latent on a point set: (sdf (N,), scale (1,)).

    Equivalent to building inputs = cat([latent.expand(N,-1), points]) and
    calling the reference decoder (refine_css.py:148-152).
    """
    n = points.shape[0]
    inputs = jnp.concatenate(
        [jnp.broadcast_to(latent[None, :], (n, latent.shape[0])), points], axis=-1
    )
    sdf = apply_sdf(cfg, params, inputs)
    scale = apply_scale(cfg, params, latent)
    return sdf, scale


def sdf_fn(cfg: DeepSDFConfig, params: dict):
    """Return decoder_fn(latent, points) -> (N,) for ops.grid.surface_from_decoder."""

    def fn(latent, points):
        n = points.shape[0]
        inputs = jnp.concatenate(
            [jnp.broadcast_to(latent[None, :], (n, latent.shape[0])), points],
            axis=-1,
        )
        return apply_sdf(cfg, params, inputs)

    return fn


def fold_weight_norm(params: dict) -> dict:
    """Fold the weight-norm parameterization into plain weights.

    Replaces every {'v','g','b'} linear with {'w': v * g/||v||_col, 'b'}
    (the exact tensor _linear computes each call). Inference-only helper:
    the folded pytree is no longer trainable under weight-norm geometry,
    but forward values are identical and each decode saves the per-call
    norm+scale work.
    """

    def fold(p):
        if isinstance(p, dict) and "v" in p:
            v = p["v"]
            return {"w": v * (p["g"] / jnp.linalg.norm(v, axis=0))[None, :],
                    "b": p["b"]}
        return p

    return {
        k: ([fold(p) for p in v] if isinstance(v, list) else fold(v))
        for k, v in params.items()
    }


def cast_params(params: dict, dtype=jnp.bfloat16) -> dict:
    """Cast every floating-point leaf of a parameter pytree to `dtype`."""
    return jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.inexact)
        else x,
        params,
    )


def select_sdf_fn(cfg: DeepSDFConfig, params: dict, dtype=jnp.bfloat16):
    """Low-precision decoder for isosurface band SELECTION only.

    Weight-norm is folded in fp32 first (so the cast loses one rounding, not
    a bf16 norm/ratio chain), every parameter is cast to `dtype`, and the
    returned fn casts latent/points to `dtype` so the whole MLP — matmuls
    AND element-wise tail — runs in low precision, halving the stage-1
    activation traffic. Selection needs only the RANKING of |sdf|
    (ops.grid.surface_from_decoder's select_decoder_fn contract); every
    selected point is re-decoded by the exact decoder in stage 2, so
    surface values/normals/mask stay exact. Returns fp32 sdf values (the
    cast back is free relative to the matmul chain) so top-k tie behavior
    is unchanged downstream.
    """
    lowp = cast_params(fold_weight_norm(params), dtype)
    base = sdf_fn(cfg, lowp)

    def fn(latent, points):
        return base(latent.astype(dtype), points.astype(dtype)).astype(
            jnp.float32
        )

    return fn


# ---------------------------------------------------------------------------
# PyTorch checkpoint import (workspace.py:167-188 conventions)
# ---------------------------------------------------------------------------

def params_from_torch_state(
    cfg: DeepSDFConfig, state_dict: dict, dtype=jnp.float32
) -> dict:
    """Convert a reference decoder state_dict (possibly DataParallel-prefixed)
    into our parameter pytree. torch Linear stores weight (out,in); we store
    (in,out)."""

    def get(name):
        for k in (name, "module." + name):
            if k in state_dict:
                v = state_dict[k]
                arr = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
                return jnp.asarray(arr, dtype=dtype)
        raise KeyError(name)

    params: dict[str, Any] = {}
    for l in range(cfg.num_layers - 1):
        if cfg.weight_norm and l in cfg.norm_layers:
            params[f"lin{l}"] = {
                "v": get(f"lin{l}.weight_v").T,
                "g": get(f"lin{l}.weight_g").reshape(-1),
                "b": get(f"lin{l}.bias"),
            }
        else:
            params[f"lin{l}"] = {"w": get(f"lin{l}.weight").T, "b": get(f"lin{l}.bias")}
            if (not cfg.weight_norm) and l in cfg.norm_layers:
                params[f"ln{l}"] = {
                    "scale": get(f"bn{l}.weight"),
                    "bias": get(f"bn{l}.bias"),
                }
    params["scale_net"] = [
        {"w": get(f"scale_net.{i}.weight").T, "b": get(f"scale_net.{i}.bias")}
        for i in (0, 2, 4)
    ]
    return params


def torch_state_from_params(cfg: DeepSDFConfig, params: dict) -> dict:
    """Inverse of params_from_torch_state: our pytree -> a reference-layout
    state dict (numpy values, torch Linear (out,in) orientation), so
    decoders trained in-framework (engine/deepsdf_train.py) save as
    drop-in `deepsdf.pt` checkpoints for the reference loader
    (workspace.py:38-72,167-188) and for our own importer."""

    state: dict[str, np.ndarray] = {}
    for l in range(cfg.num_layers - 1):
        p = params[f"lin{l}"]
        if cfg.weight_norm and l in cfg.norm_layers:
            state[f"lin{l}.weight_v"] = np.asarray(p["v"]).T
            state[f"lin{l}.weight_g"] = np.asarray(p["g"]).reshape(-1, 1)
            state[f"lin{l}.bias"] = np.asarray(p["b"])
        else:
            state[f"lin{l}.weight"] = np.asarray(p["w"]).T
            state[f"lin{l}.bias"] = np.asarray(p["b"])
            if (not cfg.weight_norm) and l in cfg.norm_layers:
                state[f"bn{l}.weight"] = np.asarray(params[f"ln{l}"]["scale"])
                state[f"bn{l}.bias"] = np.asarray(params[f"ln{l}"]["bias"])
    for i, idx in enumerate((0, 2, 4)):
        p = params["scale_net"][i]
        state[f"scale_net.{idx}.weight"] = np.asarray(p["w"]).T
        state[f"scale_net.{idx}.bias"] = np.asarray(p["b"])
    return state


def specs_from_config(cfg: DeepSDFConfig) -> dict:
    """DeepSDF specs.json NetworkSpecs dict for a config (so exported
    checkpoints round-trip through DeepSDFConfig.from_specs)."""
    return {
        "CodeLength": cfg.latent_size,
        # the reference's setup_dsdf imports the decoder class by this
        # name (workspace.py:171-174) — required for our exports to load
        # in the reference stack
        "NetworkArch": "deep_sdf_decoder_scale",
        "NetworkSpecs": {
            "dims": list(cfg.dims),
            "dropout": list(cfg.dropout),
            "dropout_prob": cfg.dropout_prob,
            "norm_layers": list(cfg.norm_layers),
            "latent_in": list(cfg.latent_in),
            "weight_norm": cfg.weight_norm,
            "xyz_in_all": cfg.xyz_in_all,
            "use_tanh": cfg.use_tanh,
            "latent_dropout": cfg.latent_dropout,
        },
    }


def save_torch_checkpoint(path: str, cfg: DeepSDFConfig, params: dict,
                          epoch: int = 0) -> None:
    """Write the single-file convention pair (<name>.pt + <name>.json) in
    the reference format (workspace.py:167-188): torch-loadable state
    dict under 'model_state_dict' plus the specs json."""
    import os

    import torch

    # np.array copies: device_get arrays can be non-writable, which torch warns on
    # 'module.' prefix: the reference's setup_dsdf loads through
    # nn.DataParallel BEFORE unwrapping (workspace.py:175-180), so its
    # strict load_state_dict requires DataParallel key names — exactly
    # how the released reference checkpoints are saved. Our own loader
    # accepts both spellings (params_from_torch_state).
    state = {"module." + k: torch.from_numpy(np.array(v))
             for k, v in torch_state_from_params(cfg, params).items()}
    torch.save({"epoch": epoch, "model_state_dict": state}, path)
    with open(os.path.splitext(path)[0] + ".json", "w") as f:
        json.dump(specs_from_config(cfg), f, indent=2)


def load_torch_checkpoint(path: str, dtype=jnp.float32) -> tuple[DeepSDFConfig, dict]:
    """Load a reference-format checkpoint pair (<name>.pt + <name>.json).

    Follows setup_dsdf (workspace.py:167-188): specs json next to the .pt,
    samples_per_scene stripped, DataParallel 'module.' prefixes accepted.
    """
    import os

    import torch

    specs_path = os.path.splitext(path)[0] + ".json"
    cfg = DeepSDFConfig.from_specs_file(specs_path)
    saved = torch.load(path, map_location="cpu", weights_only=False)
    state = saved["model_state_dict"] if "model_state_dict" in saved else saved
    return cfg, params_from_torch_state(cfg, state, dtype=dtype)
