"""CSS network: ResNet18 encoder + 4 UNet decoder heads + spherical latent.

Behavioral parity target: networks/resnet_css.py (ResNet :104-262,
setup_css :265-296) and networks/unet_parts.py (double_conv :8-20,
up :43-68, outconv :71-82).

Architecture (input 3x128x128, NCHW to match the reference tensors;
internally flax convs run NHWC and transpose at the boundary):
  conv1(7x7/2) -> bn -> relu = x1 ; maxpool = x2 ; layer1+layer2 = x3 ;
  layer3 = x4. layer4 exists in the reference but is never called in
  forward (resnet_css.py:176-198) — we don't materialize it.
  Five heads: u/v/w/mask UNet up-paths over (x4,x3,x2,x1,x) and a latent
  head = 1x1 conv on x4 -> spatial mean -> unit-sphere projection
  (resnet_css.py:19-26,194-196).
Outputs dict matches the reference keys: u, v, w (log-softmax logits),
uvw_sm, uvw_sm_masked, mask, mask_sm, latent (resnet_css.py:252-262).

TPU notes: the four decoder up-paths are structurally identical; we keep
them separate for checkpoint parity but evaluate them under one vmapped
parameter stack is left for a later optimization. Upsampling is bilinear
with align_corners=True (torch nn.Upsample semantics), implemented as a
static gather-matmul so it lowers to MXU-friendly ops.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# align_corners=True bilinear 2x upsample (torch nn.Upsample parity)
# ---------------------------------------------------------------------------

def _align_corners_weights(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) interpolation matrix with align_corners=True."""
    w = np.zeros((n_out, n_in), dtype=np.float32)
    if n_in == 1:
        w[:, 0] = 1.0
        return w
    scale = (n_in - 1) / (n_out - 1) if n_out > 1 else 0.0
    for i in range(n_out):
        src = i * scale
        lo = int(np.floor(src))
        hi = min(lo + 1, n_in - 1)
        frac = src - lo
        w[i, lo] += 1.0 - frac
        w[i, hi] += frac
    return w


def upsample2x_align_corners(x: jax.Array) -> jax.Array:
    """NHWC 2x bilinear upsample, align_corners=True.

    Expressed as two small dense interpolation matmuls (static shapes) —
    XLA maps these onto the MXU instead of gather chains.
    """
    n, h, w, c = x.shape
    wy = jnp.asarray(_align_corners_weights(h, 2 * h))
    wx = jnp.asarray(_align_corners_weights(w, 2 * w))
    x = jnp.einsum("oh,nhwc->nowc", wy, x)
    x = jnp.einsum("ow,nhwc->nhoc", wx, x)
    return x


# ---------------------------------------------------------------------------
# Modules
# ---------------------------------------------------------------------------

class TorchBatchNorm(nn.Module):
    """BatchNorm with torch semantics (momentum 0.1, eps 1e-5).

    Statistics and normalization always run in fp32 regardless of the
    surrounding conv compute dtype — bf16 batch statistics over
    B*H*W-sized reductions lose precision the training loop can feel.
    """

    features: int
    use_running_average: bool = True

    @nn.compact
    def __call__(self, x):
        return nn.BatchNorm(
            use_running_average=self.use_running_average,
            momentum=0.9,
            epsilon=1e-5,
            axis_name=None,
        )(x.astype(jnp.float32))


def _conv(features, kernel, strides=1, use_bias=False,
          dtype=jnp.float32):
    return nn.Conv(
        features, (kernel, kernel), strides=(strides, strides),
        padding=[(kernel // 2, kernel // 2)] * 2, use_bias=use_bias,
        dtype=dtype,
    )


class BasicBlock(nn.Module):
    """ResNet basic block (resnet_css.py:29-57).

    dtype: conv compute dtype (mixed precision). Params stay fp32
    (flax param_dtype default); BatchNorm statistics/normalization always
    run fp32 (TorchBatchNorm casts), so bf16 touches only the conv
    matmuls — the standard TPU mixed-precision split.
    """

    planes: int
    stride: int = 1
    downsample: bool = False
    use_running_average: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        out = _conv(self.planes, 3, self.stride, dtype=self.dtype)(x)
        out = TorchBatchNorm(self.planes, self.use_running_average)(out)
        out = nn.relu(out)
        out = _conv(self.planes, 3, dtype=self.dtype)(out)
        out = TorchBatchNorm(self.planes, self.use_running_average)(out)
        if self.downsample:
            residual = nn.Conv(
                self.planes, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype,
            )(x)
            residual = TorchBatchNorm(self.planes, self.use_running_average)(
                residual
            )
        return nn.relu(out + residual.astype(out.dtype))


class DoubleConv(nn.Module):
    """(conv 3x3 -> BN -> ReLU) x2 (unet_parts.py:8-20)."""

    features: int
    use_running_average: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = _conv(self.features, 3, use_bias=True, dtype=self.dtype)(x)
        x = TorchBatchNorm(self.features, self.use_running_average)(x)
        x = nn.relu(x)
        x = _conv(self.features, 3, use_bias=True, dtype=self.dtype)(x)
        x = TorchBatchNorm(self.features, self.use_running_average)(x)
        return nn.relu(x)


class Up(nn.Module):
    """Bilinear-up + optional skip concat + double conv (unet_parts.py:43-68)."""

    features: int
    add_shortcut: bool = True
    use_running_average: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x1, x2):
        x1 = upsample2x_align_corners(x1.astype(self.dtype))
        # torch pads x2 up to x1's size (diff is 0 for the 128x128 pipeline)
        dh = x1.shape[1] - x2.shape[1]
        dw = x1.shape[2] - x2.shape[2]
        if dh or dw:
            x2 = jnp.pad(
                x2,
                ((0, 0), (dh // 2, dh - dh // 2), (dw // 2, dw - dw // 2),
                 (0, 0)),
            )
        if self.add_shortcut:
            x = jnp.concatenate([x2.astype(x1.dtype), x1], axis=-1)
        else:
            x = x1
        return DoubleConv(self.features, self.use_running_average,
                          dtype=self.dtype)(x)


def project_vecs_onto_sphere(vectors: jax.Array, radius: float = 1.0) -> jax.Array:
    """Unit-sphere projection, surface_only=True (resnet_css.py:19-26)."""
    length = jax.lax.stop_gradient(
        jnp.linalg.norm(vectors, axis=-1, keepdims=True)
    )
    return vectors * (radius / (length + 1e-8))


class CSSNet(nn.Module):
    """ResNet18-FPN CSS network (resnet_css.py:104-262).

    `width` scales every channel count (64/128/256 -> w/2w/4w). width=64 is
    the reference architecture (required for torch checkpoint import); small
    widths give a cheap variant for bundled demos and tests. The output
    bins (256 per NOCS channel) are part of the decode semantics and never
    scale.
    """

    use_running_average: bool = True
    sm_hardness: float = 100.0  # resnet_css.py:230
    width: int = 64
    # DeepSDF latent dimensionality predicted by the latent head. 3 is the
    # reference architecture (resnet_css.py:194 hardcodes out_lat -> 3 for
    # its car decoder); other sizes pair the CSS with decoders trained
    # in-framework (pipelines/train_deepsdf + make_crops).
    latent_size: int = 3
    # Mixed-precision conv compute (TPU extension, OFF by default):
    # dtype=bfloat16 runs every backbone/decoder conv matmul in bf16 while
    # params, BatchNorm, the 1x1 output heads, and the log-softmax decode
    # stay fp32. The reference trains fp32 CUDA (train_css.py) — this is
    # the TPU-idiomatic equivalent of torch AMP.
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_nchw):
        ura = self.use_running_average
        wd = self.width
        dt = self.dtype
        x = jnp.transpose(x_nchw, (0, 2, 3, 1))  # NCHW -> NHWC

        x1 = nn.Conv(wd, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                     use_bias=False, name="conv1", dtype=dt)(x)
        x1 = TorchBatchNorm(wd, ura, name="bn1")(x1)
        x1 = nn.relu(x1)
        x2 = nn.max_pool(x1, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        x3 = BasicBlock(wd, name="layer1_0", use_running_average=ura,
                        dtype=dt)(x2)
        x3 = BasicBlock(wd, name="layer1_1", use_running_average=ura,
                        dtype=dt)(x3)
        x3 = BasicBlock(2 * wd, 2, True, name="layer2_0",
                        use_running_average=ura, dtype=dt)(x3)
        x3 = BasicBlock(2 * wd, name="layer2_1", use_running_average=ura,
                        dtype=dt)(x3)
        x4 = BasicBlock(4 * wd, 2, True, name="layer3_0",
                        use_running_average=ura, dtype=dt)(x3)
        x4 = BasicBlock(4 * wd, name="layer3_1", use_running_average=ura,
                        dtype=dt)(x4)

        # latent head
        x_lat = nn.Conv(self.latent_size, (1, 1), name="out_lat")(x4)
        x_lat = jnp.mean(
            x_lat.reshape(x_lat.shape[0], -1, self.latent_size), axis=1)
        latent = project_vecs_onto_sphere(x_lat)

        def head(prefix, out_ch):
            h = Up(2 * wd, name=f"up1_{prefix}", use_running_average=ura,
                   dtype=dt)(x4, x3)
            h = Up(wd, name=f"up2_{prefix}", use_running_average=ura,
                   dtype=dt)(h, x2)
            h = Up(wd, name=f"up3_{prefix}", use_running_average=ura,
                   dtype=dt)(h, x1)
            h = Up(wd, add_shortcut=False, name=f"up4_{prefix}",
                   use_running_average=ura, dtype=dt)(h, x)
            # output logits + softmax decode stay fp32 for numerics
            return nn.Conv(out_ch, (1, 1), name=f"out_{prefix}")(
                h.astype(jnp.float32))

        u_raw = head("u", 256)
        v_raw = head("v", 256)
        w_raw = head("w", 256)
        u = jax.nn.log_softmax(u_raw, axis=-1)
        v = jax.nn.log_softmax(v_raw, axis=-1)
        w = jax.nn.log_softmax(w_raw, axis=-1)
        mask = head("mask", 2)

        # expected-color decoding (resnet_css.py:229-241)
        colors = jnp.arange(256, dtype=x.dtype)

        def expected(logp):
            prob = jax.nn.softmax(logp * self.sm_hardness, axis=-1)
            return jnp.sum(prob * colors, axis=-1, keepdims=True)

        uvw_sm = jnp.concatenate([expected(u), expected(v), expected(w)],
                                 axis=-1)
        prob_mask = jax.nn.softmax(mask * self.sm_hardness, axis=-1)
        mask_sm = jnp.sum(
            prob_mask * jnp.arange(2, dtype=x.dtype), axis=-1, keepdims=True
        )
        hard_mask = jnp.argmax(mask, axis=-1, keepdims=True).astype(x.dtype)
        uvw_sm_masked = uvw_sm * hard_mask

        def to_nchw(t):
            return jnp.transpose(t, (0, 3, 1, 2))

        return {
            "u": to_nchw(u),
            "v": to_nchw(v),
            "w": to_nchw(w),
            # pre-log-softmax head logits: free references (the trainer's
            # opt-in direct-CE mode consumes these and XLA dead-code
            # eliminates the unused log-softmax towers from its program)
            "u_raw": to_nchw(u_raw),
            "v_raw": to_nchw(v_raw),
            "w_raw": to_nchw(w_raw),
            "uvw_sm": to_nchw(uvw_sm),
            "uvw_sm_masked": to_nchw(uvw_sm_masked),
            "mask": to_nchw(mask),
            "mask_sm": to_nchw(mask_sm),
            "latent": latent,
        }


# ---------------------------------------------------------------------------
# PyTorch checkpoint import (resnet_css.py state dict layout)
# ---------------------------------------------------------------------------

_LAYER_MAP = {
    "layer1_0": "layer1.0", "layer1_1": "layer1.1",
    "layer2_0": "layer2.0", "layer2_1": "layer2.1",
    "layer3_0": "layer3.0", "layer3_1": "layer3.1",
}


def _t_conv(w):
    # torch conv (out, in, kh, kw) -> flax (kh, kw, in, out)
    return jnp.asarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def _np(t):
    arr = (t.detach().cpu().numpy() if hasattr(t, "detach")
           else np.asarray(t))
    # fp16-saved checkpoints (the reference's refine-side convention,
    # workspace.py:191-195) import as fp32 working precision
    if np.issubdtype(arr.dtype, np.floating) and arr.dtype != np.float32:
        arr = arr.astype(np.float32)
    return arr


def params_from_torch_state(state: dict) -> dict:
    """Convert a reference CSS state_dict into flax (params, batch_stats)."""
    state = { (k[7:] if k.startswith("module.") else k): _np(v)
              for k, v in state.items() }
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}

    def bn(dst, src):
        params[dst] = {"BatchNorm_0": {
            "scale": jnp.asarray(state[src + ".weight"]),
            "bias": jnp.asarray(state[src + ".bias"]),
        }}
        stats[dst] = {"BatchNorm_0": {
            "mean": jnp.asarray(state[src + ".running_mean"]),
            "var": jnp.asarray(state[src + ".running_var"]),
        }}

    params["conv1"] = {"kernel": _t_conv(state["conv1.weight"])}
    bn("bn1", "bn1")

    for dst, src in _LAYER_MAP.items():
        block: dict[str, Any] = {
            "Conv_0": {"kernel": _t_conv(state[src + ".conv1.weight"])},
            "Conv_1": {"kernel": _t_conv(state[src + ".conv2.weight"])},
        }
        block_stats: dict[str, Any] = {}
        for i, bn_src in enumerate(("bn1", "bn2")):
            block[f"TorchBatchNorm_{i}"] = {"BatchNorm_0": {
                "scale": jnp.asarray(state[f"{src}.{bn_src}.weight"]),
                "bias": jnp.asarray(state[f"{src}.{bn_src}.bias"]),
            }}
            block_stats[f"TorchBatchNorm_{i}"] = {"BatchNorm_0": {
                "mean": jnp.asarray(state[f"{src}.{bn_src}.running_mean"]),
                "var": jnp.asarray(state[f"{src}.{bn_src}.running_var"]),
            }}
        if f"{src}.downsample.0.weight" in state:
            block["Conv_2"] = {
                "kernel": _t_conv(state[f"{src}.downsample.0.weight"])
            }
            block["TorchBatchNorm_2"] = {"BatchNorm_0": {
                "scale": jnp.asarray(state[f"{src}.downsample.1.weight"]),
                "bias": jnp.asarray(state[f"{src}.downsample.1.bias"]),
            }}
            block_stats["TorchBatchNorm_2"] = {"BatchNorm_0": {
                "mean": jnp.asarray(state[f"{src}.downsample.1.running_mean"]),
                "var": jnp.asarray(state[f"{src}.downsample.1.running_var"]),
            }}
        params[dst] = block
        stats[dst] = block_stats

    # UNet heads
    for prefix in ("u", "v", "w", "mask"):
        for up_i in (1, 2, 3, 4):
            src = f"up{up_i}_{prefix}.conv.conv"
            dc_params: dict[str, Any] = {}
            dc_stats: dict[str, Any] = {}
            # torch Sequential: 0 conv, 1 bn, 3 conv, 4 bn
            for j, (ci, bi) in enumerate(((0, 1), (3, 4))):
                dc_params[f"Conv_{j}"] = {
                    "kernel": _t_conv(state[f"{src}.{ci}.weight"]),
                    "bias": jnp.asarray(state[f"{src}.{ci}.bias"]),
                }
                dc_params[f"TorchBatchNorm_{j}"] = {"BatchNorm_0": {
                    "scale": jnp.asarray(state[f"{src}.{bi}.weight"]),
                    "bias": jnp.asarray(state[f"{src}.{bi}.bias"]),
                }}
                dc_stats[f"TorchBatchNorm_{j}"] = {"BatchNorm_0": {
                    "mean": jnp.asarray(state[f"{src}.{bi}.running_mean"]),
                    "var": jnp.asarray(state[f"{src}.{bi}.running_var"]),
                }}
            params[f"up{up_i}_{prefix}"] = {"DoubleConv_0": dc_params}
            stats[f"up{up_i}_{prefix}"] = {"DoubleConv_0": dc_stats}

    for prefix, src in (("u", "out_u"), ("v", "out_v"), ("w", "out_w"),
                        ("mask", "out_mask")):
        params[f"out_{prefix}"] = {
            "kernel": _t_conv(state[f"{src}.conv.weight"]),
            "bias": jnp.asarray(state[f"{src}.conv.bias"]),
        }
    params["out_lat"] = {
        "kernel": _t_conv(state["out_lat.conv.weight"]),
        "bias": jnp.asarray(state["out_lat.conv.bias"]),
    }
    return {"params": params, "batch_stats": stats}


def load_torch_checkpoint(path: str) -> dict:
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)
    return params_from_torch_state(state)


FROZEN_PREFIXES = ("conv1", "bn1", "layer1_0", "layer1_1")
# resnet_css.py:156-158 freezes conv1, bn1, layer1


def trainable_mask(params: dict) -> dict:
    """Pytree mask: False for frozen parameters (optax.masked)."""

    def mask_tree(tree, frozen):
        return jax.tree.map(lambda _: not frozen, tree)

    return {
        k: mask_tree(v, k in FROZEN_PREFIXES) for k, v in params.items()
    }
