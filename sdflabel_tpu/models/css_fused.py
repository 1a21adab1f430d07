"""Fused-head CSS network: the 4 UNet decoder paths as grouped convs.

SURVEY.md §3.2 flags the reference's hot loop: the u/v/w/mask heads each
run a full UNet up-path (resnet_css.py:199-227) — four structurally
identical towers executed sequentially. Here the four towers run as ONE
tower of grouped convolutions (feature_group_count=4):

  * the first conv of up1 consumes a SHARED input (cat(up(x4), x3)), so
    the four heads' kernels stack along the output dim into one dense
    384 -> 4x128 conv (better MXU shape, same FLOPs);
  * every other conv is per-head: kernels stack into grouped convs
    (4 groups), inputs lay out as [skip | head_i] per group (the shared
    skip is tiled across groups);
  * BatchNorm is per-channel, so concatenating the four heads' channels
    is EXACTLY equivalent to four separate norms.

This is a pure rearrangement — outputs are bit-comparable to models.css
(test_css_fused asserts allclose), and `fuse_css_variables` converts any
unfused checkpoint (including torch imports) into the fused layout.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from sdflabel_tpu.models import css as css_mod

HEADS = ("u", "v", "w", "mask")
G = len(HEADS)


class _GroupedDoubleConv(nn.Module):
    """(grouped conv 3x3 -> BN -> ReLU) x2 over G head-groups."""

    features_per_group: int
    first_dense: bool = False  # first conv consumes a shared (ungrouped) input
    use_running_average: bool = True

    @nn.compact
    def __call__(self, x):
        f = self.features_per_group * G
        x = nn.Conv(f, (3, 3), padding=[(1, 1), (1, 1)], use_bias=True,
                    feature_group_count=1 if self.first_dense else G)(x)
        x = css_mod.TorchBatchNorm(f, self.use_running_average)(x)
        x = nn.relu(x)
        x = nn.Conv(f, (3, 3), padding=[(1, 1), (1, 1)], use_bias=True,
                    feature_group_count=G)(x)
        x = css_mod.TorchBatchNorm(f, self.use_running_average)(x)
        return nn.relu(x)


def _tile_skip_per_group(skip, per_head, head_ch):
    """Lay out [skip | head_i] contiguously per group for grouped convs.

    skip: (B,H,W,S) shared; per_head: (B,H,W,G*head_ch).
    Returns (B,H,W,G*(S+head_ch)).
    """
    parts = []
    for g in range(G):
        parts.append(skip)
        parts.append(per_head[..., g * head_ch : (g + 1) * head_ch])
    return jnp.concatenate(parts, axis=-1)


class CSSNetFused(nn.Module):
    """CSS network with the four decoder heads fused (grouped convs)."""

    use_running_average: bool = True
    sm_hardness: float = 100.0

    @nn.compact
    def __call__(self, x_nchw):
        ura = self.use_running_average
        x = jnp.transpose(x_nchw, (0, 2, 3, 1))

        x1 = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                     use_bias=False, name="conv1")(x)
        x1 = css_mod.TorchBatchNorm(64, ura, name="bn1")(x1)
        x1 = nn.relu(x1)
        x2 = nn.max_pool(x1, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        x3 = css_mod.BasicBlock(64, name="layer1_0", use_running_average=ura)(x2)
        x3 = css_mod.BasicBlock(64, name="layer1_1", use_running_average=ura)(x3)
        x3 = css_mod.BasicBlock(128, 2, True, name="layer2_0",
                                use_running_average=ura)(x3)
        x3 = css_mod.BasicBlock(128, name="layer2_1", use_running_average=ura)(x3)
        x4 = css_mod.BasicBlock(256, 2, True, name="layer3_0",
                                use_running_average=ura)(x3)
        x4 = css_mod.BasicBlock(256, name="layer3_1", use_running_average=ura)(x4)

        x_lat = nn.Conv(3, (1, 1), name="out_lat")(x4)
        x_lat = jnp.mean(x_lat.reshape(x_lat.shape[0], -1, 3), axis=1)
        latent = css_mod.project_vecs_onto_sphere(x_lat)

        up = css_mod.upsample2x_align_corners

        # up1: shared input cat(x3, up(x4)) -> dense first conv into 4x128
        h = jnp.concatenate([x3, up(x4)], axis=-1)  # (B,16,16,384)
        h = _GroupedDoubleConv(128, first_dense=True,
                               use_running_average=ura, name="up1")(h)
        # up2: per-group [x2 | head_i] -> grouped 4x(64+128) -> 4x64
        h = _tile_skip_per_group(x2, up(h), 128)
        h = _GroupedDoubleConv(64, use_running_average=ura, name="up2")(h)
        # up3: per-group [x1 | head_i]
        h = _tile_skip_per_group(x1, up(h), 64)
        h = _GroupedDoubleConv(64, use_running_average=ura, name="up3")(h)
        # up4: no shortcut (unet_parts.py up(add_shortcut=False))
        h = up(h)
        h = _GroupedDoubleConv(64, use_running_average=ura, name="up4")(h)

        # output convs per head slice (u/v/w: 256, mask: 2)
        outs = {}
        for g, prefix in enumerate(HEADS):
            feat = h[..., g * 64 : (g + 1) * 64]
            ch = 2 if prefix == "mask" else 256
            outs[prefix] = nn.Conv(ch, (1, 1), name=f"out_{prefix}")(feat)

        u = jax.nn.log_softmax(outs["u"], axis=-1)
        v = jax.nn.log_softmax(outs["v"], axis=-1)
        w = jax.nn.log_softmax(outs["w"], axis=-1)
        mask = outs["mask"]

        colors = jnp.arange(256, dtype=x.dtype)

        def expected(logp):
            prob = jax.nn.softmax(logp * self.sm_hardness, axis=-1)
            return jnp.sum(prob * colors, axis=-1, keepdims=True)

        uvw_sm = jnp.concatenate([expected(u), expected(v), expected(w)],
                                 axis=-1)
        prob_mask = jax.nn.softmax(mask * self.sm_hardness, axis=-1)
        mask_sm = jnp.sum(prob_mask * jnp.arange(2, dtype=x.dtype), axis=-1,
                          keepdims=True)
        hard_mask = jnp.argmax(mask, axis=-1, keepdims=True).astype(x.dtype)
        uvw_sm_masked = uvw_sm * hard_mask

        def to_nchw(t):
            return jnp.transpose(t, (0, 3, 1, 2))

        return {
            "u": to_nchw(u), "v": to_nchw(v), "w": to_nchw(w),
            # pre-log-softmax logits, mirroring CSSNet's output contract
            "u_raw": to_nchw(outs["u"]), "v_raw": to_nchw(outs["v"]),
            "w_raw": to_nchw(outs["w"]),
            "uvw_sm": to_nchw(uvw_sm),
            "uvw_sm_masked": to_nchw(uvw_sm_masked),
            "mask": to_nchw(mask), "mask_sm": to_nchw(mask_sm),
            "latent": latent,
        }


# ---------------------------------------------------------------------------
# Unfused -> fused parameter conversion
# ---------------------------------------------------------------------------


def _stack_out(kernels):
    """Stack per-head conv kernels along the OUTPUT channel dim."""
    return jnp.concatenate(kernels, axis=-1)


def fuse_css_variables(variables: dict) -> dict:
    """Convert models.css.CSSNet variables into CSSNetFused layout."""
    p = variables["params"]
    s = variables["batch_stats"]
    fp: dict[str, Any] = {}
    fs: dict[str, Any] = {}

    for shared in ("conv1", "out_lat", "out_u", "out_v", "out_w", "out_mask"):
        fp[shared] = p[shared]
    fp["bn1"] = p["bn1"]
    fs["bn1"] = s["bn1"]
    for blk in ("layer1_0", "layer1_1", "layer2_0", "layer2_1", "layer3_0",
                "layer3_1"):
        fp[blk] = p[blk]
        fs[blk] = s[blk]

    for up_i in (1, 2, 3, 4):
        dc_p: dict[str, Any] = {}
        dc_s: dict[str, Any] = {}
        for j in (0, 1):
            kernels, biases = [], []
            scales, b_biases, means, variances = [], [], [], []
            for prefix in HEADS:
                src_p = p[f"up{up_i}_{prefix}"]["DoubleConv_0"]
                src_s = s[f"up{up_i}_{prefix}"]["DoubleConv_0"]
                kernels.append(src_p[f"Conv_{j}"]["kernel"])
                biases.append(src_p[f"Conv_{j}"]["bias"])
                bn_p = src_p[f"TorchBatchNorm_{j}"]["BatchNorm_0"]
                bn_s = src_s[f"TorchBatchNorm_{j}"]["BatchNorm_0"]
                scales.append(bn_p["scale"])
                b_biases.append(bn_p["bias"])
                means.append(bn_s["mean"])
                variances.append(bn_s["var"])
            dc_p[f"Conv_{j}"] = {
                "kernel": _stack_out(kernels),
                "bias": jnp.concatenate(biases),
            }
            dc_p[f"TorchBatchNorm_{j}"] = {"BatchNorm_0": {
                "scale": jnp.concatenate(scales),
                "bias": jnp.concatenate(b_biases),
            }}
            dc_s[f"TorchBatchNorm_{j}"] = {"BatchNorm_0": {
                "mean": jnp.concatenate(means),
                "var": jnp.concatenate(variances),
            }}
        fp[f"up{up_i}"] = dc_p
        fs[f"up{up_i}"] = dc_s

    # Channel layouts line up without reordering: the unfused Up module
    # concatenates [skip | upsampled] (css.py Up.__call__), which is
    # exactly the fused model's cat(x3, up(x4)) for up1 and the
    # [skip | head_i] per-group layout for up2/up3.
    return {"params": fp, "batch_stats": fs}
