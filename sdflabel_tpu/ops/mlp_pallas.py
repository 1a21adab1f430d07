"""Fused Pallas DeepSDF selection-decode kernel (stage-1 MLP).

Why this kernel exists: the refinement iteration's dominant cost is the
STAGE-1 band-selection decode — the DeepSDF MLP evaluated on the full
64k-point grid (SURVEY.md §6 workload; reference semantics grid.py:43-66
via ops.grid.surface_from_decoder). Under XLA each inter-layer activation
(64k x 512) must round-trip HBM between matmuls (~0.9 GB/iteration even
with XLA's bf16 intermediate storage), which puts stage 1 on the HBM
roofline rather than the MXU roofline. This kernel tiles the grid points
into blocks that stay RESIDENT IN VMEM across all layers, with the whole
folded weight stack (~3.7 MB bf16 at the reference 8x512 architecture)
also VMEM-resident — the only HBM traffic left is the points in and the
sdf values out (~1 MB/iteration), moving stage 1 onto the MXU roofline.

Scope and contract: selection only. The kernel computes bf16-operand /
fp32-accumulate matmuls (the same numerics class as XLA's default TPU
matmul precision on this chain) and is wired through
ops.grid.surface_from_decoder's `select_decoder_fn` seam: it only RANKS
|sdf| to pick band candidates; every selected point is re-decoded by the
exact fp32 decoder in stage 2, so surface values/normals/validity stay
exact (same contract class as models.deepsdf.select_sdf_fn — see that
docstring and QUIRKS.md). Non-differentiable by design: callers use it
under stop_gradient (grid.py stage 1 / band_candidates refresh only).

Supported architectures (everything the bundled and reference DeepSDF
checkpoints use): uniform-width hidden layers (padded up to the max
width, which must be a multiple of 128 lanes), latent re-injection at any
interior layer, xyz_in_all, weight-norm (folded), use_tanh, eval mode.
`pallas_select_fn` returns None for unsupported configs (LayerNorm nets,
widths not divisible by 128) — callers fall back to the plain XLA
select path.

Layout discipline (see ops.splat_pallas for the same rules): per-point
scalars ride the sublane axis as (B, 1) columns; per-feature vectors ride
the lane axis as (1, H) rows. The tiny-K input layers (K = 3 xyz, K =
latent_size) are broadcast multiply-adds on the VPU — never MXU matmuls —
sidestepping Mosaic's small-K relayout blowups. Only the (B, H) @ (H, H)
hidden layers touch the MXU.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM is ~16 MB/core; leave room for activations + pipeline buffers.
_MAX_WEIGHT_VMEM_BYTES = 12 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


class PackedSelectMLP(NamedTuple):
    """Static packing of a folded DeepSDF decoder for the fused kernel.

    ws:    (nh, H, H) bf16 — hidden matmul weights, layer l = j + 1; rows
           beyond the layer's true input width and columns beyond its true
           output width are zero (padding-correct by construction).
    wx:    (nh + 1, 4, H) f32 — xyz broadcast weights for layers 0..nh
           (row 3 is padding); zero where the layer takes no xyz input.
    wlat:  (nh + 1, L, H) f32 — latent weights; zero where no latent input.
    bias:  (nh + 1, H) f32 — biases, zero-padded to H.
    wlast: (1, H) f32 — final (H -> 1) layer weights as a lane row.
    scal:  (1, 4) f32 — [b_last, wxyz_last(3)] (xyz_in_all feeds the last
           layer too; zeros otherwise).
    """

    ws: jax.Array
    wx: jax.Array
    wlat: jax.Array
    bias: jax.Array
    wlast: jax.Array
    scal: jax.Array
    width: int
    n_hidden: int
    use_tanh: bool


def pack_select_mlp(cfg, params) -> PackedSelectMLP | None:
    """Pack a DeepSDFConfig + parameter pytree for the fused kernel.

    Returns None when the architecture is outside the kernel's contract
    (callers fall back to the plain select decoder).
    """
    from sdflabel_tpu.models import deepsdf

    n_lin = cfg.num_layers - 1
    last = n_lin - 1
    nh = last - 1  # hidden (H @ H) matmul layers: l = 1 .. last-1
    if nh < 1:
        return None
    if 0 in cfg.latent_in or last in cfg.latent_in:
        return None
    if (not cfg.weight_norm) and cfg.norm_layers:
        return None  # LayerNorm inside the kernel is not implemented
    hidden = cfg.layer_dims[1:-1]
    H = max(int(d) for d in hidden)
    if H % 128 != 0:
        return None
    L = cfg.latent_size
    if nh * H * H * 2 > _MAX_WEIGHT_VMEM_BYTES:
        return None

    folded = deepsdf.fold_weight_norm(params)

    def w_b(l):
        p = folded[f"lin{l}"]
        return np.asarray(p["w"], np.float32), np.asarray(p["b"], np.float32)

    def tail(l, in_dim):
        """(x_part, has_latent, has_xyz) of linear layer l's input rows."""
        if l == 0:
            return 0, True, True
        if l in cfg.latent_in:
            return in_dim - (L + 3), True, True
        if cfg.xyz_in_all:
            return in_dim - 3, False, True
        return in_dim, False, False

    ws = np.zeros((nh, H, H), np.float32)
    wx = np.zeros((nh + 1, 4, H), np.float32)
    wlat = np.zeros((nh + 1, L, H), np.float32)
    bias = np.zeros((nh + 1, H), np.float32)
    for l in range(last):
        in_dim, out_dim = cfg.layer_io(l)
        w, b = w_b(l)
        x_part, has_lat, has_xyz = tail(l, in_dim)
        if x_part > H or out_dim > H:
            return None
        if l > 0:
            ws[l - 1, :x_part, :out_dim] = w[:x_part]
        pos = x_part
        if has_lat:
            wlat[l, :, :out_dim] = w[pos:pos + L]
            pos += L
        if has_xyz:
            wx[l, :3, :out_dim] = w[pos:pos + 3]
        bias[l, :out_dim] = b

    in_dim, out_dim = cfg.layer_io(last)
    if out_dim != 1:
        return None
    w, b = w_b(last)
    x_part, has_lat, has_xyz = tail(last, in_dim)
    if has_lat or x_part > H:
        return None
    wlast = np.zeros((1, H), np.float32)
    wlast[0, :x_part] = w[:x_part, 0]
    scal = np.zeros((1, 4), np.float32)
    scal[0, 0] = b[0]
    if has_xyz:
        scal[0, 1:4] = w[x_part:x_part + 3, 0]

    return PackedSelectMLP(
        ws=jnp.asarray(ws, jnp.bfloat16),
        wx=jnp.asarray(wx),
        wlat=jnp.asarray(wlat),
        bias=jnp.asarray(bias),
        wlast=jnp.asarray(wlast),
        scal=jnp.asarray(scal),
        width=H,
        n_hidden=nh,
        use_tanh=bool(cfg.use_tanh),
    )


def _select_kernel(xyz_ref, ws_ref, wx_ref, c_ref, wlast_ref, scal_ref,
                   out_ref, *, n_hidden, use_tanh):
    x0 = xyz_ref[:, 0:1]  # (B, 1) point coords on sublanes
    x1 = xyz_ref[:, 1:2]
    x2 = xyz_ref[:, 2:3]

    def xyz_contrib(j):
        # (B,1) x (1,H) broadcast multiply-adds — VPU, no tiny-K matmul
        return (x0 * wx_ref[j, 0:1, :] + x1 * wx_ref[j, 1:2, :]
                + x2 * wx_ref[j, 2:3, :])

    h = jnp.maximum(c_ref[0:1, :] + xyz_contrib(0), 0.0)  # (B, H) f32
    for j in range(n_hidden):
        acc = jnp.dot(h.astype(jnp.bfloat16), ws_ref[j],
                      preferred_element_type=jnp.float32)
        h = jnp.maximum(acc + c_ref[j + 1:j + 2, :] + xyz_contrib(j + 1),
                        0.0)
    s = jnp.sum(h * wlast_ref[0:1, :], axis=1, keepdims=True)  # (B, 1)
    s = s + scal_ref[0, 0]
    s = s + x0 * scal_ref[0, 1] + x1 * scal_ref[0, 2] + x2 * scal_ref[0, 3]
    s = jnp.tanh(s)
    if use_tanh:  # reference applies tanh at the last linear AND self.th
        s = jnp.tanh(s)
    out_ref[:, :] = s


def select_mlp_apply(packed: PackedSelectMLP, latent: jax.Array,
                     points: jax.Array, block: int = 1024) -> jax.Array:
    """Run the fused selection decode: (N, 3) points -> (N,) f32 sdf."""
    n = points.shape[0]
    H, nh = packed.width, packed.n_hidden
    n_pad = _round_up(n, block)
    xyz = jnp.pad(points.astype(jnp.float32), ((0, n_pad - n), (0, 1)))
    # Per-call latent absorption: c_l = b_l + latent @ Wlat_l (tiny einsum;
    # latent is a traced refinement parameter, so this stays in-graph).
    cvec = packed.bias + jnp.einsum(
        "l,jlh->jh", latent.astype(jnp.float32), packed.wlat)

    out = pl.pallas_call(
        functools.partial(_select_kernel, n_hidden=nh,
                          use_tanh=packed.use_tanh),
        grid=(n_pad // block,),
        in_specs=[
            pl.BlockSpec((block, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, H, H), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nh + 1, 4, H), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nh + 1, H), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((block, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * (nh * H * H + 8 * H),
            bytes_accessed=n_pad * 4 * 4 + nh * H * H * 2 + n_pad * 4,
            transcendentals=n_pad * (2 if packed.use_tanh else 1),
        ),
    )(xyz, packed.ws, packed.wx, cvec, packed.wlast, packed.scal)
    return out[:n, 0]


def pallas_select_fn(cfg, params, block: int = 1024):
    """Build a `select_decoder_fn(latent, points) -> (N,) f32` backed by the
    fused kernel, or None when the architecture is unsupported.

    Drop-in for ops.grid.surface_from_decoder(select_decoder_fn=...) and
    engine.refine's `select_decoder` seam — same rank-only contract as
    models.deepsdf.select_sdf_fn, several times less HBM traffic.
    """
    packed = pack_select_mlp(cfg, params)
    if packed is None:
        return None

    # pallas_call has no autodiff rule, and reverse-mode linearization
    # traces through the call even when the caller stop_gradients the
    # output (grid.py stage 1 runs inside the refinement value_and_grad).
    # A zero-cotangent custom VJP is the honest rule here: the selection
    # contract is non-differentiable by design (selection indices carry no
    # gradient — exactly the reference's masked_select semantics).
    @jax.custom_vjp
    def fn(latent, points):
        return select_mlp_apply(packed, latent, points, block=block)

    def fwd(latent, points):
        return fn(latent, points), (latent, points)

    def bwd(res, _ct):
        latent, points = res
        return jnp.zeros_like(latent), jnp.zeros_like(points)

    fn.defvjp(fwd, bwd)
    return fn


def emulate_select_mlp(packed: PackedSelectMLP, latent: jax.Array,
                       points: jax.Array) -> jax.Array:
    """Pure-jnp twin of the kernel math (same casts, same op order) for
    tests: interpret-mode kernel output must match this tightly."""
    xyz = points.astype(jnp.float32)
    cvec = packed.bias + jnp.einsum(
        "l,jlh->jh", latent.astype(jnp.float32), packed.wlat)
    x = [xyz[:, k:k + 1] for k in range(3)]

    def xc(j):
        return sum(x[k] * packed.wx[j, k:k + 1, :] for k in range(3))

    h = jnp.maximum(cvec[0:1, :] + xc(0), 0.0)
    for j in range(packed.n_hidden):
        acc = jnp.dot(h.astype(jnp.bfloat16), packed.ws[j],
                      preferred_element_type=jnp.float32)
        h = jnp.maximum(acc + cvec[j + 1:j + 2, :] + xc(j + 1), 0.0)
    s = jnp.sum(h * packed.wlast[0:1, :], axis=1, keepdims=True)
    s = s + packed.scal[0, 0]
    s = (s + x[0] * packed.scal[0, 1] + x[1] * packed.scal[0, 2]
         + x[2] * packed.scal[0, 3])
    s = jnp.tanh(s)
    if packed.use_tanh:
        s = jnp.tanh(s)
    return s[:, 0]
