"""Fused Pallas stage-2 decode: differentiable MLP + analytic normals.

Why this kernel exists: the refinement iteration's stage 2 re-decodes the
K selected band points differentiably and takes per-point SDF gradients
for the isosurface normals (ops.grid._stage2_surface — reference
semantics grid.py:43-71 + optimizer.py:99-107). Under XLA that is three
matmul chains (forward, normals-vjp, loss-backward) plus ~100 us/iter of
inter-layer cast/relu-mask plumbing fusions (round-3 profile: ~330 us
against a 229 us MXU bound at the 4096 x 8x512 production scale; the
warm-band path is stage-2-DOMINATED, and the capacity-8192 crop path
doubles it). This kernel runs the forward and the normals reverse sweep
in ONE launch with every activation VMEM-resident, and the loss backward
as a second launch that recomputes the forward in-block — no inter-layer
HBM traffic anywhere.

Numerics contract: bf16-operand / fp32-accumulate matmuls — the SAME
class XLA's default TPU precision uses for this fp32-stored chain (the
engine has never pinned stage 2 to HIGHEST), with activations held fp32
in VMEM (XLA stores bf16 between fusions — this kernel is slightly
tighter). Values match the emulation twin bit-for-bit in interpret mode
and the fp32 decoder to bf16-matmul tolerance.

Differentiation contract: gradients flow w.r.t. the LATENT (through the
per-layer cvec absorption einsum, which stays in XLA-land) and the input
POINTS. The NORMALS OUTPUT IS NON-DIFFERENTIABLE: its cotangent is
ignored by the backward — exactly the engine's semantics, which
stop-gradients the normals before use (grid.py _stage2_surface,
optimizer.py:107 discards the inner-backward grads). Do not use this
kernel where normals must carry gradients, or where the DECODER WEIGHTS
are being trained (DeepSDF training keeps the flax path).

Packing and layout are shared with ops.mlp_pallas (PackedSelectMLP):
per-point scalars on sublanes as (B, 1) columns, per-feature vectors on
lanes, tiny-K xyz/latent layers as VPU broadcast multiply-adds, hidden
layers as (B, H) @ (H, H) MXU matmuls; the backward's dh = dpre @ W^T
runs as a dot_general contraction on the same weight stack (no
transposed copy in VMEM).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sdflabel_tpu.ops.mlp_pallas import PackedSelectMLP, pack_select_mlp


def _round_up(x, m):
    return (x + m - 1) // m * m


def _fwd_body(xyz_ref, ws_ref, wx_ref, c_ref, wlast_ref, scal_ref, h_scr,
              *, n_hidden, use_tanh):
    """Shared forward: returns (final, t1, d_pre_base, xs) and fills h_scr
    with every relu activation (h_scr[j] = h_j, j = 0..n_hidden)."""
    x0 = xyz_ref[:, 0:1]
    x1 = xyz_ref[:, 1:2]
    x2 = xyz_ref[:, 2:3]

    def xc(j):
        return (x0 * wx_ref[j, 0:1, :] + x1 * wx_ref[j, 1:2, :]
                + x2 * wx_ref[j, 2:3, :])

    h = jnp.maximum(c_ref[0:1, :] + xc(0), 0.0)
    h_scr[0] = h
    for j in range(n_hidden):
        acc = jnp.dot(h.astype(jnp.bfloat16), ws_ref[j],
                      preferred_element_type=jnp.float32)
        h = jnp.maximum(acc + c_ref[j + 1:j + 2, :] + xc(j + 1), 0.0)
        h_scr[j + 1] = h
    s = jnp.sum(h * wlast_ref[0:1, :], axis=1, keepdims=True)  # (B, 1)
    s = s + scal_ref[0, 0]
    s = s + x0 * scal_ref[0, 1] + x1 * scal_ref[0, 2] + x2 * scal_ref[0, 3]
    t1 = jnp.tanh(s)
    final = jnp.tanh(t1) if use_tanh else t1
    # d(final)/d(s): tanh chain
    d_pre = 1.0 - t1 * t1
    if use_tanh:
        d_pre = d_pre * (1.0 - final * final)
    return final, d_pre, (x0, x1, x2)


def _reverse_sweep(ct, ws_ref, wx_ref, wlast_ref, scal_ref, h_scr,
                   *, n_hidden, want_dcvec, dc_scr=None):
    """Backward through the MLP with per-point cotangent `ct` (B, 1) on the
    pre-tanh scalar. Returns (dx0, dx1, dx2) each (B, 1); when want_dcvec,
    also accumulates per-layer Σ_points dpre into dc_scr (n_hidden+1, H).
    """
    dh = ct * wlast_ref[0:1, :]  # (B, H)
    dx0 = ct * scal_ref[0, 1]
    dx1 = ct * scal_ref[0, 2]
    dx2 = ct * scal_ref[0, 3]
    for j in range(n_hidden, -1, -1):
        dpre = jnp.where(h_scr[j] > 0.0, dh, 0.0)  # (B, H)
        if want_dcvec:
            dc_scr[j] = dc_scr[j] + jnp.sum(dpre, axis=0)
        dx0 = dx0 + jnp.sum(dpre * wx_ref[j, 0:1, :], axis=1, keepdims=True)
        dx1 = dx1 + jnp.sum(dpre * wx_ref[j, 1:2, :], axis=1, keepdims=True)
        dx2 = dx2 + jnp.sum(dpre * wx_ref[j, 2:3, :], axis=1, keepdims=True)
        if j > 0:
            # dh_{j-1} = dpre @ ws[j-1]^T (contract the OUTPUT dim)
            dh = jax.lax.dot_general(
                dpre.astype(jnp.bfloat16), ws_ref[j - 1],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
    return dx0, dx1, dx2


def _stage2_fwd_kernel(xyz_ref, ws_ref, wx_ref, c_ref, wlast_ref, scal_ref,
                       out_ref, h_scr, *, n_hidden, use_tanh):
    final, d_pre, _ = _fwd_body(xyz_ref, ws_ref, wx_ref, c_ref, wlast_ref,
                                scal_ref, h_scr, n_hidden=n_hidden,
                                use_tanh=use_tanh)
    # normals = d(final)/d(xyz): reverse sweep with cotangent d_pre
    dx0, dx1, dx2 = _reverse_sweep(d_pre, ws_ref, wx_ref, wlast_ref,
                                   scal_ref, h_scr, n_hidden=n_hidden,
                                   want_dcvec=False)
    out_ref[:, 0:1] = final
    out_ref[:, 1:2] = dx0
    out_ref[:, 2:3] = dx1
    out_ref[:, 3:4] = dx2


def _stage2_bwd_kernel(xyz_ref, ws_ref, wx_ref, c_ref, wlast_ref, scal_ref,
                       ct_ref, dxyz_ref, dcvec_ref, h_scr, dc_scr,
                       *, n_hidden, use_tanh, n_blocks):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _init():
        dc_scr[...] = jnp.zeros_like(dc_scr)

    _final, d_pre, _ = _fwd_body(xyz_ref, ws_ref, wx_ref, c_ref, wlast_ref,
                                 scal_ref, h_scr, n_hidden=n_hidden,
                                 use_tanh=use_tanh)
    ct = ct_ref[:, 0:1] * d_pre  # loss cotangent through the tanh chain
    dx0, dx1, dx2 = _reverse_sweep(ct, ws_ref, wx_ref, wlast_ref, scal_ref,
                                   h_scr, n_hidden=n_hidden,
                                   want_dcvec=True, dc_scr=dc_scr)
    dxyz_ref[:, 0:1] = dx0
    dxyz_ref[:, 1:2] = dx1
    dxyz_ref[:, 2:3] = dx2
    dxyz_ref[:, 3:4] = jnp.zeros_like(dx0)

    @pl.when(b == n_blocks - 1)
    def _emit():
        dcvec_ref[...] = dc_scr[...]


def _pad_pts(points, block):
    n = points.shape[0]
    n_pad = _round_up(max(n, block), block)
    return jnp.pad(points.astype(jnp.float32), ((0, n_pad - n), (0, 1))), n_pad


def _common_specs(packed, block):
    H, nh = packed.width, packed.n_hidden
    return [
        pl.BlockSpec((block, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((nh, H, H), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nh + 1, 4, H), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nh + 1, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
    ]


def stage2_fwd_apply(packed: PackedSelectMLP, cvec, points, block=512):
    """(N, 3) points -> (sdf (N,), raw normals g (N, 3)) in one launch."""
    n = points.shape[0]
    H, nh = packed.width, packed.n_hidden
    xyz, n_pad = _pad_pts(points, block)
    out = pl.pallas_call(
        functools.partial(_stage2_fwd_kernel, n_hidden=nh,
                          use_tanh=packed.use_tanh),
        grid=(n_pad // block,),
        in_specs=_common_specs(packed, block),
        out_specs=pl.BlockSpec((block, 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 4), jnp.float32),
        scratch_shapes=[pltpu.VMEM((nh + 1, block, H), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n_pad * (nh * H * H + 8 * H),
            bytes_accessed=n_pad * 4 * 4 + nh * H * H * 2 + n_pad * 16,
            transcendentals=n_pad * 2,
        ),
    )(xyz, packed.ws, packed.wx, cvec, packed.wlast, packed.scal)
    return out[:n, 0], out[:n, 1:4]


def stage2_bwd_apply(packed: PackedSelectMLP, cvec, points, ct_sdf,
                     block=512):
    """Backward: cotangent on sdf -> (d_cvec (nh+1, H), d_points (N, 3))."""
    n = points.shape[0]
    H, nh = packed.width, packed.n_hidden
    xyz, n_pad = _pad_pts(points, block)
    ct = jnp.pad(ct_sdf.astype(jnp.float32).reshape(-1, 1),
                 ((0, n_pad - n), (0, 0)))
    n_blocks = n_pad // block
    dxyz, dcvec = pl.pallas_call(
        functools.partial(_stage2_bwd_kernel, n_hidden=nh,
                          use_tanh=packed.use_tanh, n_blocks=n_blocks),
        grid=(n_blocks,),
        in_specs=_common_specs(packed, block) + [
            pl.BlockSpec((block, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nh + 1, H), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 4), jnp.float32),
            jax.ShapeDtypeStruct((nh + 1, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((nh + 1, block, H), jnp.float32),
            pltpu.VMEM((nh + 1, H), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n_pad * (nh * H * H + 8 * H),
            bytes_accessed=n_pad * 4 * 4 + nh * H * H * 2 + n_pad * 16,
            transcendentals=n_pad * 2,
        ),
    )(xyz, packed.ws, packed.wx, cvec, packed.wlast, packed.scal, ct)
    return dcvec, dxyz[:n, :3]


def pallas_stage2_fn(cfg, params, block: int = 512):
    """Build `stage2_fn(latent, points) -> (sdf (N,), raw_normals (N,3))`
    for ops.grid._stage2_surface's kernel seam, or None when the
    architecture is outside the packing contract (same rules as
    mlp_pallas.pallas_select_fn). Differentiable in latent and points;
    the normals output's cotangent is DISCARDED by contract (callers
    stop-gradient it — see module docstring)."""
    packed = pack_select_mlp(cfg, params)
    if packed is None:
        return None

    @jax.custom_vjp
    def core(cvec, points):
        return stage2_fwd_apply(packed, cvec, points, block=block)

    def core_fwd(cvec, points):
        out = stage2_fwd_apply(packed, cvec, points, block=block)
        return out, (cvec, points)

    def core_bwd(res, cts):
        cvec, points = res
        ct_sdf, _ct_g_ignored = cts  # normals are stop-gradded by contract
        dcvec, dpts = stage2_bwd_apply(packed, cvec, points, ct_sdf,
                                       block=block)
        return dcvec, dpts

    core.defvjp(core_fwd, core_bwd)

    def stage2(latent, points):
        # latent absorption stays in XLA-land so d_latent flows through
        # the einsum transpose (identical to mlp_pallas.select_mlp_apply)
        cvec = packed.bias + jnp.einsum(
            "l,jlh->jh", latent.astype(jnp.float32), packed.wlat)
        return core(cvec, points)

    return stage2


def emulate_stage2(packed: PackedSelectMLP, latent, points):
    """Pure-jnp twin (same casts/op order) of stage2_fwd_apply for tests."""
    from sdflabel_tpu.ops.mlp_pallas import emulate_select_mlp  # noqa: F401

    def f(lat, pts):
        cvec = packed.bias + jnp.einsum(
            "l,jlh->jh", lat.astype(jnp.float32), packed.wlat)
        xyz = pts.astype(jnp.float32)
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

    sdf, vjp_fn = jax.vjp(lambda p: f(latent, p), points)
    (g,) = vjp_fn(jnp.ones_like(sdf))
    return sdf, g
