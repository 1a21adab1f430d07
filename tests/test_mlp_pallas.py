"""Fused Pallas selection-decode MLP kernel (ops/mlp_pallas.py).

On CPU the kernel runs in interpreter mode (pltpu.force_tpu_interpret_mode);
on a real TPU the same tests compile. Three layers of checks:
  1. kernel == pure-jnp emulation of the identical math (packing + kernel
     wiring are right),
  2. emulation == exact fp32 decoder to bf16 tolerance across every
     architecture knob the reference supports (the packing covers
     latent_in / xyz_in_all / weight_norm / use_tanh correctly),
  3. surface_from_decoder(select_decoder_fn=kernel) reproduces the exact
     pass's valid surface set (the production contract — selection is
     rank-only, stage 2 stays exact; mirrors the select_bf16 test).
"""

import contextlib

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdflabel_tpu.models import deepsdf
from sdflabel_tpu.ops import grid as grid_ops
from sdflabel_tpu.ops import mlp_pallas


def _interpret_ctx():
    if jax.default_backend() == "tpu":
        return contextlib.nullcontext()
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.force_tpu_interpret_mode()


ARCHS = [
    # the reference checkpoint shape (scaled down in width count): plain
    # weight-norm MLP with mid-network latent re-injection
    dict(latent_size=3, dims=(128,) * 4, norm_layers=(0, 1, 2, 3),
         latent_in=(2,), weight_norm=True),
    # no weight-norm, no re-injection
    dict(latent_size=2, dims=(128, 128)),
    # xyz_in_all (xyz concatenated into every layer incl. the last)
    dict(latent_size=4, dims=(128,) * 3, xyz_in_all=True),
    # use_tanh (tanh at the last linear AND the final self.th)
    dict(latent_size=2, dims=(128, 128), use_tanh=True),
    # heterogeneous widths (padded up to the max internally)
    dict(latent_size=3, dims=(128, 256, 128), latent_in=(1,),
         weight_norm=True, norm_layers=(0, 1, 2)),
]


def _build(spec, seed=0):
    cfg = deepsdf.DeepSDFConfig(**spec)
    params = deepsdf.init_params(cfg, jax.random.PRNGKey(seed))
    latent = jnp.asarray(
        np.random.RandomState(seed).randn(cfg.latent_size), jnp.float32)
    return cfg, params, latent


@pytest.mark.parametrize("spec", ARCHS)
def test_kernel_matches_emulation(spec):
    cfg, params, latent = _build(spec)
    packed = mlp_pallas.pack_select_mlp(cfg, params)
    assert packed is not None
    pts = jnp.asarray(
        np.random.RandomState(1).uniform(-1, 1, (777, 3)), jnp.float32)
    want = np.asarray(mlp_pallas.emulate_select_mlp(packed, latent, pts))
    with _interpret_ctx():
        got = np.asarray(
            mlp_pallas.select_mlp_apply(packed, latent, pts, block=256))
    # identical math modulo dot-tiling reassociation (f32 accumulation
    # order differs with the M block size); padding rows must not leak
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-6)


@pytest.mark.parametrize("spec", ARCHS)
def test_packing_matches_exact_decoder(spec):
    """The packed bf16 math tracks the exact fp32 decoder to bf16
    tolerance — the packing (padding, latent absorption, xyz broadcast
    rows) is semantics-preserving on every architecture knob."""
    cfg, params, latent = _build(spec, seed=3)
    packed = mlp_pallas.pack_select_mlp(cfg, params)
    assert packed is not None
    pts = jnp.asarray(
        np.random.RandomState(2).uniform(-1, 1, (500, 3)), jnp.float32)
    exact = np.asarray(deepsdf.sdf_fn(cfg, params)(latent, pts))
    emul = np.asarray(mlp_pallas.emulate_select_mlp(packed, latent, pts))
    np.testing.assert_allclose(emul, exact, rtol=5e-2, atol=2e-2)
    # ranking quality: |sdf| order agreement on the band-selection scale
    k = 64
    top_exact = set(np.argsort(np.abs(exact))[:k].tolist())
    top_emul = set(np.argsort(np.abs(emul))[:k].tolist())
    assert len(top_exact & top_emul) >= int(0.9 * k)


def test_unsupported_architectures_return_none():
    # LayerNorm (norm_layers without weight_norm) is outside the kernel
    cfg = deepsdf.DeepSDFConfig(latent_size=2, dims=(128, 128),
                                norm_layers=(0, 1), weight_norm=False)
    params = deepsdf.init_params(cfg, jax.random.PRNGKey(0))
    assert mlp_pallas.pallas_select_fn(cfg, params) is None
    # width not a multiple of 128 lanes
    cfg = deepsdf.DeepSDFConfig(latent_size=2, dims=(96, 96))
    params = deepsdf.init_params(cfg, jax.random.PRNGKey(0))
    assert mlp_pallas.pallas_select_fn(cfg, params) is None
    # no hidden (H @ H) matmul layer
    cfg = deepsdf.DeepSDFConfig(latent_size=2, dims=(128,))
    params = deepsdf.init_params(cfg, jax.random.PRNGKey(0))
    assert mlp_pallas.pallas_select_fn(cfg, params) is None


def test_surface_from_decoder_integration():
    """Production contract: pallas selection + exact stage 2 reproduces
    the full-precision pass's valid surface set (rank swaps can only
    occur at the band edge; this decoder's margins are far wider)."""
    cfg, params, latent = _build(ARCHS[0], seed=7)
    exact = deepsdf.sdf_fn(cfg, params)

    def dec(lat, p):
        return jnp.linalg.norm(p, axis=-1) - 0.6 + 0.05 * exact(lat, p)

    sel = mlp_pallas.pallas_select_fn(cfg, params, block=256)
    assert sel is not None

    def dec_sel(lat, p):
        return jnp.linalg.norm(p, axis=-1) - 0.6 + 0.05 * sel(lat, p)

    pts = grid_ops.generate_point_grid(16)
    full, _ = grid_ops.surface_from_decoder(dec, latent, pts, capacity=256)
    with _interpret_ctx():
        hyb, _ = grid_ops.surface_from_decoder(
            dec, latent, pts, capacity=256, select_decoder_fn=dec_sel)

    def valid_sorted(s):
        pts_v = np.asarray(s.points)[np.asarray(s.mask)]
        return pts_v[np.lexsort(pts_v.T)]

    a, b = valid_sorted(full), valid_sorted(hyb)
    assert a.shape == b.shape and a.shape[0] > 30
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_padding_boundary():
    """N not divisible by the block size: padded rows never leak into the
    output, and outputs are identical across block sizes."""
    cfg, params, latent = _build(ARCHS[1], seed=5)
    packed = mlp_pallas.pack_select_mlp(cfg, params)
    pts = jnp.asarray(
        np.random.RandomState(3).uniform(-1, 1, (130, 3)), jnp.float32)
    with _interpret_ctx():
        a = np.asarray(
            mlp_pallas.select_mlp_apply(packed, latent, pts, block=128))
        b = np.asarray(
            mlp_pallas.select_mlp_apply(packed, latent, pts, block=256))
    assert a.shape == (130,)
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_refine_loop_with_pallas_select():
    """The kernel runs INSIDE the jitted refinement value_and_grad (the
    production seam: engine.refine select_decoder). The zero-cotangent
    custom VJP must keep linearization away from pallas_call, and the
    trajectory must match the exact path (selection margins dwarf the
    bf16 ranking noise on this decoder)."""
    from sdflabel_tpu.engine import refine
    from sdflabel_tpu.renderer import rasterer as rast_mod

    cfg, params, _ = _build(ARCHS[0], seed=11)
    exact = deepsdf.sdf_fn(cfg, params)
    sel_net = mlp_pallas.pallas_select_fn(cfg, params, block=256)
    assert sel_net is not None

    def dec(lat, p):
        return jnp.linalg.norm(p, axis=-1) - 0.6 + 0.05 * exact(lat, p)

    def dec_sel(lat, p):
        return jnp.linalg.norm(p, axis=-1) - 0.6 + 0.05 * sel_net(lat, p)

    crop_hw = (16, 16)
    K = jnp.asarray(rast_mod.calibration_matrix((16, 16)))
    grid_pts = grid_ops.generate_point_grid(16)
    rcfg = refine.RefineConfig(iters=3, surface_capacity=256)
    rng = np.random.RandomState(4)
    init = refine.init_refine_params(0.3, [0.0, 0.0, 4.0], 2.0,
                                     [1.0, 0.0, 0.0])
    nocs = jnp.asarray(rng.rand(3, 16, 16), jnp.float32)
    frustum = jnp.asarray(rng.randn(512, 3) * 0.3 + [0, 0, 4.0],
                          jnp.float32)
    fmask = jnp.ones((512,), bool)
    args = (init, nocs, frustum, fmask)

    fn_ref = jax.jit(refine.make_refine_fn(dec, rcfg, grid_pts, K, crop_hw))
    fn_pal = jax.jit(refine.make_refine_fn(dec, rcfg, grid_pts, K, crop_hw,
                                           select_decoder=dec_sel))
    f_ref, h_ref = fn_ref(*args)
    with _interpret_ctx():
        f_pal, h_pal = fn_pal(*args)
    np.testing.assert_allclose(np.asarray(h_pal.loss),
                               np.asarray(h_ref.loss), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(f_pal.trans),
                               np.asarray(f_ref.trans), atol=1e-5)
    np.testing.assert_allclose(np.asarray(f_pal.latent),
                               np.asarray(f_ref.latent), atol=1e-5)
