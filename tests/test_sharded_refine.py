"""Grid+pixel-sharded refinement vs the single-device engine."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdflabel_tpu.engine import refine as refine_mod
from sdflabel_tpu.ops import grid as grid_ops
from sdflabel_tpu.parallel import mesh as mesh_mod, sharded_refine
from sdflabel_tpu.renderer import rasterer as rast_mod


def _sphere_decoder(radius=0.45):
    def fn(latent, pts):
        return jnp.linalg.norm(pts, axis=-1) - (radius + 0.1 * latent[0])

    return fn


@pytest.fixture(scope="module")
def problem():
    crop_hw = (24, 24)
    K = rast_mod.calibration_matrix((24, 24))
    grid_pts = grid_ops.generate_point_grid(24)
    decoder = _sphere_decoder()
    cfg = refine_mod.RefineConfig(iters=10, surface_capacity=1024)

    gt = refine_mod.init_refine_params(0.4, [0.05, -0.02, 4.0], 2.0,
                                       [0.0, 0.0, 0.0])
    surf, _ = grid_ops.surface_from_decoder(decoder, gt.latent, grid_pts,
                                            capacity=1024)
    pose = refine_mod.build_render_pose(gt.yaw, gt.trans)
    rendering, points = rast_mod.render(
        jnp.asarray(K), (24, 24), surf.points, surf.normals, surf.normals,
        pose, point_mask=surf.mask, rot="dcm", primitives="disc",
        output_nocs=True,
    )
    xyz = np.asarray(points.xyz)[np.asarray(points.front_mask)]
    scene = xyz * 2.0
    cap = 2048
    frustum = np.zeros((cap, 3), np.float32)
    frustum[: len(scene)] = scene[:cap]
    fmask = np.zeros(cap, bool)
    fmask[: min(len(scene), cap)] = True
    init = refine_mod.init_refine_params(0.45, [0.05, -0.02, 4.05], 2.08,
                                         [0.0, 0.0, 0.0])
    return (decoder, cfg, grid_pts, K, crop_hw, rendering.color,
            jnp.asarray(frustum), jnp.asarray(fmask), init)


def test_sharded_matches_single_device(problem):
    (decoder, cfg, grid_pts, K, crop_hw, nocs, frustum, fmask,
     init) = problem
    mesh = mesh_mod.make_mesh(n_data=1, n_rays=8)

    single = jax.jit(refine_mod.make_refine_fn(
        decoder, cfg, grid_pts, jnp.asarray(K), crop_hw
    ))
    final_s, hist_s = single(init, nocs, frustum, fmask)

    sharded_fn = sharded_refine.make_sharded_refine_fn(
        decoder, cfg, np.asarray(grid_pts), K, crop_hw, mesh, axis="rays"
    )
    final_m, hist_m = sharded_fn(init, nocs, frustum, fmask)

    # First iterations match tightly; tiny fp ordering differences in the
    # distributed top-k/summations compound over the trajectory — accept
    # ~1% drift over 10 iterations (same basin, same optimum).
    np.testing.assert_allclose(np.asarray(hist_m)[:2],
                               np.asarray(hist_s.loss)[:2], rtol=1e-4)
    np.testing.assert_allclose(np.asarray(hist_m), np.asarray(hist_s.loss),
                               rtol=2e-2, atol=1e-3)
    for a, b, name in (
        (final_m.yaw, final_s.yaw, "yaw"),
        (final_m.trans, final_s.trans, "trans"),
        (final_m.scale, final_s.scale, "scale"),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-2,
                                   err_msg=name)
    # the raw latent magnitude is meaningless (it is re-normalized to the
    # sphere every iteration); compare the effective direction
    la = np.asarray(final_m.latent)
    lb = np.asarray(final_s.latent)
    np.testing.assert_allclose(la / max(np.linalg.norm(la), 1e-9),
                               lb / max(np.linalg.norm(lb), 1e-9), atol=1e-3)


def test_sharded_fused_matches_dense():
    """Per-shard fused Pallas splat (interpret mode on CPU) tracks the dense
    oracle within the kernel's documented tolerance (2e-4 noise +
    footprint-boundary bit flips; test_splat_pallas.py)."""
    from jax.experimental.pallas import tpu as pltpu

    crop_hw = (16, 16)
    K = rast_mod.calibration_matrix((16, 16))
    grid_pts = grid_ops.generate_point_grid(16)
    decoder = _sphere_decoder()
    cfg = refine_mod.RefineConfig(iters=2, surface_capacity=256)
    mesh = mesh_mod.make_mesh(n_data=1, n_rays=2,
                              devices=jax.devices()[:2])
    init = refine_mod.init_refine_params(0.45, [0.05, -0.02, 4.05], 2.08,
                                         [0.0, 0.0, 0.0])
    rng = np.random.RandomState(0)
    nocs = jnp.asarray(rng.rand(3, 16, 16), jnp.float32) * 0.5
    frustum = jnp.asarray(rng.randn(512, 3) * 0.4 + [0, 0, 8.0], jnp.float32)
    fmask = jnp.ones((512,), bool)

    dense_fn = sharded_refine.make_sharded_refine_fn(
        decoder, cfg, np.asarray(grid_pts), K, crop_hw, mesh, axis="rays",
        use_fused=False,
    )
    _, hist_dense = dense_fn(init, nocs, frustum, fmask)

    fused_fn = sharded_refine.make_sharded_refine_fn(
        decoder, cfg, np.asarray(grid_pts), K, crop_hw, mesh, axis="rays",
        use_fused=True,
    )
    with pltpu.force_tpu_interpret_mode():
        _, hist_fused = fused_fn(init, nocs, frustum, fmask)

    hd, hf = np.asarray(hist_dense), np.asarray(hist_fused)
    assert np.isfinite(hf).all()
    np.testing.assert_allclose(hf, hd, rtol=2e-2, atol=5e-3)


def test_sharded_coarse_to_fine_matches(problem):
    """Distributed coarse-to-fine selection tracks the exact sharded path
    (identical valid band for a distance-like SDF, fp-reorder drift only)."""
    import dataclasses

    (decoder, cfg, grid_pts, K, crop_hw, nocs, frustum, fmask,
     init) = problem
    mesh = mesh_mod.make_mesh(n_data=1, n_rays=8)
    cfg5 = dataclasses.replace(cfg, iters=5)
    exact_fn = sharded_refine.make_sharded_refine_fn(
        decoder, cfg5, np.asarray(grid_pts), K, crop_hw, mesh, axis="rays"
    )
    _, hist_exact = exact_fn(init, nocs, frustum, fmask)

    cfg_c2f = dataclasses.replace(cfg5, coarse_cells=600)
    c2f_fn = sharded_refine.make_sharded_refine_fn(
        decoder, cfg_c2f, np.asarray(grid_pts), K, crop_hw, mesh,
        axis="rays",
    )
    _, hist_c2f = c2f_fn(init, nocs, frustum, fmask)
    np.testing.assert_allclose(np.asarray(hist_c2f), np.asarray(hist_exact),
                               rtol=1e-3)

    # over-tight budget raises an actionable error
    with pytest.raises(ValueError, match="coarse_cells"):
        sharded_refine.make_sharded_refine_fn(
            decoder, dataclasses.replace(cfg5, coarse_cells=8),
            np.asarray(grid_pts), K, crop_hw, mesh, axis="rays",
        )


def test_sharded_warm_band_matches(problem):
    """Distributed warm-started band: refresh=1 reproduces the exact
    sharded path (same selected set each iteration, fp-reorder drift
    only); refresh=3 still tracks it (latent drift below band margins).
    The cond's collectives execute coherently on the 8-device mesh."""
    import dataclasses

    (decoder, cfg, grid_pts, K, crop_hw, nocs, frustum, fmask,
     init) = problem
    mesh = mesh_mod.make_mesh(n_data=1, n_rays=8)
    cfg5 = dataclasses.replace(cfg, iters=5)
    exact_fn = sharded_refine.make_sharded_refine_fn(
        decoder, cfg5, np.asarray(grid_pts), K, crop_hw, mesh, axis="rays"
    )
    _, hist_exact = exact_fn(init, nocs, frustum, fmask)

    for refresh, rtol in ((1, 1e-4), (3, 1e-3)):
        cfg_w = dataclasses.replace(cfg5, warm_band=cfg.surface_capacity,
                                    warm_refresh=refresh)
        warm_fn = sharded_refine.make_sharded_refine_fn(
            decoder, cfg_w, np.asarray(grid_pts), K, crop_hw, mesh,
            axis="rays",
        )
        _, hist_warm = warm_fn(init, nocs, frustum, fmask)
        np.testing.assert_allclose(np.asarray(hist_warm),
                                   np.asarray(hist_exact), rtol=rtol,
                                   err_msg=f"refresh={refresh}")

    with pytest.raises(ValueError, match="pool == "):
        sharded_refine.make_sharded_refine_fn(
            decoder, dataclasses.replace(cfg5, warm_band=123),
            np.asarray(grid_pts), K, crop_hw, mesh, axis="rays",
        )
    with pytest.raises(ValueError, match="at most one"):
        sharded_refine.make_sharded_refine_fn(
            decoder,
            dataclasses.replace(cfg5, warm_band=cfg.surface_capacity,
                                coarse_cells=600),
            np.asarray(grid_pts), K, crop_hw, mesh, axis="rays",
        )


def test_sharded_select_decoder_matches(problem):
    """A cheaper selection decoder (bf16 twin here; the Pallas kernel in
    production) through every selection branch — exact stage-1, the
    coarse-to-fine stage-0, and the warm-band refresh — reproduces the
    exact sharded trajectory: the sphere band's |sdf| margins dwarf bf16
    eps so the selected set is identical, and stage 2 always re-decodes
    with the exact decoder."""
    import dataclasses

    (decoder, cfg, grid_pts, K, crop_hw, nocs, frustum, fmask,
     init) = problem
    mesh = mesh_mod.make_mesh(n_data=1, n_rays=8)
    cfg5 = dataclasses.replace(cfg, iters=5)

    def select_dec(latent, p):
        return decoder(latent.astype(jnp.bfloat16),
                       p.astype(jnp.bfloat16)).astype(jnp.float32)

    exact_fn = sharded_refine.make_sharded_refine_fn(
        decoder, cfg5, np.asarray(grid_pts), K, crop_hw, mesh, axis="rays"
    )
    _, hist_exact = exact_fn(init, nocs, frustum, fmask)

    variants = {
        "stage1": cfg5,
        "c2f": dataclasses.replace(cfg5, coarse_cells=600),
        "warm": dataclasses.replace(cfg5, warm_band=cfg.surface_capacity,
                                    warm_refresh=2),
    }
    for name, vcfg in variants.items():
        fn = sharded_refine.make_sharded_refine_fn(
            decoder, vcfg, np.asarray(grid_pts), K, crop_hw, mesh,
            axis="rays", select_decoder=select_dec,
        )
        _, hist = fn(init, nocs, frustum, fmask)
        np.testing.assert_allclose(np.asarray(hist), np.asarray(hist_exact),
                                   rtol=2e-3, err_msg=name)


def test_sharded_gradient_parity_per_loss_path():
    """One optimizer step, sharded vs single-device, each loss path in
    isolation: SGD steps expose the raw gradients, so this pins the
    pmean-on-backward accounting exactly (a missing/incorrect collective
    shows up as an n_dev-factor error)."""
    import dataclasses

    crop = (16, 16)
    K = rast_mod.calibration_matrix((16, 16))
    grid_pts = grid_ops.generate_point_grid(16)

    def dec(latent, p):
        r = 0.45 + 0.1 * latent[0] + 0.05 * latent[1]
        return jnp.linalg.norm(p, axis=-1) - r

    mesh = mesh_mod.make_mesh(n_data=1, n_rays=8)
    init = refine_mod.init_refine_params(0.45, [0.05, -0.02, 4.05], 2.08,
                                         [0.2, -0.1, 0.05])
    rng = np.random.RandomState(0)
    nocs = jnp.asarray(rng.rand(3, 16, 16), jnp.float32) * 0.5
    fr = jnp.asarray(rng.randn(512, 3) * 0.4 + [0, 0, 8.0], jnp.float32)
    fm = jnp.ones((512,), bool)

    base = refine_mod.RefineConfig(iters=1, surface_capacity=500)  # %8 != 0
    for w2, w3 in ((0.0, 0.5), (0.3, 0.0)):
        cfg = dataclasses.replace(base, weight_2d=w2, weight_3d=w3)
        single = jax.jit(refine_mod.make_refine_fn(
            dec, cfg, grid_pts, jnp.asarray(K), crop))
        f_s, _ = single(init, nocs, fr, fm)
        fn_sh = sharded_refine.make_sharded_refine_fn(
            dec, cfg, np.asarray(grid_pts), K, crop, mesh, axis="rays")
        f_m, _ = fn_sh(init, nocs, fr, fm)
        for name in ("yaw", "trans", "scale", "latent"):
            a = (np.asarray(getattr(f_s, name))
                 - np.asarray(getattr(init, name))).ravel()
            b = (np.asarray(getattr(f_m, name))
                 - np.asarray(getattr(init, name))).ravel()
            np.testing.assert_allclose(
                b, a, rtol=2e-3, atol=1e-12,
                err_msg=f"w2={w2} w3={w3} {name}",
            )


def test_sharded_refine_converges(problem):
    (decoder, cfg, grid_pts, K, crop_hw, nocs, frustum, fmask,
     init) = problem
    mesh = mesh_mod.make_mesh(n_data=2, n_rays=4)
    fn = sharded_refine.make_sharded_refine_fn(
        decoder, cfg, np.asarray(grid_pts), K, crop_hw, mesh, axis="rays"
    )
    final, hist = fn(init, nocs, frustum, fmask)
    losses = np.asarray(hist)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert abs(float(final.scale[0]) - 2.0) < 0.08


def test_sharded_windowed_2d_matches_dense(problem):
    """windowed_2d (offset-window gather) reproduces the dense sharded 2D
    loss trajectory (see parallel/sharded_refine.py windowed branch)."""
    (decoder, cfg, grid_pts, K, crop_hw, nocs, frustum, fmask,
     init) = problem
    cfg = refine_mod.RefineConfig(iters=4, surface_capacity=1024)
    mesh = mesh_mod.make_mesh(n_data=1, n_rays=8)
    dense_fn = sharded_refine.make_sharded_refine_fn(
        decoder, cfg, np.asarray(grid_pts), K, crop_hw, mesh, axis="rays",
        windowed_2d=False)
    win_fn = sharded_refine.make_sharded_refine_fn(
        decoder, cfg, np.asarray(grid_pts), K, crop_hw, mesh, axis="rays",
        windowed_2d=True)
    final_d, hist_d = dense_fn(init, nocs, frustum, fmask)
    final_w, hist_w = win_fn(init, nocs, frustum, fmask)
    np.testing.assert_allclose(np.asarray(hist_w), np.asarray(hist_d),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(final_w.trans),
                               np.asarray(final_d.trans), atol=1e-5)


def test_sharded_odd_sizes_match_single_device():
    """Pixel AND grid padding paths: crop 10x10 (100 px, pad 4 on 8
    devices) with grid density 15 (3375 points, pad 7). The 1e3/1e6
    sentinels must stay out of selection, render, and both losses —
    including against a decoder whose tanh-bounded output is small at the
    pad coordinate. Runs the dense and windowed 2D-loss variants; the
    diam-5 disc covers the whole 10x10 crop from center pixels, so the
    windowed fallback gating is live here too."""
    crop_hw = (10, 10)
    K = rast_mod.calibration_matrix(crop_hw)
    grid_pts = grid_ops.generate_point_grid(15)
    decoder = _sphere_decoder()
    cfg = refine_mod.RefineConfig(iters=6, surface_capacity=512)

    gt = refine_mod.init_refine_params(0.4, [0.05, -0.02, 4.0], 2.0,
                                       [0.0, 0.0, 0.0])
    surf, _ = grid_ops.surface_from_decoder(decoder, gt.latent, grid_pts,
                                            capacity=512)
    pose = refine_mod.build_render_pose(gt.yaw, gt.trans)
    rendering, points = rast_mod.render(
        jnp.asarray(K), crop_hw, surf.points, surf.normals, surf.normals,
        pose, point_mask=surf.mask, rot="dcm", primitives="disc",
        output_nocs=True,
    )
    xyz = np.asarray(points.xyz)[np.asarray(points.front_mask)]
    frustum = np.zeros((512, 3), np.float32)
    frustum[: len(xyz)] = xyz[:512] * 2.0
    fmask = np.zeros(512, bool)
    fmask[: min(len(xyz), 512)] = True
    init = refine_mod.init_refine_params(0.45, [0.05, -0.02, 4.05], 2.08,
                                         [0.0, 0.0, 0.0])

    single = jax.jit(refine_mod.make_refine_fn(
        decoder, cfg, grid_pts, jnp.asarray(K), crop_hw))
    final_s, hist_s = single(init, rendering.color, jnp.asarray(frustum),
                             jnp.asarray(fmask))

    mesh = mesh_mod.make_mesh(n_data=1, n_rays=8)
    for windowed in (False, True):
        fn = sharded_refine.make_sharded_refine_fn(
            decoder, cfg, np.asarray(grid_pts), K, crop_hw, mesh,
            axis="rays", windowed_2d=windowed)
        final_m, hist_m = fn(init, rendering.color, jnp.asarray(frustum),
                             jnp.asarray(fmask))
        np.testing.assert_allclose(np.asarray(hist_m)[:2],
                                   np.asarray(hist_s.loss)[:2], rtol=1e-4,
                                   err_msg=f"windowed={windowed}")
        np.testing.assert_allclose(np.asarray(hist_m),
                                   np.asarray(hist_s.loss),
                                   rtol=2e-2, atol=1e-3,
                                   err_msg=f"windowed={windowed}")
        np.testing.assert_allclose(np.asarray(final_m.trans),
                                   np.asarray(final_s.trans), atol=1e-2)


def test_sharded_composed_warm_refresh_matches(problem):
    """Composed warm refresh on the mesh (warm_refresh_cells): the
    periodic refresh runs the sharded cell pass; with budget margin the
    trajectory tracks plain sharded warm. Overflowing pools raise with
    the right knob name."""
    import dataclasses

    (decoder, cfg, grid_pts, K, crop_hw, nocs, frustum, fmask,
     init) = problem
    mesh = mesh_mod.make_mesh(n_data=1, n_rays=8)
    cfg_w = dataclasses.replace(cfg, iters=5,
                                warm_band=cfg.surface_capacity,
                                warm_refresh=3)
    plain_fn = sharded_refine.make_sharded_refine_fn(
        decoder, cfg_w, np.asarray(grid_pts), K, crop_hw, mesh,
        axis="rays")
    _, hist_plain = plain_fn(init, nocs, frustum, fmask)

    cfg_c = dataclasses.replace(cfg_w, warm_refresh_cells=600)
    comp_fn = sharded_refine.make_sharded_refine_fn(
        decoder, cfg_c, np.asarray(grid_pts), K, crop_hw, mesh,
        axis="rays")
    _, hist_comp = comp_fn(init, nocs, frustum, fmask)
    np.testing.assert_allclose(np.asarray(hist_comp),
                               np.asarray(hist_plain), rtol=1e-3)

    with pytest.raises(ValueError, match="warm_refresh_cells"):
        sharded_refine.make_sharded_refine_fn(
            decoder, dataclasses.replace(cfg_w, warm_refresh_cells=8),
            np.asarray(grid_pts), K, crop_hw, mesh, axis="rays")
