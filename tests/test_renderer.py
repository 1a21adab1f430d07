"""Projection + splat primitives + full render: golden parity vs reference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdflabel_tpu.ops import projection as proj_ops
from sdflabel_tpu.ops import splat as splat_ops
from sdflabel_tpu.renderer import Rasterer
from sdflabel_tpu.renderer.rasterer import calibration_matrix

from conftest import add_reference_paths

torch = pytest.importorskip("torch")
add_reference_paths()

from renderer import projection as ref_projection  # noqa: E402
from renderer import primitives as ref_primitives  # noqa: E402
from renderer import utils_rasterer as ref_utils  # noqa: E402
from renderer.rasterer import Rasterer as RefRasterer  # noqa: E402


RES = (32, 24)  # (x, y)


def _scene(n=200, seed=0):
    rng = np.random.RandomState(seed)
    pts = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    normals = rng.randn(n, 3).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0.1, -0.2, 4.0]
    th = 0.4
    pose[:3, :3] = np.array(
        [[np.cos(th), 0, np.sin(th)], [0, 1, 0], [-np.sin(th), 0, np.cos(th)]],
        dtype=np.float32,
    )
    K = calibration_matrix(RES)
    return K, pts, normals, colors, pose


def test_calibration_matrix_matches_reference():
    K_ref = ref_utils.calibration_matrix(RES, 20, 70, 0)
    K_ours = calibration_matrix(RES, 20, 70, 0)
    np.testing.assert_allclose(K_ours, K_ref, rtol=1e-6)


def test_qrot_matches_reference():
    rng = np.random.RandomState(1)
    q = rng.randn(17, 4).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    v = rng.randn(17, 3).astype(np.float32)
    ref = ref_utils.qrot(torch.from_numpy(q), torch.from_numpy(v)).numpy()
    ours = np.asarray(proj_ops.qrot(jnp.asarray(q), jnp.asarray(v)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_project_dcm_matches_reference():
    K, pts, normals, colors, pose = _scene()
    ref = ref_projection.project_in_2D(
        torch.from_numpy(K.astype(np.float32)), torch.from_numpy(pose),
        torch.from_numpy(pts), torch.from_numpy(normals),
        torch.from_numpy(colors), RES, filter_normals=True, output_nocs=True,
    )
    ours = proj_ops.project_dcm(
        jnp.asarray(K), jnp.asarray(pose), jnp.asarray(pts),
        jnp.asarray(normals), jnp.asarray(colors), RES, output_nocs=True,
    )
    np.testing.assert_allclose(np.asarray(ours.points_3d),
                               ref["points_3d"].detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours.normals_3d),
                               ref["normals_3d"].detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours.colors_3d),
                               ref["colors_3d"].detach().numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ours.points_2d),
                               ref["points_2d"].detach().numpy(), atol=1e-3)
    # front-mask equals the reference's filtered subset
    mask = np.asarray(ours.front_mask)
    np.testing.assert_allclose(
        np.asarray(ours.points_3d)[mask], ref["points_3d_filt"].detach().numpy(), atol=1e-5
    )


def test_project_quat_matches_reference():
    K, pts, normals, colors, _ = _scene(seed=3)
    q = np.array([0.9, 0.1, -0.3, 0.2], dtype=np.float32)
    q /= np.linalg.norm(q)
    pose7 = np.concatenate([q, np.array([0.2, 0.1, 5.0], np.float32)])
    ref = ref_projection.project_in_2D_quat(
        torch.from_numpy(K.astype(np.float32)), torch.from_numpy(pose7),
        torch.from_numpy(pts), torch.from_numpy(normals),
        torch.from_numpy(colors), RES, output_nocs=True,
    )
    ours = proj_ops.project_quat(
        jnp.asarray(K), jnp.asarray(pose7), jnp.asarray(pts),
        jnp.asarray(normals), jnp.asarray(colors), RES, output_nocs=True,
    )
    np.testing.assert_allclose(np.asarray(ours.points_3d),
                               ref["points_3d"].detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours.normals_3d),
                               ref["normals_3d"].detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours.points_2d),
                               ref["points_2d"].detach().numpy(), atol=1e-3)


def _camera_scene(n=150, seed=5):
    """Points already in camera frame, in front of the camera."""
    rng = np.random.RandomState(seed)
    pts = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    pts[:, 2] += 4.0
    normals = rng.randn(n, 3).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    K = calibration_matrix(RES).astype(np.float32)
    eps = np.finfo(np.float32).eps
    p2h = pts @ K.T
    p2 = p2h[:, :2] / (p2h[:, 2:] + eps)
    return K, pts, normals, p2


def _ref_pixel_grid():
    yy, xx = np.mgrid[0 : RES[1], 0 : RES[0]]
    return np.concatenate((xx[..., None], yy[..., None]), -1).reshape(1, -1, 2)


@pytest.mark.parametrize("softclamp", [True, False])
@pytest.mark.parametrize("add_bg", [False, True])
def test_splat_surfel_matches_reference(softclamp, add_bg):
    K, pts, normals, p2 = _camera_scene()
    grid_ref = torch.from_numpy(_ref_pixel_grid())
    ref = ref_primitives.inside_surfel(
        torch.from_numpy(K), grid_ref, torch.from_numpy(p2),
        torch.from_numpy(pts), torch.from_numpy(normals), diam=0.04,
        softclamp=softclamp, add_bg=add_bg,
    )
    grid = splat_ops.pixel_grid(*RES)
    ours = splat_ops.splat_surfel(
        jnp.asarray(K), grid, jnp.asarray(pts), jnp.asarray(normals),
        diam=0.04, softclamp=softclamp, add_bg=add_bg,
    )
    ours = np.asarray(ours)
    ref = ref[:, 0, :].numpy()
    if softclamp:
        # The binarized footprint is (sigmoid(x) > 0), which is decided by
        # the fp32 sigmoid underflow point: torch gives 0 below x=-88.71,
        # XLA below x=-87.33. Pixels with any point's x inside that band are
        # implementation-ambiguous (prob tails ~1e-38); exclude the columns.
        eps = np.finfo(np.float32).eps
        Kinv = np.linalg.inv(K)
        kg = np.concatenate(
            [np.asarray(grid), np.ones((grid.shape[0], 1), np.float32)], 1
        ) @ Kinv.T
        nv = (normals * pts).sum(1)
        nk = normals @ kg.T
        nk = np.where(np.abs(nk) < 0.01, eps, nk)
        z = nv[:, None] / nk
        g3 = kg[None] * z[..., None]
        dist = np.linalg.norm(pts[:, None, :] - g3, axis=-1)
        x = (0.04 - dist) * 5.0
        ambiguous_px = ((x > -89.0) & (x < -87.0)).any(axis=0)
        mismatch_px = (np.abs(ours - ref) > 2e-5).any(axis=0)
        # every mismatching pixel must be explained by the underflow band
        assert np.all(~mismatch_px | ambiguous_px)
        ours = ours[:, ~ambiguous_px]
        ref = ref[:, ~ambiguous_px]
    np.testing.assert_allclose(ours, ref, atol=2e-5)


@pytest.mark.parametrize("softclamp", [True, False])
def test_splat_circle_matches_reference(softclamp):
    K, pts, normals, p2 = _camera_scene(seed=7)
    grid_ref = torch.from_numpy(_ref_pixel_grid())
    ref = ref_primitives.inside_circle(
        torch.from_numpy(K), grid_ref, torch.from_numpy(p2),
        torch.from_numpy(pts), torch.from_numpy(normals), diam=0.02,
        softclamp=softclamp, add_bg=False,
    )
    grid = splat_ops.pixel_grid(*RES)
    ours = splat_ops.splat_circle(
        jnp.asarray(K), grid, jnp.asarray(p2), jnp.asarray(pts),
        diam=0.02, softclamp=softclamp, add_bg=False,
    )
    np.testing.assert_allclose(np.asarray(ours), ref[:, 0, :].numpy(), atol=2e-5)


def test_splat_circle_opt_matches_reference():
    K, pts, normals, p2 = _camera_scene(seed=9)
    yy, xx = np.mgrid[-7:8, -7:8]
    grid_prim_ref = torch.from_numpy(
        np.concatenate((xx[..., None], yy[..., None]), -1).reshape(1, -1, 2)
    )
    ref = ref_primitives.inside_circle_opt(
        torch.from_numpy(K), grid_prim_ref, torch.from_numpy(p2),
        torch.from_numpy(pts), torch.from_numpy(normals), diam=0.025,
        add_bg=True,
    )
    grid_prim = jnp.asarray(
        np.concatenate((xx[..., None], yy[..., None]), -1).reshape(-1, 2),
        dtype=jnp.float32,
    )
    ours = splat_ops.splat_circle_opt(
        jnp.asarray(K), grid_prim, jnp.asarray(p2), jnp.asarray(pts),
        RES[0], RES[1], diam=0.025, add_bg=True,
    )
    np.testing.assert_allclose(np.asarray(ours), ref[:, 0, :].numpy(), atol=2e-5)


def _run_ref_render(K, pts, normals, colors, pose, rot, primitives, output_nocs):
    ref_rast = RefRasterer(torch.from_numpy(K.astype(np.float32)), RES,
                          precision=torch.float32)
    pose_t = torch.from_numpy(pose)
    rendering, points = ref_rast(
        torch.from_numpy(pts), torch.from_numpy(normals),
        torch.from_numpy(colors), pose_t, rot=rot, primitives=primitives,
        bg=None, output_mask=True, output_depth=True, output_normals=True,
        output_nocs=output_nocs, output_points=True,
    )
    return rendering, points


@pytest.mark.parametrize("primitives", ["disc", "circle"])
def test_full_render_matches_reference(primitives):
    K, pts, normals, colors, pose = _scene(n=180, seed=11)
    ref_rendering, ref_points = _run_ref_render(
        K, pts, normals, colors, pose, "dcm", primitives, True
    )
    rast = Rasterer(K, RES)
    rendering, points = rast(
        jnp.asarray(pts), jnp.asarray(normals), jnp.asarray(colors),
        jnp.asarray(pose), rot="dcm", primitives=primitives, output_nocs=True,
    )
    np.testing.assert_allclose(
        np.asarray(rendering.color), ref_rendering["color"].numpy(), atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(rendering.mask), ref_rendering["mask"].numpy(), atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(rendering.depth), ref_rendering["depth"].numpy(), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(rendering.normals), ref_rendering["normals"].numpy(), atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(points.xyz), ref_points["xyz"].numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(points.rgb), ref_points["rgb"].numpy(), atol=1e-6
    )
    fm = np.asarray(points.front_mask)
    np.testing.assert_allclose(
        np.asarray(points.xyz)[fm], ref_points["xyzf"].numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(points.rgb)[fm], ref_points["rgbf"].numpy(), atol=1e-6
    )


def test_render_gradients_match_reference():
    """Pixel-loss gradients w.r.t. pose translation + points vs torch autograd."""
    K, pts, normals, colors, pose = _scene(n=120, seed=13)

    # torch grads
    pose_t = torch.from_numpy(pose).requires_grad_(True)
    pts_t = torch.from_numpy(pts).requires_grad_(True)
    ref_rast = RefRasterer(torch.from_numpy(K.astype(np.float32)), RES,
                          precision=torch.float32)
    rendering, _ = ref_rast(
        pts_t, torch.from_numpy(normals), torch.from_numpy(colors), pose_t,
        rot="dcm", primitives="disc", bg=None, output_mask=True,
        output_nocs=True, output_points=True,
    )
    loss_ref = rendering["color"].sum() + (rendering["mask"] ** 2).sum()
    loss_ref.backward()
    g_pose_ref = pose_t.grad.numpy()
    g_pts_ref = pts_t.grad.numpy()

    rast = Rasterer(K, RES)

    def loss_fn(pose_j, pts_j):
        r, _ = rast(pts_j, jnp.asarray(normals), jnp.asarray(colors), pose_j,
                    rot="dcm", primitives="disc", output_nocs=True)
        return jnp.sum(r.color) + jnp.sum(r.mask**2)

    loss_ours, (g_pose, g_pts) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
        jnp.asarray(pose), jnp.asarray(pts)
    )
    np.testing.assert_allclose(float(loss_ours), float(loss_ref.detach()), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_pose), g_pose_ref, atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(g_pts), g_pts_ref, atol=5e-4, rtol=1e-3)


def test_point_mask_equivalence():
    """Masked padded points must reproduce the unpadded render exactly."""
    K, pts, normals, colors, pose = _scene(n=100, seed=17)
    rast = Rasterer(K, RES)
    r_small, _ = rast(jnp.asarray(pts), jnp.asarray(normals), jnp.asarray(colors),
                      jnp.asarray(pose), rot="dcm", primitives="disc",
                      output_nocs=True)
    pad = 60
    pts_p = np.concatenate([pts, np.zeros((pad, 3), np.float32)])
    normals_p = np.concatenate([normals, np.tile([0, 0, 1.0], (pad, 1)).astype(np.float32)])
    colors_p = np.concatenate([colors, np.zeros((pad, 3), np.float32)])
    mask = np.concatenate([np.ones(100, bool), np.zeros(pad, bool)])
    r_pad, _ = rast(jnp.asarray(pts_p), jnp.asarray(normals_p),
                    jnp.asarray(colors_p), jnp.asarray(pose),
                    point_mask=jnp.asarray(mask), rot="dcm", primitives="disc",
                    output_nocs=True)
    np.testing.assert_allclose(np.asarray(r_pad.color), np.asarray(r_small.color),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(r_pad.mask), np.asarray(r_small.mask),
                               atol=1e-5)


def test_background_compositing():
    """bg colors composite through the background softmax row; all-masked
    surfaces stay NaN-free (code-review findings)."""
    K, pts, normals, colors, pose = _scene(n=80, seed=19)
    rast = Rasterer(K, RES)
    bg = jnp.full((3, RES[1], RES[0]), 0.25)
    r_bg, _ = rast(jnp.asarray(pts), jnp.asarray(normals), jnp.asarray(colors),
                   jnp.asarray(pose), rot="dcm", primitives="disc",
                   output_nocs=True, bg=bg)
    r_no, _ = rast(jnp.asarray(pts), jnp.asarray(normals), jnp.asarray(colors),
                   jnp.asarray(pose), rot="dcm", primitives="disc",
                   output_nocs=True)
    c_bg = np.asarray(r_bg.color)
    c_no = np.asarray(r_no.color)
    assert not np.allclose(c_bg, c_no)  # bg visibly composites
    empty = c_no.sum(0) == 0  # pixels with no object coverage
    assert empty.any()
    np.testing.assert_allclose(c_bg[:, empty], 0.25, atol=1e-5)
    # mask includes the bg row -> saturates to ~1 everywhere (reference
    # formula rasterer.py:121-125)
    np.testing.assert_allclose(np.asarray(r_bg.mask), 1.0, atol=1e-5)

    # all-masked points with bg: no NaNs anywhere
    mask = np.zeros(80, bool)
    r_masked, _ = rast(jnp.asarray(pts), jnp.asarray(normals),
                       jnp.asarray(colors), jnp.asarray(pose),
                       point_mask=jnp.asarray(mask), rot="dcm",
                       primitives="disc", output_nocs=True, bg=bg)
    assert np.isfinite(np.asarray(r_masked.color)).all()
    np.testing.assert_allclose(np.asarray(r_masked.color), 0.25, atol=1e-5)
