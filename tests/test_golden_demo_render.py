"""BASELINE configs #1/#2 at the literal demo resolution (200x100).

Full-size forward render + pixel-loss gradients vs the PyTorch reference
(sdfrenderer/main.py:62-121 geometry: y-90deg pose, z=10, disc primitives,
output_nocs). Smaller suites cover the same code at 32x24; this pins the
exact demo configuration.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdflabel_tpu.renderer import Rasterer

from conftest import add_reference_paths

torch = pytest.importorskip("torch")
add_reference_paths()

from renderer.rasterer import Rasterer as RefRasterer  # noqa: E402

RES = (200, 100)
N = 600


def _demo_scene():
    rng = np.random.RandomState(42)
    # surface-band-like shell of points
    dirs = rng.randn(N, 3)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    pts = (dirs * rng.uniform(0.4, 0.5, (N, 1))).astype(np.float32)
    normals = dirs.astype(np.float32)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = np.array([[0, 0, 1], [0, 1, 0], [-1, 0, 0]], np.float32)
    pose[:3, 3] = [0.0, 0.0, 10.0]
    return pts, normals, pose


def test_demo_render_golden():
    pts, normals, pose = _demo_scene()
    ref_rast = RefRasterer(None, RES, precision=torch.float32)
    ref_rendering, _ = ref_rast(
        torch.from_numpy(pts), torch.from_numpy(normals),
        torch.from_numpy(normals), torch.from_numpy(pose), rot="dcm",
        primitives="disc", bg=None, output_mask=True, output_normals=True,
        output_nocs=True, output_points=True,
    )
    rast = Rasterer(None, RES)
    rendering, _ = rast(
        jnp.asarray(pts), jnp.asarray(normals), jnp.asarray(normals),
        jnp.asarray(pose), rot="dcm", primitives="disc", output_nocs=True,
    )
    np.testing.assert_allclose(
        np.asarray(rendering.color), ref_rendering["color"].numpy(), atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(rendering.mask), ref_rendering["mask"].numpy(), atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(rendering.normals), ref_rendering["normals"].numpy(),
        atol=5e-5,
    )
    # the render actually hits pixels
    assert (np.asarray(rendering.color).sum(0) > 0).sum() > 500


def test_demo_grad_golden():
    pts, normals, pose = _demo_scene()

    pose_t = torch.from_numpy(pose).requires_grad_(True)
    pts_t = torch.from_numpy(pts).requires_grad_(True)
    ref_rast = RefRasterer(None, RES, precision=torch.float32)
    rendering, _ = ref_rast(
        pts_t, torch.from_numpy(normals), torch.from_numpy(normals), pose_t,
        rot="dcm", primitives="disc", bg=None, output_nocs=True,
        output_points=True,
    )
    loss_ref = (rendering["color"] ** 2).sum()
    loss_ref.backward()
    g_pose_ref = pose_t.grad.numpy()
    g_pts_ref = pts_t.grad.numpy()

    rast = Rasterer(None, RES)

    def loss_fn(pose_j, pts_j):
        r, _ = rast(pts_j, jnp.asarray(normals), jnp.asarray(normals),
                    pose_j, rot="dcm", primitives="disc", output_nocs=True)
        return jnp.sum(r.color ** 2)

    loss, (g_pose, g_pts) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
        jnp.asarray(pose), jnp.asarray(pts)
    )
    np.testing.assert_allclose(float(loss), float(loss_ref.detach()),
                               rtol=1e-5)
    scale = max(np.abs(g_pose_ref).max(), 1e-9)
    np.testing.assert_allclose(np.asarray(g_pose) / scale, g_pose_ref / scale,
                               atol=2e-5)
    scale_p = max(np.abs(g_pts_ref).max(), 1e-9)
    np.testing.assert_allclose(np.asarray(g_pts) / scale_p,
                               g_pts_ref / scale_p, atol=2e-5)
