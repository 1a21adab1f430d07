"""Standalone renderer demo: render a DeepSDF latent (or mesh) to PNG.

Behavioral parity target: sdfrenderer/main.py — `render_sdf` (:62-121,
the BASELINE.json config #1 path: grid 40, latent [1,0,0], 200x100 crop)
and `render_model` (:13-59, trimesh-loaded colored point cloud).

Usage:
  python -m sdflabel_tpu.pipelines.render_demo --model deepsdf.pt \
      [--primitives disc] [--out renderer_output]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import jax.numpy as jnp

from sdflabel_tpu.models import deepsdf
from sdflabel_tpu.ops import grid as grid_ops
from sdflabel_tpu.renderer import Rasterer


def _pose_y90(dist: float = 10.0) -> np.ndarray:
    """Camera pose: 90 deg about y + z translation (sdfrenderer/main.py:78-84)."""
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = np.array([[0, 0, 1], [0, 1, 0], [-1, 0, 0]], np.float32)
    pose[:3, 3] = [0.0, 0.0, dist]
    return pose


def save_image(color_chw, path: str) -> None:
    from PIL import Image

    img = np.clip(np.asarray(color_chw), 0, 1)
    Image.fromarray(
        (np.transpose(img, (1, 2, 0)) * 255).astype(np.uint8)
    ).save(path)


def render_sdf(path_dsdf: str, primitives: str = "disc",
               grid_density: int = 40, latent=(1.0, 0.0, 0.0),
               crop_size=(200, 100), output_dir: str = "renderer_output"):
    """Render a DeepSDF latent (sdfrenderer/main.py:62-121)."""
    cfg, params = deepsdf.load_torch_checkpoint(path_dsdf)
    decoder = deepsdf.sdf_fn(cfg, params)
    grid_pts = grid_ops.generate_point_grid(grid_density)
    surf, _sdf = grid_ops.surface_from_decoder(
        decoder, jnp.asarray(latent, jnp.float32), grid_pts,
        capacity=min(8192, grid_density ** 3),
    )
    rasterer = Rasterer(None, crop_size)
    rendering, _pts = rasterer(
        surf.points, surf.normals, surf.normals, jnp.asarray(_pose_y90()),
        point_mask=surf.mask, rot="dcm", primitives=primitives,
        output_nocs=True,
    )
    os.makedirs(output_dir, exist_ok=True)
    out = os.path.join(output_dir, "demo_dsdf.png")
    save_image(rendering.color, out)
    return rendering, out


def render_model(model_path: str, primitives: str = "disc",
                 crop_size=(200, 100), output_dir: str = "renderer_output"):
    """Render a mesh's colored vertices (sdfrenderer/main.py:13-59).

    Mesh loading (utils.meshio.load_mesh): .npz bundled assets and .obj
    natively (no extra dependencies); other formats via trimesh when
    installed.
    """
    from sdflabel_tpu.utils import meshio

    verts, normals, colors = meshio.load_mesh(model_path)

    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]], np.float32)
    pose[:3, 3] = [0.0, 0.0, 10.0]
    rasterer = Rasterer(None, crop_size)
    rendering, _ = rasterer(
        jnp.asarray(verts, jnp.float32), jnp.asarray(normals, jnp.float32),
        jnp.asarray(colors, jnp.float32), jnp.asarray(pose), rot="dcm",
        primitives=primitives, output_nocs=False,
    )
    os.makedirs(output_dir, exist_ok=True)
    out = os.path.join(output_dir, "demo_cad.png")
    save_image(rendering.color, out)
    return rendering, out


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", "-m", required=True,
                        help="DeepSDF .pt checkpoint or mesh file")
    parser.add_argument("--primitives", "-p", default="disc",
                        help="circle, circle_opt, disc")
    parser.add_argument("--out", default="renderer_output")
    args = parser.parse_args(argv)
    if os.path.splitext(args.model)[1] == ".pt":
        _, out = render_sdf(args.model, args.primitives,
                            output_dir=args.out)
    else:
        _, out = render_model(args.model, args.primitives,
                              output_dir=args.out)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
