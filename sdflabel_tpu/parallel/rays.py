"""Ray/pixel-sharded rendering — the renderer's 'sequence parallelism'.

The dense splat materializes (N_points x N_pixels) interactions; for large
renders this axis is sharded over the mesh 'rays' axis with shard_map:
every chip holds the full (small) point set and computes only its pixel
block; image outputs come back pixel-sharded, and in reverse mode the
parameter/point gradients are automatically psum'd over 'rays' by the
shard_map transpose (SURVEY.md §2.D "Ray/pixel sharding" row).

The splat softmax is over POINTS per pixel, so pixel sharding needs no
cross-shard softmax communication at all — each pixel's normalization is
local to its shard. (The surfel z-normalization at primitives.py:230 is
also a per-pixel reduction over points — local too.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from sdflabel_tpu.ops import splat as splat_ops
from sdflabel_tpu.ops.projection import project_dcm


def make_rays_sharded_render(
    mesh: Mesh,
    K,
    resolution_px: tuple[int, int],
    diam: float = 0.04,
    depth_constant: float = 150.0,
    use_fused: bool | None = None,
):
    """Pixel-sharded surfel render: (coords, normals, pose, mask) -> color.

    Returns a function producing the (3, H, W) NOCS image with the pixel
    rows sharded over 'rays'. Requires H*W divisible by the rays axis size.

    use_fused: None = auto (fused Pallas splat on TPU, dense elsewhere);
    each shard runs the kernel on its own pixel block, so no chip
    materializes its (N, P_shard) splat matrix.
    """
    res_x, res_y = resolution_px
    n_rays = mesh.shape["rays"]
    assert (res_x * res_y) % n_rays == 0
    fused = (use_fused if use_fused is not None
             else jax.default_backend() == "tpu")

    full_grid = splat_ops.pixel_grid(res_x, res_y)

    def render_shard(grid_block, coords, normals, pose, point_mask):
        proj = project_dcm(K, pose, coords, normals, normals,
                           (res_x, res_y), output_nocs=True)
        colors_ext = (proj.colors_3d + 1.0) / 2.0
        if fused:
            from sdflabel_tpu.ops import splat_pallas

            # kinv rows from the shard's pixel coords — MUST go through
            # the one shared definition (splat.kinv_pixel_rays): an
            # ulp-different variant flips binarized footprint bits
            kinv_block = splat_ops.kinv_pixel_rays(
                jnp.asarray(K), grid_block)
            n = coords.shape[0]
            feats = jnp.concatenate(
                [colors_ext, jnp.ones((n, 1), colors_ext.dtype),
                 proj.points_3d[:, 2:3], (proj.normals_3d + 1.0) / 2.0],
                axis=-1)  # (N, 8)
            img = splat_pallas.surfel_composite(
                proj.points_3d, proj.normals_3d, feats, kinv_block,
                point_mask=point_mask, diam=diam,
                depth_constant=depth_constant,
            )[:, :3]
        else:
            prob = splat_ops.splat_surfel(
                K, grid_block, proj.points_3d, proj.normals_3d,
                point_mask=point_mask, diam=diam,
                depth_constant=depth_constant, softclamp=False, add_bg=False,
            )
            img = prob.T @ colors_ext  # (P_shard, 3)
        return jnp.clip(img, max=1.0)

    sharded = jax.shard_map(
        render_shard,
        mesh=mesh,
        in_specs=(P("rays"), P(), P(), P(), P()),
        out_specs=P("rays"),
        # pallas_call outputs carry no vma annotation; correctness of the
        # boundary transpose (psum'd parameter grads) is pinned by
        # test_rays_sharded_render_matches_dense for both splat paths
        check_vma=False,
    )

    def render(coords, normals, pose, point_mask):
        img = sharded(full_grid, coords, normals, pose, point_mask)  # (P,3)
        return img.T.reshape(3, res_y, res_x)

    return render
