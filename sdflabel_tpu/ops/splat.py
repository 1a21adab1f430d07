"""Differentiable point-splatting primitives.

Behavioral parity target: sdfrenderer/renderer/primitives.py — three kernels
producing per-point-per-pixel composition probabilities:
  * splat_circle      <- inside_circle      (primitives.py:4-71)
  * splat_circle_opt  <- inside_circle_opt  (primitives.py:74-162)
  * splat_surfel      <- inside_surfel      (primitives.py:165-242)

All three share the reference's gradient semantics: the splat footprint is a
*detached binary* indicator (hard visibility), while depth-softmax weights are
differentiable (soft ordering) — gradients flow through point depths (and for
surfels, through the ray-plane intersection, i.e. positions AND normals).

TPU design notes:
  * Outputs are (N[+1], P) probability matrices (P = H*W pixels); the final
    image composition is then `prob.T @ features`, an (P,N)x(N,C) matmul that
    rides the MXU (see renderer.rasterer).
  * A `point_mask` argument supports the fixed-capacity surface point sets
    (ops.grid): masked points get zero footprint and -max score, making them
    exact no-ops — this is how the reference's dynamic masked_select semantics
    are reproduced with static shapes.
  * The dense formulation materializes (N, P); the fused Pallas kernel in
    ops.splat_pallas computes the same function blockwise without ever
    materializing it. The dense version is the semantic reference and the
    autodiff oracle.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# Largest fp32 x with torch.sigmoid(x) == 0 (exp underflow incl. subnormals).
# The reference binarizes its soft footprints as (sigmoid(x) > 0).detach()
# (primitives.py:54 etc.), so the effective footprint boundary IS the sigmoid
# underflow point. XLA flushes subnormals (cutoff ~-87.3), torch does not
# (cutoff -88.72283); we binarize against the torch constant explicitly so
# footprint bits match the reference exactly.
_SIGMOID_ZERO_X = -88.72283


def _binarize_soft(x, soft, softclamp, dtype):
    """(soft > 0) with torch-underflow semantics when soft = sigmoid(x)."""
    if softclamp:
        fp = x > _SIGMOID_ZERO_X
    else:
        fp = soft > 0
    return jax.lax.stop_gradient(fp.astype(dtype))


def pixel_grid(res_x: int, res_y: int, dtype=jnp.float32) -> jax.Array:
    """(P, 2) pixel-center grid in (x, y) order, row-major over y then x.

    Matches the rasterer's buffer built from np.mgrid (rasterer.py:25-28).
    """
    ys = jnp.arange(res_y, dtype=dtype)
    xs = jnp.arange(res_x, dtype=dtype)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1)


def _masked_depth_softmax(scores, footprint, add_bg, bg_scores=None):
    """softmax over points of masked scores, times binary footprint.

    Reproduces primitives.py:158-161 / :238-241: masked_fill(finfo.min) —
    NOT -inf — so all-masked pixels softmax to uniform and then zero out
    against the footprint instead of producing NaNs.
    """
    dtype = scores.dtype
    fmin = jnp.finfo(dtype).min
    if add_bg:
        scores = jnp.concatenate([scores, bg_scores[None, :]], axis=0)
        footprint = jnp.concatenate(
            [footprint, jnp.ones_like(footprint[:1])], axis=0
        )
    masked = jnp.where(footprint > 0, scores, fmin)
    prob = jax.nn.softmax(masked, axis=0) * footprint
    return prob


def kinv_pixel_rays(K: jax.Array, grid_2d: jax.Array,
                    dtype=jnp.float32) -> jax.Array:
    """(P, 3) per-pixel camera rays: [grid | 1] @ inv(K).T at HIGHEST.

    THE one definition of this computation — splat_surfel, the rasterer's
    fused branch, and parallel/sharded_refine all must build kinv rows
    with bit-identical formula/precision: an ulp-different variant (e.g.
    host-side numpy, or dropping HIGHEST) flips binarized footprint bits
    at the sigmoid-underflow edge (pixel errors up to ~1.0 on TPU).
    """
    ones = jnp.ones((grid_2d.shape[0], 1), dtype)
    Kinv = jnp.linalg.inv(K.astype(jnp.float32)).astype(dtype)
    return jnp.matmul(
        jnp.concatenate([grid_2d.astype(dtype), ones], axis=-1), Kinv.T,
        precision=jax.lax.Precision.HIGHEST,
    )


def splat_surfel(
    K: jax.Array,
    grid_2d: jax.Array,
    vertex_3d: jax.Array,
    normals: jax.Array,
    point_mask: jax.Array | None = None,
    diam: float = 0.03,
    depth_constant: float = 150.0,
    softclamp: bool = True,
    softclamp_constant: float = 5.0,
    add_bg: bool = True,
) -> jax.Array:
    """3D tangent-disc splats via ray-plane intersection (primitives.py:165-242).

    Args:
      K: (3,3) intrinsics. grid_2d: (P,2) pixel grid. vertex_3d: (N,3) camera-
      frame points. normals: (N,3). point_mask: optional (N,) validity.
    Returns: (N+1, P) if add_bg else (N, P) composition probabilities.
    """
    dtype = vertex_3d.dtype
    eps = jnp.finfo(dtype).eps
    n = vertex_3d.shape[0]

    kinv_grid = kinv_pixel_rays(K, grid_2d, dtype)  # (P,3)

    n_v3d = jnp.sum(normals * vertex_3d, axis=-1)  # (N,)
    # precision=HIGHEST: bf16 matmul error flips footprint bits on TPU
    n_kinv = jax.lax.dot_general(
        normals, kinv_grid, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )  # (N, P)
    n_kinv = jnp.where(jnp.abs(n_kinv) < 0.01, eps, n_kinv)
    z = n_v3d[:, None] / n_kinv  # (N, P) ray depth of the tangent plane

    # Explicit (N,P,3) tangent-plane points, as primitives.py:215-218 — kept
    # in this dense oracle so the binarized footprint matches the reference
    # bit-for-bit (the algebraically expanded ||v - g*z||^2 differs in the
    # last ulp, which flips footprint bits at the sigmoid underflow edge).
    # The Pallas production kernel uses the expanded form blockwise.
    grid_3d = kinv_grid[None, :, :] * z[:, :, None]
    vec = vertex_3d[:, None, :] - grid_3d
    dist = jnp.sqrt(jnp.sum(vec * vec, axis=-1))

    x_soft = (diam - dist) * softclamp_constant
    if softclamp:
        footprint_soft = jax.nn.sigmoid(x_soft)
    else:
        footprint_soft = jnp.maximum(diam - dist, 0.0)
    footprint = _binarize_soft(x_soft, footprint_soft, softclamp, dtype)
    if point_mask is not None:
        footprint = footprint * point_mask.astype(dtype)[:, None]

    z_scores = -z * footprint
    z_norm = jax.lax.stop_gradient(
        jnp.linalg.norm(z_scores, axis=0, keepdims=True)
    )  # per-pixel over points (primitives.py:230)
    z_scores = jnp.maximum(z_scores / (z_norm + eps) + 1.0, 0.0) * depth_constant

    bg_scores = None
    if add_bg:
        z2d = -vertex_3d[:, 2] * depth_constant
        if point_mask is not None:
            z2d = jnp.where(point_mask, z2d, jnp.inf)
        zmin = jnp.min(z2d)
        # all-masked guard: inf - 1 would poison the softmax with NaN
        bg = jnp.where(jnp.isfinite(zmin), zmin - 1.0, 0.0)
        bg_scores = jnp.full((grid_2d.shape[0],), bg, dtype)

    return _masked_depth_softmax(z_scores, footprint, add_bg, bg_scores)


def splat_circle(
    K: jax.Array,
    grid_2d: jax.Array,
    vertex_2d: jax.Array,
    vertex_3d: jax.Array,
    point_mask: jax.Array | None = None,
    diam: float = 0.07,
    depth_constant: float = 100.0,
    softclamp: bool = True,
    softclamp_constant: float = 3.0,
    add_bg: bool = False,
) -> jax.Array:
    """Dense 2D circle splats (primitives.py:4-71).

    Note the reference quirk preserved here: the composition uses
    softmax(z * footprint) with NO masked_fill — pixels outside a point's
    footprint still contribute exp(0) to its softmax denominator
    (primitives.py:68).
    """
    dtype = vertex_3d.dtype
    eps = jnp.finfo(dtype).eps

    diff = vertex_2d[:, None, :2] - grid_2d[None, :, :]  # (N,P,2)
    pix_dist = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 0.0))
    radius = jnp.abs(K[0, 0] * diam / (vertex_3d[:, 2] + eps))[:, None]
    x_soft = (radius - pix_dist) * softclamp_constant
    if softclamp:
        footprint_soft = jax.nn.sigmoid(x_soft)
    else:
        footprint_soft = jnp.maximum(radius - pix_dist, 0.0)
    footprint = _binarize_soft(x_soft, footprint_soft, softclamp, dtype)
    if point_mask is not None:
        footprint = footprint * point_mask.astype(dtype)[:, None]

    z = -vertex_3d[:, 2:3]  # (N,1)
    zm = z if point_mask is None else jnp.where(point_mask[:, None], z, 0.0)
    z_norm = jax.lax.stop_gradient(jnp.linalg.norm(zm, axis=0, keepdims=True))
    z = jnp.maximum(z / (z_norm + eps) + 1.0, 0.0) * depth_constant  # (N,1)

    scores = jnp.broadcast_to(z, footprint.shape)
    if add_bg:
        zv = z if point_mask is None else jnp.where(point_mask[:, None], z,
                                                    jnp.inf)
        zmin = jnp.min(zv)
        zbg = jnp.where(jnp.isfinite(zmin), zmin - 1.0, 0.0)
        scores = jnp.concatenate(
            [scores, jnp.full((1, scores.shape[1]), zbg, dtype)], axis=0
        )
        footprint = jnp.concatenate([footprint, jnp.ones_like(footprint[:1])], axis=0)
    # reference composition: softmax(scores * footprint) — footprint zeros
    # make real out-of-footprint cells contribute exp(0) (primitives.py:68).
    base = scores * footprint
    if point_mask is not None:
        # padded capacity slots must not exist at all: force their rows to
        # fmin AFTER the footprint product so they vanish from every
        # pixel's denominator.
        pm = point_mask.astype(bool)[:, None]
        if add_bg:
            pm = jnp.concatenate([pm, jnp.ones((1, 1), bool)], axis=0)
        base = jnp.where(pm, base, jnp.finfo(dtype).min)
    prob = jax.nn.softmax(base, axis=0) * footprint
    return prob


def splat_circle_opt(
    K: jax.Array,
    grid_prim: jax.Array,
    vertex_2d: jax.Array,
    vertex_3d: jax.Array,
    res_x: int,
    res_y: int,
    point_mask: jax.Array | None = None,
    diam: float = 0.06,
    depth_constant: float = 10000.0,
    softclamp: bool = True,
    softclamp_constant: float = 5.0,
    add_bg: bool = True,
) -> jax.Array:
    """Sparse-stamp circle splats (primitives.py:74-162).

    The reference scatters a 15x15 stamp per point into a torch.sparse tensor
    and densifies; here the scatter is a jnp scatter-add into the dense (N,P)
    footprint matrix (duplicate stamped pixels add up, exactly like sparse
    COO -> to_dense with repeated indices).
    """
    dtype = vertex_3d.dtype
    eps = jnp.finfo(dtype).eps
    n = vertex_3d.shape[0]
    p = res_x * res_y

    stamp_dist = jnp.sqrt(
        jnp.maximum(jnp.sum(grid_prim.astype(dtype) ** 2, axis=-1), 0.0)
    )  # (S,)
    radius = jnp.abs(K[0, 0] * diam / (vertex_3d[:, 2] + eps))  # (N,)
    if softclamp:
        vals = jax.nn.sigmoid((radius[:, None] - stamp_dist[None, :]) * softclamp_constant)
    else:
        vals = jnp.maximum(radius[:, None] - stamp_dist[None, :], 0.0)

    pos = jnp.floor(grid_prim.astype(dtype)[None] + vertex_2d[:, None, :]).astype(jnp.int32)
    px = jnp.clip(pos[..., 0], 0, res_x - 1)
    py = jnp.clip(pos[..., 1], 0, res_y - 1)
    flat_idx = py * res_x + px  # (N,S)

    if point_mask is not None:
        vals = vals * point_mask.astype(dtype)[:, None]

    dense = jnp.zeros((n, p), dtype)
    row = jnp.broadcast_to(jnp.arange(n)[:, None], flat_idx.shape)
    dense = dense.at[row.reshape(-1), flat_idx.reshape(-1)].add(vals.reshape(-1))

    z = -vertex_3d[:, 2:3]
    zm = z if point_mask is None else jnp.where(point_mask[:, None], z, 0.0)
    z_norm = jax.lax.stop_gradient(jnp.linalg.norm(zm, axis=0, keepdims=True))
    z = jnp.maximum(z / (z_norm + eps) + 1.0, 0.0) * depth_constant

    scores = jnp.broadcast_to(z, (n, p))
    bg_scores = None
    if add_bg:
        zmin = jnp.min(z) if point_mask is None else jnp.min(
            jnp.where(point_mask[:, None], z, jnp.inf)
        )
        bg = jnp.where(jnp.isfinite(zmin), zmin - 1.0, 0.0)
        bg_scores = jnp.full((p,), bg, dtype)
    footprint = jax.lax.stop_gradient((dense > 0).astype(dtype))
    if point_mask is not None:
        footprint = footprint * point_mask.astype(dtype)[:, None]
        scores = jnp.where(point_mask[:, None], scores, jnp.finfo(dtype).min)
    return _masked_depth_softmax(scores, footprint, add_bg, bg_scores)
