"""Brute-force nearest neighbor on device.

Replaces the reference's sklearn KDTree calls (optimizer.py:180-181,
pose.py:136-137) — for N up to ~100k points, a masked distance-matrix argmin
on the MXU beats a host KDTree round-trip and, crucially, keeps the whole
refinement loop on-device with zero host syncs (SURVEY.md §3.1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pairwise_sq_dists(a: jax.Array, b: jax.Array) -> jax.Array:
    """(N, M) squared euclidean distances via one matmul (MXU-friendly).

    precision=HIGHEST: TPU's default bf16 matmul passes produce ~1e-2
    absolute distance error at scene scales, enough to flip NN choices and
    inlier thresholds — geometry matmuls must run full fp32.
    """
    aa = jnp.sum(a * a, axis=-1)[:, None]
    bb = jnp.sum(b * b, axis=-1)[None, :]
    ab = jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), precision=jax.lax.Precision.HIGHEST
    )
    return jnp.maximum(aa - 2.0 * ab + bb, 0.0)


def nearest_neighbor(
    query: jax.Array,
    data: jax.Array,
    data_mask: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Top-1 NN of each query point in data.

    Returns (dists, idxs): dists are euclidean; masked data points are
    excluded (distance +inf). Shapes: query (N,3), data (M,3) -> (N,), (N,).
    """
    d2 = pairwise_sq_dists(query, data)
    if data_mask is not None:
        d2 = jnp.where(data_mask[None, :], d2, jnp.inf)
    idx = jnp.argmin(d2, axis=-1)
    dist = jnp.sqrt(jnp.take_along_axis(d2, idx[:, None], axis=-1))[:, 0]
    return dist, idx
