"""Fused Pallas top-1 nearest-neighbor (streaming min + argmin).

Why this kernel exists: the refinement iteration's 3D-loss NN
(engine/losses.py via ops.knn.nearest_neighbor, reference semantics
optimizer.py:180-185) lowers under XLA to a materialized (N, M) fp32
distance matrix plus a second argmin pass over it — at the production
4096x4096 scale that is a 64 MB HBM round trip, profiled at 171 us/iter
(multiply_reduce_fusion + iota_reduce_fusion, round-3 trace) against
~70 us of pure VPU arithmetic. This kernel streams data chunks through
VMEM, keeping a running (min, argmin) per query row — the (N, M) matrix
never exists.

Numerics contract: bit-identical to ops.knn.nearest_neighbor's TPU
branch — the same exact-fp32 per-pair (q-d) subtract/square/3-term-sum,
the same first-min-index tie-breaking (within a chunk via the
iota-where-min idiom; across chunks via strictly-less updates), and
masked/pad columns excluded via a +1e30 sentinel (vs the jnp path's
+inf: sqrt(1e30)=1e15 still fails every downstream `dist < threshold`
test, and a fully-masked row yields index 0 in both paths).
Non-differentiable by design (zero-cotangent custom VJP): every caller
stop-gradients the NN inputs — the reference's KDTree lookup carries no
gradients either (pair distances are re-derived differentiably from the
indices, losses.loss_3d_terms).

Layout (see ops.splat_pallas for the discipline): query coordinates ride
the sublane axis as (QB, 1) columns, data coordinates ride the lane axis
as (1, MB) rows of a packed (4, M) [x; y; z; mask] buffer — the (QB, MB)
distance block is pure VPU broadcast arithmetic, no transposes, no
tiny-K matmuls.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30  # masked/pad distance sentinel (see numerics contract above)


def _round_up(x, m):
    return (x + m - 1) // m * m


def _nn_kernel(q_ref, d_ref, dmin_ref, idx_ref, *, mb):
    j = pl.program_id(1)
    q0, q1, q2 = q_ref[:, 0:1], q_ref[:, 1:2], q_ref[:, 2:3]  # (QB, 1)
    dx, dy, dz = d_ref[0:1, :], d_ref[1:2, :], d_ref[2:3, :]  # (1, MB)
    dm = d_ref[3:4, :]
    t0 = q0 - dx
    t1 = q1 - dy
    t2 = q2 - dz
    # same 3-term left-associated sum as the jnp TPU branch (bit-equal)
    d2 = t0 * t0 + t1 * t1 + t2 * t2  # (QB, MB)
    d2 = jnp.where(dm > 0.5, d2, _BIG)
    lmin = jnp.min(d2, axis=1, keepdims=True)  # (QB, 1)
    # first-min index within the chunk: iota where equal-to-min, then min
    iota = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    lidx = jnp.min(jnp.where(d2 == lmin, iota, mb), axis=1,
                   keepdims=True) + j * mb  # (QB, 1) global data index

    @pl.when(j == 0)
    def _init():
        dmin_ref[:, :] = lmin
        idx_ref[:, :] = lidx

    @pl.when(j != 0)
    def _update():
        better = lmin < dmin_ref[:, :]  # strict: earlier chunk wins ties
        idx_ref[:, :] = jnp.where(better, lidx, idx_ref[:, :])
        dmin_ref[:, :] = jnp.where(better, lmin, dmin_ref[:, :])


def _nn_call(query, data_packed, qb, mb):
    n_pad = query.shape[0]
    m_pad = data_packed.shape[1]
    grid = (n_pad // qb, m_pad // mb)
    return pl.pallas_call(
        functools.partial(_nn_kernel, mb=mb),
        grid=grid,
        in_specs=[
            pl.BlockSpec((qb, 4), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, mb), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((qb, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=9 * n_pad * m_pad,
            bytes_accessed=n_pad * 16 + m_pad * 16 + n_pad * 8,
            transcendentals=0,
        ),
    )(query, data_packed)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _nn_core(query, data, data_mask, qb, mb):
    n, m = query.shape[0], data.shape[0]
    n_pad, m_pad = _round_up(max(n, 8), qb), _round_up(max(m, 128), mb)
    q = jnp.pad(query.astype(jnp.float32), ((0, n_pad - n), (0, 1)))
    packed = jnp.concatenate(
        [data.astype(jnp.float32).T,
         data_mask.astype(jnp.float32)[None, :]], axis=0)  # (4, M)
    packed = jnp.pad(packed, ((0, 0), (0, m_pad - m)))  # pad mask = 0
    d2min, idx = _nn_call(q, packed, qb, mb)
    return d2min[:n, 0], idx[:n, 0]


def _nn_fwd(query, data, data_mask, qb, mb):
    return _nn_core(query, data, data_mask, qb, mb), (query, data, data_mask)


def _nn_bwd(qb, mb, res, _ct):
    query, data, data_mask = res
    return (jnp.zeros_like(query), jnp.zeros_like(data),
            jnp.zeros_like(data_mask, dtype=query.dtype))


_nn_core.defvjp(_nn_fwd, _nn_bwd)


def nearest_neighbor_fused(
    query: jax.Array,
    data: jax.Array,
    data_mask: jax.Array | None = None,
    qb: int = 256,
    mb: int = 512,
) -> tuple[jax.Array, jax.Array]:
    """Drop-in for ops.knn.nearest_neighbor on TPU (see module docstring).

    Returns (dist, idx) with dist = sqrt of the exact-fp32 min squared
    distance; a fully-masked `data` yields dist = sqrt(1e30) ~ 1e15
    (the jnp path yields inf — both fail every `dist < threshold` use).
    """
    n, m = query.shape[0], data.shape[0]
    mask = (jnp.ones((m,), jnp.float32) if data_mask is None
            else data_mask.astype(jnp.float32))
    qb = min(qb, _round_up(max(n, 8), 8))
    mb = min(mb, _round_up(max(m, 128), 128))
    d2, idx = _nn_core(query, data, mask, qb, mb)
    return jnp.sqrt(d2), idx
