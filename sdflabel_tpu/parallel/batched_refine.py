"""Batched multi-crop refinement over the device mesh.

The reference refines one annotation at a time in a python loop
(refine_css.py:94); here a whole batch of crops refines simultaneously:
vmap over the crop axis turns the per-crop scan into a batched scan, and
the crop axis is sharded over the mesh 'data' axis — each chip refines its
crop shard independently (no collectives needed; crops are embarrassingly
parallel, exactly like the reference's MPI frame partitioning but on-chip).

This is where crops/hour is won (SURVEY.md §2.D, §7.6): one compiled
program refines `batch` crops with zero host round-trips.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sdflabel_tpu.engine import refine as refine_mod


def make_batched_refine(
    sdf_decoder,
    cfg: refine_mod.RefineConfig,
    grid_points,
    crop_hw: tuple[int, int],
    mesh: Mesh | None = None,
    select_decoder=None,
    stage2_fn=None,
):
    """Returns refine_batch(params0_b, K_b, nocs_b, frustum_b, fmask_b,
    pixel_masks_b) — SIX arguments; the per-crop pixel validity mask is
    required (letterboxed batching always has one; pass
    jnp.ones((b,) + crop_hw, bool) for full-frame crops).

    All arguments carry a leading crop axis. K varies per crop (per-crop
    adjusted intrinsics, refinement.py:586-609), so it is an argument of
    the vmapped function rather than a closure constant.

    cfg.warm_band/select_decoder pass straight through to
    make_refine_fn; under vmap the warm refresh lax.cond keeps real
    cond semantics because its predicate (the scan counter) is unbatched.
    """

    def one(params0, K, nocs, fr, fm, pm):
        fn = refine_mod.make_refine_fn(sdf_decoder, cfg, grid_points, K,
                                       crop_hw,
                                       select_decoder=select_decoder,
                                       stage2_fn=stage2_fn)
        return fn(params0, nocs, fr, fm, pm)

    batched = jax.vmap(one)

    # pixel_masks is REQUIRED (letterboxed batching always has one; pass
    # jnp.ones((b,)+crop_hw, bool) for full-frame crops) — an optional arg
    # would make the sharded in_shardings arity unreachable.
    if mesh is None:
        return jax.jit(batched)

    shard = NamedSharding(mesh, P("data"))
    return jax.jit(
        batched,
        in_shardings=(shard, shard, shard, shard, shard, shard),
        out_shardings=(shard, shard),
    )
