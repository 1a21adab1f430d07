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


def batch_tile_hints(batch: int) -> tuple[int, int]:
    """Batch-aware fused-splat tile sizes for vmapped refinement.

    Round-4 on-chip sweep result (scripts/measure_batched_crops.py
    --block-px/--chunk, BENCH_NOTES "Batched tile sweep"): the B >= 4
    regression (B=8 is ~0.96x per-crop vs B=1) is NOT tile/VMEM-bound —
    chunk 256 moved it +0.5% (noise), block 256 and 256/256 made it
    WORSE (-3 to -6%). The default tiles are already right under vmap;
    the residual overhead is the batched scan's working-set growth, and
    B=2 (+6%) remains the only single-chip batching win. This hook stays
    as the measured seam (returns kernel defaults) so future sweeps have
    a one-line landing site.
    """
    return (0, 0)


def make_batched_refine(
    sdf_decoder,
    cfg: refine_mod.RefineConfig,
    grid_points,
    crop_hw: tuple[int, int],
    mesh: Mesh | None = None,
    select_decoder=None,
    stage2_fn=None,
    with_extents: bool = False,
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

    with_extents=True additionally returns per-crop SurfaceExtents of the
    FINAL latent (engine.labels.surface_extents) computed inside the same
    compiled program — the driver's label finishing then needs only a
    7-float-per-crop host fetch instead of a surface-cloud transfer plus
    an eager re-decode per crop.
    """

    def one(params0, K, nocs, fr, fm, pm):
        fn = refine_mod.make_refine_fn(sdf_decoder, cfg, grid_points, K,
                                       crop_hw,
                                       select_decoder=select_decoder,
                                       stage2_fn=stage2_fn)
        final, hist = fn(params0, nocs, fr, fm, pm)
        if not with_extents:
            return final, hist
        from sdflabel_tpu.engine import labels as labels_mod

        ext = labels_mod.surface_extents(
            sdf_decoder, grid_points, final.latent,
            capacity=cfg.surface_capacity,
            threshold=cfg.surface_threshold,
        )
        return final, hist, ext

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
        out_shardings=(shard, shard, shard) if with_extents
        else (shard, shard),
    )
