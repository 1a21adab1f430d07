"""Device mesh construction and sharding helpers.

Design (SURVEY.md §2.D): the reference's only parallelism is MPI rank ->
GPU pinning with file-based frame partitioning. The TPU framework instead
expresses everything over a jax.sharding.Mesh with two logical axes:

  * 'data'  — crops/frames (DCN across hosts x ICI within host). Batched
    refinement vmaps over crops and shards that axis; CSS training shards
    the batch axis.
  * 'rays'  — pixels/rays within a crop (ICI). Used by the sharded splat
    path for large renders: pixels partition across chips, parameter
    gradients psum over the axis.

Frames-per-host partitioning (the mpirun + shared-FS pattern at
rotate_iou.py:10-14 / refine_css.py:26,68) maps to jax.process_index().
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_rays: int = 1,
              devices=None) -> Mesh:
    """Build a (data, rays) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_rays
    if n_data * n_rays != n:
        raise ValueError(f"mesh {n_data}x{n_rays} != {n} devices")
    arr = np.asarray(devices).reshape(n_data, n_rays)
    return Mesh(arr, ("data", "rays"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Multi-host bring-up (SURVEY.md §2.D collective-backend row).

    Replaces the reference's mpirun + rank->GPU pinning
    (rotate_iou.py:10-14): jax.distributed wires every host into one
    global mesh; XLA collectives then ride ICI within a slice and DCN
    across hosts. No-op when env-based auto-detection applies (GKE/Borg)
    and no explicit coordinator is given.
    """
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError) as e:
        # single-process runs (the common dev case) need no coordinator
        print(f"jax.distributed not initialized ({e}); single-process mode")


def process_frame_subset(num_frames: int) -> range:
    """Static frame partition for this host (replaces MPI rank partitioning)."""
    rank = jax.process_index()
    world = jax.process_count()
    per = (num_frames + world - 1) // world
    return range(rank * per, min((rank + 1) * per, num_frames))
