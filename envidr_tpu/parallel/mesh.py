"""Device mesh + sharding for multi-chip / multi-host training.

The reference's only parallelism is vestigial DDP scaffolding
(``/root/reference/nerf/utils.py:400-402, 1352-1371`` — never activated; see
SURVEY.md §2.5).  Here data parallelism over the RAY axis is first-class:

  * 1-D ``data`` mesh over all chips (ICI); multi-host extends the same axis
    over DCN via ``jax.distributed.initialize``.
  * Params, occupancy grid, and optimizer state are replicated (the whole
    model is ~25 MB — replication is free, gradient psum rides ICI).
  * Ray batches and everything downstream ([N, K] sample tensors — the
    dominant memory) are sharded on the ray axis with explicit
    ``with_sharding_constraint``; GSPMD then auto-inserts the gradient
    all-reduce, overlapped with backward by XLA.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    devs = list(devices) if devices is not None else list(jax.devices())
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(devs, (DATA_AXIS,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def ray_sharded(mesh: Mesh) -> NamedSharding:
    """First (ray) axis sharded over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_rays(mesh: Optional[Mesh], *arrays):
    """Constrain each array's leading axis onto the data mesh axis."""
    if mesh is None:
        return arrays if len(arrays) > 1 else arrays[0]
    out = tuple(
        jax.lax.with_sharding_constraint(
            a, NamedSharding(mesh, P(DATA_AXIS, *([None] * (a.ndim - 1)))))
        for a in arrays)
    return out if len(out) > 1 else out[0]


def replicate_tree(mesh: Optional[Mesh], tree):
    if mesh is None:
        return tree
    s = replicated(mesh)
    return jax.device_put(tree, s)


def global_from_local(mesh: Optional[Mesh], *arrays):
    """Per-process local ray shards -> global ray-sharded arrays.

    The multi-host analogue of the reference's DDP batch split
    (``utils.py:1352-1371``): each host samples its ``N/P`` rays from its own
    image subset (``NeRFDataset(process_shard=True)``); this assembles them
    into global ``[N, ...]`` arrays sharded on the ``data`` axis so one jitted
    step consumes them and GSPMD psums the gradients across hosts over DCN.
    Single-process: a plain device_put onto the mesh (no-op reshard).
    """
    if mesh is None:
        return arrays if len(arrays) > 1 else arrays[0]
    import numpy as np
    out = []
    for a in arrays:
        sharding = NamedSharding(mesh, P(DATA_AXIS, *([None] * (a.ndim - 1))))
        if jax.process_count() > 1:
            out.append(jax.make_array_from_process_local_data(
                sharding, np.asarray(a)))
        else:
            out.append(jax.device_put(a, sharding))
    return tuple(out) if len(out) > 1 else out[0]


def initialize_multihost(coordinator: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None):
    """DCN bring-up (replaces torch.distributed/NCCL init, utils.py:360-402)."""
    kwargs = {}
    if coordinator:
        kwargs = dict(coordinator_address=coordinator,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
