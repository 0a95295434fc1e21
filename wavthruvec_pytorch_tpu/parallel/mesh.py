"""Device-mesh / sharding layer: the TPU-native replacement for the
reference's NCCL + DDP + DistributedSampler stack.

Reference distributed path (vec2wav/train.py:58-60,91-94,114-122 and
hparams.py:65-69): ``init_process_group('nccl', tcp://...)``, DDP-wrapped
modules, per-rank sampled data.  On TPU all of that collapses into:

* one ``jax.sharding.Mesh`` over the visible devices (ICI within a slice,
  DCN across slices — XLA routes collectives automatically);
* batch arrays sharded over the ``data`` axis with NamedSharding;
* parameters replicated; gradient all-reduce emitted by XLA inside the
  jitted train step (the implicit psum that replaces DDP's all-reduce hooks).

Multi-host: call ``maybe_distributed_init()`` once per process before mesh
creation; each host feeds its local shard via ``shard_batch``.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_distributed_init() -> None:
    """Initialize jax.distributed when launched as a multi-process job
    (replaces init_process_group; no-op single-process).

    On managed clusters (SLURM / MPI / TPU pods) jax auto-detects the
    topology, so ``JAX_COORDINATOR_ADDRESS`` alone suffices.  Bare-metal
    launches (e.g. two plain processes on CPU hosts) have no detector —
    there ``JAX_NUM_PROCESSES`` and ``JAX_PROCESS_ID`` must be set too and
    are passed through explicitly."""
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr or jax.distributed.is_initialized():
        return
    n = os.environ.get("JAX_NUM_PROCESSES")
    i = os.environ.get("JAX_PROCESS_ID")
    if n is not None and i is not None:
        jax.distributed.initialize(
            coordinator_address=addr, num_processes=int(n), process_id=int(i)
        )
    else:
        jax.distributed.initialize()


def create_mesh(n_data: int = -1, data_axis: str = "data") -> Mesh:
    """1-D data-parallel mesh over the visible devices."""
    devices = jax.devices()
    if n_data == -1:
        n_data = len(devices)
    if n_data > len(devices):
        raise ValueError(f"requested {n_data} devices, have {len(devices)}")
    return Mesh(np.array(devices[:n_data]), (data_axis,))


def mesh_for_batch(batch_size: int, data_axis: str = "data") -> Optional[Mesh]:
    """Largest mesh whose size divides the global batch (None if 1 device).

    The batch axis must split evenly across the data axis; training loops use
    this to auto-size the mesh (the DistributedSampler-divisibility analog).
    """
    n_dev = len(jax.devices())
    n = min(n_dev, batch_size)
    while n > 1 and batch_size % n != 0:
        n -= 1
    if n <= 1:
        return None
    return create_mesh(n, data_axis)


def data_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(data_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, data_axis: str = "data"):
    """Place a host-side batch pytree so its leading axis is sharded over the
    mesh (the TPU analog of DistributedSampler feeding per-rank shards).

    Single-process: ``device_put`` with a NamedSharding.  Multi-process: each
    host holds only its LOCAL slice of the global batch (its filelist shard,
    see ``process_shard``) and the global array is assembled per-host with
    ``jax.make_array_from_process_local_data`` — the DistributedSampler
    equivalent where the "gather" is purely logical (no data movement).
    """
    sharding = data_sharding(mesh, data_axis)

    if jax.process_count() == 1:
        def put(x):
            return jax.device_put(x, sharding)
    else:
        def put(x):
            x = np.asarray(x)
            global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
            return jax.make_array_from_process_local_data(
                sharding, x, global_shape
            )

    return jax.tree_util.tree_map(put, batch)


def process_shard(items, process_index: Optional[int] = None,
                  process_count: Optional[int] = None):
    """Per-host shard of a filelist/buffer: host i takes items[i::n]
    (replaces DistributedSampler's rank sharding,
    vec2wav/train.py:114).  Truncates to a common length so every host
    emits the same number of batches (no rank can run ahead)."""
    n = jax.process_count() if process_count is None else process_count
    i = jax.process_index() if process_index is None else process_index
    if n == 1:
        return list(items)
    per = len(items) // n
    return list(items)[i::n][:per]


def globalize_state(tree, mesh: Optional[Mesh]):
    """Lift a process-local pytree (e.g. a freshly-initialized or restored
    train state, same values on every host) to global arrays replicated over
    a multi-process mesh, as the jitted step's replicated ``in_shardings``
    require.  No-op single-process or without a mesh — so loops can call it
    unconditionally after init/restore."""
    if mesh is None or jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    return multihost_utils.host_local_array_to_global_array(tree, mesh, P())


def local_batch_size(global_batch_size: int) -> int:
    """Per-host batch size for a global batch (must divide evenly)."""
    n = jax.process_count()
    if global_batch_size % n != 0:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by {n} hosts"
        )
    return global_batch_size // n
