"""Mesh construction + sharding helpers — the distributed runtime.

Replaces the reference's torch_xla runtime stack (SURVEY.md §2
'Parallelism strategies'):

  xmp.spawn per core + init_process_group('xla', 'pjrt://')
      -> one process per HOST, a ``jax.sharding.Mesh`` over all devices
  pjrt.broadcast_master_param        -> ``replicate`` (NamedSharding P())
  DistributedSampler                 -> per-host dataset shard (data/coco)
  xm.optimizer_step grad all-reduce  -> lax.pmean inside the jitted step
  xm.all_reduce seed sync            -> one PRNG key folded with the step

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh``;
the data axis then spans ICI within a slice and DCN across hosts, and
every helper here works unchanged.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devices = np.array(jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(devices.reshape(-1), (axis,))


def replicate(tree, mesh: Mesh):
    """Place every leaf replicated over the mesh (broadcast_master_param,
    reference train.py:78-85)."""
    return jax.device_put(tree, NamedSharding(mesh, P()))


def shard_batch(tree, mesh: Mesh, axis: str = "data"):
    """Shard the leading batch axis over the mesh."""
    return jax.device_put(tree, NamedSharding(mesh, P(axis)))


def local_batch_size(global_batch: int, mesh: Mesh, axis: str = "data") -> int:
    n = mesh.shape[axis]
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by {n} devices")
    return global_batch // n
