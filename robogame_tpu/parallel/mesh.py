"""Device-mesh helpers for sharding game batches across TPU chips.

The reference is single-process / single-thread (its Monte-Carlo loop runs
games sequentially, /root/reference/py/MonteCarlo.py:23-45).  Here the batch
of games is the parallelism axis: a 1D mesh over all chips, games sharded
along it, XLA inserting ICI collectives for any cross-game reduction.
Multi-host runs use the same program under ``jax.distributed``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "games"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    devs = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (BATCH_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (game batch) axis, replicate the rest."""
    return NamedSharding(mesh, P(BATCH_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh):
    """Place a pytree of batch-leading arrays onto the mesh, sharded on the
    leading axis."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Multi-host entry: wraps ``jax.distributed.initialize``.  On a pod
    slice with TPU metadata available, arguments are auto-detected."""
    kwargs = {}
    if coordinator is not None:
        kwargs = dict(coordinator_address=coordinator,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
