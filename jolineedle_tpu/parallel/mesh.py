"""Device mesh construction and sharding helpers.

Replaces the reference's process-per-GPU DDP/NCCL stack (reference:
main.py:428-433 ``mp.spawn``, src/trainer.py:61-71 ``init_process_group``)
with single-program GSPMD: one ``Mesh`` with a ``data`` axis, batches sharded
on it, parameters replicated; XLA inserts the gradient all-reduce over ICI.
Multi-host extends via ``jax.distributed.initialize`` (no rendezvous code
needed here).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(device_ids: Optional[Sequence[int]] = None) -> Mesh:
    """1D data-parallel mesh over the given device indices (default: all).

    ``device_ids`` keeps CLI parity with the reference's ``--devices`` flag.
    """
    devices = jax.devices()
    if device_ids is not None:
        bad = [i for i in device_ids if not 0 <= i < len(devices)]
        if bad:
            raise ValueError(
                f"--devices {sorted(set(bad))} out of range: "
                f"{len(devices)} device(s) visible"
            )
        devices = [devices[i] for i in device_ids]
    return Mesh(np.array(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict, batch_axis: int = 0) -> dict:
    """Device-put a host batch with dim ``batch_axis`` sharded over data.

    ``batch_axis=1`` serves stacked multi-step batches [K, B, ...]
    (--steps-per-dispatch): the scan axis K is replicated, the per-device
    batch B stays sharded."""
    if batch_axis == 0:
        sharding = batch_sharding(mesh)
    else:
        sharding = NamedSharding(
            mesh, P(*((None,) * batch_axis + (DATA_AXIS,)))
        )
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def replicate(mesh: Mesh, tree):
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


