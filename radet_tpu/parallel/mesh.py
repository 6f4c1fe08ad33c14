"""Device mesh + sharding helpers (the DDP/NCCL replacement).

The reference scales via torch DDP with NCCL allreduce
(/root/reference/radet/apis/train.py:73-84, configs/base/default_runtime.py:28).
TPU-native equivalent: a 1-D ``data`` mesh over all devices; batches are
sharded on their leading axis, parameters are replicated, and XLA inserts the
gradient all-reduce over ICI automatically when the jitted train step runs
under these shardings — there is no explicit collective code to maintain.

A detector at 480x640 has no sequence dimension; data parallelism is the only
parallelism the workload admits (SURVEY.md §2.3) — the mesh is therefore 1-D,
but the helpers accept an (optionally) named axis list so model-sharded
variants can reuse them.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(devices: Optional[Sequence] = None, axis_name: str = "data") -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Leading-axis sharding for batched arrays."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh, axis_name: str = "data"):
    """device_put a host batch with the leading axis sharded over the mesh.

    Single-process: a plain sharded ``device_put``.  Multi-process (a mesh
    spanning hosts): each host holds only ITS shard of the global batch (the
    per-host loader stride, data/loader.py), so the global array is assembled
    from process-local data — the jax-native analogue of DDP's
    one-rank-one-shard contract (reference apis/train.py:73-84).  The global
    batch axis is then ``per_host_batch * num_participating_hosts``.
    """
    sharding = batch_sharding(mesh, axis_name)
    local = {d.process_index for d in mesh.devices.flat}
    if local != {jax.process_index()}:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            batch,
        )
    return jax.device_put(batch, sharding)
