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
    """device_put a host batch with the leading axis sharded over the mesh."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.device_put(batch, sharding)
