"""Device mesh + sharding helpers (the DDP/NCCL replacement).

The reference scales via torch DDP with NCCL allreduce
(/root/reference/radet/apis/train.py:73-84, configs/base/default_runtime.py:28).
TPU-native equivalent: a ``data`` mesh over all devices; batches are sharded
on their leading axis, parameters are replicated, and XLA inserts the
gradient all-reduce over ICI automatically when the jitted train step runs
under these shardings — there is no explicit collective code to maintain.

Beyond DDP, the mesh optionally carries a second ``space`` axis for spatial
partitioning: image tensors (NHWC) are sharded over BOTH batch and H, and
XLA's SPMD partitioner inserts the conv halo exchanges over ICI.  This is a
capability the reference's DDP design cannot express — it divides the
per-image work (and activation memory) of one sample across ``space`` chips,
cutting single-image latency when the batch is smaller than the slice
(latency-bound serving) and enabling resolutions whose activations exceed
one chip's HBM.  Everything downstream of the backbone (flattened-anchor
tensors, assignment, loss) carries no H axis; GSPMD re-shards at that
boundary automatically, so the train/infer step code is unchanged.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPACE_AXIS = "space"


def create_mesh(
    devices: Optional[Sequence] = None,
    axis_name: str = DATA_AXIS,
    *,
    space: int = 1,
) -> Mesh:
    """1-D data mesh, or a (data, space) 2-D mesh when ``space > 1``.

    ``space`` divides the device count; adjacent devices (fastest-varying
    mesh dim) form each spatial group so halo exchanges ride the shortest
    ICI hops.
    """
    devices = list(devices if devices is not None else jax.devices())
    if space <= 1:
        return Mesh(np.array(devices), (axis_name,))
    if len(devices) % space != 0:
        raise ValueError(
            f"space={space} must divide the {len(devices)}-device mesh"
        )
    arr = np.array(devices).reshape(len(devices) // space, space)
    return Mesh(arr, (axis_name, SPACE_AXIS))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Leading-axis sharding for batched arrays."""
    return NamedSharding(mesh, P(axis_name))


def image_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """NHWC image sharding: batch over ``data``; H additionally over
    ``space`` when the mesh carries a spatial axis."""
    if SPACE_AXIS in mesh.axis_names:
        return NamedSharding(mesh, P(axis_name, SPACE_AXIS))
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _spec_for(key: str, value: Any, mesh: Mesh, axis_name: str) -> NamedSharding:
    if key in ("image", "images") and np.ndim(value) >= 4:
        return image_sharding(mesh, axis_name)
    return batch_sharding(mesh, axis_name)


def shard_batch(batch: Dict[str, Any], mesh: Mesh, axis_name: str = DATA_AXIS):
    """device_put a host batch sharded over the mesh: every array's leading
    (batch) axis over ``data``; image tensors additionally H-sharded over
    ``space`` on a 2-D mesh (see module docstring).

    Single-process: a plain sharded ``device_put``.  Multi-process (a mesh
    spanning hosts): each host holds only ITS shard of the global batch (the
    per-host loader stride, data/loader.py), so the global array is assembled
    from process-local data — the jax-native analogue of DDP's
    one-rank-one-shard contract (reference apis/train.py:73-84).  The global
    batch axis is then ``per_host_batch * num_participating_hosts``.
    """
    local = {d.process_index for d in mesh.devices.flat}
    if local != {jax.process_index()}:
        return {
            k: jax.make_array_from_process_local_data(
                _spec_for(k, v, mesh, axis_name), np.asarray(v)
            )
            for k, v in batch.items()
        }
    return {
        k: jax.device_put(v, _spec_for(k, v, mesh, axis_name))
        for k, v in batch.items()
    }
