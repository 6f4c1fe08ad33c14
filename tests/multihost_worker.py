"""Worker process for tests/test_multihost.py — NOT collected by pytest.

Exercises the real multi-process paths that single-process tests cannot
(VERDICT r1 item 5): env-gated ``jax.distributed.initialize()`` (the same
mechanism apis/train.py:53-57 uses), the process-sharded test DataLoader,
a cross-process collective, and ``gather_results_multihost``
(the reference collect_results_gpu analogue, apis/test.py).

Usage: python multihost_worker.py <coordinator> <nproc> <pid> <ann_file>
       <img_prefix> <out_json>
"""

import json
import os
import sys

coordinator, nproc, pid, ann_file, img_prefix, out_path = sys.argv[1:7]

# apis/train.py:53-57 calls jax.distributed.initialize() with no args and
# relies on cluster autodetection (Slurm/OMPI/TPU-pod); plain local
# subprocesses are not a detectable cluster, so the worker passes the
# coordinator/process info explicitly — the initialized runtime is identical
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=coordinator,
    num_processes=int(nproc),
    process_id=int(pid),
)
assert jax.process_count() == int(nproc), jax.process_count()
assert jax.process_index() == int(pid)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from radet_tpu.apis.test import gather_results_multihost  # noqa: E402
from radet_tpu.data.bop import BOPDataset  # noqa: E402
from radet_tpu.data.loader import DataLoader  # noqa: E402

PIPELINE = [
    dict(type="LoadImageFromFile"),
    dict(type="Resize", img_scale=(160, 128), keep_ratio=True),
    dict(type="Pad", size_divisor=32),
]

ds = BOPDataset(
    ann_file,
    img_prefix=img_prefix,
    pipeline=PIPELINE,
    test_mode=True,
    input_size=(128, 160),
)
loader = DataLoader(
    ds,
    batch_size=2,
    shuffle=False,
    num_workers=2,
    drop_last=False,
    infinite=False,
    shard_id=jax.process_index(),
    num_shards=jax.process_count(),
)

# deterministic per-image 'detections' derived from actual pixel content, so
# the assert catches both missing shards and shard/image misalignment
results = []
n_local = 0
for batch in loader:
    for i in range(batch["image"].shape[0]):
        img_id = int(batch["img_id"][i])
        checksum = float(np.asarray(batch["image"][i], np.float64).sum())
        results.append(
            dict(
                boxes=np.asarray([[checksum, 1.0, 2.0, 3.0]], np.float32),
                scores=np.asarray([img_id / 100.0], np.float32),
                labels=np.asarray([img_id % 3], np.int64),
                img_id=img_id,
            )
        )
        n_local += 1

# a raw cross-process collective over the distributed backend
from jax.experimental import multihost_utils  # noqa: E402

ranks = np.asarray(
    multihost_utils.process_allgather(np.asarray([float(jax.process_index())]))
).reshape(-1)
assert sorted(ranks.tolist()) == [float(i) for i in range(int(nproc))], ranks

merged = gather_results_multihost(results)

if jax.process_index() == 0:
    with open(out_path, "w") as f:
        json.dump(
            dict(
                n_local=n_local,
                img_ids=[int(r["img_id"]) for r in merged],
                checksums={
                    str(int(r["img_id"])): float(r["boxes"][0][0]) for r in merged
                },
            ),
            f,
        )
print(f"worker {pid} ok: local={n_local} merged={len(merged)}")
