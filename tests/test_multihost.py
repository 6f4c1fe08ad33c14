"""Real 2-process multi-host exercise (VERDICT r1 item 5).

Spawns two local CPU jax processes that initialize the distributed runtime
through the same env-gated contract as apis/train.py:53-57, iterate the
process-sharded test DataLoader, run a cross-process collective, and merge
per-host result shards with gather_results_multihost. Asserts the gathered
results equal a single-process pass: full image coverage, no shard-padding
duplicates, shard-content alignment (per-image pixel checksums).

Reference behavior being matched: multi_gpu_test + collect_results_gpu
(/root/reference/radet/apis/test.py:69-190).
"""

import json
import os
import os.path as osp
import socket
import subprocess
import sys

import numpy as np
import pytest

from fixtures import make_synthetic_bop


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sharded_eval_gather(tmp_path):
    root = tmp_path / "bop"
    # 5 images / 2 processes exercises the shard-padding dedup path
    ann_file, img_prefix = make_synthetic_bop(
        str(root), num_scenes=1, images_per_scene=5, img_hw=(128, 160), num_classes=3
    )
    out_json = str(tmp_path / "gathered.json")
    worker = osp.join(osp.dirname(osp.abspath(__file__)), "multihost_worker.py")
    coordinator = f"127.0.0.1:{_free_port()}"

    env = {
        k: v
        for k, v in os.environ.items()
        # scrub this process's jax/xla test config so workers start clean
        if not k.startswith(("JAX_", "XLA_"))
    }
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coordinator, "2", str(pid), ann_file,
             img_prefix, out_json],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"

    with open(out_json) as f:
        gathered = json.load(f)

    # single-process ground truth
    from radet_tpu.data.bop import BOPDataset

    ds = BOPDataset(
        ann_file,
        img_prefix=img_prefix,
        pipeline=[
            dict(type="LoadImageFromFile"),
            dict(type="Resize", img_scale=(160, 128), keep_ratio=True),
            dict(type="Pad", size_divisor=32),
        ],
        test_mode=True,
        input_size=(128, 160),
    )
    assert sorted(gathered["img_ids"]) == sorted(ds.img_ids)
    assert len(gathered["img_ids"]) == len(set(gathered["img_ids"])), (
        "shard-padding duplicates survived the gather"
    )
    for idx in range(len(ds)):
        s = ds[idx]
        want = float(np.asarray(s["image"], np.float64).sum())
        got = gathered["checksums"][str(int(s["img_id"]))]
        np.testing.assert_allclose(got, want, rtol=1e-6)
