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

pytestmark = pytest.mark.slow


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


TRAIN_CFG_TMPL = """
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375])
train_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="LoadAnnotations", with_bbox=True, with_bop_mask=True),
    dict(type="Resize", img_scale=(160, 128), keep_ratio=True),
    dict(type="GenerateDistanceMap"),
    dict(type="SampleDistanceAtAnchors"),
    dict(type="Pad", size_divisor=16),
]
model = dict(
    type="RADet",
    backbone=dict(depth=18, out_indices=(0, 1, 2, 3), frozen_stages=1, norm_eval=True),
    neck=dict(out_channels=32, start_level=1, num_outs=5),
    bbox_head=dict(
        num_classes=3,
        in_channels=32,
        stacked_convs=1,
        feat_channels=32,
        anchor_generator=dict(ratios=[1.0], octave_base_scale=8, scales_per_octave=1,
                              strides=[8, 16, 32, 64, 128]),
        bbox_coder=dict(type="TBLRBBoxCoder", normalizer=1/8),
    ),
)
test_cfg = dict(
    nms_pre=1000, score_thr=0.05, max_per_img=20,
    nms=dict(type="vote", iou_threshold=0.65, cluster_score=["cls", "iou"],
             vote_score=["iou", "cls"], iou_enable=False, sigma=0.025),
)
label_assignment = dict(neg_threshold=0.2, positive_num=10, balance_sample=True, max_gt=8)
# SGD, not AdamW: the equivalence under test is the distributed gradient
# sync.  SGD+momentum is LINEAR in the gradients, so the only multi-vs-single
# difference is fp32 reduction order (~1e-7 rel) and the final comparison can
# be tight.  AdamW's m/sqrt(v) normalization turns that same noise into full
# sign flips on near-zero-grad elements (measured: 2/128 elements of a BN
# bias off by 2.3e-4 after 4 warmup steps) — chaotic amplification that says
# nothing about the collective being wrong.
optimizer = dict(type="SGD", lr=1e-3, momentum=0.9, weight_decay=1e-4)
lr_config = dict(policy="onecycle", max_lr=1e-3, total_steps=100, pct_start=0.05)
runner = dict(max_iters=4)
checkpoint_config = dict(interval=1000, max_to_keep=1)
evaluation = dict(interval=0)
grad_clip = dict(max_norm=35.0)
log_config = dict(interval=1)
seed = 0
compute_dtype = "float32"
input_size = (128, 160)
data = dict(
    samples_per_gpu={batch},
    workers_per_gpu=2,
    shuffle=False,
    train=dict(
        ann_file=r"{ann_file}",
        img_prefix=r"{img_prefix}",
        pipeline=train_pipeline,
        min_visib_frac=0.0,
    ),
)
"""


def test_two_process_distributed_training_matches_single_process(tmp_path):
    """VERDICT r2 item 1: real multi-PROCESS training. Two jax processes run
    the full config-driven training loop (sharded infinite loader, jitted
    step over the global 2-device mesh, cross-process gradient all-reduce,
    orbax checkpoint from the primary process) for 4 steps; final params
    must equal a single-process run over the SAME global batch stream.

    Stream construction: shuffle=False, 4 images, per-host batch 2 over 2
    processes -> every global batch holds images [0,2,1,3] (host0's stride
    rows then host1's).  The single-process reference uses batch 4 over a
    json whose image list is reordered to [0,2,1,3], yielding bitwise the
    same global batch content at the same row positions (so the in-step
    assignment RNG, which is row-indexed, matches too).
    """
    root = tmp_path / "bop"
    ann_file, img_prefix = make_synthetic_bop(
        str(root), num_scenes=1, images_per_scene=4, img_hw=(128, 160), num_classes=3
    )

    # reordered-json view for the single-process reference
    with open(ann_file) as f:
        coco = json.load(f)
    assert len(coco["images"]) == 4
    coco_re = dict(coco)
    coco_re["images"] = [coco["images"][i] for i in (0, 2, 1, 3)]
    ann_re = str(tmp_path / "train_reordered.json")
    with open(ann_re, "w") as f:
        json.dump(coco_re, f)

    cfg_multi = tmp_path / "cfg_multi.py"
    cfg_multi.write_text(
        TRAIN_CFG_TMPL.format(batch=2, ann_file=ann_file, img_prefix=img_prefix)
    )
    cfg_single = tmp_path / "cfg_single.py"
    cfg_single.write_text(
        TRAIN_CFG_TMPL.format(batch=4, ann_file=ann_re, img_prefix=img_prefix)
    )

    worker = osp.join(osp.dirname(osp.abspath(__file__)), "multihost_train_worker.py")
    env = {
        k: v for k, v in os.environ.items() if not k.startswith(("JAX_", "XLA_"))
    }

    # --- 2-process run ---
    wd_multi = str(tmp_path / "work_multi")
    coordinator = f"127.0.0.1:{_free_port()}"
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coordinator, "2", str(pid), str(cfg_multi),
             wd_multi],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            # generous bound: ~315 s alone on this host, but a concurrent
            # full-suite run contends for the single core
            out, _ = p.communicate(timeout=1200)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"train worker {pid} failed:\n{out}"

    # checkpoint written (by the primary process) and restorable metadata
    from radet_tpu.engine.checkpoint import CheckpointManager

    mgr = CheckpointManager(osp.join(wd_multi, "checkpoints"))
    assert mgr.latest_step() == 4
    mgr.close()

    # cross-process replication: both processes ended with identical params
    import numpy as _np

    p0 = dict(_np.load(osp.join(wd_multi, "params_p0.npz")))
    p1 = dict(_np.load(osp.join(wd_multi, "params_p1.npz")))
    assert p0.keys() == p1.keys()
    for k in p0:
        _np.testing.assert_array_equal(p0[k], p1[k], err_msg=k)

    # --- single-process reference on the same global stream ---
    wd_single = str(tmp_path / "work_single")
    proc = subprocess.Popen(
        [sys.executable, worker, "unused", "1", "0", str(cfg_single), wd_single],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    out, _ = proc.communicate(timeout=1200)
    assert proc.returncode == 0, f"single-process reference failed:\n{out}"
    ps = dict(_np.load(osp.join(wd_single, "params_p0.npz")))

    assert ps.keys() == p0.keys()
    for k in p0:
        # tolerance: cross-device psum vs single-device sum differ only in
        # fp32 reduction order; under SGD that propagates linearly (see the
        # optimizer note in TRAIN_CFG_TMPL)
        _np.testing.assert_allclose(
            p0[k], ps[k], rtol=1e-4, atol=1e-6, err_msg=k
        )
