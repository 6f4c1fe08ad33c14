"""End-to-end slices for the generic anchor-based head path: config-driven
ATSSHead and AnchorHead (retina-style, 9 anchors/cell) training on the
synthetic BOP fixture, plus compiled inference through the same
test_from_config entry the CLI uses.

VERDICT r3 item 1 'done' criterion: a config with
``bbox_head=dict(type='ATSSHead')`` builds, trains (loss decreases), and
evals; same for a 3-scale x 3-ratio AnchorHead config.
"""

import logging
import os.path as osp
from types import SimpleNamespace

import jax
import numpy as np
import pytest

from fixtures import make_synthetic_bop

pytestmark = pytest.mark.slow

TINY_INPUT = (128, 160)

ATSS_HEAD = """dict(
        type="ATSSHead",
        num_classes=3,
        in_channels=32,
        stacked_convs=1,
        feat_channels=32,
        quality="centerness",
        anchor_generator=dict(
            type="AnchorGenerator", ratios=[1.0], octave_base_scale=8,
            scales_per_octave=1, strides=[8, 16, 32, 64, 128],
        ),
        bbox_coder=dict(type="DeltaXYWHBBoxCoder",
                        target_means=[0.0, 0.0, 0.0, 0.0],
                        target_stds=[0.1, 0.1, 0.2, 0.2]),
        loss_cls=dict(type="FocalLoss", use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0),
        loss_bbox=dict(type="GIoULoss", loss_weight=2.0),
        loss_centerness=dict(type="CrossEntropyLoss", use_sigmoid=True,
                             loss_weight=1.0),
    )"""
ATSS_TRAIN_CFG = """dict(
    assigner=dict(type="ATSSAssigner", topk=9), allowed_border=-1,
    pos_weight=-1,
)"""

RETINA_HEAD = """dict(
        type="AnchorHead",
        num_classes=3,
        in_channels=32,
        anchor_generator=dict(
            type="AnchorGenerator", ratios=[0.5, 1.0, 2.0],
            octave_base_scale=4, scales_per_octave=3,
            strides=[8, 16, 32, 64, 128],
        ),
        bbox_coder=dict(type="DeltaXYWHBBoxCoder"),
        loss_cls=dict(type="FocalLoss", use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0),
        loss_bbox=dict(type="SmoothL1Loss", beta=0.11, loss_weight=1.0),
    )"""
RETINA_TRAIN_CFG = """dict(
    assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.5, neg_iou_thr=0.4,
                  min_pos_iou=0.0, ignore_iof_thr=-1),
    allowed_border=-1, pos_weight=-1,
)"""


def _write_cfg(tmp_path, bop_root, head, train_cfg, max_iters=25, name="cfg"):
    cfg_path = tmp_path / f"{name}.py"
    cfg_path.write_text(
        f"""
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375])
train_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="LoadAnnotations", with_bbox=True),
    dict(type="Resize", img_scale=(160, 128), keep_ratio=True),
    dict(type="RandomFlip", flip_ratio=0.5),
    dict(type="Pad", size_divisor=16),
]
test_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="Resize", img_scale=(160, 128), keep_ratio=True),
    dict(type="Pad", size_divisor=32),
]
model = dict(
    type="SingleStageDetector",
    backbone=dict(depth=18, out_indices=(0, 1, 2, 3), frozen_stages=1, norm_eval=True),
    neck=dict(out_channels=32, start_level=1, num_outs=5),
    bbox_head={head},
)
train_cfg = {train_cfg}
test_cfg = dict(nms_pre=500, score_thr=0.05, max_per_img=20,
                nms=dict(type="nms", iou_threshold=0.6))
label_assignment = dict(max_gt=8)
optimizer = dict(type="adamw", lr=1e-3, betas=(0.9, 0.999), weight_decay=0.05, eps=1e-8)
lr_config = dict(policy="onecycle", max_lr=1e-3, total_steps=100, pct_start=0.05)
runner = dict(max_iters={max_iters})
checkpoint_config = dict(interval=1000, max_to_keep=1)
evaluation = dict(interval=0)
grad_clip = dict(max_norm=35.0)
log_config = dict(interval=1)
seed = 0
compute_dtype = "float32"
input_size = (128, 160)
data = dict(
    samples_per_gpu=2,
    workers_per_gpu=2,
    train=dict(
        ann_file=r"{bop_root}/detector_annotations/train_pbr.json",
        img_prefix=r"{bop_root}/train_pbr/",
        pipeline=train_pipeline,
        min_visib_frac=0.0,
    ),
    val=dict(
        ann_file=r"{bop_root}/detector_annotations/train_pbr.json",
        img_prefix=r"{bop_root}/train_pbr/",
        pipeline=test_pipeline,
    ),
    test=dict(
        ann_file=r"{bop_root}/detector_annotations/train_pbr.json",
        img_prefix=r"{bop_root}/train_pbr/",
        pipeline=test_pipeline,
        bop_submission=True,
    ),
)
"""
    )
    return str(cfg_path)


@pytest.fixture(scope="module")
def bop_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("bop_anchor_e2e")
    make_synthetic_bop(
        str(root), num_scenes=1, images_per_scene=4, img_hw=(128, 160), num_classes=3
    )
    return str(root)


def _train(tmp_path_factory, bop_root, head, train_cfg, name):
    from radet_tpu.apis.train import train_detector
    from radet_tpu.utils import Config

    tmp = tmp_path_factory.mktemp(f"anchor_e2e_{name}")
    cfg = Config.fromfile(
        _write_cfg(tmp, bop_root, head, train_cfg, name=name)
    )
    records = []
    handler = logging.Handler()
    handler.emit = lambda rec: records.append(rec.getMessage())
    logging.getLogger("radet_tpu").addHandler(handler)
    try:
        state = train_detector(
            cfg, work_dir=str(tmp / "work"), eval_during_train=False
        )
    finally:
        logging.getLogger("radet_tpu").removeHandler(handler)
    return SimpleNamespace(cfg=cfg, state=state, records=records)


@pytest.fixture(scope="module")
def atss_trained(tmp_path_factory, bop_root):
    return _train(tmp_path_factory, bop_root, ATSS_HEAD, ATSS_TRAIN_CFG, "atss")


def _logged_losses(records):
    losses = []
    for msg in records:
        if "loss " in msg and "iter" in msg:
            losses.append(float(msg.split("loss ")[1].split()[0]))
    return losses


def test_atss_trains_and_loss_decreases(atss_trained):
    assert int(atss_trained.state.step) == 25
    losses = _logged_losses(atss_trained.records)
    assert len(losses) >= 20
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses
    assert np.isfinite(losses).all()


def test_atss_inference_and_eval(atss_trained):
    from radet_tpu.apis.test import test_from_config

    variables = {
        "params": jax.device_get(atss_trained.state.params),
        "batch_stats": jax.device_get(atss_trained.state.batch_stats),
    }
    dataset, results, metrics = test_from_config(
        atss_trained.cfg, variables, split="val", batch_size=2
    )
    assert len(results) == 4
    for r in results:
        assert r["boxes"].shape[-1] == 4
        assert np.isfinite(r["boxes"]).all()
    assert "bbox_mAP" in metrics


def test_retina_anchorhead_trains(tmp_path_factory, bop_root):
    trained = _train(
        tmp_path_factory, bop_root, RETINA_HEAD, RETINA_TRAIN_CFG, "retina"
    )
    assert int(trained.state.step) == 25
    losses = _logged_losses(trained.records)
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses

    # inference through the same config entry (9 anchors/cell decode path)
    from radet_tpu.apis.test import test_from_config

    variables = {
        "params": jax.device_get(trained.state.params),
        "batch_stats": jax.device_get(trained.state.batch_stats),
    }
    dataset, results, metrics = test_from_config(
        trained.cfg, variables, split="val", batch_size=2
    )
    assert len(results) == 4
    assert "bbox_mAP" in metrics


RPN_STYLE_HEAD = """dict(
        type="AnchorHead",
        num_classes=1,
        in_channels=32,
        anchor_generator=dict(
            type="AnchorGenerator", ratios=[0.5, 1.0, 2.0], scales=[8],
            strides=[8, 16, 32, 64, 128],
        ),
        bbox_coder=dict(type="DeltaXYWHBBoxCoder"),
        loss_cls=dict(type="CrossEntropyLoss", use_sigmoid=True,
                      loss_weight=1.0),
        loss_bbox=dict(type="L1Loss", loss_weight=1.0),
    )"""
RPN_STYLE_TRAIN_CFG = """dict(
    assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.7, neg_iou_thr=0.3,
                  min_pos_iou=0.3, ignore_iof_thr=-1),
    sampler=dict(type="RandomSampler", num=256, pos_fraction=0.5,
                 neg_pos_ub=-1, add_gt_as_proposals=False),
    allowed_border=-1, pos_weight=-1,
)"""


def test_rpn_style_random_sampler_trains(tmp_path_factory, bop_root):
    """The mmdet RPN recipe — sigmoid-CE AnchorHead + RandomSampler(256,
    0.5) — exercised end-to-end through the config surface: the sampler
    masks are drawn per step inside the jitted loss (anchor_loss.py::
    random_sample_masks) and training still learns."""
    trained = _train(
        tmp_path_factory, bop_root, RPN_STYLE_HEAD, RPN_STYLE_TRAIN_CFG,
        "rpn_style",
    )
    assert int(trained.state.step) == 25
    losses = _logged_losses(trained.records)
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses
