#!/usr/bin/env python
"""Closed-loop learning validation on a synthetic BOP dataset.

Trains a small detector from scratch on generated scenes (solid colored
rectangles) and evaluates COCO mAP through the full inference path — the
framework-level 'does training actually produce a working detector' check
that the reference relies on real BOP data + EvalHook for (SURVEY.md §4).

Usage: python tools/validate_learning.py [--iters 400] [--depth 18]
Exits nonzero if final mAP50 < --min-map50 (default 0.5).
"""

import argparse
import os
import os.path as osp
import sys
import tempfile

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "tests"))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=400)
    p.add_argument("--depth", type=int, default=18)
    p.add_argument("--images", type=int, default=16)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--min-map50", type=float, default=0.5)
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument("--img-size", type=int, nargs=2, default=(128, 160), metavar=("H", "W"))
    p.add_argument("--feat", type=int, default=64)
    p.add_argument("--stacked-convs", type=int, default=2)
    p.add_argument("--num-classes", type=int, default=3)
    p.add_argument("--dtype", default="float32")
    p.add_argument("--workers", type=int, default=4)
    p.add_argument(
        "--int8-eval", action="store_true",
        help="after the base eval, re-evaluate the SAME trained weights "
        "through the full-int8 deploy path (backbone+head quant='int8', "
        "ops/quant.py) and report the mAP delta.  This is the "
        "trained-network AP-delta measurement the random-weight parity "
        "fixtures cannot provide: training here fits live BN stats, so the "
        "static frozen-BN activation bounds hold by construction.",
    )
    args = p.parse_args()

    if args.cpu:
        # must be the ENV var: radet_tpu's import hook re-pins the jax
        # config to JAX_PLATFORMS, which would revert a config.update here
        os.environ["JAX_PLATFORMS"] = "cpu"

    from fixtures import make_synthetic_bop

    from radet_tpu.apis.common import build_model_and_anchors, init_variables
    from radet_tpu.apis.test import test_from_config
    from radet_tpu.apis.train import train_detector
    from radet_tpu.utils import Config, get_root_logger

    logger = get_root_logger()
    tmp = tempfile.mkdtemp(prefix="radet_learn_")
    h, w = args.img_size
    make_synthetic_bop(
        tmp, num_scenes=1, images_per_scene=args.images, img_hw=(h, w),
        num_classes=args.num_classes, max_objects=3,
    )
    cfg_dict = dict(
        img_norm_cfg=dict(mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375]),
        model=dict(
            type="RADet",
            backbone=dict(depth=args.depth, out_indices=(0, 1, 2, 3), frozen_stages=-1, norm_eval=False),
            neck=dict(out_channels=args.feat, start_level=1, num_outs=5),
            bbox_head=dict(
                num_classes=args.num_classes, in_channels=args.feat,
                stacked_convs=args.stacked_convs, feat_channels=args.feat,
                anchor_generator=dict(ratios=[1.0], octave_base_scale=8, scales_per_octave=1,
                                      strides=[8, 16, 32, 64, 128]),
                bbox_coder=dict(type="TBLRBBoxCoder", normalizer=1 / 8),
            ),
        ),
        test_cfg=dict(
            nms_pre=1000, score_thr=0.05, max_per_img=20,
            nms=dict(type="vote", iou_threshold=0.65, cluster_score=["cls", "iou"],
                     vote_score=["iou", "cls"], iou_enable=False, sigma=0.025),
        ),
        label_assignment=dict(neg_threshold=0.2, positive_num=10, balance_sample=True, max_gt=8),
        optimizer=dict(type="adamw", lr=args.lr, betas=(0.9, 0.999), weight_decay=0.01, eps=1e-8),
        lr_config=dict(policy="onecycle", max_lr=args.lr, total_steps=args.iters + 10, pct_start=0.1),
        runner=dict(max_iters=args.iters),
        checkpoint_config=dict(interval=100000, max_to_keep=1),
        evaluation=dict(interval=0),
        grad_clip=dict(max_norm=35.0),
        log_config=dict(interval=50),
        seed=0,
        compute_dtype=args.dtype,
        input_size=(h, w),
        data=dict(
            samples_per_gpu=args.batch,
            workers_per_gpu=args.workers,
            train=dict(
                ann_file=osp.join(tmp, "detector_annotations/train_pbr.json"),
                img_prefix=osp.join(tmp, "train_pbr/"),
                pipeline=[
                    dict(type="LoadImageFromFile"),
                    dict(type="LoadAnnotations", with_bbox=True, with_bop_mask=True),
                    dict(type="Resize", img_scale=(w, h), keep_ratio=True),
                    dict(type="RandomFlip", flip_ratio=0.5),
                    dict(type="GenerateDistanceMap"),
                    dict(type="SampleDistanceAtAnchors"),
                    dict(type="Pad", size_divisor=16),
                ],
            ),
            test=dict(
                ann_file=osp.join(tmp, "detector_annotations/train_pbr.json"),
                img_prefix=osp.join(tmp, "train_pbr/"),
                pipeline=[
                    dict(type="LoadImageFromFile"),
                    dict(type="Resize", img_scale=(w, h), keep_ratio=True),
                    dict(type="Pad", size_divisor=32),
                ],
            ),
        ),
    )
    cfg = Config(cfg_dict)
    state = train_detector(cfg, work_dir=osp.join(tmp, "work"), eval_during_train=False)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    import jax

    variables = jax.device_get(variables)
    dataset, results, metrics = test_from_config(cfg, variables, split="test", batch_size=args.batch)
    logger.info("final metrics: " + " ".join(f"{k}={v:.3f}" for k, v in metrics.items()))
    map50 = metrics["bbox_mAP_50"]
    print(f"RESULT mAP50={map50:.3f} mAP={metrics['bbox_mAP']:.3f}")
    if args.int8_eval:
        import copy

        for tag, trunk in (
            ("int8-head", None),
            ("int8-conv2", "int8_conv2"),
            ("int8-full", "int8"),
        ):
            cfg_q = Config(copy.deepcopy(cfg_dict))
            cfg_q.model["bbox_head"]["quant"] = "int8"
            if trunk:
                cfg_q.model["backbone"]["quant"] = trunk
            _, _, metrics_q = test_from_config(
                cfg_q, variables, split="test", batch_size=args.batch
            )
            print(
                f"RESULT {tag} mAP50={metrics_q['bbox_mAP_50']:.3f} "
                f"mAP={metrics_q['bbox_mAP']:.3f} "
                f"(delta mAP50 {metrics_q['bbox_mAP_50'] - map50:+.3f}, "
                f"mAP {metrics_q['bbox_mAP'] - metrics['bbox_mAP']:+.3f})"
            )
    if map50 < args.min_map50:
        print(f"FAIL: mAP50 {map50:.3f} < {args.min_map50}")
        sys.exit(1)
    print("PASS")


if __name__ == "__main__":
    main()
