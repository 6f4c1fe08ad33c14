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
        "--qat", action="store_true",
        help="after the base eval, measure the QAT recovery loop end-to-end: "
        "(a) PTQ-eval the float weights through the int8 deploy path (the "
        "accuracy cost QAT is meant to recover), (b) fine-tune the SAME "
        "weights with STE fake-quant at the deploy scales "
        "(configs/bop/r50_ycbv_pbr_int8_qat.py recipe: frozen BN stats, "
        "lr/10), (c) eval the fine-tuned weights through the SAME int8 "
        "deploy path, and report how much of the PTQ delta QAT recovered.",
    )
    p.add_argument("--qat-iters", type=int, default=200,
                   help="QAT fine-tune steps (default 200)")
    p.add_argument(
        "--qat-quant", default="auto",
        help="backbone quant level for the QAT loop: int8_stream | int8 | "
        "int8_conv2 | auto (int8_stream for bottleneck depths, int8 for "
        "BasicBlock depths, matching the wiring in models/resnet.py)",
    )
    p.add_argument(
        "--frozen-int8", action="store_true",
        help="A/B-measure frozen-stage int8 TRAINING "
        "(configs/bop/r50_ycbv_pbr_frozen_int8.py; models/resnet.py::"
        "ResNet.frozen_int8): fine-tune the converged float weights twice "
        "with stem+layer1 frozen — once plain float, once with "
        "frozen_int8=True — and report the mAP delta between the two "
        "runs.  Fine-tuning from the base weights (fitted BN stats) "
        "mirrors real usage: the static int8 scales read running stats, "
        "which a from-scratch norm_eval run never fits.",
    )
    p.add_argument("--frozen-int8-iters", type=int, default=200,
                   help="frozen-int8 A/B fine-tune steps (default 200)")
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
    if args.qat:
        import copy

        import jax as _jax

        from radet_tpu.engine.checkpoint import save_weights

        trunk_q = args.qat_quant
        if trunk_q == "auto":
            trunk_q = "int8_stream" if args.depth >= 50 else "int8"

        def deploy_cfg():
            c = copy.deepcopy(cfg_dict)
            c["model"]["backbone"]["quant"] = trunk_q
            c["model"]["bbox_head"]["quant"] = "int8"
            return c

        # (a) PTQ baseline: float weights straight through the deploy path
        _, _, m_ptq = test_from_config(
            Config(deploy_cfg()), variables, split="test", batch_size=args.batch
        )
        print(
            f"RESULT ptq[{trunk_q}] mAP50={m_ptq['bbox_mAP_50']:.3f} "
            f"mAP={m_ptq['bbox_mAP']:.3f} "
            f"(delta vs float: mAP50 {m_ptq['bbox_mAP_50'] - map50:+.3f}, "
            f"mAP {m_ptq['bbox_mAP'] - metrics['bbox_mAP']:+.3f})"
        )

        # (b) QAT fine-tune FROM the float weights: STE fake-quant at the
        # deploy scales, frozen BN stats (the scales read them), lr/10 —
        # the r50_ycbv_pbr_int8_qat.py recipe on the synthetic fixture
        float_dir = osp.join(tmp, "float_weights")
        save_weights(float_dir, variables)
        cfg_q = deploy_cfg()
        cfg_q["model"]["backbone"]["qat"] = True
        cfg_q["model"]["backbone"]["norm_eval"] = True
        cfg_q["model"]["bbox_head"]["qat"] = True
        cfg_q["load_from"] = float_dir
        cfg_q["optimizer"]["lr"] = args.lr / 10
        cfg_q["lr_config"] = dict(
            policy="onecycle", max_lr=args.lr / 10,
            total_steps=args.qat_iters + 10, pct_start=0.1,
        )
        cfg_q["runner"] = dict(max_iters=args.qat_iters)
        state_q = train_detector(
            Config(cfg_q), work_dir=osp.join(tmp, "work_qat"),
            eval_during_train=False,
        )
        vars_q = _jax.device_get(
            {"params": state_q.params, "batch_stats": state_q.batch_stats}
        )

        # (c) deploy-eval the fine-tuned weights through the SAME int8 path
        _, _, m_qat = test_from_config(
            Config(deploy_cfg()), vars_q, split="test", batch_size=args.batch
        )
        d_ptq = m_qat["bbox_mAP"] - m_ptq["bbox_mAP"]
        gap = metrics["bbox_mAP"] - m_ptq["bbox_mAP"]
        rec = d_ptq / gap if abs(gap) > 1e-9 else float("nan")
        print(
            f"RESULT qat[{trunk_q}] mAP50={m_qat['bbox_mAP_50']:.3f} "
            f"mAP={m_qat['bbox_mAP']:.3f} "
            f"(vs ptq: mAP {d_ptq:+.3f}; recovered {rec:.0%} of the "
            f"{-gap:+.3f} PTQ gap after {args.qat_iters} steps)"
        )

    if args.frozen_int8:
        import copy

        import jax as _jax

        from radet_tpu.engine.checkpoint import save_weights

        assert args.depth >= 50, (
            "--frozen-int8 reuses the int8_stream Bottleneck path: "
            "run with --depth 50"
        )
        float_dir = osp.join(tmp, "float_weights_fi8")
        save_weights(float_dir, variables)

        def ab_cfg(fi8):
            c = copy.deepcopy(cfg_dict)
            c["model"]["backbone"]["frozen_stages"] = 1
            c["model"]["backbone"]["norm_eval"] = True
            if fi8:
                c["model"]["backbone"]["frozen_int8"] = True
            c["load_from"] = float_dir
            c["lr_config"] = dict(
                policy="onecycle", max_lr=args.lr,
                total_steps=args.frozen_int8_iters + 10, pct_start=0.1,
            )
            c["runner"] = dict(max_iters=args.frozen_int8_iters)
            return c

        ab = {}
        for tag, fi8 in (("frozen-float", False), ("frozen-int8", True)):
            st = train_detector(
                Config(ab_cfg(fi8)), work_dir=osp.join(tmp, f"work_{tag}"),
                eval_during_train=False,
            )
            v = _jax.device_get(
                {"params": st.params, "batch_stats": st.batch_stats}
            )
            # eval is the plain float path for BOTH arms (frozen_int8 is
            # train-only; the deployed model is identical)
            _, _, m = test_from_config(
                Config(ab_cfg(False)), v, split="test", batch_size=args.batch
            )
            ab[tag] = m
            print(
                f"RESULT {tag} mAP50={m['bbox_mAP_50']:.3f} "
                f"mAP={m['bbox_mAP']:.3f}"
            )
        d50 = ab["frozen-int8"]["bbox_mAP_50"] - ab["frozen-float"]["bbox_mAP_50"]
        d = ab["frozen-int8"]["bbox_mAP"] - ab["frozen-float"]["bbox_mAP"]
        print(
            f"RESULT frozen-int8-delta mAP50={d50:+.3f} mAP={d:+.3f} "
            f"(frozen_int8 training vs the identical frozen-float recipe, "
            f"{args.frozen_int8_iters} fine-tune steps each)"
        )

    if map50 < args.min_map50:
        print(f"FAIL: mAP50 {map50:.3f} < {args.min_map50}")
        sys.exit(1)
    print("PASS")


if __name__ == "__main__":
    main()
