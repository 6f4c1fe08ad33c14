#!/usr/bin/env python
"""Test a detector: batched inference + COCO eval / result export.

CLI parity with the reference tools/test.py (--config, checkpoint, --out,
--format-only, --eval bbox, --cfg-options;
/root/reference/tools/test.py:22-100). Results export:
  --out results.pkl      pickled per-image results
  --format-only --json-prefix p   writes p.bbox.json (COCO) and, when the
                                  dataset has bop_submission=True, p.bop.json
                                  (BOP challenge format, bop.py:99-118).
"""

import argparse
import json
import os.path as osp
import pickle
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from radet_tpu.apis.test import evaluate_results, test_from_config
from radet_tpu.engine.checkpoint import load_weights
from radet_tpu.apis.common import build_model_and_anchors, init_variables
from radet_tpu.utils import Config, get_root_logger
from radet_tpu.utils.config import parse_kv_options


def parse_args():
    p = argparse.ArgumentParser(description="Test a RADet-TPU detector")
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None, help="weights checkpoint (orbax)")
    p.add_argument("--out", help="output results pickle")
    p.add_argument("--format-only", action="store_true")
    p.add_argument("--json-prefix", default=None)
    p.add_argument("--eval", nargs="+", default=None, help="metrics, e.g. bbox")
    p.add_argument("--split", default="test", choices=["test", "val"])
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--show-dir", default=None,
                   help="draw detections onto images and save here (reference --show-dir)")
    p.add_argument("--show-score-thr", type=float, default=0.3)
    p.add_argument(
        "--fast",
        action="store_true",
        help="use the fast deploy candidate path (global approximate top-k) "
        "instead of the default strict reference semantics (per-level exact "
        "top-k) — see apis/test.strict_eval_overrides",
    )
    p.add_argument("--cfg-options", nargs="+", default=None)
    p.add_argument(
        "--eval-options",
        "--options",  # deprecated reference alias
        nargs="+",
        default=None,
        help="kwargs for evaluation as key=value, e.g. classwise=True",
    )
    p.add_argument(
        "--fuse-conv-bn",
        action="store_true",
        help="fold frozen BNs into conv weights before inference "
        "(exact — norm_eval BNs are constant affines; models/fuse.py)",
    )
    # reference-CLI compatibility no-ops (GPU/launcher mechanics that have no
    # TPU equivalent — result collection and distributed init are automatic):
    for flag in ("--gpu-collect", "--shuffle"):
        p.add_argument(flag, action="store_true", help=argparse.SUPPRESS)
    p.add_argument("--tmpdir", default=None, help=argparse.SUPPRESS)
    p.add_argument("--launcher", default="none", help=argparse.SUPPRESS)
    p.add_argument("--local_rank", type=int, default=0, help=argparse.SUPPRESS)
    p.add_argument(
        "--show", action="store_true",
        help="alias for --show-dir work_dir/shown (no GUI on TPU hosts)",
    )
    return p.parse_args()


def main():
    args = parse_args()
    cfg = Config.fromfile(args.config, args.cfg_options)
    logger = get_root_logger()
    eval_options = parse_kv_options(args.eval_options)
    if args.show and not args.show_dir:
        args.show_dir = osp.join(cfg.get("work_dir", "work_dirs"), "shown")
        logger.info(f"--show: rendering to {args.show_dir} (headless TPU host)")
    model, _, _, _ = build_model_and_anchors(cfg)
    variables = init_variables(model, tuple(cfg.get("input_size", (480, 640))))
    if args.checkpoint:
        variables = load_weights(args.checkpoint, template=variables)
        logger.info(f"loaded checkpoint {args.checkpoint}")
    else:
        logger.warning("no checkpoint given — using random weights")
    if args.fuse_conv_bn:
        mc = cfg.get("model", {})
        assert not mc.get("backbone", {}).get("quant"), (
            "--fuse-conv-bn is incompatible with backbone.quant='int8': the "
            "int8 trunk derives static activation scales from the frozen BN "
            "affine params, which folding erases (resnet._bn_act_scale)"
        )
        from radet_tpu.models.fuse import fuse_conv_bn

        variables, report = fuse_conv_bn(variables)
        logger.info(
            f"--fuse-conv-bn: folded {report['fused']} frozen BNs into conv "
            f"weights ({report['skipped']} left in place: "
            f"{report['skipped_paths'] or 'none'})"
        )

    dataset, results, metrics = test_from_config(
        cfg,
        variables,
        split=args.split,
        batch_size=args.batch_size,
        # evaluate only when --eval was requested (a bare --out/--format-only
        # run previously paid a full discarded COCO evaluation)
        fmt_only=args.eval is None,
        strict=not args.fast,
        eval_options=eval_options,
    )

    if args.out:
        with open(args.out, "wb") as f:
            pickle.dump(results, f)
        logger.info(f"results written to {args.out}")

    if args.format_only or args.json_prefix:
        prefix = args.json_prefix or (osp.splitext(args.out)[0] if args.out else "results")
        with open(prefix + ".bbox.json", "w") as f:
            json.dump(dataset.det2json(results), f)
        logger.info(f"COCO results: {prefix}.bbox.json")
        if dataset.bop_submission:
            with open(prefix + ".bop.json", "w") as f:
                json.dump(dataset.bop_det2json(results), f)
            logger.info(f"BOP submission: {prefix}.bop.json")

    if args.show_dir:
        import os

        from radet_tpu.data.pipeline import imread_rgb
        from radet_tpu.utils.visualization import imshow_det_bboxes

        os.makedirs(args.show_dir, exist_ok=True)
        id_to_info = {info["id"]: info for info in dataset.data_infos}
        for r in results:
            info = id_to_info[r["img_id"]]
            img = imread_rgb(osp.join(dataset.img_prefix, info["filename"]))
            out_file = osp.join(
                args.show_dir, info["filename"].replace("/", "_")
            )
            imshow_det_bboxes(
                img, r["boxes"], r["labels"], r["scores"],
                class_names=dataset.CLASSES, score_thr=args.show_score_thr,
                out_file=out_file,
            )
        logger.info(f"rendered {len(results)} images to {args.show_dir}")

    if args.eval:
        if metrics is None:
            metrics = evaluate_results(
                dataset, results,
                classwise=bool(eval_options.get("classwise", False)),
            )
        for k, v in metrics.items():
            logger.info(f"{k}: {v:.4f}")
        print(json.dumps(metrics, indent=2))


if __name__ == "__main__":
    main()
