#!/usr/bin/env python
"""Visualize training-pipeline output (parity with
/root/reference/tools/browse_dataset.py): renders images after augmentation
with GT boxes, and optionally the per-GT distance values sampled at anchor
centers (the assignment input) as an overlay heat-dot map."""

import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import cv2
import numpy as np

from radet_tpu.apis.common import build_dataset
from radet_tpu.core import anchor_centers, generate_anchors
from radet_tpu.utils import Config


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--split", default="train")
    p.add_argument("--output-dir", default="work_dirs/browse")
    p.add_argument("--num", type=int, default=10)
    p.add_argument("--show-dist", action="store_true", help="overlay distance values at anchor centers")
    p.add_argument(
        "--show-assignment",
        action="store_true",
        help="run the on-device label assignment and paint the sampled "
        "positive cells per GT (the reference label_assignment.py debug() "
        "harness, :537-572); dot radius scales with the sample weight",
    )
    p.add_argument("--cfg-options", nargs="+", default=None)
    args = p.parse_args()

    cfg = Config.fromfile(args.config, args.cfg_options)
    dataset = build_dataset(cfg, args.split, test_mode=(args.split != "train"))
    os.makedirs(args.output_dir, exist_ok=True)
    # use the SAME anchor configuration the dataset pipeline was built with
    # (anchor_generator overrides + label_assignment regress_ranges) — the
    # default generator would mismatch dist_vals row counts for custom configs
    from radet_tpu.apis.common import anchor_cfg_from_model

    la = cfg.get("label_assignment")
    anchor_cfg = anchor_cfg_from_model(
        cfg.model.to_dict(), la.to_dict() if la is not None else None
    )
    anchors, ranges, _, _ = generate_anchors(
        tuple(cfg.get("input_size", (480, 640))), anchor_cfg
    )
    centers = anchor_centers(anchors)

    _GT_COLORS = [
        (255, 64, 64), (64, 255, 64), (64, 64, 255), (255, 255, 64),
        (255, 64, 255), (64, 255, 255), (255, 160, 64), (160, 64, 255),
    ]

    for i in range(min(args.num, len(dataset))):
        s = dataset[i]
        img = cv2.cvtColor(s["image"], cv2.COLOR_RGB2BGR).copy()
        if "gt_boxes" in s:
            for box, label, valid in zip(s["gt_boxes"], s["gt_labels"], s["gt_valid"]):
                if not valid:
                    continue
                x1, y1, x2, y2 = [int(v) for v in box]
                cv2.rectangle(img, (x1, y1), (x2, y2), (0, 255, 0), 2)
                cv2.putText(img, str(int(label)), (x1, max(0, y1 - 4)),
                            cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 255, 0), 1)
            if args.show_dist and "dist_vals" in s:
                v = s["dist_vals"].max(axis=1)  # max over GTs per anchor
                for (cx, cy), val in zip(centers, v):
                    if val > 0:
                        c = int(255 * min(1.0, val))
                        cv2.circle(img, (int(cx), int(cy)), 1, (0, 0, c), -1)
            if args.show_assignment and "dist_vals" in s:
                import jax

                from radet_tpu.core.assignment import assign_labels

                la = cfg.get("label_assignment")
                la = la.to_dict() if hasattr(la, "to_dict") else dict(la or {})
                kw = {
                    k: la[k]
                    for k in (
                        "positive_num", "neg_threshold", "balance_sample",
                        "adapt_positive_num", "random_sample_by_distance",
                        "multiply_samplepro_for_weight", "ambiguous_sample",
                    )
                    if k in la
                }
                res = assign_labels(
                    jax.random.PRNGKey(i), anchors, ranges,
                    s["gt_boxes"], s["gt_valid"],
                    s["dist_vals"].astype(np.float32), **kw,
                )
                gt_idx = np.asarray(res.gt_idx)
                weight = np.asarray(res.weight)
                for (cx, cy), g, w in zip(centers, gt_idx, weight):
                    if g >= 0:
                        color = _GT_COLORS[int(g) % len(_GT_COLORS)]
                        cv2.circle(img, (int(cx), int(cy)),
                                   max(1, int(round(w))), color, -1)
                n_pos = int((gt_idx >= 0).sum())
                n_ign = int((gt_idx == -2).sum())
                cv2.putText(img, f"pos {n_pos} ign {n_ign}", (4, 14),
                            cv2.FONT_HERSHEY_SIMPLEX, 0.45, (255, 255, 255), 1)
        out = osp.join(args.output_dir, f"sample_{i:04d}.jpg")
        cv2.imwrite(out, img)
        print(out)


if __name__ == "__main__":
    main()
