#!/usr/bin/env python
"""Convert detection-result json back into per-scene BOP scene_gt_info files
(capability parity with /root/reference/tools/coco_to_bop.py)."""

import argparse
import json
import os
import os.path as osp
from collections import defaultdict


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("results", help="BOP-format detection json (scene_id/image_id entries)")
    p.add_argument("--save-dir", required=True)
    p.add_argument("--score-thr", type=float, default=0.0)
    return p.parse_args()


def main():
    args = parse_args()
    with open(args.results) as f:
        dets = json.load(f)
    by_scene = defaultdict(lambda: defaultdict(list))
    for d in dets:
        if d["score"] < args.score_thr:
            continue
        by_scene[int(d["scene_id"])][str(int(d["image_id"]))].append(
            dict(
                obj_id=int(d["category_id"]),
                # reference key (coco_to_bop.py:32): the scene_gt_info schema
                # bop_to_coco reads back expects bbox_obj
                bbox_obj=[float(v) for v in d["bbox"]],
                score=float(d["score"]),
            )
        )
    for scene_id, frames in by_scene.items():
        scene_dir = osp.join(args.save_dir, f"{scene_id:06d}")
        os.makedirs(scene_dir, exist_ok=True)
        with open(osp.join(scene_dir, "scene_gt_info.json"), "w") as f:
            json.dump(frames, f)
    print(f"wrote {len(by_scene)} scenes to {args.save_dir}")


if __name__ == "__main__":
    main()
