#!/usr/bin/env python
"""Overlay detections from a BOP submission json onto images (parity with
/root/reference/tools/show_bop_detbbox.py)."""

import argparse
import json
import os
import os.path as osp
from collections import defaultdict

import cv2


def main():
    p = argparse.ArgumentParser()
    p.add_argument("results", help="BOP-format detection json")
    p.add_argument("--images-dir", required=True, help="split dir with scene subdirs")
    p.add_argument("--output-dir", default="work_dirs/show_det")
    p.add_argument("--score-thr", type=float, default=0.3)
    p.add_argument("--num", type=int, default=20)
    p.add_argument("--ext", default="png")
    args = p.parse_args()

    with open(args.results) as f:
        dets = json.load(f)
    by_img = defaultdict(list)
    for d in dets:
        if d["score"] >= args.score_thr:
            by_img[(d["scene_id"], d["image_id"])].append(d)

    os.makedirs(args.output_dir, exist_ok=True)
    for n, ((scene, imgid), ds) in enumerate(sorted(by_img.items())):
        if n >= args.num:
            break
        path = None
        for ext in (args.ext, "jpg", "png"):
            cand = osp.join(args.images_dir, f"{scene:06d}", "rgb", f"{imgid:06d}.{ext}")
            if osp.exists(cand):
                path = cand
                break
        if path is None:
            continue
        img = cv2.imread(path)
        for d in ds:
            x, y, w, h = [int(v) for v in d["bbox"]]
            cv2.rectangle(img, (x, y), (x + w, y + h), (0, 200, 255), 2)
            cv2.putText(img, f"{d['category_id']}:{d['score']:.2f}", (x, max(0, y - 4)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 200, 255), 1)
        out = osp.join(args.output_dir, f"{scene:06d}_{imgid:06d}.jpg")
        cv2.imwrite(out, img)
        print(out)


if __name__ == "__main__":
    main()
