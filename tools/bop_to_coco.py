#!/usr/bin/env python
"""Convert BOP scene ground truth to COCO detector annotations.

Format parity with the reference tool (/root/reference/tools/bop_to_coco.py):
deterministic image/annotation id ranges per scene (scan pass first), one
COCO json with per-annotation ``visib_fract``, category ids = BOP obj ids,
``--amodal`` switches the bbox source key (the reference maps --amodal to
'bbox_visib' and default to 'bbox_obj'; preserved for annotation parity),
``--without-gt`` emits images-only test annotations, and an optional
polygon-segmentation mode.
"""

import argparse
import json
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

CLASS_NAMES_CFG = dict(
    icbin=("coffee_cup", "juice_carton"),
    tudl=("dragon", "frog", "can"),
    lmo=("ape", "benchvise", "bowl", "cam", "can", "cat", "cup", "driller",
         "duck", "eggbox", "glue", "holepuncher", "iron", "lamp", "phone"),
    ycbv=("master_chef_can", "cracker_box", "sugar_box", "tomato_soup_can",
          "mustard_bottle", "tuna_fish_can", "pudding_box", "gelatin_box",
          "potted_meat_can", "banana", "pitcher_base", "bleach_cleanser",
          "bowl", "mug", "power_drill", "wood_block", "scissors",
          "large_marker", "large_clamp", "extra_large_clamp", "foam_brick"),
    hb=tuple(str(i + 1) for i in range(33)),
    itodd=tuple(str(i + 1) for i in range(28)),
    tless=tuple(str(i + 1) for i in range(30)),
)

IMAGE_RESOLUTION_CFG = dict(
    icbin=(640, 480),
    tudl=(640, 480),
    ycbv=(640, 480),
    lmo=(640, 480),
    hb=(640, 480),
    itodd=(1280, 960),
    tless=(720, 540),
)


def parse_args():
    p = argparse.ArgumentParser(description="BOP scene GT -> COCO detector annotations")
    p.add_argument("--images-dir", required=True, help="split dir containing scene subdirs")
    p.add_argument("--images-list", default=None, help="txt of relative image paths to keep (default: all)")
    p.add_argument("--save-path", required=True)
    p.add_argument("--dataset", choices=sorted(CLASS_NAMES_CFG.keys()), required=True)
    p.add_argument("--amodal", action="store_true", help="use bbox_visib instead of bbox_obj (reference-quirk parity)")
    p.add_argument("--segmentation", action="store_true", help="also emit polygon segmentation from mask_visib")
    p.add_argument("--without-gt", action="store_true", help="images-only test annotations")
    return p.parse_args()


def mask_to_polygons(mask):
    import cv2
    import numpy as np

    contours, _ = cv2.findContours(
        mask.astype("uint8"), cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE
    )
    polys = []
    for c in contours:
        c = cv2.approxPolyDP(c, 1.0, True)
        if len(c) >= 3:
            polys.append(np.asarray(c).reshape(-1).astype(float).tolist())
    return polys


def list_scene_dirs(images_dir):
    scenes = sorted(
        d for d in os.listdir(images_dir) if osp.isdir(osp.join(images_dir, d))
    )
    return [osp.join(images_dir, s) for s in scenes]


def convert(args):
    class_names = CLASS_NAMES_CFG[args.dataset]
    img_w, img_h = IMAGE_RESOLUTION_CFG[args.dataset]
    categories = [dict(id=i + 1, name=str(n)) for i, n in enumerate(class_names)]
    bbox_key = "bbox_visib" if args.amodal else "bbox_obj"

    keep_paths = None
    if args.images_list:
        with open(args.images_list) as f:
            keep_paths = set(f.read().split())

    if args.without_gt:
        assert keep_paths is not None, "--without-gt requires --images-list"
        images = [
            dict(file_name=p, id=i, width=img_w, height=img_h)
            for i, p in enumerate(sorted(keep_paths))
        ]
        out = dict(images=images, categories=categories)
        _save(out, args.save_path)
        return

    images, annotations = [], []
    image_id, ann_id = 0, 0
    for scene_dir in list_scene_dirs(args.images_dir):
        with open(osp.join(scene_dir, "scene_gt.json")) as f:
            scene_gt = json.load(f)
        with open(osp.join(scene_dir, "scene_gt_info.json")) as f:
            scene_gt_info = json.load(f)
        scene_rel = osp.basename(scene_dir.rstrip("/"))
        for frame_key in scene_gt_info.keys():
            image_id += 1
            fname = frame_key.zfill(6)
            rel_path = None
            for ext in ("jpg", "png"):
                if osp.exists(osp.join(scene_dir, "rgb", f"{fname}.{ext}")):
                    rel_path = f"{scene_rel}/rgb/{fname}.{ext}"
                    break
            if rel_path is None:
                raise FileNotFoundError(f"no rgb image for frame {frame_key} in {scene_dir}")
            if keep_paths is not None and rel_path not in keep_paths:
                # ids must stay deterministic: advance ann ids even if skipped
                ann_id += len(scene_gt_info[frame_key])
                continue
            anns_this = []
            for obj_i, (info, gt) in enumerate(
                zip(scene_gt_info[frame_key], scene_gt[frame_key])
            ):
                ann_id += 1
                bbox = [float(v) for v in info[bbox_key]]
                ann = dict(
                    id=ann_id,
                    image_id=image_id,
                    category_id=int(gt["obj_id"]),
                    visib_fract=float(info.get("visib_fract", 1.0)),
                    bbox=bbox,
                    area=float(bbox[2] * bbox[3]),
                    iscrowd=0,
                )
                if args.segmentation:
                    import cv2

                    mpath = osp.join(
                        scene_dir, "mask_visib", f"{fname}_{obj_i:06d}.png"
                    )
                    mask = cv2.imread(mpath, cv2.IMREAD_GRAYSCALE)
                    polys = mask_to_polygons((mask > 0)) if mask is not None else []
                    if not polys:
                        continue
                    ann["segmentation"] = polys
                anns_this.append(ann)
            images.append(dict(file_name=rel_path, id=image_id, width=img_w, height=img_h))
            annotations.extend(anns_this)

    out = dict(images=images, annotations=annotations, categories=categories)
    _save(out, args.save_path)
    print(f"wrote {len(images)} images / {len(annotations)} annotations to {args.save_path}")


def _save(obj, path):
    os.makedirs(osp.dirname(osp.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        json.dump(obj, f)


if __name__ == "__main__":
    convert(parse_args())
