#!/usr/bin/env python
"""Extract the test image list from a BOP test_targets/test json (parity with
/root/reference/tools/collect_bop_imagelist.py)."""

import argparse
import json


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--targets-json", required=True, help="test_targets_bop19.json or COCO test json")
    p.add_argument("--save-path", required=True)
    p.add_argument("--ext", default="png")
    args = p.parse_args()

    with open(args.targets_json) as f:
        data = json.load(f)
    entries = set()
    if isinstance(data, dict) and "images" in data:
        for img in data["images"]:
            entries.add(img.get("file_name") or img.get("filename"))
    else:
        for t in data:
            entries.add(f"{t['scene_id']:06d}/rgb/{t['im_id']:06d}.{args.ext}")
    with open(args.save_path, "w") as f:
        f.write("\n".join(sorted(entries)) + "\n")
    print(f"wrote {len(entries)} paths to {args.save_path}")


if __name__ == "__main__":
    main()
