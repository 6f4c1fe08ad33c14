#!/usr/bin/env python
"""Glob scene rgb images into a list txt (parity with
/root/reference/tools/collect_image_list.py)."""

import argparse
import glob
import os.path as osp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--images-dir", required=True)
    p.add_argument("--save-path", required=True)
    p.add_argument("--ext", default="jpg,png")
    args = p.parse_args()

    paths = []
    for ext in args.ext.split(","):
        paths += glob.glob(osp.join(args.images_dir, "*", "rgb", f"*.{ext}"))
    rel = sorted(osp.relpath(pth, args.images_dir) for pth in paths)
    with open(args.save_path, "w") as f:
        f.write("\n".join(rel) + "\n")
    print(f"wrote {len(rel)} paths to {args.save_path}")


if __name__ == "__main__":
    main()
