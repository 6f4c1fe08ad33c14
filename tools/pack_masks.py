"""Pack BOP per-instance visible-mask PNGs into one instance-id map per image.

BOP ships one ``mask_visib/{img:06d}_{ann:06d}.png`` per instance
(reference radet/datasets/bop.py:38,59 reads them one by one); decoding G
PNGs per sample is the single largest host-pipeline cost (44% measured,
tools/profile_pipeline.py).  Visible masks are DISJOINT by construction —
each pixel is visible for at most one object — so they pack losslessly into
a single ``mask_packed/{img:06d}.png`` id map (0 = background,
ann_idx + 1 = instance).  `LoadAnnotations` (data/pipeline.py) prefers the
packed map automatically when it exists; per-instance files remain the
fallback, so packing is a pure opt-in speedup.

Usage:
    python tools/pack_masks.py DATA_ROOT [DATA_ROOT ...]

where each DATA_ROOT is a split directory containing ``{scene:06d}/mask_visib``
(e.g. ``$BOP/ycbv/train_pbr``).  Exits nonzero if any scene's masks overlap
(which would make the packing lossy — never the case for real BOP data).
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import re
import sys
from collections import defaultdict

import cv2
import numpy as np

_MASK_RE = re.compile(r"^(\d{6})_(\d{6})\.png$")


def pack_image(mask_paths_by_idx: dict, out_path: str) -> int:
    """Pack {ann_idx: path} binary masks into one id map; returns the number
    of overlapping pixels encountered (0 for valid BOP data; on overlap the
    higher ann_idx wins, matching last-writer order)."""
    ids = sorted(mask_paths_by_idx)
    first = cv2.imread(mask_paths_by_idx[ids[0]], cv2.IMREAD_GRAYSCALE)
    if first is None:
        raise FileNotFoundError(mask_paths_by_idx[ids[0]])
    dtype = np.uint16 if ids[-1] + 1 > 255 else np.uint8
    packed = np.zeros(first.shape, dtype)
    overlap = 0
    for idx in ids:
        m = cv2.imread(mask_paths_by_idx[idx], cv2.IMREAD_GRAYSCALE)
        if m is None:
            raise FileNotFoundError(mask_paths_by_idx[idx])
        fg = m > 0
        overlap += int(np.count_nonzero(packed[fg]))
        packed[fg] = idx + 1
    os.makedirs(osp.dirname(out_path), exist_ok=True)
    if not cv2.imwrite(out_path, packed):
        raise IOError(f"failed to write {out_path}")
    return overlap


def pack_split(root: str, verbose: bool = True) -> int:
    """Pack every scene under a split root; returns total overlapping pixels."""
    total_overlap = 0
    n_images = 0
    for scene in sorted(os.listdir(root)):
        visib_dir = osp.join(root, scene, "mask_visib")
        if not osp.isdir(visib_dir):
            continue
        by_img = defaultdict(dict)
        for fn in os.listdir(visib_dir):
            m = _MASK_RE.match(fn)
            if m:
                by_img[int(m.group(1))][int(m.group(2))] = osp.join(visib_dir, fn)
        for img_id, paths in sorted(by_img.items()):
            out = osp.join(root, scene, "mask_packed", f"{img_id:06d}.png")
            total_overlap += pack_image(paths, out)
            n_images += 1
        if verbose:
            print(f"{root}/{scene}: packed {len(by_img)} images")
    if verbose:
        print(f"{root}: {n_images} images packed, {total_overlap} overlapping px")
    return total_overlap


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("roots", nargs="+", help="split dirs containing {scene:06d}/mask_visib")
    args = ap.parse_args(argv)
    overlap = 0
    for root in args.roots:
        overlap += pack_split(root)
    if overlap:
        print(
            f"ERROR: {overlap} overlapping mask pixels — visib masks are not "
            "disjoint; packed maps are lossy for these images", file=sys.stderr,
        )
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
