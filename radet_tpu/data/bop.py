"""BOP dataset (COCO-format annotations with BOP extensions).

Capability parity with the reference BOPDataset
(/root/reference/radet/datasets/bop.py:14-118) and the CustomDataset/
CocoDataset machinery it inherits (datasets/{custom,coco}.py):

- ``visib_fract``-based ignore filtering via ``min_visib_frac`` (bop.py:67-74);
- per-instance visible-mask path template
  ``{scene:06d}/mask_visib/{img:06d}_{ann_idx:06d}.png`` (bop.py:38,59) where
  ann_idx is the annotation's position within its image's annotation list;
- class-name remapping through ``classes`` (cat2label, coco.py:47-67);
- empty-GT filtering for training + resample-on-degenerate-sample
  (custom.py:174-197 ``_rand_another``);
- BOP submission json writer (``scene_id``/``image_id``/``category_id``/
  xywh bbox/``score``/``time=-1.0``; bop.py:99-118).

Unlike the reference this dataset emits STATIC-SHAPE numpy samples (padded
image, MAX_GT-padded boxes/labels, (N_anchor, MAX_GT) distance values) ready
for device transfer; label assignment runs on device.
"""

from __future__ import annotations

import os.path as osp
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..core.anchors import AnchorConfig, anchor_centers, generate_anchors
from .coco_io import CocoIndex
from .pipeline import Compose, build_pipeline

MASK_PATH_TEMPLATE = "{:06d}/mask_visib/{:06d}_{:06d}.png"
# one instance-id map per image (0=background, ann_idx+1=instance) — BOP
# visible masks are disjoint by construction so the packing is lossless;
# written by tools/pack_masks.py, cuts G PNG decodes/sample to 1
MASK_PACKED_TEMPLATE = "{:06d}/mask_packed/{:06d}.png"


class BOPDataset:
    def __init__(
        self,
        ann_file: str,
        img_prefix: str = "",
        seg_prefix: Optional[str] = None,
        classes: Optional[Sequence[str]] = None,
        pipeline: Optional[Sequence[dict]] = None,
        test_mode: bool = False,
        min_visib_frac: float = 0.0,
        filter_empty_gt: bool = True,
        bop_submission: bool = False,
        input_size: Tuple[int, int] = (480, 640),
        max_gt: int = 32,
        anchor_cfg: Optional[AnchorConfig] = None,
        img_norm: Optional[dict] = None,
        orientation: Optional[str] = None,
    ):
        """``orientation`` ('landscape'/'portrait') keeps only images of that
        orientation — the static-shape recipe for aspect-mixed datasets (the
        reference handles these via GroupSampler aspect grouping,
        datasets/samplers/group_sampler.py:10-48; here each orientation is
        its own dataset view with its own static input_size + compiled
        program, built automatically by apis.test.test_from_config)."""
        self.ann_file = ann_file
        self.img_prefix = img_prefix
        self.seg_prefix = seg_prefix if seg_prefix is not None else img_prefix
        self.test_mode = test_mode
        self.min_visib_frac = min_visib_frac
        self.bop_submission = bop_submission
        self.input_size = tuple(input_size)
        self.max_gt = max_gt

        self.coco = CocoIndex(ann_file)
        self.cat_ids = self.coco.get_cat_ids(classes)
        self.cat2label = {cid: i for i, cid in enumerate(self.cat_ids)}
        self.CLASSES = (
            list(classes)
            if classes is not None
            else [self.coco.cats[c]["name"] for c in self.cat_ids]
        )

        self.img_ids = self.coco.get_img_ids()
        self.data_infos = [self.coco.load_img(i) for i in self.img_ids]
        if orientation is not None:
            assert orientation in ("landscape", "portrait"), orientation
            want_portrait = orientation == "portrait"
            keep = [
                i
                for i, info in enumerate(self.data_infos)
                if (info["height"] > info["width"]) == want_portrait
            ]
            self.img_ids = [self.img_ids[i] for i in keep]
            self.data_infos = [self.data_infos[i] for i in keep]
        if not test_mode and filter_empty_gt:
            keep = [i for i, info in enumerate(self.data_infos) if self._has_valid_gt(info)]
            self.img_ids = [self.img_ids[i] for i in keep]
            self.data_infos = [self.data_infos[i] for i in keep]

        anchor_cfg = anchor_cfg or AnchorConfig()
        anchors, _, _, _ = generate_anchors(self.input_size, anchor_cfg)
        self._anchor_centers = anchor_centers(anchors)
        self.num_anchors = anchors.shape[0]

        if pipeline is not None:
            self.pipeline: Optional[Compose] = build_pipeline(
                pipeline,
                input_size=self.input_size,
                anchor_centers=self._anchor_centers,
                max_gt=max_gt,
                img_norm=img_norm,
            )
        else:
            self.pipeline = None

    # ------------------------------------------------------------------
    def __len__(self) -> int:
        return len(self.img_ids)

    def _has_valid_gt(self, img_info: dict) -> bool:
        for ann in self.coco.get_anns(img_info["id"]):
            if ann.get("ignore", False) or ann["category_id"] not in self.cat2label:
                continue
            # difficult objects become ignore regions (parse_ann_info), so an
            # all-difficult image has no trainable gt (reference
            # xml_style.py:60-79 keeps it, then resamples — skip it up front)
            if ann.get("difficult", 0):
                continue
            if ann.get("visib_fract", 1.0) >= self.min_visib_frac:
                return True
        return False

    def parse_ann_info(self, img_info: dict) -> Dict[str, Any]:
        """Reference-semantics annotation parsing (bop.py:43-97)."""
        anns = self.coco.get_anns(img_info["id"])
        filename = img_info["filename"]
        parts = filename.rsplit("/", 3)
        try:
            # BOP layout: {scene:06d}/rgb/{img:06d}.png; non-BOP datasets
            # (VOC/COCO/LVIS presets, data/datasets_extra.py) have arbitrary
            # paths and no scene structure
            scene_id = int(parts[-3]) if len(parts) >= 3 else 0
            img_id_in_scene = int(osp.splitext(parts[-1])[0])
        except ValueError:
            scene_id, img_id_in_scene = 0, 0

        gt_bboxes, gt_labels, gt_masks, gt_bboxes_ignore = [], [], [], []
        gt_labels_ignore, gt_polys, gt_masks_idx = [], [], []
        for i, ann in enumerate(anns):
            if ann.get("ignore", False):
                continue
            x1, y1, w, h = ann["bbox"]
            inter_w = max(0, min(x1 + w, img_info["width"]) - max(x1, 0))
            inter_h = max(0, min(y1 + h, img_info["height"]) - max(y1, 0))
            if inter_w * inter_h == 0:
                continue
            if ann.get("area", w * h) <= 0 or w < 1 or h < 1:
                continue
            if ann["category_id"] not in self.cat2label:
                continue
            bbox = [x1, y1, x1 + w, y1 + h]
            # 'difficult' objects (VOC XML datasets, reference
            # xml_style.py:117-124) are ignore regions like below-visib-fract
            # BOP instances
            if (
                ann.get("visib_fract", 1.0) < self.min_visib_frac
                or ann.get("difficult", 0)
            ):
                gt_bboxes_ignore.append(bbox)
                gt_labels_ignore.append(self.cat2label[ann["category_id"]])
            else:
                gt_bboxes.append(bbox)
                gt_labels.append(self.cat2label[ann["category_id"]])
                gt_masks.append(MASK_PATH_TEMPLATE.format(scene_id, img_id_in_scene, i))
                gt_masks_idx.append(i)
                gt_polys.append(ann.get("segmentation"))

        return dict(
            bboxes=np.asarray(gt_bboxes, np.float32).reshape(-1, 4),
            labels=np.asarray(gt_labels, np.int64),
            bboxes_ignore=np.asarray(gt_bboxes_ignore, np.float32).reshape(-1, 4),
            labels_ignore=np.asarray(gt_labels_ignore, np.int64),
            masks=gt_masks,
            # packed alternative (tools/pack_masks.py): ONE instance-id map
            # per image; per-GT original ann index selects the id channel
            masks_idx=gt_masks_idx,
            mask_packed=MASK_PACKED_TEMPLATE.format(scene_id, img_id_in_scene),
            segmentations=gt_polys if any(p is not None for p in gt_polys) else None,
            scene_id=scene_id,
            img_id_in_scene=img_id_in_scene,
        )

    # ------------------------------------------------------------------
    def _base_results(self, idx: int) -> Dict[str, Any]:
        img_info = self.data_infos[idx]
        return dict(
            img_info=img_info,
            ann_info=self.parse_ann_info(img_info),
            img_prefix=self.img_prefix,
            seg_prefix=self.seg_prefix,
        )

    def prepare_sample(self, idx: int) -> Optional[Dict[str, Any]]:
        results = self.pipeline(self._base_results(idx))
        if results is None:
            return None
        img = results["img"]
        h, w = results["img_shape"]
        sample = dict(
            image=np.ascontiguousarray(img),
            img_shape=np.asarray([h, w], np.float32),
            scale_factor=results["scale_factor"].astype(np.float32),
            img_id=np.int64(self.img_ids[idx]),
        )
        if self.test_mode:
            return sample

        boxes = results.get("gt_bboxes", np.zeros((0, 4), np.float32))
        labels = results.get("gt_labels", np.zeros((0,), np.int64))
        g = min(len(boxes), self.max_gt)
        if g == 0:
            return None
        gt_boxes = np.zeros((self.max_gt, 4), np.float32)
        gt_labels = np.zeros((self.max_gt,), np.int32)
        gt_valid = np.zeros((self.max_gt,), bool)
        gt_boxes[:g] = boxes[:g]
        gt_labels[:g] = labels[:g]
        gt_valid[:g] = True
        sample.update(
            gt_boxes=gt_boxes,
            gt_labels=gt_labels,
            gt_valid=gt_valid,
        )
        # the RADet path needs per-anchor distance values; generic anchor-head
        # pipelines (ATSSHead/AnchorHead configs) carry no GenerateDistanceMap
        # and assign on IoU alone inside the train step
        if "dist_vals" in results:
            sample["dist_vals"] = results["dist_vals"]
        return sample

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        if self.test_mode:
            out = self.prepare_sample(idx)
            assert out is not None
            return out
        # training: resample on degenerate output (custom.py:174-197)
        rng = np.random.RandomState(idx)
        for _ in range(50):
            out = self.prepare_sample(idx)
            if out is not None:
                return out
            idx = int(rng.randint(0, len(self)))
        raise RuntimeError("could not draw a valid training sample in 50 tries")

    # ------------------------------------------------------------------
    # Result formatting (reference bop.py:99-118, coco.py:271-334)
    # ------------------------------------------------------------------
    def det2json(self, detections: List[dict]) -> List[dict]:
        """COCO-style results. ``detections``: per-image dict with keys
        boxes (M,4 xyxy), scores (M,), labels (M,), img_id."""
        out = []
        for det in detections:
            img_id = int(det["img_id"])
            for box, score, label in zip(det["boxes"], det["scores"], det["labels"]):
                x1, y1, x2, y2 = [float(v) for v in box]
                out.append(
                    dict(
                        image_id=img_id,
                        bbox=[x1, y1, x2 - x1, y2 - y1],
                        score=float(score),
                        category_id=self.cat_ids[int(label)],
                    )
                )
        return out

    def bop_det2json(self, detections: List[dict]) -> List[dict]:
        """BOP challenge submission format (bop.py:99-118)."""
        out = []
        id_to_info = {info["id"]: info for info in self.data_infos}
        for det in detections:
            info = id_to_info[int(det["img_id"])]
            parts = info["filename"].rsplit("/", 3)
            scene_id = int(parts[-3])
            image_id = int(osp.splitext(parts[-1])[0])
            for box, score, label in zip(det["boxes"], det["scores"], det["labels"]):
                x1, y1, x2, y2 = [float(v) for v in box]
                out.append(
                    dict(
                        scene_id=scene_id,
                        image_id=image_id,
                        category_id=self.cat_ids[int(label)],
                        bbox=[x1, y1, x2 - x1, y2 - y1],
                        score=float(score),
                        time=-1.0,
                    )
                )
        return out
