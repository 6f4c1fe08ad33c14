"""Shared assembly helpers for the train/test/inference APIs."""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.anchors import AnchorConfig, generate_anchors
from ..data.bop import BOPDataset
from ..models.builder import build_detector


def assignment_cfg_from(cfg) -> Dict | None:
    """Label-assignment params: ``cfg.label_assignment`` when present, else
    the params of a verbatim reference in-pipeline ``LabelAssignment`` entry
    (configs/base/datasets/bop_detection.py:21-33) from the train pipeline."""
    la = cfg.get("label_assignment")
    if la is not None:
        return la.to_dict() if hasattr(la, "to_dict") else dict(la)
    try:
        pipe = cfg.data["train"]["pipeline"]
    except (KeyError, TypeError, AttributeError):
        return None
    from ..data.pipeline import extract_label_assignment

    return extract_label_assignment(list(pipe or []))


def loss_cfg_from(cfg) -> Dict[str, Any]:
    """Translate the reference-style ``bbox_head`` loss dicts
    (configs/bop/r50_ycbv_pbr.py:46-55: loss_cls/loss_bbox/loss_centerness)
    into the flat kwargs ``engine.train_step.build_train_step`` consumes.
    Fails fast on loss types the head cannot honor."""
    from ..ops.losses import BBOX_LOSS_FNS

    head = cfg.model.get("bbox_head", {})
    out: Dict[str, Any] = {}

    lcls = head.get("loss_cls")
    if lcls:
        lcls = lcls.to_dict() if hasattr(lcls, "to_dict") else dict(lcls)
        assert lcls.get("type", "FocalLoss") == "FocalLoss" and lcls.get(
            "use_sigmoid", True
        ), f"unsupported loss_cls {lcls!r} (RADet head is sigmoid-focal)"
        out["focal_gamma"] = float(lcls.get("gamma", 2.0))
        out["focal_alpha"] = float(lcls.get("alpha", 0.25))
        out["cls"] = float(lcls.get("loss_weight", 1.0))

    lbox = head.get("loss_bbox")
    if lbox:
        lbox = lbox.to_dict() if hasattr(lbox, "to_dict") else dict(lbox)
        btype = lbox.get("type", "GIoULoss")
        assert btype in BBOX_LOSS_FNS, (
            f"unsupported loss_bbox type {btype!r} (known: {sorted(BBOX_LOSS_FNS)})"
        )
        out["bbox_type"] = btype
        out["bbox"] = float(lbox.get("loss_weight", 2.0))
        extra = {k: v for k, v in lbox.items()
                 if k not in ("type", "loss_weight", "reduction")}
        out["bbox_extra"] = tuple(sorted(extra.items()))

    liou = head.get("loss_centerness")
    if liou:
        liou = liou.to_dict() if hasattr(liou, "to_dict") else dict(liou)
        assert liou.get("type", "CrossEntropyLoss") == "CrossEntropyLoss" and liou.get(
            "use_sigmoid", True
        ), f"unsupported loss_centerness {liou!r} (binary CE on the IoU branch)"
        out["iou"] = float(liou.get("loss_weight", 1.0))
    return out


def anchor_cfg_from_model(model_cfg: Dict, label_assignment_cfg: Dict | None = None) -> AnchorConfig:
    head = model_cfg.get("bbox_head", {})
    agen = dict(head.get("anchor_generator", {}))
    if label_assignment_cfg:
        # a verbatim reference pipeline LabelAssignment carries its own
        # anchor_generator_cfg (bop_detection.py:22-29) — fill in anything
        # the head config doesn't specify
        for k, v in dict(label_assignment_cfg.get("anchor_generator_cfg") or {}).items():
            if k != "type":
                agen.setdefault(k, v)
        # per-level regress ranges live with the assignment config (reference
        # LabelAssignment ctor, label_assignment.py:30-40)
        if "regress_ranges" in label_assignment_cfg:
            agen["regress_ranges"] = label_assignment_cfg["regress_ranges"]
    return AnchorConfig.from_cfg(agen)


def build_model_and_anchors(cfg) -> Tuple[Any, np.ndarray, np.ndarray, list]:
    """(model, anchors, regress_ranges, level_counts) for cfg.input_size."""
    model_cfg = cfg.model.to_dict() if hasattr(cfg.model, "to_dict") else dict(cfg.model)
    model = build_detector(model_cfg, dtype=cfg.get("compute_dtype", "float32"))
    input_size = tuple(cfg.get("input_size", (480, 640)))
    anchors, ranges, strides, counts = generate_anchors(
        input_size, anchor_cfg_from_model(model_cfg, assignment_cfg_from(cfg))
    )
    return model, anchors, ranges, counts


def init_variables(model, input_size, seed: int = 0):
    h, w = input_size
    return model.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, h, w, 3), jnp.float32), train=False
    )


def build_dataset(cfg, split: str, test_mode: bool | None = None):
    data_cfg = cfg.data[split].to_dict() if hasattr(cfg.data[split], "to_dict") else dict(cfg.data[split])
    if test_mode is None:
        test_mode = split != "train"
    ds_type = data_cfg.get("type", "BOPDataset")
    if ds_type in ("MixDataset", "ConcatDataset", "RepeatDataset", "ClassBalancedDataset"):
        from ..data.dataset_wrappers import (
            ClassBalancedDataset,
            ConcatDataset,
            MixDataset,
            RepeatDataset,
        )

        def _sub(sub_cfg):
            sub_cfg = dict(sub_cfg)
            # sub-datasets inherit pipeline/classes/etc. from the wrapper level
            for key in ("pipeline", "classes", "min_visib_frac", "seg_prefix"):
                if key in data_cfg and key not in sub_cfg:
                    sub_cfg[key] = data_cfg[key]
            return _build_bop(cfg, sub_cfg, test_mode)

        if ds_type == "MixDataset":
            return MixDataset(
                [_sub(d) for d in data_cfg["datasets"]], data_cfg["ratios"]
            )
        if ds_type == "ConcatDataset":
            return ConcatDataset([_sub(d) for d in data_cfg["datasets"]])
        if ds_type == "RepeatDataset":
            return RepeatDataset(_sub(data_cfg["dataset"]), data_cfg["times"])
        return ClassBalancedDataset(
            _sub(data_cfg["dataset"]), data_cfg["oversample_thr"]
        )
    return _build_bop(cfg, data_cfg, test_mode)


def _build_bop(cfg, data_cfg, test_mode: bool, input_size=None) -> BOPDataset:
    """``input_size`` overrides cfg.input_size (used by multi-scale TTA views,
    where every scale needs its own static padded resolution)."""
    from ..data.datasets_extra import DATASET_TYPES, XMLDataset

    ds_type = data_cfg.get("type", "BOPDataset")
    if ds_type not in DATASET_TYPES:
        raise KeyError(
            f"unknown dataset type {ds_type!r}; available: "
            f"{sorted(DATASET_TYPES)} plus the wrapper types"
        )
    ds_cls = DATASET_TYPES[ds_type]
    extra = {}
    if issubclass(ds_cls, XMLDataset) and "min_size" in data_cfg:
        extra["min_size"] = data_cfg["min_size"]
    la_cfg = assignment_cfg_from(cfg)
    max_gt = int(la_cfg.get("max_gt", 32)) if la_cfg is not None else 32
    model_cfg = cfg.model.to_dict() if hasattr(cfg.model, "to_dict") else dict(cfg.model)
    img_norm = cfg.get("img_norm_cfg")
    return ds_cls(
        ann_file=data_cfg["ann_file"],
        img_prefix=data_cfg.get("img_prefix", ""),
        seg_prefix=data_cfg.get("seg_prefix"),
        classes=data_cfg.get("classes"),
        pipeline=data_cfg["pipeline"],
        test_mode=test_mode,
        min_visib_frac=data_cfg.get("min_visib_frac", 0.0),
        bop_submission=data_cfg.get("bop_submission", False),
        input_size=tuple(input_size or cfg.get("input_size", (480, 640))),
        max_gt=max_gt,
        anchor_cfg=anchor_cfg_from_model(model_cfg, la_cfg),
        img_norm=img_norm.to_dict() if img_norm is not None else None,
        orientation=data_cfg.get("orientation"),
        **extra,
    )


def normalizer_from_cfg(cfg) -> float:
    head = cfg.model.bbox_head
    coder = head.get("bbox_coder")
    if coder is not None and "normalizer" in coder:
        return float(coder["normalizer"])
    return 1.0 / 8.0
