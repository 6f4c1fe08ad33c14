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


def head_type_from_cfg(cfg_or_model) -> str:
    """'RADetHead' | 'ATSSHead' | 'AnchorHead' from a full cfg or model cfg."""
    model = cfg_or_model.get("model", cfg_or_model)
    head = model.get("bbox_head", {})
    return head.get("type", "RADetHead")


def anchor_head_spec(cfg) -> Dict[str, Any]:
    """Everything the generic anchor-head train/infer steps need, from a
    reference-style config: head type, coder closures, assigner + loss
    kwargs, optional anchor valid mask.

    Sources (reference file:line): bbox_coder + loss dicts live in
    bbox_head (anchor_head.py:42-53); the assigner, allowed_border and
    pos_weight in train_cfg (built at anchor_head.py:79-86 /
    atss_head.py:44-48)."""
    model_cfg = cfg.model.to_dict() if hasattr(cfg.model, "to_dict") else dict(cfg.model)
    head = dict(model_cfg.get("bbox_head", {}))
    head_type = head.get("type", "RADetHead")
    assert head_type in ("ATSSHead", "AnchorHead"), head_type
    from ..core.box_coder import build_bbox_coder

    coder_cfg = dict(head.get("bbox_coder", {"type": "DeltaXYWHBBoxCoder"}))
    encode_fn, decode_fn = build_bbox_coder(coder_cfg)

    train_cfg = cfg.get("train_cfg") or model_cfg.get("train_cfg") or {}
    if hasattr(train_cfg, "to_dict"):
        train_cfg = train_cfg.to_dict()
    train_cfg = dict(train_cfg)
    assigner = dict(train_cfg.get("assigner", {}))

    def _d(x):
        return x.to_dict() if hasattr(x, "to_dict") else dict(x or {})

    lcls = _d(head.get("loss_cls"))
    lbox = _d(head.get("loss_bbox"))
    loss_kwargs: Dict[str, Any] = {}
    if head_type == "ATSSHead":
        atype = assigner.get("type", "ATSSAssigner")
        assert atype == "ATSSAssigner", (
            f"ATSSHead trains with ATSSAssigner (atss_head.py:44-46), got {atype!r}"
        )
        lctr = _d(head.get("loss_centerness"))
        assert lcls.get("type", "FocalLoss") == "FocalLoss" and lcls.get(
            "use_sigmoid", True
        ), f"ATSSHead is sigmoid-focal (atss_head.py loss_cls), got {lcls!r}"
        from ..ops.losses import BBOX_LOSS_FNS

        btype = lbox.get("type", "GIoULoss")
        assert btype in BBOX_LOSS_FNS, f"unsupported loss_bbox {btype!r}"
        loss_kwargs.update(
            topk=int(assigner.get("topk", 9)),
            quality=str(head.get("quality", "centerness")),
            focal_gamma=float(lcls.get("gamma", 2.0)),
            focal_alpha=float(lcls.get("alpha", 0.25)),
            cls_loss_weight=float(lcls.get("loss_weight", 1.0)),
            bbox_loss_type=btype,
            bbox_loss_weight=float(lbox.get("loss_weight", 2.0)),
            centerness_loss_weight=float(
                lctr.get("loss_weight", 1.0) if lctr else 1.0
            ),
        )
    else:  # AnchorHead
        atype = assigner.get("type", "MaxIoUAssigner")
        assert atype == "MaxIoUAssigner", (
            f"AnchorHead trains with MaxIoUAssigner (every reference "
            f"train_cfg names it), got {atype!r}"
        )
        assert float(assigner.get("ignore_iof_thr", -1)) < 0, (
            "ignore_iof_thr > 0 (crowd-ignore regions) is not implemented — "
            "no reference BOP config sets it"
        )
        cls_type = lcls.get("type", "FocalLoss")
        sampler = dict(train_cfg.get("sampler", {"type": "PseudoSampler"}))
        stype = sampler.get("type", "PseudoSampler")
        sampling = cls_type not in ("FocalLoss", "GHMC", "QualityFocalLoss")
        if not sampling:
            # mmdet anchor_head.py:62-70: under a focal-family loss the head
            # hard-codes PseudoSampler and IGNORES train_cfg.sampler
            stype = "PseudoSampler"
        _samplers = (
            "PseudoSampler", "RandomSampler", "OHEMSampler",
            "IoUBalancedNegSampler", "InstanceBalancedPosSampler",
            "ScoreHLRSampler", "CombinedSampler",
        )
        assert stype in _samplers, (
            f"sampler {stype!r}: the full reference sampler zoo is "
            f"implemented ({', '.join(_samplers)}) — core/sampler_cores.py"
        )
        if stype != "PseudoSampler":
            assert not sampler.get("add_gt_as_proposals", False), (
                "add_gt_as_proposals injects GT boxes into an RoI proposal "
                "list — meaningless for a dense anchor head"
            )
            # sampler-specific options (core/sampler_cores.py::sample_with);
            # CombinedSampler's nested pos/neg component dicts map to the
            # core names (reference combined_sampler.py builds sub-samplers)
            _component = {
                "RandomSampler": "random",
                "InstanceBalancedPosSampler": "instance_balanced",
                "IoUBalancedNegSampler": "iou_balanced",
                "OHEMSampler": "ohem",
            }
            extra = {
                k: sampler[k]
                for k in ("floor_thr", "floor_fraction", "num_bins",
                          "score_thr", "iou_thr", "k", "bias")
                if k in sampler
            }
            for side in ("pos_sampler", "neg_sampler"):
                if side in sampler:
                    sub = dict(sampler[side])
                    extra[side] = _component[sub.pop("type")]
                    extra.update(sub)
            loss_kwargs.update(
                sampler_num=int(sampler.get("num", 256)),
                sampler_pos_fraction=float(sampler.get("pos_fraction", 0.5)),
                sampler_neg_pos_ub=float(sampler.get("neg_pos_ub", -1)),
                sampler_type=stype,
                sampler_extra=tuple(sorted(extra.items())),
            )
        loss_kwargs.update(
            pos_iou_thr=float(assigner.get("pos_iou_thr", 0.5)),
            neg_iou_thr=(
                tuple(assigner["neg_iou_thr"])
                if isinstance(assigner.get("neg_iou_thr"), (list, tuple))
                else float(assigner.get("neg_iou_thr", 0.4))
            ),
            min_pos_iou=float(assigner.get("min_pos_iou", 0.0)),
            gt_max_assign_all=bool(assigner.get("gt_max_assign_all", True)),
            match_low_quality=bool(assigner.get("match_low_quality", True)),
            cls_loss=cls_type,
            focal_gamma=float(lcls.get("gamma", 2.0)),
            focal_alpha=float(lcls.get("alpha", 0.25)),
            cls_loss_weight=float(lcls.get("loss_weight", 1.0)),
            bbox_loss_type=lbox.get("type", "SmoothL1Loss"),
            bbox_loss_weight=float(lbox.get("loss_weight", 1.0)),
            smooth_l1_beta=float(lbox.get("beta", 1.0 / 9.0)),
            reg_decoded_bbox=bool(head.get("reg_decoded_bbox", False)),
            pos_weight=float(train_cfg.get("pos_weight", -1.0)),
        )

    # allowed_border: -1 (every shipped config) = no anchor filtering; >= 0
    # masks anchors whose box leaves the image by more than the allowance
    # (reference core/anchor/utils.py anchor_inside_flags)
    valid_mask = None
    allowed_border = float(train_cfg.get("allowed_border", -1))
    if allowed_border >= 0:
        from ..core.anchor_generator import build_anchor_generator, flat_anchors_for_input

        gen = build_anchor_generator(dict(head["anchor_generator"]))
        input_size = tuple(cfg.get("input_size", (480, 640)))
        anchors, flags, _ = flat_anchors_for_input(gen, input_size)
        h, w = input_size
        inside = (
            flags
            & (anchors[:, 0] >= -allowed_border)
            & (anchors[:, 1] >= -allowed_border)
            & (anchors[:, 2] < w + allowed_border)
            & (anchors[:, 3] < h + allowed_border)
        )
        valid_mask = inside

    return dict(
        head_type=head_type,
        encode_fn=encode_fn,
        decode_fn=decode_fn,
        loss_kwargs=loss_kwargs,
        valid_mask=valid_mask,
    )


def anchor_cfg_from_model(model_cfg: Dict, label_assignment_cfg: Dict | None = None) -> AnchorConfig:
    head = model_cfg.get("bbox_head", {})
    if head.get("type", "RADetHead") != "RADetHead":
        # generic anchor heads carry their own generator (multi-anchor);
        # the dataset only uses this config to place distance-sampling
        # centers, which those pipelines never run — a default is inert
        return AnchorConfig()
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
    """(model, anchors, aux, level_counts) for cfg.input_size.

    ``aux`` is the per-anchor regress ranges for the RADet head, or the
    per-anchor valid flags for the generic anchor heads (whose anchors come
    from the full bbox_head.anchor_generator, possibly A > 1 per cell)."""
    model_cfg = cfg.model.to_dict() if hasattr(cfg.model, "to_dict") else dict(cfg.model)
    model = build_detector(model_cfg, dtype=cfg.get("compute_dtype", "float32"))
    input_size = tuple(cfg.get("input_size", (480, 640)))
    if head_type_from_cfg(model_cfg) != "RADetHead":
        from ..core.anchor_generator import (
            build_anchor_generator,
            flat_anchors_for_input,
        )

        gen = build_anchor_generator(dict(model_cfg["bbox_head"]["anchor_generator"]))
        anchors, valid, counts = flat_anchors_for_input(gen, input_size)
        return model, anchors, valid, counts
    anchors, ranges, strides, counts = generate_anchors(
        input_size, anchor_cfg_from_model(model_cfg, assignment_cfg_from(cfg))
    )
    return model, anchors, ranges, counts


def build_infer_for_cfg(cfg, model, anchors, counts, test_cfg=None):
    """Head-aware compiled inference step for a config (RADet vote-NMS path
    or the generic anchor-head delta-decode + class-NMS path)."""
    test_cfg = test_cfg if test_cfg is not None else cfg.test_cfg.to_dict()
    img_norm = cfg.img_norm_cfg.to_dict()
    if head_type_from_cfg(cfg.model) == "RADetHead":
        from ..engine.train_step import build_infer_step

        return build_infer_step(
            model,
            anchors,
            counts,
            img_norm=img_norm,
            test_cfg=test_cfg,
            normalizer=normalizer_from_cfg(cfg),
        )
    from ..engine.train_step import build_infer_step_anchor

    return build_infer_step_anchor(
        model,
        anchors,
        counts,
        img_norm=img_norm,
        test_cfg=test_cfg,
        spec=anchor_head_spec(cfg),
    )


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
