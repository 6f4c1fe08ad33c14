"""Factory translating reference-style model config dicts into flax modules.

Keeps the reference config surface (configs/bop/r50_ycbv_pbr.py:11-57) —
``model = dict(type='RADet', backbone=..., neck=..., bbox_head=...)`` — but
builds plain dataclass-configured modules instead of going through a global
string registry.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from .detector import RADet

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16}


def head_spec_from_cfg(head: Dict[str, Any]) -> Dict[str, Any]:
    """(head_type, num_base_anchors, use_sigmoid) from a bbox_head config.

    The generic heads carry their anchor generator in-config (reference
    anchor_head.py:37-41,89-92: ``num_anchors = num_base_anchors[0]``, which
    mmdet assumes uniform across levels for everything except SSD heads —
    enforced here).
    """
    head_type = head.get("type", "RADetHead")
    if head_type == "RADetHead":
        return dict(head_type=head_type, num_base_anchors=1, use_sigmoid=True)
    assert head_type in ("ATSSHead", "AnchorHead"), (
        f"unknown bbox_head type {head_type!r} (reference registers "
        "RADetHead/ATSSHead/AnchorHead; AnchorFreeHead is abstract)"
    )
    from ..core.anchor_generator import build_anchor_generator

    agen = head.get("anchor_generator")
    assert agen is not None, f"{head_type} requires bbox_head.anchor_generator"
    gen = build_anchor_generator(dict(agen))
    nba = gen.num_base_anchors
    assert len(set(nba)) == 1, (
        f"per-level anchor counts must be uniform for {head_type} "
        f"(got {nba}; SSD-style heads are not in the reference surface)"
    )
    lcls = head.get("loss_cls") or {}
    use_sigmoid = bool(dict(lcls).get("use_sigmoid", True))
    return dict(
        head_type=head_type, num_base_anchors=nba[0], use_sigmoid=use_sigmoid
    )


def _backbone_quant(backbone: Dict[str, Any], btype: str):
    """Deploy-time int8 trunk switch (backbone.quant = 'int8').

    Wired for the plain ResNet/ResNeXt Bottleneck/BasicBlock trunk — the
    flagship deploy path (resnet.ResNet.quant, ops/quant.py).
    """
    q = backbone.get("quant", None)
    if q is None:
        return None
    assert q in ("int8", "int8_conv2", "int8_stream"), (
        f"backbone.quant: unsupported {q!r} "
        "(None | 'int8' | 'int8_conv2' | 'int8_stream')"
    )
    assert btype in ("ResNet", "ResNetV1d", "ResNeXt"), (
        f"backbone.quant='int8' is implemented for the ResNet/ResNeXt "
        f"trunk, not {btype}"
    )
    if q == "int8_stream":
        assert btype in ("ResNet", "ResNeXt"), (
            "backbone.quant='int8_stream' needs the plain 7x7 stem and "
            "strided 1x1 downsample (V1d's deep_stem/avg_down: use 'int8')"
        )
    return q


def build_detector(model_cfg: Dict[str, Any], dtype: Any = None) -> RADet:
    cfg = dict(model_cfg)
    det_type = cfg.get("type", "RADet")
    assert det_type in ("RADet", "SingleStageDetector"), (
        f"unknown detector type {det_type!r} (reference registers RADet and "
        "SingleStageDetector, detectors/__init__.py)"
    )
    backbone = dict(cfg.get("backbone", {}))
    neck = dict(cfg.get("neck", {}))
    head = dict(cfg.get("bbox_head", {}))
    hspec = head_spec_from_cfg(head)
    # QAT is wired for the flagship deploy path only; fail fast instead of
    # silently training the plain path (review finding r4)
    if head.get("qat"):
        assert hspec["head_type"] == "RADetHead", (
            f"bbox_head.qat is implemented for RADetHead's tower "
            f"(models/radet_head.py), not {hspec['head_type']}"
        )
        assert head.get("quant") == "int8", "bbox_head.qat needs quant='int8'"
    if backbone.get("qat"):
        assert backbone.get("quant"), "backbone.qat needs a backbone.quant level"
    if backbone.get("frozen_int8"):
        assert backbone.get("quant") is None and not backbone.get("qat"), (
            "backbone.frozen_int8 is the float-training lever; quant/qat "
            "configs already quantize their own forward"
        )
        assert backbone.get("type", "ResNet") in ("ResNet", "ResNeXt"), (
            "backbone.frozen_int8 reuses the int8_stream deploy path "
            "(plain 7x7-stem Bottleneck trunks only)"
        )
        assert backbone.get("frozen_stages", 1) >= 0, (
            "backbone.frozen_int8 quantizes the frozen prefix — it needs "
            "frozen_stages >= 0"
        )
    if det_type == "RADet":
        assert hspec["head_type"] == "RADetHead", (
            "detector type 'RADet' pairs with RADetHead (radet.py:19-32 "
            "threads points_to_gt_index through); use "
            "type='SingleStageDetector' for ATSSHead/AnchorHead"
        )
    if dtype is None:
        dtype = _DTYPES.get(cfg.get("dtype", "float32"), jnp.float32)
    elif isinstance(dtype, str):
        dtype = _DTYPES[dtype]
    btype = backbone.get("type", "ResNet")
    _resnet_family = ("ResNet", "ResNetV1d", "ResNeXt", "Res2Net", "RegNet", "ResNeSt")
    # neck-composable extra families (backbones_extra.py); HourglassNet and
    # TridentResNet exist as standalone modules but no reference-shipped
    # neck/head can consume their output contract — fail fast here
    _extra_family = ("Darknet", "HRNet", "SSDVGG", "DetectoRS_ResNet",
                     "DetectoRS_ResNeXt")
    assert btype in _resnet_family + _extra_family, (
        f"unknown backbone type {btype}"
        + (" (standalone module only — see radet_tpu.models.backbones_extra)"
           if btype in ("HourglassNet", "TridentResNet") else "")
    )
    if btype == "RegNet":
        arch = backbone["arch"]
        assert isinstance(arch, str), "RegNet arch must be a named preset"
    ntype = neck.get("type", "FPN")
    assert ntype in ("FPN", "ChannelMapper"), f"unknown neck type {ntype}"
    # fail fast on silently-unsupported neck options (config-surface
    # convention): only ReLU activation and no norm layer are implemented
    act_cfg = neck.get("act_cfg")
    assert act_cfg is None or act_cfg.get("type", "ReLU") == "ReLU", (
        f"unsupported neck act_cfg {act_cfg!r} (only ReLU or None)"
    )
    assert neck.get("norm_cfg") is None, (
        f"unsupported neck norm_cfg {neck.get('norm_cfg')!r} (norm-free necks "
        "only, matching the reference BOP configs)"
    )
    # Res2Net pins V1d-style deep stem + avg-down (reference res2net.py:330-333);
    # ResNeSt extends ResNetV1d (resnest.py:271)
    v1d = btype in ("ResNetV1d", "Res2Net", "ResNeSt")
    res2 = btype == "Res2Net"
    nest = btype == "ResNeSt"
    backbone_type = btype if btype in _extra_family else ""
    backbone_opts = ()
    if backbone_type:
        from .backbones_extra import freeze_cfg

        opts = {k: v for k, v in backbone.items() if k != "type"}
        backbone_opts = freeze_cfg(opts)
    return RADet(
        num_classes=head["num_classes"],
        depth=backbone.get("depth", 50),
        out_indices=tuple(backbone.get("out_indices", (0, 1, 2, 3))),
        # the extra families default to the reference's frozen_stages=-1
        # (darknet.py:97; HRNet has no freezing at all)
        frozen_stages=backbone.get("frozen_stages", -1 if backbone_type else 1),
        norm_eval=backbone.get("norm_eval", True),
        groups=backbone.get("groups", 1) if btype in ("ResNeXt", "ResNeSt") else 1,
        base_width=backbone.get("base_width", 26 if res2 else 4),
        scales=backbone.get("scales", 4) if res2 else 1,
        radix=backbone.get("radix", 2) if nest else 0,
        reduction_factor=backbone.get("reduction_factor", 4),
        avg_down_stride=backbone.get("avg_down_stride", True),
        regnet_arch=backbone.get("arch", "") if btype == "RegNet" else "",
        backbone_type=backbone_type,
        backbone_opts=backbone_opts,
        with_cp=backbone.get("with_cp", False),
        backbone_quant=_backbone_quant(backbone, btype),
        backbone_qat=bool(backbone.get("qat", False)),
        backbone_frozen_int8=bool(backbone.get("frozen_int8", False)),
        head_qat=bool(head.get("qat", False)),
        deep_stem=backbone.get("deep_stem", v1d),
        avg_down=backbone.get("avg_down", v1d),
        stem_s2d=backbone.get("stem_s2d", False),
        neck_type=ntype,
        neck_kernel_size=neck.get("kernel_size", 3),
        neck_with_relu=neck.get("act_cfg", {"type": "ReLU"}) is not None,
        fpn_add_extra_convs=neck.get("add_extra_convs", "on_output"),
        fpn_relu_before_extra_convs=neck.get("relu_before_extra_convs", False),
        fpn_out_channels=neck.get("out_channels", 256),
        fpn_num_outs=neck.get("num_outs", 5),
        fpn_start_level=neck.get("start_level", 1),
        stacked_convs=head.get("stacked_convs", 4),
        feat_channels=head.get("feat_channels", 256),
        head_quant=head.get("quant", None),
        head_type=hspec["head_type"],
        num_base_anchors=hspec["num_base_anchors"],
        head_use_sigmoid=hspec["use_sigmoid"],
        dtype=dtype,
    )
