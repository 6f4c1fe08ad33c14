"""RADet single-stage detector module (backbone -> FPN -> head).

Mirrors the reference composition (/root/reference/radet/models/detectors/
single_stage.py:24-57, radet.py:6-33) as one flax module. The model consumes
already-normalized float NHWC images; uint8->float normalization happens in
the jitted step (`preprocess_images`) so host->device transfers stay uint8.
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .backbones_extra import make_backbone, thaw_cfg
from .fpn import FPN, ChannelMapper
from .radet_head import RADetHead
from .resnet import RegNet, ResNet

Dtype = Any


def preprocess_images(images_u8, mean, std, dtype=jnp.float32):
    """uint8 RGB NHWC -> normalized float NHWC (device-side).

    mean/std follow the reference img_norm_cfg
    (/root/reference/configs/base/datasets/bop_detection.py:3-4).
    """
    x = images_u8.astype(jnp.float32)
    x = (x - jnp.asarray(mean, jnp.float32)) / jnp.asarray(std, jnp.float32)
    return x.astype(dtype)


class RADet(nn.Module):
    num_classes: int
    depth: int = 50
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    frozen_stages: int = 1
    norm_eval: bool = True
    groups: int = 1  # ResNeXt cardinality
    base_width: int = 4
    deep_stem: bool = False  # ResNetV1d
    avg_down: bool = False
    stem_s2d: bool = False  # space-to-depth stem (resnet.StemConvS2D)
    scales: int = 1  # Res2Net scale count (>1 enables Bottle2neck)
    radix: int = 0  # ResNeSt split-attention radix (>0 enables it)
    reduction_factor: int = 4  # ResNeSt gate squeeze
    avg_down_stride: bool = True  # ResNeSt stride-by-pool
    regnet_arch: str = ""  # non-empty: RegNet backbone (e.g. 'regnetx_3.2gf')
    # non-empty: an extra backbone family (Darknet/HRNet/SSDVGG/
    # DetectoRS_ResNet) built by backbones_extra.make_backbone;
    # backbone_opts is its freeze_cfg-canonicalized config dict
    backbone_type: str = ""
    backbone_opts: Any = ()
    with_cp: bool = False  # per-block gradient checkpointing (remat)
    # deploy-time int8 trunk convs (resnet.ResNet.quant; eval only)
    backbone_quant: Optional[str] = None
    # train-time STE fake-quant at the deploy scales (QAT; resnet.ResNet.qat
    # / radet_head.RADetHead.qat) — set alongside the matching quant level
    backbone_qat: bool = False
    head_qat: bool = False
    # train-time int8 for the FROZEN backbone stages (resnet.ResNet.
    # frozen_int8): the stop_gradient'd stem+layerN prefix runs the
    # int8_stream deploy arithmetic during training — a train-speed lever
    # for the HBM-bound stride-4 stages; float configs only
    backbone_frozen_int8: bool = False
    neck_type: str = "FPN"  # 'FPN' | 'ChannelMapper'
    neck_kernel_size: int = 3  # ChannelMapper only
    neck_with_relu: bool = True  # ChannelMapper only (act_cfg ReLU default)
    fpn_add_extra_convs: str = "on_output"
    fpn_relu_before_extra_convs: bool = False
    fpn_out_channels: int = 256
    fpn_num_outs: int = 5
    fpn_start_level: int = 1
    stacked_convs: int = 4
    feat_channels: int = 256
    head_quant: Optional[str] = None  # None | 'int8' (see radet_head._Int8Conv)
    # which dense head tops the pyramid: RADetHead (the flagship), or the
    # generic anchor-based family (reference dense_heads/__init__.py exports
    # exactly these; AnchorFreeHead is abstract)
    head_type: str = "RADetHead"  # 'RADetHead' | 'ATSSHead' | 'AnchorHead'
    num_base_anchors: int = 1  # anchors per cell (A) for the generic heads
    head_use_sigmoid: bool = True  # AnchorHead: C vs C+1 cls channels
    dtype: Dtype = jnp.float32

    def setup(self):
        if self.backbone_type:
            self.backbone = make_backbone(
                self.backbone_type,
                dict(thaw_cfg(self.backbone_opts)),
                norm_eval=self.norm_eval,
                frozen_stages=self.frozen_stages,
                dtype=self.dtype,
                name="backbone",
            )
        elif self.regnet_arch:
            self.backbone = RegNet(
                arch=self.regnet_arch,
                out_indices=self.out_indices,
                frozen_stages=self.frozen_stages,
                norm_eval=self.norm_eval,
                dtype=self.dtype,
                name="backbone",
            )
        else:
            self.backbone = self._resnet()
        self._setup_neck_head()

    def _resnet(self):
        return ResNet(
            depth=self.depth,
            out_indices=self.out_indices,
            frozen_stages=self.frozen_stages,
            norm_eval=self.norm_eval,
            groups=self.groups,
            base_width=self.base_width,
            deep_stem=self.deep_stem,
            avg_down=self.avg_down,
            stem_s2d=self.stem_s2d,
            scales=self.scales,
            radix=self.radix,
            reduction_factor=self.reduction_factor,
            avg_down_stride=self.avg_down_stride,
            with_cp=self.with_cp,
            quant=self.backbone_quant,
            qat=self.backbone_qat,
            frozen_int8=self.backbone_frozen_int8,
            dtype=self.dtype,
            name="backbone",
        )

    def _num_backbone_outputs(self) -> int:
        """How many feature maps the backbone emits (neck input count)."""
        if not self.backbone_type:
            return len(self.out_indices)
        opts = dict(thaw_cfg(self.backbone_opts))
        if self.backbone_type == "Darknet":
            return len(tuple(opts.get("out_indices", (3, 4, 5))))
        if self.backbone_type == "HRNet":
            extra = opts.get("extra", "hrnet_w18")
            if isinstance(extra, str):
                from .backbones_extra import HRNET_PRESETS

                extra = HRNET_PRESETS[extra]
            return extra["stage4"]["num_branches"]
        if self.backbone_type == "SSDVGG":
            from .backbones_extra import ssd_extra_layout

            n_extra = len(ssd_extra_layout(opts.get("input_size", 300))) // 2
            return len(tuple(opts.get("out_feature_indices", (22, 34)))) + n_extra
        if self.backbone_type in ("DetectoRS_ResNet", "DetectoRS_ResNeXt"):
            return len(tuple(opts.get("out_indices", (0, 1, 2, 3)))) + int(
                opts.get("output_img", False)
            )
        raise ValueError(
            f"backbone {self.backbone_type!r} has no neck-composable output "
            "contract (HourglassNet/TridentResNet are standalone modules)"
        )

    def _setup_neck_head(self):
        if self.neck_type == "FPN":
            self.neck = FPN(
                out_channels=self.fpn_out_channels,
                num_outs=self.fpn_num_outs,
                start_level=self.fpn_start_level,
                add_extra_convs=self.fpn_add_extra_convs,
                relu_before_extra_convs=self.fpn_relu_before_extra_convs,
                dtype=self.dtype,
                name="neck",
            )
            head_levels = self.fpn_num_outs
        elif self.neck_type == "ChannelMapper":
            # maps every backbone output 1:1 (reference channel_mapper.py:8-80
            # has no top-down path / extra levels)
            self.neck = ChannelMapper(
                out_channels=self.fpn_out_channels,
                kernel_size=self.neck_kernel_size,
                with_relu=self.neck_with_relu,
                dtype=self.dtype,
                name="neck",
            )
            head_levels = self._num_backbone_outputs()
        else:
            raise ValueError(
                f"unsupported neck_type={self.neck_type!r} "
                "(expected 'FPN' or 'ChannelMapper')"
            )
        if self.head_type == "RADetHead":
            self.bbox_head = RADetHead(
                num_classes=self.num_classes,
                in_channels=self.fpn_out_channels,
                feat_channels=self.feat_channels,
                stacked_convs=self.stacked_convs,
                num_levels=head_levels,
                dtype=self.dtype,
                quant=self.head_quant,
                qat=self.head_qat,
                name="bbox_head",
            )
        elif self.head_type == "ATSSHead":
            from .anchor_heads import ATSSHead

            self.bbox_head = ATSSHead(
                num_classes=self.num_classes,
                in_channels=self.fpn_out_channels,
                feat_channels=self.feat_channels,
                stacked_convs=self.stacked_convs,
                num_levels=head_levels,
                num_anchors=self.num_base_anchors,
                dtype=self.dtype,
                quant=self.head_quant,
                name="bbox_head",
            )
        elif self.head_type == "AnchorHead":
            from .anchor_heads import AnchorHead

            self.bbox_head = AnchorHead(
                num_classes=self.num_classes,
                in_channels=self.fpn_out_channels,
                num_levels=head_levels,
                num_anchors=self.num_base_anchors,
                use_sigmoid_cls=self.head_use_sigmoid,
                dtype=self.dtype,
                name="bbox_head",
            )
        else:
            raise ValueError(
                f"unsupported head_type {self.head_type!r} "
                "(RADetHead | ATSSHead | AnchorHead)"
            )

    def __call__(self, images, train: bool = False):
        feats = self.backbone(images, train=train)
        pyramids = self.neck(feats)
        if self.head_type == "RADetHead":
            # train gates the head's QAT fake-quant: at eval a qat head runs
            # the true int8 deploy arithmetic, consistent with the backbone
            return self.bbox_head(pyramids, train=train)
        return self.bbox_head(pyramids)


def flatten_head_outputs(cls_list, reg_list, iou_list):
    """Per-level NHWC outputs -> anchor-ordered flat tensors.

    NHWC reshape (B, H*W, C) concatenated over levels matches the anchor
    ordering of `core.anchors.generate_anchors` (levels in stride order,
    row-major within level) and the reference's permute(0,2,3,1).reshape
    flattening (radet_head.py:222-236).

    Returns (cls (B, N, C), reg (B, N, 4), iou (B, N)).
    """
    b = cls_list[0].shape[0]
    cls = jnp.concatenate([c.reshape(b, -1, c.shape[-1]) for c in cls_list], axis=1)
    reg = jnp.concatenate([r.reshape(b, -1, 4) for r in reg_list], axis=1)
    iou = jnp.concatenate([i.reshape(b, -1) for i in iou_list], axis=1)
    return cls, reg, iou
