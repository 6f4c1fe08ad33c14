"""Generic anchor-based dense heads (ATSSHead / AnchorHead) — flax.linen.

Architecture parity:

- ``ATSSHead`` tower (/root/reference/radet/models/dense_heads/
  atss_head.py:52-145): 4x [3x3 conv + GN(32) + ReLU] on separate cls/reg
  branches SHARED across levels, then 3x3 heads ``atss_cls`` (A*C channels,
  prior-prob bias init), ``atss_reg`` (A*4, per-level learnable Scale, NO
  ReLU — that is the RADetHead addition), ``atss_centerness`` (A*1, on the
  reg branch).
- ``AnchorHead`` (anchor_head.py:95-121): no tower — a single 1x1
  ``conv_cls`` (A*C) + 1x1 ``conv_reg`` (A*4) pair on the neck features
  (the RPN/RetinaNet-base layout).

Outputs are NHWC per level, cast to f32 for loss/postprocessing; flattening
(B, H, W, A*k) -> (B, H*W*A, k) matches the anchor order of
``core.anchor_generator`` (A fastest within a cell).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .radet_head import ConvGNBlock, _bias_init_with_prob, _run_tower

Dtype = Any


class ATSSHead(nn.Module):
    num_classes: int
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    num_levels: int = 5
    num_anchors: int = 1  # base anchors per cell (A)
    dtype: Dtype = jnp.float32
    quant: Optional[str] = None  # None | 'int8' tower convs (see _Int8Conv)

    def setup(self):
        self.cls_convs = [
            ConvGNBlock(self.feat_channels, self.dtype, self.quant,
                        name=f"cls_conv_{i}")
            for i in range(self.stacked_convs)
        ]
        self.reg_convs = [
            ConvGNBlock(self.feat_channels, self.dtype, self.quant,
                        name=f"reg_conv_{i}")
            for i in range(self.stacked_convs)
        ]
        head_kw = dict(
            padding=((1, 1), (1, 1)),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.normal(0.01),
        )
        self.atss_cls = nn.Conv(
            self.num_anchors * self.num_classes,
            (3, 3),
            bias_init=nn.initializers.constant(_bias_init_with_prob(0.01)),
            name="atss_cls",
            **head_kw,
        )
        self.atss_reg = nn.Conv(self.num_anchors * 4, (3, 3), name="atss_reg",
                                **head_kw)
        self.atss_centerness = nn.Conv(
            self.num_anchors, (3, 3), name="atss_centerness", **head_kw
        )
        # per-level Scale on the reg output (atss_head.py:86-87,143)
        self.scales = self.param(
            "scales", nn.initializers.ones, (self.num_levels,), jnp.float32
        )

    def __call__(
        self, feats: Sequence[jnp.ndarray]
    ) -> Tuple[List[jnp.ndarray], List[jnp.ndarray], List[jnp.ndarray]]:
        assert len(feats) == self.num_levels
        cls_out, reg_out, ctr_out = [], [], []
        for lvl, x in enumerate(feats):
            cls_feat = _run_tower(self.cls_convs, x, self.quant)
            reg_feat = _run_tower(self.reg_convs, x, self.quant)
            cls_score = self.atss_cls(cls_feat).astype(jnp.float32)
            # ATSS: Scale, no exp, NO ReLU (atss_head.py:142-143)
            bbox_pred = self.atss_reg(reg_feat).astype(jnp.float32) * self.scales[lvl]
            centerness = self.atss_centerness(reg_feat).astype(jnp.float32)
            cls_out.append(cls_score)
            reg_out.append(bbox_pred)
            ctr_out.append(centerness)
        return cls_out, reg_out, ctr_out


class AnchorHead(nn.Module):
    """The plain anchor-based head: 1x1 cls/reg convs on neck features
    (reference anchor_head.py:95-121)."""

    num_classes: int
    in_channels: int = 256
    num_levels: int = 5
    num_anchors: int = 1
    use_sigmoid_cls: bool = True  # cls_out_channels = C (vs C+1 softmax)
    dtype: Dtype = jnp.float32

    def setup(self):
        cls_channels = (
            self.num_classes if self.use_sigmoid_cls else self.num_classes + 1
        )
        head_kw = dict(
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.normal(0.01),
        )
        self.conv_cls = nn.Conv(
            self.num_anchors * cls_channels, (1, 1), name="conv_cls", **head_kw
        )
        self.conv_reg = nn.Conv(
            self.num_anchors * 4, (1, 1), name="conv_reg", **head_kw
        )

    def __call__(
        self, feats: Sequence[jnp.ndarray]
    ) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
        assert len(feats) == self.num_levels
        cls_out, reg_out = [], []
        for x in feats:
            cls_out.append(self.conv_cls(x).astype(jnp.float32))
            reg_out.append(self.conv_reg(x).astype(jnp.float32))
        return cls_out, reg_out


def flatten_anchor_outputs(maps_list: Sequence[jnp.ndarray], last_dim: int):
    """Per-level (B, H, W, A*k) maps -> (B, H*W*A, k) concatenated over
    levels, matching the flat anchor ordering (A fastest within a cell)."""
    b = maps_list[0].shape[0]
    flat = [m.reshape(b, -1, last_dim) for m in maps_list]
    return jnp.concatenate(flat, axis=1)
