"""RADet dense head (flax.linen): shared conv towers + per-level outputs.

Architecture parity with the reference ATSSHead tower
(/root/reference/radet/models/dense_heads/atss_head.py:52-145) as specialized
by RADetHead (radet_head.py:27-30):

- 4 stacked 3x3 conv + GroupNorm(32) + ReLU blocks on each of the cls and reg
  branches, weights SHARED across the 5 pyramid levels;
- heads: cls (num_classes channels), reg (4 channels, multiplied by a
  per-level learnable scalar Scale then ReLU'd — the RADet addition), and an
  IoU-quality channel on the reg branch (the 'centerness' conv);
- cls head bias initialized to -log((1-p)/p), p=0.01.

Outputs are NHWC per level, cast to float32 for the loss/postprocessing.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

Dtype = Any


def _bias_init_with_prob(p: float) -> float:
    return float(-np.log((1 - p) / p))


class ConvGNBlock(nn.Module):
    feat_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.feat_channels,
            (3, 3),
            padding=((1, 1), (1, 1)),
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.normal(0.01),
            name="conv",
        )(x)
        # GroupNorm in fp32 for numerical stability under bf16 compute.
        x = nn.GroupNorm(
            num_groups=32, epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32, name="gn"
        )(x.astype(jnp.float32))
        return nn.relu(x).astype(self.dtype)


class RADetHead(nn.Module):
    num_classes: int
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    num_levels: int = 5
    dtype: Dtype = jnp.float32

    def setup(self):
        self.cls_convs = [
            ConvGNBlock(self.feat_channels, self.dtype, name=f"cls_conv_{i}")
            for i in range(self.stacked_convs)
        ]
        self.reg_convs = [
            ConvGNBlock(self.feat_channels, self.dtype, name=f"reg_conv_{i}")
            for i in range(self.stacked_convs)
        ]
        head_kw = dict(
            padding=((1, 1), (1, 1)),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.normal(0.01),
        )
        self.conv_cls = nn.Conv(
            self.num_classes,
            (3, 3),
            bias_init=nn.initializers.constant(_bias_init_with_prob(0.01)),
            name="conv_cls",
            **head_kw,
        )
        self.conv_reg = nn.Conv(4, (3, 3), name="conv_reg", **head_kw)
        self.conv_iou = nn.Conv(1, (3, 3), name="conv_iou", **head_kw)
        # per-level learnable Scale on the reg output (atss_head.py:86-87,143)
        self.scales = self.param(
            "scales", nn.initializers.ones, (self.num_levels,), jnp.float32
        )

    def __call__(
        self, feats: Sequence[jnp.ndarray]
    ) -> Tuple[List[jnp.ndarray], List[jnp.ndarray], List[jnp.ndarray]]:
        assert len(feats) == self.num_levels
        cls_out, reg_out, iou_out = [], [], []
        for lvl, x in enumerate(feats):
            cls_feat = x
            reg_feat = x
            for conv in self.cls_convs:
                cls_feat = conv(cls_feat)
            for conv in self.reg_convs:
                reg_feat = conv(reg_feat)
            cls_score = self.conv_cls(cls_feat).astype(jnp.float32)
            bbox_pred = self.conv_reg(reg_feat).astype(jnp.float32) * self.scales[lvl]
            # RADet applies ReLU on the reg output (radet_head.py:29)
            bbox_pred = nn.relu(bbox_pred)
            iou_pred = self.conv_iou(reg_feat).astype(jnp.float32)
            cls_out.append(cls_score)
            reg_out.append(bbox_pred)
            iou_out.append(iou_pred)
        return cls_out, reg_out, iou_out
