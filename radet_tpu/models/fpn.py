"""Feature Pyramid Network (flax.linen, NHWC).

Matches the reference FPN wiring used by RADet
(/root/reference/radet/models/necks/fpn.py:66-221 with config
configs/bop/r50_ycbv_pbr.py:23-29): start_level=1 over (C2..C5) -> laterals on
C3..C5, nearest top-down upsample, 3x3 output convs, and two extra stride-2
convs 'on_output' producing P6, P7 (no ReLU between them,
relu_before_extra_convs=False). No norm layers; convs keep bias.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


def _upsample_nearest_to(x, target_hw):
    """Nearest-neighbour 2x upsample cropped to the target spatial size.

    For the static pyramid shapes used here every lower level is exactly
    ceil(upper*2); repeat-then-crop equals torch's
    ``F.interpolate(size=..., mode='nearest')`` on these shapes.
    """
    th, tw = target_hw
    x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return x[:, :th, :tw, :]


class FPN(nn.Module):
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 1
    add_extra_convs: str = "on_output"
    relu_before_extra_convs: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, ...]:
        used = list(inputs[self.start_level :])
        num_laterals = len(used)

        conv_kw = dict(
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.xavier_uniform(),
        )
        laterals = [
            nn.Conv(self.out_channels, (1, 1), name=f"lateral_{i}", **conv_kw)(used[i])
            for i in range(num_laterals)
        ]
        for i in range(num_laterals - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + _upsample_nearest_to(
                laterals[i], laterals[i - 1].shape[1:3]
            )
        outs = [
            nn.Conv(
                self.out_channels,
                (3, 3),
                padding=((1, 1), (1, 1)),
                name=f"fpn_{i}",
                **conv_kw,
            )(laterals[i])
            for i in range(num_laterals)
        ]
        extra_levels = self.num_outs - num_laterals
        if extra_levels > 0:
            # mmdet FPN extra-conv source options (reference fpn.py:66-221);
            # the RADet configs use 'on_output'
            if self.add_extra_convs == "on_output":
                source = outs[-1]
            elif self.add_extra_convs == "on_input":
                source = inputs[-1].astype(self.dtype)
            elif self.add_extra_convs == "on_lateral":
                source = laterals[-1]
            else:
                raise ValueError(
                    f"unsupported add_extra_convs={self.add_extra_convs!r} "
                    "(expected 'on_output', 'on_input', or 'on_lateral')"
                )
            for i in range(extra_levels):
                if i > 0 and self.relu_before_extra_convs:
                    source = nn.relu(source)
                source = nn.Conv(
                    self.out_channels,
                    (3, 3),
                    strides=(2, 2),
                    padding=((1, 1), (1, 1)),
                    name=f"fpn_extra_{i}",
                    **conv_kw,
                )(source)
                outs.append(source)
        return tuple(outs)


class ChannelMapper(nn.Module):
    """Per-scale conv mapping backbone channels to a common width — parity
    with the reference's other registered neck
    (/root/reference/radet/models/necks/channel_mapper.py:8-80): one
    ConvModule (conv + ReLU by default) per input level, no top-down path.
    Number of outputs equals the number of inputs."""

    out_channels: int = 256
    kernel_size: int = 3
    with_relu: bool = True  # act_cfg=dict(type='ReLU') default
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, ...]:
        pad = (self.kernel_size - 1) // 2
        outs = []
        for i, x in enumerate(inputs):
            y = nn.Conv(
                self.out_channels,
                (self.kernel_size, self.kernel_size),
                padding=((pad, pad), (pad, pad)),
                dtype=self.dtype,
                param_dtype=jnp.float32,
                kernel_init=nn.initializers.xavier_uniform(),
                name=f"map_{i}",
            )(x.astype(self.dtype))
            outs.append(nn.relu(y) if self.with_relu else y)
        return tuple(outs)
