#!/usr/bin/env python
"""Convert torch checkpoints to radet-tpu (flax/orbax) weights.

Supports two source formats:
- torchvision ResNet state_dict (the reference's
  ``pretrained='torchvision://resnet50'``, configs/bop/r50_ycbv_pbr.py:13) —
  produces backbone-only weights;
- mmdetection/RADet full detector checkpoints (released RADet .pth files) —
  produces the full {params, batch_stats} tree for checkpoint-parity
  evaluation (SURVEY.md §7 'checkpoint import fidelity').

Mapping notes: torch conv weights (out,in,kh,kw) -> flax kernels
(kh,kw,in,out); BN weight/bias -> scale/bias params, running stats ->
batch_stats; mmcv ConvModule '.conv'/'.gn' submodules -> our
cls_conv_i/{conv,gn}; per-level Scale modules -> the bbox_head 'scales'
vector.
"""

import argparse
import os.path as osp
import re
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def t2f_conv(w):
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def _bn(dst, prefix_parts, sd, torch_prefix):
    """Map one torch BN layer into params/batch_stats dicts."""
    dst[("params",) + prefix_parts + ("BatchNorm_0", "scale")] = np.asarray(
        sd[torch_prefix + ".weight"]
    )
    dst[("params",) + prefix_parts + ("BatchNorm_0", "bias")] = np.asarray(
        sd[torch_prefix + ".bias"]
    )
    dst[("batch_stats",) + prefix_parts + ("BatchNorm_0", "mean")] = np.asarray(
        sd[torch_prefix + ".running_mean"]
    )
    dst[("batch_stats",) + prefix_parts + ("BatchNorm_0", "var")] = np.asarray(
        sd[torch_prefix + ".running_var"]
    )


def convert_resnet(sd, out, torch_prefix=""):
    """torchvision/mmcv ResNet (incl. V1d deep stem / ResNeXt) -> backbone entries."""
    p = torch_prefix
    if p + "stem.0.weight" in sd:
        # mmcv ResNetV1d deep stem: Sequential(conv,bn,relu x3) -> stem.{0,1,3,4,6,7}
        for i, idx in enumerate((0, 3, 6), start=1):
            out[("params", "backbone", f"stem_conv{i}", "kernel")] = t2f_conv(
                sd[p + f"stem.{idx}.weight"]
            )
            _bn(out, ("backbone", f"stem_bn{i}"), sd, p + f"stem.{idx + 1}")
    else:
        out[("params", "backbone", "conv1", "kernel")] = t2f_conv(sd[p + "conv1.weight"])
        _bn(out, ("backbone", "bn1"), sd, p + "bn1")
    layer_re = re.compile(r"^layer(\d+)\.(\d+)\.(.*)$")
    seen = set()
    for k in sd:
        kk = k[len(p):] if p and k.startswith(p) else k
        m = layer_re.match(kk)
        if not m:
            continue
        stage, block = int(m.group(1)), int(m.group(2))
        seen.add((stage, block))
    for stage, block in sorted(seen):
        tp = f"{p}layer{stage}.{block}."
        fp = ("backbone", f"layer{stage}_{block}")
        for ci in (1, 2, 3):
            wkey = tp + f"conv{ci}.weight"
            if wkey not in sd:
                continue  # basic blocks have conv1/conv2 only
            out[("params",) + fp + (f"conv{ci}", "kernel")] = t2f_conv(sd[wkey])
            _bn(out, fp + (f"bn{ci}",), sd, tp + f"bn{ci}")
        # ResNeSt SplitAttentionConv2d: conv2.{conv,bn0,fc1,bn1,fc2}
        # (reference resnest.py:86-108)
        if tp + "conv2.conv.weight" in sd:
            sa = fp + ("conv2",)
            out[("params",) + sa + ("conv", "kernel")] = t2f_conv(
                sd[tp + "conv2.conv.weight"]
            )
            _bn(out, sa + ("bn0",), sd, tp + "conv2.bn0")
            _bn(out, sa + ("bn1",), sd, tp + "conv2.bn1")
            for fc in ("fc1", "fc2"):
                out[("params",) + sa + (fc, "kernel")] = t2f_conv(
                    sd[tp + f"conv2.{fc}.weight"]
                )
                out[("params",) + sa + (fc, "bias")] = np.asarray(
                    sd[tp + f"conv2.{fc}.bias"]
                )
        # Res2Net Bottle2neck per-scale 3x3s: convs.{i}/bns.{i} ModuleLists
        si = 0
        while tp + f"convs.{si}.weight" in sd:
            out[("params",) + fp + (f"convs_{si}", "kernel")] = t2f_conv(
                sd[tp + f"convs.{si}.weight"]
            )
            _bn(out, fp + (f"bns_{si}",), sd, tp + f"bns.{si}")
            si += 1
        if tp + "downsample.0.weight" in sd:
            out[("params",) + fp + ("downsample_conv", "kernel")] = t2f_conv(
                sd[tp + "downsample.0.weight"]
            )
            _bn(out, fp + ("downsample_bn",), sd, tp + "downsample.1")
        elif tp + "downsample.1.weight" in sd:
            # avg_down layout: Sequential(AvgPool2d, Conv2d, BN)
            out[("params",) + fp + ("downsample_conv", "kernel")] = t2f_conv(
                sd[tp + "downsample.1.weight"]
            )
            _bn(out, fp + ("downsample_bn",), sd, tp + "downsample.2")


def convert_mmdet_detector(sd, out):
    """Full RADet mmdet checkpoint -> params/batch_stats entries."""
    convert_resnet(sd, out, torch_prefix="backbone.")
    # FPN: lateral_convs.{i}.conv + fpn_convs.{i}.conv (3,4 = extra)
    for k in list(sd):
        m = re.match(r"^neck\.lateral_convs\.(\d+)\.conv\.(weight|bias)$", k)
        if m:
            i, wb = int(m.group(1)), m.group(2)
            name = ("neck", f"lateral_{i}", "kernel" if wb == "weight" else "bias")
            out[("params",) + name] = t2f_conv(sd[k]) if wb == "weight" else np.asarray(sd[k])
        m = re.match(r"^neck\.fpn_convs\.(\d+)\.conv\.(weight|bias)$", k)
        if m:
            i, wb = int(m.group(1)), m.group(2)
            mod = f"fpn_{i}" if i < 3 else f"fpn_extra_{i - 3}"
            name = ("neck", mod, "kernel" if wb == "weight" else "bias")
            out[("params",) + name] = t2f_conv(sd[k]) if wb == "weight" else np.asarray(sd[k])
    # head towers: bbox_head.cls_convs.{i}.conv/.gn, reg_convs...
    for branch in ("cls", "reg"):
        for k in list(sd):
            m = re.match(rf"^bbox_head\.{branch}_convs\.(\d+)\.conv\.weight$", k)
            if m:
                i = int(m.group(1))
                out[("params", "bbox_head", f"{branch}_conv_{i}", "conv", "kernel")] = t2f_conv(sd[k])
            m = re.match(rf"^bbox_head\.{branch}_convs\.(\d+)\.gn\.(weight|bias)$", k)
            if m:
                i, wb = int(m.group(1)), m.group(2)
                out[
                    ("params", "bbox_head", f"{branch}_conv_{i}", "gn",
                     "scale" if wb == "weight" else "bias")
                ] = np.asarray(sd[k])
    heads = dict(atss_cls="conv_cls", atss_reg="conv_reg", atss_centerness="conv_iou")
    for tname, fname in heads.items():
        out[("params", "bbox_head", fname, "kernel")] = t2f_conv(sd[f"bbox_head.{tname}.weight"])
        out[("params", "bbox_head", fname, "bias")] = np.asarray(sd[f"bbox_head.{tname}.bias"])
    scales = []
    i = 0
    while f"bbox_head.scales.{i}.scale" in sd:
        scales.append(float(np.asarray(sd[f"bbox_head.scales.{i}.scale"])))
        i += 1
    if scales:
        out[("params", "bbox_head", "scales")] = np.asarray(scales, np.float32)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("torch_ckpt", help=".pth file (torchvision resnet or mmdet RADet)")
    p.add_argument("output", help="output orbax checkpoint directory")
    p.add_argument("--kind", choices=["auto", "resnet", "radet"], default="auto")
    args = p.parse_args()

    import torch

    ckpt = torch.load(args.torch_ckpt, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}

    kind = args.kind
    if kind == "auto":
        kind = "radet" if any(k.startswith("bbox_head.") for k in sd) else "resnet"

    flat = {}
    if kind == "resnet":
        convert_resnet(sd, flat)
    else:
        convert_mmdet_detector(sd, flat)

    import flax

    tree = flax.traverse_util.unflatten_dict(flat)
    from radet_tpu.engine.checkpoint import save_weights

    save_weights(args.output, tree)
    print(f"wrote {len(flat)} arrays ({kind}) to {args.output}")


if __name__ == "__main__":
    main()
