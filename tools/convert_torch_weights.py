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


def _convbn(out, flax_prefix, sd, conv_key, bn_prefix):
    """One bias-free conv + BN pair (mmcv ConvModule layout)."""
    out[("params", "backbone", flax_prefix[0], "kernel")] = t2f_conv(sd[conv_key])
    _bn(out, ("backbone", flax_prefix[1]), sd, bn_prefix)


def convert_darknet(sd, out, torch_prefix=""):
    """mmdet Darknet-53 state_dict -> backbone entries (ConvModule layout:
    .conv/.bn submodules; reference darknet.py:112-121 naming)."""
    p = torch_prefix
    _convbn(out, ("conv1", "bn1"), sd, p + "conv1.conv.weight", p + "conv1.bn")
    i = 1
    while p + f"conv_res_block{i}.conv.conv.weight" in sd:
        base = p + f"conv_res_block{i}."
        _convbn(out, (f"crb{i}_conv", f"crb{i}_bn"), sd,
                base + "conv.conv.weight", base + "conv.bn")
        j = 0
        while base + f"res{j}.conv1.conv.weight" in sd:
            for c in (1, 2):
                _convbn(out, (f"crb{i}_res{j}_conv{c}", f"crb{i}_res{j}_bn{c}"),
                        sd, base + f"res{j}.conv{c}.conv.weight",
                        base + f"res{j}.conv{c}.bn")
            j += 1
        i += 1


def convert_hrnet(sd, out, torch_prefix=""):
    """mmdet HRNet state_dict -> backbone entries (reference hrnet.py
    naming: stem conv1/bn1/conv2/bn2, layer1 Bottlenecks, transition{t},
    stage{s}.{m}.branches/fuse_layers)."""
    p = torch_prefix
    for c in (1, 2):
        out[("params", "backbone", f"conv{c}", "kernel")] = t2f_conv(
            sd[p + f"conv{c}.weight"]
        )
        _bn(out, ("backbone", f"bn{c}"), sd, p + f"bn{c}")
    # layer1 bottlenecks (+ downsample)
    b = 0
    while p + f"layer1.{b}.conv1.weight" in sd:
        tp = p + f"layer1.{b}."
        fp = ("backbone", f"layer1_{b}")
        for ci in (1, 2, 3):
            out[("params",) + fp + (f"conv{ci}", "kernel")] = t2f_conv(
                sd[tp + f"conv{ci}.weight"]
            )
            _bn(out, fp + (f"bn{ci}",), sd, tp + f"bn{ci}")
        if tp + "downsample.0.weight" in sd:
            out[("params",) + fp + ("downsample_conv", "kernel")] = t2f_conv(
                sd[tp + "downsample.0.weight"]
            )
            _bn(out, fp + ("downsample_bn",), sd, tp + "downsample.1")
        b += 1
    # transitions: direct Sequential(conv, bn, relu) or chains of those
    tr = re.compile(rf"^{re.escape(p)}transition(\d+)\.(\d+)\.0\.weight$")
    trc = re.compile(rf"^{re.escape(p)}transition(\d+)\.(\d+)\.(\d+)\.0\.weight$")
    for k in list(sd):
        m = tr.match(k)
        if m:
            t, i = m.group(1), m.group(2)
            base = p + f"transition{t}.{i}."
            _convbn(out, (f"transition{t}_{i}_conv", f"transition{t}_{i}_bn"),
                    sd, base + "0.weight", base + "1")
        m = trc.match(k)
        if m:
            t, i, j = m.group(1), m.group(2), m.group(3)
            base = p + f"transition{t}.{i}.{j}."
            _convbn(out, (f"transition{t}_{i}_{j}_conv", f"transition{t}_{i}_{j}_bn"),
                    sd, base + "0.weight", base + "1")
    # stages: branches (BasicBlocks) + fuse layers
    br = re.compile(
        rf"^{re.escape(p)}stage(\d+)\.(\d+)\.branches\.(\d+)\.(\d+)\.conv1\.weight$"
    )
    for k in list(sd):
        m = br.match(k)
        if not m:
            continue
        s, mm, bb, blk = m.groups()
        tp = p + f"stage{s}.{mm}.branches.{bb}.{blk}."
        fp = ("backbone", f"s{s}m{mm}_branch{bb}_block{blk}")
        for ci in (1, 2):
            out[("params",) + fp + (f"conv{ci}", "kernel")] = t2f_conv(
                sd[tp + f"conv{ci}.weight"]
            )
            _bn(out, fp + (f"bn{ci}",), sd, tp + f"bn{ci}")
        if tp + "downsample.0.weight" in sd:
            out[("params",) + fp + ("downsample_conv", "kernel")] = t2f_conv(
                sd[tp + "downsample.0.weight"]
            )
            _bn(out, fp + ("downsample_bn",), sd, tp + "downsample.1")
    fu = re.compile(
        rf"^{re.escape(p)}stage(\d+)\.(\d+)\.fuse_layers\.(\d+)\.(\d+)\.0\.weight$"
    )
    fuc = re.compile(
        rf"^{re.escape(p)}stage(\d+)\.(\d+)\.fuse_layers\.(\d+)\.(\d+)\.(\d+)\.0\.weight$"
    )
    for k in list(sd):
        m = fu.match(k)
        if m:
            s, mm, i, j = m.groups()
            base = p + f"stage{s}.{mm}.fuse_layers.{i}.{j}."
            _convbn(out, (f"s{s}m{mm}_fuse{i}_{j}_conv", f"s{s}m{mm}_fuse{i}_{j}_bn"),
                    sd, base + "0.weight", base + "1")
        m = fuc.match(k)
        if m:
            s, mm, i, j, kk = m.groups()
            base = p + f"stage{s}.{mm}.fuse_layers.{i}.{j}.{kk}."
            _convbn(out, (f"s{s}m{mm}_fuse{i}_{j}_{kk}_conv",
                          f"s{s}m{mm}_fuse{i}_{j}_{kk}_bn"),
                    sd, base + "0.weight", base + "1")


def convert_ssd_vgg(sd, out, torch_prefix=""):
    """SSDVGG state_dict -> backbone entries (reference ssd_vgg.py:
    features.{i} biased convs, extra.{i}, l2_norm.weight)."""
    p = torch_prefix
    for k in list(sd):
        m = re.match(rf"^{re.escape(p)}features\.(\d+)\.(weight|bias)$", k)
        if m:
            i, wb = m.group(1), m.group(2)
            out[("params", "backbone", f"features_{i}",
                 "kernel" if wb == "weight" else "bias")] = (
                t2f_conv(sd[k]) if wb == "weight" else np.asarray(sd[k])
            )
        m = re.match(rf"^{re.escape(p)}extra\.(\d+)\.(weight|bias)$", k)
        if m:
            i, wb = m.group(1), m.group(2)
            out[("params", "backbone", f"extra_{i}",
                 "kernel" if wb == "weight" else "bias")] = (
                t2f_conv(sd[k]) if wb == "weight" else np.asarray(sd[k])
            )
    out[("params", "backbone", "l2_norm_weight")] = np.asarray(
        sd[p + "l2_norm.weight"]
    )


def _basic_block(out, fp, sd, tp):
    """One mmdet BasicBlock (conv1/bn1/conv2/bn2 + optional downsample)."""
    for ci in (1, 2):
        out[("params",) + fp + (f"conv{ci}", "kernel")] = t2f_conv(
            sd[tp + f"conv{ci}.weight"]
        )
        _bn(out, fp + (f"bn{ci}",), sd, tp + f"bn{ci}")
    if tp + "downsample.0.weight" in sd:
        out[("params",) + fp + ("downsample_conv", "kernel")] = t2f_conv(
            sd[tp + "downsample.0.weight"]
        )
        _bn(out, fp + ("downsample_bn",), sd, tp + "downsample.1")


def convert_hourglass(sd, out, torch_prefix=""):
    """HourglassNet state_dict -> backbone entries (reference hourglass.py:
    stem ConvModule + ResLayer, recursive hourglass_modules.{i}.{up1,low1,
    low2,low3}, inters/conv1x1s/out_convs/remap_convs ModuleLists)."""
    p = torch_prefix
    _convbn(out, ("stem_conv", "stem_bn"), sd, p + "stem.0.conv.weight",
            p + "stem.0.bn")
    _basic_block(out, ("backbone", "stem_res0"), sd, p + "stem.1.0.")

    def convert_hg(tprefix, fprefix):
        """Recursively convert one HourglassModule."""
        for branch in ("up1", "low1", "low3"):
            b = 0
            while tprefix + f"{branch}.{b}.conv1.weight" in sd:
                _basic_block(out, fprefix + (f"{branch}_{b}",), sd,
                             tprefix + f"{branch}.{b}.")
                b += 1
        if tprefix + "low2.up1.0.conv1.weight" in sd:  # recursive case
            convert_hg(tprefix + "low2.", fprefix + ("low2",))
        else:
            b = 0
            while tprefix + f"low2.{b}.conv1.weight" in sd:
                _basic_block(out, fprefix + (f"low2_{b}",), sd,
                             tprefix + f"low2.{b}.")
                b += 1

    ind = 0
    while p + f"hourglass_modules.{ind}.up1.0.conv1.weight" in sd:
        convert_hg(p + f"hourglass_modules.{ind}.", ("backbone", f"hg{ind}"))
        _convbn(out, (f"out_conv{ind}_conv", f"out_conv{ind}_bn"), sd,
                p + f"out_convs.{ind}.conv.weight", p + f"out_convs.{ind}.bn")
        if p + f"conv1x1s.{ind}.conv.weight" in sd:
            _convbn(out, (f"conv1x1_{ind}_conv", f"conv1x1_{ind}_bn"), sd,
                    p + f"conv1x1s.{ind}.conv.weight", p + f"conv1x1s.{ind}.bn")
            _convbn(out, (f"remap{ind}_conv", f"remap{ind}_bn"), sd,
                    p + f"remap_convs.{ind}.conv.weight",
                    p + f"remap_convs.{ind}.bn")
            _basic_block(out, ("backbone", f"inter{ind}"), sd,
                         p + f"inters.{ind}.")
        ind += 1


def convert_detectors_resnet(sd, out, torch_prefix=""):
    """DetectoRS ResNet (SAC blocks + optional rfp convs) -> backbone
    entries.  Plain layers go through convert_resnet; SAC conv2 blocks
    (mmcv SAConv2d params: weight/weight_diff/weight_gamma/weight_beta +
    switch/pre_context/post_context 1x1s) are remapped afterwards."""
    p = torch_prefix
    convert_resnet(sd, out, torch_prefix=p)
    sac_re = re.compile(rf"^{re.escape(p)}layer(\d+)\.(\d+)\.conv2\.weight_diff$")
    for k in list(sd):
        m = sac_re.match(k)
        if not m:
            continue
        stage, block = m.group(1), m.group(2)
        tp = p + f"layer{stage}.{block}.conv2."
        fp = ("params", "backbone", f"layer{stage}_{block}", "conv2")
        # the plain-conv mapping wrote conv2/kernel; SAC stores it as 'weight'
        out.pop(fp[:3] + ("conv2", "kernel"), None)
        out[fp + ("weight",)] = t2f_conv(sd[tp + "weight"])
        out[fp + ("weight_diff",)] = t2f_conv(sd[tp + "weight_diff"])
        out[fp + ("weight_gamma",)] = np.asarray(sd[tp + "weight_gamma"]).reshape(-1)
        out[fp + ("weight_beta",)] = np.asarray(sd[tp + "weight_beta"]).reshape(-1)
        for sub in ("switch", "pre_context", "post_context"):
            out[fp + (sub, "kernel")] = t2f_conv(sd[tp + f"{sub}.weight"])
            out[fp + (sub, "bias")] = np.asarray(sd[tp + f"{sub}.bias"])
    rfp_re = re.compile(rf"^{re.escape(p)}layer(\d+)\.0\.rfp_conv\.weight$")
    for k in list(sd):
        m = rfp_re.match(k)
        if not m:
            continue
        stage = m.group(1)
        fp = ("params", "backbone", f"layer{stage}_0", "rfp_conv")
        out[fp + ("kernel",)] = t2f_conv(sd[k])
        out[fp + ("bias",)] = np.asarray(sd[p + f"layer{stage}.0.rfp_conv.bias"])


def convert_trident_resnet(sd, out, torch_prefix=""):
    """TridentResNet -> backbone entries: plain stem/stage1-2 via
    convert_resnet, trident stage-3 conv2 (TridentConv shared 'weight')
    remapped to the block-level conv2_kernel param."""
    p = torch_prefix
    convert_resnet(sd, out, torch_prefix=p)
    tri_re = re.compile(rf"^{re.escape(p)}layer3\.(\d+)\.conv2\.weight$")
    for k in list(sd):
        m = tri_re.match(k)
        if not m:
            continue
        block = m.group(1)
        fp3 = ("params", "backbone", f"layer3_{block}")
        out.pop(fp3 + ("conv2", "kernel"), None)
        out[fp3 + ("conv2_kernel",)] = t2f_conv(sd[k])


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
