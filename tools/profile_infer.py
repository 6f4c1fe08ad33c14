#!/usr/bin/env python
"""Inference-pipeline profiling: per-op / per-module HLO breakdown + roofline.

Captures an xprof trace of the full compiled inference step (preprocess ->
backbone/FPN/head -> decode -> vote-NMS) on the current backend, then
aggregates the HLO-stats into:

  - time by module (backbone layers / neck / head / postprocess),
  - the top-N ops with achieved TFLOP/s, memory BW, and bound-by,
  - a roofline summary: measured total vs the lower bound where every
    compute-bound op runs at peak TFLOP/s and every HBM-bound op at peak
    bandwidth (how much headroom scheduling could still recover).

This is the instrument behind the round-2 findings (gather fusions costing
ms at 0 FLOPs; head towers at 97% MXU peak; see docs/DESIGN.md §8-9).

Usage:
  python tools/profile_infer.py [--batch 128] [--trace-dir /tmp/infer_trace]
      [--top 25] [--peak-tflops 197] [--peak-bw-gbs 819] [--cpu]
"""

import argparse
import glob
import json
import os
import os.path as osp
import re
import sys
from collections import defaultdict

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--input-size", type=int, nargs=2, default=(480, 640))
    p.add_argument("--trace-dir", default="/tmp/radet_infer_trace")
    p.add_argument("--iters", type=int, default=3, help="traced iterations")
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--peak-tflops", type=float, default=197.0, help="v5e bf16 peak")
    p.add_argument("--peak-bw-gbs", type=float, default=819.0, help="v5e HBM GB/s")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--quant", default=None,
                   choices=["int8", "int8_full", "int8_stream"],
                   help="profile a quantized deploy variant: 'int8' = head "
                   "tower only, 'int8_full' = head + backbone trunk, "
                   "'int8_stream' = trunk + int8 residual stream")
    return p.parse_args()


def capture_trace(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import IMG_NORM, TEST_CFG, _flagship
    from radet_tpu.engine.train_step import build_infer_step

    h, w = args.input_size
    model, anchors, ranges, counts = _flagship((h, w), quant=args.quant)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3), jnp.float32), train=False
    )
    infer = build_infer_step(
        model, anchors, counts, img_norm=IMG_NORM, test_cfg=TEST_CFG
    )
    rs = np.random.RandomState(0)
    images = jax.device_put(rs.randint(0, 255, (args.batch, h, w, 3), np.uint8))
    shapes = jax.device_put(np.full((args.batch, 2), [h, w], np.float32))
    scales = jax.device_put(np.ones((args.batch, 4), np.float32))

    @jax.jit
    def step(v, u8, sh, sc):
        det = infer(v, u8, sh, sc)
        return det.boxes.sum() + det.scores.sum() + det.valid.sum()

    float(step(variables, images, shapes, scales))  # compile
    float(step(variables, images, shapes, scales))
    jax.profiler.start_trace(args.trace_dir)
    last = None
    for _ in range(args.iters):
        last = step(variables, images, shapes, scales)
    float(last)
    jax.profiler.stop_trace()


def module_of(fw_name: str) -> str:
    m = re.search(r"RADet/(backbone/[a-z0-9_]+|neck|bbox_head)", fw_name)
    if m:
        mod = m.group(1)
        if mod.startswith("backbone/layer"):
            return "backbone/" + mod.split("/")[1].split("_")[0]
        return mod.split("/")[0] if mod == "neck" else mod
    if "RADet" in fw_name:
        return "backbone/other"
    return "postprocess"


def analyze(args):
    from xprof.convert import raw_to_tool_data as r2t

    files = glob.glob(
        osp.join(args.trace_dir, "**", "*.xplane.pb"), recursive=True
    )
    assert files, f"no trace found under {args.trace_dir}"
    data, _ = r2t.xspace_to_tool_data(sorted(files)[-1:], "hlo_stats", {})
    d = json.loads(data)
    rows = d["rows"]

    def val(r, i):
        return r["c"][i].get("v")

    # columns: 2=category 5=framework-op 9=total-self-us 14=model GFLOP/s
    # 16=measured BW GiB/s 21=bound-by
    n_it = args.iters
    total = 0.0
    ideal = 0.0
    by_mod = defaultdict(float)
    ops = []
    for r in rows:
        t_us = (val(r, 9) or 0.0) / n_it
        if t_us <= 0:
            continue
        total += t_us
        fw = val(r, 5) or ""
        by_mod[module_of(fw)] += t_us
        gfs = (val(r, 14) or 0.0) * 1e9
        bw = (val(r, 16) or 0.0) * (1024 ** 3)
        flops = gfs * t_us * 1e-6
        bytes_ = bw * t_us * 1e-6
        id_us = max(
            flops / (args.peak_tflops * 1e12),
            bytes_ / (args.peak_bw_gbs * 1e9),
        ) * 1e6
        ideal += min(id_us, t_us) if id_us > 0 else t_us
        ops.append((t_us, val(r, 2), fw[:100], gfs / 1e12, bw / 2 ** 30, val(r, 21)))

    print(f"\n== inference step: {total / 1000:.1f} ms/iter (batch {args.batch}) ==")
    print(
        f"roofline lower bound: {ideal / 1000:.1f} ms "
        f"(headroom {total / max(ideal, 1e-9):.2f}x)\n"
    )
    print("-- by module --")
    for k, v in sorted(by_mod.items(), key=lambda x: -x[1]):
        print(f"{v / 1000:8.2f} ms  {100 * v / total:5.1f}%  {k}")
    print(f"\n-- top {args.top} ops --")
    print("    ms   TFLOP/s  BW GiB/s  bound    op")
    for t_us, cat, fw, tf, bw, bound in sorted(ops, key=lambda x: -x[0])[: args.top]:
        print(f"{t_us / 1000:7.2f}  {tf:7.1f}  {bw:8.0f}  {str(bound):<8} {fw}")


def main():
    args = parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    capture_trace(args)
    analyze(args)


if __name__ == "__main__":
    main()
