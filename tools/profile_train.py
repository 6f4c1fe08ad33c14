#!/usr/bin/env python
"""Training-step efficiency accounting (VERDICT r1 item 4).

Times the production train step (flagship r50 @ 480x640, bf16, batch 16 by
default) and its components on the current backend, and reports training MFU
from the compiled HLO's own FLOP count:

  - full train_step (fwd + on-device assignment + loss + bwd + AdamW),
  - the assignment scan alone (core/assignment.py lax.scan over MAX_GT),
  - forward+loss without gradients,
  - bare model forward,

Steady-state timing dispatches N iterations and blocks once at the end (the
axon tunnel adds ~28 ms per blocking round trip — per-iter readbacks lie).

Usage:
  JAX_PLATFORMS=... python tools/profile_train.py [--batch 16] [--iters 30]
      [--peak-tflops 197] [--trace-dir /tmp/trace] [--depth 50] [--cpu]
"""

import argparse
import json
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--depth", type=int, default=50)
    p.add_argument("--input-size", type=int, nargs=2, default=(480, 640))
    p.add_argument("--num-classes", type=int, default=21)
    p.add_argument("--max-gt", type=int, default=32)
    p.add_argument(
        "--peak-tflops",
        type=float,
        default=197.0,
        help="chip peak (bf16) for MFU; v5e=197, v5p=459, v4=275",
    )
    p.add_argument("--trace-dir", default=None, help="write a jax.profiler trace here")
    p.add_argument("--cpu", action="store_true", help="force CPU (debug)")
    p.add_argument(
        "--frozen-int8", action="store_true",
        help="backbone.frozen_int8: the frozen stem+layer1 runs the "
        "int8_stream deploy arithmetic in the train forward "
        "(configs/bop/r50_ycbv_pbr_frozen_int8.py)",
    )
    p.add_argument(
        "--step-only",
        action="store_true",
        help="time only the full train step (one compile instead of four; "
        "the component breakdown is skipped) — fits a tunnel-compile budget",
    )
    return p.parse_args()


def _steady_ms(fn, n, *args, rebind_state=False, state=None):
    """Dispatch n iterations, block once; returns ms/iter."""
    import jax

    # warmup/compile
    if rebind_state:
        st = fn(state, *args)
        jax.block_until_ready(st[0].params)
        t0 = time.time()
        for _ in range(n):
            st = fn(st[0], *args)
        jax.block_until_ready(st[0].params)
    else:
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
    return (time.time() - t0) / n * 1e3, (st[0] if rebind_state else None)


def main():
    args = parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    import jax.numpy as jnp
    import numpy as np

    import radet_tpu  # noqa: F401 — applies JAX_PLATFORMS before backend init
    from radet_tpu.core.anchors import generate_anchors
    from radet_tpu.engine.optim import build_optimizer
    from radet_tpu.engine.train_step import TrainState, build_train_step
    from radet_tpu.models.builder import build_detector
    from radet_tpu.models.detector import preprocess_images

    h, w = args.input_size
    b = args.batch
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    model_cfg = dict(
        type="RADet",
        backbone=dict(
            depth=args.depth, out_indices=(0, 1, 2, 3), frozen_stages=1,
            norm_eval=True, frozen_int8=args.frozen_int8,
        ),
        neck=dict(out_channels=256, start_level=1, num_outs=5),
        bbox_head=dict(
            num_classes=args.num_classes,
            in_channels=256,
            stacked_convs=4,
            feat_channels=256,
        ),
    )
    model = build_detector(model_cfg, dtype="bfloat16")
    anchors, ranges, strides, counts = generate_anchors((h, w))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3), jnp.float32), train=False
    )
    params = variables["params"]
    tx, _ = build_optimizer(
        dict(type="adamw", lr=4e-4, weight_decay=0.05),
        dict(max_lr=4e-4, total_steps=100100, pct_start=0.05),
        dict(max_norm=35.0),
        params,
        frozen_stages=1,
    )
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
    )
    img_norm = dict(mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375])
    assignment_cfg = dict(positive_num=10, neg_threshold=0.2, balance_sample=True)
    train_step = build_train_step(
        model,
        tx,
        anchors,
        ranges,
        img_norm=img_norm,
        num_classes=args.num_classes,
        assignment_cfg=assignment_cfg,
    )

    n_anchor = anchors.shape[0]
    rs = np.random.RandomState(0)
    g = args.max_gt
    batch = dict(
        image=jnp.asarray(rs.randint(0, 255, (b, h, w, 3), np.uint8)),
        gt_boxes=jnp.asarray(
            np.tile(np.asarray([[40, 40, 200, 200]], np.float32), (b, g, 1))
            + rs.rand(b, g, 1).astype(np.float32) * 50
        ),
        gt_labels=jnp.asarray(rs.randint(0, args.num_classes, (b, g), dtype=np.int32)),
        gt_valid=jnp.asarray(np.tile([True] * 8 + [False] * (g - 8), (b, 1))),
        dist_vals=jnp.asarray(rs.rand(b, n_anchor, g).astype(np.float16)),
    )
    key = jax.random.PRNGKey(1)

    # ---- component jits ---------------------------------------------------
    from radet_tpu.core.assignment import assign_labels
    from radet_tpu.models.detector import flatten_head_outputs
    from radet_tpu.models.radet_loss import radet_loss

    anchors_j = jnp.asarray(anchors)
    ranges_j = jnp.asarray(ranges)

    @jax.jit
    def assign_only(k, batch):
        keys = jax.random.split(k, b)
        return jax.vmap(
            lambda kk, gb, gv, dv: assign_labels(
                kk, anchors_j, ranges_j, gb, gv, dv, **assignment_cfg
            )
        )(keys, batch["gt_boxes"], batch["gt_valid"], batch["dist_vals"])

    @jax.jit
    def fwd_only(params, batch_stats, images):
        x = preprocess_images(images, img_norm["mean"], img_norm["std"], jnp.bfloat16)
        return model.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=True,
            mutable=["batch_stats"],
        )[0]

    @jax.jit
    def fwd_loss(params, batch_stats, batch, assign):
        x = preprocess_images(batch["image"], img_norm["mean"], img_norm["std"], jnp.bfloat16)
        outs, _ = model.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=True,
            mutable=["batch_stats"],
        )
        cls_flat, reg_flat, iou_flat = flatten_head_outputs(*outs)
        losses = radet_loss(
            cls_flat, reg_flat, iou_flat, anchors_j,
            batch["gt_boxes"], batch["gt_labels"], assign.gt_idx, assign.weight,
            num_classes=args.num_classes,
        )
        return losses["loss_cls"] + losses["loss_bbox"] + losses["loss_iou"]

    # ---- FLOP accounting from the compiled HLO ----------------------------
    # lower+compile on the SAME jit instance: the compilation is cached and
    # reused by the timing loop below (no second compile)
    compiled = train_step.lower(state, batch, key).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    step_flops = float(ca.get("flops", -1)) if ca else -1.0

    # ---- timings -----------------------------------------------------------
    if args.step_only:
        t_assign = t_fwd = t_fwdloss = float("nan")
    else:
        t_assign, _ = _steady_ms(lambda: assign_only(key, batch), args.iters)
        assign_out = assign_only(key, batch)
        t_fwd, _ = _steady_ms(
            lambda: fwd_only(state.params, state.batch_stats, batch["image"]),
            args.iters,
        )
        t_fwdloss, _ = _steady_ms(
            lambda: fwd_loss(state.params, state.batch_stats, batch, assign_out),
            args.iters,
        )
    t_step, state = _steady_ms(
        lambda st: train_step(st, batch, key), args.iters, rebind_state=True, state=state
    )

    if args.trace_dir:
        jax.profiler.start_trace(args.trace_dir)
        st2, _ = train_step(state, batch, key)
        jax.block_until_ready(st2.params)
        jax.profiler.stop_trace()
        print(f"trace written to {args.trace_dir}")
        state = st2

    mfu = (
        step_flops / (t_step / 1e3) / (args.peak_tflops * 1e12)
        if step_flops > 0
        else -1.0
    )
    img_s = b / (t_step / 1e3)
    out = dict(
        batch=b,
        input_size=[h, w],
        step_ms=round(t_step, 2),
        img_per_s=round(img_s, 1),
        fwd_ms=None if args.step_only else round(t_fwd, 2),
        fwd_loss_ms=None if args.step_only else round(t_fwdloss, 2),
        bwd_opt_ms=None if args.step_only else round(t_step - t_fwdloss - t_assign, 2),
        assign_ms=None if args.step_only else round(t_assign, 2),
        assign_frac=None if args.step_only else round(t_assign / t_step, 4),
        step_tflops=round(step_flops / 1e12, 3) if step_flops > 0 else None,
        mfu=round(mfu, 4) if mfu > 0 else None,
        peak_tflops=args.peak_tflops,
    )
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
