#!/usr/bin/env python
"""Report model FLOPs/params (the reference's forward_dummy + get_flops
capability, single_stage.py:59-68) via XLA cost analysis."""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--cfg-options", nargs="+", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from radet_tpu.apis.common import build_model_and_anchors, init_variables
    from radet_tpu.utils import Config

    cfg = Config.fromfile(args.config, args.cfg_options)
    model, anchors, ranges, counts = build_model_and_anchors(cfg)
    h, w = tuple(cfg.get("input_size", (480, 640)))
    variables = init_variables(model, (h, w))
    n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))

    def fwd(v, x):
        return model.apply(v, x, train=False)

    x = jnp.zeros((args.batch_size, h, w, 3), jnp.float32)
    lowered = jax.jit(fwd).lower(variables, x)
    cost = lowered.compile().cost_analysis()
    # some JAX versions return a single-element list of dicts
    if isinstance(cost, (list, tuple)):
        cost = cost[0] if cost else None
    flops = cost.get("flops", float("nan")) if cost else float("nan")
    print(f"input: {args.batch_size}x{h}x{w}x3")
    print(f"params: {n_params / 1e6:.2f} M")
    print(f"flops:  {flops / 1e9:.2f} GFLOPs (batch {args.batch_size})")
    if args.batch_size > 1:
        print(f"        {flops / 1e9 / args.batch_size:.2f} GFLOPs/image")


if __name__ == "__main__":
    main()
