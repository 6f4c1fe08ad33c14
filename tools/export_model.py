#!/usr/bin/env python
"""Export the compiled inference step as a serialized StableHLO artifact.

The TPU-native analog of the reference's ONNX export
(/root/reference/radet/core/export/pytorch2onnx.py): the full batched
inference function (uint8 normalize -> backbone/FPN/head -> decode ->
vote-NMS) is traced once with static shapes and serialized via jax.export;
the artifact can be reloaded (jax.export.deserialize) and invoked from any
JAX process, or fed to downstream StableHLO toolchains.
"""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("output", help="output .stablehlo file")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--platform", default=None, help="lowering platform (cpu/tpu); default = current backend")
    p.add_argument("--cfg-options", nargs="+", default=None)
    p.add_argument("--verify", action="store_true", help="roundtrip-deserialize and run")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from radet_tpu.apis.common import build_model_and_anchors, init_variables, normalizer_from_cfg
    from radet_tpu.engine.checkpoint import load_weights
    from radet_tpu.engine.train_step import build_infer_step
    from radet_tpu.utils import Config, get_root_logger

    logger = get_root_logger()
    cfg = Config.fromfile(args.config, args.cfg_options)
    model, anchors, ranges, counts = build_model_and_anchors(cfg)
    h, w = tuple(cfg.get("input_size", (480, 640)))
    variables = init_variables(model, (h, w))
    if args.checkpoint:
        variables = load_weights(args.checkpoint, template=variables)

    infer = build_infer_step(
        model,
        anchors,
        counts,
        img_norm=cfg.img_norm_cfg.to_dict(),
        test_cfg=cfg.test_cfg.to_dict(),
        normalizer=normalizer_from_cfg(cfg),
    )

    b = args.batch_size

    def fn(images, shapes, scales):
        det = infer(variables, images, shapes, scales)
        return det.boxes, det.scores, det.labels, det.valid

    example = (
        jnp.zeros((b, h, w, 3), jnp.uint8),
        jnp.zeros((b, 2), jnp.float32),
        jnp.ones((b, 4), jnp.float32),
    )
    platforms = [args.platform] if args.platform else None
    exported = jax.export.export(jax.jit(fn), platforms=platforms)(*example)
    blob = exported.serialize()
    with open(args.output, "wb") as f:
        f.write(blob)
    logger.info(
        f"exported {len(blob) / 1e6:.1f} MB StableHLO artifact to {args.output} "
        f"(batch {b}, input {h}x{w}, platforms {exported.platforms})"
    )

    if args.verify:
        restored = jax.export.deserialize(bytearray(blob))
        outs = restored.call(*example)
        logger.info(
            f"roundtrip ok: boxes {np.asarray(outs[0]).shape}, "
            f"valid count {int(np.asarray(outs[3]).sum())}"
        )


if __name__ == "__main__":
    main()
