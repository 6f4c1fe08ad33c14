#!/usr/bin/env python
"""Train a detector from a config file.

CLI parity with the reference tools/train.py (--config, --work-dir,
--resume-from, --seed, --cfg-options deep overrides;
/root/reference/tools/train.py:22-86). Launcher flags are unnecessary: jax
distributed init + the device mesh replace DDP process groups.
"""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from radet_tpu.apis.train import train_detector
from radet_tpu.utils import Config, get_root_logger


def parse_args():
    p = argparse.ArgumentParser(description="Train a RADet-TPU detector")
    p.add_argument("config", help="config file path")
    p.add_argument("--work-dir", help="dir to save logs and checkpoints")
    p.add_argument("--resume-from", nargs="?", const="auto", default=None,
                   help="resume from the latest checkpoint in work_dir")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--max-iters", type=int, default=None, help="override runner.max_iters")
    p.add_argument("--no-validate", action="store_true", help="skip eval during training")
    p.add_argument(
        "--cfg-options",
        "--options",  # deprecated alias kept for reference-CLI parity
        nargs="+",
        default=None,
        help="override config entries, e.g. data.samples_per_gpu=8",
    )
    # reference-CLI compatibility (GPU/launcher mechanics without a TPU
    # equivalent; XLA runs are deterministic given --seed already):
    p.add_argument("--deterministic", action="store_true", help=argparse.SUPPRESS)
    p.add_argument("--gpus", type=int, default=None, help=argparse.SUPPRESS)
    p.add_argument("--gpu-ids", type=int, nargs="+", default=None, help=argparse.SUPPRESS)
    p.add_argument("--launcher", default="none", help=argparse.SUPPRESS)
    p.add_argument("--local_rank", type=int, default=0, help=argparse.SUPPRESS)
    return p.parse_args()


def main():
    args = parse_args()
    cfg = Config.fromfile(args.config, args.cfg_options)
    logger = get_root_logger()
    logger.info(f"config: {args.config}")
    train_detector(
        cfg,
        work_dir=args.work_dir,
        resume_from=args.resume_from,
        max_iters=args.max_iters,
        seed=args.seed,
        eval_during_train=not args.no_validate,
    )


if __name__ == "__main__":
    main()
