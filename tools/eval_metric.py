#!/usr/bin/env python
"""Offline evaluation of pickled results against a config's dataset (parity
with /root/reference/tools/eval_metric.py)."""

import argparse
import json
import os.path as osp
import pickle
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from radet_tpu.apis.common import build_dataset
from radet_tpu.apis.test import evaluate_results
from radet_tpu.utils import Config


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("results", help="pickle produced by tools/test.py --out")
    p.add_argument("--split", default="test", choices=["test", "val"])
    p.add_argument("--cfg-options", nargs="+", default=None)
    p.add_argument(
        "--eval-options", nargs="+", default=None,
        help="e.g. classwise=True for per-class AP",
    )
    args = p.parse_args()

    cfg = Config.fromfile(args.config, args.cfg_options)
    dataset = build_dataset(cfg, args.split)
    with open(args.results, "rb") as f:
        results = pickle.load(f)
    from radet_tpu.utils.config import parse_kv_options

    eval_options = parse_kv_options(args.eval_options)
    metrics = evaluate_results(
        dataset, results, classwise=bool(eval_options.get("classwise", False))
    )
    print(json.dumps(metrics, indent=2))


if __name__ == "__main__":
    main()
