#!/usr/bin/env python
"""Run the BOP-core 7-dataset sweep (train and/or test each config).

The sweep runner for SURVEY.md §7 build-plan item 7 / BASELINE config #5:
ycbv, lmo, tless, itodd, hb, icbin, tudl — sequentially on the local
devices (each run is itself data-parallel over the mesh). Emits a summary
table and a machine-readable json.

Examples:
  python tools/run_bop_sweep.py --mode test --checkpoint-root work_dirs
  python tools/run_bop_sweep.py --mode train --max-iters 100000
  python tools/run_bop_sweep.py --datasets ycbv lmo --mode both
"""

import argparse
import json
import os.path as osp
import sys
import time
import traceback

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

DATASETS = ["ycbv", "lmo", "tless", "itodd", "hb", "icbin", "tudl"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--datasets", nargs="+", default=DATASETS, choices=DATASETS)
    p.add_argument("--mode", choices=["train", "test", "both"], default="both")
    p.add_argument("--config-dir", default=osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "configs", "bop"))
    p.add_argument("--suffix", default="pbr", help="config suffix: pbr or mixpbr")
    p.add_argument("--max-iters", type=int, default=None)
    p.add_argument("--checkpoint-root", default=None,
                   help="for --mode test: root containing <work_dir>/checkpoints per dataset")
    p.add_argument("--out", default="work_dirs/bop_sweep_summary.json")
    p.add_argument("--cfg-options", nargs="+", default=None)
    args = p.parse_args()

    from radet_tpu.apis.common import build_model_and_anchors, init_variables
    from radet_tpu.apis.test import test_from_config
    from radet_tpu.apis.train import train_detector
    from radet_tpu.engine.checkpoint import load_weights
    from radet_tpu.utils import Config, get_root_logger

    logger = get_root_logger()
    summary = {}
    for ds in args.datasets:
        cfg_path = osp.join(args.config_dir, f"r50_{ds}_{args.suffix}.py")
        entry = {"config": cfg_path}
        t0 = time.time()
        try:
            cfg = Config.fromfile(cfg_path, args.cfg_options)
            state = None
            if args.mode in ("train", "both"):
                logger.info(f"=== sweep: training {ds} ===")
                state = train_detector(cfg, max_iters=args.max_iters)
            if args.mode in ("test", "both"):
                logger.info(f"=== sweep: testing {ds} ===")
                model, _, _, _ = build_model_and_anchors(cfg)
                if state is not None:
                    import jax

                    variables = jax.device_get(
                        {"params": state.params, "batch_stats": state.batch_stats}
                    )
                else:
                    variables = init_variables(model, tuple(cfg.get("input_size", (480, 640))))
                    ckpt = None
                    if args.checkpoint_root:
                        cand = osp.join(
                            args.checkpoint_root,
                            osp.basename(cfg.get("work_dir", f"work_dirs/{ds}")),
                            "checkpoints",
                        )
                        ckpt = cand if osp.isdir(cand) else None
                    if ckpt:
                        variables = load_weights(ckpt, template=variables)
                        entry["checkpoint"] = ckpt
                    else:
                        logger.warning(f"{ds}: no checkpoint found — testing random weights")
                dataset, results, metrics = test_from_config(cfg, variables)
                entry["metrics"] = metrics
            entry["status"] = "ok"
        except Exception as e:  # noqa: BLE001 - sweep continues past failures
            entry["status"] = "failed"
            entry["error"] = f"{type(e).__name__}: {e}"
            logger.error(f"{ds} failed:\n{traceback.format_exc()}")
        entry["seconds"] = round(time.time() - t0, 1)
        summary[ds] = entry

    import os

    os.makedirs(osp.dirname(osp.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=2)
    print(f"\n{'dataset':<8} {'status':<8} {'mAP':>7} {'mAP50':>7} {'sec':>8}")
    for ds, e in summary.items():
        m = e.get("metrics", {})
        print(
            f"{ds:<8} {e['status']:<8} "
            f"{m.get('bbox_mAP', float('nan')):>7.3f} "
            f"{m.get('bbox_mAP_50', float('nan')):>7.3f} "
            f"{e['seconds']:>8.1f}"
        )
    print(f"summary written to {args.out}")


if __name__ == "__main__":
    main()
