#!/usr/bin/env python
"""Host input-pipeline throughput accounting (VERDICT r2 item 2).

The device train step sustains ~350 img/s/chip (tools/profile_train.py);
whether a TPU host can FEED that is a host-CPU question the reference never
answers (its CPU hot spot is the same decode+mask+augment chain,
/root/reference/radet/datasets/pipelines/loading.py:541-650). This tool
measures:

  1. per-transform wall time over the training pipeline (decode, mask
     loading, RandomBackground, CosyPoseAug, resize, distance map,
     dist_vals gather, pad),
  2. end-to-end per-sample cost and single-core images/sec,
  3. DataLoader scaling over worker counts, thread vs process mode,
  4. the extrapolated number of host cores needed to sustain a target
     device rate (default 350 img/s, the measured train throughput).

With no --config, a synthetic 480x640 BOP scene set (8 objects/image, the
YCB-V-like density) is generated into --work-dir so the tool runs without
datasets. Prints a table plus one JSON summary line.

``--pipeline test`` profiles the EVAL-side host pipeline instead (decode +
resize + pad — no masks, no augmentation, no distance maps), against the
~1000 img/s device inference headline (bench.py): the host side of serving
is far cheaper than training's, and this prints the measured ms/sample and
the cores-to-sustain arithmetic for the inference rate (VERDICT r3 item 6;
measured numbers recorded in docs/DESIGN.md).

Usage:
  python tools/profile_pipeline.py [--config CFG] [--samples 40]
      [--workers 1 2 4] [--target-img-s 350] [--mode thread process]
      [--pipeline train|test]
"""

import argparse
import json
import os
import os.path as osp
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default=None, help="config with data.train; synthetic scene when absent")
    p.add_argument("--samples", type=int, default=40)
    p.add_argument("--workers", type=int, nargs="+", default=[1, 2, 4])
    p.add_argument("--mode", nargs="+", default=["thread", "process"])
    p.add_argument(
        "--pipeline", choices=["train", "test"], default="train",
        help="which host pipeline to profile: the training chain (decode+"
        "masks+aug+distance maps) or the eval chain (decode+resize+pad)",
    )
    p.add_argument(
        "--target-img-s", type=float, default=None,
        help="device rate to sustain (default: 350 for --pipeline train — "
        "the measured train step — and 1000 for --pipeline test — the "
        "bench.py inference headline)",
    )
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--work-dir", default=None, help="where to generate the synthetic scene")
    p.add_argument("--input-size", type=int, nargs=2, default=(480, 640))
    return p.parse_args()


def _synthetic_dataset(args):
    sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "tests"))
    from fixtures import make_synthetic_bop

    from radet_tpu.data.bop import BOPDataset

    root = args.work_dir or osp.join(tempfile.gettempdir(), "radet_pipeline_prof")
    ann = osp.join(root, "detector_annotations", "train_pbr.json")
    if not osp.exists(ann):
        make_synthetic_bop(
            root, num_scenes=1, images_per_scene=8,
            img_hw=tuple(args.input_size), num_classes=10, max_objects=8,
        )
    bg_dir = osp.join(root, "bg")
    os.makedirs(bg_dir, exist_ok=True)
    bg_file = osp.join(bg_dir, "bg0.jpg")
    if not osp.exists(bg_file):
        import cv2

        cv2.imwrite(bg_file, np.random.RandomState(0).randint(
            0, 255, (*args.input_size, 3), np.uint8))
    h, w = args.input_size
    if args.pipeline == "test":
        # the eval/serving chain (reference test_pipeline: LoadImageFromFile
        # -> Resize keep_ratio -> Pad; no annotations, no aug, no masks)
        pipeline = [
            dict(type="LoadImageFromFile"),
            dict(type="Resize", img_scale=(w, h), keep_ratio=True),
            dict(type="Pad", size_divisor=32),
        ]
        return BOPDataset(
            ann, img_prefix=osp.join(root, "train_pbr/"), pipeline=pipeline,
            test_mode=True, input_size=(h, w),
        )
    pipeline = [
        dict(type="LoadImageFromFile"),
        dict(type="LoadAnnotations", with_bbox=True, with_bop_mask=True),
        dict(type="Resize", img_scale=(w, h), keep_ratio=True),
        dict(type="RandomBackground", background_dir=bg_dir, prob=0.3),
        dict(type="CosyPoseAug", p=0.8, pipelines=[
            dict(type="PillowBlur", p=1.0, factor_interval=(1, 3)),
            dict(type="PillowSharpness", p=0.3, factor_interval=(0.0, 50.0)),
            dict(type="PillowContrast", p=0.3, factor_interval=(0.2, 50.0)),
            dict(type="PillowBrightness", p=0.5, factor_interval=(0.1, 6.0)),
            dict(type="PillowColor", p=0.3, factor_interval=(0.0, 20.0)),
        ]),
        dict(type="RandomFlip", flip_ratio=0.5),
        dict(type="GenerateDistanceMap"),
        dict(type="SampleDistanceAtAnchors"),
        dict(type="Pad", size_divisor=16),
    ]
    return BOPDataset(
        ann, img_prefix=osp.join(root, "train_pbr/"), pipeline=pipeline,
        test_mode=False, input_size=(h, w),
    )


def _config_dataset(args):
    from radet_tpu.apis.common import build_dataset
    from radet_tpu.utils import Config

    cfg = Config.fromfile(args.config)
    if args.pipeline == "test":
        return build_dataset(cfg, "test", test_mode=True)
    return build_dataset(cfg, "train", test_mode=False)


class _Timed:
    def __init__(self, t, acc):
        self.t = t
        self.acc = acc
        self.name = type(t).__name__

    def __call__(self, results):
        t0 = time.perf_counter()
        out = self.t(results)
        self.acc[self.name] = self.acc.get(self.name, 0.0) + (time.perf_counter() - t0)
        return out


def profile_transforms(ds, n):
    acc = {}
    orig = ds.pipeline.transforms
    ds.pipeline.transforms = [_Timed(t, acc) for t in orig]
    # dataset-level overhead (ann parsing, static padding) = total - transforms
    t0 = time.perf_counter()
    for i in range(n):
        ds[i % len(ds)]
    total = time.perf_counter() - t0
    ds.pipeline.transforms = orig
    return acc, total


def loader_rate(ds, batch, workers, mode, n_batches=6):
    from radet_tpu.data.loader import DataLoader

    loader = DataLoader(
        ds, batch_size=batch, shuffle=True, num_workers=workers,
        infinite=True, worker_mode=mode, prefetch_batches=2,
    )
    it = iter(loader)
    next(it)  # warm up executors / page caches
    t0 = time.perf_counter()
    for _ in range(n_batches):
        next(it)
    dt = time.perf_counter() - t0
    del it
    return n_batches * batch / dt


def main():
    args = parse_args()
    if args.target_img_s is None:
        args.target_img_s = 1000.0 if args.pipeline == "test" else 350.0
    ds = _config_dataset(args) if args.config else _synthetic_dataset(args)
    n = min(args.samples, max(8, len(ds)))

    print(f"dataset: {len(ds)} images, pipeline: "
          f"{[type(t).__name__ for t in ds.pipeline.transforms]}")

    # warm page cache so decode timing reflects CPU, not first-touch disk
    for i in range(min(len(ds), n)):
        ds[i]

    acc, total = profile_transforms(ds, n)
    per_sample = total / n
    rows = sorted(acc.items(), key=lambda kv: -kv[1])
    t_sum = sum(acc.values())
    print(f"\nper-transform cost over {n} samples "
          f"({per_sample * 1000:.1f} ms/sample end-to-end):")
    print(f"{'transform':<28}{'ms/sample':>10}{'share':>8}")
    for name, t in rows:
        print(f"{name:<28}{t / n * 1000:>10.2f}{t / t_sum * 100:>7.1f}%")
    other = total - t_sum
    print(f"{'(dataset overhead)':<28}{other / n * 1000:>10.2f}"
          f"{other / total * 100:>7.1f}%")

    single_core_img_s = 1.0 / per_sample
    cores_needed = args.target_img_s / single_core_img_s
    print(f"\nsingle-thread: {single_core_img_s:.1f} img/s -> "
          f"~{cores_needed:.1f} busy cores to sustain {args.target_img_s:.0f} img/s"
          f" (assuming linear scaling; measure below)")

    scaling = {}
    for mode in args.mode:
        for wk in args.workers:
            try:
                r = loader_rate(ds, args.batch, wk, mode)
            except Exception as e:  # noqa: BLE001 - report, keep going
                print(f"loader {mode} x{wk}: FAILED ({e})")
                continue
            scaling[f"{mode}x{wk}"] = round(r, 1)
            print(f"loader {mode} x{wk}: {r:.1f} img/s")

    summary = dict(
        pipeline=args.pipeline,
        per_sample_ms=round(per_sample * 1000, 2),
        single_core_img_s=round(single_core_img_s, 1),
        target_img_s=args.target_img_s,
        cores_needed=round(cores_needed, 1),
        transforms={k: round(v / n * 1000, 2) for k, v in rows},
        loader_scaling=scaling,
        host_cores=os.cpu_count(),
    )
    print("\n" + json.dumps(summary))


if __name__ == "__main__":
    main()
