"""init_detector / inference_detector programmatic API (reference
apis/inference.py parity) + the extra color augmentations."""

import numpy as np
import pytest

from fixtures import make_synthetic_bop


def _cfg_file(tmp_path, bop_root):
    p = tmp_path / "cfg.py"
    p.write_text(
        f"""
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375])
model = dict(
    type="RADet",
    backbone=dict(depth=18, frozen_stages=1, norm_eval=True),
    neck=dict(out_channels=32, start_level=1, num_outs=5),
    bbox_head=dict(num_classes=3, in_channels=32, stacked_convs=1, feat_channels=32),
)
test_cfg = dict(nms_pre=1000, score_thr=0.05, max_per_img=10,
    nms=dict(type="vote", iou_threshold=0.65, cluster_score=["cls", "iou"],
             vote_score=["iou", "cls"]))
input_size = (128, 160)
compute_dtype = "float32"
data = dict(test=dict(
    ann_file=r"{bop_root}/detector_annotations/train_pbr.json",
    img_prefix=r"{bop_root}/train_pbr/",
    pipeline=[], classes=("obj_000001", "obj_000002", "obj_000003"),
))
"""
    )
    return str(p)


def test_init_and_inference_detector(tmp_path):
    from radet_tpu.apis import inference_detector, init_detector

    root = str(tmp_path / "bop")
    make_synthetic_bop(root, num_scenes=1, images_per_scene=1, img_hw=(128, 160))
    detector = init_detector(_cfg_file(tmp_path, root))
    img = np.random.RandomState(0).randint(0, 255, (128, 160, 3), np.uint8)
    out = inference_detector(detector, img)
    assert set(out) == {"boxes", "scores", "labels"}
    # list input -> list output; path input supported
    outs = inference_detector(detector, [img, img])
    assert len(outs) == 2
    path = f"{root}/train_pbr/000000/rgb/000000.jpg"
    out2 = inference_detector(detector, path)
    assert out2["boxes"].shape[1] == 4 if len(out2["boxes"]) else True
    # differently-sized input gets resized+padded to the static shape
    big = np.random.RandomState(1).randint(0, 255, (256, 320, 3), np.uint8)
    out3 = inference_detector(detector, big)
    assert set(out3) == {"boxes", "scores", "labels"}

    # async API (reference apis/inference.py:129-161 parity): same results
    # as the sync path, and concurrent requests can be awaited together
    import asyncio

    from radet_tpu.apis import async_inference_detector

    async def run_async():
        a, b = await asyncio.gather(
            async_inference_detector(detector, img),
            async_inference_detector(detector, [img, big]),
        )
        return a, b

    a, b = asyncio.run(run_async())
    np.testing.assert_array_equal(a["boxes"], out["boxes"])
    np.testing.assert_array_equal(a["labels"], out["labels"])
    assert len(b) == 2
    np.testing.assert_array_equal(b[1]["boxes"], out3["boxes"])

    # show_result_pyplot writes a figure headlessly
    from radet_tpu.apis import show_result_pyplot

    out_png = str(tmp_path / "viz.png")
    drawn = show_result_pyplot(detector, img, out, score_thr=0.0, out_file=out_png)
    assert drawn.shape == img.shape
    import os

    assert os.path.isfile(out_png) and os.path.getsize(out_png) > 0


def test_extra_color_augs(rng):
    from radet_tpu.data.pipeline import RandomHSV, RandomNoise, RandomSmooth

    img = rng.randint(0, 255, (64, 80, 3)).astype(np.uint8)
    for t in (
        RandomHSV(0.2, 0.5, 0.5, prob=1.0),
        RandomNoise(0.05, prob=1.0),
        RandomSmooth(7, prob=1.0),
    ):
        out = t({"img": img.copy()})
        assert out["img"].shape == img.shape
        assert out["img"].dtype == np.uint8
    # prob=0 -> unchanged
    out = RandomNoise(0.5, prob=0.0)({"img": img.copy()})
    np.testing.assert_array_equal(out["img"], img)


def test_checkpoint_meta_roundtrip(tmp_path):
    """save_weights/write_meta -> load_meta; init_detector picks classes up
    from checkpoint meta when the config has none (reference checkpoint-meta
    CLASSES embedding, tools/train.py:167-172)."""
    from radet_tpu.engine.checkpoint import load_meta, save_weights, write_meta

    path = str(tmp_path / "ck")
    save_weights(path, {"params": {"w": np.zeros((2, 2), np.float32)}},
                 meta=dict(classes=["a", "b"], radet_tpu_version="0.1.0"))
    meta = load_meta(path)
    assert meta["classes"] == ["a", "b"]
    # manager-style: meta at the root, checkpoint in a step subdir
    root = tmp_path / "mgr"
    root.mkdir()
    write_meta(str(root), dict(classes=["x"]))
    (root / "100").mkdir()
    assert load_meta(str(root / "100"))["classes"] == ["x"]
