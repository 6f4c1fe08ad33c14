"""BatchingDetector dynamic-batching serving front-end (apis/serving.py)."""

import threading

import numpy as np
import pytest

from fixtures import make_synthetic_bop


@pytest.fixture(scope="module")
def detector(tmp_path_factory):
    from radet_tpu.apis import init_detector

    tmp = tmp_path_factory.mktemp("serve")
    root = str(tmp / "bop")
    make_synthetic_bop(root, num_scenes=1, images_per_scene=1, img_hw=(128, 160))
    cfg = tmp / "cfg.py"
    cfg.write_text(
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
    ann_file=r"{root}/detector_annotations/train_pbr.json",
    img_prefix=r"{root}/train_pbr/",
    pipeline=[], classes=("obj_000001", "obj_000002", "obj_000003"),
))
"""
    )
    return init_detector(str(cfg))


def _imgs(n, hw=(128, 160), seed=0):
    rs = np.random.RandomState(seed)
    return [rs.randint(0, 255, (*hw, 3), np.uint8) for _ in range(n)]


@pytest.mark.slow
def test_batched_results_match_direct_inference(detector):
    """Every future resolves to exactly the direct inference_detector
    result for its image — batching, padding, and slicing are invisible."""
    from radet_tpu.apis import inference_detector
    from radet_tpu.apis.serving import BatchingDetector

    imgs = _imgs(7)
    direct = inference_detector(detector, imgs)
    with BatchingDetector(detector, batch_size=4, max_latency_ms=50) as srv:
        futs = [srv.submit(im) for im in imgs]
        results = [f.result(timeout=120) for f in futs]
        stats = srv.stats()
    assert stats["requests"] == 7
    # 7 requests at batch 4: at least 2 device batches (one padded)
    assert stats["batches"] >= 2
    for got, want in zip(results, direct):
        np.testing.assert_allclose(got["boxes"], want["boxes"], atol=1e-5)
        np.testing.assert_allclose(got["scores"], want["scores"], atol=1e-6)
        np.testing.assert_array_equal(got["labels"], want["labels"])


@pytest.mark.slow
def test_concurrent_submitters_and_detect(detector):
    """Thread-safe submission from many threads; detect() convenience."""
    from radet_tpu.apis.serving import BatchingDetector

    imgs = _imgs(8, seed=1)
    results = [None] * len(imgs)
    # batch_size=4 reuses the batch-4 program compiled by the previous test
    # (the jit cache lives on the shared Detector handle)
    with BatchingDetector(detector, batch_size=4, max_latency_ms=20) as srv:

        def worker(i):
            results[i] = srv.detect(imgs[i], timeout=120)

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(len(imgs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        # a fresh single request after the burst (partial batch path)
        single = srv.detect(imgs[0], timeout=120)
    assert all(set(r) == {"boxes", "scores", "labels"} for r in results)
    np.testing.assert_allclose(single["boxes"], results[0]["boxes"], atol=1e-5)


def test_close_rejects_new_work():
    """Lifecycle semantics — runs against a stub detector (no model build,
    fast-suite representative; the compiled-path contracts are the two slow
    tests above)."""
    import types

    from radet_tpu.apis.serving import BatchingDetector

    calls = []

    def fake_infer(variables, imgs, shapes, scales):
        calls.append(imgs.shape)
        n = imgs.shape[0]
        return types.SimpleNamespace(
            boxes=np.zeros((n, 5, 4), np.float32),
            scores=np.zeros((n, 5), np.float32),
            labels=np.zeros((n, 5), np.int32),
            valid=np.ones((n, 5), bool),
        )

    stub = types.SimpleNamespace(
        variables={}, input_size=(64, 80), _infer=fake_infer
    )
    srv = BatchingDetector(stub, batch_size=2, max_latency_ms=0)
    # a request through the stub resolves with the padded static batch
    out = srv.detect(np.zeros((64, 80, 3), np.uint8), timeout=30)
    assert set(out) == {"boxes", "scores", "labels"} and calls == [(2, 64, 80, 3)]
    # mis-shaped input fails in the CALLER's thread, not the dispatcher
    # (a grayscale array reaching np.stack would wedge the server)
    with pytest.raises(ValueError, match="RGB"):
        srv.submit(np.zeros((64, 80), np.uint8))
    # ...and the dispatcher is still alive afterwards
    out2 = srv.detect(np.zeros((64, 80, 3), np.uint8), timeout=30)
    assert set(out2) == {"boxes", "scores", "labels"}
    srv.close()
    with pytest.raises(RuntimeError, match="closed"):
        srv.submit(_imgs(1, hw=(64, 80))[0])
    srv.close()  # idempotent
