"""Batched dataset inference + evaluation (the reference tools/test.py path,
SURVEY.md §3.2, without per-image loops or host round-trips).

``run_inference`` keeps shapes static by padding the final partial batch and
masking the padded rows; detections come back to the host as one fixed-size
transfer per batch.
"""

from __future__ import annotations

import time
from typing import Any, Dict, List, Optional

import jax
import numpy as np

from ..data.loader import DataLoader, collate
from ..engine.train_step import build_infer_step
from ..evaluation.coco_eval import COCOEvaluator
from ..parallel.mesh import batch_sharding, create_mesh, replicated_sharding, shard_batch
from ..utils.logging import get_root_logger
from .common import build_dataset, build_model_and_anchors, normalizer_from_cfg


def run_inference(
    model,
    variables,
    dataset,
    *,
    anchors,
    level_counts,
    img_norm: Dict,
    test_cfg: Dict,
    batch_size: int = 8,
    normalizer: float = 1.0 / 8.0,
    num_workers: int = 8,
    mesh=None,
    score_thr_keep: float = 0.0,
    log_interval: int = 50,
    aug_flip: bool = False,
) -> List[dict]:
    """Returns per-image detection dicts {boxes (M,4), scores, labels, img_id}."""
    logger = get_root_logger()
    infer = build_infer_step(
        model,
        anchors,
        level_counts,
        img_norm=img_norm,
        test_cfg=test_cfg,
        normalizer=normalizer,
    )
    import jax

    loader = DataLoader(
        dataset,
        batch_size=batch_size,
        shuffle=False,
        num_workers=num_workers,
        drop_last=False,
        infinite=False,
        shard_id=jax.process_index(),
        num_shards=jax.process_count(),
    )
    results: List[dict] = []
    t_start = time.time()
    n_images = 0
    pending = None  # (det device arrays, batch, real) — overlap readback

    def _drain(det, batch, real):
        nonlocal n_images
        boxes, scores, labels, valid = (
            np.asarray(det.boxes),
            np.asarray(det.scores),
            np.asarray(det.labels),
            np.asarray(det.valid),
        )
        if aug_flip:
            boxes, scores, labels, valid = _merge_flip_aug(
                infer, variables, batch, test_cfg,
                boxes, scores, labels, valid,
            )
        for i in range(real):
            keep = valid[i] & (scores[i] >= score_thr_keep)
            results.append(
                dict(
                    boxes=boxes[i][keep],
                    scores=scores[i][keep],
                    labels=labels[i][keep],
                    img_id=int(batch["img_id"][i]),
                )
            )
        n_images += real

    for bi, batch in enumerate(loader):
        real = batch["image"].shape[0]
        if real < batch_size:  # pad to static batch
            pad = batch_size - real
            batch = {
                k: np.concatenate([v, np.repeat(v[-1:], pad, axis=0)], 0)
                for k, v in batch.items()
            }
        if mesh is not None:
            inputs = shard_batch(
                dict(
                    image=batch["image"],
                    img_shape=batch["img_shape"],
                    scale_factor=batch["scale_factor"],
                ),
                mesh,
            )
        else:
            inputs = batch
        det = infer(
            variables, inputs["image"], inputs["img_shape"], inputs["scale_factor"]
        )
        # convert the PREVIOUS batch's detections while this one computes
        if pending is not None:
            _drain(*pending)
        pending = (det, batch, real)
        if log_interval and (bi + 1) % log_interval == 0:
            ips = max(n_images, 1) / (time.time() - t_start)
            logger.info(f"inference: {n_images}/{len(dataset)} images ({ips:.1f} img/s)")
    if pending is not None:
        _drain(*pending)
    dt = time.time() - t_start
    if n_images:
        logger.info(f"inference done: {n_images} images in {dt:.1f}s ({n_images / dt:.1f} img/s)")
    return gather_results_multihost(results)


def gather_results_multihost(results: List[dict]) -> List[dict]:
    """Collect per-host result shards onto every process (the reference's
    multi_gpu_test collect_results_gpu, apis/test.py:117-190, re-expressed
    as a pickled padded all-gather over jax's DCN channel). No-op on a
    single process."""
    import jax

    if jax.process_count() == 1:
        return results
    import pickle

    import numpy as np
    from jax.experimental import multihost_utils

    blob = np.frombuffer(pickle.dumps(results), np.uint8)
    # pad to a host-uniform length (all_gather needs equal shapes)
    local_len = np.asarray([blob.size], np.int64)
    all_lens = np.asarray(multihost_utils.process_allgather(local_len)).reshape(-1)
    max_len = int(all_lens.max())
    padded = np.zeros(max_len, np.uint8)
    padded[: blob.size] = blob
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    merged: List[dict] = []
    for shard, ln in zip(gathered.reshape(len(all_lens), max_len), all_lens):
        merged.extend(pickle.loads(shard[: int(ln)].tobytes()))
    # hosts see interleaved shards; restore dataset order by image id
    merged.sort(key=lambda r: r["img_id"])
    # drop duplicates from shard padding (loader pads indices to divisible)
    seen = set()
    out = []
    for r in merged:
        if r["img_id"] in seen:
            continue
        seen.add(r["img_id"])
        out.append(r)
    return out


def _merge_flip_aug(infer, variables, batch, test_cfg,
                    boxes, scores, labels, valid):
    """Horizontal-flip test-time augmentation.

    Redesigned from the reference's MultiScaleFlipAug + merge_augs
    (core/post_processing/merge_augs.py): run the compiled step on flipped
    images, unflip the detections into original coordinates, then fuse the
    two fixed-size detection sets with a host vote-NMS (ops/native)."""
    from ..ops.vote_nms import vote_nms_numpy

    try:
        from ..ops.native import load as _native_load, vote_nms_native

        native_ok = _native_load() is not None
    except Exception:
        native_ok = False

    images = np.asarray(batch["image"])
    shapes = np.asarray(batch["img_shape"])
    scales = np.asarray(batch["scale_factor"])
    flipped = images.copy()
    for i in range(len(images)):
        w = int(shapes[i][1])
        flipped[i, :, :w] = images[i, :, :w][:, ::-1]
    det_f = infer(variables, flipped, batch["img_shape"], batch["scale_factor"])
    fb = np.asarray(det_f.boxes)
    fs = np.asarray(det_f.scores)
    fl = np.asarray(det_f.labels)
    fv = np.asarray(det_f.valid)
    nms_cfg = dict(test_cfg.get("nms", {}))
    iou_thr = float(nms_cfg.get("iou_threshold", 0.6))
    max_out = int(test_cfg.get("max_per_img", 100))

    out_b, out_s, out_l, out_v = [], [], [], []
    m = boxes.shape[1]
    for i in range(len(images)):
        # unflip: boxes are in ORIGINAL image coords; W_ori = w_resized/scale
        w_ori = shapes[i][1] / max(scales[i][0], 1e-12)
        ub = fb[i].copy()
        ub[:, 0] = w_ori - fb[i][:, 2]
        ub[:, 2] = w_ori - fb[i][:, 0]
        cb = np.concatenate([boxes[i][valid[i]], ub[fv[i]]], 0)
        cs = np.concatenate([scores[i][valid[i]], fs[i][fv[i]]], 0)
        cl = np.concatenate([labels[i][valid[i]], fl[i][fv[i]]], 0).astype(np.int64)
        if native_ok:
            vb, vl, vs = vote_nms_native(cb, cs, cs, cl, iou_thr)
        else:
            vb, vl, vs = vote_nms_numpy(cb, cs, cs, cl, iou_thr)
        vb, vl, vs = vb[:max_out], vl[:max_out], vs[:max_out]
        k = len(vb)
        pb = np.zeros((m, 4), np.float32)
        ps = np.zeros((m,), np.float32)
        pl = np.zeros((m,), np.int64)
        pv = np.zeros((m,), bool)
        pb[:k], ps[:k], pl[:k], pv[:k] = vb, vs, vl, True
        out_b.append(pb)
        out_s.append(ps)
        out_l.append(pl)
        out_v.append(pv)
    return np.stack(out_b), np.stack(out_s), np.stack(out_l), np.stack(out_v)


def evaluate_results(dataset, results: List[dict]) -> Dict[str, float]:
    """COCO bbox evaluation with the reference's protocol (bop.py:120-302)."""
    coco_results = dataset.det2json(results)
    evaluator = COCOEvaluator(
        dataset.coco, cat_ids=dataset.cat_ids, img_ids=dataset.img_ids
    )
    metrics = evaluator.evaluate(coco_results)
    return {f"bbox_{k}": v for k, v in metrics.items()}


def test_from_config(
    cfg,
    variables,
    *,
    split: str = "test",
    batch_size: Optional[int] = None,
    fmt_only: bool = False,
):
    """Config-driven test entry used by tools/test.py.

    Inference is data-parallel over all local devices that divide the batch
    (the multi_gpu_test analogue, reference apis/test.py:69)."""
    import jax

    model, anchors, ranges, counts = build_model_and_anchors(cfg)
    dataset = build_dataset(cfg, split)
    batch_size = batch_size or int(cfg.data.get("samples_per_gpu", 8))
    n_dev = len(jax.devices())
    use_dev = max(d for d in range(1, n_dev + 1) if batch_size % d == 0)
    mesh = create_mesh(jax.devices()[:use_dev]) if use_dev > 1 else None
    if mesh is not None:
        variables = jax.device_put(variables, replicated_sharding(mesh))
    results = run_inference(
        model,
        variables,
        dataset,
        anchors=anchors,
        level_counts=counts,
        img_norm=cfg.img_norm_cfg.to_dict(),
        test_cfg=cfg.test_cfg.to_dict(),
        batch_size=batch_size,
        normalizer=normalizer_from_cfg(cfg),
        aug_flip=bool(cfg.test_cfg.get("flip_tta", False)),
        mesh=mesh,
    )
    if fmt_only:
        return dataset, results, None
    return dataset, results, evaluate_results(dataset, results)
