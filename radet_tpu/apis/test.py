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


def _eval_mesh(cfg, batch_size: int):
    """Local-device mesh for batched eval: data axis dividing the batch,
    plus the optional spatial axis (cfg.parallel = dict(space=N), same knob
    as training — parallel/mesh.py module docstring)."""
    par = cfg.get("parallel")
    space = int(par.get("space", 1)) if par else 1
    n_dev = len(jax.devices())
    if space > n_dev:
        raise ValueError(f"parallel.space={space} exceeds {n_dev} devices")
    dp = max(
        d for d in range(1, n_dev // space + 1)
        if batch_size % d == 0 and d * space <= n_dev
    )
    use_dev = dp * space
    return create_mesh(jax.devices()[:use_dev], space=space) if use_dev > 1 else None


def strict_eval_overrides(test_cfg: Dict) -> Dict:
    """Reference-parity candidate semantics for evaluation/export.

    The deploy/bench path defaults to a single global (approximate) top-k
    straight down to ``nms_topk`` candidates — fast, but it deviates from the
    reference's per-level ``nms_pre`` caps + exact top-k
    (/root/reference/radet/models/dense_heads/radet_head.py:106-128) on
    scenes with many over-threshold candidates.  Evaluation and submission
    export default to the strict semantics (VERDICT r1 item 6): per-level
    exact top-k, and a cluster-score truncation cap high enough
    (2048 ≥ 4× the deploy default) that it binds only on scenes far beyond
    anything the reference datasets produce."""
    out = dict(test_cfg)
    out["candidate_mode"] = "per_level"
    out["approx_topk"] = False
    out["nms_topk"] = max(int(out.get("nms_topk", 1024)), 2048)
    return out


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
    infer_step=None,
) -> List[dict]:
    """Returns per-image detection dicts {boxes (M,4), scores, labels, img_id}.

    ``infer_step`` lets callers reuse a previously built (compiled) step —
    each build_infer_step call is a fresh jit closure with its own compile
    cache, so periodic-eval callers must pass one to avoid recompiling."""
    logger = get_root_logger()
    infer = infer_step or build_infer_step(
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
        batch = _pad_batch(batch, batch_size)
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


def _pad_batch(batch: Dict, batch_size: int) -> Dict:
    real = batch["image"].shape[0]
    if real == batch_size:
        return batch
    pad = batch_size - real
    return {
        k: np.concatenate([v, np.repeat(v[-1:], pad, axis=0)], 0)
        for k, v in batch.items()
    }


def _flip_batch_images(images: np.ndarray, shapes: np.ndarray) -> np.ndarray:
    """Horizontally flip each image within its valid (unpadded) width."""
    flipped = images.copy()
    for i in range(len(images)):
        w = int(shapes[i][1])
        flipped[i, :, :w] = images[i, :, :w][:, ::-1]
    return flipped


def _unflip_boxes(boxes: np.ndarray, shapes: np.ndarray, scales: np.ndarray) -> np.ndarray:
    """Mirror detection x-coords back into original-image space.

    Detections are in ORIGINAL image coordinates, so the mirror axis is
    W_ori = w_resized / scale.  Returns a new array."""
    out = np.array(boxes)  # writable copy (asarray may be read-only)
    for i in range(len(out)):
        w_ori = shapes[i][1] / max(scales[i][0], 1e-12)
        x1 = w_ori - boxes[i][:, 2].copy()
        x2 = w_ori - boxes[i][:, 0].copy()
        out[i][:, 0], out[i][:, 2] = x1, x2
    return out


def _host_vote_fuse(boxes, cluster_scores, vote_scores, labels, iou_thr: float):
    """Fuse a concatenated multi-view detection set with host vote-NMS
    (native C++ lib when available, numpy oracle otherwise)."""
    from ..ops.vote_nms import vote_nms_numpy

    try:
        from ..ops.native import load as _native_load, vote_nms_native

        if _native_load() is not None:
            return vote_nms_native(boxes, cluster_scores, vote_scores, labels, iou_thr)
    except Exception:
        pass
    return vote_nms_numpy(boxes, cluster_scores, vote_scores, labels, iou_thr)


def tta_padded_size(scale_wh, size_divisor: int = 32):
    """Static padded (h, w) for a keep_ratio resize into ``scale_wh=(w, h)``:
    the resize fits within the scale box, so ceil(scale / divisor) bounds it.
    The per-scale dataset pads every sample to exactly this static size
    (build_pipeline upgrades Pad accordingly), so anchors/level counts built
    from it always match the sample shapes; when the image aspect ratio
    differs from the scale box the bound is conservative (extra padding,
    wasted compute, correct results)."""
    w, h = scale_wh
    d = size_divisor
    return ((h + d - 1) // d * d, (w + d - 1) // d * d)


def run_tta_inference(
    model,
    variables,
    datasets: List,  # one dataset view per scale (same indices, same order)
    *,
    anchors_list,
    counts_list,
    img_norm: Dict,
    test_cfg: Dict,
    batch_size: int = 8,
    normalizer: float = 1.0 / 8.0,
    flip: bool = False,
    num_workers: int = 4,
    mesh=None,
    score_thr_keep: float = 0.0,
    log_interval: int = 50,
) -> List[dict]:
    """Multi-scale (+flip) test-time augmentation.

    Redesigned from the reference's MultiScaleFlipAug + merge_augs
    (/root/reference/radet/datasets/pipelines/test_time_aug.py,
    core/post_processing/merge_augs.py): the reference loops augmented views
    inside one variable-shape batch; here every scale is its own static-shape
    dataset view with its own compiled infer step (XLA needs one compiled
    program per input shape), detections come back in ORIGINAL image
    coordinates per view, and the per-image union across all views is fused
    with host vote-NMS (same fusion as the flip-TTA path).  With ``mesh``
    each per-scale batch is dp-sharded over the local devices exactly like
    run_inference (pass replicated ``variables``)."""
    logger = get_root_logger()
    infer_steps = [
        build_infer_step(
            model, a, c, img_norm=img_norm, test_cfg=test_cfg, normalizer=normalizer
        )
        for a, c in zip(anchors_list, counts_list)
    ]
    loaders = [
        DataLoader(
            ds,
            batch_size=batch_size,
            shuffle=False,
            num_workers=num_workers,
            drop_last=False,
            infinite=False,
            shard_id=jax.process_index(),
            num_shards=jax.process_count(),
        )
        for ds in datasets
    ]
    nms_cfg = dict(test_cfg.get("nms", {}))
    iou_thr = float(nms_cfg.get("iou_threshold", 0.6))
    max_out = int(test_cfg.get("max_per_img", 100))

    results: List[dict] = []
    t_start = time.time()
    n_images = 0
    for bi, batches in enumerate(zip(*loaders)):
        real = batches[0]["image"].shape[0]
        assert all(
            (b["img_id"][:real] == batches[0]["img_id"][:real]).all() for b in batches
        ), "TTA dataset views out of lockstep"
        per_img = [dict(boxes=[], scores=[], labels=[]) for _ in range(real)]

        def _collect(det, batch):
            boxes = np.asarray(det.boxes)
            scores = np.asarray(det.scores)
            labels = np.asarray(det.labels)
            valid = np.asarray(det.valid)
            for i in range(real):
                keep = valid[i]
                per_img[i]["boxes"].append(boxes[i][keep])
                per_img[i]["scores"].append(scores[i][keep])
                per_img[i]["labels"].append(labels[i][keep])

        for infer, batch in zip(infer_steps, batches):
            batch = _pad_batch(batch, batch_size)
            inputs = dict(
                image=batch["image"],
                img_shape=batch["img_shape"],
                scale_factor=batch["scale_factor"],
            )
            if mesh is not None:
                inputs = shard_batch(inputs, mesh)
            det = infer(
                variables, inputs["image"], inputs["img_shape"], inputs["scale_factor"]
            )
            _collect(det, batch)
            if flip:
                images = np.asarray(batch["image"])
                shapes = np.asarray(batch["img_shape"])
                scales = np.asarray(batch["scale_factor"])
                flipped = _flip_batch_images(images, shapes)
                f_inputs = dict(
                    image=flipped,
                    img_shape=batch["img_shape"],
                    scale_factor=batch["scale_factor"],
                )
                if mesh is not None:
                    f_inputs = shard_batch(f_inputs, mesh)
                det_f = infer(
                    variables,
                    f_inputs["image"],
                    f_inputs["img_shape"],
                    f_inputs["scale_factor"],
                )
                fb = _unflip_boxes(np.asarray(det_f.boxes), shapes, scales)
                _collect(det_f._replace(boxes=fb), batch)

        for i in range(real):
            cb = np.concatenate(per_img[i]["boxes"], 0).astype(np.float32)
            cs = np.concatenate(per_img[i]["scores"], 0).astype(np.float32)
            cl = np.concatenate(per_img[i]["labels"], 0).astype(np.int64)
            if len(cb):
                vb, vl, vs = _host_vote_fuse(cb, cs, cs, cl, iou_thr)
                vb, vl, vs = vb[:max_out], vl[:max_out], vs[:max_out]
            else:
                vb = np.zeros((0, 4), np.float32)
                vl = np.zeros((0,), np.int64)
                vs = np.zeros((0,), np.float32)
            keep = vs >= score_thr_keep
            results.append(
                dict(
                    boxes=vb[keep],
                    scores=vs[keep],
                    labels=vl[keep],
                    img_id=int(batches[0]["img_id"][i]),
                )
            )
        n_images += real
        if log_interval and (bi + 1) % log_interval == 0:
            ips = max(n_images, 1) / (time.time() - t_start)
            logger.info(
                f"tta inference: {n_images}/{len(datasets[0])} images ({ips:.1f} img/s)"
            )
    dt = time.time() - t_start
    if n_images:
        logger.info(
            f"tta inference done: {n_images} images x {len(infer_steps)} scales"
            f"{' x flip' if flip else ''} in {dt:.1f}s ({n_images / dt:.1f} img/s)"
        )
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
    two fixed-size detection sets with a host vote-NMS (_host_vote_fuse)."""
    images = np.asarray(batch["image"])
    shapes = np.asarray(batch["img_shape"])
    scales = np.asarray(batch["scale_factor"])
    flipped = _flip_batch_images(images, shapes)
    det_f = infer(variables, flipped, batch["img_shape"], batch["scale_factor"])
    fb = _unflip_boxes(np.asarray(det_f.boxes), shapes, scales)
    fs = np.asarray(det_f.scores)
    fl = np.asarray(det_f.labels)
    fv = np.asarray(det_f.valid)
    nms_cfg = dict(test_cfg.get("nms", {}))
    iou_thr = float(nms_cfg.get("iou_threshold", 0.6))
    max_out = int(test_cfg.get("max_per_img", 100))

    out_b, out_s, out_l, out_v = [], [], [], []
    m = boxes.shape[1]
    for i in range(len(images)):
        ub = fb[i]
        cb = np.concatenate([boxes[i][valid[i]], ub[fv[i]]], 0)
        cs = np.concatenate([scores[i][valid[i]], fs[i][fv[i]]], 0)
        cl = np.concatenate([labels[i][valid[i]], fl[i][fv[i]]], 0).astype(np.int64)
        vb, vl, vs = _host_vote_fuse(cb, cs, cs, cl, iou_thr)
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


def evaluate_results(
    dataset, results: List[dict], *, classwise: bool = False
) -> Dict[str, float]:
    """COCO bbox evaluation with the reference's protocol (bop.py:120-302).

    ``classwise`` adds per-class AP entries (the reference's
    ``--eval-options classwise=True``).

    Datasets with their own evaluation protocol (VOCDataset's mean-AP,
    reference voc.py:28-93) are delegated to; KITTI-style datasets force
    classwise AP on via an ``EVAL_DEFAULTS`` attribute (kitti.py:9-26)."""
    if hasattr(type(dataset), "evaluate"):
        return dataset.evaluate(results, classwise=classwise)
    classwise = getattr(dataset, "EVAL_DEFAULTS", {}).get("classwise", classwise)
    coco_results = dataset.det2json(results)
    evaluator = COCOEvaluator(
        dataset.coco, cat_ids=dataset.cat_ids, img_ids=dataset.img_ids
    )
    metrics = evaluator.evaluate(coco_results)
    out = {f"bbox_{k}": v for k, v in metrics.items()}
    if classwise:
        out.update(
            {f"bbox_AP_{name}": ap for name, ap in evaluator.classwise_ap().items()}
        )
    return out


def test_from_config(
    cfg,
    variables,
    *,
    split: str = "test",
    batch_size: Optional[int] = None,
    fmt_only: bool = False,
    strict: bool = True,
    eval_options: Optional[Dict] = None,
):
    """Config-driven test entry used by tools/test.py.

    Inference is data-parallel over all local devices that divide the batch
    (the multi_gpu_test analogue, reference apis/test.py:69).  ``strict``
    (default) runs reference candidate semantics (per-level exact top-k,
    see strict_eval_overrides); pass strict=False for the fast deploy path."""
    import jax

    model, anchors, ranges, counts = build_model_and_anchors(cfg)
    batch_size = batch_size or int(cfg.data.get("samples_per_gpu", 8))
    test_cfg = cfg.test_cfg.to_dict()
    if strict:
        test_cfg = strict_eval_overrides(test_cfg)

    from .common import build_infer_for_cfg, head_type_from_cfg

    generic_head = head_type_from_cfg(cfg.model) != "RADetHead"

    tta = test_cfg.get("tta")
    if tta and tta.get("scales"):
        assert not generic_head, (
            "the `tta` config section drives the RADet vote-fuse TTA path; "
            "ATSSHead/AnchorHead models use single-scale inference "
            "(the reference's aug_test for them is an unreached mixin)"
        )
        from ..core.anchors import generate_anchors
        from .common import _build_bop, anchor_cfg_from_model, assignment_cfg_from

        model_cfg = cfg.model.to_dict()
        # assignment_cfg_from (not cfg.label_assignment directly): a verbatim
        # reference config carries anchor params only in the pipeline's
        # LabelAssignment entry
        anchor_cfg = anchor_cfg_from_model(model_cfg, assignment_cfg_from(cfg))
        data_cfg = cfg.data[split].to_dict()
        pipe = data_cfg["pipeline"]
        divisor = next(
            (t.get("size_divisor", 32) for t in pipe if t["type"] == "Pad"), 32
        )
        datasets, anchors_list, counts_list = [], [], []
        for s in tta["scales"]:
            s = tuple(s)  # (w, h)
            size_s = tta_padded_size(s, divisor)
            pipe_s = [
                dict(t, img_scale=s) if t["type"] == "Resize" else dict(t)
                for t in pipe
            ]
            datasets.append(
                _build_bop(cfg, dict(data_cfg, pipeline=pipe_s), True, input_size=size_s)
            )
            a, _, _, c = generate_anchors(size_s, anchor_cfg)
            anchors_list.append(a)
            counts_list.append(c)
        tta_mesh = _eval_mesh(cfg, batch_size)
        if tta_mesh is not None:
            variables = jax.device_put(variables, replicated_sharding(tta_mesh))
        results = run_tta_inference(
            model,
            variables,
            datasets,
            anchors_list=anchors_list,
            counts_list=counts_list,
            img_norm=cfg.img_norm_cfg.to_dict(),
            test_cfg=test_cfg,
            batch_size=batch_size,
            normalizer=normalizer_from_cfg(cfg),
            flip=bool(tta.get("flip", False)),
            mesh=tta_mesh,
        )
        dataset = datasets[0]
        if fmt_only:
            return dataset, results, None
        return dataset, results, evaluate_results(
        dataset, results, classwise=bool((eval_options or {}).get("classwise", False))
    )

    dataset = build_dataset(cfg, split)
    mesh = _eval_mesh(cfg, batch_size)
    if mesh is not None:
        variables = jax.device_put(variables, replicated_sharding(mesh))

    common_kwargs = dict(
        img_norm=cfg.img_norm_cfg.to_dict(),
        test_cfg=test_cfg,
        batch_size=batch_size,
        normalizer=normalizer_from_cfg(cfg),
        aug_flip=bool(cfg.test_cfg.get("flip_tta", False)),
        mesh=mesh,
    )
    h0, w0 = tuple(cfg.get("input_size", (480, 640)))
    has_portrait = any(i["height"] > i["width"] for i in dataset.data_infos)
    has_landscape = any(i["height"] < i["width"] for i in dataset.data_infos)
    # Any image whose orientation disagrees with input_size would overflow
    # the static pad target after keep_ratio resize (square images fit
    # either way).  Covers mixed datasets AND uniformly-counter-oriented
    # ones (e.g. all-portrait data with a landscape input_size).
    if (has_portrait and w0 > h0) or (has_landscape and h0 > w0):
        # The reference handles mixed aspect via GroupSampler grouping
        # (group_sampler.py:10-48); the static-shape equivalent is one
        # dataset VIEW + one compiled program per orientation (same trick as
        # the multi-scale TTA views), results merged for evaluation on the
        # full dataset (detections key on img_id, so order is irrelevant).
        from ..core.anchors import generate_anchors
        from .common import _build_bop, anchor_cfg_from_model, assignment_cfg_from

        anchor_cfg = anchor_cfg_from_model(
            cfg.model.to_dict(), assignment_cfg_from(cfg)
        )
        base = (min(h0, w0), max(h0, w0))
        data_cfg = cfg.data[split].to_dict()
        results = []
        for orient, size in (("landscape", base), ("portrait", (base[1], base[0]))):
            view = _build_bop(
                cfg, dict(data_cfg, orientation=orient), True, input_size=size
            )
            if not len(view):
                continue
            if generic_head:
                from ..core.anchor_generator import (
                    build_anchor_generator,
                    flat_anchors_for_input,
                )

                gen = build_anchor_generator(
                    dict(cfg.model.bbox_head["anchor_generator"])
                )
                a, _, c = flat_anchors_for_input(gen, size)
            else:
                a, _, _, c = generate_anchors(size, anchor_cfg)
            results += run_inference(
                model, variables, view, anchors=a, level_counts=c,
                infer_step=build_infer_for_cfg(cfg, model, a, c, test_cfg)
                if generic_head else None,
                **common_kwargs,
            )
    else:
        results = run_inference(
            model,
            variables,
            dataset,
            anchors=anchors,
            level_counts=counts,
            infer_step=build_infer_for_cfg(cfg, model, anchors, counts, test_cfg)
            if generic_head else None,
            **common_kwargs,
        )
    if fmt_only:
        return dataset, results, None
    return dataset, results, evaluate_results(
        dataset, results, classwise=bool((eval_options or {}).get("classwise", False))
    )
