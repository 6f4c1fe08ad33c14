"""Programmatic single-image inference (reference apis/inference.py:16-129)."""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np

from ..data.pipeline import Pad, Resize, imread_rgb
from ..engine.checkpoint import load_weights
from ..engine.train_step import build_infer_step
from ..utils.config import Config
from .common import build_model_and_anchors, init_variables, normalizer_from_cfg


class Detector:
    """Bundled (model, variables, compiled infer step) handle."""

    def __init__(self, cfg, variables=None):
        self.cfg = cfg
        model, anchors, ranges, counts = build_model_and_anchors(cfg)
        self.model = model
        self.variables = variables  # may be attached after construction
        self.input_size = tuple(cfg.get("input_size", (480, 640)))
        self.classes = tuple(cfg.data.test.get("classes", ()) or ())
        self._infer = build_infer_step(
            model,
            anchors,
            counts,
            img_norm=cfg.img_norm_cfg.to_dict(),
            test_cfg=cfg.test_cfg.to_dict(),
            normalizer=normalizer_from_cfg(cfg),
        )


def show_result(img, result, class_names=None, score_thr=0.3, out_file=None):
    """Draw a detection result dict on an RGB image (BaseDetector.show_result
    parity, reference models/detectors/base.py:270)."""
    from ..utils.visualization import imshow_det_bboxes

    return imshow_det_bboxes(
        img,
        result["boxes"],
        result["labels"],
        result.get("scores"),
        class_names=class_names,
        score_thr=score_thr,
        out_file=out_file,
    )


def init_detector(config, checkpoint: Optional[str] = None, cfg_options=None) -> Detector:
    cfg = config if isinstance(config, Config) else Config.fromfile(config, cfg_options)
    detector = Detector(cfg, variables=None)
    variables = init_variables(detector.model, detector.input_size)
    if checkpoint:
        variables = load_weights(checkpoint, template=variables)
        if not detector.classes:
            # class names embedded at train time (checkpoint meta.json) —
            # the reference reads CLASSES from checkpoint meta the same way
            from ..engine.checkpoint import load_meta

            detector.classes = tuple(load_meta(checkpoint).get("classes", ()))
    detector.variables = variables
    return detector


def inference_detector(detector: Detector, imgs) -> List[Dict[str, np.ndarray]]:
    """Run detection on image path(s) or RGB ndarray(s).

    Returns per-image dicts {boxes (M,4) xyxy in ORIGINAL image coords,
    scores (M,), labels (M,)}.
    """
    if detector.variables is None:
        raise RuntimeError(
            "Detector has no weights loaded — construct it via init_detector() "
            "or assign detector.variables first"
        )
    single = not isinstance(imgs, (list, tuple))
    if single:
        imgs = [imgs]
    h, w = detector.input_size
    resize = Resize(img_scale=(w, h), keep_ratio=True)
    pad = Pad(size=(h, w))

    batch_imgs, shapes, scales = [], [], []
    for im in imgs:
        if isinstance(im, str):
            im = imread_rgb(im)
        results = {"img": im, "img_shape": im.shape[:2], "ori_shape": im.shape[:2]}
        results["scale_factor"] = np.ones(4, np.float32)
        results = pad(resize(results))
        batch_imgs.append(results["img"])
        shapes.append(np.asarray(results["img_shape"], np.float32))
        scales.append(results["scale_factor"])

    det = detector._infer(
        detector.variables,
        np.stack(batch_imgs),
        np.stack(shapes),
        np.stack(scales),
    )
    boxes = np.asarray(det.boxes)
    scores = np.asarray(det.scores)
    labels = np.asarray(det.labels)
    valid = np.asarray(det.valid)
    out = []
    for i in range(len(imgs)):
        keep = valid[i]
        out.append(
            dict(boxes=boxes[i][keep], scores=scores[i][keep], labels=labels[i][keep])
        )
    return out[0] if single else out
