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
        from .common import build_infer_for_cfg

        self._infer = build_infer_for_cfg(cfg, model, anchors, counts)


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


def _prepare_batch(detector: Detector, imgs):
    """Host-side preprocessing shared by the sync and async entry points."""
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
    return np.stack(batch_imgs), np.stack(shapes), np.stack(scales)


def _gather_results(det, n: int) -> List[Dict[str, np.ndarray]]:
    boxes = np.asarray(det.boxes)
    scores = np.asarray(det.scores)
    labels = np.asarray(det.labels)
    valid = np.asarray(det.valid)
    out = []
    for i in range(n):
        keep = valid[i]
        out.append(
            dict(boxes=boxes[i][keep], scores=scores[i][keep], labels=labels[i][keep])
        )
    return out


def _check_weights(detector: Detector) -> None:
    if detector.variables is None:
        raise RuntimeError(
            "Detector has no weights loaded — construct it via init_detector() "
            "or assign detector.variables first"
        )


def inference_detector(detector: Detector, imgs) -> List[Dict[str, np.ndarray]]:
    """Run detection on image path(s) or RGB ndarray(s).

    Returns per-image dicts {boxes (M,4) xyxy in ORIGINAL image coords,
    scores (M,), labels (M,)}.
    """
    _check_weights(detector)
    single = not isinstance(imgs, (list, tuple))
    if single:
        imgs = [imgs]
    det = detector._infer(detector.variables, *_prepare_batch(detector, imgs))
    out = _gather_results(det, len(imgs))
    return out[0] if single else out


async def async_inference_detector(detector: Detector, imgs):
    """Async detection on image path(s) or RGB ndarray(s) (reference
    apis/inference.py:129-161 parity).

    TPU-native form: the compiled step dispatches asynchronously (XLA
    returns device futures immediately), and the blocking host work — image
    decode/resize before, device→host readback after — runs in the event
    loop's default executor, so concurrent requests overlap host
    preprocessing with device execution instead of serializing on the GIL.
    """
    import asyncio

    _check_weights(detector)
    single = not isinstance(imgs, (list, tuple))
    if single:
        imgs = [imgs]
    loop = asyncio.get_running_loop()
    batch = await loop.run_in_executor(None, _prepare_batch, detector, imgs)
    # The jitted call itself also runs in the executor: dispatch is normally
    # an async device-future return, but the FIRST call per batch shape
    # blocks for XLA trace+compile (seconds to minutes), and host->device
    # staging of the numpy batch is synchronous — neither may stall the
    # event loop.
    det = await loop.run_in_executor(
        None, detector._infer, detector.variables, *batch
    )
    out = await loop.run_in_executor(None, _gather_results, det, len(imgs))
    return out[0] if single else out


def show_result_pyplot(
    detector,
    img,
    result,
    score_thr: float = 0.3,
    fig_size: Tuple[int, int] = (15, 10),
    title: str = "result",
    out_file: Optional[str] = None,
):
    """Render a detection result with matplotlib (reference
    apis/inference.py:163-205 parity).

    Args:
        detector: Detector handle (class names are read from it) or None.
        img: image path or RGB ndarray.
        result: dict from :func:`inference_detector`.
        out_file: if given, save the figure instead of showing it (also the
            only useful mode on a headless host).
    Returns the drawn RGB image.
    """
    from ..utils.visualization import imshow_det_bboxes

    if isinstance(img, str):
        img = imread_rgb(img)
    class_names = tuple(getattr(detector, "classes", ()) or ()) or None
    drawn_bgr = imshow_det_bboxes(
        img,
        result["boxes"],
        result["labels"],
        result.get("scores"),
        class_names=class_names,
        score_thr=score_thr,
    )
    drawn = drawn_bgr[..., ::-1]  # BGR -> RGB for pyplot
    import matplotlib

    if out_file is not None:
        matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=fig_size)
    plt.imshow(drawn)
    plt.title(title)
    plt.axis("off")
    if out_file is not None:
        fig.savefig(out_file, bbox_inches="tight")
        plt.close(fig)
    else:
        plt.show()
    return drawn
