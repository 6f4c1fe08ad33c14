"""candidate_mode='global' (TPU-first default) must agree with
candidate_mode='per_level' (strict reference semantics) whenever the
score-threshold survivors fit the caps — i.e. every non-pathological scene."""

import jax.numpy as jnp
import numpy as np

from radet_tpu.core import generate_anchors
from radet_tpu.models.postprocess import get_bboxes


def _maps_with_detections(rng, c=4, n_boxes=12):
    anchors, _, _, counts = generate_anchors((128, 160))
    sizes = [(16, 20), (8, 10), (4, 5), (2, 3), (1, 2)]
    cls_list = [np.full((1, h, w, c), -8.0, np.float32) for h, w in sizes]
    reg_list = [np.abs(rng.randn(1, h, w, 4)).astype(np.float32) + 1.0 for h, w in sizes]
    iou_list = [rng.randn(1, h, w, 1).astype(np.float32) for h, w in sizes]
    for _ in range(n_boxes):
        lvl = rng.randint(0, 3)
        h, w = sizes[lvl]
        i, j, k = rng.randint(0, h), rng.randint(0, w), rng.randint(0, c)
        cls_list[lvl][0, i, j, k] = rng.uniform(1.0, 5.0)
    return cls_list, reg_list, iou_list, np.split(anchors, np.cumsum(counts)[:-1])


def test_global_matches_per_level(rng):
    cls_list, reg_list, iou_list, level_anchors = _maps_with_detections(rng)
    shapes = jnp.asarray([[128.0, 160.0]])
    scales = jnp.ones((1, 4))
    base = dict(
        nms_pre=1000,
        score_thr=0.05,
        max_per_img=50,
        nms=dict(
            type="vote", iou_threshold=0.65,
            cluster_score=["cls", "iou"], vote_score=["iou", "cls"],
        ),
    )
    outs = {}
    for mode, approx in [("global", False), ("global", True), ("per_level", False)]:
        cfg = dict(base, candidate_mode=mode, approx_topk=approx)
        det = get_bboxes(
            [jnp.asarray(x) for x in cls_list],
            [jnp.asarray(x) for x in reg_list],
            [jnp.asarray(x) for x in iou_list],
            level_anchors,
            shapes,
            scales,
            test_cfg=cfg,
        )
        n = int(np.asarray(det.valid).sum())
        outs[(mode, approx)] = (
            np.asarray(det.boxes[0])[:n],
            np.asarray(det.scores[0])[:n],
            np.asarray(det.labels[0])[:n],
        )
    for key in [("global", False), ("global", True)]:
        gb, gs, gl = outs[key]
        pb, ps, pl = outs[("per_level", False)]
        assert len(gb) == len(pb) > 0, (key, len(gb), len(pb))
        np.testing.assert_allclose(gb, pb, rtol=1e-4, atol=1e-3, err_msg=str(key))
        np.testing.assert_allclose(gs, ps, rtol=1e-5, err_msg=str(key))
        np.testing.assert_array_equal(gl, pl, err_msg=str(key))
