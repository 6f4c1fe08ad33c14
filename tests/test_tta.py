import numpy as np

from radet_tpu.apis.test import _merge_flip_aug
from radet_tpu.models.postprocess import Detections


def test_flip_merge_unflips_and_fuses():
    # one image 100x120 (no resize: scale 1); one true box (10, 20, 50, 60)
    m = 5
    base_boxes = np.zeros((1, m, 4), np.float32)
    base_scores = np.zeros((1, m), np.float32)
    base_labels = np.zeros((1, m), np.int64)
    base_valid = np.zeros((1, m), bool)
    base_boxes[0, 0] = [10, 20, 50, 60]
    base_scores[0, 0] = 0.9
    base_labels[0, 0] = 2
    base_valid[0, 0] = True

    # the 'model' detects the same object in the flipped image at the
    # mirrored location: x1 = 120-50=70, x2 = 120-10=110
    def fake_infer(variables, images, shapes, scales):
        b = np.zeros((1, m, 4), np.float32)
        s = np.zeros((1, m), np.float32)
        l = np.zeros((1, m), np.int64)
        v = np.zeros((1, m), bool)
        b[0, 0] = [70, 20, 110, 60]
        s[0, 0] = 0.7
        l[0, 0] = 2
        v[0, 0] = True
        return Detections(b, s, l, v)

    batch = dict(
        image=np.zeros((1, 100, 120, 3), np.uint8),
        img_shape=np.asarray([[100.0, 120.0]], np.float32),
        scale_factor=np.ones((1, 4), np.float32),
    )
    test_cfg = dict(nms=dict(iou_threshold=0.5), max_per_img=5)
    ob, osc, ol, ov = _merge_flip_aug(
        fake_infer, None, batch, test_cfg,
        base_boxes, base_scores, base_labels, base_valid,
    )
    assert ov[0].sum() == 1  # the two detections fused into one cluster
    # voted box is a weighted blend of (10,20,50,60) and the unflipped
    # (120-110, 20, 120-70, 60) = (10, 20, 50, 60) -> exactly that box
    np.testing.assert_allclose(ob[0, 0], [10, 20, 50, 60], atol=1e-3)
    assert ol[0, 0] == 2
    np.testing.assert_allclose(osc[0, 0], 0.9, atol=1e-6)
