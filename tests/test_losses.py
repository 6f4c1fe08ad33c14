import jax.numpy as jnp
import numpy as np

from radet_tpu.ops import bce_with_logits, giou_loss, sigmoid_focal_loss


def _sigmoid(x):
    return 1 / (1 + np.exp(-x))


def _focal_np(logits, labels, num_classes, gamma=2.0, alpha=0.25):
    n, c = logits.shape
    target = np.zeros((n, c))
    for i, l in enumerate(labels):
        if l < num_classes:
            target[i, l] = 1
    p = _sigmoid(logits)
    ce = -(target * np.log(p) + (1 - target) * np.log(1 - p))
    pt = p * target + (1 - p) * (1 - target)
    fw = (alpha * target + (1 - alpha) * (1 - target)) * (1 - pt) ** gamma
    return (ce * fw).sum(-1)


def test_focal_loss_matches_numpy(rng):
    logits = rng.randn(30, 5).astype(np.float32)
    labels = rng.randint(0, 6, 30)  # 5 = background
    weight = rng.uniform(0, 2, 30).astype(np.float32)
    want = (_focal_np(logits, labels, 5) * weight).sum() / 7.0
    got = float(
        sigmoid_focal_loss(
            jnp.asarray(logits),
            jnp.asarray(labels),
            jnp.asarray(weight),
            num_classes=5,
            avg_factor=7.0,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_bce_soft_targets():
    logits = jnp.asarray([0.0, 2.0, -2.0])
    targets = jnp.asarray([0.5, 1.0, 0.0])
    got = float(bce_with_logits(logits, targets))
    p = _sigmoid(np.array([0.0, 2.0, -2.0]))
    t = np.array([0.5, 1.0, 0.0])
    want = float((-(t * np.log(p) + (1 - t) * np.log(1 - p))).sum())
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_giou_loss_zero_for_identical():
    boxes = jnp.asarray([[0.0, 0, 10, 10], [5, 5, 20, 30]])
    assert float(giou_loss(boxes, boxes, loss_weight=1.0)) < 1e-5
