from .gaussian_target import gaussian_radius, gen_gaussian_target
from .losses import (
    accuracy,
    bce_with_logits,
    giou_loss,
    l1_loss,
    sigmoid_focal_loss,
    smooth_l1_loss,
)
from .vote_nms import (
    batched_nms_device,
    fast_nms_device,
    vote_nms_device,
    vote_nms_device_fast,
    vote_nms_numpy,
)

__all__ = [
    "gaussian_radius",
    "gen_gaussian_target",
    "sigmoid_focal_loss",
    "giou_loss",
    "bce_with_logits",
    "smooth_l1_loss",
    "l1_loss",
    "accuracy",
    "vote_nms_device",
    "vote_nms_device_fast",
    "vote_nms_numpy",
    "batched_nms_device",
    "fast_nms_device",
]
