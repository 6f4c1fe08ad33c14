from .losses import sigmoid_focal_loss, giou_loss, bce_with_logits
from .vote_nms import (
    batched_nms_device,
    vote_nms_device,
    vote_nms_device_fast,
    vote_nms_numpy,
)

__all__ = [
    "sigmoid_focal_loss",
    "giou_loss",
    "bce_with_logits",
    "vote_nms_device",
    "vote_nms_device_fast",
    "vote_nms_numpy",
    "batched_nms_device",
]
