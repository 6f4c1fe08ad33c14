from .anchors import AnchorConfig, anchor_featmap_sizes, generate_anchors, anchor_centers
from .box_coder import tblr_encode, tblr_decode
from .box_ops import (
    bbox_iou_pairwise,
    bbox_iou_aligned,
    bbox_giou_aligned,
    bbox_area,
    xyxy_to_xywh,
    xywh_to_xyxy,
)

__all__ = [
    "AnchorConfig",
    "anchor_featmap_sizes",
    "generate_anchors",
    "anchor_centers",
    "tblr_encode",
    "tblr_decode",
    "bbox_iou_pairwise",
    "bbox_iou_aligned",
    "bbox_giou_aligned",
    "bbox_area",
    "xyxy_to_xywh",
    "xywh_to_xyxy",
]
