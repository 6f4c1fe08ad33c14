# RetinaNet-style AnchorHead detector on YCB-V PBR: 3 octave scales x
# 3 ratios = 9 anchors/cell, MaxIoU assignment, focal + SmoothL1 losses.
#
# Exercises the reference's registered AnchorHead
# (/root/reference/radet/models/dense_heads/anchor_head.py:14) through its
# standard anchor-based loss path (:373-488) with the multi-anchor
# generator (anchor_generator.py:58-110) and DeltaXYWH coder.
_base_ = ["./atss_r50_fpn_ycbv_pbr.py"]

model = dict(
    bbox_head=dict(
        _delete_=True,
        type="AnchorHead",
        num_classes=21,
        in_channels=256,
        feat_channels=256,
        anchor_generator=dict(
            type="AnchorGenerator",
            ratios=[0.5, 1.0, 2.0],
            octave_base_scale=4,
            scales_per_octave=3,
            strides=[8, 16, 32, 64, 128],
        ),
        bbox_coder=dict(
            type="DeltaXYWHBBoxCoder",
            target_means=[0.0, 0.0, 0.0, 0.0],
            target_stds=[1.0, 1.0, 1.0, 1.0],
        ),
        loss_cls=dict(
            type="FocalLoss", use_sigmoid=True, gamma=2.0, alpha=0.25,
            loss_weight=1.0,
        ),
        loss_bbox=dict(type="SmoothL1Loss", beta=0.11, loss_weight=1.0),
    ),
)

train_cfg = dict(
    assigner=dict(
        _delete_=True,
        type="MaxIoUAssigner",
        pos_iou_thr=0.5,
        neg_iou_thr=0.4,
        min_pos_iou=0.0,
        ignore_iof_thr=-1,
    ),
    allowed_border=-1,
    pos_weight=-1,
)

work_dir = "work_dirs/ycbv_retina_anchorhead_r50"
