"""ATSSHead / AnchorHead training losses — pure jitted dense functions.

Semantic parity with the reference loss stacks, re-expressed as masked
arithmetic over the static (B, N) anchor grid (no per-image python loops,
no dynamic gathers — GT attributes are selected by one-hot MXU
contractions, see core.anchor_assign.assigned_to_dense_targets):

- ``atss_loss`` == ATSSHead.loss/loss_single/get_targets
  (/root/reference/radet/models/dense_heads/atss_head.py:147-303,481-653):
  on-device ATSS assignment, focal cls loss with
  ``avg_factor = sum_i max(num_pos_i, 1)``, quality-weighted GIoU bbox loss
  normalized by the global quality-weight sum, BCE centerness loss.  The
  reference's ``reduce_mean`` across replicas composes with DDP loss
  averaging into exactly these GLOBAL sums, so one dense global computation
  reproduces the distributed math (proof in the docstrings below).
- ``anchor_head_loss`` == AnchorHead.loss/loss_single/_get_targets_single
  (anchor_head.py:172-488): MaxIoU assignment, delta-encoded SmoothL1 (or
  decoded IoU-family) bbox loss, focal or sigmoid-CE cls loss with the
  sampling-dependent normalizer.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..core.anchor_assign import (
    assigned_to_dense_targets,
    atss_assign,
    max_iou_assign,
)
from ..core.box_ops import bbox_iou_aligned
from ..ops.losses import (
    BBOX_LOSS_FNS,
    bce_with_logits,
    sigmoid_focal_loss,
)

EPS = 1e-12


def centerness_target(anchors, target_boxes, pos):
    """FCOS-style centerness of each anchor CENTER within its target box
    (reference atss_head.py:305-321), masked to positives.

    The reference asserts no NaNs because ATSS positives have centers
    strictly inside their GT; the dense form clamps the masked-out lanes
    instead (their value is multiplied by 0 anyway, but NaN*0 = NaN)."""
    acx = (anchors[..., 0] + anchors[..., 2]) * 0.5
    acy = (anchors[..., 1] + anchors[..., 3]) * 0.5
    l_ = acx - target_boxes[..., 0]
    t_ = acy - target_boxes[..., 1]
    r_ = target_boxes[..., 2] - acx
    b_ = target_boxes[..., 3] - acy
    lr_min = jnp.minimum(l_, r_)
    lr_max = jnp.maximum(jnp.maximum(l_, r_), EPS)
    tb_min = jnp.minimum(t_, b_)
    tb_max = jnp.maximum(jnp.maximum(t_, b_), EPS)
    c = jnp.sqrt(
        jnp.clip(lr_min / lr_max, 0.0) * jnp.clip(tb_min / tb_max, 0.0)
    )
    return jnp.where(pos, c, 0.0)


def atss_loss(
    cls_flat,  # (B, N, C) logits
    reg_flat,  # (B, N, 4) encoded deltas
    ctr_flat,  # (B, N) centerness logits
    anchors,  # (N, 4)
    num_level_anchors: Tuple[int, ...],
    gt_boxes,  # (B, G, 4)
    gt_labels,  # (B, G) int32
    gt_valid,  # (B, G) bool
    *,
    num_classes: int,
    encode_fn,
    decode_fn,
    topk: int = 9,
    quality: str = "centerness",  # 'centerness' | 'iou' (atss_head.py:200-205)
    focal_gamma: float = 2.0,
    focal_alpha: float = 0.25,
    cls_loss_weight: float = 1.0,
    bbox_loss_type: str = "GIoULoss",
    bbox_loss_weight: float = 2.0,
    bbox_loss_extra: tuple = (),
    centerness_loss_weight: float = 1.0,
    valid_mask=None,  # optional (N,) anchor valid flags
) -> Dict[str, jnp.ndarray]:
    """Dense global ATSS loss.

    Distributed-math note: the reference computes
    ``num_total_samples = reduce_mean(sum_i max(pos_i, 1))`` per replica and
    DDP averages the replica losses; algebraically
    ``(1/R) * sum_r [sum_r_focal / mean]  ==  sum_focal / sum_i max(pos_i, 1)``
    over ALL images — the global form below.  Same for the bbox
    normalizer (atss_head.py:278-299).
    """
    b, n, c = cls_flat.shape

    assigned = jax.vmap(
        lambda gb, gv: atss_assign(
            anchors, num_level_anchors, gb, gv, topk=topk,
            inside_mask=valid_mask,
        )[0]
    )(gt_boxes, gt_valid)  # (B, N)

    labels, target_boxes, pos = jax.vmap(
        lambda a, gb, gl: assigned_to_dense_targets(a, gb, gl, num_classes)
    )(assigned, gt_boxes, gt_labels)

    label_weights = jnp.ones((b, n), jnp.float32)
    if valid_mask is not None:
        label_weights = label_weights * valid_mask[None].astype(jnp.float32)
        pos = pos & valid_mask[None]

    num_pos_img = pos.sum(axis=1)
    num_total_samples = jnp.maximum(
        jnp.maximum(num_pos_img, 1).sum().astype(jnp.float32), 1.0
    )

    loss_cls = sigmoid_focal_loss(
        cls_flat.reshape(-1, c),
        labels.reshape(-1),
        label_weights.reshape(-1),
        num_classes=num_classes,
        gamma=focal_gamma,
        alpha=focal_alpha,
        avg_factor=num_total_samples,
        loss_weight=cls_loss_weight,
    )

    # positives-only box terms, computed densely and masked
    bbox_targets = encode_fn(anchors[None], target_boxes)  # (B, N, 4)
    decoded_pred = decode_fn(anchors[None], reg_flat)
    decoded_target = decode_fn(anchors[None], bbox_targets)
    if quality == "centerness":
        q = centerness_target(anchors[None], decoded_target, pos)
    else:  # 'iou': detached IoU(pred, target) (atss_head.py:204-205)
        q = jax.lax.stop_gradient(
            jnp.where(pos, bbox_iou_aligned(decoded_pred, decoded_target), 0.0)
        )
    q = jnp.where(pos, q, 0.0)

    bbox_avg = q.sum()
    bbox_loss_fn = BBOX_LOSS_FNS[bbox_loss_type]
    loss_bbox = bbox_loss_fn(
        decoded_pred,
        decoded_target,
        weight=q,
        # reference: avg_factor=1 per level, then /= reduce_mean(sum q)
        # guarded below EPS -> 1 (atss_head.py:295-299)
        avg_factor=jnp.where(bbox_avg < EPS, 1.0, bbox_avg),
        loss_weight=bbox_loss_weight,
        **dict(bbox_loss_extra),
    )
    loss_centerness = bce_with_logits(
        ctr_flat,
        q,
        weight=pos.astype(jnp.float32),
        avg_factor=num_total_samples,
        loss_weight=centerness_loss_weight,
    )
    return dict(
        loss_cls=loss_cls,
        loss_bbox=loss_bbox,
        loss_centerness=loss_centerness,
        num_pos=num_pos_img.sum().astype(jnp.float32),
    )


def random_sample_masks(key, pos, neg, *, num, pos_fraction, neg_pos_ub=-1.0):
    """mmdet RandomSampler as static-shape masks, one image.

    Reference semantics (core/bbox/samplers/base_sampler.py:59-103 +
    random_sampler.py:41-78): sample up to ``int(num*pos_fraction)``
    positives uniformly without replacement, then up to
    ``num - num_sampled_pos`` negatives (capped at ``neg_pos_ub *
    max(num_sampled_pos, 1)`` when ``neg_pos_ub >= 0``).

    TPU form: uniform-without-replacement subsampling of a masked set ==
    rank the set's members by an i.i.d. uniform key and keep ranks below
    the quota.  Ranks come from one argsort over the anchor axis (the XLA
    sort is bandwidth-efficient at N~2e4); the quota for negatives is a
    traced scalar, so the whole thing stays one fused masked pass — no
    dynamic shapes, no host round trip.
    """
    n = pos.shape[-1]
    kp, kn = jax.random.split(key)

    def ranks_within(mask, k):
        u = jax.random.uniform(k, (n,))
        order = jnp.argsort(-jnp.where(mask, u, -jnp.inf))  # members first
        return jnp.zeros((n,), jnp.int32).at[order].set(
            jnp.arange(n, dtype=jnp.int32)
        )

    num_expected_pos = int(num * pos_fraction)
    pos_s = pos & (ranks_within(pos, kp) < num_expected_pos)
    num_sampled_pos = pos_s.sum()
    num_expected_neg = num - num_sampled_pos
    if neg_pos_ub >= 0:
        neg_cap = (neg_pos_ub * jnp.maximum(num_sampled_pos, 1)).astype(
            num_expected_neg.dtype
        )
        num_expected_neg = jnp.minimum(num_expected_neg, neg_cap)
    neg_s = neg & (ranks_within(neg, kn) < num_expected_neg)
    return pos_s, neg_s


def anchor_head_loss(
    cls_flat,  # (B, N, C) logits
    reg_flat,  # (B, N, 4) encoded deltas
    anchors,  # (N, 4)
    gt_boxes,
    gt_labels,
    gt_valid,
    *,
    num_classes: int,
    encode_fn,
    decode_fn,
    pos_iou_thr: float = 0.5,
    neg_iou_thr=0.4,
    min_pos_iou: float = 0.0,
    gt_max_assign_all: bool = True,
    match_low_quality: bool = True,
    cls_loss: str = "FocalLoss",  # 'FocalLoss' | 'CrossEntropyLoss' (sigmoid)
    focal_gamma: float = 2.0,
    focal_alpha: float = 0.25,
    cls_loss_weight: float = 1.0,
    bbox_loss_type: str = "SmoothL1Loss",
    bbox_loss_weight: float = 1.0,
    smooth_l1_beta: float = 1.0 / 9.0,
    reg_decoded_bbox: bool = False,
    pos_weight: float = -1.0,
    valid_mask=None,
    # Sampler (train_cfg.sampler; num=0 = PseudoSampler, i.e. keep all).
    # mmdet only samples when ``sampling`` is True (non-focal loss_cls,
    # anchor_head.py:62-70) — enforced by apis.common.anchor_head_spec.
    # sampler_type routes through the full zoo (core/sampler_cores.py):
    # RandomSampler here; OHEM/IoUBalancedNeg/InstanceBalancedPos/ScoreHLR/
    # Combined via sample_with, with sampler_extra carrying their options.
    sampler_num: int = 0,
    sampler_pos_fraction: float = 0.5,
    sampler_neg_pos_ub: float = -1.0,
    sampler_type: str = "RandomSampler",
    sampler_extra: tuple = (),
    rng=None,  # PRNGKey, required when sampler_num > 0
) -> Dict[str, jnp.ndarray]:
    """Dense AnchorHead loss (MaxIoU assignment + Pseudo/Random sampler).

    ``sampling`` (anchor_head.py:62-64) is False for FocalLoss —
    ``num_total_samples`` is then the positive count; for sigmoid-CE it is
    pos+neg (both as sum_i max(count_i, 1), :354-355,466-467).  With a
    RandomSampler, pos/neg weighting and all counts come from the SAMPLED
    sets (unsampled assigned anchors keep their targets but carry zero
    weight — numerically identical to mmdet's index-gathered form).
    """
    b, n, c = cls_flat.shape

    assigned, max_overlaps = jax.vmap(
        lambda gb, gv: max_iou_assign(
            anchors,
            gb,
            gv,
            pos_iou_thr=pos_iou_thr,
            neg_iou_thr=neg_iou_thr,
            min_pos_iou=min_pos_iou,
            gt_max_assign_all=gt_max_assign_all,
            match_low_quality=match_low_quality,
        )
    )(gt_boxes, gt_valid)  # (B, N): -1 ignore / 0 neg / g+1 pos

    labels, target_boxes, pos = jax.vmap(
        lambda a, gb, gl: assigned_to_dense_targets(a, gb, gl, num_classes)
    )(assigned, gt_boxes, gt_labels)
    neg = assigned == 0
    if valid_mask is not None:
        pos = pos & valid_mask[None]
        neg = neg & valid_mask[None]

    sampling = cls_loss not in ("FocalLoss", "GHMC", "QualityFocalLoss")
    neg_weights = None
    if sampler_num > 0:
        assert sampling, (
            "samplers are only active for sampling losses (mmdet "
            "anchor_head.py:62-70 ignores train_cfg.sampler under FocalLoss)"
        )
        assert rng is not None, "samplers need the step rng key"
        if sampler_type == "RandomSampler":
            pos, neg = jax.vmap(
                lambda k, p, ng: random_sample_masks(
                    k, p, ng,
                    num=sampler_num,
                    pos_fraction=sampler_pos_fraction,
                    neg_pos_ub=sampler_neg_pos_ub,
                )
            )(jax.random.split(rng, b), pos, neg)
        else:
            from ..core.sampler_cores import sample_with

            # per-anchor current sigmoid-CE loss: the OHEM/ScoreHLR ranking
            # signal (the reference re-forwards its RoI head for this —
            # the dense path has the logits in hand)
            tgt = jax.nn.one_hot(labels, c, dtype=jnp.float32)  # bg -> zeros
            x = cls_flat.astype(jnp.float32)
            per_loss = jax.lax.stop_gradient(
                (jnp.maximum(x, 0) - x * tgt + jnp.log1p(jnp.exp(-jnp.abs(x))))
                .sum(-1)
            )
            max_fg = jax.lax.stop_gradient(
                jax.nn.sigmoid(cls_flat.astype(jnp.float32)).max(-1)
            )
            decoded = jax.lax.stop_gradient(decode_fn(anchors[None], reg_flat))
            max_gt = gt_boxes.shape[1]
            pos, neg, neg_weights = jax.vmap(
                lambda k, p, ng, pl, mo, a, db, mf: sample_with(
                    sampler_type, k, p, ng,
                    num=sampler_num,
                    pos_fraction=sampler_pos_fraction,
                    neg_pos_ub=sampler_neg_pos_ub,
                    per_loss=pl, max_overlaps=mo, assigned=a, max_gt=max_gt,
                    decoded_boxes=db, max_fg_score=mf, extra=sampler_extra,
                )
            )(
                jax.random.split(rng, b), pos, neg, per_loss, max_overlaps,
                assigned, decoded, max_fg,
            )

    pw = 1.0 if pos_weight <= 0 else float(pos_weight)
    nw = 1.0 if neg_weights is None else neg_weights
    label_weights = jnp.where(pos, pw, jnp.where(neg, nw, 0.0))

    num_pos_img = pos.sum(axis=1)
    num_neg_img = neg.sum(axis=1)
    num_total_pos = jnp.maximum(num_pos_img, 1).sum().astype(jnp.float32)
    num_total_neg = jnp.maximum(num_neg_img, 1).sum().astype(jnp.float32)
    num_total_samples = num_total_pos + (num_total_neg if sampling else 0.0)
    num_total_samples = jnp.maximum(num_total_samples, 1.0)

    if cls_loss == "FocalLoss":
        loss_cls = sigmoid_focal_loss(
            cls_flat.reshape(-1, c),
            labels.reshape(-1),
            label_weights.reshape(-1),
            num_classes=num_classes,
            gamma=focal_gamma,
            alpha=focal_alpha,
            avg_factor=num_total_samples,
            loss_weight=cls_loss_weight,
        )
    elif cls_loss == "CrossEntropyLoss":
        # sigmoid binary CE over the C foreground channels (mmdet
        # use_sigmoid=True convention; background = all-zero target)
        onehot = jax.nn.one_hot(labels, num_classes, dtype=cls_flat.dtype)
        loss_cls = bce_with_logits(
            cls_flat,
            onehot,
            weight=label_weights[..., None],
            avg_factor=num_total_samples,
            loss_weight=cls_loss_weight,
        )
    else:
        raise ValueError(f"unsupported AnchorHead loss_cls {cls_loss!r}")

    posf = pos.astype(jnp.float32)
    if reg_decoded_bbox:
        # loss on decoded boxes; target is the raw GT box
        # (anchor_head.py:236-240,410-412)
        decoded_pred = decode_fn(anchors[None], reg_flat)
        loss_bbox = BBOX_LOSS_FNS[bbox_loss_type](
            decoded_pred,
            target_boxes,
            weight=posf,
            avg_factor=num_total_samples,
            loss_weight=bbox_loss_weight,
        )
    else:
        from ..ops.losses import l1_loss, smooth_l1_loss

        bbox_targets = jnp.where(
            pos[..., None], encode_fn(anchors[None], target_boxes), 0.0
        )
        reg_masked = jnp.where(pos[..., None], reg_flat, 0.0)
        if bbox_loss_type == "SmoothL1Loss":
            loss_bbox = smooth_l1_loss(
                reg_masked,
                bbox_targets,
                beta=smooth_l1_beta,
                weight=posf[..., None],
                avg_factor=num_total_samples,
                loss_weight=bbox_loss_weight,
            )
        elif bbox_loss_type == "L1Loss":
            loss_bbox = l1_loss(
                reg_masked,
                bbox_targets,
                weight=posf[..., None],
                avg_factor=num_total_samples,
                loss_weight=bbox_loss_weight,
            )
        else:
            raise ValueError(
                f"loss_bbox {bbox_loss_type!r} on encoded deltas is not a "
                "reference configuration (use reg_decoded_bbox=True for "
                "IoU-family losses)"
            )
    return dict(
        loss_cls=loss_cls,
        loss_bbox=loss_bbox,
        num_pos=num_pos_img.sum().astype(jnp.float32),
    )
