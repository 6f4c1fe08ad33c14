"""The jitted train/eval step builders.

This is the TPU replacement for the reference's mmcv IterBasedRunner +
DDP + OptimizerHook stack (/root/reference/radet/apis/train.py:36-169,
models/detectors/base.py:220-268): one jit-compiled function performs
uint8 normalization, the forward pass, on-device label assignment, the RADet
loss, gradients, clipping and the optimizer update.  Under a data mesh the
gradient all-reduce is inserted by XLA (parallel/mesh.py).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.anchors import AnchorConfig, generate_anchors
from ..core.assignment import assign_labels
from ..models.detector import flatten_head_outputs, preprocess_images
from ..models.postprocess import Detections, get_bboxes
from ..models.radet_loss import radet_loss


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def build_train_step(
    model,
    tx,
    anchors: np.ndarray,
    regress_ranges: np.ndarray,
    *,
    img_norm: Dict[str, Any],
    num_classes: int,
    assignment_cfg: Dict[str, Any] | None = None,
    normalizer: float = 1.0 / 8.0,
    loss_weights: Dict[str, float] | None = None,
    loss_cfg: Dict[str, Any] | None = None,
):
    """Returns train_step(state, batch, rng_key) -> (state, metrics)."""
    assignment_cfg = dict(assignment_cfg or {})
    positive_num = int(assignment_cfg.get("positive_num", 10))
    neg_threshold = float(assignment_cfg.get("neg_threshold", 0.2))
    balance_sample = bool(assignment_cfg.get("balance_sample", True))
    adapt_positive_num = bool(assignment_cfg.get("adapt_positive_num", False))
    random_sample_by_distance = bool(
        assignment_cfg.get("random_sample_by_distance", True)
    )
    multiply_samplepro_for_weight = bool(
        assignment_cfg.get("multiply_samplepro_for_weight", False)
    )
    ambiguous_sample = str(assignment_cfg.get("ambiguous_sample", "min_area"))
    assign_impl = str(assignment_cfg.get("impl", "auto"))
    # loss_cfg comes from the reference-style bbox_head loss dicts
    # (apis/common.py::loss_cfg_from); loss_weights is the legacy override
    lc = dict(
        cls=1.0, bbox=2.0, iou=1.0,
        focal_gamma=2.0, focal_alpha=0.25,
        bbox_type="GIoULoss", bbox_extra=(),
    )
    lc.update(loss_cfg or {})
    lc.update(loss_weights or {})
    lw = lc
    anchors_j = jnp.asarray(anchors)
    ranges_j = jnp.asarray(regress_ranges)
    mean = tuple(img_norm["mean"])
    std = tuple(img_norm["std"])
    dtype = model.dtype

    def assign_batch(key, batch):
        b = batch["gt_boxes"].shape[0]
        keys = jax.random.split(key, b)
        return jax.vmap(
            lambda k, gb, gv, dv: assign_labels(
                k,
                anchors_j,
                ranges_j,
                gb,
                gv,
                dv,
                positive_num=positive_num,
                neg_threshold=neg_threshold,
                balance_sample=balance_sample,
                adapt_positive_num=adapt_positive_num,
                random_sample_by_distance=random_sample_by_distance,
                multiply_samplepro_for_weight=multiply_samplepro_for_weight,
                ambiguous_sample=ambiguous_sample,
                impl=assign_impl,
            )
        )(keys, batch["gt_boxes"], batch["gt_valid"], batch["dist_vals"])

    def loss_fn(params, batch_stats, batch, assign):
        x = preprocess_images(batch["image"], mean, std, dtype)
        # batch_stats is mutable so norm_eval=False (live BatchNorm) works;
        # with norm_eval=True (the RADet default) it passes through unchanged
        outs, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x,
            train=True,
            mutable=["batch_stats"],
        )
        cls_flat, reg_flat, iou_flat = flatten_head_outputs(*outs)
        losses = radet_loss(
            cls_flat,
            reg_flat,
            iou_flat,
            anchors_j,
            batch["gt_boxes"],
            batch["gt_labels"],
            assign.gt_idx,
            assign.weight,
            num_classes=num_classes,
            normalizer=normalizer,
            focal_gamma=lw["focal_gamma"],
            focal_alpha=lw["focal_alpha"],
            cls_loss_weight=lw["cls"],
            bbox_loss_weight=lw["bbox"],
            iou_loss_weight=lw["iou"],
            bbox_loss_type=lw["bbox_type"],
            bbox_loss_extra=tuple(lw["bbox_extra"]),
        )
        total = losses["loss_cls"] + losses["loss_bbox"] + losses["loss_iou"]
        return total, (losses, mutated.get("batch_stats", batch_stats))

    # donate the input state: params/opt_state buffers are updated in place
    # instead of copied each step (the caller rebinds `state` every iteration)
    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch, rng_key):
        step_key = jax.random.fold_in(rng_key, state.step)
        assign = assign_batch(step_key, batch)
        (total, (losses, new_batch_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch, assign)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(losses)
        metrics["loss"] = total
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )
        return new_state, metrics

    return train_step


def build_train_step_anchor(
    model,
    tx,
    anchors: np.ndarray,  # (N, 4) flat multi-level anchors (generator order)
    num_level_anchors,  # static per-level anchor counts
    *,
    img_norm: Dict[str, Any],
    num_classes: int,
    spec: Dict[str, Any],
):
    """Train step for the generic anchor-based heads (ATSSHead/AnchorHead).

    ``spec`` is apis.common.anchor_head_spec(cfg): head_type, coder
    encode/decode closures, assigner kwargs, loss kwargs, optional anchor
    valid mask.  Same jit/donation structure as the RADet step; assignment
    is deterministic (IoU-based) — the rng key feeds only the optional
    RandomSampler (loss_kwargs['sampler_num'] > 0).
    """
    from ..models.anchor_heads import flatten_anchor_outputs
    from ..models.anchor_loss import anchor_head_loss, atss_loss

    head_type = spec["head_type"]
    anchors_j = jnp.asarray(anchors)
    counts = tuple(int(c) for c in num_level_anchors)
    valid_mask = spec.get("valid_mask")
    valid_j = None if valid_mask is None else jnp.asarray(valid_mask)
    mean = tuple(img_norm["mean"])
    std = tuple(img_norm["std"])
    dtype = model.dtype

    def loss_fn(params, batch_stats, batch, rng_key):
        x = preprocess_images(batch["image"], mean, std, dtype)
        outs, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x,
            train=True,
            mutable=["batch_stats"],
        )
        if head_type == "ATSSHead":
            cls_list, reg_list, ctr_list = outs
            cls_flat = flatten_anchor_outputs(cls_list, num_classes)
            reg_flat = flatten_anchor_outputs(reg_list, 4)
            ctr_flat = flatten_anchor_outputs(ctr_list, 1)[..., 0]
            losses = atss_loss(
                cls_flat,
                reg_flat,
                ctr_flat,
                anchors_j,
                counts,
                batch["gt_boxes"],
                batch["gt_labels"],
                batch["gt_valid"],
                num_classes=num_classes,
                encode_fn=spec["encode_fn"],
                decode_fn=spec["decode_fn"],
                valid_mask=valid_j,
                **spec["loss_kwargs"],
            )
        else:
            cls_list, reg_list = outs
            c_out = cls_list[0].shape[-1] // model.num_base_anchors
            cls_flat = flatten_anchor_outputs(cls_list, c_out)
            reg_flat = flatten_anchor_outputs(reg_list, 4)
            losses = anchor_head_loss(
                cls_flat,
                reg_flat,
                anchors_j,
                batch["gt_boxes"],
                batch["gt_labels"],
                batch["gt_valid"],
                num_classes=num_classes,
                encode_fn=spec["encode_fn"],
                decode_fn=spec["decode_fn"],
                valid_mask=valid_j,
                rng=rng_key,
                **spec["loss_kwargs"],
            )
        total = sum(v for k, v in losses.items() if k.startswith("loss_"))
        return total, (losses, mutated.get("batch_stats", batch_stats))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch, rng_key):
        (total, (losses, new_batch_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch, rng_key)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(losses)
        metrics["loss"] = total
        metrics["grad_norm"] = optax.global_norm(grads)
        return (
            TrainState(
                step=state.step + 1,
                params=new_params,
                batch_stats=new_batch_stats,
                opt_state=new_opt_state,
            ),
            metrics,
        )

    return train_step


def build_infer_step_anchor(
    model,
    anchors: np.ndarray,
    level_counts,
    *,
    img_norm: Dict[str, Any],
    test_cfg: Dict[str, Any],
    spec: Dict[str, Any],
    rescale: bool = True,
):
    """Compiled inference for ATSSHead/AnchorHead models: forward +
    per-level row top-k + delta decode + class-aware NMS, one program."""
    from ..models.postprocess import get_bboxes_anchor

    head_type = spec["head_type"]
    level_anchors = np.split(anchors, np.cumsum(level_counts)[:-1])
    mean = tuple(img_norm["mean"])
    std = tuple(img_norm["std"])
    dtype = model.dtype
    decode_fn = spec["decode_fn"]

    @jax.jit
    def infer(variables, images_u8, img_shapes, scale_factors) -> Detections:
        x = preprocess_images(images_u8, mean, std, dtype)
        outs = model.apply(variables, x, train=False)
        factor_list = outs[2] if head_type == "ATSSHead" else None
        return get_bboxes_anchor(
            outs[0],
            outs[1],
            factor_list,
            level_anchors,
            img_shapes,
            scale_factors,
            decode_fn,
            test_cfg=test_cfg,
            rescale=rescale,
        )

    return infer


def build_infer_step(
    model,
    anchors: np.ndarray,
    level_counts,
    *,
    img_norm: Dict[str, Any],
    test_cfg: Dict[str, Any],
    normalizer: float = 1.0 / 8.0,
    rescale: bool = True,
):
    """Returns infer(variables, images_u8, img_shapes, scale_factors) ->
    Detections — the whole reference tools/test.py hot loop (SURVEY.md §3.2)
    as one compiled function."""
    level_anchors = np.split(anchors, np.cumsum(level_counts)[:-1])
    mean = tuple(img_norm["mean"])
    std = tuple(img_norm["std"])
    dtype = model.dtype

    @jax.jit
    def infer(variables, images_u8, img_shapes, scale_factors) -> Detections:
        x = preprocess_images(images_u8, mean, std, dtype)
        outs = model.apply(variables, x, train=False)
        return get_bboxes(
            *outs,
            level_anchors,
            img_shapes,
            scale_factors,
            test_cfg=test_cfg,
            normalizer=normalizer,
            rescale=rescale,
        )

    return infer
