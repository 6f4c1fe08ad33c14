"""Fused vote-NMS as a single Pallas TPU kernel.

One kernel invocation per image (grid over the batch) performs the whole
vote-NMS pipeline in VMEM with no HBM round-trips between stages:

  1. pairwise IoU + same-label adjacency (K x K, f32, VMEM-resident),
  2. the parallel-greedy keep-mask fixed point (lax.while_loop of
     masked matrix-vector products on the MXU),
  3. lowest-index-seed membership assignment,
  4. weighted coordinate voting with the 1-sigma refilter
     (two masked matmuls per coordinate).

Inputs must be pre-sorted by descending cluster score with invalid slots
last (models/postprocess.py does a global top-k that returns exactly this).
Semantics are identical to ops/vote_nms.py::vote_nms_device_fast (same
fixed-point formulation), which is itself exact-parity-tested against the
sequential C++-semantics oracle.

K must be a multiple of 128 (MXU lane width).

Status: exact-parity-tested (interpret + compiled); practical for K <= 256.
Mosaic compile time grows superlinearly with the single-block (K, K) ops
(K=128 ~9 s, K=256 ~67 s, K=512 times out in this harness), so the default
production path remains ops/vote_nms.py::vote_nms_device_fast — the same
algorithm expressed in XLA HLO, which the TPU compiler handles well at
K=1024.  Select this kernel with test_cfg ``nms_impl='pallas'`` +
``nms_topk<=256``; a tiled multi-block rewrite would lift the K limit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _nms_kernel(
    boxes_ref,  # (K, 4) f32, sorted by cluster score desc
    cscore_ref,  # (1, K) f32
    vscore_ref,  # (1, K) f32
    labels_ref,  # (1, K) i32
    valid_ref,  # (1, K) i32 (0/1)
    voted_ref,  # out (K, 4) f32
    keep_ref,  # out (1, K) i32
    *,
    iou_threshold: float,
    iou_enable: bool,
    sigma: float,
    global_mode: bool,
):
    k = boxes_ref.shape[0]
    boxes = boxes_ref[:]  # (K, 4)
    labels = labels_ref[0, :]  # (K,)
    # NB masks are carried as f32: Mosaic cannot reshape 1-bit vectors to 2D
    valid_f = (valid_ref[0, :] > 0).astype(jnp.float32)  # (K,)
    vscore = vscore_ref[0, :]

    x1 = boxes[:, 0]
    y1 = boxes[:, 1]
    x2 = boxes[:, 2]
    y2 = boxes[:, 3]
    # pairwise IoU (rows = seed i, cols = box j)
    xl = jnp.maximum(x1[:, None], x1[None, :])
    yt = jnp.maximum(y1[:, None], y1[None, :])
    xr = jnp.minimum(x2[:, None], x2[None, :])
    yb = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.maximum(xr - xl, 0.0) * jnp.maximum(yb - yt, 0.0)
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    iou = inter / jnp.maximum(area[:, None] + area[None, :] - inter, 1e-12)

    same_label = (labels[:, None] == labels[None, :]).astype(jnp.float32)
    pair_valid = valid_f[:, None] * valid_f[None, :]
    ok_f = (iou > iou_threshold).astype(jnp.float32) * same_label * pair_valid

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    lower_f = (col_ids < row_ids).astype(jnp.float32)  # blockers: j before i
    blockers = ok_f * lower_f  # (K, K)

    def cond(state):
        _, changed = state
        return changed

    def body(state):
        keep, _ = state
        blocked = jax.lax.dot_general(
            blockers,
            keep[:, None],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[:, 0]
        new_keep = valid_f * (blocked < 0.5).astype(jnp.float32)
        return new_keep, jnp.any(new_keep != keep)

    keep, _ = jax.lax.while_loop(cond, body, (valid_f, True))

    if global_mode:
        # only the first kept seed per label survives
        earlier_same = same_label * lower_f * keep[None, :]
        dup = jnp.sum(earlier_same, axis=1)
        keep = keep * (dup < 0.5).astype(jnp.float32)

    # membership: lowest-index kept seed covering each box (diag of ok is
    # True for valid boxes since IoU(i,i)=1)
    upper_incl = (row_ids <= col_ids).astype(jnp.float32)
    cand = ok_f * upper_incl * keep[:, None]  # (seed, box)
    seed_idx = jnp.min(
        jnp.where(cand > 0.5, row_ids, k).astype(jnp.int32), axis=0
    )  # (K,)
    member = (row_ids == seed_idx[None, :]).astype(jnp.float32) * cand

    if iou_enable:
        w = member * vscore[None, :] * jnp.exp(-((1.0 - iou) ** 2) / sigma)
    else:
        w = member * vscore[None, :]

    wsum = jnp.maximum(
        jax.lax.dot_general(
            w, jnp.ones((k, 1), jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ),
        1e-12,
    )  # (K, 1)
    mean = (
        jax.lax.dot_general(w, boxes, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        / wsum
    )  # (K, 4)
    sq = jax.lax.dot_general(
        w, boxes * boxes, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) / wsum
    sig = jnp.sqrt(jnp.maximum(sq - mean * mean, 0.0))
    lo = mean - sig
    hi = mean + sig

    voted_cols = []
    for c in range(4):
        xc = boxes[:, c]
        inlier = (
            (xc[None, :] >= lo[:, c][:, None]) & (xc[None, :] <= hi[:, c][:, None])
        ).astype(jnp.float32)
        w2 = w * inlier
        denom = jax.lax.dot_general(
            w2, jnp.ones((k, 1), jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[:, 0]
        num = jax.lax.dot_general(
            w2, xc[:, None], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )[:, 0]
        voted_cols.append(jnp.where(denom > 0, num / jnp.maximum(denom, 1e-12), mean[:, c]))

    voted_ref[:] = jnp.stack(voted_cols, axis=-1)
    keep_ref[0, :] = keep.astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("iou_threshold", "max_out", "iou_enable", "sigma", "global_mode", "interpret"),
)
def vote_nms_pallas(
    boxes,  # (B, K, 4) SORTED by cluster score desc, invalid last
    cluster_scores,  # (B, K)
    vote_scores,  # (B, K)
    labels,  # (B, K) int32
    valid,  # (B, K) bool
    *,
    iou_threshold: float = 0.65,
    max_out: int = 100,
    iou_enable: bool = False,
    sigma: float = 0.025,
    global_mode: bool = False,
    interpret: bool = False,
):
    """Batched fused vote-NMS. Same outputs as vote_nms_device_fast (vmapped):
    (boxes (B,max_out,4), labels, scores, valid)."""
    b, k, _ = boxes.shape
    assert k % 128 == 0, f"K must be a multiple of 128, got {k}"

    kernel = functools.partial(
        _nms_kernel,
        iou_threshold=iou_threshold,
        iou_enable=iou_enable,
        sigma=sigma,
        global_mode=global_mode,
    )
    voted, keep = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((None, k, 4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, k, 4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, k, 4), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, k), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        boxes.astype(jnp.float32),
        cluster_scores[:, None, :].astype(jnp.float32),
        vote_scores[:, None, :].astype(jnp.float32),
        labels[:, None, :].astype(jnp.int32),
        valid[:, None, :].astype(jnp.int32),
    )
    keep = keep[:, 0, :] > 0  # (B, K)

    # pack kept seeds (already score-ordered by index) into max_out slots
    idx = jnp.arange(k)
    rank = jnp.cumsum(keep, axis=1) - 1
    slot = jnp.where(keep & (rank < max_out), rank, max_out)

    def pack(values, fill, dtype):
        out = jnp.full((b, max_out + 1) + values.shape[2:], fill, dtype)
        bidx = jnp.arange(b)[:, None].repeat(k, 1)
        return out.at[bidx, slot].set(values)[:, :max_out]

    out_boxes = pack(jnp.where(keep[..., None], voted, 0.0), 0.0, jnp.float32)
    out_scores = pack(jnp.where(keep, cluster_scores, 0.0), 0.0, jnp.float32)
    out_labels = pack(jnp.where(keep, labels, -1), -1, jnp.int32)
    out_valid = pack(keep, False, bool)
    return out_boxes, out_labels, out_scores, out_valid
