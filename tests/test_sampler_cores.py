"""Sampler-core parity vs numpy transcriptions of the reference samplers
(/root/reference/radet/core/bbox/samplers/{ohem,iou_balanced_neg,
instance_balanced_pos,score_hlr,combined}_sampler.py).

Random draws cannot match the reference's torch RNG streams, so each test
checks what IS deterministic: selected-set identity for loss/score-ranked
cores (OHEM, ScoreHLR's HLR part), count vectors (per-bin, per-group,
totals) for the uniform-draw cores, and the shared quota arithmetic.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radet_tpu.core.sampler_cores import (
    combined_sample_masks,
    instance_balanced_pos_masks,
    iou_balanced_neg_masks,
    nms_match_groups,
    ohem_sample_masks,
    score_hlr_neg_masks,
)

KEY = jax.random.PRNGKey(0)


# ---------------------------------------------------------------------------
# OHEM
# ---------------------------------------------------------------------------


def test_ohem_selects_topk_loss():
    rng = np.random.RandomState(0)
    n = 200
    pos = rng.rand(n) < 0.1
    neg = ~pos & (rng.rand(n) < 0.7)
    loss = rng.rand(n).astype(np.float32)
    num, pf = 64, 0.25
    pos_s, neg_s = ohem_sample_masks(
        jnp.asarray(pos), jnp.asarray(neg), jnp.asarray(loss),
        num=num, pos_fraction=pf,
    )
    pos_s, neg_s = np.asarray(pos_s), np.asarray(neg_s)
    exp_pos = int(num * pf)
    # reference _sample_pos: keep all when under quota, else top-loss k
    want_pos = (
        pos if pos.sum() <= exp_pos
        else np.isin(np.arange(n), np.where(pos)[0][
            np.argsort(-loss[pos], kind="stable")[:exp_pos]])
    )
    np.testing.assert_array_equal(pos_s, want_pos)
    exp_neg = num - pos_s.sum()
    want_neg = np.isin(
        np.arange(n),
        np.where(neg)[0][np.argsort(-loss[neg], kind="stable")[:exp_neg]],
    )
    np.testing.assert_array_equal(neg_s, want_neg)


def test_ohem_under_quota_keeps_all_and_respects_ub():
    rng = np.random.RandomState(1)
    n = 50
    pos = np.zeros(n, bool)
    pos[:3] = True
    neg = np.zeros(n, bool)
    neg[10:40] = True
    loss = rng.rand(n).astype(np.float32)
    pos_s, neg_s = ohem_sample_masks(
        jnp.asarray(pos), jnp.asarray(neg), jnp.asarray(loss),
        num=32, pos_fraction=0.5, neg_pos_ub=3.0,
    )
    np.testing.assert_array_equal(np.asarray(pos_s), pos)  # 3 <= 16
    # neg quota = min(32 - 3, 3 * max(3, 1)) = 9 (base_sampler :81-86)
    assert int(np.asarray(neg_s).sum()) == 9


# ---------------------------------------------------------------------------
# IoUBalancedNegSampler — count-vector parity
# ---------------------------------------------------------------------------


def iou_balanced_counts_oracle(neg, max_overlaps, num_expected, floor_thr,
                               floor_fraction, num_bins):
    """Expected per-stage counts, transcribing iou_balanced_neg_sampler.py
    :96-157 (the uniform draws themselves are RNG; the counts are not)."""
    neg_idx = np.where(neg)[0]
    if len(neg_idx) <= num_expected:
        return dict(total=len(neg_idx))
    ov = max_overlaps
    if floor_thr > 0:
        floor = neg & (ov >= 0) & (ov < floor_thr)
        iou_set = neg & (ov >= floor_thr)
        eff_floor = floor_thr
    elif floor_thr == 0:
        floor = neg & (ov == 0)
        iou_set = neg & (ov > 0)
        eff_floor = 0.0
    else:
        floor = np.zeros_like(neg)
        iou_set = neg & (ov > floor_thr)
        eff_floor = 0.0
    quota_iou = int(num_expected * (1 - floor_fraction))
    if iou_set.sum() > quota_iou and num_bins >= 2:
        # reference sample_via_interval: max over ALL anchors (:58)
        max_iou = ov.max()
        interval = (max_iou - eff_floor) / num_bins
        per_bin = int(quota_iou / num_bins)
        bin_counts = []
        for b in range(num_bins):
            lo = eff_floor + b * interval
            hi = eff_floor + (b + 1) * interval
            m = iou_set & (ov >= lo) & (ov < hi)
            bin_counts.append(min(m.sum(), per_bin))
        n_binned = sum(bin_counts)
        n_iou = min(quota_iou, iou_set.sum())  # after in-interval top-up
    else:
        bin_counts = None
        n_iou = min(quota_iou, int(iou_set.sum()))
    n_floor = min(num_expected - n_iou, int(floor.sum()))
    total = min(num_expected, int(neg.sum()))
    return dict(total=total, n_iou=n_iou, n_floor=n_floor,
                bin_counts=bin_counts, iou_set=iou_set, floor=floor)


@pytest.mark.parametrize(
    "floor_thr,floor_fraction,num_bins",
    [(-1.0, 0.0, 3), (0.1, 0.4, 3), (0.0, 0.5, 2), (-1.0, 0.0, 1)],
)
def test_iou_balanced_counts(floor_thr, floor_fraction, num_bins):
    rng = np.random.RandomState(7)
    n = 300
    neg = rng.rand(n) < 0.8
    ov = np.where(rng.rand(n) < 0.3, 0.0, rng.rand(n) * 0.5).astype(np.float32)
    num_expected = 60
    sel = np.asarray(
        iou_balanced_neg_masks(
            KEY, jnp.asarray(neg), jnp.asarray(ov), num_expected,
            floor_thr=floor_thr, floor_fraction=floor_fraction,
            num_bins=num_bins,
        )
    )
    want = iou_balanced_counts_oracle(
        neg, ov, num_expected, floor_thr, floor_fraction, num_bins
    )
    assert sel.sum() == want["total"]
    assert not sel[~neg].any()
    if "iou_set" in want:
        # the IoU-side and floor-side counts match the staged arithmetic
        assert sel[want["iou_set"]].sum() >= want["n_iou"] - 0  # exact below
        # floor only fills after the IoU quota: exact split check
        assert sel[want["iou_set"]].sum() + sel[want["floor"]].sum() == want[
            "total"
        ]


def test_iou_balanced_under_quota_keeps_all():
    neg = np.zeros(40, bool)
    neg[:10] = True
    ov = np.linspace(0, 0.4, 40).astype(np.float32)
    sel = np.asarray(
        iou_balanced_neg_masks(KEY, jnp.asarray(neg), jnp.asarray(ov), 30)
    )
    np.testing.assert_array_equal(sel, neg)


# ---------------------------------------------------------------------------
# InstanceBalancedPosSampler — per-group quota parity
# ---------------------------------------------------------------------------


def test_instance_balanced_group_quotas():
    rng = np.random.RandomState(3)
    n, max_gt = 120, 8
    assigned = np.zeros(n, np.int32)
    # 3 gts with 30/12/3 positives
    assigned[:30] = 1
    assigned[30:42] = 2
    assigned[42:45] = 3
    pos = assigned > 0
    num_expected = 20
    sel = np.asarray(
        instance_balanced_pos_masks(
            KEY, jnp.asarray(pos), jnp.asarray(assigned), num_expected,
            max_gt=max_gt,
        )
    )
    assert not sel[~pos].any()
    # reference: num_per_gt = round(20/3)+1 = 8; group draws min(count, 8)
    # = 8+8+3 = 19 < 20 -> one top-up -> exactly 20
    assert sel.sum() == num_expected
    counts = [sel[assigned == g].sum() for g in (1, 2, 3)]
    assert counts[2] == 3  # small group kept whole
    # groups exceed quota only via the single top-up draw
    assert max(counts[0], counts[1]) <= 9


def test_instance_balanced_under_quota_keeps_all():
    assigned = np.zeros(50, np.int32)
    assigned[:5] = 1
    pos = assigned > 0
    sel = np.asarray(
        instance_balanced_pos_masks(
            KEY, jnp.asarray(pos), jnp.asarray(assigned), 16, max_gt=8
        )
    )
    np.testing.assert_array_equal(sel, pos)


def test_instance_balanced_downsample_to_quota():
    # num_per_gt large relative to quota -> over-selection -> downsample
    assigned = np.ones(40, np.int32)
    pos = assigned > 0
    sel = np.asarray(
        instance_balanced_pos_masks(
            KEY, jnp.asarray(pos), jnp.asarray(assigned), 10, max_gt=8
        )
    )
    assert sel.sum() == 10


# ---------------------------------------------------------------------------
# ScoreHLR — deterministic HLR part vs a transcription oracle
# ---------------------------------------------------------------------------


def nms_match_oracle(boxes, scores, valid, thr):
    """Greedy nms-match (mmcv.ops.nms_match semantics): descending score,
    seed absorbs unmatched boxes with IoU > thr."""
    def iou(a, b):
        lt = np.maximum(a[:2], b[:, :2])
        rb = np.minimum(a[2:], b[:, 2:])
        wh = np.clip(rb - lt, 0, None)
        inter = wh[:, 0] * wh[:, 1]
        aa = (a[2] - a[0]) * (a[3] - a[1])
        ab = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        return inter / np.maximum(aa + ab - inter, 1e-6)

    idx = np.where(valid)[0]
    order = idx[np.argsort(-scores[idx], kind="stable")]
    groups = []
    unmatched = set(order.tolist())
    for seed in order:
        if seed not in unmatched:
            continue
        members = [seed]
        unmatched.discard(seed)
        rest = np.asarray(sorted(unmatched))
        if len(rest):
            m = rest[iou(boxes[seed], boxes[rest]) > thr]
            ms = sorted(m.tolist(), key=lambda i: -scores[i])
            members += ms
            unmatched -= set(m.tolist())
        groups.append(members)
    return groups


def test_nms_match_groups_vs_oracle():
    rng = np.random.RandomState(11)
    n = 60
    xy = rng.uniform(0, 50, (n, 2))
    wh = rng.uniform(5, 25, (n, 2))
    boxes = np.concatenate([xy, xy + wh], 1).astype(np.float32)
    scores = rng.rand(n).astype(np.float32)
    valid = rng.rand(n) < 0.8
    seed_ids, rank = nms_match_groups(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.5
    )
    seed_ids, rank = np.asarray(seed_ids), np.asarray(rank)
    groups = nms_match_oracle(boxes, scores, valid, 0.5)
    for g in groups:
        seed = g[0]
        for r, member in enumerate(g):
            assert seed_ids[member] == seed, (member, seed)
            assert rank[member] == r, (member, r, rank[member])
    assert (seed_ids[~valid] == -1).all()


def score_hlr_oracle(neg, scores, boxes, num_expected, score_thr, iou_thr,
                     k, bias):
    """Deterministic part of ScoreHLRSampler._sample_neg (:100-216): the
    HLR-selected indices and their weights (the random fill is RNG)."""
    neg_idx = np.where(neg)[0]
    valid = neg & (scores > score_thr)
    num_valid = int(valid.sum())
    num_exp = min(len(neg_idx), num_expected)
    num_hlr = min(num_valid, num_exp)
    if num_valid == 0:
        return np.zeros_like(neg), None
    groups = nms_match_oracle(boxes, scores, valid, iou_thr)
    imp = np.zeros(len(neg))
    for g in groups:
        for r, member in enumerate(g):
            imp[member] = num_valid - r + scores[member]
    vidx = np.where(valid)[0]
    order = vidx[np.argsort(-imp[vidx], kind="stable")]
    hlr = order[:num_hlr]
    sel = np.zeros_like(neg)
    sel[hlr] = True
    up = max(num_exp, num_valid)
    w = np.zeros(len(neg))
    ranks = np.empty(len(order), int)
    ranks[np.argsort(-imp[order], kind="stable")] = np.arange(len(order))
    for i, member in enumerate(order[:num_hlr]):
        w[member] = (up - i) / up
    w = np.where(sel, (bias + (1 - bias) * w) ** k, 0.0)
    return sel, w


def test_score_hlr_matches_oracle_hlr_part():
    rng = np.random.RandomState(13)
    n = 80
    neg = rng.rand(n) < 0.9
    scores = (rng.rand(n) * 0.6).astype(np.float32)
    xy = rng.uniform(0, 60, (n, 2))
    wh = rng.uniform(5, 20, (n, 2))
    boxes = np.concatenate([xy, xy + wh], 1).astype(np.float32)
    num_expected = 30
    sel, weights = score_hlr_neg_masks(
        KEY, jnp.asarray(neg), jnp.asarray(scores), jnp.asarray(boxes),
        num_expected, score_thr=0.05, iou_thr=0.5, k=0.5, bias=0.0,
    )
    sel, weights = np.asarray(sel), np.asarray(weights)
    want_sel, want_w = score_hlr_oracle(
        neg, scores, boxes, num_expected, 0.05, 0.5, 0.5, 0.0
    )
    valid = neg & (scores > 0.05)
    num_valid = int(valid.sum())
    num_hlr = min(num_valid, min(int(neg.sum()), num_expected))
    # HLR part: identical selected set and weights
    np.testing.assert_array_equal(sel & valid, want_sel & valid)
    np.testing.assert_allclose(weights[valid], want_w[valid], rtol=1e-5)
    # random fill from the invalid pool, at the min HLR weight
    assert sel.sum() == min(int(neg.sum()), num_expected)
    rand_part = sel & ~valid
    if rand_part.any():
        min_hlr_w = want_w[want_sel & valid].min()
        np.testing.assert_allclose(
            weights[rand_part], min_hlr_w ** 1.0, rtol=1e-5
        )


def test_score_hlr_all_invalid_fallback():
    rng = np.random.RandomState(17)
    n = 30
    neg = np.ones(n, bool)
    scores = np.zeros(n, np.float32)  # nothing above score_thr
    boxes = np.tile(np.asarray([0, 0, 10, 10], np.float32), (n, 1))
    sel, weights = score_hlr_neg_masks(
        KEY, jnp.asarray(neg), jnp.asarray(scores), jnp.asarray(boxes), 12
    )
    assert int(np.asarray(sel).sum()) == 12
    np.testing.assert_allclose(np.asarray(weights)[np.asarray(sel)], 1.0)


# ---------------------------------------------------------------------------
# CombinedSampler — quota arithmetic across component samplers
# ---------------------------------------------------------------------------


def test_combined_quota_arithmetic():
    rng = np.random.RandomState(19)
    n, max_gt = 200, 8
    assigned = np.zeros(n, np.int32)
    assigned[:40] = rng.randint(1, 4, 40)
    pos = assigned > 0
    neg = ~pos
    ov = (rng.rand(n) * 0.4).astype(np.float32)
    pos_s, neg_s = combined_sample_masks(
        KEY, jnp.asarray(pos), jnp.asarray(neg),
        num=64, pos_fraction=0.25, neg_pos_ub=2.0,
        pos_sampler="instance_balanced", neg_sampler="iou_balanced",
        assigned_gt=jnp.asarray(assigned), max_gt=max_gt,
        max_overlaps=jnp.asarray(ov), floor_thr=0.1, floor_fraction=0.5,
    )
    np_pos = int(np.asarray(pos_s).sum())
    np_neg = int(np.asarray(neg_s).sum())
    assert np_pos == 16  # int(64 * 0.25), 40 positives available
    assert np_neg == min(64 - np_pos, int(2.0 * max(np_pos, 1)))
    assert not np.asarray(pos_s)[neg].any()
    assert not np.asarray(neg_s)[pos].any()


# ---------------------------------------------------------------------------
# Config-reachable: every sampler type drives the dense AnchorHead loss
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "stype,extra",
    [
        ("RandomSampler", ()),
        ("OHEMSampler", ()),
        ("IoUBalancedNegSampler", (("floor_thr", 0.05), ("num_bins", 3))),
        ("InstanceBalancedPosSampler", ()),
        ("ScoreHLRSampler", (("score_thr", 0.3),)),
        ("CombinedSampler", (("pos_sampler", "instance_balanced"),
                             ("neg_sampler", "iou_balanced"))),
    ],
)
def test_anchor_head_loss_with_each_sampler(stype, extra):
    from radet_tpu.core.box_coder import delta_decode, delta_encode
    from radet_tpu.models.anchor_loss import anchor_head_loss

    rng = np.random.RandomState(31)
    b, n, c, g = 2, 96, 4, 5
    # anchor grid
    cx, cy = np.meshgrid(np.arange(12) * 8 + 4, np.arange(8) * 8 + 4)
    anchors = np.stack(
        [cx.ravel() - 16, cy.ravel() - 16, cx.ravel() + 16, cy.ravel() + 16],
        axis=1,
    ).astype(np.float32)
    gt = np.zeros((b, 8, 4), np.float32)
    gt_valid = np.zeros((b, 8), bool)
    for i in range(b):
        xy = rng.uniform(0, 60, (g, 2))
        wh = rng.uniform(10, 30, (g, 2))
        gt[i, :g] = np.concatenate([xy, xy + wh], 1)
        gt_valid[i, :g] = True
    gt_labels = rng.randint(0, c, (b, 8)).astype(np.int32)
    cls_flat = jnp.asarray(rng.randn(b, n, c).astype(np.float32))
    reg_flat = jnp.asarray(rng.randn(b, n, 4).astype(np.float32) * 0.1)

    losses = anchor_head_loss(
        cls_flat, reg_flat, jnp.asarray(anchors), jnp.asarray(gt),
        jnp.asarray(gt_labels), jnp.asarray(gt_valid),
        num_classes=c,
        encode_fn=lambda a, gb: delta_encode(a, gb),
        decode_fn=lambda a, d: delta_decode(a, d),
        cls_loss="CrossEntropyLoss",
        sampler_num=32, sampler_pos_fraction=0.25,
        sampler_type=stype, sampler_extra=extra,
        rng=jax.random.PRNGKey(5),
    )
    for k, v in losses.items():
        assert np.isfinite(float(v)), (stype, k, float(v))
    assert float(losses["num_pos"]) > 0


def test_anchor_head_spec_accepts_sampler_zoo():
    """apis/common.py exposes the zoo through train_cfg.sampler.type with
    the reference config schema (incl. CombinedSampler's nested dicts)."""
    from radet_tpu.apis.common import anchor_head_spec
    from radet_tpu.utils import Config

    cfg = Config(
        dict(
            model=dict(
                type="SingleStageDetector",
                backbone=dict(depth=18),
                neck=dict(out_channels=32, num_outs=5),
                bbox_head=dict(
                    type="AnchorHead", num_classes=3, in_channels=32,
                    loss_cls=dict(type="CrossEntropyLoss", use_sigmoid=True),
                    anchor_generator=dict(
                        type="AnchorGenerator", ratios=[1.0],
                        octave_base_scale=8, scales_per_octave=1,
                        strides=[8, 16, 32, 64, 128]),
                    bbox_coder=dict(type="DeltaXYWHBBoxCoder"),
                ),
            ),
            train_cfg=dict(
                assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.5,
                              neg_iou_thr=0.4),
                sampler=dict(
                    type="CombinedSampler", num=64, pos_fraction=0.25,
                    pos_sampler=dict(type="InstanceBalancedPosSampler"),
                    neg_sampler=dict(type="IoUBalancedNegSampler",
                                     floor_thr=-1, num_bins=3),
                ),
            ),
            input_size=(128, 160),
        )
    )
    spec = anchor_head_spec(cfg)
    lk = spec["loss_kwargs"]
    assert lk["sampler_type"] == "CombinedSampler"
    extra = dict(lk["sampler_extra"])
    assert extra["pos_sampler"] == "instance_balanced"
    assert extra["neg_sampler"] == "iou_balanced"
    assert lk["sampler_num"] == 64
