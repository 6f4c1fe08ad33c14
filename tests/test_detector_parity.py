"""Full-detector numerical parity vs a torch transcription of the reference.

Round-1 left checkpoint-import fidelity proven only for the ResNet backbone;
this suite closes the gap (VERDICT.md item 1): a minimal torch RADet detector
— FPN with extra 'on_output' convs (/root/reference/radet/models/necks/
fpn.py:66-221), GN conv towers + cls/reg/iou heads + per-level Scale
(/root/reference/radet/models/dense_heads/atss_head.py:52-145), and the
RADet ReLU on bbox_pred (radet_head.py:27-30) — is built with mmdet state-dict
naming, converted through tools/convert_torch_weights.convert_mmdet_detector,
and the flax detector must reproduce:

1. every per-level cls/reg/iou output map to <=1e-4, and
2. the final decoded + vote-NMS'd detections end-to-end, where the expected
   detections come from an independent numpy transcription of the reference
   candidate-selection semantics (radet_head.py:55-169: per-level sigmoid +
   score_thr prefilter + top-k nms_pre, TBLR decode with border clamp
   (core/bbox/coder/tblr_bbox_coder.py:117-170), rescale-before-NMS) feeding
   the sequential vote-NMS oracle.

This is the strongest AP-parity proxy available without real BOP data /
released .pth files (those still require an egress-enabled machine).
"""

import os.path as osp
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "tools"))
from convert_torch_weights import convert_mmdet_detector  # noqa: E402
from test_weight_conversion import TorchResNet50, _randomize_bn_stats  # noqa: E402

pytestmark = pytest.mark.slow

FEAT = 64  # divisible by GN's 32 groups
STACKED = 2
NCLS = 4
IMG_H, IMG_W = 128, 160
NORMALIZER = 1.0 / 8.0
TEST_CFG = dict(
    nms_pre=1000,
    min_bbox_size=0,
    score_thr=0.05,
    nms=dict(
        type="vote",
        iou_threshold=0.65,
        cluster_score=["cls", "iou"],
        vote_score=["iou", "cls"],
        iou_enable=False,
        sigma=0.025,
    ),
    max_per_img=100,
    candidate_mode="per_level",
    nms_impl="fast",
)


class _WrapConv(tnn.Module):
    """mmcv ConvModule with no norm/act: exposes a '.conv' submodule."""

    def __init__(self, cin, cout, k, stride=1, padding=0):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, stride=stride, padding=padding)

    def forward(self, x):
        return self.conv(x)


class _ConvGN(tnn.Module):
    """mmcv ConvModule(conv_cfg=None, norm_cfg=GN32): conv -> gn -> relu."""

    def __init__(self, cin, cout):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, 3, padding=1, bias=False)
        self.gn = tnn.GroupNorm(32, cout)

    def forward(self, x):
        return tF.relu(self.gn(self.conv(x)))


class _Scale(tnn.Module):
    def __init__(self, scale=1.0):
        super().__init__()
        self.scale = tnn.Parameter(torch.tensor(scale, dtype=torch.float32))

    def forward(self, x):
        return x * self.scale


class TorchFPN(tnn.Module):
    """start_level=1 over (C2..C5), nearest top-down, 2 extra stride-2 convs
    'on_output' (relu_before_extra_convs=False), no norm — the RADet config
    (fpn.py:169-221, configs/bop/r50_ycbv_pbr.py:23-29)."""

    def __init__(self, in_channels=(512, 1024, 2048), out=FEAT):
        super().__init__()
        self.lateral_convs = tnn.ModuleList(
            [_WrapConv(c, out, 1) for c in in_channels]
        )
        self.fpn_convs = tnn.ModuleList(
            [_WrapConv(out, out, 3, padding=1) for _ in in_channels]
            + [_WrapConv(out, out, 3, stride=2, padding=1) for _ in range(2)]
        )

    def forward(self, inputs):  # inputs = (C2, C3, C4, C5)
        laterals = [l(inputs[i + 1]) for i, l in enumerate(self.lateral_convs)]
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + tF.interpolate(
                laterals[i], size=laterals[i - 1].shape[2:], mode="nearest"
            )
        outs = [self.fpn_convs[i](laterals[i]) for i in range(len(laterals))]
        outs.append(self.fpn_convs[3](outs[-1]))
        outs.append(self.fpn_convs[4](outs[-1]))
        return tuple(outs)


class TorchRADetHead(tnn.Module):
    """ATSS tower + RADet forward_single (atss_head.py:52-145 as specialized
    by radet_head.py:27-30: reg = relu(scale * atss_reg(feat)))."""

    def __init__(self, ncls=NCLS, feat=FEAT, stacked=STACKED, levels=5):
        super().__init__()
        self.cls_convs = tnn.ModuleList([_ConvGN(feat, feat) for _ in range(stacked)])
        self.reg_convs = tnn.ModuleList([_ConvGN(feat, feat) for _ in range(stacked)])
        self.atss_cls = tnn.Conv2d(feat, ncls, 3, padding=1)
        self.atss_reg = tnn.Conv2d(feat, 4, 3, padding=1)
        self.atss_centerness = tnn.Conv2d(feat, 1, 3, padding=1)
        self.scales = tnn.ModuleList([_Scale(1.0) for _ in range(levels)])

    def forward(self, feats):
        cls_out, reg_out, iou_out = [], [], []
        for lvl, x in enumerate(feats):
            cls_feat, reg_feat = x, x
            for conv in self.cls_convs:
                cls_feat = conv(cls_feat)
            for conv in self.reg_convs:
                reg_feat = conv(reg_feat)
            cls_out.append(self.atss_cls(cls_feat))
            reg_out.append(tF.relu(self.scales[lvl](self.atss_reg(reg_feat))))
            iou_out.append(self.atss_centerness(reg_feat))
        return cls_out, reg_out, iou_out


class TorchRADet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.backbone = TorchResNet50()
        self.neck = TorchFPN()
        self.bbox_head = TorchRADetHead()

    def forward(self, x):
        return self.bbox_head(self.neck(self.backbone(x)))


def _randomize(model, rng):
    """Non-degenerate weights: small conv stds, spread GN affine, cls biases
    straddling the 0.05 score threshold so the candidate set is non-trivial."""
    with torch.no_grad():
        _randomize_bn_stats(model.backbone, rng)
        for name, m in model.named_modules():
            if isinstance(m, tnn.Conv2d) and not name.startswith("backbone"):
                m.weight.copy_(
                    torch.tensor(
                        rng.randn(*m.weight.shape) * 0.05, dtype=torch.float32
                    )
                )
                if m.bias is not None:
                    m.bias.copy_(
                        torch.tensor(rng.randn(*m.bias.shape) * 0.1, dtype=torch.float32)
                    )
            if isinstance(m, tnn.GroupNorm):
                m.weight.copy_(
                    torch.tensor(rng.randn(m.num_channels) * 0.3 + 1.0, dtype=torch.float32)
                )
                m.bias.copy_(
                    torch.tensor(rng.randn(m.num_channels) * 0.2, dtype=torch.float32)
                )
        # cls bias around sigmoid^-1(0.05) ~= -2.94 with spread: a mixed
        # over/under-threshold score population
        model.bbox_head.atss_cls.bias.copy_(
            torch.tensor(rng.randn(NCLS) * 1.5 - 2.9, dtype=torch.float32)
        )
        # reg bias > 0 so decoded boxes have real extent after the ReLU
        model.bbox_head.atss_reg.bias.copy_(
            torch.tensor(rng.rand(4) * 2.0 + 0.5, dtype=torch.float32)
        )
        for i, s in enumerate(model.bbox_head.scales):
            s.scale.copy_(torch.tensor(1.0 + 0.15 * i, dtype=torch.float32))


@pytest.fixture(scope="module")
def parity_models():
    import flax
    import jax

    from radet_tpu.models import build_detector

    # torch's default generator is what initializes the backbone convs
    # (_randomize only overwrites non-backbone weights) — pin it, or the
    # candidate set near the 0.05 score threshold varies run to run
    torch.manual_seed(7)
    rng = np.random.RandomState(7)
    tmodel = TorchRADet()
    _randomize(tmodel, rng)
    tmodel.eval()

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    flat = {}
    convert_mmdet_detector(sd, flat)
    variables = flax.traverse_util.unflatten_dict(flat)

    fmodel = build_detector(
        dict(
            type="RADet",
            backbone=dict(depth=50),
            neck=dict(out_channels=FEAT, start_level=1, num_outs=5),
            bbox_head=dict(num_classes=NCLS, stacked_convs=STACKED, feat_channels=FEAT),
        )
    )
    # structural sanity (the converted tree must be exactly the init tree)
    import jax.numpy as jnp

    ref_vars = fmodel.init(
        jax.random.PRNGKey(0), jnp.zeros((1, IMG_H, IMG_W, 3)), train=False
    )
    fv = flax.traverse_util.flatten_dict(ref_vars)
    fc = flax.traverse_util.flatten_dict(variables)
    assert set(fv) == set(fc), (
        sorted(set(fv) - set(fc))[:5],
        sorted(set(fc) - set(fv))[:5],
    )
    x = rng.rand(2, IMG_H, IMG_W, 3).astype(np.float32) * 4 - 2
    return tmodel, fmodel, variables, x


def test_detector_forward_parity(parity_models):
    """Every per-level output map matches torch to <=1e-4 — guards the FPN
    wiring, GN tower, Scale and head-conv transcription in the converter."""
    import jax.numpy as jnp

    tmodel, fmodel, variables, x = parity_models
    with torch.no_grad():
        t_cls, t_reg, t_iou = tmodel(torch.tensor(x.transpose(0, 3, 1, 2)))
    f_cls, f_reg, f_iou = fmodel.apply(variables, jnp.asarray(x), train=False)
    assert len(t_cls) == len(f_cls) == 5
    for lvl in range(5):
        for tname, t, f in (
            ("cls", t_cls[lvl], f_cls[lvl]),
            ("reg", t_reg[lvl], f_reg[lvl]),
            ("iou", t_iou[lvl], f_iou[lvl]),
        ):
            tn = t.numpy().transpose(0, 2, 3, 1)
            fn = np.asarray(f)
            assert tn.shape == fn.shape, (lvl, tname, tn.shape, fn.shape)
            np.testing.assert_allclose(
                fn, tn, rtol=1e-4, atol=1e-4, err_msg=f"level {lvl} {tname}"
            )


# --- independent numpy transcription of the reference decode ---------------


def _tblr_decode_np(anchors, tblr, max_shape):
    """tblr2bboxes semantics (tblr_bbox_coder.py:117-170), normalizer 1/8."""
    loc = tblr * NORMALIZER
    cx = (anchors[:, 0] + anchors[:, 2]) / 2
    cy = (anchors[:, 1] + anchors[:, 3]) / 2
    w = anchors[:, 2] - anchors[:, 0]
    h = anchors[:, 3] - anchors[:, 1]
    top, bottom, left, right = loc[:, 0] * h, loc[:, 1] * h, loc[:, 2] * w, loc[:, 3] * w
    boxes = np.stack([cx - left, cy - top, cx + right, cy + bottom], axis=-1)
    boxes[:, 0::2] = np.clip(boxes[:, 0::2], 0, max_shape[1])
    boxes[:, 1::2] = np.clip(boxes[:, 1::2], 0, max_shape[0])
    return boxes


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _reference_decode_np(cls_maps, reg_maps, iou_maps, anchors_per_level, img_shape, scale_factor):
    """radet_head.py:_get_bboxes_single (:55-169) in numpy for one image.

    Returns (boxes, labels, scores) after vote-NMS and max_per_img."""
    from radet_tpu.ops.vote_nms import vote_nms_numpy

    score_thr = TEST_CFG["score_thr"]
    nms_pre = TEST_CFG["nms_pre"]
    mb, ms, mi, mc = [], [], [], []
    for cls_map, reg_map, iou_map, anchors in zip(
        cls_maps, reg_maps, iou_maps, anchors_per_level
    ):
        c = cls_map.shape[-1]
        scores = _sigmoid(cls_map.reshape(-1, c))
        regs = reg_map.reshape(-1, 4)
        ious = _sigmoid(iou_map.reshape(-1))
        cand = scores > score_thr  # (N, C)
        k = min(nms_pre, int(cand.sum()))
        if k == 0:
            continue
        cand_scores = scores[cand]
        top = np.argsort(-cand_scores, kind="stable")[:k]
        nz = np.argwhere(cand)[top]
        aidx, cats = nz[:, 0], nz[:, 1]
        boxes = _tblr_decode_np(anchors[aidx], regs[aidx], img_shape)
        mb.append(boxes)
        ms.append(cand_scores[top])
        mi.append(ious[aidx])
        mc.append(cats)
    boxes = np.concatenate(mb, 0) / np.asarray(scale_factor, np.float32)
    cls_s = np.concatenate(ms, 0)
    iou_s = np.concatenate(mi, 0)
    labels = np.concatenate(mc, 0)
    # list-typed cluster/vote score -> cls*iou product (vote_wrapper.py:14-24)
    prod = cls_s * iou_s
    vb, vl, vs = vote_nms_numpy(
        boxes,
        prod,
        prod,
        labels,
        iou_threshold=TEST_CFG["nms"]["iou_threshold"],
        iou_enable=TEST_CFG["nms"]["iou_enable"],
        sigma=TEST_CFG["nms"]["sigma"],
        global_mode=False,
    )
    m = TEST_CFG["max_per_img"]
    return vb[:m], vl[:m], vs[:m]


def _run_flax_detection(parity_models):
    import jax.numpy as jnp

    from radet_tpu.core.anchors import AnchorConfig, anchor_featmap_sizes, generate_anchors
    from radet_tpu.models.postprocess import get_bboxes

    tmodel, fmodel, variables, x = parity_models
    cfg = AnchorConfig()
    anchors, _, _, counts = generate_anchors((IMG_H, IMG_W), cfg)
    sizes = anchor_featmap_sizes((IMG_H, IMG_W), cfg.strides)
    offsets = np.cumsum([0] + counts)
    anchors_per_level = [anchors[offsets[i] : offsets[i + 1]] for i in range(len(counts))]

    b = x.shape[0]
    img_shapes = jnp.asarray([[IMG_H, IMG_W]] * b, jnp.float32)
    scale_factor = np.asarray([1.25, 1.25, 1.25, 1.25], np.float32)  # w,h,w,h
    f_cls, f_reg, f_iou = fmodel.apply(variables, jnp.asarray(x), train=False)
    for (fh, fw), t in zip(sizes, f_cls):
        assert t.shape[1:3] == (fh, fw)
    det = get_bboxes(
        f_cls,
        f_reg,
        f_iou,
        anchors_per_level,
        img_shapes,
        jnp.tile(jnp.asarray(scale_factor)[None], (b, 1)),
        test_cfg=TEST_CFG,
        normalizer=NORMALIZER,
        rescale=True,
    )
    return det, (f_cls, f_reg, f_iou), anchors_per_level, scale_factor


def test_device_decode_matches_reference_semantics(parity_models):
    """EXACT check: the on-device per-level decode + vote-NMS path equals the
    numpy transcription of the reference postprocessing when fed the same
    (flax) head outputs — no cross-framework noise, so detection count,
    ordering, labels, scores and boxes must all agree."""
    det, (f_cls, f_reg, f_iou), anchors_per_level, scale_factor = _run_flax_detection(
        parity_models
    )
    b = f_cls[0].shape[0]
    for bi in range(b):
        eb, el, es = _reference_decode_np(
            [np.asarray(t)[bi] for t in f_cls],
            [np.asarray(t)[bi] for t in f_reg],
            [np.asarray(t)[bi] for t in f_iou],
            anchors_per_level,
            (IMG_H, IMG_W),
            scale_factor,
        )
        got_valid = np.asarray(det.valid[bi])
        gb = np.asarray(det.boxes[bi])[got_valid]
        gl = np.asarray(det.labels[bi])[got_valid]
        gs = np.asarray(det.scores[bi])[got_valid]
        assert len(eb) > 3, "degenerate scene — fixture seed must yield detections"
        assert len(gb) == len(eb), (len(gb), len(eb))
        # both emit in descending cluster-seed order; compare positionally
        np.testing.assert_array_equal(gl, el)
        np.testing.assert_allclose(gs, es, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(gb, eb, rtol=1e-4, atol=1e-3)


def _iou_np(a, b):
    xl = np.maximum(a[:, None, 0], b[None, :, 0])
    yt = np.maximum(a[:, None, 1], b[None, :, 1])
    xr = np.minimum(a[:, None, 2], b[None, :, 2])
    yb = np.minimum(a[:, None, 3], b[None, :, 3])
    inter = np.clip(xr - xl, 0, None) * np.clip(yb - yt, 0, None)
    aa = np.clip(a[:, 2] - a[:, 0], 0, None) * np.clip(a[:, 3] - a[:, 1], 0, None)
    ab = np.clip(b[:, 2] - b[:, 0], 0, None) * np.clip(b[:, 3] - b[:, 1], 0, None)
    return inter / np.maximum(aa[:, None] + ab[None, :] - inter, 1e-12)


def test_detector_end_to_end_detection_parity(parity_models):
    """Torch checkpoint -> converter -> flax -> device decode/vote-NMS matches
    the torch forward pushed through the reference-semantics numpy decode.

    Head outputs agree to 1e-4, so candidates whose sigmoid score sits within
    ~1e-4 of the 0.05 threshold may legitimately differ between the two
    stacks; every unmatched detection must be such a borderline singleton
    (cluster score cls*iou < 0.06), and all confident detections must match
    one-to-one by label + IoU."""
    tmodel, fmodel, variables, x = parity_models
    det, _, anchors_per_level, scale_factor = _run_flax_detection(parity_models)
    with torch.no_grad():
        t_cls, t_reg, t_iou = tmodel(torch.tensor(x.transpose(0, 3, 1, 2)))

    b = x.shape[0]
    total_expected = 0
    for bi in range(b):
        eb, el, es = _reference_decode_np(
            [t.numpy()[bi].transpose(1, 2, 0) for t in t_cls],
            [t.numpy()[bi].transpose(1, 2, 0) for t in t_reg],
            [t.numpy()[bi].transpose(1, 2, 0) for t in t_iou],
            anchors_per_level,
            (IMG_H, IMG_W),
            scale_factor,
        )
        got_valid = np.asarray(det.valid[bi])
        gb = np.asarray(det.boxes[bi])[got_valid]
        gl = np.asarray(det.labels[bi])[got_valid]
        gs = np.asarray(det.scores[bi])[got_valid]
        assert len(eb) > 3
        total_expected += len(eb)

        iou = _iou_np(eb, gb)
        # zero-area boxes (border-clamped degenerate regressions) have IoU 0
        # even when coordinate-identical — match those by coordinate distance
        coord_close = np.abs(eb[:, None, :] - gb[None, :, :]).max(-1) < 0.05
        matched_g = np.zeros(len(gb), bool)
        for ei in range(len(eb)):
            cand = np.nonzero(
                (gl == el[ei]) & ~matched_g & ((iou[ei] > 0.7) | coord_close[ei])
            )[0]
            if len(cand):
                gi = cand[np.argmax(iou[ei][cand] + coord_close[ei][cand])]
                matched_g[gi] = True
                np.testing.assert_allclose(gs[gi], es[ei], rtol=5e-3, atol=5e-4)
                np.testing.assert_allclose(gb[gi], eb[ei], rtol=5e-3, atol=0.25)
            else:
                assert es[ei] < 0.06, (
                    f"confident reference detection unmatched: score={es[ei]}"
                )
        for gi in np.nonzero(~matched_g)[0]:
            assert gs[gi] < 0.06, f"confident extra detection: score={gs[gi]}"
        # the confident set must dominate: >=80% matched
        assert matched_g.sum() >= 0.8 * len(eb), (matched_g.sum(), len(eb))
