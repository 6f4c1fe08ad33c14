"""AP-parity runbook mechanics + golden fixtures (VERDICT r2 item 3).

Drives the EXACT three runbook commands (docs/PARITY_RUNBOOK.md) as
subprocesses — ``tools/convert_torch_weights.py`` → ``tools/test.py --eval
bbox --out`` → ``tools/compare_ap.py`` — using the deterministic stand-ins
available without egress: the seeded torch transcription of the reference
detector (tests/test_detector_parity.py) saved as a real mmdet-style ``.pth``
(standing in for the released checkpoint), and the seeded synthetic BOP scene
(standing in for ycbv test_bop19).

Golden detections/metrics live in tests/golden/ and pin the current
behavior; regenerate with ``GOLDEN_REGEN=1 pytest tests/test_parity_goldens.py``.
"""

import json
import os
import os.path as osp
import pickle
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
GOLDEN_DIR = osp.join(REPO, "tests", "golden")
IMG_H, IMG_W = 128, 160


def _run(args):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable] + args, capture_output=True, text=True, cwd=REPO, env=env
    )
    assert r.returncode == 0, (r.stdout[-1000:], r.stderr[-2000:])
    return r.stdout


def _write_cfg(tmp_path, bop_root, ncls, feat, stacked):
    cfg_path = tmp_path / "parity_cfg.py"
    cfg_path.write_text(
        f"""
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375])
test_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="Resize", img_scale=({IMG_W}, {IMG_H}), keep_ratio=True),
    dict(type="Pad", size_divisor=32),
]
model = dict(
    type="RADet",
    backbone=dict(depth=50, out_indices=(0, 1, 2, 3), frozen_stages=1, norm_eval=True),
    neck=dict(out_channels={feat}, start_level=1, num_outs=5),
    bbox_head=dict(
        num_classes={ncls}, in_channels={feat}, stacked_convs={stacked},
        feat_channels={feat},
        anchor_generator=dict(ratios=[1.0], octave_base_scale=8, scales_per_octave=1,
                              strides=[8, 16, 32, 64, 128]),
        bbox_coder=dict(type="TBLRBBoxCoder", normalizer=1/8),
    ),
)
test_cfg = dict(
    nms_pre=1000, score_thr=0.05, max_per_img=100,
    nms=dict(type="vote", iou_threshold=0.65, cluster_score=["cls", "iou"],
             vote_score=["iou", "cls"], iou_enable=False, sigma=0.025),
)
input_size = ({IMG_H}, {IMG_W})
compute_dtype = "float32"
data = dict(
    samples_per_gpu=2,
    workers_per_gpu=2,
    test=dict(
        ann_file=r"{bop_root}/detector_annotations/train_pbr.json",
        img_prefix=r"{bop_root}/train_pbr/",
        pipeline=test_pipeline,
        bop_submission=True,
    ),
)
"""
    )
    return str(cfg_path)


def test_parity_runbook_end_to_end(tmp_path):
    from fixtures import make_synthetic_bop
    from test_detector_parity import FEAT, NCLS, STACKED, TorchRADet, _randomize

    regen = bool(os.environ.get("GOLDEN_REGEN"))

    # deterministic synthetic "test_bop19" stand-in
    root = tmp_path / "bop"
    make_synthetic_bop(
        str(root), num_scenes=1, images_per_scene=4, img_hw=(IMG_H, IMG_W),
        num_classes=NCLS, seed=3,
    )

    # deterministic "released checkpoint" stand-in (mmdet naming/meta)
    torch.manual_seed(7)
    rng = np.random.RandomState(7)
    tmodel = TorchRADet()
    _randomize(tmodel, rng)
    tmodel.eval()
    pth = str(tmp_path / "radet_r50_synth.pth")
    torch.save(
        {
            "state_dict": tmodel.state_dict(),
            "meta": {"CLASSES": [f"obj_{c + 1:06d}" for c in range(NCLS)]},
        },
        pth,
    )

    # --- runbook command 1: convert .pth -> orbax weights ------------------
    weights = str(tmp_path / "weights")
    out = _run(["tools/convert_torch_weights.py", pth, weights, "--kind", "radet"])
    assert "wrote" in out

    # --- runbook command 2: strict eval ------------------------------------
    cfg = _write_cfg(tmp_path, root, NCLS, FEAT, STACKED)
    dets_pkl = str(tmp_path / "dets.pkl")
    stdout = _run(["tools/test.py", cfg, weights, "--eval", "bbox", "--out", dets_pkl])
    # the metrics dict is the last JSON object printed on stdout (it is
    # flat, so its opening brace is the last "{"; logs go to stderr and it
    # may be the very first stdout byte)
    metrics = json.loads(stdout[stdout.rindex("{") :])
    assert "bbox_mAP" in metrics
    with open(dets_pkl, "rb") as f:
        results = pickle.load(f)
    assert len(results) == 4
    got_dets = [
        dict(
            img_id=int(r["img_id"]),
            boxes=np.round(np.asarray(r["boxes"], np.float64), 3).tolist(),
            scores=np.round(np.asarray(r["scores"], np.float64), 4).tolist(),
            labels=np.asarray(r["labels"], np.int64).tolist(),
        )
        for r in sorted(results, key=lambda r: int(r["img_id"]))
    ]
    assert any(len(d["boxes"]) for d in got_dets), "stand-in produced no detections"

    got_metrics_file = str(tmp_path / "got_metrics.json")
    with open(got_metrics_file, "w") as f:
        json.dump(metrics, f)

    if regen:
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        with open(osp.join(GOLDEN_DIR, "detections.json"), "w") as f:
            json.dump(got_dets, f, indent=1)
        with open(osp.join(GOLDEN_DIR, "metrics.json"), "w") as f:
            json.dump(metrics, f, indent=1)
        pytest.skip("goldens regenerated — rerun without GOLDEN_REGEN to verify")

    # --- compare detections against the checked-in goldens -----------------
    with open(osp.join(GOLDEN_DIR, "detections.json")) as f:
        golden_dets = json.load(f)
    assert len(got_dets) == len(golden_dets)
    for got, exp in zip(got_dets, golden_dets):
        assert got["img_id"] == exp["img_id"]
        assert got["labels"] == exp["labels"], got["img_id"]
        np.testing.assert_allclose(
            np.asarray(got["scores"]), np.asarray(exp["scores"]), atol=2e-3,
            err_msg=f"img {got['img_id']} scores",
        )
        np.testing.assert_allclose(
            np.asarray(got["boxes"]), np.asarray(exp["boxes"]), atol=0.25,
            err_msg=f"img {got['img_id']} boxes",
        )

    # --- runbook command 3: the AP gate (exercised with tight tol) ---------
    _run(
        [
            "tools/compare_ap.py",
            got_metrics_file,
            osp.join(GOLDEN_DIR, "metrics.json"),
            "--keys",
            "bbox_mAP",
            "bbox_mAP_50",
            "--tol",
            "0.02",
        ]
    )
    # and the gate FAILS loudly outside tolerance
    r = subprocess.run(
        [
            sys.executable,
            "tools/compare_ap.py",
            got_metrics_file,
            "--expect",
            "bbox_mAP=99.0",
            "--tol",
            "0.2",
        ],
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    assert r.returncode == 1 and "FAIL" in r.stdout
