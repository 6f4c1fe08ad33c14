"""Regression tests for review findings: checkpoint-path resolution, loader
error propagation, min_bbox_size coordinate space, explicit resume paths."""

import numpy as np
import pytest


def test_load_weights_resolves_manager_layouts(tmp_path):
    import jax.numpy as jnp

    from radet_tpu.engine.checkpoint import (
        CheckpointManager,
        load_weights,
        save_weights,
    )
    from radet_tpu.engine.train_step import TrainState

    params = {"w": np.arange(4.0, dtype=np.float32)}
    state = TrainState(
        step=jnp.asarray(7, jnp.int32),
        params=params,
        batch_stats={},
        opt_state={"m": np.zeros(4, np.float32)},
    )
    root = str(tmp_path / "checkpoints")
    mgr = CheckpointManager(root, interval=1)
    mgr.save(7, state, force=True, wait=True)
    mgr.close()

    # manager ROOT (README quick-start / mixpbr load_from usage)
    w = load_weights(root)
    np.testing.assert_allclose(np.asarray(w["params"]["w"]), params["w"])
    assert "opt_state" not in w  # reduced to model variables
    # explicit step dir
    w2 = load_weights(f"{root}/7")
    np.testing.assert_allclose(np.asarray(w2["params"]["w"]), params["w"])
    # save_weights layout still works
    wdir = str(tmp_path / "weights_only")
    save_weights(wdir, {"params": params, "batch_stats": {}})
    w3 = load_weights(wdir)
    np.testing.assert_allclose(np.asarray(w3["params"]["w"]), params["w"])
    # missing path raises instead of silently returning junk
    with pytest.raises(FileNotFoundError):
        load_weights(str(tmp_path / "nope"))


def test_loader_propagates_worker_errors():
    from radet_tpu.data.loader import DataLoader

    class Broken:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            if i == 3:
                raise FileNotFoundError("missing mask png")
            return {"x": np.zeros(2, np.float32)}

    loader = DataLoader(Broken(), batch_size=2, shuffle=False, num_workers=2)
    with pytest.raises(RuntimeError, match="worker failed"):
        for _ in loader:
            pass


def test_min_bbox_size_filters_in_input_coords():
    import jax.numpy as jnp

    from radet_tpu.core import generate_anchors
    from radet_tpu.models.postprocess import get_bboxes

    anchors, _, _, counts = generate_anchors((128, 160))
    sizes = [(16, 20), (8, 10), (4, 5), (2, 3), (1, 2)]
    cls_list = [np.full((1, h, w, 1), -10.0, np.float32) for h, w in sizes]
    reg_list = [np.zeros((1, h, w, 4), np.float32) for h, w in sizes]
    iou_list = [np.zeros((1, h, w, 1), np.float32) for h, w in sizes]
    cls_list[0][0, 5, 6, 0] = 4.0
    reg_list[0][0, 5, 6] = [2.0, 3.0, 1.0, 2.0]  # 24x40 in input coords
    level_anchors = np.split(anchors, np.cumsum(counts)[:-1])
    cfg = dict(nms_pre=1000, score_thr=0.05, max_per_img=5, min_bbox_size=20,
               nms=dict(type="vote", iou_threshold=0.65))
    # scale_factor 2: box is 12x20 in ORIGINAL coords but 24x40 in input
    # coords -> the reference filters pre-rescale, so it must survive
    det = get_bboxes(
        [jnp.asarray(x) for x in cls_list],
        [jnp.asarray(x) for x in reg_list],
        [jnp.asarray(x) for x in iou_list],
        level_anchors,
        jnp.asarray([[128.0, 160.0]]),
        jnp.full((1, 4), 2.0),
        test_cfg=cfg,
    )
    assert int(np.asarray(det.valid).sum()) == 1


def test_resume_from_explicit_path(tmp_path):
    """--resume-from <other_dir> restores that checkpoint, not work_dir's."""
    import jax
    import jax.numpy as jnp

    from radet_tpu.engine.checkpoint import CheckpointManager
    from radet_tpu.engine.train_step import TrainState

    params = {"w": np.full(3, 5.0, np.float32)}
    state = TrainState(jnp.asarray(42, jnp.int32), params, {}, {"m": np.zeros(3, np.float32)})
    other = str(tmp_path / "other_run" / "checkpoints")
    mgr = CheckpointManager(other, interval=1)
    mgr.save(42, state, force=True, wait=True)
    mgr.close()

    # template with different values
    fresh = TrainState(jnp.asarray(0, jnp.int32), {"w": np.zeros(3, np.float32)}, {}, {"m": np.ones(3, np.float32)})
    src = CheckpointManager(other)
    restored = src.restore(fresh)
    src.close()
    assert int(restored.step) == 42
    np.testing.assert_allclose(np.asarray(restored.params["w"]), 5.0)


def test_frozen_mask_covers_v1d_deep_stem():
    """frozen_stages>=0 must freeze the V1d deep stem (stem_conv*/stem_bn*)
    like the plain conv1/bn1 — otherwise AdamW weight decay erodes the
    'frozen' pretrained stem even though its gradients are stop_gradient'd."""
    import jax
    import jax.numpy as jnp

    from radet_tpu.engine.optim import frozen_param_mask
    from radet_tpu.models.resnet import ResNet

    model = ResNet(depth=18, deep_stem=True, avg_down=True, frozen_stages=1)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False)
    # the mask operates on the detector tree, where the backbone subtree
    # lives under 'backbone'
    mask = frozen_param_mask({"backbone": variables["params"]}, frozen_stages=1)
    flat = {
        "/".join(str(getattr(p, "key", p)) for p in path): trainable
        for path, trainable in jax.tree_util.tree_flatten_with_path(mask)[0]
    }
    stem_keys = [k for k in flat if "stem_" in k]
    layer1_keys = [k for k in flat if "layer1_" in k]
    layer2_keys = [k for k in flat if "layer2_" in k]
    assert stem_keys and layer1_keys and layer2_keys
    assert not any(flat[k] for k in stem_keys), "deep stem must be frozen"
    assert not any(flat[k] for k in layer1_keys), "layer1 must be frozen"
    assert all(flat[k] for k in layer2_keys), "layer2 must stay trainable"


def test_loader_sentinel_survives_stalled_consumer():
    """Advisor r2 (high): terminal sentinel must not be dropped when the
    consumer stalls longer than the put timeout while the queue is full
    (e.g. first-batch XLA compile during eval) — iteration used to hang."""
    import time

    from radet_tpu.data.loader import DataLoader

    class Tiny:
        def __len__(self):
            return 6

        def __getitem__(self, i):
            return {"x": np.full(2, i, np.float32)}

    loader = DataLoader(
        Tiny(), batch_size=2, shuffle=False, num_workers=2, prefetch_batches=1
    )
    got = []
    deadline = time.monotonic() + 30.0
    for batch in loader:
        if not got:
            time.sleep(3.0)  # stall past the old 1 s sentinel timeout
        got.append(batch)
        assert time.monotonic() < deadline, "loader iteration hung"
    assert len(got) == 3


def test_builder_rejects_unknown_neck_and_builds_channel_mapper():
    """Advisor r2 (medium): neck type is validated; ChannelMapper configs
    actually build a ChannelMapper (not a silent FPN)."""
    import jax

    from radet_tpu.models.builder import build_detector
    from radet_tpu.models.fpn import ChannelMapper

    cfg = dict(
        type="RADet",
        backbone=dict(depth=18, out_indices=(1, 2, 3)),
        neck=dict(type="ChannelMapper", out_channels=32),
        bbox_head=dict(num_classes=3, feat_channels=32, stacked_convs=1),
    )
    model = build_detector(cfg)
    assert model.neck_type == "ChannelMapper"
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32)
    )
    cls, reg, iou = model.apply(variables, np.zeros((1, 64, 64, 3), np.float32))
    assert len(cls) == 3  # one level per backbone output, no extra levels
    bound = model.bind(variables)
    assert isinstance(bound.neck, ChannelMapper)

    with pytest.raises(AssertionError, match="neck type"):
        build_detector(
            dict(
                type="RADet",
                backbone=dict(depth=18),
                neck=dict(type="NASFPN"),
                bbox_head=dict(num_classes=3),
            )
        )


def test_builder_rejects_unsupported_neck_act_and_norm():
    """Review r3: a non-ReLU act_cfg or any norm_cfg on the neck must fail
    fast rather than silently building ReLU / dropping the norm."""
    from radet_tpu.models.builder import build_detector

    base = dict(
        type="RADet",
        backbone=dict(depth=18),
        bbox_head=dict(num_classes=3, feat_channels=32, stacked_convs=1),
    )
    with pytest.raises(AssertionError, match="act_cfg"):
        build_detector(
            dict(base, neck=dict(type="ChannelMapper", out_channels=32,
                                 act_cfg=dict(type="GELU")))
        )
    with pytest.raises(AssertionError, match="norm_cfg"):
        build_detector(
            dict(base, neck=dict(out_channels=32,
                                 norm_cfg=dict(type="GN", num_groups=32)))
        )
    # explicit act_cfg=None (no activation) and absent act_cfg stay valid
    m = build_detector(dict(base, neck=dict(type="ChannelMapper",
                                            out_channels=32, act_cfg=None)))
    assert m.neck_with_relu is False


def test_photometric_distortion_noop_is_bitwise_identity(monkeypatch):
    """Advisor r2 (low): when no op fires, the image must pass through
    bitwise-unchanged (no HSV roundtrip / clipping noise)."""
    import random as pyrandom

    from radet_tpu.data.pipeline import PhotoMetricDistortion

    monkeypatch.setattr(pyrandom, "random", lambda: 0.99)  # every coin misses
    img = np.random.RandomState(0).randint(0, 256, (32, 48, 3), np.uint8)
    out = PhotoMetricDistortion()({"img": img.copy()})["img"]
    np.testing.assert_array_equal(out, img)
