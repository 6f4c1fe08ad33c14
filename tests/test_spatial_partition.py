"""Spatial partitioning (2-D data x space mesh): image H sharded over chips.

The reference's DDP design (apis/train.py:73-84) can only replicate the model
and split the batch; the mesh here additionally splits each IMAGE's H axis
over a ``space`` axis — XLA's SPMD partitioner inserts the conv halo
exchanges.  These tests prove, on the 8-virtual-CPU-device mesh, that the
2-D-sharded train and inference steps compute the SAME math as a single
device (not just that they compile)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fixtures import make_synthetic_bop
from test_end_to_end import _write_tiny_cfg


def _tiny_setup(h=64, w=64, depth=18, num_classes=3, max_gt=4):
    from radet_tpu.core.anchors import generate_anchors
    from radet_tpu.engine.optim import build_optimizer
    from radet_tpu.engine.train_step import TrainState, build_train_step
    from radet_tpu.models.builder import build_detector

    model_cfg = dict(
        type="RADet",
        backbone=dict(depth=depth, out_indices=(0, 1, 2, 3), frozen_stages=1,
                      norm_eval=True),
        neck=dict(out_channels=32, start_level=1, num_outs=5),
        bbox_head=dict(num_classes=num_classes, in_channels=32,
                       stacked_convs=1, feat_channels=32),
    )
    model = build_detector(model_cfg, dtype="float32")
    anchors, ranges, strides, counts = generate_anchors((h, w))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3), jnp.float32), train=False
    )
    params = variables["params"]
    tx, _ = build_optimizer(
        dict(type="adamw", lr=1e-3), dict(max_lr=1e-3, total_steps=100),
        dict(max_norm=35.0), params, frozen_stages=1,
    )
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
    )
    train_step = build_train_step(
        model, tx, anchors, ranges,
        img_norm=dict(mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375]),
        num_classes=num_classes,
        assignment_cfg=dict(positive_num=4, neg_threshold=0.2, balance_sample=True),
    )
    n_anchor = anchors.shape[0]
    rs = np.random.RandomState(0)
    b = 4
    batch = dict(
        image=rs.randint(0, 255, (b, h, w, 3), np.uint8),
        gt_boxes=np.tile(np.asarray([[8, 8, 40, 40]], np.float32), (b, max_gt, 1)),
        gt_labels=np.zeros((b, max_gt), np.int32),
        gt_valid=np.tile(np.asarray([True] + [False] * (max_gt - 1)), (b, 1)),
        dist_vals=rs.rand(b, n_anchor, max_gt).astype(np.float32),
    )
    return model, anchors, counts, state, train_step, batch


def test_create_mesh_space_axis():
    from radet_tpu.parallel.mesh import create_mesh

    mesh = create_mesh(jax.devices()[:4], space=2)
    assert mesh.axis_names == ("data", "space")
    assert mesh.shape == {"data": 2, "space": 2}
    with pytest.raises(ValueError, match="space=3"):
        create_mesh(jax.devices()[:4], space=3)
    # space=1 stays the plain 1-D data mesh
    assert create_mesh(jax.devices()[:4]).axis_names == ("data",)


def test_shard_batch_routes_images_to_space():
    from jax.sharding import PartitionSpec as P

    from radet_tpu.parallel.mesh import create_mesh, shard_batch

    mesh = create_mesh(jax.devices()[:4], space=2)
    batch = dict(
        image=np.zeros((4, 32, 32, 3), np.uint8),
        gt_boxes=np.zeros((4, 4, 4), np.float32),
    )
    out = shard_batch(batch, mesh)
    assert out["image"].sharding.spec == P("data", "space")
    assert out["gt_boxes"].sharding.spec == P("data")
    # a 1-D mesh never receives a space dim
    mesh1 = create_mesh(jax.devices()[:4])
    out1 = shard_batch(batch, mesh1)
    assert out1["image"].sharding.spec == P("data")


@pytest.mark.slow
def test_spatial_train_step_matches_single_device():
    """One train step on a (data=2, space=2) mesh == single device on the
    same global batch: loss to 1e-5, params to 1e-4 (reduction-order noise,
    same tolerance as the dp dryrun)."""
    from radet_tpu.parallel.mesh import create_mesh, replicated_sharding, shard_batch

    model, anchors, counts, state, train_step, batch = _tiny_setup()
    key = jax.random.PRNGKey(1)
    host_state = jax.device_get(state)

    mesh1 = create_mesh(jax.devices()[:1])
    s1 = jax.device_put(host_state, replicated_sharding(mesh1))
    ref_state, ref_metrics = train_step(s1, shard_batch(batch, mesh1), key)
    jax.block_until_ready(ref_state.params)

    mesh = create_mesh(jax.devices()[:4], space=2)
    sn = jax.device_put(host_state, replicated_sharding(mesh))
    new_state, metrics = train_step(sn, shard_batch(batch, mesh), key)
    jax.block_until_ready(new_state.params)

    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-5,
        err_msg="dpxsp loss != single-device loss",
    )
    flat_n = jax.tree_util.tree_leaves_with_path(jax.device_get(new_state.params))
    flat_1 = jax.tree_util.tree_leaves(jax.device_get(ref_state.params))
    for (path, a), b in zip(flat_n, flat_1):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4,
            err_msg=f"dpxsp params diverge at {jax.tree_util.keystr(path)}",
        )


@pytest.mark.slow
def test_spatial_infer_step_matches_single_device():
    """Inference (forward + decode + vote-NMS) on the 2-D mesh returns the
    same detections as one device — the latency-serving use case: one image's
    conv work split over ``space`` chips."""
    from radet_tpu.engine.train_step import build_infer_step
    from radet_tpu.parallel.mesh import create_mesh, replicated_sharding, shard_batch

    model, anchors, counts, state, _, batch = _tiny_setup()
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    infer = build_infer_step(
        model, anchors, counts,
        img_norm=dict(mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375]),
        test_cfg=dict(
            nms_pre=200, score_thr=0.05, max_per_img=20,
            nms=dict(type="vote", iou_threshold=0.65,
                     cluster_score=["cls", "iou"], vote_score=["iou", "cls"],
                     iou_enable=False, sigma=0.025),
        ),
    )
    b, h, w = batch["image"].shape[:3]
    shapes = np.full((b, 2), (h, w), np.float32)
    scales = np.ones((b, 4), np.float32)

    ref = jax.device_get(infer(variables, batch["image"], shapes, scales))

    mesh = create_mesh(jax.devices()[:4], space=2)
    v = jax.device_put(variables, replicated_sharding(mesh))
    inp = shard_batch(
        dict(image=batch["image"], img_shape=shapes, scale_factor=scales), mesh
    )
    out = jax.device_get(
        infer(v, inp["image"], inp["img_shape"], inp["scale_factor"])
    )

    np.testing.assert_array_equal(out.valid, ref.valid)
    keep = np.asarray(ref.valid)
    np.testing.assert_array_equal(
        np.asarray(out.labels)[keep], np.asarray(ref.labels)[keep]
    )
    np.testing.assert_allclose(
        np.asarray(out.scores)[keep], np.asarray(ref.scores)[keep], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.boxes)[keep], np.asarray(ref.boxes)[keep], atol=1e-3
    )


@pytest.mark.slow
def test_eval_with_space_config(tmp_path):
    """cfg.parallel = dict(space=2) also routes batched eval through the
    2-D mesh (apis/test.py::_eval_mesh)."""
    from radet_tpu.apis.common import build_model_and_anchors, init_variables
    from radet_tpu.apis.test import _eval_mesh, test_from_config
    from radet_tpu.utils import Config

    root = tmp_path / "bop"
    make_synthetic_bop(
        str(root), num_scenes=1, images_per_scene=4, img_hw=(128, 160),
        num_classes=3,
    )
    cfg_path = _write_tiny_cfg(tmp_path, str(root))
    with open(cfg_path, "a") as f:
        f.write("\nparallel = dict(space=2)\n")
    cfg = Config.fromfile(cfg_path)

    mesh = _eval_mesh(cfg, batch_size=4)
    assert mesh.shape == {"data": 4, "space": 2}

    model, *_ = build_model_and_anchors(cfg)
    variables = init_variables(model, tuple(cfg.input_size))
    dataset, results, metrics = test_from_config(
        cfg, variables, split="test", batch_size=4
    )
    assert len(results) == len(dataset) == 4
    assert "bbox_mAP" in metrics


@pytest.mark.slow
def test_train_detector_with_space_config(tmp_path):
    """Config knob: cfg.parallel = dict(space=2) trains end-to-end through
    train_detector on a (4, 2) mesh."""
    from radet_tpu.apis.train import train_detector
    from radet_tpu.utils import Config

    root = tmp_path / "bop"
    make_synthetic_bop(
        str(root), num_scenes=1, images_per_scene=4, img_hw=(128, 160),
        num_classes=3,
    )
    cfg_path = _write_tiny_cfg(tmp_path, str(root), max_iters=2)
    with open(cfg_path, "a") as f:
        f.write("\nparallel = dict(space=2)\n")
    cfg = Config.fromfile(cfg_path)
    cfg.data["samples_per_gpu"] = 4  # dp=4 x space=2 = all 8 virtual devices
    state = train_detector(cfg, work_dir=str(tmp_path / "w"), eval_during_train=False)
    assert int(state.step) == 2
