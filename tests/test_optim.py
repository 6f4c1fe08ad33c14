"""Optimizer-surface tests (VERDICT r2 item 8): SGD/Adam parity vs torch,
paramwise custom_keys multipliers, step-policy LR, freeze-mask interaction.

Reference behavior: mmcv build_optimizer constructs any torch optimizer from
config with optional paramwise_cfg (/root/reference/radet/apis/train.py:87,
configs/base/default_runtime.py:1-8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radet_tpu.engine.optim import (
    build_lr_schedule,
    build_optimizer,
    step_lr,
)


def _run_optax(tx, params, grads_seq):
    state = tx.init(params)
    for g in grads_seq:
        updates, state = tx.update(g, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
    return params


def test_sgd_momentum_nesterov_matches_torch():
    import torch

    torch.manual_seed(0)
    w0 = np.random.RandomState(0).randn(4, 3).astype(np.float32)
    grads = [np.random.RandomState(i + 1).randn(4, 3).astype(np.float32) for i in range(5)]

    for nesterov in (False, True):
        tw = torch.nn.Parameter(torch.tensor(w0.copy()))
        opt = torch.optim.SGD(
            [tw], lr=0.1, momentum=0.9, weight_decay=0.01, nesterov=nesterov
        )
        for g in grads:
            opt.zero_grad()
            tw.grad = torch.tensor(g.copy())
            opt.step()

        tx, _ = build_optimizer(
            dict(type="SGD", lr=0.1, momentum=0.9, weight_decay=0.01,
                 nesterov=nesterov),
            dict(policy="fixed"),
            None,
            {"w": jnp.asarray(w0)},
        )
        out = _run_optax(tx, {"w": jnp.asarray(w0)}, [{"w": jnp.asarray(g)} for g in grads])
        np.testing.assert_allclose(
            np.asarray(out["w"]), tw.detach().numpy(), rtol=1e-5, atol=1e-6,
            err_msg=f"nesterov={nesterov}",
        )


def test_adam_coupled_l2_matches_torch():
    import torch

    w0 = np.random.RandomState(0).randn(6).astype(np.float32)
    grads = [np.random.RandomState(i + 1).randn(6).astype(np.float32) for i in range(4)]

    tw = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt = torch.optim.Adam([tw], lr=1e-2, betas=(0.9, 0.999), eps=1e-8,
                           weight_decay=0.05)
    for g in grads:
        opt.zero_grad()
        tw.grad = torch.tensor(g.copy())
        opt.step()

    tx, _ = build_optimizer(
        dict(type="Adam", lr=1e-2, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.05),
        dict(policy="fixed"),
        None,
        {"w": jnp.asarray(w0)},
    )
    out = _run_optax(tx, {"w": jnp.asarray(w0)}, [{"w": jnp.asarray(g)} for g in grads])
    np.testing.assert_allclose(np.asarray(out["w"]), tw.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


def test_paramwise_custom_keys_lr_and_decay_mult():
    """backbone gets lr_mult=0.5 decay_mult=0.0; other params the base lr.
    Verified against two separately-built plain SGD optimizers."""
    params = {
        "backbone": {"conv": jnp.ones((3,))},
        "head": {"conv": jnp.ones((3,))},
    }
    grads = {"backbone": {"conv": jnp.full((3,), 2.0)},
             "head": {"conv": jnp.full((3,), 2.0)}}

    tx, _ = build_optimizer(
        dict(type="SGD", lr=0.1, weight_decay=0.01,
             paramwise_cfg=dict(custom_keys={
                 "backbone": dict(lr_mult=0.5, decay_mult=0.0)})),
        dict(policy="fixed"),
        None,
        params,
    )
    out = _run_optax(tx, params, [grads])
    # head: w - lr*(g + wd*w) = 1 - 0.1*(2 + 0.01*1)
    np.testing.assert_allclose(np.asarray(out["head"]["conv"]),
                               1 - 0.1 * 2.01, rtol=1e-6)
    # backbone: lr*0.5, decay off: 1 - 0.05*2
    np.testing.assert_allclose(np.asarray(out["backbone"]["conv"]),
                               1 - 0.05 * 2.0, rtol=1e-6)


def test_paramwise_longest_key_wins():
    params = {
        "backbone": {"layer1_0": {"k": jnp.ones(2)}, "other": {"k": jnp.ones(2)}},
    }
    grads = jax.tree.map(lambda p: jnp.ones_like(p), params)
    tx, _ = build_optimizer(
        dict(type="SGD", lr=1.0,
             paramwise_cfg=dict(custom_keys={
                 "backbone": dict(lr_mult=0.1),
                 "backbone.layer1": dict(lr_mult=0.0),
             })),
        dict(policy="fixed"),
        None,
        params,
    )
    out = _run_optax(tx, params, [grads])
    np.testing.assert_allclose(np.asarray(out["backbone"]["layer1_0"]["k"]), 1.0)
    np.testing.assert_allclose(np.asarray(out["backbone"]["other"]["k"]), 0.9)


def test_freeze_mask_beats_paramwise_and_sgd():
    """frozen_stages mask must zero updates for stem/layer1 even when a
    paramwise key targets the backbone with a nonzero lr."""
    params = {
        "backbone": {
            "conv1": {"kernel": jnp.ones(2)},
            "layer1_0": {"conv1": {"kernel": jnp.ones(2)}},
            "layer2_0": {"conv1": {"kernel": jnp.ones(2)}},
        },
        "bbox_head": {"cls": {"kernel": jnp.ones(2)}},
    }
    grads = jax.tree.map(lambda p: jnp.ones_like(p), params)
    tx, _ = build_optimizer(
        dict(type="SGD", lr=0.5,
             paramwise_cfg=dict(custom_keys={"backbone": dict(lr_mult=1.0)})),
        dict(policy="fixed"),
        None,
        params,
        frozen_stages=1,
    )
    out = _run_optax(tx, params, [grads])
    np.testing.assert_allclose(np.asarray(out["backbone"]["conv1"]["kernel"]), 1.0)
    np.testing.assert_allclose(
        np.asarray(out["backbone"]["layer1_0"]["conv1"]["kernel"]), 1.0
    )
    np.testing.assert_allclose(
        np.asarray(out["backbone"]["layer2_0"]["conv1"]["kernel"]), 0.5
    )
    np.testing.assert_allclose(np.asarray(out["bbox_head"]["cls"]["kernel"]), 0.5)


def test_step_lr_policy_and_warmup():
    sched = step_lr(0.1, [10, 20], gamma=0.1, warmup_iters=5, warmup_ratio=0.5)
    np.testing.assert_allclose(float(sched(0)), 0.05, rtol=1e-6)  # warmup start
    np.testing.assert_allclose(float(sched(5)), 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(sched(9)), 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(sched(10)), 0.01, rtol=1e-6)
    np.testing.assert_allclose(float(sched(25)), 0.001, rtol=1e-6)

    fixed = build_lr_schedule(dict(policy="fixed"), 3e-4)
    np.testing.assert_allclose(float(fixed(123)), 3e-4, rtol=1e-6)

    with pytest.raises(ValueError, match="lr policy"):
        build_lr_schedule(dict(policy="cosine"), 1e-3)


def test_step_lr_warmup_modes():
    """Review r3: mmcv's 'constant' and 'exp' warmup types must be honored,
    not silently executed as linear (mmcv LrUpdaterHook.get_warmup_lr)."""
    const = build_lr_schedule(
        dict(policy="step", step=[100], warmup="constant",
             warmup_iters=10, warmup_ratio=0.25), 0.4
    )
    np.testing.assert_allclose(float(const(0)), 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(const(9)), 0.1, rtol=1e-6)  # flat, not ramped
    np.testing.assert_allclose(float(const(10)), 0.4, rtol=1e-6)

    exp = build_lr_schedule(
        dict(policy="step", step=[100], warmup="exp",
             warmup_iters=10, warmup_ratio=0.25), 0.4
    )
    np.testing.assert_allclose(float(exp(0)), 0.4 * 0.25, rtol=1e-6)
    np.testing.assert_allclose(float(exp(5)), 0.4 * 0.25**0.5, rtol=1e-6)
    np.testing.assert_allclose(float(exp(10)), 0.4, rtol=1e-6)

    with pytest.raises(ValueError, match="warmup type"):
        step_lr(0.1, [10], warmup_iters=5, warmup="cosine")


def test_unknown_optimizer_type_fails_fast():
    with pytest.raises(ValueError, match="optimizer type"):
        build_optimizer(dict(type="LAMB", lr=1e-3), dict(policy="fixed"), None,
                        {"w": jnp.ones(2)})
