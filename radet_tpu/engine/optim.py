"""Optimizer + LR schedule (optax), matching the reference training recipe.

Reference (/root/reference/configs/base/default_runtime.py:1-19): AdamW
lr 4e-4 betas (0.9, 0.999) wd 0.05 eps 1e-8; OneCycle LR (torch semantics:
div_factor 25, final_div_factor 1e4, linear anneal, pct_start 0.05,
total_steps 100100); grad clip by global L2 norm 35.

The reference builds ANY torch optimizer from config via mmcv's
``build_optimizer`` (apis/train.py:87) with optional ``paramwise_cfg``
per-module lr/decay multipliers — the config surface here mirrors that:
``type`` in {AdamW, Adam, SGD, RMSprop} (torch-coupled L2 for the non-AdamW
types), ``paramwise_cfg=dict(custom_keys={'backbone': dict(lr_mult=0.1,
decay_mult=1.0)})`` with mmcv's longest-key-first matching, and
``lr_config.policy`` in {onecycle, step, fixed} (mmcv OneCycleLrUpdater /
StepLrUpdater with linear warmup / constant).

``frozen_stages`` is realized as an optimizer mask (zero updates for the
stem + frozen layers; their gradients are already zero via stop_gradient in
the backbone) — the functional analogue of mmcv's requires_grad=False
(resnet.py:573-584 in the reference).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax


def onecycle_linear(
    max_lr: float,
    total_steps: int,
    pct_start: float = 0.05,
    div_factor: float = 25.0,
    final_div_factor: float = 1e4,
) -> Callable:
    """torch.optim.lr_scheduler.OneCycleLR with anneal_strategy='linear'."""
    initial = max_lr / div_factor
    final = initial / final_div_factor
    up = max(1.0, float(total_steps) * pct_start - 1.0)
    down = max(1.0, float(total_steps) - 1.0 - up)

    def schedule(step):
        s = jnp.asarray(step, jnp.float32)
        lr_up = initial + (max_lr - initial) * (s / up)
        lr_down = max_lr + (final - max_lr) * ((s - up) / down)
        return jnp.where(s <= up, lr_up, jnp.maximum(lr_down, final))

    return schedule


def step_lr(
    base_lr: float,
    milestones,
    gamma: float = 0.1,
    warmup_iters: int = 0,
    warmup_ratio: float = 1.0 / 3.0,
    warmup: str = "linear",
) -> Callable:
    """mmcv StepLrUpdaterHook (by iter) with optional warmup.

    ``warmup``: 'linear' | 'constant' | 'exp' — the three mmcv warmup modes
    (mmcv LrUpdaterHook.get_warmup_lr semantics)."""
    if warmup not in ("linear", "constant", "exp"):
        raise ValueError(f"unsupported warmup type {warmup!r} (linear/constant/exp)")
    ms = jnp.asarray(sorted(int(m) for m in milestones), jnp.float32)

    def schedule(step):
        s = jnp.asarray(step, jnp.float32)
        lr = base_lr * gamma ** jnp.sum(s >= ms)
        if warmup_iters > 0:
            frac = s / warmup_iters
            if warmup == "constant":
                factor = jnp.asarray(warmup_ratio, jnp.float32)
            elif warmup == "exp":
                factor = warmup_ratio ** (1.0 - frac)
            else:  # linear
                factor = 1.0 - (1.0 - warmup_ratio) * (1.0 - frac)
            lr = jnp.where(s < warmup_iters, lr * factor, lr)
        return lr

    return schedule


def build_lr_schedule(lr_cfg: Dict, base_lr: float) -> Callable:
    policy = str(lr_cfg.get("policy", "onecycle")).lower()
    if policy == "onecycle":
        return onecycle_linear(
            max_lr=float(lr_cfg.get("max_lr", base_lr)),
            total_steps=int(lr_cfg.get("total_steps", 100100)),
            pct_start=float(lr_cfg.get("pct_start", 0.05)),
            div_factor=float(lr_cfg.get("div_factor", 25.0)),
            final_div_factor=float(lr_cfg.get("final_div_factor", 1e4)),
        )
    if policy == "step":
        return step_lr(
            base_lr,
            lr_cfg.get("step", []),
            gamma=float(lr_cfg.get("gamma", 0.1)),
            warmup_iters=int(lr_cfg.get("warmup_iters", 0))
            if lr_cfg.get("warmup") else 0,
            warmup_ratio=float(lr_cfg.get("warmup_ratio", 1.0 / 3.0)),
            warmup=str(lr_cfg.get("warmup") or "linear"),
        )
    if policy in ("fixed", "constant"):
        return lambda step: jnp.asarray(base_lr, jnp.float32)
    raise ValueError(f"unsupported lr policy {policy!r} (onecycle/step/fixed)")


def frozen_param_mask(params: Dict, frozen_stages: int) -> Dict:
    """Pytree of bools: True = trainable. Freezes backbone stem (conv1/bn1)
    when frozen_stages >= 0 and layer{1..frozen_stages}_* blocks."""

    frozen_prefixes = []
    if frozen_stages >= 0:
        # plain stem (conv1/bn1) and the V1d deep stem (stem_conv*/stem_bn*)
        frozen_prefixes += ["conv1", "bn1", "stem_conv", "stem_bn"]
    for s in range(1, frozen_stages + 1):
        frozen_prefixes.append(f"layer{s}_")

    def label(path, leaf):
        keys = [getattr(p, "key", str(p)) for p in path]
        if len(keys) >= 2 and keys[0] == "backbone":
            if any(keys[1] == p or keys[1].startswith(p) for p in frozen_prefixes):
                return False
        return True

    return jax.tree_util.tree_map_with_path(label, params)


def _base_transform(otype: str, lr: Callable, cfg: Dict, weight_decay: float):
    """One optimizer instance at a given (possibly scaled) lr/decay.

    AdamW uses decoupled decay (torch AdamW); Adam/SGD/RMSprop apply
    torch-coupled L2 (grad += wd * param) to match their torch semantics.
    """
    if otype == "adamw":
        b1, b2 = cfg.get("betas", (0.9, 0.999))
        return optax.adamw(
            learning_rate=lr,
            b1=float(b1),
            b2=float(b2),
            eps=float(cfg.get("eps", 1e-8)),
            weight_decay=weight_decay,
        )
    coupled = [optax.add_decayed_weights(weight_decay)] if weight_decay else []
    if otype == "adam":
        b1, b2 = cfg.get("betas", (0.9, 0.999))
        return optax.chain(
            *coupled,
            optax.adam(lr, b1=float(b1), b2=float(b2), eps=float(cfg.get("eps", 1e-8))),
        )
    if otype == "sgd":
        momentum = float(cfg.get("momentum", 0.0))
        return optax.chain(
            *coupled,
            optax.sgd(
                lr,
                momentum=momentum if momentum > 0 else None,
                nesterov=bool(cfg.get("nesterov", False)),
            ),
        )
    if otype == "rmsprop":
        return optax.chain(
            *coupled,
            optax.rmsprop(
                lr,
                decay=float(cfg.get("alpha", 0.99)),
                eps=float(cfg.get("eps", 1e-8)),
                momentum=float(cfg.get("momentum", 0.0)) or None,
            ),
        )
    raise ValueError(
        f"unsupported optimizer type {otype!r} (AdamW/Adam/SGD/RMSprop)"
    )


def _paramwise_labels(params, custom_keys):
    """mmcv DefaultOptimizerConstructor custom_keys matching: longest key
    first, substring match against the dotted parameter path."""
    ordered = sorted(custom_keys, key=len, reverse=True)

    def label(path, leaf):
        name = ".".join(getattr(p, "key", str(p)) for p in path)
        for key in ordered:
            if key in name:
                return key
        return "__default__"

    return jax.tree_util.tree_map_with_path(label, params)


def build_optimizer(
    optimizer_cfg: Dict,
    lr_cfg: Dict,
    grad_clip: Dict | None,
    params,
    frozen_stages: int = -1,
):
    """Returns (optax transform, schedule fn)."""
    cfg = dict(optimizer_cfg)
    otype = str(cfg.get("type", "adamw")).lower()
    base_lr = float(cfg.get("lr", 4e-4))
    weight_decay = float(cfg.get("weight_decay", 0.05 if otype == "adamw" else 0.0))
    schedule = build_lr_schedule(dict(lr_cfg or {}), base_lr)

    paramwise = dict(cfg.get("paramwise_cfg") or {})
    custom_keys = {
        str(k): dict(v) for k, v in dict(paramwise.get("custom_keys") or {}).items()
    }

    chain = []
    if grad_clip:
        # global clip BEFORE any per-group transform (mmcv OptimizerHook
        # clips the full gradient, not per param group)
        chain.append(optax.clip_by_global_norm(float(grad_clip.get("max_norm", 35.0))))

    if custom_keys:
        groups = {"__default__": _base_transform(otype, schedule, cfg, weight_decay)}
        for key, mults in custom_keys.items():
            lr_mult = float(mults.get("lr_mult", 1.0))
            decay_mult = float(mults.get("decay_mult", 1.0))
            scaled = (lambda m: (lambda step: schedule(step) * m))(lr_mult)
            groups[key] = _base_transform(
                otype, scaled, cfg, weight_decay * decay_mult
            )
        chain.append(
            optax.multi_transform(groups, _paramwise_labels(params, custom_keys))
        )
    else:
        chain.append(_base_transform(otype, schedule, cfg, weight_decay))

    tx = optax.chain(*chain)
    if frozen_stages >= 0:
        trainable = frozen_param_mask(params, frozen_stages)
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()},
            jax.tree.map(lambda t: "train" if t else "freeze", trainable),
        )
    return tx, schedule
