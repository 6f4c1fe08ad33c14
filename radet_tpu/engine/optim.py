"""Optimizer + LR schedule (optax), matching the reference training recipe.

Reference (/root/reference/configs/base/default_runtime.py:1-19): AdamW
lr 4e-4 betas (0.9, 0.999) wd 0.05 eps 1e-8; OneCycle LR (torch semantics:
div_factor 25, final_div_factor 1e4, linear anneal, pct_start 0.05,
total_steps 100100); grad clip by global L2 norm 35.

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


def build_optimizer(optimizer_cfg: Dict, lr_cfg: Dict, grad_clip: Dict | None, params, frozen_stages: int = -1):
    """Returns (optax transform, schedule fn)."""
    assert optimizer_cfg.get("type", "adamw").lower() == "adamw"
    schedule = onecycle_linear(
        max_lr=float(lr_cfg.get("max_lr", optimizer_cfg.get("lr", 4e-4))),
        total_steps=int(lr_cfg.get("total_steps", 100100)),
        pct_start=float(lr_cfg.get("pct_start", 0.05)),
        div_factor=float(lr_cfg.get("div_factor", 25.0)),
        final_div_factor=float(lr_cfg.get("final_div_factor", 1e4)),
    )
    b1, b2 = optimizer_cfg.get("betas", (0.9, 0.999))
    chain = []
    if grad_clip:
        chain.append(optax.clip_by_global_norm(float(grad_clip.get("max_norm", 35.0))))
    chain.append(
        optax.adamw(
            learning_rate=schedule,
            b1=float(b1),
            b2=float(b2),
            eps=float(optimizer_cfg.get("eps", 1e-8)),
            weight_decay=float(optimizer_cfg.get("weight_decay", 0.05)),
        )
    )
    tx = optax.chain(*chain)
    if frozen_stages >= 0:
        trainable = frozen_param_mask(params, frozen_stages)
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()},
            jax.tree.map(lambda t: "train" if t else "freeze", trainable),
        )
    return tx, schedule
