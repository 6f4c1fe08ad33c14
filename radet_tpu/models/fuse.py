"""Fold frozen BatchNorms into the preceding convolution's weights.

Parity surface: the reference's ``tools/test.py --fuse-conv-bn`` calls mmcv's
``fuse_conv_bn`` (/root/reference/tools/test.py:26-28,173-174) to rewrite
``y = BN(conv(x, W) [+ b])`` as a single conv.  Every BatchNorm in this build
is a :class:`~radet_tpu.models.resnet.FrozenAwareBN` running in
``norm_eval`` mode (running statistics, never updated — the RADet training
recipe), so the fold is *exact*, not an inference-only approximation:

    BN(z) = (z - mean) * gamma / sqrt(var + eps) + beta = z * s + (beta - s * mean)
    with s = gamma / sqrt(var + eps)

We scale the conv kernel's output channels by ``s`` (and the conv bias, when
one exists) and turn the BN into a pure ``+ (beta - s * mean)`` shift by
resetting its statistics to (mean=0, var=1-eps) and its affine to
(scale=1, bias=beta - s*mean).  The module graph is untouched — the same
flax model runs the fused variables, checkpoints stay loadable, and XLA
constant-folds the now-identity normalization away.

Conv<->BN pairing is by the naming conventions used across the model zoo
(``convX``/``bnX``, ``*_conv``/``*_bn``, ``convs_i``/``bns_i``, the
split-attention ``conv``/``bn0`` + ``fc1``/``bn1`` pair).  A BN whose
partner cannot be identified as a *plain* conv (a bare ``kernel`` plus
optional ``bias``) is left unfused — e.g. DetectoRS SAC convs re-standardize
their weights at call time, so folding into their raw kernel would be wrong;
leaving the BN in place is always exact.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-5  # every FrozenAwareBN uses nn.BatchNorm(epsilon=1e-5)


def _is_bn_leaf(node) -> bool:
    return (
        isinstance(node, dict)
        and set(node) == {"BatchNorm_0"}
        and isinstance(node["BatchNorm_0"], dict)
        and {"mean", "var"} <= set(node["BatchNorm_0"])
    )


def _is_plain_conv(node) -> bool:
    if not isinstance(node, dict):
        return False
    keys = set(node)
    if keys not in ({"kernel"}, {"kernel", "bias"}):
        return False
    k = node["kernel"]
    return hasattr(k, "ndim") and k.ndim >= 2


def _conv_candidates(bn_key: str, siblings) -> List[str]:
    """Possible conv names for ``bn_key`` among ``siblings`` (ordered)."""
    cands: List[str] = []
    if bn_key.endswith("_bn"):
        cands.append(bn_key[:-3] + "_conv")
    if bn_key.startswith("bns_"):
        cands.append("convs_" + bn_key[len("bns_"):])
    m = re.fullmatch(r"(.*)bn(\d*)", bn_key)
    if m:
        cands.append(m.group(1) + "conv" + m.group(2))
    # SplitAttentionConv (models/resnet.py): pairs are (conv, bn0), (fc1, bn1)
    if bn_key == "bn0" and "conv" in siblings:
        cands.append("conv")
    if bn_key == "bn1" and "conv1" not in siblings and "fc1" in siblings:
        cands.append("fc1")
    return [c for c in cands if c in siblings]


def fuse_conv_bn(variables) -> Tuple[Any, Dict[str, int]]:
    """Return ``(fused_variables, report)``.

    ``variables`` is the usual ``{'params': ..., 'batch_stats': ...}`` bundle
    (flax FrozenDict or plain dict).  ``report`` counts ``fused`` and
    ``skipped`` BNs plus the skipped paths (for logging).
    """
    try:  # flax FrozenDict in, FrozenDict out
        from flax.core import freeze, unfreeze

        frozen = not isinstance(variables, dict)
        tree = unfreeze(variables)
    except Exception:  # pragma: no cover - flax always present
        frozen = False
        tree = variables

    if "batch_stats" not in tree:
        return variables, {"fused": 0, "skipped": 0, "skipped_paths": []}

    params = tree["params"]
    stats = tree["batch_stats"]
    report = {"fused": 0, "skipped": 0, "skipped_paths": []}

    def walk(stats_node, params_node, path):
        if not isinstance(stats_node, dict) or not isinstance(params_node, dict):
            return
        for key, sub in list(stats_node.items()):
            if _is_bn_leaf(sub) and key in params_node:
                _try_fuse(key, stats_node, params_node, path)
            else:
                walk(sub, params_node.get(key, {}), path + (key,))

    def _try_fuse(bn_key, stats_parent, params_parent, path):
        conv_keys = [
            c for c in _conv_candidates(bn_key, params_parent)
            if _is_plain_conv(params_parent.get(c))
        ]
        if not conv_keys:
            report["skipped"] += 1
            report["skipped_paths"].append("/".join(path + (bn_key,)))
            return
        conv = params_parent[conv_keys[0]]
        bn_p = params_parent[bn_key]["BatchNorm_0"]
        bn_s = stats_parent[bn_key]["BatchNorm_0"]
        mean = jnp.asarray(bn_s["mean"], jnp.float32)
        var = jnp.asarray(bn_s["var"], jnp.float32)
        gamma = jnp.asarray(bn_p["scale"], jnp.float32)
        beta = jnp.asarray(bn_p["bias"], jnp.float32)
        s = gamma / jnp.sqrt(var + BN_EPS)

        kernel = jnp.asarray(conv["kernel"], jnp.float32)
        conv["kernel"] = (kernel * s).astype(kernel.dtype)  # HWIO: out = last
        if "bias" in conv:
            bias = jnp.asarray(conv["bias"], jnp.float32)
            conv["bias"] = (bias * s).astype(bias.dtype)
        bn_p["scale"] = jnp.ones_like(gamma)
        bn_p["bias"] = (beta - s * mean).astype(beta.dtype)
        bn_s["mean"] = jnp.zeros_like(mean)
        # var = 1 - eps so the BN divides by sqrt((1-eps)+eps) == 1 exactly
        bn_s["var"] = jnp.full_like(var, np.float32(1.0) - np.float32(BN_EPS))
        report["fused"] += 1

    walk(stats, params, ())
    out = freeze(tree) if frozen else tree
    return out, report
