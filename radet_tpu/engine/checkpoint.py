"""Orbax checkpointing of {params, batch_stats, opt_state, step}.

Replaces mmcv CheckpointHook + resume_from/load_from
(/root/reference/configs/base/default_runtime.py:17, tools/train.py:165-172,
apis/train.py:165-168). ``save``/``restore`` cover full training state
(resume); ``load_weights`` restores model variables only (the reference's
``load_from``)."""

from __future__ import annotations

import os
import os.path as osp
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3, interval: int = 10000):
        self.directory = osp.abspath(directory)
        self.interval = interval
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state, force: bool = False, wait: bool = False) -> bool:
        """Asynchronous by default: the write overlaps subsequent training
        steps; ``close()`` (and orbax itself, before a newer save) drains
        pending writes."""
        if not force and (step % self.interval != 0):
            return False
        payload = dict(
            params=state.params,
            batch_stats=state.batch_stats,
            opt_state=state.opt_state,
            step=np.asarray(state.step),
        )
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
        if wait:
            self._mgr.wait_until_finished()
        return True

    def latest_step(self) -> Optional[int]:
        self._mgr.wait_until_finished()
        return self._mgr.latest_step()

    def restore(self, state, step: Optional[int] = None):
        """Restore a full TrainState (same structure as ``state``)."""
        step = step if step is not None else self.latest_step()
        if step is None:
            return None
        template = dict(
            params=state.params,
            batch_stats=state.batch_stats,
            opt_state=state.opt_state,
            step=np.asarray(state.step),
        )
        restored = self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        return state._replace(
            step=jax.numpy.asarray(restored["step"]),
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
        )

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()


def save_weights(path: str, variables: Dict[str, Any], meta: Dict[str, Any] | None = None):
    """Weights-only checkpoint (inference / load_from).

    ``meta`` (e.g. CLASSES, code version) is written as ``meta.json`` beside
    the checkpoint — the analogue of the reference's checkpoint
    ``meta={mmdet_version+git hash, CLASSES}`` (tools/train.py:167-172)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(osp.abspath(path), variables)
    ckptr.wait_until_finished()
    if meta:
        write_meta(path, meta)


def write_meta(path: str, meta: Dict[str, Any]):
    """Write ``meta.json`` into a checkpoint (or manager-root) directory."""
    import json

    with open(osp.join(osp.abspath(path), "meta.json"), "w") as f:
        json.dump(meta, f, indent=1, default=str)


def load_meta(path: str) -> Dict[str, Any]:
    """Read checkpoint meta if present — looks in the given directory and,
    for manager step dirs, in the manager root. Returns {} when absent."""
    import json

    path = osp.abspath(path)
    for cand in (path, osp.dirname(path), osp.dirname(osp.dirname(path))):
        p = osp.join(cand, "meta.json")
        if osp.exists(p):
            with open(p) as f:
                return json.load(f)
    return {}


def _resolve_checkpoint_dir(path: str) -> str:
    """Accept any of: a StandardCheckpointer dir, a CheckpointManager step dir
    (<root>/<step>), or a CheckpointManager root (<root>) — resolving the
    latter two to the actual item directory containing _METADATA."""
    path = osp.abspath(path)
    if osp.exists(osp.join(path, "_METADATA")):
        return path
    if osp.exists(osp.join(path, "default", "_METADATA")):
        return osp.join(path, "default")
    # manager root: pick the latest numeric step subdir
    steps = sorted(
        (int(d) for d in os.listdir(path) if d.isdigit()), reverse=True
    ) if osp.isdir(path) else []
    for step in steps:
        cand = osp.join(path, str(step), "default")
        if osp.exists(osp.join(cand, "_METADATA")):
            return cand
        cand = osp.join(path, str(step))
        if osp.exists(osp.join(cand, "_METADATA")):
            return cand
    raise FileNotFoundError(
        f"no orbax checkpoint found at {path} (looked for _METADATA in the "
        f"directory, <dir>/default, and <dir>/<step>/default)"
    )


def load_weights(path: str, template: Dict[str, Any] | None = None) -> Dict[str, Any]:
    """Weights-only restore. ``path`` may be a save_weights dir, a
    CheckpointManager step dir, or a CheckpointManager root (latest step).
    Full-train-state checkpoints are reduced to their model variables."""
    resolved = _resolve_checkpoint_dir(path)
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(resolved) if template is None else None
    if restored is None:
        try:
            return ckptr.restore(resolved, target=template)
        except (ValueError, KeyError) as template_err:
            # the payload may be a full TrainState; restore untyped and
            # extract the model variables — but a mismatch that is NOT a
            # train-state wrapper is a genuine wrong-checkpoint error
            restored = ckptr.restore(resolved)
            if not (
                isinstance(restored, dict)
                and "params" in restored
                and "opt_state" in restored
            ):
                raise ValueError(
                    f"checkpoint at {resolved} does not match the model "
                    f"variable structure"
                ) from template_err
    if isinstance(restored, dict) and "params" in restored and "opt_state" in restored:
        restored = {
            "params": restored["params"],
            "batch_stats": restored.get("batch_stats", {}),
        }
    return restored


def resolve_manager_root(path: str):
    """Map a user-given resume path to (manager_root, step | None).

    Accepts a CheckpointManager root, a step dir (<root>/<step>), or a work
    dir containing a 'checkpoints' subdirectory. Raises FileNotFoundError
    for anything else."""
    path = osp.abspath(path)
    if not osp.isdir(path):
        raise FileNotFoundError(f"resume path does not exist: {path}")
    base = osp.basename(path.rstrip("/"))
    if base.isdigit() and osp.isdir(osp.dirname(path)):
        return osp.dirname(path), int(base)
    if any(d.isdigit() for d in os.listdir(path)):
        return path, None
    sub = osp.join(path, "checkpoints")
    if osp.isdir(sub):
        return sub, None
    raise FileNotFoundError(f"no checkpoints found under resume path: {path}")
