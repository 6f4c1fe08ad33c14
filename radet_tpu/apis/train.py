"""Config-driven training (the reference apis/train.py:train_detector
re-expressed as an explicit jitted step loop over a device mesh).

Hook points (logging / checkpointing / periodic eval) are plain python at the
loop level — the mmcv Runner+hook machinery collapses into ~betwen-step
callbacks because all the per-step work (forward, assignment, loss, grads,
update) lives inside one compiled function (engine/train_step.py).
"""

from __future__ import annotations

import os
import os.path as osp
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.loader import DataLoader
from ..engine.checkpoint import CheckpointManager, load_weights
from ..engine.optim import build_optimizer
from ..engine.train_step import TrainState, build_train_step
from ..parallel.mesh import create_mesh, replicated_sharding, shard_batch
from ..utils.logging import get_root_logger
from .common import (
    anchor_head_spec,
    assignment_cfg_from,
    build_dataset,
    build_model_and_anchors,
    head_type_from_cfg,
    init_variables,
    loss_cfg_from,
    normalizer_from_cfg,
)
from .test import evaluate_results, run_inference


def check_trainable_quant(model_cfg) -> None:
    """int8 is a deploy-time switch: the quantizing round() has zero
    gradient, so training a plain quant config would silently freeze the
    quantized convs.  The exception is QAT (qat=True alongside quant): the
    forward then runs STE fake-quantization at the same deploy scales, which
    HAS gradients (ops/quant.py::fake_quant_ste) — the supported way to
    train a quant config (configs/bop/r50_ycbv_pbr_int8_qat.py)."""
    for part in ("backbone", "bbox_head"):
        pcfg = model_cfg.get(part, {})
        assert not pcfg.get("quant") or pcfg.get("qat"), (
            f"model.{part}.quant={pcfg.get('quant')!r} without qat=True is a "
            "deploy-time option (ops/quant.py) — train the bf16 config and "
            "flip quant at test time, or set qat=True for STE fine-tuning "
            "(r50_ycbv_pbr_int8_qat.py)"
        )


def train_detector(
    cfg,
    work_dir: Optional[str] = None,
    resume_from: Optional[str] = None,
    max_iters: Optional[int] = None,
    seed: Optional[int] = None,
    eval_during_train: bool = True,
) -> TrainState:
    work_dir = work_dir or cfg.get("work_dir", "work_dirs/default")
    os.makedirs(work_dir, exist_ok=True)
    seed = seed if seed is not None else int(cfg.get("seed", 0))

    # multi-host: the jax-native replacement for the reference's
    # pytorch/slurm/mpi launchers (tools/train.py:66-70) — coordinator
    # address/process id come from the environment (JAX_COORDINATOR_ADDRESS
    # or cloud-TPU metadata).  Must run before anything touches the backend.
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get("RADET_DISTRIBUTED"):
        jax.distributed.initialize()

    logger = get_root_logger(
        osp.join(work_dir, f"train_{int(time.time())}_p{jax.process_index()}.log")
    )
    if jax.process_count() > 1:
        logger.info(
            f"distributed: process {jax.process_index()}/{jax.process_count()}"
        )

    from ..utils.env import env_report

    logger.info("environment:\n" + env_report())
    # dump the resolved config into the work dir (reference tools/train.py:129)
    try:
        cfg.dump(osp.join(work_dir, "config.py"))
    except Exception as e:  # noqa: BLE001 - non-fatal
        logger.warning(f"config dump failed: {e}")

    check_trainable_quant(cfg.model)
    model, anchors, ranges, counts = build_model_and_anchors(cfg)
    input_size = tuple(cfg.get("input_size", (480, 640)))
    variables = init_variables(model, input_size, seed)
    # model.pretrained: backbone/partial weights; load_from: full detector
    # weights (the reference's load_from, e.g. mixpbr finetuning configs)
    for source in (cfg.model.get("pretrained"), cfg.get("load_from")):
        if source:
            logger.info(f"loading weights from {source}")
            loaded = load_weights(source, template=None)
            variables = _merge_pretrained(variables, loaded, logger)

    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    frozen_stages = int(cfg.model.backbone.get("frozen_stages", -1))
    tx, schedule = build_optimizer(
        cfg.optimizer.to_dict(),
        cfg.lr_config.to_dict(),
        cfg.get("grad_clip").to_dict() if cfg.get("grad_clip") is not None else None,
        params,
        frozen_stages=frozen_stages,
    )
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )

    batch_size = int(cfg.data.get("samples_per_gpu", 16))
    # optional spatial partitioning: cfg.parallel = dict(space=N) shards each
    # image's H axis over N adjacent chips in addition to data parallelism
    # (parallel/mesh.py module docstring); N must divide the device count
    par_cfg = cfg.get("parallel")
    space = int(par_cfg.get("space", 1)) if par_cfg else 1
    if jax.process_count() > 1:
        # multi-host: every process must join the (global) mesh with all of
        # its local devices; `batch_size` is the PER-HOST batch (the loader
        # shards the dataset by process) and must divide over local devices
        n_local = jax.local_device_count()
        if n_local % space != 0:
            raise ValueError(
                f"parallel.space={space} must divide the {n_local} local "
                "devices of each host (spatial groups cannot span hosts)"
            )
        if batch_size % (n_local // space) != 0:
            raise ValueError(
                f"samples_per_gpu={batch_size} must be divisible by the "
                f"{n_local // space} data-parallel devices of each host"
            )
        mesh = create_mesh(jax.devices(), space=space)
        state = jax.device_put(state, replicated_sharding(mesh))
        logger.info(
            f"mesh: {mesh.shape} over {jax.process_count()} hosts; "
            f"per-host batch {batch_size} (global {batch_size * jax.process_count()})"
        )
    else:
        n_dev = len(jax.devices())
        if space > n_dev:
            raise ValueError(f"parallel.space={space} exceeds {n_dev} devices")
        # the data axis must divide the batch; with spatial partitioning the
        # device count is dp*space, of which only dp consumes batch rows
        dp = max(
            d for d in range(1, n_dev // space + 1)
            if batch_size % d == 0 and d * space <= n_dev
        )
        use_dev = dp * space
        mesh = create_mesh(jax.devices()[:use_dev], space=space)
        state = jax.device_put(state, replicated_sharding(mesh))
        logger.info(f"mesh: {mesh.shape} over {use_dev}/{n_dev} devices; batch {batch_size}")

    ckpt_cfg = cfg.get("checkpoint_config")
    ckpt = CheckpointManager(
        osp.join(work_dir, "checkpoints"),
        max_to_keep=int(ckpt_cfg.get("max_to_keep", 3)) if ckpt_cfg else 3,
        interval=int(ckpt_cfg.get("interval", 10000)) if ckpt_cfg else 10000,
    )
    if resume_from:
        if resume_from in ("auto", True):
            restored = ckpt.restore(state)
            if restored is None:
                logger.warning("resume requested but work_dir has no checkpoint; starting fresh")
        else:
            # explicit path: manager root, step dir, or another run's work dir
            from ..engine.checkpoint import resolve_manager_root

            root, step = resolve_manager_root(str(resume_from))
            src = CheckpointManager(root)
            restored = src.restore(state, step=step)
            src.close()
            if restored is None:
                raise FileNotFoundError(f"no checkpoint restorable from {resume_from}")
        if restored is not None:
            state = restored
            logger.info(f"resumed from step {int(state.step)}")

    head_type = head_type_from_cfg(cfg.model)
    if head_type == "RADetHead":
        train_step = build_train_step(
            model,
            tx,
            anchors,
            ranges,
            img_norm=cfg.img_norm_cfg.to_dict(),
            num_classes=int(cfg.model.bbox_head.num_classes),
            assignment_cfg=assignment_cfg_from(cfg),
            normalizer=normalizer_from_cfg(cfg),
            loss_cfg=loss_cfg_from(cfg),
        )
        batch_keys = ("image", "gt_boxes", "gt_labels", "gt_valid", "dist_vals")
    else:
        # generic anchor-based heads (ATSSHead/AnchorHead): IoU assignment
        # inside the step, no distance maps in the batch
        from ..engine.train_step import build_train_step_anchor

        train_step = build_train_step_anchor(
            model,
            tx,
            anchors,
            counts,
            img_norm=cfg.img_norm_cfg.to_dict(),
            num_classes=int(cfg.model.bbox_head.num_classes),
            spec=anchor_head_spec(cfg),
        )
        batch_keys = ("image", "gt_boxes", "gt_labels", "gt_valid")

    dataset = build_dataset(cfg, "train", test_mode=False)
    logger.info(f"train dataset: {len(dataset)} images, {len(dataset.CLASSES)} classes")
    # checkpoint meta: CLASSES + code version, the analogue of the
    # reference's checkpoint meta embedding (tools/train.py:167-172)
    if jax.process_index() == 0:
        import subprocess

        import radet_tpu
        from ..engine.checkpoint import write_meta

        try:
            git_hash = subprocess.run(
                ["git", "rev-parse", "--short", "HEAD"],
                capture_output=True, text=True, timeout=5,
                cwd=osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))),
            ).stdout.strip() or None
        except Exception:
            git_hash = None
        write_meta(
            ckpt.directory,
            dict(classes=list(dataset.CLASSES),
                 radet_tpu_version=radet_tpu.__version__, git_hash=git_hash),
        )
    loader = DataLoader(
        dataset,
        batch_size=batch_size,
        shuffle=bool(cfg.data.get("shuffle", True)),
        num_workers=int(cfg.data.get("workers_per_gpu", 8)),
        seed=seed,
        shard_id=jax.process_index(),
        num_shards=jax.process_count(),
        infinite=True,
        worker_mode=str(cfg.data.get("worker_mode", "thread")),
    )

    total_iters = max_iters if max_iters is not None else int(cfg.runner.get("max_iters", 100000))
    log_interval = int(cfg.get("log_config", {}).get("interval", 50) if cfg.get("log_config") else 50)
    eval_cfg = cfg.get("evaluation")
    eval_interval = int(eval_cfg.get("interval", 10000)) if eval_cfg else 0

    rng_key = jax.random.PRNGKey(seed + 1)
    best_score = float("-inf")
    eval_cache: dict = {}  # val dataset + compiled infer step, built once
    last_saved = -1
    it = iter(loader)
    t_log = time.time()
    start_step = int(state.step)
    try:
        for i in range(start_step, total_iters):
            batch = next(it)
            device_batch = shard_batch({k: batch[k] for k in batch_keys}, mesh)
            state, metrics = train_step(state, device_batch, rng_key)
            step = i + 1
            if log_interval and step % log_interval == 0:
                metrics = {k: float(v) for k, v in jax.device_get(metrics).items()}
                dt = (time.time() - t_log) / log_interval
                t_log = time.time()
                lr = float(schedule(step))
                logger.info(
                    f"iter {step}/{total_iters} lr {lr:.2e} "
                    + " ".join(f"{k} {v:.4f}" for k, v in metrics.items())
                    + f" | {dt * 1000:.0f} ms/iter ({batch_size / dt:.1f} img/s)"
                )
            if ckpt.interval and step % ckpt.interval == 0:
                ckpt.save(step, jax.device_get(state), force=True)
                last_saved = step
                logger.info(f"checkpoint saved at step {step}")
            if eval_during_train and eval_interval and step % eval_interval == 0:
                metrics_eval = _run_eval(
                    cfg, model, state, anchors, counts, logger, eval_cache
                )
                # save_best (reference EvalHook save_best, eval_hooks.py:156-170)
                save_best_key = (eval_cfg.get("save_best") if eval_cfg else None) or None
                if metrics_eval and save_best_key:
                    key_name = f"bbox_{save_best_key}" if not str(save_best_key).startswith("bbox_") else save_best_key
                    # datasets with their own protocol (VOC mean-AP) emit
                    # unprefixed keys — fall back to the raw name
                    score = metrics_eval.get(key_name, metrics_eval.get(str(save_best_key)))
                    if score is not None and score > best_score:
                        best_score = score
                        from ..engine.checkpoint import save_weights

                        best_dir = osp.join(work_dir, "best_weights")
                        import shutil

                        shutil.rmtree(best_dir, ignore_errors=True)
                        save_weights(
                            best_dir,
                            jax.device_get(
                                {"params": state.params, "batch_stats": state.batch_stats}
                            ),
                        )
                        logger.info(f"new best {key_name}={score:.4f} saved to {best_dir}")

    except BaseException:
        # crash-safe: persist the last complete step before propagating
        # (the reference's only recovery story is restart-from-checkpoint,
        # SURVEY.md §5)
        try:
            step_now = int(jax.device_get(state.step))
            if step_now > 0 and step_now != last_saved:
                ckpt.save(step_now, jax.device_get(state), force=True, wait=True)
                logger.info(f"emergency checkpoint saved at step {step_now}")
        except Exception as save_err:  # noqa: BLE001
            logger.error(f"emergency checkpoint failed: {save_err}")
        raise

    if last_saved != total_iters:
        ckpt.save(total_iters, jax.device_get(state), force=True)
    ckpt.close()
    return state


def _run_eval(cfg, model, state, anchors, counts, logger, _cache):
    # the val dataset and the compiled infer step are invariant across the
    # periodic evals of one run — rebuilding them each interval re-parsed
    # the annotation json and recompiled the full inference program
    # (tens of seconds on TPU) every 10k steps
    if "dataset" not in _cache:
        try:
            _cache["dataset"] = build_dataset(cfg, "val")
        except (FileNotFoundError, KeyError) as e:
            logger.warning(f"skipping eval: {e}")
            return None
        from .common import build_infer_for_cfg

        _cache["infer"] = build_infer_for_cfg(cfg, model, anchors, counts)
    val_dataset = _cache["dataset"]
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    results = run_inference(
        model,
        variables,
        val_dataset,
        anchors=anchors,
        level_counts=counts,
        img_norm=cfg.img_norm_cfg.to_dict(),
        test_cfg=cfg.test_cfg.to_dict(),
        batch_size=int(cfg.data.get("samples_per_gpu", 8)),
        normalizer=normalizer_from_cfg(cfg),
        infer_step=_cache["infer"],
    )
    metrics = evaluate_results(val_dataset, results)
    logger.info("eval: " + " ".join(f"{k} {v:.4f}" for k, v in metrics.items()))
    return metrics


def _merge_pretrained(variables, loaded, logger):
    """Merge loaded weight trees into freshly-initialized variables, keeping
    template entries for anything absent (e.g. backbone-only imports)."""
    import flax

    flat_v = flax.traverse_util.flatten_dict(variables)
    flat_l = flax.traverse_util.flatten_dict(loaded)
    n_used = 0
    for k, v in flat_l.items():
        if k in flat_v and flat_v[k].shape == np.asarray(v).shape:
            flat_v[k] = jnp.asarray(v)
            n_used += 1
        else:
            logger.warning(f"pretrained key skipped: {'/'.join(map(str, k))}")
    logger.info(f"loaded {n_used}/{len(flat_v)} arrays from pretrained weights")
    return flax.traverse_util.unflatten_dict(flat_v)
