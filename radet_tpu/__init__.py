"""radet-tpu: a TPU-native detection framework with the capabilities of RADet.

Re-architected for JAX/XLA/Pallas/pjit rather than ported from the
PyTorch/mmdetection reference (YangHai-1218/RADet):

- static-shape batched inference with on-device decode and vote-NMS,
- visibility-guided probabilistic label assignment as a vectorized jitted
  function inside the train step (reference computes it in CPU dataloader
  workers, radet/datasets/pipelines/label_assignment.py),
- data-parallel training via jax.sharding/pjit over a device mesh instead of
  DDP/NCCL,
- orbax checkpointing, optax AdamW + OneCycle.
"""

__version__ = "0.1.0"

# Respect the JAX_PLATFORMS environment variable even on machines whose
# sitecustomize pins jax.config.jax_platforms (the config field otherwise
# silently overrides the env var; on this harness that sends every
# 'JAX_PLATFORMS=cpu' run through the single-chip TPU tunnel).
def _respect_jax_platforms_env() -> None:
    import os

    env = os.environ.get("JAX_PLATFORMS")
    if not env:
        return
    import jax

    try:
        if jax.config.jax_platforms != env:
            jax.config.update("jax_platforms", env)
    except RuntimeError:
        pass  # backends already initialized; too late to switch


_respect_jax_platforms_env()


def _maybe_enable_compile_cache() -> None:
    """Opt-in persistent XLA compilation cache (RADET_COMPILE_CACHE=<dir>):
    repeated tool invocations then skip the multi-minute first compile."""
    import os

    cache_dir = os.environ.get("RADET_COMPILE_CACHE")
    if not cache_dir:
        return
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", os.path.expanduser(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except (RuntimeError, AttributeError):
        pass


_maybe_enable_compile_cache()
