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
