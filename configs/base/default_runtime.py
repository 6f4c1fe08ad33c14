# Training recipe parity with the reference
# (/root/reference/configs/base/default_runtime.py:1-30), re-expressed for the
# optax/orbax stack: AdamW + OneCycle (linear anneal), iteration-based runner,
# grad-clip by global L2 norm, checkpoint/eval every 10k iters.
optimizer = dict(
    type="adamw",
    lr=0.0004,
    betas=(0.9, 0.999),
    weight_decay=0.05,
    eps=1e-08,
)
lr_config = dict(
    policy="onecycle",
    max_lr=0.0004,
    total_steps=100100,
    pct_start=0.05,
    anneal_strategy="linear",
)
runner = dict(max_iters=100000)
checkpoint_config = dict(interval=10000, max_to_keep=3)
evaluation = dict(interval=10000, metric="bbox")
grad_clip = dict(max_norm=35.0)
log_config = dict(interval=50)
# device mesh: data-parallel over all available devices by default
mesh = dict(data=-1)
log_level = "INFO"
seed = 0
# compute dtype for the conv tower (params stay float32)
compute_dtype = "bfloat16"
