"""Worker process for the multi-process distributed TRAINING test — NOT
collected by pytest (see tests/test_multihost.py).

Runs the REAL config-driven training entry (`apis.train.train_detector`)
under an explicitly-initialized 2-process jax distributed runtime: per-host
sharded infinite loader, the jitted train step over the global mesh (gradient
all-reduce over the cross-process backend), and the orbax checkpoint written
from the primary process.  This is the jax-native analogue of the
reference's DDP training launch (/root/reference/radet/apis/train.py:73-81,
tools/train.py:117-124).

Usage: python multihost_train_worker.py <coordinator> <nproc> <pid>
       <cfg_path> <work_dir>
"""

import os
import sys

coordinator, nproc, pid, cfg_path, work_dir = sys.argv[1:6]

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
if int(nproc) > 1:
    # plain local subprocesses are not an autodetectable cluster, so pass
    # the coordinator/process info explicitly (same runtime apis/train.py's
    # env-gated no-arg initialize() produces on a real pod)
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=int(nproc),
        process_id=int(pid),
    )
    assert jax.process_count() == int(nproc)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from radet_tpu.apis.train import train_detector  # noqa: E402
from radet_tpu.utils import Config  # noqa: E402

cfg = Config.fromfile(cfg_path)
state = train_detector(cfg, work_dir=work_dir, eval_during_train=False)

# dump final params so the test can compare runs without rebuilding a
# checkpoint template (every process writes its own replica: the test also
# asserts cross-process replication consistency)
import flax  # noqa: E402

flat = flax.traverse_util.flatten_dict(jax.device_get(state.params))
np.savez(
    os.path.join(work_dir, f"params_p{pid}.npz"),
    **{"/".join(map(str, k)): np.asarray(v) for k, v in flat.items()},
)
print(f"worker {pid} done step={int(jax.device_get(state.step))}")
