"""Test config: force CPU with 8 virtual devices so multi-chip sharding tests
run anywhere (SURVEY.md §4: the reference ships no tests; we simulate a TPU
slice with xla_force_host_platform_device_count).

Environment quirk: this machine's sitecustomize registers the 'axon' TPU
tunnel PJRT plugin at interpreter startup and sets
``jax.config.jax_platforms = "axon,cpu"`` — the config field takes priority
over the JAX_PLATFORMS env var, and initializing the axon backend from a
second process blocks on the single-chip session lock.  So the override must
go through jax.config, before any backend is initialized.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", "tests must run on CPU"

import numpy as np  # noqa: E402
import pytest  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture
def rng():
    return np.random.RandomState(0)
