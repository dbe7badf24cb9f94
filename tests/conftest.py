"""Test harness: force an 8-virtual-device CPU platform so multi-chip
sharding paths are exercised without TPU hardware (the strategy the reference
never had — its GPU tests just skip on missing CUDA; see SURVEY.md §4)."""

import os

# force CPU even when the ambient env selects a TPU platform (e.g.
# JAX_PLATFORMS=axon) — the suite validates multi-chip sharding on 8 virtual
# CPU devices; TPU execution is covered by bench.py / __graft_entry__.py.
# NOTE: the env var is NOT enough here — the axon plugin imports jax before
# conftest runs, so the platform must be forced through jax.config.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
