"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on host-platform virtual devices (the TPU analogue of multi-node
testing without a cluster, SURVEY.md §4).
"""
import os

# Force CPU: the ambient environment pins JAX_PLATFORMS to the tunneled TPU
# ('axon'), which is single-chip and slow to compile — tests validate on the
# virtual host mesh instead. Set OS1_TEST_PLATFORM to override.
os.environ["JAX_PLATFORMS"] = os.environ.get("OS1_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# Belt and braces: if some plugin imported jax before this conftest ran, the
# env var above was read too late — update the live config too.
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
