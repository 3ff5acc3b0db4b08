"""Test harness: force CPU backend with 8 virtual devices.

Multi-chip sharding tests run on a simulated mesh (SURVEY.md §4): set
XLA_FLAGS/JAX_PLATFORMS *before* jax initializes.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's axon/tpu default
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# jax is preloaded at interpreter startup in this image (axon sitecustomize),
# so JAX_PLATFORMS env alone is snapshotted too early — force via config.
jax.config.update("jax_platforms", "cpu")

# XLA-CPU's oneDNN matmuls run at reduced precision by default; parity tests
# against torch need true fp32 accumulation.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
