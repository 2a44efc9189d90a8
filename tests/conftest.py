"""Test configuration: force an 8-device virtual CPU platform before JAX init.

All unit tests run on CPU with 8 virtual devices so that sharding /
multi-chip code paths (pjit over a Mesh) are exercised without TPU
hardware, per the framework's test strategy (SURVEY.md §4).
"""

import os

# The dev image's sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon (tunneled TPU), so env vars alone are too late here —
# update the already-imported config instead.  Unit tests are CPU-only with
# 8 virtual devices for sharding coverage.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# Keep matmuls deterministic & high precision for golden tests vs torch.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(47)
