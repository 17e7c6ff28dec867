"""Test configuration: force an 8-device virtual CPU platform so multi-chip
sharding semantics (mesh, pjit, collectives) are exercised without TPU hardware.

Mirrors the test strategy gap identified in SURVEY.md §4: the reference has no
test suite at all; we build the pyramid ourselves, including multi-device tests
the reference could never run (reference hard-rejects >1 device,
train_pretrained.py:551-558).
"""

import os

# Must happen before jax import anywhere in the test process. Force (not
# setdefault): the session environment may pre-select the TPU platform, and
# unit tests need the deterministic fp32 CPU backend + 8 virtual devices.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The container's sitecustomize may import jax and register the TPU plugin
# before conftest runs; the config update below wins regardless.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
