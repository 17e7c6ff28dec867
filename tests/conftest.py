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
# XLA:CPU's AOT loader logs a spurious machine-feature-mismatch ERROR for
# every cache hit (compile-time LLVM feature strings include tuning pseudo-
# features like +prefer-no-scatter that host CPUID detection never reports);
# same-machine loads are safe, so silence the C++ log for tests only.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax  # noqa: E402

# The container's sitecustomize may import jax and register the TPU plugin
# before conftest runs; the config update below wins regardless.
jax.config.update("jax_platforms", "cpu")

# Persistent XLA executable cache (VERDICT r4 #8): the suite is compile-
# bound (~13 min of XLA work for ~30 s of actual math on a 1-core box), and
# test jaxprs are identical across runs, so cache hits turn repeat runs
# into load-and-execute. Keyed on HLO + jaxlib version + flags; repo-local
# so `git clean -x` resets it. First run populates (~no overhead), repeat
# runs measured 13 min -> ~4 min wall.
_cache_dir = os.path.join(os.path.dirname(__file__), os.pardir,
                          ".cache", "jax_test_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Tiered suite: integration tests (full train loops / recipes / multi-device
# steps, >=15 s each on a 1-core box) carry the `slow` marker so
# `pytest -m "not slow"` is a fast (<~3 min) correctness tier. Measured via
# --durations; keep this list in sync when adding heavy tests.
_SLOW_MODULES = {
    "test_train_loop",
    "test_single_run",
    "test_sepsed_run",
}
_SLOW_TESTS = {
    "test_train_step_data_parallel_8dev",
    "test_train_step_runs_and_learns",
    "test_sepsed_train_step",
    "test_sharded_step_matches_jit_collective_count",
    "test_ema_alpha_schedule_and_teacher_tracks_student",
    "test_e2e_embedder_in_train_step",
    "test_accumulate_different_micros_runs_and_learns",
    "test_2021_style_config_runs",
    "test_accumulate_grads_match_full_batch",
    "test_accumulate_sharded_8dev",
    "test_panns_conversion_runs",
    "test_crnn_train_mode_runs_with_rngs",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        base = item.name.split("[")[0]
        if mod in _SLOW_MODULES or base in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
