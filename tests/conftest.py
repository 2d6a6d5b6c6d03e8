"""Test harness.

Default: force an 8-device virtual CPU mesh so sharding logic is exercised
without TPU hardware (SURVEY.md §4). NOTE: this environment's sitecustomize
imports jax before any test code runs, so JAX_PLATFORMS env vars are already
baked — the runtime `jax.config.update` API is the only thing that works.

Pallas kernels cannot run on CPU here (interpret mode never finishes
compiling through the remote compiler), so kernel tests are marked `tpu` and
skipped on CPU; run them with

    CONTEXTGS_TEST_TPU=1 python -m pytest tests/ -m tpu

which keeps the default (axon) platform with the real chip.
"""

import os

# compile cache: every XLA compile goes through a slow remote compiler here
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_cc")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.3")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

ON_TPU = os.environ.get("CONTEXTGS_TEST_TPU") == "1"
if not ON_TPU:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: requires the real TPU chip (CONTEXTGS_TEST_TPU=1)")
    config.addinivalue_line(
        "markers", "slow: multi-minute end-to-end tests")


def pytest_collection_modifyitems(config, items):
    skip = pytest.mark.skip(reason="needs real TPU: CONTEXTGS_TEST_TPU=1 pytest -m tpu")
    for item in items:
        if "tpu" in item.keywords and not ON_TPU:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
