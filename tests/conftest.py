"""Test harness.

Default: force an 8-device virtual CPU mesh so sharding logic is exercised
without TPU hardware (SURVEY.md §4). Pallas kernels cannot run on CPU in this
environment (interpret mode never finishes compiling through the remote
compiler), so kernel tests are marked `tpu` and skipped on CPU; run them with

    CONTEXTGS_TEST_TPU=1 python -m pytest tests/ -m tpu

which keeps the default (axon) platform with the real chip.
"""

import os

ON_TPU = os.environ.get("CONTEXTGS_TEST_TPU") == "1"
if not ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
# every XLA compile goes through a slow remote compiler in this environment —
# cache compiled executables on disk so reruns are fast
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_cc")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.3")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: requires the real TPU chip (CONTEXTGS_TEST_TPU=1)")


def pytest_collection_modifyitems(config, items):
    skip = pytest.mark.skip(reason="needs real TPU: CONTEXTGS_TEST_TPU=1 pytest -m tpu")
    for item in items:
        if "tpu" in item.keywords and not ON_TPU:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
