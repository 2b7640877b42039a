"""Test harness config: run JAX on CPU with 8 virtual devices.

Multi-chip sharding paths are exercised without a TPU cluster via the
standard JAX trick (xla_force_host_platform_device_count); the driver
separately dry-run-compiles the multi-chip path via __graft_entry__.py.
Env vars must be set before jax is imported anywhere.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# The axon TPU plugin in this image ignores JAX_PLATFORMS; the legacy var works.
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TESTDATA = os.path.join(REPO_ROOT, "testdata")


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture
def testdata_dir():
    return TESTDATA
