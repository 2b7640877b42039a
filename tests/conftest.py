"""Test harness config: run JAX on CPU with 8 virtual devices.

Multi-chip sharding paths are exercised without a TPU cluster via the
standard JAX trick (xla_force_host_platform_device_count); the driver
separately dry-run-compiles the multi-chip path via __graft_entry__.py.
Env vars must be set before jax is imported anywhere.
"""

import os
import sys

# Force-override: the shell profile exports JAX_PLATFORMS=axon (remote TPU
# tunnel); tests must run on the virtual-device CPU mesh.  Both vars are
# needed -- the axon plugin ignores one or the other in some code paths.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
# Clear the pool address for the WHOLE suite, including every subprocess a
# test spawns: a non-empty PALLAS_AXON_POOL_IPS makes sitecustomize dial the
# relay at INTERPRETER STARTUP (before any script/env code runs), which
# blocks for the subprocess's full timeout while the backend is wedged --
# this timed out all four examples/ subprocess tests in round 5.  Tests that
# need a real-TPU child (test_tpu_hardware) go through tools/tpu_engine_check,
# which restores a non-empty address for its axon children itself.
os.environ["PALLAS_AXON_POOL_IPS"] = ""

# Persistent XLA compile cache: interpret-mode Pallas graphs take 20-50 s to
# compile per geometry on CPU and dominate suite wall time; with the cache a
# re-run pays only trace time (~3x faster suite).  Repo-local and gitignored.
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

if "jax" in sys.modules:
    # something (e.g. a pytest plugin) imported jax before us and froze its
    # config from the old environment; update it directly
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_platform_name", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TESTDATA = os.path.join(REPO_ROOT, "testdata")


_SUITE_LOCK = "/tmp/suite.lock"
_suite_lock_claimed = False


def pytest_configure(config):
    # Claim /tmp/suite.lock for the suite's duration so the TPU capture
    # watcher (tools/tpu_capture.py --watch) never starts a benchmark while
    # tests hold the single CPU core.  O_EXCL: if another process already
    # holds it, just proceed without ownership (we must not delete theirs).
    global _suite_lock_claimed
    try:
        fd = os.open(_SUITE_LOCK, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        os.close(fd)
        _suite_lock_claimed = True
    except (FileExistsError, OSError):
        pass


def pytest_unconfigure(config):
    global _suite_lock_claimed
    if _suite_lock_claimed:
        _suite_lock_claimed = False
        try:
            os.remove(_SUITE_LOCK)
        except OSError:
            pass


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture
def testdata_dir():
    return TESTDATA
