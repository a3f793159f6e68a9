"""Test configuration.

Forces JAX onto a virtual 8-device CPU mesh so sharding/collective tests
run without TPU hardware.

This environment imports jax in *every* process via a sitecustomize hook
(with ``JAX_PLATFORMS=axon`` pointing at a real TPU tunnel), so env vars
set here are too late — instead we retarget via ``jax.config`` before any
backend is initialized (clients are created lazily on first use).
"""

import os

# Persistent compilation cache: this box has a single CPU core, so cold XLA
# compiles dominate test time; cache them across runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax

# RGQA_TEST_TPU=1 leaves the real TPU backend in place (for the few tests
# that need hardware-only features, e.g. the in-kernel dropout PRNG).
if not os.environ.get("RGQA_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

import pathlib

import pytest

REFERENCE_DIR = pathlib.Path("/root/reference")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running end-to-end test (minutes)"
    )


@pytest.fixture(scope="session")
def reference_dir():
    """Path to the read-only reference checkout; skip if unavailable."""
    if not REFERENCE_DIR.exists():
        pytest.skip("reference checkout not available")
    return REFERENCE_DIR
