"""Test configuration: force the JAX CPU backend with 8 virtual devices so
multi-chip sharding tests run anywhere (SURVEY.md §4)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Tests run on the CPU backend with 8 virtual devices unless explicitly
# overridden.  NOTE: the JAX_PLATFORMS env var is IGNORED in this environment
# (a TPU platform plugin overrides it); only jax.config.update works, and it
# must happen before the backend initializes.
if os.environ.get("SV3D_TEST_ON_TPU", "0") != "1":
    import jax

    jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: this box has a single CPU core and large-model
# compiles run 60-90 s; caching makes reruns near-instant
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path("/root/reference")
FIXTURE = REFERENCE / "data" / "raw" / "overfit" / "00000"
PROCESSED = REFERENCE / "data" / "processed" / "overfit" / "00000"


@pytest.fixture(scope="session")
def fixture_dir() -> Path:
    if not FIXTURE.exists():
        pytest.skip("reference fixture not available")
    return FIXTURE


@pytest.fixture(scope="session")
def processed_dir() -> Path:
    if not PROCESSED.exists():
        pytest.skip("reference processed fixture not available")
    return PROCESSED


@pytest.fixture(scope="session")
def rng() -> np.random.Generator:
    return np.random.default_rng(0)
