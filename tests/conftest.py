"""Test configuration: run JAX on CPU with 8 virtual devices so sharding
tests (parallel/) exercise a real 8-way mesh without TPU hardware, per
SURVEY.md section 4 (multi-host testing strategy).

Note: the axon TPU harness pins JAX_PLATFORMS=axon through sitecustomize, so
the env var alone is not enough — jax.config.update after import is the
authoritative override (it must happen before any backend initialization,
hence here in conftest before any dct_tpu import).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.default_backend() == "cpu", (
        "tests must run on the CPU backend (8 virtual devices); got "
        f"{jax.default_backend()}"
    )


@pytest.fixture(scope="session")
def golden_block() -> np.ndarray:
    """The classic JPEG textbook 8x8 block, the reference's shared fixture
    (duplicated at test_dct.c:33-42 and test_entropy.c:290-299)."""
    return np.array(
        [
            [52, 55, 61, 66, 70, 61, 64, 73],
            [63, 59, 55, 90, 109, 85, 69, 72],
            [62, 59, 68, 113, 144, 104, 66, 73],
            [63, 58, 71, 122, 154, 106, 70, 69],
            [67, 61, 68, 104, 126, 88, 68, 70],
            [79, 65, 60, 70, 77, 68, 58, 75],
            [85, 71, 64, 59, 55, 61, 65, 83],
            [87, 79, 69, 68, 65, 76, 78, 94],
        ],
        dtype=np.uint8,
    )


@pytest.fixture(scope="session")
def oracle():
    from dct_tpu import oracle as _oracle

    if not _oracle.available():
        pytest.skip("C oracle unavailable (no compiler or reference mount)")
    return _oracle
