"""Test configuration: run JAX on CPU with 8 virtual devices so sharding
tests (parallel/) exercise a real 8-way mesh without TPU hardware, per
SURVEY.md section 4 (multi-host testing strategy)."""

import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


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


def oracle_or_skip():
    from dct_tpu import oracle

    if not oracle.available():
        pytest.skip("C oracle unavailable (no compiler or reference mount)")
    return oracle


@pytest.fixture(scope="session")
def oracle():
    return oracle_or_skip()
