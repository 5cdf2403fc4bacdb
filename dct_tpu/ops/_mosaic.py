"""Shared interpret-mode gate for the Pallas kernels.

Every kernel module runs in Mosaic on the TPU backend and in interpret
mode elsewhere (the CPU test suite). DCT_TPU_FORCE_MOSAIC=1 forces the
Mosaic path regardless of backend — benchmarks/mosaic_lowering_check.py
sets it so `jax.export(platforms=["tpu"])` exercises the real
jaxpr -> Mosaic-MLIR generation on a CPU-only host (running such an
export is of course still impossible without a chip).
"""

from __future__ import annotations

import os

import jax


def interpret() -> bool:
    if os.environ.get("DCT_TPU_FORCE_MOSAIC"):
        return False
    return jax.default_backend() != "tpu"
