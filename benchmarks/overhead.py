#!/usr/bin/env python
"""Dispatch-floor probe: times a trivial jitted reduction over the bench
workload's input buffer to measure the fixed per-iteration cost (host ->
axon tunnel -> device dispatch -> scalar fetch). Stage timings within that
floor of each other are dispatch-bound, not compute-bound.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:  # allow `python benchmarks/<x>.py` from anywhere
    _sys.path.insert(0, _REPO_ROOT)

import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    F, H, W = 8, 1088, 1920
    rng = np.random.default_rng(0)
    fd = jnp.asarray(rng.integers(0, 256, (F, H, W)).astype(np.uint8))

    @jax.jit
    def probe(fr):
        return jnp.sum(fr.astype(jnp.int32))

    float(probe(fd))
    for iters in (5, 20):
        t0 = time.perf_counter()
        for _ in range(iters):
            float(probe(fd))
        dt = (time.perf_counter() - t0) / iters
        print(f"backend={jax.default_backend()} iters={iters}: "
              f"{dt*1e3:.2f} ms/iter dispatch+reduce floor", flush=True)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
