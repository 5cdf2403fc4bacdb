#!/usr/bin/env python
"""Fused-kernel encode throughput across qualities (pack-tier behavior).

The fused kernel picks a per-stripe pack tier (pair / mid / safe —
ops/fused_encode_pallas.py): pairs need every row pair's live symbols to
fit 128 lanes and its units to fit FAST_SPAN. Higher quality = more live
symbols and more bits, so stripes drop from the pair tier to mid, and
eventually to safe. This sweep records the resulting throughput curve on
the bench.py workload shape so tier regressions are visible.

Timing: optimization_barrier K-loop (CLAUDE.md harness rules).
"""

from __future__ import annotations

import os as _os
import sys as _sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import argparse
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dct_tpu.config import CodecConfig
    from dct_tpu.models import codec
    from dct_tpu.utils import image_io

    H, W = 1088, 1920
    n_stripes = H // 8
    frames = np.stack(
        [image_io.synthetic_image(H, W, "photo", seed=s)
         for s in range(args.frames)]
    )
    fd = jnp.asarray(frames)
    pixels = args.frames * H * W

    def make(cfg, k):
        @jax.jit
        def run(fr):
            def body(i, acc):
                f, _ = jax.lax.optimization_barrier((fr, acc))
                packed, _ = jax.vmap(
                    lambda im: codec.encode_step(im, cfg, n_stripes)
                )(f)
                return acc + jnp.sum(packed.bit_lengths)

            return jax.lax.fori_loop(0, k, body, jnp.int32(0))

        return run

    def timed(fn):
        float(fn(fd))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            float(fn(fd))
        return (time.perf_counter() - t0) / args.iters

    print(f"{'q':>3s} {'Mpix/s':>8s}  (k-loop delta, {pixels/1e6:.1f} Mpix)")
    for q in (10, 35, 50, 75, 90, 97):
        cfg = CodecConfig(quality=q, static_tables=True, use_pallas=True)
        k1, k2 = 3, 11
        t1 = timed(make(cfg, k1))
        t2 = timed(make(cfg, k2))
        dt = (t2 - t1) / (k2 - k1) if t2 > t1 else t1
        print(f"{q:3d} {pixels/dt/1e6:8.1f}", flush=True)
    return 0


if __name__ == "__main__":
    _sys.exit(main())
