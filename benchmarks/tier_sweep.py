#!/usr/bin/env python
"""Fused-kernel encode throughput across qualities (pack-tier behavior).

The fused kernel picks a per-stripe pack tier from the merge-tree ladder
(quad / pair / pair-wide / mid / mid-wide / safe —
ops/fused_encode_pallas.py): level-k groups need 2^k rows' live symbols
to fit 128 lanes and their units to fit the tier span. Higher quality =
more live symbols and more bits, so stripes descend the ladder. This
sweep records the throughput curve on the bench.py workload shape AND
the MEASURED per-stripe tier distribution (the kernel's tier_ref output
on frame 0 — round 3's host-side re-prediction of the conditions is
gone; the kernel now just says which rung each stripe took), so a tier
regression shows up as both a number and a ladder shift.

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
    ap.add_argument("--no-tiers", action="store_true",
                    help="skip the tier-distribution report")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dct_tpu.config import CodecConfig
    from dct_tpu.models import codec
    from dct_tpu.ops import blocks as blk
    from dct_tpu.ops import fused_encode_pallas as fe
    from dct_tpu.ops import huffman as hf
    from dct_tpu.utils import image_io

    H, W = 1088, 1920
    n_stripes = H // 8
    frames = np.stack(
        [image_io.synthetic_image(H, W, "photo", seed=s)
         for s in range(args.frames)]
    )
    fd = jnp.asarray(frames)
    pixels = args.frames * H * W
    tier_names = {v: k for k, v in fe._TIER_INDEX.items()}

    def make(cfg, k):
        @jax.jit
        def run(fr):
            def body(i, acc):
                f, _ = jax.lax.optimization_barrier((fr, acc))
                packed = jax.vmap(
                    lambda im: codec.encode_step(im, cfg, n_stripes)
                )(f)[0]
                return acc + jnp.sum(packed.bit_lengths)

            return jax.lax.fori_loop(0, k, body, jnp.int32(0))

        return run

    def measured_tiers(cfg) -> dict[str, int]:
        lengths, codes = codec._table_arrays(
            hf.default_category_table(cfg.quality))

        @jax.jit
        def run(im):
            px = blk.image_to_blocks(im, 8)
            _, tiers = fe.encode_stripes_fused(
                px, cfg, n_stripes, lengths, codes, return_tiers=True)
            return tiers

        t = np.asarray(run(fd[0]))
        counts = np.bincount(t, minlength=len(tier_names))
        return {tier_names[i]: int(c) for i, c in enumerate(counts) if c}

    def timed(fn):
        float(fn(fd))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            float(fn(fd))
        return (time.perf_counter() - t0) / args.iters

    print(f"{'q':>3s} {'Mpix/s':>8s}  tier distribution "
          f"(k-loop delta, {pixels/1e6:.1f} Mpix; tiers on frame 0)")
    for q in (10, 35, 50, 75, 90, 97):
        cfg = CodecConfig(quality=q, static_tables=True, use_pallas=True)
        k1, k2 = 3, 11
        t1 = timed(make(cfg, k1))
        t2 = timed(make(cfg, k2))
        dt = (t2 - t1) / (k2 - k1) if t2 > t1 else t1
        dist = ""
        if not args.no_tiers:
            d = measured_tiers(cfg)
            dist = " ".join(f"{k}:{v}" for k, v in d.items())
        print(f"{q:3d} {pixels/dt/1e6:8.1f}  {dist}", flush=True)
    return 0


if __name__ == "__main__":
    _sys.exit(main())
