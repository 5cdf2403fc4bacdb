#!/usr/bin/env python
"""A/B the pack-tier ladder rungs on REAL hardware at q50.

Round 3 added merge-tree tiers (oct/quad, narrow variants); the ladder
order encodes their *predicted* cost (serial pack iterations per stripe:
oct-narrow R/8 ... pair R ... safe). This harness forces each rung via
the `_LADDER_START` trace-time hook on the bench.py workload (q50
synthetic photo, 8x1080p) and times the fused kernel with the K-loop
delta method, so the ladder order can be validated (or re-ordered) from
measured numbers instead of iteration counts.

Context: round-2's kernel (pair rung only) measured ~1000 Mpix/s on
2026-08-17; round-3's default (oct-narrow at q50) measured ~663 on
2026-08-18 while the UNCHANGED transform kernel also dropped 186 -> ~150
Gpix/s, so chip/tunnel day-to-day variance is confounded with the tier
change — this harness separates them by comparing rungs within ONE run.
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
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--k", type=int, default=17)
    ap.add_argument("--quality", type=int, default=50)
    ap.add_argument(
        "--rungs", default="oct_narrow,oct,quad_narrow,pair_narrow,pair",
        help="comma-separated _TIER_INDEX names to force (in ladder order)",
    )
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
    cfg = CodecConfig(quality=args.quality, static_tables=True,
                      use_pallas=True)
    n_stripes = H // 8
    frames = np.stack(
        [image_io.synthetic_image(H, W, "photo", seed=s)
         for s in range(args.frames)]
    )
    fd = jnp.asarray(frames)
    pixels = args.frames * H * W
    lengths, codes = codec._table_arrays(
        hf.default_category_table(args.quality))

    def make(k, start):
        @jax.jit
        def run(fr):
            def body(i, acc):
                f = fr ^ (i & 255).astype(jnp.uint8)

                def one(im):
                    fe._LADDER_START = start  # static flag at trace time
                    px = blk.image_to_blocks(im, 8)
                    p = fe.encode_stripes_fused(
                        px, cfg, n_stripes, lengths, codes)
                    return jnp.sum(p.bit_lengths) + jnp.sum(
                        p.units[:, :4].astype(jnp.int32))

                return acc + jnp.sum(jax.vmap(one)(f))

            return jax.lax.fori_loop(0, k, body, jnp.int32(0))

        return run

    def timed(fn):
        float(fn(fd))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            float(fn(fd))
        return (time.perf_counter() - t0) / args.iters

    print(f"backend={jax.default_backend()} q={args.quality} "
          f"{args.frames}x{H}x{W}", flush=True)
    ref = None  # checksum must be rung-invariant (byte-identity proxy)
    try:
        for name in args.rungs.split(","):
            start = fe._TIER_INDEX[name.strip()]
            fe._LADDER_START = start
            chk = int(make(1, start)(fd))
            if ref is None:
                ref = chk
            t1 = timed(make(1, start))
            tk = timed(make(args.k, start))
            dt = (tk - t1) / (args.k - 1) if tk > t1 else t1
            tag = "" if chk == ref else "  CHECKSUM MISMATCH"
            print(f"{name.strip():12s} {dt*1e3:7.3f} ms  "
                  f"{pixels/dt/1e9:6.3f} Gpix/s{tag}", flush=True)
    finally:
        fe._LADDER_START = 0
    return 0


if __name__ == "__main__":
    _sys.exit(main())
