#!/usr/bin/env python
"""A/B the pack-tier ladder rungs on REAL hardware at a given quality.

Round 3 added merge-tree tiers (oct/quad, narrow variants); the ladder
order encodes their *predicted* cost (serial pack iterations per stripe:
oct-narrow R/8 ... pair R ... safe). This harness forces each rung via
the `_LADDER_START` trace-time hook on the bench.py workload (synthetic
photo, 8x1080p) and times the fused kernel with the K-loop delta method,
so the ladder order can be validated (or re-ordered) from measured
numbers instead of iteration counts.

Context: round-2's kernel (pair rung only) measured ~1000 Mpix/s on
2026-08-17; round-3's default (oct-narrow at q50) measured ~663 on
2026-08-18 while the UNCHANGED transform kernel also dropped 186 -> ~150
Gpix/s, so chip/tunnel day-to-day variance is confounded with the tier
change — this harness separates them by comparing rungs within ONE run.

Measurement rules (ADVICE r3):
  * K-loop delta uses TWO large trip counts (default 3 and 9 — the body
    is ~24 ms of chip time, so both sit far above the ~2 ms dispatch
    jitter); timings are best-of-N, not means.
  * A tk <= t1 fallback prints a jitter warning and marks the row.
  * The rung-invariance checksum covers ALL units (int32 wraparound sum,
    deterministic) + bit_lengths, computed in a separate UNTIMED dispatch
    so the timed loop keeps bench.py's cheap bit_lengths reduction.
  * Forcing a rung only drops EARLIER rungs: stripes whose forced rung's
    eligibility fails fall through to later (slower) rungs. Each row
    therefore reports the per-rung stripe distribution actually taken
    (the kernel's tier_ref output), so mixture rows are visible.
  * --solo additionally truncates the ladder's tail (_LADDER_STOP) to
    [rung, safe], separating a rung's own cost from the cost of carrying
    the other rungs' compiled bodies (VMEM/register pressure).
"""

from __future__ import annotations

import os as _os
import sys as _sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import argparse
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--k1", type=int, default=3)
    ap.add_argument("--k2", type=int, default=9)
    ap.add_argument("--quality", type=int, default=50)
    ap.add_argument("--solo", action="store_true",
                    help="compile each forced rung with only [rung, safe]")
    ap.add_argument(
        "--rungs", default="default,oct_narrow,oct,quad_narrow,pair_narrow,pair",
        help="comma-separated _TIER_INDEX names to force (in ladder order); "
             "'default' = the shipped ladder untouched",
    )
    args = ap.parse_args()

    import numpy as np
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
    names = {v: k for k, v in fe._TIER_INDEX.items()}

    def encode_one(im):
        px = blk.image_to_blocks(im, 8)
        return fe.encode_stripes_fused(px, cfg, n_stripes, lengths, codes)

    def make(k):
        # bench.py headline harness: XOR perturbation + bit_lengths sum
        # (cheap reduction; the wide checksum runs untimed below)
        @jax.jit
        def run(fr):
            def body(i, acc):
                f = fr ^ (i & 255).astype(jnp.uint8)
                p = jax.vmap(encode_one)(f)
                return acc + jnp.sum(p.bit_lengths)

            return jax.lax.fori_loop(0, k, body, jnp.int32(0))

        return run

    def make_checksum():
        # fresh jit per rung: the _LADDER_START/_STOP globals are read at
        # TRACE time, so a cached trace would silently reuse the first
        # rung's kernel for every row
        @jax.jit
        def checksum_and_tiers(fr):
            def one(im):
                px = blk.image_to_blocks(im, 8)
                p, tiers = fe.encode_stripes_fused(
                    px, cfg, n_stripes, lengths, codes, return_tiers=True)
                # int32 wraparound sum over ALL units: deterministic,
                # covers byte divergence anywhere in the payload
                c = jnp.sum(p.units.astype(jnp.int32)) + jnp.sum(
                    p.bit_lengths)
                return c, tiers

            cs, tiers = jax.vmap(one)(fr)
            return jnp.sum(cs), tiers.reshape(-1)

        return checksum_and_tiers

    def timed(fn):
        float(fn(fd))  # compile + warmup
        best = float("inf")
        for _ in range(args.iters):
            t0 = time.perf_counter()
            float(fn(fd))
            best = min(best, time.perf_counter() - t0)
        return best

    print(f"backend={jax.default_backend()} q={args.quality} "
          f"{args.frames}x{H}x{W} k=({args.k1},{args.k2}) "
          f"solo={args.solo}", flush=True)
    ref = None  # checksum must be rung-invariant (byte-identity proxy)
    try:
        for name in args.rungs.split(","):
            name = name.strip()
            if name == "default":
                fe._LADDER_START, fe._LADDER_STOP = 0, None
            else:
                start = fe._TIER_INDEX[name]
                fe._LADDER_START = start
                fe._LADDER_STOP = start + 1 if args.solo else None
            chk, tiers = jax.device_get(make_checksum()(fd))
            chk = int(chk)
            if ref is None:
                ref = chk
            counts = np.bincount(tiers, minlength=len(names))
            dist = " ".join(
                f"{names[i]}:{c}" for i, c in enumerate(counts) if c
            )
            t1 = timed(make(args.k1))
            tk = timed(make(args.k2))
            if tk > t1:
                dt = (tk - t1) / (args.k2 - args.k1)
                warn = ""
            else:
                dt = t1 / args.k1
                warn = "  JITTER (tk<=t1: incl. dispatch overhead)"
                print("warning: K-loop delta <= 0 (dispatch jitter) for "
                      f"{name}", file=_sys.stderr, flush=True)
            tag = "" if chk == ref else "  CHECKSUM MISMATCH"
            print(f"{name:12s} {dt*1e3:7.3f} ms  "
                  f"{pixels/dt/1e9:6.3f} Gpix/s{tag}{warn}  [{dist}]",
                  flush=True)
    finally:
        fe._LADDER_START, fe._LADDER_STOP = 0, None
    return 0


if __name__ == "__main__":
    _sys.exit(main())
