#!/usr/bin/env python
"""Fused-kernel encode throughput across qualities (pack-tier behavior).

The fused kernel picks a per-stripe pack tier from the round-3 merge-tree
ladder (oct / quad / pair / pair-wide / mid / mid-wide / safe —
ops/fused_encode_pallas.py): level-k groups need 2^k rows' live symbols
to fit 128 lanes and their units to fit the tier span. Higher quality =
more live symbols and more bits, so stripes descend the ladder. This
sweep records the throughput curve on the bench.py workload shape AND a
host-side prediction of the per-stripe tier distribution (replicating
the kernel's tier conditions from staged intermediates — frame 0 only),
so a tier regression shows up as both a number and a ladder shift.

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


def predict_tiers(frame: np.ndarray, cfg, n_stripes: int) -> dict[str, int]:
    """Replicate the fused kernel's per-stripe tier ladder on the host.

    Mirrors ops/fused_encode_pallas.py's tier_ok conditions (8x8 category
    static-table path, no coded runs) from staged intermediates: per-row
    live-symbol counts and unit extents. Diagnostic only — byte identity
    does not depend on this; a drift here mislabels the distribution, not
    the stream.
    """
    import jax.numpy as jnp

    from dct_tpu.models import codec as _codec
    from dct_tpu.ops import blocks as blk
    from dct_tpu.ops import huffman as hf
    from dct_tpu.ops import rle, transform
    from dct_tpu.ops.fused_encode_pallas import FAST_SPAN, ROW_SPAN, WIDE_SPAN

    zz = transform.encode_blocks(
        blk.image_to_blocks(jnp.asarray(frame), 8), cfg
    )
    sym = rle.rle_encode_positional(zz)
    vals = np.asarray(sym.values)
    is_sym = np.asarray(sym.is_sym)
    lengths = np.asarray(hf.default_category_table(cfg.quality).lengths)
    cat = np.asarray(hf.category_of(jnp.asarray(vals)))
    t3 = np.where(is_sym, lengths[cat] + cat + 8, 0)

    nb = vals.shape[0]
    bps = nb // n_stripes
    rows_live = -(-bps // 2)  # 2 blocks per 128-lane row at N=8
    R = -(-rows_live // 8) * 8
    blk_bits = t3.sum(-1).reshape(n_stripes, bps)
    blk_live = is_sym.sum(-1).reshape(n_stripes, bps)
    pad = 2 * R - bps
    blk_bits = np.pad(blk_bits, ((0, 0), (0, pad)))
    blk_live = np.pad(blk_live, ((0, 0), (0, pad)))
    # last-symbol bits per block: lane n2-1 always carries a symbol in a
    # live block (the RLE terminal), so t3[..., 63] is its length (0 for
    # pad blocks)
    blk_last = np.pad(
        t3[:, 63].reshape(n_stripes, bps), ((0, 0), (0, pad))
    ).reshape(n_stripes, R, 2)
    rowbits = blk_bits.reshape(n_stripes, R, 2).sum(-1)
    rowlive = blk_live.reshape(n_stripes, R, 2).sum(-1)
    rp = np.cumsum(rowbits, axis=1)
    rp_ex = rp - rowbits
    # max kmat over a row's lanes: the kernel takes max(off >> 4) over all
    # 128 lanes, where off = rp_ex + pi - t3. On a fully-live row the max
    # is the LAST SYMBOL's offset = (rp - its t3) >> 4 (an earlier version
    # used rp >> 4, one unit high on ~75% of rows). But DEAD lanes (a pad
    # block in the row, or a dead row) sit at off = rp_ex + pi - 0 = rp
    # and dominate, so rows whose second block is padding keep rp >> 4.
    row_last = np.where(
        (blk_last[:, :, 1] == 0) & (blk_last[:, :, 0] > 0),
        0, blk_last[:, :, 1],
    )
    last_k = (rp - row_last) >> 4
    base = ((rp_ex >> 4) >> 7) << 7

    first = rp_ex >> 4

    def group_ok(k: int, span: int, org: np.ndarray) -> np.ndarray:
        g = 1 << k
        gl = rowlive.reshape(n_stripes, R // g, g).sum(-1)
        gk = last_k.reshape(n_stripes, R // g, g).max(-1)
        go = org[:, ::g]
        return ((gl <= 128).all(1)) & ((gk + 4 - go <= span).all(1))

    span_row = (last_k + 4 - base).max(1)
    narrow_row = (last_k + 4 - first).max(1)
    assert (span_row <= ROW_SPAN).all()  # safe tier covers worst case
    # assign from the BOTTOM of the ladder up, so cheaper tiers overwrite
    tiers = np.full(n_stripes, "safe", dtype=object)
    tiers[span_row <= WIDE_SPAN] = "mid-wide"
    tiers[span_row <= FAST_SPAN] = "mid"
    tiers[group_ok(1, WIDE_SPAN, base)] = "pair-wide"
    tiers[narrow_row <= 128] = "mid-narrow"
    tiers[group_ok(1, FAST_SPAN, base)] = "pair"
    tiers[group_ok(1, 128, first)] = "pair-narrow"
    tiers[group_ok(2, FAST_SPAN, base)] = "quad"
    tiers[group_ok(2, 128, first)] = "quad-narrow"
    tiers[group_ok(3, FAST_SPAN, base)] = "oct"
    tiers[group_ok(3, 128, first)] = "oct-narrow"
    names = (
        "oct-narrow", "oct", "quad-narrow", "quad", "pair-narrow", "pair",
        "mid-narrow", "pair-wide", "mid", "mid-wide", "safe",
    )
    return {n: int((tiers == n).sum()) for n in names if (tiers == n).any()}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--no-tiers", action="store_true",
                    help="skip the host-side tier-distribution prediction")
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
            d = predict_tiers(frames[0], cfg, n_stripes)
            dist = " ".join(f"{k}:{v}" for k, v in d.items())
        print(f"{q:3d} {pixels/dt/1e6:8.1f}  {dist}", flush=True)
    return 0


if __name__ == "__main__":
    _sys.exit(main())
