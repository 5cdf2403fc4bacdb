#!/usr/bin/env python
"""Fused-encode kernel budget split: full kernel vs pack-loop-skipped.

Times encode_stripes_fused on the bench.py workload shape (q50 synthetic
photo content) against a variant whose pack loop is disabled (phases 1-4 +
digits + compaction only, via the _SKIP_PACK test hook). The delta is the
pack loop's share of the kernel.
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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dct_tpu.config import CodecConfig
    from dct_tpu.models import codec
    from dct_tpu.ops import fused_encode_pallas as fe
    from dct_tpu.utils import image_io

    H, W = 1088, 1920
    cfg = CodecConfig(quality=50, static_tables=True, use_pallas=True)
    n_stripes = H // 8
    frames = np.stack(
        [image_io.synthetic_image(H, W, "photo", seed=s)
         for s in range(args.frames)]
    )
    fd = jnp.asarray(frames)
    pixels = args.frames * H * W

    from dct_tpu.ops import huffman as hf
    lengths, codes = codec._table_arrays(hf.default_category_table())

    def make(k, skip):
        @jax.jit
        def run(fr):
            def body(i, acc):
                f = fr ^ (i & 255).astype(jnp.uint8)
                def one(im):
                    fe._SKIP_PACK = skip  # static python flag at trace time
                    from dct_tpu.ops import blocks as blk
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

    K = args.k
    for name, skip in (("full", False), ("nopack", True)):
        fe._SKIP_PACK = skip
        t1 = timed(make(1, skip))
        tk = timed(make(K, skip))
        dt = (tk - t1) / (K - 1) if tk > t1 else t1
        print(f"{name:7s} {dt*1e3:7.3f} ms  {pixels/dt/1e9:6.3f} Gpix/s",
              flush=True)
    return 0


if __name__ == "__main__":
    _sys.exit(main())
