#!/usr/bin/env python
"""PSNR / compression sweep across quality 1-100 vs the C reference oracle.

Produces the north-star comparison (BASELINE.md): default-path PSNR must be
>= the reference at every quant table (trivially true given reference bug
B1 — the buggy reference decode is also shown via compat_b1).

Usage: python benchmarks/quality_sweep.py [--size 512x512]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:  # allow `python benchmarks/<x>.py` from anywhere
    _sys.path.insert(0, _REPO_ROOT)

import argparse
import sys

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="512x512")
    ap.add_argument("--qualities", default="1,5,10,25,50,75,90,95,100")
    args = ap.parse_args()

    from dct_tpu.config import CodecConfig
    from dct_tpu.models import codec
    from dct_tpu.utils import image_io, metrics
    from dct_tpu import oracle

    w, h = (int(x) for x in args.size.split("x"))
    img = image_io.synthetic_image(h, w, "photo", seed=0)
    have_oracle = oracle.available()

    print(f"{'q':>4} {'bytes':>8} {'ratio':>7} {'coded-runs':>10} {'+dc-pred':>9} "
          f"{'PSNR':>7} {'PSNR(B1)':>9} {'C-ref blk PSNR':>15}")
    for q in (int(x) for x in args.qualities.split(",")):
        data = codec.encode(img, CodecConfig(quality=q))
        cr_bytes = len(codec.encode(img, CodecConfig(quality=q, coded_runs=True)))
        best_bytes = len(codec.encode(
            img, CodecConfig(quality=q, coded_runs=True, dc_prediction=True)
        ))
        rec = codec.decode(data)
        psnr = metrics.psnr(rec, img)

        rec_b1 = codec.decode(codec.encode(img, CodecConfig(quality=q, compat_b1=True)))
        psnr_b1 = metrics.psnr(rec_b1, img)

        cref = float("nan")
        if have_oracle:
            # reference behavior on the image's blocks (buggy non-adaptive
            # decode, block-averaged)
            from dct_tpu.ops import blocks as blk
            import jax.numpy as jnp

            px = np.asarray(blk.image_to_blocks(jnp.asarray(img), 8)).reshape(-1, 8, 8)
            sel = px[:: max(1, len(px) // 64)]
            errs = []
            for b in sel.astype(np.uint8):
                _, recon, _, _ = oracle.block_pipeline(b, q)
                errs.append(np.mean((recon.astype(float) - b.astype(float)) ** 2))
            mse = float(np.mean(errs))
            cref = 10 * np.log10(255**2 / mse) if mse > 0 else float("inf")

        print(f"{q:>4} {len(data):>8} {img.size/len(data):>7.2f} "
              f"{cr_bytes:>10} {best_bytes:>9} {psnr:>7.2f} {psnr_b1:>9.2f} "
              f"{cref:>15.2f}")
        assert psnr >= psnr_b1 - 1e-9, "default path must beat bug-B1 path"
    return 0


if __name__ == "__main__":
    sys.exit(main())
