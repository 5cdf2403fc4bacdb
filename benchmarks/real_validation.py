#!/usr/bin/env python
"""Validate compression claims on REAL (non-synthetic) content.

Round-1 tuned the static default tables and measured the coded_runs /
dc_prediction savings exclusively on `image_io.synthetic_image` output
(VERDICT.md weak #6). This sweep re-measures on the committed real rasters
in tests/data/ (real photograph, MRI slice, DEM grids):

  * static-table penalty: bytes(static) / bytes(dynamic) - 1
  * coded_runs saving:    1 - bytes(coded_runs) / bytes(base)
  * dc_prediction saving: 1 - bytes(dc+runs) / bytes(coded_runs)
  * PSNR at each quality

Run on CPU (host-side sweep; results are backend-independent bytes).
"""

from __future__ import annotations

import os as _os
import sys as _sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from dct_tpu.config import CodecConfig  # noqa: E402
from dct_tpu.models import codec  # noqa: E402
from dct_tpu.utils import image_io, metrics  # noqa: E402

DATA = _os.path.join(_REPO_ROOT, "tests", "data")
IMAGES = ("hopper", "mri", "dem", "topobathy")


def enc_len(img, **kw) -> int:
    return len(codec.ImageCodec(CodecConfig(**kw)).encode(img))


def main() -> int:
    print(f"{'image':10s} q  dyn_B  static%  runs%  dc%   PSNR")
    agg = {"static": [], "runs": [], "dc": []}
    for name in IMAGES:
        img = image_io.read_image(_os.path.join(DATA, name + ".pgm"))
        for q in (10, 50, 90):
            base = enc_len(img, quality=q)
            static = enc_len(img, quality=q, static_tables=True)
            runs = enc_len(img, quality=q, coded_runs=True)
            dc = enc_len(img, quality=q, coded_runs=True, dc_prediction=True)
            c = codec.ImageCodec(CodecConfig(quality=q))
            psnr = metrics.psnr(img, c.decode(c.encode(img)))
            sp = static / base - 1
            rp = 1 - runs / base
            dp = 1 - dc / runs
            agg["static"].append(sp)
            agg["runs"].append(rp)
            agg["dc"].append(dp)
            print(
                f"{name:10s} {q:2d} {base:6d}  {sp*100:5.1f}  {rp*100:5.1f}"
                f"  {dp*100:4.1f}  {float(psnr):5.2f}",
                flush=True,
            )
    for k, v in agg.items():
        print(f"{k}: mean {np.mean(v)*100:+.1f}%  worst {np.max(np.abs(v))*100:.1f}%")
    return 0


if __name__ == "__main__":
    _sys.exit(main())
