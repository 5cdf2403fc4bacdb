#!/usr/bin/env python
"""Container v2 decode-index size cost: v1 vs v2 bytes across quality.

VERDICT r4 item 8: the config docstring's "~3-5% of a q50 payload" was
never measured. This sweep encodes the real-image set (tests/data/*.pgm)
plus a synthetic photo at q in {10, 50, 90, 97} with decode_index off
and on and prints the per-image and aggregate overhead — the evidence
for the auto-enable threshold (VERDICT r4 item 3).

The index is bit-packed at the narrowest per-plane width (container.py
flags2 bit1), so the cost is data-dependent: roughly
width(max block bits)/8 bytes per block relative to the payload each
quality produces. The round-5 u16 measurements (48%/21%/6.5%/3.3% at
q10/50/90/97) are recorded in BASELINE.md; this script now reports the
packed format.

CPU-only (container bytes are backend-invariant — a tested invariant).
Usage: python benchmarks/index_cost.py
"""

from __future__ import annotations

import os as _os
import sys as _sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import glob

import numpy as np


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")

    from dct_tpu.config import CodecConfig
    from dct_tpu.models import codec
    from dct_tpu.utils import image_io

    images = {
        _os.path.basename(p): image_io.read_image(p)
        for p in sorted(glob.glob(_os.path.join(_REPO_ROOT, "tests/data/*.pgm")))
    }
    images["synthetic_1080p"] = image_io.synthetic_image(
        1088, 1920, "photo", seed=0
    )

    print(f"{'image':>18} {'q':>3} {'v1 B':>9} {'v2 B':>9} {'overhead':>8}")
    agg = {}
    for q in (10, 50, 90, 97):
        tot1 = tot2 = 0
        for name, im in images.items():
            c1 = CodecConfig(quality=q, static_tables=True)
            c2 = c1.replace(decode_index=True)
            b1 = len(codec.ImageCodec(c1).encode(np.asarray(im)))
            b2 = len(codec.ImageCodec(c2).encode(np.asarray(im)))
            tot1 += b1
            tot2 += b2
            print(
                f"{name:>18} {q:>3} {b1:>9} {b2:>9} "
                f"{(b2 - b1) / b1 * 100:7.2f}%"
            )
        agg[q] = (tot1, tot2)
        print(
            f"{'TOTAL':>18} {q:>3} {tot1:>9} {tot2:>9} "
            f"{(tot2 - tot1) / tot1 * 100:7.2f}%"
        )
    print()
    for q, (a, b) in agg.items():
        print(f"q{q}: index overhead {(b - a) / a * 100:.2f}%")
    return 0


if __name__ == "__main__":
    _sys.exit(main())
