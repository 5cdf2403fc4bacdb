#!/usr/bin/env python
"""TPU validation of the rate-control exactness contracts (round 3).

The probes are proven byte-/integer-exact on the CPU backend
(tests/test_rate_control.py + the soak); this re-asserts them on the real
chip with use_pallas=True, where the probe's transform runs the Mosaic
kernels — exercising the fused-vs-staged byte-identity contract through a
NEW consumer. Prints one JSON line; exit 0 iff every check holds.

Run by benchmarks/run_tpu_queue.sh on tunnel recovery.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import json

import numpy as np


def main() -> int:
    import jax

    from dct_tpu.config import CodecConfig
    from dct_tpu.models import codec, rate_control
    from dct_tpu.utils import image_io

    on_tpu = jax.default_backend() == "tpu"
    img = image_io.synthetic_image(397, 641, "photo", seed=7)
    results = []
    ok = True
    for cfg in (
        CodecConfig(quality=50, static_tables=True, use_pallas=on_tpu),
        CodecConfig(quality=60, adaptive=True, dc_prediction=True,
                    use_pallas=on_tpu),
        CodecConfig(quality=72, coded_runs=True, use_pallas=on_tpu),
    ):
        data = codec.encode(img, cfg)
        rec = codec.decode(data)
        size_ok = rate_control.container_size(img, cfg) == len(data)
        sse = int(((rec.astype(np.int64) - img.astype(np.int64)) ** 2).sum())
        sse_ok = rate_control.roundtrip_sse(img, cfg) == sse
        ok &= size_ok and sse_ok
        results.append({
            "quality": cfg.quality, "adaptive": cfg.adaptive,
            "coded_runs": cfg.coded_runs, "size_exact": size_ok,
            "sse_exact": sse_ok,
        })
    print(json.dumps({
        "backend": jax.default_backend(), "pallas": on_tpu,
        "all_exact": ok, "checks": results,
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
