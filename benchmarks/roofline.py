#!/usr/bin/env python
"""DCT-kernel roofline: measured throughput of the fused transform kernel
(ops/transform_pallas.encode_blocks_pallas — level shift + 2D DCT + zigzag
+ quantize as one (rows,128)@(128,128) MXU matmul) against the analytic
ceilings of the chip.

Ceilings (v5e defaults, overridable by flags):
  * MXU:  the kernel runs the split-operand form (x exact in bf16, operator
          as 3 bf16 terms — tables.fused_encode_operator_split) = 3 bf16
          passes -> flops_bound = peak_bf16_flops / 3 at 2*128*128 MACs per
          128-pixel row (256 FLOP/pixel per pass)
  * HBM:  u8 in + int16 out = 3 B/pixel
  v5e peak bf16 is 197 TFLOPS (394 is the INT8 number — round 1 used it by
  mistake, halving every reported fraction)

Timing: K-loop delta on-device (see bench.py) — dispatch overhead through
the axon tunnel cancels.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:  # allow `python benchmarks/<x>.py` from anywhere
    _sys.path.insert(0, _REPO_ROOT)

import argparse
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mpix", type=float, default=33.4,
                    help="workload size in Mpix (default ~2x bench.py)")
    ap.add_argument("--peak-bf16-tflops", type=float, default=197.0,
                    help="chip peak bf16 TFLOPS (v5e: 197; 394 is int8)")
    ap.add_argument("--hbm-gbs", type=float, default=819.0,
                    help="chip HBM bandwidth GB/s (v5e: 819)")
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dct_tpu.config import CodecConfig
    from dct_tpu.ops import transform_pallas as tpk

    on_tpu = jax.default_backend() == "tpu"
    cfg = CodecConfig(quality=50, use_pallas=True)
    nb = int(args.mpix * 1e6 / 64)
    nb = -(-nb // 16) * 16
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.integers(0, 256, (nb, 64)).astype(np.uint8))
    pixels = nb * 64

    def make(k):
        @jax.jit
        def run(p):
            def body(i, acc):
                pi = p ^ (i & 255).astype(jnp.uint8)  # unique per trip
                zz = tpk.encode_blocks_pallas(pi, cfg)
                return acc + jnp.sum(zz.astype(jnp.int32))

            return jax.lax.fori_loop(0, k, body, jnp.int32(0))

        return run

    # kernel body ~0.7 ms at the default workload: use a large K so the
    # trip delta dwarfs the ~2 ms tunnel dispatch jitter
    K = 33
    r1, rk = make(1), make(K)

    def timed(fn):
        float(fn(px))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            float(fn(px))
        return (time.perf_counter() - t0) / args.iters

    t1, tk = timed(r1), timed(rk)
    if tk <= t1:
        print("warning: K-loop delta <= 0 (dispatch jitter); reporting "
              "single-dispatch throughput incl. overhead", file=_sys.stderr)
        dt = t1
    else:
        dt = (tk - t1) / (K - 1)
    gpix = pixels / dt / 1e9

    flop_per_px = 2 * 128 * 128 / 128 * 3  # split-operand = 3 bf16 passes
    mxu_bound = args.peak_bf16_tflops * 1e12 / flop_per_px / 1e9  # Gpix/s
    hbm_bound = args.hbm_gbs * 1e9 / 3.0 / 1e9
    bound = min(mxu_bound, hbm_bound)
    print(
        f"backend={jax.default_backend()} workload={pixels/1e6:.1f} Mpix\n"
        f"DCT+quant+zigzag kernel: {dt*1e3:.3f} ms  {gpix:.2f} Gpix/s\n"
        f"bounds: MXU {mxu_bound:.1f} Gpix/s (split-operand = bf16/3), "
        f"HBM {hbm_bound:.1f} Gpix/s (3 B/px)\n"
        f"roofline fraction: {gpix / bound * 100:.1f}% of "
        f"{'MXU' if mxu_bound < hbm_bound else 'HBM'} bound"
    )
    if not on_tpu:
        print("NOTE: not on TPU — fraction is meaningless off-chip")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
