"""Wrapper layout-copy experiment (VERDICT r3 item 7).

The production staged consumer sequence is
    encode_blocks_pallas(pixels (B, 64) u8) -> (B, 64) i16 -> astype(i32)
(codec._fused_encode). XLA gives the i16 (B, 64) intermediate the packed
{0,1} layout (minor dim 64 < 128 lanes), inserting a layout-changing copy
after the kernel's (rows, 128) store — then the widen reads it again. The
candidate fix: ask the kernel for int32 directly (out_dtype=jnp.int32) so
the only output pass is the kernel's own store.

Variants (identical K-loop-delta harness, bench.py rules):
  bare      — packed (rows, 128) i16, no reshape (the mfu kernel figure)
  prod_i16  — (B, 64) i16 wrapper + astype(i32): production before
  prod_i32  — (B, 64) i32 straight from the kernel: production after
  pack_i32  — packed (rows, 128) i32 (isolates the reshape cost at i32)

Integers are asserted identical across variants before timing.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dct_tpu.config import CodecConfig  # noqa: E402
from dct_tpu.ops import transform_pallas as tpk  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mpix", type=float, default=33.4)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    cfg = CodecConfig(quality=50, use_pallas=True)
    nb = int(args.mpix * 1e6 / 64)
    nb = -(-nb // (2 * tpk.TILE_ROWS)) * (2 * tpk.TILE_ROWS)

    from dct_tpu.utils import image_io
    from dct_tpu.ops import blocks as blk

    im = image_io.synthetic_image(1088, 1920, "photo", seed=0)
    one = np.asarray(blk.image_to_blocks(jnp.asarray(im), 8))
    reps = -(-nb // one.shape[0])
    px_np = np.tile(one, (reps, 1))[:nb]
    p64 = jnp.asarray(px_np)
    p128 = jnp.asarray(px_np.reshape(nb // 2, 128))

    variants = {
        "bare": (p128, lambda p: tpk.encode_blocks_pallas(
            p, cfg, packed_io=True)),
        "prod_i16": (p64, lambda p: tpk.encode_blocks_pallas(
            p, cfg).astype(jnp.int32)),
        "prod_i32": (p64, lambda p: tpk.encode_blocks_pallas(
            p, cfg, out_dtype=jnp.int32)),
        "pack_i32": (p128, lambda p: tpk.encode_blocks_pallas(
            p, cfg, packed_io=True, out_dtype=jnp.int32)),
    }

    # integers identical across variants (small slice)
    small64 = p64[: 2 * tpk.TILE_ROWS]
    want = np.asarray(
        tpk.encode_blocks_pallas(small64, cfg)
    ).astype(np.int64)
    for name in ("prod_i16", "prod_i32"):
        got = np.asarray(variants[name][1](small64)).astype(np.int64)
        assert np.array_equal(got, want), name
    print("integer identity across variants: OK", flush=True)

    def make(arr, fn, k):
        @jax.jit
        def run(p):
            def body(i, acc):
                pi, _ = jax.lax.optimization_barrier((p, acc))
                zz = fn(pi)
                # barrier the FULL output before slicing, or XLA slices
                # before the layout copy under test and DCEs it away
                zzb, _ = jax.lax.optimization_barrier((zz, acc))
                return acc + jnp.sum(zzb[:1].astype(jnp.int32))

            return jax.lax.fori_loop(0, k, body, jnp.int32(0))

        return run

    def timed(fn, arr):
        float(fn(arr))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            float(fn(arr))
        return (time.perf_counter() - t0) / args.iters

    pixels = nb * 64
    k1, k2 = 9, 129
    print(f"throughput ({pixels/1e6:.1f} Mpix, K={k1}/{k2}):", flush=True)
    for name, (arr, fn) in variants.items():
        t1 = timed(make(arr, fn, k1), arr)
        tk = timed(make(arr, fn, k2), arr)
        warn = ""
        if tk > t1:
            dt = (tk - t1) / (k2 - k1)
        else:
            dt = t1 / k1
            warn = "  JITTER (tk<=t1)"
        print(f"  {name:9s} {dt*1e3:7.3f} ms  {pixels/dt/1e9:7.2f} Gpix/s"
              f"{warn}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
