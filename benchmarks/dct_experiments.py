#!/usr/bin/env python
"""Controlled experiments dissecting the fused DCT kernel's roofline gap.

Round-1 measured the production kernel (f32 HIGHEST = 6 MXU passes) at
~1/3 of its analytic ceiling with no breakdown of where the budget goes.
This harness times kernel VARIANTS that each remove one cost component:

  highest   - production kernel (f32 HIGHEST matmul + full epilogue)
  default   - f32 DEFAULT matmul (1 truncated-bf16 pass; accuracy-wrong,
              pure perf signal for the MXU-pass count)
  split3    - x as exact bf16 (u8 always fits: <= 255 needs 8 mantissa
              bits) against a 3-way bf16 split of the operator
              M = M0 + M1 + M2 -> THREE default-precision passes with the
              same ~24-bit operator mantissa HIGHEST reconstructs with SIX
              (HIGHEST must split BOTH operands 3x; we know x needs none)
  split2    - 2-way split (16-bit operator mantissa; accuracy probe)
  noepi     - HIGHEST matmul, epilogue reduced to a truncating cast
              (isolates the round-half-away + select cost)
  copy      - no matmul at all: widen u8 -> int16 store (VPU+DMA floor)

Timing: K-loop delta on device (bench.py method). Run on the real TPU.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import argparse
import functools
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mpix", type=float, default=33.4)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--k", type=int, default=33)
    ap.add_argument("--only", type=str, default="")
    ap.add_argument("--content", type=str, default="random",
                    choices=("random", "photo"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from dct_tpu.config import CodecConfig
    from dct_tpu.ops import transform_pallas as tpk

    cfg = CodecConfig(quality=50, use_pallas=True)
    TILE = tpk.TILE_ROWS
    m2, b2 = tpk._packed_encode_operator(cfg)
    m64, b64 = np.asarray(m2, np.float64), np.asarray(b2, np.float64)

    def split(m, k):
        parts = []
        rem = np.asarray(m, np.float32)
        for _ in range(k):
            p = rem.astype(np.float16) if False else rem.astype(jnp.bfloat16)
            parts.append(np.asarray(p))
            rem = rem - np.asarray(p, np.float32)
        return parts

    msplit = split(m2, 3)

    def _half(y):
        return jnp.where(y >= 0, jnp.float32(0.5), jnp.float32(-0.5))

    def k_highest(x_ref, m_ref, b_ref, o_ref):
        x = x_ref[:].astype(jnp.int32).astype(jnp.float32)
        y = jnp.dot(x, m_ref[:], preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST) + b_ref[:]
        o_ref[:] = (y + _half(y)).astype(jnp.int16)

    def k_default(x_ref, m_ref, b_ref, o_ref):
        x = x_ref[:].astype(jnp.int32).astype(jnp.float32)
        y = jnp.dot(x, m_ref[:], preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT) + b_ref[:]
        o_ref[:] = (y + _half(y)).astype(jnp.int16)

    def k_split(x_ref, m0_ref, m1_ref, m2_ref, b_ref, o_ref, *, terms):
        xb = x_ref[:].astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
        y = jnp.dot(xb, m0_ref[:], preferred_element_type=jnp.float32)
        y = y + jnp.dot(xb, m1_ref[:], preferred_element_type=jnp.float32)
        if terms == 3:
            y = y + jnp.dot(xb, m2_ref[:], preferred_element_type=jnp.float32)
        y = y + b_ref[:]
        o_ref[:] = (y + _half(y)).astype(jnp.int16)

    def k_split3_noepi(x_ref, m0_ref, m1_ref, m2_ref, b_ref, o_ref):
        xb = x_ref[:].astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
        y = jnp.dot(xb, m0_ref[:], preferred_element_type=jnp.float32)
        y = y + jnp.dot(xb, m1_ref[:], preferred_element_type=jnp.float32)
        y = y + jnp.dot(xb, m2_ref[:], preferred_element_type=jnp.float32)
        o_ref[:] = (y + b_ref[:]).astype(jnp.int16)

    def k_split3_bithalf(x_ref, m0_ref, m1_ref, m2_ref, b_ref, o_ref):
        # round-half-away with sign picked by bit ops instead of a
        # compare+select: half = sign(y) | 0.5 via u32 masks
        xb = x_ref[:].astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
        y = jnp.dot(xb, m0_ref[:], preferred_element_type=jnp.float32)
        y = y + jnp.dot(xb, m1_ref[:], preferred_element_type=jnp.float32)
        y = y + jnp.dot(xb, m2_ref[:], preferred_element_type=jnp.float32)
        y = y + b_ref[:]
        yb = pltpu.bitcast(y, jnp.uint32)
        halfb = (yb & jnp.uint32(0x80000000)) | jnp.uint32(0x3F000000)
        o_ref[:] = (y + pltpu.bitcast(halfb, jnp.float32)).astype(jnp.int16)

    def k_split3_i2(x_ref, m0_ref, m1_ref, m2_ref, b_ref, o_ref):
        # two half-tiles interleaved: epilogue of half A can overlap the
        # matmuls of half B if Mosaic schedules across the split
        Hh = TILE // 2
        for h in range(2):
            xb = (
                x_ref[pl.ds(h * Hh, Hh), :]
                .astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
            )
            y = jnp.dot(xb, m0_ref[:], preferred_element_type=jnp.float32)
            y = y + jnp.dot(xb, m1_ref[:], preferred_element_type=jnp.float32)
            y = y + jnp.dot(xb, m2_ref[:], preferred_element_type=jnp.float32)
            y = y + b_ref[:]
            o_ref[pl.ds(h * Hh, Hh), :] = (y + _half(y)).astype(jnp.int16)

    def k_noepi(x_ref, m_ref, b_ref, o_ref):
        x = x_ref[:].astype(jnp.int32).astype(jnp.float32)
        y = jnp.dot(x, m_ref[:], preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST) + b_ref[:]
        o_ref[:] = y.astype(jnp.int16)

    def k_copy(x_ref, m_ref, b_ref, o_ref):
        o_ref[:] = x_ref[:].astype(jnp.int32).astype(jnp.int16)

    def call(kernel, x, extra_ms=None, tile=None, parallel=False):
        tile = tile or TILE
        rows = x.shape[0]
        ms = [np.asarray(m2, np.float32)] if extra_ms is None else extra_ms
        specs = [pl.BlockSpec((tile, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)]
        for _ in ms:
            specs.append(pl.BlockSpec((128, 128), lambda i: (0, 0), memory_space=pltpu.VMEM))
        specs.append(pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM))
        kw = {}
        if parallel:
            kw["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=("parallel",)
            )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.int16),
            grid=(rows // tile,),
            in_specs=specs,
            out_specs=pl.BlockSpec((tile, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            interpret=jax.default_backend() != "tpu",
            **kw,
        )(x, *[jnp.asarray(m) for m in ms], jnp.asarray(b2, np.float32))

    variants = {
        "highest": lambda x: call(k_highest, x),
        "default": lambda x: call(k_default, x),
        "split3": lambda x: call(functools.partial(k_split, terms=3), x, msplit),
        "split2": lambda x: call(functools.partial(k_split, terms=2), x, msplit),
        "noepi": lambda x: call(k_noepi, x),
        "copy": lambda x: call(k_copy, x),
        "s3noepi": lambda x: call(k_split3_noepi, x, msplit),
        "s3bit": lambda x: call(k_split3_bithalf, x, msplit),
        "s3i2": lambda x: call(k_split3_i2, x, msplit),
        "s3b_t128": lambda x: call(k_split3_bithalf, x, msplit, tile=128),
        "s3b_t256": lambda x: call(k_split3_bithalf, x, msplit, tile=256),
        "s3b_t1024": lambda x: call(k_split3_bithalf, x, msplit, tile=1024),
        "s3b_t2048": lambda x: call(k_split3_bithalf, x, msplit, tile=2048),
        "s3b_t4096": lambda x: call(k_split3_bithalf, x, msplit, tile=4096),
        "s3b_tp1024": lambda x: call(
            k_split3_bithalf, x, msplit, tile=1024, parallel=True
        ),
        "s3b_par": lambda x: call(k_split3_bithalf, x, msplit, parallel=True),
        "s3b_p256": lambda x: call(
            k_split3_bithalf, x, msplit, tile=256, parallel=True
        ),
        # the production path, to isolate any wrapper overhead
        "prod": lambda x: tpk.encode_blocks_pallas(
            x.reshape(-1, 64), cfg
        ).reshape(x.shape[0], 128),
    }

    nb = int(args.mpix * 1e6 / 64)
    nb = -(-nb // (2 * TILE)) * (2 * TILE)
    rng = np.random.default_rng(0)
    if args.content == "photo":
        from dct_tpu.utils import image_io
        from dct_tpu.ops import blocks as blk

        im = image_io.synthetic_image(1088, 1920, "photo", seed=0)
        one = np.asarray(blk.image_to_blocks(jnp.asarray(im), 8))
        reps = -(-nb // one.shape[0])
        px_np = np.tile(one, (reps, 1))[:nb]
    else:
        px_np = rng.integers(0, 256, (nb, 64)).astype(np.uint8)
    rows = nb // 2
    x = jnp.asarray(px_np.reshape(rows, 128))
    pixels = nb * 64

    # ---- accuracy vs float64 (small batch, on host) ----------------------
    xs_rows = px_np[: 2 * TILE].reshape(TILE, 128).astype(np.float64)
    y64 = xs_rows @ m64 + b64  # (TILE, 128) packed-row layout
    q64 = np.sign(y64) * np.floor(np.abs(y64) + 0.5)
    xsj = jnp.asarray(px_np[: 2 * TILE].reshape(TILE, 128))
    print("accuracy vs f64 oracle (first %d blocks):" % (2 * TILE), flush=True)
    acc_names = [n for n in ("highest", "default", "split3", "split2") if not args.only or n in args.only.split(",")]
    for name in acc_names:
        out = np.asarray(variants[name](xsj)).astype(np.int64)
        diff = out - q64
        bad = np.abs(diff) > 0
        frac_half = np.abs(np.abs(y64) % 1.0 - 0.5)
        near = frac_half[bad]
        print(
            f"  {name:8s} mismatch {bad.sum():5d}/{bad.size} "
            f"max|d|={np.abs(diff).max():.0f} "
            f"nearest-tie-dist={near.min() if bad.any() else float('nan'):.2e}", flush=True
        )

    # ---- throughput ------------------------------------------------------
    # Harness traffic matters: an XOR-perturbation pass plus a full-output
    # sum add ~2.3x the kernel's own HBM bytes and bound the measurement by
    # the HARNESS, not the kernel (round-1 and the first round-2 numbers
    # all have this bias). Instead: an optimization_barrier threaded
    # through the loop carry pins the kernel inside the loop (no hoisting,
    # no CSE) with ZERO extra memory traffic, and only a 128-lane slice of
    # the output is consumed (the kernel still writes everything).
    def make(fn, k):
        @jax.jit
        def run(p):
            def body(i, acc):
                pi, _ = jax.lax.optimization_barrier((p, acc))
                zz = fn(pi)
                # barrier the FULL output before slicing: otherwise XLA
                # slices BEFORE any post-kernel reshape/layout copy and
                # wrapper variants measure nothing but the kernel
                zzb, _ = jax.lax.optimization_barrier((zz, acc))
                return acc + jnp.sum(zzb[:1].astype(jnp.int32))

            return jax.lax.fori_loop(0, k, body, jnp.int32(0))

        return run

    def timed(fn):
        float(fn(x))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            float(fn(x))
        return (time.perf_counter() - t0) / args.iters

    # two LARGE trip counts (CLAUDE.md K-loop rule): a K=1 baseline makes
    # the delta hostage to per-dispatch tunnel jitter (several ms against
    # a ~0.2 ms body)
    k1, k2 = 9, max(args.k, 33)
    print(f"\nthroughput ({pixels/1e6:.1f} Mpix, K={k1}/{k2}):", flush=True)
    for name, fn in variants.items():
        if args.only and name not in args.only.split(","):
            continue
        t1 = timed(make(fn, k1))
        tk = timed(make(fn, k2))
        warn = ""
        if tk > t1:
            dt = (tk - t1) / (k2 - k1)
        else:
            dt, warn = t1 / k1, "  JITTER (tk<=t1)"
        print(f"  {name:9s} {dt*1e3:7.3f} ms  {pixels/dt/1e9:7.2f} Gpix/s"
              f"{warn}", flush=True)
    return 0


if __name__ == "__main__":
    _sys.exit(main())
