#!/usr/bin/env python
"""Entropy-decode KERNEL-ONLY throughput (K-loop delta, Mpix/s).

The device entropy decoder (ops/entropy_decode_pallas.py) was the only
kernel without a kernel-only BASELINE.md row (VERDICT r4 weak #2): the
e2e `decode_device_value` in bench.py pays ~32 ms/frame of tunnel
dispatch, hiding the kernel's own cost. This harness times decode_call
alone, bench.py-methodology: jit a fori_loop at two LARGE trip counts,
thread jax.lax.optimization_barrier through the carry (no XOR / full-sum
pollution — CLAUDE.md harness rules), consume a tiny output slice, and
report the delta (T(k2)-T(k1))/(k2-k1).

Usage: python benchmarks/decode_kernel.py [--quality 50] [--frames 8]
       [--mode category|direct|none] [--coded-runs] [--k 9 129]
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
    ap.add_argument("--quality", type=int, default=50)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--size", default="1920x1088")
    ap.add_argument("--mode", default="category",
                    choices=["category", "direct", "none"])
    ap.add_argument("--coded-runs", action="store_true")
    ap.add_argument("--k", type=int, nargs=2, default=(9, 129))
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--syms", type=int, default=2, choices=[1, 2],
                    help="symbols decoded per while_loop iteration")
    ap.add_argument("--worst-geometry", action="store_true",
                    help="round-4 style worst-case W + SPAN_MAX roll span "
                         "instead of the data-driven geometry")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dct_tpu import container as cont
    from dct_tpu.config import CodecConfig
    from dct_tpu.models import codec, recovery
    from dct_tpu.utils import image_io

    w, h = (int(x) for x in args.size.split("x"))
    on_tpu = jax.default_backend() == "tpu"
    cfg = CodecConfig(
        quality=args.quality,
        static_tables=args.mode == "category",
        use_pallas=on_tpu,
        decode_index=True,
        huffman_mode=args.mode if args.mode != "none" else "category",
        use_huffman=args.mode != "none",
        coded_runs=args.coded_runs,
    )
    frames = [
        image_io.synthetic_image(h, w, "photo", seed=s)
        for s in range(args.frames)
    ]
    blobs = [codec.ImageCodec(cfg).encode(f) for f in frames]
    parsed = [cont.deserialize(b) for b in blobs]
    ccfg = parsed[0].config

    # per-frame decode operands, stacked along a leading frame axis
    # (the batched-decode layout _device_decode_batch_step uses)
    p0 = parsed[0].planes[0]
    _, _, n_stripes, bps = recovery._geometry(p0, ccfg)
    mode, table, run_table = recovery._table(p0, ccfg)
    u_max = 0
    for c in parsed:
        u_max = max(
            u_max, max((len(s) + 1) // 2 for s in c.planes[0].stripes)
        )
    u_max = max(1, -(-u_max // 1024) * 1024)
    from dct_tpu.ops import entropy_decode_pallas as edp

    if args.worst_geometry:
        n2 = ccfg.n2
        from dct_tpu.ops import bitstream as bs

        w_shared = edp.window_units(
            n2, mode, args.coded_runs, bs.run_field_bits(n2)
        )
        span_shared = edp.SPAN_MAX
    else:
        w_shared, span_shared = edp.plan_geometry(
            [c.planes[0].block_bits for c in parsed], n_stripes
        )
    preps = []
    for c in parsed:
        # per-frame tables (direct mode builds them per image)
        f_mode, f_table, f_run = recovery._table(c.planes[0], ccfg)
        prep = codec._device_decode_prep(
            c.planes[0], ccfg, f_table, f_mode, n_stripes, bps, f_run,
            u_max=u_max, w_units=w_shared, span=span_shared,
        )
        assert prep is not None, "geometry/table fell back to host decode"
        if args.syms != 2:
            prep[1]["syms"] = args.syms
        preps.append(prep)
    statics = preps[0][1]
    arrays = tuple(
        jnp.stack([p[0][i] for p in preps])
        for i in range(len(preps[0][0]))
    )
    from dct_tpu.ops import entropy_decode_pallas as edp

    sym_rows = int(np.asarray(p0.block_bits).size)
    print(
        f"backend={jax.default_backend()} q={args.quality} mode={mode} "
        f"coded_runs={args.coded_runs} frames={args.frames} "
        f"stripes={n_stripes} bps={bps} u_max={u_max} "
        f"W={statics['W']} statics={statics}",
        flush=True,
    )

    def make_k(k: int):
        @jax.jit
        def run(ops):
            def body(i, acc):
                opsb, _ = jax.lax.optimization_barrier((ops, acc))
                zz = jax.vmap(
                    lambda o: edp.decode_call(*o, **statics)
                )(opsb)
                zzb, _ = jax.lax.optimization_barrier((zz, acc))
                return acc + jnp.sum(zzb[:, :1, :1].astype(jnp.int32))

            return jax.lax.fori_loop(0, k, body, jnp.int32(0))

        return run

    def timed(fn, reps):
        float(fn(arrays))  # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(arrays))
            ts.append(time.perf_counter() - t0)
        return min(ts), ts

    k1, k2 = args.k
    t1, ts1 = timed(make_k(k1), args.reps)
    t2, ts2 = timed(make_k(k2), args.reps)
    pixels = args.frames * h * w
    if t2 <= t1:
        print(f"warning: delta <= 0 (t{k1}={t1:.4f} t{k2}={t2:.4f})")
        return 1
    dt = (t2 - t1) / (k2 - k1)
    print(
        f"kernel-only: {dt*1e3:9.2f} ms/loop-trip "
        f"({dt*1e3/args.frames:7.3f} ms/frame)  "
        f"{pixels/dt/1e6:9.1f} Mpix/s"
    )
    print(
        f"  t{k1}={['%.4f' % t for t in ts1]} "
        f"t{k2}={['%.4f' % t for t in ts2]}"
    )
    # correctness spot check: kernel zigzag == host decoder zigzag
    zz_dev = np.asarray(edp.decode_call(
        *(a[0] for a in arrays), **statics
    ))
    zz_host = codec._decode_stripes(
        p0, ccfg, table, mode, n_stripes, bps, run_table
    )
    ok = np.array_equal(zz_dev, np.asarray(zz_host))
    print(f"byte-identity vs host decoder: {'OK' if ok else 'MISMATCH'}")
    return 0 if ok else 2


if __name__ == "__main__":
    _sys.exit(main())
