#!/usr/bin/env python
"""Measure what models/codec.py's dynamic-table comments claim (round-3
VERDICT item 6).

Two unbacked claims to turn into numbers:

1. `encode_plane` dynamic path (codec.py): after the analyze dispatch
   builds per-image tables, the fused path RE-RUNS transform+RLE inside
   the fused kernel ("still cheaper than the staged pack"). Measure, on
   the q50 1080p bench workload:
     analyze               — stage-1 dispatch (transform+RLE+histogram)
     fused re-encode       — encode_fused_step with the real tables
     staged pack           — encode_pack over the analyze symbols
                             (the alternative that reuses stage 1's work)
   Claim holds iff fused re-encode < staged pack.

2. Direct-mode fused throughput: the per-row (128, 640) one-hot table
   gather loop (fused_encode_pallas.py direct branch) has no measured
   cost. Time encode_fused_step in direct mode vs category mode on the
   same content.

Timing: K-loop deltas (two large trip counts, optimization_barrier
carry, scalar fetch), per CLAUDE.md harness rules. Run on the real TPU:

    python benchmarks/dynamic_cost.py
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
from dct_tpu.models import codec  # noqa: E402
from dct_tpu.ops import huffman as hf  # noqa: E402
from dct_tpu.utils import image_io  # noqa: E402

H, W = 1088, 1920
FRAMES = 8
K1, K2 = 9, 65


def kdelta(make_run, arg, iters=4):
    """Seconds per body via the two-trip-count delta."""

    def timed(fn):
        float(fn(arg))
        t0 = time.perf_counter()
        for _ in range(iters):
            float(fn(arg))
        return (time.perf_counter() - t0) / iters

    t1, t2 = timed(make_run(K1)), timed(make_run(K2))
    if t2 <= t1:
        return float("nan")
    return (t2 - t1) / (K2 - K1)


def loop(body):
    """K-looped scalar-consuming runner around body(frame)->scalar."""

    def make(k):
        @jax.jit
        def run(fr):
            def step(i, acc):
                f, _ = jax.lax.optimization_barrier((fr, acc))
                return acc + body(f)

            return jax.lax.fori_loop(0, k, step, jnp.int32(0))

        return run

    return make


def main() -> int:
    global H, W, FRAMES, K1, K2
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu-smoke", action="store_true",
                    help="tiny shapes on CPU: validates the harness "
                    "plumbing only, numbers are meaningless")
    args = ap.parse_args()
    if args.cpu_smoke:
        jax.config.update("jax_platforms", "cpu")
        H, W, FRAMES, K1, K2 = 64, 128, 2, 1, 3
    elif jax.default_backend() != "tpu":
        print("requires the TPU backend (or --cpu-smoke)", file=sys.stderr)
        return 2

    frames = np.stack([
        image_io.synthetic_image(H, W, "photo", seed=s) for s in range(FRAMES)
    ])
    fr = jnp.asarray(frames)
    n_stripes = H // 8
    mpix = FRAMES * H * W / 1e6

    # ---- claim 1: dynamic-table second stage --------------------------------
    cfg = CodecConfig(quality=50, use_pallas=True)  # dynamic tables

    def analyze_body(f):
        out = jax.vmap(lambda im: codec.encode_analyze(im, cfg))(f)
        # consume the histogram only — XLA dead-code-eliminates the runs
        # chain, which is exactly what the FUSED alternative's stage 1
        # pays in production (it refetches only the histogram)
        return jnp.sum(out[2]).astype(jnp.int32)

    def analyze_sym_body(f):
        # the STAGED-reuse alternative's stage 1: the symbol planes must
        # be materialized for the pack stage to read back — the barrier
        # stops XLA from narrowing them to the consumed slice
        out = jax.vmap(lambda im: codec.encode_analyze(im, cfg))(f)
        v, r, m = jax.lax.optimization_barrier(
            (out[0].values, out[0].runs, out[0].is_sym)
        )
        return (
            jnp.sum(out[2]) + jnp.sum(v[0, :1]) + jnp.sum(r[0, :1])
            + jnp.sum(m[0, :1])
        ).astype(jnp.int32)

    t_analyze = kdelta(loop(analyze_body), fr)
    t_analyze_sym = kdelta(loop(analyze_sym_body), fr)

    # real per-image tables from one analyze pass (vmapped hist summed —
    # table CONTENT does not affect kernel timing, only correctness)
    sym, _, hist, _ = jax.vmap(lambda im: codec.encode_analyze(im, cfg))(fr)
    table = hf.CanonicalTable.from_frequencies(
        np.asarray(jnp.sum(hist, axis=0))
    )
    lengths, codes = codec._table_arrays(table)

    def fused_body(f):
        packed = jax.vmap(
            lambda im: codec.encode_fused_step(
                im, cfg, n_stripes, lengths, codes
            )
        )(f)[0]
        return jnp.sum(packed.bit_lengths)

    t_fused = kdelta(loop(fused_body), fr)

    # staged pack over PRECOMPUTED symbols (the reuse alternative):
    # input = the analyze symbols, so the loop times pack alone
    def make_pack(k):
        @jax.jit
        def run(s):
            def step(i, acc):
                si, _ = jax.lax.optimization_barrier((s, acc))
                packed = jax.vmap(
                    lambda v, r, m: codec.encode_pack(
                        type(sym)(v, r, m), cfg, n_stripes, lengths, codes
                    )
                )(si.values, si.runs, si.is_sym)
                return acc + jnp.sum(packed.bit_lengths)

            return jax.lax.fori_loop(0, k, step, jnp.int32(0))

        return run

    t_pack = kdelta(make_pack, sym)

    print(f"analyze (hist only):   {t_analyze * 1e3:8.2f} ms "
          f"({mpix / t_analyze / 1e3:.2f} Gpix/s)")
    print(f"analyze (+symbols):    {t_analyze_sym * 1e3:8.2f} ms "
          f"({mpix / t_analyze_sym / 1e3:.2f} Gpix/s)")
    print(f"fused re-encode:       {t_fused * 1e3:8.2f} ms "
          f"({mpix / t_fused / 1e3:.2f} Gpix/s)")
    print(f"staged pack (reuse):   {t_pack * 1e3:8.2f} ms "
          f"({mpix / t_pack / 1e3:.2f} Gpix/s)")
    t_dyn_fused = t_analyze + t_fused
    t_dyn_staged = t_analyze_sym + t_pack
    if t_dyn_fused != t_dyn_fused or t_dyn_staged != t_dyn_staged:
        # a NaN here is a jitter-invalidated delta, not a negative result
        print("claim 'fused second stage beats staged reuse': "
              "MEASUREMENT INVALID (K-loop delta <= 0, dispatch jitter "
              "dominated — rerun on an idle host)")
    else:
        verdict = "HOLDS" if t_dyn_fused < t_dyn_staged else "FAILS"
        print(f"dynamic e2e: fused {t_dyn_fused * 1e3:.2f} ms vs staged "
              f"reuse {t_dyn_staged * 1e3:.2f} ms -> claim {verdict} "
              f"({t_dyn_fused / t_dyn_staged:.2f}x)")

    # ---- claim 2: direct-mode fused throughput ------------------------------
    cfg_d = CodecConfig(quality=50, use_pallas=True, huffman_mode="direct")
    sym_d, _, hist_d, _ = jax.vmap(
        lambda im: codec.encode_analyze(im, cfg_d)
    )(fr)
    t_d = hf.CanonicalTable.from_frequencies(
        np.asarray(jnp.sum(hist_d, axis=0)) + 1
    )
    dl, dc = codec._table_arrays(t_d)

    def direct_body(f):
        packed = jax.vmap(
            lambda im: codec.encode_fused_step(
                im, cfg_d, n_stripes, dl, dc
            )
        )(f)[0]
        return jnp.sum(packed.bit_lengths)

    t_direct = kdelta(loop(direct_body), fr)
    print(f"direct-mode fused:     {t_direct * 1e3:8.2f} ms "
          f"({mpix / t_direct / 1e3:.2f} Gpix/s; category fused was "
          f"{mpix / t_fused / 1e3:.2f})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
