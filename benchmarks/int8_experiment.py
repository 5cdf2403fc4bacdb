"""int8-MXU split-operand experiment (round-3 VERDICT item 2).

Question: level-shifted pixels (x - 128 in [-128, 127]) are EXACT in int8
and v5e int8 peak is 2x bf16 — can the encode transform run as THREE
signed-radix-256 int8 digit passes with exact int32 accumulation and a
single f32 epilogue, at oracle-parity accuracy? If yes, MXU time halves
(3 int8 passes = 1.5 bf16-pass equivalents) and the DCT-kernel roofline
target moves within reach.

Decomposition (per OUTPUT column k of the fused encode operator M):
    c_k  = 22 - ceil(log2 max_j |M[j,k]|)      (fixed-point exponent)
    I    = round(M * 2^c_k)                     (|I| <= 2^22, int32)
    I    = d2*2^16 + d1*2^8 + d0, digits d in [-128, 127] (balanced radix)
    y_k  = (x@d0)*2^-c_k + (x@d1)*2^(8-c_k) + (x@d2)*2^(16-c_k)
where each x@d is an EXACT int32 dot (|sum| <= 128*128*128 = 2^21) and the
scales are exact powers of two, so the only rounding is the two f32 adds in
the epilogue. The bias vanishes: b_enc = -128 * colsum(M) IS the folded
level shift, so b + 128*colsum = 0 identically.

Bonus over the bf16 path: int32 accumulation is associativity-free, so the
K=n2 vs K=128 tie-rounding hazard (CLAUDE.md) disappears by construction.

Phase A (this script, any backend): accuracy vs the float64 operator on
random u8 blocks + the real rasters in tests/data, mismatch counts after
round-half-away, side by side with the production bf16x3 split.
Phase B (--tpu): K-loop-delta throughput of an int8 Pallas kernel vs the
production bf16x3 kernel (i16 packed output, identical harness).

Reference for what must stay bit-faithful: /root/reference/src/dct.c:52-74
(f64 forward DCT) + quantization.c:113-131 (round(c/m)).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dct_tpu.config import CodecConfig  # noqa: E402
from dct_tpu import tables  # noqa: E402
from dct_tpu.ops import transform  # noqa: E402


def exact_encode_operator_f64(cfg: CodecConfig, chroma: bool = False):
    """Float64 (M, b) — same formula as tables.fused_encode_operator
    but without the final cfg.dtype cast."""
    n = cfg.block_size
    K = tables._kron_dct(n)
    perm = tables.zigzag_permutation(n)
    qz = tables._zigzag_quant(cfg, chroma=chroma)
    Kp = K[perm, :] / qz[:, None]
    bias = -128.0 * Kp.sum(axis=1)
    return Kp.T, bias


def int8_digit_split(M64: np.ndarray, max_bit: int = 22):
    """f64 operator (n2|128, n2|128) -> (d0, d1, d2 int8 digits, s (1, C) f32
    per-digit per-column scales as powers of two).

    Returns (digits[3], scales[3], c) with
    M ~= sum_d digits[d] * 2**(8*d - c[k]) per column k.
    """
    colmax = np.abs(M64).max(axis=0)
    colmax = np.where(colmax == 0, 1.0, colmax)
    c = (max_bit - np.ceil(np.log2(colmax))).astype(np.int64)  # (C,)
    I = np.rint(M64 * np.exp2(c)[None, :]).astype(np.int64)
    assert np.abs(I).max() <= (1 << max_bit), np.abs(I).max()
    d0 = ((I + 128) % 256) - 128
    I1 = (I - d0) >> 8
    d1 = ((I1 + 128) % 256) - 128
    d2 = (I1 - d1) >> 8
    for d in (d0, d1, d2):
        assert d.min() >= -128 and d.max() <= 127, (d.min(), d.max())
    recon = (d2 * 65536 + d1 * 256 + d0) * np.exp2(-c)[None, :]
    qerr = np.abs(recon - M64).max()
    scales = [np.exp2(8 * d - c).astype(np.float32)[None, :] for d in range(3)]
    return (
        [d.astype(np.int8) for d in (d0, d1, d2)],
        scales,
        c,
        qerr,
    )


def int8_encode(x_u8: jnp.ndarray, digits, scales) -> jnp.ndarray:
    """(B, C) u8 blocks -> f32 pre-round coefficients via 3 int8 passes.

    Canonical op order (must be shared by XLA and any Mosaic kernel):
    least-significant digit first, left-associated adds; every scale
    multiply is an exact power of two.
    """
    x8 = (x_u8.astype(jnp.int32) - 128).astype(jnp.int8)
    y = None
    for d in range(3):
        p = jnp.dot(
            x8, jnp.asarray(digits[d]), preferred_element_type=jnp.int32
        ).astype(jnp.float32) * jnp.asarray(scales[d])
        y = p if y is None else y + p
    return y


def mismatches(y: np.ndarray, y64: np.ndarray, label: str) -> int:
    """Count integer mismatches after round-half-away, excluding exact
    .5 ties in the f64 value (the documented parity carve-out)."""
    def rha(v):
        return np.trunc(v + np.where(v >= 0, 0.5, -0.5))

    got = rha(y.astype(np.float64))
    want = rha(y64)
    tie = np.abs(y64 - np.rint(y64)) == 0.5
    bad = (got != want) & ~tie
    n = int(bad.sum())
    err = np.abs(y - y64)
    print(
        f"  {label:28s} mismatches(excl .5 ties)={n:6d}/{y.size}"
        f"  ties={int(tie.sum()):4d}  max|err|={err.max():.3e}"
        f"  near-tie margin={np.abs(np.abs(y64 - np.rint(y64)) - 0.5).min():.2e}"
    )
    return n


def accuracy_phase(qualities=(10, 50, 90, 97), n_blocks=65536, seed=0):
    rng = np.random.default_rng(seed)
    total_bad = 0
    for q in qualities:
        cfg = CodecConfig(quality=q, static_tables=True)
        M64, b64 = exact_encode_operator_f64(cfg)
        digits, scales, c, qerr = int8_digit_split(M64)
        print(f"quality {q}: operator quant err {qerr:.2e}, "
              f"c in [{c.min()}, {c.max()}]")

        x = rng.integers(0, 256, (n_blocks, 64)).astype(np.uint8)
        y64 = x.astype(np.float64) @ M64 + b64

        y_i8 = np.asarray(int8_encode(jnp.asarray(x), digits, scales))
        total_bad += mismatches(y_i8, y64, "int8x3 digits")

        m0, m1, m2, bb = tables.fused_encode_operator_split(cfg)
        y_bf = np.asarray(
            transform.split_operand_matmul(
                jnp.asarray(x, jnp.float32),
                jnp.asarray(m0), jnp.asarray(m1), jnp.asarray(m2),
                jnp.asarray(bb),
            )
        )
        total_bad += 0 * mismatches(y_bf, y64, "bf16x3 (production)")

        # real-raster content exercises correlated (non-random) sign
        # patterns where worst-case error bounds actually bind
        from dct_tpu.utils import image_io
        from dct_tpu.ops import blocks as blk

        img = image_io.synthetic_image(512, 768, "photo", seed=q)
        px = np.asarray(blk.image_to_blocks(jnp.asarray(img), 8))
        y64r = px.astype(np.float64) @ M64 + b64
        y_i8r = np.asarray(int8_encode(jnp.asarray(px), digits, scales))
        total_bad += mismatches(y_i8r, y64r, "int8x3 on photo raster")
    return total_bad


def _packed_int8_operator(cfg: CodecConfig):
    """Digit split of the PACKED (128, 128) block-diagonal operator."""
    M64, _ = exact_encode_operator_f64(cfg)
    Mp = transform._block_diag(M64, 128 // M64.shape[0])
    # per-column c must be IDENTICAL across the block-diagonal copies so
    # the packed and unpacked forms share scales; _block_diag tiles the
    # same matrix, so columns repeat every n2 — recompute on the packed
    # matrix directly (colmax of a block-diag column == colmax of the
    # source column).
    return int8_digit_split(Mp)


def build_run_int8(cfg: CodecConfig, rows: int):
    """Jitted (rows, 128) u8 -> (rows, 128) i16 int8x3-digit encode kernel.

    Factored out of tpu_phase so benchmarks/mosaic_lowering_check.py can
    lower the exact same pallas_call for a TPU target without a chip."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from dct_tpu.ops import transform_pallas as tpk

    digits, scales, c, qerr = _packed_int8_operator(cfg)

    def int8_kernel(x_ref, d0_ref, d1_ref, d2_ref, s0_ref, s1_ref, s2_ref,
                    o_ref):
        x8 = (x_ref[:].astype(jnp.int32) - 128).astype(jnp.int8)
        y = None
        for d_ref, s_ref in ((d0_ref, s0_ref), (d1_ref, s1_ref),
                             (d2_ref, s2_ref)):
            p = jnp.dot(
                x8, d_ref[:], preferred_element_type=jnp.int32
            ).astype(jnp.float32) * s_ref[:]
            y = p if y is None else y + p
        o_ref[:] = (y + tpk._half(y)).astype(jnp.int16)

    T = tpk.TILE_ROWS
    mspec = pl.BlockSpec((128, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)

    @jax.jit
    def run_int8(x):
        return pl.pallas_call(
            int8_kernel,
            out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.int16),
            grid=(rows // T,),
            in_specs=[
                pl.BlockSpec((T, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                mspec, mspec, mspec, sspec, sspec, sspec,
            ],
            out_specs=pl.BlockSpec((T, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(x, *[jnp.asarray(d) for d in digits],
          *[jnp.asarray(s) for s in scales])

    return run_int8, qerr


def tpu_phase(cfg: CodecConfig, mpix: int = 33):
    """K-loop-delta throughput: production bf16x3 kernel vs int8x3 kernel,
    identical packed-io harness (bench.py measure_mfu rules)."""
    import functools
    import time

    from dct_tpu.ops import transform_pallas as tpk

    rows = mpix * 1024 * 1024 // 128
    rows = -(-rows // tpk.TILE_ROWS) * tpk.TILE_ROWS
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.integers(0, 256, (rows, 128)), jnp.uint8)

    run_int8, qerr = build_run_int8(cfg, rows)
    print(f"packed operator quant err {qerr:.2e}")

    # correctness probe vs the f64 operator on a small slice first
    small = np.asarray(px[:512])
    y_tpu = np.asarray(run_int8(px)[:512]).astype(np.float64)
    M64, b64 = exact_encode_operator_f64(cfg)
    Mp = transform._block_diag(M64, 128 // M64.shape[0])
    bp = np.tile(b64, 128 // M64.shape[0])
    y64 = small.astype(np.float64) @ Mp + bp

    def rha(v):
        return np.trunc(v + np.where(v >= 0, 0.5, -0.5))

    tie = np.abs(y64 - np.rint(y64)) == 0.5
    bad = int(((y_tpu != rha(y64)) & ~tie).sum())
    print(f"TPU int8 kernel vs f64 on 512 rows: {bad} mismatches "
          f"(excl {int(tie.sum())} ties)")

    def kloop(fn):
        def make_k(k):
            @jax.jit
            def run(p):
                def body(i, acc):
                    pi, _ = jax.lax.optimization_barrier((p, acc))
                    zz = fn(pi)
                    return acc + jnp.sum(zz[:1].astype(jnp.int32))
                return jax.lax.fori_loop(0, k, body, jnp.int32(0))
            return run

        def timed(f):
            float(f(px))
            t0 = time.perf_counter()
            for _ in range(4):
                float(f(px))
            return (time.perf_counter() - t0) / 4

        k1, k2 = 9, 129
        t1, t2 = timed(make_k(k1)), timed(make_k(k2))
        dt = (t2 - t1) / (k2 - k1)
        return rows * 128 / dt / 1e9

    bf16_fn = functools.partial(tpk.encode_blocks_pallas, cfg=cfg,
                                packed_io=True)
    g_bf16 = kloop(lambda p: bf16_fn(p))
    g_int8 = kloop(run_int8)
    print(f"bf16x3 production kernel: {g_bf16:.1f} Gpix/s")
    print(f"int8x3 digit kernel:      {g_int8:.1f} Gpix/s")
    print(f"speedup: {g_int8 / g_bf16:.2f}x")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=65536)
    ap.add_argument("--tpu", action="store_true",
                    help="run the TPU kernel timing phase")
    args = ap.parse_args()
    if args.tpu:
        if jax.default_backend() != "tpu":
            print("--tpu requires the TPU backend", file=sys.stderr)
            return 2
        tpu_phase(CodecConfig(quality=50, static_tables=True))
        return 0
    jax.config.update("jax_platforms", "cpu")
    bad = accuracy_phase(n_blocks=args.blocks)
    print(f"TOTAL int8-path mismatches (excl ties): {bad}")
    return 0 if bad == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
