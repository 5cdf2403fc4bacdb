"""Pallas TPU kernels for the fused codec front-end.

One grid cell processes a tile of macroblocks: u8 pixels are DMA'd
HBM->VMEM, widened on the VPU, hit the MXU against the fused Kronecker
operator (DCT + zigzag + quant folded — see dct_tpu/tables.py), get the
level-shift bias and optional per-block adaptive scale applied, and are
rounded straight to int16 zigzag coefficients. The decode kernel is the
mirror. This replaces the reference's per-block O(N^3) loops (dct.c:52-105)
and per-call temp mallocs (SURVEY.md B7) with a single streaming kernel.

MXU packing: two 64-coefficient blocks ride in each 128-lane row against a
block-diagonal 128x128 operator, so the systolic array runs at full width
(a bare (B,64)x(64,64) matmul would waste half the lanes).

ENCODE runs the split-operand form (transform.split_operand_matmul): u8
pixels are exact in bf16, the operator rides as three bf16 terms = 3
default-precision MXU passes with the same effective precision f32
HIGHEST rebuilds from 6 (0/65,536 mismatches vs the f64 oracle; 2.2x
measured). DECODE keeps f32 HIGHEST: its input coefficients reach +-2047
(12 bits), which bf16 cannot represent exactly, and the decode half is
already dominated by HBM, not the MXU.

Measured roofline (benchmarks/dct_experiments.py, clean harness): encode
kernel 186 Gpix/s = 73% of min(MXU 256, HBM 273) Gpix/s on one v5e chip;
the gap is VPU widen/round work executing serially with the MXU passes.

On CPU (tests) the kernels run in interpreter mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dct_tpu.config import CodecConfig
from dct_tpu import tables

# Rows per grid cell; each row = 2 blocks. 512 rows x 128 lanes x 4 B =
# 256 KB per f32 value — comfortable in VMEM with double buffering.
# Measured: 256 -> 512 helps (+28%% with the cheap rounding); 1024 hurts
# (fewer cells in flight reduces pipeline overlap).
# Rows of 128 packed pixels per grid cell. 2048 measured 1.42x faster
# than 512 on hardware (210 vs 148 Gpix/s, benchmarks/dct_experiments.py
# s3b_t2048 vs s3bit, K=9/129 same-session 2026-08-19): 8x fewer grid
# iterations pipeline better and the ~1 MB f32 intermediate still fits
# VMEM double-buffered. 4096 was also measured — see BASELINE.md.
TILE_ROWS = 2048

def _half(y):
    # round-half-away folded into the int conversion: f32->int converts
    # round-toward-zero, so trunc(y +- 0.5) needs no explicit trunc op.
    # The +-0.5 is built by BIT ops (sign(y) | 0.5) instead of a
    # compare+select — measured +7% on the whole encode kernel
    # (benchmarks/dct_experiments.py s3bit) and produces the same integer
    # for every input: the only sign difference vs `y >= 0` is y == -0.0,
    # where both 0.5 and -0.5 truncate to 0.
    yb = pltpu.bitcast(y, jnp.uint32)
    halfb = (yb & jnp.uint32(0x80000000)) | jnp.uint32(0x3F000000)
    return pltpu.bitcast(halfb, jnp.float32)



from dct_tpu.ops._mosaic import interpret as _interpret


from dct_tpu.ops import transform as _tf

# One source of truth for the packed-row operators and scale expansion:
# the staged XLA path (ops/transform.py) and these kernels must share the
# exact same constants and op sequences for byte-identity.
_packed_encode_operator_split = _tf.packed_encode_operator_split
_packed_decode_operator = _tf.packed_decode_operator
_packed_ac_mask = _tf.packed_ac_mask
_expand_block_scale = _tf.expand_block_scale


@functools.lru_cache(maxsize=None)
def _packed_encode_operator(cfg: CodecConfig, chroma: bool = False):
    """Unsplit block-diagonal (128, 128) f32 encode matrix + (1, 128) bias
    (benchmark/experiment use; production kernels take the split parts)."""
    m, b = tables.fused_encode_operator(cfg, chroma=chroma)
    copies = 128 // m.shape[0]
    return _tf._block_diag(np.asarray(m, np.float32), copies), np.tile(
        np.asarray(b, np.float32), copies
    )[None, :]


def _split_matmul(x_ref, m0_ref, m1_ref, m2_ref, b_ref):
    """Canonical split-operand matmul inside Mosaic: u8 widens through
    int32 (no direct u8->f32 cast) to f32 to bf16 — every step exact for
    values <= 255 — then transform.split_operand_matmul's exact op order
    (byte-identity contract with the XLA einsum path)."""
    from dct_tpu.ops import transform

    x = x_ref[:].astype(jnp.int32).astype(jnp.float32)
    return transform.split_operand_matmul(
        x, m0_ref[:], m1_ref[:], m2_ref[:], b_ref[:]
    )


def _encode_kernel(x_ref, m0_ref, m1_ref, m2_ref, b_ref, o_ref):
    y = _split_matmul(x_ref, m0_ref, m1_ref, m2_ref, b_ref)
    o_ref[:] = (y + _half(y)).astype(o_ref.dtype)


def _encode_kernel_adaptive(
    x_ref, m0_ref, m1_ref, m2_ref, b_ref, s_ref, mask_ref, o_ref, *, n2=64
):
    y = _split_matmul(x_ref, m0_ref, m1_ref, m2_ref, b_ref)
    # s_ref: (TILE_ROWS, bpr) per-block RECIPROCAL adaptive scale, computed
    # once in XLA so every path shares the exact division result; applied
    # as one multiply + select (no add/mul chain a compiler could contract
    # into an FMA) — the XLA/Mosaic byte-identity contract depends on it.
    # Expand (TILE_ROWS, bpr) -> (TILE_ROWS, 128) by block-select:
    # pltpu.repeat TILES (abab...), it does not element-repeat.
    r = _expand_block_scale(s_ref[:], n2)
    y = jnp.where(mask_ref[:] != 0, y * r, y)
    o_ref[:] = (y + _half(y)).astype(o_ref.dtype)


def _decode_kernel(z_ref, m_ref, o_ref):
    z = z_ref[:].astype(jnp.float32)
    y = jnp.dot(z, m_ref[:], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST) + 128.0
    # Mosaic lacks f32->u8; round-trip through int32 (exact for [0,255]).
    # clip-then-truncate == round_half_away-then-clip on this range.
    o_ref[:] = jnp.clip(y + _half(y), 0.0, 255.0).astype(jnp.int32).astype(jnp.uint8)


def _decode_kernel_adaptive(z_ref, m_ref, s_ref, mask_ref, o_ref, *, n2=64):
    z = z_ref[:].astype(jnp.float32)
    s = _expand_block_scale(s_ref[:], n2)
    z = jnp.where(mask_ref[:] != 0, z * s, z)
    y = jnp.dot(z, m_ref[:], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST) + 128.0
    # Mosaic lacks f32->u8; round-trip through int32 (exact for [0,255]).
    # clip-then-truncate == round_half_away-then-clip on this range.
    o_ref[:] = jnp.clip(y + _half(y), 0.0, 255.0).astype(jnp.int32).astype(jnp.uint8)


def _pack_rows(x: jax.Array) -> tuple[jax.Array, int, int]:
    """(B, n2) -> (rows_padded, 128) with 128 // n2 blocks per row and the
    row count padded to a TILE_ROWS multiple.

    Returns (packed, original B, padded rows)."""
    B, n2 = x.shape
    bpr = 128 // n2
    rows = -(-B // bpr)
    rows_padded = -(-rows // TILE_ROWS) * TILE_ROWS
    pad = rows_padded * bpr - B
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return x.reshape(rows_padded, 128), B, rows_padded


def encode_blocks_pallas(
    pixels_flat: jax.Array,
    cfg: CodecConfig,
    adaptive_scale: jax.Array | None = None,
    chroma: bool = False,
    packed_io: bool = False,
    out_dtype=jnp.int16,
) -> jax.Array:
    """Fused encode on TPU: (B, n^2) u8 -> (B, n^2) int zigzag coeffs.

    Semantics identical to ops.transform.encode_blocks (tested equal);
    adaptive_scale is the per-block quantize-divisor scale in [1.0, 1.9].

    packed_io: take/return the packed (rows, 128) layout directly (rows
    must be a TILE_ROWS multiple). XLA inserts a layout-changing COPY for
    i16 minor-dim-64 outputs, which the production fused path never pays —
    benchmarks measuring the KERNEL (bench.py's mfu) use this to skip it.

    out_dtype: the kernel's store dtype (same integers either way). The
    production staged consumer (codec._fused_encode) asks for int32: it
    widens to int32 anyway, and an int16 (B, 64) intermediate pays BOTH
    the i16 minor-dim-64 layout copy AND a separate convert — emitting
    int32 from the kernel epilogue replaces 3 output passes over HBM with
    one (measured: benchmarks/wrapper_layout.py).
    """
    n2 = cfg.n2
    if n2 not in (4, 16, 64):
        # Kernel packing rides 128 // n2 whole blocks per 128-lane row, so
        # n2 must divide 128 (N in {2, 4, 8}); other block sizes take the
        # XLA einsum path.
        from dct_tpu.ops import transform

        out = transform.encode_blocks(
            pixels_flat, cfg, adaptive_scale=adaptive_scale, chroma=chroma
        )
        return out.astype(out_dtype)
    bpr = 128 // n2
    if packed_io:
        if cfg.adaptive or pixels_flat.shape[-1] != 128:
            raise ValueError("packed_io: non-adaptive (rows, 128) only")

    m0, m1, m2, b2 = _packed_encode_operator_split(cfg, chroma=chroma)
    if packed_io:
        x, B, rows = pixels_flat, -1, pixels_flat.shape[0]
    else:
        x, B, rows = _pack_rows(pixels_flat)
    grid = (rows // TILE_ROWS,)
    mspec = pl.BlockSpec((128, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)
    kwargs = dict(
        out_shape=jax.ShapeDtypeStruct((rows, 128), out_dtype),
        grid=grid,
        out_specs=pl.BlockSpec(
            (TILE_ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=_interpret(),
    )
    mats = (jnp.asarray(m0), jnp.asarray(m1), jnp.asarray(m2))
    if cfg.adaptive:
        if adaptive_scale is None:
            raise ValueError("adaptive encode requires adaptive_scale")
        # reciprocal in XLA (shared rounding with the einsum path)
        s = 1.0 / adaptive_scale.astype(jnp.float32)
        pad = rows * bpr - s.shape[0]
        if pad:
            s = jnp.pad(s, (0, pad), constant_values=1.0)
        s = s.reshape(rows, bpr)
        out = pl.pallas_call(
            functools.partial(_encode_kernel_adaptive, n2=n2),
            in_specs=[
                pl.BlockSpec((TILE_ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
                mspec, mspec, mspec,
                pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_ROWS, bpr), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            **kwargs,
        )(x, *mats, jnp.asarray(b2), s, jnp.asarray(_packed_ac_mask(n2)))
    else:
        out = pl.pallas_call(
            _encode_kernel,
            in_specs=[
                pl.BlockSpec((TILE_ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
                mspec, mspec, mspec,
                pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            **kwargs,
        )(x, *mats, jnp.asarray(b2))
    if packed_io:
        return out
    return out.reshape(rows * bpr, n2)[:B]


def decode_blocks_pallas(
    zz_coeffs: jax.Array,
    cfg: CodecConfig,
    adaptive_scale: jax.Array | None = None,
    chroma: bool = False,
) -> jax.Array:
    """Fused decode on TPU: (B, n^2) int -> (B, n^2) u8 pixels."""
    n2 = cfg.n2
    if n2 not in (4, 16, 64):
        from dct_tpu.ops import transform

        return transform.decode_blocks(
            zz_coeffs, cfg, adaptive_scale=adaptive_scale, chroma=chroma
        )
    bpr = 128 // n2

    m2, _ = _packed_decode_operator(cfg, chroma=chroma)
    z, B, rows = _pack_rows(zz_coeffs.astype(jnp.int16))
    grid = (rows // TILE_ROWS,)
    kwargs = dict(
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.uint8),
        grid=grid,
        out_specs=pl.BlockSpec(
            (TILE_ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * 128 * 128,
            bytes_accessed=rows * 128 * 3 + 128 * 128 * 4,
            transcendentals=0,
        ),
    )
    if cfg.adaptive:
        if adaptive_scale is None:
            raise ValueError("adaptive decode requires adaptive_scale")
        s = adaptive_scale.astype(jnp.float32)
        pad = rows * bpr - s.shape[0]
        if pad:
            s = jnp.pad(s, (0, pad), constant_values=1.0)
        s = s.reshape(rows, bpr)
        out = pl.pallas_call(
            functools.partial(_decode_kernel_adaptive, n2=n2),
            in_specs=[
                pl.BlockSpec((TILE_ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((128, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_ROWS, bpr), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            **kwargs,
        )(z, jnp.asarray(m2), s, jnp.asarray(_packed_ac_mask(n2)))
    else:
        out = pl.pallas_call(
            _decode_kernel,
            in_specs=[
                pl.BlockSpec((TILE_ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((128, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            **kwargs,
        )(z, jnp.asarray(m2))
    return out.reshape(rows * bpr, n2)[:B]
