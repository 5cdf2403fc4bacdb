"""The fused encode stripe kernel: u8 pixels -> packed bitstream units, one
Pallas kernel, nothing between touches HBM.

Replaces the XLA chain transform -> RLE -> chunks -> pack, whose
intermediates ((B,64) coeff/mask/run planes and the (S,C,3) chunk arrays)
cost ~10 GB of HBM traffic per 16.7 Mpix batch. Per grid cell (= one
stripe, laid out as R rows of 2 blocks x 64 coefficients across the 128
lanes):

  1. transform: one (R,128)@(128,128) MXU matmul against the block-diagonal
     fused Kronecker operator (level shift + DCT + zigzag + quant folded;
     dct_tpu/tables.py), optional per-block adaptive scale, round to int.
  2. RLE (ops/rle.py semantics, reference entropy.c:216-256): segmented
     prefix scans along the two 64-lane block segments via log-step
     pltpu.roll + position masks (Mosaic has no cumsum/cummax primitive).
  3. categories, canonical codes (16 selects against SMEM tables), JPEG
     extra bits, fixed 8-bit runs -> three chunk planes (value, length).
  4. stream bit offsets: lane-segment prefix + per-row totals + sublane
     log-roll prefix across rows — all in registers/VMEM.
  5. pack: per row, the 384 chunks span at most 312 units (2 blocks x
     worst-case 2496 bits); a dense one-hot multiply-reduce accumulates
     them into the stripe's unit buffer at the row's 128-aligned base
     (ops/pack_pallas.py technique; Mosaic dynamic lane offsets must be
     128-multiples, the slack lives inside the 512-unit span).

Bitstreams are byte-identical to the XLA pipeline (tested), so CPU tests
and TPU production produce the same containers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dct_tpu.config import CodecConfig
from dct_tpu.ops.bitstream import PackedStripes
from dct_tpu.ops import transform_pallas as tpk

ROW_SPAN = 512  # units: 312 worst-case row extent + 127 align slack, padded


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_half_away(x):
    return jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5)


def _fused_kernel(
    len_ref, code_ref, px_ref, m_ref, b_ref, scale_ref,
    units_ref, bits_ref, scr_k, scr_w, scr_base,
    *, n_live_blocks: int, adaptive: bool, run_bits: int,
):
    """One grid cell = one stripe. See module docstring.

    len_ref/code_ref: (1, 1, 16) i32 SMEM — canonical category table
    px_ref:    (1, R, 128) u8 — 2 blocks per row
    m_ref:     (128, 128) f32; b_ref: (1, 128) f32
    scale_ref: (1, R, 2) f32 — adaptive quantize-divisor scale (ones if off)
    units_ref: (1, 1, U_pad) i32; bits_ref: (1, 1, 1) i32 SMEM
    scr_k:     (3R, 128) i32 — chunk unit keys, plane-major [A|B|C]
    scr_w:     (6R, 128) f32 — hi/lo window halves [hiA|loA|hiB|loB|hiC|loC]
    scr_base:  (R, 1) i32 — per-row 128-aligned output unit base
    """
    R = px_ref.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
    pos = lane & 63
    half = lane >> 6
    ridx = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0)
    ridx1 = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
    block_idx = 2 * ridx + half
    live = block_idx < n_live_blocks

    # ---- 1. transform -----------------------------------------------------
    x = px_ref[0].astype(jnp.int32).astype(jnp.float32)
    y = jnp.dot(x, m_ref[:], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST) + b_ref[:]
    if adaptive:
        s = pltpu.repeat(scale_ref[0], 64, axis=1)  # (R, 128)
        recip = pl.reciprocal(s, approx=False)
        ac = (pos != 0).astype(jnp.float32)
        y = y * (1.0 + ac * (recip - 1.0))
    zz = _round_half_away(y).astype(jnp.int32)

    # ---- 2. RLE (segmented scans) ----------------------------------------
    mask = (zz != 0) & live
    m1 = jnp.where(mask, pos, -1)
    for step in (1, 2, 4, 8, 16, 32):
        m1 = jnp.maximum(
            m1, jnp.where(pos >= step, pltpu.roll(m1, step, axis=1), -1)
        )
    pnz = jnp.where(pos >= 1, pltpu.roll(m1, 1, axis=1), -1)
    is_sym = (mask | (pos == 63)) & live
    term = (pos == 63) & jnp.logical_not(mask) & live
    run = jnp.where(is_sym, pos - pnz - 1 + term.astype(jnp.int32), 0)
    v = jnp.where(is_sym, zz, 0)

    # ---- 3. categories / codes / extras ----------------------------------
    a = jnp.abs(v)
    cat = jnp.zeros_like(a)
    for c in range(15):
        cat = cat + (a >= (1 << c)).astype(jnp.int32)
    la = jnp.zeros_like(cat)
    ca = jnp.zeros_like(cat)
    for c in range(16):
        sel = cat == c
        la = la + jnp.where(sel, len_ref[0, 0, c], 0)
        ca = ca + jnp.where(sel, code_ref[0, 0, c], 0)
    la = jnp.where(is_sym, la, 0)
    adj = jnp.where(v < 0, v + (1 << cat) - 1, v)
    bv = adj & ((1 << cat) - 1)
    lb = jnp.where(is_sym, cat, 0)
    lc = jnp.where(is_sym, run_bits, 0)
    t3 = la + lb + lc

    # ---- 4. stream bit offsets --------------------------------------------
    pi = t3
    for step in (1, 2, 4, 8, 16, 32):
        pi = pi + jnp.where(pos >= step, pltpu.roll(pi, step, axis=1), 0)
    pex = pi - t3  # exclusive within 64-segment
    at63 = pos == 63
    bt0 = jnp.max(jnp.where(at63 & (half == 0), pi, 0), axis=1, keepdims=True)
    bt1 = jnp.max(jnp.where(at63 & (half == 1), pi, 0), axis=1, keepdims=True)
    rt = bt0 + bt1  # (R, 1) bits per row
    rp = rt
    step = 1
    while step < R:
        rp = rp + jnp.where(ridx1 >= step, pltpu.roll(rp, step, axis=0), 0)
        step *= 2
    rp_ex = rp - rt  # exclusive bit base of row's first block
    bits_ref[0, 0, 0] = jnp.max(rp)

    block_base = jnp.where(half == 0, rp_ex, rp_ex + bt0)  # (R, 128) bcast
    off_a = block_base + pex
    off_b = off_a + la
    off_c = off_b + lb

    # ---- windows per chunk plane ------------------------------------------
    def plane(off, val, ln, idx):
        i0 = off >> 4
        sh = off & 15
        shift = jnp.clip(32 - ln - sh, 0, 31).astype(jnp.uint32)
        w = jnp.where(ln > 0, val.astype(jnp.uint32) << shift, jnp.uint32(0))
        scr_k[pl.ds(idx * R, R), :] = i0
        # (Mosaic lacks u32->f32; both halves are < 2^16 so int32 is exact)
        scr_w[pl.ds(2 * idx * R, R), :] = (
            (w >> 16).astype(jnp.int32).astype(jnp.float32)
        )
        scr_w[pl.ds((2 * idx + 1) * R, R), :] = (
            (w & 0xFFFF).astype(jnp.int32).astype(jnp.float32)
        )

    plane(off_a, ca, la, 0)
    plane(off_b, bv, lb, 1)
    plane(off_c, run, lc, 2)
    scr_base[:] = ((rp_ex >> 4) >> 7) << 7  # aligned unit base per row

    # ---- 5. pack -----------------------------------------------------------
    units_ref[:] = jnp.zeros_like(units_ref)
    u = jax.lax.broadcasted_iota(jnp.int32, (128, ROW_SPAN), 1)

    def body(r, _):
        base = scr_base[r, 0]
        ob = pl.multiple_of(base, 128)
        h = jnp.zeros((1, ROW_SPAN), jnp.float32)
        for p in range(3):
            k = (scr_k[pl.ds(p * R + r, 1), :] - base).reshape(128, 1)
            whi = scr_w[pl.ds(2 * p * R + r, 1), :].reshape(128, 1)
            wlo = scr_w[pl.ds((2 * p + 1) * R + r, 1), :].reshape(128, 1)
            contrib = jnp.where(k == u, whi, 0.0) + jnp.where(k + 1 == u, wlo, 0.0)
            h = h + jnp.sum(contrib, axis=0, keepdims=True)
        cur = units_ref[0, :, pl.ds(ob, ROW_SPAN)]
        units_ref[0, :, pl.ds(ob, ROW_SPAN)] = cur + h.astype(jnp.int32)
        return 0

    jax.lax.fori_loop(0, R, body, 0)


def encode_stripes_fused(
    pixels: jax.Array,
    cfg: CodecConfig,
    n_stripes: int,
    cat_lengths: jax.Array,
    cat_codes: jax.Array,
    adaptive_scale: jax.Array | None = None,
    chroma: bool = False,
) -> PackedStripes:
    """(NB, 64) u8 blocks -> packed stripes, entirely on device.

    Semantically identical (byte-identical streams) to
    rle_encode_positional + symbol_chunks + pack_chunks, fused with the
    transform. Requires block_size 8 and category mode.
    """
    from dct_tpu.ops import bitstream as bs

    nb, n2 = pixels.shape
    if n2 != 64:
        raise ValueError("fused encode kernel requires 8x8 blocks")
    bps = nb // n_stripes  # blocks per stripe

    rows_live = -(-bps // 2)
    R = -(-rows_live // 8) * 8
    px = pixels.reshape(n_stripes, bps, 64)
    pad_blocks = 2 * R - bps
    if pad_blocks:
        px = jnp.pad(px, ((0, 0), (0, pad_blocks), (0, 0)))
    px = px.reshape(n_stripes, R, 128)

    if cfg.adaptive:
        if adaptive_scale is None:
            raise ValueError("adaptive fused encode requires adaptive_scale")
        s = adaptive_scale.reshape(n_stripes, bps)
        if pad_blocks:
            s = jnp.pad(s, ((0, 0), (0, pad_blocks)), constant_values=1.0)
        s = s.reshape(n_stripes, R, 2).astype(jnp.float32)
    else:
        s = jnp.ones((n_stripes, R, 2), jnp.float32)

    m2, b2 = tpk._packed_encode_operator(cfg, chroma=chroma)
    units_capacity = bps * bs.UNITS_PER_BLOCK_WORST
    U_pad = -(-(units_capacity + ROW_SPAN) // 128) * 128

    lens3 = cat_lengths.astype(jnp.int32).reshape(1, 1, -1)
    codes3 = cat_codes.astype(jnp.int32).reshape(1, 1, -1)

    kernel = functools.partial(
        _fused_kernel,
        n_live_blocks=bps,
        adaptive=cfg.adaptive,
        run_bits=8,
    )
    units, bits = pl.pallas_call(
        kernel,
        grid=(n_stripes,),
        in_specs=[
            pl.BlockSpec((1, 1, 16), lambda i: (0, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 16), lambda i: (0, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, R, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, 2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, U_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_stripes, 1, U_pad), jnp.int32),
            jax.ShapeDtypeStruct((n_stripes, 1, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((3 * R, 128), jnp.int32),
            pltpu.VMEM((6 * R, 128), jnp.float32),
            pltpu.VMEM((R, 1), jnp.int32),
        ],
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=n_stripes * (2 * R * 128 * 128 * 6 + R * 3 * 128 * ROW_SPAN * 4),
            bytes_accessed=n_stripes * (R * 128 + U_pad * 4),
            transcendentals=0,
        ),
    )(lens3, codes3, px, jnp.asarray(m2), jnp.asarray(b2), s)
    return PackedStripes(
        units=units[:, 0, :units_capacity], bit_lengths=bits[:, 0, 0]
    )
