"""The fused encode stripe kernel (ops/fused_encode_pallas.py) must be
byte-identical to the staged XLA pipeline (transform -> positional RLE ->
symbol_chunks -> pack_chunks) for every config it claims to handle.

Runs the Pallas kernel in interpret mode on CPU, so the semantics of the
fused RLE scans / window-digit math / one-hot MXU pack are validated on
every test run, not only on TPU hardware.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np
import pytest

from dct_tpu.config import CodecConfig
from dct_tpu.models import codec
from dct_tpu.ops import bitstream as bs
from dct_tpu.ops import huffman as hf
from dct_tpu.ops import quant, rle, transform
from dct_tpu.ops.fused_encode_pallas import encode_stripes_fused


def _staged(pixels, cfg, n_stripes, lengths, codes, scale,
            run_lengths=None, run_codes=None):
    zz = transform.encode_blocks(pixels, cfg, adaptive_scale=scale)
    symbols = rle.rle_encode_positional(zz)
    return codec.encode_pack(
        symbols, cfg, n_stripes, lengths, codes, run_lengths, run_codes
    )


def _table():
    t = hf.default_category_table()
    return (
        jnp.asarray(t.lengths, jnp.int32),
        jnp.asarray(t.codes.astype(np.int64), jnp.uint32),
    )


def _run_table():
    t = hf.default_run_table()
    return (
        jnp.asarray(t.lengths, jnp.int32),
        jnp.asarray(t.codes.astype(np.int64), jnp.uint32),
    )


@pytest.mark.parametrize("bps", [8, 9])
@pytest.mark.parametrize("adaptive", [False, True])
def test_fused_coded_runs_matches_staged(bps, adaptive):
    cfg = CodecConfig(
        quality=50, adaptive=adaptive, static_tables=True, coded_runs=True
    )
    n_stripes = 3
    nb = n_stripes * bps
    rng = np.random.default_rng(nb + adaptive)
    base = rng.integers(40, 216, (nb, 1)).astype(np.float64)
    amp = (np.arange(nb) % 9).reshape(nb, 1) * 7.0
    px = np.clip(base + rng.normal(0, 1, (nb, 64)) * amp, 0, 255)
    pixels = jnp.asarray(px.astype(np.uint8))

    scale = None
    if adaptive:
        var = quant.block_variance_flat(transform.level_shift(pixels))
        scale = quant.scale_from_variance_code(quant.variance_code(var))

    lengths, codes = _table()
    rl, rc = _run_table()
    want = _staged(pixels, cfg, n_stripes, lengths, codes, scale, rl, rc)
    got = encode_stripes_fused(
        pixels, cfg, n_stripes, lengths, codes,
        adaptive_scale=scale, run_lengths=rl, run_codes=rc,
    )
    np.testing.assert_array_equal(
        np.asarray(got.bit_lengths), np.asarray(want.bit_lengths)
    )
    np.testing.assert_array_equal(np.asarray(got.units), np.asarray(want.units))


@pytest.mark.parametrize("bps", [8, 9, 30])  # even + odd blocks per stripe
@pytest.mark.parametrize("adaptive", [False, True])
@pytest.mark.parametrize("quality", [10, 50, 95])
def test_fused_matches_staged(bps, adaptive, quality):
    cfg = CodecConfig(quality=quality, adaptive=adaptive, static_tables=True)
    n_stripes = 3
    nb = n_stripes * bps
    rng = np.random.default_rng(nb * quality + adaptive)
    # Controlled per-block variance: uniform-random u8 blocks all saturate
    # the variance clamp (var >> 1000 -> scale exactly 1.0), which made the
    # adaptive path vacuous. Mix amplitudes so scales actually differ.
    base = rng.integers(40, 216, (nb, 1)).astype(np.float64)
    amp = (np.arange(nb) % 9).reshape(nb, 1) * 7.0  # per-block detail level
    px = np.clip(base + rng.normal(0, 1, (nb, 64)) * amp, 0, 255)
    pixels = jnp.asarray(px.astype(np.uint8))

    scale = None
    if adaptive:
        var = quant.block_variance_flat(transform.level_shift(pixels))
        scale = quant.scale_from_variance_code(quant.variance_code(var))

    lengths, codes = _table()
    want = _staged(pixels, cfg, n_stripes, lengths, codes, scale)
    got = encode_stripes_fused(
        pixels, cfg, n_stripes, lengths, codes, adaptive_scale=scale
    )
    np.testing.assert_array_equal(
        np.asarray(got.bit_lengths), np.asarray(want.bit_lengths)
    )
    np.testing.assert_array_equal(np.asarray(got.units), np.asarray(want.units))


@pytest.mark.parametrize("bps", [8, 9, 30])  # even + odd blocks per stripe
@pytest.mark.parametrize("coded_runs", [False, True])
def test_fused_dc_prediction_matches_staged(bps, coded_runs):
    """In-kernel stripe-local DC DPCM (lane-select + one-row sublane roll)
    must reproduce models/codec.dc_predict bit-for-bit."""
    cfg = CodecConfig(
        quality=50, static_tables=True, dc_prediction=True,
        coded_runs=coded_runs,
    )
    n_stripes = 3
    nb = n_stripes * bps
    rng = np.random.default_rng(1000 + nb + coded_runs)
    base = rng.integers(40, 216, (nb, 1)).astype(np.float64)
    amp = (np.arange(nb) % 9).reshape(nb, 1) * 7.0
    px = np.clip(base + rng.normal(0, 1, (nb, 64)) * amp, 0, 255)
    pixels = jnp.asarray(px.astype(np.uint8))

    lengths, codes = _table()
    rl, rc = _run_table() if coded_runs else (None, None)

    zz = transform.encode_blocks(pixels, cfg, adaptive_scale=None)
    zz = codec.dc_predict(zz, n_stripes)
    symbols = rle.rle_encode_positional(zz)
    want = codec.encode_pack(symbols, cfg, n_stripes, lengths, codes, rl, rc)
    got = encode_stripes_fused(
        pixels, cfg, n_stripes, lengths, codes,
        run_lengths=rl, run_codes=rc,
    )
    np.testing.assert_array_equal(
        np.asarray(got.bit_lengths), np.asarray(want.bit_lengths)
    )
    np.testing.assert_array_equal(np.asarray(got.units), np.asarray(want.units))


def test_fused_extreme_pixels():
    """All-extreme blocks drive max-magnitude coefficients (largest
    categories / longest windows) plus all-zero AC tails (terminal-zero
    symbols) through the window-digit path."""
    cfg = CodecConfig(quality=100, static_tables=True)  # q100: divisor 1
    checker = (
        (np.indices((8, 8)).sum(0) & 1) * 255
    ).astype(np.uint8).reshape(1, 64)
    flat0 = np.zeros((1, 64), np.uint8)
    flat255 = np.full((1, 64), 255, np.uint8)
    pixels = jnp.asarray(np.concatenate([checker, flat0, flat255, checker]))

    lengths, codes = _table()
    want = _staged(pixels, cfg, 2, lengths, codes, None)
    got = encode_stripes_fused(pixels, cfg, 2, lengths, codes)
    np.testing.assert_array_equal(
        np.asarray(got.bit_lengths), np.asarray(want.bit_lengths)
    )
    np.testing.assert_array_equal(np.asarray(got.units), np.asarray(want.units))


@pytest.mark.parametrize("block", [4, 8, 16])
@pytest.mark.parametrize(
    "adaptive,dc,runs,quality",
    [(False, False, False, 50), (True, True, True, 30), (False, True, False, 90)],
)
def test_fused_block_sizes_match_staged(block, adaptive, dc, runs, quality):
    """Round 2 widened the fused kernel to 4x4 (8 blocks per 128-lane row)
    and 16x16 (one block per row PAIR, quadrant matmuls + cross-row RLE):
    every feature combination must stay byte-identical to the staged
    pipeline at every block size (VERDICT.md next-round item 5)."""
    n2 = block * block
    runs = runs and block <= 8  # run-code alphabet covers runs 0..64 only
    cfg = CodecConfig(
        quality=quality, block_size=block, adaptive=adaptive,
        static_tables=True, coded_runs=runs, dc_prediction=dc,
    )
    n_stripes, bps = 3, 17
    nb = n_stripes * bps
    rng = np.random.default_rng(block * 100 + quality)
    px = jnp.asarray(rng.integers(0, 256, (nb, n2)).astype(np.uint8))
    scale = None
    if adaptive:
        var = quant.block_variance_flat(transform.level_shift(px))
        scale = quant.scale_from_variance_code(quant.variance_code(var))
    t = hf.default_category_table(quality)
    lengths = jnp.asarray(t.lengths, jnp.int32)
    codes = jnp.asarray(t.codes.astype(np.int64), jnp.uint32)
    rl = rc = None
    if runs:
        rt = hf.default_run_table(quality)
        rl = jnp.asarray(rt.lengths, jnp.int32)
        rc = jnp.asarray(rt.codes.astype(np.int64), jnp.uint32)
    zz = transform.encode_blocks(px, cfg, adaptive_scale=scale)
    if dc:
        zz = codec.dc_predict(zz, n_stripes)
    sym = rle.rle_encode_positional(zz)
    want = codec.encode_pack(sym, cfg, n_stripes, lengths, codes, rl, rc)
    got = encode_stripes_fused(
        px, cfg, n_stripes, lengths, codes,
        adaptive_scale=scale, run_lengths=rl, run_codes=rc,
    )
    assert np.array_equal(
        np.asarray(got.bit_lengths), np.asarray(want.bit_lengths)
    )
    w = np.asarray(want.units)
    g = np.asarray(got.units)
    assert np.array_equal(g[:, : w.shape[1]], w)
    # stray nonzero units beyond the staged packer's width would be
    # invisible to the truncated comparison (ADVICE r2): require zeros
    assert not g[:, w.shape[1]:].any()


@pytest.mark.parametrize("mode", ["none", "direct"])
@pytest.mark.parametrize("full", [False, True])
def test_fused_direct_and_none_modes_match_staged(mode, full):
    """Round 2 extended the fused kernel beyond category entropy: raw
    16-bit "none" mode and per-value "direct" mode (512-entry alphabet
    from production tables — 511 values + ESC, dtab bound 640 — gathered
    by an in-kernel one-hot MXU contraction, ESC appending the raw
    16-bit value). Byte-identity vs the staged pipeline.

    full=True adds adaptive + dc_prediction + coded_runs on top: the
    round-3 Mosaic lowering sweep caught the coded-runs branch reading a
    category-mode-only local (`cat`) when combined with direct/none —
    a combination CodecConfig permits but no test exercised."""
    use_h = mode != "none"
    cfg = CodecConfig(
        quality=40, use_huffman=use_h,
        huffman_mode=mode if use_h else "category",
        adaptive=full, dc_prediction=full, coded_runs=full,
        static_tables=False,
    )
    n_stripes, bps = 3, 17
    nb = n_stripes * bps
    rng = np.random.default_rng(99)
    px = jnp.asarray(rng.integers(0, 256, (nb, 64)).astype(np.uint8))
    scale = None
    if full:
        var = quant.block_variance_flat(transform.level_shift(px))
        scale = quant.scale_from_variance_code(quant.variance_code(var))
    zz = transform.encode_blocks(px, cfg, adaptive_scale=scale)
    if full:
        zz = codec.dc_predict(zz, n_stripes)
    sym = rle.rle_encode_positional(zz)
    vmin = 0
    if mode == "direct":
        vals = np.asarray(sym.values)[np.asarray(sym.is_sym)]
        hist = np.ones(513, np.int64)
        for v in vals:
            idx = v - codec.DIRECT_VMIN
            if 0 <= idx < 511:
                hist[idx] += 3
        hist[511] += 5  # ESC
        t = hf.CanonicalTable.from_frequencies(hist)
        lengths = jnp.asarray(t.lengths, jnp.int32)
        codes = jnp.asarray(t.codes.astype(np.int64), jnp.uint32)
        vmin = codec.DIRECT_VMIN
    else:
        lengths = jnp.zeros(1, jnp.int32)
        codes = jnp.zeros(1, jnp.uint32)
    rl = rc = None
    if full:
        rt = hf.default_run_table(cfg.quality)
        rl = jnp.asarray(rt.lengths, jnp.int32)
        rc = jnp.asarray(rt.codes.astype(np.int64), jnp.uint32)
    want = codec.encode_pack(sym, cfg, n_stripes, lengths, codes, rl, rc)
    got = encode_stripes_fused(
        px, cfg, n_stripes, lengths, codes, vmin=vmin,
        adaptive_scale=scale, run_lengths=rl, run_codes=rc,
    )
    w = np.asarray(want.units)
    assert np.array_equal(
        np.asarray(got.bit_lengths), np.asarray(want.bit_lengths)
    )
    g = np.asarray(got.units)
    assert np.array_equal(g[:, : w.shape[1]], w)
    assert not g[:, w.shape[1]:].any()


def test_merge_tree_unit():
    """_compact_rows + k levels of _merge_rows (the round-3 pack-tier merge
    tree): each group-leader row must carry the concatenation of its
    group's live symbols in stable row-major order, and zeros beyond the
    group live count, for adversarial live-count patterns including the
    exact-128 edges (l0 = 128 -> the 7-bit lane shift wraps to identity,
    which is only benign because the partner contributes zero lanes)."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from dct_tpu.ops import fused_encode_pallas as fep

    R = 8
    patterns = [
        [16] * 8,
        [128, 0, 0, 0, 0, 0, 0, 0],      # pair merge with l0 = 128
        [64, 64, 0, 0, 32, 32, 32, 32],  # quad groups at exactly 128
        [0, 0, 0, 0, 0, 0, 0, 128],
        [1, 127, 0, 0, 13, 5, 99, 11],
        [0] * 8,
        [17, 3, 0, 42, 8, 8, 8, 8],      # oct group at 86
    ]

    def kernel(alive_ref, out_ref, *, k):
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
        alive = alive_ref[:] > 0
        livecnt = jnp.sum(alive.astype(jnp.int32), axis=1, keepdims=True)
        ridx = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0)
        val = 1000 * ridx + lane + 1  # +1: zero never a live payload
        (c,) = fep._compact_rows([jnp.where(alive, val, 0)], alive, lane)
        planes = [jnp.where(lane < livecnt, c, 0)]
        live_m = [livecnt]
        for stride in (1, 2, 4):
            live_m.append(
                live_m[-1] + pltpu.roll(live_m[-1], R - stride, axis=0)
            )
        for lvl in range(k):
            planes = fep._merge_rows(planes, live_m[lvl], lane, 1 << lvl)
        out_ref[:] = planes[0]

    rng = np.random.default_rng(42)
    for pat in patterns:
        alive = np.zeros((R, 128), np.int32)
        lanes_by_row = []
        for r, c in enumerate(pat):
            sel = np.sort(rng.choice(128, size=c, replace=False))
            alive[r, sel] = 1
            lanes_by_row.append(sel)
        for k in (1, 2, 3):
            group = 1 << k
            if max(
                sum(pat[g : g + group]) for g in range(0, R, group)
            ) > 128:
                continue
            out = pl.pallas_call(
                functools.partial(kernel, k=k),
                out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
                interpret=True,
            )(jnp.asarray(alive))
            out = np.asarray(out)
            for g in range(0, R, group):
                want = np.concatenate(
                    [1000 * r + lanes_by_row[r] + 1
                     for r in range(g, g + group)]
                ) if any(pat[g : g + group]) else np.zeros(0, np.int64)
                total = len(want)
                np.testing.assert_array_equal(
                    out[g, :total], want,
                    err_msg=f"pat={pat} k={k} leader={g}",
                )
                assert not out[g, total:].any(), f"pat={pat} k={k} g={g}"


@pytest.mark.parametrize(
    "tier",
    ["quad", "pair4", "pair", "pair_wide", "mid4", "mid", "mid_wide",
     "safe"],
)
@pytest.mark.parametrize("quality", [50, 95])
def test_cold_tiers_match_staged(monkeypatch, quality, tier):
    """Direct byte-identity coverage of the ladder's COLD rungs.

    Tier choice is data-dependent inside the kernel, and ordinary
    content always satisfies a cheaper rung first. _LADDER_START drops
    the cheaper rungs at trace time; every rung is correct for any
    content its own condition admits and eligibility is monotone down
    the ladder, so this pins real execution of every rung below the
    default-content one, including the round-5 acc4 rungs (pair4/mid4
    and quad-after-quad4)."""
    from dct_tpu.ops import fused_encode_pallas as fep

    monkeypatch.setattr(fep, "_LADDER_START", fep._TIER_INDEX[tier])
    cfg = CodecConfig(quality=quality, static_tables=True)
    n_stripes, bps = 3, 30
    nb = n_stripes * bps
    rng = np.random.default_rng(7 * quality)
    base = rng.integers(40, 216, (nb, 1)).astype(np.float64)
    amp = (np.arange(nb) % 9).reshape(nb, 1) * 9.0
    px = np.clip(base + rng.normal(0, 1, (nb, 64)) * amp, 0, 255)
    pixels = jnp.asarray(px.astype(np.uint8))
    lengths, codes = _table()
    want = _staged(pixels, cfg, n_stripes, lengths, codes, None)
    got = fep.encode_stripes_fused(pixels, cfg, n_stripes, lengths, codes)
    np.testing.assert_array_equal(
        np.asarray(got.bit_lengths), np.asarray(want.bit_lengths)
    )
    w = np.asarray(want.units)
    g = np.asarray(got.units)
    np.testing.assert_array_equal(g[:, : w.shape[1]], w)
    assert not g[:, w.shape[1]:].any()


def test_safe_span_covers_direct_coded_runs(monkeypatch):
    """direct + coded_runs has 48-bit worst-case symbols (16 code + 16
    ESC raw + 16 run code) -> 515-unit worst row extent, past ROW_SPAN
    (512). _safe_span must widen the final rung (and the unit buffer)
    so a fully-dense stripe still packs byte-identically through the
    safe loop (forced via _LADDER_START)."""
    from dct_tpu.ops import fused_encode_pallas as fep

    assert fep._safe_span("direct", True, 8) == 640
    assert fep._safe_span("category", True, 8) == 512
    assert fep._safe_span("direct", False, 8) == 512
    assert fep._safe_span("none", True, 8) == 512

    monkeypatch.setattr(fep, "_LADDER_START", fep._TIER_INDEX["safe"])
    cfg = CodecConfig(
        quality=30, huffman_mode="direct", coded_runs=True,
        static_tables=False,
    )
    n_stripes, bps = 2, 17
    nb = n_stripes * bps
    rng = np.random.default_rng(3)
    px = jnp.asarray(rng.integers(0, 256, (nb, 64)).astype(np.uint8))
    zz = transform.encode_blocks(px, cfg)
    sym = rle.rle_encode_positional(zz)
    vals = np.asarray(sym.values)[np.asarray(sym.is_sym)]
    hist = np.ones(513, np.int64)
    for v in vals:
        idx = v - codec.DIRECT_VMIN
        if 0 <= idx < 511:
            hist[idx] += 3
    t = hf.CanonicalTable.from_frequencies(hist)
    lengths = jnp.asarray(t.lengths, jnp.int32)
    codes = jnp.asarray(t.codes.astype(np.int64), jnp.uint32)
    rt = hf.default_run_table(cfg.quality)
    rl = jnp.asarray(rt.lengths, jnp.int32)
    rc = jnp.asarray(rt.codes.astype(np.int64), jnp.uint32)
    want = codec.encode_pack(sym, cfg, n_stripes, lengths, codes, rl, rc)
    got = fep.encode_stripes_fused(
        px, cfg, n_stripes, lengths, codes,
        vmin=codec.DIRECT_VMIN, run_lengths=rl, run_codes=rc,
    )
    np.testing.assert_array_equal(
        np.asarray(got.bit_lengths), np.asarray(want.bit_lengths)
    )
    w = np.asarray(want.units)
    g = np.asarray(got.units)
    np.testing.assert_array_equal(g[:, : w.shape[1]], w)
    assert not g[:, w.shape[1]:].any()
