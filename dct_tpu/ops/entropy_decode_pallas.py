"""Device-side entropy decode: packed stripe units -> zigzag coefficients.

The decode mirror of ops/fused_encode_pallas.py, closing the last
host-only pipeline stage (reference mirror: entropy.c:333-358 run_length
_decode + the canonical-Huffman walk the reference never wires to bits,
SURVEY.md B2). The host decoders (Python ops/bitstream.py, C++
native/bitpack.cpp) remain the oracles; this kernel produces identical
integers on device so `decode_to_device` never leaves the chip.

Parallelization: entropy decode is bit-serial per substream, so the unit
of parallelism is whatever the format can address independently. With
cfg.decode_index (container v2) every BLOCK's bit length is stored — the
restart-marker analog — so each Pallas grid cell decodes 128 consecutive
blocks of one stripe, one block per lane:

  1. The stripe's 16-bit units arrive lane-major (1, U); a per-128-lane
     reshape loop turns them into a sublane column (U, 1) (Mosaic
     supports (1, 128)->(128, 1); large-N single reshapes are not relied
     on), then one dynamic slice takes the span-unit region covering the
     cell's blocks.
  2. The region is broadcast to (span, 128) and log-rolled per lane by
     each block's first-unit offset (the same lane-conditional sublane
     roll trick as the encode kernel's merge tree, in the other axis),
     yielding per-lane windows win[w, b] = units[first_u[b] + w].
     Both the window width W and the roll span are DATA-DRIVEN statics
     (computed host-side from the actual per-block bit lengths, bucketed
     to bound shape proliferation): round 4 sized W to the worst-case
     single-block extent (168+ units at N=8), making every per-symbol
     window reduce ~10x wider than real content needs.
  3. The decode loop runs TWO SYMBOLS per iteration across all 128
     lanes: one 8-unit (128-bit) frame fetch per iteration — four
     packed-i32 registers built by masked sublane reduces over the
     window — covers the worst-case two-symbol span (<= 15 alignment
     + 2 x 48 bits), then each symbol canonical-decodes the <=16-bit
     code by 16 per-length first/limit compares (SMEM tables), extracts
     the mode's payload (category extra bits / direct ESC raw / none
     raw), decodes the run field (fixed-width or a second canonical
     decode), and scatters the value into the (n2, 128) output tile
     with a sublane one-hot add — the RLE expand fused into the same
     step (entropy.c:344-352 semantics: pos += run; write if pos < n2;
     ++pos). The loop is a lax.while_loop: trip count = half the cell's
     max symbols per block, not the worst case.

Every mode is covered: category, direct (canonical-index -> value via a
masked-reduce gather against an alphabet-sized value table, ESC -> raw
16-bit), none (raw 16-bit values), each with fixed-width or coded
(canonical) run fields. dc_prediction / adaptive / compat_b1 are
downstream of the coefficients and reuse the existing device decode
half.

Streams whose tables exceed 16-bit codes (possible only in hostile
containers; this encoder's tables are length-limited) take the host
decoder instead — callers gate on `tables_supported`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dct_tpu.ops._mosaic import interpret as _interpret
from dct_tpu.ops import huffman as hf

# Upper bound on the per-cell region span. A cell's 128 blocks must span
# at most SPAN_MAX - W units from the first block's unit; wider cells
# (pathologically dense stripes) fall back to the host decoder via
# `decode_args` before the kernel is ever traced. Round 4 fixed the span
# at 4096 for every stream; now that it is data-driven (only dense
# content allocates big), the cap is one power higher — q97-dense 1080p
# stripes (240 blocks x ~500 bits ~ 4200+ units) stay on device with a
# 4 MB roll scratch instead of falling back to the host loop.
SPAN_MAX = 8192

_ESC_SENTINEL = 1 << 20  # marks the ESC slot in the direct value table


def _srl(x, n):
    """Logical (unsigned) right shift on int32 vectors."""
    return jax.lax.shift_right_logical(x, n)


def _canon_arrays(table: "hf.CanonicalTable"):
    """first/limit/base per code length 1..16 (index 0 unused) + the
    canonical-order symbol list. None if any code exceeds 16 bits."""
    if table.sorted_lengths.size and int(table.sorted_lengths.max()) > 16:
        return None
    first = np.zeros(17, np.int32)
    limit = np.zeros(17, np.int32)
    base = np.zeros(17, np.int32)
    for L in range(1, 17):
        idx = np.nonzero(table.sorted_lengths == L)[0]
        if idx.size:
            first[L] = int(table.sorted_codes[idx[0]])
            limit[L] = int(table.sorted_codes[idx[-1]]) + 1
            base[L] = int(idx[0])
    return first, limit, base, table.sorted_symbols.astype(np.int32)


def tables_supported(
    table: "hf.CanonicalTable | None",
    run_table: "hf.CanonicalTable | None",
    vmin: int = 0,
) -> bool:
    """Whether the device decoder can represent these wire tables: every
    code <= 16 bits and direct values inside int16 (the host decoders
    reject wider values too — bitstream.py:549-578)."""
    for t in (table, run_table):
        if t is not None and t.sorted_lengths.size and (
            int(t.sorted_lengths.max()) > 16
        ):
            return False
    if table is not None and not (
        -0x8000 <= vmin and vmin + len(table.lengths) <= 0x8001
    ):
        return False
    return True


def _decode_kernel(
    units_ref, geom_ref, base_ref,
    cf_ref, cl_ref, cb_ref, csym_ref,
    rf_ref, rl_ref, rb_ref,
    vtab_ref, rsym_ref,
    out_ref,
    col_scr, span_scr,
    *, n2: int, mode: str, coded_runs: bool, run_bits: int, W: int,
    u_rows: int, span: int, syms: int,
):
    """One grid cell = up to 128 consecutive blocks of one stripe.

    units_ref: (1, u_rows, 128) i32 — the stripe's 16-bit units (unit u
               at [0, u >> 7, u & 127])
    geom_ref:  (1, 1, 8, 128) i32 — sublane 0: per-block absolute bit
               offset within the stripe; sublane 1: per-block bit length
               (0-length lanes are dead padding); sublanes 2-7 zero
               (Mosaic block shapes need an (8, 128)-divisible tail)
    base_ref:  (1, 1) i32 SMEM — the cell's 128-aligned first unit
    cf/cl/cb_ref: (1, 17) i32 SMEM — value-code canonical first/limit/base
    csym_ref:  (1, 16) i32 SMEM — category-order symbols (category mode)
    rf/rl/rb_ref: (1, 17) i32 SMEM — run-code canonical tables
    vtab_ref:  (VH, 1) i32 — direct-mode canonical-index -> value
               (ESC slot = _ESC_SENTINEL); (8, 1) zeros otherwise
    rsym_ref:  (RH, 1) i32 — run canonical-order symbols (coded_runs);
               (8, 1) zeros otherwise
    out_ref:   (1, 1, n2, 128) i32 — zigzag coefficients, position-major
    col_scr:   (u_rows*128, 1) i32 — units as a sublane column
    span_scr:  (span, 128) i32 — per-lane windows after the distribute
    """
    # ---- 1. lane-major units -> sublane column ---------------------------
    def to_col(r, _):
        row = units_ref[0, pl.ds(r, 1), :]  # (1, 128)
        col_scr[pl.ds(pl.multiple_of(128 * r, 128), 128), :] = row.reshape(
            128, 1
        )
        return 0

    jax.lax.fori_loop(0, u_rows, to_col, 0)

    # ---- 2. per-lane window distribute ------------------------------------
    g8 = geom_ref[0, 0]  # (8, 128)
    boff = g8[0:1, :]
    bbits = g8[1:2, :]
    base_u = base_ref[0, 0, 0, 0]
    first_u = _srl(boff, 4)  # ABSOLUTE first unit of each lane's block
    first_rel = first_u - base_u  # its offset within the region
    region = col_scr[pl.ds(pl.multiple_of(base_u, 128), span), :]
    span_scr[:] = jax.lax.broadcast_in_dim(region, (span, 128), (0, 1))
    for b in range(span.bit_length() - 1):
        cond = ((first_rel >> b) & 1) == 1
        span_scr[:] = jnp.where(
            cond, pltpu.roll(span_scr[:], span - (1 << b), axis=0),
            span_scr[:],
        )
    win = span_scr[pl.ds(0, W), :]  # (W, 128): win[w, b] = units[f_b + w]

    subW = jax.lax.broadcasted_iota(jnp.int32, (W, 128), 0)
    subN = jax.lax.broadcasted_iota(jnp.int32, (n2, 128), 0)
    VH = vtab_ref.shape[0]
    RH = rsym_ref.shape[0]
    subV = jax.lax.broadcasted_iota(jnp.int32, (VH, 128), 0)
    subR = jax.lax.broadcasted_iota(jnp.int32, (RH, 128), 0)

    end = boff + bbits
    cur0 = boff
    pos0 = jnp.zeros((1, 128), jnp.int32)
    out0 = jnp.zeros((n2, 128), jnp.int32)

    # registers per frame fetch: 2 (64 bits) covers one <=48-bit symbol
    # after <=15 bits of unit-alignment slack; 4 (128 bits) covers two
    R = 2 if syms == 1 else 4

    def fetch_regs(cur):
        """R packed i32 registers = 2R consecutive units starting at each
        lane's current unit, via one masked-reduce pass per register over
        the per-lane window (unit j of the frame lands in register j>>1,
        half 1 - (j & 1))."""
        u_loc = _srl(cur, 4) - first_u  # (1, 128), >= 0
        rel = subW - u_loc  # (W, 128): unit index within the frame
        pair = jax.lax.shift_right_arithmetic(rel, 1)
        shifted = win << ((1 - (rel & 1)) * 16)
        return [
            jnp.sum(jnp.where(pair == k, shifted, 0), axis=0, keepdims=True)
            for k in range(R)
        ]

    def make_top(regs):
        """top(g) = the 32 stream bits starting g bits into the fetched
        frame (0 <= g < 32*R; only the top 16+payload bits are ever
        consumed, so reads that run past the frame's tail fill with
        zeros exactly like the round-4 window32)."""

        def top(g):
            ga = g & 31
            sel = _srl(g, 5)
            a = regs[R - 1]
            b = jnp.zeros_like(regs[0])
            for k in range(R - 2, -1, -1):
                m = sel == k
                a = jnp.where(m, regs[k], a)
                b = jnp.where(m, regs[k + 1], b)
            hi = a << ga
            lo = jnp.where(
                ga > 0, _srl(b, 32 - jnp.clip(ga, 1, 31)), 0
            )
            return hi | lo

        return top

    def canon_decode(t16, f_ref, l_ref, b_ref):
        """<=16-bit canonical decode: (canonical index, code length)."""
        idx = jnp.zeros((1, 128), jnp.int32)
        ln = jnp.zeros((1, 128), jnp.int32)
        found = jnp.zeros((1, 128), jnp.bool_)
        for L in range(1, 17):
            cand = _srl(t16, 16 - L)
            hit = jnp.logical_not(found) & (cand >= f_ref[0, L]) & (
                cand < l_ref[0, L]
            )
            idx = jnp.where(hit, b_ref[0, L] + cand - f_ref[0, L], idx)
            ln = jnp.where(hit, L, ln)
            found = found | hit
        return idx, ln

    def decode_sym(top, fs, cur, pos, out):
        """Decode one symbol per lane starting at bit cursor `cur` inside
        the frame fetched at bit `fs`; no-op on finished lanes."""
        active = (pos < n2) & (cur < end)
        g = cur - fs
        t32 = top(g)
        t16 = _srl(t32, 16)

        # ---- value field ------------------------------------------------
        if mode == "category":
            idx, ln = canon_decode(t16, cf_ref, cl_ref, cb_ref)
            cat = jnp.zeros((1, 128), jnp.int32)
            for k in range(16):
                cat = cat + jnp.where(idx == k, csym_ref[0, k], 0)
            cat = jnp.where(ln > 0, cat, 0)
            e = jnp.where(
                cat > 0, _srl(t32 << ln, 32 - jnp.maximum(cat, 1)), 0
            )
            half = 1 << jnp.maximum(cat - 1, 0)
            v = jnp.where(
                cat == 0, 0,
                jnp.where(e < half, e - (1 << cat) + 1, e),
            )
            gv = ln + cat
        elif mode == "direct":
            idx, ln = canon_decode(t16, cf_ref, cl_ref, cb_ref)
            tabv = jax.lax.broadcast_in_dim(vtab_ref[:], (VH, 128), (0, 1))
            v = jnp.sum(
                jnp.where(subV == idx, tabv, 0), axis=0, keepdims=True
            )
            esc = v == _ESC_SENTINEL
            raw = _srl(t32 << ln, 16)  # ln + 16 <= 32
            raw = raw - ((raw >> 15) & 1) * 0x10000  # sign-extend
            v = jnp.where(esc, raw, v)
            gv = ln + jnp.where(esc, 16, 0)
        else:  # none: raw 16-bit two's-complement value
            v = t16 - ((t16 >> 15) & 1) * 0x10000
            gv = jnp.full((1, 128), 16, jnp.int32)

        # ---- run field ----------------------------------------------------
        w2 = top(g + gv)
        if coded_runs:
            ridx, rln = canon_decode(_srl(w2, 16), rf_ref, rl_ref, rb_ref)
            tabr = jax.lax.broadcast_in_dim(rsym_ref[:], (RH, 128), (0, 1))
            run = jnp.sum(
                jnp.where(subR == ridx, tabr, 0), axis=0, keepdims=True
            )
            lc = rln
        else:
            run = _srl(w2, 32 - run_bits)
            lc = jnp.full((1, 128), run_bits, jnp.int32)

        # ---- RLE expand (entropy.c:344-352) -------------------------------
        wpos = pos + run
        write = active & (wpos < n2)
        out = out + jnp.where(
            write & (subN == wpos), v, 0
        )
        pos = jnp.where(active, jnp.where(wpos < n2, wpos + 1, wpos), pos)
        cur = jnp.where(active, cur + gv + lc, cur)
        return cur, pos, out

    def body(carry):
        cur, pos, out = carry
        top = make_top(fetch_regs(cur))
        fs = cur & ~15  # the frame's first bit (unit-aligned)
        cur, pos, out = decode_sym(top, fs, cur, pos, out)
        if syms == 2:
            cur, pos, out = decode_sym(top, fs, cur, pos, out)
        return cur, pos, out

    def cond(carry):
        cur, pos, _ = carry
        return jnp.any((pos < n2) & (cur < end))

    _, _, out = jax.lax.while_loop(cond, body, (cur0, pos0, out0))
    out_ref[0, 0] = out


def _table_inputs(table, run_table, mode, vmin):
    """Host-side prep of the kernel's table operands. Value/run gather
    tables are sized to the ACTUAL alphabet (bucketed), not the
    worst-case 640 — the per-symbol masked-reduce gather is linear in
    table height."""
    z17 = np.zeros(17, np.int32)
    cf = cl = cb = z17
    csym = np.zeros(16, np.int32)
    vh = 8
    if mode in ("category", "direct"):
        cf, cl, cb, order = _canon_arrays(table)
        if mode == "category":
            csym = np.zeros(16, np.int32)
            csym[: order.size] = order
        else:
            vh = max(8, -(-order.size // 64) * 64)
    vtab = np.zeros((vh, 1), np.int32)
    if mode == "direct":
        n_alpha = len(table.lengths) - 1
        vals = np.where(
            order == n_alpha, _ESC_SENTINEL, order + vmin
        ).astype(np.int32)
        vtab[: vals.size, 0] = vals
    rf = rl = rb = z17
    rh = 8
    if run_table is not None:
        rf, rl, rb, rorder = _canon_arrays(run_table)
        rh = max(8, -(-rorder.size // 8) * 8)
    rsym = np.zeros((rh, 1), np.int32)
    if run_table is not None:
        rsym[: rorder.size, 0] = rorder
    return cf, cl, cb, csym, rf, rl, rb, vtab, rsym


def plan_cells(block_bits: np.ndarray, n_stripes: int):
    """Host-side geometry: per-cell block offsets, region bases, and the
    data-driven window/span requirements.

    block_bits: (n_stripes, bps) int. Returns (boff, bbits, bases,
    w_need, span_base) with shapes (n_stripes, n_chunks*128) /
    (n_stripes, n_chunks) / scalars: w_need is the max per-block unit
    extent + the 8-unit fetch margin; span_base is the max first-unit
    offset within a cell's 128-aligned region (the roll span must cover
    span_base + W)."""
    ns, bps = block_bits.shape
    bb = block_bits.astype(np.int64)
    csum = np.cumsum(bb, axis=1)
    boff = (csum - bb).astype(np.int64)
    n_chunks = -(-bps // 128)
    pad = n_chunks * 128 - bps
    if pad:
        endbits = csum[:, -1:]
        boff = np.concatenate(
            [boff, np.repeat(endbits, pad, axis=1)], axis=1
        )
        bb = np.concatenate([bb, np.zeros((ns, pad), np.int64)], axis=1)
    boff3 = boff.reshape(ns, n_chunks, 128)
    bb3 = bb.reshape(ns, n_chunks, 128)
    first_u = boff3 >> 4
    bases = (first_u[:, :, 0] >> 7) << 7  # 128-aligned region base
    last_u = (boff3 + np.maximum(bb3 - 1, 0)) >> 4
    w_need = int((last_u - first_u).max(initial=0)) + 8
    span_base = int((first_u - bases[:, :, None]).max(initial=0))
    return (
        boff.astype(np.int32),
        bb.astype(np.int32),
        bases.astype(np.int32),
        w_need,
        span_base,
    )


def window_units(n2: int, mode: str, coded_runs: bool, run_bits: int) -> int:
    """Worst-case per-lane window: the maximum single-block unit extent
    for this mode + fetch margin, in 8-sublane granules. The actual W is
    data-driven (plan_cells.w_need) and almost always far smaller; this
    bound survives as the sanity cap."""
    lb_max = {"category": 15, "direct": 16, "none": 0}[mode]
    bits = n2 * (16 + lb_max + (16 if coded_runs else run_bits))
    return -(-(bits // 16 + 8) // 8) * 8


def _bucket_w(w: int) -> int:
    """Bucket window widths so shape proliferation (one kernel compile
    per W) stays bounded: multiples of 8 up to 64, then of 32."""
    if w <= 64:
        return -(-w // 8) * 8
    return -(-w // 32) * 32


def _pow2ceil(x: int) -> int:
    return 1 << max(8, (x - 1).bit_length())


def decode_args(
    units: np.ndarray,
    block_bits: np.ndarray,
    n_stripes: int,
    n2: int,
    mode: str,
    table: "hf.CanonicalTable | None",
    vmin: int = 0,
    run_table: "hf.CanonicalTable | None" = None,
    run_bits: int = 8,
    w_units: int | None = None,
    span: int | None = None,
    syms: int = 2,
):
    """Host-side prep: (operand arrays, static kwargs) for decode_call, or
    None when this geometry/table needs the host decoder (code > 16 bits,
    direct values outside int16, or a cell spanning more than SPAN_MAX
    units). Split from the traced half so callers can jit decode_call
    into a larger step (one tunnel dispatch for the whole decode).

    w_units/span override the data-driven window geometry — batched
    decode passes shared values so per-frame operand statics match
    (see plan_geometry)."""
    if not tables_supported(table, run_table, vmin):
        return None
    bb = np.asarray(block_bits, np.int64).reshape(n_stripes, -1)
    bps = bb.shape[1]
    boff, bbits, bases, w_need, span_base = plan_cells(bb, n_stripes)
    W = w_units if w_units is not None else _bucket_w(w_need)
    if W < w_need:
        return None  # caller passed a too-small override
    sp = span if span is not None else _pow2ceil(span_base + W)
    if sp < span_base + W or sp > SPAN_MAX:
        return None
    n_chunks = boff.shape[1] // 128
    # pack boff/bbits into one (8, 128)-tiled geometry operand (Mosaic
    # block shapes require an (8, 128)-divisible tail; a bare (1, 128)
    # block on a (S, C*128) array is rejected)
    geom = np.zeros((n_stripes, n_chunks, 8, 128), np.int32)
    geom[:, :, 0, :] = boff.reshape(n_stripes, n_chunks, 128)
    geom[:, :, 1, :] = bbits.reshape(n_stripes, n_chunks, 128)
    tabs = _table_inputs(table, run_table, mode, vmin)
    arrays = (
        np.ascontiguousarray(units, np.int32),
        geom,
        bases.reshape(n_stripes, n_chunks, 1, 1),
        *tabs,
    )
    statics = dict(
        n2=n2,
        mode=mode,
        coded_runs=run_table is not None,
        run_bits=run_bits,
        W=W,
        bps=bps,
        span=sp,
        syms=syms,
    )
    return arrays, statics


def plan_geometry(
    block_bits_list, n_stripes: int
) -> tuple[int, int] | None:
    """Shared (w_units, span) for a BATCH of frames (the maxima of each
    frame's data-driven geometry), so per-frame decode_args statics
    match and the operands stack. None if any frame overruns SPAN_MAX."""
    W = 8
    base = 0
    for bb in block_bits_list:
        bb = np.asarray(bb, np.int64).reshape(n_stripes, -1)
        _, _, _, w_need, span_base = plan_cells(bb, n_stripes)
        W = max(W, w_need)
        base = max(base, span_base)
    W = _bucket_w(W)
    sp = _pow2ceil(base + W)
    if sp > SPAN_MAX:
        return None
    return W, sp


def decode_call(
    units, geom, bases, cf, cl, cb, csym, rf, rl, rb, vtab, rsym,
    *, n2: int, mode: str, coded_runs: bool, run_bits: int, W: int,
    bps: int, span: int = SPAN_MAX, syms: int = 2,
):
    """Traced half: stripes' units + geometry -> (NB, n2) i32 zigzag
    coefficients, integer-identical to the host decoders. Jittable (all
    shapes static); see decode_args for the operand prep."""
    n_stripes, n_chunks = geom.shape[0], geom.shape[1]
    U = int(units.shape[1])
    # the region slice reads [base, base + span) with base up to the last
    # unit's 128-aligned row — pad so it can never run off the column
    u_rows = -(-(U + span) // 128)
    units = jnp.pad(
        jnp.asarray(units, jnp.int32),
        ((0, 0), (0, u_rows * 128 - U)),
    ).reshape(n_stripes, u_rows, 128)

    kernel = functools.partial(
        _decode_kernel,
        n2=n2,
        mode=mode,
        coded_runs=coded_runs,
        run_bits=run_bits,
        W=W,
        u_rows=u_rows,
        span=span,
        syms=syms,
    )
    vh = int(vtab.shape[0])
    rh = int(rsym.shape[0])
    smem17 = pl.BlockSpec((1, 17), lambda i, j: (0, 0), memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        kernel,
        grid=(n_stripes, n_chunks),
        in_specs=[
            pl.BlockSpec((1, u_rows, 128), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, 128), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 1), lambda i, j: (i, j, 0, 0), memory_space=pltpu.SMEM),
            smem17, smem17, smem17,
            pl.BlockSpec((1, 16), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            smem17, smem17, smem17,
            pl.BlockSpec((vh, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rh, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, n2, 128), lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_stripes, n_chunks, n2, 128), jnp.int32
        ),
        scratch_shapes=[
            pltpu.VMEM((u_rows * 128, 1), jnp.int32),
            pltpu.VMEM((span, 128), jnp.int32),
        ],
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=n_stripes * n_chunks * 128 * n2 * 64,
            bytes_accessed=n_stripes * (u_rows * 512 + n_chunks * n2 * 512),
            transcendentals=0,
        ),
    )(
        units,
        jnp.asarray(geom),
        jnp.asarray(bases),
        jnp.asarray(cf).reshape(1, 17), jnp.asarray(cl).reshape(1, 17),
        jnp.asarray(cb).reshape(1, 17), jnp.asarray(csym).reshape(1, 16),
        jnp.asarray(rf).reshape(1, 17), jnp.asarray(rl).reshape(1, 17),
        jnp.asarray(rb).reshape(1, 17),
        jnp.asarray(vtab), jnp.asarray(rsym),
    )
    # (s, c, n2, 128) -> (s, c, 128, n2) -> (NB_padded, n2), trimmed to
    # the real block count
    zz = jnp.transpose(out, (0, 1, 3, 2)).reshape(-1, n2)
    nb = n_stripes * bps
    if zz.shape[0] != nb:
        zz = zz.reshape(n_stripes, n_chunks * 128, n2)[:, :bps].reshape(
            -1, n2
        )
    return zz


def decode_stripes_device(
    units,
    block_bits: np.ndarray,
    n_stripes: int,
    n2: int,
    mode: str,
    table: "hf.CanonicalTable | None",
    vmin: int = 0,
    run_table: "hf.CanonicalTable | None" = None,
    run_bits: int = 8,
):
    """One-shot convenience: decode_args + decode_call (each call traces;
    production wraps decode_call in a larger jitted step instead —
    models/codec.py _device_decode_plane). Returns None when the host
    decoder is required."""
    prep = decode_args(
        np.asarray(units), block_bits, n_stripes, n2, mode, table,
        vmin=vmin, run_table=run_table, run_bits=run_bits,
    )
    if prep is None:
        return None
    arrays, statics = prep
    return decode_call(*arrays, **statics)
