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
     extra bits, fixed 8-bit runs. The three per-symbol fields are
     CONTIGUOUS in the stream, so they fuse into ONE <=39-bit window
     V = (code<<cat | extra)<<8 | run at the symbol's bit offset,
     materialized as the four 16-bit digits of a 64-bit frame (emulated
     with two 32-bit contributions — Mosaic lanes are 32-bit).
  4. stream bit offsets: lane-segment prefix + per-row totals + sublane
     log-roll prefix across rows — all in registers/VMEM.
  5. pack: per row, one one-hot matrix A[p,j] = (unit(p) == j) over the
     row's unit span serves all four digit planes: a single
     (8,128)@(128,span) MXU matmul scatters+reduces them, and digits d>0
     land via d-lane rolls of the product rows. The digits are stored as
     hi/lo BYTES (exact in bf16) so the matmul runs in ONE default-
     precision bf16 pass with f32 accumulation (disjoint bitfields keep
     byte sums < 2^15 — exact), recombined as hi*256+lo afterwards. A and
     the byte matrix stay f32 in VMEM (v5e has no 16-bit compare and
     Mosaic restricts 16-bit dynamic-offset loads); the DEFAULT-precision
     matmul's internal f32->bf16 rounding is exact for 0/1 and byte
     values. Mosaic dynamic lane offsets must be 128-multiples, so the
     row base is aligned down and the slack lives inside the span.

     Round 2 added per-stripe PACK TIERS (one scalar branch per stripe —
     per-row branching is the measured dead end, CLAUDE.md); round 3
     deepened them into a MERGE TREE; round 4 re-gated the ladder from a
     same-session hardware A/B (BASELINE.md round-4 table). Tier k groups
     2^k consecutive rows when the group's live symbols fit one 128-lane
     vector AND its units fit FAST_SPAN from the group leader's aligned
     base: each row's symbols are lane-compacted left (_compact_rows:
     collision-free LSB-first log-shifts; move distances are monotone
     along lanes), then k levels of _merge_rows append row r+2^lvl's
     lanes after row r's group live count — so the serial pack loop runs
     R/2^k iterations.
       * quad tier (k=2): the measured optimum for sparse content
         (1.05 Gpix/s at q10-q50 vs pair 0.99, oct 0.86)
       * pair tier (k=1): q ~90 (quad's 4-row lane budget overflows)
       * pair-wide tier: pairs whose UNITS overflow FAST_SPAN while
         their live symbols still fit 128 lanes (WIDE_SPAN = 384)
       * mid / mid-wide tiers: ungrouped rows at FAST_SPAN / WIDE_SPAN
         (q ~97: rows overflow the PAIR lane budget, so grouping stops)
       * safe tier: the round-1 ROW_SPAN loop for worst-case content.
     Measured dead ends (hardware A/B 2026-08-19, removed): the oct
     level (k=3) — two extra merge levels cost more than the saved pack
     iterations — and the round-3 NARROW variants (one-MXU-tile span
     with the alignment slack applied by 7 conditional result rolls),
     which ran 0.58-0.67 Gpix/s vs 0.8-1.05 for their wide parents: the
     rolls cost more than the one MXU tile they save. That regression
     shipped as the round-3 default without a hardware A/B and cost the
     headline 32%; the ladder is now gated ONLY by same-session A/B
     numbers (benchmarks/tier_ab.py).

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
FAST_SPAN = 256  # tier-1 span: covers slack (<=127) + row extent <= 128
                 # units (2048 bits/row, ~4.4x the q50 mean); stripes with a
                 # longer row fall back to the ROW_SPAN loop (scalar
                 # per-stripe branch — per-ROW branching is the measured
                 # dead end, see CLAUDE.md)
WIDE_SPAN = 384  # dense-content (q~97) middle ground: a merged pair's
                 # units (~2x69 at q97) + the <=127 align slack overflow
                 # FAST_SPAN while its live symbols still fit 128 lanes —
                 # half the serial iterations at 1.5x span beats per-row
                 # FAST_SPAN packs; single rows past FAST_SPAN take the
                 # 384 span before falling to the 512 safe loop


from dct_tpu.ops._mosaic import interpret as _interpret


# Trace-time test hook (benchmarks/pack_experiments.py): skip the pack loop
# so the kernel's phase-1-4 cost can be measured in isolation. Units come
# back zero — NEVER set outside benchmarks.
_SKIP_PACK = False

# Trace-time test hook (tests/test_fused_encode.py): drop the first N
# rungs of the pack-tier ladder so the cold rungs (pair-wide, mid,
# mid-wide, safe) get direct byte-identity coverage — every rung is
# correct for any content its condition admits, and eligibility is
# monotone down the ladder, so ordinary sparse content exercises
# whichever rung comes first. NEVER set outside tests.
_LADDER_START = 0

# Trace-time A/B hook (benchmarks/tier_ab.py): truncate the ladder's TAIL
# to rungs [START, STOP) + the always-eligible safe rung. Together with
# _LADDER_START this compiles a kernel with exactly one hot rung, so the
# A/B can separate a rung's own cost from the cost of CARRYING the other
# rungs' compiled bodies (VMEM/register pressure). NEVER set outside
# benchmarks.
_LADDER_STOP: int | None = None

# Ladder rung indexes for the hook (keep in sync with the ladder below).
# The *4 rungs are the round-5 phase-shifted-accumulator variants: four
# unit buffers offset by 32 lanes each cut the 128-alignment slack to
# <= 31, so a one-MXU-tile span (128) covers real content without the
# round-3 NARROW rungs' dead-end result rolls — the per-row one-hot
# build (the pack loop's dominant cost) halves.
_TIER_INDEX = {
    "quad4": 0, "quad": 1, "pair4": 2, "pair": 3, "pair_wide": 4,
    "mid4": 5, "mid": 6, "mid_wide": 7, "safe": 8,
}


def _safe_span(mode: str, coded_runs: bool, run_bits: int) -> int:
    """Span of the ladder's final (always-eligible) rung: the worst-case
    row unit extent for this mode + 127 alignment slack + 4 digit margin,
    rounded to the 128-unit grid. Worst per-symbol bits: a 16-bit code
    (canonical cap), the payload (15 extra bits in category mode, 16 raw
    for a direct-mode ESC, 0 in none mode), and the run field (a 16-bit
    canonical run code under coded_runs, else the fixed field). A full
    128-lane row of such symbols = 8 * t3 units. ROW_SPAN (512) covers
    every mode except direct + coded_runs (48-bit symbols -> 384 + 131 =
    515 -> 640)."""
    lb_max = {"category": 15, "direct": 16, "none": 0}[mode]
    t3_max = 16 + lb_max + (16 if coded_runs else run_bits)
    need = 8 * t3_max + 127 + 4
    return max(ROW_SPAN, -(-need // 128) * 128)


def _compact_rows(planes, alive, pos):
    """Stable lane-compaction: squeeze each row's alive lanes to the left.

    Destination = exclusive prefix count of alive lanes; every element moves
    LEFT by delta = pos - dst, decomposed over delta's bits LSB-first.
    delta is non-decreasing along lanes (dst increments by at most 1 per
    lane), which makes the per-bit parallel shift collision-free: after
    bits 0..b-1, element positions p - (delta & (2^b - 1)) stay strictly
    increasing (the gap between neighbors is >= 1 + the difference of their
    delta high-parts). Wrapped (circular) arrivals are rejected by the
    pos < 128 - step guard. Fully vectorized over all rows at once.

    Returns the compacted planes. Lanes >= the row's alive count hold
    stale values — mask with lane < live_count before use.
    """
    cnt = alive.astype(jnp.int32)
    inc = cnt
    for step in (1, 2, 4, 8, 16, 32, 64):
        inc = inc + jnp.where(pos >= step, pltpu.roll(inc, step, axis=1), 0)
    dst = inc - cnt  # exclusive count of alive lanes to the left
    rem = jnp.where(alive, pos - dst, 0)
    out = list(planes)
    al = cnt  # 0/1 int32 — keep rolled state 32-bit (Mosaic i1 vectors)
    for b in range(7):
        s = 1 << b
        a_rem = pltpu.roll(rem, 128 - s, axis=1)  # = roll by -s (circular)
        a_al = pltpu.roll(al, 128 - s, axis=1)
        take = (a_al == 1) & (((a_rem >> b) & 1) == 1) & (pos < 128 - s)
        leave = (al == 1) & (((rem >> b) & 1) == 1)
        out = [
            jnp.where(take, pltpu.roll(p, 128 - s, axis=1), p) for p in out
        ]
        rem = jnp.where(take, a_rem, rem)
        al = jnp.where(take, 1, jnp.where(leave, 0, al))
    return out


def _merge_rows(planes, l0, lane, stride):
    """Append row r+stride's compacted lanes after row r's first l0 lanes.

    planes must be pre-masked (zeros at lanes >= their row's live count) so
    the circular wrap of the variable right-shift only recycles zeros, and
    the lane < l0 select covers the wrapped region. One level of the merge
    TREE: stride 1 merges row pairs (l0 = per-row live count, valid at even
    rows), stride 2 then merges pairs of merged pairs (l0 = the PAIR live
    count, valid at rows = 0 mod 4), stride 4 merges quads into octs. Each
    level's output stays zero beyond its combined live count whenever that
    count is <= 128 (the tier guard), so levels compose.
    """
    shifted = [
        pltpu.roll(p, p.shape[0] - stride, axis=0) for p in planes
    ]  # roll by -stride: row r+stride -> slot r (circular)
    for b in range(7):
        s = 1 << b
        cond = ((l0 >> b) & 1) == 1  # (R, 1) row-broadcast
        shifted = [
            jnp.where(cond, pltpu.roll(p, s, axis=1), p) for p in shifted
        ]
    return [jnp.where(lane < l0, e, o) for e, o in zip(planes, shifted)]


def _round_half_away_i32(x):
    # round-half-away folded into the conversion: f32->i32 truncates, so
    # (x +- 0.5).astype(i32) == sign*floor(|x|+0.5) bit-for-bit; the +-0.5
    # comes from bit ops (see transform_pallas._half)
    return (x + tpk._half(x)).astype(jnp.int32)


def _fused_kernel(
    len_ref, code_ref, rlen_ref, rcode_ref, dtab_ref, px_ref,
    m0_ref, m1_ref, m2_ref, b_ref, scale_ref,
    units_ref, bits_ref, tier_ref, bbits_ref, scr_k, scr_d, scr_base,
    *extra_scr,
    n_live_blocks: int, adaptive: bool, run_bits: int, coded_runs: bool,
    dc_prediction: bool, n2: int = 64, mode: str = "category",
    vmin: int = 0, n_alpha: int = 0,
):
    """One grid cell = one stripe. See module docstring.

    len_ref/code_ref: (1, 1, 16) i32 SMEM — canonical category table
    rlen_ref/rcode_ref: (1, 1, 65) i32 SMEM — canonical run-code table
               (cfg.coded_runs; stubs when the fixed 8-bit field is used)
    dtab_ref:  (640, 1) i32 VMEM — direct-mode packed value table
               (len << 16 | code); zeros in other modes
    px_ref:    (1, R, 128) u8 — 2 blocks per row
    m0/m1/m2_ref: (128, 128) bf16 split operator parts; b_ref: (1, 128) f32
    scale_ref: (1, R, 2) f32 — adaptive quantize-divisor scale (ones if off)
    units_ref: (1, 1, U_pad) i32; bits_ref: (1, 1, 1) i32 SMEM
    tier_ref:  (1, 1, 1) i32 SMEM — _TIER_INDEX of the pack rung this
               stripe actually took (-1 under _SKIP_PACK); drives the
               tier-distribution reporting in benchmarks/tier_ab.py and
               tier_sweep.py at the cost of one scalar store per stripe
    bbits_ref: (1, R, bpr) i32 — per-(row, block-in-row) bit lengths
               (per-row for n2=256; the wrapper folds row pairs). Feeds
               cfg.decode_index, the per-block restart index the device
               entropy decoder parallelizes over; pad blocks emit 0
    scr_k:     (R, 128) i32 — per-symbol first unit index (off >> 4)
    scr_d:     (8R, 128) f32 — hi/lo bytes of the 4 frame digits,
               plane-major [d0hi|d0lo|d1hi|d1lo|...] (f32 storage: Mosaic
               dynamic sublane offsets are unrestricted only for 32-bit;
               the DEFAULT-precision matmul rounds to bf16 internally,
               exact for byte values)
    scr_base:  (R, 1) i32 — per-row FIRST output unit (rp_ex >> 4); the
               pack rungs derive their 128- or 32-aligned bases from it
    """
    R = px_ref.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
    ridx = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0)
    ridx1 = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
    if n2 == 256:
        # one 16x16 block spans TWO consecutive rows (halves 0/1)
        pos = lane + 128 * (ridx & 1)  # zigzag position within the block
        block_idx = ridx >> 1
    else:
        # 128 // n2 whole blocks per row (8 for 4x4, 2 for 8x8)
        shift = n2.bit_length() - 1
        pos = lane & (n2 - 1)
        block_idx = (128 // n2) * ridx + (lane >> shift)
    live = block_idx < n_live_blocks

    # ---- 1. transform -----------------------------------------------------
    # canonical split-operand matmul (transform.split_operand_matmul order)
    from dct_tpu.ops import transform as _tf

    if n2 == 256:
        # 16x16: the (256,256) operator contracts over both of the block's
        # rows. Align each row with its block's half-0 / half-1 pixel rows
        # via sublane rolls, run the four (128,128) quadrants of each split
        # part, and keep the per-part association (lo-quadrant +
        # hi-quadrant) identical to the staged XLA K-split formula
        # (transform.encode_blocks n2=256 branch) for byte-identity.
        # rolls stay in f32 (Mosaic: "Rotate with non-32-bit data" is not
        # implemented for bf16 vectors); the bf16 cast is exact either way
        xf = px_ref[0].astype(jnp.int32).astype(jnp.float32)
        even2 = (ridx & 1) == 0
        x_prev = pltpu.roll(xf, 1, axis=0)
        x_next = pltpu.roll(xf, R - 1, axis=0)
        xlo = jnp.where(even2, xf, x_prev).astype(jnp.bfloat16)  # half 0
        xhi = jnp.where(even2, x_next, xf).astype(jnp.bfloat16)  # half 1
        y = None
        for m_ref in (m0_ref, m1_ref, m2_ref):
            t_ll = jnp.dot(xlo, m_ref[0:128, 0:128],
                           preferred_element_type=jnp.float32)
            t_lr = jnp.dot(xlo, m_ref[0:128, 128:256],
                           preferred_element_type=jnp.float32)
            t_hl = jnp.dot(xhi, m_ref[128:256, 0:128],
                           preferred_element_type=jnp.float32)
            t_hr = jnp.dot(xhi, m_ref[128:256, 128:256],
                           preferred_element_type=jnp.float32)
            part = jnp.where(even2, t_ll, t_lr) + jnp.where(
                even2, t_hl, t_hr
            )
            y = part if y is None else y + part
        y = y + jnp.where(even2, b_ref[0:1, :], b_ref[1:2, :])
    else:
        x = px_ref[0].astype(jnp.int32).astype(jnp.float32)
        y = _tf.split_operand_matmul(
            x, m0_ref[:], m1_ref[:], m2_ref[:], b_ref[:]
        )
    if adaptive:
        # scale_ref carries the RECIPROCAL adaptive scale, computed once in
        # XLA; one multiply + select keeps rounding bit-identical to the
        # einsum path (no compiler-dependent FMA contraction). Expand
        # (R, bpr) -> (R, 128) with the SHARED select helper — pltpu.repeat
        # TILES (abab...), it does not element-repeat.
        r = _tf.expand_block_scale(scale_ref[0], min(n2, 128))  # (R, 128)
        y = jnp.where(pos != 0, y * r, y)
    zz = _round_half_away_i32(y)

    if dc_prediction:
        # stripe-local DC DPCM (models/codec.py dc_predict): block b's DC
        # becomes dc[b] - dc[b-1] in stripe-linear order (bpr*row + sub).
        # A lane-roll by n2 aligns each DC with its successor block's DC
        # lane in the same row; the row's FIRST block (lane < n2) takes the
        # circular wrap of the PREVIOUS row instead = that row's last DC
        # (row 0 stays raw). Integer-exact, so the stream stays
        # byte-identical to the staged pipeline.
        dcv = jnp.where(pos == 0, zz, 0)
        if n2 == 256:
            # DC sits at (even row, lane 0); the previous block is 2 rows up
            pred = jnp.where(ridx1 >= 2, pltpu.roll(dcv, 2, axis=0), 0)
        else:
            s_roll = pltpu.roll(dcv, n2, axis=1)
            prev_row = pltpu.roll(s_roll, 1, axis=0)
            pred = jnp.where(
                lane >= n2, s_roll, jnp.where(ridx1 >= 1, prev_row, 0)
            )
        zz = zz - jnp.where(pos == 0, pred, 0)

    # ---- 2. RLE (segmented scans) ----------------------------------------
    mask = (zz != 0) & live
    m1 = jnp.where(mask, pos, -1)
    if n2 == 256:
        # full-row scan per half, then fold the even row's running max into
        # its odd row (the block's second half continues the first's scan)
        for step in (1, 2, 4, 8, 16, 32, 64):
            m1 = jnp.maximum(
                m1, jnp.where(lane >= step, pltpu.roll(m1, step, axis=1), -1)
            )
        rowmax = jnp.max(m1, axis=1, keepdims=True)
        prevmax = pltpu.roll(rowmax, 1, axis=0)
        odd1 = (ridx1 & 1) == 1
        m1 = jnp.where(odd1, jnp.maximum(m1, prevmax), m1)
        pnz = jnp.where(
            lane >= 1, pltpu.roll(m1, 1, axis=1),
            jnp.where(odd1, prevmax, -1),
        )
    else:
        step = 1
        while step < n2:
            m1 = jnp.maximum(
                m1, jnp.where(pos >= step, pltpu.roll(m1, step, axis=1), -1)
            )
            step *= 2
        pnz = jnp.where(pos >= 1, pltpu.roll(m1, 1, axis=1), -1)
    is_sym = (mask | (pos == n2 - 1)) & live
    term = (pos == n2 - 1) & jnp.logical_not(mask) & live
    run = jnp.where(is_sym, pos - pnz - 1 + term.astype(jnp.int32), 0)
    v = jnp.where(is_sym, zz, 0)

    # ---- 3. symbol fields (mode-dependent) --------------------------------
    # Every mode reduces to four per-symbol fields: a CODE (ca, la bits),
    # an EXTRA/raw payload (bv, lb bits), and the run field (rv, lc bits).
    if mode == "category":
        a = jnp.abs(v)
        cat = jnp.zeros_like(v)
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
    elif mode == "direct":
        # per-value canonical code over the [vmin, -vmin] alphabet + ESC
        # (512 entries in production: 511 values + ESC; the dtab bound is
        # 640): the table cannot be gathered per-lane on v5e, so each
        # row's 128 lookups run as ONE masked sublane reduce against the
        # lane-broadcast packed table (dtab: (640, 1) i32, len<<16|code).
        # The round-3 form — per-row one-hot MXU matmul against a
        # (640, 4) byte-plane table — paid three (1,128)<->(128,1)
        # relayouts per row and measured 0.22 Gpix/s e2e vs category's
        # 1.05 (benchmarks/dynamic_cost.py); this form keeps everything
        # lane-major. ESC symbols append the raw 16-bit value as EXTRA.
        scr_g = extra_scr[0]
        shifted = v - vmin
        in_range = (shifted >= 0) & (shifted < n_alpha)
        esc = is_sym & jnp.logical_not(in_range)
        scr_g[pl.ds(0, R), :] = jnp.where(
            in_range & is_sym, shifted, n_alpha
        )
        sub640 = jax.lax.broadcasted_iota(jnp.int32, (640, 128), 0)
        tab = jax.lax.broadcast_in_dim(dtab_ref[:], (640, 128), (0, 1))

        def gbody(r, _):
            idv = scr_g[pl.ds(r, 1), :]  # (1, 128) lane-major
            g = jnp.sum(
                jnp.where(sub640 == idv, tab, 0), axis=0, keepdims=True
            )  # (1, 128): len<<16 | code
            scr_g[pl.ds(R + r, 1), :] = g
            return 0

        jax.lax.fori_loop(0, R, gbody, 0)
        packed_lc = scr_g[pl.ds(R, R), :]
        la = jnp.where(is_sym, packed_lc >> 16, 0)
        ca = jnp.where(is_sym, packed_lc & 0xFFFF, 0)
        lb = jnp.where(esc, 16, 0)
        bv = jnp.where(esc, v & 0xFFFF, 0)
    else:  # none: raw 16-bit two's-complement value, no code table
        la = jnp.where(is_sym, 16, 0)
        ca = jnp.where(is_sym, v & 0xFFFF, 0)
        lb = jnp.zeros_like(v)
        bv = jnp.zeros_like(v)
    if coded_runs:
        # run field gets its own canonical code (<= 8 bits, so every
        # worst-case shape matches the fixed-run layout): 64 selects
        # against the SMEM run table, same technique as the categories
        rl = jnp.zeros_like(run)
        rc = jnp.zeros_like(run)
        for c in range(65):  # runs 0..64 (64 = all-zero block terminal)
            rsel = run == c
            rl = rl + jnp.where(rsel, rlen_ref[0, 0, c], 0)
            rc = rc + jnp.where(rsel, rcode_ref[0, 0, c], 0)
        lc = jnp.where(is_sym, rl, 0)
        rv = jnp.where(is_sym, rc, 0)
    else:
        lc = jnp.where(is_sym, run_bits, 0)
        rv = run
    t3 = la + lb + lc

    # ---- 4. stream bit offsets --------------------------------------------
    # FULL-ROW inclusive prefix of per-symbol bit lengths (t3): the stream
    # is sequential across the whole row regardless of block size, so one
    # 128-lane scan replaces the round-1 per-segment scan + block-total
    # assembly (identical integers — exact int adds in any association).
    pi = t3
    for step in (1, 2, 4, 8, 16, 32, 64):
        pi = pi + jnp.where(lane >= step, pltpu.roll(pi, step, axis=1), 0)
    rt = jnp.max(pi, axis=1, keepdims=True)  # (R, 1) bits per row
    rp = rt
    step = 1
    while step < R:
        rp = rp + jnp.where(ridx1 >= step, pltpu.roll(rp, step, axis=0), 0)
        step *= 2
    rp_ex = rp - rt  # exclusive bit base of row's first symbol
    bits_ref[0, 0, 0] = jnp.max(rp)

    # per-block bit lengths (cfg.decode_index): cumulative bits through
    # row-block j = pi at the block's LAST lane; adjacent differences give
    # the per-block split. For n2=256 a block spans two rows, so emit
    # per-row bits and let the wrapper fold pairs.
    if n2 == 256:
        bbits_ref[0, :, :] = rt
    else:
        bpr_k = 128 // n2
        prev = jnp.zeros((R, 1), jnp.int32)
        cols = []
        for j in range(bpr_k):
            cum = jnp.sum(
                jnp.where(lane == (j + 1) * n2 - 1, pi, 0),
                axis=1, keepdims=True,
            )
            cols.append(cum - prev)
            prev = cum
        bbits_ref[0, :, :] = (
            cols[0] if bpr_k == 1 else jnp.concatenate(cols, axis=1)
        )

    off = rp_ex + (pi - t3)  # bit offset of the symbol's fused window

    # ---- fused window digits ----------------------------------------------
    # Frame layout per symbol: CODE (la bits) | EXTRA/raw (lb) | RUN (lc),
    # L3 = t3 <= 41 bits, placed at frame bits [sh, sh+L3) of a 64-bit
    # MSB-first frame starting at unit off>>4. Emulated with two 32-bit
    # contributions (Mosaic lanes are 32-bit):
    #   T = code           (< 2^16) shifted by nT = 64 - sh - t3 + lb + lc
    #   X = extra<<lc|run  (< 2^26) shifted by nX = 64 - sh - t3
    # (T's extent ends at bit sh+la <= 31 < 48: T never reaches digit 3.)
    # Digit j = frame bits [16j, 16j+16) = (frame >> (48 - 16j)) & 0xFFFF.
    sh = off & 15
    T = jnp.where(is_sym, ca, 0)
    X = jnp.where(is_sym, (bv << lc) | rv, 0)
    nT = 64 - sh - t3 + lb + lc
    nX = 64 - sh - t3

    def digit(x, n, j):
        # (x << n) >> (48 - 16 j) & 0xFFFF with lane-dynamic n, overflow-free
        m = n - 48 + 16 * j
        left = (x << jnp.clip(m, 0, 15)) & 0xFFFF
        right = (x >> jnp.clip(-m, 0, 31)) & 0xFFFF
        return jnp.where(
            m >= 16, 0, jnp.where(m >= 0, left, jnp.where(-m >= 32, 0, right))
        )

    kmat = off >> 4
    rpu_vec = rp_ex >> 4  # first output unit per row
    base_vec = (rpu_vec >> 7) << 7  # 128-aligned unit base per row
    base32_vec = (rpu_vec >> 5) << 5  # 32-aligned base (acc4 rungs)
    scr_base[:] = rpu_vec

    def write_digits(Tv, nTv, Xv, nXv):
        for j in range(4):
            d = digit(Xv, nXv, j)
            if j < 3:  # T's frame extent ends at bit sh+31 < 48: no digit 3
                d = d | digit(Tv, nTv, j)
            scr_d[pl.ds(2 * j * R, R), :] = (d >> 8).astype(jnp.float32)
            scr_d[pl.ds((2 * j + 1) * R, R), :] = (d & 255).astype(jnp.float32)

    # Per-stripe pack tier (ONE scalar branch per stripe — per-ROW branching
    # is the measured dead end; the hot loops stay branch-free). Merge TREE:
    # level k groups 2^k consecutive rows when the group's live symbols fit
    # one 128-lane vector AND its units fit the tier span, running the
    # serial pack loop at R/2^k iterations. Ladder in MEASURED-cost order
    # (hardware A/B 2026-08-19, BASELINE.md round-4 table): quad R/4,
    # pair R/2, pair-wide R/2 at 1.5x span, mid R, mid-wide R at 1.5x,
    # safe R at worst-case span. Round 3's oct level (k=3) and the NARROW
    # one-MXU-tile variants are measured dead ends (removed): narrow's 7
    # conditional slack rolls cost more than the MXU tile they save
    # (0.58-0.67 vs 0.8-1.05 Gpix/s), and oct's extra two merge levels
    # cost more than the R/8 pack iterations they buy (0.86 vs quad 1.05).
    livecnt = jnp.sum(is_sym.astype(jnp.int32), axis=1, keepdims=True)
    last_k = jnp.max(kmat, axis=1, keepdims=True)
    # level-k group live counts / last units, valid at rows = 0 mod 2^k
    live_m = [livecnt]
    last_m = [last_k]
    for stride in (1, 2):
        live_m.append(live_m[-1] + pltpu.roll(live_m[-1], R - stride, axis=0))
        last_m.append(
            jnp.maximum(last_m[-1], pltpu.roll(last_m[-1], R - stride, axis=0))
        )

    def tier_ok(k, span):
        lead = (ridx1 & ((1 << k) - 1)) == 0
        return (jnp.max(jnp.where(lead, live_m[k], 0)) <= 128) & (
            jnp.max(jnp.where(lead, last_m[k] + 4 - base_vec, 0)) <= span
        )

    def tier_ok4(k):
        # acc4 rung eligibility: group extent from the LEADER's 32-aligned
        # base (slack <= 31) + digit margin fits the one-MXU-tile span
        lead = (ridx1 & ((1 << k) - 1)) == 0
        return (jnp.max(jnp.where(lead, live_m[k], 0)) <= 128) & (
            jnp.max(jnp.where(lead, last_m[k] + 4 - base32_vec, 0)) <= 128
        )

    span_need = jnp.max(last_k + 4 - base_vec)
    span_need32 = jnp.max(last_k + 4 - base32_vec)

    # ---- 5. pack -----------------------------------------------------------
    units_ref[:] = jnp.zeros_like(units_ref)

    U_pad = units_ref.shape[2]
    acc4 = extra_scr[-1]  # (4, U_pad) i32 phase-shifted accumulators

    def pack_loop(span, row_step, use_acc4=False):
        u = jax.lax.broadcasted_iota(jnp.int32, (128, span), 1)

        def one_row(r, planes, rr):
            rpu = scr_base[r, 0]
            if use_acc4:
                # accumulator bsel's lane l holds unit l + 32*bsel: the
                # row's alignment slack drops from <= 127 to <= 31, so
                # the one-MXU-tile span covers slack + extent + digits
                bsel = (rpu >> 5) & 3
                base = (rpu >> 5) << 5
            else:
                bsel = 0
                base = (rpu >> 7) << 7
            ob = pl.multiple_of((rpu >> 7) << 7, 128)
            k = (scr_k[pl.ds(r, 1), :] - base).reshape(128, 1)
            a = (k == u).astype(jnp.float32)  # one one-hot, all 4 digits
            w = jnp.concatenate([p[rr : rr + 1] for p in planes], axis=0)
            out = jnp.dot(
                w, a, preferred_element_type=jnp.float32
            )  # (8, span): rows 2d/2d+1 = digit d hi/lo bytes
            h = out[0:1] * 256.0 + out[1:2]
            for j in range(1, 4):  # digit j lands j units after i0
                h = h + pltpu.roll(
                    out[2 * j : 2 * j + 1] * 256.0
                    + out[2 * j + 1 : 2 * j + 2],
                    j, axis=1,
                )
            if use_acc4:
                cur = acc4[pl.ds(bsel, 1), pl.ds(ob, span)]
                acc4[pl.ds(bsel, 1), pl.ds(ob, span)] = cur + h.astype(
                    jnp.int32
                )
            else:
                cur = units_ref[0, :, pl.ds(ob, span)]
                units_ref[0, :, pl.ds(ob, span)] = cur + h.astype(jnp.int32)

        def body(r8, _):
            # rows 8*r8 .. 8*r8+7 of each digit-byte plane are contiguous
            # in scr_d: one (8,128) load per plane per 8-row group,
            # row-selected by static slicing in registers
            planes = [scr_d[pl.ds(j * R + 8 * r8, 8), :] for j in range(8)]
            for rr in range(0, 8, row_step):  # R is a multiple of 8
                one_row(8 * r8 + rr, planes, rr)
            return 0

        jax.lax.fori_loop(0, R // 8, body, 0)

    def acc4_run(span, row_step):
        """Zero the four accumulators, pack into them, then fold them
        into units_ref with their 32-lane phase shifts (rolled-off tails
        hold only wrap junk — U_pad carries >= safe-span slack past the
        last writable window, so no valid lane reaches U_pad - 96)."""
        acc4[:] = jnp.zeros_like(acc4)
        pack_loop(span, row_step, use_acc4=True)
        lanes_u = jax.lax.broadcasted_iota(jnp.int32, (1, U_pad), 1)
        tot = acc4[pl.ds(0, 1), :]
        for b2 in (1, 2, 3):
            # buffer b2's lane l holds unit l + 32*b2: roll RIGHT by the
            # phase shift; the first 32*b2 lanes then hold wrap junk from
            # the buffer's tail (never valid data — the buffer's valid
            # extent ends >= 32*b2 lanes before U_pad by the safe-span
            # slack), so mask them off
            sh = pltpu.roll(acc4[pl.ds(b2, 1), :], 32 * b2, axis=1)
            tot = tot + jnp.where(lanes_u >= 32 * b2, sh, 0)
        units_ref[0, :, :] = tot

    tier_ref[0, 0, 0] = -1
    if _SKIP_PACK:  # benchmark hook: phases 1-4 only
        return

    def merged_pack(k, span, use_acc4=False):
        # compact each row left, then merge k tree levels; group-leader
        # rows (0 mod 2^k) carry the merged symbols for the pack loop
        live_mask = lane < livecnt
        planes = [
            jnp.where(live_mask, p, 0) for p in
            _compact_rows([kmat, T, nT, X, nX], is_sym, lane)
        ]
        for lvl in range(k):
            planes = _merge_rows(planes, live_m[lvl], lane, 1 << lvl)
        km, Tm, nTm, Xm, nXm = planes
        scr_k[:] = km
        write_digits(Tm, nTm, Xm, nXm)
        if use_acc4:
            acc4_run(span, 1 << k)
        else:
            pack_loop(span, 1 << k)

    def plain_pack(span, use_acc4=False):
        scr_k[:] = kmat
        write_digits(T, nT, X, nX)
        if use_acc4:
            acc4_run(span, 1)
        else:
            pack_loop(span, 1)

    # Ladder in measured-cost order (see the tier comment above); each
    # branch fires iff no cheaper branch's condition held. The final rung
    # is UNCONDITIONAL: its span comes from _safe_span's per-mode
    # worst-case bound (ROW_SPAN for every mode except direct +
    # coded_runs, whose 48-bit symbols need 640), so no stripe can fall
    # through to an all-zero pack while bits_ref reports a length.
    safe = _safe_span(mode, coded_runs, run_bits)
    ladder = [
        (tier_ok4(2), functools.partial(merged_pack, 2, 128, True)),
        (tier_ok(2, FAST_SPAN), functools.partial(merged_pack, 2, FAST_SPAN)),
        (tier_ok4(1), functools.partial(merged_pack, 1, 128, True)),
        (tier_ok(1, FAST_SPAN), functools.partial(merged_pack, 1, FAST_SPAN)),
        (tier_ok(1, WIDE_SPAN), functools.partial(merged_pack, 1, WIDE_SPAN)),
        (span_need32 <= 128, functools.partial(plain_pack, 128, True)),
        (span_need <= FAST_SPAN, functools.partial(plain_pack, FAST_SPAN)),
        (span_need <= WIDE_SPAN, functools.partial(plain_pack, WIDE_SPAN)),
        (span_need >= 0, functools.partial(plain_pack, safe)),
    ]
    rungs = list(enumerate(ladder))[_LADDER_START:_LADDER_STOP]
    if _LADDER_STOP is not None and rungs[-1][0] != len(ladder) - 1:
        rungs.append((len(ladder) - 1, ladder[-1]))  # keep the safe rung
    prev = None
    for idx, (cond, body) in rungs:
        fire = cond if prev is None else jnp.logical_not(prev) & cond

        def fired(idx=idx, body=body):
            tier_ref[0, 0, 0] = idx
            body()

        pl.when(fire)(fired)
        prev = cond if prev is None else prev | cond


def encode_stripes_fused(
    pixels: jax.Array,
    cfg: CodecConfig,
    n_stripes: int,
    cat_lengths: jax.Array,
    cat_codes: jax.Array,
    adaptive_scale: jax.Array | None = None,
    chroma: bool = False,
    run_lengths: jax.Array | None = None,
    run_codes: jax.Array | None = None,
    vmin: int = 0,
    return_tiers: bool = False,
    return_block_bits: bool = False,
) -> PackedStripes | tuple:
    """(NB, n2) u8 blocks -> packed stripes, entirely on device.

    Semantically identical (byte-identical streams) to
    rle_encode_positional + symbol_chunks + pack_chunks, fused with the
    transform. Covers block_size 4/8/16 and every entropy mode: category
    (cat_lengths/cat_codes = the 16-entry category table), direct
    (cat_lengths/cat_codes = the 512-entry value table — 511 values +
    ESC, up to the 640-entry dtab bound — plus
    vmin), and none (tables ignored). run_lengths/run_codes: (65,)
    canonical run table — runs 0..63 plus the all-zero-block terminal
    run 64 — for cfg.coded_runs (block_size <= 8 only).
    """
    from dct_tpu.ops import bitstream as bs

    nb, n2 = pixels.shape
    if n2 not in (16, 64, 256):
        raise ValueError("fused encode kernel requires 4x4/8x8/16x16 blocks")
    bps = nb // n_stripes  # blocks per stripe
    rows_per_block = 2 if n2 == 256 else 1
    bpr = max(1, 128 // n2)  # whole blocks per row (1 row-pair for 16x16)

    rows_live = -(-bps * rows_per_block // bpr) if n2 != 256 else 2 * bps
    R = -(-rows_live // 8) * 8
    blocks_padded = R * bpr // rows_per_block
    px = pixels.reshape(n_stripes, bps, n2)
    pad_blocks = blocks_padded - bps
    if pad_blocks:
        px = jnp.pad(px, ((0, 0), (0, pad_blocks), (0, 0)))
    px = px.reshape(n_stripes, R, 128)

    scale_cols = 1 if n2 == 256 else bpr
    if cfg.adaptive:
        if adaptive_scale is None:
            raise ValueError("adaptive fused encode requires adaptive_scale")
        # reciprocal in XLA (shared rounding with the einsum path)
        s = (1.0 / adaptive_scale.astype(jnp.float32)).reshape(n_stripes, bps)
        if pad_blocks:
            s = jnp.pad(s, ((0, 0), (0, pad_blocks)), constant_values=1.0)
        if n2 == 256:  # one scale per block, rows hold half-blocks
            s = jnp.repeat(s, 2, axis=1)
        s = s.reshape(n_stripes, R, scale_cols)
    else:
        s = jnp.ones((n_stripes, R, scale_cols), jnp.float32)

    if n2 == 256:
        from dct_tpu import tables as _tables

        parts = _tables.fused_encode_operator_split(cfg, chroma=chroma)
        em0, em1, em2 = parts[0], parts[1], parts[2]  # (256, 256) bf16
        eb = np.asarray(parts[3], np.float32).reshape(2, 128)
    else:
        em0, em1, em2, eb = tpk._packed_encode_operator_split(
            cfg, chroma=chroma
        )
    mode = cfg.huffman_mode if cfg.use_huffman else "none"
    units_capacity = bps * bs.units_per_block_worst(n2, cfg.coded_runs)
    # pad with the final rung's span: its 128-aligned window starting at
    # the last row's base must stay inside the buffer
    U_pad = -(-(units_capacity
                + _safe_span(mode, cfg.coded_runs, bs.run_field_bits(n2)))
              // 128) * 128

    n_alpha = 0
    if mode == "direct":
        # (640, 1) i32 packed table len<<16 | code for the in-kernel
        # masked-reduce gather; alphabet = 511 values + ESC
        n_alpha = int(cat_lengths.shape[0]) - 1
        dl = cat_lengths.astype(jnp.int32)
        dc_ = cat_codes.astype(jnp.int32)
        dtab = jnp.zeros((640, 1), jnp.int32)
        dtab = dtab.at[: n_alpha + 1, 0].set((dl << 16) | (dc_ & 0xFFFF))
        lens3 = jnp.zeros((1, 1, 16), jnp.int32)
        codes3 = jnp.zeros((1, 1, 16), jnp.int32)
    elif mode == "category":
        dtab = jnp.zeros((640, 1), jnp.int32)
        lens3 = cat_lengths.astype(jnp.int32).reshape(1, 1, -1)
        codes3 = cat_codes.astype(jnp.int32).reshape(1, 1, -1)
    else:  # none
        dtab = jnp.zeros((640, 1), jnp.int32)
        lens3 = jnp.zeros((1, 1, 16), jnp.int32)
        codes3 = jnp.zeros((1, 1, 16), jnp.int32)
    if cfg.coded_runs:
        if run_lengths is None:
            raise ValueError("coded_runs fused encode requires a run table")
        rlens3 = run_lengths.astype(jnp.int32).reshape(1, 1, 65)
        rcodes3 = run_codes.astype(jnp.int32).reshape(1, 1, 65)
    else:
        rlens3 = jnp.zeros((1, 1, 65), jnp.int32)
        rcodes3 = jnp.zeros((1, 1, 65), jnp.int32)

    kernel = functools.partial(
        _fused_kernel,
        n_live_blocks=bps,
        adaptive=cfg.adaptive,
        run_bits=bs.run_field_bits(n2),
        coded_runs=cfg.coded_runs,
        dc_prediction=cfg.dc_prediction,
        n2=n2,
        mode=mode,
        vmin=vmin,
        n_alpha=n_alpha,
    )
    scratch = [
        pltpu.VMEM((R, 128), jnp.int32),
        pltpu.VMEM((8 * R, 128), jnp.float32),
        pltpu.VMEM((R, 1), jnp.int32),   # scr_base (per-row first unit)
    ]
    if mode == "direct":
        scratch.append(pltpu.VMEM((2 * R, 128), jnp.int32))
    # acc4: the phase-shifted accumulator quartet for the 128-span rungs
    scratch.append(pltpu.VMEM((4, U_pad), jnp.int32))
    bbits_cols = 1 if n2 == 256 else bpr
    units, bits, tiers, bbits = pl.pallas_call(
        kernel,
        grid=(n_stripes,),
        in_specs=[
            pl.BlockSpec((1, 1, 16), lambda i: (0, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 16), lambda i: (0, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 65), lambda i: (0, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 65), lambda i: (0, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((640, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(em0.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(em0.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(em0.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(eb.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, scale_cols), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, U_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, R, bbits_cols), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_stripes, 1, U_pad), jnp.int32),
            jax.ShapeDtypeStruct((n_stripes, 1, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_stripes, 1, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_stripes, R, bbits_cols), jnp.int32),
        ),
        scratch_shapes=scratch,
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=n_stripes
            * (2 * R * 128 * 128 * 3 + R * (2 * 8 * 128 * ROW_SPAN + 2 * 128 * ROW_SPAN)),
            bytes_accessed=n_stripes * (R * 128 + U_pad * 4),
            transcendentals=0,
        ),
    )(
        lens3, codes3, rlens3, rcodes3, dtab, px,
        jnp.asarray(em0), jnp.asarray(em1), jnp.asarray(em2),
        jnp.asarray(eb), s,
    )
    packed = PackedStripes(
        units=units[:, 0, :units_capacity].astype(jnp.uint16),
        bit_lengths=bits[:, 0, 0],
    )
    out = [packed]
    if return_tiers:
        out.append(tiers[:, 0, 0])
    if return_block_bits:
        if n2 == 256:  # fold the per-row halves back into per-block bits
            bb = bbits.reshape(n_stripes, R // 2, 2).sum(-1)
        else:
            bb = bbits.reshape(n_stripes, R * bpr)
        out.append(bb[:, :bps])
    return out[0] if len(out) == 1 else tuple(out)
