"""Huffman coding: device-side histograms, host-side canonical table
construction, and the reference's per-block size-estimate semantics.

The reference builds a per-block Huffman tree over raw RLE values with a
min-heap (entropy.c:15-128, :261-328) and only ever *estimates* sizes
(get_encoded_size, entropy.c:363-399) — codes are never emitted as bits
(SURVEY.md B2). This module supplies what a real TPU codec needs instead:

  * per-image (per-plane) tables built from a GLOBAL symbol histogram —
    computed on device as a vectorized bincount and combined across shards
    with a psum (parallel/shard_encode.py), so every shard derives the
    identical table and the bitstream is mesh-shape-independent;
  * canonical code assignment (codes derivable from lengths alone, so the
    container serializes 16 bytes of lengths instead of a tree);
  * JPEG-style magnitude-category value coding (bounded 12-symbol alphabet +
    raw extra bits) as the default, with "direct" value coding as the mode
    closest to the reference's per-value alphabet;
  * an exact reimplementation of the reference's size-estimate accounting
    (Huffman total bits are tie-break-invariant, so an independent heap
    gives identical sums — including quirk B3: a single-symbol alphabet
    costs 0 bits/value).

Tree construction is inherently serial and tiny (alphabet <= 16 for category
mode); it runs on host in NumPy, fed by device histograms.
"""

from __future__ import annotations

import heapq

import jax
import jax.numpy as jnp
import numpy as np

MAX_CODE_LEN = 16  # canonical tables cap code length at 16 bits
NUM_CATEGORIES = 16  # categories 0..15; |value| < 2^15 always holds here
RUN_BITS = 8  # fixed-length run field, reference convention (entropy.c:390)
# Runs 0..n2: the positional RLE's terminal-zero symbol of an ALL-ZERO
# block carries run = n2 (64 zeros precede nothing; the decoder's pos+=run
# then simply ends the block), so the alphabet has 65 entries for 8x8.
RUN_ALPHABET = 65
# Coded-runs mode (cfg.coded_runs) Huffman-codes the run field instead of
# spending a flat 8 bits (~83% of runs are <= 3 on photographic content).
# Capping run codes at 8 bits keeps every worst-case shape (bits/symbol,
# units/block, kernel spans) identical to the fixed-run layout.
RUN_MAX_CODE_LEN = 8


# ---------------------------------------------------------------------------
# Magnitude categories (JPEG-style value coding)
# ---------------------------------------------------------------------------


def category_of(values: jax.Array) -> jax.Array:
    """Bits needed for |v|: cat(0) = 0, cat(v) = floor(log2|v|) + 1.

    Works on int32 arrays; uses float log2-free formulation via bit twiddling
    (31 - clz). Max relevant category is 11 (|coeff| <= 2047).
    """
    a = jnp.abs(values)
    # ceil(log2(a+1)) via count of significant bits.
    return (32 - jax.lax.clz(a.astype(jnp.int32))) * (a > 0)


def category_extra_bits(values: jax.Array, cats: jax.Array) -> jax.Array:
    """JPEG 'additional bits' for a value within its category.

    v > 0: the low ``cat`` bits of v. v < 0: low ``cat`` bits of
    ``v + 2^cat - 1`` (one's-complement style). Returned as uint32.
    """
    v = values.astype(jnp.int32)
    adj = jnp.where(v < 0, v + (1 << cats) - 1, v)
    mask = jnp.where(cats >= 32, jnp.int32(-1), (1 << cats) - 1)
    return (adj & mask).astype(jnp.uint32)


def value_from_category(cat: np.ndarray, extra: np.ndarray) -> np.ndarray:
    """Inverse of category coding (host-side decode)."""
    cat = np.asarray(cat, np.int64)
    extra = np.asarray(extra, np.int64)
    half = np.where(cat > 0, 1 << np.maximum(cat - 1, 0), 0)
    neg = (cat > 0) & (extra < half)
    val = np.where(neg, extra - (1 << cat) + 1, extra)
    return np.where(cat == 0, 0, val).astype(np.int32)


# ---------------------------------------------------------------------------
# Device histograms
# ---------------------------------------------------------------------------


def category_histogram_masked(values: jax.Array, live: jax.Array) -> jax.Array:
    """Histogram of symbol categories over live symbols (mask form).

    Compare-and-reduce over the 16 bins — no scatter (XLA lowers scatter to
    a serial loop on TPU; 16 fused reduction channels are pure VPU work).
    Returns (NUM_CATEGORIES,) int32 — psum-able across shards.
    """
    cats = jnp.where(live, category_of(values), -1)
    bins = jnp.arange(NUM_CATEGORIES, dtype=jnp.int32)
    eq = cats[..., None] == bins  # (..., 16)
    return jnp.sum(eq, axis=tuple(range(eq.ndim - 1)), dtype=jnp.int32)


def category_histogram(values: jax.Array, counts: jax.Array) -> jax.Array:
    """Histogram of symbol categories over live RLE symbols.

    values: (B, S) int32; counts: (B,) live symbols per block.
    Returns (NUM_CATEGORIES,) int32 — psum-able across shards.
    """
    B, S = values.shape
    s_idx = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
    return category_histogram_masked(values, s_idx < counts[:, None])


def value_histogram(
    values: jax.Array, counts: jax.Array, vmin: int, vmax: int
) -> jax.Array:
    """Histogram of raw symbol values over [vmin, vmax] (direct mode).

    Out-of-range values land in the final overflow bin (reserved ESC symbol).
    Returns (vmax - vmin + 2,) int32: alphabet bins + ESC.
    """
    B, S = values.shape
    n_bins = vmax - vmin + 1
    s_idx = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
    live = s_idx < counts[:, None]
    shifted = values - vmin
    in_range = (shifted >= 0) & (shifted < n_bins)
    idx = jnp.where(live & in_range, shifted, jnp.where(live, n_bins, n_bins + 1))
    hist = jnp.zeros(n_bins + 2, jnp.int32).at[idx.ravel()].add(1)
    return hist[: n_bins + 1]  # [alphabet..., ESC]


# ---------------------------------------------------------------------------
# Host-side table construction (tiny + serial; deterministic)
# ---------------------------------------------------------------------------


def huffman_code_lengths(freqs: np.ndarray, max_len: int = MAX_CODE_LEN) -> np.ndarray:
    """Optimal prefix-code lengths from symbol frequencies.

    Deterministic tie-breaking (heap keyed on (freq, creation order)); total
    weighted length equals any other valid Huffman coder's — the quantity
    the reference's get_encoded_size measures is tie-invariant.

    Symbols with zero frequency get length 0 (absent). A single-symbol
    alphabet gets length 1 (decodable; contrast reference quirk B3 which
    assigns the empty code). Lengths exceeding ``max_len`` are re-balanced
    with the JPEG adjust-bits procedure.
    """
    freqs = np.asarray(freqs, np.int64)
    n = len(freqs)
    present = np.nonzero(freqs > 0)[0]
    lengths = np.zeros(n, np.int32)
    if len(present) == 0:
        return lengths
    if len(present) == 1:
        lengths[present[0]] = 1
        return lengths

    # (freq, tiebreak, node) — node is a leaf symbol int or a merged tuple.
    heap = [(int(freqs[s]), i, int(s)) for i, s in enumerate(present)]
    heapq.heapify(heap)
    tiebreak = len(heap)
    while len(heap) > 1:
        f1, _, n1 = heapq.heappop(heap)
        f2, _, n2 = heapq.heappop(heap)
        heapq.heappush(heap, (f1 + f2, tiebreak, (n1, n2)))
        tiebreak += 1

    def walk(node, depth):
        if isinstance(node, int):
            lengths[node] = max(depth, 1)
            return
        walk(node[0], depth + 1)
        walk(node[1], depth + 1)

    walk(heap[0][2], 0)

    if lengths.max() > max_len:
        lengths = _limit_lengths(lengths, freqs, max_len)
    return lengths


def _limit_lengths(lengths: np.ndarray, freqs: np.ndarray, max_len: int) -> np.ndarray:
    """JPEG Annex K.3-style adjust-bits: fold over-long codes under max_len.

    Operates on the count-per-length histogram; preserves Kraft equality and
    prefix-decodability, then reassigns lengths to symbols ordered by
    (frequency desc, symbol index asc)."""
    counts = np.bincount(lengths[lengths > 0], minlength=33)
    if len(counts) < 33:
        counts = np.pad(counts, (0, 33 - len(counts)))
    for ln in range(32, max_len, -1):
        while counts[ln] > 0:
            j = ln - 2
            while counts[j] == 0:
                j -= 1
            counts[ln] -= 2
            counts[ln - 1] += 1
            counts[j] -= 1
            counts[j + 1] += 2
    order = np.lexsort((np.arange(len(freqs)), -freqs))
    order = [s for s in order if freqs[s] > 0]
    out = np.zeros_like(lengths)
    it = iter(order)
    for ln in range(1, max_len + 1):
        for _ in range(int(counts[ln])):
            out[next(it)] = ln
    return out


def canonical_codes(lengths: np.ndarray) -> np.ndarray:
    """Canonical Huffman codes (uint32) from lengths.

    Codes assigned in (length, symbol) order — the decoder rebuilds the
    identical table from lengths alone, which is all the container stores.
    """
    lengths = np.asarray(lengths, np.int32)
    codes = np.zeros(len(lengths), np.uint32)
    code = 0
    prev_len = 0
    for sym in np.lexsort((np.arange(len(lengths)), lengths)):
        ln = int(lengths[sym])
        if ln == 0:
            continue
        code <<= ln - prev_len
        codes[sym] = code
        code += 1
        prev_len = ln
    return codes


class CanonicalTable:
    """A canonical Huffman table: lengths + derived codes + decode index."""

    def __init__(self, lengths: np.ndarray):
        self.lengths = np.asarray(lengths, np.int32)
        # Wire-level validation (containers store raw u8 lengths): lengths
        # over 32 overflow code construction, and an over-subscribed Kraft
        # sum cannot be a prefix code — both mean a corrupt table.
        if np.any(self.lengths < 0) or np.any(self.lengths > 32):
            raise ValueError("invalid canonical code length (must be 0..32)")
        live = self.lengths[self.lengths > 0]
        # exact comparison: the ldexp terms sum exactly in float64 (minimum
        # over-subscription excess is 2^-32, far above f64 resolution here)
        if live.size and float(np.sum(np.ldexp(1.0, -live))) > 1.0:
            raise ValueError("over-subscribed canonical Huffman table")
        self.codes = canonical_codes(self.lengths)
        # Decode tables: symbols sorted by (length, symbol).
        order = [
            s for s in np.lexsort((np.arange(len(lengths)), self.lengths))
            if self.lengths[s] > 0
        ]
        self.sorted_symbols = np.asarray(order, np.int32)
        self.sorted_lengths = self.lengths[self.sorted_symbols]
        self.sorted_codes = self.codes[self.sorted_symbols]

    @classmethod
    def from_frequencies(cls, freqs: np.ndarray, max_len: int = MAX_CODE_LEN):
        return cls(huffman_code_lengths(freqs, max_len))

    def decode_one(self, bit_reader) -> int:
        """Decode a single symbol (host-side reference decoder)."""
        code = 0
        ln = 0
        i = 0
        n = len(self.sorted_symbols)
        while i < n:
            target = int(self.sorted_lengths[i])
            while ln < target:
                code = (code << 1) | bit_reader.read_bit()
                ln += 1
            while i < n and int(self.sorted_lengths[i]) == ln:
                if int(self.sorted_codes[i]) == code:
                    return int(self.sorted_symbols[i])
                i += 1
        raise ValueError("invalid Huffman code in stream")


# ---------------------------------------------------------------------------
# Static default table (single-pass mode)
# ---------------------------------------------------------------------------

# Category frequencies of typical natural-image DCT statistics (Laplacian
# coefficient distribution): cat 0 and small categories dominate. Building
# the canonical table from these fixed pseudo-frequencies gives a JPEG-style
# default table, enabling single-dispatch encode with no histogram sync
# (config.static_tables). Any stream remains decodable: every category has a
# nonzero frequency, so every symbol gets a code.
_DEFAULT_CATEGORY_PSEUDO_FREQS = np.array(
    [4000, 2600, 1700, 1100, 700, 420, 230, 110, 45, 16, 5, 2, 1, 1, 1, 1],
    np.int64,
)


@np.errstate(all="ignore")
def default_category_table() -> "CanonicalTable":
    return CanonicalTable.from_frequencies(_DEFAULT_CATEGORY_PSEUDO_FREQS)


# Run-length frequencies measured over synthetic photographic content at
# qualities 25-90 (run 0 is ~61% of symbols; the tail bump near 40-63 is the
# terminal-zero symbol of early-ending blocks). +1 smoothing keeps every run
# 0..63 encodable with the static table.
_DEFAULT_RUN_PSEUDO_FREQS = np.array(
    [36911, 8829, 3351, 1929, 1133, 752, 534, 402, 314, 353, 385, 149,
     116, 115, 101, 80, 83, 90, 66, 78, 176, 154, 75, 21, 74, 68, 41, 18,
     48, 63, 64, 58, 57, 42, 28, 27, 35, 24, 43, 115, 46, 47, 3, 216,
     207, 189, 121, 71, 9, 97, 153, 171, 152, 74, 321, 219, 116, 71, 326,
     854, 130, 730, 146, 33,
     200],  # run 64: the all-zero block's terminal symbol
    np.int64,
) + 1


def default_run_table() -> "CanonicalTable":
    return CanonicalTable.from_frequencies(
        _DEFAULT_RUN_PSEUDO_FREQS, max_len=RUN_MAX_CODE_LEN
    )


def run_histogram_masked(runs: jax.Array, live: jax.Array) -> jax.Array:
    """Histogram of run lengths over live symbols, (RUN_ALPHABET,) int32 —
    psum-able across shards (coded-runs mode table construction)."""
    r = jnp.where(live, runs, -1)
    bins = jnp.arange(RUN_ALPHABET, dtype=jnp.int32)
    eq = r[..., None] == bins
    return jnp.sum(eq, axis=tuple(range(eq.ndim - 1)), dtype=jnp.int32)


# ---------------------------------------------------------------------------
# Reference size-estimate semantics (parity with get_encoded_size)
# ---------------------------------------------------------------------------


def reference_encoded_size_bits(
    values: np.ndarray, use_huffman: bool = True
) -> int:
    """Bit-size estimate with the reference's exact accounting
    (entropy.c:363-399):

      * Huffman mode: per-BLOCK Huffman over raw values; total =
        sum(freq * code_len) + 8 bits per symbol for the run. A
        single-symbol alphabet costs 0 bits per value (quirk B3: the root
        leaf gets the empty code).
      * non-Huffman: 24 bits per symbol (16 value + 8 run).

    Huffman totals are tie-invariant, so this matches the C heap bit-for-bit
    (asserted against the oracle in tests/test_entropy_stage.py).
    """
    values = np.asarray(values)
    count = len(values)
    if not use_huffman:
        return int(count * 24)
    if count == 0:
        return 0
    uniq, freqs = np.unique(values, return_counts=True)
    if len(uniq) == 1:
        return int(count * RUN_BITS)  # empty code for the lone symbol (B3)
    # Plain Huffman, no length cap (reference has none; depth < 32 in practice).
    lengths = huffman_code_lengths(freqs, max_len=32)
    return int((freqs * lengths).sum() + count * RUN_BITS)
