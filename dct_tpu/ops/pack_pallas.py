"""Pallas bit-pack kernel: chunk streams -> 16-bit stream units.

The packing problem is a segment-sum with sorted integer keys: chunk c
contributes its 32-bit window's high half to unit ``i0_c`` and low half to
``i0_c + 1``, where ``i0 = bit_offset >> 4`` is non-decreasing (offsets are
a cumsum of lengths). XLA alternatives measured on a 16.7 Mpix batch:
scatter +2.3 s (serial loop), searchsorted gathers +46 s (~66 ns/element),
tiled compare-reduce with scan combine +0.7 s. This kernel does the same
tiled compare-reduce entirely in VMEM, where the combine step is a cheap
in-place read-modify-write:

  * a tile of T chunks spans at most T*16 bits = T units, so its segment
    sum is a dense (T, T+256) one-hot multiply-reduce (pure VPU);
  * the tile result is added into the stripe's unit buffer AT ITS BASE —
    Mosaic allows dynamic lane offsets only at 128-lane multiples, so tile
    bases are pre-aligned down to 128 outside the kernel and the <=127-unit
    slack is absorbed into the span.

Grid = stripes; inside a cell a fori_loop walks chunk tiles (slices at
TILE multiples, hinted with pl.multiple_of). Exactness: windows < 2^16 are
exact in f32 and contributing bit ranges are disjoint, so unit sums stay
< 2^16 — every add exact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dct_tpu.ops.bitstream import PackedStripes

TILE = 256  # chunks per in-kernel tile (tunable; see pack_chunks_pallas)


def _span(tile: int) -> int:
    # tile*16 bits = tile units, + lo spill + <=127 alignment slack,
    # rounded up to the 128-lane grid
    return -(-(tile + 128) // 128) * 128 + 128


from dct_tpu.ops._mosaic import interpret as _interpret


def _pack_kernel(bases_ref, keys_ref, whi_ref, wlo_ref, out_ref, *, tile):
    """One grid cell = one stripe.

    bases_ref: (1, 1, n_tiles) int32 SMEM — 128-ALIGNED base unit per tile
    keys_ref:  (1, 1, C_pad) int32 — unit index i0 per chunk
    whi_ref:   (1, 1, C_pad) f32 — window high half (target i0)
    wlo_ref:   (1, 1, C_pad) f32 — window low half (target i0 + 1)
    out_ref:   (1, 1, U_pad) int32 — stream units
    """
    out_ref[:] = jnp.zeros_like(out_ref)
    n_tiles = bases_ref.shape[2]
    span = _span(tile)
    u = jax.lax.broadcasted_iota(jnp.int32, (tile, span), 1)

    def body(t, _):
        off = pl.multiple_of(t * tile, tile)
        base = bases_ref[0, 0, t]
        k = (keys_ref[0, :, pl.ds(off, tile)] - base).reshape(tile, 1)
        whi = whi_ref[0, :, pl.ds(off, tile)].reshape(tile, 1)
        wlo = wlo_ref[0, :, pl.ds(off, tile)].reshape(tile, 1)
        contrib = jnp.where(k == u, whi, 0.0) + jnp.where(k + 1 == u, wlo, 0.0)
        h = jnp.sum(contrib, axis=0, keepdims=True).astype(jnp.int32)
        ob = pl.multiple_of(base, 128)
        cur = out_ref[0, :, pl.ds(ob, span)]
        out_ref[0, :, pl.ds(ob, span)] = cur + h
        return 0

    jax.lax.fori_loop(0, n_tiles, body, 0)


def pack_chunks_pallas(
    chunk_values: jax.Array, chunk_lens: jax.Array, units_capacity: int,
    tile: int = TILE,
) -> PackedStripes:
    """Drop-in replacement for ops.bitstream.pack_chunks (byte-identical
    output, tested): (n_stripes, C, 3) chunks -> (n_stripes, U) units.

    ``tile`` must be a multiple of 128 (Mosaic dynamic lane slices require
    128-lane granularity in both offset and width)."""
    if tile % 128:
        raise ValueError("tile must be a multiple of 128")
    n_stripes = chunk_values.shape[0]
    cv = chunk_values.reshape(n_stripes, -1).astype(jnp.uint32)
    cl = chunk_lens.reshape(n_stripes, -1).astype(jnp.int32)
    C = cv.shape[1]

    csum = jnp.cumsum(cl, axis=1)
    offs = csum - cl
    bit_lengths = csum[:, -1]

    i0 = offs >> 4
    sh = offs & 15
    shift = jnp.clip(32 - cl - sh, 0, 31).astype(jnp.uint32)
    window = jnp.where(cl > 0, cv << shift, jnp.uint32(0))
    hi = (window >> 16).astype(jnp.float32)
    lo = (window & 0xFFFF).astype(jnp.float32)

    # pad chunk axis to a TILE multiple; padded chunks keep the final key
    # (monotone, zero weight)
    C_pad = -(-C // tile) * tile
    if C_pad != C:
        pad = C_pad - C
        i0 = jnp.pad(i0, ((0, 0), (0, pad)), mode="edge")
        hi = jnp.pad(hi, ((0, 0), (0, pad)))
        lo = jnp.pad(lo, ((0, 0), (0, pad)))
    n_tiles = C_pad // tile

    # 128-aligned tile bases (SMEM); the <=127 slack lives inside the span
    bases = (i0[:, ::tile] >> 7) << 7  # (S, n_tiles)
    bases = bases[:, None, :]

    import functools as _ft

    U_pad = -(-(units_capacity + _span(tile)) // 128) * 128

    units = pl.pallas_call(
        _ft.partial(_pack_kernel, tile=tile),
        grid=(n_stripes,),
        in_specs=[
            pl.BlockSpec((1, 1, n_tiles), lambda s: (s, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, C_pad), lambda s: (s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C_pad), lambda s: (s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C_pad), lambda s: (s, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, U_pad), lambda s: (s, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_stripes, 1, U_pad), jnp.int32),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=4 * n_stripes * C_pad * _span(tile),
            bytes_accessed=n_stripes * (C_pad * 12 + U_pad * 4),
            transcendentals=0,
        ),
    )(bases, i0[:, None, :], hi[:, None, :], lo[:, None, :])
    return PackedStripes(
        units=units[:, 0, :units_capacity].astype(jnp.uint16),
        bit_lengths=bit_lengths,
    )
