"""Device entropy decoder (ops/entropy_decode_pallas.py) + the container
v2 decode index (cfg.decode_index).

Contracts:
  * both encode paths (fused kernel bbits output, staged chunk-length
    sums) emit the SAME per-block bit index, and it sums to stripe_bits;
  * container v2 round-trips the index and rejects hostile ones;
  * the device decoder's pixels are IDENTICAL to the host decoders'
    across the mode lattice (the kernel runs in interpret mode on CPU,
    forced through the production decode path via the
    codec._FORCE_DEVICE_DECODE hook);
  * repair keeps an indexed container consistent.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from dct_tpu import container as cont
from dct_tpu.config import CodecConfig
from dct_tpu.models import codec
from dct_tpu.utils import image_io


@pytest.fixture
def force_device_decode(monkeypatch):
    monkeypatch.setattr(codec, "_FORCE_DEVICE_DECODE", True)


def _roundtrip_pair(im, cfg):
    data = codec.ImageCodec(cfg).encode(np.asarray(im))
    host = codec.ImageCodec(cfg).decode(data)
    dev = np.asarray(codec.ImageCodec(cfg).decode_to_device(data))
    return data, host, dev


@pytest.mark.parametrize(
    "mode,runs,dc,adaptive",
    [
        ("category", False, False, False),
        ("category", True, True, True),
        ("direct", False, False, False),
        ("direct", True, False, True),
        ("none", False, True, False),
        ("none", True, False, False),
    ],
)
def test_device_decode_matches_host(
    force_device_decode, mode, runs, dc, adaptive
):
    im = image_io.synthetic_image(40, 72, "photo", seed=3)
    cfg = CodecConfig(
        quality=40, huffman_mode=mode, coded_runs=runs, dc_prediction=dc,
        adaptive=adaptive, decode_index=True, use_pallas=True,
    )
    data = codec.ImageCodec(cfg).encode(np.asarray(im))
    # host reference decoded WITHOUT the force hook
    codec._FORCE_DEVICE_DECODE = False
    host = codec.ImageCodec(cfg).decode(data)
    codec._FORCE_DEVICE_DECODE = True
    dev = np.asarray(codec.ImageCodec(cfg).decode_to_device(data))
    np.testing.assert_array_equal(host, dev)


@pytest.mark.parametrize("n", [4, 16])
def test_device_decode_block_sizes(force_device_decode, n):
    im = image_io.synthetic_image(3 * n, 7 * n + 3, "photo", seed=n)
    cfg = CodecConfig(
        block_size=n, quality=40, decode_index=True, use_pallas=True,
        coded_runs=n <= 8,
    )
    data = codec.ImageCodec(cfg).encode(np.asarray(im))
    codec._FORCE_DEVICE_DECODE = False
    host = codec.ImageCodec(cfg).decode(data)
    codec._FORCE_DEVICE_DECODE = True
    dev = np.asarray(codec.ImageCodec(cfg).decode_to_device(data))
    np.testing.assert_array_equal(host, dev)


def test_device_decode_wide_image_multichunk(force_device_decode):
    """Regression: stripes wider than 128 blocks split into several grid
    cells, and every cell past the first has a nonzero 128-aligned region
    base. The kernel's window fetch subtracted the REGION-RELATIVE first
    unit from the ABSOLUTE bit cursor, so every block in chunk >= 1
    decoded garbage (caught on real hardware at 1080p, round 5 — every
    prior test image was < 1024 px wide)."""
    im = image_io.synthetic_image(16, 2048, "photo", seed=0)
    cfg = CodecConfig(quality=50, decode_index=True, use_pallas=True)
    data = codec.ImageCodec(cfg).encode(np.asarray(im))
    codec._FORCE_DEVICE_DECODE = False
    host = codec.ImageCodec(cfg).decode(data)
    codec._FORCE_DEVICE_DECODE = True
    dev = np.asarray(codec.ImageCodec(cfg).decode_to_device(data))
    np.testing.assert_array_equal(host, dev)


def test_block_bits_match_staged_and_fused():
    """The fused kernel's bbits output == the staged chunk-length sums,
    and both sum to the stripe bit lengths."""
    from dct_tpu.ops import blocks as blk
    from dct_tpu.ops import fused_encode_pallas as fe
    from dct_tpu.ops import huffman as hf
    from dct_tpu.ops import rle, transform

    cfg = CodecConfig(quality=50, static_tables=True, use_pallas=True)
    rng = np.random.default_rng(1)
    im = rng.integers(0, 256, (32, 64)).astype(np.uint8)
    px = blk.image_to_blocks(jnp.asarray(im), 8)
    lengths, codes = codec._table_arrays(hf.default_category_table(50))
    packed, bb = fe.encode_stripes_fused(
        px, cfg, 4, lengths, codes, return_block_bits=True
    )
    zz = transform.encode_blocks(px, cfg)
    sym = rle.rle_encode_positional(zz)
    _, cl = codec.symbol_chunks_for(sym, cfg, lengths, codes)
    want = np.asarray(jnp.sum(cl, axis=(1, 2))).reshape(4, -1)
    np.testing.assert_array_equal(np.asarray(bb), want)
    np.testing.assert_array_equal(
        np.asarray(bb).sum(1), np.asarray(packed.bit_lengths)
    )


def test_container_v2_roundtrip_and_hostile():
    im = image_io.synthetic_image(33, 61, "photo", seed=0)
    cfg = CodecConfig(quality=50, decode_index=True)
    data = codec.ImageCodec(cfg).encode(np.asarray(im))
    c = cont.deserialize(data)
    assert c.config.decode_index
    p = c.planes[0]
    assert int(p.block_bits.sum()) == int(p.stripe_bits.sum())

    # v1 containers stay readable and carry no index
    d0 = codec.ImageCodec(cfg.replace(decode_index=False)).encode(
        np.asarray(im)
    )
    assert cont.deserialize(d0).planes[0].block_bits is None
    # the index costs exactly flags2 + width byte + the bit-packed
    # entries at the narrowest per-plane width
    w_idx, packed_idx = cont.pack_index(p.block_bits)
    assert len(data) == len(d0) + 1 + 1 + len(packed_idx)
    assert w_idx == int(p.block_bits.max()).bit_length()

    # hostile index: corrupt one entry -> stripe-sum check rejects
    bad = bytearray(data)
    # the index sits right before the payload; find it by re-serializing
    # with a poked block_bits instead of byte surgery
    p_bad = cont.PlaneData(
        width=p.width, height=p.height, table_lengths=p.table_lengths,
        vmin=p.vmin, variance_codes=p.variance_codes,
        stripe_bits=p.stripe_bits, stripes=p.stripes,
        run_table_lengths=p.run_table_lengths,
        block_bits=p.block_bits.copy(),
    )
    p_bad.block_bits[0] += 8
    with pytest.raises(ValueError):
        cont.serialize(
            cont.Container(
                config=c.config, width=c.width, height=c.height,
                planes=[p_bad],
            )
        )
    # same corruption on the wire -> deserialize rejects
    idx_off = data.index(packed_idx)
    bad = bytearray(data)
    bad[idx_off] ^= 0x08
    with pytest.raises(ValueError):
        cont.deserialize(bytes(bad))

    # unknown extension flag bits are rejected, not ignored
    bad2 = bytearray(data)
    bad2[20] |= 0x04
    with pytest.raises(ValueError):
        cont.deserialize(bytes(bad2))

    # legacy round-4 v2 (raw u16 index, flags2 bit0 only) stays readable
    legacy = bytearray(d0)
    legacy[4] = 2  # version
    legacy[20:20] = bytes([1])  # insert flags2: index present, unpacked
    # the index sits right after this plane's stripe_bits table
    p_legacy = cont.deserialize(d0).planes[0]
    sb_off = len(legacy) - sum(len(s) for s in p_legacy.stripes)
    legacy[sb_off:sb_off] = p.block_bits.astype("<u2").tobytes()
    c_legacy = cont.deserialize(bytes(legacy))
    np.testing.assert_array_equal(
        c_legacy.planes[0].block_bits, p.block_bits
    )


def test_repair_updates_decode_index(force_device_decode):
    from dct_tpu.models import recovery

    im = image_io.synthetic_image(48, 64, "photo", seed=5)
    cfg = CodecConfig(quality=50, decode_index=True, use_pallas=True)
    data = codec.ImageCodec(cfg).encode(np.asarray(im))
    c = cont.deserialize(data)
    # corrupt stripe 2's payload, then repair from the source image
    p = c.planes[0]
    stripes = list(p.stripes)
    stripes[2] = bytes([b ^ 0xFF for b in stripes[2]])
    c.planes[0] = cont.PlaneData(
        width=p.width, height=p.height, table_lengths=p.table_lengths,
        vmin=p.vmin, variance_codes=p.variance_codes,
        stripe_bits=p.stripe_bits, stripes=stripes,
        run_table_lengths=p.run_table_lengths, block_bits=p.block_bits,
    )
    # grayscale containers address stripes by FLAT index (recovery.repair)
    fixed = recovery.repair(cont.serialize(c), np.asarray(im), [2])
    assert fixed == data  # byte-identical to a clean encode, index included
    dev = np.asarray(codec.ImageCodec(cfg).decode_to_device(fixed))
    codec._FORCE_DEVICE_DECODE = False
    host = codec.ImageCodec(cfg).decode(fixed)
    np.testing.assert_array_equal(host, dev)


def test_unindexed_or_unsupported_falls_back_to_host(force_device_decode):
    """No index -> host decoder; hostile >16-bit tables -> host decoder
    (which itself handles them) — never a crash."""
    im = image_io.synthetic_image(24, 40, "photo", seed=1)
    cfg = CodecConfig(quality=50, use_pallas=True)  # no decode_index
    data = codec.ImageCodec(cfg).encode(np.asarray(im))
    out = np.asarray(codec.ImageCodec(cfg).decode_to_device(data))
    assert out.shape == (24, 40)

    from dct_tpu.ops import entropy_decode_pallas as edp
    from dct_tpu.ops import huffman as hf

    long = np.zeros(32, np.int64)
    lengths = np.zeros(32, np.int32)
    lengths[:2] = [1, 17]  # a 17-bit code: device decoder must decline
    lengths[2] = 2
    t = hf.CanonicalTable(lengths)
    assert not edp.tables_supported(t, None)
    assert edp.decode_args(
        np.zeros((1, 128), np.int32), np.zeros((1, 4), np.int64),
        1, 64, "category", t,
    ) is None


@pytest.mark.parametrize(
    "kw",
    [
        dict(),
        dict(adaptive=True, coded_runs=True, dc_prediction=True),
        dict(huffman_mode="direct"),
    ],
    ids=["plain", "adaptive+runs+dc", "direct"],
)
def test_batched_video_device_decode(force_device_decode, kw):
    """Indexed frame stacks decode in ONE batched device dispatch
    (codec._device_decode_batch_step, the vmapped Pallas decode kernel)
    pixel-identical to the host decoders."""
    from dct_tpu.models.video import VideoCodec

    frames = np.stack([
        np.asarray(image_io.synthetic_image(40, 64, "photo", seed=s))
        for s in range(4)
    ])
    cfg = CodecConfig(quality=45, decode_index=True, use_pallas=True, **kw)
    streams = VideoCodec(cfg).encode(frames)
    dev = VideoCodec(cfg).decode(streams)
    codec._FORCE_DEVICE_DECODE = False
    host = np.stack([codec.decode(s) for s in streams])
    codec._FORCE_DEVICE_DECODE = True
    np.testing.assert_array_equal(dev, host)
