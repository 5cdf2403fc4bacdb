"""Coded-runs mode (cfg.coded_runs): Huffman-coded run fields.

The reference spends a flat 8 bits per run (entropy.c:390); ~83% of runs
are <= 3 on photographic content, so coding them cuts bitstreams ~40%.
These tests pin the contracts: identical reconstructions, strictly smaller
containers on photo content, byte-identical Python and native decoders,
and stripe repair byte-identity under the stored run table.
"""

from __future__ import annotations

import numpy as np
import pytest

from dct_tpu import native
from dct_tpu.config import CodecConfig
from dct_tpu.models import codec, recovery
from dct_tpu.ops import bitstream as bs
from dct_tpu.ops import huffman as hf
from dct_tpu.utils import image_io


@pytest.fixture(scope="module")
def image():
    return image_io.synthetic_image(120, 168, "photo", seed=13)


@pytest.mark.parametrize("mode", ["category", "direct", "none"])
@pytest.mark.parametrize("static", [False, True])
@pytest.mark.parametrize("adaptive", [False, True])
def test_roundtrip_and_smaller(image, mode, static, adaptive):
    if static and mode != "category":
        pytest.skip("static tables are category-only")
    base_cfg = CodecConfig(
        quality=55, adaptive=adaptive, use_huffman=mode != "none",
        huffman_mode=mode, static_tables=static,
    )
    cr_cfg = base_cfg.replace(coded_runs=True)
    base = codec.ImageCodec(base_cfg).encode(image)
    cr = codec.ImageCodec(cr_cfg).encode(image)
    assert len(cr) < len(base)  # photo content: coded runs always win
    rec_base = codec.ImageCodec(base_cfg).decode(base)
    rec_cr = codec.ImageCodec(cr_cfg).decode(cr)
    np.testing.assert_array_equal(rec_cr, rec_base)  # same quantized coeffs


def test_python_and_native_decoders_agree(image):
    cfg = CodecConfig(quality=50, coded_runs=True)
    data = codec.ImageCodec(cfg).encode(image)
    from dct_tpu import container as cont

    c = cont.deserialize(data)
    p = c.planes[0]
    bh, bw, n_stripes = codec._padded_grid(p.height, p.width, c.config)
    bps = (bh // n_stripes) * bw
    table = hf.CanonicalTable(p.table_lengths)
    run_table = hf.CanonicalTable(p.run_table_lengths)

    py = np.concatenate([
        bs.unpack_stripe_host(
            p.stripes[s], bps, 64, "category",
            cat_table=table, vmin=codec.DIRECT_VMIN, run_table=run_table,
        )
        for s in range(n_stripes)
    ])
    if not native.available():
        pytest.skip("native decoder unavailable")
    nat = native.unpack_stripes(
        p.stripes, bps, 64, "category", table, codec.DIRECT_VMIN,
        run_table=run_table,
    )
    np.testing.assert_array_equal(py, nat)


def test_recovery_with_coded_runs(image):
    cfg = CodecConfig(quality=55, coded_runs=True, stripe_rows=2)
    original = codec.ImageCodec(cfg).encode(image)
    assert recovery.verify(original) == []
    raw = bytearray(original)
    raw[-20:-12] = b"\x5a" * 8
    damaged = recovery.verify(bytes(raw))
    assert damaged
    repaired = recovery.repair(bytes(raw), image)
    assert repaired == original


def test_color_and_video_coded_runs(image):
    rgb = np.stack([image, np.roll(image, 3, 0), np.roll(image, 5, 1)], -1)
    cfg = CodecConfig(quality=70, chroma="420", coded_runs=True)
    data = codec.encode(rgb, cfg)
    rec = codec.decode(data)
    assert rec.shape == rgb.shape

    from dct_tpu.models.video import VideoCodec

    frames = np.stack([image, image[::-1]])
    vc = VideoCodec(CodecConfig(quality=60, coded_runs=True))
    streams = vc.encode(frames)
    np.testing.assert_array_equal(
        vc.decode(streams),
        VideoCodec(CodecConfig(quality=60)).decode(
            VideoCodec(CodecConfig(quality=60)).encode(frames)
        ),
    )


def test_all_zero_blocks_run64():
    """An all-zero block's terminal symbol carries run = 64 (the full
    alphabet's last entry); regression for the 64-entry table that
    clip-indexed it. Flat-128 input quantizes to all-zero blocks."""
    img = np.full((32, 40), 128, np.uint8)
    for static in (False, True):
        cfg = CodecConfig(quality=50, coded_runs=True, static_tables=static)
        data = codec.ImageCodec(cfg).encode(img)
        assert recovery.verify(data) == []
        rec = codec.ImageCodec(cfg).decode(data)
        np.testing.assert_array_equal(rec, img)
