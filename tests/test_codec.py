"""End-to-end codec tests: container format, grayscale/color round trips,
PSNR targets vs the (corrected) reference behavior."""

import numpy as np
import pytest

from dct_tpu import container as cont
from dct_tpu.config import CodecConfig
from dct_tpu.models import codec
from dct_tpu.utils import image_io, metrics


@pytest.fixture(scope="module")
def photo():
    return image_io.synthetic_image(96, 80, "photo", seed=0)


class TestContainer:
    def test_header_roundtrip(self):
        cfg = CodecConfig(quality=77, adaptive=True, huffman_mode="direct",
                          compat_b1=True, stripe_rows=3)
        c = cont.Container(
            config=cfg, width=100, height=50,
            planes=[cont.PlaneData(
                width=100, height=50,
                table_lengths=np.arange(512, dtype=np.uint8) % 16,
                vmin=-255,
                # padded grid for 50x100 @ n=8, stripe_rows=3:
                # bh = ceil(ceil(50/8)/3)*3 = 9, bw = 13
                variance_codes=np.arange(9 * 13, dtype=np.uint8) % 251,
                stripe_bits=np.array([16, 24, 3], np.uint32),
                stripes=[b"ab", b"xyz", b"q"],
            )],
        )
        c2 = cont.deserialize(cont.serialize(c))
        # the wire carries the RESOLVED index decision, never "auto"
        # (this skeleton has no block_bits -> auto resolves to False)
        assert c2.config == cfg.replace(decode_index=False)
        assert (c2.width, c2.height) == (100, 50)
        p = c2.planes[0]
        np.testing.assert_array_equal(p.table_lengths, c.planes[0].table_lengths)
        np.testing.assert_array_equal(p.stripe_bits, c.planes[0].stripe_bits)
        assert p.stripes == c.planes[0].stripes
        # padded grid for 50x100 @ n=8, stripe_rows=3: bh=ceil(7/3)*3=9, bw=13
        np.testing.assert_array_equal(
            p.variance_codes, c.planes[0].variance_codes
        )

    def test_bad_magic(self):
        with pytest.raises(ValueError):
            cont.deserialize(b"NOPE" + b"\0" * 64)


class TestGrayscale:
    @pytest.mark.parametrize("quality,min_psnr", [(10, 26), (50, 29), (90, 33)])
    def test_quality_sweep(self, photo, quality, min_psnr):
        cfg = CodecConfig(quality=quality)
        data = codec.encode(photo, cfg)
        rec = codec.decode(data)
        assert rec.shape == photo.shape and rec.dtype == np.uint8
        assert metrics.psnr(rec, photo) >= min_psnr

    def test_beats_reference_psnr(self, photo):
        """North-star requirement: default path PSNR >= reference at every
        quant table. The reference's non-adaptive decode is broken by B1
        (13.21 dB at q50); correct dequant clears it by >15 dB."""
        for q in (10, 50, 90):
            rec_good = codec.decode(codec.encode(photo, CodecConfig(quality=q)))
            rec_b1 = codec.decode(
                codec.encode(photo, CodecConfig(quality=q, compat_b1=True))
            )
            assert metrics.psnr(rec_good, photo) > metrics.psnr(rec_b1, photo)

    def test_adaptive_roundtrip(self, photo):
        cfg = CodecConfig(quality=50, adaptive=True)
        rec = codec.decode(codec.encode(photo, cfg))
        assert metrics.psnr(rec, photo) >= 28

    def test_nonaligned_dims(self):
        """Sizes not multiples of 8 (and of stripe_rows) pad by edge
        replication and crop back exactly."""
        img = image_io.synthetic_image(37, 61, "photo", seed=3)
        for spr in (1, 2, 5):
            cfg = CodecConfig(quality=90, stripe_rows=spr)
            rec = codec.decode(codec.encode(img, cfg))
            assert rec.shape == img.shape
            assert metrics.psnr(rec, img) >= 30

    def test_stripe_rows_invariance(self, photo):
        """Different stripe partitions change only framing, not content:
        decoded images must be identical."""
        recs = [
            codec.decode(codec.encode(photo, CodecConfig(quality=50, stripe_rows=s)))
            for s in (1, 2, 4)
        ]
        np.testing.assert_array_equal(recs[0], recs[1])
        np.testing.assert_array_equal(recs[0], recs[2])

    def test_flat_image_tiny_stream(self):
        img = image_io.synthetic_image(64, 64, "flat", seed=1)
        data = codec.encode(img, CodecConfig(quality=50))
        assert len(data) < img.size // 8  # >8:1 on near-flat content

    @pytest.mark.parametrize("mode", ("category", "direct", "none"))
    def test_huffman_modes_agree(self, photo, mode):
        """Entropy mode changes bytes, never pixels."""
        cfg = CodecConfig(quality=50, huffman_mode=mode, use_huffman=mode != "none")
        rec = codec.decode(codec.encode(photo, cfg))
        base = codec.decode(codec.encode(photo, CodecConfig(quality=50)))
        np.testing.assert_array_equal(rec, base)

    def test_block_size_16(self):
        """Non-8 block sizes use the radial quant table
        (quantization.c:81-95)."""
        img = image_io.synthetic_image(64, 64, "photo", seed=5)
        cfg = CodecConfig(quality=50, block_size=16)
        rec = codec.decode(codec.encode(img, cfg))
        assert rec.shape == img.shape
        assert metrics.psnr(rec, img) >= 24


class TestColor:
    @pytest.mark.parametrize("chroma", ("444", "420"))
    def test_color_roundtrip(self, chroma):
        img = image_io.synthetic_image(64, 48, "photo", seed=2, color=True)
        cfg = CodecConfig(quality=80, chroma=chroma)
        data = codec.encode(img, cfg)
        rec = codec.decode(data)
        assert rec.shape == img.shape
        assert metrics.psnr(rec, img) >= 26

    def test_420_smaller_than_444(self):
        img = image_io.synthetic_image(64, 64, "photo", seed=4, color=True)
        d444 = codec.encode(img, CodecConfig(quality=80, chroma="444"))
        d420 = codec.encode(img, CodecConfig(quality=80, chroma="420"))
        assert len(d420) < len(d444)


def test_color_decode_to_device_matches_host():
    import jax

    from dct_tpu.models.color import ColorImageCodec
    from dct_tpu.utils import image_io

    g = image_io.synthetic_image(56, 72, "photo", seed=8)
    rgb = np.stack([g, np.roll(g, 3, 0), np.roll(g, 5, 1)], -1)
    for chroma in ("444", "420"):
        cc = ColorImageCodec(CodecConfig(quality=65, chroma=chroma))
        data = cc.encode(rgb)
        dev = cc.decode_to_device(data)
        assert isinstance(dev, jax.Array)
        np.testing.assert_array_equal(np.asarray(dev), cc.decode(data))
