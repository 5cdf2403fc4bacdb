"""Batched-frame (video) codec tests — BASELINE.json config 2 shape."""

import numpy as np
import pytest

from dct_tpu.config import CodecConfig
from dct_tpu.models import codec
from dct_tpu.models.video import VideoCodec
from dct_tpu.utils import image_io, metrics


@pytest.fixture(scope="module")
def frames():
    return np.stack(
        [image_io.synthetic_image(48, 64, "photo", seed=s) for s in range(5)]
    )


class TestVideoCodec:
    def test_roundtrip(self, frames):
        vc = VideoCodec(CodecConfig(quality=70))
        streams = vc.encode(frames)
        assert len(streams) == 5
        rec = vc.decode(streams)
        assert rec.shape == frames.shape
        for f in range(5):
            assert metrics.psnr(rec[f], frames[f]) >= 30

    def test_shared_table_batch(self, frames):
        """Dynamic mode: per-frame streams decode individually with the
        shared batch table serialized in each container."""
        vc = VideoCodec(CodecConfig(quality=50))
        streams = vc.encode(frames)
        one = codec.decode(streams[2])
        assert metrics.psnr(one, frames[2]) >= 28

    def test_static_tables_matches_single(self, frames):
        """Static-table batch streams are byte-identical to single-image
        static encodes (same table, same content)."""
        cfg = CodecConfig(quality=50, static_tables=True)
        streams = VideoCodec(cfg).encode(frames)
        for f in range(5):
            assert streams[f] == codec.encode(frames[f], cfg)

    def test_adaptive_batch(self, frames):
        vc = VideoCodec(CodecConfig(quality=60, adaptive=True))
        rec = vc.decode(vc.encode(frames))
        assert metrics.psnr(rec, frames) >= 28


class TestDeviceDecode:
    def test_decode_to_device_matches_host(self):
        import jax

        from dct_tpu.models.video import VideoCodec
        from dct_tpu.utils import image_io

        frames = np.stack([
            image_io.synthetic_image(48, 64, "photo", seed=s) for s in range(3)
        ])
        vc = VideoCodec(CodecConfig(quality=60, adaptive=True))
        streams = vc.encode(frames)
        dev = vc.decode_to_device(streams)
        assert isinstance(dev, jax.Array)
        np.testing.assert_array_equal(np.asarray(dev), vc.decode(streams))

    def test_image_decode_to_device(self):
        import jax

        from dct_tpu.models import codec
        from dct_tpu.utils import image_io

        img = image_io.synthetic_image(40, 56, "photo", seed=1)
        ic = codec.ImageCodec(CodecConfig(quality=70))
        data = ic.encode(img)
        dev = ic.decode_to_device(data)
        assert isinstance(dev, jax.Array)
        np.testing.assert_array_equal(np.asarray(dev), ic.decode(data))
