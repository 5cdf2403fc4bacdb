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


class TestChunkedEncode:
    """Long stacks encode in bounded device memory (chunk_frames); the
    bytes must be identical for EVERY chunking — dynamic tables come from
    histograms accumulated across all chunks."""

    @pytest.mark.parametrize("static", [False, True])
    @pytest.mark.parametrize("coded_runs", [False, True])
    def test_chunking_invariant_gray(self, frames, static, coded_runs):
        cfg = CodecConfig(
            quality=55, static_tables=static, coded_runs=coded_runs,
            adaptive=not static,
        )
        whole = VideoCodec(cfg).encode(frames)  # 5 frames, single chunk
        for ck in (1, 2, 3):
            assert VideoCodec(cfg, chunk_frames=ck).encode(frames) == whole

    def test_chunked_decode_matches(self, frames):
        cfg = CodecConfig(quality=55, adaptive=True)
        streams = VideoCodec(cfg).encode(frames)
        whole = VideoCodec(cfg).decode(streams)
        np.testing.assert_array_equal(
            VideoCodec(cfg, chunk_frames=2).decode(streams), whole
        )

    def test_chunking_invariant_color(self, frames):
        rgb = np.stack(
            [np.stack([f, np.roll(f, 3, 0), np.roll(f, 5, 1)], -1)
             for f in frames]
        )
        cfg = CodecConfig(quality=60, chroma="420", dc_prediction=True)
        whole = VideoCodec(cfg).encode(rgb)
        assert VideoCodec(cfg, chunk_frames=2).encode(rgb) == whole


class TestColorVideo:
    @pytest.fixture(scope="class")
    def rgb_frames(self):
        g = [image_io.synthetic_image(48, 64, "photo", seed=s) for s in range(4)]
        return np.stack(
            [np.stack([f, np.roll(f, 3, 0), np.roll(f, 5, 1)], -1) for f in g]
        )

    @pytest.mark.parametrize("chroma", ["444", "420"])
    def test_color_roundtrip(self, rgb_frames, chroma):
        vc = VideoCodec(CodecConfig(quality=70, chroma=chroma))
        streams = vc.encode(rgb_frames)
        assert len(streams) == 4
        rec = vc.decode(streams)
        assert rec.shape == rgb_frames.shape
        assert metrics.psnr(rec, rgb_frames) >= 28

    def test_color_static_matches_single(self, rgb_frames):
        """Static tables: batch color streams byte-identical to per-frame
        ColorImageCodec encodes."""
        from dct_tpu.models.color import ColorImageCodec

        cfg = CodecConfig(quality=50, static_tables=True, chroma="420")
        streams = VideoCodec(cfg).encode(rgb_frames)
        for f in range(4):
            assert streams[f] == ColorImageCodec(cfg).encode(rgb_frames[f])

    def test_color_frames_decode_individually(self, rgb_frames):
        vc = VideoCodec(CodecConfig(quality=60, chroma="444", adaptive=True))
        streams = vc.encode(rgb_frames)
        one = codec.decode(streams[1])
        assert metrics.psnr(one, rgb_frames[1]) >= 28

    def test_color_decode_to_device(self, rgb_frames):
        import jax

        vc = VideoCodec(CodecConfig(quality=60, chroma="420", coded_runs=True))
        streams = vc.encode(rgb_frames)
        dev = vc.decode_to_device(streams)
        assert isinstance(dev, jax.Array)
        np.testing.assert_array_equal(np.asarray(dev), vc.decode(streams))

    def test_mixed_tables_fall_back(self, rgb_frames):
        """Per-frame dynamic-table encodes (different tables per frame)
        must take the per-frame fallback, not decode with frame 0's
        table."""
        from dct_tpu.models.color import ColorImageCodec

        cfg = CodecConfig(quality=60, chroma="444")
        streams = [ColorImageCodec(cfg).encode(f) for f in rgb_frames]
        want = np.stack([codec.decode(s) for s in streams])
        got = VideoCodec(cfg).decode(streams)
        np.testing.assert_array_equal(got, want)


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
