"""Rate control (models/rate_control.py): the size probe must be
byte-EXACT against real encodes for every entropy mode, and encode_to_size
must return the highest ladder quality that fits the budget.

The reference's size estimator (entropy.c:430-466) is an estimate used in
its tests; this closes the loop into actual rate control, so the contract
here is exactness, not approximation.
"""

from __future__ import annotations

import numpy as np
import pytest

from dct_tpu.config import CodecConfig
from dct_tpu.models import codec, rate_control
from dct_tpu.utils import image_io


CONFIGS = [
    # the probe walks every branch: static/dynamic tables, all three
    # entropy modes, adaptive, dc_prediction, coded runs, block sizes
    CodecConfig(quality=50, static_tables=True),
    CodecConfig(quality=50),
    CodecConfig(quality=35, huffman_mode="direct"),
    CodecConfig(quality=50, use_huffman=False, huffman_mode="none"),
    CodecConfig(quality=50, adaptive=True, dc_prediction=True),
    CodecConfig(quality=72, coded_runs=True, static_tables=True),
    CodecConfig(quality=72, coded_runs=True, dc_prediction=True),
    CodecConfig(quality=50, block_size=4, stripe_rows=2),
    CodecConfig(quality=50, block_size=16, adaptive=True),
]


@pytest.mark.parametrize("cfg", CONFIGS, ids=lambda c: (
    f"{c.huffman_mode}-n{c.block_size}"
    f"{'-static' if c.static_tables else ''}{'-ad' if c.adaptive else ''}"
    f"{'-dc' if c.dc_prediction else ''}{'-cr' if c.coded_runs else ''}"
))
def test_probe_exact_gray(cfg):
    img = image_io.synthetic_image(72, 96, "photo", seed=7)
    want = len(codec.encode(img, cfg))
    assert rate_control.container_size(img, cfg) == want


@pytest.mark.parametrize("quality", [1, 30, 90, 100])
def test_probe_exact_across_qualities(quality):
    img = image_io.synthetic_image(56, 88, "photo", seed=9)
    cfg = CodecConfig(quality=quality, adaptive=True)
    assert rate_control.container_size(img, cfg) == len(codec.encode(img, cfg))


@pytest.mark.parametrize("chroma", ["444", "420"])
def test_probe_exact_color(chroma):
    g = image_io.synthetic_image(48, 64, "photo", seed=11)
    rgb = np.stack([g, np.roll(g, 3, 0), np.roll(g, 5, 1)], -1)
    cfg = CodecConfig(quality=60, chroma=chroma, coded_runs=True)
    assert rate_control.container_size(rgb, cfg) == len(codec.encode(rgb, cfg))


def test_encode_to_size_picks_highest_fitting_rung():
    img = image_io.synthetic_image(96, 128, "photo", seed=3)
    cfg = CodecConfig(static_tables=True)
    ladder = (10, 30, 50, 70, 90)
    sizes = {
        q: len(codec.encode(img, cfg.replace(quality=q))) for q in ladder
    }
    assert sizes[10] < sizes[90], "content must exercise a size gradient"
    budget = (sizes[50] + sizes[70]) // 2  # fits q50, not q70
    data, q = rate_control.encode_to_size(img, budget, cfg, qualities=ladder)
    assert q == 50
    assert len(data) == sizes[50] <= budget
    rec = codec.decode(data)
    assert rec.shape == img.shape


def test_encode_to_size_budget_respected_everywhere():
    img = image_io.synthetic_image(64, 80, "photo", seed=5)
    cfg = CodecConfig(adaptive=True, dc_prediction=True)
    for budget in (900, 1400, 2200, 10**6):
        data, q = rate_control.encode_to_size(img, budget, cfg)
        assert len(data) <= budget, (budget, q, len(data))


def test_encode_to_size_strict_raises_and_best_effort_returns():
    img = image_io.synthetic_image(64, 80, "noise", seed=6)
    with pytest.raises(ValueError, match="budget"):
        rate_control.encode_to_size(img, 16, CodecConfig())
    data, q = rate_control.encode_to_size(
        img, 16, CodecConfig(), strict=False
    )
    assert q == min(rate_control.DEFAULT_LADDER)
    assert len(data) > 16  # over budget by necessity, but still decodable
    assert codec.decode(data).shape == img.shape


def test_encode_to_size_color():
    g = image_io.synthetic_image(56, 72, "photo", seed=8)
    rgb = np.stack([g, np.roll(g, 2, 0), np.roll(g, 4, 1)], -1)
    mid = len(codec.encode(rgb, CodecConfig(quality=50, chroma="420")))
    data, q = rate_control.encode_to_size(rgb, mid, CodecConfig(chroma="420"))
    assert len(data) <= mid
    assert q >= 50  # the q50 size itself fits, so the pick is at least q50


# ---------------------------------------------------------------------------
# Distortion probes / encode_to_psnr
# ---------------------------------------------------------------------------


def _sse(a: np.ndarray, b: np.ndarray) -> int:
    return int(((a.astype(np.int64) - b.astype(np.int64)) ** 2).sum())


@pytest.mark.parametrize("cfg", [
    CodecConfig(quality=50, static_tables=True),
    CodecConfig(quality=35, huffman_mode="direct"),
    CodecConfig(quality=60, adaptive=True, dc_prediction=True),
    CodecConfig(quality=72, coded_runs=True),
    CodecConfig(quality=50, block_size=16, adaptive=True),
    CodecConfig(quality=50, block_size=4, stripe_rows=2),
    CodecConfig(quality=50, compat_b1=True),
], ids=lambda c: (
    f"{c.huffman_mode}-n{c.block_size}{'-ad' if c.adaptive else ''}"
    f"{'-dc' if c.dc_prediction else ''}{'-cr' if c.coded_runs else ''}"
    f"{'-b1' if c.compat_b1 else ''}"
))
def test_sse_probe_exact_gray(cfg):
    """The distortion probe must equal the real encode->decode roundtrip
    error INTEGER-exactly (same device ops as decode_plane_device)."""
    img = image_io.synthetic_image(75, 98, "photo", seed=13)  # odd dims
    rec = codec.decode(codec.encode(img, cfg))
    assert rate_control.roundtrip_sse(img, cfg) == _sse(rec, img)


@pytest.mark.parametrize("chroma", ["444", "420"])
def test_psnr_probe_float_identical_to_metrics(chroma):
    """The probe promises FLOAT-identity with metrics.psnr of a real
    roundtrip (both compute 10*log10(255^2/(sse/n)) from exact f64
    integer sums)."""
    from dct_tpu.utils import metrics

    g = image_io.synthetic_image(50, 66, "photo", seed=14)
    rgb = np.stack([g, np.roll(g, 3, 0), np.roll(g, 5, 1)], -1)
    cfg = CodecConfig(quality=55, chroma=chroma, adaptive=True)
    rec = codec.decode(codec.encode(rgb, cfg))
    assert rate_control.psnr_at_quality(rgb, cfg) == float(
        metrics.psnr(rgb, rec)
    )


def test_chroma_normalization_matches_codec_encode():
    """container_size must follow codec.encode's rank rules: RGB + gray
    chroma switches to 420; gray image + color chroma is rejected before
    any probe work."""
    g = image_io.synthetic_image(24, 32, "photo", seed=2)
    rgb = np.stack([g, g, g], -1)
    assert rate_control.container_size(rgb, CodecConfig()) == len(
        codec.encode(rgb, CodecConfig())
    )
    with pytest.raises(ValueError, match="chroma"):
        rate_control.container_size(g, CodecConfig(chroma="444"))
    with pytest.raises(ValueError, match="chroma"):
        rate_control.encode_to_size(g, 10**6, CodecConfig(chroma="420"))
    with pytest.raises(ValueError, match="chroma"):
        rate_control.encode_to_psnr(g, 30.0, CodecConfig(chroma="444"))


def test_encode_to_psnr_picks_lowest_meeting_rung():
    img = image_io.synthetic_image(96, 128, "photo", seed=3)
    cfg = CodecConfig(static_tables=True)
    ladder = (10, 30, 50, 70, 90)
    psnrs = {q: rate_control.psnr_at_quality(img, cfg.replace(quality=q))
             for q in ladder}
    assert psnrs[10] < psnrs[90], "content must exercise a PSNR gradient"
    target = (psnrs[50] + psnrs[70]) / 2  # met by q70, not by q50
    data, q = rate_control.encode_to_psnr(img, target, cfg, qualities=ladder)
    assert q == 70
    rec = codec.decode(data)
    got = float(10.0 * np.log10(255.0**2 * img.size / _sse(rec, img)))
    assert got >= target


def test_encode_to_psnr_strict_and_best_effort():
    img = image_io.synthetic_image(64, 80, "noise", seed=6)  # hard content
    with pytest.raises(ValueError, match="target"):
        rate_control.encode_to_psnr(img, 200.0, CodecConfig())
    data, q = rate_control.encode_to_psnr(
        img, 200.0, CodecConfig(), strict=False
    )
    assert q == max(rate_control.DEFAULT_LADDER)
    assert codec.decode(data).shape == img.shape


# ---------------------------------------------------------------------------
# Video (batch-global tables)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("cfg", [
    CodecConfig(quality=60, static_tables=True),
    CodecConfig(quality=60, adaptive=True, dc_prediction=True),
    CodecConfig(quality=60, coded_runs=True),
], ids=["static", "dyn-ad-dc", "dyn-cr"])
def test_video_sizes_exact(cfg):
    from dct_tpu.models.video import VideoCodec

    frames = np.stack([
        image_io.synthetic_image(40, 56, "photo", seed=s) for s in range(5)
    ])
    want = [len(s) for s in VideoCodec(cfg).encode(frames)]
    got = rate_control.video_container_sizes(frames, cfg)
    assert got.tolist() == want


def test_video_sizes_exact_chunked():
    """Chunked probing (2 frames/dispatch) must match the chunked encoder
    byte-exactly — batch-global tables from per-chunk histogram sums."""
    from dct_tpu.models.video import VideoCodec

    cfg = CodecConfig(quality=45)
    frames = np.stack([
        image_io.synthetic_image(40, 56, "photo", seed=s) for s in range(5)
    ])
    want = [len(s) for s in VideoCodec(cfg, chunk_frames=2).encode(frames)]
    got = rate_control.video_container_sizes(frames, cfg, chunk_frames=2)
    assert got.tolist() == want


def test_video_sizes_exact_color():
    from dct_tpu.models.video import VideoCodec

    g = np.stack([
        image_io.synthetic_image(32, 48, "photo", seed=s) for s in range(3)
    ])
    frames = np.stack([g, np.roll(g, 2, 1), np.roll(g, 3, 2)], -1)
    cfg = CodecConfig(quality=55, chroma="420")
    want = [len(s) for s in VideoCodec(cfg).encode(frames)]
    got = rate_control.video_container_sizes(frames, cfg)
    assert got.tolist() == want


def test_encode_video_to_size():
    from dct_tpu.models import codec as _codec

    frames = np.stack([
        image_io.synthetic_image(48, 64, "photo", seed=s) for s in range(4)
    ])
    cfg = CodecConfig(static_tables=True)
    free = sum(
        rate_control.video_container_sizes(frames, cfg.replace(quality=90))
    )
    budget = int(free * 0.6)
    streams, q = rate_control.encode_video_to_size(frames, budget, cfg)
    assert sum(len(s) for s in streams) <= budget
    assert q < 90
    for s, f in zip(streams, frames):
        assert _codec.decode(s).shape == f.shape


# ---------------------------------------------------------------------------
# Edge cases
# ---------------------------------------------------------------------------


def test_probe_exact_1x1_image():
    img = np.full((1, 1), 137, np.uint8)
    for cfg in (CodecConfig(quality=50), CodecConfig(quality=50, adaptive=True)):
        assert rate_control.container_size(img, cfg) == len(
            codec.encode(img, cfg)
        )
        rec = codec.decode(codec.encode(img, cfg))
        assert rate_control.roundtrip_sse(img, cfg) == _sse(rec, img)


def test_single_rung_ladder():
    img = image_io.synthetic_image(24, 32, "photo", seed=1)
    data, q = rate_control.encode_to_size(
        img, 10**6, CodecConfig(), qualities=(42,)
    )
    assert q == 42 and len(data) <= 10**6


def test_q100_lossless_psnr_is_inf():
    """quality 100 round-trips bit-exactly (BASELINE.md integer-domain
    contract), so the exact PSNR probe must report infinity and
    encode_to_psnr must be able to meet any finite target with it."""
    img = image_io.synthetic_image(16, 24, "flat", seed=0)
    cfg = CodecConfig(quality=100)
    if rate_control.roundtrip_sse(img, cfg) == 0:
        assert rate_control.psnr_at_quality(img, cfg) == float("inf")
        _, q = rate_control.encode_to_psnr(
            img, 80.0, CodecConfig(), qualities=(50, 100)
        )
        assert q in (50, 100)
