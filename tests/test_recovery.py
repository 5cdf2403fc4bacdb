"""Per-stripe integrity / repair / random access (models/recovery.py).

The container's per-stripe independence is the framework's
checkpoint-resume and failure-recovery mechanism (SURVEY.md sections
5.3/5.4); these tests inject corruption and prove stripe-local recovery
reproduces the from-scratch encode byte-for-byte.
"""

from __future__ import annotations

import numpy as np
import pytest

from dct_tpu.config import CodecConfig
from dct_tpu.models import codec, recovery
from dct_tpu.utils import image_io


@pytest.fixture(scope="module")
def image():
    return image_io.synthetic_image(120, 168, "photo", seed=11)


def _corrupt_stripe(data: bytes, image, cfg, stripe: int) -> bytes:
    """Flip bytes inside one stripe's payload region."""
    from dct_tpu import container as cont

    c = cont.deserialize(data)
    p = c.planes[0]
    raw = bytearray(data)
    # locate the stripe payload: reserialize prefix lengths
    start = len(data) - sum(len(s) for s in p.stripes)
    for s in range(stripe):
        start += len(p.stripes[s])
    n = len(p.stripes[stripe])
    assert n > 2
    for i in range(min(8, n)):
        raw[start + i] ^= 0xA5
    return bytes(raw)


@pytest.mark.parametrize("adaptive", [False, True])
@pytest.mark.parametrize("static_tables", [True, False])
def test_verify_and_repair_roundtrip(image, adaptive, static_tables):
    cfg = CodecConfig(
        quality=55, adaptive=adaptive, static_tables=static_tables,
        stripe_rows=2,
    )
    original = codec.ImageCodec(cfg).encode(image)
    assert recovery.verify(original) == []

    bad = _corrupt_stripe(original, image, cfg, stripe=3)
    damaged = recovery.verify(bad)
    assert 3 in damaged

    repaired = recovery.repair(bad, image)
    assert repaired == original  # byte-identical to from-scratch encode
    assert recovery.verify(repaired) == []


def test_repair_noop_on_clean_container(image):
    cfg = CodecConfig(quality=50, static_tables=True)
    data = codec.ImageCodec(cfg).encode(image)
    assert recovery.repair(data, image) == data


def test_repair_explicit_stripes_equals_full_encode(image):
    """Resume story: encode interrupted after some stripes -> re-encoding
    the missing ones (here: all of them, one at a time) matches the
    one-shot encode byte-for-byte."""
    cfg = CodecConfig(quality=50, static_tables=True)
    original = codec.ImageCodec(cfg).encode(image)
    bad = original
    for s in range(3):
        bad = _corrupt_stripe(bad, image, cfg, stripe=s)
    repaired = recovery.repair(bad, image, stripes=[0, 1, 2])
    assert repaired == original


def test_repair_rejects_wrong_source(image):
    cfg = CodecConfig(quality=50, static_tables=True)
    data = codec.ImageCodec(cfg).encode(image)
    with pytest.raises(ValueError):
        recovery.repair(data, image[:-8, :], stripes=[0])
    # even with nothing to repair, a wrong source is an error, never a
    # silent no-op success
    with pytest.raises(ValueError):
        recovery.repair(data, image[:-8, :])


def test_decode_region_matches_full(image):
    cfg = CodecConfig(quality=50, static_tables=True, stripe_rows=2)
    data = codec.ImageCodec(cfg).encode(image)
    full = codec.ImageCodec(cfg).decode(data)
    for row0, row1 in [(0, 16), (13, 57), (100, 120), (0, 120)]:
        region = recovery.decode_region(data, row0, row1)
        np.testing.assert_array_equal(region, full[row0:row1])


def test_decode_region_adaptive(image):
    cfg = CodecConfig(quality=55, adaptive=True, static_tables=True)
    data = codec.ImageCodec(cfg).encode(image)
    full = codec.ImageCodec(cfg).decode(data)
    region = recovery.decode_region(data, 40, 80)
    np.testing.assert_array_equal(region, full[40:80])


def test_decode_region_bad_range(image):
    cfg = CodecConfig(quality=50, static_tables=True)
    data = codec.ImageCodec(cfg).encode(image)
    with pytest.raises(ValueError):
        recovery.decode_region(data, 50, 10)
    with pytest.raises(ValueError):
        recovery.decode_region(data, 0, 10_000)


# ---------------------------------------------------------------------------
# Color containers: plane-wise recovery ((plane, stripe) addressing)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def rgb(image):
    return np.stack([image, np.roll(image, 3, 0), np.roll(image, 5, 1)], -1)


def _corrupt_plane_stripe(data: bytes, plane: int, stripe: int) -> bytes:
    """Deterministically flip bytes inside one plane's stripe payload."""
    from dct_tpu import container as cont

    c = cont.deserialize(data)
    p = c.planes[plane]
    s = bytearray(p.stripes[stripe])
    assert len(s) > 2
    for i in range(min(8, len(s))):
        s[i] ^= 0xA5
    p.stripes[stripe] = bytes(s)
    return cont.serialize(c)


@pytest.mark.parametrize("chroma", ["444", "420"])
@pytest.mark.parametrize("coded_runs", [False, True])
def test_color_verify_and_repair(rgb, chroma, coded_runs):
    from dct_tpu.models.color import ColorImageCodec

    cfg = CodecConfig(
        quality=55, chroma=chroma, coded_runs=coded_runs, stripe_rows=2
    )
    original = ColorImageCodec(cfg).encode(rgb)
    assert recovery.verify(original) == []

    bad = _corrupt_plane_stripe(original, plane=1, stripe=2)
    bad = _corrupt_plane_stripe(bad, plane=0, stripe=0)
    damaged = recovery.verify(bad)
    assert (1, 2) in damaged and (0, 0) in damaged

    repaired = recovery.repair(bad, rgb)
    assert repaired == original  # byte-identical to from-scratch encode
    assert recovery.verify(repaired) == []


def test_color_repair_adaptive_dc(rgb):
    from dct_tpu.models.color import ColorImageCodec

    cfg = CodecConfig(
        quality=60, chroma="420", adaptive=True, dc_prediction=True
    )
    original = ColorImageCodec(cfg).encode(rgb)
    bad = _corrupt_plane_stripe(original, plane=2, stripe=1)
    assert recovery.repair(bad, rgb) == original


def test_color_repair_rejects_wrong_source(rgb):
    from dct_tpu.models.color import ColorImageCodec

    cfg = CodecConfig(quality=50, chroma="444")
    data = ColorImageCodec(cfg).encode(rgb)
    with pytest.raises(ValueError):
        recovery.repair(data, rgb[:, :, 0], stripes=[(0, 0)])  # not RGB
    with pytest.raises(ValueError):
        recovery.repair(data, rgb[:-8], stripes=[(0, 0)])  # wrong dims


@pytest.mark.parametrize("chroma", ["444", "420"])
def test_color_decode_region_matches_full(rgb, chroma):
    from dct_tpu.models.color import ColorImageCodec

    cfg = CodecConfig(quality=60, chroma=chroma, stripe_rows=2)
    data = ColorImageCodec(cfg).encode(rgb)
    full = ColorImageCodec(cfg).decode(data)
    # odd bounds exercise the half-rate chroma row mapping for 4:2:0
    for row0, row1 in [(0, 16), (13, 57), (101, 119), (0, rgb.shape[0])]:
        region = recovery.decode_region(data, row0, row1)
        np.testing.assert_array_equal(region, full[row0:row1])


@pytest.mark.parametrize("coded_runs", [False, True])
def test_native_and_python_verify_agree(image, coded_runs):
    """The C++ integrity scan must flag exactly the stripes the Python
    reference scan flags (clean, corrupted, and bit-count-mismatch cases)."""
    from dct_tpu import container as cont
    from dct_tpu import native
    from dct_tpu.ops import bitstream as bs

    if not native.available():
        pytest.skip("native decoder unavailable")

    cfg = CodecConfig(quality=55, coded_runs=coded_runs, stripe_rows=1)
    data = codec.ImageCodec(cfg).encode(image)
    variants = [data]
    for stripe in (0, 4, 9):
        variants.append(_corrupt_stripe(data, image, cfg, stripe))

    for v in variants:
        c = cont.deserialize(v)
        p = c.planes[0]
        _, _, n_stripes, bps = recovery._geometry(p, cfg)
        mode, table, run_table = recovery._table(p, cfg)
        status = native.verify_stripes(
            p.stripes, bps, cfg.n2, mode, table, p.vmin,
            np.asarray(p.stripe_bits, np.uint32), run_table=run_table,
        )
        nat = [int(s) for s in np.nonzero(status)[0]]
        py = []
        for s in range(n_stripes):
            try:
                bs.unpack_stripe_host(
                    p.stripes[s], bps, cfg.n2, mode,
                    cat_table=table if mode == "category" else None,
                    val_table=table if mode == "direct" else None,
                    vmin=p.vmin,
                    expected_bits=int(p.stripe_bits[s]),
                    run_table=run_table,
                )
            except (ValueError, IndexError):
                py.append(s)
        assert nat == py
