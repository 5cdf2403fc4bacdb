"""CLI surface tests: every subcommand driven in-process through main(argv)
(the reference has no CLI at all; this one is the framework's user-facing
driver, SURVEY.md section 3.5)."""

from __future__ import annotations

import json

import numpy as np
import pytest

from dct_tpu import cli
from dct_tpu.utils import image_io


@pytest.fixture(scope="module")
def pgm(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    img = image_io.synthetic_image(72, 96, "photo", seed=3)
    p = d / "in.pgm"
    image_io.write_image(str(p), img)
    return d, p, img


def test_encode_decode_info(pgm, capsys):
    d, p, img = pgm
    out = d / "out.tpdc"
    rec = d / "rec.pgm"
    assert cli.main(["encode", str(p), str(out), "--quality", "60"]) == 0
    assert out.exists() and out.stat().st_size > 0
    assert cli.main(["decode", str(out), str(rec)]) == 0
    got = image_io.read_image(str(rec))
    assert got.shape == img.shape
    mse = np.mean((got.astype(float) - img.astype(float)) ** 2)
    assert mse < 150  # q60 reconstruction is decent

    capsys.readouterr()
    assert cli.main(["info", str(out)]) == 0
    info = json.loads(capsys.readouterr().out)
    assert info["width"] == 96 and info["height"] == 72
    assert info["quality"] == 60


def test_roundtrip_reports_psnr(pgm, capsys):
    d, p, _ = pgm
    assert cli.main(["roundtrip", str(p), "--quality", "85", "--adaptive"]) == 0
    out = capsys.readouterr().out
    assert "PSNR" in out and "dB" in out


def test_verify_and_repair(pgm, capsys):
    d, p, img = pgm
    out = d / "v.tpdc"
    assert cli.main(["encode", str(p), str(out), "--quality", "50",
                     "--static-tables"]) == 0
    assert cli.main(["verify", str(out)]) == 0

    data = bytearray(out.read_bytes())
    data[-6:-2] = b"\xa5\xa5\xa5\xa5"  # clobber tail payload
    bad = d / "bad.tpdc"
    bad.write_bytes(bytes(data))
    assert cli.main(["verify", str(bad)]) == 1

    fixed = d / "fixed.tpdc"
    assert cli.main(["repair", str(bad), str(p), "-o", str(fixed)]) == 0
    assert cli.main(["verify", str(fixed)]) == 0
    assert fixed.read_bytes() == out.read_bytes()


def test_color_roundtrip(pgm, tmp_path):
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (48, 64, 3)).astype(np.uint8)
    p = tmp_path / "c.ppm"
    image_io.write_image(str(p), img)
    out = tmp_path / "c.tpdc"
    rec = tmp_path / "c_rec.ppm"
    assert cli.main(["encode", str(p), str(out), "--quality", "80"]) == 0
    assert cli.main(["decode", str(out), str(rec)]) == 0
    assert image_io.read_image(str(rec)).shape == img.shape


def test_unknown_command_rejected():
    with pytest.raises(SystemExit):
        cli.main(["frobnicate", "x"])


def test_encode_decode_video(tmp_path, capsys):
    from dct_tpu.utils import image_io

    base = image_io.synthetic_image(40, 56, "photo", seed=3)
    frames = np.stack([np.roll(base, 5 * i, 0) for i in range(4)])
    inp = tmp_path / "v.npy"
    np.save(inp, frames)
    out = tmp_path / "v.tpdv"
    rec = tmp_path / "r.npy"
    assert cli.main(["encode-video", str(inp), str(out),
                     "--quality", "60", "--coded-runs"]) == 0
    assert cli.main(["decode-video", str(out), str(rec)]) == 0
    got = np.load(rec)
    assert got.shape == frames.shape
    from dct_tpu.utils import metrics
    assert metrics.psnr(got, frames) >= 30


def test_encode_decode_video_color(tmp_path, capsys):
    from dct_tpu.utils import image_io

    base = image_io.synthetic_image(40, 56, "photo", seed=4)
    rgb = np.stack([base, np.roll(base, 3, 0), np.roll(base, 5, 1)], -1)
    frames = np.stack([rgb, rgb[::-1]])
    inp = tmp_path / "c.npy"
    np.save(inp, frames)
    out = tmp_path / "c.tpdv"
    rec = tmp_path / "rc.npy"
    assert cli.main(["encode-video", str(inp), str(out), "--quality", "70"]) == 0
    assert cli.main(["decode-video", str(out), str(rec)]) == 0
    assert np.load(rec).shape == frames.shape


def test_tpdv_truncation_fails_cleanly(tmp_path):
    from dct_tpu import container as cont
    from dct_tpu.utils import image_io

    base = image_io.synthetic_image(24, 32, "photo", seed=5)
    frames = np.stack([base, base[::-1]])
    from dct_tpu.models.video import VideoCodec
    from dct_tpu.config import CodecConfig

    data = cont.serialize_streams(
        VideoCodec(CodecConfig(quality=50)).encode(frames)
    )
    assert cont.deserialize_streams(data)  # intact roundtrip
    for cut in (0, 3, 6, 10, len(data) - 1):
        with pytest.raises(ValueError):
            cont.deserialize_streams(data[:cut])


def test_verify_video_stream(tmp_path, capsys):
    from dct_tpu import container as cont
    from dct_tpu.config import CodecConfig
    from dct_tpu.models.video import VideoCodec
    from dct_tpu.utils import image_io

    base = image_io.synthetic_image(32, 40, "photo", seed=6)
    frames = np.stack([base, base[::-1]])
    streams = VideoCodec(CodecConfig(quality=50)).encode(frames)
    out = tmp_path / "v.tpdv"
    out.write_bytes(cont.serialize_streams(streams))
    assert cli.main(["verify", str(out)]) == 0
    assert "all frames OK" in capsys.readouterr().out

    # corrupt frame 1's last stripe payload
    raw = bytearray(cont.serialize_streams(streams))
    raw[-12:-4] = b"\x99" * 8
    bad = tmp_path / "bad.tpdv"
    bad.write_bytes(bytes(raw))
    assert cli.main(["verify", str(bad)]) == 1
    assert "CORRUPT frames" in capsys.readouterr().out


def test_repair_video_stream(tmp_path, capsys):
    from dct_tpu import container as cont
    from dct_tpu.config import CodecConfig
    from dct_tpu.models.video import VideoCodec
    from dct_tpu.utils import image_io

    base = image_io.synthetic_image(32, 40, "photo", seed=7)
    frames = np.stack([base, base[::-1], np.roll(base, 5, 1)])
    src = tmp_path / "src.npy"
    np.save(src, frames)
    streams = VideoCodec(CodecConfig(quality=55)).encode(frames)
    pristine = cont.serialize_streams(streams)

    raw = bytearray(pristine)
    raw[-14:-6] = b"\x5c" * 8  # clobber the last frame's tail
    bad = tmp_path / "bad.tpdv"
    bad.write_bytes(bytes(raw))
    fixed = tmp_path / "fixed.tpdv"
    assert cli.main(["repair", str(bad), str(src), "-o", str(fixed)]) == 0
    assert fixed.read_bytes() == pristine  # byte-identical to pristine
    assert cli.main(["verify", str(fixed)]) == 0


def test_info_video_stream(tmp_path, capsys):
    import json as _json

    from dct_tpu import container as cont
    from dct_tpu.config import CodecConfig
    from dct_tpu.models.video import VideoCodec
    from dct_tpu.utils import image_io

    base = image_io.synthetic_image(24, 32, "photo", seed=8)
    streams = VideoCodec(CodecConfig(quality=45)).encode(
        np.stack([base, base[::-1]])
    )
    out = tmp_path / "v.tpdv"
    out.write_bytes(cont.serialize_streams(streams))
    assert cli.main(["info", str(out)]) == 0
    info = _json.loads(capsys.readouterr().out)
    assert info["stream_file"] and info["frames"] == 2
    assert info["quality"] == 45 and info["width"] == 32


def test_repair_video_unreadable_frame(tmp_path, capsys):
    """Header-destroying damage: the frame can't even deserialize; repair
    rebuilds it against a sibling frame's (batch-shared) tables,
    byte-identical to pristine."""
    from dct_tpu import container as cont
    from dct_tpu.config import CodecConfig
    from dct_tpu.models.video import VideoCodec
    from dct_tpu.utils import image_io

    base = image_io.synthetic_image(32, 40, "photo", seed=9)
    frames = np.stack([base, base[::-1], np.roll(base, 3, 1)])
    src = tmp_path / "src.npy"
    np.save(src, frames)
    streams = VideoCodec(CodecConfig(quality=55, adaptive=True)).encode(frames)
    pristine = cont.serialize_streams(streams)

    # destroy frame 1's TPDC magic (the 4 bytes after the sizes table +
    # frame 0's payload)
    raw = bytearray(pristine)
    off = 8 + 4 * len(streams) + len(streams[0])
    raw[off : off + 4] = b"XXXX"
    bad = tmp_path / "bad.tpdv"
    bad.write_bytes(bytes(raw))

    assert cli.main(["verify", str(bad)]) == 1
    assert "unreadable" in capsys.readouterr().out

    fixed = tmp_path / "fixed.tpdv"
    assert cli.main(["repair", str(bad), str(src), "-o", str(fixed)]) == 0
    assert fixed.read_bytes() == pristine
    assert cli.main(["verify", str(fixed)]) == 0


def test_empty_tpdv_handled(tmp_path, capsys):
    from dct_tpu import container as cont

    empty = tmp_path / "e.tpdv"
    empty.write_bytes(cont.serialize_streams([]))
    assert cli.main(["info", str(empty)]) == 0
    assert '"frames": 0' in capsys.readouterr().out
    with pytest.raises(SystemExit):
        cli.main(["decode-video", str(empty), str(tmp_path / "o.npy")])


def test_encode_max_bytes(pgm, capsys):
    d, p, img = pgm
    free = d / "free.tpdc"
    capped = d / "capped.tpdc"
    assert cli.main(["encode", str(p), str(free), "--quality", "90"]) == 0
    budget = free.stat().st_size // 2
    assert cli.main(
        ["encode", str(p), str(capped), "--max-bytes", str(budget)]
    ) == 0
    assert capped.stat().st_size <= budget
    assert "rate control" in capsys.readouterr().out
    rec = d / "capped.pgm"
    assert cli.main(["decode", str(capped), str(rec)]) == 0
    assert image_io.read_image(str(rec)).shape == img.shape


def test_encode_min_psnr(pgm, capsys):
    d, p, img = pgm
    out = d / "psnr.tpdc"
    assert cli.main(
        ["encode", str(p), str(out), "--min-psnr", "34"]
    ) == 0
    assert "rate control" in capsys.readouterr().out
    rec = d / "psnr.pgm"
    assert cli.main(["decode", str(out), str(rec)]) == 0
    got = image_io.read_image(str(rec))
    import numpy as _np
    mse = _np.mean((got.astype(float) - img.astype(float)) ** 2)
    assert 10 * _np.log10(255.0**2 / mse) >= 34
    assert cli.main(  # mutually exclusive flags must fail loudly
        ["encode", str(p), str(out), "--min-psnr", "34", "--max-bytes", "99"]
    ) == 2


def test_encode_video_max_total_bytes(tmp_path, capsys):
    frames = np.stack([
        image_io.synthetic_image(48, 64, "photo", seed=s) for s in range(3)
    ])
    src = tmp_path / "frames.npy"
    np.save(src, frames)
    free = tmp_path / "free.tpdv"
    assert cli.main(["encode-video", str(src), str(free)]) == 0
    budget = int(free.stat().st_size * 0.7)
    capped = tmp_path / "capped.tpdv"
    assert cli.main([
        "encode-video", str(src), str(capped),
        "--max-total-bytes", str(budget),
    ]) == 0
    assert capped.stat().st_size <= budget
    assert "rate control" in capsys.readouterr().out
    rec = tmp_path / "rec.npy"
    assert cli.main(["decode-video", str(capped), str(rec)]) == 0
    assert np.load(rec).shape == frames.shape


def test_infeasible_rate_targets_fail_cleanly(pgm, capsys):
    """Infeasible --max-bytes / --min-psnr / --max-total-bytes must exit 2
    with a message, not escape a ValueError traceback."""
    d, p, _ = pgm
    out = d / "never.tpdc"
    assert cli.main(["encode", str(p), str(out), "--max-bytes", "10"]) == 2
    assert "budget" in capsys.readouterr().err
    assert cli.main(["encode", str(p), str(out), "--min-psnr", "500"]) == 2
    assert "target" in capsys.readouterr().err
    frames = np.stack([
        image_io.synthetic_image(24, 32, "photo", seed=s) for s in range(2)
    ])
    src = d / "tiny.npy"
    np.save(src, frames)
    tp = d / "never.tpdv"
    # smaller than even the .tpdv wrapper header
    assert cli.main(
        ["encode-video", str(src), str(tp), "--max-total-bytes", "10"]
    ) == 2
    assert "header" in capsys.readouterr().err
    # bigger than the wrapper but smaller than any rung
    assert cli.main(
        ["encode-video", str(src), str(tp), "--max-total-bytes", "40"]
    ) == 2
    assert "budget" in capsys.readouterr().err


def test_decode_corrupt_container_fails_cleanly(pgm, tmp_path, capsys):
    d, p, _ = pgm
    import numpy as np_
    from dct_tpu import container as cont_
    from dct_tpu.config import CodecConfig as CC_

    lengths = np_.zeros(40001, np_.uint8)
    lengths[33100] = 1
    lengths[40000] = 1
    plane = cont_.PlaneData(
        width=8, height=8, table_lengths=lengths, vmin=-255,
        variance_codes=None, stripe_bits=np_.asarray([9], np_.uint32),
        stripes=[bytes([0b00011111, 0b10000000])],
    )
    bad = tmp_path / "hostile.tpdc"
    bad.write_bytes(cont_.serialize(cont_.Container(
        config=CC_(quality=50, huffman_mode="direct"),
        width=8, height=8, planes=[plane],
    )))
    assert cli.main(["decode", str(bad), str(tmp_path / "h.pgm")]) == 1
    assert "decode:" in capsys.readouterr().err
    assert cli.main(["verify", str(bad)]) == 1  # per-stripe report
