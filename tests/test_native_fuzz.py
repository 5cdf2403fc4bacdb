"""Adversarial bitstream fuzz against the native C++ decoder under ASan
(round-3 VERDICT item 7).

test_fuzz.py covers container truncation at the Python layer; these tests
attack the native decoder itself (build/libdctbits.so) with hostile STRIPE
PAYLOADS and hostile CANONICAL TABLES through two channels:

  * in-process ctypes (the production path): corruption must either be
    detected (nonzero verify status / unpack ValueError) or decode to
    garbage coefficients — never crash, hang, or read out of bounds;
  * the ASan/UBSan-instrumented harness (native/fuzz_driver.cpp, built by
    `make -C native build/bitpack_fuzz_asan`): the same cases re-run with
    every memory access instrumented, so "no OOB" is machine-checked, not
    asserted. peek64 reads up to 8 bytes ahead from in-bounds data; the
    LUT walk, ESC, and run paths all take hostile input here.

Reference contrast: /root/reference/src/entropy.c:349 is the reference's
only decode bounds check — its decoder trusts its input. This library must
not (SURVEY.md section 5.2/5.3).
"""

from __future__ import annotations

import pathlib
import struct
import subprocess

import numpy as np
import pytest

from dct_tpu import container as cont
from dct_tpu import native
from dct_tpu.config import CodecConfig
from dct_tpu.models import codec, recovery
from dct_tpu.ops import huffman as hf
from dct_tpu.utils import image_io

REPO = pathlib.Path(__file__).resolve().parent.parent
FUZZ_BIN = REPO / "build" / "bitpack_fuzz_asan"

_MODE_IDS = {"category": 0, "direct": 1, "none": 2}

CONFIGS = [
    CodecConfig(quality=50, huffman_mode="category"),
    CodecConfig(quality=50, huffman_mode="category", coded_runs=True),
    CodecConfig(quality=80, huffman_mode="direct"),
    CodecConfig(quality=50, use_huffman=False),
    CodecConfig(quality=30, block_size=16, huffman_mode="category"),
]


def _asan_bin() -> pathlib.Path | None:
    if not FUZZ_BIN.exists():
        r = subprocess.run(
            ["make", "-C", str(REPO / "native"), str(FUZZ_BIN)],
            capture_output=True, text=True, timeout=180,
        )
        if r.returncode != 0:
            return None
    return FUZZ_BIN if FUZZ_BIN.exists() else None


def _plane_case(data: bytes):
    """Container bytes -> (cfg, PlaneData, bps, decode params)."""
    c = cont.deserialize(data)
    cfg = c.config
    p = c.planes[0]
    bh, bw, n_stripes = codec._padded_grid(p.height, p.width, cfg)
    bps = (bh // n_stripes) * bw
    return cfg, p, bps, n_stripes


def _write_case(path, cfg, stripes, bps, table_lengths, run_lengths,
                expected_bits, vmin):
    mode = cfg.huffman_mode if cfg.use_huffman else "none"
    tl = (np.asarray(table_lengths, np.uint8)
          if table_lengths is not None else np.zeros(0, np.uint8))
    rl = (np.asarray(run_lengths, np.uint8)
          if run_lengths is not None else np.zeros(0, np.uint8))
    blob = b"".join(stripes)
    offsets = np.zeros(len(stripes) + 1, np.uint64)
    np.cumsum([len(s) for s in stripes], out=offsets[1:])
    with open(path, "wb") as f:
        f.write(struct.pack(
            "<I7i", 0x315A4644, len(stripes), bps, cfg.n2,
            _MODE_IDS[mode], len(tl), len(rl), vmin,
        ))
        f.write(tl.tobytes())
        f.write(rl.tobytes())
        f.write(np.asarray(expected_bits, np.uint32).tobytes())
        f.write(offsets.tobytes())
        f.write(blob)


def _mutations(stripes: list[bytes], rng, n: int):
    """Yield n mutated stripe lists: bit flips, truncations, garbage."""
    for _ in range(n):
        kind = rng.integers(0, 4)
        s = [bytearray(x) for x in stripes]
        idx = int(rng.integers(0, len(s)))
        if kind == 0 and len(s[idx]):  # single bit flip
            i = int(rng.integers(0, len(s[idx])))
            s[idx][i] ^= 1 << int(rng.integers(0, 8))
        elif kind == 1 and len(s[idx]):  # byte-range scramble
            i = int(rng.integers(0, len(s[idx])))
            j = min(len(s[idx]), i + int(rng.integers(1, 16)))
            s[idx][i:j] = rng.integers(0, 256, j - i, dtype=np.uint8).tobytes()
        elif kind == 2:  # truncate
            s[idx] = s[idx][: int(rng.integers(0, max(1, len(s[idx]))))]
        else:  # replace with pure noise
            s[idx] = bytearray(
                rng.integers(0, 256, int(rng.integers(0, 200)),
                             dtype=np.uint8).tobytes()
            )
        yield [bytes(x) for x in s]


def _tables_for(cfg, p):
    mode = cfg.huffman_mode if cfg.use_huffman else "none"
    table = hf.CanonicalTable(p.table_lengths) if mode != "none" else None
    run_table = (
        hf.CanonicalTable(p.run_table_lengths) if cfg.coded_runs else None
    )
    return mode, table, run_table


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
@pytest.mark.parametrize("cfg_i", range(len(CONFIGS)))
def test_inprocess_payload_corruption_never_crashes(cfg_i):
    """ctypes path: 24 mutations per config through verify + unpack."""
    cfg = CONFIGS[cfg_i]
    img = image_io.synthetic_image(64, 64, "photo", seed=cfg_i)
    data = codec.ImageCodec(cfg).encode(img)
    cfg_w, p, bps, n_stripes = _plane_case(data)
    mode, table, run_table = _tables_for(cfg_w, p)
    rng = np.random.default_rng(100 + cfg_i)
    for stripes in _mutations(list(p.stripes), rng, 24):
        status = native.verify_stripes(
            stripes, bps, cfg_w.n2, mode, table, codec.DIRECT_VMIN,
            np.asarray(p.stripe_bits, np.uint32), run_table=run_table,
        )
        assert status.shape == (n_stripes,)
        try:
            out = native.unpack_stripes(
                stripes, bps, cfg_w.n2, mode, table, codec.DIRECT_VMIN,
                run_table=run_table,
            )
            # decoded (possibly to garbage): shape contract still holds
            assert out.shape == (n_stripes * bps, cfg_w.n2)
        except ValueError:
            pass  # clean detection


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_inprocess_hostile_tables_never_crash():
    """Corrupt canonical tables (zeros, >32 lengths, random) against a
    valid payload: the table build must clamp and the decode must fail
    cleanly or produce garbage, never walk out of bounds."""
    cfg = CodecConfig(quality=50)
    img = image_io.synthetic_image(64, 64, "photo", seed=7)
    data = codec.ImageCodec(cfg).encode(img)
    cfg_w, p, bps, n_stripes = _plane_case(data)
    rng = np.random.default_rng(3)
    base = np.asarray(p.table_lengths, np.uint8)
    hostile = [
        np.zeros_like(base),
        np.full_like(base, 255),
        np.full_like(base, 33),  # just past the 32-length clamp
        np.ones_like(base),      # wildly over-subscribed Kraft sum
        rng.integers(0, 64, base.shape).astype(np.uint8),
    ]
    for tl in hostile:
        table = hf.CanonicalTable.__new__(hf.CanonicalTable)
        # bypass CanonicalTable validation on purpose: the native layer
        # must survive tables Python-side validation would reject
        object.__setattr__(table, "lengths", tl) if hasattr(
            hf.CanonicalTable, "__slots__"
        ) else setattr(table, "lengths", tl)
        try:
            out = native.unpack_stripes(
                list(p.stripes), bps, cfg_w.n2, "category", table,
                codec.DIRECT_VMIN,
            )
            assert out.shape == (n_stripes * bps, cfg_w.n2)
        except ValueError:
            pass


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_recovery_verify_on_corrupted_containers():
    """Full-container channel: recovery.verify over byte-corrupted
    containers either reports damage or the container still decodes;
    no crash and no hang (the VERDICT item's acceptance wording)."""
    cfg = CodecConfig(quality=50, adaptive=True)
    img = image_io.synthetic_image(64, 64, "photo", seed=11)
    data = codec.ImageCodec(cfg).encode(img)
    rng = np.random.default_rng(5)
    for _ in range(20):
        mutated = bytearray(data)
        i = int(rng.integers(4, len(mutated)))
        mutated[i] ^= int(rng.integers(1, 256))
        try:
            bad = recovery.verify(bytes(mutated))
            if not bad:
                codec.ImageCodec(cfg).decode(bytes(mutated))
        except (ValueError, IndexError):
            pass


@pytest.mark.parametrize("cfg_i", range(len(CONFIGS)))
def test_asan_harness_payload_corruption(cfg_i, tmp_path):
    """The same mutation families through the ASan/UBSan binary: any OOB
    read/write or UB aborts the process and fails the assert."""
    bin_ = _asan_bin()
    if bin_ is None:
        pytest.skip("sanitizer toolchain unavailable")
    cfg = CONFIGS[cfg_i]
    img = image_io.synthetic_image(64, 64, "photo", seed=cfg_i)
    data = codec.ImageCodec(cfg).encode(img)
    cfg_w, p, bps, n_stripes = _plane_case(data)
    rng = np.random.default_rng(200 + cfg_i)

    # clean case first: statuses must be all zero (harness is wired right)
    case = tmp_path / "clean.bin"
    _write_case(case, cfg_w, list(p.stripes), bps, p.table_lengths,
                p.run_table_lengths if cfg_w.coded_runs else None,
                p.stripe_bits, codec.DIRECT_VMIN)
    r = subprocess.run([str(bin_), str(case)], capture_output=True,
                       text=True, timeout=60)
    assert r.returncode == 0, r.stderr
    assert "unpack_rc=0" in r.stdout
    assert set(r.stdout.strip().split("status=")[1].split(",")) == {"0"}

    for k, stripes in enumerate(_mutations(list(p.stripes), rng, 24)):
        case = tmp_path / f"m{k}.bin"
        _write_case(case, cfg_w, stripes, bps, p.table_lengths,
                    p.run_table_lengths if cfg_w.coded_runs else None,
                    p.stripe_bits, codec.DIRECT_VMIN)
        r = subprocess.run([str(bin_), str(case)], capture_output=True,
                           text=True, timeout=60)
        assert r.returncode == 0, (
            f"sanitizer abort on mutation {k}:\n{r.stderr[-2000:]}"
        )


def test_asan_harness_hostile_tables(tmp_path):
    bin_ = _asan_bin()
    if bin_ is None:
        pytest.skip("sanitizer toolchain unavailable")
    cfg = CodecConfig(quality=50)
    img = image_io.synthetic_image(64, 64, "photo", seed=13)
    data = codec.ImageCodec(cfg).encode(img)
    cfg_w, p, bps, n_stripes = _plane_case(data)
    rng = np.random.default_rng(6)
    base = np.asarray(p.table_lengths, np.uint8)
    hostiles = [
        np.zeros_like(base), np.full_like(base, 255),
        np.full_like(base, 32), np.full_like(base, 33),
        np.ones_like(base),
        rng.integers(0, 64, base.shape).astype(np.uint8),
    ]
    for k, tl in enumerate(hostiles):
        case = tmp_path / f"t{k}.bin"
        _write_case(case, cfg_w, list(p.stripes), bps, tl, None,
                    p.stripe_bits, codec.DIRECT_VMIN)
        r = subprocess.run([str(bin_), str(case)], capture_output=True,
                           text=True, timeout=60)
        assert r.returncode == 0, (
            f"sanitizer abort on hostile table {k}:\n{r.stderr[-2000:]}"
        )


def test_hostile_direct_table_rejected_by_both_decoders():
    """A hostile direct-mode header can carry alpha up to 65535 and any
    i32 vmin, making sym + vmin exceed the wire's int16 coefficient
    space. Both decoders must REJECT (Python ValueError == native err 2),
    not wrap (native) or crash with numpy OverflowError (Python) — the
    byte-identity contract covers rejection too."""
    import numpy as np

    from dct_tpu import container as cont, native
    from dct_tpu.config import CodecConfig
    from dct_tpu.models import codec, recovery
    from dct_tpu.ops import bitstream as bs
    from dct_tpu.ops import huffman as hf

    cfg = CodecConfig(quality=50, huffman_mode="direct")
    # 40001-symbol table (ESC last): symbol 33100 -> 33100 - 255 = 32845
    # > int16. Two 1-bit codes keep the table canonical-valid (Kraft = 1).
    lengths = np.zeros(40001, np.uint8)
    lengths[33100] = 1
    lengths[40000] = 1  # ESC
    # stream: code '0' (symbol 33100) + 8-bit run 63 -> places the value
    # at pos 63 and completes the single 8x8 block; 9 bits total
    stripe = bytes([0b00011111, 0b10000000])
    plane = cont.PlaneData(
        width=8, height=8, table_lengths=lengths, vmin=-255,
        variance_codes=None, stripe_bits=np.asarray([9], np.uint32),
        stripes=[stripe],
    )
    data = cont.serialize(
        cont.Container(config=cfg, width=8, height=8, planes=[plane])
    )

    # full decode path (native when available): clean rejection
    with pytest.raises(ValueError):
        codec.decode(data)
    # Python reference decoder: identical rejection
    with pytest.raises(ValueError):
        bs.unpack_stripe_host(
            stripe, 1, 64, "direct",
            val_table=hf.CanonicalTable(lengths), vmin=-255,
        )
    # native decoder called directly (when built): err=2, not rc=0+wrap
    if native.available():
        with pytest.raises(ValueError, match="code 2"):
            native.unpack_stripes(
                [stripe], 1, 64, "direct", hf.CanonicalTable(lengths), -255
            )
    # integrity scan flags the stripe instead of crashing
    assert recovery.verify(data) != []


def test_hostile_vmin_no_overflow():
    """vmin is an arbitrary i32 wire field: sym + vmin near INT32_MAX must
    not overflow (UB in C, OverflowError in numpy) — both decoders reject
    cleanly."""
    import numpy as np

    from dct_tpu import native
    from dct_tpu.ops import bitstream as bs
    from dct_tpu.ops import huffman as hf

    lengths = np.zeros(3, np.uint8)
    lengths[0] = 1  # symbol 0
    lengths[2] = 1  # ESC
    stripe = bytes([0b00011111, 0b10000000])  # sym 0, run 63
    for vmin in (2**31 - 1, -(2**31)):
        with pytest.raises(ValueError):
            bs.unpack_stripe_host(
                stripe, 1, 64, "direct",
                val_table=hf.CanonicalTable(lengths), vmin=vmin,
            )
        if native.available():
            with pytest.raises(ValueError, match="code 2"):
                native.unpack_stripes(
                    [stripe], 1, 64, "direct",
                    hf.CanonicalTable(lengths), vmin,
                )
