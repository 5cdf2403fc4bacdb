#!/usr/bin/env python
"""Retune the static default Huffman tables on REAL content.

Measures category + run histograms over the real rasters in tests/data/
AND a synthetic set (so neither content class regresses), each
(image, quality) normalized to equal weight, then reports the static-table
penalty (bytes(static)/bytes(dynamic) - 1) per image/quality for the
CURRENT defaults vs the candidate retuned ones. Prints the candidate
pseudo-frequency arrays for pasting into ops/huffman.py.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from dct_tpu.config import CodecConfig  # noqa: E402
from dct_tpu.models import codec  # noqa: E402
from dct_tpu.ops import huffman as hf  # noqa: E402
from dct_tpu.utils import image_io  # noqa: E402

DATA = _os.path.join(_REPO_ROOT, "tests", "data")
QUALITIES = (10, 35, 50, 75, 90)


def images():
    out = []
    for name in ("hopper", "mri", "dem", "topobathy"):
        out.append((name, image_io.read_image(_os.path.join(DATA, name + ".pgm"))))
    for seed in range(2):
        out.append(
            (f"synth{seed}", image_io.synthetic_image(512, 512, "photo", seed=seed))
        )
    return out


BANDS = ((1, 25), (26, 75), (76, 100))  # static-table quality bands


def band_of(q):
    for i, (lo, hi) in enumerate(BANDS):
        if lo <= q <= hi:
            return i
    return len(BANDS) - 1


def main() -> int:
    imgs = images()
    band_qs = ((10, 20), (35, 50, 65), (80, 90, 95))
    cat_acc = [np.zeros(16) for _ in BANDS]
    run_acc = [np.zeros(65) for _ in BANDS]
    for name, img in imgs:
        for bi, qs in enumerate(band_qs):
            for q in qs:
                cfg = CodecConfig(quality=q, coded_runs=True)
                _, _, hist, run_hist = codec.encode_analyze(
                    jax_img(img, cfg), cfg
                )
                h = np.asarray(hist, np.float64)
                rh = np.asarray(run_hist, np.float64).ravel()
                r = np.zeros(65)
                r[: rh.size] = rh[:65]
                cat_acc[bi] += h / max(h.sum(), 1)
                run_acc[bi] += r / max(r.sum(), 1)
    scale = 40000
    cat_bands, run_bands = [], []
    for bi in range(len(BANDS)):
        cat_bands.append(
            np.maximum((cat_acc[bi] / cat_acc[bi].sum() * scale).round(), 1)
            .astype(np.int64)
        )
        run_bands.append(
            np.maximum((run_acc[bi] / run_acc[bi].sum() * scale).round(), 1)
            .astype(np.int64)
        )
        print(f"band {BANDS[bi]} category:")
        print(repr(cat_bands[bi].tolist()))
        print(f"band {BANDS[bi]} runs:")
        print(repr(run_bands[bi].tolist()))

    cur_cat = hf.default_category_table()
    cur_run = hf.default_run_table()
    new_cats = [hf.CanonicalTable.from_frequencies(c) for c in cat_bands]
    new_runs = [
        hf.CanonicalTable.from_frequencies(r, max_len=hf.RUN_MAX_CODE_LEN)
        for r in run_bands
    ]

    def static_bytes(img, q, cat_t, run_t):
        # dynamic-table size vs re-encoding with a forced table: reuse
        # encode_pack via the plane encoder with monkeypatched defaults
        import unittest.mock as mock

        with mock.patch.object(hf, "default_category_table", lambda: cat_t), \
             mock.patch.object(hf, "default_run_table", lambda: run_t):
            # encode_step embeds the tables as jit-trace-time constants;
            # flush the cache or the patch silently does nothing
            jax.clear_caches()
            c = codec.ImageCodec(
                CodecConfig(quality=q, static_tables=True, coded_runs=True)
            )
            n = len(c.encode(img))
        jax.clear_caches()
        return n

    print(f"\n{'image':10s} q   dyn     cur%   new%")
    worst_cur = worst_new = 0.0
    for name, img in imgs:
        for q in (10, 50, 90):
            dyn = len(
                codec.ImageCodec(
                    CodecConfig(quality=q, coded_runs=True)
                ).encode(img)
            )
            cur = static_bytes(img, q, cur_cat, cur_run)
            bi = band_of(q)
            new = static_bytes(img, q, new_cats[bi], new_runs[bi])
            pc = cur / dyn - 1
            pn = new / dyn - 1
            worst_cur = max(worst_cur, pc)
            worst_new = max(worst_new, pn)
            print(f"{name:10s} {q:2d} {dyn:7d}  {pc*100:5.1f}  {pn*100:5.1f}",
                  flush=True)
    print(f"worst: cur {worst_cur*100:.1f}%  new {worst_new*100:.1f}%")
    return 0


def jax_img(img, cfg):
    """Pad a raw plane to the stripe grid the way encode_plane does."""
    import jax.numpy as jnp

    from dct_tpu.ops import blocks as blk

    h, w = int(img.shape[0]), int(img.shape[1])
    n = cfg.block_size
    bh, bw, _ = codec._padded_grid(h, w, cfg)
    im = blk.pad_to_blocks(jnp.asarray(np.asarray(img, np.uint8)), n)
    ph, pw = bh * n, bw * n
    if im.shape[0] != ph or im.shape[1] != pw:
        im = jnp.pad(
            im, ((0, ph - im.shape[0]), (0, pw - im.shape[1])), mode="edge"
        )
    return im


if __name__ == "__main__":
    _sys.exit(main())
