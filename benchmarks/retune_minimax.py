#!/usr/bin/env python
"""Minimax static-table tuning from cached histograms.

Phase 1 (jax, once): per (image, quality) category + run histograms over
the real rasters in tests/data/ and synthetic photos -> /tmp cache.
Phase 2 (numpy): for each quality band, run a multiplicative-weights
minimax from the band-mean histogram, scoring each candidate by the WORST
per-cell excess bits vs that cell's own optimal (dynamic) table:

    bits(table; cell) = sum_c h_cat[c] * (len_cat[c] + c)
                      + sum_r h_run[r] * len_run[r]
    penalty(cell) = bits(candidate) / bits(dynamic-optimal) - 1

This proxy ignores table headers and DC-prediction interactions but ranks
tables almost identically to real encodes at a fraction of the cost.
Prints the chosen pseudo-freqs per band.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import numpy as np

CACHE = "/tmp/static_table_hists.npz"
BANDS = ((1, 25), (26, 75), (76, 100))
BAND_QS = ((10, 20), (35, 50, 65), (80, 90, 95))


def collect():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from dct_tpu.config import CodecConfig
    from dct_tpu.models import codec
    from dct_tpu.utils import image_io
    from dct_tpu.models.recovery import _padded_plane as jax_img_pad

    def jax_img(img, cfg):
        # the canonical encode_plane padding (models/recovery._padded_plane)
        return jax_img_pad(np.asarray(img, np.uint8), cfg)

    data = _os.path.join(_REPO_ROOT, "tests", "data")
    imgs = [
        (n, image_io.read_image(_os.path.join(data, n + ".pgm")))
        for n in ("hopper", "mri", "dem", "topobathy")
    ] + [
        (f"synth{s}", image_io.synthetic_image(512, 512, "photo", seed=s))
        for s in range(2)
    ]
    names, qs, cats, runs = [], [], [], []
    for name, img in imgs:
        for band in BAND_QS:
            for q in band:
                cfg = CodecConfig(quality=q, coded_runs=True)
                _, _, hist, run_hist = codec.encode_analyze(
                    jax_img(img, cfg), cfg
                )
                names.append(name)
                qs.append(q)
                cats.append(np.asarray(hist, np.float64))
                rh = np.asarray(run_hist, np.float64).ravel()
                r = np.zeros(65)
                r[: rh.size] = rh[:65]
                runs.append(r)
    np.savez(CACHE, names=np.array(names), qs=np.array(qs),
             cats=np.array(cats), runs=np.array(runs))


def main() -> int:
    if not _os.path.exists(CACHE) or "--refresh" in _sys.argv:
        collect()
    d = np.load(CACHE, allow_pickle=True)
    names, qs = d["names"], d["qs"]
    cats, runs = d["cats"], d["runs"]

    from dct_tpu.ops import huffman as hf

    def lens_from(freqs, max_len):
        t = hf.CanonicalTable.from_frequencies(
            np.maximum(freqs.round(), 1).astype(np.int64), max_len=max_len
        )
        return t.lengths.astype(np.float64)

    def bits(cat_h, run_h, cat_len, run_len):
        extra = np.arange(16, dtype=np.float64)
        return (cat_h * (cat_len + extra)).sum() + (run_h * run_len).sum()

    chosen = {}
    for bi, (lo, hi) in enumerate(BANDS):
        sel = (qs >= lo) & (qs <= hi)
        ch, rh = cats[sel], runs[sel]
        cell_names = names[sel]
        mean_c = (ch / ch.sum(1, keepdims=True)).mean(0) * 40000
        mean_r = (rh / rh.sum(1, keepdims=True)).mean(0) * 40000
        opt_bits = np.array([
            bits(ch[i], rh[i],
                 lens_from(ch[i] + 1, hf.MAX_CODE_LEN),
                 lens_from(rh[i] + 1, hf.RUN_MAX_CODE_LEN))
            for i in range(len(ch))
        ])
        # Multiplicative-weights minimax: start from the band mean, then
        # repeatedly upweight the cells the current table serves worst —
        # converges toward the single table minimizing the max penalty.
        chn = ch / ch.sum(1, keepdims=True)
        rhn = rh / rh.sum(1, keepdims=True)
        w = np.ones(len(ch))
        best = None
        for it in range(60):
            cand_c = (w[:, None] * chn).sum(0) / w.sum() * 40000
            cand_r = (w[:, None] * rhn).sum(0) / w.sum() * 40000
            cl = lens_from(cand_c, hf.MAX_CODE_LEN)
            rl = lens_from(cand_r, hf.RUN_MAX_CODE_LEN)
            pen = np.array([
                bits(ch[i], rh[i], cl, rl) / opt_bits[i] - 1
                for i in range(len(ch))
            ])
            score = pen.max()
            if best is None or score < best[0]:
                best = (score, it, cand_c, cand_r)
                wi = int(pen.argmax())
                print(
                    f"band{bi} it={it:2d} worst={score*100:5.1f}% "
                    f"mean={pen.mean()*100:5.1f}% "
                    f"(worst cell: {cell_names[wi]} q{qs[sel][wi]})"
                )
            w = w * np.exp(8.0 * (pen - pen.mean()))
            w = w / w.sum() * len(w)
        chosen[bi] = best
        print(f"band {BANDS[bi]} -> it={best[1]}, worst {best[0]*100:.1f}%")
    for bi, (score, a, cc, rr) in chosen.items():
        print(f"\nband {BANDS[bi]} category pseudo-freqs:")
        print(repr(np.maximum(cc.round(), 1).astype(int).tolist()))
        print(f"band {BANDS[bi]} run pseudo-freqs:")
        print(repr(np.maximum(rr.round(), 1).astype(int).tolist()))
    return 0


if __name__ == "__main__":
    _sys.exit(main())
