"""Round-trip and compression checks on REAL (non-synthetic) content.

Round-1 validated exclusively on image_io.synthetic_image output
(VERDICT.md weak #6). tests/data/ carries four committed real rasters
(see tests/data/make_real_images.py for provenance): a photograph, an MRI
slice, and two elevation grids. These tests pin the claims that matter:
reconstruction quality, coded_runs / dc_prediction byte savings, and the
static-table penalty staying small on content the tables were NOT fitted
to per-image.
"""

import os

import numpy as np
import pytest

from dct_tpu.config import CodecConfig
from dct_tpu.models import codec
from dct_tpu.utils import image_io, metrics

DATA = os.path.join(os.path.dirname(__file__), "data")


def load(name):
    return image_io.read_image(os.path.join(DATA, name + ".pgm"))


@pytest.mark.parametrize("name", ["mri", "topobathy"])
@pytest.mark.parametrize("quality,min_psnr", [(10, 25.0), (50, 30.0)])
def test_roundtrip_psnr(name, quality, min_psnr):
    img = load(name)
    c = codec.ImageCodec(CodecConfig(quality=quality))
    rec = c.decode(c.encode(img))
    assert rec.shape == img.shape
    assert float(metrics.psnr(img, rec)) >= min_psnr


def test_entropy_upgrades_save_bytes_on_real_content():
    img = load("mri")
    base = len(codec.ImageCodec(CodecConfig(quality=50)).encode(img))
    runs = len(
        codec.ImageCodec(CodecConfig(quality=50, coded_runs=True)).encode(img)
    )
    dc = len(
        codec.ImageCodec(
            CodecConfig(quality=50, coded_runs=True, dc_prediction=True)
        ).encode(img)
    )
    assert runs < base * 0.70  # measured ~43% saving; assert a safe margin
    assert dc < runs  # DC prediction strictly helps on smooth content


@pytest.mark.parametrize("quality", [10, 50, 90])
def test_static_table_penalty_bounded(quality):
    """Quality-banded static defaults stay within a few percent of
    per-image dynamic tables on real content (measured worst 4.4%,
    benchmarks/real_validation.py)."""
    img = load("hopper")
    dyn = len(codec.ImageCodec(CodecConfig(quality=quality)).encode(img))
    static = len(
        codec.ImageCodec(
            CodecConfig(quality=quality, static_tables=True)
        ).encode(img)
    )
    assert static <= dyn * 1.08
    # and the static stream still decodes to the same quality
    c = codec.ImageCodec(CodecConfig(quality=quality, static_tables=True))
    rec = c.decode(c.encode(img))
    assert float(metrics.psnr(img, rec)) >= 25.0
