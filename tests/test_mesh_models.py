"""Mesh plumbing for the model-level drivers (VERDICT r3 item 4):
rate control and video under a jax.sharding.Mesh.

Contracts:
  * container_size / psnr_at_quality with a mesh return the SAME integer /
    float as unsharded, for every mesh shape — including non-divisible
    stripe counts (mesh-pad stripes masked out of histograms and sums);
  * encode_to_size / encode_to_psnr with a mesh pick the same rung and
    return byte-identical containers;
  * VideoCodec(mesh=...) and encode_video_to_size(mesh=...) are byte-
    identical to the unsharded encoders (batch-global tables via masked
    psum histograms over BOTH mesh axes, pad frames contributing nothing);
  * the sharded single-image encoder supports decode_index (container v2)
    byte-identically.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax

from dct_tpu.config import CodecConfig
from dct_tpu.models import codec, rate_control as rc
from dct_tpu.models.video import VideoCodec
from dct_tpu.parallel import mesh as meshlib, shard_encode as se
from dct_tpu.utils import image_io


def _mesh(n_data: int, n_stripe: int):
    return meshlib.make_mesh(
        n_data=n_data, n_stripe=n_stripe,
        devices=jax.devices()[: n_data * n_stripe],
    )


@pytest.fixture(scope="module")
def image():
    # 13 block rows: non-divisible over 2 and 4 devices (mesh-pad stripes)
    return np.asarray(image_io.synthetic_image(100, 160, "photo", seed=2))


@pytest.fixture(scope="module")
def frames():
    return np.stack([
        np.asarray(image_io.synthetic_image(56, 80, "photo", seed=s))
        for s in range(5)
    ])  # 7 stripes: non-divisible over 2 and 4


@pytest.mark.parametrize("n_stripe", [2, 4])
@pytest.mark.parametrize(
    "cfgkw",
    [dict(), dict(adaptive=True, coded_runs=True), dict(static_tables=True)],
    ids=["dyn", "adaptive+runs", "static"],
)
def test_probes_mesh_invariant(image, n_stripe, cfgkw):
    cfg = CodecConfig(quality=40, **cfgkw)
    mesh = _mesh(1, n_stripe)
    assert rc.container_size(image, cfg, mesh=mesh) == rc.container_size(
        image, cfg
    )
    assert rc.psnr_at_quality(image, cfg, mesh=mesh) == rc.psnr_at_quality(
        image, cfg
    )


def test_encode_to_size_and_psnr_mesh_identical(image):
    cfg = CodecConfig(quality=40)
    mesh = _mesh(1, 4)
    d0, q0 = rc.encode_to_size(image, 3000, cfg)
    d1, q1 = rc.encode_to_size(image, 3000, cfg, mesh=mesh)
    assert (q0, d0) == (q1, d1)
    assert len(d1) <= 3000
    d0, q0 = rc.encode_to_psnr(image, 30.0, cfg)
    d1, q1 = rc.encode_to_psnr(image, 30.0, cfg, mesh=mesh)
    assert (q0, d0) == (q1, d1)


def test_color_probes_and_budget_mesh_identical(image):
    rgb = np.stack(
        [image, np.roll(image, 3, 0), np.roll(image, 5, 1)], axis=-1
    )
    cfg = CodecConfig(quality=40, chroma="420")
    mesh = _mesh(1, 4)
    assert rc.container_size(rgb, cfg, mesh=mesh) == rc.container_size(
        rgb, cfg
    )
    assert rc.psnr_at_quality(rgb, cfg, mesh=mesh) == rc.psnr_at_quality(
        rgb, cfg
    )
    d0, q0 = rc.encode_to_size(rgb, 6000, cfg)
    d1, q1 = rc.encode_to_size(rgb, 6000, cfg, mesh=mesh)
    assert (q0, d0) == (q1, d1)


@pytest.mark.parametrize("mesh_shape", [(1, 2), (2, 2), (1, 4)])
@pytest.mark.parametrize(
    "cfgkw",
    [
        dict(),
        dict(static_tables=True),
        dict(adaptive=True, coded_runs=True),
        dict(huffman_mode="direct"),
        dict(decode_index=True),
    ],
    ids=["dyn", "static", "adaptive+runs", "direct", "indexed"],
)
def test_video_sharded_byte_identical(frames, mesh_shape, cfgkw):
    cfg = CodecConfig(quality=45, **cfgkw)
    ref = VideoCodec(cfg, chunk_frames=3).encode(frames)
    mesh = _mesh(*mesh_shape)
    assert VideoCodec(cfg, chunk_frames=3, mesh=mesh).encode(frames) == ref


def test_video_rate_control_mesh_identical(frames):
    cfg = CodecConfig(quality=45)
    sz0 = rc.video_container_sizes(frames, cfg, chunk_frames=3)
    s0, q0 = rc.encode_video_to_size(frames, 9000, cfg, chunk_frames=3)
    mesh = _mesh(2, 2)
    sz1 = rc.video_container_sizes(frames, cfg, chunk_frames=3, mesh=mesh)
    np.testing.assert_array_equal(sz0, sz1)
    s1, q1 = rc.encode_video_to_size(
        frames, 9000, cfg, chunk_frames=3, mesh=mesh
    )
    assert (q0, s0) == (q1, s1)
    assert sum(len(s) for s in s1) <= 9000


def test_video_indexed_roundtrip(frames):
    cfg = CodecConfig(quality=45, decode_index=True)
    streams = VideoCodec(cfg).encode(frames)
    dec = VideoCodec(cfg).decode(streams)
    assert dec.shape == frames.shape
    # per-frame containers carry a consistent index
    from dct_tpu import container as cont

    c = cont.deserialize(streams[0])
    p = c.planes[0]
    assert int(p.block_bits.sum()) == int(p.stripe_bits.sum())


@pytest.mark.parametrize(
    "cfgkw",
    [
        dict(decode_index=True),
        dict(decode_index=True, static_tables=True),
        dict(decode_index=True, adaptive=True, coded_runs=True),
    ],
    ids=["dyn", "static", "adaptive+runs"],
)
def test_sharded_image_decode_index(image, cfgkw):
    cfg = CodecConfig(quality=45, **cfgkw)
    ref = codec.encode(image, cfg)
    for n_stripe in (2, 4):
        assert se.encode_image_sharded(image, cfg, _mesh(1, n_stripe)) == ref
