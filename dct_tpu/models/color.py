"""Color codec: RGB <-> YCbCr, chroma subsampling, multi-plane container.

The reference is implicitly grayscale (single plane everywhere; SURVEY.md
section 1). This model family extends the same pipeline to color per
BASELINE.json config 3: per-plane DCT+quant with 4:4:4 or 4:2:0 chroma,
using the standard JPEG chrominance quant table for Cb/Cr
(tables.JPEG_CHROMA_QUANT).

Color conversion is BT.601 full-range (the JFIF convention): pure
elementwise VPU work, fused by XLA into the tiling reshapes around it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dct_tpu import container as cont
from dct_tpu.config import CodecConfig
from dct_tpu.models import codec as _codec


def rgb_to_ycbcr(rgb: jax.Array) -> jax.Array:
    """(H, W, 3) u8 RGB -> (H, W, 3) float YCbCr (JFIF full-range BT.601)."""
    x = rgb.astype(jnp.float32)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return jnp.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(ycc: jax.Array) -> jax.Array:
    """(H, W, 3) float YCbCr -> (H, W, 3) u8 RGB."""
    y = ycc[..., 0]
    cb = ycc[..., 1] - 128.0
    cr = ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(jnp.round(rgb), 0, 255).astype(jnp.uint8)


def subsample_420(plane: jax.Array) -> jax.Array:
    """2x2 box-filter downsample (H, W) -> (ceil(H/2), ceil(W/2))."""
    h, w = plane.shape
    ph, pw = h + (h & 1), w + (w & 1)
    x = jnp.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    x = x.reshape(ph // 2, 2, pw // 2, 2)
    return x.mean(axis=(1, 3))


def upsample_420(plane: jax.Array, h: int, w: int) -> jax.Array:
    """Nearest-neighbor 2x upsample back to (h, w)."""
    x = jnp.repeat(jnp.repeat(plane, 2, axis=0), 2, axis=1)
    return x[:h, :w]


def planes_to_rgb(
    y: jax.Array, cb: jax.Array, cr: jax.Array, mode: str, h: int, w: int
) -> jax.Array:
    """Decoded planes -> (h, w, 3) u8 RGB on device: chroma upsample
    (4:2:0) + YCbCr->RGB. The shared reconstruction tail of every color
    decoder (image, batched video, sharded) — keep them byte-identical by
    construction."""
    cb = cb.astype(jnp.float32)
    cr = cr.astype(jnp.float32)
    if mode == "420":
        cb = upsample_420(cb, h, w)
        cr = upsample_420(cr, h, w)
    return ycbcr_to_rgb(jnp.stack([y.astype(jnp.float32), cb, cr], axis=-1))


@functools.partial(jax.jit, static_argnames=("mode",))
def _to_planes(rgb: jax.Array, mode: str):
    ycc = rgb_to_ycbcr(rgb)
    y = jnp.clip(jnp.round(ycc[..., 0]), 0, 255).astype(jnp.uint8)
    cb, cr = ycc[..., 1], ycc[..., 2]
    if mode == "420":
        cb = subsample_420(cb)
        cr = subsample_420(cr)
    cb = jnp.clip(jnp.round(cb), 0, 255).astype(jnp.uint8)
    cr = jnp.clip(jnp.round(cr), 0, 255).astype(jnp.uint8)
    return y, cb, cr


class ColorImageCodec:
    """YCbCr multi-plane codec: chroma '444' or '420'."""

    def __init__(self, config: CodecConfig):
        if config.chroma not in ("444", "420"):
            raise ValueError("ColorImageCodec requires chroma '444' or '420'")
        self.config = config

    def encode(self, rgb: np.ndarray) -> bytes:
        if rgb.ndim != 3 or rgb.shape[-1] != 3:
            raise ValueError(f"expected (H, W, 3) RGB, got {rgb.shape}")
        h, w = int(rgb.shape[0]), int(rgb.shape[1])
        y, cb, cr = _to_planes(jnp.asarray(rgb, jnp.uint8), self.config.chroma)
        planes = [
            _codec.encode_plane(np.asarray(y), self.config, chroma=False),
            _codec.encode_plane(np.asarray(cb), self.config, chroma=True),
            _codec.encode_plane(np.asarray(cr), self.config, chroma=True),
        ]
        return cont.serialize(
            cont.Container(config=self.config, width=w, height=h, planes=planes)
        )

    def decode(self, data: bytes) -> np.ndarray:
        return np.asarray(self.decode_to_device(data))

    def decode_to_device(self, data: bytes) -> jax.Array:
        """Decode with the RGB reconstruction left ON DEVICE (u8 jax
        array) — for on-chip consumers; mirrors ImageCodec.decode_to_device.
        Entropy decode runs on the host; dequant+IDCT per plane plus the
        chroma upsample and YCbCr->RGB stay on device."""
        c = cont.deserialize(data)
        cfg = c.config
        y = _codec.decode_plane_device(c.planes[0], cfg, chroma=False)
        cb = _codec.decode_plane_device(c.planes[1], cfg, chroma=True)
        cr = _codec.decode_plane_device(c.planes[2], cfg, chroma=True)
        return planes_to_rgb(y, cb, cr, cfg.chroma, c.height, c.width)
