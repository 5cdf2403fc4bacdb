"""Quantization layer: vectorized quantize/dequantize, per-block variance,
adaptive scaling.

Reference behavior (quantization.c):
  * quantize: ``round(coeff / m)`` elementwise, quantization.c:113-131
  * dequantize: multiply by the dequant matrix — which the reference stores
    as ``1/q`` (quantization.c:101-111), making the non-adaptive path divide
    instead of multiply (bug B1, SURVEY.md section 2.9). The default here is
    the CORRECT dequant (multiply by q); ``compat_b1=True`` reproduces the
    reference bit-for-bit.
  * variance: ``E[x^2] - E[x]^2`` over the block, quantization.c:153-169
    (note: shift-invariant, so raw or level-shifted pixels give the same
    value).
  * adaptive scale: ``v = clamp(var/1000, 0.1, 1.0)``; quantize divisor
    scaled by ``2 - v`` in [1.0, 1.9]; DC (0,0) never scaled; scaled quant
    entries floored at 1.0 — quantization.c:171-211. (The floor never binds:
    table entries are clamped >= 1 and the scale is >= 1.)

These functions operate on batches of blocks in *natural* (N, N) order — the
layer-level API matching the reference's quantize/dequantize signatures. The
production encode path uses the fused operators in ops/transform.py instead,
where the divide is folded into the DCT matmul.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dct_tpu.config import CodecConfig
from dct_tpu import tables
from dct_tpu.ops.transform import round_half_away


def _variance_over(x: jax.Array, axes: tuple[int, ...]) -> jax.Array:
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=axes)
    mean_sq = jnp.mean(x * x, axis=axes)
    return mean_sq - mean * mean


def block_variance(blocks: jax.Array) -> jax.Array:
    """Per-block variance E[x^2] - E[x]^2 (quantization.c:153-169).

    Layout contract: NATURAL (..., N, N) blocks — always reduces over the
    trailing TWO axes. For the production flat layout (..., N^2) use
    :func:`block_variance_flat`. (An earlier shape heuristic that guessed
    the layout from ``shape[-1] == shape[-2]`` misread a batch of exactly
    n^2 flat blocks — e.g. a 64x64 image at N=8 — as one natural block;
    the two entry points make the contract explicit.)

    Returns shape (...,) float32.
    """
    if blocks.ndim < 2:
        raise ValueError(
            f"block_variance expects natural (..., N, N) blocks; got shape "
            f"{blocks.shape}. For flat (..., N^2) rows use block_variance_flat."
        )
    return _variance_over(blocks, (-2, -1))


def block_variance_flat(blocks: jax.Array) -> jax.Array:
    """Per-block variance over FLAT (..., N^2) rows (quantization.c:153-169).

    The production encode paths (staged, fused, sharded) all operate on
    (NB, n^2) flattened blocks; this reduces over the trailing axis only,
    independent of the batch size (a batch of exactly n^2 blocks is NOT a
    single natural block). Returns shape (...,) float32.
    """
    return _variance_over(blocks, (-1,))


def variance_code(variance: jax.Array) -> jax.Array:
    """Quantize normalized variance to a u8 wire code.

    The reference's decoder receives the encoder's float variance out of
    band (the tests simply pass the same variable, test_entropy.c:370); a
    real bitstream must carry it. We quantize ``norm = clamp(var/1000, 0.1,
    1.0)`` to 8 bits: code = round((norm - 0.1) * 255 / 0.9). The ENCODER
    uses the scale reconstructed from this code, so encode and decode use
    bit-identical scales (max scale error 0.0018 vs the float path).
    """
    norm = jnp.clip(variance / 1000.0, 0.1, 1.0)
    return jnp.round((norm - 0.1) * (255.0 / 0.9)).astype(jnp.uint8)


def scale_from_variance_code(code: jax.Array) -> jax.Array:
    """Wire code -> quantize-divisor scale in [1.0, 1.9] (see variance_code)."""
    norm = 0.1 + code.astype(jnp.float32) * (0.9 / 255.0)
    return 2.0 - norm


def adaptive_quant_scale(variance: jax.Array) -> jax.Array:
    """Variance -> quantize-divisor scale in [1.0, 1.9] (quantization.c:186-190).

    High variance (detail) -> scale near 1.0 (preserve detail); low variance
    (flat) -> scale near 1.9 (quantize harder).
    """
    norm = jnp.clip(variance / 1000.0, 0.1, 1.0)
    return 2.0 - norm


def adjusted_quant_matrix(cfg: CodecConfig, variance: jax.Array) -> jax.Array:
    """Per-block adjusted quantization matrix, (..., N, N).

    Mirrors adjust_matrix_for_block(is_quantize=1) (quantization.c:171-211):
    AC entries scaled by (2 - v), DC untouched, entries floored at 1.0.
    """
    q = jnp.asarray(tables.quant_matrix(cfg.block_size, cfg.quality), dtype=jnp.float32)
    s = adaptive_quant_scale(variance)[..., None, None]
    dc_mask = jnp.zeros((cfg.n, cfg.n), dtype=jnp.float32).at[0, 0].set(1.0)
    scaled = q * (dc_mask + (1.0 - dc_mask) * s)
    return jnp.maximum(scaled, 1.0)


def quantize(
    coeffs: jax.Array, cfg: CodecConfig, variance: jax.Array | None = None
) -> jax.Array:
    """DCT coefficients (..., N, N) -> int32 quantized coefficients.

    round(c / m) with C round() semantics (quantization.c:124).
    """
    if cfg.adaptive:
        if variance is None:
            raise ValueError("adaptive quantization requires variance")
        m = adjusted_quant_matrix(cfg, variance)
    else:
        m = jnp.asarray(tables.quant_matrix(cfg.block_size, cfg.quality), dtype=jnp.float32)
    return round_half_away(coeffs.astype(jnp.float32) / m).astype(jnp.int32)


def dequantize(
    qcoeffs: jax.Array, cfg: CodecConfig, variance: jax.Array | None = None
) -> jax.Array:
    """Quantized coefficients (..., N, N) -> float DCT coefficients.

    Default: multiply by the quant step (correct). cfg.compat_b1 multiplies
    by 1/q on the non-adaptive path, reproducing quantization.c:144 with the
    reciprocal table (bug B1). The adaptive path is q * (2 - v) on AC in both
    modes (the reference's double inversion lands on the correct value).
    """
    z = qcoeffs.astype(jnp.float32)
    q = jnp.asarray(tables.quant_matrix(cfg.block_size, cfg.quality), dtype=jnp.float32)
    if cfg.adaptive:
        if variance is None:
            raise ValueError("adaptive dequantization requires variance")
        s = adaptive_quant_scale(variance)[..., None, None]
        dc_mask = jnp.zeros((cfg.n, cfg.n), dtype=jnp.float32).at[0, 0].set(1.0)
        m = q * (dc_mask + (1.0 - dc_mask) * s)
        return z * m
    if cfg.compat_b1:
        return z / q
    return z * q
