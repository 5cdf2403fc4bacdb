"""Transform layer tests: DCT basis, forward/inverse round-trip, fused
encode/decode operators, golden vectors from SURVEY.md section 4."""

import numpy as np
import pytest

import jax.numpy as jnp

from dct_tpu import tables
from dct_tpu.config import CodecConfig
from dct_tpu.ops import transform


class TestBasis:
    def test_orthonormal(self):
        for n in (4, 8, 16):
            d = tables.dct_basis(n)
            np.testing.assert_allclose(d @ d.T, np.eye(n), atol=1e-12)

    def test_dc_row(self):
        d = tables.dct_basis(8)
        np.testing.assert_allclose(d[0], np.full(8, 1 / np.sqrt(8)), atol=1e-15)

    def test_matches_oracle(self, oracle):
        for n in (4, 8, 16):
            np.testing.assert_allclose(
                tables.dct_basis(n), oracle.dct_matrix(n), atol=1e-14
            )


class TestDCT2:
    def test_golden_dc(self, golden_block):
        """DC coefficient of the textbook block is -415.37 (SURVEY.md §4,
        matching the canonical JPEG-spec example)."""
        x = transform.level_shift(jnp.asarray(golden_block))[None]
        y = np.asarray(transform.dct2(x))[0]
        assert abs(y[0, 0] - (-415.37)) < 0.01

    def test_golden_topleft(self, golden_block):
        """Top-left 4x4 of the golden block's DCT (measured from the
        reference, SURVEY.md §4)."""
        expected = np.array(
            [
                [-415.37, -30.19, -61.20, 27.24],
                [4.47, -21.86, -60.76, 10.25],
                [-46.83, 7.37, 77.13, -24.56],
                [-48.53, 12.07, 34.10, -14.76],
            ]
        )
        x = transform.level_shift(jnp.asarray(golden_block))[None]
        y = np.asarray(transform.dct2(x))[0]
        np.testing.assert_allclose(y[:4, :4], expected, atol=0.01)

    def test_roundtrip_mse(self, golden_block):
        """forward o inverse == identity, MSE < 0.01 — the reference's own
        property test (test_dct.c:85-92); float32 should be ~1e-9."""
        x = transform.level_shift(jnp.asarray(golden_block))[None]
        rec = transform.idct2(transform.dct2(x))
        mse = float(jnp.mean((rec - x) ** 2))
        assert mse < 1e-6

    def test_roundtrip_random_batch(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(-128, 127, size=(64, 8, 8)), jnp.float32)
        rec = transform.idct2(transform.dct2(x))
        assert float(jnp.max(jnp.abs(rec - x))) < 1e-3

    def test_matches_oracle_f64(self, oracle):
        rng = np.random.default_rng(1)
        for n in (4, 8, 16):
            blk = rng.uniform(-128, 127, size=(n, n))
            got = np.asarray(transform.dct2(jnp.asarray(blk, jnp.float32)[None]))[0]
            want = oracle.dct_forward(blk)
            np.testing.assert_allclose(got, want, atol=2e-3)
            got_i = np.asarray(
                transform.idct2(jnp.asarray(blk, jnp.float32)[None])
            )[0]
            np.testing.assert_allclose(got_i, oracle.dct_inverse(blk), atol=2e-3)


class TestRounding:
    def test_half_away_from_zero(self):
        x = jnp.asarray([0.5, -0.5, 1.5, -1.5, 2.5, -2.5, 0.49, -0.49])
        got = np.asarray(transform.round_half_away(x))
        np.testing.assert_array_equal(got, [1, -1, 2, -2, 3, -3, 0, -0.0])


class TestFusedEncode:
    def test_golden_quantized(self, golden_block):
        """Quantized q50 coefficients of the golden block (BASELINE.md):
        row0 = [-26 -3 -6 2 2 -1 0 0] in natural order."""
        cfg = CodecConfig(quality=50)
        zz = np.asarray(
            transform.encode_blocks(
                jnp.asarray(golden_block.reshape(1, 64)), cfg
            )
        )[0]
        # Map back to natural order for comparison.
        natural = np.zeros(64, np.int32)
        natural[tables.zigzag_permutation(8)] = zz
        block = natural.reshape(8, 8)
        np.testing.assert_array_equal(block[0], [-26, -3, -6, 2, 2, -1, 0, 0])
        np.testing.assert_array_equal(block[1], [0, -2, -4, 1, 1, 0, 0, 0])
        np.testing.assert_array_equal(block[2], [-3, 1, 5, -1, -1, 0, 0, 0])
        np.testing.assert_array_equal(block[3], [-3, 1, 2, -1, 0, 0, 0, 0])
        assert block[4, 0] == 1
        assert np.count_nonzero(block[5:]) == 0

    def test_fused_equals_layered(self, golden_block):
        """Fused single-matmul path == explicit shift->dct2->quantize->zigzag.

        Coefficients whose true value lies exactly on a .5 rounding boundary
        are fp-order-dependent in ANY implementation (the f64 C oracle
        misrounds them through its own accumulation noise — see
        tests/test_parity.py); those may differ by at most 1 and must be
        rare. Away from ties the two paths must agree exactly.
        """
        from dct_tpu.ops import quant

        rng = np.random.default_rng(2)
        px = rng.integers(0, 256, size=(32, 8, 8)).astype(np.uint8)
        for quality in (10, 50, 90, 100):
            cfg = CodecConfig(quality=quality)
            fused = np.asarray(
                transform.encode_blocks(jnp.asarray(px.reshape(-1, 64)), cfg)
            )
            shifted = transform.level_shift(jnp.asarray(px))
            coeffs = transform.dct2(shifted)
            qc = np.asarray(quant.quantize(coeffs, cfg))
            perm = tables.zigzag_permutation(8)
            layered = qc.reshape(-1, 64)[:, perm]
            mism = fused != layered
            assert np.abs(fused - layered).max(initial=0) <= 1
            assert mism.mean() < 0.005, f"quality {quality}: {mism.sum()} mismatches"
            if quality <= 50:
                np.testing.assert_array_equal(fused, layered)

    def test_decode_blocks_roundtrip_q100(self):
        """Quality 100 => all quant steps clamp to 1 (quantization.c:68-73),
        the integer-lossless regime (SURVEY.md B8): decode(encode(x)) == x
        except for DCT float rounding, which stays within +-1 gray level."""
        cfg = CodecConfig(quality=100)
        rng = np.random.default_rng(3)
        px = rng.integers(0, 256, size=(64, 64)).astype(np.uint8)
        zz = transform.encode_blocks(jnp.asarray(px), cfg)
        rec = np.asarray(transform.decode_blocks(zz, cfg))
        assert np.max(np.abs(rec.astype(int) - px.astype(int))) <= 1

    def test_adaptive_fused_equals_layered(self):
        from dct_tpu.ops import quant

        rng = np.random.default_rng(4)
        px = rng.integers(0, 256, size=(16, 8, 8)).astype(np.uint8)
        cfg = CodecConfig(quality=50, adaptive=True)
        var = quant.block_variance(transform.level_shift(jnp.asarray(px)))
        fused = np.asarray(
            transform.encode_blocks(
                jnp.asarray(px.reshape(-1, 64)), cfg, block_variance=var
            )
        )
        coeffs = transform.dct2(transform.level_shift(jnp.asarray(px)))
        layered = np.asarray(quant.quantize(coeffs, cfg, variance=var))
        perm = tables.zigzag_permutation(8)
        np.testing.assert_array_equal(fused, layered.reshape(-1, 64)[:, perm])


class TestZigzag:
    def test_known_order_8(self):
        perm = tables.zigzag_permutation(8)
        # First 10 entries of the canonical 8x8 zigzag (flat indices).
        np.testing.assert_array_equal(
            perm[:10], [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
        )
        assert sorted(perm.tolist()) == list(range(64))

    def test_inverse(self):
        for n in (4, 8, 16):
            perm = tables.zigzag_permutation(n)
            inv = tables.inverse_zigzag_permutation(n)
            np.testing.assert_array_equal(perm[inv], np.arange(n * n))

    def test_matches_oracle(self, oracle):
        for n in (4, 8, 16):
            block = np.arange(n * n, dtype=np.int32).reshape(n, n)
            got = block.ravel()[tables.zigzag_permutation(n)]
            np.testing.assert_array_equal(got, oracle.zigzag(block))
