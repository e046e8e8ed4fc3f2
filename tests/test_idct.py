"""Integer IDCT spec tests: tolerance vs the ideal float IDCT.

The reference carries an AAN fixed-point IDCT on the DPU
(reference: src/decoder_dpu.c:179-321); our spec is the 13-bit Loeffler
integer IDCT (ops/specs.py).  These tests pin its accuracy against the ideal
float IDCT in the spirit of IEEE 1180.
"""

import numpy as np
import pytest

from pim_jpeg_decoder_tpu.oracle.idct import (
    dequantize,
    float_idct_blocks,
    idct_blocks,
)
from pim_jpeg_decoder_tpu.ops import specs as S


class TestIdctAccuracy:
    def test_dc_only_block(self):
        """A DC-only block must produce a flat output of DC/8 (rounded)."""
        blk = np.zeros((1, 8, 8), np.int32)
        blk[0, 0, 0] = 800
        out = idct_blocks(blk)
        assert np.all(out == 100)

    def test_sample_range_clamp(self):
        """IDCT output clamps to [-128, 127] (T.81 A.3.1 sample range)."""
        blk = np.zeros((2, 8, 8), np.int32)
        blk[0, 0, 0] = 8000
        blk[1, 0, 0] = -8000
        out = idct_blocks(blk)
        assert np.all(out[0] == 127)
        assert np.all(out[1] == -128)

    def test_zero_block(self):
        out = idct_blocks(np.zeros((4, 8, 8), np.int32))
        assert np.all(out == 0)

    def test_matches_float_idct_within_one(self, rng):
        """Random realistic coefficient blocks: |int - float| <= 1."""
        coeffs = np.zeros((512, 8, 8), np.int32)
        # Realistic spectra: large DC, decaying AC.
        coeffs[:, 0, 0] = rng.integers(-1024, 1024, 512)
        for u in range(8):
            for v in range(8):
                if u or v:
                    scale = max(1, 256 // (1 + 4 * (u + v)))
                    coeffs[:, u, v] = rng.integers(-scale, scale + 1, 512)
        got = idct_blocks(coeffs, clamp=False)
        want = float_idct_blocks(coeffs)
        assert np.abs(got - want).max() <= 1.0

    def test_single_basis_functions(self):
        """Each single-coefficient block matches the float basis function."""
        for u in range(8):
            for v in range(8):
                blk = np.zeros((1, 8, 8), np.int32)
                blk[0, u, v] = 512
                got = idct_blocks(blk, clamp=False)
                want = float_idct_blocks(blk)
                assert np.abs(got - want).max() <= 1.0, (u, v)

    def test_linearity_modulo_rounding(self, rng):
        c1 = rng.integers(-512, 512, (16, 8, 8)).astype(np.int32)
        c2 = rng.integers(-512, 512, (16, 8, 8)).astype(np.int32)
        lhs = idct_blocks(c1 + c2, clamp=False)
        rhs = idct_blocks(c1, clamp=False) + idct_blocks(c2, clamp=False)
        assert np.abs(lhs - rhs).max() <= 2  # rounding drift only

    def test_extreme_values_no_crash(self):
        """Adversarial full-scale blocks must not raise (wrap is acceptable)."""
        blk = np.full((2, 8, 8), S.DEQUANT_CLAMP, np.int32)
        blk[1] = -S.DEQUANT_CLAMP - 1
        out = idct_blocks(blk)
        assert out.shape == (2, 8, 8)


class TestDequantize:
    def test_elementwise_multiply(self):
        coeffs = np.arange(64, dtype=np.int16).reshape(1, 64)
        qt = np.full((1, 64), 3, np.uint16)
        out = dequantize(coeffs, qt)
        assert out.dtype == np.int32
        np.testing.assert_array_equal(out, coeffs.astype(np.int32) * 3)

    def test_clamp(self):
        coeffs = np.array([[2047, -2048]], np.int16)
        qt = np.array([[255, 255]], np.uint16)
        out = dequantize(coeffs, qt)
        np.testing.assert_array_equal(out, [[S.DEQUANT_CLAMP, -S.DEQUANT_CLAMP - 1]])


class TestDescale:
    @pytest.mark.parametrize("x,n,expected", [
        (8, 3, 1), (7, 3, 1), (4, 3, 1), (3, 3, 0),
        (-8, 3, -1), (-4, 3, 0), (-5, 3, -1), (-13, 3, -2),
        (0, 3, 0),
    ])
    def test_rounding(self, x, n, expected):
        assert S.descale(x, n) == expected

    def test_arithmetic_shift_on_arrays(self):
        x = np.array([-13, 13], np.int32)
        np.testing.assert_array_equal(S.descale(x, 3), [-2, 2])
