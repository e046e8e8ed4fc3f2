"""Fixed-point BT.601 color conversion + nearest-neighbor upsampling tests.

Pins the color spec (ops/specs.py) against float BT.601 — equivalent
coverage for the reference's fused DPU color stage
(reference: src/decoder_dpu.c:323-390).
"""

import numpy as np
import pytest

from pim_jpeg_decoder_tpu.oracle import color as C


def float_bt601(y, cb, cr):
    y = y.astype(np.float64) + 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], -1), 0, 255)


class TestYcbcrToRgb:
    def test_gray_point(self):
        """Zero chroma: R = G = B = Y + 128."""
        y = np.arange(-128, 128, dtype=np.int32)
        z = np.zeros_like(y)
        rgb = C.ycbcr_to_rgb(y, z, z)
        for ch in range(3):
            np.testing.assert_array_equal(rgb[..., ch], (y + 128).astype(np.uint8))

    def test_matches_float_within_one(self, rng):
        y = rng.integers(-160, 160, (64, 64)).astype(np.int32)
        cb = rng.integers(-128, 128, (64, 64)).astype(np.int32)
        cr = rng.integers(-128, 128, (64, 64)).astype(np.int32)
        got = C.ycbcr_to_rgb(y, cb, cr).astype(np.float64)
        want = float_bt601(y, cb, cr)
        assert np.abs(got - want).max() <= 1.0

    def test_clamps(self):
        y = np.array([1000, -1000], np.int32)
        z = np.zeros_like(y)
        rgb = C.ycbcr_to_rgb(y, z, z)
        np.testing.assert_array_equal(rgb[0], [255, 255, 255])
        np.testing.assert_array_equal(rgb[1], [0, 0, 0])

    def test_primaries(self):
        """Saturated chroma corners land on the expected primary-ish colors."""
        # Pure red-ish: Y mid, Cr max.
        rgb = C.ycbcr_to_rgb(np.array([0]), np.array([0]), np.array([127]))
        assert rgb[0, 0] == 255                # R saturates high
        assert rgb[0, 1] < 80                  # G pulled down
        # Pure blue-ish: Cb max.
        rgb = C.ycbcr_to_rgb(np.array([0]), np.array([127]), np.array([0]))
        assert rgb[0, 2] == 255


class TestGrayToRgb:
    def test_replication(self):
        y = np.array([-128, 0, 127], np.int32)
        rgb = C.gray_to_rgb(y)
        np.testing.assert_array_equal(rgb[:, 0], [0, 128, 255])
        np.testing.assert_array_equal(rgb[:, 0], rgb[:, 1])
        np.testing.assert_array_equal(rgb[:, 0], rgb[:, 2])


class TestChromaSubblock:
    def test_444_identity(self):
        blk = np.arange(64).reshape(1, 8, 8)
        out = C.chroma_subblock(blk, 0, 0, 1, 1)
        np.testing.assert_array_equal(out, blk)

    def test_420_quadrants(self):
        blk = np.arange(64).reshape(1, 8, 8)
        for qv in range(2):
            for qh in range(2):
                out = C.chroma_subblock(blk, qv, qh, 2, 2)
                assert out.shape == (1, 8, 8)
                # Each output 2x2 cell replicates one source pixel from the
                # (qv, qh) quadrant (reference: src/decoder_dpu.c:350-355,370).
                for y in range(8):
                    for x in range(8):
                        src = blk[0, qv * 4 + y // 2, qh * 4 + x // 2]
                        assert out[0, y, x] == src

    def test_422_halves(self):
        blk = np.arange(64).reshape(1, 8, 8)
        out = C.chroma_subblock(blk, 0, 1, 1, 2)
        for y in range(8):
            for x in range(8):
                assert out[0, y, x] == blk[0, y, 4 + x // 2]

    def test_440_halves(self):
        blk = np.arange(64).reshape(1, 8, 8)
        out = C.chroma_subblock(blk, 1, 0, 2, 1)
        for y in range(8):
            for x in range(8):
                assert out[0, y, x] == blk[0, 4 + y // 2, x]
