"""Fixed-point integer 8x8 IDCT (NumPy, vectorized over blocks).

Implements the spec in :mod:`pim_jpeg_decoder_tpu.ops.specs`: 13-bit Loeffler
integer IDCT, two separable passes with intermediate descaling, all int32
with arithmetic shifts.  Capability-equivalent of the reference's DPU IDCT
(reference: src/decoder_dpu.c:179-321 ``idct_component``), but using the
compliance-grade Loeffler constants rather than the reference's AAN variant.

The Pallas kernel (:mod:`pim_jpeg_decoder_tpu.ops.decode_kernel`) computes
the identical arithmetic; tests assert bit-exact agreement.
"""

from __future__ import annotations

import numpy as np

from pim_jpeg_decoder_tpu.ops import specs as S


def _idct_1d(x, shift: int):
    """One 8-point Loeffler pass.

    ``x`` is a sequence of 8 int32 arrays (broadcastable shapes); returns the
    8 transformed arrays, descaled by ``shift`` with rounding.
    """
    in0, in1, in2, in3, in4, in5, in6, in7 = x

    # Even part.
    z2 = in2
    z3 = in6
    z1 = (z2 + z3) * S.FIX_0_541196100
    tmp2 = z1 - z3 * S.FIX_1_847759065
    tmp3 = z1 + z2 * S.FIX_0_765366865
    tmp0 = (in0 + in4) << S.CONST_BITS
    tmp1 = (in0 - in4) << S.CONST_BITS
    tmp10 = tmp0 + tmp3
    tmp13 = tmp0 - tmp3
    tmp11 = tmp1 + tmp2
    tmp12 = tmp1 - tmp2

    # Odd part.
    t0, t1, t2, t3 = in7, in5, in3, in1
    z1 = t0 + t3
    z2 = t1 + t2
    z3 = t0 + t2
    z4 = t1 + t3
    z5 = (z3 + z4) * S.FIX_1_175875602
    t0 = t0 * S.FIX_0_298631336
    t1 = t1 * S.FIX_2_053119869
    t2 = t2 * S.FIX_3_072711026
    t3 = t3 * S.FIX_1_501321110
    z1 = z1 * (-S.FIX_0_899976223)
    z2 = z2 * (-S.FIX_2_562915447)
    z3 = z3 * (-S.FIX_1_961570560)
    z4 = z4 * (-S.FIX_0_390180644)
    z3 = z3 + z5
    z4 = z4 + z5
    t0 = t0 + z1 + z3
    t1 = t1 + z2 + z4
    t2 = t2 + z2 + z3
    t3 = t3 + z1 + z4

    return (
        S.descale(tmp10 + t3, shift),
        S.descale(tmp11 + t2, shift),
        S.descale(tmp12 + t1, shift),
        S.descale(tmp13 + t0, shift),
        S.descale(tmp13 - t0, shift),
        S.descale(tmp12 - t1, shift),
        S.descale(tmp11 - t2, shift),
        S.descale(tmp10 - t3, shift),
    )


def idct_blocks(coeffs: np.ndarray, clamp: bool = True) -> np.ndarray:
    """IDCT of dequantized coefficient blocks.

    Args:
      coeffs: ``[..., 8, 8]`` integer array, natural order, already
        dequantized and clamped to int16 range (``specs.DEQUANT_CLAMP``).

    Returns:
      ``[..., 8, 8]`` int32 spatial samples centered at 0 (no +128 level
      shift), clamped to the 8-bit sample range [-128, 127] per T.81 A.3.1.
    """
    x = coeffs.astype(np.int32)

    # Pass 1: transform along the vertical-frequency axis (axis -2), output
    # scaled by 2^PASS1_BITS.
    cols = [x[..., u, :] for u in range(8)]
    cols = _idct_1d(cols, S.CONST_BITS - S.PASS1_BITS)
    y = np.stack(cols, axis=-2)

    # Pass 2: transform along the horizontal-frequency axis (axis -1),
    # final descale removes CONST_BITS + PASS1_BITS and the IDCT's 1/8.
    rows = [y[..., :, v] for v in range(8)]
    rows = _idct_1d(rows, S.CONST_BITS + S.PASS1_BITS + 3)
    out = np.stack(rows, axis=-1)
    if clamp:
        out = np.clip(out, S.SAMPLE_MIN, S.SAMPLE_MAX)
    return out


def dequantize(coeffs: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """Dequantize raw coefficients: elementwise multiply + int16 clamp.

    Equivalent of the reference's DPU dequantize stage
    (reference: src/decoder_dpu.c:158-177); the clamp keeps all IDCT
    intermediates in int32 (see specs.DEQUANT_CLAMP).
    """
    out = coeffs.astype(np.int32) * qt.astype(np.int32)
    return np.clip(out, -S.DEQUANT_CLAMP - 1, S.DEQUANT_CLAMP)


def float_idct_blocks(coeffs: np.ndarray) -> np.ndarray:
    """Ideal float64 IDCT (for tolerance tests only, not part of the spec)."""
    k = np.arange(8)
    c = np.where(k == 0, 1.0 / np.sqrt(2.0), 1.0)
    basis = c[:, None] * np.cos((2 * np.arange(8)[None, :] + 1) * k[:, None] * np.pi / 16) / 2
    # out[y, x] = sum_{u,v} basis[u, y] * basis[v, x] * coeff[u, v]
    return np.einsum("uy,vx,...uv->...yx", basis, basis, coeffs.astype(np.float64))
