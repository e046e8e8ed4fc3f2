"""Shared test staging helpers (the device-transport contract, defined
once instead of per-file copies)."""

import numpy as np

from pim_jpeg_decoder_tpu.models.pipeline import build_qpool
from pim_jpeg_decoder_tpu.ops import specs as S
from pim_jpeg_decoder_tpu.ops.decode_kernel import pad_mcus


def stage_single(header, coeffs, lane_tile=128):
    """Single-image device-transport staging: ``[num_mcus, g, 64]``
    coefficients -> lane-padded ``(padded, qidx, qpool, mode)``."""
    mode = S.mode_for(header.mode_key)
    m_pad = pad_mcus(header.num_mcus, lane_tile)
    padded = np.zeros((m_pad, mode.g, 64), np.int16)
    padded[: header.num_mcus] = coeffs
    qidx = np.zeros(m_pad, np.int32)
    return padded, qidx, build_qpool([header], mode), mode
