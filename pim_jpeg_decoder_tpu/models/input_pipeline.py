"""Device-resident batch decode: JPEG bytes -> training batch, no host RGB.

The TPU-native deployment story the reference cannot have: when decode
feeds an ML input pipeline (the ImageNet use-case of BASELINE.json), the
decoded pixels should never leave the chip.  This module decodes a batch of
same-sized JPEGs into a single ``[B, H, W, 3]`` uint8 device array — host
work is only the marker scan + entropy decode (coefficients H2D are ~5-10x
smaller than RGB), and raster assembly happens as XLA reshapes on device
instead of NumPy on host.

Same-size batches are the natural unit for dataset pipelines (size
bucketing happens upstream); mixed-size corpora use
:class:`pim_jpeg_decoder_tpu.runtime.engine.DecodeEngine` instead.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from pim_jpeg_decoder_tpu.codec.header import JpegError, JpegHeader
from pim_jpeg_decoder_tpu.codec.scanner import scan_jpeg
from pim_jpeg_decoder_tpu.models.pipeline import build_qpool, entropy_decode
from pim_jpeg_decoder_tpu.ops import specs as S
from pim_jpeg_decoder_tpu.ops.decode_kernel import (
    LANE_TILE,
    decode_mcus_impl,
    _interpret,
)


@functools.partial(
    jax.jit,
    static_argnames=("mode", "lane_tile", "interpret", "batch", "gh", "gw",
                     "height", "width", "scale"),
)
def _decode_batch_jit(coeffs, qidx, qpool, *, mode: S.ModeSpec,
                      lane_tile: int, interpret: bool, batch: int,
                      gh: int, gw: int, height: int, width: int,
                      scale: int = 1):
    raw = decode_mcus_impl(coeffs, qidx, qpool, mode=mode,
                           lane_tile=lane_tile, interpret=interpret,
                           raw=True, scale=scale)
    v, h = mode.v, mode.h
    n = 8 // scale
    per_img = gh * gw
    # [3, V*H, nn, B*M] kernel-native -> [B, gh*V*n, gw*H*n, 3] raster
    # (one fused relayout on device instead of two).
    img = raw[..., : batch * per_img]
    # Kernel-native slot pixel order is COLUMN-major: reshape as (px, py).
    img = img.reshape(3, v, h, n, n, batch, gh, gw)
    img = img.transpose(5, 6, 1, 4, 7, 2, 3, 0)
    img = img.reshape(batch, gh * v * n, gw * h * n, 3)
    return img[:, :height, :width, :]


def decode_same_size_batch(
    blobs: Sequence[bytes],
    lane_tile: int = LANE_TILE,
    scale: int = 1,
    prepare_threads: int = 4,
    wire: str = "auto",
) -> Tuple[jax.Array, List[JpegHeader]]:
    """Decode same-sized JPEGs into one device-resident ``[B, H, W, 3]``.

    All images must share dimensions and sampling mode.  Returns the device
    array (uint8, still on chip — feed it straight into augmentation or a
    model) and the parsed headers.  ``scale`` in {1, 2, 4, 8} decodes at
    reduced resolution (H and W become ceil(dim/scale)) via the reduced
    IDCT — ~scale^2 less device work for pipelines that downsize anyway.
    ``wire="auto"`` ships coefficients as int8 when the whole batch fits
    (half the H2D bytes; widened exactly on device — see
    runtime.batching.compact_wire); "i16" disables the compaction.
    """
    if scale not in (1, 2, 4, 8):
        raise ValueError(f"scale must be 1, 2, 4 or 8, got {scale}")
    if wire not in ("auto", "i16"):
        raise ValueError(f"wire must be auto/i16, got {wire!r}")
    if not blobs:
        raise ValueError("empty batch")
    from pim_jpeg_decoder_tpu.utils.jaxtools import ensure_compilation_cache
    ensure_compilation_cache()
    headers = [scan_jpeg(b) for b in blobs]
    h0 = headers[0]
    mode = S.mode_for(h0.mode_key)
    for h in headers[1:]:
        if (h.width, h.height, h.mode_key) != (h0.width, h0.height,
                                               h0.mode_key):
            raise JpegError(
                "decode_same_size_batch requires identical dimensions and "
                f"sampling: {(h.width, h.height, h.mode_key)} != "
                f"{(h0.width, h0.height, h0.mode_key)}")

    batch = len(blobs)
    per_img = h0.num_mcus
    m_total = batch * per_img
    m_pad = -(-m_total // lane_tile) * lane_tile

    coeffs = np.zeros((m_pad, mode.g, 64), np.int16)
    qidx = np.zeros(m_pad, np.int32)
    # Entropy decode in parallel: the C++ decoder releases the GIL.
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max(1, min(prepare_threads, batch))) as pool:
        decoded = list(pool.map(entropy_decode, headers))
    for i, c in enumerate(decoded):
        coeffs[i * per_img:(i + 1) * per_img] = c
        qidx[i * per_img:(i + 1) * per_img] = i
    qpool = build_qpool(headers, mode)

    if wire == "auto":
        from pim_jpeg_decoder_tpu.runtime.batching import compact_wire
        coeffs = compact_wire(coeffs)
    out = _decode_batch_jit(
        jnp.asarray(coeffs), jnp.asarray(qidx),
        jnp.asarray(qpool, jnp.float32),
        mode=mode, lane_tile=lane_tile, interpret=_interpret(),
        batch=batch, gh=h0.mcu_rows, gw=h0.mcu_cols,
        height=-(-h0.height // scale), width=-(-h0.width // scale),
        scale=scale)
    return out, headers
