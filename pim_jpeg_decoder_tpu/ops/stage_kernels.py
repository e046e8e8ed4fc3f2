"""Unfused per-stage kernels: dequantize / IDCT / upsample+color.

The production path is the single fused kernel in
:mod:`pim_jpeg_decoder_tpu.ops.decode_kernel`; these three kernels exist for

- per-stage device timing with the reference's metric taxonomy (the DPU's
  init/dequantization/inverse_dct/color_space_conversion cycle counters,
  reference: src/decoder_dpu.c:52-55,94-107 and BASELINE.md), and
- ablation: they intentionally mirror the reference's unfused 3-phase DPU
  pipeline (each block round-trips HBM between stages) so the fusion win is
  measurable.

Composing the three stages is bit-identical to the fused kernel (tested).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pim_jpeg_decoder_tpu.ops import specs as S
from pim_jpeg_decoder_tpu.ops.decode_kernel import (
    LANE_TILE,
    _color,
    _idct_block,
    _interpret,
    _to_u8,
    _upsample,
    check_lane_tile,
)


def _dequant_kernel(mode: S.ModeSpec, lane_tile: int, num_images: int):
    def kernel(qidx_ref, coeff_ref, qpool_ref, out_ref):
        t = lane_tile
        ids = qidx_ref[0, :]
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (num_images, t), 0)
                  == ids[None, :]).astype(jnp.float32)
        for s in range(mode.g):
            q = jax.lax.dot(qpool_ref[s], onehot,
                            preferred_element_type=jnp.float32).astype(jnp.int32)
            deq = coeff_ref[s].astype(jnp.int32) * q
            out_ref[s] = jnp.clip(deq, -S.DEQUANT_CLAMP - 1,
                                  S.DEQUANT_CLAMP).astype(jnp.int16)
    return kernel


def _idct_kernel(mode: S.ModeSpec, lane_tile: int):
    def kernel(deq_ref, out_ref):
        t = lane_tile
        for s in range(mode.g):
            spat = _idct_block(deq_ref[s].astype(jnp.int32).reshape(8, 8, t))
            out_ref[s] = spat.reshape(64, t).astype(jnp.int16)
    return kernel


def _color_kernel(mode: S.ModeSpec, lane_tile: int):
    def kernel(spat_ref, out_ref):
        t = lane_tile
        spat = [spat_ref[s].astype(jnp.int32).reshape(8, 8, t)
                for s in range(mode.g)]
        if mode.ncomp == 1:
            y128 = jnp.clip(jnp.swapaxes(spat[0], 0, 1) + 128,
                            0, 255).astype(jnp.uint8)
            for ch in range(3):
                out_ref[ch, 0:64, :] = y128.reshape(64, t)
            return
        cb, cr = spat[mode.luma_slots], spat[mode.luma_slots + 1]
        for s in range(mode.luma_slots):
            qv, qh = mode.luma_slot_pos(s)
            cb_s = _upsample(cb, qv, qh, mode.v, mode.h)
            cr_s = _upsample(cr, qv, qh, mode.v, mode.h)
            for ch, plane in enumerate(_color(spat[s], cb_s, cr_s)):
                # p-major pixel order, matching the fused kernel's contract.
                out_ref[ch, s * 64:(s + 1) * 64, :] = (
                    _to_u8(jnp.swapaxes(plane, 0, 1), t))
    return kernel


def _specs(mode, lane_tile, q=None):
    ins = [
        pl.BlockSpec((1, lane_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((mode.g, 64, lane_tile), lambda i: (0, 0, i),
                     memory_space=pltpu.VMEM),
    ]
    if q is not None:
        ins.append(pl.BlockSpec((mode.g, 64, q), lambda i: (0, 0, 0),
                                memory_space=pltpu.VMEM))
    return ins


def dequantize_stage_impl(coeffs, qidx, qpool, *, mode, lane_tile=LANE_TILE,
                          interpret=False):
    """[M, g, 64] i16 raw -> [M, g, 64] i16 dequantized (clamped)."""
    m = coeffs.shape[0]
    check_lane_tile(lane_tile, m, interpret)
    q = qpool.shape[0]
    x = jnp.transpose(coeffs.astype(jnp.int16), (1, 2, 0))
    qp = jnp.transpose(qpool.astype(jnp.float32), (1, 2, 0))
    out = pl.pallas_call(
        _dequant_kernel(mode, lane_tile, q),
        grid=(m // lane_tile,),
        in_specs=_specs(mode, lane_tile, q),
        out_specs=pl.BlockSpec((mode.g, 64, lane_tile), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mode.g, 64, m), jnp.int16),
        interpret=interpret,
    )(qidx.astype(jnp.int32)[None], x, qp)
    return jnp.transpose(out, (2, 0, 1))


def idct_stage_impl(deq, *, mode, lane_tile=LANE_TILE, interpret=False):
    """[M, g, 64] i16 dequantized -> [M, g, 64] i16 spatial samples."""
    m = deq.shape[0]
    check_lane_tile(lane_tile, m, interpret)
    x = jnp.transpose(deq.astype(jnp.int16), (1, 2, 0))
    out = pl.pallas_call(
        _idct_kernel(mode, lane_tile),
        grid=(m // lane_tile,),
        in_specs=[pl.BlockSpec((mode.g, 64, lane_tile), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((mode.g, 64, lane_tile), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mode.g, 64, m), jnp.int16),
        interpret=interpret,
    )(x)
    return jnp.transpose(out, (2, 0, 1))


def color_stage_impl(spat, *, mode, lane_tile=LANE_TILE, interpret=False):
    """[M, g, 64] i16 spatial -> [M, luma_slots, 64, 3] u8 RGB."""
    m = spat.shape[0]
    check_lane_tile(lane_tile, m, interpret)
    gy = mode.luma_slots
    x = jnp.transpose(spat.astype(jnp.int16), (1, 2, 0))
    out = pl.pallas_call(
        _color_kernel(mode, lane_tile),
        grid=(m // lane_tile,),
        in_specs=[pl.BlockSpec((mode.g, 64, lane_tile), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((3, gy * 64, lane_tile), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, gy * 64, m), jnp.uint8),
        interpret=interpret,
    )(x)
    return jnp.transpose(out.reshape(3, gy, 64, m), (3, 1, 2, 0))


def _jit_stage(impl):
    jitted = jax.jit(impl, static_argnames=("mode", "lane_tile", "interpret"))

    @functools.wraps(impl)
    def call(*args, mode, lane_tile=LANE_TILE, interpret=None):
        if interpret is None:
            interpret = _interpret()
        return jitted(*args, mode=mode, lane_tile=lane_tile,
                      interpret=interpret)
    return call


dequantize_stage = _jit_stage(dequantize_stage_impl)
idct_stage = _jit_stage(idct_stage_impl)
color_stage = _jit_stage(color_stage_impl)


def decode_mcus_staged(coeffs, qidx, qpool, mode, lane_tile=LANE_TILE):
    """Three-phase decode (the reference's unfused DPU pipeline shape)."""
    deq = dequantize_stage(coeffs, qidx, qpool, mode=mode,
                           lane_tile=lane_tile)
    spat = idct_stage(deq, mode=mode, lane_tile=lane_tile)
    return color_stage(spat, mode=mode, lane_tile=lane_tile)
