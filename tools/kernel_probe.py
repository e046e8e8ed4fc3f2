"""Throwaway perf probe: isolate which stage dominates the fused kernel.

Variants:
  full    — the production fused kernel (raw layout)
  deq     — dequant only, store clamped deq as uint8 (no IDCT/color)
  idct    — dequant + IDCT, no color/upsample
  memcpy  — pure load->store of the coeff tile (HBM bound floor)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pim_jpeg_decoder_tpu.ops import specs as S
from pim_jpeg_decoder_tpu.ops.decode_kernel import (
    LANE_TILE, _idct_block, decode_mcus)
from pim_jpeg_decoder_tpu.utils.jaxtools import ensure_compilation_cache

M = 16384
REPS = 100
mode = S.mode_for((2, 2, 3))
gy = mode.luma_slots


def variant_kernel(which, lane_tile):
    from pim_jpeg_decoder_tpu.ops.decode_kernel import _color, _upsample

    def kernel(qidx_ref, coeff_ref, qpool_ref, out_ref):
        t = lane_tile
        image_ids = qidx_ref[0, :]
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (16, t), 0)
                  == image_ids[None, :]).astype(jnp.float32)
        if which == "memcpy":
            for s in range(gy):
                out_ref[0, s * 64:(s + 1) * 64, :] = (
                    coeff_ref[s].astype(jnp.uint8))
            for ch in (1, 2):
                out_ref[ch] = out_ref[0]
            return
        spat = []
        for s in range(mode.g):
            q = jax.lax.dot(qpool_ref[s], onehot,
                            preferred_element_type=jnp.float32
                            ).astype(jnp.int32)
            deq = coeff_ref[s].astype(jnp.int32) * q
            deq = jnp.clip(deq, -S.DEQUANT_CLAMP - 1, S.DEQUANT_CLAMP)
            if which == "deq":
                spat.append(deq.reshape(8, 8, t))
            else:
                spat.append(_idct_block(deq.reshape(8, 8, t)))
        if which in ("deq", "idct"):
            for s in range(gy):
                out_ref[0, s * 64:(s + 1) * 64, :] = (
                    jnp.clip(spat[s], 0, 255).astype(jnp.uint8
                                                     ).reshape(64, t))
            for ch in (1, 2):
                out_ref[ch] = out_ref[0]
            return
        cb, cr = spat[gy], spat[gy + 1]
        if which == "store12":
            # Same 12-store pattern as full, but no color/upsample math.
            for s in range(gy):
                for ch in range(3):
                    out_ref[ch, s * 64:(s + 1) * 64, :] = (
                        jnp.clip(spat[s] + ch, 0, 255).astype(jnp.uint8
                                                              ).reshape(64, t))
            return
        if which == "noupsample":
            for s in range(gy):
                r, g, b = _color(spat[s], cb, cr)
                for ch, plane in enumerate((r, g, b)):
                    out_ref[ch, s * 64:(s + 1) * 64, :] = (
                        jnp.clip(plane, 0, 255).astype(jnp.uint8
                                                       ).reshape(64, t))
            return
        if which == "gather3":
            # Full math but gather each channel into one [gy*64, t] store.
            planes = [[], [], []]
            for s in range(gy):
                qv, qh = mode.luma_slot_pos(s)
                cb_s = _upsample(cb, qv, qh, mode.v, mode.h)
                cr_s = _upsample(cr, qv, qh, mode.v, mode.h)
                for ch, plane in enumerate(_color(spat[s], cb_s, cr_s)):
                    planes[ch].append(
                        jnp.clip(plane, 0, 255).astype(jnp.uint8
                                                       ).reshape(64, t))
            for ch in range(3):
                out_ref[ch] = jnp.concatenate(planes[ch], axis=0)
            return
        raise ValueError(which)

    if which == "mk":
        from pim_jpeg_decoder_tpu.ops.decode_kernel import _make_kernel
        return _make_kernel(mode, lane_tile, 16)
    return kernel


@functools.partial(jax.jit, static_argnames=("which", "lane_tile"))
def run_variant(coeffs, qidx, qpool, which, lane_tile):
    x = jnp.transpose(coeffs, (1, 2, 0))
    qp = jnp.transpose(qpool, (1, 2, 0))
    qidx2 = qidx[None, :]
    grid = (M // lane_tile,)
    out = pl.pallas_call(
        variant_kernel(which, lane_tile),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, lane_tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mode.g, 64, lane_tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mode.g, 64, 16), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, gy * 64, lane_tile), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, gy * 64, M), jnp.uint8),
    )(qidx2, x, qp)
    if which == "mk":
        return out.reshape(3, gy, 64, M)
    return out


def bench_interleaved(fns, bufs, qidx, qpool, rounds=10, reps=30):
    """Time each fn in alternating rounds; min per fn (us/launch)."""
    for fn in fns.values():
        jax.block_until_ready(fn(bufs[0], qidx, qpool))
    best = {k: float("inf") for k in fns}
    for _ in range(rounds):
        for k, fn in fns.items():
            t0 = time.monotonic()
            outs = [fn(bufs[i % len(bufs)], qidx, qpool)
                    for i in range(reps)]
            jax.block_until_ready(outs)
            best[k] = min(best[k], (time.monotonic() - t0) / reps * 1e6)
    return best


def main():
    ensure_compilation_cache()
    rng = np.random.default_rng(0)
    bufs = [jax.device_put(
        rng.integers(-200, 200, (M, mode.g, 64)).astype(np.int16))
        for _ in range(8)]
    qidx = jax.device_put((np.arange(M) % 16).astype(np.int32))
    qpool = jax.device_put(
        rng.integers(1, 64, (16, mode.g, 64)).astype(np.float32))

    mp = M * mode.mcu_px_h * mode.mcu_px_w / 1e6
    for lane_tile in (256, 512):
        fns = {}
        for which in ("gather3", "mk", "full"):
            if which == "full":
                fns[which] = functools.partial(
                    lambda c, qi, qp, lt: decode_mcus(
                        c, qi, qp, mode, lane_tile=lt, raw=True),
                    lt=lane_tile)
            else:
                fns[which] = functools.partial(run_variant, which=which,
                                               lane_tile=lane_tile)
        best = bench_interleaved(fns, bufs, qidx, qpool)
        for which, us in best.items():
            print(f"lane_tile={lane_tile:4d} {which:7s}: "
                  f"{us:8.1f} us/launch  {mp / us * 1e6:8.1f} MP/s")


if __name__ == "__main__":
    main()
