"""Kernel-optimization experiment bench (4:2:0 fused RGB roofline hunt).

Times candidate restructurings of the fused decode kernel against the
production one with the tunnel-immune device loop (utils/devbench.py).
Run on TPU:  python tools/kernel_opt.py [variant ...]

Variants are EXPERIMENTS: bit-exactness is asserted against the production
kernel on random coefficients before timing, but only winners get ported
into ops/decode_kernel.py (with the full test suite).  Findings land in
docs/kernel_design.md.
"""

from __future__ import annotations

import functools
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pim_jpeg_decoder_tpu.ops import specs as S
from pim_jpeg_decoder_tpu.ops.decode_kernel import (
    LANE_TILE,
    _idct_pass1,
    _idct_pass2,
    _assemble_pm,
    _to_u8,
    decode_mcus_impl,
)
from pim_jpeg_decoder_tpu.ops.idct_math import idct_1d

M = 16384
MODE = S.mode_for((2, 2, 3))
Q = 16


def _onehot(qidx_ref, num_images, t):
    ids = qidx_ref[0, :]
    return (jax.lax.broadcasted_iota(jnp.int32, (num_images, t), 0)
            == ids[None, :]).astype(jnp.float32)


def _color_terms(cbl, crl):
    """Column lists -> per-channel term column lists (chroma resolution)."""
    cbl = [jnp.clip(c, S.SAMPLE_MIN, S.SAMPLE_MAX) for c in cbl]
    crl = [jnp.clip(c, S.SAMPLE_MIN, S.SAMPLE_MAX) for c in crl]
    t0 = [S.descale(S.FIX_CR_R * c, S.COLOR_BITS) for c in crl]
    t1 = [S.descale(S.FIX_CB_G * b + S.FIX_CR_G * r, S.COLOR_BITS)
          for b, r in zip(cbl, crl)]
    t2 = [S.descale(S.FIX_CB_B * b, S.COLOR_BITS) for b in cbl]
    return t0, t1, t2


# --- V0: layout-matched memory floor (no compute) ----------------------------
# Same input/output BlockSpecs and byte volume as the production kernel,
# with the IDCT/color replaced by a cast — measures the ACHIEVABLE HBM
# bandwidth for this access pattern, i.e. the honest roofline denominator
# (25 MB / 819 GB/s = 30 us assumes ideal streaming).

def _kernel_memfloor(mode, lane_tile, num_images):
    gy = mode.luma_slots

    def kernel(qidx_ref, coeff_ref, qpool_ref, out_ref):
        # Touch the chroma slots too (the real kernel reads all g slots).
        # NB Mosaic has no i8 vector arithmetic ("Only vector<i16> and
        # vector<i32> are supported") — widen before any op.
        extra = (coeff_ref[gy].astype(jnp.int32)
                 + coeff_ref[gy + 1].astype(jnp.int32))
        for s in range(gy):
            v = (coeff_ref[s].astype(jnp.int32) + extra).astype(jnp.uint8)
            for ch in range(3):
                out_ref[ch, s * 64:(s + 1) * 64, :] = v

    return kernel


# --- V2: chroma pass-2 ONCE per component; row replication via sublane
# repeat at the term add.  Production runs chroma pass-2 per distinct qv
# (2x per component at 4:2:0) so row replication is free list selection;
# this variant computes terms at TRUE chroma resolution (all 8 chroma rows
# in one array) and row-replicates each slot's 4-row term slice with
# pltpu.repeat (one sublane-repeat per slot x channel).

def _kernel_chroma_truerez(mode, lane_tile, num_images):
    gy = mode.luma_slots
    rh, rw = 8 // mode.v, 8 // mode.h
    from pim_jpeg_decoder_tpu.ops.decode_kernel import (_idct_pass1,
                                                        _idct_pass2)

    def kernel(qidx_ref, coeff_ref, qpool_ref, out_ref):
        t = lane_tile
        onehot = _onehot(qidx_ref, num_images, t)

        def deq_slot(s):
            qrow = jax.lax.dot(qpool_ref[s], onehot,
                               preferred_element_type=jnp.float32
                               ).astype(jnp.int32)
            d = coeff_ref[s].astype(jnp.int32) * qrow
            return jnp.clip(d, -S.DEQUANT_CLAMP - 1,
                            S.DEQUANT_CLAMP).reshape(8, 8, t)

        spat = [_assemble_pm(_idct_pass2(_idct_pass1(deq_slot(s))))
                for s in range(gy)]

        # ONE pass-2 per chroma component, un-replicated rows.
        chroma_cols = [_idct_pass2(_idct_pass1(deq_slot(gy + ci)))
                       for ci in range(2)]
        t0, t1, t2 = _color_terms(chroma_cols[0], chroma_cols[1])
        terms = (t0, t1, t2)        # each: list over p of [8 rows, T]

        for s in range(gy):
            qv, qh = mode.luma_slot_pos(s)
            y128 = spat[s] + 128
            for ch in range(3):
                cols = terms[ch]
                if mode.h != 1:
                    cols = [cols[qh * rw + p // mode.h] for p in range(8)]
                term = jnp.stack(cols, axis=0)       # [8(p), 8(r), T]
                if mode.v != 1:
                    sub = term[:, qv * rh:(qv + 1) * rh, :]   # [8, rh, T]
                    # Elementwise row repeat (aabb; pltpu.repeat is tile-
                    # semantics abab): broadcast + reshape.
                    term = jnp.broadcast_to(
                        sub[:, :, None, :], (8, rh, mode.v, t)
                    ).reshape(8, 8, t)
                out_ref[ch, s * 64:(s + 1) * 64, :] = _to_u8(y128 + term, t)

    return kernel


# --- V1: luma slots stacked into ONE butterfly chain -------------------------

def _kernel_stacked(mode, lane_tile, num_images, fuse_deq_mm=False):
    gy = mode.luma_slots        # 4 for 4:2:0
    rh, rw = 8 // mode.v, 8 // mode.h

    def kernel(qidx_ref, coeff_ref, qpool_ref, out_ref):
        t = lane_tile
        onehot = _onehot(qidx_ref, num_images, t)

        if fuse_deq_mm:
            # ONE [g*64, Q] x [Q, T] MXU matmul for the whole quant gather.
            qall = jax.lax.dot(
                qpool_ref[...].reshape(mode.g * 64, num_images), onehot,
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32).reshape(mode.g, 64, t)

            def deq_slot(s):
                d = coeff_ref[s].astype(jnp.int32) * qall[s]
                return jnp.clip(d, -S.DEQUANT_CLAMP - 1,
                                S.DEQUANT_CLAMP).reshape(8, 8, t)
        else:
            def deq_slot(s):
                qrow = jax.lax.dot(qpool_ref[s], onehot,
                                   preferred_element_type=jnp.float32
                                   ).astype(jnp.int32)
                d = coeff_ref[s].astype(jnp.int32) * qrow
                return jnp.clip(d, -S.DEQUANT_CLAMP - 1,
                                S.DEQUANT_CLAMP).reshape(8, 8, t)

        stk = jnp.stack([deq_slot(s) for s in range(gy)], 0)    # [n,8,8,t]
        rows1 = idct_1d([stk[:, v] for v in range(8)],
                        S.CONST_BITS - S.PASS1_BITS)   # list r of [n, 8, t]
        y = jnp.stack(rows1, axis=2)                   # [n, 8(u), 8(r), t]
        cols2 = idct_1d([y[:, u] for u in range(8)],
                        S.CONST_BITS + S.PASS1_BITS + 3)  # list p of [n,8,t]
        spat_all = jnp.clip(jnp.stack(cols2, axis=1),
                            S.SAMPLE_MIN, S.SAMPLE_MAX)   # [n, 8(p), 8(r), t]

        # Chroma exactly as production: fused upsample in the passes.
        chroma_cols = {}
        for ci in range(2):
            rows1c = _idct_pass1(deq_slot(gy + ci))
            for qv in range(mode.v):
                sel = (rows1c if mode.v == 1 else
                       [rows1c[qv * rh + r // mode.v] for r in range(8)])
                chroma_cols[ci, qv] = _idct_pass2(sel)
        term_cols = {}
        for qv in range(mode.v):
            term_cols[qv] = _color_terms(chroma_cols[0, qv],
                                         chroma_cols[1, qv])

        for s in range(gy):
            qv, qh = mode.luma_slot_pos(s)
            y128 = spat_all[s] + 128                       # [8(p), 8(r), t]
            terms = term_cols[qv]
            for ch in range(3):
                cols = terms[ch]
                if mode.h != 1:
                    cols = [cols[qh * rw + p // mode.h] for p in range(8)]
                term = jnp.stack(cols, axis=0)             # [8(p), 8(r), t]
                out_ref[ch, s * 64:(s + 1) * 64, :] = _to_u8(y128 + term, t)

    return kernel


def variant_call(kernel_builder, lane_tile=LANE_TILE, wire_dtype=jnp.int16,
                 **kw):
    def impl(coeffs, qidx, qpool):
        m = coeffs.shape[0]
        q = qpool.shape[0]
        gy = MODE.luma_slots
        x = jnp.transpose(coeffs.astype(wire_dtype), (1, 2, 0))
        qp = jnp.transpose(qpool.astype(jnp.float32), (1, 2, 0))
        return pl.pallas_call(
            kernel_builder(MODE, lane_tile, q, **kw),
            grid=(m // lane_tile,),
            in_specs=[
                pl.BlockSpec((1, lane_tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((MODE.g, 64, lane_tile), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((MODE.g, 64, q), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((3, gy * 64, lane_tile),
                                   lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((3, gy * 64, m), jnp.uint8),
            interpret=jax.default_backend() != "tpu",
        )(qidx.astype(jnp.int32)[None], x, qp)
    return jax.jit(impl)


def main():
    from pim_jpeg_decoder_tpu.utils.devbench import devloop_seconds_per_launch
    from pim_jpeg_decoder_tpu.utils.jaxtools import ensure_compilation_cache

    from pim_jpeg_decoder_tpu.utils.devbench import rotating_args_step

    ensure_compilation_cache()
    rng = np.random.default_rng(0)
    # Rotate the big input across 8 buffers (> VMEM total) so XLA cannot
    # promote a loop-invariant buffer on-chip; devbench's loop-carried
    # guard serializes iterations (see devbench docstring, both hazards).
    coeff_rot = [jax.device_put(
        rng.integers(-200, 200, (M, MODE.g, 64)).astype(np.int16))
        for _ in range(8)]
    coeffs = coeff_rot[0]
    qidx = jax.device_put((np.arange(M) % Q).astype(np.int32))
    qpool_rot = [jax.device_put(
        rng.integers(1, 64, (Q, MODE.g, 64)).astype(np.float32))
        for _ in range(8)]
    qpools = jnp.stack(qpool_rot)

    prod_ref = jax.jit(functools.partial(
        decode_mcus_impl, mode=MODE, lane_tile=LANE_TILE,
        interpret=jax.default_backend() != "tpu", raw=False))
    want = np.asarray(prod_ref(coeffs, qidx, qpools[0]))
    # int8-wire variants run on clipped coefficients (values must fit i8);
    # their reference is production on the SAME clipped values.
    coeff_i8_rot = [jax.device_put(np.clip(np.asarray(c), -127, 127)
                                   .astype(np.int8)) for c in coeff_rot]
    coeffs_i8 = coeff_i8_rot[0]
    coeffs_i8_as16 = jax.device_put(np.asarray(coeffs_i8).astype(np.int16))
    want_i8 = np.asarray(prod_ref(coeffs_i8_as16, qidx, qpools[0]))
    mp = M * 256 / 1e6

    def _prod_kernel_builder(mode, lane_tile, num_images):
        from pim_jpeg_decoder_tpu.ops.decode_kernel import _make_kernel
        return _make_kernel(mode, lane_tile, num_images, 1)

    skip_exact = {"memfloor", "memfloor_i8"}
    uses_i8 = {"memfloor_i8", "prod_i8"}
    variants = {
        "memfloor": variant_call(_kernel_memfloor),
        # int8 coefficient wire: half the input HBM bytes; the kernel body
        # is IDENTICAL (it widens to i32 immediately — Mosaic has no i8
        # vector arithmetic anyway).
        "memfloor_i8": variant_call(_kernel_memfloor, wire_dtype=jnp.int8),
        "prod_i8": variant_call(_prod_kernel_builder, wire_dtype=jnp.int8),
        "chroma_truerez": variant_call(_kernel_chroma_truerez),
        "prod": lambda c, qi, qp: decode_mcus_impl(
            c, qi, qp, mode=MODE, lane_tile=LANE_TILE,
            interpret=jax.default_backend() != "tpu", raw=True),
        "stacked": variant_call(_kernel_stacked),
        "stacked_fusedmm": variant_call(_kernel_stacked, fuse_deq_mm=True),
        "stacked_lt256": variant_call(_kernel_stacked, lane_tile=256,
                                      fuse_deq_mm=True),
        "prod_lt256": lambda c, qi, qp: decode_mcus_impl(
            c, qi, qp, mode=MODE, lane_tile=256,
            interpret=jax.default_backend() != "tpu", raw=True),
    }
    names = sys.argv[1:] or list(variants)
    results = {}
    for name in names:
        fn = variants[name]
        cin = coeffs_i8 if name in uses_i8 else coeffs
        ref = want_i8 if name in uses_i8 else want
        if name in skip_exact:
            ok = None
        else:
            # Correctness first (vs production RGB, slot layout normalized).
            got = np.asarray(fn(cin, qidx, qpools[0]))
            if got.ndim == 4:   # raw [3, gy, 64, M]
                got = got.reshape(3, -1, M)
            got = np.transpose(got.reshape(3, MODE.luma_slots, 64, M),
                               (3, 1, 2, 0))
            ok = np.array_equal(got, ref)

        rot = coeff_i8_rot if name in uses_i8 else coeff_rot
        step = rotating_args_step(
            lambda c, qp, fn=fn: fn(c, qidx, qp),
            list(zip(rot, qpool_rot)))

        def consume(o):
            return o.reshape(-1)[0].astype(jnp.int32)

        dt = devloop_seconds_per_launch(step, consume, n_lo=8,
                                        n_hi=264, pairs=4) * 1e6
        results[name] = {"us": round(dt, 1), "gps": round(mp / dt * 1e3, 1),
                         "bit_exact": ok if ok is None else bool(ok)}
        print(name, results[name], flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
