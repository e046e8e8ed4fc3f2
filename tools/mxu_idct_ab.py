"""MXU-IDCT prototype A/B (VERDICT r4 item 4): can matmuls beat the VPU
butterflies for the 8-point IDCT passes?

Context (docs/kernel_design.md): the fused kernel sits ~3x above its memcpy
floor and the IDCT is its largest compute phase.  The MXU candidates:

  butterfly   production 13-bit Loeffler passes (idct_math.idct_1d) — VPU
  mxu2pass    each 8-point pass as ONE fp32 [8,8] @ [8, 8*T] matmul
              (SPEED CEILING: fp32 cannot reproduce the integer spec —
              dequantized coeffs reach +-32767, so single products hit
              2^29 >> 2^24, and int32 wrap is part of the oracle semantics.
              An EXACT version needs hi/lo 8-bit splits = 4 matmuls/pass;
              if even this 1-matmul version loses, exactness is moot.)
  mxu2pass4   the exact-arithmetic COST model: 4 matmuls per pass
              (hi/lo splits of matrix and operand) + int32 recombine.
              Numerically exact recombination is NOT implemented — this
              measures the throughput of the exact formulation's op count.
  mxu64       both passes folded into ONE [64,64] @ [64, T] matmul per
              slot (the best possible MXU utilization: contraction 64).
              NOT bit-exact by construction (single rounding, vs the
              spec's round between passes, which PIL pixel-exactness
              requires) — measures the absolute MXU ceiling.

All variants share the idct_stage pallas shape ([g, 64, M] i16 in/out) and
time with the tunnel-immune device loop.  Run on TPU:
    python tools/mxu_idct_ab.py [reps]
Findings land in docs/kernel_design.md; only a winner would motivate
building the exact 4-matmul arithmetic.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pim_jpeg_decoder_tpu.ops import specs as S
from pim_jpeg_decoder_tpu.ops.decode_kernel import LANE_TILE
from pim_jpeg_decoder_tpu.ops.stage_kernels import _idct_kernel

M = 16384
MODE = S.mode_for((2, 2, 3))


def _mat8() -> np.ndarray:
    """8-point inverse-DCT basis at the spec's integer scale, fp32."""
    return np.asarray(S.reduced_idct_matrix(8), np.float32)     # [k, u]


def _kernel_mxu2pass(mode, lane_tile, pieces: int = 1):
    """Each pass = `pieces`^2 [8,8]@[8,8T] fp32 matmuls (pieces=2 models
    the hi/lo-split op count of the exact formulation).  The matrix
    arrives as a kernel INPUT (Pallas forbids captured array constants)."""
    inv1 = np.float32(1.0 / (1 << (S.CONST_BITS - S.PASS1_BITS)))
    inv2 = np.float32(1.0 / (1 << (S.CONST_BITS + S.PASS1_BITS)))

    def kernel(mat_ref, deq_ref, out_ref):
        t = lane_tile
        a = mat_ref[...]

        def matpass(x, inv):                  # x: [8(contract), N] fp32
            if pieces == 1:
                y = jax.lax.dot(a, x, preferred_element_type=jnp.float32)
            else:
                # hi/lo split cost model: 4 matmuls + shifts/adds (int32
                # recombine modeled by the adds below).
                a_hi = jnp.floor(a / 256.0)
                a_lo = a - a_hi * 256.0
                x_hi = jnp.floor(x / 256.0)
                x_lo = x - x_hi * 256.0
                y = (jax.lax.dot(a_hi, x_hi,
                                 preferred_element_type=jnp.float32)
                     * 65536.0
                     + jax.lax.dot(a_hi, x_lo,
                                   preferred_element_type=jnp.float32)
                     * 256.0
                     + jax.lax.dot(a_lo, x_hi,
                                   preferred_element_type=jnp.float32)
                     * 256.0
                     + jax.lax.dot(a_lo, x_lo,
                                   preferred_element_type=jnp.float32))
            # Round-shift stand-in (cost-representative conversions).
            return jnp.round(y * inv).astype(jnp.int32).astype(jnp.float32)

        for s in range(mode.g):
            x = deq_ref[s].astype(jnp.float32).reshape(8, 8 * t)  # [v, h*T]
            y1 = matpass(x, inv1).reshape(8, 8, t)                # [r, h, T]
            y1t = jnp.swapaxes(y1, 0, 1).reshape(8, 8 * t)        # [h, r*T]
            y2 = matpass(y1t, inv2).reshape(8, 8, t)              # [p, r, T]
            spat = jnp.clip(y2.astype(jnp.int32), S.SAMPLE_MIN, S.SAMPLE_MAX)
            out_ref[s] = jnp.swapaxes(spat, 0, 1).reshape(64, t).astype(
                jnp.int16)
    return kernel, _mat8()


def _kernel_mxu64(mode, lane_tile):
    """Both passes as one [64, 64] @ [64, T] matmul per slot."""
    inv = np.float32(1.0 / (1 << (2 * S.CONST_BITS)))

    def kernel(mat_ref, deq_ref, out_ref):
        b = mat_ref[...]
        for s in range(mode.g):
            x = deq_ref[s].astype(jnp.float32)                    # [64, T]
            y = jax.lax.dot(b, x, preferred_element_type=jnp.float32)
            spat = jnp.clip(jnp.round(y * inv).astype(jnp.int32),
                            S.SAMPLE_MIN, S.SAMPLE_MAX)
            out_ref[s] = spat.astype(jnp.int16)
    a = _mat8()
    return kernel, np.kron(a, a).astype(np.float32)


def _call(kernel, mat=None, lane_tile=LANE_TILE):
    def impl(deq):
        m = deq.shape[0]
        x = jnp.transpose(deq.astype(jnp.int16), (1, 2, 0))
        in_specs = [pl.BlockSpec((MODE.g, 64, lane_tile),
                                 lambda i: (0, 0, i),
                                 memory_space=pltpu.VMEM)]
        operands = [x]
        if mat is not None:
            in_specs.insert(0, pl.BlockSpec(
                mat.shape, lambda i: (0,) * mat.ndim,
                memory_space=pltpu.VMEM))
            operands.insert(0, jnp.asarray(mat))
        return pl.pallas_call(
            kernel,
            grid=(m // lane_tile,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((MODE.g, 64, lane_tile),
                                   lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((MODE.g, 64, m), jnp.int16),
            interpret=jax.default_backend() != "tpu",
        )(*operands)
    return jax.jit(impl)


def main() -> None:
    import json

    from pim_jpeg_decoder_tpu.utils.devbench import (
        devloop_seconds_per_launch,
        rotating_args_step,
    )
    from pim_jpeg_decoder_tpu.utils.jaxtools import ensure_compilation_cache

    ensure_compilation_cache()
    rng = np.random.default_rng(0)
    deq_rot = [jax.device_put(
        rng.integers(-2048, 2048, (M, MODE.g, 64)).astype(np.int16))
        for _ in range(8)]

    k2, m2 = _kernel_mxu2pass(MODE, LANE_TILE)
    k4, m4 = _kernel_mxu2pass(MODE, LANE_TILE, pieces=2)
    k64, m64 = _kernel_mxu64(MODE, LANE_TILE)
    variants = {
        "butterfly": _call(_idct_kernel(MODE, LANE_TILE)),
        "mxu2pass": _call(k2, m2),
        "mxu2pass4": _call(k4, m4),
        "mxu64": _call(k64, m64),
    }
    names = sys.argv[1:] or list(variants)
    results = {}
    for name in names:
        fn = variants[name]
        step = rotating_args_step(lambda d, fn=fn: fn(d),
                                  [(d,) for d in deq_rot])

        def consume(o):
            return o.reshape(-1)[0].astype(jnp.int32)

        dt = devloop_seconds_per_launch(step, consume, n_lo=8, n_hi=264,
                                        pairs=4) * 1e6
        results[name] = round(dt, 1)
        print(f"{name:<12} {dt:8.1f} us/launch ({M} MCUs, 4:2:0)",
              flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
