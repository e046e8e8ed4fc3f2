"""Measure TPU scalar-core variable-length-code decode rate (one segment).

docs/tpu_entropy_analysis.md rejects on-TPU Huffman/VLC decode from the ISA
(the VPU has no per-lane gather, so entropy decode devolves to the scalar
core); this benchmark turns that bullet into a measured bits/s figure so
the rejection is backed by data, not just counting.

The kernel is the MOST FAVORABLE realistic shape for the scalar core: a
``lax.while_loop`` over a bitstream held in SMEM, one 256-entry
lookahead-LUT probe per symbol (8-bit window -> code length + value bits),
no refill misses, no marker checks, no coefficient stores — i.e. a strict
UPPER bound on real Pallas VLC throughput.  Compare against the C++ host
decoder's per-core rate (bench.py: host_entropy_mps, ~360 MP/s ~ 0.5-1
Gbit/s/core on the q75 corpus).

Run on TPU:  python tools/tpu_vlc_bench.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NWORDS = 2048          # 8 KiB bitstream in SMEM
LUT_SIZE = 256


def _vlc_kernel(seed_ref, data_ref, lut_ref, out_ref):
    """Serial symbol loop: 8-bit lookahead LUT, data-dependent advance."""
    nbits = NWORDS * 32 - 64   # stay clear of the tail window

    def cond(state):
        bitpos, acc, nsym = state
        return bitpos < nbits

    def body(state):
        bitpos, acc, nsym = state
        widx = bitpos >> 5
        shift = bitpos & 31
        hi = data_ref[widx]
        lo = data_ref[widx + 1]
        # 32-bit window at bitpos (uint semantics via int32 + masks).
        win = jax.lax.shift_left(hi, shift) | jax.lax.select(
            shift == 0, jnp.int32(0),
            jax.lax.shift_right_logical(lo, 32 - shift))
        probe = jax.lax.shift_right_logical(win, 24) & 0xFF
        entry = lut_ref[probe]
        code_len = entry & 0xF              # 2..8 bits (the harness draws 2..8)
        val_bits = (entry >> 4) & 0xF       # 0..11 magnitude bits
        acc = acc + ((entry >> 8) & 0xFF)
        return bitpos + code_len + val_bits, acc, nsym + 1

    bitpos0 = seed_ref[0] & 1               # vary start: defeat caching
    bitpos, acc, nsym = jax.lax.while_loop(
        cond, body, (bitpos0, jnp.int32(0), jnp.int32(0)))
    out_ref[0] = acc
    out_ref[1] = nsym
    out_ref[2] = bitpos


def run_vlc(seed, data, lut):
    return pl.pallas_call(
        _vlc_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((3,), jnp.int32),
        interpret=jax.default_backend() != "tpu",
    )(seed, data, lut)


def main() -> None:
    from pim_jpeg_decoder_tpu.utils.devbench import devloop_seconds_per_launch
    from pim_jpeg_decoder_tpu.utils.jaxtools import ensure_compilation_cache

    ensure_compilation_cache()
    rng = np.random.default_rng(0)
    data = jax.device_put(
        rng.integers(-2**31, 2**31, NWORDS, np.int64).astype(np.int32))
    # LUT tuned so the mean advance matches a realistic q75 AC stream
    # (~5 bits code + ~2.5 value bits ~ 7.5 bits/symbol).
    lens = rng.integers(2, 9, LUT_SIZE).astype(np.int32)        # 2..8
    vbits = rng.integers(0, 6, LUT_SIZE).astype(np.int32)       # 0..5
    vals = rng.integers(0, 256, LUT_SIZE).astype(np.int32)
    lut = jax.device_put(lens | (vbits << 4) | (vals << 8))

    probe = np.asarray(run_vlc(jnp.asarray([0], jnp.int32), data, lut))
    bits_per_launch = int(probe[2])
    syms_per_launch = int(probe[1])

    def step(i):
        return run_vlc(jnp.reshape(i.astype(jnp.int32), (1,)), data, lut)

    def consume(o):
        return o[0] + o[1]

    dt = devloop_seconds_per_launch(step, consume, n_lo=2, n_hi=34, pairs=3)
    mbits = bits_per_launch / dt / 1e6
    msyms = syms_per_launch / dt / 1e6
    print(json.dumps({
        "metric": "TPU scalar-core VLC decode (upper bound)",
        "value": round(mbits, 1),
        "unit": "Mbit/s",
        "msymbols_per_s": round(msyms, 2),
        "bits_per_launch": bits_per_launch,
        "ns_per_symbol": round(dt / syms_per_launch * 1e9, 2),
        "note": "one 256-entry SMEM LUT probe/symbol, no stores - "
                "strict upper bound on Pallas VLC",
    }))


if __name__ == "__main__":
    main()
