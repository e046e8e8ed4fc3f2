"""Per-stage device timing with the reference's metric taxonomy.

Reports dequantize / IDCT / color-convert device time separately (the
reference's per-DPU-phase cycle counters, reference: src/decoder_dpu.c:94-107
/ decoder_host.cpp:388-391), plus the fused kernel, quantifying the fusion
win over the reference's 3-phase MRAM-round-trip design.

Timing methodology: on-device ``lax.fori_loop`` chains with a unique seed
per timed call and paired-median differencing — host-side per-launch timing
through the remote-TPU tunnel is unreliable (see docs/kernel_design.md).

Run on TPU:  python tools/stage_profile.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def devloop_us(make_step, consume):
    """Median us/launch via the shared tunnel-immune harness."""
    from pim_jpeg_decoder_tpu.utils.devbench import devloop_seconds_per_launch
    return devloop_seconds_per_launch(make_step, consume, n_hi=68) * 1e6


def main() -> None:
    import jax
    import jax.numpy as jnp

    from pim_jpeg_decoder_tpu.ops import specs as S
    from pim_jpeg_decoder_tpu.ops.decode_kernel import (LANE_TILE,
                                                        decode_mcus_impl)
    from pim_jpeg_decoder_tpu.ops.stage_kernels import (
        color_stage_impl,
        dequantize_stage_impl,
        idct_stage_impl,
    )
    from pim_jpeg_decoder_tpu.utils.jaxtools import ensure_compilation_cache

    ensure_compilation_cache()
    mode = S.mode_for((2, 2, 3))
    m = 16384
    rng = np.random.default_rng(0)
    coeffs = jax.device_put(
        rng.integers(-200, 200, (m, mode.g, 64)).astype(np.int16))
    qidx = jax.device_put((np.arange(m) % 16).astype(np.int32))
    qpools = jax.device_put(
        rng.integers(1, 64, (64, 16, mode.g, 64)).astype(np.float32))

    from pim_jpeg_decoder_tpu.ops.stage_kernels import (dequantize_stage,
                                                        idct_stage)
    deq = dequantize_stage(coeffs, qidx, qpools[0], mode=mode)
    spat = idct_stage(deq, mode=mode)

    kw = dict(mode=mode, lane_tile=LANE_TILE, interpret=False)

    t_deq = devloop_us(
        lambda s: dequantize_stage_impl(coeffs, qidx,
                                        qpools[s % 64], **kw),
        lambda o: o[0, 0, 0].astype(jnp.int32) + o[-1, -1, -1].astype(jnp.int32))
    t_idct = devloop_us(
        lambda s: idct_stage_impl(deq + (s % 2).astype(jnp.int16), **kw),
        lambda o: o[0, 0, 0].astype(jnp.int32) + o[-1, -1, -1].astype(jnp.int32))
    t_color = devloop_us(
        lambda s: color_stage_impl(spat + (s % 2).astype(jnp.int16), **kw),
        lambda o: o[0, 0, 0, 0].astype(jnp.int32) + o[-1, -1, -1, -1].astype(jnp.int32))
    t_fused = devloop_us(
        lambda s: decode_mcus_impl(coeffs, qidx, qpools[s % 64],
                                   raw=True, **kw),
        lambda o: o[0, 0, 0, 0].astype(jnp.int32) + o[-1, -1, -1, -1].astype(jnp.int32))

    mp = m * 256 / 1e6
    staged = t_deq + t_idct + t_color
    print(json.dumps({
        "megapixels_per_launch": mp,
        "dequantize_us": round(t_deq, 1),
        "idct_us": round(t_idct, 1),
        "color_convert_us": round(t_color, 1),
        "staged_total_us": round(staged, 1),
        "fused_us": round(t_fused, 1),
        "fusion_speedup": round(staged / t_fused, 2),
        "fused_mps": round(mp / t_fused * 1e6, 1),
    }))


if __name__ == "__main__":
    main()
