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
    # Rotate the big inputs so XLA cannot keep a loop-invariant buffer in
    # VMEM across loop iterations (devbench "VMEM-PROMOTION HAZARD").
    n_rot = 8
    coeff_rot = [jax.device_put(
        rng.integers(-200, 200, (m, mode.g, 64)).astype(np.int16))
        for _ in range(n_rot)]
    qidx = jax.device_put((np.arange(m) % 16).astype(np.int32))
    qpool_rot = [jax.device_put(
        rng.integers(1, 64, (16, mode.g, 64)).astype(np.float32))
        for _ in range(n_rot)]

    from pim_jpeg_decoder_tpu.ops.stage_kernels import (dequantize_stage,
                                                        idct_stage)
    from pim_jpeg_decoder_tpu.utils.devbench import rotating_args_step as rotated
    kw = dict(mode=mode, lane_tile=LANE_TILE, interpret=False)
    deq_rot = [dequantize_stage(c, qidx, qp, **kw)
               for c, qp in zip(coeff_rot, qpool_rot)]
    spat_rot = [idct_stage(d, **kw) for d in deq_rot]

    def c3(o):
        return o[0, 0, 0].astype(jnp.int32) + o[-1, -1, -1].astype(jnp.int32)

    def c4(o):
        return (o[0, 0, 0, 0].astype(jnp.int32)
                + o[-1, -1, -1, -1].astype(jnp.int32))

    t_deq = devloop_us(
        rotated(lambda c, qp: dequantize_stage_impl(c, qidx, qp, **kw),
                list(zip(coeff_rot, qpool_rot))), c3)
    t_idct = devloop_us(
        rotated(lambda d: idct_stage_impl(d, **kw),
                [(d,) for d in deq_rot]), c3)
    t_color = devloop_us(
        rotated(lambda sp: color_stage_impl(sp, **kw),
                [(sp,) for sp in spat_rot]), c4)
    t_fused = devloop_us(
        rotated(lambda c, qp: decode_mcus_impl(c, qidx, qp, raw=True, **kw),
                list(zip(coeff_rot, qpool_rot))), c4)

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
