"""Per-stage device timing with the reference's metric taxonomy.

Reports dequantize / IDCT / color-convert device time separately (the
reference's per-DPU-phase cycle counters, reference: src/decoder_dpu.c:94-107
/ decoder_host.cpp:388-391), plus the fused kernel, quantifying the fusion
win over the reference's 3-phase MRAM-round-trip design.

Run on TPU:  python tools/stage_profile.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(f, n=30):
    import jax
    jax.block_until_ready(f())
    t0 = time.monotonic()
    outs = [f() for _ in range(n)]
    jax.block_until_ready(outs)
    return (time.monotonic() - t0) / n


def main() -> None:
    import jax

    from pim_jpeg_decoder_tpu.ops import specs as S
    from pim_jpeg_decoder_tpu.ops.decode_kernel import decode_mcus
    from pim_jpeg_decoder_tpu.ops.stage_kernels import (
        color_stage,
        dequantize_stage,
        idct_stage,
    )

    mode = S.mode_for((2, 2, 3))
    m = 16384
    rng = np.random.default_rng(0)
    coeffs = jax.device_put(
        rng.integers(-200, 200, (m, mode.g, 64)).astype(np.int16))
    qidx = jax.device_put((np.arange(m) % 16).astype(np.int32))
    qpool = jax.device_put(
        rng.integers(1, 64, (16, mode.g, 64)).astype(np.float32))

    deq = dequantize_stage(coeffs, qidx, qpool, mode=mode)
    spat = idct_stage(deq, mode=mode)

    mp = m * 256 / 1e6
    t_deq = timeit(lambda: dequantize_stage(coeffs, qidx, qpool, mode=mode))
    t_idct = timeit(lambda: idct_stage(deq, mode=mode))
    t_color = timeit(lambda: color_stage(spat, mode=mode))
    t_fused = timeit(lambda: decode_mcus(coeffs, qidx, qpool, mode))

    print(json.dumps({
        "megapixels_per_launch": mp,
        "dequantize_us": round(t_deq * 1e6, 1),
        "idct_us": round(t_idct * 1e6, 1),
        "color_convert_us": round(t_color * 1e6, 1),
        "staged_total_us": round((t_deq + t_idct + t_color) * 1e6, 1),
        "fused_us": round(t_fused * 1e6, 1),
        "fusion_speedup": round((t_deq + t_idct + t_color) / t_fused, 2),
    }))


if __name__ == "__main__":
    main()
