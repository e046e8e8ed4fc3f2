"""Per-phase device timing for the CLI "Profiles:" block.

The reference reads per-DPU-phase cycle counters (init / dequantization /
inverse DCT / color conversion, reference: src/decoder_dpu.c:52-55,86-107)
every run and prints them in its exit report
(reference: src/decoder_host.cpp:309-312,388-391).  The TPU production
kernel is ONE fused Pallas program with no phase boundaries, so the
equivalent breakdown is measured, not counted: the unfused per-stage
kernels (:mod:`pim_jpeg_decoder_tpu.ops.stage_kernels`) are timed at the
same (mode, batch, lane_tile) with the tunnel-immune device-loop harness,
alongside the fused production kernel itself.

Measurements are cached on disk keyed by device kind + launch geometry, so
only the first profiled run per configuration pays the stage-kernel
compiles; later CLI runs print the breakdown instantly.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Dict, Optional, Tuple

_CACHE_VERSION = 6   # v6: quant-pool depth Q is part of the key
_CACHE_PATH = os.path.join(tempfile.gettempdir(), "pim_jpeg_tpu",
                           "phase_cache.json")

# (mode_key, m_per_chip, lane_tile, transport, scale, wire, q) observed
# launch geometry; wire is "i8" (compact coefficient wire) or "i16";
# q is the quant-pool depth (packed batches pad to max_images_per_batch,
# dedicated/banded launches use q=1 -- distinct compiled programs).
LaunchKey = Tuple[Tuple[int, int, int], int, int, str, int, str, int]


def _load_cache() -> Dict[str, Dict[str, float]]:
    try:
        with open(_CACHE_PATH) as f:
            data = json.load(f)
        if data.get("version") == _CACHE_VERSION:
            return data.get("entries", {})
    except (OSError, ValueError):
        pass
    return {}


def _save_cache(entries: Dict[str, Dict[str, float]]) -> None:
    try:
        os.makedirs(os.path.dirname(_CACHE_PATH), exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(_CACHE_PATH))
        with os.fdopen(fd, "w") as f:
            json.dump({"version": _CACHE_VERSION, "entries": entries}, f)
        os.replace(tmp, _CACHE_PATH)
    except OSError:
        pass  # cache is an optimization; never fail the report over it


def _cache_key(key: LaunchKey, device_kind: str) -> str:
    mode_key, m, lane_tile, transport, scale, wire, q = key
    return "|".join([device_kind, "x".join(map(str, mode_key)), str(m),
                     str(lane_tile), transport, str(scale), wire, str(q)])


def measure_phases(key: LaunchKey, n_hi: int = 36,
                   cached_only: bool = False) -> Optional[Dict[str, float]]:
    """Phase microseconds per launch for one observed launch geometry.

    Returns {"dequantize_us", "idct_us", "color_us", "fused_us"} —
    "color_us" is absent for the YCbCr wire transport (upsample+color runs
    on the host there) and for scaled decode (the reduced IDCT emits
    spatial samples directly; stage kernels are full-scale only, so scaled
    launches report just the fused time).  Returns None if measurement is
    impossible (e.g. interpret mode would be meaningless).
    """
    import jax
    if jax.default_backend() == "cpu":
        return None

    device_kind = jax.devices()[0].device_kind
    ck = _cache_key(key, device_kind)
    cache = _load_cache()
    if ck in cache:
        return cache[ck]
    if cached_only:
        return None

    import numpy as np

    import jax.numpy as jnp

    from pim_jpeg_decoder_tpu.ops import specs as S
    from pim_jpeg_decoder_tpu.ops.decode_kernel import decode_mcus_impl
    from pim_jpeg_decoder_tpu.utils.devbench import (
        devloop_seconds_per_launch,
        rotating_args_step,
    )
    from pim_jpeg_decoder_tpu.utils.jaxtools import ensure_compilation_cache

    ensure_compilation_cache()
    mode_key, m, lane_tile, transport, scale, wire, q = key
    mode = S.mode_for(mode_key)
    rng = np.random.default_rng(0)
    # Rotate every large input so XLA cannot keep a loop-invariant buffer
    # in VMEM across iterations (devbench "VMEM-PROMOTION HAZARD").  The
    # rotation working set must exceed VMEM (~16 MB planning number), so
    # small launch geometries need more buffers; cap the lax.switch fan-out
    # at 48 (tiny launches are overhead-dominated regardless).
    wire_np = np.int8 if wire == "i8" else np.int16
    buf_bytes = m * mode.g * 64 * np.dtype(wire_np).itemsize
    n_rot = int(min(48, max(8, -(-48 * 2**20 // max(1, buf_bytes)))))
    lo, hi = (-100, 100) if wire == "i8" else (-200, 200)
    coeff_rot = [jax.device_put(
        rng.integers(lo, hi, (m, mode.g, 64)).astype(wire_np))
        for _ in range(n_rot)]
    # The quant-pool depth comes from the launch key, so the one-hot
    # quant-gather matmul dimension matches the exact production launch
    # (packed batches pad to max_images_per_batch; dedicated/banded
    # launches run q=1).
    qidx = jax.device_put((np.arange(m) % q).astype(np.int32))
    qpool_rot = [jax.device_put(
        rng.integers(1, 64, (q, mode.g, 64)).astype(np.float32))
        for _ in range(n_rot)]

    def us(step, consume):
        # The paired-difference signal must dominate tunnel round-trip
        # noise (~ms).  Probe once at n_hi; if the total signal is under
        # ~15 ms, re-measure ONCE at the smallest ladder step expected to
        # reach ~25 ms (a fixed ladder keeps the compiled loop-program
        # set small — each distinct n is its own XLA program).
        val = devloop_seconds_per_launch(step, consume, n_hi=n_hi, pairs=3)
        if val * n_hi < 0.015:
            want = 0.025 / max(val, 2.5e-5)   # <=1000 even if val clamps
            n2 = next((n for n in (264, 1024) if n >= min(want, 1024)),
                      1024)
            if n2 > n_hi:
                val = devloop_seconds_per_launch(step, consume, n_hi=n2,
                                                 pairs=3)
        return max(0.0, val * 1e6)

    out: Dict[str, float] = {}
    ycbcr = transport == "ycbcr"
    fused = us(
        rotating_args_step(
            lambda c, qp: decode_mcus_impl(
                c, qidx, qp, mode=mode, lane_tile=lane_tile,
                interpret=False, raw=not ycbcr, ycbcr=ycbcr, scale=scale),
            list(zip(coeff_rot, qpool_rot))),
        lambda o: (o[0, 0, 0] if ycbcr else o[0, 0, 0, 0]).astype(jnp.int32))
    out["fused_us"] = round(fused, 1)

    if scale == 1:
        from pim_jpeg_decoder_tpu.ops.stage_kernels import (
            color_stage_impl,
            dequantize_stage,
            dequantize_stage_impl,
            idct_stage,
            idct_stage_impl,
        )
        kw = dict(mode=mode, lane_tile=lane_tile, interpret=False)
        deq_rot = [dequantize_stage(c, qidx, qp, **kw)
                   for c, qp in zip(coeff_rot, qpool_rot)]
        out["dequantize_us"] = round(us(
            rotating_args_step(
                lambda c, qp: dequantize_stage_impl(c, qidx, qp, **kw),
                list(zip(coeff_rot, qpool_rot))),
            lambda o: o[0, 0, 0].astype(jnp.int32)), 1)
        out["idct_us"] = round(us(
            rotating_args_step(
                lambda d: idct_stage_impl(d, **kw),
                [(d,) for d in deq_rot]),
            lambda o: o[0, 0, 0].astype(jnp.int32)), 1)
        if not ycbcr:
            spat_rot = [idct_stage(d, **kw) for d in deq_rot]
            out["color_us"] = round(us(
                rotating_args_step(
                    lambda sp: color_stage_impl(sp, **kw),
                    [(sp,) for sp in spat_rot]),
                lambda o: o[0, 0, 0, 0].astype(jnp.int32)), 1)

    cache = _load_cache()
    cache[ck] = out
    _save_cache(cache)
    return out


def phase_report_lines(launch_stats: Dict[LaunchKey, int],
                       measure: bool = True) -> list:
    """Profile-block lines for the observed launches.

    ``launch_stats`` maps launch geometry -> launch count (collected by the
    engine).  Totals are phase-us x launch-count, the same accounting the
    reference applies to its accumulated DPU cycle counters
    (reference: src/decoder_host.cpp:309-312).  With ``measure=False`` only
    disk-cached measurements are used (no compiles); geometries without a
    cache entry are reported as unmeasured.
    """
    import jax
    if jax.default_backend() == "cpu":
        return []  # interpret-mode timing would be meaningless
    totals = {"dequantize_us": 0.0, "idct_us": 0.0, "color_us": 0.0,
              "fused_us": 0.0}
    covered = {k: 0 for k in totals}  # launches contributing to each line
    measured_launches = 0
    total_launches = sum(launch_stats.values())
    for key, count in launch_stats.items():
        phases = measure_phases(key, cached_only=not measure)
        if not phases:
            continue
        measured_launches += count
        for name, v in phases.items():
            totals[name] += v * count
            covered[name] += count

    lines = []
    if measured_launches == 0:
        lines.append(" - Device phase breakdown: unavailable "
                     "(no cached measurement; run with --device-profile)")
        return lines
    if totals["fused_us"] <= 0.0:
        # Clamped-to-zero paired differences: the launches are too small
        # for the device loop to resolve above tunnel noise — phase
        # attribution would be meaningless.
        lines.append(" - Device phase breakdown: below measurement noise "
                     f"for these launch sizes ({measured_launches} "
                     "launches; larger batches resolve)")
        return lines
    lines.append(f" - TPU kernel device time (measured, {measured_launches}"
                 f"/{total_launches} launches): "
                 f"{totals['fused_us'] / 1e6:.6f} (s)")
    label = {
        "dequantize_us": "Device dequantization time",
        "idct_us": "Device inverse DCT time",
        "color_us": "Device color conversion time",
    }
    for k, lab in label.items():
        if totals[k]:
            # Sub-phase lines cover only geometries with stage-kernel
            # equivalents (scale==1; color only for the RGB transport) —
            # annotate coverage so mixed-transport runs read honestly.
            cov = ("" if covered[k] == measured_launches
                   else f", {covered[k]}/{measured_launches} launches")
            lines.append(f"   - {lab} (unfused-equivalent{cov}): "
                         f"{totals[k] / 1e6:.6f} (s)")
    return lines
