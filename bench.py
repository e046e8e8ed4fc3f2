"""Benchmark harness: Megapixels/sec/chip JPEG decode (BASELINE.md north star).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "MP/s", "vs_baseline": N, ...extras}

Primary value: device decode throughput per chip — the fused Pallas pipeline
(dequantize + integer IDCT + chroma upsample + BT.601) with device-resident
buffers, i.e. the chip's decode capability when embedded in a TPU input
pipeline.  Extras report the host-side e2e throughput (marker scan + C++
entropy decode + transfers + raster assembly; on this rig transfers ride a
remote-TPU tunnel at ~100 MB/s, far below real PCIe), the PIL/libjpeg
single-thread baseline on the same corpus, and the bit-exactness check vs
the NumPy oracle.

The reference publishes no numbers (BASELINE.md); vs_baseline is measured
against PIL/libjpeg single-thread CPU decode of the same corpus.
"""

from __future__ import annotations

import io
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

ILSVRC = "/root/reference/ILSVRC2012_val_00000001.JPEG"
NUM_IMAGES = 48
KERNEL_BATCH_MCUS = 16384
KERNEL_REPS = 132


def make_corpus() -> list:
    """ImageNet-like corpus: 500x375 4:2:0 q75 baseline JPEGs."""
    from PIL import Image

    blobs = []
    if os.path.exists(ILSVRC):
        with open(ILSVRC, "rb") as f:
            blobs.append(("ilsvrc", f.read()))
    rng = np.random.default_rng(42)
    base = None
    if blobs:
        base = np.array(Image.open(io.BytesIO(blobs[0][1])).convert("RGB"))
    while len(blobs) < NUM_IMAGES:
        i = len(blobs)
        if base is not None:
            # Perturbed crops/rolls of the real photo: realistic spectra.
            img = np.roll(base, (i * 17, i * 31), (0, 1))
            noise = rng.integers(-8, 9, img.shape, np.int16)
            img = np.clip(img.astype(np.int16) + noise, 0, 255).astype(np.uint8)
        else:
            small = rng.integers(0, 256, (24, 32, 3), np.uint8)
            img = np.array(Image.fromarray(small).resize((500, 375),
                                                         Image.BILINEAR))
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="JPEG", quality=75,
                                  subsampling=2)
        blobs.append((f"img{i}", buf.getvalue()))
    return blobs


def bench_pil(blobs) -> float:
    from PIL import Image

    t0 = time.monotonic()
    mp = 0.0
    for _, data in blobs:
        img = Image.open(io.BytesIO(data))
        img = np.asarray(img.convert("RGB"))
        mp += img.shape[0] * img.shape[1] / 1e6
    return mp / (time.monotonic() - t0)


def bench_host_entropy(blobs) -> float:
    from pim_jpeg_decoder_tpu.codec.scanner import scan_jpeg
    from pim_jpeg_decoder_tpu.native import decode_scan_native

    headers = [scan_jpeg(d) for _, d in blobs]
    t0 = time.monotonic()
    mp = 0.0
    for h in headers:
        decode_scan_native(h)
        mp += h.width * h.height / 1e6
    return mp / (time.monotonic() - t0)


def bench_progressive(blobs) -> float:
    """Host progressive (SOF2) decode throughput — capability beyond the
    reference, so it gets its own number."""
    import io

    from PIL import Image

    from pim_jpeg_decoder_tpu.codec.progressive import decode_progressive
    from pim_jpeg_decoder_tpu.codec.scanner import scan_jpeg

    headers = []
    for _, d in blobs[:12]:
        img = Image.open(io.BytesIO(d)).convert("RGB")
        buf = io.BytesIO()
        img.save(buf, format="JPEG", progressive=True, quality=75,
                 subsampling=2)
        headers.append(scan_jpeg(buf.getvalue()))
    t0 = time.monotonic()
    mp = 0.0
    for h in headers:
        decode_progressive(h)
        mp += h.width * h.height / 1e6
    return mp / (time.monotonic() - t0)


def bench_device_kernel() -> float:
    """Device-resident fused-pipeline throughput (the per-chip metric).

    Timed with an on-device ``lax.fori_loop`` chaining N kernel launches —
    each iteration uses a distinct quant pool and the loop carries a scalar
    data dependency on each output, so nothing can be elided, cached, or
    overlapped away.  Host-side per-launch timing is NOT trustworthy on this
    rig: the remote-TPU tunnel acknowledges ``block_until_ready`` before
    real execution completes and can serve repeated identical launches from
    a result cache (observed: "1.3 TP/s", 8x over the HBM speed of light).
    The reported time is (t_N2 - t_N1) / (N2 - N1): pure steady-state device
    execution of the production kernel, no dispatch or transfer.
    """
    import functools

    import jax
    import jax.numpy as jnp

    from pim_jpeg_decoder_tpu.ops import specs as S
    from pim_jpeg_decoder_tpu.ops.decode_kernel import (LANE_TILE,
                                                        decode_mcus_impl)

    mode = S.mode_for((2, 2, 3))
    m = KERNEL_BATCH_MCUS
    rng = np.random.default_rng(0)

    @functools.partial(jax.jit, static_argnames=("n", "ycbcr"))
    def loop(coeffs, qidx, qpools, seed, n, ycbcr=False):
        def body(i, acc):
            out = decode_mcus_impl(
                coeffs, qidx, qpools[(i + seed) % qpools.shape[0]],
                mode=mode, lane_tile=LANE_TILE, interpret=False,
                raw=not ycbcr, ycbcr=ycbcr)
            first = (out[0, 0, 0] if ycbcr else out[0, 0, 0, 0])
            return acc + first.astype(jnp.int32)
        return jax.lax.fori_loop(0, n, body, seed)

    coeffs = jax.device_put(
        rng.integers(-200, 200, (m, mode.g, 64)).astype(np.int16))
    qidx = jax.device_put((np.arange(m) % 16).astype(np.int32))
    qpools = jax.device_put(
        rng.integers(1, 64, (64, 16, mode.g, 64)).astype(np.float32))

    # Every timed call gets a UNIQUE seed argument: the tunnel runtime can
    # serve a repeated (executable, args) pair from a result cache, which
    # would make repeats of an identical loop call nearly free.
    seed_box = [0]

    def timed(n: int, ycbcr: bool) -> float:
        seed_box[0] += 1
        t0 = time.monotonic()
        np.asarray(loop(coeffs, qidx, qpools, jnp.int32(seed_box[0]), n,
                        ycbcr))
        return time.monotonic() - t0

    import statistics
    n_lo, n_hi = 4, KERNEL_REPS
    mp_per_launch = m * mode.mcu_px_h * mode.mcu_px_w / 1e6
    out = []
    for ycbcr in (False, True):
        for n in (n_lo, n_hi):
            timed(n, ycbcr)  # compile + warm
        # Paired adjacent samples cancel slow tunnel drift; median rejects
        # hiccup outliers.
        diffs = []
        for _ in range(5):
            a = timed(n_lo, ycbcr)
            b = timed(n_hi, ycbcr)
            diffs.append((b - a) / (n_hi - n_lo))
        out.append(mp_per_launch / statistics.median(diffs))
    return tuple(out)  # (full RGB decode, ycbcr-transport kernel)


def bench_e2e(blobs) -> tuple:
    from pim_jpeg_decoder_tpu.runtime.engine import DecodeEngine

    engine = DecodeEngine(budget_mcus=16384, prepare_threads=8)
    # Warmup: compile every mode present.
    engine.decode_named_blobs(blobs[:2])
    t0 = time.monotonic()
    report = engine.decode_named_blobs(blobs)
    dt = time.monotonic() - t0
    assert report.ok_count == len(blobs), [
        r.error for r in report.results if not r.ok]
    return report.total_megapixels / dt, report


def check_bit_exact(blobs) -> bool:
    from pim_jpeg_decoder_tpu.oracle.decoder import decode_bytes_oracle
    from pim_jpeg_decoder_tpu.runtime.engine import DecodeEngine

    # Same budget as bench_e2e so compiled programs are reused.
    engine = DecodeEngine(budget_mcus=16384, keep_rgb=True)
    sample = blobs[:3]
    report = engine.decode_named_blobs(sample)
    for (_, data), res in zip(sample, report.results):
        if not res.ok or not np.array_equal(res.rgb,
                                            decode_bytes_oracle(data).rgb):
            return False
    return True


def main() -> None:
    blobs = make_corpus()

    kernel_mps, ycbcr_kernel_mps = bench_device_kernel()
    e2e_mps, _ = bench_e2e(blobs)
    entropy_mps = bench_host_entropy(blobs)
    progressive_mps = bench_progressive(blobs)
    pil_mps = bench_pil(blobs)
    bit_exact = check_bit_exact(blobs)

    result = {
        "metric": "JPEG decode throughput per chip (fused dequant+IDCT+color, device-resident)",
        "value": round(kernel_mps, 1),
        "unit": "MP/s",
        "vs_baseline": round(kernel_mps / pil_mps, 2),
        "ycbcr_kernel_mps": round(ycbcr_kernel_mps, 1),
        "e2e_mps": round(e2e_mps, 1),
        "e2e_vs_pil": round(e2e_mps / pil_mps, 2),
        "host_entropy_mps": round(entropy_mps, 1),
        "host_progressive_mps": round(progressive_mps, 1),
        "pil_single_thread_mps": round(pil_mps, 1),
        "bit_exact_vs_oracle": bit_exact,
        "corpus_images": len(blobs),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
