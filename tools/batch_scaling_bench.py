"""Multi-process (multi-host) harness for the ML batch API.

Sibling of tools/scaling_bench.py (which drives the BMP engine): each
process initializes `jax.distributed`, takes its strided shard of a
deterministic same-size corpus (whole-batch-per-host data parallelism —
the deployment pattern for `decode_same_size_batch`), decodes it on its
LOCAL devices, verifies every image against the NumPy oracle, and rank 0
aggregates per-host (megapixels, wall, ok) over the collective into ONE
JSON line:

  {"hosts": N, "value": aggregate_mps, "per_host_mps": [...],
   "equality_ok": true, "dcn_bytes": ...}

DCN traffic is the final metadata allgather only — pixels never cross
hosts (SURVEY.md section 2, comm backend).

Run (per rank):
  python tools/batch_scaling_bench.py --num-processes 2 --process-id R \
      --coordinator localhost:PORT --images 8
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Cap BLAS fan-out BEFORE numpy import (one host core per rank in the
# simulation; oversubscription stalls the Gloo handshake).
for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(var, "1")

import numpy as np  # noqa: E402


def make_corpus(n: int):
    """Deterministic same-size 4:2:0 corpus (identical on every rank)."""
    from PIL import Image

    rng = np.random.default_rng(424242)
    out = []
    for i in range(n):
        small = rng.integers(0, 256, (6, 8, 3), dtype=np.uint8)
        img = np.array(Image.fromarray(small).resize((64, 48),
                                                     Image.BILINEAR))
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="JPEG", quality=78 + i % 10,
                                  subsampling=2)
        out.append((f"img{i:03d}", buf.getvalue()))
    return out


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--num-processes", type=int, required=True)
    parser.add_argument("--process-id", type=int, required=True)
    parser.add_argument("--coordinator", default="localhost:9876")
    parser.add_argument("--images", type=int, default=8)
    args = parser.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )

    from pim_jpeg_decoder_tpu.models.input_pipeline import (
        decode_same_size_batch,
    )
    from pim_jpeg_decoder_tpu.oracle.decoder import decode_bytes_oracle
    from pim_jpeg_decoder_tpu.parallel.multihost import partition_paths

    corpus = make_corpus(args.images)
    names = [n for n, _ in corpus]
    mine = set(partition_paths(names))
    shard = [b for n, b in corpus if n in mine]
    assert shard, "empty shard"

    lane_tile = 64
    # Warm up (compile) outside the timer.
    out, headers = decode_same_size_batch(shard, lane_tile=lane_tile)
    rgb = np.asarray(out)

    # Equality: every image must match the oracle decode exactly.
    ok = True
    for i, (data, h) in enumerate(zip(shard, headers)):
        want = decode_bytes_oracle(data).rgb
        if not np.array_equal(rgb[i, : h.height, : h.width], want):
            ok = False

    t0 = time.monotonic()
    out, headers = decode_same_size_batch(shard, lane_tile=lane_tile)
    np.asarray(out)
    wall = time.monotonic() - t0
    mp = sum(h.width * h.height for h in headers) / 1e6

    from jax.experimental import multihost_utils

    payload = np.array([mp, wall, 1.0 if ok else 0.0], np.float64)
    stats = np.asarray(multihost_utils.process_allgather(payload))
    if args.process_id == 0:
        per_host = [float(m / w) for m, w, _ in stats]
        print(json.dumps({
            "hosts": args.num_processes,
            "value": round(sum(per_host), 3),
            "unit": "MP/s (aggregate, CPU-backend simulation)",
            "per_host_mps": [round(v, 3) for v in per_host],
            "equality_ok": bool(stats[:, 2].all()),
            "mp_balance": round(float(stats[:, 0].min()
                                      / stats[:, 0].max()), 4),
            "dcn_bytes": int(stats.size * 8),
        }))
    if not ok:
        sys.exit(3)


if __name__ == "__main__":
    main()
