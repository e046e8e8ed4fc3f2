"""Two-process (simulated two-host) regression test over jax.distributed.

Guards the whole-image-per-host design: each process must drive only its
LOCAL devices (a mesh accidentally built over jax.devices() spans processes
and every decode fails — regression seen in round 1).  Runs the real
tools/scaling_bench.py harness over Gloo on the CPU backend.
"""

import json
import os
import socket
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "tools", "scaling_bench.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_scaling_harness(n_procs: int, images: int) -> dict:
    port = _free_port()
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)  # plain 1-device-per-process CPU backend
    # Ranks write to FILES, not pipes: draining rank 0's pipe first would
    # deadlock if another rank filled its 64 KiB pipe buffer (JAX warnings
    # + a traceback can) while rank 0 waited on it in a collective.
    import tempfile
    logs = []
    procs = []
    for pid in range(n_procs):
        fo = tempfile.TemporaryFile(mode="w+", encoding="utf-8")
        fe = tempfile.TemporaryFile(mode="w+", encoding="utf-8")
        logs.append((fo, fe))
        procs.append(subprocess.Popen(
            [sys.executable, BENCH, "--num-processes", str(n_procs),
             "--process-id", str(pid), "--coordinator",
             f"localhost:{port}", "--images", str(images),
             "--baseline-mps", "1.0"],
            stdout=fo, stderr=fe, env=env, cwd=REPO, text=True))
    try:
        deadline = time.monotonic() + 280
        for p in procs:
            p.wait(timeout=max(5, deadline - time.monotonic()))
    finally:
        for p in procs:  # a hung rank must not leak (holds the Gloo port)
            if p.poll() is None:
                p.kill()
    outs = []
    for fo, fe in logs:
        fo.seek(0)
        fe.seek(0)
        outs.append((fo.read(), fe.read()))
        fo.close()
        fe.close()
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"rank failed:\n{out}\n{err[-2000:]}"
    # Process 0 prints the aggregated JSON line.
    json_lines = [ln for ln in outs[0][0].splitlines() if ln.startswith("{")]
    assert json_lines, (
        f"rank 0 printed no JSON report:\n{outs[0][0]}\n{outs[0][1][-2000:]}")
    return json.loads(json_lines[-1])


def _run_batch_harness(n_procs: int, images: int) -> dict:
    """Drive tools/batch_scaling_bench.py (the ML batch API) over Gloo."""
    import tempfile
    port = _free_port()
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    script = os.path.join(REPO, "tools", "batch_scaling_bench.py")
    logs, procs = [], []
    for pid in range(n_procs):
        fo = tempfile.TemporaryFile(mode="w+", encoding="utf-8")
        fe = tempfile.TemporaryFile(mode="w+", encoding="utf-8")
        logs.append((fo, fe))
        procs.append(subprocess.Popen(
            [sys.executable, script, "--num-processes", str(n_procs),
             "--process-id", str(pid), "--coordinator",
             f"localhost:{port}", "--images", str(images)],
            stdout=fo, stderr=fe, env=env, cwd=REPO, text=True))
    try:
        deadline = time.monotonic() + 280
        for p in procs:
            p.wait(timeout=max(5, deadline - time.monotonic()))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    outs = []
    for fo, fe in logs:
        fo.seek(0)
        fe.seek(0)
        outs.append((fo.read(), fe.read()))
        fo.close()
        fe.close()
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"rank failed:\n{out}\n{err[-2000:]}"
    json_lines = [ln for ln in outs[0][0].splitlines() if ln.startswith("{")]
    assert json_lines, (
        f"rank 0 printed no JSON report:\n{outs[0][0]}\n{outs[0][1][-2000:]}")
    return json.loads(json_lines[-1])


def test_two_process_batch_api():
    """The deployment-recommended ML batch path (decode_same_size_batch)
    under the N=2 Gloo regression: per-rank oracle equality + an
    aggregate-throughput report with metadata-only DCN traffic
    (VERDICT r4 item 6)."""
    report = _run_batch_harness(2, images=8)
    assert report["hosts"] == 2
    assert report["equality_ok"] is True
    assert report["value"] > 0
    assert len(report["per_host_mps"]) == 2
    assert report["mp_balance"] >= 0.99  # equal-size corpus, strided split
    assert 0 < report["dcn_bytes"] <= 64 * report["hosts"]


def test_four_process_batch_api():
    """N=4 ranks: per-host megapixels balance exactly on the equal-size
    corpus, every rank's decode matches the oracle, DCN stays metadata."""
    report = _run_batch_harness(4, images=8)
    assert report["hosts"] == 4
    assert report["equality_ok"] is True
    assert report["mp_balance"] >= 0.99
    assert 0 < report["dcn_bytes"] <= 64 * report["hosts"]


def test_two_process_scaling_harness():
    report = _run_scaling_harness(2, images=8)
    assert report["hosts"] == 2
    assert report["value"] > 0
    assert "scaling_efficiency" in report
    # Whole-image sharding: the only DCN traffic is the final per-host
    # (megapixels, wall) metadata allgather — a few bytes per host.
    assert 0 < report["dcn_bytes"] <= 64 * report["hosts"]


def test_four_process_scaling_harness():
    report = _run_scaling_harness(4, images=8)
    assert report["hosts"] == 4
    assert report["value"] > 0
    # Equal-size corpus + sorted strided partition_paths => per-host
    # megapixels must balance exactly (min/max == 1).
    assert report["mp_balance"] >= 0.99
    assert 0 < report["dcn_bytes"] <= 64 * report["hosts"]
