"""Tunnel-immune device benchmarking (the only honest timing on this rig).

Host-side per-launch timing through the remote-TPU tunnel is unusable:
``block_until_ready`` acks before real execution completes, and repeated
identical ``(executable, args)`` calls — including repeats of an identical
outer jitted loop — can be served from a result cache (observed "1.3 TP/s",
8x over the HBM speed of light; see docs/kernel_design.md).

The honest recipe, shared by bench.py and tools/stage_profile.py:
``lax.fori_loop`` of N launches inside ONE jit, per-iteration-varying args,
a scalar data dependency on every output, a UNIQUE seed argument per timed
call, and paired-median ``(t_hi - t_lo) / (n_hi - n_lo)``.
"""

from __future__ import annotations

import functools
import statistics
import time
from typing import Callable

_seed_box = [0]


def devloop_seconds_per_launch(step: Callable, consume: Callable,
                               n_lo: int = 4, n_hi: int = 132,
                               pairs: int = 5) -> float:
    """Median steady-state seconds per launch of ``step``.

    Args:
      step: ``step(i)`` -> stage output for iteration ``i`` (an int32
        scalar that also encodes the per-call seed); MUST vary its inputs
        with ``i`` so no level of the stack can cache results.
      consume: reduces the output to an int32 scalar (the loop-carried
        data dependency).
      n_lo/n_hi: paired loop lengths; the difference cancels fixed
        dispatch/fetch overhead, pairing adjacent samples cancels slow
        tunnel drift, the median rejects hiccup outliers.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(seed, n):
        def body(i, acc):
            return acc + consume(step(i + seed))
        return jax.lax.fori_loop(0, n, body, seed)

    def timed(n: int) -> float:
        _seed_box[0] += 1
        t0 = time.monotonic()
        np.asarray(loop(jnp.int32(_seed_box[0]), n))
        return time.monotonic() - t0

    for n in (n_lo, n_hi):
        timed(n)  # compile + warm
    diffs = []
    for _ in range(pairs):
        a = timed(n_lo)
        b = timed(n_hi)
        diffs.append((b - a) / (n_hi - n_lo))
    return statistics.median(diffs)
