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

VMEM-PROMOTION HAZARD (measured on v5e, round 2): a loop-INVARIANT input
array that fits VMEM (~<=16-100 MB depending on generation) can be kept
on-chip across iterations by XLA, so its HBM read disappears from the
steady-state per-launch time — a 16K-MCU 4:2:0 memcpy-shaped kernel
"measured" 1863 GB/s (above HBM physics) with one fixed 12.6 MB input, vs
1123 GB/s with a 100 MB working set.  Any benchmark whose production
behavior streams fresh inputs per launch MUST rotate among enough distinct
input buffers that their total exceeds VMEM — use
:func:`rotating_args_step`.
"""

from __future__ import annotations

import functools
import statistics
import time
from typing import Callable, Sequence

_seed_box = [0]


def rotating_args_step(fn: Callable, args_list: Sequence[tuple]) -> Callable:
    """step(i) that cycles ``fn(*args_list[i % n])`` via ``lax.switch``.

    Static branch-per-buffer (no dynamic-slice copy), so the only HBM
    traffic is the kernel's own.  Size ``args_list`` so the distinct
    buffers sum past VMEM (see module docstring) — 8 rotations of a
    >=12.5 MB input is safe on current generations.
    """
    import jax

    branches = [functools.partial(fn, *args) for args in args_list]

    def step(i):
        return jax.lax.switch(i % len(branches), branches)

    return step


def devloop_seconds_per_launch(step: Callable, consume: Callable,
                               n_lo: int = 4, n_hi: int = 132,
                               pairs: int = 5, samples: bool = False):
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

    The ``i`` passed to ``step`` carries a GUARD: a scalar that is always
    0 but provably depends on every previous iteration's output (a
    sentinel compare against the accumulator).  Without it, iterations
    whose inputs recur (e.g. a rotation index ``i % n``) are identical
    pure computations that the compiler may merge under unrolling or
    overlap in execution — observed as a YCbCr kernel "measuring" 2.9 TB/s
    of HBM traffic on v5e.  Any input selection inside ``step`` (gather,
    ``lax.switch`` branch index) inherits the dependency automatically
    because it uses ``i``.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(seed, n):
        def body(i, acc):
            # Always 0, but only the real computation can prove it: forces
            # iteration i+1's inputs to depend on iteration i's output.
            guard = jax.lax.select(acc == jnp.int32(-(2**31) + 12345),
                                   jnp.int32(1), jnp.int32(0))
            return acc + consume(step(i + seed + guard))
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
    if samples:
        # Per-pair seconds-per-launch samples (already drift-cancelled by
        # the pairing): callers report a min/median/max replication band
        # so round-over-round comparisons carry the within-process spread.
        return diffs
    return statistics.median(diffs)
