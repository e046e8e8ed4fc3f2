"""Unfused stage kernels must compose to exactly the fused kernel's output."""

import numpy as np
import pytest

from pim_jpeg_decoder_tpu.ops import specs as S
from pim_jpeg_decoder_tpu.ops.decode_kernel import decode_mcus
from pim_jpeg_decoder_tpu.ops.stage_kernels import (
    color_stage,
    decode_mcus_staged,
    dequantize_stage,
    idct_stage,
)

LANE_TILE = 128


@pytest.mark.parametrize("mode_key", [(2, 2, 3), (2, 1, 3),
                                      (1, 2, 3), (1, 1, 3),
                                      (1, 1, 1)])
def test_staged_equals_fused(rng, mode_key):
    mode = S.mode_for(mode_key)
    m = 2 * LANE_TILE
    coeffs = rng.integers(-300, 300, (m, mode.g, 64)).astype(np.int16)
    qidx = (np.arange(m) % 2).astype(np.int32)
    qpool = rng.integers(1, 100, (2, mode.g, 64)).astype(np.float32)
    staged = np.asarray(decode_mcus_staged(coeffs, qidx, qpool, mode,
                                           lane_tile=LANE_TILE))
    fused = np.asarray(decode_mcus(coeffs, qidx, qpool, mode,
                                   lane_tile=LANE_TILE))
    np.testing.assert_array_equal(staged, fused)


def test_stage_contracts(rng):
    mode = S.mode_for((2, 2, 3))
    m = LANE_TILE
    coeffs = rng.integers(-300, 300, (m, mode.g, 64)).astype(np.int16)
    qidx = np.zeros(m, np.int32)
    qpool = np.full((1, mode.g, 64), 3, np.float32)

    deq = np.asarray(dequantize_stage(coeffs, qidx, qpool, mode=mode,
                                      lane_tile=LANE_TILE))
    np.testing.assert_array_equal(
        deq, np.clip(coeffs.astype(np.int32) * 3, -32768, 32767))

    spat = np.asarray(idct_stage(deq, mode=mode, lane_tile=LANE_TILE))
    assert spat.min() >= S.SAMPLE_MIN and spat.max() <= S.SAMPLE_MAX

    rgb = np.asarray(color_stage(spat, mode=mode, lane_tile=LANE_TILE))
    assert rgb.shape == (m, 4, 64, 3)
    assert rgb.dtype == np.uint8


class TestDevbenchHarness:
    """The measurement harness itself (utils/devbench.py): the bench's
    replication bands ride on `samples=True`."""

    def test_devloop_median_and_samples(self):
        import statistics

        import jax.numpy as jnp

        from pim_jpeg_decoder_tpu.utils.devbench import (
            devloop_seconds_per_launch,
            rotating_args_step,
        )

        def fn(x):
            return (x * 2 + 1).sum()[None]

        args = [(jnp.arange(64) + i,) for i in range(4)]
        step = rotating_args_step(fn, args)

        def consume(o):
            return o[0].astype(jnp.int32)

        samples = devloop_seconds_per_launch(step, consume, n_lo=2, n_hi=8,
                                             pairs=3, samples=True)
        assert len(samples) == 3
        med = devloop_seconds_per_launch(step, consume, n_lo=2, n_hi=8,
                                         pairs=3)
        assert isinstance(med, float)
        # The scalar form IS the median of the per-pair samples (same
        # estimator the bench's band brackets).
        assert med <= max(samples) and med >= min(samples) or (
            med == statistics.median(samples))
