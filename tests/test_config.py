"""EngineConfig tests (the reference's Makefile knobs as runtime config)."""

import pytest

from pim_jpeg_decoder_tpu.utils.config import EngineConfig


class TestEngineConfig:
    def test_defaults_valid(self):
        cfg = EngineConfig()
        cfg.validate()
        assert cfg.budget_mcus % cfg.lane_tile == 0

    def test_env_overrides(self, monkeypatch):
        monkeypatch.setenv("PIM_JPEG_TPU_BUDGET_MCUS", "1024")
        monkeypatch.setenv("PIM_JPEG_TPU_LANE_TILE", "128")
        monkeypatch.setenv("PIM_JPEG_TPU_PREPARE_THREADS", "2")
        cfg = EngineConfig.from_env()
        assert (cfg.budget_mcus, cfg.lane_tile, cfg.prepare_threads) == (1024, 128, 2)

    def test_kwarg_overrides_beat_env(self, monkeypatch):
        monkeypatch.setenv("PIM_JPEG_TPU_LANE_TILE", "128")
        cfg = EngineConfig.from_env(lane_tile=64, budget_mcus=640)
        assert cfg.lane_tile == 64
        assert cfg.budget_mcus == 640

    @pytest.mark.parametrize("field,value", [
        ("lane_tile", 0), ("lane_tile", 100),
        ("budget_mcus", 1000), ("prepare_threads", 0),
        ("max_images_per_batch", 0),
    ])
    def test_invalid_rejected(self, field, value):
        cfg = EngineConfig()
        setattr(cfg, field, value)
        with pytest.raises(ValueError):
            cfg.validate()


def test_rejects_ycbcr_transport_with_scale():
    from pim_jpeg_decoder_tpu.utils.config import EngineConfig
    import pytest
    with pytest.raises(ValueError):
        EngineConfig(scale=2, transport="ycbcr").validate()
    EngineConfig(scale=2, transport="auto").validate()  # ok
    EngineConfig(scale=2, transport="rgb").validate()   # ok


def test_budget_clamped_to_launch_cap():
    """A packed batch dispatches as one launch, so max_launch_mcus bounds
    the packing budget: capping launches via PIM_JPEG_TPU_MAX_LAUNCH alone
    must cap batch sizes too (lane-tile-aligned clamp, not an error)."""
    from pim_jpeg_decoder_tpu.utils.config import EngineConfig
    cfg = EngineConfig(budget_mcus=16384, lane_tile=128,
                       max_launch_mcus=512)
    cfg.validate()
    assert cfg.budget_mcus == 512
    cfg2 = EngineConfig(budget_mcus=16384, lane_tile=512,
                        max_launch_mcus=640)  # clamp stays tile-aligned
    cfg2.validate()
    assert cfg2.budget_mcus == 512
