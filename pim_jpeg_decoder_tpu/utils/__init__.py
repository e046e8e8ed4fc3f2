"""Config, profiling, and JAX runtime helpers."""

from pim_jpeg_decoder_tpu.utils.config import EngineConfig
from pim_jpeg_decoder_tpu.utils.profiling import StageTimers

__all__ = ["EngineConfig", "StageTimers"]
