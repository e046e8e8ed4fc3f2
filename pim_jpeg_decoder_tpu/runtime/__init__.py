"""Host runtime: batching, producer/consumer pipeline, decode engine."""

from pim_jpeg_decoder_tpu.runtime.engine import DecodeEngine

__all__ = ["DecodeEngine"]
