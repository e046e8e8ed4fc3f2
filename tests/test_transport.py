"""YCbCr wire-transport tests: bit-identical RGB via half the D2H bytes.

The ycbcr kernel emits level-shifted subsampled planes; host-side
upsample + BT.601 (C++ fast path and NumPy fallback) must reproduce the
fused RGB kernel's output exactly for every sampling mode.
"""

import numpy as np
import pytest

from pim_jpeg_decoder_tpu.codec.encoder import encode_jpeg
from pim_jpeg_decoder_tpu.codec.entropy import decode_scan
from pim_jpeg_decoder_tpu.codec.scanner import scan_jpeg
from pim_jpeg_decoder_tpu.models.pipeline import (
    assemble_raster_raw,
    assemble_raster_ycbcr,
    build_qpool,
)
from pim_jpeg_decoder_tpu.ops import specs as S
from pim_jpeg_decoder_tpu.ops.decode_kernel import decode_mcus
from pim_jpeg_decoder_tpu.utils.config import EngineConfig

from tests.helpers import stage_single

LANE_TILE = 128

SAMPLINGS = [("4:4:4", False), ("4:2:2", False), ("4:4:0", False),
             ("4:2:0", False), ("gray", True)]


def decode_both_ways(img, sampling, grayscale):
    data = encode_jpeg(img, quality=85,
                       sampling="4:4:4" if grayscale else sampling,
                       grayscale=grayscale)
    header = scan_jpeg(data)
    coeffs = decode_scan(header)
    padded, qidx, qpool, mode = stage_single(header, coeffs, LANE_TILE)

    raw_rgb = np.asarray(decode_mcus(padded, qidx, qpool, mode,
                                     lane_tile=LANE_TILE, raw=True))
    want = assemble_raster_raw(header, raw_rgb)

    planes = np.asarray(decode_mcus(padded, qidx, qpool, mode,
                                    lane_tile=LANE_TILE, ycbcr=True))
    assert planes.shape == (mode.g, 64, padded.shape[0])
    got = assemble_raster_ycbcr(header, planes)
    return got, want


class TestYcbcrTransport:
    @pytest.mark.parametrize("sampling,grayscale", SAMPLINGS)
    def test_bit_identical_to_rgb_path(self, photo_image, sampling,
                                       grayscale):
        got, want = decode_both_ways(photo_image, sampling, grayscale)
        np.testing.assert_array_equal(got, want)

    @pytest.mark.parametrize("sampling,grayscale", SAMPLINGS)
    def test_numpy_fallback_matches(self, photo_image, monkeypatch,
                                    sampling, grayscale):
        monkeypatch.setenv("PIM_JPEG_TPU_NO_NATIVE", "1")
        got, want = decode_both_ways(photo_image, sampling, grayscale)
        np.testing.assert_array_equal(got, want)

    def test_odd_dimensions(self, rng):
        """Partial right/bottom MCUs crop correctly through the converter."""
        img = rng.integers(0, 256, (37, 43, 3), np.uint8)
        got, want = decode_both_ways(img, "4:2:0", False)
        assert got.shape == (37, 43, 3)
        np.testing.assert_array_equal(got, want)


class TestEngineTransport:
    @pytest.mark.parametrize("transport", ["rgb", "ycbcr", "auto"])
    def test_engine_outputs_identical(self, photo_image, transport):
        from pim_jpeg_decoder_tpu.runtime.engine import DecodeEngine

        blobs = [
            ("a", encode_jpeg(photo_image, quality=85, sampling="4:2:0")),
            ("b", encode_jpeg(photo_image, quality=60, sampling="4:4:4")),
            ("g", encode_jpeg(photo_image, quality=85, grayscale=True)),
        ]
        cfg = EngineConfig(budget_mcus=1024, lane_tile=128,
                           prepare_threads=2, transport=transport)
        engine = DecodeEngine(keep_rgb=True, config=cfg)
        report = engine.decode_named_blobs(blobs)
        assert report.ok_count == 3, [r.error for r in report.results]

        from pim_jpeg_decoder_tpu.oracle.decoder import decode_bytes_oracle
        for (name, data), res in zip(blobs, report.results):
            np.testing.assert_array_equal(
                res.rgb, decode_bytes_oracle(data).rgb,
                err_msg=f"{transport}:{name}")

    def test_config_rejects_bad_transport(self):
        with pytest.raises(ValueError):
            EngineConfig(transport="bogus").validate()


class TestInt8CoefficientWire:
    """H2D wire compaction (batching.compact_wire): int8 when the batch
    fits, unconditional int16 fallback, bit-exact either way."""

    def test_compact_wire_fits(self):
        from pim_jpeg_decoder_tpu.runtime.batching import compact_wire
        c = np.array([[[-128, 127, 0, 5]]], np.int16)
        out = compact_wire(c)
        assert out.dtype == np.int8
        np.testing.assert_array_equal(out.astype(np.int16), c)

    @pytest.mark.parametrize("bad", [128, -129, 3000, -3000])
    def test_compact_wire_fallback(self, bad):
        from pim_jpeg_decoder_tpu.runtime.batching import compact_wire
        c = np.array([[[0, bad]]], np.int16)
        assert compact_wire(c) is c

    def test_kernel_accepts_int8_coeffs(self, photo_image):
        """decode_mcus on an int8 wire == decode_mcus on the int16 wire."""
        data = encode_jpeg(photo_image, quality=75, sampling="4:2:0")
        header = scan_jpeg(data)
        coeffs = decode_scan(header)
        assert abs(int(coeffs.min())) <= 128 and int(coeffs.max()) <= 127, \
            "fixture must fit the int8 wire"
        padded, qidx, qpool, mode = stage_single(header, coeffs,
                                                 LANE_TILE)
        want = np.asarray(decode_mcus(padded, qidx, qpool, mode,
                                      lane_tile=LANE_TILE, raw=True))
        got = np.asarray(decode_mcus(padded.astype(np.int8), qidx, qpool,
                                     mode, lane_tile=LANE_TILE, raw=True))
        np.testing.assert_array_equal(got, want)

    @pytest.mark.parametrize("wire", ["auto", "i16"])
    def test_engine_wire_modes_match_oracle(self, photo_image, rng, wire):
        """Both wire modes decode bit-exactly, including a q100 noise image
        whose coefficients exceed int8 (exercises the per-batch fallback)."""
        from pim_jpeg_decoder_tpu.oracle.decoder import decode_bytes_oracle
        from pim_jpeg_decoder_tpu.runtime.engine import DecodeEngine

        noise = rng.integers(0, 256, (64, 80, 3), np.uint8)
        blobs = [
            ("small", encode_jpeg(photo_image, quality=75, sampling="4:2:0")),
            ("big", encode_jpeg(noise, quality=100, sampling="4:2:0")),
        ]
        # The q100 noise image must actually overflow int8 or the fallback
        # isn't exercised.
        h = scan_jpeg(blobs[1][1])
        assert int(np.abs(decode_scan(h)).max()) > 127
        # One image per batch: co-batching would let the q100 image force
        # the WHOLE batch to int16 and the int8 staging path would never
        # run under wire='auto'.
        cfg = EngineConfig(budget_mcus=1024, lane_tile=128,
                           prepare_threads=1, wire=wire,
                           max_images_per_batch=1)
        engine = DecodeEngine(keep_rgb=True, config=cfg)
        report = engine.decode_named_blobs(blobs)
        assert report.ok_count == 2, [r.error for r in report.results]
        # launch_stats records the wire dtype per launch: under 'auto' the
        # int8-fitting batch must actually ship i8 and the q100 batch i16;
        # under 'i16' everything ships i16.
        wires = {k[5] for k in report.launch_stats}
        assert wires == ({"i8", "i16"} if wire == "auto" else {"i16"})
        for (name, data), res in zip(blobs, report.results):
            np.testing.assert_array_equal(
                res.rgb, decode_bytes_oracle(data).rgb,
                err_msg=f"{wire}:{name}")

    def test_input_pipeline_wire_modes_identical(self, photo_image):
        from pim_jpeg_decoder_tpu.models.input_pipeline import (
            decode_same_size_batch,
        )
        blobs = [encode_jpeg(np.roll(photo_image, i, 0), quality=75,
                             sampling="4:2:0") for i in range(3)]
        a, _ = decode_same_size_batch(blobs, lane_tile=128, wire="auto")
        b, _ = decode_same_size_batch(blobs, lane_tile=128, wire="i16")
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_config_rejects_bad_wire(self):
        with pytest.raises(ValueError):
            EngineConfig(wire="int8").validate()


class TestNativeAssemblyParity:
    """The C++ raster fast path (pjt_raster_rgb) must be byte-identical
    to the NumPy transpose chain for every sampling geometry and scale
    (it encodes the column-major slot-pixel-order contract a second
    time, so parity is load-bearing)."""

    def test_matches_numpy_across_modes_and_scales(self, rng, monkeypatch):
        from pim_jpeg_decoder_tpu.codec.header import Component, JpegHeader
        from pim_jpeg_decoder_tpu.models import pipeline as P
        from pim_jpeg_decoder_tpu.native import binding as B
        from pim_jpeg_decoder_tpu.ops import specs as S

        if B.load() is None:
            pytest.skip("native library unavailable")
        for (v, h, nc), hh, ww in [((1, 1, 3), 61, 67), ((2, 2, 3), 61, 67),
                                   ((2, 1, 3), 40, 33), ((1, 2, 3), 24, 50),
                                   ((1, 1, 1), 31, 17)]:
            comps = [Component(i, (h if i == 0 else 1),
                               (v if i == 0 else 1), 0) for i in range(nc)]
            hdr = JpegHeader(width=ww, height=hh, components=comps,
                             dc_tables={}, ac_tables={})
            mode = S.mode_for(hdr.mode_key)
            for scale in (1, 2, 4, 8):
                n = 8 // scale
                m = hdr.mcu_rows * hdr.mcu_cols + 17  # padded lanes
                raw = rng.integers(0, 256, (3, mode.v * mode.h, n * n, m),
                                   np.uint8)
                a = P.assemble_raster_raw_scaled(hdr, raw, scale)
                with pytest.MonkeyPatch.context() as mp:
                    mp.setattr(B, "load", lambda: None)  # NumPy path
                    b = P.assemble_raster_raw_scaled(hdr, raw, scale)
                np.testing.assert_array_equal(
                    a, b, err_msg=f"mode {(v, h, nc)} scale {scale}")
