"""Marker scanner tests: parsing, validation surface, entropy scan.

Covers the reference's parser validation behaviors
(reference: src/jpeg_scanner.cpp:6-343) as unit tests — the reference itself
has none (SURVEY.md section 4).
"""

import struct

import numpy as np
import pytest

from pim_jpeg_decoder_tpu.codec import markers as M
from pim_jpeg_decoder_tpu.codec.encoder import encode_jpeg
from pim_jpeg_decoder_tpu.codec.header import JpegError, UnsupportedJpegError
from pim_jpeg_decoder_tpu.codec.scanner import scan_jpeg, _scan_entropy


def make_jpeg(img, **kw):
    return encode_jpeg(img, **kw)


class TestScanner:
    def test_parses_baseline_444(self, photo_image):
        h = scan_jpeg(make_jpeg(photo_image, sampling="4:4:4"))
        assert (h.width, h.height) == (160, 120)
        assert h.mode_key == (1, 1, 3)
        assert h.blocks_per_mcu == 3
        assert not h.progressive
        assert len(h.quant_tables) == 2
        assert len(h.dc_tables) == 2 and len(h.ac_tables) == 2

    @pytest.mark.parametrize("sampling,key,g", [
        ("4:4:4", (1, 1, 3), 3),
        ("4:2:2", (2, 1, 3), 4),
        ("4:4:0", (1, 2, 3), 4),
        ("4:2:0", (2, 2, 3), 6),
    ])
    def test_sampling_modes(self, photo_image, sampling, key, g):
        h = scan_jpeg(make_jpeg(photo_image, sampling=sampling))
        assert h.mode_key == key
        assert h.blocks_per_mcu == g

    def test_grayscale(self, photo_image):
        h = scan_jpeg(make_jpeg(photo_image, grayscale=True))
        assert h.ncomp == 1
        assert h.mode_key == (1, 1, 1)

    def test_restart_interval_and_segments(self, photo_image):
        h = scan_jpeg(make_jpeg(photo_image, sampling="4:2:0", restart_interval=4))
        assert h.restart_interval == 4
        # 160x120 at 4:2:0 -> 10x8 MCUs = 80 MCUs -> 20 segments of 4.
        assert h.num_mcus == 80
        assert len(h.segment_offsets) == 20
        assert h.segment_offsets[0] == 0
        assert list(h.segment_offsets) == sorted(h.segment_offsets)

    def test_zero_based_component_ids(self, photo_image):
        h = scan_jpeg(make_jpeg(photo_image, zero_based_ids=True))
        assert h.zero_based_ids
        assert [c.component_id for c in h.components] == [1, 2, 3]

    def test_app_and_comment_segments_skipped(self, photo_image):
        data = make_jpeg(photo_image, app_segments=[b"JFIF\x00test"],
                         comment=b"hello world")
        h = scan_jpeg(data)
        assert h.width == 160

    def test_quant_tables_dezigzagged(self, photo_image):
        h = scan_jpeg(make_jpeg(photo_image, quality=50, sampling="4:4:4"))
        # Annex K luma table at quality 50, natural order: [0,0]=16, [7,7]=99.
        qt = h.quant_tables[0].values
        assert qt[0] == 16
        assert qt[63] == 99
        assert qt[1] == 11  # natural (0,1); in zigzag order it is also pos 1

    def test_mcu_geometry(self, photo_image):
        h = scan_jpeg(make_jpeg(photo_image, sampling="4:2:0"))
        assert (h.mcu_cols, h.mcu_rows) == (10, 8)
        h = scan_jpeg(make_jpeg(photo_image, sampling="4:4:4"))
        assert (h.mcu_cols, h.mcu_rows) == (20, 15)


class TestScannerErrors:
    def test_not_a_jpeg(self):
        with pytest.raises(JpegError, match="SOI"):
            scan_jpeg(b"\x00\x01\x02\x03\x04\x05")

    def test_truncated(self, photo_image):
        data = make_jpeg(photo_image)
        with pytest.raises(JpegError):
            scan_jpeg(data[: len(data) // 2])

    def test_unsupported_frame_types(self, photo_image):
        data = bytearray(make_jpeg(photo_image, sampling="4:4:4"))
        idx = data.find(struct.pack(">H", M.SOF0))
        for marker in (M.SOF3, M.SOF9, M.SOF11):
            mutated = bytearray(data)
            mutated[idx:idx + 2] = struct.pack(">H", marker)
            with pytest.raises(UnsupportedJpegError, match="frame type"):
                scan_jpeg(bytes(mutated))

    def test_progressive_multi_scan_parses(self, photo_image):
        # Progressive streams parse into a scan list (capability extension:
        # the reference errors at the second scan's markers,
        # ref jpeg_scanner.cpp:425-430).
        import io
        from PIL import Image
        buf = io.BytesIO()
        Image.fromarray(photo_image).save(buf, format="JPEG",
                                          progressive=True, quality=85,
                                          subsampling=0)
        h = scan_jpeg(buf.getvalue())
        assert h.progressive
        assert len(h.scans) > 1
        first = h.scans[0].spec
        assert (first.start_of_selection, first.end_of_selection) == (0, 0)  # DC scan first
        for s in h.scans[1:]:
            if s.spec.start_of_selection > 0:
                assert len(s.component_indices) == 1

    def test_bad_precision(self, photo_image):
        data = bytearray(make_jpeg(photo_image, sampling="4:4:4"))
        idx = data.find(struct.pack(">H", M.SOF0))
        data[idx + 4] = 12  # precision byte
        with pytest.raises(UnsupportedJpegError, match="precision"):
            scan_jpeg(bytes(data))

    def test_zero_height_is_unsupported_dnl(self, photo_image):
        # T.81 B.2.5: height 0 defers the line count to a DNL segment —
        # well-formed but unsupported (distinct from corrupt dimensions).
        data = bytearray(make_jpeg(photo_image, sampling="4:4:4"))
        idx = data.find(struct.pack(">H", M.SOF0))
        data[idx + 5:idx + 7] = b"\x00\x00"  # height = 0
        with pytest.raises(UnsupportedJpegError, match="DNL"):
            scan_jpeg(bytes(data))

    def test_zero_width_rejected(self, photo_image):
        data = bytearray(make_jpeg(photo_image, sampling="4:4:4"))
        idx = data.find(struct.pack(">H", M.SOF0))
        data[idx + 7:idx + 9] = b"\x00\x00"  # width = 0
        with pytest.raises(JpegError, match="dimensions"):
            scan_jpeg(bytes(data))

    def test_eoi_before_sos(self):
        with pytest.raises(JpegError, match="EOI"):
            scan_jpeg(struct.pack(">HH", M.SOI, M.EOI))

    def test_rst_before_sos(self):
        with pytest.raises(JpegError, match="RST"):
            scan_jpeg(struct.pack(">HH", M.SOI, M.RST0))


class TestEntropyScan:
    """De-stuffing / RST stripping (reference: src/jpeg_scanner.cpp:405-433)."""

    def test_destuff_ff00(self):
        raw = b"\x12\xff\x00\x34\xff\xd9"
        out, offsets, end = _scan_entropy(raw, 0)
        assert out == b"\x12\xff\x34"
        assert offsets == (0,)
        assert end == len(raw)

    def test_rst_markers_recorded(self):
        raw = b"\x11\x22\xff\xd0\x33\xff\xd1\x44\xff\xd9"
        out, offsets, _ = _scan_entropy(raw, 0)
        assert out == b"\x11\x22\x33\x44"
        assert offsets == (0, 2, 3)

    def test_fill_ff_tolerated(self):
        raw = b"\x11\xff\xff\x00\x22\xff\xd9"
        out, offsets, _ = _scan_entropy(raw, 0)
        assert out == b"\x11\xff\x22"

    def test_marker_mid_scan_rejected(self):
        raw = b"\x11\xff\xc4\x00\x22\xff\xd9"
        with pytest.raises(JpegError, match="DHT"):
            _scan_entropy(raw, 0)

    def test_missing_eoi(self):
        with pytest.raises(JpegError, match="EOI"):
            _scan_entropy(b"\x11\x22\x33", 0)

    def test_truncated_ff(self):
        with pytest.raises(JpegError):
            _scan_entropy(b"\x11\x22\xff", 0)


class TestNativeDestuff:
    """The C++ de-stuff fast path is byte-identical (output, offsets,
    end position, and error messages) to the pure-Python reference."""

    def test_differential_adversarial(self):
        import numpy as np

        from pim_jpeg_decoder_tpu.codec.header import JpegError
        from pim_jpeg_decoder_tpu.codec.scanner import _scan_entropy_py
        from pim_jpeg_decoder_tpu.native.binding import destuff_cpp

        if destuff_cpp(b"\xff\xd9", 0, False) is None:
            import pytest
            pytest.skip("native library unavailable")
        rng = np.random.default_rng(99)
        for trial in range(800):
            n = int(rng.integers(1, 120))
            buf = rng.integers(0, 256, n, np.uint8)
            for _ in range(int(rng.integers(0, 10))):
                buf[rng.integers(0, n)] = 0xFF
            for _ in range(int(rng.integers(0, 6))):
                buf[rng.integers(0, n)] = int(rng.choice(
                    [0x00, 0xD0, 0xD5, 0xD7, 0xD9, 0xC4, 0xFF]))
            data = buf.tobytes()
            for stop in (False, True):
                r1 = e1 = r2 = e2 = None
                try:
                    r1 = _scan_entropy_py(data, 0, stop)
                except JpegError as e:
                    e1 = str(e)
                try:
                    r2 = destuff_cpp(data, 0, stop)
                except JpegError as e:
                    e2 = str(e)
                assert r1 == r2 and e1 == e2, (trial, stop, data.hex())

    def test_scan_jpeg_same_with_and_without_native(self, photo_image,
                                                    monkeypatch):
        from pim_jpeg_decoder_tpu.codec.encoder import encode_jpeg
        from pim_jpeg_decoder_tpu.codec.scanner import scan_jpeg

        data = encode_jpeg(photo_image, quality=80, sampling="4:2:0",
                           restart_interval=3)
        h_native = scan_jpeg(data)
        monkeypatch.setenv("PIM_JPEG_TPU_NO_NATIVE", "1")
        h_py = scan_jpeg(data)
        assert h_native.entropy_bytes == h_py.entropy_bytes
        assert h_native.segment_offsets == h_py.segment_offsets
