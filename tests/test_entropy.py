"""Sequential entropy decode tests (BitReader + block/scan decode).

Covers the equivalents of the reference's BitReader
(reference: src/headers/jpeg.h:81-122) and baseline MCU decode
(reference: src/jpeg_scanner.cpp:467-520,707-756), including correct
MCU-counted restart handling for subsampled images — the case the
reference's ``(y*mcu_width_real + x) % restart_interval`` miscounts
(SURVEY.md section 2, parallelism item 4).
"""

import numpy as np
import pytest

from pim_jpeg_decoder_tpu.codec.encoder import encode_jpeg
from pim_jpeg_decoder_tpu.codec.entropy import BitReader, decode_scan
from pim_jpeg_decoder_tpu.codec.header import JpegError
from pim_jpeg_decoder_tpu.codec.scanner import scan_jpeg


class TestBitReader:
    def test_read_bits_msb_first(self):
        br = BitReader(bytes([0b10110100, 0b01100000]))
        assert br.read_bits(1) == 1
        assert br.read_bits(2) == 0b01
        assert br.read_bits(5) == 0b10100
        assert br.read_bits(3) == 0b011
        assert br.read_bits(0) == 0

    def test_peek16_does_not_consume(self):
        br = BitReader(bytes([0xAB, 0xCD, 0xEF]))
        assert br.peek16() == 0xABCD
        assert br.peek16() == 0xABCD
        br.read_bits(4)
        assert br.peek16() == 0xBCDE

    def test_seek_byte(self):
        br = BitReader(bytes([0x00, 0xFF, 0x0F]))
        br.read_bits(3)
        br.seek_byte(1)
        assert br.read_bits(8) == 0xFF

    def test_overrun_raises(self):
        br = BitReader(bytes([0xAA]))
        br.read_bits(8)
        with pytest.raises(JpegError, match="Ran out"):
            br.read_bits(1)


def roundtrip_coeffs(img, **kw):
    data = encode_jpeg(img, **kw)
    header = scan_jpeg(data)
    return header, decode_scan(header)


class TestDecodeScan:
    def test_shapes(self, photo_image):
        header, coeffs = roundtrip_coeffs(photo_image, sampling="4:2:0")
        assert coeffs.shape == (80, 6, 64)
        assert coeffs.dtype == np.int16
        header, coeffs = roundtrip_coeffs(photo_image, sampling="4:4:4")
        assert coeffs.shape == (300, 3, 64)

    def test_dc_is_differential_sum(self, photo_image):
        """Uniform image: every DC must equal the (identical) block DC."""
        img = np.full((64, 64, 3), 200, dtype=np.uint8)
        header, coeffs = roundtrip_coeffs(img, sampling="4:4:4", quality=95)
        # All AC coefficients of a uniform image are zero.
        assert np.all(coeffs[:, :, 1:] == 0)
        # All DCs within a component are identical (differential decode works).
        for s in range(3):
            assert len(np.unique(coeffs[:, s, 0])) == 1

    def test_restart_resets_dc_prediction(self, photo_image):
        """Decode with DRI must equal decode of the same pixels without DRI."""
        h1, c1 = roundtrip_coeffs(photo_image, sampling="4:4:4", restart_interval=7)
        h2, c2 = roundtrip_coeffs(photo_image, sampling="4:4:4")
        np.testing.assert_array_equal(c1, c2)

    @pytest.mark.parametrize("sampling", ["4:2:0", "4:2:2", "4:4:0"])
    @pytest.mark.parametrize("interval", [1, 3, 16])
    def test_restart_subsampled_counts_mcus(self, photo_image, sampling, interval):
        """The reference's restart bug case: subsampled images with DRI."""
        h1, c1 = roundtrip_coeffs(photo_image, sampling=sampling,
                                  restart_interval=interval)
        h2, c2 = roundtrip_coeffs(photo_image, sampling=sampling)
        np.testing.assert_array_equal(c1, c2)

    def test_natural_order_output(self):
        """A horizontal-only gradient has energy only in the top row."""
        x = np.tile(np.linspace(0, 255, 64, dtype=np.uint8), (64, 1))
        img = np.stack([x, x, x], axis=-1)
        header, coeffs = roundtrip_coeffs(img, sampling="4:4:4", quality=95)
        blocks = coeffs[:, 0, :].reshape(-1, 8, 8)
        # Vertical frequencies (rows 1..7) must be ~zero in natural order.
        assert np.abs(blocks[:, 1:, :]).max() == 0

    def test_corrupt_stream_raises(self, photo_image):
        data = bytearray(encode_jpeg(photo_image, sampling="4:4:4"))
        header = scan_jpeg(bytes(data))
        # Truncate the entropy payload: decode must fail, not wrap around.
        header.entropy_bytes = header.entropy_bytes[: len(header.entropy_bytes) // 4]
        with pytest.raises(JpegError):
            decode_scan(header)

    def test_missing_restart_segment_raises(self, photo_image):
        data = encode_jpeg(photo_image, sampling="4:4:4", restart_interval=4)
        header = scan_jpeg(data)
        header.segment_offsets = header.segment_offsets[:3]
        with pytest.raises(JpegError, match="restart segment"):
            decode_scan(header)


def _single_code_table(tid, cls, symbols):
    """DHT spec where every symbol gets a 1-bit code (crafted-stream tests)."""
    from pim_jpeg_decoder_tpu.codec.header import HuffmanTableSpec
    counts = np.zeros(16, np.uint8)
    counts[0] = len(symbols)
    return HuffmanTableSpec(tid, cls, counts, np.asarray(symbols, np.uint8))


def test_baseline_rejects_progressive_eobn_symbol():
    """An AC table containing a progressive EOBn symbol (e.g. 0x10) is
    decodable Huffman-wise but INVALID in a baseline scan: both decoders
    must reject it (guards the fast-AC LUT against treating EOBn as EOB)."""

    from pim_jpeg_decoder_tpu.codec.entropy import decode_scan
    from pim_jpeg_decoder_tpu.codec.header import (Component, HuffmanTableSpec,
                                                   JpegError, JpegHeader)
    from pim_jpeg_decoder_tpu.native import decode_scan_native, native_available

    table = _single_code_table

    header = JpegHeader(width=8, height=8)
    header.components = [Component(0, 1, 1, 0, dc_id=0, ac_id=0)]
    header.dc_tables = {0: table(0, 0, [0x00])}   # code '0' -> DC size 0
    header.ac_tables = {0: table(0, 1, [0x10])}   # code '0' -> EOBn (invalid)
    header.entropy_bytes = bytes([0b00111111])    # DC '0', AC '0', pad 1s
    header.segment_offsets = (0,)

    with pytest.raises(JpegError):
        decode_scan(header)
    if native_available():
        with pytest.raises(JpegError):
            decode_scan_native(header)


def test_baseline_rejects_empty_ac_table():
    """A DHT that defines an AC table with ZERO symbols is structurally
    valid but undecodable: both decoders must error (guards the fast-AC
    thread_local staleness fix — a skipped LUT build must not leave
    entries from a previous image)."""

    from pim_jpeg_decoder_tpu.codec.entropy import decode_scan
    from pim_jpeg_decoder_tpu.codec.header import (Component,
                                                   HuffmanTableSpec,
                                                   JpegError, JpegHeader)
    from pim_jpeg_decoder_tpu.native import (decode_scan_native,
                                             native_available)

    table = _single_code_table

    header = JpegHeader(width=8, height=8)
    header.components = [Component(0, 1, 1, 0, dc_id=0, ac_id=0)]
    header.dc_tables = {0: table(0, 0, [0x01])}   # DC size 1
    header.ac_tables = {0: table(0, 1, [])}       # EMPTY: nothing decodable
    header.entropy_bytes = bytes([0b01111111])    # DC '0'+mag '1', then AC
    header.segment_offsets = (0,)

    with pytest.raises(JpegError):
        decode_scan(header)
    if native_available():
        # Run twice on the same (pool) thread: the second decode must not
        # see a stale fast table from a previous image.
        for _ in range(2):
            with pytest.raises(JpegError):
                decode_scan_native(header)


def test_dc_predictor_overflow_wraps_identically():
    """Corrupt-but-Huffman-valid streams can push the DC predictor past
    int16; both decoders must WRAP (like libjpeg's int16 store), not crash,
    and produce identical coefficients."""

    from pim_jpeg_decoder_tpu.codec.entropy import decode_scan
    from pim_jpeg_decoder_tpu.codec.header import (Component,
                                                   HuffmanTableSpec,
                                                   JpegHeader)
    from pim_jpeg_decoder_tpu.native import (decode_scan_native,
                                             native_available)

    table = _single_code_table

    # DC: code '0' -> size 11 (diff +2047 with all-ones magnitude);
    # AC: code '0' -> EOB.  20 blocks push the predictor to 40940 > 32767.
    header = JpegHeader(width=8, height=8 * 20)   # 20 MCUs, grayscale
    header.components = [Component(0, 1, 1, 0, dc_id=0, ac_id=0)]
    header.dc_tables = {0: table(0, 0, [0x0B])}
    header.ac_tables = {0: table(0, 1, [0x00])}
    bits = ("0" + "1" * 11 + "0") * 20            # per block: DC + EOB
    bits += "1" * (-len(bits) % 8)
    header.entropy_bytes = bytes(
        int(bits[i:i + 8], 2) for i in range(0, len(bits), 8))
    header.segment_offsets = (0,)

    py = decode_scan(header)
    # Block 17: predictor 2047*18 = 36846 -> wraps to 36846 - 65536.
    assert py[17, 0, 0] == 36846 - 65536
    if native_available():
        cc = decode_scan_native(header)
        np.testing.assert_array_equal(py, cc)
