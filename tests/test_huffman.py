"""Canonical Huffman codegen + decode-LUT tests.

Unit coverage for the equivalent of the reference's ``generate_codes``
(reference: src/jpeg_scanner.cpp:438-448) and symbol decoder
(reference: src/jpeg_scanner.cpp:450-465).
"""

import numpy as np
import pytest

from pim_jpeg_decoder_tpu.codec import tables as T
from pim_jpeg_decoder_tpu.codec.header import HuffmanTableSpec, JpegError
from pim_jpeg_decoder_tpu.codec.huffman import (
    build_decode_table,
    canonical_codes,
    extend_signed,
)


def spec(counts, symbols):
    return HuffmanTableSpec(0, 0, np.array(counts, np.uint8), np.array(symbols, np.uint8))


class TestCanonicalCodes:
    def test_simple_table(self):
        # counts: one 1-bit code, two 2-bit codes... wait 1-bit:1, 2-bit:2
        s = spec([1, 2] + [0] * 14, [5, 6, 7])
        codes = canonical_codes(s)
        assert codes == [(0b0, 1, 5), (0b10, 2, 6), (0b11, 2, 7)]

    def test_std_dc_luma(self):
        s = spec(T.STD_DC_LUMA_COUNTS, T.STD_DC_LUMA_SYMBOLS)
        codes = canonical_codes(s)
        assert len(codes) == 12
        # Known canonical assignment for the Annex K DC luminance table.
        assert codes[0] == (0b00, 2, 0)
        assert codes[1] == (0b010, 3, 1)
        assert codes[-1] == (0b111111110, 9, 11)

    def test_overfull_table_rejected(self):
        s = spec([3] + [0] * 15, [1, 2, 3])  # three 1-bit codes: impossible
        with pytest.raises(JpegError, match="overflow"):
            canonical_codes(s)

    def test_prefix_free(self):
        s = spec(T.STD_AC_LUMA_COUNTS, T.STD_AC_LUMA_SYMBOLS)
        codes = canonical_codes(s)
        as_strings = [format(c, f"0{l}b") for c, l, _ in codes]
        for i, a in enumerate(as_strings):
            for j, b in enumerate(as_strings):
                if i != j:
                    assert not b.startswith(a)


class TestDecodeLut:
    @pytest.mark.parametrize("counts,symbols", [
        (T.STD_DC_LUMA_COUNTS, T.STD_DC_LUMA_SYMBOLS),
        (T.STD_DC_CHROMA_COUNTS, T.STD_DC_CHROMA_SYMBOLS),
        (T.STD_AC_LUMA_COUNTS, T.STD_AC_LUMA_SYMBOLS),
        (T.STD_AC_CHROMA_COUNTS, T.STD_AC_CHROMA_SYMBOLS),
    ])
    def test_lut_roundtrip(self, counts, symbols):
        """Every (code, length) decodes back to its symbol via the peek LUT."""
        s = spec(counts, symbols)
        table = build_decode_table(s)
        for code, length, symbol in canonical_codes(s):
            # Any 16-bit word whose prefix is this code must decode to it.
            base = code << (16 - length)
            for tail in (0, (1 << (16 - length)) - 1):
                peek = base | tail
                assert table.lut_symbol[peek] == symbol
                assert table.lut_length[peek] == length

    def test_invalid_code_marked(self):
        # A tiny table leaves most of the peek space invalid (length 0).
        s = spec([0, 1] + [0] * 14, [9])   # single 2-bit code "00"
        table = build_decode_table(s)
        assert table.lut_length[0b00 << 14] == 2
        assert table.lut_length[0b11 << 14] == 0  # not a valid code

    def test_encoder_view_matches(self):
        s = spec(T.STD_AC_LUMA_COUNTS, T.STD_AC_LUMA_SYMBOLS)
        table = build_decode_table(s)
        for code, length, symbol in canonical_codes(s):
            assert table.enc_code[symbol] == code
            assert table.enc_length[symbol] == length


class TestExtendSigned:
    """ITU-T T.81 F.2.2.1 EXTEND (reference: src/jpeg_scanner.cpp:484)."""

    @pytest.mark.parametrize("value,size,expected", [
        (0, 0, 0),
        (0, 1, -1), (1, 1, 1),
        (0, 2, -3), (1, 2, -2), (2, 2, 2), (3, 2, 3),
        (0, 10, -1023), (1023, 10, 1023), (512, 10, 512), (511, 10, -512),
    ])
    def test_extend(self, value, size, expected):
        assert extend_signed(value, size) == expected
