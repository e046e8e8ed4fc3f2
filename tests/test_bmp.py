"""BMP writer tests: format contract of the reference's write_BMP
(reference: src/bmp_writer.cpp:19-67): 24bpp BITMAPCOREHEADER, pixel offset
0x1A, bottom-up BGR rows, width%4 padding."""

import struct

import numpy as np
import pytest

from pim_jpeg_decoder_tpu.io.bmp import encode_bmp, read_bmp


class TestBmpFormat:
    def test_header_layout(self):
        rgb = np.zeros((2, 3, 3), np.uint8)
        data = encode_bmp(rgb)
        assert data[:2] == b"BM"
        file_size, reserved, offset = struct.unpack_from("<III", data, 2)
        assert offset == 0x1A
        assert reserved == 0
        assert file_size == len(data)
        hdr_size, width, height, planes, bpp = struct.unpack_from("<IHHHH", data, 14)
        assert (hdr_size, width, height, planes, bpp) == (12, 3, 2, 1, 24)

    @pytest.mark.parametrize("width,pad", [(4, 0), (5, 1), (6, 2), (7, 3), (8, 0)])
    def test_row_padding(self, width, pad):
        """24bpp padding equals width % 4 (see SURVEY.md C23)."""
        rgb = np.zeros((2, width, 3), np.uint8)
        data = encode_bmp(rgb)
        row_bytes = width * 3 + pad
        assert len(data) == 0x1A + 2 * row_bytes
        assert pad == width % 4

    def test_bottom_up_bgr(self):
        rgb = np.zeros((2, 1, 3), np.uint8)
        rgb[0, 0] = [1, 2, 3]      # top row
        rgb[1, 0] = [9, 8, 7]      # bottom row
        data = encode_bmp(rgb)
        pixels = data[0x1A:]
        # First stored row is the bottom image row, in B,G,R order.
        assert list(pixels[:3]) == [7, 8, 9]

    def test_roundtrip(self, rng):
        rgb = rng.integers(0, 256, (33, 41, 3), dtype=np.uint8)
        np.testing.assert_array_equal(read_bmp(encode_bmp(rgb)), rgb)

    def test_pil_can_read(self, rng):
        import io
        from PIL import Image
        rgb = rng.integers(0, 256, (21, 17, 3), dtype=np.uint8)
        img = np.array(Image.open(io.BytesIO(encode_bmp(rgb))).convert("RGB"))
        np.testing.assert_array_equal(img, rgb)

    def test_rejects_bad_input(self):
        with pytest.raises(ValueError):
            encode_bmp(np.zeros((4, 4), np.uint8))
        with pytest.raises(ValueError):
            encode_bmp(np.zeros((4, 4, 3), np.float32))


class TestBmpInfoHeaderFallback:
    """Dimensions >= 65,536 px exceed BITMAPCOREHEADER's 16-bit fields; the
    writer falls back to the 40-byte BITMAPINFOHEADER so chunked decode's
    'no size ceiling' holds through the serializer."""

    def test_wide_image_roundtrip(self, rng):
        rgb = rng.integers(0, 256, (2, 70000, 3), dtype=np.uint8)
        data = encode_bmp(rgb)
        hdr_size = struct.unpack_from("<I", data, 14)[0]
        assert hdr_size == 40
        offset = struct.unpack_from("<I", data, 10)[0]
        assert offset == 54
        width, height = struct.unpack_from("<ii", data, 18)
        assert (width, height) == (70000, 2)
        np.testing.assert_array_equal(read_bmp(data), rgb)

    def test_tall_image_roundtrip(self, rng):
        rgb = rng.integers(0, 256, (65536, 3, 3), dtype=np.uint8)
        np.testing.assert_array_equal(read_bmp(encode_bmp(rgb)), rgb)

    def test_pil_can_read_info_header(self, rng):
        import io
        from PIL import Image
        rgb = rng.integers(0, 256, (2, 66000, 3), dtype=np.uint8)
        img = np.array(Image.open(io.BytesIO(encode_bmp(rgb))).convert("RGB"))
        np.testing.assert_array_equal(img, rgb)

    def test_small_images_keep_reference_exact_core_header(self):
        data = encode_bmp(np.zeros((65535, 1, 3), np.uint8))
        assert struct.unpack_from("<I", data, 14)[0] == 12

    def test_rejects_over_4gib_file(self):
        """bfSize/biSizeImage are u32: the BMP format caps at 4 GiB; the
        writer must refuse cleanly instead of struct.error-ing."""
        class FakeRGB:
            ndim, dtype = 3, np.dtype(np.uint8)
            shape = (65535, 65535, 3)
        with pytest.raises(ValueError, match="4 GiB"):
            encode_bmp(FakeRGB())


def test_native_rows_match_numpy(rng):
    """encode_bmp's C++ row serializer must be byte-identical to the
    NumPy fallback (incl. row padding and the INFOHEADER fallback)."""
    from pim_jpeg_decoder_tpu.io import bmp
    from pim_jpeg_decoder_tpu.native import binding as B

    if B.load() is None:
        pytest.skip("native library unavailable")
    for h, w in [(1, 1), (7, 5), (8, 4), (33, 31), (64, 66), (2, 65537)]:
        rgb = rng.integers(0, 256, (h, w, 3), np.uint8)
        a = bmp.encode_bmp(rgb)
        with pytest.MonkeyPatch.context() as mp:
            mp.setattr(B, "load", lambda: None)  # NumPy path
            b = bmp.encode_bmp(rgb)
        assert a == b, (h, w)
        np.testing.assert_array_equal(bmp.read_bmp(a), rgb)


class TestFusedYcbcrBmp:
    """write_bmp_ycbcr: one-pass wire-planes -> BMP fused serializer must
    be byte-identical to the two-pass ycbcr_to_rgb + encode_bmp route."""

    @pytest.mark.parametrize("v,h,ncomp,height,width", [
        (2, 2, 3, 240, 320),    # 4:2:0
        (1, 2, 3, 120, 168),    # 4:2:2
        (2, 1, 3, 240, 104),    # 4:4:0
        (1, 1, 3, 37, 61),      # 4:4:4, odd dims (row padding)
        (1, 1, 1, 33, 47),      # grayscale, odd dims
        (2, 2, 3, 255, 319),    # partial edge MCUs
    ])
    def test_matches_two_pass_route(self, tmp_path, v, h, ncomp,
                                    height, width):
        from pim_jpeg_decoder_tpu.io.bmp import encode_bmp, write_bmp_ycbcr
        from pim_jpeg_decoder_tpu.native import native_available
        from pim_jpeg_decoder_tpu.native.binding import ycbcr_to_rgb_cpp
        if not native_available():
            pytest.skip("native library unavailable")
        rng = np.random.default_rng(hash((v, h, ncomp)) % (1 << 31))
        g = v * h + (2 if ncomp == 3 else 0)
        rows_m = -(-height // (8 * v))
        cols_m = -(-width // (8 * h))
        m = rows_m * cols_m + 7  # slack: nonzero mcu_off support
        planes = rng.integers(0, 256, (g, 64, m), np.uint8)
        for off in (0, 5):
            rgb = ycbcr_to_rgb_cpp(planes, off, v, h, ncomp, rows_m,
                                   cols_m, height, width)
            want = encode_bmp(rgb)
            p = tmp_path / f"f_{v}{h}{ncomp}_{off}.bmp"
            write_bmp_ycbcr(str(p), planes, off, v, h, ncomp, rows_m,
                            cols_m, height, width)
            assert p.read_bytes() == want
