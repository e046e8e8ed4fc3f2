"""Differential tests: C++ entropy decoder vs the Python/NumPy oracle path.

The two implementations share only the spec; byte-identical output across
all modes (including restart handling and error behavior) is required.
"""

import numpy as np
import pytest

from pim_jpeg_decoder_tpu.codec.encoder import encode_jpeg
from pim_jpeg_decoder_tpu.codec.entropy import decode_scan
from pim_jpeg_decoder_tpu.codec.header import JpegError
from pim_jpeg_decoder_tpu.codec.scanner import scan_jpeg
from pim_jpeg_decoder_tpu.native import native_available
from pim_jpeg_decoder_tpu.native.binding import decode_scan_cpp

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native entropy decoder unavailable")


def both(data: bytes):
    header = scan_jpeg(data)
    return decode_scan(header), decode_scan_cpp(header)


class TestNativeMatchesPython:
    @pytest.mark.parametrize("sampling", ["4:4:4", "4:2:2", "4:4:0", "4:2:0"])
    def test_modes(self, photo_image, sampling):
        a, b = both(encode_jpeg(photo_image, quality=90, sampling=sampling))
        np.testing.assert_array_equal(a, b)

    def test_gray(self, photo_image):
        a, b = both(encode_jpeg(photo_image, grayscale=True))
        np.testing.assert_array_equal(a, b)

    @pytest.mark.parametrize("interval", [1, 2, 7, 64])
    def test_restart_intervals(self, photo_image, interval):
        a, b = both(encode_jpeg(photo_image, quality=85, sampling="4:2:0",
                                restart_interval=interval))
        np.testing.assert_array_equal(a, b)

    def test_noise_high_quality(self, noise_image):
        """Dense AC activity: stresses ZRL/EOB and magnitude-bit paths."""
        a, b = both(encode_jpeg(noise_image, quality=98, sampling="4:4:4"))
        np.testing.assert_array_equal(a, b)

    def test_random_fuzz_roundtrip(self, rng):
        """Randomized differential fuzz across sizes/qualities/modes."""
        for trial in range(8):
            h = int(rng.integers(8, 80))
            w = int(rng.integers(8, 80))
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            sampling = ["4:4:4", "4:2:2", "4:4:0", "4:2:0"][trial % 4]
            quality = int(rng.integers(10, 99))
            interval = int(rng.integers(0, 9))
            data = encode_jpeg(img, quality=quality, sampling=sampling,
                               restart_interval=interval)
            a, b = both(data)
            np.testing.assert_array_equal(a, b, err_msg=str(
                (h, w, sampling, quality, interval)))

    def test_truncated_stream_errors(self, photo_image):
        header = scan_jpeg(encode_jpeg(photo_image, quality=90, sampling="4:4:4"))
        header.entropy_bytes = header.entropy_bytes[: 16]
        with pytest.raises(JpegError):
            decode_scan_cpp(header)

    def test_missing_segment_errors(self, photo_image):
        header = scan_jpeg(encode_jpeg(photo_image, quality=90,
                                       sampling="4:4:4", restart_interval=4))
        header.segment_offsets = header.segment_offsets[:2]
        with pytest.raises(JpegError, match="restart segment"):
            decode_scan_cpp(header)

    def test_ilsvrc(self, ilsvrc_bytes):
        a, b = both(ilsvrc_bytes)
        np.testing.assert_array_equal(a, b)


class TestSegmentParallel:
    """Restart-segment-parallel decode (independent bitstream entry points)."""

    @pytest.fixture(autouse=True)
    def _no_thread_clamp(self, monkeypatch):
        # Small fixtures would otherwise clamp to 1 thread; force the
        # multi-range path so the split logic is actually exercised.
        from pim_jpeg_decoder_tpu.native import binding
        monkeypatch.setattr(binding, "_MIN_MCUS_PER_THREAD", 1)

    @pytest.mark.parametrize("threads", [2, 3, 8])
    def test_matches_single_thread(self, photo_image, threads):
        data = encode_jpeg(photo_image, quality=85, sampling="4:2:0",
                           restart_interval=2)  # 40 segments
        header = scan_jpeg(data)
        a = decode_scan_cpp(header, threads=1)
        b = decode_scan_cpp(header, threads=threads)
        np.testing.assert_array_equal(a, b)

    def test_no_dri_falls_back_to_single(self, photo_image):
        data = encode_jpeg(photo_image, quality=85, sampling="4:2:0")
        header = scan_jpeg(data)
        a = decode_scan_cpp(header, threads=8)  # 1 segment -> 1 thread
        np.testing.assert_array_equal(a, decode_scan(header))

    def test_uneven_segment_split(self, photo_image):
        # 80 MCUs, interval 7 -> 12 segments (last partial) over 5 threads.
        data = encode_jpeg(photo_image, quality=85, sampling="4:2:0",
                           restart_interval=7)
        header = scan_jpeg(data)
        a = decode_scan_cpp(header, threads=5)
        np.testing.assert_array_equal(a, decode_scan(header))

    def test_more_threads_than_segments(self, photo_image):
        data = encode_jpeg(photo_image, quality=85, sampling="4:2:0",
                           restart_interval=40)  # 2 segments
        header = scan_jpeg(data)
        a = decode_scan_cpp(header, threads=16)
        np.testing.assert_array_equal(a, decode_scan(header))

