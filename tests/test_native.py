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



class TestRandomTableDifferential:
    """Native vs Python entropy decode on RANDOM canonical Huffman tables
    and garbage bitstreams.  Real encoders only emit near-standard tables;
    this exercises the degenerate shapes (1-bit codes, deep 16-bit codes,
    wide magnitudes, sparse/empty tables) that the fast-path LUTs — the
    fused DC table and the pair extension in particular — must still
    decode byte-identically (including WHICH error fires)."""

    @staticmethod
    def _complete_huffman(rng, table_class, table_id):
        """COMPLETE canonical code via random binary-tree splitting: every
        bit pattern decodes to some symbol, so garbage streams decode
        fully (no BAD_CODE) and the success-path comparison gets dense
        coverage."""
        import numpy as np

        from pim_jpeg_decoder_tpu.codec.header import HuffmanTableSpec

        depths = [1, 1]
        target = int(rng.integers(4, 40))
        while len(depths) < target:
            i = int(rng.integers(0, len(depths)))
            if depths[i] >= 16:
                continue
            d = depths.pop(i)
            depths += [d + 1, d + 1]
        counts = np.zeros(16, np.uint8)
        for d in depths:
            counts[d - 1] += 1
        total = len(depths)
        if table_class == 0:
            syms = rng.integers(0, 9, total).astype(np.uint8)  # sizes 0..8
        else:
            runs = rng.integers(0, 3, total)
            sizes = rng.integers(1, 5, total)
            syms = (runs << 4 | sizes).astype(np.uint8)
            for j in range(total):  # dense EOBs end most blocks early
                if rng.random() < 0.2:
                    syms[j] = 0x00
        return HuffmanTableSpec(table_id, table_class, counts, syms)

    @staticmethod
    def _random_huffman(rng, table_class, table_id):
        import numpy as np

        from pim_jpeg_decoder_tpu.codec.header import HuffmanTableSpec

        counts = np.zeros(16, np.uint8)
        code = 0
        total = 0
        for l in range(1, 17):
            cap = (1 << l) - code
            if cap <= 0 or total >= 162:
                n = 0
            else:
                # Bias toward short codes (incl. 1-bit) so the pair paths
                # and extreme |val2| magnitudes get real coverage.
                n = int(rng.choice([0, 0, 1, 1, 2, 3, cap % 7]))
                n = max(0, min(n, cap - (1 if l < 16 else 0), 162 - total))
            counts[l - 1] = n
            total += n
            code = (code + n) << 1
        if total == 0:
            counts[0] = 1
            total = 1
        if table_class == 0:  # DC: sizes 0..11 valid; sprinkle invalid
            syms = rng.integers(0, 12, total).astype(np.uint8)
            if rng.random() < 0.1:
                syms[rng.integers(0, total)] = rng.integers(12, 16)
        else:  # AC: favor small run/size (pair-able), mix in wide + EOB/ZRL
            runs = rng.integers(0, 16, total)
            # 11..15 are beyond what T.81 encoders emit but legal input —
            # they stress the fast path's worst-case byte budget.
            sizes = rng.choice([1, 1, 1, 2, 2, 3, 4, 9, 10, 12, 15],
                               total)
            syms = (runs << 4 | sizes).astype(np.uint8)
            for j in range(total):
                r = rng.random()
                if r < 0.08:
                    syms[j] = 0x00  # EOB
                elif r < 0.12:
                    syms[j] = 0xF0  # ZRL
                elif r < 0.14:
                    syms[j] = int(rng.integers(1, 15)) << 4  # EOBn: invalid
        return HuffmanTableSpec(table_id, table_class, counts, syms)

    def test_random_tables_and_streams(self):
        import numpy as np

        from pim_jpeg_decoder_tpu.codec.entropy import decode_scan
        from pim_jpeg_decoder_tpu.codec.header import (
            Component,
            JpegError,
            JpegHeader,
        )
        from pim_jpeg_decoder_tpu.native import native_available
        from pim_jpeg_decoder_tpu.native.binding import decode_scan_cpp

        if not native_available():
            import pytest
            pytest.skip("native library unavailable")

        rng = np.random.default_rng(31337)
        agree = 0
        for trial in range(220):
            safe = rng.random() < 0.6
            gray = rng.random() < 0.4
            if gray:
                comps = [Component(0, 1, 1, 0, dc_id=0, ac_id=0)]
            else:
                v, h = int(rng.integers(1, 3)), int(rng.integers(1, 3))
                comps = [Component(0, h, v, 0, dc_id=0, ac_id=0),
                         Component(1, 1, 1, 0, dc_id=1, ac_id=1),
                         Component(2, 1, 1, 0, dc_id=1, ac_id=1)]
            header = JpegHeader(
                width=int(rng.integers(8, 64)),
                height=int(rng.integers(8, 48)),
                components=comps,
                dc_tables={i: (self._complete_huffman if safe
                               else self._random_huffman)(rng, 0, i)
                           for i in range(2)},
                ac_tables={i: (self._complete_huffman if safe
                               else self._random_huffman)(rng, 1, i)
                           for i in range(2)},
                restart_interval=int(rng.choice([0, 0, 0, 2, 5])),
            )
            # Mostly short streams (careful-path coverage); occasionally
            # long enough that the >=264-byte guarded fast phase engages.
            n = int(rng.integers(300, 4000) if rng.random() < 0.15
                    else rng.integers(16, 400))
            payload = rng.integers(0, 256, n, np.uint8)
            if rng.random() < 0.3:
                payload[rng.random(n) < 0.5] = 0  # zero-heavy: long decodes
            header.entropy_bytes = payload.tobytes()
            if header.restart_interval:
                segs = -(-header.num_mcus // header.restart_interval)
                offs = sorted(int(x) for x in rng.integers(0, n, segs - 1))
                header.segment_offsets = tuple([0] + offs)
            else:
                header.segment_offsets = (0,)

            r_py = e_py = r_cc = e_cc = None
            try:
                r_py = decode_scan(header)
            except JpegError as e:
                e_py = str(e)
            try:
                r_cc = decode_scan_cpp(header)
            except JpegError as e:
                e_cc = str(e)

            if e_py is None and e_cc is None:
                np.testing.assert_array_equal(
                    r_py, r_cc, err_msg=f"trial {trial}")
                agree += 1
            else:
                assert e_py is not None and e_cc is not None, (
                    f"trial {trial}: one path errored, the other decoded: "
                    f"py={e_py!r} cpp={e_cc!r}")
        # Garbage streams mostly error, but a healthy fraction must fully
        # decode for the comparison to mean anything.
        assert agree >= 30, f"only {agree} successful decodes compared"


class TestWideMagnitudeSlack:
    """Worst-case-block byte budget for the guarded fast path.

    The 4-bit AC size field admits magnitudes up to 15 (T.81 baseline
    encoders only emit <= 10, but crafted tables are legal input): with
    16-bit codes a block can cost 27 + 63*31 = 1980 bits = 247.5 bytes,
    which overran the original 232-byte kBlockSlack — the fast path would
    read past the entropy buffer on streams truncated mid-final-block
    (observed: garbage success where the oracle raises out-of-data).
    kBlockSlack is 264 now; these streams pin the bound differentially.
    """

    @staticmethod
    def _onecode16(symbol):
        counts = np.zeros(16, np.uint8)
        counts[15] = 1  # a single 16-bit code (all-zero bits)
        return counts, np.array([symbol], np.uint8)

    def _make_header(self, nblocks, truncate_to=None):
        from pim_jpeg_decoder_tpu.codec.header import (
            Component,
            HuffmanTableSpec,
            JpegHeader,
        )

        dc_counts, dc_syms = self._onecode16(11)    # DC size 11
        ac_counts, ac_syms = self._onecode16(0x0F)  # AC run 0, size 15
        bits = []

        def put(value, n):
            bits.extend((value >> i) & 1 for i in range(n - 1, -1, -1))

        for _ in range(nblocks):  # 1980 bits per block
            put(0, 16)            # DC code
            put(0x7FF, 11)        # DC magnitude
            for _ in range(63):
                put(0, 16)        # AC code
                put(0x7FFF, 15)   # AC magnitude -> +32767
        while len(bits) % 8:
            bits.append(1)
        payload = bytes(
            int("".join(map(str, bits[i:i + 8])), 2)
            for i in range(0, len(bits), 8))
        if truncate_to is not None:
            payload = payload[:truncate_to]
        header = JpegHeader(
            width=8 * nblocks, height=8,
            components=[Component(0, 1, 1, 0, dc_id=0, ac_id=0)],
            dc_tables={0: HuffmanTableSpec(0, 0, dc_counts, dc_syms)},
            ac_tables={0: HuffmanTableSpec(0, 1, ac_counts, ac_syms)},
            restart_interval=0,
        )
        header.entropy_bytes = payload
        header.segment_offsets = (0,)
        return header

    def _differential(self, header):
        r_py = e_py = r_cc = e_cc = None
        try:
            r_py = decode_scan(header)
        except JpegError as e:
            e_py = str(e)
        try:
            r_cc = decode_scan_cpp(header)
        except JpegError as e:
            e_cc = str(e)
        if e_py is None and e_cc is None:
            np.testing.assert_array_equal(r_py, r_cc)
        else:
            assert e_py is not None and e_cc is not None, (
                f"one path errored, the other decoded: "
                f"py={e_py!r} cpp={e_cc!r}")
            # Same error, modulo the native "(MCU n)" suffix.
            assert e_cc.startswith(e_py), (e_py, e_cc)

    def test_full_stream_worst_case_blocks(self):
        # 8 blocks x 247.5 B decode bit-identically through the fast path.
        self._differential(self._make_header(8))

    @pytest.mark.parametrize("cut", list(range(1964, 1980, 2)))
    def test_truncated_final_block(self, cut):
        # The 8th block starts at byte 1732.5; cuts in [1964, 1980) leave
        # 232..247 bytes — exactly the window the old slack mis-admitted.
        self._differential(self._make_header(8, truncate_to=cut))


class TestSegmentErrorDrain:
    """An erroring segment range must not orphan still-running ranges:
    decode_scan_cpp's frame is the only owner of the staged buffers, so
    every future has to complete before the error propagates."""

    def test_all_futures_done_before_raise(self, monkeypatch):
        from pim_jpeg_decoder_tpu.native import binding

        monkeypatch.setattr(binding, "_MIN_MCUS_PER_THREAD", 1)
        real_pool = binding._segment_pool()
        recorded = []

        class RecordingPool:
            def submit(self, fn, *a, **kw):
                fut = real_pool.submit(fn, *a, **kw)
                recorded.append(fut)
                return fut

        monkeypatch.setattr(binding, "_segment_pool",
                            lambda: RecordingPool())

        # 40 segments, the FIRST corrupt (invalid code immediately), the
        # rest full-cost wide-magnitude blocks so later ranges are still
        # decoding when range 0's error lands.
        slack = TestWideMagnitudeSlack()
        header = slack._make_header(80)
        payload = bytearray(header.entropy_bytes)
        offs = [0]
        for seg in range(1, 40):
            offs.append((seg * 2 * 1980) // 8)  # 2 blocks per segment
        payload[0] = 0xFF  # top bits != the single all-zero code
        header.entropy_bytes = bytes(payload)
        header.segment_offsets = tuple(offs)
        header.restart_interval = 2

        with pytest.raises(JpegError):
            decode_scan_cpp(header, threads=8)
        assert recorded, "threaded path did not engage"
        assert all(f.done() for f in recorded), (
            "decode_scan_cpp raised while segment futures were pending")
