"""Robustness: corrupt/truncated streams must raise JpegError, never crash,
hang, or return out-of-contract data — on BOTH entropy decoders.

The reference's only failure handling is validate-and-print-and-skip
(reference: src/decoder_host.cpp:120-123); this pins the equivalent
guarantee as a property test over mutated bitstreams.
"""

import numpy as np
import pytest

from pim_jpeg_decoder_tpu.codec.encoder import encode_jpeg
from pim_jpeg_decoder_tpu.codec.entropy import decode_scan
from pim_jpeg_decoder_tpu.codec.header import JpegError
from pim_jpeg_decoder_tpu.codec.scanner import scan_jpeg
from pim_jpeg_decoder_tpu.native import native_available
from pim_jpeg_decoder_tpu.native.binding import decode_scan_cpp


def try_decode(data: bytes):
    """Decode via both paths; they must agree on success/failure."""
    try:
        header = scan_jpeg(data)
    except JpegError:
        return "scan-error"
    try:
        py = decode_scan(header)
        py_ok = True
    except JpegError:
        py_ok = False
    if native_available():
        try:
            cpp = decode_scan_cpp(header)
            cpp_ok = True
        except JpegError:
            cpp_ok = False
        assert py_ok == cpp_ok, "python/C++ disagree on stream validity"
        if py_ok:
            np.testing.assert_array_equal(py, cpp)
    return "ok" if py_ok else "decode-error"


class TestFuzz:
    def test_truncations(self, photo_image):
        data = encode_jpeg(photo_image, quality=85, sampling="4:2:0",
                           restart_interval=5)
        outcomes = {}
        for frac in [0.05, 0.2, 0.5, 0.8, 0.95, 0.999]:
            outcomes[frac] = try_decode(data[: int(len(data) * frac)])
        # A 5%-truncated file cannot decode cleanly; beyond that, not
        # crashing IS the test.
        assert outcomes[0.05] != "ok", outcomes

    def test_byte_flips(self, photo_image, rng):
        data = bytearray(encode_jpeg(photo_image, quality=85, sampling="4:2:0"))
        for _ in range(60):
            mutated = bytearray(data)
            for _ in range(int(rng.integers(1, 4))):
                pos = int(rng.integers(2, len(mutated)))
                mutated[pos] = int(rng.integers(0, 256))
            try_decode(bytes(mutated))  # any JpegError is fine; crash is not

    def test_random_garbage(self, rng):
        for _ in range(20):
            blob = rng.integers(0, 256, int(rng.integers(0, 4096)),
                                dtype=np.uint8).tobytes()
            with pytest.raises(JpegError):
                scan_jpeg(b"\xff\xd8" + blob)

    def test_entropy_bit_flips_bounded_output(self, photo_image, rng):
        """Bit flips inside entropy data: decode either fails or yields
        in-range coefficients (never out-of-contract shapes/dtypes)."""
        clean = encode_jpeg(photo_image, quality=85, sampling="4:4:4")
        header = scan_jpeg(clean)
        pristine = header.entropy_bytes
        n = len(pristine)
        decoded_ok = 0
        for _ in range(30):
            mutated = bytearray(pristine)     # independent single-bit flips
            pos = int(rng.integers(0, n))
            mutated[pos] ^= 1 << int(rng.integers(0, 8))
            header.entropy_bytes = bytes(mutated)
            r_py = e_py = None
            try:
                r_py = decode_scan(header)
                assert r_py.shape == (header.num_mcus, 3, 64)
                decoded_ok += 1
            except JpegError as e:
                e_py = str(e)
            # The NATIVE decoder must make the same call on the same
            # flipped stream (the fast path is exactly the component
            # with a documented history of corrupt-stream bugs).
            from pim_jpeg_decoder_tpu.native import native_available
            if native_available():
                from pim_jpeg_decoder_tpu.native.binding import (
                    decode_scan_cpp,
                )
                try:
                    r_cc = decode_scan_cpp(header)
                    assert e_py is None, (
                        f"native decoded where oracle raised: {e_py!r}")
                    np.testing.assert_array_equal(r_py, r_cc)
                except JpegError:
                    assert e_py is not None, \
                        "native raised where oracle decoded"
        # Many single-bit flips still decode (just with wrong pixels):
        # the in-contract-output path must actually be exercised.
        assert decoded_ok > 0


class TestSixteenBitQuantTables:
    """DQT precision=1 (16-bit entries) — reference supports it
    (reference: src/jpeg_scanner.cpp:306)."""

    def test_16bit_dqt_roundtrip(self, photo_image):
        import struct
        from pim_jpeg_decoder_tpu.codec import markers as M
        from pim_jpeg_decoder_tpu.codec.tables import ZIGZAG

        data = bytearray(encode_jpeg(photo_image, quality=85, sampling="4:4:4"))
        # Locate the first DQT (8-bit, table 0) and rewrite it as 16-bit.
        idx = data.find(struct.pack(">H", M.DQT))
        assert idx > 0
        length = struct.unpack_from(">H", data, idx + 2)[0]
        body = bytes(data[idx + 4: idx + 2 + length])
        assert body[0] == 0x00  # 8-bit, table id 0
        values8 = body[1:65]
        new_body = bytes([0x10]) + b"".join(
            struct.pack(">H", v) for v in values8)
        new_seg = struct.pack(">HH", M.DQT, len(new_body) + 2) + new_body
        mutated = bytes(data[:idx]) + new_seg + bytes(data[idx + 2 + length:])

        h8 = scan_jpeg(bytes(data))
        h16 = scan_jpeg(mutated)
        assert h16.quant_tables[0].precision == 1
        np.testing.assert_array_equal(h16.quant_tables[0].values,
                                      h8.quant_tables[0].values)
        from pim_jpeg_decoder_tpu.oracle.decoder import decode_bytes_oracle
        np.testing.assert_array_equal(decode_bytes_oracle(mutated).rgb,
                                      decode_bytes_oracle(bytes(data)).rgb)


def test_random_scaled_and_region_differential(rng):
    """Seeded mini-fuzz: scaled engine output == decode_scaled, and
    decode_region == full-decode slice, across random dims/modes."""
    from pim_jpeg_decoder_tpu.models.pipeline import (decode_bytes,
                                                      decode_region,
                                                      decode_scaled)
    from pim_jpeg_decoder_tpu.runtime.engine import DecodeEngine
    from pim_jpeg_decoder_tpu.utils.config import EngineConfig

    samplings = ["4:4:4", "4:2:2", "4:4:0", "4:2:0"]
    eng = DecodeEngine(config=EngineConfig(budget_mcus=1024, lane_tile=128,
                                           prepare_threads=1, scale=2),
                       keep_rgb=True)
    blobs = []
    for i in range(4):
        h, w = int(rng.integers(1, 80)), int(rng.integers(1, 80))
        img = rng.integers(0, 256, (h, w, 3), np.uint8)
        blobs.append((f"s{i}", encode_jpeg(img, quality=75,
                                           sampling=samplings[i])))
    rep = eng.decode_named_blobs(blobs)
    for (name, data), res in zip(blobs, rep.results):
        assert res.ok, (name, res.error)
        np.testing.assert_array_equal(res.rgb,
                                      decode_scaled(data, 2, lane_tile=128),
                                      err_msg=name)

    for i in range(4):
        h, w = int(rng.integers(16, 100)), int(rng.integers(16, 100))
        img = rng.integers(0, 256, (h, w, 3), np.uint8)
        data = encode_jpeg(img, quality=80, sampling=samplings[i])
        full = decode_bytes(data)
        ch = int(rng.integers(1, h + 1))
        cw = int(rng.integers(1, w + 1))
        y0 = int(rng.integers(0, h - ch + 1))
        x0 = int(rng.integers(0, w - cw + 1))
        got = decode_region(data, y0, x0, ch, cw, lane_tile=128)
        np.testing.assert_array_equal(got, full[y0:y0+ch, x0:x0+cw])
