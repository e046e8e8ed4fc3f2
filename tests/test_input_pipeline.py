"""Device-resident batch decode tests (JPEG -> [B, H, W, 3] on device)."""

import numpy as np
import pytest

from pim_jpeg_decoder_tpu.codec.encoder import encode_jpeg
from pim_jpeg_decoder_tpu.codec.header import JpegError
from pim_jpeg_decoder_tpu.models.input_pipeline import decode_same_size_batch
from pim_jpeg_decoder_tpu.oracle.decoder import decode_bytes_oracle


class TestSameSizeBatch:
    def test_batch_matches_oracle(self, photo_image, rng):
        blobs = [
            encode_jpeg(np.roll(photo_image, 7 * i, axis=1),
                        quality=80 + i, sampling="4:2:0")
            for i in range(3)
        ]
        out, headers = decode_same_size_batch(blobs, lane_tile=128)
        assert out.shape == (3, 120, 160, 3)
        assert out.dtype == np.uint8
        host = np.asarray(out)
        for i, b in enumerate(blobs):
            np.testing.assert_array_equal(host[i], decode_bytes_oracle(b).rgb)

    def test_odd_size_crop(self, rng):
        img = rng.integers(0, 256, (37, 61, 3), dtype=np.uint8)
        blobs = [encode_jpeg(img, quality=90, sampling="4:4:4")] * 2
        out, _ = decode_same_size_batch(blobs, lane_tile=128)
        assert out.shape == (2, 37, 61, 3)
        np.testing.assert_array_equal(np.asarray(out)[0],
                                      decode_bytes_oracle(blobs[0]).rgb)

    def test_mixed_sizes_rejected(self, photo_image, rng):
        a = encode_jpeg(photo_image, quality=85, sampling="4:2:0")
        b = encode_jpeg(photo_image[:64], quality=85, sampling="4:2:0")
        with pytest.raises(JpegError, match="identical dimensions"):
            decode_same_size_batch([a, b], lane_tile=128)

    def test_mixed_modes_rejected(self, photo_image):
        a = encode_jpeg(photo_image, quality=85, sampling="4:2:0")
        b = encode_jpeg(photo_image, quality=85, sampling="4:4:4")
        with pytest.raises(JpegError, match="identical dimensions"):
            decode_same_size_batch([a, b], lane_tile=128)


def test_scaled_batch_matches_decode_scaled(photo_image):
    from pim_jpeg_decoder_tpu.models.input_pipeline import (
        decode_same_size_batch)
    from pim_jpeg_decoder_tpu.models.pipeline import decode_scaled

    blobs = [encode_jpeg(photo_image, quality=q, sampling="4:2:0")
             for q in (85, 60)]
    out, headers = decode_same_size_batch(blobs, lane_tile=128, scale=2)
    out = np.asarray(out)
    for i, b in enumerate(blobs):
        np.testing.assert_array_equal(out[i], decode_scaled(b, 2,
                                                            lane_tile=128))
