"""End-to-end oracle decode: golden comparison against PIL/libjpeg.

SURVEY.md section 4 test strategy: the oracle must match libjpeg exactly for
4:4:4 and grayscale (identical integer IDCT + BT.601 + no upsampling) and
within nearest-vs-fancy upsampling tolerance for subsampled modes.
"""

import io

import numpy as np
import pytest
from PIL import Image

from pim_jpeg_decoder_tpu.codec.encoder import encode_jpeg
from pim_jpeg_decoder_tpu.oracle.decoder import decode_bytes_oracle


def pil_decode(data: bytes) -> np.ndarray:
    return np.array(Image.open(io.BytesIO(data)).convert("RGB"))


class TestOracleVsPil:
    @pytest.mark.parametrize("quality", [50, 85, 95])
    def test_444_pixel_exact(self, photo_image, quality):
        data = encode_jpeg(photo_image, quality=quality, sampling="4:4:4")
        ours = decode_bytes_oracle(data).rgb
        np.testing.assert_array_equal(ours, pil_decode(data))

    def test_444_noise_pixel_exact(self, noise_image):
        """High-frequency noise pushes IDCT outputs out of sample range; the
        spec's T.81 sample clamp matches libjpeg's range limit exactly."""
        data = encode_jpeg(noise_image, quality=90, sampling="4:4:4")
        ours = decode_bytes_oracle(data).rgb
        np.testing.assert_array_equal(ours, pil_decode(data))

    def test_gray_pixel_exact(self, photo_image):
        data = encode_jpeg(photo_image, grayscale=True, quality=90)
        ours = decode_bytes_oracle(data).rgb
        np.testing.assert_array_equal(ours, pil_decode(data))

    def test_444_with_dri_pixel_exact(self, photo_image):
        data = encode_jpeg(photo_image, quality=90, sampling="4:4:4",
                           restart_interval=5)
        ours = decode_bytes_oracle(data).rgb
        np.testing.assert_array_equal(ours, pil_decode(data))

    @pytest.mark.parametrize("sampling", ["4:2:2", "4:4:0", "4:2:0"])
    def test_subsampled_close_to_pil(self, photo_image, sampling):
        """Nearest vs libjpeg fancy upsampling: luma exact, chroma close."""
        data = encode_jpeg(photo_image, quality=90, sampling=sampling)
        ours = decode_bytes_oracle(data).rgb.astype(np.int32)
        pil = pil_decode(data).astype(np.int32)
        # Differences come only from the chroma upsampling filter.
        assert np.abs(ours - pil).mean() < 6.0
        # Uniform-chroma image: upsampling filter is irrelevant -> exact.
        gray_rgb = np.stack([photo_image[..., 0]] * 3, axis=-1)
        data = encode_jpeg(gray_rgb, quality=90, sampling=sampling)
        ours = decode_bytes_oracle(data).rgb
        np.testing.assert_array_equal(ours, pil_decode(data))

    @pytest.mark.parametrize("sampling", ["4:2:0", "4:2:2"])
    def test_subsampled_with_dri_matches_no_dri(self, photo_image, sampling):
        """DRI must not change pixels (the reference's restart-count bug)."""
        with_dri = decode_bytes_oracle(
            encode_jpeg(photo_image, quality=90, sampling=sampling,
                        restart_interval=3)).rgb
        without = decode_bytes_oracle(
            encode_jpeg(photo_image, quality=90, sampling=sampling)).rgb
        np.testing.assert_array_equal(with_dri, without)

    def test_zero_based_ids(self, photo_image):
        data = encode_jpeg(photo_image, quality=90, sampling="4:4:4",
                           zero_based_ids=True)
        ours = decode_bytes_oracle(data).rgb
        np.testing.assert_array_equal(ours, pil_decode(data))

    @pytest.mark.parametrize("size", [(8, 8), (7, 5), (17, 9), (64, 48), (31, 33)])
    def test_odd_dimensions(self, rng, size):
        """Non-multiple-of-MCU dimensions crop correctly in every mode."""
        img = rng.integers(0, 256, (*size, 3), dtype=np.uint8)
        for sampling in ["4:4:4", "4:2:0"]:
            data = encode_jpeg(img, quality=90, sampling=sampling)
            ours = decode_bytes_oracle(data).rgb
            assert ours.shape == (*size, 3)
            if sampling == "4:4:4":
                np.testing.assert_array_equal(ours, pil_decode(data))


class TestIlsvrcSample:
    """The reference repo's bundled sample (baseline 4:4:4 500x375)."""

    def test_decodes_and_matches_pil(self, ilsvrc_bytes):
        dec = decode_bytes_oracle(ilsvrc_bytes)
        assert dec.header.mode_key == (1, 1, 3)
        assert (dec.header.width, dec.header.height) == (500, 375)
        # 4:4:4, so no upsampling-filter divergence: bit-exact vs libjpeg.
        np.testing.assert_array_equal(dec.rgb, pil_decode(ilsvrc_bytes))
