"""Scaled decode (1/2, 1/4, 1/8): reduced-IDCT kernel vs oracle, PIL draft.

The reduced n-point IDCT spec lives in ops/specs.py; the kernel and the
NumPy oracle share the integer basis matrices, so bit-exact agreement is
required.  Visual correctness is pinned against PIL's libjpeg draft mode
(a different reduced-IDCT algorithm, so tolerance, not equality) and
against box-downsampled full decodes.
"""

import numpy as np
import pytest

from pim_jpeg_decoder_tpu.codec.encoder import encode_jpeg
from pim_jpeg_decoder_tpu.codec.entropy import decode_scan
from pim_jpeg_decoder_tpu.codec.scanner import scan_jpeg
from pim_jpeg_decoder_tpu.models.pipeline import (build_qpool, decode_bytes,
                                                  decode_scaled)
from pim_jpeg_decoder_tpu.ops import specs as S
from pim_jpeg_decoder_tpu.ops.decode_kernel import decode_mcus
from pim_jpeg_decoder_tpu.oracle.color import ycbcr_to_rgb
from pim_jpeg_decoder_tpu.oracle.idct import (dequantize,
                                              reduced_idct_blocks)

from tests.helpers import stage_single

LANE_TILE = 128


class TestReducedIdctSpec:
    @pytest.mark.parametrize("n", [4, 2, 1])
    def test_flat_block_preserves_intensity(self, n):
        """A DC-only block decodes to the same constant at every scale."""
        coeffs = np.zeros((1, 8, 8), np.int32)
        coeffs[0, 0, 0] = 8 * 100  # full decode would give ~100
        out = reduced_idct_blocks(coeffs, n)
        assert out.shape == (1, n, n)
        np.testing.assert_allclose(out, 100, atol=1)

    @pytest.mark.parametrize("n", [4, 2])
    def test_close_to_float_reference(self, rng, n):
        """Integer reduced IDCT tracks the float reduced IDCT closely."""
        import math
        coeffs = rng.integers(-512, 512, (64, 8, 8)).astype(np.int32)
        got = reduced_idct_blocks(coeffs, n, clamp=False)
        k = np.arange(n)
        u = np.arange(n)
        c = np.where(u == 0, 1 / math.sqrt(2), 1.0)
        basis = 0.5 * c[None, :] * np.cos(
            (2 * k[:, None] + 1) * u[None, :] * np.pi / (2 * n))
        want = np.einsum("kv,pu,mvu->mkp", basis, basis,
                         coeffs[:, :n, :n].astype(np.float64))
        assert np.abs(got - want).max() <= 2


def kernel_vs_oracle_scaled(img, sampling, grayscale, scale):
    data = encode_jpeg(img, quality=85,
                       sampling="4:4:4" if grayscale else sampling,
                       grayscale=grayscale)
    header = scan_jpeg(data)
    coeffs = decode_scan(header)
    mode = S.mode_for(header.mode_key)
    n = 8 // scale

    padded, qidx, qpool, _ = stage_single(header, coeffs, LANE_TILE)
    got = np.asarray(decode_mcus(padded, qidx, qpool,
                                 mode, lane_tile=LANE_TILE, scale=scale))
    got = got[: header.num_mcus]            # [M, gy, n*n, 3]

    m = header.num_mcus
    deq = dequantize(coeffs, qpool[np.zeros(m, np.int32)].astype(np.uint32))
    blocks = deq.reshape(m, mode.g, 8, 8)
    gy = mode.luma_slots
    spat = reduced_idct_blocks(blocks[:, :gy], n)
    if mode.ncomp == 1:
        y = np.clip(spat[:, 0] + 128, 0, 255).astype(np.uint8)
        want = np.repeat(y.swapaxes(1, 2).reshape(m, n * n, 1), 3, axis=2)
        np.testing.assert_array_equal(got[:, 0], want)
        return
    # Chroma is reduced per-axis to (v*n) x (h*n): no upsampling, each
    # luma slot slices its n x n region.
    chroma = reduced_idct_blocks(blocks[:, gy:], mode.v * n, mode.h * n)
    for s in range(gy):
        qv, qh = mode.luma_slot_pos(s)
        cb = chroma[:, 0, qv * n:(qv + 1) * n, qh * n:(qh + 1) * n]
        cr = chroma[:, 1, qv * n:(qv + 1) * n, qh * n:(qh + 1) * n]
        want = (ycbcr_to_rgb(spat[:, s], cb, cr)
                .swapaxes(1, 2).reshape(m, n * n, 3))
        np.testing.assert_array_equal(got[:, s], want)


class TestScaledKernelBitExact:
    @pytest.mark.parametrize("scale", [2, 4, 8])
    @pytest.mark.parametrize("sampling,grayscale", [
        ("4:2:0", False), ("4:2:2", False), ("4:4:0", False),
        ("4:4:4", False), ("gray", True)])
    def test_matches_oracle(self, photo_image, sampling, grayscale, scale):
        kernel_vs_oracle_scaled(photo_image, sampling, grayscale, scale)


class TestDecodeScaledApi:
    def test_dims_and_visual_accuracy(self, photo_image):
        data = encode_jpeg(photo_image, quality=90, sampling="4:2:0")
        full = decode_bytes(data).astype(np.float64)
        h, w = full.shape[:2]
        for scale in (2, 4, 8):
            got = decode_scaled(data, scale, lane_tile=LANE_TILE)
            assert got.shape == (-(-h // scale), -(-w // scale), 3)
            # Compare against a box-downsample of the full decode (crop to
            # the whole-factor region to avoid partial-box edge effects).
            hh = h // scale * scale
            ww = w // scale * scale
            box = full[:hh, :ww].reshape(
                hh // scale, scale, ww // scale, scale, 3).mean((1, 3))
            diff = np.abs(got[:hh // scale, :ww // scale] - box)
            assert diff.mean() < 10, (scale, diff.mean())

    def test_pil_draft_halfscale_tolerance(self, photo_image):
        """PIL's libjpeg draft mode is a different reduced-IDCT algorithm;
        agreement is approximate but must be close."""
        import io

        from PIL import Image

        data = encode_jpeg(photo_image, quality=90, sampling="4:2:0")
        img = Image.open(io.BytesIO(data))
        img.draft("RGB", (img.width // 2, img.height // 2))
        want = np.asarray(img.convert("RGB")).astype(np.int32)
        got = decode_scaled(data, 2, lane_tile=LANE_TILE).astype(np.int32)
        if got.shape != want.shape:
            pytest.skip(f"PIL draft produced {want.shape}, not half scale")
        diff = np.abs(got - want)
        assert diff.mean() < 4, diff.mean()

    def test_scale_one_is_full_decode(self, photo_image):
        data = encode_jpeg(photo_image, quality=85, sampling="4:2:0")
        np.testing.assert_array_equal(decode_scaled(data, 1),
                                      decode_bytes(data))

    def test_rejects_bad_scale(self, photo_image):
        data = encode_jpeg(photo_image, quality=85)
        with pytest.raises(ValueError):
            decode_scaled(data, 3)


class TestEngineScale:
    def test_engine_scaled_matches_decode_scaled(self, photo_image):
        from pim_jpeg_decoder_tpu.runtime.engine import DecodeEngine

        blobs = [
            ("a", encode_jpeg(photo_image, quality=85, sampling="4:2:0")),
            ("g", encode_jpeg(photo_image, quality=85, grayscale=True)),
        ]
        engine = DecodeEngine(budget_mcus=1024, lane_tile=LANE_TILE,
                              keep_rgb=True, scale=2)
        report = engine.decode_named_blobs(blobs)
        assert report.ok_count == 2, [r.error for r in report.results]
        for (name, data), res in zip(blobs, report.results):
            np.testing.assert_array_equal(
                res.rgb, decode_scaled(data, 2, lane_tile=LANE_TILE),
                err_msg=name)

    def test_engine_scaled_chunked(self, rng):
        """Chunked (banded) decode composes with scale."""
        from pim_jpeg_decoder_tpu.runtime.engine import DecodeEngine
        from pim_jpeg_decoder_tpu.utils.config import EngineConfig

        img = rng.integers(0, 256, (250, 210, 3), dtype=np.uint8)
        data = encode_jpeg(img, quality=80, sampling="4:2:0")  # 224 MCUs
        cfg = EngineConfig(budget_mcus=128, lane_tile=128,
                           prepare_threads=1, max_launch_mcus=128, scale=2)
        engine = DecodeEngine(keep_rgb=True, config=cfg)
        report = engine.decode_named_blobs([("huge", data)])
        assert report.ok_count == 1, [r.error for r in report.results]
        np.testing.assert_array_equal(
            report.results[0].rgb, decode_scaled(data, 2, lane_tile=128))


class TestScaledExtremeValues:
    """Adversarial inputs through the reduced-IDCT path: int32 wrap and
    clamp regions must agree between kernel and oracle by the shared spec."""

    @pytest.mark.parametrize("scale", [2, 4, 8])
    @pytest.mark.parametrize("mode_key", sorted(S.MODES))
    def test_extreme_matches_oracle(self, mode_key, scale):
        mode = S.mode_for(mode_key)
        n = 8 // scale
        rng = np.random.default_rng((hash(mode_key) ^ scale) % 2**31)
        m = LANE_TILE
        coeffs = rng.integers(-32768, 32768, (m, mode.g, 64)).astype(np.int16)
        coeffs[0] = 32767
        coeffs[1] = -32768
        qpool = rng.integers(1, 65536, (4, mode.g, 64)).astype(np.float32)
        qidx = (np.arange(m) % 4).astype(np.int32)

        got = np.asarray(decode_mcus(coeffs, qidx, qpool, mode,
                                     lane_tile=LANE_TILE, scale=scale))

        deq = dequantize(coeffs, qpool[qidx].astype(np.uint32))
        blocks = deq.reshape(m, mode.g, 8, 8)
        gy = mode.luma_slots
        spat = reduced_idct_blocks(blocks[:, :gy], n)
        if mode.ncomp == 1:
            y = np.clip(spat[:, 0] + 128, 0, 255).astype(np.uint8)
            want = np.repeat(y.swapaxes(1, 2).reshape(m, n * n, 1),
                             3, axis=2)
            np.testing.assert_array_equal(got[:, 0], want)
            return
        chroma = reduced_idct_blocks(blocks[:, gy:], mode.v * n, mode.h * n)
        for s in range(gy):
            qv, qh = mode.luma_slot_pos(s)
            cb = chroma[:, 0, qv * n:(qv + 1) * n, qh * n:(qh + 1) * n]
            cr = chroma[:, 1, qv * n:(qv + 1) * n, qh * n:(qh + 1) * n]
            want = (ycbcr_to_rgb(spat[:, s], cb, cr)
                    .swapaxes(1, 2).reshape(m, n * n, 3))
            np.testing.assert_array_equal(got[:, s], want)


class TestScaledOracleRaster:
    """decode_scaled_oracle (the host golden used by bench.py's hardware
    sweep) agrees bit-exactly with the kernel path at full-raster level."""

    @pytest.mark.parametrize("scale", [2, 4, 8])
    @pytest.mark.parametrize("sampling,grayscale", [
        ("4:2:0", False), ("4:2:2", False), ("4:4:0", False),
        ("4:4:4", False), ("gray", True)])
    def test_matches_decode_scaled(self, photo_image, sampling, grayscale,
                                   scale):
        from pim_jpeg_decoder_tpu.oracle.decoder import decode_scaled_oracle
        img = photo_image[:, :, 0] if grayscale else photo_image
        data = encode_jpeg(img, quality=85,
                           sampling="4:4:4" if grayscale else sampling,
                           grayscale=grayscale)
        got = decode_scaled(data, scale, lane_tile=LANE_TILE)
        want = decode_scaled_oracle(data, scale)
        assert got.shape == want.shape
        np.testing.assert_array_equal(got, want)
