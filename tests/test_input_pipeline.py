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


class TestBatchedCrops:
    """decode_same_size_batch_crops: the random-crop input-pipeline
    primitive — per-image crop origins, fixed crop size, device work
    restricted to each crop's covering MCU sub-grid, bit-identical to
    slices of a full decode."""

    def _blobs(self, photo_image, n=4, sampling="4:2:0"):
        return [encode_jpeg(np.roll(photo_image, 11 * i, axis=0),
                            quality=80, sampling=sampling)
                for i in range(n)]

    @pytest.mark.parametrize("sampling", ["4:2:0", "4:2:2", "4:4:4"])
    def test_matches_full_decode_slices(self, photo_image, sampling):
        from pim_jpeg_decoder_tpu.models.input_pipeline import (
            decode_same_size_batch_crops,
        )
        blobs = self._blobs(photo_image, sampling=sampling)
        # Unaligned offsets, corners, and the exact bottom-right edge
        # (160x120 images; 56x72 crops).
        boxes = [(0, 0), (3, 5), (120 - 56, 160 - 72), (37, 88)]
        out, headers = decode_same_size_batch_crops(
            blobs, boxes, (56, 72), lane_tile=128)
        out = np.asarray(out)
        assert out.shape == (4, 56, 72, 3)
        for i, (data, (y0, x0)) in enumerate(zip(blobs, boxes)):
            want = decode_bytes_oracle(data).rgb[y0:y0 + 56, x0:x0 + 72]
            np.testing.assert_array_equal(out[i], want, err_msg=f"crop {i}")

    def test_crop_smaller_than_one_mcu(self, photo_image):
        from pim_jpeg_decoder_tpu.models.input_pipeline import (
            decode_same_size_batch_crops,
        )
        blobs = self._blobs(photo_image, n=2)
        boxes = [(13, 29), (100, 140)]
        out, _ = decode_same_size_batch_crops(blobs, boxes, (9, 11),
                                              lane_tile=128)
        out = np.asarray(out)
        for i, (data, (y0, x0)) in enumerate(zip(blobs, boxes)):
            want = decode_bytes_oracle(data).rgb[y0:y0 + 9, x0:x0 + 11]
            np.testing.assert_array_equal(out[i], want)

    def test_full_image_crop(self, photo_image):
        from pim_jpeg_decoder_tpu.models.input_pipeline import (
            decode_same_size_batch_crops,
        )
        blobs = self._blobs(photo_image, n=2)
        out, _ = decode_same_size_batch_crops(
            blobs, [(0, 0), (0, 0)], (120, 160), lane_tile=128)
        for i, data in enumerate(blobs):
            np.testing.assert_array_equal(np.asarray(out)[i],
                                          decode_bytes_oracle(data).rgb)

    def test_rejects_out_of_bounds_and_mismatches(self, photo_image):
        from pim_jpeg_decoder_tpu.models.input_pipeline import (
            decode_same_size_batch_crops,
        )
        blobs = self._blobs(photo_image, n=2)
        with pytest.raises(ValueError, match="outside"):
            decode_same_size_batch_crops(blobs, [(0, 0), (100, 100)],
                                         (56, 72), lane_tile=128)
        with pytest.raises(ValueError, match="boxes"):
            decode_same_size_batch_crops(blobs, [(0, 0)], (8, 8),
                                         lane_tile=128)
        with pytest.raises(ValueError, match="wire"):
            decode_same_size_batch_crops(blobs, [(0, 0), (0, 0)], (8, 8),
                                         lane_tile=128, wire="i8")


class TestBatchedCropsScaled:
    """Crop + reduced-scale decode in one launch (RandomResizedCrop)."""

    @pytest.mark.parametrize("scale", [2, 4])
    def test_matches_scaled_oracle_slices(self, photo_image, scale):
        from pim_jpeg_decoder_tpu.models.input_pipeline import (
            decode_same_size_batch_crops,
        )
        from pim_jpeg_decoder_tpu.oracle.decoder import decode_scaled_oracle
        blobs = [encode_jpeg(np.roll(photo_image, 9 * i, axis=1),
                             quality=80, sampling="4:2:0") for i in range(3)]
        ch, cw = 56, 72                    # multiples of 2 and 4
        boxes = [(0, 0), (4, 8), (120 - ch, 160 - cw)]
        out, _ = decode_same_size_batch_crops(
            blobs, boxes, (ch, cw), lane_tile=128, scale=scale)
        out = np.asarray(out)
        assert out.shape == (3, ch // scale, cw // scale, 3)
        for i, (data, (y0, x0)) in enumerate(zip(blobs, boxes)):
            full = decode_scaled_oracle(data, scale)
            want = full[y0 // scale:(y0 + ch) // scale,
                        x0 // scale:(x0 + cw) // scale]
            np.testing.assert_array_equal(out[i], want, err_msg=f"crop {i}")

    def test_rejects_misaligned_scaled_crop(self, photo_image):
        from pim_jpeg_decoder_tpu.models.input_pipeline import (
            decode_same_size_batch_crops,
        )
        blobs = [encode_jpeg(photo_image, quality=80, sampling="4:2:0")]
        with pytest.raises(ValueError, match="multiples of scale"):
            decode_same_size_batch_crops(blobs, [(3, 0)], (56, 72),
                                         lane_tile=128, scale=2)
        with pytest.raises(ValueError, match="multiples of scale"):
            decode_same_size_batch_crops(blobs, [(0, 0)], (55, 72),
                                         lane_tile=128, scale=2)


class TestIterDecodeBatches:
    """Streaming prefetch API: must equal serial decode_same_size_batch."""

    def test_matches_serial(self, photo_image, rng):
        from pim_jpeg_decoder_tpu.models.input_pipeline import (
            iter_decode_batches)

        batches = []
        for b in range(3):
            batches.append([
                encode_jpeg(np.roll(photo_image, 5 * b + i, axis=1),
                            quality=75 + b, sampling="4:2:0")
                for i in range(2)
            ])
        # Batches may differ from each other (only internally uniform):
        # final batch is a different size and mode.
        small = photo_image[:56, :72]
        batches.append([encode_jpeg(small, quality=90, sampling="4:4:4")])

        streamed = list(iter_decode_batches(batches, lane_tile=128))
        assert len(streamed) == len(batches)
        for blobs, (out, headers) in zip(batches, streamed):
            want, want_headers = decode_same_size_batch(blobs,
                                                        lane_tile=128)
            np.testing.assert_array_equal(np.asarray(out),
                                          np.asarray(want))
            assert [h.width for h in headers] == [h.width
                                                  for h in want_headers]

    def test_generator_is_lazy_and_prefetches(self, photo_image):
        from pim_jpeg_decoder_tpu.models.input_pipeline import (
            iter_decode_batches)

        blob = encode_jpeg(photo_image, quality=80, sampling="4:2:0")
        consumed = []

        def gen():
            for i in range(4):
                consumed.append(i)
                yield [blob]

        it = iter_decode_batches(gen(), lane_tile=128, prefetch=2)
        first = next(it)
        # prefetch=2: after one pull, the source advanced past the yielded
        # batch (the prefetcher is ahead) but has not drained the stream.
        assert len(consumed) >= 2
        assert np.asarray(first[0]).shape[0] == 1
        rest = list(it)
        assert len(rest) == 3

    def test_error_propagates(self, photo_image):
        from pim_jpeg_decoder_tpu.models.input_pipeline import (
            iter_decode_batches)

        good = encode_jpeg(photo_image, quality=80, sampling="4:2:0")
        bad = good[:40]  # truncated mid-header
        batches = [[good], [bad], [good]]
        it = iter_decode_batches(batches, lane_tile=128)
        np.asarray(next(it)[0])
        with pytest.raises(JpegError):
            next(it)

    def test_empty_batch_rejected(self):
        from pim_jpeg_decoder_tpu.models.input_pipeline import (
            iter_decode_batches)

        with pytest.raises(ValueError, match="empty batch"):
            list(iter_decode_batches([[]]))


class TestIterDecodeBatchCrops:
    def test_matches_serial_crops(self, photo_image):
        from pim_jpeg_decoder_tpu.models.input_pipeline import (
            decode_same_size_batch_crops,
            iter_decode_batch_crops,
        )

        blobs = [encode_jpeg(np.roll(photo_image, 3 * i, axis=0),
                             quality=82, sampling="4:2:0")
                 for i in range(2)]
        crop_hw = (48, 64)
        batches = [
            (blobs, [(0, 0), (17, 33)]),
            (blobs, [(40, 80), (5, 9)]),
        ]
        streamed = list(iter_decode_batch_crops(batches, crop_hw,
                                                lane_tile=128))
        assert len(streamed) == 2
        for (bl, boxes), (out, _) in zip(batches, streamed):
            want, _ = decode_same_size_batch_crops(bl, boxes, crop_hw,
                                                   lane_tile=128)
            np.testing.assert_array_equal(np.asarray(out),
                                          np.asarray(want))

    def test_matches_serial_crops_scaled(self, photo_image):
        from pim_jpeg_decoder_tpu.models.input_pipeline import (
            decode_same_size_batch_crops,
            iter_decode_batch_crops,
        )

        blobs = [encode_jpeg(photo_image, quality=84, sampling="4:2:0")]
        crop_hw = (64, 64)
        batches = [(blobs, [(16, 32)]), (blobs, [(0, 0)])]
        streamed = list(iter_decode_batch_crops(batches, crop_hw,
                                                lane_tile=128, scale=2))
        for (bl, boxes), (out, _) in zip(batches, streamed):
            want, _ = decode_same_size_batch_crops(
                bl, boxes, crop_hw, lane_tile=128, scale=2)
            assert np.asarray(out).shape == (1, 32, 32, 3)
            np.testing.assert_array_equal(np.asarray(out),
                                          np.asarray(want))

    def test_invalid_crop_propagates(self, photo_image):
        from pim_jpeg_decoder_tpu.codec.header import JpegError  # noqa: F401
        from pim_jpeg_decoder_tpu.models.input_pipeline import (
            iter_decode_batch_crops,
        )

        blob = encode_jpeg(photo_image, quality=82, sampling="4:2:0")
        it = iter_decode_batch_crops(
            [([blob], [(10_000, 0)])], (32, 32), lane_tile=128)
        with pytest.raises(ValueError, match="outside"):
            next(it)


class TestFusedNormalization:
    """dtype/mean/std fuse (pixels - mean) / std into the decode program."""

    def _reference(self, u8, mean, std):
        """The documented recipe: float32 compute, multiply by 1/std,
        cast to the requested dtype last."""
        x = np.asarray(u8).astype(np.float32)
        if mean is not None:
            x = x - np.asarray(mean, np.float32).reshape(-1)
        if std is not None:
            inv = 1.0 / np.asarray(std, np.float32).reshape(-1)
            if inv.size == 1:
                inv = np.repeat(inv, 3)
            x = x * inv.astype(np.float32)
        return x

    def test_bf16_normalize_matches_reference(self, photo_image):
        import jax.numpy as jnp

        blobs = [encode_jpeg(np.roll(photo_image, 5 * i, axis=0),
                             quality=83, sampling="4:2:0")
                 for i in range(2)]
        mean = (123.675, 116.28, 103.53)
        std = (58.395, 57.12, 57.375)
        u8, _ = decode_same_size_batch(blobs, lane_tile=128)
        out, _ = decode_same_size_batch(blobs, lane_tile=128,
                                        dtype=jnp.bfloat16, mean=mean,
                                        std=std)
        assert out.dtype == jnp.bfloat16
        want = self._reference(u8, mean, std).astype(jnp.bfloat16)
        np.testing.assert_array_equal(
            np.asarray(out, np.float32), np.asarray(want, np.float32))

    def test_float32_cast_only(self, photo_image):
        import jax.numpy as jnp

        blobs = [encode_jpeg(photo_image, quality=88, sampling="4:4:4")]
        u8, _ = decode_same_size_batch(blobs, lane_tile=128)
        out, _ = decode_same_size_batch(blobs, lane_tile=128,
                                        dtype=jnp.float32)
        assert out.dtype == jnp.float32
        np.testing.assert_array_equal(np.asarray(out),
                                      np.asarray(u8).astype(np.float32))

    def test_scalar_stats_broadcast(self, photo_image):
        import jax.numpy as jnp

        blobs = [encode_jpeg(photo_image, quality=85, sampling="4:2:0")]
        a, _ = decode_same_size_batch(blobs, lane_tile=128,
                                      dtype=jnp.float32, mean=127.5,
                                      std=2.0)
        b, _ = decode_same_size_batch(blobs, lane_tile=128,
                                      dtype=jnp.float32,
                                      mean=(127.5,) * 3, std=(2.0,) * 3)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_crops_normalized(self, photo_image):
        import jax.numpy as jnp

        from pim_jpeg_decoder_tpu.models.input_pipeline import (
            decode_same_size_batch_crops,
        )

        blobs = [encode_jpeg(photo_image, quality=84, sampling="4:2:0")]
        boxes = [(8, 24)]
        mean, std = (120.0, 115.0, 100.0), (60.0, 55.0, 58.0)
        u8, _ = decode_same_size_batch_crops(blobs, boxes, (48, 48),
                                             lane_tile=128)
        out, _ = decode_same_size_batch_crops(
            blobs, boxes, (48, 48), lane_tile=128, dtype=jnp.float32,
            mean=mean, std=std)
        assert out.dtype == jnp.float32
        np.testing.assert_array_equal(np.asarray(out),
                                      self._reference(u8, mean, std))

    def test_streaming_matches_serial_normalized(self, photo_image):
        import jax.numpy as jnp

        from pim_jpeg_decoder_tpu.models.input_pipeline import (
            iter_decode_batches,
        )

        blobs = [encode_jpeg(photo_image, quality=86, sampling="4:2:0")]
        kw = dict(lane_tile=128, dtype=jnp.bfloat16,
                  mean=(110.0, 112.0, 99.0), std=(51.0, 50.0, 52.0))
        (out, _), = list(iter_decode_batches([blobs], **kw))
        want, _ = decode_same_size_batch(blobs, **kw)
        assert out.dtype == jnp.bfloat16
        np.testing.assert_array_equal(np.asarray(out, np.float32),
                                      np.asarray(want, np.float32))

    def test_rejects_bad_specs(self, photo_image):
        import jax.numpy as jnp

        blobs = [encode_jpeg(photo_image, quality=85, sampling="4:2:0")]
        with pytest.raises(ValueError, match="require dtype"):
            decode_same_size_batch(blobs, mean=(1.0, 2.0, 3.0))
        with pytest.raises(ValueError, match="floating"):
            decode_same_size_batch(blobs, dtype=np.int32)
        with pytest.raises(ValueError, match="nonzero"):
            decode_same_size_batch(blobs, dtype=jnp.float32,
                                   std=(1.0, 0.0, 1.0))
        with pytest.raises(ValueError, match="length-3"):
            decode_same_size_batch(blobs, dtype=jnp.float32,
                                   mean=(1.0, 2.0))


class TestMeshBatchDecode:
    """Opt-in multi-chip batch decode (mesh=): kernel sharded over the MCU
    axis under shard_map, output equal to the single-device program and
    sharded over the image axis when the batch divides the mesh — the
    reference's inter-DPU data parallelism for the ML input path
    (reference: src/decoder_host.cpp:125-128)."""

    @pytest.fixture(scope="class")
    def mesh8(self):
        from pim_jpeg_decoder_tpu.parallel.mesh import make_mesh
        return make_mesh(8)

    def _blobs(self, photo_image, n=8):
        return [encode_jpeg(np.roll(photo_image, 5 * i, axis=1),
                            quality=80 + i % 7, sampling="4:2:0")
                for i in range(n)]

    def test_matches_single_device(self, photo_image, mesh8):
        blobs = self._blobs(photo_image)
        out, _ = decode_same_size_batch(blobs, lane_tile=16, mesh=mesh8)
        want, _ = decode_same_size_batch(blobs, lane_tile=16)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(want))
        # Batch divides the mesh -> data-parallel output sharding.
        from pim_jpeg_decoder_tpu.parallel.mesh import MCU_AXIS
        spec = out.sharding.spec
        assert spec[0] == MCU_AXIS, spec

    def test_uneven_batch_matches(self, photo_image, mesh8):
        blobs = self._blobs(photo_image, n=3)  # 3 images on 8 chips
        out, _ = decode_same_size_batch(blobs, lane_tile=16, mesh=mesh8)
        want, _ = decode_same_size_batch(blobs, lane_tile=16)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(want))

    def test_scaled_normalized_matches(self, photo_image, mesh8):
        import jax.numpy as jnp
        blobs = self._blobs(photo_image, n=4)
        kw = dict(lane_tile=16, scale=2, dtype=jnp.bfloat16,
                  mean=(110.0, 120.0, 118.0), std=(58.0, 61.0, 64.0))
        out, _ = decode_same_size_batch(blobs, mesh=mesh8, **kw)
        want, _ = decode_same_size_batch(blobs, **kw)
        np.testing.assert_array_equal(np.asarray(out, np.float32),
                                      np.asarray(want, np.float32))

    def test_crops_match(self, photo_image, mesh8):
        from pim_jpeg_decoder_tpu.models.input_pipeline import (
            decode_same_size_batch_crops)
        blobs = self._blobs(photo_image, n=8)
        boxes = [(3 * i, 5 * i) for i in range(8)]
        kw = dict(boxes=boxes, crop_hw=(48, 56), lane_tile=16)
        out, _ = decode_same_size_batch_crops(blobs, mesh=mesh8, **kw)
        want, _ = decode_same_size_batch_crops(blobs, **kw)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(want))

    def test_streaming_matches(self, photo_image, mesh8):
        from pim_jpeg_decoder_tpu.models.input_pipeline import (
            iter_decode_batch_crops, iter_decode_batches)
        blobs = self._blobs(photo_image, n=8)
        batches = [blobs[:4], blobs[4:]]
        got = [np.asarray(o) for o, _ in
               iter_decode_batches(batches, lane_tile=16, mesh=mesh8)]
        want = [np.asarray(decode_same_size_batch(b, lane_tile=16)[0])
                for b in batches]
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, w)
        boxes = [(8, 16)] * 4
        (got_c, _), = list(iter_decode_batch_crops(
            [(blobs[:4], boxes)], crop_hw=(32, 32), lane_tile=16,
            mesh=mesh8))
        from pim_jpeg_decoder_tpu.models.input_pipeline import (
            decode_same_size_batch_crops)
        want_c, _ = decode_same_size_batch_crops(
            blobs[:4], boxes, crop_hw=(32, 32), lane_tile=16)
        np.testing.assert_array_equal(np.asarray(got_c),
                                      np.asarray(want_c))


class TestMixedSizeBatchCrops:
    """decode_batch_crops (r5): fixed-size random crops over MIXED-size
    images in one static-shape launch — pixels bit-identical to the same
    slice of each image's full decode."""

    def _blobs_boxes(self, photo_image, rng, sampling="4:2:0"):
        import io

        from PIL import Image

        sizes = [(160, 120), (96, 200), (131, 77), (64, 64)]
        blobs, boxes = [], []
        for i, (w, h) in enumerate(sizes):
            img = np.array(Image.fromarray(photo_image).resize(
                (w, h), Image.BILINEAR))
            blobs.append(encode_jpeg(img, quality=80 + i, sampling=sampling))
            y0 = int(rng.integers(0, h - 48 + 1))
            x0 = int(rng.integers(0, w - 56 + 1))
            boxes.append((y0, x0))
        return blobs, boxes

    def test_matches_full_decode_slices(self, photo_image, rng):
        from pim_jpeg_decoder_tpu.models.input_pipeline import (
            decode_batch_crops,
        )

        blobs, boxes = self._blobs_boxes(photo_image, rng)
        out, headers = decode_batch_crops(blobs, boxes, (48, 56),
                                          lane_tile=128)
        assert out.shape == (4, 48, 56, 3)
        host = np.asarray(out)
        for i, (b, (y0, x0)) in enumerate(zip(blobs, boxes)):
            full = decode_bytes_oracle(b).rgb
            np.testing.assert_array_equal(
                host[i], full[y0:y0 + 48, x0:x0 + 56])

    def test_gray_and_422(self, photo_image, rng):
        from pim_jpeg_decoder_tpu.models.input_pipeline import (
            decode_batch_crops,
        )

        blobs, boxes = self._blobs_boxes(photo_image, rng, sampling="4:2:2")
        out, _ = decode_batch_crops(blobs, boxes, (48, 56), lane_tile=128)
        host = np.asarray(out)
        for i, (b, (y0, x0)) in enumerate(zip(blobs, boxes)):
            np.testing.assert_array_equal(
                host[i],
                decode_bytes_oracle(b).rgb[y0:y0 + 48, x0:x0 + 56])

    def test_scaled(self, photo_image, rng):
        from pim_jpeg_decoder_tpu.models.input_pipeline import (
            decode_batch_crops,
            decode_same_size_batch_crops,
        )
        from pim_jpeg_decoder_tpu.oracle.decoder import decode_scaled_oracle

        blobs, _ = self._blobs_boxes(photo_image, rng)
        boxes = [(16, 8), (0, 32), (4, 2), (8, 0)]
        out, _ = decode_batch_crops(blobs, boxes, (48, 56), scale=2,
                                    lane_tile=128)
        assert np.asarray(out).shape == (4, 24, 28, 3)
        host = np.asarray(out)
        for i, (b, (y0, x0)) in enumerate(zip(blobs, boxes)):
            want = decode_scaled_oracle(b, 2)[y0 // 2:(y0 + 48) // 2,
                                              x0 // 2:(x0 + 56) // 2]
            np.testing.assert_array_equal(host[i], want)

    def test_crop_as_large_as_smallest_image(self, photo_image, rng):
        """A crop equal to the smallest image's full area: its covering
        grid exceeds that image's own grid (zero-pad path)."""
        from pim_jpeg_decoder_tpu.models.input_pipeline import (
            decode_batch_crops,
        )

        blobs, _ = self._blobs_boxes(photo_image, rng)
        boxes = [(10, 20), (30, 5), (3, 7), (0, 0)]
        out, _ = decode_batch_crops(blobs, boxes, (64, 64), lane_tile=128)
        host = np.asarray(out)
        for i, (b, (y0, x0)) in enumerate(zip(blobs, boxes)):
            np.testing.assert_array_equal(
                host[i],
                decode_bytes_oracle(b).rgb[y0:y0 + 64, x0:x0 + 64])

    def test_mode_mismatch_rejected(self, photo_image, rng):
        from pim_jpeg_decoder_tpu.models.input_pipeline import (
            decode_batch_crops,
        )

        a = encode_jpeg(photo_image, quality=85, sampling="4:2:0")
        b = encode_jpeg(photo_image, quality=85, sampling="4:4:4")
        with pytest.raises(JpegError, match="identical sampling"):
            decode_batch_crops([a, b], [(0, 0), (0, 0)], (32, 32),
                               lane_tile=128)

    def test_out_of_bounds_rejected(self, photo_image, rng):
        from pim_jpeg_decoder_tpu.models.input_pipeline import (
            decode_batch_crops,
        )

        blobs, _ = self._blobs_boxes(photo_image, rng)
        with pytest.raises(ValueError, match="outside"):
            decode_batch_crops(blobs, [(0, 0), (0, 0), (0, 0), (60, 60)],
                               (48, 56), lane_tile=128)

    def test_streaming_mixed(self, photo_image, rng):
        from pim_jpeg_decoder_tpu.models.input_pipeline import (
            decode_batch_crops,
            iter_decode_batch_crops,
        )

        blobs, boxes = self._blobs_boxes(photo_image, rng)
        batches = [(blobs[:2], boxes[:2]), (blobs[2:], boxes[2:])]
        streamed = list(iter_decode_batch_crops(
            batches, (48, 56), lane_tile=128, mixed_sizes=True))
        for (bl, bx), (out, _) in zip(batches, streamed):
            want, _ = decode_batch_crops(bl, bx, (48, 56), lane_tile=128)
            np.testing.assert_array_equal(np.asarray(out),
                                          np.asarray(want))

    def test_mixed_size_crops_match(self, photo_image, rng):
        """decode_batch_crops (mixed sizes) under the mesh equals the
        single-device program."""
        import io

        from PIL import Image

        from pim_jpeg_decoder_tpu.models.input_pipeline import (
            decode_batch_crops,
        )
        from pim_jpeg_decoder_tpu.parallel.mesh import make_mesh

        mesh8 = make_mesh(8)
        blobs, boxes = [], []
        for i, (w, h) in enumerate([(160, 120), (96, 200), (131, 77),
                                    (64, 64)]):
            img = np.array(Image.fromarray(photo_image).resize(
                (w, h), Image.BILINEAR))
            blobs.append(encode_jpeg(img, quality=80 + i, sampling="4:2:0"))
            boxes.append((int(rng.integers(0, h - 48 + 1)),
                          int(rng.integers(0, w - 56 + 1))))
        out, _ = decode_batch_crops(blobs, boxes, (48, 56), lane_tile=16,
                                    mesh=mesh8)
        want, _ = decode_batch_crops(blobs, boxes, (48, 56), lane_tile=16)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(want))
