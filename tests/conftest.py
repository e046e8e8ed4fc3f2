"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip behavior is tested without a TPU cluster via
``xla_force_host_platform_device_count`` (SURVEY.md section 4), the standard
JAX substitute for distributed tests.  Pallas kernels auto-select interpret
mode on CPU (see pim_jpeg_decoder_tpu.ops.decode_kernel).
"""

import os

# Must be set before jax initializes its backends.  The ambient axon plugin
# (the real TPU tunnel) overrides JAX_PLATFORMS, so force the platform via
# jax.config too; tests run on the virtual 8-device CPU mesh — bench.py
# exercises the hardware.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest
from PIL import Image


@pytest.fixture()
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def photo_image():
    """A smooth 'photographic' RGB test image (low-frequency content)."""
    small = np.random.default_rng(7).integers(0, 256, (15, 20, 3), dtype=np.uint8)
    return np.array(Image.fromarray(small).resize((160, 120), Image.BILINEAR))


@pytest.fixture(scope="session")
def noise_image():
    """A hard, high-frequency RGB test image."""
    return np.random.default_rng(8).integers(0, 256, (96, 88, 3), dtype=np.uint8)


@pytest.fixture(scope="session")
def ilsvrc_bytes():
    """The reference repo's bundled sample image, if available."""
    path = "/root/reference/ILSVRC2012_val_00000001.JPEG"
    if not os.path.exists(path):
        pytest.skip("reference sample image not available")
    with open(path, "rb") as f:
        return f.read()
