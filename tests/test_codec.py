"""Codec round-trip + PSNR invariants (BASELINE.json: PSNR >= 40 dB lossy)."""

import numpy as np
import pytest

from raygeo import codec
from raygeo.fixtures import pixels_of, thumbnail


@pytest.mark.parametrize("shape", [(32, 32), (48, 64), (128, 128), (17, 23)])
def test_lossless_roundtrip(shape):
    rng = np.random.Generator(np.random.PCG64(7))
    img = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
    for fmt in ("raw", "pngz"):
        out = codec.decode(codec.encode(img, fmt))
        assert np.array_equal(out, img), fmt


@pytest.mark.parametrize("shape", [(32, 32), (48, 64), (128, 128), (17, 23)])
def test_dctq_psnr(shape):
    rng = np.random.Generator(np.random.PCG64(9))
    img = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
    out = codec.decode(codec.encode(img, "dctq"))
    assert out.shape == img.shape
    assert codec.psnr(img, out) >= 40.0


def test_dctq_deterministic():
    img = pixels_of("img-00000042", 64, 48)
    b1 = codec.encode(img, "dctq")
    b2 = codec.encode(img, "dctq")
    assert b1 == b2
    assert np.array_equal(codec.decode(b1), codec.decode(b2))


def test_fixture_pixels_deterministic():
    a = pixels_of("img-00000001", 64, 32)
    b = pixels_of("img-00000001", 64, 32)
    assert np.array_equal(a, b)
    assert not np.array_equal(a[:32, :32], pixels_of("img-00000002", 32, 32))


def test_thumbnail_shapes():
    img = pixels_of("img-00000003", 128, 48)
    t = thumbnail(img)
    assert t.shape == (16, 16, 3)
