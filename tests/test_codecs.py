"""Image codec unit tests (no Spark)."""

import numpy as np
import pytest

from osm_read_enhanced_spark.functions import codecs

rng = np.random.default_rng(42)


@pytest.mark.parametrize("fmt", ["ppm", "bmp", "png"])
def test_lossless_roundtrip(fmt):
    for shape in [(8, 8, 3), (33, 47, 3), (1, 5, 3)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        assert np.array_equal(codecs.decode_image(codecs.encode_image(img, fmt), fmt), img)


def test_dct_psnr_bound_noise():
    img = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    out = codecs.decode_image(codecs.encode_image(img, "dct"), "dct")
    assert codecs.psnr(img, out) >= 40.0
    assert out.shape == img.shape


def test_dct_psnr_smooth():
    smooth = np.tile(np.linspace(0, 255, 64, dtype=np.uint8)[None, :, None], (48, 1, 3))
    out = codecs.decode_image(codecs.encode_image(smooth, "dct"), "dct")
    assert codecs.psnr(smooth, out) >= 45.0


def test_psnr_identical_inf():
    img = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    assert codecs.psnr(img, img) == float("inf")


def test_phash_properties():
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    h1 = codecs.phash64(img)
    assert h1 == codecs.phash64(img.copy())  # deterministic
    # small brightness shift → small hamming distance
    shifted = np.clip(img.astype(int) + 4, 0, 255).astype(np.uint8)
    d_small = bin(np.uint64(h1) ^ np.uint64(codecs.phash64(shifted))).count("1")
    other = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    d_other = bin(np.uint64(h1) ^ np.uint64(codecs.phash64(other))).count("1")
    assert d_small < d_other


def test_resize_nearest():
    img = rng.integers(0, 256, (40, 60, 3), dtype=np.uint8)
    out = codecs.resize_nearest(img, 10, 15)
    assert out.shape == (10, 15, 3)


def test_decode_errors():
    with pytest.raises(ValueError):
        codecs.decode_ppm(b"nope")
    with pytest.raises(ValueError):
        codecs.decode_png(b"nope")
    with pytest.raises(ValueError):
        codecs.decode_bmp(b"nope")
    with pytest.raises(ValueError):
        codecs.decode_dct(b"nope")
