"""Radiance .hdr round-trip tests."""

import numpy as np

from complex_materials_renderer_tpu.io import read_hdr, write_hdr
from complex_materials_renderer_tpu.io.hdr import float_to_rgbe, rgbe_to_float


def test_rgbe_roundtrip_accuracy():
    rng = np.random.default_rng(7)
    img = (rng.random((16, 32, 3)) * 10.0).astype(np.float32)
    back = rgbe_to_float(float_to_rgbe(img))
    # RGBE shares one exponent: the byte step is max/(mantissa*256) with
    # mantissa in [0.5, 1), so at worst max/128; rounding halves it.
    step = img.max(axis=-1, keepdims=True) / 128.0
    assert np.all(np.abs(back - img) <= 0.5 * step + 1e-6)


def test_rgbe_zero_and_tiny():
    img = np.array([[[0.0, 0.0, 0.0], [1e-38, 0.0, 0.0]]], np.float32)
    back = rgbe_to_float(float_to_rgbe(img))
    np.testing.assert_array_equal(back[0, 0], 0.0)


def test_write_read_rle(tmp_path):
    rng = np.random.default_rng(8)
    img = (rng.random((24, 64, 3)) * 5.0).astype(np.float32)
    # Insert constant runs to exercise RLE.
    img[:, 10:30] = 1.25
    img[5, :] = 0.0
    path = str(tmp_path / "test.hdr")
    write_hdr(path, img)
    back = read_hdr(path)
    assert back.shape == img.shape
    step = img.max(axis=-1, keepdims=True) / 128.0
    assert np.all(np.abs(back - img) <= 0.5 * step + 1e-6)


def test_write_read_flat_narrow(tmp_path):
    # Width < 8 writes flat scanlines.
    img = np.ones((4, 4, 3), np.float32) * 2.5
    path = str(tmp_path / "narrow.hdr")
    write_hdr(path, img)
    back = read_hdr(path)
    np.testing.assert_allclose(back, img, rtol=0.01)


def test_write_accepts_rgba(tmp_path):
    img = np.ones((4, 16, 4), np.float32)
    path = str(tmp_path / "rgba.hdr")
    write_hdr(path, img)
    back = read_hdr(path)
    assert back.shape == (4, 16, 3)
