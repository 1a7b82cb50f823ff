"""Baseline JPEG codec (operators/jpeg.py): round-trip fidelity, marker
handling, unsupported-feature rejection, and cross-kernel dispatch."""

from __future__ import annotations

import numpy as np
import pytest

from lakehouse_sfc_spark.operators.jpeg import decode_jpeg, encode_jpeg
from lakehouse_sfc_spark.operators.multimodal import _synth_pixels, decode_image


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def test_roundtrip_smooth_rgb_high_fidelity():
    y, x = np.mgrid[0:48, 0:64]
    px = np.stack(
        [(x * 3) % 256, (y * 4) % 256, ((x + y) * 2) % 256], axis=-1
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(px, quality=90))
    assert out.shape == px.shape
    assert _psnr(px, out) > 40


def test_roundtrip_noise_and_gray():
    rng = np.random.default_rng(3)
    noise = rng.integers(0, 256, size=(33, 41, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(noise, quality=95))
    assert out.shape == noise.shape
    assert _psnr(noise, out) > 30  # noise is the worst case for DCT coding

    gray = rng.integers(0, 256, size=(17, 23), dtype=np.uint8)
    gout = decode_jpeg(encode_jpeg(gray, quality=95))
    assert gout.shape == gray.shape
    assert _psnr(gray, gout) > 35


def test_non_multiple_of_8_and_tiny_images():
    rng = np.random.default_rng(9)
    for shape in [(1, 1, 3), (7, 9, 3), (8, 8, 3), (9, 8), (3, 3)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(px, quality=92))
        assert out.shape == px.shape


def test_quality_tradeoff_monotone():
    y, x = np.mgrid[0:32, 0:32]
    px = np.stack([x * 8, y * 8, (x + y) * 4], axis=-1).astype(np.uint8)
    lo = encode_jpeg(px, quality=20)
    hi = encode_jpeg(px, quality=95)
    assert len(lo) < len(hi)
    assert _psnr(px, decode_jpeg(lo)) < _psnr(px, decode_jpeg(hi))


def test_deterministic_and_registry_grid_fidelity():
    px = _synth_pixels(7, 23, 15)
    b1, b2 = encode_jpeg(px, 90), encode_jpeg(px, 90)
    assert b1 == b2
    assert _psnr(px, decode_jpeg(b1)) > 45  # the registry flag uses >= 30


def test_rejects_unsupported_features():
    with pytest.raises(ValueError):
        decode_jpeg(b"NOPE")
    good = bytearray(encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8)))
    # flip SOF0 -> SOF2 (progressive)
    i = bytes(good).find(b"\xff\xc0")
    prog = good[:i] + b"\xff\xc2" + good[i + 2 :]
    with pytest.raises(NotImplementedError, match="baseline"):
        decode_jpeg(bytes(prog))


def test_decode_image_dispatches_jpeg():
    px = _synth_pixels(3, 16, 8)
    out = decode_image(encode_jpeg(px, 90))
    assert out.shape == px.shape
