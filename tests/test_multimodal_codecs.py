"""Native codec tests: uncompressed BMP and PCM-16 WAV round-trips, real
nearest-neighbor resize, and the format-sniffing ``decode_real_batches``
kernel end-to-end through ``mapInPandas`` over a binary column."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from lakehouse_sfc_spark.operators.multimodal import (
    DECODED_SCHEMA,
    decode_audio,
    decode_bmp,
    decode_image,
    decode_real_batches,
    decode_wav,
    encode_bmp,
    encode_wav_pcm16,
    resize_bmp,
)


def _gradient(h: int, w: int) -> np.ndarray:
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [(x * 7) % 256, (y * 11) % 256, (x + y) % 256], axis=-1
    ).astype(np.uint8)


def test_bmp_roundtrip_exact():
    for h, w in [(1, 1), (3, 5), (16, 16), (7, 13)]:  # odd widths hit padding
        px = _gradient(h, w)
        assert np.array_equal(decode_bmp(encode_bmp(px)), px)


def test_bmp_rejects_unsupported():
    with pytest.raises(ValueError):
        decode_bmp(b"NOPE....")
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n\x1a\n....")


def test_wav_roundtrip_exact():
    mono = (np.sin(np.linspace(0, 20, 500)) * 20000).astype(np.int16)
    rate, out = decode_wav(encode_wav_pcm16(mono, 8000))
    assert rate == 8000
    assert np.array_equal(out, mono)

    stereo = np.stack([mono, -mono], axis=1)
    rate, out = decode_wav(encode_wav_pcm16(stereo, 44100))
    assert rate == 44100
    assert out.shape == (500, 2)
    assert np.array_equal(out, stereo)


def test_wav_tolerates_extra_chunks():
    mono = np.arange(-50, 50, dtype=np.int16)
    raw = encode_wav_pcm16(mono, 16000)
    # splice a LIST chunk between fmt and data (odd size exercises padding)
    head, rest = raw[:36], raw[36:]
    extra = b"LIST" + (5).to_bytes(4, "little") + b"INFOx" + b"\x00"
    spliced = (
        raw[:4]
        + (len(raw) - 8 + len(extra)).to_bytes(4, "little")
        + head[8:]
        + extra
        + rest
    )
    rate, out = decode_wav(spliced)
    assert rate == 16000
    assert np.array_equal(out, mono)
    assert decode_audio(spliced)[0] == 16000


def test_resize_bmp_nearest_neighbor():
    px = _gradient(8, 12)
    out = decode_bmp(resize_bmp(encode_bmp(px), out_w=6, out_h=4))
    assert out.shape == (4, 6, 3)
    # nearest-neighbor: every output pixel is an exact input pixel
    yi = np.arange(4) * 8 // 4
    xi = np.arange(6) * 12 // 6
    assert np.array_equal(out, px[yi][:, xi])


def test_decode_real_batches_in_spark(spark):
    bmp = encode_bmp(_gradient(9, 7))
    wav = encode_wav_pcm16(np.arange(300, dtype=np.int16), 16000)
    other = b"\x00\x01\x02unknown-codec"
    rows = [
        (1, bytearray(bmp), 0, 0),
        (2, bytearray(wav), 0, 0),
        (3, bytearray(other), 640, 480),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, payload binary, width int, height int"
    )
    got = {
        r["doc_id"]: r
        for r in df.mapInPandas(decode_real_batches, DECODED_SCHEMA).collect()
    }
    assert got[1]["width"] == 7 and got[1]["height"] == 9
    assert got[1]["frames"] == 1
    assert got[2]["frames"] == 300
    assert got[3]["width"] == 640 and got[3]["frames"] == 0
    for doc_id, payload, _, _ in rows:
        assert got[doc_id]["checksum"] == hashlib.md5(bytes(payload)).hexdigest()
        assert got[doc_id]["n_bytes"] == len(payload)


def test_real_codec_registry_queries(spark):
    """The oracle-paired real-codec queries: every output column is a
    closed-form function of doc_id, recomputed here independently."""
    from lakehouse_sfc_spark.queries.registry import QUERIES

    sf = "/root/testdata/sf0.001"
    img = {
        r["doc_id"]: r
        for r in QUERIES["multimodal_decode_real"].fn(spark, sf).collect()
    }
    assert len(img) > 0
    for d, r in img.items():
        w, h = 16 + d % 17, 8 + d % 13
        assert (r["width"], r["height"], r["frames"]) == (w, h, 1)
        assert r["n_bytes"] == 54 + ((w * 3 + 3) & ~3) * h
        expect = sum(
            3 * ((3 * x + 7 * y + d) % 251) for x in range(w) for y in range(h)
        )
        assert r["pixel_sum"] == expect

    aud = {
        r["doc_id"]: r
        for r in QUERIES["multimodal_audio_real"].fn(spark, sf).collect()
    }
    assert len(aud) > 0
    for d, r in aud.items():
        n = 400 + d % 257
        assert (r["sample_rate"], r["n_samples"]) == (16000, n)
        assert r["duration_s"] == n / 16000.0
        assert r["sum_samples"] == sum(
            (7 * d + 13 * i) % 4001 - 2000 for i in range(n)
        )
