"""FLAC codec: roundtrips, a hand-built golden wire fixture (spec-derived,
NOT produced by our own encoder — catches matched encoder/decoder bugs the
self-roundtrip cannot), integrity-check tampering, and loud refusals."""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest

from lakehouse_sfc_spark.operators.flac import (
    _crc8,
    _crc16,
    decode_flac,
    encode_flac,
)


def test_roundtrip_shapes_and_values():
    rng = np.random.RandomState(11)
    for shape in [(1,), (100,), (4096,), (4097,), (9001,), (64, 2), (5000, 2)]:
        a = rng.randint(-30000, 30000, size=shape).astype(np.int16)
        rate, out = decode_flac(encode_flac(a, 22050))
        assert rate == 22050
        assert out.shape == a.shape
        assert (out == a).all()


def test_roundtrip_exercises_every_fixed_order():
    # constant -> CONSTANT; ramp -> order-1/2; sine -> higher orders
    for a in [
        np.full(5000, -7, dtype=np.int16),
        np.arange(-3000, 3000, dtype=np.int16),
        (1000 * np.sin(np.arange(10000) / 10.0)).astype(np.int16),
        np.cumsum(np.cumsum(np.ones(3000))).astype(np.int16),
    ]:
        assert (decode_flac(encode_flac(a))[1] == a).all()


def test_compresses_smooth_signals():
    a = (1000 * np.sin(np.arange(20000) / 20.0)).astype(np.int16)
    assert len(encode_flac(a)) < 0.4 * (2 * a.size)


def _golden_constant_stream() -> bytes:
    """Hand-assembled per RFC 9639: 4 mono 16-bit samples of value 1 at
    16 kHz, one fixed-blocksize frame, CONSTANT subframe."""
    samples = np.array([1, 1, 1, 1], dtype="<i2")
    # STREAMINFO: minblock=4096, maxblock=4096, min/max frame unknown,
    # then the 64-bit pack rate(20)|ch-1(3)|bps-1(5)|total(36)
    pack = (16000 << 44) | (0 << 41) | (15 << 36) | 4
    streaminfo = (
        struct.pack(">HH", 4096, 4096)
        + b"\x00\x00\x00" + b"\x00\x00\x00"
        + struct.pack(">Q", pack)
        + hashlib.md5(samples.tobytes()).digest()
    )
    header = b"fLaC" + bytes([0x80]) + struct.pack(">I", len(streaminfo))[1:]
    # frame header: sync(14)+res(1)+fixed(1) = FF F8; bs code 0110 (8-bit
    # at end) + sr code 0000 = 60; ch 0000 + bps 100 + res 0 = 08; frame
    # number 0; blocksize-1 = 03; CRC-8
    fh = bytearray(b"\xff\xf8\x60\x08\x00\x03")
    fh.append(_crc8(bytes(fh)))
    # subframe: pad 0 + type 000000 + wasted 0 = 00; constant value 1 (16b)
    frame = bytes(fh) + b"\x00\x00\x01"
    frame += struct.pack(">H", _crc16(frame))
    return header + streaminfo + frame


def test_golden_wire_fixture_decodes():
    rate, out = decode_flac(_golden_constant_stream())
    assert rate == 16000
    assert out.tolist() == [1, 1, 1, 1]


def test_tampering_trips_integrity_checks():
    good = bytearray(_golden_constant_stream())
    # flip the constant value: MD5 (or CRC-16) must catch it
    bad = bytearray(good)
    bad[-3] ^= 0x01
    with pytest.raises(ValueError):
        decode_flac(bytes(bad))
    # corrupt the frame-header CRC byte
    bad = bytearray(good)
    bad[4 + 4 + 34 + 6] ^= 0xFF
    with pytest.raises(ValueError, match="CRC-8"):
        decode_flac(bytes(bad))


def test_refusals_by_name():
    golden = _golden_constant_stream()
    meta_end = 4 + 4 + 34
    header_and_meta = golden[:meta_end]
    # mid-side channel assignment (ca=8) refused before subframe parse
    fh = b"\xff\xf8\x60" + bytes([(8 << 4) | (4 << 1)])
    with pytest.raises(NotImplementedError, match="mid-side"):
        decode_flac(header_and_meta + fh + b"\x00\x03\x00\x00\x00\x00\x00")
    # LPC subframe type refused by name
    fh2 = bytearray(b"\xff\xf8\x60\x08\x00\x03")
    fh2.append(_crc8(bytes(fh2)))
    with pytest.raises(NotImplementedError, match="LPC"):
        decode_flac(header_and_meta + bytes(fh2) + b"\x40\x00\x00\x00\x00")
    # wasted-bits flag refused by name
    with pytest.raises(NotImplementedError, match="wasted"):
        decode_flac(header_and_meta + bytes(fh2) + b"\x01\x00\x00\x00\x00")
    # 8-bit samples refused (STREAMINFO bps)
    si = bytearray(golden)
    # bps-1 lives in bits 36..40 of the 64-bit pack at offset 8+6 of
    # STREAMINFO: rewrite the pack with bps-1 = 7
    pack = (16000 << 44) | (0 << 41) | (7 << 36) | 4
    si[4 + 4 + 12 : 4 + 4 + 20] = struct.pack(">Q", pack)
    with pytest.raises(NotImplementedError, match="16-bit"):
        decode_flac(bytes(si))


def test_rice_escape_path():
    # white noise at full amplitude forces large residuals; the encoder
    # may pick the verbatim-escape partition — roundtrip must still hold
    rng = np.random.RandomState(3)
    a = rng.randint(-32768, 32767, size=6000).astype(np.int16)
    assert (decode_flac(encode_flac(a))[1] == a).all()


def test_rice_escape_fires_on_encode():
    # the ENCODER must actually take the k=15 escape branch (not just
    # survive it on decode): max-amplitude alternation makes every fixed
    # order's mean |residual| >= 2^14, so _rice_param returns 15 and the
    # subframe is written as unencoded fixed-width residuals
    from lakehouse_sfc_spark.operators.flac import _fixed_residual, _rice_param

    a = np.tile(np.array([32767, -32768], dtype=np.int16), 3000)
    ks = [
        _rice_param(_fixed_residual([int(x) for x in a[:4096]], o))
        for o in range(5)
    ]
    assert min(ks) == 15  # every candidate order escapes
    assert (decode_flac(encode_flac(a))[1] == a).all()


def test_vectorized_paths_adversarial_roundtrip():
    """Edge cases aimed at the round-11 vectorized kernels: k=0 Rice
    partitions (near-constant), escape-width residuals (alternating
    extremes), all-zero residuals (perfect ramps), one huge unary
    quotient (outlier in a smooth signal), and block-boundary sizes."""
    import numpy as np

    from lakehouse_sfc_spark.operators.flac import decode_flac, encode_flac

    rng = np.random.default_rng(123)
    cases = [(rng.integers(0, 2, 10000) + 100).astype(np.int16)]
    alt = np.empty(8192, np.int16)
    alt[::2], alt[1::2] = 32767, -32768
    cases.append(alt)
    cases.append(np.arange(-5000, 5000, dtype=np.int16))
    smooth = (1000 * np.sin(np.arange(9000) / 30)).astype(np.int16)
    smooth[4567] = 32767
    cases.append(smooth)
    for n in (4095, 4096, 4097, 1, 2, 5):
        cases.append(rng.integers(-300, 300, n).astype(np.int16))
    for i, a in enumerate(cases):
        assert (decode_flac(encode_flac(a))[1] == a).all(), f"case {i} mono"
        b = np.stack([a, a[::-1].copy()], axis=1)
        out = decode_flac(encode_flac(b, 8000))[1]
        assert (out == b).all(), f"case {i} stereo"


def test_truncated_payload_raises_contracted_error_never_indexerror():
    """ADVICE r11: a payload cut mid-Rice-remainder used to let the unary
    pointer walk run past the ones sentinel (IndexError). Every truncation
    point must surface the codec's contracted ValueError (or a struct
    error from the fixed headers), never an IndexError."""
    rng = np.random.RandomState(7)
    a = rng.randint(-3000, 3000, size=600).astype(np.int16)
    blob = encode_flac(a, 8000)
    # dense sample of cut points through the frame payload region
    for cut in range(len(blob) - 1, 42, -7):
        with pytest.raises((ValueError, struct.error, NotImplementedError)):
            decode_flac(blob[:cut])
