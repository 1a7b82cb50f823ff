"""ZIP container codec, cross-checked against the INDEPENDENT stdlib
``zipfile`` implementation in both directions — interop, not self-
roundtrip — plus integrity and refusal paths."""

from __future__ import annotations

import io
import struct
import zipfile

import pytest

from lakehouse_sfc_spark.operators.zipc import (
    DEFLATE,
    STORE,
    decode_zip,
    encode_zip,
)

_MEMBERS = [
    ("a.txt", b"hello zip world " * 40, DEFLATE),
    ("dir/b.bin", bytes(range(256)) * 3, STORE),
    ("empty", b"", STORE),
    ("c.dat", b"\x00" * 5000, DEFLATE),
]


def test_roundtrip():
    got = decode_zip(encode_zip(_MEMBERS))
    assert got == [(n, d) for n, d, _ in _MEMBERS]


def test_our_writer_read_by_stdlib_zipfile():
    blob = encode_zip(_MEMBERS)
    with zipfile.ZipFile(io.BytesIO(blob)) as z:
        assert z.testzip() is None  # every CRC verifies
        assert z.namelist() == [n for n, _, _ in _MEMBERS]
        for n, d, _ in _MEMBERS:
            assert z.read(n) == d


def test_stdlib_zipfile_read_by_our_decoder():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("x.txt", b"alpha " * 100,
                   compress_type=zipfile.ZIP_DEFLATED)
        z.writestr("y.bin", bytes(range(200)),
                   compress_type=zipfile.ZIP_STORED)
    got = dict(decode_zip(buf.getvalue()))
    assert got == {"x.txt": b"alpha " * 100, "y.bin": bytes(range(200))}


def test_eocd_found_past_archive_comment():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("m", b"data")
        z.comment = b"trailing archive comment, 40 bytes long!"
    assert dict(decode_zip(buf.getvalue())) == {"m": b"data"}


def test_crc_tamper_detected():
    blob = bytearray(encode_zip([("f", b"abcdef", STORE)]))
    blob[blob.index(b"abcdef")] ^= 0xFF
    with pytest.raises(ValueError, match="CRC-32"):
        decode_zip(bytes(blob))


def test_refusals_by_name():
    blob = bytearray(encode_zip([("f", b"abcdef", STORE)]))
    cd = blob.index(b"PK\x01\x02")
    # encryption flag (bit 0) in the central directory entry
    enc = bytearray(blob)
    enc[cd + 8] |= 0x1
    with pytest.raises(NotImplementedError, match="encrypt"):
        decode_zip(bytes(enc))
    # data-descriptor flag (bit 3)
    dd = bytearray(blob)
    dd[cd + 8] |= 0x8
    with pytest.raises(NotImplementedError, match="data descriptor"):
        decode_zip(bytes(dd))
    # exotic compression method (93 = zstd)
    zs = bytearray(blob)
    struct.pack_into("<H", zs, cd + 10, 93)
    with pytest.raises(NotImplementedError, match="method 93"):
        decode_zip(bytes(zs))
    # ZIP64 sentinel in the member offset
    z64 = bytearray(blob)
    struct.pack_into("<I", z64, cd + 42, 0xFFFFFFFF)
    with pytest.raises(NotImplementedError, match="ZIP64"):
        decode_zip(bytes(z64))
