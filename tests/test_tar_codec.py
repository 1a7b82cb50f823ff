"""ustar TAR + gzip codecs, cross-checked against the INDEPENDENT stdlib
``tarfile`` / ``gzip`` implementations in both directions, plus integrity
and refusal paths."""

from __future__ import annotations

import gzip
import io
import tarfile

import pytest

from lakehouse_sfc_spark.operators.tarc import (
    decode_gzip,
    decode_tar,
    decode_targz,
    encode_gzip,
    encode_tar,
    encode_targz,
)

_MEMBERS = [
    ("shard/000.txt", b"the quick brown fox " * 30),
    ("shard/001.bin", bytes(range(256)) * 2),
    ("empty.dat", b""),
]


def test_tar_roundtrip():
    assert decode_tar(encode_tar(_MEMBERS)) == _MEMBERS


def test_targz_roundtrip():
    assert decode_targz(encode_targz(_MEMBERS)) == _MEMBERS


def test_our_tar_read_by_stdlib_tarfile():
    blob = encode_tar(_MEMBERS)
    with tarfile.open(fileobj=io.BytesIO(blob)) as t:
        assert t.getnames() == [n for n, _ in _MEMBERS]
        for n, d in _MEMBERS:
            assert t.extractfile(n).read() == d


def test_stdlib_tarfile_read_by_our_decoder():
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w",
                      format=tarfile.USTAR_FORMAT) as t:
        for n, d in _MEMBERS:
            info = tarfile.TarInfo(n)
            info.size = len(d)
            t.addfile(info, io.BytesIO(d))
    assert decode_tar(buf.getvalue()) == _MEMBERS


def test_gzip_interop_both_directions():
    data = b"gzip interop payload " * 100
    # ours -> stdlib
    assert gzip.decompress(encode_gzip(data)) == data
    # stdlib -> ours (stdlib sets FNAME/MTIME; decoder must skip them)
    buf = io.BytesIO()
    with gzip.GzipFile("some-name.txt", "wb", fileobj=buf) as g:
        g.write(data)
    assert decode_gzip(buf.getvalue()) == data


def test_tar_checksum_tamper_detected():
    blob = bytearray(encode_tar(_MEMBERS))
    blob[0] ^= 0xFF  # corrupt the first name byte; checksum must trip
    with pytest.raises(ValueError, match="checksum"):
        decode_tar(bytes(blob))


def test_gzip_crc_tamper_detected():
    blob = bytearray(encode_gzip(b"abcdef" * 50))
    blob[-8] ^= 0xFF  # stored CRC
    with pytest.raises(ValueError, match="CRC-32"):
        decode_gzip(bytes(blob))


def test_refusals_by_name():
    # PAX format (stdlib default) refused by name
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w",
                      format=tarfile.PAX_FORMAT) as t:
        info = tarfile.TarInfo("x" * 120)  # forces an extended header
        info.size = 1
        t.addfile(info, io.BytesIO(b"z"))
    with pytest.raises(NotImplementedError, match="PAX"):
        decode_tar(buf.getvalue())
    # GNU long names refused by name
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w",
                      format=tarfile.GNU_FORMAT) as t:
        info = tarfile.TarInfo("y" * 120)
        info.size = 1
        t.addfile(info, io.BytesIO(b"z"))
    with pytest.raises(NotImplementedError, match="long-name"):
        decode_tar(buf.getvalue())
    # symlinks refused by name
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w",
                      format=tarfile.USTAR_FORMAT) as t:
        info = tarfile.TarInfo("link")
        info.type = tarfile.SYMTYPE
        info.linkname = "target"
        t.addfile(info)
    with pytest.raises(NotImplementedError, match="symlink"):
        decode_tar(buf.getvalue())
    # writer refuses >100-byte names instead of truncating
    with pytest.raises(ValueError, match="100"):
        encode_tar([("n" * 150, b"")])
