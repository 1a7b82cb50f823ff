"""Real ZIP container codec (PKWARE APPNOTE), pure Python at struct level.

Scope — the honest archival subset:

- writer: local file headers + central directory + end-of-central-
  directory, methods 0 (store) and 8 (raw DEFLATE via stdlib zlib — the
  same boundary as operators/multimodal.encode_png), CRC-32 per member,
  deterministic DOS timestamps,
- reader: EOCD located by backward signature scan (the spec's rule: the
  central directory is authoritative, never the local headers), central
  directory walk, local-header re-validation, inflate/store extraction
  with CRC-32 and size verification.

Refused loudly by name: encryption (general-purpose flag bit 0), data
descriptors (bit 3 — sizes live after the data), ZIP64 (0xFFFFFFFF
sentinels), and any compression method other than store/deflate; each is
a real ZIP feature we will not silently mis-extract.

The pytest suite cross-checks against the stdlib ``zipfile`` module in
BOTH directions (their writer → our reader, our writer → their reader),
so the wire format is pinned by an independent implementation, not a
self-roundtrip.
"""

from __future__ import annotations

import struct
import zlib

_LOCAL_SIG = b"PK\x03\x04"
_CDIR_SIG = b"PK\x01\x02"
_EOCD_SIG = b"PK\x05\x06"

# deterministic DOS timestamp: 1980-01-01 00:00:00 (the DOS epoch)
_DOS_TIME = 0
_DOS_DATE = (0 << 9) | (1 << 5) | 1

STORE = 0
DEFLATE = 8


def encode_zip(entries: list[tuple[str, bytes, int]]) -> bytes:
    """[(name, data, method)] → ZIP archive.  method is STORE or DEFLATE."""
    out = bytearray()
    central = bytearray()
    for name, data, method in entries:
        if method not in (STORE, DEFLATE):
            raise ValueError(f"unsupported ZIP method {method}")
        nb = name.encode("utf-8")
        crc = zlib.crc32(data) & 0xFFFFFFFF
        if method == DEFLATE:
            c = zlib.compressobj(6, zlib.DEFLATED, -15)  # raw deflate
            blob = c.compress(data) + c.flush()
        else:
            blob = data
        offset = len(out)
        local = struct.pack(
            "<4sHHHHHIIIHH",
            _LOCAL_SIG,
            20,  # version needed
            0,  # flags: no encryption, no data descriptor
            method,
            _DOS_TIME,
            _DOS_DATE,
            crc,
            len(blob),
            len(data),
            len(nb),
            0,  # extra length
        )
        out += local + nb + blob
        central += struct.pack(
            "<4sHHHHHHIIIHHHHHII",
            _CDIR_SIG,
            20,  # version made by
            20,  # version needed
            0,  # flags
            method,
            _DOS_TIME,
            _DOS_DATE,
            crc,
            len(blob),
            len(data),
            len(nb),
            0,  # extra
            0,  # comment
            0,  # disk number start
            0,  # internal attrs
            0,  # external attrs
            offset,
        ) + nb
    cd_offset = len(out)
    out += central
    out += struct.pack(
        "<4sHHHHIIH",
        _EOCD_SIG,
        0,  # this disk
        0,  # cd disk
        len(entries),
        len(entries),
        len(central),
        cd_offset,
        0,  # comment length
    )
    return bytes(out)


def _find_eocd(payload: bytes) -> int:
    """Backward scan for the EOCD signature (it may be followed by a
    comment up to 64 KiB)."""
    lo = max(0, len(payload) - 22 - 0xFFFF)
    pos = payload.rfind(_EOCD_SIG, lo)
    if pos < 0:
        raise ValueError("ZIP: end-of-central-directory record not found")
    return pos


def decode_zip(payload: bytes) -> list[tuple[str, bytes]]:
    """ZIP archive → [(name, data)], central-directory-driven, with
    CRC-32 + size verification per member."""
    eocd = _find_eocd(payload)
    (
        _sig, disk, cd_disk, n_disk, n_total, cd_size, cd_offset, _clen
    ) = struct.unpack("<4sHHHHIIH", payload[eocd : eocd + 22])
    if disk or cd_disk:
        raise NotImplementedError("multi-disk ZIP archives not supported")
    if n_total == 0xFFFF or cd_offset == 0xFFFFFFFF:
        raise NotImplementedError("ZIP64 archives not supported")
    out: list[tuple[str, bytes]] = []
    pos = cd_offset
    for _ in range(n_total):
        if payload[pos : pos + 4] != _CDIR_SIG:
            raise ValueError("ZIP: bad central-directory signature")
        (
            _s, _vmade, _vneed, flags, method, _t, _d, crc, csize, usize,
            nlen, elen, clen, _dn, _ia, _ea, offset,
        ) = struct.unpack("<4sHHHHHHIIIHHHHHII", payload[pos : pos + 46])
        name = payload[pos + 46 : pos + 46 + nlen].decode("utf-8")
        pos += 46 + nlen + elen + clen
        if flags & 0x1:
            raise NotImplementedError(
                f"ZIP member {name!r} is encrypted (flag bit 0) — "
                "encryption not supported"
            )
        if flags & 0x8:
            raise NotImplementedError(
                f"ZIP member {name!r} uses a data descriptor (flag bit "
                "3, streaming writer) — sizes after data not supported"
            )
        if csize == 0xFFFFFFFF or usize == 0xFFFFFFFF or offset == 0xFFFFFFFF:
            raise NotImplementedError("ZIP64 member sizes not supported")
        if method not in (STORE, DEFLATE):
            raise NotImplementedError(
                f"ZIP compression method {method} not supported "
                "(store/deflate only; 12=bzip2, 14=lzma, 93=zstd need "
                "their own codecs)"
            )
        # local header re-validation (name/extra lengths may differ here)
        if payload[offset : offset + 4] != _LOCAL_SIG:
            raise ValueError(f"ZIP member {name!r}: bad local header")
        l_nlen, l_elen = struct.unpack(
            "<HH", payload[offset + 26 : offset + 30]
        )
        data_start = offset + 30 + l_nlen + l_elen
        blob = payload[data_start : data_start + csize]
        if len(blob) != csize:
            raise ValueError(f"ZIP member {name!r}: truncated data")
        if method == DEFLATE:
            d = zlib.decompressobj(-15)
            data = d.decompress(blob) + d.flush()
        else:
            data = blob
        if len(data) != usize:
            raise ValueError(
                f"ZIP member {name!r}: size mismatch "
                f"({len(data)} != {usize})"
            )
        if zlib.crc32(data) & 0xFFFFFFFF != crc:
            raise ValueError(f"ZIP member {name!r}: CRC-32 mismatch")
        out.append((name, data))
    return out
