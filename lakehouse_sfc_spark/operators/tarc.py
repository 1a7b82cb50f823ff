"""Real ustar TAR + gzip container codecs, pure Python at struct level.

The ``.tar.gz`` shard is the lingua franca of web-scale training-data
distribution (WebDataset, CommonCrawl derivatives ship exactly this
shape), so the engine owns the container: POSIX ustar 512-byte headers
with octal fields and checksum verification, and the RFC 1952 gzip
member framing (magic/flags/MTIME header, raw DEFLATE via stdlib zlib —
the same boundary as operators/multimodal.encode_png — CRC-32 + ISIZE
trailer, both verified on decode).

Refused loudly by name: GNU long-name entries (typeflag L/K), PAX
extended headers (x/g), hard/symlinks, sparse files, multi-member gzip —
each a real feature we will not silently mis-extract.  The pytest suite
pins the wire format against the independent stdlib ``tarfile`` and
``gzip`` modules in BOTH directions.
"""

from __future__ import annotations

import struct
import zlib

_BLOCK = 512


def _octal(n: int, width: int) -> bytes:
    return b"%0*o\x00" % (width - 1, n)


def _tar_header(name: str, size: int) -> bytes:
    nb = name.encode("utf-8")
    if len(nb) > 100:
        raise ValueError(f"tar name longer than 100 bytes: {name!r}")
    h = bytearray(_BLOCK)
    h[0 : len(nb)] = nb
    h[100:108] = _octal(0o644, 8)  # mode
    h[108:116] = _octal(0, 8)  # uid
    h[116:124] = _octal(0, 8)  # gid
    h[124:136] = _octal(size, 12)
    h[136:148] = _octal(0, 12)  # mtime: deterministic epoch
    h[148:156] = b" " * 8  # checksum placeholder (spaces, per spec)
    h[156] = ord("0")  # regular file
    h[257:263] = b"ustar\x00"
    h[263:265] = b"00"
    chksum = sum(h)
    h[148:156] = b"%06o\x00 " % chksum
    return bytes(h)


def encode_tar(entries: list[tuple[str, bytes]]) -> bytes:
    """[(name, data)] → POSIX ustar archive (regular files only)."""
    out = bytearray()
    for name, data in entries:
        out += _tar_header(name, len(data))
        out += data
        pad = (-len(data)) % _BLOCK
        out += b"\x00" * pad
    out += b"\x00" * (2 * _BLOCK)  # end-of-archive marker
    return bytes(out)


def _parse_octal(field: bytes) -> int:
    s = field.split(b"\x00", 1)[0].strip()
    return int(s or b"0", 8)


def decode_tar(payload: bytes) -> list[tuple[str, bytes]]:
    """ustar archive → [(name, data)], header checksums verified."""
    out: list[tuple[str, bytes]] = []
    pos = 0
    while pos + _BLOCK <= len(payload):
        h = payload[pos : pos + _BLOCK]
        if h == b"\x00" * _BLOCK:  # end-of-archive
            break
        magic = h[257:263]
        if magic not in (b"ustar\x00", b"ustar "):
            raise ValueError(f"tar: bad magic {magic!r} at offset {pos}")
        stored = _parse_octal(h[148:156])
        actual = sum(h[:148]) + 8 * 0x20 + sum(h[156:])
        if stored != actual:
            raise ValueError(f"tar: header checksum mismatch at {pos}")
        typeflag = chr(h[156]) if h[156] else "0"
        name = h[:100].split(b"\x00", 1)[0].decode("utf-8")
        if typeflag in ("L", "K"):
            raise NotImplementedError(
                "GNU tar long-name/long-link entries not supported"
            )
        if typeflag in ("x", "g"):
            raise NotImplementedError(
                "PAX extended headers not supported (use ustar format)"
            )
        if typeflag in ("1", "2"):
            raise NotImplementedError(
                f"tar hard/symlink entry {name!r} not supported"
            )
        if typeflag == "S":
            raise NotImplementedError("GNU sparse files not supported")
        size = _parse_octal(h[124:136])
        data = payload[pos + _BLOCK : pos + _BLOCK + size]
        if len(data) != size:
            raise ValueError(f"tar: truncated member {name!r}")
        if typeflag in ("0",):
            out.append((name, data))
        elif typeflag == "5":
            pass  # directory entry: no data
        else:
            raise NotImplementedError(
                f"tar typeflag {typeflag!r} not supported"
            )
        pos += _BLOCK + size + ((-size) % _BLOCK)
    else:
        raise ValueError("tar: missing end-of-archive marker")
    return out


def encode_gzip(data: bytes) -> bytes:
    """RFC 1952 gzip member: deterministic header (MTIME 0, OS 255),
    raw DEFLATE body, CRC-32 + ISIZE trailer."""
    c = zlib.compressobj(6, zlib.DEFLATED, -15)
    body = c.compress(data) + c.flush()
    header = struct.pack("<4BIBB", 0x1F, 0x8B, 8, 0, 0, 0, 255)
    trailer = struct.pack(
        "<II", zlib.crc32(data) & 0xFFFFFFFF, len(data) & 0xFFFFFFFF
    )
    return header + body + trailer


def decode_gzip(payload: bytes) -> bytes:
    """gzip member → bytes, CRC-32 and ISIZE verified; FLG extensions
    (FEXTRA/FNAME/FCOMMENT/FHCRC) are parsed and skipped per spec."""
    if payload[:2] != b"\x1f\x8b":
        raise ValueError("not a gzip payload")
    if payload[2] != 8:
        raise NotImplementedError(
            f"gzip compression method {payload[2]} not supported "
            "(deflate only)"
        )
    flg = payload[3]
    pos = 10
    if flg & 0x04:  # FEXTRA
        xlen = struct.unpack("<H", payload[pos : pos + 2])[0]
        pos += 2 + xlen
    if flg & 0x08:  # FNAME
        pos = payload.index(b"\x00", pos) + 1
    if flg & 0x10:  # FCOMMENT
        pos = payload.index(b"\x00", pos) + 1
    if flg & 0x02:  # FHCRC
        pos += 2
    d = zlib.decompressobj(-15)
    data = d.decompress(payload[pos:]) + d.flush()
    if len(d.unused_data) > 8:
        raise NotImplementedError(
            "multi-member gzip streams not supported"
        )
    trailer = payload[len(payload) - 8 :] if not d.unused_data else (
        d.unused_data[:8]
    )
    crc, isize = struct.unpack("<II", trailer)
    if zlib.crc32(data) & 0xFFFFFFFF != crc:
        raise ValueError("gzip: CRC-32 mismatch")
    if len(data) & 0xFFFFFFFF != isize:
        raise ValueError("gzip: ISIZE mismatch")
    return data


def encode_targz(entries: list[tuple[str, bytes]]) -> bytes:
    return encode_gzip(encode_tar(entries))


def decode_targz(payload: bytes) -> list[tuple[str, bytes]]:
    return decode_tar(decode_gzip(payload))
