"""Pure-python baseline TIFF codec: uncompressed (Compression=1) grayscale
and RGB, both byte orders, multi-strip.

TIFF was the named "unsupported image format" example through round 5; this
closes it for the class a data pipeline actually meets in scanned-document
corpora.  Compression: none (1), early-change MSB-first LZW (5), new-style
JPEG (7 — per-strip baseline JPEG via operators/jpeg.py, standalone or
abbreviated against a shared JPEGTables tag 347), Adobe Deflate (8),
PackBits RLE (32773); Predictor (tag 317) horizontal differencing (2) is
applied/undone natively.  Unsupported variants refuse loudly naming the
tag.

Layout written by ``encode_tiff``: little-endian header, pixel data first
(raw or PackBits per strip), one IFD after it with the 9 baseline tags
readers require (ImageWidth, ImageLength, BitsPerSample, Compression,
PhotometricInterpretation, StripOffsets, SamplesPerPixel, RowsPerStrip,
StripByteCounts).  ``decode_tiff`` walks any conforming single-image file:
II/MM, arbitrary strip splits, inline (value-fits-in-4-bytes) or offset
tag values, WhiteIsZero or BlackIsZero grayscale, chunky RGB; palette/
planar/other-compression files refuse loudly by tag.
"""

from __future__ import annotations

import struct
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    import numpy as np


def _np():
    import numpy as np

    return np

# tag ids (TIFF 6.0 baseline)
_IMAGE_WIDTH = 256
_IMAGE_LENGTH = 257
_BITS_PER_SAMPLE = 258
_COMPRESSION = 259
_PHOTOMETRIC = 262
_STRIP_OFFSETS = 273
_SAMPLES_PER_PIXEL = 277
_ROWS_PER_STRIP = 278
_STRIP_BYTE_COUNTS = 279
_PLANAR_CONFIG = 284
_PREDICTOR = 317
_JPEG_TABLES = 347  # shared DQT/DHT stream for new-style JPEG (comp 7)

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}  # BYTE ASCII SHORT LONG RATIONAL


def _lzw_encode_tiff(data: bytes) -> bytes:
    """TIFF LZW (compression 5): MSB-first variable-width codes with the
    EARLY-CHANGE convention (width bumps when the next code would be
    2^w - 1) — the two ways it differs from GIF's LSB-first/late-change
    LZW.  Table clears at 4094 exactly as libtiff writes."""
    clear, eoi = 256, 257
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code, width = 258, 9
    emit(clear, width)
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        table[wc] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code >= 4094:
            emit(clear, width)
            table = {bytes([i]): i for i in range(256)}
            next_code, width = 258, 9
        w = bytes([ch])
    if w:
        emit(table[w], width)
    emit(eoi, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _lzw_decode_tiff(data: bytes, expected: int) -> bytes:
    clear, eoi = 256, 257
    out = bytearray()
    acc = nbits = pos = 0
    width = 9
    table = [bytes([i]) for i in range(256)] + [b"", b""]
    prev = None
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated TIFF LZW stream")
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width, prev = 9, None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        else:  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        out += entry
        # early change, decoder side: the NEXT append would land in slot
        # 2^w - 1, where the encoder already widened — mirror one early
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
        prev = entry
        if len(out) >= expected:
            break
    if len(out) < expected:
        raise ValueError(
            f"truncated TIFF LZW strip: {len(out)} of {expected} bytes"
        )
    return bytes(out[:expected])


def _packbits_encode(data: bytes) -> bytes:
    """Apple PackBits RLE (TIFF compression 32773): runs of 3+ equal bytes
    become (257-n, byte); literal spans become (n-1, bytes)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out.append(257 - run)
            out.append(data[i])
            i += run
            continue
        lit_start = i
        i += run
        while i < n and i - lit_start < 128:
            run = 1
            while i + run < n and run < 3 and data[i + run] == data[i]:
                run += 1
            if run >= 3:
                break
            i += 1
        out.append(i - lit_start - 1)
        out += data[lit_start:i]
    return bytes(out)


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        h = data[i]
        i += 1
        if h < 128:  # literal span of h+1 bytes
            if i + h + 1 > len(data):
                raise ValueError("truncated PackBits literal span")
            out += data[i : i + h + 1]
            i += h + 1
        elif h > 128:  # run of 257-h copies
            if i >= len(data):
                raise ValueError("truncated PackBits run")
            out += bytes([data[i]]) * (257 - h)
            i += 1
        # h == 128: no-op per spec
    if len(out) < expected:
        raise ValueError(
            f"truncated PackBits strip: {len(out)} of {expected} bytes"
        )
    return bytes(out[:expected])


_COMPRESSION_TAGS = {
    "none": 1,
    "packbits": 32773,
    "lzw": 5,
    "deflate": 8,
    "jpeg": 7,  # new-style JPEG: each strip is a baseline JPEG stream
}


def encode_tiff(
    pixels: "np.ndarray",
    rows_per_strip: int = 8,
    packbits: bool = False,
    compression: str | None = None,
    predictor: int = 1,
    jpeg_quality: int = 85,
    jpeg_tables: bool = False,
    byteorder: str = "II",
) -> bytes:
    """HxW (grayscale) or HxWx3 (RGB) uint8 array → TIFF with real
    multi-strip framing, little-endian ("II", default) or big-endian
    ("MM" — the order Mac-era scanners and many archival masters use;
    decode_tiff reads both either way).  ``compression``: "none" (default),
    "packbits" (RLE, tag 32773), "lzw" (early-change LZW, tag 5),
    "deflate" (tag 8) or "jpeg" (new-style JPEG, tag 7 — each strip a
    baseline JPEG of its rows, LOSSY);
    ``packbits=True`` is the legacy spelling of compression="packbits".
    ``predictor=2`` applies TIFF horizontal differencing (tag 317) before
    compression — the common libtiff/PIL pairing with LZW/Deflate.
    ``jpeg_tables=True`` writes the libtiff layout: per-strip streams are
    abbreviated (no DQT/DHT) and the shared tables live in the JPEGTables
    tag (347)."""
    if compression is None:
        compression = "packbits" if packbits else "none"
    if compression not in _COMPRESSION_TAGS:
        raise ValueError(f"unknown compression {compression!r}")
    if byteorder not in ("II", "MM"):
        raise ValueError(f"byteorder {byteorder!r} not in ('II', 'MM')")
    e = "<" if byteorder == "II" else ">"
    np = _np()
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        h, w = px.shape
        spp = 1
        photometric = 1  # BlackIsZero
    elif px.ndim == 3 and px.shape[2] == 3:
        h, w, _ = px.shape
        spp = 3
        photometric = 2  # RGB
    else:
        raise ValueError("encode_tiff wants HxW or HxWx3 uint8")
    if predictor not in (1, 2):
        raise ValueError(f"encode_tiff predictor {predictor} not in (1, 2)")
    if compression == "jpeg" and predictor == 2:
        raise ValueError(
            "TIFF predictor (tag 317) applies to LZW/Deflate, not JPEG strips"
        )
    if predictor == 2:
        # Horizontal differencing: per row, per sample channel, each byte
        # stores the delta from the previous pixel (mod 256); the first
        # pixel of the row is stored verbatim.
        d = px.reshape(h, w, spp).astype(np.int16)
        d[:, 1:, :] -= px.reshape(h, w, spp)[:, :-1, :].astype(np.int16)
        px = (d % 256).astype(np.uint8)
    data = px.tobytes()
    row_bytes = w * spp
    import zlib

    comp_fns = {
        "none": lambda b: b,
        "packbits": _packbits_encode,
        "lzw": _lzw_encode_tiff,
        "deflate": zlib.compress,  # Adobe Deflate (tag 8): raw zlib stream
    }
    jpeg_tables_bytes: bytes | None = None
    if compression == "jpeg":
        from lakehouse_sfc_spark.operators.jpeg import (
            encode_jpeg,
            jpeg_tables_stream,
        )

        arr = px.reshape(h, w) if spp == 1 else px.reshape(h, w, 3)
        strips = [
            encode_jpeg(
                arr[y0 : min(y0 + rows_per_strip, h)],
                quality=jpeg_quality,
                omit_tables=jpeg_tables,
            )
            for y0 in range(0, h, rows_per_strip)
        ]
        if jpeg_tables:
            jpeg_tables_bytes = jpeg_tables_stream(
                jpeg_quality, gray=(spp == 1)
            )
    else:
        comp_fn = comp_fns[compression]
        strips = [
            comp_fn(data[y0 * row_bytes : min(y0 + rows_per_strip, h) * row_bytes])
            for y0 in range(0, h, rows_per_strip)
        ]

    out = bytearray()
    out += b"II*\x00" if byteorder == "II" else b"MM\x00*"
    out += b"\x00\x00\x00\x00"  # IFD offset patched below
    strip_offsets = []
    for s in strips:
        strip_offsets.append(len(out))
        out += s
    # word-align the arrays/IFD
    if len(out) % 2:
        out += b"\x00"

    def _entry(tag: int, typ: int, count: int, value_or_offset: int) -> bytes:
        head = struct.pack(e + "HHI", tag, typ, count)
        if typ == 3 and count == 1:
            # inline values are LEFT-justified in the 4-byte field (TIFF
            # 6.0 §2), so a lone SHORT must occupy the first two bytes —
            # packing it as a 4-byte int would land it in the last two
            # under big-endian
            return head + struct.pack(e + "HH", value_or_offset, 0)
        return head + struct.pack(e + "I", value_or_offset)

    # out-of-line arrays (needed when count > 1)
    extra = bytearray()
    ifd_pos_guess = len(out)

    def _array_u32(vals: list[int], base: int) -> int:
        off = base + len(extra)
        extra.extend(struct.pack(f"{e}{len(vals)}I", *vals))
        return off

    def _array_u16(vals: list[int], base: int) -> int:
        off = base + len(extra)
        extra.extend(struct.pack(f"{e}{len(vals)}H", *vals))
        if len(extra) % 2:
            extra.extend(b"\x00")
        return off

    def _array_bytes(raw: bytes, base: int) -> int:
        off = base + len(extra)
        extra.extend(raw)
        if len(extra) % 2:
            extra.extend(b"\x00")
        return off

    n_entries = (
        9
        + (1 if predictor == 2 else 0)
        + (1 if jpeg_tables_bytes is not None else 0)
    )
    ifd_size = 2 + n_entries * 12 + 4
    arrays_base = ifd_pos_guess + ifd_size

    entries = []
    entries.append(_entry(_IMAGE_WIDTH, 4, 1, w))
    entries.append(_entry(_IMAGE_LENGTH, 4, 1, h))
    if spp == 1:
        entries.append(_entry(_BITS_PER_SAMPLE, 3, 1, 8))
    else:
        entries.append(
            _entry(_BITS_PER_SAMPLE, 3, 3, _array_u16([8, 8, 8], arrays_base))
        )
    entries.append(
        _entry(_COMPRESSION, 3, 1, _COMPRESSION_TAGS[compression])
    )
    entries.append(_entry(_PHOTOMETRIC, 3, 1, photometric))
    if len(strip_offsets) == 1:
        entries.append(_entry(_STRIP_OFFSETS, 4, 1, strip_offsets[0]))
    else:
        entries.append(
            _entry(
                _STRIP_OFFSETS,
                4,
                len(strip_offsets),
                _array_u32(strip_offsets, arrays_base),
            )
        )
    entries.append(_entry(_SAMPLES_PER_PIXEL, 3, 1, spp))
    entries.append(_entry(_ROWS_PER_STRIP, 4, 1, rows_per_strip))
    counts = [len(s) for s in strips]
    if len(counts) == 1:
        entries.append(_entry(_STRIP_BYTE_COUNTS, 4, 1, counts[0]))
    else:
        entries.append(
            _entry(
                _STRIP_BYTE_COUNTS, 4, len(counts), _array_u32(counts, arrays_base)
            )
        )
    if predictor == 2:
        entries.append(_entry(_PREDICTOR, 3, 1, 2))
    if jpeg_tables_bytes is not None:
        # type 7 = UNDEFINED (opaque bytes); always out-of-line — the
        # abbreviated tables stream is far larger than 4 bytes
        entries.append(
            _entry(
                _JPEG_TABLES,
                7,
                len(jpeg_tables_bytes),
                _array_bytes(jpeg_tables_bytes, arrays_base),
            )
        )

    ifd = struct.pack(e + "H", n_entries) + b"".join(entries) + b"\x00\x00\x00\x00"
    assert len(ifd) == ifd_size
    struct.pack_into(e + "I", out, 4, ifd_pos_guess)
    out += ifd
    out += extra
    return bytes(out)


def _read_tag_values(payload: bytes, entry: bytes, e: str) -> list[int]:
    """Integer values of one IFD entry (inline when they fit in 4 bytes,
    else at the stored offset)."""
    tag, typ, count = struct.unpack(e + "HHI", entry[:8])
    if typ not in _TYPE_SIZES:
        raise ValueError(f"TIFF tag {tag}: unsupported type {typ}")
    unit = _TYPE_SIZES[typ]
    total = unit * count
    raw = (
        entry[8 : 8 + total]
        if total <= 4
        else payload[
            struct.unpack(e + "I", entry[8:12])[0] :
        ][:total]
    )
    if len(raw) < total:
        raise ValueError(f"truncated TIFF: tag {tag} values cut short")
    code = {1: "B", 3: "H", 4: "I"}.get(typ)
    if code is None:
        raise ValueError(f"TIFF tag {tag}: type {typ} not supported here")
    return list(struct.unpack(f"{e}{count}{code}", raw))


def tiff_compression(payload: bytes) -> int:
    """Compression tag (259) value of a TIFF payload — a header+IFD walk
    only, no strip decode.  Lets callers route lossy (JPEG, tag 7) and
    lossless strips to different content checks without trusting any
    out-of-band metadata."""
    if payload[:4] == b"II*\x00":
        e = "<"
    elif payload[:4] == b"MM\x00*":
        e = ">"
    else:
        raise ValueError("not a TIFF payload")
    (ifd_off,) = struct.unpack(e + "I", payload[4:8])
    if ifd_off + 2 > len(payload):
        raise ValueError("truncated TIFF: IFD offset past payload")
    (n,) = struct.unpack(e + "H", payload[ifd_off : ifd_off + 2])
    for i in range(n):
        at = ifd_off + 2 + 12 * i
        entry = payload[at : at + 12]
        if len(entry) < 12:
            raise ValueError("truncated TIFF: IFD entry cut short")
        if struct.unpack(e + "H", entry[:2])[0] == _COMPRESSION:
            return _read_tag_values(payload, entry, e)[0]
    return 1  # tag absent: uncompressed per TIFF 6.0 defaults


def decode_tiff(payload: bytes) -> "np.ndarray":
    """Baseline TIFF (uncompressed / LZW / Deflate / PackBits, optional
    horizontal-differencing predictor) → HxW (gray) or HxWx3 (RGB) uint8;
    WhiteIsZero grayscale is inverted to BlackIsZero."""
    np = _np()
    if payload[:4] == b"II*\x00":
        e = "<"
    elif payload[:4] == b"MM\x00*":
        e = ">"
    else:
        raise ValueError("not a TIFF payload")
    if len(payload) < 8:
        raise ValueError("truncated TIFF: header cut short")
    (ifd_off,) = struct.unpack(e + "I", payload[4:8])
    if ifd_off + 2 > len(payload):
        raise ValueError("truncated TIFF: IFD offset past payload")
    (n,) = struct.unpack(e + "H", payload[ifd_off : ifd_off + 2])
    tags: dict[int, list[int]] = {}
    jpeg_tables: bytes | None = None
    for i in range(n):
        at = ifd_off + 2 + 12 * i
        entry = payload[at : at + 12]
        if len(entry) < 12:
            raise ValueError("truncated TIFF: IFD entry cut short")
        tag = struct.unpack(e + "H", entry[:2])[0]
        if tag == _JPEG_TABLES:
            # opaque bytes (type 7 UNDEFINED / 1 BYTE), not integer values
            typ, count = struct.unpack(e + "HI", entry[2:8])
            if typ not in (1, 7):
                raise ValueError(f"TIFF JPEGTables: unexpected type {typ}")
            if count <= 4:
                jpeg_tables = entry[8 : 8 + count]
            else:
                (off,) = struct.unpack(e + "I", entry[8:12])
                jpeg_tables = payload[off : off + count]
            if len(jpeg_tables) < count:
                raise ValueError("truncated TIFF: JPEGTables cut short")
            continue
        if tag in (
            _IMAGE_WIDTH,
            _IMAGE_LENGTH,
            _BITS_PER_SAMPLE,
            _COMPRESSION,
            _PHOTOMETRIC,
            _STRIP_OFFSETS,
            _SAMPLES_PER_PIXEL,
            _ROWS_PER_STRIP,
            _STRIP_BYTE_COUNTS,
            _PLANAR_CONFIG,
            _PREDICTOR,
        ):
            tags[tag] = _read_tag_values(payload, entry, e)

    def _one(tag: int, default: int | None = None) -> int:
        if tag in tags:
            return tags[tag][0]
        if default is None:
            raise ValueError(f"TIFF missing required tag {tag}")
        return default

    w = _one(_IMAGE_WIDTH)
    h = _one(_IMAGE_LENGTH)
    comp = _one(_COMPRESSION, 1)
    if comp == 6:
        raise NotImplementedError(
            "TIFF compression 6 (old-style JPEG) not supported — the tag "
            "was deprecated by TIFF TechNote 2 for its broken pointer "
            "scheme; re-save as new-style JPEG (tag 7)"
        )
    if comp not in (1, 5, 7, 8, 32773):
        raise NotImplementedError(
            f"TIFF compression {comp} not supported (1 = uncompressed, "
            "5 = LZW, 7 = new-style JPEG, 8 = Deflate and 32773 = PackBits "
            "decode natively)"
        )
    spp = _one(_SAMPLES_PER_PIXEL, 1)
    bits = tags.get(_BITS_PER_SAMPLE, [8])
    if any(b != 8 for b in bits):
        raise NotImplementedError(f"TIFF bits-per-sample {bits} != 8")
    if spp not in (1, 3):
        raise NotImplementedError(f"TIFF samples-per-pixel {spp} not in (1, 3)")
    photometric = _one(_PHOTOMETRIC, 1)
    if photometric not in (0, 1, 2):
        raise NotImplementedError(
            f"TIFF photometric {photometric} not supported (0/1 grayscale, "
            "2 RGB; palette/CMYK/YCbCr need their color machinery)"
        )
    predictor = _one(_PREDICTOR, 1)
    if predictor not in (1, 2):
        raise NotImplementedError(
            f"TIFF predictor {predictor} not supported (1 = none, "
            "2 = horizontal differencing decode natively; 3 = floating-"
            "point differencing needs its byte-plane machinery)"
        )
    planar = _one(_PLANAR_CONFIG, 1)
    if planar != 1:
        raise NotImplementedError(
            f"TIFF planar configuration {planar} not supported (only 1 = "
            "chunky; separate-plane files interleave differently)"
        )
    offsets = tags.get(_STRIP_OFFSETS)
    if not offsets:
        raise ValueError("TIFF missing StripOffsets")
    counts = tags.get(_STRIP_BYTE_COUNTS)
    if not counts or len(counts) != len(offsets):
        raise ValueError("TIFF StripByteCounts missing or mismatched")
    rps = _one(_ROWS_PER_STRIP, h)
    row_bytes = w * spp
    if comp == 7:
        if predictor == 2:
            raise ValueError(
                "TIFF predictor 2 with JPEG strips is not a valid combination"
            )
        from lakehouse_sfc_spark.operators.jpeg import decode_jpeg

        if jpeg_tables is not None and (
            jpeg_tables[:2] != b"\xff\xd8" or jpeg_tables[-2:] != b"\xff\xd9"
        ):
            raise ValueError(
                "TIFF JPEGTables is not an abbreviated JPEG stream "
                "(must be SOI ... EOI)"
            )
        parts = []
        for idx, (off, cnt) in enumerate(zip(offsets, counts)):
            chunk = bytes(payload[off : off + cnt])
            if len(chunk) < cnt:
                raise ValueError("truncated TIFF: strip data cut short")
            if chunk[:2] != b"\xff\xd8":
                raise ValueError("TIFF JPEG strip does not start with SOI")
            if jpeg_tables is not None:
                # abbreviated strip: splice the shared DQT/DHT segments
                # back in right after SOI (T.81 Annex B.5)
                chunk = b"\xff\xd8" + jpeg_tables[2:-2] + chunk[2:]
            px = decode_jpeg(chunk)
            rows_here = max(0, min(rps, h - idx * rps))
            got = (px.shape[0], px.shape[1], 1 if px.ndim == 2 else 3)
            if got != (rows_here, w, spp):
                raise ValueError(
                    f"TIFF JPEG strip {idx}: decoded {got}, IFD says "
                    f"({rows_here}, {w}, {spp})"
                )
            parts.append(px.reshape(rows_here, w, spp))
        arr = np.concatenate(parts, axis=0).reshape(-1) if parts else (
            np.zeros(0, dtype=np.uint8)
        )
        if photometric == 0:
            arr = (255 - arr.astype(np.int16)).astype(np.uint8)
        if spp == 1:
            return arr.reshape(h, w)
        return arr.reshape(h, w, 3)
    data = bytearray()
    for idx, (off, cnt) in enumerate(zip(offsets, counts)):
        chunk = payload[off : off + cnt]
        if len(chunk) < cnt:
            raise ValueError("truncated TIFF: strip data cut short")
        if comp in (5, 8, 32773):
            rows_here = max(0, min(rps, h - idx * rps))
            expected = rows_here * row_bytes
            if comp == 5:
                chunk = _lzw_decode_tiff(chunk, expected)
            elif comp == 8:
                import zlib

                try:
                    chunk = zlib.decompress(bytes(chunk))
                except zlib.error as ex:
                    raise ValueError(
                        f"corrupt TIFF Deflate strip: {ex}"
                    ) from ex
                if len(chunk) < expected:
                    raise ValueError(
                        f"truncated TIFF Deflate strip: {len(chunk)} of "
                        f"{expected} bytes"
                    )
            else:
                chunk = _packbits_decode(chunk, expected)
        data += chunk
    need = w * h * spp
    if len(data) < need:
        raise ValueError(
            f"truncated TIFF: {len(data)} of {need} pixel bytes present"
        )
    arr = np.frombuffer(bytes(data[:need]), dtype=np.uint8)
    if predictor == 2:
        # Undo horizontal differencing: cumulative sum along each row per
        # sample channel, mod 256 (rows are independent, so applying over
        # the concatenated strips is safe).
        a = arr.reshape(h, w, spp).astype(np.uint64)
        arr = (np.cumsum(a, axis=1) % 256).astype(np.uint8).reshape(-1)
    if photometric == 0:
        # WhiteIsZero (fax/scan masters): invert to the BlackIsZero
        # convention every other decoder here returns
        arr = (255 - arr.astype(np.int16)).astype(np.uint8)
    if spp == 1:
        return arr.reshape(h, w)
    return arr.reshape(h, w, 3)


def tiff_metadata(payload: bytes) -> dict:
    """Metadata-only IFD walk — NO strip decode: the corpus-curation
    fast path (filter a scanned-document lake by compression/geometry/
    byte order BEFORE paying decode CPU).  Returns byteorder, geometry,
    compression tag, predictor, strip count, photometric and JPEGTables
    presence for the first IFD."""
    if payload[:4] == b"II*\x00":
        e, bo = "<", "II"
    elif payload[:4] == b"MM\x00*":
        e, bo = ">", "MM"
    else:
        raise ValueError("not a TIFF payload")
    if len(payload) < 8:
        raise ValueError("truncated TIFF: header cut short")
    (ifd_off,) = struct.unpack(e + "I", payload[4:8])
    if ifd_off + 2 > len(payload):
        raise ValueError("truncated TIFF: IFD offset past payload")
    (n,) = struct.unpack(e + "H", payload[ifd_off : ifd_off + 2])
    vals: dict[int, int] = {}
    counts: dict[int, int] = {}
    for i in range(n):
        entry = payload[ifd_off + 2 + 12 * i : ifd_off + 14 + 12 * i]
        if len(entry) < 12:
            raise ValueError("truncated TIFF: IFD entry cut short")
        tag, typ, count = struct.unpack(e + "HHI", entry[:8])
        counts[tag] = count
        if count == 1 and typ in (3, 4):  # SHORT / LONG inline
            if typ == 3:
                vals[tag] = struct.unpack(e + "H", entry[8:10])[0]
            else:
                vals[tag] = struct.unpack(e + "I", entry[8:12])[0]
    return {
        "byteorder": bo,
        "width": vals.get(_IMAGE_WIDTH, 0),
        "height": vals.get(_IMAGE_LENGTH, 0),
        "compression": vals.get(_COMPRESSION, 1),
        "predictor": vals.get(_PREDICTOR, 1),
        "n_strips": counts.get(_STRIP_OFFSETS, 0),
        "photometric": vals.get(_PHOTOMETRIC, 0),
        "has_jpeg_tables": _JPEG_TABLES in counts,
    }
