"""Pure-python GIF87a codec: variable-code-width LZW over a palette image.

Completes the real-codec family (BMP/WAV/PNG/baseline-JPEG/MJPEG-AVI) with
the one classic compression algorithm not yet covered: LZW with a growing,
resettable code dictionary and LSB-first variable-width bit packing —
machinery entirely different from DEFLATE (PNG) and DCT+Huffman (JPEG).

Reference behavior parity: the reference treats media as opaque blobs with
typed metadata (SURVEY.md §2 multimodal); here decode is real so the Spark
plumbing (mapInPandas over binary columns) carries honest pixels.

Scope (mirrors the honest limits of the other codecs):
- encode: single frame, 8-bit indices, 256-entry global palette, no
  interlace, no extensions.
- decode: single- or multi-image GIF87a/89a streams, skips extension
  blocks, raises NotImplementedError on interlaced images or local color
  tables (with a clear message), returns the FIRST image as HxWx3 RGB via
  the global palette.
"""

from __future__ import annotations

import struct

try:  # pragma: no cover - import guard mirrors operators/multimodal.py
    import numpy as np
except ImportError:  # pragma: no cover
    np = None  # type: ignore[assignment]

_GIF_MAGICS = (b"GIF87a", b"GIF89a")

_MAX_CODE = 4096  # GIF caps codes at 12 bits


class _BitPackerLSB:
    """LSB-first bit packer (GIF packs LZW codes little-endian bitwise)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def push(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def _lzw_encode(indices: "np.ndarray", min_code_size: int = 8) -> bytes:
    """GIF-variant LZW: clear code = 2^min, EOI = 2^min+1, code width grows
    from min+1 up to 12 bits, dictionary resets via an explicit clear code
    when full."""
    clear = 1 << min_code_size
    eoi = clear + 1
    packer = _BitPackerLSB()

    def fresh() -> tuple[dict, int, int]:
        return (
            {bytes([i]): i for i in range(clear)},
            eoi + 1,
            min_code_size + 1,
        )

    table, next_code, width = fresh()
    packer.push(clear, width)
    prefix = b""
    for sym in indices.astype(np.uint8).ravel().tobytes():
        cand = prefix + bytes([sym])
        if cand in table:
            prefix = cand
            continue
        packer.push(table[prefix], width)
        if next_code < _MAX_CODE:
            table[cand] = next_code
            next_code += 1
            if next_code > (1 << width) and width < 12:
                width += 1
        else:
            packer.push(clear, width)
            table, next_code, width = fresh()
        prefix = bytes([sym])
    if prefix:
        packer.push(table[prefix], width)
    packer.push(eoi, width)
    return packer.flush()


def _lzw_decode(data: bytes, min_code_size: int) -> bytes:
    """Inverse of _lzw_encode; tolerates any conforming GIF LZW stream."""
    clear = 1 << min_code_size
    eoi = clear + 1
    acc = 0
    nbits = 0
    pos = 0
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                return bytes(out)  # truncated stream: emit what we have
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < _MAX_CODE:
                table.append(prev + entry[:1])
        else:  # the KwKwK case
            entry = prev + prev[:1]
            if len(table) < _MAX_CODE:
                table.append(entry)
        out += entry
        if len(table) >= (1 << width) and width < 12:
            width += 1
        prev = entry


def _sub_blocks(data: bytes) -> bytes:
    """Split data into GIF sub-blocks (<=255 bytes each) + terminator."""
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _gray_palette() -> bytes:
    return bytes(v for i in range(256) for v in (i, i, i))


def encode_gif(indices: "np.ndarray", palette: bytes | None = None) -> bytes:
    """HxW uint8 index array (+ optional 768-byte palette, default
    grayscale ramp) -> single-frame GIF87a with a 256-entry global color
    table and real LZW image data."""
    if indices.ndim != 2:
        raise ValueError("encode_gif expects an HxW uint8 index array")
    h, w = indices.shape
    pal = palette if palette is not None else _gray_palette()
    if len(pal) != 768:
        raise ValueError("palette must be 256*3 bytes")
    head = b"GIF87a" + struct.pack("<HHBBB", w, h, 0xF7, 0, 0) + pal
    img_desc = b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    lzw = _lzw_encode(indices, 8)
    return head + img_desc + b"\x08" + _sub_blocks(lzw) + b"\x3b"


def decode_gif(payload: bytes) -> "np.ndarray":
    """Real GIF decode: header + logical screen descriptor + global color
    table, skip extensions, LZW-decompress the first image, map indices
    through the palette -> HxWx3 uint8 RGB."""
    if payload[:6] not in _GIF_MAGICS:
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("truncated GIF: header cut short")
    sw, sh, packed, _bg, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    palette = None
    if packed & 0x80:
        n = 2 ** ((packed & 0x07) + 1)
        if pos + 3 * n > len(payload):
            raise ValueError("truncated GIF: global color table cut short")
        palette = payload[pos : pos + 3 * n]
        pos += 3 * n
    def _at(p: int) -> int:
        if p >= len(payload):
            raise ValueError("truncated GIF: sub-block overruns payload")
        return payload[p]

    while pos < len(payload):
        b = payload[pos]
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while _at(pos):
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            if pos + 10 > len(payload):
                raise ValueError("truncated GIF: image descriptor cut short")
            _l, _t, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos + 1)
            pos += 10
            if ipacked & 0x40:
                raise NotImplementedError("interlaced GIF not supported")
            if ipacked & 0x80:
                raise NotImplementedError("local color tables not supported")
            if palette is None:
                raise NotImplementedError("GIF without a global color table")
            min_code = _at(pos)
            pos += 1
            data = bytearray()
            while _at(pos):
                ln = payload[pos]
                if pos + 1 + ln > len(payload):
                    raise ValueError("truncated GIF: data sub-block cut short")
                data += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            decoded = _lzw_decode(bytes(data), min_code)
            # _lzw_decode returns partial output when the code stream ends
            # early (some encoders omit EOI after complete data, so raising
            # there would reject valid files) — an image that is actually
            # SHORT of pixels is surfaced here, not as a reshape error.
            if len(decoded) < w * h:
                raise ValueError(
                    f"truncated GIF LZW stream: decoded {len(decoded)} of "
                    f"{w * h} pixels"
                )
            idx = np.frombuffer(decoded, dtype=np.uint8)[: w * h].reshape(
                h, w
            )
            pal = np.frombuffer(palette, dtype=np.uint8).reshape(-1, 3)
            return pal[idx]
        elif b == 0x3B:
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{b:02x} at {pos}")
    raise ValueError("GIF contained no image data")
