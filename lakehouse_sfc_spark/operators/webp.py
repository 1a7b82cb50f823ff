"""WebP lossless (VP8L) codec — pure Python/numpy, stdlib only.

Scope (honest, refuse-loudly-by-feature like operators/tiff.py):

- ``encode_webp``: real VP8L entropy coding — per-channel canonical prefix
  codes built from the image's own symbol frequencies, emitted through the
  full code-length-code machinery (the DEFLATE-style CL alphabet with VP8L's
  reordering), literals only (no LZ77 window search), no transforms, no
  color cache.  This is a LEGAL minimal VP8L stream, not a stub: every bit
  of header, transform flags, five prefix codes and pixel data follows the
  lossless bitstream spec.
- ``decode_webp``: a superset of the encoder — simple (1/2-symbol) and
  full prefix codes, the max-symbol trimming escape, color cache
  (0x1e35a7bd hash, updated on every emitted pixel), LZ77 backward
  references with ABSOLUTE distances (code > 120), and the subtract-green
  inverse transform.  Refuses loudly by name: the 120-entry 2D
  distance-mapping table (we will not risk silently-wrong pixels on a
  from-memory table), predictor / cross-color / color-indexing transforms,
  meta prefix images, lossy ``VP8 `` and extended ``VP8X`` containers.

Bit conventions per the spec: bytes are consumed LSB-first; multi-bit
header fields are little-endian; prefix-code bits are read first-bit =
most-significant code bit (tree walk from the root), with canonical code
assignment identical to DEFLATE (shorter lengths first, then symbol
order).  Prefix-code interop beyond self-roundtrip is pinned by a
hand-assembled golden fixture using SIMPLE codes (whose bit patterns the
spec fixes exactly) in tests/test_multimodal_codecs.py.

No counterpart in the reference repo; sibling of operators/{tiff,gif,ico}.py.
"""

from __future__ import annotations

import heapq
import struct

import numpy as np

#: VP8L code-length-code symbol transmission order
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

_GREEN_LITERALS = 256
_LENGTH_CODES = 24
_DISTANCE_CODES = 40
_MAX_CODE_LENGTH = 15


# --- bit IO (LSB-first stream) ---------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self._acc = 0
        self._n = 0
        self._out = bytearray()

    def bits(self, value: int, n: int) -> None:
        """little-endian field: bit i of value is the i-th bit written"""
        self._acc |= (value & ((1 << n) - 1)) << self._n
        self._n += n
        while self._n >= 8:
            self._out.append(self._acc & 0xFF)
            self._acc >>= 8
            self._n -= 8

    def code(self, code: int, length: int) -> None:
        """prefix-code bits, MSB of the code first"""
        for i in range(length - 1, -1, -1):
            self.bits((code >> i) & 1, 1)

    def done(self) -> bytes:
        if self._n:
            self._out.append(self._acc & 0xFF)
            self._acc, self._n = 0, 0
        return bytes(self._out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self._d = data
        self._pos = 0  # bit position

    def bits(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self._pos >> 3
            if byte >= len(self._d):
                raise ValueError("truncated VP8L bitstream")
            v |= ((self._d[byte] >> (self._pos & 7)) & 1) << i
            self._pos += 1
        return v


# --- canonical prefix codes ------------------------------------------------


def _canonical_codes(lengths: "dict[int, int]") -> "dict[int, tuple[int, int]]":
    """symbol → (code, length), DEFLATE canonical assignment."""
    order = sorted((l, s) for s, l in lengths.items() if l > 0)
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    prev_len = 0
    for l, s in order:
        code <<= l - prev_len
        codes[s] = (code, l)
        code += 1
        prev_len = l
    return codes


def _build_lengths(freqs: "dict[int, int]") -> "dict[int, int]":
    """Huffman code lengths from frequencies (≥ 2 distinct symbols)."""
    heap = [(f, s, None) for s, f in freqs.items() if f > 0]
    heapq.heapify(heap)
    if len(heap) == 1:
        return {heap[0][1]: 1}
    nodes: list = []
    while len(heap) > 1:
        a = heapq.heappop(heap)
        b = heapq.heappop(heap)
        node = (a[0] + b[0], -1 - len(nodes), (a, b))
        nodes.append(node)
        heapq.heappush(heap, node)
    lengths: dict[int, int] = {}

    def walk(node, depth):
        f, s, kids = node
        if kids is None:
            lengths[s] = max(1, depth)
            return
        walk(kids[0], depth + 1)
        walk(kids[1], depth + 1)

    walk(heap[0], 0)
    if max(lengths.values()) > _MAX_CODE_LENGTH:
        raise NotImplementedError(
            "prefix code deeper than 15 bits (length-limiting not needed "
            "for the synthetic grids this encoder serves)"
        )
    return lengths


class _PrefixDecoder:
    def __init__(self, lengths: "dict[int, int]",
                 explicit: "dict[tuple[int, int], int] | None" = None) -> None:
        """``lengths`` → canonical codes; ``explicit`` overrides with a
        literal (length, code) → symbol map (simple 2-symbol codes assign
        code 0 to the FIRST TRANSMITTED symbol, not the canonical one)."""
        self._map = explicit if explicit is not None else {
            (l, c): s for s, (c, l) in _canonical_codes(lengths).items()
        }
        self._single = None
        if len(self._map) == 1:
            self._single = next(iter(self._map.values()))

    def read(self, br: _BitReader) -> int:
        if self._single is not None:
            return self._single
        code, length = 0, 0
        while length <= _MAX_CODE_LENGTH:
            code = (code << 1) | br.bits(1)
            length += 1
            s = self._map.get((length, code))
            if s is not None:
                return s
        raise ValueError("invalid VP8L prefix code")


# --- encoder ---------------------------------------------------------------


def _write_full_code(bw: _BitWriter, lengths: "dict[int, int]",
                     alphabet: int) -> None:
    """non-simple prefix-code header: CL-code lengths + symbol lengths."""
    seq = [lengths.get(s, 0) for s in range(alphabet)]
    while len(seq) > 1 and seq[-1] == 0:
        seq.pop()  # trailing zeros are implicit (no max-symbol escape)
    cl_freq: dict[int, int] = {}
    for l in seq:
        cl_freq[l] = cl_freq.get(l, 0) + 1
    if len(cl_freq) == 1:
        # a 1-symbol CL code reads ZERO bits, which would make the decoder
        # fill the whole alphabet instead of len(seq) entries — force a
        # 2-symbol code (1 bit per entry) with a never-used partner
        only = next(iter(cl_freq))
        cl_lengths = {only: 1, (0 if only != 0 else 1): 1}
    else:
        cl_lengths = _build_lengths(cl_freq)
    if max(cl_lengths.values()) > 7:
        raise NotImplementedError("CL code deeper than 7 bits")
    bw.bits(0, 1)  # not simple
    bw.bits(19 - 4, 4)  # transmit all 19 CL slots
    for sym in _CL_ORDER:
        bw.bits(cl_lengths.get(sym, 0), 3)
    if len(seq) < alphabet:
        # trailing zeros are NOT implicit: without the escape the decoder
        # expects a length for every alphabet symbol — transmit the count
        # of CL symbols that follow (one per seq entry, we emit no repeats)
        bw.bits(1, 1)
        k = 0
        while len(seq) - 2 >= (1 << (2 + 2 * k)):
            k += 1
        if k > 7:
            raise NotImplementedError("alphabet too large for escape field")
        bw.bits(k, 3)
        bw.bits(len(seq) - 2, 2 + 2 * k)
    else:
        bw.bits(0, 1)
    codes = _canonical_codes(cl_lengths)
    for l in seq:
        c, n = codes[l]
        bw.code(c, n)


def _write_simple_code(bw: _BitWriter, symbols: "list[int]") -> None:
    bw.bits(1, 1)  # simple
    bw.bits(len(symbols) - 1, 1)
    first_8bits = 1 if symbols[0] > 1 else 0
    bw.bits(first_8bits, 1)
    bw.bits(symbols[0], 8 if first_8bits else 1)
    if len(symbols) == 2:
        bw.bits(symbols[1], 8)


def _write_channel_code(bw: _BitWriter, values: "np.ndarray",
                        alphabet: int) -> "dict[int, tuple[int, int]]":
    freqs: dict[int, int] = {}
    for v in values.tolist():
        freqs[v] = freqs.get(v, 0) + 1
    syms = sorted(freqs)
    if len(syms) == 1:
        _write_simple_code(bw, syms)
        return {syms[0]: (0, 0)}
    if len(syms) == 2:
        _write_simple_code(bw, syms)
        return {syms[0]: (0, 1), syms[1]: (1, 1)}
    lengths = _build_lengths(freqs)
    _write_full_code(bw, lengths, alphabet)
    return _canonical_codes(lengths)


def encode_webp(pixels: "np.ndarray", subtract_green: bool = True) -> bytes:
    """HxWx3 uint8 RGB → lossless WebP (VP8L, literal pixels under real
    per-channel canonical prefix codes; alpha written as opaque).  The
    subtract-green transform (on by default, libwebp's default too) codes
    r-g and b-g — on channel-correlated content the red/blue codes
    collapse toward single-symbol zero-bit codes, the whole compression
    win for grayscale-ish inputs."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("encode_webp expects HxWx3 RGB")
    h, w, _ = px.shape
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise ValueError("VP8L sides must be in 1..16384")
    bw = _BitWriter()
    bw.bits(0x2F, 8)  # VP8L signature byte
    bw.bits(w - 1, 14)
    bw.bits(h - 1, 14)
    bw.bits(0, 1)  # alpha unused
    bw.bits(0, 3)  # version
    if subtract_green:
        bw.bits(1, 1)
        bw.bits(2, 2)  # transform type: subtract-green (no payload)
    bw.bits(0, 1)  # no more transforms
    bw.bits(0, 1)  # no color cache
    bw.bits(0, 1)  # no meta prefix image
    g2 = px[:, :, 1].astype(np.int16)
    if subtract_green:
        r = ((px[:, :, 0] - g2) % 256).astype(np.uint8).reshape(-1)
        b = ((px[:, :, 2] - g2) % 256).astype(np.uint8).reshape(-1)
    else:
        r = px[:, :, 0].reshape(-1)
        b = px[:, :, 2].reshape(-1)
    g = px[:, :, 1].reshape(-1)
    g_codes = _write_channel_code(bw, g, _GREEN_LITERALS + _LENGTH_CODES)
    r_codes = _write_channel_code(bw, r, 256)
    b_codes = _write_channel_code(bw, b, 256)
    a_codes = _write_channel_code(bw, np.full(1, 255, np.uint8), 256)
    _write_simple_code(bw, [0])  # distance code: unused 1-symbol
    for i in range(h * w):
        c, n = g_codes[int(g[i])]
        bw.code(c, n)
        c, n = r_codes[int(r[i])]
        bw.code(c, n)
        c, n = b_codes[int(b[i])]
        bw.code(c, n)
        c, n = a_codes[255]
        bw.code(c, n)
    body = bw.done()
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


# --- decoder ---------------------------------------------------------------


def _read_code(br: _BitReader, alphabet: int) -> _PrefixDecoder:
    if br.bits(1):  # simple
        num_symbols = br.bits(1) + 1
        first_8bits = br.bits(1)
        s0 = br.bits(8 if first_8bits else 1)
        if num_symbols == 1:
            return _PrefixDecoder({}, explicit={(0, 0): s0})
        s1 = br.bits(8)
        return _PrefixDecoder({}, explicit={(1, 0): s0, (1, 1): s1})
    num_cl = 4 + br.bits(4)
    cl_lengths: dict[int, int] = {}
    for i in range(num_cl):
        l = br.bits(3)
        if l:
            cl_lengths[_CL_ORDER[i]] = l
    cl = _PrefixDecoder(cl_lengths)
    if br.bits(1):  # max-symbol escape
        length_nbits = 2 + 2 * br.bits(3)
        max_symbol = 2 + br.bits(length_nbits)
    else:
        max_symbol = alphabet
    lengths: dict[int, int] = {}
    sym = 0
    prev = 8
    while sym < alphabet:
        if max_symbol == 0:
            break
        max_symbol -= 1
        l = cl.read(br)
        if l < 16:
            if l:
                lengths[sym] = l
                prev = l
            sym += 1
        elif l == 16:
            rep = 3 + br.bits(2)
            for _ in range(rep):
                lengths[sym] = prev
                sym += 1
        elif l == 17:
            sym += 3 + br.bits(3)
        else:  # 18
            sym += 11 + br.bits(7)
    return _PrefixDecoder(lengths)


def _lz77_value(br: _BitReader, prefix: int) -> int:
    if prefix < 4:
        return prefix + 1
    extra = (prefix >> 1) - 1
    offset = (2 + (prefix & 1)) << extra
    return offset + br.bits(extra) + 1


def decode_webp(payload: bytes) -> "np.ndarray":
    """Lossless WebP → HxWx3 uint8 RGB (alpha dropped after validation)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP payload")
    pos = 12
    body = None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        if cid == b"VP8L":
            body = payload[pos + 8 : pos + 8 + size]
            break
        if cid in (b"VP8 ", b"VP8X"):
            raise NotImplementedError(
                f"{cid.decode().strip()} (lossy / extended) WebP needs the "
                "VP8 DCT codec; only lossless VP8L decodes here"
            )
        pos += 8 + size + (size & 1)
    if body is None:
        raise ValueError("no VP8L chunk in WebP container")
    if body[0] != 0x2F:
        raise ValueError("bad VP8L signature byte")
    br = _BitReader(body[1:])
    w = br.bits(14) + 1
    h = br.bits(14) + 1
    br.bits(1)  # alpha hint
    if br.bits(3) != 0:
        raise ValueError("unknown VP8L version")
    subtract_green = False
    while br.bits(1):
        ttype = br.bits(2)
        if ttype == 2:
            subtract_green = True
        else:
            names = {0: "predictor", 1: "cross-color", 3: "color-indexing"}
            raise NotImplementedError(
                f"VP8L {names[ttype]} transform not implemented (only "
                "subtract-green); refusing rather than mis-decoding"
            )
    cache_bits = 0
    cache = None
    if br.bits(1):
        cache_bits = br.bits(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("bad color-cache size")
        cache = [0] * (1 << cache_bits)
    if br.bits(1):
        raise NotImplementedError(
            "meta prefix image (multiple code groups) not implemented"
        )
    green_alphabet = _GREEN_LITERALS + _LENGTH_CODES + (1 << cache_bits
                                                        if cache_bits else 0)
    g_code = _read_code(br, green_alphabet)
    r_code = _read_code(br, 256)
    b_code = _read_code(br, 256)
    a_code = _read_code(br, 256)
    d_code = _read_code(br, _DISTANCE_CODES)
    n = w * h
    out = np.zeros((n, 4), dtype=np.uint8)  # R G B A
    i = 0

    def emit(rgba) -> None:
        nonlocal i
        out[i] = rgba
        if cache is not None:
            argb = (int(rgba[3]) << 24) | (int(rgba[0]) << 16) | (
                int(rgba[1]) << 8) | int(rgba[2])
            cache[(0x1E35A7BD * argb & 0xFFFFFFFF) >> (32 - cache_bits)] = argb
        i += 1

    while i < n:
        s = g_code.read(br)
        if s < _GREEN_LITERALS:
            emit((r_code.read(br), s, b_code.read(br), a_code.read(br)))
        elif s < _GREEN_LITERALS + _LENGTH_CODES:
            length = _lz77_value(br, s - _GREEN_LITERALS)
            dist_code = _lz77_value(br, d_code.read(br))
            if dist_code <= 120:
                raise NotImplementedError(
                    "VP8L 2D distance mapping (plane codes 1..120) not "
                    "implemented — refusing rather than guessing the "
                    "120-entry neighborhood table"
                )
            dist = dist_code - 120
            if dist > i or i + length > n:
                raise ValueError("VP8L backward reference out of range")
            for _ in range(length):
                emit(tuple(out[i - dist]))
        else:
            if cache is None:
                raise ValueError("color-cache symbol without a cache")
            argb = cache[s - _GREEN_LITERALS - _LENGTH_CODES]
            emit(((argb >> 16) & 0xFF, (argb >> 8) & 0xFF,
                  argb & 0xFF, (argb >> 24) & 0xFF))
    px = out.reshape(h, w, 4)
    if subtract_green:
        px = px.astype(np.int16)
        px[:, :, 0] = (px[:, :, 0] + px[:, :, 1]) % 256
        px[:, :, 2] = (px[:, :, 2] + px[:, :, 1]) % 256
        px = px.astype(np.uint8)
    return px[:, :, :3].copy()
