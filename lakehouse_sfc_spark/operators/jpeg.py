"""Baseline JPEG (ITU-T T.81 / JFIF) encode + decode in pure numpy.

Scope: 8-bit baseline sequential DCT, grayscale or RGB without chroma
subsampling (SOF0, h=v=1, one interleaved scan).  That covers our own
encoder's output and any other baseline non-subsampled stream; progressive
or subsampled files raise ``NotImplementedError`` with a clear message.

Design choices:
- **Huffman tables travel in the stream** (DHT), as the format requires, so
  the encoder is free to use simple tables: every symbol is coded at a
  fixed 8-bit length, which is a *valid canonical Huffman code* (Kraft sum
  n/256 <= 1 for n <= 255 symbols, and the last canonical code never hits
  the reserved all-ones pattern).  Files are larger than libjpeg's
  entropy-optimal output but decode in any compliant reader; OUR decoder
  reads arbitrary canonical DHT tables, not just these.
- Quantization uses the Annex-K-style luminance/chrominance matrices with
  the libjpeg quality scaling (5000/Q below 50, 200-2Q above).
- DCT/IDCT are exact float64 matrix products with a fixed evaluation
  order; quantization rounds half-away-from-zero — fully deterministic.
- Byte stuffing (0xFF -> 0xFF 0x00) in the entropy segment, restart
  markers unsupported (never emitted by us).

This closes the "compressed image codecs need external libraries" boundary
for JPEG the way layout/bloom closed it for point lookups: entropy coding,
DCT, and the container are all standard public math.  MP3 remains out of
scope (psychoacoustic model + filterbank is a different project).
"""

from __future__ import annotations

import struct

import numpy as np

# --- constants --------------------------------------------------------------

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

_Q_LUM = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.float64,
).reshape(8, 8)

_Q_CHROM = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.float64,
).reshape(8, 8)

# DCT basis: D[k, n] = c(k) * cos((2n+1) k pi / 16)
_D = np.zeros((8, 8))
for _k in range(8):
    _c = np.sqrt(0.5) if _k == 0 else 1.0
    for _n in range(8):
        _D[_k, _n] = 0.5 * _c * np.cos((2 * _n + 1) * _k * np.pi / 16.0)

#: entropy symbols we may emit: DC categories 0..11, AC (run,size) bytes
_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    q = max(1, min(100, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (_Q_LUM, _Q_CHROM):
        t = np.floor((base * scale + 50) / 100)
        out.append(np.clip(t, 1, 255))
    return out[0], out[1]


# --- bit I/O with byte stuffing ---------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, length: int) -> int:
        while self.nbits < length:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy stream truncated")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("JPEG entropy stream truncated at 0xFF")
                marker = self.data[self.pos]
                self.pos += 1
                if marker != 0x00:
                    raise NotImplementedError(
                        f"unexpected marker 0xFF{marker:02X} inside scan "
                        "(restart intervals unsupported)"
                    )
            self.acc = (self.acc << 8) | byte
            self.nbits += 8
        val = (self.acc >> (self.nbits - length)) & ((1 << length) - 1)
        self.nbits -= length
        self.acc &= (1 << self.nbits) - 1
        return val


# --- canonical Huffman ------------------------------------------------------


def _fixed_table(symbols: list[int]) -> tuple[list[int], list[int]]:
    """(bits[1..16], symbols) with EVERY symbol at code length 8 — a valid
    canonical Huffman table for up to 255 symbols."""
    assert len(symbols) <= 255
    bits = [0] * 16
    bits[7] = len(symbols)  # index 7 == length 8
    return bits, list(symbols)


def _canonical_codes(bits: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical construction."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    i = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[symbols[i]] = (code, ln)
            code += 1
            i += 1
        code <<= 1
    return codes


class _HuffDecoder:
    """Canonical Huffman decoder: (length -> first code, symbol offset)."""

    def __init__(self, bits: list[int], symbols: list[int]) -> None:
        self.min_code = [0] * 17
        self.max_code = [-1] * 17
        self.val_off = [0] * 17
        self.symbols = symbols
        code = 0
        i = 0
        for ln in range(1, 17):
            n = bits[ln - 1]
            if n:
                self.val_off[ln] = i
                self.min_code[ln] = code
                self.max_code[ln] = code + n - 1
                code += n
                i += n
            else:
                self.max_code[ln] = -1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | br.read(1)
            if self.max_code[ln] >= 0 and code <= self.max_code[ln] and (
                code >= self.min_code[ln]
            ):
                return self.symbols[self.val_off[ln] + code - self.min_code[ln]]
        raise ValueError("invalid Huffman code in JPEG stream")


def _magnitude(v: int) -> tuple[int, int]:
    """(category, extra bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    extra = v if v > 0 else v + (1 << size) - 1
    return size, extra


def _extend(extra: int, size: int) -> int:
    if size == 0:
        return 0
    if extra < (1 << (size - 1)):
        return extra - (1 << size) + 1
    return extra


# --- color transforms -------------------------------------------------------


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r = px[..., 0].astype(np.float64)
    g = px[..., 1].astype(np.float64)
    b = px[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0]
    cb = ycc[..., 1] - 128.0
    cr = ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


# --- encoder ----------------------------------------------------------------


def _table_segments(gray: bool, qlum: np.ndarray, qchrom: np.ndarray) -> bytes:
    """DQT + DHT marker segments (the part JPEGTables-style containers
    hoist out of per-strip streams; T.81 Annex B.5 'abbreviated format')."""
    out = bytearray()
    tabs = [(0, qlum)] + ([] if gray else [(1, qchrom)])
    for tid, t in tabs:
        zz = t.reshape(-1)[_ZIGZAG].astype(np.uint8).tobytes()
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + zz
    for cls, (bits, symbols) in (
        (0, _fixed_table(_DC_SYMBOLS)),
        (1, _fixed_table(_AC_SYMBOLS)),
    ):
        body = bytes([cls << 4]) + bytes(bits) + bytes(symbols)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    return bytes(out)


def jpeg_tables_stream(quality: int = 85, gray: bool = False) -> bytes:
    """Abbreviated table-specification stream (SOI + DQT/DHT + EOI) — the
    exact payload TIFF stores in the JPEGTables tag (347) so per-strip
    streams can omit their tables."""
    qlum, qchrom = _quality_tables(quality)
    return b"\xff\xd8" + _table_segments(gray, qlum, qchrom) + b"\xff\xd9"


def encode_jpeg(
    pixels: np.ndarray, quality: int = 85, omit_tables: bool = False
) -> bytes:
    """HxW (grayscale) or HxWx3 (RGB) uint8 -> baseline JFIF bytes.
    ``omit_tables=True`` writes an abbreviated image stream (no DQT/DHT —
    T.81 Annex B.5) whose tables live in a companion
    ``jpeg_tables_stream``; decode by splicing the table segments back in
    after SOI (see tiff.py's JPEGTables handling)."""
    gray = pixels.ndim == 2
    if not gray and (pixels.ndim != 3 or pixels.shape[2] != 3):
        raise ValueError("encode_jpeg expects HxW or HxWx3 uint8")
    h, w = pixels.shape[:2]
    qlum, qchrom = _quality_tables(quality)

    if gray:
        planes = [pixels.astype(np.float64)]
        qtabs = [qlum]
        qids = [0]
    else:
        ycc = _rgb_to_ycbcr(pixels)
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
        qtabs = [qlum, qchrom, qchrom]
        qids = [0, 1, 1]

    # pad to 8x8 blocks by edge replication
    bh, bw = (h + 7) // 8, (w + 7) // 8
    padded = []
    for p in planes:
        pp = np.pad(p, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
        padded.append(pp - 128.0)

    dc_codes = _canonical_codes(*_fixed_table(_DC_SYMBOLS))
    ac_codes = _canonical_codes(*_fixed_table(_AC_SYMBOLS))

    bwr = _BitWriter()
    prev_dc = [0] * len(planes)
    for by in range(bh):
        for bx in range(bw):
            for ci, plane in enumerate(padded):
                block = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                coef = _D @ block @ _D.T
                q = coef / qtabs[ci]
                quant = np.sign(q) * np.floor(np.abs(q) + 0.5)
                zz = quant.reshape(-1)[_ZIGZAG].astype(np.int64)

                diff = int(zz[0]) - prev_dc[ci]
                prev_dc[ci] = int(zz[0])
                size, extra = _magnitude(diff)
                code, ln = dc_codes[size]
                bwr.write(code, ln)
                bwr.write(extra, size)

                run = 0
                last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
                for i in range(1, 64):
                    v = int(zz[i])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_codes[0xF0]  # ZRL
                        bwr.write(code, ln)
                        run -= 16
                    size, extra = _magnitude(v)
                    code, ln = ac_codes[(run << 4) | size]
                    bwr.write(code, ln)
                    bwr.write(extra, size)
                    run = 0
                if last_nz < 63 or int(zz[63]) == 0:
                    code, ln = ac_codes[0x00]  # EOB
                    bwr.write(code, ln)
    scan = bwr.flush()

    # --- container ---
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(
        ">H5sBBBHHBB", 16, b"JFIF\x00", 1, 1, 0, 1, 1, 0, 0
    )
    if not omit_tables:
        # DQT + DHT (DC table 0, AC table 0, shared by all components)
        out += _table_segments(gray, qlum, qchrom)
    # SOF0
    ncomp = 1 if gray else 3
    sof = struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += struct.pack("BBB", ci + 1, 0x11, qids[ci])
    out += b"\xff\xc0" + sof
    # SOS
    sos = struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        sos += struct.pack("BB", ci + 1, 0x00)  # DC table 0, AC table 0
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + sos
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder ----------------------------------------------------------------


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> HxW (grayscale) or HxWx3 (RGB) uint8.
    Non-subsampled baseline only; progressive/subsampled raise."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    h = w = None
    comps: list[tuple[int, int, int]] = []  # (id, sampling, qid)
    scan_comps: list[tuple[int, int, int]] = []  # (id, dc_tid, ac_tid)
    scan_start = None

    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            o = 0
            while o < len(body):
                pq, tid = body[o] >> 4, body[o] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                t = np.zeros(64)
                t[_ZIGZAG] = np.frombuffer(body[o + 1 : o + 65], dtype=np.uint8)
                qtables[tid] = t.reshape(8, 8)
                o += 65
        elif marker == 0xC0:  # SOF0 baseline
            _prec, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            comps = []
            for ci in range(ncomp):
                cid, samp, qid = struct.unpack_from(
                    "BBB", body, 6 + 3 * ci
                )
                if samp != 0x11:
                    raise NotImplementedError(
                        "chroma subsampling unsupported (h=v=1 only)"
                    )
                comps.append((cid, samp, qid))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA):
            raise NotImplementedError(
                f"only baseline sequential JPEG supported (SOF 0x{marker:02X})"
            )
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(body):
                cls, tid = body[o] >> 4, body[o] & 0x0F
                bits = list(body[o + 1 : o + 17])
                n = sum(bits)
                symbols = list(body[o + 17 : o + 17 + n])
                huff[(cls, tid)] = _HuffDecoder(bits, symbols)
                o += 17 + n
        elif marker == 0xDA:  # SOS
            ncomp = body[0]
            scan_comps = []
            for ci in range(ncomp):
                cid = body[1 + 2 * ci]
                tids = body[2 + 2 * ci]
                scan_comps.append((cid, tids >> 4, tids & 0x0F))
            scan_start = pos + 2 + seglen
            break
        elif marker == 0xDD:
            raise NotImplementedError("restart intervals unsupported")
        pos += 2 + seglen

    if h is None or scan_start is None:
        raise ValueError("JPEG missing SOF/SOS")

    # find EOI so the bit reader never walks past the entropy data
    end = payload.rfind(b"\xff\xd9")
    br = _BitReader(payload[scan_start : end if end > 0 else len(payload)])

    ncomp = len(scan_comps)
    bh, bw = (h + 7) // 8, (w + 7) // 8
    planes = [np.zeros((bh * 8, bw * 8)) for _ in range(ncomp)]
    prev_dc = [0] * ncomp
    qid_by_cid = {cid: qid for cid, _s, qid in comps}

    for by in range(bh):
        for bx in range(bw):
            for ci, (cid, dc_tid, ac_tid) in enumerate(scan_comps):
                dc_dec = huff[(0, dc_tid)]
                ac_dec = huff[(1, ac_tid)]
                zz = np.zeros(64, dtype=np.int64)
                size = dc_dec.decode(br)
                diff = _extend(br.read(size), size)
                prev_dc[ci] += diff
                zz[0] = prev_dc[ci]
                i = 1
                while i < 64:
                    sym = ac_dec.decode(br)
                    if sym == 0x00:  # EOB
                        break
                    if sym == 0xF0:  # ZRL
                        i += 16
                        continue
                    run, size = sym >> 4, sym & 0x0F
                    i += run
                    if i > 63:
                        raise ValueError("AC run overflows block")
                    zz[i] = _extend(br.read(size), size)
                    i += 1
                block = np.zeros(64)
                block[_ZIGZAG] = zz
                coef = block.reshape(8, 8) * qtables[qid_by_cid[cid]]
                planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _D.T @ coef @ _D
                )

    planes = [p[:h, :w] + 128.0 for p in planes]
    if ncomp == 1:
        return np.clip(np.floor(planes[0] + 0.5), 0, 255).astype(np.uint8)
    return _ycbcr_to_rgb(np.stack(planes, axis=-1))
