"""Multimodal column handling: image/audio/video travel as opaque ``binary``
columns with typed metadata; decode / feature-extract / frame-sample run as
Arrow-batched ``mapInPandas`` stages (the only place Python belongs in the
pipeline — everything before and after stays JVM-side).

Codec support without external libraries: uncompressed formats are parsed
natively here — 24-bit BI_RGB **BMP** (``decode_bmp``/``encode_bmp``,
nearest-neighbor ``resize_bmp``) and PCM 16-bit **WAV**
(``decode_wav``/``encode_wav_pcm16``) — pure struct/numpy, no Pillow or
torchaudio needed.  ``decode_image``/``decode_audio`` dispatch on the magic
bytes and raise ``NotImplementedError`` only for formats that genuinely
require a codec library this container lacks (JPEG/MP3/...).  **PNG** is
REAL too (``decode_png``/``encode_png``): DEFLATE comes from the stdlib
``zlib``, chunk CRCs are checked, and all five scanline filters decode.
``decode_real_batches`` is the production ``mapInPandas`` kernel over these
codecs.

The ``*_stub_batches`` variants remain the deterministic fakes used by the
oracle-paired registry queries: the synthetic ``documents.payload`` bytes
are not real media, and the stubs' outputs are SQL-reproducible so the
DuckDB oracle can check the Spark-side plumbing exactly.

Scale notes: mapInPandas streams Arrow record batches, so peak executor
memory is one batch of payloads, not one partition; keep
``spark.sql.execution.arrow.maxRecordsPerBatch`` sized to the payload width
(e.g. 64 for ~4 MB images).  Decode is embarrassingly parallel — no shuffle.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterable, Iterator

import numpy as np
import pandas as pd

DECODED_SCHEMA = (
    "doc_id bigint, n_bytes bigint, checksum string, "
    "width int, height int, frames int"
)


# --- real codecs: uncompressed BMP (24-bit BI_RGB) -------------------------


def encode_bmp(pixels: "np.ndarray") -> bytes:
    """HxWx3 uint8 RGB array → 24-bit uncompressed BMP (BITMAPINFOHEADER,
    bottom-up rows, BGR order, rows padded to 4 bytes)."""
    h, w, c = pixels.shape
    if c != 3:
        raise ValueError("encode_bmp expects HxWx3 RGB")
    row_size = (w * 3 + 3) & ~3
    image_size = row_size * h
    # rows bottom-up, channels BGR, pad each row to a 4-byte boundary
    bgr = pixels[::-1, :, ::-1].astype(np.uint8)
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + image_size, 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, image_size, 2835, 2835, 0, 0
    )
    return header + rows.tobytes()


def decode_bmp(payload: bytes) -> "np.ndarray":
    """24-bit uncompressed BMP → HxWx3 uint8 RGB array.  Handles bottom-up
    and top-down (negative height) row order and row padding."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only 24-bit uncompressed BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    top_down = h < 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    raw = np.frombuffer(payload, dtype=np.uint8, count=row_size * h, offset=data_off)
    rows = raw.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


def resize_bmp(payload: bytes, out_w: int, out_h: int) -> bytes:
    """Real nearest-neighbor resize: decode → numpy index-sample → re-encode.
    Same geometry contract as ``resize_stub_batches``."""
    px = decode_bmp(payload)
    h, w = px.shape[:2]
    yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return encode_bmp(px[yi][:, xi])


# --- real codecs: PCM 16-bit WAV -------------------------------------------


def encode_wav_pcm16(samples: "np.ndarray", sample_rate: int = 16_000) -> bytes:
    """int16 mono (n,) or multichannel (n, ch) array → RIFF/WAVE PCM16."""
    s = np.asarray(samples, dtype="<i2")
    ch = 1 if s.ndim == 1 else s.shape[1]
    data = s.tobytes()
    byte_rate = sample_rate * ch * 2
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
        + struct.pack(
            "<4sIHHIIHH", b"fmt ", 16, 1, ch, sample_rate, byte_rate, ch * 2, 16
        )
        + struct.pack("<4sI", b"data", len(data))
        + data
    )


def decode_wav(payload: bytes) -> tuple[int, "np.ndarray"]:
    """RIFF/WAVE PCM 16-bit → (sample_rate, int16 array (n,) or (n, ch)).
    Walks RIFF chunks, so extra chunks (LIST/fact/...) are tolerated."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, end = 12, len(payload)
    fmt = None
    data = None
    while pos + 8 <= end:
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, ch, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(
            f"only PCM 16-bit WAV supported (format={audio_format}, bits={bits})"
        )
    s = np.frombuffer(data, dtype="<i2")
    if ch > 1:
        s = s[: len(s) - len(s) % ch].reshape(-1, ch)
    return sample_rate, s


# --- real codecs: PNG (8-bit RGB/RGBA/gray, zlib is stdlib) ----------------

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

#: color type → samples per pixel (palette/interlace unsupported)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: "np.ndarray", level: int = 6) -> bytes:
    """HxWx3 (RGB) or HxWx4 (RGBA) uint8 array → real PNG: IHDR + one
    zlib-compressed IDAT of filter-type-0 scanlines + IEND, CRCs included.
    Compression is genuine DEFLATE via the stdlib ``zlib``."""
    import zlib

    h, w = pixels.shape[:2]
    ch = 1 if pixels.ndim == 2 else pixels.shape[2]
    color = {1: 0, 3: 2, 4: 6}.get(ch)
    if color is None:
        raise ValueError("encode_png expects HxW, HxWx3, or HxWx4 uint8")
    flat = pixels.reshape(h, w * ch).astype(np.uint8)
    raw = b"".join(b"\x00" + flat[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, level))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: "np.ndarray", b: "np.ndarray", c: "np.ndarray") -> "np.ndarray":
    """Paeth predictor, vectorized over one scanline (int16 math)."""
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(payload: bytes) -> "np.ndarray":
    """Real PNG decode for 8-bit non-interlaced gray/RGB/RGBA: walks chunks
    (CRC-checked), inflates the concatenated IDAT stream, and reverses all
    five scanline filters (None/Sub/Up/Average/Paeth) with numpy per-line
    arithmetic.  Palette and interlaced images raise NotImplementedError."""
    import zlib

    if payload[: len(_PNG_MAGIC)] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos = len(_PNG_MAGIC)
    idat = bytearray()
    w = h = None
    ch = 1
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or color not in _PNG_CHANNELS or interlace:
                raise NotImplementedError(
                    f"only 8-bit non-interlaced gray/RGB/RGBA PNG supported "
                    f"(depth={depth}, color={color}, interlace={interlace})"
                )
            ch = _PNG_CHANNELS[color]
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if w is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG IDAT length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        if ftype == 1:  # Sub — sequential in pixel units
            for x in range(ch, stride):
                line[x] = (int(line[x]) + int(line[x - ch])) & 0xFF
        elif ftype == 2:  # Up
            line = (line.astype(np.int16) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            for x in range(stride):
                left = int(line[x - ch]) if x >= ch else 0
                line[x] = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = int(line[x - ch]) if x >= ch else 0
                ul = int(prev[x - ch]) if x >= ch else 0
                line[x] = (
                    int(line[x])
                    + int(
                        _paeth(
                            np.uint8(left), prev[x : x + 1][0], np.uint8(ul)
                        )
                    )
                ) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = line
        prev = out[y]
    if ch == 1:
        return out.reshape(h, w)
    return out.reshape(h, w, ch)


def decode_image(payload: bytes) -> "np.ndarray":
    """Image decode (bytes → uint8 array).  BMP, PNG (stdlib zlib DEFLATE),
    baseline JPEG (pure-numpy DCT + canonical Huffman, operators/jpeg.py),
    GIF (LZW), TIFF (operators/tiff.py), ICO containers
    (operators/ico.py: largest entry, PNG or DIB storage) and lossless
    WebP (operators/webp.py: VP8L prefix codes, color cache, subtract-
    green) all decode natively."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[: len(_PNG_MAGIC)] == _PNG_MAGIC:
        return decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        from lakehouse_sfc_spark.operators.jpeg import decode_jpeg

        return decode_jpeg(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from lakehouse_sfc_spark.operators.gif import decode_gif

        return decode_gif(payload)
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        from lakehouse_sfc_spark.operators.tiff import decode_tiff

        return decode_tiff(payload)
    if payload[:4] == b"\x00\x00\x01\x00":
        from lakehouse_sfc_spark.operators.ico import decode_ico

        return decode_ico(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        from lakehouse_sfc_spark.operators.webp import decode_webp

        return decode_webp(payload)
    if payload[:4] == b"qoif":
        from lakehouse_sfc_spark.operators.qoi import decode_qoi

        return decode_qoi(payload)
    raise NotImplementedError(
        "BMP, PNG, GIF, TIFF, ICO, QOI, lossless WebP (VP8L) and baseline "
        "JPEG decode natively; other image formats are not supported in "
        "this environment"
    )


def decode_audio(payload: bytes) -> tuple[int, "np.ndarray"]:
    """Audio decode (bytes → (sample_rate, waveform)).  PCM WAV is decoded
    natively; compressed formats would need an audio codec."""
    if payload[:4] == b"RIFF":
        return decode_wav(payload)
    raise NotImplementedError(
        "only PCM 16-bit WAV decodes natively; compressed audio codecs "
        "(MP3/AAC/...) are not available in this environment"
    )


def decode_real_batches(
    batches: Iterable[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Production decode kernel: sniff each payload's magic bytes and decode
    natively-supported formats (BMP → real width/height, frames=1; WAV →
    frames=sample count).  Unsupported payloads pass through with metadata
    untouched and frames=0 — a real pipeline routes those to a codec-backed
    variant of this same kernel.  Emits DECODED_SCHEMA, same as the stub."""
    for pdf in batches:
        out = {
            "doc_id": [],
            "n_bytes": [],
            "checksum": [],
            "width": [],
            "height": [],
            "frames": [],
        }
        for doc_id, payload, w, h in zip(
            pdf["doc_id"], pdf["payload"], pdf["width"], pdf["height"]
        ):
            b = bytes(payload)
            out["doc_id"].append(int(doc_id))
            out["n_bytes"].append(len(b))
            out["checksum"].append(hashlib.md5(b).hexdigest())
            if b[:2] == b"BM":
                px = decode_bmp(b)
                out["height"].append(px.shape[0])
                out["width"].append(px.shape[1])
                out["frames"].append(1)
            elif b[: len(_PNG_MAGIC)] == _PNG_MAGIC:
                px = decode_png(b)
                out["height"].append(px.shape[0])
                out["width"].append(px.shape[1])
                out["frames"].append(1)
            elif b[:2] == b"\xff\xd8":
                from lakehouse_sfc_spark.operators.jpeg import decode_jpeg

                px = decode_jpeg(b)
                out["height"].append(px.shape[0])
                out["width"].append(px.shape[1])
                out["frames"].append(1)
            elif b[:6] in (b"GIF87a", b"GIF89a"):
                from lakehouse_sfc_spark.operators.gif import decode_gif

                px = decode_gif(b)
                out["height"].append(px.shape[0])
                out["width"].append(px.shape[1])
                out["frames"].append(1)
            elif b[:4] in (b"II*\x00", b"MM\x00*"):
                from lakehouse_sfc_spark.operators.tiff import decode_tiff

                px = decode_tiff(b)
                out["height"].append(px.shape[0])
                out["width"].append(px.shape[1])
                out["frames"].append(1)
            elif b[:4] == b"RIFF":
                _, samples = decode_wav(b)
                out["width"].append(int(w))
                out["height"].append(int(h))
                out["frames"].append(int(samples.shape[0]))
            else:
                out["width"].append(int(w))
                out["height"].append(int(h))
                out["frames"].append(0)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                "n_bytes": pd.Series(out["n_bytes"], dtype="int64"),
                "checksum": pd.Series(out["checksum"], dtype="object"),
                "width": pd.Series(out["width"], dtype="int32"),
                "height": pd.Series(out["height"], dtype="int32"),
                "frames": pd.Series(out["frames"], dtype="int32"),
            }
        )


RESIZED_SCHEMA = "doc_id bigint, width int, height int, out_w int, out_h int"

_RESIZE_TARGET = 224


def resize_stub_batches(
    batches: Iterable[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Aspect-preserving resize-to-fit-224 metadata transform.  A real
    resize would interpolate pixel arrays here (Pillow — not in this
    container); the output geometry arithmetic IS the production logic and
    uses only double multiply + floor so a SQL oracle reproduces it
    bit-for-bit."""
    for pdf in batches:
        w = pdf["width"].astype("float64")
        h = pdf["height"].astype("float64")
        scale = _RESIZE_TARGET / w.combine(h, max)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "width": pdf["width"].astype("int32"),
                "height": pdf["height"].astype("int32"),
                "out_w": (w * scale).map(int).clip(lower=1).astype("int32"),
                "out_h": (h * scale).map(int).clip(lower=1).astype("int32"),
            }
        )


AUDIO_SCHEMA = (
    "doc_id bigint, n_samples bigint, duration_s double, crossings bigint"
)

_SAMPLE_RATE = 16_000.0
_THRESHOLD_BYTE = 0x20  # 'space' as the stand-in amplitude threshold


def audio_features_stub_batches(
    batches: Iterable[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Audio feature extraction with the payload treated as a PCM-ish byte
    stream: sample count, duration at 16 kHz, and threshold-crossing count
    (the zero-crossing-rate shape).  A real pipeline swaps in a codec +
    DSP kernel; batch shape and schema stay identical."""
    for pdf in batches:
        payloads = pdf["payload"]
        n = payloads.map(len).astype("int64")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_samples": n,
                "duration_s": n / _SAMPLE_RATE,
                "crossings": payloads.map(
                    lambda b: bytes(b).count(_THRESHOLD_BYTE)
                ).astype("int64"),
            }
        )


def decode_stub_batches(
    batches: Iterable[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Deterministic fake decoder with the exact shape of a real one: consumes
    Arrow batches of (doc_id, payload binary, width int, height int), emits
    DECODED_SCHEMA.  ``checksum``/``frames`` derive only from the payload
    bytes so a SQL oracle can reproduce them."""
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": payloads.map(len).astype("int64"),
                "checksum": payloads.map(
                    lambda b: hashlib.md5(bytes(b)).hexdigest()
                ),
                "width": pdf["width"].astype("int32"),
                "height": pdf["height"].astype("int32"),
                "frames": (payloads.map(len) % 7 + 1).astype("int32"),
            }
        )


# --- real-codec correctness fixtures ---------------------------------------
#
# The synthetic documents.payload bytes are not media, so the four stub
# queries above can't exercise the REAL codecs.  These kernels close that
# gap: deterministic pixel/sample grids derived from doc_id are encoded with
# the real encoders and pushed through the real decoders, and every output
# column is a closed-form function of doc_id that a SQL oracle reproduces
# exactly — so the real BMP/WAV paths get driver-checkable correctness rows.

DECODED_STATS_SCHEMA = (
    "doc_id bigint, n_bytes bigint, width int, height int, frames int, "
    "pixel_sum bigint"
)


def _synth_pixels(doc_id: int, w: int, h: int) -> "np.ndarray":
    """Deterministic RGB grid: v(x, y) = (3x + 7y + doc_id) % 251 in all
    three channels.  Position-dependent values make row order, padding, and
    BGR/RGB mistakes visible in pixel_sum and in any single pixel."""
    x = np.arange(w, dtype=np.int64)
    y = np.arange(h, dtype=np.int64)
    v = ((3 * x[None, :] + 7 * y[:, None] + doc_id) % 251).astype(np.uint8)
    return np.repeat(v[:, :, None], 3, axis=2)


def synth_image_batches(
    batches: Iterable[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """(doc_id, width, height) → (doc_id, payload, width, height) with the
    payload a REAL 24-bit BMP of the deterministic grid."""
    for pdf in batches:
        payloads = [
            encode_bmp(_synth_pixels(int(d), int(w), int(h)))
            for d, w, h in zip(pdf["doc_id"], pdf["width"], pdf["height"])
        ]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "payload": pd.Series(payloads, dtype="object"),
                "width": pdf["width"].astype("int32"),
                "height": pdf["height"].astype("int32"),
            }
        )


def decode_real_stats_batches(
    batches: Iterable[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """The production image-decode dispatch (``decode_image``) plus
    ``pixel_sum`` (sum over the decoded pixel array) as the content check.
    Works for any natively-decodable image format (BMP, PNG, GIF, TIFF,
    JPEG).  Decodes each payload exactly ONCE — an earlier version ran
    ``decode_real_batches`` for metadata and decoded again for the sum,
    doubling the codec CPU that dominates these queries (the geometry
    comes from the same decoded array, so the outputs are identical)."""
    for pdf in batches:
        rows: dict[str, list] = {
            "doc_id": [], "n_bytes": [], "width": [],
            "height": [], "frames": [], "pixel_sum": [],
        }
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = bytes(payload)
            px = decode_image(b)
            rows["doc_id"].append(int(doc_id))
            rows["n_bytes"].append(len(b))
            rows["width"].append(px.shape[1])
            rows["height"].append(px.shape[0])
            rows["frames"].append(1)
            rows["pixel_sum"].append(int(px.astype("int64").sum()))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                "n_bytes": pd.Series(rows["n_bytes"], dtype="int64"),
                "width": pd.Series(rows["width"], dtype="int32"),
                "height": pd.Series(rows["height"], dtype="int32"),
                "frames": pd.Series(rows["frames"], dtype="int32"),
                "pixel_sum": pd.Series(rows["pixel_sum"], dtype="int64"),
            }
        )


def synth_png_batches(
    batches: Iterable[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """(doc_id, width, height) → (doc_id, payload, width, height) with the
    payload a REAL zlib-compressed PNG of the deterministic grid."""
    for pdf in batches:
        payloads = [
            encode_png(_synth_pixels(int(d), int(w), int(h)))
            for d, w, h in zip(pdf["doc_id"], pdf["width"], pdf["height"])
        ]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "payload": pd.Series(payloads, dtype="object"),
                "width": pdf["width"].astype("int32"),
                "height": pdf["height"].astype("int32"),
            }
        )


def synth_jpeg_batches(
    batches: Iterable[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """(doc_id, width, height) → (doc_id, payload, width, height) with the
    payload a REAL baseline JPEG of the deterministic grid."""
    from lakehouse_sfc_spark.operators.jpeg import encode_jpeg

    for pdf in batches:
        payloads = [
            encode_jpeg(_synth_pixels(int(d), int(w), int(h)), quality=90)
            for d, w, h in zip(pdf["doc_id"], pdf["width"], pdf["height"])
        ]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "payload": pd.Series(payloads, dtype="object"),
                "width": pdf["width"].astype("int32"),
                "height": pdf["height"].astype("int32"),
            }
        )


def synth_gif_batches(
    batches: Iterable[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """(doc_id, width, height) → (doc_id, payload, width, height) with the
    payload a REAL LZW-compressed GIF87a of the deterministic grid (the
    grid is grayscale, so the index image under the grayscale palette IS
    the pixel value — decode returns it in all three channels)."""
    from lakehouse_sfc_spark.operators.gif import encode_gif

    for pdf in batches:
        payloads = [
            encode_gif(_synth_pixels(int(d), int(w), int(h))[:, :, 0])
            for d, w, h in zip(pdf["doc_id"], pdf["width"], pdf["height"])
        ]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "payload": pd.Series(payloads, dtype="object"),
                "width": pdf["width"].astype("int32"),
                "height": pdf["height"].astype("int32"),
            }
        )


def synth_tiff_batches(
    batches: Iterable[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """(doc_id, width, height) → (doc_id, payload, width, height) with the
    payload a REAL multi-strip RGB TIFF of the deterministic grid (the
    scanned-document master format; operators/tiff.py).  The compression
    ROTATES by doc_id across all five supported codecs — every registry
    run decodes uncompressed, PackBits, LZW, Deflate and new-style JPEG
    strips through the one production kernel.  LZW/Deflate docs carry the
    horizontal-differencing predictor (tag 317, the common libtiff
    pairing); JPEG docs alternate between standalone per-strip streams
    and the abbreviated JPEGTables (tag 347) layout; a third of the docs
    are big-endian (MM) files so both byte orders flow through the
    decoder every run."""
    from lakehouse_sfc_spark.operators.tiff import encode_tiff

    comps = ("none", "packbits", "lzw", "deflate", "jpeg")
    for pdf in batches:
        payloads = []
        for d, w, h in zip(pdf["doc_id"], pdf["width"], pdf["height"]):
            comp = comps[int(d) % 5]
            payloads.append(
                encode_tiff(
                    _synth_pixels(int(d), int(w), int(h)),
                    compression=comp,
                    predictor=2 if comp in ("lzw", "deflate") else 1,
                    jpeg_tables=bool((int(d) // 11) % 2),
                    byteorder="MM" if (int(d) // 11) % 3 == 0 else "II",
                )
            )
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "payload": pd.Series(payloads, dtype="object"),
                "width": pdf["width"].astype("int32"),
                "height": pdf["height"].astype("int32"),
            }
        )


def synth_ico_batches(
    batches: Iterable[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """(doc_id, width, height) → (doc_id, payload, width, height) with the
    payload a REAL two-entry ICO of the deterministic grid: a half-size
    thumbnail entry listed FIRST plus the full-size entry, so the decoder's
    largest-entry selection is exercised on every row.  The storage of both
    entries ROTATES by doc_id across all three supported representations —
    24-bpp DIB, 32-bpp BGRA DIB and PNG-in-ICO (operators/ico.py)."""
    from lakehouse_sfc_spark.operators.ico import encode_ico

    storages = ("dib24", "dib32", "png")
    for pdf in batches:
        payloads = []
        for d, w, h in zip(pdf["doc_id"], pdf["width"], pdf["height"]):
            st = storages[int(d) % 3]
            full = _synth_pixels(int(d), int(w), int(h))
            thumb = _synth_pixels(
                int(d), max(1, int(w) // 2), max(1, int(h) // 2)
            )
            payloads.append(encode_ico([thumb, full], [st, st]))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "payload": pd.Series(payloads, dtype="object"),
                "width": pdf["width"].astype("int32"),
                "height": pdf["height"].astype("int32"),
            }
        )


def synth_qoi_batches(
    batches: Iterable[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """(doc_id, width, height) → (doc_id, payload, width, height) with the
    payload a REAL QOI 1.0 stream of the deterministic grid
    (operators/qoi.py).  The +3-per-column gray gradient keeps the encoder
    in 2-byte QOI_OP_LUMA for most pixels (the step exceeds DIFF's 2-bit
    range), the mod-251 wrap hits QOI_OP_RGB and revisited colors hit
    QOI_OP_INDEX — every grid exercises LUMA/INDEX/RGB decode, and DIFF is
    pinned by the golden fixture in pytest."""
    from lakehouse_sfc_spark.operators.qoi import encode_qoi

    for pdf in batches:
        payloads = [
            encode_qoi(_synth_pixels(int(d), int(w), int(h)))
            for d, w, h in zip(pdf["doc_id"], pdf["width"], pdf["height"])
        ]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "payload": pd.Series(payloads, dtype="object"),
                "width": pdf["width"].astype("int32"),
                "height": pdf["height"].astype("int32"),
            }
        )


def synth_webp_batches(
    batches: Iterable[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """(doc_id, width, height) → (doc_id, payload, width, height) with the
    payload a REAL lossless WebP (VP8L) of the deterministic grid —
    canonical per-channel prefix codes under the subtract-green transform
    (operators/webp.py), which collapses the channel-correlated grids'
    red/blue planes to zero-bit codes (~3x smaller than raw).  Every other
    doc skips the transform so both decode paths run every registry
    sweep."""
    from lakehouse_sfc_spark.operators.webp import encode_webp

    for pdf in batches:
        payloads = [
            encode_webp(
                _synth_pixels(int(d), int(w), int(h)),
                subtract_green=bool(int(d) % 2 == 0),
            )
            for d, w, h in zip(pdf["doc_id"], pdf["width"], pdf["height"])
        ]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "payload": pd.Series(payloads, dtype="object"),
                "width": pdf["width"].astype("int32"),
                "height": pdf["height"].astype("int32"),
            }
        )


def tiff_stats_fidelity_batches(
    batches: Iterable[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Content check for rotating-compression TIFFs: decode through the
    production kernel and verify against the re-synthesized source grid.
    Lossless strips (none/PackBits/LZW/Deflate) must match BIT-EXACTLY and
    report the exact pixel_sum; JPEG strips (tag 7) are lossy, so they
    report the -1 sentinel and a PSNR >= 30 dB fidelity gate instead (the
    codec clears it by ~20 dB — see multimodal_jpeg_real).  Lossiness is
    sniffed from the payload's compression tag, never from metadata."""
    from lakehouse_sfc_spark.operators.tiff import (
        decode_tiff,
        tiff_compression,
    )

    for pdf in batches:
        rows: dict[str, list] = {
            "doc_id": [], "width": [], "height": [],
            "frames": [], "pixel_sum": [], "fidelity_ok": [],
        }
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            raw = bytes(payload)
            px = decode_tiff(raw)
            h, w = px.shape[:2]
            src = _synth_pixels(int(doc_id), w, h)
            if tiff_compression(raw) == 7:
                mse = float(np.mean((px.astype(np.float64) - src) ** 2))
                psnr = 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)
                pixel_sum, fid = -1, bool(psnr >= 30.0)
            else:
                pixel_sum = int(px.astype("int64").sum())
                fid = bool((px == src).all())
            rows["doc_id"].append(int(doc_id))
            rows["width"].append(w)
            rows["height"].append(h)
            rows["frames"].append(1)
            rows["pixel_sum"].append(pixel_sum)
            rows["fidelity_ok"].append(fid)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                "width": pd.Series(rows["width"], dtype="int32"),
                "height": pd.Series(rows["height"], dtype="int32"),
                "frames": pd.Series(rows["frames"], dtype="int32"),
                "pixel_sum": pd.Series(rows["pixel_sum"], dtype="int64"),
                "fidelity_ok": pd.Series(rows["fidelity_ok"], dtype="bool"),
            }
        )


AUDIO_REAL_SCHEMA = (
    "doc_id bigint, sample_rate int, n_samples bigint, duration_s double, "
    "sum_samples bigint"
)

_SYNTH_RATE = 16_000


def _synth_samples(doc_id: int, n: int) -> "np.ndarray":
    """Deterministic int16 waveform: s_i = (7*doc_id + 13*i) % 4001 - 2000."""
    i = np.arange(n, dtype=np.int64)
    return ((7 * doc_id + 13 * i) % 4001 - 2000).astype("<i2")


def synth_audio_batches(
    batches: Iterable[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """(doc_id, n_samples) → (doc_id, payload) with the payload a REAL
    RIFF/WAVE PCM-16 encoding of the deterministic waveform."""
    for pdf in batches:
        payloads = [
            encode_wav_pcm16(_synth_samples(int(d), int(n)), _SYNTH_RATE)
            for d, n in zip(pdf["doc_id"], pdf["n_samples"])
        ]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "payload": pd.Series(payloads, dtype="object"),
            }
        )


def audio_real_stats_batches(
    batches: Iterable[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Decode REAL WAV payloads with ``decode_wav`` and emit closed-form-
    checkable stats: rate, count, duration (count / rate, one IEEE double
    division — identical in SQL), and the exact integer sample sum."""
    for pdf in batches:
        rates, counts, sums = [], [], []
        for p in pdf["payload"]:
            rate, samples = decode_wav(bytes(p))
            rates.append(rate)
            counts.append(int(samples.shape[0]))
            sums.append(int(samples.astype(np.int64).sum()))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "sample_rate": pd.Series(rates, dtype="int32"),
                "n_samples": pd.Series(counts, dtype="int64"),
                "duration_s": pd.Series(
                    [c / float(_SYNTH_RATE) for c in counts], dtype="float64"
                ),
                "sum_samples": pd.Series(sums, dtype="int64"),
            }
        )


def resize_real_stats_batches(
    batches: Iterable[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Run the REAL nearest-neighbor ``resize_bmp`` to half size, then the
    production decode kernel over the resized payloads + pixel_sum content
    check — the end-to-end proof that the resize samples exactly the
    np.arange(out)·src//out grid (the oracle recomputes that sum closed
    form)."""
    for pdf in batches:
        resized = []
        for p, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
            nw, nh = max(int(w) // 2, 1), max(int(h) // 2, 1)
            resized.append(resize_bmp(bytes(p), nw, nh))
        out = pdf.copy()
        out["payload"] = resized
        meta = next(decode_real_batches([out]))
        meta["pixel_sum"] = pd.Series(
            [int(decode_image(bytes(p)).astype("int64").sum())
             for p in resized],
            dtype="int64",
        )
        yield meta.drop(columns=["checksum"])


# --- real MJPEG-in-AVI video frame sampling --------------------------------

VIDEO_FRAMES_SCHEMA = (
    "doc_id bigint, frame_idx int, ts_ms bigint, "
    "width int, height int, fidelity_ok boolean"
)

_AVI_FPS = 10  # integer fps => exact integer frame timestamps (ms)


def _frame_seed(doc_id: int, frame_idx: int) -> int:
    """Per-frame pixel seed: frames within a video must differ, or a demuxer
    that returns the first frame N times would pass the fidelity check."""
    return doc_id * 31 + frame_idx


def synth_avi_batches(
    batches: Iterable[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """(doc_id, n_frames, width, height) → (doc_id, payload) with payload a
    REAL MJPEG AVI whose frame f holds _synth_pixels(_frame_seed(d, f))."""
    from lakehouse_sfc_spark.operators.avi import encode_avi_mjpeg

    for pdf in batches:
        payloads = [
            encode_avi_mjpeg(
                [
                    _synth_pixels(_frame_seed(int(d), f), int(w), int(h))
                    for f in range(int(n))
                ],
                fps=_AVI_FPS,
            )
            for d, n, w, h in zip(
                pdf["doc_id"], pdf["n_frames"], pdf["width"], pdf["height"]
            )
        ]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "payload": pd.Series(payloads, dtype="object"),
            }
        )


def avi_frames_stats_batches(
    batches: Iterable[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Demux + decode every frame of each AVI payload; one output row per
    frame with its integer timestamp and a PSNR>=30dB fidelity check against
    the re-synthesized source grid (same contract as multimodal_jpeg_real —
    JPEG is lossy, the codec clears 30dB by ~25dB)."""
    from lakehouse_sfc_spark.operators.avi import decode_avi_mjpeg

    for pdf in batches:
        rows = {"doc_id": [], "frame_idx": [], "ts_ms": [],
                "width": [], "height": [], "fidelity_ok": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            fps, frames = decode_avi_mjpeg(bytes(payload))
            for f, px in enumerate(frames):
                src = _synth_pixels(
                    _frame_seed(int(doc_id), f), px.shape[1], px.shape[0]
                )
                mse = float(np.mean((px.astype(np.float64) - src) ** 2))
                psnr = 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)
                rows["doc_id"].append(int(doc_id))
                rows["frame_idx"].append(f)
                rows["ts_ms"].append(f * 1000 // fps)
                rows["width"].append(px.shape[1])
                rows["height"].append(px.shape[0])
                rows["fidelity_ok"].append(bool(psnr >= 30.0))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                "frame_idx": pd.Series(rows["frame_idx"], dtype="int32"),
                "ts_ms": pd.Series(rows["ts_ms"], dtype="int64"),
                "width": pd.Series(rows["width"], dtype="int32"),
                "height": pd.Series(rows["height"], dtype="int32"),
                "fidelity_ok": pd.Series(rows["fidelity_ok"], dtype="bool"),
            }
        )


# --- real FLAC audio --------------------------------------------------------

FLAC_REAL_SCHEMA = (
    "doc_id bigint, sample_rate int, n_samples bigint, n_channels int, "
    "n_frames bigint, duration_s double, sum_samples bigint"
)


def _synth_samples_ch2(doc_id: int, n: int) -> "np.ndarray":
    """Second deterministic channel: s_i = (11*doc_id + 17*i) % 4001 - 2000."""
    i = np.arange(n, dtype=np.int64)
    return ((11 * doc_id + 17 * i) % 4001 - 2000).astype("<i2")


def synth_flac_batches(
    batches: Iterable[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """(doc_id, n_samples, n_channels) → (doc_id, payload) with the payload
    a REAL FLAC encoding (fixed predictors + Rice residuals) of the
    deterministic waveform(s)."""
    from lakehouse_sfc_spark.operators.flac import encode_flac

    for pdf in batches:
        payloads = []
        for d, n, ch in zip(
            pdf["doc_id"], pdf["n_samples"], pdf["n_channels"]
        ):
            d, n = int(d), int(n)
            a = _synth_samples(d, n).astype(np.int16)
            if int(ch) == 2:
                a = np.stack(
                    [a, _synth_samples_ch2(d, n).astype(np.int16)], axis=1
                )
            payloads.append(encode_flac(a, _SYNTH_RATE))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "payload": pd.Series(payloads, dtype="object"),
            }
        )


def flac_real_stats_batches(
    batches: Iterable[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Decode REAL FLAC payloads (CRC-8/CRC-16/MD5 all verified inside
    ``decode_flac``) and emit closed-form-checkable stats including the
    exact integer sample sum over every channel."""
    from lakehouse_sfc_spark.operators.flac import decode_flac

    for pdf in batches:
        rates, counts, chans, frames, sums = [], [], [], [], []
        for p in pdf["payload"]:
            rate, samples = decode_flac(bytes(p))
            n = int(samples.shape[0])
            ch = 1 if samples.ndim == 1 else int(samples.shape[1])
            rates.append(rate)
            counts.append(n)
            chans.append(ch)
            frames.append((n + 4095) // 4096)
            sums.append(int(samples.astype(np.int64).sum()))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "sample_rate": pd.Series(rates, dtype="int32"),
                "n_samples": pd.Series(counts, dtype="int64"),
                "n_channels": pd.Series(chans, dtype="int32"),
                "n_frames": pd.Series(frames, dtype="int64"),
                "duration_s": pd.Series(
                    [c / float(_SYNTH_RATE) for c in counts],
                    dtype="float64",
                ),
                "sum_samples": pd.Series(sums, dtype="int64"),
            }
        )


# --- real ZIP containers -----------------------------------------------------

ZIP_REAL_SCHEMA = (
    "doc_id bigint, n_members int, total_bytes bigint, content_sum bigint"
)


def synth_zip_batches(
    batches: Iterable[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """(doc_id, k) → (doc_id, payload): a REAL ZIP archive with k members;
    member j holds 100 + (doc_id + j) % 97 bytes of the deterministic
    stream (doc_id*3 + j*5 + i) % 251, methods alternating store/deflate."""
    from lakehouse_sfc_spark.operators.zipc import DEFLATE, STORE, encode_zip

    for pdf in batches:
        payloads = []
        for d, k in zip(pdf["doc_id"], pdf["k"]):
            d, k = int(d), int(k)
            entries = []
            for j in range(k):
                n = 100 + (d + j) % 97
                data = bytes((d * 3 + j * 5 + i) % 251 for i in range(n))
                entries.append(
                    (f"member-{j:02d}.bin", data,
                     DEFLATE if j % 2 else STORE)
                )
            payloads.append(encode_zip(entries))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "payload": pd.Series(payloads, dtype="object"),
            }
        )


def zip_real_stats_batches(
    batches: Iterable[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Extract REAL ZIP payloads (central-directory walk, per-member
    CRC-32 + size verification inside ``decode_zip``) and emit the
    closed-form member/byte/content summary."""
    from lakehouse_sfc_spark.operators.zipc import decode_zip

    for pdf in batches:
        members, totals, sums = [], [], []
        for p in pdf["payload"]:
            entries = decode_zip(bytes(p))
            members.append(len(entries))
            totals.append(sum(len(d) for _, d in entries))
            sums.append(sum(sum(d) for _, d in entries))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_members": pd.Series(members, dtype="int32"),
                "total_bytes": pd.Series(totals, dtype="int64"),
                "content_sum": pd.Series(sums, dtype="int64"),
            }
        )


# --- real .tar.gz shards ------------------------------------------------------

TARGZ_REAL_SCHEMA = (
    "doc_id bigint, n_members int, total_bytes bigint, content_sum bigint"
)


def synth_targz_batches(
    batches: Iterable[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """(doc_id, k) → (doc_id, payload): a REAL .tar.gz shard with k member
    files; member j holds 80 + (doc_id*2 + j*7) % 120 bytes of the
    deterministic stream (doc_id*5 + j*11 + i) % 241."""
    from lakehouse_sfc_spark.operators.tarc import encode_targz

    for pdf in batches:
        payloads = []
        for d, k in zip(pdf["doc_id"], pdf["k"]):
            d, k = int(d), int(k)
            entries = []
            for j in range(k):
                n = 80 + (d * 2 + j * 7) % 120
                data = bytes((d * 5 + j * 11 + i) % 241 for i in range(n))
                entries.append((f"shard/{j:03d}.bin", data))
            payloads.append(encode_targz(entries))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "payload": pd.Series(payloads, dtype="object"),
            }
        )


def targz_real_stats_batches(
    batches: Iterable[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Extract REAL .tar.gz payloads (gzip CRC-32/ISIZE + ustar header
    checksums all verified inside ``decode_targz``) and emit the
    closed-form member/byte/content summary."""
    from lakehouse_sfc_spark.operators.tarc import decode_targz

    for pdf in batches:
        members, totals, sums = [], [], []
        for p in pdf["payload"]:
            entries = decode_targz(bytes(p))
            members.append(len(entries))
            totals.append(sum(len(d) for _, d in entries))
            sums.append(sum(sum(d) for _, d in entries))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_members": pd.Series(members, dtype="int32"),
                "total_bytes": pd.Series(totals, dtype="int64"),
                "content_sum": pd.Series(sums, dtype="int64"),
            }
        )


# --- real PDF containers ------------------------------------------------------

PDF_META_SCHEMA = (
    "doc_id bigint, n_objects int, n_pages int, content_bytes bigint, "
    "content_sum bigint"
)


def synth_pdf_batches(
    batches: Iterable[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """(doc_id, n_pages) → (doc_id, payload): a REAL classic-xref PDF with
    one FlateDecode content stream per page; page j holds
    60 + (doc_id + j) % 50 bytes of the deterministic printable stream."""
    from lakehouse_sfc_spark.operators.pdf import encode_pdf

    for pdf in batches:
        payloads = [
            encode_pdf(int(d), int(np), lambda j, d=int(d): 60 + (d + j) % 50)
            for d, np in zip(pdf["doc_id"], pdf["n_pages"])
        ]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "payload": pd.Series(payloads, dtype="object"),
            }
        )


def pdf_meta_batches(
    batches: Iterable[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Parse REAL PDF payloads without rendering (xref offsets validated
    byte-exactly, /Count checked, streams Flate-decoded against /Length
    inside ``pdf_metadata``) and emit the closed-form summary."""
    from lakehouse_sfc_spark.operators.pdf import pdf_metadata

    for pdf in batches:
        rows = [pdf_metadata(bytes(p)) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_objects": pd.Series(
                    [r["n_objects"] for r in rows], dtype="int32"
                ),
                "n_pages": pd.Series(
                    [r["n_pages"] for r in rows], dtype="int32"
                ),
                "content_bytes": pd.Series(
                    [r["content_bytes"] for r in rows], dtype="int64"
                ),
                "content_sum": pd.Series(
                    [r["content_sum"] for r in rows], dtype="int64"
                ),
            }
        )
