"""Minimal MJPEG-in-AVI container codec — pure struct, no external libs.

Completes the multimodal family's real-codec story (BMP/WAV/PNG/baseline
JPEG already have genuine encode→decode rows): video frames travel as a
RIFF ``AVI `` container whose ``00dc`` chunks are REAL baseline JPEGs from
``operators/jpeg.py``.  Parity target: the reference's video frame-sample
operator (reference profiling reads media columns as opaque bytes; see
SURVEY.md §2.10) — we implement the actual container walk instead of a
metadata stub.

Layout written (and the only layout read back):

    RIFF <size> 'AVI '
      LIST 'hdrl'
        'avih' (56-byte MainAVIHeader: µs/frame, total frames, w, h)
        LIST 'strl'
          'strh' (56-byte stream header: 'vids'/'MJPG', dwScale/dwRate=fps)
          'strf' (40-byte BITMAPINFOHEADER, biCompression='MJPG')
      LIST 'movi'
        '00dc' <jpeg bytes> (word-aligned, one per frame)
      'idx1' (16-byte entry per frame)

The decoder is a real chunk walker: it verifies the RIFF/AVI magic, reads
fps from the stream header (falling back to avih µs/frame), collects
``00dc`` chunks in movi order honoring chunk padding, and decodes each
through ``decode_jpeg``.  Unknown chunks are skipped by size — the walker
survives containers with extra chunks, like any real demuxer.
"""

from __future__ import annotations

import struct

import numpy as np


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(listtype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", listtype + body)


def encode_avi_mjpeg(frames: "list[np.ndarray]", fps: int = 10,
                     quality: int = 90) -> bytes:
    """Encode (h, w, 3) uint8 frames as an MJPEG AVI at integer ``fps``."""
    from lakehouse_sfc_spark.operators.jpeg import encode_jpeg

    if not frames:
        raise ValueError("encode_avi_mjpeg: need at least one frame")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("encode_avi_mjpeg: all frames must share geometry")

    jpegs = [encode_jpeg(f, quality=quality) for f in frames]
    max_buf = max(len(j) for j in jpegs)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        max_buf * fps,     # dwMaxBytesPerSec
        0,                 # dwPaddingGranularity
        0x10,              # dwFlags: AVIF_HASINDEX
        len(jpegs),        # dwTotalFrames
        0, 1,              # dwInitialFrames, dwStreams
        max_buf,           # dwSuggestedBufferSize
        w, h,
        0, 0, 0, 0,        # dwReserved
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII4h",
            0, 0, 0,       # dwFlags, wPriority, wLanguage
            0,             # dwInitialFrames
            1, fps,        # dwScale, dwRate => fps frames/s
            0, len(jpegs), # dwStart, dwLength
            max_buf,       # dwSuggestedBufferSize
            0xFFFFFFFF,    # dwQuality (driver default)
            0,             # dwSampleSize (0: variable-size frames)
            0, 0, w, h,    # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_body = b"movi"
    offsets = []
    for j in jpegs:
        offsets.append(len(movi_body))  # offset of the 00dc fourcc in movi
        movi_body += _chunk(b"00dc", j)
    movi = _chunk(b"LIST", movi_body)

    idx1 = b"".join(
        b"00dc" + struct.pack("<III", 0x10, off, len(j))  # AVIIF_KEYFRAME
        for off, j in zip(offsets, jpegs)
    )
    riff_body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx1)
    return _chunk(b"RIFF", riff_body)


def _walk_chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size) honoring word alignment."""
    while pos + 8 <= end:
        fourcc = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if body + size > end:
            raise ValueError(
                f"AVI chunk {fourcc!r} overruns container "
                f"({body}+{size} > {end})"
            )
        yield fourcc, body, size
        pos = body + size + (size % 2)


def decode_avi_mjpeg(payload: bytes) -> "tuple[int, list[np.ndarray]]":
    """Parse an MJPEG AVI; return (fps, frames) with (h, w, 3) uint8 frames."""
    from lakehouse_sfc_spark.operators.jpeg import decode_jpeg

    data = bytes(payload)
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF AVI container")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    end = min(len(data), 8 + riff_size)

    fps = 0
    micro_per_frame = 0
    jpegs: list[bytes] = []

    def walk(pos: int, stop: int) -> None:
        nonlocal fps, micro_per_frame
        for fourcc, body, size in _walk_chunks(data, pos, stop):
            if fourcc == b"LIST":
                listtype = data[body:body + 4]
                if listtype in (b"hdrl", b"strl", b"movi", b"rec "):
                    walk(body + 4, body + size)
            elif fourcc == b"avih" and size >= 4:
                (micro_per_frame,) = struct.unpack_from("<I", data, body)
            elif fourcc == b"strh" and size >= 56:
                if data[body:body + 4] == b"vids":
                    scale, rate = struct.unpack_from("<II", data, body + 20)
                    if scale:
                        fps = rate // scale
            elif fourcc in (b"00dc", b"00db") and size > 0:
                jpegs.append(data[body:body + size])

    walk(12, end)
    if not jpegs:
        raise ValueError("AVI contains no video frames")
    if not fps:
        fps = 1_000_000 // micro_per_frame if micro_per_frame else 1
    return fps, [decode_jpeg(j) for j in jpegs]
