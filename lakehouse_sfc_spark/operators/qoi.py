"""QOI ("Quite OK Image", qoiformat.org, spec 1.0) codec — pure numpy/stdlib.

A real byte-level implementation of the full QOI 1.0 operation set:

* ``QOI_OP_RUN``   (0b11xxxxxx)  run-length 1..62 of the previous pixel
* ``QOI_OP_INDEX`` (0b00xxxxxx)  64-entry rolling hash table lookup
* ``QOI_OP_DIFF``  (0b01drdgdb)  2-bit wrapping channel deltas (bias 2)
* ``QOI_OP_LUMA``  (0b10dddddd)  6-bit green delta + 4-bit red/blue deltas
                                 relative to the green delta (bias 32 / 8)
* ``QOI_OP_RGB``   (0xFE)        full RGB literal
* ``QOI_OP_RGBA``  (0xFF)        full RGBA literal

The hash table is ``index[(3r + 5g + 7b + 11a) % 64]`` updated after EVERY
decoded pixel, exactly as the spec requires (a run updates it once — the
repeated pixel hashes to the same slot).  The encoder prefers
RUN > INDEX > DIFF > LUMA > RGB(A), which is the reference encoder's order,
but any spec-conforming chunk stream decodes identically.

Reference-parity note: the reference repo has no multimodal surface at all;
this codec is part of the beyond-reference training-data-pipeline family
(SURVEY.md §6), giving the lake a real decoder for a real published wire
format without external imaging libraries.

Unsupported inputs refuse loudly by name (bad magic, bad channels byte,
truncated stream, missing end marker) — nothing decodes silently wrong.
"""

from __future__ import annotations

import struct

import numpy as np

_QOI_MAGIC = b"qoif"
_QOI_END = b"\x00" * 7 + b"\x01"

_OP_INDEX = 0x00
_OP_DIFF = 0x40
_OP_LUMA = 0x80
_OP_RUN = 0xC0
_OP_RGB = 0xFE
_OP_RGBA = 0xFF


def _hash(r: int, g: int, b: int, a: int) -> int:
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def encode_qoi(pixels: "np.ndarray") -> bytes:
    """RGB uint8 array (h, w, 3) → QOI bytes (channels=3, sRGB)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_qoi expects an (h, w, 3) uint8 array")
    h, w = pixels.shape[:2]
    out = bytearray()
    out += _QOI_MAGIC + struct.pack(">IIBB", w, h, 3, 0)

    index = [(0, 0, 0, 0)] * 64
    pr, pg, pb, pa = 0, 0, 0, 255
    run = 0
    flat = pixels.reshape(-1, 3)
    for r, g, b in flat.tolist():
        if (r, g, b) == (pr, pg, pb):
            run += 1
            if run == 62:
                out.append(_OP_RUN | (run - 1))
                run = 0
            continue
        if run:
            out.append(_OP_RUN | (run - 1))
            run = 0
        hsh = _hash(r, g, b, 255)
        if index[hsh] == (r, g, b, 255):
            out.append(_OP_INDEX | hsh)
        else:
            index[hsh] = (r, g, b, 255)
            dr = (r - pr + 128) % 256 - 128
            dg = (g - pg + 128) % 256 - 128
            db = (b - pb + 128) % 256 - 128
            dr_dg = dr - dg
            db_dg = db - dg
            if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                out.append(_OP_DIFF | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
            elif -32 <= dg <= 31 and -8 <= dr_dg <= 7 and -8 <= db_dg <= 7:
                out.append(_OP_LUMA | (dg + 32))
                out.append(((dr_dg + 8) << 4) | (db_dg + 8))
            else:
                out += bytes((_OP_RGB, r, g, b))
        pr, pg, pb = r, g, b
    if run:
        out.append(_OP_RUN | (run - 1))
    out += _QOI_END
    return bytes(out)


def decode_qoi(payload: bytes) -> "np.ndarray":
    """QOI bytes → RGB uint8 array (h, w, 3).  Decodes channels=3 and
    channels=4 streams (alpha is validated fully opaque and dropped, the
    same RGB contract as the other codecs in this repo)."""
    if payload[:4] != _QOI_MAGIC:
        raise ValueError("not a QOI stream (missing 'qoif' magic)")
    if len(payload) < 14 + len(_QOI_END):
        raise ValueError("truncated QOI stream (shorter than header + end marker)")
    w, h, channels, colorspace = struct.unpack(">IIBB", payload[4:14])
    if channels not in (3, 4):
        raise ValueError(f"QOI channels byte must be 3 or 4, got {channels}")
    if colorspace not in (0, 1):
        raise ValueError(f"QOI colorspace byte must be 0 or 1, got {colorspace}")
    if payload[-8:] != _QOI_END:
        raise ValueError("QOI stream missing the 7x00 + 01 end marker")

    n = w * h
    out = np.empty((n, 4), dtype=np.uint8)
    index = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    pos = 14
    end = len(payload) - 8
    i = 0
    data = payload
    while i < n:
        if pos >= end:
            raise ValueError("truncated QOI stream (pixels missing before end marker)")
        op = data[pos]
        pos += 1
        if op == _OP_RGB:
            r, g, b = data[pos], data[pos + 1], data[pos + 2]
            pos += 3
        elif op == _OP_RGBA:
            r, g, b, a = data[pos], data[pos + 1], data[pos + 2], data[pos + 3]
            pos += 4
        else:
            tag = op & 0xC0
            if tag == _OP_INDEX:
                r, g, b, a = index[op & 0x3F]
            elif tag == _OP_DIFF:
                r = (r + ((op >> 4) & 0x03) - 2) % 256
                g = (g + ((op >> 2) & 0x03) - 2) % 256
                b = (b + (op & 0x03) - 2) % 256
            elif tag == _OP_LUMA:
                dg = (op & 0x3F) - 32
                second = data[pos]
                pos += 1
                r = (r + dg + ((second >> 4) & 0x0F) - 8) % 256
                g = (g + dg) % 256
                b = (b + dg + (second & 0x0F) - 8) % 256
            else:  # _OP_RUN
                run = (op & 0x3F) + 1
                if i + run > n:
                    raise ValueError("QOI run overflows the pixel count")
                out[i : i + run] = (r, g, b, a)
                i += run
                index[_hash(r, g, b, a)] = (r, g, b, a)
                continue
        index[_hash(r, g, b, a)] = (r, g, b, a)
        out[i] = (r, g, b, a)
        i += 1
    if data[pos:end] != b"":
        raise ValueError("trailing bytes between pixel stream and end marker")
    px = out.reshape(h, w, 4)
    if not (px[:, :, 3] == 255).all():
        raise NotImplementedError(
            "QOI stream carries non-opaque alpha; this lake's image contract "
            "is RGB (alpha must be 255 everywhere)"
        )
    return px[:, :, :3].copy()
