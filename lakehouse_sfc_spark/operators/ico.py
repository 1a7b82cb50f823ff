"""Windows ICO container codec (pure numpy + stdlib).

ICO is a CONTAINER: an ICONDIR directory of 16-byte entries, each pointing
at an image that is either a full PNG stream or a headerless DIB — a
BITMAPINFOHEADER whose biHeight covers BOTH the XOR (color) bitmap and the
1-bpp AND (transparency) mask stacked on top of it.  This module writes and
reads both entry storages (24-bpp DIB, 32-bpp BGRA DIB, PNG) and multi-
resolution directories, reusing the repo's own PNG codec for PNG entries
(operators/multimodal.py::encode_png/decode_png) — the same reuse pattern as
JPEG-in-TIFF (operators/tiff.py decoding via operators/jpeg.py).

Format references: ICONDIR/ICONDIRENTRY layout and the doubled-height DIB
rule are the documented Win32 `ICONDIR`/`BITMAPINFOHEADER` icon-resource
layout; PNG entries (Vista+) are detected by signature.  Transparency is
parsed but not applied (we return RGB): the AND mask and 32-bpp alpha are
validated for size, matching decode_bmp's honest 24-bit contract.

No counterpart in the reference repo (its multimodal surface is ours to
define); sibling of operators/tiff.py.
"""

from __future__ import annotations

import struct

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _dib_entry(pixels: "np.ndarray", bpp: int) -> bytes:
    """HxWx3 uint8 RGB → headerless DIB icon image: BITMAPINFOHEADER with
    doubled height, bottom-up BGR(A) XOR bitmap, all-opaque AND mask."""
    h, w, _ = pixels.shape
    if bpp == 24:
        row = (w * 3 + 3) & ~3
        xor = np.zeros((h, row), dtype=np.uint8)
        xor[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)
    elif bpp == 32:
        row = w * 4
        bgra = np.zeros((h, w, 4), dtype=np.uint8)
        bgra[:, :, :3] = pixels[::-1, :, ::-1]
        bgra[:, :, 3] = 255
        xor = bgra.reshape(h, row)
    else:
        raise ValueError(f"unsupported DIB bpp {bpp}")
    and_row = ((w + 31) // 32) * 4  # 1-bpp mask rows pad to 32 bits
    and_mask = np.zeros((h, and_row), dtype=np.uint8)  # 0 = opaque
    header = struct.pack(
        "<IiiHHIIiiII",
        40, w, h * 2, 1, bpp, 0,
        xor.size + and_mask.size, 0, 0, 0, 0,
    )
    return header + xor.tobytes() + and_mask.tobytes()


def encode_ico(
    images: "list[np.ndarray]", storages: "list[str] | None" = None
) -> bytes:
    """List of HxWx3 uint8 RGB arrays (each ≤ 256×256) → multi-entry ICO.
    ``storages[i]`` picks the per-entry representation: ``dib24`` (default),
    ``dib32`` or ``png``."""
    if not images:
        raise ValueError("encode_ico needs at least one image")
    storages = storages or ["dib24"] * len(images)
    bodies = []
    for px, st in zip(images, storages):
        h, w, c = px.shape
        if c != 3 or w > 256 or h > 256:
            raise ValueError("entries must be HxWx3 with sides <= 256")
        if st == "png":
            from lakehouse_sfc_spark.operators.multimodal import encode_png

            bodies.append(encode_png(px))
        elif st in ("dib24", "dib32"):
            bodies.append(_dib_entry(px, 24 if st == "dib24" else 32))
        else:
            raise ValueError(f"unknown ICO entry storage {st!r}")
    out = [struct.pack("<HHH", 0, 1, len(images))]
    offset = 6 + 16 * len(images)
    for px, body in zip(images, bodies):
        h, w, _ = px.shape
        out.append(
            struct.pack(
                "<BBBBHHII",
                w % 256, h % 256,  # 0 encodes 256 per the dir-entry rule
                0, 0, 1, 32, len(body), offset,
            )
        )
        offset += len(body)
    out.extend(bodies)
    return b"".join(out)


def _decode_dib(body: bytes, dir_w: int, dir_h: int) -> "np.ndarray":
    if len(body) < 40:
        raise ValueError("truncated ICO DIB header")
    (
        size, w, h2, planes, bpp, compression,
        _img, _xppm, _yppm, _clr, _imp,
    ) = struct.unpack_from("<IiiHHIIiiII", body, 0)
    if size != 40:
        raise NotImplementedError(f"ICO DIB header size {size} != 40")
    if compression != 0:
        raise NotImplementedError(f"compressed ICO DIB (BI_ code {compression})")
    if bpp not in (24, 32):
        raise NotImplementedError(
            f"{bpp}-bpp ICO DIB unsupported (24/32-bpp BI_RGB and PNG "
            "entries decode natively; palette icons need a color table walk)"
        )
    # biHeight spans XOR+AND stacked; tolerate writers that record the
    # bare height by checking the directory's height
    h = h2 // 2 if h2 == dir_h * 2 else h2
    if w != dir_w or h != dir_h:
        raise ValueError(
            f"ICO DIB geometry {w}x{h} contradicts directory {dir_w}x{dir_h}"
        )
    step = 3 if bpp == 24 else 4
    row = (w * step + 3) & ~3
    xor = np.frombuffer(body, dtype=np.uint8, count=row * h, offset=40)
    and_row = ((w + 31) // 32) * 4
    if h2 == dir_h * 2 and len(body) < 40 + row * h + and_row * h:
        raise ValueError("ICO DIB truncated: AND mask missing")
    px = xor.reshape(h, row)[:, : w * step].reshape(h, w, step)
    px = px[::-1]  # bottom-up rows
    return px[:, :, 2::-1].copy()  # BGR(A) → RGB, alpha dropped


def decode_ico(payload: bytes) -> "np.ndarray":
    """ICO → HxWx3 uint8 RGB of the LARGEST directory entry (the standard
    consumer behavior: render the best resolution, downscale yourself).
    PNG entries route through decode_png; DIB entries are parsed here."""
    if len(payload) < 6 or payload[:4] != b"\x00\x00\x01\x00":
        if payload[:4] == b"\x00\x00\x02\x00":
            raise NotImplementedError(
                "CUR cursor files share the ICO layout but hotspot fields "
                "replace planes/bpp; only type-1 icons decode here"
            )
        raise ValueError("not an ICO payload")
    (count,) = struct.unpack_from("<H", payload, 4)
    if count == 0:
        raise ValueError("empty ICO directory")
    best = None
    if len(payload) < 6 + 16 * count:
        raise ValueError("truncated ICO directory")
    for i in range(count):
        bw, bh, _, _, _, _, size, off = struct.unpack_from(
            "<BBBBHHII", payload, 6 + 16 * i
        )
        w, h = bw or 256, bh or 256
        if best is None or w * h > best[0] * best[1]:
            best = (w, h, off, size)
    w, h, off, size = best
    body = payload[off : off + size]
    if body[: len(_PNG_MAGIC)] == _PNG_MAGIC:
        from lakehouse_sfc_spark.operators.multimodal import decode_png

        px = decode_png(body)
        if px.ndim == 2:
            px = np.repeat(px[:, :, None], 3, axis=2)
        return px[:, :, :3].copy()
    return _decode_dib(body, w, h)
