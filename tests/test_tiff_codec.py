"""Baseline TIFF codec: roundtrip exactness, both byte orders, multi-strip
framing, and loud refusal of the compressed variants we don't implement."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from lakehouse_sfc_spark.operators.tiff import decode_tiff, encode_tiff


def _grid(h, w, ch=None):
    n = h * w * (ch or 1)
    a = (np.arange(n) % 251).astype(np.uint8)
    return a.reshape((h, w) if ch is None else (h, w, ch))


def test_gray_roundtrip_exact_across_strip_splits():
    for h, w in [(1, 1), (3, 5), (16, 16), (7, 13)]:
        px = _grid(h, w)
        for rps in (1, 3, 8, 100):
            assert np.array_equal(
                decode_tiff(encode_tiff(px, rows_per_strip=rps)), px
            ), (h, w, rps)


def test_rgb_roundtrip_exact():
    for h, w in [(2, 2), (9, 20), (8, 8)]:
        px = _grid(h, w, 3)
        assert np.array_equal(decode_tiff(encode_tiff(px)), px)


def test_big_endian_decode():
    """Hand-built MM (big-endian) single-strip grayscale file."""
    h, w = 2, 3
    px = _grid(h, w)
    data = px.tobytes()
    # header + data + IFD with 9 entries
    out = bytearray(b"MM\x00*")
    out += struct.pack(">I", 0)  # patched below
    strip_off = len(out)
    out += data
    if len(out) % 2:
        out += b"\x00"
    ifd_off = len(out)
    struct.pack_into(">I", out, 4, ifd_off)

    def e(tag, typ, count, val):
        return struct.pack(">HHII", tag, typ, count, val)

    entries = [
        e(256, 4, 1, w),
        e(257, 4, 1, h),
        e(258, 3, 1, 8 << 16),  # SHORT value left-justified in value field
        e(259, 3, 1, 1 << 16),
        e(262, 3, 1, 1 << 16),
        e(273, 4, 1, strip_off),
        e(277, 3, 1, 1 << 16),
        e(278, 4, 1, h),
        e(279, 4, 1, len(data)),
    ]
    out += struct.pack(">H", len(entries)) + b"".join(entries) + b"\x00" * 4
    assert np.array_equal(decode_tiff(bytes(out)), px)


def test_rejects_compression_and_truncation():
    px = _grid(4, 4)
    payload = bytearray(encode_tiff(px))
    with pytest.raises(ValueError, match="not a TIFF"):
        decode_tiff(b"XXXX")
    with pytest.raises(ValueError, match="truncated TIFF"):
        decode_tiff(bytes(payload[:10]))
    # flip the Compression tag value to 6 (old JPEG-in-TIFF) in place
    ifd_off = struct.unpack("<I", bytes(payload[4:8]))[0]
    n = struct.unpack("<H", bytes(payload[ifd_off : ifd_off + 2]))[0]
    for i in range(n):
        at = ifd_off + 2 + 12 * i
        tag = struct.unpack("<H", bytes(payload[at : at + 2]))[0]
        if tag == 259:
            struct.pack_into("<I", payload, at + 8, 6)
    with pytest.raises(NotImplementedError, match="compression 6"):
        decode_tiff(bytes(payload))


def test_decode_image_dispatches_tiff(spark_noop=None):
    from lakehouse_sfc_spark.operators.multimodal import decode_image

    px = _grid(5, 9)
    assert np.array_equal(decode_image(encode_tiff(px)), px)


def test_packbits_roundtrip_and_compression():
    from lakehouse_sfc_spark.operators.tiff import (
        _packbits_decode,
        _packbits_encode,
    )

    for h, w in [(1, 1), (7, 13), (16, 16)]:
        px = _grid(h, w)
        for rps in (1, 3, 8):
            assert np.array_equal(
                decode_tiff(encode_tiff(px, rows_per_strip=rps, packbits=True)),
                px,
            ), (h, w, rps)
    rgb = _grid(9, 20, 3)
    assert np.array_equal(decode_tiff(encode_tiff(rgb, packbits=True)), rgb)
    # run-heavy data actually compresses
    flat = np.zeros((64, 64), dtype=np.uint8)
    assert len(encode_tiff(flat, packbits=True)) < len(encode_tiff(flat)) / 4
    # raw PackBits kernel: runs, literals, and the 128 no-op
    data = b"\x01\x02\x03" + b"\x07" * 10 + b"\x04"
    assert _packbits_decode(_packbits_encode(data), len(data)) == data
    with pytest.raises(ValueError, match="truncated PackBits"):
        _packbits_decode(b"\xf0", 10)


def test_unsupported_tiff_compression_still_refuses():
    px = _grid(4, 4)
    payload = bytearray(encode_tiff(px))
    ifd_off = struct.unpack("<I", bytes(payload[4:8]))[0]
    n = struct.unpack("<H", bytes(payload[ifd_off : ifd_off + 2]))[0]
    for i in range(n):
        at = ifd_off + 2 + 12 * i
        tag = struct.unpack("<H", bytes(payload[at : at + 2]))[0]
        if tag == 259:
            struct.pack_into("<I", payload, at + 8, 4)  # Group 4 fax
    with pytest.raises(NotImplementedError, match="compression 4"):
        decode_tiff(bytes(payload))


def test_white_is_zero_inverts_and_planar_refuses():
    """PhotometricInterpretation=0 (fax/scan masters) must decode to the
    BlackIsZero convention; PlanarConfiguration=2 must refuse loudly."""
    px = _grid(4, 6)
    payload = bytearray(encode_tiff(px))
    ifd_off = struct.unpack("<I", bytes(payload[4:8]))[0]
    n = struct.unpack("<H", bytes(payload[ifd_off : ifd_off + 2]))[0]

    def set_tag(buf, tag, value):
        for i in range(n):
            at = ifd_off + 2 + 12 * i
            if struct.unpack("<H", bytes(buf[at : at + 2]))[0] == tag:
                struct.pack_into("<I", buf, at + 8, value)

    wiz = bytearray(payload)
    set_tag(wiz, 262, 0)  # WhiteIsZero (SHORT inline: low half, LE)
    assert np.array_equal(decode_tiff(bytes(wiz)), 255 - px)

    # append a PlanarConfiguration=2 entry is intrusive; instead flip the
    # photometric to an unsupported space (palette=3)
    pal = bytearray(payload)
    set_tag(pal, 262, 3)
    with pytest.raises(NotImplementedError, match="photometric 3"):
        decode_tiff(bytes(pal))


def test_lzw_roundtrip_all_shapes_and_table_clears():
    """TIFF LZW (compression 5): MSB-first, EARLY-CHANGE width bumps, 4094
    table clears — the three ways it differs from GIF's LZW."""
    for h, w in [(1, 1), (7, 13), (16, 16)]:
        px = _grid(h, w)
        for rps in (1, 3, 8):
            assert np.array_equal(
                decode_tiff(
                    encode_tiff(px, rows_per_strip=rps, compression="lzw")
                ),
                px,
            ), (h, w, rps)
    rgb = _grid(9, 20, 3)
    assert np.array_equal(
        decode_tiff(encode_tiff(rgb, compression="lzw")), rgb
    )
    # one big single strip forces width growth to 12 bits and a table clear
    rng = np.random.RandomState(3)
    big = rng.randint(0, 256, size=(120, 400), dtype=np.uint8).astype(
        np.uint8
    )
    enc = encode_tiff(big, rows_per_strip=1000, compression="lzw")
    assert np.array_equal(decode_tiff(enc), big)
    # run-heavy data compresses
    flat = np.zeros((64, 64), dtype=np.uint8)
    assert len(encode_tiff(flat, compression="lzw")) < len(
        encode_tiff(flat)
    ) / 4
    from lakehouse_sfc_spark.operators.tiff import _lzw_decode_tiff

    with pytest.raises(ValueError, match="truncated TIFF LZW"):
        _lzw_decode_tiff(b"\x80", 10)


def test_deflate_roundtrip():
    """Adobe Deflate (tag 8): zlib per strip."""
    for h, w in [(1, 1), (7, 13), (16, 16)]:
        px = _grid(h, w)
        for rps in (1, 3, 8):
            assert np.array_equal(
                decode_tiff(
                    encode_tiff(px, rows_per_strip=rps, compression="deflate")
                ),
                px,
            ), (h, w, rps)
    rgb = _grid(9, 20, 3)
    assert np.array_equal(
        decode_tiff(encode_tiff(rgb, compression="deflate")), rgb
    )
    flat = np.zeros((64, 64), dtype=np.uint8)
    assert len(encode_tiff(flat, compression="deflate")) < len(
        encode_tiff(flat)
    ) / 4
    with pytest.raises(ValueError, match="corrupt TIFF Deflate"):
        # valid framing, garbage zlib stream
        payload = bytearray(encode_tiff(_grid(4, 4), compression="deflate"))
        ifd_off = struct.unpack("<I", bytes(payload[4:8]))[0]
        payload[8:12] = b"\xde\xad\xbe\xef"  # clobber strip data
        decode_tiff(bytes(payload))


def test_predictor2_roundtrip_and_wire_format():
    """Predictor=2 (horizontal differencing, tag 317): roundtrip for gray
    and RGB across strip splits and compressions, and the on-disk bytes
    really are row deltas (checked against a hand-diffed strip)."""
    for h, w in [(1, 1), (7, 13), (16, 16)]:
        px = _grid(h, w)
        for comp in ("none", "lzw", "deflate", "packbits"):
            assert np.array_equal(
                decode_tiff(
                    encode_tiff(px, rows_per_strip=3, compression=comp,
                                predictor=2)
                ),
                px,
            ), (h, w, comp)
    rgb = _grid(9, 20, 3)
    assert np.array_equal(
        decode_tiff(encode_tiff(rgb, compression="lzw", predictor=2)), rgb
    )
    # smooth gradients compress far better with the predictor — the reason
    # libtiff/PIL pair it with LZW
    grad = np.tile(np.arange(256, dtype=np.uint8), (64, 1))
    with_pred = len(encode_tiff(grad, compression="lzw", predictor=2))
    without = len(encode_tiff(grad, compression="lzw"))
    assert with_pred < without / 4
    # wire check: uncompressed predictor-2 strip bytes are the mod-256 row
    # deltas, first pixel verbatim
    row = np.array([[10, 13, 11, 250, 0]], dtype=np.uint8)
    payload = encode_tiff(row, predictor=2)
    strip = payload[8 : 8 + 5]
    assert strip == bytes([10, 3, 254, 239, 6])


def test_predictor3_refuses_loudly():
    """Floating-point differencing (Predictor=3) must refuse by tag, not
    decode silently wrong — decode_image dispatches arbitrary payloads."""
    px = _grid(4, 6)
    payload = bytearray(encode_tiff(px, predictor=2))
    ifd_off = struct.unpack("<I", bytes(payload[4:8]))[0]
    n = struct.unpack("<H", bytes(payload[ifd_off : ifd_off + 2]))[0]
    for i in range(n):
        at = ifd_off + 2 + 12 * i
        if struct.unpack("<H", bytes(payload[at : at + 2]))[0] == 317:
            struct.pack_into("<I", payload, at + 8, 3)
    with pytest.raises(NotImplementedError, match="predictor 3"):
        decode_tiff(bytes(payload))
    with pytest.raises(ValueError, match="predictor"):
        encode_tiff(px, predictor=3)


def _pack_msb(codes_and_widths):
    """Independent from-spec MSB-first bit packer (deliberately NOT the
    encoder's emit loop) for golden-fixture construction."""
    acc = nbits = 0
    out = bytearray()
    for code, width in codes_and_widths:
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def test_lzw_golden_fixture_kwkwk():
    """Hand-transcribed golden LZW strip (spec-derived, not produced by our
    encoder): input 01 01 01 01 → codes [CLEAR, 1, 258, 1, EOI] at width 9
    → bytes 80 00 60 40 18 08.  Catches any matched encoder/decoder bit-
    order bug that a self-roundtrip would hide."""
    from lakehouse_sfc_spark.operators.tiff import (
        _lzw_decode_tiff,
        _lzw_encode_tiff,
    )

    golden = bytes([0x80, 0x00, 0x60, 0x40, 0x18, 0x08])
    assert _lzw_decode_tiff(golden, 4) == b"\x01\x01\x01\x01"
    assert _lzw_encode_tiff(b"\x01\x01\x01\x01") == golden


def test_lzw_golden_fixture_early_change_boundary():
    """Spec-derived stream crossing the 9→10-bit EARLY-CHANGE boundary:
    for input bytes(0..255) the code sequence is fully predictable —
    [CLEAR, 0..252 @9 bits, 253, 254, 255, EOI @10 bits] — because the
    width bumps when the NEXT table slot would be 2^w - 1 (slot 511 after
    253 additions).  Packed with an independent packer; both directions
    must match, pinning the boundary against libtiff semantics."""
    from lakehouse_sfc_spark.operators.tiff import (
        _lzw_decode_tiff,
        _lzw_encode_tiff,
    )

    data = bytes(range(256))
    codes = [(256, 9)] + [(c, 9) for c in range(253)] + [
        (253, 10), (254, 10), (255, 10), (257, 10),
    ]
    golden = _pack_msb(codes)
    assert _lzw_encode_tiff(data) == golden
    assert _lzw_decode_tiff(golden, 256) == data


# --- new-style JPEG (compression 7) ------------------------------------------


def _smooth(h, w, ch=None):
    """Gradient image (JPEG-friendly: PSNR is meaningful, not noise-bound)."""
    base = (np.add.outer(np.arange(h), np.arange(w)) * 5 % 256).astype(np.uint8)
    return base if ch is None else np.repeat(base[:, :, None], ch, axis=2)


def _psnr(a, b):
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def test_jpeg_in_tiff_roundtrip_both_layouts():
    """Tag-7 strips decode through the baseline JPEG codec, multi-strip,
    gray and RGB, standalone AND abbreviated-JPEGTables (tag 347) layouts."""
    for shape in [(13, 21, 3), (8, 16, 3), (5, 9, None), (17, 7, None)]:
        h, w, ch = shape
        px = _smooth(h, w, ch)
        for jt in (False, True):
            t = encode_tiff(
                px, rows_per_strip=8, compression="jpeg",
                jpeg_quality=90, jpeg_tables=jt,
            )
            out = decode_tiff(t)
            assert out.shape == px.shape
            assert _psnr(out, px) >= 40, (shape, jt)


def test_jpeg_tables_layout_is_abbreviated_on_the_wire():
    """The JPEGTables layout must actually hoist DQT/DHT out of the strips:
    strips contain no DQT (FFDB) / DHT (FFC4) markers, the tag-347 stream
    does, and the strips alone (without the splice) cannot decode."""
    from lakehouse_sfc_spark.operators.jpeg import decode_jpeg
    from lakehouse_sfc_spark.operators.tiff import _JPEG_TABLES

    px = _smooth(16, 12, 3)
    t = encode_tiff(px, rows_per_strip=8, compression="jpeg", jpeg_tables=True)
    # walk the IFD for StripOffsets/ByteCounts + JPEGTables
    (ifd_off,) = struct.unpack("<I", t[4:8])
    (n,) = struct.unpack("<H", t[ifd_off : ifd_off + 2])
    tags = {}
    for i in range(n):
        at = ifd_off + 2 + 12 * i
        tag, typ, cnt = struct.unpack("<HHI", t[at : at + 8])
        tags[tag] = (typ, cnt, t[at + 8 : at + 12])
    typ, cnt, val = tags[_JPEG_TABLES]
    assert typ == 7
    (off,) = struct.unpack("<I", val)
    tables = t[off : off + cnt]
    assert tables[:2] == b"\xff\xd8" and tables[-2:] == b"\xff\xd9"
    assert b"\xff\xdb" in tables and b"\xff\xc4" in tables

    def _vals(tag):
        typ, cnt, val = tags[tag]
        if cnt == 1:
            return [struct.unpack("<I", val)[0]]
        (o,) = struct.unpack("<I", val)
        return list(struct.unpack(f"<{cnt}I", t[o : o + 4 * cnt]))

    offs, cnts = _vals(273), _vals(279)
    assert len(offs) == 2  # 16 rows / 8 rows_per_strip
    for o, c in zip(offs, cnts):
        strip = t[o : o + c]
        assert strip[:2] == b"\xff\xd8"
        assert b"\xff\xdb" not in strip[:40] and b"\xff\xc4" not in strip
        with pytest.raises((ValueError, KeyError, NotImplementedError)):
            decode_jpeg(bytes(strip))  # tables really are elsewhere


def test_jpeg_in_tiff_guards():
    px = _smooth(8, 8, 3)
    # predictor + jpeg is not a valid combination
    with pytest.raises(ValueError, match="predictor"):
        encode_tiff(px, compression="jpeg", predictor=2)
    # old-style JPEG (tag 6) refuses loudly
    t = bytearray(encode_tiff(px, compression="jpeg"))
    (ifd_off,) = struct.unpack("<I", t[4:8])
    (n,) = struct.unpack("<H", t[ifd_off : ifd_off + 2])
    for i in range(n):
        at = ifd_off + 2 + 12 * i
        if struct.unpack("<H", t[at : at + 2])[0] == 259:
            struct.pack_into("<I", t, at + 8, 6)
    with pytest.raises(NotImplementedError, match="old-style"):
        decode_tiff(bytes(t))


def test_jpeg_in_tiff_strip_geometry_validated():
    """A strip whose embedded JPEG disagrees with the IFD geometry fails
    loudly instead of silently mis-stitching."""
    px = _smooth(16, 12, 3)
    t = bytearray(encode_tiff(px, rows_per_strip=8, compression="jpeg"))
    # shrink ImageLength by one: strip 2's decoded height no longer matches
    (ifd_off,) = struct.unpack("<I", t[4:8])
    (n,) = struct.unpack("<H", t[ifd_off : ifd_off + 2])
    for i in range(n):
        at = ifd_off + 2 + 12 * i
        if struct.unpack("<H", t[at : at + 2])[0] == 257:
            struct.pack_into("<I", t, at + 8, 15)
    with pytest.raises(ValueError, match="strip"):
        decode_tiff(bytes(t))


# --- big-endian (MM) encoding ------------------------------------------------


def test_mm_encode_roundtrips_all_compressions():
    px = _grid(13, 21, 3)
    for comp in ("none", "packbits", "lzw", "deflate"):
        for pred in (1, 2):
            t = encode_tiff(px, compression=comp, predictor=pred,
                            byteorder="MM")
            assert t[:4] == b"MM\x00*"
            assert np.array_equal(decode_tiff(t), px), (comp, pred)
    g = _grid(7, 9)
    assert np.array_equal(decode_tiff(encode_tiff(g, byteorder="MM")), g)
    t = encode_tiff(_smooth(16, 12, 3), compression="jpeg",
                    jpeg_tables=True, byteorder="MM")
    assert _psnr(decode_tiff(t), _smooth(16, 12, 3)) >= 40


def test_mm_inline_short_values_left_justified():
    """TIFF 6.0 §2: inline values sit in the FIRST bytes of the 4-byte
    value field.  Under MM a lone SHORT packed as a 4-byte int would land
    in the last two bytes and every type-3 tag would read 0."""
    t = encode_tiff(_grid(4, 4), byteorder="MM")
    (ifd_off,) = struct.unpack(">I", t[4:8])
    (n,) = struct.unpack(">H", t[ifd_off : ifd_off + 2])
    tags = {}
    for i in range(n):
        at = ifd_off + 2 + 12 * i
        tag, typ, cnt = struct.unpack(">HHI", t[at : at + 8])
        if typ == 3 and cnt == 1:
            tags[tag] = struct.unpack(">H", t[at + 8 : at + 10])[0]
    assert tags[259] == 1      # Compression = none
    assert tags[262] == 1      # Photometric = BlackIsZero
    assert tags[277] == 1      # SamplesPerPixel
    assert tags[258] == 8      # BitsPerSample


def test_encode_tiff_rejects_unknown_byteorder():
    with pytest.raises(ValueError, match="byteorder"):
        encode_tiff(_grid(4, 4), byteorder="XX")


def test_tiff_metadata_walk_without_decode():
    """tiff_metadata must report the written tags for every compression /
    predictor / byteorder / JPEGTables combination without touching strip
    data, and keep the codec family's loud-truncation contract."""
    import pytest

    from lakehouse_sfc_spark.operators.multimodal import _synth_pixels
    from lakehouse_sfc_spark.operators.tiff import encode_tiff, tiff_metadata

    px = _synth_pixels(11, 20, 17)
    cases = [
        ("none", 1, "II", False, 1),
        ("packbits", 1, "II", False, 32773),
        ("lzw", 2, "MM", False, 5),
        ("deflate", 2, "II", False, 8),
        ("jpeg", 1, "MM", True, 7),
    ]
    for comp, pred, bo, jt, tag in cases:
        m = tiff_metadata(
            encode_tiff(px, compression=comp, predictor=pred,
                        byteorder=bo, jpeg_tables=jt)
        )
        assert (m["compression"], m["predictor"], m["byteorder"],
                m["has_jpeg_tables"]) == (tag, pred, bo, jt)
        assert (m["width"], m["height"], m["n_strips"]) == (20, 17, 3)
        assert m["photometric"] == 2
    with pytest.raises(ValueError, match="not a TIFF"):
        tiff_metadata(b"nope")
    with pytest.raises(ValueError, match="truncated TIFF"):
        tiff_metadata(encode_tiff(px)[:10])
