"""Native codec tests: uncompressed BMP and PCM-16 WAV round-trips, real
nearest-neighbor resize, and the format-sniffing ``decode_real_batches``
kernel end-to-end through ``mapInPandas`` over a binary column."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from lakehouse_sfc_spark.operators.multimodal import (
    DECODED_SCHEMA,
    decode_audio,
    decode_bmp,
    decode_image,
    decode_real_batches,
    decode_wav,
    encode_bmp,
    encode_wav_pcm16,
    resize_bmp,
)


def _gradient(h: int, w: int) -> np.ndarray:
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [(x * 7) % 256, (y * 11) % 256, (x + y) % 256], axis=-1
    ).astype(np.uint8)


def test_bmp_roundtrip_exact():
    for h, w in [(1, 1), (3, 5), (16, 16), (7, 13)]:  # odd widths hit padding
        px = _gradient(h, w)
        assert np.array_equal(decode_bmp(encode_bmp(px)), px)


def test_bmp_rejects_unsupported():
    with pytest.raises(ValueError):
        decode_bmp(b"NOPE....")
    # PNG/JPEG (r4), GIF (r5), TIFF (r6), ICO/WebP (r7) decode natively;
    # a truncated ICO is a malformed KNOWN format: loud ValueError
    with pytest.raises(ValueError):
        decode_image(b"\x00\x00\x01\x00........")  # truncated ICO dir
    # a truncated TIFF is a malformed KNOWN format: loud ValueError
    with pytest.raises(ValueError):
        decode_image(b"II*\x00....")


def test_wav_roundtrip_exact():
    mono = (np.sin(np.linspace(0, 20, 500)) * 20000).astype(np.int16)
    rate, out = decode_wav(encode_wav_pcm16(mono, 8000))
    assert rate == 8000
    assert np.array_equal(out, mono)

    stereo = np.stack([mono, -mono], axis=1)
    rate, out = decode_wav(encode_wav_pcm16(stereo, 44100))
    assert rate == 44100
    assert out.shape == (500, 2)
    assert np.array_equal(out, stereo)


def test_wav_tolerates_extra_chunks():
    mono = np.arange(-50, 50, dtype=np.int16)
    raw = encode_wav_pcm16(mono, 16000)
    # splice a LIST chunk between fmt and data (odd size exercises padding)
    head, rest = raw[:36], raw[36:]
    extra = b"LIST" + (5).to_bytes(4, "little") + b"INFOx" + b"\x00"
    spliced = (
        raw[:4]
        + (len(raw) - 8 + len(extra)).to_bytes(4, "little")
        + head[8:]
        + extra
        + rest
    )
    rate, out = decode_wav(spliced)
    assert rate == 16000
    assert np.array_equal(out, mono)
    assert decode_audio(spliced)[0] == 16000


def test_resize_bmp_nearest_neighbor():
    px = _gradient(8, 12)
    out = decode_bmp(resize_bmp(encode_bmp(px), out_w=6, out_h=4))
    assert out.shape == (4, 6, 3)
    # nearest-neighbor: every output pixel is an exact input pixel
    yi = np.arange(4) * 8 // 4
    xi = np.arange(6) * 12 // 6
    assert np.array_equal(out, px[yi][:, xi])


def test_decode_real_batches_in_spark(spark):
    bmp = encode_bmp(_gradient(9, 7))
    wav = encode_wav_pcm16(np.arange(300, dtype=np.int16), 16000)
    other = b"\x00\x01\x02unknown-codec"
    rows = [
        (1, bytearray(bmp), 0, 0),
        (2, bytearray(wav), 0, 0),
        (3, bytearray(other), 640, 480),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, payload binary, width int, height int"
    )
    got = {
        r["doc_id"]: r
        for r in df.mapInPandas(decode_real_batches, DECODED_SCHEMA).collect()
    }
    assert got[1]["width"] == 7 and got[1]["height"] == 9
    assert got[1]["frames"] == 1
    assert got[2]["frames"] == 300
    assert got[3]["width"] == 640 and got[3]["frames"] == 0
    for doc_id, payload, _, _ in rows:
        assert got[doc_id]["checksum"] == hashlib.md5(bytes(payload)).hexdigest()
        assert got[doc_id]["n_bytes"] == len(payload)


def test_real_codec_registry_queries(spark):
    """The oracle-paired real-codec queries: every output column is a
    closed-form function of doc_id, recomputed here independently."""
    from lakehouse_sfc_spark.queries.registry import QUERIES

    sf = "/root/testdata/sf0.001"
    img = {
        r["doc_id"]: r
        for r in QUERIES["multimodal_decode_real"].fn(spark, sf).collect()
    }
    assert len(img) > 0
    for d, r in img.items():
        w, h = 16 + d % 17, 8 + d % 13
        assert (r["width"], r["height"], r["frames"]) == (w, h, 1)
        assert r["n_bytes"] == 54 + ((w * 3 + 3) & ~3) * h
        expect = sum(
            3 * ((3 * x + 7 * y + d) % 251) for x in range(w) for y in range(h)
        )
        assert r["pixel_sum"] == expect

    aud = {
        r["doc_id"]: r
        for r in QUERIES["multimodal_audio_real"].fn(spark, sf).collect()
    }
    assert len(aud) > 0
    for d, r in aud.items():
        n = 400 + d % 257
        assert (r["sample_rate"], r["n_samples"]) == (16000, n)
        assert r["duration_s"] == n / 16000.0
        assert r["sum_samples"] == sum(
            (7 * d + 13 * i) % 4001 - 2000 for i in range(n)
        )


def test_png_roundtrip_shapes():
    import numpy as np

    from lakehouse_sfc_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(7)
    for shape in [(9, 13, 3), (5, 8, 4), (6, 7)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(px)), px), shape


def test_png_decodes_all_filter_types():
    """The decoder must reverse every PNG scanline filter, not just the
    filter-0 our encoder emits: build IDATs with each filter applied."""
    import struct
    import zlib

    import numpy as np

    from lakehouse_sfc_spark.operators.multimodal import (
        _paeth,
        _png_chunk,
        _PNG_MAGIC,
        decode_png,
    )

    def encode_with_filter(px, ftype):
        h, w, ch = px.shape
        stride = w * ch
        flat = px.reshape(h, stride).astype(np.int16)
        out = bytearray()
        prev = np.zeros(stride, dtype=np.int16)
        for y in range(h):
            line = flat[y]
            left = np.concatenate([np.zeros(ch, np.int16), line[:-ch]])
            if ftype == 0:
                f = line
            elif ftype == 1:
                f = line - left
            elif ftype == 2:
                f = line - prev
            elif ftype == 3:
                f = line - ((left + prev) >> 1)
            else:
                ul = np.concatenate([np.zeros(ch, np.int16), prev[:-ch]])
                pa = _paeth(
                    left.astype(np.uint8), prev.astype(np.uint8),
                    ul.astype(np.uint8),
                )
                f = line - pa
            out += bytes([ftype]) + bytes((f & 0xFF).astype(np.uint8))
            prev = line
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        return (_PNG_MAGIC + _png_chunk(b"IHDR", ihdr)
                + _png_chunk(b"IDAT", zlib.compress(bytes(out)))
                + _png_chunk(b"IEND", b""))

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(7, 11, 3), dtype=np.uint8)
    for f in range(5):
        assert np.array_equal(decode_png(encode_with_filter(px, f)), px), f


def test_png_crc_check():
    import numpy as np
    import pytest

    from lakehouse_sfc_spark.operators.multimodal import decode_png, encode_png

    payload = bytearray(encode_png(np.zeros((4, 4, 3), dtype=np.uint8)))
    payload[40] ^= 0xFF  # corrupt a byte inside IDAT
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(payload))


def test_png_registry_query(spark):
    from lakehouse_sfc_spark.queries.registry import QUERIES

    sf = "/root/testdata/sf0.001"
    rows = {
        r["doc_id"]: r
        for r in QUERIES["multimodal_png_real"].fn(spark, sf).collect()
    }
    assert len(rows) > 0
    for d, r in rows.items():
        w, h = 16 + d % 17, 8 + d % 13
        assert (r["width"], r["height"], r["frames"]) == (w, h, 1)
        expect = sum(
            3 * ((3 * x + 7 * y + d) % 251) for x in range(w) for y in range(h)
        )
        assert r["pixel_sum"] == expect


# --- MJPEG-in-AVI container -------------------------------------------------


def test_avi_mjpeg_roundtrip():
    import numpy as np

    from lakehouse_sfc_spark.operators.avi import (
        decode_avi_mjpeg,
        encode_avi_mjpeg,
    )
    from lakehouse_sfc_spark.operators.multimodal import _synth_pixels

    frames = [_synth_pixels(1000 + 31 * f, 24, 16) for f in range(6)]
    payload = encode_avi_mjpeg(frames, fps=25)
    fps, dec = decode_avi_mjpeg(payload)
    assert fps == 25
    assert len(dec) == 6
    for src, px in zip(frames, dec):
        assert px.shape == src.shape
        mse = float(np.mean((px.astype(np.float64) - src) ** 2))
        psnr = 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)
        assert psnr >= 30.0, psnr


def test_avi_frames_are_distinct():
    """A demuxer bug that returned frame 0 N times must be detectable: the
    per-frame seeds produce distinct decoded content."""
    import numpy as np

    from lakehouse_sfc_spark.operators.avi import (
        decode_avi_mjpeg,
        encode_avi_mjpeg,
    )
    from lakehouse_sfc_spark.operators.multimodal import _synth_pixels

    frames = [_synth_pixels(7 * 31 + f, 20, 12) for f in range(4)]
    _, dec = decode_avi_mjpeg(encode_avi_mjpeg(frames))
    sums = [int(px.astype(np.int64).sum()) for px in dec]
    assert len(set(sums)) == len(sums), sums


def test_avi_rejects_garbage():
    import pytest

    from lakehouse_sfc_spark.operators.avi import (
        decode_avi_mjpeg,
        encode_avi_mjpeg,
    )
    from lakehouse_sfc_spark.operators.multimodal import _synth_pixels

    with pytest.raises(ValueError, match="RIFF"):
        decode_avi_mjpeg(b"\x00" * 64)
    with pytest.raises(ValueError, match="at least one frame"):
        encode_avi_mjpeg([])
    with pytest.raises(ValueError, match="share geometry"):
        encode_avi_mjpeg(
            [_synth_pixels(1, 16, 16), _synth_pixels(2, 20, 16)]
        )
    # truncated container: a chunk overruns the buffer
    good = encode_avi_mjpeg([_synth_pixels(3, 16, 16)])
    with pytest.raises(ValueError):
        decode_avi_mjpeg(good[: len(good) // 2])


def test_avi_skips_unknown_chunks():
    """Real demuxer behavior: foreign chunks (e.g. 'JUNK') are skipped by
    size, frames still decode."""
    import struct

    from lakehouse_sfc_spark.operators.avi import (
        decode_avi_mjpeg,
        encode_avi_mjpeg,
    )
    from lakehouse_sfc_spark.operators.multimodal import _synth_pixels

    payload = bytearray(encode_avi_mjpeg([_synth_pixels(5, 16, 12)] , fps=10))
    junk = b"JUNK" + struct.pack("<I", 6) + b"abcdef"
    out = bytes(payload[:12]) + junk + bytes(payload[12:])
    out = out[:4] + struct.pack("<I", len(out) - 8) + out[8:]
    fps, dec = decode_avi_mjpeg(out)
    assert fps == 10 and len(dec) == 1


# --- GIF (LZW) ---------------------------------------------------------------


def test_gif_roundtrip_exact():
    from lakehouse_sfc_spark.operators.gif import decode_gif, encode_gif

    rng = np.random.RandomState(11)
    for h, w in [(1, 1), (8, 16), (33, 61), (64, 200)]:
        idx = rng.randint(0, 251, (h, w)).astype(np.uint8)
        out = decode_gif(encode_gif(idx))
        assert out.shape == (h, w, 3)
        for c in range(3):  # grayscale palette: every channel == index
            assert (out[:, :, c] == idx).all()


def test_gif_lzw_dict_reset_and_kwkwk():
    """Images long enough to overflow the 4096-code table exercise the
    clear-code reset; constant images exercise the KwKwK decoder case."""
    from lakehouse_sfc_spark.operators.gif import decode_gif, encode_gif

    big = np.tile(np.arange(256, dtype=np.uint8), (40, 30))[:40, :2000]
    assert (decode_gif(encode_gif(big))[:, :, 0] == big).all()
    const = np.full((50, 300), 7, dtype=np.uint8)
    assert (decode_gif(encode_gif(const))[:, :, 0] == const).all()


def test_gif_rejects_unsupported():
    from lakehouse_sfc_spark.operators.gif import decode_gif, encode_gif

    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"NOPE" * 4)
    # interlace flag set -> explicit NotImplementedError
    g = bytearray(encode_gif(np.zeros((4, 4), dtype=np.uint8)))
    desc = g.index(0x2C, 13 + 768)
    g[desc + 9] |= 0x40
    with pytest.raises(NotImplementedError, match="interlaced"):
        decode_gif(bytes(g))


def test_gif_skips_extension_blocks():
    """GIF89a graphic-control extensions before the image must be skipped."""
    from lakehouse_sfc_spark.operators.gif import decode_gif, encode_gif

    idx = np.arange(16, dtype=np.uint8).reshape(4, 4)
    g = encode_gif(idx)
    head, rest = g[: 13 + 768], g[13 + 768 :]
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    patched = b"GIF89a" + head[6:] + gce + rest
    assert (decode_gif(patched)[:, :, 0] == idx).all()


def test_gif_dispatches_through_decode_image():
    from lakehouse_sfc_spark.operators.gif import encode_gif

    idx = np.arange(64, dtype=np.uint8).reshape(8, 8)
    out = decode_image(encode_gif(idx))
    assert out.shape == (8, 8, 3)
    assert (out[:, :, 0] == idx).all()


def test_gif_truncated_payloads_raise_valueerror():
    """Truncation anywhere (header, palette, descriptor, sub-blocks) must
    raise the codec-family ValueError contract, never IndexError."""
    from lakehouse_sfc_spark.operators.gif import decode_gif, encode_gif

    g = encode_gif(np.arange(64, dtype=np.uint8).reshape(8, 8))
    for cut in (8, 100, 13 + 768 + 5, len(g) - 3):
        with pytest.raises(ValueError, match="truncated GIF|no image"):
            decode_gif(g[:cut])


# --- ICO container (operators/ico.py) --------------------------------------


def _ico_grid(doc_id, w, h):
    from lakehouse_sfc_spark.operators.multimodal import _synth_pixels

    return _synth_pixels(doc_id, w, h)


@pytest.mark.parametrize("storage", ["dib24", "dib32", "png"])
def test_ico_roundtrip_all_storages(storage):
    from lakehouse_sfc_spark.operators.ico import decode_ico, encode_ico

    px = _ico_grid(9, 21, 10)
    out = decode_ico(encode_ico([px], [storage]))
    assert out.shape == px.shape
    assert (out == px).all()


def test_ico_picks_largest_entry_regardless_of_order():
    from lakehouse_sfc_spark.operators.ico import decode_ico, encode_ico

    big, small = _ico_grid(3, 24, 12), _ico_grid(3, 12, 6)
    for order in ([small, big], [big, small]):
        out = decode_ico(encode_ico(order, ["png", "dib24"]))
        assert out.shape == big.shape
        assert (out == big).all()


def test_ico_256_pixel_sides_encode_as_zero():
    """The directory stores 256 as 0; decode must read it back as 256."""
    from lakehouse_sfc_spark.operators.ico import decode_ico, encode_ico

    px = _ico_grid(1, 256, 4)
    assert (decode_ico(encode_ico([px])) == px).all()


def test_ico_golden_fixture_hand_built():
    """Fixed hand-assembled ICO bytes (not produced by encode_ico): one
    2x1 24-bpp DIB entry, red-then-blue pixels, explicit AND mask — a
    matched encoder/decoder bug cannot fake this (ADVICE golden-fixture
    pattern).  XOR row: BGR bottom-up padded to 4 bytes; AND row pads to
    32 bits."""
    import struct

    from lakehouse_sfc_spark.operators.ico import decode_ico

    xor = bytes([0, 0, 255] + [255, 0, 0]) + b"\x00\x00"  # red, blue + pad
    and_mask = b"\x00\x00\x00\x00"
    dib = (
        struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0,
                    len(xor) + len(and_mask), 0, 0, 0, 0)
        + xor + and_mask
    )
    ico = (
        struct.pack("<HHH", 0, 1, 1)
        + struct.pack("<BBBBHHII", 2, 1, 0, 0, 1, 32, len(dib), 22)
        + dib
    )
    out = decode_ico(ico)
    assert out.shape == (1, 2, 3)
    assert out[0, 0].tolist() == [255, 0, 0]  # red
    assert out[0, 1].tolist() == [0, 0, 255]  # blue


def test_ico_refusals_are_loud_and_typed():
    from lakehouse_sfc_spark.operators.ico import decode_ico, encode_ico

    with pytest.raises(NotImplementedError, match="CUR cursor"):
        decode_ico(b"\x00\x00\x02\x00\x01\x00" + b"\x00" * 16)
    with pytest.raises(ValueError, match="not an ICO"):
        decode_ico(b"RIFF....")
    with pytest.raises(ValueError, match="empty ICO"):
        decode_ico(b"\x00\x00\x01\x00\x00\x00")
    # palette DIB refuses by bpp, naming the gap
    import struct

    dib = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 8, 0, 0, 0, 0, 0, 0)
    ico = (
        struct.pack("<HHH", 0, 1, 1)
        + struct.pack("<BBBBHHII", 2, 1, 0, 0, 1, 8, len(dib), 22)
        + dib
    )
    with pytest.raises(NotImplementedError, match="8-bpp"):
        decode_ico(ico)


def test_ico_dispatches_through_decode_image():
    from lakehouse_sfc_spark.operators.ico import encode_ico

    px = _ico_grid(5, 9, 7)
    out = decode_image(encode_ico([px], ["png"]))
    assert (out == px).all()


# --- WebP lossless / VP8L (operators/webp.py) ------------------------------


@pytest.mark.parametrize("sg", [True, False])
def test_webp_roundtrip_grids_and_random(sg):
    from lakehouse_sfc_spark.operators.webp import decode_webp, encode_webp

    for d, w, h in [(7, 20, 11), (0, 1, 1), (3, 33, 2)]:
        px = _ico_grid(d, w, h)
        assert (decode_webp(encode_webp(px, subtract_green=sg)) == px).all()
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (19, 13, 3), dtype=np.uint8)
    assert (decode_webp(encode_webp(px, subtract_green=sg)) == px).all()


def test_webp_subtract_green_actually_compresses():
    """On channel-correlated grids the transform must collapse red/blue
    toward zero-bit codes — the stream shrinks ~2.5x+ vs literal coding."""
    from lakehouse_sfc_spark.operators.webp import encode_webp

    px = _ico_grid(123, 64, 64)
    sg = len(encode_webp(px, subtract_green=True))
    raw = len(encode_webp(px, subtract_green=False))
    assert sg * 2.5 < raw, (sg, raw)


def test_webp_golden_fixture_hand_assembled():
    """Fixed hand-assembled VP8L bitstream (spec transcription, NOT built
    with the module's writer): 1x2 image, simple prefix codes everywhere —
    pixels (1,2,3) and (1,5,3).  Pins the container layout, LSB-first bit
    order, header field order, simple-code wire format and per-pixel
    channel order against the spec, independent of encode_webp."""
    import struct

    from lakehouse_sfc_spark.operators.webp import decode_webp

    acc, n, out = 0, 0, bytearray()

    def put(v, k):
        nonlocal acc, n
        acc |= (v & ((1 << k) - 1)) << n
        n += k
        while n >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n -= 8

    put(0x2F, 8)          # VP8L signature
    put(1, 14)            # width-1
    put(0, 14)            # height-1
    put(0, 1)             # alpha unused
    put(0, 3)             # version
    put(0, 1)             # no transforms
    put(0, 1)             # no color cache
    put(0, 1)             # no meta prefix image
    put(1, 1); put(1, 1); put(1, 1); put(2, 8); put(5, 8)  # green: {2, 5}
    put(1, 1); put(0, 1); put(0, 1); put(1, 1)             # red: {1}
    put(1, 1); put(0, 1); put(1, 1); put(3, 8)             # blue: {3}
    put(1, 1); put(0, 1); put(1, 1); put(255, 8)           # alpha: {255}
    put(1, 1); put(0, 1); put(0, 1); put(0, 1)             # distance: {0}
    put(0, 1)             # pixel 0: green code 0 -> symbol 2
    put(1, 1)             # pixel 1: green code 1 -> symbol 5
    if n:
        out.append(acc & 0xFF)
    body = bytes(out)
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunk += b"\x00"
    webp = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    px = decode_webp(webp)
    assert px.shape == (1, 2, 3)
    assert px[0, 0].tolist() == [1, 2, 3]
    assert px[0, 1].tolist() == [1, 5, 3]


def _vp8l_stream(build_body):
    """Helper: wrap a _BitWriter body in the RIFF/VP8L container."""
    import struct

    from lakehouse_sfc_spark.operators.webp import _BitWriter

    bw = _BitWriter()
    build_body(bw)
    body = bw.done()
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def test_webp_decodes_color_cache_symbols():
    """Decoder-only surface: a stream using a color cache (cache_bits=2)
    — literal pixel, then a cache-hit symbol reproducing it."""
    from lakehouse_sfc_spark.operators.webp import (
        _write_full_code,
        decode_webp,
    )

    argb = (255 << 24) | (10 << 16) | (20 << 8) | 30
    idx = (0x1E35A7BD * argb & 0xFFFFFFFF) >> 30  # cache_bits=2
    cache_sym = 280 + idx

    def body(bw):
        bw.bits(0x2F, 8)
        bw.bits(1, 14)   # width 2
        bw.bits(0, 14)   # height 1
        bw.bits(0, 1)
        bw.bits(0, 3)
        bw.bits(0, 1)    # no transforms
        bw.bits(1, 1)    # color cache present
        bw.bits(2, 4)    # cache_bits = 2
        bw.bits(0, 1)    # no meta image
        _write_full_code(bw, {20: 1, cache_sym: 1}, 280 + 4)  # green
        bw.bits(1, 1); bw.bits(0, 1); bw.bits(1, 1); bw.bits(10, 8)  # red
        bw.bits(1, 1); bw.bits(0, 1); bw.bits(1, 1); bw.bits(30, 8)  # blue
        bw.bits(1, 1); bw.bits(0, 1); bw.bits(1, 1); bw.bits(255, 8)  # alpha
        bw.bits(1, 1); bw.bits(0, 1); bw.bits(0, 1); bw.bits(0, 1)  # dist
        from lakehouse_sfc_spark.operators.webp import _canonical_codes

        codes = _canonical_codes({20: 1, cache_sym: 1})
        c, l = codes[20]; bw.code(c, l)          # literal pixel
        c, l = codes[cache_sym]; bw.code(c, l)   # cache hit

    px = decode_webp(_vp8l_stream(body))
    assert px.shape == (1, 2, 3)
    assert px[0, 0].tolist() == [10, 20, 30]
    assert px[0, 1].tolist() == [10, 20, 30]


def test_webp_decodes_lz77_absolute_distance_and_refuses_plane_codes():
    """Decoder-only surface: a backward reference with an absolute
    distance (code 121 = distance 1, length 3) copies pixels; a 2D plane
    code (<=120) must refuse loudly, never guess."""
    from lakehouse_sfc_spark.operators.webp import (
        _canonical_codes,
        _write_full_code,
        decode_webp,
    )

    len_sym = 256 + 2  # length prefix 2 -> literal length 3

    def body(bw, dist_code_value):
        bw.bits(0x2F, 8)
        bw.bits(3, 14)   # width 4
        bw.bits(0, 14)   # height 1
        bw.bits(0, 1)
        bw.bits(0, 3)
        bw.bits(0, 1)    # no transforms
        bw.bits(0, 1)    # no cache
        bw.bits(0, 1)    # no meta
        _write_full_code(bw, {40: 1, len_sym: 1}, 280)  # green
        bw.bits(1, 1); bw.bits(0, 1); bw.bits(1, 1); bw.bits(7, 8)
        bw.bits(1, 1); bw.bits(0, 1); bw.bits(1, 1); bw.bits(9, 8)
        bw.bits(1, 1); bw.bits(0, 1); bw.bits(1, 1); bw.bits(255, 8)
        # distance code: simple 1-symbol {prefix}
        if dist_code_value == 121:
            # prefix 13, extra 5 bits value 24 -> (2+1)<<5 + 24 + 1 = 121
            bw.bits(1, 1); bw.bits(0, 1); bw.bits(1, 1); bw.bits(13, 8)
        else:  # plane code 1: prefix 0 -> value 1
            bw.bits(1, 1); bw.bits(0, 1); bw.bits(0, 1); bw.bits(0, 1)
        codes = _canonical_codes({40: 1, len_sym: 1})
        c, l = codes[40]; bw.code(c, l)       # literal (7,40,9)
        c, l = codes[len_sym]; bw.code(c, l)  # backref length 3
        if dist_code_value == 121:
            bw.bits(24, 5)                    # extra distance bits

    px = decode_webp(_vp8l_stream(lambda bw: body(bw, 121)))
    assert px.shape == (1, 4, 3)
    assert all(px[0, i].tolist() == [7, 40, 9] for i in range(4))

    with pytest.raises(NotImplementedError, match="plane code"):
        decode_webp(_vp8l_stream(lambda bw: body(bw, 1)))


def test_webp_refusals_are_loud_and_typed():
    from lakehouse_sfc_spark.operators.webp import decode_webp

    with pytest.raises(ValueError, match="not a WebP"):
        decode_webp(b"GIF89a....")
    # lossy VP8 chunk refuses by name
    lossy = b"RIFF" + b"\x10\x00\x00\x00" + b"WEBP" + b"VP8 " + b"\x04\x00\x00\x00junk"
    with pytest.raises(NotImplementedError, match="VP8"):
        decode_webp(lossy)


def test_webp_refuses_predictor_transform():
    from lakehouse_sfc_spark.operators.webp import decode_webp

    def body(bw):
        bw.bits(0x2F, 8)
        bw.bits(0, 14); bw.bits(0, 14); bw.bits(0, 1); bw.bits(0, 3)
        bw.bits(1, 1)   # transform present
        bw.bits(0, 2)   # predictor

    with pytest.raises(NotImplementedError, match="predictor"):
        decode_webp(_vp8l_stream(body))


def test_webp_dispatches_through_decode_image_not_as_wav():
    """RIFF magic is shared with WAV — the image dispatch must key on the
    WEBP fourcc, and decode_audio must keep refusing WebP payloads."""
    from lakehouse_sfc_spark.operators.webp import encode_webp

    px = _ico_grid(5, 9, 7)
    out = decode_image(encode_webp(px))
    assert (out == px).all()


# --- QOI (operators/qoi.py) -------------------------------------------------


def test_qoi_roundtrip_gradient_and_random():
    from lakehouse_sfc_spark.operators.qoi import decode_qoi, encode_qoi

    px = _gradient(11, 17)
    assert (decode_qoi(encode_qoi(px)) == px).all()
    rng = np.random.default_rng(7)
    noisy = rng.integers(0, 256, size=(9, 13, 3), dtype=np.uint8)
    assert (decode_qoi(encode_qoi(noisy)) == noisy).all()


def test_qoi_long_run_splits_at_62():
    """A 130-pixel constant image needs RUN chunks of 62+62+5 plus the
    initial literal — the run-length cap must split correctly."""
    from lakehouse_sfc_spark.operators.qoi import decode_qoi, encode_qoi

    px = np.full((10, 13, 3), 77, dtype=np.uint8)
    payload = encode_qoi(px)
    assert (decode_qoi(payload) == px).all()
    # constant image: header(14) + 1 literal + 3 run chunks + end(8)
    assert len(payload) <= 14 + 4 + 3 + 8


def test_qoi_gradient_hits_luma_index_rgb():
    """The synth grids exercise LUMA (the +3 gray step), INDEX (revisited
    colors) and RGB (mod-251 wraps) on every doc — the registry sweep's
    decoder coverage.  DIFF is outside the gradient's step size; it is
    pinned by the golden fixture and the dedicated encoder test below."""
    from lakehouse_sfc_spark.operators.multimodal import _synth_pixels
    from lakehouse_sfc_spark.operators.qoi import decode_qoi, encode_qoi

    px = _synth_pixels(19, 30, 20)
    payload = encode_qoi(px)
    body = payload[14:-8]
    seen = {"rgb": False, "index": False, "luma": False}
    pos = 0
    while pos < len(body):
        op = body[pos]
        if op == 0xFE:
            seen["rgb"] = True
            pos += 4
        elif op == 0xFF:
            pos += 5
        elif op & 0xC0 == 0x00:
            seen["index"] = True
            pos += 1
        elif op & 0xC0 == 0x40:
            pos += 1
        elif op & 0xC0 == 0x80:
            seen["luma"] = True
            pos += 2
        else:
            pos += 1
    assert all(seen.values()), seen
    assert (decode_qoi(payload) == px).all()


def test_qoi_encoder_emits_diff_for_small_deltas():
    from lakehouse_sfc_spark.operators.qoi import decode_qoi, encode_qoi

    px = np.array([[[100, 100, 100], [101, 100, 98]]], dtype=np.uint8)
    payload = encode_qoi(px)
    body = payload[14:-8]
    assert any(b & 0xC0 == 0x40 and b < 0xFE for b in body)
    assert (decode_qoi(payload) == px).all()


def test_qoi_golden_fixture_hand_assembled():
    """Fixed hand-assembled QOI bytes (NOT produced by encode_qoi): one
    RGB literal, one DIFF, one LUMA, a run of 2, one INDEX lookup.  Pins
    the wire format against matched encoder/decoder drift (the interop
    concern ADVICE raised for TIFF)."""
    import struct

    from lakehouse_sfc_spark.operators.qoi import decode_qoi

    stream = (
        b"qoif" + struct.pack(">IIBB", 3, 2, 3, 0)
        + bytes([0xFE, 10, 20, 30])  # RGB literal -> (10,20,30), slot 9
        + bytes([0x78])              # DIFF +1,0,-2 -> (11,20,28)
        + bytes([0xAA, 0x5D])        # LUMA dg=+10, dr-dg=-3, db-dg=+5 -> (18,30,43)
        + bytes([0xC1])              # RUN 2 -> (18,30,43) x2
        + bytes([0x09])              # INDEX slot 9 -> (10,20,30)
        + b"\x00" * 7 + b"\x01"
    )
    out = decode_qoi(stream)
    expect = np.array(
        [
            [[10, 20, 30], [11, 20, 28], [18, 30, 43]],
            [[18, 30, 43], [18, 30, 43], [10, 20, 30]],
        ],
        dtype=np.uint8,
    )
    assert (out == expect).all()


def test_qoi_decodes_rgba_stream_with_opaque_alpha():
    """channels=4 streams decode through the same kernel; fully-opaque
    alpha is validated and dropped, non-opaque refuses loudly."""
    import struct

    from lakehouse_sfc_spark.operators.qoi import decode_qoi

    head = b"qoif" + struct.pack(">IIBB", 2, 1, 4, 0)
    opaque = head + bytes([0xFF, 5, 6, 7, 255, 0xC0]) + b"\x00" * 7 + b"\x01"
    out = decode_qoi(opaque)
    assert out.shape == (1, 2, 3) and (out[0, 0] == (5, 6, 7)).all()

    translucent = head + bytes([0xFF, 5, 6, 7, 128, 0xC0]) + b"\x00" * 7 + b"\x01"
    with pytest.raises(NotImplementedError, match="alpha"):
        decode_qoi(translucent)


def test_qoi_refusals_are_loud_and_typed():
    import struct

    from lakehouse_sfc_spark.operators.qoi import decode_qoi, encode_qoi

    good = encode_qoi(_gradient(4, 5))
    with pytest.raises(ValueError, match="magic"):
        decode_qoi(b"qoix" + good[4:])
    with pytest.raises(ValueError, match="channels"):
        decode_qoi(good[:12] + bytes([5]) + good[13:])
    with pytest.raises(ValueError, match="end marker"):
        decode_qoi(good[:-1] + b"\x02")
    with pytest.raises(ValueError, match="truncated"):
        decode_qoi(good[:10])
    # pixel stream ends before all w*h pixels are produced
    short = (
        b"qoif" + struct.pack(">IIBB", 4, 4, 3, 0)
        + bytes([0xFE, 1, 2, 3]) + b"\x00" * 7 + b"\x01"
    )
    with pytest.raises(ValueError, match="truncated"):
        decode_qoi(short)
    # a run chunk overflowing the declared pixel count
    overflow = (
        b"qoif" + struct.pack(">IIBB", 2, 1, 3, 0)
        + bytes([0xFE, 1, 2, 3, 0xC0 | 61]) + b"\x00" * 7 + b"\x01"
    )
    with pytest.raises(ValueError, match="overflow"):
        decode_qoi(overflow)


def test_qoi_dispatches_through_decode_image():
    from lakehouse_sfc_spark.operators.qoi import encode_qoi

    px = _gradient(6, 8)
    assert (decode_image(encode_qoi(px)) == px).all()
