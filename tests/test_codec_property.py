"""Property-based tests for the dependency-free kernels added in round 4:

- Bloom filters must NEVER false-negative (a miss would silently drop
  result rows when used for file skipping) across mixed value types and
  canonical-form aliases (5 vs 5.0).
- The PNG codec must round-trip arbitrary 8-bit images exactly (RGB, RGBA,
  grayscale, degenerate 1-pixel shapes).
- The exact ntile batch-size contract: for any (total, n_batches), the
  closed-form batch id in _ranged_batch_assignment gives sizes differing by
  at most 1 with the first ``total % n`` batches one larger.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from lakehouse_sfc_spark.layout.bloom import bloom_build, bloom_may_contain
from lakehouse_sfc_spark.operators.multimodal import decode_png, encode_png


@given(
    vals=st.lists(
        st.one_of(
            st.integers(min_value=-(10**12), max_value=10**12),
            st.floats(allow_nan=False, allow_infinity=False, width=32),
            st.text(max_size=20),
        ),
        min_size=0,
        max_size=200,
    ),
    fpp=st.sampled_from([0.001, 0.01, 0.1]),
)
@settings(max_examples=50, deadline=None)
def test_bloom_never_false_negative(vals, fpp):
    b = bloom_build(vals, fpp)
    for v in vals:
        assert bloom_may_contain(b, v)


@given(
    h=st.integers(min_value=1, max_value=24),
    w=st.integers(min_value=1, max_value=24),
    ch=st.sampled_from([0, 3, 4]),  # 0 => grayscale 2-D array
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_property(h, w, ch, seed):
    rng = np.random.default_rng(seed)
    shape = (h, w) if ch == 0 else (h, w, ch)
    px = rng.integers(0, 256, size=shape, dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(px)), px)


@given(
    total=st.integers(min_value=0, max_value=5000),
    n=st.integers(min_value=1, max_value=64),
)
@settings(max_examples=200, deadline=None)
def test_ntile_closed_form_contract(total, n):
    """The pure arithmetic at the heart of _ranged_batch_assignment
    (layout/upsert.py): rank -> batch id must reproduce the exact ntile
    size contract without a global sort."""
    q, rem = divmod(total, n)
    boundary = rem * (q + 1)
    sizes = [0] * (n + 1)
    for rank in range(1, total + 1):
        if boundary and rank <= boundary:
            b = (rank - 1) // max(q + 1, 1) + 1
        else:
            b = rem + (rank - boundary - 1) // max(q, 1) + 1
        sizes[b] += 1
    body = sizes[1:]
    assert sum(body) == total
    assert max(body, default=0) - min(body, default=0) <= 1 if total >= n else True
    # first `rem` batches get the extra row
    for i, sz in enumerate(body, start=1):
        expect = q + 1 if i <= rem else q
        assert sz == expect, (total, n, i, sz, expect)


# --- spec-worked external goldens (round 8) ---------------------------------
#
# Every byte below is derived from the PUBLISHED specs (RFC 9639 for FLAC,
# the WebP lossless bitstream spec for VP8L) with bit-packing and CRC
# implementations written HERE, importing nothing from the codec modules
# except the decoder under test — the same independence discipline as the
# hand-transcribed TIFF-LZW strip.  A matched encoder/decoder bug cannot
# satisfy these.


def _crc8_spec(data: bytes) -> int:
    """CRC-8, poly x^8+x^2+x+1 (0x07), init 0 — RFC 9639 frame header CRC."""
    crc = 0
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16_spec(data: bytes) -> int:
    """CRC-16, poly x^16+x^15+x^2+1 (0x8005), init 0 — RFC 9639 frame CRC."""
    crc = 0
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


def test_flac_spec_worked_fixed_order_rice_golden():
    """Hand-worked RFC 9639 stream: 4 mono 16-bit samples [10, 12, 14, 17],
    one frame, FIXED order-1 subframe, one Rice partition with k=1.

    Derivation (§9.2.5 unary = q zeros then a one; zigzag §9.2.7):
      residuals  = [12-10, 14-12, 17-14] = [2, 2, 3]
      zigzag     = [4, 4, 6]; with k=1 -> (q, r) = (2,0) (2,0) (3,0)
      bitstream  = 00 (rice 4-bit) 0000 (partition order) 0001 (k)
                   0010 0010 00010 + 1 pad bit
                 = bytes 00 48 84
    """
    import hashlib
    import struct

    from lakehouse_sfc_spark.operators.flac import decode_flac

    samples = np.array([10, 12, 14, 17], dtype="<i2")
    pack = (16000 << 44) | (0 << 41) | (15 << 36) | 4
    streaminfo = (
        struct.pack(">HH", 4096, 4096)
        + b"\x00\x00\x00" + b"\x00\x00\x00"
        + struct.pack(">Q", pack)
        + hashlib.md5(samples.tobytes()).digest()
    )
    header = b"fLaC" + bytes([0x80]) + struct.pack(">I", len(streaminfo))[1:]
    # frame header: sync+fixed FF F8; blocksize code 0110 (8-bit at end)
    # + sample-rate code 0000; channels 0000 + bps 100 (16-bit) + reserved;
    # frame number 0 (UTF-8); blocksize-1 = 3; CRC-8
    fh = bytearray(b"\xff\xf8\x60\x08\x00\x03")
    fh.append(_crc8_spec(bytes(fh)))
    # subframe header: pad 0, type 001001 (FIXED order 1), wasted 0 = 0x12
    # warm-up sample 10 as 16 raw bits, then the worked Rice bytes
    frame = bytes(fh) + b"\x12\x00\x0a" + b"\x00\x48\x84"
    frame += struct.pack(">H", _crc16_spec(frame))
    rate, out = decode_flac(header + streaminfo + frame)
    assert rate == 16000
    assert out.tolist() == [10, 12, 14, 17]


def test_webp_spec_worked_cl_lz77_cache_golden():
    """Hand-worked VP8L stream exercising the machinery the simple-code
    golden cannot: a normal (CL-coded) green prefix tree with 18-runs and
    the max-symbol escape, an LZ77 backward reference with an absolute
    (>120) distance code, and a color-cache hit.

    Image: 1x4, every pixel (r,g,b,a) = (10, 20, 30, 255):
      p0 = literals; p1..p2 = backref (length 2, distance 1, i.e. distance
      code 121 = length-prefix 13 + 5 extra bits of 24); p3 = color-cache
      hit (cache_bits=1, index = (0x1E35A7BD * ARGB mod 2^32) >> 31).
    Green alphabet = 256 + 24 + 2; code lengths {20: 1, 257: 2, 280+idx: 2}
    transmitted via CL lengths {1: 2, 2: 2, 17: 2, 18: 2} (canonical:
    1->00, 2->01, 17->10, 18->11) and max_symbol escape = 7 CL reads.
    """
    import struct

    from lakehouse_sfc_spark.operators.webp import decode_webp

    argb = (255 << 24) | (10 << 16) | (20 << 8) | 30
    idx = ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> 31  # cache_bits = 1

    acc, n, out = 0, 0, bytearray()

    def put(v, k):
        nonlocal acc, n
        acc |= (v & ((1 << k) - 1)) << n
        n += k
        while n >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n -= 8

    put(0x2F, 8)   # VP8L signature
    put(3, 14)     # width-1
    put(0, 14)     # height-1
    put(0, 1)      # alpha hint
    put(0, 3)      # version
    put(0, 1)      # no transforms
    put(1, 1)      # color cache present
    put(1, 4)      # cache_bits = 1 (2 entries)
    put(0, 1)      # no meta prefix image
    # ---- green code: NORMAL (CL-coded) ----
    put(0, 1)      # not simple
    put(1, 4)      # num_code_lengths = 5 (order 17, 18, 0, 1, 2)
    for cl_len in (2, 2, 0, 2, 2):
        put(cl_len, 3)
    put(1, 1)      # max-symbol escape present
    put(1, 3)      # length_nbits = 2 + 2*1 = 4
    put(5, 4)      # max_symbol = 2 + 5 = 7 CL reads, trailing zeros implicit
    # CL symbol stream (codes read MSB-first: emit high bit first)
    put(1, 1); put(1, 1); put(9, 7)      # 18: skip 20 zeros (syms 0..19)
    put(0, 1); put(0, 1)                 # 1: sym 20 gets length 1
    put(1, 1); put(1, 1); put(127, 7)    # 18: skip 138 zeros (21..158)
    put(1, 1); put(1, 1); put(87, 7)     # 18: skip 98 zeros (159..256)
    put(0, 1); put(1, 1)                 # 2: sym 257 gets length 2
    # 18: skip zeros 258..279+idx (22 or 23)
    put(1, 1); put(1, 1); put(11 + idx, 7)
    put(0, 1); put(1, 1)                 # 2: sym 280+idx gets length 2
    # ---- r / b / a / distance codes: 1-symbol simple ----
    for sym in (10, 30, 255, 13):        # distance prefix 13
        put(1, 1); put(0, 1); put(1, 1); put(sym, 8)
    # ---- pixel data ----
    put(0, 1)                 # p0: green code '0' -> literal 20 (r/b/a 0-bit)
    put(1, 1); put(0, 1)      # backref: green '10' -> sym 257 -> length 2
    put(24, 5)                # distance prefix 13 extras: code 97+24 = 121
    put(1, 1); put(1, 1)      # p3: green '11' -> cache symbol 280+idx
    if n:
        out.append(acc & 0xFF)
    body = bytes(out)
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunk += b"\x00"
    webp = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    px = decode_webp(webp)
    assert px.shape == (1, 4, 3)
    assert px.reshape(-1, 3).tolist() == [[10, 20, 30]] * 4
