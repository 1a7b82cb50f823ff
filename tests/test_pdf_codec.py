"""PDF container codec: writer/parser roundtrip, xref byte-exactness,
integrity tampering, and loud refusals."""

from __future__ import annotations

import re

import pytest

from lakehouse_sfc_spark.operators.pdf import (
    _content_bytes,
    encode_pdf,
    pdf_metadata,
)


def test_roundtrip_multi_page():
    for d, np in [(0, 1), (7, 2), (42, 4), (99, 3)]:
        p = encode_pdf(d, np, lambda j, d=d: 60 + (d + j) % 50)
        meta = pdf_metadata(p)
        assert meta["n_pages"] == np
        assert meta["n_objects"] == 2 + 2 * np
        assert meta["content_bytes"] == sum(
            60 + (d + j) % 50 for j in range(np)
        )
        assert meta["content_sum"] == sum(
            sum(_content_bytes(d, j, 60 + (d + j) % 50)) for j in range(np)
        )


def test_xref_offsets_are_validated():
    p = bytearray(encode_pdf(5, 2, lambda j: 64))
    # corrupt one xref offset entry: parser must refuse, not mis-read
    at = p.index(b"xref")
    entry = at + p[at:].index(b" n \n") - 16  # inside the first 'n' entry
    p[entry] = ord("9")
    with pytest.raises(ValueError, match="offset"):
        pdf_metadata(bytes(p))


def test_stream_length_is_checked():
    p = encode_pdf(5, 1, lambda j: 64)
    # inflate the declared /Length past the real blob: must refuse
    bad = re.sub(rb"/Length (\d+)",
                 lambda m: b"/Length %d" % (int(m.group(1)) + 5000), p)
    with pytest.raises(ValueError):
        pdf_metadata(bad)


def test_refusals_by_name():
    p = encode_pdf(5, 1, lambda j: 64)
    enc = p.replace(b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 9 0 R")
    with pytest.raises(NotImplementedError, match="encrypted"):
        pdf_metadata(enc)
    prev = p.replace(b"/Root 1 0 R", b"/Root 1 0 R /Prev 100")
    with pytest.raises(NotImplementedError, match="incrementally"):
        pdf_metadata(prev)
    # length-preserving filter swap (offsets must stay byte-exact)
    lzw = p.replace(b"/Filter /FlateDecode", b"/Filter /LZWDecodeXX")
    with pytest.raises(NotImplementedError, match="LZWDecodeXX"):
        pdf_metadata(lzw)
    with pytest.raises(ValueError, match="not a PDF"):
        pdf_metadata(b"%PNG nope")
