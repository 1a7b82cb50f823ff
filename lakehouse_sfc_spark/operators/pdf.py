"""Real PDF container codec (ISO 32000 subset), pure Python — writer +
metadata parser, NO rendering.

Writer emits genuine classic-xref PDFs: numbered indirect objects
(catalog → page tree → pages → FlateDecode content streams), a
byte-offset-exact cross-reference table, and a trailer with /Size and
/Root.  Parser does what a curation pipeline needs from a PDF without
rasterizing: locate ``startxref`` from the end, walk the xref table,
validate EVERY object's byte offset against the actual bytes, resolve
/Root → /Pages → /Kids, verify /Count, and decode each page's content
stream (FlateDecode via stdlib zlib — the same boundary as encode_png)
checking /Length.

Refused loudly by name: encrypted documents (/Encrypt), PDF 1.5+
cross-reference STREAMS (/Type/XRef), object streams (/ObjStm),
incremental updates (/Prev chains), and filters other than FlateDecode
— each a real PDF feature we will not silently mis-parse.
"""

from __future__ import annotations

import re
import zlib


def _content_bytes(doc_id: int, page: int, n: int) -> bytes:
    """Deterministic printable-ASCII content stream for (doc, page)."""
    return bytes((doc_id * 7 + page * 13 + i) % 95 + 32 for i in range(n))


def encode_pdf(doc_id: int, n_pages: int, page_len) -> bytes:
    """A real multi-page PDF: object 1 = catalog, 2 = page tree, then per
    page one Page object and one FlateDecode content stream.  ``page_len``
    maps page index -> content byte count."""
    objects: list[bytes] = []

    def obj(num: int, body: bytes) -> bytes:
        return b"%d 0 obj\n" % num + body + b"\nendobj\n"

    page_nums = [3 + 2 * j for j in range(n_pages)]
    kids = b"[" + b" ".join(b"%d 0 R" % p for p in page_nums) + b"]"
    objects.append(obj(1, b"<< /Type /Catalog /Pages 2 0 R >>"))
    objects.append(
        obj(2, b"<< /Type /Pages /Kids " + kids
            + b" /Count %d >>" % n_pages)
    )
    for j in range(n_pages):
        content = _content_bytes(doc_id, j, page_len(j))
        blob = zlib.compress(content, 6)
        objects.append(
            obj(
                page_nums[j],
                b"<< /Type /Page /Parent 2 0 R "
                b"/MediaBox [0 0 612 792] /Contents %d 0 R >>"
                % (page_nums[j] + 1),
            )
        )
        objects.append(
            obj(
                page_nums[j] + 1,
                b"<< /Length %d /Filter /FlateDecode >>\nstream\n"
                % len(blob) + blob + b"\nendstream",
            )
        )

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]  # object 0 is the free-list head
    for o in objects:
        offsets.append(len(out))
        out += o
    xref_at = len(out)
    n_obj = len(objects) + 1
    out += b"xref\n0 %d\n" % n_obj
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (n_obj, xref_at)
    )
    return bytes(out)


def _resolve(payload: bytes, offsets: dict[int, int], num: int) -> bytes:
    off = offsets[num]
    m = re.match(rb"(\d+) 0 obj\n", payload[off : off + 32])
    if not m or int(m.group(1)) != num:
        raise ValueError(f"PDF: xref offset for object {num} is wrong")
    end = payload.index(b"endobj", off)
    return payload[off + m.end() : end]


def pdf_metadata(payload: bytes) -> dict:
    """Parse a classic-xref PDF without rendering: object count, page
    count (validated against /Count), and the exact decoded content-byte
    sum and length over every page stream."""
    if not payload.startswith(b"%PDF-"):
        raise ValueError("not a PDF payload")
    tail = payload[-256:]
    m = re.search(rb"startxref\s+(\d+)\s+%%EOF", tail)
    if not m:
        raise ValueError("PDF: startxref/%%EOF not found")
    xref_at = int(m.group(1))
    if payload[xref_at : xref_at + 4] != b"xref":
        if payload[xref_at : xref_at + 1].isdigit():
            raise NotImplementedError(
                "PDF 1.5 cross-reference STREAM (/Type/XRef) not "
                "supported — classic xref tables only"
            )
        raise ValueError("PDF: startxref does not point at an xref table")
    # trailer dict
    t_at = payload.index(b"trailer", xref_at)
    trailer = payload[t_at : payload.index(b">>", t_at) + 2]
    if b"/Encrypt" in trailer:
        raise NotImplementedError("encrypted PDFs not supported")
    if b"/Prev" in trailer:
        raise NotImplementedError(
            "incrementally-updated PDFs (/Prev xref chain) not supported"
        )
    size = int(re.search(rb"/Size\s+(\d+)", trailer).group(1))
    root = int(re.search(rb"/Root\s+(\d+)\s+0\s+R", trailer).group(1))
    # xref table: "xref\n0 N\n" then N 20-byte entries
    hdr = re.match(rb"xref\s+0 (\d+)\s*\n", payload[xref_at:])
    n_entries = int(hdr.group(1))
    if n_entries != size:
        raise ValueError("PDF: xref entry count != trailer /Size")
    base = xref_at + hdr.end()
    offsets: dict[int, int] = {}
    for i in range(n_entries):
        e = payload[base + 20 * i : base + 20 * (i + 1)]
        off, _gen, kind = int(e[:10]), int(e[11:16]), e[17:18]
        if kind == b"n":
            offsets[i] = off

    cat = _resolve(payload, offsets, root)
    if b"/ObjStm" in payload:
        raise NotImplementedError("PDF object streams (/ObjStm) not supported")
    pages_ref = int(re.search(rb"/Pages\s+(\d+)\s+0\s+R", cat).group(1))
    tree = _resolve(payload, offsets, pages_ref)
    count = int(re.search(rb"/Count\s+(\d+)", tree).group(1))
    kids = [int(k) for k in re.findall(rb"(\d+)\s+0\s+R",
            re.search(rb"/Kids\s*\[([^\]]*)\]", tree).group(1))]
    if len(kids) != count:
        raise ValueError("PDF: /Count != len(/Kids)")
    total_len = 0
    content_sum = 0
    for k in kids:
        page = _resolve(payload, offsets, k)
        if b"/Type /Page" not in page and b"/Type/Page" not in page:
            raise ValueError(f"PDF: kid {k} is not a /Page")
        c_ref = int(re.search(rb"/Contents\s+(\d+)\s+0\s+R", page).group(1))
        stream_obj = _resolve(payload, offsets, c_ref)
        filt = re.search(rb"/Filter\s*/(\w+)", stream_obj)
        if filt and filt.group(1) != b"FlateDecode":
            raise NotImplementedError(
                f"PDF stream filter {filt.group(1).decode()} not "
                "supported (FlateDecode only)"
            )
        length = int(re.search(rb"/Length\s+(\d+)", stream_obj).group(1))
        s_at = stream_obj.index(b"stream\n") + len(b"stream\n")
        blob = stream_obj[s_at : s_at + length]
        if len(blob) != length:
            raise ValueError("PDF: stream shorter than /Length")
        data = zlib.decompress(blob) if filt else blob
        total_len += len(data)
        content_sum += sum(data)
    return {
        "n_objects": size - 1,
        "n_pages": count,
        "content_bytes": total_len,
        "content_sum": content_sum,
    }
