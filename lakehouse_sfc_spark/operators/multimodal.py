"""Multimodal column handling: image/audio/video travel as opaque ``binary``
columns with typed metadata; decode / feature-extract / frame-sample run as
Arrow-batched ``mapInPandas`` stages (the only place Python belongs in the
pipeline — everything before and after stays JVM-side).

The real codec libraries (Pillow / torchaudio / decord) are NOT in this
container, so the actual byte→pixels decode is stubbed behind
``NotImplementedError``; ``decode_stub_batches`` is the deterministic fake
used by tests and the driver oracle.  The Spark-side plumbing — binary
column, metadata struct, output schema, Arrow batch iteration — is real and
is what a production decode would drop into.

Scale notes: mapInPandas streams Arrow record batches, so peak executor
memory is one batch of payloads, not one partition; keep
``spark.sql.execution.arrow.maxRecordsPerBatch`` sized to the payload width
(e.g. 64 for ~4 MB images).  Decode is embarrassingly parallel — no shuffle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterable, Iterator

import pandas as pd

DECODED_SCHEMA = (
    "doc_id bigint, n_bytes bigint, checksum string, "
    "width int, height int, frames int"
)


def decode_image(payload: bytes) -> object:
    """Real image decode (bytes → HxWxC array). Requires an image codec
    library not present in this environment."""
    raise NotImplementedError(
        "image codec not available in this environment; "
        "use decode_stub_batches for the deterministic test path"
    )


def decode_audio(payload: bytes) -> object:
    """Real audio decode (bytes → waveform). Requires an audio codec."""
    raise NotImplementedError(
        "audio codec not available in this environment; "
        "use decode_stub_batches for the deterministic test path"
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
