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
