"""Per-file Bloom filters for point-key file skipping — the equality
complement to the min/max sidecar (SURVEY.md §4).

Min/max stats prune RANGE predicates but are useless for equality probes on
hash-distributed keys: every file's [min, max] spans the whole domain, so a
point lookup scans the table.  Delta and Iceberg answer this with per-file
Bloom indexes; this module is the native analog.

Design:
- Dependency-free Bloom filter: m bits sized for the file's key count at a
  target false-positive rate, k probes by double hashing over the two
  64-bit halves of md5 (deterministic across runs/processes/engines).
- Values hash through the SAME canonical form the pruner compares with
  (numbers as repr(float), dates as ISO strings) so build and probe agree.
- Collection is DISTRIBUTED: group rows by ``input_file_name()`` and build
  each file's filter inside an Arrow ``applyInPandas`` task — one task per
  file, no driver-side value loop; the driver only receives the packed
  bitsets (m/8 bytes per file).
- Serialized into the stats sidecar under a separate ``"blooms"`` key so
  older sidecar readers are unaffected.

At 100 TB: a 1M-row file at 1% fpp needs ~1.2 MB of bits; the sidecar stays
metadata-sized, and an IN-probe of K keys prunes to at most K files (plus
fpp stragglers) instead of scanning the table.
"""

from __future__ import annotations

import base64
import datetime
import hashlib
import math

import numpy as np

_LN2 = math.log(2.0)


def _canon_bytes(v) -> bytes:
    """Canonical hashable form, aligned with table/pruning._cmp: numbers as
    repr(float), dates/timestamps as ISO strings, strings utf-8."""
    if isinstance(v, bool):
        v = float(v)
    if isinstance(v, (int, float)):
        return repr(float(v)).encode()
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ").encode()
    if isinstance(v, datetime.date):
        return (v.isoformat() + " 00:00:00").encode()
    if isinstance(v, bytes):
        return v
    return str(v).encode()


def bloom_params(n: int, fpp: float = 0.01) -> tuple[int, int]:
    """(m bits, k hashes) for n keys at the target false-positive rate."""
    n = max(1, n)
    m = max(64, int(math.ceil(-n * math.log(fpp) / (_LN2 * _LN2))))
    m = (m + 7) & ~7  # whole bytes
    k = max(1, int(round(m / n * _LN2)))
    return m, k


def _probes(value, m: int, k: int) -> list[int]:
    d = hashlib.md5(_canon_bytes(value)).digest()
    a = int.from_bytes(d[:8], "big")
    b = int.from_bytes(d[8:], "big") or 1
    return [(a + i * b) % m for i in range(k)]


def bloom_build(values, fpp: float = 0.01) -> dict:
    """Build a serialized filter from an iterable of non-null values."""
    vals = [v for v in values if v is not None]
    m, k = bloom_params(len(vals), fpp)
    bits = np.zeros(m // 8, dtype=np.uint8)
    for v in vals:
        for p in _probes(v, m, k):
            bits[p >> 3] |= 1 << (p & 7)
    return {
        "m": m,
        "k": k,
        "n": len(vals),
        "bits": base64.b64encode(bits.tobytes()).decode(),
    }


def bloom_may_contain(bloom: dict, value) -> bool:
    m, k = bloom["m"], bloom["k"]
    bits = base64.b64decode(bloom["bits"])
    return all(
        bits[p >> 3] & (1 << (p & 7)) for p in _probes(value, m, k)
    )


def collect_bloom_filters(
    spark, path: str, bloom_cols: list[str], fpp: float = 0.01
) -> dict:
    """Distributed per-file Bloom build: one Arrow task per (file, column)
    group; the driver receives only the packed bitsets.

    Returns ``{file_uri: {col: serialized_bloom}}``.
    """
    import json

    import pandas as pd
    from pyspark.sql import functions as F

    df = spark.read.parquet(path)

    def _build(key, pdf: "pd.DataFrame") -> "pd.DataFrame":
        col = key[1]
        bloom = bloom_build(pdf[col].dropna().tolist(), fpp)
        return pd.DataFrame(
            {
                "file": [key[0]],
                "col": [col],
                "bloom": [json.dumps(bloom)],
            }
        )

    out: dict[str, dict] = {}
    for col in bloom_cols:
        rows = (
            df.select(F.input_file_name().alias("__file"), col)
            .withColumn("__col", F.lit(col))
            .groupBy("__file", "__col")
            .applyInPandas(_build, schema="file string, col string, bloom string")
            .collect()
        )
        for r in rows:
            out.setdefault(r["file"], {})[r["col"]] = json.loads(r["bloom"])
    return out
