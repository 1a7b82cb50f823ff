"""Per-file min/max/count stats sidecar — the piece vanilla Spark lacks for
Delta/Hudi/Iceberg-style file skipping (SURVEY.md §4: Spark prunes row
groups inside a file and hive partitions, but has no file-stats index for
plain parquet).

Collection is ONE distributed Spark job: scan only the stats columns,
group by ``input_file_name()``, aggregate min/max/count/null-count per file.
At 100 TB this is a column-pruned scan with a cheap (files-count-sized)
shuffle; no driver-side footer loop.

Sidecar format: ``<table>/_sfc_stats.json`` —
``{"columns": [...], "files": {file_uri: {"count": n, "cols":
{col: {"min": v, "max": v, "nulls": n}}}}}`` with dates/timestamps stored as
ISO strings (ISO order == chronological order, so string comparison prunes
correctly).
"""

from __future__ import annotations

import datetime
import json
import os
from urllib.parse import urlparse

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SIDECAR_NAME = "_sfc_stats.json"


def _jsonable(v):
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    return v


def collect_file_stats(
    spark: SparkSession,
    path: str,
    stats_cols: list[str],
    bloom_cols: list[str] | None = None,
    bloom_fpp: float = 0.01,
) -> str:
    """Aggregate per-file stats for ``stats_cols`` over the parquet files at
    ``path`` and write the sidecar next to them.  Returns the sidecar path.

    ``bloom_cols`` additionally builds per-file Bloom filters (point-key
    file skipping for equality/IN probes on hash-distributed keys, where
    min/max cannot prune — see layout/bloom.py); they land in the sidecar
    under the ``"blooms"`` key, invisible to older readers."""
    df = spark.read.parquet(path)
    aggs = [F.count(F.lit(1)).alias("__count")]
    for c in stats_cols:
        aggs += [
            F.min(c).alias(f"__min_{c}"),
            F.max(c).alias(f"__max_{c}"),
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"__nulls_{c}"),
        ]
    rows = (
        df.select(F.input_file_name().alias("__file"), *stats_cols)
        .groupBy("__file")
        .agg(*aggs)
        .collect()
    )
    files = {}
    for r in rows:
        files[r["__file"]] = {
            "count": r["__count"],
            "cols": {
                c: {
                    "min": _jsonable(r[f"__min_{c}"]),
                    "max": _jsonable(r[f"__max_{c}"]),
                    "nulls": r[f"__nulls_{c}"],
                }
                for c in stats_cols
            },
        }
    sidecar = {"columns": stats_cols, "files": files}
    if bloom_cols:
        from lakehouse_sfc_spark.layout.bloom import collect_bloom_filters

        sidecar["bloom_columns"] = list(bloom_cols)
        blooms = collect_bloom_filters(spark, path, bloom_cols, bloom_fpp)
        for file_uri, per_col in blooms.items():
            if file_uri in files:
                files[file_uri]["blooms"] = per_col
    out_path = os.path.join(path, SIDECAR_NAME)
    with open(out_path, "w") as f:
        json.dump(sidecar, f, default=str)
    return out_path


# Parsed-sidecar cache, keyed on the file's (size, mtime_ns): every pruned
# scan calls read_sidecar at query-BUILD time (twice per layout query: the
# cache-exists probe plus read_pruned), and re-parsing the JSON is pure
# driver latency.  Invalidation mirrors loader._TABLE_CACHE: a rewritten
# sidecar changes (size, mtime_ns) and misses.
_SIDECAR_CACHE: dict[tuple, dict] = {}
_SIDECAR_CACHE_MAX = 256


def read_sidecar(path: str) -> dict | None:
    import copy

    p = os.path.join(path, SIDECAR_NAME)
    try:
        st = os.stat(p)
    except OSError:
        return None
    key = (os.path.abspath(p), st.st_size, st.st_mtime_ns)
    hit = _SIDECAR_CACHE.get(key)
    if hit is not None:
        # deep copy: callers mutate the result in place (_rehome_sidecar
        # rewrites file URIs, upsert merges file maps) — handing out the
        # cached object would let them poison every later read
        return copy.deepcopy(hit)
    with open(p) as f:
        out = json.load(f)
    if len(_SIDECAR_CACHE) >= _SIDECAR_CACHE_MAX:
        _SIDECAR_CACHE.clear()
    _SIDECAR_CACHE[key] = copy.deepcopy(out)
    return out


def file_size(file_uri: str) -> int:
    p = urlparse(file_uri)
    local = p.path if p.scheme in ("file", "") else None
    if local is None:
        return 0
    try:
        return os.path.getsize(local)
    except OSError:
        return 0
