"""Pre-scan file pruner: evaluate a conjunction of range/eq/in predicates
against the per-file min/max sidecar and hand Spark only the surviving files.

This is the native replacement for the data skipping the reference measures
through Delta/Hudi/Iceberg (files_scanned / bytes_scanned,
run_queries.py:165-248).  No Catalyst rule needed: pruning happens before
``spark.read.parquet(*files)``, then Catalyst still applies row-group
pruning and predicate pushdown inside the surviving files, so the two layers
compose.

All predicates here are null-rejecting (eq/range/in never match NULL), so a
file whose min/max are both NULL for a predicate column (all-null chunk)
never survives on that predicate.
"""

from __future__ import annotations

import datetime
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_sfc_spark.layout.stats import file_size, read_sidecar

_OPS = ("==", "<", "<=", ">", ">=", "between", "in")


@dataclass(frozen=True)
class Pred:
    col: str
    op: str  # one of _OPS
    value: object  # scalar, (lo, hi) for between, list for in

    def __post_init__(self):
        if self.op not in _OPS:
            raise ValueError(f"op must be one of {_OPS}, got {self.op!r}")
        if self.op == "in":
            # normalized + sorted once so per-file checks bisect instead of
            # scanning the whole list (an upsert key set can be thousands of
            # values x thousands of files)
            object.__setattr__(
                self, "_sorted_in", tuple(sorted(_cmp(x) for x in self.value))
            )


def _cmp(v):
    """Comparable form: numbers as float; dates/timestamps as ISO strings
    (lexicographic == chronological); strings as-is."""
    if isinstance(v, bool):
        return float(v)
    if isinstance(v, (int, float)):
        return float(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        # pad to datetime form so date predicates compare correctly against
        # timestamp file stats
        return v.isoformat() + " 00:00:00"
    return v


def _may_match(pred: Pred, mn, mx) -> bool:
    """Could any value in [mn, mx] satisfy the predicate?"""
    if mn is None and mx is None:
        return False  # all-null file chunk; null-rejecting predicates
    mn, mx = _cmp(mn), _cmp(mx)
    op, v = pred.op, pred.value
    if op == "==":
        v = _cmp(v)
        return mn <= v <= mx
    if op == "<":
        return mn < _cmp(v)
    if op == "<=":
        return mn <= _cmp(v)
    if op == ">":
        return mx > _cmp(v)
    if op == ">=":
        return mx >= _cmp(v)
    if op == "between":
        lo, hi = (_cmp(v[0]), _cmp(v[1]))
        return not (hi < mn or lo > mx)
    if op == "in":
        import bisect

        vals = pred._sorted_in  # type: ignore[attr-defined]
        i = bisect.bisect_left(vals, mn)
        return i < len(vals) and vals[i] <= mx
    raise AssertionError(op)


def prune_files(sidecar: dict, predicates: list[Pred]) -> tuple[list[str], dict]:
    """Surviving file URIs + metrics.  Predicates on columns without stats
    never prune (conservative) — both when the whole sidecar lacks the
    column and PER FILE, because after partition-spec evolution a manifest
    mixes files written under different specs: pre-evolution files carry no
    stats for the new clustering column and must always survive it
    (Iceberg's partition-evolution planning rule)."""
    stat_cols = set(sidecar.get("columns", []))
    survivors: list[str] = []
    total_bytes = 0
    scanned_bytes = 0
    for file_uri, info in sidecar["files"].items():
        sz = file_size(file_uri)
        total_bytes += sz
        keep = True
        for p in predicates:
            if p.col in stat_cols:
                cs = info["cols"].get(p.col)
                if cs is not None and not _may_match(p, cs["min"], cs["max"]):
                    keep = False
                    break
            # Bloom probe for equality/IN: prunes hash-distributed keys
            # where every file's [min, max] spans the domain.  A bloom "no"
            # is definite; a "maybe" falls through to the scan.
            bloom = (info.get("blooms") or {}).get(p.col)
            if bloom is not None and p.op in ("==", "in"):
                from lakehouse_sfc_spark.layout.bloom import bloom_may_contain

                vals = [p.value] if p.op == "==" else list(p.value)
                if not any(bloom_may_contain(bloom, v) for v in vals):
                    keep = False
                    break
        if keep:
            survivors.append(file_uri)
            scanned_bytes += sz
    metrics = {
        "files_total": len(sidecar["files"]),
        "files_scanned": len(survivors),
        "bytes_total": total_bytes,
        "bytes_scanned": scanned_bytes,
    }
    return survivors, metrics


def preds_to_column(predicates: list[Pred]):
    """The same conjunction as a Spark Column, applied to the pruned scan —
    pruning is a superset filter, the real predicate still runs."""
    out = None
    for p in predicates:
        c = F.col(p.col)
        if p.op == "==":
            e = c == F.lit(p.value)
        elif p.op == "<":
            e = c < F.lit(p.value)
        elif p.op == "<=":
            e = c <= F.lit(p.value)
        elif p.op == ">":
            e = c > F.lit(p.value)
        elif p.op == ">=":
            e = c >= F.lit(p.value)
        elif p.op == "between":
            e = c.between(F.lit(p.value[0]), F.lit(p.value[1]))
        else:  # in
            e = c.isin([F.lit(x) for x in p.value])
        out = e if out is None else (out & e)
    return out


# Analyzed-relation cache for pruned scans (same discipline as
# loader._TABLE_CACHE): spark.read.parquet(*survivors) costs ~100 ms of
# driver-side footer/schema resolution per BUILD, and layout queries build
# a fresh scan per run.  Keyed on the applicationId + the exact survivor
# set + each survivor's (size, mtime_ns), so a rewritten layout can never
# serve a stale relation.  The per-query predicate is applied ON TOP of
# the cached base relation, so different predicates with the same survivor
# set share it.
_PRUNED_CACHE: dict[tuple, DataFrame] = {}
_PRUNED_CACHE_MAX = 256


def _survivors_relation(spark: SparkSession, survivors: list[str]) -> DataFrame:
    from urllib.parse import urlparse

    key_parts = []
    try:
        for uri in sorted(survivors):
            local = urlparse(uri).path or uri
            st = os.stat(local)
            key_parts.append((uri, st.st_size, st.st_mtime_ns))
        key = (spark.sparkContext.applicationId, tuple(key_parts))
    except OSError:
        key = None
    if key is not None and key in _PRUNED_CACHE:
        return _PRUNED_CACHE[key]
    df = spark.read.parquet(*survivors)
    if key is not None:
        if len(_PRUNED_CACHE) >= _PRUNED_CACHE_MAX:
            _PRUNED_CACHE.clear()
        _PRUNED_CACHE[key] = df
    return df


def read_pruned(
    spark: SparkSession, path: str, predicates: list[Pred]
) -> tuple[DataFrame, dict]:
    """Prune with the sidecar (if present), read survivors, apply the full
    predicate.  Returns (df, metrics)."""
    sidecar = read_sidecar(path)
    if sidecar is None:
        df = spark.read.parquet(path)
        n = len(df.inputFiles())
        metrics = {"files_total": n, "files_scanned": n}
    else:
        survivors, metrics = prune_files(sidecar, predicates)
        if not survivors:
            # empty relation with the right schema
            df = spark.read.parquet(path).limit(0)
        else:
            df = _survivors_relation(spark, survivors)
    cond = preds_to_column(predicates)
    return (df.filter(cond) if cond is not None else df), metrics
