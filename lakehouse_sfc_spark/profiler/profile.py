"""Spark-side dataset profiling (reference: wlg/profiler/stats.py Profiler).

Where the reference streams pandas batches through a driver-side accumulator
(capped 20k samples), this computes the same statistics as distributed
aggregates over the FULL dataset:

- pass 1: ONE ``agg`` job — per column count/nulls/min/max, exact
  linear-interpolated quantiles (``percentile``), cardinality
  (exact or ``approx_count_distinct`` for 100 TB runs).
- pass 2: ONE shuffle for ALL histograms — every numeric/datetime column's
  bucket index is emitted through a single explode, then one
  groupBy(column, bucket).  np.histogram bin semantics (uniform edges,
  max value in last bin).
- pass 3: ONE shuffle for ALL top-k — categorical values stacked the same
  way, ranked per column by (count desc, value asc), k=50.
- correlations: full-data Pearson via ``F.corr`` for every numeric pair in
  one agg (better than the reference's 50k sample); Spearman on a
  driver-side sample capped at ``corr_cap`` with pandas average-rank ties
  (exactly the reference's method, correlation.py:41-48).

Datetime columns are normalized to epoch-milliseconds floats for numeric
stats, matching wlg/profiler/stats.py:212-218.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lakehouse_sfc_spark.profiler.stats import ColumnStats

_QS = (0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99)


def _kind_of(dt: T.DataType) -> str:
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return "datetime"
    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, T.NumericType):
        return "numeric"
    return "categorical"


def _ms_view(name: str, dt: T.DataType) -> Column:
    """Numeric view of a column: datetimes become epoch-ms doubles.
    TIMESTAMP_NTZ is decomposed into tz-free date/time parts (any cast to an
    instant type would silently shift by the session timezone)."""
    c = F.col(name)
    if isinstance(dt, T.DateType):
        return (F.unix_date(c).cast("double") * 86400000.0)
    if isinstance(dt, T.TimestampNTZType):
        return (
            F.unix_date(c.cast("date")).cast("double") * 86400000.0
            + F.hour(c).cast("double") * 3600000.0
            + F.minute(c).cast("double") * 60000.0
            + F.expr(f"extract(SECOND FROM `{name}`)").cast("double") * 1000.0
        )
    if isinstance(dt, T.TimestampType):
        return F.unix_micros(c).cast("double") / 1000.0
    return c.cast("double")


def profile_df(
    df: DataFrame,
    num_bins: int = 64,
    qs: tuple[float, ...] = _QS,
    topk_size: int = 50,
    corr_cap: int = 50_000,
    approx_distinct: bool = False,
) -> tuple[dict[str, ColumnStats], dict[str, object]]:
    """Profile every column of ``df``; returns (stats, metadata) in the
    reference's stats.yaml shape."""
    fields = [(f.name, f.dataType, _kind_of(f.dataType)) for f in df.schema.fields]
    qs = tuple(sorted({float(q) for q in qs}))

    # ---- pass 1: flat aggregate ------------------------------------------
    aggs: list[Column] = [F.count(F.lit(1)).alias("__total")]
    for name, dt, kind in fields:
        c = F.col(name)
        aggs.append(F.sum(c.isNull().cast("long")).alias(f"nulls__{name}"))
        distinct = (
            F.approx_count_distinct(c) if approx_distinct else F.count_distinct(c)
        )
        aggs.append(distinct.alias(f"card__{name}"))
        if kind in ("numeric", "datetime"):
            v = _ms_view(name, dt)
            aggs.append(F.min(v).alias(f"min__{name}"))
            aggs.append(F.max(v).alias(f"max__{name}"))
            aggs.append(
                F.percentile(v, F.array(*[F.lit(q) for q in qs])).alias(
                    f"q__{name}"
                )
            )
        else:
            aggs.append(F.min(c.cast("string")).alias(f"min__{name}"))
            aggs.append(F.max(c.cast("string")).alias(f"max__{name}"))
    row = df.agg(*aggs).collect()[0].asDict()
    total = int(row["__total"])

    # ---- pass 2: all histograms in one shuffle ---------------------------
    hist_cols: list[tuple[str, float, float, int]] = []
    for name, dt, kind in fields:
        if kind not in ("numeric", "datetime"):
            continue
        lo, hi = row[f"min__{name}"], row[f"max__{name}"]
        n_nonnull = total - int(row[f"nulls__{name}"])
        if lo is None or hi is None or n_nonnull <= 1:
            continue
        bins = min(num_bins, max(1, int(math.sqrt(n_nonnull))))
        if lo == hi:  # np.histogram widens a degenerate range by ±0.5
            lo, hi = lo - 0.5, hi + 0.5
        hist_cols.append((name, float(lo), float(hi), bins))

    hists: dict[str, list[int]] = {}
    if hist_cols:
        buckets = []
        for name, lo, hi, bins in hist_cols:
            v = _ms_view(name, dict((n, d) for n, d, _ in fields)[name])
            b = F.least(
                F.floor((v - F.lit(lo)) / F.lit(hi - lo) * F.lit(bins)),
                F.lit(bins - 1),
            ).cast("int")
            buckets.append(
                F.when(
                    F.col(name).isNotNull(),
                    F.struct(F.lit(name).alias("c"), b.alias("b")),
                )
            )
        counts = (
            df.select(F.explode(F.array(*buckets)).alias("s"))
            .where(F.col("s").isNotNull())
            .groupBy("s.c", "s.b")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        by_col: dict[str, dict[int, int]] = {}
        for r in counts:
            by_col.setdefault(r["c"], {})[int(r["b"])] = int(r["n"])
        for name, lo, hi, bins in hist_cols:
            got = by_col.get(name, {})
            hists[name] = [got.get(i, 0) for i in range(bins)]

    # ---- pass 3: all top-k in one shuffle --------------------------------
    cat_cols = [n for n, _, k in fields if k in ("categorical", "boolean")]
    topks: dict[str, list[tuple[str, int]]] = {n: [] for n in cat_cols}
    if cat_cols:
        stacked = df.select(
            F.explode(
                F.array(
                    *[
                        F.when(
                            F.col(n).isNotNull(),
                            F.struct(
                                F.lit(n).alias("c"),
                                F.col(n).cast("string").alias("v"),
                            ),
                        )
                        for n in cat_cols
                    ]
                )
            ).alias("s")
        ).where(F.col("s").isNotNull())
        from pyspark.sql import Window

        ranked = (
            stacked.groupBy("s.c", "s.v")
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn(
                "rk",
                F.row_number().over(
                    Window.partitionBy("c").orderBy(
                        F.desc("n"), F.asc("v")
                    )
                ),
            )
            .where(F.col("rk") <= topk_size)
            .collect()
        )
        for r in sorted(ranked, key=lambda r: (r["c"], r["rk"])):
            topks[r["c"]].append((r["v"], int(r["n"])))

    # ---- correlations ----------------------------------------------------
    num_cols = [n for n, _, k in fields if k in ("numeric", "datetime")]
    correlations: dict[str, object] = {}
    if len(num_cols) >= 2:
        views = [
            _ms_view(n, dict((x, d) for x, d, _ in fields)[n]).alias(n)
            for n in num_cols
        ]
        numeric = df.select(*views).na.drop()
        pear_aggs = []
        pairs = [
            (a, b)
            for i, a in enumerate(num_cols)
            for b in num_cols[i + 1 :]
        ]
        for a, b in pairs:
            pear_aggs.append(F.corr(a, b).alias(f"{a}||{b}"))
        pear_row = numeric.agg(*pear_aggs).collect()[0].asDict()
        pearson: dict[str, dict[str, float]] = {
            n: {m: (1.0 if n == m else 0.0) for m in num_cols} for n in num_cols
        }
        for a, b in pairs:
            v = pear_row[f"{a}||{b}"]
            v = 0.0 if v is None else float(v)
            pearson[a][b] = pearson[b][a] = v

        sample = numeric.limit(corr_cap).toPandas()
        if sample.empty:
            spearman = {n: {m: 0.0 for m in num_cols} for n in num_cols}
        else:
            spearman = (
                sample.corr(method="spearman").fillna(0.0).to_dict()
            )

        top_pairs = []
        for a, b in pairs:
            score = (abs(pearson[a][b]) + abs(float(spearman[a][b]))) / 2.0
            top_pairs.append((a, b, score))
        top_pairs.sort(key=lambda t: t[2], reverse=True)
        correlations = {
            "pearson": pearson,
            "spearman": {
                a: {b: float(v) for b, v in d.items()}
                for a, d in spearman.items()
            },
            "top_pairs": [
                {"columns": [a, b], "score": s} for a, b, s in top_pairs[:20]
            ],
        }

    # ---- assemble --------------------------------------------------------
    stats: dict[str, ColumnStats] = {}
    for name, dt, kind in fields:
        nulls = int(row[f"nulls__{name}"])
        qvals = row.get(f"q__{name}")
        quantiles = (
            {q: float(v) for q, v in zip(qs, qvals)} if qvals is not None else {}
        )
        bins_meta = next((h for h in hist_cols if h[0] == name), None)
        hist = None
        if bins_meta is not None and name in hists:
            _, lo, hi, bins = bins_meta
            edges = [lo + (hi - lo) * i / bins for i in range(bins + 1)]
            hist = (hists[name], edges)
        stats[name] = ColumnStats(
            count=total,
            nulls=nulls,
            kind=kind,
            min=row[f"min__{name}"],
            max=row[f"max__{name}"],
            quantiles=quantiles,
            hist=hist,
            cardinality=int(row[f"card__{name}"]),
            topk=topks.get(name, []),
        )
    metadata = {
        "schema": {f.name: f.dataType.simpleString() for f in df.schema.fields},
        "correlations": correlations,
    }
    return stats, metadata
