"""Profiler aggregates as oracle-checked queries (SURVEY.md §2.4 A6-A11):
the driver-visible face of lakehouse_sfc_spark.profiler.  Each one computes a
reference profiler statistic with plain distributed aggregates.

Reference parity: wlg/profiler/stats.py:137-183 (min/max, histogram,
cardinality, top-k), re-expressed as single-shuffle Spark jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_sfc_spark.queries.registry import register
from lakehouse_sfc_spark.sources.loader import load_table

_NUM_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def _stat_select(col: str) -> str:
    return (
        f"SELECT '{col}' AS col_name, COUNT(*) AS cnt,"
        f" SUM(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS nulls,"
        f" MIN({col}) AS min_v, MAX({col}) AS max_v,"
        f" COUNT(DISTINCT {col}) AS n_distinct FROM lineitem"
    )


@register(
    "profile_numeric_stats",
    oracle=" UNION ALL ".join(_stat_select(c) for c in _NUM_COLS),
)
def profile_numeric_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count/nulls/min/max/distinct for every numeric lineitem column in ONE
    aggregate pass, unpivoted with stack() — the profiler's pass-1 shape.
    At 100 TB this is one scan + partial aggs; no per-column jobs."""
    li = load_table(spark, sf_dir, "lineitem")
    aggs = []
    for c in _NUM_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"cnt__{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"nulls__{c}"),
            F.min(c).alias(f"min__{c}"),
            F.max(c).alias(f"max__{c}"),
            F.count_distinct(F.col(c)).alias(f"nd__{c}"),
        ]
    one = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', cnt__{c}, nulls__{c}, min__{c}, max__{c}, nd__{c}"
        for c in _NUM_COLS
    )
    return one.selectExpr(
        f"stack({len(_NUM_COLS)}, {stack_args})"
        " AS (col_name, cnt, nulls, min_v, max_v, n_distinct)"
    )


_HIST_BINS = 10


@register(
    "profile_histogram",
    oracle=f"""
    WITH mm AS (SELECT MIN(l_quantity) AS lo, MAX(l_quantity) AS hi
                FROM lineitem)
    SELECT LEAST(FLOOR((l_quantity - lo) / (hi - lo) * {_HIST_BINS}),
                 {_HIST_BINS - 1})::BIGINT AS bucket,
           COUNT(*) AS cnt
    FROM lineitem, mm
    GROUP BY 1
    """,
)
def profile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram with np.histogram bin semantics (max value lands
    in the last bin).  The 1-row min/max side is broadcast, so the histogram
    is scan + broadcast + partial agg — no wide shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    mm = li.agg(
        F.min("l_quantity").alias("lo"), F.max("l_quantity").alias("hi")
    )
    bucket = F.least(
        F.floor(
            (F.col("l_quantity") - F.col("lo"))
            / (F.col("hi") - F.col("lo"))
            * _HIST_BINS
        ),
        F.lit(_HIST_BINS - 1).cast("bigint"),
    )
    return (
        li.crossJoin(F.broadcast(mm))
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "profile_topk",
    oracle="""
    SELECT source, COUNT(*) AS cnt
    FROM documents
    GROUP BY source
    ORDER BY cnt DESC, source ASC
    LIMIT 5
    """,
)
def profile_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k most frequent values with a total (count desc, value asc) order
    so ties are deterministic across engines — the profiler's top-k rule."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy("source")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("source"))
        .limit(5)
    )
