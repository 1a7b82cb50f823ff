"""Mergeable cardinality sketches: K-Minimum-Values (KMV) distinct-count
estimation, exact-by-construction across engines.

Beyond the reference (its profiler computes exact `COUNT(DISTINCT)`,
run_queries.py aggregate templates): at 100 TB exact distinct is a full
shuffle of every key; the scale answer is a MERGEABLE sketch — each
partition summarizes to k hashes, merges are tiny, and the error is
bounded (~1/sqrt(k)).  KMV is chosen over HLL here because it is exactly
reproducible from pure SQL in any engine (k smallest distinct md5 hashes +
one closed-form division), so the driver can hash-compare Spark vs DuckDB
bit-for-bit — a DETERMINISTIC approximate sketch.

Estimator (Beyer et al., "On Synopses for Distinct-Value Estimation Under
Multiset Operations", SIGMOD'07): with h uniform on [0, M) and h_(k) the
k-th smallest distinct hash, est = (k-1) * M / h_(k); when fewer than k
distinct hashes exist the sketch IS the exact set (est = count).

Scale shape: one hash-partitioned distinct on (group, hash) — the same
single shuffle exact distinct needs — then a per-group top-k window over
hashes (map-side rank-k prune via the window's partial sort).  The merge
query demonstrates the property that matters on a cluster: per-shard
sketches union to the global sketch with NO second scan of the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_sfc_spark.queries.datapipe import _h32
from lakehouse_sfc_spark.queries.registry import register
from lakehouse_sfc_spark.sources.loader import load_table

_K = 256
_M = float(1 << 32)  # hash space size for the 32-bit md5 prefix

# distinct (group, hash) pairs; collisions collapse (that's part of the
# estimator's contract, identical in both engines)
_SQL_HASHES = """
    SELECT o_orderpriority AS grp,
           ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8))::BIGINT AS h
    FROM orders
    GROUP BY 1, 2
"""


def _hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            F.col("o_orderpriority").alias("grp"),
            _h32(F.col("o_custkey").cast("string")).alias("h"),
        )
        .distinct()
    )


@register(
    "sketch_distinct_kmv",
    oracle=f"""
    WITH hashes AS ({_SQL_HASHES}),
    ranked AS (
        SELECT grp, h,
               ROW_NUMBER() OVER (PARTITION BY grp ORDER BY h) AS rn
        FROM hashes
    ),
    sk AS (
        SELECT grp, MAX(h) AS kth, COUNT(*) AS n_in_sketch
        FROM ranked WHERE rn <= {_K}
        GROUP BY grp
    )
    SELECT grp, n_in_sketch,
           CASE WHEN n_in_sketch < {_K} THEN CAST(n_in_sketch AS DOUBLE)
                ELSE ({_K} - 1) * {_M!r} / CAST(kth AS DOUBLE)
           END AS est_distinct
    FROM sk
    ORDER BY grp
    """,
)
def sketch_distinct_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group KMV distinct estimate of customers per order priority:
    k smallest distinct hashes per group, closed-form estimator."""
    w = Window.partitionBy("grp").orderBy("h")
    return (
        _hashes(spark, sf_dir)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _K)
        .groupBy("grp")
        .agg(
            F.max("h").alias("kth"),
            F.count(F.lit(1)).alias("n_in_sketch"),
        )
        .select(
            "grp",
            "n_in_sketch",
            F.when(
                F.col("n_in_sketch") < _K,
                F.col("n_in_sketch").cast("double"),
            )
            .otherwise(
                F.lit(float(_K - 1)) * F.lit(_M) / F.col("kth").cast("double")
            )
            .alias("est_distinct"),
        )
        .orderBy("grp")
    )


@register(
    "sketch_distinct_merge",
    oracle=f"""
    WITH hashes AS (
        SELECT DISTINCT
               ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8))::BIGINT
                   AS h
        FROM orders
    ),
    ranked AS (
        SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn FROM hashes
    ),
    sk AS (
        SELECT MAX(h) AS kth, COUNT(*) AS n_in_sketch
        FROM ranked WHERE rn <= {_K}
    )
    SELECT n_in_sketch,
           CASE WHEN n_in_sketch < {_K} THEN CAST(n_in_sketch AS DOUBLE)
                ELSE ({_K} - 1) * {_M!r} / CAST(kth AS DOUBLE)
           END AS est_distinct
    FROM sk
    """,
)
def sketch_distinct_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch MERGE: per-shard (order-year) KMV sketches unioned into one
    global sketch — k smallest of the union of per-shard minima == k
    smallest of the global distinct set, so the merged estimate is
    IDENTICAL to a direct global sketch (the oracle computes it directly).
    This is the distributed pattern: shards never re-scan, the merge
    handles k*shards rows."""
    orders = load_table(spark, sf_dir, "orders")
    shard_w = Window.partitionBy("shard").orderBy("h")
    per_shard = (
        orders.select(
            F.year("o_orderdate").alias("shard"),
            _h32(F.col("o_custkey").cast("string")).alias("h"),
        )
        .distinct()
        .withColumn("rn", F.row_number().over(shard_w))
        .filter(F.col("rn") <= _K)
        .select("shard", "h")
    )
    merged_w = Window.orderBy("h")
    return (
        per_shard.select("h")
        .distinct()  # cross-shard duplicate hashes collapse on merge
        .withColumn("rn", F.row_number().over(merged_w))
        .filter(F.col("rn") <= _K)
        .agg(
            F.max("h").alias("kth"),
            F.count(F.lit(1)).alias("n_in_sketch"),
        )
        .select(
            "n_in_sketch",
            F.when(
                F.col("n_in_sketch") < _K,
                F.col("n_in_sketch").cast("double"),
            )
            .otherwise(
                F.lit(float(_K - 1)) * F.lit(_M) / F.col("kth").cast("double")
            )
            .alias("est_distinct"),
        )
    )
