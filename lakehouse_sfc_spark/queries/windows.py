"""Window-function surface (SURVEY.md §2.5): ntile batch splitting, keyed
latest-wins dedup (Hudi precombine semantics), per-group top-k.

Reference parity:
- W1 ntile batch split -> build_tpch_update_batches.py:62-64
- W2 latest-wins per record key -> hudi_upsert.py:259 precombine semantics
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_sfc_spark.queries.registry import register
from lakehouse_sfc_spark.sources.loader import load_table


@register(
    "w_ntile_batches",
    oracle="""
    SELECT batch_id, COUNT(*) AS cnt, MIN(o_orderkey) AS min_key
    FROM (
      SELECT o_orderkey, NTILE(10) OVER (ORDER BY o_orderkey) AS batch_id
      FROM orders
    )
    GROUP BY batch_id
    """,
)
def w_ntile_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE(10) batch split (build_tpch_update_batches.py:62-64 uses
    ORDER BY rand(seed); here a deterministic key order so the oracle can
    reproduce it — the operator is identical)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_orderkey")
    return (
        o.select("o_orderkey", F.ntile(10).over(w).alias("batch_id"))
        .groupBy("batch_id")
        .agg(F.count(F.lit(1)).alias("cnt"), F.min("o_orderkey").alias("min_key"))
    )


@register(
    "w_dedup_latest",
    oracle="""
    SELECT user_id, event_id AS latest_event, event_type, value
    FROM (
      SELECT user_id, event_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    WHERE rn = 1
    """,
)
def w_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed latest-wins dedup — Hudi precombine/OverwriteWithLatest payload
    semantics (hudi_upsert.py:259) as a window: one shuffle on the record
    key, no driver involvement."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("latest_event"),
            "event_type",
            "value",
        )
    )


@register(
    "w_topk_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    )
    WHERE rn <= 3
    """,
)
def w_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via row_number — Spark 3.5+/4.x rewrites rn<=k into a
    WindowGroupLimit (per-partition heap) so only k rows per group shuffle."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
    )


@register(
    "w_running_agg",
    oracle="""
    SELECT user_id, event_id,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_value
    FROM events
    """,
)
def w_running_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-key cumulative sum: exact-decimal prefix sums, surfaced
    as DOUBLE on both sides because the windowed decimal widens differently
    (Spark decimal(28,4) vs DuckDB DECIMAL(38,4)) — the dsum discipline of
    queries/registry.py."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast("decimal(18,4)"))
        .over(w)
        .cast("double")
        .alias("running_value"),
    )


@register(
    "w_sliding_avg",
    oracle="""
    SELECT user_id, event_id,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
             / COUNT(value) OVER w AS sliding_avg
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    """,
)
def w_sliding_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded sliding frame (moving average over the last 4 events per
    user): the trailing-indicator shape.  Exact-decimal sum over the frame
    divided by the frame count — one double division at the end, identical
    in both engines (plain AVG over doubles is summation-order-dependent).
    One shuffle on user_id; the frame is evaluated inside the sort-based
    window operator with an O(1) rolling update, not O(frame) per row."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        (
            F.sum(F.col("value").cast("decimal(18,4)")).over(w).cast("double")
            / F.count("value").over(w)
        ).alias("sliding_avg"),
    )


@register(
    "w_lead_lag",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_gaps,
           MAX(gap_us) AS max_gap_us,
           CAST(SUM(gap_us) AS DOUBLE) / COUNT(*) AS avg_gap_us
    FROM (
      SELECT user_id,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS gap_us
      FROM events
    )
    WHERE gap_us IS NOT NULL
    GROUP BY user_id
    """,
)
def w_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival gaps via LAG: the event-time delta analysis
    every behavioural pipeline starts with.  Timestamps are compared as
    epoch MICROSECONDS (integers — ``unix_micros`` here, ``epoch_us`` in
    the oracle — identical once the nanos parquet column is read at
    microsecond precision by both engines); the per-user average is an
    exact integer sum with ONE double division.  Ties are broken by
    event_id so LAG is deterministic.  One shuffle on user_id; the window
    and the aggregation share the same hash partitioning (no second
    exchange)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # events.ts loads as TIMESTAMP_NTZ; the session tz is pinned UTC, so
    # the LTZ reinterpretation is the identity and unix_micros is exact.
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    gaps = ev.select(
        "user_id",
        (us - F.lag(us).over(w)).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    return gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.max("gap_us").alias("max_gap_us"),
        (F.sum("gap_us").cast("double") / F.count(F.lit(1))).alias("avg_gap_us"),
    )


@register(
    "w_percent_rank",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal)
    QUALIFY c_custkey % 97 = 0
    ORDER BY c_custkey
    """,
)
def w_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENT_RANK + CUME_DIST per market segment (distribution position
    of every customer's balance inside its segment).  Both functions are
    rank arithmetic with ONE double division — (rank-1)/(n-1) and
    rows_le/n — bit-identical across engines, and ties collapse to the
    same value by definition so no tie-break is needed for the ranking
    itself.  The output is sampled AFTER ranking (the rank must see every
    row).  Partitioning by segment keeps the sort distributed (5 segments
    here; at 100 TB any within-partition global rank is a range-partition
    sort — same shape Spark uses for a global orderBy)."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal")
    return (
        c.select(
            "c_custkey",
            "c_mktsegment",
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
        )
        .filter(F.col("c_custkey") % 97 == 0)
        .orderBy("c_custkey")
    )


@register(
    "w_gap_histogram",
    oracle="""
    WITH g AS (
      SELECT user_id,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS gap_us
      FROM events
    )
    SELECT CAST(FLOOR(gap_us / 3600000000.0) AS BIGINT) AS gap_hours,
           COUNT(*) AS n_gaps,
           COUNT(DISTINCT user_id) AS n_users,
           MIN(gap_us) AS min_gap_us,
           MAX(gap_us) AS max_gap_us
    FROM g WHERE gap_us IS NOT NULL
    GROUP BY 1 ORDER BY 1
    """,
)
def w_gap_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival gap DISTRIBUTION (the sessionization-tuning view: the
    histogram's first valley is where the session gap threshold belongs):
    per-user LAG deltas in epoch microseconds, bucketed into whole hours.
    All-integer pipeline — the only double is the bucketing division,
    floor-truncated identically by both engines.

    Scale shape: one user_id shuffle shared by the window, then a
    map-side-combinable histogram aggregation on the bucket key."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    gaps = ev.select(
        "user_id",
        (us - F.lag(us).over(w)).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    return (
        gaps.groupBy(
            F.floor(F.col("gap_us") / 3600000000.0)
            .cast("bigint")
            .alias("gap_hours")
        )
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.count_distinct("user_id").alias("n_users"),
            F.min("gap_us").alias("min_gap_us"),
            F.max("gap_us").alias("max_gap_us"),
        )
        .orderBy("gap_hours")
    )


@register(
    "w_ewma_users",
    oracle="""
    WITH o AS (
      SELECT user_id,
             list(value ORDER BY ts, event_id) AS vals
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           len(vals) AS n_events,
           list_reduce(vals, (acc, v) -> acc * 0.5 + v * 0.5) AS ewma
    FROM o ORDER BY user_id
    """,
)
def w_ewma_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially weighted moving average of event values
    (α = 1/2) — the classic streaming feature (recent behavior weighted
    over history).  α = 1/2 keeps every step EXACT-deterministic: halving
    is a binary-exponent shift and the fold runs in one fixed
    (ts, event_id) order, so the left-to-right IEEE chain is bit-identical
    across engines (the same contract as the dot-product folds).  Seeded
    at the first value (list_reduce semantics: acc starts as vals[1]).

    Scale shape: one user_id shuffle, collect_list bounded by per-key
    history (the same bound any per-entity feature store lives with), one
    fold per key — no window re-sort, no cross-key state."""
    ev = load_table(spark, sf_dir, "events")
    o = ev.groupBy("user_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "value"))
            ),
            lambda s: s["value"],
        ).alias("vals")
    )
    # DuckDB list_reduce seeds the accumulator with the FIRST element;
    # mirror that: fold the tail onto vals[0].
    ewma = F.aggregate(
        F.slice(F.col("vals"), 2, F.size("vals") - 1),
        F.element_at(F.col("vals"), 1),
        lambda acc, v: acc * F.lit(0.5) + v * F.lit(0.5),
    )
    return o.select(
        "user_id",
        F.size("vals").cast("bigint").alias("n_events"),
        ewma.alias("ewma"),
    ).orderBy("user_id")


@register(
    "w_cusum_drift",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(c) AS BIGINT) AS total FROM daily),
    s AS (
      SELECT daily.day,
             CAST(SUM(t.n * daily.c - t.total) OVER (
               ORDER BY daily.day
             ) AS BIGINT) AS s_scaled
      FROM daily, t
    )
    SELECT t.n AS n_days, t.total,
           CAST(MAX(abs(s.s_scaled)) AS BIGINT) AS max_abs_s,
           first(s.day ORDER BY abs(s.s_scaled) DESC, s.day)
             AS changepoint_day,
           CAST(MAX(abs(s.s_scaled)) AS DOUBLE) / (t.n * t.total)
             AS drift_score
    FROM s, t GROUP BY t.n, t.total
    """,
)
def w_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint screen on the daily event-count series: the
    cumulative sum of MEAN-CENTERED counts peaks at the day the arrival
    rate shifts.  Centered WITHOUT division — deviations are scaled by n
    (S_t = Σ n·c_i − t·total), keeping the whole walk in exact BIGINTs;
    the argmax day is the candidate changepoint and max|S|/(n·total) a
    dimensionless drift score (the single double division).

    Scale shape: the scan reduces to |days| rows before the (tiny)
    ordered prefix window; at 100 TB the same decomposition as
    a_concurrent applies if the series itself were huge."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    t = daily.agg(
        F.count(F.lit(1)).alias("n"), F.sum("c").alias("total")
    )
    s = (
        daily.crossJoin(F.broadcast(t))
        .select(
            "day",
            "n",
            "total",
            F.sum(F.col("n") * F.col("c") - F.col("total"))
            .over(W.orderBy("day"))
            .alias("s_scaled"),
        )
    )
    return (
        s.groupBy("n", "total")
        .agg(
            F.max(F.abs("s_scaled")).alias("max_abs_s"),
            F.max(
                F.struct(
                    F.abs(F.col("s_scaled")).alias("a"),
                    (-F.unix_date(F.col("day"))).alias("neg_day"),
                )
            ).alias("best"),
        )
        .select(
            F.col("n").alias("n_days"),
            "total",
            F.col("max_abs_s").cast("bigint").alias("max_abs_s"),
            F.date_from_unix_date(-F.col("best.neg_day")).alias(
                "changepoint_day"
            ),
            (
                F.col("max_abs_s").cast("double")
                / (F.col("n") * F.col("total"))
            ).alias("drift_score"),
        )
    )


@register(
    "w_max_drawdown",
    oracle="""
    WITH b AS (
      SELECT o_custkey AS k, o_orderdate AS d, o_orderkey AS id,
             CASE WHEN o_orderstatus = 'F'
                  THEN CAST(FLOOR(o_totalprice) AS BIGINT)
                  ELSE -CAST(FLOOR(o_totalprice) AS BIGINT) END AS flow
      FROM orders
      WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
        AND o_orderkey IS NOT NULL AND o_totalprice IS NOT NULL
    ),
    p0 AS (
      SELECT k, d, id,
             SUM(flow) OVER (PARTITION BY k ORDER BY d, id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bal
      FROM b
    ),
    p AS (
      SELECT k, bal,
             MAX(bal) OVER (PARTITION BY k ORDER BY d, id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
      FROM p0
    ),
    dd AS (
      SELECT k, COUNT(*) AS n_orders,
             CAST(MAX(peak - bal) AS BIGINT) AS max_drawdown
      FROM p GROUP BY k
    )
    SELECT k AS custkey, n_orders, max_drawdown
    FROM dd ORDER BY max_drawdown DESC, custkey LIMIT 10
    """,
)
def w_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAX DRAWDOWN per customer — the canonical prefix-extremum window
    pattern (Kadane's problem in SQL form): over each customer's signed
    order flow in time order (F-status orders credit, others debit,
    floored-dollar BIGINT ticks), the running balance, its running peak,
    and the maximum peak-to-balance drop.  The trick: a sequential-
    looking scan statistic becomes TWO stacked windows over ONE
    partition sort (cumulative sum, then cumulative max of it) — no
    recursion, no UDAF, exact integers end to end; the (date, id)
    tie-break makes same-day orders deterministic.

    Scale shape: one hash shuffle on the customer key, one in-partition
    sort feeding both frames, then a per-key aggregate and a top-10
    TakeOrderedAndProject.  At 100 TB the sort is per-customer-partition
    local — never global."""
    b = (
        load_table(spark, sf_dir, "orders")
        .filter(
            F.col("o_custkey").isNotNull()
            & F.col("o_orderdate").isNotNull()
            & F.col("o_orderkey").isNotNull()
            & F.col("o_totalprice").isNotNull()
        )
        .select(
            F.col("o_custkey").alias("k"),
            F.col("o_orderdate").alias("d"),
            F.col("o_orderkey").alias("id"),
            F.when(
                F.col("o_orderstatus") == "F",
                F.floor("o_totalprice").cast("bigint"),
            )
            .otherwise(-F.floor("o_totalprice").cast("bigint"))
            .alias("flow"),
        )
    )
    w = (
        Window.partitionBy("k")
        .orderBy("d", "id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p0 = b.select("k", "d", "id", F.sum("flow").over(w).alias("bal"))
    p = p0.select("k", "bal", F.max("bal").over(w).alias("peak"))
    return (
        p.groupBy(F.col("k").alias("custkey"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.max(F.col("peak") - F.col("bal"))
            .cast("bigint")
            .alias("max_drawdown"),
        )
        .orderBy(F.desc("max_drawdown"), "custkey")
        .limit(10)
    )
