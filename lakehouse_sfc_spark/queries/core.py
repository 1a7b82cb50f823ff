"""Core query surface: the reference's demo queries and every predicate /
aggregation shape its workload generator emits (SURVEY.md §2.2, §2.4, §2.6,
§2.8), expressed DataFrame-first so Catalyst gets full pushdown visibility.

Reference parity (file:line cited per query):
- demo q1-q4        -> /root/reference/workloads/demo/*.sql
- predicate shapes  -> workload_spec/spec_tpch_Q1..Q7.yaml, spec_amazon_*.yaml
- TPC-H Q1/Q6 style -> RQ6 dbgen streams (tpch_all_runner.py:168-169)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_sfc_spark.queries.registry import (
    davg,
    dsum,
    register,
    sql_davg,
    sql_dsum,
)
from lakehouse_sfc_spark.sources.loader import load_table


def _ts(s: str):
    return F.to_timestamp(F.lit(s))


# --- demo queries (workloads/demo/*.sql) ------------------------------------


@register(
    "q1_filter",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
    FROM lineitem
    WHERE l_returnflag = 'R' AND l_linestatus = 'O'
    GROUP BY l_returnflag, l_linestatus
    """,
    headline=True,
)
def q1_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-predicate filter + group-by (workloads/demo/q1_filter.sql).

    Optimizer rewrite Catalyst does not perform: both group keys are
    pinned by equality predicates, so the GROUP BY is degenerate — one
    group at most — and collapses to a global COUNT with the keys
    re-attached as literals.  The ``cnt > 0`` guard preserves empty-input
    semantics exactly (GROUP BY over zero rows yields zero groups, while
    a bare global aggregate would yield one).  Saves the hash-partition
    exchange and the final aggregate stage; the scan (single parquet
    row group → single task) is the remaining floor."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_returnflag") == "R") & (F.col("l_linestatus") == "O"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 0)
        .select(
            F.lit("R").alias("l_returnflag"),
            F.lit("O").alias("l_linestatus"),
            "cnt",
        )
    )


@register(
    "q2_date_range",
    oracle="""
    SELECT COUNT(*) AS cnt
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    """,
    headline=True,
)
def q2_date_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-dim date range (workloads/demo/q2_date_range.sql); the shape every
    RQ1 'range' spec generates (spec_tpch_Q2.yaml:6-7)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    ).agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "q3_group_by",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum("l_quantity", "sum_qty")},
           {sql_davg("l_extendedprice", "avg_price")}
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    headline=True,
)
def q3_group_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-scan aggregation (workloads/demo/q3_group_by.sql)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity", "sum_qty"),
        davg("l_extendedprice", "avg_price"),
    )


@register(
    "q4_order_limit",
    oracle="""
    SELECT l_orderkey, l_shipdate, l_extendedprice
    FROM lineitem
    ORDER BY l_shipdate DESC, l_orderkey, l_extendedprice
    LIMIT 1000
    """,
    headline=True,
)
def q4_order_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k: ORDER BY + LIMIT compiles to TakeOrderedAndProject — per
    partition heap + single reduce, no global sort shuffle at any scale
    (workloads/demo/q4_order_limit.sql).  The extra l_extendedprice sort key
    makes the top-1000 deterministic on ties."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_shipdate", "l_extendedprice")
        .orderBy(F.desc("l_shipdate"), F.asc("l_orderkey"), F.asc("l_extendedprice"))
        .limit(1000)
    )


# --- predicate shapes (§2.2) -------------------------------------------------


@register(
    "p_in_list",
    oracle="""
    SELECT COUNT(*) AS cnt
    FROM lineitem
    WHERE l_shipdate IN (TIMESTAMP '1996-03-01', TIMESTAMP '1997-07-15',
                         TIMESTAMP '1998-01-02', TIMESTAMP '1999-11-30')
    """,
)
def p_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list fan-out (spec_tpch_Q4.yaml:5-13, K up to 16)."""
    li = load_table(spark, sf_dir, "lineitem")
    dates = ["1996-03-01", "1997-07-15", "1998-01-02", "1999-11-30"]
    return li.filter(
        F.col("l_shipdate").isin([F.to_timestamp(F.lit(d)) for d in dates])
    ).agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "p_multidim_box",
    oracle="""
    SELECT COUNT(*) AS cnt
    FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-06-30'
      AND l_quantity BETWEEN 10 AND 30
      AND l_discount BETWEEN 0.02 AND 0.06
    """,
)
def p_multidim_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive 3-dim box — the core SFC-layout workload shape
    (spec_tpch_Q5.yaml:5-9; generate_tpch_rq2_specs.py:44-61)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_shipdate").between(_ts("1996-01-01"), _ts("1997-06-30"))
        & F.col("l_quantity").between(10, 30)
        & F.col("l_discount").between(0.02, 0.06)
    ).agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "p_disjunction",
    oracle="""
    SELECT COUNT(*) AS cnt
    FROM lineitem
    WHERE (l_quantity <= 5 OR l_quantity >= 45)
      AND l_returnflag = 'N'
    """,
)
def p_disjunction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR of range predicates (spec_amazon_Q3.yaml:13)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        ((F.col("l_quantity") <= 5) | (F.col("l_quantity") >= 45))
        & (F.col("l_returnflag") == "N")
    ).agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "p_like_null",
    oracle="""
    SELECT COUNT(*) AS cnt_like,
           COUNT(CASE WHEN o_orderpriority IS NULL THEN 1 END) AS cnt_null
    FROM orders
    WHERE o_orderpriority LIKE '%HIGH%'
       OR o_orderpriority IS NULL
    """,
)
def p_like_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE / IS NULL predicate taxonomy (sql_layout_toolkit.py:414-431)."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderpriority").like("%HIGH%") | F.col("o_orderpriority").isNull()
    ).agg(
        F.count(F.lit(1)).alias("cnt_like"),
        F.count(F.when(F.col("o_orderpriority").isNull(), 1)).alias("cnt_null"),
    )


# --- aggregation shapes (§2.4) ------------------------------------------------


@register(
    "a_having",
    oracle=f"""
    SELECT l_orderkey,
           {sql_dsum("l_extendedprice", "sum_price")},
           COUNT(*) AS cnt
    FROM lineitem
    GROUP BY l_orderkey
    HAVING COUNT(*) >= 5 AND SUM(CAST(l_extendedprice AS DECIMAL(18,2))) >= 200000
    """,
)
def a_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING on count+sum (spec_tpch_Q7.yaml:11)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(
            dsum("l_extendedprice", "sum_price"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .filter((F.col("cnt") >= 5) & (F.col("sum_price") >= 200000))
    )


@register(
    "a_group_year",
    oracle=f"""
    SELECT CAST(YEAR(l_shipdate) AS INT) AS ship_year,
           COUNT(*) AS cnt,
           {sql_dsum("l_quantity", "sum_qty")}
    FROM lineitem
    GROUP BY 1
    """,
)
def a_group_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY year(expr) (spec_tpch_Q7.yaml:10)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.year("l_shipdate").cast("int").alias("ship_year")
    ).agg(F.count(F.lit(1)).alias("cnt"), dsum("l_quantity", "sum_qty"))


@register(
    "a_month_trunc",
    oracle=f"""
    SELECT CAST(DATE_TRUNC('month', ts) AS DATE) AS event_month,
           COUNT(*) AS cnt,
           {sql_dsum("value", "sum_value", 4)}
    FROM events
    GROUP BY 1
    """,
)
def a_month_trunc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY DATE_TRUNC('month', ts) (spec_amazon_Q2.yaml:6,14)."""
    ev = load_table(spark, sf_dir, "events")
    # cast to DATE: DuckDB's date_trunc returns DATE; match the type exactly
    return ev.groupBy(
        F.date_trunc("month", "ts").cast("date").alias("event_month")
    ).agg(F.count(F.lit(1)).alias("cnt"), dsum("value", "sum_value", 4))


@register(
    "a_conditional",
    oracle="""
    SELECT event_type,
           CAST(SUM(CASE WHEN value > 50 THEN 1 ELSE 0 END) AS BIGINT) AS hits,
           COUNT(*) AS cnt
    FROM events
    GROUP BY event_type
    """,
)
def a_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregate SUM(CASE WHEN ...) (spec_amazon_Q4.yaml:7).
    The conditional count is pinned to BIGINT on both sides (Spark SUM(int)
    is bigint; DuckDB's is HUGEINT) so the value hashes agree."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.sum(F.when(F.col("value") > 50, 1).otherwise(0))
        .cast("long")
        .alias("hits"),
        F.count(F.lit(1)).alias("cnt"),
    )


@register(
    "profile_minmax",
    oracle="""
    SELECT 'l_quantity' AS col_name,
           CAST(MIN(l_quantity) AS DOUBLE) AS min_val,
           CAST(MAX(l_quantity) AS DOUBLE) AS max_val,
           COUNT(l_quantity) AS non_null,
           COUNT(DISTINCT l_quantity) AS n_distinct
    FROM lineitem
    UNION ALL
    SELECT 'l_discount',
           CAST(MIN(l_discount) AS DOUBLE), CAST(MAX(l_discount) AS DOUBLE),
           COUNT(l_discount), COUNT(DISTINCT l_discount)
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice',
           CAST(MIN(l_extendedprice) AS DOUBLE), CAST(MAX(l_extendedprice) AS DOUBLE),
           COUNT(l_extendedprice), COUNT(DISTINCT l_extendedprice)
    FROM lineitem
    """,
)
def profile_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profiler statistics pass (wlg/profiler/stats.py:137-148) as ONE scan:
    all per-column aggregates computed together, then unpivoted — no
    one-job-per-column loop at scale."""
    li = load_table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_discount", "l_extendedprice"]
    aggs = []
    for c in cols:
        aggs += [
            F.min(c).cast("double").alias(f"min__{c}"),
            F.max(c).cast("double").alias(f"max__{c}"),
            F.count(c).alias(f"cnt__{c}"),
            F.countDistinct(c).alias(f"nd__{c}"),
        ]
    wide = li.agg(*aggs)
    stacked = wide.select(
        F.expr(
            "stack({n}, {args}) AS (col_name, min_val, max_val, non_null, n_distinct)".format(
                n=len(cols),
                args=", ".join(
                    f"'{c}', min__{c}, max__{c}, cnt__{c}, nd__{c}" for c in cols
                ),
            )
        )
    )
    return stacked


@register(
    "a_time_rollup",
    oracle=f"""
    SELECT 'hour' AS grain, CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS bucket,
           event_type, COUNT(*) AS cnt, {sql_dsum("value", "sum_value", 4)}
    FROM events GROUP BY 2, 3
    UNION ALL
    SELECT 'day', CAST(DATE_TRUNC('day', ts) AS TIMESTAMP),
           event_type, COUNT(*), {sql_dsum("value", "sum_value", 4)}
    FROM events GROUP BY 2, 3
    UNION ALL
    SELECT 'month', CAST(DATE_TRUNC('month', ts) AS TIMESTAMP),
           event_type, COUNT(*), {sql_dsum("value", "sum_value", 4)}
    FROM events GROUP BY 2, 3
    """,
)
def a_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate at three granularities
    (hour/day/month per event_type) — computed HIERARCHICALLY: the events
    table is scanned and aggregated ONCE at hour grain, then day rolls up
    from hourly and month from daily.  At 100 TB this is the difference
    between one fact scan and three; the re-aggregations touch only the
    (tiny) coarser aggregate.  Sums stay in exact DECIMAL through every
    level (cast back to DECIMAL(18,4) per level, so the dtype is
    scale-stable) and convert to DOUBLE once at the end — bit-identical to
    the oracle's independent per-grain aggregation."""
    ev = load_table(spark, sf_dir, "events")
    dec = "decimal(18,4)"

    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("bucket"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("value").cast(dec)).cast(dec).alias("sum_dec"),
    )
    daily = hourly.groupBy(
        F.date_trunc("day", "bucket").alias("bucket"), "event_type"
    ).agg(
        F.sum("cnt").alias("cnt"),
        F.sum("sum_dec").cast(dec).alias("sum_dec"),
    )
    monthly = daily.groupBy(
        F.date_trunc("month", "bucket").alias("bucket"), "event_type"
    ).agg(
        F.sum("cnt").alias("cnt"),
        F.sum("sum_dec").cast(dec).alias("sum_dec"),
    )

    def _final(df: DataFrame, grain: str) -> DataFrame:
        return df.select(
            F.lit(grain).alias("grain"),
            F.col("bucket").cast("timestamp_ntz").alias("bucket"),
            "event_type",
            F.col("cnt").cast("long").alias("cnt"),
            F.col("sum_dec").cast("double").alias("sum_value"),
        )

    return (
        _final(hourly, "hour")
        .unionByName(_final(daily, "day"))
        .unionByName(_final(monthly, "month"))
    )


@register(
    "a_group_quantiles",
    oracle="""
    WITH r AS (
      SELECT event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events WHERE value IS NOT NULL
    )
    SELECT event_type,
           MAX(n) AS n,
           MAX(CASE WHEN rn = CAST(CEIL(0.25 * n) AS BIGINT) THEN value END) AS p25,
           MAX(CASE WHEN rn = CAST(CEIL(0.5  * n) AS BIGINT) THEN value END) AS p50,
           MAX(CASE WHEN rn = CAST(CEIL(0.75 * n) AS BIGINT) THEN value END) AS p75
    FROM r GROUP BY 1
    """,
)
def a_group_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group quantiles (type-1: the value at rank ⌈p·n⌉) — the
    grouped variant of profile_quantiles, computed with rank arithmetic so
    the result is a REAL data value and hash-matches the oracle exactly
    (approx_percentile never can).  0.25/0.5/0.75 are powers of two, so
    ⌈p·n⌉ is float-exact in both engines.

    NULL values are excluded explicitly (quantiles of the observed
    distribution) — also required for parity: Spark's default ORDER BY
    puts NULLs FIRST, DuckDB puts them LAST, so any rank arithmetic over
    a nullable sort key must either filter NULLs or pin the placement.

    Scale shape: one shuffle on the group key; the per-group sort is the
    window sort — no global sort, and the selector is a conditional
    aggregate, not a per-quantile re-scan."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wc = Window.partitionBy("event_type")
    r = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )

    def pick(p: float, alias: str):
        target = F.ceil(F.lit(p) * F.col("n")).cast("long")
        return F.max(F.when(F.col("rn") == target, F.col("value"))).alias(alias)

    return r.groupBy("event_type").agg(
        F.max("n").alias("n"), pick(0.25, "p25"), pick(0.5, "p50"), pick(0.75, "p75")
    )


@register(
    "a_feature_bucketize",
    oracle="""
    SELECT event_type,
           LEAST(GREATEST(CAST(FLOOR(value / 50.0) AS INT), 0), 9) AS bucket,
           COUNT(*) AS cnt
    FROM events
    GROUP BY 1, 2
    """,
)
def a_feature_bucketize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature binning: equal-width value buckets (50-wide, clamped to
    [0, 9]) per event type — the histogram-feature step of a training
    pipeline.  The bucket formula is spelled out (floor/least/greatest)
    rather than width_bucket so both engines evaluate the identical
    expression; all codegen built-ins, one shuffle for the groupBy."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.least(
        F.greatest(F.floor(F.col("value") / 50.0).cast("int"), F.lit(0)),
        F.lit(9),
    )
    return ev.groupBy("event_type", bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("cnt")
    )


# --- grouping sets (ROLLUP / CUBE) ------------------------------------------


@register(
    "a_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag, l_linestatus)::INTEGER AS gid,
           COUNT(*) AS cnt,
           {sql_dsum("l_quantity", "sum_qty")}
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def a_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals via ROLLUP: (flag, status) → (flag) → grand
    total in ONE pass — Spark expands the grouping sets inside a single
    Expand + aggregate, so lineitem is scanned once and shuffled once, not
    once per level (the hand-written UNION ALL alternative scans 3x).
    ``grouping_id`` disambiguates genuine NULL keys from subtotal rows; both
    engines use the same bitmask semantics."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("cnt"),
            dsum("l_quantity", "sum_qty"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "cnt", "sum_qty")
    )


@register(
    "a_cube",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus, o_orderpriority)::INTEGER AS gid,
           COUNT(*) AS cnt,
           {sql_dsum("o_totalprice", "sum_price")}
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def a_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All 2^k marginal aggregates via CUBE in one Expand + aggregate —
    the OLAP cross-tab primitive.  Same single-scan/single-shuffle property
    as ROLLUP; at 100 TB the Expand multiplies rows 4x BEFORE the partial
    agg, which map-side combining immediately collapses — still strictly
    cheaper than 4 separate scans."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("cnt"),
            dsum("o_totalprice", "sum_price"),
        )
        .select("o_orderstatus", "o_orderpriority", "gid", "cnt", "sum_price")
    )


@register(
    "a_grouping_sets",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus, o_orderpriority)::INTEGER AS gid,
           COUNT(*) AS cnt,
           {sql_dsum("o_totalprice", "sum_price")}
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY gid, o_orderstatus, o_orderpriority
    """,
)
def a_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS — the generalization ROLLUP/CUBE can't
    express minimally: exactly the (status), (priority) and grand-total
    marginals, NO (status, priority) cross cells (CUBE would compute and
    discard them).  Spark 4's native DataFrame.groupingSets lowers to the
    same single-scan Expand + one hash aggregate as ROLLUP/CUBE — rows
    multiply by the number of sets BEFORE partial aggregation, which
    map-side combine collapses immediately; still one shuffle at 100 TB.
    NULL placement pinned explicitly (engine defaults diverge — divergence
    class 12, tests/test_engine_semantics.py)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("cnt"),
            dsum("o_totalprice", "sum_price"),
        )
        .select(
            "o_orderstatus", "o_orderpriority", "gid", "cnt", "sum_price"
        )
        .orderBy(
            "gid",
            F.col("o_orderstatus").asc_nulls_last(),
            F.col("o_orderpriority").asc_nulls_last(),
        )
    )


# --- outer joins ------------------------------------------------------------


@register(
    "j_full_outer",
    oracle="""
    SELECT COALESCE(c.nk, s.nk) AS nationkey,
           COALESCE(c.n_cust, 0) AS n_cust,
           COALESCE(s.n_supp, 0) AS n_supp
    FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_cust
          FROM customer GROUP BY 1) c
    FULL OUTER JOIN (SELECT s_nationkey AS nk, COUNT(*) AS n_supp
                     FROM supplier GROUP BY 1) s
      ON c.nk = s.nk
    """,
)
def j_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two pre-aggregated sides (customers and suppliers
    per nation) with COALESCE'd keys and zero-filled counts — the reconcile
    shape.  Aggregating BEFORE the join shrinks both sides to |nations|
    rows, so the outer join is over tiny inputs regardless of fact size;
    full-outer cannot broadcast (both sides must be preserved), so Spark
    plans a sort-merge join over the two 25-row aggregates — the correct
    choice at every scale."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    ca = c.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.count(F.lit(1)).alias("n_cust")
    )
    sa = s.groupBy(F.col("s_nationkey").alias("nk")).agg(
        F.count(F.lit(1)).alias("n_supp")
    )
    return ca.join(sa, "nk", "full_outer").select(
        F.col("nk").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


# --- pivot (cross-tab) ------------------------------------------------------

_PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "a_pivot",
    oracle=f"""
    SELECT user_id,
           {", ".join(
               f"COUNT(*) FILTER (WHERE event_type = '{t}') AS n_{t}"
               for t in _PIVOT_TYPES
           )}
    FROM events
    GROUP BY user_id
    """,
)
def a_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-tab via PIVOT: per-user counts spread across one column per
    event type.  The pivot values are EXPLICIT (the reference pattern for a
    known domain) — with them, Spark plans a single groupBy with N
    conditional aggregates, no extra pass to discover values and no second
    shuffle; the oracle is the equivalent FILTERed aggregate.  At 100 TB an
    unlisted pivot would first run a distinct over the pivot column —
    always enumerate the domain when you know it."""
    ev = load_table(spark, sf_dir, "events")
    pivoted = (
        ev.groupBy("user_id")
        .pivot("event_type", list(_PIVOT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "user_id",
        *[
            F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}")
            for t in _PIVOT_TYPES
        ],
    )


@register(
    "a_unpivot",
    oracle=f"""
    SELECT l_returnflag, measure,
           {sql_dsum("v", "total", 4)}
    FROM (
      SELECT l_returnflag, 'quantity' AS measure, l_quantity AS v
      FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'extendedprice', l_extendedprice FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'discount', l_discount FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'tax', l_tax FROM lineitem
    )
    GROUP BY 1, 2
    """,
)
def a_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long UNPIVOT (melt) of four lineitem measures, then a grouped
    sum per (flag, measure) — the normalize-for-ML shape.  Spark's
    ``unpivot`` plans a single Expand over one scan (rows×4 BEFORE the
    map-side combine, which immediately collapses them) — strictly cheaper
    than the oracle's four scans at any scale."""
    li = load_table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ["l_returnflag"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "v",
    ).withColumn("measure", F.expr("substring(measure, 3)"))
    return long.groupBy("l_returnflag", "measure").agg(dsum("v", "total", 4))


# --- time-series gap filling ------------------------------------------------


@register(
    "a_gap_fill",
    oracle="""
    WITH hourly AS (
        SELECT event_type, CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS b,
               COUNT(*) AS c
        FROM events GROUP BY 1, 2
    ),
    bounds AS (
        SELECT event_type, MIN(b) AS mn, MAX(b) AS mx FROM hourly GROUP BY 1
    ),
    grid AS (
        SELECT event_type,
               UNNEST(generate_series(mn, mx, INTERVAL '1 hour')) AS b
        FROM bounds
    ),
    joined AS (
        SELECT g.event_type, g.b, h.c,
               ROW_NUMBER() OVER (PARTITION BY g.event_type ORDER BY g.b)
                   AS idx
        FROM grid g
        LEFT JOIN hourly h ON h.event_type = g.event_type AND h.b = g.b
    ),
    marked AS (
        SELECT *,
            LAST_VALUE(c IGNORE NULLS) OVER w_prev AS prev_c,
            LAST_VALUE(CASE WHEN c IS NOT NULL THEN idx END IGNORE NULLS)
                OVER w_prev AS prev_idx,
            FIRST_VALUE(c IGNORE NULLS) OVER w_next AS next_c,
            FIRST_VALUE(CASE WHEN c IS NOT NULL THEN idx END IGNORE NULLS)
                OVER w_next AS next_idx
        FROM joined
        WINDOW
          w_prev AS (PARTITION BY event_type ORDER BY b
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
          w_next AS (PARTITION BY event_type ORDER BY b
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, b AS bucket,
           COALESCE(c, 0) AS cnt,
           CAST(c IS NULL AS INTEGER) AS is_gap,
           prev_c AS locf,
           CASE WHEN c IS NOT NULL THEN CAST(c AS DOUBLE)
                ELSE CAST(prev_c AS DOUBLE)
                     + CAST((next_c - prev_c) * (idx - prev_idx) AS DOUBLE)
                       / CAST(next_idx - prev_idx AS DOUBLE)
           END AS interp
    FROM marked
    ORDER BY event_type, bucket
    """,
)
def a_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling (timescale `time_bucket_gapfill` /
    `generate_series` parity, beyond the reference): densify each event
    type's hourly series over its own [min, max] hour range, then fill the
    missing hours three ways — zero-fill, LOCF (last observation carried
    forward), and linear interpolation between the neighboring observed
    counts.

    Scale shape: the grid is built per group from the (tiny) per-group
    bounds via ``sequence``/``explode`` — never a driver loop — and the
    fill is two windows over the (group, hour) series, one shuffle on the
    group key.  Interpolation keeps an all-integer numerator and ONE
    double division, so it is bit-identical across engines."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("b"), "event_type"
    ).agg(F.count(F.lit(1)).alias("c"))

    bounds = hourly.groupBy("event_type").agg(
        F.min("b").alias("mn"), F.max("b").alias("mx")
    )
    grid = bounds.select(
        "event_type",
        F.explode(
            F.sequence("mn", "mx", F.expr("INTERVAL 1 HOUR"))
        ).alias("b"),
    )
    joined = grid.join(hourly, ["event_type", "b"], "left").withColumn(
        "idx",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy("b")
        ),
    )
    w_prev = (
        Window.partitionBy("event_type")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("event_type")
        .orderBy("b")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    idx_if_obs = F.when(F.col("c").isNotNull(), F.col("idx"))
    marked = (
        joined.withColumn("prev_c", F.last("c", ignorenulls=True).over(w_prev))
        .withColumn("prev_idx", F.last(idx_if_obs, ignorenulls=True).over(w_prev))
        .withColumn("next_c", F.first("c", ignorenulls=True).over(w_next))
        .withColumn("next_idx", F.first(idx_if_obs, ignorenulls=True).over(w_next))
    )
    interp = F.when(
        F.col("c").isNotNull(), F.col("c").cast("double")
    ).otherwise(
        F.col("prev_c").cast("double")
        + (
            (F.col("next_c") - F.col("prev_c"))
            * (F.col("idx") - F.col("prev_idx"))
        ).cast("double")
        / (F.col("next_idx") - F.col("prev_idx")).cast("double")
    )
    return marked.select(
        "event_type",
        F.col("b").cast("timestamp_ntz").alias("bucket"),
        F.coalesce("c", F.lit(0)).alias("cnt"),
        F.col("c").isNull().cast("int").alias("is_gap"),
        F.col("prev_c").alias("locf"),
        interp.alias("interp"),
    ).orderBy("event_type", "bucket")


@register(
    "p_json_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           COUNT(k) AS n_with_k,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           COUNT(DISTINCT k) AS n_distinct_k,
           COUNT(*) FILTER (WHERE k > 50) AS n_big_k
    FROM (
      SELECT event_type,
             CASE WHEN isfinite(v) AND abs(v) < 1e15
                  THEN CAST(FLOOR(v) AS BIGINT) END AS k
      FROM (
        SELECT event_type,
               TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE) AS v
        FROM events
      )
    )
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def p_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access: extract an integer field from the JSON
    `props` column (`get_json_object` — Spark's JVM-side JSON path
    evaluator; `json_extract_string` in the oracle) and aggregate per
    event type.  All metrics are exact integers, so the comparison is
    hash-tight despite two different JSON parsers.

    Cross-engine ladder: BOTH sides normalize string → DOUBLE, then keep
    only FINITE values with |v| < 1e15 before FLOOR → BIGINT.  A direct
    string→int cast is engine-divergent ("3.0", "1e2", quoted numbers:
    DuckDB accepts, Spark NULLs; "true": DuckDB errors, Spark NULLs), and
    the unguarded double→BIGINT tail diverges too (NaN/Infinity/≥2^63:
    Spark try_cast saturates or zeroes, DuckDB CAST errors) — the
    finite-and-in-range guard is what makes the ladder engine-identical
    end to end.  Adversarial fixtures incl. NaN/Infinity/1e20 in
    tests/test_json_fixture.py.

    Scale note: JSON path extraction is codegen'd JVM work in the scan
    projection — no Python, no UDF.  At 100 TB the right move is to
    extract ONCE at ingest into a typed column (schema-on-write); this
    query is the schema-on-read path for data you don't control."""
    ev = load_table(spark, sf_dir, "events")
    # try_cast, not cast: ANSI mode (Spark 4 default, and whatever the
    # driver's untuned session runs) throws on non-numeric JSON values
    v = F.get_json_object(F.col("props"), "$.k").try_cast("double")
    k = F.when(~F.isnan(v) & (F.abs(v) < 1e15), F.floor(v)).try_cast(
        "bigint"
    )
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.count_distinct(F.col("k")).alias("n_distinct_k"),
            F.count(F.when(F.col("k") > 50, 1)).alias("n_big_k"),
        )
        .orderBy("event_type")
    )


@register(
    "a_mode",
    oracle="""
    WITH seg_counts AS (
      SELECT n.n_name, c.c_mktsegment, COUNT(*) AS cnt
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      WHERE c.c_mktsegment IS NOT NULL
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY n_name ORDER BY cnt DESC, c_mktsegment
      ) AS rk
      FROM seg_counts
    )
    SELECT n_name, c_mktsegment AS mode_segment, cnt
    FROM ranked WHERE rk = 1
    ORDER BY n_name
    """,
)
def a_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mode (most frequent value): each nation's dominant market
    segment.  Count per (group, value) — one shuffle that reduces to at
    most |groups|·|domain| rows — then an argmax window over the tiny
    counted relation, ties broken lexically so both engines pick the same
    winner.  The window sorts |domain| rows per group, never data-sized
    input; this is how mode should be computed at any scale (never
    collect_list + driver-side counting).  NULL segments are excluded
    (mode is of the observed values; also avoids the Spark-NULLS-FIRST /
    DuckDB-NULLS-LAST default-ordering divergence in the tie-break)."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isNotNull()
    )
    n = load_table(spark, sf_dir, "nation")
    counts = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("n_name").orderBy(F.desc("cnt"), "c_mktsegment")
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("n_name", F.col("c_mktsegment").alias("mode_segment"), "cnt")
        .orderBy("n_name")
    )


@register(
    "a_cohort_retention",
    oracle="""
    WITH activity AS (
      SELECT DISTINCT user_id,
             CAST(DATE_TRUNC('month', ts) AS DATE) AS m
      FROM events
    ),
    cohorts AS (
      SELECT user_id, MIN(m) AS cohort_month FROM activity GROUP BY 1
    )
    SELECT c.cohort_month,
           (YEAR(a.m) * 12 + MONTH(a.m))
             - (YEAR(c.cohort_month) * 12 + MONTH(c.cohort_month))
             AS month_offset,
           COUNT(DISTINCT a.user_id) AS n_users
    FROM activity a JOIN cohorts c ON a.user_id = c.user_id
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def a_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity month, and
    for each later month the count still active — the table every growth /
    engagement dashboard is built on.  Shape: the event log reduces to
    DISTINCT (user, month) FIRST (the only data-sized shuffle, and it
    partitions by user so the per-user MIN reuses the partitioning); the
    cohort join and the final (cohort, offset) rollup run on the reduced
    user-month relation.  Month arithmetic is integer (year·12+month), so
    every output cell is exact."""
    ev = load_table(spark, sf_dir, "events")
    activity = ev.select(
        "user_id",
        F.date_trunc("month", F.col("ts")).cast("date").alias("m"),
    ).distinct()
    cohorts = activity.groupBy("user_id").agg(
        F.min("m").alias("cohort_month")
    )
    mo = F.year(F.col("m")) * 12 + F.month(F.col("m"))
    co = F.year(F.col("cohort_month")) * 12 + F.month(F.col("cohort_month"))
    return (
        activity.join(cohorts, "user_id")
        .groupBy(
            "cohort_month", (mo - co).alias("month_offset")
        )
        .agg(F.count_distinct(F.col("user_id")).alias("n_users"))
        .orderBy("cohort_month", "month_offset")
    )


@register(
    "a_grouped_agg_pandas",
    oracle="""
    SELECT event_type,
           CAST(SUM(CASE WHEN isfinite(value)
                    THEN CAST(FLOOR(CAST(value AS DOUBLE) * 10000)
                              AS BIGINT) END) AS BIGINT)
             AS sum_ticks,
           COUNT(CASE WHEN isfinite(value) THEN value END) AS n
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def a_grouped_agg_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate Pandas UDF (SURVEY §2.10 — the one Arrow UDF shape
    not exercised elsewhere: scalar pandas_udf → sfc/hilbert, mapInPandas →
    multimodal, applyInPandas → embedding blocks, applyInPandasWithState →
    sessionizer, UDTF → text_tokenize_udtf).  The UDAF sums fixed-point
    ticks floor(value·1e4) as int64 over FINITE float64 values — integer
    accumulation is order-independent and the dtype/NaN surface is pinned
    (see operators/pandas_aggs.py), so the Python result is exact and
    hash-matches the SQL oracle across engine versions; a float-summing or
    dtype-inheriting UDAF could never make that promise.  The oracle
    mirrors the finite filter (`FILTER (WHERE isfinite(value))`).

    Plan shape: same single hash-exchange topology as the built-in SUM
    (ObjectHashAggregate), with Arrow transfer as the extra cost — but
    GROUPED_AGG materializes the WHOLE group per call, so it requires
    bounded groups (here: |event_type| ≈ 5).  For unbounded groups use
    the built-in `F.sum(F.floor(value*1e4).cast('long'))` instead."""
    from pyspark.sql.functions import pandas_udf

    from lakehouse_sfc_spark.operators.pandas_aggs import (
        count_finite_kernel,
        sum_ticks_kernel,
    )

    # type-hint eval-type inference (pd.Series -> scalar ⇒ GROUPED_AGG);
    # the deprecated PandasUDFType constant is gone.
    sum_ticks = pandas_udf(sum_ticks_kernel, "bigint")
    # Spark refuses to mix grouped-agg pandas UDFs with built-in aggregates
    # in one agg, so the count rides the same Arrow path.
    n_vals = pandas_udf(count_finite_kernel, "bigint")

    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            sum_ticks(F.col("value")).alias("sum_ticks"),
            n_vals(F.col("value")).alias("n"),
        )
        .orderBy("event_type")
    )


@register(
    "a_calendar_dim",
    oracle="""
    WITH span AS (
      SELECT CAST(MIN(o_orderdate) AS DATE) AS d0,
             CAST(MAX(o_orderdate) AS DATE) AS d1
      FROM orders
    ),
    cal AS (
      SELECT CAST(UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
               AS day
      FROM span
    ),
    caldow AS (
      SELECT dayofweek(day) AS dow, COUNT(*) AS n_days FROM cal GROUP BY 1
    ),
    orddow AS (
      SELECT dayofweek(CAST(o_orderdate AS DATE)) AS dow,
             COUNT(*) AS n_orders
      FROM orders GROUP BY 1
    )
    SELECT c.dow, c.n_days, COALESCE(o.n_orders, 0) AS n_orders,
           CAST(COALESCE(o.n_orders, 0) AS DOUBLE) / c.n_days
             AS orders_per_day
    FROM caldow c LEFT JOIN orddow o ON c.dow = o.dow
    ORDER BY c.dow
    """,
)
def a_calendar_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generated calendar dimension: a complete day spine materialized with
    a sequence generator (no calendar table on disk — the dbt/warehouse
    date-spine pattern), rolled up by day-of-week and joined against the
    order volume so zero-activity days still count in the denominator.
    DuckDB's dayofweek is 0-6 Sunday-first; Spark's dayofweek is 1-7
    Sunday-first — the Spark side subtracts 1 for identical keys.  All
    integer counts + one double division.  The generator produces ~2500
    rows on the driver-side 1-row span — nothing data-sized explodes."""
    o = load_table(spark, sf_dir, "orders")
    span = o.agg(
        F.min(F.col("o_orderdate").cast("date")).alias("d0"),
        F.max(F.col("o_orderdate").cast("date")).alias("d1"),
    )
    cal = span.select(
        F.explode(
            F.sequence(
                F.col("d0"), F.col("d1"), F.expr("INTERVAL 1 DAY")
            )
        ).alias("day")
    )
    caldow = cal.groupBy(
        (F.dayofweek(F.col("day")) - 1).alias("dow")
    ).agg(F.count(F.lit(1)).alias("n_days"))
    orddow = o.groupBy(
        (F.dayofweek(F.col("o_orderdate").cast("date")) - 1).alias("dow")
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    return (
        caldow.join(orddow, "dow", "left")
        .select(
            "dow",
            "n_days",
            F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
            (
                F.coalesce(F.col("n_orders"), F.lit(0)).cast("double")
                / F.col("n_days")
            ).alias("orders_per_day"),
        )
        .orderBy("dow")
    )


@register(
    "a_weighted_median",
    oracle="""
    WITH base AS (
      SELECT l_returnflag AS rf, l_extendedprice AS p,
             CAST(FLOOR(l_quantity) AS BIGINT) AS w
      FROM lineitem
      WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
    ),
    d AS (
      SELECT rf, p, SUM(w) AS w, COUNT(*) AS cnt
      FROM base GROUP BY rf, p
    ),
    c AS (
      SELECT rf, p, w, cnt,
             SUM(w) OVER (PARTITION BY rf ORDER BY p
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cw,
             SUM(w) OVER (PARTITION BY rf) AS tot,
             SUM(cnt) OVER (PARTITION BY rf) AS n
      FROM d
    )
    SELECT rf AS returnflag,
           CAST(MAX(n) AS BIGINT) AS n_rows,
           CAST(MAX(tot) AS BIGINT) AS total_weight,
           MIN(CASE WHEN 2*cw >= tot THEN p END) AS weighted_median
    FROM c GROUP BY rf ORDER BY rf NULLS LAST
    """,
)
def a_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact WEIGHTED median per group — the aggregate neither engine has
    natively (Spark's percentile/median are unweighted): the smallest
    price whose cumulative quantity-weight reaches half the group total
    (the lower weighted median, the form inventory/pricing pipelines
    use).  Tie-safe by construction: weights are pre-aggregated PER
    DISTINCT VALUE before the cumulative window, so equal prices
    contribute one row and the running sum never depends on an arbitrary
    tie order — the subtlety that makes naive row-level cumsum medians
    nondeterministic.  The median itself is a picked input value, so no
    float arithmetic is compared — only exact integer weights.

    Scale shape: one hash aggregation on (group, value), one window sort
    within group over the DISTINCT-value relation (orders of magnitude
    smaller than the row count), map-side partials everywhere; at 100 TB
    the distinct-value relation is the only sorted thing — never the
    fact table."""
    base = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            F.col("l_extendedprice").isNotNull()
            & F.col("l_quantity").isNotNull()
        )
        .select(
            F.col("l_returnflag").alias("rf"),
            F.col("l_extendedprice").alias("p"),
            F.floor("l_quantity").cast("bigint").alias("w"),
        )
    )
    d = base.groupBy("rf", "p").agg(
        F.sum("w").alias("w"), F.count(F.lit(1)).alias("cnt")
    )
    wc = (
        Window.partitionBy("rf")
        .orderBy("p")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("rf")
    c = d.select(
        "rf",
        "p",
        F.sum("w").over(wc).alias("cw"),
        F.sum("w").over(wt).alias("tot"),
        F.sum("cnt").over(wt).alias("n"),
    )
    return (
        c.groupBy(F.col("rf").alias("returnflag"))
        .agg(
            F.max("n").cast("bigint").alias("n_rows"),
            F.max("tot").cast("bigint").alias("total_weight"),
            F.min(
                F.when(F.lit(2) * F.col("cw") >= F.col("tot"), F.col("p"))
            ).alias("weighted_median"),
        )
        .orderBy(F.col("returnflag").asc_nulls_last())
    )


@register(
    "a_trend_slope",
    oracle="""
    WITH b AS (
      SELECT o_orderpriority AS pr,
             CAST(DATEDIFF('day', DATE '1995-01-01',
                           CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
             CAST(FLOOR(o_totalprice) AS BIGINT) AS y
      FROM orders
      WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
    ),
    s AS (
      SELECT pr, COUNT(*) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x*y) AS BIGINT) AS sxy,
             CAST(SUM(x*x) AS BIGINT) AS sxx
      FROM b GROUP BY pr
    )
    SELECT pr AS priority, n,
           CAST(sx AS BIGINT) AS sum_x, CAST(sy AS BIGINT) AS sum_y,
           CAST(CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy
                AS DECIMAL(38,0)) AS VARCHAR) AS slope_num,
           CAST(CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx
                AS DECIMAL(38,0)) AS VARCHAR) AS slope_den
    FROM s ORDER BY priority NULLS LAST
    """,
)
def a_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS TREND SLOPE in exact integer arithmetic: is order
    value drifting over time within each priority class?  Slope =
    (nΣxy − ΣxΣy) / (nΣxx − (Σx)²) — numerator and denominator are
    emitted SEPARATELY as exact BIGINTs (x = days since 1995-01-01,
    y = floored dollars), so the result is bit-deterministic with no
    float division to compare at all; the caller divides (or compares
    numerators cross-group at common denominators).  Spark's native
    regr_slope computes the same quantity in floating point — order-
    dependent across partitions, which is exactly why it can't be
    oracle-matched and this formulation can.

    Scale shape: one map-side-combinable aggregation (5 sums), one
    shuffle on the group key.  Magnitudes: |x|≤3e3, |y|≤6e5, so n·Σxy
    passes 2^63 near ~300k rows/group — the sf1 probe hit exactly that
    overflow — so the final combine rides exact DECIMAL(38,0) (good to
    ~1e31 rows/group; the per-row products and sums stay BIGINT).  The
    two cross-products are EMITTED AS CANONICAL STRINGS: DuckDB's
    DECIMAL(38,0) renders as exact Decimal via fetchall() but float64
    via the pandas fetch path (the r8 driver red row), so no final
    output column may be decimal-typed — VARCHAR of a scale-0 decimal
    is render-identical on every fetch path and exact at any
    magnitude (see tests/test_oracle_types.py)."""
    b = (
        load_table(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderdate").isNotNull()
            & F.col("o_totalprice").isNotNull()
        )
        .select(
            F.col("o_orderpriority").alias("pr"),
            F.datediff(
                F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date")
            )
            .cast("bigint")
            .alias("x"),
            F.floor("o_totalprice").cast("bigint").alias("y"),
        )
    )
    s = b.groupBy("pr").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    d19 = "decimal(19,0)"
    return s.select(
        F.col("pr").alias("priority"),
        "n",
        F.col("sx").cast("bigint").alias("sum_x"),
        F.col("sy").cast("bigint").alias("sum_y"),
        (
            F.col("n").cast(d19) * F.col("sxy").cast(d19)
            - F.col("sx").cast(d19) * F.col("sy").cast(d19)
        )
        .cast("decimal(38,0)")
        .cast("string")
        .alias("slope_num"),
        (
            F.col("n").cast(d19) * F.col("sxx").cast(d19)
            - F.col("sx").cast(d19) * F.col("sx").cast(d19)
        )
        .cast("decimal(38,0)")
        .cast("string")
        .alias("slope_den"),
    ).orderBy(F.col("priority").asc_nulls_last())


@register(
    "a_share_of_total",
    oracle=f"""
    WITH g AS (
      SELECT c.c_mktsegment AS segment,
             COUNT(*) AS cnt,
             SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_mktsegment
    ),
    t AS (SELECT SUM(rev) AS tot, SUM(cnt) AS n FROM g)
    SELECT g.segment, g.cnt,
           CAST(g.rev AS DOUBLE) AS revenue,
           CAST(g.rev AS DOUBLE) / CAST(t.tot AS DOUBLE) AS rev_share,
           CAST(g.cnt AS DOUBLE) / t.n AS cnt_share
    FROM g, t ORDER BY segment NULLS LAST
    """,
)
def a_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RATIO-TO-REPORT (Oracle's ratio_to_report / every BI tool's
    percent-of-total): each segment's revenue and order share of the
    grand total.  The naive form — a partition-less window SUM — funnels
    the whole aggregate through one reducer; this form aggregates per
    group first, then broadcasts the 1-row grand total back (a bounded
    crossJoin), so the fact table is touched once and nothing global is
    sorted.  Shares are exact-decimal sums with ONE double division each
    (numerator and denominator both decimal-exact before the cast), so
    both engines agree bit-for-bit.

    Scale shape: one fact⋈dim broadcast join, one group aggregation, one
    1-row total broadcast — the percent-of-total plan that survives any
    scale."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    g = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias(
                "rev"
            ),
        )
    )
    t = g.agg(
        F.sum("rev").alias("tot"), F.sum("cnt").alias("n")
    )
    return (
        g.crossJoin(F.broadcast(t))
        .select(
            "segment",
            "cnt",
            F.col("rev").cast("double").alias("revenue"),
            (
                F.col("rev").cast("double") / F.col("tot").cast("double")
            ).alias("rev_share"),
            (F.col("cnt").cast("double") / F.col("n")).alias("cnt_share"),
        )
        .orderBy(F.col("segment").asc_nulls_last())
    )


# --- scaling probe (r12 verdict task 1) --------------------------------------

_PROBE_REP = 48  # row replication factor
_PROBE_ITER = 3  # extra md5 chain rounds per replicated row


@register(
    "scale_probe_cpu",
    oracle=f"""
    SELECT COUNT(*) AS n_rows, MIN(h) AS min_h, MAX(h) AS max_h
    FROM (
      SELECT md5(md5(md5(md5(
               CAST(l_orderkey AS VARCHAR) || '|' ||
               CAST(l_linenumber AS VARCHAR) || '|' ||
               CAST(t.r AS VARCHAR))))) AS h
      FROM lineitem, range(0, {_PROBE_REP}) t(r)
    )
    HAVING MIN(h) IS NOT NULL
    """,
    headline=True,
)
def scale_probe_cpu(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-bound CPU scaling probe (r12 verdict task 1: give the driver's
    8-vs-32-core comparison something that CAN scale).  Every other headline
    query is fixed-overhead-bound at sf0.1 (12 of 14 run under 0.8 s), so
    per-query core-count ratios carry no signal and the driver's
    ``suspect_cpus_ignored`` heuristic fires even though the harness honors
    ``$SPARK_GRAFT_CPUS``.  This probe replicates every lineitem row
    {_PROBE_REP}x and drives an md5 chain per replica — ~90 core-seconds of
    embarrassingly parallel JVM hashing at sf0.1 whose wall-clock tracks
    1/cores — then reduces to ONE row (count + min/max hash), so a
    count-style action cannot prune the hash work and the DuckDB oracle
    checks every replica's digest.  Work is recomputed from the parquet
    input on every invocation (nothing cached, nothing persisted); rows
    scale linearly with the scale factor.

    This is a measurement instrument, not a reference operator: it exists
    so the committed c8/c32 bench artifacts show >=2x separation on at
    least one query, making the scaling contract auditable from the bench
    JSON alone."""
    from lakehouse_sfc_spark.sources.loader import compute_width

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber"
    )
    rep = (
        # spread the narrow scan over every core BEFORE the explode so the
        # hash chain parallelizes (same discipline as compute_width users)
        li.repartition(compute_width(spark))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.explode(
                F.sequence(F.lit(0), F.lit(_PROBE_REP - 1))
            ).alias("r"),
        )
    )
    h = F.md5(
        F.concat_ws(
            "|",
            F.col("l_orderkey").cast("string"),
            F.col("l_linenumber").cast("string"),
            F.col("r").cast("string"),
        )
    )
    for _ in range(_PROBE_ITER):
        h = F.md5(h)
    return (
        rep.select(h.alias("h"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("h").alias("min_h"),
            F.max("h").alias("max_h"),
        )
        # HAVING guard: a count-style action would otherwise column-prune
        # min_h/max_h out of the aggregate and the md5 chain with them —
        # the probe would measure nothing.  Tying row EXISTENCE to min_h
        # forces every digest to be computed under any action.  (Same
        # clause in the oracle; both sides drop the row on empty input.)
        .filter(F.col("min_h").isNotNull())
    )
