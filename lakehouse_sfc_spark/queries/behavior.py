"""Behavioural / event-sequence analytics over the events table — beyond
the reference (its engines stop at scans/joins/aggregates; these are the
sequence-aware queries a product-analytics or training-data pipeline runs
on the same event stream the streaming operators ingest).

Both queries are window-shaped: one hash shuffle on the partition key,
then order-within-partition work the sort-based window operator does
without further exchanges.  Nothing here collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_sfc_spark.queries.registry import register
from lakehouse_sfc_spark.sources.loader import load_table


@register(
    "a_funnel",
    oracle="""
    WITH s1 AS (
      SELECT user_id, ts, event_type,
             MIN(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id) AS t_view
      FROM events
    ),
    s2 AS (
      SELECT user_id, ts, event_type, t_view,
             MIN(CASE WHEN event_type = 'click' AND ts > t_view THEN ts END)
               OVER (PARTITION BY user_id) AS t_click
      FROM s1
    ),
    s3 AS (
      SELECT user_id, t_view, t_click,
             MIN(CASE WHEN event_type = 'purchase' AND ts > t_click THEN ts END)
               OVER (PARTITION BY user_id) AS t_purchase
      FROM s2
    ),
    per_user AS (
      SELECT user_id, MIN(t_view) AS t_view, MIN(t_click) AS t_click,
             MIN(t_purchase) AS t_purchase
      FROM s3 GROUP BY user_id
    )
    SELECT COUNT(*) AS n_users,
           COUNT(t_view) AS n_view,
           COUNT(t_click) AS n_click,
           COUNT(t_purchase) AS n_purchase,
           CAST(COUNT(t_click) AS DOUBLE) / COUNT(t_view) AS view_to_click,
           CAST(COUNT(t_purchase) AS DOUBLE) / COUNT(t_click) AS click_to_purchase
    FROM per_user
    """,
)
def a_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view -> click -> purchase: a user converts
    a stage only with an event STRICTLY AFTER the previous stage's first
    event (not merely having done both).  Computed as three chained
    unbounded window aggregates over ONE events scan — all three share the
    user_id hash partitioning, so the plan is one shuffle + one sort, and
    the per-stage "first qualifying timestamp" never leaves the executor.
    Conversion ratios are single double divisions of exact counts.

    At 100 TB this is the shape you want: no self-joins of the event log
    (the naive 3-way events-join is quadratic under hot users), state per
    user is O(1), and the final global rollup reduces 1 row per user."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    t = F.col("event_type")
    s1 = ev.select(
        "user_id",
        "ts",
        "event_type",
        F.min(F.when(t == "view", F.col("ts"))).over(w).alias("t_view"),
    )
    s2 = s1.withColumn(
        "t_click",
        F.min(
            F.when(
                (t == "click") & (F.col("ts") > F.col("t_view")), F.col("ts")
            )
        ).over(w),
    )
    s3 = s2.select(
        "user_id",
        "t_view",
        "t_click",
        F.min(
            F.when(
                (t == "purchase") & (F.col("ts") > F.col("t_click")),
                F.col("ts"),
            )
        )
        .over(w)
        .alias("t_purchase"),
    )
    per_user = s3.groupBy("user_id").agg(
        F.min("t_view").alias("t_view"),
        F.min("t_click").alias("t_click"),
        F.min("t_purchase").alias("t_purchase"),
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t_view").alias("n_view"),
        F.count("t_click").alias("n_click"),
        F.count("t_purchase").alias("n_purchase"),
        (F.count("t_click").cast("double") / F.count("t_view")).alias(
            "view_to_click"
        ),
        (F.count("t_purchase").cast("double") / F.count("t_click")).alias(
            "click_to_purchase"
        ),
    )


@register(
    "a_concurrent",
    oracle="""
    WITH bounds AS (
      SELECT ts AS t, 1 AS delta FROM events
      UNION ALL
      SELECT ts + INTERVAL 1 HOUR, -1 FROM events
    ),
    pts AS (
      SELECT CAST(t AS DATE) AS day, t, delta FROM bounds
    ),
    within AS (
      SELECT day, t,
             SUM(delta) OVER (PARTITION BY day ORDER BY t) AS cum_in_day
      FROM pts
    ),
    day_tot AS (
      SELECT day, SUM(delta) AS day_delta FROM pts GROUP BY day
    ),
    carry AS (
      SELECT day,
             SUM(day_delta) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
               PRECEDING AND 1 PRECEDING) AS offset_in
      FROM day_tot
    )
    SELECT w.day,
           CAST(MAX(COALESCE(c.offset_in, 0) + w.cum_in_day) AS BIGINT)
             AS max_concurrent
    FROM within w JOIN carry c ON w.day = c.day
    GROUP BY w.day
    ORDER BY w.day
    """,
)
def a_concurrent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency per day (each event holds a resource for 1 hour):
    the classic interval sweep-line, distributed.  Every interval emits a
    +1 at its start and a -1 at its end; the running sum of deltas at any
    instant is the live-interval count.

    The naive sweep is one global sort (SinglePartition — the thing this
    repo's plan guards exist to catch).  Instead the prefix sum is
    DECOMPOSED: deltas cumulate within each day under a day-hash
    partitioning (the default peer-inclusive RANGE frame makes equal-
    timestamp rows deterministic in both engines — no tie-break needed),
    and a second, tiny window over the per-day totals (one row per day)
    supplies each day's carry-in from all earlier days.  Same two-pass
    split as `build_update_batches_ranged` (layout/upsert.py): per-
    partition scan plus a prefix over partition aggregates, so it holds at
    1000 executors.  All arithmetic is integer — exact in both engines."""
    ev = load_table(spark, sf_dir, "events")
    starts = ev.select(F.col("ts").alias("t"), F.lit(1).alias("delta"))
    ends = ev.select(
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("t"),
        F.lit(-1).alias("delta"),
    )
    pts = starts.unionAll(ends).withColumn("day", F.col("t").cast("date"))
    w_day = Window.partitionBy("day").orderBy("t")
    within = pts.select(
        "day", "delta", F.sum("delta").over(w_day).alias("cum_in_day")
    )
    # ONE aggregate over the windowed frame yields BOTH per-day reductions
    # (the in-day peak and the day's net delta); its distribution
    # requirement is satisfied by the window's day-hash exchange, so the
    # whole data-sized pipeline is: 2 scans (one per union branch), one
    # exchange, one window, one agg.  Everything after is one row per day.
    per_day = within.groupBy("day").agg(
        F.max("cum_in_day").alias("peak_in_day"),
        F.sum("delta").alias("day_delta"),
    )
    w_carry = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, -1
    )
    return per_day.select(
        "day",
        (
            F.coalesce(F.sum("day_delta").over(w_carry), F.lit(0))
            + F.col("peak_in_day")
        ).alias("max_concurrent"),
    ).orderBy("day")


@register(
    "a_attribution",
    oracle="""
    WITH touched AS (
      SELECT user_id, ts, event_type, value,
             FIRST_VALUE(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS first_touch
      FROM events
    )
    SELECT first_touch,
           COUNT(*) AS n_purchases,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM touched
    WHERE event_type = 'purchase' AND value IS NOT NULL
    GROUP BY first_touch
    ORDER BY first_touch
    """,
)
def a_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution: every purchase's value is credited to the
    event type that STARTED its user's journey (FIRST_VALUE over the
    user's timeline, ties broken by event_id).  The acquisition-channel
    report, here with event_type standing in for the channel column.

    One shuffle on user_id feeds the window; the purchase filter cannot
    run before it (the first touch must see every event) but the
    projection is pruned to 4 columns, and the final rollup reduces to
    |event types| rows.  Revenue rides exact DECIMAL."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    touched = ev.select(
        "event_type",
        "value",
        F.first("event_type").over(w).alias("first_touch"),
    )
    return (
        touched.filter(
            (F.col("event_type") == "purchase") & F.col("value").isNotNull()
        )
        .groupBy("first_touch")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("first_touch")
    )


@register(
    "a_rolling_distinct",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    contrib AS (
      SELECT user_id, day + off AS day
      FROM ud, (SELECT UNNEST(ARRAY[0,1,2,3,4,5,6]) AS off)
    ),
    active_days AS (SELECT DISTINCT day FROM ud)
    SELECT c.day, COUNT(DISTINCT c.user_id) AS users_7d
    FROM contrib c
    JOIN active_days a ON c.day = a.day
    GROUP BY c.day
    ORDER BY c.day
    """,
)
def a_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling distinct users per day (weekly-active-users by day) —
    the metric COUNT(DISTINCT) OVER a RANGE frame cannot express scalably
    (distinct is not decomposable over sliding frames).

    The distributed form: dedup to (user, day) FIRST (the only data-sized
    shuffle), then each user-day contributes to exactly the 7 window
    endpoints it can influence — a bounded ×7 fanout of the REDUCED
    relation, never of the event log — and a per-day distinct count
    finishes.  Days with no activity are dropped (join against observed
    days), matching the oracle.  At 100 TB: event log → user-day is a
    massive reduction, the fanout is linear in it, and every stage is a
    key-equality shuffle."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    contrib = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.lit(0), F.lit(6))
        ).alias("off"),
        "day",
    ).select("user_id", F.date_add(F.col("day"), F.col("off")).alias("day"))
    active = ud.select("day").distinct()
    return (
        contrib.join(active, "day", "left_semi")
        .groupBy("day")
        .agg(F.count_distinct(F.col("user_id")).alias("users_7d"))
        .orderBy("day")
    )


@register(
    "a_rfm",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey,
             MAX(o_orderdate) AS last_order,
             COUNT(*) AS freq,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT o_custkey,
             NTILE(4) OVER (ORDER BY last_order, o_custkey) AS r,
             NTILE(4) OVER (ORDER BY freq, o_custkey) AS f,
             NTILE(4) OVER (ORDER BY monetary, o_custkey) AS m
      FROM per_cust
    )
    SELECT r, f, m, COUNT(*) AS n_customers
    FROM scored
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def a_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: customers quartiled by Recency (last order date),
    Frequency (order count) and Monetary value (exact-decimal spend), then
    counted per (r, f, m) cell — the classic marketing segmentation cube.

    The fact scan reduces to one row per customer before any ranking, so
    the three NTILE windows sort the REDUCED relation (|customers|, not
    |orders|); ties break on the customer key, making every quartile
    assignment deterministic in both engines.  Like w_ntile_batches, the
    oracle keeps the global-sort ntile contract; the distributed
    range-partition split (`build_update_batches_ranged`) is the proven
    100 TB path for the same operation."""
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("monetary"),
    )
    scored = per_cust.select(
        F.ntile(4)
        .over(Window.orderBy("last_order", "o_custkey"))
        .alias("r"),
        F.ntile(4).over(Window.orderBy("freq", "o_custkey")).alias("f"),
        F.ntile(4).over(Window.orderBy("monetary", "o_custkey")).alias("m"),
    )
    return (
        scored.groupBy("r", "f", "m")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("r", "f", "m")
    )


@register(
    "a_anomaly_mad",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS cnt
      FROM events GROUP BY 1
    ),
    med AS (
      SELECT cnt AS median_cnt FROM (
        SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt, day) AS rn,
               COUNT(*) OVER () AS n
        FROM daily
      ) WHERE rn = CEIL(0.5 * n)
    ),
    dev AS (
      SELECT d.day, d.cnt, ABS(d.cnt - m.median_cnt) AS dv, m.median_cnt
      FROM daily d CROSS JOIN med m
    ),
    mad AS (
      SELECT dv AS mad FROM (
        SELECT dv, ROW_NUMBER() OVER (ORDER BY dv, day) AS rn,
               COUNT(*) OVER () AS n
        FROM dev
      ) WHERE rn = CEIL(0.5 * n)
    )
    SELECT COUNT(*) AS n_days,
           MIN(d.median_cnt) AS median_cnt,
           MIN(mad.mad) AS mad,
           COUNT(*) FILTER (WHERE d.dv > 3 * mad.mad) AS n_anomalous,
           MAX(d.cnt) AS max_cnt
    FROM dev d CROSS JOIN mad
    """,
)
def a_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection on the daily event volume: days whose
    count deviates from the median by more than 3× the median absolute
    deviation — the MAD rule, the robust-statistics alternative to
    z-scores for monitoring pipeline throughput.  Counts, medians (exact
    type-1 ranks with day tie-breaks), deviations and the 3×MAD threshold
    are ALL integers — nothing to round, bit-identical in both engines.

    Shape: the event log reduces to one row per day first (the only
    data-sized aggregation); both median ranks and the final audit run on
    the ~|days| relation, so the global rank windows sort thousands of
    rows, not the log."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("cnt")
    )

    def _median(df: DataFrame, col: str, tie: str, out: str) -> DataFrame:
        w = Window.orderBy(col, tie)
        ranked = df.select(
            F.col(col),
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
        )
        return ranked.filter(
            F.col("rn") == F.ceil(0.5 * F.col("n"))
        ).select(F.col(col).alias(out))

    med = _median(daily, "cnt", "day", "median_cnt")
    dev = daily.crossJoin(F.broadcast(med)).select(
        "day",
        "cnt",
        "median_cnt",
        F.abs(F.col("cnt") - F.col("median_cnt")).alias("dv"),
    )
    mad = _median(dev, "dv", "day", "mad")
    return (
        dev.crossJoin(F.broadcast(mad))
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.min("median_cnt").alias("median_cnt"),
            F.min("mad").alias("mad"),
            F.count(
                F.when(F.col("dv") > 3 * F.col("mad"), 1)
            ).alias("n_anomalous"),
            F.max("cnt").alias("max_cnt"),
        )
    )


@register(
    "a_path_mining",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type,
             LEAD(event_type, 1) OVER w AS e2,
             LEAD(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    paths AS (
      SELECT event_type || '>' || e2 || '>' || e3 AS path, COUNT(*) AS cnt
      FROM ordered WHERE e3 IS NOT NULL
      GROUP BY 1
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY cnt DESC, path) AS rk
      FROM paths
    )
    SELECT path, cnt, rk FROM ranked WHERE rk <= 10 ORDER BY rk
    """,
)
def a_path_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioural path mining: the 10 most common 3-event sequences across
    all user timelines (the n-gram trick applied to event streams — what
    journey-analysis and next-action models train on).  LEAD over the
    per-user window generates each consecutive triple in one pass — one
    user_id shuffle, no event-log self-joins (a (ts, ts+1, ts+2) 3-way
    join would shuffle the log three times and melt under hot users).
    The global top-10 is TakeOrdered over the ≤|event types|³ counted
    relation; ranking happens after the limit, on 10 rows."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    paths = (
        ordered.select(
            F.concat_ws(">", "event_type", "e2", "e3").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    top = paths.orderBy(F.desc("cnt"), "path").limit(10)
    w_rank = Window.orderBy(F.desc("cnt"), "path")
    return top.withColumn("rk", F.row_number().over(w_rank)).orderBy("rk")


@register(
    "w_streak",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    isl AS (
      SELECT user_id, day,
             day - CAST(ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY day
             ) AS INTEGER) AS grp
      FROM ud
    ),
    streaks AS (
      SELECT user_id, COUNT(*) AS len FROM isl GROUP BY user_id, grp
    ),
    best AS (
      SELECT user_id, MAX(len) AS best_streak FROM streaks GROUP BY user_id
    )
    SELECT best_streak, COUNT(*) AS n_users
    FROM best GROUP BY best_streak ORDER BY best_streak
    """,
)
def w_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user, reported as a
    streak-length histogram — the gaps-and-islands pattern (day minus its
    per-user rank is constant exactly within a consecutive run).  All
    integer arithmetic; the event log reduces to distinct user-days first,
    then every stage shares the user_id partitioning: the rank window, the
    island groupBy and the per-user max pipeline into one shuffle, and the
    final histogram reduces to a handful of rows."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    isl = ud.select(
        "user_id",
        F.date_sub(
            F.col("day"), F.row_number().over(w)
        ).alias("grp"),
    )
    streaks = isl.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("len")
    )
    best = streaks.groupBy("user_id").agg(F.max("len").alias("best_streak"))
    return (
        best.groupBy("best_streak")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("best_streak")
    )


@register(
    "a_drill_across",
    oracle="""
    WITH ev AS (
      SELECT c.c_mktsegment,
             COUNT(DISTINCT e.user_id) AS n_active_users,
             COUNT(*) AS n_events,
             CAST(SUM(CASE WHEN e.event_type = 'purchase'
                           THEN CAST(e.value AS DECIMAL(18,4)) END)
                  AS DOUBLE) AS event_purchase_value
      FROM events e JOIN customer c ON e.user_id = c.c_custkey
      GROUP BY 1
    ),
    ord AS (
      SELECT c.c_mktsegment,
             COUNT(*) AS n_orders,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS order_revenue
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1
    )
    SELECT ev.c_mktsegment, n_active_users, n_events,
           event_purchase_value, n_orders, order_revenue
    FROM ev JOIN ord ON ev.c_mktsegment = ord.c_mktsegment
    ORDER BY ev.c_mktsegment
    """,
)
def a_drill_across(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drill-across: TWO fact tables (the clickstream and the order book)
    conformed through one dimension (customer → market segment) and
    compared side by side — the multi-fact report shape conformed-
    dimension warehouses exist for.  Each fact aggregates INDEPENDENTLY to
    the segment grain before the facts meet (never fact⋈fact on raw rows —
    that join would be a many-to-many explosion); the final join is 5 rows
    ⋈ 5 rows.  The customer dim broadcasts into both pipelines."""
    ev = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    ev_agg = (
        ev.join(F.broadcast(c), ev.user_id == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count_distinct(F.col("user_id")).alias("n_active_users"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.col("value").cast("decimal(18,4)"),
                )
            )
            .cast("double")
            .alias("event_purchase_value"),
        )
    )
    ord_agg = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("order_revenue"),
        )
    )
    return ev_agg.join(ord_agg, "c_mktsegment").orderBy("c_mktsegment")


@register(
    "a_mom_growth",
    oracle="""
    WITH monthly AS (
      SELECT c.c_mktsegment,
             CAST(DATE_TRUNC('month', o.o_orderdate) AS DATE) AS month,
             COUNT(*) AS n_orders,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    )
    SELECT c_mktsegment, month, n_orders, revenue,
           revenue - LAG(revenue) OVER w AS revenue_delta,
           n_orders - LAG(n_orders) OVER w AS orders_delta
    FROM monthly
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY month)
    ORDER BY c_mktsegment, month
    """,
)
def a_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month growth per segment: a LAG window over the ALREADY
    AGGREGATED monthly series — the two-level shape every KPI dashboard
    compiles to, and the one worth getting right at scale: the window
    never sees fact rows, only |segments|×|months| aggregates, and its
    partitioning is a subset of the aggregation's grouping so no second
    data-sized exchange is needed.  Revenue rides exact decimals; the
    deltas are single double subtractions — deterministic IEEE ops."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    monthly = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            "c_mktsegment",
            F.date_trunc("month", F.col("o_orderdate"))
            .cast("date")
            .alias("month"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )
    w = Window.partitionBy("c_mktsegment").orderBy("month")
    return monthly.select(
        "c_mktsegment",
        "month",
        "n_orders",
        "revenue",
        (F.col("revenue") - F.lag("revenue").over(w)).alias("revenue_delta"),
        (F.col("n_orders") - F.lag("n_orders").over(w)).alias("orders_delta"),
    ).orderBy("c_mktsegment", "month")


@register(
    "a_session_funnel",
    oracle="""
    WITH o AS (
      SELECT user_id, ts, event_id, event_type,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_ts
      FROM events
    ),
    marked AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN prev_ts IS NULL
                       OR ts - prev_ts > INTERVAL 30 MINUTES
                  THEN 1 ELSE 0 END AS is_start
      FROM o
    ),
    sess AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    ),
    per_sess AS (
      SELECT user_id, sid,
             COUNT(*) AS n_events,
             MIN(CASE WHEN event_type = 'click'
                      THEN ROW(ts, event_id) END) AS first_click,
             MAX(CASE WHEN event_type = 'purchase'
                      THEN ROW(ts, event_id) END) AS last_purchase
      FROM sess GROUP BY 1, 2
    )
    SELECT COUNT(*) AS n_sessions,
           CAST(COUNT(first_click) AS BIGINT) AS n_with_click,
           CAST(COUNT(last_purchase) AS BIGINT) AS n_with_purchase,
           CAST(COUNT(CASE WHEN first_click IS NOT NULL
                            AND last_purchase IS NOT NULL
                            AND first_click < last_purchase THEN 1 END)
                AS BIGINT) AS n_converted,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           CAST(COUNT(CASE WHEN first_click IS NOT NULL
                            AND last_purchase IS NOT NULL
                            AND first_click < last_purchase THEN 1 END)
                AS DOUBLE) / COUNT(first_click) AS conversion_rate
    FROM per_sess
    """,
)
def a_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SESSION-scoped funnel conversion — the composition a product
    analyst actually asks for: of the 30-minute-gap sessions that contain
    a click, how many convert to a purchase LATER IN THE SAME SESSION
    (a_funnel's lifetime-scoped cousin).  "Later" compares the full
    (ts, event_id) tuple, so same-timestamp orderings are deterministic
    in both engines; existence-of-ordered-pair reduces to
    min(click keys) < max(purchase keys) — two struct extremes per
    session, no per-pair work.

    Scale shape: ONE user_id shuffle feeds the gap window, the session
    window, and the per-session aggregate (same partitioning); the final
    reduction is a single row."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    marked = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            F.lag("ts").over(w).isNull()
            | (us - F.lag(us).over(w) > 30 * 60 * 1_000_000),
            1,
        )
        .otherwise(0)
        .alias("is_start"),
    )
    sess = marked.withColumn(
        "sid",
        F.sum("is_start").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    key = F.struct(F.col("ts"), F.col("event_id"))
    per_sess = sess.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(F.when(F.col("event_type") == "click", key)).alias(
            "first_click"
        ),
        F.max(F.when(F.col("event_type") == "purchase", key)).alias(
            "last_purchase"
        ),
    )
    converted = (
        F.col("first_click").isNotNull()
        & F.col("last_purchase").isNotNull()
        & (F.col("first_click") < F.col("last_purchase"))
    )
    return per_sess.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.count("first_click").alias("n_with_click"),
        F.count("last_purchase").alias("n_with_purchase"),
        F.count(F.when(converted, 1)).alias("n_converted"),
        F.sum("n_events").alias("n_events"),
        (
            F.count(F.when(converted, 1)).cast("double")
            / F.count("first_click")
        ).alias("conversion_rate"),
    )
