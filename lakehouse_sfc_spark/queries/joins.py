"""Join surface (SURVEY.md §2.3): fact-dim equi joins (broadcast), multi-table
chains, semi/anti joins.  Catalyst picks broadcast-hash for small dims; we
hint explicitly where the dim side is known-small so the plan is stable at
any scale.

Reference parity: Template D fact-dim join (wlg/templates/sql.py:75-109),
TPC-H dbgen stream joins (tpch_all_runner.py:168-169), broadcast control
(run_queries.py:717-725).
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


@register(
    "j_fact_dim",
    oracle=f"""
    SELECT c.c_mktsegment AS mktsegment,
           COUNT(*) AS cnt,
           {sql_dsum("o.o_totalprice", "sum_price")}
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_acctbal > 1000
    GROUP BY c.c_mktsegment
    """,
    headline=True,
)
def j_fact_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template D: fact ⋈ dim with a dim-side filter.  Dim is broadcast —
    zero shuffle of the fact table (wlg/templates/sql.py:75-109)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 1000)
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "inner")
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("o_totalprice", "sum_price"))
    )


@register(
    "j_multi3",
    oracle=f"""
    SELECT c.c_mktsegment AS mktsegment,
           n.n_name AS nation,
           COUNT(*) AS cnt,
           {sql_dsum("l.l_extendedprice * (1 - l.l_discount)", "revenue", 6)}
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY 1, 2
    """,
    headline=True,
)
def j_multi3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3/Q5-style 4-table chain.  lineitem⋈orders shuffles on the
    shared orderkey; customer and nation broadcast.  The date filter sits on
    orders BEFORE the join so the big shuffle only carries matching rows."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01"))
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("c_mktsegment").alias("mktsegment"), F.col("n_name").alias("nation")
        )
        .agg(F.count(F.lit(1)).alias("cnt"), dsum(revenue, "revenue", 6))
    )


@register(
    "j_semi",
    oracle="""
    SELECT COUNT(*) AS cnt
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000
    )
    """,
)
def j_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join = EXISTS subquery (TPC-H Q4 shape in dbgen streams)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").agg(
        F.count(F.lit(1)).alias("cnt")
    )


@register(
    "j_anti",
    oracle="""
    SELECT COUNT(*) AS cnt
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
    )
    """,
)
def j_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join = NOT EXISTS (TPC-H Q22 shape in dbgen streams)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").agg(
        F.count(F.lit(1)).alias("cnt")
    )


@register(
    "j_part_supp",
    oracle=f"""
    SELECT p.p_brand AS brand,
           COUNT(*) AS cnt,
           {sql_davg("l.l_extendedprice", "avg_price")}
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    WHERE p.p_size >= 20 AND s.s_acctbal >= 0
    GROUP BY p.p_brand
    """,
)
def j_part_supp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two independent broadcast dims on one fact — a single stage, no fact
    shuffle at all (both dims tiny)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") >= 20)
    s = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") >= 0)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(F.count(F.lit(1)).alias("cnt"), davg("l_extendedprice", "avg_price"))
    )


@register(
    "j_asof_nearest",
    oracle="""
    WITH ev AS (
      SELECT * FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ),
    m AS (
      SELECT user_id, ts, value FROM (
        SELECT user_id, ts, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                  ORDER BY event_id DESC) AS rn
        FROM ev WHERE event_type = 'purchase'
      ) WHERE rn = 1
    ),
    u AS (
      SELECT user_id AS k, ts, 0 AS is_dim, event_type,
             NULL::STRUCT(m_ts TIMESTAMP, m_value DOUBLE) AS rec
      FROM ev
      UNION ALL
      SELECT user_id, ts, 1, NULL,
             struct_pack(m_ts := ts, m_value := value)
                 ::STRUCT(m_ts TIMESTAMP, m_value DOUBLE)
      FROM m
    ),
    c AS (
      SELECT event_type, ts, is_dim,
             last_value(rec IGNORE NULLS) OVER (
               PARTITION BY k ORDER BY ts ASC, is_dim DESC
               ROWS UNBOUNDED PRECEDING) AS back,
             last_value(rec IGNORE NULLS) OVER (
               PARTITION BY k ORDER BY ts DESC, is_dim DESC
               ROWS UNBOUNDED PRECEDING) AS fwd
      FROM u
    ),
    r AS (
      SELECT event_type,
             epoch_us(ts) - epoch_us(back.m_ts) AS bgap,
             epoch_us(fwd.m_ts) - epoch_us(ts) AS fgap,
             back.m_ts IS NOT NULL AS hasb,
             fwd.m_ts IS NOT NULL AS hasf,
             back.m_value AS bval,
             fwd.m_value AS fval
      FROM c WHERE is_dim = 0
    ),
    x AS (
      SELECT event_type,
             CASE WHEN hasb AND (NOT hasf OR bgap <= fgap) THEN 'b'
                  WHEN hasf THEN 'f' ELSE 'n' END AS ch,
             CASE WHEN hasb AND (NOT hasf OR bgap <= fgap) THEN bgap
                  WHEN hasf THEN fgap END AS gap_us,
             CASE WHEN hasb AND (NOT hasf OR bgap <= fgap) THEN bval
                  WHEN hasf THEN fval END AS mval
      FROM r
    )
    SELECT event_type,
           COUNT(*) AS cnt,
           CAST(SUM(CASE WHEN ch = 'b' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_back,
           CAST(SUM(CASE WHEN ch = 'f' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_fwd,
           CAST(SUM(CASE WHEN ch = 'n' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_none,
           CAST(COALESCE(SUM(gap_us), 0) AS BIGINT) AS gap_us_total,
           CAST(SUM(CAST(mval AS DECIMAL(18,4))) AS DOUBLE)
               AS matched_value_sum
    FROM x GROUP BY event_type ORDER BY event_type NULLS LAST
    """,
)
def j_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-match as-of join (kdb's ``aj`` nearest / QuestDB's natural
    variant): each event matches the purchase marker closest in time in
    EITHER direction, ties preferring the backward match.  Same one-shuffle
    composition as j_asof — tag, union, keyed window — run in BOTH time
    orders over the SAME hash partitioning (one exchange, two in-partition
    sorts; at 100 TB the second sort is the only extra cost), then an
    integer-microsecond comparison picks the nearer side.  NULL ts/user
    rows are excluded on both sides (window partitioning would pair NULL
    users that SQL equality never joins); gap arithmetic is exact BIGINT
    micros; value sums go through DECIMAL (registry.dsum discipline)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    marker = (
        ev.filter(F.col("event_type") == "purchase")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id", "ts").orderBy(
                    F.col("event_id").desc()
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select("user_id", "ts", "value")
    )
    rec_t = "struct<m_ts:timestamp,m_value:double>"
    facts = ev.select(
        F.col("user_id").alias("k"),
        "ts",
        F.lit(0).alias("is_dim"),
        "event_type",
        F.lit(None).cast(rec_t).alias("rec"),
    )
    dims = marker.select(
        F.col("user_id").alias("k"),
        "ts",
        F.lit(1).alias("is_dim"),
        F.lit(None).cast("string").alias("event_type"),
        F.struct(
            F.col("ts").alias("m_ts"), F.col("value").alias("m_value")
        ).alias("rec"),
    )
    wb = (
        Window.partitionBy("k")
        .orderBy(F.col("ts").asc(), F.col("is_dim").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("k")
        .orderBy(F.col("ts").desc(), F.col("is_dim").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = (
        facts.unionByName(dims)
        .withColumn("back", F.last("rec", ignorenulls=True).over(wb))
        .withColumn("fwd", F.last("rec", ignorenulls=True).over(wf))
        .filter(F.col("is_dim") == 0)
    )
    bgap = F.expr("timestampdiff(MICROSECOND, back.m_ts, ts)")
    fgap = F.expr("timestampdiff(MICROSECOND, ts, fwd.m_ts)")
    hasb = F.col("back.m_ts").isNotNull()
    hasf = F.col("fwd.m_ts").isNotNull()
    pick_b = hasb & (~hasf | (bgap <= fgap))
    x = u.select(
        "event_type",
        F.when(pick_b, F.lit("b"))
        .when(hasf, F.lit("f"))
        .otherwise(F.lit("n"))
        .alias("ch"),
        F.when(pick_b, bgap).when(hasf, fgap).alias("gap_us"),
        F.when(pick_b, F.col("back.m_value"))
        .when(hasf, F.col("fwd.m_value"))
        .alias("mval"),
    )
    return (
        x.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.when(F.col("ch") == "b", 1).otherwise(0))
            .cast("bigint")
            .alias("n_back"),
            F.sum(F.when(F.col("ch") == "f", 1).otherwise(0))
            .cast("bigint")
            .alias("n_fwd"),
            F.sum(F.when(F.col("ch") == "n", 1).otherwise(0))
            .cast("bigint")
            .alias("n_none"),
            F.coalesce(F.sum("gap_us"), F.lit(0))
            .cast("bigint")
            .alias("gap_us_total"),
            F.sum(F.col("mval").cast("decimal(18,4)"))
            .cast("double")
            .alias("matched_value_sum"),
        )
        .orderBy(F.col("event_type").asc_nulls_last())
    )


@register(
    "j_asof",
    oracle=f"""
    WITH m AS (
      SELECT user_id, ts, value,
             ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                ORDER BY event_id DESC) AS rn
      FROM events WHERE event_type = 'purchase'
    ), marker AS (SELECT user_id, ts, value FROM m WHERE rn = 1)
    SELECT e.event_type AS event_type,
           COUNT(*) AS cnt,
           COUNT(mk.value) AS n_matched,
           {sql_davg("mk.value", "avg_purchase", 4)}
    FROM events e
    ASOF LEFT JOIN marker mk
      ON e.user_id = mk.user_id AND e.ts >= mk.ts
    GROUP BY 1
    """,
)
def j_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join — an operator Spark's join surface lacks natively,
    expressed as the canonical distributed composition: tag dim (marker) and
    fact rows, union, then one keyed window pass carrying the latest
    non-null dim value forward in time order.  Exactly ONE shuffle (hash on
    the join key) regardless of either side's size — no range join, no
    per-row probe — so it scales to a 100 TB fact stream; a skewed key would
    be salted into time sub-ranges, composing with operators/skew.py.

    Semantics: every event picks up the value of the same user's most
    recent 'purchase' event with marker.ts <= event.ts (inclusive: at equal
    timestamps the marker sorts first).  Markers are deduplicated per
    (user, ts) by max event_id so the pick is deterministic in both engines;
    the DuckDB oracle is a native ASOF LEFT JOIN over the same deduped
    marker relation."""
    ev = load_table(spark, sf_dir, "events")
    marker = (
        ev.filter(F.col("event_type") == "purchase")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id", "ts").orderBy(
                    F.col("event_id").desc()
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select("user_id", "ts", F.col("value").alias("m_value"))
    )
    facts_tagged = ev.select(
        F.col("user_id").alias("k"),
        "ts",
        F.lit(0).alias("is_dim"),
        "event_type",
        F.lit(None).cast("struct<m_value:double>").alias("m_rec"),
    )
    # Markers carry a STRUCT wrapper, not the bare value: a marker row whose
    # value is NULL must still shadow older markers (the ASOF oracle matches
    # the latest marker and yields NULL), but last(ignorenulls) over the bare
    # column would skip it and carry an older purchase's value.
    dims_tagged = marker.select(
        F.col("user_id").alias("k"),
        "ts",
        F.lit(1).alias("is_dim"),
        F.lit(None).cast("string").alias("event_type"),
        F.struct(F.col("m_value")).alias("m_rec"),
    )
    w = (
        Window.partitionBy("k")
        .orderBy(F.col("ts").asc(), F.col("is_dim").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = facts_tagged.unionByName(dims_tagged).withColumn(
        "carried", F.last("m_rec", ignorenulls=True).over(w)["m_value"]
    )
    return (
        carried.filter(F.col("is_dim") == 0)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.count("carried").alias("n_matched"),
            davg("carried", "avg_purchase", 4),
        )
    )


@register(
    "j_range",
    oracle="""
    SELECT e.event_type AS event_type,
           COUNT(*) AS cnt_pairs,
           COUNT(DISTINCT e.event_id) AS n_events
    FROM events e
    JOIN (SELECT user_id, ts AS lo, ts + INTERVAL 5 MINUTE AS hi
          FROM events WHERE event_type = 'error') w
      ON e.user_id = w.user_id AND e.ts >= w.lo AND e.ts < w.hi
    GROUP BY 1
    """,
)
def j_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval-containment) join without a range-join operator:
    which events fall inside the 5-minute window after any same-user error?

    Scale shape: the naive plan for ``a.key = b.key AND b.lo <= a.ts <
    b.hi`` keeps the inequality out of the hash join key, which is fine per
    key until a key is hot.  This implementation adds *time-bucket
    blocking*: each interval is exploded to the (at most 2) hour buckets it
    overlaps (bucket width >= interval length), and the join key becomes
    (user, hour_bucket) equality — a plain hash shuffle join whose per-key
    groups are bounded by time locality, with the exact containment
    predicate applied as a post-filter.  An event lives in exactly one
    bucket, so no (event, interval) pair can match twice — no dedup stage.
    Plan-guarded: no BroadcastNestedLoopJoin/CartesianProduct."""
    ev = load_table(spark, sf_dir, "events")
    win = (
        ev.filter(F.col("event_type") == "error")
        .select(
            F.col("user_id").alias("w_user"),
            F.col("ts").alias("lo"),
            (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("hi"),
        )
        .withColumn(
            "bucket",
            F.explode(
                F.array_distinct(
                    F.array(
                        F.date_trunc("hour", F.col("lo")),
                        F.date_trunc("hour", F.col("hi")),
                    )
                )
            ),
        )
    )
    probe = ev.withColumn("bucket", F.date_trunc("hour", F.col("ts")))
    return (
        probe.join(
            win,
            on=[
                probe["user_id"] == win["w_user"],
                probe["bucket"] == win["bucket"],
                probe["ts"] >= win["lo"],
                probe["ts"] < win["hi"],
            ],
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt_pairs"),
            F.count_distinct(F.col("event_id")).alias("n_events"),
        )
    )


@register(
    "j_skew_salted",
    oracle=f"""
    SELECT o.o_orderpriority,
           {sql_dsum('l.l_extendedprice', 'revenue')},
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def j_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join executed through the explicit salting operator
    (operators/skew.py::salted_join, factor 8): each l_orderkey's rows
    spread over 8 shuffle tasks, the orders side replicated once per salt.
    The RESULT is identical to the plain join (the salt column is internal
    and dropped) — which is exactly what the oracle checks: salting must be
    a pure physical rewrite.

    This is the driver-visible proof of the skew path the brief's scale
    checklist requires ("skewed keys hurt ... salting for skew"): on a
    1000-executor cluster one hot order key (or a hot date/tenant key in a
    real log) caps a plain shuffle join at single-task speed; the salted
    plan bounds any key's share of work at 1/8 of a task's input per
    occurrence.  AQE's skew-join split handles most of this at runtime —
    salting is the planner-independent fallback for a single pathological
    key."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    from lakehouse_sfc_spark.operators.skew import salted_join

    # Pin the shuffle-hash strategy: at bench SF the orders side fits the
    # broadcast threshold and Catalyst would broadcast it — which never
    # needs salting in the first place.  The operator exists for the
    # too-big-to-broadcast case, so the demo exercises that shape.
    joined = salted_join(li, o.hint("shuffle_hash"), on="l_orderkey", factor=8)
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            dsum("l_extendedprice", "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("o_orderpriority")
    )


_SCD2_VERSIONS = (
    # (version, filter-mod, balance-delta, valid_from) — deterministic SCD2
    # history derived from the base customer table, identical in both
    # engines: v0 covers everyone from the epoch; later versions apply to
    # key subsets from their effective dates.
    (0, 1, 0.0, "1992-01-01"),
    (1, 5, 100.0, "1996-07-01"),
    (2, 7, 200.0, "1997-06-01"),
)


@register(
    "j_scd2_pit",
    oracle=f"""
    WITH dim AS (
      {" UNION ALL ".join(
          f"SELECT c_custkey, {v} AS version, c_acctbal + {d} AS balance, "
          f"TIMESTAMP '{vf} 00:00:00' AS valid_from "
          f"FROM customer WHERE c_custkey % {m} = 0"
          for v, m, d, vf in _SCD2_VERSIONS
      )}
    ),
    scd AS (
      SELECT c_custkey, version, balance, valid_from,
             LEAD(valid_from) OVER (
               PARTITION BY c_custkey ORDER BY valid_from
             ) AS valid_to
      FROM dim
    )
    SELECT s.version,
           COUNT(*) AS n_orders,
           {sql_dsum('o.o_totalprice', 'revenue')},
           {sql_davg('s.balance', 'avg_balance')}
    FROM orders o
    JOIN scd s
      ON o.o_custkey = s.c_custkey
     AND o.o_orderdate >= s.valid_from
     AND (s.valid_to IS NULL OR o.o_orderdate < s.valid_to)
    GROUP BY s.version
    ORDER BY s.version
    """,
)
def j_scd2_pit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 point-in-time join: every order joins the customer dimension
    VERSION that was valid on its order date (slowly-changing-dimension
    type 2 — the canonical lakehouse dimension-history query; Delta/Hudi
    docs model it with MERGE + valid_from/valid_to ranges).

    The oracle does the textbook interval join (valid_from <= d <
    valid_to via LEAD).  The Spark side does NOT build intervals at all:
    it reuses the as-of carry — union version rows and fact rows, one
    hash shuffle on the customer key, one window pass carrying the latest
    effective version forward in time order.  Interval construction,
    range predicates, and their skew (hot customers × many versions)
    disappear; the plan is the same single-shuffle shape as `j_asof` at
    any fact size.  A version effective exactly on the order date applies
    (dim rows sort before facts at equal timestamps)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")

    # Round 13: the three version legs used to be three filtered scans of
    # customer glued with UNION ALL; one scan + a per-row explode of the
    # (version, modulus, delta, valid_from) literals produces the same rows
    # from a single pass (guide §2.4 — remove redundant work; the modulus
    # filter runs per 3-element literal array, not per scan).  Values are
    # identical: same % predicate, same c_acctbal + delta double add.
    vers = F.array(
        *[
            F.struct(
                F.lit(v).alias("version"),
                F.lit(m).alias("m"),
                F.lit(d).alias("delta"),
                F.lit(f"{vf} 00:00:00").cast("timestamp").alias("ts"),
            )
            for v, m, d, vf in _SCD2_VERSIONS
        ]
    )
    dims = c.select(
        "c_custkey",
        "c_acctbal",
        F.explode(
            F.filter(vers, lambda x: F.col("c_custkey") % x["m"] == 0)
        ).alias("vx"),
    ).select(
        F.col("c_custkey").alias("k"),
        F.col("vx.ts").alias("ts"),
        F.lit(1).alias("is_dim"),
        F.lit(None).cast("double").alias("price"),
        F.struct(
            F.col("vx.version").alias("version"),
            (F.col("c_acctbal") + F.col("vx.delta")).alias("balance"),
        ).alias("rec"),
    )

    facts = o.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").cast("timestamp").alias("ts"),
        F.lit(0).alias("is_dim"),
        F.col("o_totalprice").alias("price"),
        F.lit(None).cast(
            "struct<version:int,balance:double>"
        ).alias("rec"),
    )
    w = (
        Window.partitionBy("k")
        .orderBy(F.col("ts").asc(), F.col("is_dim").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = dims.unionByName(facts).withColumn(
        "cur", F.last("rec", ignorenulls=True).over(w)
    )
    return (
        carried.filter((F.col("is_dim") == 0) & F.col("cur").isNotNull())
        .select(
            F.col("cur.version").alias("version"),
            "price",
            F.col("cur.balance").alias("balance"),
        )
        .groupBy("version")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("price", "revenue"),
            davg("balance", "avg_balance"),
        )
        .orderBy("version")
    )


@register(
    "j_asof_tolerance",
    oracle=f"""
    WITH m AS (
      SELECT user_id, ts, value,
             ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                ORDER BY event_id DESC) AS rn
      FROM events WHERE event_type = 'purchase'
    ), marker AS (SELECT user_id, ts, value FROM m WHERE rn = 1),
    picked AS (
      SELECT e.event_type, e.ts AS e_ts, mk.ts AS m_ts, mk.value AS m_value
      FROM events e
      ASOF LEFT JOIN marker mk
        ON e.user_id = mk.user_id AND e.ts >= mk.ts
    )
    SELECT event_type,
           COUNT(*) AS cnt,
           COUNT(CASE WHEN m_ts >= e_ts - INTERVAL 2 HOUR
                      THEN 1 END) AS n_fresh,
           {sql_davg(
               "CASE WHEN m_ts >= e_ts - INTERVAL 2 HOUR THEN m_value END",
               "avg_fresh", 4)}
    FROM picked
    GROUP BY 1
    """,
)
def j_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join with a STALENESS BOUND — the feature-store contract: an
    event may only use the latest same-user purchase if it is at most 2
    hours old, otherwise the feature is NULL (never silently falls back to
    an even older value).  Same single-shuffle union+window composition as
    ``j_asof``; the carried struct keeps the marker's timestamp alongside
    its value so the tolerance check applies AFTER the as-of pick —
    matching ASOF-then-filter semantics exactly.

    Scale shape: identical to j_asof — one hash shuffle on user_id, one
    window pass, no range join, no per-row probes."""
    ev = load_table(spark, sf_dir, "events")
    marker = (
        ev.filter(F.col("event_type") == "purchase")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id", "ts").orderBy(
                    F.col("event_id").desc()
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select("user_id", "ts", F.col("value").alias("m_value"))
    )
    facts_tagged = ev.select(
        F.col("user_id").alias("k"),
        "ts",
        F.lit(0).alias("is_dim"),
        "event_type",
        F.lit(None)
        # NTZ, not LTZ: events.ts loads as TIMESTAMP_NTZ, and an LTZ struct
        # member would make unionByName coerce the whole column through the
        # SESSION TIMEZONE — under a non-UTC driver session the 2h freshness
        # compare then crosses DST transitions differently from the pure-NTZ
        # oracle arithmetic (1995 spring-forward wall times flip the verdict)
        .cast("struct<m_ts:timestamp_ntz,m_value:double>")
        .alias("m_rec"),
    )
    dims_tagged = marker.select(
        F.col("user_id").alias("k"),
        "ts",
        F.lit(1).alias("is_dim"),
        F.lit(None).cast("string").alias("event_type"),
        F.struct(
            F.col("ts").alias("m_ts"), F.col("m_value")
        ).alias("m_rec"),
    )
    w = (
        Window.partitionBy("k")
        .orderBy(F.col("ts").asc(), F.col("is_dim").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = facts_tagged.unionByName(dims_tagged).withColumn(
        "c_rec", F.last("m_rec", ignorenulls=True).over(w)
    )
    # n_fresh counts every within-tolerance marker match, value-NULL or not
    # (the oracle's CASE tests m_ts only), so the freshness test and the
    # carried value are separate columns.
    is_fresh = F.col("c_rec.m_ts") >= F.col("ts") - F.expr("INTERVAL 2 HOURS")
    return (
        carried.filter(F.col("is_dim") == 0)
        .withColumn("is_fresh", is_fresh)
        .withColumn(
            "fresh_value", F.when(F.col("is_fresh"), F.col("c_rec.m_value"))
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.count(F.when(F.col("is_fresh"), 1)).alias("n_fresh"),
            davg("fresh_value", "avg_fresh", 4),
        )
    )


_IO_LO = "1996-01-01"
_IO_HI = "1996-07-01"


@register(
    "j_interval_overlap",
    oracle=f"""
    WITH base AS (
        SELECT l_suppkey AS suppkey,
               CAST(l_shipdate AS DATE) AS s,
               CAST(l_shipdate
                    + (CAST(FLOOR(l_quantity) AS INTEGER) % 30 + 1)
                      * INTERVAL '1 day' AS DATE) AS r,
               l_orderkey * 8 + l_linenumber AS pk
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '{_IO_LO}'
          AND l_shipdate <  TIMESTAMP '{_IO_HI}'
          AND l_suppkey IS NOT NULL
          AND l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL
          AND l_quantity IS NOT NULL AND l_quantity >= 1
    )
    SELECT a.suppkey AS suppkey,
           COUNT(*) AS overlap_pairs,
           CAST(SUM(DATEDIFF('day', GREATEST(a.s, b.s),
                             LEAST(a.r, b.r)) + 1) AS BIGINT)
               AS overlap_days,
           CAST(MAX(DATEDIFF('day', GREATEST(a.s, b.s),
                             LEAST(a.r, b.r)) + 1) AS BIGINT)
               AS max_overlap_days
    FROM base a
    JOIN base b
      ON a.suppkey = b.suppkey AND a.pk < b.pk
     AND a.s <= b.r AND b.s <= a.r
    GROUP BY a.suppkey
    ORDER BY a.suppkey
    """,
)
def j_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval×interval self-overlap join (which of a supplier's shipments
    were in transit concurrently?), the temporal-join sibling of
    ``j_range``'s point-in-interval.  Shipping windows are derived
    deterministically (ship + (floor(qty) %% 30 + 1) days) since this
    lineitem carries no receiptdate.

    Scale shape: the naive plan is an equi-join on supplier with the
    overlap inequality as a residual — correct, but ONE hot supplier's
    whole history lands in one task and the within-key work is quadratic
    in history length.  Production fix (DB interval-join literature; same
    family as j_range's blocking): add a TIME BUCKET to the equality key.
    Each interval is exploded to the month buckets it covers (≤2 here,
    duration ≤ 31d < bucket width), the join key becomes
    (supplier, month) equality, and each overlapping pair is COUNTED
    EXACTLY ONCE by the canonical-bucket rule — a pair belongs to the
    bucket of the LATER start, a date both intervals contain whenever
    they overlap at all.  Per-task work is now bounded by per-month
    density, not total history; at 100 TB the explode ≤2× the probe and
    the shuffle stays a plain hash exchange.  All aggregates are exact
    integers (day counts), so no decimal ladder is needed."""
    li = load_table(spark, sf_dir, "lineitem")
    dur = (F.floor("l_quantity").cast("int") % 30 + 1).cast("int")
    base = (
        li.filter(
            (F.col("l_shipdate") >= F.lit(_IO_LO).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(_IO_HI).cast("timestamp"))
            & F.col("l_suppkey").isNotNull()
            & F.col("l_orderkey").isNotNull()
            & F.col("l_linenumber").isNotNull()
            & F.col("l_quantity").isNotNull()
            & (F.col("l_quantity") >= 1)
        )
        .withColumn("dur", dur)
        .select(
            F.col("l_suppkey").alias("suppkey"),
            F.to_date("l_shipdate").alias("s"),
            F.to_date(
                F.expr("timestampadd(DAY, dur, l_shipdate)")
            ).alias("r"),
            (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("pk"),
        )
        .withColumn("sb", F.year("s") * 12 + F.month("s"))
        .withColumn("rb", F.year("r") * 12 + F.month("r"))
    )
    a = base.withColumn("bucket", F.explode(F.sequence("sb", "rb"))).alias(
        "a"
    )
    b = base.withColumn("bucket", F.explode(F.sequence("sb", "rb"))).alias(
        "b"
    )
    ov = F.datediff(
        F.least("a.r", "b.r"), F.greatest("a.s", "b.s")
    ) + F.lit(1)
    return (
        a.join(
            b,
            on=[
                F.col("a.suppkey") == F.col("b.suppkey"),
                F.col("a.bucket") == F.col("b.bucket"),
                F.col("a.pk") < F.col("b.pk"),
                F.col("a.s") <= F.col("b.r"),
                F.col("b.s") <= F.col("a.r"),
                # canonical bucket: the later start's month — counted once
                F.col("a.bucket") == F.greatest("a.sb", "b.sb"),
            ],
        )
        .groupBy(F.col("a.suppkey").alias("suppkey"))
        .agg(
            F.count(F.lit(1)).alias("overlap_pairs"),
            F.sum(ov).cast("bigint").alias("overlap_days"),
            F.max(ov).cast("bigint").alias("max_overlap_days"),
        )
        .orderBy("suppkey")
    )


@register(
    "j_scd2_build",
    oracle="""
    WITH ch AS (
      SELECT o_custkey AS k, o_orderdate AS d, o_orderkey AS id
      FROM orders
      WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
        AND o_orderkey IS NOT NULL
    ),
    v AS (
      SELECT k, d,
             LEAD(d) OVER (PARTITION BY k ORDER BY d, id) AS vto
      FROM ch
    ),
    per AS (
      SELECT k, COUNT(*) AS nv,
             CAST(SUM(CASE WHEN vto IS NOT NULL
                      THEN DATEDIFF('day', CAST(d AS DATE),
                                    CAST(vto AS DATE))
                      ELSE 0 END) AS BIGINT) AS closed
      FROM v GROUP BY k
    )
    SELECT (CASE WHEN nv >= 10 THEN 10 ELSE nv END)::INTEGER
               AS versions_bucket,
           COUNT(*) AS n_keys,
           CAST(SUM(closed) AS BIGINT) AS closed_days,
           CAST(SUM(k) AS BIGINT) AS key_checksum
    FROM per GROUP BY 1 ORDER BY 1
    """,
)
def j_scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BUILD a type-2 slowly-changing dimension from a change log — the
    write-side twin of j_scd2_pit (which reads one): each customer's
    orders are treated as change records, and validity intervals
    [valid_from, valid_to) come from ONE LEAD window per key ordered by
    (change time, change id) — the id tie-break is what makes same-day
    changes deterministic, the classic SCD2-build bug.  The open (current)
    version per key is the NULL-lead row.  Output pins the version-count
    histogram, per-bucket key membership, and the exact closed-interval
    day mass — so a wrong interval anywhere moves a checksum.

    Scale shape: one hash shuffle on the key, one within-partition sort
    per key (LEAD), then pure aggregation — the canonical
    build-SCD2-in-one-pass plan; no self-join, no per-version scan.  At
    100 TB the shuffle is the only data movement and AQE splits any hot
    customer."""
    ch = (
        load_table(spark, sf_dir, "orders")
        .filter(
            F.col("o_custkey").isNotNull()
            & F.col("o_orderdate").isNotNull()
            & F.col("o_orderkey").isNotNull()
        )
        .select(
            F.col("o_custkey").alias("k"),
            F.col("o_orderdate").alias("d"),
            F.col("o_orderkey").alias("id"),
        )
    )
    w = Window.partitionBy("k").orderBy("d", "id")
    v = ch.select("k", "d", F.lead("d").over(w).alias("vto"))
    per = v.groupBy("k").agg(
        F.count(F.lit(1)).alias("nv"),
        F.sum(
            F.when(
                F.col("vto").isNotNull(),
                F.datediff(F.to_date("vto"), F.to_date("d")),
            ).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("closed"),
    )
    return (
        per.groupBy(
            F.when(F.col("nv") >= 10, F.lit(10))
            .otherwise(F.col("nv"))
            .cast("int")
            .alias("versions_bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("closed").cast("bigint").alias("closed_days"),
            F.sum("k").cast("bigint").alias("key_checksum"),
        )
        .orderBy("versions_bucket")
    )
