"""Data-quality validation (Deequ/GreatExpectations-style) — beyond the
reference: the constraint suite a training-data pipeline runs before a
corpus or feature table is allowed downstream.

One registry query evaluates a whole constraint suite in a FIXED number of
passes (one aggregate per table + two anti-join counts), emitting one row
per check: (check, metric, passed).  Metrics are exact counts or single
double divisions of exact counts, so the oracle hash-matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_sfc_spark.queries.registry import register
from lakehouse_sfc_spark.sources.loader import load_table

_EVENT_TYPES = ("click", "view", "purchase", "signup", "error")


@register(
    "dq_checks",
    oracle=f"""
    WITH o AS (
      SELECT COUNT(*) AS n,
             COUNT(o_orderkey) AS n_key,
             COUNT(DISTINCT o_orderkey) AS n_dist,
             COUNT(*) FILTER (WHERE o_totalprice <= 0) AS n_nonpos
      FROM orders
    ),
    c AS (
      SELECT COUNT(*) AS n,
             COUNT(*) FILTER (WHERE c_acctbal < 0) AS n_neg
      FROM customer
    ),
    e AS (
      SELECT COUNT(*) AS n,
             COUNT(value) AS n_val,
             COUNT(*) FILTER (
               WHERE event_type NOT IN {tuple(_EVENT_TYPES)!r}
             ) AS n_bad_type
      FROM events
    ),
    li_orphans AS (
      SELECT COUNT(*) AS n FROM lineitem l
      WHERE NOT EXISTS (
        SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey
      )
    ),
    ord_orphans AS (
      SELECT COUNT(*) AS n FROM orders o
      WHERE NOT EXISTS (
        SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey
      )
    )
    SELECT * FROM (
      SELECT 'orders.completeness(o_orderkey)' AS check_name,
             CAST(o.n_key AS DOUBLE) / o.n AS metric,
             o.n_key = o.n AS passed FROM o
      UNION ALL
      SELECT 'orders.uniqueness(o_orderkey)',
             CAST(o.n_dist AS DOUBLE) / o.n, o.n_dist = o.n FROM o
      UNION ALL
      SELECT 'orders.positive(o_totalprice)',
             CAST(o.n_nonpos AS DOUBLE), o.n_nonpos = 0 FROM o
      UNION ALL
      SELECT 'customer.nonneg(c_acctbal)',
             CAST(c.n_neg AS DOUBLE) / c.n, c.n_neg = 0 FROM c
      UNION ALL
      SELECT 'events.completeness(value)',
             CAST(e.n_val AS DOUBLE) / e.n, e.n_val = e.n FROM e
      UNION ALL
      SELECT 'events.domain(event_type)',
             CAST(e.n_bad_type AS DOUBLE), e.n_bad_type = 0 FROM e
      UNION ALL
      SELECT 'lineitem.fk(orders)',
             CAST(li_orphans.n AS DOUBLE), li_orphans.n = 0 FROM li_orphans
      UNION ALL
      SELECT 'orders.fk(customer)',
             CAST(ord_orphans.n AS DOUBLE), ord_orphans.n = 0 FROM ord_orphans
    )
    ORDER BY check_name
    """,
)
def dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint-suite evaluation: completeness, uniqueness, value-domain,
    range, and referential-integrity checks in one driver-visible result.

    Execution shape (the Deequ trick): every per-table check folds into a
    SINGLE full-scan aggregate of that table — completeness, domain and
    range checks are conditional counts inside one agg, so adding a check
    costs a column, not a scan.  The two FK checks are LEFT ANTI joins
    (orders broadcastable; at 100 TB AQE picks the hash side) reduced to
    counts.  Global single-row aggregates, then a literal-union of eight
    one-row frames — no data-sized shuffle anywhere."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    e = load_table(spark, sf_dir, "events")
    li = load_table(spark, sf_dir, "lineitem")

    o_agg = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_orderkey").alias("n_key"),
        F.count_distinct(F.col("o_orderkey")).alias("n_dist"),
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).alias("n_nonpos"),
    )
    c_agg = c.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("c_acctbal") < 0, 1)).alias("n_neg"),
    )
    e_agg = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("value").alias("n_val"),
        F.count(
            F.when(~F.col("event_type").isin(*_EVENT_TYPES), 1)
        ).alias("n_bad_type"),
    )
    li_orph = (
        li.join(o.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"), "left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ord_orph = (
        o.join(c.select("c_custkey"), o.o_custkey == F.col("c_custkey"), "left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
    )

    def row(src: DataFrame, name: str, metric, passed) -> DataFrame:
        return src.select(
            F.lit(name).alias("check_name"),
            metric.cast("double").alias("metric"),
            passed.alias("passed"),
        )

    n, nk, nd, np_ = (F.col(x) for x in ("n", "n_key", "n_dist", "n_nonpos"))
    checks = [
        row(o_agg, "orders.completeness(o_orderkey)", nk.cast("double") / n, nk == n),
        row(o_agg, "orders.uniqueness(o_orderkey)", nd.cast("double") / n, nd == n),
        row(o_agg, "orders.positive(o_totalprice)", np_, np_ == 0),
        row(
            c_agg,
            "customer.nonneg(c_acctbal)",
            F.col("n_neg").cast("double") / n,
            F.col("n_neg") == 0,
        ),
        row(
            e_agg,
            "events.completeness(value)",
            F.col("n_val").cast("double") / n,
            F.col("n_val") == n,
        ),
        row(e_agg, "events.domain(event_type)", F.col("n_bad_type"), F.col("n_bad_type") == 0),
        row(li_orph, "lineitem.fk(orders)", n, n == 0),
        row(ord_orph, "orders.fk(customer)", n, n == 0),
    ]
    out = checks[0]
    for chk in checks[1:]:
        out = out.unionAll(chk)
    return out.orderBy("check_name")


@register(
    "dq_pseudonymize",
    oracle="""
    WITH mapped AS (
      SELECT user_id,
             sha256(CAST(user_id AS VARCHAR) || ':lakehouse-salt')
               AS surrogate
      FROM (SELECT DISTINCT user_id FROM events)
    )
    SELECT COUNT(*) AS n_users,
           COUNT(DISTINCT surrogate) AS n_surrogates,
           COUNT(*) - COUNT(DISTINCT surrogate) AS n_collisions,
           MIN(surrogate) AS min_surrogate
    FROM mapped
    """,
)
def dq_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudonymization audit: every user_id maps to a salted SHA-256
    surrogate key (the governance move that keeps joins working after the
    raw identifier is removed), and the audit proves the mapping is
    collision-free — surrogate cardinality equals user cardinality.

    Deterministic across engines (sha256 of identical strings), and the
    emitted min_surrogate pins the actual hash values, not just counts.
    Shape: distinct on user_id (the only shuffle, on the reduced key set),
    then a 1-row reduction — at 100 TB the mapping itself would be written
    once as a keyed table; this query is its integrity check."""
    ev = load_table(spark, sf_dir, "events")
    mapped = ev.select("user_id").distinct().select(
        "user_id",
        F.sha2(
            F.concat(
                F.col("user_id").cast("string"), F.lit(":lakehouse-salt")
            ),
            256,
        ).alias("surrogate"),
    )
    return mapped.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count_distinct(F.col("surrogate")).alias("n_surrogates"),
        (
            F.count(F.lit(1)) - F.count_distinct(F.col("surrogate"))
        ).alias("n_collisions"),
        F.min("surrogate").alias("min_surrogate"),
    )


@register(
    "dq_freshness",
    oracle="""
    WITH g AS (SELECT MAX(ts) AS global_max FROM events)
    SELECT event_type,
           COUNT(*) AS n,
           MAX(ts) AS latest,
           CAST((epoch_us(g.global_max) - epoch_us(MAX(ts))) // 3600000000
                AS BIGINT) AS staleness_hours,
           (epoch_us(g.global_max) - epoch_us(MAX(ts)))
             // 3600000000 <= 24 AS fresh_24h
    FROM events CROSS JOIN g
    GROUP BY event_type, g.global_max
    ORDER BY event_type
    """,
)
def dq_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness audit — the standard data-SLA check: how far each event
    stream lags behind the newest data in the table.  Staleness is
    measured against the corpus's own global max timestamp (never
    wall-clock, which would be unreproducible), in integer epoch-
    microsecond arithmetic with integral division — exact in both
    engines.  Two tiny aggregates: a 1-row global max broadcast into a
    per-type rollup; the scan dominates at any scale."""
    ev = load_table(spark, sf_dir, "events")
    g = ev.agg(F.max("ts").alias("global_max"))
    lag_h = F.expr(
        "(unix_micros(CAST(global_max AS TIMESTAMP_LTZ))"
        " - unix_micros(CAST(latest AS TIMESTAMP_LTZ))) DIV 3600000000"
    )
    per_type = (
        ev.crossJoin(F.broadcast(g))
        .groupBy("event_type", "global_max")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("ts").alias("latest"),
        )
    )
    return (
        per_type.select(
            "event_type",
            "n",
            "latest",
            lag_h.cast("bigint").alias("staleness_hours"),
            (lag_h <= 24).alias("fresh_24h"),
        )
        .orderBy("event_type")
    )
