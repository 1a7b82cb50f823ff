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
from lakehouse_sfc_spark.sources.loader import load_table, materialize_once

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


@register(
    "dq_referential_integrity",
    oracle="""
    SELECT 'lineitem.l_orderkey->orders' AS fk_edge,
           (SELECT COUNT(*) FROM lineitem) AS n_child,
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans
    UNION ALL
    SELECT 'orders.o_custkey->customer',
           (SELECT COUNT(*) FROM orders),
           (SELECT COUNT(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'lineitem.l_partkey->part',
           (SELECT COUNT(*) FROM lineitem),
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM part p
                              WHERE p.p_partkey = l.l_partkey))
    UNION ALL
    SELECT 'customer.c_nationkey->nation',
           (SELECT COUNT(*) FROM customer),
           (SELECT COUNT(*) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM nation n
                              WHERE n.n_nationkey = c.c_nationkey))
    ORDER BY fk_edge
    """,
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit over the star schema's FK edges: child
    row count and orphan count (child keys with no parent) per edge — the
    constraint check a warehouse load runs after every ingest, since
    parquet lakes enforce nothing.

    Scale shape: each edge is one LEFT ANTI join on the key.  The parent
    side ships only its distinct key column; small dims broadcast, the
    orders side stays a hash join — both orders of magnitude cheaper than
    the naive NOT IN (which would also be NULL-unsafe)."""

    def edge(child: DataFrame, ckey: str, parent: DataFrame, pkey: str,
             name: str, bcast: bool) -> DataFrame:
        pk = parent.select(pkey).distinct()
        if bcast:
            pk = F.broadcast(pk)
        orphans = child.join(
            pk, child[ckey] == pk[pkey], "left_anti"
        ).agg(F.count(F.lit(1)).alias("n_orphans"))
        total = child.agg(F.count(F.lit(1)).alias("n_child"))
        return (
            total.crossJoin(orphans)
            .select(
                F.lit(name).alias("fk_edge"), "n_child", "n_orphans"
            )
        )

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    p = load_table(spark, sf_dir, "part")
    n = load_table(spark, sf_dir, "nation")
    edges = [
        edge(li, "l_orderkey", o, "o_orderkey",
             "lineitem.l_orderkey->orders", False),
        edge(o, "o_custkey", c, "c_custkey",
             "orders.o_custkey->customer", True),
        edge(li, "l_partkey", p, "p_partkey",
             "lineitem.l_partkey->part", True),
        edge(c, "c_nationkey", n, "n_nationkey",
             "customer.c_nationkey->nation", True),
    ]
    out = edges[0]
    for e in edges[1:]:
        out = out.unionByName(e)
    return out.orderBy("fk_edge")


@register(
    "profile_drift",
    # Chi-square-style per-bucket drift table between two event streams.
    # Every per-row expression is a single IEEE evaluation of exact integer
    # inputs (no cross-row double sums), so both engines agree bit-for-bit.
    oracle="""
    WITH b AS (
      SELECT CAST(FLOOR(value / 50.0) AS BIGINT) AS bucket,
             COUNT(*) FILTER (event_type = 'view') AS cnt_a,
             COUNT(*) FILTER (event_type = 'purchase') AS cnt_b
      FROM events
      WHERE event_type IN ('view', 'purchase')
      GROUP BY 1
    ),
    t AS (SELECT SUM(cnt_a) AS na, SUM(cnt_b) AS nb FROM b)
    SELECT bucket, cnt_a, cnt_b,
           round(cnt_a::DOUBLE / na, 6) AS frac_a,
           round(cnt_b::DOUBLE / nb, 6) AS frac_b,
           round(
             (cnt_a::DOUBLE / na - cnt_b::DOUBLE / nb)
             * (cnt_a::DOUBLE / na - cnt_b::DOUBLE / nb)
             / ((cnt_a + cnt_b)::DOUBLE / (na + nb)), 6) AS chi2_term
    FROM b CROSS JOIN t
    ORDER BY bucket
    """,
)
def profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift profile between two event populations ('view' as
    the reference, 'purchase' as the candidate): per value-bucket counts,
    normalized frequencies, and the chi-square contribution — the
    drift-monitoring table behind a PSI/chi-square alert, WITHOUT the
    cross-engine-poisonous logarithm PSI needs (chi-square ranks buckets
    identically for alerting).

    Scale shape: one keyed aggregation over a filtered scan, a 1-row total
    broadcast back over the bucket table (|buckets| rows).  The chi-square
    SUM is deliberately NOT taken — per-bucket terms are each a single
    deterministic IEEE expression, while a cross-row double sum would be
    order-dependent; a consumer can sum the exact terms it needs."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    b = ev.groupBy(
        F.floor(F.col("value") / 50.0).cast("bigint").alias("bucket")
    ).agg(
        F.count(F.when(F.col("event_type") == "view", 1)).alias("cnt_a"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("cnt_b"),
    )
    t = b.agg(
        F.sum("cnt_a").alias("na"), F.sum("cnt_b").alias("nb")
    )
    fa = F.col("cnt_a").cast("double") / F.col("na")
    fb = F.col("cnt_b").cast("double") / F.col("nb")
    chi = (
        (fa - fb) * (fa - fb)
        / ((F.col("cnt_a") + F.col("cnt_b")).cast("double")
           / (F.col("na") + F.col("nb")))
    )
    return (
        b.crossJoin(F.broadcast(t))
        .select(
            "bucket",
            "cnt_a",
            "cnt_b",
            F.round(fa, 6).alias("frac_a"),
            F.round(fb, 6).alias("frac_b"),
            F.round(chi, 6).alias("chi2_term"),
        )
        .orderBy("bucket")
    )


@register(
    "dq_uniqueness",
    oracle="""
    SELECT 'customer.c_custkey' AS key_col,
           (SELECT COUNT(*) FROM customer) AS n_rows,
           (SELECT COUNT(DISTINCT c_custkey) FROM customer) AS n_distinct,
           (SELECT COUNT(*) FROM customer)
             - (SELECT COUNT(DISTINCT c_custkey) FROM customer) AS n_dup_rows
    UNION ALL
    SELECT 'documents.doc_id',
           (SELECT COUNT(*) FROM documents),
           (SELECT COUNT(DISTINCT doc_id) FROM documents),
           (SELECT COUNT(*) FROM documents)
             - (SELECT COUNT(DISTINCT doc_id) FROM documents)
    UNION ALL
    SELECT 'events.event_id',
           (SELECT COUNT(*) FROM events),
           (SELECT COUNT(DISTINCT event_id) FROM events),
           (SELECT COUNT(*) FROM events)
             - (SELECT COUNT(DISTINCT event_id) FROM events)
    UNION ALL
    SELECT 'lineitem.(l_orderkey,l_linenumber)',
           (SELECT COUNT(*) FROM lineitem),
           (SELECT COUNT(*) FROM
              (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem)),
           (SELECT COUNT(*) FROM lineitem)
             - (SELECT COUNT(*) FROM
                  (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem))
    ORDER BY key_col
    """,
)
def dq_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key uniqueness audit (the twin of dq_referential_integrity):
    per declared key, total rows vs distinct keys and the duplicate-row
    surplus — including one COMPOSITE key.  A lake enforces no PKs, so this
    is the post-ingest assertion every pipeline schedules.

    Scale shape: each check is one map-side-combinable distinct-aggregate
    on the key column(s) — no joins; COUNT(DISTINCT) over a single shuffle
    per table."""

    def check(df: DataFrame, cols: list[str], name: str) -> DataFrame:
        # single key: COUNT(DISTINCT col) skips NULLs in BOTH engines.
        # composite key: the oracle counts DISTINCT ROWS (a tuple with a
        # NULL component still counts), so count the distinct STRUCT —
        # bare multi-arg count_distinct would skip any NULL-component row
        # and diverge the moment the data grows a NULL key part.
        distinct = (
            F.count_distinct(F.col(cols[0]))
            if len(cols) == 1
            else F.count_distinct(F.struct(*cols))
        )
        return df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            distinct.alias("n_distinct"),
        ).select(
            F.lit(name).alias("key_col"),
            "n_rows",
            "n_distinct",
            (F.col("n_rows") - F.col("n_distinct")).alias("n_dup_rows"),
        )

    checks = [
        check(load_table(spark, sf_dir, "customer"), ["c_custkey"],
              "customer.c_custkey"),
        check(load_table(spark, sf_dir, "documents"), ["doc_id"],
              "documents.doc_id"),
        check(load_table(spark, sf_dir, "events"), ["event_id"],
              "events.event_id"),
        check(load_table(spark, sf_dir, "lineitem"),
              ["l_orderkey", "l_linenumber"],
              "lineitem.(l_orderkey,l_linenumber)"),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.orderBy("key_col")


# Benford's-law expected first-digit frequencies log10(1 + 1/d), pinned as
# LITERALS so neither engine evaluates a logarithm (transcendentals are
# cross-engine poison; identical literals compare identically).
_BENFORD = [
    0.30103, 0.176091, 0.124939, 0.09691, 0.079181,
    0.066947, 0.057992, 0.051153, 0.045757,
]

_SQL_BENFORD_CASE = (
    "CASE digit "
    + " ".join(f"WHEN {d + 1} THEN {p}" for d, p in enumerate(_BENFORD))
    + " END"
)


@register(
    "profile_benford",
    oracle=f"""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR),
                  1, 1) AS BIGINT) AS digit
      FROM orders WHERE o_totalprice >= 1
    ),
    c AS (SELECT digit, COUNT(*) AS cnt FROM d GROUP BY 1),
    t AS (SELECT SUM(cnt) AS n FROM c)
    SELECT digit, cnt,
           round(cnt::DOUBLE / n, 6) AS observed,
           CAST({_SQL_BENFORD_CASE} AS DOUBLE) AS expected,
           round(cnt::DOUBLE / n
                 - CAST({_SQL_BENFORD_CASE} AS DOUBLE), 6) AS deviation
    FROM c CROSS JOIN t
    ORDER BY digit
    """,
)
def profile_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-significant-digit profile of order totals — the
    classic anomaly screen for fabricated or truncated numeric data.  The
    leading digit comes from integer/string arithmetic (truncate, cast,
    first char), the expected frequencies are pinned literals, and
    observed/deviation are single IEEE divisions of exact integers — no
    logarithm is ever evaluated at query time in either engine.

    Scale shape: one map-side-combinable groupBy on 9 keys + a 1-row total
    broadcast; the digit extraction rides the scan."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    d = o.select(
        F.substring(
            F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
        ).cast("bigint").alias("digit")
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).alias("cnt"))
    t = c.agg(F.sum("cnt").alias("n"))
    expected = F.lit(None).cast("double")
    for i, p in enumerate(_BENFORD):
        expected = F.when(F.col("digit") == i + 1, F.lit(p)).otherwise(expected)
    obs = F.col("cnt").cast("double") / F.col("n")
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "digit",
            "cnt",
            F.round(obs, 6).alias("observed"),
            expected.alias("expected"),
            F.round(obs - expected, 6).alias("deviation"),
        )
        .orderBy("digit")
    )


@register(
    "dq_ks_two_sample",
    oracle="""
    WITH pv AS (
      SELECT value,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS a,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS b
      FROM events WHERE event_type IN ('purchase', 'click')
        AND value IS NOT NULL
      GROUP BY value
    ),
    t AS (SELECT CAST(SUM(a) AS BIGINT) AS na,
                 CAST(SUM(b) AS BIGINT) AS nb FROM pv),
    c AS (
      SELECT value,
             SUM(a) OVER (ORDER BY value) AS ca,
             SUM(b) OVER (ORDER BY value) AS cb
      FROM pv
    ),
    d AS (
      SELECT c.value,
             CAST(abs(c.ca * t.nb - c.cb * t.na) AS BIGINT) AS dnum
      FROM c, t
    )
    SELECT t.na AS n_a, t.nb AS n_b,
           CAST(MAX(d.dnum) AS BIGINT) AS d_num,
           first(d.value ORDER BY d.dnum DESC, d.value) AS ks_at_value,
           CAST(MAX(d.dnum) AS DOUBLE) / (t.na * t.nb) AS ks
    FROM d, t GROUP BY t.na, t.nb
    """,
)
def dq_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift statistic between the purchase
    and click value distributions — the standard "did this feed's
    distribution shift" gate, EXACT: the ECDF gap at value x is
    |cumA·N_b − cumB·N_a| / (N_a·N_b), and the comparison/argmax runs on
    the INTEGER numerator (no float ECDFs to diverge), with one double
    division at the very end.

    The naive KS is one global sort; here the prefix sums are
    block-DECOMPOSED like a_concurrent: per-value counts cumulate within
    floor(value) blocks under a block-hash partitioning, a tiny window
    over per-block totals supplies each block's carry-in, and the argmax
    is a plain aggregate — holds at 1000 executors."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
        # NULL values have no position on the real line — excluded from
        # the ECDFs (also: Spark and DuckDB disagree on default NULL
        # placement in ORDER BY, so a nullable sort key is never parity-safe)
        & F.col("value").isNotNull()
    )
    pv = (
        ev.groupBy("value")
        .agg(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("a"),
            F.sum(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            ).alias("b"),
        )
        .withColumn("blk", F.floor("value"))
    )
    w_blk = Window.partitionBy("blk").orderBy("value")
    # r13: 'within' feeds BOTH per_blk (via the broadcast carry side) and
    # the final gap join; a BroadcastExchange side cannot reuse a shuffle
    # side, so without a barrier the groupBy+window subtree ran twice
    # (guide 2.4).  materialize_once = one evaluation.
    within = materialize_once(
        pv.select(
            "blk",
            "value",
            F.sum("a").over(w_blk).alias("ca_in"),
            F.sum("b").over(w_blk).alias("cb_in"),
            "a",
            "b",
        )
    )
    per_blk = within.groupBy("blk").agg(
        F.sum("a").alias("blk_a"), F.sum("b").alias("blk_b")
    )
    w_carry = Window.orderBy("blk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    carry = per_blk.select(
        "blk",
        F.coalesce(F.sum("blk_a").over(w_carry), F.lit(0)).alias("carry_a"),
        F.coalesce(F.sum("blk_b").over(w_carry), F.lit(0)).alias("carry_b"),
    )
    tot = per_blk.agg(
        F.sum("blk_a").alias("na"), F.sum("blk_b").alias("nb")
    )
    d = (
        within.join(F.broadcast(carry), "blk")
        .crossJoin(F.broadcast(tot))
        .select(
            "value",
            "na",
            "nb",
            F.abs(
                (F.col("carry_a") + F.col("ca_in")) * F.col("nb")
                - (F.col("carry_b") + F.col("cb_in")) * F.col("na")
            ).alias("dnum"),
        )
    )
    return (
        d.groupBy("na", "nb")
        .agg(
            F.max(
                F.struct(F.col("dnum"), (-F.col("value")).alias("nv"))
            ).alias("best")
        )
        .select(
            F.col("na").alias("n_a"),
            F.col("nb").alias("n_b"),
            F.col("best.dnum").alias("d_num"),
            (-F.col("best.nv")).alias("ks_at_value"),
            (
                F.col("best.dnum").cast("double")
                / (F.col("na") * F.col("nb"))
            ).alias("ks"),
        )
    )


@register(
    "dq_reconcile_totals",
    oracle="""
    WITH lt AS (
      SELECT l_orderkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(8,4)))) AS li_total
      FROM lineitem GROUP BY l_orderkey
    ),
    d AS (
      SELECT o.o_orderkey,
             CAST(o.o_totalprice AS DECIMAL(18,2)) AS header,
             lt.li_total,
             CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) - lt.li_total
                  AS DOUBLE) AS delta
      FROM orders o LEFT JOIN lt ON o.o_orderkey = lt.l_orderkey
    ),
    b AS (
      SELECT CASE WHEN li_total IS NULL THEN 'missing_lineitems'
                  WHEN delta = 0 THEN 'exact'
                  WHEN delta > 0 THEN 'header_over'
                  ELSE 'header_under' END AS band,
             CASE WHEN li_total IS NULL OR delta = 0 THEN 0
                  ELSE CAST(LEAST(FLOOR(abs(delta)
                       / CAST(header AS DOUBLE) * 10.0), 10) AS BIGINT)
             END AS decile,
             delta
      FROM d
    )
    SELECT band, decile,
           COUNT(*) AS n_orders,
           MIN(delta) AS min_delta,
           MAX(delta) AS max_delta
    FROM b GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def dq_reconcile_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-vs-rollup reconciliation — the DQ report every warehouse runs
    nightly: each order's HEADER total against the exact-decimal sum of
    its line items (extendedprice·(1−discount)), bucketed by direction and
    relative-magnitude decile, with childless orders their own band.  All
    comparisons happen on exact decimals; the only doubles are the final
    delta rendering and the single bucketing division (FLOOR — identical
    truncation in both engines).

    Scale shape: one l_orderkey aggregation (map-side combinable), one
    key-equality join, one tiny-keyed histogram — the reconciliation of a
    100 TB fact table is exactly this plan."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lt = li.groupBy("l_orderkey").agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(8,4)"))
        ).alias("li_total")
    )
    d = o.join(lt, o.o_orderkey == lt.l_orderkey, "left").select(
        F.col("o_totalprice").cast("decimal(18,2)").alias("header"),
        "li_total",
        (
            F.col("o_totalprice").cast("decimal(18,2)") - F.col("li_total")
        )
        .cast("double")
        .alias("delta"),
    )
    band = (
        F.when(F.col("li_total").isNull(), "missing_lineitems")
        .when(F.col("delta") == 0, "exact")
        .when(F.col("delta") > 0, "header_over")
        .otherwise("header_under")
    )
    decile = F.when(
        F.col("li_total").isNull() | (F.col("delta") == 0), F.lit(0)
    ).otherwise(
        F.least(
            F.floor(
                F.abs(F.col("delta"))
                / F.col("header").cast("double")
                * 10.0
            ),
            F.lit(10),
        ).cast("bigint")
    )
    return (
        d.select(band.alias("band"), decile.alias("decile"), "delta")
        .groupBy("band", "decile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("delta").alias("min_delta"),
            F.max("delta").alias("max_delta"),
        )
        .orderBy("band", "decile")
    )


# --- key-constraint audit -----------------------------------------------------


@register(
    "dq_key_uniqueness",
    oracle="""
    WITH per_key AS (
      SELECT 'events.event_id' AS constraint_name,
             COUNT(*) AS cnt
      FROM events GROUP BY event_id
      UNION ALL
      SELECT 'events.ts_user', COUNT(*)
      FROM events GROUP BY ts, user_id
      UNION ALL
      SELECT 'orders.o_orderkey', COUNT(*) FROM orders GROUP BY o_orderkey
      UNION ALL
      SELECT 'customer.c_custkey', COUNT(*)
      FROM customer GROUP BY c_custkey
    )
    SELECT constraint_name,
           CAST(SUM(cnt) AS BIGINT) AS n_rows,
           COUNT(*) AS n_keys,
           CAST(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS dup_keys,
           CAST(SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT)
             AS rows_in_dups,
           CAST(MAX(cnt) AS BIGINT) AS max_multiplicity
    FROM per_key GROUP BY constraint_name ORDER BY constraint_name
    """,
)
def dq_key_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-key audit — the ingest gate every MERGE/upsert pipeline
    needs BEFORE trusting a key (latest-wins dedup on a non-key silently
    drops data; see layout/upsert.py's duplicate guard): for each declared
    constraint, row count, distinct keys, violated keys, rows involved in
    violations, and the worst multiplicity.  A clean key shows
    dup_keys = 0 and max_multiplicity = 1; (ts, user_id) is audited as the
    natural-key candidate people WANT to use and often can't.

    Scale shape: one hash aggregation per audited key (map-side partial),
    then a tiny union + rollup — the per-key counts never leave the
    executor as raw rows.  At 100 TB each audit is exactly the shuffle of
    its key's aggregation — the same cost MERGE itself pays — so auditing
    before ingest is never the bottleneck."""
    ev = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")

    def audit(df: DataFrame, name: str, *keys: str) -> DataFrame:
        return (
            df.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(F.lit(name).alias("constraint_name"), "cnt")
        )

    per_key = (
        audit(ev, "events.event_id", "event_id")
        .unionByName(audit(ev, "events.ts_user", "ts", "user_id"))
        .unionByName(audit(o, "orders.o_orderkey", "o_orderkey"))
        .unionByName(audit(c, "customer.c_custkey", "c_custkey"))
    )
    dup = F.col("cnt") > 1
    return (
        per_key.groupBy("constraint_name")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).alias("n_keys"),
            F.sum(dup.cast("int")).cast("bigint").alias("dup_keys"),
            F.sum(F.when(dup, F.col("cnt")).otherwise(0))
            .cast("bigint")
            .alias("rows_in_dups"),
            F.max("cnt").cast("bigint").alias("max_multiplicity"),
        )
        .orderBy("constraint_name")
    )


@register(
    "dq_fd_check",
    oracle="""
    WITH per_lhs AS (
      SELECT 'documents.md5_text->lang' AS fd,
             COUNT(DISTINCT lang) AS nv
      FROM documents GROUP BY md5(text)
      UNION ALL
      SELECT 'events.user_id->event_type', COUNT(DISTINCT event_type)
      FROM events GROUP BY user_id
      UNION ALL
      SELECT 'orders.o_custkey->o_orderpriority',
             COUNT(DISTINCT o_orderpriority)
      FROM orders GROUP BY o_custkey
      UNION ALL
      SELECT 'part.p_brand->p_type', COUNT(DISTINCT p_type)
      FROM part GROUP BY p_brand
    )
    SELECT fd,
           COUNT(*) AS n_lhs_keys,
           CAST(SUM(CASE WHEN nv > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS violating_keys,
           CAST(MAX(nv) AS BIGINT) AS max_variants
    FROM per_lhs GROUP BY fd ORDER BY fd
    """,
)
def dq_fd_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit — does X actually determine Y?  The
    training-data case is the first row: identical content (md5(text))
    carrying DIFFERENT language labels, the labeling inconsistency that
    poisons lang-filtered corpora and that exact dedup silently resolves
    by whichever copy survives.  The others profile real-world
    denormalization assumptions (customer order priority habits, brand to
    type).  A clean FD shows violating_keys = 0, max_variants = 1;
    COUNT(DISTINCT y) ignores NULL labels identically in both engines.

    Scale shape: one hash aggregation per audited FD (two-level: LHS
    grouping with a distinct-count, then a tiny rollup) — the same
    map-side-combinable shape as dq_key_uniqueness; nothing row-sized
    crosses the union."""
    d = load_table(spark, sf_dir, "documents")
    ev = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part")

    def fd(df: DataFrame, name: str, lhs, rhs: str) -> DataFrame:
        return (
            df.groupBy(lhs)
            .agg(F.count_distinct(F.col(rhs)).alias("nv"))
            .select(F.lit(name).alias("fd"), "nv")
        )

    per_lhs = (
        fd(d, "documents.md5_text->lang", F.md5(F.col("text")), "lang")
        .unionByName(fd(ev, "events.user_id->event_type", F.col("user_id"), "event_type"))
        .unionByName(
            fd(o, "orders.o_custkey->o_orderpriority", F.col("o_custkey"), "o_orderpriority")
        )
        .unionByName(fd(p, "part.p_brand->p_type", F.col("p_brand"), "p_type"))
    )
    return (
        per_lhs.groupBy("fd")
        .agg(
            F.count(F.lit(1)).alias("n_lhs_keys"),
            F.sum((F.col("nv") > 1).cast("int"))
            .cast("bigint")
            .alias("violating_keys"),
            F.max("nv").cast("bigint").alias("max_variants"),
        )
        .orderBy("fd")
    )


_CHI_SCALE = 1_000_000_000  # FLOOR-tick ladder: 1e-9 statistic resolution
_CHI_SPLIT = "1998-07-01"  # midpoint of this dataset's 1995-2001 span


@register(
    "dq_chi_square_drift",
    oracle=f"""
    WITH o AS (
      SELECT o_orderpriority AS pr,
             CASE WHEN o_orderdate < DATE '{_CHI_SPLIT}' THEN 0 ELSE 1 END
                 AS per
      FROM orders
      WHERE o_orderdate IS NOT NULL AND o_orderpriority IS NOT NULL
    ),
    cell AS (SELECT pr, per, COUNT(*) AS c FROM o GROUP BY 1, 2),
    prs AS (SELECT DISTINCT pr FROM o),
    pes AS (SELECT 0 AS per UNION ALL SELECT 1),
    grid AS (
      SELECT prs.pr, pes.per, COALESCE(cell.c, 0) AS c
      FROM prs CROSS JOIN pes
      LEFT JOIN cell ON cell.pr = prs.pr AND cell.per = pes.per
    ),
    rowt AS (SELECT pr, SUM(c) AS rt FROM grid GROUP BY 1),
    colt AS (SELECT per, SUM(c) AS ct FROM grid GROUP BY 1),
    n AS (SELECT SUM(c) AS n FROM grid),
    t AS (
      SELECT g.pr, g.per, g.c,
             CAST(r.rt * cl.ct AS DOUBLE) / n.n AS e
      FROM grid g
      JOIN rowt r ON r.pr = g.pr
      JOIN colt cl ON cl.per = g.per
      CROSS JOIN n
    )
    SELECT pr,
           CAST(SUM(CASE WHEN per = 0 THEN c END) AS BIGINT) AS n_early,
           CAST(SUM(CASE WHEN per = 1 THEN c END) AS BIGINT) AS n_late,
           CAST(SUM(CASE WHEN e > 0 THEN CAST(FLOOR(
               (c - e) * (c - e) / e * {_CHI_SCALE}
           ) AS BIGINT) ELSE 0 END) AS BIGINT) AS contrib_scaled
    FROM t GROUP BY pr ORDER BY pr
    """,
)
def dq_chi_square_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square homogeneity drift — the categorical twin of
    dq_ks_two_sample: does the order-priority mix differ between the
    dataset's early and late halves?  Per-cell expected counts are
    row·col/N (ONE double division of exact integers), each cell's
    (o−e)²/e contribution is floor-scaled to a 1e-9-resolution BIGINT and
    summed as integers — the FLOOR-tick ladder (emb_pca_power's trick)
    that makes a cross-row float sum order-free and bit-identical in both
    engines.  Output is the per-category contribution decomposition (the
    part a drift triage actually reads — WHICH category moved); the
    statistic is the column sum and dof = (k−1)(2−1).

    Scale shape: two hash aggregations over the fact scan (cell counts,
    then marginals — both map-side combinable) and a tiny grid join;
    nothing grows with data but the first groupBy."""
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderdate").isNotNull()
            & F.col("o_orderpriority").isNotNull()
        )
        .select(
            F.col("o_orderpriority").alias("pr"),
            F.when(
                F.col("o_orderdate") < F.lit(_CHI_SPLIT).cast("date"), 0
            )
            .otherwise(1)
            .alias("per"),
        )
    )
    cell = o.groupBy("pr", "per").agg(F.count(F.lit(1)).alias("c"))
    prs = o.select("pr").distinct()
    pes = o.sparkSession.range(2).select(F.col("id").cast("int").alias("per"))
    grid = (
        prs.crossJoin(pes)
        .join(cell, ["pr", "per"], "left")
        .select("pr", "per", F.coalesce(F.col("c"), F.lit(0)).alias("c"))
    )
    rowt = grid.groupBy("pr").agg(F.sum("c").alias("rt"))
    colt = grid.groupBy("per").agg(F.sum("c").alias("ct"))
    n = grid.agg(F.sum("c").alias("n"))
    t = (
        grid.join(F.broadcast(rowt), "pr")
        .join(F.broadcast(colt), "per")
        .crossJoin(F.broadcast(n))
        .select(
            "pr",
            "per",
            "c",
            ((F.col("rt") * F.col("ct")).cast("double") / F.col("n")).alias(
                "e"
            ),
        )
    )
    contrib = F.when(
        F.col("e") > 0,
        F.floor(
            (F.col("c") - F.col("e"))
            * (F.col("c") - F.col("e"))
            / F.col("e")
            * _CHI_SCALE
        ).cast("bigint"),
    ).otherwise(F.lit(0))
    return (
        t.groupBy("pr")
        .agg(
            F.sum(F.when(F.col("per") == 0, F.col("c")))
            .cast("bigint")
            .alias("n_early"),
            F.sum(F.when(F.col("per") == 1, F.col("c")))
            .cast("bigint")
            .alias("n_late"),
            F.sum(contrib).cast("bigint").alias("contrib_scaled"),
        )
        .orderBy("pr")
    )


@register(
    "dq_sequence_gaps",
    oracle="""
    WITH k AS (
      SELECT DISTINCT o_orderkey AS k FROM orders
      WHERE o_orderkey IS NOT NULL
    ),
    g AS (
      SELECT LEAD(k) OVER (ORDER BY k) - k AS gap FROM k
    ),
    b AS (
      SELECT CASE WHEN gap >= 10 THEN 10 ELSE gap END::INTEGER
                 AS gap_bucket
      FROM g WHERE gap IS NOT NULL
    )
    SELECT gap_bucket,
           COUNT(*) AS n_pairs,
           CAST(SUM(gap_bucket) AS BIGINT) AS bucket_checksum
    FROM b GROUP BY gap_bucket ORDER BY gap_bucket
    """,
)
def dq_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Id-sequence completeness audit: the histogram of consecutive-key
    gaps over the distinct order-key sequence — gap 1 = dense run, gap
    2-9 = small holes (lost rows? filtered ingest?), bucket 10 = >=10
    (TPC-H's deliberate key sparsity shows up here as a signature).  The
    DQ twin of w_gap_histogram (which audits TIME gaps on events); this
    audits KEY-SPACE continuity, the check that catches a dropped ingest
    shard whose rows are spread uniformly in time but contiguous in key.

    Scale shape: LEAD over the globally-ordered distinct key relation.
    Here that is one window sort; at 100 TB the same audit runs as
    repartitionByRange(k) + within-partition LEAD, plus one tiny exchange
    of the n_partitions boundary keys — gaps never cross more than one
    boundary, so the global sort is unnecessary (noted, not needed at
    bench scale)."""
    from pyspark.sql import Window

    k = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey").isNotNull())
        .select(F.col("o_orderkey").alias("k"))
        .distinct()
    )
    g = k.select(
        (F.lead("k").over(Window.orderBy("k")) - F.col("k")).alias("gap")
    ).filter(F.col("gap").isNotNull())
    b = g.select(
        F.when(F.col("gap") >= 10, F.lit(10))
        .otherwise(F.col("gap"))
        .cast("int")
        .alias("gap_bucket")
    )
    return (
        b.groupBy("gap_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("gap_bucket").cast("bigint").alias("bucket_checksum"),
        )
        .orderBy("gap_bucket")
    )
