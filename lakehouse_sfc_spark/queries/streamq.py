"""Streaming + sessionization queries over ``events``.

``stream_tumbling_agg`` actually runs Structured Streaming
(Trigger.AvailableNow → memory sink) and is still oracle-checked: with the
full backlog processed, the windowed result equals the batch aggregation,
which DuckDB expresses with time_bucket.

``sessionize_events`` is the batch twin of the stateful streaming
sessionizer (streaming/pipeline.py): 30-minute-gap sessions via lag +
cumulative sum — one shuffle on user_id, windows within partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lakehouse_sfc_spark.queries.registry import register
from lakehouse_sfc_spark.queries.textops import _SQL_TOKENS
from lakehouse_sfc_spark.sources.loader import load_table


@register(
    "stream_tumbling_agg",
    oracle="""
    SELECT time_bucket(INTERVAL 1 HOUR, ts) AS ws,
           event_type,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation executed as a real Structured
    Streaming job (watermark + state-store agg + AvailableNow); the final
    memory-sink table must equal the batch/oracle result."""
    from lakehouse_sfc_spark.streaming import run_tumbling_agg

    return run_tumbling_agg(spark, sf_dir)


_SQL_HLL_STREAM = """
    WITH h AS (
      SELECT time_bucket(INTERVAL 1 HOUR, ts) AS ws,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS h
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
      GROUP BY 1, 2
    ),
    reg AS (
      SELECT ws, h >> 22 AS bucket,
             MAX(CASE WHEN h % 4194304 = 0 THEN 23
                      ELSE 23 - length(bin(h % 4194304)) END) AS r
      FROM h GROUP BY 1, 2
    ),
    agg AS (
      SELECT ws, COUNT(*) AS nz,
             CAST(SUM(8388608 >> r) AS BIGINT) AS present_sum
      FROM reg GROUP BY ws
    ),
    ex AS (
      SELECT time_bucket(INTERVAL 1 HOUR, ts) AS ws,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
      GROUP BY 1
    )
    SELECT a.ws,
           CAST(a.nz AS BIGINT) AS nz_buckets,
           CAST(a.present_sum + (1024 - a.nz) * 8388608 AS BIGINT)
               AS reg_sum_scaled,
           __HLL_NUM__ / CAST(
               a.present_sum + (1024 - a.nz) * 8388608 AS DOUBLE
           ) AS hll_est,
           ex.exact_distinct
    FROM agg a JOIN ex ON ex.ws = a.ws
    ORDER BY a.ws
""".replace("__HLL_NUM__", repr(__import__(
    "lakehouse_sfc_spark.queries.sketchq", fromlist=["_HLL_NUM"]
)._HLL_NUM))


@register(
    "stream_distinct_hll",
    oracle=_SQL_HLL_STREAM,
)
def stream_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming distinct users per 1-hour window as mergeable HLL
    registers (streaming/pipeline.py::run_stream_distinct_hll): streaming
    state is the (window × bucket) max(rho) register table — O(windows·m)
    regardless of event volume, where exact streaming COUNT(DISTINCT)
    state grows with the user universe; the per-window rollup is a tiny
    batch reduce over the sink, and that reduce IS the sketch-merge
    operation (per-shard / per-day sketches union the same way).
    Estimator and register layout shared with sketch_hll_distinct
    (queries/sketchq.py)."""
    from lakehouse_sfc_spark.streaming import run_stream_distinct_hll

    return run_stream_distinct_hll(spark, sf_dir)


@register(
    "stream_cms_topk",
    oracle="""
    WITH ev AS (
      SELECT time_bucket(INTERVAL 1 HOUR, ts) AS ws, user_id
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ),
    pairs AS (
      SELECT ws, i.i AS i,
             ('0x' || substr(md5(i.i || ':' || user_id), 1, 8))::BIGINT
               % 512 AS b
      FROM ev, LATERAL (SELECT unnest(range(0, 4)) AS i) i
    ),
    counters AS (SELECT ws, i, b, COUNT(*) AS c FROM pairs GROUP BY 1, 2, 3),
    exact AS (
      SELECT ws, user_id, exact_cnt FROM (
        SELECT ws, user_id, COUNT(*) AS exact_cnt,
               ROW_NUMBER() OVER (PARTITION BY ws
                                  ORDER BY COUNT(*) DESC, user_id) AS rn
        FROM ev GROUP BY ws, user_id
      ) WHERE rn <= 5
    ),
    probes AS (
      SELECT e.ws, e.user_id, e.exact_cnt, i.i AS i,
             ('0x' || substr(md5(i.i || ':' || e.user_id), 1, 8))::BIGINT
               % 512 AS b
      FROM exact e, LATERAL (SELECT unnest(range(0, 4)) AS i) i
    )
    SELECT p.ws,
           CAST(p.user_id AS BIGINT) AS user_id,
           CAST(p.exact_cnt AS BIGINT) AS exact_cnt,
           CAST(MIN(c.c) AS BIGINT) AS est_cnt,
           CAST(MIN(c.c) - p.exact_cnt AS BIGINT) AS overestimate
    FROM probes p
    JOIN counters c ON c.ws = p.ws AND c.i = p.i AND c.b = p.b
    GROUP BY p.ws, p.user_id, p.exact_cnt
    ORDER BY p.ws, exact_cnt DESC, user_id
    """,
)
def stream_cms_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming per-window heavy hitters via Count-Min Sketch counters
    as stream state (streaming/pipeline.py::run_stream_cms_topk): the
    state is the (window × 4 × 512) counter grid — bounded no matter how
    many distinct users arrive, and cell-wise ADDITIVE, so micro-batches,
    shards and days all merge by the same groupBy-SUM.  The exact
    per-window top-5 probe (batch-side harness) reads est = min over the
    key's 4 cells; overestimate exposes the collision load.  Layout
    shared with sketch_cms_heavy_hitters."""
    from lakehouse_sfc_spark.streaming import run_stream_cms_topk

    return run_stream_cms_topk(spark, sf_dir)


@register(
    "stream_dedup",
    oracle="""
    WITH uniq AS (SELECT DISTINCT event_id, event_type, value FROM events)
    SELECT event_type,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM uniq
    GROUP BY 1
    """,
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup under at-least-once delivery: every event
    arrives twice (stream unioned with itself), passes
    ``dropDuplicatesWithinWatermark`` on event_id (state bounded by the
    watermark, unlike ``dropDuplicates``), and the downstream aggregate must
    equal the batch aggregate over DISTINCT source events.  At-least-once
    redelivery means duplicate event_ids carry identical payloads — the
    oracle's DISTINCT collapses them exactly as the stream's keyed dedup
    does (a source with CONFLICTING payloads under one event_id is outside
    the contract: first-arrival-wins is inherently nondeterministic)."""
    from lakehouse_sfc_spark.streaming import run_stream_dedup

    return run_stream_dedup(spark, sf_dir)


@register(
    "stream_static_join",
    oracle="""
    SELECT c.c_mktsegment AS c_mktsegment,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1
    """,
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static dimension enrichment: the events stream joins the
    static customer dim (broadcast per micro-batch, no stream-side shuffle)
    and aggregates per segment; with the backlog processed the result must
    equal the batch join."""
    from lakehouse_sfc_spark.streaming import run_stream_static_join

    return run_stream_static_join(spark, sf_dir)


_GAP_MIN = 30


@register(
    "stream_session_window",
    oracle=f"""
    WITH o AS (
      SELECT user_id, ts, value,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ), marked AS (
      SELECT user_id, ts, value,
             CASE WHEN prev_ts IS NULL
                       OR ts - prev_ts > INTERVAL {_GAP_MIN} MINUTES
                  THEN 1 ELSE 0 END AS is_start
      FROM o
    ), sess AS (
      SELECT user_id, ts, value,
             SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL {_GAP_MIN} MINUTES AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM sess
    GROUP BY user_id, sid
    """,
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap sessionization via the BUILT-IN streaming ``session_window``
    operator (state-store session merging) — the API-coverage complement to
    ``sessionize_stateful``'s custom applyInPandasWithState path.  Spark's
    emitted window end is last_event_ts + gap by contract, mirrored in the
    oracle as MAX(ts) + 30 minutes; the complete-mode AvailableNow replay
    emits every session including open tails, so stream == batch."""
    from lakehouse_sfc_spark.streaming import run_session_window_agg

    return run_session_window_agg(spark, sf_dir)


@register(
    "sessionize_events",
    oracle=f"""
    WITH o AS (
      SELECT user_id, ts, value,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ), marked AS (
      SELECT user_id, ts, value,
             CASE WHEN prev_ts IS NULL
                       OR ts - prev_ts > INTERVAL {_GAP_MIN} MINUTES
                  THEN 1 ELSE 0 END AS is_start
      FROM o
    ), sess AS (
      SELECT user_id, ts, value,
             SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id, session_id::BIGINT AS session_id,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM sess
    GROUP BY user_id, session_id
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min timeout) as lag + running sum of
    session starts — the batch semantics the stateful streaming operator
    (streaming/pipeline.py::sessionize_stateful) implements incrementally."""
    ev = load_table(spark, sf_dir, "events")
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev = F.lag("ts").over(order)
    # timestamp-typed gap test (NTZ-safe on Spark 4.x, where a direct
    # TIMESTAMP_NTZ -> BIGINT cast is rejected); matches the oracle's
    # `ts - prev_ts > INTERVAL 30 MINUTES`
    is_start = F.when(
        prev.isNull()
        | (F.col("ts") > prev + F.expr(f"INTERVAL {_GAP_MIN} MINUTES")),
        1,
    ).otherwise(0)
    sess = ev.select(
        "user_id",
        "ts",
        "value",
        F.sum(is_start).over(run).alias("session_id"),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,4)"))
        .cast("double")
        .alias("sum_value"),
    )


@register(
    "sessionize_stateful",
    oracle=f"""
    WITH o AS (
      SELECT user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ), marked AS (
      SELECT user_id, ts,
             CASE WHEN prev_ts IS NULL
                       OR ts - prev_ts > INTERVAL {_GAP_MIN} MINUTES
                  THEN 1 ELSE 0 END AS is_start
      FROM o
    ), sess AS (
      SELECT user_id, ts,
             SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id, session_id::BIGINT AS session_id,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events
    FROM sess
    GROUP BY user_id, session_id
    """,
)
def sessionize_stateful_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CUSTOM STATEFUL streaming sessionizer (applyInPandasWithState,
    streaming/pipeline.py::sessionize_stateful_complete) run over the full
    events backlog plus per-user end-of-stream punctuation, so every session
    — including each user's open tail — is emitted and the result equals the
    batch gap-sessionization oracle exactly (same session aggregation SQL as
    ``sessionize_events``, minus the order-sensitive float sum)."""
    from lakehouse_sfc_spark.streaming import sessionize_stateful_complete

    return sessionize_stateful_complete(spark, sf_dir)


@register(
    "stream_sliding_agg",
    oracle="""
    WITH e AS (
      SELECT time_bucket(INTERVAL 30 MINUTES, ts) AS ws, event_type, value
      FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL 30 MINUTES, ts) - INTERVAL 30 MINUTES,
             event_type, value
      FROM events
    )
    SELECT ws, event_type, COUNT(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM e GROUP BY 1, 2
    """,
)
def stream_sliding_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour windows every 30 minutes as a real Structured
    Streaming job: each event is assigned to its window/slide = 2
    overlapping windows inside the state-store aggregation (watermark-
    bounded state).  The oracle replicates the assignment as a UNION ALL of
    the two shifted 30-minute buckets — every window start is the bucket of
    ts or the bucket minus one slide."""
    from lakehouse_sfc_spark.streaming import run_sliding_agg

    return run_sliding_agg(spark, sf_dir)


@register(
    "stream_cdc_tombstones",
    oracle="""
    WITH ops AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'click' THEN 'delete'
                  ELSE 'upsert' END AS op,
             value
      FROM events
    ),
    last AS (
      SELECT user_id, event_id, op, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM ops
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(event_id AS BIGINT) AS last_event_id,
           value AS last_value
    FROM last WHERE rn = 1 AND op = 'upsert'
    ORDER BY user_id
    """,
)
def stream_cdc_tombstones_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC apply WITH DELETES: the events backlog becomes a
    per-user changelog (click = DELETE, else UPSERT), split across 4
    deliberately UNORDERED source files and MERGEd micro-batch by
    micro-batch as latest-wins TOMBSTONE rows — the live view (op !=
    'delete') must equal the batch last-op-per-key query regardless of
    batch arrival order, which is exactly what tombstones buy over hard
    deletes (a hard delete resurrects on a stale late upsert).  Ties on
    (ts) break by event_id DESC on both sides
    (streaming/pipeline.py::stream_cdc_tombstones)."""
    from lakehouse_sfc_spark.streaming import stream_cdc_tombstones

    return stream_cdc_tombstones(spark, sf_dir)


@register(
    "stream_upsert_ingest",
    oracle="""
    WITH uniq AS (SELECT DISTINCT event_id, event_type, value FROM events)
    SELECT event_type,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM uniq
    GROUP BY 1
    """,
)
def stream_upsert_ingest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lakehouse streaming WRITE path: the events backlog, delivered
    at-least-once (two copies across 4 source files), ingested micro-batch
    by micro-batch via foreachBatch MERGE into the native sidecar table
    (bootstrap layout_write, then file-scoped latest-wins upserts keyed on
    event_id).  The final table must equal the DISTINCT source events —
    idempotent keyed MERGE gives exactly-once table state from an
    at-least-once stream (streaming/pipeline.py::stream_upsert_ingest).
    As with stream_dedup, redelivered copies carry identical payloads, so
    one row per event_id survives on both sides."""
    from lakehouse_sfc_spark.streaming import stream_upsert_ingest

    return stream_upsert_ingest(spark, sf_dir)


@register(
    "stream_interval_join",
    oracle="""
    WITH pairs AS (
      SELECT p.event_id AS p_id, p.value AS p_value, c.event_id AS c_id
      FROM events p
      JOIN events c
        ON p.event_type = 'purchase' AND c.event_type = 'click'
       AND p.user_id = c.user_id
       AND c.ts >= p.ts - INTERVAL 1 HOUR
       AND c.ts <= p.ts
    ),
    per_purchase AS (
      SELECT p_id, COUNT(*) AS n_clicks, MIN(p_value) AS p_value
      FROM pairs GROUP BY p_id
    )
    SELECT CAST(SUM(n_clicks) AS BIGINT) AS n_pairs,
           COUNT(*) AS n_purchases_matched,
           MAX(n_clicks) AS max_clicks_per_purchase,
           CAST(SUM(CAST(p_value AS DECIMAL(18,4))) AS DOUBLE)
             AS matched_value
    FROM per_purchase
    """,
)
def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream interval join (purchase ⋈ same-user
    clicks in the preceding hour), driven over the full backlog with
    AvailableNow; the appended join output reduced to attribution totals
    must equal the batch interval join the oracle runs.  Both streams are
    watermarked and the predicate bounds event time on both ends, so join
    state expires — bounded memory on an unbounded stream."""
    from lakehouse_sfc_spark.streaming import run_stream_interval_join

    return run_stream_interval_join(spark, sf_dir)


@register(
    "stream_topk_trending",
    oracle="""
    WITH w AS (
      SELECT time_bucket(INTERVAL 1 DAY, ts) AS ws,
             event_type,
             COUNT(*) AS cnt
      FROM events GROUP BY 1, 2
    )
    SELECT ws, event_type, cnt, rk
    FROM (
      SELECT ws, event_type, cnt,
             ROW_NUMBER() OVER (
               PARTITION BY ws ORDER BY cnt DESC, event_type
             ) AS rk
      FROM w
    ) WHERE rk <= 2
    ORDER BY ws, rk
    """,
)
def stream_topk_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending event types: the tumbling-window streaming aggregation
    (1-day windows, watermark + state-store agg, AvailableNow replay)
    reduced to the top-2 types per window — the live "what's trending"
    board.  The ranking is a batch window over the WINDOWED AGGREGATE
    (|windows|×|types| rows), not the event stream, so the streaming
    state stays the plain windowed count; ties break on event_type."""
    from pyspark.sql import Window as W

    from lakehouse_sfc_spark.streaming import run_tumbling_agg

    agg = run_tumbling_agg(spark, sf_dir, window="1 day", watermark="2 hours")
    rk = F.row_number().over(
        W.partitionBy("ws").orderBy(F.desc("cnt"), "event_type")
    )
    return (
        agg.select("ws", "event_type", "cnt")
        .withColumn("rk", rk)
        .filter(F.col("rk") <= 2)
        .orderBy("ws", "rk")
    )


@register(
    "stream_asof_enrich",
    oracle="""
    WITH f AS (
      SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase'
    ),
    d AS (
      SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'signup'
    ),
    best AS (
      SELECT f.event_id,
             first(d.event_id ORDER BY d.ts DESC, d.event_id DESC)
               AS dim_event_id,
             first(d.value ORDER BY d.ts DESC, d.event_id DESC)
               AS dim_value,
             first(d.ts ORDER BY d.ts DESC, d.event_id DESC) AS dim_ts
      FROM f JOIN d
        ON f.user_id = d.user_id
       AND (d.ts < f.ts OR (d.ts = f.ts AND d.event_id < f.event_id))
      GROUP BY f.event_id
    )
    SELECT f.event_id, f.user_id, f.value AS purchase_value,
           b.dim_event_id, b.dim_value,
           CAST((epoch_us(f.ts) - epoch_us(b.dim_ts)) // 1000000 AS BIGINT)
             AS age_s
    FROM f LEFT JOIN best b ON f.event_id = b.event_id
    ORDER BY f.event_id
    """,
)
def stream_asof_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful stream AS-OF enrichment (the SCD shape): every purchase is
    decorated with the same user's latest signup event at or before it —
    via applyInPandasWithState carrying ONE dimension version per key
    (state ∝ |users|, never the fact volume).  Built-in stream-stream
    joins can't express argmax-at-or-before; the oracle is the equivalent
    batch as-of join with the identical (ts, event_id) tie order
    (streaming/pipeline.py::run_stream_asof_enrich)."""
    from lakehouse_sfc_spark.streaming import run_stream_asof_enrich

    return run_stream_asof_enrich(spark, sf_dir)


@register(
    "stream_decontaminate",
    oracle=f"""
    WITH g AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(w)-3),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
                    w[i+3] || ' ' || w[i+4])) AS ng
      FROM (SELECT doc_id, {_SQL_TOKENS} AS w FROM documents)
    ),
    bench AS (SELECT doc_id AS b_id, unnest(ng) AS s
              FROM g WHERE doc_id % 23 = 0),
    train AS (SELECT doc_id, unnest(ng) AS s
              FROM g WHERE doc_id % 23 <> 0)
    SELECT t.doc_id,
           COUNT(DISTINCT t.s) AS n_hit,
           COUNT(DISTINCT b.b_id) AS n_bench_docs
    FROM train t JOIN bench b ON t.s = b.s
    GROUP BY t.doc_id
    ORDER BY t.doc_id
    """,
)
def stream_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming decontamination: contaminated documents are flagged at
    INGEST (stream-side shingles vs a broadcast static benchmark set)
    instead of in a batch sweep — the shape a continuously-fed training
    corpus needs.  Replaying the backlog must reproduce the batch
    ``text_decontaminate`` hit counts exactly."""
    from lakehouse_sfc_spark.streaming.pipeline import (
        run_stream_decontaminate,
    )

    return run_stream_decontaminate(spark, sf_dir).orderBy("doc_id")


@register(
    "stream_late_drop",
    oracle="""
    WITH base AS (
      SELECT event_id, ts, value,
             NTILE(4) OVER (ORDER BY ts, event_id) - 1 AS chunk
      FROM events WHERE ts IS NOT NULL AND event_id IS NOT NULL
    ),
    f AS (
      SELECT event_id, ts, value,
             CASE WHEN event_id % 37 = 0 AND chunk < 2
                  THEN chunk + 2 ELSE chunk END AS file
      FROM base
    ),
    m AS (SELECT file, MAX(ts) AS mx FROM f GROUP BY file),
    wm AS (
      SELECT k.r AS file,
             (SELECT MAX(mx) FROM m WHERE m.file <= k.r - 2)
                 - INTERVAL 1 HOUR AS fwm
      FROM (SELECT unnest(range(0, 4)) AS r) k
    ),
    kept AS (
      SELECT f.ts, f.value FROM f JOIN wm ON wm.file = f.file
      WHERE wm.fwm IS NULL
         OR time_bucket(INTERVAL 1 HOUR, f.ts) + INTERVAL 1 HOUR > wm.fwm
    ),
    tot AS (
      SELECT (SELECT COUNT(*) FROM f) - COUNT(*) AS dropped FROM kept
    )
    SELECT time_bucket(INTERVAL 1 HOUR, kept.ts) AS ws,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
           (SELECT CAST(dropped AS BIGINT) FROM tot) AS total_dropped
    FROM kept GROUP BY 1
    """,
)
def stream_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-data DROP accounting on a real Structured Streaming
    replay: a mostly-time-ordered backlog with deterministic stragglers
    displaced two micro-batches late, through a watermarked tumbling
    aggregation.  The oracle replays Spark's EXACT drop rule — a row in
    batch k is dropped iff its window end <= max(event time over batches
    0..k-2) - delay, i.e. the filter watermark lags two batches (probed
    empirically and pinned in tests/test_streaming_late.py) — so the
    windowed counts, value sums AND the total drop count must all agree.
    The one streaming entry whose result deliberately DIFFERS from the
    batch aggregate: the difference IS the measurement (how much data a
    1-hour watermark deletes from this stream)."""
    from lakehouse_sfc_spark.streaming.pipeline import run_late_drop

    return run_late_drop(spark, sf_dir)
