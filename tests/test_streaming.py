"""Structured Streaming tests: AvailableNow tumbling agg equals the batch
aggregation; the stateful sessionizer's closed sessions agree with the batch
sessionization (its open tail session per user stays in state)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_sfc_spark.queries.registry import QUERIES
from lakehouse_sfc_spark.sources.loader import load_table
from lakehouse_sfc_spark.streaming import run_tumbling_agg, sessionize_stateful

SF = "/root/testdata/sf0.001"


def test_tumbling_agg_matches_batch(spark):
    stream = run_tumbling_agg(spark, SF)
    ev = load_table(spark, SF, "events")
    batch = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(F.col("w.start").alias("ws"), "event_type", "cnt", "sum_value")
    )
    s = {tuple(r) for r in stream.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert s == b
    assert len(s) > 0


def test_stateful_sessionizer_agrees_with_batch(spark):
    closed = sessionize_stateful(spark, SF)
    batch = QUERIES["sessionize_events"].fn(spark, SF)

    c = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in closed.collect()
    }
    b = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in batch.collect()
    }
    # every closed streaming session must be a batch session
    assert c <= b
    # and only the open tail session per user may be missing
    missing = b - c
    users_missing = {m[0] for m in missing}
    assert len(missing) == len(users_missing), "at most one open session/user"
    # the missing one must be that user's LAST session
    last_by_user = {}
    for u, st, en, n in b:
        cur = last_by_user.get(u)
        if cur is None or st > cur[1]:
            last_by_user[u] = (u, st, en, n)
    for m in missing:
        assert m == last_by_user[m[0]]
    assert len(c) > 0


def test_stateful_sessionizer_complete_equals_batch(spark):
    """With end-of-stream punctuation every session — including each user's
    open tail — is emitted, with its per-user 1-based ordinal: the stateful
    operator's output equals the batch sessionization exactly."""
    from lakehouse_sfc_spark.streaming import sessionize_stateful_complete

    full = sessionize_stateful_complete(spark, SF)
    batch = QUERIES["sessionize_events"].fn(spark, SF)
    f = {
        (r["user_id"], r["session_id"], r["session_start"],
         r["session_end"], r["n_events"])
        for r in full.collect()
    }
    b = {
        (r["user_id"], r["session_id"], r["session_start"],
         r["session_end"], r["n_events"])
        for r in batch.collect()
    }
    assert f == b
    assert len(f) > 0


def test_events_backlog_single_file():
    """Pins the ordering contract documented at read_events_stream: the
    events backlog is ONE parquet file, so every AvailableNow replay
    ingests it as a single micro-batch and the watermark cannot drop rows
    mid-replay — the precondition for stream==batch oracle parity."""
    import glob

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        path = f"/root/testdata/{sf}/events.parquet"
        files = (
            glob.glob(f"{path}/*.parquet")
            if __import__("os").path.isdir(path)
            else [path]
        )
        assert len(files) == 1, (sf, files)


def test_asof_enrich_state_carries_across_microbatches(spark, tmp_path):
    """The single-file backlog exercises stream_asof_enrich in ONE
    micro-batch, so this test proves the cross-batch path: the backlog is
    split into two time-ordered files ingested one per trigger
    (maxFilesPerTrigger=1), so dimension versions seen in batch 0 must be
    HELD IN STATE to enrich batch-1 facts.  Result must equal the batch
    as-of join over the union."""
    import tempfile
    import uuid

    import duckdb
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupStateTimeout

    from lakehouse_sfc_spark.queries.registry import QUERIES
    from lakehouse_sfc_spark.streaming.pipeline import (
        _ASOF_OUT_SCHEMA,
        _ASOF_STATE_SCHEMA,
        _asof_enrich_fn,
        _replay_to_memory,
    )

    sf_dir = "/root/testdata/sf0.001"
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "signup")
    )
    cut = ev.agg(
        F.expr(
            "percentile_approx(cast(cast(ts as timestamp_ltz) as double),"
            " 0.5)"
        )
    ).collect()[0][0]
    ts_d = F.col("ts").cast("timestamp_ltz").cast("double")
    early = ev.filter(ts_d <= cut)
    late = ev.filter(ts_d > cut)
    assert early.count() > 0 and late.count() > 0
    d = str(tmp_path / "backlog")
    early.coalesce(1).write.parquet(d + "/f0=a")
    late.coalesce(1).write.parquet(d + "/f1=b")

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(d)
        .withColumn("ts", F.col("ts").cast("timestamp_ltz"))
        .select(
            "event_id",
            "user_id",
            "ts",
            "value",
            (F.col("event_type") == "signup").cast("int").alias("is_dim"),
        )
        .withWatermark("ts", "2 hours")
    )
    enriched = src.groupBy("user_id").applyInPandasWithState(
        _asof_enrich_fn,
        outputStructType=_ASOF_OUT_SCHEMA,
        stateStructType=_ASOF_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = f"asof_mb_{uuid.uuid4().hex[:8]}"
    got = _replay_to_memory(
        spark, enriched, name, "lakehouse-sfc-asofmb-", "append", 300
    ).orderBy("event_id")

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    want = con.execute(QUERIES["stream_asof_enrich"].oracle).fetchall()
    got_rows = [tuple(r) for r in got.collect()]
    assert len(got_rows) == len(want)
    for g, w in zip(got_rows, want):
        assert g[0] == w[0] and g[1] == w[1], (g, w)
        assert g[3] == w[3] and g[5] == w[5], (g, w)
        assert (g[4] is None) == (w[4] is None) and (
            g[4] == w[4] or g[4] is None
        ), (g, w)


def test_mkworkdir_capacity_gate(monkeypatch, tmp_path):
    """_mkworkdir prefers tmpfs only above the 32 GiB free gate and falls
    back to the tempfile default otherwise (r11: replay workdirs moved off
    the stall-prone /tmp; the gate keeps small-RAM hosts safe)."""
    import os

    from lakehouse_sfc_spark.streaming import pipeline as P

    class _St:
        def __init__(self, avail):
            self.f_bavail = avail
            self.f_frsize = 1

    monkeypatch.setattr(os, "statvfs", lambda p: _St(64 << 30))
    d = P._mkworkdir("gate-test-")
    try:
        assert d.startswith("/dev/shm/spark-graft-stream/"), d
    finally:
        os.rmdir(d)

    monkeypatch.setattr(os, "statvfs", lambda p: _St(1 << 30))
    d = P._mkworkdir("gate-test-")
    try:
        assert not d.startswith("/dev/shm/"), d
    finally:
        os.rmdir(d)


def test_replay_checkpoint_removed(spark):
    """_replay_to_memory must not leave its checkpoint WAL behind (it now
    lands on RAM-backed tmpfs)."""
    import glob
    import os

    from lakehouse_sfc_spark.streaming import pipeline as P

    before = set(
        glob.glob("/dev/shm/spark-graft-stream/lakehouse-sfc-ckpt-test-*")
    ) | set(glob.glob(os.path.join(os.environ.get("TMPDIR", "/tmp"),
                                   "lakehouse-sfc-ckpt-test-*")))
    sdf = (
        P.read_events_stream(spark, "/root/testdata/sf0.001")
        .groupBy("event_type")
        .count()
    )
    P._replay_to_memory(
        spark, sdf, "ckpt_cleanup_probe", "lakehouse-sfc-ckpt-test-",
        "complete", 120,
    )
    after = set(
        glob.glob("/dev/shm/spark-graft-stream/lakehouse-sfc-ckpt-test-*")
    ) | set(glob.glob(os.path.join(os.environ.get("TMPDIR", "/tmp"),
                                   "lakehouse-sfc-ckpt-test-*")))
    assert after - before == set(), f"checkpoint dirs leaked: {after - before}"
