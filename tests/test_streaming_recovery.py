"""Checkpoint recovery: a streaming aggregation killed mid-backlog and
restarted from the SAME checkpoint must converge to exactly the batch
result — no lost batches, no double counting.  This is the exactly-once
contract the engine's streaming surface rests on; a checkpoint format or
offset-tracking regression shows up here before it corrupts any sink."""

from __future__ import annotations

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F


def _write_batches(src: str, n_files: int, rows_per_file: int):
    """Deterministic (ts, v) rows spread over n_files mtime-ordered files."""
    total = []
    for i in range(n_files):
        rows = [
            (
                datetime.datetime(2020, 1, 1)
                + datetime.timedelta(minutes=17 * (i * rows_per_file + r)),
                (i * rows_per_file + r) % 100,
            )
            for r in range(rows_per_file)
        ]
        total.extend(rows)
        tbl = pa.table(
            {
                "ts": pa.array([t for t, _ in rows], type=pa.timestamp("us")),
                "v": pa.array([v for _, v in rows], type=pa.int64()),
            }
        )
        p = os.path.join(src, f"batch-{i:02d}.parquet")
        pq.write_table(tbl, p)
        os.utime(p, (1_000_000 + i * 100,) * 2)
    return total


def _agg_stream(spark, src: str):
    return (
        spark.readStream.schema("ts timestamp, v long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("v").alias("sv"))
    )


def test_restart_from_checkpoint_is_exactly_once(spark, tmp_path):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src = tmp_path / "src"
    src.mkdir()
    rows = _write_batches(str(src), 6, 50)
    ckpt = str(tmp_path / "ckpt")

    # run 1: process a PREFIX of the backlog, then stop mid-stream
    q1 = (
        _agg_stream(spark, str(src))
        .writeStream.format("memory")
        .queryName("rec_run1")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .start()
    )
    while not q1.recentProgress:
        pass  # at least one batch committed
    q1.stop()
    q1.awaitTermination(60)
    done1 = {p["batchId"] for p in q1.recentProgress}
    assert len(done1) < 6, "run 1 consumed everything; nothing to recover"

    # run 2: SAME checkpoint, fresh query — finish the backlog
    q2 = (
        _agg_stream(spark, str(src))
        .writeStream.format("memory")
        .queryName("rec_run2")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    # offsets resumed, not replayed from zero
    done2 = {p["batchId"] for p in q2.recentProgress if p["numInputRows"]}
    assert not (done1 & done2), "restart reprocessed committed batches"

    got = {
        r["s"]: (r["cnt"], r["sv"])
        for r in spark.sql(
            "SELECT w.start AS s, cnt, sv FROM rec_run2"
        ).collect()
    }
    # exactly-once: equals the plain batch aggregate over the full backlog
    import collections

    exp: dict = collections.defaultdict(lambda: [0, 0])
    for t, v in rows:
        ws = t.replace(minute=0, second=0, microsecond=0)
        exp[ws][0] += 1
        exp[ws][1] += v
    assert got == {k: tuple(v) for k, v in exp.items()}
