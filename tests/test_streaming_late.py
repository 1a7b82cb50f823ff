"""Pins Spark's watermark late-drop semantics that stream_late_drop's
oracle replays (empirically probed on PySpark 4.1; if an upgrade shifts
any of these, these tests fail loudly and the oracle must follow):

1. the filter watermark LAGS TWO BATCHES: batch k drops against
   max(event time over batches 0..k-2) - delay, not 0..k-1;
2. the drop boundary is INCLUSIVE: window end == filter watermark drops;
3. ``numRowsDroppedByWatermark`` counts rows arriving at the state
   operator (post map-side partial aggregation) — same-window rows
   dropped in one batch collapse to ONE counted row (the metric trap
   that makes it unusable as an input-row drop count).
"""

from __future__ import annotations

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F


def _write_batch(src: str, i: int, rows: list[str]) -> None:
    tbl = pa.table(
        {
            "ts": pa.array(
                [datetime.datetime.fromisoformat(r) for r in rows],
                type=pa.timestamp("us"),
            ),
            "v": pa.array([1] * len(rows), type=pa.int64()),
        }
    )
    p = os.path.join(src, f"batch-{i:02d}.parquet")
    pq.write_table(tbl, p)
    os.utime(p, (1_000_000 + i * 100,) * 2)


def _run(spark, src: str, ckpt: str, name: str):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    stream = (
        spark.readStream.schema("ts timestamp, v long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "0 seconds")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    drops = [
        op.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for op in p.get("stateOperators", [])
    ]
    final = {
        r["s"]: r["cnt"]
        for r in spark.sql(
            f"SELECT w.start AS s, MAX(cnt) AS cnt FROM {name} GROUP BY 1"
        ).collect()
    }
    return drops, final


def test_filter_watermark_lags_two_batches(spark, tmp_path):
    src = tmp_path / "src1"
    src.mkdir()
    # batch0 max 10:30; batch1's 09:59 (window end 10:00 < 10:30) survives
    # because the FILTER still holds the pre-batch0 watermark; batch2's
    # 09:58 hits the now-propagated 10:30 and drops
    _write_batch(str(src), 0, ["2020-01-01 10:30:00"])
    _write_batch(str(src), 1, ["2020-01-01 09:59:00"])
    _write_batch(str(src), 2, ["2020-01-01 09:58:00"])
    drops, final = _run(spark, str(src), str(tmp_path / "c1"), "late_lag")
    assert sum(drops) == 1
    h9 = datetime.datetime(2020, 1, 1, 9, 0)
    assert final[h9] == 1  # only batch1's row landed


def test_drop_boundary_is_inclusive(spark, tmp_path):
    src = tmp_path / "src2"
    src.mkdir()
    # filter wm at batch2 = max(batch0) = 10:00; a window ending EXACTLY
    # at 10:00 drops (end <= wm, not <)
    _write_batch(str(src), 0, ["2020-01-01 10:00:00"])
    _write_batch(str(src), 1, ["2020-01-01 10:00:00"])
    _write_batch(str(src), 2, ["2020-01-01 09:59:00"])
    drops, final = _run(spark, str(src), str(tmp_path / "c2"), "late_inc")
    assert sum(drops) == 1
    assert datetime.datetime(2020, 1, 1, 9, 0) not in final


def test_drop_metric_counts_partials_not_rows(spark, tmp_path):
    src = tmp_path / "src3"
    src.mkdir()
    # two same-window late rows in one batch collapse into ONE partial
    # before the state filter: 2 input rows vanish, the counter reads 1
    _write_batch(str(src), 0, ["2020-01-01 10:00:00"])
    _write_batch(str(src), 1, ["2020-01-01 10:00:00"])
    _write_batch(
        str(src), 2, ["2020-01-01 01:10:00", "2020-01-01 01:20:00"]
    )
    drops, final = _run(spark, str(src), str(tmp_path / "c3"), "late_tr")
    kept = sum(final.values())
    assert 4 - kept == 2  # two input rows really dropped
    assert sum(drops) == 1  # ...but the metric saw one partial


def test_stream_late_drop_totals_match_oracle_rule(spark):
    """End-to-end: the registry entry's total_dropped equals input minus
    survived under the two-batch-lag rule (the oracle's SQL replay is
    exercised by driver_sim; here we sanity-pin the Spark side alone)."""
    from lakehouse_sfc_spark.queries.registry import QUERIES
    import lakehouse_sfc_spark.queries  # noqa: F401

    df = QUERIES["stream_late_drop"].fn(spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert len(rows) > 0
    dropped = {r["total_dropped"] for r in rows}
    assert len(dropped) == 1  # one global count, repeated per row
    assert next(iter(dropped)) >= 0
