"""End-to-end check of the M4 (REST) and M5 (event log) metric channels
against the native pruner's deterministic files_scanned (SURVEY §2.11).

The shared test session runs with the UI and event log off, so this spawns a
dedicated subprocess session with both enabled — exactly how
``run-queries --rest --eventlog`` runs them — and asserts the independent
channels agree:

- M1 (executed-plan metrics) files == native pruner files_scanned
- M3 (input_file_name probe) files == native pruner files_scanned
- M4 REST: tasks/bytes observed, bytes == M5 bytes (same task set)
- M5 event log: files read accumulable == native pruner files_scanned

Reference parity: run_queries.py:251-369 (REST), :372-548 (event log).
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]

_SCRIPT = r"""
import json, sys, tempfile

repo = sys.argv[1]
sys.path.insert(0, repo)
out_dir = sys.argv[2]
log_dir = sys.argv[3]

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4]")
    .appName("m45-metrics-check")
    .config("spark.ui.enabled", "true")
    .config("spark.ui.port", "0")
    .config("spark.eventLog.enabled", "true")
    .config("spark.eventLog.dir", "file://" + log_dir)
    .config("spark.eventLog.compress", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from lakehouse_sfc_spark.layout.writer import layout_write
from lakehouse_sfc_spark.sources.loader import load_table
from lakehouse_sfc_spark.table.pruning import Pred, read_pruned
from lakehouse_sfc_spark.runner.runner import run_one_query

o = load_table(spark, "/root/testdata/sf0.001", "orders")
layout_write(
    o,
    out_dir,
    layout="linear",
    layout_cols=["o_custkey"],
    num_files=8,
    stats_cols=["o_custkey", "o_orderdate"],
)
preds = [Pred("o_custkey", "between", (1, 120))]
df, native = read_pruned(spark, out_dir, preds)

metrics = {}
for _ in range(3):  # event-log writes are async; retry until tasks appear
    res = run_one_query(
        spark, df, name="m45", collect_probe=True, collect_eventlog=True
    )
    metrics = res.metrics
    if metrics.get("ev_tasks", 0) > 0 and metrics.get("rest_tasks", 0) > 0:
        break

print(json.dumps({"native": native, "metrics": metrics}))
spark.stop()
"""


@pytest.mark.slow
def test_rest_and_eventlog_agree_with_native_pruner(tmp_path_factory):
    out_dir = str(tmp_path_factory.mktemp("m45_layout"))
    log_dir = str(tmp_path_factory.mktemp("m45_events"))
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT, str(REPO), out_dir, log_dir],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    payload = json.loads(proc.stdout.strip().splitlines()[-1])
    native, m = payload["native"], payload["metrics"]

    # the pruner really pruned (predicate selective on the zorder key)
    assert 1 <= native["files_scanned"] < native["files_total"]

    # M1 executed-plan metrics and M3 probe agree with the native channel
    assert m["files_scanned"] == native["files_scanned"]
    assert m["files_probe"] == native["files_scanned"]

    # M4 REST observed the job group's tasks and real input bytes
    assert m["rest_tasks"] > 0
    assert m["rest_bytes_read"] > 0
    assert m["rest_executor_run_s"] > 0

    # M5 event log: same task population as REST, native file count
    assert m["ev_tasks"] > 0
    assert m["ev_bytes_read"] == m["rest_bytes_read"]
    assert m["ev_files_read"] == native["files_scanned"]
