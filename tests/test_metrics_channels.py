"""End-to-end exercise of the REST (M4) and event-log (M5) metric channels
plus event-log export (M10).  These need session confs the shared test
session doesn't have (UI server, event logging), so the scenario runs in a
subprocess with its own SparkSession and reports back as JSON."""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

import pytest

_SCRIPT = r"""
import json, sys, tempfile, os
sys.path.insert(0, "@@REPO@@")
log_dir = tempfile.mkdtemp(prefix="evlog")
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local[2]")
    .appName("metrics-e2e")
    .config("spark.ui.enabled", "true")
    .config("spark.ui.port", "4049")
    .config("spark.eventLog.enabled", "true")
    .config("spark.eventLog.compress", "false")
    .config("spark.eventLog.dir", log_dir)
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from lakehouse_sfc_spark.runner.runner import export_eventlogs, run_one_query
from lakehouse_sfc_spark.sources.loader import load_table

li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
df = li.filter("l_quantity > 10").groupBy("l_returnflag").count()
r = run_one_query(
    spark, df, name="m45", action="collect",
    collect_probe=True, collect_eventlog=True,
)
out_dir = os.path.join(log_dir, "export")
exported = export_eventlogs(spark, out_dir)
payload = {"metrics": {k: v for k, v in r.metrics.items()},
           "rows": r.rows, "exported": exported}
spark.stop()
print("RESULT_JSON:" + json.dumps(payload))
"""


@pytest.fixture(scope="module")
def channel_result():
    repo = str(Path(__file__).resolve().parents[1])
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT.replace("@@REPO@@", repo)],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [
        ln for ln in proc.stdout.splitlines() if ln.startswith("RESULT_JSON:")
    ][-1]
    return json.loads(line[len("RESULT_JSON:"):])


def test_rest_channel_reports_bytes(channel_result):
    m = channel_result["metrics"]
    assert m.get("rest_bytes_read", 0) > 0
    assert m.get("rest_executor_run_s", 0) >= 0


def test_eventlog_channel_reports_bytes(channel_result):
    m = channel_result["metrics"]
    assert m.get("ev_bytes_read", 0) > 0


def test_probe_and_plan_channels_agree_on_files(channel_result):
    m = channel_result["metrics"]
    # single-file table: every channel that counts files must say 1
    assert m["files_scanned"] == 1
    assert m["files_probe"] == 1


def test_eventlog_export_copies_files(channel_result):
    assert len(channel_result["exported"]) >= 1
