"""run_one_query: execute a query with job-group scoping, cache control,
warmup/repeat, a chosen action, and all metric channels — the engine's clone
of the reference benchmark loop (run_queries.py:597-705, 730-768) plus the
multi-statement stream handling of tpch_all_runner.py:25-61.
"""

from __future__ import annotations

import csv
import os
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from lakehouse_sfc_spark.runner.metrics import (
    eventlog_metrics,
    input_files_bytes,
    plan_scan_metrics,
    probe_files,
    rest_metrics,
)

_ACTIONS = ("count", "collect", "show")


@dataclass
class RunResult:
    query: str
    elapsed_s: float
    rows: int | None
    action: str
    repeats: int
    metrics: dict = field(default_factory=dict)

    def csv_row(self) -> dict:
        """Reference results-CSV shape (run_queries.py:737-742)."""
        m = self.metrics
        return {
            "query": self.query,
            "elapsedTime_s": round(self.elapsed_s, 6),
            "rows": self.rows,
            "bytesRead": m.get("rest_bytes_read", 0),
            "executorRunTime_s": m.get("rest_executor_run_s", 0.0),
            "executorCpuTime_s": m.get("rest_executor_cpu_s", 0.0),
            "bytes_input_files": m.get("bytes_input_files", 0),
            "files_scanned": m.get("files_scanned", 0),
            "bytes_scanned": m.get("bytes_scanned", 0),
            "files_scanned_ev": m.get("ev_files_read", 0),
            "bytes_scanned_ev": m.get("ev_bytes_read", 0),
            "executorRunTime_s_ev": m.get("ev_executor_run_s", 0.0),
            "executorCpuTime_s_ev": m.get("ev_executor_cpu_s", 0.0),
            "files_probe": m.get("files_probe", 0),
            "bytes_probe": m.get("bytes_probe", 0),
        }


def _action_df(df: DataFrame, action: str) -> DataFrame:
    """The dataset the action really executes.  Metrics must be read from
    THIS dataset's plan: ``df.count()`` would instantiate a fresh physical
    plan whose SQLMetrics never accumulate into ``df``'s own."""
    from pyspark.sql import functions as F

    if action == "count":
        return df.agg(F.count(F.lit(1)).alias("n"))
    if action == "collect":
        return df
    if action == "show":
        return df.limit(5)
    raise ValueError(f"action must be one of {_ACTIONS}")


def _run_action(adf: DataFrame, action: str) -> int | None:
    rows = adf.collect()
    if action == "count":
        return int(rows[0][0])
    if action == "collect":
        return len(rows)
    return None


def run_one_query(
    spark: SparkSession,
    query: str | DataFrame,
    name: str = "q",
    action: str = "count",
    warmup: int = 0,
    repeat: int = 1,
    clear_cache: bool = True,
    collect_probe: bool = False,
    collect_eventlog: bool = False,
) -> RunResult:
    """Execute ``query`` (SQL text or a DataFrame) and gather metrics.

    Mirrors the reference loop: clearCache → setJobGroup → warmup (discarded)
    → timed repeats (mean elapsed) → plan/inputFiles/REST collectors →
    optional probe re-query and event-log parse (run_queries.py:597-705).
    """
    df = spark.sql(query) if isinstance(query, str) else query
    if clear_cache:
        spark.catalog.clearCache()

    gid = f"lakehouse-sfc-{name}-{uuid.uuid4().hex[:8]}"
    sc = spark.sparkContext
    rows: int | None = None
    adf = _action_df(df, action)
    try:
        sc.setJobGroup(gid, f"query {name}", interruptOnCancel=False)
        for _ in range(warmup):
            _run_action(adf, action)
        t0 = time.time()
        for _ in range(repeat):
            rows = _run_action(adf, action)
        t1 = time.time()
    finally:
        sc.setJobGroup("", "", interruptOnCancel=False)

    elapsed = (t1 - t0) / max(repeat, 1)
    metrics: dict = {}
    metrics.update(plan_scan_metrics(adf))
    metrics.update(input_files_bytes(df))
    metrics.update(rest_metrics(spark, gid))
    if collect_probe:
        metrics.update(probe_files(df))
    if collect_eventlog:
        metrics.update(eventlog_metrics(spark, gid, t0, t1))
    return RunResult(
        query=name,
        elapsed_s=elapsed,
        rows=rows,
        action=action,
        repeats=repeat,
        metrics=metrics,
    )


def split_statements(sql_text: str) -> list[str]:
    """Split a multi-statement stream file on ';' respecting quotes and
    comments (tpch_all_runner.py:25-61)."""
    stmts: list[str] = []
    buf: list[str] = []
    in_squote = in_dquote = in_line_comment = in_block_comment = False
    i, n = 0, len(sql_text)
    while i < n:
        ch = sql_text[i]
        nxt = sql_text[i + 1] if i + 1 < n else ""
        if in_line_comment:
            buf.append(ch)
            if ch == "\n":
                in_line_comment = False
        elif in_block_comment:
            buf.append(ch)
            if ch == "*" and nxt == "/":
                buf.append(nxt)
                i += 1
                in_block_comment = False
        elif in_squote:
            buf.append(ch)
            if ch == "'":
                if nxt == "'":
                    buf.append(nxt)
                    i += 1
                else:
                    in_squote = False
        elif in_dquote:
            buf.append(ch)
            if ch == '"':
                in_dquote = False
        elif ch == "-" and nxt == "-":
            buf.append(ch)
            in_line_comment = True
        elif ch == "/" and nxt == "*":
            buf.append(ch)
            in_block_comment = True
        elif ch == "'":
            buf.append(ch)
            in_squote = True
        elif ch == '"':
            buf.append(ch)
            in_dquote = True
        elif ch == ";":
            stmt = "".join(buf).strip()
            if stmt:
                stmts.append(stmt)
            buf = []
        else:
            buf.append(ch)
        i += 1
    tail = "".join(buf).strip()
    if tail:
        stmts.append(tail)
    return stmts


def _strip_leading_comments(stmt: str) -> str:
    lines = []
    for line in stmt.splitlines():
        s = line.strip()
        if s.startswith("--") or not s:
            continue
        lines.append(line)
    return "\n".join(lines).strip()


def run_sql_file(
    spark: SparkSession,
    path: str,
    name: str | None = None,
    table_name: str | None = None,
    **kwargs,
) -> RunResult:
    """Run every statement of a stream file, measuring only the LAST SELECT
    (tpch_all_runner.py:56-61,229-252).  ``table_name`` substitutes the
    reference's ``{{tbl}}`` placeholder (run_queries.py:730,743-745)."""
    with open(path, encoding="utf-8") as fh:
        text = fh.read()
    if table_name:
        text = text.replace("{{tbl}}", table_name)
    stmts = split_statements(text)
    if not stmts:
        raise ValueError(f"no statements in {path}")
    selects = [
        i
        for i, s in enumerate(stmts)
        if _strip_leading_comments(s).lower().startswith(("select", "with"))
    ]
    measured_idx = selects[-1] if selects else len(stmts) - 1
    for i, stmt in enumerate(stmts):
        if i != measured_idx:
            spark.sql(stmt).collect()
    return run_one_query(
        spark,
        stmts[measured_idx],
        name=name or path.rsplit("/", 1)[-1],
        **kwargs,
    )


def cache_control(
    spark: SparkSession,
    table_or_df: str | DataFrame,
    mode: str = "none",
) -> DataFrame | None:
    """M7 cache modes (run_queries.py:550-566): ``cache_table`` issues
    CACHE TABLE; ``persist`` pins MEMORY_AND_DISK and materializes with a
    count; ``none`` clears the cache.  Returns the persisted DataFrame for
    later unpersist, when applicable."""
    if mode == "none":
        spark.catalog.clearCache()
        return None
    if mode == "cache_table":
        if not isinstance(table_or_df, str):
            raise ValueError("cache_table mode needs a table/view name")
        spark.sql(f"CACHE TABLE {table_or_df}")
        return None
    if mode == "persist":
        from pyspark import StorageLevel

        df = (
            spark.table(table_or_df)
            if isinstance(table_or_df, str)
            else table_or_df
        )
        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        df.count()
        return df
    raise ValueError("mode must be one of none|cache_table|persist")


def export_eventlogs(spark: SparkSession, out_dir: str) -> list[str]:
    """M10: copy the current application's event-log files for offline
    analysis (run_queries.py:569-594).  Returns copied paths; empty when
    event logging is disabled."""
    import glob
    import shutil

    conf = spark.sparkContext.getConf()
    if conf.get("spark.eventLog.enabled", "false").lower() != "true":
        return []
    log_dir = conf.get("spark.eventLog.dir", "")
    log_dir = log_dir.removeprefix("file://").removeprefix("file:")
    app_id = spark.sparkContext.applicationId
    os.makedirs(out_dir, exist_ok=True)
    copied = []
    patterns = (f"{app_id}*", f"eventlog_v2_{app_id}*")
    for pat in patterns:
        for src in sorted(glob.glob(os.path.join(log_dir, pat))):
            dst = os.path.join(out_dir, os.path.basename(src))
            if os.path.isdir(src):
                shutil.copytree(src, dst, dirs_exist_ok=True)
            else:
                shutil.copy2(src, dst)
            copied.append(dst)
    return copied


def write_results_csv(results: list[RunResult], path: str) -> None:
    """Per-query metric rows, one line each (run_queries.py:734-768)."""
    if not results:
        return
    parent = os.path.dirname(os.path.abspath(path))
    os.makedirs(parent, exist_ok=True)
    rows = [r.csv_row() for r in results]
    with open(path, "w", newline="", encoding="utf-8") as fh:
        writer = csv.DictWriter(fh, fieldnames=list(rows[0]))
        writer.writeheader()
        writer.writerows(rows)
