"""Query runner + scan-metric instrumentation (SURVEY.md §2.11 M1-M10)."""

from lakehouse_sfc_spark.runner.metrics import (
    eventlog_metrics,
    input_files_bytes,
    plan_scan_metrics,
    probe_files,
    rest_metrics,
)
from lakehouse_sfc_spark.runner.runner import (
    RunResult,
    run_one_query,
    run_sql_file,
    split_statements,
    write_results_csv,
)

__all__ = [
    "plan_scan_metrics",
    "input_files_bytes",
    "probe_files",
    "rest_metrics",
    "eventlog_metrics",
    "RunResult",
    "run_one_query",
    "run_sql_file",
    "split_statements",
    "write_results_csv",
]
