"""Structured Streaming surface: tumbling-window aggregation with watermark
and a custom stateful sessionizer (beyond the reference, which has no
streaming — SURVEY.md §2.9)."""

from lakehouse_sfc_spark.streaming.pipeline import (
    read_events_stream,
    run_stream_dedup,
    run_stream_static_join,
    run_session_window_agg,
    run_sliding_agg,
    run_stream_asof_enrich,
    run_stream_interval_join,
    run_stream_cms_topk,
    run_stream_distinct_hll,
    run_tumbling_agg,
    sessionize_stateful,
    sessionize_stateful_complete,
    stream_cdc_tombstones,
    stream_upsert_ingest,
)

__all__ = [
    "read_events_stream",
    "run_stream_dedup",
    "run_stream_static_join",
    "run_session_window_agg",
    "run_sliding_agg",
    "run_stream_asof_enrich",
    "run_stream_interval_join",
    "run_stream_cms_topk",
    "run_stream_distinct_hll",
    "run_tumbling_agg",
    "sessionize_stateful",
    "sessionize_stateful_complete",
    "stream_cdc_tombstones",
    "stream_upsert_ingest",
]
