"""RQ7-style incremental-ingest drift experiment: write a base table with a
chosen layout, upsert N update batches, and re-run a fixed query set after
the base write and after every batch — measuring how layout quality decays
as unclustered data arrives.

Reference parity: scripts/run_RQ_7_matrix.sh:41-63 (10 batches of TPC-H sf4
upserted into a sf16 base, queries re-run per batch) with
build_tpch_update_batches.py supplying the batches and run_queries.py the
measurements.  Published numbers for this loop are in BASELINE.md (RQ7
summaries: batch-0 vs batches 1-10 elapsed/bytes-scanned drift).

Scale note: the per-batch upsert is one shuffle on the record key plus a
layout rewrite; at 100 TB the rewrite must be partition-scoped (the pruner's
file list bounds the rewrite set) — the full-table rewrite here matches the
reference experiment, which rewrites via engine clustering each batch.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from lakehouse_sfc_spark.layout.upsert import (
    build_update_batches,
    keyed_upsert,
    scoped_upsert,
)
from lakehouse_sfc_spark.layout.writer import layout_write
from lakehouse_sfc_spark.runner.runner import RunResult, run_one_query


def incremental_ingest_experiment(
    spark: SparkSession,
    base_df: DataFrame,
    updates_df: DataFrame,
    table_path: str,
    queries: dict[str, Callable[[DataFrame], DataFrame]],
    record_keys: list[str],
    precombine: str,
    n_batches: int = 10,
    layout: str = "baseline",
    layout_cols: list[str] | None = None,
    seed: int = 42,
    action: str = "count",
    scoped: bool = False,
    **run_kwargs,
) -> list[RunResult]:
    """Run the full RQ7 loop.  ``queries`` maps name -> (table DataFrame ->
    result DataFrame); each is measured against the table as written on disk
    (so file-skipping effects are visible).  Returns one RunResult per
    (batch, query), with ``batch`` recorded in ``metrics["batch"]``;
    batch 0 is the freshly-laid-out base table.

    ``scoped=True`` upserts through ``scoped_upsert`` — only files whose
    record-key ranges overlap each batch rewrite (O(overlap), the 100 TB
    path); requires sidecar stats on the record keys, which the base write
    here provides.
    """
    layout_write(
        base_df,
        table_path,
        layout=layout,
        layout_cols=layout_cols,
        stats_cols=sorted(set(record_keys) | set(layout_cols or [])),
    )
    batch_dir = table_path.rstrip("/") + "__batches"
    batch_paths = build_update_batches(
        updates_df, batch_dir, n_batches, seed=seed
    )

    results: list[RunResult] = []

    def _measure(batch_no: int) -> None:
        table = spark.read.parquet(table_path)
        for qname, qfn in queries.items():
            r = run_one_query(
                spark,
                qfn(table),
                name=qname,
                action=action,
                **run_kwargs,
            )
            r.metrics["batch"] = batch_no
            results.append(r)

    _measure(0)
    upsert_fn = scoped_upsert if scoped else keyed_upsert
    for i, bpath in enumerate(batch_paths, start=1):
        batch = spark.read.parquet(bpath)
        upsert_fn(
            table_path,
            batch,
            record_keys=record_keys,
            precombine=precombine,
            layout=layout,
            layout_cols=layout_cols,
        )
        _measure(i)
    return results


def results_by_batch(results: list[RunResult]) -> dict[int, dict[str, float]]:
    """batch -> {query: elapsed_s} pivot of experiment output — the shape of
    the reference's rq7 summary CSVs (notebooks/fig_rq7_tpch.py:33-77)."""
    out: dict[int, dict[str, float]] = {}
    for r in results:
        out.setdefault(r.metrics.get("batch", -1), {})[r.query] = round(
            r.elapsed_s, 6
        )
    return dict(sorted(out.items()))


def rq_matrix(
    spark: SparkSession,
    df: DataFrame,
    out_root: str,
    layouts: list[tuple[str, str, list[str] | None]],
    spec_dirs: dict[str, str],
    engine: str = "spark",
    table_name: str = "t",
    repeat: int = 1,
    warmup: int = 0,
    action: str = "count",
    stats_cols: list[str] | None = None,
    **write_kwargs,
):
    """RQ1-style engine-matrix sweep in one call: for every layout variant,
    write the table with that physical layout, run every spec's .sql files
    with full metrics, and drop per-run CSVs into the reference's results
    tree ``<out_root>/results/<engine>/<layout>/<spec>.csv`` — the exact
    shape ``collect_results`` (and the reference's
    scripts/parse_tpch_results.py:152-239) derives engine/layout/spec from.
    Finishes by round-tripping the tree through collect/average/viz so the
    sweep's geomean-speedup + per-query + ECDF summaries land under
    ``<out_root>/summary/``.

    ``layouts``: (variant_name, layout_kind, layout_cols) triples — variant
    names let one sweep compare two column orders of the same kind, as the
    reference's C*_N2_O* configs do (run_RQ_1_matrix.sh:59-68).

    Returns the averaged results frame.
    """
    import glob as _glob

    from lakehouse_sfc_spark.runner.results import (
        average_repeats,
        collect_results,
        viz_results,
    )
    from lakehouse_sfc_spark.runner.runner import run_sql_file, write_results_csv

    csv_paths: list[str] = []
    for variant, kind, cols in layouts:
        data_path = os.path.join(out_root, "data", variant)
        layout_write(
            df,
            data_path,
            layout=kind,
            layout_cols=cols,
            stats_cols=stats_cols if stats_cols is not None else cols,
            **write_kwargs,
        )
        spark.read.parquet(data_path).createOrReplaceTempView(table_name)
        for spec_name, sql_dir in spec_dirs.items():
            files = sorted(_glob.glob(os.path.join(sql_dir, "*.sql")))
            if not files:
                raise ValueError(f"no .sql files under {sql_dir}")
            results = [
                run_sql_file(
                    spark,
                    f,
                    name=os.path.splitext(os.path.basename(f))[0],
                    table_name=table_name,
                    action=action,
                    warmup=warmup,
                    repeat=repeat,
                )
                for f in files
            ]
            csv_path = os.path.join(
                out_root, "results", engine, variant, f"{spec_name}.csv"
            )
            write_results_csv(results, csv_path)
            csv_paths.append(csv_path)

    collected = collect_results(csv_paths)
    averaged = average_repeats(collected)
    summary_dir = os.path.join(out_root, "summary")
    os.makedirs(summary_dir, exist_ok=True)
    averaged.to_csv(os.path.join(summary_dir, "all_results.csv"), index=False)
    viz_results(averaged, summary_dir)
    return averaged
