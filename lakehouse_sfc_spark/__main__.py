"""Command-line surface: ``python -m lakehouse_sfc_spark <command>``.

Mirrors the reference's user-facing entry points so a reference user can
switch tool-for-tool:

| command         | reference equivalent                                   |
|-----------------|--------------------------------------------------------|
| profile         | ``python -m wlg.cli profile`` (wlg/cli/main.py:567-607)|
| fill            | ``python -m wlg.cli fill``    (wlg/cli/main.py:75-561) |
| gen             | ``python -m wlg.cli gen``     (wlg/cli/main.py:613-665)|
| write-layout    | ``lakehouse_op/delta_write_layout.py`` (+hudi/iceberg) |
| compact         | Delta OPTIMIZE / Iceberg binpack rewrite               |
| run-queries     | ``lakehouse_op/run_queries.py::main``                  |
| update-batches  | ``lakehouse_op/build_tpch_update_batches.py``          |
| ingest-experiment | ``scripts/run_RQ_7_matrix.sh`` drift loop            |
| viz             | ``python -m wlg.cli viz``     (main.py:668-974)        |
| viz-results     | ``python -m wlg.cli viz-results`` (main.py:977-1189)   |
| advise          | ``notebooks/sql_layout_toolkit.py`` advisor            |

Every command is a thin argparse front over the library modules — all
logic (and all tests) live there.
"""

from __future__ import annotations

import argparse
import json
import sys


def _csv_list(s: str | None) -> list[str] | None:
    return [c.strip() for c in s.split(",") if c.strip()] if s else None


def _spark(args):
    from lakehouse_sfc_spark.session import get_spark

    extra = {}
    if getattr(args, "broadcast_hint", False):
        # reference: 50 MB opt-in threshold (run_queries.py:717,724-725)
        extra["spark.sql.autoBroadcastJoinThreshold"] = str(50 * 1024 * 1024)
    if getattr(args, "eventlog", False):
        # M5 channel needs event logging at session build (run_queries.py:51-52)
        import tempfile

        extra["spark.eventLog.enabled"] = "true"
        extra["spark.eventLog.compress"] = "false"
        extra["spark.eventLog.dir"] = tempfile.mkdtemp(prefix="lakehouse-evlog-")
    if getattr(args, "rest", False):
        extra["spark.ui.enabled"] = "true"
    return get_spark(extra_conf=extra or None)


def cmd_profile(args) -> int:
    from lakehouse_sfc_spark.profiler.profile import profile_df
    from lakehouse_sfc_spark.profiler.stats import save_yaml
    from lakehouse_sfc_spark.sources.loader import load_input_df

    spark = _spark(args)
    df = load_input_df(spark, args.input, fmt=args.format)
    if args.row_cap:
        df = df.limit(args.row_cap)
    stats, metadata = profile_df(df)
    save_yaml(stats, args.out, metadata=metadata)
    print(f"profiled {len(stats)} columns -> {args.out}")
    return 0


def cmd_fill(args) -> int:
    import yaml

    from lakehouse_sfc_spark.profiler.stats import load_yaml
    from lakehouse_sfc_spark.wlgen.fill import (
        fill_spec,
        write_sql_dir,
        write_workload,
    )

    with open(args.spec, encoding="utf-8") as fh:
        spec = yaml.safe_load(fh)
    stats_payload = None
    if args.stats:
        stats, _meta = load_yaml(args.stats)
        stats_payload = {"columns": {n: s.to_dict() for n, s in stats.items()}}
    outputs = fill_spec(spec, stats_payload=stats_payload, table=args.table)
    if args.out:
        write_workload(outputs, args.out)
    if args.sql_dir:
        paths = write_sql_dir(outputs, args.sql_dir)
        print(f"wrote {len(paths)} sql files -> {args.sql_dir}")
    print(f"filled {len(outputs)} queries")
    return 0


def cmd_gen(args) -> int:
    from lakehouse_sfc_spark.profiler.stats import load_yaml
    from lakehouse_sfc_spark.wlgen.fill import write_sql_dir, write_workload
    from lakehouse_sfc_spark.wlgen.gen import gen_workload

    stats, _meta = load_yaml(args.stats)
    outputs = gen_workload(
        stats,
        args.table,
        _csv_list(args.numeric_cols) or [],
        categorical_col=args.categorical_col,
        n=args.n,
        target_sel=args.target_sel,
        seed=args.seed,
        templates=tuple(args.templates.split(",")),
    )
    if args.out:
        write_workload(outputs, args.out)
    if args.sql_dir:
        # emit runnable SQL: substitute the sampled params as literals
        # (the workload.yaml keeps the raw template + params)
        from lakehouse_sfc_spark.wlgen.fill import render_sql

        filled = [
            {**row, "sql": render_sql(row["sql"], row["params"])}
            for row in outputs
        ]
        write_sql_dir(filled, args.sql_dir)
    print(f"generated {len(outputs)} queries")
    return 0


def cmd_gen_specs(args) -> int:
    import os

    import yaml

    from lakehouse_sfc_spark.wlgen.gen import (
        events_specs,
        materialize_rq1_spec,
        rq1_specs,
        rq2_specs,
    )

    descs = {
        "rq1": rq1_specs,
        "rq2": rq2_specs,
        "events": events_specs,
    }[args.matrix]()
    os.makedirs(args.out_dir, exist_ok=True)
    written = 0
    for desc in descs:
        for spec in materialize_rq1_spec(desc):
            tid = spec["templates"][0]["id"]
            path = os.path.join(args.out_dir, f"spec_{tid}.yaml")
            with open(path, "w", encoding="utf-8") as fh:
                yaml.safe_dump(spec, fh, sort_keys=False)
            written += 1
    print(f"wrote {written} spec files -> {args.out_dir}")
    return 0


def cmd_write_layout(args) -> int:
    from lakehouse_sfc_spark.layout.writer import layout_write
    from lakehouse_sfc_spark.sources.loader import load_input_df

    spark = _spark(args)
    df = load_input_df(spark, args.input, fmt=args.format)
    if args.where:
        df = df.filter(args.where)
    summary = layout_write(
        df,
        args.output,
        layout=args.layout,
        layout_cols=_csv_list(args.layout_cols),
        partition_by=_csv_list(args.partition_by),
        target_file_mb=args.target_file_mb,
        num_files=args.num_files,
        stats_cols=_csv_list(args.stats_cols),
        bloom_cols=_csv_list(args.bloom_cols),
    )
    print(json.dumps(summary))
    return 0


def cmd_compact(args) -> int:
    from lakehouse_sfc_spark.layout.writer import compact

    spark = _spark(args)
    summary = compact(
        spark,
        args.path,
        target_file_mb=args.target_file_mb,
        layout=args.layout,
        layout_cols=_csv_list(args.layout_cols),
        stats_cols=_csv_list(args.stats_cols),
    )
    print(json.dumps(summary))
    return 0


def cmd_run_queries(args) -> int:
    import glob
    import os

    from lakehouse_sfc_spark.runner.runner import (
        cache_control,
        run_sql_file,
        write_results_csv,
    )
    from lakehouse_sfc_spark.sources.loader import load_input_df

    spark = _spark(args)
    if not args.table_path and not args.tables_dir:
        print("one of --table-path / --tables-dir is required", file=sys.stderr)
        return 2
    if args.tables_dir:
        # register every parquet table in the dir (tpch_all_runner.py
        # registers all 8 TPC-H tables so multi-table stream files run);
        # load_table handles type quirks like TIMESTAMP(NANOS) in events
        from lakehouse_sfc_spark.sources.loader import load_table

        for f in sorted(glob.glob(os.path.join(args.tables_dir, "*.parquet"))):
            tname = os.path.splitext(os.path.basename(f))[0]
            load_table(spark, args.tables_dir, tname).createOrReplaceTempView(
                tname
            )
            if args.cache:
                cache_control(spark, tname, mode=args.cache)
    if args.table_path:
        df = load_input_df(spark, args.table_path, fmt=args.format)
        df.createOrReplaceTempView(args.table_name)
        if args.cache:
            cache_control(spark, args.table_name, mode=args.cache)
    # measuring cached performance means the per-query cache clear must be
    # off, or run_one_query would evict what cache_control just built
    keep_cache = bool(args.cache)
    files = sorted(glob.glob(os.path.join(args.queries_dir, "*.sql")))
    if not files:
        print(f"no .sql files under {args.queries_dir}", file=sys.stderr)
        return 2
    results = []
    for path in files:
        r = run_sql_file(
            spark,
            path,
            name=os.path.basename(path),
            action=args.action,
            warmup=args.warmup,
            repeat=args.repeat,
            table_name=args.table_name,
            clear_cache=not keep_cache,
            collect_probe=args.probe,
            collect_eventlog=args.eventlog,
        )
        results.append(r)
        print(f"{r.query}: {r.elapsed_s:.3f}s rows={r.rows}")
    if args.output_csv:
        write_results_csv(results, args.output_csv)
        print(f"wrote {args.output_csv}")
    return 0


def cmd_update_batches(args) -> int:
    from lakehouse_sfc_spark.layout.upsert import (
        build_update_batches,
        build_update_batches_ranged,
    )
    from lakehouse_sfc_spark.sources.loader import load_input_df

    spark = _spark(args)
    df = load_input_df(spark, args.input, fmt=args.format)
    builder = build_update_batches_ranged if args.ranged else build_update_batches
    paths = builder(df, args.output, n_batches=args.n_batches, seed=args.seed)
    print(f"wrote {len(paths)} batches -> {args.output}")
    return 0


def _parse_layout_arg(s: str) -> tuple[str, str, list[str] | None]:
    """``NAME=KIND:COL+COL`` / ``KIND:COL+COL`` / ``baseline`` ->
    (variant_name, layout_kind, cols)."""
    name, _, rest = s.partition("=")
    if not rest:
        name, rest = s.split(":", 1)[0] if ":" in s else s, s
    kind, _, cols = rest.partition(":")
    return name, kind, cols.split("+") if cols else None


def cmd_rq_matrix(args) -> int:
    import os

    from lakehouse_sfc_spark.runner.experiments import rq_matrix
    from lakehouse_sfc_spark.sources.loader import load_input_df

    spark = _spark(args)
    df = load_input_df(spark, args.input, fmt=args.format)
    layouts = [_parse_layout_arg(s) for s in args.layouts]
    specs = {}
    for s in args.specs:
        name, _, d = s.partition("=")
        if not d:
            name, d = os.path.basename(os.path.normpath(s)), s
        specs[name] = d
    averaged = rq_matrix(
        spark,
        df,
        args.output_root,
        layouts,
        specs,
        engine=args.engine,
        table_name=args.table_name,
        repeat=args.repeat,
        warmup=args.warmup,
        action=args.action,
        stats_cols=_csv_list(args.stats_cols),
    )
    print(
        f"swept {len(layouts)} layouts x {len(specs)} specs "
        f"({len(averaged)} rows) -> {args.output_root}/summary"
    )
    return 0


def cmd_ingest_experiment(args) -> int:
    from lakehouse_sfc_spark.runner.experiments import (
        incremental_ingest_experiment,
    )
    from lakehouse_sfc_spark.runner.runner import write_results_csv
    from lakehouse_sfc_spark.sources.loader import load_input_df

    spark = _spark(args)
    base = load_input_df(spark, args.base, fmt=args.format)
    updates = load_input_df(spark, args.updates, fmt=args.format)

    queries = {"count_all": lambda t: t}
    for q in args.query or []:
        name, _, expr = q.partition("=")
        if not expr:
            print(f"--query must be name=<filter expr>: {q!r}", file=sys.stderr)
            return 2
        queries[name] = lambda t, e=expr: t.filter(e)

    results = incremental_ingest_experiment(
        spark,
        base,
        updates,
        args.table_path,
        queries,
        record_keys=_csv_list(args.record_keys) or [],
        precombine=args.precombine,
        n_batches=args.n_batches,
        layout=args.layout,
        layout_cols=_csv_list(args.layout_cols),
        scoped=args.scoped,
    )
    for r in results:
        print(
            f"batch={r.metrics.get('batch')} {r.query}:"
            f" {r.elapsed_s:.3f}s rows={r.rows}"
        )
    if args.output_csv:
        write_results_csv(results, args.output_csv)
        print(f"wrote {args.output_csv}")
    return 0


def cmd_viz(args) -> int:
    import yaml

    from lakehouse_sfc_spark.runner.results import workload_coverage

    with open(args.workload, encoding="utf-8") as fh:
        workload = (yaml.safe_load(fh) or {}).get("workload", [])
    with open(args.stats, encoding="utf-8") as fh:
        stats = (yaml.safe_load(fh) or {}).get("columns", {})
    cov = workload_coverage(workload, stats, args.column)
    cov.to_csv(args.out, index=False)
    print(f"coverage for {args.column}: {len(cov)} queries -> {args.out}")
    return 0


def cmd_advise(args) -> int:
    import glob
    import os

    from lakehouse_sfc_spark.advisor.recommend import (
        column_cooccurrence,
        rank_tables,
        recommend_column_sets,
        score_workload,
    )
    from lakehouse_sfc_spark.advisor.sql_analyze import analyze_workload

    queries = {}
    for p in sorted(glob.glob(os.path.join(args.sql_dir, "*.sql"))):
        with open(p, encoding="utf-8") as fh:
            queries[os.path.basename(p)] = fh.read()
    if not queries:
        print(f"no .sql files under {args.sql_dir}", file=sys.stderr)
        return 2
    events = analyze_workload(queries)
    scores = score_workload(events)
    cooccur = column_cooccurrence(events)
    tables = rank_tables(scores, cooccur)
    out = {"tables": tables[: args.top_tables], "recommendations": {}}
    for row in tables[: args.top_tables]:
        table = row["table"]
        out["recommendations"][table] = recommend_column_sets(
            scores, cooccur, events, table
        )[: args.top_sets]
    print(json.dumps(out, indent=2, default=str))
    return 0


def cmd_viz_results(args) -> int:
    import glob
    import os

    from lakehouse_sfc_spark.runner.results import collect_results, viz_results

    csvs = sorted(
        glob.glob(os.path.join(args.results_dir, "**", "*.csv"), recursive=True)
    )
    if not csvs:
        print(f"no result CSVs under {args.results_dir}", file=sys.stderr)
        return 2
    df = collect_results(csvs)
    out = viz_results(df, args.out_dir, metric=args.metric)
    print(json.dumps({k: str(v) for k, v in out.items()}))
    return 0



def cmd_query(args) -> int:
    """Run one registry query by name (the same callable the driver
    contract exposes through __spark_entry__.queries())."""
    from lakehouse_sfc_spark.queries.registry import QUERIES
    import lakehouse_sfc_spark.queries  # noqa: F401  (register all)

    if args.list:
        for name in sorted(QUERIES):
            spec = QUERIES[name]
            kind = "oracle" if spec.oracle else "rows-only"
            print(f"{name}\t{kind}")
        return 0
    if args.name not in QUERIES:
        print(f"unknown query {args.name!r}; --list shows all", file=sys.stderr)
        return 2
    spark = _spark(args)
    df = QUERIES[args.name].fn(spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    if args.output_csv:
        df.persist()
        try:
            df.coalesce(1).write.mode("overwrite").option(
                "header", True
            ).csv(args.output_csv)
            n = df.count()  # served from the persisted result, no re-run
        finally:
            df.unpersist()
        print(json.dumps({"query": args.name, "rows": n,
                          "out": args.output_csv}))
    else:
        df.show(args.max_rows, truncate=False)
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m lakehouse_sfc_spark",
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    sub = p.add_subparsers(dest="command", required=True)

    sp = sub.add_parser("profile", help="profile a dataset into stats.yaml")
    sp.add_argument("--input", required=True)
    sp.add_argument("--format", default=None, help="csv/tsv/parquet/json")
    sp.add_argument("--out", required=True)
    sp.add_argument("--row-cap", type=int, default=None)
    sp.set_defaults(fn=cmd_profile)

    sp = sub.add_parser("fill", help="fill a workload spec with parameters")
    sp.add_argument("--spec", required=True)
    sp.add_argument("--stats", default=None)
    sp.add_argument("--table", default=None, help="substitutes {{tbl}}")
    sp.add_argument("--out", default=None, help="workload.yaml path")
    sp.add_argument("--sql-dir", default=None)
    sp.set_defaults(fn=cmd_fill)

    sp = sub.add_parser("gen", help="generate a workload from stats")
    sp.add_argument("--stats", required=True)
    sp.add_argument("--table", required=True)
    sp.add_argument("--numeric-cols", required=True)
    sp.add_argument("--categorical-col", default=None)
    sp.add_argument("--n", type=int, default=10)
    sp.add_argument("--target-sel", type=float, default=0.05)
    sp.add_argument("--seed", type=int, default=42)
    sp.add_argument("--templates", default="A,B,C")
    sp.add_argument("--out", default=None)
    sp.add_argument("--sql-dir", default=None)
    sp.set_defaults(fn=cmd_gen)

    sp = sub.add_parser(
        "gen-specs", help="emit the RQ1/RQ2 benchmark spec matrix as YAML"
    )
    sp.add_argument(
        "--matrix", choices=["rq1", "rq2", "events"], default="rq1"
    )
    sp.add_argument("--out-dir", required=True)
    sp.set_defaults(fn=cmd_gen_specs)

    sp = sub.add_parser("write-layout", help="write a table with a layout")
    sp.add_argument("--input", required=True)
    sp.add_argument("--format", default=None)
    sp.add_argument("--output", required=True)
    sp.add_argument(
        "--layout",
        default="baseline",
        choices=[
            "baseline", "no_layout", "hashed", "linear", "zorder",
            "z-order", "hilbert",
        ],
    )
    sp.add_argument("--layout-cols", default=None)
    sp.add_argument("--partition-by", default=None)
    sp.add_argument("--target-file-mb", type=int, default=128)
    sp.add_argument("--num-files", type=int, default=None)
    sp.add_argument("--stats-cols", default=None)
    sp.add_argument(
        "--bloom-cols", default=None,
        help="per-file Bloom filters for point-key file skipping",
    )
    sp.add_argument("--where", default=None, help="pre-write filter")
    sp.set_defaults(fn=cmd_write_layout)

    sp = sub.add_parser("compact", help="rewrite a table at target file size")
    sp.add_argument("--path", required=True)
    sp.add_argument("--target-file-mb", type=int, default=128)
    sp.add_argument("--layout", default="baseline")
    sp.add_argument("--layout-cols", default=None)
    sp.add_argument("--stats-cols", default=None)
    sp.set_defaults(fn=cmd_compact)

    sp = sub.add_parser("query", help="run a registry query by name")
    sp.add_argument("--name", default=None)
    sp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    sp.add_argument("--output-csv", default=None)
    sp.add_argument("--max-rows", type=int, default=50)
    sp.add_argument("--explain", action="store_true")
    sp.add_argument("--list", action="store_true", help="list query names")
    sp.set_defaults(fn=cmd_query)

    sp = sub.add_parser("run-queries", help="run a dir of .sql with metrics")
    sp.add_argument("--table-path", default=None, help="single table -> {{tbl}}")
    sp.add_argument(
        "--tables-dir",
        default=None,
        help="register every *.parquet in this dir as a view (stream queries)",
    )
    sp.add_argument("--format", default=None)
    sp.add_argument("--table-name", default="_tbl")
    sp.add_argument("--queries-dir", required=True)
    sp.add_argument("--output-csv", default=None)
    sp.add_argument("--action", default="count", choices=["count", "collect", "show"])
    sp.add_argument("--warmup", type=int, default=0)
    sp.add_argument("--repeat", type=int, default=1)
    sp.add_argument("--cache", default=None, choices=[None, "cache_table", "persist"])
    sp.add_argument("--broadcast-hint", action="store_true")
    sp.add_argument("--probe", action="store_true", help="input_file_name probe")
    sp.add_argument("--eventlog", action="store_true", help="M5 channel")
    sp.add_argument("--rest", action="store_true", help="M4 channel (UI on)")
    sp.set_defaults(fn=cmd_run_queries)

    sp = sub.add_parser("update-batches", help="split into N random batches")
    sp.add_argument("--input", required=True)
    sp.add_argument("--format", default=None)
    sp.add_argument("--output", required=True)
    sp.add_argument("--n-batches", type=int, default=10)
    sp.add_argument("--seed", type=int, default=42)
    sp.add_argument(
        "--ranged",
        action="store_true",
        help="distributed split (no single-task global sort) — the scale path",
    )
    sp.set_defaults(fn=cmd_update_batches)

    sp = sub.add_parser(
        "rq-matrix",
        help="RQ1-style sweep: layouts x specs -> results tree + summary",
    )
    sp.add_argument("--input", required=True)
    sp.add_argument("--format", default=None)
    sp.add_argument("--output-root", required=True)
    sp.add_argument(
        "--layout",
        action="append",
        required=True,
        dest="layouts",
        metavar="NAME=KIND:COL+COL",
        help="repeatable layout variant, e.g. baseline, zorder=zorder:a+b; "
        "include one named 'baseline' to anchor geomean speedups",
    )
    sp.add_argument(
        "--spec",
        action="append",
        required=True,
        dest="specs",
        metavar="NAME=SQL_DIR",
        help="repeatable spec: NAME=dir-of-.sql (or just a dir)",
    )
    sp.add_argument("--engine", default="spark")
    sp.add_argument("--table-name", default="t")
    sp.add_argument("--repeat", type=int, default=1)
    sp.add_argument("--warmup", type=int, default=0)
    sp.add_argument("--action", default="count")
    sp.add_argument("--stats-cols", default=None)
    sp.set_defaults(fn=cmd_rq_matrix)

    sp = sub.add_parser(
        "ingest-experiment",
        help="RQ7 drift loop: layout base, upsert N batches, re-measure",
    )
    sp.add_argument("--base", required=True)
    sp.add_argument("--updates", required=True)
    sp.add_argument("--format", default=None)
    sp.add_argument("--table-path", required=True)
    sp.add_argument("--record-keys", required=True)
    sp.add_argument("--precombine", required=True)
    sp.add_argument("--n-batches", type=int, default=10)
    sp.add_argument("--layout", default="baseline")
    sp.add_argument("--layout-cols", default=None)
    sp.add_argument("--scoped", action="store_true", help="O(overlap) upserts")
    sp.add_argument(
        "--query",
        action="append",
        help="name=<filter expr>, repeatable; measured per batch",
    )
    sp.add_argument("--output-csv", default=None)
    sp.set_defaults(fn=cmd_ingest_experiment)

    sp = sub.add_parser("viz", help="workload coverage table for one column")
    sp.add_argument("--workload", required=True, help="workload.yaml from fill/gen")
    sp.add_argument("--stats", required=True)
    sp.add_argument("--column", required=True)
    sp.add_argument("--out", required=True, help="coverage CSV path")
    sp.set_defaults(fn=cmd_viz)

    sp = sub.add_parser("advise", help="recommend layout keys from a workload")
    sp.add_argument("--sql-dir", required=True)
    sp.add_argument("--top-tables", type=int, default=3)
    sp.add_argument("--top-sets", type=int, default=5)
    sp.set_defaults(fn=cmd_advise)

    sp = sub.add_parser("viz-results", help="summaries/figures from results CSVs")
    sp.add_argument("--results-dir", required=True)
    sp.add_argument("--out-dir", required=True)
    sp.add_argument("--metric", default="elapsedTime_s")
    sp.set_defaults(fn=cmd_viz_results)

    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
