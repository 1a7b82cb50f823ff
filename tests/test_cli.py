"""CLI surface tests: ``python -m lakehouse_sfc_spark <cmd>`` fronts the
library the way the reference's entry points front theirs (wlg.cli,
lakehouse_op/run_queries.py, delta_write_layout.py)."""

from __future__ import annotations

import os

import yaml

from lakehouse_sfc_spark.__main__ import build_parser, main

SF = "/root/testdata/sf0.001"


def test_parser_covers_reference_entry_points():
    p = build_parser()
    subs = next(
        a for a in p._actions if a.__class__.__name__ == "_SubParsersAction"
    )
    assert {
        "profile",
        "fill",
        "gen",
        "write-layout",
        "compact",
        "run-queries",
        "update-batches",
        "viz-results",
    } <= set(subs.choices)


def test_profile_gen_fill_runqueries_roundtrip(spark, tmp_path):
    stats = tmp_path / "stats.yaml"
    assert (
        main(
            [
                "profile",
                "--input",
                f"{SF}/lineitem.parquet",
                "--out",
                str(stats),
            ]
        )
        == 0
    )
    payload = yaml.safe_load(stats.read_text())
    assert "l_quantity" in payload["columns"]

    sql_dir = tmp_path / "sql"
    assert (
        main(
            [
                "gen",
                "--stats",
                str(stats),
                "--table",
                "{{tbl}}",
                "--numeric-cols",
                "l_quantity,l_discount",
                "--categorical-col",
                "l_returnflag",
                "--n",
                "2",
                "--sql-dir",
                str(sql_dir),
                "--out",
                str(tmp_path / "workload.yaml"),
            ]
        )
        == 0
    )
    files = sorted(os.listdir(sql_dir))
    assert files and all(f.endswith(".sql") for f in files)
    # emitted SQL is literal (runnable), not a parameter template
    text = (sql_dir / files[0]).read_text()
    assert ":" not in text.replace("::", "")

    out_csv = tmp_path / "r" / "ours" / "baseline" / "demo.csv"
    assert (
        main(
            [
                "run-queries",
                "--table-path",
                f"{SF}/lineitem.parquet",
                "--table-name",
                "lineitem",
                "--queries-dir",
                str(sql_dir),
                "--output-csv",
                str(out_csv),
            ]
        )
        == 0
    )
    header = out_csv.read_text().splitlines()[0]
    assert header.startswith("query,elapsedTime_s,rows,bytesRead")

    viz_dir = tmp_path / "viz"
    assert (
        main(
            [
                "viz-results",
                "--results-dir",
                str(tmp_path / "r"),
                "--out-dir",
                str(viz_dir),
            ]
        )
        == 0
    )
    assert (viz_dir / "geomean_speedup.csv").exists()


def test_write_layout_and_compact(spark, tmp_path):
    out = tmp_path / "li_z"
    assert (
        main(
            [
                "write-layout",
                "--input",
                f"{SF}/lineitem.parquet",
                "--output",
                str(out),
                "--layout",
                "zorder",
                "--layout-cols",
                "l_shipdate,l_quantity",
                "--stats-cols",
                "l_shipdate,l_quantity",
            ]
        )
        == 0
    )
    assert (out / "_sfc_stats.json").exists()
    assert (
        main(
            [
                "compact",
                "--path",
                str(out),
                "--layout",
                "zorder",
                "--layout-cols",
                "l_shipdate,l_quantity",
            ]
        )
        == 0
    )


def test_fill_cli(tmp_path):
    spec = tmp_path / "spec.yaml"
    spec.write_text(
        """
generation: {n: 3, mode: random, seed: 42}
templates:
  - id: T1
    sql: "SELECT count(*) FROM {{tbl}} WHERE l_quantity BETWEEN :q_lo AND :q_hi"
    params:
      q_lo: {type: float, range: [1, 25]}
      q_hi: {type: float, range: [25, 50], constraint: "q_hi > q_lo"}
"""
    )
    sql_dir = tmp_path / "sql"
    assert (
        main(
            [
                "fill",
                "--spec",
                str(spec),
                "--table",
                "lineitem",
                "--sql-dir",
                str(sql_dir),
                "--out",
                str(tmp_path / "wl.yaml"),
            ]
        )
        == 0
    )
    texts = [p.read_text() for p in sorted(sql_dir.iterdir())]
    assert len(texts) == 3
    assert all("lineitem" in t and ":q_lo" not in t for t in texts)


def test_update_batches_cli(spark, tmp_path):
    out = tmp_path / "batches"
    assert (
        main(
            [
                "update-batches",
                "--input",
                f"{SF}/orders.parquet",
                "--output",
                str(out),
                "--n-batches",
                "3",
            ]
        )
        == 0
    )
    assert sorted(os.listdir(out)) == ["batch_01", "batch_02", "batch_03"]


def test_viz_and_advise_cli(spark, tmp_path):
    stats = tmp_path / "stats.yaml"
    main(["profile", "--input", f"{SF}/lineitem.parquet", "--out", str(stats)])
    wl = tmp_path / "workload.yaml"
    sql_dir = tmp_path / "sql"
    main(
        [
            "gen",
            "--stats",
            str(stats),
            "--table",
            "lineitem",
            "--numeric-cols",
            "l_quantity,l_discount",
            "--n",
            "2",
            "--out",
            str(wl),
            "--sql-dir",
            str(sql_dir),
        ]
    )
    cov = tmp_path / "cov.csv"
    assert (
        main(
            [
                "viz",
                "--workload",
                str(wl),
                "--stats",
                str(stats),
                "--column",
                "l_quantity",
                "--out",
                str(cov),
            ]
        )
        == 0
    )
    header = cov.read_text().splitlines()
    assert header[0].startswith("query_idx,column,lo,hi,width_ratio")
    assert len(header) > 1

    assert main(["advise", "--sql-dir", str(sql_dir)]) == 0


def test_ingest_experiment_cli(spark, tmp_path):
    out_csv = tmp_path / "rq7.csv"
    assert (
        main(
            [
                "ingest-experiment",
                "--base",
                f"{SF}/orders.parquet",
                "--updates",
                f"{SF}/orders.parquet",
                "--table-path",
                str(tmp_path / "tbl"),
                "--record-keys",
                "o_orderkey",
                "--precombine",
                "o_orderdate",
                "--n-batches",
                "2",
                "--layout",
                "linear",
                "--layout-cols",
                "o_orderdate",
                "--query",
                "urgent=o_orderpriority = '1-URGENT'",
                "--output-csv",
                str(out_csv),
            ]
        )
        == 0
    )
    lines = out_csv.read_text().splitlines()
    # (1 base + 2 batches) x 2 queries = 6 measured rows
    assert len(lines) == 7


def test_run_queries_stream_file_multi_table(spark, tmp_path):
    qdir = tmp_path / "stream"
    qdir.mkdir()
    (qdir / "q1.sql").write_text(
        """
-- stream file: setup statement, then the measured SELECT
CREATE OR REPLACE TEMP VIEW big_orders AS
  SELECT * FROM orders WHERE o_totalprice > 100000;
SELECT c.c_mktsegment, COUNT(*) AS cnt
FROM big_orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment;
"""
    )
    out_csv = tmp_path / "stream.csv"
    assert (
        main(
            [
                "run-queries",
                "--tables-dir",
                SF,
                "--queries-dir",
                str(qdir),
                "--output-csv",
                str(out_csv),
            ]
        )
        == 0
    )
    rows = out_csv.read_text().splitlines()
    assert len(rows) == 2 and rows[1].startswith("q1.sql")


def test_run_queries_cache_survives_measurement(spark, tmp_path):
    """--cache must not be evicted by the per-query cache clear (the whole
    point of the flag is measuring cached performance)."""
    qdir = tmp_path / "q"
    qdir.mkdir()
    (qdir / "q.sql").write_text("SELECT count(*) FROM {{tbl}};")
    assert (
        main(
            [
                "run-queries",
                "--table-path",
                f"{SF}/orders.parquet",
                "--table-name",
                "orders_cached",
                "--queries-dir",
                str(qdir),
                "--cache",
                "cache_table",
            ]
        )
        == 0
    )
    assert spark.catalog.isCached("orders_cached")
    spark.catalog.clearCache()


def test_gen_specs_cli(tmp_path):
    out = tmp_path / "specs"
    assert main(["gen-specs", "--matrix", "rq1", "--out-dir", str(out)]) == 0
    files = sorted(os.listdir(out))
    # 4 bands x 8 column configs x {range, point}
    assert len(files) == 64
    assert any("S1_l_shipdate_l_quantity_range" in f for f in files)


def test_query_cli(spark, tmp_path, capsys):
    # --list prints every registry name with its check kind
    assert main(["query", "--list"]) == 0
    out = capsys.readouterr().out
    from lakehouse_sfc_spark.queries.registry import QUERIES

    assert len(out.strip().splitlines()) == len(QUERIES)
    assert "tpch_q1\toracle" in out

    # unknown name is a usage error, not a crash
    assert main(["query", "--name", "nope_not_a_query"]) == 2

    # running a query to a CSV sink writes header + rows
    dest = str(tmp_path / "mode_out")
    assert (
        main(
            [
                "query",
                "--name",
                "a_mode",
                "--sf-dir",
                SF,
                "--output-csv",
                dest,
            ]
        )
        == 0
    )
    import glob

    files = glob.glob(os.path.join(dest, "*.csv"))
    assert files
    body = open(files[0]).read()
    assert body.startswith("n_name,mode_segment,cnt")
