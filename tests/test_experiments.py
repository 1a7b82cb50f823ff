"""RQ7 incremental-ingest experiment: base write + batched upserts + re-run
queries per batch; row counts must track the upserted state exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_sfc_spark.runner.experiments import (
    incremental_ingest_experiment,
    results_by_batch,
)
from lakehouse_sfc_spark.sources.loader import load_table

SF = "/root/testdata/sf0.001"


def test_incremental_ingest_experiment(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("rq7")
    base = load_table(spark, SF, "orders").limit(500).cache()
    # updates: 100 overlapping keys with bumped price (upserts) +
    # 100 brand-new keys (inserts)
    overlap = base.limit(100).withColumn(
        "o_totalprice", F.col("o_totalprice") + 1.0
    )
    fresh = (
        base.limit(100)
        .withColumn("o_orderkey", F.col("o_orderkey") + 10_000_000)
    )
    updates = overlap.unionByName(fresh)

    n_batches = 2
    results = incremental_ingest_experiment(
        spark,
        base,
        updates,
        str(root / "orders_tbl"),
        queries={
            "cnt": lambda t: t,
            "sel": lambda t: t.filter("o_totalprice > 0"),
        },
        record_keys=["o_orderkey"],
        precombine="o_totalprice",
        n_batches=n_batches,
        layout="linear",
        layout_cols=["o_orderdate"],
    )
    base.unpersist()

    # (n_batches + 1) states x 2 queries
    assert len(results) == (n_batches + 1) * 2
    pivot = results_by_batch(results)
    assert sorted(pivot) == [0, 1, 2]

    # final state: 500 base + 100 inserts; upserts must not duplicate
    cnt_final = [
        r for r in results if r.query == "cnt" and r.metrics["batch"] == n_batches
    ][0]
    assert cnt_final.rows == 600
    cnt_base = [
        r for r in results if r.query == "cnt" and r.metrics["batch"] == 0
    ][0]
    assert cnt_base.rows == 500


def test_incremental_ingest_scoped_path(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("rq7s")
    base = load_table(spark, SF, "orders").limit(300).cache()
    updates = base.limit(60).withColumn(
        "o_totalprice", F.col("o_totalprice") + 5.0
    )
    results = incremental_ingest_experiment(
        spark,
        base,
        updates,
        str(root / "orders_tbl"),
        queries={"cnt": lambda t: t},
        record_keys=["o_orderkey"],
        precombine="o_totalprice",
        n_batches=2,
        layout="linear",
        layout_cols=["o_orderdate"],
        scoped=True,
    )
    base.unpersist()
    final = [r for r in results if r.metrics["batch"] == 2][0]
    assert final.rows == 300  # pure upserts: no growth, no duplicates


def test_rq_matrix_sweep(spark, tmp_path_factory):
    """2-layout x 2-spec mini-matrix: results land in the reference tree
    shape, round-trip through collect/average/viz, and the summary includes
    a geomean speedup row for the non-baseline layout."""
    import os

    import pandas as pd

    from lakehouse_sfc_spark.runner.experiments import rq_matrix

    root = tmp_path_factory.mktemp("rq1")
    sql_a = root / "spec_a"
    sql_b = root / "spec_b"
    sql_a.mkdir()
    sql_b.mkdir()
    (sql_a / "q1.sql").write_text(
        "SELECT COUNT(*) AS n FROM {{tbl}} WHERE l_quantity < 10;"
    )
    (sql_a / "q2.sql").write_text(
        "SELECT l_returnflag, COUNT(*) AS n FROM {{tbl}} "
        "GROUP BY l_returnflag;"
    )
    (sql_b / "q1.sql").write_text(
        "SELECT COUNT(*) AS n FROM {{tbl}} "
        "WHERE l_shipdate BETWEEN DATE'1994-01-01' AND DATE'1994-06-30';"
    )

    li = load_table(spark, SF, "lineitem")
    averaged = rq_matrix(
        spark,
        li,
        str(root / "out"),
        layouts=[
            ("baseline", "baseline", None),
            ("zorder", "zorder", ["l_shipdate", "l_quantity"]),
        ],
        spec_dirs={"spec_a": str(sql_a), "spec_b": str(sql_b)},
        repeat=2,
        num_files=4,
        stats_cols=["l_shipdate", "l_quantity"],
    )

    # reference results-tree shape: <root>/results/<engine>/<layout>/<spec>.csv
    for layout in ("baseline", "zorder"):
        for spec in ("spec_a", "spec_b"):
            assert os.path.exists(
                root / "out" / "results" / "spark" / layout / f"{spec}.csv"
            )

    assert set(averaged["layout"]) == {"baseline", "zorder"}
    assert set(averaged["spec"]) == {"spec_a", "spec_b"}
    # 2 layouts x (2 + 1 queries), averaged over repeats
    assert len(averaged) == 6
    assert (averaged["n_runs"] == 1).all()  # one CSV row per query (repeat
    # averaging happens inside run_sql_file's timed loop)

    summary = root / "out" / "summary"
    assert (summary / "all_results.csv").exists()
    speed = pd.read_csv(summary / "geomean_speedup.csv")
    assert list(speed["layout"]) == ["zorder"]
    assert speed["n_queries"].iloc[0] == 3
