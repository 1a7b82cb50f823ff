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
