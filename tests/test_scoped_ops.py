"""Scoped upsert + compaction: only key-overlapping files rewrite; sidecar
URIs stay valid across tmp-dir swaps; compaction restores target file count."""

from __future__ import annotations

import os
from urllib.parse import urlparse

from pyspark.sql import functions as F

from lakehouse_sfc_spark.layout.stats import read_sidecar
from lakehouse_sfc_spark.layout.upsert import keyed_upsert, scoped_upsert
from lakehouse_sfc_spark.layout.writer import compact, layout_write
from lakehouse_sfc_spark.sources.loader import load_table

SF = "/root/testdata/sf0.001"


def _write_orders(spark, path, num_files=4):
    base = load_table(spark, SF, "orders").limit(400)
    layout_write(
        base,
        path,
        layout="linear",
        layout_cols=["o_orderkey"],
        num_files=num_files,
        stats_cols=["o_orderkey"],
    )
    return base


def _sidecar_files_exist(path) -> bool:
    sidecar = read_sidecar(path)
    return all(
        os.path.exists(urlparse(u).path) for u in sidecar["files"]
    )


def test_scoped_upsert_rewrites_only_overlapping_files(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("scoped") / "orders")
    base = _write_orders(spark, path, num_files=4)
    lo = base.agg(F.min("o_orderkey")).collect()[0][0]
    # batch touches only the lowest keys -> one file overlaps
    batch = base.filter(F.col("o_orderkey") <= lo + 5).withColumn(
        "o_totalprice", F.col("o_totalprice") + 100.0
    )
    n_batch = batch.count()
    assert n_batch >= 1
    result = scoped_upsert(
        path,
        batch,
        record_keys=["o_orderkey"],
        precombine="o_totalprice",
        layout="linear",
        layout_cols=["o_orderkey"],
    )
    assert result["scoped"] is True
    assert result["files_rewritten"] < 4
    assert result["files_untouched"] >= 1

    after = spark.read.parquet(path)
    assert after.count() == 400  # upsert, no duplicates
    bumped = after.filter(F.col("o_orderkey") <= lo + 5)
    assert bumped.filter(F.col("o_totalprice") <= 100.0).count() == 0
    # sidecar consistent: every entry points at a real file, full coverage
    sidecar = read_sidecar(path)
    assert _sidecar_files_exist(path)
    assert sum(i["count"] for i in sidecar["files"].values()) == 400


def test_scoped_upsert_inserts_new_keys(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("scoped_ins") / "orders")
    base = _write_orders(spark, path)
    fresh = base.limit(50).withColumn(
        "o_orderkey", F.col("o_orderkey") + 10_000_000
    )
    result = scoped_upsert(
        path, fresh, ["o_orderkey"], "o_totalprice",
        layout="linear", layout_cols=["o_orderkey"],
    )
    assert result["scoped"] is True
    assert spark.read.parquet(path).count() == 450


def test_scoped_upsert_falls_back_without_sidecar(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("fallback") / "orders")
    base = load_table(spark, SF, "orders").limit(100)
    base.write.parquet(path)  # no sidecar
    batch = base.limit(10).withColumn(
        "o_totalprice", F.col("o_totalprice") + 1.0
    )
    result = scoped_upsert(path, batch, ["o_orderkey"], "o_totalprice")
    assert result["scoped"] is False
    assert spark.read.parquet(path).count() == 100


def test_keyed_upsert_rehomes_sidecar(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("rehome") / "orders")
    base = _write_orders(spark, path)
    batch = base.limit(10).withColumn(
        "o_totalprice", F.col("o_totalprice") + 1.0
    )
    keyed_upsert(
        path, batch, ["o_orderkey"], "o_totalprice",
        layout="linear", layout_cols=["o_orderkey"],
        stats_cols=["o_orderkey"],
    )
    assert _sidecar_files_exist(path)


def test_compact_reduces_file_count(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("compact") / "orders")
    _write_orders(spark, path, num_files=8)
    result = compact(
        spark,
        path,
        layout="linear",
        layout_cols=["o_orderkey"],
        num_files=2,
        stats_cols=["o_orderkey"],
    )
    assert result["files_before"] == 8
    assert result["files_after"] == 2
    assert spark.read.parquet(path).count() == 400
    assert _sidecar_files_exist(path)


def test_scoped_upsert_sparse_batch_prunes_by_keyset(spark, tmp_path_factory):
    """A batch touching only the extreme keys spans the whole key RANGE, but
    the IN-set refinement keeps middle files out of the rewrite."""
    path = str(tmp_path_factory.mktemp("sparse") / "orders")
    base = _write_orders(spark, path, num_files=4)
    keys = sorted(r[0] for r in base.select("o_orderkey").collect())
    extremes = [keys[0], keys[-1]]
    batch = base.filter(F.col("o_orderkey").isin(extremes)).withColumn(
        "o_totalprice", F.col("o_totalprice") + 9.0
    )
    result = scoped_upsert(
        path, batch, ["o_orderkey"], "o_totalprice",
        layout="linear", layout_cols=["o_orderkey"],
    )
    assert result["scoped"] is True
    assert result["files_rewritten"] == 2  # first + last file only
    assert result["files_untouched"] == 2
    assert spark.read.parquet(path).count() == 400
