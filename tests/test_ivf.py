"""IVF production-path tests: trained centroids, codegen assignment
expression equivalence, inertia improvement, and the partitioned write +
pruned probe round-trip."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lakehouse_sfc_spark.operators.ivf import (
    cell_expr,
    ivf_write,
    probe_cells,
    train_centroids,
)
from lakehouse_sfc_spark.sources.loader import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    e = load_table(spark, SF, "embeddings")
    return e.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )


def _inertia(x, cent):
    d2 = (
        (x * x).sum(axis=1, keepdims=True)
        - 2.0 * (x @ cent.T)
        + (cent * cent).sum(axis=1)
    )
    return d2.min(axis=1).sum()


def test_training_is_deterministic_and_improves(emb):
    c1 = train_centroids(emb, k=8, iters=5)
    c2 = train_centroids(emb, k=8, iters=5)
    assert np.array_equal(c1, c2)

    x = np.array(
        [r[1] for r in emb.orderBy("vec_id").collect()], dtype=np.float64
    )
    c0 = train_centroids(emb, k=8, iters=0)  # raw seeds
    assert _inertia(x, c1) < _inertia(x, c0)


def test_cell_expr_matches_numpy_assignment(emb):
    cent = train_centroids(emb, k=8, iters=3)
    got = {
        r["vec_id"]: r["cell"]
        for r in emb.withColumn("cell", cell_expr(cent)).collect()
    }
    x_rows = emb.orderBy("vec_id").collect()
    x = np.array([r[1] for r in x_rows], dtype=np.float64)
    # exact sum-of-squared-diffs (cell_expr's formulation, not the
    # expansion trick) so the only remaining divergence is summation
    # order; rows whose top-2 margin is within float noise are skipped —
    # cell_expr is the authoritative assignment for those (see ivf.py)
    d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    want = d2.argmin(axis=1)
    margin = np.partition(d2, 1, axis=1)
    ambiguous = (margin[:, 1] - margin[:, 0]) < 1e-9
    checked = 0
    for row, w, amb in zip(x_rows, want, ambiguous):
        if amb:
            continue
        assert got[row["vec_id"]] == int(w)
        checked += 1
    assert checked > len(x_rows) * 0.95


def test_cell_expr_stays_in_codegen(spark, emb):
    cent = train_centroids(emb, k=8, iters=1)
    df = emb.withColumn("cell", cell_expr(cent))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "assignment must not shuffle"
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ivf_write_and_pruned_probe_roundtrip(spark, emb, tmp_path):
    cent = train_centroids(emb, k=8, iters=3)
    path = str(tmp_path / "cells")
    ivf_write(emb, path, cent)

    q = np.array(
        emb.filter(F.col("vec_id") == 0).collect()[0]["emb"], dtype=np.float64
    )
    cells = probe_cells(cent, q, nprobe=2)
    assert len(cells) == 2

    t = spark.read.parquet(path)
    probed = t.filter(F.col("cell").isin(cells))
    # partition pruning: only the probed cell directories are actually read
    # (inputFiles() reports the pre-pruning relation, so probe the files the
    # executed scan touched — M3's input_file_name() technique)
    files = [
        r[0]
        for r in probed.select(F.input_file_name()).distinct().collect()
    ]
    assert files and all(
        any(f"cell={c}/" in f for c in cells) for f in files
    )
    # the probed set is exactly the rows assigned to those cells
    expect = {
        r["vec_id"]
        for r in emb.withColumn("cell", cell_expr(cent))
        .filter(F.col("cell").isin(cells))
        .collect()
    }
    assert {r["vec_id"] for r in probed.collect()} == expect
