"""connected_components operator: correctness on shapes the near-dup pair
graph never produces — deep chains (where plain propagation would need
O(diameter) rounds and the pointer-doubling path must engage), forests,
and singleton-free behavior."""

from __future__ import annotations

import pytest

from lakehouse_sfc_spark.operators.components import connected_components


def _labels(spark, edges):
    df = spark.createDataFrame(edges, "u long, v long")
    return {
        r["node"]: r["label"] for r in connected_components(df).collect()
    }


def test_chain_diameter_exceeds_propagation_rounds(spark):
    """A 200-node path has diameter 199 >> 24 rounds: only the doubling
    path can converge, and every node must label down to 0."""
    n = 200
    got = _labels(spark, [(i, i + 1) for i in range(n - 1)])
    assert got == {i: 0 for i in range(n)}


def test_forest_and_cycles(spark):
    edges = (
        [(0, 1), (1, 2), (2, 0)]          # triangle
        + [(10, 11), (11, 12)]            # path
        + [(20, 21)]                      # pair
    )
    got = _labels(spark, edges)
    assert {got[0], got[1], got[2]} == {0}
    assert {got[10], got[11], got[12]} == {10}
    assert {got[20], got[21]} == {20}


def test_unconverged_raises(spark):
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(99)], "u long, v long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_rounds=3)


def test_exclusive_prefix_sum_matches_serial(spark):
    """Distributed prefix sum == the serial definition, including ties-free
    unique keys, zero-value rows, and a width smaller than the row count."""
    import random

    from pyspark.sql import functions as F

    from lakehouse_sfc_spark.operators.prefix import exclusive_prefix_sum

    rng = random.Random(7)
    rows = [(i, rng.randrange(0, 50)) for i in range(500)]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "k long, v long")
    got = {
        r["k"]: r["before"]
        for r in exclusive_prefix_sum(df, "k", "v", num_partitions=7).collect()
    }
    acc = 0
    for k, v in sorted(rows):
        assert got[k] == acc, (k, got[k], acc)
        acc += v
