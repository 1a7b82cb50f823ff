"""KMV distinct sketch: estimator accuracy and merge identity."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_sfc_spark.queries.sketchq import (
    sketch_distinct_kmv,
    sketch_distinct_merge,
)
from lakehouse_sfc_spark.sources.loader import load_table

SF = "/root/testdata/sf0.01"


def test_kmv_estimate_close_to_exact(spark):
    est = {
        r["grp"]: r["est_distinct"]
        for r in sketch_distinct_kmv(spark, SF).collect()
    }
    exact = {
        r["grp"]: r["cnt"]
        for r in load_table(spark, SF, "orders")
        .groupBy(F.col("o_orderpriority").alias("grp"))
        .agg(F.countDistinct("o_custkey").alias("cnt"))
        .collect()
    }
    assert set(est) == set(exact)
    for g, e in est.items():
        # KMV std error ~ 1/sqrt(k-2) ≈ 6.3% at k=256; allow 4 sigma
        assert abs(e - exact[g]) / exact[g] < 0.25, (g, e, exact[g])


def test_merged_sketch_equals_direct_global(spark):
    merged = sketch_distinct_merge(spark, SF).collect()[0]
    exact = (
        load_table(spark, SF, "orders")
        .agg(F.countDistinct("o_custkey").alias("c"))
        .collect()[0]["c"]
    )
    assert abs(merged["est_distinct"] - exact) / exact < 0.25
    # the merge lemma: a globally-minimal hash is minimal within its shard,
    # so the merged sketch must equal the sketch built in one pass
    from lakehouse_sfc_spark.queries.sketchq import _K, _M, _h32
    from pyspark.sql import Window

    direct = (
        load_table(spark, SF, "orders")
        .select(_h32(F.col("o_custkey").cast("string")).alias("h"))
        .distinct()
        .withColumn("rn", F.row_number().over(Window.orderBy("h")))
        .filter(F.col("rn") <= _K)
        .agg(F.max("h").alias("kth"), F.count(F.lit(1)).alias("n"))
        .collect()[0]
    )
    if direct["n"] >= _K:
        expect = (_K - 1) * _M / float(direct["kth"])
    else:
        expect = float(direct["n"])
    assert merged["est_distinct"] == expect
