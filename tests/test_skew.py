"""Skew handling: salted join equals the plain join exactly, spreads hot
keys over multiple tasks, and AQE's skew-join stays enabled in the session."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_sfc_spark.operators.skew import salted_join


def _skewed_frames(spark):
    # 10k rows, 90% on one hot key
    left = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100)
        .cast("long").alias("k"),
        F.col("id").alias("lv"),
    )
    right = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("rv")
    )
    return left, right


def test_salted_join_matches_plain_inner(spark):
    left, right = _skewed_frames(spark)
    plain = left.join(right, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("lv").alias("s")
    )
    salted = salted_join(left, right, "k", factor=8).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("lv").alias("s")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_join_left_outer_keeps_unmatched(spark):
    left, right = _skewed_frames(spark)
    # drop key 7 from the right: hot rows must survive with nulls
    right2 = right.filter(F.col("k") != 7)
    out = salted_join(left, right2, "k", factor=4, how="left_outer")
    assert out.count() == left.count()
    assert out.filter(F.col("k") == 7).filter(F.col("rv").isNull()).count() > 0


def test_salt_spreads_hot_key(spark):
    left, right = _skewed_frames(spark)
    # reproduce the internal salting and check the hot key occupies
    # several salt buckets (i.e. several shuffle tasks)
    salted = left.withColumn(
        "__salt", F.floor(F.rand(42) * 8).cast("int")
    )
    n_buckets = (
        salted.filter(F.col("k") == 7).select("__salt").distinct().count()
    )
    assert n_buckets >= 6  # 9000 rows over 8 buckets: all 8 expected


def test_session_has_aqe_skew_join(spark):
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"


def test_aqe_splits_skewed_partition_at_runtime(spark):
    """End-to-end: a sort-merge join with one pathologically hot key must be
    re-planned by AQE with the hot partition SPLIT (skew=true in the final
    adaptive plan), not run as one giant task.  Thresholds are lowered so the
    local test data trips the same code path a 100 TB run would."""
    tuned = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.shuffle.partitions": "8",
    }
    saved = {k: spark.conf.get(k, None) for k in tuned}
    try:
        for k, v in tuned.items():
            spark.conf.set(k, v)
        # ~200k left rows, 95% on key 7; right side one row per key so the
        # join output stays collect-able (collect() must drive THIS
        # DataFrame's QueryExecution — a count() would execute a separate
        # plan and leave this one un-finalized).
        left = spark.range(200_000).select(
            F.when(F.col("id") % 20 < 19, F.lit(7))
            .otherwise(F.col("id") % 1000)
            .cast("long")
            .alias("k"),
            F.col("id").alias("lv"),
        )
        right = spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("rv")
        )
        joined = left.join(right, "k")
        n = len(joined.collect())
        assert n == 200_000
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final_plan
        assert "skew=true" in final_plan, final_plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
