"""Bucketed co-located joins: same-key same-count bucketed tables join with
NO shuffle exchange — the scale path for repeated fact⋈fact joins."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from lakehouse_sfc_spark.layout.writer import bucketed_write
from lakehouse_sfc_spark.sources.loader import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    bucketed_write(li, "li_bkt", 4, ["l_orderkey"], ["l_orderkey"])
    bucketed_write(o, "o_bkt", 4, ["o_orderkey"], ["o_orderkey"])
    yield "li_bkt", "o_bkt"
    spark.sql("DROP TABLE IF EXISTS li_bkt")
    spark.sql("DROP TABLE IF EXISTS o_bkt")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    li_t, o_t = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a non-broadcast join so the bucket layout is what avoids
        # the shuffle, not a broadcast
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table(li_t).join(
            spark.table(o_t),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join still shuffles"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    li_t, o_t = bucketed_tables
    li = load_table(spark, SF, "lineitem")
    o = load_table(spark, SF, "orders")
    plain = li.join(o, li.l_orderkey == o.o_orderkey).count()
    bucketed = (
        spark.table(li_t)
        .join(
            spark.table(o_t), F.col("l_orderkey") == F.col("o_orderkey")
        )
        .count()
    )
    assert bucketed == plain
