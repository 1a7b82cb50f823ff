"""Set operations (SURVEY.md §2.7): absent from the reference SQL surface but
free in Spark; one demo each for full-TPC-H-stream parity."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_sfc_spark.queries.registry import register
from lakehouse_sfc_spark.sources.loader import load_table


def _high_value_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_totalprice") > 100000).select(
        F.col("o_custkey").alias("custkey")
    )


def _recent_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderdate") >= F.to_timestamp(F.lit("2000-01-01"))
    ).select(F.col("o_custkey").alias("custkey"))


_A = "SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 100000"
_B = ("SELECT o_custkey AS custkey FROM orders "
      "WHERE o_orderdate >= TIMESTAMP '2000-01-01'")


@register("set_union", oracle=f"SELECT custkey FROM ({_A} UNION {_B})")
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _high_value_custkeys(spark, sf_dir)
    b = _recent_custkeys(spark, sf_dir)
    return a.union(b).distinct()


@register("set_intersect", oracle=f"SELECT custkey FROM ({_A} INTERSECT {_B})")
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _high_value_custkeys(spark, sf_dir)
    b = _recent_custkeys(spark, sf_dir)
    return a.intersect(b)


@register("set_except", oracle=f"SELECT custkey FROM ({_A} EXCEPT {_B})")
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _high_value_custkeys(spark, sf_dir)
    b = _recent_custkeys(spark, sf_dir)
    return a.subtract(b)  # EXCEPT (set semantics), not EXCEPT ALL
