"""Join surface (SURVEY.md §2.3): fact-dim equi joins (broadcast), multi-table
chains, semi/anti joins.  Catalyst picks broadcast-hash for small dims; we
hint explicitly where the dim side is known-small so the plan is stable at
any scale.

Reference parity: Template D fact-dim join (wlg/templates/sql.py:75-109),
TPC-H dbgen stream joins (tpch_all_runner.py:168-169), broadcast control
(run_queries.py:717-725).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_sfc_spark.queries.registry import (
    davg,
    dsum,
    register,
    sql_davg,
    sql_dsum,
)
from lakehouse_sfc_spark.sources.loader import load_table


@register(
    "j_fact_dim",
    oracle=f"""
    SELECT c.c_mktsegment AS mktsegment,
           COUNT(*) AS cnt,
           {sql_dsum("o.o_totalprice", "sum_price")}
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_acctbal > 1000
    GROUP BY c.c_mktsegment
    """,
    headline=True,
)
def j_fact_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template D: fact ⋈ dim with a dim-side filter.  Dim is broadcast —
    zero shuffle of the fact table (wlg/templates/sql.py:75-109)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 1000)
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "inner")
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("o_totalprice", "sum_price"))
    )


@register(
    "j_multi3",
    oracle=f"""
    SELECT c.c_mktsegment AS mktsegment,
           n.n_name AS nation,
           COUNT(*) AS cnt,
           {sql_dsum("l.l_extendedprice * (1 - l.l_discount)", "revenue", 6)}
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY 1, 2
    """,
    headline=True,
)
def j_multi3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3/Q5-style 4-table chain.  lineitem⋈orders shuffles on the
    shared orderkey; customer and nation broadcast.  The date filter sits on
    orders BEFORE the join so the big shuffle only carries matching rows."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01"))
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("c_mktsegment").alias("mktsegment"), F.col("n_name").alias("nation")
        )
        .agg(F.count(F.lit(1)).alias("cnt"), dsum(revenue, "revenue", 6))
    )


@register(
    "j_semi",
    oracle="""
    SELECT COUNT(*) AS cnt
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000
    )
    """,
)
def j_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join = EXISTS subquery (TPC-H Q4 shape in dbgen streams)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").agg(
        F.count(F.lit(1)).alias("cnt")
    )


@register(
    "j_anti",
    oracle="""
    SELECT COUNT(*) AS cnt
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
    )
    """,
)
def j_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join = NOT EXISTS (TPC-H Q22 shape in dbgen streams)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").agg(
        F.count(F.lit(1)).alias("cnt")
    )


@register(
    "j_part_supp",
    oracle=f"""
    SELECT p.p_brand AS brand,
           COUNT(*) AS cnt,
           {sql_davg("l.l_extendedprice", "avg_price")}
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    WHERE p.p_size >= 20 AND s.s_acctbal >= 0
    GROUP BY p.p_brand
    """,
)
def j_part_supp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two independent broadcast dims on one fact — a single stage, no fact
    shuffle at all (both dims tiny)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") >= 20)
    s = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") >= 0)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(F.count(F.lit(1)).alias("cnt"), davg("l_extendedprice", "avg_price"))
    )
