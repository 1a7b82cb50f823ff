"""Query registry: every implemented operator from SURVEY.md §2 registers a
(spark, sf_dir) -> DataFrame builder plus (when SQL-expressible) a DuckDB
oracle SQL string with IDENTICAL output column names.

Exact-match discipline: the driver hash-compares values, so floating-point
aggregates must be bit-identical between Spark and DuckDB.  Plain SUM over
doubles is summation-order-dependent; we route money-ish sums through exact
DECIMAL arithmetic and cast the final result back to DOUBLE (see ``dsum`` /
``davg``), which both engines compute identically.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    headline: bool = False  # include in bench.py


QUERIES: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    headline: bool = False,
    override: bool = False,
):
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES and not override:
            raise ValueError(
                f"query {name!r} already registered by "
                f"{QUERIES[name].fn.__module__}.{QUERIES[name].fn.__qualname__}; "
                "pass override=True to replace it deliberately"
            )
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, headline=headline)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracles() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None
    }


# --- exact-arithmetic helpers (Spark side) ---------------------------------


def dsum(col: Column | str, alias: str, scale: int = 2) -> Column:
    """SUM with deterministic cross-engine semantics: cast each value to
    DECIMAL(18,scale) (exact integer arithmetic from there), sum exactly,
    cast the total back to DOUBLE.  SQL twin: ``sql_dsum``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double").alias(alias)


def davg(col: Column | str, alias: str, scale: int = 2) -> Column:
    """AVG as exact-decimal SUM divided by COUNT — one double division at the
    end, identical in both engines.  SQL twin: ``sql_davg``."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        (F.sum(c.cast(f"decimal(18,{scale})")).cast("double") / F.count(c))
        .alias(alias)
    )


# --- exact-arithmetic helpers (oracle SQL side) ----------------------------


def sql_dsum(expr: str, alias: str, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str, scale: int = 2) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )
