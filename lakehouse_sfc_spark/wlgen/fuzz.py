"""Randomized Spark-vs-oracle equivalence fuzzing over the workload
generator (sqllogictest-style; strengthens the reference's
correctness-by-invariance strategy, SURVEY.md §5).

The reference only ever *generates* SQL and trusts the engines
(scripts/test_sql_gen.sh runs ``wlg.cli fill`` with no assertions).  Here
the generated workload doubles as a randomized correctness corpus: every
emitted query is plain ANSI SQL that runs verbatim on BOTH Spark and
DuckDB, so any mismatch pinpoints an engine-semantics bug (type coercion,
ordering, boundary inclusivity) rather than a hand-written-oracle typo.

Determinism rules for fuzz cases (so exact comparison is sound):
- Filter-only templates (A/B/C/D) return unordered row sets — the
  comparator sorts rows, so SELECT * is safe.
- Aggregate variants group on a column, making output rows unique per
  group; LIMIT is only ever combined with a TOTAL ordering (ORDER BY every
  output column), never a partial one.
- Literals are formatted with ``repr()`` for doubles (full precision,
  parsed identically by both engines) and single-quote escaping for
  strings.
"""

from __future__ import annotations

import random
from collections.abc import Sequence
from dataclasses import dataclass

from lakehouse_sfc_spark.profiler.stats import ColumnStats, build_uni_dists
from lakehouse_sfc_spark.wlgen.fill import render_sql
from lakehouse_sfc_spark.wlgen.gen import gen_workload
from lakehouse_sfc_spark.wlgen.samplers import sample_between


@dataclass(frozen=True)
class FuzzCase:
    name: str
    sql: str


def fuzz_cases(
    fact_stats: dict[str, ColumnStats],
    table: str = "lineitem",
    numeric_cols: Sequence[str] = (
        "l_quantity",
        "l_discount",
        "l_extendedprice",
        "l_orderkey",
    ),
    categorical_col: str = "l_returnflag",
    dim_stats: dict[str, ColumnStats] | None = None,
    dim: tuple[str, str, str, str] = (
        "supplier",
        "l_suppkey",
        "s_suppkey",
        "s_acctbal",
    ),
    n: int = 5,
    seed: int = 0,
    target_sel: float = 0.1,
) -> list[FuzzCase]:
    """Generate ``n`` rounds of filled template-A/B/C queries (plus D joins
    when ``dim_stats`` given, plus deterministic aggregate variants of the
    B queries) as final literal SQL runnable on Spark and DuckDB alike."""
    rng = random.Random(seed)
    cases: list[FuzzCase] = []

    rows = gen_workload(
        fact_stats,
        table,
        list(numeric_cols),
        categorical_col,
        n=n,
        target_sel=target_sel,
        seed=seed,
    )
    for i, row in enumerate(rows):
        sql = render_sql(row["sql"], row["params"])
        cases.append(FuzzCase(f"{row['tpl']}{i}", sql))
        if row["tpl"] == "B":
            # deterministic aggregate variant: unique group rows, and the
            # ORDER BY covers every output column (total order) so LIMIT
            # stays well-defined in both engines.
            agg = (
                f"SELECT {categorical_col}, COUNT(*) AS cnt FROM ({sql}) t"
                f" GROUP BY {categorical_col}"
                f" ORDER BY cnt DESC, {categorical_col} LIMIT 1000"
            )
            cases.append(FuzzCase(f"B{i}_agg", agg))

    if dim_stats is not None:
        dim_table, fact_key, dim_key, filter_col = dim
        dists = build_uni_dists(dim_stats)
        if filter_col in dists:
            for i in range(n):
                lo, hi = sample_between(dists[filter_col], target_sel, rng)
                sql = (
                    f"SELECT {table}.* FROM {table} JOIN {dim_table}"
                    f" ON {table}.{fact_key} = {dim_table}.{dim_key}"
                    f" WHERE {dim_table}.{filter_col}"
                    f" BETWEEN {render_sql(':v', {'v': lo})} AND"
                    f" {render_sql(':v', {'v': hi})}"
                )
                cases.append(FuzzCase(f"D{i}", sql))

    # Template W: randomized WINDOW functions.  Determinism rules on top of
    # the module-level ones: the window ORDER BY always ends with the
    # table's unique key (l_orderkey, l_linenumber) so frames are total-
    # ordered; SUM over doubles rides DECIMAL; the output is sampled AFTER
    # the window so every rank/frame still sees the full partition.
    uniq = "l_orderkey, l_linenumber"
    for i in range(n):
        part = rng.choice([categorical_col, f"{numeric_cols[-1]} % 7"])
        ordc = rng.choice(list(numeric_cols))
        x = rng.choice(list(numeric_cols))
        fn = rng.choice(["wsum", "wcount", "rownum", "wmin"])
        frame = rng.choice(
            [
                "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW",
                "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
            ]
        )
        over = f"PARTITION BY {part} ORDER BY {ordc}, {uniq}"
        if fn == "wsum":
            expr = (
                f"CAST(SUM(CAST({x} AS DECIMAL(18,4))) OVER"
                f" ({over} {frame}) AS DOUBLE)"
            )
        elif fn == "wcount":
            expr = f"COUNT(*) OVER ({over} {frame})"
        elif fn == "wmin":
            expr = f"MIN({x}) OVER ({over} {frame})"
        else:
            expr = f"ROW_NUMBER() OVER ({over})"
        sql = (
            f"SELECT * FROM (SELECT {uniq}, {part} AS pcol,"
            f" {expr} AS wval"
            f" FROM {table}) t WHERE l_orderkey % 47 = 0"
        )
        cases.append(FuzzCase(f"W{i}", sql))

    # Template G: randomized grouping sets.  Subtotal rows are unique per
    # grouping set, and GROUPING() columns disambiguate a NULL group value
    # from a rollup NULL — same semantics in both engines; the comparator's
    # own row sort makes ORDER BY unnecessary.
    g_cols = [categorical_col, f"{numeric_cols[-1]} % 5"]
    for i in range(n):
        kind = rng.choice(["ROLLUP", "CUBE"])
        x = rng.choice(list(numeric_cols))
        sql = (
            f"SELECT {g_cols[0]} AS g1, {g_cols[1]} AS g2,"
            f" GROUPING({g_cols[0]}) AS gf1, GROUPING({g_cols[1]}) AS gf2,"
            f" COUNT(*) AS cnt,"
            f" CAST(SUM(CAST({x} AS DECIMAL(18,4))) AS DOUBLE) AS s"
            f" FROM {table} GROUP BY {kind}({g_cols[0]}, {g_cols[1]})"
        )
        cases.append(FuzzCase(f"G{i}", sql))

    # Template S: randomized set operations between two filtered key sets.
    # INTERSECT/EXCEPT/UNION are distinct-set results — unordered, unique
    # rows — so exact comparison needs no tie-breaking.
    dists2 = build_uni_dists(fact_stats)
    set_cols = [c for c in numeric_cols if c in dists2] or list(dists2)
    for i in range(n):
        op = rng.choice(["UNION", "INTERSECT", "EXCEPT"])
        col = rng.choice(set_cols)
        lo1, hi1 = sample_between(dists2[col], target_sel, rng)
        lo2, hi2 = sample_between(dists2[col], target_sel, rng)
        sql = (
            f"SELECT l_orderkey, l_linenumber FROM {table}"
            f" WHERE {col} BETWEEN {render_sql(':v', {'v': lo1})}"
            f" AND {render_sql(':v', {'v': hi1})}"
            f" {op}"
            f" SELECT l_orderkey, l_linenumber FROM {table}"
            f" WHERE {col} BETWEEN {render_sql(':v', {'v': lo2})}"
            f" AND {render_sql(':v', {'v': hi2})}"
        )
        cases.append(FuzzCase(f"S{i}", sql))
    return cases
