"""Workload scoring + layout-key recommendation.

Behavioral contract mirrors notebooks/sql_layout_toolkit.py:
- predicate weights eq=5 in=4 range=3 like=2 null=1 other=1 (:31-38),
  halved under OR (:464-476), lineitem role weight 1.2 (:40-42);
- table layout_opportunity_score = total + 0.25·filters + 0.10·joins
  + 0.75·pair_sum + 1.50·pair_max (:958-964);
- column anchor score = base + 0.5·filters + 0.25·joins + 0.4·range
  + 0.2·eq + 0.2·in, ×1.15 datetime / ×1.05 numeric, distinctness
  penalties (ur<1e-4 → ×0.55 … near-unique non-join ×0.75) (:1003-1040);
- combo score = Σanchor + 1.25·pair_cooccur + 0.75·query_coverage
  + 0.15·leading_strength over 2/3-col combos from a top-12 pool
  (:1043-1148).
"""

from __future__ import annotations

from collections import defaultdict
from itertools import combinations

from lakehouse_sfc_spark.advisor.sql_analyze import PredicateEvent

PRED_WEIGHT = {
    "eq": 5.0, "in": 4.0, "range": 3.0, "like": 2.0, "null": 1.0, "other": 1.0,
}
TABLE_ROLE_WEIGHT = {"lineitem": 1.2}

_PTYPES = ("eq", "in", "range", "like", "null", "other")


def score_workload(events: list[PredicateEvent]) -> dict:
    """Per (table, column): occurrences, distinct queries, filters, joins,
    per-type counts, weighted score."""
    rows: dict[tuple[str, str], dict] = {}
    for ev in events:
        key = (ev.table, ev.column)
        row = rows.setdefault(
            key,
            {
                "table": ev.table,
                "column": ev.column,
                "occurrences": 0,
                "queries": set(),
                "filters": 0,
                "joins": 0,
                "score": 0.0,
                **{t: 0 for t in _PTYPES},
            },
        )
        row["occurrences"] += 1
        row["queries"].add(ev.query)
        row[ev.ptype] += 1
        if ev.is_join:
            row["joins"] += 1
        else:
            row["filters"] += 1
        w = PRED_WEIGHT.get(ev.ptype, 1.0)
        if ev.in_or:
            w *= 0.5
        w *= TABLE_ROLE_WEIGHT.get(ev.table, 1.0)
        row["score"] += w
    for row in rows.values():
        row["n_queries"] = len(row.pop("queries"))
    return rows


def column_cooccurrence(events: list[PredicateEvent]) -> dict:
    """(table, col_a, col_b) -> number of distinct queries where both appear
    as FILTERS (col_a < col_b)."""
    per_query: dict[tuple[str, str], set[str]] = defaultdict(set)
    for ev in events:
        if not ev.is_join:
            per_query[(ev.query, ev.table)].add(ev.column)
    counts: dict[tuple[str, str, str], set] = defaultdict(set)
    for (query, table), cols in per_query.items():
        for a, b in combinations(sorted(cols), 2):
            counts[(table, a, b)].add(query)
    return {k: len(v) for k, v in counts.items()}


def anchor_score(row: dict, kind: str | None = None,
                 unique_ratio: float | None = None) -> float:
    score = (
        float(row.get("score", 0.0))
        + 0.5 * row.get("filters", 0)
        + 0.25 * row.get("joins", 0)
        + 0.4 * row.get("range", 0)
        + 0.2 * row.get("eq", 0)
        + 0.2 * row.get("in", 0)
    )
    k = (kind or "").lower()
    if k in {"date", "datetime", "timestamp"}:
        score *= 1.15
    elif k in {"numeric", "double", "float", "int", "long", "number", "decimal"}:
        score *= 1.05
    if unique_ratio is not None:
        ur = float(unique_ratio)
        if ur < 1e-4:
            score *= 0.55
        elif ur < 1e-3:
            score *= 0.70
        elif ur < 1e-2:
            score *= 0.85
        elif ur > 0.95 and row.get("joins", 0) <= 0:
            score *= 0.75
    return score


def rank_tables(
    scores: dict, cooccur: dict, min_candidate_columns: int = 2
) -> list[dict]:
    by_table: dict[str, list[dict]] = defaultdict(list)
    for row in scores.values():
        by_table[row["table"]].append(row)

    out = []
    for table, rows in by_table.items():
        pair_counts = [
            c for (t, _, _), c in cooccur.items() if t == table
        ]
        total = sum(r["score"] for r in rows)
        filters = sum(r["filters"] for r in rows)
        joins = sum(r["joins"] for r in rows)
        pair_sum = float(sum(pair_counts))
        pair_max = float(max(pair_counts, default=0))
        candidates = [r for r in rows if r["filters"] > 0 or r["joins"] > 0]
        out.append(
            {
                "table": table,
                "layout_opportunity_score": (
                    total + 0.25 * filters + 0.10 * joins
                    + 0.75 * pair_sum + 1.50 * pair_max
                ),
                "total_score": total,
                "filter_events": filters,
                "join_events": joins,
                "candidate_columns": len(candidates),
                "cooccur_count_sum": pair_sum,
                "cooccur_count_max": pair_max,
                "eligible_for_multicol_layout": (
                    len(candidates) >= min_candidate_columns
                ),
            }
        )
    out.sort(
        key=lambda r: (
            r["eligible_for_multicol_layout"],
            r["layout_opportunity_score"],
            r["candidate_columns"],
        ),
        reverse=True,
    )
    return out


def recommend_column_sets(
    scores: dict,
    cooccur: dict,
    events: list[PredicateEvent],
    table: str,
    combo_sizes: tuple[int, ...] = (2, 3),
    top_n: int = 12,
    max_candidate_pool: int = 12,
    column_kinds: dict[str, str] | None = None,
    unique_ratios: dict[str, float] | None = None,
) -> list[dict]:
    """Ranked 2/3-column layout-key candidates for one table, with a
    suggested order (strongest anchor first)."""
    kinds = column_kinds or {}
    urs = unique_ratios or {}
    rows = [r for r in scores.values() if r["table"] == table]
    cand = [
        {**r, "anchor_score": anchor_score(r, kinds.get(r["column"]),
                                           urs.get(r["column"]))}
        for r in rows
        if r["filters"] > 0 or r["joins"] > 0
    ]
    cand.sort(key=lambda r: (r["anchor_score"], r["score"], r["filters"]),
              reverse=True)
    cand = cand[:max_candidate_pool]
    if len(cand) < 2:
        return []
    meta = {r["column"]: r for r in cand}
    cols = list(meta)

    pair_counts = {
        (a, b): c for (t, a, b), c in cooccur.items() if t == table
    }
    col_queries: dict[str, set] = defaultdict(set)
    for ev in events:
        if ev.table == table and not ev.is_join:
            col_queries[ev.column].add(ev.query)

    out = []
    for k in sorted({s for s in combo_sizes if s >= 2}):
        for combo in combinations(cols, k):
            combo = tuple(sorted(combo))
            singleton = sum(meta[c]["anchor_score"] for c in combo)
            pair_bonus = sum(
                1.25 * pair_counts.get((a, b), 0)
                for a, b in combinations(combo, 2)
            )
            coverage = len(set().union(*[col_queries[c] for c in combo]))
            ordered = sorted(
                combo, key=lambda c: meta[c]["anchor_score"], reverse=True
            )
            leading = (
                meta[ordered[0]]["anchor_score"]
                + 0.6 * meta[ordered[1]]["anchor_score"]
            )
            out.append(
                {
                    "table": table,
                    "k": k,
                    "columns": combo,
                    "suggested_order": ordered,
                    "combo_score": (
                        singleton + pair_bonus + 0.75 * coverage + 0.15 * leading
                    ),
                    "singleton_score": singleton,
                    "pair_bonus": pair_bonus,
                    "query_coverage": coverage,
                }
            )
    out.sort(
        key=lambda r: (r["combo_score"], r["pair_bonus"], r["query_coverage"],
                       -r["k"]),
        reverse=True,
    )
    return out[:top_n]
