"""Workload generation from profiled statistics (G8) and benchmark
spec-matrix generators (G9).

Reference parity:
- G8 ``gen`` command    -> wlg/cli/main.py:613-665 (stats -> UniDists ->
  templates A-D -> workload list; quantile-fallback dist at :1313-1337).
  The reference's undefined-``inject_table`` bug at :651 is not replicated.
- G9 spec matrices      -> workload_spec/generate_tpch_rq1_specs.py:31-70
  (selectivity bands S1-S4 x column configs x range/point counts),
  generate_tpch_rq2_specs.py:44-80 (3-5-column boxes),
  generate_tpch_rq4_specs.py:23-30 (GROUP BY / ORDER BY / LIMIT toggles).

All driver-side: specs and workloads are tiny; the cluster only sees the
resulting SQL.
"""

from __future__ import annotations

import random
from collections.abc import Sequence

from lakehouse_sfc_spark.profiler.stats import UniDist, build_uni_dists
from lakehouse_sfc_spark.wlgen.samplers import (
    sample_between,
    sample_copula,
    sample_eq_from_topk,
)
from lakehouse_sfc_spark.wlgen.templates import Templates


def _quantile_fallback_dist(stats) -> UniDist | None:
    """Histogram-free columns fall back to a uniform histogram spanning the
    quantile range (wlg/cli/main.py:1313-1337)."""
    qs = getattr(stats, "quantiles", None) or {}
    vals = [v for _, v in sorted(qs.items())]
    if len(vals) < 2 or vals[0] == vals[-1]:
        return None
    edges = vals
    counts = [1] * (len(edges) - 1)
    return UniDist(counts, edges)


def gen_workload(
    stats: dict,
    table: str,
    numeric_cols: Sequence[str],
    categorical_col: str | None = None,
    n: int = 10,
    target_sel: float = 0.05,
    seed: int = 42,
    templates: Sequence[str] = ("A", "B", "C"),
) -> list[dict]:
    """G8: synthesize ``n`` queries per requested template from profiled
    stats.  Returns [{tpl, sql, params}] — the reference's workload.yaml
    rows (wlg/emit/yaml_emit.py:11-16)."""
    rng = random.Random(seed)
    dists = build_uni_dists(stats)
    for name, cs in stats.items():
        if name not in dists:
            fb = _quantile_fallback_dist(cs)
            if fb is not None:
                dists[name] = fb
    tpl = Templates(table)
    usable = [c for c in numeric_cols if c in dists]
    out: list[dict] = []
    for _ in range(n):
        for t in templates:
            if t == "A" and len(usable) >= 2:
                cols = usable[:3]
                ranges = sample_copula(
                    [dists[c] for c in cols], target_sel, rng=rng
                )
                spec = tpl.box(cols, ranges)
            elif t == "B" and usable:
                col = usable[0]
                spec = tpl.between(col, sample_between(dists[col], target_sel, rng))
            elif t == "C" and categorical_col is not None:
                topk = getattr(stats.get(categorical_col), "topk", None) or []
                if not topk:
                    continue
                spec = tpl.equality(
                    categorical_col, sample_eq_from_topk(topk, rng)
                )
            else:
                continue
            out.append({"tpl": spec.name, "sql": spec.sql, "params": spec.params})
    return out


# --- G9: benchmark spec matrices -------------------------------------------

#: RQ1 selectivity bands (generate_tpch_rq1_specs.py:31-36)
RQ1_BANDS: dict[str, tuple[float, float]] = {
    "S1": (0.000, 0.001),
    "S2": (0.001, 0.010),
    "S3": (0.010, 0.100),
    "S4": (0.100, 0.200),
}

#: RQ1 two-column configs on lineitem (generate_tpch_rq1_specs.py:39-48)
RQ1_COLUMN_CONFIGS: tuple[tuple[str, ...], ...] = (
    ("l_shipdate", "l_quantity"),
    ("l_shipdate", "l_discount"),
    ("l_shipdate", "l_extendedprice"),
    ("l_quantity", "l_discount"),
    ("l_quantity", "l_extendedprice"),
    ("l_discount", "l_extendedprice"),
    ("l_shipdate", "l_orderkey"),
    ("l_orderkey", "l_partkey"),
)


def rq1_specs(
    table: str = "lineitem",
    n_range: int = 10,
    n_point: int = 25,
    seed: int = 42,
) -> list[dict]:
    """RQ1 matrix: bands x column configs x {range, point} counts."""
    specs = []
    for band, (lo, hi) in RQ1_BANDS.items():
        for cols in RQ1_COLUMN_CONFIGS:
            specs.append(
                {
                    "name": f"RQ1_{band}_{'_'.join(cols)}",
                    "table": table,
                    "band": band,
                    "selectivity": (lo, hi),
                    "columns": list(cols),
                    "n_range": n_range,
                    "n_point": n_point,
                    "generation": {"mode": "random", "seed": seed},
                }
            )
    return specs


def rq2_specs(
    table: str = "lineitem",
    dims: Sequence[int] = (3, 4, 5),
    seed: int = 42,
) -> list[dict]:
    """RQ2 matrix: k-column conjunctive boxes, k in 3..5
    (generate_tpch_rq2_specs.py:44-61; the duplicated O5/O6 column lists in
    the reference are collapsed)."""
    pool = [
        "l_shipdate",
        "l_quantity",
        "l_discount",
        "l_extendedprice",
        "l_tax",
    ]
    specs = []
    for k in dims:
        cols = pool[:k]
        specs.append(
            {
                "name": f"RQ2_N{k}",
                "table": table,
                "columns": cols,
                "n_dims": k,
                "generation": {"mode": "random", "seed": seed},
            }
        )
    return specs


#: RQ4 query-shape toggles (generate_tpch_rq4_specs.py:23-30)
RQ4_VARIANTS: tuple[dict, ...] = (
    {"group_by": False, "order_by": False, "limit": None},
    {"group_by": True, "order_by": False, "limit": None},
    {"group_by": False, "order_by": True, "limit": 1000},
    {"group_by": True, "order_by": True, "limit": 1000},
)


def rq4_apply_variant(sql: str, variant: dict, group_col: str = "l_returnflag") -> str:
    """Append GROUP BY / ORDER BY / LIMIT clauses to a generated filter query
    (template composition, generate_tpch_rq4_specs.py:23-30)."""
    out = sql
    if variant.get("group_by"):
        out = (
            f"SELECT {group_col}, COUNT(*) AS cnt FROM ({sql}) t"
            f" GROUP BY {group_col}"
        )
    if variant.get("order_by"):
        col = "cnt" if variant.get("group_by") else "1"
        out = f"{out} ORDER BY {col}"
    if variant.get("limit"):
        out = f"{out} LIMIT {variant['limit']}"
    return out


# --- G9 continued: descriptor -> fill-able spec -----------------------------

#: column -> (interval-rule type, SQL literal wrapper) for the RQ1/RQ2 pools
_COL_TYPES: dict[str, str] = {
    "l_shipdate": "date",
    "l_quantity": "float",
    "l_discount": "float",
    "l_extendedprice": "float",
    "l_tax": "float",
    "l_orderkey": "int",
    "l_partkey": "int",
    "l_suppkey": "int",
}


def _col_type(col: str) -> str | None:
    return _COL_TYPES.get(col) or _EVENTS_COL_TYPES.get(col)


def _placeholder(col: str, name: str) -> str:
    # timestamp columns need typed literals in BOTH engines
    if _col_type(col) == "date":
        return f"TIMESTAMP ':{name}'"
    return f":{name}"


def materialize_rq1_spec(desc: dict) -> list[dict]:
    """Turn an RQ1/RQ2 matrix descriptor (``rq1_specs``/``rq2_specs`` row)
    into fill-able spec dicts — the step the reference performs inside
    generate_tpch_rq1_specs.py:51-96 when writing spec YAMLs.

    Returns [range_spec, point_spec]: the range spec draws a conjunctive
    BETWEEN box whose per-dimension width ratio is the band selectivity's
    d-th root (independent-dimension approximation); the point spec draws an
    equality probe on the leading column.  Both are plain specs for
    ``fill_spec`` (same sampling/substitution path as user specs)."""
    cols = [c for c in desc["columns"] if _col_type(c)]
    if not cols:
        raise ValueError(f"no known columns in descriptor: {desc['columns']}")
    lo, hi = desc.get("selectivity", (0.01, 0.1))
    d = len(cols)
    rlo = max(1e-4, float(lo)) ** (1.0 / d)
    rhi = max(rlo, float(hi) ** (1.0 / d))
    gen = dict(desc.get("generation") or {"mode": "random", "seed": 42})

    preds, params, rules = [], {}, []
    for c in cols:
        t = _col_type(c)
        p_lo, p_hi = f"{c}_lo", f"{c}_hi"
        preds.append(
            f"{c} BETWEEN {_placeholder(c, p_lo)}"
            f" AND {_placeholder(c, p_hi)}"
        )
        params[p_lo] = {"type": t}
        params[p_hi] = {"type": t}
        rules.append(
            {
                "lo": p_lo,
                "hi": p_hi,
                "type": t,
                "column": c,
                "ratio_range": [rlo, rhi],
            }
        )
    range_spec = {
        "generation": {**gen, "n": desc.get("n_range", 10)},
        "templates": [
            {
                "id": f"{desc['name']}_range",
                "sql": (
                    "SELECT COUNT(*) AS cnt FROM {{tbl}} WHERE "
                    + " AND ".join(preds)
                ),
                "params": params,
                "interval_rules": rules,
            }
        ],
    }

    lead = cols[0]
    lt = _col_type(lead)
    if lt in ("int", "date", "categorical"):
        # discrete domains: true equality probe; the zero-width interval
        # rule samples the point from the column's actual domain via stats
        point_sql = (
            "SELECT COUNT(*) AS cnt FROM {{tbl}} WHERE "
            f"{lead} = {_placeholder(lead, 'v')}"
        )
        point_rule = {
            "lo": "v",
            "hi": "v_hi",
            "type": lt,
            "column": lead,
            "ratio": 0.0,
        }
    else:
        # continuous domains: equality on a uniform double matches ~nothing
        # (the reference's point probes are on dates/ints only) — the point
        # analog for a float column is a very narrow BETWEEN
        point_sql = (
            "SELECT COUNT(*) AS cnt FROM {{tbl}} WHERE "
            f"{lead} BETWEEN {_placeholder(lead, 'v')}"
            f" AND {_placeholder(lead, 'v_hi')}"
        )
        point_rule = {
            "lo": "v",
            "hi": "v_hi",
            "type": lt,
            "column": lead,
            "ratio": 0.001,
        }
    point_spec = {
        "generation": {**gen, "n": desc.get("n_point", 25)},
        "templates": [
            {
                "id": f"{desc['name']}_point",
                "sql": point_sql,
                "params": {"v": {"type": lt}, "v_hi": {"type": lt}},
                "interval_rules": [point_rule],
            }
        ],
    }
    return [range_spec, point_spec]


#: events-table column types (the Amazon-reviews analog in the test data:
#: record_timestamp -> ts, rating -> value, category -> event_type,
#: user_id -> user_id; generate_amazon_rq1_specs.py:31-58)
_EVENTS_COL_TYPES: dict[str, str] = {
    "ts": "date",
    "value": "float",
    "user_id": "int",
    "event_type": "categorical",
}


def events_specs(
    table: str = "events",
    n_range: int = 10,
    n_point: int = 10,
    seed: int = 42,
) -> list[dict]:
    """Amazon-RQ1-style matrix over the ``events`` table: the reference
    sweeps selectivity bands over (record_timestamp, rating) style column
    pairs plus categorical equality (generate_amazon_rq1_specs.py:31-58);
    here ts/value/user_id/event_type play those roles."""
    configs = (
        ("ts", "value"),
        ("ts", "user_id"),
        ("value", "user_id"),
        ("event_type", "value"),  # categorical slice + numeric box
    )
    specs = []
    for band, (lo, hi) in RQ1_BANDS.items():
        for cols in configs:
            specs.append(
                {
                    "name": f"AMZ_{band}_{'_'.join(cols)}",
                    "table": table,
                    "band": band,
                    "selectivity": (lo, hi),
                    "columns": list(cols),
                    "n_range": n_range,
                    "n_point": n_point,
                    "generation": {"mode": "random", "seed": seed},
                }
            )
    return specs
