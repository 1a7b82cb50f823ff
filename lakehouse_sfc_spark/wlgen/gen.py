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


#: RQ2 selectivity bands — the reference generates specs for S3/S4 only
#: (generate_tpch_rq2_specs.py:30-42, the S1/S2 block is commented out there)
RQ2_BANDS: dict[str, tuple[float, float]] = {
    "S3": (0.010, 0.100),
    "S4": (0.100, 0.200),
}

#: RQ2 column configs INCLUDING order permutations (O1..O6): column order is
#: the experiment variable for SFC layouts — the same 3-column box filters
#: differently depending on which column leads the curve
#: (generate_tpch_rq2_specs.py:45-61; the reference's duplicated C2 O5/O6
#: rows repeat O3/O4 verbatim and are collapsed here)
RQ2_COLUMN_CONFIGS: dict[str, tuple[str, ...]] = {
    "C1_N3_O1": ("l_shipdate", "l_receiptdate", "l_commitdate"),
    "C1_N3_O2": ("l_shipdate", "l_commitdate", "l_receiptdate"),
    "C1_N3_O3": ("l_commitdate", "l_shipdate", "l_receiptdate"),
    "C1_N3_O4": ("l_receiptdate", "l_shipdate", "l_commitdate"),
    "C1_N3_O5": ("l_receiptdate", "l_commitdate", "l_shipdate"),
    "C1_N3_O6": ("l_commitdate", "l_receiptdate", "l_shipdate"),
    "C2_N3_O1": ("l_extendedprice", "l_quantity", "l_shipdate"),
    "C2_N3_O2": ("l_quantity", "l_extendedprice", "l_shipdate"),
    "C2_N3_O3": ("l_extendedprice", "l_shipdate", "l_quantity"),
    "C2_N3_O4": ("l_quantity", "l_shipdate", "l_extendedprice"),
    "C3_N4_O1": ("l_suppkey", "l_shipdate", "l_extendedprice", "l_quantity"),
    "C3_N4_O2": ("l_shipdate", "l_suppkey", "l_extendedprice", "l_quantity"),
    "C4_N5_O1": (
        "l_shipdate", "l_commitdate", "l_suppkey", "l_extendedprice",
        "l_quantity",
    ),
}

#: RQ2 point-query fan-outs x probe columns (generate_tpch_rq2_specs.py:64-75
#: QUERY_DEFS Q4_K{k}: IN-lists of K distinct values)
RQ2_POINT_FANOUTS: tuple[int, ...] = (1, 4, 16)
RQ2_POINT_COLUMNS: tuple[str, ...] = (
    "l_shipdate", "l_commitdate", "l_orderkey", "l_suppkey", "l_quantity",
)


def rq2_specs(
    table: str = "lineitem",
    seed: int = 42,
    n_range: int = 10,
    n_point: int = 10,
) -> list[dict]:
    """RQ2 matrix: band-specific selectivities x column-ORDER configs for
    the conjunctive boxes, plus IN-list point probes with fan-out K
    (generate_tpch_rq2_specs.py:30-75).  Range descriptors materialize via
    ``materialize_rq1_spec``; point descriptors via the ``fanout`` branch of
    ``materialize_rq2_spec``."""
    specs = []
    for band, (lo, hi) in RQ2_BANDS.items():
        for label, cols in RQ2_COLUMN_CONFIGS.items():
            specs.append(
                {
                    "name": f"RQ2_{band}_{label}",
                    "table": table,
                    "band": band,
                    "selectivity": (lo, hi),
                    "column_config": label,
                    "columns": list(cols),
                    "n_dims": len(cols),
                    "n_range": n_range,
                    "n_point": 0,
                    "generation": {"mode": "random", "seed": seed},
                }
            )
    for k in RQ2_POINT_FANOUTS:
        for idx, col in enumerate(RQ2_POINT_COLUMNS, start=1):
            specs.append(
                {
                    "name": f"RQ2_Q4_K{k}_{idx}",
                    "table": table,
                    "kind": "point",
                    "columns": [col],
                    "fanout": k,
                    "n_point": n_point,
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
    "l_receiptdate": "date",
    "l_commitdate": "date",
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


def materialize_rq2_spec(desc: dict) -> list[dict]:
    """Materialize an RQ2 descriptor.  Range/box descriptors share the RQ1
    path (band-specific ratio_range per dimension); ``kind: point``
    descriptors become IN-list probes with fan-out K — K zero-width interval
    rules draw K values from the column's actual domain, and pairwise
    ``!=`` constraints keep them distinct (generate_tpch_rq2_specs.py:
    140-167 build_point_template; the reference's ``not in {..}`` set
    constraint is expressed as plain comparisons for the AST whitelist)."""
    if desc.get("kind") != "point":
        return materialize_rq1_spec(desc)
    col = desc["columns"][0]
    t = _col_type(col)
    if t is None:
        raise ValueError(f"unknown point column: {col}")
    k = int(desc.get("fanout", 1))
    gen = dict(desc.get("generation") or {"mode": "random", "seed": 42})

    params, rules, names = {}, [], []
    for i in range(1, k + 1):
        v = f"{col}_v{i}"
        pdef: dict = {"type": t}
        if i > 1:
            pdef["constraint"] = " and ".join(f"{v} != {p}" for p in names)
        params[v] = pdef
        params[f"{v}_hi"] = {"type": t}
        # zero-width rule: samples the point from the column's observed
        # domain via stats; only the lo param appears in the SQL
        rules.append(
            {"lo": v, "hi": f"{v}_hi", "type": t, "column": col,
             "ratio": 0.0},
        )
        names.append(v)
    in_list = ", ".join(_placeholder(col, v) for v in names)
    return [
        {
            "generation": {**gen, "n": desc.get("n_point", 10)},
            "templates": [
                {
                    "id": f"{desc['name']}_point",
                    "sql": (
                        "SELECT COUNT(*) AS cnt FROM {{tbl}} WHERE "
                        f"{col} IN ({in_list})"
                    ),
                    "params": params,
                    "interval_rules": rules,
                }
            ],
        }
    ]


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
