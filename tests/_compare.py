"""Mirror of the driver's correctness gate: run a Spark query and its DuckDB
oracle on the same parquet tables, sort columns by name, sort rows, and
require EXACT value equality (floats bit-for-bit — queries must be written
deterministically; see registry.dsum/davg)."""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

import duckdb

from lakehouse_sfc_spark import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # Out-of-core spill goes to the gitignored .scratch/ — DuckDB's default
    # is `.tmp/` under the CWD, which once landed 7.3 GB in a git snapshot.
    import os

    _duck_tmp = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch",
        "duckdb_tmp",
    )
    os.makedirs(_duck_tmp, exist_ok=True)
    con.execute(f"SET temp_directory='{_duck_tmp}'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm(v):
    if v is None:
        return (0, "NULL")
    if isinstance(v, bool):
        return (1, str(v))
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return (2, "nan")
        # repr() keeps full double precision -> bitwise-equality check
        return (2, repr(v))
    if isinstance(v, int):
        return (3, str(v))
    # date and datetime are distinct categories on purpose: a DATE vs
    # TIMESTAMP type mismatch between Spark and the oracle must FAIL here
    # (the driver's hash compare would fail it too).
    if isinstance(v, datetime.datetime):
        return (4, v.isoformat())
    if isinstance(v, datetime.date):
        return (7, v.isoformat())
    if isinstance(v, (list, tuple)):
        return (5, tuple(_norm(x) for x in v))
    return (6, str(v))


def _normalize_rows(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        out.append(tuple(_norm(row[i]) for i in order))
    out.sort()
    return out, [colnames[i] for i in order]


def compare_query(spark, sf_dir: str, fn, oracle: str) -> None:
    sdf = fn(spark, sf_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    con = duckdb_conn(sf_dir)
    res = con.execute(oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    con.close()

    assert sorted(c.lower() for c in spark_cols) == sorted(
        c.lower() for c in duck_cols
    ), f"column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"

    s_rows, s_cols = _normalize_rows(
        spark_rows, [c.lower() for c in spark_cols]
    )
    d_rows, _ = _normalize_rows(duck_rows, [c.lower() for c in duck_cols])

    assert len(s_rows) == len(d_rows), (
        f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}"
    )
    for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
        assert sr == dr, (
            f"row {i} mismatch (cols {s_cols}):\n  spark={sr}\n  duck ={dr}"
        )
