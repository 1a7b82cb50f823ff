"""Oracle output-TYPE parity guard (round-6, VERDICT r5 task 2).

Round 4/5's only driver failures were invisible to every local rig: DuckDB
types a raw output-position ``SUM(<bigint>)`` as HUGEINT, which renders as
``int`` via ``fetchall()`` (what the local sim hashed) but as Decimal /
float64 via the Arrow / pandas path the driver fetches through — so rows
and schema matched while the value hash failed.  Two checks make the class
impossible to reintroduce:

1. ``DESCRIBE`` every registered oracle in DuckDB and assert NO output
   column is typed HUGEINT / UHUGEINT / any unsigned integer — those all
   render outside the Python-int envelope on at least one fetch path.
2. Class-level type parity: for every output column, the DuckDB type class
   (int / float / decimal / bool / string / date / naive-vs-aware
   timestamp) must equal the Spark schema's class.  A raw SUM that slips
   through as DECIMAL while Spark emits BIGINT fails here even though both
   are "numeric".
"""

from __future__ import annotations

import re

import duckdb
import pytest
from pyspark.sql import types as T

from lakehouse_sfc_spark import TABLES
from lakehouse_sfc_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"

_WITH_ORACLE = sorted(n for n, s in QUERIES.items() if s.oracle is not None)

# Types whose fetch-path render is not a plain Python int/float everywhere:
# HUGEINT -> Decimal (Arrow) / float64 (pandas); unsigned ints -> may
# overflow int64 on the pandas path; DECIMAL -> exact Decimal via
# fetchall()/Arrow but float64 via the pandas path (the round-8 driver
# red row, a_trend_slope: values bit-identical, hash diverged purely on
# render).  DECIMAL is fine INTERNALLY (the dsum discipline), but no
# FINAL output column may be decimal-typed — emit exact big integers as
# canonical strings (CAST(... AS VARCHAR) of a scale-0 decimal) instead.
_FORBIDDEN = re.compile(
    r"HUGEINT|UBIGINT|UINTEGER|USMALLINT|UTINYINT|DECIMAL", re.I
)

_DUCK_INT = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT"}


def _duck_class(duck_type: str) -> str:
    t = duck_type.upper()
    if t in _DUCK_INT:
        return "int"
    if t in ("DOUBLE", "FLOAT", "REAL"):
        return "float"
    if t.startswith("DECIMAL"):
        return "decimal"
    if t == "BOOLEAN":
        return "bool"
    if t == "VARCHAR":
        return "string"
    if t == "DATE":
        return "date"
    if "TIMESTAMP WITH TIME ZONE" in t or t == "TIMESTAMPTZ":
        return "timestamp_tz"
    if t.startswith("TIMESTAMP"):
        return "timestamp_naive"
    return "other"


def _spark_class(dt: T.DataType) -> str:
    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        return "int"
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return "float"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.TimestampNTZType):
        return "timestamp_naive"
    if isinstance(dt, T.TimestampType):
        # PySpark collect() renders TimestampType as a NAIVE datetime in
        # the session timezone — on a UTC driver it hashes like NTZ.
        return "timestamp_naive"
    return "other"


def test_render_guard_catches_injected_uncast_sum():
    """driver_sim's fetchall-vs-Arrow render hash must flag the exact
    defect class the round-5 driver caught: an uncast output-position
    SUM(BIGINT) (HUGEINT) renders int via fetchall but Decimal via Arrow."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from driver_sim import render_divergent_cols, value_hash

    con = duckdb.connect()
    bad_sql = "SELECT 1 AS g, SUM(x) AS s FROM (VALUES (99111)) t(x) GROUP BY 1"
    cols = ["g", "s"]
    frows = [tuple(r) for r in con.execute(bad_sql).fetchall()]
    arows = [
        tuple(d[c] for c in cols)
        for d in con.execute(bad_sql).arrow().to_pylist()
    ]
    assert value_hash(cols, frows) != value_hash(cols, arows)
    assert render_divergent_cols(cols, frows, arows) == ["s"]

    good_sql = bad_sql.replace("SUM(x)", "CAST(SUM(x) AS BIGINT)")
    frows = [tuple(r) for r in con.execute(good_sql).fetchall()]
    arows = [
        tuple(d[c] for c in cols)
        for d in con.execute(good_sql).arrow().to_pylist()
    ]
    assert value_hash(cols, frows) == value_hash(cols, arows)


def test_pandas_render_guard_catches_injected_decimal_output():
    """driver_sim's new .df() leg must flag the round-8 red-row class —
    a DECIMAL(38,0) final column renders Decimal via fetchall but float64
    via the driver's pandas fetch path — while tolerating the benign
    pandas boxings (nullable BIGINT -> float64, DATE -> midnight
    Timestamp) that green driver rows have carried since round 1."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from driver_sim import pandas_rows, value_hash

    con = duckdb.connect()
    bad_sql = (
        "SELECT 1 AS g, CAST(35 AS DECIMAL(38,0)) AS s, "
        "DATE '1995-01-02' AS d, CAST(NULL AS BIGINT) AS ni"
    )
    cols = [d[0] for d in con.execute(bad_sql).description]
    frows = [tuple(r) for r in con.execute(bad_sql).fetchall()]
    prows = pandas_rows(con, bad_sql, cols, frows)
    assert value_hash(cols, frows) != value_hash(cols, prows)

    good_sql = bad_sql.replace(
        "CAST(35 AS DECIMAL(38,0))", "CAST(CAST(35 AS DECIMAL(38,0)) AS VARCHAR)"
    )
    cols = [d[0] for d in con.execute(good_sql).description]
    frows = [tuple(r) for r in con.execute(good_sql).fetchall()]
    prows = pandas_rows(con, good_sql, cols, frows)
    # benign boxings (date, NULL bigint) normalize away; varchar is stable
    assert value_hash(cols, frows) == value_hash(cols, prows)


@pytest.fixture(scope="module")
def duck_types():
    """name -> [(col, duck_type), ...] for every oracle, via DESCRIBE."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    out = {}
    for name in _WITH_ORACLE:
        desc = con.execute(
            f"DESCRIBE SELECT * FROM ({QUERIES[name].oracle}) __q"
        ).fetchall()
        out[name] = [(row[0], row[1]) for row in desc]
    con.close()
    return out


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_no_forbidden_duck_types(duck_types, name):
    bad = [(c, t) for c, t in duck_types[name] if _FORBIDDEN.search(t)]
    assert not bad, (
        f"{name}: oracle output columns {bad} render inconsistently across "
        "the driver's fetch paths (fetchall=Decimal/int vs pandas=float64) "
        "— CAST(... AS BIGINT), or AS VARCHAR for beyond-int64 exact values"
    )


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_type_class_parity(spark, duck_types, name):
    sdf = QUERIES[name].fn(spark, SF_DIR)
    spark_classes = {
        f.name.lower(): _spark_class(f.dataType) for f in sdf.schema.fields
    }
    duck_classes = {c.lower(): _duck_class(t) for c, t in duck_types[name]}
    assert set(spark_classes) == set(duck_classes), (
        f"{name}: column-name mismatch spark={sorted(spark_classes)} "
        f"duck={sorted(duck_classes)}"
    )
    diverged = {
        c: (spark_classes[c], duck_classes[c])
        for c in spark_classes
        if "other" not in (spark_classes[c], duck_classes[c])
        and spark_classes[c] != duck_classes[c]
    }
    assert not diverged, (
        f"{name}: output type-class divergence (spark, duck): {diverged} — "
        "these hash-differ on at least one driver fetch path"
    )
    # Matched decimal<->decimal parity is NOT enough (the round-8 hole):
    # DuckDB DECIMAL renders float64 on the pandas fetch path while Spark
    # collects Decimal, so final schemas must carry no DecimalType at all.
    dec_cols = [c for c, cls in spark_classes.items() if cls == "decimal"]
    assert not dec_cols, (
        f"{name}: final Spark schema has DecimalType columns {dec_cols} — "
        "decimal is internal-only (registry dsum discipline); emit exact "
        "big values as canonical strings or cast back to bigint/double"
    )
