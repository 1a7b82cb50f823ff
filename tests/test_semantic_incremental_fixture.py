"""Adversarial fixture for ``dedup_semantic_incremental`` (ADVICE r5 high).

The testdata SFs happen to give every batch vector at most one match, which
hid an oracle bug: ``MIN(k_id ORDER BY score DESC, k_id)`` is a NO-OP in
DuckDB (MIN is order-insensitive, returning the global min k_id), while the
Spark side returns the argmax-by-(score, lowest id) match.  This fixture
gives one batch vector TWO corpus matches whose lowest-id match is NOT the
best-scoring one, so the old oracle returns best_id=1 while the engine
correctly returns best_id=2 — the order-sensitive ``first(k_id ORDER BY
score DESC, k_id)`` oracle must agree with the engine.
"""

from __future__ import annotations

import math

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lakehouse_sfc_spark.queries import QUERIES

NAME = "dedup_semantic_incremental"


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("semantic_inc")
    # All-positive first 8 dims => identical sign-quantizer cell (B >= 8).
    # vec_id 0 is the batch row (0 % 19 == 0); 1 and 2 are corpus rows.
    #   cos(b, k1) ~= 0.774  (lower score, LOWER id)
    #   cos(b, k2)  = 1.0    (best score, higher id)
    b = [1.0] * 8
    k1 = [1.0, 1.0, 1.0, 1.0, 0.1, 0.1, 0.1, 0.1]
    k2 = [1.0] * 8
    tbl = pa.table(
        {
            "vec_id": pa.array([0, 1, 2], type=pa.int64()),
            "embedding": pa.array([b, k1, k2], type=pa.list_(pa.float32())),
            "label": pa.array([0, 0, 0], type=pa.int32()),
        }
    )
    pq.write_table(tbl, str(d / "embeddings.parquet"))
    return str(d)


def _oracle_rows(sql: str, fixture_dir: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{fixture_dir}/embeddings.parquet'"
    )
    cur = con.execute(sql)
    cols = [c[0] for c in cur.description]
    rows = [tuple(r) for r in cur.fetchall()]
    con.close()
    return cols, rows


def test_multi_match_argmax_parity(spark, fixture_dir):
    sdf = QUERIES[NAME].fn(spark, fixture_dir)
    srow = {r["b_id"]: r.asDict() for r in sdf.collect()}[0]
    assert srow["n_matches"] == 2
    assert srow["best_id"] == 2, "engine must pick the best-SCORING match"
    assert srow["best_score"] == pytest.approx(1.0)

    ocols, orows = _oracle_rows(QUERIES[NAME].oracle, fixture_dir)
    orow = dict(zip(ocols, orows[0]))
    assert orow["n_matches"] == 2
    assert orow["best_id"] == 2, (
        "oracle must use an order-SENSITIVE aggregate (first ... ORDER BY); "
        "MIN(k_id ORDER BY ...) silently returns the global min k_id"
    )
    assert orow["best_score"] == srow["best_score"]
    assert orow["is_dup"] is True and srow["is_dup"] is True


def test_fixture_scores_are_as_designed(fixture_dir):
    """Sanity: the lower-id match really is the worse-scoring one."""
    b = [1.0] * 8
    k1 = [1.0, 1.0, 1.0, 1.0, 0.1, 0.1, 0.1, 0.1]
    dot = sum(x * y for x, y in zip(b, k1))
    cos = dot / (
        math.sqrt(sum(x * x for x in b)) * math.sqrt(sum(x * x for x in k1))
    )
    assert 0.45 <= cos < 1.0
