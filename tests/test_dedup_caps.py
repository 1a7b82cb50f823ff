"""Round-9 contract caps for the near-dup candidate generators.

Two saturated-bucket drops became part of the registered contracts this
round (both oracle-mirrored — the driver hash would catch any one-sided
application):

- _DF_CAP (queries/datapipe.py): n-grams with document frequency above the
  cap are excluded from PREFIX-FILTER candidate generation (the
  dedup_ngram_jaccard / dedup_containment / dedup_edit_distance /
  dedup_minhash_estimate_error / sample_split_leakage family).
- _SH_BUCKET_CAP: simhash (source, band, byte) buckets above the cap are
  skipped by dedup_simhash.

These tests build fixtures that actually SATURATE a bucket — the driver
fixtures never do (max gram df 25, max simhash occupancy 172 at sf0.1), so
a regression in either side of the mirror is invisible there — and assert
(a) the capped pair is dropped, (b) a rare-gram pair survives with an
EXACT score, and (c) Spark and the DuckDB oracle agree bit-for-bit.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from lakehouse_sfc_spark.queries.datapipe import (
    _DF_CAP,
    _SH_BUCKET_CAP,
    _docs_ngrams,
    _prefix_candidates,
)
from lakehouse_sfc_spark.queries.registry import QUERIES
from tests._compare import compare_query

SRC = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _fixture_dir(tmp_path, docs_sql: str) -> str:
    """sf0.001 clone with a replacement documents table (pure SQL rows)."""
    import duckdb

    out = str(tmp_path / "capfix")
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        if t != "documents":
            shutil.copy(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")
    duckdb.connect().execute(
        f"COPY ({docs_sql}) TO '{out}/documents.parquet' (FORMAT PARQUET)"
    )
    return out


def _saturated_docs_sql() -> str:
    """70 docs whose ONLY shared grams are saturated (identical 6-token
    text => every gram df = 68 > _DF_CAP) plus one near-dup pair (ids 1,2)
    sharing rare grams.  Jaccard(1,2) = 1.0; every saturated pair also has
    Jaccard 1.0 — so the cap, not the threshold, decides who survives."""
    assert _DF_CAP == 64, "fixture sized for cap 64 — resize if cap changes"
    return """
    SELECT * FROM (
      SELECT CAST(i AS BIGINT) AS doc_id,
             'aa bb cc aa bb cc' AS text,
             'en' AS lang, 'web' AS source,
             CAST(17 AS BIGINT) AS n_chars
      FROM range(10, 78) t(i)
      UNION ALL
      SELECT 1, 'aa bb cc rare1 rare2 rare3', 'en', 'web', 26
      UNION ALL
      SELECT 2, 'aa bb cc rare1 rare2 rare3', 'en', 'web', 26
    )
    """


def test_prefix_cap_unit_drops_saturated_keeps_rare(spark, tmp_path):
    sf = _fixture_dir(tmp_path, _saturated_docs_sql())
    ngr = _docs_ngrams(spark, sf)
    pairs = {
        (r.a_id, r.b_id)
        for r in _prefix_candidates(ngr, 0.8, symmetric=True).collect()
    }
    assert (1, 2) in pairs, "rare-gram near-dup pair must stay a candidate"
    assert all(
        a in (1, 2) and b in (1, 2) for a, b in pairs
    ), f"saturated-only pairs must be dropped, got {sorted(pairs)[:5]}"


@pytest.mark.parametrize(
    "name",
    [
        "dedup_ngram_jaccard",
        "dedup_containment",
        "dedup_edit_distance",
        "sample_split_leakage",
    ],
)
def test_prefix_cap_oracle_mirror_on_saturated_fixture(spark, tmp_path, name):
    """Spark and DuckDB must agree bit-for-bit when the cap BINDS — the
    one-sided-cap regression the driver fixtures can't see."""
    sf = _fixture_dir(tmp_path, _saturated_docs_sql())
    spec = QUERIES[name]
    compare_query(spark, sf, spec.fn, spec.oracle)


def test_simhash_bucket_cap_drops_pile_keeps_pair(spark, tmp_path):
    """300 identical docs in one source saturate every band bucket
    (occupancy 300 > 256) => zero pairs from that source; a 3-doc cluster
    in another source stays under the cap => its pairs survive.  Both
    engines must agree on exactly that."""
    assert _SH_BUCKET_CAP == 256, "fixture sized for cap 256"
    docs_sql = """
    SELECT * FROM (
      SELECT CAST(i AS BIGINT) AS doc_id,
             'the quick brown fox jumps over the lazy dog again' AS text,
             'en' AS lang, 'pile' AS source, CAST(50 AS BIGINT) AS n_chars
      FROM range(100, 400) t(i)
      UNION ALL
      SELECT 1, 'alpha beta gamma delta epsilon zeta', 'en', 'tiny', 35
      UNION ALL
      SELECT 2, 'alpha beta gamma delta epsilon zeta', 'en', 'tiny', 35
      UNION ALL
      SELECT 3, 'alpha beta gamma delta epsilon eta', 'en', 'tiny', 34
    )
    """
    sf = _fixture_dir(tmp_path, docs_sql)
    spec = QUERIES["dedup_simhash"]
    rows = spec.fn(spark, sf).collect()
    ids = {r.a_id for r in rows} | {r.b_id for r in rows}
    assert ids and ids <= {1, 2, 3}, (
        f"saturated 'pile' source must contribute no pairs, got ids {ids}"
    )
    compare_query(spark, sf, spec.fn, spec.oracle)


def test_lsh_oracle_mirrors_band_candidates(spark, tmp_path):
    """The minhash-LSH oracle now mirrors the banded candidate generation
    instead of asserting perfect LSH recall; on a fixture where the pair
    graph is dense (many identical docs, all true pairs band-collide) both
    sides must still agree exactly."""
    docs_sql = """
    SELECT CAST(i AS BIGINT) AS doc_id,
           CASE WHEN i % 3 = 0
                THEN 'shared prefix tokens one two three four five'
                ELSE 'shared prefix tokens one two three four six'
           END AS text,
           'en' AS lang, 'web' AS source, CAST(44 AS BIGINT) AS n_chars
    FROM range(0, 30) t(i)
    """
    sf = _fixture_dir(tmp_path, docs_sql)
    for name in ("dedup_minhash_lsh", "dedup_incremental"):
        spec = QUERIES[name]
        compare_query(spark, sf, spec.fn, spec.oracle)
