"""Derive the ADVERSARIAL fixture (sf0.001-adv) from /root/testdata/sf0.001.

The driver's synthetic tables are ASCII-heavy and tie-sparse — exactly
where cross-engine divergences hide (see tests/test_engine_semantics.py).
This tool writes a schema-identical variant with the hostile shapes a
100-TB corpus actually contains, so the full registry sweep can prove
every oracle pair is bit-stable on them:

- NULLs in text / lang / label / props / value columns
- multi-byte unicode (CJK, emoji, combining accents, interior NBSP,
  tab/space whitespace mixes) in document text
- empty-string documents
- exact duplicate texts and embeddings (tie-dense dedup/similarity)
- all-zero embeddings (zero-norm cosine edge)
- NULL embedding arrays
- duplicate (ts, user_id) event pairs under different event_ids and
  full exact-duplicate event rows (window tie-breaks, non-unique keys)
- top-k value ties (repeated o_totalprice)
- an empty group (one nation with every customer removed)

Deliberately EXCLUDED (each is a documented engine divergence, not a
query bug — the matrix test pins them):
- Turkish İ / dotless ı / ß (Spark-Java vs DuckDB case mapping differ)
- NaN / Infinity doubles (CAST(NaN AS DECIMAL) errors in DuckDB but is
  NULL in Spark — no oracle pairing exists)
- leading/trailing NBSP (DuckDB trim strips unicode spaces, Spark not)

Usage: python tools/make_adv_fixture.py [out_dir]
Deterministic (pure SQL over the seeded source tables); safe to re-run.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.001"
DEFAULT_OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".advdata", "sf0.001-adv")

# text mixed in: CJK + emoji + combining-e-acute + interior NBSP + accents
UNI = "café 咖啡 \U0001F680 naïve mix"


def build(out_dir: str = DEFAULT_OUT) -> str:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    # Spill to gitignored .scratch/, never the worktree-local .tmp/ default.
    _duck_tmp = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch",
        "duckdb_tmp",
    )
    os.makedirs(_duck_tmp, exist_ok=True)
    con.execute(f"SET temp_directory='{_duck_tmp}'")

    def cp(sql: str, name: str) -> None:
        con.execute(
            f"COPY ({sql}) TO '{out_dir}/{name}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT COUNT(*) FROM '{out_dir}/{name}.parquet'"
        ).fetchone()[0]
        print(f"  {name}: {n} rows")

    src = lambda t: f"read_parquet('{SRC}/{t}.parquet')"  # noqa: E731

    # unchanged dims
    for t in ("region", "nation"):
        cp(f"SELECT * FROM {src(t)}", t)

    cp(
        f"""
        WITH base AS (
          SELECT *, lag(text) OVER (ORDER BY doc_id) AS prev_text
          FROM {src('documents')}
        )
        SELECT doc_id,
          CASE WHEN doc_id % 19 = 0 THEN NULL
               WHEN doc_id % 13 = 0 THEN ''
               WHEN doc_id % 29 = 0 THEN coalesce(prev_text, text)
               WHEN doc_id % 7 = 0 THEN text || ' {UNI}'
               WHEN doc_id % 11 = 0 THEN chr(9) || '  ' || text || '  '
               ELSE text END AS text,
          CASE WHEN doc_id % 23 = 0 THEN NULL ELSE lang END AS lang,
          source, n_chars
        FROM base ORDER BY doc_id
        """,
        "documents",
    )

    cp(
        f"""
        WITH base AS (
          SELECT *, lag(embedding) OVER (ORDER BY vec_id) AS prev_emb
          FROM {src('embeddings')}
        )
        SELECT vec_id,
          -- vec_id 0 stays intact: it is the ANN query vector and the
          -- k-center seed; nulling it would make every single-query ANN
          -- entry pass vacuously (empty vs empty)
          CAST(CASE WHEN vec_id = 0 THEN embedding
               WHEN vec_id % 31 = 0 THEN NULL
               WHEN vec_id % 17 = 0 THEN
                 list_transform(embedding, x -> CAST(0.0 AS FLOAT))
               WHEN vec_id % 13 = 0 THEN coalesce(prev_emb, embedding)
               ELSE embedding END AS FLOAT[]) AS embedding,
          CASE WHEN vec_id % 23 = 0 THEN NULL ELSE label END AS label
        FROM base ORDER BY vec_id
        """,
        "embeddings",
    )

    cp(
        f"""
        WITH mutated AS (
          SELECT event_id, ts, user_id, event_type,
            CASE WHEN event_id % 19 = 0 THEN NULL ELSE value END AS value,
            CASE WHEN event_id % 17 = 0 THEN NULL ELSE props END AS props
          FROM {src('events')}
        ),
        tie_pairs AS (  -- same (ts, user_id), fresh event_id: window ties
          SELECT event_id + 50000000 AS event_id, ts, user_id, event_type,
                 value + 1.0 AS value, props
          FROM mutated WHERE event_id % 41 = 0
        ),
        exact_dups AS (  -- full duplicate rows incl. event_id
          SELECT * FROM mutated WHERE event_id % 53 = 0
        )
        SELECT * FROM mutated
        UNION ALL SELECT * FROM tie_pairs
        UNION ALL SELECT * FROM exact_dups
        ORDER BY ts, event_id
        """,
        "events",
    )

    cp(
        f"""
        SELECT o_orderkey, o_custkey, o_orderstatus,
          CASE WHEN o_orderkey % 37 = 0
               THEN CAST(50000.00 AS DECIMAL(12,2)) -- dense top-k ties
               ELSE o_totalprice END AS o_totalprice,
          o_orderdate, o_orderpriority
        FROM {src('orders')} ORDER BY o_orderkey
        """,
        "orders",
    )

    cp(f"SELECT * FROM {src('lineitem')}", "lineitem")

    cp(
        f"""
        SELECT c_custkey,
          CASE WHEN c_custkey % 31 = 0 THEN c_name || ' {UNI}'
               ELSE c_name END AS c_name,
          c_nationkey, c_acctbal,
          CASE WHEN c_custkey % 29 = 0 THEN NULL ELSE c_mktsegment
               END AS c_mktsegment
        FROM {src('customer')}
        WHERE c_nationkey <> 3  -- nation 3: an empty customer group
        ORDER BY c_custkey
        """,
        "customer",
    )

    cp(f"SELECT * FROM {src('supplier')}", "supplier")
    cp(
        f"""
        SELECT p_partkey,
          CASE WHEN p_partkey % 43 = 0 THEN p_name || ' {UNI}'
               ELSE p_name END AS p_name,
          p_brand, p_type, p_size, p_retailprice
        FROM {src('part')} ORDER BY p_partkey
        """,
        "part",
    )
    con.close()
    return out_dir


if __name__ == "__main__":
    out = build(sys.argv[1] if len(sys.argv) > 1 else DEFAULT_OUT)
    print(f"adversarial fixture at {out}")
