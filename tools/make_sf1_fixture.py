"""Generate a deterministic sf1 fixture (10x sf0.1) at .scratch/sf1/.

The driver ships sf0.001/sf0.01/sf0.1 (TESTDATA.md, read-only); the scale
sweep's 100x trend therefore tops out at 600k lineitem rows.  This tool
extends the ladder one decade (6M lineitem rows, ~170 MB) so the heavy-tail
operators get a measured 1000x point instead of a plan-shape argument.

Construction (seed fixed, rerunnable, output bit-stable):

- region/nation: copied verbatim (fixed-universe dimensions).
- customer/supplier/part/orders/lineitem/events: 10 key-shifted replicas.
  Every foreign key is shifted by the SAME per-table offset as its parent's
  primary key, so join fan-outs, per-key group sizes, and all value
  distributions are IDENTICAL to sf0.1 — the data grows, the shapes don't
  (the property a scale sweep wants; naive row duplication without key
  shifts would instead multiply per-key densities).
- documents: 50k NEW texts sampled from sf0.1's empirical unigram and
  doc-length distributions (lang/source from the empirical joint), with a
  2% near-duplicate injection (copy an earlier new doc, mutate ~5% of
  tokens) so the dedup family sees a realistic candidate rate instead of
  either zero dups or a 10x-duplicated corpus (which would inflate verify
  volume quadratically and fake a super-linear trend).
- embeddings: 20k vectors bootstrapped from sf0.1 rows with small Gaussian
  perturbation (3% of the global std per dim), label inherited — cluster
  structure preserved, no exact duplicates.

Run: ``python tools/make_sf1_fixture.py``  (~30 s, writes .scratch/sf1/).
"""

from __future__ import annotations

import shutil
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_REPO = Path(__file__).resolve().parents[1]
SRC = Path("/root/testdata/sf0.1")
OUT = _REPO / ".scratch" / "sf1"
REPLICAS = 10
SEED = 4242

# per-table primary-key offsets.  Far above the sf0.1 max AND above every
# shifted-key convention the registry entries use on their own batches
# (snap_* chains shift o_orderkey by +4e7..+5e8; a replica offset of 1e7
# collided with the MERGE demo's +5e7 inserts and produced duplicate
# source keys at sf1 — hence the 1e9 stride).
OFF = {
    "c_custkey": 100_000_000,
    "s_suppkey": 10_000_000,
    "p_partkey": 100_000_000,
    "o_orderkey": 1_000_000_000,
    "event_id": 1_000_000_000,
    "user_id": 100_000_000,
}

#: table -> {column: offset-key} for every key column (PK and FKs)
KEYED = {
    "customer": {"c_custkey": "c_custkey"},
    "supplier": {"s_suppkey": "s_suppkey"},
    "part": {"p_partkey": "p_partkey"},
    "orders": {"o_orderkey": "o_orderkey", "o_custkey": "c_custkey"},
    "lineitem": {
        "l_orderkey": "o_orderkey",
        "l_partkey": "p_partkey",
        "l_suppkey": "s_suppkey",
    },
    "events": {"event_id": "event_id", "user_id": "user_id"},
}


def _replicate(name: str) -> None:
    base = pq.read_table(SRC / f"{name}.parquet")
    shifts = KEYED[name]
    chunks = []
    for i in range(REPLICAS):
        t = base
        for col, offkey in shifts.items():
            idx = t.schema.get_field_index(col)
            arr = t.column(idx)
            if i > 0:
                arr = pa.chunked_array(
                    [
                        pa.compute.add(c, i * OFF[offkey]).cast(arr.type)
                        for c in arr.chunks
                    ]
                )
            t = t.set_column(idx, t.schema.field(idx), arr)
        chunks.append(t)
    out = pa.concat_tables(chunks)
    pq.write_table(out, OUT / f"{name}.parquet")
    print(f"{name}: {base.num_rows} -> {out.num_rows}")


def _documents(rng: np.random.Generator) -> None:
    base = pq.read_table(SRC / "documents.parquet").to_pydict()
    texts = [t for t in base["text"] if t]
    vocab: dict[str, int] = {}
    lengths = []
    for t in texts:
        w = t.split()
        lengths.append(len(w))
        for x in w:
            vocab[x] = vocab.get(x, 0) + 1
    words = np.array(sorted(vocab))
    freq = np.array([vocab[w] for w in words], dtype=np.float64)
    freq /= freq.sum()
    lengths = np.array(lengths)
    pairs = list(zip(base["lang"], base["source"]))
    n = len(base["doc_id"]) * REPLICAS

    new_texts: list[str] = []
    langs: list[str] = []
    sources: list[str] = []
    for d in range(n):
        ls = pairs[int(rng.integers(0, len(pairs)))]
        langs.append(ls[0])
        sources.append(ls[1])
        if d > 10 and rng.random() < 0.02:
            # near-dup: copy an earlier new doc, mutate ~5% of tokens
            src = new_texts[int(rng.integers(0, d))].split()
            for j in range(len(src)):
                if rng.random() < 0.05:
                    src[j] = str(words[int(rng.integers(0, len(words)))])
            new_texts.append(" ".join(src))
        else:
            ln = int(lengths[int(rng.integers(0, len(lengths)))])
            picks = rng.choice(len(words), size=ln, p=freq)
            new_texts.append(" ".join(words[k] for k in picks))
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(new_texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array([len(t) for t in new_texts], pa.int64()),
        }
    )
    pq.write_table(tbl, OUT / "documents.parquet")
    print(f"documents: {len(texts)} -> {n}")


def _embeddings(rng: np.random.Generator) -> None:
    base = pq.read_table(SRC / "embeddings.parquet")
    emb = np.array(base.column("embedding").to_pylist(), dtype=np.float32)
    labels = np.array(base.column("label").to_pylist())
    std = float(emb.std())
    n = emb.shape[0] * REPLICAS
    picks = rng.integers(0, emb.shape[0], size=n)
    noise = rng.normal(0.0, 0.03 * std, size=(n, emb.shape[1]))
    new = (emb[picks] + noise).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [row.tolist() for row in new], pa.list_(pa.float32())
            ),
            "label": pa.array(labels[picks], pa.int32()),
        }
    )
    pq.write_table(tbl, OUT / "embeddings.parquet")
    print(f"embeddings: {emb.shape[0]} -> {n}")


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    for t in ("region", "nation"):
        shutil.copyfile(SRC / f"{t}.parquet", OUT / f"{t}.parquet")
        print(f"{t}: copied")
    for t in KEYED:
        _replicate(t)
    rng = np.random.default_rng(SEED)
    _documents(rng)
    _embeddings(rng)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
