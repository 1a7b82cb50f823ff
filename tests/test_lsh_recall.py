"""Exhaustive-pair recall guard for the banded MinHash-LSH candidate
generation (advisor r9): the DuckDB oracle now mirrors the SAME band
layout and _MH_COEF constants as the Spark side, so a conceptual banding
bug present on both sides would sail through the driver's engine↔oracle
compare.  This test closes that hole with a third, INDEPENDENT
implementation: pure-Python brute-force all-pairs Jaccard over the same
word-trigram sets (no minhash, no banding, no shared constants) on a
small synthetic corpus.

Properties checked against `dedup_minhash_lsh`:
  precision — every emitted pair really has exact Jaccard ≥ τ (the
      engine's verification step re-computes exact Jaccard, so a
      violation means the gram kernels diverged);
  recall — every brute-force pair with Jaccard ≥ 0.85 (comfortably above
      τ=0.7) is emitted.  With the repo's fixed 16×4 band layout the miss
      probability per such pair is (1−s⁴)¹⁶ ≤ 2e−6 and the hash
      coefficients are seeded at import, so this is deterministic; a band
      slicing/misalignment regression collapses effective band count and
      reliably drops some of these pairs.
"""

from __future__ import annotations

import itertools
import random
import re

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lakehouse_sfc_spark.queries.registry import QUERIES
import lakehouse_sfc_spark.queries  # noqa: F401  (register all)

TAU = 0.7
SAFE = 0.85  # recall asserted only comfortably above the threshold

_VOCAB = [
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform "
    "victor whiskey xray yankee zulu amber birch cedar dune ember fjord "
    "grove harbor inlet jetty knoll lagoon mesa nectar orchard prairie"
][0].split()


def _corpus() -> list[tuple[int, str]]:
    rng = random.Random(20260816)
    docs: list[tuple[int, str]] = []
    did = 0

    def add(text: str) -> int:
        nonlocal did
        docs.append((did, text))
        did += 1
        return did - 1

    for _ in range(8):
        words = [rng.choice(_VOCAB) for _ in range(40)]
        add(" ".join(words))
        # near-dup: one word swapped => trigram Jaccard ~0.92
        v = list(words)
        v[rng.randrange(3, 37)] = "changed"
        add(" ".join(v))
        # mid-sim: 12 of 40 words swapped => Jaccard well below tau
        m = list(words)
        for i in rng.sample(range(40), 12):
            m[i] = rng.choice(_VOCAB)
        add(" ".join(m))
    for _ in range(6):  # unrelated filler
        add(" ".join(rng.choice(_VOCAB) for _ in range(30)))
    return docs


def _trigrams(text: str) -> set[str]:
    # independent re-implementation of _tokens/_ngrams3: lower, collapse
    # whitespace, split, distinct word trigrams
    w = re.sub(r"\s+", " ", text.lower()).strip().split(" ")
    return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}


def _brute_pairs(docs) -> dict[tuple[int, int], float]:
    grams = {i: _trigrams(t) for i, t in docs}
    out = {}
    for (a, ga), (b, gb) in itertools.combinations(grams.items(), 2):
        inter = len(ga & gb)
        if not inter:
            continue
        jac = inter / len(ga | gb)
        if jac >= TAU:
            out[(min(a, b), max(a, b))] = jac
    return out


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    docs = _corpus()
    tbl = pa.table(
        {
            "doc_id": pa.array([i for i, _ in docs], pa.int64()),
            "text": pa.array([t for _, t in docs], pa.string()),
            "lang": pa.array(["en"] * len(docs), pa.string()),
            "source": pa.array(["synthetic"] * len(docs), pa.string()),
            "n_chars": pa.array([len(t) for _, t in docs], pa.int64()),
        }
    )
    d = tmp_path_factory.mktemp("lshrecall")
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d)


def test_lsh_banded_candidates_match_bruteforce(spark, fixture_dir):
    docs = _corpus()
    brute = _brute_pairs(docs)
    safe = {p for p, j in brute.items() if j >= SAFE}
    assert len(safe) >= 6, "fixture must contain high-sim pairs"

    got = {
        (int(r["a_id"]), int(r["b_id"])): float(r["jac"])
        for r in QUERIES["dedup_minhash_lsh"]
        .fn(spark, fixture_dir)
        .collect()
    }

    # precision: everything emitted is a true >= tau pair, with the exact
    # Jaccard value the brute-force side computes (rounded to 4 as the
    # query does)
    for pair, jac in got.items():
        assert pair in brute, f"false positive {pair}"
        assert jac == pytest.approx(round(brute[pair], 4), abs=1e-9)

    # recall: no comfortably-above-threshold pair may be missed
    missed = safe - set(got)
    assert not missed, (
        f"banded candidate generation dropped high-similarity pairs "
        f"{sorted(missed)} — band layout regression"
    )
