"""Training-data-pipeline operators: deduplication and similarity search over
the ``documents`` / ``embeddings`` tables.

These go beyond the reference's SQL surface (SURVEY.md §7.2 step 10): they are
the operations a 100 TB training-data pipeline needs.  Operators use JVM-side
built-in functions (whole-stage codegen) wherever expressible; the one Python
stage — the blocked all-pairs cosine scorer — is an Arrow-batched
``applyInPandas`` gram-matrix kernel, never a row-at-a-time UDF.  Every
approximate/indexed variant is constructed so its *output* is provably
identical to the exact DuckDB oracle:

- MinHash-LSH generates candidates, then verifies with exact Jaccard: with
  b=16 bands × r=4 rows, P(miss) at J≥0.9 is (1-0.9^4)^16 ≈ 4e-8 per pair.
- The n-gram Jaccard join uses *prefix filtering* (exact by construction:
  J(a,b) ≥ τ implies |a∩b| ≥ ⌈τ·|x|⌉ for both x, so prefixes of length
  |x|-⌈τ|x|⌉+1 under a global frequency order must intersect).
- SimHash banding is exact by pigeonhole: hamming ≤ 3 over 4 disjoint bytes
  forces at least one identical byte.
- The IVF ANN probe uses a deterministic sign quantizer the oracle replicates
  verbatim, so restricted search results match exactly.

Cross-engine determinism notes (Spark vs DuckDB):
- shared 32-bit word hash = int(md5(s)[:8], 16): Spark
  ``conv(substring(md5(s),1,8),16,10)`` ≡ DuckDB ``('0x'||substr(md5(s),1,8))``.
- dot products fold left-to-right over doubles in both engines
  (``F.aggregate`` with 0.0 init ≡ DuckDB ``list_reduce``), so cosine scores
  are bit-identical.

Scale design: candidate generation is always a key-equality shuffle
(band/ngram/cell), never a cross join; verification touches candidate pairs
only.  At 1000 executors each stage is an ordinary hash shuffle on
high-cardinality keys.
"""

from __future__ import annotations

import random
from functools import reduce
from operator import add

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_sfc_spark.queries.registry import register
from lakehouse_sfc_spark.sources.loader import load_table, materialize_once

# --- shared text kernels ----------------------------------------------------

_NORM_WS = r"\s+"


def _tokens(c: Column) -> Column:
    """lower → collapse whitespace → trim → split on single space.
    Oracle twin: string_split(trim(regexp_replace(lower(x),'\\s+',' ','g')),' ')."""
    return F.split(F.trim(F.regexp_replace(F.lower(c), _NORM_WS, " ")), " ")


def _ngrams(w: Column, k: int) -> Column:
    """Distinct word k-grams via slice + zip_with (round 12).

    The old form indexed ``w`` per gram position (transform over sequence +
    element_at): LINEAR while ``w`` stays a materialized alias, but
    QUADRATIC the moment the optimizer inlines ``w``'s defining expression
    — each element_at then re-splits the raw text.  That inlining is not
    hypothetical: InferFiltersFromGenerate derives a ``size(ng) > 0``
    filter from any explode over the grams and pushes it below the
    projection barriers, which put the inlined quadratic form on the
    narrow pre-repartition side of the plan (measured: a bare
    explode-after-_docs_ngrams noop ran 19 s at sf0.1 vs 0.46 s once
    linear).  Here each of the k slices evaluates ``w`` once, so the worst
    inlined cost is k+1 splits per ROW, never per element.  Same values,
    same order, same distinct semantics; the when() guard keeps the
    slice length non-negative for short docs (branches evaluate lazily,
    as before)."""
    m = F.greatest(F.size(w) - (k - 1), F.lit(0))
    grams = F.slice(w, 1, m)
    for j in range(1, k):
        grams = F.zip_with(
            grams,
            F.slice(w, j + 1, m),
            lambda x, y: F.concat_ws(" ", x, y),
        )
    return F.array_distinct(
        F.when(F.size(w) >= k, grams).otherwise(F.array().cast("array<string>"))
    )


def _ngrams3(w: Column) -> Column:
    return _ngrams(w, 3)


def _h32(c: Column) -> Column:
    """Shared 32-bit hash: first 8 hex chars of md5, parsed base-16."""
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


_SQL_TOKENS = (
    "string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')"
)

_SQL_NGRAMS_VIEW = f"""
    SELECT doc_id, source,
           list_distinct(
             list_transform(range(1, len(w)-1),
                            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS ng
    FROM (SELECT doc_id, source, {_SQL_TOKENS} AS w FROM documents)
"""


#: Saturated-gram drop for the prefix-filter dedup family (CONTRACT-VISIBLE,
#: oracle-mirrored): n-grams occurring in more than _DF_CAP documents carry no
#: near-dup signal (they are the corpus's stopword-grams/boilerplate) and are
#: excluded from CANDIDATE GENERATION — verification still uses full gram
#: sets, so emitted Jaccard/containment values stay exact.  The contract is
#: "emit (A,B) iff sim ≥ τ AND the pair shares ≥1 gram with df ≤ _DF_CAP",
#: and filtering the rarest-first prefix index to df ≤ cap implements it
#: EXACTLY (proof in _prefix_candidates).  This bounds candidate volume at
#: Σ_{df≤cap} df² ≤ cap · |gram occurrences| — linear in corpus size — which
#: is the guard that keeps a 100 TB run alive when a hot gram bucket shows
#: up.  64 keeps every driver fixture lossless (max gram df: 7 at sf0.01,
#: 25 at sf0.1); production sizes it to the corpus (e.g. 1e4) — the point is
#: that it is a constant, which is what makes candidate volume linear.
_DF_CAP = 64


def _sql_pair_jaccard_cte(tau: float, rnum: int, rden: int, pair_cond: str) -> str:
    """Oracle CTE chain for the PREFIX-FILTER dedup family: candidate
    pairs share at least one NON-SATURATED gram (df ≤ _DF_CAP — the
    contract's mirrored saturated-gram drop; without it the e×e join's
    Σdf² pair volume made this oracle intractable at the fixed-vocab sf1
    fixture), then exact verification: ``ng`` is list_distinct, so the
    full |A∩B| is the SUM of the lo-join and hi-join per-pair counts
    (every shared gram lands in exactly one df class) — candidate pairs
    are exactly l0's rows, and no gram LIST is ever hauled through a pair
    join (a list_intersect verify measured 160 s at sf0.1 where all 1M
    candidate pairs survive the cap; the split count is seconds on both
    fixtures because hi is empty when nothing saturates and lo is tiny
    when everything does).  The length-ratio prefilter (J ≥ t ⇒ min·den ≥
    max·num) is applied on the exact lengths.  Every multi-referenced CTE
    is MATERIALIZED (DuckDB re-inlines per reference otherwise — the
    round-8 advisor_column_sets lesson).  Emits CTEs l/e/dfq/lo/hi/c/p;
    expects ``g`` bound to _SQL_NGRAMS_VIEW."""
    return f"""
    l AS MATERIALIZED (SELECT doc_id, len(ng) AS l FROM g),
    e AS MATERIALIZED (SELECT doc_id, unnest(ng) AS gr FROM g),
    dfq AS MATERIALIZED (SELECT gr, COUNT(*) AS df FROM e GROUP BY gr),
    lo AS MATERIALIZED (
      SELECT e.doc_id, e.gr FROM e JOIN dfq ON e.gr = dfq.gr
      WHERE dfq.df <= {_DF_CAP}
    ),
    hi AS MATERIALIZED (
      SELECT e.doc_id, e.gr FROM e JOIN dfq ON e.gr = dfq.gr
      WHERE dfq.df > {_DF_CAP}
    ),
    c AS MATERIALIZED (
      SELECT l0.a_id, l0.b_id, l0.s + COALESCE(h0.s, 0) AS shared
      FROM (SELECT x.doc_id AS a_id, y.doc_id AS b_id, COUNT(*) AS s
            FROM lo x JOIN lo y ON x.gr = y.gr AND {pair_cond}
            GROUP BY 1, 2) l0
      LEFT JOIN (SELECT x.doc_id AS a_id, y.doc_id AS b_id, COUNT(*) AS s
                 FROM hi x JOIN hi y ON x.gr = y.gr AND {pair_cond}
                 GROUP BY 1, 2) h0
      USING (a_id, b_id)
    ),
    p AS (
      SELECT c.a_id, c.b_id,
             c.shared::DOUBLE / (la.l + lb.l - c.shared) AS jac_val
      FROM c JOIN l la ON c.a_id = la.doc_id
             JOIN l lb ON c.b_id = lb.doc_id
      WHERE {rden} * LEAST(la.l, lb.l) >= {rnum} * GREATEST(la.l, lb.l)
        AND c.shared::DOUBLE / (la.l + lb.l - c.shared) >= {tau}
    )"""


def _sql_lsh_pair_cte(tau: float, pair_cond: str) -> str:
    """Oracle CTE chain for the MINHASH-LSH dedup family: mirrors the
    Spark side's banded candidate generation EXACTLY — 64 affine-permuted
    min-hashes per doc, 16 bands of 4 rows serialized to the same
    comma-joined signature string, candidates from band-bucket equality,
    then exact Jaccard verification on the full gram lists.  This replaces
    the earlier exhaustive-pair oracle, which (a) asserted LSH recall is
    perfect — true on these fixtures but only probabilistically true in
    general — and (b) was intractable at the fixed-vocab sf1 fixture
    (Σdf² pair volume in the e×e join).  The band mirror is both honest
    (the contract IS "pairs the banded index surfaces with J ≥ τ") and
    bounded (bucket-equality join volume).  Emits l/e/sig/bnd/cd/c/p;
    expects ``g`` bound to _SQL_NGRAMS_VIEW."""
    return f"""
    l AS MATERIALIZED (SELECT doc_id, len(ng) AS l FROM g),
    e AS MATERIALIZED (SELECT doc_id, unnest(ng) AS gr FROM g),
    sig AS MATERIALIZED ({_SQL_MH_SIG}),
    bnd AS MATERIALIZED (
      SELECT doc_id, j AS band,
             array_to_string(mh[j*{_MH_R}+1 : j*{_MH_R}+{_MH_R}], ',') AS bsig
      FROM sig, range(0, {_MH_BANDS}) t(j)
    ),
    cd AS MATERIALIZED (
      SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
      FROM bnd x JOIN bnd y
        ON x.band = y.band AND x.bsig = y.bsig AND {pair_cond}
    ),
    c AS MATERIALIZED (
      SELECT cd.a_id, cd.b_id,
             len(list_intersect(ga.ng, gb.ng)) AS shared
      FROM cd JOIN g ga ON cd.a_id = ga.doc_id
              JOIN g gb ON cd.b_id = gb.doc_id
    ),
    p AS (
      SELECT c.a_id, c.b_id,
             c.shared::DOUBLE / (la.l + lb.l - c.shared) AS jac_val
      FROM c JOIN l la ON c.a_id = la.doc_id
             JOIN l lb ON c.b_id = lb.doc_id
      WHERE c.shared::DOUBLE / (la.l + lb.l - c.shared) >= {tau}
    )"""


def _docs_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # The n-gram construction (transform over every token position +
    # array_distinct) is by far the heaviest per-row expression in the
    # dedup family, and a small-file scan (one row group) would evaluate
    # ALL of it on one core.  Two structural rules keep it parallel:
    # 1. The non-empty guard is expressed as the CHEAP equivalent
    #    precondition size(tokens) >= 3 (n-grams of >= 3 tokens are never
    #    empty) and applied BEFORE the exchange — a filter written as
    #    size(ng) > 0 would be predicate-pushed below the repartition and
    #    re-inline the entire n-gram expression on the narrow side.
    # 2. When the scan is narrower than the shuffle width, the (pruned,
    #    still-raw) text is exchanged so the heavy projection runs at full
    #    width.  At 100 TB the scan is already wide and this is a no-op.
    d = d.filter(F.size(_tokens(F.col("text"))) >= 3)
    from lakehouse_sfc_spark.sources.loader import compute_width

    width = compute_width(spark)
    if d.rdd.getNumPartitions() < width:
        d = d.repartition(width)
    # 3. The token array is materialized in its OWN projection: inlining
    #    _tokens into _ngrams3 makes codegen re-split the text per array
    #    element (O(tokens²) per doc — measured ~10x slower at sf0.1 on
    #    text_ngram_novelty).  CollapseProject keeps the split separate
    #    because the alias is referenced by non-cheap expressions.
    return d.select("doc_id", "source", _tokens(F.col("text")).alias("w")).select(
        "doc_id", "source", _ngrams3(F.col("w")).alias("ng")
    )


def _pair_jaccard() -> Column:
    inter = F.size(F.array_intersect(F.col("a.ng"), F.col("b.ng")))
    union = F.size(F.col("a.ng")) + F.size(F.col("b.ng")) - inter
    return inter.cast("double") / union


def _prefix_candidates(ngr: DataFrame, tau: float, symmetric: bool) -> DataFrame:
    """Prefix-filter candidate pairs for a set-overlap join at threshold
    ``tau`` with the CONTRACT-VISIBLE saturated-gram drop (_DF_CAP): order
    each doc's n-grams by GLOBAL document frequency (rarest first), index
    only the first |x|−⌈τ·|x|⌉+1 of them, drop index entries whose gram
    has df > _DF_CAP, and join the inverted index on gram equality.

    The prefix filter alone is lossless (a qualifying pair — Jaccard ≥ τ,
    or containment C(A,B) ≥ τ with A as the prefix side — must share a
    prefix gram); composed with the df cap it computes EXACTLY the capped
    contract "qualifying pairs sharing ≥1 gram with df ≤ _DF_CAP", which
    the oracles mirror.  Proof: if the pair shares gram g with df(g) ≤ cap
    and its guaranteed shared PREFIX gram h has df(h) > cap, then
    (df(g), g) < (df(h), h) in the sort order, so g precedes h and sits in
    both prefixes too — i.e. filtering the prefix index to df ≤ cap never
    loses a contract pair, and every emitted candidate shares its join
    gram (df ≤ cap) by construction.  Only rare n-grams fan out — what
    survives a 100 TB corpus where a plain ngram-explode join blows up on
    stopword-grams, and (with the cap) bounds candidate volume at
    cap · |occurrences| even when the whole gram space saturates.

    ``symmetric=True`` pairs prefix↔prefix with a_id < b_id (Jaccard-style
    joins); ``symmetric=False`` pairs prefix↔FULL index with a_id != b_id
    (asymmetric containment, where only the A side may be pruned — the
    first-shared-gram positional argument extends the proof there).
    Shared by dedup_ngram_jaccard / dedup_containment /
    sample_split_leakage — one implementation to fix, not three."""
    exploded = ngr.select("doc_id", F.explode("ng").alias("g")).repartition("g")
    dfreq = exploded.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    ranked = exploded.join(dfreq, "g").groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("df"), F.col("g")))
        ).alias("ordered"),
    )
    prefix_len = (
        F.size("ordered") - F.ceil(F.size("ordered") * F.lit(tau)) + 1
    ).cast("int")
    if symmetric:
        prefix = ranked.select(
            "doc_id",
            F.explode(F.slice(F.col("ordered"), 1, prefix_len)).alias("sg"),
        ).filter(F.col("sg.df") <= _DF_CAP).select(
            "doc_id", F.col("sg.g").alias("g")
        )
        return (
            prefix.alias("x")
            .join(
                prefix.alias("y"),
                on=[
                    F.col("x.g") == F.col("y.g"),
                    F.col("x.doc_id") < F.col("y.doc_id"),
                ],
            )
            .select(
                F.col("x.doc_id").alias("a_id"),
                F.col("y.doc_id").alias("b_id"),
            )
            .distinct()
        )
    # Asymmetric (containment) path: ppjoin-style positional + length
    # pruning.  Both sides keep their grams in the SAME global df order, so
    # for a qualifying pair's FIRST shared gram (A-position i, B-position
    # j, 0-based) every other shared gram sits at later positions on both
    # sides: shared <= min(|A|-i, |B|-j).  shared >= tau*|A| therefore
    # implies that row passes min(|A|-i, |B|-j) >= tau*|A|, so filtering
    # join ROWS by the bound (0.5 slack absorbs double rounding; shared is
    # an integer) never drops a qualifying PAIR.  The df <= _DF_CAP filter
    # on BOTH index sides is the contract's saturated-gram drop: if any
    # shared gram has df <= cap, the FIRST shared gram (minimal in the
    # common (df, g) order) does too, its rows survive both filters, and
    # the positional bound holds exactly at that row — so the join result
    # is precisely the capped contract, which the oracle mirrors.
    # posexplode positions are taken BEFORE the df filter, so i/j stay the
    # original full-order positions the bound needs.
    prefix = ranked.select(
        "doc_id",
        F.size("ordered").alias("alen"),
        F.posexplode(F.slice(F.col("ordered"), 1, prefix_len)).alias(
            "i", "sg"
        ),
    ).filter(F.col("sg.df") <= _DF_CAP).select(
        "doc_id", "alen", "i", F.col("sg.g").alias("g")
    )
    index_full = ranked.select(
        "doc_id",
        F.size("ordered").alias("blen"),
        F.posexplode("ordered").alias("j", "sg"),
    ).filter(F.col("sg.df") <= _DF_CAP).select(
        "doc_id", "blen", "j", F.col("sg.g").alias("g")
    )
    need = F.col("x.alen") * F.lit(tau) - F.lit(0.5)
    return (
        prefix.alias("x")
        .join(
            index_full.alias("y"),
            on=[
                F.col("x.g") == F.col("y.g"),
                F.col("x.doc_id") != F.col("y.doc_id"),
                F.col("y.blen") >= need,
                F.least(
                    F.col("x.alen") - F.col("x.i"),
                    F.col("y.blen") - F.col("y.j"),
                )
                >= need,
            ],
        )
        .select(
            F.col("x.doc_id").alias("a_id"), F.col("y.doc_id").alias("b_id")
        )
        .distinct()
    )


def _hashed_jaccard_survivors(
    ngr: DataFrame, cand: DataFrame, tau: float
) -> DataFrame:
    """Phase 1 of the two-phase verify for SYMMETRIC Jaccard joins (the
    sibling of dedup_containment's asymmetric version): candidate pairs
    would otherwise haul two multi-KB string-gram arrays through the
    verify join, so memory traffic — not the intersect — dominates.  This
    filters on the 64-bit xxhash64 gram arrays instead (``hg``, ~4×
    smaller rows, long compares), using Jaccard ≥ τ ⟺
    I ≥ τ·(|A|+|B|)/(1+τ) with 4 grams of slack: within-doc hash
    collisions can only shrink the hashed intersect by the collision
    count (~0 at 2⁻⁶⁴), and cross-doc collisions only ADD candidates — no
    qualifying pair is ever dropped.  Callers re-verify survivors on the
    exact string grams, so the emitted Jaccard is exact and the oracle
    needs no mirror.  ``ngr`` must carry ``hg`` =
    array_distinct(transform(ng, xxhash64))."""
    ha = ngr.select(
        F.col("doc_id").alias("a_id"),
        F.col("hg").alias("ha"),
        F.size("ng").alias("alen"),
    )
    hb = ngr.select(
        F.col("doc_id").alias("b_id"),
        F.col("hg").alias("hb"),
        F.size("ng").alias("blen"),
    )
    return (
        cand.join(ha, "a_id")
        .join(hb, "b_id")
        .filter(
            F.size(F.array_intersect("ha", "hb"))
            >= (F.col("alen") + F.col("blen")) * F.lit(tau / (1.0 + tau))
            - F.lit(4.0)
        )
        .select("a_id", "b_id")
    )


def _mh_signatures(ngr, barrier: bool = True):
    """MinHash(64) signature relation (doc_id, mh: array<long>) folded in
    one aggregate pass — each n-gram is md5-hashed exactly once, the 64
    affine permutations are integer maps inside a single traversal.  The
    repartition is a deliberate projection barrier (see dedup_minhash_lsh);
    callers that place their own barrier (a localCheckpoint) pass
    ``barrier=False`` and save the shuffle."""
    coef = F.array(
        *[
            F.struct(
                F.lit(a).cast("long").alias("a"), F.lit(b).cast("long").alias("b")
            )
            for a, b in _MH_COEF
        ]
    )
    mh_expr = F.aggregate(
        F.transform(F.col("ng"), lambda g: _h32(g) % F.lit(_MH_P)),
        F.array_repeat(F.lit(_MH_P).cast("long"), _MH_K),
        lambda acc, h: F.zip_with(
            acc, coef, lambda m, c: F.least(m, (h * c["a"] + c["b"]) % F.lit(_MH_P))
        ),
    )
    out = ngr.select("doc_id", mh_expr.alias("mh"))
    return out.repartition("doc_id") if barrier else out


def _mh_arrow_kernel(batches):
    """Arrow/NumPy twin of the JVM signature fold (guide §4.2): Spark's
    higher-order-function lambdas run INTERPRETED (no codegen), so the
    |ngrams| x 64 integer fold costs ~100 ns/op in the JVM expression
    interpreter; here it is 64 vectorized NumPy passes over the batch's
    flat gram-hash buffer + one segment-min (``np.minimum.reduceat``).
    Pure int64 arithmetic — (h*a+b) % p on non-negative operands < 2^62 —
    so the output is BIT-IDENTICAL to the JVM fold (asserted in
    tests/test_dedup_minhash_kernel.py).  Precondition: every ``hg`` list
    is non-empty (``_docs_ngrams`` filters to >= 3 tokens) and non-null;
    reduceat's empty-segment quirk never applies."""
    import numpy as np
    import pyarrow as pa

    A = np.array([a for a, _ in _MH_COEF], dtype=np.int64)
    B = np.array([b for _, b in _MH_COEF], dtype=np.int64)
    K = len(_MH_COEF)
    for rb in batches:
        doc_id = rb.column("doc_id")
        hg = rb.column("hg")
        offs = hg.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        # .values ignores any slice offset: offsets index the FULL buffer,
        # so reduceat stays correct — but truncate past the last list's end
        # or the final segment would swallow trailing sibling data.
        flat = hg.values.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = flat[: offs[-1]]
        n = len(rb)
        if n == 0 or len(flat) == 0:
            out = np.empty((0, K), dtype=np.int64)
            n = 0
        else:
            starts = offs[:-1]
            # Fail loudly on an empty middle segment (reduceat would return
            # the next segment's first element — silent corruption;
            # ADVICE r12).  _docs_ngrams guarantees non-empty lists.
            if not (np.diff(offs) > 0).all():
                raise ValueError("empty hg segment: precondition violated")
            out = np.empty((n, K), dtype=np.int64)
            for i in range(K):
                out[:, i] = np.minimum.reduceat((flat * A[i] + B[i]) % _MH_P, starts)
        mh = pa.ListArray.from_arrays(
            pa.array(np.arange(n + 1, dtype=np.int32) * K),
            pa.array(out.ravel(), type=pa.int64()),
        )
        yield pa.RecordBatch.from_arrays([doc_id[:n], mh], names=["doc_id", "mh"])


def _mh_signatures_arrow(ngr):
    """MinHash(64) signatures via the vectorized kernel: the base gram hash
    (one md5 per n-gram) stays in the JVM, only (doc_id, hg) crosses the
    Arrow boundary (columns the kernel needs and nothing else — guide
    §4.1), and the 64 affine permutations + min run in NumPy.  Same
    (doc_id, mh) relation as ``_mh_signatures``, bit-identical."""
    hg = ngr.select(
        "doc_id",
        F.transform(F.col("ng"), lambda g: _h32(g) % F.lit(_MH_P)).alias("hg"),
    )
    return hg.mapInArrow(_mh_arrow_kernel, "doc_id long, mh array<long>")


# --- vectorized double-fold kernels (r12 verdict task 2) ---------------------
#
# _dot/_l2 are interpreted HOF folds (CodegenFallback) — the same per-element
# interpreter tax the minhash fold paid, but over doubles.  The NumPy twins
# below replicate the JVM fold BIT-IDENTICALLY: each product / squared
# difference is one IEEE-754 binary64 op (identical in NumPy and the JVM),
# and the per-row accumulation starts from 0.0 and adds terms strictly
# left-to-right (a vectorized add per array position — never np.sum /
# np.add.reduce, whose pairwise summation reassociates).  Pinned against the
# JVM expressions in tests/test_vec_kernels.py.


def _list_np(col):
    """(absolute int64 offsets, full float64 values buffer) of an Arrow list
    column.  ``.values`` ignores any record-batch slice offset, so the
    offsets index the FULL buffer — callers must index with the absolute
    offsets (the ``_mh_arrow_kernel`` discipline)."""
    import numpy as np

    offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    vals = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
    return offs, vals


def _rows_matrix(col, width=None):
    """Arrow list column -> (n, width) float64 matrix.  Raises if any row's
    width differs (precondition violation must fail loudly, never corrupt —
    ADVICE r12); embeddings are fixed-dimension by construction."""
    import numpy as np

    offs, vals = _list_np(col)
    w = np.diff(offs)
    if len(w) == 0:
        return np.empty((0, width or 0), dtype=np.float64)
    if w.min() != w.max():
        raise ValueError(f"ragged vector widths {w.min()}..{w.max()}")
    d = int(w[0])
    if width is not None and d != width:
        raise ValueError(f"vector width {d} != expected {width}")
    idx = offs[:-1, None] + np.arange(d)
    return vals[idx]


def _seq_pair_rowsum(acol, bcol, kind):
    """Per-row ``fold(0.0, op(a_j, b_j), +)`` over two Arrow list columns,
    accumulated left-to-right — bit-identical to the JVM
    ``F.aggregate(F.zip_with(a, b, op), 0.0, acc + x)`` (_dot / _l2).
    kind: 'dot' -> a*b, 'l2' -> (a-b)*(a-b).

    Rows may have mixed widths (each width group is one vectorized matrix
    pass), but the two lists of a PAIR must match: zip_with would null-pad
    a mismatch into a silent NULL score, so this fails loudly instead
    (ADVICE r12 discipline)."""
    import numpy as np

    ao, av = _list_np(acol)
    bo, bv = _list_np(bcol)
    wa, wb = np.diff(ao), np.diff(bo)
    if len(wa) != len(wb):
        raise ValueError("row count mismatch")
    if not np.array_equal(wa, wb):
        raise ValueError("paired vector widths differ")
    out = np.zeros(len(wa), dtype=np.float64)
    for w in np.unique(wa):
        if w == 0:
            continue  # fold over an empty array is the 0.0 init
        rows = np.nonzero(wa == w)[0]
        A = av[ao[:-1][rows, None] + np.arange(w)]
        B = bv[bo[:-1][rows, None] + np.arange(w)]
        P = A * B if kind == "dot" else (A - B) * (A - B)
        acc = np.zeros(len(rows), dtype=np.float64)
        for j in range(int(w)):
            acc = acc + P[:, j]
        out[rows] = acc
    return out


def _cosv_pair_kernel(batches):
    """(a_id, b_id, emb, nrm, qemb, qnrm) -> (a_id, b_id, cosv): the cosine
    fold of dedup_embedding_topk as one vectorized pass.  Doubles as the
    filter-pushdown barrier: Catalyst substituted the interpreted fold into
    BOTH the tau filter and the scoring projection (guide §4.4's
    double-evaluation trap); an opaque map node is evaluated exactly once."""
    import numpy as np
    import pyarrow as pa

    for rb in batches:
        if len(rb) == 0:
            continue
        dot = _seq_pair_rowsum(rb.column("emb"), rb.column("qemb"), "dot")
        nrm = rb.column("nrm").to_numpy(zero_copy_only=False)
        qnrm = rb.column("qnrm").to_numpy(zero_copy_only=False)
        cosv = dot / (nrm * qnrm)
        yield pa.RecordBatch.from_arrays(
            [rb.column("a_id"), rb.column("b_id"), pa.array(cosv, pa.float64())],
            names=["a_id", "b_id", "cosv"],
        )


def _nearest_centroid_kernel(cent_by_key, emit_dist=False):
    """Kernel factory for the k-means/PQ ASSIGNMENT pass: every input row's
    vector is scored against a driver-collected codebook and the nearest
    centroid id (ties -> lowest cid, exactly ``min_by(cid, struct(d, cid))``)
    is appended as ``cid`` (+ ``dist`` when emit_dist).  All input columns
    pass through unchanged.

    ``cent_by_key``: {subspace key -> (cids sorted ascending, (K, d) centroid
    matrix)}; key None means un-subspaced (the input has no ``s`` column).
    Distances accumulate (x-y)*(x-y) left-to-right per pair — bit-identical
    to the JVM ``_l2`` fold — and np.argmin's first-minimum rule on
    ascending cids reproduces the struct tie-break.  Distances are sums of
    squares, so -0.0 never occurs and double ordering is total (no NaN:
    _emb excludes NULL/zero-norm/NaN vectors).

    This is the documented production shape (collect the tiny codebook once,
    inline the argmin) — it replaces a K-way broadcast-join row explosion
    plus a groupBy(vec_id) exchange with one map pass (guide §2.4/§4.2)."""
    import numpy as np
    import pyarrow as pa

    def kernel(batches):
        for rb in batches:
            n = len(rb)
            if n == 0:
                continue
            E = _rows_matrix(rb.column("e" if "e" in rb.schema.names else "emb"))
            keys = (
                rb.column("s").to_numpy(zero_copy_only=False)
                if "s" in rb.schema.names
                else None
            )
            best_cid = np.empty(n, dtype=np.int64)
            best_d = np.empty(n, dtype=np.float64)
            groups = (
                [(None, np.arange(n))]
                if keys is None
                else [(k, np.nonzero(keys == k)[0]) for k in np.unique(keys)]
            )
            for key, rows in groups:
                cids, C = cent_by_key[key]
                sub = E[rows]
                if sub.shape[1] != C.shape[1]:
                    raise ValueError(
                        f"vector width {sub.shape[1]} != codebook {C.shape[1]}"
                    )
                D = np.zeros((len(rows), len(cids)), dtype=np.float64)
                for j in range(C.shape[1]):
                    diff = sub[:, j, None] - C[None, :, j]
                    D = D + diff * diff
                b = D.argmin(axis=1)
                best_cid[rows] = cids[b]
                best_d[rows] = D[np.arange(len(rows)), b]
            arrays = list(rb.columns) + [pa.array(best_cid, pa.int64())]
            names = list(rb.schema.names) + ["cid"]
            if emit_dist:
                arrays.append(pa.array(best_d, pa.float64()))
                names.append("dist")
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    return kernel


def _collect_codebook(rows, key_attr, cid_attr, vec_attr):
    """Driver-collected centroid rows -> {key: (cids ascending, matrix)} for
    ``_nearest_centroid_kernel``.  Doubles survive collect() exactly (binary
    pickle framing, no text round-trip)."""
    import numpy as np

    by_key: dict = {}
    for r in rows:
        key = getattr(r, key_attr) if key_attr else None
        by_key.setdefault(key, []).append(
            (getattr(r, cid_attr), getattr(r, vec_attr))
        )
    out = {}
    for key, pairs in by_key.items():
        pairs.sort(key=lambda p: p[0])
        out[key] = (
            np.array([p[0] for p in pairs], dtype=np.int64),
            np.array([p[1] for p in pairs], dtype=np.float64),
        )
    return out


def _py_l2(a, b):
    """Driver-side twin of the _l2 fold (Python floats ARE IEEE binary64;
    same ops, same order ⇒ same bits)."""
    acc = 0.0
    for x, y in zip(a, b):
        d = x - y
        acc = acc + d * d
    return acc


def _band_explode(mh):
    """(doc_id, mh) -> 16 banded (doc_id, band, sig) rows.  ``mh`` must sit
    behind a projection barrier (repartition or localCheckpoint) or
    CollapseProject inlines the signature fold into each of the 16 slices."""
    return mh.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        F.concat_ws(
                            ",", F.slice(F.col("mh"), j * _MH_R + 1, _MH_R)
                        ).alias("sig"),
                    )
                    for j in range(_MH_BANDS)
                ]
            )
        ).alias("bs"),
    ).select("doc_id", "bs.band", "bs.sig")


def _mh_bands(ngr):
    """MinHash signatures exploded into 16 banded (doc_id, band, sig) rows —
    the shared candidate-generation front end of the LSH family (see
    dedup_minhash_lsh for the full cost discipline notes)."""
    return _band_explode(_mh_signatures(ngr))


# --- D1: exact dedup --------------------------------------------------------


@register(
    "dedup_exact",
    oracle="""
    SELECT COUNT(*) AS total_docs,
           COUNT(DISTINCT md5(text)) AS distinct_texts,
           COUNT(*) - COUNT(DISTINCT md5(text)) AS dup_docs
    FROM documents
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup accounting: group on md5(text) instead of the full text so
    the shuffle carries 32-byte keys, not document bodies — the difference
    between a re-shuffle of 100 TB and of ~3 GB at pipeline scale."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(F.md5(F.col("text")).alias("h")).agg(
        F.count(F.lit(1)).alias("total_docs"),
        F.count_distinct(F.col("h")).alias("distinct_texts"),
        (F.count(F.lit(1)) - F.count_distinct(F.col("h"))).alias("dup_docs"),
    )


# --- D2: MinHash + LSH near-dedup ------------------------------------------

_MH_K = 64  # minhash functions
_MH_BANDS = 16  # bands of r = 4 rows
_MH_R = 4
_MH_TAU = 0.7
_MH_P = 2_147_483_647  # Mersenne prime 2^31-1: a*h+b stays < 2^62 (no overflow)

# Fixed affine permutations h_i(x) = (a_i*x + b_i) mod p over the shared
# 32-bit base hash.  Seeded once at import => deterministic across runs.
_MH_RNG = random.Random(0x5FC2024)
_MH_COEF = [
    (_MH_RNG.randrange(1, _MH_P), _MH_RNG.randrange(0, _MH_P))
    for _ in range(_MH_K)
]

_SQL_MH_SIG = (
    "SELECT doc_id, ["
    + ", ".join(f"MIN(({a} * h + {b}) % {_MH_P})" for a, b in _MH_COEF)
    + f"] AS mh FROM (SELECT doc_id,"
    f" ('0x' || substr(md5(gr), 1, 8))::BIGINT % {_MH_P} AS h FROM e)"
    " GROUP BY doc_id"
)


@register(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH g AS MATERIALIZED ({_SQL_NGRAMS_VIEW}),
    {_sql_lsh_pair_cte(_MH_TAU, "x.doc_id < y.doc_id")}
    SELECT a_id, b_id, round(jac_val, 4) AS jac FROM p
    """,
    headline=True,  # r11 verdict task 3: dedup family under the bench gate
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64) → 16 bands × 4 rows → bucket self-join → exact-Jaccard
    verification at τ=0.7.  All candidate generation is a key-equality join on
    (band, signature) — no cross join at any scale.  Verification re-joins the
    small candidate-pair set against the n-gram relation, so document bodies
    are shuffled once, not once per band.

    Cost discipline (the part that matters at 100 TB): each n-gram is
    md5-hashed exactly ONCE; the 64 permutations are affine maps
    ``(a_i*h + b_i) mod p`` folded in a single ``F.aggregate`` pass, so the
    signature is O(|ngrams| * K) integer ops, not K md5 passes.  The n-gram
    relation and the signature relation are each materialized ONCE per run
    via ``localCheckpoint(eager=False)``: the band self-join and the two
    verify joins otherwise re-derive the tokenize + n-gram + 64-permutation
    subtree per side (4 scans / 4 tokenizations / 2 signature folds in the
    static plan — exchange reuse cannot dedup a broadcast side against a
    shuffle side).  The checkpoint doubles as the projection barrier that
    keeps CollapseProject from inlining the signature fold into each of the
    16 band slices (16x the work), so the intra-signature ``repartition``
    barrier is skipped (``barrier=False``) — one less shuffle.  Measured at
    sf0.1/local[32], noop sink: 2.63 s -> 1.76 s median, byte-identical
    output (guide §2.4 remove shuffles, §1.4 noop measurement)."""
    ngr = materialize_once(_docs_ngrams(spark, sf_dir))
    mh = materialize_once(_mh_signatures_arrow(ngr))
    bands = _band_explode(mh)


    cand = (
        bands.alias("x")
        .join(
            bands.alias("y"),
            on=[
                F.col("x.band") == F.col("y.band"),
                F.col("x.sig") == F.col("y.sig"),
                F.col("x.doc_id") < F.col("y.doc_id"),
            ],
        )
        .select(F.col("x.doc_id").alias("a_id"), F.col("y.doc_id").alias("b_id"))
        .distinct()
    )

    jac = _pair_jaccard()
    return (
        cand.join(ngr.alias("a"), F.col("a_id") == F.col("a.doc_id"))
        .join(ngr.alias("b"), F.col("b_id") == F.col("b.doc_id"))
        .filter(jac >= _MH_TAU)
        .select("a_id", "b_id", F.round(jac, 4).alias("jac"))
    )


@register(
    "dedup_minhash_estimate_error",
    oracle=f"""
    WITH g AS MATERIALIZED ({_SQL_NGRAMS_VIEW}),
    {_sql_pair_jaccard_cte(_MH_TAU, 7, 10, "x.doc_id < y.doc_id")},
    sig AS MATERIALIZED ({_SQL_MH_SIG}),
    err AS (
      SELECT p.jac_val AS jac,
             len(list_filter(range(1, {_MH_K} + 1),
                             i -> sa.mh[i] = sb.mh[i]))::BIGINT AS matches
      FROM p JOIN sig sa ON p.a_id = sa.doc_id
             JOIN sig sb ON p.b_id = sb.doc_id
    )
    SELECT CAST(FLOOR(ABS(matches / {_MH_K}.0 - jac) * 20) AS BIGINT)
             AS err_bucket,
           COUNT(*) AS n_pairs,
           CAST(MIN(matches) AS BIGINT) AS min_matches,
           CAST(MAX(matches) AS BIGINT) AS max_matches
    FROM err GROUP BY 1 ORDER BY 1
    """,
)
def dedup_minhash_estimate_error(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ESTIMATOR CALIBRATION for the MinHash sketch — the eval a pipeline
    must run before trusting LSH parameters on a new corpus: over every
    TRUE near-dup pair (exact Jaccard ≥ τ), compare the 64-permutation
    MinHash estimate (matching signature positions / 64) against the exact
    Jaccard, histogrammed by absolute error in 0.05 buckets.  A fat
    high-error tail means the band/row configuration is mis-sized for the
    corpus's similarity profile (the r=4, b=16 S-curve assumes errors
    concentrate near 0).  Both engines compute the same integer minima and
    the same two divisions, so buckets are bit-deterministic — no
    round()/tie behavior anywhere.

    Scale shape: true pairs come from the capped prefix-filter (saturated-
    gram drop, oracle-mirrored) + two-phase hashed verify (candidate-
    bounded, never all-pairs); signatures are one aggregate pass over the
    exploded grams; the error join touches pair rows only."""
    ngr = (
        _docs_ngrams(spark, sf_dir)
        .withColumn(
            "hg", F.array_distinct(F.transform("ng", lambda g: F.xxhash64(g)))
        )
        .repartition("doc_id")
        .localCheckpoint(eager=False)
    )
    cand = _prefix_candidates(ngr, _MH_TAU, symmetric=True)
    surv = _hashed_jaccard_survivors(ngr, cand, _MH_TAU)
    inter = F.size(F.array_intersect(F.col("a.ng"), F.col("b.ng")))
    union = F.size(F.col("a.ng")) + F.size(F.col("b.ng")) - inter
    jac = inter.cast("double") / union
    pairs = (
        surv.join(ngr.alias("a"), F.col("a_id") == F.col("a.doc_id"))
        .join(ngr.alias("b"), F.col("b_id") == F.col("b.doc_id"))
        .filter(jac >= _MH_TAU)
        .select("a_id", "b_id", jac.alias("jac"))
    )
    sig = _mh_signatures_arrow(ngr)
    matches = F.size(
        F.filter(
            F.zip_with(F.col("sa.mh"), F.col("sb.mh"), lambda x, y: x == y),
            lambda v: v,
        )
    ).cast("bigint")
    err = (
        pairs.join(
            sig.alias("sa"), F.col("a_id") == F.col("sa.doc_id")
        )
        .join(sig.alias("sb"), F.col("b_id") == F.col("sb.doc_id"))
        .select("jac", matches.alias("matches"))
    )
    bucket = F.floor(
        F.abs(F.col("matches") / F.lit(float(_MH_K)) - F.col("jac")) * 20
    ).cast("bigint")
    return (
        err.groupBy(bucket.alias("err_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.min("matches").alias("min_matches"),
            F.max("matches").alias("max_matches"),
        )
        .orderBy("err_bucket")
    )


# --- D3: SimHash near-dedup (shard-local) ----------------------------------

_SH_BITS = 32
_SH_HD = 3  # max hamming distance; 4 bands make this exact by pigeonhole
_SH_BANDS = 4


def _simhash_arrow_kernel(batches):
    """Arrow/NumPy twin of ``_simhash`` (guide §4.2, same discipline as
    ``_mh_arrow_kernel``): the 32 per-bit majority votes are vectorized
    passes over the batch's flat word-hash buffer + ``np.add.reduceat``
    segment sums — the JVM form paid interpreted HOF dispatch per element
    per bit.  Pure integer arithmetic ⇒ bit-identical (pinned in
    tests/test_dedup_minhash_kernel.py).  Precondition: every ``hs`` list
    non-empty and non-null (callers filter size > 0)."""
    import numpy as np
    import pyarrow as pa

    for rb in batches:
        hs = rb.column("hs")
        offs = hs.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = hs.values.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = flat[: offs[-1]]
        n = len(rb)
        if n == 0 or len(flat) == 0:
            sim = np.empty(0, dtype=np.int64)
            n = 0
        else:
            starts = offs[:-1]
            lens = np.diff(offs)
            # reduceat returns the NEXT segment's first element for an
            # empty middle segment — corrupt, not wrong-by-one.  The
            # documented precondition (every list non-empty) must fail
            # loudly if a future caller violates it (ADVICE r12).
            if not (lens > 0).all():
                raise ValueError("empty hs segment: precondition violated")
            sim = np.zeros(n, dtype=np.int64)
            for b in range(_SH_BITS):
                ones = np.add.reduceat((flat >> b) & 1, starts)
                sim |= (2 * ones > lens).astype(np.int64) << b
        yield pa.RecordBatch.from_arrays(
            [rb.column("doc_id")[:n], rb.column("source")[:n], pa.array(sim)],
            names=["doc_id", "source", "sim"],
        )


def _simhash_relation(d: DataFrame) -> DataFrame:
    """(documents df) -> (doc_id, source, sim): distinct-token 32-bit hashes
    in the JVM (md5 stays native), majority-vote simhash in the vectorized
    kernel.  Shared by dedup_simhash and dedup_saturation_stats."""
    words = d.select(
        "doc_id",
        "source",
        F.transform(
            F.array_distinct(_tokens(F.col("text"))), lambda x: _h32(x)
        ).alias("hs"),
    ).filter(F.size("hs") > 0)
    return words.mapInArrow(
        _simhash_arrow_kernel, "doc_id long, source string, sim long"
    )


def _simhash(hs: Column) -> Column:
    """32-bit simhash: bit b set iff a strict majority of word hashes have
    bit b set.  Built from 32 unrolled literal-shift terms so everything stays
    in codegen (shiftleft/shiftright need literal shift amounts)."""

    def bit_term(b: int) -> Column:
        ones = F.size(
            F.filter(
                hs, lambda h: F.shiftright(h, b).bitwiseAND(F.lit(1)) == F.lit(1)
            )
        )
        return F.when(ones * 2 > F.size(hs), F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )

    return reduce(add, [bit_term(b) for b in range(_SH_BITS)])


_SQL_SIMHASH_VIEW = f"""
    SELECT doc_id, source,
           list_sum(list_transform(range(0, {_SH_BITS}),
             b -> CASE WHEN len(list_filter(hs, h -> (h >> b) & 1 = 1)) * 2
                            > len(hs)
                       THEN (1::BIGINT << b) ELSE 0 END))::BIGINT AS sim
    FROM (SELECT doc_id, source,
                 list_transform(list_distinct({_SQL_TOKENS}),
                                x -> ('0x' || substr(md5(x), 1, 8))::BIGINT) AS hs
          FROM documents WHERE text IS NOT NULL)
"""
# ^ text IS NOT NULL is load-bearing: a NULL token list makes every CASE
# condition NULL, which takes the ELSE 0 branch, so NULL docs would all
# collapse to sim=0 and pair with each other (caught by the adversarial
# fixture; the Spark side drops them via its size(hs) > 0 filter).


#: Saturated band-bucket drop (contract-visible, oracle-mirrored): a
#: (source, band, byte-value) bucket holding more than this many documents
#: is skipped during candidate generation.  Occupancy of a healthy simhash
#: band bucket is ~n/256 per shard; a bucket far above that is a degenerate
#: pile (boilerplate shard, all-identical template) whose occ² pair volume
#: is exactly what kills the band join at 100 TB — production drops or
#: sub-splits it.  256 keeps every driver fixture lossless (max occupancy:
#: 20 at sf0.01, 172 at sf0.1) and bounds the sf1 fixed-vocab fixture's
#: pair volume 94.7M → 7.9M (measured).
_SH_BUCKET_CAP = 256


@register(
    "dedup_saturation_stats",
    oracle=f"""
    WITH g AS MATERIALIZED ({_SQL_NGRAMS_VIEW}),
    e AS MATERIALIZED (SELECT doc_id, unnest(ng) AS gr FROM g),
    dfq AS MATERIALIZED (SELECT gr, COUNT(*) AS df FROM e GROUP BY gr),
    perdoc AS (
      SELECT e.doc_id,
             COUNT(*) FILTER (WHERE dfq.df <= {_DF_CAP}) AS n_rare
      FROM e JOIN dfq ON e.gr = dfq.gr GROUP BY e.doc_id
    ),
    sh AS MATERIALIZED ({_SQL_SIMHASH_VIEW}),
    b AS (SELECT doc_id, source, j AS band, (sim >> (8 * j)) & 255 AS bv
          FROM sh, range(0, {_SH_BANDS}) t(j)),
    occ AS (SELECT source, band, bv, COUNT(*) AS n FROM b GROUP BY 1, 2, 3)
    SELECT
      (SELECT COUNT(*) FROM dfq) AS n_grams,
      (SELECT COUNT(*) FROM dfq WHERE df > {_DF_CAP}) AS n_saturated_grams,
      (SELECT CAST(COALESCE(SUM(df) FILTER (WHERE df > {_DF_CAP}), 0)
              AS DOUBLE) / SUM(df) FROM dfq) AS saturated_occurrence_share,
      (SELECT COUNT(*) FROM perdoc WHERE n_rare = 0) AS docs_without_rare_gram,
      (SELECT COUNT(*) FROM occ) AS n_simhash_buckets,
      (SELECT COUNT(*) FROM occ WHERE n > {_SH_BUCKET_CAP})
        AS n_saturated_buckets,
      (SELECT CAST(MAX(n) AS BIGINT) FROM occ) AS max_bucket_occupancy
    """,
)
def dedup_saturation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAP OBSERVABILITY — the audit a pipeline runs alongside the capped
    dedup family ("no silent caps"): how much of the corpus the
    saturated-gram drop (_DF_CAP) and the simhash bucket cap
    (_SH_BUCKET_CAP) actually exclude.  Reports the gram-df census
    (saturated gram count + their share of gram OCCURRENCES), the number
    of documents with NO sub-cap gram at all (those can only be deduped by
    the LSH/simhash/embedding families — the coverage-hole number a dedup
    report must disclose), and the simhash bucket census.  On the driver
    fixtures every saturation count is 0 — the same evidence the caps'
    losslessness claims rest on, now driver-hash-checked every round.

    Scale shape: two hash aggregations over the exploded gram relation
    (gram census + per-doc rare count), one over the banded simhash
    relation — all key-equality, output is a single row."""
    # ngr is checkpointed BEFORE the explode: InferFiltersFromGenerate
    # otherwise derives a size(ng) > 0 filter from the explode and pushes
    # the inlined n-gram expression to the narrow pre-repartition side of
    # the plan (single task, per-row re-derivation — guide §2.4/§7.2).
    ngr = materialize_once(_docs_ngrams(spark, sf_dir))
    e = ngr.select("doc_id", F.explode("ng").alias("gr")).repartition("gr")
    e = e.localCheckpoint(eager=False)  # census + per-doc both consume it
    dfq = e.groupBy("gr").agg(F.count(F.lit(1)).alias("df"))
    gram_stats = dfq.agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.count(F.when(F.col("df") > _DF_CAP, 1)).alias("n_saturated_grams"),
        (
            F.coalesce(
                F.sum(F.when(F.col("df") > _DF_CAP, F.col("df"))), F.lit(0)
            ).cast("double")
            / F.sum("df")
        ).alias("saturated_occurrence_share"),
    )
    no_rare = (
        e.join(dfq, "gr")
        .groupBy("doc_id")
        .agg(
            F.count(F.when(F.col("df") <= _DF_CAP, 1)).alias("n_rare")
        )
        .filter(F.col("n_rare") == 0)
        .agg(F.count(F.lit(1)).alias("docs_without_rare_gram"))
    )
    sh = _simhash_relation(load_table(spark, sf_dir, "documents"))
    bands = sh.select(
        "source",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        F.shiftright(F.col("sim"), 8 * j)
                        .bitwiseAND(F.lit(255))
                        .alias("bv"),
                    )
                    for j in range(_SH_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("source", "bb.band", "bb.bv")
    occ_stats = (
        bands.groupBy("source", "band", "bv")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.count(F.lit(1)).alias("n_simhash_buckets"),
            F.count(F.when(F.col("n") > _SH_BUCKET_CAP, 1)).alias(
                "n_saturated_buckets"
            ),
            F.max("n").cast("bigint").alias("max_bucket_occupancy"),
        )
    )
    return gram_stats.crossJoin(no_rare).crossJoin(occ_stats)


@register(
    "dedup_simhash",
    oracle=f"""
    WITH sh AS MATERIALIZED ({_SQL_SIMHASH_VIEW}),
    b AS MATERIALIZED (
      SELECT doc_id, source, sim, j AS band,
             (sim >> (8 * j)) & 255 AS bv
      FROM sh, range(0, {_SH_BANDS}) t(j)
    ),
    occ AS MATERIALIZED (
      SELECT source, band, bv, COUNT(*) AS n FROM b GROUP BY 1, 2, 3
    ),
    k AS MATERIALIZED (
      SELECT b.doc_id, b.source, b.sim, b.band, b.bv
      FROM b JOIN occ ON b.source = occ.source AND b.band = occ.band
                     AND b.bv = occ.bv
      WHERE occ.n <= {_SH_BUCKET_CAP}
    )
    SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id,
           bit_count(xor(x.sim, y.sim))::INTEGER AS hd
    FROM k x JOIN k y
      ON x.source = y.source AND x.band = y.band AND x.bv = y.bv
     AND x.doc_id < y.doc_id
    WHERE bit_count(xor(x.sim, y.sim)) <= {_SH_HD}
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-local (same ``source``) SimHash near-dedup at hamming ≤ 3.
    Candidates must share one of 4 disjoint 8-bit bands (pigeonhole ⇒
    exact recall among pairs whose shared band bucket survives the
    occupancy cap).  The shard restriction mirrors how web-scale dedup is
    run per ingest shard and keeps the candidate join keyed on
    (source, band, value).

    Scale guard (contract-visible, oracle-mirrored): buckets with more
    than _SH_BUCKET_CAP documents are dropped from candidate generation —
    see the constant's note.  The occupancy count rides the SAME hash
    partitioning the self-join needs (window count over the join key), so
    the cap adds no exchange."""
    # localCheckpoint: the band self-join below otherwise re-runs the
    # tokenize + kernel stage once per side (guide §2.4)
    sh = _simhash_relation(
        load_table(spark, sf_dir, "documents")
    ).localCheckpoint(eager=False)

    bands = sh.select(
        "doc_id",
        "source",
        "sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        F.shiftright(F.col("sim"), 8 * j)
                        .bitwiseAND(F.lit(255))
                        .alias("bv"),
                    )
                    for j in range(_SH_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "source", "sim", "bb.band", "bb.bv")
    occ = Window.partitionBy("source", "band", "bv")
    bands = bands.withColumn("occ", F.count(F.lit(1)).over(occ)).filter(
        F.col("occ") <= _SH_BUCKET_CAP
    ).drop("occ")

    hd = F.bit_count(F.col("x.sim").bitwiseXOR(F.col("y.sim")))
    return (
        bands.alias("x")
        .join(
            bands.alias("y"),
            on=[
                F.col("x.source") == F.col("y.source"),
                F.col("x.band") == F.col("y.band"),
                F.col("x.bv") == F.col("y.bv"),
                F.col("x.doc_id") < F.col("y.doc_id"),
            ],
        )
        .select(
            F.col("x.doc_id").alias("a_id"),
            F.col("y.doc_id").alias("b_id"),
            hd.alias("hd"),
        )
        .distinct()
        .filter(F.col("hd") <= _SH_HD)
    )


# --- D4: n-gram Jaccard similarity join via prefix filtering ----------------

_NJ_TAU = 0.8


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH g AS MATERIALIZED ({_SQL_NGRAMS_VIEW}),
    {_sql_pair_jaccard_cte(_NJ_TAU, 4, 5, "x.doc_id < y.doc_id")}
    SELECT a_id, b_id, round(jac_val, 4) AS jac FROM p
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard join at τ=0.8 using prefix filtering with the saturated-gram
    drop (_DF_CAP, oracle-mirrored): order each doc's 3-grams by global
    document frequency (rarest first), index only the first |x|-⌈τ·|x|⌉+1
    of them with df ≤ _DF_CAP, and self-join the inverted index.  Emitted
    Jaccard values are exact (full-gram verification); the contract is
    "qualifying pairs sharing ≥1 non-saturated gram" — only rare n-grams
    fan out, which is what makes this survive a 100 TB corpus where a
    plain ngram-explode join would blow up on stopword-grams.

    Exchange discipline: the n-gram relation feeds FOUR consumers (document
    frequencies, the ranked index, and both verification sides), and the
    token relation two — without barriers each consumer would recompute the
    regex/3-gram pipeline from the scan.  ``localCheckpoint`` materializes
    the n-gram relation exactly once (ReuseExchange only dedupes identical
    sibling subtrees within one stage graph, not across all four consumer
    paths), and partitioning the exploded tokens by ``g`` means the
    frequency groupBy and the df-join consume it without re-shuffling.
    Materializing a 4×-consumed relation is the right call at 100 TB too —
    Spark has no automatic CTE materialization for DataFrames.

    Verification is two-phase (_hashed_jaccard_survivors): candidates are
    filtered on hashed gram arrays first, then the survivors — ≈ the true
    pairs — re-verify on the exact string grams."""
    ngr = (
        _docs_ngrams(spark, sf_dir)
        .withColumn(
            "hg", F.array_distinct(F.transform("ng", lambda g: F.xxhash64(g)))
        )
        .repartition("doc_id")
        .localCheckpoint(eager=False)
    )
    cand = _prefix_candidates(ngr, _NJ_TAU, symmetric=True)
    surv = _hashed_jaccard_survivors(ngr, cand, _NJ_TAU)
    jac = _pair_jaccard()
    return (
        surv.join(ngr.alias("a"), F.col("a_id") == F.col("a.doc_id"))
        .join(ngr.alias("b"), F.col("b_id") == F.col("b.doc_id"))
        .filter(jac >= _NJ_TAU)
        .select("a_id", "b_id", F.round(jac, 4).alias("jac"))
    )


# --- D5 / A1 / A2: embedding-space operators --------------------------------

_COS_TAU = 0.45
_ANN_K = 10
_ANN_QUERY_ID = 0
_IVF_DIMS = 8  # sign-quantizer bits


def _dot(a: Column, b: Column) -> Column:
    """Left-to-right double fold — bit-identical to DuckDB list_reduce.
    (An unrolled 64-term multiply-add chain was tried and is ~3× SLOWER:
    the giant expression tree breaks whole-stage codegen and loses the
    fold's single array traversal.)"""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


_SQL_DOT = (
    "list_reduce(list_transform(range(1, len({a})+1), i -> {a}[i] * {b}[i]),"
    " (p, q) -> p + q)"
)

# norms are precomputed per vector (O(n), not O(n²) — the higher-order-
# function dot is interpreted, so evaluating it once per PAIR instead of six
# times is the difference between seconds and minutes per million pairs)
_SQL_EMB_CTE = (
    "SELECT * FROM (SELECT vec_id, emb, sqrt("
    + _SQL_DOT.format(a="emb", b="emb")
    + ") AS nrm"
    " FROM (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings"
    "       WHERE embedding IS NOT NULL)) WHERE nrm > 0"
)


def _sql_cos(a: str, b: str) -> str:
    """Cosine from precomputed norms; {a}/{b} are CTE aliases with emb+nrm."""
    dot = _SQL_DOT.format(a=f"{a}.emb", b=f"{b}.emb")
    return f"({dot} / ({a}.nrm * {b}.nrm))"


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The VALID-vector relation every cosine operator builds on: NULL
    embeddings carry no signal and zero-norm vectors have no defined
    cosine (and divide by zero under ANSI), so both are excluded HERE —
    and identically in ``_SQL_EMB_CTE`` — rather than per query."""
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding").cast("array<double>")
    return (
        e.filter(F.col("embedding").isNotNull())
        .select("vec_id", emb.alias("emb"))
        .withColumn("nrm", F.sqrt(_dot(F.col("emb"), F.col("emb"))))
        .filter(F.col("nrm") > 0)
    )


_EMB_BLOCKS = 8  # B(B+1)/2 block-pair tasks; at scale pick B ≈ √(2·tasks)

# numpy's pairwise/SIMD summation can differ from the engines' left-to-right
# fold by ~1e-15 relative; candidates keep this much slack and the exact
# fold re-verification makes the final cut, so the margin only ever ADDS
# candidates (recall stays 100%), never changes a score.
_COS_MARGIN = 1e-6


def _cosine_block_kernel(key, pdf):
    """Score one block-pair with a vectorized gram matrix.  Diagonal blocks
    (bi == bj) take the strict upper triangle; off-diagonal blocks take the
    full cross product — each unordered pair lands in exactly one block-pair,
    so no dedup pass is needed downstream."""
    import numpy as np
    import pandas as pd

    bi, bj = int(key[0]), int(key[1])
    empty = pd.DataFrame({"a_id": pd.Series(dtype="int64"),
                          "b_id": pd.Series(dtype="int64")})
    lo = _COS_TAU - _COS_MARGIN
    if bi == bj:
        sub = pdf.sort_values("vec_id")
        n = len(sub)
        if n < 2:
            return empty
        m = np.stack(sub["emb"].to_numpy()) / sub["nrm"].to_numpy()[:, None]
        ids = sub["vec_id"].to_numpy()
        s = m @ m.T
        ii, jj = np.triu_indices(n, k=1)
        keep = s[ii, jj] >= lo
        return pd.DataFrame({"a_id": ids[ii[keep]], "b_id": ids[jj[keep]]})
    a = pdf[pdf["blk"] == bi]
    b = pdf[pdf["blk"] == bj]
    if len(a) == 0 or len(b) == 0:
        return empty
    ma = np.stack(a["emb"].to_numpy()) / a["nrm"].to_numpy()[:, None]
    mb = np.stack(b["emb"].to_numpy()) / b["nrm"].to_numpy()[:, None]
    ia = a["vec_id"].to_numpy()
    ib = b["vec_id"].to_numpy()
    s = ma @ mb.T
    ii, jj = np.nonzero(s >= lo)
    x, y = ia[ii], ib[jj]
    return pd.DataFrame({"a_id": np.minimum(x, y), "b_id": np.maximum(x, y)})


@register(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH c AS ({_SQL_EMB_CTE})
    SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           round({_sql_cos("a", "b")}, 6) AS score
    FROM c a JOIN c b ON a.vec_id < b.vec_id
    WHERE {_sql_cos("a", "b")} >= {_COS_TAU}
    """,
)
def dedup_embedding_cosine(
    spark: SparkSession, sf_dir: str, n_blocks: int = _EMB_BLOCKS
) -> DataFrame:
    """Embedding near-duplicate pairs at cosine ≥ 0.45, as a block-partitioned
    all-pairs scorer (the distributed brute-force shape: chunked
    matrix-multiply, the way exact similarity search actually scales out).

    Sign-quantizer/LSH blocking CANNOT be exact here: τ=0.45 admits pairs up
    to 63° apart, whose sign bits disagree arbitrarily (measured: 11 of 14
    qualifying sf0.01 pairs differ in >1 of 8 sign bits), so any
    sketch-blocked variant silently loses recall.  Instead each vector is
    assigned block ``vec_id mod B`` and replicated to the B block-pairs it
    participates in — a plain ``explode`` + hash shuffle on the (bi, bj) key,
    NO BroadcastNestedLoopJoin / CartesianProduct — and each of the
    B(B+1)/2 tasks scores its pair of chunks with one numpy gram matrix
    (Arrow-batched ``applyInPandas``).  Compute is inherently O(n²) — that is
    the operator's contract — but it distributes evenly across executors and
    per-task memory is bounded by two chunks, independent of n.

    Survivor pairs (a tiny, output-sized set) are re-scored JVM-side with the
    same left-to-right ``F.aggregate`` fold the oracle uses, so emitted
    scores are bit-identical to DuckDB's ``list_reduce`` and the numpy slack
    margin never leaks into results."""
    c = _emb(spark, sf_dir)
    b_lit = F.lit(n_blocks)
    v = c.withColumn("blk", F.pmod(F.col("vec_id"), b_lit).cast("int"))
    replicated = v.select(
        "vec_id",
        "emb",
        "nrm",
        "blk",
        F.explode(F.sequence(F.lit(0), b_lit - 1)).alias("other"),
    ).select(
        "vec_id",
        "emb",
        "nrm",
        "blk",
        F.least("blk", "other").alias("bi"),
        F.greatest("blk", "other").alias("bj"),
    )
    cand = replicated.groupBy("bi", "bj").applyInPandas(
        _cosine_block_kernel, schema="a_id long, b_id long"
    )
    ca = c.select(
        F.col("vec_id").alias("a_id"),
        F.col("emb").alias("a_emb"),
        F.col("nrm").alias("a_nrm"),
    )
    cb = c.select(
        F.col("vec_id").alias("b_id"),
        F.col("emb").alias("b_emb"),
        F.col("nrm").alias("b_nrm"),
    )
    cos = _dot(F.col("a_emb"), F.col("b_emb")) / (
        F.col("a_nrm") * F.col("b_nrm")
    )
    return (
        cand.join(ca, "a_id")
        .join(cb, "b_id")
        .select("a_id", "b_id", cos.alias("raw"))
        .filter(F.col("raw") >= _COS_TAU)
        .select("a_id", "b_id", F.round(F.col("raw"), 6).alias("score"))
    )


@register(
    "ann_bruteforce_topk",
    oracle=f"""
    WITH c AS ({_SQL_EMB_CTE}),
         q AS (SELECT emb, nrm FROM c WHERE vec_id = {_ANN_QUERY_ID})
    SELECT c.vec_id AS vec_id, round({_sql_cos("c", "q")}, 6) AS score
    FROM c, q
    WHERE c.vec_id != {_ANN_QUERY_ID}
    ORDER BY {_sql_cos("c", "q")} DESC, c.vec_id
    LIMIT {_ANN_K}
    """,
)
def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k for a fixed query vector (vec_id=0): broadcast
    the 1-row query side, score every vector JVM-side (norms precomputed per
    vector so the per-pair work is one dot product), TakeOrderedAndProject
    does the global top-k without a full sort."""
    c = _emb(spark, sf_dir)
    q = c.filter(F.col("vec_id") == _ANN_QUERY_ID).select(
        F.col("emb").alias("qemb"), F.col("nrm").alias("qnrm")
    )
    cos = _dot(F.col("emb"), F.col("qemb")) / (F.col("nrm") * F.col("qnrm"))
    return (
        c.filter(F.col("vec_id") != _ANN_QUERY_ID)
        .join(F.broadcast(q))
        .select("vec_id", cos.alias("c"))
        .orderBy(F.col("c").desc(), F.col("vec_id"))
        .limit(_ANN_K)
        .select("vec_id", F.round(F.col("c"), 6).alias("score"))
    )


@register(
    "ann_filtered_topk",
    oracle=f"""
    WITH c AS (SELECT e.vec_id, e.emb, e.nrm, m.label
               FROM ({_SQL_EMB_CTE}) e
               JOIN (SELECT vec_id, label FROM embeddings) m
                 ON e.vec_id = m.vec_id),
         q AS (SELECT emb, nrm FROM c WHERE vec_id = {_ANN_QUERY_ID})
    SELECT c.vec_id AS vec_id, c.label,
           round({_sql_cos("c", "q")}, 6) AS score
    FROM c, q
    WHERE c.vec_id != {_ANN_QUERY_ID} AND c.label = 1
    ORDER BY {_sql_cos("c", "q")} DESC, c.vec_id
    LIMIT {_ANN_K}
    """,
)
def ann_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED vector search (the hybrid-search shape every production
    vector store ships): top-k cosine neighbors of the query restricted to
    a metadata predicate (label = 1).  Pre-filtering is the only strategy
    that never under-returns: the predicate lands in the PARQUET SCAN
    (PushedFilters) BEFORE any scoring, so k survivors are guaranteed and
    the scored population shrinks by the filter's selectivity — versus
    post-filtering an unfiltered ANN shortlist, which returns < k whenever
    the filter is selective.  Exact-fold scoring + TakeOrderedAndProject,
    same determinism contract as ann_bruteforce_topk."""
    e = load_table(spark, sf_dir, "embeddings")
    c = (
        e.filter(F.col("embedding").isNotNull())
        .select(
            "vec_id",
            "label",
            F.col("embedding").cast("array<double>").alias("emb"),
        )
        .withColumn("nrm", F.sqrt(_dot(F.col("emb"), F.col("emb"))))
        .filter(F.col("nrm") > 0)  # same valid-vector population as _emb
    )
    q = c.filter(F.col("vec_id") == _ANN_QUERY_ID).select(
        F.col("emb").alias("qemb"), F.col("nrm").alias("qnrm")
    )
    cos = _dot(F.col("emb"), F.col("qemb")) / (F.col("nrm") * F.col("qnrm"))
    return (
        c.filter((F.col("vec_id") != _ANN_QUERY_ID) & (F.col("label") == 1))
        .join(F.broadcast(q))
        .select("vec_id", "label", cos.alias("c"))
        .orderBy(F.col("c").desc(), F.col("vec_id"))
        .limit(_ANN_K)
        .select("vec_id", "label", F.round(F.col("c"), 6).alias("score"))
    )


def _cell(emb: Column) -> Column:
    """Deterministic sign quantizer: bit j set iff emb[j] > 0 (first 8 dims).
    256 IVF cells; float > 0 compares are exact so both engines agree."""
    return reduce(
        add,
        [
            F.when(F.get(emb, j) > 0, F.lit(1 << j)).otherwise(F.lit(0))
            for j in range(_IVF_DIMS)
        ],
    ).cast("int")


_SQL_CELL = (
    "list_sum(list_transform(range(0, 8),"
    " j -> CASE WHEN {e}[j+1] > 0 THEN (1 << j) ELSE 0 END))::INTEGER"
)


@register(
    "ann_ivf_topk",
    oracle=f"""
    WITH c AS (SELECT vec_id, emb, nrm, {_SQL_CELL.format(e="emb")} AS cell
               FROM ({_SQL_EMB_CTE})),
         q AS (SELECT emb, nrm, cell FROM c WHERE vec_id = {_ANN_QUERY_ID})
    SELECT c.vec_id AS vec_id, round({_sql_cos("c", "q")}, 6) AS score
    FROM c, q
    WHERE c.vec_id != {_ANN_QUERY_ID}
      AND bit_count(xor(c.cell::BIGINT, q.cell::BIGINT)) <= 1
    ORDER BY {_sql_cos("c", "q")} DESC, c.vec_id
    LIMIT {_ANN_K}
    """,
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: partition vectors into 256 sign-quantizer cells, probe
    only the query's cell plus hamming-1 neighbors (9 of 256 cells ⇒ ~28× less
    scoring), exact top-k within the probed set.  At scale the table is
    written partitioned by cell so the probe is partition pruning, not a
    filter."""
    c = _emb(spark, sf_dir).withColumn("cell", _cell(F.col("emb")))
    q = c.filter(F.col("vec_id") == _ANN_QUERY_ID).select(
        F.col("emb").alias("qemb"),
        F.col("nrm").alias("qnrm"),
        F.col("cell").alias("qcell"),
    )
    cos = _dot(F.col("emb"), F.col("qemb")) / (F.col("nrm") * F.col("qnrm"))
    hd = F.bit_count(
        F.col("cell").cast("long").bitwiseXOR(F.col("qcell").cast("long"))
    )
    return (
        c.filter(F.col("vec_id") != _ANN_QUERY_ID)
        .join(F.broadcast(q))
        .filter(hd <= 1)
        .select("vec_id", cos.alias("c"))
        .orderBy(F.col("c").desc(), F.col("vec_id"))
        .limit(_ANN_K)
        .select("vec_id", F.round(F.col("c"), 6).alias("score"))
    )


@register(
    "ann_ivf_partitioned_topk",
    oracle=f"""
    WITH c AS (SELECT vec_id, emb, nrm, {_SQL_CELL.format(e="emb")} AS cell
               FROM ({_SQL_EMB_CTE})),
         q AS (SELECT emb, nrm, cell FROM c WHERE vec_id = {_ANN_QUERY_ID})
    SELECT c.vec_id AS vec_id, round({_sql_cos("c", "q")}, 6) AS score
    FROM c, q
    WHERE c.vec_id != {_ANN_QUERY_ID}
      AND bit_count(xor(c.cell::BIGINT, q.cell::BIGINT)) <= 1
    ORDER BY {_sql_cos("c", "q")} DESC, c.vec_id
    LIMIT {_ANN_K}
    """,
)
def ann_ivf_partitioned_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF probe as PHYSICAL partition pruning: embeddings are written
    once partitioned by sign-quantizer cell (hive-style ``cell=N/`` dirs,
    cached under .scratch), and the query reads ONLY the 9 probed
    partitions — `cell IN (...)` resolves at planning time against the
    directory listing, so the other ~247 cells are never opened.  Same
    result contract as ``ann_ivf_topk`` (which filters post-scan).

    Scale notes: this is the 100 TB layout for vector search — the probe
    cost is O(data in probed cells), not O(table); the write pays one
    shuffle on ``cell``.  ``tests/test_plan_quality.py`` asserts the final
    plan's PartitionFilters carry the cell predicate."""
    import os as _os

    from lakehouse_sfc_spark.queries.layouts import (
        _atomic_cache_write,
        _fingerprinted_dir,
    )

    repo = _os.path.dirname(_os.path.dirname(_os.path.dirname(__file__)))
    # fingerprint-keyed (stale same-basename siblings pruned): regenerated
    # datasets never hit a stale cell cache and old copies don't accumulate
    path = _fingerprinted_dir(
        _os.path.join(repo, ".scratch", "ivf_cells", "v1"),
        sf_dir,
        ("embeddings",),
    )
    if not _os.path.exists(_os.path.join(path, "_SUCCESS")):
        src = _emb(spark, sf_dir).withColumn("cell", _cell(F.col("emb")))
        _atomic_cache_write(
            src.repartition("cell")
            .write.mode("overwrite")
            .partitionBy("cell")
            .parquet,
            path,
        )
    c = spark.read.parquet(path)
    q = (
        _emb(spark, sf_dir)
        .withColumn("qcell", _cell(F.col("emb")))
        .filter(F.col("vec_id") == _ANN_QUERY_ID)
        .select("emb", "nrm", "qcell")
    )
    qrows = q.collect()  # 1-cell probe (or 0 if the query vector is invalid)
    if not qrows:
        # query vector absent / NULL / zero-norm: no probe cells, empty
        # top-k — same contract as the oracle's empty q CTE
        return spark.createDataFrame([], "vec_id bigint, score double")
    qcell = qrows[0]["qcell"]
    probe_cells = [qcell] + [qcell ^ (1 << j) for j in range(_IVF_DIMS)]
    # Round 13 (r12 verdict task 5): the query row was collected above, yet
    # the final plan ALSO carried it as a broadcast-join side — re-deriving
    # the source scan + norm fold a second time per run.  Inline the
    # already-collected values as literals instead: one less scan, one less
    # BroadcastExchange, same doubles (collect() round-trips them exactly).
    qemb_lit = F.array(*[F.lit(v) for v in qrows[0]["emb"]])
    cos = _dot(F.col("emb"), qemb_lit) / (
        F.col("nrm") * F.lit(qrows[0]["nrm"])
    )
    return (
        c.filter(F.col("cell").isin(probe_cells))
        .filter(F.col("vec_id") != _ANN_QUERY_ID)
        .select("vec_id", cos.alias("c"))
        .orderBy(F.col("c").desc(), F.col("vec_id"))
        .limit(_ANN_K)
        .select("vec_id", F.round(F.col("c"), 6).alias("score"))
    )


# --- IVF with a k-means coarse quantizer (paper-standard IVF) ---------------

# K scales with table size (the FAISS rule of thumb K ~ sqrt(n)), clamped to
# [8, 256]; computed identically in both engines from COUNT(*) — a
# metadata-only aggregate on parquet, not a second data scan.
_KM_K_SQL = "LEAST(256, GREATEST(8, CAST(CEIL(SQRT(COUNT(*))) AS INTEGER)))"
_KM_NPROBE = 2


def _l2(a: Column, b: Column) -> Column:
    """Squared L2, folded left-to-right — bit-identical to the SQL twin."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


_SQL_L2 = (
    "list_reduce(list_transform(range(1, len({a})+1),"
    " i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])), (p, q) -> p + q)"
)


@register(
    "ann_ivf_kmeans_topk",
    oracle=f"""
    WITH c AS ({_SQL_EMB_CTE}),
    k AS (SELECT {_KM_K_SQL} AS kk FROM c),
    seeds AS (SELECT vec_id AS cid, emb AS cemb FROM c, k
              WHERE vec_id < k.kk),
    a1 AS (
      SELECT vec_id, cid, emb FROM (
        SELECT c.vec_id, s.cid, c.emb,
               ROW_NUMBER() OVER (PARTITION BY c.vec_id
                 ORDER BY {_SQL_L2.format(a="c.emb", b="s.cemb")}, s.cid) AS rn
        FROM c, seeds s) t WHERE rn = 1),
    pd AS (
      SELECT cid, pos,
             CAST(SUM(CAST(x AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*) AS m
      FROM (SELECT cid, UNNEST(emb) AS x,
                   UNNEST(range(1, len(emb)+1)) AS pos FROM a1) u
      GROUP BY cid, pos),
    cent AS (SELECT cid, list(m ORDER BY pos) AS cemb FROM pd GROUP BY cid),
    a2 AS (
      SELECT vec_id, cid AS cell FROM (
        SELECT c.vec_id, t.cid,
               ROW_NUMBER() OVER (PARTITION BY c.vec_id
                 ORDER BY {_SQL_L2.format(a="c.emb", b="t.cemb")}, t.cid) AS rn
        FROM c, cent t) z WHERE rn = 1),
    q AS (SELECT emb, nrm FROM c WHERE vec_id = {_ANN_QUERY_ID}),
    qc AS (SELECT cid FROM (
        SELECT t.cid, ROW_NUMBER() OVER (
                 ORDER BY {_SQL_L2.format(a="q.emb", b="t.cemb")}, t.cid) AS rn
        FROM cent t, q) z WHERE rn <= {_KM_NPROBE})
    SELECT c.vec_id AS vec_id, round({_sql_cos("c", "q")}, 6) AS score
    FROM c
    JOIN a2 ON c.vec_id = a2.vec_id
    JOIN qc ON a2.cell = qc.cid, q
    WHERE c.vec_id != {_ANN_QUERY_ID}
    ORDER BY {_sql_cos("c", "q")} DESC, c.vec_id
    LIMIT {_ANN_K}
    """,
)
def ann_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paper-standard IVF: a k-means coarse quantizer (K = ceil(sqrt(n))
    cells clamped to [8, 256] — the FAISS sizing rule — seeded
    deterministically from the first K vectors, one exact-arithmetic Lloyd
    update) assigns every vector to its nearest centroid; the query probes
    its nprobe=2 nearest cells and ranks exactly within them.  Upgrades
    ``ann_ivf_topk``'s sign quantizer to learned, size-adaptive cells.

    Cross-engine determinism: centroid components are exact-decimal means
    (DECIMAL(18,9) sums / COUNT, one double division), assignments break
    distance ties by centroid id (``min_by`` over a (distance, cid) struct ≡
    the oracle's ROW_NUMBER ordering), and distances fold left-to-right.

    Scale notes (100 TB): the assignment join broadcasts K centroid rows and
    partially aggregates (min_by) map-side, so each Lloyd pass is one scan +
    one tiny-key shuffle of (vec_id, cell); in production the K centroids
    would be collected to the driver once and the argmin inlined as a codegen
    expression (zero shuffle), with more Lloyd rounds on a bounded sample —
    this declarative twin is the oracle-matched correctness contract.

    Round 12: the valid-vector relation is width-repartitioned and
    localCheckpointed — it feeds SIX consumers (K sizing, seeds, both
    Lloyd assignment passes, the query row, the final scan) which each
    re-derived the scan + norm filter, and the interpreted L2 folds ran
    at the narrow scan width (guide §2.4/§2).  Noop median at sf0.01:
    1.94 → 1.25 s, value-identical.

    Round 13 (r12 verdict task 2): both Lloyd assignment passes now run in
    ``_nearest_centroid_kernel`` — the K-row codebook is collected to the
    driver (the docstring above always called this the production shape)
    and each pass is ONE vectorized map over the checkpoint instead of a
    broadcast-join K-way row explosion + interpreted ``_l2`` fold per pair
    + a groupBy(vec_id) exchange (guide §2.4/§4.2).  The nprobe cell pick
    runs on the driver over the collected codebook with the same
    left-to-right fold (``_py_l2``) and (d, cid) tie-break.  Every double
    op is order-exact, so the oracle match stays bit-identical
    (tests/test_vec_kernels.py pins the kernels against the JVM folds)."""
    import math

    from lakehouse_sfc_spark.sources.loader import compute_width

    c = materialize_once(_emb(spark, sf_dir), compute_width(spark))
    # Same K as the JVM/oracle expression: ceil over one double sqrt.
    kk = min(256, max(8, math.ceil(math.sqrt(c.count()))))
    seed_book = _collect_codebook(
        c.filter(F.col("vec_id") < kk).select("vec_id", "emb").collect(),
        None,
        "vec_id",
        "emb",
    )
    a1 = c.select("vec_id", "emb").mapInArrow(
        _nearest_centroid_kernel(seed_book),
        "vec_id long, emb array<double>, cid long",
    )
    per_dim = (
        a1.select("cid", F.posexplode("emb").alias("pos", "x"))
        .groupBy("cid", "pos")
        .agg(
            (
                F.sum(F.col("x").cast("decimal(18,9)")).cast("double")
                / F.count(F.lit(1))
            ).alias("m")
        )
    )
    cent = per_dim.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))),
            lambda s: s["m"],
        ).alias("cemb")
    )
    cent_book = _collect_codebook(cent.collect(), None, "cid", "cemb")
    qrows = c.filter(F.col("vec_id") == _ANN_QUERY_ID).select(
        "emb", "nrm"
    ).collect()
    if not qrows:
        # query vector absent/NULL/zero-norm: empty top-k, like the
        # oracle's empty q CTE
        return spark.createDataFrame([], "vec_id bigint, score double")
    qemb, qnrm = qrows[0]["emb"], qrows[0]["nrm"]
    # nprobe nearest cells: driver-side exact fold + (d, cid) tie-break —
    # identical to the former row_number(ORDER BY d, cid) <= nprobe window.
    cids, cmat = cent_book[None]
    ranked = sorted(
        (_py_l2(qemb, cmat[i]), int(cids[i])) for i in range(len(cids))
    )
    probe_cells = [cid for _, cid in ranked[:_KM_NPROBE]]
    qemb_lit = F.array(*[F.lit(v) for v in qemb])
    cos = _dot(F.col("emb"), qemb_lit) / (F.col("nrm") * F.lit(qnrm))
    return (
        c.select("vec_id", "emb", "nrm")
        .mapInArrow(
            _nearest_centroid_kernel(cent_book),
            "vec_id long, emb array<double>, nrm double, cid long",
        )
        .filter(
            F.col("cid").isin(probe_cells)
            & (F.col("vec_id") != _ANN_QUERY_ID)
        )
        .select("vec_id", cos.alias("c"))
        .orderBy(F.col("c").desc(), F.col("vec_id"))
        .limit(_ANN_K)
        .select("vec_id", F.round(F.col("c"), 6).alias("score"))
    )


# --- greedy k-center coreset -------------------------------------------------

_KC_K = 6  # centers to select (round 0 seeds at vec_id 0)

_SQL_D2 = (
    "list_reduce(list_transform(range(1, len({a})+1),"
    " i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])), (p, q) -> p + q)"
)


def _sql_kcenter_round(r: int) -> str:
    """One greedy round as CTEs: pick the point FARTHEST from the chosen
    set (argmax min-distance, tie-break lowest vec_id), then tighten every
    point's min-distance against the new center."""
    prev = f"r{r - 1}"
    d2 = _SQL_D2.format(a=f"{prev}.emb", b=f"c{r}.emb")
    return f"""
    s{r} AS MATERIALIZED (
      SELECT first(vec_id ORDER BY md DESC, vec_id) AS cid,
             MAX(md) AS rad
      FROM {prev}
    ),
    c{r} AS MATERIALIZED (
      SELECT c.vec_id, c.emb FROM c, s{r} WHERE c.vec_id = s{r}.cid
    ),
    r{r} AS MATERIALIZED (
      SELECT {prev}.vec_id, {prev}.emb,
             LEAST({prev}.md, {d2}) AS md
      FROM {prev}, c{r}
    )"""


@register(
    "sample_kcenter",
    oracle=f"""
    WITH c AS MATERIALIZED (
      SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
      WHERE embedding IS NOT NULL
    ),
    c0 AS MATERIALIZED (SELECT emb FROM c WHERE vec_id = 0),
    r0 AS MATERIALIZED (
      SELECT c.vec_id, c.emb, {_SQL_D2.format(a="c.emb", b="c0.emb")} AS md
      FROM c, c0
    ),
    {",".join(_sql_kcenter_round(r) for r in range(1, _KC_K))}
    SELECT 0 AS sel_round, CAST(0 AS BIGINT) AS center_id,
           CAST(NULL AS DOUBLE) AS radius2
    {"".join(
        f" UNION ALL SELECT {r}, CAST(s{r}.cid AS BIGINT), s{r}.rad"
        f" FROM s{r}"
        for r in range(1, _KC_K)
    )}
    ORDER BY sel_round
    """,
)
def sample_kcenter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-CENTER coreset selection (Gonzalez farthest-point
    traversal) — the diversity-sampling workhorse for active learning and
    eval-set construction: each round adds the embedding FARTHEST from
    the chosen set (2-approximation of the optimal k-center cover), and
    the selection radius per round is the corpus's coverage guarantee.
    Deterministic: exact per-row L2 folds, argmax by (distance, lowest
    vec_id), seeded at vec_id 0.

    Scale shape: each round is one map-side d² update against a 1-ROW
    broadcast center (the argmax struct carries the winner's embedding,
    so there is NO driver collect) plus one global argmax aggregate —
    k·O(n) total work, the canonical distributed farthest-point shape.
    Lineage is checkpoint-truncated per round."""
    c = (
        load_table(spark, sf_dir, "embeddings")
        # NULL embeddings have no position in the metric space (a NULL
        # distance would also make the argmax NULL-placement-dependent,
        # which diverges across engines); zero vectors STAY — L2 distance
        # is defined there, unlike cosine's valid-vector population.
        .filter(F.col("embedding").isNotNull())
        .select(
            "vec_id", F.col("embedding").cast("array<double>").alias("emb")
        )
        .localCheckpoint(eager=False)
    )

    def d2(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    c0 = c.filter(F.col("vec_id") == 0).select(F.col("emb").alias("cemb"))
    r = c.crossJoin(F.broadcast(c0)).select(
        "vec_id", "emb", d2(F.col("emb"), F.col("cemb")).alias("md")
    ).localCheckpoint(eager=False)
    rows = [
        spark.range(1).select(
            F.lit(0).alias("sel_round"),
            F.lit(0).cast("bigint").alias("center_id"),
            F.lit(None).cast("double").alias("radius2"),
        )
    ]
    for rnd in range(1, _KC_K):
        s = r.agg(
            F.max(
                F.struct(
                    F.col("md").alias("score"),
                    (-F.col("vec_id")).alias("neg_id"),
                    F.col("emb").alias("cemb"),
                )
            ).alias("best")
        ).select(
            (-F.col("best.neg_id")).alias("cid"),
            F.col("best.score").alias("rad"),
            F.col("best.cemb").alias("cemb"),
        ).localCheckpoint(eager=False)
        rows.append(
            s.select(
                F.lit(rnd).alias("sel_round"),
                F.col("cid").cast("bigint").alias("center_id"),
                F.col("rad").alias("radius2"),
            )
        )
        r = (
            r.crossJoin(F.broadcast(s.select("cemb")))
            .select(
                "vec_id",
                "emb",
                F.least(
                    F.col("md"), d2(F.col("emb"), F.col("cemb"))
                ).alias("md"),
            )
            .localCheckpoint(eager=False)
        )
    out = rows[0]
    for df in rows[1:]:
        out = out.unionByName(df)
    return out.orderBy("sel_round")


# --- deterministic uniform hash sample --------------------------------------

_RSV_K = 500


@register(
    "sample_reservoir_hash",
    oracle=f"""
    WITH h AS (
      SELECT o_orderkey, o_custkey, o_totalprice,
             md5(CAST(o_orderkey AS VARCHAR)) AS hk
      FROM orders
    ),
    s AS (SELECT * FROM h ORDER BY hk, o_orderkey LIMIT {_RSV_K})
    SELECT COUNT(*) AS n,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_price,
           MIN(hk) AS first_hash
    FROM s
    """,
)
def sample_reservoir_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic uniform k-sample — the distributed replacement for a
    sequential reservoir: rank every row by md5 of its key and keep the k
    smallest.  Same uniform-without-replacement distribution, but
    reproducible across runs/engines/partitionings (md5 is the shared
    cross-engine hash; the key tie-break covers the impossible-in-practice
    digest collision), mergeable (the union's top-k is the top-k of
    per-partition top-ks — TakeOrderedAndProject never global-sorts), and
    incremental (a new batch only competes against the standing k-th
    digest).  Reduced to sample aggregates so the driver row stays small
    at any k."""
    o = load_table(spark, sf_dir, "orders")
    s = (
        o.select(
            "o_orderkey",
            "o_totalprice",
            F.md5(F.col("o_orderkey").cast("string")).alias("hk"),
        )
        .orderBy("hk", "o_orderkey")
        .limit(_RSV_K)
    )
    return s.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
        F.min("hk").alias("first_hash"),
    )


# --- D6: deterministic stratified sampling ---------------------------------

_STRAT_K = 3


@register(
    "sample_stratified",
    oracle=f"""
    SELECT doc_id, source, len(text) AS text_len
    FROM (
      SELECT doc_id, source, text,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents
    )
    WHERE rn <= {_STRAT_K}
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: exactly k documents per source
    stratum, chosen by md5 order of the key — a seedless, engine-agnostic
    'random' order that any engine reproduces bit-for-bit (unlike
    rand(seed), whose stream is engine- and partitioning-specific).

    Scale shape: one hash shuffle on the stratum key + a per-group
    top-k window — no global sort.  For heavily skewed strata the window's
    per-group sort is bounded by the group, and a two-phase top-k (local
    per-partition head, then merge) is what AQE's partial aggregation
    already approximates for rank-k selection at this k."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _STRAT_K)
        .select("doc_id", "source", F.length("text").alias("text_len"))
    )


# --- D7: duplicate-cluster connected components ----------------------------


@register(
    "dedup_components",
    oracle=f"""
    WITH RECURSIVE g AS MATERIALIZED ({_SQL_NGRAMS_VIEW}),
    {_sql_lsh_pair_cte(_MH_TAU, "x.doc_id < y.doc_id")},
    edg AS MATERIALIZED (
      SELECT a_id AS u, b_id AS v FROM p
      UNION SELECT b_id, a_id FROM p
    ),
    reach(u, v) AS (
      SELECT u, v FROM edg
      UNION
      SELECT r.u, edg.v FROM reach r JOIN edg ON r.v = edg.u
    )
    SELECT u AS doc_id, LEAST(u, MIN(v)) AS component
    FROM reach GROUP BY u
    """,
)
def _component_labels_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (doc_id, component) label relation: LSH candidate pairs →
    pointer-doubling connected components (see dedup_components)."""
    from lakehouse_sfc_spark.operators.components import connected_components

    pairs = dedup_minhash_lsh(spark, sf_dir).select("a_id", "b_id")
    labels = connected_components(pairs.toDF("u", "v"))
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("component")
    )


def _component_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster labels MATERIALIZED once per dataset fingerprint (r11
    verdict task 2): `dedup_keep_canonical` used to call the full LSH +
    pointer-doubling chain inline, so the sweep's #1 slowest entry re-ran
    everything `dedup_components` had just computed.  Same discipline as
    the edge caches (queries/graphq.py::_edges_recent): fingerprint-keyed
    dir, `_atomic_cache_write` + `_SUCCESS` gate, `SPARK_GRAFT_LAZY_BUILD`
    escape (the component loop runs jobs during plan construction, which
    the lazy-build contract forbids).  At 100 TB this is exactly what a
    production dedup pipeline does: label the corpus once, persist the
    |clustered|-sized relation, and let every consumer (canonical filter,
    shrinkage accounting, incremental merges) read the labels, not re-run
    the graph."""
    import os as _os

    from lakehouse_sfc_spark.queries.layouts import (
        _atomic_cache_write,
        _fingerprinted_dir,
    )

    repo = _os.path.dirname(_os.path.dirname(_os.path.dirname(__file__)))
    path = _fingerprinted_dir(
        _os.path.join(repo, ".scratch", "dedup_labels", "v1"),
        sf_dir,
        ("documents",),
    )
    if not _os.path.exists(_os.path.join(path, "_SUCCESS")):
        if _os.environ.get("SPARK_GRAFT_LAZY_BUILD"):
            return _component_labels_build(spark, sf_dir)
        _atomic_cache_write(
            _component_labels_build(spark, sf_dir).write.mode("overwrite").parquet,
            path,
        )
    return spark.read.parquet(path)


def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters: connected components over the near-duplicate pair
    graph (MinHash-LSH pairs at τ=0.7), labeling every clustered document
    with the smallest doc_id in its component — what a dedup pipeline keeps
    as the canonical representative.

    Spark-side: min-label propagation WITH POINTER DOUBLING — each round
    (a) every node takes min(own label, neighbors' labels) — one edge join
    + groupBy — then (b) compresses label chains by one self-join
    (label <- label(label)).  Path halving makes the round count
    O(log diameter) instead of O(diameter): round r covers distance 2^r,
    so the 24-round cap handles components of diameter ~16M — effectively
    any real graph — and the loop still exits early on the monotone
    checksum (sum(labels) strictly decreases until fixpoint).
    `localCheckpoint` truncates the growing lineage each round; at 100 TB
    this is the GraphX/GraphFrames dance with the standard log-round
    compression.  The oracle is a DuckDB recursive CTE computing min
    reachable label over the same exact pair graph.  The label relation is
    materialized once per dataset fingerprint and shared with
    `dedup_keep_canonical` (see `_component_labels`)."""
    return _component_labels(spark, sf_dir)


# --- A3: batch k-NN similarity join ----------------------------------------

_KNN_SAMPLE_MOD = 97  # deterministic query sample: vec_id % 97 == 0
_KNN_K = 3


@register(
    "ann_knn_join",
    oracle=f"""
    WITH c AS (SELECT vec_id, emb, nrm, {_SQL_CELL.format(e="emb")} AS cell
               FROM ({_SQL_EMB_CTE})),
         q AS (SELECT vec_id AS q_id, emb, nrm, cell FROM c
               WHERE vec_id % {_KNN_SAMPLE_MOD} = 0),
         scored AS (
           SELECT q.q_id, c.vec_id,
                  round({_sql_cos("c", "q")}, 6) AS score,
                  ROW_NUMBER() OVER (
                    PARTITION BY q.q_id
                    ORDER BY {_sql_cos("c", "q")} DESC, c.vec_id) AS rank
           FROM c JOIN q
             ON bit_count(xor(c.cell::BIGINT, q.cell::BIGINT)) <= 1
            AND c.vec_id != q.q_id
         )
    SELECT q_id, vec_id, score, rank FROM scored WHERE rank <= {_KNN_K}
    """,
)
def ann_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch k-NN similarity JOIN: top-k neighbors for EVERY query vector in
    one pass — the shape a training pipeline needs (dedup candidates,
    retrieval eval), not a per-query loop.

    Scale shape vs ``ann_ivf_topk`` (single query, broadcast): each query
    explodes to its 9 probe cells (own + hamming-1), and candidates join on
    ``cell`` EQUALITY — an ordinary hash shuffle join whose fan-out is
    bounded by cell occupancy, never |Q|x|C|.  A candidate's single cell
    matches exactly one probe row per query, so no dedup stage.  Per-query
    top-k is a window over the scored pairs — partitioned by query, no
    global sort.  At 100 TB both sides partition by cell and the probe is
    the same partition pruning as ``ann_ivf_partitioned_topk``."""
    c = _emb(spark, sf_dir).withColumn("cell", _cell(F.col("emb")))
    q = c.filter((F.col("vec_id") % _KNN_SAMPLE_MOD) == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("emb").alias("qemb"),
        F.col("nrm").alias("qnrm"),
        F.col("cell").alias("qcell"),
    )
    probes = q.withColumn(
        "pcell",
        F.explode(
            F.array(
                F.col("qcell"),
                *[
                    F.col("qcell")
                    .cast("long")
                    .bitwiseXOR(F.lit(1 << j))
                    .cast("int")
                    for j in range(_IVF_DIMS)
                ],
            )
        ),
    )
    cos = _dot(F.col("emb"), F.col("qemb")) / (F.col("nrm") * F.col("qnrm"))
    scored = (
        c.join(probes, c["cell"] == probes["pcell"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", cos.alias("cosv"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosv").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _KNN_K)
        .select(
            "q_id",
            "vec_id",
            F.round(F.col("cosv"), 6).alias("score"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


# --- D8: production approximate embedding near-dup -------------------------

_DETK_K = 5  # neighbors kept per vector
_DETK_RADIUS = 2  # probe cells within this hamming distance
# Sign-bit count B scales with the corpus so per-cell occupancy stays
# bounded (≈_DETK_OCC) instead of growing with n — a FIXED cell space makes
# probe-candidate volume ∝ n·(n/2^B), i.e. quadratic (the round-4 4.7×/100×
# superlinear tail).  B = clamp(ceil(log2(ceil(n/occ))), 8, 24), computed
# by integer bit-length (no transcendentals, so Spark and DuckDB derive the
# IDENTICAL B from the same COUNT(*)).
_DETK_OCC = 1
_DETK_MINB = 8
_DETK_MAXB = 24  # embeddings have 64 dims; 24 bits caps mask fan-out at 301


def _detk_bits(n: int) -> int:
    t = max(1, -(-n // _DETK_OCC))  # ceil(n / occ)
    return max(_DETK_MINB, min(_DETK_MAXB, (t - 1).bit_length()))


# same clamp as _detk_bits, as a SQL CASE over COUNT(*): smallest B in
# [MINB, MAXB) with n <= occ·2^B, else MAXB
_DETK_BITS_SQL = (
    "CASE "
    + " ".join(
        f"WHEN COUNT(*) <= {_DETK_OCC * (1 << b)} THEN {b}"
        for b in range(_DETK_MINB, _DETK_MAXB)
    )
    + f" ELSE {_DETK_MAXB} END"
)

_SQL_CELL_B = (
    "list_sum(list_transform(range(0, {b}),"
    " j -> CASE WHEN {e}[j+1] > 0 THEN (1::BIGINT << j) ELSE 0 END))::BIGINT"
)


def _cell_bits(emb: Column, bits: int) -> Column:
    """Sign quantizer over the first ``bits`` dims (generalized _cell)."""
    return reduce(
        add,
        [
            F.when(F.get(emb, j) > 0, F.lit(1 << j)).otherwise(F.lit(0))
            for j in range(bits)
        ],
    ).cast("long")


@register(
    "dedup_embedding_topk",
    oracle=f"""
    WITH nb AS (SELECT {_DETK_BITS_SQL} AS b FROM ({_SQL_EMB_CTE})),
         c AS (SELECT vec_id, emb, nrm,
                      {_SQL_CELL_B.format(e="emb", b="nb.b")} AS cell
               FROM ({_SQL_EMB_CTE}) CROSS JOIN nb),
         scored AS (
           SELECT q.vec_id AS a_id, c.vec_id AS b_id,
                  round({_sql_cos("c", "q")}, 6) AS score,
                  ROW_NUMBER() OVER (
                    PARTITION BY q.vec_id
                    ORDER BY {_sql_cos("c", "q")} DESC, c.vec_id) AS rank
           FROM c q JOIN c
             ON bit_count(xor(c.cell, q.cell)) <= {_DETK_RADIUS}
            AND c.vec_id != q.vec_id
           WHERE {_sql_cos("c", "q")} >= {_COS_TAU}
         )
    SELECT a_id, b_id, score, rank FROM scored WHERE rank <= {_DETK_K}
    """,
    headline=True,  # r11 verdict task 3: ANN family under the bench gate
)
def dedup_embedding_topk(
    spark: SparkSession, sf_dir: str, probe_radius: int = _DETK_RADIUS
) -> DataFrame:
    """PRODUCTION variant of embedding near-dup: per-vector top-k neighbors
    above τ via the ``ann_knn_join`` cell machinery — every vector probes the
    IVF cells within hamming distance ``probe_radius`` of its own sign cell,
    candidates join on cell EQUALITY (hash shuffle bounded by cell occupancy,
    never all-pairs), and a per-query window keeps the top-k.

    This is the 100 TB answer to ``dedup_embedding_cosine``'s inherent O(n²)
    exact contract: compute drops to |probed cells| × occupancy per vector at
    a measured recall cost (see COVERAGE.md §embedding-dedup-recall — the
    sign quantizer is a coarse sketch at τ=0.45, so radius trades compute for
    recall; the exact operator remains the oracle-grade contract).  The
    approximation itself is DETERMINISTIC (sign cells + fixed probe set), so
    the DuckDB oracle reproduces it exactly — the driver row checks the
    machinery, the recall table documents the quality.

    The sign-bit count B grows with COUNT(*) (see _detk_bits — integer
    bit-length, so the oracle's SQL CASE derives the identical B), keeping
    per-cell occupancy ≈_DETK_OCC: probe-candidate volume is
    n · (1+B+B(B−1)/2) · occupancy — linear·polylog in n, where a fixed
    2^8 cell space was quadratic.  The COUNT(*) collect is one scalar, the
    same pattern as ann_ivf_kmeans_topk's data-dependent K.

    Round-12 shape (guide §2.3 "shuffle keys and metadata instead of
    payloads", §2 parallelism): the valid-vector relation is repartitioned
    to full width and localCheckpointed — the single-row-group scan
    otherwise ran the whole interpreted cosine fold on ONE task, and the
    count()/probe/candidate sides re-parsed the scan each — and the probe
    explosion carries only (a_id, pcell) 16-byte rows instead of hauling
    the query embedding through the 67x explode; the query payload is
    re-attached by one vec_id-keyed join after candidate generation.
    Measured at sf0.1/local[32], noop sink: 2.34 s -> 1.57 s median,
    byte-identical output."""
    import itertools

    from lakehouse_sfc_spark.sources.loader import compute_width

    base = materialize_once(_emb(spark, sf_dir), compute_width(spark))
    bits = _detk_bits(base.count())
    c = base.withColumn("cell", _cell_bits(F.col("emb"), bits))
    masks = [
        sum(1 << b for b in combo)
        for r in range(probe_radius + 1)
        for combo in itertools.combinations(range(bits), r)
    ]
    probes = c.select(
        F.col("vec_id").alias("a_id"),
        F.explode(
            F.array(
                *[
                    F.col("cell").bitwiseXOR(F.lit(m).cast("long"))
                    for m in masks
                ]
            )
        ).alias("pcell"),
    )
    cand = (
        c.join(probes, c["cell"] == probes["pcell"])
        .filter(F.col("vec_id") != F.col("a_id"))
        .select(F.col("a_id"), F.col("vec_id").alias("b_id"), "emb", "nrm")
    )
    qpay = base.select(
        F.col("vec_id").alias("a_id"),
        F.col("emb").alias("qemb"),
        F.col("nrm").alias("qnrm"),
    )
    # Round 13: the cosine fold runs in _cosv_pair_kernel (Arrow/NumPy,
    # bit-identical left-to-right accumulation) instead of the interpreted
    # HOF fold, and — because the map node is opaque — Catalyst can no
    # longer push the tau filter below the scoring projection and evaluate
    # the fold TWICE per candidate (r12 verdict item 3 / guide §4.4).
    scored = (
        cand.join(qpay, "a_id")
        .select("a_id", "b_id", "emb", "nrm", "qemb", "qnrm")
        .mapInArrow(_cosv_pair_kernel, "a_id long, b_id long, cosv double")
        .filter(F.col("cosv") >= _COS_TAU)
    )
    w = Window.partitionBy("a_id").orderBy(F.col("cosv").desc(), F.col("b_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _DETK_K)
        .select(
            "a_id",
            "b_id",
            F.round(F.col("cosv"), 6).alias("score"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


# --- weighted sampling -------------------------------------------------------

_PPS_BLOCK = 4096  # keys per prefix-sum block; ~tasks = keyspace/4096


@register(
    "sample_pps",
    oracle="""
    WITH w AS (
      SELECT o_orderkey,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS w
      FROM orders
    ),
    cum AS (
      SELECT o_orderkey, w,
             CAST(SUM(w) OVER (ORDER BY o_orderkey) AS BIGINT) AS cum
      FROM w
    ),
    tot AS (
      SELECT CAST(GREATEST(SUM(w) // 1000, 1) AS BIGINT) AS stride FROM w
    )
    SELECT o_orderkey, w, cum,
           CAST(cum // stride - (cum - w) // stride AS BIGINT) AS n_hits
    FROM cum, tot
    WHERE cum // stride > (cum - w) // stride
    ORDER BY o_orderkey
    """,
)
def sample_pps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic probability-proportional-to-size sampling: ~1000 orders
    drawn with inclusion probability proportional to order value — the
    standard importance-sampling step when curating a training mix (sample
    documents by quality weight, examples by loss, tenants by volume).  A
    row is selected iff its weight interval (cum-w, cum] on the cumulative
    weight line covers a multiple of the stride W/1000; `n_hits` is its
    multiplicity (heavy rows can win multiple slots).  Every quantity is a
    BIGINT (prices routed through DECIMAL cents) and the only division is
    integral DIV — bit-exact in both engines, no RNG.

    The global cumulative sum does NOT run as one global sort: keys split
    into 4096-key blocks, each block cumulates under a hash partitioning,
    and a tiny window over per-block totals supplies each block's carry-in
    (same decomposition as a_concurrent / build_update_batches_ranged).
    The oracle computes the NAIVE global-window form — result identity is
    the proof the decomposition is exact."""
    o = load_table(spark, sf_dir, "orders")
    w = o.select(
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("w"),
        (F.expr(f"o_orderkey DIV {_PPS_BLOCK}")).alias("blk"),
    )
    w_blk = Window.partitionBy("blk").orderBy("o_orderkey")
    within = w.select(
        "o_orderkey", "w", "blk", F.sum("w").over(w_blk).alias("cum_in_blk")
    )
    blk_tot = w.groupBy("blk").agg(F.sum("w").alias("blk_w"))
    w_carry = Window.orderBy("blk").rowsBetween(Window.unboundedPreceding, -1)
    carry = blk_tot.select(
        "blk", F.coalesce(F.sum("blk_w").over(w_carry), F.lit(0)).alias("carry")
    )
    # total weight from the per-block sums already computed — never a
    # second scan of the fact table
    tot = blk_tot.agg(
        F.greatest(F.expr("SUM(blk_w) DIV 1000"), F.lit(1)).alias("stride")
    )
    cum = (
        within.join(F.broadcast(carry), "blk")
        .select(
            "o_orderkey",
            "w",
            (F.col("carry") + F.col("cum_in_blk")).alias("cum"),
        )
        .crossJoin(F.broadcast(tot))
    )
    return (
        cum.withColumn(
            "n_hits",
            F.expr("cum DIV stride - (cum - w) DIV stride"),
        )
        .filter(F.col("n_hits") > 0)
        .select("o_orderkey", "w", "cum", "n_hits")
        .orderBy("o_orderkey")
    )


@register(
    "dedup_keep_canonical",
    oracle=f"""
    WITH RECURSIVE g AS MATERIALIZED ({_SQL_NGRAMS_VIEW}),
    {_sql_lsh_pair_cte(_MH_TAU, "x.doc_id < y.doc_id")},
    edg AS MATERIALIZED (
      SELECT a_id AS u, b_id AS v FROM p
      UNION SELECT b_id, a_id FROM p
    ),
    reach(u, v) AS (
      SELECT u, v FROM edg
      UNION
      SELECT r.u, edg.v FROM reach r JOIN edg ON r.v = edg.u
    ),
    comp AS (
      SELECT u AS doc_id, LEAST(u, MIN(v)) AS component
      FROM reach GROUP BY u
    ),
    dropped AS (SELECT doc_id FROM comp WHERE doc_id <> component)
    SELECT d.source,
           COUNT(*) AS n_docs,
           COUNT(*) FILTER (WHERE dr.doc_id IS NULL) AS n_kept,
           COUNT(dr.doc_id) AS n_dropped,
           CAST(COALESCE(SUM(d.n_chars) FILTER (WHERE dr.doc_id IS NULL), 0)
                AS BIGINT) AS kept_chars
    FROM documents d LEFT JOIN dropped dr ON d.doc_id = dr.doc_id
    GROUP BY d.source
    ORDER BY d.source
    """,
)
def dedup_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END of the dedup pipeline: the surviving corpus.  Every document
    survives unless it sits in a near-duplicate cluster and is not that
    cluster's canonical representative (the smallest doc_id — the same
    label `dedup_components` assigns).  Reported per source as exact
    counts + kept-character volume, the corpus-shrinkage accounting a
    training-data run records.

    Scale shape: candidate pairs come from the banded MinHash-LSH join
    (key-equality shuffles only), cluster labels from the pointer-doubling
    component loop (O(log diameter) rounds) — read from the once-per-
    fingerprint label materialization shared with `dedup_components`
    (`_component_labels`), not recomputed — and survival is one LEFT ANTI
    join of the corpus against the dropped-id set — which is at most the
    number of clustered documents, usually tiny next to the corpus, so it
    broadcasts.  No stage touches all-pairs."""
    labels = _component_labels(spark, sf_dir)
    dropped = labels.filter(F.col("doc_id") != F.col("component")).select(
        "doc_id"
    )
    d = load_table(spark, sf_dir, "documents")
    kept_flag = F.col("dr_id").isNull()
    return (
        d.join(
            F.broadcast(dropped.withColumnRenamed("doc_id", "dr_id")),
            d.doc_id == F.col("dr_id"),
            "left",
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count(F.when(kept_flag, 1)).alias("n_kept"),
            F.count("dr_id").alias("n_dropped"),
            F.coalesce(
                F.sum(F.when(kept_flag, F.col("n_chars"))), F.lit(0)
            ).alias("kept_chars"),
        )
        .orderBy("source")
    )


# --- vector quantization -----------------------------------------------------


@register(
    "emb_quantize_int8",
    oracle="""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
      WHERE embedding IS NOT NULL
    ),
    s AS (
      SELECT * FROM (
        SELECT vec_id, emb,
               list_max(list_transform(emb, x -> abs(x))) / 127 AS scale
        FROM v
      ) WHERE scale > 0
    ),
    q AS (
      SELECT vec_id,
             len(emb) AS n_dims,
             list_sum(list_transform(emb, x ->
               CAST(FLOOR(x / scale + 0.5) AS BIGINT))) AS sum_q,
             list_max(list_transform(emb, x ->
               ABS(x - FLOOR(x / scale + 0.5) * scale))) AS max_err,
             scale
      FROM s
    )
    SELECT COUNT(*) AS n_vecs,
           MIN(n_dims) AS n_dims,
           CAST(SUM(sum_q) AS BIGINT) AS total_q,
           MAX(max_err) AS max_abs_err,
           CAST(SUM(CAST(scale AS DECIMAL(18,12))) AS DOUBLE) / COUNT(*)
             AS avg_scale
    FROM q
    """,
)
def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization audit for the embedding corpus — the
    compression step a vector store applies before ANN serving (scale =
    max|x|/127 per vector, q = round(x/scale)).  Emits corpus-level
    integrity numbers: total quantized mass (exact BIGINT), the worst
    per-element reconstruction error, and the mean scale.

    Cross-engine exactness: every per-element value is a fixed IEEE
    expression tree (divide, add 0.5, floor, multiply, abs — all
    correctly rounded, no transcendental ops); per-vector reductions are
    order-free (integer sum via an in-order fold, max over doubles);
    corpus reductions are integer sums, double max, and one
    decimal-routed mean.  All JVM-side codegen (higher-order array
    functions) — the quantizer itself needs no Python.  NULL and all-zero
    vectors are excluded (scale 0 has no quantization; divide-by-zero
    under ANSI), mirrored in the oracle."""
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding").cast("array<double>")
    s = (
        e.filter(F.col("embedding").isNotNull())
        .select("vec_id", emb.alias("emb"))
        .withColumn(
            "scale",
            F.array_max(F.transform(F.col("emb"), lambda x: F.abs(x))) / 127,
        )
        .filter(F.col("scale") > 0)
    )
    qexpr = lambda x: F.floor(x / F.col("scale") + F.lit(0.5))  # noqa: E731
    q = s.select(
        "vec_id",
        F.size("emb").alias("n_dims"),
        F.aggregate(
            F.transform(F.col("emb"), lambda x: qexpr(x).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("sum_q"),
        F.array_max(
            F.transform(
                F.col("emb"),
                lambda x: F.abs(x - qexpr(x) * F.col("scale")),
            )
        ).alias("max_err"),
        "scale",
    )
    return q.agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.min("n_dims").alias("n_dims"),
        F.sum("sum_q").alias("total_q"),
        F.max("max_err").alias("max_abs_err"),
        (
            F.sum(F.col("scale").cast("decimal(18,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_scale"),
    )


@register(
    "dedup_incremental",
    oracle=f"""
    WITH g AS MATERIALIZED ({_SQL_NGRAMS_VIEW}),
    {_sql_lsh_pair_cte(
        _MH_TAU, "x.doc_id % 10 = 0 AND y.doc_id % 10 <> 0"
    )}
    SELECT a_id AS batch_id, b_id AS corpus_id,
           round(jac_val, 4) AS jac
    FROM p
    """,
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup — the PRODUCTION shape: a new batch of
    documents (doc_id % 10 == 0 stands in for today's crawl) is checked for
    near-duplicates AGAINST THE EXISTING CORPUS, not against itself.  At
    100 TB this asymmetry is everything: the corpus's banded signatures are
    computed once and kept as a table partitioned by (band, sig); each
    day's batch computes only ITS signatures and hash-joins into the
    standing index — ingest cost scales with the batch, never the corpus.

    Here both sides derive from one signature pass (the corpus index
    build), the candidate join is batch-bands ⋈ corpus-bands on (band,
    sig) equality, and survivors are exact-Jaccard verified at τ=0.7
    against the n-gram relation — LSH recall at this τ is verified perfect
    against the exact join in the repo's recall tests, which is why the
    banded path is what the oracle mirrors (band-bucket candidates +
    exact verify — honest at any scale, and tractable at sf1 where the
    exhaustive cross-side comparison was not).

    Like ``dedup_minhash_lsh``, the n-gram and signature relations are
    localCheckpointed so the batch/corpus band split and both verify joins
    read one materialization instead of re-deriving the tokenize + n-gram +
    signature subtree per side (guide §2.4)."""
    ngr = materialize_once(_docs_ngrams(spark, sf_dir))
    mh = materialize_once(_mh_signatures_arrow(ngr))
    bands = _band_explode(mh)
    is_batch = F.col("doc_id") % 10 == 0
    batch_bands = bands.filter(is_batch)
    corpus_bands = bands.filter(~is_batch)
    cand = (
        batch_bands.alias("x")
        .join(
            corpus_bands.alias("y"),
            on=[
                F.col("x.band") == F.col("y.band"),
                F.col("x.sig") == F.col("y.sig"),
            ],
        )
        .select(
            F.col("x.doc_id").alias("batch_id"),
            F.col("y.doc_id").alias("corpus_id"),
        )
        .distinct()
    )
    jac = _pair_jaccard()
    return (
        cand.join(ngr.alias("a"), F.col("batch_id") == F.col("a.doc_id"))
        .join(ngr.alias("b"), F.col("corpus_id") == F.col("b.doc_id"))
        .filter(jac >= _MH_TAU)
        .select("batch_id", "corpus_id", F.round(jac, 4).alias("jac"))
    )


_MIX_N = 1000  # total sample budget to apportion across sources


@register(
    "sample_mixture",
    oracle=f"""
    WITH per_src AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS chars
      FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(SUM(chars) AS BIGINT) AS w FROM per_src),
    quota AS (
      SELECT p.source, p.n_docs, p.chars,
             CAST(({_MIX_N} * p.chars) // t.w AS BIGINT) AS base_quota,
             ({_MIX_N} * p.chars) % t.w AS frac
      FROM per_src p CROSS JOIN tot t
    ),
    ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (ORDER BY frac DESC, source) AS frac_rank,
             {_MIX_N} - SUM(base_quota) OVER () AS n_extra
      FROM quota
    )
    SELECT source, n_docs, chars, base_quota,
           CASE WHEN frac_rank <= n_extra THEN 1 ELSE 0 END AS extra,
           CAST(base_quota
                + CASE WHEN frac_rank <= n_extra THEN 1 ELSE 0 END AS BIGINT)
             AS n_target
    FROM ranked
    ORDER BY source
    """,
)
def sample_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix apportionment: a sample budget of {n} documents split
    across sources PROPORTIONAL TO their character volume using the
    largest-remainder method — the deterministic integer algorithm
    election systems use, and exactly what a data-mixture config needs
    (quotas sum to the budget EXACTLY, no float drift, reproducible on
    any engine).  base quota = floor(N·wᵢ/W); the N − Σfloor leftover
    seats go to the largest integer remainders (N·wᵢ mod W), ties broken
    by source name.

    Every quantity is a BIGINT (integral DIV/mod) — nothing to round.
    The data-sized stage is one per-source aggregate; the apportionment
    itself runs on the |sources|-row relation (the rank window there is
    trivially small).  Downstream, `sample_stratified`-style per-source
    top-k draws each source's n_target rows.""".format(n=_MIX_N)
    d = load_table(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("chars"),
    )
    tot = per_src.agg(F.sum("chars").alias("w"))
    quota = per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "chars",
        F.expr(f"({_MIX_N} * chars) DIV w").alias("base_quota"),
        F.expr(f"({_MIX_N} * chars) % w").alias("frac"),
    )
    w_rank = Window.orderBy(F.desc("frac"), "source")
    w_all = Window.partitionBy()
    ranked = quota.select(
        "source",
        "n_docs",
        "chars",
        "base_quota",
        F.row_number().over(w_rank).alias("frac_rank"),
        (F.lit(_MIX_N) - F.sum("base_quota").over(w_all)).alias("n_extra"),
    )
    extra = F.when(F.col("frac_rank") <= F.col("n_extra"), 1).otherwise(0)
    return (
        ranked.select(
            "source",
            "n_docs",
            "chars",
            "base_quota",
            extra.alias("extra"),
            (F.col("base_quota") + extra).alias("n_target"),
        )
        .orderBy("source")
    )


@register(
    "sample_mixture_draw",
    oracle=f"""
    WITH per_src AS (
      SELECT source, CAST(SUM(n_chars) AS BIGINT) AS chars
      FROM documents GROUP BY source
    ),
    tot AS (SELECT SUM(chars) AS w FROM per_src),
    quota AS (
      SELECT p.source,
             ({_MIX_N} * p.chars) // t.w AS base_quota,
             ({_MIX_N} * p.chars) % t.w AS frac
      FROM per_src p CROSS JOIN tot t
    ),
    targets AS (
      SELECT source,
             base_quota + CASE WHEN ROW_NUMBER() OVER (
               ORDER BY frac DESC, source
             ) <= {_MIX_N} - SUM(base_quota) OVER () THEN 1 ELSE 0 END
               AS n_target
      FROM quota
    ),
    ranked_docs AS (
      SELECT doc_id, source, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn
      FROM documents
    ),
    drawn AS (
      SELECT r.source, r.doc_id, r.n_chars
      FROM ranked_docs r JOIN targets t ON r.source = t.source
      WHERE r.rn <= t.n_target
    )
    SELECT source, COUNT(*) AS n_drawn,
           CAST(SUM(n_chars) AS BIGINT) AS drawn_chars,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
    FROM drawn GROUP BY source ORDER BY source
    """,
)
def sample_mixture_draw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mixture MATERIALIZED: each source contributes exactly its
    apportioned n_target documents (largest-remainder quotas from
    `sample_mixture`), drawn in deterministic md5 order (seedless, the
    `sample_stratified` trick) — the complete
    weigh → apportion → draw pipeline a training-mix job runs, end to
    end in one plan.  The quota table is |sources| rows and broadcasts
    into the per-source top-k window; the only data-sized work is one
    source-partitioned rank."""
    d = load_table(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(F.sum("n_chars").alias("chars"))
    tot = per_src.agg(F.sum("chars").alias("w"))
    quota = per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        F.expr(f"({_MIX_N} * chars) DIV w").alias("base_quota"),
        F.expr(f"({_MIX_N} * chars) % w").alias("frac"),
    )
    w_rank = Window.orderBy(F.desc("frac"), "source")
    w_all = Window.partitionBy()
    targets = quota.select(
        "source",
        (
            F.col("base_quota")
            + F.when(
                F.row_number().over(w_rank)
                <= F.lit(_MIX_N) - F.sum("base_quota").over(w_all),
                1,
            ).otherwise(0)
        ).alias("n_target"),
    )
    w_doc = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    ranked = d.select(
        "doc_id",
        "source",
        "n_chars",
        F.row_number().over(w_doc).alias("rn"),
    )
    return (
        ranked.join(F.broadcast(targets), "source")
        .filter(F.col("rn") <= F.col("n_target"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_drawn"),
            F.sum("n_chars").alias("drawn_chars"),
            F.min("doc_id").alias("min_doc_id"),
        )
        .orderBy("source")
    )


#: temperature exponent for sample_mixture_temperature: weight ∝ mass^0.5
#: (sqrt is the canonical "flatten the mixture" setting; α=1 degenerates to
#: sample_mixture's proportional apportionment, α=0 to uniform-per-source)
_MIXT_ALPHA_SQRT = True
#: the mixture's char budget = total_chars // _MIXT_BUDGET_DIV
_MIXT_BUDGET_DIV = 2


@register(
    "sample_mixture_temperature",
    oracle=f"""
    WITH per_src AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS chars
      FROM documents GROUP BY source
    ),
    tot AS (
      SELECT
        -- ordered fold: SUM over doubles is order-dependent; both engines
        -- fold sqrt weights in source order (Spark: sorted-array aggregate)
        list_reduce(list(sqrt(chars) ORDER BY source), (p, q) -> p + q)
          AS w_total,
        CAST(SUM(chars) AS BIGINT) AS total_chars
      FROM per_src
    )
    SELECT p.source, p.n_docs, p.chars,
           sqrt(p.chars) / t.w_total AS share,
           CAST(FLOOR((t.total_chars // {_MIXT_BUDGET_DIV})
                      * (sqrt(p.chars) / t.w_total)) AS BIGINT)
             AS target_chars,
           FLOOR((t.total_chars // {_MIXT_BUDGET_DIV})
                 * (sqrt(p.chars) / t.w_total)) / p.chars AS epochs,
           sqrt(p.chars) / t.w_total
             > CAST(p.chars AS DOUBLE) / CAST(t.total_chars AS DOUBLE)
             AS upsampled
    FROM per_src p CROSS JOIN tot t
    ORDER BY p.source
    """,
)
def sample_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPERATURE-weighted training mixture (the LLaMA/Pile-style
    upsampling knob): source weight ∝ chars^0.5 instead of
    `sample_mixture`'s proportional chars^1 — small sources get a larger
    share than their raw volume, the standard trick for keeping rare
    domains represented.  Per source: its normalized share, the char
    target under a budget of half the corpus, the implied EPOCH count
    (target/chars — >1 means the source repeats during training, the
    number a mixture designer actually reads), and whether temperature
    up-weighted it vs proportional.

    Cross-engine determinism: sqrt is correctly-rounded IEEE in both
    engines; the normalization denominator is a FIXED source-ordered
    fold of the sqrt weights (a plain SUM over doubles would be
    row-order-dependent — the `_l2` discipline applied to a scalar), and
    every downstream number is one multiply/divide/floor of already-equal
    doubles.

    Scale shape: one per-source aggregate is the only data-sized stage;
    the temperature math runs on the |sources|-row relation with a 1-row
    broadcast of the totals."""
    d = load_table(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("chars"),
    )
    tot = per_src.agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct("source", F.sqrt("chars").alias("w")))
            ),
            F.lit(0.0),
            lambda acc, s: acc + s["w"],
        ).alias("w_total"),
        F.sum("chars").cast("bigint").alias("total_chars"),
    )
    budget = F.expr(f"total_chars DIV {_MIXT_BUDGET_DIV}")
    share = F.sqrt(F.col("chars")) / F.col("w_total")
    target = F.floor(budget * share)
    return (
        per_src.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "chars",
            share.alias("share"),
            target.cast("bigint").alias("target_chars"),
            (target / F.col("chars")).alias("epochs"),
            (
                share
                > F.col("chars").cast("double")
                / F.col("total_chars").cast("double")
            ).alias("upsampled"),
        )
        .orderBy("source")
    )


# --- train-test decontamination ---------------------------------------------

_DECON_K = 5  # shingle width: long enough that chance overlap is signal
_DECON_MOD = 23  # doc_id % 23 == 0 plays the held-out benchmark set

_SQL_DECON_SHINGLE = " || ' ' || ".join(f"w[i+{j}]" for j in range(_DECON_K))


@register(
    "text_decontaminate",
    oracle=f"""
    WITH g AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(w)-{_DECON_K - 2}),
               i -> {_SQL_DECON_SHINGLE})) AS ng
      FROM (SELECT doc_id, {_SQL_TOKENS} AS w FROM documents)
    ),
    bench AS (SELECT doc_id AS b_id, unnest(ng) AS s
              FROM g WHERE doc_id % {_DECON_MOD} = 0),
    train AS (SELECT doc_id, len(ng) AS n_sh, unnest(ng) AS s
              FROM g WHERE doc_id % {_DECON_MOD} <> 0)
    SELECT t.doc_id,
           COUNT(DISTINCT t.s) AS n_hit,
           COUNT(DISTINCT b.b_id) AS n_bench_docs,
           COUNT(DISTINCT t.s)::DOUBLE / MIN(t.n_sh) AS ratio
    FROM train t JOIN bench b ON t.s = b.s
    GROUP BY t.doc_id
    ORDER BY t.doc_id
    """,
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-test DECONTAMINATION — the pre-training hygiene step every
    serious data pipeline runs (GPT-3 §2.2 / PaLM-style 13-gram filtering,
    here 5-token shingles sized to the synthetic corpus): flag every
    training document sharing at least one shingle with the held-out
    benchmark set, with the hit count, how many benchmark docs it collides
    with, and the contaminated fraction of its shingles.

    Scale shape: the benchmark side is an eval suite — thousands of rows
    against billions — so its exploded shingle set BROADCASTS and the
    training corpus streams through a broadcast hash join with zero
    shuffle of the big side; the per-doc aggregate shuffles only the hit
    pairs (rare by construction).  The ratio divides two exact integers,
    so the double is bit-identical across engines."""
    d = load_table(spark, sf_dir, "documents")
    d = d.filter(F.size(_tokens(F.col("text"))) >= _DECON_K)
    from lakehouse_sfc_spark.sources.loader import compute_width

    width = compute_width(spark)
    if d.rdd.getNumPartitions() < width:
        d = d.repartition(width)  # heavy shingle projection at full width
    # localCheckpoint is load-bearing, not a cache nicety: the shingle
    # expression is a higher-order function (CodegenFallback), and a
    # consumer that references `ng` more than once (size + explode here)
    # re-evaluates the whole tokenize+shingle tree per reference in
    # interpreted mode — measured 31 s -> 2.7 s at sf0.1.  Materializing
    # the 2×-consumed relation is the right call at 100 TB too.
    # tokens materialized in their own projection: inlining _tokens into
    # _ngrams re-splits the text per array element (O(tokens²) per doc)
    g = (
        d.select("doc_id", _tokens(F.col("text")).alias("w"))
        .select("doc_id", _ngrams(F.col("w"), _DECON_K).alias("ng"))
        .localCheckpoint(eager=False)
    )
    mod = F.col("doc_id") % _DECON_MOD
    bench = (
        g.filter(mod == 0)
        .select(F.col("doc_id").alias("b_id"), F.explode("ng").alias("s"))
    )
    train = g.filter(mod != 0).select(
        "doc_id", F.size("ng").alias("n_sh"), F.explode("ng").alias("s")
    )
    return (
        train.join(F.broadcast(bench), "s")
        .groupBy("doc_id")
        .agg(
            F.count_distinct("s").alias("n_hit"),
            F.count_distinct("b_id").alias("n_bench_docs"),
            (
                F.count_distinct("s").cast("double") / F.min("n_sh")
            ).alias("ratio"),
        )
        .orderBy("doc_id")
    )


# --- semantic dedup: keep one representative per embedding cluster ----------

_KC_TICK = 1_000_000  # fixed-point scale for exact cross-engine arithmetic


@register(
    "dedup_embedding_keep_centroid",
    oracle=f"""
    WITH c AS (SELECT vec_id, emb, {_SQL_CELL.format(e="emb")} AS cell
               FROM ({_SQL_EMB_CTE})),
    t AS (SELECT vec_id, cell, j.j AS pos,
                 CAST(FLOOR(emb[j.j+1] * {_KC_TICK}) AS BIGINT) AS tick
          FROM c, LATERAL (SELECT unnest(range(0, 64)) AS j) j),
    s AS (SELECT cell, pos, SUM(tick)::BIGINT AS cs FROM t GROUP BY 1, 2),
    sc AS (SELECT t.vec_id, t.cell, SUM(t.tick * s.cs)::BIGINT AS score
           FROM t JOIN s ON t.cell = s.cell AND t.pos = s.pos
           GROUP BY 1, 2),
    r AS (SELECT *, ROW_NUMBER() OVER (
            PARTITION BY cell ORDER BY score DESC, vec_id) AS rk
          FROM sc),
    m AS (SELECT cell, COUNT(*) AS n_members FROM c GROUP BY 1)
    SELECT r.cell::BIGINT AS cell, r.vec_id AS kept_vec, r.score,
           m.n_members
    FROM r JOIN m ON r.cell = m.cell WHERE rk = 1
    ORDER BY cell
    """,
)
def dedup_embedding_keep_centroid(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SEMANTIC dedup reduction: cluster embeddings by sign cell and keep
    one representative per cluster — the vector most aligned with the
    cluster's mean direction (argmax of dot(v, Σ_cluster v), the centroid-
    nearest member up to normalization) — the embedding-space sibling of
    ``dedup_keep_canonical``'s text-side keep rule, i.e. SemDeDup-style
    'one doc per semantic cluster' curation.

    Exactness: every quantity is integer — per-dim fixed-point ticks
    floor(v·1e6), per-cell tick sums, and the alignment score
    Σ_j tick_vj · cellsum_j (bounded: |tick| ≤ 1e6 · occupancy ≤ 4e9 ·
    64 dims « 2^63) — so argmax + vec_id tie-break is bit-deterministic in
    both engines, no float comparisons anywhere.

    Scale shape: posexplode fans each vector into 64 (cell, dim) rows;
    the centroid is a (cell, dim)-keyed aggregation, the score a
    (cell, dim)-keyed join + (vec)-keyed aggregation, the keep an argmax
    window over |cells| partitions — every stage key-equality, nothing
    quadratic.  At 100 TB, scale the cell bits with n exactly as
    dedup_embedding_topk does."""
    c = _emb(spark, sf_dir).withColumn("cell", _cell(F.col("emb")))
    t = c.select(
        "vec_id",
        "cell",
        F.posexplode("emb").alias("pos", "v"),
    ).select(
        "vec_id",
        "cell",
        "pos",
        F.floor(F.col("v") * _KC_TICK).cast("long").alias("tick"),
    )
    s = t.groupBy("cell", "pos").agg(F.sum("tick").alias("cs"))
    sc = (
        t.join(s, ["cell", "pos"])
        .groupBy("vec_id", "cell")
        .agg(F.sum(F.col("tick") * F.col("cs")).alias("score"))
    )
    w = Window.partitionBy("cell").orderBy(F.desc("score"), "vec_id")
    m = c.groupBy("cell").agg(F.count(F.lit(1)).alias("n_members"))
    return (
        sc.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .join(m, "cell")
        .select(
            F.col("cell").cast("bigint").alias("cell"),
            F.col("vec_id").alias("kept_vec"),
            "score",
            "n_members",
        )
        .orderBy("cell")
    )


# --- asymmetric containment dedup -------------------------------------------

_CT_TAU = 0.6  # containment |A∩B|/|A| threshold
_CT_TOPK = 5  # per-doc output cap: top-k containing docs (pair list is
# otherwise unbounded — co-occurrence density can grow ~n² with corpus size)


@register(
    "dedup_containment",
    # Candidates share >=1 non-saturated gram (df <= _DF_CAP, the mirrored
    # contract drop — without it the e×e join's Σdf² volume is intractable
    # at the fixed-vocab sf1 fixture); verification is the exact split
    # count (lo-join + hi-join per-pair counts sum to |A∩B| since ng is
    # list_distinct), and the threshold compare stays double division to
    # mirror the Spark side.
    oracle=f"""
    WITH g AS MATERIALIZED ({_SQL_NGRAMS_VIEW}),
    e AS MATERIALIZED (
      SELECT doc_id, unnest(ng) AS gr FROM g
    ),
    dfq AS MATERIALIZED (SELECT gr, COUNT(*) AS df FROM e GROUP BY gr),
    lo AS MATERIALIZED (
      SELECT e.doc_id, e.gr FROM e JOIN dfq ON e.gr = dfq.gr
      WHERE dfq.df <= {_DF_CAP}
    ),
    hi AS MATERIALIZED (
      SELECT e.doc_id, e.gr FROM e JOIN dfq ON e.gr = dfq.gr
      WHERE dfq.df > {_DF_CAP}
    ),
    c AS MATERIALIZED (
      SELECT l0.a_id, l0.b_id, l0.s + COALESCE(h0.s, 0) AS shared
      FROM (SELECT x.doc_id AS a_id, y.doc_id AS b_id, COUNT(*) AS s
            FROM lo x JOIN lo y ON x.gr = y.gr AND x.doc_id <> y.doc_id
            GROUP BY 1, 2) l0
      LEFT JOIN (SELECT x.doc_id AS a_id, y.doc_id AS b_id, COUNT(*) AS s
                 FROM hi x JOIN hi y ON x.gr = y.gr AND x.doc_id <> y.doc_id
                 GROUP BY 1, 2) h0
      USING (a_id, b_id)
    ),
    v AS (
      SELECT c.a_id, c.b_id, c.shared,
             round(c.shared::DOUBLE / len(a.ng), 4) AS containment
      FROM c JOIN g a ON c.a_id = a.doc_id
      WHERE c.shared::DOUBLE / len(a.ng) >= {_CT_TAU}
    )
    SELECT a_id, b_id, containment
    FROM (
      SELECT a_id, b_id, containment,
             ROW_NUMBER() OVER (
               PARTITION BY a_id ORDER BY shared DESC, b_id
             ) AS rk
      FROM v
    ) WHERE rk <= {_CT_TOPK}
    """,
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC near-dup: containment C(A,B) = |A∩B|/|A| ≥ 0.6 flags
    documents largely CONTAINED in another (quotes, boilerplate wrappers,
    excerpt pages) — pairs symmetric Jaccard misses whenever the container
    is much longer than the contained doc.  Exact, via the containment
    prefix filter: C ≥ τ ⇒ at most |A|−⌈τ|A|⌉ of A's n-grams fall outside
    B, so ANY |A|−⌈τ|A|⌉+1 of them must hit B — index only that many of
    A's RAREST n-grams (global-df order) against the full inverted index,
    then verify candidates exactly.

    Scale shape: only rare n-grams fan out on the prefix side (df ≤
    _DF_CAP — the saturated-gram drop, oracle-mirrored), candidates join
    on n-gram equality, verification touches candidate pairs only.  The
    length conjunct (|B| ≥ τ|A|) is implied by C ≥ τ — pruning, never a
    semantic difference.

    Output cap: the verified pair list is unbounded (co-occurrence density
    can grow ~n² with corpus size — on this synthetic corpus it does, by
    construction), so at 100 TB the PAIR LIST itself becomes the
    bottleneck.  The operator therefore emits only the top-_CT_TOPK
    containing docs per contained doc (window over the verified pairs,
    ordered by the EXACT integer intersection size then b_id —
    deterministic, no float ties), bounding output at n·k rows while
    candidate generation stays the sound rarest-gram prefix filter."""
    ngr = (
        _docs_ngrams(spark, sf_dir)
        .withColumn(
            "hg", F.array_distinct(F.transform("ng", lambda g: F.xxhash64(g)))
        )
        .repartition("doc_id")
        .localCheckpoint(eager=False)
    )
    cand = _prefix_candidates(ngr, _CT_TAU, symmetric=False)
    # Two-phase verify: candidate pairs carry two ~3 KB string-gram arrays
    # through the verify join, so the join's memory traffic — not the
    # intersect — dominates.  Phase 1 intersects 64-bit xxhash64 gram
    # arrays (4× smaller rows, long compares) as a FILTER with 4 grams of
    # slack: within-doc hash collisions can only shrink the hashed
    # intersect by the collision count (~0 at 2^-64), so no qualifying
    # pair is dropped.  Phase 2 re-verifies the survivors (≈ the true
    # pairs) on the exact STRING grams — the emitted containment is exact.
    ha = ngr.select(
        F.col("doc_id").alias("a_id"),
        F.col("hg").alias("ha"),
        F.size("ng").alias("alen"),
    )
    hb = ngr.select(F.col("doc_id").alias("b_id"), F.col("hg").alias("hb"))
    survivors = (
        cand.join(ha, "a_id")
        .join(hb, "b_id")
        .filter(
            F.size(F.array_intersect("ha", "hb"))
            >= F.col("alen") * F.lit(_CT_TAU) - F.lit(4.0)
        )
        .select("a_id", "b_id")
    )
    shared = F.size(F.array_intersect(F.col("a.ng"), F.col("b.ng")))
    cont = shared.cast("double") / F.size(F.col("a.ng"))
    w = Window.partitionBy("a_id").orderBy(F.desc("shared"), "b_id")
    return (
        survivors.join(ngr.alias("a"), F.col("a_id") == F.col("a.doc_id"))
        .join(ngr.alias("b"), F.col("b_id") == F.col("b.doc_id"))
        .filter(cont >= _CT_TAU)
        .select(
            "a_id",
            "b_id",
            shared.alias("shared"),
            F.round(cont, 4).alias("containment"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _CT_TOPK)
        .select("a_id", "b_id", "containment")
    )


# --- exact-duplicate cluster profile ----------------------------------------


# --- cross-lingual near-dup (translation pairs) ------------------------------


@register(
    "dedup_cross_lingual",
    oracle=f"""
    WITH c AS ({_SQL_EMB_CTE}),
    pairs AS (
      SELECT a.vec_id AS a_id, b.vec_id AS b_id,
             round({_sql_cos("a", "b")}, 6) AS score
      FROM c a JOIN c b ON a.vec_id < b.vec_id
      WHERE {_sql_cos("a", "b")} >= {_COS_TAU}
    )
    SELECT LEAST(da.lang, db.lang) AS lang_a,
           GREATEST(da.lang, db.lang) AS lang_b,
           COUNT(*) AS n_pairs,
           MAX(p.score) AS top_score,
           CAST(MIN(p.a_id) AS BIGINT) AS min_a_id
    FROM pairs p
    JOIN documents da ON p.a_id = da.doc_id
    JOIN documents db ON p.b_id = db.doc_id
    WHERE da.lang <> db.lang
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def dedup_cross_lingual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRANSLATION-pair detection — the cross-lingual dedup no text-based
    method can do (word n-grams share nothing across languages): embedding
    near-dup pairs (cosine ≥ τ, the block-partitioned exact scorer) whose
    linked documents carry DIFFERENT language tags, reported per unordered
    language pair.  The multilingual-corpus audit that decides whether
    translated copies count against a dedup budget.

    Scale shape: pair generation is dedup_embedding_cosine's bounded
    block-pair machinery; the doc joins are key-equality on doc_id (dims
    broadcast at this SF, hash joins at 100 TB); the lang-pair rollup is a
    tiny-keyed aggregate.  MAX/MIN reductions only — order-free exact."""
    pairs = dedup_embedding_cosine(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    j = (
        pairs.join(
            d.select(F.col("doc_id").alias("a_id"), F.col("lang").alias("la")),
            "a_id",
        )
        .join(
            d.select(F.col("doc_id").alias("b_id"), F.col("lang").alias("lb")),
            "b_id",
        )
        .filter(F.col("la") != F.col("lb"))
    )
    return (
        j.groupBy(
            F.least("la", "lb").alias("lang_a"),
            F.greatest("la", "lb").alias("lang_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.max("score").alias("top_score"),
            F.min("a_id").alias("min_a_id"),
        )
        .orderBy("lang_a", "lang_b")
    )


# --- edit-distance-verified near-dup ----------------------------------------

_ED_TAU = 0.5  # gram-Jaccard candidate threshold (prefix-filterable)
_ED_FRAC = 0.2  # max edit distance as a fraction of the longer text


@register(
    "dedup_edit_distance",
    oracle=f"""
    WITH g AS MATERIALIZED ({_SQL_NGRAMS_VIEW}),
    {_sql_pair_jaccard_cte(_ED_TAU, 1, 2, "x.doc_id < y.doc_id")}
    SELECT p.a_id, p.b_id,
           round(p.jac_val, 4) AS jac,
           CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_dist
    FROM p
    JOIN documents da ON p.a_id = da.doc_id
    JOIN documents db ON p.b_id = db.doc_id
    WHERE regexp_full_match(da.text, '[\\x00-\\x7f]*')
      AND regexp_full_match(db.text, '[\\x00-\\x7f]*')
      AND levenshtein(da.text, db.text)
          <= FLOOR({_ED_FRAC} * GREATEST(len(da.text), len(db.text)))
    ORDER BY a_id, b_id
    """,
)
def dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHARACTER-level near-dup verification: gram-similar candidate pairs
    (Jaccard ≥ 0.5 via the capped prefix filter — the τ=0.5 prefix is half
    of every doc's grams, so this entry is where the saturated-gram drop
    matters most: its sf1 step was 20.5× before the cap) re-verified by
    Levenshtein
    distance ≤ 20% of the longer text — the second opinion that separates
    true revisions (small char edits) from docs that merely share phrasing
    (high gram overlap, heavy rewrites).  Both engines implement
    unit-cost Levenshtein natively but over DIFFERENT units — Spark counts
    codepoints, DuckDB counts BYTES — so the char-level verification is
    restricted to single-byte (ASCII) texts, where the two definitions
    coincide and the agreement is exact INTEGER; non-ASCII documents keep
    their gram-level dedup coverage and are exempt here (both sides apply
    the identical exclusion).  The length-ratio conjunct is implied by
    Jaccard ≥ 0.5.

    Scale shape: candidates from the banded prefix filter (never
    all-pairs); the O(|a|·|b|) edit-distance kernel runs only on verified
    gram-similar pairs, exactly where a production fuzzy-dedup spends it."""
    ngr = (
        _docs_ngrams(spark, sf_dir)
        .repartition("doc_id")
        .localCheckpoint(eager=False)
    )
    cand = _prefix_candidates(ngr, _ED_TAU, symmetric=True)
    jac = _pair_jaccard()
    d = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("text").rlike("^[\\x00-\\x7F]*$"))
    )
    lev = F.levenshtein(F.col("ta.text"), F.col("tb.text"))
    cap = F.floor(
        F.lit(_ED_FRAC)
        * F.greatest(F.length("ta.text"), F.length("tb.text"))
    )
    return (
        cand.join(ngr.alias("a"), F.col("a_id") == F.col("a.doc_id"))
        .join(ngr.alias("b"), F.col("b_id") == F.col("b.doc_id"))
        .filter(jac >= _ED_TAU)
        .select("a_id", "b_id", F.round(jac, 4).alias("jac"))
        .join(d.alias("ta"), F.col("a_id") == F.col("ta.doc_id"))
        .join(d.alias("tb"), F.col("b_id") == F.col("tb.doc_id"))
        .filter(lev <= cap)
        .select("a_id", "b_id", "jac", lev.cast("bigint").alias("edit_dist"))
        .orderBy("a_id", "b_id")
    )


_SW_W = 8  # window length in tokens
_SW_S = 4  # window stride


@register(
    "dedup_substring_windows",
    oracle=f"""
    WITH t AS MATERIALIZED (
      SELECT doc_id, source, {_SQL_TOKENS} AS w FROM documents
    ),
    wins AS MATERIALIZED (
      SELECT doc_id, source,
             list_distinct(list_transform(
               range(1, len(w) - {_SW_W} + 2, {_SW_S}),
               i -> array_to_string(w[i:i+{_SW_W - 1}], ' '))) AS wl
      FROM t WHERE len(w) >= {_SW_W}
    ),
    e AS MATERIALIZED (
      SELECT doc_id, source, unnest(wl) AS win FROM wins
    ),
    dfc AS (SELECT win, COUNT(*) AS dfc FROM e GROUP BY win)
    SELECT e.source,
           COUNT(DISTINCT e.doc_id) AS n_docs,
           COUNT(*) AS n_windows,
           CAST(COUNT(*) FILTER (WHERE dfc.dfc >= 2) AS BIGINT)
             AS n_dup_windows,
           CAST(MAX(dfc.dfc) AS BIGINT) AS max_window_df
    FROM e JOIN dfc ON e.win = dfc.win
    GROUP BY e.source ORDER BY e.source
    """,
)
def dedup_substring_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-SUBSTRING detection — the contiguous-span
    cousin of set-overlap dedup (the "train-data substring duplication"
    audit): each document emits its distinct 8-token windows at stride 4;
    a window occurring in ≥2 documents is duplicated text verbatim
    (boilerplate, license headers, quoted spans) even when full-document
    Jaccard stays below every dedup threshold.  Reported per source as
    window totals + the max cross-document window frequency.

    Scale shape: window construction is a map-side expression; frequency
    is one hash aggregation on the window key and the join back is
    key-equality on the same key (one exchange, reused by both consumers
    via the repartition barrier) — never all-pairs.  At 100 TB windows
    would be 64-bit hashes instead of strings (the verify-exact step here
    keeps strings so the oracle compares verbatim)."""
    d = load_table(spark, sf_dir, "documents")
    tok = _tokens(F.col("text"))
    pruned = d.filter(F.size(tok) >= _SW_W)
    from lakehouse_sfc_spark.sources.loader import compute_width

    width = compute_width(spark)
    if pruned.rdd.getNumPartitions() < width:
        pruned = pruned.repartition(width)
    # tokens materialized in their own projection before the window lambda:
    # an inline split referenced per element re-splits the text per
    # position (O(tokens²) per doc)
    wa = F.col("w")
    wins = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(wa) - _SW_W + 1, F.lit(_SW_S)),
            lambda i: F.array_join(F.slice(wa, i, _SW_W), " "),
        )
    )
    e = (
        pruned.select("doc_id", "source", _tokens(F.col("text")).alias("w"))
        .select("doc_id", "source", F.explode(wins).alias("win"))
        .repartition("win")
        .localCheckpoint(eager=False)
    )
    dfc = e.groupBy("win").agg(F.count(F.lit(1)).alias("dfc"))
    return (
        e.join(dfc, "win")
        .groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_windows"),
            F.count(F.when(F.col("dfc") >= 2, 1)).alias("n_dup_windows"),
            F.max("dfc").alias("max_window_df"),
        )
        .orderBy("source")
    )


@register(
    "dedup_cluster_sizes",
    oracle="""
    WITH c AS (
      SELECT md5(text) AS h, COUNT(*) AS sz, MIN(doc_id) AS canonical
      FROM documents GROUP BY 1
    )
    SELECT sz AS cluster_size,
           COUNT(*) AS n_clusters,
           (sz * COUNT(*))::BIGINT AS n_docs,
           MIN(canonical) AS min_canonical_id
    FROM c GROUP BY 1 ORDER BY 1
    """,
)
def dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate cluster-size histogram — the first report a corpus
    audit wants: how much of the corpus is byte-identical copies, and in
    clusters of what size (size 1 = unique docs; the tail is boilerplate).
    Two keyed aggregations (content hash → cluster size → histogram), both
    map-side combinable; no joins, no windows — scan-bound at any scale."""
    d = load_table(spark, sf_dir, "documents")
    c = d.groupBy(F.md5("text").alias("h")).agg(
        F.count(F.lit(1)).alias("sz"),
        F.min("doc_id").alias("canonical"),
    )
    return (
        c.groupBy(F.col("sz").alias("cluster_size"))
        .agg(
            F.count(F.lit(1)).alias("n_clusters"),
            F.min("canonical").alias("min_canonical_id"),
        )
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters"))
            .cast("bigint")
            .alias("n_docs"),
            "min_canonical_id",
        )
        .orderBy("cluster_size")
    )


# --- dominant principal direction (power iteration, exact) ------------------

_PCA_ITERS = 3
_PCA_V0 = [1.0] + [0.0] * 63
_PCA_TICK = 1_000_000  # per-term quantum; double->DECIMAL casts are NOT
# bit-portable across engines at high scale (DuckDB quantizes through the
# double domain), but FLOOR(x * tick) is pure IEEE + floor — identical
# everywhere (the STATE.md cast-ladder rule)


def _sql_pca_iter(prev_v: str, k: int) -> str:
    """One UNNORMALIZED power-iteration step as CTEs: s_i = <emb_i, v>
    (per-row left-to-right fold, deterministic), u_j = Σ_i emb_ij·s_i with
    each term FLOOR-quantized to integer ticks so the cross-row sum is
    order-free exact, then v = list(u ORDER BY j)."""
    dot = _SQL_DOT.format(a="c.emb", b=f"{prev_v}.v")
    return f"""
    u{k} AS (
      SELECT x.j,
             CAST(CAST(SUM(CAST(FLOOR(x.val * s{k}.s * {_PCA_TICK}.0)
                                AS BIGINT)) AS BIGINT) AS DOUBLE)
               / {_PCA_TICK}.0 AS u
      FROM x JOIN (SELECT c.vec_id, {dot} AS s FROM c, {prev_v}) s{k}
        ON x.vec_id = s{k}.vec_id
      GROUP BY x.j
    ),
    v{k} AS (SELECT list(u ORDER BY j) AS v FROM u{k})"""


_SQL_PCA_NORM = (
    "sqrt(list_reduce(list_transform(v, y -> y * y), (a, b) -> a + b))"
)


@register(
    "emb_pca_power",
    oracle=f"""
    WITH c AS MATERIALIZED (
      SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
    ),
    x AS MATERIALIZED (
      SELECT vec_id, generate_subscripts(emb, 1) AS j, unnest(emb) AS val
      FROM c
    ),
    v0 AS (SELECT {list(map(float, _PCA_V0))}::DOUBLE[] AS v),
    {",".join(_sql_pca_iter(f"v{k - 1}", k) for k in range(1, _PCA_ITERS + 1))},
    nr AS (SELECT {_SQL_PCA_NORM} AS nrm FROM v{_PCA_ITERS})
    SELECT u{_PCA_ITERS}.j AS dim, u{_PCA_ITERS}.u / nr.nrm AS loading
    FROM u{_PCA_ITERS}, nr
    ORDER BY dim
    """,
)
def emb_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant principal direction of the embedding matrix by DISTRIBUTED
    power iteration — the drift/collapse monitor for an embedding corpus
    (a dominant direction absorbing most mass = anisotropic or degenerate
    embeddings).  Three UNNORMALIZED A^T(Av) steps: per-row scores are
    deterministic left-to-right folds, the cross-row accumulations
    FLOOR-quantize each term to 1e-6 ticks and sum BIGINTs (order-free
    exact; double→DECIMAL casts at high scale are NOT bit-portable across
    engines, FLOOR ladders are), and the single normalization at the end
    is a fixed-order 64-term fold + IEEE sqrt/divide — both engines emit
    bit-identical loadings with no per-iteration rounding drift.
    Skipping the per-step norm is safe here: random-sign cancellation
    keeps u ≈ λ^k·u0, and tick terms stay far under the BIGINT bound at
    any test SF.

    Scale shape: each step is one broadcast of the 1-row direction vector
    + one map-side-combined 64-group aggregation — no driver collect, no
    global sort; the classic distributed-matvec PCA (3 passes at 100 TB,
    or one pass with block-accumulated A^T A if 64x64 fits, which it
    does)."""
    c = (
        load_table(spark, sf_dir, "embeddings")
        .select(
            "vec_id", F.col("embedding").cast("array<double>").alias("emb")
        )
        .localCheckpoint(eager=False)
    )
    x = c.select(
        "vec_id", F.posexplode("emb").alias("j0", "val")
    ).select("vec_id", (F.col("j0") + 1).alias("j"), "val")

    def step(vdf: DataFrame) -> tuple[DataFrame, DataFrame]:
        s = c.crossJoin(F.broadcast(vdf)).select(
            "vec_id", _dot(F.col("emb"), F.col("v")).alias("s")
        )
        u = (
            x.join(s, "vec_id")
            .groupBy("j")
            .agg(
                (
                    F.sum(
                        F.floor(
                            F.col("val") * F.col("s") * F.lit(float(_PCA_TICK))
                        ).cast("long")
                    ).cast("double")
                    / F.lit(float(_PCA_TICK))
                ).alias("u")
            )
        )
        v = u.agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("j", "u"))),
                lambda st: st["u"],
            ).alias("v")
        ).localCheckpoint(eager=False)
        return u, v

    vdf = spark.range(1).select(
        F.array(*[F.lit(t) for t in _PCA_V0]).alias("v")
    )
    u = None
    for _ in range(_PCA_ITERS):
        u, vdf = step(vdf)
    norm = vdf.select(
        F.sqrt(
            F.aggregate(
                F.transform("v", lambda y: y * y),
                F.lit(0.0),
                lambda a, b: a + b,
            )
        ).alias("nrm")
    )
    return (
        u.crossJoin(F.broadcast(norm))
        .select(
            F.col("j").cast("bigint").alias("dim"),
            (F.col("u") / F.col("nrm")).alias("loading"),
        )
        .orderBy("dim")
    )


@register(
    "emb_pca_residual",
    oracle=f"""
    WITH c AS MATERIALIZED (
      SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
    ),
    x AS MATERIALIZED (
      SELECT vec_id, generate_subscripts(emb, 1) AS j, unnest(emb) AS val
      FROM c
    ),
    v0 AS (SELECT {list(map(float, _PCA_V0))}::DOUBLE[] AS v),
    {",".join(_sql_pca_iter(f"v{k - 1}", k) for k in range(1, _PCA_ITERS + 1))},
    nr AS (SELECT {_SQL_PCA_NORM} AS nrm FROM v{_PCA_ITERS}),
    vhat AS (
      SELECT list_transform(v{_PCA_ITERS}.v, y -> y / nr.nrm) AS v
      FROM v{_PCA_ITERS}, nr
    ),
    scored AS (
      SELECT c.vec_id,
             {_SQL_DOT.format(a="c.emb", b="c.emb")} AS mass,
             {_SQL_DOT.format(a="c.emb", b="vhat.v")} AS s
      FROM c, vhat
    ),
    per_row AS (
      SELECT vec_id,
             CAST(FLOOR(mass * {_PCA_TICK}.0) AS BIGINT) AS mass_ticks,
             CAST(FLOOR(s * s * {_PCA_TICK}.0) AS BIGINT) AS proj_ticks
      FROM scored
    )
    SELECT COUNT(*) AS n_vecs,
           CAST(SUM(mass_ticks) AS BIGINT) AS total_mass_ticks,
           CAST(SUM(proj_ticks) AS BIGINT) AS projected_ticks,
           CAST(SUM(proj_ticks) AS DOUBLE) / SUM(mass_ticks)
             AS explained_ratio
    FROM per_row
    """,
)
def emb_pca_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance explained by the dominant principal direction — the
    ANISOTROPY number that makes emb_pca_power actionable (a healthy
    embedding space explains a few percent; a collapsed/degenerate one
    concentrates mass on one axis).  Per row, the squared projection onto
    the unit direction and the total squared norm are FLOOR-quantized to
    ticks and summed as BIGINTs (order-free exact); POWER(x, 2) is a
    plain IEEE multiply in both engines.  One double division at the end.

    Scale shape: the direction is the PCA chain's 1-row broadcast; the
    per-row pass is map-only; the reduction is one aggregate."""
    c = (
        load_table(spark, sf_dir, "embeddings")
        .select(
            "vec_id", F.col("embedding").cast("array<double>").alias("emb")
        )
        .localCheckpoint(eager=False)
    )
    loadings = emb_pca_power(spark, sf_dir)
    vhat = loadings.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "loading"))),
            lambda st: st["loading"],
        ).alias("v")
    )
    s = _dot(F.col("emb"), F.col("v"))
    mass = _dot(F.col("emb"), F.col("emb"))
    per_row = c.crossJoin(F.broadcast(vhat)).select(
        F.floor(mass * F.lit(float(_PCA_TICK)))
        .cast("long")
        .alias("mass_ticks"),
        F.floor((s * s) * F.lit(float(_PCA_TICK)))
        .cast("long")
        .alias("proj_ticks"),
    )
    return per_row.agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum("mass_ticks").alias("total_mass_ticks"),
        F.sum("proj_ticks").alias("projected_ticks"),
        (
            F.sum("proj_ticks").cast("double") / F.sum("mass_ticks")
        ).alias("explained_ratio"),
    )


# --- per-label embedding centroids (exact, fixed-point) ---------------------

_CEN_SCALE = 1_000_000  # fixed-point quantum: 1e-6 per unit


@register(
    "emb_centroid_per_label",
    oracle=f"""
    WITH u AS (
      SELECT label,
             generate_subscripts(embedding, 1) - 1 AS dim,
             unnest(embedding)::DOUBLE AS x
      FROM embeddings
    ),
    e AS (
      SELECT label, CAST(dim AS BIGINT) AS dim,
             CAST(FLOOR(x * {_CEN_SCALE} + 0.5) AS BIGINT) AS q
      FROM u
    )
    SELECT label, dim,
           COUNT(*) AS n_vecs,
           SUM(q)::BIGINT AS sum_q,
           CAST(SUM(q) AS DOUBLE) / ({_CEN_SCALE}.0 * COUNT(*)) AS centroid
    FROM e GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def emb_centroid_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class embedding centroid (the vector a drift monitor or a
    nearest-centroid classifier needs), computed EXACTLY: each coordinate is
    fixed-point quantized (floor(x·1e6 + 0.5) — half-up in both engines,
    float→double widening is exact) and summed as integers, so the result is
    independent of summation order — the property a raw double SUM lacks.
    The final centroid divides two exactly-agreed numbers once.

    Scale shape: posexplode fans each vector into |dims| rows, then one
    map-side-combinable groupBy on (label, dim) — a shuffle of
    |labels|·|dims| partial sums per task, not of the data."""
    e = load_table(spark, sf_dir, "embeddings")
    q = F.floor(F.col("x") * _CEN_SCALE + F.lit(0.5)).cast("bigint")
    return (
        e.select(
            "label",
            F.posexplode(F.col("embedding").cast("array<double>")).alias(
                "dim", "x"
            ),
        )
        .select("label", F.col("dim").cast("bigint").alias("dim"), q.alias("q"))
        .groupBy("label", "dim")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum("q").cast("bigint").alias("sum_q"),
        )
        .select(
            "label",
            "dim",
            "n_vecs",
            "sum_q",
            (
                F.col("sum_q").cast("double")
                / (F.lit(float(_CEN_SCALE)) * F.col("n_vecs"))
            ).alias("centroid"),
        )
        .orderBy("label", "dim")
    )


# --- cosine range search (threshold, multi-query) ----------------------------

_RS_TAU = 0.3  # cosine threshold
_RS_QMOD = 53  # query set: vec_id % _RS_QMOD == 0


@register(
    "ann_range_search",
    oracle=f"""
    WITH nb AS (SELECT {_DETK_BITS_SQL} AS b FROM ({_SQL_EMB_CTE})),
         c AS (SELECT vec_id, emb, nrm,
                      {_SQL_CELL_B.format(e="emb", b="nb.b")} AS cell
               FROM ({_SQL_EMB_CTE}) CROSS JOIN nb)
    SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
           round({_sql_cos("c", "q")}, 6) AS score
    FROM c q JOIN c
      ON bit_count(xor(c.cell, q.cell)) <= 1
     AND c.vec_id != q.vec_id
    WHERE q.vec_id % {_RS_QMOD} = 0
      AND {_sql_cos("c", "q")} >= {_RS_TAU}
    """,
)
def ann_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE similarity search: for every vector in a query set, ALL corpus
    neighbors with cosine ≥ τ — the retrieval primitive for threshold-based
    filtering (dedupe against a blocklist, fetch everything similar enough)
    where top-k's fixed k is wrong.  Same deterministic cell-probe contract
    as ``dedup_embedding_topk``: each query probes its own sign cell plus
    the B radius-1 flips, candidates join on cell EQUALITY, exact cosine
    verifies — so the DuckDB oracle reproduces the approximation exactly.

    Scale shape: the query side (n/{_RS_QMOD} rows × (B+1) probes) is tiny
    and broadcast; the corpus never moves — each query-probe row hash-joins
    into bounded-occupancy cells (B grows with log₂ n, see _detk_bits), so
    per-query work is (B+1)·occupancy, independent of corpus size."""
    emb = _emb(spark, sf_dir)
    bits = _detk_bits(emb.count())
    c = emb.withColumn("cell", _cell_bits(F.col("emb"), bits))
    masks = [0] + [1 << b for b in range(bits)]
    probes = (
        c.filter(F.col("vec_id") % _RS_QMOD == 0)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("emb").alias("q_emb"),
            F.col("nrm").alias("q_nrm"),
            F.explode(
                F.array(*[F.lit(m) for m in masks])
            ).alias("mask"),
            F.col("cell"),
        )
        .select(
            "q_id",
            "q_emb",
            "q_nrm",
            F.col("cell").bitwiseXOR(F.col("mask")).alias("pcell"),
        )
    )
    cos = _dot(F.col("emb"), F.col("q_emb")) / (F.col("nrm") * F.col("q_nrm"))
    return (
        c.join(
            F.broadcast(probes),
            on=[
                F.col("cell") == F.col("pcell"),
                F.col("vec_id") != F.col("q_id"),
            ],
        )
        .filter(cos >= _RS_TAU)
        .select("q_id", "vec_id", F.round(cos, 6).alias("score"))
    )


# --- ANN recall evaluation ---------------------------------------------------

_RE_QMOD = 211  # query sample: vec_id % _RE_QMOD == 0
_RE_CMOD = 3  # evaluation corpus sample: vec_id % _RE_CMOD == 0
_RE_K = 10


@register(
    "ann_recall_eval",
    oracle=f"""
    WITH c0 AS ({_SQL_EMB_CTE}),
    corpus AS MATERIALIZED (SELECT * FROM c0 WHERE vec_id % {_RE_CMOD} = 0),
    nb AS (SELECT {_DETK_BITS_SQL} AS b FROM corpus),
    cc AS MATERIALIZED (
      SELECT vec_id, emb, nrm, {_SQL_CELL_B.format(e="emb", b="nb.b")} AS cell
      FROM corpus CROSS JOIN nb
    ),
    q AS MATERIALIZED (
      SELECT vec_id AS q_id, emb, nrm,
             {_SQL_CELL_B.format(e="emb", b="nb.b")} AS cell
      FROM c0 CROSS JOIN nb WHERE vec_id % {_RE_QMOD} = 0
    ),
    scored AS MATERIALIZED (
      SELECT q.q_id, cc.vec_id, {_sql_cos("cc", "q")} AS s,
             bit_count(xor(cc.cell::BIGINT, q.cell::BIGINT)) AS hd
      FROM q JOIN cc ON cc.vec_id != q.q_id
    ),
    gt AS (SELECT q_id, vec_id FROM (
             SELECT q_id, vec_id,
                    ROW_NUMBER() OVER (PARTITION BY q_id
                                       ORDER BY s DESC, vec_id) AS rn
             FROM scored) WHERE rn <= {_RE_K}),
    ivf AS (SELECT q_id, vec_id FROM (
              SELECT q_id, vec_id,
                     ROW_NUMBER() OVER (PARTITION BY q_id
                                        ORDER BY s DESC, vec_id) AS rn
              FROM scored WHERE hd <= 1) WHERE rn <= {_RE_K}),
    h AS (SELECT gt.q_id, COUNT(*) AS hits
          FROM gt JOIN ivf ON gt.q_id = ivf.q_id AND gt.vec_id = ivf.vec_id
          GROUP BY 1)
    SELECT CAST(COALESCE(h.hits, 0) AS BIGINT) AS hits,
           COUNT(*) AS n_queries,
           CAST(MIN(q.q_id) AS BIGINT) AS min_q_id
    FROM q LEFT JOIN h ON q.q_id = h.q_id
    GROUP BY 1 ORDER BY 1
    """,
)
def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECALL@10 evaluation of the IVF sign-cell probe — the measurement
    that decides whether an ANN index is usable at all (a 0.6-recall index
    silently corrupts dedup and retrieval): for a deterministic query
    sample, exact brute-force top-10 over a 1/3-sampled evaluation
    corpus is the ground truth, the hamming≤1 cell probe's top-10 is the
    candidate, and queries are histogrammed by hit count (10 = perfect
    recall).  Identical cosine folds and (score, vec_id) tie-breaks make
    both top-10 sets bit-deterministic in both engines.

    Scale shape: ground truth is brute force ONLY over the sampled eval
    corpus and the bounded query sample (recall eval is a sampled
    measurement by design — never all-pairs over the full table); the IVF
    side filters the SAME scored relation by cell distance, so the probe's
    quality is measured against exactly the truth it must reproduce.  At
    100 TB the scored relation is a broadcast of the query sample against
    the corpus-sample partitions — one map-side pass, one top-k window."""
    emb = _emb(spark, sf_dir)
    corpus = emb.filter(F.col("vec_id") % _RE_CMOD == 0).localCheckpoint(
        eager=False
    )
    bits = _detk_bits(corpus.count())
    cc = corpus.withColumn("cell", _cell_bits(F.col("emb"), bits))
    q = (
        emb.filter(F.col("vec_id") % _RE_QMOD == 0)
        .withColumn("qcell", _cell_bits(F.col("emb"), bits))
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("emb").alias("qemb"),
            F.col("nrm").alias("qnrm"),
            "qcell",
        )
    )
    cos = _dot(F.col("emb"), F.col("qemb")) / (F.col("nrm") * F.col("qnrm"))
    hd = F.bit_count(
        F.col("cell").cast("long").bitwiseXOR(F.col("qcell").cast("long"))
    )
    scored = (
        cc.join(F.broadcast(q), F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id", "vec_id", cos.alias("s"), hd.alias("hd")
        )
        .localCheckpoint(eager=False)
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("s"), "vec_id")
    gt = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _RE_K)
        .select("q_id", "vec_id")
    )
    ivf = (
        scored.filter(F.col("hd") <= 1)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _RE_K)
        .select("q_id", "vec_id")
    )
    # both sides are (|queries| * k)-row relations derived from the same
    # checkpoint (no stats downstream of it, so Spark would pick SMJ) —
    # broadcast the probe side explicitly
    h = gt.join(F.broadcast(ivf), ["q_id", "vec_id"]).groupBy("q_id").agg(
        F.count(F.lit(1)).alias("hits")
    )
    return (
        q.select("q_id")
        .join(F.broadcast(h), "q_id", "left")
        .select(
            F.coalesce(F.col("hits"), F.lit(0)).cast("bigint").alias("hits"),
            "q_id",
        )
        .groupBy("hits")
        .agg(
            F.count(F.lit(1)).alias("n_queries"),
            F.min("q_id").cast("bigint").alias("min_q_id"),
        )
        .orderBy("hits")
    )


# --- train/test split leakage audit -----------------------------------------

_LK_TAU = 0.8  # near-dup threshold across the split boundary


@register(
    "sample_split_leakage",
    # Same capped candidate chain as dedup_containment's oracle (shared
    # non-saturated gram, df <= _DF_CAP), then exact list_intersect verify
    # on the full distinct gram lists.
    oracle=f"""
    WITH s AS MATERIALIZED (
      SELECT doc_id,
             list_distinct(
               list_transform(range(1, len(w)-1),
                              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS ng,
             CASE WHEN bucket < 80 THEN 'train'
                  WHEN bucket < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM (SELECT doc_id,
                   {_SQL_TOKENS} AS w,
                   ('0x' || substr(md5(text), 1, 8))::BIGINT % 100 AS bucket
            FROM documents)
    ),
    e AS MATERIALIZED (SELECT doc_id, unnest(ng) AS gr FROM s),
    dfq AS MATERIALIZED (SELECT gr, COUNT(*) AS df FROM e GROUP BY gr),
    lo AS MATERIALIZED (
      SELECT e.doc_id, e.gr FROM e JOIN dfq ON e.gr = dfq.gr
      WHERE dfq.df <= {_DF_CAP}
    ),
    hi AS MATERIALIZED (
      SELECT e.doc_id, e.gr FROM e JOIN dfq ON e.gr = dfq.gr
      WHERE dfq.df > {_DF_CAP}
    ),
    c AS MATERIALIZED (
      SELECT l0.a_id, l0.b_id, l0.s + COALESCE(h0.s, 0) AS shared
      FROM (SELECT x.doc_id AS a_id, y.doc_id AS b_id, COUNT(*) AS s
            FROM lo x JOIN lo y ON x.gr = y.gr AND x.doc_id < y.doc_id
            GROUP BY 1, 2) l0
      LEFT JOIN (SELECT x.doc_id AS a_id, y.doc_id AS b_id, COUNT(*) AS s
                 FROM hi x JOIN hi y ON x.gr = y.gr AND x.doc_id < y.doc_id
                 GROUP BY 1, 2) h0
      USING (a_id, b_id)
    )
    SELECT c.a_id, c.b_id, a.split AS a_split, b.split AS b_split,
           round(c.shared::DOUBLE
                 / (len(a.ng) + len(b.ng) - c.shared), 4) AS jac
    FROM c JOIN s a ON c.a_id = a.doc_id
           JOIN s b ON c.b_id = b.doc_id
    WHERE a.split <> b.split
      AND c.shared::DOUBLE / (len(a.ng) + len(b.ng) - c.shared)
            >= {_LK_TAU}
    """,
)
def sample_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-contamination audit: near-duplicate pairs (Jaccard ≥ 0.8 on
    3-gram shingles) that CROSS the deterministic train/val/test boundary —
    exactly the leakage that inflates eval numbers when a test document has
    a near-copy in training data.  Composes ``sample_split``'s content-hash
    assignment with ``dedup_ngram_jaccard``'s exact prefix-filter join; the
    cross-split filter applies after candidate verification, so the pair
    discovery is the same sound machinery.

    Scale shape: identical to dedup_ngram_jaccard (rarest-gram prefix index,
    equality-join candidates, two-phase hashed-then-exact per-pair verify)
    plus one broadcast-sized (doc_id, split) projection joined onto the
    verified pairs."""
    d = load_table(spark, sf_dir, "documents")
    d = d.filter(F.size(_tokens(F.col("text"))) >= 3)
    from lakehouse_sfc_spark.sources.loader import compute_width

    width = compute_width(spark)
    if d.rdd.getNumPartitions() < width:
        d = d.repartition(width)
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("text")), 1, 8), 16, 10).cast("long"),
        F.lit(100),
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    # tokens materialized first: inlining _tokens into _ngrams3 re-splits
    # the text per array element (O(tokens²) per doc)
    ngr = (
        d.select(
            "doc_id", _tokens(F.col("text")).alias("w"), split.alias("split")
        )
        .select("doc_id", _ngrams3(F.col("w")).alias("ng"), "split")
        .withColumn(
            "hg", F.array_distinct(F.transform("ng", lambda g: F.xxhash64(g)))
        )
        .repartition("doc_id")
        .localCheckpoint(eager=False)
    )

    cand = _prefix_candidates(ngr, _LK_TAU, symmetric=True)
    surv = _hashed_jaccard_survivors(ngr, cand, _LK_TAU)
    jac = _pair_jaccard()
    return (
        surv.join(ngr.alias("a"), F.col("a_id") == F.col("a.doc_id"))
        .join(ngr.alias("b"), F.col("b_id") == F.col("b.doc_id"))
        .filter(jac >= _LK_TAU)
        .filter(F.col("a.split") != F.col("b.split"))
        .select(
            "a_id",
            "b_id",
            F.col("a.split").alias("a_split"),
            F.col("b.split").alias("b_split"),
            F.round(jac, 4).alias("jac"),
        )
    )


# --- incremental semantic dedup: new batch vs standing corpus ---------------

_SI_MOD = 19  # vec_id % _SI_MOD == 0 plays the incoming batch


@register(
    "dedup_semantic_incremental",
    oracle=f"""
    WITH nb AS (SELECT {_DETK_BITS_SQL} AS b FROM ({_SQL_EMB_CTE})),
         c AS (SELECT vec_id, emb, nrm,
                      {_SQL_CELL_B.format(e="emb", b="nb.b")} AS cell
               FROM ({_SQL_EMB_CTE}) CROSS JOIN nb),
         bt AS (SELECT * FROM c WHERE vec_id % {_SI_MOD} = 0),
         k  AS (SELECT * FROM c WHERE vec_id % {_SI_MOD} <> 0),
         m AS (
           SELECT bt.vec_id AS b_id, k.vec_id AS k_id,
                  {_sql_cos("k", "bt")} AS score
           FROM bt JOIN k ON bit_count(xor(k.cell, bt.cell)) <= 1
           WHERE {_sql_cos("k", "bt")} >= {_COS_TAU}
         ),
         agg AS (
           SELECT b_id, COUNT(*) AS n_matches,
                  -- order-SENSITIVE aggregate: argmax by (score, lowest id).
                  -- MIN(x ORDER BY ...) is a no-op in DuckDB (MIN is
                  -- order-insensitive); first() honors the ORDER BY.
                  first(k_id ORDER BY score DESC, k_id) AS best_id,
                  round(MAX(score), 6) AS best_score
           FROM m GROUP BY b_id
         )
    SELECT bt.vec_id AS b_id,
           COALESCE(agg.n_matches, 0) AS n_matches,
           agg.best_id, agg.best_score,
           (agg.b_id IS NOT NULL) AS is_dup
    FROM bt LEFT JOIN agg ON bt.vec_id = agg.b_id
    ORDER BY b_id
    """,
)
def dedup_semantic_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL semantic dedup — the production ingest shape for
    embeddings: an incoming batch (vec_id % {mod} == 0) is checked against
    the standing corpus for near-duplicates (cosine ≥ τ), emitting per new
    vector its match count, best-matching corpus vector, and a keep/drop
    verdict.  The batch-vs-corpus asymmetry is the same as
    ``dedup_incremental``'s: the corpus is never self-joined.

    Scale shape: the small batch explodes its radius-1 cell probes and
    BROADCASTS; the corpus streams through a cell-equality hash join with
    bounded occupancy (B from _detk_bits), so per-ingest cost is
    |batch|·(B+1)·occupancy regardless of corpus size.  Deterministic
    best-match: max (score, then lowest vec_id) — both engines pick
    identically on exact doubles."""
    emb = _emb(spark, sf_dir)
    bits = _detk_bits(emb.count())
    c = emb.withColumn("cell", _cell_bits(F.col("emb"), bits))
    batch = c.filter(F.col("vec_id") % _SI_MOD == 0)
    corpus = c.filter(F.col("vec_id") % _SI_MOD != 0)
    masks = [0] + [1 << b for b in range(bits)]
    probes = batch.select(
        F.col("vec_id").alias("b_id"),
        F.col("emb").alias("b_emb"),
        F.col("nrm").alias("b_nrm"),
        F.explode(F.array(*[F.lit(m) for m in masks])).alias("mask"),
        F.col("cell"),
    ).select(
        "b_id",
        "b_emb",
        "b_nrm",
        F.col("cell").bitwiseXOR(F.col("mask")).alias("pcell"),
    )
    score = _dot(F.col("emb"), F.col("b_emb")) / (
        F.col("nrm") * F.col("b_nrm")
    )
    m = (
        corpus.join(F.broadcast(probes), F.col("cell") == F.col("pcell"))
        .select("b_id", F.col("vec_id").alias("k_id"), score.alias("score"))
        .filter(F.col("score") >= _COS_TAU)
    )
    agg = m.groupBy("b_id").agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.max(
            F.struct(F.col("score"), (-F.col("k_id")).alias("neg_id"))
        ).alias("best"),
    )
    return (
        batch.select(F.col("vec_id").alias("b_id"))
        .join(agg, "b_id", "left")
        .select(
            "b_id",
            F.coalesce(F.col("n_matches"), F.lit(0)).alias("n_matches"),
            (-F.col("best.neg_id")).cast("bigint").alias("best_id"),
            F.round(F.col("best.score"), 6).alias("best_score"),
            F.col("n_matches").isNotNull().alias("is_dup"),
        )
        .orderBy("b_id")
    )


# --- embedding norm distribution --------------------------------------------


@register(
    "emb_norm_histogram",
    oracle=f"""
    WITH c AS ({_SQL_EMB_CTE})
    SELECT CAST(FLOOR(nrm * 10.0) AS BIGINT) AS norm_decile,
           COUNT(*) AS n_vecs,
           MIN(vec_id) AS min_vec_id
    FROM c GROUP BY 1 ORDER BY 1
    """,
)
def emb_norm_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding L2-norm distribution in 0.1-wide buckets — the sanity
    check before any cosine-based pipeline (zero-norm and outlier-norm
    vectors break normalization and distort ANN cell geometry).  The norm
    is sqrt of the deterministic left-to-right dot fold; IEEE sqrt is
    correctly rounded in both engines, and the only other operation is a
    floor-truncated scaling.

    Scale shape: map-only norm + one tiny-keyed histogram aggregation."""
    c = _emb(spark, sf_dir)
    return (
        c.groupBy(
            F.floor(F.col("nrm") * 10.0).cast("bigint").alias("norm_decile")
        )
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.min("vec_id").alias("min_vec_id"),
        )
        .orderBy("norm_decile")
    )


# --- temporal train/eval split ----------------------------------------------

_TS_CUTOFF = "1995-06-01 00:00:00"


@register(
    "sample_temporal_split",
    oracle=f"""
    WITH s AS (
      SELECT user_id, event_id,
             CASE WHEN ts < TIMESTAMP '{_TS_CUTOFF}'
                  THEN 'train' ELSE 'eval' END AS split
      FROM events
    ),
    spanning AS (
      SELECT user_id FROM s GROUP BY user_id
      HAVING COUNT(DISTINCT split) = 2
    )
    SELECT split,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           SUM(event_id)::BIGINT AS id_checksum,
           (SELECT COUNT(*) FROM spanning) AS n_spanning_users
    FROM s GROUP BY split ORDER BY split
    """,
)
def sample_temporal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPORAL train/eval split — the split a forecasting or
    recommendation pipeline must use (random splits leak the future into
    training): events strictly before the cutoff train, the rest evaluate.
    Alongside the per-side counts and membership checksum it reports
    n_spanning_users — users with events on BOTH sides, the population
    whose train-side history makes eval-side predictions non-cold-start
    (and the one to audit for feature leakage).

    Scale shape: map-only split tag + one keyed agg; the spanning-user
    count is a second aggregate on the (user, split) pair relation,
    broadcast back as a 1-row scalar."""
    ev = load_table(spark, sf_dir, "events")
    split = F.when(
        F.col("ts") < F.lit(_TS_CUTOFF).cast("timestamp_ntz"), "train"
    ).otherwise("eval")
    s = ev.select("user_id", "event_id", split.alias("split"))
    spanning = (
        s.groupBy("user_id")
        .agg(F.count_distinct("split").alias("k"))
        .filter(F.col("k") == 2)
        .agg(F.count(F.lit(1)).alias("n_spanning_users"))
    )
    return (
        s.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
            F.sum("event_id").cast("bigint").alias("id_checksum"),
        )
        .crossJoin(F.broadcast(spanning))
        .orderBy("split")
    )


# --- event-type transition matrix -------------------------------------------


@register(
    "a_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS next_type
      FROM events
    ),
    c AS (
      SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS cnt
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    ),
    t AS (SELECT from_type, SUM(cnt) AS row_n FROM c GROUP BY 1)
    SELECT c.from_type, c.to_type, c.cnt,
           round(c.cnt::DOUBLE / t.row_n, 6) AS p
    FROM c JOIN t ON c.from_type = t.from_type
    ORDER BY c.from_type, c.to_type
    """,
)
def a_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order behavioural transition matrix: P(next event type |
    current), from per-user LEAD pairs — the input to funnel diagnosis,
    next-action models, and anomalous-flow alerts.  Counts are exact; each
    probability is one double division.

    Scale shape: one user_id shuffle for the window, then two
    map-side-combinable aggregations on the 25-cell key space; the
    row-total join is a broadcast of |event types| rows."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    c = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    t = c.groupBy("from_type").agg(F.sum("cnt").alias("row_n"))
    return (
        c.join(F.broadcast(t), "from_type")
        .select(
            "from_type",
            "to_type",
            "cnt",
            F.round(
                F.col("cnt").cast("double") / F.col("row_n"), 6
            ).alias("p"),
        )
        .orderBy("from_type", "to_type")
    )


# --- product quantization ANN (ADC) -----------------------------------------

_PQ_M = 4  # subspaces
_PQ_SUB = 16  # dims per subspace (embeddings are 64-dim)
_PQ_K = 16  # codes per sub-codebook (model hyperparameter, not data-sized)
_PQ_SHORTLIST_MIN = 100  # exact re-rank pool floor
_PQ_SHORTLIST_FRAC = 10  # ... or n/10, whichever is larger


def _pq_oracle_sql() -> str:
    """Generate the per-subspace CTE chain: slice → seed → 1 Lloyd pass →
    encode → query LUT, then ADC-join the m code columns to the m LUTs."""
    parts = [f"WITH c AS ({_SQL_EMB_CTE})"]
    for s in range(_PQ_M):
        lo, hi = _PQ_SUB * s + 1, _PQ_SUB * (s + 1)
        l2_ts = _SQL_L2.format(a="t.e", b="s.ce")
        l2_tk = _SQL_L2.format(a="t.e", b="k.ce")
        l2_qk = _SQL_L2.format(a="q.e", b="k.ce")
        parts.append(f"""
    sub{s} AS (SELECT vec_id, emb[{lo}:{hi}] AS e FROM c),
    seed{s} AS (SELECT vec_id AS cid, e AS ce FROM sub{s}
                WHERE vec_id < {_PQ_K}),
    a{s} AS (SELECT vec_id, cid, e FROM (
        SELECT t.vec_id, s.cid, t.e,
               ROW_NUMBER() OVER (PARTITION BY t.vec_id
                 ORDER BY {l2_ts}, s.cid) AS rn
        FROM sub{s} t, seed{s} s) z WHERE rn = 1),
    pd{s} AS (SELECT cid, pos,
                     CAST(SUM(CAST(x AS DECIMAL(18,9))) AS DOUBLE)
                       / COUNT(*) AS m
              FROM (SELECT cid, UNNEST(e) AS x,
                           UNNEST(range(1, len(e)+1)) AS pos FROM a{s}) u
              GROUP BY 1, 2),
    cent{s} AS (SELECT cid, list(m ORDER BY pos) AS ce
                FROM pd{s} GROUP BY cid),
    code{s} AS (SELECT vec_id, cid AS code FROM (
        SELECT t.vec_id, k.cid,
               ROW_NUMBER() OVER (PARTITION BY t.vec_id
                 ORDER BY {l2_tk}, k.cid) AS rn
        FROM sub{s} t, cent{s} k) z WHERE rn = 1),
    lut{s} AS (SELECT k.cid, {l2_qk} AS d
               FROM cent{s} k,
                    (SELECT e FROM sub{s} WHERE vec_id = {_ANN_QUERY_ID}) q)""")
    joins = " ".join(
        f"JOIN code{s} c{s} ON c0.vec_id = c{s}.vec_id" for s in range(1, _PQ_M)
    )
    lut_joins = " ".join(
        f"JOIN lut{s} l{s} ON c{s}.code = l{s}.cid" for s in range(_PQ_M)
    )
    adc = " + ".join(f"l{s}.d" for s in range(_PQ_M))
    l2_exact = _SQL_L2.format(a="fc.emb", b="fq.qe")
    return (
        ",".join(parts)
        + f""",
    nshort AS (SELECT GREATEST({_PQ_SHORTLIST_MIN},
                 CAST(CEIL(COUNT(*) / {_PQ_SHORTLIST_FRAC}.0) AS INT)) AS cc
               FROM c),
    adc AS (
      SELECT c0.vec_id AS vec_id, {adc} AS adc
      FROM code0 c0 {joins} {lut_joins}
      WHERE c0.vec_id != {_ANN_QUERY_ID}
    ),
    short AS (
      SELECT z.vec_id FROM (
        SELECT vec_id, ROW_NUMBER() OVER (ORDER BY adc, vec_id) AS rn
        FROM adc) z, nshort WHERE z.rn <= nshort.cc
    )
    SELECT s.vec_id AS vec_id, round({l2_exact}, 6) AS l2_exact
    FROM short s
    JOIN c fc ON s.vec_id = fc.vec_id,
         (SELECT emb AS qe FROM c WHERE vec_id = {_ANN_QUERY_ID}) fq
    ORDER BY {l2_exact}, s.vec_id
    LIMIT {_ANN_K}
    """
    )


@register("ann_pq_topk", oracle=_pq_oracle_sql())
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCT QUANTIZATION ANN (the FAISS IVF-PQ building block): each
    64-dim vector splits into {m} 16-dim subvectors, each quantized to a
    {k}-entry sub-codebook (seeded from the first {k} vectors, one
    exact-arithmetic Lloyd pass — the ``ann_ivf_kmeans_topk`` recipe per
    subspace), so a vector compresses to {m} bytes.  The query scores
    candidates with ASYMMETRIC DISTANCE COMPUTATION: a {m}×{k} lookup
    table of exact query-subvector→sub-centroid distances, summed in a
    FIXED left-to-right expression (never a row-order-dependent SUM), so
    both engines produce bit-identical ADC scores — then the ADC top
    max(100, n/10) shortlist is RE-RANKED with exact L2, the standard
    FAISS two-stage contract (coarse compressed scan → exact refinement);
    measured shortlist recall on this near-random synthetic corpus is
    1.0 at sf0.01 and 0.8 at sf0.1 vs the exact top-k (clustered real
    embeddings fare better — ADC distortion here is the corpus's lack of
    structure, asserted as a floor in tests/test_ivf.py).

    Scale shape: codebooks and LUTs are tiny broadcasts; encode is a
    map-side min_by per subspace; ADC ranks a narrow (vec_id, {m} codes)
    relation with TakeOrderedAndProject, and only the shortlist rows ever
    rejoin the full vectors.  At 100 TB the codebooks would be trained once
    on a sample and the LUT inlined as a literal expression — this
    declarative twin is the oracle-matched correctness contract.

    Plan shape (r10 verdict task 4): the {m} subspaces run as ONE exploded
    relation (vec_id, s, subvector) through ONE assign/centroid/reassign
    chain keyed by (vec_id, s) — ~5 shuffles total — rather than {m}
    independent per-subspace pipelines re-joined on vec_id (~4x the stages
    and the sweep's slowest entry at 12.6 s).  The arithmetic is unchanged
    expression-for-expression (same decimal centroid means, same min_by
    tie-break, same fixed-order d0+d1+d2+d3 ADC sum), so the oracle match
    is bit-exact as before."""
    from lakehouse_sfc_spark.sources.loader import compute_width

    # Round 13 (r12 verdict task 2): the valid-vector relation is
    # checkpointed once (it previously fed sub/seeds/qs/qfull as separate
    # scans), the two per-subspace assignment passes run in
    # ``_nearest_centroid_kernel`` over driver-collected codebooks, and the
    # ADC scoring is ONE vectorized map pass (`_pq_adc` below) that encodes
    # and table-looks-up all {m} subspaces per vector — replacing the
    # codes explode + broadcast LUT join over 4n rows + pivot groupBy
    # exchange (guide §2.4/§4.2).  Every double op keeps the JVM fold's
    # left-to-right order, so scores are bit-identical.
    c = materialize_once(_emb(spark, sf_dir), compute_width(spark))
    n = c.count()
    # (vec_id, s, e): every vector's M subvectors as one relation.
    sub = c.select(
        "vec_id",
        F.posexplode(
            F.array(
                *[
                    F.slice(F.col("emb"), _PQ_SUB * s + 1, _PQ_SUB)
                    for s in range(_PQ_M)
                ]
            )
        ).alias("s", "e"),
    )
    seed_book = _collect_codebook(
        sub.filter(F.col("vec_id") < _PQ_K).collect(), "s", "vec_id", "e"
    )
    # per (vector, subspace): nearest sub-centroid of the SAME subspace,
    # ties to the lowest cid (== min_by(cid, struct(d, cid)))
    a1 = sub.mapInArrow(
        _nearest_centroid_kernel(seed_book),
        "vec_id long, s int, e array<double>, cid long",
    )
    cent = (
        a1.select("s", "cid", F.posexplode("e").alias("pos", "x"))
        .groupBy("s", "cid", "pos")
        .agg(
            (
                F.sum(F.col("x").cast("decimal(18,9)")).cast("double")
                / F.count(F.lit(1))
            ).alias("m")
        )
        .groupBy("s", "cid")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("m")))
                ),
                lambda st: st["m"],
            ).alias("ce")
        )
    )
    cent_book = _collect_codebook(cent.collect(), "s", "cid", "ce")
    qrows = c.filter(F.col("vec_id") == _ANN_QUERY_ID).select("emb").collect()
    if not qrows:
        return spark.createDataFrame([], "vec_id bigint, l2_exact double")
    qe = list(qrows[0]["emb"])
    # Driver-side ADC lookup table: exact sub-centroid -> query-subvector
    # distances, the same fold the old broadcast-LUT join computed.
    lut = {
        s: {
            int(cids[i]): _py_l2(cmat[i], qe[_PQ_SUB * s: _PQ_SUB * (s + 1)])
            for i in range(len(cids))
        }
        for s, (cids, cmat) in cent_book.items()
    }

    def _pq_adc(batches):
        """(vec_id, emb) -> (vec_id, adc): encode all subspaces and sum the
        LUT distances in the FIXED d0+d1+d2+d3 order (never a
        row-order-dependent SUM)."""
        import numpy as np
        import pyarrow as pa

        for rb in batches:
            if len(rb) == 0:
                continue
            E = _rows_matrix(rb.column("emb"), width=_PQ_SUB * _PQ_M)
            terms = []
            for s in range(_PQ_M):
                cids, C = cent_book[s]
                sl = E[:, _PQ_SUB * s: _PQ_SUB * (s + 1)]
                D = np.zeros((len(E), len(cids)), dtype=np.float64)
                for j in range(C.shape[1]):
                    diff = sl[:, j, None] - C[None, :, j]
                    D = D + diff * diff
                best = D.argmin(axis=1)
                dv = np.array(
                    [lut[s][int(cid)] for cid in cids], dtype=np.float64
                )
                terms.append(dv[best])
            adc = terms[0]
            for t in terms[1:]:
                adc = adc + t
            yield pa.RecordBatch.from_arrays(
                [rb.column("vec_id"), pa.array(adc, pa.float64())],
                names=["vec_id", "adc"],
            )

    shortlist = max(_PQ_SHORTLIST_MIN, -(-n // _PQ_SHORTLIST_FRAC))
    short = (
        c.select("vec_id", "emb")
        .mapInArrow(_pq_adc, "vec_id long, adc double")
        .filter(F.col("vec_id") != _ANN_QUERY_ID)
        .orderBy("adc", "vec_id")
        .limit(shortlist)
        .select("vec_id")
    )
    qe_lit = F.array(*[F.lit(v) for v in qe])
    l2x = _l2(F.col("emb"), qe_lit)
    return (
        c.join(F.broadcast(short), "vec_id")
        .select("vec_id", l2x.alias("l2"))
        .orderBy("l2", "vec_id")
        .limit(_ANN_K)
        .select("vec_id", F.round(F.col("l2"), 6).alias("l2_exact"))
    )


# --- dedup-aware sampling weights -------------------------------------------


@register(
    "sample_dedup_weights",
    oracle="""
    WITH c AS (
      SELECT doc_id, source,
             COUNT(*) OVER (PARTITION BY md5(text)) AS sz
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN sz = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unique,
           CAST(SUM(CAST(1.0 / sz AS DECIMAL(18,12))) AS DOUBLE)
             AS effective_docs
    FROM c GROUP BY source ORDER BY source
    """,
)
def sample_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-AWARE sampling weights: each document weighs 1/|its exact-dup
    cluster|, so a source's 'effective_docs' is its deduplicated mass —
    the number a training-mix designer should weigh sources by instead of
    raw counts (raw counts over-reward boilerplate-heavy sources).  Each
    1/sz term is one deterministic IEEE division; the SUM routes through
    DECIMAL(18,12) (the repo-wide dsum discipline) so the total is
    order-independent and bit-identical across engines — a raw double SUM
    here would be the exact round-4 failure class.

    Scale shape: one hash-window (equivalently a groupBy+join) on the
    content key, then a per-source reduce."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5("text"))
    c = d.select(
        "doc_id", "source", F.count(F.lit(1)).over(w).alias("sz")
    )
    return (
        c.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("sz") == 1, 1).otherwise(0)).alias("n_unique"),
            F.sum((F.lit(1.0) / F.col("sz")).cast("decimal(18,12)"))
            .cast("double")
            .alias("effective_docs"),
        )
        .orderBy("source")
    )


# --- ANN cell-occupancy diagnostics -----------------------------------------


@register(
    "emb_cell_occupancy",
    oracle=f"""
    WITH nb AS (SELECT {_DETK_BITS_SQL} AS b FROM ({_SQL_EMB_CTE})),
         c AS (SELECT vec_id,
                      {_SQL_CELL_B.format(e="emb", b="nb.b")} AS cell
               FROM ({_SQL_EMB_CTE}) CROSS JOIN nb),
         occ AS (SELECT cell, COUNT(*) AS n FROM c GROUP BY 1)
    SELECT n AS occupancy,
           COUNT(*) AS n_cells,
           (n * COUNT(*))::BIGINT AS n_vecs
    FROM occ GROUP BY 1 ORDER BY 1
    """,
)
def emb_cell_occupancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-cell OCCUPANCY histogram — the observability for the ANN cell
    machinery: per-cell vector counts under the data-scaled bit count
    (_detk_bits), histogrammed.  A healthy index shows occupancy
    concentrated near the design target (≈1 here); a fat tail means probe
    candidate volume is growing superlinearly — exactly the round-4
    dedup_embedding_topk failure mode, now monitorable as a query.

    Scale shape: map-only cell assignment + two tiny keyed aggregations."""
    emb = _emb(spark, sf_dir)
    bits = _detk_bits(emb.count())
    occ = (
        emb.select(_cell_bits(F.col("emb"), bits).alias("cell"))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        occ.groupBy(F.col("n").alias("occupancy"))
        .agg(F.count(F.lit(1)).alias("n_cells"))
        .select(
            "occupancy",
            "n_cells",
            (F.col("occupancy") * F.col("n_cells")).cast("bigint").alias("n_vecs"),
        )
        .orderBy("occupancy")
    )


# --- class-balanced downsampling ----------------------------------------------


@register(
    "sample_balanced_classes",
    oracle="""
    WITH src AS (
      SELECT vec_id, label FROM embeddings WHERE label IS NOT NULL
    ),
    sizes AS (SELECT label, COUNT(*) AS n FROM src GROUP BY label),
    quota AS (SELECT MIN(n) AS q FROM sizes),
    ranked AS (
      SELECT vec_id, label,
             ROW_NUMBER() OVER (PARTITION BY label
                                ORDER BY md5(CAST(vec_id AS VARCHAR)),
                                         vec_id) AS rn
      FROM src
    )
    SELECT r.label,
           CAST(s.n AS BIGINT) AS n_total,
           COUNT(*) AS n_kept,
           CAST(SUM(r.vec_id) AS BIGINT) AS id_checksum
    FROM ranked r JOIN sizes s ON r.label = s.label CROSS JOIN quota
    WHERE r.rn <= quota.q
    GROUP BY r.label, s.n ORDER BY r.label
    """,
)
def sample_balanced_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLASS-BALANCED downsampling — the rebalance step before training a
    classifier on skewed labels: every class keeps exactly
    min-class-count rows, selected by a deterministic content-free hash
    rank (md5 of the id — stable across runs, engines, and re-shards,
    unlike rand()-based samplers), so the kept set is reproducible and
    auditable (the per-class id_checksum pins exact membership, not just
    counts).  NULL labels are excluded: unlabeled rows are not a class
    to balance against.

    Scale shape: one count per class (map-side combined), the min-quota
    scalar broadcast (1-row), and one rank window per class — the window
    shuffles (vec_id, label) pairs only, never payloads; at 100 TB the
    kept ids join back to the wide table as a broadcast/bucketed semi
    join."""
    e = load_table(spark, sf_dir, "embeddings").filter(
        F.col("label").isNotNull()
    )
    src = e.select("vec_id", "label")
    sizes = src.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    quota = sizes.agg(F.min("n").alias("q"))
    w = Window.partitionBy("label").orderBy(
        F.md5(F.col("vec_id").cast("string")), "vec_id"
    )
    ranked = src.withColumn("rn", F.row_number().over(w))
    return (
        ranked.crossJoin(F.broadcast(quota))
        .filter(F.col("rn") <= F.col("q"))
        .join(F.broadcast(sizes), "label")
        .groupBy("label", "n")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("vec_id").cast("bigint").alias("id_checksum"),
        )
        .select(
            "label",
            F.col("n").cast("bigint").alias("n_total"),
            "n_kept",
            "id_checksum",
        )
        .orderBy("label")
    )


@register(
    "text_ngram_novelty",
    oracle=f"""
    WITH g AS MATERIALIZED ({_SQL_NGRAMS_VIEW}),
    occ AS MATERIALIZED (
      SELECT doc_id, source, unnest(ng) AS gr FROM g WHERE len(ng) >= 1
    ),
    first AS (SELECT gr, MIN(doc_id) AS first_doc FROM occ GROUP BY gr),
    per_doc AS (
      SELECT o.doc_id, o.source,
             COUNT(*) AS n_ng,
             SUM(CASE WHEN f.first_doc = o.doc_id THEN 1 ELSE 0 END)
                 AS n_novel
      FROM occ o JOIN first f ON f.gr = o.gr
      GROUP BY 1, 2
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_ng) AS BIGINT) AS total_ngrams,
           CAST(SUM(n_novel) AS BIGINT) AS total_novel,
           MIN(CAST(n_novel AS DOUBLE) / n_ng) AS min_novelty,
           MAX(CAST(n_novel AS DOUBLE) / n_ng) AS max_novelty
    FROM per_doc GROUP BY source ORDER BY source NULLS LAST
    """,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram NOVELTY — the fraction of a doc's distinct
    3-grams whose FIRST corpus occurrence (by min doc_id, the ingestion
    order) is the doc itself: the streaming-ingest view of near-duplicate
    mass (a late crawl of boilerplate scores ~0, the first copy scores 1)
    and the memorization-risk proxy pretraining curation tracks
    (repeated-passage counting à la Lee et al. 2022 'Deduplicating
    Training Data Makes Language Models Better').  Exact integer counts
    per doc + ONE double division, reduced by MIN/MAX (order-free).

    Scale shape: ONE traversal of the exploded gram relation — it is
    hash-clustered on the gram key once, collapsed to per-(gram, doc)
    occurrence counts in place (no exchange: HashPartitioning(gr)
    satisfies the superset grouping key), and first-occurrence is a
    co-partitioned window MIN over the collapsed relation (sort only,
    no exchange, no join back).  The only later shuffle moves the
    distinct (gram, doc) pairs, not the raw occurrences.  At 100 TB the
    gram relation is materialized exactly once — no broadcast of
    data-sized state, no window over the raw corpus."""
    from pyspark.sql import Window

    from lakehouse_sfc_spark.sources.loader import compute_width

    d = load_table(spark, sf_dir, "documents")
    # the gram build is the heavy projection; a small-file scan (one row
    # group) would run ALL of it — plus the size(ng) > 0 filter
    # InferFiltersFromGenerate pushes below the explode — on one core, so
    # exchange the raw rows to full width first (no-op at 100 TB where the
    # scan is already wide; same rule as _docs_ngrams)
    width = compute_width(spark)
    if d.rdd.getNumPartitions() < width:
        d = d.repartition(width)
    # materialize the token array in its own projection BEFORE the gram
    # lambda (round 12: _ngrams3 is slice+zip_with, linear even when the
    # optimizer inlines w — the projection barrier is now belt-and-braces)
    toks = d.select("doc_id", "source", _tokens(F.col("text")).alias("w"))
    # hash-cluster the exploded gram relation ONCE at core-count width (not
    # the session's 200): the per-(gram, doc) collapse AND the first-doc
    # window are then co-partitioned — same discipline as text_token_df_score
    occ = toks.select(
        "doc_id",
        "source",
        F.explode(_ngrams3(F.col("w"))).alias("gr"),
    ).repartition(compute_width(spark), "gr")
    gd = occ.groupBy("gr", "doc_id", "source").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    gd = gd.withColumn(
        "first_doc", F.min("doc_id").over(Window.partitionBy("gr"))
    )
    per_doc = gd.groupBy("doc_id", "source").agg(
        F.sum("cnt").alias("n_ng"),
        F.sum(
            F.when(F.col("first_doc") == F.col("doc_id"), F.col("cnt"))
            .otherwise(F.lit(0))
        ).alias("n_novel"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_ng").cast("bigint").alias("total_ngrams"),
            F.sum("n_novel").cast("bigint").alias("total_novel"),
            F.min(F.col("n_novel").cast("double") / F.col("n_ng")).alias(
                "min_novelty"
            ),
            F.max(F.col("n_novel").cast("double") / F.col("n_ng")).alias(
                "max_novelty"
            ),
        )
        .orderBy(F.col("source").asc_nulls_last())
    )


_KNNEVAL_NQ = 300  # FIXED eval budget: hash-ordered first 300 labeled vecs
_KNNEVAL_CMOD = 3  # neighbor corpus: labeled vectors with vec_id % 3 == 0
_KNNEVAL_K = 10


@register(
    "ann_knn_label_eval",
    oracle=f"""
    WITH c0 AS ({_SQL_EMB_CTE}),
    lbl AS (SELECT vec_id, label FROM embeddings WHERE label IS NOT NULL),
    valid AS MATERIALIZED (
      SELECT c0.vec_id, c0.emb, c0.nrm, lbl.label
      FROM c0 JOIN lbl ON lbl.vec_id = c0.vec_id
    ),
    corpus AS MATERIALIZED (
      SELECT * FROM valid WHERE vec_id % {_KNNEVAL_CMOD} = 0
    ),
    q AS MATERIALIZED (
      SELECT vec_id AS q_id, emb, nrm, label AS true_label
      FROM valid
      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {_KNNEVAL_NQ}
    ),
    topk AS (
      SELECT q_id, true_label, label FROM (
        SELECT q.q_id, q.true_label, c.label,
               ROW_NUMBER() OVER (PARTITION BY q.q_id
                                  ORDER BY {_sql_cos("c", "q")} DESC,
                                           c.vec_id) AS rn
        FROM q JOIN corpus c ON c.vec_id != q.q_id
      ) WHERE rn <= {_KNNEVAL_K}
    ),
    votes AS (
      SELECT q_id, true_label, label, COUNT(*) AS c
      FROM topk GROUP BY 1, 2, 3
    ),
    pred AS (
      SELECT q_id, true_label, label AS pred_label FROM (
        SELECT q_id, true_label, label,
               ROW_NUMBER() OVER (PARTITION BY q_id
                                  ORDER BY c DESC, label) AS rn
        FROM votes
      ) WHERE rn = 1
    )
    SELECT true_label,
           COUNT(*) AS n_eval,
           CAST(SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
               AS BIGINT) AS n_correct,
           CAST(SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
               AS DOUBLE) / COUNT(*) AS accuracy
    FROM pred GROUP BY true_label ORDER BY true_label
    """,
)
def ann_knn_label_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out kNN CLASSIFICATION eval over the embedding space —
    the standard embedding-quality probe (a representation whose k=10
    cosine neighborhood can't predict the label is not ready for
    retrieval or clustering): for a FIXED-BUDGET eval set (the first
    300 labeled vectors in md5-hash order — a deterministic unbiased
    draw whose SIZE does not grow with the corpus, the way a production
    eval harness pins its query budget), majority label of the 10
    nearest labeled corpus neighbors (1/3 sample, self excluded),
    per-class accuracy.  Identical left-to-right cosine folds and
    (score, vec_id) / (votes, label) tie-breaks make prediction
    bit-deterministic in both engines.

    Scale shape: eval cost is O(budget x corpus) = LINEAR in the corpus
    (round 7's 1/7-fraction sample made it quadratic — the sf1 sweep
    measured a 100x step for 10x data and forced this redesign): one
    TakeOrdered for the hash-budget draw, one broadcast of the 300-row
    query block, one map-side score pass, one top-k window.  The
    full-corpus path is the IVF/PQ family; this entry is the harness
    that grades it."""
    e = load_table(spark, sf_dir, "embeddings")
    valid = _emb(spark, sf_dir).join(
        e.filter(F.col("label").isNotNull()).select("vec_id", "label"),
        "vec_id",
    )
    corpus = valid.filter(F.col("vec_id") % _KNNEVAL_CMOD == 0)
    # fixed eval budget: TakeOrdered by (md5(vec_id), vec_id) — a
    # deterministic unbiased draw whose size does NOT grow with the corpus
    q = (
        valid.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(_KNNEVAL_NQ)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("emb").alias("qemb"),
            F.col("nrm").alias("qnrm"),
            F.col("label").alias("true_label"),
        )
    )
    cos = _dot(F.col("emb"), F.col("qemb")) / (F.col("nrm") * F.col("qnrm"))
    w = Window.partitionBy("q_id").orderBy(F.desc("s"), "vec_id")
    topk = (
        corpus.join(F.broadcast(q), F.col("vec_id") != F.col("q_id"))
        .select("q_id", "true_label", "label", "vec_id", cos.alias("s"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _KNNEVAL_K)
    )
    votes = topk.groupBy("q_id", "true_label", "label").agg(
        F.count(F.lit(1)).alias("c")
    )
    wv = Window.partitionBy("q_id").orderBy(F.desc("c"), "label")
    pred = (
        votes.withColumn("rn", F.row_number().over(wv))
        .filter(F.col("rn") == 1)
        .select("q_id", "true_label", F.col("label").alias("pred_label"))
    )
    hit = F.when(F.col("pred_label") == F.col("true_label"), 1).otherwise(0)
    return (
        pred.groupBy("true_label")
        .agg(
            F.count(F.lit(1)).alias("n_eval"),
            F.sum(hit).cast("bigint").alias("n_correct"),
            (F.sum(hit).cast("double") / F.count(F.lit(1))).alias(
                "accuracy"
            ),
        )
        .orderBy("true_label")
    )


@register(
    "sample_group_holdout",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, value FROM events WHERE user_id IS NOT NULL
    ),
    b AS (
      SELECT user_id, event_id, value,
             CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                       ::BIGINT % 10 < 8
                  THEN 'train' ELSE 'test' END AS split
      FROM e
    ),
    straddle AS (
      SELECT COUNT(*) AS n FROM (
        SELECT user_id FROM b GROUP BY user_id
        HAVING COUNT(DISTINCT split) > 1
      )
    )
    SELECT split,
           COUNT(*) AS n_rows,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_groups,
           CAST(SUM(event_id) AS BIGINT) AS id_checksum,
           (SELECT CAST(n AS BIGINT) FROM straddle) AS straddling_groups
    FROM b GROUP BY split ORDER BY split
    """,
)
def sample_group_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP holdout split (sklearn GroupKFold / GroupShuffleSplit
    semantics): the 80/20 train/test assignment hashes the GROUP key
    (user), not the row, so EVERY event of a user lands in one split —
    the leakage rule for user-generated training data (row-hash splits
    leak a user's near-identical events across the boundary and inflate
    eval scores; sibling of sample_split's content-hash and
    sample_temporal_split's time cut).  The output carries the proof
    obligation: ``straddling_groups`` — users observed in both splits —
    is computed from the assignment itself and must be 0, and the
    id_checksum pins exact membership.

    Scale shape: the assignment is a map-only expression on the group
    key (no join against a membership table — the hash IS the
    membership), one groupBy for the summary, one for the straddle
    audit; re-shards, late data and re-runs can never move a user."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    split = F.when(
        F.pmod(_h32(F.col("user_id").cast("string")), F.lit(10)) < 8,
        "train",
    ).otherwise("test")
    b = ev.select("user_id", "event_id", "value", split.alias("split"))
    straddle = (
        b.groupBy("user_id")
        .agg(F.count_distinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        b.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct("user_id").cast("bigint").alias("n_groups"),
            F.sum("event_id").cast("bigint").alias("id_checksum"),
        )
        .crossJoin(F.broadcast(straddle.select(
            F.col("n").cast("bigint").alias("straddling_groups")
        )))
        .orderBy("split")
    )


# --- deterministic random projection (Johnson-Lindenstrauss sketch) ----------

_RP_DIMS = 16
_RP_TICK = 1_000_000


@register(
    "emb_random_projection",
    oracle=f"""
    WITH c AS ({_SQL_EMB_CTE}),
    t AS MATERIALIZED (
        SELECT vec_id, i.i AS i,
               CAST(FLOOR(emb[i.i + 1] * {_RP_TICK}) AS BIGINT) AS t
        FROM c, LATERAL (SELECT unnest(range(0, len(emb))) AS i) i),
    y AS MATERIALIZED (
        SELECT vec_id, j.j AS j,
               CAST(SUM(CASE WHEN ('0x' || substr(
                            md5(i || ':' || j.j || ':rp'), 1, 8))::BIGINT
                            % 2 = 0
                        THEN t ELSE -t END) AS BIGINT) AS y
        FROM t, LATERAL (SELECT unnest(range(0, {_RP_DIMS})) AS j) j
        GROUP BY 1, 2)
    SELECT j, COUNT(*) AS n_vectors,
           CAST(SUM(y) AS BIGINT) AS sum_y,
           CAST(SUM(y * y) AS BIGINT) AS sum_y2
    FROM y GROUP BY j ORDER BY j
    """,
)
def emb_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Johnson-Lindenstrauss sign projection (Achlioptas'
    database-friendly ±1 variant): project every 64-dim embedding to
    {_RP_DIMS} dims with a HASH-DERIVED sign matrix s(i,j) = ±1 from the
    shared 32-bit md5 hash of (i, j) — no stored projection matrix, no
    RNG state, any worker regenerates any sign on demand (exactly how
    JL sketches ship at scale).  Output is the per-projected-dim moment
    summary (count, Σy, Σy²) — the energy diagnostic JL guarantees are
    stated over.

    Exactness: inputs are FLOOR-quantized to integer ticks (×{_RP_TICK})
    before any summation, so y_j = Σ ±t_i is exact BIGINT in both engines
    regardless of order; Σy² here stays < 2^62 (|t| ≤ 6e5 · 64 dims ·
    2e3 vectors), at larger corpora the moment ladder rides DECIMAL(38,0).

    Scale shape: one posexplode of the tick array (|rows| = n·64), a
    {_RP_DIMS}-way dim fan-out, and two hash aggregations — all JVM
    expressions (md5/conv/sum), no Python, no shuffle beyond the two
    groupBys, embarrassingly parallel in n."""
    c = _emb(spark, sf_dir)
    t = c.select(
        "vec_id",
        F.posexplode(
            F.expr(
                f"transform(emb, x -> cast(floor(x * {_RP_TICK}) as bigint))"
            )
        ).alias("i", "t"),
    )
    tj = t.withColumn("j", F.explode(F.expr(f"sequence(0, {_RP_DIMS - 1})")))
    sign = F.when(
        _h32(
            F.concat_ws(
                ":", F.col("i"), F.col("j"), F.lit("rp")
            )
        )
        % 2
        == 0,
        F.lit(1),
    ).otherwise(F.lit(-1))
    y = tj.groupBy("vec_id", "j").agg(
        F.sum(sign * F.col("t")).cast("bigint").alias("y")
    )
    return (
        y.groupBy("j")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.sum("y").cast("bigint").alias("sum_y"),
            F.sum(F.col("y") * F.col("y")).cast("bigint").alias("sum_y2"),
        )
        .orderBy("j")
    )


# --- deterministic epoch shuffling (training data ordering) -------------------

_SHUF_EPOCHS = 3
_SHUF_SHARDS = 8


@register(
    "sample_epoch_shuffle",
    oracle=f"""
    WITH e AS (SELECT unnest(range(0, {_SHUF_EPOCHS})) AS epoch),
    h AS (
      SELECT e.epoch, d.doc_id,
             ('0x' || substr(md5(d.doc_id || ':' || e.epoch || ':shuffle'),
                             1, 8))::BIGINT AS h
      FROM documents d, e WHERE d.doc_id IS NOT NULL
    ),
    s AS (
      SELECT epoch, doc_id, h, CAST(h % {_SHUF_SHARDS} AS INTEGER) AS shard,
             ROW_NUMBER() OVER (
                 PARTITION BY epoch, h % {_SHUF_SHARDS}
                 ORDER BY h, doc_id) AS pos
      FROM h
    )
    SELECT CAST(epoch AS INTEGER) AS epoch, shard,
           COUNT(*) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
           CAST(MIN(CASE WHEN pos = 1 THEN doc_id END) AS BIGINT)
               AS first_doc,
           CAST(SUM(pos * doc_id) AS BIGINT) AS order_checksum
    FROM s GROUP BY epoch, shard ORDER BY epoch, shard
    """,
)
def sample_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic EPOCH SHUFFLING — the data-ordering stage of a
    training pipeline: for each of {_SHUF_EPOCHS} epochs every document
    gets a hash-derived shard ({_SHUF_SHARDS}-way) and a within-shard
    position (sort by the epoch-salted hash), i.e. a reproducible
    permutation per epoch with NO stored shuffle state — any worker
    recomputes any example's (epoch, shard, position) from the id alone,
    which is exactly how large-scale loaders ship determinism across
    restarts.  order_checksum = Σ position·doc_id pins the PERMUTATION
    itself (two epochs with identical membership but different order get
    different checksums); first_doc pins each shard's head.

    Scale shape: one map to (shard, hash) per epoch — a {_SHUF_EPOCHS}×
    fan-out of the id column only — then ONE hash shuffle on
    (epoch, shard) and a within-partition sort; shards are hash-balanced
    so no task skew.  At 100 TB positions come from the same sort run
    per shard file — never a global sort."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull()
    )
    e = d.select("doc_id").withColumn(
        "epoch", F.explode(F.expr(f"sequence(0, {_SHUF_EPOCHS - 1})"))
    )
    h = e.withColumn(
        "h",
        _h32(F.concat_ws(":", F.col("doc_id"), F.col("epoch"),
                         F.lit("shuffle"))),
    ).withColumn("shard", (F.col("h") % _SHUF_SHARDS).cast("int"))
    w = Window.partitionBy("epoch", "shard").orderBy("h", "doc_id")
    s = h.withColumn("pos", F.row_number().over(w))
    return (
        s.groupBy(
            F.col("epoch").cast("int").alias("epoch"), F.col("shard")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").cast("bigint").alias("id_checksum"),
            F.min(F.when(F.col("pos") == 1, F.col("doc_id")))
            .cast("bigint")
            .alias("first_doc"),
            F.sum(F.col("pos") * F.col("doc_id"))
            .cast("bigint")
            .alias("order_checksum"),
        )
        .orderBy("epoch", "shard")
    )


# --- IVF probe-radius recall/cost sweep ---------------------------------------

_RS_RADII = (0, 1, 2)


def _sql_rs_radius(r: int) -> str:
    return f"""
    SELECT {r} AS probe_radius,
           (SELECT CAST(COALESCE(SUM(hits), 0) AS BIGINT) FROM (
              SELECT COUNT(*) AS hits
              FROM gt JOIN (
                SELECT q_id, vec_id FROM (
                  SELECT q_id, vec_id,
                         ROW_NUMBER() OVER (PARTITION BY q_id
                                            ORDER BY s DESC, vec_id) AS rn
                  FROM scored WHERE hd <= {r}) WHERE rn <= {_RE_K}
              ) iv ON gt.q_id = iv.q_id AND gt.vec_id = iv.vec_id
              GROUP BY gt.q_id)) AS total_hits,
           (SELECT COUNT(*) FROM q) AS n_queries,
           (SELECT COUNT(*) FROM scored WHERE hd <= {r}) AS cand_pairs"""


@register(
    "ann_ivf_recall_sweep",
    oracle=f"""
    WITH c0 AS ({_SQL_EMB_CTE}),
    corpus AS MATERIALIZED (SELECT * FROM c0 WHERE vec_id % {_RE_CMOD} = 0),
    nb AS (SELECT {_DETK_BITS_SQL} AS b FROM corpus),
    cc AS MATERIALIZED (
      SELECT vec_id, emb, nrm, {_SQL_CELL_B.format(e="emb", b="nb.b")} AS cell
      FROM corpus CROSS JOIN nb
    ),
    q AS MATERIALIZED (
      SELECT vec_id AS q_id, emb, nrm,
             {_SQL_CELL_B.format(e="emb", b="nb.b")} AS cell
      FROM c0 CROSS JOIN nb WHERE vec_id % {_RE_QMOD} = 0
    ),
    scored AS MATERIALIZED (
      SELECT q.q_id, cc.vec_id, {_sql_cos("cc", "q")} AS s,
             bit_count(xor(cc.cell::BIGINT, q.cell::BIGINT)) AS hd
      FROM q JOIN cc ON cc.vec_id != q.q_id
    ),
    gt AS MATERIALIZED (SELECT q_id, vec_id FROM (
             SELECT q_id, vec_id,
                    ROW_NUMBER() OVER (PARTITION BY q_id
                                       ORDER BY s DESC, vec_id) AS rn
             FROM scored) WHERE rn <= {_RE_K})
    SELECT * FROM (
      {" UNION ALL ".join(_sql_rs_radius(r) for r in _RS_RADII)}
    ) ORDER BY probe_radius
    """,
)
def ann_ivf_recall_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RECALL-vs-COST curve every ANN deployment is tuned on: the
    sign-cell IVF probe evaluated at widening Hamming probe radii
    (radius r ≈ nprobe: how many neighboring cells are searched), each
    radius reporting total ground-truth hits AND the candidate-pair
    volume — the latency proxy — so the curve exposes the tradeoff
    directly (r=0 is cheapest and lossiest, r=2 nears brute force at a
    multiple of the cost).  Sibling of ann_recall_eval (single-radius
    histogram); same deterministic cosine folds and (score, id)
    tie-breaks.

    Scale shape: ONE scored relation (query-sample broadcast against the
    corpus-sample partitions, checkpointed) feeds every radius — the
    sweep adds top-k windows, never re-scores; at 100 TB each radius is
    one filter + window over the same materialization."""
    emb = _emb(spark, sf_dir)
    corpus = emb.filter(F.col("vec_id") % _RE_CMOD == 0).localCheckpoint(
        eager=False
    )
    bits = _detk_bits(corpus.count())
    cc = corpus.withColumn("cell", _cell_bits(F.col("emb"), bits))
    q = (
        emb.filter(F.col("vec_id") % _RE_QMOD == 0)
        .withColumn("qcell", _cell_bits(F.col("emb"), bits))
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("emb").alias("qemb"),
            F.col("nrm").alias("qnrm"),
            "qcell",
        )
    )
    cos = _dot(F.col("emb"), F.col("qemb")) / (F.col("nrm") * F.col("qnrm"))
    hd = F.bit_count(
        F.col("cell").cast("long").bitwiseXOR(F.col("qcell").cast("long"))
    )
    scored = (
        cc.join(F.broadcast(q), F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", cos.alias("s"), hd.alias("hd"))
        .localCheckpoint(eager=False)
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("s"), "vec_id")
    gt = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _RE_K)
        .select("q_id", "vec_id")
        .localCheckpoint(eager=False)
    )
    n_queries = q.agg(F.count(F.lit(1)).alias("n_queries"))
    rows = []
    for r in _RS_RADII:
        iv = (
            scored.filter(F.col("hd") <= r)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= _RE_K)
            .select("q_id", "vec_id")
        )
        hits = gt.join(F.broadcast(iv), ["q_id", "vec_id"]).agg(
            F.coalesce(F.count(F.lit(1)), F.lit(0))
            .cast("bigint")
            .alias("total_hits")
        )
        cand = scored.filter(F.col("hd") <= r).agg(
            F.count(F.lit(1)).alias("cand_pairs")
        )
        rows.append(
            hits.crossJoin(n_queries)
            .crossJoin(cand)
            .select(
                F.lit(r).alias("probe_radius"),
                "total_hits",
                "n_queries",
                "cand_pairs",
            )
        )
    out = rows[0]
    for x in rows[1:]:
        out = out.unionAll(x)
    return out.orderBy("probe_radius")


# --- Matryoshka prefix-dimension ranking agreement -----------------------------

_MRL_QMOD = 193  # query sample: vec_id % _MRL_QMOD == 0
_MRL_CMOD = 3  # evaluation corpus: vec_id % _MRL_CMOD == 0
_MRL_K = 10
_MRL_DIMS = (16, 32, 64)


def _sql_mrl_dim(m: int) -> str:
    return f"""
    SELECT {m} AS prefix_dims,
           (SELECT COUNT(*) FROM q) AS n_queries,
           (SELECT CAST(COALESCE(SUM(hits), 0) AS BIGINT) FROM (
              SELECT COUNT(*) AS hits
              FROM gt JOIN (
                SELECT q_id, vec_id FROM (
                  SELECT q_id, vec_id,
                         ROW_NUMBER() OVER (PARTITION BY q_id
                                            ORDER BY s{m} DESC, vec_id)
                             AS rn
                  FROM scored) WHERE rn <= {_MRL_K}
              ) pv ON gt.q_id = pv.q_id AND gt.vec_id = pv.vec_id
              GROUP BY gt.q_id)) AS total_hits,
           (SELECT COUNT(*) FROM (
              SELECT q_id FROM (
                SELECT q_id, vec_id,
                       ROW_NUMBER() OVER (PARTITION BY q_id
                                          ORDER BY s{m} DESC, vec_id) AS rn
                FROM scored) WHERE rn = 1
              ) p1 JOIN (
              SELECT q_id, vec_id FROM (
                SELECT q_id, vec_id,
                       ROW_NUMBER() OVER (PARTITION BY q_id
                                          ORDER BY s64 DESC, vec_id) AS rn
                FROM scored) f1 WHERE rn = 1
              ) g1 USING (q_id)
              WHERE (SELECT vec_id FROM (
                       SELECT q_id AS qq, vec_id,
                              ROW_NUMBER() OVER (PARTITION BY q_id
                                  ORDER BY s{m} DESC, vec_id) AS rn
                       FROM scored) WHERE qq = p1.q_id AND rn = 1)
                    = g1.vec_id) AS exact_top1"""


@register(
    "emb_matryoshka_eval",
    oracle=f"""
    WITH c0 AS ({_SQL_EMB_CTE}),
    base AS MATERIALIZED (
      SELECT vec_id, emb, emb[1:16] AS e16, emb[1:32] AS e32
      FROM c0
      WHERE sqrt({_SQL_DOT.format(a="emb[1:16]", b="emb[1:16]")}) > 0
    ),
    pre AS MATERIALIZED (
      SELECT vec_id, emb, e16, e32,
             sqrt({_SQL_DOT.format(a="e16", b="e16")}) AS n16,
             sqrt({_SQL_DOT.format(a="e32", b="e32")}) AS n32,
             sqrt({_SQL_DOT.format(a="emb", b="emb")}) AS n64
      FROM base
    ),
    corpus AS MATERIALIZED (
      SELECT * FROM pre WHERE vec_id % {_MRL_CMOD} = 0),
    q AS MATERIALIZED (
      SELECT vec_id AS q_id, emb AS qe, e16 AS qe16, e32 AS qe32,
             n16 AS qn16, n32 AS qn32, n64 AS qn64
      FROM pre WHERE vec_id % {_MRL_QMOD} = 0),
    scored AS MATERIALIZED (
      SELECT q.q_id, c.vec_id,
             {_SQL_DOT.format(a="c.e16", b="q.qe16")} / (c.n16 * q.qn16)
                 AS s16,
             {_SQL_DOT.format(a="c.e32", b="q.qe32")} / (c.n32 * q.qn32)
                 AS s32,
             {_SQL_DOT.format(a="c.emb", b="q.qe")} / (c.n64 * q.qn64)
                 AS s64
      FROM q JOIN corpus c ON c.vec_id != q.q_id
    ),
    gt AS MATERIALIZED (SELECT q_id, vec_id FROM (
           SELECT q_id, vec_id,
                  ROW_NUMBER() OVER (PARTITION BY q_id
                                     ORDER BY s64 DESC, vec_id) AS rn
           FROM scored) WHERE rn <= {_MRL_K})
    SELECT * FROM (
      {" UNION ALL ".join(_sql_mrl_dim(m) for m in _MRL_DIMS)}
    ) ORDER BY prefix_dims
    """,
)
def emb_matryoshka_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-representation evaluation (Kusupati et al. 2022): how
    well do PREFIX slices of the embedding (16 and 32 of 64 dims) rank
    the corpus compared to the full vector?  Per prefix width: top-10
    overlap with the full-dimension ground truth and exact rank-1
    agreement — the two numbers that decide whether a truncated index
    (4× smaller, 4× faster to scan) is deployable.  The 64-dim row is
    the built-in sanity anchor (perfect overlap by construction).  One
    eval population (prefix-16 norm > 0, which implies every wider norm)
    keeps all widths comparable; identical fold order and (score, id)
    tie-breaks keep both engines bit-equal.

    Scale shape: ONE scored relation (query-sample broadcast against the
    corpus sample) carries all three cosines — prefix scores are slices
    of the SAME arrays, so adding a width adds a column, not a pass; per
    width one top-k window."""
    emb = _emb(spark, sf_dir)
    e16 = F.slice(F.col("emb"), 1, 16)
    pre = (
        emb.withColumn("e16", e16)
        .withColumn("e32", F.slice(F.col("emb"), 1, 32))
        .withColumn("n16", F.sqrt(_dot(F.col("e16"), F.col("e16"))))
        .filter(F.col("n16") > 0)
        .withColumn("n32", F.sqrt(_dot(F.col("e32"), F.col("e32"))))
        .withColumn("n64", F.col("nrm"))
    )
    corpus = pre.filter(F.col("vec_id") % _MRL_CMOD == 0)
    q = pre.filter(F.col("vec_id") % _MRL_QMOD == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("emb").alias("qe"),
        F.col("e16").alias("qe16"),
        F.col("e32").alias("qe32"),
        F.col("n16").alias("qn16"),
        F.col("n32").alias("qn32"),
        F.col("n64").alias("qn64"),
    )
    scored = (
        corpus.join(F.broadcast(q), F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            (_dot(F.col("e16"), F.col("qe16"))
             / (F.col("n16") * F.col("qn16"))).alias("s16"),
            (_dot(F.col("e32"), F.col("qe32"))
             / (F.col("n32") * F.col("qn32"))).alias("s32"),
            (_dot(F.col("emb"), F.col("qe"))
             / (F.col("n64") * F.col("qn64"))).alias("s64"),
        )
        .localCheckpoint(eager=False)
    )
    w64 = Window.partitionBy("q_id").orderBy(F.desc("s64"), "vec_id")
    gt = (
        scored.withColumn("rn", F.row_number().over(w64))
        .filter(F.col("rn") <= _MRL_K)
        .select("q_id", "vec_id")
        .localCheckpoint(eager=False)
    )
    gt1 = gt.join(
        scored.withColumn("rn", F.row_number().over(w64))
        .filter(F.col("rn") == 1)
        .select("q_id", F.col("vec_id").alias("g1")),
        "q_id",
    ).select("q_id", "vec_id", "g1").localCheckpoint(eager=False)
    n_queries = (
        scored.select("q_id").distinct().agg(
            F.count(F.lit(1)).alias("n_queries")
        )
    )
    rows = []
    for m in _MRL_DIMS:
        wm = Window.partitionBy("q_id").orderBy(F.desc(f"s{m}"), "vec_id")
        top = (
            scored.withColumn("rn", F.row_number().over(wm))
            .filter(F.col("rn") <= _MRL_K)
            .select("q_id", "vec_id", "rn")
        )
        hits = gt.join(
            F.broadcast(top.select("q_id", "vec_id")), ["q_id", "vec_id"]
        ).agg(
            F.coalesce(F.count(F.lit(1)), F.lit(0))
            .cast("bigint")
            .alias("total_hits")
        )
        top1 = (
            top.filter(F.col("rn") == 1)
            .join(
                F.broadcast(
                    gt1.select("q_id", F.col("g1")).distinct()
                ),
                "q_id",
            )
            .filter(F.col("vec_id") == F.col("g1"))
            .agg(F.count(F.lit(1)).alias("exact_top1"))
        )
        rows.append(
            n_queries.crossJoin(hits)
            .crossJoin(top1)
            .select(
                F.lit(m).alias("prefix_dims"),
                "n_queries",
                "total_hits",
                "exact_top1",
            )
        )
    out = rows[0]
    for x in rows[1:]:
        out = out.unionAll(x)
    return out.orderBy("prefix_dims")


# --- PQ reconstruction-distortion evaluation -----------------------------------

_PQD_TICK = 1_000_000_000  # FLOOR-tick ladder: 1e-9 error resolution


def _sql_pqd_subspace(s: int) -> str:
    lo, hi = _PQ_SUB * s + 1, _PQ_SUB * (s + 1)
    l2_ts = _SQL_L2.format(a="t.e", b="sd.ce")
    l2_tk = _SQL_L2.format(a="t.e", b="k.ce")
    return f"""
    sub{s} AS (SELECT vec_id, emb[{lo}:{hi}] AS e FROM c),
    seed{s} AS (SELECT vec_id AS cid, e AS ce FROM sub{s}
                WHERE vec_id < {_PQ_K}),
    a{s} AS MATERIALIZED (SELECT vec_id, cid, e FROM (
        SELECT t.vec_id, sd.cid, t.e,
               ROW_NUMBER() OVER (PARTITION BY t.vec_id
                 ORDER BY {l2_ts}, sd.cid) AS rn
        FROM sub{s} t, seed{s} sd) z WHERE rn = 1),
    pd{s} AS (SELECT cid, pos,
                     CAST(SUM(CAST(x AS DECIMAL(18,9))) AS DOUBLE)
                       / COUNT(*) AS m
              FROM (SELECT cid, UNNEST(e) AS x,
                           UNNEST(range(1, len(e)+1)) AS pos FROM a{s}) u
              GROUP BY 1, 2),
    cent{s} AS (SELECT cid, list(m ORDER BY pos) AS ce
                FROM pd{s} GROUP BY cid),
    err{s} AS MATERIALIZED (SELECT vec_id, cid, err FROM (
        SELECT t.vec_id, k.cid, {l2_tk} AS err,
               ROW_NUMBER() OVER (PARTITION BY t.vec_id
                 ORDER BY {l2_tk}, k.cid) AS rn
        FROM sub{s} t, cent{s} k) z WHERE rn = 1)"""


@register(
    "ann_pq_distortion_eval",
    oracle=(
        f"WITH c AS ({_SQL_EMB_CTE}),"
        + ",".join(_sql_pqd_subspace(s) for s in range(_PQ_M))
        + f"""
    SELECT * FROM (
      {" UNION ALL ".join(
        f'''SELECT {s} AS subspace,
               (SELECT COUNT(*) FROM err{s}) AS n_vectors,
               (SELECT COUNT(DISTINCT cid) FROM err{s}) AS codes_used,
               (SELECT CAST(SUM(CAST(FLOOR(err * {_PQD_TICK}) AS BIGINT))
                       AS BIGINT) FROM err{s}) AS err_ticks'''
        for s in range(_PQ_M)
      )}
    ) ORDER BY subspace
    """
    ),
)
def ann_pq_distortion_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ RECONSTRUCTION DISTORTION — the quantity that predicts ADC
    ranking quality before any query runs (FAISS reports it as
    imbalance/quantization error): per 16-dim subspace, the exact total
    squared reconstruction error Σ‖x − centroid(code(x))‖² over the
    corpus, FLOOR-quantized to 1e-9 BIGINT ticks per vector so the
    cross-row sum is order-free and bit-identical in both engines, plus
    codebook utilization (distinct codes actually used of {_PQ_K} — a
    collapsed codebook is the classic PQ training failure).  Shares the
    exact codebook construction with ann_pq_topk (seed + one
    exact-decimal Lloyd pass), so the number measured is the number the
    index actually ships.

    Scale shape: per subspace one broadcast codebook join + min_by
    assignment (map-side) and one global aggregate; the corpus is
    scanned once per subspace over a 16-dim slice — at 100 TB all four
    subspaces run in ONE pass over the full array (a column per
    subspace), which this declarative form already expresses."""
    # Round 12: the 4 per-subspace pipelines are fused into ONE exploded
    # (vec_id, s, e) relation — the same rewrite ann_pq_topk got in r11
    # (~20 tiny stages -> ~6; the oracle is unchanged and the per-subspace
    # arithmetic is identical because every aggregate now just carries the
    # s key).  The relation is localCheckpointed: both assignment passes
    # consume it (guide §2.4).
    # Round 13 (r12 verdict task 2): both assignment passes run in
    # ``_nearest_centroid_kernel`` over driver-collected codebooks — one
    # vectorized map pass each instead of a K-way broadcast-join explosion
    # + interpreted ``_l2`` fold + groupBy(vec_id, s) exchange; the final
    # pass emits the min distance (``dist``) directly, the former
    # ``w.d AS err``.  Order-exact doubles, oracle bit-identical.
    c = _emb(spark, sf_dir)
    sub = c.select(
        "vec_id",
        F.posexplode(
            F.array(
                *[
                    F.slice(F.col("emb"), _PQ_SUB * s + 1, _PQ_SUB)
                    for s in range(_PQ_M)
                ]
            )
        ).alias("s", "e"),
    )
    sub = materialize_once(sub)
    seed_book = _collect_codebook(
        sub.filter(F.col("vec_id") < _PQ_K).collect(), "s", "vec_id", "e"
    )
    a1 = sub.mapInArrow(
        _nearest_centroid_kernel(seed_book),
        "vec_id long, s int, e array<double>, cid long",
    )
    cent = (
        a1.select("s", "cid", F.posexplode("e").alias("pos", "x"))
        .groupBy("s", "cid", "pos")
        .agg(
            (
                F.sum(F.col("x").cast("decimal(18,9)")).cast("double")
                / F.count(F.lit(1))
            ).alias("m")
        )
        .groupBy("s", "cid")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("m")))
                ),
                lambda st: st["m"],
            ).alias("ce")
        )
    )
    cent_book = _collect_codebook(cent.collect(), "s", "cid", "ce")
    err = sub.select("vec_id", "s", "e").mapInArrow(
        _nearest_centroid_kernel(cent_book, emit_dist=True),
        "vec_id long, s int, e array<double>, cid long, dist double",
    ).withColumnRenamed("dist", "err")
    return (
        err.groupBy("s")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.count_distinct(F.col("cid")).alias("codes_used"),
            F.sum(
                F.floor(F.col("err") * _PQD_TICK).cast("bigint")
            )
            .cast("bigint")
            .alias("err_ticks"),
        )
        .select("s", "n_vectors", "codes_used", "err_ticks")
        .withColumnRenamed("s", "subspace")
        .orderBy("subspace")
    )


# --- per-dimension z-score outlier screen --------------------------------------

_EOS_TICK = 1_000_000  # FLOOR-tick ladder on the per-vector score
_EOS_K = 10


@register(
    "emb_outlier_score",
    oracle=f"""
    WITH c AS ({_SQL_EMB_CTE}),
    t AS MATERIALIZED (
      SELECT vec_id, i.i AS pos, emb[i.i + 1] AS x
      FROM c, LATERAL (SELECT unnest(range(0, len(emb))) AS i) i
    ),
    st AS MATERIALIZED (
      SELECT pos,
             CAST(SUM(CAST(x AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*)
                 AS mu,
             CAST(SUM(CAST(x AS DECIMAL(18,9))
                      * CAST(x AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*)
                 AS ex2,
             COUNT(*) AS n
      FROM t GROUP BY pos
    ),
    sv AS (SELECT pos, mu, ex2 - mu * mu AS var FROM st),
    sc AS (
      SELECT t.vec_id,
             CAST(SUM(CAST(FLOOR(
               CASE WHEN sv.var > 0
                    THEN (t.x - sv.mu) * (t.x - sv.mu) / sv.var
                    ELSE 0 END * {_EOS_TICK}) AS BIGINT)) AS BIGINT)
                 AS score_ticks
      FROM t JOIN sv ON sv.pos = t.pos
      GROUP BY t.vec_id
    )
    SELECT vec_id, score_ticks FROM sc
    ORDER BY score_ticks DESC, vec_id LIMIT {_EOS_K}
    """,
)
def emb_outlier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space OUTLIER screen (diagonal Mahalanobis): per
    dimension, mean and variance from exact-decimal sums; per vector, the
    summed squared z-score — the cheap first-pass filter that catches
    corrupted encoders, mis-normalized batches and off-manifold junk
    before they poison dedup thresholds or ANN recall.  Each dimension's
    contribution is FLOOR-ticked to a BIGINT before the cross-dimension
    sum, so the score is order-free and bit-identical in both engines;
    zero-variance dimensions contribute nothing (guarded identically).
    Output: the top-{_EOS_K} most anomalous vectors.

    Scale shape: one posexplode pass for the per-dim moment aggregation
    (64 groups — map-side combinable to almost nothing), a broadcast of
    the 64-row stats relation back onto the exploded view, one per-vector
    aggregation, TakeOrderedAndProject for the top-k.  Two passes over
    the corpus total, both embarrassingly parallel."""
    c = _emb(spark, sf_dir)
    t = c.select(
        "vec_id", F.posexplode(F.col("emb")).alias("pos", "x")
    )
    dec = F.col("x").cast("decimal(18,9)")
    st = t.groupBy("pos").agg(
        (F.sum(dec).cast("double") / F.count(F.lit(1))).alias("mu"),
        (F.sum(dec * dec).cast("double") / F.count(F.lit(1))).alias("ex2"),
    )
    sv = st.select(
        "pos", "mu", (F.col("ex2") - F.col("mu") * F.col("mu")).alias("var")
    )
    contrib = F.when(
        F.col("var") > 0,
        (F.col("x") - F.col("mu"))
        * (F.col("x") - F.col("mu"))
        / F.col("var"),
    ).otherwise(F.lit(0.0))
    sc = (
        t.join(F.broadcast(sv), "pos")
        .groupBy("vec_id")
        .agg(
            F.sum(F.floor(contrib * _EOS_TICK).cast("bigint"))
            .cast("bigint")
            .alias("score_ticks")
        )
    )
    return sc.orderBy(F.desc("score_ticks"), "vec_id").limit(_EOS_K)


@register(
    "emb_cluster_purity",
    oracle=f"""
    WITH nb AS (SELECT {_DETK_BITS_SQL} AS b FROM ({_SQL_EMB_CTE})),
    lbl AS (SELECT vec_id, label FROM embeddings WHERE label IS NOT NULL),
    cl AS (
      SELECT {_SQL_CELL_B.format(e="c0.emb", b="nb.b")} AS cell, lbl.label
      FROM ({_SQL_EMB_CTE}) c0 JOIN lbl ON lbl.vec_id = c0.vec_id
      CROSS JOIN nb
    ),
    cnt AS (SELECT cell, label, COUNT(*) AS c FROM cl GROUP BY 1, 2),
    tot AS (SELECT cell, CAST(SUM(c) AS BIGINT) AS n_cell FROM cnt GROUP BY 1),
    maj AS (
      SELECT cell, label AS majority_label, c AS maj_cnt FROM (
        SELECT cell, label, c,
               ROW_NUMBER() OVER (PARTITION BY cell
                                  ORDER BY c DESC, label) AS rn
        FROM cnt
      ) r WHERE rn = 1
    )
    SELECT m.majority_label,
           COUNT(*) AS n_cells,
           CAST(SUM(t.n_cell) AS BIGINT) AS n_vecs,
           CAST(SUM(m.maj_cnt) AS BIGINT) AS n_majority,
           CAST(SUM(m.maj_cnt) AS DOUBLE) / SUM(t.n_cell) AS purity
    FROM maj m JOIN tot t ON t.cell = m.cell
    GROUP BY m.majority_label ORDER BY m.majority_label
    """,
)
def emb_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-cell LABEL PURITY — the clustering-quality probe that closes
    the loop between the ANN cell machinery and the labels: per cell
    (same data-scaled sign quantizer the dedup/ANN operators bucket by),
    the majority label and its share; reported per majority label as a
    weighted purity (Σ majority / Σ members, exact integers with ONE
    double division).  High purity means the cheap sign-bucket geometry
    already separates classes — the precondition for the IVF/sign-probe
    family's recall; a collapsed purity flags an embedding (or a bit
    count) whose buckets mix classes and whose probes will thrash.

    Scale shape: map-only cell assignment, two key-equality hash
    aggregations, a per-cell top-1 window co-partitioned with the
    (cell, label) aggregate, and an O(cells) join — no pairwise work,
    no data-sized broadcast."""
    e = load_table(spark, sf_dir, "embeddings")
    emb = _emb(spark, sf_dir)
    bits = _detk_bits(emb.count())
    cl = emb.join(
        e.filter(F.col("label").isNotNull()).select("vec_id", "label"),
        "vec_id",
    ).select(_cell_bits(F.col("emb"), bits).alias("cell"), "label")
    cnt = cl.groupBy("cell", "label").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.groupBy("cell").agg(F.sum("c").cast("bigint").alias("n_cell"))
    w = Window.partitionBy("cell").orderBy(F.desc("c"), "label")
    maj = (
        cnt.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "cell",
            F.col("label").alias("majority_label"),
            F.col("c").alias("maj_cnt"),
        )
    )
    return (
        maj.join(tot, "cell")
        .groupBy("majority_label")
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.sum("n_cell").cast("bigint").alias("n_vecs"),
            F.sum("maj_cnt").cast("bigint").alias("n_majority"),
            (
                F.sum("maj_cnt").cast("double") / F.sum("n_cell")
            ).alias("purity"),
        )
        .orderBy("majority_label")
    )


@register(
    "sample_importance_weighted",
    oracle="""
    WITH d AS (
      SELECT doc_id, source, n_chars
      FROM documents
      WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL AND n_chars > 0
    ),
    mx AS (SELECT CAST(MAX(n_chars) AS BIGINT) AS mw FROM d),
    sel AS (
      SELECT d.source, d.n_chars,
             CASE WHEN ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
                       ::BIGINT * mx.mw < d.n_chars * 4294967296
                  THEN 1 ELSE 0 END AS hit
      FROM d CROSS JOIN mx
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(hit) AS BIGINT) AS n_sampled,
           CAST(SUM(n_chars) AS BIGINT) AS sum_w,
           CAST(SUM(n_chars) AS DOUBLE) / (SELECT mw FROM mx)
               AS expected_sampled
    FROM sel GROUP BY source ORDER BY source NULLS LAST
    """,
)
def sample_importance_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance-WEIGHTED document selection — the quality-weighted
    curation draw (keep a document with probability proportional to its
    quality weight, here the n_chars proxy): inclusion is the pure
    INTEGER comparison hash32(doc_id)·max_w < w·2^32, so the Bernoulli
    draw is deterministic, reproducible across engines and re-runs, and
    free of float thresholds entirely.  Reported per source with the
    analytic expectation Σw/max_w (exact integer sums, ONE double
    division) next to the realized count — the bias audit a production
    sampler ships with its output.

    Scale shape: one narrow scan, a 1-row max_w broadcast, map-side
    hashing, one key-equality aggregate; at 100 TB the draw stays a
    stateless map over the corpus."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull()
        & F.col("n_chars").isNotNull()
        & (F.col("n_chars") > 0)
    )
    mx = d.agg(F.max("n_chars").cast("bigint").alias("mw"))
    hit = (
        F.when(
            _h32(F.col("doc_id").cast("string")) * F.col("mw")
            < F.col("n_chars") * F.lit(4294967296),
            1,
        ).otherwise(0)
    ).alias("hit")
    sel = d.crossJoin(F.broadcast(mx)).select("source", "n_chars", "mw", hit)
    return (
        sel.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("hit").cast("bigint").alias("n_sampled"),
            F.sum("n_chars").cast("bigint").alias("sum_w"),
            (F.sum("n_chars").cast("double") / F.max("mw")).alias(
                "expected_sampled"
            ),
        )
        .orderBy(F.col("source").asc_nulls_last())
    )
