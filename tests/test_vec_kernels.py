"""The Arrow/NumPy double-fold kernels must be bit-identical to the JVM folds.

Round 13 moved the ANN family's interpreted ``_dot``/``_l2`` HOF folds into
vectorized kernels (guide §4.2).  Unlike the int64 minhash kernel, these are
IEEE-754 doubles where SUMMATION ORDER changes the bits — the kernels
accumulate strictly left-to-right from 0.0 (one vectorized add per array
position, never np.sum's pairwise reassociation), so equality is exact.
Cases below include -0.0 terms, magnitude cliffs that expose any
reassociation, and tie-broken argmin assignment.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from lakehouse_sfc_spark.queries.datapipe import (
    _cosv_pair_kernel,
    _dot,
    _l2,
    _nearest_centroid_kernel,
    _py_l2,
    _seq_pair_rowsum,
)


def _ref_fold(a, b, kind):
    acc = 0.0
    for x, y in zip(a, b):
        t = x * y if kind == "dot" else (x - y) * (x - y)
        acc = acc + t
    return acc


def _vec_cases():
    rng = np.random.default_rng(13)
    cases = [
        ([0.0], [-0.0]),
        ([-0.0, -0.0, -0.0], [1.0, 1.0, 1.0]),
        # magnitude cliff: pairwise summation would reassociate these
        ([1e16, 1.0, -1e16, 1.0], [1.0, 1.0, 1.0, 1.0]),
        ([0.1] * 7, [0.3] * 7),
        (list(rng.standard_normal(64)), list(rng.standard_normal(64))),
        (list(rng.standard_normal(16) * 1e8), list(rng.standard_normal(16) * 1e-8)),
    ]
    return [( [float(x) for x in a], [float(y) for y in b]) for a, b in cases]


@pytest.mark.parametrize("kind", ["dot", "l2"])
def test_seq_pair_rowsum_matches_python_reference(kind):
    cases = _vec_cases()
    # pad to two width groups so the group-by-width path is exercised
    a_col = pa.array([a for a, _ in cases], type=pa.list_(pa.float64()))
    b_col = pa.array([b for _, b in cases], type=pa.list_(pa.float64()))
    got = _seq_pair_rowsum(a_col, b_col, kind)
    want = [_ref_fold(a, b, kind) for a, b in cases]
    assert [repr(float(g)) for g in got] == [repr(w) for w in want]
    # sliced input keeps absolute offsets — same discipline as the minhash
    # kernel
    got_sliced = _seq_pair_rowsum(a_col.slice(2, 3), b_col.slice(2, 3), kind)
    assert [repr(float(g)) for g in got_sliced] == [
        repr(w) for w in want[2:5]
    ]


def test_seq_pair_rowsum_ragged_raises():
    a = pa.array([[1.0, 2.0], [3.0]], type=pa.list_(pa.float64()))
    b = pa.array([[1.0, 2.0], [3.0, 4.0]], type=pa.list_(pa.float64()))
    with pytest.raises(ValueError):
        _seq_pair_rowsum(a, b, "dot")


def test_folds_bit_identical_to_jvm(spark):
    cases = _vec_cases()
    # uniform width per DataFrame row set is NOT required by the JVM fold;
    # group cases by width so each kernel call sees its uniform batch
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(cases)],
        "i long, a array<double>, b array<double>",
    )
    jvm = {
        r["i"]: (r["d"], r["l"])
        for r in df.select(
            "i",
            _dot(F.col("a"), F.col("b")).alias("d"),
            _l2(F.col("a"), F.col("b")).alias("l"),
        ).collect()
    }
    for i, (a, b) in enumerate(cases):
        ac = pa.array([a], type=pa.list_(pa.float64()))
        bc = pa.array([b], type=pa.list_(pa.float64()))
        assert repr(float(_seq_pair_rowsum(ac, bc, "dot")[0])) == repr(jvm[i][0])
        assert repr(float(_seq_pair_rowsum(ac, bc, "l2")[0])) == repr(jvm[i][1])
        assert repr(_py_l2(a, b)) == repr(jvm[i][1])


def test_cosv_kernel_bit_identical_to_jvm(spark):
    rng = np.random.default_rng(7)
    rows = []
    for i in range(40):
        e = [float(x) for x in rng.standard_normal(8)]
        q = [float(x) for x in rng.standard_normal(8)]
        nrm = float(np.sqrt(sum(x * x for x in e)))
        qn = float(np.sqrt(sum(x * x for x in q)))
        rows.append((i, i + 1000, e, nrm, q, qn))
    df = spark.createDataFrame(
        rows,
        "a_id long, b_id long, emb array<double>, nrm double,"
        " qemb array<double>, qnrm double",
    )
    cos = _dot(F.col("emb"), F.col("qemb")) / (F.col("nrm") * F.col("qnrm"))
    jvm = {r["a_id"]: r["c"] for r in df.select("a_id", cos.alias("c")).collect()}
    got = {
        r["a_id"]: r["cosv"]
        for r in df.mapInArrow(
            _cosv_pair_kernel, "a_id long, b_id long, cosv double"
        ).collect()
    }
    assert {k: repr(v) for k, v in got.items()} == {
        k: repr(v) for k, v in jvm.items()
    }


def _jvm_assign(spark, vec_rows, cent_rows, keyed):
    """The pre-r13 broadcast-join + min_by assignment, as reference."""
    if keyed:
        vecs = spark.createDataFrame(
            vec_rows, "vec_id long, s int, e array<double>"
        )
        cents = spark.createDataFrame(
            cent_rows, "cs int, cid long, ce array<double>"
        )
        d = _l2(F.col("e"), F.col("ce"))
        out = (
            vecs.join(F.broadcast(cents), F.col("s") == F.col("cs"))
            .select("vec_id", "s", "cid", d.alias("d"))
            .groupBy("vec_id", "s")
            .agg(
                F.min_by(
                    F.struct("cid", "d"), F.struct("d", "cid")
                ).alias("w")
            )
            .select("vec_id", "s", "w.cid", "w.d")
        )
        return {(r["vec_id"], r["s"]): (r["cid"], r["d"]) for r in out.collect()}
    vecs = spark.createDataFrame(vec_rows, "vec_id long, emb array<double>")
    cents = spark.createDataFrame(cent_rows, "cid long, cemb array<double>")
    d = _l2(F.col("emb"), F.col("cemb"))
    out = (
        vecs.join(F.broadcast(cents))
        .select("vec_id", "cid", d.alias("d"))
        .groupBy("vec_id")
        .agg(F.min_by(F.struct("cid", "d"), F.struct("d", "cid")).alias("w"))
        .select("vec_id", "w.cid", "w.d")
    )
    return {r["vec_id"]: (r["cid"], r["d"]) for r in out.collect()}


def test_assign_kernel_bit_identical_to_jvm_min_by(spark):
    rng = np.random.default_rng(3)
    vec_rows = [
        (i, [float(x) for x in rng.standard_normal(8)]) for i in range(30)
    ]
    # duplicate centroids force distance TIES: min_by must pick the lowest cid
    base = [float(x) for x in rng.standard_normal(8)]
    cent_rows = [
        (7, list(base)),
        (3, list(base)),
        (5, [float(x) for x in rng.standard_normal(8)]),
    ]
    jvm = _jvm_assign(spark, vec_rows, cent_rows, keyed=False)
    book = {
        None: (
            np.array(sorted(c for c, _ in cent_rows), dtype=np.int64),
            np.array(
                [v for _, v in sorted(cent_rows, key=lambda p: p[0])],
                dtype=np.float64,
            ),
        )
    }
    df = spark.createDataFrame(vec_rows, "vec_id long, emb array<double>")
    got = {
        r["vec_id"]: (r["cid"], r["dist"])
        for r in df.mapInArrow(
            _nearest_centroid_kernel(book, emit_dist=True),
            "vec_id long, emb array<double>, cid long, dist double",
        ).collect()
    }
    assert {k: (c, repr(d)) for k, (c, d) in got.items()} == {
        k: (c, repr(d)) for k, (c, d) in jvm.items()
    }
    # every tie (cids 3 vs 7 share a centroid) resolves to 3
    assert all(c != 7 for c, _ in got.values())


def test_assign_kernel_subspaced_matches_jvm(spark):
    rng = np.random.default_rng(11)
    vec_rows = [
        (i, s, [float(x) for x in rng.standard_normal(4)])
        for i in range(12)
        for s in range(2)
    ]
    cent_rows = [
        (s, cid, [float(x) for x in rng.standard_normal(4)])
        for s in range(2)
        for cid in (0, 1, 2)
    ]
    jvm = _jvm_assign(spark, vec_rows, cent_rows, keyed=True)
    book = {}
    for s in (0, 1):
        pairs = sorted((c, v) for ss, c, v in cent_rows if ss == s)
        book[s] = (
            np.array([c for c, _ in pairs], dtype=np.int64),
            np.array([v for _, v in pairs], dtype=np.float64),
        )
    df = spark.createDataFrame(vec_rows, "vec_id long, s int, e array<double>")
    got = {
        (r["vec_id"], r["s"]): (r["cid"], r["dist"])
        for r in df.mapInArrow(
            _nearest_centroid_kernel(book, emit_dist=True),
            "vec_id long, s int, e array<double>, cid long, dist double",
        ).collect()
    }
    assert {k: (c, repr(d)) for k, (c, d) in got.items()} == {
        k: (c, repr(d)) for k, (c, d) in jvm.items()
    }
