"""IVF production path: k-means training on a bounded driver-side sample +
zero-shuffle cell assignment as a codegen expression.

The oracle-checked query twin (``queries/datapipe.py::ann_ivf_kmeans_topk``)
expresses ONE Lloyd round declaratively so DuckDB can replay it bit-for-bit.
This module is the path a 100 TB deployment takes instead:

1. ``train_centroids``: Lloyd's algorithm with numpy on a deterministic
   sample (the FAISS-style contract — coarse quantizers train on ~100k-1M
   sampled vectors regardless of table size, so driver memory is bounded
   and iteration count is free).
2. ``cell_expr``: the trained centroids inlined as array literals into a
   single JVM expression computing argmin-L2 — assignment is a projection
   inside WholeStageCodegen: NO join, NO shuffle, no Python in the loop.
3. ``ivf_write``: one clustering shuffle partitions the table by cell
   (hive-style dirs) so probes become partition pruning
   (``ann_ivf_partitioned_topk`` shows that read path).

Determinism: sample = first ``sample_cap`` vectors by id; init = first k
sample rows; ties in assignment break toward the lower centroid id — same
contract as the declarative twin.  ``cell_expr`` is the AUTHORITATIVE
assignment (it is what the write path evaluates); training uses numpy's
expansion-trick distances, whose floating-point rounding can order
near-exact ties differently — that affects which centroid a borderline
SAMPLE vector trains toward (harmless), never the written layout.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def train_centroids(
    df: DataFrame,
    vec_col: str = "emb",
    id_col: str = "vec_id",
    k: int = 64,
    iters: int = 10,
    sample_cap: int = 100_000,
) -> np.ndarray:
    """Lloyd's k-means on the first ``sample_cap`` vectors (by ``id_col``).
    Returns (k, dim) float64 centroids.  Empty clusters keep their previous
    centroid (standard practice; avoids respawn nondeterminism)."""
    rows = (
        df.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(sample_cap)
        .collect()
    )
    x = np.array([r[1] for r in rows], dtype=np.float64)
    n = len(x)
    if n == 0:
        raise ValueError("no vectors to train on")
    k = min(k, n)
    cent = x[:k].copy()
    for _ in range(max(0, iters)):
        # pairwise squared L2 via the expansion trick: O(nk) memory-lean
        d2 = (
            (x * x).sum(axis=1, keepdims=True)
            - 2.0 * (x @ cent.T)
            + (cent * cent).sum(axis=1)
        )
        assign = d2.argmin(axis=1)  # ties -> lowest index (argmin contract)
        for c in range(k):
            members = x[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return cent


def cell_expr(centroids: np.ndarray, vec_col: str = "emb") -> Column:
    """Nearest-centroid id as a pure JVM expression over the literal
    centroids: argmin of K folded L2 distances, ties to the lower id.
    Stays inside WholeStageCodegen — suitable K up to a few hundred (the
    expression grows linearly with K x dim)."""
    v = F.col(vec_col)
    dists = [
        F.aggregate(
            F.zip_with(
                v,
                F.array(*[F.lit(float(c)) for c in centroid]),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0),
            lambda acc, d: acc + d,
        )
        for centroid in centroids
    ]
    arr = F.array(*dists)
    # array_position returns the FIRST index of the minimum (1-based) —
    # exactly the lower-id tie-break of the declarative twin
    return (F.array_position(arr, F.array_min(arr)) - 1).cast("int")


def ivf_write(
    df: DataFrame,
    path: str,
    centroids: np.ndarray,
    vec_col: str = "emb",
    mode: str = "overwrite",
) -> None:
    """Cluster by cell and write hive-partitioned — one shuffle, after which
    every nprobe-cell query is partition pruning instead of a scan."""
    out = df.withColumn("cell", cell_expr(centroids, vec_col))
    out.repartition("cell").write.mode(mode).partitionBy("cell").parquet(path)


def probe_cells(
    centroids: np.ndarray, query_vec: np.ndarray, nprobe: int = 2
) -> list[int]:
    """The nprobe nearest cells for a query vector (driver-side: centroids
    are tiny).  Ties break toward the lower cell id via stable argsort."""
    d2 = ((centroids - query_vec.astype(np.float64)) ** 2).sum(axis=1)
    return np.argsort(d2, kind="stable")[:nprobe].astype(int).tolist()
