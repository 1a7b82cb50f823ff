"""emb_pca_power semantics: the oracle gate proves cross-engine exactness;
this proves the operator actually finds a dominant principal direction.

The testdata embeddings are near-isotropic (random), where NO fixed-round
power iteration can separate the top eigenvector — so the semantic check
runs on a planted-spike fixture (strong direction + noise), where 3
iterations converge; on the real testdata we assert the structural
invariants (unit norm, 64 dims) only, with cross-engine exactness covered
by the DuckDB oracle."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lakehouse_sfc_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_unit_norm_on_real_testdata(spark):
    rows = QUERIES["emb_pca_power"].fn(spark, SF_DIR).collect()
    v = np.array([r["loading"] for r in sorted(rows, key=lambda r: r["dim"])])
    assert v.shape == (64,)
    assert abs(np.linalg.norm(v) - 1.0) < 1e-9


@pytest.fixture(scope="module")
def spike_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pca_spike")
    rng = np.random.RandomState(7)
    star = rng.randn(64)
    star[0] = 5.0  # ensure overlap with the e_0 start vector
    star /= np.linalg.norm(star)
    n = 80
    a = np.outer(rng.randn(n) * 10.0, star) + rng.randn(n, 64) * 0.05
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), type=pa.int64()),
            "embedding": pa.array(
                [row.astype(np.float32) for row in a],
                type=pa.list_(pa.float32()),
            ),
            "label": pa.array([0] * n, type=pa.int32()),
        }
    )
    pq.write_table(tbl, str(d / "embeddings.parquet"))
    return str(d), star


def test_recovers_planted_direction(spark, spike_dir):
    d, star = spike_dir
    rows = QUERIES["emb_pca_power"].fn(spark, d).collect()
    v = np.array([r["loading"] for r in sorted(rows, key=lambda r: r["dim"])])
    cos = abs(float(v @ star))
    assert cos > 0.999, cos
