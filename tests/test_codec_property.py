"""Property-based tests for the dependency-free kernels added in round 4:

- Bloom filters must NEVER false-negative (a miss would silently drop
  result rows when used for file skipping) across mixed value types and
  canonical-form aliases (5 vs 5.0).
- The PNG codec must round-trip arbitrary 8-bit images exactly (RGB, RGBA,
  grayscale, degenerate 1-pixel shapes).
- The exact ntile batch-size contract: for any (total, n_batches), the
  closed-form batch id in _ranged_batch_assignment gives sizes differing by
  at most 1 with the first ``total % n`` batches one larger.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from lakehouse_sfc_spark.layout.bloom import bloom_build, bloom_may_contain
from lakehouse_sfc_spark.operators.multimodal import decode_png, encode_png


@given(
    vals=st.lists(
        st.one_of(
            st.integers(min_value=-(10**12), max_value=10**12),
            st.floats(allow_nan=False, allow_infinity=False, width=32),
            st.text(max_size=20),
        ),
        min_size=0,
        max_size=200,
    ),
    fpp=st.sampled_from([0.001, 0.01, 0.1]),
)
@settings(max_examples=50, deadline=None)
def test_bloom_never_false_negative(vals, fpp):
    b = bloom_build(vals, fpp)
    for v in vals:
        assert bloom_may_contain(b, v)


@given(
    h=st.integers(min_value=1, max_value=24),
    w=st.integers(min_value=1, max_value=24),
    ch=st.sampled_from([0, 3, 4]),  # 0 => grayscale 2-D array
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_property(h, w, ch, seed):
    rng = np.random.default_rng(seed)
    shape = (h, w) if ch == 0 else (h, w, ch)
    px = rng.integers(0, 256, size=shape, dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(px)), px)


@given(
    total=st.integers(min_value=0, max_value=5000),
    n=st.integers(min_value=1, max_value=64),
)
@settings(max_examples=200, deadline=None)
def test_ntile_closed_form_contract(total, n):
    """The pure arithmetic at the heart of _ranged_batch_assignment
    (layout/upsert.py): rank -> batch id must reproduce the exact ntile
    size contract without a global sort."""
    q, rem = divmod(total, n)
    boundary = rem * (q + 1)
    sizes = [0] * (n + 1)
    for rank in range(1, total + 1):
        if boundary and rank <= boundary:
            b = (rank - 1) // max(q + 1, 1) + 1
        else:
            b = rem + (rank - boundary - 1) // max(q, 1) + 1
        sizes[b] += 1
    body = sizes[1:]
    assert sum(body) == total
    assert max(body, default=0) - min(body, default=0) <= 1 if total >= n else True
    # first `rem` batches get the extra row
    for i, sz in enumerate(body, start=1):
        expect = q + 1 if i <= rem else q
        assert sz == expect, (total, n, i, sz, expect)
