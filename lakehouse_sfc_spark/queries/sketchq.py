"""Mergeable cardinality sketches: K-Minimum-Values (KMV) distinct-count
estimation, exact-by-construction across engines.

Beyond the reference (its profiler computes exact `COUNT(DISTINCT)`,
run_queries.py aggregate templates): at 100 TB exact distinct is a full
shuffle of every key; the scale answer is a MERGEABLE sketch — each
partition summarizes to k hashes, merges are tiny, and the error is
bounded (~1/sqrt(k)).  KMV is chosen over HLL here because it is exactly
reproducible from pure SQL in any engine (k smallest distinct md5 hashes +
one closed-form division), so the driver can hash-compare Spark vs DuckDB
bit-for-bit — a DETERMINISTIC approximate sketch.

Estimator (Beyer et al., "On Synopses for Distinct-Value Estimation Under
Multiset Operations", SIGMOD'07): with h uniform on [0, M) and h_(k) the
k-th smallest distinct hash, est = (k-1) * M / h_(k); when fewer than k
distinct hashes exist the sketch IS the exact set (est = count).

Scale shape: one hash-partitioned distinct on (group, hash) — the same
single shuffle exact distinct needs — then a per-group top-k window over
hashes (map-side rank-k prune via the window's partial sort).  The merge
query demonstrates the property that matters on a cluster: per-shard
sketches union to the global sketch with NO second scan of the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_sfc_spark.queries.datapipe import _h32
from lakehouse_sfc_spark.queries.registry import register
from lakehouse_sfc_spark.sources.loader import load_table

_K = 256
_M = float(1 << 32)  # hash space size for the 32-bit md5 prefix

# distinct (group, hash) pairs; collisions collapse (that's part of the
# estimator's contract, identical in both engines)
_SQL_HASHES = """
    SELECT o_orderpriority AS grp,
           ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8))::BIGINT AS h
    FROM orders
    GROUP BY 1, 2
"""


def _hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            F.col("o_orderpriority").alias("grp"),
            _h32(F.col("o_custkey").cast("string")).alias("h"),
        )
        .distinct()
    )


@register(
    "sketch_distinct_kmv",
    oracle=f"""
    WITH hashes AS ({_SQL_HASHES}),
    ranked AS (
        SELECT grp, h,
               ROW_NUMBER() OVER (PARTITION BY grp ORDER BY h) AS rn
        FROM hashes
    ),
    sk AS (
        SELECT grp, MAX(h) AS kth, COUNT(*) AS n_in_sketch
        FROM ranked WHERE rn <= {_K}
        GROUP BY grp
    )
    SELECT grp, n_in_sketch,
           CASE WHEN n_in_sketch < {_K} THEN CAST(n_in_sketch AS DOUBLE)
                ELSE ({_K} - 1) * {_M!r} / CAST(kth AS DOUBLE)
           END AS est_distinct
    FROM sk
    ORDER BY grp
    """,
)
def sketch_distinct_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group KMV distinct estimate of customers per order priority:
    k smallest distinct hashes per group, closed-form estimator."""
    w = Window.partitionBy("grp").orderBy("h")
    return (
        _hashes(spark, sf_dir)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _K)
        .groupBy("grp")
        .agg(
            F.max("h").alias("kth"),
            F.count(F.lit(1)).alias("n_in_sketch"),
        )
        .select(
            "grp",
            "n_in_sketch",
            F.when(
                F.col("n_in_sketch") < _K,
                F.col("n_in_sketch").cast("double"),
            )
            .otherwise(
                F.lit(float(_K - 1)) * F.lit(_M) / F.col("kth").cast("double")
            )
            .alias("est_distinct"),
        )
        .orderBy("grp")
    )


@register(
    "sketch_distinct_merge",
    oracle=f"""
    WITH hashes AS (
        SELECT DISTINCT
               ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8))::BIGINT
                   AS h
        FROM orders
    ),
    ranked AS (
        SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn FROM hashes
    ),
    sk AS (
        SELECT MAX(h) AS kth, COUNT(*) AS n_in_sketch
        FROM ranked WHERE rn <= {_K}
    )
    SELECT n_in_sketch,
           CASE WHEN n_in_sketch < {_K} THEN CAST(n_in_sketch AS DOUBLE)
                ELSE ({_K} - 1) * {_M!r} / CAST(kth AS DOUBLE)
           END AS est_distinct
    FROM sk
    """,
)
def sketch_distinct_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch MERGE: per-shard (order-year) KMV sketches unioned into one
    global sketch — k smallest of the union of per-shard minima == k
    smallest of the global distinct set, so the merged estimate is
    IDENTICAL to a direct global sketch (the oracle computes it directly).
    This is the distributed pattern: shards never re-scan, the merge
    handles k*shards rows."""
    orders = load_table(spark, sf_dir, "orders")
    shard_w = Window.partitionBy("shard").orderBy("h")
    per_shard = (
        orders.select(
            F.year("o_orderdate").alias("shard"),
            _h32(F.col("o_custkey").cast("string")).alias("h"),
        )
        .distinct()
        .withColumn("rn", F.row_number().over(shard_w))
        .filter(F.col("rn") <= _K)
        .select("shard", "h")
    )
    merged_w = Window.orderBy("h")
    return (
        per_shard.select("h")
        .distinct()  # cross-shard duplicate hashes collapse on merge
        .withColumn("rn", F.row_number().over(merged_w))
        .filter(F.col("rn") <= _K)
        .agg(
            F.max("h").alias("kth"),
            F.count(F.lit(1)).alias("n_in_sketch"),
        )
        .select(
            "n_in_sketch",
            F.when(
                F.col("n_in_sketch") < _K,
                F.col("n_in_sketch").cast("double"),
            )
            .otherwise(
                F.lit(float(_K - 1)) * F.lit(_M) / F.col("kth").cast("double")
            )
            .alias("est_distinct"),
        )
    )


@register(
    "sketch_jaccard_kmv",
    oracle=f"""
    WITH hashes AS ({_SQL_HASHES}),
    grps AS (SELECT DISTINCT grp FROM hashes),
    pairs AS (
      SELECT a.grp AS ga, b.grp AS gb
      FROM grps a JOIN grps b ON a.grp < b.grp
    ),
    members AS (
      SELECT p.ga, p.gb, h.h,
             MAX(CASE WHEN h.grp = p.ga THEN 1 ELSE 0 END) AS in_a,
             MAX(CASE WHEN h.grp = p.gb THEN 1 ELSE 0 END) AS in_b
      FROM pairs p JOIN hashes h ON h.grp IN (p.ga, p.gb)
      GROUP BY 1, 2, 3
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY ga, gb ORDER BY h
      ) AS rn
      FROM members
    ),
    sk AS (
      SELECT ga, gb, COUNT(*) AS k_used,
             SUM(in_a * in_b) AS inter_sk
      FROM ranked WHERE rn <= {_K} GROUP BY 1, 2
    ),
    exact AS (
      SELECT ga, gb, COUNT(*) AS union_n, SUM(in_a * in_b) AS inter_n
      FROM members GROUP BY 1, 2
    )
    SELECT s.ga, s.gb, s.k_used,
           CAST(s.inter_sk AS DOUBLE) / s.k_used AS est_jaccard,
           CAST(e.inter_n AS DOUBLE) / e.union_n AS exact_jaccard
    FROM sk s JOIN exact e ON s.ga = e.ga AND s.gb = e.gb
    ORDER BY s.ga, s.gb
    """,
)
def sketch_jaccard_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-similarity estimation from KMV sketches: for every pair of order
    priorities, the Jaccard similarity of their customer sets estimated
    from the k smallest hashes of the UNION (fraction of the union sketch
    present in both sets — Beyer et al. SIGMOD'07 §5), reported next to
    the exact value so the driver row doubles as an accuracy audit.

    Why it matters at 100 TB: exact pairwise Jaccard between two huge key
    sets costs a full co-shuffle PER PAIR; KMV sketches are built once per
    set (k hashes each), and any pair's similarity comes from merging two
    k-sized summaries.  Deterministic by construction — md5 hashes, rank
    tie-breaks on the hash value — so the 'approximate' result is still
    bit-exact across engines.  The pair fanout here joins a 10-row pair
    relation (broadcast) against the deduped hash sets; everything heavier
    is a key-equality shuffle of the reduced (grp, hash) relation."""
    hashes = _hashes(spark, sf_dir)
    grps = hashes.select("grp").distinct()
    pairs = (
        grps.alias("a")
        .join(grps.alias("b"), F.col("a.grp") < F.col("b.grp"))
        .select(F.col("a.grp").alias("ga"), F.col("b.grp").alias("gb"))
    )
    members = (
        F.broadcast(pairs)
        .join(
            hashes,
            (F.col("grp") == F.col("ga")) | (F.col("grp") == F.col("gb")),
        )
        .groupBy("ga", "gb", "h")
        .agg(
            F.max((F.col("grp") == F.col("ga")).cast("int")).alias("in_a"),
            F.max((F.col("grp") == F.col("gb")).cast("int")).alias("in_b"),
        )
    )
    w = Window.partitionBy("ga", "gb").orderBy("h")
    sk = (
        members.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _K)
        .groupBy("ga", "gb")
        .agg(
            F.count(F.lit(1)).alias("k_used"),
            F.sum(F.col("in_a") * F.col("in_b")).alias("inter_sk"),
        )
    )
    exact = members.groupBy("ga", "gb").agg(
        F.count(F.lit(1)).alias("union_n"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("inter_n"),
    )
    return (
        sk.join(exact, ["ga", "gb"])
        .select(
            "ga",
            "gb",
            "k_used",
            (F.col("inter_sk").cast("double") / F.col("k_used")).alias(
                "est_jaccard"
            ),
            (F.col("inter_n").cast("double") / F.col("union_n")).alias(
                "exact_jaccard"
            ),
        )
        .orderBy("ga", "gb")
    )


# --- Count-Min-Sketch heavy hitters -------------------------------------------

_CMS_D = 4  # hash rows
_CMS_W = 512  # buckets per row
_CMS_TOPK = 20


@register(
    "sketch_cms_heavy_hitters",
    oracle=f"""
    WITH src AS (SELECT l_partkey AS k FROM lineitem),
    pairs AS (
      SELECT i.i AS i,
             ('0x' || substr(md5(i.i || ':' || k), 1, 8))::BIGINT
               % {_CMS_W} AS b
      FROM src, LATERAL (SELECT unnest(range(0, {_CMS_D})) AS i) i
    ),
    counters AS (SELECT i, b, COUNT(*) AS c FROM pairs GROUP BY 1, 2),
    exact AS (
      SELECT k, COUNT(*) AS exact_cnt FROM src GROUP BY k
      ORDER BY exact_cnt DESC, k LIMIT {_CMS_TOPK}
    ),
    probes AS (
      SELECT e.k, e.exact_cnt, i.i AS i,
             ('0x' || substr(md5(i.i || ':' || e.k), 1, 8))::BIGINT
               % {_CMS_W} AS b
      FROM exact e, LATERAL (SELECT unnest(range(0, {_CMS_D})) AS i) i
    )
    SELECT CAST(p.k AS BIGINT) AS part_key,
           CAST(p.exact_cnt AS BIGINT) AS exact_cnt,
           CAST(MIN(c.c) AS BIGINT) AS est_cnt,
           CAST(MIN(c.c) - p.exact_cnt AS BIGINT) AS overestimate
    FROM probes p JOIN counters c ON p.i = c.i AND p.b = c.b
    GROUP BY p.k, p.exact_cnt
    ORDER BY exact_cnt DESC, part_key
    """,
)
def sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min-Sketch frequency estimation, CALIBRATED against exact
    counts: a 4x512 integer counter matrix (one aggregation pass — each
    row fans into 4 (row, bucket) increments, map-side combined to at
    most 4*512 partials per task) estimates any key's frequency as the
    MIN over its 4 buckets.  The output probes the exact top-20 heavy
    hitters and reports estimate vs truth — CMS guarantees
    overestimate >= 0 (collisions only ADD), and the histogramed
    overestimate is the sketch-width acceptance test a pipeline runs
    before trusting CMS for rate limiting or heavy-hitter routing.
    All integer arithmetic on a shared md5-derived hash — bit-exact in
    both engines.

    Scale shape: the sketch build is ONE map-side-combinable aggregation
    whose shuffle is 4*512 partial counters per task regardless of data
    volume — the whole point of CMS at 100 TB (vs the exact GROUP BY
    whose shuffle is |keys|-sized); counters broadcast to the probe."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("k")
    )
    ks = F.col("k").cast("string")

    def bucket(i: int, key: "F.Column") -> "F.Column":
        return _h32(F.concat(F.lit(f"{i}:"), key)) % _CMS_W

    pairs = li.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"), bucket(i, ks).alias("b")
                    )
                    for i in range(_CMS_D)
                ]
            )
        ).alias("p")
    ).select("p.i", "p.b")
    counters = pairs.groupBy("i", "b").agg(F.count(F.lit(1)).alias("c"))
    exact = (
        li.groupBy("k")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), "k")
        .limit(_CMS_TOPK)
    )
    probes = exact.select(
        "k",
        "exact_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        bucket(i, F.col("k").cast("string")).alias("b"),
                    )
                    for i in range(_CMS_D)
                ]
            )
        ).alias("p"),
    ).select("k", "exact_cnt", "p.i", "p.b")
    return (
        probes.join(F.broadcast(counters), ["i", "b"])
        .groupBy("k", "exact_cnt")
        .agg(F.min("c").alias("est_cnt"))
        .select(
            F.col("k").cast("bigint").alias("part_key"),
            F.col("exact_cnt").cast("bigint").alias("exact_cnt"),
            F.col("est_cnt").cast("bigint").alias("est_cnt"),
            (F.col("est_cnt") - F.col("exact_cnt"))
            .cast("bigint")
            .alias("overestimate"),
        )
        .orderBy(F.desc("exact_cnt"), "part_key")
    )


# --- HyperLogLog with deterministic cross-engine registers -------------------

_HLL_B = 10  # bucket bits
_HLL_M = 1 << _HLL_B  # 1024 registers
_HLL_REST_BITS = 32 - _HLL_B  # 22 value bits per hash
_HLL_REST_MOD = 1 << _HLL_REST_BITS
_HLL_RHO_MAX = _HLL_REST_BITS + 1  # rho when the 22 value bits are all zero
_HLL_POW = 1 << _HLL_RHO_MAX  # 2^23: scaled-integer unit for 2^-rho sums
# alpha_m * m^2 * 2^23, folded to ONE double literal so the estimate is a
# single division in both engines (Flajolet et al. 2007 alpha for m >= 128)
_HLL_NUM = (0.7213 / (1.0 + 1.079 / _HLL_M)) * _HLL_M * _HLL_M * _HLL_POW


@register(
    "sketch_hll_distinct",
    oracle=f"""
    WITH hashes AS ({_SQL_HASHES}),
    reg AS (
        SELECT grp, h >> {_HLL_REST_BITS} AS bucket,
               MAX(CASE WHEN h % {_HLL_REST_MOD} = 0 THEN {_HLL_RHO_MAX}
                        ELSE {_HLL_RHO_MAX} - length(bin(h % {_HLL_REST_MOD}))
                   END) AS r
        FROM hashes GROUP BY 1, 2
    ),
    agg AS (
        SELECT grp, COUNT(*) AS nz,
               CAST(SUM({_HLL_POW} >> r) AS BIGINT) AS present_sum
        FROM reg GROUP BY grp
    ),
    ex AS (
        SELECT o_orderpriority AS grp,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_distinct
        FROM orders GROUP BY 1
    )
    SELECT a.grp,
           CAST(a.nz AS BIGINT) AS nz_buckets,
           CAST(a.present_sum + ({_HLL_M} - a.nz) * {_HLL_POW} AS BIGINT)
               AS reg_sum_scaled,
           {_HLL_NUM!r} / CAST(
               a.present_sum + ({_HLL_M} - a.nz) * {_HLL_POW} AS DOUBLE
           ) AS hll_est,
           ex.exact_distinct
    FROM agg a JOIN ex ON ex.grp = a.grp
    ORDER BY a.grp
    """,
)
def sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-count per order priority with DETERMINISTIC
    cross-engine registers: bucket = top 10 bits of the 32-bit md5 prefix,
    rho = leading-zero rank of the remaining 22 bits via length(bin(x)) —
    integer ops both engines implement identically.  The harmonic mean is
    kept EXACT by summing 2^(23-rho) as scaled BIGINTs (order-free integer
    addition, max 1024·2^23 = 2^33) instead of floating 2^-rho terms; the
    raw Flajolet estimate alpha·m²/Σ2^-rho is then ONE double division by
    the scaled sum — bit-identical in both engines.  No small-range
    correction (that needs ln(); KMV next door is the repo's exact-math
    estimator of record — this entry demonstrates the HLL register layout
    itself, plus its exact error vs COUNT(DISTINCT)).

    Scale shape vs KMV: registers are max-mergeable, so the map side
    reduces every partition to ≤ m rows per group BEFORE the exchange
    (partial MAX aggregation) — the shuffle carries O(groups · 1024)
    rows regardless of data size, strictly better than KMV's per-group
    top-k window, and sketches from different shards/days union by the
    same groupBy-MAX."""
    regs = (
        _hashes(spark, sf_dir)
        .select(
            "grp",
            F.shiftright(F.col("h"), _HLL_REST_BITS).alias("bucket"),
            (F.col("h") % _HLL_REST_MOD).alias("rest"),
        )
        .select(
            "grp",
            "bucket",
            F.when(F.col("rest") == 0, F.lit(_HLL_RHO_MAX))
            .otherwise(F.lit(_HLL_RHO_MAX) - F.length(F.bin(F.col("rest"))))
            .alias("rho"),
        )
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("r"))
    )
    agg = regs.groupBy("grp").agg(
        F.count(F.lit(1)).alias("nz"),
        F.sum(F.expr(f"shiftright({_HLL_POW}, r)")).alias("present_sum"),
    )
    exact = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderpriority").alias("grp"))
        .agg(
            F.count_distinct(F.col("o_custkey"))
            .cast("bigint")
            .alias("exact_distinct")
        )
    )
    scaled = F.col("present_sum") + (_HLL_M - F.col("nz")) * F.lit(_HLL_POW)
    return (
        agg.join(exact, "grp")
        .select(
            "grp",
            F.col("nz").cast("bigint").alias("nz_buckets"),
            scaled.cast("bigint").alias("reg_sum_scaled"),
            (F.lit(_HLL_NUM) / scaled.cast("double")).alias("hll_est"),
            "exact_distinct",
        )
        .orderBy("grp")
    )
