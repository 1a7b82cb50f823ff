"""Graph analytics over derived co-occurrence graphs — beyond the
reference (its engines have no graph surface), sibling of
`dedup_components` (queries/datapipe.py): where components label the
near-dup pair graph, these queries measure the structure of an
item-co-occurrence graph a recommender/feature pipeline would build.

Graph: vertices = parts, undirected edge (p1, p2) iff both parts appear
in the same order (distinct pairs from a per-order self-join of
lineitem).  The per-order fan-out is bounded (≤ 7 lineitems per TPC-H
order → ≤ 21 pairs), so edge generation is a key-equality self-join that
scales linearly with orders — never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_sfc_spark.queries.registry import register
from lakehouse_sfc_spark.sources.loader import compute_width, load_table

_SQL_EDGES = """
    SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
    FROM lineitem a
    JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
"""


def _edges_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    a = li.alias("a")
    b = li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("p1"), F.col("b.l_partkey").alias("p2")
        )
        .distinct()
    )


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distinct co-occurrence edge relation, MATERIALIZED once per
    dataset fingerprint (the standard big-graph split: the data-sized
    pair-extraction stage is shared by every graph query, so extract once
    and let all consumers iterate on the reduced |E|-sized graph).  The
    cache key folds the source dataset's (mtime, size) fingerprint, so a
    regenerated dataset never serves stale edges — same discipline as the
    IVF cell cache (queries/datapipe.py::ann_ivf_partitioned_topk)."""
    import os as _os

    from lakehouse_sfc_spark.queries.layouts import _fingerprinted_dir

    repo = _os.path.dirname(_os.path.dirname(_os.path.dirname(__file__)))
    path = _fingerprinted_dir(
        _os.path.join(repo, ".scratch", "graph_edges", "v1"),
        sf_dir,
        ("lineitem",),
    )
    if not _os.path.exists(_os.path.join(path, "_SUCCESS")):
        _edges_build(spark, sf_dir).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


@register(
    "graph_triangle_count",
    oracle=f"""
    WITH edges AS ({_SQL_EDGES}),
    tri AS (
        SELECT COUNT(*) AS triangles
        FROM edges e1
        JOIN edges e2 ON e2.p1 = e1.p1 AND e2.p2 > e1.p2
        JOIN edges e3 ON e3.p1 = e1.p2 AND e3.p2 = e2.p2
    ),
    deg AS (
        SELECT p, COUNT(*) AS d FROM (
            SELECT p1 AS p FROM edges UNION ALL SELECT p2 FROM edges
        ) GROUP BY p
    ),
    agg AS (
        SELECT COUNT(*) AS n_vertices,
               SUM(d * (d - 1) / 2) AS wedges
        FROM deg
    )
    SELECT (SELECT COUNT(*) FROM edges) AS n_edges,
           agg.n_vertices,
           tri.triangles,
           CASE WHEN agg.wedges > 0
                THEN 3.0 * tri.triangles / CAST(agg.wedges AS DOUBLE)
                ELSE 0.0 END AS clustering_coeff
    FROM tri, agg
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + global clustering coefficient of the part
    co-purchase graph.  Triangles are enumerated once each via the ordered
    two-join (u<v<w): out-edge pairs of u joined against the closing edge
    — two hash shuffles on vertex keys, no all-pairs stage.

    Scale note: on a power-law graph the (u<v<w) orientation leaves hub
    vertices with huge out-degree; the production refinement is
    degree-ordering (orient each edge toward the higher-degree endpoint —
    compact-forward, Latapy 2008), which bounds every out-degree by
    O(sqrt(|E|)) and is the same plan shape with one extra tiny join
    against the degree table."""
    # hash-cluster the edge list on p1 ONCE (core-count width, not the
    # session's shuffle width) and cache: the wedge self-join e1⋈e2 is then
    # co-partitioned — zero exchanges — and every other consumer reuses the
    # cached layout
    edges = (
        _edges(spark, sf_dir)
        .repartition(compute_width(spark), "p1")
        .cache()
    )
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    e3 = edges.alias("e3")
    tri = (
        e1.join(
            e2,
            (F.col("e2.p1") == F.col("e1.p1"))
            & (F.col("e2.p2") > F.col("e1.p2")),
        )
        # closing-edge probe: broadcast the edge list (2 longs/row — an
        # 80 MB relation per 5M edges).  On a graph too big to broadcast,
        # keep the same plan with a hash join after degree-ordering
        # (compact-forward) — the wedge side stays the big side either way.
        .join(
            F.broadcast(e3),
            (F.col("e3.p1") == F.col("e1.p2"))
            & (F.col("e3.p2") == F.col("e2.p2")),
        )
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    deg = (
        edges.select(F.col("p1").alias("p"))
        .unionAll(edges.select(F.col("p2").alias("p")))
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    agg = deg.agg(
        F.count(F.lit(1)).alias("n_vertices"),
        F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("wedges"),
    )
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    out = (
        n_edges.crossJoin(agg)
        .crossJoin(tri)
        .select(
            "n_edges",
            "n_vertices",
            "triangles",
            F.when(
                F.col("wedges") > 0,
                F.lit(3.0)
                * F.col("triangles")
                / F.col("wedges").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("clustering_coeff"),
        )
    )
    return out


_PR_SCALE = 1_000_000_000_000  # 1e12: ranks as scaled integers -> exact math

_SQL_PR_EDGES = """
    SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    WHERE c.c_nationkey <> s.s_nationkey
"""

_SQL_PR_ITER = """
    SELECT n.node,
           CAST({base} + COALESCE(SUM(CAST(FLOOR(
               r.rank_scaled * 85 / (100.0 * d.outdeg)
           ) AS BIGINT)), 0) AS BIGINT) AS rank_scaled
    FROM nodes n
    LEFT JOIN edges e ON e.dst = n.node
    LEFT JOIN {prev} r ON r.node = e.src
    LEFT JOIN outd d ON d.src = e.src
    GROUP BY n.node
"""


@register(
    "graph_pagerank",
    oracle=f"""
    WITH edges AS MATERIALIZED ({_SQL_PR_EDGES}),
    nodes AS (SELECT n_nationkey AS node FROM nation),
    outd AS MATERIALIZED (
        SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src
    ),
    r0 AS (SELECT node, {_PR_SCALE // 25} AS rank_scaled FROM nodes),
    r1 AS ({_SQL_PR_ITER.format(base=_PR_SCALE * 15 // 2500, prev="r0")}),
    r2 AS ({_SQL_PR_ITER.format(base=_PR_SCALE * 15 // 2500, prev="r1")}),
    r3 AS ({_SQL_PR_ITER.format(base=_PR_SCALE * 15 // 2500, prev="r2")})
    SELECT r3.node, n.n_name, r3.rank_scaled,
           CAST(r3.rank_scaled AS DOUBLE) / {_PR_SCALE} AS rank
    FROM r3 JOIN nation n ON n.n_nationkey = r3.node
    ORDER BY r3.rank_scaled DESC, r3.node
    """,
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, 3 fixed iterations) over the nation trade
    graph: edge cust-nation -> supp-nation iff any order shipped between
    them.  The expensive, data-sized stage is EDGE EXTRACTION — a
    lineitem⋈orders⋈customer⋈supplier pipeline (dims broadcast, one fact
    shuffle) reduced to ≤ 25×24 distinct pairs and localCheckpointed so
    the 3 unrolled iterations never rescan the fact table.  Iterations
    then run on the reduced graph (the standard big-graph split: heavy
    extract once, iterate on vertices/edges only — same discipline as
    dedup_components).

    Cross-engine exactness without floats: ranks are integers scaled by
    1e12.  Each contribution floor(r·85/(100·outdeg)) keeps every product
    ≤ 8.5e13 < 2^53, so the doubles inside the division are exact, the
    one division is correctly rounded, and floor lands both engines on
    the same integer.  Dangling-node mass is dropped identically on both
    sides (LEFT joins), so ranks sum below 1.0 — documented PageRank-
    with-leak semantics, bit-identical."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation")

    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .filter(c.c_nationkey != s.s_nationkey)
        .select(
            c.c_nationkey.alias("src"), s.s_nationkey.alias("dst")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = nation.select(F.col("n_nationkey").alias("node"))
    outd = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))

    base = _PR_SCALE * 15 // 2500
    ranks = nodes.select("node", F.lit(_PR_SCALE // 25).alias("rank_scaled"))
    for _ in range(3):
        # outd / ranks / the contribution aggregate are all ≤ |V| rows —
        # broadcast them so an iteration is 3 broadcast joins + one tiny
        # aggregate, never a SortMergeJoin cascade (post-checkpoint Spark
        # has no stats, so without hints it picks SMJ).
        contrib = (
            edges.join(F.broadcast(outd), "src")
            .join(
                F.broadcast(ranks.withColumnRenamed("node", "src")), "src"
            )
            .select(
                "dst",
                F.floor(
                    F.col("rank_scaled") * 85 / (F.col("outdeg") * 100.0)
                ).alias("contrib"),
            )
        )
        ranks = (
            nodes.join(
                F.broadcast(
                    contrib.groupBy("dst").agg(
                        F.sum("contrib").alias("in_mass")
                    )
                ),
                nodes.node == F.col("dst"),
                "left",
            )
            .select(
                "node",
                (F.lit(base) + F.coalesce(F.col("in_mass"), F.lit(0))).alias(
                    "rank_scaled"
                ),
            )
        )
    return (
        ranks.join(
            F.broadcast(nation), ranks.node == nation.n_nationkey
        )
        .select(
            "node",
            "n_name",
            "rank_scaled",
            (F.col("rank_scaled").cast("double") / _PR_SCALE).alias("rank"),
        )
        .orderBy(F.desc("rank_scaled"), "node")
    )


@register(
    "graph_basket_lift",
    oracle="""
    WITH op AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM op),
    pc AS (SELECT l_partkey, COUNT(*) AS c FROM op GROUP BY 1),
    pairs AS (
      SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS pair_cnt
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT p.p1, p.p2, p.pair_cnt,
             CAST(p.pair_cnt * n.n_orders AS DOUBLE) / (ca.c * cb.c) AS lift
      FROM pairs p
      JOIN pc ca ON ca.l_partkey = p.p1
      JOIN pc cb ON cb.l_partkey = p.p2
      CROSS JOIN n
      WHERE p.pair_cnt >= 2
    )
    SELECT p1, p2, pair_cnt, lift
    FROM scored
    ORDER BY lift DESC, p1, p2
    LIMIT 20
    """,
)
def graph_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity: the 20 part pairs with the highest lift
    (P(a,b)/P(a)P(b)) among pairs bought together at least twice — the
    statistic association-rule mining and co-purchase recommenders start
    from.

    lift = pair_cnt·N / (cₐ·c_b) is an integer ratio with ONE double
    division — bit-identical across engines.  Pair generation is the
    bounded per-order self-join (≤ 7 lineitems per TPC-H order → ≤ 21
    pairs), never a part×part cross; the counts are two reductions of the
    deduped (order, part) relation; the top-20 is TakeOrderedAndProject.
    At 100 TB the same shape holds for session×item logs — the per-basket
    fanout bound is what keeps it linear."""
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    n = op.agg(F.count_distinct(F.col("l_orderkey")).alias("n_orders"))
    pc = op.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c"))
    a, b = op.alias("a"), op.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("p1"),
            F.col("b.l_partkey").alias("p2"),
        )
        .agg(F.count(F.lit(1)).alias("pair_cnt"))
        .filter(F.col("pair_cnt") >= 2)
    )
    ca = pc.select(F.col("l_partkey").alias("p1"), F.col("c").alias("c1"))
    cb = pc.select(F.col("l_partkey").alias("p2"), F.col("c").alias("c2"))
    return (
        pairs.join(F.broadcast(ca), "p1")
        .join(F.broadcast(cb), "p2")
        .crossJoin(F.broadcast(n))
        .select(
            "p1",
            "p2",
            "pair_cnt",
            (
                (F.col("pair_cnt") * F.col("n_orders")).cast("double")
                / (F.col("c1") * F.col("c2"))
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "p1", "p2")
        .limit(20)
    )


# --- synchronous min-label propagation ---------------------------------------

_LP_ROUNDS = 3


def _sql_lp_round(k: int) -> str:
    """One unrolled propagation round: l_k(v) = least(l_{k-1}(v),
    min over neighbors of l_{k-1})."""
    return f"""
    l{k} AS (
      SELECT l.v, LEAST(l.lbl, MIN(n.lbl)) AS lbl
      FROM l{k - 1} l JOIN und e ON e.s = l.v JOIN l{k - 1} n ON n.v = e.d
      GROUP BY l.v, l.lbl
    )"""


@register(
    "graph_label_propagation",
    oracle=f"""
    WITH edges AS ({_SQL_EDGES}),
    und AS (SELECT p1 AS s, p2 AS d FROM edges
            UNION ALL SELECT p2 AS s, p1 AS d FROM edges),
    l0 AS (SELECT DISTINCT s AS v, s AS lbl FROM und),
    {",".join(_sql_lp_round(k) for k in range(1, _LP_ROUNDS + 1))}
    SELECT CAST(lbl AS BIGINT) AS community,
           COUNT(*) AS n_vertices,
           CAST(SUM(v) AS BIGINT) AS vertex_checksum
    FROM l{_LP_ROUNDS} GROUP BY lbl ORDER BY community
    """,
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by SYNCHRONOUS min-label propagation, 3 rounds:
    every vertex starts as its own label and repeatedly adopts the minimum
    label in its closed neighborhood, so after k rounds a vertex carries
    the smallest vertex id within graph distance k — a deterministic,
    integer-exact variant of LPA (classic LPA's random tie-breaking is
    non-reproducible; min is associative, commutative, and engine-stable).
    The fixed round count is the streaming/batch-friendly form: k bounds
    the influence radius, and communities are 'k-hop min-basins'.
    Output pins membership (vertex_checksum), not just sizes.

    Scale shape: per round ONE broadcast of the (v, lbl) relation onto the
    edge list keyed by neighbor + one groupBy on the vertex — labels are
    |V|-sized (small side) while edges are |E|-sized and never move; at
    100 TB (labels too big to broadcast) each round becomes a shuffle join
    on the SAME key both sides, so the edge relation partitions once and
    every round reuses it (the pointer-doubling alternative for huge
    diameters lives in dedup_components)."""
    e = _edges(spark, sf_dir)
    und = (
        e.select(F.col("p1").alias("s"), F.col("p2").alias("d"))
        .union(e.select(F.col("p2").alias("s"), F.col("p1").alias("d")))
        .localCheckpoint(eager=False)
    )
    lbl = und.select(F.col("s").alias("v")).distinct().select(
        "v", F.col("v").alias("lbl")
    )
    for _ in range(_LP_ROUNDS):
        nmin = (
            und.join(
                F.broadcast(
                    lbl.select(F.col("v").alias("d"), F.col("lbl").alias("nl"))
                ),
                "d",
            )
            .groupBy("s")
            .agg(F.min("nl").alias("nmin"))
        )
        lbl = (
            lbl.join(nmin.select(F.col("s").alias("v"), "nmin"), "v")
            .select("v", F.least("lbl", "nmin").alias("lbl"))
            .localCheckpoint(eager=False)
        )
    return (
        lbl.groupBy("lbl")
        .agg(
            F.count(F.lit(1)).alias("n_vertices"),
            F.sum("v").cast("bigint").alias("vertex_checksum"),
        )
        .select(
            F.col("lbl").cast("bigint").alias("community"),
            "n_vertices",
            "vertex_checksum",
        )
        .orderBy("community")
    )
