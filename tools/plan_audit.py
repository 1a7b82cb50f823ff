"""Generate PLANS.md: a physical-plan audit of the headline queries.

For each headline query (plus the heaviest TPC-H stream queries) this
captures, from the FORMATTED explain output:

- pushed filters and read schema at every parquet scan (predicate pushdown /
  column pruning evidence),
- join strategies chosen (broadcast vs shuffle),
- exchange (shuffle) count,
- WholeStageCodegen span count (JVM codegen coverage).

Run: ``python tools/plan_audit.py [sf_dir]`` (default sf0.001 — plan SHAPE
is scale-independent for these queries; AQE runtime re-planning is exercised
separately in tests).
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

AUDITED_EXTRA = [
    "tpch_q9",
    "tpch_q21",
    "j_bucketed_colocated",
    "ann_ivf_partitioned_topk",
    "dedup_minhash_lsh",
    "dedup_embedding_topk",
    "j_asof",
    "j_range",
    "a_time_rollup",
    "sample_stratified",
    "multimodal_png_real",
    "a_funnel",
    "a_concurrent",
    "sample_pps",
    "graph_pagerank",
    "text_bm25_topk",
    "j_skew_salted",
    "a_path_mining",
    "w_streak",
    "a_rolling_distinct",
    "dedup_incremental",
    "emb_quantize_int8",
    "j_scd2_pit",
    "dedup_containment",
    "dq_ks_two_sample",
    "dq_reconcile_totals",
    "dedup_edit_distance",
    "dedup_substring_windows",
    "text_token_df_score",
    "ann_filtered_topk",
    "sample_reservoir_hash",
    "emb_pca_power",
    "w_ewma_users",
    "sample_kcenter",
    "profile_autocorr",
    "w_cusum_drift",
    # round 7 additions
    "pack_chunk_spans",
    "graph_label_propagation",
    "dq_key_uniqueness",
    "dq_fd_check",
    "dedup_minhash_estimate_error",
    "ann_recall_eval",
    "stream_cdc_tombstones",
    "multimodal_tiff_real",
    "dedup_ngram_jaccard",
    "sample_split_leakage",
    "sketch_cms_heavy_hitters",
    "graph_common_neighbors",
    "graph_kcore",
    "sketch_hll_distinct",
    "multimodal_ico_real",
    "multimodal_webp_real",
    "stream_distinct_hll",
    "a_grouping_sets",
    "j_asof_nearest",
    "text_ngram_novelty",
    "ann_knn_label_eval",
    "multimodal_tiff_metadata",
    "dq_chi_square_drift",
    "stream_cms_topk",
    "snap_clone",
    "layout_kdtree_scan",
    "sample_group_holdout",
    "sample_balanced_classes",
    "multimodal_qoi_real",
    "text_bpe_pair_merge",
    "snap_partition_evolution",
    "j_interval_overlap",
    "graph_bfs_frontier",
    "emb_random_projection",
    "text_vocab_growth",
    "snap_row_lineage",
    "multimodal_flac_real",
    "multimodal_zip_real",
    "dq_sequence_gaps",
    "sample_epoch_shuffle",
    "snap_orphan_files",
    "multimodal_targz_real",
    "a_weighted_median",
    "j_scd2_build",
    "ann_ivf_recall_sweep",
    "emb_matryoshka_eval",
    "stream_late_drop",
    "snap_cherrypick",
    "a_trend_slope",
    "graph_assortativity",
    "snap_version_drift",
    "multimodal_pdf_metadata",
    "snap_history_audit",
    "ann_pq_distortion_eval",
    "pack_truncation_loss",
    "emb_outlier_score",
    "profile_bootstrap_ci",
    "w_max_drawdown",
    "text_sentence_dedup",
    "text_window_cooccurrence",
    "a_share_of_total",
    # round 8 additions
    "advisor_table_ranking",
    "advisor_column_sets",
    "graph_degree_histogram",
    "emb_cluster_purity",
    "sample_importance_weighted",
    "text_oov_rate",
    "snap_constraints",
    "advisor_workload_coverage",
    # round 11 additions
    "ann_pq_topk",
    "layout_skipping_stats",
    # round 12 additions (labels now read from the fingerprint cache;
    # layout_drift_stats is headline so it is audited automatically)
    "dedup_components",
    "dedup_keep_canonical",
    "sample_mixture_temperature",
    "layout_scoped_upsert_stats",
]

#: intended-plan annotations for rows that would otherwise read as
#: violations of the repo's own discipline
ANNOTATIONS = {
    "graph_common_neighbors": (
        "plan shown is the steady-state (edge-cache-present) variant: the "
        "graph family extracts co-occurrence edges ONCE per dataset "
        "fingerprint, so after the first run every consumer reads the "
        "|E|-sized parquet cache instead of re-deriving from "
        "lineitem⋈orders; the adjacency anti-join's broadcast is "
        "SIZE-GATED (r10): the |E|-sized build side broadcasts only while "
        "the probe-measured edge count stays under _CN_BCAST_MAX_EDGES "
        "(8M ≈ 256 MiB hashed), beyond which it falls back to a shuffled "
        "anti-join — guarded by test_common_neighbors_broadcast_is_size_gated"
    ),
    "ann_pq_topk": (
        "round 13: assignment + ADC run in vectorized Arrow kernels over "
        "driver-collected codebooks (the production shape) — the codebook "
        "broadcast joins, the codes explode, the LUT join and the pivot "
        "groupBy are gone; 0 parquet scans because the valid-vector "
        "relation is checkpointed once, and the one remaining "
        "BroadcastHashJoin attaches the TakeOrdered ADC shortlist for "
        "the exact re-rank"
    ),
    "dedup_keep_canonical": (
        "plan shown is the steady-state (label-cache-present) variant "
        "(r11 verdict task 2): the cluster-label relation is materialized "
        "once per dataset fingerprint by _component_labels, so this plan "
        "is one corpus scan + a broadcast left join against the "
        "|clustered|-sized dropped set read from the cache — the LSH + "
        "pointer-doubling chain no longer re-runs here"
    ),
    "dedup_components": (
        "plan shown is the steady-state (label-cache-present) variant: a "
        "single scan of the fingerprint-cached (doc_id, component) "
        "parquet; the pointer-doubling build plan executes once per "
        "fingerprint inside _component_labels_build"
    ),
    "layout_drift_stats": (
        "plan shown is the steady-state (state-cache-present) census: 4 "
        "per-state pairs of (full count × pruned box count) over the "
        "materialized post-ingest tables, unioned; the ingest loop "
        "(keyed_upsert × 3 + zorder rewrites) executes once per dataset "
        "fingerprint and its observables land in drift_metrics.json"
    ),
    "layout_scoped_upsert_stats": (
        "plan shown is the steady-state census over the post-upsert "
        "table: one full-count/band-count aggregate × one pruned box "
        "count; the file-scoped rewrite (scoped_upsert: band files + "
        "batch only, untouched files byte-preserved) executes once per "
        "dataset fingerprint with its counters in scoped_metrics.json"
    ),
    "dq_chi_square_drift": (
        "the BroadcastNestedLoopJoins are the intended bounded crossJoins "
        "of the chi-square grid (|years|×2 category grid, grand-total N "
        "scalar; both sides O(10) rows) — never relation×relation"
    ),
    "sample_group_holdout": (
        "the BroadcastNestedLoopJoin×1 is the intended 1-row broadcast of "
        "the split-totals scalar for the in-output proof columns "
        "(condition-less crossJoin, bounded)"
    ),
    "advisor_column_sets": (
        "the BroadcastNestedLoopJoins are the intended combination "
        "enumeration over the ≤12-row candidate POOL (inequality-only "
        "self-joins cname<cname over a localCheckpointed 12-row relation, "
        "plus 1-row stat broadcasts) — bounded by the pool cap, never "
        "relation×relation; 0 parquet scans here because the pool job "
        "(which scans lineitem once with pushed pruning) is materialized "
        "before this plan"
    ),
    "ann_knn_label_eval": (
        "the BroadcastNestedLoopJoin×1 is the intended broadcast of the "
        "FIXED 300-row eval-budget query block against the corpus "
        "(non-equi self-exclusion vec_id != q_id) — bounded by the "
        "budget, never relation×relation"
    ),
    "sample_importance_weighted": (
        "the BroadcastNestedLoopJoin×1 is the intended 1-row broadcast of "
        "the max-weight scalar (condition-less crossJoin, bounded)"
    ),
    "graph_kcore": (
        "the BroadcastNestedLoopJoin×3 are the intended per-round 1-row "
        "stats×edge-count crossJoins (condition-less, 1 row each side, "
        "bounded) — never relation×relation"
    ),
    "graph_bfs_frontier": (
        "the BroadcastNestedLoopJoin×3 are the intended per-round 1-row "
        "stats×reached-count crossJoins (condition-less, 1 row each side, "
        "bounded) — never relation×relation"
    ),
    "ann_ivf_partitioned_topk": (
        "round 13: the collected query row is inlined as literals, so the "
        "former 1-row query-vector broadcast (and its second source scan) "
        "is gone — the plan is the 9-partition pruned scan + TakeOrdered"
    ),
    "ann_bruteforce_topk": (
        "same intended 1-row query-vector broadcast as "
        "ann_ivf_partitioned_topk"
    ),
    "sample_pps": (
        "the BroadcastNestedLoopJoin×1 is the intended 1-row broadcast of "
        "the stride scalar (condition-less crossJoin, bounded)"
    ),
    "j_scd2_pit": (
        "round 13: the three SCD2 version legs are ONE customer scan + a "
        "per-row explode of the (version, modulus, delta, valid_from) "
        "literals (was three filtered scans glued with UNION ALL); the "
        "as-of-carry union → single exchange → running-window shape is "
        "unchanged"
    ),
    "graph_triangle_count": (
        "the p1-clustered edge list is materialized once "
        "(materialize_once, r13 — was .cache() with no unpersist), so the "
        "wedge self-join stays co-partitioned with zero exchanges and the "
        "blocks are released when the frame is collected"
    ),
    "j_skew_salted": (
        "shuffle_hash is PINNED on the orders side: at bench SF Catalyst "
        "would broadcast it, and a broadcastable side never needs salting "
        "— the demo exercises the too-big-to-broadcast shape the operator "
        "exists for"
    ),
    "ann_filtered_topk": (
        "same intended 1-row query-vector broadcast as ann_bruteforce_topk; "
        "the label predicate shows in PushedFilters BEFORE scoring — the "
        "pre-filter contract"
    ),
    "emb_pca_power": (
        "the BroadcastNestedLoopJoins are the intended 1-row direction-"
        "vector broadcasts (one per power-iteration step, condition-less, "
        "bounded)"
    ),
    "dq_ks_two_sample": (
        "the BroadcastNestedLoopJoin×1 is the intended 1-row broadcast of "
        "the (N_a, N_b) totals scalar (condition-less crossJoin, bounded); "
        "round 13 materializes the per-value prefix-sum relation once — "
        "it feeds both the broadcast carry side and the final gap join, "
        "which a shuffle-reuse cannot dedup (0 scans, exchanges 11→7)"
    ),
    "sample_kcenter": (
        "the BroadcastNestedLoopJoins are the intended 1-row center "
        "broadcasts (one per greedy round, condition-less, bounded)"
    ),
    "w_cusum_drift": (
        "the BroadcastNestedLoopJoin×1 is the intended 1-row broadcast of "
        "the (n, total) scalar (condition-less crossJoin, bounded)"
    ),
    "ann_ivf_recall_sweep": (
        "the BroadcastNestedLoopJoins are the intended per-radius 1-row "
        "hits×n_queries×cand_pairs crossJoins (condition-less, 1 row each "
        "side, bounded) plus the query-sample broadcast — never "
        "relation×relation"
    ),
    "emb_matryoshka_eval": (
        "the BroadcastNestedLoopJoins are the intended per-width 1-row "
        "n_queries×hits×top1 crossJoins plus the query-sample broadcast "
        "(condition-less, bounded) — never relation×relation"
    ),
    "snap_version_drift": (
        "the BroadcastNestedLoopJoins are the intended bounded crossJoins "
        "of the chi-square grid (|years|×2 category grid, grand-total N "
        "scalar; both sides O(10) rows) — same shape as "
        "dq_chi_square_drift, never relation×relation"
    ),
    "ann_pq_distortion_eval": (
        "round 12 fused the 4 per-subspace Lloyd pipelines into one "
        "exploded (vec_id, s, e) relation; round 13 moved both assignment "
        "passes into the vectorized Arrow argmin kernel over the "
        "driver-collected codebook — the codebook joins and the "
        "groupBy(vec_id, s) min_by exchanges are gone; 0 parquet scans "
        "because the exploded relation is localCheckpointed"
    ),
    "dedup_minhash_lsh": (
        "0 parquet scans by design (round 12): the n-gram and minhash-"
        "signature relations are localCheckpointed, so the band self-join "
        "and both exact-Jaccard verify joins read one materialization "
        "each instead of re-deriving the tokenize + signature subtree "
        "per side; the signature fold runs in the vectorized Arrow "
        "kernel (_mh_arrow_kernel, bit-identical to the JVM fold)"
    ),
    "dedup_incremental": (
        "same round-12 checkpointed front end as dedup_minhash_lsh: one "
        "n-gram materialization + one Arrow-kernel signature pass feed "
        "the batch/corpus band split and both verify joins"
    ),
    "dedup_embedding_topk": (
        "round 12: the valid-vector relation is width-repartitioned and "
        "localCheckpointed (hence 0 scans in this plan); the 67x probe "
        "explosion carries only (a_id, pcell) 16-byte rows and the query "
        "payload is re-attached by one vec_id-keyed join — shuffle keys, "
        "not payloads.  Round 13: candidates are scored in the "
        "_cosv_pair_kernel MapInArrow stage (bit-identical fold), which "
        "is also the barrier that stops Catalyst evaluating the cosine "
        "twice (tau filter below the scoring projection)"
    ),
    "text_bm25_topk": (
        "the BroadcastNestedLoopJoin×1 is the intended 1-row broadcast of "
        "the corpus (N, L) statistics frame; 0 parquet scans because the "
        "tokenized corpus is localCheckpointed once (round 12) — dl is "
        "size() on the token array (no full-corpus explode shuffle), tf "
        "explodes only the array_filter'd query terms.  Round 13: dl "
        "rides the tf rows (first(dl) per group), so the tf⋈dl join — "
        "which moved the full per-doc-length relation — is gone"
    ),
    "dedup_minhash_estimate_error": (
        "0 parquet scans: the hg-augmented n-gram relation was already "
        "localCheckpointed pre-r12; round 12 moved its signature side to "
        "the Arrow kernel"
    ),
    "dedup_simhash": (
        "0 parquet scans: the (doc_id, source, sim) relation from the "
        "vectorized simhash kernel is localCheckpointed (round 12), so "
        "the band self-join reads one materialization"
    ),
    "dedup_saturation_stats": (
        "the gram census and per-doc-rare branches read the checkpointed "
        "exploded-gram relation; the simhash branch is the round-12 "
        "Arrow kernel over one documents scan"
    ),
    "a_share_of_total": (
        "the BroadcastNestedLoopJoin×1 is the intended 1-row broadcast of "
        "the grand-total scalar (condition-less crossJoin, bounded) — the "
        "percent-of-total shape that avoids a partition-less window"
    ),
    "sample_balanced_classes": (
        "the BroadcastNestedLoopJoin×1 is the intended 1-row broadcast of "
        "the min-class-count quota scalar (condition-less crossJoin, "
        "bounded)"
    ),
}


def audit(spark, name: str, fn, sf_dir: str) -> dict:
    df = fn(spark, sf_dir)
    plan = spark.sparkContext._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    pushed = [
        m.group(1).strip()
        for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan)
    ]
    read_schemas = re.findall(r"ReadSchema: (struct<[^\n]*)", plan)
    scans = len(read_schemas)  # every file scan prints a ReadSchema
    joins = re.findall(
        r"\((\d+)\) (BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)",
        plan,
    )
    exchanges = len(re.findall(r"\(\d+\) Exchange\b", plan))
    # codegen region ids ("*(N) Op") only appear in the FINAL adaptive plan,
    # which AQE materializes when THIS DataFrame's QueryExecution runs
    # (a count() would execute a separate plan and leave this one pre-final)
    df.collect()
    simple = df._jdf.queryExecution().executedPlan().toString()
    codegen = len(set(re.findall(r"\*\((\d+)\)", simple)))
    join_kinds: dict[str, int] = {}
    for _, kind in joins:
        join_kinds[kind] = join_kinds.get(kind, 0) + 1
    return {
        "pushed": [s for s in pushed if s],
        "scans": scans,
        # per-scan projected column count (top-level fields only; none of
        # the test tables nest structs)
        "read_cols": [s.count(":") for s in read_schemas],
        "joins": join_kinds,
        "exchanges": exchanges,
        "codegen_spans": codegen,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from lakehouse_sfc_spark.queries.registry import QUERIES
    import lakehouse_sfc_spark.queries  # noqa: F401
    from lakehouse_sfc_spark.session import get_spark

    spark = get_spark(app_name="plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    names = sorted(
        {n for n, s in QUERIES.items() if s.headline} | set(AUDITED_EXTRA)
    )
    lines = [
        "# PLANS — physical-plan audit of headline queries",
        "",
        f"Auto-generated by `python tools/plan_audit.py` at `{sf_dir}`.",
        "Plan shape (pushdown, join strategy, shuffle count, codegen "
        "coverage) is the scale contract; AQE adjusts sizes at runtime.",
        "",
        "| query | scans | pushed-filter scans | cols/scan | joins |"
        " shuffles | codegen spans |",
        "|---|---|---|---|---|---|---|",
    ]
    for name in names:
        a = audit(spark, name, QUERIES[name].fn, sf_dir)
        joins = (
            ", ".join(f"{k}×{v}" for k, v in sorted(a["joins"].items()))
            or "—"
        )
        note = f" ^[{ANNOTATIONS[name]}]" if name in ANNOTATIONS else ""
        lines.append(
            f"| {name} | {a['scans']} | {len(a['pushed'])} |"
            f" {a['read_cols']} | {joins}{note} | {a['exchanges']} |"
            f" {a['codegen_spans']} |"
        )
    lines += [
        "",
        "Reading the table:",
        "",
        "- **pushed-filter scans**: parquet scans whose `PushedFilters` is",
        "  non-empty — selective predicates reach the reader.",
        "- **cols/scan**: projected column count per scan (`ReadSchema`) —",
        "  column pruning; the widest tables here have 11 columns.",
        "- **joins**: `BroadcastHashJoin` for dims (no fact shuffle);",
        "  `SortMergeJoin` only where both sides are fact-sized.",
        "- **shuffles**: `Exchange` nodes in the initial plan; AQE may",
        "  coalesce/reuse at runtime (bucketed/partitioned variants plan 0-1).",
        "- **codegen spans**: distinct WholeStageCodegen regions — the hot",
        "  path stays JVM-compiled.",
    ]
    out = _REPO / "PLANS.md"
    out.write_text("\n".join(lines) + "\n", encoding="utf-8")
    print(f"wrote {out} ({len(names)} queries)")
    spark.stop()


if __name__ == "__main__":
    main()
