"""Regenerate PLANS.md: physical-plan evidence for the headline queries.

    python tests/gen_plans.py

Captures `.explain('formatted')` at sf0.01 for every bench.HEADLINE query
(plus ts_profile_similarity, whose pair-stage bound is a standing VERDICT
item), filtered to the lines that prove the scale claims: joins,
exchanges, aggregates (partial vs final), pushed filters, and any banned
node (CartesianProduct / BroadcastNestedLoopJoin / BatchEvalPython) —
which also fail tests/test_plan_hygiene.py.
"""

from __future__ import annotations

import io
import re
import sys
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF = "/root/testdata/sf0.01"

KEEP = re.compile(
    r"Exchange|HashAggregate|SortAggregate|ObjectHashAggregate|"
    r"BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoop|"
    r"CartesianProduct|BatchEvalPython|ArrowEvalPython|PushedFilters|"
    r"partial_|TakeOrderedAndProject|MapInPandas|Window"
)

HEADER = """# PLANS — physical-plan evidence for the headline queries

Generated at sf0.01 by `python tests/gen_plans.py`
(`.explain('formatted')`, filtered to join/exchange/aggregate/pushdown
lines). What to look for: dims broadcast, filters pushed to scans, partial
aggregates before every Exchange, and the absence of CartesianProduct /
BroadcastNestedLoopJoin / BatchEvalPython anywhere — the same properties
tests/test_plan_hygiene.py and test_shuffle_volume.py assert on every run.
"""


def main() -> None:
    from bench import HEADLINE
    from kinesis_stream_consumer_spark.plans import QUERIES
    from kinesis_stream_consumer_spark.session import get_spark

    spark = get_spark("gen-plans")
    spark.sparkContext.setLogLevel("ERROR")

    names = list(HEADLINE) + [
        "ts_profile_similarity",
        "text_boilerplate_segments",
        "sim_lexical_sparse_topk",
        "text_dup_ngram_coverage",
        "dedup_containment",
        "dedup_media_chunks",
        "sim_random_projection_topk",
        "sim_ann_recall_eval",
        "events_sessionize",
        "text_heavy_hitters_cms",
        "dedup_minhash_lsh_blocked",
        "sim_label_centroid_matrix",
        "dedup_method_agreement",
        # r5 sketch suite + analytics closers
        "agg_hll_distinct",
        "agg_histogram_quantiles",
        "agg_hll_overlap",
        "curation_bloom_novelty",
        "text_collocations_lift",
        "events_markov_transitions",
        "events_rfm_segments",
        # r6 TPC-H closers + text/curation additions
        "q2_min_cost_supplier",
        "q4_order_priority",
        "q13_customer_distribution",
        "q16_supplier_variety",
        "q18_large_orders",
        "q22_global_sales_opportunity",
        "text_bm25_topk",
        "text_ttr_hapax",
        "curation_interleave",
        "engine_hll_distinct_sketch",
        "text_script_shares",
        "text_source_lift_classifier",
        "events_path_trigrams",
        "curation_token_budget_mix",
        "sim_nprobe_recall_sweep",
        "text_tokenizer_fertility",
        "curation_filter_funnel",
        # r7 decorrelations + sketch/join additions + engine sketches
        "q17_small_quantity_revenue",
        "q21_suppliers_kept_waiting",
        "agg_qsketch_quantiles",
        "join_bloom_pruned",
        "engine_cms_key_freq",
        "engine_qsketch_seqno_spread",
        # r8 sampling sketch + embedding decontamination + TPC-H closers
        "agg_reservoir_sample",
        "curation_contamination_embedding",
        "engine_reservoir_sample",
        "agg_kmv_set_ops",
        "text_source_overlap_kmv",
        "q11_important_stock",
        "q12_late_shipment_priority",
        "q15_top_supplier",
        "q20_promotion_candidates",
        # r8 continuation: exact-recall dedup join, skyline, regression,
        # association/attribution analytics, graph + PIT + mixture adds
        "dedup_setsim_prefix",
        "skyline_pareto_parts",
        "agg_regression_trend",
        "text_source_lang_association",
        "events_attribution",
        "text_vocab_growth",
        "window_ewma_smoothing",
        "join_asof_nearest",
        "graph_triangle_counts",
        "join_pit_multi_feature",
        "curation_temperature_mixture",
        "agg_hll_rollup",
        "agg_winsorized_mean",
        "events_cusum_drift",
        "curation_epoch_shuffle",
        "curation_shard_manifest",
        "audit_benford_digits",
        "audit_referential_integrity",
        "graph_bfs_levels",
        "scan_orc_roundtrip",
        "curation_quality_prune_sweep",
        # r9: frequent-items summary, window/audit/robust/ts adds, graph
        # closers, text statistics, MIPS, centroid drift, curriculum
        "window_drawdown",
        "window_streak_lengths",
        "events_burstiness",
        "ts_autocorrelation",
        "audit_null_profile",
        "audit_outlier_iqr",
        "agg_mad_robust_z",
        "graph_degree_assortativity",
        "graph_kcore_peel",
        "text_token_entropy",
        "text_zipf_slope",
        "text_source_novelty",
        "text_instruction_heuristics",
        "sim_mips_topk",
        "agg_embedding_centroid_shift",
        "curation_curriculum_schedule",
        "agg_gini_concentration",
        "ts_dow_seasonality",
        "text_readability",
        "agg_weighted_median",
        "events_interarrival_median",
        "graph_link_prediction",
        "scan_partitioned_prune",
        "text_langid_confusion",
        "agg_pareto_share",
        # r12 marquees: gap-allowed sequence mining (one per-user window
        # exchange), the two index-quality evals (model-literal
        # broadcasts), and the grid-bounded k-group rank test
        "events_sequence_patterns_gapped",
        "sim_silhouette_eval",
        "sim_pq_distortion_eval",
        "agg_kruskal_wallis",
    ]
    sections = [HEADER]
    for name in names:
        buf = io.StringIO()
        with redirect_stdout(buf):
            QUERIES[name].fn(spark, SF).explain("formatted")
        lines = [
            ln.strip()[:120]
            for ln in buf.getvalue().splitlines()
            if KEEP.search(ln)
        ]
        body = "\n".join(lines) or "(no join/exchange/aggregate nodes)"
        sections.append(f"## {name}\n```\n{body}\n```\n")
        print(f"{name}: {len(lines)} plan lines", file=sys.stderr)
    (REPO / "PLANS.md").write_text("\n".join(sections))
    print(f"wrote PLANS.md ({len(names)} queries)", file=sys.stderr)


if __name__ == "__main__":
    main()
