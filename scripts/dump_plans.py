#!/usr/bin/env python
"""Write PLANS.md: the formatted physical plan of each headline query at
sf0.001, with its scale stance (first docstring paragraph). A committed,
reviewable artifact backing SCALING.md — the plans the plan-shape tests
pin, visible without running anything."""

from __future__ import annotations

import contextlib
import io
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

SF_DIR = "/root/testdata/sf0.001"

# One representative per operator family (the queries SCALING.md leans on).
HEADLINE = [
    "scan_project_filter",
    "agg_groupby",
    "join_broadcast",
    "join_skew_salted",
    "join_skew_aqe",
    "join_asof",
    "window_range_frame",
    "sessionize_events",
    "unpivot_measures",
    "cdc_fanout_route",
    "cdc_dedupe_first",
    "cdc_batch_pack_scalable",
    "dedup_exact_hash",
    "dedup_ngram_jaccard",
    "dedup_minhash_exact",
    "dedup_embed_lsh",
    "ann_knn_graph",
    "doc_chunk_tokens",
    "ann_ivf_topk",
    "ann_lsh_topk",
    "text_bm25_topk",
    "ts_subseq_search",
    "sample_stratified",
    "pipeline_pretrain_docs",
    "ts_downsample_ohlc",
    "subquery_correlated",
    "dedup_span_ngram",
    "mix_sources_temperature",
    "events_anomaly_mad",
    "agg_cms_heavy_hitters",
    "agg_hll_registers",
    "vec_pq_encode",
    "join_bloom_prefilter",
    "join_bloom_runtime",
    "join_cbo_reorder",
    "fn_json_variant",
    "fn_sql_udf_scalar",
    "fn_sql_udtf_table",
    "pipeline_compaction_apply",
    "join_fuzzy_band",
    "pipeline_quality_gate",
    "ts_ewma_hourly",
    "ann_ivfpq_topk",
    "dedup_minhash_incremental",
    "sample_priority_weighted",
    "text_lm_bigram",
    "agg_hll_intersect",
    "events_path_transitions",
    "graph_triangle_count",
    "market_basket_pairs",
    "ml_linreg_normal",
    "stats_corr_matrix",
    "sample_reservoir_topk",
    "text_bpe_merge_pairs",
    "agg_quantile_2pass",
    "stats_ks_two_sample",
    "ml_nb_classify",
    "join_asof_nearest",
    "ml_pca_power",
    # round 14: web-dedup family + the full-pipeline composition
    "dedup_url_canonical",
    "pipeline_web_funnel",
    "dedup_line_cross_doc",
    "sample_host_capped",
    "pipeline_dedup_full",
    # round 15: cleaned-corpus emission, BPE apply, PII scrub
    "text_strip_boilerplate",
    "text_bpe_tokenize",
    "text_pii_scrub",
    # round 15 continuation: perplexity split, cross-doc CDC, IRLS, HITS
    "text_perplexity_buckets",
    "dedup_cdc_cross_doc",
    "ml_logreg_irls",
    "graph_hits",
    "stats_ljung_box",
    "ml_gbdt_stumps",
    "pipeline_compaction_plan",
    "pipeline_zorder_layout",
    "multimodal_ahash_neardup",
    "stats_cramers_v_matrix",
    "ml_calibration_reliability",
    "cdc_merge_apply",
    "cdc_ivm_agg",
    "pipeline_schema_evolution",
    "sketch_kmv_setops",
    "stream_topk_exact_audit",
    "pipeline_partition_prune_dynamic",
    "pipeline_dq_checks",
]


def main() -> int:
    from cdc_dedupe_spark.queries import REGISTRY
    from cdc_dedupe_spark.session import get_spark

    spark = get_spark("cdc-dedupe-plan-dump")
    out = [
        "# PLANS — headline physical plans (sf0.001, regenerate with "
        "`python scripts/dump_plans.py`)",
        "",
        "Plan-shape properties here are pinned by tests/test_plans.py; this",
        "file is the human-readable witness. Iterative queries",
        "(dedup_embed_cluster, ml_kmeans_train, graph_pagerank) are documented in",
        "SCALING.md instead — their interesting structure is the loop, not",
        "one final plan.",
        "",
    ]
    for name in HEADLINE:
        q = REGISTRY[name]
        stance = (q.doc or "").strip().split("\n\n")[0].replace("\n    ", "\n")
        df = q.spark(spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue().strip()
        out += [f"## {name}", "", stance, "", "```", plan, "```", ""]
    (_REPO / "PLANS.md").write_text("\n".join(out))
    print(f"wrote PLANS.md with {len(HEADLINE)} plans")
    return 0


if __name__ == "__main__":
    sys.exit(main())
