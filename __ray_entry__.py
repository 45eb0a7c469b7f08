"""Driver contract for the Ray Data engine.

The driver calls ``ray.init`` itself BEFORE importing this module; no
function here (nor anything in the library) calls ``ray.init`` /
``ray.shutdown``.

- ``entry()``      — flagship extraction pipeline on sf0.001.
- ``queries()``    — one callable per implemented operator/pipeline
                     (SURVEY.md §2 + the training-data extras).
- ``oracle_sql()`` — DuckDB equivalents; entries are omitted for
                     non-SQL-expressible ops (probabilistic dedup,
                     model/heuristic scoring, approximate search) and
                     the driver records a rows-only check for those.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from medical_and_charity_document_extraction_system_ray.pipelines import (
    cleaning,
    dedup,
    events,
    extraction_query,
    multimodal,
    relational,
    scalar_suite,
    similarity,
    sketches,
    text_analysis,
    training_prep,
)

SF_SMOKE = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship pipeline (classify -> explode -> preprocess+OCR actor
    pool -> groupby(doc_id) reassembly) on the sf0.001 corpus."""
    return extraction_query.q_extract_documents(SF_SMOKE)


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # flagship extraction (full pipeline incl. media path + shuffle)
        "extract_documents": extraction_query.q_extract_documents,
        # relational core operators
        "pricing_summary": relational.q1_pricing_summary,
        "revenue_forecast": relational.q6_revenue_forecast,
        "priority_counts": relational.q3_priority_counts,
        "brand_revenue_join": relational.q_join_brand_revenue,
        "top_customers": relational.q_top_customers,
        "distinct_flags": relational.q_distinct_flags,
        "union_nation_counts": relational.q_union_nation_counts,
        "merge_documents": relational.q_merge_documents,
        "quantity_quantiles": relational.q_quantity_quantiles,
        "revenue_rollup": relational.q_revenue_rollup,
        "revenue_cube": relational.q_revenue_cube,
        "brand_basket_pairs": relational.q_brand_basket_pairs,
        "price_percentiles_disc": relational.q_price_percentiles_disc,
        "string_functions": scalar_suite.q_string_functions,
        "hash_sample": scalar_suite.q_hash_sample,
        "stratified_sample": scalar_suite.q_stratified_sample,
        "weighted_sample": scalar_suite.q_weighted_sample,
        "monthly_order_stats": scalar_suite.q_monthly_order_stats,
        "customers_without_orders": relational.q_customers_without_orders,
        "customer_nation_left": relational.q_customer_nation_left,
        "top_orders_per_customer": relational.q_top_orders_per_customer,
        "priority_pivot": relational.q_priority_pivot,
        "top_customer_per_nation": relational.q_top_customer_per_nation,
        "orders_above_cust_avg": relational.q_orders_above_cust_avg,
        "bloom_brand_revenue": relational.q_bloom_brand_revenue,
        "price_qty_correlation": relational.q_price_qty_correlation,
        "regr_price_by_brand": relational.q_regr_price_by_brand,
        "brands_returned_not_kept": relational.q_brands_returned_not_kept,
        "nation_side_counts": relational.q_nation_side_counts,
        "priority_mode_per_cust": relational.q_priority_mode_per_cust,
        "nation_rich_names": relational.q_nation_rich_names,
        "regional_revenue": relational.q_regional_revenue,
        "brand_revenue_share": relational.q_brand_revenue_share,
        "triangle_count": relational.q_triangle_count,
        "median_price_by_status": relational.q_median_price_by_status,
        # stream-shaped
        "hourly_event_stats": events.q_hourly_event_stats,
        "sessionize": events.q_sessionize,
        "asof_view_before_click": events.q_asof_view_before_click,
        "running_user_value": events.q_running_user_value,
        "user_event_ranks": events.q_user_event_ranks,
        "hopping_window_stats": events.q_hopping_window_stats,
        "rolling_user_value": events.q_rolling_user_value,
        "event_gaps": events.q_event_gaps,
        "user_value_ntiles": events.q_user_value_ntiles,
        "value_moments": events.q_value_moments,
        "watermark_window_stats": events.q_watermark_window_stats,
        "funnel": events.q_funnel,
        "event_transitions": events.q_event_transitions,
        "resample_ffill": events.q_resample_ffill,
        "range_views_before_click": events.q_range_views_before_click,
        "zscore_outliers": events.q_zscore_outliers,
        "cohort_retention": events.q_cohort_retention,
        "percent_rank_value": events.q_percent_rank_value,
        "moving_window_rows": events.q_moving_window_rows,
        "minmax_scale": events.q_minmax_scale,
        "props_stats": events.q_props_stats,
        # text analysis
        "doc_stats": text_analysis.q_doc_stats,
        "quality_scores": text_analysis.q_quality_scores,
        "lang_id": text_analysis.q_lang_id,
        "fingerprints": text_analysis.q_fingerprints,
        "top_tokens_per_lang": text_analysis.q_top_tokens_per_lang,
        "tfidf_top_terms": text_analysis.q_tfidf_top_terms,
        "conjunctive_search": text_analysis.q_conjunctive_search,
        "repetition_scores": text_analysis.q_repetition_scores,
        "regex_scan": text_analysis.q_regex_scan,
        "token_cooccurrence": text_analysis.q_token_cooccurrence,
        "unpivot_doc_metrics": text_analysis.q_unpivot_doc_metrics,
        "inverted_index": text_analysis.q_inverted_index,
        # corpus cleaning
        "pattern_redaction": cleaning.q_pattern_redaction,
        "stopword_filter": cleaning.q_stopword_filter,
        "unigram_lm_scores": cleaning.q_unigram_lm_scores,
        "token_diversity": cleaning.q_token_diversity,
        # training-data preparation
        "chunk_plan": training_prep.q_chunk_plan,
        "pack_plan": training_prep.q_pack_plan,
        "decontaminate": training_prep.q_decontaminate,
        "source_mixing_weights": training_prep.q_source_mixing_weights,
        "quality_threshold_filter": training_prep.q_quality_threshold_filter,
        "global_index": training_prep.q_global_index,
        # sketches
        "distinct_users_exact": sketches.q_distinct_users_exact,
        "approx_distinct_users": sketches.q_approx_distinct_users,
        "approx_distinct_check": sketches.q_approx_distinct_check,
        "hist_quantiles": sketches.q_hist_quantiles,
        "heavy_hitters": sketches.q_heavy_hitters,
        "heavy_hitters_check": sketches.q_heavy_hitters_check,
        # dedup family
        "dedup_exact": dedup.q_dedup_exact,
        "minhash_lsh_pairs": dedup.q_minhash_lsh_pairs,
        "simhash_pairs": dedup.q_simhash_pairs,
        "ngram_jaccard": dedup.q_ngram_jaccard,
        "embedding_neardup": dedup.q_embedding_neardup,
        "embedding_neardup_lsh": dedup.q_embedding_neardup_lsh,
        "dup_clusters": dedup.q_dup_clusters,
        "dup_canonical": dedup.q_dup_canonical,
        "fuzzy_vocab_pairs": dedup.q_fuzzy_vocab_pairs,
        "pagerank_neardup": dedup.q_pagerank_neardup,
        "dup_provenance": dedup.q_dup_provenance,
        # similarity search
        "knn_bruteforce": similarity.q_knn_bruteforce,
        "knn_ivf": similarity.q_knn_ivf,
        "knn_ivf_recall": similarity.q_knn_ivf_recall,
        "knn_multi": similarity.q_knn_multi,
        "knn_pq": similarity.q_knn_pq,
        "knn_pq_recall": similarity.q_knn_pq_recall,
        "label_centroids": similarity.q_label_centroids,
        # multimodal plumbing
        "media_features": multimodal.q_media_features,
        "media_features_geometry": multimodal.q_media_features_geometry,
        "page_regions": multimodal.q_page_regions,
        "page_regions_check": multimodal.q_page_regions_check,
        "frame_sample_plan": multimodal.q_frame_sample_plan,
        "audio_window_plan": multimodal.q_audio_window_plan,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "extract_documents": extraction_query.Q_EXTRACT_SQL,
        "pricing_summary": relational.Q1_SQL,
        "revenue_forecast": relational.Q6_SQL,
        "priority_counts": relational.Q3_SQL,
        "brand_revenue_join": relational.Q_JOIN_SQL,
        "top_customers": relational.Q_TOPK_SQL,
        "distinct_flags": relational.Q_DISTINCT_SQL,
        "union_nation_counts": relational.Q_UNION_SQL,
        "merge_documents": relational.Q_MERGE_SQL,
        "hourly_event_stats": events.Q_HOURLY_SQL,
        "sessionize": events.Q_SESSIONIZE_SQL,
        "asof_view_before_click": events.Q_ASOF_SQL,
        "quantity_quantiles": relational.Q_QUANTILES_SQL,
        "revenue_rollup": relational.Q_ROLLUP_SQL,
        "revenue_cube": relational.Q_CUBE_SQL,
        "brand_basket_pairs": relational.Q_BASKET_SQL,
        "price_percentiles_disc": relational.Q_PCT_DISC_SQL,
        "string_functions": scalar_suite.Q_STRING_SQL,
        "hash_sample": scalar_suite.Q_HASH_SAMPLE_SQL,
        "stratified_sample": scalar_suite.Q_STRATIFIED_SQL,
        "weighted_sample": scalar_suite.Q_WEIGHTED_SAMPLE_SQL,
        "monthly_order_stats": scalar_suite.Q_MONTHLY_SQL,
        "customers_without_orders": relational.Q_ANTI_SQL,
        "customer_nation_left": relational.Q_LEFT_JOIN_SQL,
        "top_orders_per_customer": relational.Q_TOP_PER_CUST_SQL,
        "priority_pivot": relational.Q_PIVOT_SQL,
        "top_customer_per_nation": relational.Q_ARGMAX_SQL,
        "orders_above_cust_avg": relational.Q_ABOVE_AVG_SQL,
        "bloom_brand_revenue": relational.Q_BLOOM_SQL,
        "price_qty_correlation": relational.Q_CORR_SQL,
        "regr_price_by_brand": relational.Q_REGR_SQL,
        "brands_returned_not_kept": relational.Q_EXCEPT_SQL,
        "nation_side_counts": relational.Q_FULL_OUTER_SQL,
        "priority_mode_per_cust": relational.Q_MODE_SQL,
        "nation_rich_names": relational.Q_STRING_AGG_SQL,
        "regional_revenue": relational.Q_REGIONAL_REVENUE_SQL,
        "brand_revenue_share": relational.Q_REVENUE_SHARE_SQL,
        "triangle_count": relational.Q_TRIANGLES_SQL,
        "median_price_by_status": relational.Q_MEDIAN_SQL,
        "running_user_value": events.Q_RUNNING_SQL,
        "user_event_ranks": events.Q_RANKS_SQL,
        "hopping_window_stats": events.Q_HOPPING_SQL,
        "rolling_user_value": events.Q_ROLLING_SQL,
        "event_gaps": events.Q_EVENT_GAPS_SQL,
        "user_value_ntiles": events.Q_NTILE_SQL,
        "value_moments": events.Q_MOMENTS_SQL,
        "watermark_window_stats": events.Q_WATERMARK_SQL,
        "funnel": events.Q_FUNNEL_SQL,
        "event_transitions": events.Q_TRANSITIONS_SQL,
        "resample_ffill": events.Q_RESAMPLE_SQL,
        "range_views_before_click": events.Q_RANGE_JOIN_SQL,
        "zscore_outliers": events.Q_ZSCORE_SQL,
        "cohort_retention": events.Q_COHORT_SQL,
        "percent_rank_value": events.Q_PERCENT_RANK_SQL,
        "moving_window_rows": events.Q_MOVING_ROWS_SQL,
        "minmax_scale": events.Q_MINMAX_SQL,
        "props_stats": events.Q_PROPS_SQL,
        "doc_stats": text_analysis.Q_DOC_STATS_SQL,
        "quality_scores": text_analysis.Q_QUALITY_SQL,
        "lang_id": text_analysis.Q_LANG_ID_SQL,
        "fingerprints": text_analysis.Q_FINGERPRINTS_SQL,
        "top_tokens_per_lang": text_analysis.Q_TOP_TOKENS_SQL,
        "tfidf_top_terms": text_analysis.Q_TFIDF_SQL,
        "conjunctive_search": text_analysis.Q_CONJ_SEARCH_SQL,
        "repetition_scores": text_analysis.Q_REPETITION_SQL,
        "regex_scan": text_analysis.Q_REGEX_SCAN_SQL,
        "token_cooccurrence": text_analysis.Q_COOCCUR_SQL,
        "unpivot_doc_metrics": text_analysis.Q_UNPIVOT_SQL,
        "inverted_index": text_analysis.Q_INVERTED_INDEX_SQL,
        "pattern_redaction": cleaning.Q_REDACTION_SQL,
        "stopword_filter": cleaning.Q_STOPWORD_SQL,
        "unigram_lm_scores": cleaning.Q_UNIGRAM_LM_SQL,
        "token_diversity": cleaning.Q_TOKEN_DIVERSITY_SQL,
        "chunk_plan": training_prep.Q_CHUNK_SQL,
        "pack_plan": training_prep.Q_PACK_SQL,
        "decontaminate": training_prep.Q_DECON_SQL,
        "source_mixing_weights": training_prep.Q_MIXING_SQL,
        "quality_threshold_filter": training_prep.Q_QUALITY_FILTER_SQL,
        "global_index": training_prep.Q_GLOBAL_INDEX_SQL,
        "distinct_users_exact": sketches.Q_DISTINCT_USERS_SQL,
        "approx_distinct_check": sketches.Q_APPROX_DISTINCT_CHECK_SQL,
        "hist_quantiles": sketches.Q_HIST_QUANTILES_SQL,
        "heavy_hitters_check": sketches.Q_HEAVY_HITTERS_CHECK_SQL,
        "dedup_exact": dedup.Q_DEDUP_EXACT_SQL,
        "minhash_lsh_pairs": dedup.Q_MINHASH_SQL,
        "simhash_pairs": dedup.Q_SIMHASH_SQL,
        "ngram_jaccard": dedup.Q_NGRAM_SQL,
        "embedding_neardup": dedup.Q_EMB_NEARDUP_SQL,
        "embedding_neardup_lsh": dedup.Q_EMB_NEARDUP_LSH_SQL,
        "dup_clusters": dedup.Q_DUP_CLUSTERS_SQL,
        "dup_canonical": dedup.Q_DUP_CANONICAL_SQL,
        "fuzzy_vocab_pairs": dedup.Q_FUZZY_VOCAB_SQL,
        "pagerank_neardup": dedup.Q_PAGERANK_SQL,
        "dup_provenance": dedup.Q_DUP_PROVENANCE_SQL,
        "knn_bruteforce": similarity.Q_KNN_SQL,
        "knn_ivf_recall": similarity.Q_KNN_IVF_RECALL_SQL,
        "knn_multi": similarity.Q_KNN_MULTI_SQL,
        "knn_pq_recall": similarity.Q_KNN_PQ_RECALL_SQL,
        "label_centroids": similarity.Q_CENTROIDS_SQL,
        "media_features_geometry": multimodal.Q_MEDIA_GEOM_SQL,
        "page_regions_check": multimodal.Q_PAGE_REGIONS_SQL,
        "frame_sample_plan": multimodal.Q_FRAME_SAMPLE_SQL,
        "audio_window_plan": multimodal.Q_AUDIO_PLAN_SQL,
        # rows-only (genuinely non-value-oracle-able): the production
        # probabilistic operators themselves — approx_distinct_users
        # (KMV estimate; bound gated by approx_distinct_check), knn_ivf
        # (approximate top-k; recall gated by knn_ivf_recall), knn_pq
        # (ADC compressed scan; recall gated by knn_pq_recall),
        # heavy_hitters (Misra-Gries counters depend on batch
        # boundaries; guarantee gated by heavy_hitters_check) — and
        # the geometry-heuristic stages media_features / page_regions.
    }
