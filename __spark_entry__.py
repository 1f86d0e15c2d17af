"""Driver contract for the spark-graft builder (PySpark target).

queries() exposes every implemented operator from SURVEY.md §2 (plus the
training-data pipeline operators); oracle_sql() carries the DuckDB twin for
each. Implementations live in lucene_mapreduce_spark/.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lucene_mapreduce_spark.operators import (  # noqa: E402
    curation,
    dedup,
    fulltext,
    ivf,
    multimodal,
    parity,
    relational,
    similarity,
    textstats,
)
from lucene_mapreduce_spark.operators.oracles import (  # noqa: E402
    ORACLES,
    bm25_topk_sql,
    block_join_sql,
    dl_percentiles_sql,
    drill_sideways_sql,
    function_score_sql,
    rescore_sql,
    explain_sql,
    kmv_sql,
    span_first_sql,
    span_not_sql,
    generation_sql,
    to_child_sql,
    cms_sql,
    lmdirichlet_sql,
    taxonomy_sql,
    bm25f_sql,
    constant_score_sql,
    infix_suggest_sql,
    term_vectors_sql,
    percolate_sql,
    lmjelinekmercer_sql,
    boosting_sql,
    span_within_sql,
    top_hits_sql,
    matched_queries_sql,
    random_score_sql,
    decay_sql,
    highlight_sql,
    phrase_suggest_sql,
    ann_recall_sql,
    funnel_sql,
    histogram_sql,
    adjacency_sql,
    composite_sql,
    filtered_ann_sql,
    hybrid_linear_sql,
    domain_quality_sql,
    date_histogram_sql,
    moving_avg_sql,
    bucket_selector_sql,
    weighted_avg_sql,
    multi_terms_sql,
    rare_terms_sql,
    pinned_sql,
    span_containing_sql,
    rank_feature_sql,
    distance_feature_sql,
    terms_shard_sql,
    pii_redaction_sql,
    source_cap_sql,
    mixture_weights_sql,
    diversified_sampler_sql,
    span_multi_near_sql,
    sayt_sql,
    derivative_sql,
    stats_bucket_sql,
    date_range_sql,
    auto_date_histogram_sql,
    scroll_slices_sql,
    percentile_ranks_sql,
    string_stats_sql,
    embedding_norm_sql,
    serial_diff_sql,
    bucket_extrema_sql,
    bucket_script_sql,
    bucket_sort_sql,
    normalize_sql,
    top_metrics_sql,
    t_test_sql,
    extended_stats_sql,
    boxplot_sql,
    mad_sql,
    matrix_stats_sql,
    filters_agg_sql,
    has_child_sql,
    has_parent_sql,
    children_agg_sql,
    scripted_metric_sql,
    combined_fields_sql,
    rank_eval_sql,
    linear_classifier_sql,
    sampler_agg_sql,
    geo_distance_sql,
    mget_sql,
    intervals_sql,
    cumulative_cardinality_sql,
    moving_fn_sql,
    geo_bounding_box_sql,
    geotile_grid_sql,
    hll_cardinality_sql,
    ewma_sql,
    percentiles_bucket_sql,
    change_point_sql,
    rate_agg_sql,
    categorize_text_sql,
    frequent_pairs_sql,
    tfidf_keywords_sql,
    bpe_pairs_sql,
    geohash_grid_sql,
    ip_range_sql,
    stemmed_terms_sql,
    moving_median_sql,
    packing_stats_sql,
    terms_lookup_sql,
    runtime_field_sql,
    geo_centroid_sql,
    mixture_resample_sql,
    token_budget_trim_sql,
    stream_join_sql,
    contexts_suggest_sql,
    random_sampler_sql,
    pivot_table_sql,
    cube_agg_sql,
    contamination_fraction_sql,
    filter_clause_sql,
    terms_set_sql,
    common_terms_sql,
    span_or_near_sql,
    hit_stats_sql,
    mlt_sql,
    fuzzy_sql,
    autocomplete_sql,
    boosted_sql,
    collapse_sql,
    dismax_sql,
    field_scoped_sql,
    grouped_topn_sql,
    msm_sql,
    ngram_counts_sql,
    parsed_query_sql,
    prefix_sql,
    range_facets_sql,
    range_parsed_sql,
    regexp_sql,
    rrf_sql,
    significant_terms_sql,
    snippets_sql,
    sort_by_field_sql,
    spell_suggest_sql,
    synonym_sql,
    term_range_sql,
    terms_enum_sql,
    tfidf_sql,
    total_hits_sql,
    wildcard_sql,
)
from lucene_mapreduce_spark.operators.oracles import TOKS as _TOKS  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: top-10 BM25 over the documents corpus at sf0.001."""
    return fulltext.bm25_topk_documents(spark, "/root/testdata/sf0.001")


# Driver-gate rotation (VERDICT r3 item #1, re-rotated each round): the
# driver's correctness gate samples the FIRST 50 entries of queries().
# Rounds 1-5 verified 206 of 805 names; every name below has never had a
# driver CORRECTNESS row (checked against the union of CORRECTNESS_r01-r05).
# The r5-verified head-50 was dropped after CORRECTNESS_r05 landed (VERDICT
# r5 item 1), promoting the next 50 backlog names; the remainder rotate up
# next round.
_DRIVER_PRIORITY = [
    "runtime_field_query", "geo_centroid_agg", "mixture_resample",
    "token_budget_trim", "contexts_suggest", "random_sampler_agg",
    "pivot_table_agg", "cube_agg", "contamination_fraction",
    "streaming_stream_join", "slop_match_batch", "index_stats",
    "duplicate_ngram_fraction", "dsir_importance_weights", "semdedup",
    "ann_ivf_topk", "streaming_conversation_progress",
    "streaming_exact_dedup", "streaming_windowed_counts",
    "streaming_session_windows", "streaming_percolate",
    "near_dup_components", "curation_pipeline", "cluster_representative",
    "media_decode_stats", "media_frame_stats", "token_windows",
    "stratified_sample", "token_length_histogram", "unigram_logprob",
    "sparse_vector_topk", "dfr_topk", "dfi_topk", "axiomatic_topk",
    "winnowing_dup_candidates", "streaming_topk_keys",
    "trigram_langid_confusion", "ann_pq_topk", "near_dup_leakage_matrix",
    "rocchio_prf_topk", "ib_topk", "boolean_sim_topk",
    "cosine_rescore_topk", "dup_cluster_size_histogram", "most_fields_topk",
    "streaming_dedup_watermark", "mmr_diversified_topk",
    "near_dup_degree_histogram", "vector_prf_topk", "top_duplicate_ngrams",
    "simhash_hamming_histogram", "rfm_segments",
    "maxsim_late_interaction_topk", "levenshtein_near_dup_pairs",
    "affinity_triangles", "bm25_tuned_topk", "supplier_hhi_by_nation",
    "semdedup_threshold_sweep", "part_pagerank_3iter",
    "knn_label_confusion", "shipping_priority_topk", "mann_whitney_u",
    "int8_ann_recall", "ann_radius_search", "cross_fields_topk",
    "covariance_topk_dims", "block_join_avg_topk", "ivf_balance_report",
    "simple_query_string_query", "mlt_unlike_topk", "bm25plus_topk",
    "mann_kendall_trend", "pq_distortion_report", "dup_cluster_source_mix",
    "ann_ivf_pq_topk", "ingest_pipeline_simulate", "pq_rescore_topk",
    "dup_method_agreement", "item_cosine_similarity",
    "ivf_nprobe_recall_curve", "lsh_tfidf_cosine_rescore",
    "dup_shingle_run_report", "shingle_field_topk", "borda_fusion_topk",
    "duplicate_order_detection", "basket_size_stats", "simhash_bit_balance",
    "local_clustering_topk", "simpson_diversity_by_source",
    "next_basket_repeat_baseline", "personalized_pagerank",
    "sampled_topk_fidelity", "maxp_passage_retrieval_topk",
    "simpsons_paradox_check", "pivoted_norm_topk", "bass_diffusion_fit",
    "edge_triangle_support", "dersimonian_laird_re",
    "menzerath_altmann_fit", "unit_price_dispersion_topk",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        # full-text / BM25 (SURVEY §2.7, A8, J1, W1)
        "bm25_topk": lambda s, d: fulltext.bm25_topk_documents(s, d),
        "bm25_topk_q2": lambda s, d: fulltext.bm25_topk_documents(
            s, d, query_text=fulltext.SECOND_QUERY
        ),
        "bm25_index_topk": fulltext.bm25_index_topk_documents,
        "bm25_range_topk": fulltext.bm25_range_topk_documents,
        "more_like_this": fulltext.more_like_this_documents,
        "search_snippets": fulltext.search_snippets,
        "search_facets": fulltext.search_facets,
        "fuzzy_query": fulltext.fuzzy_query,
        "prefix_query": fulltext.prefix_query,
        "wildcard_query": fulltext.wildcard_query,
        "regexp_query": fulltext.regexp_query,
        "term_range_query": fulltext.term_range_query,
        "significant_terms": fulltext.significant_terms,
        "ngram_counts": textstats.ngram_counts,
        "search_after_page": fulltext.search_after_page,
        "search_sort_after_page": fulltext.search_sort_after_page,
        "pure_field_query": fulltext.pure_field_query,
        "numeric_range_query": fulltext.numeric_range_query,
        "field_facets": fulltext.field_facets,
        "range_parsed_query": fulltext.range_parsed_query,
        "tfidf_topk": fulltext.tfidf_topk,
        "terms_enum": fulltext.terms_enum,
        "spell_suggest": fulltext.spell_suggest,
        "autocomplete": fulltext.autocomplete,
        "boosted_query": fulltext.boosted_query,
        "min_should_match_query": fulltext.min_should_match_query,
        "boosted_match_batch": fulltext.boosted_match_batch,
        "msm_match_batch": fulltext.msm_match_batch,
        "field_scoped_query": fulltext.field_scoped_query,
        "search_collapse": fulltext.search_collapse,
        "search_grouped_topn": fulltext.search_grouped_topn,
        "synonym_query": fulltext.synonym_query,
        "dismax_query": fulltext.dismax_query,
        "block_join_topk": fulltext.block_join_topk,
        "phrase_prefix_query": fulltext.phrase_prefix_query,
        "range_facets": fulltext.range_facets,
        "rrf_fusion": similarity.rrf_fusion,
        "explain_scores": fulltext.explain_scores,
        "drill_sideways_facets": fulltext.drill_sideways_facets,
        "kmv_distinct_tokens": fulltext.kmv_distinct_tokens,
        "span_first_query": fulltext.span_first_query,
        "span_not_query": fulltext.span_not_query,
        "dl_percentiles": fulltext.dl_percentiles,
        "rescore_topk": fulltext.rescore_topk,
        "function_score_query": fulltext.function_score_query,
        "search_at_generation": fulltext.search_at_generation,
        "to_child_block_join": fulltext.to_child_block_join,
        "cms_heavy_hitters": fulltext.cms_heavy_hitters,
        "lmdirichlet_topk": fulltext.lmdirichlet_topk,
        "taxonomy_facets": fulltext.taxonomy_facets,
        "constant_score_query": fulltext.constant_score_query,
        "filter_clause_query": fulltext.filter_clause_query,
        "terms_set_query": fulltext.terms_set_query,
        "common_terms_query": fulltext.common_terms_query,
        "span_or_near_query": fulltext.span_or_near_query,
        "hit_stats_facets": fulltext.hit_stats_facets,
        "delete_by_query": fulltext.delete_by_query,
        "bm25f_topk": fulltext.bm25f_topk,
        "infix_suggest": fulltext.infix_suggest,
        "term_vectors": fulltext.term_vectors,
        "percolate_match": fulltext.percolate_match,
        "events_rollup": parity.events_rollup,
        "lmjelinekmercer_topk": fulltext.lmjelinekmercer_topk,
        "boosting_query": fulltext.boosting_query,
        "span_within_query": fulltext.span_within_query,
        "top_hits_facets": fulltext.top_hits_facets,
        "matched_queries": fulltext.matched_queries,
        "random_score_query": fulltext.random_score_query,
        "decay_function_score": fulltext.decay_function_score,
        "highlight_all_fragments": fulltext.highlight_all_fragments,
        "phrase_suggest": fulltext.phrase_suggest,
        "ann_recall_at_k": similarity.ann_recall_at_k,
        "histogram_facets": fulltext.histogram_facets,
        "adjacency_matrix_facets": fulltext.adjacency_matrix_facets,
        "composite_agg_page": fulltext.composite_agg_page,
        "funnel_analysis": parity.funnel_analysis,
        "retention_cohorts": parity.retention_cohorts,
        "json_props_stats": parity.json_props_stats,
        "filtered_ann_topk": similarity.filtered_ann_topk,
        "hybrid_linear_fusion": similarity.hybrid_linear_fusion,
        "domain_quality_rollup": textstats.domain_quality_rollup,
        "date_histogram_facets": parity.date_histogram_facets,
        "moving_avg_pipeline": parity.moving_avg_pipeline,
        "bucket_selector_agg": parity.bucket_selector_agg,
        "weighted_avg_agg": textstats.weighted_avg_agg,
        "multi_terms_agg": fulltext.multi_terms_agg,
        "rare_terms_agg": fulltext.rare_terms_agg,
        "pinned_query": fulltext.pinned_query,
        "span_containing_query": fulltext.span_containing_query,
        "rank_feature_query": fulltext.rank_feature_query,
        "distance_feature_query": fulltext.distance_feature_query,
        "terms_shard_approx": fulltext.terms_shard_approx,
        "pii_redaction": textstats.pii_redaction,
        "source_frequency_cap": textstats.source_frequency_cap,
        "temperature_mixture_weights": textstats.temperature_mixture_weights,
        "diversified_sampler_topk": fulltext.diversified_sampler_topk,
        "span_multi_near_query": fulltext.span_multi_near_query,
        "search_as_you_type": fulltext.search_as_you_type,
        "derivative_pipeline": parity.derivative_pipeline,
        "stats_bucket_pipeline": parity.stats_bucket_pipeline,
        "date_range_facets": parity.date_range_facets,
        "auto_date_histogram": parity.auto_date_histogram,
        "scroll_slices": parity.scroll_slices,
        "percentile_ranks_agg": textstats.percentile_ranks_agg,
        "string_stats_agg": textstats.string_stats_agg,
        "embedding_norm_stats": similarity.embedding_norm_stats,
        "serial_diff_pipeline": parity.serial_diff_pipeline,
        "bucket_extrema_pipeline": parity.bucket_extrema_pipeline,
        "bucket_script_pipeline": parity.bucket_script_pipeline,
        "bucket_sort_pipeline": parity.bucket_sort_pipeline,
        "normalize_pipeline": parity.normalize_pipeline,
        "top_metrics_agg": parity.top_metrics_agg,
        "t_test_agg": parity.t_test_agg,
        "extended_stats_agg": textstats.extended_stats_agg,
        "boxplot_agg": textstats.boxplot_agg,
        "mad_agg": textstats.mad_agg,
        "matrix_stats_agg": textstats.matrix_stats_agg,
        "filters_agg": textstats.filters_agg,
        "has_child_query": parity.has_child_query,
        "has_parent_query": parity.has_parent_query,
        "children_agg": parity.children_agg,
        "scripted_metric_agg": parity.scripted_metric_agg,
        "combined_fields_query": fulltext.combined_fields_query,
        "rank_eval": fulltext.rank_eval,
        "linear_classifier_topk": textstats.linear_classifier_topk,
        "sampler_agg": textstats.sampler_agg,
        "geo_distance_query": textstats.geo_distance_query,
        "mget_docstore": fulltext.mget_docstore,
        "intervals_query": fulltext.intervals_query,
        "cumulative_cardinality_pipeline": parity.cumulative_cardinality_pipeline,
        "moving_fn_pipeline": parity.moving_fn_pipeline,
        "geo_bounding_box_query": textstats.geo_bounding_box_query,
        "geotile_grid_agg": textstats.geotile_grid_agg,
        "hll_cardinality": textstats.hll_cardinality,
        "ewma_pipeline": parity.ewma_pipeline,
        "percentiles_bucket_pipeline": parity.percentiles_bucket_pipeline,
        "change_point_agg": parity.change_point_agg,
        "rate_agg": parity.rate_agg,
        "categorize_text_agg": textstats.categorize_text_agg,
        "frequent_pairs_agg": textstats.frequent_pairs_agg,
        "tfidf_keywords": textstats.tfidf_keywords,
        "bpe_pair_counts": textstats.bpe_pair_counts,
        "geohash_grid_agg": textstats.geohash_grid_agg,
        "ip_range_agg": textstats.ip_range_agg,
        "stemmed_terms_agg": textstats.stemmed_terms_agg,
        "moving_median_pipeline": parity.moving_median_pipeline,
        "packing_stats": textstats.packing_stats,
        "terms_lookup_query": fulltext.terms_lookup_query,
        "runtime_field_query": fulltext.runtime_field_query,
        "geo_centroid_agg": textstats.geo_centroid_agg,
        "mixture_resample": textstats.mixture_resample,
        "token_budget_trim": textstats.token_budget_trim,
        "contexts_suggest": textstats.contexts_suggest,
        "random_sampler_agg": textstats.random_sampler_agg,
        "pivot_table_agg": textstats.pivot_table_agg,
        "cube_agg": textstats.cube_agg,
        "contamination_fraction": dedup.contamination_fraction,
        "streaming_stream_join": (
            lambda s, d: __import__(
                "lucene_mapreduce_spark.streaming.incremental", fromlist=["x"]
            ).streaming_stream_join(s, d)
        ),
        "contamination_check": dedup.contamination_check,
        "gopher_rules": textstats.gopher_rules,
        "ann_batch_topk": similarity.ann_batch_topk,
        "ann_ivf_batch_topk": ivf.ann_ivf_batch_topk,
        "search_total_hits": fulltext.search_total_hits,
        "search_sort_by_field": fulltext.search_sort_by_field,
        "parsed_query": fulltext.parsed_query,
        "bm25_wand_topk": fulltext.bm25_wand_topk_documents,
        "bm25_wand_topk_unmerged": fulltext.bm25_wand_topk_unmerged,
        "bm25_chunkmax_topk": fulltext.bm25_chunkmax_topk_documents,
        "boolean_and_query": fulltext.boolean_and_query,
        "boolean_or_query": fulltext.boolean_or_query,
        "boolean_and_not_query": fulltext.boolean_and_not_query,
        "near_query": fulltext.near_query,
        "near_query_positions": fulltext.near_query_positions,
        "phrase_query": fulltext.phrase_query,
        "phrase_query_positions": fulltext.phrase_query_positions,
        "phrase_slop_query": fulltext.phrase_slop_query,
        "phrase_match_batch": fulltext.phrase_match_batch,
        "slop_match_batch": fulltext.slop_match_batch,
        "boolean_match_batch": fulltext.boolean_match_batch,
        "near_match_batch": fulltext.near_match_batch,
        "term_df": fulltext.term_df,
        "index_stats": fulltext.index_stats,
        "corpus_stats": fulltext.corpus_stats,
        "doc_tf": fulltext.doc_tf,
        # aggregations (SURVEY §2.4)
        "latest_per_key": parity.latest_per_key,
        "count_per_key": parity.count_per_key,
        "distinct_projection": parity.distinct_projection,
        "session_rollup": parity.session_rollup,
        "global_stats_argmax": parity.global_stats_argmax,
        "topk_per_key": parity.topk_per_key,
        # joins (SURVEY §2.3)
        "index_lookup_join": parity.index_lookup_join,
        "index_lookup_join_with_misses": parity.index_lookup_join_with_misses,
        "generation_fallback": parity.generation_fallback,
        "ttl_anti_join": parity.ttl_anti_join,
        "pair_symmetrize": parity.pair_symmetrize,
        "tagged_union_merge": parity.tagged_union_merge,
        # sources / sinks shape (SURVEY §2.1)
        "multi_source_union": parity.multi_source_union,
        # projections / scalar functions (SURVEY §2.2)
        "field_extract_filter": parity.field_extract_filter,
        "dictionary_filter": parity.dictionary_filter,
        "url_host_md5": parity.url_host_md5,
        "ts_parse_roundtrip": parity.ts_parse_roundtrip,
        "vendor_line_parse": parity.vendor_line_parse,
        "newest_k_generations": parity.newest_k_generations,
        "first_wins_dedup": parity.first_wins_dedup,
        "coalesce_defaults": parity.coalesce_defaults,
        # training-data pipeline: dedup family
        "exact_dedup": dedup.exact_dedup,
        "ngram_jaccard_pairs": dedup.ngram_jaccard_pairs,
        "minhash_signatures": dedup.minhash_signatures,
        "minhash_lsh_pairs": dedup.minhash_lsh_pairs,
        "simhash": dedup.simhash,
        "simhash_near_pairs": dedup.simhash_near_pairs,
        "duplicate_ngram_fraction": dedup.duplicate_ngram_fraction,
        "dsir_importance_weights": textstats.dsir_importance_weights,
        "semdedup": similarity.semdedup,
        # training-data pipeline: similarity search
        "ann_bruteforce_topk": similarity.ann_bruteforce_topk,
        "ann_lsh_topk": similarity.ann_lsh_topk,
        "ann_ivf_topk": ivf.ann_ivf_topk,
        "embedding_near_dup_pairs": similarity.embedding_near_dup_pairs,
        # streaming: custom stateful operator through a real stream run
        "streaming_conversation_progress": (
            lambda s, d: __import__(
                "lucene_mapreduce_spark.streaming.incremental", fromlist=["x"]
            ).streaming_conversation_progress(s, d)
        ),
        "streaming_exact_dedup": (
            lambda s, d: __import__(
                "lucene_mapreduce_spark.streaming.incremental", fromlist=["x"]
            ).streaming_exact_dedup(s, d)
        ),
        "streaming_windowed_counts": (
            lambda s, d: __import__(
                "lucene_mapreduce_spark.streaming.incremental", fromlist=["x"]
            ).streaming_windowed_counts(s, d)
        ),
        "streaming_session_windows": (
            lambda s, d: __import__(
                "lucene_mapreduce_spark.streaming.incremental", fromlist=["x"]
            ).streaming_session_windows(s, d)
        ),
        "streaming_percolate": (
            lambda s, d: __import__(
                "lucene_mapreduce_spark.streaming.incremental", fromlist=["x"]
            ).streaming_percolate(s, d)
        ),
        # training-data pipeline: curation composites
        "near_dup_components": curation.near_dup_components,
        "curation_pipeline": curation.curation_pipeline,
        "cluster_representative": curation.cluster_representative,
        # training-data pipeline: multimodal (binary columns + Arrow kernels)
        "media_decode_stats": multimodal.media_decode_stats,
        "media_frame_stats": multimodal.media_frame_stats,
        # training-data pipeline: text analysis
        "language_id": textstats.language_id,
        "quality_score": textstats.quality_score,
        "token_counts": textstats.token_counts,
        "token_windows": textstats.token_windows,
        "stratified_sample": textstats.stratified_sample,
        "token_length_histogram": textstats.token_length_histogram,
        "doc_fingerprint": textstats.doc_fingerprint,
        "unigram_logprob": textstats.unigram_logprob,
        # round-4 session-10 batch 20
        "ip_prefix_agg": textstats.ip_prefix_agg,
        "geo_line_agg": textstats.geo_line_agg,
        "lexical_diversity": textstats.lexical_diversity,
        "cumulative_sum_pipeline": parity.cumulative_sum_pipeline,
        "bucket_correlation_agg": parity.bucket_correlation_agg,
        "sparse_vector_topk": fulltext.sparse_vector_topk,
        "significant_text_agg": fulltext.significant_text_agg,
        "exists_query": fulltext.exists_query,
        # round-4 session-10 batch 21
        "dfr_topk": fulltext.dfr_topk,
        "variable_width_histogram_agg": textstats.variable_width_histogram_agg,
        "bucket_count_ks_test": parity.bucket_count_ks_test,
        # round-4 session-11 batch 22
        "dfi_topk": fulltext.dfi_topk,
        "axiomatic_topk": fulltext.axiomatic_topk,
        "bigram_logprob": textstats.bigram_logprob,
        "ols_token_chars_fit": textstats.ols_token_chars_fit,
        "winnowing_dup_candidates": dedup.winnowing_dup_candidates,
        # round-4 session-11 batch 23
        "kmv_intersection": fulltext.kmv_intersection,
        "geo_distance_agg": textstats.geo_distance_agg,
        "ccnet_perplexity_buckets": textstats.ccnet_perplexity_buckets,
        "zipf_fit": textstats.zipf_fit,
        "flesch_reading_ease": textstats.flesch_reading_ease,
        # round-4 session-11 batch 24
        "asof_join": parity.asof_join,
        "domain_entropy": textstats.domain_entropy,
        "minhash_jaccard_audit": dedup.minhash_jaccard_audit,
        "streaming_topk_keys": (
            lambda s, d: __import__(
                "lucene_mapreduce_spark.streaming.incremental", fromlist=["x"]
            ).streaming_topk_keys(s, d)
        ),
        # round-4 session-11 batch 25
        "ks_two_sample": parity.ks_two_sample,
        "seasonal_anomaly_days": parity.seasonal_anomaly_days,
        "gini_coefficient": textstats.gini_coefficient,
        "term_burstiness": textstats.term_burstiness,
        "reservoir_sample_per_lang": textstats.reservoir_sample_per_lang,
        # round-4 session-11 batch 26
        "heaps_law_fit": textstats.heaps_law_fit,
        "tokens_per_byte_by_source": textstats.tokens_per_byte_by_source,
        "terms_order_by_metric": parity.terms_order_by_metric,
        "daily_distinct_users": parity.daily_distinct_users,
        # round-4 session-11 batch 27
        "chunk_stitch_candidates": dedup.chunk_stitch_candidates,
        "trigram_langid_confusion": textstats.trigram_langid_confusion,
        "holt_linear_pipeline": parity.holt_linear_pipeline,
        # round-4 session-11 batch 28
        "ann_pq_topk": (
            lambda s, d: __import__(
                "lucene_mapreduce_spark.operators.similarity", fromlist=["x"]
            ).ann_pq_topk(s, d)
        ),
        "near_dup_leakage_matrix": dedup.near_dup_leakage_matrix,
        # round-4 session-11 batch 29
        "rocchio_prf_topk": fulltext.rocchio_prf_topk,
        "bloom_filter_membership": textstats.bloom_filter_membership,
        "train_val_test_split": textstats.train_val_test_split,
        # round-4 session-12 batch 30
        "ib_topk": fulltext.ib_topk,
        "boolean_sim_topk": fulltext.boolean_sim_topk,
        "sig_terms_chi2": fulltext.sig_terms_chi2,
        "cosine_rescore_topk": (
            lambda s, d: __import__(
                "lucene_mapreduce_spark.operators.similarity", fromlist=["x"]
            ).cosine_rescore_topk(s, d)
        ),
        "autocorrelation_daily": parity.autocorrelation_daily,
        "geo_bounds_agg": textstats.geo_bounds_agg,
        # round-4 session-12 batch 31
        "containment_pairs": dedup.containment_pairs,
        "dup_cluster_size_histogram": curation.dup_cluster_size_histogram,
        "frequent_triples_agg": textstats.frequent_triples_agg,
        "kl_divergence_by_source": textstats.kl_divergence_by_source,
        "embedding_centroid_by_label": (
            lambda s, d: __import__(
                "lucene_mapreduce_spark.operators.similarity", fromlist=["x"]
            ).embedding_centroid_by_label(s, d)
        ),
        # round-4 session-12 batch 32
        "most_fields_topk": fulltext.most_fields_topk,
        "weighted_reservoir_sample": textstats.weighted_reservoir_sample,
        "char_trigram_entropy": textstats.char_trigram_entropy,
        "vocab_overlap_sources": textstats.vocab_overlap_sources,
        "stopword_coverage": textstats.stopword_coverage,
        "streaming_dedup_watermark": (
            lambda s, d: __import__(
                "lucene_mapreduce_spark.streaming.incremental", fromlist=["x"]
            ).streaming_dedup_watermark(s, d)
        ),
        # round-4 session-12 batch 33
        "mmr_diversified_topk": (
            lambda s, d: __import__(
                "lucene_mapreduce_spark.operators.similarity", fromlist=["x"]
            ).mmr_diversified_topk(s, d)
        ),
        "rank_biased_overlap": (
            lambda s, d: __import__(
                "lucene_mapreduce_spark.operators.similarity", fromlist=["x"]
            ).rank_biased_overlap(s, d)
        ),
        "index_posting_audit": fulltext.index_posting_audit,
        "near_dup_degree_histogram": curation.near_dup_degree_histogram,
        "session_duration_stats": parity.session_duration_stats,
        # round-4 session-12 batch 34
        "vector_prf_topk": (
            lambda s, d: __import__(
                "lucene_mapreduce_spark.operators.similarity", fromlist=["x"]
            ).vector_prf_topk(s, d)
        ),
        "session_event_pairs": parity.session_event_pairs,
        "top_duplicate_ngrams": dedup.top_duplicate_ngrams,
        "simhash_hamming_histogram": dedup.simhash_hamming_histogram,
        "lang_source_independence": textstats.lang_source_independence,
        # round-4 session-12 batch 35
        "value_percentiles_by_type": parity.value_percentiles_by_type,
        "user_reach_wilson": parity.user_reach_wilson,
        "hourly_activity_profile": parity.hourly_activity_profile,
        "int8_quantization_audit": (
            lambda s, d: __import__(
                "lucene_mapreduce_spark.operators.similarity", fromlist=["x"]
            ).int8_quantization_audit(s, d)
        ),
        # round-4 session-12 batch 36
        "rolling_7d_distinct_users": parity.rolling_7d_distinct_users,
        "time_to_convert_stats": parity.time_to_convert_stats,
        "term_df_histogram": textstats.term_df_histogram,
        "generation_diff_report": fulltext.generation_diff_report,
        # round-4 session-13 batch 37: warehouse-relational pack
        "pricing_summary": relational.pricing_summary,
        "order_priority_count": relational.order_priority_count,
        "returned_item_customers": relational.returned_item_customers,
        "local_supplier_volume": relational.local_supplier_volume,
        "large_volume_customers": relational.large_volume_customers,
        "rfm_segments": relational.rfm_segments,
        "part_affinity_lift": relational.part_affinity_lift,
        # round-4 session-13 batch 38
        "maxsim_late_interaction_topk": similarity.maxsim_late_interaction_topk,
        "levenshtein_near_dup_pairs": dedup.levenshtein_near_dup_pairs,
        "span_corruption_stats": textstats.span_corruption_stats,
        "term_drift_halves": textstats.term_drift_halves,
        "cusum_alerts": parity.cusum_alerts,
        "affinity_triangles": relational.affinity_triangles,
        # round-4 session-13 batch 39
        "geo_polygon_query": textstats.geo_polygon_query,
        "hard_negative_mining": similarity.hard_negative_mining,
        "centroid_outlier_vecs": similarity.centroid_outlier_vecs,
        "oov_rate_by_source": textstats.oov_rate_by_source,
        "stickiness_ratio": parity.stickiness_ratio,
        "percolate_range_match": fulltext.percolate_range_match,
        # round-4 session-13 batch 40
        "bm25_tuned_topk": fulltext.bm25_tuned_topk,
        "sig_terms_background_filter": fulltext.sig_terms_background_filter,
        "supplier_hhi_by_nation": relational.supplier_hhi_by_nation,
        "equidepth_histogram_totals": relational.equidepth_histogram_totals,
        "semdedup_threshold_sweep": similarity.semdedup_threshold_sweep,
        # round-4 session-13 batch 41
        "rank_feature_log_query": fulltext.rank_feature_log_query,
        "rank_feature_sigmoid_query": fulltext.rank_feature_sigmoid_query,
        "pit_search_after_page": fulltext.pit_search_after_page,
        "vocab_coverage_curve": textstats.vocab_coverage_curve,
        "term_dict_frontcoding_report": textstats.term_dict_frontcoding_report,
        "peak_concurrent_sessions": parity.peak_concurrent_sessions,
        # round-4 session-13 batch 42
        "query_difficulty_predictors": fulltext.query_difficulty_predictors,
        "shingle_uniqueness_profile": textstats.shingle_uniqueness_profile,
        "sax_daily_symbols": parity.sax_daily_symbols,
        "part_pagerank_3iter": relational.part_pagerank_3iter,
        "streaming_percolate_range": (
            lambda s, d: __import__(
                "lucene_mapreduce_spark.streaming.incremental", fromlist=["x"]
            ).streaming_percolate_range(s, d)
        ),
        # round-4 session-13 batch 43
        "event_type_user_jaccard": parity.event_type_user_jaccard,
        "weekly_churn_rate": parity.weekly_churn_rate,
        "knn_label_confusion": similarity.knn_label_confusion,
        "sig_terms_gnd": fulltext.sig_terms_gnd,
        # round-4 session-14 batch 44: warehouse pack 2
        "shipping_priority_topk": relational.shipping_priority_topk,
        "forecast_revenue_delta": relational.forecast_revenue_delta,
        "volume_shipping_by_nation": relational.volume_shipping_by_nation,
        "market_share_by_year": relational.market_share_by_year,
        "customer_order_histogram": relational.customer_order_histogram,
        "promo_revenue_share": relational.promo_revenue_share,
        "small_qty_order_revenue": relational.small_qty_order_revenue,
        "disjunctive_filter_revenue": relational.disjunctive_filter_revenue,
        "dormant_customer_balance": relational.dormant_customer_balance,
        # round-4 session-14 batch 45: rank-statistics pack
        "mann_whitney_u": parity.mann_whitney_u,
        "spearman_rho_daily": parity.spearman_rho_daily,
        "kendall_tau_daily": parity.kendall_tau_daily,
        "benford_first_digit": relational.benford_first_digit,
        "histogram_quantile_audit": relational.histogram_quantile_audit,
        # round-4 session-14 batch 46: scale patterns + sig-terms heuristics
        "point_in_interval_join": parity.point_in_interval_join,
        "decayed_event_counts": parity.decayed_event_counts,
        "int8_ann_recall": similarity.int8_ann_recall,
        "sig_terms_mi": fulltext.sig_terms_mi,
        "sig_terms_percentage": fulltext.sig_terms_percentage,
        # round-4 session-14 batch 47: warehouse pack 3 (TPC-H set complete)
        "min_cost_supplier": relational.min_cost_supplier,
        "product_type_profit": relational.product_type_profit,
        "important_part_shares": relational.important_part_shares,
        "late_lines_by_priority": relational.late_lines_by_priority,
        "top_supplier_revenue": relational.top_supplier_revenue,
        "parts_supplier_count": relational.parts_supplier_count,
        "promotion_part_suppliers": relational.promotion_part_suppliers,
        "waiting_orders_suppliers": relational.waiting_orders_suppliers,
        # round-4 session-14 batch 48: JLH sig-terms, vector audits,
        # parent agg, repetition signals, percentile trim
        "sig_terms_jlh": fulltext.sig_terms_jlh,
        "matryoshka_recall": similarity.matryoshka_recall,
        "ann_radius_search": similarity.ann_radius_search,
        "parent_agg": parity.parent_agg,
        "repetition_signals": textstats.repetition_signals,
        "length_trim_report": textstats.length_trim_report,
        # round-4 session-14 batch 49: cross_fields, span position range,
        # negated percolation, quality curve, fertility, covariance audit
        "cross_fields_topk": fulltext.cross_fields_topk,
        "span_position_range_query": fulltext.span_position_range_query,
        "percolate_not_match": fulltext.percolate_not_match,
        "quality_threshold_sweep": textstats.quality_threshold_sweep,
        "tokenizer_fertility_by_lang": textstats.tokenizer_fertility_by_lang,
        "covariance_topk_dims": similarity.covariance_topk_dims,
        # batch 50: match_bool_prefix, payload scoring, block-join avg,
        # ERR@k, global agg, 1-bit quantization recall
        "match_bool_prefix_query": fulltext.match_bool_prefix_query,
        "payload_score_query": fulltext.payload_score_query,
        "block_join_avg_topk": fulltext.block_join_avg_topk,
        "err_at_k": fulltext.err_at_k,
        "global_agg": fulltext.global_agg,
        "binary_quantization_recall": similarity.binary_quantization_recall,
        # batch 51: Damerau fuzzy, conversation rollup, shingle novelty,
        # numeric profile, PCA power iteration, IVF balance audit
        "fuzzy_transpositions_query": fulltext.fuzzy_transpositions_query,
        "conversation_block_stats": fulltext.conversation_block_stats,
        "ngram_novelty_by_source": textstats.ngram_novelty_by_source,
        "numeric_token_profile": textstats.numeric_token_profile,
        "pca_top_component": similarity.pca_top_component,
        "ivf_balance_report": ivf.ivf_balance_report,
        # batch 52: simple_query_string, MLT unlike, BM25+, terms agg
        # include/exclude, source overlap matrix, LSH band sweep
        "simple_query_string_query": fulltext.simple_query_string_query,
        "mlt_unlike_topk": fulltext.mlt_unlike_topk,
        "bm25plus_topk": fulltext.bm25plus_topk,
        "terms_agg_include_exclude": fulltext.terms_agg_include_exclude,
        "source_overlap_matrix": dedup.source_overlap_matrix,
        "lsh_band_sweep": dedup.lsh_band_sweep,
        # batch 53: MultiPhraseQuery, FuzzySuggester, RM3 relevance model,
        # terms-agg partition paging, Dunning LLR collocations
        "multi_phrase_query": fulltext.multi_phrase_query,
        "fuzzy_autocomplete": fulltext.fuzzy_autocomplete,
        "rm3_expansion_terms": fulltext.rm3_expansion_terms,
        "terms_partition_agg": fulltext.terms_partition_agg,
        "bigram_llr_collocations": textstats.bigram_llr_collocations,
        # batch 54: event analytics (Markov transitions, onboarding paths,
        # sessionization sweep, last-touch attribution, Mann-Kendall) + ARI
        "event_transition_matrix": parity.event_transition_matrix,
        "top_event_paths": parity.top_event_paths,
        "session_gap_sweep": parity.session_gap_sweep,
        "attribution_last_touch": parity.attribution_last_touch,
        "mann_kendall_trend": parity.mann_kendall_trend,
        "ari_readability": textstats.ari_readability,
        # batch 55: PQ distortion audit, curriculum buckets, repeat-exposure
        # plan, split stratification audit, JSD by source, Cohen's kappa
        "pq_distortion_report": similarity.pq_distortion_report,
        "curriculum_buckets": textstats.curriculum_buckets,
        "repeat_exposure_plan": textstats.repeat_exposure_plan,
        "split_balance_audit": textstats.split_balance_audit,
        "jsd_by_source": textstats.jsd_by_source,
        "cohens_kappa": textstats.cohens_kappa,
        # batch 56: Cramér's V, two-proportion z-test, hourly chi² GoF,
        # Theil inequality, dup-cluster source mix
        "cramers_v_lang_source": textstats.cramers_v_lang_source,
        "two_proportion_z_test": parity.two_proportion_z_test,
        "chi2_hourly_uniformity": parity.chi2_hourly_uniformity,
        "theil_index_by_source": textstats.theil_index_by_source,
        "dup_cluster_source_mix": curation.dup_cluster_source_mix,
        # batch 57: IVF-PQ composite ANN, Poisson bootstrap CI, dataset card
        "ann_ivf_pq_topk": ivf.ann_ivf_pq_topk,
        "poisson_bootstrap_ci": textstats.poisson_bootstrap_ci,
        "dataset_card_report": textstats.dataset_card_report,
        # batch 58: graph explore, LTR features, code-switch, burst bots
        "graph_explore": fulltext.graph_explore,
        "ltr_feature_log": fulltext.ltr_feature_log,
        "code_switch_stats": textstats.code_switch_stats,
        "bot_burst_detection": parity.bot_burst_detection,
        # batch 59: curation funnel, windowFunnel, ingest simulate, relaxation
        "curation_funnel_report": curation.curation_funnel_report,
        "window_funnel_steps": parity.window_funnel_steps,
        "ingest_pipeline_simulate": textstats.ingest_pipeline_simulate,
        "query_relaxation_ladder": fulltext.query_relaxation_ladder,
        # batch 60: KM survival, cohort LTV, multi-word synonym
        "kaplan_meier_survival": parity.kaplan_meier_survival,
        "cohort_ltv_curve": parity.cohort_ltv_curve,
        "multiword_synonym_query": fulltext.multiword_synonym_query,
        # batch 61: pareto curve, new-vs-returning, file sizing, MLM, refine
        "pareto_share_curve": parity.pareto_share_curve,
        "new_vs_returning_daily": parity.new_vs_returning_daily,
        "output_file_sizing_plan": parity.output_file_sizing_plan,
        "mlm_masking_plan": textstats.mlm_masking_plan,
        "pq_rescore_topk": similarity.pq_rescore_topk,
        # batch 62: Holt-Winters, latency percentiles, cosine pair histo, CLI
        "holt_winters_pipeline": parity.holt_winters_pipeline,
        "lineitem_latency_percentiles": parity.lineitem_latency_percentiles,
        "cosine_pair_histogram": similarity.cosine_pair_histogram,
        "coleman_liau_index": textstats.coleman_liau_index,
        # batch 63: TextRank keywords, position-based attribution
        "textrank_keywords": textstats.textrank_keywords,
        "attribution_position_based": parity.attribution_position_based,
        # batch 64: grouping sets, anisotropy, entry-channel conversion
        "grouping_sets_agg": parity.grouping_sets_agg,
        "embedding_anisotropy": similarity.embedding_anisotropy,
        "session_entry_conversion": parity.session_entry_conversion,
        # batch 65: dup-method agreement, BPE merge gain, BM25 param sweep
        "dup_method_agreement": dedup.dup_method_agreement,
        "bpe_merge_gain": textstats.bpe_merge_gain,
        "bm25_param_sweep_overlap": fulltext.bm25_param_sweep_overlap,
        # batch 66: pruned percolation, item-item cosine, dim quartiles
        "percolate_pruned": fulltext.percolate_pruned,
        "item_cosine_similarity": relational.item_cosine_similarity,
        "embedding_dim_quartiles": similarity.embedding_dim_quartiles,
        # batch 67: nprobe recall curve, LSH + tf-idf cosine rescore
        "ivf_nprobe_recall_curve": similarity.ivf_nprobe_recall_curve,
        "lsh_tfidf_cosine_rescore": dedup.lsh_tfidf_cosine_rescore,
        # batch 68: sliding-window streaming gate
        "streaming_sliding_counts": (
            lambda s, d: __import__(
                "lucene_mapreduce_spark.streaming.incremental", fromlist=["x"]
            ).streaming_sliding_counts(s, d)
        ),
        "index_rollover_plan": parity.index_rollover_plan,
        "nelson_aalen_hazard": parity.nelson_aalen_hazard,
        "attribution_time_decay": parity.attribution_time_decay,
        "cuped_adjusted_metric": parity.cuped_adjusted_metric,
        "rake_keywords": textstats.rake_keywords,
        "dup_shingle_run_report": textstats.dup_shingle_run_report,
        "sprt_daily_llr": parity.sprt_daily_llr,
        "log_merge_plan": parity.log_merge_plan,
        "scd2_user_state_intervals": parity.scd2_user_state_intervals,
        "shard_allocation_plan": parity.shard_allocation_plan,
        "search_sort_missing_last": fulltext.search_sort_missing_last,
        "bounce_rate_by_entry": parity.bounce_rate_by_entry,
        "triplet_mining_plan": similarity.triplet_mining_plan,
        "feature_hash_collision_report": (
            textstats.feature_hash_collision_report
        ),
        # batch 74: EQL sequence, rank-window trio, unpivot
        "eql_sequence_match": parity.eql_sequence_match,
        "window_rank_functions": parity.window_rank_functions,
        "unpivot_lang_counts": parity.unpivot_lang_counts,
        # batch 75: experimentation pack
        "ab_power_analysis": parity.ab_power_analysis,
        "did_estimate": parity.did_estimate,
        "anova_event_value": parity.anova_event_value,
        # batch 76: graph pack + CH retention
        "kcore_peel_rounds": relational.kcore_peel_rounds,
        "label_propagation_parts": relational.label_propagation_parts,
        "retention_conditions": parity.retention_conditions,
        # batch 77: lakehouse layout plans + robust trend
        "zorder_layout_plan": relational.zorder_layout_plan,
        "file_skipping_audit": relational.file_skipping_audit,
        "theil_sen_weekly_trend": relational.theil_sen_weekly_trend,
        # batch 78: shingle field, index-sort plan, HLL union
        "shingle_field_topk": fulltext.shingle_field_topk,
        "index_sort_plan": fulltext.index_sort_plan,
        "hll_union_sources": textstats.hll_union_sources,
        # batch 79: Borda fusion, JL audit, Bollinger bands
        "borda_fusion_topk": similarity.borda_fusion_topk,
        "jl_projection_audit": similarity.jl_projection_audit,
        "bollinger_bands_daily": parity.bollinger_bands_daily,
        # batch 80: EQL until, nav window functions, b-bit minhash
        "eql_sequence_until": parity.eql_sequence_until,
        "window_nav_functions": parity.window_nav_functions,
        "bbit_minhash_audit": dedup.bbit_minhash_audit,
        # batch 81: embedding drift, centered anisotropy, grid DBSCAN
        "embedding_drift_halves": similarity.embedding_drift_halves,
        "centered_anisotropy_audit": similarity.centered_anisotropy_audit,
        "geo_grid_dbscan_cores": textstats.geo_grid_dbscan_cores,
        # batch 82: AMS F2 sketch, k-anonymity, DP counts
        "ams_f2_sketch_audit": textstats.ams_f2_sketch_audit,
        "k_anonymity_audit": textstats.k_anonymity_audit,
        "dp_noisy_counts": textstats.dp_noisy_counts,
        # batch 83: 2-hop centrality, order dedup, RLE audit
        "harmonic_centrality_2hop": relational.harmonic_centrality_2hop,
        "duplicate_order_detection": relational.duplicate_order_detection,
        "rle_encodability_audit": relational.rle_encodability_audit,
        # batch 84: seasonality strength, forecast backtest, bloom skip
        "dow_seasonality_strength": parity.dow_seasonality_strength,
        "forecast_baseline_backtest": parity.forecast_baseline_backtest,
        "bloom_file_skipping_audit": relational.bloom_file_skipping_audit,
        # batch 85: constraint suite, data profiling, any-order funnel
        "constraint_check_suite": parity.constraint_check_suite,
        "data_profile_audit": parity.data_profile_audit,
        "any_order_funnel": parity.any_order_funnel,
        # batch 86: decompounder, date math, set ops
        "compound_split_suggest": fulltext.compound_split_suggest,
        "date_math_range_query": fulltext.date_math_range_query,
        "set_operations_users": fulltext.set_operations_users,
        # batch 87: funnel latency matrix, basket sizes, SLO burn
        "funnel_step_latency_matrix": parity.funnel_step_latency_matrix,
        "basket_size_stats": parity.basket_size_stats,
        "slo_burn_alerts": parity.slo_burn_alerts,
        # batch 88: Neyman allocation, dict-encoding audit, join skew
        "neyman_allocation_plan": textstats.neyman_allocation_plan,
        "dict_encoding_audit": textstats.dict_encoding_audit,
        "join_skew_report": textstats.join_skew_report,
        # batch 89: Welford merge, correlated subquery, Hurst exponent
        "welford_merge_audit": parity.welford_merge_audit,
        "correlated_subquery_gate": parity.correlated_subquery_gate,
        "hurst_exponent_daily": parity.hurst_exponent_daily,
        # batch 90: tuning advisor, revenue waterfall, Markov absorption
        "spark_tuning_advisor": relational.spark_tuning_advisor,
        "revenue_waterfall": relational.revenue_waterfall,
        "markov_absorption_3step": parity.markov_absorption_3step,
        # batch 91: packing attention waste, pass@k, hapax
        "packing_attention_waste": textstats.packing_attention_waste,
        "pass_at_k_estimate": textstats.pass_at_k_estimate,
        "hapax_report": textstats.hapax_report,
        # batch 92: CDC chunking, recsys coverage/novelty, l-diversity
        "cdc_chunk_histogram": textstats.cdc_chunk_histogram,
        "recsys_coverage_novelty": textstats.recsys_coverage_novelty,
        "l_diversity_audit": textstats.l_diversity_audit,
        # batch 93: delta varint, AQE coalesce plan, systematic sample
        "delta_varint_audit": relational.delta_varint_audit,
        "aqe_coalesce_plan": relational.aqe_coalesce_plan,
        "systematic_sample_audit": relational.systematic_sample_audit,
        # batch 94: median-of-medians, dense_rank, quantile disc/cont
        "median_of_medians_audit": parity.median_of_medians_audit,
        "dense_rank_ties_page": parity.dense_rank_ties_page,
        "quantile_disc_cont_audit": parity.quantile_disc_cont_audit,
        # batch 95: t-closeness, selectivity audit, PSI drift
        "t_closeness_audit": textstats.t_closeness_audit,
        "selectivity_independence_audit": (
            textstats.selectivity_independence_audit
        ),
        "psi_value_drift": textstats.psi_value_drift,
        # batch 96: quantization granularity, bloom join pushdown
        "quantization_granularity_audit": (
            similarity.quantization_granularity_audit
        ),
        "bloom_join_pushdown_audit": (
            relational.bloom_join_pushdown_audit
        ),
        # batch 97: assortativity, weighted median, simhash balance
        "degree_assortativity": relational.degree_assortativity,
        "weighted_median_price": relational.weighted_median_price,
        "simhash_bit_balance": dedup.simhash_bit_balance,
        # batch 98: local clustering, Jain fairness, overlap depth
        "local_clustering_topk": relational.local_clustering_topk,
        "jain_fairness_index": relational.jain_fairness_index,
        "file_overlap_depth": relational.file_overlap_depth,
        # batch 99: join cardinality, entropy bound, randomized response
        "join_cardinality_audit": relational.join_cardinality_audit,
        "char_entropy_compression_bound": (
            textstats.char_entropy_compression_bound
        ),
        "randomized_response_audit": textstats.randomized_response_audit,
        # batch 100: NULL semantics, circular stats, repeat purchases
        "null_semantics_gate": parity.null_semantics_gate,
        "circular_hour_concentration": (
            parity.circular_hour_concentration
        ),
        "repeat_part_purchase_rate": parity.repeat_part_purchase_rate,
        # batch 101: Good-Turing, Simpson diversity, edit-1 pairs
        "good_turing_counts": textstats.good_turing_counts,
        "simpson_diversity_by_source": (
            textstats.simpson_diversity_by_source
        ),
        "vocab_edit1_pairs": textstats.vocab_edit1_pairs,
        # batch 102: posting gaps, pre-purchase dwell, penny rounding
        "posting_gap_histogram": fulltext.posting_gap_histogram,
        "pre_purchase_dwell": parity.pre_purchase_dwell,
        "penny_rounding_audit": parity.penny_rounding_audit,
        # batch 103: transition entropy, next-basket baseline, WIP aging
        "transition_entropy_rate": parity.transition_entropy_rate,
        "next_basket_repeat_baseline": (
            parity.next_basket_repeat_baseline
        ),
        "order_aging_wip": parity.order_aging_wip,
        # batch 104: stopword plan, winsorized mean, lag-1 coherence
        "stopword_pruning_plan": fulltext.stopword_pruning_plan,
        "winsorized_mean_audit": parity.winsorized_mean_audit,
        "embedding_lag1_coherence": similarity.embedding_lag1_coherence,
        # batch 105: Dn rolling retention
        "dn_retention_summary": parity.dn_retention_summary,
        # batch 106: business days, divmod semantics
        "business_day_latency": relational.business_day_latency,
        "integer_division_semantics_gate": (
            relational.integer_division_semantics_gate
        ),
        # batch 107: serving padding waste
        "padding_waste_audit": textstats.padding_waste_audit,
        # batch 108: token-bucket rate limiting
        "token_bucket_rate_limit": parity.token_bucket_rate_limit,
        # batch 109: source minhash, pinball loss
        "source_minhash_jaccard": dedup.source_minhash_jaccard,
        "pinball_loss_backtest": parity.pinball_loss_backtest,
        # batch 110: nonparametric test trio
        "kruskal_wallis_h": parity.kruskal_wallis_h,
        "mcnemar_paired_days": parity.mcnemar_paired_days,
        "cliffs_delta_effect": parity.cliffs_delta_effect,
        # batch 111: ratio delta-method, SRM, Yule's K
        "ratio_metric_delta_method": parity.ratio_metric_delta_method,
        "srm_check": parity.srm_check,
        "yules_k_by_source": textstats.yules_k_by_source,
        # batch 112: link prediction + truncated Katz
        "link_prediction_scores": relational.link_prediction_scores,
        "katz_index_pairs": relational.katz_index_pairs,
        # batch 113: MoR delete amplification, frame semantics gate
        "merge_on_read_amplification": relational.merge_on_read_amplification,
        "range_rows_frame_gate": parity.range_rows_frame_gate,
        # batch 114: Fisher exact, BH-FDR step-up, HITS authorities
        "fisher_exact_2x2": textstats.fisher_exact_2x2,
        "bh_fdr_procedure": parity.bh_fdr_procedure,
        "hits_authority_3iter": textstats.hits_authority_3iter,
        # batch 115: Kneser-Ney bigram, Gunning fog, MATTR
        "kneser_ney_bigram_logprob": textstats.kneser_ney_bigram_logprob,
        "gunning_fog_index": textstats.gunning_fog_index,
        "mattr_lexical_diversity": textstats.mattr_lexical_diversity,
        # batch 116: power-law MLE, Mantel-Haenszel OR, Brown-Forsythe
        "degree_powerlaw_mle": relational.degree_powerlaw_mle,
        "mantel_haenszel_or": parity.mantel_haenszel_or,
        "brown_forsythe_test": parity.brown_forsythe_test,
        # batch 117: Ljung-Box Q, sign-flip permutation, Theil's U2
        "ljung_box_q": parity.ljung_box_q,
        "permutation_test_signflip": parity.permutation_test_signflip,
        "theil_u2_forecast": parity.theil_u2_forecast,
        # batch 118: hex grid, metric rank agreement, NDV sketch audit
        "geohex_grid_agg": textstats.geohex_grid_agg,
        "metric_rank_agreement": similarity.metric_rank_agreement,
        "ndv_sketch_error_by_column": textstats.ndv_sketch_error_by_column,
        # batch 119: runs test, Shapley attribution, personalized PageRank
        "runs_test_daily": parity.runs_test_daily,
        "shapley_attribution": parity.shapley_attribution,
        "personalized_pagerank": relational.personalized_pagerank,
        # batch 120: Hilbert layout, corpus BLEU-2, Cochran's Q
        "hilbert_layout_plan": relational.hilbert_layout_plan,
        "corpus_bleu_pairs": textstats.corpus_bleu_pairs,
        "cochran_q_test": parity.cochran_q_test,
        # batch 121: Cochran-Armitage trend, Durbin-Watson, Friedman
        "cochran_armitage_trend": parity.cochran_armitage_trend,
        "durbin_watson_daily": parity.durbin_watson_daily,
        "friedman_test": parity.friedman_test,
        # batch 122: periodogram, Bartlett, block-max tightness
        "weekly_periodogram_power": parity.weekly_periodogram_power,
        "bartlett_variance_test": parity.bartlett_variance_test,
        "blockmax_tightness_report": textstats.blockmax_tightness_report,
        # batch 123: Jonckheere-Terpstra, Grubbs, Mood's median
        "jonckheere_terpstra": relational.jonckheere_terpstra,
        "grubbs_outlier_day": parity.grubbs_outlier_day,
        "mood_median_test": parity.mood_median_test,
        # batch 124: best passage, FST dict stats, team-draft interleave
        "best_passage_highlight": fulltext.best_passage_highlight,
        "term_dict_fst_stats": fulltext.term_dict_fst_stats,
        "team_draft_interleaving": fulltext.team_draft_interleaving,
        # batch 125: Page-Hinkley, keyness, earth mover's distance
        "page_hinkley_drift": parity.page_hinkley_drift,
        "keyness_loglik_terms": textstats.keyness_loglik_terms,
        "emd_value_distributions": parity.emd_value_distributions,
        # batch 126: conformal calibration, Brier/ECE, Cronbach's alpha
        "conformal_interval_calibration": parity.conformal_interval_calibration,
        "brier_calibration_report": parity.brier_calibration_report,
        "cronbach_alpha_daily": parity.cronbach_alpha_daily,
        # batch 127: Fleiss kappa, information gain, shift-share
        "fleiss_kappa_quality": textstats.fleiss_kappa_quality,
        "information_gain_features": parity.information_gain_features,
        "revenue_shift_share": relational.revenue_shift_share,
        # batch 128: Burrows delta, DP exponential mechanism, skip benefit
        "burrows_delta_sources": textstats.burrows_delta_sources,
        "dp_exponential_mechanism": parity.dp_exponential_mechanism,
        "skip_pointer_benefit": textstats.skip_pointer_benefit,
        # batch 129: log-rank test, RMST, price elasticity
        "logrank_test": parity.logrank_test,
        "rmst_survival": parity.rmst_survival,
        "price_elasticity_ols": relational.price_elasticity_ols,
        # batch 130: Breslow-Day, Tukey HSD, G-test
        "breslow_day_test": parity.breslow_day_test,
        "tukey_hsd_pairs": parity.tukey_hsd_pairs,
        "g_test_lang_source": parity.g_test_lang_source,
        # batch 131: in-batch collisions, join-order cost, impacts
        "inbatch_collision_report": textstats.inbatch_collision_report,
        "join_order_cost_audit": relational.join_order_cost_audit,
        "impact_quantization_audit": textstats.impact_quantization_audit,
        # batch 132: Erlang-C, Theta backtest, binseg changepoint
        "erlang_c_staffing": parity.erlang_c_staffing,
        "theta_forecast_backtest": parity.theta_forecast_backtest,
        "binseg_changepoint": parity.binseg_changepoint,
        # batch 133: result diversity, Poisson dispersion, DPP benefit
        "result_diversity_ild": similarity.result_diversity_ild,
        "poisson_dispersion_test": parity.poisson_dispersion_test,
        "dpp_benefit_audit": relational.dpp_benefit_audit,
        # batch 134: filter order, Little's law, NQC/WIG
        "filter_order_audit": relational.filter_order_audit,
        "littles_law_audit": relational.littles_law_audit,
        "nqc_wig_predictors": fulltext.nqc_wig_predictors,
        # batch 135: rich club, circadian regularity, ratio-to-MA
        "rich_club_coefficient": relational.rich_club_coefficient,
        "user_circadian_regularity": parity.user_circadian_regularity,
        "ratio_to_ma_seasonal_indices": parity.ratio_to_ma_seasonal_indices,
        # batch 136: distance correlation, Hill index, lateness profile
        "distance_correlation_daily": parity.distance_correlation_daily,
        "hill_tail_index": parity.hill_tail_index,
        "watermark_lateness_profile": parity.watermark_lateness_profile,
        # batch 137: tail dependence, GPD POT, records test
        "tail_dependence_daily": parity.tail_dependence_daily,
        "gpd_pot_fit": parity.gpd_pot_fit,
        "records_test_daily": parity.records_test_daily,
        # batch 138: query segmentation, shard merge audit, position bytes
        "query_segmentation_plan": textstats.query_segmentation_plan,
        "shard_score_merge_audit": fulltext.shard_score_merge_audit,
        "position_gap_bytes_estimate": textstats.position_gap_bytes_estimate,
        # batch 139: Greenwood CI, competing risks, salting plan
        "km_greenwood_ci": parity.km_greenwood_ci,
        "competing_risks_cif": parity.competing_risks_cif,
        "salt_factor_plan": relational.salt_factor_plan,
        # batch 140: UMass coherence, PFOR vs varbyte, sampled top-k
        "umass_topic_coherence": textstats.umass_topic_coherence,
        "pfor_vs_varbyte_audit": textstats.pfor_vs_varbyte_audit,
        "sampled_topk_fidelity": textstats.sampled_topk_fidelity,
        # batch 141: gains/lift, exact AUC, energy distance
        "cumulative_gains_deciles": parity.cumulative_gains_deciles,
        "score_auc_exact": parity.score_auc_exact,
        "energy_distance_values": parity.energy_distance_values,
        # batch 142: MaxP retrieval, QI ladder, tenure hazard
        "maxp_passage_retrieval_topk": fulltext.maxp_passage_retrieval_topk,
        "qi_ladder_kmin": textstats.qi_ladder_kmin,
        "tenure_hazard_table": parity.tenure_hazard_table,
        # batch 143: Holm step-down, fixed-effect meta, generalized ESD
        "holm_bonferroni_gate": parity.holm_bonferroni_gate,
        "meta_fixed_effect_or": parity.meta_fixed_effect_or,
        "gesd_outliers_3round": parity.gesd_outliers_3round,
        # batch 144: Benford-2, runs up-down, MASE
        "benford_second_digit": parity.benford_second_digit,
        "runs_updown_test": parity.runs_updown_test,
        "mase_backtest": parity.mase_backtest,
        # batch 145: average precision, Youden J, footrule
        "average_precision_score": parity.average_precision_score,
        "youden_j_threshold": parity.youden_j_threshold,
        "spearman_footrule_pages": parity.spearman_footrule_pages,
        # batch 146: burstiness, GM-AM gap, Q-Q deciles
        "interevent_burstiness": parity.interevent_burstiness,
        "gm_am_revenue_gap": parity.gm_am_revenue_gap,
        "qq_decile_comparison": parity.qq_decile_comparison,
        # batch 147: error MTBF, Theil decomposition, Cohen's d
        "error_mtbf_report": parity.error_mtbf_report,
        "theil_decomposition_nations": parity.theil_decomposition_nations,
        "cohens_d_arms": parity.cohens_d_arms,
        # batch 148: negbin fit, capture-recapture, Chao1
        "negbin_moment_fit": parity.negbin_moment_fit,
        "capture_recapture_users": parity.capture_recapture_users,
        "chao1_vocab_estimate": parity.chao1_vocab_estimate,
        # batch 149: risk ratio panel, GK gamma, variance ratio
        "risk_ratio_panel": parity.risk_ratio_panel,
        "goodman_kruskal_gamma": parity.goodman_kruskal_gamma,
        "variance_ratio_test": parity.variance_ratio_test,
        # batch 150: VWAP/TWAP, FD bins, corrected Cramer's V
        "vwap_twap_monthly": relational.vwap_twap_monthly,
        "fd_binwidth_recommendation": parity.fd_binwidth_recommendation,
        "cramers_v_bias_corrected": parity.cramers_v_bias_corrected,
        # batch 151: modularity, Atkinson, query clarity
        "modularity_brand_partition": relational.modularity_brand_partition,
        "atkinson_index_segments": relational.atkinson_index_segments,
        "query_clarity_score": fulltext.query_clarity_score,
        # batch 152: rendezvous hashing, Palma ratio, M/G/1
        "rendezvous_hash_balance": relational.rendezvous_hash_balance,
        "palma_ratio_nations": relational.palma_ratio_nations,
        "mg1_waiting_time": parity.mg1_waiting_time,
        # batch 153: Taylor's law, two-NN intrinsic dim, JSD
        "taylor_power_law": parity.taylor_power_law,
        "two_nn_intrinsic_dim": similarity.two_nn_intrinsic_dim,
        "jsd_source_vs_rest": textstats.jsd_source_vs_rest,
        # batch 154: Croston, Wilcoxon signed-rank, Cox-Stuart
        "croston_intermittent_demand": parity.croston_intermittent_demand,
        "wilcoxon_signed_rank": parity.wilcoxon_signed_rank,
        "cox_stuart_trend": parity.cox_stuart_trend,
        # batch 155: p-value combination, EB shrinkage, jackknife
        "pvalue_combination_panel": parity.pvalue_combination_panel,
        "eb_shrunk_urgent_rates": parity.eb_shrunk_urgent_rates,
        "jackknife_ratio_se": parity.jackknife_ratio_se,
        # batch 156: fighting words, Witten-Bell, agreement panel
        "fighting_words_log_odds": textstats.fighting_words_log_odds,
        "witten_bell_perplexity": textstats.witten_bell_perplexity,
        "agreement_panel_kappa": parity.agreement_panel_kappa,
        # batch 157: Brunner-Munzel, SMOG, consistent ring
        "brunner_munzel_arms": parity.brunner_munzel_arms,
        "smog_readability": textstats.smog_readability,
        "consistent_ring_balance": relational.consistent_ring_balance,
        # batch 158: roaring plan, Western Electric, price indices
        "roaring_container_plan": fulltext.roaring_container_plan,
        "western_electric_rules": parity.western_electric_rules,
        "price_index_panel": relational.price_index_panel,
        # batch 159: Kendall's W, randomized response, dot-vs-cosine
        "kendalls_w_concordance": parity.kendalls_w_concordance,
        "randomized_response_debias": parity.randomized_response_debias,
        "dot_vs_cosine_overlap": similarity.dot_vs_cosine_overlap,
        # batch 160: Ansari-Bradley, Bland-Altman, deletion vectors
        "ansari_bradley_scale_test": parity.ansari_bradley_scale_test,
        "bland_altman_order_totals": parity.bland_altman_order_totals,
        "deletion_vector_plan": relational.deletion_vector_plan,
        # batch 161: Quade, Gumbel block maxima, BH-FDR
        "quade_test_months": parity.quade_test_months,
        "gumbel_block_maxima_fit": parity.gumbel_block_maxima_fit,
        "fdr_bh_nation_uniformity": parity.fdr_bh_nation_uniformity,
        # batch 162: HMM forward, Simpson check, MaxScore
        "hmm_forward_loglik": parity.hmm_forward_loglik,
        "simpsons_paradox_check": parity.simpsons_paradox_check,
        "maxscore_term_partition": fulltext.maxscore_term_partition,
        # batch 163: Ljung-Box, isotonic calibration, Storey q-values
        "ljung_box_test": parity.ljung_box_test,
        "isotonic_calibration_bins": parity.isotonic_calibration_bins,
        "storey_qvalue_panel": parity.storey_qvalue_panel,
        # batch 164: merge ladder, Elias-Fano, Lin's CCC
        "tiered_merge_ladder_plan": fulltext.tiered_merge_ladder_plan,
        "elias_fano_size_audit": fulltext.elias_fano_size_audit,
        "lins_ccc_order_totals": parity.lins_ccc_order_totals,
        # batch 165: hash collisions, A/A calibration, robust means
        "hash_collision_audit": parity.hash_collision_audit,
        "aa_test_calibration": parity.aa_test_calibration,
        "trimmed_winsorized_means": parity.trimmed_winsorized_means,
        # batch 166: pivoted norm, LFU curve
        "pivoted_norm_topk": fulltext.pivoted_norm_topk,
        "lfu_cache_hit_curve": fulltext.lfu_cache_hit_curve,
        # batch 167: Bass diffusion, AUC CI, MCC/F1
        "bass_diffusion_fit": parity.bass_diffusion_fit,
        "auc_hanley_mcneil_ci": parity.auc_hanley_mcneil_ci,
        "mcc_f1_threshold_panel": parity.mcc_f1_threshold_panel,
        # batch 168: Welch ANOVA, partial correlation, Bowley panel
        "welch_anova_segments": parity.welch_anova_segments,
        "partial_correlation_panel": parity.partial_correlation_panel,
        "bowley_skewness_panel": parity.bowley_skewness_panel,
        # batch 169: ZIP fit, Lorenz asymmetry, diversity panel
        "zip_moment_fit": parity.zip_moment_fit,
        "lorenz_asymmetry": parity.lorenz_asymmetry,
        "ecological_diversity_panel": textstats.ecological_diversity_panel,
        # batch 170: fan-out tail, ICC, regression to mean
        "fanout_tail_latency": parity.fanout_tail_latency,
        "icc_two_way_raters": parity.icc_two_way_raters,
        "regression_to_mean_audit": parity.regression_to_mean_audit,
        # batch 171: Sobel mediation, Markov removal, partition evolution
        "sobel_mediation_test": parity.sobel_mediation_test,
        "markov_removal_attribution": parity.markov_removal_attribution,
        "partition_evolution_plan": relational.partition_evolution_plan,
        # batch 172: term gaps, window PMI, TSB forecast
        "term_gap_histogram": fulltext.term_gap_histogram,
        "window_cooccurrence_pmi": fulltext.window_cooccurrence_pmi,
        "tsb_intermittent_forecast": parity.tsb_intermittent_forecast,
        # batch 173: Spiegelhalter z, reciprocity, MMD drift
        "spiegelhalter_z_test": parity.spiegelhalter_z_test,
        "transition_reciprocity": parity.transition_reciprocity,
        "mmd_rbf_drift": similarity.mmd_rbf_drift,
        # batch 174: sequential looks, temporal leakage, negative sampling
        "group_sequential_looks": parity.group_sequential_looks,
        "temporal_split_leakage": parity.temporal_split_leakage,
        "negative_sampling_table": textstats.negative_sampling_table,
        # batch 175: Qini uplift, LMG importance, covariance ellipse
        "qini_uplift_deciles": parity.qini_uplift_deciles,
        "lmg_relative_importance": parity.lmg_relative_importance,
        "covariance_ellipse_2d": parity.covariance_ellipse_2d,
        # batch 176: stratified ATE, Sharpe/Sortino, alpha-nDCG
        "stratified_ate_quintiles": parity.stratified_ate_quintiles,
        "sharpe_sortino_daily": parity.sharpe_sortino_daily,
        "alpha_ndcg_diversity": fulltext.alpha_ndcg_diversity,
        # batch 177: ARCH-LM, turning points, Newey-West
        "arch_lm_test": parity.arch_lm_test,
        "turning_point_test": parity.turning_point_test,
        "newey_west_se": parity.newey_west_se,
        # batch 178: NRR/GRR, centroid stability, triangle support
        "net_revenue_retention": relational.net_revenue_retention,
        "label_centroid_stability": similarity.label_centroid_stability,
        "edge_triangle_support": relational.edge_triangle_support,
        # batch 179: design effect, Gries DP, sortedness
        "design_effect_cluster": parity.design_effect_cluster,
        "gries_dp_dispersion": textstats.gries_dp_dispersion,
        "column_runs_sortedness": parity.column_runs_sortedness,
        # batch 180: TOST, DerSimonian-Laird RE, Menzerath-Altmann
        "tost_equivalence_test": parity.tost_equivalence_test,
        "dersimonian_laird_re": parity.dersimonian_laird_re,
        "menzerath_altmann_fit": textstats.menzerath_altmann_fit,
        # batch 181: regression discontinuity, retention decay, ABC
        "regression_discontinuity": relational.regression_discontinuity,
        "retention_decay_fit": relational.retention_decay_fit,
        "abc_classification": relational.abc_classification,
        # batch 182: activity h-index, mode skewness, price endings
        "activity_h_index": parity.activity_h_index,
        "mode_skewness_panel": parity.mode_skewness_panel,
        "price_ending_audit": parity.price_ending_audit,
        # batch 183: Weibull plot, extremal index, price dispersion
        "weibull_plot_fit": relational.weibull_plot_fit,
        "extremal_index_runs": relational.extremal_index_runs,
        "unit_price_dispersion_topk": relational.unit_price_dispersion_topk,
        # batch 184: fairness panel, exponential PPCC
        "fairness_metrics_panel": parity.fairness_metrics_panel,
        "ppcc_exponential_test": parity.ppcc_exponential_test,
        # batch 185: Benford arc, inter-order gaps, single-source risk
        "benford_mantissa_arc_test": relational.benford_mantissa_arc_test,
        "interorder_gap_cv": relational.interorder_gap_cv,
        "single_source_risk": relational.single_source_risk,
    }
    ordered = {name: q[name] for name in _DRIVER_PRIORITY}
    ordered.update({name: fn for name, fn in q.items() if name not in ordered})
    return ordered


def oracle_sql() -> dict[str, str]:
    out = {k: v for k, v in ORACLES.items() if v is not None}
    out["bm25_topk"] = bm25_topk_sql(fulltext.FLAGSHIP_QUERY)
    out["bm25_topk_q2"] = bm25_topk_sql(fulltext.SECOND_QUERY)
    # the index-backed and serving paths must match the SAME oracle
    out["bm25_index_topk"] = bm25_topk_sql(fulltext.FLAGSHIP_QUERY)
    out["more_like_this"] = mlt_sql(fulltext.MLT_SRC_DOC)
    out["search_snippets"] = snippets_sql(fulltext.FLAGSHIP_QUERY)
    out["parsed_query"] = parsed_query_sql(fulltext.PARSED_QUERY)
    out["fuzzy_query"] = fuzzy_sql(fulltext.FUZZY_QUERY)
    out["prefix_query"] = prefix_sql(fulltext.PREFIX_QUERY)
    out["wildcard_query"] = wildcard_sql(fulltext.WILDCARD_QUERY)
    out["regexp_query"] = regexp_sql(fulltext.REGEXP_QUERY)
    out["term_range_query"] = term_range_sql(*fulltext.TERM_RANGE)
    out["significant_terms"] = significant_terms_sql(
        fulltext.BOOLEAN_QUERY, k=fulltext.SIGTERMS_K,
        min_df=fulltext.SIGTERMS_MIN_DF,
    )
    out["ngram_counts"] = ngram_counts_sql(textstats.NGRAM_TOP_K)
    out["search_after_page"] = (
        "SELECT doc_id, score, rank FROM ("
        + bm25_topk_sql(fulltext.FLAGSHIP_QUERY, k=20)
        + ") t WHERE rank > 10"
    )
    out["search_sort_after_page"] = (
        "SELECT doc_id, n_chars, rank FROM ("
        + sort_by_field_sql(fulltext.BOOLEAN_QUERY, k=20)
        + ") t WHERE rank > 10"
    )
    out["tfidf_topk"] = tfidf_sql(fulltext.FLAGSHIP_QUERY)
    from lucene_mapreduce_spark.operators.oracles import (
        best_passage_sql,
        team_draft_sql,
    )

    out["best_passage_highlight"] = best_passage_sql(
        fulltext.FLAGSHIP_QUERY, 10, fulltext.PASSAGE_W
    )
    out["team_draft_interleaving"] = team_draft_sql(
        fulltext.FLAGSHIP_QUERY, fulltext.TEAM_DRAFT_L
    )
    from lucene_mapreduce_spark.operators.oracles import skip_benefit_sql

    out["skip_pointer_benefit"] = skip_benefit_sql(fulltext.FLAGSHIP_QUERY)
    from lucene_mapreduce_spark.operators.oracles import nqc_wig_sql

    out["nqc_wig_predictors"] = nqc_wig_sql(
        fulltext.FLAGSHIP_QUERY, fulltext.NQC_K
    )
    from lucene_mapreduce_spark.operators.oracles import clarity_sql

    out["query_clarity_score"] = clarity_sql(
        fulltext.FLAGSHIP_QUERY, fulltext.CLARITY_K
    )
    from lucene_mapreduce_spark.operators.oracles import maxscore_sql

    out["maxscore_term_partition"] = maxscore_sql(
        fulltext.FLAGSHIP_QUERY, fulltext.MAXSCORE_K
    )
    from lucene_mapreduce_spark.operators.oracles import pivoted_norm_sql

    out["pivoted_norm_topk"] = pivoted_norm_sql(
        fulltext.FLAGSHIP_QUERY, fulltext.PIVOT_K, fulltext.PIVOT_S
    )
    from lucene_mapreduce_spark.operators.oracles import alpha_ndcg_sql

    out["alpha_ndcg_diversity"] = alpha_ndcg_sql(
        fulltext.FLAGSHIP_QUERY, fulltext.ANDCG_K
    )
    from lucene_mapreduce_spark.operators.oracles import (
        dersimonian_laird_sql,
    )

    out["dersimonian_laird_re"] = dersimonian_laird_sql(
        parity.MH_EXPOSURE_TOKEN, parity.MH_OUTCOME_TOKEN
    )
    from lucene_mapreduce_spark.operators.oracles import (
        query_segmentation_sql,
        shard_merge_sql,
    )

    out["query_segmentation_plan"] = query_segmentation_sql(
        fulltext.FLAGSHIP_QUERY
    )
    out["shard_score_merge_audit"] = shard_merge_sql(fulltext.FLAGSHIP_QUERY)
    from lucene_mapreduce_spark.operators.oracles import maxp_sql

    out["maxp_passage_retrieval_topk"] = maxp_sql(fulltext.FLAGSHIP_QUERY)
    from lucene_mapreduce_spark.operators.oracles import footrule_sql

    out["spearman_footrule_pages"] = footrule_sql(fulltext.FLAGSHIP_QUERY)
    out["terms_enum"] = terms_enum_sql(fulltext.TERMS_ENUM_K)
    out["spell_suggest"] = spell_suggest_sql(fulltext.SPELL_INPUT)
    out["autocomplete"] = autocomplete_sql(fulltext.AUTOCOMPLETE_PREFIX)
    out["range_parsed_query"] = range_parsed_sql()
    out["boosted_query"] = boosted_sql()
    out["min_should_match_query"] = msm_sql()
    # the distributed batch twins must match the SAME oracles
    out["boosted_match_batch"] = boosted_sql()
    out["msm_match_batch"] = msm_sql()
    out["field_scoped_query"] = field_scoped_sql()
    out["search_grouped_topn"] = grouped_topn_sql(
        fulltext.FLAGSHIP_QUERY, n=fulltext.GROUP_TOP_N,
        k_groups=fulltext.GROUP_TOP_GROUPS,
    )
    out["search_collapse"] = collapse_sql(
        fulltext.FLAGSHIP_QUERY, k=fulltext.COLLAPSE_K
    )
    out["search_total_hits"] = total_hits_sql(fulltext.BOOLEAN_QUERY)
    out["search_sort_by_field"] = sort_by_field_sql(fulltext.BOOLEAN_QUERY)
    out["bm25_range_topk"] = bm25_topk_sql(
        fulltext.FLAGSHIP_QUERY,
        doc_where=f"doc_id >= {fulltext.RANGE_LO} AND doc_id < {fulltext.RANGE_HI}",
    )
    out["bm25_wand_topk"] = bm25_topk_sql(fulltext.FLAGSHIP_QUERY)
    out["bm25_wand_topk_unmerged"] = bm25_topk_sql(fulltext.FLAGSHIP_QUERY)
    out["bm25_chunkmax_topk"] = bm25_topk_sql(fulltext.FLAGSHIP_QUERY)
    out["synonym_query"] = synonym_sql(fulltext.SYNONYM_SET)
    out["dismax_query"] = dismax_sql(
        fulltext.DISMAX_SUBQUERIES, tie=fulltext.DISMAX_TIE
    )
    out["block_join_topk"] = block_join_sql(
        fulltext.FLAGSHIP_QUERY, width=fulltext.BLOCK_WIDTH
    )
    out["phrase_prefix_query"] = f"""
SELECT doc_id FROM (SELECT doc_id, {{toks}} AS toks FROM documents)
WHERE len(list_filter(range(1, len(toks)), i ->
      toks[i] = '{fulltext.PHRASE_PREFIX[0]}'
  AND starts_with(toks[i+1], '{fulltext.PHRASE_PREFIX[1]}'))) > 0
""".replace("{toks}", _TOKS)
    out["range_facets"] = range_facets_sql(
        fulltext.BOOLEAN_QUERY, fulltext.FACET_RANGES
    )
    out["rrf_fusion"] = rrf_sql(
        fulltext.FLAGSHIP_QUERY, depth=similarity.RRF_DEPTH,
        rrf_k=similarity.RRF_K,
    )
    out["explain_scores"] = explain_sql(
        fulltext.FLAGSHIP_QUERY, fulltext.EXPLAIN_DOC
    )
    out["drill_sideways_facets"] = drill_sideways_sql(
        fulltext.BOOLEAN_QUERY, *fulltext.DRILL_DOWN
    )
    out["kmv_distinct_tokens"] = kmv_sql(fulltext.KMV_K)
    out["span_first_query"] = span_first_sql(*fulltext.SPAN_FIRST)
    out["span_not_query"] = span_not_sql(*fulltext.SPAN_NOT)
    out["dl_percentiles"] = dl_percentiles_sql(fulltext.DL_PERCENTILES)
    out["rescore_topk"] = rescore_sql(
        fulltext.FLAGSHIP_QUERY,
        tuple(fulltext.PHRASE_QUERY.split()),
        fulltext.RESCORE_WEIGHT,
        n=fulltext.RESCORE_DEPTH,
    )
    out["function_score_query"] = function_score_sql(fulltext.FLAGSHIP_QUERY)
    out["search_at_generation"] = generation_sql(fulltext.FLAGSHIP_QUERY)
    out["to_child_block_join"] = to_child_sql(
        fulltext.FLAGSHIP_QUERY, width=fulltext.BLOCK_WIDTH, k=5
    )
    out["cms_heavy_hitters"] = cms_sql(
        fulltext.CMS_ROWS, fulltext.CMS_WIDTH, fulltext.CMS_TOPK
    )
    out["lmdirichlet_topk"] = lmdirichlet_sql(
        fulltext.FLAGSHIP_QUERY, mu=fulltext.LMD_MU
    )
    out["taxonomy_facets"] = taxonomy_sql(fulltext.BOOLEAN_QUERY)
    out["constant_score_query"] = constant_score_sql(*fulltext.CONST_SCORE)
    out["filter_clause_query"] = filter_clause_sql(*fulltext.FILTER_CLAUSE)
    out["terms_set_query"] = terms_set_sql(fulltext.TERMS_SET_TERMS.split())
    out["common_terms_query"] = common_terms_sql(*fulltext.COMMON_TERMS)
    out["span_or_near_query"] = span_or_near_sql(*fulltext.SPAN_OR_NEAR)
    out["hit_stats_facets"] = hit_stats_sql(fulltext.BOOLEAN_QUERY.split())
    out["bm25f_topk"] = bm25f_sql(fulltext.BM25F_QUERY, w_text=fulltext.BM25F_W[0], w_kw=fulltext.BM25F_W[1])
    out["infix_suggest"] = infix_suggest_sql(fulltext.INFIX_QUERY)
    out["term_vectors"] = term_vectors_sql(fulltext.EXPLAIN_DOC)
    out["percolate_match"] = percolate_sql(fulltext.PERCOLATE_QUERIES)
    out["lmjelinekmercer_topk"] = lmjelinekmercer_sql(
        fulltext.FLAGSHIP_QUERY, lam=fulltext.LMJM_LAMBDA
    )
    out["boosting_query"] = boosting_sql(
        fulltext.FLAGSHIP_QUERY, fulltext.BOOSTING_NEG[0], fulltext.BOOSTING_NEG[1]
    )
    out["span_within_query"] = span_within_sql(*fulltext.SPAN_WITHIN)
    out["top_hits_facets"] = top_hits_sql(
        fulltext.FLAGSHIP_QUERY, per_bucket=fulltext.TOP_HITS_PER_LANG
    )
    out["matched_queries"] = matched_queries_sql(fulltext.MATCHED_CLAUSES)
    out["streaming_percolate"] = percolate_sql(fulltext.PERCOLATE_QUERIES)
    out["highlight_all_fragments"] = highlight_sql(
        fulltext.FLAGSHIP_QUERY, k=fulltext.HIGHLIGHT_K, width=fulltext.SNIPPET_WIDTH
    )
    out["phrase_suggest"] = phrase_suggest_sql(*fulltext.PHRASE_SUGGEST_INPUT)
    out["ann_recall_at_k"] = ann_recall_sql()
    out["histogram_facets"] = histogram_sql(
        fulltext.BOOLEAN_QUERY.split(), fulltext.HISTOGRAM_WIDTH
    )
    out["adjacency_matrix_facets"] = adjacency_sql(fulltext.MATCHED_CLAUSES)
    out["composite_agg_page"] = composite_sql(
        fulltext.COMPOSITE_AFTER, fulltext.COMPOSITE_SIZE
    )
    out["funnel_analysis"] = funnel_sql(parity.FUNNEL_STEPS)
    out["filtered_ann_topk"] = filtered_ann_sql(similarity.FILTERED_ANN_LABEL)
    out["hybrid_linear_fusion"] = hybrid_linear_sql(
        fulltext.FLAGSHIP_QUERY,
        depth=similarity.HYBRID_DEPTH,
        alpha=similarity.HYBRID_ALPHA,
    )
    out["diversified_sampler_topk"] = diversified_sampler_sql(
        fulltext.FLAGSHIP_QUERY, fulltext.DIVERSIFIED_MAX_PER_SOURCE, 10
    )
    out["span_multi_near_query"] = span_multi_near_sql(*fulltext.SPAN_MULTI)
    out["search_as_you_type"] = sayt_sql(*fulltext.SAYT_INPUT, 10)
    out["derivative_pipeline"] = derivative_sql()
    out["stats_bucket_pipeline"] = stats_bucket_sql()
    out["date_range_facets"] = date_range_sql(parity.DATE_RANGES)
    out["auto_date_histogram"] = auto_date_histogram_sql(
        parity.AUTO_HISTO_TARGET
    )
    out["scroll_slices"] = scroll_slices_sql(parity.SCROLL_SLICES)
    out["percentile_ranks_agg"] = percentile_ranks_sql(
        textstats.PERCENTILE_RANK_VALUES
    )
    out["string_stats_agg"] = string_stats_sql()
    out["embedding_norm_stats"] = embedding_norm_sql()
    out["serial_diff_pipeline"] = serial_diff_sql(parity.SERIAL_DIFF_LAG)
    out["bucket_extrema_pipeline"] = bucket_extrema_sql()
    out["bucket_script_pipeline"] = bucket_script_sql()
    out["bucket_sort_pipeline"] = bucket_sort_sql(
        parity.BUCKET_SORT_FROM, parity.BUCKET_SORT_SIZE
    )
    out["normalize_pipeline"] = normalize_sql()
    out["top_metrics_agg"] = top_metrics_sql()
    out["t_test_agg"] = t_test_sql(*parity.T_TEST_GROUPS)
    out["extended_stats_agg"] = extended_stats_sql()
    out["boxplot_agg"] = boxplot_sql()
    out["mad_agg"] = mad_sql()
    out["matrix_stats_agg"] = matrix_stats_sql()
    out["filters_agg"] = filters_agg_sql(textstats.FILTERS_BUCKETS)
    out["has_child_query"] = has_child_sql(
        *parity.HAS_CHILD_PRED, parity.HAS_CHILD_MIN, 10
    )
    out["has_parent_query"] = has_parent_sql(parity.HAS_PARENT_SEGMENT, 10)
    out["children_agg"] = children_agg_sql()
    out["scripted_metric_agg"] = scripted_metric_sql()
    out["combined_fields_query"] = combined_fields_sql(
        fulltext.CF_QUERY, "source", *fulltext.CF_W, 10
    )
    out["rank_eval"] = rank_eval_sql(
        fulltext.FLAGSHIP_QUERY, fulltext.RANK_EVAL_K, fulltext.RANK_EVAL_MIN_TERMS
    )
    out["linear_classifier_topk"] = linear_classifier_sql(10)
    out["sampler_agg"] = sampler_agg_sql(
        textstats.SAMPLER_SHARDS, textstats.SAMPLER_PER_SHARD
    )
    out["geo_distance_query"] = geo_distance_sql(
        *textstats.GEO_CENTER, textstats.GEO_MAX_KM, 10
    )
    out["mget_docstore"] = mget_sql(fulltext.MGET_N)
    out["intervals_query"] = intervals_sql(*fulltext.INTERVALS)
    out["cumulative_cardinality_pipeline"] = cumulative_cardinality_sql()
    out["moving_fn_pipeline"] = moving_fn_sql(parity.MOVING_FN_WINDOW)
    out["geo_bounding_box_query"] = geo_bounding_box_sql(*textstats.GEO_BOX, 20)
    out["geotile_grid_agg"] = geotile_grid_sql(
        textstats.GEOTILE_ZOOM, 10, textstats._PI_LIT, textstats._MERC_MAX_LAT
    )
    out["hll_cardinality"] = hll_cardinality_sql(textstats.HLL_P)
    out["ewma_pipeline"] = ewma_sql(parity.EWMA_ALPHA)
    out["percentiles_bucket_pipeline"] = percentiles_bucket_sql(
        parity.PCT_BUCKET_PS
    )
    out["change_point_agg"] = change_point_sql()
    out["rate_agg"] = rate_agg_sql()
    out["categorize_text_agg"] = categorize_text_sql(
        textstats.CATEGORIZE_SIG_TOKENS, 10
    )
    out["frequent_pairs_agg"] = frequent_pairs_sql(
        textstats.FREQ_PAIRS_HOT, 10
    )
    out["tfidf_keywords"] = tfidf_keywords_sql(textstats.TFIDF_KEYWORDS_K)
    out["bpe_pair_counts"] = bpe_pairs_sql(textstats.BPE_PAIRS_K)
    out["geohash_grid_agg"] = geohash_grid_sql(10, textstats._GEOHASH32)
    out["ip_range_agg"] = ip_range_sql(textstats.IP_RANGES)
    out["stemmed_terms_agg"] = stemmed_terms_sql(textstats.STEM_TOP_K)
    out["moving_median_pipeline"] = moving_median_sql(
        parity.MOVING_MEDIAN_WINDOW
    )
    out["packing_stats"] = packing_stats_sql(textstats.PACKING_BUDGET)
    out["terms_lookup_query"] = terms_lookup_sql(20)
    out["runtime_field_query"] = runtime_field_sql(fulltext.FLAGSHIP_QUERY, 10)
    out["geo_centroid_agg"] = geo_centroid_sql(
        textstats._PI_LIT, textstats._MERC_MAX_LAT
    )
    out["mixture_resample"] = mixture_resample_sql(textstats.MIXTURE_BASE_KEEP)
    out["token_budget_trim"] = token_budget_trim_sql(textstats.TRIM_BUDGET)
    out["contexts_suggest"] = contexts_suggest_sql(
        *textstats.CTX_SUGGEST, textstats.CTX_SUGGEST_K
    )
    out["random_sampler_agg"] = random_sampler_sql(textstats.RANDOM_SAMPLER_P)
    out["pivot_table_agg"] = pivot_table_sql(textstats.PIVOT_SOURCES)
    out["cube_agg"] = cube_agg_sql()
    out["contamination_fraction"] = contamination_fraction_sql(
        3, dedup.EVAL_MOD, dedup.CONTAM_FRACTION
    )
    from lucene_mapreduce_spark.streaming import incremental as _inc
    out["streaming_stream_join"] = stream_join_sql(
        _inc.STREAM_JOIN_WINDOW_MIN
    )
    out["span_containing_query"] = span_containing_sql(*fulltext.SPAN_CONTAINING)
    out["rank_feature_query"] = rank_feature_sql(
        fulltext.FLAGSHIP_QUERY, *fulltext.RANK_FEATURE
    )
    out["distance_feature_query"] = distance_feature_sql(
        fulltext.FLAGSHIP_QUERY, *fulltext.DISTANCE_FEATURE
    )
    out["terms_shard_approx"] = terms_shard_sql(
        fulltext.TERMS_SHARD_N, fulltext.TERMS_SHARD_SIZE, fulltext.TERMS_SHARD_K
    )
    out["pii_redaction"] = pii_redaction_sql(
        textstats.PII_PATTERN, textstats.PII_MASK
    )
    out["source_frequency_cap"] = source_cap_sql(textstats.SOURCE_CAP)
    out["temperature_mixture_weights"] = mixture_weights_sql()
    out["date_histogram_facets"] = date_histogram_sql()
    out["moving_avg_pipeline"] = moving_avg_sql(parity.MOVING_AVG_WINDOW)
    out["bucket_selector_agg"] = bucket_selector_sql(
        parity.BUCKET_SELECTOR_FACTOR
    )
    out["weighted_avg_agg"] = weighted_avg_sql()
    out["multi_terms_agg"] = multi_terms_sql(
        fulltext.BOOLEAN_QUERY.split(), fulltext.MULTI_TERMS_K
    )
    out["rare_terms_agg"] = rare_terms_sql(
        fulltext.RARE_MAX_DF_FRACTION, fulltext.RARE_TERMS_K
    )
    out["pinned_query"] = pinned_sql(
        fulltext.FLAGSHIP_QUERY, fulltext.PINNED_N, 10
    )
    out["domain_quality_rollup"] = domain_quality_sql(
        textstats.QUALITY_KEEP_THRESHOLD
    )
    out["random_score_query"] = random_score_sql(fulltext.RANDOM_SEED)
    import math as _math

    out["decay_function_score"] = decay_sql(
        fulltext.FLAGSHIP_QUERY,
        fulltext.DECAY_PARAMS[0],
        fulltext.DECAY_PARAMS[1],
        _math.log(fulltext.DECAY_PARAMS[2]),
    )
    out["delete_by_query"] = bm25_topk_sql(
        fulltext.FLAGSHIP_QUERY,
        doc_where=f"NOT list_contains({_TOKS}, '{fulltext.DELETE_TERM}')",
    )
    # round-4 session-10 batch 20
    from lucene_mapreduce_spark.operators.oracles import (
        bucket_correlation_sql,
        cumulative_sum_sql,
        exists_query_sql,
        geo_line_sql,
        ip_prefix_sql,
        lexical_diversity_sql,
        significant_text_sql,
        sparse_vector_sql,
    )

    out["ip_prefix_agg"] = ip_prefix_sql(textstats.IP_PREFIX_LEN)
    out["geo_line_agg"] = geo_line_sql(
        textstats.GEO_LINE_TRACKS, textstats.GEO_LINE_SIZE
    )
    out["lexical_diversity"] = lexical_diversity_sql()
    out["cumulative_sum_pipeline"] = cumulative_sum_sql()
    out["bucket_correlation_agg"] = bucket_correlation_sql()
    out["sparse_vector_topk"] = sparse_vector_sql(
        fulltext.SPARSE_QUERY_WEIGHTS, fulltext.SPARSE_TOPK
    )
    out["significant_text_agg"] = significant_text_sql(
        fulltext.SIGTEXT_TERM, fulltext.SIGTEXT_K, fulltext.SIGTEXT_MIN_DF
    )
    out["exists_query"] = exists_query_sql(fulltext.EXISTS_FIELD_VALUES)
    from lucene_mapreduce_spark.operators.oracles import (
        bucket_count_ks_sql,
        dfr_sql,
        variable_width_histogram_sql,
    )

    out["dfr_topk"] = dfr_sql(fulltext.FLAGSHIP_QUERY, fulltext.DFR_INV_LN2, 10)
    out["variable_width_histogram_agg"] = variable_width_histogram_sql(
        textstats.VWH_K, textstats.VWH_ITERS
    )
    out["bucket_count_ks_test"] = bucket_count_ks_sql()
    from lucene_mapreduce_spark.operators.oracles import (
        BIGRAM_LOGPROB_SQL,
        OLS_TOKEN_CHARS_SQL,
        axiomatic_sql,
        dfi_sql,
        winnowing_sql,
    )

    out["dfi_topk"] = dfi_sql(fulltext.FLAGSHIP_QUERY, fulltext.DFR_INV_LN2, 10)
    out["axiomatic_topk"] = axiomatic_sql(
        fulltext.FLAGSHIP_QUERY, fulltext.AXIOMATIC_S, 10
    )
    out["bigram_logprob"] = BIGRAM_LOGPROB_SQL
    out["ols_token_chars_fit"] = OLS_TOKEN_CHARS_SQL
    out["winnowing_dup_candidates"] = winnowing_sql(
        dedup.WINNOW_K, dedup.WINNOW_W, dedup.WINNOW_CAP, dedup.WINNOW_TOPN
    )
    from lucene_mapreduce_spark.operators.oracles import (
        FLESCH_SQL,
        ZIPF_FIT_SQL,
        ccnet_buckets_sql,
        geo_distance_agg_sql,
        kmv_intersection_sql,
    )

    out["kmv_intersection"] = kmv_intersection_sql(
        fulltext.KMV_LANG_A, fulltext.KMV_LANG_B, fulltext.KMV_K
    )
    out["geo_distance_agg"] = geo_distance_agg_sql(
        textstats.GEO_CENTER[0], textstats.GEO_CENTER[1], textstats.GEO_RING_EDGES
    )
    out["ccnet_perplexity_buckets"] = ccnet_buckets_sql(textstats.CCNET_TILES)
    out["zipf_fit"] = ZIPF_FIT_SQL
    out["flesch_reading_ease"] = FLESCH_SQL
    from lucene_mapreduce_spark.operators.oracles import (
        DOMAIN_ENTROPY_SQL,
        MINHASH_AUDIT_SQL,
        asof_join_sql,
    )

    out["asof_join"] = asof_join_sql(parity.ASOF_LEFT_TYPE, parity.ASOF_RIGHT_TYPE)
    out["domain_entropy"] = DOMAIN_ENTROPY_SQL
    out["minhash_jaccard_audit"] = MINHASH_AUDIT_SQL
    from lucene_mapreduce_spark.operators.oracles import streaming_topk_keys_sql
    from lucene_mapreduce_spark.streaming.incremental import TOPK_KEYS_K

    out["streaming_topk_keys"] = streaming_topk_keys_sql(TOPK_KEYS_K)
    from lucene_mapreduce_spark.operators.oracles import (
        GINI_SQL,
        burstiness_sql,
        ks_two_sample_sql,
        reservoir_sql,
        seasonal_anomaly_sql,
    )

    out["ks_two_sample"] = ks_two_sample_sql(parity.KS_SRC_A, parity.KS_SRC_B)
    out["seasonal_anomaly_days"] = seasonal_anomaly_sql(parity.ANOMALY_SIGMA)
    out["gini_coefficient"] = GINI_SQL
    out["term_burstiness"] = burstiness_sql(
        textstats.BURSTINESS_MIN_DF, textstats.BURSTINESS_TOPK
    )
    out["reservoir_sample_per_lang"] = reservoir_sql(textstats.RESERVOIR_PER_LANG)
    from lucene_mapreduce_spark.operators.oracles import (
        DAILY_DISTINCT_USERS_SQL,
        HEAPS_FIT_SQL,
        TERMS_ORDER_BY_METRIC_SQL,
        TOKENS_PER_BYTE_SQL,
    )

    out["heaps_law_fit"] = HEAPS_FIT_SQL
    out["tokens_per_byte_by_source"] = TOKENS_PER_BYTE_SQL
    out["terms_order_by_metric"] = TERMS_ORDER_BY_METRIC_SQL
    out["daily_distinct_users"] = DAILY_DISTINCT_USERS_SQL
    from lucene_mapreduce_spark.operators.oracles import (
        HOLT_LINEAR_SQL,
        TRIGRAM_LANGID_SQL,
        chunk_stitch_sql,
    )

    out["chunk_stitch_candidates"] = chunk_stitch_sql(dedup.STITCH_K)
    out["trigram_langid_confusion"] = TRIGRAM_LANGID_SQL
    out["holt_linear_pipeline"] = HOLT_LINEAR_SQL
    from lucene_mapreduce_spark.operators.oracles import (
        NEAR_DUP_LEAKAGE_SQL,
        ann_pq_sql,
    )
    from lucene_mapreduce_spark.operators.similarity import (
        PQ_K,
        PQ_M,
        PQ_SUBDIM,
        PQ_TOPK,
        QUERY_VEC_ID,
    )

    out["ann_pq_topk"] = ann_pq_sql(PQ_M, PQ_SUBDIM, PQ_K, QUERY_VEC_ID, PQ_TOPK)
    out["near_dup_leakage_matrix"] = NEAR_DUP_LEAKAGE_SQL
    from lucene_mapreduce_spark.operators.oracles import (
        bloom_membership_sql,
        rocchio_prf_sql,
        split_report_sql,
    )

    out["rocchio_prf_topk"] = rocchio_prf_sql(
        fulltext.FLAGSHIP_QUERY,
        fulltext.PRF_FEEDBACK_K,
        fulltext.PRF_EXPANSION_N,
        fulltext.PRF_EXP_WEIGHT,
        10,
    )
    out["bloom_filter_membership"] = bloom_membership_sql(
        textstats.BLOOM_M,
        textstats.BLOOM_K,
        textstats.BLOOM_INSERT_LANG,
        textstats.BLOOM_N_PROBES,
    )
    out["train_val_test_split"] = split_report_sql(
        textstats.SPLIT_PCTS[2], textstats.SPLIT_PCTS[1]
    )
    from lucene_mapreduce_spark.operators.oracles import (
        GEO_BOUNDS_SQL,
        acf_sql,
        boolean_sim_sql,
        cosine_rescore_sql,
        ib_sql,
        sig_chi2_sql,
    )
    from lucene_mapreduce_spark.operators.similarity import (
        RESCORE_DEPTH,
        RESCORE_TOPK,
    )

    out["ib_topk"] = ib_sql(fulltext.FLAGSHIP_QUERY, fulltext.DFR_INV_LN2, 10)
    out["boolean_sim_topk"] = boolean_sim_sql(fulltext.FLAGSHIP_QUERY, 10)
    out["sig_terms_chi2"] = sig_chi2_sql(
        fulltext.BOOLEAN_QUERY, fulltext.SIGCHI2_MIN_DF, fulltext.SIGCHI2_K
    )
    out["cosine_rescore_topk"] = cosine_rescore_sql(
        fulltext.FLAGSHIP_QUERY, RESCORE_DEPTH, RESCORE_TOPK
    )
    out["autocorrelation_daily"] = acf_sql(parity.ACF_MAX_LAG)
    out["geo_bounds_agg"] = GEO_BOUNDS_SQL
    from lucene_mapreduce_spark.operators.dedup import (
        CONTAINMENT_THRESHOLD,
        MAX_BUCKET,
    )
    from lucene_mapreduce_spark.operators.oracles import (
        CENTROID_BY_LABEL_SQL,
        DUP_CLUSTER_HIST_SQL,
        KL_BY_SOURCE_SQL,
        containment_sql,
        frequent_triples_sql,
    )

    out["containment_pairs"] = containment_sql(CONTAINMENT_THRESHOLD, MAX_BUCKET)
    out["dup_cluster_size_histogram"] = DUP_CLUSTER_HIST_SQL
    out["frequent_triples_agg"] = frequent_triples_sql(
        textstats.FREQ_TRIPLES_HOT, textstats.FREQ_TRIPLES_K
    )
    out["kl_divergence_by_source"] = KL_BY_SOURCE_SQL
    out["embedding_centroid_by_label"] = CENTROID_BY_LABEL_SQL
    from lucene_mapreduce_spark.operators.oracles import (
        CHAR_TRIGRAM_ENTROPY_SQL,
        VOCAB_OVERLAP_SQL,
        most_fields_sql,
        stopword_coverage_sql,
        weighted_reservoir_sql,
    )

    out["most_fields_topk"] = most_fields_sql(fulltext.BM25F_QUERY, 10)
    out["weighted_reservoir_sample"] = weighted_reservoir_sql(
        textstats.WRS_K_PER_LANG
    )
    out["char_trigram_entropy"] = CHAR_TRIGRAM_ENTROPY_SQL
    out["vocab_overlap_sources"] = VOCAB_OVERLAP_SQL
    out["stopword_coverage"] = stopword_coverage_sql(textstats.STOPWORD_TOP_K)
    from lucene_mapreduce_spark.operators.oracles import (
        NEAR_DUP_DEGREE_HIST_SQL,
        mmr_sql,
        rbo_sql,
        session_duration_sql,
    )
    from lucene_mapreduce_spark.operators.similarity import (
        MMR_DEPTH,
        MMR_K,
        MMR_LAMBDA,
        RBO_DEPTH,
        RBO_P,
    )

    out["mmr_diversified_topk"] = mmr_sql(MMR_LAMBDA, MMR_DEPTH, MMR_K)
    out["rank_biased_overlap"] = rbo_sql(
        fulltext.FLAGSHIP_QUERY,
        [(d, (1.0 - RBO_P) * RBO_P ** (d - 1)) for d in range(1, RBO_DEPTH + 1)],
        RBO_DEPTH,
    )
    out["near_dup_degree_histogram"] = NEAR_DUP_DEGREE_HIST_SQL
    out["session_duration_stats"] = session_duration_sql(parity.SESSION_GAP_S)
    from lucene_mapreduce_spark.operators.dedup import (
        TOP_DUP_NGRAM_K,
        TOP_DUP_NGRAM_N,
    )
    from lucene_mapreduce_spark.operators.oracles import (
        LANG_SOURCE_INDEP_SQL,
        SIMHASH_HAMMING_HIST_SQL,
        session_pairs_sql,
        top_dup_ngrams_sql,
        vector_prf_sql,
    )
    from lucene_mapreduce_spark.operators.similarity import (
        VPRF_FEEDBACK_K,
        VPRF_TOPK,
    )

    out["vector_prf_topk"] = vector_prf_sql(VPRF_FEEDBACK_K, VPRF_TOPK)
    out["session_event_pairs"] = session_pairs_sql(
        parity.SESSION_GAP_S, parity.SESSION_PAIRS_K
    )
    out["top_duplicate_ngrams"] = top_dup_ngrams_sql(
        TOP_DUP_NGRAM_N, TOP_DUP_NGRAM_K
    )
    out["simhash_hamming_histogram"] = SIMHASH_HAMMING_HIST_SQL
    out["lang_source_independence"] = LANG_SOURCE_INDEP_SQL
    from lucene_mapreduce_spark.operators.oracles import (
        INT8_QUANT_AUDIT_SQL,
        user_reach_wilson_sql,
        value_percentiles_sql,
    )

    out["value_percentiles_by_type"] = value_percentiles_sql(
        parity.VALUE_PERCENTILES
    )
    out["user_reach_wilson"] = user_reach_wilson_sql(parity.WILSON_Z)
    out["int8_quantization_audit"] = INT8_QUANT_AUDIT_SQL
    from lucene_mapreduce_spark.operators.oracles import (
        TERM_DF_HISTOGRAM_SQL,
        time_to_convert_sql,
    )

    out["time_to_convert_stats"] = time_to_convert_sql(
        parity.CONVERT_FROM, parity.CONVERT_TO
    )
    out["term_df_histogram"] = TERM_DF_HISTOGRAM_SQL

    # round-4 session-13 batch 38
    from lucene_mapreduce_spark.operators.oracles import (
        CUSUM_ALERTS_SQL,
        SPAN_CORRUPTION_SQL,
        maxsim_sql,
    )

    out["maxsim_late_interaction_topk"] = maxsim_sql()
    out["span_corruption_stats"] = SPAN_CORRUPTION_SQL.replace("{toks}", _TOKS)
    out["term_drift_halves"] = out["term_drift_halves"].replace("{toks}", _TOKS)
    out["cusum_alerts"] = CUSUM_ALERTS_SQL

    # round-4 session-13 batch 39
    from lucene_mapreduce_spark.operators.oracles import (
        OOV_RATE_SQL,
        geo_polygon_sql,
        percolate_range_sql,
    )

    out["geo_polygon_query"] = geo_polygon_sql()
    out["oov_rate_by_source"] = OOV_RATE_SQL.replace("{toks}", _TOKS)
    out["percolate_range_match"] = percolate_range_sql(
        fulltext.PERCOLATE_RANGE_QUERIES
    ).replace("{toks}", _TOKS)

    # round-4 session-13 batch 40
    from lucene_mapreduce_spark.operators.oracles import (
        equidepth_sql,
        semdedup_sweep_sql,
        sig_terms_bg_sql,
    )

    out["bm25_tuned_topk"] = bm25_topk_sql(
        fulltext.FLAGSHIP_QUERY, k1=fulltext.TUNED_K1, b=fulltext.TUNED_B
    )
    out["sig_terms_background_filter"] = sig_terms_bg_sql(
        fulltext.BOOLEAN_QUERY, fulltext.SIGBG_LANG,
        k=fulltext.SIGTERMS_K, min_df=fulltext.SIGTERMS_MIN_DF,
    )
    out["equidepth_histogram_totals"] = equidepth_sql(
        relational.EQUIDEPTH_BINS
    )
    out["semdedup_threshold_sweep"] = semdedup_sweep_sql(
        similarity.SEMDEDUP_SWEEP
    )

    # round-4 session-13 batch 41
    from lucene_mapreduce_spark.operators.oracles import (
        FRONTCODING_SQL,
        rank_feature_log_sql,
        rank_feature_sigmoid_sql,
        vocab_coverage_sql,
    )

    out["rank_feature_log_query"] = rank_feature_log_sql(
        fulltext.FLAGSHIP_QUERY, *fulltext.RANK_FEATURE_LOG
    )
    out["rank_feature_sigmoid_query"] = rank_feature_sigmoid_sql(
        fulltext.FLAGSHIP_QUERY, *fulltext.RANK_FEATURE_SIGMOID
    )
    out["pit_search_after_page"] = (
        "SELECT doc_id, score, rank FROM ("
        + generation_sql(fulltext.FLAGSHIP_QUERY, k=20)
        + ") t WHERE rank > 10"
    )
    out["vocab_coverage_curve"] = vocab_coverage_sql(
        textstats.VOCAB_COVERAGE_PCTS
    ).replace("{toks}", _TOKS)
    out["term_dict_frontcoding_report"] = FRONTCODING_SQL.replace(
        "{toks}", _TOKS
    )

    # round-4 session-13 batch 42
    from lucene_mapreduce_spark.operators.oracles import (
        PAGERANK_SQL,
        SAX_SQL,
        qdp_sql,
        shingle_profile_sql,
    )
    from lucene_mapreduce_spark.operators.textstats import SHINGLE_PROFILE_WS

    out["query_difficulty_predictors"] = qdp_sql(fulltext.QDP_QUERIES).replace(
        "{toks}", _TOKS
    )
    out["shingle_uniqueness_profile"] = shingle_profile_sql(
        SHINGLE_PROFILE_WS
    ).replace("{toks}", _TOKS)
    out["sax_daily_symbols"] = SAX_SQL
    out["part_pagerank_3iter"] = PAGERANK_SQL
    out["streaming_percolate_range"] = out["percolate_range_match"]

    # round-4 session-13 batch 43
    from lucene_mapreduce_spark.operators.oracles import sig_terms_gnd_sql

    out["sig_terms_gnd"] = sig_terms_gnd_sql(
        fulltext.BOOLEAN_QUERY, k=fulltext.SIGTERMS_K,
        min_df=fulltext.SIGTERMS_MIN_DF,
    )

    # round-4 session-14 batch 46
    from lucene_mapreduce_spark.operators.oracles import (
        decayed_counts_sql,
        sig_mi_sql,
        sig_pct_sql,
    )

    out["decayed_event_counts"] = decayed_counts_sql()
    out["sig_terms_mi"] = sig_mi_sql(
        fulltext.BOOLEAN_QUERY, fulltext.SIGCHI2_MIN_DF, fulltext.SIGCHI2_K,
        fulltext.DFR_INV_LN2,
    )
    out["sig_terms_percentage"] = sig_pct_sql(
        fulltext.BOOLEAN_QUERY, fulltext.SIGCHI2_MIN_DF, fulltext.SIGCHI2_K
    )

    # round-4 session-14 batch 48
    from lucene_mapreduce_spark.operators.oracles import sig_jlh_sql

    out["sig_terms_jlh"] = sig_jlh_sql(
        fulltext.BOOLEAN_QUERY, fulltext.SIGCHI2_MIN_DF, fulltext.SIGCHI2_K
    )

    # round-4 session-14 batch 49
    from lucene_mapreduce_spark.operators.oracles import (
        cross_fields_sql,
        percolate_not_sql,
        quality_threshold_sweep_sql,
        span_position_range_sql,
    )
    from lucene_mapreduce_spark.operators.textstats import QUALITY_THRESHOLDS

    out["cross_fields_topk"] = cross_fields_sql(fulltext.BM25F_QUERY, k=10)
    out["span_position_range_query"] = span_position_range_sql(
        *fulltext.SPAN_POS_RANGE
    )
    out["percolate_not_match"] = percolate_not_sql(fulltext.PERCOLATE_NOT_QUERIES)
    out["quality_threshold_sweep"] = quality_threshold_sweep_sql(
        QUALITY_THRESHOLDS
    )

    # batch 50
    from lucene_mapreduce_spark.operators.oracles import (
        block_join_avg_sql,
        err_at_k_sql,
        global_agg_sql,
        match_bool_prefix_sql,
        payload_score_sql,
    )

    out["match_bool_prefix_query"] = match_bool_prefix_sql(
        *fulltext.MATCH_BOOL_PREFIX
    )
    out["payload_score_query"] = payload_score_sql(fulltext.PAYLOAD_TERM)
    out["block_join_avg_topk"] = block_join_avg_sql(fulltext.FLAGSHIP_QUERY)
    out["err_at_k"] = err_at_k_sql(
        fulltext.FLAGSHIP_QUERY, fulltext.RANK_EVAL_K, fulltext.RANK_EVAL_MIN_TERMS
    )
    out["global_agg"] = global_agg_sql(fulltext.GLOBAL_AGG_TERM)

    # batch 51
    from lucene_mapreduce_spark.operators.oracles import (
        conversation_block_sql,
        fuzzy_transpositions_sql,
        ivf_balance_sql,
        ngram_novelty_sql,
        pca_top_component_sql,
    )

    out["fuzzy_transpositions_query"] = fuzzy_transpositions_sql(
        fulltext.FUZZY_TRANS_QUERY
    )
    out["conversation_block_stats"] = conversation_block_sql(fulltext.BLOCK_WIDTH)
    out["ngram_novelty_by_source"] = ngram_novelty_sql(
        textstats.NOVELTY_SHINGLE_K
    )
    out["pca_top_component"] = pca_top_component_sql()
    out["ivf_balance_report"] = ivf_balance_sql()

    # batch 52
    from lucene_mapreduce_spark.operators.dedup import (
        LSH_SWEEP_CONFIGS,
        LSH_SWEEP_TAU,
        OVERLAP_MAX_SOURCES_PER_SHINGLE,
    )
    from lucene_mapreduce_spark.operators.oracles import (
        bm25plus_sql,
        lsh_band_sweep_sql,
        mlt_unlike_sql,
        source_overlap_sql,
        sqs_sql,
        terms_include_exclude_sql,
    )

    out["simple_query_string_query"] = sqs_sql(fulltext.SQS_QUERY)
    out["mlt_unlike_topk"] = mlt_unlike_sql(
        fulltext.MLT_SRC_DOC, fulltext.MLT_UNLIKE_DOC
    )
    out["bm25plus_topk"] = bm25plus_sql(
        fulltext.FLAGSHIP_QUERY, fulltext.BM25PLUS_DELTA
    )
    out["terms_agg_include_exclude"] = terms_include_exclude_sql(
        fulltext.TERMS_INCLUDE, fulltext.TERMS_EXCLUDE
    )
    out["source_overlap_matrix"] = source_overlap_sql(
        OVERLAP_MAX_SOURCES_PER_SHINGLE
    )
    out["lsh_band_sweep"] = lsh_band_sweep_sql(
        LSH_SWEEP_CONFIGS, LSH_SWEEP_TAU
    )

    # batch 53
    from lucene_mapreduce_spark.operators.oracles import (
        bigram_llr_sql,
        fuzzy_autocomplete_sql,
        multi_phrase_sql,
        rm3_sql,
        terms_partition_sql,
    )
    from lucene_mapreduce_spark.operators.textstats import LLR_MIN_PAIR, LLR_TOPK

    out["multi_phrase_query"] = multi_phrase_sql(
        fulltext.MULTI_PHRASE[0], fulltext.MULTI_PHRASE[1]
    )
    out["fuzzy_autocomplete"] = fuzzy_autocomplete_sql(
        fulltext.FUZZY_SUGGEST_INPUT, 1
    )
    out["rm3_expansion_terms"] = rm3_sql(
        fulltext.FLAGSHIP_QUERY, fulltext.PRF_FEEDBACK_K, fulltext.RM3_EXPANSION_K
    )
    out["terms_partition_agg"] = terms_partition_sql(
        fulltext.TERMS_PARTITION, fulltext.TERMS_NUM_PARTITIONS
    )
    out["bigram_llr_collocations"] = bigram_llr_sql(LLR_MIN_PAIR, LLR_TOPK)

    # batch 54
    from lucene_mapreduce_spark.operators.oracles import (
        attribution_last_touch_sql,
        mann_kendall_sql,
        session_gap_sweep_sql,
        top_event_paths_sql,
    )

    out["top_event_paths"] = top_event_paths_sql(
        parity.PATH_DEPTH, parity.PATH_TOPK
    )
    out["session_gap_sweep"] = session_gap_sweep_sql(parity.GAP_SWEEP_S)
    out["attribution_last_touch"] = attribution_last_touch_sql(
        parity.ATTR_CONVERSION
    )
    out["mann_kendall_trend"] = mann_kendall_sql(parity.MK_Z_CRIT)

    # batch 55
    from lucene_mapreduce_spark.operators.oracles import (
        COHENS_KAPPA_SQL,
        curriculum_buckets_sql,
        jsd_by_source_sql,
        pq_distortion_sql,
        repeat_exposure_sql,
        split_balance_sql,
    )
    from lucene_mapreduce_spark.operators.similarity import (
        PQ_K,
        PQ_M,
        PQ_SUBDIM,
    )
    from lucene_mapreduce_spark.operators.textstats import (
        _LN2,
        CURRICULUM_BUCKETS,
        EXPOSURE_BUDGET_MULT,
        SPLIT_PCTS,
    )

    out["pq_distortion_report"] = pq_distortion_sql(PQ_M, PQ_SUBDIM, PQ_K)
    out["curriculum_buckets"] = curriculum_buckets_sql(CURRICULUM_BUCKETS)
    out["repeat_exposure_plan"] = repeat_exposure_sql(EXPOSURE_BUDGET_MULT)
    out["split_balance_audit"] = split_balance_sql(
        SPLIT_PCTS[2], SPLIT_PCTS[2] + SPLIT_PCTS[1]
    )
    out["jsd_by_source"] = jsd_by_source_sql(_LN2)
    out["cohens_kappa"] = COHENS_KAPPA_SQL

    # batch 56
    from lucene_mapreduce_spark.operators.oracles import (
        CHI2_HOURLY_SQL,
        CRAMERS_V_SQL,
        THEIL_BY_SOURCE_SQL,
        two_proportion_z_sql,
    )

    out["cramers_v_lang_source"] = CRAMERS_V_SQL
    out["two_proportion_z_test"] = two_proportion_z_sql(
        "purchase", parity.Z_CRIT_95
    )
    out["chi2_hourly_uniformity"] = CHI2_HOURLY_SQL
    out["theil_index_by_source"] = THEIL_BY_SOURCE_SQL

    # batch 57
    from lucene_mapreduce_spark.operators.ivf import N_PROBE
    from lucene_mapreduce_spark.operators.oracles import (
        DATASET_CARD_SQL,
        ann_ivf_pq_sql,
        poisson_bootstrap_sql,
    )
    from lucene_mapreduce_spark.operators.similarity import QUERY_VEC_ID
    from lucene_mapreduce_spark.operators.textstats import (
        _POIS1_CDF,
        BOOTSTRAP_B,
    )

    out["ann_ivf_pq_topk"] = ann_ivf_pq_sql(
        PQ_M, PQ_SUBDIM, PQ_K, QUERY_VEC_ID, N_PROBE, 10
    )
    out["poisson_bootstrap_ci"] = poisson_bootstrap_sql(
        BOOTSTRAP_B, _POIS1_CDF
    )
    out["dataset_card_report"] = DATASET_CARD_SQL

    # batch 58
    from lucene_mapreduce_spark.operators.fulltext import (
        GRAPH_H1,
        GRAPH_H2,
        GRAPH_SEED_TERM,
        LTR_K,
    )
    from lucene_mapreduce_spark.operators.oracles import (
        bot_burst_sql,
        code_switch_sql,
        graph_explore_sql,
        ltr_feature_log_sql,
    )
    from lucene_mapreduce_spark.operators.parity import (
        BURST_BOT_THRESHOLD,
        BURST_WINDOW_S,
    )
    from lucene_mapreduce_spark.operators.textstats import STOPWORDS

    out["graph_explore"] = graph_explore_sql(GRAPH_SEED_TERM, GRAPH_H1, GRAPH_H2)
    out["ltr_feature_log"] = ltr_feature_log_sql(
        fulltext.FLAGSHIP_QUERY, LTR_K
    )
    out["code_switch_stats"] = code_switch_sql(STOPWORDS)
    out["bot_burst_detection"] = bot_burst_sql(
        BURST_WINDOW_S, BURST_BOT_THRESHOLD
    )

    # batch 59
    from lucene_mapreduce_spark.operators.oracles import (
        relaxation_ladder_sql,
        window_funnel_sql,
    )
    from lucene_mapreduce_spark.operators.parity import (
        FUNNEL_WINDOW_S,
        WINDOW_FUNNEL_STEPS,
    )

    out["window_funnel_steps"] = window_funnel_sql(
        FUNNEL_WINDOW_S, WINDOW_FUNNEL_STEPS
    )
    out["query_relaxation_ladder"] = relaxation_ladder_sql(
        fulltext.FLAGSHIP_QUERY
    )

    # batch 60
    from lucene_mapreduce_spark.operators.oracles import mw_synonym_sql

    out["multiword_synonym_query"] = mw_synonym_sql(
        fulltext.MW_SYNONYM_TERM, fulltext.MW_SYNONYM_PHRASE, 10
    )

    # batch 61
    from lucene_mapreduce_spark.operators.oracles import (
        file_sizing_sql,
        mlm_masking_sql,
        pq_rescore_sql,
    )
    from lucene_mapreduce_spark.operators.parity import (
        FILE_SIZING_TARGET_BYTES,
    )
    from lucene_mapreduce_spark.operators.similarity import (
        PQ_SHORTLIST,
        PQ_TOPK,
    )
    from lucene_mapreduce_spark.operators.textstats import (
        MLM_MASK_RATE,
        MLM_MASK_TOK,
        MLM_RANDOM,
    )

    out["output_file_sizing_plan"] = file_sizing_sql(FILE_SIZING_TARGET_BYTES)
    out["mlm_masking_plan"] = mlm_masking_sql(
        MLM_MASK_RATE, MLM_MASK_TOK, MLM_RANDOM
    )
    out["pq_rescore_topk"] = pq_rescore_sql(
        PQ_M, PQ_SUBDIM, PQ_K, QUERY_VEC_ID, PQ_SHORTLIST, PQ_TOPK
    )

    # batch 62
    from lucene_mapreduce_spark.operators.oracles import (
        cosine_pair_histogram_sql,
        holt_winters_sql,
    )
    from lucene_mapreduce_spark.operators.parity import HW_SEASON
    from lucene_mapreduce_spark.operators.similarity import PAIR_HASH_MULT

    out["holt_winters_pipeline"] = holt_winters_sql(HW_SEASON)
    out["cosine_pair_histogram"] = cosine_pair_histogram_sql(PAIR_HASH_MULT)

    # batch 63
    from lucene_mapreduce_spark.operators.oracles import (
        attribution_position_sql,
        textrank_sql,
    )
    from lucene_mapreduce_spark.operators.parity import ATTR_CONVERSION
    from lucene_mapreduce_spark.operators.textstats import (
        TEXTRANK_D,
        TEXTRANK_ITERS,
        TEXTRANK_MIN_SUPPORT,
        TEXTRANK_TOP_K,
    )

    out["textrank_keywords"] = textrank_sql(
        TEXTRANK_MIN_SUPPORT, TEXTRANK_ITERS, TEXTRANK_D, TEXTRANK_TOP_K
    )
    out["attribution_position_based"] = attribution_position_sql(
        ATTR_CONVERSION
    )

    # batch 64
    from lucene_mapreduce_spark.operators.oracles import (
        session_entry_conversion_sql,
    )
    from lucene_mapreduce_spark.operators.parity import SESSION_GAP_S

    out["session_entry_conversion"] = session_entry_conversion_sql(
        SESSION_GAP_S, ATTR_CONVERSION
    )

    # batch 65
    from lucene_mapreduce_spark.operators.oracles import bm25_sweep_sql

    out["bm25_param_sweep_overlap"] = bm25_sweep_sql(
        fulltext.FLAGSHIP_QUERY, fulltext.BM25_SWEEP_COMBOS
    )

    # batch 66 — percolate_pruned must match percolate_match's oracle
    # EXACTLY (same semantics, cheaper plan)
    from lucene_mapreduce_spark.operators.oracles import item_cosine_sql
    from lucene_mapreduce_spark.operators.relational import (
        AFFINITY_MIN_SUPPORT,
        ITEM_COSINE_TOP_K,
    )

    out["percolate_pruned"] = percolate_sql(fulltext.PERCOLATE_QUERIES)
    out["item_cosine_similarity"] = item_cosine_sql(
        AFFINITY_MIN_SUPPORT, ITEM_COSINE_TOP_K
    )

    # batch 67
    from lucene_mapreduce_spark.operators.dedup import TFIDF_RESCORE_TOP_K
    from lucene_mapreduce_spark.operators.oracles import (
        lsh_tfidf_rescore_sql,
        nprobe_curve_sql,
    )
    from lucene_mapreduce_spark.operators.similarity import NPROBE_CURVE

    out["ivf_nprobe_recall_curve"] = nprobe_curve_sql(NPROBE_CURVE, 5)
    out["lsh_tfidf_cosine_rescore"] = lsh_tfidf_rescore_sql(
        TFIDF_RESCORE_TOP_K
    )

    # batch 69
    from lucene_mapreduce_spark.operators.oracles import rollover_plan_sql
    from lucene_mapreduce_spark.operators.parity import ROLLOVER_MAX_DOCS

    out["index_rollover_plan"] = rollover_plan_sql(ROLLOVER_MAX_DOCS)

    # batch 70
    from lucene_mapreduce_spark.operators.oracles import (
        attribution_time_decay_sql,
    )
    from lucene_mapreduce_spark.operators.parity import (
        TD_LAM_LIT,
        TD_LOOKBACK_S,
    )

    out["attribution_time_decay"] = attribution_time_decay_sql(
        parity.ATTR_CONVERSION, TD_LAM_LIT, TD_LOOKBACK_S
    )

    # batch 71
    from lucene_mapreduce_spark.operators.oracles import (
        dup_run_sql,
        rake_sql,
        sprt_sql,
    )

    out["rake_keywords"] = rake_sql(
        textstats.RAKE_TOP_K,
        textstats.RAKE_MAX_PHRASE_LEN,
        textstats.RAKE_STOPWORDS,
    )
    out["dup_shingle_run_report"] = dup_run_sql(textstats.DUP_RUN_MIN)
    out["sprt_daily_llr"] = sprt_sql(
        parity.SPRT_L1_LIT, parity.SPRT_L0_LIT, parity.SPRT_BOUND_LIT
    )

    # batch 72
    from lucene_mapreduce_spark.operators.oracles import (
        log_merge_sql,
        shard_allocation_sql,
        sort_missing_sql,
    )

    out["log_merge_plan"] = log_merge_sql(parity.LOG_MERGE_FACTOR)
    out["shard_allocation_plan"] = shard_allocation_sql(
        parity.N_ALLOC_SHARDS, parity.N_ALLOC_NODES
    )
    out["search_sort_missing_last"] = sort_missing_sql(
        fulltext.SORT_MISSING_K
    )

    # batch 73
    from lucene_mapreduce_spark.operators.oracles import (
        bounce_rate_sql,
        feature_hash_sql,
        triplet_mining_sql,
    )

    out["bounce_rate_by_entry"] = bounce_rate_sql(parity.SESSION_GAP_S)
    out["triplet_mining_plan"] = triplet_mining_sql(
        similarity.TRIPLET_MOD, similarity.TRIPLET_MARGIN
    )
    out["feature_hash_collision_report"] = feature_hash_sql(
        textstats.FEATURE_HASH_BUCKETS
    )

    # batch 74
    from lucene_mapreduce_spark.operators.oracles import (
        eql_sequence_sql,
        unpivot_lang_sql,
        window_rank_sql,
    )

    out["eql_sequence_match"] = eql_sequence_sql(parity.EQL_MAXSPAN_S)
    out["window_rank_functions"] = window_rank_sql()
    out["unpivot_lang_counts"] = unpivot_lang_sql(parity.UNPIVOT_LANGS)

    # batch 75: the experimentation pack
    from lucene_mapreduce_spark.operators.oracles import (
        ab_power_sql,
        did_sql,
    )

    out["ab_power_analysis"] = ab_power_sql(
        parity.AB_Z_ALPHA, parity.AB_Z_BETA, parity.AB_MDE
    )
    out["did_estimate"] = did_sql(parity.DID_SPLIT_US)

    # batch 76: graph pack + CH retention
    from lucene_mapreduce_spark.operators.oracles import (
        kcore_sql,
        lpa_sql,
        retention_sql,
    )

    out["kcore_peel_rounds"] = kcore_sql(
        relational.AFFINITY_MIN_SUPPORT,
        relational.KCORE_K,
        relational.KCORE_ROUNDS,
    )
    out["label_propagation_parts"] = lpa_sql(
        relational.AFFINITY_MIN_SUPPORT, relational.LPA_ITERS
    )
    out["retention_conditions"] = retention_sql(
        *parity.RETENTION_WINDOWS_D
    )

    # batch 77: lakehouse layout plans
    from lucene_mapreduce_spark.operators.oracles import (
        file_skipping_sql,
        zorder_sql,
    )

    out["zorder_layout_plan"] = zorder_sql(
        relational.ZORDER_N_FILES,
        relational.ZORDER_X_BUCKETS,
        relational.ZORDER_Y_BUCKETS,
        relational.ZORDER_PRED_BUCKET,
    )
    from lucene_mapreduce_spark.operators.oracles import hilbert_sql

    out["hilbert_layout_plan"] = hilbert_sql(
        relational.ZORDER_N_FILES,
        relational.ZORDER_X_BUCKETS,
        relational.ZORDER_Y_BUCKETS,
        relational.ZORDER_PRED_BUCKET,
    )
    _skip_lo = 883612800000000  # 1998-01-01T00:00:00Z us
    _skip_hi = 891302400000000  # 1998-03-31T00:00:00Z us
    out["file_skipping_audit"] = file_skipping_sql(
        relational.SKIP_N_FILES, str(_skip_lo), str(_skip_hi)
    )

    # batch 78: shingle field, index-sort plan, HLL union
    from lucene_mapreduce_spark.operators.oracles import (
        hll_union_sql,
        index_sort_plan_sql,
        shingle_field_sql,
    )

    out["shingle_field_topk"] = shingle_field_sql(
        fulltext.FLAGSHIP_QUERY, fulltext.SHINGLE_W
    )
    out["index_sort_plan"] = index_sort_plan_sql(
        fulltext.SORT_PLAN_SEGMENTS, fulltext.SORT_PLAN_K
    )
    out["hll_union_sources"] = hll_union_sql(textstats.HLL_P)

    # batch 79: Borda fusion, JL audit, Bollinger bands
    from lucene_mapreduce_spark.operators.oracles import (
        bollinger_sql,
        borda_sql,
        jl_audit_sql,
    )

    out["borda_fusion_topk"] = borda_sql(
        fulltext.FLAGSHIP_QUERY,
        similarity.RRF_DEPTH,
        similarity.BORDA_W_LEX,
        similarity.BORDA_W_VEC,
    )
    out["jl_projection_audit"] = jl_audit_sql(
        similarity._jl_signs(), similarity.PAIR_HASH_MULT
    )
    out["bollinger_bands_daily"] = bollinger_sql(
        parity.BOLLINGER_WINDOW, parity.BOLLINGER_NSIGMA
    )

    # batch 80: EQL until, nav window functions, b-bit minhash
    from lucene_mapreduce_spark.operators.oracles import (
        BBIT_MINHASH_SQL,
        WINDOW_NAV_SQL,
        eql_until_sql,
    )

    out["eql_sequence_until"] = eql_until_sql(parity.EQL_MAXSPAN_S)
    out["window_nav_functions"] = WINDOW_NAV_SQL
    out["bbit_minhash_audit"] = BBIT_MINHASH_SQL

    # batch 81: grid DBSCAN (drift/anisotropy ride literal ORACLES)
    from lucene_mapreduce_spark.operators.oracles import dbscan_sql

    out["geo_grid_dbscan_cores"] = dbscan_sql(
        textstats.DBSCAN_CELL,
        textstats.DBSCAN_FACTOR,
        textstats.DBSCAN_N_CELLS,
    )

    # batch 82: AMS F2 sketch, k-anonymity, DP counts
    from lucene_mapreduce_spark.operators.oracles import (
        ams_f2_sql,
        dp_counts_sql,
        k_anon_sql,
    )

    out["ams_f2_sketch_audit"] = ams_f2_sql(textstats.AMS_SKETCHES)
    out["k_anonymity_audit"] = k_anon_sql(
        textstats.K_ANON_THRESHOLD, textstats.K_ANON_CHARS_BUCKET
    )
    out["dp_noisy_counts"] = dp_counts_sql(textstats.DP_EPSILON)

    # batch 83: 2-hop centrality, order dedup, RLE audit
    from lucene_mapreduce_spark.operators.oracles import (
        RLE_AUDIT_SQL,
        dup_order_sql,
        harmonic_2hop_sql,
    )

    out["harmonic_centrality_2hop"] = harmonic_2hop_sql(
        relational.AFFINITY_MIN_SUPPORT
    )
    out["duplicate_order_detection"] = dup_order_sql(
        relational.DUP_ORDER_WINDOW_D, relational.DUP_ORDER_PRICE_BAND
    )
    out["rle_encodability_audit"] = RLE_AUDIT_SQL

    # batch 84: seasonality strength, forecast backtest, bloom skip
    from lucene_mapreduce_spark.operators.oracles import (
        FORECAST_BACKTEST_SQL,
        bloom_skip_sql,
        dow_strength_sql,
    )

    out["dow_seasonality_strength"] = dow_strength_sql(
        parity.DOW_ANCHOR_DAY
    )
    out["forecast_baseline_backtest"] = FORECAST_BACKTEST_SQL
    out["bloom_file_skipping_audit"] = bloom_skip_sql(
        relational.BLOOM_FILES,
        relational.BLOOM_BITS,
        relational.BLOOM_PROBE_STRIDE,
        relational.BLOOM_N_PROBES,
    )

    # batch 85: constraint suite, data profiling, any-order funnel
    from lucene_mapreduce_spark.operators.oracles import (
        CONSTRAINT_SUITE_SQL,
        any_order_funnel_sql,
        data_profile_sql,
    )

    out["constraint_check_suite"] = CONSTRAINT_SUITE_SQL
    out["data_profile_audit"] = data_profile_sql(parity.PROFILE_COLS)
    out["any_order_funnel"] = any_order_funnel_sql(
        parity.ANY_ORDER_TYPES, parity.ANY_ORDER_WINDOW_S
    )

    # batch 86: decompounder, date math, set ops
    from lucene_mapreduce_spark.operators.oracles import (
        SET_OPS_SQL,
        compound_split_sql,
        date_math_sql,
    )

    out["compound_split_suggest"] = compound_split_sql(
        fulltext.COMPOUND_INPUTS
    )
    out["date_math_range_query"] = date_math_sql(fulltext.DATE_MATH_DAYS)
    out["set_operations_users"] = SET_OPS_SQL

    # batch 87: funnel latency matrix, basket sizes, SLO burn
    from lucene_mapreduce_spark.operators.oracles import (
        BASKET_SIZE_SQL,
        funnel_latency_sql,
        slo_burn_sql,
    )

    out["funnel_step_latency_matrix"] = funnel_latency_sql(
        parity.EQL_MAXSPAN_S
    )
    out["basket_size_stats"] = BASKET_SIZE_SQL
    out["slo_burn_alerts"] = slo_burn_sql(
        parity.SLO_ERROR_BUDGET,
        parity.SLO_WINDOWS_H[0],
        parity.SLO_WINDOWS_H[1],
        parity.SLO_BURN_THRESHOLD,
    )

    # batch 88: Neyman allocation, dict-encoding audit, join skew
    from lucene_mapreduce_spark.operators.oracles import (
        dict_audit_sql,
        join_skew_sql,
        neyman_sql,
    )

    out["neyman_allocation_plan"] = neyman_sql(textstats.NEYMAN_BUDGET)
    out["dict_encoding_audit"] = dict_audit_sql(textstats.DICT_AUDIT_COLS)
    out["join_skew_report"] = join_skew_sql(textstats.JOIN_SKEW_KEYS)

    # batch 89: Welford merge, correlated subquery, Hurst exponent
    from lucene_mapreduce_spark.operators.oracles import (
        WELFORD_MERGE_SQL,
        correlated_subquery_sql,
        hurst_sql,
    )

    out["welford_merge_audit"] = WELFORD_MERGE_SQL
    out["correlated_subquery_gate"] = correlated_subquery_sql(20)
    out["hurst_exponent_daily"] = hurst_sql(parity.HURST_WINDOWS)

    # batch 90: tuning advisor, revenue waterfall, Markov absorption
    from lucene_mapreduce_spark.operators.oracles import (
        REVENUE_WATERFALL_SQL,
        markov_absorption_sql,
        tuning_advisor_sql,
    )

    out["spark_tuning_advisor"] = tuning_advisor_sql(
        relational.ADVISOR_TABLES,
        relational.ADVISOR_BROADCAST_BYTES,
        relational.ADVISOR_PARTITION_BYTES,
        relational.ADVISOR_SLOTS,
        relational.ADVISOR_SCHEMAS,
    )
    out["revenue_waterfall"] = REVENUE_WATERFALL_SQL
    out["markov_absorption_3step"] = markov_absorption_sql(
        parity.MARKOV_TARGET
    )

    # batch 91: packing attention waste, pass@k, hapax
    from lucene_mapreduce_spark.operators.oracles import (
        HAPAX_SQL,
        packing_waste_sql,
        pass_at_k_sql,
    )

    out["packing_attention_waste"] = packing_waste_sql(
        textstats.PACKING_BUDGET
    )
    out["pass_at_k_estimate"] = pass_at_k_sql(textstats.PASS_AT_K)
    out["hapax_report"] = HAPAX_SQL

    # batch 92: CDC chunking, recsys coverage/novelty, l-diversity
    from lucene_mapreduce_spark.operators.oracles import (
        L_DIVERSITY_SQL,
        cdc_sql,
        recsys_sql,
    )

    out["cdc_chunk_histogram"] = cdc_sql(
        textstats.CDC_WGRAM, textstats.CDC_DIVISOR
    )
    out["recsys_coverage_novelty"] = recsys_sql(textstats.RECSYS_TOPK)
    out["l_diversity_audit"] = L_DIVERSITY_SQL

    # batch 93: delta varint, AQE coalesce plan, systematic sample
    from lucene_mapreduce_spark.operators.oracles import (
        DELTA_VARINT_SQL,
        aqe_coalesce_sql,
        systematic_sample_sql,
    )

    out["delta_varint_audit"] = DELTA_VARINT_SQL
    out["aqe_coalesce_plan"] = aqe_coalesce_sql(
        relational.AQE_PARTITIONS, relational.AQE_TARGET_DIV
    )
    out["systematic_sample_audit"] = systematic_sample_sql(
        relational.SYS_SAMPLE_K, relational.SYS_SAMPLE_OFFSET
    )

    # batch 94: median-of-medians, dense_rank, quantile disc/cont
    from lucene_mapreduce_spark.operators.oracles import (
        dense_rank_sql,
        mom_sql,
        qdc_sql,
    )

    out["median_of_medians_audit"] = mom_sql(parity.MOM_BUCKETS)
    out["dense_rank_ties_page"] = dense_rank_sql(50)
    out["quantile_disc_cont_audit"] = qdc_sql(parity.QDC_PS)

    # batch 95: t-closeness, selectivity audit, PSI drift
    from lucene_mapreduce_spark.operators.oracles import (
        T_CLOSENESS_SQL,
        psi_sql,
        selectivity_sql,
    )

    out["t_closeness_audit"] = T_CLOSENESS_SQL
    out["selectivity_independence_audit"] = selectivity_sql(
        textstats.SELECTIVITY_PREDS
    )
    out["psi_value_drift"] = psi_sql(textstats.PSI_DECILES)

    # batch 96: quantization granularity, bloom join pushdown
    from lucene_mapreduce_spark.operators.oracles import (
        QUANT_GRANULARITY_SQL,
        bloom_join_sql,
    )

    out["quantization_granularity_audit"] = QUANT_GRANULARITY_SQL
    out["bloom_join_pushdown_audit"] = bloom_join_sql(
        relational.BLOOM_JOIN_BITS, 883612800000000, 891302400000000
    )

    # batch 97: assortativity, weighted median, simhash balance
    from lucene_mapreduce_spark.operators.oracles import (
        ASSORTATIVITY_SQL,
        SIMHASH_BIT_BALANCE_SQL,
        WEIGHTED_MEDIAN_SQL,
    )

    out["degree_assortativity"] = ASSORTATIVITY_SQL
    out["weighted_median_price"] = WEIGHTED_MEDIAN_SQL
    out["simhash_bit_balance"] = SIMHASH_BIT_BALANCE_SQL

    # batch 98: local clustering, Jain fairness, overlap depth
    from lucene_mapreduce_spark.operators.oracles import (
        JAIN_FAIRNESS_SQL,
        file_overlap_sql,
        local_clustering_sql,
    )

    out["local_clustering_topk"] = local_clustering_sql(
        relational.AFFINITY_MIN_SUPPORT, 20
    )
    out["jain_fairness_index"] = JAIN_FAIRNESS_SQL
    out["file_overlap_depth"] = file_overlap_sql(relational.SKIP_N_FILES)

    # batch 99: join cardinality, entropy bound, randomized response
    from lucene_mapreduce_spark.operators.oracles import (
        CHAR_ENTROPY_BOUND_SQL,
        join_card_sql,
        rr_audit_sql,
    )

    out["join_cardinality_audit"] = join_card_sql(
        relational.JOIN_CARD_PAIRS
    )
    out["char_entropy_compression_bound"] = CHAR_ENTROPY_BOUND_SQL
    out["randomized_response_audit"] = rr_audit_sql(textstats.RR_FLIP_P)

    # batch 100: NULL semantics, circular stats, repeat purchases
    from lucene_mapreduce_spark.operators.oracles import (
        circular_hour_sql,
        null_semantics_sql,
        repeat_part_sql,
    )

    out["null_semantics_gate"] = null_semantics_sql(parity.NULL_SEM_UID)
    out["circular_hour_concentration"] = circular_hour_sql(
        parity.CIRC_TWO_PI
    )
    out["repeat_part_purchase_rate"] = repeat_part_sql(20)

    # batch 101: Good-Turing, Simpson diversity, edit-1 pairs
    from lucene_mapreduce_spark.operators.oracles import (
        SIMPSON_DIVERSITY_SQL,
        VOCAB_EDIT1_SQL,
        good_turing_sql,
    )

    out["good_turing_counts"] = good_turing_sql(textstats.GT_MAX_R)
    out["simpson_diversity_by_source"] = SIMPSON_DIVERSITY_SQL
    out["vocab_edit1_pairs"] = VOCAB_EDIT1_SQL

    # batch 102: posting gaps, pre-purchase dwell, penny rounding
    from lucene_mapreduce_spark.operators.oracles import (
        PENNY_ROUNDING_SQL,
        POSTING_GAP_SQL,
        PRE_PURCHASE_DWELL_SQL,
    )

    out["posting_gap_histogram"] = POSTING_GAP_SQL
    out["pre_purchase_dwell"] = PRE_PURCHASE_DWELL_SQL
    out["penny_rounding_audit"] = PENNY_ROUNDING_SQL

    # batch 103: transition entropy, next-basket baseline, WIP aging
    from lucene_mapreduce_spark.operators.oracles import (
        NEXT_BASKET_SQL,
        TRANSITION_ENTROPY_SQL,
        order_aging_sql,
    )

    out["transition_entropy_rate"] = TRANSITION_ENTROPY_SQL
    out["next_basket_repeat_baseline"] = NEXT_BASKET_SQL
    out["order_aging_wip"] = order_aging_sql(parity.WIP_BUCKET_DAYS)

    # batch 104: stopword plan, winsorized mean, lag-1 coherence
    from lucene_mapreduce_spark.operators.oracles import (
        lag1_coherence_sql,
        stopword_plan_sql,
        winsorized_mean_sql,
    )

    out["stopword_pruning_plan"] = stopword_plan_sql(
        fulltext.STOPWORD_KS
    )
    out["winsorized_mean_audit"] = winsorized_mean_sql(
        *parity.WINSOR_P
    )
    out["embedding_lag1_coherence"] = lag1_coherence_sql(
        similarity.PAIR_HASH_MULT
    )

    # batch 105: Dn rolling retention
    from lucene_mapreduce_spark.operators.oracles import dn_retention_sql

    out["dn_retention_summary"] = dn_retention_sql(parity.DN_OFFSETS)

    # batch 106: business days, divmod semantics
    from lucene_mapreduce_spark.operators.oracles import (
        business_day_sql,
        divmod_semantics_sql,
    )

    out["business_day_latency"] = business_day_sql(relational.DOW_ANCHOR)
    out["integer_division_semantics_gate"] = divmod_semantics_sql(
        relational.DIVMOD_PROBE_SHIFT
    )

    # batch 107: serving padding waste
    from lucene_mapreduce_spark.operators.oracles import padding_waste_sql

    out["padding_waste_audit"] = padding_waste_sql(
        textstats.PADDING_BATCH
    )

    # batch 108: token-bucket rate limiting
    from lucene_mapreduce_spark.operators.oracles import token_bucket_sql

    out["token_bucket_rate_limit"] = token_bucket_sql(
        parity.TB_BURST, parity.TB_RATE_PER_S
    )

    # batch 109: source minhash, pinball loss
    from lucene_mapreduce_spark.operators.oracles import (
        SOURCE_MINHASH_SQL,
        pinball_sql,
    )

    out["source_minhash_jaccard"] = SOURCE_MINHASH_SQL
    out["pinball_loss_backtest"] = pinball_sql(parity.PINBALL_Q)
    return out
