"""Dump formatted physical plans of headline queries to PLANS.md.

Usage: python tools/explain_all.py   (writes PLANS.md at the repo root)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADER = """# PLANS — physical plans of the headline queries (auto-generated)

`python tools/explain_all.py` regenerates this file. What to look for:
- **PushedFilters / PartitionFilters** on every scan (term dictionary
  filters reach parquet row groups; phash prunes directories)
- **ReadSchema** minimal (column pruning)
- **BroadcastHashJoin** for every dimension/stats/query-terms join — the
  corpus or posting side never shuffles for scoring
- **WholeStageCodegen** spans around all relational work; Python appears
  only as MapInArrow/MapInPandas islands (the codec/tokenizer kernels)
"""


def main() -> None:
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    from lucene_mapreduce_spark.operators import dedup, fulltext, parity
    from lucene_mapreduce_spark.plans.inspect import explain_str
    from lucene_mapreduce_spark.session import get_spark

    spark = get_spark("explain", cpus=8)

    sections = [
        ("bm25_topk (corpus-scan BM25, flagship)",
         lambda: fulltext.bm25_topk_documents(spark, sf_dir)),
        ("bm25_index_topk (segment-index BM25: build+merge+query)",
         lambda: fulltext.bm25_index_topk_documents(spark, sf_dir)),
        ("index_lookup_join (J1 dimension join)",
         lambda: parity.index_lookup_join(spark, sf_dir)),
        ("ttl_anti_join (J3)",
         lambda: parity.ttl_anti_join(spark, sf_dir)),
        ("generation_fallback (J2, one-shuffle form)",
         lambda: parity.generation_fallback(spark, sf_dir)),
        ("exact_dedup",
         lambda: dedup.exact_dedup(spark, sf_dir)),
        ("minhash_lsh_pairs",
         lambda: dedup.minhash_lsh_pairs(spark, sf_dir)),
        ("ann_lsh_topk (multi-table multi-probe hyperplane LSH)",
         lambda: __import__(
             "lucene_mapreduce_spark.operators.similarity", fromlist=["x"]
         ).ann_lsh_topk(spark, sf_dir)),
        ("embedding_near_dup_pairs (LSH-band-blocked self-join)",
         lambda: __import__(
             "lucene_mapreduce_spark.operators.similarity", fromlist=["x"]
         ).embedding_near_dup_pairs(spark, sf_dir)),
        ("media_decode_stats (binary decode kernel over derived media)",
         lambda: __import__(
             "lucene_mapreduce_spark.operators.multimodal", fromlist=["x"]
         ).media_decode_stats(spark, sf_dir)),
        ("ann_ivf_topk (IVF-Flat: shuffle-free list assignment + probe)",
         lambda: __import__(
             "lucene_mapreduce_spark.operators.ivf", fromlist=["x"]
         ).ann_ivf_topk(spark, sf_dir)),
        ("bm25_range_topk (docid-range scoped search: chunk-span pruning)",
         lambda: fulltext.bm25_range_topk_documents(spark, sf_dir)),
        ("search_snippets (highlighter: top-k join docstore, codegen slice)",
         lambda: fulltext.search_snippets(spark, sf_dir)),
        ("search_facets (hit-list broadcast over codegen facet dims)",
         lambda: fulltext.search_facets(spark, sf_dir)),
        ("phrase_match_batch (distributed positional phrase: join chain + "
         "array intersection, no UDF)",
         lambda: fulltext.phrase_match_batch(spark, sf_dir)),
        ("search_collapse (grouping: per-lang best hit over exact scores)",
         lambda: fulltext.search_collapse(spark, sf_dir)),
        ("tfidf_topk (pluggable similarity over the index read path)",
         lambda: fulltext.tfidf_topk(spark, sf_dir)),
        ("field_facets (index-only facet counts: keyword postings x hits)",
         lambda: fulltext.field_facets(spark, sf_dir)),
        ("contamination_check (decontamination: broadcast eval shingles)",
         lambda: dedup.contamination_check(spark, sf_dir)),
        ("gopher_rules (shuffle-free per-row quality expressions)",
         lambda: __import__(
             "lucene_mapreduce_spark.operators.textstats", fromlist=["x"]
         ).gopher_rules(spark, sf_dir)),
        ("ann_batch_topk (probe batch: one scan, per-query WindowGroupLimit)",
         lambda: __import__(
             "lucene_mapreduce_spark.operators.similarity", fromlist=["x"]
         ).ann_batch_topk(spark, sf_dir)),
        ("ann_ivf_batch_topk (batch probing: broadcast (query, list) frame "
         "over the list-pruned scan)",
         lambda: __import__(
             "lucene_mapreduce_spark.operators.ivf", fromlist=["x"]
         ).ann_ivf_batch_topk(spark, sf_dir)),
        ("semdedup (IVF-cluster semantic dedup: intra-cluster pair join)",
         lambda: __import__(
             "lucene_mapreduce_spark.operators.similarity", fromlist=["x"]
         ).semdedup(spark, sf_dir)),
        ("unigram_logprob (corpus-unigram LM cross-entropy scoring)",
         lambda: __import__(
             "lucene_mapreduce_spark.operators.textstats", fromlist=["x"]
         ).unigram_logprob(spark, sf_dir)),
        ("slop_match_batch (distributed sloppy phrase: greedy chain expr)",
         lambda: fulltext.slop_match_batch(spark, sf_dir)),
        ("duplicate_ngram_fraction (substring-dup signal: gram df join)",
         lambda: dedup.duplicate_ngram_fraction(spark, sf_dir)),
        ("dsir_importance_weights (hashed-bigram importance weights)",
         lambda: __import__(
             "lucene_mapreduce_spark.operators.textstats", fromlist=["x"]
         ).dsir_importance_weights(spark, sf_dir)),
        ("synonym_query (SynonymQuery blend: one-row df broadcast)",
         lambda: fulltext.synonym_query(spark, sf_dir)),
        ("dismax_query (DisjunctionMaxQuery: per-subquery exact scores)",
         lambda: fulltext.dismax_query(spark, sf_dir)),
        ("block_join_topk (ToParentBlockJoin: parent rollup groupBy)",
         lambda: fulltext.block_join_topk(spark, sf_dir)),
        ("phrase_prefix_query (MultiPhraseQuery: unioned position lists)",
         lambda: fulltext.phrase_prefix_query(spark, sf_dir)),
        ("range_facets (LongRangeFacetCounts over the full hit set)",
         lambda: fulltext.range_facets(spark, sf_dir)),
        ("rrf_fusion (hybrid BM25 + cosine reciprocal-rank fusion)",
         lambda: __import__(
             "lucene_mapreduce_spark.operators.similarity", fromlist=["x"]
         ).rrf_fusion(spark, sf_dir)),
        ("explain_scores (per-term breakdown: broadcast df join)",
         lambda: fulltext.explain_scores(spark, sf_dir)),
        ("drill_sideways_facets (two dims, semi-join drill filter)",
         lambda: fulltext.drill_sideways_facets(spark, sf_dir)),
        ("kmv_distinct_tokens (TakeOrdered k-min sketch, no global "
         "count-distinct)",
         lambda: fulltext.kmv_distinct_tokens(spark, sf_dir)),
        ("span_not_query (positional exists/forall codegen)",
         lambda: fulltext.span_not_query(spark, sf_dir)),
        ("search_at_generation (PIT manifest prune — single-segment scan)",
         lambda: fulltext.search_at_generation(spark, sf_dir)),
        ("to_child_block_join (parent rollup + broadcast child expansion)",
         lambda: fulltext.to_child_block_join(spark, sf_dir)),
        ("cms_heavy_hitters (vocab-reduced sketch cells, broadcast est join)",
         lambda: fulltext.cms_heavy_hitters(spark, sf_dir)),
        ("lmdirichlet_topk (pruned postings + manifest total_tokens)",
         lambda: fulltext.lmdirichlet_topk(spark, sf_dir)),
        ("taxonomy_facets (rollup lattice, one shuffle via partial aggs)",
         lambda: fulltext.taxonomy_facets(spark, sf_dir)),
        ("percolate_match (broadcast query registry vs pruned postings)",
         lambda: fulltext.percolate_match(spark, sf_dir)),
        ("delete_by_query (left-anti delete mask + survivor-stat deltas)",
         lambda: fulltext.delete_by_query(spark, sf_dir)),
        ("bm25f_topk (two-field tf merge: full join + any-field df)",
         lambda: fulltext.bm25f_topk(spark, sf_dir)),
        ("term_vectors (doc-major point lookup: chunk row-group pruning)",
         lambda: fulltext.term_vectors(spark, sf_dir)),
        ("events_rollup (temporal ROLLUP, DECIMAL-exact order-free sums)",
         lambda: parity.events_rollup(spark, sf_dir)),
        ("filter_clause_query (scoreless FILTER: left join + TakeOrdered)",
         lambda: fulltext.filter_clause_query(spark, sf_dir)),
        ("boosting_query (broadcast negative set over unranked BM25 face)",
         lambda: fulltext.boosting_query(spark, sf_dir)),
        ("top_hits_facets (per-bucket window — partitioned, never global)",
         lambda: fulltext.top_hits_facets(spark, sf_dir)),
        ("matched_queries (broadcast named-clause registry, one shuffle)",
         lambda: fulltext.matched_queries(spark, sf_dir)),
        ("random_score_query (pure codegen map + TakeOrdered, no shuffle)",
         lambda: fulltext.random_score_query(spark, sf_dir)),
        ("highlight_all_fragments (hits-sized docstore join, codegen slice)",
         lambda: fulltext.highlight_all_fragments(spark, sf_dir)),
        ("phrase_suggest (broadcast candidate frames over one bigram agg)",
         lambda: fulltext.phrase_suggest(spark, sf_dir)),
        ("ann_recall_at_k (IVF vs brute semi-join audit)",
         lambda: __import__(
             "lucene_mapreduce_spark.operators.similarity", fromlist=["x"]
         ).ann_recall_at_k(spark, sf_dir)),
        ("funnel_analysis (per-step frontier aggregates, user_id-keyed)",
         lambda: parity.funnel_analysis(spark, sf_dir)),
        ("retention_cohorts (two map-side-combinable aggs over events)",
         lambda: parity.retention_cohorts(spark, sf_dir)),
        ("adjacency_matrix_facets (hit-sized self-join, never corpus^2)",
         lambda: fulltext.adjacency_matrix_facets(spark, sf_dir)),
        ("composite_agg_page (cursor filter + TakeOrdered page)",
         lambda: fulltext.composite_agg_page(spark, sf_dir)),
        ("filtered_ann_topk (label predicate pushed to the scan, pre-filter)",
         lambda: __import__(
             "lucene_mapreduce_spark.operators.similarity", fromlist=["x"]
         ).filtered_ann_topk(spark, sf_dir)),
        ("json_props_stats (typed from_json fused into the scan stage)",
         lambda: parity.json_props_stats(spark, sf_dir)),
        ("domain_quality_rollup (decimal-exact mean, one combinable groupBy)",
         lambda: __import__(
             "lucene_mapreduce_spark.operators.textstats", fromlist=["x"]
         ).domain_quality_rollup(spark, sf_dir)),
        ("hll_cardinality (BIGINT-scaled HLL register fold)",
         lambda: __import__(
             "lucene_mapreduce_spark.operators.textstats", fromlist=["x"]
         ).hll_cardinality(spark, sf_dir)),
        ("frequent_pairs_agg (Apriori hot-k prune before the doc self-join)",
         lambda: __import__(
             "lucene_mapreduce_spark.operators.textstats", fromlist=["x"]
         ).frequent_pairs_agg(spark, sf_dir)),
        ("tfidf_keywords (per-doc WindowGroupLimit keyword extraction)",
         lambda: __import__(
             "lucene_mapreduce_spark.operators.textstats", fromlist=["x"]
         ).tfidf_keywords(spark, sf_dir)),
        ("has_child_query (child-side groupBy, no parent shuffle)",
         lambda: parity.has_child_query(spark, sf_dir)),
        ("combined_fields_query (shared-norm multi-field BM25)",
         lambda: fulltext.combined_fields_query(spark, sf_dir)),
        ("packing_stats (per-source cumulative-offset window)",
         lambda: __import__(
             "lucene_mapreduce_spark.operators.textstats", fromlist=["x"]
         ).packing_stats(spark, sf_dir)),
        ("bpe_pair_counts (vocab-sized pair expand after word-type count)",
         lambda: __import__(
             "lucene_mapreduce_spark.operators.textstats", fromlist=["x"]
         ).bpe_pair_counts(spark, sf_dir)),
        ("asof_join (union-tag + running last-non-null window: ONE shuffle, "
         "no range-join blowup)",
         lambda: parity.asof_join(spark, sf_dir)),
        ("winnowing_dup_candidates (MOSS fingerprints: codegen k-gram/"
         "window-min arrays, md5-uniform groupBy)",
         lambda: dedup.winnowing_dup_candidates(spark, sf_dir)),
        ("bigram_logprob (order-2 LM: bigram model join + canonical fold)",
         lambda: __import__(
             "lucene_mapreduce_spark.operators.textstats", fromlist=["x"]
         ).bigram_logprob(spark, sf_dir)),
        ("cosine_rescore_topk (retrieve-then-rerank: depth-bounded "
         "broadcast rescore join, never a corpus vector scan)",
         lambda: __import__(
             "lucene_mapreduce_spark.operators.similarity", fromlist=["x"]
         ).cosine_rescore_topk(spark, sf_dir)),
        ("most_fields_topk (independent per-field BM25, one full-outer add)",
         lambda: fulltext.most_fields_topk(spark, sf_dir)),
        ("containment_pairs (directional dedup: capped shingle "
         "inverted-index self-join)",
         lambda: dedup.containment_pairs(spark, sf_dir)),
        ("kl_divergence_by_source (DECIMAL-summed contributions, "
         "no vocab-sized collect)",
         lambda: __import__(
             "lucene_mapreduce_spark.operators.textstats", fromlist=["x"]
         ).kl_divergence_by_source(spark, sf_dir)),
        ("index_posting_audit (full decode scan, broadcast vocab frame)",
         lambda: fulltext.index_posting_audit(spark, sf_dir)),
        ("session_event_pairs (gaps-and-islands baskets + bounded "
         "pair self-join)",
         lambda: parity.session_event_pairs(spark, sf_dir)),
        ("autocorrelation_daily (calendar-bounded lag self-join, "
         "integer sufficient stats)",
         lambda: parity.autocorrelation_daily(spark, sf_dir)),
        ("int8_quantization_audit (64-row dim stats broadcast + "
         "per-vector fold)",
         lambda: __import__(
             "lucene_mapreduce_spark.operators.similarity", fromlist=["x"]
         ).int8_quantization_audit(spark, sf_dir)),
    ]

    out = [HEADER]
    for title, fn in sections:
        plan = explain_str(fn())
        out.append(f"\n## {title}\n\n```\n{plan.strip()}\n```\n")
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "PLANS.md"), "w") as f:
        f.write("".join(out))
    print("PLANS.md written")


if __name__ == "__main__":
    main()
