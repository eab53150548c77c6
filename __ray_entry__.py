"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline (index build + BM25 query batch over
sf0.001), ``queries()`` exposes one callable per implemented operator from
SURVEY.md §2, and ``oracle_sql()`` the DuckDB-equivalent SQL for each
(omitted only for genuinely non-SQL-expressible ops, which get the weaker
rows-only check).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship: build the inverted index over sf0.001 documents, run the
    reference query set (float32 Lucene-exact mode), return the top-k."""
    from lucene_solr_ray.pipelines import fulltext

    idx = fulltext.documents_index("/root/testdata/sf0.001")
    return idx.search({qid: qs for qid, qs, _, _ in fulltext.QUERY_SET}, k=10)


# Gate ordering: the driver evaluates the FIRST 50 entries of queries()
# each round.  Gates never (or least recently) driver-verified go first;
# long-stable round-2-green gates rotate behind the window (their code is
# unchanged and stays covered by pytest).  Keep this list in sync when
# adding gates: new gates belong near the front.
_PRIORITY: list[str] = [
    # -- new round-5 gates (never driver-verified) ------------------------
    "synonym_graph_docs", "html_highlight_docs", "atomic_update_docs",
    "elevation_docs", "sql_two_joins", "sql_distinct",
    "stream_expr_plumbing", "sql_in_subquery", "stream_expr_reduce",
    "path_hierarchy_docs", "sql_like_between", "sql_count_distinct",
    "simple_query_hits", "word_break_docs", "complex_phrase_docs",
    "blended_infix_docs",
    # -- flagship core (always in the window) -----------------------------
    "bm25_topk", "term_stats", "doc_norms", "phrase_topk",
    # -- new round-4 gates (never driver-verified) ------------------------
    "common_terms_docs", "intervals_docs", "taxonomy_facet_docs",
    "drill_sideways_docs", "sql_select_limit", "sql_join_orders",
    "suggest_fuzzy", "suggest_analyzing", "indexsort_multi_topk",
    "unified_highlight_docs", "soft_delete_then_search",
    "math_tests_lineitem", "ngram_jaccard_docs", "sql_expr_lineitem",
    "temporal_events", "stream_expr_rollup",
    # -- round-4-changed paths (re-verify after the rework) ---------------
    "sql_orders", "span_near_docs", "free_text_suggest_merge",
    "suggest_infix_er", "suggest_prefix_s", "innerjoin_revenue",
    "hashjoin_orders_customer", "token_count_docs", "quality_docs",
    "features_selection_docs", "significant_terms_en",
    "delete_then_search", "dv_update_then_sort", "realtime_get_docs",
    "expr_sort_orders", "ltr_rerank_docs", "math_stats_lineitem",
    # -- stalest greens (last driver-verified r1/r2) rotate back in -------
    "fetch_topk", "multifield_topk", "terms_enum_docs", "mlt_doc0",
    "textprofile_dedup", "knn_classify_docs", "field_wildcard_docs",
    "grouped_topk", "hit_counts", "stats_orders", "timeseries_events",
    "session_windows", "joinutil_docs", "random_sample_docs",
    "topic_pull_docs", "percolate_docs", "highlight_merge",
    "spell_corrections", "term_vectors_docs", "export_sorted_docs",
    "geo_distance_docs",
    # ---- 50-slot window boundary (everything below is behind it) --------
    # r3-verified stable greens
    "evaluator_exprs", "pivot_priority_segment", "collapse_orders",
    "gather_nodes_orders", "interval_facet_orders",
    "grouped_percentiles_orders", "winnow_docs", "dedup_exact",
    "fingerprint_docs", "ann_cosine_topk", "langid_docs",
    "sliding_windows", "urp_clean_parts", "distinct_quantiles",
    "eval_props", "facet_price_ranges", "json_facet_brands",
    "geo_polygon_docs", "nb_classify_docs", "ltr_trees_docs",
    "indexsort_topk", "payload_score_docs", "score_nodes_parts",
    "classify_stream_docs", "sortfield_topk", "numeric_range_topk",
    "block_join_parents", "rollup_lineitem",
    # rows-only gates (can never turn green; pytest-covered)
    "ann_ivf_topk", "text_logit_docs", "minhash_pairs", "simhash_pairs",
    "embedding_neardups", "ann_lsh_topk", "hll_partkeys",
]


def _ordered(out: dict) -> dict:
    """Priority entries first (those present), remainder in original order."""
    head = {k: out[k] for k in _PRIORITY if k in out}
    head.update({k: v for k, v in out.items() if k not in head})
    return head


def queries() -> dict[str, Callable[[str], Any]]:
    from lucene_solr_ray.pipelines import fulltext, relational, training

    out = {
        # -- core engine: index build + BM25 search path ------------------
        "bm25_topk": fulltext.bm25_topk,
        "term_stats": fulltext.term_stats,
        "doc_norms": fulltext.doc_norms,
        "phrase_topk": fulltext.phrase_topk,
        "phrase_sloppy_topk": fulltext.phrase_sloppy_topk,  # rows-only
        "fetch_topk": fulltext.fetch_topk,
        "suggest_prefix_s": fulltext.suggest_prefix_s,
        "suggest_infix_er": fulltext.suggest_infix_er,
        "suggest_fuzzy": fulltext.suggest_fuzzy,
        "suggest_analyzing": fulltext.suggest_analyzing,
        "free_text_suggest_merge": fulltext.free_text_suggest_merge,
        "terms_enum_docs": fulltext.terms_enum_docs,
        "realtime_get_docs": fulltext.realtime_get_docs,
        "mlt_doc0": fulltext.mlt_doc0,
        "grouped_topk": fulltext.grouped_topk,
        "textprofile_dedup": fulltext.textprofile_dedup,
        "knn_classify_docs": fulltext.knn_classify_docs,
        "sortfield_topk": fulltext.sortfield_topk,
        "hit_counts": fulltext.hit_counts,
        "simple_query_hits": fulltext.simple_query_hits,
        "word_break_docs": fulltext.word_break_docs,
        "complex_phrase_docs": fulltext.complex_phrase_docs,
        "blended_infix_docs": fulltext.blended_infix_docs,
        "multifield_topk": fulltext.multifield_topk,
        "field_wildcard_docs": fulltext.field_wildcard_docs,
        "synonym_graph_docs": fulltext.synonym_graph_docs,
        "html_highlight_docs": fulltext.html_highlight_docs,
        "atomic_update_docs": fulltext.atomic_update_docs,
        "elevation_docs": fulltext.elevation_docs,
        "delete_then_search": fulltext.delete_then_search,
        "soft_delete_then_search": fulltext.soft_delete_then_search,
        "numeric_range_topk": fulltext.numeric_range_topk,
        "stemmed_search_topk": fulltext.stemmed_search_topk,  # rows-only
        "span_near_docs": fulltext.span_near_docs,
        "intervals_docs": fulltext.intervals_docs,
        "common_terms_docs": fulltext.common_terms_docs,
        "block_join_parents": fulltext.block_join_parents,
        "joinutil_docs": fulltext.joinutil_docs,
        "image_decode_stats": fulltext.image_decode_stats,  # rows-only
        "random_sample_docs": fulltext.random_sample_docs,
        "topic_pull_docs": fulltext.topic_pull_docs,
        "percolate_docs": fulltext.percolate_docs,
        "highlight_merge": fulltext.highlight_merge,
        "unified_highlight_docs": fulltext.unified_highlight_docs,
        "spell_corrections": fulltext.spell_corrections,
        "term_vectors_docs": fulltext.term_vectors_docs,
        "export_sorted_docs": fulltext.export_sorted_docs,
        "geo_distance_docs": fulltext.geo_distance_docs,
        "geo_polygon_docs": fulltext.geo_polygon_docs,
        "ltr_rerank_docs": fulltext.ltr_rerank_docs,
        "ltr_trees_docs": fulltext.ltr_trees_docs,
        "dv_update_then_sort": fulltext.dv_update_then_sort,
        "indexsort_topk": fulltext.indexsort_topk,
        "indexsort_multi_topk": fulltext.indexsort_multi_topk,
        "payload_score_docs": fulltext.payload_score_docs,
    }
    # -- Solr streaming-expression algebra (SURVEY §2.9) ------------------
    out.update(relational.QUERIES)
    # -- training-data ops: dedup / text analysis / ANN -------------------
    out.update(training.QUERIES)
    return _ordered(out)


def oracle_sql() -> dict[str, str]:
    from lucene_solr_ray.pipelines import fulltext

    from lucene_solr_ray.pipelines import relational, training

    out = {
        "bm25_topk": fulltext.bm25_topk_sql(),
        "term_stats": fulltext.term_stats_sql(),
        "doc_norms": fulltext.doc_norms_sql(),
        "fetch_topk": fulltext.fetch_topk_sql(),
        "suggest_prefix_s": fulltext.suggest_prefix_s_sql(),
        "suggest_infix_er": fulltext.suggest_infix_er_sql(),
        "suggest_fuzzy": fulltext.suggest_fuzzy_sql(),
        "suggest_analyzing": fulltext.suggest_analyzing_sql(),
        "free_text_suggest_merge": fulltext.free_text_suggest_merge_sql(),
        "terms_enum_docs": fulltext.terms_enum_docs_sql(),
        "realtime_get_docs": fulltext.realtime_get_docs_sql(),
        "grouped_topk": fulltext.grouped_topk_sql(),
        "sortfield_topk": fulltext.sortfield_topk_sql(),
        "hit_counts": fulltext.hit_counts_sql(),
        "simple_query_hits": fulltext.simple_query_hits_sql(),
        "word_break_docs": fulltext.word_break_docs_sql(),
        "complex_phrase_docs": fulltext.complex_phrase_docs_sql(),
        "blended_infix_docs": fulltext.blended_infix_docs_sql(),
        "multifield_topk": fulltext.multifield_topk_sql(),
        "field_wildcard_docs": fulltext.field_wildcard_docs_sql(),
        "synonym_graph_docs": fulltext.synonym_graph_docs_sql(),
        "html_highlight_docs": fulltext.html_highlight_docs_sql(),
        "atomic_update_docs": fulltext.atomic_update_docs_sql(),
        "elevation_docs": fulltext.elevation_docs_sql(),
        "delete_then_search": fulltext.delete_then_search_sql(),
        "soft_delete_then_search": fulltext.soft_delete_then_search_sql(),
        "numeric_range_topk": fulltext.numeric_range_topk_sql(),
        "phrase_topk": fulltext.phrase_topk_sql(),
        "random_sample_docs": fulltext.random_sample_docs_sql(),
        "block_join_parents": fulltext.block_join_parents_sql(),
        "joinutil_docs": fulltext.joinutil_docs_sql(),
        "mlt_doc0": fulltext.mlt_doc0_sql(),
        "textprofile_dedup": fulltext.textprofile_dedup_sql(),
        "knn_classify_docs": fulltext.knn_classify_docs_sql(),
        "topic_pull_docs": fulltext.topic_pull_docs_sql(),
        "percolate_docs": fulltext.percolate_docs_sql(),
        "highlight_merge": fulltext.highlight_merge_sql(),
        "unified_highlight_docs": fulltext.unified_highlight_docs_sql(),
        "spell_corrections": fulltext.spell_corrections_sql(),
        "term_vectors_docs": fulltext.term_vectors_docs_sql(),
        "export_sorted_docs": fulltext.export_sorted_docs_sql(),
        "geo_distance_docs": fulltext.geo_distance_docs_sql(),
        "geo_polygon_docs": fulltext.geo_polygon_docs_sql(),
        "ltr_rerank_docs": fulltext.ltr_rerank_docs_sql(),
        "ltr_trees_docs": fulltext.ltr_trees_docs_sql(),
        "dv_update_then_sort": fulltext.dv_update_then_sort_sql(),
        "indexsort_topk": fulltext.indexsort_topk_sql(),
        "indexsort_multi_topk": fulltext.indexsort_multi_topk_sql(),
        "payload_score_docs": fulltext.payload_score_docs_sql(),
        "span_near_docs": fulltext.span_near_docs_sql(),
        "intervals_docs": fulltext.intervals_docs_sql(),
        "common_terms_docs": fulltext.common_terms_docs_sql(),
    }
    out.update(relational.ORACLES)
    out.update(training.ORACLES)
    return _ordered(out)
