"""Central query registry: merges every catalog module's QUERIES dict."""

from __future__ import annotations

import importlib

_CATALOG_MODULES = [
    "blazegraph_database_spark.queries_core",
    "blazegraph_database_spark.queries_gas",
    "blazegraph_database_spark.queries_pipeline",
    "blazegraph_database_spark.queries_search",
    "blazegraph_database_spark.queries_infer",
    "blazegraph_database_spark.queries_extra",
    "blazegraph_database_spark.queries_stream",
]

# Scored first under the driver's 50-query-per-round correctness budget.
# Backlog-first discipline: (a) the 6 queries with no driver row through r5
# (they led r6's window; kept at the head because no CORRECTNESS_r06 has
# appeared to confirm the r6 scoring ran), (b) the r3-stale tail that fell
# outside r6's 50-slot window, (c) round-6 additions never scored, (d) NEW
# round-7 names APPEND after the backlog, (e) r5-green queries stalest-
# green-first, (f) the r6-window re-scored block last.
_SCORE_FIRST = [
    # (a) never driver-scored through r5.
    "trig_roundtrip",
    "jsonld_roundtrip",
    "trix_roundtrip",
    "rdfxml_roundtrip",
    "stream_funnel",
    "text_interdoc_repetition",
    # (b) r3-stale tail outside r6's window.
    "update_graph_ops",
    "stream_window_agg",
    "stream_dedup",
    "stream_to_triples",
    "stream_interval_join",
    "stream_sessionize",
    # (c) round-6 additions, never scored.
    "fulltext_stemmed_search",
    "rdr_history_service",
    "typed_sum_semantics",
    "typed_open_eq",
    "inline_uri_ipv4_range",
    "url_canonical_dedup",
    "text_bigram_logprob",
    # (d) round-7 additions — append new names HERE (after the backlog).
    "text_paragraph_dedup",
    "dataset_dsir_resample",
    "quality_nb_classifier",
    "text_ccnet_buckets",
    "ann_matryoshka",
    "fulltext_bm25",
    "service_bd_values",
    "service_stored_query",
    "geo_nd_datatype",
    "stream_to_store",
    "geo_quantized_rect",
    "update_entailments",
    "dataset_interleave",
    "ann_matryoshka_rerank",
    "dedup_exact_best",
    # (e) green in CORRECTNESS_r05 (stalest confirmed green).
    "agg_distinct",
    "ann_radius",
    "custom_function",
    "dataset_domain_cap",
    "dataset_mix_temperature",
    "dataset_resample",
    "dataset_shuffle",
    "dataset_stratified_exact",
    "fast_count_by_pred",
    "fast_distinct_preds",
    "fast_range_count",
    "fulltext_search_in_search",
    "geo_knn",
    "graph_subquery_limit",
    "history_changelog",
    "jsonld_writer_roundtrip",
    "mvcc_snapshot_read",
    "ntriples_datetime_canon",
    "owl_property_chain",
    "path_bounded",
    "path_zero_or_one",
    "pipeline_curation",
    "pipeline_end_to_end",
    "rdfxml_writer_roundtrip",
    "rdr_reify_roundtrip",
    "rdr_scaffold_query",
    "rdr_sid_bind",
    "semdedup_prune",
    "service_alp",
    "service_bd_sample",
    "service_bd_slice",
    "service_label",
    "skew_salted_agg",
    "solution_set_include",
    "sparql_hash_functions",
    "sparql_inline_search",
    "sparql_tpch_q1",
    "sparql_tpch_q10",
    "sparql_tpch_q14",
    "sparql_tpch_q5",
    "stream_doc_pipeline",
    "stream_trending_terms",
    "text_decontaminate_fuzzy",
    "text_gopher_rules",
    "text_remove_dup_spans",
    "text_unigram_logprob",
    "trig_writer_roundtrip",
    "turtle_roundtrip",
    "turtle_writer_roundtrip",
    "virtual_graph_dataset",
    # (f) the r6-window block (scored in r6 if that round ran).
    "bgp_join_agg",
    "agg_suite",
    "optional_count",
    "union_filter",
    "filter_funcs",
    "minus_no_orders",
    "exists_bigqty",
    "values_inline",
    "topk_customers",
    "group_having",
    "subquery_avg_orders",
    "bind_datatype_funcs",
    "path_two_hop",
    "path_closure_ancestors",
    "path_negated",
    "graph_var_path",
    "sparql_text_join_agg",
    "sparql_text_filter_path",
    "sparql_query_hints",
    "sparql_named_subquery",
    "sparql_update_text",
    "dataset_from_named",
    "rdr_provenance",
    "dict_encoded_join",
    "gas_bfs_tree",
    "gas_sssp_tree",
    "gas_cc_bipartite",
    "gas_pagerank",
    "gas_paths",
    "gas_fuzzy_sssp",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "ann_ivf",
    "ann_ivf_kmeans",
    "multimodal_frames",
    "text_repetition",
    "text_decontaminate",
    "text_pii",
    "geo_zorder",
    "service_clause_text",
    "owl_rules_extended",
    "tm_delete_closure",
]


def all_queries() -> dict[str, dict]:
    merged: dict[str, dict] = {}
    for mod_name in _CATALOG_MODULES:
        mod = importlib.import_module(mod_name)
        for name, spec in mod.QUERIES.items():
            if name in merged:
                raise ValueError(f"duplicate query name: {name}")
            merged[name] = spec
    out = {n: merged[n] for n in _SCORE_FIRST if n in merged}
    out.update((n, s) for n, s in merged.items() if n not in out)
    return out
