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


# Scored first if the driver's correctness pass has a budget (round 1 cut off
# at 50/54). Entries with no CORRECTNESS row yet run first, cheapest first;
# everything else keeps catalog-module order.
_SCORE_FIRST = [
    # Round-4c additions, never driver-scored: need rows first.
    "gas_service_bfs",
    "geo_service_rect",
    "tm_tc_delete",
    "dedup_cluster_canonical",
    "multimodal_wav_decode",
    "exists_expr_filter",
    "ann_ivf_pq",
    "text_rare_trigrams",
    "gas_service_sssp_weighted",
    "sparql_tpch_q6",
    "dedup_incremental",
    # Never driver-green (erred or hash-mismatched in r1, fixed since, green
    # under scripts/check_correctness.py): need driver rows most urgently.
    "fulltext_search",
    "fulltext_all_prefix",
    "geo_rect",
    "geo_radius",
    "describe_customer",
    "service_bds_search",
    "multimodal_meta",
    # Remaining 18 queries with no round-3 row (driver-green in r1/r2, rotated
    # out of r3's 50-query window): re-verify before anything scored in r3.
    "ann_cosine_topk",
    "ann_lsh",
    "emb_near_dup",
    "text_tokens",
    "text_quality",
    "text_langid",
    "text_fingerprint",
    "multimodal_decode",
    "rdfs_closure_types",
    "rdfs_domain_range",
    "update_delete_insert",
    "construct_pred_counts",
    "ask_negative_balance",
    "group_concat_segments",
    "orderby_offset_page",
    "graph_scoped_count",
    "owl_inverse_orders",
    "owl_sameas_merge",
    # round-4 additions, never driver-scored
    "geo_rect_time",
    "geo_zorder3",
    "sparql_rto_hint",
    "dataset_split",
    "text_pack_sequences",
    "tm_insert_delta",
    "sparql_tpch_q3",
    "store_roundtrip",
    "ntriples_roundtrip",
    "geo_zorder_scan",
    "tm_counting_delete",
    "text_top_ngrams",
    "dataset_mix",
    "sparql_lang_functions",
    "pipeline_end_to_end",
    "turtle_roundtrip",
    "trig_roundtrip",
    "stream_funnel",
    "text_interdoc_repetition",
    "jsonld_roundtrip",
    "trix_roundtrip",
    "rdfxml_roundtrip",
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
