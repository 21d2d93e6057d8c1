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


def all_queries() -> dict[str, dict]:
    out: dict[str, dict] = {}
    for mod_name in _CATALOG_MODULES:
        mod = importlib.import_module(mod_name)
        for name, spec in mod.QUERIES.items():
            if name in out:
                raise ValueError(f"duplicate query name: {name}")
            out[name] = spec
    return out
