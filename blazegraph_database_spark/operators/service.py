"""SERVICE federation (SURVEY.md §2.3, partial by design).

Reference analog: the ServiceRegistry / ServiceCall machinery
(bigdata-core/bigdata-rdf/.../sparql/ast/service/ServiceRegistry.java) that
dispatches SERVICE <iri> { ... } groups to internal services (bds:search,
geo:search) or remote SPARQL endpoints.

Spark-first: a service is a callable (spark, params) -> DataFrame of
bindings; the registry maps service IRIs to callables. The two built-in
services wrap this engine's full-text and geospatial operators — the same
internal services the reference ships. Remote HTTP endpoints are stubbed
(no network in this environment): `RemoteSparqlService` raises
NotImplementedError at the exact call point an HTTP POST of the serialized
query would happen, and documents the join-strategy the real implementation
would use (bindings pushed as VALUES, like the reference's vectored
remote SERVICE evaluation).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

ServiceFn = Callable[[SparkSession, dict], DataFrame]

_REGISTRY: dict[str, ServiceFn] = {}


def register_service(iri: str, fn: ServiceFn) -> None:
    _REGISTRY[iri] = fn


def lookup(iri: str) -> ServiceFn:
    if iri not in _REGISTRY:
        raise KeyError(f"no service registered for <{iri}>")
    return _REGISTRY[iri]


def call_service(spark: SparkSession, iri: str, params: dict) -> DataFrame:
    """Evaluate SERVICE <iri> with keyword params → bindings DataFrame."""
    return lookup(iri)(spark, params)


# ------------------------------------------------------- built-in services --
def _bds_search(spark: SparkSession, params: dict) -> DataFrame:
    """bds:search analog: params = {index | df+id_col+text_col, query,
    match_all?, min_relevance_ppm?, max_rank?}."""
    from blazegraph_database_spark.operators import fulltext

    idx = params.get("index")
    if idx is None:
        idx = fulltext.inverted_index(
            params["df"], params.get("id_col", "doc_id"), params.get("text_col", "text")
        )
    patterns = [(t, t.endswith("*")) for t in params["query"].split()]
    patterns = [(t.rstrip("*"), pre) for t, pre in patterns]
    return fulltext.search(
        idx,
        patterns,
        match_all=params.get("match_all", False),
        min_relevance_ppm=params.get("min_relevance_ppm", 0),
        max_rank=params.get("max_rank", 20),
    )


def _geo_search(spark: SparkSession, params: dict) -> DataFrame:
    """geo:search analog: params = {df, shape: rect|circle, bounds...}."""
    from blazegraph_database_spark.operators import geospatial

    df = params["df"]
    if params.get("shape", "rect") == "rect":
        return geospatial.in_rectangle(
            df, params["lat0"], params["lat1"], params["lon0"], params["lon1"]
        )
    return geospatial.in_circle(df, params["lat"], params["lon"], params["radius_km"])


def remote_sparql_service(endpoint: str) -> ServiceFn:
    """Remote SPARQL endpoint service — STUB (no network in container).

    The real implementation would: serialize the inner group as a SELECT,
    push the incoming bindings as a VALUES block (vectored, like the
    reference's ServiceCallJoin), POST to `endpoint` with
    application/sparql-results+json, and parse rows back into a DataFrame
    partitioned by the driver's binding chunks.
    """

    def call(spark: SparkSession, params: dict) -> DataFrame:
        raise NotImplementedError(
            f"remote SERVICE <{endpoint}>: no network access in this "
            "environment; see docstring for the evaluation strategy"
        )

    return call


register_service("bds:search", _bds_search)
register_service("geo:search", _geo_search)
