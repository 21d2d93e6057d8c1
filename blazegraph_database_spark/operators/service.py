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


Transport = Callable[[str, str], list]  # (endpoint, sparql_text) -> rows as dicts


def _serialize_values(columns: list[str], rows: list) -> str:
    """VALUES block for binding pushdown (vectored SERVICE join)."""
    head = " ".join(f"?{c}" for c in columns)
    body = " ".join(
        "(" + " ".join(
            "UNDEF" if row[c] is None else f'"{str(row[c]).replace(chr(34), chr(92) + chr(34))}"'
            for c in columns
        ) + ")"
        for row in rows
    )
    return f"VALUES ({head}) {{ {body} }}"


def remote_sparql_service(endpoint: str, transport: Transport | None = None) -> ServiceFn:
    """Remote SPARQL endpoint service with an injectable transport.

    Evaluation strategy (ref: the vectored ServiceCallJoin behind
    ServiceRegistry.java): incoming bindings are chunked, each chunk is
    serialized as a VALUES block spliced into the query's ``{values}`` hole,
    the text is sent through ``transport(endpoint, text)``, and the returned
    rows (list of var→value dicts) are reassembled into one bindings
    DataFrame. Chunking bounds both request size and remote work per call —
    the same reason the reference vectorizes.

    ``transport=None`` (the default) raises at the exact point an HTTP POST
    with application/sparql-results+json would happen — this container has
    no network. Tests inject a local-store transport to exercise the whole
    vectored join path.
    """

    def call(spark: SparkSession, params: dict) -> DataFrame:
        if transport is None:
            raise NotImplementedError(
                f"remote SERVICE <{endpoint}>: no network access in this "
                "environment; inject a transport to evaluate"
            )
        query: str = params["query"]
        bindings: DataFrame | None = params.get("bindings")
        chunk = int(params.get("chunk_size", 512))
        all_rows: list = []
        if bindings is None:
            all_rows = list(transport(endpoint, query.replace("{values}", "")))
        else:
            cols = bindings.columns
            pushed = [r.asDict() for r in bindings.collect()]  # driver-vectored,
            # bounded by the SERVICE call's own binding set (ref does the same)
            for i in range(0, len(pushed), chunk):
                block = _serialize_values(cols, pushed[i : i + chunk])
                all_rows.extend(transport(endpoint, query.replace("{values}", block)))
        if not all_rows:
            return spark.createDataFrame([], "s string")
        out_cols: list[str] = []
        for r in all_rows:  # first-seen order: keeps the remote SELECT order
            for k in r:
                if k not in out_cols:
                    out_cols.append(k)
        data = [tuple(r.get(c) for c in out_cols) for r in all_rows]
        return spark.createDataFrame(
            data, ", ".join(f"{c} string" for c in out_cols)
        )

    return call


register_service("bds:search", _bds_search)
register_service("geo:search", _geo_search)
