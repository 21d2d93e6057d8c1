"""SERVICE federation (SURVEY.md §2.3).

Reference analog: the ServiceRegistry / ServiceCall machinery
(bigdata-core/bigdata-rdf/.../sparql/ast/service/ServiceRegistry.java,
RemoteServiceCallImpl.java) that dispatches SERVICE <iri> { ... } groups to
internal services (bds:search, geo:search) or remote SPARQL endpoints.

Spark-first: a service is a callable (spark, params) -> DataFrame of
bindings; the registry maps service IRIs to callables. The two built-in
services wrap this engine's full-text and geospatial operators — the same
internal services the reference ships. Remote endpoints speak the SPARQL
1.1 Protocol over HTTP: ``http_transport`` POSTs the serialized query as a
form body and parses application/sparql-results+json responses
(``parse_srj``); bindings are pushed down as chunked VALUES blocks — the
reference's vectored remote SERVICE evaluation. The transport is
injectable, so the protocol layer is conformance-tested against this
repo's own localhost REST endpoint and against stored protocol fixtures
without needing outside network access.
"""

from __future__ import annotations

import json
from collections.abc import Callable
from urllib.parse import urlencode

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


# ------------------------------------------------- SPARQL 1.1 protocol HTTP --
def build_http_request(endpoint: str, query: str) -> tuple[str, dict, bytes]:
    """(url, headers, body) for a SPARQL 1.1 Protocol query-via-POST:
    form-urlencoded ``query=`` body, SRJ accept header (ref:
    RemoteServiceCallImpl.java:51, which issues the same POST through the
    openrdf SPARQLRepository client)."""
    headers = {
        "Content-Type": "application/x-www-form-urlencoded",
        "Accept": "application/sparql-results+json",
    }
    return endpoint, headers, urlencode({"query": query}).encode()


def parse_srj(payload: bytes | str) -> list[dict]:
    """SPARQL JSON results document → list of {var: lexical} rows. Unbound
    vars are absent from a binding (per spec) and come back as None when the
    rows are reassembled into a DataFrame. Term type/lang/datatype collapse
    to the lexical form — remote bindings join on lexical equality, same as
    the engine's own value columns."""
    doc = json.loads(payload if isinstance(payload, str) else payload.decode())
    out_vars = doc.get("head", {}).get("vars", [])
    rows = []
    for b in doc.get("results", {}).get("bindings", []):
        rows.append({v: b[v]["value"] for v in (out_vars or b.keys()) if v in b})
    return rows


def http_transport(timeout: float = 30.0) -> Transport:
    """Transport that really speaks SPARQL-protocol HTTP (stdlib urllib).
    Works against any reachable endpoint — exercised in tests against this
    repo's own localhost REST server, the only endpoint reachable from the
    build container."""

    def send(endpoint: str, query: str) -> list:
        import urllib.request

        url, headers, body = build_http_request(endpoint, query)
        req = urllib.request.Request(url, data=body, headers=headers, method="POST")
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return parse_srj(resp.read())

    return send


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

    ``transport=None`` defaults to :func:`http_transport` — a real SPARQL
    1.1 Protocol POST (query form body, SRJ response). Tests exercise it
    against this repo's own localhost REST endpoint; a local-store
    transport remains injectable for endpoint-free unit runs.
    """

    def call(spark: SparkSession, params: dict) -> DataFrame:
        nonlocal transport
        if transport is None:
            transport = http_transport()
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
