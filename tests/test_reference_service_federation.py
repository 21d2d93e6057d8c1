"""The W3C SPARQL 1.1 Federation suite the reference bundles
(bigdata-sails-test .../webapp/openrdf-service/manifest.ttl) — run END TO
END over real HTTP: each manifest serviceData dataset is served by THIS
engine's own REST endpoint (server/rest.SparqlEndpoint), and the query's
`http://localhost:18080/openrdf/repositories/endpointN` IRIs are
registered as SPARQL-protocol remotes against those live servers. The
federation path exercised is the real one — form-POST query, content-type
negotiated response parse, vectored VALUES pushdown."""

from __future__ import annotations

import os
import re

import pytest

from blazegraph_database_spark.model.store import TripleStore
from blazegraph_database_spark.operators import service
from blazegraph_database_spark.plans.sparql_parser import run_sparql
from blazegraph_database_spark.server import SparqlEndpoint, start_background
from blazegraph_database_spark.sources import rdf_formats
from blazegraph_database_spark.update.update import UpdatableStore

SDIR = (
    "/root/reference/bigdata-sails-test/src/test/java/com/bigdata/rdf/"
    "sail/webapp/openrdf-service"
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SDIR), reason="reference fixture dir not present"
)


def _manifest_cases():
    if not os.path.isdir(SDIR):
        return []
    src = open(os.path.join(SDIR, "manifest.ttl")).read()
    out = []
    for m in re.finditer(
        r":service\d+ rdf:type mf:QueryEvaluationTest(.*?)mf:result\s+<([^>]+)>",
        src,
        re.S,
    ):
        block, result = m.group(1), m.group(2)
        query = re.search(r"qt:query\s+<([^>]+)>", block).group(1)
        data = re.search(r"qt:data\s+<([^>]+)>\s*;?\s*\n(?!\s*\])", block)
        local = None
        dm = re.search(r"qt:query\s+<[^>]+>\s*;\s*qt:data\s+<([^>]+)>", block)
        if dm:
            local = dm.group(1)
        endpoints = re.findall(
            r"qt:serviceData\s*\[\s*qt:endpoint\s+<[^>]+>\s*;\s*qt:data\s+<([^>]+)>",
            block,
        )
        out.append((query, local, endpoints, result))
    return out


def _parse_srx(xml: str) -> list[dict]:
    rows = []
    for block in re.findall(r"<result>(.*?)</result>", xml, re.S):
        row = {}
        for name, val in re.findall(
            r"<binding name=['\"](\w+)['\"]>\s*<(?:uri|literal[^>]*|bnode)>([^<]*)<",
            block,
        ):
            row[name] = val
        rows.append(row)
    return rows


# TestFederatedQuery.java's extended wirings beyond the manifest's seven
# (query, localData, [endpointData...], expected) — the commented-out
# test12 (live dbpedia) and the nondeterministic-LIMIT bg876 pair are
# omitted.
_EXTRA = [
    ("service08.rq", "data08.ttl", ["data08endpoint.ttl"], "service08.srx"),
    ("service09.rq", None, ["data09endpoint.ttl"], "service09.srx"),
    ("service10.rq", "data10.ttl", ["data10endpoint.ttl"], "service10.srx"),
    ("service10b.rq", "data10.ttl", ["data10endpoint.ttl"], "service10.srx"),
    ("service11.rq", "data11.ttl", ["data11endpoint.ttl"], "service11.srx"),
    ("service13b.rq", None, ["data13.ttl"], "service13.srx"),
    ("service14.rq", None, ["data13.ttl"], "service14.srx"),
]


@pytest.mark.parametrize(
    "query,local,endpoints,result", _manifest_cases() + _EXTRA
)
def test_federation(spark, query, local, endpoints, result):
    servers = []
    try:
        for i, datafile in enumerate(endpoints, start=1):
            df = rdf_formats.read_turtle(spark, os.path.join(SDIR, datafile))
            ep = SparqlEndpoint(spark, UpdatableStore.from_store(TripleStore(df)))
            srv, port = start_background(ep)
            servers.append(srv)
            service.register_service(
                f"http://localhost:18080/openrdf/repositories/endpoint{i}",
                service.remote_sparql_service(f"http://127.0.0.1:{port}/sparql"),
            )
        if local:
            st = TripleStore(rdf_formats.read_turtle(spark, os.path.join(SDIR, local)))
        else:
            st = TripleStore(
                spark.createDataFrame(
                    [], "s string, p string, o_lex string, o_dt string"
                )
            )
        got_df = run_sparql(st, open(os.path.join(SDIR, query)).read())
        varnames = [c for c in got_df.columns if not c.endswith("__dt")]
        got = sorted(
            tuple(sorted((v, r[v]) for v in varnames if r[v] is not None))
            for r in got_df.collect()
        )
        expected = _parse_srx(open(os.path.join(SDIR, result)).read())
        exp = sorted(tuple(sorted(row.items())) for row in expected)
        assert got == exp, (query, got[:6], exp[:6])
    finally:
        for srv in servers:
            srv.shutdown()
        for i in range(1, len(endpoints) + 1):
            service._REGISTRY.pop(
                f"http://localhost:18080/openrdf/repositories/endpoint{i}", None
            )
