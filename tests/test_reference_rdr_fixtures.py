"""The reference's OWN Reification-Done-Right eval fixtures, run in place
(bigdata-rdf-test .../eval/reif/TestReificationDoneRightEval.java): each
(query, data, expected) triple exactly as the Java test wires it — the
Turtle-star (.ttlx) loads use the reader's RDR path; the expanded-
reification (.ttl) loads go through operators/reification.unreify (the
analog of the reference's RDR-mode StatementBuffer folding reification
scaffolds into sids), and expanded-vocabulary QUERIES over sid stores take
the compiler's scaffold rewrite (_rewrite_reif_scaffold)."""

from __future__ import annotations

import os
import re

import pytest

from blazegraph_database_spark.model.store import TripleStore
from blazegraph_database_spark.operators import reification
from blazegraph_database_spark.plans.sparql_parser import run_sparql
from blazegraph_database_spark.sources import rdf_formats

FIXDIR = (
    "/root/reference/bigdata-rdf-test/src/test/java/com/bigdata/rdf/"
    "sparql/ast/eval/reif"
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIXDIR), reason="reference fixture dir not present"
)

# (query, data, expected) exactly as TestReificationDoneRightEval wires them
# (the rdr-00* INSERT-DATA variants need the Java test's update step; the
# data-file variants below cover the same queries)
CASES = [
    ("rdr-01", "rdr-01.ttl", "rdr-01"),
    ("rdr-01", "rdr-01.ttlx", "rdr-01"),
    ("rdr-01a", "rdr-01.ttl", "rdr-01a"),
    ("rdr-01a", "rdr-01.ttlx", "rdr-01a"),
    ("rdr-02", "rdr-02.ttl", "rdr-02"),
    ("rdr-02", "rdr-02.ttlx", "rdr-02"),
    ("rdr-02a", "rdr-02a.ttl", "rdr-02a"),
    ("rdr-02a", "rdr-02a.ttlx", "rdr-02a"),
    ("rdr-02a", "rdr-02.ttlx", "rdr-02a"),
    ("rdr-03", "rdr-03.ttl", "rdr-03"),
    ("rdr-03a", "rdr-03a.ttl", "rdr-03a"),
    ("rdr-04", "rdr-04.ttlx", "rdr-04"),
    ("rdr-05a", "rdr-05.ttl", "rdr-05"),
    ("rdr-05b", "rdr-05.ttl", "rdr-05"),
]


def _parse_srx(xml: str) -> list[dict]:
    out = []
    for block in re.findall(r"<result>(.*?)</result>", xml, re.S):
        row = {}
        for name, val in re.findall(
            r"<binding name=['\"](\w+)['\"]>\s*<(?:uri|literal[^>]*|bnode)>([^<]*)<",
            block,
        ):
            row[name] = val
        out.append(row)
    return out


@pytest.mark.parametrize("qname,datafile,expname", CASES)
def test_rdr_fixture(spark, qname, datafile, expname):
    query = open(os.path.join(FIXDIR, qname + ".rq")).read()
    expected = _parse_srx(open(os.path.join(FIXDIR, expname + ".srx")).read())
    df = rdf_formats.read_turtle(spark, os.path.join(FIXDIR, datafile))
    if datafile.endswith(".ttl"):
        # expanded reification folds into sids — the reference's RDR-mode
        # load does the same conversion (SidIV statement identifiers)
        df = reification.unreify(df)
    st = TripleStore(df)
    got_df = run_sparql(st, query)
    varnames = [c for c in got_df.columns if not c.endswith("__dt")]
    from blazegraph_database_spark.sources.ntriples import canonical_datetime_lex

    # the reference's OWN fixtures are inconsistent about dateTime millis
    # ("2011-04-05T12:00:00Z" here, ".000Z" in materialization-extensions) —
    # compare both sides in the engine's canonical millisecond-UTC-Z form
    got = [
        tuple(sorted((v, canonical_datetime_lex(r[v])) for v in varnames if r[v] is not None))
        for r in got_df.collect()
    ]
    exp = [
        tuple(sorted((k, canonical_datetime_lex(v)) for k, v in row.items()))
        for row in expected
    ]
    assert sorted(got) == sorted(exp), (qname, datafile, sorted(got)[:5], sorted(exp)[:5])


RTODIR = FIXDIR.rsplit("/reif", 1)[0] + "/rto"
BARDATA = (
    "/root/reference/bigdata-rdf-test/src/test/resources/data/barData/"
    "barData.trig.gz"
)


@pytest.mark.skipif(not os.path.exists(BARDATA), reason="barData not present")
def test_rto_bar_q1(spark):
    """The reference's RTO eval fixture BAR-Q1 (TestRTO_BAR.java): a
    6-pattern join over the 2MB bar dataset with the Runtime optimizer
    engaged through query hints (hint:Group hint:optimizer "Runtime",
    RTO-sampleType/limit/nedges) — COUNT(*) must equal the pinned 8039.
    (The BSBM RTO fixtures need dataset_pc100.nt, absent from the
    checkout.)"""
    q = open(os.path.join(RTODIR, "BAR-Q1.rq")).read()
    exp = re.findall(
        r"<literal[^>]*>([^<]*)<", open(os.path.join(RTODIR, "BAR-Q1.srx")).read()
    )
    st = TripleStore(rdf_formats.read_trig(spark, BARDATA))
    got = run_sparql(st, q).collect()
    assert [str(got[0]["count"])] == exp


LUBMDATA = (
    "/root/reference/bigdata-rdf-test/src/test/resources/data/lehigh/"
    "LUBM-U1.rdf.gz"
)


@pytest.mark.skipif(not os.path.exists(LUBMDATA), reason="LUBM data not present")
def test_rto_lubm_queries(spark):
    """The reference's RTO LUBM fixtures (TestRTO_LUBM.java: LUBM-Q2/Q8/Q9
    over the bundled 145k-triple LUBM-U1 dataset, gzipped RDF/XML) — the
    RDF/XML reader ingests the real dataset and each query's solution
    multiset matches the bundled .srx exactly. (BSBM RTO fixtures need
    dataset_pc100.nt, absent from the checkout; FOAF queries are inline
    Java, no .rq.)"""
    from blazegraph_database_spark.operators.service import parse_srx

    st = TripleStore(rdf_formats.read_rdfxml(spark, LUBMDATA).cache())

    def norm(rows, varnames):
        out = []
        for r in rows:
            get = r.get if isinstance(r, dict) else (lambda v, _r=r: _r[v])
            cells = [get(v) for v in varnames]
            out.append("|".join("" if c is None else str(c) for c in cells))
        return sorted(out)

    for q in ("LUBM-Q2", "LUBM-Q8", "LUBM-Q9"):
        text = open(os.path.join(RTODIR, f"{q}.rq")).read()
        exp = parse_srx(open(os.path.join(RTODIR, f"{q}.srx")).read())
        got_df = run_sparql(st, text)
        varnames = [c for c in got_df.columns if not c.endswith("__dt")]
        got = [{v: r[v] for v in varnames} for r in got_df.collect()]
        assert norm(got, varnames) == norm(exp, varnames), q
