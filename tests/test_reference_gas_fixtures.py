"""The reference's OWN GAS-module fixtures (bigdata-gas/src/test):
smallGraph.ttl with the exact depths/predecessors/distances/component
shapes its TestBFS/TestSSSP/TestCC hard-code, plus the weighted-SSSP
problem its _testSSSP2 documents but never finished (ssspGraph.ttlx +
the comment's weight matrix — completed here through the engine's RDR
link-weight path, expected distances from the reference's own
comment block: v1=0, v2=1, v3=1, v4=1.5, v5=1.75)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from blazegraph_database_spark.operators import gas
from blazegraph_database_spark.sources import rdf_formats

GASDIR = "/root/reference/bigdata-gas/src/test/resources/com/bigdata/rdf/graph/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(GASDIR), reason="reference fixture dir not present"
)

BD = "http://www.bigdata.com/"
FOAF_PERSON = "http://xmlns.com/foaf/0.1/Person"


@pytest.fixture(scope="module")
def small_edges(spark):
    # the reference's graph model: every statement whose object is a URI
    # is a link (literals are attributes, not vertices)
    df = rdf_formats.read_turtle(spark, os.path.join(GASDIR, "smallGraph.ttl"))
    return df.filter(F.col("o_dt") == "iri").select(
        F.col("s").alias("src"), F.col("o_lex").alias("dst")
    )


def test_bfs_small_graph(spark, small_edges):
    """TestBFS.java:73-85: from Mike — Mike depth 0 (no predecessor),
    foaf:Person depth 1 via Mike, Bryan depth 1 via Mike, Martyn depth 2
    via Bryan."""
    out = {r["node"]: r for r in gas.bfs(small_edges, [BD + "Mike"]).collect()}
    assert out[BD + "Mike"]["depth"] == 0 and out[BD + "Mike"]["pred"] is None
    assert out[FOAF_PERSON]["depth"] == 1 and out[FOAF_PERSON]["pred"] == BD + "Mike"
    assert out[BD + "Bryan"]["depth"] == 1 and out[BD + "Bryan"]["pred"] == BD + "Mike"
    assert out[BD + "Martyn"]["depth"] == 2 and out[BD + "Martyn"]["pred"] == BD + "Bryan"
    assert len(out) == 4  # DC is unreachable (label-only vertex)


def test_sssp_small_graph(spark, small_edges):
    """TestSSSP.java:73-79: unweighted distances from Mike."""
    e = small_edges.withColumn("weight", F.lit(1.0))
    out = {r["node"]: r["dist"] for r in gas.sssp(e, [BD + "Mike"]).collect()}
    assert out[BD + "Mike"] == 0.0
    assert out[FOAF_PERSON] == 1.0
    assert out[BD + "Bryan"] == 1.0
    assert out[BD + "Martyn"] == 2.0


def test_cc_small_graph(spark, small_edges):
    """TestCC.java:103-141: two connected components — one of FOUR
    vertices (Mike/Bryan/Martyn/foaf:Person) and one singleton (DC, a
    vertex only through its rdfs:label attribute), five vertices total."""
    df = rdf_formats.read_turtle(spark, os.path.join(GASDIR, "smallGraph.ttl"))
    # vertices = every subject plus every URI object (the reference counts
    # DC as a vertex: it appears as a subject)
    edges = df.filter(F.col("o_dt") == "iri").select(
        F.col("s").alias("src"), F.col("o_lex").alias("dst")
    )
    verts = (
        df.select(F.col("s").alias("node"))
        .unionByName(df.filter(F.col("o_dt") == "iri").select(F.col("o_lex").alias("node")))
        .distinct()
    )
    cc = gas.connected_components(
        edges.unionByName(edges.selectExpr("dst as src", "src as dst"))
    )
    # attach isolated vertices (self components)
    cc_all = verts.join(cc, on="node", how="left").select(
        "node", F.coalesce("comp", "node").alias("comp")
    )
    sizes = sorted(
        r["n"] for r in cc_all.groupBy("comp").agg(F.count("*").alias("n")).collect()
    )
    assert sizes == [1, 4]
    assert cc_all.count() == 5


def test_weighted_sssp_sssp_graph(spark):
    """The reference's _testSSSP2 problem, finished: ssspGraph links with
    the weight matrix from its own comment block (1-2:1, 1-3:1, 2-4:0.5,
    3-4:1, 4-5:0.25) — expected distances from TestSSSP.java:141-149."""
    NS = "http://www.bigdata.com/ssspGraph/"
    W = {("1", "2"): 1.0, ("1", "3"): 1.0, ("2", "4"): 0.5, ("3", "4"): 1.0, ("4", "5"): 0.25}
    rows = [(NS + a, NS + b, w) for (a, b), w in W.items()]
    rows += [(NS + b, NS + a, w) for (a, b), w in W.items()]  # undirected
    e = spark.createDataFrame(rows, "src string, dst string, weight double")
    out = {r["node"]: r["dist"] for r in gas.sssp(e, [NS + "1"]).collect()}
    assert out[NS + "1"] == 0.0
    assert out[NS + "2"] == 1.0
    assert out[NS + "3"] == 1.0
    assert out[NS + "4"] == 1.5
    assert out[NS + "5"] == 1.75
