"""Property-graph facade tests (ref: bigdata-blueprints BigdataGraph —
TestBigdataGraph vertex/edge/property round-trips)."""

from __future__ import annotations

from blazegraph_database_spark.blueprints import PropertyGraph
from blazegraph_database_spark.model.store import TripleStore


def _empty_store(spark):
    return TripleStore(
        spark.createDataFrame([], "s string, p string, o_lex string, o_dt string")
    )


def test_vertices_edges_properties(spark):
    g = PropertyGraph(_empty_store(spark))
    g.add_vertex("v:ann", name="Ann", age=34)
    g.add_vertex("v:bob", name="Bob")
    g.add_edge("v:ann", "knows", "v:bob", since=2019)
    assert sorted(r["id"] for r in g.vertices().collect()) == ["v:ann", "v:bob"]
    assert g.vertex("v:ann") == {"name": "Ann", "age": "34"}
    # typed literal tags survive the mapping
    dts = {r["name"]: r["dt"] for r in g.vertex_properties("v:ann").collect()}
    assert dts == {"name": "string", "age": "long"}
    assert [tuple(r) for r in g.edges().collect()] == [("v:ann", "knows", "v:bob")]
    assert g.edge_properties("v:ann", "knows", "v:bob") == {"since": "2019"}


def test_traversals_and_degrees(spark):
    g = PropertyGraph(_empty_store(spark))
    for v in ("v:a", "v:b", "v:c"):
        g.add_vertex(v)
    g.add_edge("v:a", "knows", "v:b")
    g.add_edge("v:a", "likes", "v:c")
    g.add_edge("v:c", "knows", "v:a")
    assert sorted(r["id"] for r in g.out_neighbors("v:a").collect()) == ["v:b", "v:c"]
    assert [r["id"] for r in g.out_neighbors("v:a", label="knows").collect()] == ["v:b"]
    assert [r["id"] for r in g.in_neighbors("v:a").collect()] == ["v:c"]
    assert sorted(r["id"] for r in g.both_neighbors("v:a").collect()) == ["v:b", "v:c"]
    deg = {r["id"]: r["degree"] for r in g.degrees("out").collect()}
    assert deg == {"v:a": 2, "v:c": 1}
    both = {r["id"]: r["degree"] for r in g.degrees("both").collect()}
    assert both == {"v:a": 3, "v:b": 1, "v:c": 2}


def test_remove_edge_drops_properties(spark):
    g = PropertyGraph(_empty_store(spark))
    g.add_edge("v:a", "knows", "v:b", w=1)
    g.remove_edge("v:a", "knows", "v:b")
    assert g.edges().isEmpty()
    assert g.edge_properties("v:a", "knows", "v:b") == {}


def test_gas_handoff(spark):
    from blazegraph_database_spark.operators import gas

    g = PropertyGraph(_empty_store(spark))
    g.add_edge("v:a", "knows", "v:b")
    g.add_edge("v:b", "knows", "v:c")
    out = {r["node"]: r["depth"] for r in gas.bfs(g.as_gas_edges(), ["v:a"]).collect()}
    assert out == {"v:a": 0, "v:b": 1, "v:c": 2}


def test_versioning_inherits_snapshot_isolation(spark):
    g = PropertyGraph(_empty_store(spark))
    g.add_vertex("v:a")
    v0 = g.store.current
    g.add_vertex("v:b")
    assert v0.df.count() == 1  # old version untouched
    assert g.vertices().count() == 2
