"""SPARQL UPDATE text parser tests (ref: UpdateExprBuilder.java /
AST2BOpUpdate.java evaluation order)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from blazegraph_database_spark.model.store import TripleStore
from blazegraph_database_spark.plans.update_parser import apply_update, parse_update
from blazegraph_database_spark.update.update import UpdatableStore


@pytest.fixture()
def us(spark):
    rows = [
        ("a", "knows", "b", "iri", "g1"),
        ("b", "name", "Bob", "string", "g1"),
        ("c", "name", "Carol", "string", "g2"),
    ]
    return UpdatableStore.from_store(
        TripleStore(spark.createDataFrame(rows, "s string, p string, o_lex string, o_dt string, g string"))
    )


def test_parse_ops_shapes():
    ops = parse_update(
        'INSERT DATA { <a> <p> "x" } ; DELETE WHERE { ?s <p> ?o } ; '
        "CLEAR GRAPH <g1> ; COPY <g1> TO <g2> ; LOAD SILENT <file:///x> INTO GRAPH <g3>"
    )
    assert [o["op"] for o in ops] == ["insert_data", "modify", "clear", "copy", "load"]
    assert ops[4] == {"op": "load", "uri": "file:///x", "graph": "g3", "silent": True}


def test_insert_data_graph_block(spark, us):
    apply_update(us, 'INSERT DATA { GRAPH <g2> { <d> <name> "Dave" } }')
    got = us.current.df.filter(F.col("g") == "g2").count()
    assert got == 2


def test_delete_data_typed_literal(spark, us):
    apply_update(us, 'INSERT DATA { GRAPH <g1> { <b> <age> "25"^^<http://www.w3.org/2001/XMLSchema#integer> } }')
    assert us.current.df.filter(F.col("p") == "age").count() == 1
    # DELETE DATA must match the typed term exactly
    apply_update(us, 'DELETE DATA { GRAPH <g1> { <b> <age> "25"^^<http://www.w3.org/2001/XMLSchema#integer> } }')
    assert us.current.df.filter(F.col("p") == "age").count() == 0


def test_clear_and_move_graph(spark, us):
    apply_update(us, "CLEAR GRAPH <g2>")
    assert us.current.df.filter(F.col("g") == "g2").count() == 0
    apply_update(us, "MOVE <g1> TO <g3>")
    assert us.current.df.filter(F.col("g") == "g1").count() == 0
    assert us.current.df.filter(F.col("g") == "g3").count() == 2


def test_default_graph_insert_then_delete(spark, us):
    # non-GRAPH DATA triples on a quad store live in the default graph
    # (g=NULL) and must be deletable (ADVICE r2: NULL != NULL in a plain
    # anti-join silently deleted nothing)
    apply_update(us, 'INSERT DATA { <x> <p> "v" }')
    assert us.current.df.filter(F.col("g").isNull()).count() == 1
    apply_update(us, 'DELETE DATA { <x> <p> "v" }')
    assert us.current.df.filter(F.col("g").isNull()).count() == 0
    assert us.current.df.count() == 3  # named-graph rows untouched


def test_clear_named_graph_preserves_default(spark, us):
    apply_update(us, 'INSERT DATA { <x> <p> "v" }')
    apply_update(us, "CLEAR GRAPH <g1>")
    assert us.current.df.filter(F.col("g").isNull()).count() == 1
    assert us.current.df.filter(F.col("g") == "g2").count() == 1
    assert us.current.df.filter(F.col("g") == "g1").count() == 0


def test_copy_move_default_graph(spark, us):
    apply_update(us, 'INSERT DATA { <x> <p> "v" }')
    apply_update(us, "COPY DEFAULT TO <gd>")
    assert us.current.df.filter(F.col("g") == "gd").count() == 1
    apply_update(us, "MOVE <gd> TO DEFAULT")
    assert us.current.df.filter(F.col("g") == "gd").count() == 0
    assert us.current.df.filter(F.col("g").isNull()).count() == 1


def test_with_graph_modify_scopes_to_graph(spark, us):
    # WITH <g1>: WHERE, DELETE and INSERT all scoped to g1 (ADVICE r3 — the
    # delete previously anti-joined on (s,p,o) only, hitting every graph).
    apply_update(
        us,
        "WITH <g1> DELETE { ?s <name> ?o } INSERT { ?s <nick> ?o } WHERE { ?s <name> ?o }",
    )
    df = us.current.df
    assert df.filter((F.col("g") == "g2") & (F.col("p") == "name")).count() == 1
    assert df.filter((F.col("g") == "g1") & (F.col("p") == "name")).count() == 0
    ins = df.filter(F.col("p") == "nick").collect()
    assert len(ins) == 1 and ins[0]["g"] == "g1" and ins[0]["o_lex"] == "Bob"


def test_delete_where_on_quads_targets_default_graph(spark, us):
    # bare (non-GRAPH) DELETE templates refer to the default graph on a quad
    # store; named-graph rows with the same (s,p,o) must survive.
    apply_update(us, 'INSERT DATA { <b> <name> "Bob" }')  # default-graph twin of g1's row
    apply_update(us, "DELETE WHERE { ?s <name> ?o }")
    df = us.current.df
    assert df.filter(F.col("g").isNull()).count() == 0
    assert df.filter((F.col("g") == "g1") & (F.col("p") == "name")).count() == 1
    assert df.filter((F.col("g") == "g2") & (F.col("p") == "name")).count() == 1


def test_data_block_rejects_variables():
    with pytest.raises(SyntaxError):
        parse_update("INSERT DATA { ?s <p> <o> }")


def test_delete_insert_where_var_object_types(spark):
    rows = [
        ("a", "p", "b", "iri"),
        ("a", "p", "42", "long"),
        ("a", "p", "x", "string"),
    ]
    us2 = UpdatableStore.from_store(
        TripleStore(spark.createDataFrame(rows, "s string, p string, o_lex string, o_dt string"))
    )
    # variable-object delete must remove IRI and typed-literal rows too
    apply_update(us2, "DELETE { ?s <p> ?o } WHERE { ?s <p> ?o }")
    assert us2.current.df.count() == 0


def test_insert_data_bnodes(spark):
    """Bnode labels in INSERT DATA mint one fresh bnode per label per
    request (SPARQL 1.1 Update §3.1.1)."""
    from blazegraph_database_spark.model.store import TripleStore
    from blazegraph_database_spark.plans.update_parser import apply_update
    from blazegraph_database_spark.update.update import UpdatableStore

    us = UpdatableStore.from_store(
        TripleStore(
            spark.createDataFrame(
                [("a1", "ex:name", "Alice", "string")],
                "s string, p string, o_lex string, o_dt string",
            )
        )
    )
    apply_update(us, 'INSERT DATA { _:x <ex:name> "Temp" . _:x <ex:age> "5" }')
    bn = us.current.df.filter(F.col("s").startswith("_:"))
    assert bn.count() == 2
    assert bn.select("s").distinct().count() == 1  # same label, same bnode


def test_graph_ops_upgrade_triples_store(spark):
    """Graph-targeted updates on a triples-only store upgrade it to quads
    (existing rows in the default graph) instead of dropping g or failing."""
    from blazegraph_database_spark.model.store import TripleStore
    from blazegraph_database_spark.plans.update_parser import apply_update
    from blazegraph_database_spark.update.update import UpdatableStore

    def fresh():
        return UpdatableStore.from_store(
            TripleStore(
                spark.createDataFrame(
                    [("a1", "ex:name", "Alice", "string")],
                    "s string, p string, o_lex string, o_dt string",
                )
            )
        )

    us = fresh()
    apply_update(
        us,
        'INSERT DATA { GRAPH <g1> { <x> <p> "1" } . <y> <p> "2" } ; '
        "WITH <g1> DELETE { ?s <p> ?o } WHERE { ?s <p> ?o }",
    )
    rows = sorted(tuple(r) for r in us.current.df.collect())
    assert rows == [
        ("a1", "ex:name", "Alice", "string", None),
        ("y", "p", "2", "string", None),
    ]
    # named-graph DELETE DATA must not touch the default graph
    us2 = fresh()
    apply_update(us2, 'DELETE DATA { GRAPH <g9> { <a1> <ex:name> "Alice" } }')
    assert us2.current.df.count() == 1
    # template-level GRAPH wrapper in INSERT ... WHERE
    us3 = fresh()
    apply_update(us3, "INSERT { GRAPH <g2> { ?s <ex:copy> ?n } } WHERE { ?s <ex:name> ?n }")
    assert us3.current.df.filter(F.col("g") == "g2").count() == 1


def test_delete_data_rejects_bnodes(spark):
    from blazegraph_database_spark.plans.update_parser import parse_update

    with pytest.raises(SyntaxError, match="DELETE DATA"):
        parse_update('DELETE DATA { _:x <ex:p> <o> }')


def test_using_clauses(spark):
    """USING / USING NAMED dataset clauses on DELETE/INSERT WHERE (ref:
    UpdateExprBuilder dataset handling): USING <g> scopes the WHERE's
    default graph; USING overrides WITH for pattern matching."""
    from blazegraph_database_spark.model.store import TripleStore
    from blazegraph_database_spark.plans.update_parser import apply_update
    from blazegraph_database_spark.update.update import UpdatableStore

    rows = [
        ("a", "p", "default", "string", None),
        ("b", "p", "ing1", "string", "g1"),
        ("c", "p", "ing2", "string", "g2"),
    ]
    us = UpdatableStore.from_store(TripleStore(spark.createDataFrame(
        rows, "s string, p string, o_lex string, o_dt string, g string")))
    # WHERE sees only g1 via USING; inserts land in the default graph
    apply_update(us, 'INSERT { ?s <seen> "yes" } USING <g1> WHERE { ?s <p> ?o }')
    seen = us.current.df.filter("p = 'seen'").collect()
    assert [(r.s, r.g) for r in seen] == [("b", None)]
    # USING NAMED: GRAPH ?g patterns range over the named set only
    apply_update(
        us,
        'INSERT { ?s <ng> "y" } USING NAMED <g2> WHERE { GRAPH ?g { ?s <p> ?o } }',
    )
    ng = us.current.df.filter("p = 'ng'").collect()
    assert [r.s for r in ng] == ["c"]


def test_delete_where_graph_and_load_silent(spark, tmp_path):
    """DELETE WHERE { GRAPH <g> { ... } } shorthand removes the quads; LOAD
    SILENT of a missing file is a no-op instead of an abort."""
    from blazegraph_database_spark.model.store import TripleStore
    from blazegraph_database_spark.plans.update_parser import apply_update
    from blazegraph_database_spark.update.update import UpdatableStore
    import pytest as _pytest

    rows = [
        ("a", "p", "x", "string", None),
        ("b", "p", "y", "string", "g1"),
        ("c", "q", "z", "string", "g1"),
    ]
    us = UpdatableStore.from_store(TripleStore(spark.createDataFrame(
        rows, "s string, p string, o_lex string, o_dt string, g string")))
    apply_update(us, "DELETE WHERE { GRAPH <g1> { ?s <p> ?o } }")
    left = {(r.s, r.g) for r in us.current.df.collect()}
    assert left == {("a", None), ("c", "g1")}  # only g1's <p> quad removed
    # mixed plain + GRAPH block in one shorthand
    apply_update(us, "DELETE WHERE { ?s <p> ?o . GRAPH <g1> { ?t <q> ?z } }")
    assert us.current.df.count() == 0  # join matched (a, c) together
    # LOAD SILENT: missing file no-ops; plain LOAD raises
    n = us.current.df.count()
    apply_update(us, "LOAD SILENT <file:///nonexistent-load-target.nt>")
    assert us.current.df.count() == n
    with _pytest.raises(Exception):
        apply_update(us, "LOAD <file:///nonexistent-load-target.nt>")


def test_using_only_empty_named_set(spark):
    """SPARQL 1.1 dataset semantics: once any USING clause is present the
    dataset is FULLY specified — USING without USING NAMED leaves the
    named-graph set EMPTY, so GRAPH patterns yield zero solutions (review
    r5 finding: they previously ranged over every named graph)."""
    from blazegraph_database_spark.model.store import TripleStore
    from blazegraph_database_spark.plans.update_parser import apply_update
    from blazegraph_database_spark.update.update import UpdatableStore

    rows = [
        ("a", "p", "x", "string", None),
        ("b", "p", "y", "string", "g1"),
    ]
    us = UpdatableStore.from_store(TripleStore(spark.createDataFrame(
        rows, "s string, p string, o_lex string, o_dt string, g string")))
    before = us.current.df.count()
    apply_update(
        us,
        'DELETE { ?s <p> ?o } USING <g1> WHERE { GRAPH <g1> { ?s <p> ?o } }',
    )
    assert us.current.df.count() == before  # GRAPH matched nothing
    # and the flip side: USING NAMED only -> default-graph patterns empty
    apply_update(
        us,
        'INSERT { ?s <dflt> "seen" } USING NAMED <g1> WHERE { ?s <p> ?o }',
    )
    assert us.current.df.filter("p = 'dflt'").count() == 0


# ------------------------------------------------- bd:rdrhistory (r6) --


def test_rdr_history_events_and_service(spark):
    """RDR change capture (ref: sail/RDRHistory.java:61 — << s p o >>
    blaze:history:added|removed "commit"^^xsd:long) + the registered
    SERVICE <bd:rdrhistory> query surface over SPARQL-star patterns."""
    from blazegraph_database_spark.plans.sparql_parser import run_sparql

    base = spark.createDataFrame(
        [("ex:a", "ex:p", "1", "long"), ("ex:b", "ex:p", "2", "long")],
        "s string, p string, o_lex string, o_dt string",
    )
    us = UpdatableStore.from_store(TripleStore(base))
    apply_update(us, 'INSERT DATA { <ex:c> <ex:p> "3" }', spark)
    apply_update(us, "DELETE DATA { <ex:a> <ex:p> 1 }", spark)

    events = {
        (r["s"], r["p"], r["o_lex"]) for r in us.rdr_history().collect()
    }
    assert ("<<ex:c|ex:p|3|string>>", "blaze:history:added", "1") in events
    assert ("<<ex:a|ex:p|1|long>>", "blaze:history:removed", "2") in events

    # the removed statement is queryable through ordinary SPARQL-star
    # patterns inside the service block — constant inner positions too
    out = run_sparql(
        us.query_store,
        """
        SELECT ?c WHERE {
          SERVICE <http://www.bigdata.com/rdf#rdrhistory> {
            <<<ex:a> <ex:p> ?v>> <blaze:history:removed> ?c .
          }
        }
        """,
    ).collect()
    assert [r["c"] for r in out] == ["2"]

    # history events never leak into ordinary (non-service) queries
    plain = run_sparql(
        us.query_store, "SELECT ?s WHERE { ?s <blaze:history:removed> ?c }"
    ).collect()
    assert plain == []


def test_clear_scope_targets(spark):
    """SPARQL 1.1 CLEAR DEFAULT/NAMED/ALL + the reference's GRAPHS and bare
    SOLUTIONS targets (grammar: sparql.jjt GraphRefAll)."""
    from blazegraph_database_spark.model.store import TripleStore
    from blazegraph_database_spark.plans.update_parser import apply_update
    from blazegraph_database_spark.update.update import UpdatableStore

    def mk():
        rows = [
            ("a", "p", "1", "string", None),
            ("b", "p", "2", "string", "http://g1"),
            ("c", "p", "3", "string", "http://g2"),
        ]
        return UpdatableStore.from_store(TripleStore(spark.createDataFrame(
            rows, "s string, p string, o_lex string, o_dt string, g string")))

    us = mk()
    apply_update(us, "CLEAR DEFAULT", spark)
    assert {r["s"] for r in us.current.df.collect()} == {"b", "c"}

    us = mk()
    apply_update(us, "CLEAR NAMED", spark)
    assert {r["s"] for r in us.current.df.collect()} == {"a"}

    us = mk()
    apply_update(us, "DROP ALL", spark)
    assert us.current.df.count() == 0

    us = mk()
    apply_update(us, "CLEAR GRAPHS", spark)
    assert us.current.df.count() == 0

    # triples-mode: DEFAULT clears everything, NAMED nothing
    rows3 = [("a", "p", "1", "string")]
    us3 = UpdatableStore.from_store(TripleStore(spark.createDataFrame(
        rows3, "s string, p string, o_lex string, o_dt string")))
    apply_update(us3, "CLEAR NAMED", spark)
    assert us3.current.df.count() == 1
    apply_update(us3, "CLEAR DEFAULT", spark)
    assert us3.current.df.count() == 0

    # bare SOLUTIONS drops every named solution set, keeps statements
    us4 = mk()
    df = spark.createDataFrame([("x", "1")], "a string, b string").coalesce(1)
    us4.solutions_manager().create("s1")
    us4.solutions_manager().put("s1", df)
    apply_update(us4, "DROP SOLUTIONS", spark)
    assert us4.solutions_manager().names() == []
    assert us4.current.df.count() == 3
