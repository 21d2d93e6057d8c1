"""SPARQL 1.1 Update spec-example compliance: hand-translated examples from
the public W3C SPARQL 1.1 Update recommendation (each cites its section),
asserting the store states the spec prescribes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from blazegraph_database_spark.model.store import TripleStore
from blazegraph_database_spark.plans.update_parser import apply_update
from blazegraph_database_spark.update.update import UpdatableStore


@pytest.fixture()
def addrbook(spark):
    # §3-style data: a small address book in the default graph
    rows = [
        ("ex:president25", "foaf:givenName", "Bill", "string"),
        ("ex:president25", "foaf:familyName", "McKinley", "string"),
        ("ex:president27", "foaf:givenName", "Bill", "string"),
        ("ex:president27", "foaf:familyName", "Taft", "string"),
        ("ex:president42", "foaf:givenName", "Bill", "string"),
        ("ex:president42", "foaf:familyName", "Clinton", "string"),
    ]
    return UpdatableStore.from_store(
        TripleStore(spark.createDataFrame(rows, "s string, p string, o_lex string, o_dt string"))
    )


def _names(us, pred="foaf:givenName"):
    return sorted(
        r["o_lex"] for r in us.current.df.filter(F.col("p") == pred).collect()
    )


def test_insert_data(addrbook):
    """§3.1.1 INSERT DATA adds ground triples."""
    apply_update(addrbook, 'INSERT DATA { <ex:book1> <dc:title> "A new book" }')
    assert addrbook.current.df.filter(F.col("s") == "ex:book1").count() == 1


def test_delete_insert_rename(addrbook):
    """§3.1.3 example 2: DELETE/INSERT WHERE renames every Bill to William."""
    apply_update(
        addrbook,
        """
        DELETE { ?person <foaf:givenName> "Bill" }
        INSERT { ?person <foaf:givenName> "William" }
        WHERE  { ?person <foaf:givenName> "Bill" }
        """,
    )
    assert _names(addrbook) == ["William", "William", "William"]


def test_delete_where_pattern(addrbook):
    """§3.1.3.2 DELETE WHERE removes every matched binding's triples."""
    apply_update(addrbook, 'DELETE WHERE { ?p <foaf:familyName> "Taft" . ?p ?any ?v }')
    assert addrbook.current.df.filter(F.col("s") == "ex:president27").count() == 0
    assert addrbook.current.df.count() == 4


def test_insert_where_copies_between_graphs(spark):
    """§3.1.3 example 3: INSERT ... WHERE copies matches into another graph."""
    rows = [("a", "p", "1", "long", "g1"), ("b", "q", "2", "long", "g1")]
    us = UpdatableStore.from_store(
        TripleStore(spark.createDataFrame(rows, "s string, p string, o_lex string, o_dt string, g string"))
    )
    apply_update(
        us,
        "INSERT { GRAPH <g2> { ?s ?p ?o } } WHERE { GRAPH <g1> { ?s ?p ?o } }",
    )
    assert us.current.df.filter(F.col("g") == "g2").count() == 2
    assert us.current.df.filter(F.col("g") == "g1").count() == 2


def test_clear_then_drop_silent(spark):
    """§3.2.2/§3.2.3: CLEAR GRAPH empties, DROP SILENT on a missing graph
    succeeds without error."""
    rows = [("a", "p", "1", "long", "g1")]
    us = UpdatableStore.from_store(
        TripleStore(spark.createDataFrame(rows, "s string, p string, o_lex string, o_dt string, g string"))
    )
    apply_update(us, "CLEAR GRAPH <g1>")
    assert us.current.df.filter(F.col("g") == "g1").count() == 0
    apply_update(us, "DROP SILENT GRAPH <never>")  # must not raise


def test_sequence_is_ordered(addrbook):
    """§2.2: operations in a request run in order against the evolving
    state — the second op sees the first op's writes."""
    apply_update(
        addrbook,
        'INSERT DATA { <ex:x> <foaf:givenName> "Zed" } ; '
        'DELETE { ?p <foaf:givenName> "Zed" } INSERT { ?p <foaf:givenName> "Zee" } '
        'WHERE { ?p <foaf:givenName> "Zed" }',
    )
    assert "Zee" in _names(addrbook) and "Zed" not in _names(addrbook)
