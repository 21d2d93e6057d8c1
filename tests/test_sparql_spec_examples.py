"""SPARQL 1.1 spec-example compliance: hand-translated examples from the
public W3C SPARQL 1.1 Query recommendation (each cites its section) with
the answers the spec prescribes. These pin the semantics corner cases the
reference implements via its AST optimizers (bottom-up evaluation, OPTIONAL
scope, EBV, aggregate projection)."""

from __future__ import annotations

import pytest

from blazegraph_database_spark.model.store import TripleStore
from blazegraph_database_spark.plans.sparql_parser import run_sparql


@pytest.fixture(scope="module")
def books(spark):
    # §6.2-style data: books with optional prices
    rows = [
        ("book1", "dc:title", "SPARQL Tutorial", "string"),
        ("book1", "ns:price", "42", "long"),
        ("book2", "dc:title", "The Semantic Web", "string"),
        ("book2", "ns:price", "23", "long"),
        ("book3", "dc:title", "Missing Price", "string"),
    ]
    return TripleStore(
        spark.createDataFrame(rows, "s string, p string, o_lex string, o_dt string")
    )


def test_optional_with_filter_inside(books):
    """§6.1/6.3: FILTER inside OPTIONAL — rows keep the binding only when
    the optional part (incl. its filter) matches; others stay unbound."""
    q = """
    SELECT ?title ?price WHERE {
      ?x <dc:title> ?title .
      OPTIONAL { ?x <ns:price> ?price . FILTER (?price < 30) }
    }
    """
    rows = {(r["title"], r["price"]) for r in run_sparql(books, q).collect()}
    assert rows == {
        ("SPARQL Tutorial", None),
        ("The Semantic Web", "23"),
        ("Missing Price", None),
    }


def test_bound_negation_idiom(books):
    """§6.4 (pre-NOT-EXISTS negation idiom): !BOUND after OPTIONAL."""
    q = """
    SELECT ?title WHERE {
      ?x <dc:title> ?title .
      OPTIONAL { ?x <ns:price> ?price }
      FILTER (!BOUND(?price))
    }
    """
    assert {r["title"] for r in run_sparql(books, q).collect()} == {"Missing Price"}


def test_union_keeps_all_branches(books):
    """§7: UNION is multiset-additive across branches."""
    q = """
    SELECT ?v WHERE {
      { <book1> <dc:title> ?v } UNION { <book1> <ns:price> ?v }
    }
    """
    assert {r["v"] for r in run_sparql(books, q).collect()} == {"SPARQL Tutorial", "42"}


def test_coalesce_and_if(books):
    """§17.4.1.5/17.4.1.3: COALESCE picks the first bound value; IF uses EBV."""
    q = """
    SELECT ?title (COALESCE(?price, "n/a") AS ?p2)
                  (IF(BOUND(?price), "priced", "free") AS ?tag)
    WHERE {
      ?x <dc:title> ?title .
      OPTIONAL { ?x <ns:price> ?price }
    }
    """
    rows = {(r["title"], r["p2"], r["tag"]) for r in run_sparql(books, q).collect()}
    assert rows == {
        ("SPARQL Tutorial", "42", "priced"),
        ("The Semantic Web", "23", "priced"),
        ("Missing Price", "n/a", "free"),
    }


def test_aggregate_empty_group_count_zero(spark):
    """§18.5: COUNT over an empty solution sequence with no GROUP BY yields
    one row with 0 (the aggregate of the empty group)."""
    st = TripleStore(
        spark.createDataFrame([("s", "p", "o", "string")], "s string, p string, o_lex string, o_dt string")
    )
    out = run_sparql(st, "SELECT (COUNT(*) AS ?n) WHERE { ?a <nope> ?b }").collect()
    assert [r["n"] for r in out] == [0]


def test_order_by_asc_desc_mixed(books):
    """§15.1: multiple ORDER BY conditions with mixed directions."""
    q = """
    SELECT ?title ?price WHERE {
      ?x <dc:title> ?title . ?x <ns:price> ?price .
    } ORDER BY DESC(?price) ?title
    """
    got = [(r["title"], r["price"]) for r in run_sparql(books, q).collect()]
    assert got == [("SPARQL Tutorial", "42"), ("The Semantic Web", "23")]


def test_values_postfix_join(books):
    """§10.2: VALUES after the pattern joins (restricts) the solutions."""
    q = """
    SELECT ?title WHERE {
      ?x <dc:title> ?title .
    } VALUES ?title { "Missing Price" "Nope" }
    """
    assert {r["title"] for r in run_sparql(books, q).collect()} == {"Missing Price"}


def test_minus_shares_no_vars_removes_nothing(books):
    """§8.3.3: MINUS with disjoint variables removes nothing (no shared
    bindings means no solution is compatible)."""
    q = "SELECT ?title WHERE { ?x <dc:title> ?title MINUS { ?y <never> ?z } }"
    assert run_sparql(books, q).count() == 3


def test_subquery_limit_then_outer_join(books):
    """§12: inner LIMIT evaluates first; outer pattern joins the projected
    subset only."""
    q = """
    SELECT ?title ?price WHERE {
      { SELECT ?x WHERE { ?x <ns:price> ?price0 } ORDER BY DESC(?price0) LIMIT 1 }
      ?x <dc:title> ?title . ?x <ns:price> ?price .
    }
    """
    got = [(r["title"], r["price"]) for r in run_sparql(books, q).collect()]
    assert got == [("SPARQL Tutorial", "42")]
