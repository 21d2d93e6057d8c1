"""Custom function registry tests (ref: sparql/ast/FunctionRegistry.java,
eval/TestCustomFunction.java — registered factories callable from any
SPARQL expression position by IRI)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from blazegraph_database_spark.functions import registry as reg
from blazegraph_database_spark.plans.compiler import evaluate
from blazegraph_database_spark.plans.sparql_parser import parse_sparql_select


def run(store, q):
    return evaluate(store, parse_sparql_select(q))


EX = "http://example.org/fn#"


@pytest.fixture
def double_fn():
    reg.register_function(EX + "double", lambda x: x.cast("double") * 2)
    yield
    reg.remove_function(EX + "double")


def test_register_semantics():
    iri = EX + "tmp"
    reg.register_function(iri, lambda x: x)
    # reference's add(): "Already declared." on duplicate
    with pytest.raises(ValueError):
        reg.register_function(iri, lambda x: x)
    assert reg.contains_function(iri)
    reg.register_alias(iri, EX + "tmp-alias")
    assert reg.resolve_function(EX + "tmp-alias") is reg.resolve_function(iri)
    with pytest.raises(ValueError):
        reg.register_alias(EX + "absent", EX + "other")
    with pytest.raises(ValueError):
        reg.register_alias(iri, EX + "tmp-alias")  # alias already declared
    assert reg.remove_function(iri) is not None
    assert not reg.contains_function(iri)
    reg.remove_function(EX + "tmp-alias")


def test_custom_function_in_bind_and_filter(tiny_store, double_fn):
    q = f"""
    SELECT ?x ?d WHERE {{
      ?x <age> ?age .
      BIND (<{EX}double>(?age) AS ?d)
      FILTER (<{EX}double>(?age) > 55)
    }}
    """
    rows = {(r["x"], r["d"]) for r in run(tiny_store, q).collect()}
    assert rows == {("a", 60.0)}


def test_xpath_builtin_namespace(tiny_store):
    # fn:lower-case / fn:string-length work verbatim, as in the reference's
    # pre-registered XPATH_FUNCTIONS names (FunctionRegistry.java:171-174)
    q = """
    PREFIX fn: <http://www.w3.org/2005/xpath-functions#>
    SELECT ?x ?low WHERE {
      ?x <name> ?n .
      FILTER (fn:string-length(?n) = 5)
      BIND (fn:lower-case(?n) AS ?low)
    }
    """
    rows = {(r["x"], r["low"]) for r in run(tiny_store, q).collect()}
    assert rows == {("a", "alice"), ("c", "carol")}


def test_multi_arg_and_string_arg(tiny_store):
    # fn:matches(?n, "pattern") — string literal arg passes through
    q = """
    PREFIX fn: <http://www.w3.org/2005/xpath-functions#>
    SELECT ?x WHERE { ?x <name> ?n . FILTER (fn:matches(?n, "^[AB]")) }
    """
    rows = {r["x"] for r in run(tiny_store, q).collect()}
    assert rows == {"a", "b"}


def test_unknown_function_still_errors(tiny_store):
    with pytest.raises(SyntaxError):
        run(tiny_store, "SELECT ?x WHERE { ?x <name> ?n . FILTER (<http://nope/f>(?n)) }")


def test_distinct_aggregates(tiny_store):
    # SUM(DISTINCT), AVG(DISTINCT), GROUP_CONCAT(DISTINCT) — reference
    # supports the DISTINCT multiset-dedup on every aggregate
    q = """
    SELECT (SUM(DISTINCT ?v) AS ?s) (AVG(DISTINCT ?v) AS ?a)
           (GROUP_CONCAT(DISTINCT ?v; separator=",") AS ?g)
    WHERE {
      { <a> <age> ?v } UNION { <b> <age> ?v } UNION { ?x <age> ?v }
    }
    """
    row = run(tiny_store, q).collect()[0]
    # ages: a=30, b=25; union triples duplicate them — DISTINCT sees {25,30}
    assert row["s"] == 55.0
    assert row["a"] == 27.5
    assert row["g"] == "25,30"
