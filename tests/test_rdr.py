"""RDF-star / RDR tests (ref: SidIV.java statement identifiers, RDR-enabled
BigdataNTriplesParser, rdr_test.ttlx fixture semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from blazegraph_database_spark.model.store import TripleStore
from blazegraph_database_spark.model.terms import Lit, Var as V
from blazegraph_database_spark.plans import algebra as A
from blazegraph_database_spark.plans.compiler import evaluate
from blazegraph_database_spark.plans.sparql_parser import parse_sparql_select, run_sparql
from blazegraph_database_spark.sources import ntriples


def sid(s, p, o_lex, o_dt="string"):
    return f"<<{s}|{p}|{o_lex}|{o_dt}>>"


def _store(spark):
    rows = [
        # asserted statements
        ("bob", "age", "23", "long"),
        ("alice", "age", "30", "long"),
        ("bob", "knows", "alice", "iri"),
        # statement metadata (RDR): <<bob age 23>> creator c1 ; source home
        (sid("bob", "age", "23", "long"), "creator", "c1", "iri"),
        (sid("bob", "age", "23", "long"), "source", "home", "iri"),
        (sid("alice", "age", "30", "long"), "creator", "c2", "iri"),
        # metadata in object position: audit points AT a statement
        ("audit1", "about", sid("bob", "knows", "alice", "iri"), "sid"),
    ]
    return TripleStore(
        spark.createDataFrame(rows, "s string, p string, o_lex string, o_dt string")
    )


def test_parser_embedded_subject():
    plan = parse_sparql_select("SELECT ?s ?c WHERE { <<?s <age> ?a>> <creator> ?c }")
    emb_sps = [sp for sp in _find_sps(plan) if isinstance(sp.s, A.Emb)]
    assert len(emb_sps) == 1
    e = emb_sps[0].s
    assert e.p == "age" and isinstance(e.s, V) and isinstance(e.o, V)


def _find_sps(node, acc=None):
    acc = [] if acc is None else acc
    if isinstance(node, A.SP):
        acc.append(node)
    for f in getattr(node, "__dataclass_fields__", {}):
        v = getattr(node, f)
        if hasattr(v, "__dataclass_fields__"):
            _find_sps(v, acc)
        elif isinstance(v, tuple):
            for x in v:
                if hasattr(x, "__dataclass_fields__"):
                    _find_sps(x, acc)
    return acc


def test_emb_subject_var_binding(spark):
    st = _store(spark)
    out = evaluate(st, A.BGP([A.SP(A.Emb(V("s"), "age", V("a")), "creator", V("c"))]))
    got = {(r["s"], r["a"], r["c"]) for r in out.collect()}
    assert got == {("bob", "23", "c1"), ("alice", "30", "c2")}


def test_emb_subject_const_inner(spark):
    st = _store(spark)
    out = evaluate(st, A.BGP([A.SP(A.Emb("bob", "age", Lit("23", "long")), "source", V("src"))]))
    assert [r["src"] for r in out.collect()] == ["home"]


def test_emb_shared_var_join(spark):
    """Inner var shared with another pattern joins per SPARQL-star."""
    st = _store(spark)
    out = evaluate(
        st,
        A.BGP([
            A.SP(A.Emb(V("s"), "age", V("a")), "creator", "c1"),
            A.SP(V("s"), "knows", V("who")),
        ]),
    )
    got = {(r["s"], r["who"]) for r in out.collect()}
    assert got == {("bob", "alice")}


def test_emb_object_position(spark):
    st = _store(spark)
    out = evaluate(st, A.BGP([A.SP(V("audit"), "about", A.Emb(V("x"), "knows", V("y")))]))
    got = {(r["audit"], r["x"], r["y"]) for r in out.collect()}
    assert got == {("audit1", "bob", "alice")}


def test_run_sparql_star_text(spark):
    st = _store(spark)
    out = run_sparql(st, "SELECT ?s ?c WHERE { <<?s <age> ?a>> <creator> ?c } ORDER BY ?s")
    assert [(r["s"], r["c"]) for r in out.collect()] == [("alice", "c2"), ("bob", "c1")]


def test_star_functions(spark):
    st = _store(spark)
    out = run_sparql(
        st,
        'SELECT ?m (SUBJECT(?m) AS ?subj) WHERE { <audit1> <about> ?m . FILTER(ISTRIPLE(?m)) }',
    )
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["subj"] == "bob"


def test_read_ntriples_star(spark, tmp_path):
    doc = "\n".join([
        "<bob> <name> \"Bob\" .",
        '<<<bob> <age> "23"^^<http://www.w3.org/2001/XMLSchema#integer>>> <creator> <c1> .',
        "<< <bob> <age> \"23\"^^<http://www.w3.org/2001/XMLSchema#integer> >> <source> <home> .",
    ])
    f = tmp_path / "star.nt"
    f.write_text(doc + "\n")
    df = ntriples.read_ntriples_star(spark, str(f))
    rows = {tuple(r) for r in df.collect()}
    # plain line + asserted inner (deduped? both star lines assert the same inner triple)
    assert ("bob", "name", "Bob", "string") in rows
    assert ("bob", "age", "23", "long") in rows
    assert (sid("bob", "age", "23", "long"), "creator", "c1", "iri") in rows
    assert (sid("bob", "age", "23", "long"), "source", "home", "iri") in rows


def test_construct_emb_template(spark):
    """CONSTRUCT with an embedded-triple template emits sid metadata terms."""
    st = _store(spark)
    from blazegraph_database_spark.plans.compiler import construct

    out = construct(
        st,
        A.BGP([A.SP(V("s"), "age", V("a"))]),
        [(A.Emb(V("s"), "age", V("a")), "checkedBy", "auditor")],
    )
    rows = {tuple(r) for r in out.collect()}
    assert (sid("bob", "age", "23", "long"), "checkedBy", "auditor", "iri") in rows
    assert (sid("alice", "age", "30", "long"), "checkedBy", "auditor", "iri") in rows


def test_update_insert_emb_data(spark):
    """INSERT DATA with a ground <<s p o>> subject inserts a sid triple the
    SPARQL-star pattern can then find."""
    from blazegraph_database_spark.plans.update_parser import apply_update
    from blazegraph_database_spark.update.update import UpdatableStore

    us = UpdatableStore.from_store(_store(spark))
    apply_update(us, 'INSERT DATA { <<<bob> <age> "23"^^<http://www.w3.org/2001/XMLSchema#integer>>> <flag> "checked" }', spark)
    out = evaluate(us.current, A.BGP([A.SP(A.Emb(V("s"), "age", V("a")), "flag", V("f"))]))
    assert {(r["s"], r["f"]) for r in out.collect()} == {("bob", "checked")}


# ------------------------------------------------ RDR <-> reification -----
def test_reify_unreify_roundtrip(spark):
    from blazegraph_database_spark.operators import reification as R

    rows = [
        ("a", "knows", "b", "iri"),
        ("<<a|knows|b|iri>>", "since", "2001", "long"),
        ("x", "saw", "<<a|knows|b|iri>>", "sid"),
        ("c", "name", "pipe|val", "string"),
        ("<<c|name|pipe|val|string>>", "src", "crawler", "iri"),
        ("_:bn", "age", "5", "long"),
        ("<<_:bn|age|5|long>>", "conf", "0.9", "double"),
    ]
    df = spark.createDataFrame(rows, "s string, p string, o_lex string, o_dt string")
    r = R.reify(df)
    got = {tuple(t) for t in r.collect()}
    # scaffolding complete per sid, metadata re-pointed at the node
    nodes = {s for s, p, _, _ in got if p == "rdf:type"}
    assert len(nodes) == 3 and all(n.startswith("_:st_") for n in nodes)
    for n in nodes:
        preds = {p for s, p, _, _ in got if s == n}
        assert {"rdf:type", "rdf:subject", "rdf:predicate", "rdf:object"} <= preds
    # bnode inner subject keeps its bnode dtype on rdf:subject
    assert any(p == "rdf:subject" and o == "_:bn" and dt == "bnode" for _, p, o, dt in got)
    # no sid survives reification
    assert not any("<<" in s for s, _, _, _ in got)
    # exact inverse
    back = {tuple(t) for t in R.unreify(r).collect()}
    assert back == {tuple(t) for t in df.collect()}


def test_unreify_leaves_incomplete_scaffolding(spark):
    from blazegraph_database_spark.operators import reification as R

    rows = [
        ("_:n1", "rdf:type", "rdf:Statement", "iri"),
        ("_:n1", "rdf:subject", "a", "iri"),
        # no predicate/object: incomplete — must pass through untouched
        ("_:n1", "note", "partial", "string"),
    ]
    df = spark.createDataFrame(rows, "s string, p string, o_lex string, o_dt string")
    out = {tuple(t) for t in R.unreify(df).collect()}
    assert out == {tuple(t) for t in df.collect()}


def test_write_ntriples_rdr_roundtrip(spark, tmp_path):
    """RDR stores export losslessly: sid terms (subject AND object
    position) render as `<< s p o >>` star lines, and read_ntriples_star
    reloads the same statement set (inner statements dedup via RDR
    assertion semantics)."""
    from blazegraph_database_spark.sources import ntriples as NT

    rows = [
        ("a", "knows", "b", "iri"),
        ("<<a|knows|b|iri>>", "since", "2001", "long"),
        ("x", "saw", "<<a|knows|b|iri>>", "sid"),
        ("<<a|knows|b|iri>>", "note", "hi there", "string"),
    ]
    df = spark.createDataFrame(rows, "s string, p string, o_lex string, o_dt string")
    out = str(tmp_path / "rdr_nt")
    NT.write_ntriples(df, out)
    back = {tuple(r) for r in NT.read_ntriples_star(spark, out).collect()}
    assert back == {tuple(r) for r in df.collect()}


def test_turtle_writer_rdr_roundtrip(spark, tmp_path):
    from blazegraph_database_spark.sources import rdf_formats as RF
    from blazegraph_database_spark.sources.rdf_writers import turtle_doc

    rows = [
        ("http://ex/a", "http://ex/knows", "http://ex/b", "iri"),
        ("<<http://ex/a|http://ex/knows|http://ex/b|iri>>", "http://ex/since", "2001", "long"),
        ("http://ex/x", "http://ex/saw", "<<http://ex/a|http://ex/knows|http://ex/b|iri>>", "sid"),
    ]
    df = spark.createDataFrame(rows, "s string, p string, o_lex string, o_dt string")
    doc = turtle_doc(df)
    assert "<< " in doc and " >>" in doc
    back = {tuple(t) for t in RF._parse_turtle_doc(doc)}
    assert back == {tuple(t) for t in df.collect()}
