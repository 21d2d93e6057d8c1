"""Algebra → DataFrame compiler.

Reference analog: AST2BOpUtility/AST2BOpJoins (bigdata-core/bigdata-rdf/src/
java/com/bigdata/rdf/sparql/ast/eval/) plus ASTStaticJoinOptimizer: we order
BGP patterns by estimated cardinality from per-predicate store stats (the
reference uses B+Tree range counts the same way), broadcast small pattern
inputs, and hand the rest to Catalyst/AQE.

Scale notes (100 TB): every pattern compiles to scan→filter(p=const)→project,
which parquet partition-pruning turns into a single-predicate read; pure join
variables ride the shuffles as 128-bit term ids (``_id_join_vars`` — the
lexicon/TERM2ID analog; ref: LexiconRelation.java — the reference never joins
on lexical strings), value-bearing variables carry their lexical form inline
(the inline-IV analog), and broadcast thresholds keep dimension-like
predicates (region/nation) out of shuffles.
"""

from __future__ import annotations

import re
from collections import Counter
from functools import singledispatch

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.errors import AnalysisException

from blazegraph_database_spark.model.store import TripleStore
from blazegraph_database_spark.model.terms import Lit, Var, const_lex, is_const
from blazegraph_database_spark.plans import algebra as A

BROADCAST_MAX_ROWS = 3_000_000  # est rows under which a pattern side is broadcast


def evaluate(store: TripleStore, node) -> DataFrame:
    """Compile an algebra node over a store to a DataFrame of bindings.

    Before compiling, classify which variables can ride joins as compact
    term ids instead of lexical strings (see :func:`_id_join_vars`); the
    pattern compiler then emits ``<var>__id`` columns (a 128-bit two-long
    xxhash64 struct, :func:`term_id`) for those, so every
    BGP/OPTIONAL/MINUS/EXISTS join on them shuffles 16-byte ids,
    not IRIs — the reference's dictionary-encoded join discipline
    (ref: lexicon/LexiconRelation.java TERM2ID), with decode-at-projection
    implicit: output variables always keep their lexical column.
    """
    fast = _fast_scan_rewrite(store, node)
    if fast is not None:
        return fast
    native = _native_typed_vars(node, store)
    id_vars = _id_join_vars(node) - set(native)
    if id_vars:
        store = store.with_id_join_vars(id_vars)
    if native:
        store = store.with_native_typed_vars(native)
    return _compile(node, store)


# ------------------------------------------------- fast range-count scan --
def _col_sql(c: Column) -> str:
    try:
        return c._jc.toString()  # classic mode: the Catalyst expression text
    except Exception:
        return str(c)


def _fast_spo(bgp) -> tuple[str, object, str] | None:
    """(s_var, p_var_or_IRI, o_var) when the node is a single unscoped
    triple pattern with distinct variables in subject/object position."""
    from blazegraph_database_spark.model.terms import IRI, Var

    if not isinstance(bgp, A.BGP) or len(bgp.patterns) != 1:
        return None
    sp = bgp.patterns[0]
    if not isinstance(sp, A.SP) or sp.g is not None:
        return None
    s, p, o = sp.s, sp.p, sp.o
    if not isinstance(s, Var) or not isinstance(o, Var) or s.name == o.name:
        return None
    if isinstance(p, Var):
        return None if p.name in (s.name, o.name) else (s.name, p, o.name)
    if isinstance(p, IRI):  # algebra-builder constant
        return (s.name, p.value, o.name)
    return (s.name, p, o.name) if isinstance(p, str) else None  # parser constant


def _fast_scan_rewrite(store: TripleStore, node):
    """Answer whole-pattern counts and distinct-predicate scans from the
    store's per-predicate range counts instead of scanning triples — the
    reference's ASTFastRangeCountOptimizer (SELECT (COUNT(*) AS ?c)
    { ?s [?p|:p] ?o } → index range count), ASTDistinctTermScanOptimizer
    (SELECT DISTINCT ?p { ?s ?p ?o } → distinct-term scan), and
    ASTSimpleGroupByAndCountOptimizer (GROUP BY ?p + COUNT(*) → one range
    count per distinct term) — bigdata-rdf/.../ast/optimizers/*.java.

    Applies only when the stats are EXACT (parquet-footer null counts,
    persisted store stats, or the groupBy stats path — see
    TripleStore.stats_are_exact) and the store is an unscoped triple view
    (no quads, no FROM dataset). At 100 TB this answers "how many triples
    with predicate X" from metadata instead of a full scan."""
    from blazegraph_database_spark.model.terms import IRI, Var

    if store.has_graphs or store.dataset_default is not None or store.dataset_named is not None:
        return None
    if not store.stats_are_exact():
        return None
    if getattr(store, "track_dt", False):
        return None  # dt-tracked consumers expect __dt companion columns

    def count_df(alias: str, m) -> DataFrame:
        _s, p, _o = m
        if isinstance(p, str):  # constant predicate: range count over aliases
            st0 = store.stats()
            total = sum(st0[a].count for a in _pred_aliases(p) if a in st0)
        else:  # variable predicate: sum of all range counts
            total = sum(s.count for s in store.stats().values())
        return store.spark.createDataFrame([(int(total),)], f"{alias} long")

    # SELECT (COUNT(*) AS ?c) { spo } — parser shape:
    # Project(Extend(Group(bgp, (), ((__agg0, count(1)),)), c, col(__agg0)), [c])
    # and the algebra-builder shape Project(Group(...aggs=((c, count(1)),)), [c]).
    if isinstance(node, A.Project) and len(node.vars) == 1:
        alias, ch = node.vars[0], node.child
        if (
            isinstance(ch, A.Extend)
            and ch.var == alias
            and isinstance(ch.child, A.Group)
            and not ch.child.keys
            and ch.child.having is None
            and len(ch.child.aggs) == 1
            and _col_sql(ch.expr) == ch.child.aggs[0][0]
            and _col_sql(ch.child.aggs[0][1]) == "count(1)"
        ):
            m = _fast_spo(ch.child.child)
            if m:
                return count_df(alias, m)
        if (
            isinstance(ch, A.Group)
            and not ch.keys
            and ch.having is None
            and len(ch.aggs) == 1
            and ch.aggs[0][0] == alias
            and _col_sql(ch.aggs[0][1]) == "count(1)"
        ):
            m = _fast_spo(ch.child)
            if m:
                return count_df(alias, m)

    # SELECT DISTINCT ?p { ?s ?p ?o } — Distinct(Project(bgp, [p])).
    if (
        isinstance(node, A.Distinct)
        and isinstance(node.child, A.Project)
        and len(node.child.vars) == 1
    ):
        m = _fast_spo(node.child.child)
        if m and isinstance(m[1], Var) and m[1].name == node.child.vars[0]:
            preds = sorted(p for p, s in store.stats().items() if s.count > 0)
            return store.spark.createDataFrame(
                [(p,) for p in preds], f"{m[1].name} string"
            )

    # SELECT ?p (COUNT(*) AS ?c) { ?s ?p ?o } GROUP BY ?p —
    # Project(Extend(Group(bgp, (p,), ((__agg0, count(1)),)), c, col(__agg0)), [p, c]).
    if isinstance(node, A.Project) and len(node.vars) == 2:
        ch = node.child
        if (
            isinstance(ch, A.Extend)
            and isinstance(ch.child, A.Group)
            and len(ch.child.keys) == 1
            and ch.child.having is None
            and len(ch.child.aggs) == 1
            and _col_sql(ch.expr) == ch.child.aggs[0][0]
            and _col_sql(ch.child.aggs[0][1]) == "count(1)"
        ):
            m = _fast_spo(ch.child.child)
            pkey = ch.child.keys[0]
            if (
                m
                and isinstance(m[1], Var)
                and m[1].name == pkey
                and set(node.vars) == {pkey, ch.var}
            ):
                rows = sorted(
                    (p, int(s.count)) for p, s in store.stats().items() if s.count > 0
                )
                if node.vars[0] == pkey:
                    data, schema = rows, f"{pkey} string, {ch.var} long"
                else:
                    data, schema = [(c, p) for p, c in rows], f"{ch.var} long, {pkey} string"
                return store.spark.createDataFrame(data, schema)
    return None


# ------------------------------------------------------- id-join planning --
def term_id(col: Column) -> Column:
    """128-bit term id: a two-long struct of independently-salted xxhash64
    over the lexical form (TERM2ID analog).

    Hashing only the lexical form makes id-equality coincide exactly with
    the value path's string-join semantics (two bindings join iff their
    lexical forms are equal), so flipping a var between id and value mode
    can never change results. The id is TWO longs, not one, because the
    stated design point is 100 TB ≈ 10^10–10^12 distinct terms per joined
    domain: at 10^11 terms a single 64-bit hash expects n²/2^65 ≈ hundreds
    of colliding pairs — each a silently wrong join row — while the
    128-bit pair's expectation is ~10^-15 (r10 verdict; the reference's
    TERM2ID assigns ids rather than hashing, LexiconRelation.java, so it
    never has this failure mode). 16-byte keys still shuffle 2-5x narrower
    than lexical IRIs. Null lexicals keep the value path's semantics
    unchanged: xxhash64 maps null to its seed on both components exactly
    as the old single hash did.
    """
    from blazegraph_database_spark.model.dictionary import WIDE_SALT

    return F.struct(
        F.xxhash64(col).alias("h1"), F.xxhash64(col, F.lit(WIDE_SALT)).alias("h2")
    )


def _all_sp_vars(n) -> set[str]:
    """Every var name BOUND anywhere in a pattern subtree — pattern
    positions plus BIND targets, VALUES columns, and Project vars (used to
    mark a whole opaque subtree, e.g. a SERVICE block, as lexical)."""
    out: set[str] = set()

    def walk(x):
        if isinstance(x, A.SP):
            out.update(_vars_of(x))
        elif isinstance(x, A.PathPattern):
            for pos in (x.s, x.o, x.g):
                if isinstance(pos, Var):
                    out.add(pos.name)
        elif isinstance(x, A.BGP):
            for sp in x.patterns:
                walk(sp)
        else:
            if isinstance(x, A.Extend):
                out.add(x.var)
            elif isinstance(x, A.Values):
                for row in x.rows:
                    out.update(row.keys())
            elif isinstance(x, A.Project):
                out.update(x.vars)
            for attr in ("child", "pattern", "left", "right"):
                c = getattr(x, attr, None)
                if c is not None and not isinstance(c, (str, Column)):
                    walk(c)

    walk(n)
    return out


def _id_join_vars(root) -> frozenset[str]:
    """Vars that can ride joins as 64-bit term ids instead of lexical strings.

    A var qualifies iff every one of these holds:

    * the query's output surface is known (the plan spine reaches a Project
      or Group — raw pattern evaluations keep lexical bindings);
    * it is bound only by plain triple patterns — never by property paths,
      VALUES, BIND, INCLUDE, SERVICE, RDF-star embedded terms, or a GRAPH
      position (those operators produce/consume lexical bindings);
    * it occurs in >= 2 patterns, i.e. it is genuinely a join key;
    * its value is never used: not projected, grouped, ordered, aggregated,
      or referenced by any filter/expression. Expression references are
      detected by a word-boundary scan of the Column's string form — a
      false positive only costs the optimization, never correctness.

    This is the compile-time equivalent of the reference's rule that all
    intermediate solutions hold IVs and the lexicon materializes values
    only at projection/expression boundaries.
    """
    occurrences: Counter = Counter()
    needed: set[str] = set()
    opaque: list[str] = []
    state = {"bail": False}

    def note_opaque(e) -> None:
        try:
            opaque.append(str(e))
        except Exception:  # pragma: no cover - repr failure → give up safely
            state["bail"] = True

    def walk(n) -> None:
        if state["bail"]:
            return
        if isinstance(n, A.SP):
            if isinstance(n.s, A.Emb) or isinstance(n.o, A.Emb):
                needed.update(_vars_of(n))  # sid joins are lexical
                return
            for pos, in_g in ((n.s, False), (n.p, False), (n.o, False), (n.g, True)):
                if isinstance(pos, Var):
                    occurrences[pos.name] += 1
                    if in_g:
                        needed.add(pos.name)
            if n.p is not None and is_const(n.p) and isinstance(n.o, Var):
                # geo:search magic PARAM positions consume the object var's
                # VALUE (resolved per sibling binding — _geo_param_join);
                # id-joining it would leave only the 64-bit companion bound
                from blazegraph_database_spark.operators.service import (
                    GEO_OUT_LOCALS, _geo_local,
                )

                loc = _geo_local(const_lex(n.p))
                if loc is not None and loc != "search" and loc not in GEO_OUT_LOCALS:
                    needed.add(n.o.name)
            return
        if isinstance(n, A.BGP):
            for sp in n.patterns:
                walk(sp)
        elif isinstance(n, (A.Join, A.Union2, A.Minus)):
            walk(n.left)
            walk(n.right)
        elif isinstance(n, A.LeftJoin):
            walk(n.left)
            walk(n.right)
            if n.condition is not None:
                note_opaque(n.condition)
        elif isinstance(n, A.Filter):
            note_opaque(n.condition)
            walk(n.child)
        elif isinstance(n, A.Extend):
            needed.add(n.var)
            note_opaque(n.expr)
            walk(n.child)
        elif isinstance(n, A.Values):
            for row in n.rows:
                needed.update(row.keys())
            if n.child is not None:
                walk(n.child)
        elif isinstance(n, A.Exists):
            walk(n.child)
            walk(n.pattern)
        elif isinstance(n, A.ExistsFlag):
            needed.add(n.var)  # generated boolean flag, never an id
            walk(n.child)
            walk(n.pattern)
        elif isinstance(n, A.Project):
            needed.update(n.vars)
            walk(n.child)
        elif isinstance(n, (A.Distinct, A.Slice, A.Dataset, A.DropCols)):
            walk(n.child)
        elif isinstance(n, A.OrderBy):
            for key, _asc in n.keys:
                if isinstance(key, str):
                    needed.add(key)
                else:
                    note_opaque(key)
            walk(n.child)
        elif isinstance(n, A.Group):
            for k in n.keys:
                if isinstance(k, str):
                    needed.add(k)
                else:
                    note_opaque(k)
            for _name, e in n.aggs:
                note_opaque(e)
            if n.having is not None:
                note_opaque(n.having)
            walk(n.child)
        elif isinstance(n, A.GraphScope):
            if isinstance(n.g, Var):
                needed.add(n.g.name)
            walk(n.child)
        elif isinstance(n, A.WithNamed):
            for plan in n.named.values():
                walk(plan)
            walk(n.child)
        elif isinstance(n, A.NamedInclude):
            pass  # joins against a materialized lexical solution set
        elif isinstance(n, (A.Service, A.PathPattern)):
            needed.update(_all_sp_vars(n))  # these emit lexical bindings
            if isinstance(n, A.Service) and isinstance(n.iri, Var):
                # a variable ENDPOINT is consumed lexically (the compiler
                # collects its distinct values to dispatch service calls)
                needed.add(n.iri.name)
        else:
            state["bail"] = True

    # the output surface must be knowable: a Project or Group on the spine
    spine = root
    while isinstance(spine, (A.Slice, A.OrderBy, A.Distinct, A.Dataset, A.WithNamed)):
        spine = spine.child
    if not isinstance(spine, (A.Project, A.Group)):
        return frozenset()
    walk(root)
    if state["bail"]:
        return frozenset()
    cands = {v for v, c in occurrences.items() if c >= 2 and v not in needed}
    if not cands:
        return frozenset()
    out = set()
    for v in cands:
        # matches `v`, `v__dt`, `v__id` as expression tokens; `_` continues a
        # word so the explicit alternative covers the companion suffixes
        rx = re.compile(r"\b" + re.escape(v) + r"(\b|_)")
        if not any(rx.search(s) for s in opaque):
            out.add(v)
    return frozenset(out)


# Allowed cast surfaces per native dt tag. For 'double' only AS DOUBLE is
# value-identical in both binding modes (string "1.5"→BIGINT yields NULL while
# double 1.5→BIGINT truncates to 1); from a long both casts agree. Timestamps
# round-trip exactly through Spark's canonical 'yyyy-MM-dd HH:mm:ss[.SSSSSS]'
# string form, so CAST AS TIMESTAMP is value-identical from either mode.
_NATIVE_CASTS = {
    "long": ("TRY_CAST({v} AS BIGINT)", "TRY_CAST({v} AS DOUBLE)",
             "CAST({v} AS BIGINT)", "CAST({v} AS DOUBLE)"),
    "double": ("TRY_CAST({v} AS DOUBLE)", "CAST({v} AS DOUBLE)"),
    "timestamp": ("TRY_CAST({v} AS TIMESTAMP)", "CAST({v} AS TIMESTAMP)"),
}
_NATIVE_SPARK_TYPE = {"long": "long", "double": "double", "timestamp": "timestamp"}


def _native_typed_vars(root, store) -> dict[str, str]:
    """Vars bound with their NATIVE parquet type instead of the lexical string.

    The inline-IV analog of :func:`_id_join_vars`: the reference never
    round-trips a numeric through the lexicon — XSDNumericIV carries the
    value inline in the statement indices and materializes a lexical form
    only on demand (ref: bigdata-core/bigdata-rdf/src/java/com/bigdata/rdf/
    internal/impl/literal/XSDNumericIV.java). Here, a var whose every
    consumer is a typed cast (sparql_funcs.num/lng and the aggregates built
    on them) binds the base table's native column directly: the string cast
    disappears from the scan, the re-cast disappears from the consumer, and
    numeric range filters reach the parquet reader as pushed filters
    (plan-quality-tested).

    A var qualifies iff:

    * the output surface is known (Project/Group on the spine);
    * every binding site is the OBJECT of a constant-predicate plain triple
      pattern whose store dt tag is 'long' or 'double', the same tag at
      every site (Union arms must union compatible column types);
    * it never occurs in subject/predicate/graph position, paths, VALUES,
      BIND targets, RDF-star embedded terms, SERVICE, or named includes;
    * it is not projected, grouped, ordered, or distinct-surfaced by name;
    * every expression reference is one of the tag's allowed casts
      (``_NATIVE_CASTS``) — those casts produce bit-identical values from
      either binding mode, so any surrounding expression is unaffected.

    Joins on a qualifying var stay correct: all sites share one tag, the
    lexical form per (tag, value) is unique (Spark's double→string is
    shortest-round-trip), so native equality coincides with lexical
    equality; Spark treats NaN as equal in join keys, matching the lexical
    'NaN' self-join.
    """
    pred_dt = getattr(store, "pred_dt", None) or {}
    if not pred_dt:
        return {}
    bind_tags: dict[str, set] = {}
    disq: set[str] = set()
    opaque: list[str] = []
    state = {"bail": False}

    def note_opaque(e) -> None:
        try:
            opaque.append(str(e))
        except Exception:  # pragma: no cover - repr failure → give up safely
            state["bail"] = True

    def walk(n) -> None:
        if state["bail"]:
            return
        if isinstance(n, A.SP):
            if isinstance(n.s, A.Emb) or isinstance(n.o, A.Emb):
                disq.update(_vars_of(n))  # sid joins are lexical
                return
            for pos in (n.s, n.p, n.g):
                if isinstance(pos, Var):
                    disq.add(pos.name)
            if isinstance(n.o, Var):
                v = n.o.name
                tag = (
                    pred_dt.get(const_lex(n.p))
                    if (n.p is not None and is_const(n.p))
                    else None
                )
                if tag in _NATIVE_CASTS:
                    bind_tags.setdefault(v, set()).add(tag)
                else:
                    disq.add(v)
            return
        if isinstance(n, A.BGP):
            for sp in n.patterns:
                walk(sp)
        elif isinstance(n, (A.Join, A.Union2, A.Minus)):
            walk(n.left)
            walk(n.right)
        elif isinstance(n, A.LeftJoin):
            walk(n.left)
            walk(n.right)
            if n.condition is not None:
                note_opaque(n.condition)
        elif isinstance(n, A.Filter):
            note_opaque(n.condition)
            walk(n.child)
        elif isinstance(n, A.Extend):
            disq.add(n.var)
            note_opaque(n.expr)
            walk(n.child)
        elif isinstance(n, A.Values):
            for row in n.rows:
                disq.update(row.keys())
            if n.child is not None:
                walk(n.child)
        elif isinstance(n, A.Exists):
            walk(n.child)
            walk(n.pattern)
        elif isinstance(n, A.ExistsFlag):
            disq.add(n.var)
            walk(n.child)
            walk(n.pattern)
        elif isinstance(n, A.Project):
            disq.update(n.vars)
            walk(n.child)
        elif isinstance(n, (A.Distinct, A.Slice, A.Dataset, A.DropCols)):
            walk(n.child)
        elif isinstance(n, A.OrderBy):
            for key, _asc in n.keys:
                if isinstance(key, str):
                    disq.add(key)
                else:
                    note_opaque(key)
            walk(n.child)
        elif isinstance(n, A.Group):
            for k in n.keys:
                if isinstance(k, str):
                    disq.add(k)
                else:
                    note_opaque(k)
            for _name, e in n.aggs:
                note_opaque(e)
            if n.having is not None:
                note_opaque(n.having)
            walk(n.child)
        elif isinstance(n, A.GraphScope):
            if isinstance(n.g, Var):
                disq.add(n.g.name)
            walk(n.child)
        elif isinstance(n, (A.Service, A.PathPattern)):
            disq.update(_all_sp_vars(n))  # these emit lexical bindings
        else:
            state["bail"] = True  # WithNamed / NamedInclude / unknown: bail

    spine = root
    while isinstance(spine, (A.Slice, A.OrderBy, A.Distinct, A.Dataset)):
        spine = spine.child
    if not isinstance(spine, (A.Project, A.Group)):
        return {}
    walk(root)
    if state["bail"]:
        return {}
    out: dict[str, str] = {}
    for v, tags in bind_tags.items():
        if v in disq or len(tags) != 1:
            continue
        tag = next(iter(tags))
        allowed = [c.format(v=v) for c in _NATIVE_CASTS[tag]]
        rx = re.compile(r"\b" + re.escape(v) + r"(\b|_)")
        ok = True
        for s in opaque:
            cleaned = s
            for a in allowed:
                cleaned = cleaned.replace(a, "")
            if rx.search(cleaned):
                ok = False
                break
        if ok:
            out[v] = tag
    return out


# ---------------------------------------------------------------- patterns --
# The engine's internal vocabulary spells well-known terms compactly
# (inference, blueprints, reification key on rdf:type / rdfs:subClassOf /
# owl:sameAs ...) while the RDF interchange readers and the parser's
# auto-declared prefixes produce the full IRIs — one TERM, two lexicals,
# exactly what the reference's Vocabulary classes normalize. Pattern
# matching and range counts treat the spellings as aliases of one term.
WELLKNOWN_NS = {
    "rdf:": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs:": "http://www.w3.org/2000/01/rdf-schema#",
    "owl:": "http://www.w3.org/2002/07/owl#",
    "xsd:": "http://www.w3.org/2001/XMLSchema#",
    "foaf:": "http://xmlns.com/foaf/0.1/",
    "dc:": "http://purl.org/dc/elements/1.1/",
}
RDF_TYPE_ALIASES = (
    "rdf:type",
    "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
)


def _pred_aliases(p: str) -> tuple[str, ...]:
    for pfx, ns in WELLKNOWN_NS.items():
        if p.startswith(pfx):
            return (p, ns + p[len(pfx):])
        if p.startswith(ns):
            return (pfx + p[len(ns):], p)
    return (p,)


DT_SID = "sid"  # datatype tag of an embedded-statement term in object position


def sid_expr() -> F.Column:
    """Statement-id lexical for the current row's (s,p,o_lex,o_dt) — the
    RDR/RDF-star statement identifier (ref: SidIV.java). Deterministic string
    encoding so both Spark and a SQL oracle compute identical ids."""
    return F.concat(
        F.lit("<<"), F.col("s"), F.lit("|"), F.col("p"), F.lit("|"),
        F.col("o_lex"), F.lit("|"), F.col("o_dt"), F.lit(">>"),
    )


def _sid_inner_df(emb: "A.Emb", store: TripleStore, alias: str) -> DataFrame:
    """Compile the inner pattern of `<<s p o>>`: bindings for its vars plus
    the statement-id column `alias` used to join with the metadata pattern."""
    df = store.df
    conds = []
    for col, pos in (("s", emb.s), ("p", emb.p), ("o_lex", emb.o)):
        if pos is not None and is_const(pos):
            conds.append(F.col(col) == const_lex(pos))
            if col == "o_lex":
                conds.append(F.col("o_dt") == (pos.dt if isinstance(pos, Lit) else "iri"))
    for c in conds:
        df = df.filter(c)
    sel, seen = [sid_expr().alias(alias)], {}
    for col, pos in (("s", emb.s), ("p", emb.p), ("o_lex", emb.o)):
        if isinstance(pos, Var):
            if pos.name in seen:
                df = df.filter(F.col(col) == F.col(seen[pos.name]))
            else:
                seen[pos.name] = col
                sel.append(F.col(col).alias(pos.name))
                if col == "o_lex" and store.track_dt:
                    sel.append(
                        F.when(F.col("o_dt") == "bnode", F.lit("iri"))
                        .otherwise(F.col("o_dt"))
                        .alias(f"{pos.name}__dt")
                    )
    return df.select(*sel)


def _emb_pattern_df(sp: A.SP, store: TripleStore) -> DataFrame:
    """Pattern with an embedded-statement term: compile the outer pattern
    with the sid as a hidden var, then equi-join the inner statement scan on
    the sid (plus any shared vars — SPARQL-star join semantics)."""
    subj = Var("__sid_s") if isinstance(sp.s, A.Emb) else sp.s
    obj = Var("__sid_o") if isinstance(sp.o, A.Emb) else sp.o
    out = _pattern_df(A.SP(subj, sp.p, obj, sp.g), store)
    for hidden, pos in (("__sid_s", sp.s), ("__sid_o", sp.o)):
        if isinstance(pos, A.Emb):
            inner = _sid_inner_df(pos, store, hidden)
            on = sorted(set(out.columns) & set(inner.columns))
            out = out.join(inner, on=on).drop(hidden, f"{hidden}__dt")
    return out


# Cached Column singletons for the pattern compiler's hot path. Every
# Column build is a py4j roundtrip bundle and _pattern_df runs once per
# triple pattern per query — plan-BUILD time is part of query cost in this
# engine (docs/scale_notes.md "Plan-build discipline"). Columns are
# immutable expression trees, safe to reuse across DataFrames; built
# lazily because the gateway may not exist at import time.
_CCACHE: dict = {}


def _ccache() -> dict:
    """The Column cache, invalidated when the active SparkContext changes:
    cached Columns hold py4j refs into a specific gateway, and a JVM
    restart in the same process would leave them pointing at a dead one
    (ADVICE r11). The identity check is pure-python, no roundtrip."""
    from pyspark import SparkContext

    tag = id(SparkContext._active_spark_context)
    if _CCACHE.get("__ctx") != tag:
        _CCACHE.clear()
        _CCACHE["__ctx"] = tag
    return _CCACHE


def _cc(name: str) -> Column:
    cache = _ccache()
    c = cache.get(name)
    if c is None:
        c = cache[name] = F.col(name)
    return c


def _dt_norm() -> Column:
    """bnode→iri-normalized o_dt (see the companion-binding comment below),
    built once: the 4-op when/otherwise chain costs ~14 roundtrips a call."""
    cache = _ccache()
    c = cache.get("__dt_norm")
    if c is None:
        c = cache["__dt_norm"] = (
            F.when(F.col("o_dt") == "bnode", F.lit("iri")).otherwise(F.col("o_dt"))
        )
    return c


def _iri_lit() -> Column:
    cache = _ccache()
    c = cache.get("__iri_lit")
    if c is None:
        c = cache["__iri_lit"] = F.lit("iri")
    return c


def _pattern_df(sp: A.SP, store: TripleStore) -> DataFrame:
    if isinstance(sp.s, A.Emb) or isinstance(sp.o, A.Emb):
        return _emb_pattern_df(sp, store)
    df = None
    native = getattr(store, "native_typed_vars", {})
    if sp.p is not None and is_const(sp.p):
        aliases = _pred_aliases(const_lex(sp.p))
        stats = store._stats
        known = (
            next((stats[a] for a in aliases if a in stats and stats[a].count > 0), None)
            if stats is not None
            else None
        )
        if stats is not None and known is None:
            # Unknown-term shortcut (ref: ast/optimizers/
            # ASTUnknownTermOptimizer.java): a constant predicate absent
            # from the store's range counts (or counted 0 — the counts are
            # exact or UPPER bounds, never under) has zero triples, so the
            # pattern is provably empty. limit(0) folds to an empty local
            # relation — no union build, no scan.
            df = store.df.limit(0)
        elif sp.g is None:
            # When exactly one alias spelling is live in the store, its
            # virtual POS index serves the pattern; with both spellings
            # present (or no stats to tell) the union scan + alias filter
            # below matches them all.
            live = [a for a in aliases if stats is not None and a in stats and stats[a].count > 0]
            src_pred = live[0] if len(live) == 1 else (
                aliases[0] if len(aliases) == 1 else None
            )
            if src_pred is not None:
                # typed=True serves the object column in its native parquet
                # type for vars the classifier proved are consumed only
                # through typed casts
                typed = isinstance(sp.o, Var) and sp.o.name in native
                df = store.pattern_source(src_pred, typed=typed)  # virtual POS index
    if df is None:
        df = store.df
    cols = df.columns  # one schema fetch; consulted up to three times below
    conds = []
    for col, pos in (("s", sp.s), ("p", sp.p), ("o_lex", sp.o)):
        if pos is not None and is_const(pos):
            if col == "p":
                al = _pred_aliases(const_lex(pos))
                conds.append(
                    _cc("p").isin(list(al)) if len(al) > 1 else _cc("p") == al[0]
                )
                continue
            if col == "o_lex" and not isinstance(pos, Lit):
                # constant IRI object: well-known compact/full spellings are
                # one term (same alias layer as predicates)
                oal = _pred_aliases(const_lex(pos))
                conds.append(
                    _cc("o_lex").isin(list(oal)) if len(oal) > 1
                    else _cc("o_lex") == oal[0]
                )
            else:
                conds.append(_cc(col) == const_lex(pos))
            if col == "o_lex":
                # Term identity includes the type: a constant Lit matches only
                # its datatype, a constant IRI (str/IRI per terms.py) matches
                # only IRI terms — otherwise a string literal with the same
                # lexical form conflates with the IRI (ADVICE round 1).
                conds.append(_cc("o_dt") == (pos.dt if isinstance(pos, Lit) else "iri"))
    if sp.g is not None and is_const(sp.g):
        conds.append(_cc("g") == const_lex(sp.g))
    # FROM / FROM NAMED dataset scoping (ref: DatasetNode). An EMPTY
    # concrete set means "match nothing" (FROM without FROM NAMED leaves
    # the named-graph set empty, and vice versa) — not "unrestricted".
    if "g" in cols:
        dd = getattr(store, "dataset_default", None)
        dn = getattr(store, "dataset_named", None)
        if sp.g is None and dd is not None:
            conds.append(_cc("g").isin(list(dd)) if dd else F.lit(False))
        if isinstance(sp.g, Var) and dn is not None:
            conds.append(_cc("g").isin(list(dn)) if dn else F.lit(False))
    if conds:
        # ONE fused filter instead of a filter chain: each df.filter is a
        # full Dataset construction over py4j (~40 roundtrips); the fused
        # conjunction produces the identical Filter(And(...)) plan (r11)
        allc = conds[0]
        for c in conds[1:]:
            allc = allc & c
        df = df.filter(allc)
    if (
        sp.g is None and "g" in cols and store.has_graphs
        and getattr(store, "default_graph_distinct", True)
    ):
        # DEFAULT-graph pattern over a quad store: the default graph is the
        # RDF MERGE of the graphs — dedup at the TRIPLE level (the
        # reference's distinct-SPO access path; fixtures default-graphs-01j
        # / default-graph-joins-01: a triple asserted in two graphs is ONE
        # triple), never at the projected-binding level (two DIFFERENT
        # triples binding the same var value stay two solutions)
        df = df.dropDuplicates(["s", "p", "o_lex", "o_dt"])
    sel, seen = [], {}
    id_vars = getattr(store, "id_join_vars", frozenset())
    for col, pos in (("s", sp.s), ("p", sp.p), ("o_lex", sp.o), ("g", sp.g)):
        if isinstance(pos, Var):
            if pos.name in seen:  # repeated var within one pattern: equality filter
                df = df.filter(_cc(col) == _cc(seen[pos.name]))
            elif pos.name in id_vars:
                # pure join key: bind the 64-bit term id, never the string —
                # downstream joins shuffle longs (TERM2ID discipline)
                seen[pos.name] = col
                sel.append(term_id(_cc(col)).alias(f"{pos.name}__id"))
            elif pos.name in native and col == "o_lex":
                # native-typed binding (inline-IV analog): cast to the tag's
                # type — a no-op Catalyst erases when the typed virtual
                # source already served the native column, the one
                # string→numeric conversion otherwise (melted fallback)
                seen[pos.name] = col
                sel.append(
                    _cc(col).cast(_NATIVE_SPARK_TYPE[native[pos.name]]).alias(pos.name)
                )
                if store.track_dt:
                    sel.append(_dt_norm().alias(f"{pos.name}__dt"))
            else:
                seen[pos.name] = col
                sel.append(_cc(col).alias(pos.name))
                if store.track_dt:
                    if col == "o_lex":
                        # companions are BGP join keys (term identity
                        # includes the datatype), so the bnode tag — which
                        # some readers emit as 'bnode', others as 'iri' —
                        # normalizes to 'iri' here; the `_:` lexical prefix
                        # keeps bnodes distinguishable (isBlank checks it)
                        sel.append(_dt_norm().alias(f"{pos.name}__dt"))
                    else:  # subject / predicate / graph vars: iri space
                        # (bnode subjects carry the `_:` lexical; tagging
                        # them 'iri' matches the normalized object tag so
                        # subject-object joins on a shared var agree)
                        sel.append(_iri_lit().alias(f"{pos.name}__dt"))
    return df.select(*sel)


def _estimate(sp: A.SP, store: TripleStore) -> float:
    st = store.stats()
    if is_const(sp.p):
        ps = st.get(const_lex(sp.p))
        if ps is None:
            return 0.0
        est = float(ps.count)
        if is_const(sp.s):
            est /= ps.n_distinct_s
        if is_const(sp.o):
            est /= ps.n_distinct_o
        return max(est, 1.0)
    total = float(sum(s.count for s in st.values()))
    if is_const(sp.s) or is_const(sp.o):
        return max(total / 1000.0, 1.0)
    return total


def _vars_of(sp: A.SP) -> set[str]:
    out = set()
    for p in (sp.s, sp.p, sp.o, sp.g):
        if isinstance(p, Var):
            out.add(p.name)
        elif isinstance(p, A.Emb):  # vars inside <<s p o>> join like any other
            out |= _vars_of(A.SP(p.s, p.p, p.o))
    return out


def _star_fuse(patterns: list, store: TripleStore):
    """Collapse same-subject-variable patterns whose constant predicates live
    in one base table into a single column-pruned scan (subject star-join
    fusion; the SPO-index analog of the reference's subject-ordered access
    path). Returns (fused entries [(df, est, vars)], leftover pattern idxs).

    Eligible: ?s <constP> ?o with distinct object vars, no graph term. At
    100 TB this turns an N-pattern star over the fact table from N scans +
    N-1 self-join shuffles into one scan of N+1 columns.
    """
    if not (store.star_factory and store.pred_table):
        return [], list(range(len(patterns)))
    groups: dict = {}
    for i, sp in enumerate(patterns):
        if (
            isinstance(sp.s, Var)
            and sp.p is not None
            and is_const(sp.p)
            and isinstance(sp.o, Var)
            and sp.g is None
            and sp.o.name != sp.s.name
            and const_lex(sp.p) in store.pred_table
        ):
            key = (sp.s.name, store.pred_table[const_lex(sp.p)])
            groups.setdefault(key, []).append(i)
    fused, taken = [], set()
    stats = store.stats()
    for (svar, _table), idxs in groups.items():
        uniq, seen_o = [], set()
        for i in idxs:  # one pattern per object var; dupes stay join-based
            if patterns[i].o.name not in seen_o:
                seen_o.add(patterns[i].o.name)
                uniq.append(i)
        if len(uniq) < 2:
            continue
        preds = [const_lex(patterns[i].p) for i in uniq]
        if store.track_dt and not (store.pred_dt and all(p in store.pred_dt for p in preds)):
            continue  # need per-pred dt tags to bind companions; join path handles it
        native = getattr(store, "native_typed_vars", {})
        native_preds = frozenset(
            const_lex(patterns[i].p) for i in uniq if patterns[i].o.name in native
        )
        from blazegraph_database_spark.model.store import _accepts_kwarg

        if _accepts_kwarg(store.star_factory, "native"):
            df = store.star_factory(preds, native=native_preds)
        else:  # star factory without native support
            df = store.star_factory(preds)
        if df is None:
            continue
        id_vars = getattr(store, "id_join_vars", frozenset())

        def var_col(col: F.Column, vname: str) -> F.Column:
            if vname in id_vars:
                return term_id(col).alias(f"{vname}__id")
            if vname in native:
                # cast is a Catalyst no-op when the factory served the
                # native column, the single conversion otherwise
                return col.cast(_NATIVE_SPARK_TYPE[native[vname]]).alias(vname)
            return col.alias(vname)

        sel = [var_col(F.col("s"), svar)] + [
            var_col(F.col(p), patterns[i].o.name) for p, i in zip(preds, uniq)
        ]
        if store.track_dt:
            sel += [
                F.lit(store.pred_dt[p]).alias(f"{patterns[i].o.name}__dt")
                for p, i in zip(preds, uniq)
                if patterns[i].o.name not in id_vars
            ]
            if svar not in id_vars:
                # same normalized tag as _pattern_df's subject branch
                sel.append(F.lit("iri").alias(f"{svar}__dt"))
        ests = [float(stats[p].count) for p in preds if p in stats]
        est = max(ests) if ests else float("inf")
        fused.append((df.select(*sel), est, {svar, *seen_o}))
        taken.update(uniq)
    return fused, [i for i in range(len(patterns)) if i not in taken]


_RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
_REIF_SCAFFOLD = {
    _RDF_NS + "subject": "s",
    _RDF_NS + "predicate": "p",
    _RDF_NS + "object": "o",
}


def _rewrite_reif_scaffold(patterns: list, store: TripleStore) -> list:
    """Reification-Done-Right query rewrite (ref: the reference's RDR mode,
    TestReificationDoneRightEval rdr-05a — a query written in the EXPANDED
    reification vocabulary answers against a sid store): a variable ?stmt
    carrying rdf:subject/rdf:predicate/rdf:object scaffold patterns folds
    into an embedded-statement term replacing ?stmt in the metadata
    patterns' subject position. Applies ONLY when the store holds no
    rdf:subject triples (exact range counts) — a store with real expanded
    reification keeps matching it directly."""
    groups: dict = {}
    for sp in patterns:
        if (
            isinstance(sp, A.SP)
            and isinstance(sp.s, Var)
            and sp.p is not None
            and is_const(sp.p)
            and const_lex(sp.p) in _REIF_SCAFFOLD
        ):
            groups.setdefault(sp.s.name, {})[_REIF_SCAFFOLD[const_lex(sp.p)]] = sp.o
    if not groups:
        return patterns
    stats = store.stats()
    st = stats.get(_RDF_NS + "subject")
    if st is not None and st.count > 0:
        return patterns
    complete = {v: g for v, g in groups.items() if len(g) == 3}
    # a statement var used outside subject position can't be folded away
    for sp in patterns:
        if isinstance(sp, A.SP):
            for pos in (sp.p, sp.o, sp.g):
                if isinstance(pos, Var):
                    complete.pop(pos.name, None)
    if not complete:
        return patterns
    out = []
    for sp in patterns:
        if not isinstance(sp, A.SP):
            out.append(sp)
            continue
        if isinstance(sp.s, Var) and sp.s.name in complete:
            pred = const_lex(sp.p) if sp.p is not None and is_const(sp.p) else None
            if pred in _REIF_SCAFFOLD:
                continue  # folded into the Emb term
            if pred in (_RDF_NS + "type",) and is_const(sp.o) and const_lex(
                sp.o
            ) in (_RDF_NS + "Statement",):
                continue  # the rdf:type rdf:Statement marker
            g = complete[sp.s.name]
            out.append(A.SP(A.Emb(g["s"], g["p"], g["o"]), sp.p, sp.o, sp.g))
            continue
        out.append(sp)
    return out


def _compile_bgp(node: A.BGP, store: TripleStore) -> DataFrame:
    """Greedy selectivity-ordered join, broadcast for small inputs.

    Mirrors the reference's static join optimizer: seed with the most
    selective input, then repeatedly take the cheapest input that shares a
    variable with the bound set (cartesian only as a last resort). Inputs
    are star-fused scans (see _star_fuse) plus the remaining patterns.
    """
    patterns = list(node.patterns)
    if not patterns:
        # SPARQL: the empty group pattern has exactly ONE solution, the
        # empty solution — so `BIND`/`VALUES`-only groups work (ref:
        # GroupGraphPattern with no members evaluates to a unit solution).
        return store.spark.range(1).select()
    patterns = _rewrite_reif_scaffold(patterns, store)
    hints = getattr(node, "hints", None)
    # join-order hints only; "alp" keys parameterize the ALP service and
    # don't affect an ordinary BGP compile
    if hints and (hints.get("optimizer") or hints.get("run_first") or hints.get("run_last")):
        return _compile_bgp_hinted(patterns, hints, store)
    entries, leftover = _star_fuse(patterns, store)
    n_fused = len(entries)
    for i in leftover:
        sp = patterns[i]
        entries.append((_pattern_df(sp, store), _estimate(sp, store), _vars_of(sp)))
    entries.sort(key=lambda e: e[1])
    ordered = [entries.pop(0)]
    bound = set(ordered[0][2])
    while entries:
        joinable = [i for i, e in enumerate(entries) if e[2] & bound]
        idx = joinable[0] if joinable else 0
        ordered.append(entries.pop(idx))
        bound |= ordered[-1][2]
    trace = getattr(store, "_trace", None)
    if trace is not None:
        trace.append(
            {
                "op": "BGP",
                "n_patterns": len(patterns),
                "star_fused_scans": n_fused,
                "join_order": [
                    {
                        "vars": sorted(vs),
                        "est_rows": est,
                        "broadcast": bool(k > 0 and est <= BROADCAST_MAX_ROWS),
                    }
                    for k, (_df, est, vs) in enumerate(ordered)
                ],
                "id_join_vars": sorted(getattr(store, "id_join_vars", ())),
                "native_typed_vars": dict(
                    sorted(getattr(store, "native_typed_vars", {}).items())
                ),
            }
        )
    out = None
    for df, est, _ in ordered:
        if est <= BROADCAST_MAX_ROWS and out is not None:
            df = F.broadcast(df)
        if out is None:
            out = df
        else:
            shared = sorted(set(out.columns) & set(df.columns))
            out = out.join(df, on=shared) if shared else out.crossJoin(df)
    return out


# Runtime-optimizer measurement bound: a pattern's cardinality probe stops
# counting at this many rows — the probe cost is capped regardless of store
# size, mirroring the reference RTO's cutoff sampling (JGraph.java limits
# each sampled join path the same way).
RTO_SAMPLE_CAP = 100_000


def _measured_estimate(sp: A.SP, store: TripleStore) -> float:
    """Actual (capped) cardinality of one pattern's scan — the RTO's sample
    step. The count runs on the column-pruned virtual-index scan with
    constant filters pushed down, so it reads one predicate's column(s),
    not the store; the LIMIT keeps it bounded at 100 TB."""
    df = _pattern_df(sp, store)
    return float(df.limit(RTO_SAMPLE_CAP + 1).count())


# Join-path sampling bounds (ref JGraph: limited cutoff sampling per edge of
# the join graph): each pairwise probe joins a bounded head-sample of each
# side; path sampling only runs for graphs small enough that the probe cost
# (≤ k·(k-1)/2 bounded join jobs) stays trivially driver-bounded.
RTO_PAIR_SAMPLE = 2_000
RTO_MAX_SAMPLED_PATTERNS = 8
# How many of the best-estimated candidate extensions get an ACTUAL
# prefix-join probe per greedy step (JGraph evaluates every one-step path
# extension with a cutoff sample; probing only the top few keeps planning
# to O(k·probes) bounded jobs while still catching correlated predicates
# the edge-selectivity product misses).
RTO_EXT_PROBES = 3


def _sampled_pair_rows(dfa: DataFrame, dfb: DataFrame) -> float | None:
    """Cutoff-sampled output size of one join-graph edge (JGraph's edge
    sample): join a bounded head-sample of each side on their shared
    columns. None when the pair shares no variable (no edge)."""
    shared = sorted(set(dfa.columns) & set(dfb.columns))
    if not shared:
        return None
    sa, sb = dfa.limit(RTO_PAIR_SAMPLE), dfb.limit(RTO_PAIR_SAMPLE)
    return float(sa.join(sb, on=shared).limit(RTO_SAMPLE_CAP + 1).count())


def _rto_order(entries: list, trace: list | None) -> list:
    """Selinger-lite greedy over SAMPLED join selectivities (the runtime
    query optimizer's core; ref: bop/joinGraph/rto/JGraph.java — the
    reference samples join paths with cutoffs and picks the cheapest
    expansion; we sample each edge once and expand greedily by estimated
    intermediate cardinality).

    ``entries``: [(df, measured_card, vars)]. Returns the reordered list.
    """
    k = len(entries)
    # edge selectivities from bounded pairwise probes
    sel: dict[tuple[int, int], float] = {}
    for i in range(k):
        for j in range(i + 1, k):
            out = _sampled_pair_rows(entries[i][0], entries[j][0])
            if out is None:
                continue
            na = max(min(entries[i][1], RTO_PAIR_SAMPLE), 1.0)
            nb = max(min(entries[j][1], RTO_PAIR_SAMPLE), 1.0)
            # zero sampled matches still means "very selective", not
            # impossible — clamp to one-match-in-the-sample
            sel[(i, j)] = max(out, 1.0) / (na * nb)
    start = min(range(k), key=lambda i: entries[i][1])
    chosen, remaining = [start], [i for i in range(k) if i != start]
    cur_est = entries[start][1]
    prefix_df = entries[start][0]
    est_path = [cur_est]
    ext_trace: list = []
    while remaining:
        ests: list[tuple[float, int, bool]] = []  # (est, idx, has_edge)
        for idx in remaining:
            edges = [
                sel[tuple(sorted((idx, c)))]
                for c in chosen
                if tuple(sorted((idx, c))) in sel
            ]
            if edges:
                # most selective sampled edge bounds the join output
                est = cur_est * entries[idx][1] * min(edges)
            else:
                est = cur_est * entries[idx][1]  # cartesian: maximally costly
            ests.append((est, idx, bool(edges)))
        ests.sort()
        # longer-prefix probes (JGraph's path evaluation proper: sample the
        # ACTUAL prefix⋈candidate output, not just the edge product — a
        # correlated filter can make the true extension orders of magnitude
        # off the pairwise estimate). Probe the top few edge-connected
        # candidates against the materialized prefix sample; cartesian
        # candidates keep their penalty estimate.
        probed: list[tuple[float, int]] = []
        psample = prefix_df.limit(RTO_PAIR_SAMPLE)
        for est, idx, has_edge in ests[:RTO_EXT_PROBES]:
            if not has_edge or len(remaining) <= 1:
                continue
            shared = sorted(set(prefix_df.columns) & set(entries[idx][0].columns))
            rows = float(
                psample.join(entries[idx][0].limit(RTO_PAIR_SAMPLE), on=shared)
                .limit(RTO_SAMPLE_CAP + 1)
                .count()
            )
            probed.append((rows, idx))
        if probed:
            probed.sort()
            best = probed[0][1]
            best_est = next(e for e, i, _ in ests if i == best)
            ext_trace.append({str(i): r for r, i in probed})
        else:
            best_est, best, _ = ests[0]
        chosen.append(best)
        remaining.remove(best)
        # measured-prefix refinement (the RTO's path evaluation: JGraph
        # expands the chosen path and SAMPLES its actual cardinality with a
        # cutoff rather than trusting the cascaded estimate): one bounded
        # count of the real prefix join feeds the next expansion decision
        bd = entries[best][0]
        shared = sorted(set(prefix_df.columns) & set(bd.columns))
        prefix_df = prefix_df.join(bd, on=shared) if shared else prefix_df.crossJoin(bd)
        if remaining:  # the last prefix is the full query: never pre-run it
            # materialize the CUTOFF SAMPLE of the prefix (JGraph keeps
            # exactly this bounded sample per path) so each step adds ONE
            # join to a materialized sample instead of re-running the whole
            # accumulated prefix — O(k) planning joins, not O(k^2)
            prefix_df = prefix_df.limit(RTO_SAMPLE_CAP + 1).localCheckpoint(eager=True)
            cur_est = float(prefix_df.count())
        else:
            cur_est = best_est
        est_path.append(cur_est)
    if trace is not None:
        trace.append(
            {
                "op": "RTO",
                "sampled_edges": {
                    f"{i}-{j}": round(s, 9) for (i, j), s in sorted(sel.items())
                },
                "order": chosen,
                "measured_prefix_path": [round(e, 1) for e in est_path],
                "ext_probe_rows": ext_trace,
            }
        )
    return [entries[i] for i in chosen]


def _compile_bgp_hinted(patterns: list, hints: dict, store: TripleStore) -> DataFrame:
    """Query-hint-directed BGP join (ref: ASTQueryHintOptimizer — hints
    override the static optimizer): runFirst patterns lead, runLast
    trail, everything else keeps written order (which is exactly
    `hint:optimizer "None"` when no run hints are set). Broadcast of
    small inputs still applies — that is a physical choice, not a join
    order.

    ``hint:optimizer "Runtime"`` instead orders by RUNTIME measurement —
    the analog of the reference's runtime query optimizer (ref:
    bop/joinGraph/rto/JGraph.java): one bounded count per pattern over the
    column-pruned scan, then (for join graphs of ≤ RTO_MAX_SAMPLED_PATTERNS
    patterns) one bounded join probe per join-graph edge, feeding a
    Selinger-lite greedy expansion over the sampled selectivities. Larger
    graphs keep the measured-cardinality greedy (probe cost stays linear)."""
    if hints.get("optimizer") == "Runtime":
        entries = [
            (_pattern_df(sp, store), _measured_estimate(sp, store), _vars_of(sp))
            for sp in patterns
        ]
        trace = getattr(store, "_trace", None)
        if len(entries) <= RTO_MAX_SAMPLED_PATTERNS and len(entries) > 2:
            ordered = _rto_order(entries, trace)
        else:
            entries.sort(key=lambda e: e[1])
            ordered = [entries.pop(0)]
            bound = set(ordered[0][2])
            while entries:
                joinable = [i for i, e in enumerate(entries) if e[2] & bound]
                idx = joinable[0] if joinable else 0
                ordered.append(entries.pop(idx))
                bound |= ordered[-1][2]
        out = None
        for df, est, _ in ordered:
            # a probe that hit the cap means "at least cap+1 rows" — only
            # exactly-measured small inputs qualify for broadcast
            if est <= RTO_SAMPLE_CAP and out is not None:
                df = F.broadcast(df)
            if out is None:
                out = df
            else:
                shared = sorted(set(out.columns) & set(df.columns))
                out = out.join(df, on=shared) if shared else out.crossJoin(df)
        return out
    rf = hints.get("run_first") or frozenset()
    rl = hints.get("run_last") or frozenset()
    order = sorted(
        range(len(patterns)),
        key=lambda i: (0 if i in rf else (2 if i in rl else 1), i),
    )
    out = None
    for i in order:
        sp = patterns[i]
        df, est = _pattern_df(sp, store), _estimate(sp, store)
        if out is None:
            out = df
            continue
        if est <= BROADCAST_MAX_ROWS:
            df = F.broadcast(df)
        shared = sorted(set(out.columns) & set(df.columns))
        out = out.join(df, on=shared) if shared else out.crossJoin(df)
    return out


# ---------------------------------------------------------------- dispatch --
@singledispatch
def _compile(node, store: TripleStore) -> DataFrame:
    raise TypeError(f"cannot compile {type(node).__name__}")


@_compile.register
def _(node: A.SP, store: TripleStore) -> DataFrame:
    return _pattern_df(node, store)


@_compile.register
def _(node: A.BGP, store: TripleStore) -> DataFrame:
    magic, rest = _split_bds_magic(node.patterns)
    geo_magic, rest = _split_geo_magic(rest)
    if geo_magic:
        # Inline geospatial magic predicates, no SERVICE wrapper (ref:
        # ASTGeoSpatialOptimizer lifts geo:search groups out of the BGP
        # into GeoSpatialServiceFactory — the reference's own eval
        # fixtures TestGeoSpatialServiceEvaluation use this form).
        from blazegraph_database_spark.operators import service as _svc

        out = None
        idv = getattr(store, "id_join_vars", frozenset())
        deferred = []
        for _var, pats in geo_magic.items():
            if _svc.geo_param_vars(pats):
                # VARIABLE service params (e.g. geo:spatialCircleCenter
                # ?center bound by a sibling pattern — ticket_bg1899's
                # inline form): resolve per distinct sibling binding, same
                # machinery as SERVICE <geo:search>
                deferred.append(pats)
                continue
            hits = _svc.geo_search_service(store, pats)
            for c in list(hits.columns):
                if c in idv:
                    hits = hits.withColumn(f"{c}__id", term_id(F.col(c)))
            out = hits if out is None else out.crossJoin(hits)
        remainder = (
            _compile(A.BGP(rest + sum(magic.values(), []), hints=node.hints), store)
            if rest or magic
            else None
        )
        if remainder is not None:
            if out is None:
                out = remainder
            else:
                shared = sorted(set(remainder.columns) & set(out.columns))
                out = remainder.join(out, on=shared) if shared else remainder.crossJoin(out)
        for pats in deferred:
            if out is None:
                raise ValueError(
                    "geo:search: a variable service parameter needs a "
                    "sibling pattern in the same group binding it"
                )
            out = _geo_param_join(store, out, pats)
            for c in list(out.columns):
                if c in idv and not c.endswith("__id") and f"{c}__id" not in out.columns:
                    out = out.withColumn(f"{c}__id", term_id(F.col(c)))
        return out
    if magic:
        # Inline magic-predicate full-text search, the form Blazegraph
        # queries actually use (`?lit bds:search "q" . ?lit bds:relevance
        # ?s . ?subj ?p ?lit`, no SERVICE wrapper; ref: BDS.java vocabulary
        # + ASTSearchOptimizer.java lifting magic triples out of the BGP).
        # Contract per the reference's own eval fixtures: the search var
        # binds the MATCHED LITERAL, which then joins object-position
        # patterns naturally.
        out = None
        idv = getattr(store, "id_join_vars", frozenset())
        for var, pats in magic.items():
            # GRAPH-scoped search (the SPs carry g after _push_graph /
            # GRAPH <g>): a hit counts once per graph holding the matched
            # literal, binding/filtering the graph term and honoring the
            # FROM NAMED set — ref: the search service runs against the
            # statements visible in the GRAPH scope. The index itself must
            # build over the NAMED view then: under `FROM NAMED :g1` the
            # default graph is empty but :g1's literals stay searchable
            # (search-named-graphs2/4/5).
            gterm = next((sp.g for sp in pats if sp.g is not None), None)
            hits = _bds_inline_search(
                store, pats, named_scope=gterm is not None and store.has_graphs
            )
            if gterm is not None and store.has_graphs:
                pairs = (
                    store.df.filter(F.col("o_dt") == "string")
                    .select("g", F.col("o_lex").alias(var))
                    .distinct()
                )
                if is_const(gterm):
                    pairs = pairs.filter(F.col("g") == const_lex(gterm)).drop("g")
                else:
                    dn = getattr(store, "dataset_named", None)
                    if dn is not None:
                        pairs = pairs.filter(
                            F.col("g").isin(list(dn)) if dn else F.lit(False)
                        )
                    pairs = pairs.withColumnRenamed("g", gterm.name)
                hits = hits.join(pairs, on=var)
            for c in list(hits.columns):
                # pure-join vars ride shuffles as 64-bit term ids — the
                # search output must offer the same companion the rest of
                # the BGP joins on
                if c in idv:
                    hits = hits.withColumn(f"{c}__id", term_id(F.col(c)))
            out = hits if out is None else out.crossJoin(hits)
        if rest:
            rdf = _compile_bgp(A.BGP(rest, hints=node.hints), store)
            shared = sorted(set(rdf.columns) & set(out.columns))
            out = rdf.join(out, on=shared) if shared else rdf.crossJoin(out)
        return out
    return _compile_bgp(node, store)


def _split_geo_magic(patterns):
    """Partition a BGP's patterns into inline geospatial magic groups
    {search_var: [sps]} and the ordinary remainder (ref:
    ASTGeoSpatialOptimizer — magic triples whose predicate lives in the
    geo: namespace route to the geospatial service without a SERVICE
    wrapper). A group triggers only when its subject var receives a
    geo:search / geo:predicate param."""
    from blazegraph_database_spark.operators.service import _geo_local

    def geo_pred(sp) -> str | None:
        if not (isinstance(sp, A.SP) and sp.p is not None and is_const(sp.p)):
            return None
        return _geo_local(const_lex(sp.p))

    trigger_vars = {
        sp.s.name
        for sp in patterns
        if geo_pred(sp) in ("search", "predicate") and isinstance(sp.s, Var)
    }
    geo: dict[str, list] = {}
    rest = []
    for sp in patterns:
        if (
            geo_pred(sp) is not None
            and isinstance(sp.s, Var)
            and sp.s.name in trigger_vars
        ):
            geo.setdefault(sp.s.name, []).append(sp)
        else:
            rest.append(sp)
    return geo, rest


def _split_bds_magic(patterns):
    """Partition a BGP's patterns into {search_var: [magic sps]} and the
    ordinary remainder. A bds:* pattern whose subject never receives a
    bds:search is an error (the reference's ASTSearchOptimizer rejects
    orphan magic triples)."""
    magic: dict[str, list] = {}
    rest: list = []
    search_vars = {
        sp.s.name
        for sp in patterns
        if isinstance(sp, A.SP)
        and sp.p is not None
        and is_const(sp.p)
        and _compact_builtin_iri(const_lex(sp.p)) == "bds:search"
        and isinstance(sp.s, Var)
    }
    for sp in patterns:
        pred = (
            _compact_builtin_iri(const_lex(sp.p))
            if isinstance(sp, A.SP) and sp.p is not None and is_const(sp.p)
            else None
        )
        if pred is not None and pred.startswith("bds:"):
            if not (isinstance(sp.s, Var) and sp.s.name in search_vars):
                raise ValueError(
                    f"magic predicate {pred} without a bds:search on its subject"
                )
            magic.setdefault(sp.s.name, []).append(sp)
        else:
            rest.append(sp)
    return magic, rest


def _dataset_scoped_df(store: TripleStore, named_scope: bool = False) -> DataFrame:
    """The store's statements restricted to its FROM dataset (if any) —
    every full-text surface builds over THIS view so a search under
    FROM <g> never sees other graphs' literals (search-named-graphs10).

    ``named_scope``: a search INSIDE a GRAPH pattern sees the dataset's
    NAMED graphs, not the default graph — under `FROM NAMED :g1` the
    default graph is EMPTY but `GRAPH ?g { ?lit bds:search ... }` must
    still find :g1's literals (search-named-graphs2/4/5)."""
    df = store.df
    if named_scope:
        dn = getattr(store, "dataset_named", None)
        if "g" in df.columns:
            df = df.filter(F.col("g").isNotNull() & (F.col("g") != ""))
            if dn is not None:
                df = df.filter(F.col("g").isin(list(dn)) if dn else F.lit(False))
        return df
    dd = getattr(store, "dataset_default", None)
    if dd is not None and "g" in df.columns:
        df = df.filter(F.col("g").isin(list(dd)) if dd else F.lit(False))
    return df


def _store_literal_value_index(store: TripleStore, named_scope: bool = False) -> DataFrame:
    """Full-text index over DISTINCT string-literal VALUES: doc id = the
    literal lexical itself, so a hit binds the matched literal (the
    reference's text index maps tokens to literal IVs; ref:
    search/FullTextIndex.java). Memoized on the store instance, one memo
    per dataset scope (default-graph vs GRAPH-pattern/NAMED view)."""
    from blazegraph_database_spark.operators import fulltext

    attr = "_ft_value_index_named" if named_scope else "_ft_value_index"
    cached = getattr(store, attr, None)
    if cached is None:
        docs = (
            _dataset_scoped_df(store, named_scope)
            .filter(F.col("o_dt") == "string")
            .select(F.col("o_lex").alias("s"))
            .distinct()
            .select("s", F.col("s").alias("text"))
        )
        cached = fulltext.inverted_index(docs, id_col="s", text_col="text").localCheckpoint()
        setattr(store, attr, cached)
    return cached


def _bds_inline_search(store: TripleStore, pats, named_scope: bool = False) -> DataFrame:
    """Evaluate one inline magic-predicate search group → DataFrame binding
    the search var to the matched literal plus any requested
    relevance/rank/rangeCount vars. Shares the option parser and filter
    closures with the SERVICE form."""
    from blazegraph_database_spark.operators import fulltext

    subj, query, opts = None, None, {}
    flags = {"match_exact": False, "match_regex": None}
    rel_var = rank_var = count_var = None
    for sp in pats:
        pred = _compact_builtin_iri(const_lex(sp.p))
        if pred == "bds:search":
            subj, query = sp.s, const_lex(sp.o)
        elif _parse_bds_common(sp, pred, opts, flags):
            pass
        elif pred == "bds:minRank":
            opts["min_rank"] = int(const_lex(sp.o))
        elif pred == "bds:relevance" and isinstance(sp.o, Var):
            rel_var = sp.o.name
        elif pred == "bds:rank" and isinstance(sp.o, Var):
            rank_var = sp.o.name
        elif pred == "bds:rangeCount" and isinstance(sp.o, Var):
            count_var = sp.o.name
        else:
            raise ValueError(f"unsupported inline search magic predicate {pred!r}")
    patterns = [
        (t.rstrip("*"), t.endswith("*") or flags.get("prefix_all", False))
        for t in query.split()
    ]

    def value_filter(scored):
        # matchExact/matchRegex run against the matched literal itself
        out = scored
        if flags["match_exact"]:
            out = out.filter(F.col("id").contains(query))
        if flags["match_regex"] is not None:
            out = out.filter(F.col("id").rlike(flags["match_regex"]))
        return out

    sf = value_filter if (flags["match_exact"] or flags["match_regex"]) else None
    hits = fulltext.search(
        _store_literal_value_index(store, named_scope), patterns, scored_filter=sf,
        count_col=count_var, scoring="cosine", **opts,
    )
    if count_var is not None:
        return hits.withColumn(subj.name, F.lit(None).cast("string"))
    sel = [F.col("id").alias(subj.name)]
    if rel_var is not None:
        sel.append((F.col("score_ppm").cast("double") / 1_000_000).alias(rel_var))
    if rank_var is not None:
        sel.append(F.col("rank").alias(rank_var))
    return hits.select(*sel)


def _flatten_join(n) -> list:
    if isinstance(n, A.Join):
        return _flatten_join(n.left) + _flatten_join(n.right)
    return [n]


def _is_label_service(c) -> bool:
    """SERVICE wikibase:label — correlates with the sibling solutions (the
    Wikidata deployment's label service; Wikidata runs the reference, so
    this is reference-deployment surface). Resolved in the Join spine like
    variable-endpoint services."""
    from blazegraph_database_spark.operators.service import WIKIBASE_LABEL_SERVICE

    return (
        isinstance(c, A.Service)
        and not isinstance(c.iri, Var)
        and c.iri == WIKIBASE_LABEL_SERVICE
    )


def _collect_sps(n) -> list:
    if isinstance(n, A.BGP):
        return list(n.patterns)
    if isinstance(n, A.Join):
        return _collect_sps(n.left) + _collect_sps(n.right)
    return [n] if isinstance(n, A.SP) else []


@_compile.register
def _(node: A.Join, store: TripleStore) -> DataFrame:
    # SERVICE ?var: the endpoint is a VARIABLE bound elsewhere in the join
    # conjunction (ref: ServiceCallJoin.java:386 — group the incoming
    # solutions by the distinct as-bound serviceRef values, call each
    # endpoint once). Join is associative/commutative, so the binding may
    # sit ANYWHERE in the flattened conjunct list, not just the direct
    # sibling — compile everything else first, then resolve each
    # variable-endpoint service against the joined solutions.
    from blazegraph_database_spark.operators import service

    conjuncts = _flatten_join(node)
    var_svcs = [
        c for c in conjuncts
        if isinstance(c, A.Service) and isinstance(c.iri, Var)
    ]
    lbl_svcs = [c for c in conjuncts if _is_label_service(c)]
    geo_svcs = [
        c for c in conjuncts
        if isinstance(c, A.Service) and not isinstance(c.iri, Var)
        and _compact_builtin_iri(c.iri) == "geo:search"
        and service.geo_param_vars(_collect_sps(c.pattern))
    ]
    if geo_svcs:
        # geo:search with VARIABLE params (e.g. spatialCircleCenter bound
        # by a sibling pattern — ticket_bg1899): resolve like SERVICE ?var
        # endpoints — evaluate the siblings, then run the service once per
        # DISTINCT as-bound param row (ref: ServiceCallJoin's grouping of
        # incoming solutions; bounded by the same endpoint guard)
        skip = {id(c) for c in geo_svcs}
        others = [c for c in conjuncts if id(c) not in skip]
        if not others:
            raise ValueError(
                "SERVICE <geo:search>: a variable service parameter needs "
                "a sibling pattern binding it"
            )
        from functools import reduce

        ldf = _compile(reduce(A.Join, others), store)
        for svc in geo_svcs:
            ldf = _geo_param_join(store, ldf, _collect_sps(svc.pattern))
        return ldf
    if var_svcs or lbl_svcs:
        skip = {id(c) for c in var_svcs} | {id(c) for c in lbl_svcs}
        others = [c for c in conjuncts if id(c) not in skip]
        if not others and var_svcs:
            raise ValueError(
                f"SERVICE ?{var_svcs[0].iri.name}: a variable service "
                "endpoint needs a sibling pattern in the same group "
                "binding it (e.g. VALUES)"
            )
        if others:
            # rebuild the sibling conjunction as a Join tree and compile it
            # through the normal path, so null-compatible joins (UNION/
            # OPTIONAL arms leaving shared vars UNBOUND) keep their
            # semantics under a service rewrite
            from functools import reduce

            ldf = _compile(reduce(A.Join, others), store)
        else:  # label service alone: incoming = the unit solution
            ldf = store.spark.range(1).drop("id")
        for svc in var_svcs:
            ldf = _service_var_join(store, ldf, svc)
        for svc in lbl_svcs:
            from blazegraph_database_spark.operators import service as _svc_mod

            ldf = _svc_mod.label_service_join(store, ldf, _collect_sps(svc.pattern))
        return ldf
    l, r = _compile(node.left, store), _compile(node.right, store)
    shared = sorted(set(l.columns) & set(r.columns))
    if not shared:
        return l.crossJoin(r)
    if _may_bind_unbound(node.left) or _may_bind_unbound(node.right):
        # SPARQL solution compatibility: an UNBOUND shared var (e.g. out of
        # a `{} UNION`, OPTIONAL, or VALUES UNDEF arm) is compatible with
        # ANY binding; the bound side's value survives. Only the statically
        # may-be-unbound shapes take this theta join — definite patterns
        # keep the fast shuffle equi-join.
        r2 = r
        for v in shared:
            r2 = r2.withColumnRenamed(v, f"__j_{v}")
        cond = None
        for v in shared:
            c = l[v].isNull() | F.col(f"__j_{v}").isNull() | (l[v] == F.col(f"__j_{v}"))
            cond = c if cond is None else (cond & c)
        if isinstance(node.right, A.Values) and node.right.child is None:
            # statically-known tiny side: BroadcastNestedLoop beats a
            # CartesianProduct's n_left x n_right task explosion (r8)
            r2 = F.broadcast(r2)
        elif isinstance(node.left, A.Values) and node.left.child is None:
            l = F.broadcast(l)
        out = l.join(r2, on=cond)
        for v in shared:
            out = out.withColumn(v, F.coalesce(l[v], F.col(f"__j_{v}")))
        return out.drop(*[f"__j_{v}" for v in shared])
    return l.join(r, on=shared)


# endpoint sets are inherently small (they're SERVICES, not data); the cap
# keeps a mis-bound variable (e.g. joined to a data column) from fanning
# out into thousands of service calls
SERVICE_VAR_MAX_ENDPOINTS = 64


def _geo_param_join(store: TripleStore, ldf: DataFrame, sps: list) -> DataFrame:
    """Run geo:search once per DISTINCT as-bound value row of its variable
    params, substitute, union, and join back to the incoming solutions.
    The distinct-param collect is bounded by SERVICE_VAR_MAX_ENDPOINTS —
    param vars enumerate query-level configuration (a handful of centers/
    regions), never data-sized sets. Serves both the SERVICE-wrapped form
    and the inline magic-predicate form (same resolution either way)."""
    from blazegraph_database_spark.operators import service

    pvars = sorted(service.geo_param_vars(sps))
    missing = [v for v in pvars if v not in ldf.columns]
    if missing:
        raise ValueError(
            f"SERVICE <geo:search>: param vars {missing} are bound by no sibling"
        )
    rows = ldf.select(*pvars).distinct().limit(SERVICE_VAR_MAX_ENDPOINTS + 1).collect()
    if len(rows) > SERVICE_VAR_MAX_ENDPOINTS:
        raise ValueError(
            f"SERVICE <geo:search>: more than {SERVICE_VAR_MAX_ENDPOINTS} "
            "distinct parameter bindings"
        )
    parts = []
    for r in rows:
        sub = []
        for sp in sps:
            if isinstance(sp.o, Var) and sp.o.name in pvars:
                sub.append(A.SP(sp.s, sp.p, Lit(r[sp.o.name])))
            else:
                sub.append(sp)
        out = service.geo_search_service(store, sub)
        for v in pvars:
            out = out.withColumn(v, F.lit(r[v]))
        parts.append(out)
    if not parts:
        return ldf.limit(0)
    res = parts[0]
    for p_ in parts[1:]:
        res = res.unionByName(p_)
    shared = sorted(set(ldf.columns) & set(res.columns))
    return ldf.join(res, on=shared) if shared else ldf.crossJoin(res)


def _pattern_var_names(n) -> set[str]:
    """Variable names mentioned in a service block's patterns (the
    service's possible output bindings)."""
    out: set[str] = set()
    if isinstance(n, A.BGP):
        for sp in n.patterns:
            out |= _pattern_var_names(sp)
    elif isinstance(n, A.Join):
        out |= _pattern_var_names(n.left) | _pattern_var_names(n.right)
    elif isinstance(n, A.SP):
        for t in (n.s, n.p, n.o, getattr(n, "g", None)):
            if isinstance(t, Var):
                out.add(t.name)
    return out


def _service_var_join(store: TripleStore, ldf: DataFrame, svc: "A.Service") -> DataFrame:
    """Collect the solutions' DISTINCT endpoint bindings, call the service
    once per endpoint, and natural-join the tagged union back — the
    reference's as-bound serviceRef grouping. Solutions with the endpoint
    var unbound are pruned (ref: ServiceCallJoin filters incoming binding
    sets without a serviceRef binding)."""
    v = svc.iri.name
    if v not in ldf.columns:
        raise ValueError(
            f"SERVICE ?{v}: no sibling pattern binds ?{v} (a variable "
            "service endpoint must be bound by the enclosing group, e.g. "
            "via VALUES)"
        )
    rows = (
        ldf.select(v).filter(F.col(v).isNotNull()).distinct()
        .limit(SERVICE_VAR_MAX_ENDPOINTS + 1).collect()
    )
    if len(rows) > SERVICE_VAR_MAX_ENDPOINTS:
        raise ValueError(
            f"SERVICE ?{v}: more than {SERVICE_VAR_MAX_ENDPOINTS} distinct "
            "endpoint bindings — is the variable really a service ref?"
        )
    parts = []
    for r in rows:
        ep = r[0]
        res = _compile(
            A.Service(ep, svc.pattern, svc.raw, svc.silent, svc.prologue), store
        )
        if v in res.columns:
            # the block itself binds the endpoint var: SPARQL join
            # semantics FILTER on it — overwriting would keep (and
            # mislabel) rows whose inner binding differs
            res = res.filter(F.col(v) == F.lit(ep))
        else:
            res = res.withColumn(v, F.lit(ep))
        parts.append(res)
    if not parts:
        # no bound endpoints → no output (reference behavior). Keep the
        # service block's variable columns so outer projections over them
        # still resolve on the empty frame.
        out = ldf.limit(0)
        for name in sorted(_pattern_var_names(svc.pattern)):
            if name not in out.columns:
                out = out.withColumn(name, F.lit(None).cast("string"))
        return out
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    shared = sorted(set(ldf.columns) & set(out.columns))
    return ldf.join(out, on=shared)


def _definite_vars(n) -> set[str]:
    """Vars bound in EVERY solution a node yields (static, conservative).
    Drives the join-strategy choice below: a shared var that is definitely
    bound on both sides joins with a plain equality (hash join); one that
    can be NULL needs SPARQL compatibility (unbound matches anything,
    merged value = coalesce). Being conservative only costs the fallback
    path, never correctness."""
    if n is None:
        return set()
    if isinstance(n, (A.SP, A.Emb)):
        out = {p.name for p in (n.s, n.p, n.o) if isinstance(p, Var)}
        g = getattr(n, "g", None)
        if isinstance(g, Var):
            out.add(g.name)
        return out
    if isinstance(n, A.BGP):
        return set().union(*(_definite_vars(p) for p in n.patterns)) if n.patterns else set()
    if isinstance(n, A.PathPattern):
        out = {p.name for p in (n.s, n.o) if isinstance(p, Var)}
        if isinstance(n.g, Var):
            out.add(n.g.name)
        return out
    if isinstance(n, A.Join):
        return _definite_vars(n.left) | _definite_vars(n.right)
    if isinstance(n, A.LeftJoin):
        return _definite_vars(n.left)  # right side may be all-unbound
    if isinstance(n, A.Union2):
        return _definite_vars(n.left) & _definite_vars(n.right)
    if isinstance(n, A.Minus):
        return _definite_vars(n.left)
    if isinstance(n, (A.Filter, A.Distinct, A.OrderBy, A.Slice, A.Exists)):
        return _definite_vars(n.child)
    if isinstance(n, A.Project):
        return _definite_vars(n.child) & set(n.vars)
    if isinstance(n, A.Extend):
        return _definite_vars(n.child)  # the bound expr may error -> unbound
    if isinstance(n, A.Values):
        keys = None
        for row in n.rows:
            bound = {k for k, v in row.items() if v is not None}
            keys = bound if keys is None else (keys & bound)
        keys = keys or set()
        return keys | _definite_vars(n.child) if n.child is not None else keys
    if isinstance(n, A.Group):
        return {k for k in n.keys if isinstance(k, str)}
    if isinstance(n, A.GraphScope):
        out = _definite_vars(n.child)
        if isinstance(n.g, Var):
            out.add(n.g.name)
        return out
    child = getattr(n, "child", None)
    if child is not None and hasattr(child, "__dataclass_fields__"):
        return _definite_vars(child)
    return set()


@_compile.register
def _(node: A.LeftJoin, store: TripleStore) -> DataFrame:
    if _is_label_service(node.right) and node.condition is None:
        # OPTIONAL { SERVICE wikibase:label {...} } — a common Wikidata
        # idiom: the label service correlates with the LEFT solutions (it
        # only ever adds columns, never removes rows, so the left-join
        # semantics are exactly the enrich)
        from blazegraph_database_spark.operators import service as _svc_mod

        return _svc_mod.label_service_join(
            store, _compile(node.left, store), _collect_sps(node.right.pattern)
        )
    l, r = _compile(node.left, store), _compile(node.right, store)
    shared = sorted(set(l.columns) & set(r.columns))
    if not shared and node.condition is None:
        # degenerate OPTIONAL: a LEFT join on TRUE, not a crossJoin — the
        # left rows must survive an EMPTY right side with the right's vars
        # unbound (ticket_933a: OPTIONAL over a group the ConditionalBind
        # emptied still yields the unit row)
        return l.join(r, on=F.lit(True), how="left")
    # Rename shared vars on the right; the join condition equates them, so a
    # condition written against the original names resolves to the left copy.
    # A shared var the LEFT may leave NULL takes SPARQL compatibility
    # semantics instead of equality (unbound matches anything; the merged
    # solution takes the right's value — ticket_1071 fixtures): the plan
    # cost is real (the OR disables the hash join), so the static
    # definitely-bound analysis keeps every always-bound var on the
    # equi-join fast path.
    l_def = _definite_vars(node.left)
    r_def = _definite_vars(node.right)
    r2 = r
    for v in shared:
        r2 = r2.withColumnRenamed(v, f"__r_{v}")
    cond = None
    merged = []
    for v in shared:
        c = l[v] == r2[f"__r_{v}"]
        if v not in l_def:
            c = l[v].isNull() | c
            merged.append(v)
        if v not in r_def:
            c = c | r2[f"__r_{v}"].isNull()
            merged.append(v)
        cond = c if cond is None else (cond & c)
    if node.condition is not None:
        cond = node.condition if cond is None else (cond & node.condition)
    try:
        out = l.join(r2, on=cond, how="left")
    except AnalysisException as e:
        # Bottom-up semantics: a LeftJoin condition referencing a variable
        # that can never be bound in scope (e.g. an outer-group var inside
        # a nested OPTIONAL's filter — the DAWG filter-scope tests) errors
        # for every row pair, so no pair joins: every left row survives
        # with the right side unbound.
        if "UNRESOLVED_COLUMN" in str(e) and "`__r_" not in str(e).split("SQLSTATE")[0]:
            out = l.join(r2, on=F.lit(False), how="left")
        else:
            raise
    for v in set(merged):
        out = out.withColumn(v, F.coalesce(F.col(v), F.col(f"__r_{v}")))
    return out.drop(*[f"__r_{v}" for v in shared])


@_compile.register
def _(node: A.Union2, store: TripleStore) -> DataFrame:
    l, r = _compile(node.left, store), _compile(node.right, store)
    return l.unionByName(r, allowMissingColumns=True)


@_compile.register
def _(node: A.Minus, store: TripleStore) -> DataFrame:
    l, r = _compile(node.left, store), _compile(node.right, store)
    shared = sorted(set(l.columns) & set(r.columns))
    if not shared:
        return l  # SPARQL MINUS with disjoint domains removes nothing
    if all(v in _definite_vars(node.left) and v in _definite_vars(node.right) for v in shared):
        # every shared var bound on both sides: plain hash anti-join
        return l.join(r.select(*shared).distinct(), on=shared, how="left_anti")
    # PER-ROW domain semantics (§18.5 Minus; ticket_bg852a): μ1 is removed
    # when some μ2 agrees on every shared var EITHER binds (compatibility)
    # AND they share at least one BOUND-on-both var (disjoint-domain pairs
    # remove nothing). Unbound-able shared vars force the general condition.
    rs = r.select(*shared).distinct()
    r2 = rs
    for v in shared:
        r2 = r2.withColumnRenamed(v, f"__m_{v}")
    compat, overlap = None, None
    for v in shared:
        c = F.col(v).isNull() | F.col(f"__m_{v}").isNull() | (F.col(v) == F.col(f"__m_{v}"))
        compat = c if compat is None else (compat & c)
        o = F.col(v).isNotNull() & F.col(f"__m_{v}").isNotNull()
        overlap = o if overlap is None else (overlap | o)
    return l.join(r2, on=compat & overlap, how="left_anti")


@_compile.register
def _(node: A.Filter, store: TripleStore) -> DataFrame:
    child = _compile(node.child, store)
    try:
        return child.filter(node.condition)
    except AnalysisException as e:
        # Bottom-up semantics (ref: ast/optimizers/ASTBottomUpOptimizer.java):
        # a FILTER referencing a variable that is not bound anywhere in its
        # group's scope — e.g. { ?s <p> ?v . { FILTER(?v > 0) } } — sees that
        # variable as UNBOUND for every solution. Spark surfaces the
        # never-in-scope case as an unresolved column; substitute NULL for
        # it and re-apply: comparisons then yield NULL (row dropped, the
        # spec's type error) while BOUND()/COALESCE see the unbound var
        # correctly (fixture bindingsAndBottomUp03a: FILTER(!bound(?s))
        # inside a group that can never bind ?s keeps every row). Internal
        # (__-prefixed) columns are compiler plumbing, never user variables
        # — re-raise those so a genuine compiler bug stays loud.
        if "UNRESOLVED_COLUMN" in str(e) and "`__" not in str(e).split("SQLSTATE")[0]:
            padded, added = _pad_unresolved(child, node.condition, e)
            if padded is not None:
                return padded.filter(node.condition).drop(*added)
        raise


def _pad_unresolved(child: DataFrame, expr, first_err) -> tuple:
    """Resolve an expression over columns Spark reports as UNRESOLVED by
    adding them as NULL string columns (the SPARQL reading: a variable no
    sibling can bind is unbound in every solution). Returns (padded_df,
    added_names) or (None, ()) when the unresolved name is internal or
    nothing converges within the bound."""
    import re as _re

    rx = _re.compile(r"name `([^`]+)` cannot be resolved")
    df, added, err = child, [], first_err
    for _ in range(8):
        m = rx.search(str(err).split("SQLSTATE")[0])
        if not m or m.group(1).startswith("__") or m.group(1) in df.columns:
            return None, ()
        name = m.group(1)
        df = df.withColumn(name, F.lit(None).cast("string"))
        added.append(name)
        try:
            df.select(expr)  # analysis probe: any more missing columns?
            return df, added
        except AnalysisException as nxt:
            if "UNRESOLVED_COLUMN" not in str(nxt):
                return None, ()
            err = nxt
    return None, ()


@_compile.register
def _(node: A.Extend, store: TripleStore) -> DataFrame:
    child = _compile(node.child, store)
    try:
        if getattr(node, "conditional", False) and node.var in child.columns:
            return _conditional_bind(
                child, node.var, node.expr,
                arith_lexical=getattr(node, "arith_lexical", False),
            )
        return child.withColumn(node.var, node.expr)
    except AnalysisException as e:
        # Bottom-up semantics: BIND over a never-in-scope variable sees it
        # as NULL — the expression evaluates with the unbound var (BOUND ->
        # false, comparisons -> NULL = the target stays unbound), same
        # substitution discipline as A.Filter above.
        if "UNRESOLVED_COLUMN" in str(e) and "`__" not in str(e).split("SQLSTATE")[0]:
            padded, added = _pad_unresolved(child, node.expr, e)
            if padded is not None:
                return padded.withColumn(node.var, node.expr).drop(*added)
            return child.withColumn(node.var, F.lit(None).cast("string"))
        raise


def _conditional_bind(
    child: DataFrame, var: str, expr, arith_lexical: bool = False
) -> DataFrame:
    """ConditionalBind (ref: internal/constraints/ConditionalBind.java:160 —
    `return (val.equals(existing)) ? val : null`, the null failing the
    solution through BindingConstraint): BIND onto an already-in-scope var
    binds where UNBOUND and otherwise acts as an EQUALITY CONSTRAINT —
    solutions whose existing binding differs from (or is incomparable
    with) the value are dropped. Spec-illegal input (SPARQL §10.1 calls
    re-binding a syntax error), so no spec-compliant query takes this
    path; fixtures ticket-1007-* / bindingsWithSubquery03b/05 pin it.

    Equality is TYPED when the var carries a `__dt` companion (same
    open-world rules as _typed_eq: resources and lang-tagged literals are
    decidable, numerics compare by value, plain-vs-typed is a type error →
    drop); lexical otherwise (the engine's documented default)."""
    existing = F.col(var)
    vs = expr.cast("string")
    if f"{var}__dt" in child.columns:
        adt = F.coalesce(F.col(f"{var}__dt"), F.lit("string"))
        vt = child.select(expr.alias("__v")).schema[0].dataType.simpleString()
        is_res = adt.isin("iri", "bnode", "sid")
        is_lang = adt.startswith("lang:")
        err = F.lit(None).cast("boolean")

        if vt == "string" and arith_lexical:
            # a typed-arithmetic expression is numeric-VALUED despite its
            # string column type (r8): keep the pre-round numeric-value
            # ConditionalBind semantics for re-binding an arith result
            # (flag carried on the Extend node — per-query, no global
            # repr-keyed registry; r8 VERDICT)
            from blazegraph_database_spark.functions.sparql_funcs import NUM_TAG

            an, en = existing.try_cast("double"), expr.try_cast("double")
            eq = (
                F.when(is_res | is_lang, F.lit(False))
                .when(NUM_TAG(adt) & an.isNotNull() & en.isNotNull(), an == en)
                .otherwise(err)
            )
        elif vt in ("int", "bigint", "smallint", "tinyint"):
            # INTEGER-class constant: ConditionalBind equality is IV
            # ``equals`` — class-sensitive (ticket-1007-number1: BIND(10)
            # keeps "10"^^xsd:integer but NOT "10"^^xsd:int or
            # "10.0"^^xsd:double, which are different IV classes)
            an = existing.try_cast("double")
            eq = (
                F.when(is_res | is_lang, F.lit(False))
                .when(
                    (adt == "long") & an.isNotNull(), an == expr.cast("double")
                )
                .otherwise(err)  # other class / plain / invalid: drop
            )
        elif vt in ("double", "float", "decimal") or vt.startswith("decimal"):
            an = existing.try_cast("double")
            eq = (
                F.when(is_res | is_lang, F.lit(False))
                .when(
                    adt.isin("long", "double", "decimal") & an.isNotNull(),
                    an == expr.cast("double"),
                )
                .otherwise(err)  # plain/unknown/invalid vs numeric: type error
            )
        elif vt == "boolean":
            eq = (
                F.when(adt == "boolean", existing == vs)
                .when(is_res | is_lang, F.lit(False))
                .otherwise(err)
            )
        else:  # string-valued expression (plain literal or IRI-producing)
            eq = (
                F.when(is_res | is_lang, F.lit(False))
                .when(adt == "string", existing == vs)
                .otherwise(err)  # typed/unknown vs plain: type error
            )
    else:
        eq = existing == vs
    keep = existing.isNull() | eq
    return child.filter(keep).withColumn(var, F.coalesce(existing, vs))


@_compile.register
def _(node: A.Values, store: TripleStore) -> DataFrame:
    """VALUES / inline bindings. UNDEF (None) is compatible with ANY binding
    per SPARQL, but a NULL in a Spark equi-join matches nothing — so rows are
    grouped by their bound-column pattern and each group joins only on the
    columns it actually binds (ADVICE round 1, medium)."""
    from collections import defaultdict

    spark = store.spark
    cols = sorted({k for row in node.rows for k in row})
    if node.child is not None:
        # variable-endpoint SERVICEs on the child's join spine resolve
        # against the solutions INCLUDING these inline bindings (a VALUES
        # clause is the usual way to bind ?ep) — evaluate everything else
        # plus the bindings first, then dispatch the service calls
        spine = _flatten_join(node.child)
        var_svcs = [
            c for c in spine
            if isinstance(c, A.Service) and isinstance(c.iri, Var)
        ]
        if var_svcs:
            others = [
                c for c in spine
                if not (isinstance(c, A.Service) and isinstance(c.iri, Var))
            ]
            rest = None
            for o in others:
                rest = o if rest is None else A.Join(rest, o)
            ldf = _compile(A.Values(node.rows, child=rest), store)
            for svc in var_svcs:
                ldf = _service_var_join(store, ldf, svc)
            return ldf
    if node.child is None:
        data = [tuple(row.get(c) for c in cols) for row in node.rows]
        return spark.createDataFrame(data, schema=", ".join(f"{c} string" for c in cols))
    child = _compile(node.child, store)
    groups: dict[tuple, list] = defaultdict(list)
    for row in node.rows:
        groups[tuple(c for c in cols if row.get(c) is not None)].append(row)
    outs = []
    for bound, rows_ in groups.items():
        # keep bound columns (join keys / new bindings) and UNDEF columns the
        # child doesn't bind (stay NULL = unbound); drop UNDEF columns the
        # child binds — the child's value survives, as UNDEF is a wildcard
        keep = [c for c in cols if c in bound or c not in child.columns]
        if not keep:  # every VALUES var is UNDEF and child-bound: wildcard rows
            outs.extend([child] * len(rows_))
            continue
        data = [tuple(r.get(c) for c in keep) for r in rows_]
        vdf = spark.createDataFrame(data, schema=", ".join(f"{c} string" for c in keep))
        join_cols = sorted(set(child.columns) & set(bound))
        if join_cols:
            # SPARQL solution compatibility: a child row whose shared var is
            # UNBOUND (NULL — e.g. out of an OPTIONAL) is compatible with
            # ANY binding, and the VALUES value fills it in. A plain
            # equi-join would drop such rows, so join on
            # (child IS NULL OR child = value) and coalesce the output —
            # the VALUES side is a broadcast handful of rows, so the
            # non-equi condition stays a cheap broadcast join.
            vren = vdf.select([F.col(c).alias(f"__v_{c}") for c in keep])
            cond = None
            for c in join_cols:
                cc = child[c].isNull() | (child[c] == F.col(f"__v_{c}"))
                cond = cc if cond is None else (cond & cc)
            j = child.join(F.broadcast(vren), cond)
            sel = [
                F.coalesce(child[c], F.col(f"__v_{c}")).alias(c)
                if c in join_cols
                else child[c]
                for c in child.columns
            ]
            sel += [F.col(f"__v_{c}").alias(c) for c in keep if c not in child.columns]
            outs.append(j.select(*sel))
        else:
            outs.append(child.crossJoin(F.broadcast(vdf)))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o, allowMissingColumns=True)
    return out


@_compile.register
def _(node: A.SidBind, store: TripleStore) -> DataFrame:
    """BIND(<<s p o>> AS ?sid): one statement-index scan binding the inner
    vars plus the sid; joins the sibling solutions on any shared vars (the
    RDR BIND access path — the sid then equi-joins metadata patterns by its
    deterministic encoding)."""
    inner = _sid_inner_df(node.emb, store, node.var)
    child = _compile(node.child, store)
    shared = sorted(set(child.columns) & set(inner.columns))
    return child.join(inner, on=shared) if shared else child.crossJoin(inner)


@_compile.register
def _(node: A.Exists, store: TripleStore) -> DataFrame:
    child = _compile(node.child, store)
    how = "left_anti" if node.negate else "left_semi"
    # SPARQL substitution semantics: a FILTER inside the EXISTS pattern may
    # reference OUTER variables (the W3C exists-06 shape `FILTER NOT EXISTS
    # { ?a :q ?m . FILTER(?n = ?m) }`). Such filters can't evaluate inside
    # the pattern (the var is unbound there) — hoist them into the
    # semi/anti-join condition, where both sides are in scope (the
    # reference evaluates EXISTS as an ask-subquery over the INCOMING
    # solution; ref: ExistsNode.java).
    pattern, hoisted = node.pattern, []
    while isinstance(pattern, A.Filter) and pattern.refs:
        from blazegraph_database_spark.plans.sparql_parser import _maybe_bound

        outer = set(pattern.refs) - _maybe_bound(pattern.child)
        if outer and outer <= set(child.columns):
            hoisted.append(pattern.condition)
            pattern = pattern.child
            continue
        break
    sub = _compile(pattern, store)
    shared = sorted(set(child.columns) & set(sub.columns))
    c_def = _definite_vars(node.child)
    nullable = [v for v in shared if v not in c_def]
    if not hoisted and not nullable:
        if not shared:
            # uncorrelated [NOT] EXISTS: a pure boolean gate — keep every
            # child row iff the pattern has any solution (none, under NOT).
            # A true-condition semi/anti join against a one-row probe stays
            # distributed (no driver count).
            probe = sub.limit(1).select(F.lit(1).alias("__probe"))
            return child.join(probe, F.lit(True), how=how)
        return child.join(sub.select(*shared).distinct(), on=shared, how=how)
    sub2 = sub
    for v in shared:
        sub2 = sub2.withColumnRenamed(v, f"__r_{v}")
    cond = None
    for v in shared:
        c = child[v] == F.col(f"__r_{v}")
        if v in nullable:
            # substitution semantics with an UNBOUND outer var: the
            # substituted pattern leaves it free, so it matches anything
            # (ticket_blzg_1284: NOT EXISTS over an OPTIONAL-bound var)
            c = child[v].isNull() | c
        cond = c if cond is None else cond & c
    for h in hoisted:
        cond = h if cond is None else cond & h
    try:
        return child.join(sub2, on=cond, how=how)
    except AnalysisException as e:
        # a hoisted condition referencing a var bound on NEITHER side is a
        # per-row type error: EXISTS never matches (bottom-up discipline,
        # same guard as A.Filter)
        if "UNRESOLVED_COLUMN" in str(e) and "`__" not in str(e).split("SQLSTATE")[0]:
            return child.join(sub2.limit(1), on=F.lit(False), how=how)
        raise


def _may_bind_unbound(node) -> bool:
    """Static walk: can this algebra subtree produce UNBOUND (NULL) values
    in its binding columns? True when an OPTIONAL (LeftJoin), UNION with
    asymmetric arms, or VALUES-with-UNDEF sits anywhere inside —
    conservative, purely structural, no Spark job."""
    import dataclasses

    # Extend: BIND expressions can yield NULL (failed casts, IF branches);
    # Service: remote solutions may omit vars (review r5-2)
    if isinstance(node, A.Values):
        # a VALUES block introduces UNBOUND only through UNDEF cells or a
        # row omitting a var — the ubiquitous all-bound inline-bindings
        # case (federation pushdown, driver VALUES) keeps the fast
        # equi-join instead of the cartesian compatibility join (r8)
        vs = {v for row in node.rows for v in row}
        if any(row.get(v) is None for row in node.rows for v in vs):
            return True
        # fall through to the generic child walk below
    elif isinstance(node, (A.LeftJoin, A.Union2, A.Extend)):
        return True
    if node.__class__.__name__ == "Service":
        return True
    if dataclasses.is_dataclass(node):
        for f in dataclasses.fields(node):
            v = getattr(node, f.name)
            for item in v.values() if isinstance(v, dict) else (v if isinstance(v, (list, tuple)) else (v,)):
                if dataclasses.is_dataclass(item) and _may_bind_unbound(item):
                    return True
    return False


@_compile.register
def _(node: A.ExistsFlag, store: TripleStore) -> DataFrame:
    """EXISTS as a value expression: bind node.var as a boolean column via a
    left join against the distinct shared-var solutions (the reference's
    ask-subquery solution flag; ref: ExistsNode.java). Uncorrelated blocks
    reduce to one broadcast scalar.

    SPARQL solution compatibility treats UNBOUND as compatible with any
    binding (ADVICE r4: the pure equi-join made NULL shared vars never
    match). When the static walk says the child can bind NULLs, the join
    falls back to a null-tolerant condition re-aggregated per input row;
    otherwise the fast equi path stands."""
    child = _compile(node.child, store)
    # outer-correlated inner FILTERs hoist into the join condition — same
    # substitution semantics as the A.Exists compile above
    pattern, hoisted = node.pattern, []
    while isinstance(pattern, A.Filter) and pattern.refs:
        from blazegraph_database_spark.plans.sparql_parser import _maybe_bound

        outer = set(pattern.refs) - _maybe_bound(pattern.child)
        if outer and outer <= set(child.columns):
            hoisted.append(pattern.condition)
            pattern = pattern.child
            continue
        break
    sub = _compile(pattern, store)
    shared = sorted(set(child.columns) & set(sub.columns))
    if hoisted:
        rid = "__ex_rid"
        left = child.withColumn(rid, F.monotonically_increasing_id())
        m = sub.select(
            *[F.col(c).alias(f"__ex_{c}") for c in shared],
            *[F.col(c) for c in sub.columns if c not in shared],
        ).withColumn("__ex_hit", F.lit(True))
        nullable = _may_bind_unbound(node.child) or _may_bind_unbound(pattern)
        cond = F.lit(True)
        for c in shared:
            eq = F.col(c) == F.col(f"__ex_{c}")
            if nullable:
                # solution compatibility: UNBOUND matches anything (same
                # rule as the non-hoisted r5-1 path below)
                eq = F.col(c).isNull() | F.col(f"__ex_{c}").isNull() | eq
            cond = cond & eq
        for h in hoisted:
            cond = cond & h
        try:
            joined = left.join(m, on=cond, how="left")
            out = (
                joined.groupBy(rid, *child.columns)
                .agg(
                    F.max(F.coalesce(F.col("__ex_hit"), F.lit(False))).alias(
                        "__ex_hitagg"
                    )
                )
                .drop(rid)
            )
        except AnalysisException as e:
            if "UNRESOLVED_COLUMN" in str(e) and "`__" not in str(e).split("SQLSTATE")[0]:
                out = child.withColumn("__ex_hitagg", F.lit(False))
            else:
                raise
        flag = F.col("__ex_hitagg")
        out = out.withColumn(node.var, ~flag if node.negate else flag)
        return out.drop("__ex_hitagg")
    # either side can produce UNBOUND shared vars (review r5-1: a pattern
    # whose OPTIONAL leaves ?x NULL is compatible with every child row)
    if shared and (_may_bind_unbound(node.child) or _may_bind_unbound(node.pattern)):
        rid = "__ex_rid"
        left = child.withColumn(rid, F.monotonically_increasing_id())
        m = (
            sub.select(*[F.col(c).alias(f"__ex_{c}") for c in shared])
            .distinct()
            .withColumn("__ex_hit", F.lit(True))
        )
        cond = None
        for c in shared:
            e = (
                F.col(c).isNull()
                | F.col(f"__ex_{c}").isNull()
                | (F.col(c) == F.col(f"__ex_{c}"))
            )
            cond = e if cond is None else cond & e
        joined = left.join(m, on=cond, how="left")
        out = (
            joined.groupBy(rid, *child.columns)
            .agg(F.max(F.coalesce(F.col("__ex_hit"), F.lit(False))).alias("__ex_hitagg"))
            .drop(rid)
        )
        flag = F.col("__ex_hitagg")
        out = out.withColumn(node.var, ~flag if node.negate else flag)
        return out.drop("__ex_hitagg")
    if shared:
        # no forced broadcast: the distinct solution set can be corpus-sized;
        # AQE picks broadcast when it measures small
        marked = sub.select(*shared).distinct().withColumn("__ex_hit", F.lit(True))
        out = child.join(marked, on=shared, how="left")
        flag = F.coalesce(F.col("__ex_hit"), F.lit(False))
    else:  # uncorrelated: one scalar riding a broadcast one-row crossJoin
        scalar = sub.limit(1).agg(F.count(F.lit(1)).alias("__ex_n"))
        out = child.crossJoin(F.broadcast(scalar))
        flag = F.col("__ex_n") > 0
    flag = ~flag if node.negate else flag
    return out.withColumn(node.var, flag).drop("__ex_hit", "__ex_n")


@_compile.register
def _(node: A.DropCols, store: TripleStore) -> DataFrame:
    return _compile(node.child, store).drop(*node.cols)


@_compile.register
def _(node: A.DropInternal, store: TripleStore) -> DataFrame:
    df = _compile(node.child, store)
    drop = [
        c
        for c in df.columns
        if c.startswith("__anon") or c.startswith("__bn_") or c.startswith("__gslot")
    ]
    return df.drop(*drop) if drop else df


@_compile.register
def _(node: A.Project, store: TripleStore) -> DataFrame:
    child = _compile(node.child, store)
    # A projected var nothing in scope can bind (e.g. one a subquery
    # projected away) is UNBOUND in every solution — a NULL column, not an
    # analysis error (SPARQL §18.2.1 in-scope rules).
    for v in node.vars:
        if v not in child.columns:
            child = child.withColumn(v, F.lit(None).cast("string"))
    cols = list(node.vars)
    if store.track_dt:
        # keep the projected vars' datatype companions so result
        # serializers can type terms (IRI vs literal vs lang) — DISTINCT
        # over them is still term-correct (same lexical + different dt IS
        # a different term)
        cols += [f"{v}__dt" for v in node.vars if f"{v}__dt" in child.columns]
    return child.select(*cols)


@_compile.register
def _(node: A.Distinct, store: TripleStore) -> DataFrame:
    return _compile(node.child, store).distinct()


@_compile.register
def _(node: A.OrderBy, store: TripleStore) -> DataFrame:
    """ORDER BY. When a sort var carries a datatype companion, ordering
    follows the SPARQL operator mapping instead of raw lexical order:
    IRIs before literals, numeric literals compared numerically, everything
    else by lexical form (the reference orders by IV type then value; ref:
    IVComparator). Vars without companions keep plain column order —
    exactly the previous behavior."""
    df = _compile(node.child, store)
    return df.orderBy(*_order_exprs(df, node.keys))


def _order_exprs(df: DataFrame, keys: tuple) -> list:
    """Translate (key, ascending) pairs into sort Columns, applying the
    SPARQL operator-mapping order when a datatype companion exists (shared
    by ORDER BY and the per-graph Slice window)."""
    cols = []
    for key, asc in keys:
        if isinstance(key, str) and f"{key}__dt" in df.columns:
            dt = F.col(f"{key}__dt")
            from blazegraph_database_spark.functions import sparql_funcs as _fn

            is_num = (
                dt.isin("long", "double", "integer", "decimal", "int", "float")
                | dt.rlike(_fn._XSD_NUM_DT_RX)
            )
            parts = [
                F.when(F.col(key).isNull(), 0).when(dt == "iri", 1).otherwise(2),
                F.when(is_num, F.col(key).cast("double")),
                F.col(key),
            ]
            cols.extend((p.asc() if asc else p.desc()) for p in parts)
            continue
        c = F.col(key) if isinstance(key, str) else key
        cols.append(c.asc() if asc else c.desc())
    return cols


@_compile.register
def _(node: A.Slice, store: TripleStore) -> DataFrame:
    df = _compile(node.child, store)
    if node.limit is not None and node.offset == 0:
        # ORDER-less LIMIT over a single statement pattern: the reference's
        # access path is a B+Tree index scan, so its LIMIT takes the LOWEST
        # key, deterministically (eval fixture ticket_944 — `SELECT ?s {?s
        # ?p ?o} LIMIT 1` binds the minimum subject). Order by the
        # pattern's bound positions in SPO key order — Spark lowers
        # limit-over-sort to TakeOrderedAndProject (per-partition top-k,
        # never a full sort materialization), so the determinism is free
        # at any scale.
        ch = node.child
        while isinstance(ch, (A.Project, A.DropCols, A.Distinct)):
            ch = ch.child
        if isinstance(ch, A.BGP) and len(ch.patterns) == 1:
            ch = ch.patterns[0]
        if isinstance(ch, A.SP):
            keys = [
                p.name
                for p in (ch.s, ch.p, ch.o, ch.g)
                if isinstance(p, Var) and p.name in df.columns
            ]
            if keys:
                df = df.orderBy(*keys)
    if node.offset:
        df = df.offset(node.offset)
    if node.limit is not None:
        df = df.limit(node.limit)
    return df


@_compile.register
def _(node: A.PerKeySlice, store: TripleStore) -> DataFrame:
    """Per-graph LIMIT/OFFSET: a subquery Slice under GRAPH ?g applies
    per active graph. One window pass partitioned by the graph slot — no
    per-graph driver loop; with no ORDER BY the spec allows any rows, so
    the tie-break over the remaining columns just makes runs repeatable."""
    from pyspark.sql.window import Window

    df = _compile(node.child, store)
    order = _order_exprs(df, node.keys) if node.keys else [
        F.col(c) for c in df.columns if c != node.key
    ]
    if not order:  # key is the only column
        order = [F.lit(1)]
    w = Window.partitionBy(node.key).orderBy(*order)
    lo, hi = node.offset, None if node.limit is None else node.offset + node.limit
    cond = F.col("__rn") > lo
    if hi is not None:
        cond = cond & (F.col("__rn") <= hi)
    return df.withColumn("__rn", F.row_number().over(w)).filter(cond).drop("__rn")


@_compile.register
def _(node: A.Group, store: TripleStore) -> DataFrame:
    df = _compile(node.child, store)
    # a GROUP BY var nothing in scope can bind (e.g. one shadowed away by a
    # subquery boundary — ticket-1892-additional4) groups as UNBOUND: one
    # NULL key, not an analysis error (same bottom-up rule as Project)
    for k in node.keys:
        if isinstance(k, str) and k not in df.columns:
            df = df.withColumn(k, F.lit(None).cast("string"))
    aggs = [expr.alias(name) for name, expr in node.aggs]
    out = df.groupBy(*node.keys).agg(*aggs) if node.keys else df.agg(*aggs)
    if node.having is not None:
        out = out.filter(node.having)
    return out


def _slot_bound(node, name: str) -> bool:
    """True iff the (already graph-pushed) subtree can bind ``name`` in its
    OUTPUT — i.e. some statement/path pattern carries the slot in its graph
    position on the solution-producing spine. Subquery projections and
    group keys that include the slot count (the push rewrite appends it);
    a nested GraphScope stops the walk (inner GRAPH overrides)."""
    if isinstance(node, (A.SP, A.PathPattern)):
        return isinstance(node.g, Var) and node.g.name == name
    if isinstance(node, A.BGP):
        return any(_slot_bound(p, name) for p in node.patterns)
    if isinstance(node, A.GraphScope):
        return False
    if isinstance(node, A.Project):
        return name in node.vars
    if isinstance(node, A.Group):
        return name in node.keys
    if isinstance(node, (A.Join, A.LeftJoin, A.Union2)):
        return _slot_bound(node.left, name) or _slot_bound(node.right, name)
    if isinstance(node, A.Minus):
        return _slot_bound(node.left, name)
    if isinstance(node, (A.Exists, A.ExistsFlag)):
        return _slot_bound(node.child, name)
    child = getattr(node, "child", None)
    return child is not None and _slot_bound(child, name)


def _push_graph(node, g):
    """Rewrite a pattern tree so every SP carries the GRAPH term (the SP
    compiler handles constant/variable g positions natively).

    ``g`` is a fresh internal slot variable (see the GraphScope compile) —
    never the user's name — so a subquery-local variable spelled like the
    graph variable can NEVER conflate with the active graph (SPARQL
    bottom-up scoping; ref: the ticket-1892 eval fixtures + the reference's
    variable-scoping in SubqueryRoot).

    The slot propagates INTO subqueries by identity (ref:
    ASTGraphGroupOptimizer.java:64 — "Anything nested (even if a subquery)
    is constrained to be from [the graph]... even if they occur within a
    subquery"), appended to the subquery's projection and GROUP BY keys so
    the per-active-graph evaluation stays correlated while the USER's
    same-named variables inside the subquery remain shadowed (matches the
    reference's ticket-1892 additional1/3/4/5/6 + subquery03 fixtures;
    its additional2 fixture evaluates the subquery decorrelated from the
    incoming graph binding — a runs-first evaluation-order artifact this
    engine does not reproduce, documented as a divergence)."""
    if isinstance(node, A.SP):
        return A.SP(node.s, node.p, node.o, g if node.g is None else node.g)
    if isinstance(node, A.BGP):
        return A.BGP([_push_graph(p, g) for p in node.patterns], hints=node.hints)
    if isinstance(node, A.GraphScope):
        return node  # inner GRAPH overrides
    if isinstance(node, A.PathPattern):
        return A.PathPattern(node.s, node.path, node.o, g if node.g is None else node.g)
    if isinstance(node, A.Project):
        child = _push_graph(node.child, g)
        if (
            isinstance(g, Var)
            and g.name not in node.vars
            and _slot_bound(child, g.name)
        ):
            return A.Project(child, tuple(node.vars) + (g.name,))
        return A.Project(child, node.vars)
    if isinstance(node, A.Group):
        child = _push_graph(node.child, g)
        keys = tuple(node.keys)
        if isinstance(g, Var) and g.name not in keys and _slot_bound(child, g.name):
            keys += (g.name,)
        return A.Group(child, keys, node.aggs, node.having)
    if isinstance(node, A.Slice):
        child = _push_graph(node.child, g)
        if isinstance(g, Var) and _slot_bound(child, g.name):
            # the Slice belongs to a subquery evaluated once per active
            # graph — LIMIT/OFFSET apply per graph, honoring its ORDER BY.
            # The OrderBy may sit BELOW the projection (unprojected sort
            # key): descend through DropCols/Project and slice there, so
            # the sort columns are still in scope; a pure column selection
            # commutes with the row filter. Never descend through Distinct
            # (slice-then-distinct is not distinct-then-slice).
            def _slice_at(c):
                if isinstance(c, A.DropCols):
                    return A.DropCols(_slice_at(c.child), c.cols)
                if isinstance(c, A.Project):
                    return A.Project(_slice_at(c.child), c.vars)
                keys = c.keys if isinstance(c, A.OrderBy) else ()
                return A.PerKeySlice(c, g.name, node.limit, node.offset, keys)

            return _slice_at(child)
        return A.Slice(child, node.limit, node.offset)
    if isinstance(node, (A.Exists, A.ExistsFlag)):
        # the EXISTS pattern is graph-scoped too (FILTER [NOT] EXISTS inside
        # GRAPH evaluates its pattern against that graph; ticket-888)
        import dataclasses

        return dataclasses.replace(
            node,
            child=_push_graph(node.child, g),
            pattern=_push_graph(node.pattern, g),
        )
    for children in (("child",), ("left", "right")):
        if all(hasattr(node, c) for c in children):
            import dataclasses

            return dataclasses.replace(
                node, **{c: _push_graph(getattr(node, c), g) for c in children}
            )
    return node


import itertools

_GSLOT = itertools.count()


@_compile.register
def _(node: A.GraphScope, store: TripleStore) -> DataFrame:
    # Nested GRAPH override: `GRAPH <g2>` inside `GRAPH <g1>` evaluates
    # against g2 of the ORIGINAL dataset, never the g1-restricted view
    # (store.graph() records its source as parent_quads; ref: ticket_832c —
    # the reference resolves every GRAPH term against the full quad store).
    base = getattr(store, "parent_quads", None) or store
    if not base.has_graphs:
        if isinstance(node.g, Var):
            # TRIPLES-MODE parity (ref: ticket_bg1760 — the reference's
            # triples-mode evaluation treats GRAPH ?g as the plain pattern
            # with ?g unbound; there is no quad index to scope by)
            out = _compile(node.child, store)
            if node.g.name not in out.columns:
                out = out.withColumn(node.g.name, F.lit(None).cast("string"))
            return out
        # constant graph: with ZERO named graphs the pattern has zero
        # solutions (a triples-only store's named-graph set is empty)
        return _compile(node.child, store).limit(0)
    dn = getattr(store, "dataset_named", None)
    if dn is None and base is not store:
        dn = getattr(base, "dataset_named", None)

    def _named_graphs(alias: str) -> DataFrame:
        # the named graphs of the dataset (one row per graph; the default
        # graph '' is not NAMED), honoring any FROM NAMED restriction
        gs = (
            base.df.filter(F.col("g").isNotNull() & (F.col("g") != ""))
            .select(F.col("g").alias(alias))
            .distinct()
        )
        if dn is not None:
            gs = gs.filter(F.col(alias).isin(list(dn)) if dn else F.lit(False))
        return gs

    if isinstance(node.g, Var):
        gname = node.g.name
        if isinstance(node.child, A.BGP) and not node.child.patterns:
            # GRAPH ?g {} enumerates the named graphs (one unit solution
            # per graph; ref: trac709 — openrdf/DAWG semantics)
            return _named_graphs(gname)
        # Push a FRESH internal slot — never the user's variable name — so
        # a subquery-local variable spelled ?g can never conflate with the
        # active graph (SPARQL bottom-up scoping; the reference's
        # ticket-1892 eval fixtures). The user's name binds only HERE, at
        # the scope boundary.
        fresh = Var(f"__gslot_{next(_GSLOT)}")
        out = _compile(_push_graph(node.child, fresh), base)
        fdt, gdt = f"{fresh.name}__dt", f"{gname}__dt"
        if fresh.name in out.columns:
            if gname in out.columns:
                # ?g is ALSO bound as an ordinary variable in this scope
                # (e.g. GRAPH ?g { ?x ex:q ?g }): both denote the same term
                out = out.filter(F.col(gname) == F.col(fresh.name)).drop(fresh.name)
                if fdt in out.columns:
                    out = out.drop(fdt)
            else:
                out = out.withColumnRenamed(fresh.name, gname)
                if fdt in out.columns:
                    out = (
                        out.drop(fdt)
                        if gdt in out.columns
                        else out.withColumnRenamed(fdt, gdt)
                    )
        else:
            # nothing below consumed the active graph (the body is entirely
            # nested GraphScopes / VALUES): ?g still ranges over the named
            # graphs, joined per solution compatibility
            gs = _named_graphs(gname)
            out = (
                gs.crossJoin(out) if gname not in out.columns else out.join(gs, gname)
            )
        return out
    g = const_lex(node.g)
    if dn is not None and g not in dn:
        # GRAPH <g> outside the FROM NAMED set matches nothing
        return _compile(node.child, base.graph(g)).limit(0)
    if isinstance(node.child, A.BGP) and not node.child.patterns:
        # GRAPH <g> {}: the unit solution iff <g> IS a named graph of the
        # dataset (has at least one statement) — zero solutions otherwise
        # (trac429neg). One bounded probe, no driver collect.
        return base.df.filter(F.col("g") == g).limit(1).select()
    return _compile(node.child, base.graph(g))


BD_VIRTUAL_GRAPH = "http://www.bigdata.com/rdf#virtualGraph"
_VIRTUAL_GRAPH_MAX = 100_000


def _expand_virtual_graphs(entries: tuple, store: TripleStore) -> tuple:
    """Expand ("virtual", vg) dataset entries into the member graphs the
    store declares via `<vg> bd:virtualGraph <member>` triples (ref:
    BD.java:199 VIRTUAL_GRAPH; ASTDeferredIVResolution.java:530 — an
    undeclared virtual graph is an error, matching the reference's
    "Not declared" RuntimeException). The membership collect is
    graph-catalog-sized; a hard cap fails loud if data is mis-modeled as
    membership."""
    out: list = []
    for e in entries:
        if isinstance(e, tuple) and len(e) == 2 and e[0] == "virtual":
            vg = e[1]
            members = [
                r["o_lex"]
                for r in store.df.filter(
                    (F.col("s") == vg) & (F.col("p") == BD_VIRTUAL_GRAPH)
                )
                .select("o_lex")
                .limit(_VIRTUAL_GRAPH_MAX + 1)
                .collect()
            ]
            if not members:
                raise ValueError(
                    f"virtual graph <{vg}> not declared: no bd:virtualGraph membership triples"
                )
            if len(members) > _VIRTUAL_GRAPH_MAX:
                raise ValueError(
                    f"virtual graph <{vg}> declares more than {_VIRTUAL_GRAPH_MAX} members"
                )
            out.extend(members)
        else:
            out.append(e)
    return tuple(out)


@_compile.register
def _(node: A.Dataset, store: TripleStore) -> DataFrame:
    default = _expand_virtual_graphs(node.default, store)
    named = _expand_virtual_graphs(node.named, store)
    return _compile(node.child, store.with_dataset(default, named))


def _named_includes_of(plan) -> set:
    """Names of the named solution sets a plan INCLUDEs (transitive walk)."""
    out: set = set()

    def walk(n):
        if isinstance(n, A.NamedInclude):
            out.add(n.name)
            return
        if isinstance(n, A.BGP):
            for p in n.patterns:
                walk(p)
            return
        named = getattr(n, "named", None)
        if isinstance(named, dict):
            for v in named.values():
                walk(v)
        for attr in ("child", "left", "right", "pattern"):
            c = getattr(n, attr, None)
            if c is not None and hasattr(c, "__dataclass_fields__"):
                walk(c)

    if plan is not None and hasattr(plan, "__dataclass_fields__"):
        walk(plan)
    return out


@_compile.register
def _(node: A.WithNamed, store: TripleStore) -> DataFrame:
    """Named subqueries evaluate ONCE into materialized solution sets
    (localCheckpoint = the reference's hash-indexed named solution set;
    ref: NamedSubqueryRoot.java), then the main pattern runs with INCLUDEs
    resolving against them. Multiple INCLUDEs of one set share the same
    materialized data — no recomputation.

    Evaluation is DEPENDENCY-ordered, not declaration-ordered: a WITH
    clause may INCLUDE a named set declared later in the query (ref:
    ASTNamedSubqueryOptimizer computes the dependency graph among
    NamedSubqueryRoots; eval fixture ticket_bg1763b)."""
    pending = dict(node.named)
    deps = {
        name: _named_includes_of(plan) & set(pending) for name, plan in pending.items()
    }
    sets: dict = {}
    scoped = store
    while pending:
        ready = [n for n in pending if not (deps[n] - set(sets))]
        if not ready:
            raise ValueError(
                "cyclic INCLUDE among named subqueries: " + ", ".join(sorted(pending))
            )
        for name in ready:
            sets[name] = _compile(pending.pop(name), scoped).localCheckpoint(eager=True)
            scoped = store.with_named_sets(sets)
    return _compile(node.child, scoped)


@_compile.register
def _(node: A.NamedInclude, store: TripleStore) -> DataFrame:
    sets = getattr(store, "named_sets", None) or {}
    if node.name not in sets:
        raise ValueError(f"INCLUDE of undeclared named subquery %{node.name}")
    return sets[node.name]


def _store_literal_index(store: TripleStore) -> DataFrame:
    """Full-text index over the store's string literals: doc = subject, text
    = concatenated literal values (the reference's text index likewise
    indexes the lexicon's literals; ref: search/FullTextIndex.java).

    Memoized ON the store instance (not a module dict keyed by id(store):
    CPython reuses ids after GC, which could hand a stale checkpointed index
    to an unrelated store, and the module dict never shrank — ADVICE r2)."""
    from blazegraph_database_spark.operators import fulltext

    cached = getattr(store, "_ft_literal_index", None)
    if cached is None:
        docs = _store_literal_texts(store)
        cached = fulltext.inverted_index(docs, id_col="s", text_col="text").localCheckpoint()
        store._ft_literal_index = cached
    return cached


def _store_subject_index(store: TripleStore) -> DataFrame:
    """Full-text index over SUBJECT URIs (ref: BDS.java SUBJECT_SEARCH —
    "search against the URIs"): doc id = the subject term, text = its
    lexical form, tokenized like any literal."""
    from blazegraph_database_spark.operators import fulltext

    cached = getattr(store, "_ft_subject_index", None)
    if cached is None:
        docs = (
            _dataset_scoped_df(store).select("s").distinct()
            .select("s", F.col("s").alias("text"))
        )
        cached = fulltext.inverted_index(docs, id_col="s", text_col="text").localCheckpoint()
        store._ft_subject_index = cached
    return cached


def _store_literal_texts(store: TripleStore) -> DataFrame:
    """(s, text): each subject's concatenated string literals — the document
    surface behind the full-text index; bds:matchExact / bds:matchRegex
    post-filter against it (ref: BDS.java MATCH_EXACT/MATCH_REGEX filter
    the matched literal's text)."""
    cached = getattr(store, "_ft_literal_texts", None)
    if cached is None:
        cached = (
            _dataset_scoped_df(store).filter(F.col("o_dt") == "string")
            .groupBy("s")
            .agg(F.concat_ws(" ", F.collect_list("o_lex")).alias("text"))
            .localCheckpoint()
        )
        store._ft_literal_texts = cached
    return cached


def _parse_bds_common(sp, pred: str | None, opts: dict, flags: dict) -> bool:
    """Consume one SHARED BDS option magic triple into opts/flags; True if
    handled. bds:search and bds:searchInSearch route through the same
    FullTextQuery option set in the reference, so the parse is shared."""
    if pred == "bds:matchAllTerms":
        opts["match_all"] = const_lex(sp.o) == "true"
    elif pred == "bds:minRelevance":
        opts["min_relevance_ppm"] = int(float(const_lex(sp.o)) * 1_000_000)
    elif pred == "bds:maxRank":
        opts["max_rank"] = int(const_lex(sp.o))
    elif pred == "bds:maxRelevance":
        # round, not truncate: the bound is inclusive, and a cap echoed
        # back from a hit's own bds:relevance must keep it
        opts["max_relevance_ppm"] = round(float(const_lex(sp.o)) * 1_000_000)
    elif pred == "bds:matchExact":
        flags["match_exact"] = const_lex(sp.o) == "true"
    elif pred == "bds:matchRegex":
        flags["match_regex"] = const_lex(sp.o)
    elif pred == "bds:prefixMatch":
        # every query token matches as a prefix (ref: BDS.PREFIX_MATCH —
        # equivalent to suffixing '*' on each token)
        flags["prefix_all"] = const_lex(sp.o) == "true"
    elif pred == "bds:searchTimeout":
        # accepted, advisory (ref: BDS.SEARCH_TIMEOUT bounds the B+Tree
        # scan): deadlines here are enforced per-query by the REST job
        # groups (server/rest.py), not per-operator
        pass
    else:
        return False
    return True


def _bds_text_filter(store, query, match_exact, match_regex, subject_search=False):
    """Hit-text filter closure (ref: BDS.java MATCH_EXACT/MATCH_REGEX):
    runs inside search() BEFORE ranking and the maxRank cut, against the
    matched document's text surface — the subject URI itself under
    subjectSearch, the memoized (s, text) literal surface otherwise.
    None when no filter option is set."""
    if not match_exact and match_regex is None:
        return None

    def scored_filter(scored):
        if subject_search:
            text = F.col("id")  # the doc IS the subject lexical
        else:
            texts = _store_literal_texts(store).withColumnRenamed("s", "id")
            scored = scored.join(texts, on="id")
            text = F.col("text")
        if match_exact:
            scored = scored.filter(text.contains(query))
        if match_regex is not None:
            scored = scored.filter(text.rlike(match_regex))
        return scored.drop("text")

    return scored_filter


# Built-in service namespaces: queries may use the declared full-IRI form or
# the compact prefix form; both resolve to the same internal service (the
# reference registers these factories under the full URIs; ref:
# ServiceRegistry.java defaults + BDS.java / GASService.java namespaces).
_BUILTIN_SERVICE_NS = {
    "http://www.bigdata.com/rdf/search#": "bds:",
    "http://www.bigdata.com/rdf/gas#": "gas:",
    "http://www.bigdata.com/rdf/geospatial#": "geo:",
    "http://www.bigdata.com/rdf#": "bd:",
    "http://www.bigdata.com/rdf/fts#": "fts:",
}


def _compact_builtin_iri(iri: str | None) -> str | None:
    if iri is None:
        return None
    for ns, pfx in _BUILTIN_SERVICE_NS.items():
        if iri.startswith(ns):
            return pfx + iri[len(ns):]
    return iri


@_compile.register
def _(node: A.Service, store: TripleStore) -> DataFrame:
    """SERVICE <iri> { ... }: built-in magic-predicate services evaluate
    against the store; anything else dispatches through the service registry
    (remote endpoints need a transport-backed registration — no network
    here). Ref: ServiceRegistry.java dispatch in AST2BOpUtility."""
    from blazegraph_database_spark.operators import fulltext, service

    if isinstance(node.iri, Var):
        raise ValueError(
            f"SERVICE ?{node.iri.name}: a variable service endpoint needs a "
            "sibling pattern in the same group binding it (e.g. VALUES)"
        )

    collect_sps = _collect_sps

    if _is_label_service(node):
        # standalone (no sibling patterns in its group): incoming = unit
        # solution; manual-mode targets with no bound entity come back
        # unbound, matching an empty automatic resolution
        return service.label_service_join(
            store, store.spark.range(1).drop("id"), collect_sps(node.pattern)
        )
    if isinstance(node.iri, str):
        # alias resolution (ref: ServiceRegistry.addAlias) — an alias URI
        # dispatches exactly like its target, including remote endpoints
        resolved = service.resolve_service_alias(node.iri)
        if resolved != node.iri:
            node = A.Service(resolved, node.pattern, node.raw, node.silent, node.prologue)
    svc_iri = _compact_builtin_iri(node.iri)
    if svc_iri == "bd:alp":
        # ref: ASTALPServiceOptimizer.java / BD.java ALP_SERVICE — the
        # configurable arbitrary-length-path service (bounds, edge
        # constraints, bidirectionality); needs the BGP node itself (its
        # hints carry the alp.* parameters), not just the pattern list
        return service.alp_service(store, node.pattern)
    if svc_iri == "gas:service":
        return service.gas_service(store, collect_sps(node.pattern))
    if svc_iri == "geo:search":
        return service.geo_search_service(store, collect_sps(node.pattern))
    if svc_iri == "bd:sample":  # ref: eval/SampleServiceFactory.java:101
        return service.bd_sample_service(store, collect_sps(node.pattern))
    if svc_iri == "bd:slice":  # ref: eval/SliceServiceFactory.java:110
        return service.bd_slice_service(store, collect_sps(node.pattern))
    if svc_iri == "bd:values":  # ref: eval/ValuesServiceFactory.java:92
        return service.bd_values_service(store, collect_sps(node.pattern))
    if svc_iri == "bd:history":  # ref: history/HistoryServiceFactory.java:1
        return service.bd_history_service(store, collect_sps(node.pattern))
    if svc_iri == "bd:describe":  # ref: cache/DescribeServiceFactory.java
        return service.bd_describe_service(store, collect_sps(node.pattern))
    if svc_iri == "bd:rdrhistory":
        # ref: ServiceRegistry.java:170 RDRHistoryServiceFactory + sail/
        # RDRHistory.java:61 — change events recorded as RDR statement
        # metadata (<<s p o>> blaze:history:added|removed "commit"^^xsd:long)
        # and queried with ORDINARY SPARQL-star patterns: the block compiles
        # unchanged against the history store view (ever-existed statements
        # + metadata rows), so sid joins, accessors and filters all work.
        us = getattr(store, "updatable", None)
        if us is None:
            raise ValueError(
                "SERVICE <bd:rdrhistory> needs an updatable store (query via "
                "UpdatableStore.query_store or the REST endpoint)"
            )
        return _compile(node.pattern, us.history_store())
    if svc_iri == "fts:search":  # ref: fts/FulltextSearchServiceFactory.java
        return service.fts_search_service(
            store, collect_sps(node.pattern), transport=getattr(store, "fts_transport", None)
        )
    if service.stored_query_lookup(node.iri) is not None:
        # ref: storedquery/StoredQueryService.java — app-registered IRIs
        return service.call_stored_query(store, node.iri, collect_sps(node.pattern))
    if svc_iri == "bds:searchInSearch":
        # ref: eval/SearchInSearchServiceFactory.java (registered under
        # BDS.SEARCH_IN_SEARCH, ServiceRegistry.java:138): the full-text
        # hit set used as a FILTER on the search var — the service yields
        # the DISTINCT subjects holding a matching literal, and the
        # enclosing group's natural join on ?var keeps only incoming
        # bindings linked to a matched literal (the reference's
        # iterate-and-prune over the incoming binding sets). No rank cut
        # by default (ref uses DEFAULT_MAX_RANK = MAX_VALUE), so no
        # global sort: the hit set stays an unordered semi-join input.
        pats = collect_sps(node.pattern)
        subj, query, opts = None, None, {}
        flags = {"match_exact": False, "match_regex": None}
        for sp in pats:
            pred = _compact_builtin_iri(const_lex(sp.p)) if is_const(sp.p) else None
            if pred == "bds:searchInSearch":
                subj, query = sp.s, const_lex(sp.o)
            elif not _parse_bds_common(sp, pred, opts, flags):
                raise ValueError(
                    "SERVICE <bds:searchInSearch> supports searchInSearch/"
                    f"matchAllTerms/minRelevance/maxRelevance/maxRank/"
                    f"matchExact/matchRegex, got {pred!r}"
                )
        if subj is None or not isinstance(subj, Var):
            raise ValueError(
                'SERVICE <bds:searchInSearch> needs `?var bds:searchInSearch "query"`'
            )
        opts.setdefault("max_rank", None)
        patterns = [
            (t.rstrip("*"), t.endswith("*") or flags.get("prefix_all", False))
            for t in query.split()
        ]
        hits = fulltext.search(
            _store_literal_index(store),
            patterns,
            scored_filter=_bds_text_filter(
                store, query, flags["match_exact"], flags["match_regex"]
            ),
            **opts,
        )
        return hits.select(F.col("id").alias(subj.name)).distinct()
    if svc_iri == "bds:search":
        # magic predicates inside the block (ref: BDS.java search vocabulary)
        pats = collect_sps(node.pattern)
        if not any(
            is_const(sp.p)
            and _compact_builtin_iri(const_lex(sp.p)) == "bds:subjectSearch"
            and const_lex(sp.o) == "true"
            for sp in pats
        ):
            # default contract = the INLINE form's: the search var binds the
            # MATCHED LITERAL (ref: the reference's own ticket_bg1256
            # fixture — SERVICE bds:search yields the literal, which joins
            # object-position patterns); subjectSearch=true switches to the
            # URI index below
            return _bds_inline_search(store, pats)
        subj, query, opts = None, None, {}
        flags = {"match_exact": False, "match_regex": None}
        rel_var = rank_var = count_var = None
        subject_search = False
        for sp in pats:
            pred = _compact_builtin_iri(const_lex(sp.p)) if is_const(sp.p) else None
            if pred == "bds:search":
                subj, query = sp.s, const_lex(sp.o)
            elif _parse_bds_common(sp, pred, opts, flags):
                pass  # shared option set (matchAllTerms/relevance/rank caps/filters)
            elif pred == "bds:minRank":  # minRank+maxRank page (BDS.java)
                opts["min_rank"] = int(const_lex(sp.o))
            elif pred == "bds:subjectSearch":  # BDS.java SUBJECT_SEARCH
                subject_search = const_lex(sp.o) == "true"
            elif pred == "bds:relevance" and isinstance(sp.o, Var):
                rel_var = sp.o.name  # bind the hit's relevance score
            elif pred == "bds:rank" and isinstance(sp.o, Var):
                rank_var = sp.o.name  # bind the hit's 1-based rank
            elif pred == "bds:rangeCount" and isinstance(sp.o, Var):
                count_var = sp.o.name  # bind the total hit count
        if subj is None or not isinstance(subj, Var):
            raise ValueError("SERVICE <bds:search> needs `?var bds:search \"query\"`")
        patterns = [
            (t.rstrip("*"), t.endswith("*") or flags.get("prefix_all", False))
            for t in query.split()
        ]
        idx = _store_subject_index(store) if subject_search else _store_literal_index(store)
        hits = fulltext.search(
            idx,
            patterns,
            scored_filter=_bds_text_filter(
                store, query, flags["match_exact"], flags["match_regex"],
                subject_search=subject_search,
            ),
            count_col=count_var,
            **opts,
        )
        if count_var is not None:
            # reference semantics: ONE solution binding only rangeCount
            # (hits suppressed; zero-hit searches bind 0) — ref:
            # SearchServiceFactory.java:649. Other requested service vars
            # ride along UNBOUND (typed NULLs) so projections over them
            # stay valid instead of raising (review r5-5).
            out = hits.withColumn(subj.name, F.lit(None).cast("string"))
            if rel_var is not None:
                out = out.withColumn(rel_var, F.lit(None).cast("double"))
            if rank_var is not None:
                out = out.withColumn(rank_var, F.lit(None).cast("int"))
            return out
        sel = [F.col("id").alias(subj.name)]
        if rel_var is not None:  # score as the 0..1 relevance the ref binds
            sel.append((F.col("score_ppm").cast("double") / 1_000_000).alias(rel_var))
        if rank_var is not None:
            sel.append(F.col("rank").alias(rank_var))
        return hits.select(*sel)
    try:
        fn = service.lookup(node.iri)
        out = fn(
            store.spark,
            {
                "query": f"{node.prologue}SELECT * WHERE {{ {node.raw} }}",
                "pattern": node.pattern,
            },
        )
    except Exception:
        if node.silent:  # SERVICE SILENT failure → one empty solution (spec)
            return store.spark.range(1).drop("id")
        raise
    return out


def _path_nullable(path) -> bool:
    """True iff the path expression's language contains the empty word
    (matches zero-length) — Star/ZeroOrOne/`{0,n}` introduce epsilon, Inv
    preserves it, Alt needs either arm, Seq needs both."""
    if isinstance(path, (A.Star, A.ZeroOrOne)):
        return True
    if isinstance(path, A.Bounded):
        # `p{0,n}` matches zero-length exactly like `*` (ref ALP
        # LOWER_BOUND=0), and m applications of a nullable inner contain
        # epsilon too; without this a CONSTANT endpoint absent from the
        # graph zero-matched under the geared branch but not the
        # full-closure one (r10 review x2). An inverted range `{m,n}` with
        # n<m is the EMPTY language — no epsilon even for a nullable inner
        # (compile_path yields no pairs, so a constant endpoint must not
        # gain a spurious identity row here).
        if path.upper is not None and path.upper < path.lower:
            return False
        return path.lower == 0 or _path_nullable(path.path)
    if isinstance(path, A.Plus):
        return _path_nullable(path.path)  # (p*)+ contains epsilon
    if isinstance(path, A.Inv):
        return _path_nullable(path.path)
    if isinstance(path, A.Alt):
        return _path_nullable(path.left) or _path_nullable(path.right)
    if isinstance(path, A.Seq):
        return _path_nullable(path.left) and _path_nullable(path.right)
    return False  # Link / NegatedPropertySet / str


@_compile.register
def _(node: A.PathPattern, store: TripleStore) -> DataFrame:
    from blazegraph_database_spark.operators.paths import compile_path

    if node.g is not None and is_const(node.g):
        store = store.graph(const_lex(node.g))
    elif node.g is None and store.has_graphs:
        # FROM dataset scoping for default-graph paths (same rule the SP
        # compiler applies): an empty concrete default set matches nothing
        dd = getattr(store, "dataset_default", None)
        if dd is not None:
            cond = F.col("g").isin(list(dd)) if dd else F.lit(False)
            scoped = TripleStore(store.df.filter(cond))
            scoped.track_dt = store.track_dt
            store = scoped
    with_graph = node.g is not None and isinstance(node.g, Var)
    if with_graph:
        if not store.has_graphs:
            raise ValueError("path inside GRAPH ?var over a triples-only store")
        named = getattr(store, "dataset_named", None)
        if named is not None:
            cond = F.col("g").isin(list(named)) if named else F.lit(False)
            scoped = TripleStore(store.df.filter(cond))
            scoped.track_dt = store.track_dt
            store = scoped
    pairs = _anchored_path_pairs(store, node, with_graph)
    if pairs is None:
        pairs = compile_path(store, node.path, with_graph=with_graph)  # DF([g,] s, o)
    if _path_nullable(node.path):
        # spec ALP: when the path language contains epsilon, a CONSTANT
        # endpoint zero-length-matches itself even when the term is absent
        # from the graph (W3C ZeroOrMorePath starts at x). Keyed on
        # nullability, not the outermost node, so ^p*, (p*|q), p?/q?
        # wrappers all get it. Anti-join instead of a trailing distinct:
        # deduping <=2 identity rows must not re-shuffle the whole closure.
        consts = [
            const_lex(p) for p in (node.s, node.o) if p is not None and is_const(p)
        ]
        if consts:
            spark = store.spark
            ident = spark.createDataFrame(
                [(c, c) for c in set(consts)], "s string, o string"
            )
            if with_graph:
                ident = store.df.select("g").distinct().crossJoin(ident)
            on = (["g"] if with_graph else []) + ["s", "o"]
            pairs = pairs.unionByName(ident.join(pairs, on=on, how="left_anti"))
    df = pairs
    sel = []
    positions = (("s", node.s), ("o", node.o)) + ((("g", node.g),) if with_graph else ())
    for col, pos in positions:
        if is_const(pos):
            df = df.filter(F.col(col) == const_lex(pos))
        else:
            sel.append(F.col(col).alias(pos.name))
    return df.select(*sel) if sel else df.select()


# strategy cutoff shared with the anchored bd:alp SERVICE (operators/paths)
from blazegraph_database_spark.operators.paths import (  # noqa: E402
    GEAR_MIN_BASE_PAIRS as _GEAR_MIN_BASE_PAIRS,
)


def _closure_bases(path, acc=None) -> list:
    """Base paths of every unbounded-closure component (`+`, `*`, `{m,}`)
    reachable WITHOUT crossing into another closure's base — the components
    whose global closure a constant anchor can avoid materializing."""
    if acc is None:
        acc = []
    if isinstance(path, (A.Plus, A.Star)):
        acc.append(path.path)
    elif isinstance(path, A.Bounded):
        if path.upper is None:
            acc.append(path.path)
        else:  # (:p+){1,3}: the nested closure still warrants gearing
            _closure_bases(path.path, acc)
    elif isinstance(path, (A.Inv, A.ZeroOrOne)):
        _closure_bases(path.path, acc)
    elif isinstance(path, (A.Seq, A.Alt)):
        _closure_bases(path.left, acc)
        _closure_bases(path.right, acc)
    return acc


def _base_pairs_hint(store: TripleStore, base_path, with_graph: bool) -> int:
    """Size of a closure component's base relation, capped at the gearing
    threshold + 1. Three tiers (r9 verdict item 5 + r10 review):

    - a NESTED-closure base (`(:a/:p+)+`) reports large without any probe —
      compiling it to count it would eagerly run the inner closure, the
      exact state gearing avoids (the geared evaluator recurses instead);
    - a single-Link (possibly inverted) base answers from per-predicate
      stats when the store already has them (free; exactness doesn't
      matter for a strategy threshold) — the main store computes stats
      once for BGP join ordering, so this is the common case. A THROWAWAY
      graph/dataset-scoped store without stats keeps the bounded probe:
      stats() there is a full scan+shuffle that dies with the store;
    - composite fixed-length bases keep the limit-bounded probe, which
      never scans more than threshold+1 rows."""
    from blazegraph_database_spark.operators.paths import compile_path, contains_closure

    if contains_closure(base_path):
        return _GEAR_MIN_BASE_PAIRS + 1
    p = base_path
    while isinstance(p, A.Inv):
        p = p.path
    if isinstance(p, str):
        p = A.Link(p)
    if isinstance(p, A.Link) and store._stats is not None:
        st = store.stats().get(p.iri)
        return st.count if st is not None else 0
    df = compile_path(store, base_path, with_graph=with_graph)
    return df.limit(_GEAR_MIN_BASE_PAIRS + 1).count()


def _anchored_path_pairs(store: TripleStore, node, with_graph: bool):
    """GEARED evaluation for paths with a CONSTANT endpoint (ref:
    ArbitraryLengthPathNode + the gearing query hint, TestGearingQueryHint:
    forward gearing expands the frontier from a bound subject, reverse
    gearing from a bound object): a seeded Δ-expansion reads only the
    reachable-from-seed region instead of materializing the graph's
    ALL-PAIRS closure — at 100 TB the difference between a frontier-sized
    walk and an O(|V|²)-state fixpoint. Fires on top-level `+`/`*` AND on
    composite paths (Seq/Alt/Inv/`{m,}` wrappers — `<c> :a/:b+ ?x`), where
    the anchor's frontier flows through the components via geared_reach.
    Returns the ([g,] s, o) pair DataFrame, or None when the pattern isn't
    anchored (var-var paths keep the full-closure path, which their
    semantics genuinely need), is fixed-length (Catalyst pushes the
    constant filter through plain joins itself), or every closure base is
    schema-sized (the full-closure driver tier closes those in ONE collect,
    beating diameter-many seeded rounds)."""
    from blazegraph_database_spark.operators.paths import (
        compile_path, contains_closure, geared_reach, seeded_closure, _gcols,
    )

    s_const, o_const = is_const(node.s), is_const(node.o)
    if not (s_const or o_const):
        return None
    bases = _closure_bases(node.path)
    if not bases:
        return None
    if all(
        _base_pairs_hint(store, b, with_graph) <= _GEAR_MIN_BASE_PAIRS
        for b in bases
    ):
        return None
    k = _gcols(with_graph)
    forward = s_const  # prefer forward gearing when both ends are bound
    seed = const_lex(node.s if forward else node.o)
    if isinstance(node.path, (A.Plus, A.Star)) and not contains_closure(
        node.path.path
    ):
        # closure-free inner: the single-seed walk over the (lazy) compiled
        # base; a closure-CONTAINING inner ((:a/:p+)+) falls through to
        # geared_reach, which recurses instead of materializing it
        base = compile_path(store, node.path.path, with_graph=with_graph)
        if not forward:
            base = base.select(*k, F.col("o").alias("s"), F.col("s").alias("o"))
        reached = seeded_closure(base, seed, keys=k)  # ([g,] o), >= 1 hops
    else:
        frontier = store.spark.createDataFrame([(seed,)], "o string")
        if with_graph:
            frontier = store.df.select("g").distinct().crossJoin(frontier)
        reached = geared_reach(store, node.path, frontier, with_graph, forward)
    pairs = reached.select(*k, F.lit(seed).alias("s"), F.col("o"))
    if not forward:
        pairs = pairs.select(*k, F.col("o").alias("s"), F.col("s").alias("o"))
    # Star's zero-length component for the CONSTANT endpoint is handled by
    # the _path_nullable identity union in the caller; zero-length matches
    # to OTHER nodes only arise for var-var patterns, which never take
    # this path.
    return pairs


# ---------------------------------------------------------------- frontends --
def explain_trace(store: TripleStore, node) -> list[dict]:
    """Engine-level optimizer trace (the reference's explain page shows its
    static-optimizer join order and range counts the same way): one entry
    per BGP with the chosen join order, per-input row estimates, broadcast
    decisions, star-fusion count, and the id-join variable set. Building
    the plan runs no Spark job beyond the stats/probes the compiler itself
    uses."""
    import copy

    traced = copy.copy(store)
    traced._trace = []
    evaluate(traced, node)
    return traced._trace


def ask(store: TripleStore, node) -> bool:
    """ASK query. Ref: AST QueryType.ASK."""
    return len(evaluate(store, node).take(1)) > 0


def construct(store: TripleStore, node, template: list[tuple]) -> DataFrame:
    """CONSTRUCT: instantiate (s,p,o) templates per solution, preserving the
    bound term's datatype via the compiler's `<var>__dt` companion columns
    (the reference keeps IV type through ConstructNode). Ref: ConstructNode."""
    sol = evaluate(store.with_dt_tracking(), node)
    return instantiate_template(sol, template)


def instantiate_template(
    sol: DataFrame,
    template: list[tuple],
    emit_g: bool = False,
    target_graph: str | None = None,
) -> DataFrame:
    """(s,p,o[,g]) template instantiation over a bindings DataFrame.
    Object-var datatypes come from `<var>__dt` companions when present;
    BIND-created vars without one default to 'string'. With ``emit_g`` a
    `g` column is added: an entry's explicit GRAPH wrapper wins, else
    ``target_graph`` (the UPDATE's WITH <g>), else NULL (default graph)."""
    parts = []
    for t in template:
        s, p, o = t[0], t[1], t[2]
        g = t[3] if len(t) > 3 else target_graph
        def col_of(pos, dt_if_const):
            if isinstance(pos, Var):
                dt = (
                    F.coalesce(F.col(f"{pos.name}__dt"), F.lit("string"))
                    if f"{pos.name}__dt" in sol.columns
                    else F.lit("string")
                )
                return F.col(pos.name).cast("string"), dt
            if isinstance(pos, A.Emb):  # template emits the statement-id term
                es, _ = col_of(pos.s, "iri")
                ep, _ = col_of(pos.p, "iri")
                eo, eodt = col_of(pos.o, "iri" if not isinstance(pos.o, Lit) else pos.o.dt)
                if isinstance(pos.o, Lit):
                    eodt = F.lit(pos.o.dt)
                sid = F.concat(
                    F.lit("<<"), es, F.lit("|"), ep, F.lit("|"), eo, F.lit("|"), eodt, F.lit(">>")
                )
                return sid, F.lit(DT_SID)
            return F.lit(const_lex(pos)), F.lit(dt_if_const)
        sc, _ = col_of(s, "iri")
        pc, _ = col_of(p, "iri")
        oc, odt = col_of(o, "iri" if not isinstance(o, Lit) else o.dt)
        if isinstance(o, Lit):
            odt = F.lit(o.dt)
        cols = [sc.alias("s"), pc.alias("p"), oc.cast("string").alias("o_lex"),
                odt.alias("o_dt")]
        if emit_g:
            gc = F.col(g.name) if isinstance(g, Var) else F.lit(g)
            cols.append(gc.cast("string").alias("g"))
        parts.append(F.struct(*cols))
    # ONE pass over the bindings: explode an array of per-template structs.
    # The union-of-selects alternative re-evaluates the WHERE join once per
    # template triple — an 8-entry CONSTRUCT (BSBM Explore Q12) paid the
    # join 8x; at 100 TB that's 8 full shuffles instead of one.
    return (
        sol.select(F.explode(F.array(*parts)).alias("__t"))
        .select("__t.*")
        .distinct()
    )


# reference describeMode enum → describe() args (ref: QueryHints.java:587
# DESCRIBE_MODE / DescribeModeEnum + ASTDescribeOptimizer):
# SymmetricOneStep = fwd+rev with no bnode recursion. Shared by the REST
# describeMode= parameter and the hint:Query hint:describeMode query hint.
DESCRIBE_MODES = {
    "cbd": ("cbd", None),
    "scbd": ("scbd", None),
    "forwardonestep": ("fwd", None),
    "symmetriconestep": ("scbd", 0),
    "fwd": ("fwd", None),
    "rev": ("rev", None),
}


def describe_kwargs(mode: str | None, iterations: int | None) -> dict:
    """Map a describeMode name + iteration limit onto describe() kwargs;
    raises on unknown modes (shared REST-param / query-hint validation)."""
    kwargs: dict = {}
    if mode is not None:
        key = mode.strip().lower()
        if key not in DESCRIBE_MODES:
            raise ValueError(
                f"unknown describeMode {mode!r}; one of "
                "CBD, SCBD, ForwardOneStep, SymmetricOneStep"
            )
        m, forced_depth = DESCRIBE_MODES[key]
        kwargs["mode"] = m
        if forced_depth is not None:
            kwargs["max_depth"] = forced_depth
    if iterations is not None:
        kwargs["max_depth"] = int(iterations)
    return kwargs


def describe(
    store: TripleStore,
    subjects: DataFrame | list[str],
    max_depth: int = 8,
    mode: str = "cbd",
) -> DataFrame:
    """DESCRIBE with configurable mode (ref: eval/CBD.java plus the
    reference's describeMode query hint):

    * ``cbd`` (default): outbound statements of the resources, recursively
      expanded through blank-node objects — a bnode value's own description
      is part of the CBD; ``max_depth`` guards bnode cycles.
    * ``fwd``: outbound statements only, no bnode recursion.
    * ``rev``: inbound statements only (who references the resource).
    * ``scbd``: symmetric CBD — the CBD plus inbound statements of the
      described resources.
    """
    if isinstance(subjects, list):
        subjects = store.spark.createDataFrame([(s,) for s in subjects], "s string")
    frontier = subjects.select("s").distinct()
    inbound = None
    if mode in ("rev", "scbd"):
        inbound = store.df.join(
            F.broadcast(frontier.select(F.col("s").alias("o_lex"))), on="o_lex"
        ).select("s", "p", "o_lex", "o_dt", *(["g"] if "g" in store.df.columns else []))
        if mode == "rev":
            return inbound
    seen = frontier.localCheckpoint()
    out = store.df.join(F.broadcast(frontier), on="s")
    if mode != "fwd":
        for _ in range(max_depth):
            bnodes = (
                out.filter(F.col("o_dt") == "bnode")
                .select(F.col("o_lex").alias("s"))
                .distinct()
                .join(seen, on="s", how="left_anti")
                .localCheckpoint()
            )
            if bnodes.isEmpty():
                break
            seen = seen.unionByName(bnodes)
            out = out.unionByName(store.df.join(F.broadcast(bnodes), on="s"))
    if inbound is not None:  # scbd: CBD ∪ inbound arcs
        out = out.unionByName(inbound.select(*out.columns)).distinct()
    return out
