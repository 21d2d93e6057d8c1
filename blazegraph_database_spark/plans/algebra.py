"""SPARQL algebra nodes (logical plan).

Reference analog: the AST node hierarchy under
bigdata-core/bigdata-rdf/src/java/com/bigdata/rdf/sparql/ast/ —
StatementPatternNode, JoinGroupNode, UnionNode, FilterNode, AssignmentNode
(BIND), BindingsClause (VALUES), ExistsNode, GroupByNode/HavingNode,
OrderByNode, SliceNode, ArbitraryLengthPathNode, SubqueryRoot, ConstructNode.

These are pure data; :mod:`blazegraph_database_spark.plans.compiler` lowers
them to DataFrame plans (the reference's AST2BOpUtility analog — except most
of the reference's ~60 optimizer passes are subsumed by Catalyst).

Filter/Bind expressions are unresolved pyspark ``Column`` objects built with
``F.col("<var>")`` (see functions/sparql_funcs.py helpers), so the whole
expression language stays JVM-side in whole-stage codegen.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Union

from pyspark.sql import Column

from blazegraph_database_spark.model.terms import Var

Pos = Union[Var, str, Any]  # pattern position: Var | IRI/str | Lit


@dataclass(frozen=True)
class SP:
    """Statement (triple) pattern. Ref: StatementPatternNode."""

    s: Pos
    p: Pos
    o: Pos
    g: Pos | None = None


@dataclass(frozen=True)
class Emb:
    """Embedded statement term `<<s p o>>` (RDF-star / reference RDR mode).

    Usable at SP.s or SP.o; positions are Var or constants. Compiles to a
    join between the metadata pattern and the inner statement pattern via a
    deterministic statement-id encoding (ref: the SidIV statement-identifier
    IVs, bigdata-core/bigdata-rdf/.../internal/impl/bnode/SidIV.java, and the
    RDR-enabled BigdataNTriplesParser)."""

    s: Pos
    p: Pos
    o: Pos


# -- property path expressions (ref: PathNode / ArbitraryLengthPathNode) -----
@dataclass(frozen=True)
class Link:
    iri: str


@dataclass(frozen=True)
class Inv:
    path: Any


@dataclass(frozen=True)
class Seq:
    left: Any
    right: Any


@dataclass(frozen=True)
class Alt:
    left: Any
    right: Any


@dataclass(frozen=True)
class Star:
    path: Any  # zero or more


@dataclass(frozen=True)
class Plus:
    path: Any  # one or more


@dataclass(frozen=True)
class ZeroOrOne:
    path: Any


@dataclass(frozen=True)
class Bounded:
    """Bounded-length path `p{m,n}` — between ``lower`` and ``upper`` hops
    (``upper=None`` = unbounded, `p{m,}`). Ref: ArbitraryLengthPathNode.java:95
    — the ALP node carries LOWER_BOUND/UPPER_BOUND beyond the `? + *`
    sugar (`*` = {0,∞}, `+` = {1,∞}, `?` = {0,1})."""

    path: Any
    lower: int
    upper: Any  # int | None


@dataclass(frozen=True)
class NegatedPropertySet:
    """!(:p1|...|^:q1|...) — forward edges whose predicate is outside
    `forward` plus reversed edges whose predicate is outside `inverse`;
    a direction with no members matches nothing in that direction (SPARQL
    1.1 NPS semantics). Ref: PathNode + ASTPropertyPathOptimizer."""

    forward: tuple = ()
    inverse: tuple = ()
    def __init__(self, forward=(), inverse=()):
        object.__setattr__(self, "forward", tuple(forward))
        object.__setattr__(self, "inverse", tuple(inverse))


@dataclass(frozen=True)
class PathPattern:
    """s/o joined through a property path; optional graph term so paths work
    inside GRAPH ?g / GRAPH <g>. Ref: ArbitraryLengthPathNode."""

    s: Pos
    path: Any
    o: Pos
    g: Pos | None = None


@dataclass(frozen=True)
class BGP:
    """Basic graph pattern: selectivity-ordered multi-join of patterns.

    ``hints`` (optional) carries Blazegraph query hints scoped to this
    group (ref: QueryHints.java / ASTQueryHintOptimizer.java):
    ``{"optimizer": "None", "run_first": frozenset(idx), "run_last":
    frozenset(idx)}`` — indices into ``patterns``. They override the
    compiler's selectivity ordering."""

    patterns: tuple
    hints: Any = None

    def __init__(self, patterns, hints=None):
        object.__setattr__(self, "patterns", tuple(patterns))
        object.__setattr__(self, "hints", hints)

    def __hash__(self):
        return hash(self.patterns)


@dataclass(frozen=True)
class Join:
    left: Any
    right: Any


@dataclass(frozen=True)
class LeftJoin:
    """OPTIONAL (with optional embedded FILTER as join condition)."""

    left: Any
    right: Any
    condition: Column | None = None


@dataclass(frozen=True)
class Union2:
    left: Any
    right: Any


@dataclass(frozen=True)
class Minus:
    left: Any
    right: Any


@dataclass(frozen=True)
class Filter:
    """``refs`` (optional) carries the variable names the condition's text
    referenced, captured by the parser — Column expressions are opaque, and
    the EXISTS compiler needs the names to hoist outer-correlated filters
    into the semi-join condition (SPARQL substitution semantics)."""

    condition: Column
    child: Any
    refs: tuple = ()

    def __init__(self, condition, child, refs=()):
        object.__setattr__(self, "condition", condition)
        object.__setattr__(self, "child", child)
        object.__setattr__(self, "refs", tuple(refs))


@dataclass(frozen=True)
class Extend:
    """BIND(expr AS ?var). Ref: AssignmentNode.

    ``conditional``: bind only when ?var is UNBOUND in the row, keep the
    existing binding otherwise (never filter) — the reference's
    ConditionalBind semantics for the spec-illegal re-binding of an
    in-scope var (eval fixtures bindingsWithSubquery03a/b/05; per SPARQL
    §10.1 such a query is a syntax error, so no spec-compliant query ever
    takes this path). The parser sets it only when a preceding sibling can
    bind the target."""

    child: Any
    var: str
    expr: Column
    conditional: bool = False
    # the expr is a typed-arithmetic result: string-typed column, numeric
    # VALUE — ConditionalBind compares it by value (set by the parser from
    # its per-parse registry; carried on the node so the annotation never
    # leaks across queries)
    arith_lexical: bool = False


@dataclass(frozen=True)
class Values:
    """Inline solution sequence. Ref: BindingsClause."""

    rows: tuple
    child: Any | None = None
    def __init__(self, rows, child=None):
        object.__setattr__(self, "rows", tuple(rows))
        object.__setattr__(self, "child", child)


@dataclass(frozen=True)
class SidBind:
    """``BIND(<<s p o>> AS ?sid)`` — match the embedded pattern against the
    store's statements, binding the inner vars and ``var`` to the statement
    id (the RDR BIND access path; ref: the reference's
    TestReificationDoneRightEval rdr-02a/rdr-03 fixtures + SidIV.java)."""

    child: Any
    var: str
    emb: Any


@dataclass(frozen=True)
class Exists:
    """FILTER [NOT] EXISTS — semi/anti join. Ref: ExistsNode."""

    child: Any
    pattern: Any
    negate: bool = False


@dataclass(frozen=True)
class ExistsFlag:
    """EXISTS used INSIDE a value expression: binds ``var`` as a boolean
    column (true iff the pattern has a compatible solution), so arbitrary
    filter expressions can reference it — SPARQL 1.1 treats EXISTS as an
    expression operator, and the reference evaluates ExistsNode /
    NotExistsNode as value expressions via an "ask subquery" that writes a
    solution flag (ref: sparql/ast/ExistsNode.java anonymous variable).
    ``negate`` folds NOT EXISTS into the bound value."""

    child: Any
    pattern: Any
    var: str
    negate: bool = False


@dataclass(frozen=True)
class DropCols:
    """Drop helper columns (e.g. spent EXISTS flags) after their filters."""

    child: Any
    cols: tuple


@dataclass(frozen=True)
class DropInternal:
    """Drop the parser's internal bnode columns (`__anon*` / `__bn_*`) from
    a SELECT * result — anonymous blank nodes in the pattern are not
    visible variables (SPARQL §18.2.1), and leaking them poisons
    federation joins (a remote SELECT * response must not carry them)."""

    child: Any


@dataclass(frozen=True)
class Project:
    child: Any
    vars: tuple
    def __init__(self, child, vars):
        object.__setattr__(self, "child", child)
        object.__setattr__(self, "vars", tuple(vars))


@dataclass(frozen=True)
class Distinct:
    child: Any


@dataclass(frozen=True)
class OrderBy:
    child: Any
    keys: tuple  # of (Column|varname, ascending)
    def __init__(self, child, keys):
        object.__setattr__(self, "child", child)
        object.__setattr__(self, "keys", tuple(keys))


@dataclass(frozen=True)
class Slice:
    child: Any
    limit: int | None = None
    offset: int = 0


@dataclass(frozen=True)
class PerKeySlice:
    """LIMIT/OFFSET applied independently per value of ``key`` — produced by
    the compiler when a subquery carrying a Slice sits under ``GRAPH ?g``
    (the subquery evaluates once per active graph, so its LIMIT is
    per-graph; ref: ASTGraphGroupOptimizer + SubqueryRoot evaluation order).
    ``keys`` carries the subquery's ORDER BY (empty = any rows, per spec)."""

    child: Any
    key: str
    limit: int | None = None
    offset: int = 0
    keys: tuple = ()

    def __init__(self, child, key, limit=None, offset=0, keys=()):
        object.__setattr__(self, "child", child)
        object.__setattr__(self, "key", key)
        object.__setattr__(self, "limit", limit)
        object.__setattr__(self, "offset", offset)
        object.__setattr__(self, "keys", tuple(keys))


@dataclass(frozen=True)
class Group:
    """GROUP BY + aggregates (+ HAVING). Ref: GroupByNode/HavingNode."""

    child: Any
    keys: tuple
    aggs: tuple  # of (out_name, Column aggregate expr)
    having: Column | None = None
    def __init__(self, child, keys, aggs, having=None):
        object.__setattr__(self, "child", child)
        object.__setattr__(self, "keys", tuple(keys))
        object.__setattr__(self, "aggs", tuple(aggs))
        object.__setattr__(self, "having", having)


@dataclass(frozen=True)
class GraphScope:
    """GRAPH <g> { child } over a quad store. Ref: DatasetNode."""

    g: Pos
    child: Any


@dataclass(frozen=True)
class WithNamed:
    """Named subqueries (Blazegraph extension): each entry of ``named``
    evaluates ONCE into a materialized solution set, then ``child`` runs
    with INCLUDE %name resolving to it. Ref: NamedSubqueryRoot.java —
    the reference likewise evaluates the named subquery once into a
    hash-indexed solution set shared by every INCLUDE."""

    child: Any
    named: Any  # dict name -> plan

    def __init__(self, child, named):
        object.__setattr__(self, "child", child)
        object.__setattr__(self, "named", dict(named))

    def __hash__(self):  # dict member; hash by child + names
        return hash((self.child, tuple(sorted(self.named))))


@dataclass(frozen=True)
class NamedInclude:
    """INCLUDE %name — join the named solution set at this point in the
    group. Ref: NamedSubqueryInclude.java."""

    name: str


@dataclass(frozen=True)
class Service:
    """SERVICE <iri> { pattern }. Ref: ServiceNode / ServiceRegistry.java.

    ``pattern`` is the parsed inner group (used by built-in magic-predicate
    services like bds:search); ``raw`` is the inner group's token text (used
    to ship the sub-query to a remote endpoint's transport) and ``prologue``
    the enclosing query's PREFIX declarations, prepended OUTSIDE the shipped
    SELECT so the remote parser resolves the pattern's pnames."""

    iri: str
    pattern: Any
    raw: str = ""
    silent: bool = False
    prologue: str = ""


@dataclass(frozen=True)
class Dataset:
    """FROM / FROM NAMED dataset declaration wrapping a query plan: patterns
    outside GRAPH match the union of `default` graphs; GRAPH terms are
    restricted to `named`. Ref: DatasetNode dataset clauses."""

    child: Any
    default: tuple = ()
    named: tuple = ()
    def __init__(self, child, default=(), named=()):
        object.__setattr__(self, "child", child)
        object.__setattr__(self, "default", tuple(default))
        object.__setattr__(self, "named", tuple(named))
