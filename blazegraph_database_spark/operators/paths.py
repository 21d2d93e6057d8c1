"""Property-path evaluation.

Reference analog: ArbitraryLengthPathNode + ArbitraryLengthPathOp
(bigdata-core/bigdata-rdf/src/java/com/bigdata/rdf/sparql/ast/
ArbitraryLengthPathNode.java; eval in bigdata-core/bigdata-core/.../bop/paths/),
negated property sets per PathNode + ASTPropertyPathOptimizer.java.

Fixed-length constructs (/, |, ^, ?, !(...)) compile to joins/unions; `+`/`*`
run an iterative frontier expansion with a strategy choice (see
``transitive_closure``). All functions optionally carry a graph column so the
same machinery evaluates paths inside GRAPH ?var — closure joins then include
``g``, keeping each named graph's reachability separate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from blazegraph_database_spark.model.store import TripleStore
from blazegraph_database_spark.plans import algebra as A

MAX_ITERS = 64  # diameter guard; 100 TB graphs rarely exceed ~30 rounds

# Above this many base pairs, `+`/`*` switch from iterative doubling to
# semi-naive delta expansion: doubling's per-round |closure ⋈ closure| is the
# right trade for small/deep schema graphs (log2(diameter) barriers), while
# delta ⋈ base bounds per-round work on big fan-out data graphs — the
# reference's ALP operator is semi-naive for the same reason.
DOUBLING_MAX_PAIRS = 100_000


def _gcols(with_graph: bool) -> list[str]:
    return ["g"] if with_graph else []


def _link(store: TripleStore, iri: str, with_graph: bool = False) -> DataFrame:
    df = store.df.filter(F.col("p") == iri)
    return df.select(*_gcols(with_graph), F.col("s"), F.col("o_lex").alias("o"))


def _negated(store: TripleStore, nps: A.NegatedPropertySet, with_graph: bool = False) -> DataFrame:
    g = _gcols(with_graph)
    parts = []
    if nps.forward:
        parts.append(
            store.df.filter(~F.col("p").isin(list(nps.forward)))
            .select(*g, "s", F.col("o_lex").alias("o"))
        )
    if nps.inverse:
        parts.append(
            store.df.filter(~F.col("p").isin(list(nps.inverse)))
            .select(*g, F.col("o_lex").alias("s"), F.col("s").alias("o"))
        )
    if not parts:
        raise ValueError("empty negated property set")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _join_through(l: DataFrame, r: DataFrame, keys: list[str]) -> DataFrame:
    """(s→mid) ⋈ (mid→o) with graph keys carried through."""
    l2 = l.select(*keys, "s", F.col("o").alias("__mid"))
    r2 = r.select(*keys, F.col("s").alias("__mid"), "o")
    return l2.join(r2, on=keys + ["__mid"]).select(*keys, "s", "o").distinct()


def transitive_closure(
    pairs: DataFrame, max_iters: int = MAX_ITERS, keys: list[str] | None = None
) -> DataFrame:
    """All (s, o) connected by 1+ hops of `pairs` (per graph key if given).

    Strategy is chosen from the base-pair count (available for free from the
    frontier materialization): iterative doubling closes a diameter-d graph
    in ceil(log2 d) barrier rounds — the win when synchronization dominates —
    but each round self-joins the whole closure; semi-naive expands only the
    frontier (delta ⋈ base per round), which bounds per-round work on
    high-fan-out data graphs where |closure|² would blow up. The reference's
    ALP operator evaluates semi-naive; we keep doubling for the small/deep
    inputs (schema hierarchies) where it measurably wins."""
    keys = keys or []
    known = pairs.select(*keys, "s", "o").distinct().localCheckpoint()
    n_pairs = known.count()
    if not keys and n_pairs <= 20_000:
        # schema-sized input: close on the driver in one collect (same
        # size-tiered strategy as inference.rdfs.transitive_closure); falls
        # through to distributed if the closure itself explodes
        from blazegraph_database_spark.inference.rdfs import _closure_local

        closed = _closure_local([(r["s"], r["o"]) for r in known.collect()])
        if closed is not None:
            if not closed:
                return known
            return pairs.sparkSession.createDataFrame(closed, known.schema)
    from blazegraph_database_spark.operators.gas import _iter_shuffle

    use_doubling = n_pairs <= DOUBLING_MAX_PAIRS
    with _iter_shuffle(pairs.sparkSession, n_pairs):
        if use_doubling:
            for _ in range(max_iters):
                grown = _join_through(known, known, keys)
                new = grown.join(known, on=keys + ["s", "o"], how="left_anti").localCheckpoint()
                if new.isEmpty():
                    break
                known = known.unionByName(new)
            return known
        base = known
        delta = known
        deep = True
        for _ in range(max_iters):
            grown = _join_through(delta, base, keys)
            delta = grown.join(known, on=keys + ["s", "o"], how="left_anti").localCheckpoint()
            if delta.isEmpty():
                deep = False
                break
            known = known.unionByName(delta)
        if deep and not delta.isEmpty():
            # diameter > max_iters: finish with doubling (log-round
            # completion) instead of silently truncating a deep chain
            for _ in range(max_iters):
                grown = _join_through(known, known, keys)
                new = grown.join(known, on=keys + ["s", "o"], how="left_anti").localCheckpoint()
                if new.isEmpty():
                    break
                known = known.unionByName(new)
        return known


def seeded_closure(
    base: DataFrame, seed: str, keys: list[str] | None = None,
    max_iters: int = MAX_ITERS,
) -> DataFrame:
    """([g,] o): nodes reachable in >= 1 hops from a CONSTANT seed — the
    reference's GEARING-anchored ALP evaluation (ref:
    ArbitraryLengthPathNode + the gearing query hint, TestGearingQueryHint:
    forward gearing expands from the bound subject; the caller flips the
    base relation for reverse gearing from a bound object).

    Scale shape: per-round frontier ⋈ base with Δ-sized state — never the
    ALL-PAIRS transitive closure a var-var path needs. The base relation
    stays LAZY (each round re-reads the predicate-pruned link scan) so
    nothing graph-sized is ever materialized; only the frontier/known sets
    (reachable-from-seed sized) checkpoint per round."""
    keys = keys or []
    hop = base.select(*keys, F.col("s").alias("__f"), F.col("o"))
    frontier = (
        base.filter(F.col("s") == seed).select(*keys, "o").distinct().localCheckpoint()
    )
    known = frontier
    converged = False
    for _ in range(max_iters):
        grown = (
            frontier.select(*keys, F.col("o").alias("__f"))
            .join(hop, on=keys + ["__f"])
            .select(*keys, "o")
        )
        frontier = grown.join(known, on=keys + ["o"], how="left_anti").distinct().localCheckpoint()
        if frontier.isEmpty():
            converged = True
            break
        known = known.unionByName(frontier)
    if not converged:
        # pathologically deep remainder (diameter > max_iters): jump the
        # rest through the base's full closure in one composition — the
        # frontier walk must never silently truncate a deep chain
        rest = transitive_closure(base, keys=keys)
        tail = (
            frontier.select(*keys, F.col("o").alias("s"))
            .join(rest, on=keys + ["s"])
            .select(*keys, "o")
        )
        known = known.unionByName(tail).distinct()
    return known


def bounded_paths(
    base: DataFrame, lower: int, upper: int | None, keys: list[str] | None = None
) -> DataFrame:
    """Pairs connected by a walk of length in [lower, upper] hops over
    ``base`` (ref: ArbitraryLengthPathNode.java:95 LOWER_BOUND/UPPER_BOUND;
    lower >= 1 here — the zero-length component is the caller's identity
    union, like Star vs Plus).

    Bounded upper: round-capped composition — exactly-k pairs compose per
    round (k <= upper barriers; the user's literal bound keeps this small),
    pairs enter the result from round ``lower``; a drained round (DAG
    exhausted) exits early. Every round is a distinct-pair join, so state
    per round is bounded by reachable pairs, never walk multiplicity.

    Unbounded upper (`p{m,}`): walks of length >= m = exactly-(m-1)-hop
    pairs composed with the 1+ closure — one closure plus m-2 composition
    joins, not an m-deep unrolling of the closure itself."""
    keys = keys or []
    lower = max(lower, 1)
    if upper is None:
        closure = transitive_closure(base, keys=keys)
        if lower == 1:
            return closure
        cur = base  # exactly 1 hop
        for _ in range(lower - 2):
            cur = _join_through(cur, base, keys)  # exactly lower-1 hops
        return _join_through(cur, closure, keys)
    if upper < lower:
        return base.limit(0)
    cur = base.select(*keys, "s", "o").distinct().localCheckpoint()
    acc = cur if lower <= 1 else None
    for k in range(2, upper + 1):
        cur = _join_through(cur, base, keys).localCheckpoint()
        if cur.isEmpty():
            break
        if k >= lower:
            acc = cur if acc is None else acc.unionByName(cur)
    if acc is None:
        return base.limit(0)
    return acc.distinct()


def _identity_all_terms(store: TripleStore, with_graph: bool) -> DataFrame:
    """(x, x) for EVERY term of the (scoped) graph — the SPARQL ZeroLengthPath
    domain (spec: zero-length paths match all graph nodes, subjects and
    objects alike; the reference's ZeroLengthPathOp binds the same set).
    This is what makes `P*` nested under a sequence correct: `knows*/age`
    must reach nodes that have an `age` but no `knows` edges. Inherently a
    terms scan when both endpoints are unbound; constant endpoints prune it
    through the PathPattern filter."""
    k = _gcols(with_graph)
    df = store.df
    nodes = (
        df.select(*k, F.col("s").alias("n"))
        .unionByName(df.select(*k, F.col("o_lex").alias("n")))
        .distinct()
    )
    return nodes.select(*k, F.col("n").alias("s"), F.col("n").alias("o"))


def compile_path(store: TripleStore, path, with_graph: bool = False) -> DataFrame:
    """Compile a path expression to a distinct (s, o) pair DataFrame —
    ([g,] s, o) when with_graph, evaluated per named graph."""
    k = _gcols(with_graph)
    if isinstance(path, str):
        path = A.Link(path)
    if isinstance(path, A.Link):
        return _link(store, path.iri, with_graph)
    if isinstance(path, A.NegatedPropertySet):
        return _negated(store, path, with_graph)
    if isinstance(path, A.Inv):
        p = compile_path(store, path.path, with_graph)
        return p.select(*k, F.col("o").alias("s"), F.col("s").alias("o"))
    if isinstance(path, A.Seq):
        l = compile_path(store, path.left, with_graph)
        r = compile_path(store, path.right, with_graph)
        return _join_through(l, r, k)
    if isinstance(path, A.Alt):
        l = compile_path(store, path.left, with_graph)
        r = compile_path(store, path.right, with_graph)
        return l.unionByName(r).distinct()
    if isinstance(path, A.Plus):
        return transitive_closure(compile_path(store, path.path, with_graph), keys=k)
    if isinstance(path, A.Star):
        base = compile_path(store, path.path, with_graph)
        # zero-length component = identity over ALL graph terms (SPARQL
        # ZeroLengthPath; ref: ZeroLengthPathOp) — required for correctness
        # when the star nests under a sequence
        return (
            transitive_closure(base, keys=k)
            .unionByName(_identity_all_terms(store, with_graph))
            .distinct()
        )
    if isinstance(path, A.ZeroOrOne):
        base = compile_path(store, path.path, with_graph)
        return base.unionByName(_identity_all_terms(store, with_graph)).distinct()
    if isinstance(path, A.Bounded):
        base = compile_path(store, path.path, with_graph)
        if path.upper == 0:  # {0,0}: zero-length only
            return _identity_all_terms(store, with_graph)
        out = bounded_paths(base, path.lower, path.upper, keys=k)
        if path.lower == 0:
            out = out.unionByName(_identity_all_terms(store, with_graph)).distinct()
        return out
    raise TypeError(f"unknown path expression: {path!r}")
