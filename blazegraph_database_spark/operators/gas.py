"""GAS (gather-apply-scatter) graph analytics as DataFrame-Pregel.

Reference analog: the GAS engine API IGASProgram/BaseGASProgram and its
analytics (bigdata-gas/src/main/java/com/bigdata/rdf/graph/analytics/BFS.java,
SSSP.java, CC.java, PR.java; PATHS in bigdata-core/bigdata-rdf/src/java/com/
bigdata/rdf/graph/impl/bd/PATHS.java).

Spark-first: vertex state is a DataFrame keyed by vertex id; each GAS round is
  messages = frontier/state ⋈ edges  (scatter+gather = join + groupBy-agg)
  state'   = state merge messages    (apply)
with ``localCheckpoint`` per round to truncate lineage and AQE re-planning
each round's shuffle from the actual frontier size. At 100 TB-scale the edge
DataFrame would be pre-partitioned (bucketed) on ``src`` so every round's
frontier join is a co-partitioned shuffle-hash join; hub skew is handled by
AQE skew-join (enabled in session defaults).

Edges: DataFrame(src, dst[, weight]). All ids are strings (term lexicals) or
longs (dictionary-encoded) — the algorithms are agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ITERS = 64


def _chk(df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=True)


def undirect(edges: DataFrame) -> DataFrame:
    """Make an edge set symmetric (ref CC treats the graph as undirected)."""
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return edges.select("src", "dst").unionByName(rev).distinct()


def bfs(edges: DataFrame, sources: list[str], max_depth: int = MAX_ITERS) -> DataFrame:
    """Breadth-first search: (node, depth, predecessor).

    Ref: analytics/BFS.java (depth + predecessor per visited vertex).
    Predecessor choice among equal-depth parents is min(), deterministic.
    """
    spark = edges.sparkSession
    e = _chk(edges.select("src", "dst"))  # edges re-join every round: materialize once
    state = _chk(
        spark.createDataFrame([(s, 0, None) for s in sources], "node string, depth int, pred string")
    )
    frontier = state.select("node")
    for d in range(1, max_depth + 1):
        msgs = (
            frontier.join(e, frontier.node == e.src)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("src").alias("pred"))
        )
        new = msgs.join(state.select("node"), on="node", how="left_anti")
        new = _chk(new.select("node", F.lit(d).alias("depth"), "pred"))
        if new.isEmpty():
            break
        state = _chk(state.unionByName(new))
        frontier = new.select("node")
    return state


def sssp(edges: DataFrame, sources: list[str], max_iters: int = MAX_ITERS) -> DataFrame:
    """Single-source shortest paths over weighted edges: (node, dist).

    Ref: analytics/SSSP.java. Bellman-Ford-style frontier relaxation: only
    vertices whose distance improved scatter in the next round.
    """
    spark = edges.sparkSession
    e = _chk(edges.select("src", "dst", F.col("weight").cast("double").alias("weight")))
    state = _chk(spark.createDataFrame([(s, 0.0) for s in sources], "node string, dist double"))
    frontier = state
    for _ in range(max_iters):
        msgs = (
            frontier.join(e, frontier.node == e.src)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min(F.col("dist") + F.col("weight")).alias("cand"))
        )
        joined = msgs.join(state, on="node", how="left")
        improved = joined.filter(F.col("dist").isNull() | (F.col("cand") < F.col("dist"))).select(
            "node", F.col("cand").alias("dist")
        )
        improved = _chk(improved)
        if improved.isEmpty():
            break
        state = _chk(
            state.join(improved.select("node"), on="node", how="left_anti").unionByName(improved)
        )
        frontier = improved
    return state


def connected_components(edges: DataFrame, max_iters: int = MAX_ITERS) -> DataFrame:
    """Undirected connected components: (node, component=min reachable id).

    Ref: analytics/CC.java (label = min vertex id, propagated to fixpoint).
    """
    e = _chk(undirect(edges))
    state = _chk(
        e.select(F.col("src").alias("node")).distinct().select("node", F.col("node").alias("comp"))
    )
    for _ in range(max_iters):
        msgs = (
            state.join(e, state.node == e.src)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("comp").alias("cand"))
        )
        merged = state.join(msgs, on="node", how="left").select(
            "node", F.least(F.col("comp"), F.col("cand")).alias("new_comp"), F.col("comp")
        )
        changed = merged.filter(F.col("new_comp") < F.col("comp"))
        state = _chk(merged.select("node", F.col("new_comp").alias("comp")))
        if changed.isEmpty():
            break
    return state


def pagerank(edges: DataFrame, damping: float = 0.85, iters: int = 20) -> DataFrame:
    """PageRank: (node, rank). Ref: analytics/PR.java (same damping default).

    Dangling mass is redistributed uniformly each round (matches the usual
    formulation; the reference normalizes the same way). Fixed iteration count
    keeps every round a pure join+agg; at scale, out-degree is precomputed
    once and the rank⋈edges join is the only shuffle per round.
    """
    e = _chk(edges.select("src", "dst"))
    nodes = _chk(
        e.select(F.col("src").alias("node")).unionByName(e.select(F.col("dst").alias("node"))).distinct()
    )
    n = nodes.count()
    deg = e.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("deg"))
    state = _chk(nodes.select("node", F.lit(1.0 / n).alias("rank")))
    for _ in range(iters):
        wd = state.join(deg, on="node", how="left")
        dangling = wd.filter(F.col("deg").isNull()).agg(F.coalesce(F.sum("rank"), F.lit(0.0))).collect()[0][0]
        contribs = (
            wd.filter(F.col("deg").isNotNull())
            .join(e, wd.node == e.src)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("inflow"))
        )
        state = nodes.join(contribs, on="node", how="left").select(
            "node",
            (
                F.lit((1.0 - damping) / n)
                + F.lit(damping) * (F.coalesce(F.col("inflow"), F.lit(0.0)) + F.lit(dangling / n))
            ).alias("rank"),
        )
        state = _chk(state)
    return state


def paths(edges: DataFrame, source: str, target: str, max_length: int = 8) -> DataFrame:
    """Enumerate simple-ish paths source→target up to max_length edges:
    (path string, hops). Ref: impl/bd/PATHS.java (bounded path enumeration).

    Cycles are excluded by checking the visited list per partial path (kept as
    an array column — no driver loops; each expansion is one join).
    """
    spark = edges.sparkSession
    e = _chk(edges.select("src", "dst"))
    active = _chk(
        spark.createDataFrame([(source, [source])], "head string, nodes array<string>")
    )
    found = spark.createDataFrame([], "path string, hops int")
    for depth in range(1, max_length + 1):
        grown = (
            active.join(e, active["head"] == e.src)
            .filter(~F.array_contains(F.col("nodes"), F.col("dst")))
            .select(F.col("dst").alias("head"), F.concat(F.col("nodes"), F.array(F.col("dst"))).alias("nodes"))
        )
        grown = _chk(grown)
        hits = grown.filter(F.col("head") == target).select(
            F.array_join(F.col("nodes"), "->").alias("path"), F.lit(depth).alias("hops")
        )
        found = found.unionByName(hits)
        active = grown.filter(F.col("head") != target)
        if active.isEmpty():
            break
    return _chk(found)


def reachable(edges: DataFrame, sources: list[str], max_iters: int = MAX_ITERS) -> DataFrame:
    """Set of nodes reachable from sources (BFS without depth bookkeeping)."""
    return bfs(edges, sources, max_iters).select("node")
