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

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ITERS = 64

# Edge sets at most this size run the whole traversal on the driver in one
# Arrow collect (the tier pattern of inference/rdfs.py SMALL_CLOSURE_MAX_EDGES
# and paths.transitive_closure): at driver-sized inputs the per-round fixed
# cost of the distributed loop — a Catalyst compile plus ~6 AQE stage jobs per
# localCheckpoint round — dwarfs the data work (measured r12: label-prop CC on
# the 11k-edge sf0.1 bipartite graph spends 8 rounds x ~0.36 s of fixed
# overhead where a driver union-find needs ~0.05 s). Env-parameterized so a
# cluster deployment can shrink or grow the tier; every distributed loop below
# is unchanged and takes over past the threshold, so the 100 TB path never
# routes through the driver.
GAS_DRIVER_TIER_MAX_EDGES = int(os.environ.get("SPARK_GRAFT_GAS_DRIVER_TIER", "500000"))


# Iterative loops re-shuffle a state table whose size is known up front; the
# session-wide shuffle width (sized for full-table scans) then just buys
# per-round task-scheduling overhead. Target rows/partition for state
# shuffles — measured 2-2.5× on the sf0.1 GAS bench (pagerank 9.9s → 3.9s).
ITER_ROWS_PER_PARTITION = 2_000


# Shuffle width for iterative rounds is sized by AQE at runtime
# (coalescePartitions with parallelismFirst=false + 8m advisory target in
# session.py) instead of mutating session-global shuffle.partitions under a
# lock — concurrent iterative queries (two REST path closures) no longer
# serialize, and every round's exchange still coalesces to the state's
# actual size. _iter_shuffle survives as a no-op context manager so loop
# bodies keep a single `with` indentation (and a hook if a per-plan width
# override is ever needed again).


def _iter_shuffle(spark, n_rows: int):
    from contextlib import nullcontext

    return nullcontext()


def _chk(df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=True)


def _driver_edges(e: DataFrame):
    """Materialized edge frame -> pandas via the Arrow path (guide §6), or
    None when the rows carry nulls (the python tiers compare/um keys directly,
    so null ids fall back to the distributed loops, which treat them as
    ordinary join keys)."""
    pdf = e.toPandas()
    if pdf.isnull().values.any():
        return None
    return pdf


def _rows_df(spark, rows: list[tuple], schema) -> DataFrame:
    """Re-parallelize driver-computed rows through one Arrow batch (the
    inverse transfer; pickling tuples one by one costs ~1 s per 200k rows)."""
    import pandas as pd

    names = [f.name for f in schema.fields] if hasattr(schema, "fields") else None
    pdf = pd.DataFrame(rows, columns=names)
    return spark.createDataFrame(pdf, schema)


def _bfs_driver(e: DataFrame, sources: list[str], max_depth: int) -> DataFrame | None:
    """Driver-tier BFS: same level-by-level expansion as _general_bfs (pred =
    min src among the frontier parents that discover a node), one job to
    collect the edges and one Arrow batch back."""
    pdf = _driver_edges(e)
    if pdf is None:
        return None
    adj: dict = {}
    for s, d in zip(pdf["src"].values, pdf["dst"].values):
        adj.setdefault(s, []).append(d)
    depth = {s: 0 for s in sources}
    reached: list[tuple] = []
    frontier = list(depth)
    for dcur in range(1, max_depth + 1):
        if not frontier:
            break
        nxt: dict = {}
        for u in frontier:
            for v in adj.get(u, ()):
                if v in depth:
                    continue
                p = nxt.get(v)
                if p is None or u < p:
                    nxt[v] = u
        for v, p in nxt.items():
            depth[v] = dcur
            reached.append((v, dcur, p))
        frontier = list(nxt)
    rows = [(s, 0, None) for s in sources] + reached
    return _rows_df(e.sparkSession, rows, "node string, depth int, pred string")


def _sssp_driver(e: DataFrame, sources: list[str], max_iters: int) -> DataFrame | None:
    """Driver-tier SSSP: the same frontier relaxation as _general_sssp (per
    round, min over frontier of dist+weight; a node re-enters the frontier
    only when its distance improves) on plain floats — identical IEEE
    arithmetic, identical per-round minima."""
    pdf = _driver_edges(e)
    if pdf is None:
        return None
    adj: dict = {}
    for s, d, w in zip(pdf["src"].values, pdf["dst"].values, pdf["weight"].values):
        adj.setdefault(s, []).append((d, float(w)))
    dist = {s: 0.0 for s in sources}
    frontier = list(dist)
    for _ in range(max_iters):
        cand: dict = {}
        for u in frontier:
            du = dist[u]
            for v, w in adj.get(u, ()):
                nd = du + w
                if v not in cand or nd < cand[v]:
                    cand[v] = nd
        improved = [(v, nd) for v, nd in cand.items() if v not in dist or nd < dist[v]]
        if not improved:
            break
        dist.update(improved)
        frontier = [v for v, _ in improved]
    return _rows_df(e.sparkSession, list(dist.items()), "node string, dist double")


def _pagerank_driver(e: DataFrame, damping: float, iters: int) -> DataFrame | None:
    """Driver-tier PageRank: the same per-round recurrence as the distributed
    loop (dangling mass redistributed uniformly, identical double arithmetic
    per term) vectorized over numpy float64 arrays. Summation order inside
    the inflow/dangling sums differs from the distributed hash aggregation —
    as the distributed order already differs from any other engine's — which
    is ~1e-15 relative and vanishes at the integer-ppb comparison surface
    (queries_gas._pagerank_oracle documents the same argument vs DuckDB;
    verified ppb-exact against the oracle at sf0.001/sf0.01, r12)."""
    import numpy as np
    import pandas as pd

    pdf = _driver_edges(e)
    if pdf is None:
        return None
    uniq = pd.unique(pd.concat([pdf["src"], pdf["dst"]], ignore_index=True))
    n = len(uniq)
    if n == 0:
        return _rows_df(e.sparkSession, [], "node string, rank double")
    pos = pd.Series(np.arange(n), index=uniq)
    s = pos[pdf["src"]].values
    d = pos[pdf["dst"]].values
    deg = np.bincount(s, minlength=n).astype(np.float64)
    rank = np.full(n, 1.0 / n)
    dangling = deg == 0.0
    base = (1.0 - damping) / n
    for _ in range(iters):
        dmass = float(rank[dangling].sum())
        inflow = np.zeros(n)
        np.add.at(inflow, d, rank[s] / deg[s])
        rank = base + damping * (inflow + dmass / n)
    out = pd.DataFrame({"node": uniq, "rank": rank})
    # node keeps the input id type (string lexicals or dictionary longs)
    schema = (
        e.select(F.col("src").alias("node"))
        .withColumn("rank", F.lit(0.0))
        .schema
    )
    return e.sparkSession.createDataFrame(out, schema)


def _bfs_from_df_driver(e: DataFrame, seeds: DataFrame, max_depth: int) -> DataFrame | None:
    """Driver-tier multi-source BFS (bfs_from_df): min depth per node from
    the seed set. The seed frame is traversal-state-sized (path nodes /
    probe sets), collected with the edges in the same tier."""
    pdf = _driver_edges(e)
    if pdf is None:
        return None
    seed_pdf = seeds.select("node").distinct().toPandas()
    if seed_pdf.isnull().values.any():
        return None
    adj: dict = {}
    for s, d in zip(pdf["src"].values, pdf["dst"].values):
        adj.setdefault(s, []).append(d)
    depth = {s: 0 for s in seed_pdf["node"].values}
    frontier = list(depth)
    for dcur in range(1, max_depth + 1):
        if not frontier:
            break
        nxt = []
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in depth:
                    depth[v] = dcur
                    nxt.append(v)
        frontier = nxt
    return _rows_df(e.sparkSession, list(depth.items()), "node string, depth int")


def _paths_driver(
    e: DataFrame, source: str, target: str, max_length: int
) -> DataFrame | None:
    """Driver-tier bounded path enumeration: the same level-by-level
    expansion as the distributed loop (grow every partial path one hop,
    drop revisits, bank paths that hit the target, stop extending them)."""
    pdf = _driver_edges(e)
    if pdf is None:
        return None
    adj: dict = {}
    for s, d in zip(pdf["src"].values, pdf["dst"].values):
        adj.setdefault(s, []).append(d)
    found: list[tuple] = []
    active = [(source, (source,))]
    for depth in range(1, max_length + 1):
        grown = []
        for head, nodes in active:
            for nxt in adj.get(head, ()):
                if nxt not in nodes:
                    grown.append((nxt, nodes + (nxt,)))
        found.extend(
            ("->".join(nodes), depth) for head, nodes in grown if head == target
        )
        active = [(head, nodes) for head, nodes in grown if head != target]
        if not active:
            break
    return _rows_df(e.sparkSession, found, "path string, hops int")


def _cc_driver(e: DataFrame) -> DataFrame | None:
    """Driver-tier connected components: union-find with union-by-min and
    path compression over the (already undirected) edge list. Labels are the
    component minimum — exactly label_prop's fixpoint — because the root of
    every union is the smaller id."""
    pdf = _driver_edges(e)
    if pdf is None:
        return None
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    srcs = pdf["src"].values
    dsts = pdf["dst"].values
    for s, d in zip(srcs, dsts):
        rs, rd = find(s), find(d)
        if rs != rd:
            if rs < rd:
                parent[rd] = rs
            else:
                parent[rs] = rd
    # every endpoint (roots and self-loop-only nodes included) gets a label —
    # the same node set label_prop seeds with on the undirected edge set
    nodes = set(srcs)
    nodes.update(dsts)
    schema = e.select(F.col("src").alias("node"), F.col("src").alias("comp")).schema
    return _rows_df(e.sparkSession, [(x, find(x)) for x in nodes], schema)


def undirect(edges: DataFrame) -> DataFrame:
    """Make an edge set symmetric (ref CC treats the graph as undirected)."""
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return edges.select("src", "dst").unionByName(rev).distinct()


# Verdicts of the in-degree probe keyed by the edge plan's semanticHash, so
# repeated traversals over the same edge set don't re-scan it (a full edge
# aggregation per bfs/sssp call would be an extra corpus scan at 100 TB).
# semanticHash identifies the PLAN, not the data: like Spark's own relation
# caches, a source mutated under the same path is not detected — pass
# ``functional=`` explicitly (or reload after REFRESH) when data can change
# mid-session. Size-bounded so long-lived sessions don't leak entries.
_FUNCTIONAL_CACHE: dict[int, bool] = {}
_FUNCTIONAL_CACHE_MAX = 256


def _is_functional(e: DataFrame) -> bool:
    """True when every dst has exactly one incoming edge (unique parent) —
    the graph of parent pointers (trees, forests, linked chains)."""
    try:
        key = e.semanticHash()
    except Exception:  # pragma: no cover - semanticHash is best-effort
        key = None
    if key is not None and key in _FUNCTIONAL_CACHE:
        return _FUNCTIONAL_CACHE[key]
    row = e.groupBy("dst").agg(F.count(F.lit(1)).alias("c")).agg(F.max("c").alias("m")).first()
    verdict = row is not None and row["m"] == 1
    if key is not None:
        if len(_FUNCTIONAL_CACHE) >= _FUNCTIONAL_CACHE_MAX:
            _FUNCTIONAL_CACHE.clear()
        _FUNCTIONAL_CACHE[key] = verdict
    return verdict


def _functional_bfs(e: DataFrame, sources: list[str], max_depth: int) -> DataFrame:
    """BFS over a functional (in-degree ≤ 1) graph by pointer doubling.

    Each node has a unique parent, so its depth is the length of its unique
    upward chain to the nearest source — computable in ⌈log2 depth⌉ rounds
    of pointer jumping (the classic PRAM shortcut) instead of depth rounds
    of frontier expansion. Per round every node carries one (anc, d) pointer
    row: total work O(n log d), rows never grow. Jumps stop at sources so
    multi-source semantics (nearest source on the chain) are preserved.
    Result is identical to frontier BFS: (node, depth, pred=unique parent).
    """
    spark = e.sparkSession
    # child → parent pointer rows; pred is the unique parent itself
    ptr = _chk(
        e.select(
            F.col("dst").alias("node"),
            F.col("src").alias("pred"),
            F.col("src").alias("anc"),
            F.lit(1).alias("d"),
        )
    )
    rounds = max(1, (max_depth - 1).bit_length())  # ⌈log2 max_depth⌉
    for _ in range(rounds):
        jump = ptr.select(
            F.col("node").alias("j_node"), F.col("anc").alias("j_anc"), F.col("d").alias("j_d")
        )
        # only chains not yet anchored at a source keep jumping
        can_jump = ~F.col("anc").isin(sources) & F.col("j_anc").isNotNull()
        # lazy checkpoint: the jumped-probe's job materializes the round
        # (same barrier-removal as the CC/pagerank loops, r11)
        ptr2 = ptr.join(jump, ptr.anc == F.col("j_node"), "left").select(
            "node",
            "pred",
            F.when(can_jump, F.col("j_anc")).otherwise(F.col("anc")).alias("anc"),
            F.when(can_jump, F.col("d") + F.col("j_d")).otherwise(F.col("d")).alias("d"),
            can_jump.alias("jumped"),
        ).localCheckpoint(eager=False)
        ptr = ptr2.select("node", "pred", "anc", "d")
        if ptr2.filter("jumped").isEmpty():
            break
    seed = spark.createDataFrame(
        [(s, 0, None) for s in sources], "node string, depth int, pred string"
    )
    reached = (
        ptr.filter(F.col("anc").isin(sources) & (F.col("d") <= max_depth))
        .join(seed.select("node"), on="node", how="left_anti")  # sources stay depth 0
        .select("node", F.col("d").cast("int").alias("depth"), "pred")
    )
    return seed.unionByName(reached)


def bfs(
    edges: DataFrame,
    sources: list[str],
    max_depth: int = MAX_ITERS,
    functional: bool | None = None,
) -> DataFrame:
    """Breadth-first search: (node, depth, predecessor).

    Ref: analytics/BFS.java (depth + predecessor per visited vertex).
    Predecessor choice among equal-depth parents is min(), deterministic.

    Strategy is chosen from the graph's in-degree profile (one cheap agg):
    functional graphs (every node a unique parent — trees/forests/chains)
    use pointer doubling (⌈log2 d⌉ rounds, O(n log d) work); general graphs
    use delta-frontier expansion, one materializing job per round — only
    the frontier delta is checkpointed; the visited set stays a shallow
    union of already-checkpointed deltas, so unioning it costs nothing
    extra and the anti-join reads materialized data.

    Pass ``functional=True/False`` to skip the probe entirely when the
    caller knows the graph shape; otherwise the probe's verdict is cached
    per edge plan so repeated traversals don't re-scan the edges.
    """
    spark = edges.sparkSession
    sel = edges.select("src", "dst")
    e = _chk(sel)  # edges re-join every round: materialize once
    if e.count() <= GAS_DRIVER_TIER_MAX_EDGES:
        out = _bfs_driver(e, sources, max_depth)
        if out is not None:
            return out
    if functional is None:
        functional = _is_functional(sel)
    if functional:
        return _functional_bfs(e, sources, max_depth)
    return _general_bfs(spark, e, sources, max_depth)


def _general_bfs(spark, e: DataFrame, sources: list[str], max_depth: int) -> DataFrame:
    seed = _chk(
        spark.createDataFrame([(s, 0, None) for s in sources], "node string, depth int, pred string")
    )
    parts = [seed]
    visited = seed.select("node")
    frontier = visited
    for d in range(1, max_depth + 1):
        msgs = (
            frontier.join(e, frontier.node == e.src)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("src").alias("pred"))
        )
        new = msgs.join(visited, on="node", how="left_anti")
        # lazy: the emptiness probe's job materializes the round (r11)
        new = new.select("node", F.lit(d).alias("depth"), "pred").localCheckpoint(eager=False)
        if new.isEmpty():
            break
        parts.append(new)
        visited = visited.unionByName(new.select("node"))
        frontier = new.select("node")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _functional_sssp(e: DataFrame, sources: list[str], max_iters: int) -> DataFrame:
    """SSSP on a functional (in-degree ≤ 1) graph by pointer doubling: the
    unique upward chain means dist = SUM of weights along it — the same
    ⌈log2 d⌉-round jump loop as _functional_bfs with (+, weight)
    accumulation alongside a hop counter, so the result honors the same
    max_iters hop bound the general Bellman-Ford path enforces (a node
    more than max_iters hops from its source is unreached in both)."""
    spark = e.sparkSession
    ptr = _chk(
        e.select(
            F.col("dst").alias("node"),
            F.col("src").alias("anc"),
            F.col("weight").alias("d"),
            F.lit(1).alias("h"),
        )
    )
    rounds = max(1, (max_iters - 1).bit_length())
    for _ in range(rounds):
        jump = ptr.select(
            F.col("node").alias("j_node"),
            F.col("anc").alias("j_anc"),
            F.col("d").alias("j_d"),
            F.col("h").alias("j_h"),
        )
        can_jump = ~F.col("anc").isin(sources) & F.col("j_anc").isNotNull()
        # lazy checkpoint: same barrier-removal as _functional_bfs (r11)
        ptr2 = ptr.join(jump, ptr.anc == F.col("j_node"), "left").select(
            "node",
            F.when(can_jump, F.col("j_anc")).otherwise(F.col("anc")).alias("anc"),
            F.when(can_jump, F.col("d") + F.col("j_d")).otherwise(F.col("d")).alias("d"),
            F.when(can_jump, F.col("h") + F.col("j_h")).otherwise(F.col("h")).alias("h"),
            can_jump.alias("jumped"),
        ).localCheckpoint(eager=False)
        ptr = ptr2.select("node", "anc", "d", "h")
        if ptr2.filter("jumped").isEmpty():
            break
    seed = spark.createDataFrame([(s, 0.0) for s in sources], "node string, dist double")
    reached = (
        ptr.filter(F.col("anc").isin(sources) & (F.col("h") <= max_iters))
        .join(seed.select("node"), on="node", how="left_anti")
        .select("node", F.col("d").alias("dist"))
    )
    return seed.unionByName(reached)


def sssp(
    edges: DataFrame,
    sources: list[str],
    max_iters: int = MAX_ITERS,
    functional: bool | None = None,
) -> DataFrame:
    """Single-source shortest paths over weighted edges: (node, dist).

    Ref: analytics/SSSP.java. Functional graphs (unique parent — the path
    is forced, so "shortest" is the only path) use pointer doubling like
    BFS; general graphs use Bellman-Ford-style frontier relaxation: only
    vertices whose distance improved scatter in the next round. One
    materializing job per round — state and the improved-flag come out of
    the same checkpointed plan, so convergence detection is a cheap filter
    over materialized data, not a second job.
    """
    spark = edges.sparkSession
    sel = edges.select("src", "dst", F.col("weight").cast("double").alias("weight"))
    e = _chk(sel)
    if e.count() <= GAS_DRIVER_TIER_MAX_EDGES:
        out = _sssp_driver(e, sources, max_iters)
        if out is not None:
            return out
    if functional is None:
        functional = _is_functional(sel.select("src", "dst"))
    if functional:
        return _functional_sssp(e, sources, max_iters)
    return _general_sssp(spark, e, sources, max_iters)


def _general_sssp(spark, e: DataFrame, sources: list[str], max_iters: int) -> DataFrame:
    state = _chk(spark.createDataFrame([(s, 0.0) for s in sources], "node string, dist double"))
    frontier = state
    for _ in range(max_iters):
        msgs = (
            frontier.join(e, frontier.node == e.src)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min(F.col("dist") + F.col("weight")).alias("cand"))
        )
        merged = state.join(msgs, on="node", how="full").select(
            "node",
            F.least(F.col("dist"), F.col("cand")).alias("dist"),
            (F.col("dist").isNull() | (F.col("cand") < F.col("dist"))).alias("improved"),
        ).localCheckpoint(eager=False)  # the improved-probe materializes (r11)
        frontier = merged.filter("improved").select("node", "dist")
        if frontier.isEmpty():
            break
        state = merged.select("node", "dist")
    return state


def _cc_nbrs(E: DataFrame) -> DataFrame:
    return E.select("u", "v").unionByName(
        E.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )


def _cc_mins(nb: DataFrame) -> DataFrame:
    """(u, m): min over Γ(u) ∪ {u} for the current edge set."""
    return nb.groupBy("u").agg(F.min("v").alias("mv")).select(
        "u", F.least(F.col("mv"), F.col("u")).alias("m")
    )


def connected_components(
    edges: DataFrame, max_iters: int = MAX_ITERS, algorithm: str = "label_prop"
) -> DataFrame:
    """Undirected connected components: (node, component=min reachable id).

    Ref: analytics/CC.java (label = min vertex id, propagated to fixpoint).
    Two physical strategies with identical output:

    * ``label_prop`` (default): min-label propagation with pointer-jump
      shortcutting — cheapest per round (one materializing job), wins on
      the hub-dominated low-diameter graphs that dominate real workloads
      (measured 3.9s vs 6.0s for two-star on the sf0.1 bipartite bench).
    * ``two_star``: alternating large-star/small-star contraction (Kiveris
      et al., "Connected Components in MapReduce and Beyond") — O(log² n)
      phase bound regardless of diameter; the scale path for deep/chain
      graphs where per-hop propagation would need diameter-many rounds
      (shortcutting helps but two-star's bound is structural).
    """
    if algorithm == "label_prop":
        return connected_components_label_prop(edges, max_iters)
    if algorithm != "two_star":
        raise ValueError(f"unknown CC algorithm {algorithm!r}")
    raw = edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    nodes = _chk(  # before the self-loop filter: loop-only nodes keep a label
        raw.select(F.col("u").alias("node"))
        .unionByName(raw.select(F.col("v").alias("node")))
        .distinct()
    )
    E = _chk(raw.filter(F.col("u") != F.col("v")).distinct())
    n_edges = E.count()
    return _cc_two_star_loop(E, nodes, n_edges, max_iters)


def _cc_two_star_loop(E, nodes, n_edges, max_iters):
    for _ in range(max_iters):
        # large-star
        nb = _cc_nbrs(E)
        mins = _cc_mins(nb)
        large = (
            nb.filter(F.col("v") > F.col("u"))
            .join(mins, on="u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        # small-star over the large-star output
        nb2 = _cc_nbrs(large)
        mins2 = _cc_mins(nb2)
        small = (
            nb2.filter(F.col("v") < F.col("u"))
            .join(mins2, on="u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(mins2.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        new_E = small.localCheckpoint(eager=False)  # count() materializes (r11)
        n_new = new_E.count()
        if n_new == n_edges and new_E.join(E, on=["u", "v"], how="left_anti").isEmpty():
            E = new_E
            break
        E, n_edges = new_E, n_new
    # fixpoint is a star per component: non-roots carry (u → component min);
    # roots (and isolated self-loop nodes) label themselves
    return (
        nodes.join(E.select(F.col("u").alias("node"), F.col("v").alias("c")), on="node", how="left")
        .select("node", F.coalesce(F.col("c"), F.col("node")).alias("comp"))
    )


def connected_components_bipartite(edges: DataFrame, max_iters: int = MAX_ITERS) -> DataFrame:
    """CC specialization for BIPARTITE graphs where every edge runs
    left→right and left ids sort below right ids (e.g. `p:*` parts vs
    `s:*` suppliers): contract the right side away, solve CC on the
    left-side graph (half the diameter → half the propagation rounds),
    then attach right nodes with one join+agg.

    Contraction: for each right node r, star its left neighborhood onto
    min(Γ(r)) — |E| rows, one shuffle. Left nodes sharing any right node
    become directly connected, so components are preserved; because left
    ids sort below right ids, each component's global minimum is a left
    node and the contracted labels are already the final labels. Measured
    3.8s vs 5.4s for label_prop on the sf0.1 part↔supplier bench graph.
    """
    e = _chk(edges.select("src", "dst").distinct())
    # driver-sized bipartite graphs skip the contraction AND the attach
    # joins: union-find over the raw edge list labels every endpoint with
    # the component minimum directly (left ids sort below right ids, but
    # union-by-min doesn't even need that)
    if e.count() <= GAS_DRIVER_TIER_MAX_EDGES:
        out = _cc_driver(e)
        if out is not None:
            return out
    star_min = e.groupBy("dst").agg(F.min("src").alias("m"))
    left_graph = (
        e.join(star_min, on="dst")
        .select("src", F.col("m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    left_cc = connected_components_label_prop(left_graph, max_iters)
    # isolated-star left nodes (their right neighbors connect them only to
    # themselves) fall out of left_graph; they label themselves
    lone = (
        e.select(F.col("src").alias("node"))
        .distinct()
        .join(left_cc.select("node"), on="node", how="left_anti")
        .select("node", F.col("node").alias("comp"))
    )
    left_all = left_cc.unionByName(lone)
    right_cc = (
        e.join(left_all.withColumnRenamed("node", "src"), on="src")
        .groupBy("dst")
        .agg(F.min("comp").alias("comp"))
        .withColumnRenamed("dst", "node")
    )
    return left_all.unionByName(right_cc)


def connected_components_label_prop(edges: DataFrame, max_iters: int = MAX_ITERS) -> DataFrame:
    """Min-label propagation CC with pointer-jump shortcutting (the default
    strategy behind :func:`connected_components`).

    One materializing job per round: the changed-flag rides along in the
    checkpointed state so convergence is a filter, not a plan re-execution.
    Each round combines one edge-hop of label propagation with one pointer
    jump through the label table (comp := min(comp, comp[comp])), so label
    distance to the component minimum shrinks superlinearly.
    """
    e = _chk(undirect(edges))
    if e.count() <= GAS_DRIVER_TIER_MAX_EDGES:
        out = _cc_driver(e)
        if out is not None:
            return out
    state = _chk(
        e.select(F.col("src").alias("node")).distinct().select("node", F.col("node").alias("comp"))
    )
    return _cc_label_prop_loop(e, state, max_iters)


def _cc_label_prop_loop(e, state, max_iters):
    for _ in range(max_iters):
        msgs = (
            state.join(e, state.node == e.src)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("comp").alias("cand"))
        )
        stepped = state.join(msgs, on="node", how="left").select(
            "node",
            F.col("comp").alias("old"),
            F.least(F.col("comp"), F.col("cand")).alias("mid"),
        )
        # shortcut: follow the label one more hop through the PREVIOUS
        # round's label table (already checkpointed — joining the fresh
        # `stepped` plan against itself would recompute the edge join
        # twice per round). comp values are node ids, so the lookup is a
        # plain equi-join; labels lag one round but the chain still
        # contracts superlinearly.
        lookup = state.select(F.col("node").alias("l_node"), F.col("comp").alias("l_mid"))
        # lazy checkpoint: lineage truncates and the changed-probe's job
        # materializes the round (the local-checkpoint completion covers all
        # partitions), so the separate eager barrier per round is gone —
        # measured 5.5 → 4.2 s on the sf0.1 bipartite bench, identical
        # labels (r11)
        merged = stepped.join(lookup, stepped.mid == F.col("l_node"), "left").select(
            "node",
            F.least(F.col("mid"), F.col("l_mid")).alias("comp"),
            (F.least(F.col("mid"), F.col("l_mid")) < F.col("old")).alias("changed"),
        ).localCheckpoint(eager=False)
        state = merged.select("node", "comp")
        if merged.filter("changed").isEmpty():
            break
    return state


def pagerank(edges: DataFrame, damping: float = 0.85, iters: int = 20) -> DataFrame:
    """PageRank: (node, rank). Ref: analytics/PR.java (same damping default).

    Dangling mass is redistributed uniformly each round (matches the usual
    formulation; the reference normalizes the same way). Out-degree is
    attached to the vertex state once, so each round is exactly one
    materializing job: contribution join+agg, with the dangling-mass scalar
    folded in as a one-row crossJoin instead of a driver-side collect.
    """
    e = _chk(edges.select("src", "dst"))
    if e.count() <= GAS_DRIVER_TIER_MAX_EDGES:
        out = _pagerank_driver(e, damping, iters)
        if out is not None:
            return out
    deg = e.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("deg"))
    nodes = _chk(
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .join(deg, on="node", how="left")
        .select("node", F.coalesce(F.col("deg"), F.lit(0)).alias("deg"))
    )
    n = nodes.count()
    state = _chk(nodes.select("node", "deg", F.lit(1.0 / n).alias("rank")))
    for i in range(iters):
            dangling = state.filter(F.col("deg") == 0).agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dmass")
            )
            contribs = (
                state.filter(F.col("deg") > 0)
                .join(e, state.node == e.src)
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum(F.col("rank") / F.col("deg")).alias("inflow"))
            )
            # Intermediate rounds checkpoint LAZILY: lineage still truncates
            # (downstream plans see the checkpointed leaf, and both per-round
            # references — dangling agg + contribution join — read the same
            # materialized partitions), but the separate eager materialization
            # barrier per round is gone; each round computes inside the next
            # round's job. Only the last round is eager so callers get a
            # materialized result. Identical ranks, measured 13.0 → 10.9 s
            # at sf1.0 and ~9 fewer driver jobs (r11, guide §2.4/§1).
            state = (
                nodes.join(contribs, on="node", how="left")
                .crossJoin(F.broadcast(dangling))
                .select(
                    "node",
                    "deg",
                    (
                        F.lit((1.0 - damping) / n)
                        + F.lit(damping)
                        * (F.coalesce(F.col("inflow"), F.lit(0.0)) + F.col("dmass") / F.lit(float(n)))
                    ).alias("rank"),
                )
            ).localCheckpoint(eager=(i == iters - 1))
    return state.select("node", "rank")


def paths(edges: DataFrame, source: str, target: str, max_length: int = 8) -> DataFrame:
    """Enumerate simple-ish paths source→target up to max_length edges:
    (path string, hops). Ref: impl/bd/PATHS.java (bounded path enumeration).

    Cycles are excluded by checking the visited list per partial path (kept as
    an array column — no driver loops; each expansion is one join).
    """
    spark = edges.sparkSession
    e = _chk(edges.select("src", "dst"))
    if e.count() <= GAS_DRIVER_TIER_MAX_EDGES:
        out = _paths_driver(e, source, target, max_length)
        if out is not None:
            return out
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
        grown = grown.localCheckpoint(eager=False)  # probe materializes (r11)
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


def bfs_from_df(edges: DataFrame, seeds: DataFrame, max_depth: int = MAX_ITERS) -> DataFrame:
    """BFS seeded from a DataFrame of (node) rows — multi-source frontier
    expansion giving each node its MIN depth from the seed set."""
    e = _chk(edges.select("src", "dst"))
    if e.count() <= GAS_DRIVER_TIER_MAX_EDGES:
        out = _bfs_from_df_driver(e, seeds, max_depth)
        if out is not None:
            return out
    seed = _chk(seeds.select("node").distinct().select("node", F.lit(0).alias("depth")))
    parts = [seed]
    visited = seed.select("node")
    frontier = visited
    for d in range(1, max_depth + 1):
        msgs = frontier.join(e, frontier.node == e.src).select(F.col("dst").alias("node")).distinct()
        new = (
            msgs.join(visited, on="node", how="left_anti")
            .select("node", F.lit(d).alias("depth"))
            .localCheckpoint(eager=False)  # probe materializes (r11)
        )
        if new.isEmpty():
            break
        parts.append(new)
        visited = visited.unionByName(new.select("node"))
        frontier = new.select("node")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def fuzzy_sssp(
    edges: DataFrame,
    sources: list[str],
    targets: list[str],
    n_max: int,
    max_depth: int = MAX_ITERS,
) -> tuple[DataFrame, list[tuple]]:
    """FuzzySSSP (ref: analytics/FuzzySSSP.java): the "interesting subgraph"
    around the shortest paths between source and target sets.

    1. One BFS per source (unit weights; the ref's SSSP step) recording each
       target's depth, -1 if unreachable.
    2. Shortest-path vertices collected by walking BFS predecessors back
       from each reached target; merged and deduplicated.
    3. A multi-source BFS from the merged path set, taking vertices in
       (distance-from-path, node) order until n_max — the fuzzy expansion.

    Returns (DataFrame(node, dist) of <= n_max vertices, [(source, target,
    depth|-1), ...]). The per-(source,target) matrix is O(|S|*|T|) — output
    sized, so the driver collect is bounded by the request itself.
    """
    path_parts = []
    st_dists: list[tuple] = []
    for src in sources:
        t = bfs(edges, [src], max_depth=max_depth)
        reached = {
            r["node"]: r["depth"]
            for r in t.filter(F.col("node").isin(targets)).select("node", "depth").collect()
        }
        for tgt in targets:
            st_dists.append((src, tgt, reached.get(tgt, -1)))
        hit = [x for x in targets if x in reached]
        if not hit:
            continue
        # walk predecessors back to the source: <= path-length tiny joins
        cur = _chk(t.filter(F.col("node").isin(hit)).select("node", "pred"))
        path_parts.append(cur.select("node"))
        for _ in range(max_depth):
            nxt = (
                cur.filter(F.col("pred").isNotNull())
                .select(F.col("pred").alias("node"))
                .distinct()
                .join(t.select("node", "pred"), on="node", how="left")
            )
            nxt = _chk(nxt)
            if nxt.isEmpty():
                break
            path_parts.append(nxt.select("node"))
            cur = nxt
    if not path_parts:
        spark = edges.sparkSession
        return spark.createDataFrame([], "node string, dist int"), st_dists
    path_set = path_parts[0]
    for p in path_parts[1:]:
        path_set = path_set.unionByName(p)
    expanded = bfs_from_df(edges, path_set.distinct(), max_depth=max_depth)
    # orderBy+limit compiles to TakeOrderedAndProject — per-partition top-N
    # then a single bounded merge, no global single-partition window
    return (
        expanded.orderBy(F.col("depth").asc(), F.col("node").asc())
        .limit(n_max)
        .select("node", F.col("depth").alias("dist")),
        st_dists,
    )
