"""Similarity search over embedding columns (SURVEY.md §2.11): brute-force
cosine top-k as the exact baseline, random-hyperplane LSH bucketing as the
scale path.

Scale design (100 TB / billions of vectors):
- Brute force: the query set is broadcast (crossJoin with a broadcast side —
  no shuffle of the corpus); per-(query) top-k is a window over q. Exact,
  O(Q*N) compute but a single corpus scan.
- LSH ANN: each vector gets a b-bit signature from fixed pseudo-random
  hyperplanes (literal arrays — evaluated in codegen, broadcast by value);
  bucket equi-join means each query only scores its bucket. Recall tunes
  with bits/probes; the brute path is the recall oracle in tests.
- Dot products are F.zip_with + F.aggregate on array<double> — JVM
  vectorized, no Python.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)


def l2norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def as_double(a: Column) -> Column:
    return F.transform(a, lambda x: x.cast("double"))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2norm(a) * l2norm(b))


def two_phase_topk(scored: DataFrame, k: int, order: list, by: str = "q") -> DataFrame:
    """Per-query top-k without ever sorting one query's full candidate set
    in a single task: phase 1 ranks within (query, physical-partition) —
    the shuffle key carries the upstream partition id, so one query's rows
    spread across as many tasks as the input has partitions and each window
    group is bounded by the partition size — and keeps k rows per group;
    phase 2's per-query window then sees at most k * n_partitions rows per
    query instead of the whole corpus. ``order`` must be a TOTAL order
    (e.g. tiebreak on a unique id) so the result equals the global top-k."""
    from pyspark.sql.window import Window

    tagged = scored.withColumn("_tp_pid", F.spark_partition_id())
    w_local = Window.partitionBy(by, "_tp_pid").orderBy(*order)
    local = (
        tagged.withColumn("_tp_rk", F.row_number().over(w_local))
        .filter(F.col("_tp_rk") <= k)
        .drop("_tp_rk", "_tp_pid")
    )
    w = Window.partitionBy(by).orderBy(*order)
    return (
        local.withColumn("_tp_rk", F.row_number().over(w))
        .filter(F.col("_tp_rk") <= k)
        .drop("_tp_rk")
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors per query: (q, neighbor, cos), self
    excluded, ties broken by neighbor id. Queries are broadcast; ranking is
    two-phase (``two_phase_topk``) so no single task sorts the full corpus."""
    c = corpus.select(F.col(id_col).alias("neighbor"), as_double(F.col(vec_col)).alias("cv"))
    q = queries.select(F.col(id_col).alias("q"), as_double(F.col(vec_col)).alias("qv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("q") != F.col("neighbor"))
        .select("q", "neighbor", F.round(cosine(F.col("qv"), F.col("cv")), 4).alias("cos"))
    )
    return two_phase_topk(scored, k, [F.col("cos").desc(), F.col("neighbor").asc()])


def radius_search(
    corpus: DataFrame,
    queries: DataFrame,
    min_cos: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    broadcast_queries: bool | None = None,
) -> DataFrame:
    """Exact cosine radius (range) search: every (q, neighbor) pair with
    cosine >= min_cos, self excluded. Unlike top-k there is no window/rank
    stage at all — one corpus scan with the (small) query side broadcast and
    a row filter, so the plan is embarrassingly parallel at any corpus size
    and emits matches incrementally. A corpus-sized query side trips the
    same broadcast guard as LSH top-k and falls back to a shuffle join.
    The filter compares the ROUNDED cosine so a SQL replay of the same
    arithmetic agrees at the threshold boundary."""
    c = corpus.select(F.col(id_col).alias("neighbor"), as_double(F.col(vec_col)).alias("cv"))
    q = queries.select(F.col(id_col).alias("q"), as_double(F.col(vec_col)).alias("qv"))
    return (
        c.crossJoin(_maybe_broadcast(q, broadcast_queries))
        .filter(F.col("q") != F.col("neighbor"))
        .select("q", "neighbor", F.round(cosine(F.col("qv"), F.col("cv")), 4).alias("cos"))
        .filter(F.col("cos") >= F.lit(min_cos))
    )


def semantic_dedup(
    embs: DataFrame,
    k_clusters: int | None = None,
    min_cos: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster: int | None = 20_000,
    target_cluster_size: int = 1_000,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, public): cluster the embedding space,
    then inside each cluster drop every vector that has a LOWER-id neighbor
    above ``min_cos`` — semantic redundancy pruning, the step beyond
    near-duplicate removal.

    Cluster step is deterministic so a SQL oracle can replay it: the
    ``k_clusters`` lowest-id vectors act as fixed centroids and every vector
    goes to its highest-cosine centroid (rounded, seed-asc tiebreak). Swap
    in ``ivf_cells_refined`` centroids for true k-means when replayability
    is not needed — the pruning stage is identical.

    Plan shape: centroids broadcast (k rows) → per-vector argmax via
    map-side-combining max_by (no window) → intra-cluster self-join bucketed
    by cluster id. Cost is Σ|cluster|², exactly the paper's economics — no
    doc×doc compare ever crosses clusters.

    Scale guards (VERDICT r5 task 6 — a fixed small k invites quadratic
    buckets on a big corpus):

    - ``k_clusters=None`` (default) derives k from the corpus: one count
      job, k = clamp(n / target_cluster_size, 8, 65_536) — the paper sizes
      k with the corpus the same way (50k clusters at web scale).
    - ``max_cluster`` caps the pair stage per cluster (same discipline as
      the LSH ``max_bucket``): a cluster larger than the cap contributes
      only its ``max_cluster`` lowest-id members to the self-join; overflow
      members are kept (never pruned) — a conservative, deterministic
      answer a SQL oracle can replay, and the bound makes the worst-case
      pair stage k x max_cluster² instead of n².

    Returns (id_col, cluster, kept∈{0,1}) for every input vector."""
    e = embs.select(F.col(id_col).alias("vid"), as_double(F.col(vec_col)).alias("v"))
    if k_clusters is None:
        n = e.count()
        k_clusters = max(8, min(65_536, n // max(1, target_cluster_size)))
    seeds = e.orderBy("vid").limit(k_clusters).select(
        F.col("vid").alias("seed"), F.col("v").alias("sv")
    )
    scored = e.crossJoin(F.broadcast(seeds)).select(
        "vid", "v", "seed", F.round(cosine(F.col("v"), F.col("sv")), 4).alias("cos")
    )
    assign = scored.groupBy("vid").agg(
        F.expr("max_by(seed, struct(cos, -seed))").alias("cluster"),
        F.first("v").alias("v"),
    )
    paired = assign
    if max_cluster is not None:
        from pyspark.sql.window import Window

        paired = (
            assign.withColumn(
                "__cn",
                F.row_number().over(Window.partitionBy("cluster").orderBy("vid")),
            )
            .filter(F.col("__cn") <= max_cluster)
            .drop("__cn")
        )
    a, b = paired.alias("a"), paired.alias("b")
    redundant = (
        a.join(b, (F.col("a.cluster") == F.col("b.cluster")) & (F.col("a.vid") < F.col("b.vid")))
        .filter(F.round(cosine(F.col("a.v"), F.col("b.v")), 4) >= F.lit(min_cos))
        .select(F.col("b.vid").alias("rid"))
        .distinct()
    )
    return (
        assign.join(redundant, assign["vid"] == redundant["rid"], "left")
        .select(
            F.col("vid").alias(id_col),
            F.col("cluster"),
            F.when(F.col("rid").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("kept"),
        )
    )


def _hyperplanes(dim: int, bits: int, seed: int = 1234567) -> list[list[float]]:
    """Deterministic pseudo-random unit-ish hyperplanes (LCG + Box-Muller)."""
    state = seed
    def nxt() -> float:
        nonlocal state
        state = (6364136223846793005 * state + 1442695040888963407) % (1 << 63)
        return state / float(1 << 63)
    planes = []
    for _ in range(bits):
        comps = []
        for _ in range(dim):
            u1, u2 = max(nxt(), 1e-12), nxt()
            comps.append(math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.pi * u2))
        planes.append(comps)
    return planes


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Signature long: bit i = sign(plane_i . vec)."""
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        d = dot(vec, F.array(*[F.lit(p) for p in plane]))
        sig = sig.bitwiseXOR(F.shiftleft(F.when(d > 0, F.lit(1)).otherwise(F.lit(0)).cast("long"), i))
    return sig


def _table_buckets(vec: Column, all_planes: list[list[list[float]]]) -> Column:
    """array<struct<table, bucket>> — one bucket id per hash table."""
    return F.array(
        *[
            F.struct(F.lit(t).alias("table"), lsh_bucket(vec, planes).alias("bucket"))
            for t, planes in enumerate(all_planes)
        ]
    )


# Query sets at or below this row count are safely broadcast; above it the
# bucket join falls back to a shuffle equi-join (an unconditional broadcast
# OOMs the executors when a caller probes with a corpus-sized query set).
BROADCAST_QUERY_LIMIT = 100_000


def _maybe_broadcast(q: DataFrame, hint: bool | None, limit: int = BROADCAST_QUERY_LIMIT):
    """Broadcast `q` only when the caller says so or a bounded probe (a
    count over at most limit+1 rows, not a full scan) proves it small."""
    if hint is None:
        hint = q.limit(limit + 1).count() <= limit
    return F.broadcast(q) if hint else q


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    bits: int = 4,
    tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    broadcast_queries: bool | None = None,
) -> DataFrame:
    """Approximate top-k via multi-table random-hyperplane LSH: a candidate
    is scored iff it shares a bucket with the query in >=1 of `tables`
    independent hash tables. (q, neighbor, cos). Recall tunes with
    bits (bucket purity) x tables (probes); tested against the brute-force
    baseline. Per-table bucket join = equi-join, so the corpus is scanned
    once and shuffled once on (table, bucket) — no all-pairs blowup."""
    from pyspark.sql.window import Window

    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    all_planes = [_hyperplanes(dim, bits, seed=1234567 + 7919 * t) for t in range(tables)]
    c = corpus.select(F.col(id_col).alias("neighbor"), as_double(F.col(vec_col)).alias("cv"))
    c = c.select("neighbor", "cv", F.explode(_table_buckets(F.col("cv"), all_planes)).alias("tb"))
    q = queries.select(F.col(id_col).alias("q"), as_double(F.col(vec_col)).alias("qv"))
    q = _maybe_broadcast(q, broadcast_queries)
    q = q.select("q", "qv", F.explode(_table_buckets(F.col("qv"), all_planes)).alias("tb"))
    cands = (
        c.join(q, on=["tb"])
        .filter(F.col("q") != F.col("neighbor"))
        .select("q", "qv", "neighbor", "cv")
        .dropDuplicates(["q", "neighbor"])
    )
    scored = cands.select("q", "neighbor", F.round(cosine(F.col("qv"), F.col("cv")), 4).alias("cos"))
    w = Window.partitionBy("q").orderBy(F.col("cos").desc(), F.col("neighbor").asc())
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k).drop("rk")


def int_hyperplanes(
    dim: int, bits: int, tables: int, seed: int = 987654321
) -> list[list[list[int]]]:
    """Deterministic integer hyperplanes (components in {-2,-1,1,2}, LCG).

    Integer weights + integer-quantized vectors make the bucket assignment
    exact integer arithmetic — bit-identical in Spark and in the DuckDB
    oracle, with no float sign-boundary risk. Sign-LSH with quantized
    projections preserves the cosine-locality guarantee."""
    state = seed
    vals = [-2, -1, 1, 2]

    def nxt() -> int:
        nonlocal state
        state = (6364136223846793005 * state + 1442695040888963407) % (1 << 63)
        return state

    return [
        [[vals[nxt() % 4] for _ in range(dim)] for _ in range(bits)] for _ in range(tables)
    ]


def quantize(vec: Column, scale: int = 1000) -> Column:
    """array<long>: round(x*scale) per component — the exact integer surface
    both engines hash on."""
    return F.transform(vec, lambda x: F.round(x * scale).cast("long"))


def _int_dot(vq: Column, weights: list[int]) -> Column:
    return F.aggregate(
        F.zip_with(vq, F.array(*[F.lit(w).cast("long") for w in weights]), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda s, v: s + v,
    )


def _int_table_buckets(vq_name: str, planes: list[list[list[int]]]) -> Column:
    """array<struct<table, bucket>> of integer sign-LSH buckets, reading
    the quantized vector from the NAMED column ``vq_name`` (callers stage
    it with .withColumn — a leaf reference, not a copied subtree).

    Rendered as ONE SQL expression string: the previous Column-API form
    issued a py4j roundtrip per plane WEIGHT (tables x bits x dim F.lit
    calls — thousands per call site), putting >10s of pure driver chatter
    into every LSH query's build. A single F.expr is built with Python
    string ops and parsed once on the JVM, producing the identical
    expression tree."""
    tables = []
    for t, tbl in enumerate(planes):
        bits = []
        for b, weights in enumerate(tbl):
            arr = "array(" + ",".join(f"{w}L" for w in weights) + ")"
            dot = (
                f"aggregate(zip_with({vq_name}, {arr}, (x, y) -> x * y), "
                "0L, (s, v) -> s + v)"
            )
            bits.append(f"shiftleft(cast(if({dot} > 0, 1, 0) as bigint), {b})")
        bucket = " ^ ".join(bits) if bits else "0L"
        tables.append(f"struct({t} as table, cast({bucket} as bigint) as bucket)")
    return F.expr("array(" + ",".join(tables) + ")")


def lsh_ann_topk_quantized(
    corpus: DataFrame,
    queries: DataFrame,
    planes: list[list[list[int]]],
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    broadcast_queries: bool | None = None,
) -> DataFrame:
    """lsh_ann_topk with deterministic integer sign-LSH buckets: same
    one-scan + bucket-equi-join shape, but the signature arithmetic is exact
    integers, so a SQL oracle reproduces the candidate set bit-for-bit."""
    from pyspark.sql.window import Window

    c = corpus.select(F.col(id_col).alias("neighbor"), as_double(F.col(vec_col)).alias("cv"))
    c = c.withColumn("__vq", quantize(F.col("cv"))).select(
        "neighbor", "cv", F.explode(_int_table_buckets("__vq", planes)).alias("tb")
    )
    q = queries.select(F.col(id_col).alias("q"), as_double(F.col(vec_col)).alias("qv"))
    q = _maybe_broadcast(q, broadcast_queries)
    q = q.withColumn("__vq", quantize(F.col("qv"))).select(
        "q", "qv", F.explode(_int_table_buckets("__vq", planes)).alias("tb")
    )
    cands = (
        c.join(q, on=["tb"])
        .filter(F.col("q") != F.col("neighbor"))
        .select("q", "qv", "neighbor", "cv")
        .dropDuplicates(["q", "neighbor"])
    )
    scored = cands.select("q", "neighbor", F.round(cosine(F.col("qv"), F.col("cv")), 4).alias("cos"))
    w = Window.partitionBy("q").orderBy(F.col("cos").desc(), F.col("neighbor").asc())
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k).drop("rk")


def _int_dot_cols(a: Column, b: Column) -> Column:
    """Exact integer dot product of two array<long> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda s, v: s + v
    )


def ivf_cells(
    corpus: DataFrame, n_cells: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """IVF centroid set: (cell, cq quantized centroid). Deterministic seed
    rule — the n_cells lowest-id vectors — so a SQL oracle reproduces the
    index exactly; at scale these seeds would be refined with a few Lloyd
    iterations (each: assign via this same broadcast dot, re-average), which
    keeps the same plan shape but makes the oracle data-dependent."""
    return corpus.filter(F.col(id_col) < n_cells).select(
        F.col(id_col).alias("cell"), quantize(as_double(F.col(vec_col))).alias("cq")
    )


def ivf_cells_refined(
    corpus: DataFrame,
    n_cells: int,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd-refined IVF centroids (k-means on the quantized integer
    surface): seed with the n_cells lowest-id vectors, then `iters` rounds
    of assign-to-max-dot centroid + component-wise re-average.

    All arithmetic is exact integers (quantized vectors, floor-division
    averages), so the refined centroid set — and therefore the bucket
    structure — is bit-identical in Spark and a SQL oracle. Each round is
    one broadcast-centroid corpus pass (no shuffle) + one (cell, component)
    aggregation; centroid state is n_cells rows, checkpointed per round.
    Cells that lose all members drop out, as in IVF training. At 100 TB,
    run the same loop on a sampled corpus fraction — the plan shape holds.
    """
    from pyspark.sql.window import Window

    cells = ivf_cells(corpus, n_cells, id_col, vec_col)
    vq = corpus.select(
        F.col(id_col).alias("vid"), quantize(as_double(F.col(vec_col))).alias("vq")
    )
    for _ in range(iters):
        scored = vq.crossJoin(F.broadcast(cells)).select(
            "vid", "vq", "cell", _int_dot_cols(F.col("vq"), F.col("cq")).alias("_d")
        )
        w = Window.partitionBy("vid").orderBy(F.col("_d").desc(), F.col("cell").asc())
        assigned = (
            scored.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") == 1)
            .select("vq", "cell")
        )
        comp = (
            assigned.select("cell", F.posexplode("vq").alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.floor(F.sum("val") / F.count(F.lit(1))).cast("long").alias("c"))
        )
        cells = (
            comp.groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
            .select("cell", F.transform("pc", lambda s: s["c"]).alias("cq"))
            .localCheckpoint(eager=True)
        )
    return cells


def ivf_assign(
    df: DataFrame,
    cells: DataFrame,
    n: int,
    name: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-n cells per vector by exact integer dot product (ties → lower
    cell id): (name, <name>_v double vector, cell). n=1 assigns corpus
    vectors; n=n_probe picks query probe cells. The centroid side is tiny
    and broadcast — one corpus scan, no shuffle until the bucket join."""
    from pyspark.sql.window import Window

    v = df.select(
        F.col(id_col).alias(name),
        as_double(F.col(vec_col)).alias(f"{name}_v"),
        quantize(as_double(F.col(vec_col))).alias("_vq"),
    )
    scored = v.crossJoin(F.broadcast(cells)).select(
        name, f"{name}_v", "cell", _int_dot_cols(F.col("_vq"), F.col("cq")).alias("_d")
    )
    w = Window.partitionBy(name).orderBy(F.col("_d").desc(), F.col("cell").asc())
    return (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= n)
        .select(name, f"{name}_v", "cell")
    )


def ivf_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cells: DataFrame | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: corpus vectors are bucketed
    into their nearest centroid's cell; each query scans only its n_probe
    nearest cells. (q, neighbor, cos). Pass `cells` to search over a
    pre-built (e.g. Lloyd-refined) centroid set.

    The 100 TB shape: cell assignment is a broadcast-centroid map-side pass
    (one corpus scan, no shuffle), the candidate join is a cell equi-join
    (shuffle keyed on ~n_cells values — at scale use enough cells that
    cells ≫ executors, and AQE skew-join splits hot cells), and exact
    cosine runs only on probed candidates (~n_probe/n_cells of the corpus
    per query). Integer-quantized assignment arithmetic makes the bucket
    structure bit-identical in Spark and the DuckDB oracle."""
    from pyspark.sql.window import Window

    if cells is None:
        cells = ivf_cells(corpus, n_cells, id_col, vec_col)
    c = ivf_assign(corpus, cells, 1, "neighbor", id_col, vec_col)
    q = ivf_assign(queries, cells, n_probe, "q", id_col, vec_col)
    cands = (
        c.join(q, on="cell")
        .filter(F.col("q") != F.col("neighbor"))
        .dropDuplicates(["q", "neighbor"])
    )
    scored = cands.select(
        "q", "neighbor", F.round(cosine(F.col("q_v"), F.col("neighbor_v")), 4).alias("cos")
    )
    w = Window.partitionBy("q").orderBy(F.col("cos").desc(), F.col("neighbor").asc())
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k).drop("rk")


def build_ivf_index(
    corpus: DataFrame,
    n_cells: int = 16,
    refine_iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """(cells, assignments) — the persistable IVF index: centroids plus
    each corpus vector's nearest cell. Build once per corpus, save with
    :func:`save_ivf_index`, and every later query pays only its own probe
    joins — at 100 TB the assignment pass (one full corpus scan) is the
    expensive step, so amortizing it across queries is the point of an
    inverted file."""
    cells = (
        ivf_cells_refined(corpus, n_cells, refine_iters, id_col, vec_col)
        if refine_iters > 0
        else ivf_cells(corpus, n_cells, id_col, vec_col)
    )
    assign = ivf_assign(corpus, cells, 1, "neighbor", id_col, vec_col)
    return cells, assign


def save_ivf_index(cells: DataFrame, assign: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Persist the index: centroids + assignments, the latter partitioned
    by cell so a probe reads only its n_probe cell directories (partition
    pruning = the inverted-file posting-list seek)."""
    cells.coalesce(1).write.mode(mode).parquet(f"{path}/cells")
    assign.withColumn("v_arr", F.col("neighbor_v")).drop("neighbor_v").write.mode(
        mode
    ).partitionBy("cell").parquet(f"{path}/assign")


def load_ivf_index(spark, path: str) -> tuple[DataFrame, DataFrame]:
    cells = spark.read.parquet(f"{path}/cells")
    assign = (
        spark.read.parquet(f"{path}/assign")
        .withColumn("neighbor_v", F.col("v_arr"))
        .drop("v_arr")
    )
    return cells, assign


def ivf_index_topk(
    cells: DataFrame,
    assign: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k over a pre-built (possibly reloaded) IVF index: queries assign
    to their n_probe nearest cells (broadcast centroids), then a cell
    equi-join against the stored assignments — cell-partitioned storage
    turns the join's scan into partition-pruned reads. Same output contract
    as ivf_ann_topk."""
    from pyspark.sql.window import Window

    q = ivf_assign(queries, cells, n_probe, "q", id_col, vec_col)
    cands = (
        assign.join(q, on="cell")
        .filter(F.col("q") != F.col("neighbor"))
        .dropDuplicates(["q", "neighbor"])
    )
    scored = cands.select(
        "q", "neighbor", F.round(cosine(F.col("q_v"), F.col("neighbor_v")), 4).alias("cos")
    )
    w = Window.partitionBy("q").orderBy(F.col("cos").desc(), F.col("neighbor").asc())
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k).drop("rk")


def lsh_near_dup_pairs(
    corpus: DataFrame,
    planes: list[list[list[int]]],
    min_cos: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup via LSH candidates + exact-cosine verify — the
    scale path (bucket equi-join, no corpus×corpus cartesian). Output
    (a, b, cos >= min_cos) over pairs sharing >=1 bucket."""
    c = corpus.select(F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("v"))
    bucketed = c.withColumn("__vq", quantize(F.col("v"))).select(
        "id", "v", F.explode(_int_table_buckets("__vq", planes)).alias("tb")
    )
    left = bucketed.select("tb", F.col("id").alias("a"), F.col("v").alias("va"))
    right = bucketed.select("tb", F.col("id").alias("b"), F.col("v").alias("vb"))
    cands = (
        left.join(right, on=["tb"])
        .filter(F.col("a") < F.col("b"))
        .dropDuplicates(["a", "b"])
    )
    return (
        cands.select("a", "b", F.round(cosine(F.col("va"), F.col("vb")), 4).alias("cos"))
        .filter(F.col("cos") >= min_cos)
    )


def embedding_near_dup_pairs(
    corpus: DataFrame,
    min_cos: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs (a, b, cos >= min_cos) — embedding-cosine near-duplicate
    detection. Exact all-pairs here; at scale, run lsh_ann_topk per shard
    and keep pairs above threshold instead."""
    c = corpus.select(F.col(id_col).alias("a"), as_double(F.col(vec_col)).alias("va"))
    d = corpus.select(F.col(id_col).alias("b"), as_double(F.col(vec_col)).alias("vb"))
    return (
        c.crossJoin(d)
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", F.round(cosine(F.col("va"), F.col("vb")), 4).alias("cos"))
        .filter(F.col("cos") >= min_cos)
    )


# ---------------------------------------------------- product quantization --
def _int_l2_cols(a: Column, b: Column) -> Column:
    """Exact integer squared-L2 between two quantized vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda s, v: s + v,
    )


def _pq_subvectors(
    df: DataFrame, id_alias: str, m: int, dim: int, vec_col: str, id_col: str = "vec_id"
) -> DataFrame:
    """(id, sub, sv): each vector's quantized sub-slices, one row per
    subspace (m rows per vector)."""
    sub_len = dim // m
    vq = quantize(as_double(F.col(vec_col)))
    slices = F.array(
        *[
            F.struct(
                F.lit(s).alias("sub"), F.slice(vq, s * sub_len + 1, sub_len).alias("sv")
            )
            for s in range(m)
        ]
    )
    return df.select(F.col(id_col).alias(id_alias), F.explode(slices).alias("x")).select(
        id_alias, "x.sub", "x.sv"
    )


def _pq_assign(subs: DataFrame, books: DataFrame, id_alias: str) -> DataFrame:
    """Nearest codebook entry per (vector, subspace) by exact integer
    squared-L2; ties break to the lower code — deterministic, so a SQL
    oracle reproduces every code."""
    from pyspark.sql.window import Window

    scored = subs.join(F.broadcast(books), on="sub").select(
        id_alias, "sub", "sv", "code", _int_l2_cols(F.col("sv"), F.col("cq")).alias("_d")
    )
    w = Window.partitionBy(id_alias, "sub").orderBy(F.col("_d").asc(), F.col("code").asc())
    return (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select(id_alias, "sub", "sv", "code")
    )


def pq_codebooks(
    corpus: DataFrame,
    m: int = 4,
    k: int = 8,
    iters: int = 1,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Product-quantization codebooks (Jégou et al.): the dim splits into m
    subspaces; per subspace, k centroids Lloyd-refined from the k lowest-id
    vectors' sub-slices. Integer arithmetic end-to-end (quantized values,
    floor-average updates), so the codebooks — and every code assignment —
    are bit-identical in Spark and a SQL oracle. Returns (sub, code, cq).

    Scale: codebooks are m*k rows (broadcast); each Lloyd round is one
    corpus-subvector pass + one (sub, code, pos) aggregation. At 100 TB,
    train on a sampled fraction — the plan shape holds."""
    subs = _pq_subvectors(corpus, "vid", m, dim, vec_col, id_col)
    # seed from the k LOWEST ids actually present (ADVICE r4: a sparse or
    # non-zero-based id space silently trained fewer than k centroids per
    # subspace under the literal `vid < k` predicate); ranks densify the
    # seed ids into codes 0..k-1
    from pyspark.sql.window import Window

    seeds = (
        subs.select("vid")
        .distinct()
        .orderBy("vid")
        .limit(k)
        .withColumn("code", F.row_number().over(Window.orderBy("vid")) - F.lit(1))
    )
    books = subs.join(F.broadcast(seeds), on="vid").select(
        "sub", "code", F.col("sv").alias("cq")
    )
    for _ in range(iters):
        assigned = _pq_assign(subs, books, "vid")
        comp = (
            assigned.select("sub", "code", F.posexplode("sv").alias("pos", "val"))
            .groupBy("sub", "code", "pos")
            .agg(F.floor(F.sum("val") / F.count(F.lit(1))).cast("long").alias("c"))
        )
        books = (
            comp.groupBy("sub", "code")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
            .select("sub", "code", F.transform("pc", lambda s: s["c"]).alias("cq"))
            .localCheckpoint(eager=True)
        )
    return books


def pq_encode(
    corpus: DataFrame,
    books: DataFrame,
    m: int = 4,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(neighbor, sub, code): the corpus compressed to m small codes per
    vector — at 100 TB this is the in-memory structure ADC search scans
    (m bytes/vector at k<=256 vs dim*4 for raw floats)."""
    subs = _pq_subvectors(corpus, "neighbor", m, dim, vec_col, id_col)
    return _pq_assign(subs, books, "neighbor").select("neighbor", "sub", "code")


def pq_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    m: int = 4,
    n_codes: int = 8,
    n_rescore: int = 10,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """PQ asymmetric-distance (ADC) top-k: per-query subspace distance
    tables against the codebooks (tiny, broadcast), approximate distance =
    sum of m table lookups over the compressed codes, exact-cosine rescore
    of the n_rescore best. Returns (q, neighbor, cos) — the fourth ANN
    strategy next to brute-force, sign-LSH, and IVF.

    Scale: the candidate-generation scan touches ONLY the m-codes table
    (never the raw vectors); raw embeddings are read again just for the
    q×n_rescore rescore join."""
    from pyspark.sql.window import Window

    books = pq_codebooks(corpus, m=m, k=n_codes, dim=dim, vec_col=vec_col, id_col=id_col)
    codes = pq_encode(corpus, books, m=m, dim=dim, vec_col=vec_col, id_col=id_col)
    qtab = (
        _pq_subvectors(queries, "q", m, dim, vec_col, id_col)
        .join(F.broadcast(books), on="sub")
        .select("q", "sub", "code", _int_l2_cols(F.col("sv"), F.col("cq")).alias("d"))
    )
    apx = (
        codes.join(F.broadcast(qtab), on=["sub", "code"])
        .filter(F.col("q") != F.col("neighbor"))
        .groupBy("q", "neighbor")
        .agg(F.sum("d").alias("apx"), F.count(F.lit(1)).alias("_m"))
        # a candidate must have a lookup in EVERY subspace (it always does —
        # the join is total over codes — but the guard keeps the sum honest)
        .filter(F.col("_m") == m)
    )
    # two-phase rank: the approx-distance table has one row per (q, corpus
    # vector), so a single per-query window would sort the whole corpus in
    # one task — same fix as brute_force_topk
    cand = two_phase_topk(apx, n_rescore, [F.col("apx").asc(), F.col("neighbor").asc()])
    cv = corpus.select(F.col(id_col).alias("neighbor"), as_double(F.col(vec_col)).alias("nv"))
    qv = queries.select(F.col(id_col).alias("q"), as_double(F.col(vec_col)).alias("qvv"))
    rescored = (
        cand.select("q", "neighbor")
        .join(cv, on="neighbor")
        .join(F.broadcast(qv), on="q")
        .select("q", "neighbor", F.round(cosine(F.col("qvv"), F.col("nv")), 4).alias("cos"))
    )
    wk = Window.partitionBy("q").orderBy(F.col("cos").desc(), F.col("neighbor").asc())
    return (
        rescored.withColumn("_r", F.row_number().over(wk))
        .filter(F.col("_r") <= k)
        .select("q", "neighbor", "cos")
    )


def matryoshka_topk(
    corpus: DataFrame,
    queries: DataFrame,
    d_prime: int,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Matryoshka-truncated retrieval (Kusupati et al. 2022, public): slice
    every embedding to its FIRST ``d_prime`` dimensions and run exact cosine
    top-k on the truncated space — the MRL serving pattern where a nested
    prefix of the embedding carries most of the signal at a fraction of the
    scan cost. Cosine over the slices renormalizes implicitly (dot over the
    sliced norms), so no separate renormalization pass is needed.

    At 100 TB this is a bandwidth lever: the truncated scan reads d'/d of
    the vector bytes; pair it with pq/ivf candidates for the full two-stage
    story. Returns (q, neighbor, cos) like brute_force_topk."""
    t = lambda d: d.select(
        F.col(id_col), F.slice(F.col(vec_col), 1, d_prime).alias(vec_col)
    )
    return brute_force_topk(t(corpus), t(queries), k=k, id_col=id_col, vec_col=vec_col)


def matryoshka_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    d_prime: int,
    shortlist: int = 20,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage matryoshka retrieval (the MRL serving pattern end to end):
    stage 1 shortlists per query on the FIRST ``d_prime`` dims (d'/d of the
    scan bytes), stage 2 reranks only the shortlist with full-dimension
    cosine. At 100 TB the full vectors are touched for q x shortlist rows
    only — the same economics as PQ-ADC's rescore, with truncation instead
    of codes. Returns (q, neighbor, cos) with full-precision scores."""
    from pyspark.sql.window import Window

    short = matryoshka_topk(
        corpus, queries, d_prime=d_prime, k=shortlist, id_col=id_col, vec_col=vec_col
    ).select("q", "neighbor")
    c = corpus.select(F.col(id_col).alias("neighbor"), as_double(F.col(vec_col)).alias("cv"))
    qv = queries.select(F.col(id_col).alias("q"), as_double(F.col(vec_col)).alias("qv"))
    scored = (
        short.join(c, "neighbor")
        .join(F.broadcast(qv), "q")
        .select("q", "neighbor", F.round(cosine(F.col("qv"), F.col("cv")), 4).alias("cos"))
    )
    w = Window.partitionBy("q").orderBy(F.col("cos").desc(), F.col("neighbor").asc())
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k).drop("rk")
