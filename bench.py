"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric", "value", "unit": "sec", "queries": {...}, "sf"}.
``value`` is the total wall-clock over the headline set; per-query seconds are
reported under "queries". Each query is forced with a count() (no driver
collect of payload rows).

Diagnostic modes (manual use; the driver runs the plain default):
  --double   run every suite TWICE back-to-back in one process and print one
             JSON line per pass — if pass 2's late suites degrade versus
             pass 1, the engine accumulates session state; if both passes
             agree, a late-suite drift seen elsewhere is machine state
             (page cache / GC history), not the tree (r10 verdict item 2).
  --reorder  run the suites in reverse order (curation, bsbm, then the
             headline set last) — the complementary probe: a suite that is
             slow only when it runs LAST is paying for position, not for
             its own plan.
  --scale N  run the 6-query scale suite at an N-times-replicated sf0.1
             derivative (see scripts/make_scale_data.py) instead of the
             headline suites — the throughput point where per-round fixed
             overhead no longer dominates (r10 verdict item 5).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: one representative per operator family (SURVEY.md §2). Missing
# names (not yet implemented this round) are skipped so bench never breaks.
HEADLINE = [
    "bgp_join_agg",        # §2.3 BGP multi-join + agg
    "agg_suite",           # §2.3 aggregates (TPC-H Q1 shape)
    "optional_count",      # §2.3 OPTIONAL
    "exists_bigqty",       # §2.3 EXISTS semi-join
    "path_closure_ancestors",  # §2.3 arbitrary-length path
    "gas_bfs_tree",        # §2.5 GAS BFS
    "gas_cc_bipartite",    # §2.5 GAS CC
    "gas_pagerank",        # §2.5 GAS PageRank
    "fulltext_search",     # §2.6 full-text
    "dedup_exact",         # §2.11 exact dedup
    "dedup_minhash_lsh",   # §2.11 MinHash LSH near-dup
    "ann_cosine_topk",     # §2.11 brute-force ANN
    "text_quality",        # §2.11 quality scoring
    "stream_window_agg",   # §2.10 windowed agg (batch-equivalent)
    "geo_radius",          # §2.7 geospatial
    "rdfs_closure_types",  # §2.8 inference
]

_CURATION_SUITE = [
    "text_paragraph_dedup",
    "dataset_dsir_resample",
    "quality_nb_classifier",
    "text_ccnet_buckets",
    "ann_matryoshka",
]

# Scale suite (bench.py --scale N): one representative per cost family whose
# sf0.1 number is fixed-overhead-dominated — at the replicated scale point the
# same queries are throughput-bound, so a per-round or per-byte regression
# that sf0.1 hides becomes visible (r10 verdict item 5).
_SCALE_SUITE = [
    "bgp_join_agg",        # scan + multi-join + agg
    "path_closure_ancestors",  # iterative closure
    "gas_pagerank",        # iterative GAS
    "dedup_minhash_lsh",   # shuffle-heavy LSH
    "dedup_exact",         # single-shuffle hash agg
    "text_quality",        # pure expression scan
]


def _timed_pass(spark, catalog, sf_dir: str, sf: float, reorder: bool) -> dict:
    """One full measurement pass over all suites; returns the output dict."""
    per_q: dict[str, float] = {}
    cur_q: dict[str, float] = {}

    def run_set(names, sink):
        for name in names:
            if name not in catalog:
                continue
            t0 = time.time()
            catalog[name]["fn"](spark, sf_dir).count()
            sink[name] = round(time.time() - t0, 3)

    bsbm = None
    if reorder:
        run_set(_CURATION_SUITE, cur_q)
        bsbm = _bsbm_explore_total(spark)
        run_set(HEADLINE, per_q)
    else:
        run_set(HEADLINE, per_q)
        bsbm = _bsbm_explore_total(spark)
        run_set(_CURATION_SUITE, cur_q)

    out = {
        "metric": "headline_total_wall",
        "value": round(sum(per_q.values()), 3),
        "unit": "sec",
        "queries": per_q,
        "sf": sf,
    }
    if bsbm is not None:
        # realistic SPARQL query-mix wall clock (the reference's own BSBM
        # Explore fixtures over its bundled pc10 dataset) — pinned so
        # optimizer regressions on complex query SHAPES (nested OPTIONALs,
        # unions, aggregate subqueries, DESCRIBE/CONSTRUCT) show up
        # round-over-round next to the data-heavy headline set.
        # Floor (round 7, idle local[32]): ~17-20 s for the 12-query mix —
        # plan/parse dominated at pc10 size (5007 triples), so this metric
        # tracks OPTIMIZER cost, not data throughput. (The r6 ~11 s floor
        # was measured while query2 short-circuited to zero rows through a
        # since-fixed constant-subject join bug; it now runs its real
        # 13-pattern join + 3 OPTIONALs.)
        out["bsbm_explore_total"] = bsbm
    if cur_q:
        # round-7 curation/retrieval family wall clock (paragraph dedup,
        # DSIR, NB classifier, CCNet buckets, matryoshka ANN) — a separate
        # pinned metric so regressions on the LLM-pipeline operators stay
        # visible without disturbing the headline floor comparison.
        out["curation_suite_total"] = round(sum(cur_q.values()), 3)
        out["curation_queries"] = cur_q
    if reorder:
        out["suite_order"] = "curation,bsbm,headline"
    return out


def _scale_main(factor: int) -> None:
    from scripts.make_scale_data import ensure_scale_data

    from blazegraph_database_spark.registry import all_queries
    from blazegraph_database_spark.session import get_spark

    spark = get_spark("bench-scale")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = ensure_scale_data(spark, factor)
    catalog = all_queries()
    for warm in (_SCALE_SUITE[0], "gas_pagerank"):
        catalog[warm]["fn"](spark, sf_dir).count()
    r = _scale_pass(spark, catalog, factor)
    print(json.dumps({
        "metric": "scale_suite_total_wall",
        "value": r["scale_suite_total"],
        "unit": "sec",
        "queries": r["scale_queries"],
        "sf": r["scale_sf"],
    }))


def main() -> None:
    args = sys.argv[1:]
    if "--scale" in args:
        try:
            factor = int(args[args.index("--scale") + 1])
        except (IndexError, ValueError):
            sys.exit("usage: bench.py --scale N  (N = integer replication factor)")
        _scale_main(factor)
        return
    double = "--double" in args
    reorder = "--reorder" in args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0  # unrecognized dir naming; still benchmarkable

    from blazegraph_database_spark.registry import all_queries
    from blazegraph_database_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    catalog = all_queries()

    # Untimed warmup: the first JVM jobs pay JIT + codegen + parquet footer
    # caching (~5s) that belongs to session startup, not to any query. The
    # iterative GAS family exercises codegen/shuffle paths the scan-shaped
    # warmup never touches (cold-vs-warm delta measured at ~1.5-2s per
    # iterative query), so warm one of each shape. Results are NOT cached
    # across calls — every timed query still computes from the scan.
    # fulltext warms too: the reference builds its FullTextIndex at LOAD
    # time and serves queries from it, so the one-time index build belongs
    # to setup — the timed number measures the search.
    for warm in (HEADLINE[0] if HEADLINE else None, "gas_bfs_tree", "fulltext_search"):
        if warm in catalog:
            catalog[warm]["fn"](spark, sf_dir).count()

    out = _timed_pass(spark, catalog, sf_dir, sf, reorder)
    if double:
        out["pass"] = 1
        print(json.dumps(out))
        out2 = _timed_pass(spark, catalog, sf_dir, sf, reorder)
        out2["pass"] = 2
        print(json.dumps(out2))
        return
    if sf == 0.1:
        # the sf1.0 throughput point (replicated derivative, cached on
        # disk after the first build): the sf0.1 suites are fixed-
        # overhead-dominated for the iterative family, so only this
        # metric can catch a per-round/per-byte regression (r10 verdict
        # item 5). Floor pinned in BASELINE.md.
        try:
            out.update(_scale_pass(spark, catalog, 10))
        except Exception as e:  # surface, never mask: a crashing scale
            # suite must be distinguishable from "scale data unavailable"
            # or the 53.2s floor contract silently stops being checked
            out["scale_error"] = f"{type(e).__name__}: {e}"[:300]
            print(f"bench: scale pass failed: {e!r}", file=sys.stderr)
    print(json.dumps(out))


def _scale_pass(spark, catalog, factor: int) -> dict:
    from scripts.make_scale_data import ensure_scale_data

    sf_dir = ensure_scale_data(spark, factor)
    per_q: dict[str, float] = {}
    for name in _SCALE_SUITE:
        if name not in catalog:
            continue
        t0 = time.time()
        catalog[name]["fn"](spark, sf_dir).count()
        per_q[name] = round(time.time() - t0, 3)
    return {
        "scale_suite_total": round(sum(per_q.values()), 3),
        "scale_queries": per_q,
        "scale_sf": round(0.1 * factor, 3),
    }


# BSBM Explore mix (ref: bigdata-rdf-test .../eval/bsbm/explore, the same 13
# queries tests/test_reference_bsbm_queries.py pins for conformance).
_BSBM_DIR = (
    "/root/reference/bigdata-rdf-test/src/test/java/com/bigdata/rdf/"
    "sparql/ast/eval/bsbm"
)
_BSBM_EXPLORE = [
    "query1", "query2", "query3", "query4", "query5", "query5b",
    "query7", "query8", "query9", "query10", "query11", "query12",
]

_BSBM_STORE = []  # memoized across passes (load+cache belongs to setup)


def _bsbm_explore_total(spark) -> float | None:
    if not os.path.isdir(_BSBM_DIR):
        return None  # reference checkout absent: headline metrics only
    from blazegraph_database_spark.model.store import TripleStore
    from blazegraph_database_spark.plans.sparql_parser import run_sparql
    from blazegraph_database_spark.sources import ntriples

    if not _BSBM_STORE:
        _BSBM_STORE.append(TripleStore(
            ntriples.read_ntriples(spark, os.path.join(_BSBM_DIR, "bsbm3_dataset_pc10.nt"))
        ).cache())
    store = _BSBM_STORE[0]
    texts = [
        open(os.path.join(_BSBM_DIR, "explore", f"{q}.txt")).read()
        for q in _BSBM_EXPLORE
    ]

    def force(q: str) -> None:
        res = run_sparql(store, q)
        if res is not True and res is not False:
            res.count()

    force(texts[0])  # untimed: pc10 load + cache fill belongs to setup
    t0 = time.time()
    for q in texts:
        force(q)
    return round(time.time() - t0, 3)


if __name__ == "__main__":
    main()
