"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric", "value", "unit": "sec", "queries": {...}, "sf"}.
``value`` is the total wall-clock over the headline set; per-query seconds are
reported under "queries". Each query is forced with a count() (no driver
collect of payload rows).
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


def main() -> None:
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
    for warm in (HEADLINE[0] if HEADLINE else None, "gas_bfs_tree"):
        if warm in catalog:
            catalog[warm]["fn"](spark, sf_dir).count()

    per_q: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        if name not in catalog:
            continue
        t0 = time.time()
        catalog[name]["fn"](spark, sf_dir).count()
        dt = round(time.time() - t0, 3)
        per_q[name] = dt
        total += dt
    print(
        json.dumps(
            {
                "metric": "headline_total_wall",
                "value": round(total, 3),
                "unit": "sec",
                "queries": per_q,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
