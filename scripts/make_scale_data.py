"""Materialize an N-times-replicated derivative of the sf0.1 testdata for the
bench scale point (r10 verdict item 5: every scale claim above sf0.1 rested on
plan shapes; the iterative suites are fixed-overhead-dominated at sf0.1, so
the sf0.1 bench cannot distinguish a per-round regression from a throughput
one).

Replication discipline — "the same workload, N times larger", not an
adversarial or degenerate variant:

* Every fact table's keys are shifted by CONTIGUOUS per-table strides
  (stride = the table's row count; base keys are 0..count-1), so the key
  space of the scaled table is again dense 0..N*count-1. That matters for
  the custkey binary tree the closure/GAS suites build (parent = key//2):
  a contiguous range keeps the tree DENSE and makes it log2(N) levels
  DEEPER — the closure workload genuinely scales instead of fragmenting
  into N shallow forests (which a sparse 1e9-stride shift would cause).
* Foreign keys shift by the referenced table's stride, so every join keeps
  its exact selectivity per replica.
* Dimension tables (region, nation) are NOT replicated and reference keys
  to them are NOT shifted — group-by-nation answers scale in count, not in
  group cardinality, like a real N-times-bigger warehouse.
* Document text is perturbed per replica by a vowel/consonant rotation
  (vectorized translate, one expression): replicas are NOT near-duplicates
  of each other, so the dedup/LSH workload scales linearly in candidates
  the way a genuinely larger corpus would — naive text copies would make
  every doc an exact dup of its N-1 clones and quadratically explode the
  pair verification instead.

Output is cached under .scale_data/ next to the repo root with a marker
recording the factor; repeated bench runs reuse it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BASE = "/root/testdata/sf0.1"

# per-table primary-key stride (== row count at sf0.1; keys are 0..count-1)
_STRIDE = {
    "customer": 15_000,
    "orders": 150_000,
    "part": 20_000,
    "supplier": 1_000,
    "events": 100_000,
    "documents": 5_000,
    "embeddings": 2_000,
}

# (table, {column: stride-table}) — primary key + FKs to replicated tables;
# nation/region references deliberately absent (dims stay fixed).
_SHIFTS = {
    "customer": {"c_custkey": "customer"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {"l_orderkey": "orders", "l_partkey": "part", "l_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "supplier": {"s_suppkey": "supplier"},
    "events": {"event_id": "events"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}

_TRANSLATE_SRC = "aeiourstln"
# 10 deterministic derangement-ish rotations of the source alphabet; replica i
# rewrites text through rotation i, so cross-replica shingle overlap ~0.
_TRANSLATE_DST = [
    "aeiourstln",  # replica 0: identity (the original corpus)
    "eiouarstnl",
    "iouaesrtln",
    "ouaeitsrnl",
    "uaeiolnrst",
    "aeuiortsln",
    "eoiuanlstr",
    "iaoeulnsrt",
    "oeaiustlrn",
    "ueoiarnlts",
]

MAX_FACTOR = len(_TRANSLATE_DST)


def _replicate(df: DataFrame, factor: int, shifts: dict[str, str], perturb_text: bool) -> DataFrame:
    rep = df.crossJoin(
        df.sparkSession.range(factor).select(F.col("id").cast("int").alias("__rep"))
    )
    for col, stable in shifts.items():
        rep = rep.withColumn(col, F.col(col) + F.col("__rep").cast("long") * _STRIDE[stable])
    if perturb_text:
        expr = F.col("text")
        for i in range(1, factor):
            expr = F.when(
                F.col("__rep") == i, F.translate(F.col("text"), _TRANSLATE_SRC, _TRANSLATE_DST[i])
            ).otherwise(expr)
        rep = rep.withColumn("text", expr)
    return rep.drop("__rep")


def ensure_scale_data(
    spark: SparkSession, factor: int, base: str = BASE, out_root: str | None = None
) -> str:
    """Build (once) and return the sf_dir of the factor-times-replicated
    testdata derivative. Idempotent: a marker file records the factor."""
    if not 1 <= factor <= MAX_FACTOR:
        raise ValueError(f"factor must be in [1, {MAX_FACTOR}], got {factor}")
    root = out_root or os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale_data")
    out = os.path.join(root, f"sf0.{factor}" if factor < 10 else "sf1.0")
    marker = os.path.join(out, "_SCALE_OK")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)

    def write_single_file(df: DataFrame, t: str) -> None:
        # the harness loaders read each table as ONE parquet file (footer
        # metadata via pyarrow), so land the replica as a single file —
        # row-group splitting keeps scan parallelism
        import glob
        import shutil

        tmp = f"{out}/_tmp_{t}"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        os.replace(part, f"{out}/{t}.parquet")
        shutil.rmtree(tmp)

    for t in ("region", "nation"):
        write_single_file(spark.read.parquet(f"{base}/{t}.parquet"), t)
    for t, shifts in _SHIFTS.items():
        df = spark.read.parquet(f"{base}/{t}.parquet")
        write_single_file(
            _replicate(df, factor, shifts, perturb_text=(t == "documents")), t
        )
    with open(marker, "w") as f:
        f.write(str(factor))
    return out


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from blazegraph_database_spark.session import get_spark

    print(ensure_scale_data(get_spark("make-scale-data"), int(sys.argv[1]) if len(sys.argv) > 1 else 10))
