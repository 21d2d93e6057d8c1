"""Persistent parquet triple-store layouts (SURVEY.md §2.1/§2.2).

Reference analog: the SPO/POS/OSP B+Tree index triplet plus DataLoader's
bulk load (bigdata-core/bigdata-rdf/.../spo/SPORelation.java,
store/DataLoader.java). A B+Tree keyed (p,o,s) makes "all triples with
predicate p" a range scan; the parquet analog is disk partitioning by
predicate, which Catalyst turns into partition pruning — a BGP pattern with
constant p reads ONLY that predicate's files. Within each partition, rows
are sorted by subject so parquet row-group min/max stats prune
subject-bound lookups (the SPO-within-POS analog). An optional second
layout repartitioned+sorted by subject serves subject-star joins
(SPO-index analog): co-partitioned on s, a star BGP joins without reshuffle.

Per-predicate stats are computed at write time and persisted next to the
data (the B+Tree range-count analog the join optimizer reads for free).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from blazegraph_database_spark.model.store import PredStat, TripleStore


def write_pos_layout(
    store: TripleStore, path: str, mode: str = "overwrite",
    compression: str | None = None,
) -> None:
    """POS-style layout: partitioned by predicate, subject-sorted within.
    ``compression`` overrides the parquet codec (e.g. "gzip" for archival
    backups; default stays the session codec, normally snappy)."""
    w = store.df.repartition("p").sortWithinPartitions("s").write.mode(mode)
    if compression is not None:
        w = w.option("compression", compression)
    w.partitionBy("p").parquet(f"{path}/pos")
    stats = store.df.groupBy("p").agg(
        F.count(F.lit(1)).alias("count"),
        F.approx_count_distinct("s").alias("n_distinct_s"),
        F.approx_count_distinct("o_lex").alias("n_distinct_o"),
    )
    stats.coalesce(1).write.mode(mode).parquet(f"{path}/stats")


def write_spo_layout(store: TripleStore, path: str, buckets: int = 64, mode: str = "overwrite") -> None:
    """SPO-style layout: hash-repartitioned on subject, subject-sorted.
    Subject-star BGPs over this layout join co-partitioned (no reshuffle
    when read with the same partitioning)."""
    (
        store.df.repartition(buckets, "s")
        .sortWithinPartitions("s", "p")
        .write.mode(mode)
        .parquet(f"{path}/spo")
    )


def read_store(spark: SparkSession, path: str) -> TripleStore:
    """Read the POS layout with its persisted stats pre-attached (no stats
    recomputation — the optimizer gets B+Tree-style range counts for free)."""
    df = spark.read.parquet(f"{path}/pos")
    stats_rows = spark.read.parquet(f"{path}/stats").collect()
    store = TripleStore(df)
    store._stats = {
        r["p"]: PredStat(r["count"], max(r["n_distinct_s"], 1), max(r["n_distinct_o"], 1))
        for r in stats_rows
    }
    store._stats_exact = True  # persisted counts come from the exact groupBy at write time
    return store


def read_spo(spark: SparkSession, path: str) -> TripleStore:
    return TripleStore(spark.read.parquet(f"{path}/spo"))


def write_bucketed_spo(
    store: TripleStore,
    table: str,
    buckets: int = 64,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed-by-subject table (Spark bucketing, not just repartition):
    the bucket spec is persisted in the catalog, so every read of this
    table is born hash-partitioned on ``s`` — subject-subject joins between
    two tables bucketed the same way run with NO Exchange on either side
    (verified by plan test). This is the durable form of the SPO co-location
    story: at 100 TB, bucket the fact-like predicates once at load time and
    every star/self join afterwards skips its shuffle (ref: the SPO B+Tree
    making subject access-paths free)."""
    w = (
        store.df.write.mode(mode)
        .format("parquet")
        .bucketBy(buckets, "s")
        .sortBy("s")
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> TripleStore:
    """Read a bucketed table with its bucket spec live (spark.table keeps
    the catalog's partitioning metadata; a raw parquet read would not)."""
    return TripleStore(spark.table(table))
