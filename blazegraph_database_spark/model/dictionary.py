"""Term dictionary: string terms ↔ 64-bit ids.

Reference analog: the lexicon relation's TERM2ID/ID2TERM indices
(bigdata-core/bigdata-rdf/src/java/com/bigdata/rdf/lexicon/LexiconRelation.java).
Spark-first: ids are ``xxhash64`` of (kind, lexical form) — computed
stateless and distributed (no id-assignment bottleneck, no driver round-trip),
with a dictionary DataFrame kept for decode. 64-bit xxhash collision odds stay
negligible below ~10^8 distinct terms per *joined* domain; at the 100 TB design
point you shard the decode dictionary by id range and keep joins on longs,
which halves shuffle width vs. string keys.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from blazegraph_database_spark.model.store import TripleStore


def _tid(kind_col, lex_col):
    return F.xxhash64(kind_col, lex_col)


@dataclass
class EncodedStore:
    """Triples as (s_id, p_id, o_id) longs + a decode dictionary."""

    triples: DataFrame  # s_id, p_id, o_id: long
    dictionary: DataFrame  # id: long, lex: string, dt: string


def encode(store: TripleStore) -> EncodedStore:
    df = store.df
    enc = df.select(
        _tid(F.lit("iri"), F.col("s")).alias("s_id"),
        _tid(F.lit("iri"), F.col("p")).alias("p_id"),
        _tid(F.col("o_dt"), F.col("o_lex")).alias("o_id"),
    )
    dictionary = (
        df.select(F.lit("iri").alias("dt"), F.col("s").alias("lex"))
        .unionByName(df.select(F.lit("iri").alias("dt"), F.col("p").alias("lex")))
        .unionByName(df.select(F.col("o_dt").alias("dt"), F.col("o_lex").alias("lex")))
        .distinct()
        .select(_tid(F.col("dt"), F.col("lex")).alias("id"), "lex", "dt")
    )
    return EncodedStore(enc, dictionary)


def decode(enc: EncodedStore) -> TripleStore:
    d = enc.dictionary
    t = enc.triples
    out = (
        t.join(d.select(F.col("id").alias("s_id"), F.col("lex").alias("s")), "s_id")
        .join(d.select(F.col("id").alias("p_id"), F.col("lex").alias("p")), "p_id")
        .join(d.select(F.col("id").alias("o_id"), F.col("lex").alias("o_lex"), F.col("dt").alias("o_dt")), "o_id")
        .select("s", "p", "o_lex", "o_dt")
    )
    return TripleStore(out)


def save_encoded(enc: EncodedStore, path: str, id_buckets: int = 64, mode: str = "overwrite") -> None:
    """Persist the encoded form: 24-byte triple rows plus the decode
    dictionary repartitioned by id range (the ID2TERM shard layout —
    decode-at-projection joins read only the id buckets they touch). At
    100 TB the encoded triples are the working set (joins never touch
    lexical data); the dictionary is cold until final projection."""
    enc.triples.write.mode(mode).parquet(f"{path}/triples")
    enc.dictionary.repartition(id_buckets, "id").write.mode(mode).parquet(f"{path}/dict")


def load_encoded(spark, path: str) -> EncodedStore:
    return EncodedStore(
        spark.read.parquet(f"{path}/triples"), spark.read.parquet(f"{path}/dict")
    )
