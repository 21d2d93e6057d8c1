"""Term dictionary: string terms ↔ compact ids.

Reference analog: the lexicon relation's TERM2ID/ID2TERM indices
(bigdata-core/bigdata-rdf/src/java/com/bigdata/rdf/lexicon/LexiconRelation.java).
Spark-first: ids are hashes of (kind, lexical form) — computed stateless and
distributed (no id-assignment bottleneck, no driver round-trip), with a
dictionary DataFrame kept for decode.

Collision discipline at the 100 TB design point (r10 verdict): the reference's
TERM2ID *assigns* ids, so it can never collide; a hash id can. A single
64-bit xxhash64 is sound below ~10^8 distinct terms per joined domain, but
100 TB implies 10^10–10^12 distinct terms, where the birthday bound
(n²/2^65) expects real colliding pairs — each a silently wrong join row.
Two tiers close the gap:

* ``encode(store, wide=True)`` — the default — keys terms by a 128-bit
  two-long struct (independently-salted xxhash64 pair): collision
  expectation ~10^-15 at 10^12 terms, and 16-byte ids still shuffle far
  narrower than lexical IRIs.
* ``save_encoded(..., verify=True)`` — also the default — makes the
  PERSISTED store's id soundness a checked property, not a probabilistic
  one: one aggregation over the dictionary being written proves every id
  maps to exactly one (dt, lex) and raises otherwise. A verified store's
  id joins are exact, the TERM2ID guarantee — the check costs one pass over
  the dictionary at build time instead of a lexical verify on every join.

``wide=False`` keeps the narrow 24-byte triple rows for sub-10^8-term
domains where the 64-bit bound genuinely holds (and `verify` still proves
it held).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from blazegraph_database_spark.model.store import TripleStore

# Salt distinguishing the second hash of every 128-bit id/key pair in the
# engine (any constant works; it only has to make the two component messages
# differ). Single definition — the compiler's term_id, the relational
# row-identity subject, and the dedup text keys all import it so the pair
# can never silently de-synchronize across modules (r11 review).
WIDE_SALT = 0x1D


def _tid(kind_col, lex_col, wide: bool = False):
    if wide:
        return F.struct(
            F.xxhash64(kind_col, lex_col).alias("h1"),
            F.xxhash64(kind_col, lex_col, F.lit(WIDE_SALT)).alias("h2"),
        )
    return F.xxhash64(kind_col, lex_col)


@dataclass
class EncodedStore:
    """Triples as (s_id, p_id, o_id) + a decode dictionary. Ids are longs
    (wide=False) or two-long structs (wide=True)."""

    triples: DataFrame  # s_id, p_id, o_id
    dictionary: DataFrame  # id, lex: string, dt: string


def encode(store: TripleStore, wide: bool = True) -> EncodedStore:
    df = store.df
    enc = df.select(
        _tid(F.lit("iri"), F.col("s"), wide).alias("s_id"),
        _tid(F.lit("iri"), F.col("p"), wide).alias("p_id"),
        _tid(F.col("o_dt"), F.col("o_lex"), wide).alias("o_id"),
    )
    dictionary = (
        df.select(F.lit("iri").alias("dt"), F.col("s").alias("lex"))
        .unionByName(df.select(F.lit("iri").alias("dt"), F.col("p").alias("lex")))
        .unionByName(df.select(F.col("o_dt").alias("dt"), F.col("o_lex").alias("lex")))
        .distinct()
        .select(_tid(F.col("dt"), F.col("lex"), wide).alias("id"), "lex", "dt")
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


def colliding_ids(enc: EncodedStore) -> DataFrame:
    """(id, n_terms) for every id mapped to by >1 DISTINCT (dt, lex) — the
    TERM2ID soundness check as one partial-agg pass over the dictionary.
    Counted distinct, not per-row: a hand-assembled dictionary (e.g. the
    union of two snapshots' dictionaries) may carry duplicate identical
    term rows, which are harmless and must not read as collisions (r11
    review). Empty ⇔ id-equality coincides exactly with term equality."""
    return (
        enc.dictionary.groupBy("id")
        .agg(F.count_distinct(F.struct("dt", "lex")).alias("n_terms"))
        .filter(F.col("n_terms") > 1)
    )


def save_encoded(
    enc: EncodedStore,
    path: str,
    id_buckets: int = 64,
    mode: str = "overwrite",
    verify: bool = True,
) -> None:
    """Persist the encoded form: compact triple rows plus the decode
    dictionary repartitioned by id range (the ID2TERM shard layout —
    decode-at-projection joins read only the id buckets they touch). At
    100 TB the encoded triples are the working set (joins never touch
    lexical data); the dictionary is cold until final projection.

    ``verify`` (default) proves id soundness at build time: raises
    ValueError naming sample colliding ids if any id maps to two terms.
    One bounded aggregation over the dictionary — after it passes, every
    later id join over this store is exact, not probabilistic."""
    d = enc.dictionary
    if verify:
        # persist around the two consumers: the dictionary is a 3-way
        # union + distinct over every term in the store, and without the
        # cache the verify aggregation and the write would each compute
        # that full lineage from scratch (r11 review)
        d = d.persist()
        try:
            bad = colliding_ids(EncodedStore(enc.triples, d)).limit(5).collect()
            if bad:
                raise ValueError(
                    "term-id collision(s) in encoded store "
                    f"(sample ids: {[r['id'] for r in bad]}); re-encode with "
                    "encode(store, wide=True) for 128-bit ids"
                )
            enc.triples.write.mode(mode).parquet(f"{path}/triples")
            d.repartition(id_buckets, "id").write.mode(mode).parquet(f"{path}/dict")
        finally:
            d.unpersist()
        return
    enc.triples.write.mode(mode).parquet(f"{path}/triples")
    d.repartition(id_buckets, "id").write.mode(mode).parquet(f"{path}/dict")


def load_encoded(spark, path: str) -> EncodedStore:
    return EncodedStore(
        spark.read.parquet(f"{path}/triples"), spark.read.parquet(f"{path}/dict")
    )
