"""Full-text search (SURVEY.md §2.6): distributed inverted index + ranked
keyword search, the Spark-first re-expression of the reference's
FullTextIndex / bds:search service (ref: bigdata-core/bigdata-rdf/src/java/
com/bigdata/rdf/store/.../search/FullTextIndex.java, Hit.java relevance,
and the bds: vocabulary options minRelevance/maxRank/prefixMatch/matchAll).

Index layout: (term, id, tf) + per-doc token length — the DataFrame analog
of the reference's term-ordered B+Tree; on disk it would be written
partitioned/bucketed by term so a keyword lookup prunes to its term's
partitions (POS-index analog for text).

Relevance: tf x idf as integer ppm — each matched (term, doc) contributes
round(tf * 1e6 * N / (doc_len * df)); the per-doc score is the SUM of those
integers. Integer summation makes the score independent of aggregation
order (bit-exact under any shuffle/partial-agg schedule) and lets DuckDB
reproduce it exactly — the float-sum alternative is schedule-dependent in
the last ulp. BM25 ranking (log-based, float) is offered as an option and
is fixture-tested rather than oracle-checked.

Everything is expression-only; the only driver-side values are the query
terms themselves.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"


def tokenize(text: Column) -> Column:
    """Lowercase alnum tokens."""
    return F.filter(F.split(F.lower(text), TOKEN_SPLIT_RE), lambda t: t != "")


def inverted_index(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(term, id, tf, dl): posting list rows with per-doc token length.

    One corpus scan AND one shuffle: the per-doc token length dl is
    computed in the scan (size of the token array, before the explode) and
    rides the groupBy as a functionally-dependent key — the alternative
    window-sum over postings re-shuffles the whole posting list a second
    time just to recover a number already known at tokenize time.
    """
    toks = df.select(F.col(id_col).alias("id"), tokenize(F.col(text_col)).alias("toks")).select(
        "id", F.size("toks").alias("dl"), F.explode("toks").alias("term")
    )
    return toks.groupBy("id", "dl", "term").agg(F.count(F.lit(1)).alias("tf")).select(
        "term", "id", "tf", "dl"
    )


def search(
    index: DataFrame,
    patterns: list[tuple[str, bool]],
    match_all: bool = False,
    min_relevance_ppm: int = 0,
    max_relevance_ppm: int | None = None,
    max_rank: int | None = 20,
    min_rank: int = 1,
    scored_filter=None,
    count_col: str | None = None,
    scoring: str = "tfidf",
) -> DataFrame:
    """Ranked keyword search over an inverted index.

    patterns: [(token, is_prefix)] — is_prefix matches term LIKE 'tok%'
    (ref: bds:prefixMatch). match_all = every pattern must match the doc
    (ref: bds:matchAllTerms); else any. min_relevance_ppm /
    max_relevance_ppm / max_rank / min_rank mirror bds:minRelevance /
    bds:maxRelevance / bds:maxRank / bds:minRank (minRank+maxRank page
    through results, ref: BDS.java MIN_RANK).

    Returns (id, score_ppm, rank), rank min_rank..max_rank by (score desc,
    id). The pattern set is tiny and broadcast; only matching posting rows
    leave the scan, so cost is O(postings of matched terms), not corpus
    size.
    """
    spark = index.sparkSession
    # index terms are lowercased at build time — lowercase the query tokens
    # too so the search is case-insensitive like the reference's analyzer
    patterns = [(t.lower(), p) for t, p in patterns]
    pats = spark.createDataFrame(patterns, "pat string, is_prefix boolean")
    n_docs = index.agg(F.count_distinct("id").alias("n"))

    cond = F.when(F.col("is_prefix"), F.col("term").startswith(F.col("pat"))).otherwise(
        F.col("term") == F.col("pat")
    )
    matched = index.join(F.broadcast(pats), on=cond).select("pat", "term", "id", "tf", "dl")
    dfreq = (
        index.join(F.broadcast(matched.select("term").distinct()), on="term")
        .groupBy("term")
        .agg(F.count_distinct("id").alias("df"))
    )
    if scoring == "cosine":
        # Reference-exact relevance (search/TermFrequencyData.java
        # normalize + Hit.java add): both the query and the document are
        # L2-normalized term-frequency vectors and the score is their dot
        # product — always in [0,1]; a prefix pattern contributes once per
        # doc term it matches, with the PATTERN's query weight.
        import math

        qmag = math.sqrt(len(patterns))
        dmag = index.groupBy("id").agg(
            F.sqrt(F.sum(F.col("tf") * F.col("tf"))).alias("dmag")
        )
        contrib = (
            F.col("tf") / F.col("dmag") / F.lit(qmag) * F.lit(1_000_000.0)
        )
        scored = (
            matched.join(F.broadcast(dmag), on="id")
            .groupBy("id")
            .agg(
                F.round(F.sum(contrib)).cast("long").alias("score_ppm"),
                F.count_distinct("pat").alias("npat"),
            )
        )
    else:
        contrib = F.round(
            F.col("tf") * F.lit(1_000_000.0) * F.col("n") / (F.col("dl") * F.col("df"))
        ).cast("long")
        scored = (
            matched.join(F.broadcast(dfreq), on="term")
            .crossJoin(F.broadcast(n_docs))
            .groupBy("id")
            .agg(F.sum(contrib).alias("score_ppm"), F.count_distinct("pat").alias("npat"))
        )
    if match_all:
        scored = scored.filter(F.col("npat") == len(patterns))
    scored = scored.filter(F.col("score_ppm") >= min_relevance_ppm).drop("npat")
    if max_relevance_ppm is not None:
        scored = scored.filter(F.col("score_ppm") <= max_relevance_ppm)
    if scored_filter is not None:
        # hit-level filters (bds:matchExact/matchRegex) apply BEFORE rank
        # assignment and the maxRank cut, like every other hit filter
        scored = scored_filter(scored)
    if count_col is not None:
        # bds:rangeCount: the reference returns EXACTLY ONE solution
        # binding only the count var — hits are NOT enumerated, and a
        # zero-hit search still binds 0 (ref:
        # SearchServiceFactory.java:649 SingleValueChunkedIterator instead
        # of the hit iterator; ADVICE r4: the old per-hit crossJoin made
        # count 0 unobservable). Count is total pre-maxRank hits.
        return scored.agg(F.count(F.lit(1)).alias(count_col))
    if max_rank is None:
        # unranked hit SET (ref: searchInSearch uses DEFAULT_MAX_RANK =
        # Integer.MAX_VALUE — no rank cut, so no global sort either)
        return scored
    # TakeOrderedAndProject: orderBy+limit never materializes a global sort
    top = scored.orderBy(F.col("score_ppm").desc(), F.col("id").asc()).limit(max_rank)
    from pyspark.sql.window import Window

    w = Window.orderBy(F.col("score_ppm").desc(), F.col("id").asc())  # <= max_rank rows
    out = top.withColumn("rank", F.row_number().over(w))
    if min_rank > 1:
        out = out.filter(F.col("rank") >= min_rank)
    return out


def bm25_search(
    index: DataFrame,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    max_rank: int = 20,
) -> DataFrame:
    """BM25 ranking option (beyond the reference's tf/cosine relevance).
    Float log-based scores — fixture-tested, not oracle-matched."""
    stats = index.agg(
        F.count_distinct("id").alias("n"), (F.sum("tf") / F.count_distinct("id")).alias("avgdl")
    )
    matched = index.filter(F.col("term").isin(terms))
    dfreq = matched.groupBy("term").agg(F.count_distinct("id").alias("df"))
    idf = F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    tf_part = (F.col("tf") * (k1 + 1)) / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
    scored = (
        matched.join(F.broadcast(dfreq), on="term")
        .crossJoin(F.broadcast(stats))
        .groupBy("id")
        .agg(F.round(F.sum(idf * tf_part), 6).alias("bm25"))
    )
    return scored.orderBy(F.col("bm25").desc(), F.col("id").asc()).limit(max_rank)
