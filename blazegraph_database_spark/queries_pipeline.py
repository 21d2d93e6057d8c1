"""LLM-training-data-pipeline query catalog (SURVEY.md §2.11): dedup,
similarity search, text analysis, multimodal plumbing — over the harness
`documents` / `embeddings` tables, each with an exact DuckDB oracle where the
computation is SQL-expressible (hash-seeded LSH internals are not, but their
*outputs* are, because verification recomputes exact Jaccard — see below).

Oracle-parity rules used throughout:
- jaccard/ratios: integer counts on both sides, same double arithmetic, same
  ROUND at the same digit.
- rolling hash: (h*31+ascii)%1e9+7 — list_reduce in DuckDB, F.aggregate here.
- LSH near-dup: banding at 32x2 makes recall@j>=0.8 = 1-(1-j^2)^32 ~ 1-6e-15,
  so the LSH output provably equals the brute-force pair set the oracle
  computes (checked every round by the driver at sf0.01).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from blazegraph_database_spark.operators import dedup, multimodal, similarity, text
from blazegraph_database_spark.sources.relational import read_parquet

QUERIES: dict[str, dict] = {}


def register(name: str, sql: str | None):
    def deco(f):
        QUERIES[name] = {"fn": f, "sql": sql}
        return f

    return deco


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_parquet(spark, f"{sf_dir}/documents.parquet")


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_parquet(spark, f"{sf_dir}/embeddings.parquet")


# Shared DuckDB CTE: distinct word-3-gram shingles + per-doc sizes + exact
# pairwise jaccard (the brute-force truth the LSH path must reproduce).
_JACCARD_CTE = """
    WITH RECURSIVE w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws FROM documents),
    s AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(generate_series(1, GREATEST(len(ws) - 2, 0)),
                                     i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS g
        FROM w
    ),
    pairs AS (
        SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS inter
        FROM s x JOIN s y ON x.g = y.g AND x.doc_id < y.doc_id GROUP BY 1, 2
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM s GROUP BY doc_id),
    jac AS (
        SELECT a, b, ROUND(inter * 1.0 / (sx.n + sy.n - inter), 4) AS jac
        FROM pairs JOIN sizes sx ON a = sx.doc_id JOIN sizes sy ON b = sy.doc_id
    )
"""


@register(
    "dedup_exact",
    """
    SELECT MIN(doc_id) AS rep_id, COUNT(*) AS n_copies
    FROM documents
    GROUP BY regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via normalized-text hash groupBy."""
    return dedup.exact_dedup(_docs(spark, sf_dir))


@register("dedup_minhash_lsh", _JACCARD_CTE + "SELECT a, b, jac FROM jac WHERE jac >= 0.8")
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs, exact-verified at jaccard>=0.8. The oracle
    is brute-force all-pairs jaccard — LSH banding recall makes them equal."""
    return dedup.minhash_lsh_dedup(_docs(spark, sf_dir), threshold=0.8)


@register("dedup_ngram_jaccard", _JACCARD_CTE + "SELECT a, b, jac FROM jac WHERE jac >= 0.5")
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard pair similarity (explode-join-count baseline)."""
    return dedup.ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.5)


_SIMHASH_ORACLE = r"""
    WITH wd AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
        FROM documents WHERE trim(text) != ''
    ),
    tf AS (
        SELECT doc_id, w, COUNT(*) AS tf,
               CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT) AS h
        FROM wd GROUP BY 1, 2
    ),
    votes AS (
        SELECT doc_id, b.bit,
               SUM(CASE WHEN (h >> b.bit) & 1 = 1 THEN tf ELSE -tf END) AS v
        FROM tf CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS bit) b
        GROUP BY 1, 2
    ),
    sig AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS s
        FROM votes GROUP BY 1
    )
    SELECT x.doc_id AS a, y.doc_id AS b, CAST(bit_count(xor(x.s, y.s)) AS INT) AS hamming
    FROM sig x JOIN sig y ON x.doc_id < y.doc_id
    WHERE bit_count(xor(x.s, y.s)) <= 3
"""


@register("dedup_simhash", _SIMHASH_ORACLE)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs at hamming<=3 via banded blocking (complete for
    hamming < bands by pigeonhole, so it equals the oracle's brute force).
    Uses the md5-based 32-bit hasher so DuckDB recomputes identical
    signatures; the 64-bit xxhash64 default stays the scale path."""
    docs = _docs(spark, sf_dir)
    sig = dedup.simhash(docs, bits=32, hasher=dedup.md5_hash32)
    pairs = dedup.simhash_near_pairs(sig, max_hamming=3, bands=4, bits=32)
    return pairs.select("a", "b", F.col("hamming").cast("int").alias("hamming"))


@register(
    "ann_cosine_topk",
    """
    WITH q AS (SELECT vec_id AS q, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 5),
    c AS (SELECT vec_id AS neighbor, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
    scored AS (
        SELECT q, neighbor, ROUND(list_cosine_similarity(qv, cv), 4) AS cos
        FROM q CROSS JOIN c WHERE q != neighbor
    ),
    rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY q ORDER BY cos DESC, neighbor ASC) AS r FROM scored)
    SELECT q, neighbor, cos FROM rk WHERE r <= 3
    """,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-3 for query vectors vec_id<5 (exact baseline)."""
    embs = _embs(spark, sf_dir)
    return similarity.brute_force_topk(embs, embs.filter(F.col("vec_id") < 5), k=3)


# Deterministic integer sign-LSH planes shared by the Spark plan AND the
# DuckDB oracle (embedded as literal VALUES rows): the candidate generation
# is exact integer arithmetic, so the oracle reproduces the approximate
# result bit-for-bit rather than settling for a rows-only check.
_LSH_PLANES = similarity.int_hyperplanes(dim=64, bits=4, tables=8)


def _planes_values() -> str:
    return ",".join(
        f"({t},{b},{i},{w})"
        for t, tbl in enumerate(_LSH_PLANES)
        for b, ws in enumerate(tbl)
        for i, w in enumerate(ws)
    )


_LSH_SIG_CTE = """
    WITH e AS (
        SELECT vec_id,
               CAST(embedding AS DOUBLE[]) AS v,
               list_transform(CAST(embedding AS DOUBLE[]), x -> CAST(ROUND(x*1000) AS BIGINT)) AS vq
        FROM embeddings
    ),
    planes(t, b, i, w) AS (VALUES {planes}),
    dots AS (
        SELECT e.vec_id, p.t, p.b, CAST(SUM(e.vq[p.i + 1] * p.w) AS BIGINT) AS d
        FROM e CROSS JOIN planes p GROUP BY 1, 2, 3
    ),
    sigs AS (
        SELECT vec_id, t,
               CAST(SUM(CASE WHEN d > 0 THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS bucket
        FROM dots GROUP BY 1, 2
    )
"""


@register(
    "ann_lsh",
    _LSH_SIG_CTE.format(planes=_planes_values())
    + """,
    cands AS (
        SELECT DISTINCT sq.vec_id AS q, sc.vec_id AS neighbor
        FROM sigs sq JOIN sigs sc
          ON sq.t = sc.t AND sq.bucket = sc.bucket AND sq.vec_id != sc.vec_id
        WHERE sq.vec_id < 5
    ),
    scored AS (
        SELECT c.q, c.neighbor, ROUND(list_cosine_similarity(eq.v, ec.v), 4) AS cos
        FROM cands c JOIN e eq ON eq.vec_id = c.q JOIN e ec ON ec.vec_id = c.neighbor
    ),
    rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY q ORDER BY cos DESC, neighbor) AS r FROM scored)
    SELECT q, neighbor, cos FROM rk WHERE r <= 3
    """,
)
def ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-3 for the same query set (deterministic
    integer sign-LSH; oracle recomputes the same buckets in SQL)."""
    embs = _embs(spark, sf_dir)
    return similarity.lsh_ann_topk_quantized(
        embs, embs.filter(F.col("vec_id") < 5), _LSH_PLANES, k=3
    )


@register(
    "emb_near_dup",
    _LSH_SIG_CTE.format(planes=_planes_values())
    + """,
    cpairs AS (
        SELECT DISTINCT sa.vec_id AS a, sb.vec_id AS b
        FROM sigs sa JOIN sigs sb
          ON sa.t = sb.t AND sa.bucket = sb.bucket AND sa.vec_id < sb.vec_id
    )
    SELECT a, b, cos FROM (
        SELECT c.a, c.b, ROUND(list_cosine_similarity(ea.v, eb.v), 4) AS cos
        FROM cpairs c JOIN e ea ON ea.vec_id = c.a JOIN e eb ON eb.vec_id = c.b
    ) s WHERE cos >= 0.45
    """,
)
def emb_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos >= 0.45) — the SCALE path:
    LSH-bucketed candidates + exact-cosine verify, one bucket equi-join, no
    corpus×corpus cartesian. The all-pairs exact formulation
    (similarity.embedding_near_dup_pairs) stays as the recall baseline in
    tests only."""
    return similarity.lsh_near_dup_pairs(_embs(spark, sf_dir), _LSH_PLANES, min_cos=0.45)


@register(
    "text_tokens",
    r"""
    SELECT doc_id,
           len(string_split_regex(trim(text), '\s+')) AS ws_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS re_tokens
    FROM documents
    """,
)
def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish regex token counts."""
    return text.token_counts(_docs(spark, sf_dir)).select("doc_id", "ws_tokens", "re_tokens")


_STOP_SQL = "(" + ",".join(f"'{w}'" for w in text.STOPWORDS_EN) + ")"


@register(
    "text_quality",
    f"""
    WITH f AS (
        SELECT doc_id, strlen(text) AS n_chars,
               string_split_regex(trim(text), '\\s+') AS ws,
               strlen(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS punct
        FROM documents
    ), g AS (
        SELECT doc_id, n_chars, len(ws) AS n_words, punct,
               len(list_filter(ws, w -> lower(w) IN {_STOP_SQL})) AS stop,
               len(list_distinct(list_transform(ws, w -> lower(w)))) AS uniq,
               GREATEST(len(ws), 1) AS nz
        FROM f
    )
    SELECT doc_id, n_chars, n_words,
           ROUND(punct * 1.0 / GREATEST(n_chars, 1), 6) AS punct_ratio,
           ROUND(stop * 1.0 / nz, 6) AS stop_ratio,
           ROUND(uniq * 1.0 / nz, 6) AS uniq_ratio,
           ROUND(LEAST(n_words / 100.0, 1.0) * 0.4
                 + LEAST(stop * 1.0 / nz * 5.0, 1.0) * 0.3
                 + (uniq * 1.0 / nz) * 0.3, 6) AS quality
    FROM g
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality features + composite score."""
    return text.quality_score(_docs(spark, sf_dir)).select(
        "doc_id", "n_chars", "n_words", "punct_ratio", "stop_ratio", "uniq_ratio", "quality"
    )


def _hits_sql(vocab: list[str]) -> str:
    return (
        "len(list_filter(string_split_regex(trim(text), '\\s+'), w -> lower(w) IN ("
        + ",".join(f"'{w}'" for w in vocab)
        + ")))"
    )


@register(
    "text_langid",
    f"""
    WITH h AS (
        SELECT doc_id, {_hits_sql(text.STOPWORDS_EN)} AS en_hits,
               {_hits_sql(text.STOPWORDS_FR)} AS fr_hits,
               {_hits_sql(text.STOPWORDS_DE)} AS de_hits
        FROM documents
    )
    SELECT doc_id, en_hits, fr_hits, de_hits,
           CASE WHEN en_hits > 0 AND en_hits >= fr_hits AND en_hits >= de_hits THEN 'en'
                WHEN fr_hits > 0 AND fr_hits >= de_hits THEN 'fr'
                WHEN de_hits > 0 THEN 'de'
                ELSE 'und' END AS pred_lang
    FROM h
    """,
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID."""
    return text.lang_id(_docs(spark, sf_dir)).select(
        "doc_id", "en_hits", "fr_hits", "de_hits", "pred_lang"
    )


@register(
    "text_fingerprint",
    """
    WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws FROM documents),
    g AS (
        SELECT doc_id,
               list_transform(
                   list_transform(generate_series(1, GREATEST(len(ws) - 2, 0)),
                                  i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]),
                   t -> list_reduce(list_prepend(CAST(0 AS BIGINT),
                                                 list_transform(string_split_regex(t, ''), c -> CAST(ascii(c) AS BIGINT))),
                                    (h, c) -> (h * 31 + c) % 1000000007)) AS hashes
        FROM w
    ),
    m AS (
        SELECT doc_id,
               CASE WHEN len(hashes) < 4 THEN hashes
                    ELSE list_transform(generate_series(1, len(hashes) - 3),
                                        i -> list_aggregate(list_slice(hashes, i, i + 3), 'min'))
               END AS mins
        FROM g
    )
    SELECT doc_id, len(list_distinct(mins)) AS n_fp, list_aggregate(mins, 'min') AS fp_min FROM m
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint: count of selected hashes + min hash per doc."""
    return text.fingerprint(_docs(spark, sf_dir)).select("doc_id", "n_fp", "fp_min")


@register(
    "multimodal_meta",
    """
    SELECT 'image' AS modality, COUNT(*) AS n_items,
           CAST(SUM(strlen(text)) AS BIGINT) AS total_bytes,
           CAST(SUM(strlen(text)) * 1000000 // COUNT(*) AS BIGINT) AS avg_bytes_micro
    FROM documents
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only aggregate over the media table (payload never scanned)."""
    return multimodal.media_metadata_stats(multimodal.attach_media(_docs(spark, sf_dir)))


@register(
    "multimodal_decode",
    """
    SELECT doc_id AS media_id,
           CAST(strlen(text) % 640 + 1 AS INT) AS width,
           CAST((strlen(text) // 7) % 480 + 1 AS INT) AS height,
           CAST(strlen(text) % 30 + 1 AS INT) AS n_frames,
           (list_sum(list_transform(string_split_regex(substr(text, 1, 64), ''),
                                    c -> ascii(c))) % 1000) / 10.0 AS feature_norm
    FROM documents
    """,
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode stage (stub decoder — deterministic features)."""
    media = multimodal.attach_media(_docs(spark, sf_dir))
    return multimodal.decode_media(media, partitions=8)


@register(
    "ann_ivf",
    """
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
               list_transform(CAST(embedding AS DOUBLE[]), x -> CAST(ROUND(x*1000) AS BIGINT)) AS vq
        FROM embeddings
    ),
    cents AS (SELECT vec_id AS cell, vq AS cq FROM e WHERE vec_id < 16),
    idx(i) AS (SELECT UNNEST(generate_series(1, 64))),
    dots AS (
        SELECT e.vec_id, c.cell, CAST(SUM(e.vq[idx.i] * c.cq[idx.i]) AS BIGINT) AS d
        FROM e CROSS JOIN cents c CROSS JOIN idx GROUP BY 1, 2
    ),
    cassign AS (
        SELECT vec_id AS neighbor, cell FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d DESC, cell ASC) AS r FROM dots
        ) WHERE r = 1
    ),
    qprobe AS (
        SELECT vec_id AS q, cell FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d DESC, cell ASC) AS r FROM dots
            WHERE vec_id < 5
        ) WHERE r <= 4
    ),
    cands AS (
        SELECT DISTINCT qp.q, ca.neighbor FROM qprobe qp JOIN cassign ca ON qp.cell = ca.cell
        WHERE qp.q != ca.neighbor
    ),
    scored AS (
        SELECT c.q, c.neighbor, ROUND(list_cosine_similarity(eq.v, ec.v), 4) AS cos
        FROM cands c JOIN e eq ON eq.vec_id = c.q JOIN e ec ON ec.vec_id = c.neighbor
    ),
    rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY q ORDER BY cos DESC, neighbor ASC) AS r FROM scored)
    SELECT q, neighbor, cos FROM rk WHERE r <= 3
    """,
)
def ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) approximate top-3 for the same query set: corpus
    bucketed by nearest centroid (deterministic lowest-id seeds, integer
    assignment arithmetic), queries probe their 4 nearest of 16 cells, exact
    cosine only on probed candidates. The third ANN strategy next to the
    exact baseline (ann_cosine_topk) and sign-LSH (ann_lsh) — the same
    centroid-bucket design IVF-Flat uses at billion-vector scale."""
    embs = _embs(spark, sf_dir)
    return similarity.ivf_ann_topk(
        embs, embs.filter(F.col("vec_id") < 5), k=3, n_cells=16, n_probe=4
    )


@register(
    "ann_ivf_kmeans",
    """
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
               list_transform(CAST(embedding AS DOUBLE[]), x -> CAST(ROUND(x*1000) AS BIGINT)) AS vq
        FROM embeddings
    ),
    idx(i) AS (SELECT UNNEST(generate_series(1, 64))),
    cents0 AS (SELECT vec_id AS cell, vq AS cq FROM e WHERE vec_id < 16),
    dots1 AS (
        SELECT e.vec_id, c.cell, CAST(SUM(e.vq[idx.i] * c.cq[idx.i]) AS BIGINT) AS d
        FROM e CROSS JOIN cents0 c CROSS JOIN idx GROUP BY 1, 2
    ),
    a1 AS (
        SELECT vec_id, cell FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d DESC, cell ASC) AS r FROM dots1
        ) WHERE r = 1
    ),
    comp1 AS (
        SELECT a1.cell, idx.i, CAST(FLOOR(SUM(e.vq[idx.i]) * 1.0 / COUNT(*)) AS BIGINT) AS c
        FROM a1 JOIN e ON e.vec_id = a1.vec_id CROSS JOIN idx GROUP BY 1, 2
    ),
    cents1 AS (SELECT cell, list(c ORDER BY i) AS cq FROM comp1 GROUP BY cell),
    dots2 AS (
        SELECT e.vec_id, c.cell, CAST(SUM(e.vq[idx.i] * c.cq[idx.i]) AS BIGINT) AS d
        FROM e CROSS JOIN cents1 c CROSS JOIN idx GROUP BY 1, 2
    ),
    a2 AS (
        SELECT vec_id, cell FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d DESC, cell ASC) AS r FROM dots2
        ) WHERE r = 1
    ),
    comp2 AS (
        SELECT a2.cell, idx.i, CAST(FLOOR(SUM(e.vq[idx.i]) * 1.0 / COUNT(*)) AS BIGINT) AS c
        FROM a2 JOIN e ON e.vec_id = a2.vec_id CROSS JOIN idx GROUP BY 1, 2
    ),
    cents2 AS (SELECT cell, list(c ORDER BY i) AS cq FROM comp2 GROUP BY cell),
    dots3 AS (
        SELECT e.vec_id, c.cell, CAST(SUM(e.vq[idx.i] * c.cq[idx.i]) AS BIGINT) AS d
        FROM e CROSS JOIN cents2 c CROSS JOIN idx GROUP BY 1, 2
    ),
    cassign AS (
        SELECT vec_id AS neighbor, cell FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d DESC, cell ASC) AS r FROM dots3
        ) WHERE r = 1
    ),
    qprobe AS (
        SELECT vec_id AS q, cell FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d DESC, cell ASC) AS r FROM dots3
            WHERE vec_id < 5
        ) WHERE r <= 4
    ),
    cands AS (
        SELECT DISTINCT qp.q, ca.neighbor FROM qprobe qp JOIN cassign ca ON qp.cell = ca.cell
        WHERE qp.q != ca.neighbor
    ),
    scored AS (
        SELECT c.q, c.neighbor, ROUND(list_cosine_similarity(eq.v, ec.v), 4) AS cos
        FROM cands c JOIN e eq ON eq.vec_id = c.q JOIN e ec ON ec.vec_id = c.neighbor
    ),
    rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY q ORDER BY cos DESC, neighbor ASC) AS r FROM scored)
    SELECT q, neighbor, cos FROM rk WHERE r <= 3
    """,
)
def ann_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with Lloyd-refined centroids (2 k-means rounds on the quantized
    integer surface, floor-division averages — exact integer arithmetic end
    to end, so the oracle unrolls the same two refinement rounds in SQL and
    reproduces the bucket structure bit-for-bit). Same probe/search shape
    as ann_ivf; refined centroids tighten cells so probes recall more of
    the true neighbors at equal n_probe."""
    embs = _embs(spark, sf_dir)
    cells = similarity.ivf_cells_refined(embs, n_cells=16, iters=2)
    return similarity.ivf_ann_topk(
        embs, embs.filter(F.col("vec_id") < 5), k=3, n_probe=4, cells=cells
    )


@register(
    "multimodal_frames",
    """
    WITH f AS (
        SELECT doc_id,
               (strlen(text) % 30 + 1 + 4) // 5 AS cnt
        FROM documents
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_media,
           CAST(SUM(cnt) AS BIGINT) AS n_sampled,
           CAST(SUM(5 * (cnt * (cnt - 1) // 2)) AS BIGINT) AS sum_idx
    FROM f
    """,
)
def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: every-5th-frame explode via mapInPandas over
    the media payloads, aggregated to (n_media, n_sampled, sum_idx). The
    stub decoder's frame count is deterministic, so the sampled-frame
    arithmetic is exactly SQL-recomputable while the Spark side exercises
    the real Arrow-batched explode stage."""
    media = multimodal.attach_media(_docs(spark, sf_dir))
    frames = multimodal.sample_frames(media, every_n=5)
    return frames.agg(
        F.count_distinct("media_id").cast("long").alias("n_media"),
        F.count(F.lit(1)).cast("long").alias("n_sampled"),
        F.sum("frame_idx").cast("long").alias("sum_idx"),
    )


@register(
    "text_repetition",
    """
    WITH w AS (
        SELECT doc_id,
               list_transform(string_split_regex(trim(text), '\\s+'), w -> lower(w)) AS ws
        FROM documents
    ),
    g AS (
        SELECT doc_id, ws,
               list_transform(generate_series(1, GREATEST(len(ws) - 1, 0)),
                              i -> ws[i] || ' ' || ws[i+1]) AS grams
        FROM w
    )
    SELECT doc_id,
           CASE WHEN len(ws) <= 0 THEN 0
                ELSE (len(ws) - len(list_distinct(ws))) * 1000000 // len(ws) END AS dup_word_micro,
           CASE WHEN len(grams) <= 0 THEN 0
                ELSE list_max(list_transform(list_distinct(grams),
                                             d -> len(list_filter(grams, x -> x = d)))) * 1000000 // len(grams)
           END AS top2gram_micro
    FROM g
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals (duplicated-word mass, most-frequent
    2-gram fraction) as integer micro-units per document."""
    from blazegraph_database_spark.operators import text as T

    return T.repetition_signals(_docs(spark, sf_dir)).select(
        "doc_id", "dup_word_micro", "top2gram_micro"
    )


@register(
    "text_decontaminate",
    """
    WITH grams AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   generate_series(1, GREATEST(len(ws) - 7, 0)),
                   i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' ||
                        ws[i+4] || ' ' || ws[i+5] || ' ' || ws[i+6] || ' ' || ws[i+7])) AS gs
        FROM (SELECT doc_id,
                     list_transform(string_split_regex(trim(text), '\\s+'), w -> lower(w)) AS ws
              FROM documents)
    ),
    probe AS (SELECT DISTINCT UNNEST(gs) AS g FROM grams WHERE doc_id < 5),
    corpus AS (SELECT doc_id, UNNEST(gs) AS g FROM grams)
    SELECT c.doc_id AS id, CAST(COUNT(*) AS BIGINT) AS n_overlap
    FROM corpus c JOIN probe p ON c.g = p.g
    GROUP BY 1
    """,
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: 8-gram overlap of every corpus document
    against a probe set (docs 0-4 standing in for an eval suite). Probe
    grams broadcast; one corpus scan."""
    from blazegraph_database_spark.operators import text as T

    docs = _docs(spark, sf_dir)
    hits = T.contamination_flags(docs, docs.filter(F.col("doc_id") < 5), n=8)
    return hits.select("id", F.col("n_overlap").cast("long").alias("n_overlap"))


@register(
    "text_decontaminate_bloom",
    """
    WITH grams AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   generate_series(1, GREATEST(len(ws) - 7, 0)),
                   i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' ||
                        ws[i+4] || ' ' || ws[i+5] || ' ' || ws[i+6] || ' ' || ws[i+7])) AS gs
        FROM (SELECT doc_id,
                     list_transform(string_split_regex(trim(text), '\\s+'), w -> lower(w)) AS ws
              FROM documents)
    ),
    probe AS (SELECT DISTINCT UNNEST(gs) AS g FROM grams WHERE doc_id < 5),
    corpus AS (SELECT doc_id, UNNEST(gs) AS g FROM grams)
    SELECT c.doc_id AS id, CAST(COUNT(*) AS BIGINT) AS n_overlap
    FROM corpus c JOIN probe p ON c.g = p.g
    GROUP BY 1
    """,
)
def text_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered decontamination — the no-broadcast scale path for
    probe sets beyond broadcast size (operators/text.
    contamination_flags_bloom: probe grams → m/64-row bit_or bitmap; k
    hashed probes per corpus gram; exact shuffle-join verify removes the
    Bloom's false positives). Result is EXACTLY the n-gram overlap count,
    so the oracle is the same cross-engine SQL as text_decontaminate."""
    from blazegraph_database_spark.operators import text as T

    docs = _docs(spark, sf_dir)
    hits = T.contamination_flags_bloom(docs, docs.filter(F.col("doc_id") < 5), n=8)
    return hits.select("id", F.col("n_overlap").cast("long").alias("n_overlap"))


@register(
    "text_pii",
    """
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(text, '\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b')) AS INT) AS n_ipv4
    FROM documents
    """,
)
def text_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scan over documents (emails + IPv4; phone pattern omitted from
    the checked surface because greedy-match semantics differ across regex
    engines — covered by unit tests instead)."""
    from blazegraph_database_spark.operators import text as T

    return T.pii_scan(_docs(spark, sf_dir)).select("doc_id", "n_emails", "n_ipv4")


@register(
    "dataset_split",
    """
    WITH b AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5('s0:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 AS bucket
        FROM documents
    )
    SELECT CASE WHEN bucket < 9000 THEN 'train' WHEN bucket < 9500 THEN 'val' ELSE 'test' END AS split,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(bucket) AS BIGINT) AS min_bucket
    FROM b GROUP BY 1
    """,
)
def dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test split: md5-bucketed ids, pure
    expression — same rows land in the same split at any scale. The oracle
    recomputes the identical hash arithmetic in SQL."""
    from blazegraph_database_spark.operators import text as T

    out = T.dataset_split(_docs(spark, sf_dir))
    return out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n"), F.min("bucket").alias("min_bucket")
    )


@register(
    "text_pack_sequences",
    """
    WITH t AS (
        SELECT doc_id,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS INT) AS n_tokens,
               CAST(('0x' || substr(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 8 AS shard
        FROM documents
    )
    SELECT doc_id, shard, n_tokens,
           CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) - n_tokens) / 512.0) AS BIGINT) AS seq
    FROM t
    """,
)
def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing (token-budget batches): shard →
    order by id → seq = floor(cumulative_tokens_before / budget). Each
    shard packs independently (scale path); the oracle replays the same
    window arithmetic."""
    from blazegraph_database_spark.operators import text as T

    out = T.pack_sequences(_docs(spark, sf_dir), budget=512, shards=8)
    return out.select("doc_id", "shard", F.col("n_tokens").cast("int").alias("n_tokens"), "seq")


@register(
    "text_top_ngrams",
    """
    WITH ws AS (
        SELECT string_split_regex(trim(text), '\\s+') AS w
        FROM documents WHERE trim(text) != ''
    ),
    g AS (
        SELECT unnest(list_transform(generate_series(1, len(w) - 1),
                                     i -> w[i] || ' ' || w[i + 1])) AS gram
        FROM ws WHERE len(w) >= 2
    )
    SELECT gram, CAST(COUNT(*) AS BIGINT) AS n
    FROM g GROUP BY 1 ORDER BY n DESC, gram LIMIT 50
    """,
)
def text_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary building: top-50 word bigrams corpus-wide (the counting
    pass of a BPE/WordPiece-style trainer). Map-side partial counts, one
    vocabulary-sized shuffle (operators/text.top_ngrams)."""
    from blazegraph_database_spark.operators import text as T

    return (
        T.top_ngrams(_docs(spark, sf_dir), n=2)
        .orderBy(F.col("n").desc(), F.col("gram").asc())
        .limit(50)
    )


@register(
    "dataset_mix",
    """
    WITH b AS (
        SELECT doc_id, lang,
               CAST(('0x' || substr(md5('mix:' || lang || ':' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 AS bucket
        FROM documents
    )
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS kept, CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM b
    WHERE bucket < CASE lang WHEN 'en' THEN 8000 WHEN 'fr' THEN 5000
                             WHEN 'de' THEN 5000 WHEN 'es' THEN 3000
                             WHEN 'zh' THEN 2000 ELSE 0 END
    GROUP BY 1
    """,
)
def dataset_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic domain-mixture sampling: per-language keep rates as a
    pure hash-filter expression (operators/text.stratified_sample) — the
    reweighting step of a training-data pipeline, reproducible row-for-row
    at any scale. id_sum checks exact row membership, not just counts."""
    from blazegraph_database_spark.operators import text as T

    kept = T.stratified_sample(
        _docs(spark, sf_dir),
        {"en": 8000, "fr": 5000, "de": 5000, "es": 3000, "zh": 2000},
        group_col="lang",
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("kept"), F.sum("doc_id").alias("id_sum")
    )


@register(
    "pipeline_end_to_end",
    f"""
    WITH f AS (
        SELECT doc_id, lang, text, strlen(text) AS n_chars,
               string_split_regex(trim(text), '\\s+') AS ws
        FROM documents
    ), g AS (
        SELECT doc_id, lang, text, len(ws) AS n_words,
               len(list_filter(ws, w -> lower(w) IN {_STOP_SQL})) AS stop,
               len(list_distinct(list_transform(ws, w -> lower(w)))) AS uniq,
               GREATEST(len(ws), 1) AS nz
        FROM f
    ), q AS (
        SELECT doc_id, lang, text,
               ROUND(LEAST(n_words / 100.0, 1.0) * 0.4
                     + LEAST(stop * 1.0 / nz * 5.0, 1.0) * 0.3
                     + (uniq * 1.0 / nz) * 0.3, 6) AS quality
        FROM g
    ), kept AS (
        SELECT doc_id, text FROM q WHERE quality >= 0.45 AND lang = 'en'
    ), reps AS (
        SELECT MIN(doc_id) AS doc_id FROM kept
        GROUP BY regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')
    ), b AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5('s0:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 AS bucket
        FROM reps
    )
    SELECT CASE WHEN bucket < 9000 THEN 'train' WHEN bucket < 9500 THEN 'val' ELSE 'test' END AS split,
           CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM b GROUP BY 1
    """,
)
def pipeline_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed pretraining pipeline: quality filter → language filter →
    exact dedup (keep-first) → deterministic split — every stage a pure
    expression or a single keyed aggregation, so the whole chain is ONE
    Catalyst plan (no materialization between stages; at 100 TB the stages
    fuse into scan → filter → two shuffles). id_sum checks exact membership
    through all four stages."""
    from blazegraph_database_spark.operators import dedup
    from blazegraph_database_spark.operators import text as T

    docs = _docs(spark, sf_dir)
    kept = T.quality_score(docs).filter((F.col("quality") >= 0.45) & (F.col("lang") == "en"))
    reps = kept.groupBy(dedup.text_key128(F.col("text")).alias("k")).agg(
        F.min("doc_id").alias("doc_id")
    )
    surv = T.dataset_split(reps.select("doc_id"))
    return surv.groupBy("split").agg(
        F.count(F.lit(1)).alias("n"), F.sum("doc_id").alias("id_sum")
    )


@register(
    "text_interdoc_repetition",
    """
    WITH ws AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
        FROM documents WHERE trim(text) != ''
    ),
    win AS (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(w) - 7),
                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' '
                           || w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7])) AS gram
        FROM ws WHERE len(w) >= 8
    ),
    dfreq AS (
        SELECT gram, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, gram FROM win) GROUP BY gram
    ),
    per AS (
        SELECT w.doc_id AS id,
               CAST(COUNT(*) AS BIGINT) AS n_windows,
               CAST(SUM(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_repeated
        FROM win w JOIN dfreq d USING (gram) GROUP BY 1
    )
    SELECT doc_id AS id,
           COALESCE(n_windows, 0) AS n_windows,
           COALESCE(n_repeated, 0) AS n_repeated,
           CAST(FLOOR(COALESCE(n_repeated, 0) * 1000000.0 / GREATEST(COALESCE(n_windows, 0), 1)) AS BIGINT) AS repeated_ppm
    FROM documents LEFT JOIN per ON doc_id = per.id
    """,
)
def text_interdoc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-document k-gram repetition signal (boilerplate/template
    contamination): fraction of a doc's 8-word windows shared with other
    docs. Linear window-frequency passes, never doc×doc
    (operators/text.interdoc_repetition)."""
    from blazegraph_database_spark.operators import text as T

    return T.interdoc_repetition(_docs(spark, sf_dir), k=8, min_df=2)


@register(
    "dedup_cluster_canonical",
    _JACCARD_CTE
    + """,
    dup AS (
        SELECT lpad(CAST(a AS VARCHAR), 8, '0') AS a,
               lpad(CAST(b AS VARCHAR), 8, '0') AS b
        FROM jac WHERE jac >= 0.8
    ),
    e AS (SELECT a, b FROM dup UNION SELECT b, a FROM dup),
    reach AS (
        SELECT a AS node, a AS r FROM e
        UNION
        SELECT reach.node, e.b FROM reach JOIN e ON reach.r = e.a
    )
    SELECT CAST(node AS BIGINT) AS doc_id, CAST(MIN(r) AS BIGINT) AS canonical
    FROM reach GROUP BY node
    """,
)
def dedup_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERING: the pipeline step after pair generation — LSH
    near-dup pairs become an undirected graph, connected components merge
    transitive duplicate chains (A~B, B~C => one cluster even when A,C
    aren't direct pairs), and each clustered doc maps to its lowest doc_id
    as the canonical representative (the keep-list a dedup pass feeds the
    tokenizer). Composes two oracle-checked operators: minhash_lsh_dedup
    and the GAS CC engine; ids ride zero-padded so lexicographic MIN ==
    numeric MIN on both sides."""
    from blazegraph_database_spark.operators import gas

    pairs = dedup.minhash_lsh_dedup(_docs(spark, sf_dir), threshold=0.8)

    def pad(c: str):
        return F.lpad(F.col(c).cast("string"), 8, "0")

    edges = pairs.select(pad("a").alias("src"), pad("b").alias("dst"))
    cc = gas.connected_components(edges)
    return cc.select(
        F.col("node").cast("long").alias("doc_id"),
        F.col("comp").cast("long").alias("canonical"),
    )


@register(
    "multimodal_wav_decode",
    """
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_samples,
           ROUND(list_avg(list_transform(generate_series(1, length(text)),
                                         i -> ord(substr(text, i, 1)))), 2) AS feature_mean
    FROM documents
    WHERE length(text) > 0 AND NOT regexp_matches(text, '[^\\x00-\\x7F]')
    """,
)
def multimodal_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode end-to-end: each document's bytes framed as an
    actual 8-bit mono PCM RIFF/WAVE payload (wrap_pcm_wav), then decoded by
    the real WAV parser (header walk + numpy over the sample stream — no
    stub). The oracle recomputes the sample mean directly from the text's
    character codes, so a header-parse or sample-extraction bug fails the
    hash."""
    # ASCII-only on both sides: the engine samples UTF-8 BYTES while the
    # oracle averages per-CHARACTER codes — identical only for ASCII
    docs = _docs(spark, sf_dir).filter(
        (F.length("text") > 0) & ~F.col("text").rlike("[^\\x00-\\x7F]")
    )
    media = multimodal.wrap_pcm_wav(docs)
    out = multimodal.decode_media_uncompressed(media)
    return out.select(
        F.col("media_id").alias("doc_id"),
        "n_samples",
        F.round("feature_mean", 2).alias("feature_mean"),
    )


@register(
    "ann_ivf_pq",
    """
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
               list_transform(CAST(embedding AS DOUBLE[]), x -> CAST(ROUND(x*1000) AS BIGINT)) AS vq
        FROM embeddings
    ),
    subsp(sub) AS (SELECT UNNEST(generate_series(0, 3))),
    idx(i) AS (SELECT UNNEST(generate_series(1, 16))),
    subs AS (
        SELECT vec_id, s.sub, e.vq[s.sub*16+1 : s.sub*16+16] AS sv
        FROM e CROSS JOIN subsp s
    ),
    seeds AS (SELECT vid, ROW_NUMBER() OVER (ORDER BY vid) - 1 AS code
              FROM (SELECT DISTINCT vec_id AS vid FROM subs ORDER BY vid LIMIT 8)),
    b0 AS (SELECT s.sub, seeds.code, s.sv AS cq FROM subs s JOIN seeds ON s.vec_id = seeds.vid),
    d1 AS (
        SELECT subs.vec_id, subs.sub, b.code,
               CAST(SUM((subs.sv[i]-b.cq[i])*(subs.sv[i]-b.cq[i])) AS BIGINT) AS d
        FROM subs JOIN b0 b ON subs.sub = b.sub CROSS JOIN idx GROUP BY 1,2,3
    ),
    a1 AS (
        SELECT vec_id, sub, code FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY d ASC, code ASC) AS r FROM d1
        ) WHERE r = 1
    ),
    comp AS (
        SELECT a1.sub, a1.code, idx.i, CAST(FLOOR(SUM(s2.sv[idx.i]) * 1.0 / COUNT(*)) AS BIGINT) AS c
        FROM a1 JOIN subs s2 ON s2.vec_id = a1.vec_id AND s2.sub = a1.sub CROSS JOIN idx
        GROUP BY 1,2,3
    ),
    b1 AS (SELECT sub, code, list(c ORDER BY i) AS cq FROM comp GROUP BY 1,2),
    d2 AS (
        SELECT subs.vec_id, subs.sub, b.code,
               CAST(SUM((subs.sv[i]-b.cq[i])*(subs.sv[i]-b.cq[i])) AS BIGINT) AS d
        FROM subs JOIN b1 b ON subs.sub = b.sub CROSS JOIN idx GROUP BY 1,2,3
    ),
    codes AS (
        SELECT vec_id AS neighbor, sub, code FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY d ASC, code ASC) AS r FROM d2
        ) WHERE r = 1
    ),
    qtab AS (SELECT vec_id AS q, sub, code, d FROM d2 WHERE vec_id < 5),
    apx AS (
        SELECT qt.q, c.neighbor, SUM(qt.d) AS apx
        FROM codes c JOIN qtab qt ON c.sub = qt.sub AND c.code = qt.code
        WHERE qt.q != c.neighbor
        GROUP BY 1,2
    ),
    cand AS (
        SELECT q, neighbor FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY q ORDER BY apx ASC, neighbor ASC) AS r FROM apx
        ) WHERE r <= 10
    ),
    scored AS (
        SELECT cand.q, cand.neighbor, ROUND(list_cosine_similarity(eq.v, ec.v), 4) AS cos
        FROM cand JOIN e eq ON eq.vec_id = cand.q JOIN e ec ON ec.vec_id = cand.neighbor
    ),
    rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY q ORDER BY cos DESC, neighbor ASC) AS r FROM scored)
    SELECT q, neighbor, cos FROM rk WHERE r <= 3
    """,
)
def ann_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC search (Jégou et al. — the IVF-PQ candidate
    stage that makes billion-vector ANN tractable): 64-dim vectors compress
    to 4 subspace codes against Lloyd-refined integer codebooks; per-query
    distance tables (broadcast) turn candidate generation into a scan of
    the codes table alone; the best 10 rescore with exact cosine. Fourth
    ANN strategy next to brute-force, sign-LSH, and IVF — integer-exact,
    so the oracle unrolls the same training + encode + ADC search in SQL."""
    embs = _embs(spark, sf_dir)
    return similarity.pq_ann_topk(embs, embs.filter(F.col("vec_id") < 5))


@register(
    "text_rare_trigrams",
    """
    WITH t AS (
        SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS nt
        FROM documents
    ),
    tris AS (
        SELECT doc_id, unnest(list_transform(generate_series(1, length(nt) - 2),
                                             i -> substr(nt, i, 3))) AS tri
        FROM t WHERE length(nt) >= 3
    ),
    counts AS (SELECT tri, COUNT(*) AS c FROM tris GROUP BY tri)
    SELECT doc_id AS id,
           CAST(COUNT(*) AS BIGINT) AS n_trigrams,
           ROUND(SUM(CASE WHEN c <= 5 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 4) AS rare_frac
    FROM tris JOIN counts USING (tri)
    GROUP BY doc_id
    """,
)
def text_rare_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-statistics gibberish signal: fraction of each document's char
    trigrams that the whole corpus produces <= 5 times — mojibake and
    random strings score high, natural text low (cross-document complement
    of the intra-document repetition signals)."""
    return text.rare_trigram_fraction(_docs(spark, sf_dir))


@register(
    "dedup_incremental",
    """
    WITH norm AS (
        SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS nt
        FROM documents
    ),
    prior AS (SELECT DISTINCT nt FROM norm WHERE doc_id < 250),
    new_docs AS (SELECT doc_id, nt FROM norm WHERE doc_id >= 250)
    SELECT n.doc_id FROM new_docs n LEFT JOIN prior p ON n.nt = p.nt
    WHERE p.nt IS NULL
    """,
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot incremental dedup (dedup.dedup_against_prior): the
    docs with id >= 250 play the new crawl, ids < 250 the prior corpus;
    new docs whose normalized text the prior corpus already contains are
    dropped. Prior state is a distinct 64-bit hash set — the only thing a
    continuous pipeline persists between snapshots."""
    docs = _docs(spark, sf_dir)
    survived = dedup.dedup_against_prior(
        docs.filter(F.col("doc_id") >= 250), docs.filter(F.col("doc_id") < 250)
    )
    return survived.select("doc_id")


@register(
    "dataset_shuffle",
    """
    WITH k AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5('ep1:' || CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) AS skey
        FROM documents
    )
    SELECT doc_id, CAST(skey % 16 AS INT) AS shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY skey % 16 ORDER BY skey, doc_id) AS INT) AS pos
    FROM k
    """,
)
def dataset_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle: reproducible pseudo-random training
    order via hash keys — shard-partitioned rank, no global sort, no
    single-partition window (operators/text.deterministic_shuffle)."""
    from blazegraph_database_spark.operators import text as T

    out = T.deterministic_shuffle(_docs(spark, sf_dir), shards=16, seed="ep1")
    return out.select("doc_id", "shard", "pos")


@register(
    "dataset_stratified_exact",
    """
    WITH r AS (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY CAST(('0x' || substr(md5('strat:' || source || ':' || CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT), doc_id
               ) AS srank
        FROM documents
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS kept, CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM r
    WHERE srank <= CASE source WHEN 'src1' THEN 10 WHEN 'src2' THEN 30
                               WHEN 'src3' THEN 5 ELSE 0 END
    GROUP BY 1
    """,
)
def dataset_stratified_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-quota stratified sampling: keep exactly N docs per source by
    deterministic hash rank — the fixed-budget mixture step
    (operators/text.stratified_sample_exact). id_sum checks the exact
    member set, not just counts."""
    from blazegraph_database_spark.operators import text as T

    kept = T.stratified_sample_exact(
        _docs(spark, sf_dir),
        {"src1": 10, "src2": 30, "src3": 5},
        group_col="source",
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("kept"), F.sum("doc_id").alias("id_sum")
    )


@register(
    "text_decontaminate_fuzzy",
    """
    WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws FROM documents),
    s AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(generate_series(1, GREATEST(len(ws) - 2, 0)),
                                     i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS g
        FROM w
    ),
    probe AS (SELECT * FROM s WHERE doc_id < 25),
    corp AS (SELECT * FROM s WHERE doc_id >= 25),
    pairs AS (
        SELECT c.doc_id AS id, p.doc_id AS pid, COUNT(*) AS inter
        FROM corp c JOIN probe p ON c.g = p.g GROUP BY 1, 2
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM s GROUP BY doc_id),
    jac AS (
        SELECT id, pid, ROUND(inter * 1.0 / (sc.n + sp.n - inter), 4) AS jac
        FROM pairs JOIN sizes sc ON id = sc.doc_id JOIN sizes sp ON pid = sp.doc_id
    )
    SELECT id, CAST(COUNT(*) AS BIGINT) AS n_matched, MAX(jac) AS max_jac
    FROM jac WHERE jac >= 0.7 GROUP BY 1
    """,
)
def text_decontaminate_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy (near-duplicate) benchmark decontamination: corpus docs whose
    shingle-Jaccard vs any probe doc (ids < 25 standing in for an eval
    suite) reaches 0.7 — MinHash-band candidates w/ broadcast probe side,
    exact verify on candidates only; the brute-force oracle equals it at
    32x2 banding recall (operators/dedup.fuzzy_decontaminate)."""
    docs = _docs(spark, sf_dir)
    return dedup.fuzzy_decontaminate(
        docs.filter(F.col("doc_id") >= 25),
        docs.filter(F.col("doc_id") < 25),
        threshold=0.7,
    )


@register(
    "text_remove_dup_spans",
    """
    WITH w AS (
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE string_split_regex(trim(text), '\\s+') END AS ws
        FROM documents
    ),
    g AS (
        SELECT doc_id, unnest(generate_series(1, GREATEST(len(ws) - 7, 0))) AS pos, ws
        FROM w
    ),
    occ AS (SELECT doc_id, pos, array_to_string(ws[pos:pos+7], ' ') AS gram FROM g),
    marked AS (
        SELECT doc_id, pos,
               ROW_NUMBER() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn,
               COUNT(*) OVER (PARTITION BY gram) AS n
        FROM occ
    ),
    cov AS (
        SELECT DISTINCT doc_id, unnest(generate_series(pos, pos + 7)) AS cpos
        FROM marked WHERE n > 1 AND rn > 1
    ),
    wordpos AS (
        SELECT doc_id, unnest(ws) AS wd, unnest(generate_series(1, len(ws))) AS pos
        FROM w
    ),
    kept AS (
        SELECT wp.doc_id, wp.pos, wp.wd
        FROM wordpos wp LEFT JOIN cov ON wp.doc_id = cov.doc_id AND wp.pos = cov.cpos
        WHERE cov.doc_id IS NULL
    ),
    clean AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
               string_agg(wd, ' ' ORDER BY pos) AS ct
        FROM kept GROUP BY 1
    )
    SELECT w.doc_id,
           CAST(len(w.ws) AS INT) AS n_words,
           CAST(len(w.ws) - COALESCE(c.n_kept, 0) AS INT) AS n_removed,
           md5(COALESCE(c.ct, '')) AS clean_md5
    FROM w LEFT JOIN clean c ON w.doc_id = c.doc_id
    """,
)
def text_remove_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-span removal (Lee et al. substring dedup): 8-word
    windows occurring >1x corpus-wide keep only their first (doc_id, pos)
    occurrence; all other occurrences are cut from their documents.
    Linear window-frequency passes, never doc x doc
    (operators/dedup.remove_duplicate_spans)."""
    out = dedup.remove_duplicate_spans(_docs(spark, sf_dir), k=8)
    return out.select(
        "doc_id",
        F.col("n_words").cast("int").alias("n_words"),
        F.col("n_removed").cast("int").alias("n_removed"),
        F.md5("clean_text").alias("clean_md5"),
    )


@register(
    "dataset_mix_temperature",
    """
    WITH c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY lang),
    w AS (SELECT lang, n, CAST(FLOOR(SQRT(n)) AS BIGINT) AS w FROM c),
    s AS (SELECT SUM(w) AS sw FROM w),
    r AS (
        SELECT lang, n, LEAST(10000, (10000 * ((250 * w) // sw)) // n) AS rate
        FROM w, s
    ),
    k AS (
        SELECT d.lang, d.doc_id
        FROM documents d JOIN r ON d.lang = r.lang
        WHERE CAST(('0x' || substr(md5('mixtemp:' || d.lang || ':' || CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000
              < r.rate
    )
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS kept, CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM k GROUP BY lang ORDER BY lang
    """,
)
def dataset_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain mixture (mT5/XLM-R alpha=0.5 reweighting):
    per-language keep rates derived FROM the corpus counts via integer-only
    arithmetic (isqrt weights, floor divisions) so the SQL oracle replays
    the rate computation AND the hash-filter membership bit-for-bit. The
    count collect is one row per domain; the sampling itself is a pure
    filter expression (operators/text.temperature_rates +
    stratified_sample)."""
    docs = _docs(spark, sf_dir)
    rates = text.temperature_rates(docs, budget=250, group_col="lang")
    kept = text.stratified_sample(docs, rates, group_col="lang", seed="mixtemp")
    return (
        kept.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("kept"), F.sum("doc_id").alias("id_sum"))
        .orderBy("lang")
    )


@register(
    "dataset_resample",
    """
    WITH r AS (
        SELECT doc_id, lang,
               CASE lang WHEN 'en' THEN 25000 WHEN 'fr' THEN 15000
                         WHEN 'zh' THEN 5000 ELSE 0 END AS rate
        FROM documents
    ),
    e AS (
        SELECT doc_id, lang, rate, unnest(generate_series(0, (rate - 1) // 10000)) AS rep
        FROM r WHERE rate > 0
    ),
    k AS (
        SELECT * FROM e
        WHERE rate - 10000 * rep >
              CAST(('0x' || substr(md5('epoch:' || lang || ':' || CAST(doc_id AS VARCHAR) || ':' || CAST(rep AS VARCHAR)), 1, 8)) AS BIGINT) % 10000
    )
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id * (rep + 1)) AS BIGINT) AS chk
    FROM k GROUP BY lang ORDER BY lang
    """,
)
def dataset_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch resampling WITH repetition: permyriad rates above
    10000 duplicate rows (2.5 epochs = two full copies + a 50% hash-filtered
    third), the standard low-resource upsampling move a rate-capped sampler
    cannot express. Copies are tagged rep=0,1,... so downstream epoch
    shuffles interleave them; membership is a pure hash expression the
    oracle unrolls with generate_series (operators/text.resample_epochs).
    chk = SUM(doc_id*(rep+1)) checks exact copy membership, not just
    counts."""
    docs = _docs(spark, sf_dir)
    out = text.resample_epochs(
        docs, {"en": 25000, "fr": 15000, "zh": 5000}, group_col="lang", seed="epoch"
    )
    return (
        out.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct("doc_id").alias("n_docs"),
            F.sum(F.col("doc_id") * (F.col("rep") + 1)).alias("chk"),
        )
        .orderBy("lang")
    )


_GOPHER_STOP_LIST = "[" + ",".join(f"'{w}'" for w in text.STOPWORDS_EN) + "]"

@register(
    "text_gopher_rules",
    f"""
    WITH f AS (
        SELECT doc_id, trim(text) AS t,
               string_split_regex(trim(text), '\\s+') AS ws,
               string_split(text, chr(10)) AS lines
        FROM documents
    ), g AS (
        SELECT doc_id,
               len(ws) AS n_words,
               GREATEST(len(ws), 1) AS nz,
               COALESCE(list_aggregate(list_transform(ws, w -> strlen(w)), 'sum'), 0) AS wl,
               len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]'))) AS alpha,
               len(list_filter({_GOPHER_STOP_LIST},
                               s -> list_contains(list_transform(ws, w -> lower(w)), s))) AS n_stop,
               len(regexp_extract_all(t, '#')) + len(regexp_extract_all(t, '\\.\\.\\.')) AS sym,
               GREATEST(len(lines), 1) AS n_lines,
               len(list_filter(lines, l -> regexp_matches(l, '^\\s*[-*•]\\s'))) AS bullet,
               len(list_filter(lines, l -> regexp_matches(l, '(\\.\\.\\.|…)\\s*$'))) AS ell
        FROM f
    )
    SELECT doc_id, n_words,
           ROUND(wl * 1.0 / nz, 4) AS mean_word_len,
           ROUND(alpha * 1.0 / nz, 6) AS alpha_frac,
           n_stop,
           ROUND(sym * 1.0 / nz, 6) AS symbol_ratio,
           ROUND(bullet * 1.0 / n_lines, 6) AS bullet_ratio,
           ROUND(ell * 1.0 / n_lines, 6) AS ellipsis_ratio,
           CAST(CASE WHEN n_words BETWEEN 20 AND 100000
                      AND ROUND(wl * 1.0 / nz, 4) BETWEEN 3.0 AND 10.0
                      AND ROUND(alpha * 1.0 / nz, 6) >= 0.8
                      AND n_stop >= 2
                      AND ROUND(sym * 1.0 / nz, 6) <= 0.1
                      AND ROUND(bullet * 1.0 / n_lines, 6) <= 0.9
                      AND ROUND(ell * 1.0 / n_lines, 6) <= 0.3
                THEN 1 ELSE 0 END AS INT) AS gopher_pass
    FROM g
    """,
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality-rule filter (Rae et al. 2021): per-doc rule features +
    pass flag, all pure Column expressions (operators/text.gopher_rules)."""
    return text.gopher_rules(_docs(spark, sf_dir)).select(
        "doc_id", "n_words", "mean_word_len", "alpha_frac", "n_stop",
        "symbol_ratio", "bullet_ratio", "ellipsis_ratio", "gopher_pass",
    )


@register(
    "text_unigram_logprob",
    """
    WITH w AS (
        SELECT doc_id,
               unnest(list_transform(string_split_regex(trim(text), '\\s+'),
                                     x -> lower(x))) AS w
        FROM documents WHERE trim(text) != ''
    ),
    tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM w GROUP BY 1, 2),
    vocab AS (SELECT w, COUNT(*) AS cnt FROM w GROUP BY 1),
    tot AS (SELECT SUM(cnt) AS total FROM vocab)
    SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
           ROUND(SUM(tf * -ln(cnt * 1.0 / total)) / SUM(tf), 4) AS neg_logprob
    FROM tf JOIN vocab USING (w) CROSS JOIN tot
    GROUP BY doc_id
    """,
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained unigram LM document scoring — the in-engine analog of
    the CCNet/KenLM perplexity quality signal (operators/text.unigram_logprob)."""
    return text.unigram_logprob(_docs(spark, sf_dir))


@register(
    "dataset_domain_cap",
    f"""
    WITH f AS (
        SELECT doc_id, source, strlen(text) AS n_chars,
               string_split_regex(trim(text), '\\s+') AS ws
        FROM documents
    ), g AS (
        SELECT doc_id, source,
               len(ws) AS n_words,
               len(list_filter(ws, w -> lower(w) IN {_STOP_SQL})) AS stop,
               len(list_distinct(list_transform(ws, w -> lower(w)))) AS uniq,
               GREATEST(len(ws), 1) AS nz
        FROM f
    ), q AS (
        SELECT doc_id, source,
               ROUND(LEAST(n_words / 100.0, 1.0) * 0.4
                     + LEAST(stop * 1.0 / nz * 5.0, 1.0) * 0.3
                     + (uniq * 1.0 / nz) * 0.3, 6) AS quality
        FROM g
    ), r AS (
        SELECT doc_id, source, quality,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY quality DESC, doc_id ASC) AS domain_rank
        FROM q
    )
    SELECT doc_id, source, quality, CAST(domain_rank AS INT) AS domain_rank
    FROM r WHERE domain_rank <= 7
    """,
)
def dataset_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quota: top-7 docs per source by composite quality (the
    CCNet/RefinedWeb host-capping move; operators/text.domain_cap)."""
    capped = text.domain_cap(
        text.quality_score(_docs(spark, sf_dir)), domain_col="source", cap=7
    )
    return capped.select("doc_id", "source", "quality", "domain_rank")


@register(
    "ann_radius",
    """
    WITH q AS (SELECT vec_id AS q, CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id < 5),
    c AS (SELECT vec_id AS neighbor, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings)
    SELECT q, neighbor, cos
    FROM (SELECT q, neighbor, ROUND(list_cosine_similarity(qv, cv), 4) AS cos
          FROM q CROSS JOIN c WHERE q != neighbor)
    WHERE cos >= 0.25
    """,
)
def ann_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine radius (range) search: all neighbors of query vectors vec_id<5
    at cosine>=0.25 — no rank/window stage, one broadcast-probe corpus scan
    (operators/similarity.radius_search)."""
    embs = _embs(spark, sf_dir)
    return similarity.radius_search(
        embs, embs.filter(F.col("vec_id") < 5), min_cos=0.25, broadcast_queries=True
    )


@register(
    "semdedup_prune",
    """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    seeds AS (SELECT vec_id AS seed, v AS sv FROM e ORDER BY vec_id ASC LIMIT 8),
    scored AS (
        SELECT e.vec_id, seed, ROUND(list_cosine_similarity(v, sv), 4) AS cos
        FROM e CROSS JOIN seeds
    ),
    assign AS (
        SELECT vec_id, seed AS cluster FROM (
            SELECT vec_id, seed,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY cos DESC, seed ASC) AS r
            FROM scored) WHERE r = 1
    ),
    red AS (
        SELECT DISTINCT b.vec_id AS rid
        FROM assign a JOIN assign b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        JOIN e ea ON ea.vec_id = a.vec_id JOIN e eb ON eb.vec_id = b.vec_id
        WHERE ROUND(list_cosine_similarity(ea.v, eb.v), 4) >= 0.3
    )
    SELECT vec_id, cluster,
           CAST(CASE WHEN vec_id IN (SELECT rid FROM red) THEN 0 ELSE 1 END AS INT) AS kept
    FROM assign
    """,
)
def semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic-redundancy pruning: deterministic nearest-centroid
    clusters, intra-cluster lower-id dominance at cosine>=0.3
    (operators/similarity.semantic_dedup)."""
    return similarity.semantic_dedup(_embs(spark, sf_dir), k_clusters=8, min_cos=0.3)


@register(
    "pipeline_curation",
    f"""
    WITH f AS (
        SELECT doc_id, lang, source, text, trim(text) AS t,
               string_split_regex(trim(text), '\\s+') AS ws,
               string_split(text, chr(10)) AS lines
        FROM documents
    ), g AS (
        SELECT doc_id, lang, source, text, ws,
               len(ws) AS n_words, GREATEST(len(ws), 1) AS nz,
               COALESCE(list_aggregate(list_transform(ws, w -> strlen(w)), 'sum'), 0) AS wl,
               len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]'))) AS alpha,
               len(list_filter({_GOPHER_STOP_LIST},
                               s -> list_contains(list_transform(ws, w -> lower(w)), s))) AS n_stop,
               len(regexp_extract_all(t, '#')) + len(regexp_extract_all(t, '\\.\\.\\.')) AS sym,
               GREATEST(len(lines), 1) AS n_lines,
               len(list_filter(lines, l -> regexp_matches(l, '^\\s*[-*•]\\s'))) AS bullet,
               len(list_filter(lines, l -> regexp_matches(l, '(\\.\\.\\.|…)\\s*$'))) AS ell
        FROM f
    ), passed AS (
        SELECT doc_id, lang, source, text, ws, n_words, nz
        FROM g
        WHERE n_words BETWEEN 20 AND 100000
          AND ROUND(wl * 1.0 / nz, 4) BETWEEN 3.0 AND 10.0
          AND ROUND(alpha * 1.0 / nz, 6) >= 0.8
          AND n_stop >= 2
          AND ROUND(sym * 1.0 / nz, 6) <= 0.1
          AND ROUND(bullet * 1.0 / n_lines, 6) <= 0.9
          AND ROUND(ell * 1.0 / n_lines, 6) <= 0.3
    ), w AS (
        SELECT doc_id, unnest(list_transform(ws, x -> lower(x))) AS w
        FROM f WHERE trim(text) != ''
    ),
    tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM w GROUP BY 1, 2),
    vocab AS (SELECT w, COUNT(*) AS cnt FROM w GROUP BY 1),
    tot AS (SELECT SUM(cnt) AS total FROM vocab),
    lm AS (
        SELECT doc_id, ROUND(SUM(tf * -ln(cnt * 1.0 / total)) / SUM(tf), 4) AS nl
        FROM tf JOIN vocab USING (w) CROSS JOIN tot GROUP BY doc_id
    ), survived AS (
        SELECT p.doc_id, p.lang, p.source, p.text, p.n_words, p.nz, lm.nl
        FROM passed p JOIN lm ON p.doc_id = lm.doc_id
        WHERE lm.nl <= 3.41
    ), q AS (
        SELECT *,
               ROUND(LEAST(n_words / 100.0, 1.0) * 0.4
                     + LEAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                                             w -> lower(w) IN {_STOP_SQL})) * 1.0 / nz * 5.0, 1.0) * 0.3
                     + (len(list_distinct(list_transform(string_split_regex(trim(text), '\\s+'),
                                                         w -> lower(w)))) * 1.0 / nz) * 0.3, 6) AS quality
        FROM survived
    ), capped AS (
        SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                                         ORDER BY quality DESC, doc_id ASC) AS rk
            FROM q) WHERE rk <= 15
    ), dedup AS (
        SELECT * FROM (
            SELECT *, MIN(doc_id) OVER (
                PARTITION BY regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS rep
            FROM capped) WHERE doc_id = rep
    )
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(SUM(nl) / COUNT(*), 4) AS avg_logprob
    FROM dedup GROUP BY lang
    """,
)
def pipeline_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed curation pipeline over the session's new operators — the
    CCNet/RefinedWeb shape: Gopher rule filter → corpus-trained unigram-LM
    band filter (model trained on the FULL corpus, applied to the rule
    survivors) → per-domain quota by composite quality → exact dedup keeping
    the lowest-id copy → per-language counts. Every stage is the exact
    operator the standalone oracles verify; this query proves they compose."""
    docs = _docs(spark, sf_dir)
    passed = text.gopher_rules(docs).filter(F.col("gopher_pass") == 1)
    lm = text.unigram_logprob(docs)  # trained on the full corpus
    survived = (
        passed.join(lm, "doc_id")
        .filter(F.col("neg_logprob") <= 3.41)
        .select("doc_id", "lang", "source", "text", "neg_logprob")
    )
    capped = text.domain_cap(text.quality_score(survived), domain_col="source", cap=15)
    from pyspark.sql.window import Window

    from blazegraph_database_spark.operators.dedup import text_key128

    w = Window.partitionBy(text_key128(F.col("text")))
    deduped = (
        capped.withColumn("rep", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("rep"))
    )
    return deduped.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(F.sum("neg_logprob") / F.count(F.lit(1)), 4).alias("avg_logprob"),
    )


@register(
    "url_canonical_dedup",
    """
    SELECT 'https://' || source || '.com/p/' || doc_id || '?a=1&b=2' AS canon_url,
           CAST(doc_id * 2 AS BIGINT) AS keep_id,
           CAST(2 AS BIGINT) AS n_dups
    FROM documents
    UNION ALL
    SELECT 'not-a-url-' || doc_id, CAST(doc_id * 2 + 1000000 AS BIGINT), CAST(1 AS BIGINT)
    FROM documents WHERE doc_id % 10 = 0
    ORDER BY canon_url
    """,
)
def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + exact URL dedup (round 6) — the
    normalize-before-hash step ahead of crawl dedup: scheme/host
    lowercasing, www. and default-port stripping, fragment removal,
    tracking-param (utm_*/fbclid/gclid/ref) drop, query-param sort,
    trailing-slash trim — all one codegen expression pass, then one
    partial-agg shuffle keyed on the canonical form (min-id winner).
    Two synthesized variants per document (uppercase host + :443 +
    tracking params + fragment vs. the clean form) must collapse to ONE
    canonical URL; malformed inputs fall back to trimmed identity. The
    oracle states the expected canonical forms INDEPENDENTLY (hand-derived
    truth, not a replay)."""
    from blazegraph_database_spark.operators import text as T

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "source")
    v1 = docs.select(
        (F.col("doc_id") * 2).alias("doc_id"),
        F.concat(
            F.lit("HTTPS://WWW."), F.upper("source"), F.lit(".com:443/p/"),
            (F.col("doc_id")).cast("string"),
            F.lit("/?utm_source=x&b=2&a=1#frag"),
        ).alias("url"),
    )
    v2 = docs.select(
        (F.col("doc_id") * 2 + 1).alias("doc_id"),
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".com/p/"),
            (F.col("doc_id")).cast("string"), F.lit("?a=1&b=2"),
        ).alias("url"),
    )
    v3 = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") * 2 + 1000000).alias("doc_id"),
        F.concat(F.lit("  not-a-url-"), F.col("doc_id").cast("string"), F.lit("  ")).alias("url"),
    )
    return T.url_dedup(v1.unionByName(v2).unionByName(v3)).orderBy("canon_url")


@register(
    "text_bigram_logprob",
    """
    WITH toks AS (
        SELECT doc_id,
               list_transform(string_split_regex(trim(text), '\\s+'),
                              x -> lower(x)) AS ws
        FROM documents WHERE trim(text) != ''
    ),
    big AS (
        SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
        FROM toks, UNNEST(range(1, len(ws))) AS t(i)
    ),
    bf AS (SELECT doc_id, w1, w2, COUNT(*) AS bf FROM big GROUP BY 1, 2, 3),
    pair_cnt AS (SELECT w1, w2, COUNT(*) AS c12 FROM big GROUP BY 1, 2),
    ctx_cnt AS (SELECT w1, COUNT(*) AS c1 FROM big GROUP BY 1),
    vsize AS (
        SELECT COUNT(DISTINCT w) AS v FROM (
            SELECT unnest(ws) AS w FROM toks
        )
    )
    SELECT doc_id, CAST(SUM(bf) AS BIGINT) AS n_bigrams,
           ROUND(SUM(bf * -ln((c12 + 1.0) / (c1 + 1.0 * v))) / SUM(bf), 4)
             AS neg_logprob
    FROM bf JOIN pair_cnt USING (w1, w2) JOIN ctx_cnt USING (w1) CROSS JOIN vsize
    GROUP BY doc_id
    """,
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained BIGRAM LM document scoring (round 6) — the CCNet/KenLM
    n-gram perplexity filter shape with add-alpha conditionals; the bigram
    LM table JOINS (never broadcasts — |V|² at corpus scale), only the
    scalar vocab size rides a broadcast (operators/text.bigram_logprob)."""
    return text.bigram_logprob(_docs(spark, sf_dir))


# ---------------------------------------------------------------------------
# Round 7: paragraph dedup, DSIR resampling, NB quality classifier, CCNet
# perplexity buckets, matryoshka-truncated retrieval.

# The harness corpus is flat text (no newlines), so the paragraph-dedup
# query composes a multi-paragraph view first: documents grouped by
# doc_id % 40, each group's texts joined with a blank line in id order.
# Exact-duplicate docs in the corpus then appear as duplicate paragraphs
# ACROSS composites — exactly the cross-document boilerplate the operator
# removes. Both engines build the identical view.
_PARA_COMPOSE_CTE = """
    WITH comp AS (
        SELECT cid AS doc_id,
               string_agg(text, chr(10) || chr(10) ORDER BY src_id) AS text
        FROM (SELECT doc_id % 40 AS cid, doc_id AS src_id, text FROM documents)
        GROUP BY cid
    )
"""


@register(
    "text_paragraph_dedup",
    _PARA_COMPOSE_CTE + """
    , parts AS (SELECT doc_id, string_split_regex(text, '\\n{2,}') AS ps FROM comp),
    p AS (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(ps)),
                                     i -> struct_pack(p_idx := i, para := ps[i]))) AS u
        FROM parts
    ),
    q AS (
        SELECT doc_id, u.p_idx AS p_idx, u.para AS para,
               regexp_replace(lower(trim(u.para)), '\\s+', ' ', 'g') AS norm
        FROM p WHERE trim(u.para) != ''
    ),
    f AS (SELECT norm, MIN(doc_id * 1000000 + p_idx) AS first_key FROM q GROUP BY norm),
    j AS (
        SELECT q.*, (doc_id * 1000000 + p_idx = first_key) AS keep
        FROM q JOIN f USING (norm)
    )
    SELECT doc_id,
           string_agg(para, chr(10) || chr(10) ORDER BY p_idx) FILTER (WHERE keep) AS text,
           CAST(COUNT(*) FILTER (WHERE keep) AS BIGINT) AS n_kept,
           CAST(COUNT(*) FILTER (WHERE NOT keep) AS BIGINT) AS n_dropped
    FROM j GROUP BY doc_id
    HAVING COUNT(*) FILTER (WHERE keep) > 0
    """,
)
def text_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide exact paragraph dedup (CCNet-style) over a composed
    multi-paragraph view: first occurrence wins, documents are rebuilt from
    surviving paragraphs (operators/text.paragraph_dedup)."""
    docs = _docs(spark, sf_dir).select(
        (F.col("doc_id") % 40).alias("cid"),
        F.col("doc_id").alias("src_id"),
        "text",
    )
    comp = (
        docs.groupBy("cid")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct(F.col("src_id").alias("i"),
                                                         F.col("text").alias("t")))),
                    lambda s: s["t"],
                ),
                "\n\n",
            ).alias("text")
        )
        .select(F.col("cid").alias("doc_id"), "text")
    )
    return text.paragraph_dedup(comp)


@register(
    "dataset_dsir_resample",
    """
    WITH w AS (
        SELECT doc_id, unnest(list_transform(string_split_regex(trim(text), '\\s+'),
                                             x -> lower(x))) AS w
        FROM documents WHERE trim(text) != ''
    ),
    h AS (
        SELECT doc_id,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(string_split_regex(w, ''), c -> CAST(ascii(c) AS BIGINT))),
                   (h, c) -> (h * 31 + c) % 1000000007) % 4096 AS b
        FROM w
    ),
    t AS (SELECT h.b FROM h JOIN documents d USING (doc_id) WHERE d.source = 'src18'),
    rc AS (SELECT b, COUNT(*) AS rc FROM h GROUP BY b),
    tcn AS (SELECT b, COUNT(*) AS tc FROM t GROUP BY b),
    stats AS (SELECT rc.b, rc.rc, COALESCE(tcn.tc, 0) AS tc FROM rc LEFT JOIN tcn USING (b)),
    tot AS (SELECT SUM(rc) AS rtot, SUM(tc) AS ttot FROM stats),
    tf AS (SELECT doc_id, b, COUNT(*) AS tf FROM h GROUP BY 1, 2),
    sc AS (
        SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
               ROUND(SUM(tf * (ln((tc + 1) * 1.0 / (ttot + 4096))
                               - ln((rc + 1) * 1.0 / (rtot + 4096)))) / SUM(tf), 6) AS weight
        FROM tf JOIN stats USING (b) CROSS JOIN tot GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, weight FROM sc ORDER BY weight DESC, doc_id ASC LIMIT 100
    """,
)
def dataset_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling: the 100 raw documents most target-like
    (target = source 'src18') under hashed-unigram bucket distributions
    (operators/text.dsir_select)."""
    docs = _docs(spark, sf_dir)
    return text.dsir_select(docs, docs.filter(F.col("source") == "src18"), n_keep=100)


@register(
    "quality_nb_classifier",
    """
    WITH w AS (
        SELECT doc_id, (lang = 'en') AS pos,
               unnest(list_transform(string_split_regex(trim(text), '\\s+'),
                                     x -> lower(x))) AS w
        FROM documents WHERE trim(text) != ''
    ),
    cc AS (
        SELECT w,
               SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS cpos,
               SUM(CASE WHEN NOT pos THEN 1 ELSE 0 END) AS cneg
        FROM w GROUP BY w
    ),
    tot AS (SELECT SUM(cpos) AS npos, SUM(cneg) AS nneg, CAST(COUNT(*) AS DOUBLE) AS v FROM cc),
    tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM w GROUP BY 1, 2),
    sc AS (
        SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
               ROUND(SUM(tf * (ln((cpos + 1.0) / (npos + v)) - ln((cneg + 1.0) / (nneg + v))))
                     / SUM(tf), 6) AS score
        FROM tf JOIN cc USING (w) CROSS JOIN tot GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, score, CAST(score > 0 AS INT) AS pred FROM sc
    """,
)
def quality_nb_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-shaped naive-Bayes quality classifier trained in-corpus on
    the lang='en' label (operators/text.nb_token_classifier)."""
    docs = _docs(spark, sf_dir).withColumn("_is_en", F.col("lang") == "en")
    return text.nb_token_classifier(docs, "_is_en")


@register(
    "text_ccnet_buckets",
    """
    WITH w AS (
        SELECT doc_id,
               unnest(list_transform(string_split_regex(trim(text), '\\s+'),
                                     x -> lower(x))) AS w
        FROM documents WHERE trim(text) != ''
    ),
    tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM w GROUP BY 1, 2),
    vocab AS (SELECT w, COUNT(*) AS cnt FROM w GROUP BY 1),
    tot AS (SELECT SUM(cnt) AS total FROM vocab),
    sc AS (
        SELECT doc_id, ROUND(SUM(tf * -ln(cnt * 1.0 / total)) / SUM(tf), 4) AS neg_logprob
        FROM tf JOIN vocab USING (w) CROSS JOIN tot GROUP BY doc_id
    )
    SELECT doc_id, lang, neg_logprob,
           CAST(ntile(3) OVER (PARTITION BY lang ORDER BY neg_logprob ASC, doc_id ASC) AS INT)
               AS ppl_bucket
    FROM sc JOIN documents USING (doc_id)
    """,
)
def text_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail perplexity buckets per language
    (operators/text.perplexity_buckets)."""
    return text.perplexity_buckets(_docs(spark, sf_dir))


@register(
    "ann_matryoshka",
    """
    WITH q AS (SELECT vec_id AS q, CAST(embedding[1:16] AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id < 5),
    c AS (SELECT vec_id AS neighbor, CAST(embedding[1:16] AS DOUBLE[]) AS cv FROM embeddings),
    scored AS (
        SELECT q, neighbor, ROUND(list_cosine_similarity(qv, cv), 4) AS cos
        FROM q CROSS JOIN c WHERE q != neighbor
    ),
    rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY q ORDER BY cos DESC, neighbor ASC) AS r
           FROM scored)
    SELECT q, neighbor, cos FROM rk WHERE r <= 3
    """,
)
def ann_matryoshka(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-truncated cosine top-3 (first 16 dims) for query vectors
    vec_id<5 (operators/similarity.matryoshka_topk)."""
    embs = _embs(spark, sf_dir)
    return similarity.matryoshka_topk(
        embs, embs.filter(F.col("vec_id") < 5), d_prime=16, k=3
    )


@register(
    "dataset_interleave",
    """
    WITH s AS (SELECT source, ROW_NUMBER() OVER (ORDER BY source) - 1 AS sidx
               FROM (SELECT DISTINCT source FROM documents)),
    n AS (SELECT COUNT(*) AS ns FROM s),
    k AS (
        SELECT doc_id, source,
               CAST(('0x' || substr(md5('il:' || CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) AS key
        FROM documents
    )
    SELECT doc_id, source,
           CAST((ROW_NUMBER() OVER (PARTITION BY source ORDER BY key, doc_id) - 1) AS BIGINT)
               * ns + sidx AS pos
    FROM k JOIN s USING (source) CROSS JOIN n
    """,
)
def dataset_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic source-interleaved training order: round-robin domain
    striding over reproducible within-source shuffle ranks
    (operators/text.interleave_sources)."""
    return text.interleave_sources(_docs(spark, sf_dir))


@register(
    "ann_matryoshka_rerank",
    """
    WITH q AS (SELECT vec_id AS q, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
               WHERE vec_id < 5),
    qt AS (SELECT vec_id AS q, CAST(embedding[1:16] AS DOUBLE[]) AS qtv FROM embeddings
           WHERE vec_id < 5),
    ct AS (SELECT vec_id AS neighbor, CAST(embedding[1:16] AS DOUBLE[]) AS ctv FROM embeddings),
    s1 AS (
        SELECT q, neighbor,
               ROW_NUMBER() OVER (
                   PARTITION BY q
                   ORDER BY ROUND(list_cosine_similarity(qtv, ctv), 4) DESC, neighbor ASC
               ) AS r
        FROM qt CROSS JOIN ct WHERE q != neighbor
    ),
    short AS (SELECT q, neighbor FROM s1 WHERE r <= 20),
    c AS (SELECT vec_id AS neighbor, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
    s2 AS (
        SELECT short.q, short.neighbor,
               ROUND(list_cosine_similarity(qv, cv), 4) AS cos
        FROM short JOIN c USING (neighbor) JOIN q ON short.q = q.q
    ),
    rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY q ORDER BY cos DESC, neighbor ASC) AS r
           FROM s2)
    SELECT q, neighbor, cos FROM rk WHERE r <= 3
    """,
)
def ann_matryoshka_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage matryoshka retrieval: 16-dim shortlist (20 candidates) →
    full-dimension rerank to top-3 (operators/similarity.matryoshka_rerank_topk)."""
    embs = _embs(spark, sf_dir)
    return similarity.matryoshka_rerank_topk(
        embs, embs.filter(F.col("vec_id") < 5), d_prime=16, shortlist=20, k=3
    )


@register(
    "dedup_exact_best",
    """
    WITH k AS (
        SELECT doc_id, n_chars,
               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS k
        FROM documents
    ),
    best AS (
        SELECT k,
               MAX(STRUCT_PACK(o := n_chars, negid := -doc_id)) AS b,
               CAST(COUNT(*) AS BIGINT) AS n_copies
        FROM k GROUP BY k
    )
    SELECT CAST(-b.negid AS BIGINT) AS rep_id, n_copies,
           b.o AS best_n_chars
    FROM best
    """,
)
def dedup_exact_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware exact dedup: the longest copy (by n_chars) represents
    each duplicate group, ties to the lowest id
    (operators/dedup.exact_dedup_best)."""
    return dedup.exact_dedup_best(_docs(spark, sf_dir), order_col="n_chars")


@register(
    "dataset_interleave_ragged",
    """
    WITH d AS (
        SELECT doc_id,
               CASE WHEN doc_id % 100 < 90 THEN 'big'
                    WHEN doc_id % 100 < 99 THEN 'mid'
                    ELSE 'tiny' END AS source
        FROM documents
    ),
    s AS (SELECT source, ROW_NUMBER() OVER (ORDER BY source) - 1 AS sidx
          FROM (SELECT DISTINCT source FROM d)),
    n AS (SELECT COUNT(*) AS ns FROM s),
    k AS (
        SELECT doc_id, source,
               CAST(('0x' || substr(md5('il:' || CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) AS key
        FROM d
    )
    SELECT doc_id, source,
           CAST((ROW_NUMBER() OVER (PARTITION BY source ORDER BY key, doc_id) - 1) AS BIGINT)
               * ns + sidx AS pos
    FROM k JOIN s USING (source) CROSS JOIN n
    """,
)
def dataset_interleave_ragged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-interleaved order over RAGGED sources (round 8): a 90/9/1
    domain split makes the small sources exhaust orders of magnitude
    before the big one — the round-robin stride then leaves gaps past each
    exhaustion point instead of re-densifying, so a consumer reading
    ORDER BY pos still sees every surviving domain at its original stride
    (the deterministic-curriculum contract; the oracle replays every
    position bit-for-bit on the same skewed catalog)."""
    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.when(F.col("doc_id") % 100 < 90, F.lit("big"))
        .when(F.col("doc_id") % 100 < 99, F.lit("mid"))
        .otherwise(F.lit("tiny"))
        .alias("source"),
    )
    return text.interleave_sources(d)


@register(
    "text_length_quantiles",
    """
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n,
           quantile_cont(n_chars, 0.25) AS p25,
           quantile_cont(n_chars, 0.5)  AS p50,
           quantile_cont(n_chars, 0.75) AS p75,
           quantile_cont(n_chars, 0.95) AS p95
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def text_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language EXACT length-distribution quantiles (round 8): the
    curation step every corpus report starts with — length bands per
    language feed min/max quality cutoffs (Gopher's word-count bounds are
    set from exactly these tables). Spark's exact `percentile` (linear
    interpolation) equals DuckDB's quantile_cont digit-for-digit; the agg
    is a per-group sort of ONE group's values (languages partition the
    corpus), never a global sort, and at 100x the per-language groups
    stay parallel across executors."""
    docs = _docs(spark, sf_dir)
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.percentile(F.col("n_chars"), F.lit(0.25)).alias("p25"),
            F.percentile(F.col("n_chars"), F.lit(0.5)).alias("p50"),
            F.percentile(F.col("n_chars"), F.lit(0.75)).alias("p75"),
            F.percentile(F.col("n_chars"), F.lit(0.95)).alias("p95"),
        )
        .orderBy("lang")
    )


@register(
    "text_line_dedup",
    """
    WITH D AS (
        SELECT doc_id,
               'cookie banner: accept all' || chr(10) || text || chr(10) ||
               'footer nav ' || CAST(doc_id % 5 AS VARCHAR) AS text
        FROM documents
    ),
    L AS (
        SELECT doc_id,
               generate_subscripts(string_split(text, chr(10)), 1) AS l_idx,
               unnest(string_split(text, chr(10))) AS line
        FROM D
    ),
    N AS (SELECT *, regexp_replace(lower(trim(line)), '\\s+', ' ', 'g') AS norm
          FROM L),
    Fq AS (SELECT norm, COUNT(DISTINCT doc_id) AS n_docs FROM N
           WHERE norm != '' GROUP BY norm),
    FL AS (SELECT N.*, (N.norm = '' OR COALESCE(Fq.n_docs, 0) < 2) AS keep
           FROM N LEFT JOIN Fq USING (norm)),
    R AS (
        SELECT doc_id,
               string_agg(CASE WHEN keep THEN line END, chr(10) ORDER BY l_idx) AS text,
               CAST(SUM(CASE WHEN keep AND norm != '' THEN 1 ELSE 0 END) AS BIGINT) AS n_lines_kept,
               CAST(SUM(CASE WHEN NOT keep THEN 1 ELSE 0 END) AS BIGINT) AS n_lines_removed,
               SUM(CASE WHEN NOT keep THEN length(line) ELSE 0 END) AS rm_chars,
               SUM(length(line)) AS all_chars
        FROM FL GROUP BY doc_id
    )
    SELECT doc_id, COALESCE(text, '') AS text, n_lines_kept, n_lines_removed,
           CASE WHEN all_chars > 0 THEN rm_chars / CAST(all_chars AS DOUBLE)
                ELSE 0.0 END AS removed_frac
    FROM R WHERE removed_frac <= 0.3 AND n_lines_kept > 0
    """,
)
def text_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RefinedWeb line-level boilerplate filter (round 8): every document
    gets a synthetic cookie banner (shared by ALL docs) and one of five
    footer variants — lines repeated across >=2 distinct documents are
    removed from every copy, and documents losing >30% of their characters
    drop out (exact-duplicate documents' body lines cross the threshold
    too). The oracle replays split/normalize/count/rebuild bit-for-bit
    (operators/text.line_dedup)."""
    docs = _docs(spark, sf_dir)
    d2 = docs.select(
        "doc_id",
        F.concat(
            F.lit("cookie banner: accept all\n"),
            F.col("text"),
            F.lit("\nfooter nav "),
            (F.col("doc_id") % 5).cast("string"),
        ).alias("text"),
    )
    return text.line_dedup(d2, min_docs=2, max_removed_frac=0.3)
