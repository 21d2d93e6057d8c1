"""Relational → RDF direct mapping (W3C Direct Mapping flavor).

Each row becomes a subject ``<table>:<key>``; each column a predicate
``<table>#<col>`` with a typed literal object; each declared foreign key adds a
reference triple ``<table>#<col>_ref`` whose object is the target row's
subject IRI. This is how the TPC-H-ish harness tables enter the engine, and it
is lossless — so every SPARQL-algebra result over the mapped triples has an
exact ANSI-SQL oracle over the original tables (used by __spark_entry__.py).

All of it is built-in-expression work (concat/cast/explode): stays in
whole-stage codegen, no Python UDFs, scales linearly with input splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from blazegraph_database_spark.model.store import PredStat, TripleStore
from blazegraph_database_spark.session import ensure_session_confs

_DT_FOR_SPARK = {
    T.StringType: "string",
    T.LongType: "long",
    T.IntegerType: "long",
    T.ShortType: "long",
    T.DoubleType: "double",
    T.FloatType: "double",
    T.DecimalType: "decimal",
    T.BooleanType: "boolean",
    T.TimestampType: "timestamp",
    T.DateType: "timestamp",
}

# table -> (key column, {fk column -> referenced table})
TPCH_SCHEMA: dict[str, tuple[str, dict[str, str]]] = {
    "region": ("r_regionkey", {}),
    "nation": ("n_nationkey", {"n_regionkey": "region"}),
    "customer": ("c_custkey", {"c_nationkey": "nation"}),
    "supplier": ("s_suppkey", {"s_nationkey": "nation"}),
    "part": ("p_partkey", {}),
    "orders": ("o_orderkey", {"o_custkey": "customer"}),
    "lineitem": (None, {"l_orderkey": "orders", "l_partkey": "part", "l_suppkey": "supplier"}),
    "events": ("event_id", {}),
    "documents": ("doc_id", {}),
    "embeddings": ("vec_id", {}),
}
def subject_col(table: str, df: DataFrame, key: str | None) -> F.Column:
    if key is None:
        # No declared key (harness lineitem has non-unique (orderkey,linenumber)
        # but unique full rows): deterministic row-identity = hash of all
        # columns. Stateless, distributed, reproducible across store rebuilds.
        # 128 bits (two salted xxhash64 halves), not 64: at the 100 TB design
        # point a fact table is 10^11+ rows, where a 64-bit row identity
        # expects real collisions — two distinct rows silently merging into
        # one subject (same bound as the r11 term-id widening).
        from blazegraph_database_spark.model.dictionary import WIDE_SALT

        cols = [F.col(c).cast("string") for c in df.columns]
        return F.concat(
            F.lit(table + ":"),
            F.lower(F.hex(F.xxhash64(*cols))),
            F.lower(F.hex(F.xxhash64(*cols, F.lit(WIDE_SALT)))),
        )
    return F.concat(F.lit(table + ":"), F.col(key).cast("string"))


def _dt_tag(dtype: T.DataType) -> str:
    for k, v in _DT_FOR_SPARK.items():
        if isinstance(dtype, k):
            return v
    return "string"


def table_to_triples(df: DataFrame, table: str, key: str | None, fks: dict[str, str]) -> DataFrame:
    """Melt a relational table into (s, p, o_lex, o_dt) triples."""
    s = subject_col(table, df, key)
    entries = []
    for f in df.schema.fields:
        if isinstance(f.dataType, T.ArrayType):
            continue  # array columns (embeddings) stay relational; see operators/similarity.py
        pred = f"{table}#{f.name}"
        entries.append(
            F.struct(
                F.lit(pred).alias("p"),
                F.col(f.name).cast("string").alias("o_lex"),
                F.lit(_dt_tag(f.dataType)).alias("o_dt"),
            )
        )
        if f.name in fks:
            ref = fks[f.name]
            entries.append(
                F.struct(
                    F.lit(f"{table}#{f.name}_ref").alias("p"),
                    F.concat(F.lit(ref + ":"), F.col(f.name).cast("string")).alias("o_lex"),
                    F.lit("iri").alias("o_dt"),
                )
            )
    melted = df.select(s.alias("s"), F.explode(F.array(*entries)).alias("t")).select(
        "s", "t.p", "t.o_lex", "t.o_dt"
    )
    return melted.filter(F.col("o_lex").isNotNull())


# Harness timestamp columns arrive in different physical types depending on
# the generation: TIMESTAMP(NANOS) (read as long under nanosAsLong) or plain
# timestamp[us] without UTC adjustment (read as TIMESTAMP_NTZ). Normalize
# both to a plain TIMESTAMP so downstream plans and oracle hashes are
# representation-independent (session tz is pinned UTC, so the NTZ cast is
# wall-time-identical).
NANO_TS_COLS = {"o_orderdate", "l_shipdate", "ts"}


def _fix_nano_ts(df: DataFrame) -> DataFrame:
    for f in df.schema.fields:
        if f.name not in NANO_TS_COLS:
            continue
        if isinstance(f.dataType, T.LongType):
            df = df.withColumn(f.name, F.timestamp_micros((F.col(f.name) / 1000).cast("long")))
        elif isinstance(f.dataType, T.TimestampNTZType):
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
    return df


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Session-independent harness parquet read: sets the required runtime
    confs (the driver's session lacks our builder confs) and normalizes
    nano-timestamp columns back to real timestamps."""
    ensure_session_confs(spark)
    return _fix_nano_ts(spark.read.parquet(path))


def load_tables(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> dict[str, DataFrame]:
    tables = tables or list(TPCH_SCHEMA)
    return {t: read_parquet(spark, f"{sf_dir}/{t}.parquet") for t in tables}


def _pred_source_factories(
    spark: SparkSession, sf_dir: str, tables: list[str], fields: dict
) -> dict:
    """One lazy factory per predicate serving its triples straight from the
    base table parquet — the virtual POS index. A constant-predicate BGP
    pattern becomes `scan(table) → project(key, col)`: parquet column
    pruning reads exactly two columns and constant filters push into the
    scan. At 100 TB this is the difference between reading one column of
    one table and reading the full melted triple union.

    ``fields``: {table: [(col_name, dt_tag | None-if-array), ...]} from
    parquet footers (no Spark jobs, no JVM roundtrips)."""

    def factory(table: str, fname: str, dt: str, ref: str | None):
        def build(typed: bool = False) -> DataFrame:
            df = read_parquet(spark, f"{sf_dir}/{table}.parquet")
            key, _ = TPCH_SCHEMA[table]
            s = subject_col(table, df, key)
            if ref is None:
                # typed: serve the object in its NATIVE parquet type (no
                # lexical cast) — the compiler asks for this only when every
                # consumer is a typed cast, so range filters and aggregates
                # run (and push down) on the native column (inline-IV analog)
                o = F.col(fname) if typed and dt in ("long", "double", "timestamp") else F.col(fname).cast("string")
                pred = f"{table}#{fname}"
                o_dt = dt
            else:
                o = F.concat(F.lit(ref + ":"), F.col(fname).cast("string"))
                pred = f"{table}#{fname}_ref"
                o_dt = "iri"
            return df.select(
                s.alias("s"), F.lit(pred).alias("p"), o.alias("o_lex"), F.lit(o_dt).alias("o_dt")
            ).filter(F.col("o_lex").isNotNull())

        return build

    out: dict = {}
    for t in tables:
        _, fks = TPCH_SCHEMA[t]
        for name, tag in fields[t]:
            if tag is None:  # array column
                continue
            out[f"{t}#{name}"] = factory(t, name, tag, None)
            if name in fks:
                out[f"{t}#{name}_ref"] = factory(t, name, "iri", fks[name])
    return out


def _star_source_factory(spark: SparkSession, sf_dir: str, tables: list[str], fields: dict):
    """Fused star scan: all constant predicates of one subject variable that
    live in the same base table come back as ONE column-pruned parquet scan
    (columns: s + one per predicate) instead of N scans + N-1 self-joins.
    This is the star-join analog of the reference's subject-ordered SPO
    index — at 100 TB it is the difference between reading the fact table
    once and shuffling it against itself N times."""
    meta: dict[str, tuple[str, str, str | None]] = {}
    for t in tables:
        _, fks = TPCH_SCHEMA[t]
        for name, tag in fields[t]:
            if tag is None:
                continue
            meta[f"{t}#{name}"] = (t, name, None)
            if name in fks:
                meta[f"{t}#{name}_ref"] = (t, name, fks[name])

    def star(preds: list[str], native: frozenset = frozenset()) -> DataFrame | None:
        info = [meta.get(p) for p in preds]
        if any(i is None for i in info) or len({i[0] for i in info}) != 1:
            return None
        table = info[0][0]
        df = read_parquet(spark, f"{sf_dir}/{table}.parquet")
        key, _ = TPCH_SCHEMA[table]
        for _, col, _ in info:
            df = df.filter(F.col(col).isNotNull())
        sel = [subject_col(table, df, key).alias("s")]
        for p, (_, col, ref) in zip(preds, info):
            if ref:
                o = F.concat(F.lit(ref + ":"), F.col(col).cast("string"))
            elif p in native:
                o = F.col(col)  # native type rides the fused scan untouched
            else:
                o = F.col(col).cast("string")
            sel.append(o.alias(p))
        return df.select(*sel)

    pred_table = {p: m[0] for p, m in meta.items()}
    return star, pred_table


def _metadata_stats(
    fields: dict[str, list],
    counts: dict[str, int],
    nonnull: dict[str, dict[str, int]] | None = None,
) -> tuple[dict[str, PredStat], bool]:
    """B+Tree-range-count-style stats without materializing any triples —
    row counts come straight from parquet footers, zero Spark jobs.

    ``nonnull[t][col]`` (when the footer's column statistics carry null
    counts) makes the per-predicate counts EXACT — the melt filters null
    objects, so a nullable column's triple count is its non-null count,
    not the table row count. Returns (stats, exact): exact is False iff
    any column lacked footer null counts and had to fall back to the row
    count (then the counts are upper-bound estimates, fine for join
    ordering but not for fast COUNT(*)/ESTCARD answers)."""
    stats: dict[str, PredStat] = {}
    exact = True
    for t, flds in fields.items():
        n = counts[t]
        _, fks = TPCH_SCHEMA[t]
        for name, tag in flds:
            if tag is None:
                continue
            nn = (nonnull or {}).get(t, {}).get(name)
            if nn is None:
                nn = n
                exact = False
            stats[f"{t}#{name}"] = PredStat(nn, max(nn, 1), max(nn, 1))
            if name in fks:
                ref_n = counts.get(fks[name]) or nn
                stats[f"{t}#{name}_ref"] = PredStat(nn, max(nn, 1), max(ref_n, 1))
    return stats, exact


def _footer_meta(path: str) -> tuple[list, int, dict[str, int]]:
    """(field list [(name, dt_tag | None-if-array)], row count, per-column
    non-null counts) straight from the parquet footer — pure Python, no
    Spark jobs, no JVM roundtrips. Non-null counts come from the row-group
    column statistics (num_rows - null_count summed over row groups); a
    column whose writer omitted null counts is absent from the dict."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    fields = []
    for f in pf.schema_arrow:
        if pa.types.is_list(f.type) or pa.types.is_large_list(f.type):
            tag = None  # arrays (embeddings) stay relational
        elif pa.types.is_timestamp(f.type):
            tag = "timestamp"
        elif pa.types.is_integer(f.type):
            tag = "long"
        elif pa.types.is_floating(f.type):
            tag = "double"
        elif pa.types.is_boolean(f.type):
            tag = "boolean"
        else:
            tag = "string"
        fields.append((f.name, tag))
    md = pf.metadata
    flat = {f.name for f in pf.schema_arrow}
    nulls: dict[str, int] = {}
    complete = set(flat)
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name = col.path_in_schema
            if name not in flat:
                # nested physical column (maps/structs/lists): its leaf null
                # counts don't give the top-level field's null count
                complete.discard(name.split(".")[0])
                continue
            st = col.statistics
            if st is None or st.null_count is None:
                complete.discard(name)
            else:
                nulls[name] = nulls.get(name, 0) + st.null_count
    nonnull = {name: md.num_rows - nulls.get(name, 0) for name in complete}
    return fields, md.num_rows, nonnull


def store_from_sf_dir(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> TripleStore:
    """Map the harness parquet tables into one TripleStore with virtual
    per-predicate sources and metadata-derived stats. Construction runs no
    Spark job and touches the JVM zero times: schemas and row counts come
    from parquet footers, and the melted union view (needed only for
    variable-predicate patterns / DESCRIBE) is built lazily on first use."""
    tables = tables or list(TPCH_SCHEMA)
    meta = {t: _footer_meta(f"{sf_dir}/{t}.parquet") for t in tables}
    fields = {t: m[0] for t, m in meta.items()}
    counts = {t: m[1] for t, m in meta.items()}
    nonnull = {t: m[2] for t, m in meta.items()}

    def build_union() -> DataFrame:
        dfs = load_tables(spark, sf_dir, tables)
        parts = []
        for t, df in dfs.items():
            key, fks = TPCH_SCHEMA[t]
            parts.append(table_to_triples(df, t, key, fks))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    star, pred_table = _star_source_factory(spark, sf_dir, tables, fields)
    pred_dt: dict[str, str] = {}
    for t in tables:
        _, fks = TPCH_SCHEMA[t]
        for name, tag in fields[t]:
            if tag is None:
                continue
            pred_dt[f"{t}#{name}"] = tag
            if name in fks:
                pred_dt[f"{t}#{name}_ref"] = "iri"
    store = TripleStore(
        df_factory=build_union,
        pred_sources=_pred_source_factories(spark, sf_dir, tables, fields),
        star_factory=star,
        pred_table=pred_table,
        pred_dt=pred_dt,
    )
    store._stats, store._stats_exact = _metadata_stats(fields, counts, nonnull)
    return store


_STORE_CACHE: dict[tuple[int, str, tuple], TripleStore] = {}


def cached_store(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] | None = None) -> TripleStore:
    key = (id(spark), sf_dir, tables or ())
    if key not in _STORE_CACHE:
        _STORE_CACHE[key] = store_from_sf_dir(spark, sf_dir, list(tables) if tables else None)
    return _STORE_CACHE[key]
