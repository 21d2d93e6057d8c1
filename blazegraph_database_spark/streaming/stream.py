"""Structured Streaming ingestion + stateful operators (SURVEY.md §2.10).

The reference has no streaming story; this is the Spark-native addition the
spec mandates. Patterns:
- file-source ``readStream`` over the events table → the same direct
  relational→RDF mapping used in batch (expressions are mode-agnostic);
- watermarked tumbling-window aggregation (late rows beyond the watermark
  are dropped, state is bounded);
- stateful stream dedup via ``dropDuplicatesWithinWatermark``.

Every streaming computation here has a batch-equivalent formulation on the
same input, which is what the DuckDB oracles check: the *streaming* run
(availableNow trigger → memory sink) must produce exactly the batch answer.

Scale notes: file-source streaming shards by file; the window aggregation
state is keyed (window, event_type) — small; dedup state is bounded by the
watermark horizon. On a real cluster the source would be Kafka with the
same downstream plan.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def events_schema(spark: SparkSession, sf_dir: str) -> T.StructType:
    from blazegraph_database_spark.session import ensure_session_confs

    ensure_session_confs(spark)  # events.ts is TIMESTAMP(NANOS); driver session lacks the conf
    return spark.read.parquet(f"{sf_dir}/events.parquet").schema


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (one file = one shard).
    Harness parquet stores ts as TIMESTAMP(NANOS) (surfaced as long under
    nanosAsLong) or timestamp[us] without UTC adjustment (surfaced as
    TIMESTAMP_NTZ) — normalize to a real TIMESTAMP either way; watermarks
    require it, and session tz is pinned UTC so the cast is exact."""
    schema = events_schema(spark, sf_dir)
    # the harness table is a single file; the file stream source wants a
    # directory, so stream the dir with a glob pinned to the events table
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if isinstance(schema["ts"].dataType, T.LongType):
        stream = stream.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    elif isinstance(schema["ts"].dataType, T.TimestampNTZType):
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def events_to_triples(stream: DataFrame) -> DataFrame:
    """Streaming direct mapping: event rows → triples. The same expression
    shape as sources/relational.py — works unchanged on a streaming plan."""
    s = F.concat(F.lit("event:"), F.col("event_id"))
    entries = [
        F.struct(F.lit(f"events#{c}").alias("p"), F.col(c).cast("string").alias("o_lex"), F.lit(dt).alias("o_dt"))
        for c, dt in [("event_type", "string"), ("user_id", "long"), ("value", "double"), ("props", "string")]
    ]
    return (
        stream.select(s.alias("s"), F.explode(F.array(*entries)).alias("t"))
        .select("s", "t.p", "t.o_lex", "t.o_dt")
        .filter(F.col("o_lex").isNotNull())
    )


def windowed_agg(stream: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window aggregation per event_type."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # integer cents, not ROUND-of-double: bit-stable across engines
            F.round(F.sum("value") * 100).cast("long").alias("sum_value_cents"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value_cents")
    )


def dedup_within_watermark(stream: DataFrame, keys: list[str], watermark: str = "2 hours") -> DataFrame:
    """Stateful stream dedup: first arrival per key wins within the
    watermark horizon; state for keys older than the watermark is dropped."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    within: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream interval join: (key, l_id, r_id) pairs
    where the right event lands in [l_ts, l_ts + within] for the same key.

    The canonical funnel/attribution join (click → purchase). Both sides
    carry watermarks so the join state store evicts rows older than
    watermark + interval — bounded state at any stream length; the
    time-range predicate is what lets Spark bound buffering on BOTH sides
    (an unconstrained stream-stream equi-join would buffer forever).
    """
    l = left.select(
        F.col(key), F.col("ts").alias("l_ts"), F.col("event_id").alias("l_id")
    ).withWatermark("l_ts", watermark)
    r = right.select(
        F.col(key).alias("__rkey"), F.col("ts").alias("r_ts"), F.col("event_id").alias("r_id")
    ).withWatermark("r_ts", watermark)
    cond = (
        (F.col(key) == F.col("__rkey"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"interval {within}"))
    )
    return l.join(r, cond, "inner").select(key, "l_id", "r_id")


def run_to_memory(stream_df: DataFrame, output_mode: str = "complete") -> DataFrame:
    """Execute a streaming plan over all available input (availableNow) into
    a memory sink and return the materialized result table."""
    name = f"sink_{uuid.uuid4().hex[:12]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()
    return stream_df.sparkSession.table(name)


def sessionize_stateful(stream: DataFrame, gap_seconds: float = 1800.0) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user session
    counting with a gap timeout — a new session starts when the time since
    the user's previous event exceeds ``gap_seconds``.

    State per user = (n_events, n_sessions, last_ts); each micro-batch folds
    its (ts-sorted) rows into the state and emits the running totals
    (update mode). Only time DIFFERENCES cross the state boundary, so the
    result is timezone-offset-invariant and exactly batch-recomputable with
    a LAG window — which is what the oracle checks. State is one small row
    per active user; at scale a ProcessingTimeTimeout would expire idle
    users' state at the watermark horizon."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs, state):
        if state.exists:
            n, sessions, last = state.get
        else:
            n, sessions, last = 0, 0, float("-inf")
        # concatenate ALL of the group's chunks before sorting: a single
        # user's micro-batch rows can span multiple Arrow chunks, and the
        # chunks themselves arrive unordered — per-chunk sorting would fold
        # timestamps out of order across chunk boundaries (ADVICE r2)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            allrows = pd.concat(chunks, ignore_index=True).sort_values(["ts", "event_id"])
            for t in allrows["ts"]:
                tsec = t.timestamp() if hasattr(t, "timestamp") else float(t)
                if tsec - last > gap_seconds:
                    sessions += 1
                n += 1
                last = tsec
        state.update((n, sessions, last))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "n_sessions": [sessions]}
        )

    return (
        stream.select("user_id", "ts", "event_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            "user_id long, n_events long, n_sessions long",
            "n long, sessions long, last_ts double",
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


def ingest_stream_to_store(
    stream_triples: DataFrame,
    store,
    with_closure: bool = False,
    checkpoint_dir: str | None = None,
):
    """Commit a triple stream into an :class:`UpdatableStore`, one store
    version per micro-batch (foreachBatch → ``insert_data`` /
    ``insert_with_closure``) — the streaming DataLoader: each micro-batch
    is a transaction, readers keep whatever version they hold (snapshot
    isolation), and with ``with_closure=True`` every batch forward-chains
    only its delta against the closed store (inference.rdfs.delta_assert).

    Returns the StreamingQuery; await with ``.awaitTermination()``. The
    driver is the single writer (the reference's unisolated-connection
    discipline), so micro-batch commits serialize naturally.
    """
    import tempfile

    def commit(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # foreachBatch hands over an ephemeral DF; pin the rows so the new
        # store version doesn't depend on re-reading stream state
        pinned = batch_df.localCheckpoint(eager=True)
        if with_closure:
            store.insert_with_closure(pinned)
        else:
            store.insert_data(pinned)

    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="ingest_ckpt_")
    return (
        stream_triples.writeStream.outputMode("append")
        .foreachBatch(commit)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )


# ------------------------------------------------------------ source profiles --
def kafka_wire_encode(df: DataFrame, key_cols: list[str], ts_col: str = "ts") -> DataFrame:
    """Rows → Kafka wire records ``(key binary, value binary, timestamp)``:
    exactly what a JSON producer publishes. Batch helper — tests (and local
    replays) build wire-exact fixtures with it, so the decode path below is
    exercised without a broker."""
    return df.select(
        F.to_json(F.struct(*[F.col(c) for c in key_cols])).cast("binary").alias("key"),
        F.to_json(F.struct(*[F.col(c) for c in df.columns])).cast("binary").alias("value"),
        F.col(ts_col).cast("timestamp").alias("timestamp"),
    )


def kafka_wire_decode(records: DataFrame, schema: T.StructType) -> DataFrame:
    """Kafka wire records → typed rows: ``value`` carries a JSON payload
    (the usual event-bus convention); ``from_json`` restores the declared
    schema. The input only needs (value) — the same decode runs on the real
    kafka source, on a file stream replaying captured wire records, or on a
    memory stream, which is how the unit tests drive it in this
    broker-less container."""
    return records.select(
        F.from_json(F.col("value").cast("string"), schema).alias("r")
    ).select("r.*")


def read_stream_source(spark: SparkSession, profile: dict, schema: T.StructType | None = None) -> DataFrame:
    """Config-driven streaming source selection — one ingestion pipeline,
    swappable transports (SURVEY R5 Kafka profile):

    - ``{"kind": "file", "path": dir, "glob": pattern?}`` — parquet file
      stream (the testable default in this container; one file = one shard).
    - ``{"kind": "rate", "rows_per_second": n}`` — synthetic load source.
    - ``{"kind": "kafka", "bootstrap_servers": ..., "subscribe": topic}``
      (or ``"assign"``) — the production transport; returns the raw wire
      frame, pipe through :func:`kafka_wire_decode`. Needs the
      spark-sql-kafka connector jar on the cluster; this container ships
      without it, so instantiation raises a clear error here (the
      documented environment gap, like the multimodal codecs).
    """
    kind = profile.get("kind", "file")
    if kind == "file":
        if schema is None:
            raise ValueError("file source profile requires a schema")
        reader = spark.readStream.schema(schema)
        if profile.get("glob"):
            reader = reader.option("pathGlobFilter", profile["glob"])
        return reader.parquet(profile["path"])
    if kind == "rate":
        return (
            spark.readStream.format("rate")
            .option("rowsPerSecond", str(profile.get("rows_per_second", 100)))
            .load()
        )
    if kind == "kafka":
        reader = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", profile["bootstrap_servers"])
            .option("startingOffsets", profile.get("starting_offsets", "earliest"))
        )
        for opt in ("subscribe", "assign", "subscribePattern"):
            if opt in profile:
                reader = reader.option(opt, profile[opt])
        try:
            return reader.load()
        except Exception as exc:  # connector jar absent in this container
            raise RuntimeError(
                "kafka streaming profile requires the spark-sql-kafka connector "
                "(org.apache.spark:spark-sql-kafka-0-10) on the classpath; "
                "replay captured wire records through a file profile + "
                "kafka_wire_decode to test the same pipeline without a broker"
            ) from exc
    raise ValueError(f"unknown stream source profile kind {kind!r}")


def funnel_stateful(stream: DataFrame, steps: tuple = ("view", "click", "purchase")) -> DataFrame:
    """Stateful funnel detection via applyInPandasWithState: per user,
    advance through ``steps`` in (ts, event_id) order — each step matches
    the first qualifying event strictly after the previous step — and emit
    ONE row (user_id, start_s, end_s) when the last step completes (append
    mode; first completion only, then the user's state is closed).

    The strict-ordering rule makes the machine exactly batch-recomputable
    as chained MIN(ts) self-joins, which is what the oracle checks. State
    per user = (step index, start ts, prev-step ts, done flag) — four
    scalars, bounded regardless of event volume."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    steps = tuple(steps)

    def fn(key, pdfs, state):
        if state.exists:
            idx, t_start, t_prev, done = state.get
        else:
            idx, t_start, t_prev, done = 0, 0.0, float("-inf"), 0
        out = []
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks and not done:
            allrows = pd.concat(chunks, ignore_index=True).sort_values(["ts", "event_id"])
            for t, et in zip(allrows["ts"], allrows["event_type"]):
                if done:
                    break
                tsec = t.timestamp() if hasattr(t, "timestamp") else float(t)
                if et == steps[idx] and tsec > t_prev:
                    if idx == 0:
                        t_start = tsec
                    t_prev = tsec
                    idx += 1
                    if idx == len(steps):
                        done = 1
                        out.append((key[0], int(t_start), int(tsec)))
        state.update((idx, t_start, t_prev, done))
        if out:
            yield pd.DataFrame(out, columns=["user_id", "start_s", "end_s"])
        else:
            yield pd.DataFrame({"user_id": [], "start_s": [], "end_s": []})

    return (
        stream.select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            "user_id long, start_s long, end_s long",
            "idx int, t_start double, t_prev double, done int",
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


def sliding_counts(
    stream: DataFrame,
    key: str = "event_type",
    window: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "4 hours",
) -> DataFrame:
    """Sliding-window term frequencies — the stateful half of a streaming
    'trending terms' pipeline: each event lands in window/slide overlapping
    windows and the state store keeps one partial count per (window, key)
    until the watermark closes the window. Top-k ranking is NOT applied in
    the stream (rank over a streaming aggregate is not incremental); rank
    the complete-mode sink output instead — see queries_stream
    stream_trending_terms."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), key)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), key, "n")
    )
