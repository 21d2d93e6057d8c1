"""Structured Streaming tests: streaming/batch parity, late-data handling,
stateful dedup (file source over tmp parquet fixtures)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from blazegraph_database_spark.streaming import stream as S

SF = "/root/testdata/sf0.001"


def test_stream_is_streaming(spark):
    st = S.read_events_stream(spark, SF)
    assert st.isStreaming
    assert S.events_to_triples(st).isStreaming


def test_window_agg_matches_batch(spark):
    st = S.read_events_stream(spark, SF)
    got = S.run_to_memory(S.windowed_agg(st), "complete")
    ev = spark.read.parquet(f"{SF}/events.parquet")
    from pyspark.sql import types as T

    if isinstance(ev.schema["ts"].dataType, T.LongType):
        ev = ev.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    batch = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value") * 100).cast("long").alias("sum_value_cents"),
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))


def test_dedup_within_watermark(spark, tmp_path):
    rows = [
        (1, "2024-01-01 00:00:00", "click"),
        (2, "2024-01-01 00:10:00", "click"),   # dup key within watermark
        (3, "2024-01-01 00:20:00", "view"),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts_s string, kind string").select(
        "event_id", F.col("ts_s").cast("timestamp").alias("ts"), "kind"
    )
    path = str(tmp_path / "ev")
    df.write.parquet(path)
    st = spark.readStream.schema(df.schema).parquet(path)
    out = S.run_to_memory(
        S.dedup_within_watermark(st, ["kind"], watermark="1 hour").select("kind"), "append"
    )
    assert sorted(r["kind"] for r in out.collect()) == ["click", "view"]


def test_sessionize_multichunk_order(spark, tmp_path):
    # one user's rows spanning many unordered Arrow chunks must still fold
    # in timestamp order (ADVICE r2: per-chunk sorting diverged on larger
    # groups). 200 events 60s apart with a 100s gap = exactly 1 session;
    # out-of-order folding would overcount sessions.
    import random

    random.seed(7)
    rows = [(i, 1, 1_700_000_000 + i * 60) for i in range(200)]
    random.shuffle(rows)
    df = spark.createDataFrame(rows, "event_id long, user_id long, tsec long").select(
        "event_id", "user_id", F.timestamp_seconds("tsec").alias("ts")
    )
    path = str(tmp_path / "sess")
    df.repartition(8).write.parquet(path)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "5")
    try:
        st = spark.readStream.schema(df.schema).parquet(path)
        out = S.run_to_memory(S.sessionize_stateful(st, gap_seconds=100.0), "update")
        r = out.orderBy(F.col("n_events").desc()).first()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert r["n_events"] == 200
    assert r["n_sessions"] == 1


def test_stream_to_triples_counts(spark):
    st = S.read_events_stream(spark, SF)
    out = S.run_to_memory(
        S.events_to_triples(st).groupBy("p").agg(F.count(F.lit(1)).alias("n")), "complete"
    )
    n_events = spark.read.parquet(f"{SF}/events.parquet").count()
    counts = {r["p"]: r["n"] for r in out.collect()}
    assert counts["events#event_type"] == n_events
    assert set(counts) == {"events#event_type", "events#user_id", "events#value", "events#props"}


def test_ingest_stream_to_store_versions(spark, tmp_path):
    """Micro-batch commits: the stream lands in an UpdatableStore as new
    versions with snapshot isolation; closure mode chains each delta."""
    from blazegraph_database_spark.model.store import TripleStore
    from blazegraph_database_spark.update.update import UpdatableStore

    schema_rows = [("Class:Click", "rdfs:subClassOf", "Class:Event", "iri")]
    us = UpdatableStore.from_store(
        TripleStore(
            spark.createDataFrame(schema_rows, "s string, p string, o_lex string, o_dt string")
        )
    )
    us.insert_with_closure(
        spark.createDataFrame([], "s string, p string, o_lex string, o_dt string")
    )
    v0 = us.current

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(f"e{i}",) for i in range(20)], "eid string"
    ).repartition(2).write.parquet(src)
    st = spark.readStream.schema("eid string").parquet(src)
    triples = st.select(
        F.col("eid").alias("s"),
        F.lit("rdf:type").alias("p"),
        F.lit("Class:Click").alias("o_lex"),
        F.lit("iri").alias("o_dt"),
    )
    q = S.ingest_stream_to_store(
        triples, us, with_closure=True, checkpoint_dir=str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    cur = us.current.df
    assert cur.filter((F.col("p") == "rdf:type") & (F.col("o_lex") == "Class:Click")).count() == 20
    # delta closure fired per batch: every click is also an Event
    assert cur.filter((F.col("p") == "rdf:type") & (F.col("o_lex") == "Class:Event")).count() == 20
    # snapshot isolation: the pre-stream version is untouched
    assert v0.df.filter(F.col("p") == "rdf:type").count() == 0
    assert len(us.versions) > 2


def test_kafka_wire_roundtrip_matches_batch(spark, tmp_path):
    """Kafka profile without a broker: batch rows → wire records (key/value
    JSON binary) → file-stream replay → kafka_wire_decode → windowed agg
    must equal the batch aggregation of the original rows."""
    rows = [
        (1, "2024-01-01 00:05:00", "click", 1.5),
        (2, "2024-01-01 00:25:00", "click", 2.0),
        (3, "2024-01-01 01:10:00", "view", 3.25),
        (4, "2024-01-01 01:40:00", "view", 0.5),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts_s string, event_type string, value double"
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"), "event_type", "value")
    wire = S.kafka_wire_encode(ev, key_cols=["event_id"])
    assert [f.name for f in wire.schema] == ["key", "value", "timestamp"]
    assert dict(wire.dtypes)["value"] == "binary"
    path = str(tmp_path / "wire")
    wire.write.parquet(path)

    st = S.read_stream_source(spark, {"kind": "file", "path": path}, schema=wire.schema)
    decoded = S.kafka_wire_decode(st, ev.schema)
    assert decoded.isStreaming and decoded.schema == ev.schema
    got = S.run_to_memory(S.windowed_agg(decoded), "complete")
    batch = ev.groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value") * 100).cast("long").alias("sum_value_cents"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))


def test_stream_source_profiles(spark):
    rate = S.read_stream_source(spark, {"kind": "rate", "rows_per_second": 5})
    assert rate.isStreaming and "timestamp" in rate.columns
    with pytest.raises(RuntimeError, match="kafka"):
        S.read_stream_source(
            spark, {"kind": "kafka", "bootstrap_servers": "localhost:9092", "subscribe": "t"}
        )
    with pytest.raises(ValueError, match="unknown"):
        S.read_stream_source(spark, {"kind": "nope"})


def test_funnel_stateful_strict_order(spark, tmp_path):
    """Funnel machine only advances on strictly-later events, emits once,
    and ignores steps arriving out of order."""
    rows = [
        # u1 completes: view@0, click@10, purchase@20 (plus noise)
        (1, "2024-01-01 00:00:00", 1, "view"),
        (2, "2024-01-01 00:00:10", 1, "click"),
        (3, "2024-01-01 00:00:15", 1, "view"),
        (4, "2024-01-01 00:00:20", 1, "purchase"),
        (5, "2024-01-01 00:00:30", 1, "purchase"),   # after done → ignored
        # u2 never completes (purchase BEFORE click)
        (6, "2024-01-01 00:00:00", 2, "view"),
        (7, "2024-01-01 00:00:05", 2, "purchase"),
        (8, "2024-01-01 00:00:10", 2, "click"),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts_s string, user_id long, event_type string").select(
        "event_id", F.col("ts_s").cast("timestamp").alias("ts"), "user_id", "event_type"
    )
    path = str(tmp_path / "ev")
    df.write.parquet(path)
    st = spark.readStream.schema(df.schema).parquet(path)
    out = S.run_to_memory(S.funnel_stateful(st), "append").collect()
    assert len(out) == 1
    r = out[0]
    assert r["user_id"] == 1 and r["end_s"] - r["start_s"] == 20
