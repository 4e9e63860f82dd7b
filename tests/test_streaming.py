"""Streaming tests: the driver queries run end-to-end, plus the
production-shaped path the oracle can't see — streaming ingest through
foreachBatch into the relative-path table format, producing one snapshot
per micro-batch (B30 'append stream -> table')."""

from __future__ import annotations

import tempfile

import pytest

from iceberg_relative_io_spark.catalog import FsCatalog, RelativeTable
from iceberg_relative_io_spark.sources.tables import load_table
from iceberg_relative_io_spark.streaming import stream_queries as S


@pytest.mark.skipif(not S._tws_available(), reason="transformWithStateInPandas needs google.protobuf")
def test_tws_user_stats_matches_batch(spark, sf_dir):
    got = {r.user_id: (r.n_events, r.min_value, r.max_value)
           for r in S.q_stream_tws_user_stats(spark, sf_dir).collect()}
    from pyspark.sql import functions as F
    want = {r.user_id: (r.n, r.mn, r.mx)
            for r in load_table(spark, sf_dir, "events").groupBy("user_id")
            .agg(F.count("*").alias("n"), F.min("value").alias("mn"), F.max("value").alias("mx"))
            .collect()}
    assert got == want


@pytest.mark.parametrize("name", sorted(S.QUERIES))
def test_stream_query_runs(spark, sf_dir, name):
    df = S.QUERIES[name](spark, sf_dir)
    assert df.count() > 0


def test_stream_ingest_into_relative_table(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    src = tempfile.mkdtemp(prefix="events_ingest_")
    ev.write.mode("overwrite").parquet(src)

    wh = tempfile.mkdtemp(prefix="stream_wh_")
    cat = FsCatalog(wh)
    cat.create_namespace(("stream",))
    ops = cat.create_table(("stream",), "events_sink", ev.schema.jsonValue())
    table = RelativeTable(ops)

    stream = spark.readStream.schema(S._EVENT_SCHEMA).parquet(src)
    q = (
        stream.writeStream.foreachBatch(lambda batch, epoch: table.append(batch))
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    table.ops._should_refresh = True
    got = table.read(spark)
    assert got.count() == ev.count()
    snaps = table.snapshots(spark).collect()
    assert all(s.operation == "append" for s in snaps)


def test_watermark_drops_late_rows_in_append_windows(spark):
    """Late-data semantics the b30 windowed queries rely on: once the
    watermark passes a window's end, an APPEND-mode windowed aggregate
    has emitted the window and evicted its state — a later event for
    that window is DROPPED, not double-counted and not re-emitted. Two
    micro-batches: batch 1 advances the watermark far past the first
    window; batch 2 replays a late event into it."""
    import tempfile
    import time
    from pathlib import Path

    from pyspark.sql import functions as F

    src = Path(tempfile.mkdtemp(prefix="late_src_"))
    sink = f"late_sink_{int(time.time() * 1000) % 10_000_000}"

    def write_batch(name, rows):
        (src / name).write_text("\n".join(rows) + "\n")

    # batch 1: one event in window [0,10), one 10 minutes later
    write_batch("b1.json", [
        '{"ts": "2024-01-01T00:00:05", "v": 1}',
        '{"ts": "2024-01-01T00:10:00", "v": 1}',
    ])
    stream = (
        spark.readStream.schema("ts timestamp, v int")
        .json(str(src))
        .withWatermark("ts", "10 seconds")
        .groupBy(F.window("ts", "10 seconds").alias("w"))
        .agg(F.sum("v").alias("total"))
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="late_ckpt_"))
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: a LATE event back in the long-finalized first window,
        # plus an on-time one that keeps the stream moving
        write_batch("b2.json", [
            '{"ts": "2024-01-01T00:00:06", "v": 100}',
            '{"ts": "2024-01-01T00:11:00", "v": 1}',
        ])
        q.processAllAvailable()
        write_batch("b3.json", ['{"ts": "2024-01-01T00:20:00", "v": 1}'])
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.sql(f"select w.start, total from {sink}").collect()
    by_start = {}
    for r in rows:
        key = r.start.strftime("%H:%M:%S")
        assert key not in by_start, "a finalized window re-emitted"
        by_start[key] = r.total
    # the late v=100 must NOT appear: the first window keeps total=1
    assert by_start.get("00:00:00") == 1


def test_stream_static_join_matches_batch(spark, sf_dir):
    """The stream-static enrichment must produce exactly the batch
    join+agg over the same inputs (stream-static joins are stateless:
    each micro-batch joins against the current static snapshot)."""
    from pyspark.sql import functions as F

    from iceberg_relative_io_spark.sources.tables import load_table
    from iceberg_relative_io_spark.streaming.stream_queries import (
        q_stream_static_join,
    )

    got = {
        (r.c_mktsegment, r.event_type): (r.n_events, r.sum_value)
        for r in q_stream_static_join(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    want = {
        (r.c_mktsegment, r.event_type): (r.n_events, r.sum_value)
        for r in ev.join(cust, "user_id")
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,4)")).cast("double").alias("sum_value"),
        )
        .collect()
    }
    assert got == want
