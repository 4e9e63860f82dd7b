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


def test_foreachbatch_epoch_replay_idempotent(spark):
    """Round-9 regression pin for the sink-side replay hazard:
    foreachBatch is at-least-once (a crash between the sink's table
    commit and the engine's commit-log write replays the epoch with the
    same batchId), so the b30/b31 sinks record a checkpoint-scoped
    epoch key in the snapshot summary and skip epochs already
    committed. This drives a real stream whose sink crashes
    post-commit, restarts it on the same checkpoint, and asserts the
    replayed epoch minted no second snapshot and no duplicate rows.
    (tools/fuzz_stream.py --sinks randomizes the same scenario across
    crash points and all three sink shapes.)"""
    from iceberg_relative_io_spark.streaming.stream_queries import _epoch_key

    src = tempfile.mkdtemp(prefix="replay_src_")
    rows = [(i, f"r{i}") for i in range(9)]
    for f in range(3):
        spark.createDataFrame(
            rows[f * 3 : (f + 1) * 3], "id long, v string"
        ).coalesce(1).write.mode("append").parquet(src)

    wh = tempfile.mkdtemp(prefix="replay_wh_")
    cat = FsCatalog(wh)
    cat.create_namespace(("ns",))
    schema_json = spark.createDataFrame(
        rows[:1], "id long, v string"
    ).schema.jsonValue()
    table = RelativeTable(cat.create_table(("ns",), "replay", schema_json))
    ckpt = tempfile.mkdtemp(prefix="replay_ckpt_")
    crashed = {"done": False}

    def sink(batch, epoch: int) -> None:
        key = _epoch_key(ckpt, epoch)
        if not table.seen_stream_epoch(key):
            table.append(batch, extra_summary={"stream-batch-id": key})
        if epoch == 1 and not crashed["done"]:
            crashed["done"] = True  # crash AFTER commit, once
            raise RuntimeError("injected post-commit crash")

    def run():
        return (
            spark.readStream.schema("id long, v string")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )

    q = run()
    with pytest.raises(Exception):
        q.processAllAvailable()
    q.stop()
    q2 = run()  # restart on the same checkpoint: epoch 1 replays
    q2.processAllAvailable()
    q2.stop()

    table.ops._should_refresh = True
    snaps = table.ops.current()["snapshots"]
    keys = [s["summary"].get("stream-batch-id") for s in snaps]
    assert len(snaps) == 3 and len(set(keys)) == 3, keys
    got = sorted(tuple(r) for r in table.read(spark).collect())
    assert got == sorted(rows)


def test_epoch_probe_survives_snapshot_expiry(spark):
    """Round-10 advice: seen_stream_epoch used to scan live snapshot
    summaries only, so expire_snapshots running between a sink crash
    and the epoch replay could expire the marker snapshot and let the
    replayed epoch double-commit. The epoch key now also lands in the
    stream.epoch.<ckpt> table property (same atomic commit), which
    survives expiry."""
    from iceberg_relative_io_spark.streaming.stream_queries import _epoch_key

    wh = tempfile.mkdtemp(prefix="exp_epoch_wh_")
    cat = FsCatalog(wh)
    cat.create_namespace(("ns",))
    schema_json = spark.createDataFrame(
        [(1, "a")], "id long, v string"
    ).schema.jsonValue()
    table = RelativeTable(cat.create_table(("ns",), "sink", schema_json))
    ckpt = "/tmp/some_checkpoint_dir"

    for epoch in range(3):
        key = _epoch_key(ckpt, epoch)
        assert not table.seen_stream_epoch(key)
        table.append(
            spark.createDataFrame([(epoch, "x")], "id long, v string"),
            extra_summary={"stream-batch-id": key},
        )
        assert table.seen_stream_epoch(key)

    # compaction (overwrite is NOT a chain op, so the chain walk from
    # the retained head stops at it) followed by aggressive GC: the
    # epoch marker snapshots are REMOVED from metadata outright, not
    # tombstoned — the summary scan alone would forget them
    table.overwrite(table.read(spark))
    table.expire_snapshots(keep_last=1)
    table.ops._should_refresh = True
    snaps = table.ops.current()["snapshots"]
    assert len(snaps) == 1 and "stream-batch-id" not in snaps[0]["summary"]
    for epoch in range(3):
        assert table.seen_stream_epoch(_epoch_key(ckpt, epoch))
    # and a later epoch on the same checkpoint is still unseen; a
    # DIFFERENT checkpoint's epoch 0 must not be swallowed either
    assert not table.seen_stream_epoch(_epoch_key(ckpt, 3))
    assert not table.seen_stream_epoch(_epoch_key("/tmp/other_ckpt", 0))
    # one bounded property per checkpoint, holding the max batch id
    props = table.properties()
    marks = {k: v for k, v in props.items() if k.startswith("stream.epoch.")}
    assert list(marks.values()) == ["2"], marks
