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
