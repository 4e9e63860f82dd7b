"""Iceberg v2 export (catalog/iceberg_export.py) + Avro OCF
(catalog/avro_ocf.py).

No Iceberg client can be installed in this environment, so the gate is
(a) byte-level self-consistency of the Avro container (write -> read
round-trips arbitrary nested values under both codecs), and (b) an
independent spec-path reader (version-hint -> metadata.json -> avro
manifest list -> avro manifests -> parquet + identity-partition fill)
returning exactly the source table's rows. The metadata shape is
asserted against the reference example's key set (README.md:24-109).
"""

from __future__ import annotations

import json
import tempfile

import pytest
from pyspark.sql import functions as F

from iceberg_relative_io_spark.catalog import FsCatalog, RelativeTable
from iceberg_relative_io_spark.catalog import avro_ocf, iceberg_export
from iceberg_relative_io_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# avro container
# ---------------------------------------------------------------------------

NESTED_SCHEMA = {
    "type": "record",
    "name": "outer",
    "fields": [
        {"name": "id", "type": "long", "field-id": 1},
        {"name": "name", "type": ["null", "string"], "field-id": 2},
        {"name": "score", "type": "double"},
        {"name": "flag", "type": "boolean"},
        {"name": "raw", "type": "bytes"},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "props", "type": {"type": "map", "values": "long"}},
        {
            "name": "inner",
            "type": [
                "null",
                {
                    "type": "record",
                    "name": "inner_r",
                    "fields": [
                        {"name": "x", "type": "int"},
                        {"name": "y", "type": ["null", "double"]},
                    ],
                },
            ],
        },
    ],
}

RECORDS = [
    {
        "id": 1,
        "name": "alpha",
        "score": 1.5,
        "flag": True,
        "raw": b"\x00\x01\xff",
        "tags": ["a", "b"],
        "props": {"k1": 10, "k2": -3},
        "inner": {"x": 7, "y": 2.25},
    },
    {
        "id": -9007199254740993,  # beyond 2^53: varint must hold it
        "name": None,
        "score": -0.0,
        "flag": False,
        "raw": b"",
        "tags": [],
        "props": {},
        "inner": None,
    },
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_ocf_round_trip(codec):
    data = avro_ocf.write_ocf(
        NESTED_SCHEMA, RECORDS, codec=codec, metadata={"custom": "yes"}
    )
    schema, meta, out = avro_ocf.read_ocf(data)
    assert schema == NESTED_SCHEMA  # field-id attributes preserved
    assert meta["custom"] == "yes"
    assert meta["avro.codec"] == codec
    assert out == RECORDS


def test_ocf_zigzag_longs():
    sch = {"type": "record", "name": "r", "fields": [{"name": "v", "type": "long"}]}
    vals = [0, -1, 1, 63, 64, -64, -65, 2**62, -(2**62), 123456789012345]
    data = avro_ocf.write_ocf(sch, [{"v": v} for v in vals], codec="null")
    _, _, out = avro_ocf.read_ocf(data)
    assert [r["v"] for r in out] == vals


def test_ocf_rejects_garbage():
    with pytest.raises(ValueError):
        avro_ocf.read_ocf(b"PAR1 not avro")


# ---------------------------------------------------------------------------
# export round-trip
# ---------------------------------------------------------------------------

def _table(spark, df, partition_by=None):
    cat = FsCatalog(tempfile.mkdtemp(prefix="iceexp_wh_"))
    cat.create_namespace(("ns",))
    ops = cat.create_table(
        ("ns",), "t", df.schema.jsonValue(), partition_by=partition_by
    )
    t = RelativeTable(ops)
    t.append(df)
    return t


def _round_trip(spark, table):
    dest = tempfile.mkdtemp(prefix="iceexp_out_")
    info = iceberg_export.export_iceberg(table, dest)
    got = iceberg_export.read_iceberg(spark, dest)
    want = table.read(spark)
    assert sorted(map(tuple, got.select(*want.columns).collect())) == sorted(
        map(tuple, want.collect())
    )
    return dest, info


def test_export_unpartitioned(spark, sf_dir):
    nation = load_table(spark, sf_dir, "nation")
    table = _table(spark, nation)
    dest, info = _round_trip(spark, table)
    assert info["records"] == nation.count()
    doc = json.load(open(f"{dest}/metadata/v1.metadata.json"))
    # the reference example's key set (README.md:24-109)
    for key in (
        "format-version", "table-uuid", "location", "last-sequence-number",
        "last-updated-ms", "last-column-id", "current-schema-id", "schemas",
        "default-spec-id", "partition-specs", "last-partition-id",
        "default-sort-order-id", "sort-orders", "properties",
        "current-snapshot-id", "refs", "snapshots", "statistics",
        "partition-statistics", "snapshot-log", "metadata-log",
    ):
        assert key in doc, key
    assert doc["format-version"] == 2
    sch = doc["schemas"][0]
    assert sch["schema-id"] == 0
    ids = [f["id"] for f in sch["fields"]]
    assert len(set(ids)) == len(ids) and all(i >= 1 for i in ids)
    snap = doc["snapshots"][0]
    assert snap["snapshot-id"] == doc["current-snapshot-id"]
    assert doc["refs"]["main"]["snapshot-id"] == snap["snapshot-id"]
    # manifest list is a valid avro container with spec field names
    _, _, mls = avro_ocf.read_ocf(open(snap["manifest-list"], "rb").read())
    assert mls[0]["added_snapshot_id"] == snap["snapshot-id"]
    assert mls[0]["content"] == 0 and mls[0]["sequence_number"] == 1
    esch, emeta, entries = avro_ocf.read_ocf(
        open(mls[0]["manifest_path"], "rb").read()
    )
    assert emeta["format-version"] == "2" and emeta["content"] == "data"
    assert all(e["data_file"]["file_format"] == "PARQUET" for e in entries)
    assert sum(e["data_file"]["record_count"] for e in entries) == info["records"]
    # field-ids on the manifest schema per spec
    by_name = {f["name"]: f for f in esch["fields"]}
    assert by_name["status"]["field-id"] == 0
    assert by_name["data_file"]["field-id"] == 2


def test_export_identity_partitioned(spark, sf_dir):
    """Identity partition columns are absent from the data files (Spark
    partitionBy layout); the spec reader must restore them from the
    manifest partition struct."""
    nation = load_table(spark, sf_dir, "nation")
    table = _table(spark, nation, partition_by=["n_regionkey"])
    dest, _ = _round_trip(spark, table)
    doc = json.load(open(f"{dest}/metadata/v1.metadata.json"))
    pf = doc["partition-specs"][0]["fields"]
    assert pf[0]["transform"] == "identity" and pf[0]["field-id"] == 1000
    src_id = pf[0]["source-id"]
    assert any(f["id"] == src_id and f["name"] == "n_regionkey"
               for f in doc["schemas"][0]["fields"])


def test_export_day_transform(spark, sf_dir):
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "ts")
        .limit(500)
    )
    table = _table(spark, ev, partition_by=["day(ts)"])
    dest, _ = _round_trip(spark, table)
    doc = json.load(open(f"{dest}/metadata/v1.metadata.json"))
    assert doc["partition-specs"][0]["fields"][0]["transform"] == "day"
    snap = doc["snapshots"][0]
    _, _, mls = avro_ocf.read_ocf(open(snap["manifest-list"], "rb").read())
    _, _, entries = avro_ocf.read_ocf(open(mls[0]["manifest_path"], "rb").read())
    days = [e["data_file"]["partition"]["ts_day"] for e in entries]
    assert all(isinstance(d, int) and 10000 < d < 40000 for d in days)


def test_export_identity_on_date_and_timestamp(spark, sf_dir):
    """Identity partitions on temporal sources must export the spec's
    typed values — days since epoch (int) for date, micros since epoch
    (long) for timestamp — not the hive dir string (which would either
    crash int() or write a spec-violating string partition value)."""
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "ts")
        .withColumn("d", F.to_date("ts"))
        .withColumn("th", F.date_trunc("day", F.col("ts")))
        .limit(200)
    )
    # date identity
    table = _table(spark, ev.select("event_id", "ts", "d"), partition_by=["d"])
    dest, _ = _round_trip(spark, table)
    doc = json.load(open(f"{dest}/metadata/v1.metadata.json"))
    snap = doc["snapshots"][0]
    _, _, mls = avro_ocf.read_ocf(open(snap["manifest-list"], "rb").read())
    esch, _, entries = avro_ocf.read_ocf(open(mls[0]["manifest_path"], "rb").read())
    part_schema = next(
        f for f in esch["fields"][-1]["type"]["fields"] if f["name"] == "partition"
    )["type"]
    assert part_schema["fields"][0]["type"] == ["null", "int"]
    vals = [e["data_file"]["partition"]["d"] for e in entries]
    assert all(isinstance(v, int) and 10000 < v < 40000 for v in vals)
    # timestamp identity (day-truncated so the dir count stays sane)
    table = _table(spark, ev.select("event_id", "d", "th"), partition_by=["th"])
    dest, _ = _round_trip(spark, table)
    doc = json.load(open(f"{dest}/metadata/v1.metadata.json"))
    snap = doc["snapshots"][0]
    _, _, mls = avro_ocf.read_ocf(open(snap["manifest-list"], "rb").read())
    esch, _, entries = avro_ocf.read_ocf(open(mls[0]["manifest_path"], "rb").read())
    part_schema = next(
        f for f in esch["fields"][-1]["type"]["fields"] if f["name"] == "partition"
    )["type"]
    assert part_schema["fields"][0]["type"] == ["null", "long"]
    vals = [e["data_file"]["partition"]["th"] for e in entries]
    day_us = 86_400_000_000
    assert all(isinstance(v, int) and v % day_us == 0 for v in vals)


def test_export_drops_bucket_field(spark, sf_dir):
    """bucket[N] uses a non-Iceberg hash; exporting it as a partition
    field would let readers prune wrongly. It must be dropped from the
    exported spec while rows stay complete (source col is in files)."""
    region = load_table(spark, sf_dir, "region")
    table = _table(spark, region, partition_by=["bucket(2, r_regionkey)"])
    dest, _ = _round_trip(spark, table)
    doc = json.load(open(f"{dest}/metadata/v1.metadata.json"))
    assert doc["partition-specs"][0]["fields"] == []


def test_export_refuses_live_mor_deletes(spark, sf_dir):
    nation = load_table(spark, sf_dir, "nation")
    table = _table(spark, nation)
    table.delete_where_mor(spark, F.col("n_nationkey") == 3, ["n_nationkey"])
    with pytest.raises(ValueError, match="merge-on-read"):
        iceberg_export.export_iceberg(table, tempfile.mkdtemp())
    # after compaction the export must succeed and exclude the deleted row
    table.compact(spark)
    dest, _ = _round_trip(spark, table)
    got = iceberg_export.read_iceberg(spark, dest)
    assert got.filter(F.col("n_nationkey") == 3).count() == 0
    assert got.count() == nation.count() - 1
