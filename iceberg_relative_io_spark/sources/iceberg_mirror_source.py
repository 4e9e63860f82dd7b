"""Structured-Streaming SOURCE over an exported Iceberg v2 mirror.

The mirror DML plane (catalog/iceberg_export.py) lets this engine and
external writers commit appends/deletes/updates to an exported table;
this module closes the CDC loop by letting Spark *tail* that table as
a stream — the consumption half of the story whose production half is
the ``b30_stream_to_iceberg`` sink:

    spark.dataSource.register(IcebergMirrorDataSource)
    spark.readStream.format("iceberg_mirror").option("path", dir).load()

Semantics follow Iceberg's own streaming read (incremental APPEND
scan):

- The stream offset is ``{"last_sid": S, "max_seq": M}`` — the head
  snapshot at the last read plus the highest data sequence number
  consumed. The SEQUENCE WATERMARK, not a log position, is what
  deduplicates work: every batch re-walks the surviving snapshot log
  (cheap — append entries at or below the watermark skip without IO)
  and emits only files above it. A positional index would silently
  misalign when ``expire_snapshots_iceberg`` trims log entries; the
  watermark is immune to trimming, and the anchor turns a reaped
  anchor snapshot into a LOUD "restart from a fresh checkpoint" error
  instead of silent loss. A fresh stream replays the SURVIVING log —
  history reaped before the stream started is not replayed (bootstrap
  with a batch read when the full table state is needed).
- Each new log entry is classified by its snapshot summary operation:
  ``append`` emits the snapshot's ADDED data files (entry status=1 AND
  entry snapshot-id = that snapshot — carried-forward manifests keep
  their old ADDED entries, so status alone over-selects);
  ``replace`` (rewrite_manifests / expire) is invisible — no row
  change; ``delete`` / ``overwrite`` RAISE unless the
  ``skip-deletes`` option is true, mirroring Iceberg's
  ``streaming-skip-delete/overwrite-snapshots`` contract (a plain
  append tail cannot represent row removal; use
  ``changelog_iceberg`` for the net-diff shape).
- Rollback: only snapshots on the CURRENT head's parent chain are
  consumable content. A rollback's log entry replays an old snapshot
  (skipped — at or below the watermark), appends AFTER the rollback
  flow at fresh higher sequences, and an append that was committed but
  rolled back before consumption NEVER emits (it is not reachable from
  any current table state); it re-emerges naturally if a later
  fast-forward makes it reachable again. Rows consumed before a
  rollback cannot be retracted — an append tail has no delete shape
  (use ``changelog_iceberg`` for net diffs).

Like the native-format stream reader (relative_datasource.py), rows
ride the driver through ``SimpleDataSourceStreamReader`` — ample for a
tailing control/CDC stream; a partition-planning
``DataSourceStreamReader`` (one input partition per added file) is the
drop-in upgrade for bulk tails. Partition-spec'd mirrors are refused
for the same reason as the native source: identity values live in the
manifest tuple, not the data files.

Reference parity: the reference delegates streaming to Spark's Iceberg
connector (README.md:8-11); this is the PySpark-native analogue built
on the Python DataSource API.
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import StructField, StructType


def _doc(path: str) -> dict:
    from iceberg_relative_io_spark.catalog import iceberg_export as ie

    return ie._load_metadata(path)


def _spark_type(iceberg_type):
    from iceberg_relative_io_spark.catalog import iceberg_export as ie
    from pyspark.sql import types as T

    # parametrized types (decimal(p,s)) included — a bare dict lookup
    # would degrade them to string in the stream schema
    return ie._spark_type_of(iceberg_type, default=T.StringType())


class IcebergMirrorDataSource(DataSource):
    """``format("iceberg_mirror")`` — streaming source over an exported
    Iceberg v2 table directory. Options: ``path`` (the table dir,
    required); ``skip-deletes`` ("true" to silently pass delete /
    overwrite snapshots instead of raising)."""

    @classmethod
    def name(cls) -> str:
        return "iceberg_mirror"

    def schema(self) -> StructType:
        doc = _doc(self.options["path"])
        schema = next(
            s for s in doc["schemas"]
            if s["schema-id"] == doc["current-schema-id"]
        )
        return StructType(
            [
                StructField(
                    f["name"], _spark_type(f["type"]), not f["required"]
                )
                for f in schema["fields"]
            ]
        )

    def simpleStreamReader(
        self, schema: StructType
    ) -> "IcebergMirrorStreamReader":
        return IcebergMirrorStreamReader(self.options, schema)


class IcebergMirrorStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options, schema: StructType):
        self.path = options["path"]
        self.skip_deletes = (
            str(options.get("skip-deletes", "false")).lower() == "true"
        )
        self.schema = schema
        doc = _doc(self.path)
        spec = next(
            p
            for p in doc["partition-specs"]
            if p["spec-id"] == doc["default-spec-id"]
        )
        if spec["fields"]:
            raise ValueError(
                "streaming a partition-spec'd mirror is not supported: "
                "identity partition values live in the manifest tuple, "
                "not the data files (same contract as the native-format "
                "stream source)"
            )

    def initialOffset(self) -> dict:
        return {"last_sid": None, "max_seq": 0}

    def read(self, start: dict):
        doc = _doc(self.path)
        head = doc.get("current-snapshot-id")
        if head is None or head == start.get("last_sid"):
            return iter([]), start
        rows, max_seq, first_sid = self._collect(doc, start)
        return iter(rows), {
            "last_sid": head,
            "max_seq": max_seq,
            # the oldest snapshot this batch consumed: replay needs it
            # (and, expiry being oldest-first, everything newer) alive
            "first_sid": first_sid,
        }

    def readBetweenOffsets(self, start: dict, end: dict):
        doc = _doc(self.path)
        need = end.get("first_sid")
        if need is not None and not any(
            s["snapshot-id"] == need for s in doc["snapshots"]
        ):
            raise ValueError(
                f"batch replay needs expired snapshot {need}: "
                "expire_snapshots_iceberg reaped history under an "
                "uncommitted batch — restart the stream from a fresh "
                "checkpoint"
            )
        rows, _, _ = self._collect(doc, start, stop_seq=end["max_seq"])
        return iter(rows)

    def _collect(
        self, doc: dict, start: dict, stop_seq: int | None = None
    ) -> tuple[list, int, int | None]:
        # list-backed, not a generator: Spark pickles the batch for its
        # prefetch/replay cache (same constraint as the native reader)
        import pyarrow.parquet as pq

        from iceberg_relative_io_spark.catalog import avro_ocf

        by_id = {s["snapshot-id"]: s for s in doc["snapshots"]}
        max_seq = start["max_seq"]
        anchor = start.get("last_sid")
        if anchor is not None and anchor not in by_id:
            raise ValueError(
                f"stream offset anchored at expired snapshot {anchor}: "
                "the tail fell behind expire_snapshots_iceberg — "
                "restart the stream from a fresh checkpoint (a batch "
                "read bootstraps the current state)"
            )
        log = doc.get("snapshot-log", [])
        names = [f.name for f in self.schema.fields]
        # renamed columns: physical (old) name in pre-rename files ->
        # current name, via schema.name-mapping.default (the same
        # mechanism the batch reader uses)
        try:
            mapping = json.loads(
                doc.get("properties", {}).get(
                    "schema.name-mapping.default", "[]"
                )
            )
        except ValueError:
            mapping = []
        cur_schema = next(
            s for s in doc["schemas"]
            if s["schema-id"] == doc["current-schema-id"]
        )
        id_to_current = {f["id"]: f["name"] for f in cur_schema["fields"]}
        aliases_of: dict[str, list[str]] = {}
        for m in mapping:
            cur = id_to_current.get(m.get("field-id"))
            if cur is None:
                continue
            for a in m.get("names", []):
                if a != cur:
                    aliases_of.setdefault(cur, []).append(a)

        # head ancestry: a metadata-only rollback leaves the abandoned
        # snapshots (and their log entries) in place, but their rows are
        # NOT table content — emitting them would hand the sink data no
        # reader of any current state can see. Only snapshots on the
        # current head's parent chain are consumable; an abandoned
        # append whose sequence stays above the watermark re-emerges
        # naturally if a later fast-forward makes it reachable again.
        ancestry: set = set()
        walk = doc.get("current-snapshot-id")
        while walk is not None:
            ancestry.add(walk)
            walk = by_id.get(walk, {}).get("parent-snapshot-id")

        first_sid: int | None = None
        rows: list[tuple] = []
        for entry in log:
            sid = entry["snapshot-id"]
            snap = by_id.get(sid)
            if snap is None:
                # expiry trims log entries with their snapshots; a
                # dangling entry means external tampering — loud stop
                raise ValueError(
                    f"snapshot-log entry {sid} has no snapshot record"
                )
            if sid not in ancestry:
                continue  # rolled-back branch of history: not content
            snap_seq = snap.get("sequence-number") or 0
            op = snap.get("summary", {}).get("operation", "append")
            if op == "replace":
                continue  # rewrite/expire: no visible row change
            if op in ("delete", "overwrite"):
                if (
                    snap_seq <= max_seq
                    or (stop_seq is not None and snap_seq > stop_seq)
                    or self.skip_deletes
                ):
                    continue
                raise ValueError(
                    f"snapshot {sid} is a {op!r} — an append tail cannot "
                    "represent row removal. Pass option "
                    "skip-deletes=true to pass over it (Iceberg's "
                    "streaming-skip-delete-snapshots contract), or "
                    "consume changelog_iceberg for the net-diff shape"
                )
            # sequence watermark: already-consumed appends (including
            # log entries REPLAYED by a rollback) skip without any IO —
            # an append's added files all carry its own sequence
            if snap_seq <= max_seq or (
                stop_seq is not None and snap_seq > stop_seq
            ):
                continue
            if first_sid is None:
                first_sid = sid  # log order: the batch's oldest consumed
            with open(snap["manifest-list"], "rb") as fh:
                _, _, manifests = avro_ocf.read_ocf(fh.read())
            seen_max = max_seq
            for mf in manifests:
                if mf.get("content") == 1:
                    continue  # delete manifests carry no appended rows
                with open(mf["manifest_path"], "rb") as fh:
                    _, _, entries = avro_ocf.read_ocf(fh.read())
                for e in entries:
                    rec = e["data_file"]
                    if (
                        e["status"] != 1  # ADDED in this snapshot only
                        or e.get("snapshot_id") not in (None, sid)
                        or rec["content"] != 0
                        or e["sequence_number"] <= max_seq
                        or (
                            stop_seq is not None
                            and e["sequence_number"] > stop_seq
                        )
                    ):
                        continue
                    seen_max = max(seen_max, e["sequence_number"])
                    data = pq.read_table(rec["file_path"]).to_pylist()
                    for r in data:
                        rows.append(
                            tuple(self._value(r, n, aliases_of) for n in names)
                        )
            max_seq = max(seen_max, snap_seq)
        return rows, max_seq, first_sid

    @staticmethod
    def _value(row: dict, name: str, aliases_of: dict):
        if name in row:
            return row[name]
        for a in aliases_of.get(name, []):
            if a in row:
                return row[a]
        return None  # column added after this file was written
