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
  snapshot at planning time plus the table's ``last-sequence-number``.
  The SEQUENCE WATERMARK, not a log position, is what deduplicates
  work: every batch re-walks the surviving snapshot log (cheap —
  append entries at or below the watermark skip without IO) and plans
  only files in ``(start.max_seq, end.max_seq]``. A positional index
  would silently misalign when ``expire_snapshots_iceberg`` trims log
  entries; the watermark is immune to trimming, and a reaped anchor
  raises a LOUD "restart from a fresh checkpoint" error instead of
  silent loss WHEN data was actually lost: expiry is oldest-first and
  sequences never decrease child->parent, so every reaped sequence is
  at or below the oldest SURVIVING ancestor's — if that boundary is at
  or below the consumed watermark, the reaped history was already
  consumed (a caught-up tail whose anchor aged out) and the tail
  proceeds; above it, unconsumed content is gone and the error fires.
  Batch 1, whose start has no anchor, carries the oldest surviving
  ancestor observed at start as a ``first_sid`` witness (or a
  ``genesis`` marker on a snapshot-less table) with the same
  oldest-first argument.
  ``latestOffset`` advertises ``last-sequence-number`` (table-global,
  monotone through rollbacks — rollback_iceberg is metadata-only)
  rather than the head snapshot's own sequence, so the watermark NEVER
  regresses: a rollback followed by a fast-forward cannot re-emit rows
  consumed before the rollback. A fresh stream replays the SURVIVING
  log — history reaped before the stream started is not replayed
  (bootstrap with a batch read when the full table state is needed).
- Each in-window log entry is classified by its snapshot summary
  operation: ``append`` plans the snapshot's ADDED data files (entry
  status=1 AND entry snapshot-id = that snapshot — carried-forward
  manifests keep their old ADDED entries, so status alone
  over-selects); ``replace`` (rewrite_manifests / expire) is invisible
  — no row change; ``delete`` / ``overwrite`` RAISE unless the
  ``skip-deletes`` option is true, mirroring Iceberg's
  ``streaming-skip-delete/overwrite-snapshots`` contract (a plain
  append tail cannot represent row removal; use ``changelog_iceberg``
  for the net-diff shape).
- Rollback: only snapshots on the batch END's parent chain are
  consumable content. A rollback's log entry replays an old snapshot
  (skipped — at or below the watermark), appends AFTER the rollback
  flow at fresh higher sequences, and an append that was committed but
  rolled back before consumption NEVER emits (it is not reachable from
  any current table state); it re-emerges naturally if a later
  fast-forward makes it reachable again — unless the watermark already
  passed it, in which case exactly-once wins over completeness.

Transport is partition-planned (``DataSourceStreamReader``): the
driver plans ONE ``InputPartition`` per added data file from the
manifests (metadata-only IO) and executors open the parquet — no row
ever rides the driver, so a bulk tail scales with the cluster exactly
like a batch scan. Identity-partitioned mirrors stream too: identity
source values live in the manifest partition tuple, not the data
files (Iceberg spec — readers must fill identity partition columns
from the partition struct, same rule ``read_iceberg`` applies), so
each planned partition carries its decoded constants and the executor
re-attaches them; transform fields (bucket/day/…) keep their source
columns in the data files and need nothing.

Reference parity: the reference delegates streaming to Spark's Iceberg
connector (README.md:8-11); this is the PySpark-native analogue built
on the Python DataSource API.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field as dc_field
from datetime import date, datetime, timedelta

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructField, StructType

_EPOCH = date(1970, 1, 1)


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
    overwrite snapshots instead of raising);
    ``max-files-per-trigger`` (admission control: cap how many added
    data files a micro-batch may plan — Iceberg's
    ``streaming-max-files-per-micro-batch`` analogue; snapshot
    granularity, minimum one snapshot per trigger so progress is
    guaranteed even by an oversized commit)."""

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

    def streamReader(
        self, schema: StructType
    ) -> "IcebergMirrorStreamReader":
        return IcebergMirrorStreamReader(self.options, schema)


@dataclass
class MirrorFilePartition(InputPartition):
    file_path: str
    # identity partition constants for THIS file, decoded to python
    # values at planning time: [(current_column_name, value)]
    identity: list = dc_field(default_factory=list)
    # current name -> pre-rename aliases (schema.name-mapping.default)
    aliases: dict = dc_field(default_factory=dict)


class IcebergMirrorStreamReader(DataSourceStreamReader):
    def __init__(self, options, schema: StructType):
        self.path = options["path"]
        self.skip_deletes = (
            str(options.get("skip-deletes", "false")).lower() == "true"
        )
        cap = options.get("max-files-per-trigger")
        self.max_files = int(cap) if cap is not None else None
        if self.max_files is not None and self.max_files < 1:
            raise ValueError("max-files-per-trigger must be >= 1")
        # admission-control base: the highest sequence watermark this
        # reader has advertised or planned. Self-tracked because the
        # Python DataSource API passes no start offset to latestOffset
        # AND the engine's first latestOffset call precedes both
        # initialOffset and partitions — so the first planned window
        # after reader construction (fresh backfill or post-restart
        # catch-up) is uncapped; every window after the engine teaches
        # the base honors the cap. Monotone by construction (sequence
        # numbers never regress — see latestOffset's watermark note).
        # ADR (round 9, shared with RelativeStreamReader — see its
        # class docstring for the full derivation): capping the first
        # window against the only base a baseless reader has (genesis)
        # is NOT restart-safe — a clean restart at checkpoint C would
        # advertise a genesis-capped G < C, the offset log would adopt
        # G, and the next capped window (G, H<C] would re-plan
        # sequences consumed before the restart: duplicate emission.
        # Uncapped-to-head is the only first answer that can never sit
        # behind a checkpoint, so the cold-start window stays uncapped.
        self._pos_seq: int | None = None
        self.schema = schema

    def initialOffset(self) -> dict:
        self._pos_seq = max(self._pos_seq or 0, 0)
        # a fresh stream has no consumed-snapshot anchor yet, so the
        # expiry guard needs a different witness: record the OLDEST
        # surviving ancestor observed at start. If expiry later reaps
        # it while batch 1 is still uncommitted, the replay raises the
        # documented restart error instead of silently planning a
        # window whose trimmed log entries no longer exist (expiry is
        # oldest-first, so any in-window reap implies this witness was
        # reaped too — same argument as the consumed anchor).
        doc = _doc(self.path)
        by_id = {s["snapshot-id"]: s for s in doc["snapshots"]}
        walk, oldest = doc.get("current-snapshot-id"), None
        while walk is not None and walk in by_id:
            oldest = walk
            walk = by_id[walk].get("parent-snapshot-id")
        off = {"last_sid": None, "max_seq": 0}
        if oldest is not None:
            off["first_sid"] = oldest
        else:
            # empty mirror: there is no snapshot to witness, but the
            # stream still "saw genesis" — batch 1's replay must find an
            # UNBROKEN chain back to a null-parent genesis snapshot
            # (expiry keeps the boundary's dangling parent pointer, so a
            # trimmed chain is detectable)
            off["genesis"] = True
        return off

    def latestOffset(self) -> dict:
        doc = _doc(self.path)
        head = doc.get("current-snapshot-id")
        if head is None:
            return {"last_sid": None, "max_seq": 0}
        if self.max_files is not None and self._pos_seq is not None:
            capped = self._capped_offset(doc, head)
            if capped is not None:
                self._pos_seq = max(self._pos_seq, capped["max_seq"])
                return capped
        # last-sequence-number, NOT the head snapshot's own sequence:
        # global and monotone through metadata-only rollbacks, so the
        # watermark never regresses (see module docstring)
        self._pos_seq = max(self._pos_seq or 0, doc["last-sequence-number"])
        return {"last_sid": head, "max_seq": doc["last-sequence-number"]}

    def _capped_offset(self, doc: dict, head: int) -> dict | None:
        """Advance the sequence watermark along the head's ancestry only
        while the cumulative ``added-data-files`` of in-window APPEND
        snapshots fits ``max_files``. The watermark advances
        SEQUENCE-BY-SEQUENCE, never between snapshots sharing a
        sequence (rewrite_manifests commits a replace at the sequence
        it rewrote — a per-snapshot split there is unrepresentable by a
        sequence offset); non-append snapshots cost zero files
        (``partitions`` governs their semantics). Returns None when the
        whole backlog fits (caller advertises the global
        last-sequence-number so the uncapped invariants hold)."""
        by_id = {s["snapshot-id"]: s for s in doc["snapshots"]}
        chain: list[dict] = []  # head-first ancestry above the base
        walk: int | None = head
        while walk is not None:
            snap = by_id.get(walk)
            if snap is None:
                break
            if (snap.get("sequence-number") or 0) > self._pos_seq:
                chain.append(snap)
            walk = snap.get("parent-snapshot-id")
        cost: dict[int, int] = {}  # sequence -> added data files
        for snap in chain:
            seq = snap.get("sequence-number") or 0
            summ = snap.get("summary", {})
            if summ.get("operation", "append") != "append":
                n = 0
            elif summ.get("added-data-files") is not None:
                n = int(summ["added-data-files"])
            else:
                # pre-added-data-files export era records only totals.
                # Totals are cumulative, so the added count is the delta
                # vs the parent's total (first snapshot: parent absent,
                # delta == own total). A raw-total fallback would
                # over-cost every later snapshot cumulatively and
                # degrade catch-up to one snapshot per trigger.
                parent_id = snap.get("parent-snapshot-id")
                parent = by_id.get(parent_id)
                own = summ.get("total-data-files")
                if parent_id is None:
                    ptot = 0  # genuine first snapshot: delta == own total
                elif parent is None:
                    # parent EXPIRED out of the snapshot list: the delta
                    # is unknowable, not equal to the cumulative total —
                    # costing it at own-ptot(=0) would charge the whole
                    # table history to this snapshot and degrade that
                    # window's catch-up to one snapshot per trigger
                    # (round-10 advice). Use the same floor as the
                    # totals-absent branch.
                    ptot = None
                else:
                    ptot = (parent.get("summary", {}) or {}).get(
                        "total-data-files"
                    )
                n = (
                    max(1, int(own) - int(ptot))
                    if own is not None and ptot is not None
                    else 1  # conservative floor when totals are absent
                )
            cost[seq] = cost.get(seq, 0) + n
        budget = self.max_files
        capped_seq: int | None = None
        for seq in sorted(cost):
            if capped_seq is not None and cost[seq] > budget:
                # anchor at the highest-ancestry snapshot at or below
                # the watermark (ties resolve toward the head, so the
                # anchor's parent walk covers every taken snapshot)
                sid = next(
                    s["snapshot-id"]
                    for s in chain
                    if (s.get("sequence-number") or 0) <= capped_seq
                )
                return {"last_sid": sid, "max_seq": capped_seq}
            capped_seq = seq
            budget -= cost[seq]
        return None  # whole backlog fits this trigger

    def partitions(self, start: dict, end: dict):
        self._pos_seq = max(self._pos_seq or 0, end.get("max_seq") or 0)
        doc = _doc(self.path)
        by_id = {s["snapshot-id"]: s for s in doc["snapshots"]}
        anchor = start.get("last_sid")
        if anchor is not None and anchor not in by_id:
            # a reaped anchor is only DATA LOSS if something unconsumed
            # was reaped with it. Expiry is oldest-first along the
            # ancestry and sequences never decrease child->parent, so
            # every reaped sequence <= the oldest SURVIVING ancestor's
            # sequence: if that boundary is at or below the consumed
            # watermark (a caught-up tail whose old anchor aged out —
            # found by tools/fuzz_stream.py), everything reaped was
            # already consumed and the tail proceeds; otherwise raise.
            boundary_seq, dangling = None, False
            walk = end.get("last_sid")
            while walk is not None and walk in by_id:
                snap = by_id[walk]
                boundary_seq = snap.get("sequence-number") or 0
                parent = snap.get("parent-snapshot-id")
                dangling = parent is not None and parent not in by_id
                walk = parent
            if dangling and (
                boundary_seq is None
                or boundary_seq > (start.get("max_seq") or 0)
            ):
                raise ValueError(
                    f"stream offset anchored at expired snapshot {anchor}: "
                    "the tail fell behind expire_snapshots_iceberg — "
                    "restart the stream from a fresh checkpoint (a batch "
                    "read bootstraps the current state)"
                )
        # fresh-stream replay guard: batch 1's start carries the oldest
        # surviving ancestor observed at initialOffset time; if expiry
        # reaped it while the batch was uncommitted, the window's
        # trimmed log entries are unplannable — raise, never silence
        witness = start.get("first_sid")
        if anchor is None and witness is not None and witness not in by_id:
            raise ValueError(
                f"first batch replay needs expired snapshot {witness}: "
                "expire_snapshots_iceberg reaped history under the "
                "uncommitted initial batch — restart the stream from a "
                "fresh checkpoint (a batch read bootstraps the current "
                "state)"
            )
        if (
            anchor is None
            and start.get("genesis")
            and end.get("last_sid") in by_id
        ):
            # the stream started on an EMPTY mirror, so batch 1 owns the
            # full history: its end's ancestry must reach a null-parent
            # genesis snapshot. Expiry keeps the boundary's dangling
            # parent pointer, so a trimmed chain is detectable — raise,
            # never silently plan a partial window.
            walk = end["last_sid"]
            while True:
                parent = by_id[walk].get("parent-snapshot-id")
                if parent is None:
                    break  # unbroken chain to genesis
                if parent not in by_id:
                    raise ValueError(
                        f"first batch replay needs expired snapshot "
                        f"{parent}: expire_snapshots_iceberg reaped "
                        "history under the uncommitted initial batch — "
                        "restart the stream from a fresh checkpoint (a "
                        "batch read bootstraps the current state)"
                    )
                walk = parent
        head = end.get("last_sid")
        if head is None:
            return []
        if head not in by_id:
            raise ValueError(
                f"batch replay needs expired snapshot {head}: "
                "expire_snapshots_iceberg reaped history under an "
                "uncommitted batch — restart the stream from a fresh "
                "checkpoint"
            )
        lo, hi = start["max_seq"], end["max_seq"]
        if hi <= lo:
            return []

        # head ancestry OF THE BATCH END (not the live table head, so
        # replays stay deterministic while the table advances): a
        # metadata-only rollback leaves abandoned snapshots (and their
        # log entries) in place, but their rows are NOT table content —
        # emitting them would hand the sink data no reader of any
        # current state can see.
        ancestry: set = set()
        walk = head
        while walk is not None:
            ancestry.add(walk)
            walk = by_id.get(walk, {}).get("parent-snapshot-id")

        identity, aliases_of = self._schema_maps(doc)
        from iceberg_relative_io_spark.catalog import avro_ocf

        parts: list[MirrorFilePartition] = []
        for entry in doc.get("snapshot-log", []):
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
            if snap_seq <= lo or snap_seq > hi:
                # sequence watermark: already-consumed snapshots
                # (including log entries REPLAYED by a rollback) skip
                # without any IO — an append's added files all carry
                # its own sequence
                continue
            if op in ("delete", "overwrite"):
                if self.skip_deletes:
                    continue
                raise ValueError(
                    f"snapshot {sid} is a {op!r} — an append tail cannot "
                    "represent row removal. Pass option "
                    "skip-deletes=true to pass over it (Iceberg's "
                    "streaming-skip-delete-snapshots contract), or "
                    "consume changelog_iceberg for the net-diff shape"
                )
            with open(snap["manifest-list"], "rb") as fh:
                _, _, manifests = avro_ocf.read_ocf(fh.read())
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
                        or e["sequence_number"] <= lo
                        or e["sequence_number"] > hi
                    ):
                        continue
                    parts.append(
                        MirrorFilePartition(
                            rec["file_path"],
                            [
                                (name, _decode_identity(
                                    rec.get("partition", {}).get(pf_name),
                                    tname,
                                ))
                                for pf_name, name, tname in identity
                            ],
                            aliases_of,
                        )
                    )
        return parts

    def _schema_maps(self, doc: dict):
        """Planning-time schema reconciliation: identity partition
        fields as (spec_field_name, current_source_name, type) and the
        rename-alias map (schema.name-mapping.default), both under the
        CURRENT schema — recomputed every batch so mid-stream
        evolve_schema_iceberg is honored for new files."""
        cur_schema = next(
            s for s in doc["schemas"]
            if s["schema-id"] == doc["current-schema-id"]
        )
        fields_by_id = {f["id"]: f for f in cur_schema["fields"]}
        spec = next(
            p for p in doc["partition-specs"]
            if p["spec-id"] == doc["default-spec-id"]
        )
        identity = [
            (
                pf["name"],
                fields_by_id[pf["source-id"]]["name"],
                fields_by_id[pf["source-id"]]["type"]
                if isinstance(fields_by_id[pf["source-id"]]["type"], str)
                else "string",
            )
            for pf in spec["fields"]
            if pf["transform"] == "identity"
            and pf["source-id"] in fields_by_id
        ]
        try:
            mapping = json.loads(
                doc.get("properties", {}).get(
                    "schema.name-mapping.default", "[]"
                )
            )
        except ValueError:
            mapping = []
        id_to_current = {f["id"]: f["name"] for f in cur_schema["fields"]}
        aliases_of: dict[str, list[str]] = {}
        for m in mapping:
            cur = id_to_current.get(m.get("field-id"))
            if cur is None:
                continue
            for a in m.get("names", []):
                if a != cur:
                    aliases_of.setdefault(cur, []).append(a)
        return identity, aliases_of

    def read(self, partition: MirrorFilePartition):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_schema

        target = to_arrow_schema(self.schema)
        tbl = pq.read_table(partition.file_path)
        ident = dict(partition.identity)
        cols = []
        for f in target:
            phys = f.name if f.name in tbl.column_names else next(
                (
                    a
                    for a in partition.aliases.get(f.name, [])
                    if a in tbl.column_names
                ),
                None,
            )
            if phys is not None:
                cols.append(tbl.column(phys).cast(f.type))
            elif f.name in ident:
                # identity partition column absent from the data file:
                # restore as a constant from the manifest tuple (spec
                # rule), decoded at planning time
                v = ident[f.name]
                if v is None:
                    cols.append(pa.nulls(len(tbl), f.type))
                else:
                    cols.append(pa.array([v] * len(tbl)).cast(f.type))
            else:
                # column added after this file was written
                cols.append(pa.nulls(len(tbl), f.type))
        out = pa.table(dict(zip(target.names, cols))).cast(target)
        yield from out.to_batches()

    def commit(self, end: dict) -> None:
        self._pos_seq = max(self._pos_seq or 0, end.get("max_seq") or 0)

    def stop(self) -> None:
        pass


def _decode_identity(raw, tname: str):
    """Spec partition-tuple encodings -> python values (the same
    decode read_iceberg applies): date = days since epoch, timestamp =
    micros since epoch; everything else rides as written."""
    if raw is None:
        return None
    if tname == "date":
        return date.fromordinal(_EPOCH.toordinal() + int(raw))
    if tname in ("timestamp", "timestamptz"):
        return datetime(1970, 1, 1) + timedelta(microseconds=int(raw))
    return raw
