#!/usr/bin/env python3
"""Randomized mirror-tail fuzz: exactly-once under arbitrary histories.

The round-8 stream transport (partition-planning reader + sequence
watermark + max-files-per-trigger admission control) is driven the way
the engine drives it — latestOffset -> partitions(start, end) -> per-
file reads -> commit — against a mirror mutated by a random interleave
of multi-file appends, manifest rewrites, metadata-only rollbacks, and
expiry (expiry only when the tail is caught up; the reaped-under-lag
RAISE paths are pinned deterministically in
tests/test_datasource.py). Between mutations the
tail advances a random number of batches, so it is routinely BEHIND a
multi-snapshot backlog when it catches up — the admission-control
window arithmetic (sequence grouping, replace-at-same-sequence ties,
oversized-commit floor) is exercised at every lag depth.

Invariants checked per seed:
- NO ROW EMITS TWICE, ever (exactly-once across every interleave,
  including a rollback later re-flowed past by fresh appends);
- no PHANTOM rows (everything consumed was appended);
- after the final catch-up, every append snapshot reachable from the
  FINAL head's ancestry has been consumed (nothing lost across
  rewrites/rollbacks/expiry; a rolled-back append the watermark never
  reached legitimately never emits — exactly-once beats completeness,
  the documented trade);
- with a cap set, every batch stays within the cap unless a single
  sequence exceeds it (the >=1-sequence progress floor is the only
  legal overshoot).

Round 9 adds ``--sinks``: kill/restart fuzz of the foreachBatch sinks
(the b30_stream_to_table / b30_stream_to_iceberg /
b31_stream_upsert_to_table shapes). Each seed drives a
maxFilesPerTrigger=1 file stream through a sink that CRASHES at random
epochs — randomly before or after its table commit (the
after-commit-before-commit-log window is the replay hazard) — then
restarts the query on the same checkpoint until the stream drains.
Invariants: every source row lands exactly once, one sink snapshot per
distinct epoch (replays commit nothing), and every snapshot's
stream-batch-id is distinct.

Usage: python tools/fuzz_stream.py [n_seeds] [n_ops] [--sinks]
"""

from __future__ import annotations

import random
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def run_seed(spark, seed: int, n_ops: int) -> None:
    from iceberg_relative_io_spark.catalog import (
        FsCatalog,
        RelativeTable,
        iceberg_export,
    )
    from iceberg_relative_io_spark.sources.iceberg_mirror_source import (
        IcebergMirrorStreamReader,
    )

    rng = random.Random(seed)
    wh = tempfile.mkdtemp(prefix=f"fs_wh_{seed}_")
    cat = FsCatalog(wh)
    cat.create_namespace(("ns",))
    df0 = spark.createDataFrame([(0, "seed")], "id long, v string")
    ops = cat.create_table(("ns",), "t", df0.schema.jsonValue())
    table = RelativeTable(ops)
    table.append(df0)
    dest = tempfile.mkdtemp(prefix=f"fs_{seed}_")
    iceberg_export.export_iceberg(table, dest)

    cap = rng.choice([None, 1, 2, 3])
    opts = {"path": dest}
    if cap is not None:
        opts["max-files-per-trigger"] = str(cap)
    r = IcebergMirrorStreamReader(opts, df0.schema)
    pos = r.initialOffset()

    appended: set[tuple] = {(0, "seed")}
    rows_of_snapshot: dict[int, set] = {}  # append sid -> its rows
    consumed: list[tuple] = []
    next_id = 1

    def current_seqs():
        from iceberg_relative_io_spark.sources.iceberg_mirror_source import _doc

        doc = _doc(dest)
        out = {}
        by_id = {s["snapshot-id"]: s for s in doc["snapshots"]}
        walk = doc.get("current-snapshot-id")
        while walk is not None and walk in by_id:
            s = by_id[walk]
            if s.get("summary", {}).get("operation", "append") == "append":
                out[s.get("sequence-number") or 0] = int(
                    s.get("summary", {}).get("added-data-files")
                    or s.get("summary", {}).get("total-data-files")
                    or 1
                )
            walk = s.get("parent-snapshot-id")
        return out

    def advance(max_batches: int) -> int:
        """Drive up to max_batches engine-shaped micro-batches."""
        nonlocal pos
        n = 0
        while n < max_batches:
            end = r.latestOffset()
            if end == pos:
                break
            parts = r.partitions(pos, end)
            if cap is not None and parts:
                # the legal overshoot is ONE oversized sequence inside
                # this window (the >=1-sequence progress floor)
                win = {
                    q: f
                    for q, f in current_seqs().items()
                    if (pos.get("max_seq") or 0) < q <= (end.get("max_seq") or 0)
                }
                biggest_seq = max(win.values(), default=1)
                assert len(parts) <= max(cap, biggest_seq), (
                    f"seed {seed}: batch of {len(parts)} files exceeds "
                    f"cap {cap} and the largest single in-window "
                    f"sequence {biggest_seq}"
                )
            names = [f.name for f in r.schema.fields]
            for p in parts:
                for b in r.read(p):
                    for row in zip(*[b.column(c).to_pylist() for c in names]):
                        consumed.append(tuple(row))
            r.commit(end)
            pos = end
            n += 1
        return n

    def caught_up() -> bool:
        # NON-MUTATING: probing via r.latestOffset() would advance the
        # reader's self-tracked admission base without a batch being
        # planned (the engine always turns a latestOffset result into a
        # batch end, so the base never runs ahead of planning there)
        from iceberg_relative_io_spark.sources.iceberg_mirror_source import _doc

        doc = _doc(dest)
        head = doc.get("current-snapshot-id")
        if head is None:
            return True
        return (pos.get("max_seq") or 0) >= doc["last-sequence-number"]

    advance(10)  # consume the export era
    for _ in range(n_ops):
        op = rng.random()
        if op < 0.6:  # append 1-3 files
            nfiles = rng.randrange(1, 4)
            rows = [
                (next_id + i, f"s{seed}v{next_id + i}")
                for i in range(rng.randrange(1, 5))
            ]
            next_id += len(rows)
            appended.update(rows)
            iceberg_export.append_iceberg(
                spark,
                dest,
                spark.createDataFrame(rows, "id long, v string").repartition(
                    nfiles
                ),
            )
            from iceberg_relative_io_spark.sources.iceberg_mirror_source import _doc

            rows_of_snapshot[_doc(dest)["current-snapshot-id"]] = set(rows)
        elif op < 0.7:
            iceberg_export.rewrite_manifests_iceberg(dest)
        elif op < 0.8:
            # metadata-only rollback to a random retained ancestor of
            # the head (skip when there is no strict ancestor)
            from iceberg_relative_io_spark.sources.iceberg_mirror_source import _doc

            doc = _doc(dest)
            by_id = {x["snapshot-id"]: x for x in doc["snapshots"]}
            walk = by_id.get(doc.get("current-snapshot-id"), {}).get(
                "parent-snapshot-id"
            )
            ancestors = []
            while walk is not None and walk in by_id:
                ancestors.append(walk)
                walk = by_id[walk].get("parent-snapshot-id")
            if ancestors:
                iceberg_export.rollback_iceberg(dest, rng.choice(ancestors))
        elif op < 0.9:
            # expiry only when caught up (the lagging-tail raise paths
            # are deterministic tests); keep >= 1 snapshot
            if caught_up():
                iceberg_export.expire_snapshots_iceberg(
                    dest, keep_last=rng.randrange(1, 4)
                )
        advance(rng.randrange(0, 3))  # sometimes lag behind

    while advance(50):  # final catch-up
        pass
    assert len(consumed) == len(set(consumed)), (
        f"seed {seed}: duplicate emission — "
        f"{len(consumed) - len(set(consumed))} rows repeated"
    )
    got = set(consumed)
    assert got <= appended, (
        f"seed {seed}: phantom rows {sorted(got - appended)[:5]}"
    )
    # completeness over the FINAL head's ancestry: every reachable
    # append snapshot's rows must be present (rolled-back appends the
    # watermark never reached are legitimately absent)
    from iceberg_relative_io_spark.sources.iceberg_mirror_source import _doc

    doc = _doc(dest)
    by_id = {x["snapshot-id"]: x for x in doc["snapshots"]}
    walk = doc.get("current-snapshot-id")
    while walk is not None and walk in by_id:
        need = rows_of_snapshot.get(walk)
        if need is not None:
            missing = need - got
            assert not missing, (
                f"seed {seed}: snapshot {walk} on the final ancestry "
                f"lost rows {sorted(missing)[:5]}"
            )
        walk = by_id[walk].get("parent-snapshot-id")


def run_sink_seed(spark, seed: int, kind: str) -> None:
    """One kill/restart fuzz run of a foreachBatch sink shape."""
    from iceberg_relative_io_spark.catalog import (
        FsCatalog,
        RelativeTable,
        iceberg_export,
    )
    from iceberg_relative_io_spark.streaming.stream_queries import _epoch_key

    rng = random.Random(10_000 + seed)
    n_files = rng.randrange(4, 8)
    rows = [(i, f"s{seed}r{i}") for i in range(n_files * 3)]
    src = tempfile.mkdtemp(prefix=f"sinkfuzz_src_{seed}_")
    for f in range(n_files):  # one parquet file per future epoch
        chunk = rows[f * 3 : (f + 1) * 3]
        spark.createDataFrame(chunk, "id long, v string").coalesce(
            1
        ).write.mode("append").parquet(src)

    wh = tempfile.mkdtemp(prefix=f"sinkfuzz_wh_{seed}_")
    cat = FsCatalog(wh)
    cat.create_namespace(("ns",))
    schema_json = spark.createDataFrame(rows[:1], "id long, v string").schema.jsonValue()
    ops = cat.create_table(("ns",), f"sink_{kind}", schema_json)
    table = RelativeTable(ops)
    dest = None
    if kind == "iceberg":
        dest = tempfile.mkdtemp(prefix=f"sinkfuzz_ice_{seed}_")
        iceberg_export.export_iceberg(table, dest)  # empty seed

    ckpt = tempfile.mkdtemp(prefix=f"sinkfuzz_ckpt_{seed}_")
    # crash plan: a random subset of epochs dies once, randomly before
    # or after its commit (after = the replay-hazard window)
    crash = {
        e: rng.choice(["before", "after"])
        for e in rng.sample(range(n_files), max(1, n_files // 2))
    }

    def sink(batch, epoch: int) -> None:
        key = _epoch_key(ckpt, epoch)
        mode = crash.pop(epoch, None)
        if mode == "before":
            raise RuntimeError(f"injected pre-commit crash at epoch {epoch}")
        if kind == "iceberg":
            doc = iceberg_export._load_metadata(dest)
            seen = any(
                s.get("summary", {}).get("stream-batch-id") == key
                for s in doc["snapshots"]
            )
            if not seen:
                iceberg_export.append_iceberg(
                    spark, dest, batch, extra_summary={"stream-batch-id": key}
                )
        elif kind == "merge":
            if not table.seen_stream_epoch(key):
                table.merge_latest(
                    spark,
                    batch,
                    ["id"],
                    ["id"],
                    extra_summary={"stream-batch-id": key},
                )
        else:
            if not table.seen_stream_epoch(key):
                table.append(batch, extra_summary={"stream-batch-id": key})
        if mode == "after":
            raise RuntimeError(f"injected post-commit crash at epoch {epoch}")

    restarts = 0
    while True:
        q = (
            spark.readStream.schema("id long, v string")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
            q.stop()
            q.awaitTermination()
            break
        except Exception:
            restarts += 1
            assert restarts <= 3 * n_files, (
                f"seed {seed}/{kind}: stream never drained"
            )
            try:
                q.stop()
            except Exception:
                pass

    if kind == "iceberg":
        got = [
            tuple(r)
            for r in iceberg_export.read_iceberg(spark, dest).collect()
        ]
        doc = iceberg_export._load_metadata(dest)
        snaps = doc["snapshots"][1:]  # drop the empty export seed
    else:
        table.ops._should_refresh = True
        got = [tuple(r) for r in table.read(spark).collect()]
        snaps = table.ops.current()["snapshots"]
    assert sorted(got) == sorted(rows), (
        f"seed {seed}/{kind}: rows diverged after {restarts} restarts "
        f"(got {len(got)}, want {len(rows)}; dups "
        f"{len(got) - len(set(got))})"
    )
    keys = [s["summary"].get("stream-batch-id") for s in snaps]
    assert len(snaps) == n_files and len(set(keys)) == n_files, (
        f"seed {seed}/{kind}: {len(snaps)} snapshots / "
        f"{len(set(keys))} distinct epoch keys, want {n_files}"
    )


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sinks_mode = "--sinks" in sys.argv
    n_seeds = int(args[0]) if args else 3
    n_ops = int(args[1]) if len(args) > 1 else 20
    from iceberg_relative_io_spark.session import get_spark

    spark = get_spark(app_name="fuzz_stream")
    for seed in range(1, n_seeds + 1):
        if sinks_mode:
            for kind in ("append", "iceberg", "merge"):
                run_sink_seed(spark, seed, kind)
                print(f"OK  seed {seed} sink={kind}", flush=True)
        else:
            run_seed(spark, seed, n_ops)
            print(f"OK  seed {seed} ({n_ops} ops)", flush=True)
    print(f"{n_seeds}/{n_seeds} seeds clean")


if __name__ == "__main__":
    main()
