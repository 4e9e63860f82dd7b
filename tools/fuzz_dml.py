#!/usr/bin/env python3
"""Randomized DML-sequence fuzz for the table format (round-5 verdict
item 7).

fuzz_oracle.py randomizes the INPUTS of query operators; this tool
randomizes the COMMIT HISTORY of a table. Per seed it interleaves a
random sequence of

    append / delete_where_mor / update_where_mor / delete_where (COW) /
    update_where (COW) / merge upsert / overwrite_partitions /
    compact / rewrite_manifests / expire_snapshots / remove_orphan_files

against a partitioned RelativeTable while applying the SQL-equivalent
mutation to a DuckDB mirror table. After EVERY operation the full table
read must equal the mirror exactly (sorted row sets) — maintenance ops
(compact/rewrite_manifests/expire/orphans) must be invisible. This is
exactly the class of bug the round-4 rewrite_manifests regression was
(deleted rows resurrecting after a metadata-only rewrite): a mechanical
interleaving search finds those without waiting for a hand-written
test to guess the right sequence.

A mid-history snapshot id is also captured and time-travel-read at the
end against the mirror state recorded at that point (unless a later
expire_snapshots dropped it).

Usage: python tools/fuzz_dml.py [n_seeds] [ops_per_seed]
       python tools/fuzz_dml.py --deep [n_seeds] [ops_per_seed]

``--deep`` is the weekly-deep mode (round-7 verdict item 7): defaults
to 10 seeds x 100 ops, draws append batches 100x larger with values
sampled from the sf0.1 lineitem table (real value/flag distributions,
not uniform synthetics), FORCES a maintenance op (expire alternating
with rewrite_manifests) every ~10 steps so long histories and
maintenance interleave the way a production table's do, and records
native-format commit latency vs history length (snapshot-log size)
per op class — the same latency-vs-history question SCALING.md
answered for the Iceberg mirror plane. The summary table prints at the
end for SCALING.md.
Exit code 0 = every step of every seed matched.
"""

from __future__ import annotations

import random
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SCHEMA = "id long, part int, val double, tag string"

# (history_len, op, seconds) samples from deep mode, for the summary
_TIMINGS: list[tuple[int, str, float]] = []

# deep-mode value pool drawn from sf0.1 lineitem (filled lazily once)
_DEEP_POOL: list[tuple[float, str]] | None = None


def _deep_pool(spark) -> list[tuple[float, str]]:
    global _DEEP_POOL
    if _DEEP_POOL is None:
        rows = (
            spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
            .select("l_extendedprice", "l_returnflag")
            .limit(20000)
            .collect()
        )
        _DEEP_POOL = [(float(r[0]), str(r[1])) for r in rows]
    return _DEEP_POOL


def _rows_of(df) -> list[tuple]:
    return sorted(
        (r.id, r.part, None if r.val is None else round(r.val, 6), r.tag)
        for r in df.collect()
    )


def _mirror_rows(con) -> list[tuple]:
    return sorted(
        (i, p, None if v is None else round(v, 6), t)
        for i, p, v, t in con.execute(
            "SELECT id, part, val, tag FROM t"
        ).fetchall()
    )


def run_seed(spark, seed: int, n_ops: int, deep: bool = False) -> list[str]:
    import duckdb
    from pyspark.sql import functions as F

    from iceberg_relative_io_spark.catalog import FsCatalog, RelativeTable

    from iceberg_relative_io_spark.catalog.bucket_hash import bucket_value

    rng = random.Random(seed)
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, part INT, val DOUBLE, tag VARCHAR)")

    cat = FsCatalog(tempfile.mkdtemp(prefix=f"fuzz_dml_{seed}_"))
    cat.create_namespace(("fz",))
    base = spark.createDataFrame([], SCHEMA)
    # odd seeds run the murmur3 bucket layout (hidden partitioning) so
    # the DML interleavings also exercise the spec-hash transform's
    # write path, manifest pruning, and MOR scoping under that layout
    bucketed = seed % 2 == 1
    part_spec = ["part", "bucket(3, id)"] if bucketed else ["part"]
    ops = cat.create_table(
        ("fz",), "t", base.schema.jsonValue(), partition_by=part_spec
    )
    table = RelativeTable(ops)

    next_id = 0
    # deep mode: batches 100x larger, values/tags sampled from sf0.1
    # lineitem (real price distribution + return flags, not uniforms)
    scale = 100 if deep else 1
    deep_pool = _deep_pool(spark) if deep else None

    def fresh_batch(n: int, parts: list[int]):
        nonlocal next_id
        rows = []
        for _ in range(n * scale):
            if deep_pool is not None:
                val, tag = deep_pool[next_id % len(deep_pool)]
                val = round(val, 4)
            else:
                val = round(rng.uniform(-100, 100), 4)
                tag = rng.choice(["a", "b", "c", "reborn"])
            rows.append((next_id, rng.choice(parts), val, tag))
            next_id += 1
        return rows

    def live_ids():
        return [r[0] for r in con.execute("SELECT id FROM t").fetchall()]

    failures: list[str] = []
    tt_snapshot = None  # (snapshot_id, mirror rows at capture)
    expired_after_capture = False

    # seed data so the first random op has something to chew on
    rows = fresh_batch(rng.randint(5, 30), [0, 1, 2, 3])
    table.append(spark.createDataFrame(rows, SCHEMA))
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", rows)

    # round-7 changelog invariant state: a periodically-captured
    # (snapshot, mirror rows) pair diffed against the head (native
    # RelativeTable.changelog vs the mirror's value diff)
    cl_sid = ops.current().get("current-snapshot-id")
    cl_rows = _mirror_rows(con)

    OPS = [
        "append", "append_dup_keys", "delete_mor", "update_mor",
        "delete_cow", "update_cow", "merge_upsert", "overwrite_parts",
        "compact", "rewrite_manifests", "expire", "orphans",
    ]
    for step in range(n_ops):
        op = rng.choice(OPS)
        if deep and step > 0 and step % 10 == 0:
            # deep mode forces maintenance to interleave with long
            # histories the way a production table's compaction cron
            # does: expire alternating with rewrite_manifests
            op = "expire" if (step // 10) % 2 else "rewrite_manifests"
        meta_before = ops.current()
        hist = len(meta_before.get("snapshots", []))
        meta_kb = len(repr(meta_before)) / 1024.0
        t0 = time.monotonic()
        try:
            if op == "append":
                rows = fresh_batch(rng.randint(1, 20), [0, 1, 2, 3, 4])
                table.append(spark.createDataFrame(rows, SCHEMA))
                con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", rows)
            elif op == "append_dup_keys":
                # re-insert ALREADY-DELETED or live ids: the MOR scoping
                # rule (deletes apply only to strictly older files) must
                # keep exactly these alive
                pool = list(range(next_id))
                if not pool:
                    continue
                ids = rng.sample(pool, min(len(pool), rng.randint(1, 5)))
                rows = [
                    (i, rng.choice([0, 1, 2]), round(rng.uniform(0, 1), 4), "reborn")
                    for i in ids
                ]
                table.append(spark.createDataFrame(rows, SCHEMA))
                con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", rows)
            elif op in ("delete_mor", "delete_cow"):
                ids = live_ids()
                if not ids:
                    continue
                kill = rng.sample(ids, min(len(ids), rng.randint(1, 6)))
                cond = F.col("id").isin(kill)
                if op == "delete_mor":
                    table.delete_where_mor(spark, cond, ["id"])
                else:
                    table.delete_where(spark, cond)
                con.execute(
                    f"DELETE FROM t WHERE id IN ({','.join(map(str, kill))})"
                )
            elif op in ("update_mor", "update_cow"):
                ids = live_ids()
                if not ids:
                    continue
                touch = rng.sample(ids, min(len(ids), rng.randint(1, 6)))
                cond = F.col("id").isin(touch)
                bump = round(rng.uniform(1, 9), 4)
                if op == "update_mor":
                    table.update_where_mor(
                        spark, cond,
                        {"val": F.lit(bump), "tag": F.lit("upd")}, ["id"],
                    )
                else:
                    table.update_where(
                        spark, cond, {"val": F.lit(bump), "tag": F.lit("upd")}
                    )
                con.execute(
                    f"UPDATE t SET val = {bump}, tag = 'upd' "
                    f"WHERE id IN ({','.join(map(str, touch))})"
                )
            elif op == "merge_upsert":
                ids = live_ids()
                upd = rng.sample(ids, min(len(ids), rng.randint(0, 3))) if ids else []
                rows = [
                    (i, rng.choice([0, 1, 2]), round(rng.uniform(0, 1), 4), "mrg")
                    for i in upd
                ] + fresh_batch(rng.randint(1, 4), [0, 1, 2])
                table.merge(
                    spark, spark.createDataFrame(rows, SCHEMA), ["id"]
                )
                for i, p, v, t in rows:
                    con.execute("DELETE FROM t WHERE id = ?", [i])
                    con.execute("INSERT INTO t VALUES (?, ?, ?, ?)", [i, p, v, t])
            elif op == "overwrite_parts":
                parts = sorted(
                    {rng.choice([0, 1, 2, 3]) for _ in range(rng.randint(1, 2))}
                )
                rows = fresh_batch(rng.randint(1, 10), parts)
                table.overwrite_partitions(spark.createDataFrame(rows, SCHEMA))
                if bucketed:
                    # dynamic overwrite replaces FULL partition tuples —
                    # with the hidden bucket(3, id) sub-partition that is
                    # (part, murmur3_bucket(id, 3)): rows in the same part
                    # but another bucket correctly survive (this is the
                    # Iceberg semantics; a part-only mirror flags exactly
                    # the survivors as divergence)
                    replaced = {(r[1], bucket_value(r[0], 3)) for r in rows}
                    # duplicate ids can live in several partitions
                    # (append_dup_keys), so doom exact (id, part) pairs,
                    # never bare ids
                    doomed = sorted(
                        {
                            (i, p)
                            for i, p in con.execute(
                                "SELECT id, part FROM t"
                            ).fetchall()
                            if (p, bucket_value(i, 3)) in replaced
                        }
                    )
                    if doomed:
                        vals = ",".join(f"({i},{p})" for i, p in doomed)
                        con.execute(
                            "DELETE FROM t WHERE EXISTS (SELECT 1 FROM "
                            f"(VALUES {vals}) AS v(i, p) "
                            "WHERE v.i = t.id AND v.p = t.part)"
                        )
                else:
                    present = sorted({r[1] for r in rows})
                    con.execute(
                        f"DELETE FROM t WHERE part IN ({','.join(map(str, present))})"
                    )
                con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", rows)
            elif op == "compact":
                table.compact(spark)
            elif op == "rewrite_manifests":
                table.rewrite_manifests()
            elif op == "expire":
                table.expire_snapshots(keep_last=rng.choice([1, 2, 3]))
                if tt_snapshot is not None:
                    expired_after_capture = True
            elif op == "orphans":
                table.remove_orphan_files()
        except Exception as exc:  # noqa: BLE001 — a crash is a finding
            import traceback

            failures.append(
                f"seed {seed} step {step} {op}: {type(exc).__name__}: {exc}\n"
                + traceback.format_exc(limit=8)
            )
            break
        if deep:
            # mirror SQL in the branch is sub-ms on this table size; the
            # measurement is effectively the native commit (plan + write
            # + CAS rename) — see SCALING.md round-7 entry
            _TIMINGS.append((hist, meta_kb, op, time.monotonic() - t0))

        got = _rows_of(table.read(spark))
        want = _mirror_rows(con)
        if got != want:
            only_spark = [r for r in got if r not in want][:5]
            only_duck = [r for r in want if r not in got][:5]
            failures.append(
                f"seed {seed} step {step} after {op}: DIVERGED "
                f"(spark {len(got)} rows vs mirror {len(want)}; "
                f"spark-only {only_spark}, mirror-only {only_duck})"
            )
            break

        # round-7: every ~5 ops, the native changelog between the last
        # captured snapshot and the head must equal the mirror's value
        # diff — across every DML kind, both partition layouts, and
        # interleaved maintenance. Skipped when expiry reaped the
        # captured snapshot (then re-capture from the head).
        if step % 5 == 4:
            from collections import Counter

            meta_now = ops.current()
            head = meta_now.get("current-snapshot-id")
            alive = any(
                s["snapshot-id"] == cl_sid
                and not s.get("expired")
                for s in meta_now.get("snapshots", [])
            )
            if cl_sid is not None and head is not None and alive:
                try:
                    cl = table.changelog(spark, cl_sid, head)
                    got_cl: Counter = Counter()
                    for r in cl.collect():
                        got_cl[
                            (
                                r.id,
                                r.part,
                                None if r.val is None else round(r.val, 6),
                                r.tag,
                                r._change_type,
                            )
                        ] += r._n
                    now_rows = _mirror_rows(con)
                    plus = Counter(now_rows)
                    minus = Counter(cl_rows)
                    want_cl: Counter = Counter()
                    for row, n in (plus - minus).items():
                        want_cl[(*row, "INSERT")] = n
                    for row, n in (minus - plus).items():
                        want_cl[(*row, "DELETE")] = n
                    if got_cl != want_cl:
                        failures.append(
                            f"seed {seed} step {step}: changelog diverges "
                            f"from mirror diff (extra "
                            f"{dict((got_cl - want_cl))}, missing "
                            f"{dict((want_cl - got_cl))})"
                        )
                        break
                except Exception as exc:  # noqa: BLE001
                    failures.append(
                        f"seed {seed} step {step}: changelog raised "
                        f"{type(exc).__name__}: {exc}"
                    )
                    break
            cl_sid = ops.current().get("current-snapshot-id")
            cl_rows = _mirror_rows(con)

        # capture one mid-history snapshot for a time-travel check
        if tt_snapshot is None and step >= n_ops // 2:
            sid = ops.current().get("current-snapshot-id")
            if sid is not None:
                tt_snapshot = (sid, want)

    if not failures and tt_snapshot is not None and not expired_after_capture:
        sid, want = tt_snapshot
        try:
            got = _rows_of(table.read(spark, snapshot_id=sid))
            if got != want:
                failures.append(
                    f"seed {seed}: time-travel to {sid} diverged "
                    f"({len(got)} vs {len(want)} rows)"
                )
        except Exception as exc:  # noqa: BLE001
            failures.append(f"seed {seed}: time-travel raised {exc}")
    return failures


def _print_latency_summary() -> None:
    """History-length-bucketed commit latency per op class, from the
    deep run's samples — the flat-curve evidence for SCALING.md."""
    if not _TIMINGS:
        return
    buckets = [(0, 10), (10, 25), (25, 50), (50, 100), (100, 10**9)]
    classes = {
        "append": ("append", "append_dup_keys"),
        "mor-dml": ("delete_mor", "update_mor", "merge_upsert"),
        "cow-dml": ("delete_cow", "update_cow", "overwrite_parts"),
        "maintenance": ("compact", "rewrite_manifests", "expire", "orphans"),
    }
    print("\ncommit latency vs history length (native format, deep mode)")
    print(f"{'snapshots':>12} {'meta KB':>8}", end="")
    for cls in classes:
        print(f" {cls:>12}", end="")
    print(f" {'n':>5}")
    for lo, hi in buckets:
        rows = [t for t in _TIMINGS if lo <= t[0] < hi]
        if not rows:
            continue
        kb = sum(t[1] for t in rows) / len(rows)
        label = f"{lo}-{hi if hi < 10**9 else '+'}"
        print(f"{label:>12} {kb:>8.1f}", end="")
        for cls, ops_ in classes.items():
            sub = [t[3] for t in rows if t[2] in ops_]
            print(f" {sum(sub)/len(sub):>11.3f}s" if sub else f" {'-':>12}", end="")
        print(f" {len(rows):>5}")


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--deep"]
    deep = "--deep" in sys.argv[1:]
    n_seeds = int(args[0]) if args else (10 if deep else 3)
    n_ops = int(args[1]) if len(args) > 1 else (100 if deep else 25)

    from iceberg_relative_io_spark.session import get_spark

    spark = get_spark(app_name="fuzz_dml")
    all_failures: list[str] = []
    n_clean = 0
    for seed in range(n_seeds):
        fails = run_seed(spark, seed, n_ops, deep=deep)
        status = "FAIL" if fails else "OK"
        n_clean += not fails
        print(f"{status}  seed {seed} ({n_ops} ops)")
        all_failures.extend(fails)
    for f in all_failures:
        print("  " + f)
    if deep:
        _print_latency_summary()
    print(f"\n{n_clean}/{n_seeds} seeds clean")
    return 1 if all_failures else 0


if __name__ == "__main__":
    sys.exit(main())
