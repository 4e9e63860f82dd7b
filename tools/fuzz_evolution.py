#!/usr/bin/env python3
"""Randomized schema-evolution + branch/rollback fuzz for the table
format.

fuzz_dml.py interleaves row-level DML with a DuckDB mirror; this tool
adds the METADATA planes on top — schema evolution (add / drop /
rename / widen column), write-audit-publish branches, tags, and
metadata-only rollback — interleaved with appends, MOR deletes,
updates, compaction, manifest rewrites and snapshot expiry. These are
exactly the planes where id-based evolution bugs live (a renamed
column resurrecting under its old name, a rollback resurrecting
deleted rows, a WAP publish dropping main's rows).

The oracle is a COLUMN-KEY mirror in plain Python: every column has a
stable key (mirroring the engine's column-id model), rows are dicts
keyed by column KEY, and the current key->name map renders the
expected table. Renames change only the map; rollback restores a
recorded row snapshot while keeping the CURRENT schema (the engine's
semantics: rollback moves the head, not the schema) — key-based lookup
makes "column added after the rollback target" (-> NULL) and "renamed
after capture" (-> values under the new name) fall out naturally.

After EVERY operation the engine read must equal the mirror exactly.
WAP publishes only fast-forward (the op is skipped if main advanced
past the branch base — divergence is not a fast-forward); rollback
targets only live, non-expired main-chain ancestors.

Usage: python tools/fuzz_evolution.py [n_seeds] [ops_per_seed]
"""

from __future__ import annotations

import copy
import random
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

BASE_COLS = [("id", "id", "long"), ("part", "part", "int"),
             ("val", "val", "double"), ("tag", "tag", "string")]


def run_seed(spark, seed: int, n_ops: int) -> list[str]:
    from pyspark.sql import functions as F

    from iceberg_relative_io_spark.catalog import FsCatalog, RelativeTable

    rng = random.Random(10_000 + seed)
    cat = FsCatalog(tempfile.mkdtemp(prefix=f"fuzz_evo_{seed}_"))
    cat.create_namespace(("fz",))

    # mirror state: columns = [(key, name, sql_type)], rows = [{key: v}]
    cols = [list(c) for c in BASE_COLS]
    rows: list[dict] = []
    snapshots: dict[int, list[dict]] = {}  # sid -> deepcopy of rows
    next_id = 0
    next_col = 0
    branch: dict | None = None  # {"name", "base_sid", "rows": [...]}

    schema_sql = ", ".join(f"{n} {t}" for _, n, t in cols)
    base = spark.createDataFrame([], schema_sql)
    ops = cat.create_table(("fz",), "t", base.schema.jsonValue(),
                           partition_by=["part"])
    table = RelativeTable(ops)

    def current_schema_sql() -> str:
        return ", ".join(f"{n} {t}" for _, n, t in cols)

    def fresh_rows(n: int):
        nonlocal next_id
        out = []
        for _ in range(n):
            r = {"id": next_id, "part": rng.choice([0, 1, 2, 3]),
                 "val": round(rng.uniform(-50, 50), 4),
                 "tag": rng.choice(["a", "b", "c"])}
            for key, name, typ in cols[4:]:
                r[key] = rng.randint(0, 99)
            out.append(r)
            next_id += 1
        return out

    def to_df(batch: list[dict]):
        data = [tuple(r.get(key) for key, _, _ in cols) for r in batch]
        return spark.createDataFrame(data, current_schema_sql())

    def mirror_tuples() -> list[tuple]:
        out = []
        for r in rows:
            t = []
            for key, name, typ in cols:
                v = r.get(key)
                if typ == "double" and v is not None:
                    v = round(v, 6)
                t.append(v)
            out.append(tuple(t))
        return sorted(out, key=lambda t: tuple((x is None, x) for x in t))

    def engine_tuples() -> list[tuple]:
        names = [n for _, n, _ in cols]
        got = table.read(spark).select(*names).collect()
        out = []
        for row in got:
            t = []
            for (key, name, typ), v in zip(cols, row):
                if typ == "double" and v is not None:
                    v = round(v, 6)
                t.append(v)
            out.append(tuple(t))
        return sorted(out, key=lambda t: tuple((x is None, x) for x in t))

    def record_snapshot():
        sid = ops.current().get("current-snapshot-id")
        if sid is not None:
            snapshots[sid] = copy.deepcopy(rows)

    def live_main_ancestors() -> list[int]:
        meta = ops.current()
        out = []
        sid = meta.get("current-snapshot-id")
        while sid is not None:
            entry = next(
                (s for s in meta["snapshots"] if s["snapshot-id"] == sid), None
            )
            if entry is None:
                break
            if not entry.get("expired"):
                out.append(sid)
            sid = entry.get("parent-snapshot-id")
        return out

    # seed rows
    batch = fresh_rows(rng.randint(5, 20))
    table.append(to_df(batch))
    rows.extend(batch)
    record_snapshot()

    OPS = [
        "append", "delete_mor", "update_mor", "add_col", "drop_col",
        "rename_col", "widen_col", "branch_open", "branch_append",
        "publish", "rollback", "tag", "compact", "rewrite_manifests",
        "expire",
    ]
    failures: list[str] = []
    for step in range(n_ops):
        op = rng.choice(OPS)
        try:
            if op == "append":
                batch = fresh_rows(rng.randint(1, 8))
                table.append(to_df(batch))
                rows.extend(batch)
            elif op == "delete_mor":
                ids = [r["id"] for r in rows]
                if not ids:
                    continue
                kill = set(rng.sample(ids, min(len(ids), rng.randint(1, 4))))
                table.delete_where_mor(
                    spark, F.col("id").isin(list(kill)), ["id"]
                )
                rows = [r for r in rows if r["id"] not in kill]
            elif op == "update_mor":
                ids = [r["id"] for r in rows]
                if not ids:
                    continue
                touch = set(rng.sample(ids, min(len(ids), rng.randint(1, 4))))
                bump = round(rng.uniform(1, 9), 4)
                table.update_where_mor(
                    spark, F.col("id").isin(list(touch)),
                    {"val": F.lit(bump), "tag": F.lit("upd")}, ["id"],
                )
                for r in rows:
                    if r["id"] in touch:
                        r["val"], r["tag"] = bump, "upd"
            elif op == "add_col":
                key = f"e{next_col}"
                next_col += 1
                typ = rng.choice(["integer", "long"])
                table.add_column(key, typ)
                cols.append([key, key, typ])
            elif op == "drop_col":
                extras = [c for c in cols[4:]]
                if not extras:
                    continue
                victim = rng.choice(extras)
                table.drop_column(victim[1])
                cols.remove(victim)
            elif op == "rename_col":
                extras = [c for c in cols[4:]]
                if not extras:
                    continue
                c = rng.choice(extras)
                new = f"{c[0]}_r{step}"
                table.rename_column(c[1], new)
                c[1] = new
            elif op == "widen_col":
                narrow = [c for c in cols[4:] if c[2] == "integer"]
                if not narrow:
                    continue
                c = rng.choice(narrow)
                table.widen_column(c[1], "long")
                c[2] = "long"
            elif op == "branch_open":
                if branch is not None:
                    continue
                name = f"wap{step}"
                table.create_branch(name)
                branch = {
                    "name": name,
                    "base_sid": ops.current().get("current-snapshot-id"),
                    "rows": [],
                }
            elif op == "branch_append":
                if branch is None:
                    continue
                batch = fresh_rows(rng.randint(1, 5))
                table.append(to_df(batch), branch=branch["name"])
                branch["rows"].extend(batch)
                # staged rows are INVISIBLE on main: mirror unchanged
            elif op == "publish":
                if branch is None:
                    continue
                head = ops.current().get("current-snapshot-id")
                if not branch["rows"]:
                    branch = None  # nothing staged: abandon the audit
                    continue
                if head == branch["base_sid"]:
                    table.fast_forward(branch["name"])
                    rows.extend(branch["rows"])
                else:
                    # diverged: fast_forward must REFUSE (silent override
                    # would drop main's interim commits), and the staged
                    # appends land via cherry-pick instead
                    refused = False
                    try:
                        table.fast_forward(branch["name"])
                    except ValueError:
                        refused = True
                    if not refused:
                        raise AssertionError(
                            "fast_forward silently published onto a "
                            "diverged main"
                        )
                    staged_sid = ops.current()["refs"][branch["name"]]
                    # cherry-pick only if the branch head is a single
                    # append on the branch base (multi-commit audits
                    # would need one pick per snapshot; keep one here)
                    picks = []
                    sid = staged_sid
                    while sid is not None and sid != branch["base_sid"]:
                        entry = next(
                            (
                                s
                                for s in ops.current()["snapshots"]
                                if s["snapshot-id"] == sid
                            ),
                            None,
                        )
                        if entry is None or entry["operation"] != "append":
                            picks = None
                            break
                        picks.append(sid)
                        sid = entry.get("parent-snapshot-id")
                    if picks:
                        for sid in reversed(picks):  # oldest staged first
                            table.cherry_pick_snapshot(sid)
                            ops._should_refresh = True
                        rows.extend(branch["rows"])
                branch = None
            elif op == "rollback":
                targets = [
                    s for s in live_main_ancestors()
                    if s in snapshots
                    and s != ops.current().get("current-snapshot-id")
                ]
                if not targets:
                    continue
                target = rng.choice(targets)
                table.rollback_to_snapshot(target)
                rows = copy.deepcopy(snapshots[target])
                branch = None  # base pointer moved; abandon any open audit
            elif op == "tag":
                try:
                    table.create_tag(f"t{step}")
                except ValueError:
                    pass  # duplicate tag name: fine
            elif op == "compact":
                table.compact(spark)
            elif op == "rewrite_manifests":
                table.rewrite_manifests()
            elif op == "expire":
                table.expire_snapshots(keep_last=rng.choice([2, 3, 5]))
                live = set(live_main_ancestors())
                for sid in list(snapshots):
                    if sid not in live:
                        snapshots.pop(sid)
        except Exception as exc:  # noqa: BLE001 — a crash is a finding
            failures.append(
                f"seed {seed} step {step} {op}: {type(exc).__name__}: {exc}"
            )
            break

        record_snapshot()
        got, want = engine_tuples(), mirror_tuples()
        if got != want:
            only_e = [t for t in got if t not in want][:4]
            only_m = [t for t in want if t not in got][:4]
            failures.append(
                f"seed {seed} step {step} after {op}: DIVERGED "
                f"(engine {len(got)} vs mirror {len(want)}; "
                f"engine-only {only_e}, mirror-only {only_m}; "
                f"cols {[c[1] for c in cols]})"
            )
            break
    return failures


def main() -> int:
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    n_ops = int(sys.argv[2]) if len(sys.argv) > 2 else 25

    from iceberg_relative_io_spark.session import get_spark

    spark = get_spark(app_name="fuzz_evolution")
    all_failures: list[str] = []
    n_clean = 0
    for seed in range(n_seeds):
        fails = run_seed(spark, seed, n_ops)
        n_clean += not fails
        print(f"{'FAIL' if fails else 'OK'}  seed {seed} ({n_ops} ops)")
        all_failures.extend(fails)
    for f in all_failures:
        print("  " + f)
    print(f"\n{n_clean}/{n_seeds} seeds clean")
    return 1 if all_failures else 0


if __name__ == "__main__":
    sys.exit(main())
