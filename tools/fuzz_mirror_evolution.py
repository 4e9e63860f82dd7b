#!/usr/bin/env python3
"""Randomized schema-evolution + DML fuzz for the Iceberg MIRROR plane.

tools/fuzz_evolution.py fuzzes the NATIVE table format's evolution;
tools/fuzz_posdel.py fuzzes the mirror's row-level DML. This tool
closes the remaining cell: ``evolve_schema_iceberg`` (add / rename /
drop column, committed metadata-only on the exported v2 directory)
interleaved with the mirror's own DML — ``append_iceberg``,
``delete_where_iceberg``, ``update_where_iceberg``, ``merge_iceberg`` —
and its maintenance — ``rewrite_manifests_iceberg``,
``compact_iceberg``, ``expire_snapshots_iceberg``,
``remove_orphan_files_iceberg`` — plus full-replace
dynamic overwrites, metadata-only rollback, and tag refs (expiry
protection). These interleavings
are where era-resolution bugs live: a renamed column resurrecting
under its old name after a manifest rewrite, an added column's NULL
fill vanishing after compaction, a pre-rename equality-delete key file
failing to resolve.

The oracle is the same COLUMN-KEY mirror design as fuzz_evolution:
every column has a stable key (the engine's field-id model), rows are
dicts keyed by column KEY, and the current key->name map renders the
expected table — renames change only the map, adds surface as None for
pre-add rows, drops hide the key. Metadata-only ROLLBACK restores a
recorded row snapshot while keeping the CURRENT schema (the engine's
semantics: rollback moves main, not the schema) — key-based lookup
makes "column added after the rollback target" (-> NULL) fall out
naturally. After EVERY operation the spec-path read must equal the
mirror exactly.

Usage: python tools/fuzz_mirror_evolution.py [n_seeds] [ops_per_seed]
Exit code 0 = every step of every seed matched.
"""

from __future__ import annotations

import copy
import random
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# (key, current_name, sql_type, iceberg_type); core columns never
# renamed/dropped — id is the DML key, val/tag are the update targets
BASE_COLS = [
    ("id", "id", "long", "long"),
    ("val", "val", "double", "double"),
    ("tag", "tag", "string", "string"),
]


def run_seed(spark, seed: int, n_ops: int) -> list[str]:
    from pyspark.sql import functions as F

    from iceberg_relative_io_spark.catalog import (
        FsCatalog,
        RelativeTable,
        iceberg_export,
    )

    rng = random.Random(77_000 + seed)
    cols = [list(c) for c in BASE_COLS]
    rows: list[dict] = []
    next_id = 0
    next_col = 0

    def schema_sql() -> str:
        return ", ".join(f"{n} {t}" for _, n, t, _ in cols)

    def fresh_rows(n: int) -> list[dict]:
        nonlocal next_id
        out = []
        for _ in range(n):
            r = {
                "id": next_id,
                "val": round(rng.uniform(-50, 50), 4),
                "tag": rng.choice(["a", "b", "c"]),
            }
            for key, _n, sql_t, _it in cols[3:]:
                r[key] = (
                    f"s{rng.randint(0, 99)}"
                    if sql_t == "string"
                    else rng.randint(0, 99)
                )
            out.append(r)
            next_id += 1
        return out

    def to_df(batch: list[dict]):
        data = [tuple(r.get(key) for key, _, _, _ in cols) for r in batch]
        return spark.createDataFrame(data, schema_sql())

    def mirror_tuples() -> list[tuple]:
        out = []
        for r in rows:
            t = []
            for key, _n, typ, _it in cols:
                v = r.get(key)
                if typ == "double" and v is not None:
                    v = round(v, 6)
                t.append(v)
            out.append(tuple(t))
        return sorted(out, key=lambda t: tuple((x is None, x) for x in t))

    def engine_tuples() -> list[tuple]:
        names = [n for _, n, _, _ in cols]
        got = iceberg_export.read_iceberg(spark, dest).select(*names).collect()
        out = []
        for row in got:
            t = []
            for (key, _n, typ, _it), v in zip(cols, row):
                if typ == "double" and v is not None:
                    v = round(v, 6)
                t.append(v)
            out.append(tuple(t))
        return sorted(out, key=lambda t: tuple((x is None, x) for x in t))

    # seed: build a native table, export it as the mirror under test
    cat = FsCatalog(tempfile.mkdtemp(prefix=f"fuzz_mevo_{seed}_"))
    cat.create_namespace(("fz",))
    batch = fresh_rows(rng.randint(5, 25))
    df = to_df(batch)
    ops = cat.create_table(("fz",), "t", df.schema.jsonValue())
    RelativeTable(ops).append(df)
    rows.extend(batch)
    dest = tempfile.mkdtemp(prefix=f"fuzz_mevo_out_{seed}_")
    iceberg_export.export_iceberg(RelativeTable(ops), dest)

    # snapshot-id -> deepcopy of mirror rows, recorded after every
    # committing op; rollback restores the recorded state
    snaps: dict[int, list[dict]] = {}

    def record():
        sid = iceberg_export._load_metadata(dest).get("current-snapshot-id")
        if sid is not None:
            snaps[sid] = copy.deepcopy(rows)

    record()

    OPS = [
        "append", "delete", "update", "merge", "add_col", "rename_col",
        "drop_col", "rewrite_manifests", "compact", "expire", "rollback",
        "overwrite", "tag", "orphans",
    ]
    tags: list[str] = []
    failures: list[str] = []
    for step in range(n_ops):
        op = rng.choice(OPS)
        try:
            if op == "append":
                batch = fresh_rows(rng.randint(1, 8))
                iceberg_export.append_iceberg(spark, dest, to_df(batch))
                rows.extend(batch)
            elif op == "delete":
                ids = [r["id"] for r in rows]
                if not ids:
                    continue
                kill = set(rng.sample(ids, min(len(ids), rng.randint(1, 4))))
                iceberg_export.delete_where_iceberg(
                    spark, dest, F.col("id").isin(list(kill)), ["id"]
                )
                rows = [r for r in rows if r["id"] not in kill]
            elif op == "update":
                ids = [r["id"] for r in rows]
                if not ids:
                    continue
                touch = set(rng.sample(ids, min(len(ids), rng.randint(1, 4))))
                bump = round(rng.uniform(1, 9), 4)
                iceberg_export.update_where_iceberg(
                    spark, dest, F.col("id").isin(list(touch)),
                    {"val": F.lit(bump), "tag": F.lit("upd")}, ["id"],
                )
                for r in rows:
                    if r["id"] in touch:
                        r["val"], r["tag"] = bump, "upd"
            elif op == "merge":
                ids = [r["id"] for r in rows]
                touch = set(
                    rng.sample(ids, min(len(ids), rng.randint(0, 3)))
                )
                inserts = fresh_rows(rng.randint(1, 4))
                upd = []
                for r in rows:
                    if r["id"] in touch:
                        r2 = dict(r)
                        r2["val"] = round(rng.uniform(100, 200), 4)
                        r2["tag"] = "mrg"
                        upd.append(r2)
                src = upd + inserts
                iceberg_export.merge_iceberg(spark, dest, to_df(src), ["id"])
                by_id = {r["id"]: r for r in src}
                rows = [by_id.pop(r["id"], r) for r in rows]
                rows.extend(by_id.values())  # the unmatched inserts
            elif op == "add_col":
                key = f"e{next_col}"
                next_col += 1
                sql_t, ice_t = rng.choice(
                    [("int", "int"), ("bigint", "long"), ("string", "string")]
                )
                iceberg_export.evolve_schema_iceberg(dest, add={key: ice_t})
                cols.append([key, key, sql_t, ice_t])
                # pre-add rows read as NULL; future fresh_rows fill it
            elif op == "rename_col":
                extras = cols[3:]
                if not extras:
                    continue
                c = rng.choice(extras)
                new = f"{c[0]}_r{step}"
                iceberg_export.evolve_schema_iceberg(
                    dest, rename={c[1]: new}
                )
                c[1] = new
            elif op == "drop_col":
                extras = cols[3:]
                if not extras:
                    continue
                victim = rng.choice(extras)
                try:
                    iceberg_export.evolve_schema_iceberg(
                        dest, drop=[victim[1]]
                    )
                except ValueError as exc:
                    if "live equality delete" in str(exc):
                        continue  # legitimate refusal; not an error
                    raise
                cols.remove(victim)
            elif op == "rewrite_manifests":
                iceberg_export.rewrite_manifests_iceberg(dest)
            elif op == "compact":
                iceberg_export.compact_iceberg(spark, dest)
            elif op == "expire":
                iceberg_export.expire_snapshots_iceberg(
                    dest, keep_last=rng.randint(1, 3)
                )
            elif op == "rollback":
                doc = iceberg_export._load_metadata(dest)
                live = {s["snapshot-id"] for s in doc["snapshots"]}
                candidates = sorted(live & set(snaps))
                if not candidates:
                    continue
                target = rng.choice(candidates)
                iceberg_export.rollback_iceberg(dest, target)
                # rollback moves main, NOT the schema: the restored rows
                # predate any later add_col, so those keys render None —
                # matching the engine's NULL fill for files without the
                # column
                rows = copy.deepcopy(snaps[target])
            elif op == "overwrite":
                # unpartitioned mirror: dynamic overwrite degenerates to
                # full INSERT OVERWRITE — the mirror becomes the batch
                batch = fresh_rows(rng.randint(2, 8))
                iceberg_export.overwrite_partitions_iceberg(
                    spark, dest, to_df(batch)
                )
                rows = list(batch)
            elif op == "orphans":
                # plant debris then reap it: the read must be unchanged
                import os as _os

                stray = _os.path.join(
                    dest, "data", f"stray-{step}", "crashed.parquet"
                )
                _os.makedirs(_os.path.dirname(stray), exist_ok=True)
                open(stray, "wb").write(b"junk")
                iceberg_export.remove_orphan_files_iceberg(dest, older_than_s=0)
                if _os.path.exists(stray):
                    failures.append(
                        f"seed {seed} step {step}: orphan not reaped"
                    )
                    break
            elif op == "tag":
                # tags protect their snapshot from expiry; occasionally
                # drop one so later expires can reap it
                if tags and rng.random() < 0.4:
                    iceberg_export.drop_ref_iceberg(dest, tags.pop())
                else:
                    name = f"t{step}"
                    iceberg_export.set_ref_iceberg(dest, name, ref_type="tag")
                    tags.append(name)
        except Exception as exc:  # noqa: BLE001 - fuzz harness boundary
            failures.append(
                f"seed {seed} step {step} op {op}: "
                f"{type(exc).__name__}: {exc}"
            )
            break
        record()
        got, want = engine_tuples(), mirror_tuples()
        if got != want:
            failures.append(
                f"seed {seed} step {step} op {op}: engine {len(got)} rows "
                f"vs mirror {len(want)}"
            )
            break
    return failures


def main() -> int:
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    n_ops = int(sys.argv[2]) if len(sys.argv) > 2 else 15

    from iceberg_relative_io_spark.session import get_spark

    spark = get_spark(app_name="fuzz_mirror_evolution")
    all_failures: list[str] = []
    n_clean = 0
    for seed in range(n_seeds):
        fails = run_seed(spark, seed, n_ops)
        status = "FAIL" if fails else "OK"
        n_clean += not fails
        print(f"{status}  seed {seed} ({n_ops} ops)")
        all_failures.extend(fails)
    for f in all_failures:
        print("  " + f)
    print(f"\n{n_clean}/{n_seeds} seeds clean")
    return 1 if all_failures else 0


if __name__ == "__main__":
    sys.exit(main())
