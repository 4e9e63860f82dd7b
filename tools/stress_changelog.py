"""Changelog scale evidence (VERDICT round-7 item 7).

Claim under test: ``changelog_iceberg`` / ``RelativeTable.changelog``
are metadata-first — wall time tracks the CHANGED files between the two
snapshots, not the table's history length or total file count. A
downstream CDC consumer on a long-lived table (hundreds of snapshots,
most files untouched between reads) must pay for the diff, not the
history.

Protocol: build a mirror with N append snapshots (one data file each),
then time ``changelog(from, to)`` for windows of 1, 4, and 16 changed
snapshots anchored at three depths of history (shallow / middle /
deep). If the plan is metadata-first, wall ~ window size and is flat in
anchor depth; history-proportional growth would expose a full-history
scan.

Usage: python tools/stress_changelog.py [n_snapshots]
"""

from __future__ import annotations

import sys
import tempfile
import time

from pyspark.sql import SparkSession


def main() -> None:
    n_snaps = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    from iceberg_relative_io_spark.catalog import FsCatalog, RelativeTable
    from iceberg_relative_io_spark.catalog import iceberg_export as ie

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("stress_changelog")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    wh = tempfile.mkdtemp(prefix="cl_wh_")
    cat = FsCatalog(wh)
    cat.create_namespace(("ns",))
    df0 = spark.createDataFrame([(0, "seed")], "id long, v string")
    ops = cat.create_table(("ns",), "t", df0.schema.jsonValue())
    t = RelativeTable(ops)
    t.append(df0)
    dest = tempfile.mkdtemp(prefix="cl_mirror_")
    ie.export_iceberg(t, dest)

    print(f"building {n_snaps} append snapshots ...", flush=True)
    t_build = time.time()
    for i in range(1, n_snaps):
        ie.append_iceberg(
            spark,
            dest,
            spark.createDataFrame(
                [(i * 10 + j, f"v{i}") for j in range(5)], "id long, v string"
            ),
        )
    print(f"  built in {time.time() - t_build:.0f}s", flush=True)

    doc = ie._load_metadata(dest)
    # snapshot ids in history order
    sids = [h["snapshot-id"] for h in doc["snapshot-log"]]
    assert len(sids) >= n_snaps

    # warm-up: first changelog call pays one-time session/codegen cost
    # that would otherwise pollute the first timed cell
    ie.changelog_iceberg(spark, dest, sids[0], sids[1]).count()

    print(
        f"history={len(sids)} snapshots; changelog wall by (anchor depth, window):"
    )
    results = []
    for depth_name, base in (
        ("shallow", len(sids) - 20),
        ("middle", len(sids) // 2),
        ("deep", 1),
    ):
        for window in (1, 4, 16):
            if base + window >= len(sids):
                continue
            f_sid, t_sid = sids[base - 1], sids[base - 1 + window]
            t0 = time.time()
            n = ie.changelog_iceberg(spark, dest, f_sid, t_sid).count()
            dt = time.time() - t0
            results.append((depth_name, base, window, n, dt))
            print(
                f"  anchor={depth_name:<7} (log idx {base:>3})  "
                f"window={window:>2} snaps  rows={n:>3}  wall={dt:5.2f}s"
            )

    # verdict: for each window size, deep anchors must not cost more
    # than ~2x the shallow anchor (metadata-walk noise), i.e. wall
    # tracks window, not depth
    by_window: dict[int, list[float]] = {}
    for _, _, w, _, dt in results:
        by_window.setdefault(w, []).append(dt)
    ok = all(max(v) <= 2.0 * min(v) + 0.5 for v in by_window.values())
    print(
        "verdict:",
        "wall tracks changed-file window, flat in history depth"
        if ok
        else "FAIL: wall grows with history depth",
    )
    spark.stop()


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
