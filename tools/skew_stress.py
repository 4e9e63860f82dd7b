"""Adversarial hot-bucket stress for the skewpairs defense (round-4
verdict item 1: "50k docs sharing one signature → no single-task
straggler").

Synthesizes a corpus where ONE (band, signature) bucket holds `m`
distinct members (the boilerplate-crawl / viral-clip shape) on top of a
healthy background, then times candidate-pair generation two ways:

- UNCHUNKED: the pre-round-5 plan — the hot key lands on one join task
  (or one applyInPandas group: an O(m^2) dense allocation).
- CHUNKED: the skewpairs plan — the same pairs spread over C(C+1)/2
  cap-bounded tasks.

Both paths aggregate the pairs down to a count (so the measurement is
the pair generation, not a collect), assert identical counts, and
report wall time plus the observed maximum single-task rows. Run:

    python tools/skew_stress.py [m_hot] [cap]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F


def main() -> None:
    m_hot = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 4096

    sys.path.insert(0, ".")
    from iceberg_relative_io_spark.operators import skewpairs
    from iceberg_relative_io_spark.session import get_spark

    spark = get_spark(app_name="skew-stress", master="local[32]",
                      shuffle_partitions=32)
    # Model cluster scale: a 100 TB bands table is far beyond the
    # broadcast threshold, so the candidate join is a SHUFFLE join and
    # the hot key is one sort-merge task. (At the toy local scale both
    # sides fit the 10 MB broadcast default, every probe partition
    # parallelizes, and the straggler is invisible.) AQE stays ON — the
    # honest comparison is unchunked+AQE vs chunked: AQE's skew split is
    # keyed on partition BYTES, and a 10^5-row hot bucket is only ~10 MB
    # of input (far under the 256 MB trigger) while emitting a QUADRATIC
    # number of verify pairs — input-size heuristics cannot see it.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    # hot bucket 0: m_hot members; background: 1000 buckets x 32 members.
    # Each row carries the payload the real queries carry — a 24-element
    # shingle-set stand-in — and each PAIR pays the real verify cost
    # (array_intersect Jaccard, as in c02_lsh_candidate_pairs). A bare
    # pair COUNT is nearly free even at 10^8 pairs in one codegen task;
    # the straggler is the per-pair verify work + the O(m^2) row stream
    # through one task, so that is what we measure.
    payload = F.sequence(
        F.pmod(F.xxhash64("id"), F.lit(50)), F.pmod(F.xxhash64("id"), F.lit(50)) + 23
    )
    hot = spark.range(m_hot).select(
        F.lit(0).alias("bucket"), F.col("id").alias("id"), payload.alias("sh")
    )
    bg = spark.range(32000).select(
        (F.col("id") % 1000 + 1).cast("int").alias("bucket"),
        (F.col("id") + 10_000_000).alias("id"),
        payload.alias("sh"),
    )
    df = hot.unionByName(bg).repartition(32).persist()
    n = df.count()
    expected = m_hot * (m_hot - 1) // 2 + 1000 * (32 * 31 // 2)

    def verify_sum(joined, l, r):
        inter = F.size(F.array_intersect(F.col(f"{l}.sh"), F.col(f"{r}.sh")))
        jacc = inter.cast("double") / (
            F.size(F.col(f"{l}.sh")) + F.size(F.col(f"{r}.sh")) - inter
        )
        return joined.agg(
            F.count(F.lit(1)).alias("n"), F.sum(jacc).alias("s")
        ).collect()[0]

    # -- unchunked: plain self-join on the bucket key ------------------
    a, b = df.alias("a"), df.alias("b")
    t0 = time.time()
    row = verify_sum(
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        ),
        "a",
        "b",
    )
    n_plain, s_plain = row["n"], row["s"]
    t_plain = time.time() - t0

    # -- chunked -------------------------------------------------------
    t0 = time.time()
    joined = skewpairs.chunked_self_join(df, ["bucket"], "id", cap=cap)
    row = verify_sum(joined, "_l", "_r")
    n_chunk, s_chunk = row["n"], row["s"]
    t_chunk = time.time() - t0

    # per-task bound actually achieved
    left, _right = skewpairs.chunked_sides(df, ["bucket"], "id", cap=cap)
    mx = (
        left.groupBy("bucket", "_cl", "_cr")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )

    assert n_plain == expected, (n_plain, expected)
    assert n_chunk == expected, (n_chunk, expected)
    assert abs(s_plain - s_chunk) < 1e-6 * max(1.0, abs(s_plain))
    print(
        f"rows={n} m_hot={m_hot} cap={cap} pairs={expected}\n"
        f"unchunked: {t_plain:.2f}s (hot key = ONE task)\n"
        f"chunked:   {t_chunk:.2f}s (max rows on any task key = {mx})\n"
        f"speedup:   {t_plain / t_chunk:.2f}x on local[32]"
    )


if __name__ == "__main__":
    main()
