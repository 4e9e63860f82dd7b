#!/usr/bin/env python3
"""Composed adversarial skew study (round-5 verdict item 6): does the
skewpairs chunking COMPOSE through the full dedup chain?

tools/skew_stress.py measures the defense on an isolated synthetic pair
join. This study runs the REAL production chain —
``c02_dedup_survivors`` (LSH candidates -> Jaccard verify -> connected
components -> survivorship) and ``c06_pipeline_capstone`` (quality gate
∧ survivorship -> per-language stats) — on a corpus of

- the sf0.1 documents replicated 10x under fresh doc_ids (the 10x
  background), plus
- ONE planted boilerplate cluster: ``m_hot`` distinct doc_ids sharing
  an identical short text (the viral-page shape), i.e. one identical
  minhash signature -> a hot bucket in EVERY band simultaneously
  (strictly more adversarial than the single hot band of skew_stress).

All planted pairs pass the Jaccard gate (identical shingle sets), so
the quadratic survives candidate generation INTO the edge set and the
component stage: the guard in operators/graph.py must measure the edge
count and take the distributed label-propagation path (the driver
union-find shortcut is capped), and survivorship must still name
exactly one planted survivor.

Reported: wall time per stage, the hot-bucket chunk arithmetic
(m, C, task keys), the observed max rows on any (band, sig, chunk)
join-key side — the actual straggler bound — and the correctness
checks (survivor counts; capstone totals consistent with the planted
cluster collapsing to one survivor).

Usage: python tools/composed_skew_stress.py [m_hot] [cap] [replicas]
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SRC = "/root/testdata/sf0.1"
PLANTED_TEXT = (
    "subscribe to our newsletter for updates terms of service privacy "
    "policy all rights reserved contact us about cookies"
)


def build_corpus(spark, dst: str, m_hot: int, replicas: int) -> tuple[int, int]:
    from pyspark.sql import functions as F

    base = spark.read.parquet(f"{SRC}/documents.parquet")
    n_base = base.count()
    background = (
        base.crossJoin(spark.range(replicas).withColumnRenamed("id", "_rep"))
        .withColumn("doc_id", F.col("doc_id") + F.col("_rep") * 1_000_000)
        .drop("_rep")
    )
    hot_base = replicas * 1_000_000 + 1_000_000
    planted = spark.range(m_hot).select(
        (F.col("id") + hot_base).alias("doc_id"),
        F.lit(PLANTED_TEXT).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("planted").alias("source"),
        F.lit(len(PLANTED_TEXT)).alias("n_chars"),
    )
    corpus = background.unionByName(planted)
    corpus.write.mode("overwrite").parquet(f"{dst}/documents.parquet")
    return n_base * replicas, hot_base


def main() -> int:
    # default matches the documented study scale (SCALING.md): 20k
    # planted members -> ~200M planted pairs -> ~10 GB of shuffle
    # spill. The earlier 50k default shuffles ~1.25B pairs (~60 GB of
    # spill), which exhausts this box's /tmp mid-stage and surfaces as
    # executor 'temp_local ... No such file' errors — pass m_hot
    # explicitly on a machine with the disk for it.
    m_hot = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    replicas = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from pyspark.sql import functions as F

    from iceberg_relative_io_spark.operators import northstar, skewpairs
    from iceberg_relative_io_spark.session import get_spark

    if cap != skewpairs.DEFAULT_CAP:
        print(
            f"note: chain runs the production cap {skewpairs.DEFAULT_CAP}; "
            f"cap={cap} applies to the probe arithmetic only"
        )
    spark = get_spark(app_name="composed-skew", master="local[32]",
                      shuffle_partitions=32)
    # cluster-scale modeling: the bands table would never broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    dst = tempfile.mkdtemp(prefix="composed_skew_")
    n_bg, hot_base = build_corpus(spark, dst, m_hot, replicas)
    print(f"corpus: {n_bg} background docs (10x sf0.1) + {m_hot} planted")

    # --- chunk arithmetic + actual per-key bound ---------------------------
    t0 = time.time()
    sigs = northstar._signatures(spark, dst)
    from iceberg_relative_io_spark.functions import text as T

    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    T.band_signature_from_sig(F.col("sig"), b).alias("bsig"),
                )
                for b in range(T.BANDS)
            ])
        ).alias("bs"),
    ).select("doc_id", "bs.band", "bs.bsig")
    left, _ = skewpairs.chunked_sides(bands, ["band", "bsig"], "doc_id", cap=cap)
    key_rows = (
        left.groupBy("band", "bsig", "_cl", "_cr")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    n_chunks = -(-m_hot // cap)
    print(
        f"hot bucket: m={m_hot}, cap={cap} -> C={n_chunks}, "
        f"{n_chunks * (n_chunks + 1) // 2} task keys PER BAND x {T.BANDS} bands; "
        f"observed max rows on one join-key side = {key_rows} "
        f"(featurize+probe {time.time() - t0:.1f}s)"
    )
    # chunk membership is pmod(xxhash64(id), C): sizes fluctuate around
    # m/C with binomial noise, so the bound carries a small slack
    assert key_rows <= cap * 1.1 + 64, "task bound violated"

    # --- the composed chain ------------------------------------------------
    t0 = time.time()
    surv = northstar.q_dedup_survivors(spark, dst)
    planted_surv = (
        surv.filter(F.col("doc_id") >= hot_base)
        .agg(
            F.count("*").alias("n"),
            F.sum("survivor").alias("survivors"),
            F.count_distinct("component").alias("components"),
        )
        .collect()[0]
    )
    t_surv = time.time() - t0
    print(
        f"dedup_survivors: {t_surv:.1f}s — planted rows {planted_surv.n}, "
        f"survivors {planted_surv.survivors}, components {planted_surv.components}"
    )
    assert planted_surv.n == m_hot
    assert planted_surv.survivors == 1, "planted cluster must collapse to 1"
    assert planted_surv.components == 1

    t0 = time.time()
    cap_rows = northstar.q_pipeline_capstone(spark, dst).collect()
    t_cap = time.time() - t0
    total_docs = sum(r.n_docs for r in cap_rows)
    print(f"pipeline_capstone: {t_cap:.1f}s — {total_docs} docs kept across "
          f"{len(cap_rows)} langs")
    # the 49 999 planted duplicates must be gone from the kept set
    assert total_docs < n_bg + 2, "planted duplicates leaked into capstone"
    print("PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
