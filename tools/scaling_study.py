#!/usr/bin/env python3
"""Scaling study: measure flagship queries at sf0.1 and at a synthetic
10× corpus (facts duplicated 10×, dims kept — the realistic shape: fact
tables grow, dimensions don't), and report the wall-clock ratio. A
scale-ready plan costs ~10× for 10× data (linear); super-linear growth
exposes a shuffle or a driver-side bottleneck. Results are recorded in
SCALING.md.

Usage: python tools/scaling_study.py [synth_dir] [query_name ...]
(query names restrict the run to a subset of MEASURED)
"""

from __future__ import annotations

import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SRC = "/root/testdata/sf0.1"
FACTS = ["lineitem", "orders", "documents", "embeddings", "events"]
DIMS = ["customer", "supplier", "part", "nation", "region"]
MEASURED = [
    "b10_star_broadcast",
    "b13_agg_pricing_summary",
    "b07_join_inner",
    "b17_window_rank",
    "c01_exact_dedup",
    "c02_minhash_signatures",
    "c03_knn_bruteforce",
    "c04_quality_score",
    "b07_skew_salted_join",
    "b15_cms_heavy_hitters",
    "c04_sequence_packing",
    "c06_train_split",
    "b34_tpch_q3",
    "b34_tpch_q18",
    "c04_repetition_ratio",
    "c06_contamination_check",
    "c02_duplicate_ngrams",
    # round 3: bounded-centroid ANN family + LSH-blocked near-dup +
    # derived-partsupp TPC-H
    "c01_embedding_neardup",
    "c03_ann_ivf",
    "c03_cluster_medoids",
    "c03_kmeans_lloyd",
    "c03_pq_codes",
    "b34_tpch_q9",
    "b34_tpch_q21",
    # round 3 batch 2: new training-pipeline operators
    "c03_semantic_dedup",
    "c04_bm25_search",
    "c04_bigram_logprob",
    "c06_shard_shuffle",
    "c02_connected_components",
    "c02_substring_removal",
    # round 3 batch 3: corpus-prep + composed-ANN operators
    "c04_vocab_build",
    "c04_token_ids",
    "c04_classifier_score",
    "c02_incremental_dedup",
    "c03_ann_ivfpq",
    # round 3 batch 4: retrieval/fusion + multimodal + selection ops
    "c03_hybrid_rrf",
    "c03_ann_rerank",
    "c04_phrase_mining",
    "c05_image_hash_neardup",
    "c05_scene_cuts",
    "c06_quality_sampling",
    # round 4 additions (the knob queries above now run their
    # corpus-derived defaults — no manual override needed)
    "c05_video_neardup",
    "c03_outlier_filter",
    "c06_curriculum_order",
    "c02_dedup_survivors",
    "c05_audio_vad",
    "c04_text_normalize",
    "c02_score_propagation",
    # round 8 additions: SCD2 interval build + the TPC-H literals
    "b17_scd2_intervals",
    "b34_tpch_q1",
    "b34_tpch_q4",
    "b34_tpch_q12",
    "b34_tpch_q14",
    # round 8 batch 2: retrieval-training data ops
    "c03_hard_negatives",
    "c03_knn_graph",
    "c06_contamination_fuzzy",
    # round 9: segment-level boilerplate removal + diversity cap
    "c04_boilerplate_removal",
    "c03_diversity_cap",
    # round 10: BPE trainer rounds + graph-ANN beam serving
    "c04_bpe_pair_merges",
    "c04_bpe_encode",
    "c03_ann_graph_beam",
    # round 11: recall evals of every approximate serving path
    "c03_graph_recall_eval",
    "c03_ivf_recall_eval",
    "c03_pq_recall_eval",
    "c03_rerank_recall_eval",
]


_REKEY = {"lineitem": "l_orderkey", "orders": "o_orderkey"}


def build_synth(dst: str, factor: int = 10, rekey: bool = False) -> None:
    """Duplicate facts ``factor``x. Two shapes, both legitimate:

    - default (keys repeat): models a re-crawl corpus — groups get
      deeper, id-joined fact-fact pairs multiply QUADRATICALLY (each of
      k copies of a key matches all k copies on the other side). Right
      for dedup/agg scaling, misleading for fact-fact join ratios.
    - ``rekey`` (order keys offset per replica): models organic growth —
      new orders with new ids, lineitems following their order. Join
      output scales linearly; dims stay shared. Right for join scaling.
    """
    import duckdb

    out = Path(dst)
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    for t in FACTS:
        key = _REKEY.get(t) if rekey else None
        if key:
            sel = (
                f"SELECT t.* REPLACE (t.{key} + r.range * 100000000 AS {key}) "
                f"FROM read_parquet('{SRC}/{t}.parquet') t, range({factor}) r"
            )
        else:
            sel = (
                f"SELECT t.* FROM read_parquet('{SRC}/{t}.parquet') t, "
                f"range({factor})"
            )
        con.execute(f"COPY ({sel}) TO '{out}/{t}.parquet' (FORMAT parquet)")
    for t in DIMS:
        shutil.copy(f"{SRC}/{t}.parquet", out / f"{t}.parquet")


def main() -> None:
    args = sys.argv[1:]
    synth = args[0] if args and "/" in args[0] else "/tmp/sf1_synth"
    only = [a for a in args if "/" not in a and not a.startswith("factor=")]
    factor = next(
        (int(a.split("=", 1)[1]) for a in args if a.startswith("factor=")), 10
    )
    rekey = any(a == "rekey" for a in args)
    only = [a for a in only if a != "rekey"]
    if not Path(synth, "lineitem.parquet").exists():
        print(f"building {synth} ({factor}x facts, rekey={rekey}) ...", flush=True)
        build_synth(synth, factor, rekey)

    import __spark_entry__ as e
    from iceberg_relative_io_spark.session import get_spark

    spark = get_spark(app_name="scaling")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    qs = e.queries()

    def run(name: str, sf_dir: str) -> float:
        from iceberg_relative_io_spark.caches import release_session_caches

        # the shared featurization caches would make the base timing
        # unrepresentative of a cold pipeline — measure uncached (all
        # per-session persists: LSH signatures, hyperplane buckets,
        # two-level cell assignments + derived nlist, image hashes,
        # video keyframes, and the hot-bucket probes — every cache the
        # operator modules registered with iceberg_relative_io_spark.caches)
        release_session_caches(spark)
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    print(f"{'query':32} {'sf0.1':>8} {'10x':>8} {'ratio':>6}")
    for name in (only or MEASURED):
        run(name, SRC)  # warm (codegen, Python workers)
        base = run(name, SRC)
        big = run(name, synth)
        print(f"{name:32} {base:8.2f} {big:8.2f} {big / base:6.1f}")


if __name__ == "__main__":
    main()
