#!/usr/bin/env python3
"""Random-fixture oracle fuzz: the correctness gate on ARBITRARY inputs.

check_oracle.py proves Spark == DuckDB on the one driver fixture; this
tool amplifies that to randomized fixtures — per seed it builds a
mutated mini-corpus (row subsamples of every table, plus adversarial
document mutations: empty text, single-token text, concatenated pairs,
truncations, duplicated content under fresh ids) and runs the SAME
side-by-side comparison. Both engines read the same parquet, so broken
foreign keys or empty groups are legitimate inputs — any divergence is
a real engine/oracle bug, not a data problem.

Usage: python tools/fuzz_oracle.py [n_seeds] [query ...]
Defaults to 3 seeds over the hash/float/window-sensitive query subset.
"""

from __future__ import annotations

import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SRC = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# the operators most exposed to data-shape edge cases: float folds,
# integer hash families, window/sessionization logic, gram explosions
DEFAULT_QUERIES = [
    "c01_exact_dedup", "c02_minhash_signatures", "c02_lsh_candidate_pairs",
    "c02_simhash", "c02_dedup_survivors", "c02_duplicate_ngrams",
    "c02_substring_removal", "c02_doc_containment", "c02_score_propagation",
    "c02_threshold_sweep", "c02_cluster_size_histogram",
    "c03_knn_bruteforce", "c03_ann_ivf", "c03_semantic_dedup",
    "c03_outlier_filter", "c03_quantize_int8",
    "c04_term_frequency", "c04_langid", "c04_quality_score",
    "c04_token_count", "c04_fingerprint", "c04_chunking",
    "c04_sequence_packing", "c04_text_normalize", "c04_bm25_search",
    "c04_bigram_logprob", "c04_vocab_build", "c04_token_ids",
    "c05_scene_cuts", "c05_keyframes", "c05_audio_vad",
    "c05_video_neardup", "c05_image_hash_neardup",
    "c06_curriculum_order", "c06_train_split", "c06_shard_shuffle",
    "b12_asof_join", "b13_sessionization", "b15_exact_percentiles",
    "b19_window_frames", "b17_scd2_intervals", "c03_hard_negatives",
    "c03_knn_graph", "c06_contamination_fuzzy",
    # round 9: segment explosion + order-preserving reassembly is
    # edge-sensitive (empty docs, one-token docs, NULL text); the
    # diversity cap rides the two-level quantizer + hash sampler
    "c04_boilerplate_removal", "c03_diversity_cap",
    # round 10: BPE pair extraction is edge-sensitive (1-char words,
    # empty tokens from double spaces, NULL text, replace-boundary
    # overlaps); the graph beam composes the quantizer + graph + hash
    # entry sample under subsampled/NULL-injected embeddings
    "c04_bpe_pair_merges", "c04_bpe_encode", "c03_ann_graph_beam",
    # round 11: the recall evals compose an index probe AND the
    # brute-force side over the same fuzzed/NULL-injected embeddings
    "c03_graph_recall_eval", "c03_ivf_recall_eval",
    "c03_pq_recall_eval", "c03_rerank_recall_eval",
    # round-6 widened sweep: every one of these diverged (or crashed)
    # under NULL injection before the round-6 NULL-semantics pass
    "c01_embedding_neardup", "c03_cluster_medoids", "c03_kmeans_lloyd",
    "c03_kmeans_inertia", "c03_pq_codes", "c04_classifier_score",
    "c05_binary_ingest", "c05_resize_pipeline", "c06_dataset_card",
    "c06_quality_sampling", "b32_python_udtf", "b32_apply_in_pandas",
    "b26_higher_order_funs", "b27_variant_json",
]


def build_fuzz_fixture(dst: Path, seed: int, nulls: bool = False) -> None:
    import duckdb

    con = duckdb.connect()
    dst.mkdir(parents=True, exist_ok=True)
    frac = 0.2 + (seed % 7) * 0.1  # 20%-80% subsamples
    for t in TABLES:
        if t in ("documents", "events", "embeddings"):
            continue
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet') "
            f"USING SAMPLE {int(frac * 100)} PERCENT (bernoulli, {seed})) "
            f"TO '{dst}/{t}.parquet' (FORMAT parquet)"
        )
    # embeddings: subsample; NULL mode adds rows with NULL vector/label —
    # every similarity/clustering/quantization operator must agree with
    # its oracle on what a missing vector contributes (round-4 verdict
    # item 5: NULLs were never injected into embedding columns)
    null_emb = (
        f"""
        UNION ALL
        SELECT m.m + 1, NULL, 0 FROM max_id m
        UNION ALL
        SELECT m.m + 2, NULL, NULL FROM max_id m
        UNION ALL
        SELECT m.m + 3 + row_number() OVER (), b.embedding, NULL
        FROM (SELECT * FROM base USING SAMPLE 10 PERCENT (bernoulli, {seed + 5})) b,
             max_id m
        """
        if nulls
        else ""
    )
    con.execute(
        f"""
        COPY (
            WITH base AS (
                SELECT * FROM read_parquet('{SRC}/embeddings.parquet')
                USING SAMPLE {int(frac * 100)} PERCENT (bernoulli, {seed})
            ),
            max_id AS (SELECT COALESCE(max(vec_id), 0) AS m
                       FROM read_parquet('{SRC}/embeddings.parquet'))
            SELECT * FROM base {null_emb}
        ) TO '{dst}/embeddings.parquet' (FORMAT parquet)
        """
    )
    # NULL mode: events rows with NULL event_type/value/props under
    # fresh ids (ts and user_id stay real — the session/as-of ORDER keys)
    null_ev = (
        f"""
        UNION ALL
        SELECT m.m + 500000 + row_number() OVER (), b.ts, b.user_id,
               CASE WHEN b.event_id % 3 = 0 THEN NULL ELSE b.event_type END,
               CASE WHEN b.event_id % 3 = 1 THEN NULL ELSE b.value END,
               CASE WHEN b.event_id % 3 = 2 THEN NULL ELSE b.props END
        FROM (SELECT * FROM base USING SAMPLE 15 PERCENT (bernoulli, {seed + 6})) b,
             max_id m
        UNION ALL
        -- NULL user_id: the PARTITION key of sessionization / as-of /
        -- window queries — both engines must group the NULL partition
        -- identically
        SELECT m.m + 600000 + row_number() OVER (), b.ts, NULL,
               b.event_type, b.value, b.props
        FROM (SELECT * FROM base USING SAMPLE 5 PERCENT (bernoulli, {seed + 7})) b,
             max_id m
        """
        if nulls
        else ""
    )
    # events: subsample + timestamp-tie mutations — as-of joins,
    # sessionization, and window frames must tie-break deterministically
    # when several events share (user_id, ts); fresh event_ids keep the
    # pk unique while the ORDER keys collide
    con.execute(
        f"""
        COPY (
            WITH base AS (
                SELECT * FROM read_parquet('{SRC}/events.parquet')
                USING SAMPLE {int(frac * 100)} PERCENT (bernoulli, {seed})
            ),
            max_id AS (SELECT COALESCE(max(event_id), 0) AS m
                       FROM read_parquet('{SRC}/events.parquet')),
            ties AS (
                SELECT m.m + 1 + row_number() OVER () AS event_id,
                       b.ts, b.user_id, b.event_type,
                       b.value + 0.5 AS value, b.props
                FROM (SELECT * FROM base
                      USING SAMPLE 30 PERCENT (bernoulli, {seed + 4})) b,
                     max_id m
            )
            SELECT * FROM base UNION ALL SELECT * FROM ties {null_ev}
        ) TO '{dst}/events.parquet' (FORMAT parquet)
        """
    )
    # NULL mode: documents with NULL text / NULL lang / NULL n_chars —
    # tokenizers, language heuristics, hashes and length stats must all
    # treat a missing document identically in both engines
    null_doc = (
        """
        UNION ALL
        SELECT m.m + 3000, NULL, 'en', 'fuzz-null', NULL FROM max_id m
        UNION ALL
        SELECT m.m + 3001, NULL, NULL, 'fuzz-null', NULL FROM max_id m
        UNION ALL
        SELECT m.m + 3002, 'text with null lang', NULL, 'fuzz-null', 19
        FROM max_id m
        UNION ALL
        SELECT m.m + 3003, '', NULL, 'fuzz-null', NULL FROM max_id m
        """
        if nulls
        else ""
    )
    # documents: subsample + adversarial mutations under fresh ids
    con.execute(
        f"""
        COPY (
            WITH base AS (
                SELECT * FROM read_parquet('{SRC}/documents.parquet')
                USING SAMPLE {int(frac * 100)} PERCENT (bernoulli, {seed})
            ),
            max_id AS (SELECT COALESCE(max(doc_id), 0) AS m
                       FROM read_parquet('{SRC}/documents.parquet')),
            mutated AS (
                -- empty + single-token + truncated + concatenated +
                -- verbatim duplicate content, all under fresh doc_ids
                SELECT m.m + 1 AS doc_id, '' AS text, 'en' AS lang,
                       'fuzz' AS source, 0 AS n_chars FROM max_id m
                UNION ALL
                SELECT m.m + 2, 'x', 'en', 'fuzz', 1 FROM max_id m
                UNION ALL
                SELECT m.m + 3 + row_number() OVER (),
                       substr(b.text, 1, 1 + (b.doc_id % 40)),
                       b.lang, 'fuzz-trunc', 1 + (b.doc_id % 40)
                FROM (SELECT * FROM base
                      USING SAMPLE 25 PERCENT (bernoulli, {seed + 1})) b,
                     max_id m
                UNION ALL
                SELECT m.m + 1000 + row_number() OVER (),
                       a.text || ' ' || b.text, a.lang, 'fuzz-concat',
                       len(a.text) + 1 + len(b.text)
                FROM (SELECT * FROM base
                      USING SAMPLE 20 PERCENT (bernoulli, {seed + 2})) a
                  JOIN base b ON b.doc_id = a.doc_id + 1
                  CROSS JOIN max_id m
                UNION ALL
                SELECT m.m + 2000 + row_number() OVER (), b.text, b.lang,
                       'fuzz-dup', b.n_chars
                FROM (SELECT * FROM base
                      USING SAMPLE 30 PERCENT (bernoulli, {seed + 3})) b,
                     max_id m
            )
            SELECT * FROM base UNION ALL SELECT * FROM mutated {null_doc}
        ) TO '{dst}/documents.parquet' (FORMAT parquet)
        """
    )


def main() -> int:
    """fuzz_oracle.py [--nulls] [n_seeds] [query ...]

    --nulls additionally injects NULLs into text/lang/embedding/label/
    event_type/value/props columns (round-4 verdict item 5)."""
    args = sys.argv[1:]
    nulls = "--nulls" in args
    args = [a for a in args if a != "--nulls"]
    n_seeds = int(args[0]) if args and args[0].isdigit() else 3
    queries = [a for a in args if not a.isdigit()] or DEFAULT_QUERIES

    rc = 0
    for seed in range(1, n_seeds + 1):
        dst = Path(tempfile.mkdtemp(prefix=f"fuzz_fixture_{seed}_"))
        build_fuzz_fixture(dst, seed, nulls=nulls)
        print(f"=== seed {seed}: {dst} (nulls={nulls}) ===", flush=True)
        r = subprocess.run(
            [sys.executable, str(REPO / "tools" / "check_oracle.py"),
             str(dst), *queries],
        )
        rc |= r.returncode
    return rc


if __name__ == "__main__":
    sys.exit(main())
