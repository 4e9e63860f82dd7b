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
    "b19_window_frames",
]


def build_fuzz_fixture(dst: Path, seed: int) -> None:
    import duckdb

    con = duckdb.connect()
    dst.mkdir(parents=True, exist_ok=True)
    frac = 0.2 + (seed % 7) * 0.1  # 20%-80% subsamples
    for t in TABLES:
        if t in ("documents", "events"):
            continue
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet') "
            f"USING SAMPLE {int(frac * 100)} PERCENT (bernoulli, {seed})) "
            f"TO '{dst}/{t}.parquet' (FORMAT parquet)"
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
            SELECT * FROM base UNION ALL SELECT * FROM ties
        ) TO '{dst}/events.parquet' (FORMAT parquet)
        """
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
            SELECT * FROM base UNION ALL SELECT * FROM mutated
        ) TO '{dst}/documents.parquet' (FORMAT parquet)
        """
    )


def main() -> int:
    args = sys.argv[1:]
    n_seeds = int(args[0]) if args and args[0].isdigit() else 3
    queries = [a for a in args if not a.isdigit()] or DEFAULT_QUERIES

    rc = 0
    for seed in range(1, n_seeds + 1):
        dst = Path(tempfile.mkdtemp(prefix=f"fuzz_fixture_{seed}_"))
        build_fuzz_fixture(dst, seed)
        print(f"=== seed {seed}: {dst} ===", flush=True)
        r = subprocess.run(
            [sys.executable, str(REPO / "tools" / "check_oracle.py"),
             str(dst), *queries],
        )
        rc |= r.returncode
    return rc


if __name__ == "__main__":
    sys.exit(main())
