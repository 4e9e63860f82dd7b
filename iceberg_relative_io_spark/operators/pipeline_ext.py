"""Training-data pipeline extensions, round 2 (SURVEY.md §2.C).

Second batch of the LLM-pipeline operators a 100 TB curation run needs
beyond the first northstar set: intra-document repetition scoring,
train/test contamination detection, per-source quota sampling, and
class-centroid computation over the embedding column. Like every C-layer
op these are driver queries with exact DuckDB oracles: all float
aggregation goes through decimal casts (see relational.py docstring) and
all hashing is the integer family from functions/text.py.

Scale design notes (100 TB):

- Repetition scoring is map-only (per-row array expressions inside
  whole-stage codegen) — no shuffle at all.
- Contamination explodes word 5-grams as BIGINT codes (per-doc
  array_distinct in codegen, no global DISTINCT shuffle); at 100 TB the
  train-side gram set becomes a broadcast bloom filter, turning the semi
  join into a map-side filter.
- Quota sampling is one hash-partition by source + in-partition top-N —
  the canonical skew-safe "cap any single source's contribution" step
  before mixing weights are applied.
- Label centroids shuffle (label, dim) partial sums — 64·|labels| rows —
  regardless of corpus size; the classic distributed-mean shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_relative_io_spark.functions import text as T
from iceberg_relative_io_spark.functions import vectors as _V
from iceberg_relative_io_spark.operators.relational import _dec
from iceberg_relative_io_spark.sources.tables import load_table

_QUOTA = 25  # docs kept per source by the quota sampler
_CONTAM_K = 5  # word n-gram width for contamination detection


def q_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 (quality): intra-document repetition — fraction of word
    trigrams that are repeats of an earlier trigram in the same doc
    (the 'repeated n-grams' filter of Gopher/FineWeb-style cleaning).
    Trigrams live in the integer gram-code space of functions/text.py
    (polynomial token hash — the same approximation every sketch operator
    uses, exactly mirrored in the oracle). The hashing runs as an
    Arrow-batched pandas UDF like the minhash pipeline: the equivalent
    Column expression (aggregate-inside-transform) falls out of
    whole-stage codegen and evaluates interpreted, ~20× slower. Map-only;
    no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    stats = T.make_gram_stats_udf(3)
    sized = docs.select("doc_id", stats(F.col("text")).alias("s")).select(
        "doc_id", F.col("s.n_grams").alias("n_grams"), F.col("s.n_repeats").alias("n_repeats")
    )
    # raw double from exact integer division: IEEE division is correctly
    # rounded, so both engines emit the identical bits — no round() step
    # whose half-way ties could diverge (e.g. 128-gram docs).
    ratio = F.when(
        F.col("n_grams") > 0,
        F.col("n_repeats").cast("double") / F.col("n_grams").cast("double"),
    ).otherwise(F.lit(0.0))
    return sized.select("doc_id", "n_grams", "n_repeats", ratio.alias("rep_ratio"))


def q_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6 (eval hygiene): train→test contamination — test-split documents
    sharing any word 5-gram with any train-split document, per language.
    Splits reuse the content-hash assignment of c06_train_split, so the
    check composes with the split it audits. Grams are integer 5-gram
    codes (functions/text.py — the same polynomial-hash approximation
    every sketch operator uses, mirrored exactly in the oracle), so the
    explosion and the semi join carry BIGINTs, not strings. Intra-doc
    duplicate grams are dropped per-row inside the Arrow-batched hashing
    UDF instead of a global DISTINCT shuffle; the one wide exchange left
    is the gram-keyed semi join (at 100 TB: broadcast a bloom filter of
    the train side instead)."""
    # fan_out measured NEGATIVE here (round-11 A/B: ~2.6s vs ~2.1s) —
    # same two-branch shape as c06_contamination_bloom; left alone
    docs = load_table(spark, sf_dir, "documents")
    bucket = T.fingerprint(F.col("text")) % 100
    # nondeterministic gram UDF + bucket filters BELOW it (guide §4.4):
    # explode's implicit size/notnull predicate on the UDF column
    # otherwise pushes under the projection and re-evaluates the
    # corpus-wide hashing UDF (the plan showed 2 full passes per branch)
    gram_udf = T.make_distinct_gram_codes_udf(_CONTAM_K).asNondeterministic()
    base = docs.select("doc_id", "lang", "text", bucket.alias("bucket"))
    test_docs = base.filter(F.col("bucket") >= 90)
    train_grams = base.filter(F.col("bucket") < 80).select(
        F.explode(gram_udf(F.col("text"))).alias("gram")
    )
    test_grams = test_docs.select(
        "doc_id", F.explode(gram_udf(F.col("text"))).alias("gram")
    )
    hit_docs = (
        test_grams.join(train_grams, "gram", "left_semi").select("doc_id").distinct()
    )
    return (
        test_docs.select("doc_id", "lang")
        .join(hit_docs.withColumn("hit", F.lit(1)), "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_test_docs"),
            F.sum(F.coalesce("hit", F.lit(0))).alias("n_contaminated"),
        )
    )


_FUZZY_TAU = 0.5  # Jaccard threshold for near-dup test leakage


def q_contamination_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6 (eval hygiene, the NEAR-DUP pass): exact 5-gram overlap
    (c06_contamination_check) misses lightly-edited test leakage — the
    fuzzy pass every frontier data card reports. The test split
    (content-hash bucket >= 90, the c06_train_split assignment) probes
    the train split (bucket < 80) through the MinHash LSH band join;
    band collisions are verified with exact Jaccard >= _FUZZY_TAU over
    distinct shingle sets. Output: one verdict row per test doc with
    its best train match (the argmax-Jaccard match, ties to the lowest
    doc_id) and max Jaccard.

    At 100 TB: eval sets are tiny next to the corpus, so the TEST side
    broadcasts and the probe is one map-only pass over the train bands
    — no corpus self-join, the same asymmetric shape as
    c02_incremental_dedup (whose index side is plan-asserted
    shuffle-free)."""
    from iceberg_relative_io_spark.operators.northstar import _signatures, banded

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", (T.fingerprint(F.col("text")) % 100).alias("bucket")
    )
    sigs = _signatures(spark, sf_dir).join(docs, "doc_id")
    bands = banded(sigs, "doc_id", "lang", "sh", "bucket")
    test = bands.filter(F.col("bucket") >= 90)
    train = bands.filter(F.col("bucket") < 80)
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    jacc = inter.cast("double") / (
        F.size(F.col("a.sh")) + F.size(F.col("b.sh")) - inter
    )
    cand = (
        F.broadcast(test.alias("a"))
        .join(
            train.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bsig") == F.col("b.bsig")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id"),
            F.col("b.doc_id").alias("match_id"),
            jacc.alias("jaccard"),
        )
        .distinct()
        .filter(F.col("jaccard") >= _FUZZY_TAU)
    )
    # best = the ARGMAX-Jaccard match (ties to the lowest doc_id), so
    # the (best_train_match, max_jaccard) pair actually co-occurred —
    # a leak-triage report must point at the right document
    wbest = Window.partitionBy("doc_id").orderBy(
        F.col("jaccard").desc(), "match_id"
    )
    matches = (
        cand.withColumn("rn", F.row_number().over(wbest))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_train_matches"),
            F.max(F.when(F.col("rn") == 1, F.col("match_id"))).alias(
                "best_train_match"
            ),
            F.max("jaccard").alias("max_jaccard"),
        )
    )
    test_docs = test.select("doc_id", "lang").distinct()
    return test_docs.join(F.broadcast(matches), "doc_id", "left").select(
        "doc_id",
        "lang",
        F.coalesce("n_train_matches", F.lit(0)).alias("n_train_matches"),
        F.coalesce("best_train_match", F.lit(-1)).alias("best_train_match"),
        F.coalesce("max_jaccard", F.lit(0.0)).alias("max_jaccard"),
        (F.coalesce("n_train_matches", F.lit(0)) > 0)
        .cast("int")
        .alias("is_contaminated"),
    )


def q_source_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6 (mixing): per-source quota sampling — keep at most N documents
    per source, chosen deterministically (lowest doc_id), the skew-safe
    'no single crawl dominates the mix' cap. One hash partition by
    source; rank-and-filter stays in-partition."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id")
    return (
        docs.select("doc_id", "source", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= _QUOTA)
        .select("doc_id", "source", "rn")
    )


def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 (clustering support): per-label centroid of the embedding
    column — posexplode to (label, dim) partial sums (decimal-exact, so
    the distributed mean matches DuckDB's sequential one bit-for-bit),
    emitted as one row per component. The shuffle carries 64·|labels|
    partial rows however large the corpus is. Each mean is an exact
    decimal sum divided by a count — identical doubles on both engines
    with no second rounding step (a deeper decimal re-cast of the
    squared means diverges: DuckDB's double→decimal cast rounds via a
    double multiply, Spark's via exact BigDecimal expansion)."""
    emb = load_table(spark, sf_dir, "embeddings")
    # float -> shortest-round-trip string -> decimal: both engines render
    # a float with the same (<=9 significant digit) string, and parsing
    # that string into DECIMAL(38,18) is exact — unlike a double->decimal
    # cast, which DuckDB performs with a rounding double multiply. The
    # exact sum is then rescaled to 10 decimals BEFORE the double cast:
    # at scale 10 the scaled integer stays under 2^53, where both
    # engines' decimal->double conversion is correctly rounded (DuckDB's
    # int128-sized conversion at scale 18 is off by an ulp).
    term = F.col("val").cast("string").cast("decimal(38,18)")
    mean = F.sum(term).cast("decimal(38,10)").cast("double") / F.count("*")
    return (
        emb.select("label", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(
            F.count("*").alias("n_vecs"),
            mean.alias("centroid_val"),
        )
    )


def q_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5 (audio feature extraction): binary payload → 8-bit PCM decode
    (deterministic stub; this container has no audio codec) → overlapping
    256-sample windows at hop 128 → integer per-window energy, all
    inside Arrow batches via mapInPandas (functions/multimodal.py).
    The same stage with a real soundfile decoder is the 100 TB shape.

    Oracle parity invariant: the Spark stage samples the UTF-8 BYTES of
    the payload while the SQL oracle samples per-CHARACTER codepoints
    (DuckDB has no blob-byte iteration) — identical only while the
    documents fixture is pure ASCII, which
    tests/test_northstar.py::test_documents_fixture_is_ascii enforces so
    a regenerated non-ASCII fixture fails loudly instead of hash-flaking."""
    from iceberg_relative_io_spark.functions import multimodal as M

    docs = load_table(spark, sf_dir, "documents")
    return M.audio_energy_stage(M.to_multimodal(docs))


_PQ_NCENT = 32  # FIXED sub-codebook size — constant in the corpus
_PQ_SUB = 8  # subspaces (64 dims -> 8 x 8-dim)


def q_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 (compression): product quantization — each embedding split into
    8 8-dim subvectors, each assigned to its nearest sub-codebook entry
    by L2. Sub-codebooks are the ``_PQ_NCENT``-row bounded hash-sample
    of functions/vectors.py (standing in for trained sub-codebooks; the
    assignment plumbing is identical) — the driver collects exactly
    ncent rows however large the corpus is, never O(N). The codebook
    broadcasts; assignment is ONE map-only pass vectorized across the
    whole Arrow batch (a (rows × centroids) distance block per subspace,
    accumulated dimension-SEQUENTIALLY so the oracle's per-centroid fold
    reproduces the exact distances; np.argmin takes the first minimum
    and centroids are id-sorted, matching the oracle's ORDER BY dist,
    cid). 8 small codes per vector ≈ 32× compression — the memory step
    between int8 and full floats for ANN at 100 TB."""
    emb = load_table(spark, sf_dir, "embeddings")
    # session-cached codebook broadcast, shared with c03_ann_ivfpq
    # (round 11); make_pq_assign_udf reads (ids, matrix) off the triple
    bc = _V.centroids_broadcast(
        spark, sf_dir, emb.select("vec_id", "embedding"), _PQ_NCENT
    )
    pq_assign = _V.make_pq_assign_udf(bc, _PQ_SUB)

    return emb.select(
        "vec_id", F.posexplode(pq_assign("embedding")).alias("subspace", "code")
    )


QUERIES = {
    "c04_repetition_ratio": q_repetition_ratio,
    "c06_contamination_check": q_contamination_check,
    "c06_contamination_fuzzy": q_contamination_fuzzy,
    "c06_source_quota_sample": q_source_quota_sample,
    "c03_label_centroids": q_label_centroids,
    "c05_audio_energy": q_audio_energy,
    "c03_pq_codes": q_pq_codes,
}


_CODES_SQL = T.token_codes_sql("text")


def _gram_cte(k: int) -> str:
    return (
        "WITH g AS (SELECT doc_id, lang, text, "
        f"{T.gram_codes_sql(_CODES_SQL, k)} AS grams FROM documents)"
    )


ORACLE = {
    "c04_repetition_ratio": f"""
        {_gram_cte(3)}
        SELECT doc_id,
               CAST(len(grams) AS INT) AS n_grams,
               CAST(len(grams) - len(list_distinct(grams)) AS INT) AS n_repeats,
               CASE WHEN len(grams) > 0
                    THEN CAST(len(grams) - len(list_distinct(grams)) AS DOUBLE)
                         / CAST(len(grams) AS DOUBLE)
                    ELSE 0.0 END AS rep_ratio
        FROM g
    """,
    "c06_contamination_fuzzy": None,  # built below (needs northstar CTEs)
    "c06_contamination_check": f"""
        WITH g AS (SELECT doc_id, lang,
                          ({T.fingerprint_sql('text')}) % 100 AS bucket,
                          list_distinct({T.gram_codes_sql(_CODES_SQL, _CONTAM_K)}) AS grams
                   FROM documents),
        train_grams AS (
            SELECT DISTINCT gram FROM g, UNNEST(grams) AS u(gram) WHERE bucket < 80),
        test_docs AS (SELECT doc_id, lang, grams FROM g WHERE bucket >= 90),
        hits AS (
            SELECT DISTINCT doc_id
            FROM (SELECT doc_id, gram FROM test_docs, UNNEST(grams) AS u(gram))
            WHERE gram IN (SELECT gram FROM train_grams))
        SELECT lang,
               count(*) AS n_test_docs,
               CAST(COALESCE(SUM(CASE WHEN doc_id IN (SELECT doc_id FROM hits) THEN 1 ELSE 0 END), 0)
                    AS BIGINT) AS n_contaminated
        FROM test_docs
        GROUP BY lang
    """,
    "c06_source_quota_sample": f"""
        SELECT doc_id, source, rn
        FROM (SELECT doc_id, source,
                     CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id) AS INT) AS rn
              FROM documents)
        WHERE rn <= {_QUOTA}
    """,
    "c05_audio_energy": """
        WITH p AS (
            SELECT doc_id AS item_id, len(text) AS n_chars0,
                   list_transform(string_split(text, ''), ch -> CAST(ascii(ch) AS BIGINT)) AS s
            FROM documents),
        w AS (
            -- window count from len(text), NOT len(s): DuckDB's
            -- string_split('', '') is [''] (one bogus element), while the
            -- Spark stage sees zero bytes (fuzz seed 9 regression)
            SELECT item_id, CAST(u.i AS INT) AS win_idx,
                   s[CAST(u.i * 128 + 1 AS BIGINT) : CAST(u.i * 128 + 256 AS BIGINT)] AS win
            FROM p, UNNEST(range(0, CAST(ceil(n_chars0 / 128.0) AS BIGINT))) AS u(i))
        SELECT item_id, win_idx,
               CAST(len(win) AS INT) AS n_samples,
               CAST(list_sum([ (c - 128) * (c - 128) FOR c IN win ]) AS BIGINT) AS energy
        FROM w
    """,
    "c03_pq_codes": f"""
        WITH cent AS (
            {_V.sample_cte_sql(_PQ_NCENT, 'cid', 'cemb')}),
        pairs AS (
            SELECT e.vec_id, sub.s AS subspace, c.cid,
                   list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                       [ (CAST(e.embedding[sub.s * 8 + j] AS DOUBLE)
                          - CAST(c.cemb[sub.s * 8 + j] AS DOUBLE))
                         * (CAST(e.embedding[sub.s * 8 + j] AS DOUBLE)
                            - CAST(c.cemb[sub.s * 8 + j] AS DOUBLE))
                         FOR j IN range(1, 9) ]),
                       (acc, x) -> acc + x) AS dist
            FROM embeddings e, cent c,
                 (SELECT CAST(u.i AS INT) AS s FROM UNNEST(range(0, {_PQ_SUB})) AS u(i)) sub
            -- NULL vectors emit no codes: the engine's posexplode over
            -- the UDF's NULL array produces zero rows
            WHERE e.embedding IS NOT NULL)
        SELECT vec_id, subspace, cid AS code
        FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, subspace
                                           ORDER BY dist, cid) AS rn
              FROM pairs)
        WHERE rn = 1
    """,
    "c03_label_centroids": """
        SELECT label, CAST(i - 1 AS INT) AS pos,
               count(*) AS n_vecs,
               CAST(CAST(ROUND(SUM(CAST(CAST(embedding[i] AS VARCHAR) AS DECIMAL(38,18))), 10)
                         AS DECIMAL(38,10)) AS DOUBLE)
                 / count(*) AS centroid_val
        FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS r(i)
        GROUP BY label, i
    """,
}


def _fuzzy_contamination_oracle() -> str:
    """Oracle twin of q_contamination_fuzzy: the same shingle/minhash/
    band builders as c02_incremental_dedup's oracle, the bucket split of
    c06_contamination_check, verification Jaccard over DISTINCT shingle
    sets (Spark's sh column IS the distinct set)."""
    from iceberg_relative_io_spark.operators.northstar import (
        _MINS,
        _docs_with_shingles_cte,
    )

    band_vals = ", ".join(
        f"({b}, {T.band_signature_sql(_MINS, b)})" for b in range(T.BANDS)
    )
    return (
        _docs_with_shingles_cte()
        + f""",
        bk AS (SELECT doc_id, ({T.fingerprint_sql('text')}) % 100 AS bucket
               FROM documents),
        bands AS (SELECT s.doc_id, s.lang, s.shingles, bk.bucket, band, sig
                  FROM sh s JOIN bk ON s.doc_id = bk.doc_id,
                       LATERAL (VALUES {band_vals}) AS t(band, sig)),
        verified AS (
            SELECT DISTINCT a.doc_id, b.doc_id AS match_id,
                   CAST(len(list_intersect(list_distinct(a.shingles), list_distinct(b.shingles))) AS DOUBLE)
                   / (len(list_distinct(a.shingles)) + len(list_distinct(b.shingles))
                      - len(list_intersect(list_distinct(a.shingles), list_distinct(b.shingles)))) AS jaccard
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.sig = b.sig
            WHERE a.bucket >= 90 AND b.bucket < 80
        ),
        matches AS (
            SELECT doc_id, count(*) AS n_train_matches,
                   max(CASE WHEN rn = 1 THEN match_id END) AS best_train_match,
                   max(jaccard) AS max_jaccard
            FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                               ORDER BY jaccard DESC, match_id) AS rn
                  FROM verified WHERE jaccard >= {_FUZZY_TAU!r})
            GROUP BY doc_id
        )
        SELECT t.doc_id, t.lang,
               CAST(COALESCE(m.n_train_matches, 0) AS BIGINT) AS n_train_matches,
               COALESCE(m.best_train_match, -1) AS best_train_match,
               COALESCE(m.max_jaccard, 0.0) AS max_jaccard,
               CAST(COALESCE(m.n_train_matches, 0) > 0 AS INT) AS is_contaminated
        FROM (SELECT d.doc_id, d.lang FROM documents d JOIN bk ON d.doc_id = bk.doc_id
              WHERE bk.bucket >= 90) t
        LEFT JOIN matches m ON t.doc_id = m.doc_id
        """
    )


ORACLE["c06_contamination_fuzzy"] = _fuzzy_contamination_oracle()
