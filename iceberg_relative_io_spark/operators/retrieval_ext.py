"""Hybrid retrieval + multimodal near-dup (SURVEY.md §2.C extensions).

Operators every modern training-data / RAG pipeline runs that the
earlier §2.C batches didn't cover:

- **hybrid RRF retrieval** (``c03_hybrid_rrf``): fuse a lexical BM25
  ranking with a semantic cosine ranking by reciprocal-rank fusion
  (RRF, Cormack et al. SIGIR'09): ``score(d) = Σ 1/(K + rank_i(d))``
  over the rankers that returned d. RRF is the standard production
  fusion because it needs no score calibration — only ranks — which
  also makes it integer-exact to oracle-check.
- **two-stage ANN rerank** (``c03_ann_rerank``): coarse cosine over a
  truncated dim prefix shortlists candidates; the exact full-dim
  cosine reranks only the shortlist — the Matryoshka/truncated-index
  serving pattern, where only the coarse pass touches the corpus.
- **image average-hash near-dup** (``c05_image_hash_neardup``): the
  visual near-dup step of a multimodal pipeline. Each payload is
  "decoded" to a deterministic 8×8 luminance grid (the container has
  no codec libs, so decode is the documented deterministic stand-in:
  64 evenly-spaced payload bytes — the Spark-side plumbing is the real
  thing), average-hashed to 64 bits, and near-dups are found by banded
  Hamming match (Manku et al., WWW'07): 8 exact-match bands of 8 bits
  generate candidates (pigeonhole: Hamming ≤ 7 ⇒ at least one of 8
  bands identical, so candidate generation is EXACT for the verify
  threshold), then the full 64-bit Hamming distance verifies.

Scale design (100 TB):
- RRF fuses two already-top-k tables: k rows per ranker per query —
  constant-size work independent of corpus size; the corpus passes are
  inside the upstream rankers (one postings shuffle for BM25, one
  map-only scan for the cosine top-k, which compiles to
  TakeOrderedAndProject — no global sort). A multi-query batch is the
  same plan partitioned by query_id.
- average-hash is one Arrow-batched map pass (the materialized hot
  path — see _hashed vs the _hashed_expr reference semantics); the
  band join shuffles only (band idx, band value, 8 band ints) per
  row and probes 8 buckets per image. Band-value skew (many identical
  images → one hot bucket) is the known hazard; the identical-hash
  cluster is detected by the exact-dedup pass upstream, and the band
  width must grow with log2(corpus) — exactly the LSH plane-count knob
  (vectors.lsh_bucket docstring) — to keep expected bucket occupancy,
  and with it the within-bucket quadratic verify, constant per row.

Reference parity: the reference (lightmelodies/iceberg-relative-io)
delegates its query surface to Spark/Iceberg; these are §2.C pipeline
extensions the task brief asks for on top, expressed DataFrame-first.
"""

from __future__ import annotations

import pandas as pd  # module-level so pandas-UDF type hints resolve
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_relative_io_spark import caches
from iceberg_relative_io_spark.operators import roundthree as _roundthree
from iceberg_relative_io_spark.operators import skewpairs
from iceberg_relative_io_spark.sources.tables import load_table

# Shared-featurization caches (round 7 — the same pattern the LSH family
# got in round 6, northstar.py:180): the image-hash and video-keyframe
# featurizations are consumed from BOTH sides of their chunked
# self-joins plus the occupancy pre-count plus the final left join, so
# an uncached plan recomputes the corpus pass 4-5×. Persist once per
# (session, sf_dir[, knob]); the hot-bucket probe runs once and the
# healthy-corpus case (empty hot list) drops the occupancy join from
# the per-pass plan entirely via NO_HOT_BUCKETS. At 100 TB both cached
# frames are far smaller than the corpus (doc_id + n_bands longs;
# 5-int scene rows) — the standard shared-featurization trade.
_HASH_CACHE: dict[tuple, DataFrame] = caches.register_cache({})
_HASH_HOT_CACHE: dict[tuple, object] = caches.register_cache({})
_KF_CACHE: dict[tuple, DataFrame] = caches.register_cache({})
_KF_HOT_CACHE: dict[tuple, object] = caches.register_cache({})


def _probe_hot(cache: dict, key: tuple, df: DataFrame, cols: list[str]):
    """One occupancy pre-count per cache key, persisted; empty hot list
    (the healthy-corpus case) short-circuits to NO_HOT_BUCKETS so later
    passes skip the broadcast occupancy join entirely."""
    if key not in cache:
        hot = skewpairs.hot_buckets(df.select(*cols), cols).persist()
        if hot.isEmpty():
            hot.unpersist()
            cache[key] = skewpairs.NO_HOT_BUCKETS
        else:
            cache[key] = hot
    return cache[key]


# ---------------------------------------------------------------------------
# C3 — hybrid lexical+semantic retrieval via reciprocal-rank fusion
# ---------------------------------------------------------------------------

_RRF_K = 60          # the canonical RRF constant from the Cormack paper
_RRF_TOPN = 20       # depth of each input ranking (matches _BM25_TOPN)


def _semantic_topn(spark: SparkSession, sf_dir: str, lex: DataFrame) -> DataFrame:
    """Cosine top-n seeded by the BM25 top-1 document's embedding
    (pseudo-relevance feedback: the lexical winner's vector is the
    semantic query, the classic hybrid-retrieval expansion — and it
    guarantees the two rankings overlap, so the fusion is exercised).

    One broadcast of the single query row, one map-only corpus pass,
    TakeOrderedAndProject top-n — the same shape as c03_knn_bruteforce
    but for one query, so the fusion input is k rows."""
    from iceberg_relative_io_spark.functions import vectors as V

    dot_udf = V.make_dot_udf()  # corpus-wide vector math rides the
    # Arrow path (SCALING.md batch-4: interpreted folds are for k-row
    # tables only); numerics identical to the oracle's list_reduce
    emb = load_table(spark, sf_dir, "embeddings")
    top1 = lex.filter(F.col("lex_rank") == 1).select(
        F.col("doc_id").alias("vec_id")
    )
    q = emb.join(top1, "vec_id").select(
        F.col("embedding").alias("qvec")
    ).withColumn("qnrm", F.sqrt(dot_udf("qvec", "qvec")))
    cos = dot_udf("qvec", "embedding") / (
        F.col("qnrm") * F.sqrt(dot_udf("embedding", "embedding"))
    )
    scored = emb.crossJoin(F.broadcast(q)).select(
        "vec_id", cos.alias("cos_sim")
    )
    topn = scored.orderBy(F.col("cos_sim").desc(), "vec_id").limit(_RRF_TOPN)
    w = Window.orderBy(F.col("cos_sim").desc(), "vec_id")
    return topn.withColumn("sem_rank", F.row_number().over(w)).select(
        F.col("vec_id").alias("doc_id"), "sem_rank"
    )


def q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 (hybrid retrieval): reciprocal-rank fusion of the BM25 lexical
    top-20 (query terms scan/join/window) and the cosine semantic top-20
    (query embedding vec_id=0), doc_id ≡ vec_id. A doc absent from one
    ranking contributes 0 for that ranker (standard RRF). Ranks are
    integers, so 1.0/(K+rank) is the same IEEE double in both engines
    and the fused score is exactly two exact terms added in a fixed
    order — bit-identical to the oracle."""
    from iceberg_relative_io_spark.operators.roundthree import q_bm25_search

    # the 20-row lexical ranking is consumed twice (semantic seeding +
    # the fusion join) but its lineage is the whole BM25 postings pass —
    # lazy localCheckpoint (guide §3.3) runs that pass once
    lex = (
        q_bm25_search(spark, sf_dir)
        .select("doc_id", F.col("rnk").alias("lex_rank"))
        .localCheckpoint(eager=False)
    )
    sem = _semantic_topn(spark, sf_dir, lex)
    fused = (
        lex.join(sem, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.coalesce("lex_rank", F.lit(0)).alias("lex_rank"),
            F.coalesce("sem_rank", F.lit(0)).alias("sem_rank"),
            (
                F.coalesce(
                    F.lit(1.0) / (F.lit(_RRF_K) + F.col("lex_rank")), F.lit(0.0)
                )
                + F.coalesce(
                    F.lit(1.0) / (F.lit(_RRF_K) + F.col("sem_rank")), F.lit(0.0)
                )
            ).alias("rrf_score"),
        )
    )
    w = Window.orderBy(F.col("rrf_score").desc(), "doc_id")
    return fused.withColumn("fused_rank", F.row_number().over(w)).select(
        "fused_rank", "doc_id", "lex_rank", "sem_rank", "rrf_score"
    )


# ---------------------------------------------------------------------------
# C3 — two-stage coarse-to-fine ANN (truncated-dim shortlist + exact rerank)
# ---------------------------------------------------------------------------

_RR_COARSE_DIM = 32   # dims scored in the coarse pass (Matryoshka prefix)
_RR_SHORTLIST = 100   # candidates per query surviving the coarse pass
_RR_N_QUERIES = 5     # same query set as c03_knn_bruteforce
_RR_TOP_K = 10
# Defaults give recall 0.88 vs c03_knn_bruteforce on the fixture, whose
# embeddings are ISOTROPIC — every dim carries equal energy, the
# hardest case for a prefix index. Matryoshka-trained embeddings
# concentrate energy in the prefix, so production recall at the same
# (coarse_dim, shortlist) is far higher; both dials are module knobs
# and c03_ann_recall_eval shows how any setting is measured.


def q_ann_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 (two-stage retrieval): coarse cosine over the first
    _RR_COARSE_DIM embedding dims shortlists _RR_SHORTLIST candidates
    per query; the exact full-dim cosine then reranks ONLY the
    shortlist — the Matryoshka / truncated-index serving pattern
    (coarse index in RAM, full-precision vectors fetched per candidate).

    At 100 TB: the coarse pass is the only corpus-wide stage and scores
    a 4× narrower vector (broadcast query set, map-only, per-query top-s
    shuffle of s·|queries| rows); the rerank fetches full vectors for
    s·|queries| ids via a broadcast semi-join — constant-size work. The
    recall/cost dial is (coarse_dim, shortlist): c03_ann_recall_eval
    shows how the driver measures any such dial against the brute-force
    truth."""
    from iceberg_relative_io_spark.functions import vectors as V

    dot_udf = V.make_dot_udf()  # dimension-sequential, oracle-exact,
    # Arrow-vectorized — the corpus-wide coarse pass must not run the
    # interpreted zip_with cosine (SCALING.md measured that ~4x slower)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    with_coarse = emb.select(
        "vec_id",
        "embedding",
        F.slice("embedding", 1, _RR_COARSE_DIM).alias("cvec"),
    ).withColumn("cnrm", F.sqrt(dot_udf("cvec", "cvec")))
    # the _RR_N_QUERIES-row query frame broadcasts into BOTH passes
    # (coarse scoring + exact rerank) but its lineage is the UDF-heavy
    # coarse featurization — lazily localCheckpoint so that corpus pass
    # runs once for the query side (round 11, same as the graph beam)
    queries = (
        with_coarse.filter(F.col("vec_id") < _RR_N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qvec"),
            F.col("cvec").alias("qcvec"),
            F.col("cnrm").alias("qcnrm"),
        )
        .localCheckpoint(eager=False)
    )
    coarse_cos = dot_udf("qcvec", "cvec") / (F.col("qcnrm") * F.col("cnrm"))
    coarse_scored = (
        with_coarse.join(
            F.broadcast(queries), F.col("vec_id") != F.col("query_id")
        )
        .select("query_id", "vec_id", coarse_cos.alias("coarse_sim"))
    )
    w_c = Window.partitionBy("query_id").orderBy(
        F.col("coarse_sim").desc(), "vec_id"
    )
    shortlist = (
        coarse_scored.withColumn("crnk", F.row_number().over(w_c))
        .filter(F.col("crnk") <= _RR_SHORTLIST)
        .select("query_id", "vec_id")
    )
    # rerank: fetch full vectors for shortlist ids only (broadcast —
    # s·|queries| rows), then exact cosine against the broadcast queries
    candidates = emb.join(F.broadcast(shortlist), "vec_id").withColumn(
        "nrm", F.sqrt(dot_udf("embedding", "embedding"))
    )
    qfull = queries.select("query_id", "qvec").withColumn(
        "qnrm", F.sqrt(dot_udf("qvec", "qvec"))
    )
    exact_cos = dot_udf("qvec", "embedding") / (F.col("qnrm") * F.col("nrm"))
    reranked = candidates.join(F.broadcast(qfull), "query_id").select(
        "query_id", "vec_id", exact_cos.alias("cos_sim")
    )
    w_e = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), "vec_id"
    )
    return (
        reranked.withColumn("rnk", F.row_number().over(w_e))
        .filter(F.col("rnk") <= _RR_TOP_K)
        .select("query_id", "vec_id", "rnk", "cos_sim")
    )


def q_rerank_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 (eval harness, round 11): recall@k of the two-stage
    coarse-to-fine rerank path against the brute-force exact top-k.
    The rerank stage scores its shortlist with EXACT full-dim cosines,
    so all recall loss comes from the 32-dim-prefix shortlist missing
    true neighbors — this eval measures exactly that loss (the
    Matryoshka-truncation trade). Shares _recall_frame / the
    generalized _recall_oracle with the LSH/IVF/IVF-PQ evals; the
    oracle replays the shortlist and rerank verbatim."""
    from iceberg_relative_io_spark.operators.northstar import q_knn_bruteforce

    exact = q_knn_bruteforce(spark, sf_dir).select("query_id", "vec_id")
    approx = q_ann_rerank(spark, sf_dir).select("query_id", "vec_id")
    return _roundthree._recall_frame(exact, approx)


# ---------------------------------------------------------------------------
# C5 — image average-hash near-dup
# ---------------------------------------------------------------------------

_AH_PIXELS = 64   # 8×8 grid
_AH_BANDS = 8     # 8 bands × 8 bits (Manku et al. block-permuted tables)
_AH_BITS = _AH_PIXELS // _AH_BANDS
_AH_HAM_MAX = _AH_BANDS - 1  # default-width verify threshold (= n_bands - 1,
# pigeonhole-complete at every width; query and oracle both derive it)


def _pixels(text) -> F.Column:
    """64 evenly-spaced sample points of the payload — the deterministic
    stand-in for decode+resize-to-8×8 (no codec libs in the container;
    c05_binary_ingest documents the same convention). Samples CHARACTER
    codepoints via ascii(substr) — identical to payload bytes on the
    ASCII documents fixture, which the c05 oracles assume and document."""
    n = F.length(text)
    return F.transform(
        F.sequence(F.lit(0), F.lit(_AH_PIXELS - 1)),
        lambda i: F.ascii(
            F.substring(text, (F.floor(i * n / _AH_PIXELS) + 1).cast("int"), 1)
        ),
    )


def _hashed(docs: DataFrame, n_bands: int = _AH_BANDS) -> DataFrame:
    """(doc_id, h0..h{n_bands-1}): pixel>mean sign bits packed into
    n_bands integers of 64/n_bands bits, via the Arrow-batched
    average-hash UDF. The ArrowEvalPython stage MATERIALIZES the band
    ints before the self-join — the Column-expression mirror below
    (_hashed_expr, the reference semantics, property-tested equal)
    evaluates interpreted AND gets re-inlined into the join predicate
    per candidate pair, measured ~20x the whole query at sf0.1."""
    from iceberg_relative_io_spark.functions.multimodal import make_avghash_udf

    hv = make_avghash_udf(n_bands, _AH_PIXELS)(F.col("text"))
    return docs.select("doc_id", hv.alias("hv")).select(
        "doc_id",
        *[
            F.element_at("hv", b + 1).alias(f"h{b}")
            for b in range(n_bands)
        ],
    )


def _hashed_expr(docs: DataFrame, n_bands: int = _AH_BANDS) -> DataFrame:
    """Column-expression twin of _hashed (MSB-first fold acc*2+bit —
    small positive values, no sign-bit hazard): the engine-independent
    reference semantics that the DuckDB oracle restates; kept for the
    mirror property test, not the hot path. px and mean are staged
    behind per-select aliases so the sample/aggregate expressions
    evaluate once per row, not once per packed bit."""
    bits = _AH_PIXELS // n_bands
    staged = docs.select("doc_id", _pixels(F.col("text")).alias("px")).select(
        "doc_id",
        "px",
        (
            F.aggregate("px", F.lit(0), lambda a, x: a + x).cast("double")
            / float(_AH_PIXELS)
        ).alias("mean"),
    )
    mean = F.col("mean")
    bands = [
        F.aggregate(
            F.slice("px", b * bits + 1, bits),
            F.lit(0),
            lambda a, x: a * 2 + F.when(x.cast("double") > mean, 1).otherwise(0),
        ).alias(f"h{b}")
        for b in range(n_bands)
    ]
    return staged.select("doc_id", *bands)


def q_image_hash_neardup(
    spark: SparkSession, sf_dir: str, n_bands: int = _AH_BANDS
) -> DataFrame:
    """C5 (visual near-dup): 64-bit average-hash per payload, banded
    Hamming match. Candidates = pairs sharing any of the n_bands exact
    (64/n_bands)-bit bands (pigeonhole-exact for Hamming <= n_bands-1,
    the verify threshold); verify = full Hamming via bit_count(xor)
    over the bands. Output is one row per document (hash bands +
    near-dup stats), so every hash bit and the join are both
    oracle-checked even when the fixture yields few matching pairs.

    ``n_bands`` is THE scale knob (the driver default 8 → 8-bit bands,
    Hamming<=7, mirrored by the oracle): growing the corpus under a
    fixed band width packs more images per band value and the
    within-bucket verify goes quadratic — shrink n_bands (wider bands,
    a stricter guaranteed threshold) as the corpus grows, exactly the
    trade Manku et al. tabulate. SCALING.md measures both settings.

    Plan: hashing is one codegen map pass (no UDF); the candidate join
    shuffles (band_idx, band_val) keys; the per-doc verdict aggregation
    is partial-aggregated before its exchange."""
    ham_max = n_bands - 1
    hkey = (caches.session_key(spark), sf_dir, n_bands)
    if hkey not in _HASH_CACHE:
        docs = load_table(spark, sf_dir, "documents")
        _HASH_CACHE[hkey] = _hashed(docs, n_bands).persist()
    hashed = _HASH_CACHE[hkey]

    hcols = [f"h{b}" for b in range(n_bands)]
    bands = hashed.select(
        "doc_id",
        *hcols,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"), F.col(f"h{b}").alias("band_val")
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bv"),
    ).select("doc_id", *hcols, "bv.band_idx", "bv.band_val")

    # skew defense: a hot (band_idx, band_val) bucket (near-identical
    # boilerplate images with distinct doc_ids) would put m^2/2 pairs on
    # one join key; the chunked self-join caps every key at cap rows per
    # side (operators/skewpairs.py), with identical pair semantics. The
    # occupancy probe runs once per (session, sf_dir, n_bands) on the
    # persisted hash frame and short-circuits when no bucket is hot.
    joined = skewpairs.chunked_self_join(
        bands,
        ["band_idx", "band_val"],
        "doc_id",
        sizes=_probe_hot(_HASH_HOT_CACHE, hkey, bands, ["band_idx", "band_val"]),
    )
    ham = sum(
        F.bit_count(
            F.col(f"_l.h{i}").bitwiseXOR(F.col(f"_r.h{i}")).cast("long")
        )
        for i in range(n_bands)
    )
    id_a, id_b = skewpairs.canonical_pair(
        F.col("_l.doc_id"), F.col("_r.doc_id")
    )
    pairs = (
        joined.select(
            id_a.alias("doc_id"),
            id_b.alias("match_id"),
            ham.alias("hamming"),
        )
        .distinct()  # a pair sharing several bands appears once
        .filter(F.col("hamming") <= ham_max)
    )
    # symmetrize so each doc reports matches on either side of the pair —
    # via explode, which doubles ROWS, not the join subtree (a unionAll
    # of pairs with itself would re-run the whole band join twice)
    sym = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("doc_id"), F.col("match_id"), F.col("hamming")),
                F.struct(
                    F.col("match_id").alias("doc_id"),
                    F.col("doc_id").alias("match_id"),
                    F.col("hamming"),
                ),
            )
        ).alias("p")
    ).select("p.doc_id", "p.match_id", "p.hamming")
    per_doc = sym.groupBy("doc_id").agg(
        F.count("*").alias("n_neardups"),
        F.min("match_id").alias("first_match"),
        F.min("hamming").alias("min_hamming"),
    )
    return hashed.join(per_doc, "doc_id", "left").select(
        "doc_id",
        *hcols,
        F.coalesce("n_neardups", F.lit(0)).alias("n_neardups"),
        F.coalesce("first_match", F.lit(-1)).alias("first_match"),
        F.coalesce("min_hamming", F.lit(-1)).alias("min_hamming"),
    )


# ---------------------------------------------------------------------------
# C5 — video scene segmentation (frame-delta cuts)
# ---------------------------------------------------------------------------

_SC_FRAME = 64    # chars per frame (the fixed-slice frame convention of
                  # functions/multimodal.sample_frames)
_SC_CUT_T = 250   # luminance-delta threshold declaring a scene cut
                  # (≈ the p93 frame delta on the fixture — cuts are
                  # meant to be the outlier transitions)


def q_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5 (video): scene segmentation — split each payload into
    fixed-size frames, compute per-frame luminance (sum of sample
    values; frames are fixed payload slices, the same documented
    decode stand-in as sample_frames), and declare a cut wherever the
    frame-to-frame delta exceeds the threshold. The real pipeline swaps
    the luminance delta for an SSIM/histogram distance inside the same
    plan; partial trailing frames are dropped (a real codec emits whole
    frames).

    Plan: one Arrow-batched map pass, no shuffle — corpus-wide
    featurization rides the Arrow path (SCALING.md batch-4 rule); the
    Column-expression twin below (_scene_cuts_expr) is the reference
    semantics the oracle restates, property-tested integer-equal. At
    100 TB scene detection costs exactly one corpus read."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    out_t = StructType(
        [
            StructField("n_frames", IntegerType()),
            StructField("n_cuts", IntegerType()),
            StructField("first_cut", IntegerType()),
        ]
    )

    @F.pandas_udf(out_t)
    def scenes(text: pd.Series) -> pd.DataFrame:
        nf_, nc_, fc_ = [], [], []
        for t in text:
            if t is None:  # NULL payload -> zero frames, like empty text
                t = ""
            n_frames = len(t) // _SC_FRAME
            lum = [
                sum(ord(c) for c in t[f * _SC_FRAME : (f + 1) * _SC_FRAME])
                for f in range(n_frames)
            ]
            cuts = [
                f
                for f in range(1, n_frames)
                if abs(lum[f] - lum[f - 1]) >= _SC_CUT_T
            ]
            nf_.append(n_frames)
            nc_.append(len(cuts))
            fc_.append(cuts[0] if cuts else -1)
        return pd.DataFrame(
            {"n_frames": nf_, "n_cuts": nc_, "first_cut": fc_}
        )

    docs = load_table(spark, sf_dir, "documents")
    # nondeterministic marking (guide §4.4): the n_frames>=2 filter
    # otherwise pushes below the projection and the frame-decoding UDF
    # runs TWICE over the whole corpus (plan showed two ArrowEvalPython
    # passes around the pushed filter)
    scenes_nd = scenes.asNondeterministic()
    out = docs.select("doc_id", scenes_nd(F.col("text")).alias("s")).select(
        "doc_id",
        F.col("s.n_frames").alias("n_frames"),
        F.col("s.n_cuts").alias("n_cuts"),
        F.col("s.first_cut").alias("first_cut"),
    )
    return out.filter(F.col("n_frames") >= 2)


def _scene_cuts_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-expression twin of q_scene_cuts (interpreted — the mirror
    test target, not the hot path)."""
    docs = load_table(spark, sf_dir, "documents")
    chars = F.split("text", "")
    n_frames = F.floor(F.length("text") / _SC_FRAME).cast("int")
    staged = docs.select("doc_id", chars.alias("ch"), n_frames.alias("n_frames"))
    lum = F.transform(
        F.sequence(F.lit(0), F.col("n_frames") - 1),
        lambda f: F.aggregate(
            F.slice("ch", f * _SC_FRAME + 1, _SC_FRAME),
            F.lit(0),
            lambda a, c: a + F.ascii(c),
        ),
    )
    with_lum = staged.filter(F.col("n_frames") >= 2).select(
        "doc_id", "n_frames", lum.alias("lum")
    )
    cuts = F.filter(
        F.sequence(F.lit(1), F.col("n_frames") - 1),
        lambda f: F.abs(
            F.element_at("lum", f + 1) - F.element_at("lum", f)
        )
        >= _SC_CUT_T,
    )
    return with_lum.select("doc_id", "n_frames", cuts.alias("cuts")).select(
        "doc_id",
        "n_frames",
        F.size("cuts").alias("n_cuts"),
        F.coalesce(F.try_element_at("cuts", F.lit(1)), F.lit(-1)).alias(
            "first_cut"
        ),
    )


def _scene_oracle() -> str:
    lum = (
        f"[list_reduce(list_prepend(0, "
        f"[ascii(c) FOR c IN list_slice(ch, f * {_SC_FRAME} + 1, (f + 1) * {_SC_FRAME})]), "
        f"(a, x) -> a + x) FOR f IN range(0, n_frames)]"
    )
    return f"""
        WITH staged AS (
            SELECT doc_id, string_split(text, '') AS ch,
                   CAST(len(text) // {_SC_FRAME} AS INT) AS n_frames
            FROM documents
        ),
        with_lum AS (
            SELECT doc_id, n_frames, {lum} AS lum
            FROM staged WHERE n_frames >= 2
        ),
        with_cuts AS (
            SELECT doc_id, n_frames,
                   [f FOR f IN range(1, n_frames)
                    IF abs(lum[f + 1] - lum[f]) >= {_SC_CUT_T}] AS cuts
            FROM with_lum
        )
        SELECT doc_id, n_frames,
               CAST(len(cuts) AS INT) AS n_cuts,
               COALESCE(cuts[1], -1) AS first_cut
        FROM with_cuts
    """


# ---------------------------------------------------------------------------
# C5 — keyframe selection (representative frame per scene)
# ---------------------------------------------------------------------------


def q_keyframes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5 (video): keyframe extraction — split each payload's frames
    into scenes at the q_scene_cuts boundaries, then pick each scene's
    representative frame (first luminance argmax; the thumbnail /
    contact-sheet step every video pipeline runs after segmentation).
    One row per (doc, scene) with the scene span and its keyframe.

    Plan: one Arrow-batched pass emitting a per-doc scene array, one
    Generate to rows — no shuffle; at 100 TB keyframing costs one
    corpus read, same as the segmentation it composes with."""
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        StructField,
        StructType,
    )

    item = StructType(
        [
            StructField("scene_idx", IntegerType()),
            StructField("start_frame", IntegerType()),
            StructField("end_frame", IntegerType()),
            StructField("key_frame", IntegerType()),
            StructField("key_lum", IntegerType()),
        ]
    )

    @F.pandas_udf(ArrayType(item))
    def scenes(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            if t is None:  # NULL payload -> no scenes, like a short text
                t = ""
            n_frames = len(t) // _SC_FRAME
            if n_frames < 2:
                out.append([])
                continue
            lum = [
                sum(ord(c) for c in t[f * _SC_FRAME : (f + 1) * _SC_FRAME])
                for f in range(n_frames)
            ]
            cuts = [
                f
                for f in range(1, n_frames)
                if abs(lum[f] - lum[f - 1]) >= _SC_CUT_T
            ]
            starts = [0] + cuts
            ends = cuts + [n_frames]
            rows = []
            for s, (a, b) in enumerate(zip(starts, ends)):
                seg = lum[a:b]
                mx = max(seg)
                rows.append((s, a, b, a + seg.index(mx), mx))
            out.append(rows)
        return pd.Series(out)

    key = (caches.session_key(spark), sf_dir)
    if key not in _KF_CACHE:
        docs = load_table(spark, sf_dir, "documents")
        out = docs.select(
            "doc_id", F.explode(scenes(F.col("text"))).alias("s")
        ).select(
            "doc_id",
            "s.scene_idx",
            "s.start_frame",
            "s.end_frame",
            "s.key_frame",
            "s.key_lum",
        )
        # persisted once per (session, sf_dir): video_neardup consumes
        # this from both chunked-join sides, the occupancy probe, AND
        # the per-doc scene count — uncached, the pandas-UDF corpus
        # pass would run 4-5×
        _KF_CACHE[key] = out.persist()
    return _KF_CACHE[key]


def _keyframes_oracle() -> str:
    lum = (
        f"[list_reduce(list_prepend(0, "
        f"[ascii(c) FOR c IN list_slice(ch, f * {_SC_FRAME} + 1, (f + 1) * {_SC_FRAME})]), "
        f"(a, x) -> a + x) FOR f IN range(0, n_frames)]"
    )
    return f"""
        WITH staged AS (
            SELECT doc_id, string_split(text, '') AS ch,
                   CAST(len(text) // {_SC_FRAME} AS INT) AS n_frames
            FROM documents
        ),
        with_lum AS (
            SELECT doc_id, n_frames, {lum} AS lum
            FROM staged WHERE n_frames >= 2
        ),
        with_cuts AS (
            SELECT doc_id, n_frames, lum,
                   [f FOR f IN range(1, n_frames)
                    IF abs(lum[f + 1] - lum[f]) >= {_SC_CUT_T}] AS cuts
            FROM with_lum
        ),
        bounds AS (
            SELECT doc_id, lum,
                   list_concat([0], cuts) AS starts,
                   list_append(cuts, n_frames) AS ends
            FROM with_cuts
        ),
        scenes AS (
            SELECT doc_id, r.i - 1 AS scene_idx,
                   starts[r.i] AS start_frame, ends[r.i] AS end_frame,
                   list_slice(lum, starts[r.i] + 1, ends[r.i]) AS seg
            FROM bounds, UNNEST(range(1, len(starts) + 1)) AS r(i)
        )
        SELECT doc_id, CAST(scene_idx AS INT) AS scene_idx,
               CAST(start_frame AS INT) AS start_frame,
               CAST(end_frame AS INT) AS end_frame,
               CAST(start_frame + list_position(seg, list_aggregate(seg, 'max')) - 1 AS INT)
                   AS key_frame,
               CAST(list_aggregate(seg, 'max') AS INT) AS key_lum
        FROM scenes
    """


# ---------------------------------------------------------------------------
# registries
# ---------------------------------------------------------------------------

def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 (contrastive training data): HARD-NEGATIVE MINING — documents
    the lexical ranker (BM25 top-{_RRF_TOPN}) scores high but the
    semantic ranker (cosine top-{_RRF_TOPN}, seeded by the lexical
    winner's embedding like c03_hybrid_rrf) does NOT — the classic
    negatives a dual-encoder / reranker trains on: lexically plausible,
    semantically wrong. Each mined negative carries its exact cosine to
    the query vector so the training pair ships its margin.

    At 100 TB: both corpus passes live inside the upstream rankers (one
    postings shuffle for BM25, one map-only Arrow scan for the cosine
    top-n); the mining itself is an anti-join of two <=n-row rankings
    plus a broadcast fetch of <=n full vectors — constant-size work
    independent of corpus scale, the same k-row property as
    c03_hybrid_rrf. Cosine numerics ride the dimension-sequential dot
    (vectors.make_dot_udf), bit-identical to the oracle's list_reduce."""
    from iceberg_relative_io_spark.functions import vectors as V
    from iceberg_relative_io_spark.operators.roundthree import q_bm25_search

    dot_udf = V.make_dot_udf()
    # the 20-row lexical ranking is consumed THREE times (semantic
    # seeding, the query-vector fetch, the anti-join) but its lineage is
    # the whole BM25 postings pass — lazy localCheckpoint runs it once
    lex = (
        q_bm25_search(spark, sf_dir)
        .select("doc_id", F.col("rnk").alias("lex_rank"))
        .localCheckpoint(eager=False)
    )
    sem = _semantic_topn(spark, sf_dir, lex)  # doc_id, sem_rank
    emb = load_table(spark, sf_dir, "embeddings")
    q = (
        emb.join(
            lex.filter(F.col("lex_rank") == 1).select(
                F.col("doc_id").alias("vec_id")
            ),
            "vec_id",
        )
        .select(F.col("embedding").alias("qvec"))
        .withColumn("qnrm", F.sqrt(dot_udf("qvec", "qvec")))
    )
    negs = lex.join(sem, "doc_id", "left_anti")  # lexical-only docs
    fetched = emb.join(
        F.broadcast(negs), emb.vec_id == negs.doc_id
    ).select("doc_id", "lex_rank", "embedding")
    cos = dot_udf("qvec", "embedding") / (
        F.col("qnrm") * F.sqrt(dot_udf("embedding", "embedding"))
    )
    scored = fetched.crossJoin(F.broadcast(q)).select(
        "doc_id", "lex_rank", cos.alias("cos_sim")
    )
    w = Window.orderBy("lex_rank")
    return scored.withColumn("neg_rank", F.row_number().over(w)).select(
        "neg_rank", "doc_id", "lex_rank", "cos_sim"
    )


def _hard_negatives_oracle() -> str:
    from iceberg_relative_io_spark.functions import vectors as V
    from iceberg_relative_io_spark.operators.roundthree import _bm25_oracle

    return f"""
        WITH lex AS (
            SELECT doc_id, rnk AS lex_rank FROM ({_bm25_oracle()})
        ),
        q AS (
            SELECT qe.embedding AS qvec
            FROM embeddings qe JOIN lex ON qe.vec_id = lex.doc_id
            WHERE lex.lex_rank = 1
        ),
        sem AS (
            SELECT vec_id AS doc_id
            FROM (
                SELECT e.vec_id,
                       {V.cosine_sql('q.qvec', 'e.embedding')} AS cos_sim
                FROM embeddings e, q
            )
            ORDER BY cos_sim DESC, vec_id LIMIT {_RRF_TOPN}
        ),
        negs AS (
            SELECT lex.doc_id, lex.lex_rank
            FROM lex ANTI JOIN sem ON lex.doc_id = sem.doc_id
        )
        SELECT row_number() OVER (ORDER BY lex_rank) AS neg_rank,
               n.doc_id, n.lex_rank,
               {V.cosine_sql('q.qvec', 'e.embedding')} AS cos_sim
        FROM negs n JOIN embeddings e ON e.vec_id = n.doc_id, q
    """


QUERIES = {
    "c03_hybrid_rrf": q_hybrid_rrf,
    "c03_hard_negatives": q_hard_negatives,
    "c03_ann_rerank": q_ann_rerank,
    "c03_rerank_recall_eval": q_rerank_recall_eval,
    "c05_image_hash_neardup": q_image_hash_neardup,
    "c05_scene_cuts": q_scene_cuts,
    "c05_keyframes": q_keyframes,
}


def _rerank_oracle() -> str:
    from iceberg_relative_io_spark.functions import vectors as V

    qslice = f"list_slice(q.embedding, 1, {_RR_COARSE_DIM})"
    eslice = f"list_slice(e.embedding, 1, {_RR_COARSE_DIM})"
    return f"""
        WITH shortlist AS (
            SELECT query_id, vec_id FROM (
                SELECT q.vec_id AS query_id, e.vec_id,
                       row_number() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY {V.cosine_sql(qslice, eslice)} DESC, e.vec_id
                       ) AS crnk
                FROM embeddings e
                JOIN embeddings q
                  ON q.vec_id < {_RR_N_QUERIES} AND e.vec_id != q.vec_id
            ) WHERE crnk <= {_RR_SHORTLIST}
        )
        SELECT query_id, vec_id, rnk, cos_sim FROM (
            SELECT s.query_id, s.vec_id,
                   row_number() OVER (
                       PARTITION BY s.query_id
                       ORDER BY {V.cosine_sql('q.embedding', 'e.embedding')} DESC, s.vec_id
                   ) AS rnk,
                   {V.cosine_sql('q.embedding', 'e.embedding')} AS cos_sim
            FROM shortlist s
            JOIN embeddings e ON e.vec_id = s.vec_id
            JOIN embeddings q ON q.vec_id = s.query_id
        ) WHERE rnk <= {_RR_TOP_K}
    """


def _rrf_oracle() -> str:
    from iceberg_relative_io_spark.functions import vectors as V
    from iceberg_relative_io_spark.operators.roundthree import _bm25_oracle

    return f"""
        WITH lex AS (
            SELECT doc_id, rnk AS lex_rank FROM ({_bm25_oracle()})
        ),
        sem AS (
            SELECT vec_id AS doc_id,
                   row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS sem_rank
            FROM (
                SELECT e.vec_id,
                       {V.cosine_sql('q.qvec', 'e.embedding')} AS cos_sim
                FROM embeddings e,
                     (SELECT qe.embedding AS qvec
                      FROM embeddings qe JOIN lex ON qe.vec_id = lex.doc_id
                      WHERE lex.lex_rank = 1) q
            )
            ORDER BY cos_sim DESC, vec_id LIMIT {_RRF_TOPN}
        ),
        fused AS (
            SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
                   COALESCE(lex_rank, 0) AS lex_rank,
                   COALESCE(sem_rank, 0) AS sem_rank,
                   COALESCE(1.0 / ({_RRF_K} + lex_rank), 0.0)
                   + COALESCE(1.0 / ({_RRF_K} + sem_rank), 0.0) AS rrf_score
            FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
        )
        SELECT row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS fused_rank,
               doc_id, lex_rank, sem_rank, rrf_score
        FROM fused
    """


def _ah_oracle(n_bands: int = _AH_BANDS) -> str:
    """Oracle twin of q_image_hash_neardup, parametric in n_bands like
    the query itself — so every band width the scale knob can take
    (including the n_bands=4 setting SCALING.md measures) has an exact
    correctness gate; tests/test_retrieval_ext.py pins the non-default
    width against DuckDB directly."""
    bits = _AH_PIXELS // n_bands
    px = (
        f"[ascii(substr(text, CAST((i * len(text)) // {_AH_PIXELS} AS INT) + 1, 1)) "
        f"FOR i IN range(0, {_AH_PIXELS})]"
    )
    band_exprs = ", ".join(
        f"list_reduce(list_prepend(0, "
        f"[CASE WHEN CAST(px[i] AS DOUBLE) > mean THEN 1 ELSE 0 END "
        f"FOR i IN range({b * bits + 1}, {b * bits + bits + 1})]), "
        f"(a, x) -> a * 2 + x) AS h{b}"
        for b in range(n_bands)
    )
    ham = " + ".join(
        f"bit_count(xor(a.h{i}, b.h{i}))" for i in range(n_bands)
    )
    band_pred = " OR ".join(f"a.h{i} = b.h{i}" for i in range(n_bands))
    return f"""
        WITH px AS (
            SELECT doc_id, {px} AS px FROM documents
        ),
        m AS (
            SELECT doc_id, px,
                   CAST(list_reduce(list_prepend(0, px), (a, x) -> a + x) AS DOUBLE)
                       / {float(_AH_PIXELS)!r} AS mean
            FROM px
        ),
        hashed AS (
            SELECT doc_id, {band_exprs} FROM m
        ),
        pairs AS (
            SELECT a.doc_id, b.doc_id AS match_id, {ham} AS hamming
            FROM hashed a JOIN hashed b
              ON ({band_pred}) AND a.doc_id < b.doc_id
            WHERE {ham} <= {n_bands - 1}
        ),
        sym AS (
            SELECT doc_id, match_id, hamming FROM pairs
            UNION ALL
            SELECT match_id AS doc_id, doc_id AS match_id, hamming FROM pairs
        ),
        per_doc AS (
            SELECT doc_id, count(*) AS n_neardups, min(match_id) AS first_match,
                   min(hamming) AS min_hamming
            FROM sym GROUP BY doc_id
        )
        SELECT h.doc_id, {", ".join(f"h.h{b}" for b in range(n_bands))},
               COALESCE(p.n_neardups, 0) AS n_neardups,
               COALESCE(p.first_match, -1) AS first_match,
               COALESCE(p.min_hamming, -1) AS min_hamming
        FROM hashed h LEFT JOIN per_doc p ON h.doc_id = p.doc_id
    """


ORACLE = {
    "c03_hybrid_rrf": _rrf_oracle(),
    "c03_hard_negatives": _hard_negatives_oracle(),
    "c03_ann_rerank": _rerank_oracle(),
    "c03_rerank_recall_eval": _roundthree._recall_oracle(
        approx_sql=_rerank_oracle()
    ),
    "c05_image_hash_neardup": _ah_oracle(),
    "c05_scene_cuts": _scene_oracle(),
    "c05_keyframes": _keyframes_oracle(),
}
