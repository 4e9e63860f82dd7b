"""Round-3 LLM-pipeline additions (SURVEY.md §2.C extensions).

Operators a 100 TB training-data pipeline runs between "crawl" and
"train" that the earlier §2.C batch didn't cover:

- **semantic dedup** (SemDeDup-style): centroid-cell blocking + within-
  cell cosine threshold, keep-lowest-id — the published semantic-dedup
  recipe (cluster, then prune near-identical members per cluster);
- **BM25 ranking** — the standard probabilistic retrieval score over the
  same inverted-index shape as c04_boolean_search;
- **bigram-LM scoring** — a corpus-trained bigram language model scoring
  each document's log-probability (the cheap stand-in for the perplexity
  filters used to quality-gate web corpora);
- **deterministic shard shuffle** — hash-shuffle documents into training
  shards with a stable within-shard order (what a dataloader consumes);
- **ANN recall evaluation** — recall@k of the LSH ANN path against the
  brute-force exact top-k (the eval loop that tunes nprobe/planes);
  round 11 adds the IVF, IVF-PQ and rerank twins (c03_ivf_recall_eval,
  c03_pq_recall_eval; c03_rerank_recall_eval in retrieval_ext.py),
  completing the measurement loop across EVERY approximate serving
  path (LSH / IVF / IVF-PQ / rerank / graph-beam — the last lives in
  roundten.py), all over the shared _recall_frame + generalized
  _recall_oracle pair;
- **temperature mixture weights** — per-source sampling weights
  n_s^alpha / sum(n_s^alpha) (the data-mixing step before training).

All six carry exact DuckDB oracles. Float aggregation is made
order-deterministic by folding per-key value lists in an explicit sort
order (array_sort + sequential fold on the Spark side, ``list(x ORDER
BY k)`` + list_reduce on the DuckDB side) — float addition is not
associative, so an unordered SUM() would hash-flake.

Scale design (100 TB):
- semantic dedup touches (cell-size)^2 pairs per cell, never the cross
  product; the centroid set is a bounded sample (constant driver
  traffic, same story as c03_ann_ivf);
- BM25 and bigram-LM are one explode + one shuffle-join on integer-ish
  keys + one per-doc fold; the model tables (df per term, bigram
  counts) are corpus-aggregates computed map-side-partial first;
- the shard shuffle is a hash partition + within-partition sort — the
  exact physical shape Spark executes for free, no global sort;
- recall eval joins two already-pruned top-k tables (k rows per query);
- mixture weights aggregate to |sources| rows before any float math.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_relative_io_spark.functions import vectors as V
from iceberg_relative_io_spark.sources.tables import fan_out, load_table


# ---------------------------------------------------------------------------
# C3 — semantic dedup (SemDeDup)
# ---------------------------------------------------------------------------

_SEM_TARGET_CELL = 256  # target rows per cell — n_cells = max(32, ceil(N/256))
_SEM_TAU = 0.3  # fixture cosines top out ≈ 0.4 (see northstar.py header)


def q_semantic_dedup(
    spark: SparkSession, sf_dir: str, n_cells: int | None = None
) -> DataFrame:
    """C3/C1 (semantic dedup): assign every embedding to its nearest
    centroid cell (bounded-sample centroids, the c03_ann_ivf coarse
    quantizer), then within each cell drop any vector that has a
    lower-id neighbour with cosine >= tau — keep-lowest-id semantics,
    the SemDeDup recipe (cluster, then prune near-identical members
    inside each cluster; pruning never crosses cells, so recall of the
    dedup is traded for never materializing the cross product).

    At 100 TB: the centroid collect is O(k); assignment is one broadcast
    map-only pass; the quadratic lives inside a cell. ``n_cells`` is the
    SCALE KNOB and now DERIVES FROM THE CORPUS: per-cell pair work is
    (N/k)^2, so the default is k = max(32, ceil(N/256)) — k grows
    linearly with N, holding the expected cell size (and so the per-row
    cost) constant. The count that feeds the derivation is a
    parquet-metadata count-star (one cheap job, no data scan); the
    oracle mirrors the identical derivation via a scalar subquery in the
    centroid CTE's LIMIT (``derived_cells_sql``), so the
    driver-registered query IS the scale-safe one. SCALING.md round 3
    measured the old fixed k=32 at 19.3x for 10x data and k ∝ N
    restoring ~linear. All cosine math is dimension-sequential, matching
    the oracle's fold bit-for-bit."""
    import numpy as np

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        # NULL vectors can neither match nor be matched: excluded on
        # both sides (round-5 NULL-injection fuzz)
        .filter(F.col("embedding").isNotNull())
    )
    if n_cells is None:
        # count of the NULL-filtered frame — the "nonnull" variant so it
        # never aliases the full-corpus count the IVF family caches
        n_cells = V.derived_cells(
            V.cached_count(spark, sf_dir, emb, "nonnull"), _SEM_TARGET_CELL
        )
    bc = V.centroids_broadcast(spark, sf_dir, emb, n_cells)
    cell_of = V.make_nearest_udf(bc)
    assigned = emb.withColumn("cell", cell_of(F.col("embedding")))

    def per_cell(pdf):
        ids = pdf["vec_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        M = np.stack(pdf["embedding"].to_numpy()[order]).astype(np.float64)
        # dimension-sequential accumulation — same bits as cosine_sql
        S = np.zeros((len(M), len(M)))
        n2 = np.zeros(len(M))
        for i in range(M.shape[1]):
            S = S + np.outer(M[:, i], M[:, i])
            n2 = n2 + M[:, i] * M[:, i]
        nrm = np.sqrt(n2)
        cos = S / np.outer(nrm, nrm)
        # duplicate iff ANY lower-id row in the cell is >= tau
        dup = ((cos >= _SEM_TAU) & (ids[None, :] < ids[:, None])).any(axis=1)
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cell": pdf["cell"].to_numpy()[order],
                "kept": (~dup).astype(np.int32),
            }
        )

    return assigned.groupBy("cell").applyInPandas(
        per_cell, schema="vec_id long, cell long, kept int"
    )


# ---------------------------------------------------------------------------
# C4 — BM25 ranking
# ---------------------------------------------------------------------------

_BM25_TERMS = ("scan", "join", "window")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPN = 20


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 (ranked retrieval): disjunctive BM25 over the inverted-index
    shape of c04_boolean_search. idf uses the +1 ("Lucene") form so
    scores stay positive; per-(doc, term) partial scores are folded in
    term order (array_sort + sequential fold) because float addition is
    not associative and the oracle must reproduce the exact double.

    At 100 TB: postings are one explode + one partial-agg shuffle on
    (doc, term); df and avgdl are tiny corpus aggregates broadcast into
    the scorer; the top-n compiles to TakeOrderedAndProject (no global
    sort), and the final row_number ranks only n rows.

    idf is computed DRIVER-side from the collected per-term df (a
    |query terms|-row collect — exactly what a search coordinator does
    with index stats at query time): JVM Math.log disagrees with libm
    by 1 ulp on some inputs, while CPython's math.log and DuckDB's ln
    both call the host libm, so the driver-computed literal is the only
    placement where ln stays bit-identical to the oracle. Every other
    op in the score (+,-,*,/) is IEEE-exact in both engines."""
    import math

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.split("text", " ").alias("toks")
    ).select("doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("term"))

    # corpus stats: N docs + avgdl (one tiny agg), df per query term
    stats = docs.agg(
        F.count("*").cast("double").alias("n_docs"),
        (
            F.sum(F.size(F.split("text", " "))).cast("double")
            / F.count("*").cast("double")
        ).alias("avgdl"),
    )
    postings = (
        toks.filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("double").alias("tf"), F.first("dl").cast("double").alias("dl"))
    )
    df_t = postings.groupBy("term").agg(F.count("*").cast("double").alias("df"))

    n_docs = float(docs.count())
    idf_rows = [
        (r.term, math.log(1.0 + (n_docs - r.df + 0.5) / (r.df + 0.5)))
        for r in df_t.collect()  # |query terms| rows — constant
    ]
    idf_t = spark.createDataFrame(idf_rows, "term string, idf double")

    scored = (
        postings.join(F.broadcast(idf_t), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "s",
            F.col("idf")
            * (F.col("tf") * (_BM25_K1 + 1.0))
            / (
                F.col("tf")
                + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct(F.col("term"), F.col("s")))),
            F.lit(0.0),
            lambda acc, x: acc + x["s"],
        ).alias("score"),
        F.count("*").alias("n_terms"),
    )
    topn = per_doc.orderBy(F.col("score").desc(), F.col("doc_id")).limit(_BM25_TOPN)
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    return topn.withColumn("rnk", F.row_number().over(w)).select(
        "rnk", "doc_id", "n_terms", "score"
    )


# ---------------------------------------------------------------------------
# C4 — bigram language-model scoring (perplexity-filter stand-in)
# ---------------------------------------------------------------------------


def _doc_bigrams(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, w1, w2) for every adjacent token pair, via a
    codegen higher-order expression (no Python)."""
    toks = docs.select("doc_id", F.split("text", " ").alias("toks"))
    # guard: Spark's sequence(0, n) DESCENDS when n < 0, so a one-token
    # document would emit [0, -1] and toks[i+1] would index out of
    # bounds (found by tools/fuzz_oracle.py — the fixture has no
    # one-token docs). Short docs contribute zero bigrams instead.
    idx = F.when(
        F.size("toks") >= 2, F.sequence(F.lit(0), F.size("toks") - 2)
    ).otherwise(F.array().cast("array<int>"))
    pairs = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    i.alias("pos"),
                    F.col("toks")[i].alias("w1"),
                    F.col("toks")[i + 1].alias("w2"),
                ),
            )
        ).alias("bg"),
    ).select("doc_id", "bg.pos", "bg.w1", "bg.w2")
    return pairs


def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 (LM quality scoring): train a bigram MLE model on the corpus
    (c(w1,w2) and c(w1) counts), then score every document's
    log-probability sum(ln(c12/c1)) over its bigrams **in position
    order** — the cheap, exact-oracle stand-in for the KenLM perplexity
    filters that quality-gate web-scale corpora. Docs with fewer than 2
    tokens score 0 over 0 bigrams.

    At 100 TB: the model is two partial-agg shuffles (bigram and unigram
    counts); scoring is one shuffle-join of the exploded corpus against
    the model (both sides hash-partitioned on the join key — the model
    table is vocabulary-sized, broadcast when it fits); the per-doc fold
    is an ordered array aggregate. ln runs on the MODEL table (once per
    bigram type, not per occurrence) through a libm-backed pandas UDF:
    JVM Math.log drifts a ulp from the host libm that both CPython's
    math.log and DuckDB's ln call, so JVM-side F.log would hash-diverge
    while this stays bit-identical AND does strictly less work."""
    import math

    from pyspark.sql.types import DoubleType

    @F.pandas_udf(DoubleType())
    def _ln(x: pd.Series) -> pd.Series:
        return x.map(math.log)

    # fan_out measured NEGATIVE here (round-11 A/B: 2.2s vs 1.6s): the
    # bigram explosion is a JVM transform feeding three consumers; the
    # added exchange costs more than the single-split scan stage saves
    docs = load_table(spark, sf_dir, "documents")
    bg = _doc_bigrams(docs)
    c12 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    # NOT derived from c12 (c1 = sum of c12 over w2 is exact-identical
    # and one fewer explosion pass, but a round-11 interleaved A/B
    # measured it WORSE, 1.50/1.53 -> 1.86/1.92s: the two independent
    # aggregations over the cheap JVM explosion overlap across idle
    # cores, while the derivation serializes c1 behind c12's shuffle)
    c1 = bg.groupBy("w1").agg(F.count("*").alias("c1"))
    model = c12.join(c1, "w1").withColumn(
        "lp", _ln(F.col("c12").cast("double") / F.col("c1").cast("double"))
    )

    lp = bg.join(model, ["w1", "w2"])
    per_doc = lp.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct(F.col("pos"), F.col("lp")))),
            F.lit(0.0),
            lambda acc, x: acc + x["lp"],
        ).alias("logprob"),
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            F.coalesce(F.col("logprob"), F.lit(0.0)).alias("logprob"),
        )
    )


# ---------------------------------------------------------------------------
# C6 — deterministic shard shuffle (training-order assignment)
# ---------------------------------------------------------------------------

_N_SHARDS = 8
_SHUF_A = 1103515245
_SHUF_C = 12345
_SHUF_M = 2147483647


def q_shard_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6 (training shuffle): deterministically shuffle the corpus into
    ``_N_SHARDS`` shards with a stable within-shard order — the layout a
    dataloader reads. The shuffle key is an LCG hash of doc_id (exact
    64-bit integer math, mirrored verbatim in the oracle), so the split
    is reproducible across runs and engines; shard = key mod n_shards,
    position = rank of the key within the shard.

    At 100 TB this is the plan Spark already wants: hash-partition on
    shard, sort within partitions — NO global sort, no driver state. A
    re-shuffle for the next epoch is a different LCG constant."""
    docs = load_table(spark, sf_dir, "documents")
    key = (F.col("doc_id") * F.lit(_SHUF_A) + F.lit(_SHUF_C)) % F.lit(_SHUF_M)
    keyed = docs.select("doc_id", key.alias("shuffle_key"))
    w = Window.partitionBy("shard").orderBy("shuffle_key", "doc_id")
    return (
        keyed.withColumn("shard", F.col("shuffle_key") % _N_SHARDS)
        .withColumn("shard_pos", F.row_number().over(w))
        .select("doc_id", "shard", "shard_pos", "shuffle_key")
    )


# ---------------------------------------------------------------------------
# C3 — ANN recall evaluation (LSH vs exact)
# ---------------------------------------------------------------------------


def _recall_frame(exact: DataFrame, approx: DataFrame) -> DataFrame:
    """(query_id, n_exact, n_hit, recall) from two (query_id, vec_id)
    top-k tables — the shared body of every recall eval (LSH / IVF /
    IVF-PQ / rerank here, graph-beam in roundten.py). Integer counts
    plus one final division keep every oracle exact."""
    # both sides are k rows per sampled query — bounded regardless of
    # corpus size, so the explicit broadcasts hold at any scale (the
    # planner's stats otherwise pick a sort-merge join here).
    # NOT checkpointed: the exact side is consumed twice (counts + the
    # hit semi-join), but a round-11 interleaved A/B measured the lazy
    # localCheckpoint WORSE at both 32 and 8 cores (pq eval 1.6-1.7 →
    # 1.8-2.0s) — the added job barrier outweighs the duplicated
    # scoring, whose stages overlap within one job at this scale.
    n_exact = exact.groupBy("query_id").agg(F.count("*").alias("n_exact"))
    n_hit = (
        exact.join(F.broadcast(approx), ["query_id", "vec_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count("*").alias("n_hit"))
    )
    return n_exact.join(F.broadcast(n_hit), "query_id", "left").select(
        "query_id",
        "n_exact",
        F.coalesce(F.col("n_hit"), F.lit(0)).alias("n_hit"),
        (
            F.coalesce(F.col("n_hit"), F.lit(0)).cast("double")
            / F.col("n_exact").cast("double")
        ).alias("recall"),
    )


def q_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 (eval harness): recall@k of the LSH-bucketed ANN path against
    the brute-force exact top-k, per query — the measurement loop that
    tunes n_planes/nprobe before anyone trusts an ANN index. Joins two
    k-row-per-query tables; integer counts plus one final division, so
    the oracle is exact.

    At 100 TB the eval runs on a sampled query set (here: the same
    _N_QUERIES both paths already use) — cost is two index probes plus
    a k-row join per query, independent of corpus size."""
    from iceberg_relative_io_spark.operators.northstar import (
        q_ann_lsh,
        q_knn_bruteforce,
    )

    exact = q_knn_bruteforce(spark, sf_dir).select("query_id", "vec_id")
    approx = q_ann_lsh(spark, sf_dir).select("query_id", "vec_id")
    return _recall_frame(exact, approx)


def q_ivf_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 (eval harness, round 11): recall@k of the IVF-probed ANN path
    against the brute-force exact top-k — the IVF twin of
    c03_ann_recall_eval, completing the measurement loop across all
    three approximate serving paths (LSH / IVF / graph-beam, the last
    via c03_graph_recall_eval): every recall<1-by-design index now has
    its recall MEASURED, not asserted. Same integer-count + one-division
    shape, so the oracle is exact (it replays the IVF probe and the
    brute-force join).

    Measured on the isotropic random fixture at sf0.01 (round 11):
    mean recall@10 = 0.24 for IVF at the shipped nprobe vs 0.02 for
    LSH — IVF's probed cells cover a larger corpus fraction than one
    256-bucket sign pattern, exactly the coverage-vs-cost dial the eval
    exists to expose (the fixture's lack of manifold structure sets the
    floor; see c03_graph_recall_eval's docstring for the geometry).

    At 100 TB: identical cost argument to the LSH eval — two index
    probes plus a k-row join per sampled query, corpus-independent."""
    from iceberg_relative_io_spark.operators.northstar import (
        q_ann_ivf,
        q_knn_bruteforce,
    )

    exact = q_knn_bruteforce(spark, sf_dir).select("query_id", "vec_id")
    approx = q_ann_ivf(spark, sf_dir).select("query_id", "vec_id")
    return _recall_frame(exact, approx)


def q_pq_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 (eval harness, round 11): recall@k of the composed IVF-PQ
    serving path (coarse-cell pruning + ADC scoring over 8-code
    candidates) against the brute-force exact top-k. IVF-PQ loses
    recall TWO ways — unprobed cells AND quantized distances reranking
    the probed candidates — and this eval measures the composition,
    which neither c03_ivf_recall_eval (probe loss only) nor the ADC
    tables alone expose. Same integer-count shape; the oracle replays
    the full IVF-PQ pipeline and the brute-force join exactly."""
    from iceberg_relative_io_spark.operators.northstar import q_knn_bruteforce

    exact = q_knn_bruteforce(spark, sf_dir).select("query_id", "vec_id")
    approx = q_ann_ivfpq(spark, sf_dir).select("query_id", "vec_id")
    return _recall_frame(exact, approx)


# ---------------------------------------------------------------------------
# C6 — temperature-weighted source mixing
# ---------------------------------------------------------------------------

_MIX_ALPHA = 0.5
_MIX_BUDGET = 10000


def q_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6 (data mixing): per-source sampling weights w_s =
    n_s^alpha / sum_s n_s^alpha (temperature alpha < 1 upweights small
    sources — the standard multi-source mixing rule) plus the integer
    document quota for a fixed training budget. The normalizer folds the
    per-source terms in source order so the float sum is deterministic;
    alpha = 0.5 so the temperature op is sqrt — correctly-rounded IEEE
    in both engines, unlike pow (JVM Math.pow vs libm can differ a ulp).

    At 100 TB: one partial-agg shuffle to |sources| rows; everything
    after is constant-size."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    pw = counts.withColumn("pw", F.sqrt(F.col("n_docs").cast("double")))
    total = pw.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct(F.col("source"), F.col("pw")))),
            F.lit(0.0),
            lambda acc, x: acc + x["pw"],
        ).alias("total_pw")
    )
    return (
        pw.crossJoin(F.broadcast(total))
        .select(
            "source",
            "n_docs",
            (F.col("pw") / F.col("total_pw")).alias("weight"),
            F.floor(F.col("pw") / F.col("total_pw") * _MIX_BUDGET)
            .cast("long")
            .alias("quota_docs"),
        )
    )


# ---------------------------------------------------------------------------
# C2 — distributed connected components (hash-min label propagation)
# ---------------------------------------------------------------------------

def q_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2 (scale path for dedup survivorship): connected components over
    the LSH-candidate edge graph, computed ENTIRELY distributed —
    hash-min label propagation (each node repeatedly takes the minimum
    label among itself and its neighbours) iterated to fixpoint. This is
    the large-graph alternative the c02_dedup_survivors docstring names:
    survivors' driver-side union-find is right when the post-LSH edge
    set is tiny; this operator is what runs when it isn't. Same output
    contract (component = min reachable doc_id, survivor = key holder),
    same recursive-CTE oracle.

    At 100 TB: O(component diameter) rounds — near-dup graphs are
    dense clusters with tiny diameters, so a handful — each round one
    shuffle join on node id + one partial-agg min; labels are
    localCheckpoint'ed per round to cut lineage, and the driver sees one
    scalar (the label sum, a monotone convergence witness) per round,
    never the graph. The loop itself lives in operators/graph.py, shared
    with c02_dedup_survivors (which takes it whenever the counted edge
    set exceeds the union-find guard)."""
    from iceberg_relative_io_spark.operators.graph import (
        label_propagation_components,
    )
    from iceberg_relative_io_spark.operators.northstar import (
        q_lsh_candidate_pairs,
    )

    threshold = 0.3
    pairs = (
        q_lsh_candidate_pairs(spark, sf_dir)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b")
    )
    labels = label_propagation_components(pairs)

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    comp = labels.select(F.col("node").alias("doc_id"), F.col("label").alias("component"))
    return docs.join(comp, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("component"), F.col("doc_id")).alias("component"),
        (F.coalesce(F.col("component"), F.col("doc_id")) == F.col("doc_id"))
        .cast("int")
        .alias("survivor"),
    )


# ---------------------------------------------------------------------------
# C2 — duplicated-span removal (exact-substring dedup as a TRANSFORM)
# ---------------------------------------------------------------------------

_RM_K = 5


def q_substring_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2 (substring dedup transform): REMOVE every token covered by a
    word-``_RM_K``-gram that occurs in two or more distinct documents,
    and reassemble the surviving tokens in order — the
    exact-substring-removal step web-corpus pipelines apply after
    detection (c02_duplicate_ngrams is the detector; this is the
    rewrite). Grams ride the shared rolling-hash code space
    (functions/text.py), so the duplicated-gram table and the oracle
    agree exactly.

    At 100 TB: one gram explode + partial-agg shuffle on the int64 code
    to find cross-doc grams, one semi-join back (the duplicated-gram
    table is a small fraction of the gram stream), one per-doc ordered
    reassembly. Gram codes come from the Arrow-batched mirror UDF — the
    Column-expression twin is interpreted (nested higher-order exprs
    fall out of codegen) and measured ~50x slower on this, the hot
    per-token stage; the integers are identical (property-tested)."""
    from iceberg_relative_io_spark.functions import text as T

    # fan_out: gram UDF + two posexplodes over the single-split scan
    docs = fan_out(load_table(spark, sf_dir, "documents"), "doc_id")
    # nondeterministic gram UDF (guide §4.4): posexplode's implicit
    # size/notnull predicate otherwise re-evaluates it below the filter
    gram_udf = T.make_gram_codes_udf(_RM_K).asNondeterministic()
    g = docs.select(
        "doc_id",
        F.posexplode(gram_udf(F.col("text"))).alias("g0", "code"),
    ).select("doc_id", (F.col("g0") + 1).alias("gpos"), "code")
    # cross-doc duplicate detection in the SAME pass (round 11): a gram
    # occurs in >=2 distinct docs iff min(doc_id) != max(doc_id) over
    # its code partition — one shuffle + window over the gram stream,
    # replacing the groupBy + semi-join shape whose second consumer
    # re-ran the whole gram-UDF subtree (2 UDF passes + 2 shuffles)
    wcode = Window.partitionBy("code")
    covered = (
        g.withColumn(
            "dup", F.min("doc_id").over(wcode) != F.max("doc_id").over(wcode)
        )
        .filter(F.col("dup"))
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("gpos"), F.col("gpos") + (_RM_K - 1))
            ).alias("tpos"),
        )
        .distinct()
    )
    tok = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("p0", "tok")
    ).select("doc_id", (F.col("p0") + 1).alias("tpos"), "tok")
    surv = tok.join(covered, ["doc_id", "tpos"], "left_anti")
    cleaned = surv.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("tpos", "tok"))),
                lambda x: x["tok"],
            ),
            " ",
        ).alias("cleaned_text"),
    )
    base = docs.select("doc_id", F.size(F.split("text", " ")).alias("n_tokens"))
    return base.join(cleaned, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        (F.col("n_tokens") - F.coalesce(F.col("n_kept"), F.lit(0))).alias("n_removed"),
        F.coalesce(F.col("cleaned_text"), F.lit("")).alias("cleaned_text"),
    )


# ---------------------------------------------------------------------------
# C2 — containment dedup (subset-document detection)
# ---------------------------------------------------------------------------

_CONTAIN_T = 0.5


def q_doc_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2 (containment dedup): LSH candidate pairs scored by Jaccard
    CONTAINMENT |A∩B| / min(|A|,|B|) instead of plain Jaccard — the
    asymmetric metric that catches a short document embedded inside a
    longer one, which union-normalized Jaccard dilutes below threshold.
    Reuses the shared minhash featurization and the banded-LSH candidate
    join (only (band, signature) tuples shuffle; the cross product never
    exists); emits the shingle-set sizes so the score is auditable.

    At 100 TB: identical plan shape to c02_lsh_candidate_pairs — one
    band-keyed shuffle join over the persisted signature table plus the
    pair dedup."""
    from iceberg_relative_io_spark.operators.northstar import _signatures, banded

    sigs = _signatures(spark, sf_dir)
    bands = banded(sigs, "doc_id", "sh")
    a, b = bands.alias("a"), bands.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bsig") == F.col("b.bsig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.size(F.col("a.sh")).alias("n_a"),
            F.size(F.col("b.sh")).alias("n_b"),
            inter.alias("n_inter"),
        )
        .distinct()
    )
    containment = F.col("n_inter").cast("double") / F.least(
        F.col("n_a"), F.col("n_b")
    ).cast("double")
    return pairs.withColumn("containment", containment).filter(
        F.col("containment") >= _CONTAIN_T
    )


# ---------------------------------------------------------------------------
# C6 — dataset card (per source x lang corpus profile)
# ---------------------------------------------------------------------------

_SHORT_DOC_TOKENS = 20


def q_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6 (reporting): the per-(source, lang) dataset card a pipeline
    publishes with a corpus release — document and token counts, exact
    duplicate documents, and the short-document fraction. One partial-agg
    shuffle on (source, lang) plus one hash-agg on text for the dup
    counts; every measure is integer or a single exact division.

    At 100 TB the dup-count side aggregates text HASHES, not text — here
    text itself is the key so the oracle is trivially exact (the
    fingerprint-hash variant is what c01_exact_dedup already shows)."""
    docs = load_table(spark, sf_dir, "documents")
    dups = (
        docs.groupBy("text")
        .agg(F.count("*").alias("n_copies"))
        .filter(F.col("n_copies") > 1)
        .select("text")
    )
    toks = F.size(F.split("text", " "))
    flagged = docs.join(
        dups.withColumn("is_dup", F.lit(1)), "text", "left"
    ).select(
        "source",
        "lang",
        toks.alias("n_tok"),
        F.coalesce(F.col("is_dup"), F.lit(0)).alias("is_dup"),
    )
    return flagged.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("total_tokens"),
        F.sum("is_dup").cast("long").alias("n_dup_docs"),
        F.sum((F.col("n_tok") < _SHORT_DOC_TOKENS).cast("int"))
        .cast("long")
        .alias("n_short_docs"),
    )


# ---------------------------------------------------------------------------
# C6 — bloom-filter contamination audit (the 100 TB variant, made real)
# ---------------------------------------------------------------------------

_BLOOM_M = 1 << 20  # FIXED bit-space — bounded however large train is
_BLOOM_K = 3
_CONTAM_K = 5


def q_contamination_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6 (eval hygiene at scale): the bloom-filter variant of
    c06_contamination_check — that operator's docstring names 'broadcast
    a bloom filter of the train side' as the 100 TB path; this IS that
    path, with exact bloom semantics. Train word-5-grams set
    ``_BLOOM_K`` positions in a FIXED ``_BLOOM_M``-bit space (affine
    integer hash family of functions/text.py); a test gram is flagged
    iff ALL its positions are set — including bloom false positives,
    which the oracle reproduces exactly because the bit positions are
    pure integer math in both engines.

    The bit set is represented relationally (distinct position rows,
    <= M rows however large the corpus — at 100 TB you'd fold the same
    positions into an M-bit array and broadcast it; the flagged set is
    identical by construction). Flagging is one explode + one
    hash-join against the bounded position table, replacing the
    train-sized gram semi-join of the exact check."""
    from iceberg_relative_io_spark.functions import text as T

    # fan_out measured NEGATIVE here (round-11 A/B: ~3.7s vs ~3.4s):
    # the gram UDF is light and the frame forks into train/test branches,
    # so the extra exchange outweighs the scan parallelism — left alone
    docs = load_table(spark, sf_dir, "documents")
    bucket = T.fingerprint(F.col("text")) % 100
    # nondeterministic gram UDF + bucket filters BELOW it (guide §4.4):
    # explode's implicit size/notnull predicate on the UDF column
    # otherwise pushes under the projection and re-evaluates the
    # corpus-wide hashing UDF (the plan showed 2 full passes per branch)
    gram_udf = T.make_distinct_gram_codes_udf(_CONTAM_K).asNondeterministic()
    base = docs.select("doc_id", "lang", "text", bucket.alias("bucket"))

    def positions(g):
        out = []
        for j in range(_BLOOM_K):
            a, b = T.hash_params(j)
            out.append(((g * a + b) % T.MOD) % _BLOOM_M)
        return F.array(*out)

    train_bits = (
        base.filter(F.col("bucket") < 80)
        .select(F.explode(gram_udf(F.col("text"))).alias("gram"))
        .select(F.explode(positions(F.col("gram"))).alias("pos"))
        .distinct()
    )
    test_docs = base.filter(F.col("bucket") >= 90)
    te_pos = test_docs.select(
        "doc_id", F.explode(gram_udf(F.col("text"))).alias("gram")
    ).select("doc_id", "gram", F.explode(positions(F.col("gram"))).alias("pos"))
    # the bit table is bounded by the FIXED bloom space (<= M rows however
    # large train is) — broadcast it so flagging is a map-side probe, no
    # shuffle of the test positions
    per_gram = (
        te_pos.join(
            F.broadcast(train_bits.withColumn("present", F.lit(1))),
            "pos",
            "left",
        )
        .groupBy("doc_id", "gram")
        .agg(F.min(F.coalesce("present", F.lit(0))).alias("all_present"))
    )
    # per_gram has one row per distinct test gram, so count(*) IS n_grams
    # — the reporting join below reads only (doc_id, lang) and never
    # re-featurizes the test docs (no second gram-UDF pass)
    per_doc = per_gram.groupBy("doc_id").agg(
        F.count("*").alias("n_grams"),
        F.sum("all_present").alias("n_flagged"),
    )
    test_ids = base.filter(F.col("bucket") >= 90).select("doc_id", "lang")
    return test_ids.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "lang",
        F.coalesce(F.col("n_grams"), F.lit(0)).cast("int").alias("n_grams"),
        F.coalesce(F.col("n_flagged"), F.lit(0)).alias("n_flagged"),
        (F.coalesce(F.col("n_flagged"), F.lit(0)) > 0).cast("int").alias(
            "contaminated"
        ),
    )


# ---------------------------------------------------------------------------
# C5 — resize/transcode stage as a driver query
# ---------------------------------------------------------------------------

_RESIZE_BYTES = 64


def q_resize_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5 (multimodal transform): the resize/transcode mapInPandas stage
    end-to-end — payload in, smaller payload out, metadata updated. The
    default stand-in resizer truncates to ``_RESIZE_BYTES`` (codecs are
    stubbed in this container; a Pillow/ffmpeg resizer drops in without
    touching the plan), and the output carries the truncated payload as
    hex so the oracle verifies CONTENT byte-for-byte, not just lengths
    — byte-based on both sides, no ASCII assumption.

    At 100 TB this stage is the bulk of a media pipeline's compute:
    map-only, Arrow-batched, no shuffle — exactly what the plan shows."""
    from iceberg_relative_io_spark.functions import multimodal as M

    docs = load_table(spark, sf_dir, "documents")
    resized = M.resize_stage(M.to_multimodal(docs), _RESIZE_BYTES)
    return resized.select(
        "item_id",
        "mime",
        "n_bytes",
        F.hex(F.col("payload")).alias("payload_hex"),
    )


# ---------------------------------------------------------------------------
# C3 — IVF+PQ composed ANN (the production serving path)
# ---------------------------------------------------------------------------

def q_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 (IVF+PQ): the full large-scale ANN serving path — coarse IVF
    quantizer for cell pruning composed with product-quantization ADC
    scoring inside the probed cells (what FAISS IndexIVFPQ does).

    One map-only corpus pass assigns each vector its IVF cell AND its 8
    PQ codes (both from bounded constant-size centroid samples — the
    same collects q_ann_ivf/q_pq_codes already bound). Queries probe
    their _N_PROBE nearest cells; candidates in probed cells are scored
    WITHOUT touching their float vectors: per query a (subspace ×
    codebook) ADC lookup table of exact sub-distances is built driver-
    side (O(n_queries · 8 · ncent) — constant in the corpus) and
    broadcast, and each candidate's approximate distance is the fold of
    its 8 code lookups. At 100 TB the scored side carries 8 int codes
    per vector instead of 64 floats — the ~32× memory cut that makes
    cell-resident scoring fit in RAM. All float math is dimension-/
    subspace-sequential, so the oracle reproduces the exact assignments,
    codes, tables, and totals bit-for-bit."""
    import numpy as np

    from iceberg_relative_io_spark.operators.northstar import (
        _IVF_FLOOR,
        _N_PROBE,
        _TOP_K,
        ivf_query_rows,
    )
    from iceberg_relative_io_spark.operators.pipeline_ext import _PQ_NCENT, _PQ_SUB

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", V.norm(F.col("embedding")).alias("nrm")
    )
    # corpus-derived nlist — same sqrt(N) derivation (and oracle mirror)
    # as q_ann_ivf; the PQ codebook stays fixed-size (it quantizes the
    # SPACE, not the corpus — its resolution is a quality knob, not a
    # scale knob). The count, both centroid packs, and the query rows
    # come from the session caches shared with q_ann_ivf / q_pq_codes
    # (round 11) — zero extra driver actions when any of those ran.
    nlist = V.derived_sqrt(V.cached_count(spark, sf_dir, emb), _IVF_FLOOR)
    bc_cells = V.centroids_broadcast(spark, sf_dir, emb, nlist)
    cids, C, nc = bc_cells.value
    # nondeterministic marking (guide §4.4): the probe join's pushed
    # isnotnull(cell) otherwise re-evaluates the corpus-sized cell
    # assignment below the filter — one extra full UDF pass in the plan
    cell_of = V.make_nearest_udf(bc_cells).asNondeterministic()

    bc_pq = V.centroids_broadcast(spark, sf_dir, emb, _PQ_NCENT)
    pcids, PC = bc_pq.value[0], bc_pq.value[1]
    pq_assign = V.make_pq_assign_udf(bc_pq, _PQ_SUB).asNondeterministic()
    dim_per = PC.shape[1] // _PQ_SUB

    # Driver-side query prep (the query batch is tiny by definition):
    # probe cells + per-query ADC tables, same sequential math as the SQL.
    q_rows = ivf_query_rows(spark, sf_dir, emb)
    probe_rows = []
    adc_tables = {}
    for r in q_rows:
        v = np.array(r.embedding, dtype=np.float64)
        s_acc = np.zeros(len(C), dtype=np.float64)
        nv = 0.0
        for i in range(len(v)):
            s_acc = s_acc + v[i] * C[:, i]
            nv = nv + v[i] * v[i]
        cos = s_acc / (np.sqrt(nv) * nc)
        order = np.lexsort((cids, -cos))
        for cid in cids[order[:_N_PROBE]]:
            probe_rows.append((int(r.vec_id), int(cid)))
        tab = np.zeros((_PQ_SUB, len(pcids)), dtype=np.float64)
        for s in range(_PQ_SUB):
            D = np.zeros(len(pcids), dtype=np.float64)
            for j in range(dim_per):
                diff = v[s * dim_per + j] - PC[:, s * dim_per + j]
                D = D + diff * diff
            tab[s] = D
        adc_tables[int(r.vec_id)] = tab
    pq_index = {int(c): i for i, c in enumerate(pcids)}
    bc_adc = spark.sparkContext.broadcast((adc_tables, pq_index))

    from pyspark.sql.types import DoubleType

    @F.pandas_udf(DoubleType())
    def adc_score(query_id: pd.Series, codes: pd.Series) -> pd.Series:
        import numpy as np  # noqa: PLC0415 — executor-side import

        tabs, idx = bc_adc.value
        qids = sorted(tabs)
        T3 = np.stack([tabs[q] for q in qids])  # (nq, SUB, ncent)
        qpos = {q: i for i, q in enumerate(qids)}
        qi = query_id.map(qpos).to_numpy(dtype=np.int64)
        code_mat = np.stack(codes.to_numpy()).astype(np.int64)  # (n, SUB)
        # centroid id -> codebook position via binary search over the
        # id-sorted codebook: O(ncent) memory. (A dense value-indexed
        # LUT would be sized by the LARGEST centroid id — an id drawn
        # from the corpus id space, i.e. O(corpus) memory at scale.)
        sorted_cids = np.array(sorted(idx), dtype=np.int64)
        cidx = np.searchsorted(sorted_cids, code_mat)
        tot = np.zeros(len(qi), dtype=np.float64)
        for s in range(T3.shape[1]):  # subspace-sequential: oracle fold order
            tot = tot + T3[qi, s, cidx[:, s]]
        return pd.Series(tot)

    corpus = emb.select(
        "vec_id",
        cell_of(F.col("embedding")).alias("cell"),
        pq_assign(F.col("embedding")).alias("codes"),
    )
    probes = spark.createDataFrame(probe_rows, "query_id long, probe_cell long")
    cand = corpus.join(
        F.broadcast(probes),
        (F.col("cell") == F.col("probe_cell")) & (F.col("vec_id") != F.col("query_id")),
    )
    scored = cand.select(
        "query_id",
        "vec_id",
        adc_score(F.col("query_id"), F.col("codes")).alias("approx_dist"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("approx_dist").asc(), F.col("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _TOP_K)
        .select("query_id", "vec_id", "rnk", "approx_dist")
    )


# ---------------------------------------------------------------------------
# registries
# ---------------------------------------------------------------------------

QUERIES = {
    "c03_semantic_dedup": q_semantic_dedup,
    "c04_bm25_search": q_bm25_search,
    "c04_bigram_logprob": q_bigram_logprob,
    "c06_shard_shuffle": q_shard_shuffle,
    "c03_ann_recall_eval": q_ann_recall_eval,
    "c03_ivf_recall_eval": q_ivf_recall_eval,
    "c03_pq_recall_eval": q_pq_recall_eval,
    "c06_mixture_weights": q_mixture_weights,
    "c02_connected_components": q_connected_components,
    "c02_substring_removal": q_substring_removal,
    "c05_resize_pipeline": q_resize_pipeline,
    "c06_contamination_bloom": q_contamination_bloom,
    "c02_doc_containment": q_doc_containment,
    "c06_dataset_card": q_dataset_card,
    "c03_ann_ivfpq": q_ann_ivfpq,
}


def _ivfpq_oracle() -> str:
    from iceberg_relative_io_spark.operators.northstar import (
        _IVF_FLOOR,
        _N_PROBE,
        _N_QUERIES,
        _TOP_K,
    )
    from iceberg_relative_io_spark.operators.pipeline_ext import _PQ_NCENT, _PQ_SUB

    def subdist(vec: str, cvec: str) -> str:
        return (
            "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"[ (CAST({vec}[sub.s * 8 + j] AS DOUBLE) - CAST({cvec}[sub.s * 8 + j] AS DOUBLE)) "
            f"* (CAST({vec}[sub.s * 8 + j] AS DOUBLE) - CAST({cvec}[sub.s * 8 + j] AS DOUBLE)) "
            "FOR j IN range(1, 9) ]), (acc, x) -> acc + x)"
        )

    sub_cte = (
        f"(SELECT CAST(u.i AS INT) AS s FROM UNNEST(range(0, {_PQ_SUB})) AS u(i)) sub"
    )
    return f"""
        WITH cents AS (
            {V.sample_cte_sql(V.derived_sqrt_sql(_IVF_FLOOR))}
        ),
        pcent AS (
            {V.sample_cte_sql(_PQ_NCENT, 'pcid', 'pvec')}
        ),
        assign AS (
            SELECT vec_id, cid FROM (
                SELECT e.vec_id, c.cid,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY {V.cosine_sql('e.embedding', 'c.cvec')} DESC, c.cid
                       ) AS rn
                FROM embeddings e, cents c
            ) WHERE rn = 1
        ),
        pairs AS (
            SELECT e.vec_id, sub.s AS subspace, p.pcid,
                   {subdist('e.embedding', 'p.pvec')} AS dist
            FROM embeddings e, pcent p, {sub_cte}
        ),
        codes AS (
            SELECT vec_id, subspace, pcid AS code FROM (
                SELECT *, row_number() OVER (PARTITION BY vec_id, subspace
                                             ORDER BY dist, pcid) AS rn
                FROM pairs
            ) WHERE rn = 1
        ),
        probes AS (
            SELECT query_id, cid FROM (
                SELECT q.vec_id AS query_id, c.cid,
                       row_number() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY {V.cosine_sql('q.embedding', 'c.cvec')} DESC, c.cid
                       ) AS rn
                FROM embeddings q, cents c WHERE q.vec_id < {_N_QUERIES}
            ) WHERE rn <= {_N_PROBE}
        ),
        adc AS (
            SELECT q.vec_id AS query_id, p.pcid, sub.s AS subspace,
                   {subdist('q.embedding', 'p.pvec')} AS d
            FROM embeddings q, pcent p, {sub_cte}
            WHERE q.vec_id < {_N_QUERIES}
        ),
        cand AS (
            SELECT p.query_id, a.vec_id
            FROM probes p JOIN assign a ON a.cid = p.cid AND a.vec_id <> p.query_id
        ),
        scored AS (
            SELECT c.query_id, c.vec_id,
                   list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                       list(adc.d ORDER BY k.subspace)),
                       (acc, x) -> acc + x) AS approx_dist
            FROM cand c
            JOIN codes k ON k.vec_id = c.vec_id
            JOIN adc ON adc.query_id = c.query_id
                    AND adc.subspace = k.subspace AND adc.pcid = k.code
            GROUP BY c.query_id, c.vec_id
        )
        SELECT query_id, vec_id, rnk, approx_dist FROM (
            SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY approx_dist, vec_id) AS rnk,
                   approx_dist
            FROM scored
        ) WHERE rnk <= {_TOP_K}
    """


def _sem_oracle() -> str:
    return f"""
        WITH cents AS (
            {V.sample_cte_sql(V.derived_cells_sql(_SEM_TARGET_CELL))}
        ),
        assign AS (
            SELECT vec_id, cid FROM (
                SELECT e.vec_id, c.cid,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY {V.cosine_sql('e.embedding', 'c.cvec')} DESC, c.cid
                       ) AS rn
                FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL) e,
                     cents c
            ) WHERE rn = 1
        )
        SELECT a.vec_id, a.cid AS cell,
               CASE WHEN EXISTS (
                   SELECT 1 FROM assign b
                   JOIN embeddings eb ON eb.vec_id = b.vec_id
                   JOIN embeddings ea ON ea.vec_id = a.vec_id
                   WHERE b.cid = a.cid AND b.vec_id < a.vec_id
                     AND {V.cosine_sql('ea.embedding', 'eb.embedding')} >= {_SEM_TAU}
               ) THEN 0 ELSE 1 END AS kept
        FROM assign a
    """


def _bm25_oracle() -> str:
    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    return f"""
        WITH stats AS (
            SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                   CAST(sum(len(string_split(text, ' '))) AS DOUBLE)
                       / CAST(count(*) AS DOUBLE) AS avgdl
            FROM documents
        ),
        toks AS (
            SELECT doc_id, len(string_split(text, ' ')) AS dl, unnest(string_split(text, ' ')) AS term
            FROM documents
        ),
        postings AS (
            SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf,
                   CAST(min(dl) AS DOUBLE) AS dl
            FROM toks WHERE term IN ({terms})
            GROUP BY doc_id, term
        ),
        df_t AS (
            SELECT term, CAST(count(*) AS DOUBLE) AS df FROM postings GROUP BY term
        ),
        scored AS (
            SELECT p.doc_id, p.term,
                   ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
                   * (p.tf * ({_BM25_K1} + 1.0))
                   / (p.tf + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * p.dl / s.avgdl))
                       AS s
            FROM postings p JOIN df_t d USING (term) CROSS JOIN stats s
        ),
        per_doc AS (
            SELECT doc_id,
                   list_reduce(list_prepend(0.0, list(s ORDER BY term)), (a, x) -> a + x)
                       AS score,
                   count(*) AS n_terms
            FROM scored GROUP BY doc_id
        )
        SELECT * FROM (
            SELECT row_number() OVER (ORDER BY score DESC, doc_id) AS rnk,
                   doc_id, n_terms, score
            FROM per_doc
        ) WHERE rnk <= {_BM25_TOPN}
    """


def _bigram_oracle() -> str:
    return """
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ),
        bg AS (
            SELECT doc_id, b.pos, b.w1, b.w2 FROM (
                SELECT doc_id,
                       unnest(list_transform(
                           generate_series(1, len(t) - 1),
                           i -> struct_pack(pos := i - 1, w1 := t[i], w2 := t[i + 1])
                       )) AS b
                FROM toks
            )
        ),
        c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
        c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1),
        lp AS (
            SELECT b.doc_id, b.pos,
                   ln(CAST(j.c12 AS DOUBLE) / CAST(u.c1 AS DOUBLE)) AS lp
            FROM bg b JOIN c12 j ON b.w1 = j.w1 AND b.w2 = j.w2
            JOIN c1 u ON b.w1 = u.w1
        ),
        per_doc AS (
            SELECT doc_id, count(*) AS n_bigrams,
                   list_reduce(list_prepend(0.0, list(lp ORDER BY pos)), (a, x) -> a + x)
                       AS logprob
            FROM lp GROUP BY doc_id
        )
        SELECT d.doc_id,
               COALESCE(p.n_bigrams, 0) AS n_bigrams,
               COALESCE(p.logprob, 0.0) AS logprob
        FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
    """


def _shard_oracle() -> str:
    return f"""
        WITH keyed AS (
            SELECT doc_id,
                   (doc_id * {_SHUF_A} + {_SHUF_C}) % {_SHUF_M} AS shuffle_key
            FROM documents
        )
        SELECT doc_id,
               shuffle_key % {_N_SHARDS} AS shard,
               CAST(row_number() OVER (
                   PARTITION BY shuffle_key % {_N_SHARDS}
                   ORDER BY shuffle_key, doc_id
               ) AS INT) AS shard_pos,
               shuffle_key
        FROM keyed
    """


def _recall_oracle(
    approx_key: str = "c03_ann_lsh", approx_sql: str | None = None
) -> str:
    """Recall-eval oracle against the exact top-k; the approximate
    path's oracle nests as a subquery — named by ``approx_key`` in
    northstar's registry (LSH default, IVF) or passed verbatim via
    ``approx_sql`` (IVF-PQ here, rerank in retrieval_ext). Every
    variant replays its index probe exactly."""
    from iceberg_relative_io_spark.operators.northstar import ORACLE as NS

    if approx_sql is None:
        approx_sql = NS[approx_key]
    return f"""
        WITH exact AS (
            SELECT query_id, vec_id FROM ({NS['c03_knn_bruteforce']})
        ),
        approx AS (
            SELECT query_id, vec_id FROM ({approx_sql})
        ),
        base AS (SELECT query_id, count(*) AS n_exact FROM exact GROUP BY query_id),
        hits AS (
            SELECT e.query_id, count(*) AS n_hit
            FROM exact e
            WHERE EXISTS (SELECT 1 FROM approx a
                          WHERE a.query_id = e.query_id AND a.vec_id = e.vec_id)
            GROUP BY e.query_id
        )
        SELECT b.query_id, b.n_exact,
               COALESCE(h.n_hit, 0) AS n_hit,
               CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / CAST(b.n_exact AS DOUBLE)
                   AS recall
        FROM base b LEFT JOIN hits h ON b.query_id = h.query_id
    """


def _mixture_oracle() -> str:
    return f"""
        WITH counts AS (
            SELECT source, count(*) AS n_docs FROM documents GROUP BY source
        ),
        pw AS (
            SELECT source, n_docs,
                   sqrt(CAST(n_docs AS DOUBLE)) AS pw
            FROM counts
        ),
        total AS (
            SELECT list_reduce(list_prepend(0.0, list(pw ORDER BY source)), (a, x) -> a + x)
                       AS total_pw
            FROM pw
        )
        SELECT p.source, p.n_docs,
               p.pw / t.total_pw AS weight,
               CAST(floor(p.pw / t.total_pw * {_MIX_BUDGET}) AS BIGINT) AS quota_docs
        FROM pw p CROSS JOIN total t
    """


def _cc_oracle() -> str:
    # identical answer contract to the driver-side-union-find operator:
    # reuse its recursive transitive-closure oracle verbatim
    from iceberg_relative_io_spark.operators.northstar import ORACLE as NS

    return NS["c02_dedup_survivors"]


def _removal_oracle() -> str:
    from iceberg_relative_io_spark.functions import text as T

    codes = T.token_codes_sql("text")
    return f"""
        WITH c AS (
            SELECT doc_id, text, {codes} AS codes FROM documents
        ),
        g AS (
            SELECT doc_id, e.gpos AS gpos, e.code AS code FROM (
                SELECT doc_id,
                       unnest(list_transform(
                           generate_series(1, len(gr)),
                           i -> struct_pack(gpos := i, code := gr[i])
                       )) AS e
                FROM (SELECT doc_id, {T.gram_codes_sql('codes', _RM_K)} AS gr FROM c)
            )
        ),
        dup AS (
            SELECT code FROM g GROUP BY code HAVING count(DISTINCT doc_id) >= 2
        ),
        covered AS (
            SELECT DISTINCT doc_id, tpos FROM (
                SELECT doc_id,
                       unnest(generate_series(gpos, gpos + {_RM_K - 1})) AS tpos
                FROM g JOIN dup USING (code)
            )
        ),
        tk AS (
            SELECT doc_id, e.tpos AS tpos, e.tok AS tok FROM (
                SELECT doc_id,
                       unnest(list_transform(
                           generate_series(1, len(t)),
                           i -> struct_pack(tpos := i, tok := t[i])
                       )) AS e
                FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
            )
        ),
        surv AS (
            SELECT t.doc_id, t.tpos, t.tok FROM tk t
            WHERE NOT EXISTS (SELECT 1 FROM covered v
                              WHERE v.doc_id = t.doc_id AND v.tpos = t.tpos)
        ),
        cl AS (
            SELECT doc_id, count(*) AS n_kept,
                   string_agg(tok, ' ' ORDER BY tpos) AS cleaned_text
            FROM surv GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(len(string_split(d.text, ' ')) AS INT) AS n_tokens,
               CAST(len(string_split(d.text, ' ')) - COALESCE(cl.n_kept, 0) AS INT)
                   AS n_removed,
               COALESCE(cl.cleaned_text, '') AS cleaned_text
        FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id
    """


def _containment_oracle() -> str:
    from iceberg_relative_io_spark.functions import text as T
    from iceberg_relative_io_spark.operators.northstar import (
        _MINS,
        _docs_with_shingles_cte,
    )

    bands_cte = (
        _docs_with_shingles_cte()
        + ", bands AS (SELECT doc_id, shingles, band, sig FROM sh, "
        + "LATERAL (VALUES "
        + ", ".join(f"({b}, {T.band_signature_sql(_MINS, b)})" for b in range(T.BANDS))
        + ") AS t(band, sig))"
    )
    return (
        bands_cte
        + f"""
        , pairs AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   len(list_distinct(a.shingles)) AS n_a,
                   len(list_distinct(b.shingles)) AS n_b,
                   len(list_intersect(list_distinct(a.shingles),
                                      list_distinct(b.shingles))) AS n_inter
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
        )
        SELECT doc_a, doc_b,
               CAST(n_a AS INT) AS n_a, CAST(n_b AS INT) AS n_b,
               CAST(n_inter AS INT) AS n_inter,
               CAST(n_inter AS DOUBLE) / CAST(least(n_a, n_b) AS DOUBLE)
                   AS containment
        FROM pairs
        WHERE CAST(n_inter AS DOUBLE) / CAST(least(n_a, n_b) AS DOUBLE)
              >= {_CONTAIN_T}
    """
    )


def _bloom_oracle() -> str:
    from iceberg_relative_io_spark.functions import text as T

    codes = T.token_codes_sql("text")
    pos_list = "[" + ", ".join(
        f"((g * {T.hash_params(j)[0]} + {T.hash_params(j)[1]}) % {T.MOD}) % {_BLOOM_M}"
        for j in range(_BLOOM_K)
    ) + "]"
    return f"""
        WITH c AS (
            SELECT doc_id, lang, ({T.fingerprint_sql('text')}) % 100 AS bucket,
                   {codes} AS codes
            FROM documents
        ),
        t AS (
            SELECT doc_id, lang, bucket,
                   list_distinct({T.gram_codes_sql('codes', _CONTAM_K)}) AS grams
            FROM c
        ),
        tr_g AS (SELECT DISTINCT unnest(grams) AS g FROM t WHERE bucket < 80),
        bits AS (SELECT DISTINCT unnest({pos_list}) AS pos FROM tr_g),
        te AS (SELECT doc_id, lang, grams FROM t WHERE bucket >= 90),
        te_g AS (SELECT doc_id, unnest(grams) AS g FROM te),
        te_p AS (SELECT doc_id, g, unnest({pos_list}) AS pos FROM te_g),
        pg AS (
            SELECT tp.doc_id, tp.g,
                   min(CASE WHEN b.pos IS NULL THEN 0 ELSE 1 END) AS all_present
            FROM te_p tp LEFT JOIN bits b ON tp.pos = b.pos
            GROUP BY tp.doc_id, tp.g
        ),
        pd AS (SELECT doc_id, CAST(sum(all_present) AS BIGINT) AS n_flagged
               FROM pg GROUP BY doc_id)
        SELECT te.doc_id, te.lang,
               CAST(len(te.grams) AS INT) AS n_grams,
               COALESCE(pd.n_flagged, 0) AS n_flagged,
               CAST(COALESCE(pd.n_flagged, 0) > 0 AS INT) AS contaminated
        FROM te LEFT JOIN pd ON te.doc_id = pd.doc_id
    """


ORACLE = {
    "c03_semantic_dedup": _sem_oracle(),
    "c04_bm25_search": _bm25_oracle(),
    "c04_bigram_logprob": _bigram_oracle(),
    "c06_shard_shuffle": _shard_oracle(),
    "c03_ann_recall_eval": _recall_oracle(),
    "c03_ivf_recall_eval": _recall_oracle("c03_ann_ivf"),
    "c03_pq_recall_eval": _recall_oracle(approx_sql=_ivfpq_oracle()),
    "c06_mixture_weights": _mixture_oracle(),
    "c02_connected_components": _cc_oracle(),
    "c02_substring_removal": _removal_oracle(),
    "c06_contamination_bloom": _bloom_oracle(),
    "c02_doc_containment": _containment_oracle(),
    "c03_ann_ivfpq": _ivfpq_oracle(),
    "c06_dataset_card": f"""
        WITH dups AS (
            SELECT text FROM documents GROUP BY text HAVING count(*) > 1
        ),
        f AS (
            SELECT d.source, d.lang,
                   len(string_split(d.text, ' ')) AS n_tok,
                   CASE WHEN p.text IS NULL THEN 0 ELSE 1 END AS is_dup
            FROM documents d LEFT JOIN dups p ON d.text = p.text
        )
        SELECT source, lang,
               count(*) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS total_tokens,
               CAST(sum(is_dup) AS BIGINT) AS n_dup_docs,
               -- NULL n_tok (NULL text) contributes NULL, matching the
               -- engine's (n_tok < K) boolean-cast NULL propagation
               CAST(sum(CASE WHEN n_tok IS NULL THEN NULL
                             WHEN n_tok < {_SHORT_DOC_TOKENS} THEN 1
                             ELSE 0 END)
                    AS BIGINT) AS n_short_docs
        FROM f GROUP BY source, lang
    """,
    "c05_resize_pipeline": f"""
        SELECT doc_id AS item_id,
               'application/octet-stream' AS mime,
               -- NULL asset passes through the resize stage as NULL
               -- (DuckDB's least() would otherwise swallow the NULL)
               CAST(CASE WHEN text IS NULL THEN NULL
                         ELSE least(octet_length(encode(text)), {_RESIZE_BYTES})
                    END AS INT) AS n_bytes,
               substring(hex(encode(text)), 1, {2 * _RESIZE_BYTES}) AS payload_hex
        FROM documents
    """,
}
