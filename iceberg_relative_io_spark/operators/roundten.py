"""Round-10 operators: distributed BPE merge rounds and graph-ANN beam
search.

Two capabilities a training-data platform needs that the inventory did
not yet cover. The reference delegates its entire query surface to
Spark+Iceberg (SURVEY §0; reference README.md:8-11), so LLM-corpus
operators like these are engine-parity inventory, not ports of
reference code.

**c04_bpe_pair_merges** — the inner loop of BPE tokenizer training
(Sennrich et al. 2016), the step every tokenizer pipeline runs before
a corpus can be tokenized at all: count adjacent symbol pairs across
the corpus weighted by word frequency, merge the most frequent pair
everywhere, repeat. Distributed shape: the corpus collapses ONCE into
the word-frequency table (wordcount with map-side partials — the table
is vocabulary-sized, not corpus-sized, and is session-cached via the
round-10 cache registry); every merge round then runs over that
bounded table — pair explosion is map-only, the pair count
partial-aggregates before its one exchange, the winning pair is a
one-row aggregate broadcast back into a windowed greedy merge
application (see _apply_merge: true left-to-right BPE semantics, which
a literal string replace does NOT have for back-to-back occurrences —
a hypothesis property test caught that). Nothing per-round ever
rescans the corpus or collects unbounded rows.

**c03_ann_graph_beam** — graph-based ANN serving (the HNSW/NSG family):
answer queries by walking the kNN graph from a fixed entry set instead
of scanning the corpus. Reuses the c03_knn_graph edges (and therefore
the session-cached two-level quantizer assignment — one featurization
pass serves graph build, diversity cap, and serving). Relational
framing of the walk: each hop is ONE broadcast-probe pass of the edge
table (frontier is O(queries x beam), always the broadcast side) plus
one broadcast-probe pass of the embedding table to score new
candidates — and each pass serves EVERY query simultaneously, which is
how a batch engine amortizes what a pointer-chasing index does one
query at a time. Hop count and beam width are constants, so the whole
search is a fixed 2x(scan+scan) pipeline regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_relative_io_spark import caches
from iceberg_relative_io_spark.functions import vectors as V
from iceberg_relative_io_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# C4 — BPE pair-merge rounds (tokenizer training inner loop)
# ---------------------------------------------------------------------------

_BPE_ROUNDS = 2  # merge rounds to run
_BPE_TOPN = 5    # pair candidates reported per round

# word-frequency table, session-cached: both rounds and every consumer
# share ONE corpus pass (the 100-TB contract: the corpus is read once,
# training state is vocabulary-sized)
_WF_CACHE: dict[tuple, DataFrame] = caches.register_cache({})


def _word_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(word, cnt, seq): corpus wordcount plus each word's initial BPE
    symbol sequence (space-joined characters). One shuffle with
    map-side partials; output is vocabulary-sized."""
    key = (caches.session_key(spark), sf_dir)
    if key not in _WF_CACHE:
        docs = load_table(spark, sf_dir, "documents")
        wf = (
            docs.filter(F.col("text").isNotNull())
            .select(F.explode(F.split("text", " ")).alias("word"))
            .groupBy("word")
            .agg(F.count("*").alias("cnt"))
            # '(.)' -> '$1 ': space-join the characters. regexp_replace
            # replaces ALL matches in Spark; the oracle passes 'g' to
            # DuckDB's RE2 for the identical expansion.
            .withColumn(
                "seq",
                F.trim(F.regexp_replace(F.col("word"), "(.)", "$1 ")),
            )
        )
        _WF_CACHE[key] = wf.persist()
    return _WF_CACHE[key]


def _pair_counts(words: DataFrame) -> DataFrame:
    """(pair, cnt): adjacent-symbol pair counts weighted by word
    frequency. Map-only explode + one partial-aggregated exchange; the
    distinct-pair space is bounded by alphabet^2 + merges-so-far, never
    by the corpus."""
    syms = F.split(F.col("seq"), " ")
    pairs = F.transform(
        F.sequence(F.lit(0), F.size(syms) - F.lit(2)),
        lambda i: F.concat(
            F.element_at(syms, i + F.lit(1)),
            F.lit(" "),
            F.element_at(syms, i + F.lit(2)),
        ),
    )
    return (
        # guard: a 1-symbol word has no pairs, and sequence(0, -1) would
        # generate a DESCENDING range rather than an empty one
        words.filter(F.size(syms) >= 2)
        .select("cnt", F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.sum("cnt").alias("cnt"))
    )


def _apply_merge(words: DataFrame, top1: DataFrame) -> DataFrame:
    """Merge the winning pair (a, b) in every word's symbol sequence
    with TRUE greedy BPE semantics: scan left to right, merge on sight,
    continue after the merged token. Every real trainer (Sennrich's
    re.sub with zero-width boundaries, HuggingFace) merges ALL
    non-overlapping occurrences in one pass — including back-to-back
    ones like 'a b a b' -> 'ab ab' — so a padded literal replace
    (which consumes the shared separator and skips the second
    occurrence) is NOT equivalent; the round-10 hypothesis property
    test caught exactly that.

    Round-11 optimization (guide §2.4 — remove shuffles outright): the
    greedy scan is a single left-to-right ``F.aggregate`` fold over the
    split symbols — MAP-ONLY, zero exchanges. The previous relational
    form (posexplode + lead window + run-grouping windows + two
    position self-joins + ordered re-agg) shuffled the vocabulary table
    ~6x per round; measured on this chain, c04_bpe_encode's plan
    carried 112 Exchange nodes. The fold appends each symbol unless the
    accumulator's last element equals ``a`` and the symbol equals ``b``,
    in which case the last element is replaced by the merged token.
    Greedy run semantics ('x x x' with (x,x) -> 'xx x') fall out
    directly: a just-merged last element has text a||b, which can never
    equal ``a`` (b is a non-empty symbol), so it can never left-match
    again in the same pass — exactly the textbook scan's "continue
    after the merged token". A NULL winner (empty pair table) matches
    nothing and the merge is a no-op, as before. Equivalence to the
    textbook trainer is pinned corpus-wide by
    test_bpe_matches_pure_python_trainer / _encode_* and per-word by
    the round-11 hypothesis property test
    (test_engine_fold_merge_is_greedy_bpe)."""
    m = words.crossJoin(F.broadcast(top1))
    syms = F.split(F.col("seq"), " ")
    merged = F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            F.coalesce(
                (F.size(acc) > 0)
                & (F.try_element_at(acc, F.lit(-1)) == F.col("top_a"))
                & (x == F.col("top_b")),
                F.lit(False),
            ),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(F.concat(F.col("top_a"), F.col("top_b"))),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )
    return m.select("word", "cnt", F.concat_ws(" ", merged).alias("seq"))


def q_bpe_pair_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 (tokenizer training): run _BPE_ROUNDS BPE merge rounds over
    the corpus word-frequency table and report each round's top
    _BPE_TOPN pair candidates — (round, rnk, pair, merged, cnt). The
    round-r winner (rnk 1) is the merge applied before round r+1, so
    the output pins both the pair statistics and the merge application
    exactly; counts are frequency-weighted integers, making the oracle
    value-exact. Ties break on pair text ascending, like every
    deterministic sampler here.

    The per-round top-N window is unpartitioned BY DESIGN: it ranks the
    aggregated pair table (bounded by alphabet^2 + merges), never the
    token stream — same argument as c04_vocab_build's id window.

    _BPE_ROUNDS sensitivity: tie-breaks and run-parity INTERACT across
    rounds (a round-r merge changes which runs exist for round r+1, and
    the (cnt DESC, pair ASC) tie-break decides different winners once
    counts collide), so correctness at the shipped 2 rounds does not by
    itself pin deeper chains. The round-11 hypothesis property test
    (test_oracle_multiround_chain_matches_python_trainer) runs the
    oracle's full CTE chain at 4 rounds against the textbook trainer on
    random corpora; raise _BPE_ROUNDS freely — the chain is pinned past
    the shipped depth."""
    words = _word_freq(spark, sf_dir)
    out = []
    for rnd in range(1, _BPE_ROUNDS + 1):
        pc = _pair_counts(words)
        w = Window.orderBy(F.col("cnt").desc(), F.col("pair"))
        ranked = pc.withColumn("rnk", F.row_number().over(w)).filter(
            F.col("rnk") <= _BPE_TOPN
        )
        out.append(
            ranked.select(
                F.lit(rnd).alias("round"),
                "rnk",
                "pair",
                F.replace(F.col("pair"), F.lit(" "), F.lit("")).alias(
                    "merged"
                ),
                "cnt",
            )
        )
        if rnd < _BPE_ROUNDS:
            words = _apply_merge(words, _top_pair(pc))
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res


def _bpe_ctes(n_merges: int) -> list[str]:
    """The shared BPE CTE chain: w1 (word-frequency table with initial
    character sequences), then per round r: p{r} (pair counts), m{r}
    (the winning merge), w{r+1} (sequences with it applied). DuckDB
    prunes unreferenced CTEs, so oracles cite only the stages they
    need."""
    words = """
        SELECT word, cnt,
               trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS seq
        FROM (
            SELECT tok AS word, count(*) AS cnt
            FROM (SELECT unnest(string_split(text, ' ')) AS tok
                  FROM documents WHERE text IS NOT NULL)
            GROUP BY tok
        )
    """
    ctes = [f"w1 AS ({words})"]
    for rnd in range(1, n_merges + 1):
        ctes.append(
            f"""p{rnd} AS (
            SELECT syms[i] || ' ' || syms[i+1] AS pair,
                   CAST(sum(cnt) AS BIGINT) AS cnt
            FROM (SELECT cnt, string_split(seq, ' ') AS syms FROM w{rnd}),
                 UNNEST(generate_series(1, len(syms) - 1)) AS g(i)
            GROUP BY 1
        )"""
        )
        ctes.append(
            f"""m{rnd} AS (
            SELECT string_split(pair, ' ')[1] AS a,
                   string_split(pair, ' ')[2] AS b
            FROM p{rnd} ORDER BY cnt DESC, pair LIMIT 1
        )"""
        )
        # greedy merge application, mirroring _apply_merge exactly:
        # t = exploded symbols with successor; k = greedy-taken
        # occurrence positions (all disjoint occurrences; every other
        # one within an a==b run); w' drops the swallowed successor and
        # reassembles in position order
        ctes.append(
            f"""t{rnd} AS (
            SELECT word, cnt, i, syms[i] AS sym, syms[i + 1] AS nxt
            FROM (SELECT word, cnt, string_split(seq, ' ') AS syms
                  FROM w{rnd}),
                 UNNEST(generate_series(1, len(syms))) AS g(i)
        )"""
        )
        ctes.append(
            f"""k{rnd} AS (
            SELECT word, i FROM (
                SELECT word, i,
                       row_number() OVER (PARTITION BY word, i - rn
                                          ORDER BY i) AS pr
                FROM (
                    SELECT word, i,
                           row_number() OVER (PARTITION BY word
                                              ORDER BY i) AS rn
                    FROM t{rnd}
                    WHERE sym = (SELECT a FROM m{rnd})
                      AND nxt = (SELECT b FROM m{rnd})
                )
            ) WHERE pr % 2 = 1
        )"""
        )
        ctes.append(
            f"""w{rnd + 1} AS (
            SELECT t.word, t.cnt,
                   string_agg(CASE WHEN k.i IS NOT NULL
                                   THEN t.sym || t.nxt
                                   ELSE t.sym END,
                              ' ' ORDER BY t.i) AS seq
            FROM t{rnd} t
            LEFT JOIN k{rnd} k  ON k.word = t.word AND k.i = t.i
            LEFT JOIN k{rnd} kp ON kp.word = t.word AND kp.i = t.i - 1
            WHERE kp.i IS NULL
            GROUP BY t.word, t.cnt
        )"""
        )
    return ctes


def _bpe_oracle() -> str:
    rounds_sql = [
        f"""SELECT {rnd} AS round, rnk, pair,
               replace(pair, ' ', '') AS merged, cnt
        FROM (SELECT pair, cnt,
                     row_number() OVER (ORDER BY cnt DESC, pair) AS rnk
              FROM p{rnd})
        WHERE rnk <= {_BPE_TOPN}"""
        for rnd in range(1, _BPE_ROUNDS + 1)
    ]
    return (
        "WITH "
        + ",\n".join(_bpe_ctes(_BPE_ROUNDS))
        + "\n"
        + "\nUNION ALL\n".join(rounds_sql)
    )


def _top_pair(pc: DataFrame) -> DataFrame:
    """1-row winner of a pair-count table:
    min(struct(-cnt, pair)) == (cnt desc, pair asc). Emits the pair's
    two symbols (an empty pair table yields NULLs, which match no
    occurrence — the merge is then a no-op, identically in the
    oracle)."""
    return pc.agg(
        F.min(F.struct((-F.col("cnt")).alias("negc"), "pair")).alias("t")
    ).select(
        F.split(F.col("t.pair"), " ").getItem(0).alias("top_a"),
        F.split(F.col("t.pair"), " ").getItem(1).alias("top_b"),
    )


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 (tokenizer application): encode every document with the
    _BPE_ROUNDS-merge tokenizer q_bpe_pair_merges trains and report
    (doc_id, n_words, n_subwords) — the SUBWORD token count that
    token-budget math (c06_token_budget_allocation, c04_sequence_packing)
    actually needs, where c04_token_count's whitespace count is only a
    proxy. The encoder state is the per-word subword count of the
    merged word-frequency table (vocabulary-sized, broadcast); encoding
    the corpus is then one map-only pass of the exploded token stream
    through that broadcast join plus a doc_id re-aggregation. No
    per-document BPE scan exists anywhere — each distinct word is
    merged once, however many times it occurs."""
    docs = load_table(spark, sf_dir, "documents")
    words = _word_freq(spark, sf_dir)
    for _ in range(_BPE_ROUNDS):
        words = _apply_merge(words, _top_pair(_pair_counts(words)))
    nsub = words.select(
        "word", F.size(F.split("seq", " ")).alias("n_sub")
    )
    toks = docs.filter(F.col("text").isNotNull()).select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )
    return (
        toks.join(F.broadcast(nsub), "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_sub").alias("n_subwords"),
        )
    )


def _bpe_encode_oracle() -> str:
    return (
        "WITH "
        + ",\n".join(_bpe_ctes(_BPE_ROUNDS))
        + f""",
        ns AS (
            SELECT word, len(string_split(seq, ' ')) AS n_sub
            FROM w{_BPE_ROUNDS + 1}
        ),
        toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS word
            FROM documents WHERE text IS NOT NULL
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_words,
               CAST(sum(n_sub) AS BIGINT) AS n_subwords
        FROM toks JOIN ns USING (word)
        GROUP BY doc_id
    """
    )


# ---------------------------------------------------------------------------
# C3 — graph-ANN beam search over the kNN graph
# ---------------------------------------------------------------------------

_BEAM_ENTRIES = 32  # fixed entry-point set (hash-sample of the corpus)
_BEAM_WIDTH = 4     # beam kept per hop
_BEAM_HOPS = 2      # expansion rounds
_BEAM_TOPK = 3      # results returned per query

# the kNN graph IS the serving index: built once per (session, corpus),
# persisted, probed by every hop of every query. Without this the
# ~O(N^1.34) pair stage re-executes once per hop consumer — measured
# 14.3x at 10x data vs ~8x with the index persisted.
_GRAPH_CACHE: dict[tuple, DataFrame] = caches.register_cache({})


def _graph_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_relative_io_spark.operators.northstar import q_knn_graph

    key = (caches.session_key(spark), sf_dir)
    if key not in _GRAPH_CACHE:
        _GRAPH_CACHE[key] = (
            q_knn_graph(spark, sf_dir)
            .select(F.col("vec_id").alias("src"), F.col("nbr_id").alias("dst"))
            .persist()
        )
    return _GRAPH_CACHE[key]


def q_ann_graph_beam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 (graph-ANN serving): beam search over the c03_knn_graph
    edges. Each query starts at its best of _BEAM_ENTRIES fixed
    hash-sampled entry points (HNSW's entry layer, flattened), then for
    _BEAM_HOPS rounds expands the beam's out-edges, rescores the
    deduplicated candidates against the query, and keeps the top
    _BEAM_WIDTH by (cosine desc, vec_id) — returning each query's final
    top _BEAM_TOPK. The query node itself is excluded from candidates
    (self is never a useful neighbor), matching every kNN operator
    here.

    Recall < 1 by construction (beam search inspects a graph
    neighborhood, not the corpus) and improves along the standard dials
    — entries, width, hops, and the graph's K — all corpus-independent
    constants; c03_graph_recall_eval MEASURES recall@_BEAM_TOPK at the
    shipped dials against the exact brute-force top-k (the graph twin
    of c03_ann_recall_eval). Cosines reuse the exact double pipeline of
    the graph build, so the oracle replays the identical walk
    bit-for-bit."""
    from iceberg_relative_io_spark.operators.northstar import _N_QUERIES

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull())
        .select("vec_id", "embedding", V.norm(F.col("embedding")).alias("nrm"))
    )
    graph = _graph_edges(spark, sf_dir)
    # the _N_QUERIES-row query frame broadcasts into EVERY score pass
    # (entry + one per hop) — lazily localCheckpoint it so the corpus
    # filter-scan behind it runs once, not once per pass (round 11)
    queries = (
        emb.filter(F.col("vec_id") < _N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qvec"),
            F.col("nrm").alias("qnrm"),
        )
        .localCheckpoint(eager=False)
    )
    ents = V.bounded_sample(emb, _BEAM_ENTRIES).select(
        F.col("vec_id").alias("node"),
        F.col("embedding").alias("nvec"),
    )
    dot_udf = V.make_dot_udf()

    def score(cand: DataFrame) -> DataFrame:
        """cos(query, node) for a tiny (query_id, node) frontier: the
        frontier broadcasts into one probe pass over the corpus."""
        cos = dot_udf(F.col("qvec"), F.col("embedding")) / (
            F.col("qnrm") * F.col("nrm")
        )
        scored = (
            emb.join(F.broadcast(cand), F.col("vec_id") == F.col("node"))
            .join(F.broadcast(queries), "query_id")
            .select("query_id", "node", cos.alias("cos_sim"))
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cos_sim").desc(), F.col("node")
        )
        return scored.withColumn("rnk", F.row_number().over(w))

    entry = score(
        queries.select("query_id")
        .crossJoin(F.broadcast(ents.select("node")))
        .filter(F.col("node") != F.col("query_id"))
    )
    # HNSW-style ef seed: every entry point is already scored in the
    # same pass, so keeping the top _BEAM_WIDTH as the initial beam is
    # free and strictly dominates seeding from rank 1 alone.
    #
    # Each hop's beam is localCheckpoint'ed (lazily — materialized by
    # the final action): the beam is O(queries x width) rows, but
    # WITHOUT the cut each hop's plan re-inlines the previous hop's
    # whole scoring subtree (the round-11 before-plan was a
    # 374-operator tree whose hop-1 pass appeared multiple times —
    # guide §3.3: materialize intermediates to truncate large plans).
    beam = (
        entry.filter(F.col("rnk") <= _BEAM_WIDTH)
        .select("query_id", "node")
        .localCheckpoint(eager=False)
    )
    ranked = None
    for _ in range(_BEAM_HOPS):
        nbrs = (
            F.broadcast(beam)
            .join(graph, F.col("node") == F.col("src"))
            .select("query_id", F.col("dst").alias("node"))
        )
        cand = (
            beam.unionByName(nbrs)
            .filter(F.col("node") != F.col("query_id"))
            .distinct()
        )
        ranked = score(cand)
        beam = (
            ranked.filter(F.col("rnk") <= _BEAM_WIDTH)
            .select("query_id", "node")
            .localCheckpoint(eager=False)
        )
    return ranked.filter(F.col("rnk") <= _BEAM_TOPK).select(
        "query_id", F.col("node").alias("vec_id"), "rnk", "cos_sim"
    )


def _beam_oracle() -> str:
    from iceberg_relative_io_spark.operators.northstar import (
        _IVF_FLOOR,
        _KNN_GRAPH_K,
        _N_QUERIES,
    )

    hops = []
    prev = "b0"
    for h in range(1, _BEAM_HOPS + 1):
        hops.append(
            f"""c{h} AS (
            SELECT DISTINCT qid, node FROM (
                SELECT qid, node FROM {prev}
                UNION ALL
                SELECT b.qid, g.dst AS node
                FROM {prev} b JOIN graph g ON g.src = b.node
            ) WHERE node <> qid
        ),
        bs{h} AS (
            SELECT qid, node, cos_sim,
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY cos_sim DESC, node) AS rn
            FROM (
                SELECT c.qid, c.node,
                       {V.cosine_sql('q.qv', 'e.embedding')} AS cos_sim
                FROM c{h} c
                JOIN qs q ON q.qid = c.qid
                JOIN embeddings e ON e.vec_id = c.node
            )
        ),
        b{h} AS (SELECT qid, node FROM bs{h} WHERE rn <= {_BEAM_WIDTH})"""
        )
        prev = f"b{h}"
    return f"""
        WITH {V.two_level_assign_ctes_sql(_IVF_FLOOR)},
        pairs AS (
            SELECT a.vec_id AS va, b.vec_id AS vb,
                   {V.cosine_sql('ea.embedding', 'eb.embedding')} AS cos_sim
            FROM assign a
            JOIN assign b ON a.cid = b.cid AND a.vec_id <> b.vec_id
            JOIN embeddings ea ON ea.vec_id = a.vec_id
            JOIN embeddings eb ON eb.vec_id = b.vec_id
        ),
        graph AS (
            SELECT va AS src, vb AS dst FROM (
                SELECT va, vb,
                       row_number() OVER (PARTITION BY va
                                          ORDER BY cos_sim DESC, vb) AS rnk
                FROM pairs
            ) WHERE rnk <= {_KNN_GRAPH_K}
        ),
        ents AS (
            {V.sample_cte_sql(_BEAM_ENTRIES, id_alias='eid', vec_alias='evec')}
        ),
        qs AS (
            SELECT vec_id AS qid, embedding AS qv FROM embeddings
            WHERE vec_id < {_N_QUERIES} AND embedding IS NOT NULL
        ),
        b0 AS (
            SELECT qid, node FROM (
                SELECT q.qid, e.eid AS node,
                       row_number() OVER (PARTITION BY q.qid
                                          ORDER BY {V.cosine_sql('q.qv', 'e.evec')} DESC,
                                                   e.eid) AS rn
                FROM qs q, ents e WHERE e.eid <> q.qid
            ) WHERE rn <= {_BEAM_WIDTH}
        ),
        {','.join(hops)}
        SELECT qid AS query_id, node AS vec_id, rn AS rnk, cos_sim
        FROM bs{_BEAM_HOPS} WHERE rn <= {_BEAM_TOPK}
    """


# ---------------------------------------------------------------------------
# C3 — graph-ANN recall evaluation (beam search vs exact)
# ---------------------------------------------------------------------------


def q_graph_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 (eval harness): recall@k of the graph-beam serving path
    against the brute-force exact top-k, per query — the exact mirror
    of c03_ann_recall_eval for the graph index, closing the round-10
    gap where c03_ann_graph_beam's recall at the shipped dials
    (_BEAM_ENTRIES=32, width 4, 2 hops over the K=8 graph) was
    unmeasured. Both sides truncate to the beam's _BEAM_TOPK so the
    metric is recall@3: |beam top-3 ∩ exact top-3| / 3. Integer counts
    plus one final division, so the oracle is exact (it replays the
    identical walk and the brute-force join).

    Measured at the shipped dials on the synthetic fixtures (round 11):
    mean recall@3 = 0.067 at sf0.01 — essentially the inspected
    fraction of the corpus (~50 of 500 nodes), because the fixture
    embeddings are isotropic random vectors with NO manifold/cluster
    structure for a navigable graph to exploit (planted near-dup twins
    are found; the rest of the exact top-3 is noise-ranked). This is
    the expected floor for graph-ANN on isotropic data, not a serving
    bug: recall rises along the dials exactly as the method predicts —
    (entries 128, width 16, hops 4) measures mean 0.667 on the same
    fixture with this seed (0.47 with the pre-round-11 rank-1 seed —
    the ef seed's gain compounds at larger dials) — and real embedding corpora have the low intrinsic
    dimension the walk shape exploits. The eval exists precisely so
    any dial change is measured, not asserted.

    At 100 TB the eval runs on the sampled query set both paths already
    use — cost is one index probe plus a k-row join per query,
    independent of corpus size; the kNN graph build amortizes across
    the session via _GRAPH_CACHE."""
    from iceberg_relative_io_spark.operators.northstar import q_knn_bruteforce

    exact = (
        q_knn_bruteforce(spark, sf_dir)
        .filter(F.col("rnk") <= _BEAM_TOPK)
        .select("query_id", "vec_id")
    )
    approx = q_ann_graph_beam(spark, sf_dir).select("query_id", "vec_id")
    # bounded sides (k rows per sampled query): broadcast explicitly,
    # matching roundthree._recall_frame (and like it, NOT checkpointed —
    # see the A/B note there)
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


def _graph_recall_oracle() -> str:
    from iceberg_relative_io_spark.operators.northstar import ORACLE as NS

    return f"""
        WITH exact AS (
            SELECT query_id, vec_id FROM ({NS['c03_knn_bruteforce']})
            WHERE rnk <= {_BEAM_TOPK}
        ),
        approx AS (
            SELECT query_id, vec_id FROM ({_beam_oracle()})
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


QUERIES = {
    "c04_bpe_pair_merges": q_bpe_pair_merges,
    "c04_bpe_encode": q_bpe_encode,
    "c03_ann_graph_beam": q_ann_graph_beam,
    "c03_graph_recall_eval": q_graph_recall_eval,
}

ORACLE = {
    "c04_bpe_pair_merges": _bpe_oracle(),
    "c04_bpe_encode": _bpe_encode_oracle(),
    "c03_ann_graph_beam": _beam_oracle(),
    "c03_graph_recall_eval": _graph_recall_oracle(),
}
