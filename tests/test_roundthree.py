"""Round-3 operator tests: invariants the oracle can't express, plus the
scale-shape guarantees (bounded driver collects, no global sort in the
shard shuffle)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_relative_io_spark.operators import roundthree as R
from iceberg_relative_io_spark.sources.tables import load_table


@pytest.mark.parametrize("name", sorted(R.QUERIES))
def test_roundthree_query_runs(spark, sf_dir, name):
    df = R.QUERIES[name](spark, sf_dir)
    assert df.count() >= 0


def test_semantic_dedup_covers_corpus_and_keeps_cell_minimum(spark, sf_dir):
    """Every vector gets exactly one keep/drop decision, and the
    lowest-id member of each cell is always kept (it has no lower-id
    neighbour to defer to)."""
    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    out = R.q_semantic_dedup(spark, sf_dir)
    assert out.count() == n_vecs
    rows = out.collect()
    lowest = {}
    for r in rows:
        if r.cell not in lowest or r.vec_id < lowest[r.cell]:
            lowest[r.cell] = r.vec_id
    kept = {(r.cell, r.vec_id) for r in rows if r.kept == 1}
    for cell, vid in lowest.items():
        assert (cell, vid) in kept
    # the fixture's embedding space has near-dups above tau — the op
    # must actually drop something, not degenerate to keep-all
    assert any(r.kept == 0 for r in rows)


def test_semantic_dedup_centroid_collect_is_bounded(spark, sf_dir, monkeypatch):
    """The only driver collect is the centroid sample — exactly the
    corpus-derived n_cells = max(32, ceil(N/256)) rows (the SemDeDup
    scale contract: the collect grows as N/256, never as N)."""
    from iceberg_relative_io_spark.functions import vectors as V

    seen = []
    real = V.collect_centroids

    def spy(emb, k):
        out = real(emb, k)
        seen.append(len(out[0]))
        return out

    monkeypatch.setattr(V, "collect_centroids", spy)
    monkeypatch.setattr(
        "iceberg_relative_io_spark.operators.roundthree.V.collect_centroids", spy
    )
    from iceberg_relative_io_spark import caches
    from iceberg_relative_io_spark.sources.tables import load_table as _lt0

    # start cold: the round-11 session cache would otherwise satisfy the
    # centroid broadcast without any collect at all
    caches.release_session_caches(spark)
    n_corpus = _lt0(spark, sf_dir, "embeddings").count()
    R.q_semantic_dedup(spark, sf_dir).count()
    assert seen == [V.derived_cells(n_corpus, R._SEM_TARGET_CELL)]
    # the scale knob: n_cells drives the (bounded) collect directly, and
    # the finer blocking still covers the whole corpus one row per vector
    seen.clear()
    caches.release_session_caches(spark)
    n = R.q_semantic_dedup(spark, sf_dir, n_cells=64).count()
    assert seen == [64]
    from iceberg_relative_io_spark.sources.tables import load_table as _lt

    assert n == _lt(spark, sf_dir, "embeddings").count()


def test_bm25_scores_positive_and_ranked(spark, sf_dir):
    rows = R.q_bm25_search(spark, sf_dir).collect()
    assert 0 < len(rows) <= R._BM25_TOPN
    scores = [r.score for r in sorted(rows, key=lambda r: r.rnk)]
    assert all(s > 0 for s in scores)
    assert scores == sorted(scores, reverse=True)
    # disjunctive retrieval: every hit matched at least one query term
    assert all(1 <= r.n_terms <= len(R._BM25_TERMS) for r in rows)


def test_bigram_logprob_is_nonpositive_and_total(spark, sf_dir):
    """MLE bigram probabilities are <= 1, so every document's log-prob
    is <= 0; every document appears exactly once (including any too
    short to have bigrams)."""
    docs = load_table(spark, sf_dir, "documents")
    out = R.q_bigram_logprob(spark, sf_dir)
    assert out.count() == docs.count()
    assert out.filter(F.col("logprob") > 1e-12).count() == 0
    assert out.filter((F.col("n_bigrams") == 0) & (F.col("logprob") != 0.0)).count() == 0


def test_shard_shuffle_is_a_permutation_with_dense_positions(spark, sf_dir):
    """Shards partition the corpus; positions within a shard are dense
    1..n; the assignment is deterministic across runs."""
    out1 = R.q_shard_shuffle(spark, sf_dir).collect()
    out2 = R.q_shard_shuffle(spark, sf_dir).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(out1) == n_docs
    by_shard = {}
    for r in out1:
        by_shard.setdefault(r.shard, []).append(r.shard_pos)
    assert set(by_shard) <= set(range(R._N_SHARDS))
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))


def test_shard_shuffle_plan_has_no_global_sort(spark, sf_dir):
    """The shuffle is hash-partition + within-partition sort: the plan
    must contain a partial (non-global) Sort and no single-partition
    global Exchange for ordering."""
    plan = R.q_shard_shuffle(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan.lower()


def test_bm25_plan_is_topk_not_global_sort(spark, sf_dir):
    """The top-n must compile to TakeOrderedAndProject (no global sort
    materializes the full hit list) and every join must broadcast — a
    sort-merge join on the tiny df/stats sides would mean a misplanned
    shuffle."""
    plan = R.q_bm25_search(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan


def test_semantic_dedup_plan_has_single_exchange(spark, sf_dir):
    """Blocked semantic dedup costs exactly one shuffle: the hash
    partition on the cell id feeding applyInPandas. Anything more means
    the assignment or the output sprouted an extra exchange."""
    plan = R.q_semantic_dedup(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_ann_recall_bounds(spark, sf_dir):
    """recall in [0, 1] per query; n_hit <= n_exact; every evaluated
    query comes from the shared _N_QUERIES sample."""
    from iceberg_relative_io_spark.operators import northstar as N

    rows = R.q_ann_recall_eval(spark, sf_dir).collect()
    assert len(rows) == N._N_QUERIES
    for r in rows:
        assert 0 <= r.n_hit <= r.n_exact
        assert abs(r.recall - r.n_hit / r.n_exact) < 1e-15


def test_label_propagation_empty_edge_set_converges(spark):
    """An empty edge set (legitimate: a corpus with no near-dup pairs
    above the jaccard threshold) must converge immediately to an empty
    labels frame — NOT burn _CC_MAX_ITERS rounds on a NULL label sum
    and raise (the round-11 prev_sum=None regression)."""
    from iceberg_relative_io_spark.operators import graph as G

    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    labels = G.label_propagation_components(empty)
    assert labels.count() == 0
    assert G.LAST_LP_STATS["rounds"] == 1


def test_connected_components_matches_driver_union_find(spark, sf_dir):
    """The distributed hash-min iteration must produce the exact same
    component assignment as the driver-side union-find operator — same
    graph, two execution strategies."""
    from iceberg_relative_io_spark.operators import northstar as N

    want = {(r.doc_id, r.component, r.survivor)
            for r in N.q_dedup_survivors(spark, sf_dir).collect()}
    got = {(r.doc_id, r.component, r.survivor)
           for r in R.q_connected_components(spark, sf_dir).collect()}
    assert got == want


def test_substring_removal_only_rewrites_covered_tokens(spark, sf_dir):
    """Every document keeps its row; n_removed is consistent with the
    reassembled text's token count; documents shorter than the gram
    width are untouched; and the fixture's shared vocabulary actually
    triggers removals (the op is not a no-op)."""
    docs = {r.doc_id: r.text
            for r in load_table(spark, sf_dir, "documents").collect()}
    rows = R.q_substring_removal(spark, sf_dir).collect()
    assert len(rows) == len(docs)
    total_removed = 0
    for r in rows:
        n_clean = len(r.cleaned_text.split(" ")) if r.cleaned_text else 0
        assert r.n_tokens - r.n_removed == n_clean
        total_removed += r.n_removed
        orig = docs[r.doc_id].split(" ")
        assert r.n_tokens == len(orig)
        if len(orig) < R._RM_K:
            assert r.n_removed == 0 and r.cleaned_text == docs[r.doc_id]
        # surviving tokens are a subsequence of the original
        it = iter(orig)
        assert all(tok in it for tok in (r.cleaned_text.split(" ") if r.cleaned_text else []))
    assert total_removed > 0


def test_bloom_contamination_has_no_false_negatives(spark, sf_dir):
    """A bloom filter can only over-flag: per language, the bloom audit's
    contaminated-doc count must be >= the exact semi-join audit's count,
    and every test-split doc appears exactly once."""
    from iceberg_relative_io_spark.operators import pipeline_ext as P

    exact = {r.lang: r.n_contaminated
             for r in P.q_contamination_check(spark, sf_dir).collect()}
    rows = R.q_contamination_bloom(spark, sf_dir).collect()
    n_test = sum(r.n_test_docs for r in P.q_contamination_check(spark, sf_dir).collect())
    assert len(rows) == n_test
    bloom = {}
    for r in rows:
        bloom[r.lang] = bloom.get(r.lang, 0) + r.contaminated
        assert 0 <= r.n_flagged <= r.n_grams
    for lang, n_exact in exact.items():
        assert bloom.get(lang, 0) >= n_exact


def test_containment_dominates_jaccard_on_shared_pairs(spark, sf_dir):
    """Containment >= Jaccard for every pair (I/min >= I/union), so every
    LSH candidate above the Jaccard threshold must reappear in the
    containment output when the thresholds coincide; scores bound in
    (0, 1]."""
    from iceberg_relative_io_spark.operators import northstar as N

    jacc = {(r.doc_a, r.doc_b): r.jaccard
            for r in N.q_lsh_candidate_pairs(spark, sf_dir).collect()}
    rows = R.q_doc_containment(spark, sf_dir).collect()
    cont = {(r.doc_a, r.doc_b): r.containment for r in rows}
    assert rows, "fixture should produce containment pairs"
    for r in rows:
        assert 0 < r.containment <= 1.0 + 1e-15
        assert r.n_inter <= min(r.n_a, r.n_b)
        j = jacc.get((r.doc_a, r.doc_b))
        if j is not None:
            assert r.containment >= j - 1e-12
    for pair, j in jacc.items():
        if j >= R._CONTAIN_T:
            assert pair in cont


def test_dataset_card_totals_match_corpus(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    rows = R.q_dataset_card(spark, sf_dir).collect()
    assert sum(r.n_docs for r in rows) == docs.count()
    total_tok = docs.select(F.sum(F.size(F.split("text", " ")))).collect()[0][0]
    assert sum(r.total_tokens for r in rows) == total_tok
    for r in rows:
        assert 0 <= r.n_dup_docs <= r.n_docs
        assert 0 <= r.n_short_docs <= r.n_docs


def test_resize_pipeline_is_map_only_and_truncates(spark, sf_dir):
    """The resize stage must stay shuffle-free (pure mapInPandas over the
    scan) and cap every payload at the target size."""
    df = R.q_resize_pipeline(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    rows = df.collect()
    assert all(r.n_bytes <= R._RESIZE_BYTES for r in rows)
    assert all(len(r.payload_hex) == 2 * r.n_bytes for r in rows)


def test_mixture_weights_sum_to_one_and_respect_temperature(spark, sf_dir):
    rows = R.q_mixture_weights(spark, sf_dir).collect()
    assert abs(sum(r.weight for r in rows) - 1.0) < 1e-9
    # alpha < 1 compresses the range: the weight ratio between the
    # largest and smallest source is strictly smaller than the count
    # ratio (the point of temperature mixing)
    big = max(rows, key=lambda r: r.n_docs)
    small = min(rows, key=lambda r: r.n_docs)
    if big.n_docs > small.n_docs:
        assert big.weight / small.weight < big.n_docs / small.n_docs
    assert all(r.quota_docs <= R._MIX_BUDGET for r in rows)


def test_ivfpq_centroid_collects_bounded_and_plan_broadcasts(
    spark, sf_dir, monkeypatch
):
    """IVF+PQ: the only driver collects are the two bounded centroid
    samples (nlist coarse + ncent sub-codebook) and the tiny query
    batch; the candidate join broadcasts probes, never sort-merges."""
    from iceberg_relative_io_spark.functions import vectors as V
    from iceberg_relative_io_spark.operators.northstar import _IVF_FLOOR
    from iceberg_relative_io_spark.operators.pipeline_ext import _PQ_NCENT
    from iceberg_relative_io_spark.sources.tables import load_table as _lt0

    nlist = V.derived_sqrt(_lt0(spark, sf_dir, "embeddings").count(), _IVF_FLOOR)

    seen = []
    real = V.collect_centroids

    def spy(emb, k):
        out = real(emb, k)
        seen.append(len(out[0]))
        return out

    monkeypatch.setattr(V, "collect_centroids", spy)
    monkeypatch.setattr(
        "iceberg_relative_io_spark.operators.roundthree.V.collect_centroids", spy
    )
    from iceberg_relative_io_spark import caches

    # start cold (round-11 session cache), and assert per DISTINCT k:
    # when nlist == _PQ_NCENT the coarse cells and the sub-codebook are
    # the same bounded sample, so the cache correctly collects it once
    caches.release_session_caches(spark)
    df = R.q_ann_ivfpq(spark, sf_dir)
    assert sorted(seen) == sorted(set([nlist, _PQ_NCENT]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_ivfpq_scores_are_adc_distances(spark, sf_dir):
    """Each returned approx_dist must equal the ADC reconstruction:
    sum over subspaces of ||q_sub - codebook[code_s]||^2 — recomputed
    here independently from the PQ codes and raw vectors."""
    import numpy as np

    from iceberg_relative_io_spark.functions import vectors as V
    from iceberg_relative_io_spark.operators.pipeline_ext import (
        _PQ_NCENT,
        _PQ_SUB,
        q_pq_codes,
    )
    from iceberg_relative_io_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb.collect()}
    codes = {}
    for r in q_pq_codes(spark, sf_dir).collect():
        codes.setdefault(r.vec_id, {})[r.subspace] = r.code
    dim_per = len(next(iter(vecs.values()))) // _PQ_SUB
    rows = R.q_ann_ivfpq(spark, sf_dir).collect()
    assert rows
    for r in rows[:20]:
        q = vecs[r.query_id]
        tot = 0.0
        for s in range(_PQ_SUB):
            c = vecs[codes[r.vec_id][s]]
            d = 0.0
            for j in range(dim_per):
                diff = q[s * dim_per + j] - c[s * dim_per + j]
                d = d + diff * diff
            tot = tot + d
        assert r.approx_dist == tot


def test_derived_knobs_match_sql_mirror_and_grow_with_corpus():
    """THE round-4 scale fix: the blocked-operator granularity knobs
    (SemDeDup n_cells, IVF nlist) derive from the corpus size, and the
    Python derivation is bit-identical to the DuckDB scalar-subquery
    mirror the oracles embed — checked across five decades of N,
    including the floor region and the exact-square sqrt boundary."""
    import duckdb

    from iceberg_relative_io_spark.functions import vectors as V

    con = duckdb.connect()
    for n in (1, 31, 32, 500, 2000, 8192, 8193, 1_000_000, 10_000_001,
              1024 * 1024, 123_456_789):
        con.execute("CREATE OR REPLACE VIEW embeddings AS "
                    f"SELECT * FROM range({n})")
        sql_cells = con.execute(
            f"SELECT {V.derived_cells_sql(256)}").fetchone()[0]
        sql_sqrt = con.execute(
            f"SELECT {V.derived_sqrt_sql()}").fetchone()[0]
        assert V.derived_cells(n, 256) == sql_cells, n
        assert V.derived_sqrt(n) == sql_sqrt, n
    # growth shape: cells ~ N/256 (constant cell size), nlist ~ sqrt(N)
    assert V.derived_cells(10 * 8192, 256) == 10 * V.derived_cells(8192, 256)
    assert V.derived_sqrt(100 * 10_000) == 10 * V.derived_sqrt(10_000)
    # floor region: small corpora keep the fixture-friendly default
    assert V.derived_cells(500, 256) == 32
    assert V.derived_sqrt(500) == 32


def test_survivorship_edge_collect_is_guarded(spark, sf_dir, monkeypatch):
    """Round-4 verdict item: q_dedup_survivors must never collect an
    unguarded edge list. Forcing the guard to 0 routes the SAME query
    through the distributed label-propagation path, and the output is
    identical to the union-find shortcut it replaces."""
    from iceberg_relative_io_spark.operators import graph, northstar as N

    want = {(r.doc_id, r.component, r.survivor)
            for r in N.q_dedup_survivors(spark, sf_dir).collect()}

    called = {"uf": 0, "lp": 0}
    real_uf, real_lp = graph.union_find_components, graph.label_propagation_components

    def spy_uf(spark_, pairs):
        called["uf"] += 1
        return real_uf(spark_, pairs)

    def spy_lp(pairs):
        called["lp"] += 1
        return real_lp(pairs)

    monkeypatch.setattr(graph, "union_find_components", spy_uf)
    monkeypatch.setattr(graph, "label_propagation_components", spy_lp)

    # fixture edge set is tiny -> the counted guard admits union-find
    got = {(r.doc_id, r.component, r.survivor)
           for r in N.q_dedup_survivors(spark, sf_dir).collect()}
    assert got == want and called == {"uf": 1, "lp": 0}

    # shrink the guard to zero -> the distributed path runs instead,
    # same answer, and union-find (the only collector) never fires
    monkeypatch.setattr(graph, "UF_MAX_EDGES", 0)
    got_lp = {(r.doc_id, r.component, r.survivor)
              for r in N.q_dedup_survivors(spark, sf_dir).collect()}
    assert got_lp == want and called == {"uf": 1, "lp": 1}


def test_contamination_fuzzy_semantics(spark, sf_dir):
    """c06_contamination_fuzzy: one verdict row per test-split doc; every
    flagged doc's match is a TRAIN-split doc with Jaccard >= tau; and the
    content-hash split itself guarantees no cross-split EXACT duplicate
    (identical text -> identical fingerprint -> same bucket), so fuzzy
    hits are genuinely near-dups, never exact copies."""
    from iceberg_relative_io_spark.functions import text as T
    from iceberg_relative_io_spark.operators import pipeline_ext as P
    from iceberg_relative_io_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    rows = P.q_contamination_fuzzy(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", (T.fingerprint(F.col("text")) % 100).alias("bucket")
    ).collect()
    bucket = {r.doc_id: r.bucket for r in docs}
    text = {r.doc_id: r.text for r in docs}
    test_ids = {d for d, b in bucket.items() if b >= 90}
    assert {r.doc_id for r in rows} == test_ids  # exactly one row each
    for r in rows:
        if r.is_contaminated:
            assert r.max_jaccard >= P._FUZZY_TAU
            assert bucket[r.best_train_match] < 80  # train-side match
            # near-dup, not an exact copy (split leakage-safety)
            assert text[r.best_train_match] != text[r.doc_id]
        else:
            assert (r.n_train_matches, r.best_train_match) == (0, -1)


def test_contamination_fuzzy_probe_broadcasts(spark, sf_dir):
    """The 100 TB shape claim of c06_contamination_fuzzy, plan-pinned:
    the eval split is tiny next to the corpus, so EVERY join in the
    probe (band match, jaccard verify, verdict attach) must broadcast
    the test side — no sort-merge join, no cartesian product. A plan
    regression here turns the map-only probe into a corpus shuffle."""
    from iceberg_relative_io_spark.operators import pipeline_ext as P

    plan = (
        P.q_contamination_fuzzy(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_ivf_recall_bounds_and_hits(spark, sf_dir):
    """c03_ivf_recall_eval (round 11): same bounds contract as the LSH
    eval, plus the hit counts re-derived from the two materialized
    top-k sets (the eval's semi-join logic, independently)."""
    from iceberg_relative_io_spark.operators import northstar as N

    rows = R.q_ivf_recall_eval(spark, sf_dir).collect()
    assert len(rows) == N._N_QUERIES
    for r in rows:
        assert r.n_exact == N._TOP_K
        assert 0 <= r.n_hit <= r.n_exact
        assert abs(r.recall - r.n_hit / r.n_exact) < 1e-15
    exact = {
        (x.query_id, x.vec_id)
        for x in N.q_knn_bruteforce(spark, sf_dir).collect()
    }
    approx = {
        (x.query_id, x.vec_id) for x in N.q_ann_ivf(spark, sf_dir).collect()
    }
    want = {}
    for q, v in exact & approx:
        want[q] = want.get(q, 0) + 1
    assert {r.query_id: r.n_hit for r in rows if r.n_hit} == want


def test_pq_and_rerank_recall_bounds(spark, sf_dir):
    """Round-11 completion of the recall-eval family: IVF-PQ and rerank
    evals obey the same bounds contract, and the ordering the methods
    predict holds on the fixture — IVF-PQ (probe loss + quantization
    loss) recalls no better than plain IVF (probe loss only), and the
    exact-rerank path recalls at least as well as every quantized
    path."""
    from iceberg_relative_io_spark.operators import northstar as N
    from iceberg_relative_io_spark.operators import retrieval_ext as RX

    def mean_recall(rows):
        for r in rows:
            assert r.n_exact == N._TOP_K
            assert 0 <= r.n_hit <= r.n_exact
            assert abs(r.recall - r.n_hit / r.n_exact) < 1e-15
        return sum(r.recall for r in rows) / len(rows)

    pq = mean_recall(R.q_pq_recall_eval(spark, sf_dir).collect())
    ivf = mean_recall(R.q_ivf_recall_eval(spark, sf_dir).collect())
    rr = mean_recall(RX.q_rerank_recall_eval(spark, sf_dir).collect())
    assert pq <= ivf + 1e-12, (pq, ivf)
    assert rr >= max(pq, ivf) - 1e-12, (rr, pq, ivf)
