"""Round-10 operators: BPE merge rounds and graph-ANN beam search.

The DuckDB oracles check cross-engine equality; these tests check the
SEMANTICS independently — a pure-Python BPE trainer over the collected
fixture for c04_bpe_pair_merges, and structural search invariants
(reachability, ordering, improvement over the entry point) for
c03_ann_graph_beam.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from iceberg_relative_io_spark.operators import roundten
from iceberg_relative_io_spark.sources.tables import load_table


def _greedy_merge(syms: list[str], a: str, b: str) -> list[str]:
    """Textbook greedy BPE merge: scan left to right, merge (a, b) on
    sight, continue AFTER the merged token (non-overlapping) — the
    semantics of Sennrich's re.sub pattern and HuggingFace trainers."""
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _python_bpe(texts, rounds, topn):
    """Reference BPE pair-merge rounds: word-frequency table, weighted
    adjacent-pair counts, greedy merge of the winner."""
    wf = Counter()
    for t in texts:
        if t is None:
            continue
        for w in t.split(" "):
            wf[w] += 1
    seqs = {w: list(w) if w else [""] for w in wf}
    out = []
    for rnd in range(1, rounds + 1):
        pc = Counter()
        for w, cnt in wf.items():
            syms = seqs[w]
            for a, b in zip(syms, syms[1:]):
                pc[a + " " + b] += cnt
        ranked = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        out.extend(
            (rnd, i + 1, p, p.replace(" ", ""), c)
            for i, (p, c) in enumerate(ranked[:topn])
        )
        if rnd < rounds and ranked:
            a, b = ranked[0][0].split(" ")
            seqs = {w: _greedy_merge(s, a, b) for w, s in seqs.items()}
    return out


def test_bpe_matches_pure_python_trainer(spark, sf_dir):
    texts = [
        r[0]
        for r in load_table(spark, sf_dir, "documents")
        .select("text")
        .collect()
    ]
    want = _python_bpe(texts, roundten._BPE_ROUNDS, roundten._BPE_TOPN)
    got = sorted(
        tuple(r)
        for r in roundten.q_bpe_pair_merges(spark, sf_dir).collect()
    )
    assert got == sorted(want)
    # the round-1 winner was merged before round 2: its pair cannot
    # recur (every adjacency of it was consumed by the merge pass)
    r1_top = next(p for rnd, rnk, p, m, c in want if rnd == 1 and rnk == 1)
    r2_pairs = [p for rnd, rnk, p, m, c in want if rnd == 2]
    assert r1_top not in r2_pairs
    # and the merge changed the statistics: round 2's ranking is not
    # just round 1's with the winner removed
    r1_rest = [p for rnd, rnk, p, m, c in want if rnd == 1 and rnk > 1]
    assert r2_pairs != r1_rest


def test_bpe_word_freq_is_session_cached(spark, sf_dir):
    from iceberg_relative_io_spark import caches

    caches.release_session_caches(spark)
    roundten.q_bpe_pair_merges(spark, sf_dir).count()
    key = (caches.session_key(spark), sf_dir)
    assert key in roundten._WF_CACHE
    wf1 = roundten._WF_CACHE[key]
    roundten.q_bpe_pair_merges(spark, sf_dir).count()
    assert roundten._WF_CACHE[key] is wf1  # one corpus pass per session
    caches.release_session_caches(spark)
    assert not roundten._WF_CACHE


def test_beam_search_invariants(spark, sf_dir):
    from iceberg_relative_io_spark.functions import vectors as V
    from iceberg_relative_io_spark.operators import northstar

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull())
        .select("vec_id", "embedding")
    )
    res = roundten.q_ann_graph_beam(spark, sf_dir).collect()
    assert res, "beam search returned nothing"
    by_q: dict[int, list] = {}
    for r in res:
        assert r.vec_id != r.query_id
        by_q.setdefault(r.query_id, []).append(r)
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= roundten._BEAM_TOPK
        coss = [r.cos_sim for r in rows]
        assert coss == sorted(coss, reverse=True)

    # reachability: every returned node is an entry point or some graph
    # node's out-neighbor (a necessary condition of any graph walk)
    entries = {
        r.vec_id
        for r in V.bounded_sample(emb, roundten._BEAM_ENTRIES).collect()
    }
    dsts = {
        r.nbr_id for r in northstar.q_knn_graph(spark, sf_dir).collect()
    }
    for r in res:
        assert r.vec_id in entries or r.vec_id in dsts, r

    # the walk never ends below its start: each query's best result is
    # at least as similar as its chosen entry point
    import math

    emb_map = {r.vec_id: r.embedding for r in emb.collect()}

    def cos(a, b):
        num = 0.0
        for x, y in zip(a, b):
            num += float(x) * float(y)
        na = math.sqrt(sum(float(x) * float(x) for x in a))
        nb = math.sqrt(sum(float(y) * float(y) for y in b))
        return num / (na * nb)

    for q, rows in by_q.items():
        qv = emb_map[q]
        entry_best = max(
            (cos(qv, emb_map[e]) for e in entries if e != q),
        )
        # tolerance: the test's cos uses a different summation order
        assert rows[0].cos_sim >= entry_best - 1e-6, (q, rows[0], entry_best)


def test_beam_is_deterministic(spark, sf_dir):
    a = sorted(
        tuple(r) for r in roundten.q_ann_graph_beam(spark, sf_dir).collect()
    )
    b = sorted(
        tuple(r) for r in roundten.q_ann_graph_beam(spark, sf_dir).collect()
    )
    assert a == b


def test_bpe_encode_matches_pure_python_encoder(spark, sf_dir):
    """Subword counts after applying the trained merges, checked against
    a pure-Python replay of the same greedy trainer+encoder."""
    texts = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }
    wf = Counter()
    for t in texts.values():
        if t is None:
            continue
        for w in t.split(" "):
            wf[w] += 1
    seqs = {w: list(w) if w else [""] for w in wf}
    for _ in range(roundten._BPE_ROUNDS):
        pc = Counter()
        for w, cnt in wf.items():
            syms = seqs[w]
            for a, b in zip(syms, syms[1:]):
                pc[a + " " + b] += cnt
        if not pc:
            break
        a, b = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0].split(" ")
        seqs = {w: _greedy_merge(s, a, b) for w, s in seqs.items()}
    nsub = {w: len(s) for w, s in seqs.items()}
    want = {}
    for d, t in texts.items():
        if t is None:
            continue
        words = t.split(" ")
        want[d] = (len(words), sum(nsub[w] for w in words))
    got = {
        r.doc_id: (r.n_words, r.n_subwords)
        for r in roundten.q_bpe_encode(spark, sf_dir).collect()
    }
    assert got == want
    # merges compress: subwords never exceed characters, and at least
    # one document actually got shorter than its character count
    for d, (nw, ns) in got.items():
        assert ns <= len(texts[d].replace(" ", "")), d
    assert any(
        ns < len(texts[d].replace(" ", "")) for d, (nw, ns) in got.items()
    )


def test_bpe_plan_shapes(spark, sf_dir):
    """BPE stays JVM-side and distributed: no Python UDFs anywhere, the
    pair count partial-aggregates before its exchange, and the merge
    application is a broadcast of the 1-row winner — never a shuffle of
    the word table against it."""
    from iceberg_relative_io_spark import caches

    caches.release_session_caches(spark)
    plan = (
        roundten.q_bpe_pair_merges(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "partial_sum" in plan  # map-side combine on the pair count
    assert "BroadcastExchange" in plan  # the 1-row winner broadcasts
    assert "SortMergeJoin" not in plan
    caches.release_session_caches(spark)


def test_bpe_encode_plan_broadcasts_vocab(spark, sf_dir):
    """Encoding is one pass of the token stream through a broadcast
    join against the vocabulary-sized subword-count table — a shuffle
    join THERE would move the corpus to meet the vocabulary. (The merge
    machinery's internal joins are all vocab-vs-vocab on (word, i) —
    Catalyst may pick any strategy for those; what must never shuffle
    is the corpus stream.) The broadcast is explicit in the code, so it
    survives regardless of stats; pin that the corpus-side scan feeds a
    BroadcastHashJoin probe."""
    plan = (
        roundten.q_bpe_encode(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    # the corpus join's key is word ALONE (the merge machinery's
    # internal joins all carry the extra position key): a single-key
    # word SortMergeJoin would be the corpus stream being shuffled
    import re

    bad = [
        ln
        for ln in plan.splitlines()
        if re.search(r"SortMergeJoin.*\[word#\d+\], \[word#\d+\]", ln)
    ]
    assert not bad, bad


def test_beam_plan_broadcasts_frontier(spark, sf_dir):
    """Every hop probes the edge/embedding tables with the tiny frontier
    as the broadcast side — a sort-merge join would sort the corpus per
    hop; a cartesian product must never appear."""
    plan = (
        roundten.q_ann_graph_beam(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# property test: the oracle's windowed merge IS textbook greedy BPE
# ---------------------------------------------------------------------------
#
# History: the first implementation applied merges as a literal replace
# of ' a b ' with ' ab ' on the space-padded symbol string. A hypothesis
# property test against the textbook scan falsified it on 'aaaa' with
# pair (a, a) — replace consumes the shared separator, so back-to-back
# occurrences don't all merge in one pass, while every real trainer
# (Sennrich's zero-width re.sub, HuggingFace) merges all non-overlapping
# occurrences. Engine, oracle, and the then-reference all used replace,
# so the cross-engine gate could never catch it. Both now implement the
# windowed greedy selection; this property pins the ORACLE side (the
# engine side is pinned corpus-wide by test_bpe_matches_pure_python_*).

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=120, deadline=None)
@given(
    word=st.text(alphabet="ab", min_size=2, max_size=14),
    pair=st.tuples(
        st.sampled_from(["a", "b", "ab", "ba"]),
        st.sampled_from(["a", "b", "ab", "ba"]),
    ),
)
def test_oracle_windowed_merge_is_greedy_bpe(word, pair):
    import duckdb

    a, b = pair
    syms = list(word)
    seq = " ".join(syms)
    # exactly the oracle's t/k/w chain, on a one-word table with the
    # winning pair injected
    sql = f"""
        WITH w1 AS (SELECT 'w' AS word, 1 AS cnt, ? AS seq),
        m1 AS (SELECT ? AS a, ? AS b),
        t1 AS (
            SELECT word, cnt, i, syms[i] AS sym, syms[i + 1] AS nxt
            FROM (SELECT word, cnt, string_split(seq, ' ') AS syms FROM w1),
                 UNNEST(generate_series(1, len(syms))) AS g(i)
        ),
        k1 AS (
            SELECT word, i FROM (
                SELECT word, i,
                       row_number() OVER (PARTITION BY word, i - rn
                                          ORDER BY i) AS pr
                FROM (SELECT word, i,
                             row_number() OVER (PARTITION BY word
                                                ORDER BY i) AS rn
                      FROM t1
                      WHERE sym = (SELECT a FROM m1)
                        AND nxt = (SELECT b FROM m1))
            ) WHERE pr % 2 = 1
        )
        SELECT string_agg(CASE WHEN k.i IS NOT NULL THEN t.sym || t.nxt
                               ELSE t.sym END, ' ' ORDER BY t.i)
        FROM t1 t
        LEFT JOIN k1 k  ON k.word = t.word AND k.i = t.i
        LEFT JOIN k1 kp ON kp.word = t.word AND kp.i = t.i - 1
        WHERE kp.i IS NULL
        GROUP BY t.word
    """
    got = duckdb.connect().execute(sql, [seq, a, b]).fetchone()[0]
    assert got.split(" ") == _greedy_merge(syms, a, b), (word, pair)


def test_graph_recall_eval_invariants(spark, sf_dir):
    """c03_graph_recall_eval (round 11): one row per query, the exact
    side pinned at _BEAM_TOPK rows, hits bounded by both sides, and
    recall == n_hit / n_exact exactly (integer division re-derived)."""
    from iceberg_relative_io_spark.operators import northstar

    rows = roundten.q_graph_recall_eval(spark, sf_dir).collect()
    assert len(rows) == northstar._N_QUERIES
    for r in rows:
        assert r.n_exact == roundten._BEAM_TOPK
        assert 0 <= r.n_hit <= r.n_exact
        assert r.recall == r.n_hit / r.n_exact
    # cross-check hits against materialized sets (the eval's join logic)
    exact = {
        (x.query_id, x.vec_id)
        for x in northstar.q_knn_bruteforce(spark, sf_dir)
        .filter("rnk <= %d" % roundten._BEAM_TOPK)
        .collect()
    }
    beam = {
        (x.query_id, x.vec_id)
        for x in roundten.q_ann_graph_beam(spark, sf_dir).collect()
    }
    want = {}
    for q, v in exact & beam:
        want[q] = want.get(q, 0) + 1
    assert {r.query_id: r.n_hit for r in rows if r.n_hit} == want


# ---------------------------------------------------------------------------
# property test: MULTI-ROUND oracle chain == pure-Python trainer (round 11)
# ---------------------------------------------------------------------------
#
# The single-merge property above pins one application; tie-breaks and
# run-parity INTERACT across rounds (a round-1 merge changes which runs
# exist for round 2, and the (cnt DESC, pair ASC) tie-break decides
# different winners once counts collide), so round 11 extends the pin to
# a 4-round chain: random tiny corpora -> the oracle's full CTE chain
# (_bpe_ctes, exactly what c04_bpe_pair_merges' driver oracle runs, at
# rounds=4 > the shipped _BPE_ROUNDS=2) vs the textbook trainer.


@settings(max_examples=60, deadline=None)
@given(
    docs=st.lists(
        st.lists(
            st.text(alphabet="abc", min_size=0, max_size=8),
            min_size=1,
            max_size=6,
        ).map(" ".join),
        min_size=1,
        max_size=4,
    )
)
def test_oracle_multiround_chain_matches_python_trainer(docs):
    import duckdb

    rounds, topn = 4, 3
    rounds_sql = [
        f"""SELECT {rnd} AS round, rnk, pair,
               replace(pair, ' ', '') AS merged, cnt
        FROM (SELECT pair, cnt,
                     row_number() OVER (ORDER BY cnt DESC, pair) AS rnk
              FROM p{rnd})
        WHERE rnk <= {topn}"""
        for rnd in range(1, rounds + 1)
    ]
    # MATERIALIZED changes only DuckDB's evaluation strategy (the plain
    # chain re-inlines every CTE per reference — ~3.4s/example at 4
    # rounds vs 0.12s materialized); the CTE TEXT under test stays
    # byte-identical to what the driver oracle runs.
    import re as _re

    ctes = [
        _re.sub(r"^(\s*\w+ AS) \(", r"\1 MATERIALIZED (", c, count=1)
        for c in roundten._bpe_ctes(rounds)
    ]
    sql = "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(rounds_sql)
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?)", [(d,) for d in docs])
    got = sorted(tuple(r) for r in con.execute(sql).fetchall())
    want = sorted(_python_bpe(docs, rounds, topn))
    assert got == want, (docs, got, want)


def test_engine_fold_merge_is_greedy_bpe(spark):
    """Round-11: _apply_merge became a map-only F.aggregate fold (the
    windowed relational form shuffled the vocab table ~6x per round).
    Pin the fold against the textbook greedy scan EXHAUSTIVELY: every
    word over {a, b} of length 2..6 crossed with every (a, b) pair over
    {a, b, ab, ba} — this covers every run-parity and multi-char-symbol
    interaction up to that depth (including the 'aaaa' case that
    falsified the round-10 padded replace)."""
    from itertools import product

    words = [
        "".join(w)
        for n in range(2, 7)
        for w in product("ab", repeat=n)
    ]
    wdf = spark.createDataFrame(
        [(w, 1, " ".join(w)) for w in words], "word string, cnt long, seq string"
    )
    for a, b in product(["a", "b", "ab", "ba"], repeat=2):
        top1 = spark.createDataFrame([(a, b)], "top_a string, top_b string")
        got = {
            r.word: r.seq
            for r in roundten._apply_merge(wdf, top1).collect()
        }
        for w in words:
            want = " ".join(_greedy_merge(list(w), a, b))
            assert got[w] == want, (w, a, b, got[w], want)
    # NULL winner (empty pair table): the merge must be a no-op
    top_null = spark.createDataFrame(
        [(None, None)], "top_a string, top_b string"
    )
    got = {r.word: r.seq for r in roundten._apply_merge(wdf, top_null).collect()}
    assert got == {w: " ".join(w) for w in words}
