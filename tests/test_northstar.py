"""North-star operator tests: invariants the oracle can't express, plus
the multimodal mapInPandas plumbing with an injected fake codec."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_relative_io_spark.functions import multimodal as M
from iceberg_relative_io_spark.functions import text as T
from iceberg_relative_io_spark.operators import northstar as N
from iceberg_relative_io_spark.sources.tables import load_table


@pytest.mark.parametrize("name", sorted(N.QUERIES))
def test_northstar_query_runs(spark, sf_dir, name):
    df = N.QUERIES[name](spark, sf_dir)
    assert df.count() >= 0


def test_minhash_contains_jaccard_signal(spark, sf_dir):
    """A doc must be its own perfect match: identical shingle sets give
    identical minhash signatures and land in the same LSH bands."""
    docs = load_table(spark, sf_dir, "documents").limit(20)
    codes = T.token_codes(F.col("text"))
    sh = docs.select("doc_id", T.shingle_codes(codes).alias("s"))
    mins = [T.minhash(F.col("s"), j).alias(f"m{j}") for j in range(T.NUM_HASHES)]
    a = sh.select("doc_id", *mins)
    b = sh.select(F.col("doc_id").alias("doc_id2"), *[m.alias(f"n{j}") for j, m in enumerate(mins)])
    joined = a.join(b, a.doc_id == b.doc_id2)
    for j in range(T.NUM_HASHES):
        assert joined.filter(F.col(f"m{j}") != F.col(f"n{j}")).count() == 0


def test_knn_is_superset_of_ann(spark, sf_dir):
    """ANN candidates come from bucket pruning, so every (query, neighbor)
    the ANN returns must score identically in the brute-force ranking."""
    knn = {
        (r.query_id, r.vec_id): r.cos_sim
        for r in N.q_knn_bruteforce(spark, sf_dir).collect()
    }
    ann = N.q_ann_lsh(spark, sf_dir).collect()
    for r in ann:
        if (r.query_id, r.vec_id) in knn:
            assert abs(knn[(r.query_id, r.vec_id)] - r.cos_sim) < 1e-12


def test_ivf_partitions_corpus_and_scores_exactly(spark, sf_dir):
    """IVF cells partition the corpus (every vector in exactly one cell);
    every neighbor IVF returns scores identically to brute force, and each
    query gets a full top-k (the probed cells hold >= k members here)."""
    from iceberg_relative_io_spark.sources.tables import load_table as lt

    n_vecs = lt(spark, sf_dir, "embeddings").count()
    knn = {
        (r.query_id, r.vec_id): r.cos_sim
        for r in N.q_knn_bruteforce(spark, sf_dir).collect()
    }
    ivf = N.q_ann_ivf(spark, sf_dir).collect()
    per_query = {}
    for r in ivf:
        per_query.setdefault(r.query_id, []).append(r)
        if (r.query_id, r.vec_id) in knn:
            assert abs(knn[(r.query_id, r.vec_id)] - r.cos_sim) < 1e-12
    assert len(per_query) == N._N_QUERIES
    assert all(len(v) == N._TOP_K for v in per_query.values())
    assert n_vecs >= N._IVF_FLOOR  # the bounded sample yields a full centroid set


def test_python_hash_mirrors_equal_column_builders(spark):
    """The Arrow fast path's load-bearing claim: the Python mirrors in
    functions/text.py compute the SAME integers as the Column builders
    (which the oracle SQL twins restate). Property-checked over random
    ASCII documents, including the <k-token edge cases."""
    import random

    from iceberg_relative_io_spark.functions import text as T

    rng = random.Random(0xC0FFEE)
    words = ["the", "a", "red", "widget", "x1", "zz9", "", "q"]
    docs = [
        " ".join(rng.choice(words) for _ in range(rng.randrange(0, 12)))
        for _ in range(60)
    ]
    df = spark.createDataFrame([(i, d) for i, d in enumerate(docs)], "i long, text string")
    codes = T.token_codes(F.col("text"))
    got = {
        r.i: (r.fp, r.sh, r.g5, r.gu)
        for r in df.select(
            "i",
            T.fingerprint(F.col("text")).alias("fp"),
            T.shingle_codes(codes).alias("sh"),
            T.gram_codes(codes, 5).alias("g5"),
            T.make_gram_codes_udf(5)(F.col("text")).alias("gu"),
        ).collect()
    }
    memo: dict = {}
    for i, d in enumerate(docs):
        fp = T._py_token_code(d, {})
        sh = T._py_shingles(d, memo)
        g5 = T._py_gram_codes(d, 5, memo)
        assert got[i][0] == fp, f"fingerprint mismatch on {d!r}"
        assert list(got[i][1]) == sh, f"shingles mismatch on {d!r}"
        assert list(got[i][2]) == g5, f"5-gram mismatch on {d!r}"
        assert list(got[i][3]) == g5, f"ordered-gram UDF mismatch on {d!r}"


def test_vector_mirrors_equal_column_builders(spark):
    """The ANN family's load-bearing equivalence: the Arrow-batched dot
    and LSH-bucket UDFs must produce bit-identical doubles / identical
    buckets to the Column builders (which the oracle SQL restates), over
    random float vectors including negatives and denormal-ish values."""
    import random

    from iceberg_relative_io_spark.functions import vectors as V

    rng = random.Random(0xBEEF)
    vecs = [
        [rng.uniform(-2, 2) * (10 ** rng.randrange(-3, 2)) for _ in range(V.DIM)]
        for _ in range(40)
    ]
    df = spark.createDataFrame(
        [(i, v, vecs[(i + 1) % len(vecs)]) for i, v in enumerate(vecs)],
        "i long, a array<double>, b array<double>",
    )
    dot_udf = V.make_dot_udf()
    rows = df.select(
        "i",
        V.dot(F.col("a"), F.col("b")).alias("dot_col"),
        dot_udf(F.col("a"), F.col("b")).alias("dot_arrow"),
        V.lsh_bucket(F.col("a")).alias("bk_col"),
        V.make_bucket_udf()(F.col("a")).alias("bk_arrow"),
    ).collect()
    for r in rows:
        assert r.dot_col == r.dot_arrow, f"dot bits diverge at row {r.i}"
        assert r.bk_col == r.bk_arrow, f"bucket diverges at row {r.i}"


def test_ivf_serving_layout_prunes_files(spark, sf_dir, tmp_path):
    """The 100 TB IVF serving story end-to-end: the corpus written as a
    relative-format table PARTITIONED BY cell id, so a query's nprobe
    cells map to manifest-level file pruning — the scan plans only
    nprobe/nlist of the data files, which is what 'a query touches
    nprobe/nlist of the corpus' means once the table format is involved."""
    from iceberg_relative_io_spark.catalog.fs_catalog import FsCatalog
    from iceberg_relative_io_spark.catalog.spark_table import RelativeTable
    from iceberg_relative_io_spark.functions import vectors as V
    from iceberg_relative_io_spark.operators.northstar import _IVF_FLOOR
    from iceberg_relative_io_spark.sources.tables import load_table as lt

    emb = lt(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    bc = spark.sparkContext.broadcast(V.collect_centroids(emb, _IVF_FLOOR))
    assigned = emb.withColumn("cell", V.make_nearest_udf(bc)(F.col("embedding")))

    cat = FsCatalog(str(tmp_path / "ivf_wh"))
    cat.create_namespace(("ann",))
    ops = cat.create_table(
        ("ann",), "corpus", assigned.schema.jsonValue(), partition_by=["cell"]
    )
    table = RelativeTable(ops)
    table.append(assigned)

    all_files = table.scan_files()
    probe_cells = [r.cell for r in assigned.select("cell").distinct().limit(2).collect()]
    probed = [
        f
        for c in probe_cells
        for f in table.scan_files(partition_filter={"cell": str(c)})
    ]
    assert 0 < len(probed) < len(all_files), "probing 2 cells must skip most files"
    # the probed read returns exactly those cells' members
    got = table.read(spark, partition_filter={"cell": str(probe_cells[0])})
    want = assigned.filter(F.col("cell") == probe_cells[0])
    assert got.count() == want.count() > 0


def test_neardup_plane_knob_shrinks_buckets_and_stays_exact(spark, sf_dir):
    """The n_planes scale knob: more planes must (a) never invent pairs —
    every returned pair at any plane count also appears, with the
    identical cosine, in the all-pairs ground truth above the threshold —
    and (b) strictly shrink candidate buckets (more, smaller blocks)."""
    from iceberg_relative_io_spark.functions import vectors as V
    from iceberg_relative_io_spark.sources.tables import load_table as lt

    emb = lt(spark, sf_dir, "embeddings")
    truth = {
        (r.vec_a, r.vec_b): r.cos_sim
        for r in N.q_embedding_neardup(spark, sf_dir, n_planes=8).collect()
    }
    for planes in (10, 12):
        got = N.q_embedding_neardup(spark, sf_dir, n_planes=planes).collect()
        # higher-plane runs are (near-)subsets: any overlap must agree exactly
        for r in got:
            if (r.vec_a, r.vec_b) in truth:
                assert truth[(r.vec_a, r.vec_b)] == r.cos_sim
            assert r.cos_sim >= 0.3
    # bucket granularity: 2^12 sign patterns partition strictly finer
    b8 = emb.select(V.make_bucket_udf(8)(F.col("embedding")).alias("b"))
    b12 = emb.select(V.make_bucket_udf(12)(F.col("embedding")).alias("b"))
    assert b12.distinct().count() >= b8.distinct().count()


def test_documents_fixture_is_ascii(spark, sf_dir):
    """c05_audio_energy's oracle iterates CODEPOINTS while the Spark
    stage iterates UTF-8 BYTES; they agree only on ASCII text. Enforce
    the invariant the oracle depends on (see pipeline_ext.q_audio_energy)
    so a regenerated fixture with non-ASCII text fails here, loudly,
    instead of as a value-hash flake."""
    docs = load_table(spark, sf_dir, "documents")
    non_ascii = docs.filter(~F.col("text").rlike(r"^[\x00-\x7F]*$")).count()
    assert non_ascii == 0


def test_centroid_collect_is_constant_in_corpus_size(spark, sf_dir):
    """THE 100 TB invariant for the trained-structure ANN family
    (IVF/medoids/PQ): the centroid/seed/codebook sample the driver
    collects is exactly k rows — constant in the corpus — and the same k
    ids come back when the corpus grows (a hash-sample prefix property:
    enlarging the corpus can only merge new ids in, never inflate the
    count past k)."""
    from iceberg_relative_io_spark.functions import vectors as V
    from iceberg_relative_io_spark.sources.tables import load_table as lt

    emb = lt(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n = emb.count()
    for k in (8, N._IVF_FLOOR):
        sample = V.bounded_sample(emb, k).collect()
        assert len(sample) == min(k, n)
    # doubling the corpus must not change the collected row count
    doubled = emb.unionByName(
        emb.withColumn("vec_id", F.col("vec_id") + F.lit(1_000_000))
    )
    assert len(V.bounded_sample(doubled, N._IVF_FLOOR).collect()) == N._IVF_FLOOR
    # and the plan is a distributed top-k, not a global sort + collect
    plan = (
        V.bounded_sample(emb, N._IVF_FLOOR)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_label_accuracy_never_broadcasts_the_corpus(spark, sf_dir):
    """The 1-NN label eval probes the corpus-sized embeddings projection
    BY the ≤|query set| top-1 rows — two BroadcastHashJoins whose build
    side is the tiny result, never a broadcast of emb itself. The plan
    must have no SortMergeJoin (nothing corpus-sized is ever sorted) and
    no Exchange hashpartitioning on vec_id/query_id (the lookups are
    map-side)."""
    df = N.q_knn_label_accuracy(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    # the only exchanges allowed are the top-k window's query_id
    # partition (bounded rows) and the final union-agg — never a hash
    # repartition of the raw embeddings scan for a join
    assert "ShuffledHashJoin" not in plan


def test_capstone_survivor_join_is_shuffled_hash(spark, sf_dir):
    """The capstone's survivor set is ≈ corpus-sized, so the verdict
    join must NOT broadcast it: pinned as a ShuffledHashJoin on doc_id
    (both sides partition on the key, the id-only side hash-builds per
    partition). The upstream survivorship stage keeps its own joins —
    only the verdict join's shape is pinned here."""
    df = N.q_pipeline_capstone(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin [doc_id" in plan


def test_ivf_plan_broadcasts_probes(spark, sf_dir):
    """The cell-pruned search must be a broadcast equi-join on cell id —
    never a cartesian/nested-loop over the corpus."""
    plan = N.q_ann_ivf(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Cartesian" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_exact_dedup_halves_doubled_corpus(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = N.q_exact_dedup(spark, sf_dir)
    assert out.count() == docs.count()
    assert out.agg(F.sum("n_copies")).collect()[0][0] == 2 * docs.count()


def test_multimodal_decode_stub_raises(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(2)
    mm = M.to_multimodal(docs)
    with pytest.raises(Exception) as err:
        M.decode_features(mm).collect()
    assert "NotImplementedError" in str(err.value) or "media library" in str(err.value)


def test_multimodal_pipeline_with_fake_codec(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    mm = M.to_multimodal(docs)
    feats = M.decode_features(mm, decoder=M.fake_decoder)
    rows = feats.collect()
    assert len(rows) == 50
    assert all(r.width >= 1 and r.height >= 1 and r.feature_norm >= 0 for r in rows)
    # metadata consistency: n_bytes round-tripped through the decode stage
    src = {r.item_id: r.n_bytes for r in mm.collect()}
    for r in rows:
        assert src[r.item_id] == r.n_bytes


def test_multimodal_resize_and_frame_sample(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    mm = M.to_multimodal(docs)
    resized = M.resize_stage(mm, target_bytes=64)
    assert all(r.n_bytes <= 64 for r in resized.collect())

    frames = M.sample_frames(mm, frame_size=32, stride=2).collect()
    by_item = {}
    for r in frames:
        by_item.setdefault(r.item_id, []).append(r)
    src = {r.item_id: r.n_bytes for r in mm.collect()}
    for item_id, rows in by_item.items():
        n_frames = -(-src[item_id] // 32)  # ceil
        assert len(rows) == len(range(0, n_frames, 2))
        assert all(r.frame_idx % 2 == 0 for r in rows)
        assert all(len(r.frame_sha) == 64 for r in rows)


def test_distributed_cc_matches_union_find(spark, sf_dir):
    """The distributed connected-components (scale path) must produce the
    same clustering as the driver-side union-find used by
    q_dedup_survivors."""
    from iceberg_relative_io_spark.operators.graph import (
        label_propagation_components,
    )

    # synthetic graph: two chains and an isolated pair, plus a triangle
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (22, 20)],
        "src long, dst long",
    )
    got = {
        r.node: r.label for r in label_propagation_components(edges).collect()
    }
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20,
    }


def test_distributed_cc_on_lsh_edges(spark, sf_dir):
    from pyspark.sql import functions as F

    from iceberg_relative_io_spark.operators.graph import (
        label_propagation_components,
    )
    from iceberg_relative_io_spark.operators.northstar import (
        q_dedup_survivors,
        q_lsh_candidate_pairs,
    )

    pairs = q_lsh_candidate_pairs(spark, sf_dir).filter(
        F.col("jaccard") >= 0.3
    ).select("doc_a", "doc_b")
    dist = {
        r.node: r.label
        for r in label_propagation_components(pairs).collect()
    }
    uf = {
        r.doc_id: r.component
        for r in q_dedup_survivors(spark, sf_dir).collect()
        if r.survivor == 0 or r.doc_id in dist
    }
    for node, comp in dist.items():
        assert uf[node] == comp


def test_kmeans_lloyd_partitions_corpus(spark, sf_dir):
    """One distributed Lloyd iteration: clusters partition the corpus
    exactly, every cluster key is a seed id from the bounded sample, and
    the distributed centroid update only ever hands the driver k*dim
    mean rows."""
    from iceberg_relative_io_spark.operators.northstar import _KMEANS_K, q_kmeans_lloyd
    from iceberg_relative_io_spark.sources.tables import load_table as lt

    out = q_kmeans_lloyd(spark, sf_dir).collect()
    n_vectors = lt(spark, sf_dir, "embeddings").count()
    assert sum(r.n_members for r in out) == n_vectors
    assert len(out) <= _KMEANS_K  # clusters keyed by the k seed ids


def test_cluster_medoids_partitions_corpus(spark, sf_dir):
    """One k-medoids pass: clusters partition the corpus exactly, every
    cluster id is a corpus member, and the medoid belongs to its own
    cluster (it is its cluster's min-cosine-tie-free nearest rep)."""
    from iceberg_relative_io_spark.operators.northstar import q_cluster_medoids
    from iceberg_relative_io_spark.sources.tables import load_table

    out = q_cluster_medoids(spark, sf_dir).collect()
    n_vectors = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r.n_members for r in out) == n_vectors
    for r in out:
        assert r.min_member <= r.cluster  # medoid is a member id, clusters keyed by rep


def test_recursive_cte_month_spine(spark, sf_dir):
    """The recursive spine covers every month between min and max
    orderdate inclusive, with zero-order months present."""
    from iceberg_relative_io_spark.operators.relational import q_recursive_cte
    from iceberg_relative_io_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    out = q_recursive_cte(spark, sf_dir)
    months = [r.month_start_us for r in out.collect()]
    assert len(months) == len(set(months))
    orders = load_table(spark, sf_dir, "orders")
    lo, hi = orders.select(
        F.min(F.date_trunc("month", "o_orderdate")),
        F.max(F.date_trunc("month", "o_orderdate")),
    ).first()
    span = (hi.year - lo.year) * 12 + (hi.month - lo.month) + 1
    assert len(months) == span
    assert sum(r.n_orders for r in out.collect()) == orders.count()


def test_sequence_packing_respects_budget_overflow_rule(spark, sf_dir):
    from iceberg_relative_io_spark.operators import northstar as N

    rows = N.q_sequence_packing(spark, sf_dir).collect()
    # cumsum packing: a bin may overflow only by its last document, so a
    # bin other than the final one per lang holds at least one doc and its
    # token count is bounded by budget + max doc length (docs are < 256
    # tokens in the fixture => bound is 2 * budget)
    assert all(r.n_docs >= 1 for r in rows)
    assert all(r.bin_tokens < 2 * N._PACK_BUDGET for r in rows)


def test_train_split_is_deterministic_and_complete(spark, sf_dir):
    from iceberg_relative_io_spark.operators import northstar as N
    from iceberg_relative_io_spark.sources.tables import load_table

    a = {(r.split, r.lang): (r.n_docs, r.total_tokens)
         for r in N.q_train_split(spark, sf_dir).collect()}
    b = {(r.split, r.lang): (r.n_docs, r.total_tokens)
         for r in N.q_train_split(spark, sf_dir).collect()}
    assert a == b  # content-hash split: stable across runs
    total = sum(n for n, _ in a.values())
    assert total == load_table(spark, sf_dir, "documents").count()


def test_knn_filtered_respects_predicate_and_exactness(spark, sf_dir):
    from iceberg_relative_io_spark.operators.northstar import (
        _N_QUERIES,
        _TOP_K,
        q_knn_bruteforce,
        q_knn_filtered,
    )

    rows = q_knn_filtered(spark, sf_dir).collect()
    emb_label = {
        r.vec_id: r.label
        for r in load_table(spark, sf_dir, "embeddings").select(
            "vec_id", "label"
        ).collect()
    }
    per_q: dict = {}
    for r in rows:
        # the filter is EXACT by construction: every hit shares the
        # query's label
        assert emb_label[r.vec_id] == r.qlabel == emb_label[r.query_id]
        per_q.setdefault(r.query_id, []).append(r)
    assert set(per_q) == set(range(_N_QUERIES))
    # scores agree with the unfiltered exact top-k wherever they overlap
    truth = {
        (r.query_id, r.vec_id): r.cos_sim
        for r in q_knn_bruteforce(spark, sf_dir).collect()
    }
    for r in rows:
        if (r.query_id, r.vec_id) in truth:
            assert r.cos_sim == truth[(r.query_id, r.vec_id)]
    for q, rs in per_q.items():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= _TOP_K


def test_kmeans_lloyd_update_reduces_inertia(spark, sf_dir):
    """The eval metric and the trainer compose: one Lloyd update of the
    seed centroids strictly reduces total cosine inertia (measured
    ~8.5% on the fixture)."""
    from iceberg_relative_io_spark.functions import vectors as V
    from iceberg_relative_io_spark.operators.northstar import (
        _KMEANS_K,
        q_kmeans_inertia,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    seed_total = sum(
        r.inertia for r in q_kmeans_inertia(spark, sf_dir).collect()
    )

    bc0 = spark.sparkContext.broadcast(V.collect_centroids(emb, _KMEANS_K))
    a1 = emb.withColumn("c0", V.make_nearest_udf(bc0)(F.col("embedding")))
    term = F.col("val").cast("string").cast("decimal(38,18)")
    mean = F.sum(term).cast("decimal(38,10)").cast("double") / F.count("*")
    cent = (
        a1.select("c0", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("c0", "pos")
        .agg(mean.alias("cval"))
    )
    by_c: dict = {}
    for r in cent.collect():
        by_c.setdefault(r.c0, {})[r.pos] = r.cval
    packed = [
        (cid, [d[i] for i in range(len(d))]) for cid, d in sorted(by_c.items())
    ]
    bc1 = spark.sparkContext.broadcast(V.pack_centroids(packed))
    after = emb.withColumn("a", V.make_assign_udf(bc1)(F.col("embedding")))
    after_total = after.agg(
        F.sum((F.lit(1.0) - F.col("a.cos")).cast("decimal(28,6)"))
        .cast("double")
    ).collect()[0][0]
    assert after_total < seed_total


# ---------------------------------------------------------------------------
# round 7: one REAL codec, pure stdlib — minimal PNG (functions/png_codec)
# ---------------------------------------------------------------------------


def test_png_codec_byte_exact_round_trip():
    """encode -> decode -> encode is a fixed point (byte-exact), for
    both grayscale and RGB, including non-square and 1-pixel edges."""
    from iceberg_relative_io_spark.functions import png_codec as P

    cases = [
        (5, 3, 1),
        (3, 5, 3),
        (1, 1, 1),
        (16, 16, 3),
        (7, 1, 3),
    ]
    for w, h, c in cases:
        px = bytes((i * 37 + c) % 256 for i in range(w * h * c))
        data = P.encode_png(w, h, px, c)
        w2, h2, c2, px2 = P.decode_png(data)
        assert (w2, h2, c2) == (w, h, c)
        assert px2 == px
        assert P.encode_png(w2, h2, px2, c2) == data  # fixed point

    import pytest as _pytest

    with _pytest.raises(P.PngError):
        P.encode_png(2, 2, b"\x00" * 3, 1)  # wrong buffer size
    with _pytest.raises(P.PngError):
        P.decode_png(b"NOT A PNG AT ALL")
    good = P.encode_png(2, 2, b"\x01\x02\x03\x04", 1)
    with _pytest.raises(P.PngError):  # corrupt CRC must be detected
        P.decode_png(good[:-1] + bytes([good[-1] ^ 0xFF]))


def test_png_decoder_handles_all_five_filters():
    """PNGs from OTHER writers use Sub/Up/Average/Paeth scanline
    filters; the decoder must unfilter all of them. Build one image per
    filter type by filtering the scanlines by hand (the spec's exact
    arithmetic) and assert identical decoded pixels."""
    import struct
    import zlib

    from iceberg_relative_io_spark.functions import png_codec as P

    w, h, c = 6, 4, 3
    px = bytes((i * 53 + 11) % 256 for i in range(w * h * c))
    stride, bpp = w * c, c

    def filt(ftype):
        raw = bytearray()
        prev = bytearray(stride)
        for y in range(h):
            line = bytearray(px[y * stride : (y + 1) * stride])
            enc = bytearray(line)
            if ftype == 1:
                for i in range(stride - 1, bpp - 1, -1):
                    enc[i] = (line[i] - line[i - bpp]) & 0xFF
            elif ftype == 2:
                for i in range(stride):
                    enc[i] = (line[i] - prev[i]) & 0xFF
            elif ftype == 3:
                for i in range(stride):
                    left = line[i - bpp] if i >= bpp else 0
                    enc[i] = (line[i] - ((left + prev[i]) >> 1)) & 0xFF
            elif ftype == 4:
                for i in range(stride):
                    left = line[i - bpp] if i >= bpp else 0
                    ul = prev[i - bpp] if i >= bpp else 0
                    enc[i] = (line[i] - P._paeth(left, prev[i], ul)) & 0xFF
            raw += bytes([ftype]) + bytes(enc)
            prev = line
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n"
            + P._chunk(b"IHDR", ihdr)
            + P._chunk(b"IDAT", zlib.compress(bytes(raw)))
            + P._chunk(b"IEND", b"")
        )

    for ftype in range(5):
        w2, h2, c2, got = P.decode_png(filt(ftype))
        assert (w2, h2, c2) == (w, h, c)
        assert got == px, f"filter {ftype} mis-decoded"


def test_multimodal_stages_run_real_png_end_to_end(spark):
    """The Spark-side multimodal plumbing runs a REAL format end to
    end: PNG payloads through decode_features (real dimensions, quadrant
    features) and resize_stage (decode -> nearest-neighbor downscale ->
    re-encode, output is a valid PNG within the size budget). The stub
    path stays the default (separate test)."""
    from iceberg_relative_io_spark.functions import multimodal as M
    from iceberg_relative_io_spark.functions import png_codec as P

    imgs = []
    for item_id, (w, h, c) in enumerate(
        [(40, 30, 1), (64, 64, 3), (9, 17, 3), (128, 32, 1)]
    ):
        px = bytes((item_id * 31 + i * 7) % 256 for i in range(w * h * c))
        imgs.append((item_id, P.encode_png(w, h, px, c), "image/png", w, h))
    mm = spark.createDataFrame(
        [(i, p, m, len(p)) for i, p, m, *_ in imgs],
        schema="item_id long, payload binary, mime string, n_bytes int",
    )

    feats = {
        r.item_id: r
        for r in M.decode_features(mm, decoder=P.png_decoder).collect()
    }
    for item_id, _, _, w, h in imgs:
        r = feats[item_id]
        assert (r.width, r.height) == (w, h)
        assert 0.0 <= r.feature_norm <= 2.0  # 4-dim vector in [0,1]^4

    resized = M.resize_stage(mm, target_bytes=16, resizer=P.png_resizer)
    out = {r.item_id: bytes(r.payload) for r in resized.collect()}
    for item_id, payload, _, w, h in imgs:
        w2, h2, c2, _ = P.decode_png(out[item_id])
        assert max(w2, h2) <= 16
        # aspect ratio approximately preserved
        assert abs(w2 / h2 - w / h) <= max(w / h, h2 and w2 / h2) * 0.5
        # decode feature of the resized payload still works
        rw, rh, feat = P.png_decoder(out[item_id])
        assert (rw, rh) == (w2, h2) and len(feat) == 4


def test_knn_graph_invariants(spark, sf_dir):
    """c03_knn_graph: neighbors share the node's IVF cell (recomputed
    independently), ranks are consecutive per node, the symmetric pair
    reuses the identical IEEE cosine, and the fuzz/oracle gate covers
    exactness — this pins what the oracle can't express."""
    from iceberg_relative_io_spark.functions import vectors as V
    from pyspark.sql import functions as F

    rows = N.q_knn_graph(spark, sf_dir).collect()
    assert rows, "fixture cells must produce neighbors"
    # recompute cell assignments the same way the query does (two-level
    # quantizer, round 9)
    emb = N.load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", V.norm(F.col("embedding")).alias("nrm")
    )
    nlist, nsup = V.derived_two_level(emb.count(), N._IVF_FLOOR)
    bc = spark.sparkContext.broadcast(V.collect_two_level(emb, nlist, nsup))
    cell = {
        r.vec_id: r.cell
        for r in emb.withColumn(
            "cell", V.make_two_level_nearest_udf(bc)(F.col("embedding"))
        ).collect()
    }
    by_node: dict = {}
    cos_of: dict = {}
    for r in rows:
        assert cell[r.vec_id] == cell[r.nbr_id]  # in-cell neighbors only
        by_node.setdefault(r.vec_id, []).append(r.rnk)
        cos_of[(r.vec_id, r.nbr_id)] = r.cos_sim
    for node, rnks in by_node.items():
        assert sorted(rnks) == list(range(1, len(rnks) + 1))
        assert len(rnks) <= N._KNN_GRAPH_K
    # symmetry: when both directions survive the top-k, the cosine is
    # the SAME double (multiplication commutes; sums are dim-ordered)
    for (a, b), c in cos_of.items():
        if (b, a) in cos_of:
            assert cos_of[(b, a)] == c


def test_diversity_cap_invariants(spark, sf_dir):
    """c03_diversity_cap (round 9): survivors are exactly the hash-order
    minima of their cell with consecutive ranks from 1; no cell exceeds
    _DIV_CAP survivors; and the cell assignment is the SAME cached frame
    c03_knn_graph uses (one featurization pass serves both) — all
    recomputed independently driver-side."""
    from pyspark.sql import functions as F

    from iceberg_relative_io_spark.functions import vectors as V

    rows = N.q_diversity_cap(spark, sf_dir).collect()
    assert rows
    bucketed, _ = N._two_level_bucketed(spark, sf_dir)
    # reference: plain one-window top-K over the same assignment
    key_of = {
        r.vec_id: ((r.vec_id % V._TWO31) * (V._LCG % V._TWO31)) % V._TWO31
        for r in bucketed.select("vec_id").collect()
    }
    cell_of = {
        r.vec_id: r.cell
        for r in bucketed.select("vec_id", "cell").collect()
        if r.cell is not None
    }
    by_cell: dict = {}
    for vid, cell in cell_of.items():
        by_cell.setdefault(cell, []).append(vid)
    want = {}
    for cell, vids in by_cell.items():
        ordered = sorted(vids, key=lambda v: (key_of[v], v))[: N._DIV_CAP]
        for rnk, vid in enumerate(ordered, 1):
            want[(cell, vid)] = rnk
    got = {(r.cell, r.vec_id): r.rnk for r in rows}
    assert got == want  # two-phase == one-window, ranks included
    from collections import Counter

    per_cell = Counter(c for c, _ in got)
    assert all(n <= N._DIV_CAP for n in per_cell.values())


def test_two_level_derivation_matches_duckdb_bitwise():
    """The load-bearing bit-exactness claim of the two-level quantizer
    (round 9): nlist = max(32, min(2^20, ceil(N^(21/32)))) is computed
    as a chain of correctly-rounded sqrt/multiply ops so DuckDB ceils
    the SAME double as Python for every corpus size — including sizes
    adjacent to exact powers where a one-ulp pow() divergence would
    flip the ceil. Property-checked over random and adversarial N."""
    import random

    import duckdb

    from iceberg_relative_io_spark.functions import vectors as V

    nlist_sql, nsup_sql = V.derived_two_level_sql()
    rng = random.Random(0x21_32)
    cases = [1, 2, 31, 32, 33, 1000, 2**31, 10**12]
    # adversarial: k^32 has an exact 21/32-power (k^21) — the ceil sits
    # on the integer boundary where any rounding drift would show
    cases += [k**3 for k in (2, 3, 10, 99)] + [2**32, 2**32 - 1, 2**32 + 1]
    cases += [rng.randrange(1, 10**12) for _ in range(400)]
    con = duckdb.connect()
    for n in cases:
        want_nlist, want_nsup = V.derived_two_level(n)
        sub = f"CAST({n} AS DOUBLE)"
        sql_nlist = nlist_sql.replace(
            "CAST((SELECT count(*) FROM embeddings) AS DOUBLE)", sub
        )
        sql_nsup = nsup_sql.replace(
            "CAST((SELECT count(*) FROM embeddings) AS DOUBLE)", sub
        )
        got = con.execute(f"SELECT {sql_nlist}, {sql_nsup}").fetchone()
        assert got == (want_nlist, want_nsup), (n, got, (want_nlist, want_nsup))


def test_diversity_cap_plan_pins_group_limit(spark, sf_dir):
    """The skew defense c03_diversity_cap delegates to Catalyst: the
    rank<=K filter must compile to a PARTIAL WindowGroupLimit BELOW the
    cell exchange (map tasks forward at most K rows per cell, so a
    viral cell can never concentrate its full membership in one sort).
    Pinned so an optimizer/conf regression cannot silently reintroduce
    the hot-cell sort."""
    plan = (
        N.q_diversity_cap(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan and "Partial" in plan
    below_exchange = plan.split("Exchange hashpartitioning(cell", 1)[1]
    assert "WindowGroupLimit" in below_exchange
    assert "Partial" in below_exchange


def test_two_level_quantizer_tiny_corpus(spark):
    """Degenerate sizes the floors create: a corpus SMALLER than the
    nsup/nlist floors must still quantize (every row becomes its own
    centroid and super), duplicates tie-break to the smallest id, and
    NULL embeddings stay NULL cells."""
    from iceberg_relative_io_spark.functions import vectors as V

    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [1.0, 0.0, 0.0]),  # duplicate of 1 -> ties to id 1's cell
        (4, None),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    nlist, nsup = V.derived_two_level(4)
    assert (nlist, nsup) == (32, 8)  # floors bind
    pack = V.collect_two_level(emb, nlist, nsup)
    bc = spark.sparkContext.broadcast(pack)
    got = {
        r.vec_id: r.cell
        for r in emb.withColumn(
            "cell", V.make_two_level_nearest_udf(bc)(F.col("embedding"))
        ).collect()
    }
    assert got[1] == 1 and got[2] == 2
    assert got[3] == 1  # duplicate vector -> first-maximum, smallest id
    assert got[4] is None  # NULL embedding -> NULL cell


def test_two_level_ctes_thread_the_table_name():
    """Round-10 advice: two_level_assign_ctes_sql's table parameter must
    reach the cents/sups sampling CTEs too — a non-default table with
    any 'FROM embeddings' left behind would sample centroids from the
    wrong corpus. The default text stays byte-identical to what every
    registered oracle already uses."""
    from iceberg_relative_io_spark.functions import vectors as V

    default = V.two_level_assign_ctes_sql()
    assert default == V.two_level_assign_ctes_sql(table="embeddings")
    other = V.two_level_assign_ctes_sql(table="emb_view")
    assert "embeddings" not in other
    assert other.count("FROM emb_view") == default.count("FROM embeddings")
