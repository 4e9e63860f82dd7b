"""Lifecycle contract for the session-scoped featurization caches
(iceberg_relative_io_spark/caches.py): operators register their cache
dicts at import time, queries populate them with persisted frames, and
``release_session_caches`` returns the persisted count to zero — the
long-session hygiene hook bench.py and tools/scaling_study.py call."""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_relative_io_spark import caches


def test_release_returns_persisted_count_to_zero(spark, sf_dir):
    from iceberg_relative_io_spark.operators import northstar, retrieval_ext

    caches.release_session_caches(spark)
    assert caches.persisted_count() == 0

    # populate three independent cache families end-to-end
    northstar.q_lsh_candidate_pairs(spark, sf_dir).count()  # _SIG_CACHE
    northstar.q_knn_graph(spark, sf_dir).count()  # _KNN_BUCKET/_NLIST
    retrieval_ext.q_keyframes(spark, sf_dir).count()  # _KF_CACHE
    assert caches.persisted_count() > 0
    assert any(northstar._SIG_CACHE) and any(northstar._KNN_BUCKET_CACHE)

    released = caches.release_session_caches(spark)
    assert released >= 2
    assert caches.persisted_count() == 0
    for cache in (
        northstar._SIG_CACHE,
        northstar._KNN_BUCKET_CACHE,
        northstar._KNN_NLIST_CACHE,
        retrieval_ext._KF_CACHE,
    ):
        assert not cache


def test_session_key_is_application_id_not_object_identity(spark):
    # id() can be reused by a later SparkSession at the same address;
    # applicationId is minted per SparkContext and cannot alias
    key = caches.session_key(spark)
    assert key == spark.sparkContext.applicationId
    assert isinstance(key, str) and key


def test_nlist_cached_per_session_and_corpus(spark, sf_dir):
    from iceberg_relative_io_spark.operators import northstar

    caches.release_session_caches(spark)
    northstar._two_level_bucketed(spark, sf_dir)
    nkey = (caches.session_key(spark), sf_dir)
    assert nkey in northstar._KNN_NLIST_CACHE
    first = northstar._KNN_NLIST_CACHE[nkey]
    # second call must reuse the derived (nlist, nsup) — same object,
    # no recount job — and the same persisted assignment frame
    df1, n1 = northstar._two_level_bucketed(spark, sf_dir)
    df2, n2 = northstar._two_level_bucketed(spark, sf_dir)
    assert n1 == n2 == first[0]
    assert df1 is df2
    caches.release_session_caches(spark)


def test_centroid_and_count_caches_share_and_release(spark, sf_dir):
    """Round-11: the generic quantizer caches in functions/vectors.py —
    one collect per (session, corpus, k) shared across every consumer,
    one count per (session, corpus, variant), all cleared (and the
    broadcasts unpersisted) by the lifecycle hook."""
    from iceberg_relative_io_spark.functions import vectors as V
    from iceberg_relative_io_spark.sources.tables import load_table

    caches.release_session_caches(spark)
    assert not V._CENTROID_BC_CACHE and not V._COUNT_CACHE

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    bc1 = V.centroids_broadcast(spark, sf_dir, emb, 16)
    bc2 = V.centroids_broadcast(spark, sf_dir, emb, 16)
    assert bc1 is bc2  # second call: no collect job, same broadcast
    bc_other = V.centroids_broadcast(spark, sf_dir, emb, 24)
    assert bc_other is not bc1  # k is part of the key
    assert len(bc_other.value[0]) == 24 and len(bc1.value[0]) == 16

    n_all = V.cached_count(spark, sf_dir, emb)
    n_nonnull = V.cached_count(
        spark, sf_dir, emb.filter(F.col("embedding").isNotNull()), "nonnull"
    )
    assert (caches.session_key(spark), sf_dir, "all") in V._COUNT_CACHE
    assert (caches.session_key(spark), sf_dir, "nonnull") in V._COUNT_CACHE
    assert n_all >= n_nonnull > 0

    released = caches.release_session_caches(spark)
    assert released >= 2  # both broadcasts unpersisted via the hook
    assert not V._CENTROID_BC_CACHE and not V._COUNT_CACHE


def test_results_unchanged_after_release(spark, sf_dir):
    # releasing mid-session must be invisible to correctness: the next
    # query simply re-featurizes
    from iceberg_relative_io_spark.operators import northstar

    before = (
        northstar.q_lsh_candidate_pairs(spark, sf_dir)
        .agg(F.count("*").alias("n"), F.sum(F.hash("doc_a", "doc_b")).alias("h"))
        .collect()[0]
    )
    caches.release_session_caches(spark)
    after = (
        northstar.q_lsh_candidate_pairs(spark, sf_dir)
        .agg(F.count("*").alias("n"), F.sum(F.hash("doc_a", "doc_b")).alias("h"))
        .collect()[0]
    )
    assert before == after
    caches.release_session_caches(spark)
