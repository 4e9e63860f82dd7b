"""Session-scoped shared-featurization cache registry.

Several operator families persist a featurization frame once per
(session, corpus[, knob]) and share it across queries — LSH signatures
and band buckets (northstar), the two-level kNN cell assignment
(northstar), image hashes and video keyframes (retrieval_ext). The
persist is the right trade at query time (a 100-TB corpus pass is never
cheap enough to recompute 4-5x per query), but module-level dicts of
persisted DataFrames are a session-lifetime leak unless something
releases them: one persisted frame per distinct key, held until the
process exits.

This module is the lifecycle contract:

- every operator module registers its cache dict via ``register_cache``
  at import time;
- ``release_session_caches()`` unpersists and clears EVERY registered
  cache — long-lived sessions (bench harnesses, warehouse daemons,
  scaling studies) call it between workloads;
- ``session_key(spark)`` is the session component of every cache key.
  ``id(spark)`` (the round-6..9 pattern) can alias: a garbage-collected
  session's address can be reused by a new SparkSession object, handing
  the new session a persisted frame whose backing RDD belongs to a
  stopped context. ``applicationId`` is minted per SparkContext and
  never reused within a machine-lifetime, so keys can't alias.

``tools/scaling_study.py`` and ``bench.py`` both call the hook; any
embedding application that keeps one SparkSession for days should too
(e.g. per pipeline run).
"""

from __future__ import annotations

_REGISTRY: list[dict] = []


def register_cache(cache: dict) -> dict:
    """Register a module-level cache dict for lifecycle management and
    return it (so modules can write ``_CACHE = register_cache({})``)."""
    _REGISTRY.append(cache)
    return cache


def session_key(spark) -> str:
    """Stable, non-aliasing session component for cache keys."""
    return spark.sparkContext.applicationId


def persisted_count() -> int:
    """Number of persisted DataFrames currently held by registered
    caches (sentinels and plain values don't count) — the observable
    the release test asserts returns to zero."""
    return sum(
        1
        for cache in _REGISTRY
        for v in cache.values()
        if hasattr(v, "unpersist")
    )


def release_session_caches(spark=None) -> int:
    """Unpersist and drop every entry in every registered cache.

    Returns the number of DataFrames unpersisted. ``spark`` is accepted
    for call-site symmetry but unused: caches may hold frames from
    several sessions (keys carry the session component), and releasing
    a frame whose session has already stopped is a no-op, so releasing
    everything is always safe.
    """
    released = 0
    for cache in _REGISTRY:
        for v in cache.values():
            if hasattr(v, "unpersist"):
                try:
                    v.unpersist()
                    released += 1
                except Exception:
                    pass  # session already stopped: nothing to release
        cache.clear()
    return released
