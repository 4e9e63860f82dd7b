"""Connected components over candidate-pair edge graphs — the shared
survivorship engine behind fuzzy dedup (C2).

Two execution strategies with one contract (component = min reachable
node id):

- ``label_propagation_components``: fully distributed hash-min label
  propagation — O(component diameter) rounds, each one shuffle join on
  node id plus one partial-agg min; the driver sees ONE scalar per round
  (a monotone label-sum convergence witness), never the graph. This is
  the 100 TB path: a crawl-scale corpus's near-dup edge set is billions
  of rows and must never be collected.
- ``union_find_components``: driver-side union-find — asymptotically
  cheaper constants when the post-LSH edge set is genuinely tiny, but
  it collects the edges, so it is only ever entered behind a COUNTED
  size guard.

``components`` is the policy: count the edges (one action on the
persisted pair set), take union-find only when the count is under
``max_collect_edges`` (a bounded, known-size collect), otherwise run
label propagation. The two strategies are asserted identical in
tests/test_roundthree.py::test_connected_components_matches_driver_union_find
and both match the recursive-transitive-closure oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CC_MAX_ITERS = 50

# diagnostics from the most recent label_propagation_components call
# (read by tools/stress_cc.py and the scaling tests; not part of the
# operator contract): {"rounds": int}
LAST_LP_STATS: dict = {}

# Union-find is permitted to collect at most this many edges (tens of MB
# on the driver — a KNOWN bound, not corpus-proportional: beyond it the
# distributed path runs). Fixture edge sets are a few hundred rows; a
# pathological corpus blows past this and never touches the driver.
# The constant sits at the measured break-even (tools/stress_cc.py,
# round 8, local[32]): on LSH-clique-shaped edge sets the driver
# union-find still beats label propagation at 400k edges (2.7s vs 4.7s;
# LP's flip cost is ~2 rounds of join+agg), and a 400k-edge collect is
# ~50 MB of python tuples — bounded on any real driver. Beyond it LP's
# per-round cost amortizes and the distributed path is the right one.
UF_MAX_EDGES = 400_000


def union_find_components(spark: SparkSession, pairs: DataFrame) -> DataFrame:
    """Driver union-find over a SMALL edge list -> (node, label) rows.
    Callers must bound the edge count before calling (see components)."""
    edges = [(r[0], r[1]) for r in pairs.collect()]

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    rows = [(n, find(n)) for n in parent]
    if rows:
        return spark.createDataFrame(rows, "node long, label long")
    return spark.createDataFrame([], "node long, label long")


def label_propagation_components(pairs: DataFrame) -> DataFrame:
    """Distributed hash-min label propagation WITH pointer jumping ->
    (node, label) rows.

    Each round every node takes the minimum label among itself and its
    neighbours (one hop), then contracts through its current label
    (``label <- min(label, label(label))`` — the pointer-jumping step),
    which halves label-chain depth per round. Plain hash-min needs
    O(diameter) rounds and a bounded loop would silently return
    non-converged labels on a long path graph (caught by the round-4
    chain stress — 120-node path, 69 wrong labels under the old loop);
    with jumping, convergence is O(log diameter), so the iteration cap
    is unreachable for any physical graph — and if it somehow is
    reached, the function RAISES rather than return a wrong clustering.
    Labels are localCheckpoint'ed per round to cut lineage; convergence
    is witnessed by one label-sum scalar per round (monotone
    non-increasing, so equality == fixpoint)."""
    edges = (
        pairs.toDF("a", "b")
        .union(pairs.toDF("a", "b").select(F.col("b"), F.col("a")))
        .toDF("src", "dst")
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        # lazy: round 1 materializes it as a side effect of its own
        # convergence aggregate — same trick as the in-loop checkpoint
        .localCheckpoint(eager=False)
    )
    # Round-11 (guide §5 — the driver should do almost no work): the
    # initial label sum was a separate eager checkpoint + one extra
    # driver action per call; starting from None skips the compare on
    # round 1 instead (labels == node ids can only equal round 1's sum
    # when the edge set is empty, where one extra tiny round is free).
    prev_sum: int | None = None
    converged = False
    rounds = 0
    for _ in range(_CC_MAX_ITERS):
        rounds += 1
        nbr_min = (
            edges.join(
                labels.select(
                    F.col("node").alias("src"), F.col("label").alias("src_label")
                ),
                "src",
            )
            .groupBy("dst")
            .agg(F.min("src_label").alias("nbr_min"))
        )
        stepped = labels.join(
            nbr_min, labels["node"] == nbr_min["dst"], "left"
        ).select(
            "node",
            F.least(
                F.col("label"), F.coalesce(F.col("nbr_min"), F.col("label"))
            ).alias("label"),
        )
        # pointer jumping: adopt the label OF my label (always a node of
        # the same component, so the min invariant holds) — label chains
        # halve, giving O(log diameter) total rounds
        hop = stepped.select(
            F.col("node").alias("pnode"), F.col("label").alias("plabel")
        )
        labels = (
            stepped.join(hop, stepped["label"] == hop["pnode"], "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("plabel"), F.col("label"))
                ).alias("label"),
            )
            # lazy: the convergence aggregate below is the round's single
            # action; it materializes the checkpoint as a side effect
            .localCheckpoint(eager=False)
        )
        cur_sum = labels.agg(F.sum("label")).collect()[0][0]
        # an empty edge set gives an empty labels frame whose sum is
        # NULL every round — that IS the fixpoint (nothing to propagate);
        # without this branch the loop burns _CC_MAX_ITERS rounds and
        # raises on a legitimately empty graph (e.g. a corpus with no
        # near-duplicate pairs above the jaccard threshold)
        if cur_sum is None or (prev_sum is not None and cur_sum == prev_sum):
            converged = True
            break
        prev_sum = cur_sum
    edges.unpersist()
    LAST_LP_STATS.clear()
    LAST_LP_STATS["rounds"] = rounds
    if not converged:
        raise RuntimeError(
            f"connected components did not converge in {_CC_MAX_ITERS} rounds "
            "(component diameter > 2^50 is not a physical graph; "
            "investigate the edge set)"
        )
    return labels


def components(
    spark: SparkSession,
    pairs: DataFrame,
    max_collect_edges: int | None = None,
) -> DataFrame:
    """(node, label) components with a counted size guard: union-find
    only when the edge count is provably small, label propagation
    otherwise. The count is one action on the persisted pair set — the
    driver learns a scalar before deciding whether any row may ever be
    collected."""
    if max_collect_edges is None:
        max_collect_edges = UF_MAX_EDGES
    pairs = pairs.persist()
    try:
        n_edges = pairs.count()
        if n_edges <= max_collect_edges:
            return union_find_components(spark, pairs)
        return label_propagation_components(pairs)
    finally:
        pairs.unpersist()
