"""Connected-components crossover stress (VERDICT round-7 item 6).

Measures, at the union-find <-> label-propagation strategy boundary
(graph.UF_MAX_EDGES):

1. **round-count evidence** — pointer-jumping label propagation on a
   long PATH graph (the diameter worst case) must converge in
   O(log2(diameter)) rounds, pinned here against ceil(log2(N)) + slack;
2. **crossover cost** — wall time of driver union-find vs distributed
   label propagation on LSH-shaped edge sets (many small cliques — the
   shape fuzzy dedup actually produces) at sizes bracketing the guard,
   so the guard constant can sit at the measured break-even instead of
   a guess.

Usage:  python tools/stress_cc.py [sizes ...]
Prints one row per (shape, size, strategy) and a verdict line.
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import SparkSession


def _spark():
    return (
        SparkSession.builder.master("local[32]")
        .appName("stress_cc")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )


def _clique_edges(spark, n_edges: int, clique: int = 4):
    """LSH-candidate-shaped edge set: disjoint cliques of `clique`
    nodes (each contributes C(clique,2) edges)."""
    per = clique * (clique - 1) // 2
    n_cliques = max(1, n_edges // per)
    rows = []
    for c in range(n_cliques):
        base = c * clique
        for i in range(clique):
            for j in range(i + 1, clique):
                rows.append((base + i, base + j))
    return spark.createDataFrame(rows, "a long, b long")


def _path_edges(spark, n_nodes: int):
    return spark.createDataFrame(
        [(i, i + 1) for i in range(n_nodes - 1)], "a long, b long"
    )


def main() -> None:
    from iceberg_relative_io_spark.operators import graph

    sizes = [int(s) for s in sys.argv[1:]] or [50_000, 100_000, 200_000, 400_000]
    spark = _spark()

    # --- 1. round-count evidence on the diameter worst case ---------------
    import math

    print("shape=path (diameter worst case): rounds vs ceil(log2(diameter))")
    for n in (1_000, 10_000):
        t0 = time.time()
        out = graph.label_propagation_components(_path_edges(spark, n))
        n_labels = out.select("label").distinct().count()
        dt = time.time() - t0
        rounds = graph.LAST_LP_STATS["rounds"]
        bound = math.ceil(math.log2(n)) + 2
        ok = rounds <= bound and n_labels == 1
        print(
            f"  path n={n:>6}  rounds={rounds:>2}  bound={bound:>2}  "
            f"components={n_labels}  wall={dt:6.1f}s  {'OK' if ok else 'FAIL'}"
        )

    # --- 2. crossover cost on the dedup shape ------------------------------
    print("shape=cliques (LSH candidate shape): union-find vs label-prop")
    rows = []
    for n_edges in sizes:
        pairs = _clique_edges(spark, n_edges).persist()
        n = pairs.count()
        t0 = time.time()
        uf = graph.union_find_components(spark, pairs)
        uf_nodes = uf.count()
        t_uf = time.time() - t0
        t0 = time.time()
        lp = graph.label_propagation_components(pairs)
        lp_nodes = lp.count()
        t_lp = time.time() - t0
        rounds = graph.LAST_LP_STATS["rounds"]
        pairs.unpersist()
        assert uf_nodes == lp_nodes
        rows.append((n, t_uf, t_lp, rounds))
        print(
            f"  edges={n:>8}  union_find={t_uf:6.1f}s  "
            f"label_prop={t_lp:6.1f}s  lp_rounds={rounds}"
        )

    crossover = next((n for n, t_uf, t_lp, _ in rows if t_lp < t_uf), None)
    print(
        f"current guard UF_MAX_EDGES={graph.UF_MAX_EDGES}; "
        f"measured break-even {'at edges>=' + str(crossover) if crossover else 'not reached in tested sizes'}"
    )
    spark.stop()


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
