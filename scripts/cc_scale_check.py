"""Scale + equivalence check for connected_components beyond the
fixtures.

Builds a deterministic synthetic graph (hash-based edges over N nodes:
a long chain through every node — worst case for label propagation —
plus random extra edges), then:

1. runs BOTH execution paths (single-task union-find fast path and
   iterative pointer-doubling) on the SAME 2M-edge graph and asserts
   identical labels — the fast-path threshold can never silently
   change results;
2. times the iterative path alone on an 8M-edge graph (above the
   fast-path threshold), the regime q_dedup_clusters runs in at sf0.1.

Run on a quiet machine:  python scripts/cc_scale_check.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def synth_graph(spark, n_nodes: int, n_extra: int):
    from pyspark.sql import functions as F

    nodes = spark.range(n_nodes).select(F.col("id"))
    chain = spark.range(n_nodes - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    extra = spark.range(n_extra).select(
        F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(n_nodes)).alias("src"),
        F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(n_nodes)).alias("dst"),
    )
    return nodes, chain.union(extra)


def main() -> None:
    import zebra_spark.graph as g
    from zebra_spark.session import get_spark

    spark = get_spark("cc-scale", cpus="32")

    # 1) path equivalence on 1M nodes / ~2M edges
    nodes, edges = synth_graph(spark, 1_000_000, 1_000_000)
    t0 = time.perf_counter()
    fast = {
        r["id"]: r["component"]
        for r in g.connected_components(nodes, edges).collect()
    }
    t_fast = time.perf_counter() - t0

    saved = g.SMALL_GRAPH_EDGES
    g.SMALL_GRAPH_EDGES = -1
    try:
        t0 = time.perf_counter()
        it = {
            r["id"]: r["component"]
            for r in g.connected_components(nodes, edges).collect()
        }
        t_iter = time.perf_counter() - t0
    finally:
        g.SMALL_GRAPH_EDGES = saved
    assert fast == it, "fast path and iterative path disagree"
    print(
        f"1M nodes / 2M edges: fast path {t_fast:.1f}s == iterative"
        f" {t_iter:.1f}s ({len(set(fast.values()))} components, identical)"
    )

    # 2) iterative-path throughput above the fast-path threshold
    nodes8, edges8 = synth_graph(spark, 4_000_000, 4_000_000)
    t0 = time.perf_counter()
    n_comp = (
        g.connected_components(nodes8, edges8)
        .select("component")
        .distinct()
        .count()
    )
    dt = time.perf_counter() - t0
    print(
        f"4M nodes / 8M edges (iterative, chain diameter 4M): "
        f"{dt:.1f}s, {n_comp} components"
    )
    spark.stop()


if __name__ == "__main__":
    main()
