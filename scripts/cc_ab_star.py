"""Interleaved A/B: pointer-doubling CC (shipped, zebra_spark.graph) vs
large-star/small-star contraction (Kiveris et al., "Connected Components
in MapReduce and Beyond") — VERDICT r4 directive 4.

Star contraction rewrites the EDGE frame each round (large-star links
every larger neighbor to the neighborhood min, small-star stars the
smaller ones), so the frame shrinks toward one star edge per non-root
node, where pointer doubling re-joins the full symmetrized edge list
every round and shrinks only the label distances.  The hypothesis worth
testing: on q_dedup_clusters' graph (6.45M edges at sf0.1, dense
near-clique components), a shrinking edge frame beats a fixed one.

Fixtures:
  (a) the REAL q_dedup_minhash pair graph at sf0.1 (the q_dedup_clusters
      input — dense cliques, small diameter);
  (b) a synthetic 2M-node chain + 1M random extra edges (high diameter —
      doubling's best case, star contraction's worst).

Runs each engine twice per fixture, interleaved (A B A B), asserts label
equality once per fixture.  Record the outcome in SCALING.md; adopt star
contraction only if it wins.

Run on a quiet machine:  python scripts/cc_ab_star.py
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def cc_star(
    nodes: DataFrame,
    edges: DataFrame,
    spill: str,
    max_rounds: int = 50,
) -> DataFrame:
    """Alternating large-star/small-star contraction, same contracts as
    zebra_spark.graph.connected_components (min-id component labels,
    parquet lineage cut per round, convergence observed on the round's
    own write via an (edge-count, hash-sum) signature)."""
    spark = nodes.sparkSession

    def cut(df: DataFrame, r: int, obs: Observation | None = None):
        df.write.mode("overwrite").parquet(f"{spill}/star_{r}")
        import shutil

        shutil.rmtree(f"{spill}/star_{r - 2}", ignore_errors=True)
        return spark.read.parquet(f"{spill}/star_{r}")

    E = cut(
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct(),
        0,
    )
    prev_sig = None
    for r in range(1, max_rounds + 1):
        sym = E.select("a", "b").union(
            E.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        # large-star: every neighbor v > u links to min(N(u) + {u})
        m = sym.groupBy("a").agg(F.least(F.min("b"), F.first("a")).alias("m"))
        large = (
            sym.join(m, "a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
        # small-star: orient (u = max, v = min); every smaller neighbor
        # and u itself link to min(N(u))
        o = large.select(
            F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
        )
        m2 = o.groupBy("u").agg(F.min("v").alias("m"))
        j = o.join(m2, "u")
        small = (
            j.select(F.col("v").alias("a"), F.col("m").alias("b"))
            .union(j.select(F.col("u").alias("a"), F.col("m").alias("b")))
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
        obs = Observation(f"star_{r}")
        # signature = (count, sum of 31-bit hash) — bounded so ANSI mode
        # can't overflow the long sum even at billions of edges
        observed = small.observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.sum(F.pmod(F.xxhash64("a", "b"), F.lit(2**31))), F.lit(0)
            ).alias("h"),
        )
        E = cut(observed, r)
        sig = (obs.get["n"], obs.get["h"])
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(f"star contraction: no fixpoint in {max_rounds}")
    print(f"    star rounds: {r}")
    # fixpoint: E holds star edges (child, root); roots + isolated nodes
    # label themselves
    labels = E.select(F.col("a").alias("id"), F.col("b").alias("component"))
    return nodes.join(labels, "id", "left").select(
        "id", F.coalesce("component", F.col("id")).alias("component")
    )


def run_ab(name: str, spark, nodes: DataFrame, edges_path: str) -> None:
    import zebra_spark.graph as g

    edges = spark.read.parquet(edges_path)
    n_edges = edges.count()
    print(f"== {name}: {n_edges:,} edges ==")

    saved = g.SMALL_GRAPH_EDGES
    g.SMALL_GRAPH_EDGES = -1  # force the iterative path (the A side)
    results = {}
    try:
        for rep in range(2):
            for eng in ("doubling", "star"):
                base = tempfile.mkdtemp(prefix=f"ccab_{eng}_")
                t0 = time.perf_counter()
                if eng == "doubling":
                    out = g.connected_components(nodes, edges, spill_dir=base)
                else:
                    out = cc_star(nodes, edges, base)
                n_comp = out.select("component").distinct().count()
                dt = time.perf_counter() - t0
                print(f"  {eng} rep{rep}: {dt:6.1f}s  ({n_comp:,} components)")
                if rep == 0 and eng not in results:
                    results[eng] = {
                        r["id"]: r["component"] for r in out.collect()
                    }
                import shutil

                shutil.rmtree(base, ignore_errors=True)
    finally:
        g.SMALL_GRAPH_EDGES = saved
    assert results["doubling"] == results["star"], f"{name}: labels differ"
    print(f"  labels identical ({len(results['doubling']):,} nodes)")


def main() -> None:
    import zebra_spark
    from zebra_spark.io import load
    from zebra_spark.session import get_spark

    spark = get_spark("cc-ab", cpus="32")
    zebra_spark.load_all_queries()
    tmp = tempfile.mkdtemp(prefix="ccab_fixture_")

    # (a) the real q_dedup_clusters input at sf0.1
    sf = "/root/testdata/sf0.1"
    zebra_spark.QUERIES["q_dedup_minhash"](spark, sf).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).write.mode("overwrite").parquet(f"{tmp}/minhash_edges")
    from zebra_spark.caching import release_caches

    release_caches()
    docs = load(spark, sf, "documents").select(F.col("doc_id").alias("id"))
    run_ab("minhash sf0.1", spark, docs, f"{tmp}/minhash_edges")

    # (b) synthetic high-diameter chain + random edges
    n = 2_000_000
    nodes = spark.range(n).select(F.col("id"))
    chain = spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    extra = spark.range(1_000_000).select(
        F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(n)).alias("src"),
        F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(n)).alias("dst"),
    )
    chain.union(extra).write.mode("overwrite").parquet(f"{tmp}/chain_edges")
    run_ab("chain 2M+1M", spark, nodes, f"{tmp}/chain_edges")

    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
