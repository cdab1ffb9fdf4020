"""Takedown cost vs corpus size on a REALISTIC-family corpus (r10,
VERDICT r9 #6): the bench fixture is saturation-dense (one mega
dup-family), so q_cluster_takedown's "affected-components-only" claim
degenerates there to a full re-cluster.  This harness builds corpora of
MANY SMALL families (5-node chains — the realistic shape: most docs
duplicate a handful of others, not everything) at x1/x3/x10 node
counts, applies a FIXED-SIZE takedown (the middles of the first 200
families — middles, so every affected chain SPLITS and the relabel
path does real work), and times graph.remove_and_relabel.

Claim under test: takedown cost tracks the affected-family volume
(fixed here), not the corpus size — the corpus-proportional part is
two column-projection passes (the label semi/anti joins), which at
these sizes stay inside Spark's fixed job overhead.

    python scripts/takedown_scale.py [base_nodes]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

FAMILY = 5  # nodes per dup-family (chain)
N_TAKEDOWN_FAMILIES = 200


def main() -> None:
    base = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    from zebra_spark.session import get_spark

    spark = get_spark("takedown-scale")
    from zebra_spark.graph import remove_and_relabel

    results = []
    for mult in (1, 3, 10):
        n = base * mult
        nodes = spark.range(n).select(F.col("id"))
        # chains of FAMILY nodes: edge (id, id+1) unless id ends a chain
        edges = (
            spark.range(n - 1)
            .filter(F.col("id") % FAMILY != FAMILY - 1)
            .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
        )
        # maintained labels: min-id per family (what CC would produce)
        labels = nodes.select(
            "id", (F.col("id") - F.col("id") % FAMILY).alias("component")
        ).localCheckpoint()
        edges = edges.localCheckpoint()

        # fixed takedown: the MIDDLE of the first N_TAKEDOWN_FAMILIES
        # chains — each affected chain splits in two
        removed = (
            spark.range(N_TAKEDOWN_FAMILIES)
            .select((F.col("id") * FAMILY + 2).alias("id"))
        )

        t0 = time.perf_counter()
        relabeled = remove_and_relabel(labels, edges, removed)
        out_n = relabeled.count()
        took = round(time.perf_counter() - t0, 3)

        # correctness spot-check: family k < 200 splits into
        # {5k, 5k+1} (label 5k) and {5k+3, 5k+4} (label 5k+3)
        probe = {
            r.id: r.component
            for r in relabeled.filter(F.col("id") < FAMILY).collect()
        }
        assert probe == {0: 0, 1: 0, 3: 3, 4: 3}, probe
        assert out_n == n - N_TAKEDOWN_FAMILIES

        results.append(
            {
                "mult": mult,
                "nodes": n,
                "edges": int(n * (FAMILY - 1) / FAMILY),
                "takedown_ids": N_TAKEDOWN_FAMILIES,
                "takedown_s": took,
            }
        )
        print(json.dumps(results[-1]), flush=True)

    print(json.dumps({"base": base, "family": FAMILY, "rows": results}))
    spark.stop()


if __name__ == "__main__":
    main()
