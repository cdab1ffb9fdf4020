"""Label-propagation head-to-head at a LARGER seed set (r12, VERDICT
r11 #2): the exact broadcast-seed cross join vs the ANN (IVF
search_df) composition, on a synthetic CLUSTERED corpus — the regime
label propagation actually runs in (labels correlate with geometry).

The exact path's per-query work is |seeds| distance evaluations; the
ANN path's is |probed cells' members| ~= |seeds| * nprobe / k_cells.
This script measures wall-clock for both at the same (seeds, unl)
and checks vote agreement, so the SCALING.md entry is a measured
fact rather than the docstring inference the r11 verdict flagged.

    python scripts/label_prop_ann_check.py [n_seeds] [n_unl] [dim]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def synth(spark, n_seeds: int, n_unl: int, dim: int, n_labels: int = 64,
          seed: int = 7):
    """Clustered corpus as DataFrames, generated EXECUTOR-side from
    the id (deterministic hash-seeded normals) so the driver never
    materializes the vectors."""
    import pandas as pd

    rng = np.random.RandomState(seed)
    centers = (rng.normal(0, 1, (n_labels, dim)) * 2.0).tolist()

    def gen(mids, offset):
        def op(batches):
            C = np.asarray(centers)
            for pdf in batches:
                ids = pdf["id"].to_numpy()
                out = []
                for i in ids:
                    c = int(i) % n_labels
                    r = np.random.RandomState((int(i) * 2654435761 + 97) % (2**31))
                    v = C[c] + r.normal(0, 0.05, dim)
                    out.append((int(i) + offset, c, [float(x) for x in v]))
                yield pd.DataFrame(out, columns=["vid", "label", "emb"])
        return (
            mids.mapInPandas(op, "vid bigint, label int, emb array<double>")
        )

    seeds = gen(spark.range(n_seeds).repartition(32), 0).select(
        F.col("vid").alias("lab_id"), "label", F.col("emb").alias("le")
    )
    unl = gen(spark.range(n_unl).repartition(32), n_seeds).select(
        F.col("vid").alias("vec_id"), "emb"
    )
    return seeds, unl


def main() -> None:
    # --weighted: run the distance-weighted vote pair (r13, VERDICT
    # r12 #2) instead of the majority pair — same fixture, same plans,
    # only the aggregate differs, so the speedup story must carry over
    weighted = "--weighted" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_seeds = int(args[0]) if len(args) > 0 else 20_000
    n_unl = int(args[1]) if len(args) > 1 else 100_000
    dim = int(args[2]) if len(args) > 2 else 64

    from zebra_spark.queries.vector import (
        label_prop_ann_df,
        label_prop_exact_df,
        label_prop_weighted_exact_df,
    )
    from zebra_spark.session import get_spark

    exact_fn = label_prop_weighted_exact_df if weighted else label_prop_exact_df

    spark = get_spark("label_prop_ann_check")
    lab, unl = synth(spark, n_seeds, n_unl, dim)
    lab = lab.localCheckpoint()
    unl = unl.localCheckpoint()

    t0 = time.perf_counter()
    exact = exact_fn(lab, unl).toPandas()
    t_exact = time.perf_counter() - t0

    # k_cells OVER-SEGMENTS the 64 planted clusters (128 cells):
    # seeded-Lloyd from a random init collapses cells when k matches
    # the cluster count exactly (measured: one 705-seed mega-cell at
    # k=64 that every query probed = 45% of all pairs), while 2x
    # over-segmentation keeps cells near _SALT_CAP and the probe
    # fraction at 8/128 = 1/16 of the seed set per query
    t0 = time.perf_counter()
    ann = label_prop_ann_df(
        spark, lab, unl, k_cells=128, nprobe=8, weighted=weighted
    ).toPandas()
    t_ann = time.perf_counter() - t0

    m = exact.merge(ann, on="vec_id", suffixes=("_e", "_a"))
    agree = float((m.label_e == m.label_a).mean())
    print(json.dumps({
        "vote": "weighted" if weighted else "majority",
        "n_seeds": n_seeds,
        "n_unl": n_unl,
        "dim": dim,
        "exact_s": round(t_exact, 2),
        "ann_s": round(t_ann, 2),
        "speedup": round(t_exact / t_ann, 2),
        "agreement": round(agree, 4),
        "rows": len(m),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
