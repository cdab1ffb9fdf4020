"""IVF-PQ recall/latency tuning grid (r7): nprobe x refine sweep at
sf0.1 — the measure-don't-guess artifact behind the defaults q_ann_ivfpq
ships (nprobe=12, refine=400 at fixture scale).

For each (nprobe, refine): recall@10 vs exact brute force on 10 corpus
queries, and the median of 3 isolated search wall-clocks.  The point at
100 TB: recall is bought with nprobe (more cells scanned — linear cost)
and refine (bigger exact re-rank join — sublinear cost), and the grid
shows which knob buys more recall per second on a given corpus shape.

Not part of the test suite (runtime); results recorded in SCALING.md.

    python scripts/ivfpq_tuning_grid.py
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    import zebra_spark
    from zebra_spark.index.ivfpq import IVFPQIndex
    from zebra_spark.session import get_spark

    zebra_spark.load_all_queries()
    spark = get_spark("ivfpq-grid", cpus="32")
    idx = IVFPQIndex.train(spark, SF_DIR, k_coarse=16, m=8, k=16, seed=42)
    exact = set(
        map(
            tuple,
            zebra_spark.QUERIES["q_knn_exact"](spark, SF_DIR)
            .select("query_id", "neighbor_id")
            .toPandas()
            .itertuples(index=False),
        )
    )
    out = []
    for nprobe in (2, 4, 8, 12, 16):
        for refine in (50, 100, 200, 400):
            ts, rec = [], 0.0
            for _ in range(3):
                t0 = time.perf_counter()
                ann = (
                    idx.search_ids(range(10), k=10, nprobe=nprobe,
                                   refine=refine)
                    .select("query_id", "neighbor_id")
                    .toPandas()
                )
                ts.append(round(time.perf_counter() - t0, 3))
                rec = len(set(map(tuple, ann.itertuples(index=False)))
                          & exact) / len(exact)
            out.append(
                {
                    "nprobe": nprobe,
                    "refine": refine,
                    "recall": round(rec, 3),
                    "median_s": statistics.median(ts),
                }
            )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
