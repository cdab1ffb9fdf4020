"""10x scale check for incremental pair-table maintenance (r7): does
the delta really cost |batch|, not |corpus|?

Replicates the sf0.1 documents corpus 1x/3x/10x (same perturbed
replication as scripts/dedup_scale10.py — replicas are NOT near-dups,
so output density stays realistic), then at each scale measures

- the full pair_table build (one-time per corpus snapshot), and
- pair_table_delta for the SAME FIXED batch (generation-0 docs with
  doc_id % 10 == 0, ~500 docs at every scale), with the derived
  sig/tokset tables already materialized — the maintained-state steady
  state.

The claim under test: build time grows with the corpus; delta time for
a fixed batch grows only through the corpus-side band join (bucket
sizes), staying a small fraction of the rebuild — the 100 TB
justification for maintaining the table instead of rebuilding it per
ingest.

Not part of the test suite (runtime); results recorded in SCALING.md.

    python scripts/delta_scale10.py
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from scripts.dedup_scale10 import replicated  # noqa: E402


def main() -> None:
    import zebra_spark
    from zebra_spark.caching import release_caches
    from zebra_spark.queries import dedup as dd
    from zebra_spark.session import get_spark

    zebra_spark.load_all_queries()
    spark = get_spark("delta-scale10", cpus="32")
    sf = "/root/testdata/sf0.1"

    out: dict[str, dict] = {}
    for k in (1, 3, 10):
        d = tempfile.mkdtemp(prefix=f"delta10_x{k}_")
        try:
            n_docs = replicated(spark, sf, k, d)
            t0 = time.perf_counter()
            pt = dd.pair_table(spark, d)
            n_pairs = pt.count()
            t_build = round(time.perf_counter() - t0, 2)
            release_caches()

            new_ids = (
                spark.read.parquet(f"{d}/documents.parquet")
                .select("doc_id")
                .filter(
                    (F.col("doc_id") % 10 == 0) & (F.col("doc_id") < 1_000_000)
                )
            )
            n_batch = new_ids.count()
            t0 = time.perf_counter()
            n_delta = dd.pair_table_delta(spark, d, new_ids).count()
            t_delta = round(time.perf_counter() - t0, 2)
            release_caches()
            out[f"x{k}"] = {
                "n_docs": n_docs,
                "n_pairs": n_pairs,
                "n_batch": n_batch,
                "n_delta": n_delta,
                "build_s": t_build,
                "delta_s": t_delta,
                "delta_over_build": round(t_delta / t_build, 3),
            }
        finally:
            shutil.rmtree(d, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
