"""Incremental-add vs full-retrain cost for the PQ / IVF-PQ family
(VERDICT r6 #1): at sf0.1, train on the 90% base corpus, then compare

- add(batch): encode the 10% ingest batch with the FROZEN codebooks and
  append (the per-batch maintenance path), vs
- retrain(): fresh codebooks over base+batch and a full re-encode (what
  a train-once index forces on every ingest batch);

plus the drift audit's cost and signal (same-dist vs shifted batch) and
the recall of the add-path index vs the retrain-built one.

The ratio is the headline: at 100 TB an ingest batch is a fraction of
the corpus, so add() should cost roughly |batch|/|corpus| of a retrain
(one bounded encode pass, no codebook training, no corpus re-encode).

Not part of the test suite (runtime); results recorded in SCALING.md.

    python scripts/pq_add_check.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    import zebra_spark
    from pyspark.sql import functions as F
    from zebra_spark.index.ivfpq import IVFPQIndex
    from zebra_spark.index.pq import PQIndex
    from zebra_spark.io import embeddings_d
    from zebra_spark.session import get_spark

    zebra_spark.load_all_queries()
    spark = get_spark("pq-add-check", cpus="32")
    e = embeddings_d(spark, SF_DIR).select("vec_id", "emb").localCheckpoint()
    base = e.filter(F.col("vec_id") % 10 != 0)
    batch = e.filter(F.col("vec_id") % 10 == 0)
    out: dict[str, object] = {"n_base": base.count(), "n_batch": batch.count()}

    for name, cls, kw in (
        ("pq", PQIndex, {"m": 8, "k": 16}),
        ("ivfpq", IVFPQIndex, {"k_coarse": 16, "m": 8, "k": 16}),
    ):
        t0 = time.perf_counter()
        idx = cls.train(spark, "", seed=42, corpus=base, **kw)
        out[f"{name}_train_base_s"] = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        idx.add(batch)
        out[f"{name}_add_batch_s"] = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        idx.drift_audit(batch).collect()
        out[f"{name}_drift_audit_s"] = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        fresh = idx.retrain(seed=42)
        out[f"{name}_retrain_full_s"] = round(time.perf_counter() - t0, 2)
        out[f"{name}_add_vs_retrain"] = round(
            out[f"{name}_add_batch_s"] / out[f"{name}_retrain_full_s"], 3
        )

        # recall of add-path vs retrain-built on the same 10 queries
        def top10(i):
            search = (
                i.search_ids(range(10), k=10, refine=200)
                if name == "pq"
                else i.search_ids(range(10), k=10, nprobe=12, refine=400)
            )
            return set(
                map(tuple, search.select("query_id", "neighbor_id").toPandas()
                    .itertuples(index=False))
            )

        exact = set(
            map(
                tuple,
                zebra_spark.QUERIES["q_knn_exact"](spark, SF_DIR)
                .select("query_id", "neighbor_id")
                .toPandas()
                .itertuples(index=False),
            )
        )
        out[f"{name}_recall_add"] = round(len(top10(idx) & exact) / len(exact), 3)
        out[f"{name}_recall_retrain"] = round(
            len(top10(fresh) & exact) / len(exact), 3
        )

        shifted = batch.select(
            "vec_id", F.expr("transform(emb, x -> 3.0d * x + 1.0d)").alias("emb")
        )
        out[f"{name}_drift_same"] = round(
            idx.drift_audit(batch).toPandas().ratio.iloc[0], 2
        )
        out[f"{name}_drift_shifted"] = round(
            idx.drift_audit(shifted).toPandas().ratio.iloc[0], 2
        )

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
