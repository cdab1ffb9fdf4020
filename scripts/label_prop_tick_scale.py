"""Delta label maintenance at scale (r13, VERDICT r12 #4 follow-on):
measure that run_tick's label step costs BACKLOG-proportional time,
flat in accumulated corpus size — the property that makes a label
cadence viable at 100 TB (the naive per-trigger full re-propagation
grows linearly with the corpus and would eventually eat the tick).

Protocol: synth clustered corpus (label_prop_ann_check.synth), freeze
n_seeds label seeds and train the index once (init-time cost, also
reported).  Then:
  1. bulk trigger — label a large accumulated backlog of n_bulk
     vectors (what the FIRST trigger after enabling the cadence, or a
     reseed, pays);
  2. delta trigger — with those labeled, append a small batch of
     n_batch vectors and trigger again (steady-state per-tick cost);
  3. full re-propagation of the whole corpus via label_prop_ann_df
     with the same prebuilt index (what every trigger would pay
     WITHOUT the delta discipline).
Reports the three wall-clocks; the claim holds if (2) is a small
fraction of (3) and roughly tracks n_batch / (n_bulk + n_batch).

    python scripts/label_prop_tick_scale.py [n_seeds] [n_bulk] [n_batch]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000
    n_bulk = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    n_batch = int(sys.argv[3]) if len(sys.argv) > 3 else 5_000

    import tempfile

    from scripts.label_prop_ann_check import synth
    from zebra_spark.index.ivf import IVFIndex
    from zebra_spark.queries.vector import label_prop_ann_df
    from zebra_spark.session import get_spark

    spark = get_spark("label_prop_tick_scale")
    lab, unl = synth(spark, n_seeds, n_bulk + n_batch, 64)
    lab = lab.localCheckpoint()
    unl = unl.localCheckpoint()
    bulk = unl.filter(F.col("vec_id") < n_seeds + n_bulk)
    batch = unl.filter(F.col("vec_id") >= n_seeds + n_bulk)

    state = tempfile.mkdtemp(prefix="lpts_")

    t0 = time.perf_counter()
    idx = IVFIndex.train(
        spark, sf_dir="", k=128,
        corpus=lab.select(
            F.col("lab_id").alias("vec_id"), F.col("le").alias("emb")
        ),
    )
    idx.save(f"{state}/labelidx")
    t_train = time.perf_counter() - t0

    def trigger(backlog):
        """One cadence trigger exactly as run_tick performs it: load
        the persisted index, propagate the backlog, append."""
        t0 = time.perf_counter()
        loaded = IVFIndex.load(spark, f"{state}/labelidx")
        label_prop_ann_df(
            spark, lab, backlog, nprobe=8, index=loaded
        ).write.mode("append").parquet(f"{state}/proplabels")
        return time.perf_counter() - t0

    t_bulk = trigger(bulk)
    t_delta = trigger(batch)

    t0 = time.perf_counter()
    full = label_prop_ann_df(spark, lab, unl, nprobe=8, index=idx)
    n_full = full.count()
    t_full = time.perf_counter() - t0

    n_state = spark.read.parquet(f"{state}/proplabels").count()
    print(json.dumps({
        "n_seeds": n_seeds, "n_bulk": n_bulk, "n_batch": n_batch,
        "train_once_s": round(t_train, 2),
        "bulk_trigger_s": round(t_bulk, 2),
        "delta_trigger_s": round(t_delta, 2),
        "full_reprop_s": round(t_full, 2),
        "delta_vs_full": round(t_delta / t_full, 3),
        "rows_state": n_state, "rows_full": n_full,
    }))
    import shutil

    shutil.rmtree(state, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
