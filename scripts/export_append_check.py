"""Export update-story measurement (r11, VERDICT r10 #2): price the
two publish paths head-to-head on a synthetic corpus so the contract
decision rests on numbers, not assertion.

  full-rewrite (interleaved order): export_training_shards over the
      WHOLE corpus per publish — corpus shuffle + corpus write;
  epoch-append (epoch-major order): export_epoch_append of ONE new
      epoch onto an existing export — batch shuffle + batch write +
      a partition-pruned footer count for the offsets.

The claim under test: full-rewrite cost grows with the corpus while
the append cost tracks the BATCH, so with corpus = E epochs the
rewrite is ~E x the append — the amortization argument in SCALING.md
("exports are periodic, ticks are per-batch") quantified.

    python scripts/export_append_check.py [epoch_rows] [n_epochs]
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


def synth_docs(spark, n_rows: int, offset: int):
    """(doc_id, text, n_chars) — ~60-char deterministic docs."""
    return (
        spark.range(offset, offset + n_rows)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("synthetic document body word "),
                F.col("id").cast("string"),
                F.lit(" tail filler tokens for export sizing"),
            ).alias("text"),
        )
        .withColumn("n_chars", F.length("text"))
    )


def main() -> None:
    epoch_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    n_epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from zebra_spark.session import get_spark
    from zebra_spark.queries.text import (
        export_epoch_append,
        export_training_shards,
    )

    spark = get_spark("export-append-check", cpus="16")
    base = tempfile.mkdtemp(prefix="zebra_export_check_")
    results = {"epoch_rows": epoch_rows, "n_epochs": n_epochs,
               "append_s": [], "rewrite_s": []}
    try:
        # corpus lake: n_epochs disjoint epoch slices, materialized so
        # generation cost stays out of the timings
        lake = f"{base}/lake"
        for k in range(n_epochs):
            synth_docs(spark, epoch_rows, k * epoch_rows).write.mode(
                "append"
            ).parquet(lake)
        corpus = spark.read.parquet(lake)

        # epoch-append: publish each epoch onto the growing export
        inc = f"{base}/inc"
        for k in range(n_epochs):
            batch = corpus.filter(
                (F.col("doc_id") >= k * epoch_rows)
                & (F.col("doc_id") < (k + 1) * epoch_rows)
            )
            t0 = time.perf_counter()
            export_epoch_append(spark, inc, batch, k)
            results["append_s"].append(round(time.perf_counter() - t0, 2))

        # full rewrite: publish the WHOLE corpus-so-far after each
        # epoch lands (what the interleaved contract costs per publish)
        full = f"{base}/full"
        for k in range(n_epochs):
            so_far = corpus.filter(F.col("doc_id") < (k + 1) * epoch_rows)
            # export_training_shards reads documents from a dir; write
            # the slice as a corpus dir the loader accepts
            sf = f"{base}/sf{k}"
            so_far.write.mode("overwrite").parquet(
                f"{sf}/documents.parquet"
            )
            t0 = time.perf_counter()
            export_training_shards(spark, sf, f"{full}/pub{k}")
            results["rewrite_s"].append(round(time.perf_counter() - t0, 2))

        # equivalence spot-check: the final incremental export holds
        # every doc exactly once
        n_inc = spark.read.parquet(inc).count()
        assert n_inc == epoch_rows * n_epochs, n_inc
        results["rows_final"] = n_inc
        print(json.dumps(results))
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
