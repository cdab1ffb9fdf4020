"""Export takedown scale check (r11): the affected-epoch-only claim,
measured.  export_epoch_takedown rewrites only the epoch dirs holding
a taken-down doc, so a FIXED takedown (confined to one epoch) should
cost the same no matter how many other epochs the export holds.

Builds an epoch-major export of E epochs x N rows for growing E, then
times a takedown whose ids all live in epoch 0.

    python scripts/export_takedown_scale.py [epoch_rows] [epochs ...]
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
    epoch_counts = [int(a) for a in sys.argv[2:]] or [4, 8, 12]

    from zebra_spark.queries.text import (
        export_epoch_append,
        export_epoch_takedown,
    )
    from zebra_spark.session import get_spark

    spark = get_spark("export-takedown-scale", cpus="16")
    base = tempfile.mkdtemp(prefix="zebra_export_td_scale_")
    results = {"epoch_rows": epoch_rows, "rows": []}
    try:
        for n_epochs in epoch_counts:
            out = f"{base}/e{n_epochs}"
            for k in range(n_epochs):
                export_epoch_append(
                    spark, out, synth_docs(spark, epoch_rows, k * epoch_rows), k
                )
            # fixed takedown: ~1% of epoch 0 only
            ids = (
                spark.range(0, epoch_rows)
                .filter(F.col("id") % 97 == 0)
                .select(F.col("id").alias("doc_id"))
            )
            t0 = time.perf_counter()
            affected = export_epoch_takedown(spark, out, ids)
            dt = round(time.perf_counter() - t0, 2)
            assert affected == [0], affected
            results["rows"].append(
                {"n_epochs": n_epochs,
                 "corpus_rows": epoch_rows * n_epochs,
                 "takedown_s": dt}
            )
            print(json.dumps(results["rows"][-1]))
        print(json.dumps(results))
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
