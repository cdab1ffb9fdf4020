"""Throughput probe beyond the fixtures: generate a 50M-row synthetic
fact table + 1M-row dimension, write parquet, then measure scan+agg
(TPC-H-Q1 shape) and join+agg throughput on local[32].

Results recorded in SCALING.md.  Usage:
    python scripts/throughput_check.py [n_fact_millions]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(n_millions: int = 50) -> None:
    from pyspark.sql import functions as F

    from zebra_spark.session import get_spark

    spark = get_spark("throughput", cpus="32")
    n = n_millions * 1_000_000
    out = tempfile.mkdtemp(prefix="zebra_tp_")
    try:
        fact = (
            spark.range(n)
            .select(
                F.col("id").alias("k"),
                F.pmod(F.xxhash64("id"), F.lit(1_000_000)).alias("dim_k"),
                (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(5000)) / 100.0 + 1.0).alias("qty"),
                (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(900000)) / 100.0 + 900.0).alias("price"),
                (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(10000)) / 100000.0).alias("disc"),
                F.element_at(
                    F.array(F.lit("A"), F.lit("N"), F.lit("R")),
                    (F.pmod(F.xxhash64("id", F.lit(4)), F.lit(3)) + 1).cast("int"),
                ).alias("flag"),
            )
        )
        t0 = time.perf_counter()
        fact.write.mode("overwrite").parquet(f"{out}/fact")
        t_write = time.perf_counter() - t0

        dim = spark.range(1_000_000).select(
            F.col("id").alias("dim_k"),
            F.pmod(F.xxhash64("id", F.lit(9)), F.lit(25)).alias("nation"),
        )
        dim.write.mode("overwrite").parquet(f"{out}/dim")

        f2 = spark.read.parquet(f"{out}/fact")
        d2 = spark.read.parquet(f"{out}/dim")

        t0 = time.perf_counter()
        f2.groupBy("flag").agg(
            F.sum("qty"), F.sum(F.col("price") * (1 - F.col("disc"))),
            F.avg("price"), F.count(F.lit(1)),
        ).collect()
        t_agg = time.perf_counter() - t0

        t0 = time.perf_counter()
        f2.join(d2, "dim_k").groupBy("nation", "flag").agg(
            F.sum("price").alias("s"), F.count(F.lit(1)).alias("c")
        ).collect()
        t_join = time.perf_counter() - t0

        print(
            f"n={n:,} write={t_write:.1f}s "
            f"scan+agg={t_agg:.1f}s ({n / t_agg / 1e6:.0f}M rows/s) "
            f"join+agg={t_join:.1f}s ({n / t_join / 1e6:.0f}M rows/s)"
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 50)
