"""Skew evidence for the bucketed-rank decomposition (r10): the
q_mix_rebalance / q_token_budget_sample dossier entries claim the
hash-range decomposition avoids the one-task-per-language skew a
window partitioned on the group key alone would have.  This harness
measures exactly that kernel head-to-head on synthetic corpora:

  naive:    row_number() OVER (PARTITION BY lang ORDER BY hv, id)
            — |langs| active partitions, the dominant language's whole
            slice sorted in ONE task;
  bucketed: per-(lang, bkt) rank + broadcast prefix counts, windows
            over |langs| x 1024 well-distributed keys (bit-equal
            membership — pinned by the 6-seed differential fuzz in
            tests/test_fuzz_parity.py).

Both paths take the quota from a JOINED per-language frame — the real
query's shape (quotas derive from counts), which is exactly what
disqualifies WindowGroupLimit: with a literal quota Spark rank-limits
the naive window into a per-task top-k heap and the skew never bites,
but a data-dependent quota forces the full per-language sort.  Both
sides count the kept rows (identical counts assert the equivalence).

    python scripts/mix_skew_check.py [base_rows]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SPLIT_A = 1_103_515_245
SPLIT_M = 2_147_483_648
N_BUCKETS = 1024
BUCKET_DIV = SPLIT_M // N_BUCKETS
# en dominates at 50% — the skew the naive window serializes
LANG_MOD = [("en", 0, 2), ("de", 1, 8), ("es", 3, 8),
            ("fr", 5, 8), ("zh", 7, 8)]
QUOTA = 1000  # fixed per-language keep


def main() -> None:
    base = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    from zebra_spark.session import get_spark

    spark = get_spark("mix-skew-check")

    lang = None
    for name, rem, mod in LANG_MOD:
        cond = (F.col("id") % mod) == rem
        lang = F.when(cond, name) if lang is None else lang.when(cond, name)
    lang = lang.otherwise("en")

    results = []
    for mult in (1, 3, 10):
        n = base * mult
        d = (
            spark.range(n)
            .select(
                "id",
                lang.alias("lang"),
                (((F.col("id") % SPLIT_M) * SPLIT_A + 98765) % SPLIT_M)
                .alias("hv"),
            )
            .localCheckpoint()
        )

        quota = spark.createDataFrame(
            [(name, QUOTA) for name, _, _ in LANG_MOD], "lang string, q int"
        )

        t0 = time.perf_counter()
        wn = Window.partitionBy("lang").orderBy("hv", "id")
        naive = (
            d.withColumn("rk", F.row_number().over(wn))
            .join(F.broadcast(quota), "lang")
            .filter(F.col("rk") <= F.col("q"))
            .count()
        )
        naive_s = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        d2 = d.withColumn("bkt", F.expr(f"hv div {BUCKET_DIV}"))
        wpre = (
            Window.partitionBy("lang")
            .orderBy("bkt")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        pre = (
            d2.groupBy("lang", "bkt")
            .agg(F.count(F.lit(1)).alias("nb"))
            .withColumn(
                "before", F.coalesce(F.sum("nb").over(wpre), F.lit(0))
            )
            .select("lang", "bkt", "before")
        )
        wrk = Window.partitionBy("lang", "bkt").orderBy("hv", "id")
        bucketed = (
            d2.withColumn("rkb", F.row_number().over(wrk))
            .join(F.broadcast(pre), ["lang", "bkt"])
            .join(F.broadcast(quota), "lang")
            .filter(F.col("before") + F.col("rkb") <= F.col("q"))
            .count()
        )
        bucketed_s = round(time.perf_counter() - t0, 3)

        assert naive == bucketed, (naive, bucketed)
        row = {
            "rows": n,
            "kept": naive,
            "naive_s": naive_s,
            "bucketed_s": bucketed_s,
        }
        results.append(row)
        print(json.dumps(row), flush=True)
        d.unpersist()

    print(json.dumps({"base": base, "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
