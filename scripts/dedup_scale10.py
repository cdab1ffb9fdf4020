"""Empirical 10x scale check for the flagship near-dup pipeline
(VERDICT r4 directive 3): replicate the sf0.1 documents corpus up to
10x with per-replica token perturbation, then measure q_dedup_minhash,
q_dedup_clusters and q_dedup_incremental at 1x / 3x / 10x and report
time-vs-rows curvature.

Replication is INPUT-side scaling: each replica generation k perturbs
~50% of tokens with generation-tagged replacements, so replicas are NOT
near-dups of their sources (J ~= 0.33 < 0.5 threshold) nor of their
siblings (J ~= 0.14), and the pair/cluster OUTPUT stays roughly constant
while the scanned/shingled/banded input grows 10x — the curvature of
the engine itself, not of the fixture's saturation-dense output.  (A
verbatim 10x copy would grow every near-dup clique 10x and the pair
output ~100x — quadratic in the DATA, telling us nothing about the
plan.)  Constant-density OUTPUT scaling is covered separately by
scripts/dedup_scale_check.py's planted-duplicate corpus.

Not part of the test suite (runtime); results recorded in SCALING.md.

    python scripts/dedup_scale10.py
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

STRIDE = 1_000_000_000


def replicated(spark, sf_dir: str, k_copies: int, out: str) -> int:
    """documents x k_copies: generation 0 verbatim, generation k>0 with
    doc_id offset k*STRIDE and ~half the tokens swapped for
    generation-tagged replacements (native expressions, no UDF)."""
    from zebra_spark.io import load

    base = load(spark, sf_dir, "documents")
    gens = []
    for k in range(k_copies):
        if k == 0:
            gens.append(base)
            continue
        perturbed = base.withColumn(
            "doc_id", F.col("doc_id") + F.lit(k * STRIDE)
        ).withColumn(
            "text",
            F.expr(
                f"array_join(transform(split(text, ' '), (w, i) -> "
                f"CASE WHEN pmod(xxhash64(w, i, {k}), 2) = 0 "
                f"THEN concat(w, '_r{k}') ELSE w END), ' ')"
            ),
        )
        gens.append(perturbed)
    df = gens[0]
    for g in gens[1:]:
        df = df.unionByName(g)
    df.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return spark.read.parquet(f"{out}/documents.parquet").count()


def main() -> None:
    import zebra_spark
    from zebra_spark.caching import release_caches
    from zebra_spark.session import get_spark

    zebra_spark.load_all_queries()
    spark = get_spark("dedup-scale10", cpus="32")
    sf = "/root/testdata/sf0.1"

    names = ["q_dedup_minhash", "q_dedup_clusters", "q_dedup_incremental"]
    results: dict[int, dict] = {}
    for k in (1, 3, 10):
        out = tempfile.mkdtemp(prefix=f"dedup10_x{k}_")
        n_rows = replicated(spark, sf, k, out)
        row: dict = {"rows": n_rows}
        for name in names:
            t0 = time.perf_counter()
            n_out = zebra_spark.QUERIES[name](spark, out).count()
            row[name] = round(time.perf_counter() - t0, 1)
            row[f"{name}_out"] = n_out
            release_caches()
        results[k] = row
        print(f"x{k}: {row}", flush=True)
        shutil.rmtree(out, ignore_errors=True)

    print("\ncurvature (time ratio / rows ratio; 1.0 = perfectly linear):")
    base = results[1]
    for k in (3, 10):
        r = results[k]
        rows_ratio = r["rows"] / base["rows"]
        for name in names:
            t_ratio = r[name] / max(base[name], 0.1)
            print(
                f"  x{k} {name}: time x{t_ratio:.1f} over rows x{rows_ratio:.1f}"
                f" -> curvature {t_ratio / rows_ratio:.2f}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
