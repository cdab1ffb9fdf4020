"""10x scale check for the unseen-batch assignment delta (r8): does
cosine_assign_delta really cost |batch| x |seeds|, not a corpus pass?

Replicates the sf0.1 embeddings corpus 1x/3x/10x (vec_id offset +
hash-jittered components, native expressions), HOLDS OUT a fixed batch
(generation-0 vec_id % 10 == 0) from the corpus file, then at each
scale measures

- the full assignment-table build (corpus x seeds, one-time per
  snapshot),
- cosine_assign_delta for the held-out batch against the
  corpus-frozen seeds (|batch| x |seeds| — the ingest steady state),
- cosine_pair_table_delta(new_vectors=batch) end-to-end (assignment +
  cell join + scoring).

The claim under test: build time grows with corpus x seeds; the
assignment delta for a fixed batch grows only through the seed count
(n/50), so delta/build keeps falling with scale — the 100 TB
justification for maintaining the assignment instead of re-assigning
the corpus per ingest.

Not part of the test suite (runtime); results recorded in SCALING.md.

    python scripts/assign_delta_scale10.py
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

STRIDE = 10_000_000


def replicated_embeddings(spark, sf_dir: str, k_copies: int, out: str) -> int:
    """embeddings x k_copies MINUS the held-out batch: generation 0
    keeps only vec_id % 10 != 0 (the rest is the fixed ingest batch);
    generation k>0 offsets vec_id by k*STRIDE and jitters every
    component by a small hash-derived amount (native expressions)."""
    from zebra_spark.io import load

    base = load(spark, sf_dir, "embeddings")
    gens = [base.filter(F.col("vec_id") % 10 != 0)]
    for k in range(1, k_copies):
        gens.append(
            base.withColumn(
                "vec_id", F.col("vec_id") + F.lit(k * STRIDE)
            ).withColumn(
                "embedding",
                F.expr(
                    f"transform(embedding, (x, i) -> CAST(x + 0.01 * "
                    f"pmod(xxhash64(i, {k}), 7) AS FLOAT))"
                ),
            )
        )
    df = gens[0]
    for g in gens[1:]:
        df = df.unionByName(g)
    df.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    return spark.read.parquet(f"{out}/embeddings.parquet").count()


def main() -> None:
    import zebra_spark
    from zebra_spark.caching import release_caches
    from zebra_spark.io import embeddings_d
    from zebra_spark.queries import dedup as dd
    from zebra_spark.session import get_spark

    zebra_spark.load_all_queries()
    spark = get_spark("assign-delta-scale10", cpus="32")
    sf = "/root/testdata/sf0.1"
    batch = (
        embeddings_d(spark, sf)
        .select("vec_id", "emb")
        .filter(F.col("vec_id") % 10 == 0)
        .localCheckpoint()
    )
    n_batch = batch.count()

    out: dict[str, dict] = {}
    for k in (1, 3, 10):
        d = tempfile.mkdtemp(prefix=f"assign10_x{k}_")
        try:
            n_vecs = replicated_embeddings(spark, sf, k, d)
            t0 = time.perf_counter()
            n_assign = dd.cosine_assign_table(spark, d).count()
            t_build = round(time.perf_counter() - t0, 2)
            n_seeds = dd.cosine_seed_table(spark, d).count()
            release_caches()

            t0 = time.perf_counter()
            n_delta = dd.cosine_assign_delta(spark, d, batch).count()
            t_assign = round(time.perf_counter() - t0, 2)
            release_caches()

            t0 = time.perf_counter()
            n_pairs = dd.cosine_pair_table_delta(
                spark, d, new_vectors=batch
            ).count()
            t_pairs = round(time.perf_counter() - t0, 2)
            release_caches()
            out[f"x{k}"] = {
                "n_vecs": n_vecs,
                "n_seeds": n_seeds,
                "n_batch": n_batch,
                "n_assign": n_assign,
                "n_assign_delta": n_delta,
                "n_pair_delta": n_pairs,
                "build_s": t_build,
                "assign_delta_s": t_assign,
                "pair_delta_s": t_pairs,
                "assign_over_build": round(t_assign / t_build, 3),
            }
        finally:
            shutil.rmtree(d, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
