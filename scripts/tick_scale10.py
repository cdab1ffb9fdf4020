"""10x scale check for the FULL nightly tick (r9, VERDICT r8 #5):
ingest_then_audit end-to-end at x1/x3/x10 corpus scale with a FIXED
ingest batch, recording the cost split the composite's scaling claim
rests on.

Corpus replication (native expressions, no driver loops):
- generation 0 ships the sf0.1 documents/embeddings verbatim — its
  doc_id/vec_id % 10 == 0 rows are the tick's conventional batch;
- generations k>0 offset ids by k*STRIDE and EXCLUDE their % 10 == 0
  rows, so the batch stays FIXED while the base corpus grows ~x k;
- replica documents get a per-generation vocabulary prefix on every
  word (disjoint token space -> the near-dup structure replicates
  per-shard instead of exploding quadratically across generations);
  replica embeddings get hash-jittered components.

Split reported per scale:
- delta_s: the three batch-proportional delta joins alone — the
  production steady-state component; stays ~flat as the corpus grows
  (it scales through seed count and bucket/cell sizes, not corpus
  rows).
- update_s: deltas + base construction + maintained writes.  The
  fixture tick REBUILDS base tables and writes base ∪ delta in full
  because there is no pre-existing maintained state; production
  appends the delta to maintained parquet, so this component is
  scaffolding and grows with the corpus by construction.
- audit_s: the ten audit sections over the maintained files —
  bounded aggregations, expected sublinear in corpus size.

Not part of the test suite (runtime); results recorded in SCALING.md.

    python scripts/tick_scale10.py
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


def replicated_corpus(spark, sf_dir: str, k_copies: int, out: str) -> dict:
    from zebra_spark.io import load

    docs = load(spark, sf_dir, "documents")
    embs = load(spark, sf_dir, "embeddings")
    dgens, egens = [docs], [embs]
    for k in range(1, k_copies):
        dgens.append(
            docs.filter(F.col("doc_id") % 10 != 0)
            .withColumn("doc_id", F.col("doc_id") + F.lit(k * STRIDE))
            .withColumn(
                "text",
                F.expr(
                    f"array_join(transform(split(text, ' '), "
                    f"w -> concat('g{k}x', w)), ' ')"
                ),
            )
        )
        egens.append(
            embs.filter(F.col("vec_id") % 10 != 0)
            .withColumn("vec_id", F.col("vec_id") + F.lit(k * STRIDE))
            .withColumn(
                "embedding",
                F.expr(
                    f"transform(embedding, (x, i) -> CAST(x + 0.01 * "
                    f"pmod(xxhash64(i, {k}), 7) AS FLOAT))"
                ),
            )
        )
    d = dgens[0]
    for g in dgens[1:]:
        d = d.unionByName(g)
    e = egens[0]
    for g in egens[1:]:
        e = e.unionByName(g)
    d.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    e.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    return {
        "n_docs": spark.read.parquet(f"{out}/documents.parquet").count(),
        "n_vecs": spark.read.parquet(f"{out}/embeddings.parquet").count(),
    }


def main() -> None:
    import zebra_spark
    from zebra_spark.caching import release_caches
    from zebra_spark.queries.audit import ingest_then_audit
    from zebra_spark.session import get_spark

    zebra_spark.load_all_queries()
    spark = get_spark("tick-scale10", cpus="32")
    sf = "/root/testdata/sf0.1"

    out: dict[str, dict] = {}
    for k in (1, 3, 10):
        d = tempfile.mkdtemp(prefix=f"tick10_x{k}_")
        wd = tempfile.mkdtemp(prefix=f"tick10_work_x{k}_")
        try:
            counts = replicated_corpus(spark, sf, k, d)
            timings: dict = {}
            t0 = time.perf_counter()
            frames = ingest_then_audit(spark, d, wd, timings=timings)
            total = round(time.perf_counter() - t0, 2)
            out[f"x{k}"] = {
                **counts,
                "total_s": total,
                "delta_s": timings.get("delta_s"),
                "update_s": timings.get("update_s"),
                "audit_s": timings.get("audit_s"),
                "reseed_triggered": timings.get("reseed_triggered"),
                "n_sections": len(frames),
            }
        finally:
            release_caches()
            shutil.rmtree(d, ignore_errors=True)
            shutil.rmtree(wd, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
