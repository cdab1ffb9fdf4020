"""Measure the `max_bucket` giant-bucket guard (queries/dedup.py):

(a) planted-duplicate corpus (realistic density): capped output must be
    IDENTICAL to uncapped — buckets are small, the cap never fires;
(b) 10x replicated saturation corpus (the curvature fixture from
    scripts/dedup_scale10.py): wall-clock win and pair loss from
    dropping oversized buckets, reported side by side.

    python scripts/minhash_bucket_cap.py
"""

from __future__ import annotations

import random
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CAP = 1000


def planted_corpus(spark, tmp: str, n_docs: int = 50_000):
    rng = random.Random(17)
    vocab = [f"w{i}" for i in range(50_000)]
    n_base = int(n_docs * 0.9)
    docs = []
    for i in range(n_base):
        docs.append((i, "web", " ".join(rng.sample(vocab, 20))))
    planted = set()
    for j in range(n_docs - n_base):
        doc_id = n_base + j
        src_id, _, text = docs[rng.randrange(n_base)]
        words = text.split(" ")
        for pos in rng.sample(range(20), 2):
            words[pos] = rng.choice(vocab)
        docs.append((doc_id, "web", " ".join(words)))
        planted.add((src_id, doc_id))
    spark.createDataFrame(
        docs, "doc_id bigint, source string, text string"
    ).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    return planted


def run(spark, sf_dir: str, max_bucket, planted=None):
    from zebra_spark.caching import release_caches
    from zebra_spark.queries.dedup import N_BANDS, N_HASHES, _minhash_pairs

    t0 = time.perf_counter()
    pairs = _minhash_pairs(spark, sf_dir, N_HASHES, N_BANDS, max_bucket=max_bucket)
    got = {(min(r.doc_a, r.doc_b), max(r.doc_a, r.doc_b)) for r in pairs.collect()}
    dt = time.perf_counter() - t0
    release_caches()
    rec = (
        f" planted-recall={len(got & planted) / max(1, len(planted)):.3f}"
        if planted is not None
        else ""
    )
    print(f"  max_bucket={max_bucket}: {dt:6.1f}s, {len(got):,} pairs{rec}", flush=True)
    return got


def main() -> None:
    import zebra_spark
    from zebra_spark.session import get_spark
    from scripts.dedup_scale10 import replicated

    zebra_spark.load_all_queries()
    spark = get_spark("minhash-cap", cpus="32")

    tmp = tempfile.mkdtemp(prefix="cap_planted_")
    planted = planted_corpus(spark, tmp)
    print("== planted 50k corpus ==", flush=True)
    full = run(spark, tmp, None, planted)
    capped = run(spark, tmp, CAP, planted)
    print(f"  identical: {full == capped}")
    shutil.rmtree(tmp, ignore_errors=True)

    tmp = tempfile.mkdtemp(prefix="cap_x10_")
    replicated(spark, "/root/testdata/sf0.1", 10, tmp)
    print("== 10x replicated saturation corpus ==", flush=True)
    full = run(spark, tmp, None)
    capped = run(spark, tmp, CAP)
    lost = len(full - capped)
    print(
        f"  pairs lost to cap: {lost:,} of {len(full):,} "
        f"({lost / max(1, len(full)):.1%})"
    )
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
