"""MinHash dedup-pipeline scale check: synthetic corpus with PLANTED
near-duplicates, well beyond the fixtures and — unlike them — with a
realistic duplicate density (a few % instead of saturation).  Measures
wall-clock and planted-pair recall/precision for the full pipeline
(signatures -> band candidates -> verify -> connected components).

Not part of the test suite (runtime); results recorded in SCALING.md.

    python scripts/dedup_scale_check.py [n_docs] [dup_fraction]
"""

from __future__ import annotations

import random
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(n_docs: int = 50_000, dup_fraction: float = 0.1) -> None:
    import zebra_spark
    from zebra_spark.session import get_spark

    zebra_spark.load_all_queries()
    spark = get_spark("dedup-scale", cpus="32")

    rng = random.Random(17)
    vocab = [f"w{i}" for i in range(50_000)]
    n_base = int(n_docs * (1 - dup_fraction))
    docs = []
    for i in range(n_base):
        words = rng.sample(vocab, 20)
        docs.append((i, "web", " ".join(words)))
    planted = set()
    for j in range(n_docs - n_base):
        doc_id = n_base + j
        src_id, _, text = docs[rng.randrange(n_base)]
        words = text.split(" ")
        # perturb 2 of 20 tokens -> Jaccard = 18/22 ~ 0.82 >= 0.5
        for pos in rng.sample(range(20), 2):
            words[pos] = rng.choice(vocab)
        docs.append((doc_id, "web", " ".join(words)))
        planted.add((src_id, doc_id))

    import tempfile

    tmp = tempfile.mkdtemp(prefix="dedup_scale_")
    spark.createDataFrame(
        docs, "doc_id bigint, source string, text string"
    ).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")

    t0 = time.perf_counter()
    pairs = zebra_spark.QUERIES["q_dedup_minhash"](spark, tmp)
    got = {(min(r.doc_a, r.doc_b), max(r.doc_a, r.doc_b)) for r in pairs.collect()}
    t_pairs = time.perf_counter() - t0

    t0 = time.perf_counter()
    clusters = zebra_spark.QUERIES["q_dedup_clusters"](spark, tmp)
    n_kept = clusters.filter("keep = 1").count()
    t_clusters = time.perf_counter() - t0

    hit = len(got & planted)
    print(
        f"n_docs={n_docs} planted_dups={len(planted)}\n"
        f"minhash pairs: {t_pairs:.1f}s, {len(got)} pairs emitted, "
        f"planted-pair recall={hit / max(1, len(planted)):.3f}, "
        f"precision={hit / max(1, len(got)):.3f}\n"
        f"clusters: {t_clusters:.1f}s, kept {n_kept}/{n_docs} docs "
        f"({n_docs - n_kept} removed as near-dups)"
    )
    spark.stop()


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.1
    main(n, frac)
