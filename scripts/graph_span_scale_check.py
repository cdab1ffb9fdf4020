"""Scale check for the round-5 graph/span ops on a REALISTIC planted
near-dup corpus (same generator family as dedup_scale_check: ~10%
duplicates, not the saturation fixture): measures q_text_dup_spans and
q_graph_pagerank wall-clock at two corpus sizes and reports the growth
ratio vs the size ratio (near-linear expected — both pipelines are
per-row expressions + bounded-key shuffles over the banded candidate
machinery).

Not part of the test suite (runtime); results recorded in SCALING.md.

    python scripts/graph_span_scale_check.py [n_small] [n_large]
"""

from __future__ import annotations

import random
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def make_corpus(spark, n_docs: int, dup_fraction: float = 0.1) -> str:
    rng = random.Random(17)
    vocab = [f"w{i}" for i in range(50_000)]
    n_base = int(n_docs * (1 - dup_fraction))
    docs = []
    for i in range(n_base):
        docs.append((i, "web", " ".join(rng.sample(vocab, 20))))
    for j in range(n_docs - n_base):
        doc_id = n_base + j
        _, _, text = docs[rng.randrange(n_base)]
        words = text.split(" ")
        for pos in rng.sample(range(20), 2):
            words[pos] = rng.choice(vocab)
        docs.append((doc_id, "web", " ".join(words)))
    tmp = tempfile.mkdtemp(prefix="graph_span_scale_")
    spark.createDataFrame(
        docs, "doc_id bigint, source string, text string"
    ).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    return tmp


def main(n_small: int = 50_000, n_large: int = 200_000) -> None:
    import zebra_spark
    from zebra_spark.caching import release_caches
    from zebra_spark.session import get_spark

    zebra_spark.load_all_queries()
    spark = get_spark("graph-span-scale", cpus="32")

    results: dict[tuple[str, int], float] = {}
    for n_docs in (n_small, n_large):
        tmp = make_corpus(spark, n_docs)
        try:
            for name in ("q_text_dup_spans", "q_graph_pagerank"):
                t0 = time.perf_counter()
                rows = zebra_spark.QUERIES[name](spark, tmp).count()
                release_caches()
                dt = time.perf_counter() - t0
                results[(name, n_docs)] = dt
                print(f"{name} n_docs={n_docs}: {dt:.1f}s, {rows} rows")
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    ratio = n_large / n_small
    for name in ("q_text_dup_spans", "q_graph_pagerank"):
        g = results[(name, n_large)] / max(results[(name, n_small)], 1e-9)
        print(
            f"{name}: {ratio:.0f}x docs -> {g:.1f}x time "
            f"(curvature {g / ratio:.2f}; <=1 is sub-linear)"
        )
    spark.stop()


if __name__ == "__main__":
    a = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    main(a, b)
