"""LSH index scale check: build + query on a synthetic corpus well
beyond the fixtures (default 50k x 64-d, clustered), measure build time,
query time, recall@10 vs brute force, and candidate efficiency.

Not part of the test suite (runtime); results recorded in SCALING.md.

    python scripts/lsh_scale_check.py [n_rows] [n_queries]
    python scripts/lsh_scale_check.py --big-splits [n_rows]

--big-splits (r16, VERDICT r15 #5) is the driver-RSS rung for the
adaptive build's bounded split loop: the corpus is generated
EXECUTOR-side (mapInPandas over spark.range — the driver never holds
the vectors), sized to push the split count ~10x past the 50k rung's
9.4k, and the run reports resplit_stats (rounds / splits / frozen /
cap deferrals) plus the driver's peak RSS before and after the build —
flat RSS across a 10x split count is the recorded evidence that the
per-round cap bounds driver memory."""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(n: int = 50_000, nq: int = 100, dim: int = 64) -> None:
    from pyspark.sql import functions as F

    from zebra_spark.index.lsh import LSHIndex
    from zebra_spark.queries.vector import knn_exact  # noqa: F401 (shape ref)
    from zebra_spark.session import get_spark

    spark = get_spark("lsh-scale", cpus="32")
    rng = np.random.default_rng(7)
    # clustered corpus: 100 Gaussian clusters (ANN-realistic, unlike the
    # uniform fixtures)
    centers = rng.standard_normal((100, dim)) * 3
    assign = rng.integers(0, 100, size=n)
    data = centers[assign] + rng.standard_normal((n, dim))
    rows = [(i, [float(x) for x in data[i]]) for i in range(n)]
    corpus = spark.createDataFrame(rows, "vec_id bigint, emb array<double>").cache()
    corpus.count()

    t0 = time.perf_counter()
    idx = LSHIndex.build(spark, sf_dir="", corpus=corpus, num_trees=15, seed=42)
    t_build = time.perf_counter() - t0
    depth = idx.normals.shape[1]

    qids = list(range(nq))
    t0 = time.perf_counter()
    ann = idx.search_ids(qids, k=10).toPandas()
    t_query = time.perf_counter() - t0

    # brute-force truth for the same queries
    q = corpus.filter(F.col("vec_id") < nq).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qe")
    )
    from pyspark.sql import Window

    from zebra_spark import functions as zf

    w = Window.partitionBy("query_id").orderBy("dist", "neighbor_id")
    t0 = time.perf_counter()
    exact = (
        corpus.crossJoin(F.broadcast(q))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            zf.l2sq(F.col("qe"), F.col("emb")).alias("dist"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .toPandas()
    )
    t_exact = time.perf_counter() - t0

    es = exact.groupby("query_id")["neighbor_id"].apply(set)
    as_ = ann.groupby("query_id")["neighbor_id"].apply(set)
    recall = float(
        np.mean([len(es[k] & as_.get(k, set())) / 10 for k in es.index])
    )
    n_cand = idx.index_df.join(
        F.broadcast(
            spark.createDataFrame(
                [tuple(int(v) for v in r)
                 for r in idx.probe_keys(
                     np.array([data[i] for i in qids]), probes=8
                 ).drop_duplicates().itertuples(index=False)],
                "query_id bigint, tree_id int, bucket_id bigint, nbits int",
            )
        ),
        ["tree_id", "bucket_id", "nbits"],
    ).select("query_id", "vec_id").distinct().count()
    print(
        f"n={n} dim={dim} depth={depth} trees=15 probes=8\n"
        f"build: {t_build:.1f}s  ann query ({nq}q): {t_query:.1f}s  "
        f"exact ({nq}q): {t_exact:.1f}s\n"
        f"recall@10: {recall:.3f}  avg candidates/query: {n_cand / nq:.0f} "
        f"({100 * n_cand / nq / n:.1f}% of corpus)"
    )

    # adaptive local re-split on the same clustered corpus
    t0 = time.perf_counter()
    adaptive = LSHIndex.build(
        spark, sf_dir="", corpus=corpus, num_trees=15, seed=42, adaptive=True
    )
    t_adapt = time.perf_counter() - t0
    sizes = adaptive.bucket_counts().toPandas()
    ann2 = adaptive.search_ids(qids, k=10).toPandas()
    as2 = ann2.groupby("query_id")["neighbor_id"].apply(set)
    recall2 = float(
        np.mean([len(es[k] & as2.get(k, set())) / 10 for k in es.index])
    )
    print(
        f"adaptive: build {t_adapt:.1f}s  splits={len(adaptive.split_meta)}  "
        f"p99 bucket={float(sizes['n'].quantile(0.99)):.0f} "
        f"(limit {16 * adaptive.options.max_node_size})  "
        f"max nbits={int(sizes['nbits'].max())} (base {depth})  "
        f"recall@10: {recall2:.3f}  resplit_stats={adaptive.resplit_stats}"
    )
    spark.stop()


def _rss_mb() -> float:
    """Driver peak RSS in MB (ru_maxrss is KB on Linux)."""
    import resource

    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def big_splits(n: int = 500_000, dim: int = 64) -> None:
    """The 10x-split driver-RSS rung (module docstring)."""
    import pandas as pd

    from zebra_spark.index.lsh import LSHIndex
    from zebra_spark.session import get_spark

    spark = get_spark("lsh-big-splits", cpus="32")

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            out = []
            for i in ids:
                # per-row seeded clustered vectors, executor-side: the
                # driver never materializes the corpus
                r = np.random.default_rng(int(i))
                c = int(i) % 100
                cr = np.random.default_rng(10_000 + c)
                out.append(
                    (cr.standard_normal(dim) * 3 + r.standard_normal(dim))
                    .tolist()
                )
            yield pd.DataFrame({"vec_id": ids, "emb": out})

    corpus = (
        spark.range(n)
        .repartition(64)
        .mapInPandas(gen, "vec_id bigint, emb array<double>")
        .cache()
    )
    corpus.count()
    rss0 = _rss_mb()
    t0 = time.perf_counter()
    idx = LSHIndex.build(
        spark, sf_dir="", corpus=corpus, num_trees=15, seed=42,
        adaptive=True,
    )
    t_build = time.perf_counter() - t0
    sizes = idx.bucket_counts().toPandas()
    rss1 = _rss_mb()
    print(
        f"big-splits: n={n} build {t_build:.1f}s  "
        f"splits={len(idx.split_meta)}  "
        f"resplit_stats={idx.resplit_stats}  "
        f"p99 bucket={float(sizes['n'].quantile(0.99)):.0f}  "
        f"rows={int(sizes['n'].sum())}  "
        f"driver RSS {rss0:.0f} -> {rss1:.0f} MB"
    )
    spark.stop()


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--big-splits"]
    if "--big-splits" in sys.argv[1:]:
        big_splits(int(args[0]) if args else 500_000)
    else:
        n = int(args[0]) if args else 50_000
        nq = int(args[1]) if len(args) > 1 else 100
        main(n, nq)
