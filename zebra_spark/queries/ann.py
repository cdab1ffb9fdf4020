"""Similarity-search suite (rows-only entries): the LSH ANN path and its
diagnostics.  Brute-force kNN (the oracle) lives in queries.vector.

These are registered WITHOUT oracle SQL — the driver records rows-only
checks; PySpark-side tests assert the strong invariants (recall@10 >= 0.9
vs q_knn_exact, seeded determinism) in tests/test_lsh.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from zebra_spark.registry import query

_INDEX_CACHE: dict[tuple, object] = {}


def get_index(spark: SparkSession, sf_dir: str, num_trees: int = 15, seed: int = 42):
    from zebra_spark.index.lsh import LSHIndex

    key = (id(spark), sf_dir, num_trees, seed)
    if key not in _INDEX_CACHE:
        _INDEX_CACHE[key] = LSHIndex.build(
            spark, sf_dir, num_trees=num_trees, seed=seed
        )
    return _INDEX_CACHE[key]


@query("q_knn_lsh")
def q_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-10 for the first 10 corpus vectors via the seeded LSH
    forest (candidate bucket join + exact re-rank).  Rows-only: the
    recall>=0.9-vs-exact assertion lives in tests/test_lsh.py."""
    idx = get_index(spark, sf_dir)
    return idx.search_ids(range(10), k=10)


@query("q_lsh_bucket_counts")
def q_lsh_bucket_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-size histogram of the seeded forest — deterministic under
    the fixed seed; golden-checked in tests/test_lsh.py."""
    idx = get_index(spark, sf_dir)
    return idx.bucket_counts()
