"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``zebra_spark/``; this file only adapts the
registry to the driver's calling convention.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

import zebra_spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: exact kNN — brute-force
    top-10 nearest neighbours (L2^2, native array expressions, broadcast
    query side) for 10 query vectors over the embeddings corpus."""
    from zebra_spark.queries.vector import knn_exact

    return knn_exact(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    zebra_spark.load_all_queries()
    return dict(zebra_spark.QUERIES)


def oracle_sql() -> dict[str, str]:
    zebra_spark.load_all_queries()
    return dict(zebra_spark.ORACLES)
