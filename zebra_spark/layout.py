"""Data layout for scale: partitioned + sorted table writes.

At 100 TB the single biggest lever is never reading the data you don't
need: fact tables are written partitioned by a coarse time key (year or
month of the event/ship date) so date-range predicates prune entire
directories BEFORE any IO, and sorted within files so min/max page
stats prune row groups.  Pairs with bucketing.py (join co-location) and
the tree_id-partitioned LSH index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned_by_year(
    df: DataFrame,
    path: str,
    ts_col: str,
    sort_cols: list[str] | None = None,
) -> None:
    """Write df partitioned by year(ts_col) (directory-level pruning),
    optionally sorted within partitions (row-group stat pruning)."""
    out = df.withColumn("_year", F.year(ts_col))
    if sort_cols:
        out = out.sortWithinPartitions("_year", *sort_cols)
    out.write.mode("overwrite").partitionBy("_year").parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path).drop("_year")
