"""Bucketed tables: shuffle-free co-located joins and aggregations.

At 100 TB, the fact-to-fact joins (orders ⋈ lineitem, events ⋈ events)
are the shuffles that dominate; bucketing both sides by the join key at
write time makes every later join/agg on that key a zero-exchange local
operation.  This module is the write-side contract; the test asserts the
payoff (no Exchange in the join plan).

Catalog note: bucket metadata lives in the session catalog
(saveAsTable), so readers must go through spark.table(name), not raw
parquet paths — raw-path reads see plain files and lose the bucketing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_keys: list[str],
    num_buckets: int = 16,
    sort_keys: list[str] | None = None,
) -> None:
    """Write df as a bucketed (and optionally sorted) parquet table.

    sort_keys additionally sorts within buckets — joins then skip both
    the exchange AND the sort (bucketed SMJ reads pre-sorted runs).
    """
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(num_buckets, *bucket_keys)
    )
    if sort_keys:
        writer = writer.sortBy(*sort_keys)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
