"""Partitioned-layout contract: a date-range predicate on a
year-partitioned table prunes partitions in the plan (the 100 TB scan
lever), and results match the unpartitioned read."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def part_lineitem(spark, tmp_path_factory):
    from zebra_spark.io import load
    from zebra_spark.layout import write_partitioned_by_year

    out = str(tmp_path_factory.mktemp("layout") / "lineitem_by_year")
    write_partitioned_by_year(
        load(spark, SF_ORACLE, "lineitem"), out, "l_shipdate",
        sort_cols=["l_shipdate"],
    )
    return out


def test_partition_pruning_in_plan(spark, part_lineitem):
    df = spark.read.parquet(part_lineitem).filter(
        (F.col("_year") >= 1997) & (F.col("_year") <= 1998)
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the scan must carry partition filters on _year
    assert "PartitionFilters" in plan
    assert "_year" in plan.split("PartitionFilters")[1][:200]


def test_partitioned_matches_plain(spark, part_lineitem):
    from zebra_spark.io import load

    pruned = (
        spark.read.parquet(part_lineitem)
        .filter((F.col("_year") >= 1997) & (F.col("_year") <= 1998))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("q"),
        )
        .collect()[0]
    )
    plain = (
        load(spark, SF_ORACLE, "lineitem")
        .filter(F.year("l_shipdate").between(1997, 1998))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("q"),
        )
        .collect()[0]
    )
    assert (pruned.n, pruned.q) == (plain.n, plain.q)
    assert pruned.n > 0
