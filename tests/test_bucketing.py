"""Bucketed-join contract: joining two tables bucketed on the join key
produces a plan with NO shuffle exchange (the scale payoff), and the
result matches the plain-parquet join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    from zebra_spark.bucketing import write_bucketed
    from zebra_spark.io import load

    base = tmp_path_factory.mktemp("bucketed")
    orders = load(spark, SF_ORACLE, "orders")
    lineitem = load(spark, SF_ORACLE, "lineitem")
    write_bucketed(
        orders, "orders_b", str(base / "orders"), ["o_orderkey"], 8,
        sort_keys=["o_orderkey"],
    )
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b", str(base / "lineitem"), ["o_orderkey"], 8,
        sort_keys=["o_orderkey"],
    )
    yield
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    a = spark.table("orders_b")
    b = spark.table("lineitem_b")
    joined = a.hint("merge").join(b, "o_orderkey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:2000]


def test_bucketed_join_matches_plain(spark, bucketed):
    from zebra_spark.io import load

    bucketed_n = (
        spark.table("orders_b")
        .hint("merge")
        .join(spark.table("lineitem_b"), "o_orderkey")
        .count()
    )
    plain_n = (
        load(spark, SF_ORACLE, "orders")
        .join(
            load(spark, SF_ORACLE, "lineitem").withColumnRenamed(
                "l_orderkey", "o_orderkey"
            ),
            "o_orderkey",
        )
        .count()
    )
    assert bucketed_n == plain_n


def test_bucketed_agg_has_no_exchange(spark, bucketed):
    agg = spark.table("orders_b").groupBy("o_orderkey").agg(
        F.sum("o_totalprice").alias("t")
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:2000]
