"""Empty-fixture robustness for the r7 query additions: an empty table
must yield empty (or zero-count) output with the schema intact, never
a crash — the contract the dedup suite already pins via
test_pair_table_empty_corpus, extended to the new operators."""

from __future__ import annotations

import pytest

import zebra_spark

zebra_spark.load_all_queries()

DOCS_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"
ORDERS_SCHEMA = (
    "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)


@pytest.fixture()
def empty_dir(spark, tmp_path):
    d = str(tmp_path / "empty_sf")
    spark.createDataFrame([], DOCS_SCHEMA).write.parquet(f"{d}/documents.parquet")
    spark.createDataFrame([], ORDERS_SCHEMA).write.parquet(f"{d}/orders.parquet")
    return d


def test_text_audits_on_empty_corpus(spark, empty_dir):
    for name in ("q_heavy_hitters", "q_source_entropy"):
        out = zebra_spark.QUERIES[name](spark, empty_dir).toPandas()
        assert len(out) == 0, name
    from zebra_spark.caching import release_caches

    release_caches()


def test_triangles_on_empty_corpus(spark, empty_dir):
    out = zebra_spark.QUERIES["q_graph_triangles"](spark, empty_dir).toPandas()
    from zebra_spark.caching import release_caches

    release_caches()
    assert len(out) == 1
    assert out.n_triangles.iloc[0] == 0 and out.n_edges.iloc[0] == 0


def test_table_profile_on_empty_orders(spark, empty_dir):
    out = zebra_spark.QUERIES["q_table_profile"](spark, empty_dir).toPandas()
    assert list(out.columns) == [
        "col_name", "n_rows", "n_null", "n_distinct", "min_num", "max_num"
    ]
    assert len(out) == 6
    assert (out.n_rows == 0).all() and (out.n_distinct == 0).all()
