from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_SMOKE = os.environ.get("ZEBRA_TEST_SF_SMOKE", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("ZEBRA_TEST_SF_ORACLE", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from zebra_spark.session import get_spark

    # 8 threads / 8 shuffle partitions: the suite is hundreds of tiny
    # jobs; A/B runs showed 16 threads (and 16 shuffle partitions, and
    # AQE off, and codegen off) all measurably WORSE — per-job fixed
    # overhead dominates, and wider configs only add task scheduling.
    s = get_spark("zebra-tests", cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_ORACLE}/{t}.parquet')"
        )
    yield con
    con.close()
