"""Differential tests: every hash-checked query's PySpark implementation
vs its DuckDB oracle at sf0.01 — mirrors the driver's CORRECTNESS gate
(row count + column set + order-insensitive value comparison).
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

import zebra_spark
from tests.conftest import SF_ORACLE

zebra_spark.load_all_queries()

NAMES = sorted(zebra_spark.ORACLES)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize cell values, sort rows."""
    df = df.reindex(sorted(df.columns), axis=1)

    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "<null>"
        if isinstance(v, float):
            if v == int(v) and abs(v) < 1e15:
                return f"{int(v)}"
            return f"{v:.12g}"
        if isinstance(v, bool):
            return str(int(v))
        return str(v)

    out = df.map(cell)
    return out.sort_values(by=list(out.columns), kind="mergesort").reset_index(
        drop=True
    )


SPARK_TO_DUCK = {
    "bigint": {"BIGINT"},
    "int": {"INTEGER"},
    "double": {"DOUBLE"},
    "string": {"VARCHAR"},
    "boolean": {"BOOLEAN"},
}


@pytest.fixture(scope="session")
def spark_results(spark):
    """Materialize every registered query's Spark result once, 8 jobs in
    flight (Spark schedules concurrent actions from threads across the
    same local executor pool).  Cuts the parity sweep from ~1.5 s/query
    serial to the latency of the slowest stragglers; per-query failures
    are captured and re-raised inside the owning test."""
    from concurrent.futures import ThreadPoolExecutor

    def run(name):
        try:
            sdf = zebra_spark.QUERIES[name](spark, SF_ORACLE)
            return name, (sdf.schema, sdf.toPandas(), None)
        except Exception as exc:  # noqa: BLE001 — re-raised per-test
            return name, (None, None, exc)

    with ThreadPoolExecutor(max_workers=8) as ex:
        return dict(ex.map(run, NAMES))


@pytest.mark.parametrize("name", NAMES)
def test_parity(name, spark, duck, spark_results):
    schema, spark_pdf, exc = spark_results[name]
    if exc is not None:
        raise exc
    duck_pdf = duck.execute(zebra_spark.ORACLES[name]).fetchdf()

    # schema: same columns AND equivalent types on both engines
    duck_types = {
        r[0]: r[1] for r in duck.execute(f"DESCRIBE {zebra_spark.ORACLES[name]}").fetchall()
    }
    for f in schema.fields:
        st = f.dataType.simpleString()
        dt = duck_types.get(f.name)
        assert dt is not None, f"{name}: column {f.name} missing in oracle"
        assert dt in SPARK_TO_DUCK.get(st, {st.upper()}), (
            f"{name}: {f.name} spark={st} duck={dt}"
        )

    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} != {len(duck_pdf)}"
    )
    assert len(spark_pdf) > 0, f"{name}: empty result"
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} != {sorted(duck_pdf.columns)}"
    )

    a, b = canon(spark_pdf), canon(duck_pdf)
    if not a.equals(b):
        diff = (a != b).any(axis=1)
        raise AssertionError(
            f"{name}: value mismatch, first diffs:\n"
            f"spark:\n{a[diff].head(5)}\nduck:\n{b[diff].head(5)}"
        )
