"""Metric-library properties (SURVEY §5.2.3): axioms via hypothesis on
driver-side numpy mirrors + Spark expression spot-parity, Hamming
bit-semantics (reference src/distance.rs:140-158), pandas_udf parity
with native expressions."""

import math

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

# numpy mirrors of the Spark expressions (same formulas)
MIRRORS = {
    "l2sq": lambda a, b: float(((a - b) ** 2).sum()),
    "l2": lambda a, b: float(np.sqrt(((a - b) ** 2).sum())),
    "l1": lambda a, b: float(np.abs(a - b).sum()),
    "chebyshev": lambda a, b: float(np.abs(a - b).max()),
    "canberra": lambda a, b: float(
        np.divide(
            np.abs(a - b),
            np.abs(a) + np.abs(b),
            out=np.zeros_like(a, dtype=np.float64),
            where=(np.abs(a) + np.abs(b)) != 0,
        ).sum()
    ),
    "braycurtis": lambda a, b: (
        0.0
        if np.abs(a + b).sum() == 0
        else float(np.abs(a - b).sum() / np.abs(a + b).sum())
    ),
    "cosine": lambda a, b: (
        1.0
        if np.linalg.norm(a) == 0 or np.linalg.norm(b) == 0
        else 1.0 - float(a @ b) / (np.linalg.norm(a) * np.linalg.norm(b))
    ),
}

vec = st.lists(
    st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
    min_size=8,
    max_size=8,
)


@settings(max_examples=200, deadline=None)
@given(a=vec, b=vec)
def test_axioms(a, b):
    a, b = np.array(a, dtype=np.float64), np.array(b, dtype=np.float64)
    for name, fn in MIRRORS.items():
        dab, dba = fn(a, b), fn(b, a)
        assert dab >= -1e-9, f"{name} negative"
        assert math.isclose(dab, dba, rel_tol=1e-9, abs_tol=1e-9), f"{name} asym"
        # identity (cosine: only when norm > 0)
        if name != "cosine" or np.linalg.norm(a) > 1e-9:
            assert abs(fn(a, a)) < 1e-6, f"{name} d(x,x)!=0"
    # triangle inequality for true metrics
    c = (a + b) / 3.0
    for name in ("l2", "l1", "chebyshev"):
        f = MIRRORS[name]
        assert f(a, b) <= f(a, c) + f(c, b) + 1e-6, f"{name} triangle"


def test_spark_matches_numpy(spark):
    """The Spark expressions compute the same values as the mirrors."""
    from zebra_spark import functions as zf

    rng = np.random.default_rng(0)
    rows = [(i, rng.normal(size=8).tolist(), rng.normal(size=8).tolist()) for i in range(20)]
    df = spark.createDataFrame(rows, "i int, a array<double>, b array<double>")
    exprs = [zf.METRICS[m](F.col("a"), F.col("b")).alias(m) for m in MIRRORS]
    got = df.select("i", *exprs).toPandas().set_index("i")
    for i, a, b in rows:
        a, b = np.array(a), np.array(b)
        for m, fn in MIRRORS.items():
            assert math.isclose(got.loc[i, m], fn(a, b), rel_tol=1e-9), (m, i)


def test_hamming_bits(spark):
    """Reference semantics: popcount(xor) over the LOW BYTE of each f32's
    bit pattern (src/distance.rs:147-148)."""
    from zebra_spark.functions import hamming_bits_udf

    a = [1.0, 2.0, 3.0]
    b = [1.0, 2.0, 4.0]
    expected = int(
        np.unpackbits(
            (np.float32(a).view(np.uint32).astype(np.uint8))
            ^ (np.float32(b).view(np.uint32).astype(np.uint8))
        ).sum()
    )
    df = spark.createDataFrame([(a, b)], "a array<float>, b array<float>")
    got = df.select(hamming_bits_udf()("a", "b").alias("h")).collect()[0].h
    assert got == expected
    same = df.select(hamming_bits_udf()("a", "a").alias("h")).collect()[0].h
    assert same == 0


def test_pandas_udf_parity_with_native(spark):
    """UDF-parity (SURVEY §5.2.6): an Arrow pandas_udf l2sq equals the
    native zip_with/aggregate expression."""
    from pyspark.sql.types import DoubleType

    from zebra_spark import functions as zf

    @F.pandas_udf(DoubleType())
    def l2sq_udf(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [float(((np.array(x) - np.array(y)) ** 2).sum()) for x, y in zip(a, b)]
        )

    rng = np.random.default_rng(1)
    rows = [(rng.normal(size=16).tolist(), rng.normal(size=16).tolist()) for _ in range(50)]
    df = spark.createDataFrame(rows, "a array<double>, b array<double>")
    out = df.select(
        zf.l2sq(F.col("a"), F.col("b")).alias("native"),
        l2sq_udf("a", "b").alias("udf"),
    ).toPandas()
    assert np.allclose(out["native"], out["udf"], rtol=1e-12)


def test_apply_in_pandas_matches_native_zscore(spark):
    """Grouped-map UDF surface (SURVEY §2.B): applyInPandas z-score ==
    the native window-function z-score."""
    from tests.conftest import SF_ORACLE

    import zebra_spark

    zebra_spark.load_all_queries()
    native = (
        zebra_spark.QUERIES["q_group_zscore"](spark, SF_ORACLE)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )

    from zebra_spark.io import embeddings_d

    e = embeddings_d(spark, SF_ORACLE).select(
        "label", "vec_id", F.element_at("emb", 1).alias("head")
    )

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        sd = pdf["head"].std(ddof=1)
        z = (pdf["head"] - pdf["head"].mean()) / sd if sd else 0.0
        out = pdf.assign(zscore=(z if sd else 0.0).round(4) if sd else 0.0)
        return out[["label", "vec_id", "zscore"]]

    udf_out = (
        e.groupBy("label")
        .applyInPandas(zscore, schema="label int, vec_id bigint, zscore double")
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert np.allclose(native["zscore"], udf_out["zscore"], atol=1e-4)


def test_unrolled_matches_hof_fold(spark):
    """r17 (functions._unrolled_sum): the dim-unrolled codegen chain
    must be BIT-identical to the higher-order-function fold — same
    IEEE additions in the same order — for dot / l2sq / cosine,
    including the degenerate zero-norm and null-element cases."""
    import math
    import random

    from pyspark.sql import functions as F

    from zebra_spark import functions as zf

    rng = random.Random(3)
    rows = [
        ([rng.uniform(-3, 3) for _ in range(64)],
         [rng.uniform(-3, 3) for _ in range(64)])
        for _ in range(200)
    ]
    rows.append(([0.0] * 64, [1.0] * 64))  # zero-norm cosine branch
    df = spark.createDataFrame(
        rows, "a array<double>, b array<double>"
    )
    out = df.select(
        zf.dot("a", "b").alias("d_h"),
        zf.dot("a", "b", dim=64).alias("d_u"),
        zf.l2sq("a", "b").alias("s_h"),
        zf.l2sq("a", "b", dim=64).alias("s_u"),
        zf.cosine("a", "b").alias("c_h"),
        zf.cosine("a", "b", dim=64).alias("c_u"),
    ).collect()
    for r in out:
        assert r["d_h"] == r["d_u"]  # bitwise: same fold order
        assert r["s_h"] == r["s_u"]
        assert r["c_h"] == r["c_u"]
    # short array: the width guard routes mismatched rows to the HOF
    # fold, so the dim hint never changes a result
    short = spark.createDataFrame(
        [([1.0, 2.0], [1.0] * 64)], "a array<double>, b array<double>"
    ).select(
        zf.l2sq("a", "b").alias("s_h"),
        zf.l2sq("a", "b", dim=64).alias("s_u"),
    ).first()
    assert short["s_h"] is None and short["s_u"] is None
    # non-64-dim store with the 64 hint: values must equal the HOF
    # fold bitwise (the guard's fallback branch)
    ten = spark.createDataFrame(
        [([float(i) for i in range(10)], [2.0] * 10)],
        "a array<double>, b array<double>",
    ).select(
        zf.l2sq("a", "b").alias("s_h"),
        zf.l2sq("a", "b", dim=64).alias("s_u"),
        zf.cosine("a", "b").alias("c_h"),
        zf.cosine("a", "b", dim=64).alias("c_u"),
    ).first()
    assert ten["s_h"] == ten["s_u"] and ten["c_h"] == ten["c_u"]
