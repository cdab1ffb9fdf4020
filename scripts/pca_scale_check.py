"""Scale check for the one-pass covariance path (q_emb_covariance /
q_emb_pca) beyond the fixtures.

Synthesizes N 64-d vectors executor-side (deterministic xxhash64-based
pseudo-randoms — no RNG, no driver data), runs the one-pass moment-stats
covariance, and

1. checks it against numpy's covariance of the identical data
   (collected once for the check — the check is O(N), the engine path
   never collects), and
2. times the engine path alone at a size where the check would be
   collect-bound.

Run on a quiet machine:  python scripts/pca_scale_check.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DIM = 64


def synth(spark, n: int):
    """(vec_id, emb): deterministic uniform-ish values in [-0.5, 0.5),
    plus a linear cross-dimension trend so the covariance is non-trivial
    (pure iid would make every off-diagonal ~0 and hide index bugs)."""
    from pyspark.sql import functions as F

    base = spark.range(n).select(F.col("id").alias("vec_id"))
    lanes = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda j: (
            F.pmod(F.xxhash64(F.col("vec_id"), j), F.lit(100_000)) / 100_000.0
            - 0.5
            + (F.pmod(F.col("vec_id"), F.lit(97)) / 97.0 - 0.5)
            * (j + 1)
            / DIM
        ),
    )
    return base.select("vec_id", lanes.alias("emb"))


def cov_via_engine(df):
    import numpy as np

    from zebra_spark.queries.vector import _emb_moment_stats

    rows = _emb_moment_stats(df).collect()
    flat = np.zeros(1 + DIM + DIM * DIM)
    for r in rows:
        flat[r["idx"]] = r["v"]
    n, s = flat[0], flat[1 : 1 + DIM]
    ss = flat[1 + DIM :].reshape(DIM, DIM)
    mean = s / n
    return ss / n - np.outer(mean, mean)


def main() -> None:
    import numpy as np

    from zebra_spark.session import get_spark

    spark = get_spark("pca-scale", cpus="32")

    # correctness at 100k (collect-checkable)
    df = synth(spark, 100_000)
    cov = cov_via_engine(df)
    X = np.asarray([r["emb"] for r in df.collect()], dtype=np.float64)
    ref = np.cov(X.T, bias=True)
    err = np.abs(cov - ref).max()
    print(f"100k x {DIM}: max |cov - numpy| = {err:.3e}")
    assert err < 1e-9, "one-pass covariance diverged from numpy"

    # throughput at 2M (engine path only; ~1 GB of vector data)
    big = synth(spark, 2_000_000)
    t0 = time.perf_counter()
    cov2 = cov_via_engine(big)
    dt = time.perf_counter() - t0
    print(
        f"2M x {DIM}: one-pass covariance in {dt:.1f}s "
        f"({2_000_000 / dt:,.0f} vec/s); trace={np.trace(cov2):.4f}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
