"""Invariants for the rows-only PCA surface (q_emb_covariance feeds the
driver's hash gate; q_emb_pca has no SQL oracle, so its linear-algebra
contract is pinned here)."""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import SF_SMOKE


def _to_matrix(pdf):
    """(vec_id, k, pc) exploded rows -> row-per-vector projection matrix."""
    return (
        pdf.pivot(index="vec_id", columns="k", values="pc")
        .sort_index()
        .to_numpy()
    )


@pytest.fixture(scope="module")
def pca_frames(spark):
    import zebra_spark

    zebra_spark.load_all_queries()
    proj = zebra_spark.QUERIES["q_emb_pca"](spark, SF_SMOKE).toPandas()
    cov_rows = zebra_spark.QUERIES["q_emb_covariance"](spark, SF_SMOKE).collect()
    P = _to_matrix(proj)
    return P, cov_rows


def test_pca_shapes(pca_frames, spark):
    from zebra_spark.io import embeddings_d
    from zebra_spark.queries.vector import PCA_K

    P, _ = pca_frames
    n = embeddings_d(spark, SF_SMOKE).count()
    assert P.shape == (n, PCA_K)


def test_pca_variance_descends_and_components_uncorrelated(pca_frames):
    P, _ = pca_frames
    C = np.cov(P.T, bias=True)
    var = np.diag(C)
    # projected variances are the top eigenvalues, in descending order
    assert np.all(var[:-1] >= var[1:] - 1e-9)
    # distinct principal components are uncorrelated
    off = C - np.diag(var)
    assert np.abs(off).max() < 1e-6 * max(var.max(), 1.0)


def test_pca_matches_numpy_eig(pca_frames, spark):
    """The projected per-dim variance equals numpy's top eigenvalues of
    the same covariance matrix the oracled query produces."""
    from zebra_spark.queries.vector import PCA_K

    P, cov_rows = pca_frames
    dim = max(r["k"] for r in cov_rows) + 1
    cov = np.zeros((dim, dim))
    for r in cov_rows:
        cov[r["j"], r["k"]] = cov[r["k"], r["j"]] = r["cov"]
    evals = np.sort(np.linalg.eigvalsh(cov))[::-1][:PCA_K]
    got = np.var(P, axis=0)
    # cov matrix rows are rounded to 4 decimals -> loose relative tol
    assert np.allclose(got, evals, rtol=1e-2, atol=1e-3)


def test_pca_deterministic_sign(pca_frames, spark):
    """Re-running the query yields identical projections (sign
    convention pins eigh's arbitrary sign)."""
    import zebra_spark

    P, _ = pca_frames
    again = _to_matrix(zebra_spark.QUERIES["q_emb_pca"](spark, SF_SMOKE).toPandas())
    assert np.allclose(P, again, atol=1e-9)
