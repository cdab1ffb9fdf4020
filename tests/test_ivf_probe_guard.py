"""IVF probe-tensor guard (VERDICT r12 #5): probe_l2sq_scores keeps
the exact O(batch x k x dim) squared-difference tensor at small k
(bit-parity with the driver-side numpy path) and switches to the
O(batch x k) BLAS form past _PROBE_TENSOR_LIMIT, so a large-k index
can never materialize a multi-GiB ranking tensor inside a mapInPandas
batch.  The pins here run BOTH forms at k = 256 cells and require the
identical top-nprobe cell selection — and identical end-to-end
search_df output — on a seeded fixture (deterministic: no statistics,
a pass is a pass forever)."""

from __future__ import annotations

import numpy as np
import pytest

import zebra_spark
from zebra_spark.index import ivf as ivf_mod
from zebra_spark.index.ivf import IVFIndex, probe_l2sq_scores

zebra_spark.load_all_queries()

K_CELLS = 256
DIM = 16
N_CORPUS = 2048
N_QUERIES = 64


def _fixture(seed=11):
    rng = np.random.RandomState(seed)
    corpus = rng.normal(0, 1, (N_CORPUS, DIM))
    queries = rng.normal(0, 1, (N_QUERIES, DIM))
    return corpus, queries


def test_blas_form_selects_identical_top_nprobe_cells():
    """The two forms differ only by the dropped per-row ||q||^2 and FP
    rounding — per-row top-nprobe selection must agree at k=256 on the
    seeded fixture (near-exact centroid-distance ties are the only way
    they could split, and the fixture has none)."""
    corpus, queries = _fixture()
    rng = np.random.RandomState(3)
    centroids = corpus[rng.choice(N_CORPUS, K_CELLS, replace=False)]
    exact = probe_l2sq_scores(queries, centroids, limit=1 << 62)
    blas = probe_l2sq_scores(queries, centroids, limit=0)
    for nprobe in (1, 4, 16):
        a = np.sort(np.argsort(exact, axis=1)[:, :nprobe], axis=1)
        b = np.sort(np.argsort(blas, axis=1)[:, :nprobe], axis=1)
        assert (a == b).all(), f"top-{nprobe} cell sets diverged"
    # and the exact form really is the distance (BLAS drops ||q||^2)
    one = ((queries[0] - centroids[0]) ** 2).sum()
    assert exact[0, 0] == pytest.approx(one, rel=0, abs=0)


def test_guard_trips_exactly_at_the_limit():
    corpus, queries = _fixture()
    centroids = corpus[:K_CELLS]
    at = probe_l2sq_scores(queries, centroids, limit=K_CELLS * DIM)
    above = probe_l2sq_scores(queries, centroids, limit=K_CELLS * DIM - 1)
    # at the limit: exact tensor (true distances, all >= 0)
    assert (at >= 0).all()
    assert np.array_equal(
        at, ((queries[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
    )
    # just above: the ||q||^2-dropped BLAS scores (can go negative)
    assert np.array_equal(
        above,
        (centroids ** 2).sum(axis=1)[None, :] - 2.0 * (queries @ centroids.T),
    )


def test_search_df_identical_under_forced_blas_probe(spark, monkeypatch):
    """End-to-end pin at k=256: IVFIndex.search_df run with the default
    guard (exact tensor — 256 x 16 dims sits under the limit) and with
    the guard forced to the BLAS path must return the identical
    (query_id, neighbor_id, rank, dist) set."""
    corpus, queries = _fixture()
    cdf = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(corpus)],
        "vec_id bigint, emb array<double>",
    )
    qdf = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(queries)],
        "query_id bigint, qe array<double>",
    )
    idx = IVFIndex.train(spark, sf_dir="", k=K_CELLS, iters=1, corpus=cdf)
    assert len(idx.centroids) == K_CELLS
    base = idx.search_df(qdf, k=5, nprobe=8).toPandas()
    monkeypatch.setattr(ivf_mod, "_PROBE_TENSOR_LIMIT", 0)
    forced = idx.search_df(qdf, k=5, nprobe=8).toPandas()
    key = ["query_id", "neighbor_id", "rank", "dist"]
    a = base[key].sort_values(key).reset_index(drop=True)
    b = forced[key].sort_values(key).reset_index(drop=True)
    assert a.equals(b)
    assert len(a) == N_QUERIES * 5
