"""Product-quantization ANN (FAISS IVFADC family, re-expressed for
Spark): compress each embedding to `m` sub-space code ids and scan the
CODES, not the vectors, at query time.

Why this exists at 100 TB: a 64-dim float32 embedding is 256 B; its
8x4-bit PQ code is 4 B.  The codes table for a 100 TB corpus fits in a
fraction of the executors' page cache, so the candidate scan reads ~64x
less data than any exact or IVF-flat pass, and the full-precision
vectors are only touched for the final re-rank of a few hundred
candidates per query.  This is the standard billion-scale recipe
(Jegou et al., "Product Quantization for Nearest Neighbor Search",
TPAMI 2011) — the complement to the LSH forest (reference
src/db/lsh.rs) and the IVF-flat index (index/ivf.py).

Scale posture:
- training: per-subspace Lloyd over a SEEDED SAMPLE on the driver
  (numpy) — exactly how FAISS trains PQ codebooks.  Driver state is the
  m x k x (dim/m) codebook = dim x k floats total (e.g. 64 x 16), a
  constant independent of corpus size; the sample is bounded (default
  16k rows).
- encoding: one distributed mapInPandas pass, codebook in the closure
  (broadcast by the task serializer); output is (vec_id, codes
  array<int>) — no shuffle at all.
- search (ADC — asymmetric distance computation): each query builds an
  m x k lookup table of partial squared distances EXECUTOR-side, then
  every code row's approximate distance is m table lookups + a sum
  (numpy fancy-indexing over the whole Arrow batch at once).  The scan
  is embarrassingly parallel over code partitions; only the top
  `refine` candidate ids per query join back to the full vectors for
  the exact re-rank, so the expensive I/O is O(queries x refine), not
  O(queries x corpus).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from zebra_spark import functions as zf
from zebra_spark.functions import rnd
from zebra_spark.io import embeddings_d


def _kmeans_np(X: np.ndarray, k: int, iters: int, seed: int) -> np.ndarray:
    """Seeded Lloyd on a driver-side sample (one subspace's training
    slice — bounded rows x (dim/m) columns).  Empty clusters keep their
    previous centroid, matching IVFIndex.train's convention."""
    rng = np.random.default_rng(seed)
    k = min(k, len(X))
    cents = X[rng.choice(len(X), size=k, replace=False)].astype(np.float64)
    for _ in range(iters):
        # (n, k) squared distances via the expansion trick — no n x k x d
        d2 = (
            (X * X).sum(axis=1, keepdims=True)
            - 2.0 * X @ cents.T
            + (cents * cents).sum(axis=1)
        )
        assign = d2.argmin(axis=1)
        new = cents.copy()
        for j in range(k):
            mask = assign == j
            if mask.any():
                new[j] = X[mask].mean(axis=0)
        if np.allclose(new, cents, atol=1e-12):
            return new
        cents = new
    return cents


class PQIndex:
    """`codebooks`: (m, k, dsub) float64, driver-side (constant size);
    `codes`: DataFrame (vec_id bigint, codes array<int>), distributed."""

    def __init__(
        self,
        spark: SparkSession,
        corpus: DataFrame,
        codebooks: np.ndarray,
        codes: DataFrame,
    ):
        self.spark = spark
        self.corpus = corpus  # (vec_id, emb array<double>)
        self.codebooks = codebooks
        self.codes = codes

    @classmethod
    def train(
        cls,
        spark: SparkSession,
        sf_dir: str,
        m: int = 8,
        k: int = 16,
        iters: int = 10,
        seed: int = 42,
        sample_rows: int = 16_384,
        corpus: DataFrame | None = None,
    ) -> "PQIndex":
        corpus = (
            corpus
            if corpus is not None
            else embeddings_d(spark, sf_dir).select("vec_id", "emb")
        )
        # seeded deterministic sample: cheapest xxhash64 prefix, like
        # IVFIndex.train's init draw — bounded driver transfer
        sample = (
            corpus.orderBy(F.xxhash64(F.col("vec_id"), F.lit(seed)))
            .limit(sample_rows)
            .select("emb")
            .toPandas()
        )
        X = np.array(sample["emb"].tolist(), dtype=np.float64)
        dim = X.shape[1]
        if dim % m != 0:
            raise ValueError(f"dim {dim} not divisible by m={m}")
        dsub = dim // m
        codebooks = np.stack(
            [
                _kmeans_np(X[:, s * dsub : (s + 1) * dsub], k, iters, seed + s)
                for s in range(m)
            ]
        )  # (m, k, dsub)
        codes = cls._encode(corpus, codebooks).localCheckpoint()
        return cls(spark, corpus, codebooks, codes)

    @staticmethod
    def _encode(corpus: DataFrame, codebooks: np.ndarray) -> DataFrame:
        """One distributed pass: nearest sub-codebook entry per subspace.
        Vectorized over the whole Arrow batch (no per-row Python)."""
        m, k, dsub = codebooks.shape
        cb = codebooks.copy()

        def op(batches):
            for pdf in batches:
                M = np.array(pdf["emb"].tolist(), dtype=np.float64)
                n = len(M)
                out = np.empty((n, m), dtype=np.int32)
                for s in range(m):
                    sub = M[:, s * dsub : (s + 1) * dsub]
                    d2 = (
                        (sub * sub).sum(axis=1, keepdims=True)
                        - 2.0 * sub @ cb[s].T
                        + (cb[s] * cb[s]).sum(axis=1)
                    )
                    out[:, s] = d2.argmin(axis=1)
                yield pd.DataFrame(
                    {
                        "vec_id": np.asarray(pdf["vec_id"], dtype=np.int64),
                        "codes": list(out),
                    }
                )

        return corpus.select("vec_id", "emb").mapInPandas(
            op, "vec_id bigint, codes array<int>"
        )

    def save(self, path: str) -> None:
        import json

        from zebra_spark.fsutil import write_text

        self.codes = self.codes.localCheckpoint()
        self.corpus = self.corpus.localCheckpoint()
        self.codes.write.mode("overwrite").parquet(f"{path}/codes")
        self.corpus.write.mode("overwrite").parquet(f"{path}/embeddings")
        write_text(
            self.spark,
            f"{path}/metadata.json",
            json.dumps({"codebooks": self.codebooks.tolist()}),
        )

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "PQIndex":
        import json

        from zebra_spark.fsutil import read_text

        codebooks = np.array(
            json.loads(read_text(spark, f"{path}/metadata.json"))["codebooks"]
        )
        return cls(
            spark,
            spark.read.parquet(f"{path}/embeddings"),
            codebooks,
            spark.read.parquet(f"{path}/codes"),
        )

    def reconstruct(self) -> DataFrame:
        """(vec_id, emb_hat array<double>): decode codes back to the
        codebook centroids — the quantization used by tests to bound
        reconstruction error."""
        cb = self.codebooks
        m, k, dsub = cb.shape

        def op(batches):
            for pdf in batches:
                C = np.array(pdf["codes"].tolist(), dtype=np.int64)
                parts = [cb[s][C[:, s]] for s in range(m)]
                yield pd.DataFrame(
                    {
                        "vec_id": np.asarray(pdf["vec_id"], dtype=np.int64),
                        "emb_hat": list(np.concatenate(parts, axis=1)),
                    }
                )

        return self.codes.mapInPandas(op, "vec_id bigint, emb_hat array<double>")

    def search_df(
        self,
        queries: DataFrame,
        k: int = 10,
        refine: int = 100,
    ) -> DataFrame:
        """ADC search: `queries` is (query_id bigint, qe array<double>).
        Returns (query_id, neighbor_id, rank, dist) — dist is the EXACT
        L2^2 after re-rank, so output quality degrades only via candidate
        recall, never via distance precision.

        Plan shape: the bounded query batch is collected once (the same
        contract as IVFIndex.search_vectors — callers batch queries) and
        its m x k LUT rides the scan closure.  One mapInPandas scores
        every code row via numpy take+sum and emits only a PARTIAL
        top-`refine` per (Arrow batch, query) — the map-side combine for
        top-k — so the global per-query window shuffles
        O(partitions x refine) rows, not the corpus.  Only the surviving
        `refine` candidate ids join back to the full vectors."""
        cb = self.codebooks
        m, kk, dsub = cb.shape

        q_rows = queries.select("query_id", "qe").collect()
        if not q_rows:
            raise ValueError("empty query batch")
        Q = np.array([r.qe for r in q_rows], dtype=np.float64)
        qids = np.array([r.query_id for r in q_rows], dtype=np.int64)
        # (nq, m, k) LUT: partial squared distance from each query's
        # subvector to every codebook entry — built once, shipped in the
        # closure (queries-per-batch is bounded by the caller)
        lut = np.stack(
            [
                (
                    (Q[:, s * dsub : (s + 1) * dsub][:, None, :] - cb[s][None, :, :])
                    ** 2
                ).sum(axis=2)
                for s in range(m)
            ],
            axis=1,
        )

        def scan(batches):
            for pdf in batches:
                C = np.array(pdf["codes"].tolist(), dtype=np.int64)  # (n, m)
                vids = np.asarray(pdf["vec_id"], dtype=np.int64)
                n = len(C)
                # adist[q, row] = sum_s lut[q, s, C[row, s]]
                adist = np.zeros((len(qids), n))
                for s in range(m):
                    adist += lut[:, s, :][:, C[:, s]]
                # partial top-refine per query within this batch
                keep = min(refine, n)
                part = np.argpartition(adist, keep - 1, axis=1)[:, :keep]
                yield pd.DataFrame(
                    {
                        "query_id": np.repeat(qids, keep),
                        "vec_id": vids[part].reshape(-1),
                        "adist": np.take_along_axis(adist, part, axis=1).reshape(-1),
                    }
                )

        scored = self.codes.mapInPandas(
            scan, "query_id bigint, vec_id bigint, adist double"
        )
        wa = Window.partitionBy("query_id").orderBy("adist", "vec_id")
        cand = (
            scored.withColumn("crk", F.row_number().over(wa))
            .filter(F.col("crk") <= refine)
            .select("query_id", "vec_id")
        )
        qdf = self.spark.createDataFrame(
            [(int(q), [float(x) for x in v]) for q, v in zip(qids, Q)],
            "query_id bigint, qe array<double>",
        )
        w = Window.partitionBy("query_id").orderBy("dist", "neighbor_id")
        return (
            cand.join(self.corpus, "vec_id")
            .join(F.broadcast(qdf), "query_id")
            .select(
                "query_id",
                F.col("vec_id").alias("neighbor_id"),
                zf.l2sq(F.col("qe"), F.col("emb")).alias("dist"),
            )
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(
                "query_id", "neighbor_id", "rank", rnd(F.col("dist")).alias("dist")
            )
        )

    def search_ids(
        self, ids: Sequence[int], k: int = 10, refine: int = 100
    ) -> DataFrame:
        ids = [int(i) for i in ids]
        q = self.corpus.filter(F.col("vec_id").isin(ids)).select(
            F.col("vec_id").alias("query_id"), F.col("emb").alias("qe")
        )
        return self.search_df(q, k=k, refine=refine)
