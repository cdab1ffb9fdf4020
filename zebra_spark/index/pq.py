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


def _pq_encode_np(X: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """(n, dim) -> (n, m) nearest sub-codebook ids — the shared kernel
    for the distributed encode pass, the drift audit, and the
    driver-side training baseline."""
    m, k, dsub = codebooks.shape
    out = np.empty((len(X), m), dtype=np.int32)
    for s in range(m):
        sub = X[:, s * dsub : (s + 1) * dsub]
        d2 = (
            (sub * sub).sum(axis=1, keepdims=True)
            - 2.0 * sub @ codebooks[s].T
            + (codebooks[s] * codebooks[s]).sum(axis=1)
        )
        out[:, s] = d2.argmin(axis=1)
    return out


def _pq_decode_np(C: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """(n, m) code ids -> (n, dim) reconstructed vectors."""
    m = codebooks.shape[0]
    return np.concatenate(
        [codebooks[s][np.asarray(C[:, s], dtype=np.int64)] for s in range(m)],
        axis=1,
    )


def _sample_mse(X: np.ndarray, codebooks: np.ndarray) -> float:
    """Mean squared reconstruction L2 per vector — the frozen training
    baseline the drift audit compares against."""
    Xh = _pq_decode_np(_pq_encode_np(X, codebooks), codebooks)
    return float(((X - Xh) ** 2).sum(axis=1).mean())


def retrain_due(n_added: int, n_trained: int, added_frac: float) -> bool:
    """THE retrain-volume trigger, one definition (ADVICE r16): the
    appended mass exceeds `added_frac` of the rows the codebooks were
    trained against.  Shared by PQIndex/IVFPQIndex.needs_retrain (warm
    counters) and Database._retrain_gate (persisted metadata counters)
    so the cold metadata-only audit path can never silently diverge
    from the warm-index path."""
    return n_added > added_frac * max(n_trained, 1)


class PQIndex:
    """`codebooks`: (m, k, dsub) float64, driver-side (constant size);
    `codes`: DataFrame (vec_id bigint, codes array<int>), distributed.

    Maintained state for continuous ingest (VERDICT r6 #1 — the PQ twin
    of LSHIndex::add, reference src/db/lsh.rs:440-466): add() encodes a
    new batch with the FROZEN codebooks and appends, `appends`/`n_added`
    count toward a needs_retrain() trigger, and drift_audit() measures
    whether the frozen codebooks still fit new data (mean reconstruction
    error vs the frozen training-sample baseline)."""

    def __init__(
        self,
        spark: SparkSession,
        corpus: DataFrame,
        codebooks: np.ndarray,
        codes: DataFrame,
        n_trained: int = 0,
        n_added: int = 0,
        appends: int = 0,
        train_mse: float | None = None,
    ):
        self.spark = spark
        self.corpus = corpus  # (vec_id, emb array<double>)
        self.codebooks = codebooks
        self.codes = codes
        self.n_trained = n_trained  # corpus rows the codebooks saw
        self.n_added = n_added  # rows appended since (re)train
        self.appends = appends  # add() calls since (re)train/compact
        self.train_mse = train_mse  # frozen training-sample baseline

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
        return cls(
            spark,
            corpus,
            codebooks,
            codes,
            # the count is a cheap scan of the just-checkpointed blocks;
            # the baseline is numpy over the already-collected sample
            n_trained=codes.count(),
            train_mse=_sample_mse(X, codebooks),
        )

    @staticmethod
    def _encode(corpus: DataFrame, codebooks: np.ndarray) -> DataFrame:
        """One distributed pass: nearest sub-codebook entry per subspace.
        Vectorized over the whole Arrow batch (no per-row Python)."""
        m, k, dsub = codebooks.shape
        cb = codebooks.copy()

        def op(batches):
            for pdf in batches:
                M = np.array(pdf["emb"].tolist(), dtype=np.float64)
                yield pd.DataFrame(
                    {
                        "vec_id": np.asarray(pdf["vec_id"], dtype=np.int64),
                        "codes": list(_pq_encode_np(M, cb)),
                    }
                )

        return corpus.select("vec_id", "emb").mapInPandas(
            op, "vec_id bigint, codes array<int>"
        )

    # -- incremental maintenance (VERDICT r6 #1) --------------------------

    def add(self, new_corpus: DataFrame, path: str | None = None) -> int:
        """Append a new batch (vec_id, emb) WITHOUT retraining: encode
        with the frozen codebooks (one distributed pass, no shuffle) and
        union into codes/corpus.  With `path` (a save() dir), the new
        rows are also append-written to the saved parquet tables, so a
        long-lived on-disk index absorbs ingest batches in place.

        Returns the rows added.  Quantization quality for the new rows
        depends on the codebooks still fitting their distribution —
        measure with drift_audit(); retrain when needs_retrain() or the
        audit ratio drifts.  At 100 TB this is the difference between a
        per-batch encode pass and a full corpus re-encode."""
        new = new_corpus.select("vec_id", "emb").localCheckpoint()
        new_codes = self._encode(new, self.codebooks).localCheckpoint()
        n = new_codes.count()
        self.codes = self.codes.unionByName(new_codes)
        self.corpus = self.corpus.unionByName(new)
        self.appends += 1
        self.n_added += n
        if path is not None:
            new_codes.write.mode("append").parquet(f"{path}/codes")
            new.write.mode("append").parquet(f"{path}/embeddings")
            self._write_meta(path)  # counters already reflect this batch
        return n

    def remove(self, ids_df: DataFrame) -> None:
        """Delete by id (one column `vec_id`) from codes and corpus via
        anti-join — complete, like LSHIndex.remove (the reference's
        partial variant is lsh.rs:487).  Counters are not decremented:
        n_trained/n_added track what the codebooks have SEEN (the
        staleness signal), not the live row count."""
        ids = ids_df.select("vec_id")
        self.codes = self.codes.join(ids, "vec_id", "left_anti").localCheckpoint()
        self.corpus = self.corpus.join(
            ids, "vec_id", "left_anti"
        ).localCheckpoint()

    def needs_retrain(self, added_frac: float = 0.5) -> bool:
        """Retrain trigger: the appended mass exceeds `added_frac` of
        the rows the codebooks were trained against.  Pair with
        drift_audit() — volume alone does not imply drift, and a
        distribution shift can warrant retraining far earlier."""
        return retrain_due(self.n_added, self.n_trained, added_frac)

    def retrain(self, iters: int = 10, seed: int = 42,
                sample_rows: int = 16_384) -> "PQIndex":
        """Fresh codebooks over the CURRENT corpus (base + appends) and
        a full re-encode — the heavy operation add() amortizes."""
        m, k, _ = self.codebooks.shape
        return PQIndex.train(
            self.spark, "", m=m, k=k, iters=iters, seed=seed,
            sample_rows=sample_rows, corpus=self.corpus,
        )

    def compact(self) -> "PQIndex":
        """Collapse the union lineage a run of add()s builds up (each
        add chains one union node; hundreds would bloat planning) into
        checkpointed blocks.  Codebooks and counters are unchanged —
        this is file/lineage hygiene, not retraining."""
        return PQIndex(
            self.spark,
            self.corpus.localCheckpoint(),
            self.codebooks,
            self.codes.localCheckpoint(),
            n_trained=self.n_trained,
            n_added=self.n_added,
            appends=0,
            train_mse=self.train_mse,
        )

    def drift_audit(self, batch: DataFrame, label: str = "batch") -> DataFrame:
        """One row (split, n, mse, ratio): mean squared reconstruction
        error of `batch` (vec_id, emb) under the FROZEN codebooks,
        relative to the frozen training-sample baseline.  ratio ≈ 1
        means the codebooks still fit; a sustained ratio ≫ 1 is the
        staleness signal that should trigger retrain() even before
        needs_retrain()'s volume threshold.  The scan is one distributed
        mapInPandas pass emitting per-Arrow-batch partial sums — only
        (n, sse) partials reach the driver."""
        cb = self.codebooks.copy()

        def op(batches):
            for pdf in batches:
                X = np.array(pdf["emb"].tolist(), dtype=np.float64)
                Xh = _pq_decode_np(_pq_encode_np(X, cb), cb)
                yield pd.DataFrame(
                    {"n": [len(X)], "sse": [float(((X - Xh) ** 2).sum())]}
                )

        row = (
            batch.select("emb")
            .mapInPandas(op, "n bigint, sse double")
            .agg(F.sum("n").alias("n"), F.sum("sse").alias("sse"))
            .collect()[0]
        )
        n = int(row.n or 0)
        mse = float(row.sse) / n if n else 0.0
        base = self.train_mse if self.train_mse else None
        ratio = mse / base if base else float("nan")
        return self.spark.createDataFrame(
            [(label, n, mse, ratio)],
            "split string, n bigint, mse double, ratio double",
        )

    def _write_meta(self, path: str) -> None:
        import json

        from zebra_spark.fsutil import write_text

        write_text(
            self.spark,
            f"{path}/metadata.json",
            json.dumps(
                {
                    "codebooks": self.codebooks.tolist(),
                    "n_trained": self.n_trained,
                    "n_added": self.n_added,
                    "appends": self.appends,
                    "train_mse": self.train_mse,
                }
            ),
        )

    def save(self, path: str) -> None:
        self.codes = self.codes.localCheckpoint()
        self.corpus = self.corpus.localCheckpoint()
        self.codes.write.mode("overwrite").parquet(f"{path}/codes")
        self.corpus.write.mode("overwrite").parquet(f"{path}/embeddings")
        self._write_meta(path)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "PQIndex":
        import json

        from zebra_spark.fsutil import read_text

        meta = json.loads(read_text(spark, f"{path}/metadata.json"))
        return cls(
            spark,
            spark.read.parquet(f"{path}/embeddings"),
            np.array(meta["codebooks"]),
            spark.read.parquet(f"{path}/codes"),
            n_trained=int(meta.get("n_trained", 0)),
            n_added=int(meta.get("n_added", 0)),
            appends=int(meta.get("appends", 0)),
            train_mse=meta.get("train_mse"),
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
        filter_ids: DataFrame | None = None,
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
        `refine` candidate ids join back to the full vectors.

        filter_ids (r16, VERDICT r15 #4): a one-column (vec_id) frame
        of ADMISSIBLE neighbours, semi-joined into the CODES side
        before the ADC scan — excluded rows are never scored and never
        consume refine slots (the pre-filter contract shared by all
        four index families)."""
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

        codes_side = self.codes
        if filter_ids is not None:
            codes_side = codes_side.join(
                filter_ids.select("vec_id"), "vec_id", "left_semi"
            )
        scored = codes_side.mapInPandas(
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
