"""Product-quantization index (zebra_spark/index/pq.py): recall vs the
exact oracle, seeded determinism, reconstruction-error monotonicity,
save/load round-trip, and the in-band-recall registry entry."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

import zebra_spark
from tests.conftest import SF_ORACLE
from zebra_spark.index.pq import PQIndex
from zebra_spark.io import embeddings_d

zebra_spark.load_all_queries()


@pytest.fixture(scope="module")
def pq(spark):
    return PQIndex.train(spark, SF_ORACLE, m=8, k=16, seed=42)


def _exact_top10(spark):
    return (
        zebra_spark.QUERIES["q_knn_exact"](spark, SF_ORACLE)
        .select("query_id", "neighbor_id")
        .toPandas()
    )


def test_recall_vs_exact(spark, pq):
    ann = (
        pq.search_ids(range(10), k=10, refine=200)
        .select("query_id", "neighbor_id")
        .toPandas()
    )
    exact = _exact_top10(spark)
    a = set(map(tuple, ann.itertuples(index=False)))
    e = set(map(tuple, exact.itertuples(index=False)))
    recall = len(a & e) / len(e)
    assert recall >= 0.9, f"PQ recall@10 {recall} < 0.9"


def test_deterministic_codes(spark):
    c1 = PQIndex.train(spark, SF_ORACLE, m=8, k=16, seed=42).codes.toPandas()
    c2 = PQIndex.train(spark, SF_ORACLE, m=8, k=16, seed=42).codes.toPandas()
    c1 = c1.sort_values("vec_id").reset_index(drop=True)
    c2 = c2.sort_values("vec_id").reset_index(drop=True)
    assert (c1["vec_id"] == c2["vec_id"]).all()
    assert all(list(a) == list(b) for a, b in zip(c1["codes"], c2["codes"]))


def test_reconstruction_error_shrinks_with_k(spark):
    corpus = embeddings_d(spark, SF_ORACLE).select("vec_id", "emb")

    def mse(idx):
        joined = idx.reconstruct().join(corpus, "vec_id")
        from zebra_spark import functions as zf

        return (
            joined.select(zf.l2sq(F.col("emb"), F.col("emb_hat")).alias("e"))
            .agg(F.avg("e"))
            .collect()[0][0]
        )

    coarse = PQIndex.train(spark, SF_ORACLE, m=8, k=4, seed=42, corpus=corpus)
    fine = PQIndex.train(spark, SF_ORACLE, m=8, k=16, seed=42, corpus=corpus)
    e_coarse, e_fine = mse(coarse), mse(fine)
    norm = (
        corpus.select(
            F.aggregate("emb", F.lit(0.0), lambda a, x: a + x * x).alias("n")
        )
        .agg(F.avg("n"))
        .collect()[0][0]
    )
    assert e_fine < e_coarse, (e_fine, e_coarse)
    assert e_fine < norm, "quantizer worse than predicting zero"


def test_save_load_roundtrip(spark, pq, tmp_path):
    path = str(tmp_path / "pq")
    pq.save(path)
    loaded = PQIndex.load(spark, path)
    assert np.allclose(loaded.codebooks, pq.codebooks)
    a = (
        pq.search_ids(range(5), k=5)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    b = (
        loaded.search_ids(range(5), k=5)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_registry_entry_recall_in_band(spark):
    out = zebra_spark.QUERIES["q_ann_pq"](spark, SF_ORACLE).toPandas()
    assert len(out) == 100  # 10 queries x top-10
    assert out["recall"].nunique() == 1
    assert out["recall"].iloc[0] >= 0.9


def test_save_load_roundtrip_file_uri(spark, tmp_path):
    """Index persistence through a scheme'd (file:) path exercises the
    Hadoop-FS metadata branch (fsutil) end-to-end: save, reload, and
    search results identical to the in-memory index."""
    from zebra_spark.index.pq import PQIndex
    from tests.conftest import SF_SMOKE

    idx = PQIndex.train(spark, SF_SMOKE, m=8, k=16)
    want = sorted(
        (r.query_id, r.neighbor_id, r.rank)
        for r in idx.search_ids(range(5), k=5, refine=100).collect()
    )
    path = f"file:{tmp_path}/pqidx"
    idx.save(path)
    idx2 = PQIndex.load(spark, path)
    got = sorted(
        (r.query_id, r.neighbor_id, r.rank)
        for r in idx2.search_ids(range(5), k=5, refine=100).collect()
    )
    assert got == want


def test_add_then_search_recall_in_band(spark, pq):
    """Incremental add (frozen codebooks) vs full retrain: train on the
    90% base, add the 10% batch, and require recall@10 within 0.1 of
    the retrain-built (full-corpus-trained) index on the same queries —
    the contract that makes per-batch encode a safe substitute for a
    corpus re-encode."""
    base = embeddings_d(spark, SF_ORACLE).select("vec_id", "emb").filter(
        F.col("vec_id") % 10 != 0
    )
    batch = embeddings_d(spark, SF_ORACLE).select("vec_id", "emb").filter(
        F.col("vec_id") % 10 == 0
    )
    idx = PQIndex.train(spark, "", m=8, k=16, seed=42, corpus=base)
    assert idx.add(batch) == batch.count()
    assert idx.n_added > 0 and idx.appends == 1

    def recall(i):
        ann = (
            i.search_ids(range(10), k=10, refine=200)
            .select("query_id", "neighbor_id")
            .toPandas()
        )
        exact = _exact_top10(spark)
        a = set(map(tuple, ann.itertuples(index=False)))
        e = set(map(tuple, exact.itertuples(index=False)))
        return len(a & e) / len(e)

    r_add, r_full = recall(idx), recall(pq)
    assert r_add >= r_full - 0.1, f"add-path recall {r_add} vs retrain {r_full}"
    # an added exact-duplicate vector must find itself at rank 1
    self_hit = idx.search_ids([10], k=1, refine=50).toPandas()
    assert self_hit.neighbor_id.iloc[0] == 10 and self_hit.dist.iloc[0] == 0.0


def test_add_to_saved_path_and_counter_roundtrip(spark, tmp_path):
    """add(path=...) appends the batch to the saved parquet tables and
    metadata counters survive save/load, so a long-lived on-disk index
    absorbs batches in place."""
    base = embeddings_d(spark, SF_ORACLE).select("vec_id", "emb").filter(
        F.col("vec_id") % 10 != 0
    )
    batch = embeddings_d(spark, SF_ORACLE).select("vec_id", "emb").filter(
        F.col("vec_id") % 10 == 0
    )
    idx = PQIndex.train(spark, "", m=8, k=16, seed=42, corpus=base)
    p = str(tmp_path / "pq_store")
    idx.save(p)
    n = idx.add(batch, path=p)
    back = PQIndex.load(spark, p)
    assert back.n_added == n and back.appends == 1
    assert back.train_mse == idx.train_mse
    assert back.codes.count() == idx.codes.count()  # appended rows present
    got = back.search_ids([10], k=1, refine=50).toPandas()
    assert got.neighbor_id.iloc[0] == 10


def test_drift_audit_fires_on_shift(spark):
    """The staleness signal BINDS: a same-distribution batch stays near
    ratio 1, a shifted batch blows past it (measured 1.16 vs 121 at
    sf0.01) — and the registered q_index_drift row order is stable."""
    out = zebra_spark.QUERIES["q_index_drift"](spark, SF_ORACLE).toPandas()
    assert list(out["split"]) == [
        "a_train_sample", "b_batch_same_dist", "c_batch_shifted"
    ]
    same = out.loc[out.split == "b_batch_same_dist", "ratio"].iloc[0]
    shifted = out.loc[out.split == "c_batch_shifted", "ratio"].iloc[0]
    assert same < 3.0
    assert shifted > 5.0 and shifted > same


def test_retrain_resets_counters(spark):
    """retrain() rebuilds codebooks over base+appends and returns a
    fresh index with zeroed append state and full-corpus n_trained."""
    e = embeddings_d(spark, SF_ORACLE).select("vec_id", "emb")
    base = e.filter(F.col("vec_id") % 10 != 0)
    batch = e.filter(F.col("vec_id") % 10 == 0)
    idx = PQIndex.train(spark, "", m=8, k=16, seed=42, corpus=base)
    idx.add(batch)
    fresh = idx.retrain(seed=42)
    assert fresh.n_added == 0 and fresh.appends == 0
    assert fresh.n_trained == e.count()
    assert fresh.train_mse is not None


def test_pq_remove(spark):
    """remove(): ids vanish from codes and corpus; search no longer
    returns them (the former self-match yields its next neighbor)."""
    base = embeddings_d(spark, SF_ORACLE).select("vec_id", "emb")
    idx = PQIndex.train(spark, "", m=8, k=16, seed=42, corpus=base)
    ids = spark.createDataFrame([(10,)], "vec_id bigint")
    before = idx.search_ids([20], k=10, refine=200).toPandas()
    idx.remove(ids)
    assert idx.codes.filter(F.col("vec_id") == 10).count() == 0
    assert idx.corpus.filter(F.col("vec_id") == 10).count() == 0
    after = idx.search_ids([20], k=10, refine=200).toPandas()
    assert 10 not in set(after.neighbor_id)
    # the remaining order is the before-order with id 10 dropped
    keep = [n for n in before.neighbor_id if n != 10][: len(after)]
    assert list(after.neighbor_id) == keep


def test_pq_search_df_filtered(spark, pq):
    """r16 (VERDICT r15 #4): filter_ids pre-filters the codes side of
    the ADC scan — every hit admissible, all-corpus filter a no-op."""
    from zebra_spark.io import load

    queries = (
        embeddings_d(spark, SF_ORACLE)
        .filter("vec_id < 20")
        .select(F.col("vec_id").alias("query_id"), F.col("emb").alias("qe"))
    )
    allowed = (
        load(spark, SF_ORACLE, "documents")
        .filter("lang = 'en'")
        .select(F.col("doc_id").alias("vec_id"))
    )
    res = pq.search_df(queries, k=5, refine=100, filter_ids=allowed).toPandas()
    ok = set(allowed.toPandas()["vec_id"])
    assert set(res["neighbor_id"]) <= ok
    assert res.groupby("query_id").size().max() <= 5

    full = embeddings_d(spark, SF_ORACLE).select("vec_id")
    via_full = (
        pq.search_df(queries, k=5, refine=100, filter_ids=full)
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    via_none = (
        pq.search_df(queries, k=5, refine=100)
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    assert via_full.equals(via_none)
