"""Chained steady-state maintenance ticks (zebra_spark/queries/tick.py,
VERDICT r9 #1): tick n+1 reads tick n's PERSISTED artifacts and appends
its delta — and the final state is byte-equal to a one-shot rebuild."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

import zebra_spark
from tests.conftest import SF_SMOKE
from zebra_spark.queries.tick import (
    TICK_APPEND_KINDS,
    _mirror_sf_dir,
    init_tick_state,
    run_tick,
)

zebra_spark.load_all_queries()

N_TICKS = 4


def _vhash(pdf):
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    rows = sorted(
        tuple(str(v) for v in r) for r in pdf.itertuples(index=False)
    )
    return hashlib.md5(str(rows).encode()).hexdigest()


@pytest.fixture(scope="module")
def chain(spark, tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("tickchain")
    """A production-shaped chain at SF_SMOKE: seeds frozen over the
    FIRST ingest batch (tick 0's vectors — nothing about later batches
    is known at init), then N_TICKS disjoint batches appended in turn.
    Runs against a private symlink mirror so the registry registrations
    inside run_tick cannot collide with other tests' derived tables."""
    from zebra_spark.io import embeddings_d, load

    mirror = _mirror_sf_dir(SF_SMOKE)
    state = str(tmp_path / "state")
    docs = load(spark, mirror, "documents").select("doc_id", "text")
    vecs = embeddings_d(spark, mirror).select("vec_id", "emb")
    init_tick_state(
        spark, mirror, state,
        seed_vecs=vecs.filter(F.col("vec_id") % N_TICKS == 0),
    )
    ticks = []
    for k in range(N_TICKS):
        timings: dict = {}
        run_tick(
            spark, mirror, state,
            docs.filter(F.col("doc_id") % N_TICKS == k),
            vecs.filter(F.col("vec_id") % N_TICKS == k),
            timings=timings,
        )
        ticks.append(timings)
    yield mirror, state, ticks
    from zebra_spark.caching import release_caches

    release_caches()


def test_tick_chain_equals_one_shot_rebuild(spark, chain):
    """THE steady-state claim, measured not modeled: after N chained
    append-only ticks, every maintained table is byte-equal to the
    from-scratch build over the final corpus (same frozen seeds — the
    one artifact a rebuild must inherit, exactly as in production)."""
    from zebra_spark.queries import dedup as dd

    mirror, state, ticks = chain
    # same frozen seeds for the rebuild; everything else built fresh
    prev = dd.register_maintained_table("cosseeds", mirror, f"{state}/cosseeds")
    try:
        rebuilt = {
            "sigs": dd.sig_table(spark, mirror),
            "toksets": dd.tokset_table(spark, mirror),
            "minhash": dd.pair_table(spark, mirror),
            "cosassign": dd.cosine_assign_table(spark, mirror),
            "cosine": dd.cosine_pair_table(spark, mirror),
            "clusters": dd.cluster_label_table(spark, mirror),
        }
        for kind, want in rebuilt.items():
            got = spark.read.parquet(f"{state}/{kind}")
            assert sorted(got.columns) == sorted(want.columns), kind
            assert _vhash(got.toPandas()) == _vhash(want.toPandas()), kind
    finally:
        dd.register_maintained_table("cosseeds", mirror, prev)


def test_tick_chain_quiet_and_appendonly(spark, chain):
    """Same-distribution batches never trigger the reseed path, every
    tick reports a bounded update cost, and the append tables only
    grow (monotone row counts tick over tick are implied by the
    equality test; here we pin the gate + timing surface)."""
    mirror, state, ticks = chain
    assert all(t["reseed_triggered"] is False for t in ticks)
    assert all(t["update_s"] > 0 for t in ticks)
    for kind in TICK_APPEND_KINDS:
        assert spark.read.parquet(f"{state}/{kind}").count() > 0, kind


def test_tick_chain_final_audit_equals_snapshot(spark, chain):
    """The nightly read side: an audited final tick (audit=True re-run
    of the last batch is not possible — batches are ingested — so the
    audit runs over the registered final artifacts) must be byte-equal
    to snapshot_audit over the same corpus built from scratch."""
    from zebra_spark.queries import dedup as dd
    from zebra_spark.queries.audit import snapshot_audit
    from zebra_spark.queries.tick import TICK_KINDS

    mirror, state, ticks = chain
    prevs = {
        kind: dd.register_maintained_table(kind, mirror, f"{state}/{kind}")
        for kind in TICK_KINDS
    }
    try:
        maintained = {
            s: df.toPandas() for s, df in snapshot_audit(spark, mirror).items()
        }
    finally:
        for kind, p in prevs.items():
            dd.register_maintained_table(kind, mirror, p)
    fresh = snapshot_audit(spark, mirror)
    for section, want in fresh.items():
        assert _vhash(maintained[section]) == _vhash(want.toPandas()), section


def test_tick_reseed_on_drifted_batch(spark, tmp_path):
    """A drifted batch must reseed the semantic family from scratch
    over ingested ∪ batch: new frozen seeds, new assignment, new pair
    table, new persisted baseline — byte-equal to a fresh combined
    build under the same (new) seeds — while quiet ticks before it
    left the baseline untouched.  The lexical family appends as usual
    (drift is a property of the embedding blocking only)."""
    from zebra_spark.io import embeddings_d, load
    from zebra_spark.queries import dedup as dd

    mirror = _mirror_sf_dir(SF_SMOKE)
    state = str(tmp_path / "state")
    docs = load(spark, mirror, "documents").select("doc_id", "text")
    vecs = embeddings_d(spark, mirror).select("vec_id", "emb")
    first = vecs.filter(F.col("vec_id") % 2 == 0)
    init_tick_state(spark, mirror, state, seed_vecs=first)
    t0: dict = {}
    run_tick(
        spark, mirror, state,
        docs.filter(F.col("doc_id") % 2 == 0), first, timings=t0,
    )
    assert t0["reseed_triggered"] is False
    base_before = spark.read.parquet(f"{state}/driftbase").collect()

    # the odd half, shifted far off-distribution: 3x + 10 per component
    shifted = vecs.filter(F.col("vec_id") % 2 == 1).select(
        "vec_id",
        F.expr("transform(emb, x -> CAST(3.0 * x + 10.0 AS DOUBLE))").alias(
            "emb"
        ),
    )
    t1: dict = {}
    run_tick(
        spark, mirror, state,
        docs.filter(F.col("doc_id") % 2 == 1), shifted, timings=t1,
    )
    assert t1["reseed_triggered"] is True
    base_after = spark.read.parquet(f"{state}/driftbase").collect()
    assert base_after != base_before  # baseline re-persisted

    # post-reseed semantic state == fresh combined build under the NEW
    # frozen seeds (read back from the state dir, like any consumer)
    e_all = first.unionByName(shifted)
    seeds = spark.read.parquet(f"{state}/cosseeds")
    want_assign = dd._assign_to_seeds(e_all, seeds)
    got_assign = spark.read.parquet(f"{state}/cosassign")
    assert _vhash(got_assign.toPandas()) == _vhash(want_assign.toPandas())
    want_pairs = dd._score_pairs(
        dd._cell_collide_pairs(
            want_assign, want_assign, max_cell=dd.NDUP_MAX_CELL
        ),
        e_all,
        vectorized=False,
    )
    got_pairs = spark.read.parquet(f"{state}/cosine")
    assert _vhash(got_pairs.toPandas()) == _vhash(want_pairs.toPandas())
    from zebra_spark.caching import release_caches

    release_caches()


def test_tick_quiet_path_scores_vectors_not_in_lake(spark, tmp_path):
    """r10 review: a QUIET tick's cosine delta must score against the
    state's own maintained vectors, not the lake — an ingest batch
    need not have landed in the embeddings table, and an endpoint
    missing from the scoring source silently drops the pair.  Batch 2
    here uses vec_ids the lake has never seen; the final maintained
    pair table must still equal the from-scratch build over ALL
    ingested vectors."""
    from zebra_spark.io import embeddings_d, load
    from zebra_spark.queries import dedup as dd

    mirror = _mirror_sf_dir(SF_SMOKE)
    state = str(tmp_path / "state")
    docs = load(spark, mirror, "documents").select("doc_id", "text")
    lake = embeddings_d(spark, mirror).select("vec_id", "emb")
    # same distribution (quiet), ids disjoint and ABOVE the lake's
    # (monotone), and absent from the lake parquet by construction
    unlanded = lake.select(
        (F.col("vec_id") + 10_000).alias("vec_id"), "emb"
    )
    all_vecs = lake.unionByName(unlanded)
    init_tick_state(spark, mirror, state, seed_vecs=all_vecs)
    t1: dict = {}
    run_tick(
        spark, mirror, state,
        docs.filter(F.col("doc_id") % 2 == 0), lake, timings=t1,
    )
    t2: dict = {}
    run_tick(
        spark, mirror, state,
        docs.filter(F.col("doc_id") % 2 == 1), unlanded, timings=t2,
    )
    assert t1["reseed_triggered"] is False
    assert t2["reseed_triggered"] is False

    seeds = spark.read.parquet(f"{state}/cosseeds")
    want_assign = dd._assign_to_seeds(all_vecs, seeds)
    got_assign = spark.read.parquet(f"{state}/cosassign")
    assert _vhash(got_assign.toPandas()) == _vhash(want_assign.toPandas())
    want_pairs = dd._score_pairs(
        dd._cell_collide_pairs(
            want_assign, want_assign, max_cell=dd.NDUP_MAX_CELL
        ),
        all_vecs,
        vectorized=False,
    )
    got_pairs = spark.read.parquet(f"{state}/cosine")
    assert got_pairs.count() == want_pairs.count() > 0
    assert _vhash(got_pairs.toPandas()) == _vhash(want_pairs.toPandas())
    from zebra_spark.caching import release_caches

    release_caches()


def test_tick_capped_out_of_order_batch_refused(spark, tmp_path, monkeypatch):
    """r10 review: the batch tick gets the same capped-backfill guard
    as streaming — an out-of-order batch whose touched cells exceed
    the cap would silently diverge from a capped rebuild, so run_tick
    must refuse it."""
    import pytest

    from zebra_spark.io import embeddings_d, load
    from zebra_spark.queries import dedup as dd

    mirror = _mirror_sf_dir(SF_SMOKE)
    state = str(tmp_path / "state")
    docs = load(spark, mirror, "documents").select("doc_id", "text")
    vecs = embeddings_d(spark, mirror).select("vec_id", "emb")
    init_tick_state(spark, mirror, state, seed_vecs=vecs)
    run_tick(
        spark, mirror, state,
        docs.filter(F.col("doc_id") % 2 == 0),
        vecs.filter(F.col("vec_id") % 2 == 0),
    )
    # the odd ids interleave below the state's max -> out-of-order;
    # with a cap of 1 every shared cell is over cap -> refused
    monkeypatch.setattr(dd, "NDUP_MAX_CELL", 1)
    with pytest.raises(ValueError, match="monotonically increasing"):
        run_tick(
            spark, mirror, state,
            docs.filter(F.col("doc_id") % 2 == 1),
            vecs.filter(F.col("vec_id") % 2 == 1),
        )
    from zebra_spark.caching import release_caches

    release_caches()


def test_tick_extends_epoch_export(spark, tmp_path):
    """r11 (VERDICT r10 #2): a tick can EXTEND the epoch-major export —
    run_tick(export_dir=..., export_epoch=k) publishes each batch's
    shard files in the same call, and after the full chain the export
    is identical to the one-shot epoch-major order over the corpus
    (q_export_append_order's fixture convention doc_id % 3 == epoch
    matches the 3-tick split exactly)."""
    from zebra_spark.io import embeddings_d, load

    mirror = _mirror_sf_dir(SF_SMOKE)
    state = str(tmp_path / "state")
    export = str(tmp_path / "export")
    docs = load(spark, mirror, "documents").select("doc_id", "text")
    vecs = embeddings_d(spark, mirror).select("vec_id", "emb")
    init_tick_state(spark, mirror, state, seed_vecs=vecs)
    for k in range(3):
        timings: dict = {}
        run_tick(
            spark, mirror, state,
            docs.filter(F.col("doc_id") % 3 == k),
            vecs.filter(F.col("vec_id") % 3 == k),
            timings=timings,
            export_dir=export, export_epoch=k,
        )
        assert timings["export_s"] >= 0
    got = (
        spark.read.parquet(export)
        .select(
            "doc_id",
            F.col("epoch").cast("int").alias("epoch"),
            F.col("shard").cast("int").alias("shard"),
            "pos",
        )
        .toPandas()
    )
    want = zebra_spark.QUERIES["q_export_append_order"](
        spark, SF_SMOKE
    ).toPandas()
    assert _vhash(got) == _vhash(want)

    # export_dir without an epoch key is a contract error, not a guess
    with pytest.raises(ValueError, match="export_epoch"):
        run_tick(
            spark, mirror, state, docs.limit(1), vecs.limit(1),
            export_dir=export,
        )
    from zebra_spark.caching import release_caches

    release_caches()


def test_tick_takedown_equals_fresh_rebuild(spark, tmp_path):
    """r11: tick_takedown removes an id set from EVERY maintained
    table + the cluster labels + (optionally) the epoch export, and
    the post-takedown state is bit-identical to a fresh chain over
    the surviving corpus under the same frozen seeds.  The seed guard
    refuses a takedown that hits the frozen seed set."""
    from zebra_spark.io import embeddings_d, load
    from zebra_spark.queries.tick import TICK_KINDS, tick_takedown

    mirror = _mirror_sf_dir(SF_SMOKE)
    state = str(tmp_path / "state")
    export = str(tmp_path / "export")
    docs = load(spark, mirror, "documents").select("doc_id", "text")
    vecs = embeddings_d(spark, mirror).select("vec_id", "emb")
    seed_vecs = vecs.filter(F.col("vec_id") % 3 == 0)
    init_tick_state(spark, mirror, state, seed_vecs=seed_vecs)
    for k in range(3):
        run_tick(
            spark, mirror, state,
            docs.filter(F.col("doc_id") % 3 == k),
            vecs.filter(F.col("vec_id") % 3 == k),
            export_dir=export, export_epoch=k,
        )

    # ids far above the frozen seed prefix, spread across ticks
    takedown = docs.filter(
        (F.col("doc_id") % 7 == 3) & (F.col("doc_id") > 100)
    ).select("doc_id")
    n_removed = takedown.count()
    assert n_removed > 0
    pre_export = (
        spark.read.option("basePath", export).parquet(export)
        .select("doc_id", "shard", "pos").toPandas()
    )
    tick_takedown(spark, mirror, state, takedown, export_dir=export)

    # fresh rebuild over the survivors, same frozen seeds, one tick
    fresh = str(tmp_path / "fresh")
    init_tick_state(spark, mirror, fresh, seed_vecs=seed_vecs)
    surv_docs = docs.join(takedown, "doc_id", "left_anti")
    surv_vecs = vecs.join(
        takedown.withColumnRenamed("doc_id", "vec_id"), "vec_id",
        "left_anti",
    )
    run_tick(spark, mirror, fresh, surv_docs, surv_vecs)
    for kind in TICK_KINDS:
        if kind in ("cosseeds", "driftbase"):
            continue  # frozen/init artifacts, not takedown targets
        got = spark.read.parquet(f"{state}/{kind}").toPandas()
        want = spark.read.parquet(f"{fresh}/{kind}").toPandas()
        assert _vhash(got) == _vhash(want), kind
    got_vecs = spark.read.parquet(f"{state}/vecs").select("vec_id")
    assert got_vecs.join(takedown.withColumnRenamed(
        "doc_id", "vec_id"), "vec_id", "left_semi").count() == 0

    # export scrubbed: removed docs gone, survivors' positions stable
    post_export = (
        spark.read.option("basePath", export).parquet(export)
        .select("doc_id", "shard", "pos").toPandas()
    )
    removed = set(r.doc_id for r in takedown.collect())
    assert not (post_export.doc_id.isin(removed)).any()
    want_export = pre_export[~pre_export.doc_id.isin(removed)]
    assert _vhash(post_export) == _vhash(want_export)

    # seed guard: the smallest seed id is by construction a frozen seed
    seed_min = spark.read.parquet(f"{state}/cosseeds").agg(
        F.min("cell_id")
    ).first()[0]
    with pytest.raises(ValueError, match="seed"):
        tick_takedown(
            spark, mirror, state,
            spark.createDataFrame([(int(seed_min),)], "doc_id bigint"),
        )
    from zebra_spark.caching import release_caches

    release_caches()

def test_tick_export_compact_cadence(spark, tmp_path):
    """r12 (VERDICT r11 #3): run_tick(compact_export_every=K) folds
    the strictly-earlier export epochs every K-th tick — the tree
    equals building the same epochs with export_epoch_append and
    folding manually at the same boundary, and the knob refuses to
    run without an export_dir."""
    from zebra_spark.io import embeddings_d, load
    from zebra_spark.queries.text import (
        export_epoch_append,
        export_epoch_compact,
    )

    mirror = _mirror_sf_dir(SF_SMOKE)
    state = str(tmp_path / "state")
    exp_a = str(tmp_path / "exp_cadence")
    exp_b = str(tmp_path / "exp_manual")
    docs = load(spark, mirror, "documents").select("doc_id", "text")
    vecs = embeddings_d(spark, mirror).select("vec_id", "emb")
    init_tick_state(spark, mirror, state, seed_vecs=vecs)
    for k in range(3):
        batch = docs.filter(F.col("doc_id") % 3 == k)
        run_tick(
            spark, mirror, state,
            batch,
            vecs.filter(F.col("vec_id") % 3 == k),
            export_dir=exp_a, export_epoch=k, compact_export_every=2,
        )
        export_epoch_append(
            spark, exp_b,
            batch.withColumn("n_chars", F.length("text")), k,
        )
        if k == 2:
            # the manual fold at the SAME boundary the cadence fires
            # on (after epoch 2's publish, fold <= 1)
            export_epoch_compact(spark, exp_b, 1)

    from pathlib import Path

    assert sorted(
        d.name for d in Path(exp_a).iterdir() if d.is_dir()
    ) == ["epoch=1", "epoch=2"]

    def read_export(exp):
        return (
            spark.read.option("basePath", exp)
            .parquet(exp)
            .select(
                "doc_id",
                F.col("epoch").cast("int").alias("epoch"),
                F.col("shard").cast("int").alias("shard"),
                "pos",
            )
            .toPandas()
        )

    assert _vhash(read_export(exp_a)) == _vhash(read_export(exp_b))

    with pytest.raises(ValueError, match="compact_export_every"):
        run_tick(
            spark, mirror, state, docs.limit(1), vecs.limit(1),
            compact_export_every=2,
        )
    from zebra_spark.caching import release_caches

    release_caches()


def test_tick_label_maintenance_train_once_equals_per_call(spark, tmp_path):
    """r13 (VERDICT r12 #4): the tick's label-maintenance step reuses
    the IVFIndex trained ONCE at init (persisted labelidx/) instead of
    label_prop_ann_df's per-call Lloyd.  Because training is seeded-
    deterministic over the frozen seed set, train-once must reproduce
    per-call training's output EXACTLY after N chained ticks — and the
    cadence knob must skip the step on off-cadence ticks."""
    from zebra_spark.io import embeddings_d, load
    from zebra_spark.queries.vector import label_prop_ann_df

    mirror = _mirror_sf_dir(SF_SMOKE)
    state = str(tmp_path / "state")
    docs = load(spark, mirror, "documents").select("doc_id", "text")
    emb = embeddings_d(spark, mirror)
    seeds = emb.filter(F.col("vec_id") % 5 == 0).select(
        F.col("vec_id").alias("lab_id"), "label", F.col("emb").alias("le")
    )
    vecs = emb.filter(F.col("vec_id") % 5 != 0).select("vec_id", "emb")

    init_tick_state(
        spark, mirror, state,
        seed_vecs=vecs.filter(F.col("vec_id") % 3 == 0),
        label_seeds=seeds,
    )
    n_ticks = 3
    timings_by_tick = []
    for k in range(n_ticks):
        timings: dict = {}
        run_tick(
            spark, mirror, state,
            docs.filter(F.col("doc_id") % n_ticks == k),
            vecs.filter(F.col("vec_id") % n_ticks == k),
            timings=timings,
            label_prop_every=2,  # ticks 0 and 2 propagate; tick 1 skips
            tick_no=k,
        )
        timings_by_tick.append(timings)
        if k == 0:
            # DELTA discipline: the first trigger labeled only the
            # first batch, not a placeholder for the corpus
            n0 = spark.read.parquet(f"{state}/proplabels").count()
            assert n0 == vecs.filter(F.col("vec_id") % n_ticks == 0).count()
    assert "label_prop_s" in timings_by_tick[0]
    assert "label_prop_s" not in timings_by_tick[1]
    assert "label_prop_s" in timings_by_tick[2]

    got = spark.read.parquet(f"{state}/proplabels").toPandas()
    # per-call training over the same frozen seeds + the accumulated
    # corpus (all three batches landed by tick 2) — the delta appends
    # (backlog of ticks 1+2 at the second trigger) must reproduce the
    # one-shot propagation exactly
    want = label_prop_ann_df(spark, seeds, vecs).toPandas()
    assert _vhash(got) == _vhash(want)
    assert len(got) == vecs.count()

    # takedown strips propagated labels with everything else, and a
    # label-seed hit is refused like a cosine-seed hit
    from zebra_spark.queries.tick import tick_takedown

    # vec_id % 3 == 1 rows were never cosine-seed candidates (the
    # cosine seeds froze over the % 3 == 0 bootstrap), so the
    # cosine-seed guard cannot fire on them
    victim = vecs.filter(F.col("vec_id") % 3 == 1).limit(20).select("vec_id")
    tick_takedown(spark, mirror, state, victim)
    left = spark.read.parquet(f"{state}/proplabels")
    assert left.join(
        victim.withColumnRenamed("vec_id", "v"),
        left.vec_id == F.col("v"), "left_semi",
    ).count() == 0
    with pytest.raises(ValueError, match="label seeds"):
        tick_takedown(
            spark, mirror, state,
            seeds.limit(1).select(F.col("lab_id").alias("vec_id")),
        )


def test_tick_label_maintenance_requires_init(spark, tmp_path):
    """label_prop_every without init_tick_state(label_seeds=...) must
    fail loudly, not propagate from a missing index."""
    from zebra_spark.io import embeddings_d, load

    mirror = _mirror_sf_dir(SF_SMOKE)
    state = str(tmp_path / "state")
    docs = load(spark, mirror, "documents").select("doc_id", "text")
    vecs = embeddings_d(spark, mirror).select("vec_id", "emb")
    init_tick_state(spark, mirror, state, seed_vecs=vecs)
    with pytest.raises(ValueError, match="label_seeds"):
        run_tick(
            spark, mirror, state, docs, vecs,
            label_prop_every=1, tick_no=0,
        )
    with pytest.raises(ValueError, match="tick_no"):
        run_tick(spark, mirror, state, docs, vecs, label_prop_every=1)


def test_add_label_seeds_invalidates_and_repropagates(spark, tmp_path):
    """r13: growing the frozen label seed set (add_label_seeds) must
    assign the new seeds to the FROZEN centroids (no retrain),
    invalidate proplabels/ (any existing label may be stale once a
    nearer seed exists), and let the next trigger re-propagate the
    whole corpus — after which the state equals the kernel run with
    the same updated index over the same (old ∪ new) seeds."""
    from zebra_spark.index.ivf import IVFIndex
    from zebra_spark.io import embeddings_d, load
    from zebra_spark.queries.tick import add_label_seeds
    from zebra_spark.queries.vector import label_prop_ann_df

    mirror = _mirror_sf_dir(SF_SMOKE)
    state = str(tmp_path / "state")
    docs = load(spark, mirror, "documents").select("doc_id", "text")
    emb = embeddings_d(spark, mirror)
    seeds_a = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("lab_id"), "label", F.col("emb").alias("le")
    )
    seeds_b = emb.filter(F.col("vec_id") % 10 == 5).select(
        F.col("vec_id").alias("lab_id"), "label", F.col("emb").alias("le")
    )
    vecs = emb.filter(F.col("vec_id") % 5 != 0).select("vec_id", "emb")

    init_tick_state(
        spark, mirror, state,
        seed_vecs=vecs.filter(F.col("vec_id") % 3 == 0),
        label_seeds=seeds_a,
    )
    centroids_before = IVFIndex.load(spark, f"{state}/labelidx").centroids

    run_tick(
        spark, mirror, state,
        docs.filter(F.col("doc_id") % 2 == 0),
        vecs.filter(F.col("vec_id") % 2 == 0),
        label_prop_every=1, tick_no=0,
    )
    n_half = vecs.filter(F.col("vec_id") % 2 == 0).count()
    assert spark.read.parquet(f"{state}/proplabels").count() == n_half

    n_added = add_label_seeds(spark, state, seeds_b)
    assert n_added == seeds_b.count()
    # invalidated: the next trigger's backlog is EVERYTHING
    from pathlib import Path as _P
    assert not _P(f"{state}/proplabels").exists()
    idx_after = IVFIndex.load(spark, f"{state}/labelidx")
    # frozen centroids, grown assignments
    import numpy as np
    assert np.array_equal(centroids_before, idx_after.centroids)
    assert idx_after.assignments.count() == (
        seeds_a.count() + seeds_b.count()
    )

    run_tick(
        spark, mirror, state,
        docs.filter(F.col("doc_id") % 2 == 1),
        vecs.filter(F.col("vec_id") % 2 == 1),
        label_prop_every=1, tick_no=1,
    )
    got = spark.read.parquet(f"{state}/proplabels").toPandas()
    want = label_prop_ann_df(
        spark, seeds_a.unionByName(seeds_b), vecs, index=idx_after
    ).toPandas()
    assert _vhash(got) == _vhash(want)
    assert len(got) == vecs.count()


def test_add_label_seeds_invalidates_before_committing(
    spark, tmp_path, monkeypatch
):
    """ADVICE r13: add_label_seeds must rmtree proplabels/ BEFORE the
    index save and the labelseeds append.  A crash between the
    invalidation and the commit then degrades to a correct full
    re-propagation over the OLD seed set — never to the old order's
    permanently-stale labels (new seeds active, proplabels voted
    without them, and the backlog anti-join never re-votes).  The
    crash is injected by making IVFIndex.save raise; a retry of the
    same call must then complete the add normally."""
    from zebra_spark.index.ivf import IVFIndex
    from zebra_spark.io import embeddings_d, load
    from zebra_spark.queries.tick import (
        add_label_seeds,
        propagate_label_backlog,
    )
    from zebra_spark.queries.vector import label_prop_ann_df
    from pathlib import Path as _P

    mirror = _mirror_sf_dir(SF_SMOKE)
    state = str(tmp_path / "state")
    docs = load(spark, mirror, "documents").select("doc_id", "text")
    emb = embeddings_d(spark, mirror)
    seeds_a = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("lab_id"), "label", F.col("emb").alias("le")
    )
    seeds_b = emb.filter(F.col("vec_id") % 10 == 5).select(
        F.col("vec_id").alias("lab_id"), "label", F.col("emb").alias("le")
    )
    vecs = emb.filter(F.col("vec_id") % 5 != 0).select("vec_id", "emb")

    init_tick_state(
        spark, mirror, state,
        seed_vecs=vecs.filter(F.col("vec_id") % 3 == 0),
        label_seeds=seeds_a,
    )
    run_tick(
        spark, mirror, state, docs, vecs,
        label_prop_every=1, tick_no=0,
    )
    assert spark.read.parquet(f"{state}/proplabels").count() == vecs.count()
    n_a = seeds_a.count()

    # crash INSIDE add_label_seeds, after the invalidation, before the
    # index/seed commit
    real_save = IVFIndex.save
    monkeypatch.setattr(
        IVFIndex, "save",
        lambda self, path: (_ for _ in ()).throw(RuntimeError("crash")),
    )
    with pytest.raises(RuntimeError, match="crash"):
        add_label_seeds(spark, state, seeds_b)
    monkeypatch.setattr(IVFIndex, "save", real_save)

    # the invalidation landed FIRST; the commit never did
    assert not _P(f"{state}/proplabels").exists()
    assert spark.read.parquet(f"{state}/labelseeds").count() == n_a
    idx_disk = IVFIndex.load(spark, f"{state}/labelidx")
    assert idx_disk.assignments.count() == n_a

    # worst case before the retry: the next trigger is a correct full
    # re-propagation over the OLD seed set (wasted work, no wrong rows)
    propagate_label_backlog(spark, state, vecs)
    got = spark.read.parquet(f"{state}/proplabels").toPandas()
    want = label_prop_ann_df(spark, seeds_a, vecs, index=idx_disk).toPandas()
    assert _vhash(got) == _vhash(want)

    # the retry completes the add: invalidated again, both seeds live
    n_added = add_label_seeds(spark, state, seeds_b)
    assert n_added == seeds_b.count()
    assert not _P(f"{state}/proplabels").exists()
    assert spark.read.parquet(f"{state}/labelseeds").count() == (
        n_a + seeds_b.count()
    )
    propagate_label_backlog(spark, state, vecs)
    idx_after = IVFIndex.load(spark, f"{state}/labelidx")
    got2 = spark.read.parquet(f"{state}/proplabels").toPandas()
    want2 = label_prop_ann_df(
        spark, seeds_a.unionByName(seeds_b), vecs, index=idx_after
    ).toPandas()
    assert _vhash(got2) == _vhash(want2)
