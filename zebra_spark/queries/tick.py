"""Chained steady-state maintenance ticks (VERDICT r9 #1).

`queries.audit.ingest_then_audit` proves the nightly tick's DELTA paths
are exact, but its maintained artifacts are rebuilt per call as
`base ∪ delta` session scaffolding — the "production appends the delta
to maintained parquet" sentence was inferred, never executed.  This
module executes it: `init_tick_state` bootstraps a persisted state
directory (frozen seeds + drift baseline + empty maintained tables) and
`run_tick` ingests one batch by APPENDING its deltas to the persisted
parquet — tick n+1 reads exactly what tick n wrote, nothing is rebuilt.

State directory layout (plain parquet — the batch twin of
streaming.py's exactly-once epoch state; a crash-replay story belongs
to the streaming maintainers, this is the nightly batch tick):

    sigs/       (doc_id, band, key)                appended per tick
    toksets/    (doc_id, words)                    appended per tick
    minhash/    (doc_a, doc_b, n_common, na, nb)   appended per tick
    vecs/       (vec_id, emb)                      appended per tick
                                                   (raw truth — batches
                                                   need not be in the
                                                   lake; scoring + reseed
                                                   read THIS, r10 review)
    cosassign/  (vec_id, cell_id)                  appended per tick
    cosine/     (id_a, id_b, dist)                 appended per tick
    clusters/   (doc_id, cluster)                  rewritten per tick
                                                   (|V| rows, delta cost)
    cosseeds/   (cell_id, ce)                      frozen at init /
                                                   reseed only
    driftbase/  (n, mse)                           written at init /
                                                   reseed only

Why the chain equals a one-shot rebuild (each step already pinned):
signatures/toksets are per-row deterministic (batch_signatures /
batch_toksets — disjoint batches partition the full tables); a verified
pair (a, b) is emitted by exactly one tick — the one that ingests its
LATER endpoint (pair_table_delta emits pairs involving >=1 batch doc
against the corpus-so-far, both-new pairs dedup inside the delta); the
same argument covers cosine pairs under frozen seeds
(cosine_assign_delta determinism); labels via incremental_components
== full CC (star-union preserves connectivity classes).  The composite
equality — N chained ticks, final state byte-equal to from-scratch —
is pinned by tests/test_tick.py and driver-hash-checked end-to-end by
q_tick_chain_pairs / q_tick_chain_cosine / q_tick_chain_clusters, whose
oracles recompute the final corpus from scratch in SQL.

Scale shape at 100 TB: per-tick cost is batch-proportional (the delta
joins touch batch x bucket/cell volumes; appends write only delta rows;
the label merge iterates |V| + |delta| star edges) and FLAT in
accumulated corpus size — measured across a chained run in
scripts/tick_chain_scale.py, recorded in SCALING.md.

No reference counterpart (emmyoh/zebra is a vector store); this is the
LLM-data-pipeline maintenance surface mandated by SURVEY.md §2.C.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import threading
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zebra_spark.functions import rnd
from zebra_spark.registry import query, sql_rnd

# append-maintained kinds, in ingest order (sigs/toksets must land
# before the lexical delta reads them; vecs before the scoring that
# reads it; cosassign before the cosine delta's cell join)
TICK_APPEND_KINDS = ("sigs", "toksets", "minhash", "vecs", "cosassign",
                     "cosine")
# kinds registered with the session's derived-table registry; vecs is
# tick-state-internal RAW TRUTH (the ingested vectors themselves —
# batches need not have landed in the lake, r10 review) and has no
# registry consumers, so it is persisted but never registered
TICK_KINDS = ("sigs", "toksets", "minhash", "cosassign", "cosine",
              "clusters", "cosseeds", "driftbase")


def _register_all(sf_dir: str, state_dir: str) -> dict[str, str | None]:
    """Point every maintained-table kind at the persisted state dir;
    returns the previous registrations for the finally-restore."""
    from zebra_spark.queries.dedup import register_maintained_table

    return {
        kind: register_maintained_table(kind, sf_dir, f"{state_dir}/{kind}")
        for kind in TICK_KINDS
    }


def _restore_all(sf_dir: str, prevs: dict[str, str | None]) -> None:
    from zebra_spark.queries.dedup import register_maintained_table

    for kind, prev in prevs.items():
        register_maintained_table(kind, sf_dir, prev)


def _swap_write(spark: SparkSession, state_dir: str, kind: str,
                df: DataFrame) -> None:
    """Full rewrite of one maintained table via write-aside + rename:
    `df` may READ the table being replaced (the label merge reads the
    pre-tick labels), so writing in place would be a read-modify-write
    of the same files mid-job.  POSIX/HDFS rename is atomic; object
    stores get copy+delete (same caveat as database.save_database)."""
    from zebra_spark.fsutil import rename, rmtree

    nxt = f"{state_dir}/{kind}__next"
    rmtree(spark, nxt)
    df.write.mode("overwrite").parquet(nxt)
    rmtree(spark, f"{state_dir}/{kind}")
    rename(spark, nxt, f"{state_dir}/{kind}")


# target rows per appended parquet file (guide §6 output sizing).  The
# tick's delta schemas are a handful of scalar columns (~5 B/row under
# zstd, measured: 872k pair rows = 4.1 MB), so 8M rows ≈ 40-60 MB files
# — env-overridable for clusters whose delta rows are wider.
APPEND_ROWS_PER_FILE = int(
    os.environ.get("ZEBRA_APPEND_ROWS_PER_FILE", "8000000")
)
# floor on rows per appended file when SPLITTING an append for write
# parallelism (see _append_sized): a split task never writes fewer
# rows than this, so the accretion bound survives — at ~5 B/row this
# keeps every appended file ≥ ~5-10 MB zstd.  Env-overridable with
# the same caveat as APPEND_ROWS_PER_FILE (wider delta rows -> lower).
APPEND_MIN_ROWS_PER_FILE = int(
    os.environ.get("ZEBRA_APPEND_MIN_ROWS_PER_FILE", "1000000")
)


def _append_sized(df: DataFrame, path: str) -> None:
    """Append a MATERIALIZED (localCheckpoint'ed) delta with a
    size-derived file count (guide §6).  The r17 first attempt used
    `.hint("rebalance")`, but AQE's default
    coalescePartitions.parallelismFirst=true makes the post-rebalance
    coalescing respect only minPartitionSize (1 MB) instead of the
    64 MB advisory, so each tick still appended one ~0.25 MB file per
    shuffle partition (measured: minhash/ grew 17 -> 49 -> 81 files
    over 3 ticks) and every later read of the maintained dir paid
    per-file open cost.  A cached count (the frame is already in the
    block manager) + coalesce writes size-derived files with NO
    shuffle at all — the rebalance exchange is gone too.  coalesce
    would serialize an unmaterialized lineage, hence the
    checkpointed-input contract.

    Write-parallelism floor (r17 continuation, guide §2.6 stragglers /
    §1.2): the pure ceil(rows / APPEND_ROWS_PER_FILE) count left the
    whole append in ONE task whenever the delta fit one file — at
    sf0.1 the tick-3 pair delta (4.25M rows) spent 2.5-3.4 s in a
    single-task zstd encode while 31 cores idled, and at any scale the
    append's wall clock was one full-file encode.  When the
    size-derived count underfills the cluster, the append now splits
    further — up to defaultParallelism tasks — but never below
    APPEND_MIN_ROWS_PER_FILE rows per file, so the file-count bound
    that motivated _append_sized holds (measured after: same delta
    writes 5 files in ~0.8 s; a 3-tick chain leaves ≤ ~10 files per
    maintained table, and the r17 read-side A/B already showed tick
    reads indifferent at far worse counts)."""
    n = df.count()
    size_parts = max(1, -(-n // APPEND_ROWS_PER_FILE))
    par = df.sparkSession.sparkContext.defaultParallelism
    nparts = max(size_parts, min(par, -(-n // APPEND_MIN_ROWS_PER_FILE)))
    df.coalesce(nparts).write.mode("append").parquet(path)


def init_tick_state(
    spark: SparkSession,
    sf_dir: str,
    state_dir: str,
    seed_vecs: DataFrame,
    label_seeds: DataFrame | None = None,
    label_k_cells: int = 16,
) -> None:
    """Bootstrap a chained-tick state directory: freeze the cosine
    blocking's seed set over `seed_vecs` (vec_id, emb — the bootstrap
    corpus: the first snapshot in production; the full-corpus
    projection when a plain-SQL oracle must be able to recompute the
    chain, see q_tick_chain_cosine), persist its drift baseline beside
    the seeds, and write every maintained table EMPTY — each through
    the same function that appends to it later, so the schemas cannot
    drift from the append path.  The first run_tick then ingests the
    first batch through the identical code path as every later tick.

    `label_seeds` (r13, VERDICT r12 #4): optional (lab_id, label, le)
    frame enabling the tick's label-maintenance step — the seeds are
    frozen under `labelseeds/` and an IVFIndex is trained over them
    ONCE, persisted under `labelidx/` (IVFIndex.save).  Every
    run_tick(label_prop_every=K) then LOADS the index instead of
    retraining — label_prop_ann_df's per-call Lloyd is right for the
    one-shot query, wasteful on a cadence where the seed set is
    frozen (train-once ≡ per-call pinned by tests/test_tick.py,
    because training is seeded-deterministic over the same seeds)."""
    from zebra_spark.io import load
    from zebra_spark.queries import dedup as dd

    if label_seeds is not None:
        init_label_state(spark, state_dir, label_seeds, label_k_cells)

    seeds = dd._cosine_seeds(seed_vecs.select("vec_id", "emb"))
    seeds.write.mode("overwrite").parquet(f"{state_dir}/cosseeds")
    seeds = spark.read.parquet(f"{state_dir}/cosseeds")
    dd.cell_drift_audit(spark, sf_dir, seed_vecs, "corpus", seeds).select(
        "n", "mse"
    ).write.mode("overwrite").parquet(f"{state_dir}/driftbase")

    # the empty-table bootstrap writes run CONCURRENTLY where their
    # dependencies allow (r17 optimization pass, guide §2.6: each is a
    # tiny single-stage job; sequential they cost seven scheduling
    # round-trips).  The row tables (sigs/toksets/vecs — the ingested
    # vectors are the tick's own raw truth, r10 review: batches need
    # not have landed in the lake) are mutually independent; after
    # registration, minhash and clusters are independent of everything
    # else, while the cosine delta's plan READS the registered
    # cosassign parquet at construction time, so cosassign must be on
    # disk first — that pair stays a sequential chain inside its slot.
    from concurrent.futures import ThreadPoolExecutor

    no_docs = load(spark, sf_dir, "documents").select("doc_id", "text").limit(0)

    def _w(df, kind: str) -> None:
        df.write.mode("overwrite").parquet(f"{state_dir}/{kind}")

    with ThreadPoolExecutor(max_workers=3) as ex:
        list(ex.map(lambda j: j(), (
            lambda: _w(dd.batch_signatures(no_docs), "sigs"),
            lambda: _w(dd.batch_toksets(no_docs), "toksets"),
            lambda: _w(seed_vecs.select("vec_id", "emb").limit(0), "vecs"),
        )))
    prevs = _register_all(sf_dir, state_dir)
    try:
        no_ids = no_docs.select("doc_id")
        no_vecs = seed_vecs.select("vec_id", "emb").limit(0)

        def _cos_chain() -> None:
            _w(dd.cosine_assign_delta(spark, sf_dir, no_vecs), "cosassign")
            _w(
                dd.cosine_pair_table_delta(
                    spark, sf_dir, new_ids=no_vecs.select("vec_id")
                ),
                "cosine",
            )

        with ThreadPoolExecutor(max_workers=3) as ex:
            list(ex.map(lambda j: j(), (
                lambda: _w(
                    dd.pair_table_delta(spark, sf_dir, no_ids), "minhash"
                ),
                _cos_chain,
                lambda: _w(
                    spark.createDataFrame(
                        [], "doc_id bigint, cluster bigint"
                    ),
                    "clusters",
                ),
            )))
    finally:
        _restore_all(sf_dir, prevs)


def init_label_state(
    spark: SparkSession,
    state_dir: str,
    label_seeds: DataFrame,
    k_cells: int = 16,
) -> None:
    """Bootstrap the label-maintenance state under any maintained
    state dir (shared by init_tick_state and the streaming cosine
    state): freeze `label_seeds` (lab_id, label, le) under
    `labelseeds/` and train+persist the IVFIndex over them ONCE under
    `labelidx/` — every later trigger LOADS it (train-once;
    seeded-deterministic, so train-once == per-call by construction)."""
    from zebra_spark.index.ivf import IVFIndex

    label_seeds.select("lab_id", "label", "le").write.mode(
        "overwrite"
    ).parquet(f"{state_dir}/labelseeds")
    frozen = spark.read.parquet(f"{state_dir}/labelseeds")
    IVFIndex.train(
        spark,
        sf_dir="",
        k=k_cells,
        corpus=frozen.select(
            F.col("lab_id").alias("vec_id"), F.col("le").alias("emb")
        ),
    ).save(f"{state_dir}/labelidx")


def propagate_label_backlog(
    spark: SparkSession,
    state_dir: str,
    vecs_all: DataFrame,
    weighted: bool = False,
) -> None:
    """ONE label-maintenance trigger over a maintained state (shared
    by run_tick's cadence and streaming.maintain_label_table):
    propagate labels from the frozen `labelseeds/` via the persisted
    `labelidx/` to the BACKLOG of `vecs_all` — rows without a
    `proplabels/` entry yet — and APPEND.  Under frozen seeds each
    vector's vote is independent, so backlog-append == full
    re-propagation (delta cost, pinned by tests/test_tick.py).

    IDEMPOTENT by construction: the backlog anti-join makes a
    re-trigger over the same vectors a no-op append (zero rows), so a
    crash-replayed streaming epoch cannot double-label — a crashed
    append itself publishes nothing (parquet jobs commit via the
    output committer's temporary dir)."""
    from zebra_spark.fsutil import exists as _fs_exists
    from zebra_spark.index.ivf import IVFIndex
    from zebra_spark.queries.vector import label_prop_ann_df

    lab = spark.read.parquet(f"{state_dir}/labelseeds")
    idx = IVFIndex.load(spark, f"{state_dir}/labelidx")
    vecs_all = vecs_all.select("vec_id", "emb")
    if _fs_exists(spark, f"{state_dir}/proplabels"):
        backlog = vecs_all.join(
            spark.read.parquet(f"{state_dir}/proplabels").select("vec_id"),
            "vec_id",
            "left_anti",
        )
    else:
        backlog = vecs_all
    label_prop_ann_df(
        spark, lab, backlog, weighted=weighted, index=idx
    ).write.mode("append").parquet(f"{state_dir}/proplabels")


def add_label_seeds(
    spark: SparkSession, state_dir: str, new_seeds: DataFrame
) -> int:
    """Grow the frozen label seed set incrementally (r13, closing the
    label lifecycle): append `new_seeds` (lab_id, label, le — ids
    disjoint from every earlier batch, the same contract as tick
    batches) to `labelseeds/`, assign them to the FROZEN labelidx
    centroids (IVFIndex.add — one broadcast join, no retraining),
    persist the updated index, and INVALIDATE `proplabels/`: a new
    seed can be nearer to any already-labeled vector than every old
    seed, so every propagated label is potentially stale — the next
    label_prop trigger re-propagates the full corpus (backlog ==
    everything), after which the delta discipline resumes.  Returns
    seeds added.

    ORDER MATTERS (ADVICE r13): the invalidation runs FIRST.  Were it
    last, a crash between the index/seed update and the rmtree would
    leave the new seeds active while stale labels — voted without them
    — survived permanently (the backlog anti-join never re-votes an
    already-labeled vector).  Invalidate-first degrades every crash
    window to a correct outcome instead: after the rmtree alone, the
    next trigger re-propagates the full corpus over the OLD seed set
    (wasted work, no wrong rows); after idx.save but before the seed
    append, the index carries assignments for seeds labelseeds/ does
    not know yet, which the propagation's inner join to the seed table
    simply drops — again the old-seed-set propagation (a probe into a
    cell holding only not-yet-appended seeds can transiently draw
    fewer candidates, but no WRONG label is ever written, and the
    retry heals the window).  Re-running the call after any
    crash completes the add (the batch's ids are disjoint by contract,
    like tick batches, so only a crash INSIDE the retried idx.add/save
    pair itself could double-assign — the same at-most-once retry
    contract every tick append carries).

    Centroids stay frozen, so seed-cell balance drifts as batches
    accumulate (exactly the IVFIndex.add contract) — cell_sizes() is
    the audit; restoring balance = a fresh label bootstrap
    (init_tick_state's label_seeds over the full seed set), which is
    reseed-class maintenance, not a tick."""
    from zebra_spark.fsutil import rmtree
    from zebra_spark.index.ivf import IVFIndex

    new = new_seeds.select("lab_id", "label", "le").localCheckpoint()
    rmtree(spark, f"{state_dir}/proplabels")
    idx = IVFIndex.load(spark, f"{state_dir}/labelidx")
    n = idx.add(
        new.select(F.col("lab_id").alias("vec_id"), F.col("le").alias("emb"))
    )
    idx.save(f"{state_dir}/labelidx")
    new.write.mode("append").parquet(f"{state_dir}/labelseeds")
    return n


def _reseed_tick_state(
    spark: SparkSession, sf_dir: str, state_dir: str
) -> None:
    """Drift-triggered reseed INSIDE the batch tick (the batch twin of
    streaming.reseed_cosine_state): deltas against stale blocking are
    meaningless, so the semantic artifacts rebuild from scratch over
    ingested ∪ batch — new frozen seeds, full re-assignment, full
    capped pair table, new persisted baseline.  The raw vectors come
    from the state's OWN maintained vecs table (the batch is already
    appended there by run_tick) — never from the lake, whose snapshot
    need not contain the ingested vectors at all (r10 review: the
    lake semi-join silently dropped every never-landed vector from
    the rebuild); all four derived tables swap in together."""
    from zebra_spark.queries import dedup as dd

    # materialize BEFORE the swaps: the rebuilds below lazily read the
    # OLD cosassign/seed files, which the swaps delete — an
    # unmaterialized plan would chase vanished parquet parts
    e_all = (
        spark.read.parquet(f"{state_dir}/vecs")
        .select("vec_id", "emb")
        .localCheckpoint()
    )
    seeds = dd._cosine_seeds(e_all)
    _swap_write(spark, state_dir, "cosseeds", seeds)
    seeds = spark.read.parquet(f"{state_dir}/cosseeds")
    assign = dd._assign_to_seeds(e_all, seeds, spread=True)
    _swap_write(spark, state_dir, "cosassign", assign)
    assign = spark.read.parquet(f"{state_dir}/cosassign")
    pairs = dd._score_pairs(
        dd._cell_collide_pairs(assign, assign, max_cell=dd.NDUP_MAX_CELL),
        e_all,
        vectorized=False,
    )
    _swap_write(spark, state_dir, "cosine", pairs)
    _swap_write(
        spark,
        state_dir,
        "driftbase",
        dd.cell_drift_audit(spark, sf_dir, e_all, "corpus", seeds).select(
            "n", "mse"
        ),
    )


def _guard_capped_append(
    spark: SparkSession,
    state_dir: str,
    batch_assign: DataFrame,
    batch_vecs: DataFrame,
) -> None:
    """The batch-tick twin of streaming's capped-backfill guard (r10
    review: streaming got the guard, the tick did not): under a binding
    giant-cell cap the admitted prefix of a FULL cell is its max_cell
    smallest vec_ids, so an out-of-order batch landing in an over-cap
    cell would retroactively evict earlier-admitted members — the
    maintained pair table would silently diverge from a capped rebuild.
    Monotone batches skip everything after one footer-stat min/max
    probe; out-of-order batches are still legal while every cell they
    TOUCH stays under the cap (the cap never binds there)."""
    from zebra_spark.queries import dedup as dd

    max_cell = dd.NDUP_MAX_CELL
    if max_cell is None:
        return
    prior_assign = spark.read.parquet(f"{state_dir}/cosassign")
    # FUSED probe (r17 optimization pass, guide §1.2): the state-max
    # and batch-min scalars used to be two sequential one-row actions;
    # crossJoining the two aggregates answers the monotonicity check
    # in ONE job with identical values
    probe = (
        prior_assign.agg(F.max("vec_id").alias("smax"))
        .crossJoin(batch_vecs.agg(F.min("vec_id").alias("bmin")))
        .first()
    )
    state_max, batch_min = probe["smax"], probe["bmin"]
    if state_max is None or batch_min is None or batch_min > state_max:
        return
    biggest = (
        prior_assign.unionByName(batch_assign)
        .join(
            F.broadcast(batch_assign.select("cell_id").distinct()),
            "cell_id",
            "left_semi",
        )
        .groupBy("cell_id")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    if biggest is not None and biggest > max_cell:
        raise ValueError(
            f"capped tick maintenance (max_cell={max_cell}) with an "
            f"over-cap touched cell ({biggest} members) requires "
            f"monotonically increasing vec_ids, but batch min vec_id "
            f"{batch_min} <= state max vec_id {state_max} — an "
            "out-of-order backfill under a binding cap diverges from "
            "a capped rebuild; ingest in id order or let the drift "
            "gate reseed"
        )


def run_tick(
    spark: SparkSession,
    sf_dir: str,
    state_dir: str,
    batch_docs: DataFrame,
    batch_vecs: DataFrame,
    timings: dict | None = None,
    audit: bool = False,
    reseed_ratio: float = 5.0,
    export_dir: str | None = None,
    export_epoch: int | None = None,
    compact_export_every: int = 0,
    label_prop_every: int = 0,
    tick_no: int | None = None,
    label_prop_weighted: bool = False,
):
    """ONE steady-state maintenance tick over PERSISTED artifacts:
    append `batch_docs` (doc_id, text) and `batch_vecs` (vec_id, emb)
    — genuinely new, ids disjoint from every earlier tick — to the
    maintained tables under `state_dir`, at delta cost.

      1. drift gate: the batch's mean nearest-seed distance vs the
         PERSISTED baseline (one broadcast-seed pass over the batch);
         a drifted batch reseeds the semantic family from scratch
         (_reseed_tick_state) — quiet ticks touch only deltas;
      2. append the batch's signatures + token sets (per-row kernels);
      3. append pair_table_delta — the lexical pairs the batch adds
         against corpus-so-far (reads the just-appended signatures);
      4. append cosine_assign_delta (frozen seeds, broadcast) and then
         cosine_pair_table_delta (cell join against the post-append
         maintained assignment);
      5. rewrite cluster labels at delta cost via
         incremental_components (star ∪ thresholded lexical delta) —
         write-aside + rename, |V| rows;
      6. audit=True: run the full snapshot audit over the maintained
         artifacts (the nightly read side) and return its frames.

    Everything registry-visible is restored on exit; callers running
    ticks concurrently with other queries on the same sf_dir should
    chain over a private mirror of the corpus dir (the mid-tick
    maintained tables are PARTIAL corpora — see q_tick_chain_pairs).

    `timings` (optional dict) receives 'update_s' (appends + label
    rewrite — the steady-state number SCALING.md tracks), 'audit_s',
    'export_s' and 'reseed_triggered'.

    `export_dir` + `export_epoch` (r11, VERDICT r10 #2): the tick
    EXTENDS the epoch-major training export in the same call —
    text.export_epoch_append publishes the batch as
    `epoch={export_epoch}/shard=S/*` files (batch-proportional
    shuffle, atomic per-epoch rename, idempotent replay), so N ticks
    leave the export identical to a one-shot epoch-major publish of
    the final corpus (pinned by tests/test_tick.py).  The interleaved
    full-rewrite export stays the periodic re-shuffle path.

    `compact_export_every=K` (r12, VERDICT r11 #3 — the export twin of
    streaming's label_merge_every): every K-th epoch, after this
    tick's append has committed, fold the strictly-EARLIER epoch dirs
    (export_epoch_compact up to export_epoch - 1), bounding the
    small-files accretion at <= K+1 dirs without an operator having to
    remember the manual fold.  The at-rest precondition provably holds
    at this boundary: the only replay-able unit is the CURRENT epoch
    (a retried tick re-replaces epoch=N and re-runs the fold, whose
    sources are then the single already-folded dir — a no-op), and
    every epoch < N is committed and never re-published.  Folding
    through the current epoch would break exactly that — a replayed
    append REPLACES its dir, so folding older data into it would lose
    the fold on retry.  0 disables (default); requires export_dir.

    `label_prop_every=K` + `tick_no` (r13, VERDICT r12 #4): every
    K-th tick (tick_no % K == 0; tick_no defaults to export_epoch
    when an export is wired) re-propagates labels from the FROZEN
    seed set to every accumulated vector — `labelseeds/` +
    `labelidx/` must exist (init_tick_state's label_seeds), the
    persisted IVFIndex is LOADED (train-once; never retrained on the
    cadence), and label_prop_ann_df votes over the BACKLOG — the
    accumulated vectors without a proplabels/ row yet — APPENDING the
    new labels (delta cost: under frozen seeds each vector's vote is
    independent, so backlog-append == full re-propagation, pinned by
    tests).  `label_prop_weighted` picks the confidence-scored
    1/(1+dist) vote (schema (vec_id, label, score)) over the majority
    vote (vec_id, label, votes); it must stay CONSTANT over a state
    dir's life — the two votes append different schemas.
    0 disables (default).  timings gains 'label_prop_s'."""
    from zebra_spark.graph import incremental_components
    from zebra_spark.queries import dedup as dd
    from zebra_spark.queries.audit import snapshot_audit

    if export_dir is not None and export_epoch is None:
        raise ValueError(
            "export_dir requires export_epoch — the epoch-major "
            "export's per-tick directory key"
        )
    if compact_export_every and export_dir is None:
        raise ValueError(
            "compact_export_every requires export_dir — the cadence "
            "folds the epoch-major export this tick extends"
        )
    if label_prop_every:
        if tick_no is None:
            tick_no = export_epoch
        if tick_no is None:
            raise ValueError(
                "label_prop_every requires tick_no (or export_epoch) — "
                "the cadence needs the tick's sequence number"
            )
        from zebra_spark.fsutil import exists as _fs_exists

        if not _fs_exists(spark, f"{state_dir}/labelidx/metadata.json"):
            raise ValueError(
                "label_prop_every requires a label-maintenance state — "
                "pass label_seeds to init_tick_state so labelseeds/ and "
                "the trained labelidx/ exist"
            )
    batch_docs = batch_docs.select("doc_id", "text")
    batch_vecs = batch_vecs.select("vec_id", "emb")
    prevs = _register_all(sf_dir, state_dir)

    # per-step decomposition (r17, VERDICT r16 #1): update_s moved on
    # the driver box while the builder box held, and the aggregate
    # number couldn't say WHICH step — the ceilings can only be
    # confirmed/recalibrated against a committed decomposition.  Cheap
    # wall-clock deltas, recorded only when the caller passes timings.
    # (The r17 optimization pass A/B'd overlapping the gate/appends and
    # the two family chains from driver threads per guide §2.6; with
    # the _spread fixes each chain already saturates the local cluster,
    # so concurrency only stretched in-thread walls with no update_s
    # win — the sequential order stays, and parts sum to update_s.)
    parts: dict[str, float] = {}
    _last = time.perf_counter()

    def _mark(step: str) -> None:
        nonlocal _last
        now = time.perf_counter()
        parts[step] = round(parts.get(step, 0.0) + (now - _last), 3)
        _last = now

    try:
        t0 = time.perf_counter()
        _last = t0
        # the default (no seeds/baseline args) takes needs_reseed's
        # FUSED path: persisted-baseline read + batch audit in one
        # collect (r17 optimization pass) — both read this state's
        # registered 'driftbase'/'cosseeds' tables, exactly as the
        # previous explicit drift_baseline() call did
        drifted = dd.needs_reseed(
            spark,
            sf_dir,
            batch_vecs,
            ratio_threshold=reseed_ratio,
        )
        if timings is not None:
            timings["reseed_triggered"] = drifted
        _mark("drift_gate_s")

        # the three per-row batch appends — signatures + token sets
        # (the lexical delta's corpus side is the post-append tables)
        # and the state's raw vector truth (appended before the
        # semantic family, so the quiet path's scoring source and a
        # reseed both see ingested ∪ batch; a batch need not be in the
        # lake, r10) — are independent writes to three different dirs,
        # so they run CONCURRENTLY (r17 optimization pass, guide §2.6:
        # each is a batch-sized single-stage job that underfills the
        # cluster; sequential they cost three scheduling round-trips).
        # Everything that READS any of them comes after the join below.
        from concurrent.futures import ThreadPoolExecutor

        def _row_append(item):
            df, path = item
            df.write.mode("append").parquet(path)

        with ThreadPoolExecutor(max_workers=3) as _ex:
            list(_ex.map(_row_append, (
                (dd.batch_signatures(batch_docs), f"{state_dir}/sigs"),
                (dd.batch_toksets(batch_docs), f"{state_dir}/toksets"),
                (batch_vecs, f"{state_dir}/vecs"),
            )))
        _mark("row_appends_s")

        # ONE materialization of the batch's pair delta; the append
        # and the label merge below share it (localCheckpoint)
        ldelta = dd.pair_table_delta(
            spark, sf_dir, batch_docs.select("doc_id")
        ).localCheckpoint()
        # size-derived append (r17, guide §6 output sizing): the
        # checkpointed delta holds one cached partition per compute
        # task, and appending those verbatim accreted ~32 near-empty
        # files per tick — every later tick/audit read of the
        # maintained dir then paid per-file open cost (measured:
        # steady-state tick cost GREW across ticks).  See
        # _append_sized for why the rebalance hint did NOT fix this.
        #
        # The two maintained PAIR appends (minhash here, cosine below)
        # run ASYNC under the rest of the tick (r17 continuation,
        # guide §2.6 overlap independent jobs): nothing between this
        # point and the audit reads minhash/ or cosine/ — the semantic
        # family reads cosseeds/cosassign/vecs, the label merge reads
        # the checkpointed ldelta and clusters/ — and the appends are
        # narrow write jobs that underfill the cluster, so they
        # back-fill the wide stages' idle cores.  Both futures are
        # joined before update_s closes (and the executor's __exit__
        # joins them on any exception path, so a failed tick cannot
        # leave a write racing the caller); their residual wait
        # accumulates into their own part keys, so the parts still
        # tile update_s exactly.
        with ThreadPoolExecutor(max_workers=2) as _appends:
            lfut = _appends.submit(
                _append_sized, ldelta, f"{state_dir}/minhash"
            )
            _mark("pair_delta_s")

            # semantic family: quiet ticks append assignment + pair
            # deltas under the frozen seeds; a drifted batch
            # invalidates the blocking, so the whole family rebuilds
            # over ingested ∪ batch
            cfut = None
            if drifted:
                _reseed_tick_state(spark, sf_dir, state_dir)
            else:
                adf = dd.cosine_assign_delta(
                    spark, sf_dir, batch_vecs
                ).localCheckpoint()
                _guard_capped_append(spark, state_dir, adf, batch_vecs)
                # size-derived appends for both semantic deltas too
                # (same file-accretion fix as the minhash append
                # above); the cosine delta is checkpointed so
                # _append_sized's count is a cached scan, not a
                # recompute.  The assignment append stays synchronous:
                # the cosine delta below reads the post-append
                # maintained assignment table.
                _append_sized(adf, f"{state_dir}/cosassign")
                cdelta = dd.cosine_pair_table_delta(
                    spark,
                    sf_dir,
                    new_ids=batch_vecs.select("vec_id"),
                    embeddings=spark.read.parquet(f"{state_dir}/vecs"),
                ).localCheckpoint()
                cfut = _appends.submit(
                    _append_sized, cdelta, f"{state_dir}/cosine"
                )
            _mark("semantic_s")

            # cluster labels: star-collapse the persisted labels, merge
            # the batch's thresholded lexical delta — |V| + |delta|
            # edges.  Endpoints are batch ∪ corpus-so-far ⊆ the node
            # set and batch ids are disjoint from the maintained labels
            # (the tick's id contract), so the CC fast path can skip
            # its guard joins (incremental_components r17 flags).
            labels = spark.read.parquet(f"{state_dir}/clusters").select(
                F.col("doc_id").alias("id"),
                F.col("cluster").alias("component"),
            )
            merged = incremental_components(
                labels,
                dd.threshold_edges(ldelta),
                batch_docs.select(F.col("doc_id").alias("id")),
                endpoints_within_nodes=True,
                nodes_disjoint=True,
            ).select(
                F.col("id").alias("doc_id"),
                F.col("component").alias("cluster"),
            )
            _swap_write(spark, state_dir, "clusters", merged)
            _mark("labels_s")
            if cfut is not None:
                cfut.result()
                _mark("semantic_s")
            lfut.result()
            _mark("pair_delta_s")
        if timings is not None:
            timings["update_s"] = round(time.perf_counter() - t0, 3)
            timings["update_parts"] = dict(parts)

        if label_prop_every and tick_no % label_prop_every == 0:
            # DELTA append via the shared trigger (see
            # propagate_label_backlog): under FROZEN seeds a vector's
            # vote depends only on (vector, seeds), so labeling just
            # the BACKLOG — this batch, plus anything skipped on
            # off-cadence ticks — and appending is EXACTLY equal to
            # re-propagating the corpus (pinned by test_tick.py); a
            # seed-set change invalidates all labels at once
            # (add_label_seeds), which is reseed-class, not a tick.
            t0 = time.perf_counter()
            propagate_label_backlog(
                spark,
                state_dir,
                spark.read.parquet(f"{state_dir}/vecs"),
                weighted=label_prop_weighted,
            )
            if timings is not None:
                timings["label_prop_s"] = round(
                    time.perf_counter() - t0, 3
                )

        if export_dir is not None:
            from zebra_spark.queries.text import export_epoch_append

            t0 = time.perf_counter()
            export_epoch_append(
                spark,
                export_dir,
                batch_docs.withColumn("n_chars", F.length("text")),
                export_epoch,
            )
            if (
                compact_export_every
                and export_epoch > 0
                and export_epoch % compact_export_every == 0
            ):
                from zebra_spark.queries.text import export_epoch_compact

                # strictly-earlier epochs only — see docstring
                export_epoch_compact(spark, export_dir, export_epoch - 1)
            if timings is not None:
                timings["export_s"] = round(time.perf_counter() - t0, 3)

        if not audit:
            return None
        t0 = time.perf_counter()
        frames = snapshot_audit(spark, sf_dir)
        if timings is not None:
            from zebra_spark.queries.audit import consume_sections

            consume_sections(frames)
            timings["audit_s"] = round(time.perf_counter() - t0, 3)
        return frames
    finally:
        _restore_all(sf_dir, prevs)


def tick_takedown(
    spark: SparkSession,
    sf_dir: str,
    state_dir: str,
    ids_df: DataFrame,
    export_dir: str | None = None,
) -> None:
    """RIGHT-TO-BE-FORGOTTEN across the whole persisted tick state —
    one call removes a doc/vector id set from every maintained table
    (sigs, toksets, minhash, vecs, cosassign, cosine, and proplabels
    when label maintenance is active), relabels the
    cluster snapshot affected-components-only
    (graph.remove_and_relabel), and, with `export_dir`, scrubs the
    epoch-major training export via text.export_epoch_takedown
    (affected epoch dirs only, survivors keep their positions).  The
    post-takedown state is bit-identical to a fresh chain over the
    surviving corpus under the SAME frozen seeds (pinned by
    tests/test_tick.py): row tables are per-row deterministic, no
    surviving pair involves a removed endpoint, and the min-id label
    contract makes the relabel equal a full re-cluster.

    Two REFUSE guards mirror the streaming removers:
    - seed hit (cosseeds' cell_id IS the source vec_id): removing a
      seed changes the blocking for every future batch — that is a
      reseed (fresh state over the survivors), not a delete;
    - binding giant-cell cap: under NDUP_MAX_CELL, a capped rebuild
      over the survivors would ADMIT previously-evicted members of an
      over-cap cell (pairs a deletion can't create), so a takedown
      touching an over-cap cell diverges from the capped rebuild —
      refused conservatively, same posture as _guard_capped_append.

    Scale shape: the row-table rewrites are one anti-join + full
    rewrite each — takedown is compaction-class maintenance (run at
    rest, amortized over many ticks), NOT a per-batch op; the label
    relabel and the export scrub are both affected-only."""
    from zebra_spark.graph import remove_and_relabel
    from zebra_spark.queries import dedup as dd

    ids = (
        ids_df.select(F.col(ids_df.columns[0]).alias("doc_id"))
        .distinct()
        .localCheckpoint()
    )

    seed_hits = (
        spark.read.parquet(f"{state_dir}/cosseeds")
        .join(
            F.broadcast(ids.withColumnRenamed("doc_id", "cell_id")),
            "cell_id",
            "left_semi",
        )
        .limit(1)
        .count()
    )
    if seed_hits:
        raise ValueError(
            "takedown ids include frozen seed vectors (cosseeds' "
            "cell_id is the source vec_id); removing a seed changes "
            "the blocking for every future batch — rebuild a fresh "
            "state over the surviving corpus (reseed) instead"
        )

    if dd.NDUP_MAX_CELL is not None:
        assign = spark.read.parquet(f"{state_dir}/cosassign")
        touched = (
            assign.join(
                F.broadcast(ids.withColumnRenamed("doc_id", "vec_id")),
                "vec_id",
                "left_semi",
            )
            .select("cell_id")
            .distinct()
        )
        biggest = (
            assign.join(F.broadcast(touched), "cell_id", "left_semi")
            .groupBy("cell_id")
            .count()
            .agg(F.max("count"))
            .first()[0]
        )
        if biggest is not None and biggest > dd.NDUP_MAX_CELL:
            raise ValueError(
                f"capped tick state (max_cell={dd.NDUP_MAX_CELL}) "
                f"takedown touches an over-cap cell ({biggest} "
                "members): a capped rebuild over the survivors would "
                "admit previously-evicted members, which a deletion "
                "cannot reproduce — reseed into a fresh state instead"
            )

    def anti(df: DataFrame, *cols: str) -> DataFrame:
        for c in cols:
            df = df.join(
                F.broadcast(ids.select(F.col("doc_id").alias(c))),
                c,
                "left_anti",
            )
        return df

    from zebra_spark.fsutil import exists as _fs_exists

    # the propagated-label table rides the takedown too (r13): a
    # removed vector must lose its label row, and a removed LABEL SEED
    # is refused exactly like a cosine seed — frozen labelidx/ means
    # every propagated vote could have counted it
    if _fs_exists(spark, f"{state_dir}/labelseeds"):
        lab_hits = (
            spark.read.parquet(f"{state_dir}/labelseeds")
            .join(
                F.broadcast(ids.withColumnRenamed("doc_id", "lab_id")),
                "lab_id",
                "left_semi",
            )
            .limit(1)
            .count()
        )
        if lab_hits:
            raise ValueError(
                "takedown ids include frozen label seeds (labelseeds/ "
                "feeds the persisted labelidx, so every propagated "
                "label could have counted them) — rebuild the label "
                "state over the surviving seed set instead"
            )

    kinds = [
        ("sigs", ("doc_id",)),
        ("toksets", ("doc_id",)),
        ("minhash", ("doc_a", "doc_b")),
        ("vecs", ("vec_id",)),
        ("cosassign", ("vec_id",)),
        ("cosine", ("id_a", "id_b")),
    ]
    if _fs_exists(spark, f"{state_dir}/proplabels"):
        kinds.append(("proplabels", ("vec_id",)))
    for kind, cols in kinds:
        _swap_write(
            spark, state_dir, kind,
            anti(spark.read.parquet(f"{state_dir}/{kind}"), *cols),
        )

    labels = spark.read.parquet(f"{state_dir}/clusters").select(
        F.col("doc_id").alias("id"), F.col("cluster").alias("component")
    )
    # post-swap minhash: surviving-vs-surviving edges only
    edges = dd.threshold_edges(
        spark.read.parquet(f"{state_dir}/minhash")
    )
    relabeled = remove_and_relabel(labels, edges, ids).select(
        F.col("id").alias("doc_id"), F.col("component").alias("cluster")
    )
    _swap_write(spark, state_dir, "clusters", relabeled)

    if export_dir is not None:
        from zebra_spark.queries.text import export_epoch_takedown

        export_epoch_takedown(spark, export_dir, ids)


# --- the chain at the driver hash gate --------------------------------------
#
# One 3-tick chain per dataset per session (built under a lock, against
# a PRIVATE symlink mirror of the corpus dir so the registry
# registrations cannot leak partial-corpus reads to concurrent
# consumers of the real sf_dir); the three q_tick_chain_* queries read
# its final maintained tables.  Their oracles recompute the final
# corpus FROM SCRATCH in SQL — so a chain that drops, invents, or
# double-appends a single row across any tick breaks a driver hash.

_CHAIN_STATE: dict[str, str] = {}
_CHAIN_TIMINGS: dict[str, list[dict]] = {}
_CHAIN_LOCK = threading.Lock()
_CHAIN_TICKS = 3


def chain_timings(sf_dir: str) -> list[dict]:
    """Per-tick `timings` dicts recorded by this session's chain build
    for `sf_dir` (empty if the chain was not built yet).  The LAST
    entry's update_s is the steady-state per-tick cost bench.py
    surfaces as `tick_update_s` (VERDICT r10 #6) — the number that
    stays flat while the corpus grows, as opposed to the isolated
    q_ingest_audit row whose cold scaffolding rebuilds dominate."""
    return _CHAIN_TIMINGS.get(str(Path(sf_dir).resolve()), [])


def _mirror_sf_dir(sf_dir: str) -> str:
    """Symlink mirror of a fixture corpus dir: same raw tables, a
    distinct resolved path — so register_maintained_table keys for the
    chain are private to it."""
    base = tempfile.mkdtemp(prefix="zebra_tick_corpus_")
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    for p in Path(sf_dir).iterdir():
        if p.name.endswith(".parquet"):
            os.symlink(str(p.resolve()), f"{base}/{p.name}")
    return base


def chain_state(
    spark: SparkSession, sf_dir: str, with_audit: bool = False
) -> str:
    """State dir of the session's 3-tick chained-maintenance run for
    `sf_dir`: the corpus split by doc_id % 3 / vec_id % 3 into three
    disjoint ingest batches, each appended by run_tick against the
    previous tick's persisted artifacts.  Seeds freeze over the full
    corpus-prefix at init — the fixture convention that keeps the
    blocking identical to the from-scratch SQL oracles' (production
    freezes over the first snapshot instead; tests pin that shape).

    Per-tick `timings` are recorded in chain_timings(sf_dir);
    `with_audit=True` (bench.py only) additionally runs the nightly
    snapshot audit on the LAST tick so its read-side cost lands in
    that tick's audit_s — the parity/serving callers leave it off,
    and a later with_audit=True call against an already-built chain
    does not re-run anything (one build per dataset per session)."""
    key = str(Path(sf_dir).resolve())
    path = _CHAIN_STATE.get(key)
    if path is None:
        with _CHAIN_LOCK:
            path = _CHAIN_STATE.get(key)
            if path is None:
                path, ticks = _build_chain(spark, sf_dir, with_audit)
                _CHAIN_TIMINGS[key] = ticks
                _CHAIN_STATE[key] = path
    return path


def _build_chain(
    spark: SparkSession, sf_dir: str, with_audit: bool
) -> tuple[str, list[dict]]:
    """One full chain build (init + _CHAIN_TICKS run_ticks) into a
    fresh private state dir; returns (state path, per-tick timings).
    chain_state caches one per dataset per session; chain_trial runs
    throwaway builds for the bench's tick-cost medians."""
    from zebra_spark.io import embeddings_d, load

    mirror = _mirror_sf_dir(sf_dir)
    base = tempfile.mkdtemp(prefix="zebra_tick_state_")
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    path = f"{base}/state"
    e = embeddings_d(spark, mirror).select("vec_id", "emb")
    init_tick_state(spark, mirror, path, seed_vecs=e)
    docs = load(spark, mirror, "documents").select("doc_id", "text")
    ticks: list[dict] = []
    for k in range(_CHAIN_TICKS):
        t: dict = {}
        run_tick(
            spark,
            mirror,
            path,
            docs.filter(F.col("doc_id") % _CHAIN_TICKS == k),
            e.filter(F.col("vec_id") % _CHAIN_TICKS == k),
            timings=t,
            audit=with_audit and k == _CHAIN_TICKS - 1,
        )
        ticks.append(t)
    return path, ticks


def chain_trial(spark: SparkSession, sf_dir: str) -> dict:
    """ONE throwaway chain build's LAST-tick timings (update_s +
    audit_s), state dir removed immediately — the isolated-trial
    primitive behind bench.py's tick_update_s / tick_audit_s medians
    (r12, VERDICT r11 #4: the r11 numbers were single-shot firsts
    with no band; medians of 3 of these are what SCALING.md freezes).
    Never touches the session's cached chain."""
    path, ticks = _build_chain(spark, sf_dir, with_audit=True)
    shutil.rmtree(Path(path).parent, ignore_errors=True)
    # drop the audit's tracked persists NOW (r17): they cache frames
    # over this trial's just-deleted state dir, so leaving them in the
    # cache manager leaks dead memory into the NEXT trial's budget —
    # one visible source of the trial-to-trial audit_s wobble.
    from zebra_spark.caching import release_caches

    release_caches()
    return ticks[-1]


# the from-scratch SQL the chain must reproduce: same CTE cores as the
# delta gates (q_pair_table_delta / q_cosine_table_delta /
# q_dedup_clusters), WITHOUT their batch-slice filters — the chain's
# final corpus is the whole dataset.
from zebra_spark.queries.dedup import (  # noqa: E402
    _SQL_CLUSTERS_ORACLE,
    _SQL_COSINE_ASSIGN,
    _SQL_MINHASH_CORE,
    _SQL_TOK,
    N_HASHES,
)
from zebra_spark import functions as zf  # noqa: E402


@query(
    "q_tick_chain_pairs",
    oracle=f"""
    WITH {_SQL_TOK.format(nh=N_HASHES)},
    {_SQL_MINHASH_CORE}
    SELECT i.doc_a, i.doc_b, i.n_common, sa.n AS na, sb.n AS nb
    FROM inter i
    JOIN sz sa ON sa.doc_id = i.doc_a
    JOIN sz sb ON sb.doc_id = i.doc_b
    """,
)
def q_tick_chain_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained steady-state maintenance at the driver hash gate
    (VERDICT r9 #1): after three successive run_tick ingests — each
    APPENDING its delta to the previous tick's persisted parquet, no
    base ∪ delta scaffolding anywhere — the maintained lexical pair
    table must equal the oracle's from-scratch full-corpus build.  A
    pair missed (later endpoint's tick failed to see the earlier one),
    invented, or double-appended by any tick breaks the hash."""
    return spark.read.parquet(f"{chain_state(spark, sf_dir)}/minhash").select(
        "doc_a",
        "doc_b",
        "n_common",
        F.col("na").cast("bigint").alias("na"),
        F.col("nb").cast("bigint").alias("nb"),
    )


@query(
    "q_tick_chain_cosine",
    oracle=f"""
    WITH {_SQL_COSINE_ASSIGN.strip()}
    SELECT c.id_a, c.id_b,
           {sql_rnd(zf.sql_metric("cosine", a="ea.emb", b="eb.emb", dim=64))}
             AS dist
    FROM cand c
    JOIN e ea ON ea.vec_id = c.id_a
    JOIN e eb ON eb.vec_id = c.id_b
    """,
)
def q_tick_chain_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The chain's semantic family at the driver hash gate: three
    frozen-seed assignment appends + cell-join pair deltas, against the
    oracle's one-shot full-corpus assignment and exact cosine scoring.
    Seeds freeze over the full corpus-prefix at init (chain_state's
    fixture convention), so the SQL oracle can recompute the identical
    blocking without replaying the chain."""
    st = chain_state(spark, sf_dir)
    return spark.read.parquet(f"{st}/cosine").select(
        "id_a", "id_b", rnd(F.col("dist")).alias("dist")
    )


@query("q_tick_chain_clusters", oracle=_SQL_CLUSTERS_ORACLE)
def q_tick_chain_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The chain's maintained cluster labels at the driver hash gate:
    three incremental_components merges (star ∪ per-tick thresholded
    lexical delta, labels rewritten at |V| cost per tick) must equal
    the oracle's recursive-CTE transitive closure over the FULL
    corpus' near-dup graph — min-id labels, keep=1 on representatives
    (same contract as q_dedup_clusters, here produced by the chain)."""
    labels = spark.read.parquet(f"{chain_state(spark, sf_dir)}/clusters")
    return labels.select(
        "doc_id",
        "cluster",
        F.when(F.col("cluster") == F.col("doc_id"), 1)
        .otherwise(0)
        .cast("int")
        .alias("keep"),
    )
