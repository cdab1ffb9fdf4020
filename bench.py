"""Benchmark harness — the BASELINE.md headline numbers.

Runs the headline operators at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], one warm
SparkSession, and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Per-query timings map to BASELINE.md rows:
  q_agg_hash -> B1, q_join_inner -> B2, knn_exact_100 -> B3,
  lsh_build -> B4, lsh_query_100 -> B5, q_dedup_exact -> B6,
  ingest -> B7; value = full-suite wall-clock (B8-style total).

Isolated-trial protocol (r10, VERDICT r9 #4) — the numbers that make
round-over-round deltas attributable:
  - After the shared build rows (pair_table_build/cosine_table_build,
    whose one-time cost is priced explicitly), the derived-table
    registry is SNAPSHOT.  Before every isolated trial the registry is
    restored to that snapshot and harness caches released, so a trial
    can never read an artifact a PREVIOUS query materialized (r9's
    q_dedup_clusters hotspot read a primed label table at 0.186 s —
    a cache hit, not a cost).
  - headline_frozen_median: each of the 27 frozen rows re-run 3x under
    that isolation; the field is the sum of per-row MEDIANS — the
    cross-round comparability number (the single-shot headline_frozen
    is kept for continuity with r5-r9, but carries trial noise the
    42-54 s r9 spread demonstrated).
  - hotspots_isolated uses the same isolation (median of 3).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def _consume(df) -> int:
    """Run the plan without collecting results to the driver."""
    return df.count()


def bench_ingest(spark, sf_dir: str, out_dir: str) -> int:
    """B7: read parquet -> assign ids -> write documents+embeddings tables.
    Ids via monotonically_increasing_id (no shuffle, ≙ UUIDv7 time-order
    uniqueness, reference src/database/index/lsh.rs:415)."""
    from pyspark.sql import functions as F

    from zebra_spark.io import load

    n = 0
    for t in ("documents", "embeddings"):
        df = load(spark, sf_dir, t).withColumn("row_uid", F.monotonically_increasing_id())
        df.write.mode("overwrite").parquet(f"{out_dir}/{t}")
        n += 1
    return n


# The frozen cross-round comparability subset (VERDICT r7 #6): exactly
# the 27 rows BENCH_r05 carried.  NEVER add to or remove from this
# list — new rows join the growing headline above and show up only in
# headline_full, so headline_frozen deltas across rounds are pure
# perf signal.
FROZEN_ROWS = frozenset({
    "ingest", "knn_exact_100", "lsh_build", "lsh_query_100",
    "q_agg_hash", "q_ann_ivf", "q_ann_pq", "q_curation_pipeline",
    "q_dedup_clusters", "q_dedup_exact", "q_dedup_incremental",
    "q_dedup_minhash", "q_emb_covariance", "q_graph_pagerank",
    "q_join_inner", "q_neardup_cosine", "q_ngram_novelty",
    "q_semantic_clusters", "q_sort_limit", "q_text_dup_spans",
    "q_text_fingerprint", "q_text_jaccard_pairs", "q_text_surprisal",
    "q_tpch_q21", "q_tpch_q9", "q_window_session", "q_window_sliding",
})


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    import zebra_spark
    from zebra_spark.queries.vector import knn_exact
    from zebra_spark.session import get_spark

    zebra_spark.load_all_queries()
    spark = get_spark("zebra-bench", cpus=cpus)

    # Optional subset filter (comma-separated names; special rows
    # knn_exact_100/lsh_build/lsh_query_100/ingest included by name).
    # Used by the test suite's contract check to keep it fast; the
    # driver's full run leaves it unset.
    only = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    only_set = {s.strip() for s in only.split(",")} if only else None

    headline = [
        "q_agg_hash",
        "q_join_inner",
        "q_dedup_exact",
        "q_window_session",
        "q_text_jaccard_pairs",
        "q_sort_limit",
        "q_ann_ivf",
        "q_window_sliding",
        "q_text_fingerprint",
        # north-star dedup pipeline (VERDICT r1 #9): banded MinHash
        # candidates + verify, and connected-component clustering on top
        "q_dedup_minhash",
        "q_dedup_clusters",
        "q_neardup_cosine",
        # round-2 TPC-H completion: heaviest join shape + semi/anti shape
        "q_tpch_q9",
        "q_tpch_q21",
        # round-4 flagship pipeline ops: end-to-end curation, incremental
        # ingest screen, semantic (cosine-CC) clustering, one-pass
        # covariance, corpus-LM quality scoring
        "q_curation_pipeline",
        "q_dedup_incremental",
        "q_semantic_clusters",
        "q_emb_covariance",
        "q_text_surprisal",
        # round-5: PQ ANN (train+encode+ADC search), n-gram novelty,
        # exact duplicate-span detection, PageRank over the dup graph
        "q_ann_pq",
        "q_ngram_novelty",
        "q_text_dup_spans",
        "q_graph_pagerank",
        # round-6: Gopher rule filter (per-row + one doc-keyed shuffle),
        # and two shared-pair-table consumers (degree histogram,
        # eval-decontamination) whose steady-state cost shows the
        # derived-table architecture
        "q_text_gopher_filters",
        "q_graph_degree_hist",
        "q_eval_decontaminate",
        # round-7: the nightly composite — all six snapshot-audit
        # sections over the already-built shared tables (steady-state
        # cost of "what a user actually runs"), and the PQ drift audit
        "q_snapshot_audit",
        "q_index_drift",
        # round-8: the one-call nightly tick (both delta paths +
        # maintained-table writes + audit over the maintained files)
        # and the cosine-blocking seed-drift audit
        "q_ingest_audit",
        "q_cell_drift",
        # round-9: the giant-cell cap at a BINDING max_cell=64 (the
        # skew guard's own cost), the persisted reseed baseline, and
        # the export stage (deterministic training order + manifest)
        "q_cosine_capped_pairs",
        "q_drift_baseline",
        "q_train_order",
        "q_shard_manifest",
        # round-9 late wave: the curation dial, the duplication-family
        # size distribution, and the cluster-labels takedown
        "q_quality_threshold_sweep",
        "q_cluster_size_hist",
        "q_cluster_takedown",
        # round-10: the export WRITE (per-shard parquet in training
        # order + file-level manifest) and the chained-maintenance
        # serving reads (their one-time 3-tick chain build is priced
        # by the tick_chain_build row, like the pair-table builds)
        "q_export_shards",
        "q_tick_chain_pairs",
        "q_tick_chain_cosine",
        "q_tick_chain_clusters",
        # round-10 late wave: sequence packing (concat-and-chunk over
        # the export order), deterministic mixture rebalancing,
        # per-source token-budget sampling, and the deduped export
        # order (cluster representatives through the export window)
        "q_pack_sequences",
        "q_mix_rebalance",
        "q_token_budget_sample",
        "q_export_dedup_order",
        # round-11: the epoch-major append export's order, its
        # stable-position takedown (3 real appends + affected-epoch
        # rewrite + read-back per trial — prices the whole lifecycle),
        # the per-(epoch, shard) file manifest, and the append-stable
        # epoch-order sequence packing
        "q_export_append_order",
        "q_export_append_takedown",
        "q_export_append_manifest",
        "q_pack_sequences_epoch",
        # round-11 late wave: kNN label propagation (broadcast-seed
        # majority vote over the embedding space) + its accuracy audit
        "q_knn_label_prop",
        "q_knn_label_prop_audit",
        # round-12: the ANN-backed propagation (IVF trained on the
        # seed side + salted cell join — the large-seed-set scale path)
        # and the distance-weighted soft-label variant
        "q_knn_label_prop_ann",
        "q_knn_label_prop_weighted",
        # round-13: the weighted vote on the ANN scale path, and the
        # balanced reshard of the epoch-major export (3 real appends +
        # full rebalance + read-back per trial — prices the lifecycle
        # like the takedown row)
        "q_knn_label_prop_ann_weighted",
        "q_export_rebalance",
        "q_label_prop_calibration",
        # round-14: the shard-balance audit read.  Its 3-epoch tree is
        # session-cached; the FIRST caller pays the one-time build —
        # q_snapshot_audit, which runs earlier in this list — so this
        # row prices the steady-state nightly read (one pruned scan +
        # groupBy(shard)), matching its role as the tenth audit section.
        "q_shard_balance",
        # round-16: filtered exact kNN (predicate -> semi-join ->
        # distance -> top-k), the hash-checkable filtered-ANN path
        # (IVF train + exhaustive-probe filtered search_df), and the
        # composed takedown -> rebalance -> manifest lifecycle tick
        # (3 real appends + takedown + rebalance + manifest read per
        # trial)
        "q_knn_filtered",
        "q_knn_filtered_ivf",
        "q_export_lifecycle_tick",
        # round-17: the exhaustive-candidates hash gates — PQ / IVF-PQ
        # filtered search and the ANN label-propagation kernel (cheap
        # by construction: tiny k-means + lossless candidate bounds)
        "q_knn_filtered_pq",
        "q_knn_filtered_ivfpq",
        "q_label_prop_ann_exhaustive",
    ]
    if only_set is not None:
        headline = [n for n in headline if n in only_set]

    def wanted(name: str) -> bool:
        return only_set is None or name in only_set

    # warm-up: JVM/codegen/parquet footer caches.  One cheap query per
    # engine family (relational agg, window, text tokenization) so the
    # first heavy row doesn't absorb residual codegen/compile cost
    # (VERDICT r2: the single-query warm-up polluted cross-round
    # comparisons of whichever row ran first).  Each warm-up is
    # failure-isolated and respects the subset filter: a broken query
    # must cost one warm cache, never the whole bench (VERDICT r3 #5 —
    # an unguarded warm-up zeroed out BENCH_r03 entirely).
    for warm in ("q_agg_hash", "q_window_sliding", "q_text_fingerprint"):
        if not wanted(warm):
            continue
        try:
            _consume(zebra_spark.QUERIES[warm](spark, sf_dir))
        except Exception as exc:  # noqa: BLE001 — warm-up is best-effort
            print(f"warmup {warm} failed: {exc}", file=sys.stderr)

    from zebra_spark.caching import release_caches

    times: dict[str, float] = {}
    errors: dict[str, str] = {}

    # Build the shared near-dup pair table ONCE, timed as its own row
    # (VERDICT r5 #1): the consumers (q_dedup_minhash, containment,
    # calibration, clusters, pagerank) then read the materialized
    # parquet, so their rows below are steady-state costs and the
    # one-per-corpus-snapshot build cost is visible instead of being
    # re-paid invisibly inside each consumer.
    from zebra_spark.queries.audit import ingest_base_state
    from zebra_spark.queries.dedup import (
        cluster_label_table,
        cosine_pair_table,
        pair_table,
    )
    from zebra_spark.queries.tick import chain_state, chain_timings

    for bname, builder in (
        ("pair_table_build", pair_table),
        ("cosine_table_build", cosine_pair_table),
        # r16 (VERDICT r15 #2): the cluster-label table is a MAINTAINED
        # artifact (registry kind 'clusters' — production reads it back
        # from parquet, the tick updates it at delta cost), but the
        # isolated-trial registry restore made every consumer trial
        # (q_ingest_audit ~10 s of its 27, q_dedup_clusters nearly all
        # of its 8.7) rebuild the full-graph CC from scratch — pricing
        # corpus-snapshot scaffolding into steady-state rows.  One
        # visible build row, same treatment pair_table got in r5.
        ("cluster_label_build", cluster_label_table),
        # r18 (VERDICT r17 #1): q_ingest_audit's pre-batch "maintained"
        # tables — fixture-only scaffolding (production reads the
        # previous tick's parquet) that the row used to rebuild and
        # rewrite per call, so its 20 s priced one-time state
        # construction into the steady-state tick.  One visible build
        # row, the same split cluster_label_build got in r16; the
        # q_ingest_audit row below now prices gate + deltas + label
        # rewrite + audit (the production tick shape).
        ("ingest_base_build", ingest_base_state),
        # the 3-tick chained-maintenance state (r10): one build per
        # session, the steady-state per-tick cost is SCALING.md's table.
        # with_audit=True runs the nightly read-side audit on the LAST
        # tick so its per-tick timings carry audit_s (VERDICT r10 #6).
        ("tick_chain_build", lambda s, d: chain_state(s, d, with_audit=True)),
    ):
        if only_set is not None and bname not in only_set:
            continue
        t0 = time.perf_counter()
        try:
            builder(spark, sf_dir)
            times[bname] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # noqa: BLE001 — record and keep going
            errors[bname] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"{bname} failed: {exc}", file=sys.stderr)
        finally:
            release_caches()

    # isolated-trial foundation (r10): everything materialized up to
    # here (the shared pair tables + their nested artifacts + the chain
    # state) is priced by its own build row; anything a LATER query
    # registers is that query's own cost and must not leak into other
    # rows' isolated trials
    from zebra_spark.queries.dedup import (
        derived_registry_snapshot,
        restore_derived_registry,
    )

    # Export-family warm pass (r16, VERDICT r15 #1b): these rows run a
    # REAL on-disk lifecycle (build/replay a session-keyed export tree,
    # takedown/rebalance rewrites, or an IVF-on-seeds train) whose
    # FIRST invocation pays one-time scaffolding — scratch-dir
    # creation, cold page cache, codegen for the write plans — that
    # the isolated-median trials later in the run never see (their
    # trees are warm by then).  r14/r15 showed the resulting in-suite
    # vs isolated divergence reaching 2.4x (q_export_append_takedown
    # 12.7 s in-suite, 5.3 s isolated — same code).  Run each once,
    # untimed per row but priced together as the export_warm build
    # row, so the timed in-suite rows below measure the same warm
    # steady-state replay the isolated medians do.
    EXPORT_WARM_ROWS = (
        "q_export_shards", "q_export_append_takedown",
        "q_export_append_manifest", "q_export_rebalance",
        "q_export_lifecycle_tick",
        "q_knn_label_prop_ann", "q_knn_label_prop_ann_weighted",
    )
    if only_set is None:
        t0 = time.perf_counter()
        for wname in EXPORT_WARM_ROWS:
            try:
                _consume(zebra_spark.QUERIES[wname](spark, sf_dir))
            except Exception as exc:  # noqa: BLE001 — warm is best-effort
                # recorded, not just printed (review r16): a silently
                # failed warm leaves that row measuring COLD replay, and
                # the artifact must carry the attribution for the
                # resulting in-suite elevation
                errors[f"warm:{wname}"] = f"{type(exc).__name__}: {exc}"[:200]
                print(f"export warm {wname} failed: {exc}", file=sys.stderr)
            finally:
                release_caches()
        times["export_warm"] = round(time.perf_counter() - t0, 3)

    shared_snapshot = derived_registry_snapshot()

    def isolate() -> None:
        restore_derived_registry(shared_snapshot)
        release_caches()

    # r17 (VERDICT r16 #2): the warmed rows' TIMED in-suite shots run
    # IMMEDIATELY after the warm pass.  r16 added export_warm but left
    # the timed rows at their historical headline positions, so dozens
    # of intervening queries evicted the warmed page-cache / session
    # state and the driver box still measured q_export_append_takedown
    # at 1.49x its isolated median in-suite (target <= 1.3x).  Relative
    # order among the moved rows and among everything else is
    # unchanged, so cross-round per-row comparisons survive; only the
    # moved rows' in-suite context changes — to the warm steady-state
    # their isolated medians already measure.
    _warm_set = set(EXPORT_WARM_ROWS)
    headline = [n for n in headline if n in _warm_set] + [
        n for n in headline if n not in _warm_set
    ]

    for name in headline:
        t0 = time.perf_counter()
        try:
            _consume(zebra_spark.QUERIES[name](spark, sf_dir))
        except Exception as exc:  # noqa: BLE001 — record and keep going
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"query {name} failed: {exc}", file=sys.stderr)
            continue
        finally:
            # free query-internal persist()s once the terminal action is
            # done, so cached partitions don't accumulate across the
            # sweep and evict later queries' working set (ADVICE r4)
            release_caches()
        times[name] = round(time.perf_counter() - t0, 3)

    if wanted("knn_exact_100"):
        t0 = time.perf_counter()
        try:
            _consume(knn_exact(spark, sf_dir, n_queries=100, k=10))
            times["knn_exact_100"] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # noqa: BLE001
            errors["knn_exact_100"] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"query knn_exact_100 failed: {exc}", file=sys.stderr)

    idx = None
    if wanted("lsh_build") or wanted("lsh_query_100"):
        try:
            from zebra_spark.index.lsh import LSHIndex

            t0 = time.perf_counter()
            idx = LSHIndex.build(spark, sf_dir, num_trees=15, seed=42)
            times["lsh_build"] = round(time.perf_counter() - t0, 3)
            if wanted("lsh_query_100"):
                t0 = time.perf_counter()
                _consume(idx.search_ids(range(100), k=10))
                times["lsh_query_100"] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # noqa: BLE001
            errors["lsh"] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"query lsh_build/query failed: {exc}", file=sys.stderr)

    if wanted("ingest"):
        out_dir = tempfile.mkdtemp(prefix="zebra_bench_")
        try:
            t0 = time.perf_counter()
            bench_ingest(spark, sf_dir, out_dir)
            times["ingest"] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # noqa: BLE001
            errors["ingest"] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"query ingest failed: {exc}", file=sys.stderr)
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)

    # per-row runners for the non-registry frozen rows, shared by the
    # isolated-trial passes below
    def _run_ingest() -> None:
        d = tempfile.mkdtemp(prefix="zebra_bench_")
        try:
            bench_ingest(spark, sf_dir, d)
        finally:
            shutil.rmtree(d, ignore_errors=True)

    def _run_lsh_build() -> None:
        from zebra_spark.index.lsh import LSHIndex

        LSHIndex.build(spark, sf_dir, num_trees=15, seed=42)

    specials = {
        "knn_exact_100": lambda: _consume(
            knn_exact(spark, sf_dir, n_queries=100, k=10)
        ),
        "lsh_build": _run_lsh_build,
        "lsh_query_100": (
            (lambda: _consume(idx.search_ids(range(100), k=10)))
            if idx is not None
            else None
        ),
        "ingest": _run_ingest,
    }

    def isolated_median(name: str, n_trials: int = 3) -> float | None:
        """Median of n isolated trials: derived registry restored to the
        post-shared-builds snapshot and caches released BEFORE each
        trial, so no trial reads an artifact another query primed."""
        import statistics

        runner = specials.get(name) or (
            lambda: _consume(zebra_spark.QUERIES[name](spark, sf_dir))
        )
        trials = []
        for _ in range(n_trials):
            isolate()
            t0 = time.perf_counter()
            try:
                runner()
            except Exception as exc:  # noqa: BLE001
                errors[f"isolated:{name}"] = (
                    f"{type(exc).__name__}: {exc}"[:200]
                )
                return None
            trials.append(round(time.perf_counter() - t0, 3))
        isolate()
        return round(statistics.median(trials), 3)

    # Isolated-trial hotspot medians (VERDICT r5 #8, isolation fixed in
    # r10 per VERDICT r9 #4): for every registry query at/above 5 s,
    # the median of 3 trials with the derived registry restored to the
    # post-shared-builds snapshot first — a hotspot can no longer read
    # a label/baseline artifact an earlier query materialized.
    # FROZEN_HOTSPOTS (r14, VERDICT r13 #3) are ALWAYS measured, even
    # when their in-suite single shot dips under the 5 s trigger (r13
    # lost q_export_append_takedown's row that way), so every round
    # carries a median for each ceiling SCALING.md freezes — the
    # hotspot twin of the tick band's one-sided regression protocol.
    FROZEN_HOTSPOTS = frozenset({
        "q_dedup_clusters", "q_graph_pagerank", "q_ingest_audit",
        "q_cluster_takedown", "q_export_append_takedown",
        # r15: straddles the 5 s dyn trigger (in-suite 4.5-5.1 across
        # r11-r15, isolated 5.5-6.4) — frozen so the row never
        # silently vanishes, same reason as q_export_append_takedown
        "q_dedup_incremental",
        # r16: the composed lifecycle row (first obs: in-suite 6.9,
        # isolated 5.9) straddles the same trigger — frozen at birth
        "q_export_lifecycle_tick",
    })
    hotspots: dict[str, float] = {}
    if only_set is None:
        dyn = {
            n for n, t in times.items()
            if t >= 5.0 and n in zebra_spark.QUERIES
        }
        for name in sorted(dyn | (FROZEN_HOTSPOTS & set(times))):
            med = isolated_median(name)
            if med is not None:
                hotspots[name] = med

    # Frozen-subset re-baseline (r10, VERDICT r9 #4): per-row medians
    # of 3 isolated trials over the NEVER-CHANGING 27-row subset.  The
    # single-shot headline_frozen stays for r5-r9 continuity; the
    # median field is the number r10+ rounds compare.
    frozen_medians: dict[str, float] = {}
    if only_set is None:
        for name in sorted(FROZEN_ROWS):
            if name not in times:
                continue
            if specials.get(name) is None and name not in zebra_spark.QUERIES:
                continue
            med = isolated_median(name)
            if med is not None:
                frozen_medians[name] = med

    # the chained tick's steady-state split (VERDICT r10 #6): the LAST
    # tick's update_s is the per-tick maintenance cost that stays flat
    # while the corpus grows; audit_s is the nightly read side over the
    # maintained artifacts — so round-over-round reads stop conflating
    # q_ingest_audit's cold scaffolding with steady-state cost.
    # r12 (VERDICT r11 #4): MEDIAN of 3 throwaway chain builds
    # (tick.chain_trial — fresh state dir each, never the session
    # cache), matching the frozen-row isolated-median protocol, so the
    # fields carry a band SCALING.md can freeze instead of the r11
    # single-shot firsts.
    # NOT merged into `times`: the cached chain's wall-clock is already
    # inside the tick_chain_build row, so a queries-map entry would
    # double-count in headline_full.  Top-level fields in the compact
    # summary.
    tick_rows: dict[str, float] = {}
    if only_set is None and chain_timings(sf_dir):
        from statistics import median

        from zebra_spark.queries.tick import chain_trial

        # failure-isolated like every other section: a transient
        # executor failure in one of these three full chain builds
        # must cost the tick fields, never the whole run's output
        # (they execute LAST, after ~35 min of measurements).
        # TICK_TRIALS feeds both the loop and the completeness checks
        # below (ADVICE r12: the literal 3 was duplicated, so changing
        # one silently dropped the fields from the summary).
        TICK_TRIALS = 3
        trials = []
        for _ in range(TICK_TRIALS):
            try:
                trials.append(chain_trial(spark, sf_dir))
            except Exception as exc:  # noqa: BLE001
                errors["tick_trial"] = f"{type(exc).__name__}: {exc}"[:500]
                print(f"chain_trial failed: {exc}", file=sys.stderr)
                break
        ups = [t["update_s"] for t in trials if "update_s" in t]
        auds = [t["audit_s"] for t in trials if "audit_s" in t]
        if len(ups) == TICK_TRIALS:
            tick_rows["tick_update_s"] = round(median(ups), 3)
        if len(auds) == TICK_TRIALS:
            tick_rows["tick_audit_s"] = round(median(auds), 3)
        # per-step decomposition medians (r17, VERDICT r16 #1): when
        # tick_update_s moves, the artifact itself says which step —
        # the ceilings are confirmed or recalibrated against THIS, not
        # against a hand re-measure on a different box.  Same
        # completeness gate as the aggregate fields: a partial trial
        # set must not emit official-looking 1-sample "medians"
        # (review r17).
        if len(trials) == TICK_TRIALS and all(
            "update_parts" in t for t in trials
        ):
            keys = sorted(
                set().union(*(t["update_parts"] for t in trials))
            )
            tick_rows["tick_update_parts"] = {
                k: round(
                    median(t["update_parts"].get(k, 0.0) for t in trials),
                    3,
                )
                for k in keys
            }

    total = round(sum(times.values()), 3)
    out = {
        "metric": "headline_suite_warm",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(sf),
        # Comparability governance (VERDICT r7 #6): the suite grows
        # every round, which masks per-query signal in the headline
        # total.  headline_frozen is the FROZEN r5-era steady-state
        # subset (27 rows, never to change), so cross-round deltas are
        # one subtraction; headline_full is the growing total above.
        "headline_frozen": round(
            sum(t for n, t in times.items() if n in FROZEN_ROWS), 3
        ),
        "headline_frozen_n": sum(1 for n in times if n in FROZEN_ROWS),
        "headline_full": total,
    }
    if hotspots:
        out["hotspots_isolated"] = hotspots
    if frozen_medians:
        # the r10+ comparability number: sum of per-row medians of 3
        # isolated trials (protocol in the module docstring)
        out["headline_frozen_median"] = round(
            sum(frozen_medians.values()), 3
        )
        # rows actually summed — a dropped row (failed trial) must be
        # visible, or cross-round medians compare different subsets
        out["frozen_median_n"] = len(frozen_medians)
        out["frozen_medians"] = frozen_medians

    # B8: the FULL hash-checked suite (every oracled query) at sf0.01,
    # one warm session — tracked by the artifact itself rather than
    # inferred from pytest (VERDICT r4 directive 6).  Wall-clock with 8
    # concurrent Spark actions (same shape as the parity sweep); skipped
    # when a subset filter is active.
    if only_set is None or "suite_sf001" in only_set:
        from concurrent.futures import ThreadPoolExecutor

        b8_dir = "/root/testdata/sf0.01"

        def run_one(name: str) -> tuple[str | None, float]:
            t = time.perf_counter()
            try:
                _consume(zebra_spark.QUERIES[name](spark, b8_dir))
                return None, time.perf_counter() - t
            except Exception as exc:  # noqa: BLE001 — record, keep going
                return f"{type(exc).__name__}: {exc}"[:200], (
                    time.perf_counter() - t
                )

        names = sorted(zebra_spark.ORACLES)
        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=8) as ex:
            results = dict(zip(names, ex.map(run_one, names)))
        release_caches()
        out["suite_sf001"] = round(time.perf_counter() - t0, 3)
        out["suite_sf001_queries"] = len(names)
        # per-row attribution (r17, VERDICT r16 #3): suite_sf001 moved
        # +51% in r16 with nothing in the artifact saying which rows.
        # These are wall-times UNDER the 8-way concurrency (they sum to
        # ~8x suite_sf001 and include scheduler wait), so they rank and
        # attribute rather than measure — the same role the queries map
        # plays for the headline.  Top slice only: a 194-row map would
        # bloat the artifact for a tail that never moves the total.
        failed = {n: r[0] for n, r in results.items() if r[0]}
        # rank SUCCESSFUL rows only (review r17): a query that spins
        # 30 s before dying would otherwise top the attribution map
        # looking like the hottest row; failures keep their elapsed
        # time in their own map, marked as failures
        row_times = {
            n: r[1] for n, r in results.items() if n not in failed
        }
        out["suite_sf001_rows"] = {
            n: round(row_times[n], 3)
            for n in sorted(row_times, key=row_times.get, reverse=True)[:15]
        }
        if failed:
            out["suite_sf001_failed_s"] = {
                n: round(results[n][1], 3) for n in sorted(failed)
            }
            errors.update({f"suite:{n}": e for n, e in failed.items()})

    out.update(tick_rows)
    if errors:
        # Partial failure still yields a comparable suite number; the
        # per-query error map makes the gap visible instead of silent.
        out["errors"] = errors

    # Self-defending headline (r16, VERDICT r15 #1a): two rounds
    # running, the kept BENCH number regressed while isolated
    # re-measures held, and the attribution lived only in the
    # bench_diff tool run by hand afterwards.  The artifact now
    # carries its own attribution: the control-row drift factor
    # against the PREVIOUS round's full artifact (scripts/bench_diff
    # math — median new/old ratio of knn_exact_100 + q_agg_hash,
    # clamped [0.67, 1.5]) and the drift-adjusted headline scalars.
    # A hot box shows factor ~1.3 with flat adjusted numbers; a real
    # regression shows factor ~1.0 with elevated adjusted numbers.
    # Skipped on subset runs (review r16): a partial queries map (often
    # missing the control rows entirely) would emit factor-1.0
    # "attribution" scalars that look official while meaning nothing —
    # every other drift-sensitive section is gated the same way.
    here = Path(__file__).resolve().parent
    # this round's number, inferred the same way full_name is below:
    # the driver's BENCH_r{N}.json lands AFTER bench runs, so at bench
    # time max(existing)+1 IS this round
    rounds = []
    for p in here.glob("BENCH_r*.json"):
        try:
            rounds.append(int(p.stem.split("_r")[-1]))
        except ValueError:
            continue
    this_round = max(rounds) + 1 if rounds else 1
    if only_set is None:
        try:
            sys.path.insert(0, str(here / "scripts"))
            import bench_diff as _bd

            fulls = []
            for p in here.glob("bench_full_r*.json"):
                if "_partial" in p.stem:
                    continue
                try:
                    n = int(p.stem.split("_r")[-1])
                except ValueError:
                    continue
                # strictly BEFORE this round (ADVICE r16): a same-round
                # re-run must still normalize against the PREVIOUS
                # round's artifact, not its own earlier output
                if n < this_round:
                    fulls.append((n, p))
            if fulls:
                ref_path = max(fulls)[1]
                ref = json.loads(ref_path.read_text())
                factor = _bd.drift_factor(ref, out)
                out["drift_ref"] = ref_path.name
                out["drift_control_ratio"] = round(
                    _bd.control_ratio(ref, out), 3
                )
                out["drift_factor"] = round(factor, 3)
                out["headline_full_adj"] = round(
                    out["headline_full"] / factor, 3
                )
                if "headline_frozen_median" in out:
                    out["headline_frozen_median_adj"] = round(
                        out["headline_frozen_median"] / factor, 3
                    )
        except Exception as exc:  # noqa: BLE001 — attribution best-effort
            print(f"drift normalization failed: {exc}", file=sys.stderr)

    # Driver-parseable output contract (VERDICT r10 #1): BENCH_r10 came
    # back `parsed: null` because the one-line summary had outgrown the
    # driver's capture (189-row queries map + 27 medians + hotspots).
    # The FULL result now lands in bench_full_r{N}.json at the repo
    # root (N inferred from the BENCH_r*.json files the driver leaves —
    # at bench time the current round's file does not exist yet, so
    # max+1 IS this round); stdout gets a COMPACT single line with the
    # headline numbers plus the 8 BASELINE.md-mapped rows, guaranteed
    # far under 2 KB.
    full_name = (
        f"bench_full_r{this_round:02d}.json" if rounds else "bench_full.json"
    )
    # a SUBSET run (SPARK_GRAFT_BENCH_QUERIES) must not clobber the
    # round's full artifact with a partial queries map (r13: two
    # subset smoke-runs silently overwrote the 62-row record)
    if only_set is not None:
        full_name = full_name.replace(".json", "_partial.json")
    full_path = os.environ.get("SPARK_GRAFT_BENCH_FULL") or str(
        here / full_name
    )
    try:
        Path(full_path).write_text(json.dumps(out, indent=1))
    except OSError as exc:
        print(f"bench_full write failed: {exc}", file=sys.stderr)

    baseline_rows = (
        "q_agg_hash", "q_join_inner", "knn_exact_100", "lsh_build",
        "lsh_query_100", "q_dedup_exact", "ingest", "q_ingest_audit",
    )
    compact = {
        "metric": out["metric"],
        "value": out["value"],
        "unit": "sec",
        "sf": out["sf"],
        # the BASELINE.md-mapped rows only — the full per-query map is
        # in the file named by "full"
        "queries": {n: times[n] for n in baseline_rows if n in times},
        "headline_frozen": out["headline_frozen"],
        "headline_frozen_n": out["headline_frozen_n"],
        "headline_full": out["headline_full"],
        "n_queries": len(times),
        "full": os.path.basename(full_path),
    }
    for k in (
        "headline_frozen_median", "frozen_median_n", "suite_sf001",
        "suite_sf001_queries", "hotspots_isolated", "tick_update_s",
        "tick_audit_s", "tick_update_parts",
        # drift self-defense scalars (r16): the compact line the driver
        # keeps must carry its own attribution, not just raw values
        "drift_ref", "drift_control_ratio", "drift_factor",
        "headline_full_adj", "headline_frozen_median_adj",
    ):
        if k in out:
            compact[k] = out[k]
    # B8 attribution in the line the driver keeps (r17, VERDICT r16
    # #3): the 5 slowest sf0.01 suite rows — enough to see WHAT moved
    # when suite_sf001 moves; the top-15 slice is in the full artifact
    if "suite_sf001_rows" in out:
        rows = out["suite_sf001_rows"]
        compact["suite_sf001_top"] = {
            n: rows[n] for n in list(rows)[:5]
        }
    if errors:
        compact["errors_n"] = len(errors)
    line = json.dumps(compact)
    if len(line) > 2000:  # hard budget: drop maps, keep scalars
        compact.pop("hotspots_isolated", None)
        compact.pop("queries", None)
        compact.pop("suite_sf001_top", None)
        compact.pop("tick_update_parts", None)
        line = json.dumps(compact)
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
