"""Regenerate PLANS.md: the physical-plan dossier for the bench
headline queries.

For each headline query: the operator tree (numbered list from the
formatted explain), parquet scan count, join strategies, and the
PushedFilters/ReadSchema lines — the exact things a plan audit checks
(pushdown, pruning, broadcast vs sort-merge, no cartesian products).

Run after any plan-affecting change:  python scripts/dump_plans.py
"""

from __future__ import annotations

import io
import re
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF = "/root/testdata/sf0.01"

HEADLINE = [
    "q_agg_hash", "q_join_inner", "q_dedup_exact", "q_window_session",
    "q_text_jaccard_pairs", "q_sort_limit", "q_ann_ivf", "q_window_sliding",
    "q_text_fingerprint", "q_dedup_minhash", "q_dedup_clusters",
    "q_neardup_cosine", "q_tpch_q9", "q_tpch_q21", "q_curation_pipeline",
    "q_dedup_incremental", "q_semantic_clusters", "q_emb_covariance",
    "q_text_surprisal", "q_ann_pq", "q_ngram_novelty", "q_text_containment",
    "q_events_retention", "q_emb_outliers", "q_emb_standardize",
    "q_source_rebalance", "q_text_dup_spans", "q_graph_pagerank",
    "q_emb_random_projection", "q_events_anomaly", "q_seq_length_hist",
    "q_sketch_calibration", "q_dedup_minhash_capped",
    "q_text_gopher_filters", "q_graph_degree_hist", "q_eval_decontaminate",
    "q_pair_table_delta", "q_cosine_table_delta", "q_snapshot_audit",
    "q_semantic_incremental", "q_graph_triangles", "q_table_profile",
    "q_heavy_hitters", "q_source_entropy", "q_corr_matrix",
    "q_events_funnel",
    "q_cosine_assign_delta", "q_cosine_delta_unseen", "q_cell_drift",
    "q_cluster_delta", "q_semantic_cluster_delta", "q_band_balance",
    "q_cell_balance", "q_ingest_audit", "q_train_order",
    "q_shard_manifest", "q_quality_threshold_sweep",
    "q_cluster_size_hist", "q_cluster_takedown",
    "q_cosine_capped_pairs", "q_drift_baseline",
    "q_tick_chain_pairs", "q_tick_chain_cosine", "q_tick_chain_clusters",
    "q_export_shards", "q_pack_sequences", "q_mix_rebalance",
    "q_token_budget_sample", "q_export_dedup_order",
    "q_export_append_order", "q_export_append_takedown",
    "q_export_append_manifest", "q_pack_sequences_epoch",
    "q_knn_label_prop", "q_knn_label_prop_audit",
    "q_knn_label_prop_ann", "q_knn_label_prop_weighted",
    "q_knn_label_prop_ann_weighted", "q_export_rebalance",
    "q_label_prop_calibration", "q_graph_local_cc_hist", "q_text_zipf",
    "q_knn_filtered", "q_knn_filtered_ivf", "q_export_lifecycle_tick",
]

# Per-query audit notes appended under the summary line.
NOTES = {
    "q_knn_filtered": (
        "PRE-filter: the lang predicate is pushed to the documents "
        "scan (PushedFilters), survivors semi-join the corpus, and "
        "distance math runs only over admissible rows; the query side "
        "broadcasts — no cartesian, no post-filtered top-k."
    ),
    "q_export_lifecycle_tick": (
        "Composed takedown -> rebalance -> manifest over a real "
        "3-epoch tree; the plan shown is the final manifest read "
        "(partition-pruned scan + two-level agg) — the verbs' write "
        "plans are audited under their own rows."
    ),
    "q_text_zipf": (
        "Top-10k vocab via orderBy+limit — TakeOrderedAndProject "
        "(per-partition heads + one bounded merge), NEVER a global "
        "window over the full vocabulary; the rank window and the "
        "regression run on the bounded 10k-row frame."
    ),
    "q_graph_local_cc_hist": (
        "Packed-bitset per-edge common-neighbor counts (the "
        "q_graph_triangles machinery): edges stream through two "
        "BROADCAST word-table joins — never a wedge enumeration — "
        "then each edge credits both endpoints (one union + groupBy "
        "on |edges| rows) and the decile bucketing is integer "
        "arithmetic, so no float boundary drift vs the oracle."
    ),
    "q_cosine_assign_delta": (
        "Unseen-batch assignment: the only nested loop is batch x "
        "broadcast seed matrix (k x dim, driver-small at any corpus "
        "size); one per-vector rank window.  Cost is |batch| x "
        "|seeds|, no corpus scan."
    ),
    "q_cosine_delta_unseen": (
        "Cell collision is an equi-join on cell_id (batch assignments "
        "vs corpus-union-batch assignments); only batch-involving "
        "pairs reach the single-dot verify kernel.  The seed "
        "assignments are the same broadcast-nested-loop shape as the "
        "assign table build."
    ),
    "q_cell_drift": (
        "Three splits x (min over broadcast seeds) -> one (n, avg) "
        "aggregate each; the ratio join broadcasts a single-row "
        "baseline.  Nothing batch- or corpus-proportional reaches the "
        "driver."
    ),
    "q_pair_table_delta": (
        "Both sides of the band join scan the shared sig_table parquet; "
        "the batch side is a semi-join-reduced slice, so cost scales "
        "with |batch| x bucket sizes, never |corpus|^2."
    ),
    "q_cosine_table_delta": (
        "Candidates come from the materialized cosine_assign_table "
        "(cell equi-join, batch side semi-join-reduced); only "
        "new-involving pairs reach the single-dot verify kernel."
    ),
    "q_snapshot_audit": (
        "Nine 1-row section summaries unioned; each section is a "
        "bounded aggregation over the shared pair/cosine/cluster "
        "tables or per-row expressions — steady-state consumption "
        "after the one-time derived-table builds."
    ),
    "q_cluster_delta": (
        "Incremental clustering: the iterated edge frame is "
        "star(pre-batch labels) ∪ thresholded pair delta — |V| + "
        "|delta| rows with old components at diameter 1 — so pointer "
        "doubling converges in O(log delta-chain) rounds; per-round "
        "frames are localCheckpoint-cut, the final plan is the label "
        "join only.  Locked by test_cluster_delta_iterates_star_union."
    ),
    "q_semantic_cluster_delta": (
        "The embedding-space twin of q_cluster_delta: same star-union "
        "CC over the thresholded COSINE pair delta (cell equi-join, "
        "batch-proportional)."
    ),
    "q_band_balance": (
        "One parquet scan of the maintained signature table -> two "
        "groupBy levels, no joins — the nightly max_bucket evidence "
        "histogram.  Locked single-scan/no-join by "
        "test_balance_histograms_single_scan."
    ),
    "q_cell_balance": (
        "One parquet scan of the maintained assignment table -> one "
        "groupBy, no joins — the nightly NDUP_MAX_CELL evidence "
        "histogram.  Same lock."
    ),
    "q_train_order": (
        "Deterministic export order: shard = pure hash row function, "
        "pos = per-shard window — shuffle on the shard key + "
        "sort-within-partition, the exact shape a distributed export "
        "writer runs; NO single-partition global window."
    ),
    "q_shard_manifest": (
        "One hash expression + one two-level aggregation over the "
        "corpus scan; the shard-balance evidence for the N_SHARDS "
        "knob."
    ),
    "q_quality_threshold_sweep": (
        "Per-doc features once (one token aggregation), 9-row "
        "threshold spine broadcast, one grouped aggregation + a 1-row "
        "totals broadcast — the whole curve costs one corpus scan."
    ),
    "q_cluster_size_hist": (
        "Two groupBys over the maintained 'clusters' labels parquet — "
        "no graph traversal at query time."
    ),
    "q_cluster_takedown": (
        "Affected components found by one semi-join on the label "
        "table; untouched clusters pass through verbatim (anti-join "
        "against the broadcast affected set); CC runs only on the "
        "affected families' induced subgraph.  The fixture's mega "
        "dup-family makes 'affected' ~ everything here — see "
        "SCALING.md."
    ),
    "q_ingest_audit": (
        "The nightly tick's surface: nine 1-row section summaries "
        "unioned over the maintained artifacts the tick just wrote "
        "(minhash/cosine/cosassign/clusters).  The update half's delta "
        "joins are audited under their own entries "
        "(q_pair_table_delta, q_cosine_table_delta, "
        "q_cosine_assign_delta, q_cluster_delta); the drift gate adds "
        "one broadcast-seed batch pass ((n, mse) scalars only)."
    ),
    "q_cosine_capped_pairs": (
        "The giant-cell guard at a BINDING cap=64: per-cell sorted "
        "member lists are sliced to their max_cell prefix BEFORE pair "
        "fan-out (F.slice on the collect_list aggregate — a windowed "
        "prefix, fully distributed, no collect), bounding per-cell "
        "pairs at cap^2/2 regardless of cell size.  Same admitted set "
        "as the delta kernel's row_number window "
        "(test_cosine_max_cell_cap pins equality)."
    ),
    "q_drift_baseline": (
        "The persisted reseed baseline: corpus x broadcast-seed "
        "nested loop -> per-vector min -> ONE global (n, avg) "
        "aggregate.  Two scalars reach the driver; this is the 1-row "
        "'driftbase' artifact every nightly needs_reseed compares a "
        "batch against without re-scoring the corpus."
    ),
    "q_tick_chain_pairs": (
        "Reads the final maintained lexical pair table of the "
        "session's 3-tick chained-maintenance run (queries/tick.py): "
        "the serving plan is ONE parquet scan of the appended state — "
        "the whole point of maintained artifacts.  The chain's build "
        "plans are the already-audited delta shapes "
        "(q_pair_table_delta per tick); chain == from-scratch is the "
        "oracle's job."
    ),
    "q_tick_chain_cosine": (
        "One parquet scan of the chain's appended cosine pair state; "
        "per-tick build shape is q_cosine_table_delta's (cell "
        "equi-join, batch side semi-join-reduced, frozen broadcast "
        "seeds)."
    ),
    "q_tick_chain_clusters": (
        "One parquet scan of the chain's label snapshot, rewritten "
        "per tick at |V| rows via the star-union merge "
        "(q_cluster_delta's audited shape)."
    ),
    "q_export_shards": (
        "Prices the export WRITE + read-back: the write is one "
        "shuffle on the shard key (the per-shard pos window and the "
        "writer's repartition share it) + sort-within-partition + "
        "partitionBy shard dirs; the serving plan here is the "
        "file-level manifest — one scan of the written files, one "
        "two-level aggregation."
    ),
    "q_pack_sequences": (
        "Concat-and-chunk sequence packing: ONE shuffle on the shard "
        "key + a per-partition running-sum window over the training "
        "order — the same partitioning the export writer uses, so "
        "packing rides the export shuffle.  Sequence assignment is "
        "integer window arithmetic (no UDF, no global window)."
    ),
    "q_mix_rebalance": (
        "Mixture rebalancing with a SKEW-FREE exact rank: the global "
        "per-language rank decomposes by hash range — broadcast "
        "per-bucket prefix counts + row_number within (lang, bucket), "
        "a window over |languages| x 1024 well-distributed keys, "
        "bit-equal to ranking each whole language in one task.  "
        "Quota arithmetic is all-integer (basis points), so both "
        "engines agree exactly."
    ),
    "q_token_budget_sample": (
        "Token-denominated sampling with the same skew-free "
        "decomposition as q_mix_rebalance: broadcast per-(source, "
        "bucket) token prefix sums + a running sum within (source, "
        "bucket) — bit-equal to the single per-source cumulative "
        "window without putting the dominant source in one task."
    ),
    "q_export_dedup_order": (
        "curate -> dedup -> export composition: one scan of the "
        "maintained 'clusters' artifact (keep = representative), "
        "then the export writer's shard-key window over the "
        "survivors.  No graph traversal at query time; the closure "
        "cost lives in the maintained-label build/maintenance."
    ),
    "q_export_append_order": (
        "Epoch-major append-friendly order: same one-shuffle-on-shard "
        "+ per-shard window shape as q_train_order, with (epoch, hv, "
        "doc_id) as the sort key so each epoch's rows land strictly "
        "after every earlier epoch's — the property that lets "
        "export_epoch_append publish one epoch's files per tick "
        "without touching existing files."
    ),
    "q_export_append_takedown": (
        "Drives the REAL takedown path: 3 epoch appends + an "
        "affected-epoch-only rewrite on disk, then reads the "
        "published tree back — the serving plan is a partition-"
        "discovering parquet scan of the epoch=/shard= dirs.  The "
        "takedown itself is one broadcast semi-join to find affected "
        "epochs + one partition-pruned anti-join rewrite per hit; "
        "survivors keep their original (shard, pos)."
    ),
    "q_export_append_manifest": (
        "Publish-time check through real files: builds the 3-epoch "
        "append export, re-reads the published tree, and aggregates "
        "per (epoch, shard) — one scan of the already-partitioned "
        "files + a two-level aggregation."
    ),
    "q_knn_label_prop": (
        "Broadcast-nested-loop of the corpus against the SEED side "
        "(a CONSTANT 100-id capped fixture since r12 — cost linear "
        "in the corpus) + a per-vector rank window + a vote "
        "aggregate.  No corpus-x-corpus pair ever forms; larger seed "
        "sets route through q_knn_label_prop_ann's salted cell join "
        "(executed + measured 2.0x in SCALING.md, r12)."
    ),
    "q_knn_label_prop_audit": (
        "One extra join + integer aggregate on top of the "
        "propagation's plan — the per-label recovered-count audit."
    ),
    "q_knn_label_prop_weighted": (
        "Soft-label variant: the same corpus x constant-broadcast-seed "
        "scan and rank window as q_knn_label_prop, with a weighted "
        "(1/(1+dist)) aggregate; the pick orders by the ROUNDED score "
        "so cross-engine float accumulation cannot flip a winner."
    ),
    "q_knn_label_prop_ann": (
        "The ANN propagation: probe cells computed executor-side "
        "(mapInPandas over the trained centroid matrix), then ONE "
        "equi-join of probe-expanded queries against cell+salt-keyed "
        "seeds with the L2^2 inside the join — candidate pairs form "
        "and reduce inside codegen, never shuffled; per-cell salt "
        "buckets bound pairs-per-key.  Static plan prices the seeded "
        "Lloyd train (bounded collects: k x dim means) + the vote."
    ),
    "q_knn_label_prop_ann_weighted": (
        "Identical plan to q_knn_label_prop_ann — the weighted flag "
        "swaps only the final aggregate (sum 1/(1+dist) + "
        "rounded-score pick instead of count + votes pick); "
        "candidates, rank window and salt discipline unchanged."
    ),
    "q_export_rebalance": (
        "File-driving gate: builds the 3-epoch export, then the "
        "rebalance — NO global window (per-(epoch, shard) counts "
        "collect as dirs x N_SHARDS ints, rank = broadcast offset + "
        "per-partition row_number), one shuffle into the new shard "
        "key, integer DIV for the cut.  The printed plan is the "
        "re-read of the published tree."
    ),
    "q_label_prop_calibration": (
        "q_knn_label_prop_weighted's plan + one broadcast truth join "
        "+ one partial-then-final aggregate over the 0.05 score bins "
        "— the calibration read costs one extra narrow join, never a "
        "second corpus pass."
    ),
    "q_pack_sequences_epoch": (
        "q_pack_sequences' window in (epoch, hv, doc_id) order — the "
        "append export's order — so earlier epochs' sequence "
        "assignments are immutable under appends.  Same one-shuffle + "
        "per-partition window shape; no UDF, no global window."
    ),
    "q_graph_pagerank": (
        "Static print repeats the persisted sym/deg frames' *lineage* at "
        "every reference site, inflating the raw scan/SMJ counts; at "
        "runtime each is one InMemoryTableScan (see `cached-scans`), so "
        "the parquet corpus is read once and every iteration joins "
        "against cached edge/degree partitions.  The Cross joins are "
        "1-row count frames (broadcast)."
    ),
}


def main() -> None:
    import zebra_spark
    from zebra_spark.session import get_spark

    zebra_spark.load_all_queries()
    spark = get_spark("plan-dump", cpus="8")

    out = [
        "# PLANS — physical-plan dossier for the bench headline",
        "",
        "Generated by `scripts/dump_plans.py` (static plans at sf0.01; AQE",
        "re-plans sort-merge joins to broadcast at runtime where the shuffle",
        "stats allow — `SMJ` below is the conservative pre-AQE choice for",
        "sides that are corpus-sized at 100 TB).",
        "",
    ]
    for name in HEADLINE:
        df = zebra_spark.QUERIES[name](spark, SF)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        # the formatted explain prints the indented tree (op name with
        # "(n)" at END of line), then per-op detail sections headed by
        # "(n) OpName" at column 0 — keep the tree, stop at the details
        ops = []
        for line in plan.splitlines():
            if re.match(r"^\(\d+\)", line):
                break
            if re.search(r"\(\d+\)\s*$", line):
                ops.append(line.rstrip())
        scans = sum("Scan parquet" in o for o in ops)
        smj = sum("SortMergeJoin" in o for o in ops)
        bhj = sum("BroadcastHashJoin" in o for o in ops)
        cart = sum("CartesianProduct" in o for o in ops)
        imts = sum("InMemoryTableScan" in o for o in ops)
        pushed = sorted(
            {line.strip() for line in plan.splitlines()
             if "PushedFilters: [" in line and "PushedFilters: []" not in line}
        )
        out.append(f"## {name}")
        out.append("")
        out.append(
            f"scans={scans} · broadcast-joins={bhj} · sort-merge={smj}"
            f" · cartesian={cart}"
            + (f" · cached-scans={imts}" if imts else "")
        )
        if name in NOTES:
            out.append("")
            out.append(f"_{NOTES[name]}_")
        out.append("")
        out.append("```")
        out.extend(o for o in ops)
        out.append("```")
        if pushed:
            out.append("")
            out.extend(f"- `{p}`" for p in pushed[:4])
        out.append("")
    Path(__file__).resolve().parent.parent.joinpath("PLANS.md").write_text(
        "\n".join(out)
    )
    print(f"PLANS.md written ({len(HEADLINE)} queries)")
    spark.stop()


if __name__ == "__main__":
    main()
