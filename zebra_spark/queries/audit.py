"""Corpus-snapshot audit: the one entry point a 100 TB pipeline runs
nightly (VERDICT r6 #4).

A corpus snapshot's derived tables (MinHash pair table, cosine pair
table, signatures, token sets, IVF assignments) are built/refreshed
ONCE, then the full audit block — quality-rule failures, source mixture
plan, dup-graph degree histogram, eval decontamination, cross-language
contamination, embedding kNN label purity — reads those shared
artifacts.  snapshot_audit() returns the per-section frames (byte-equal
to the individually registered queries, pinned by tests);
q_snapshot_audit compresses each section to (section, n_rows, checksum)
for a single driver-checkable summary row per section and one bench
row for the whole composite.

No reference counterpart (the reference is a vector store); this is
part of the LLM-data-pipeline surface mandated by SURVEY.md §2.C.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zebra_spark.registry import query

# section -> registered query backing it.  Every entry reads a shared
# derived table (or only per-row expressions), so after the one-time
# builds the composite is pure steady-state consumption.
AUDIT_SECTIONS: dict[str, str] = {
    "gopher_quality": "q_text_gopher_filters",
    "source_mixture": "q_source_mixture_plan",
    "dup_degree_hist": "q_graph_degree_hist",
    "eval_decontamination": "q_eval_decontaminate",
    "cross_lang_contamination": "q_dedup_cross_lang",
    "knn_label_purity": "q_emb_knn_purity",
}


def snapshot_audit(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Build/refresh the snapshot's derived tables, then return every
    audit section as its own DataFrame — each bit-identical to running
    the corresponding registered query, because each IS that query over
    the same shared artifacts (the wiring the tests pin)."""
    from zebra_spark.queries.dedup import cosine_pair_table, pair_table
    from zebra_spark.registry import QUERIES

    # one-time-per-snapshot builds (session-cached; on a cluster these
    # are the maintained tables register_maintained_table points at)
    pair_table(spark, sf_dir)
    cosine_pair_table(spark, sf_dir)
    return {
        section: QUERIES[qname](spark, sf_dir)
        for section, qname in AUDIT_SECTIONS.items()
    }


@query("q_snapshot_audit")
def q_snapshot_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(section, n_rows, checksum): one summary row per audit section —
    the composite's driver-checkable surface.  checksum is the
    order-insensitive bit_xor of xxhash64 over every column (sorted by
    name), so any value change in any section flips its row.  rows-only
    by design: each underlying section is individually oracle-checked
    under its own registered name; this row pins the COMPOSITE wiring.

    Scale shape: after the one-time derived-table builds, the audit is
    six bounded aggregations over shared parquet artifacts — the
    summaries union driver-side as six 1-row frames."""
    frames = snapshot_audit(spark, sf_dir)
    out = None
    for section in sorted(frames):
        df = frames[section]
        h = F.xxhash64(*[F.col(c) for c in sorted(df.columns)])
        row = (
            df.select(h.alias("h"))
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.coalesce(F.bit_xor("h"), F.lit(0)).alias("checksum"),
            )
            .select(F.lit(section).alias("section"), "n_rows", "checksum")
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("section")
