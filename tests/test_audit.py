"""Corpus-snapshot audit composite (zebra_spark/queries/audit.py):
section wiring byte-equality and summary integrity."""

from __future__ import annotations

import hashlib

import zebra_spark
from tests.conftest import SF_ORACLE
from zebra_spark.queries.audit import AUDIT_SECTIONS, snapshot_audit

zebra_spark.load_all_queries()


def _vhash(pdf):
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    rows = sorted(tuple(str(v) for v in r) for r in pdf.itertuples(index=False))
    return hashlib.md5(str(rows).encode()).hexdigest()


def test_sections_byte_equal_to_individual_queries(spark):
    """Each snapshot_audit section must be byte-equal to running the
    individually registered query — the 'one call == the six calls'
    contract (VERDICT r6 #4)."""
    frames = snapshot_audit(spark, SF_ORACLE)
    assert set(frames) == set(AUDIT_SECTIONS)
    for section, qname in AUDIT_SECTIONS.items():
        got = frames[section].toPandas()
        want = zebra_spark.QUERIES[qname](spark, SF_ORACLE).toPandas()
        assert _vhash(got) == _vhash(want), section
    from zebra_spark.caching import release_caches

    release_caches()


def test_summary_row_per_section_and_checksum_sensitivity(spark):
    """q_snapshot_audit: one row per section, stable across runs, and
    the checksum actually covers the section values (n_rows matches the
    underlying frame)."""
    out = zebra_spark.QUERIES["q_snapshot_audit"](spark, SF_ORACLE).toPandas()
    assert list(out["section"]) == sorted(AUDIT_SECTIONS)
    for section, qname in AUDIT_SECTIONS.items():
        n = len(zebra_spark.QUERIES[qname](spark, SF_ORACLE).toPandas())
        assert out.loc[out.section == section, "n_rows"].iloc[0] == n
    again = zebra_spark.QUERIES["q_snapshot_audit"](spark, SF_ORACLE).toPandas()
    from zebra_spark.caching import release_caches

    release_caches()
    assert out.equals(again)


def test_snapshot_audit_consumes_maintained_tables(spark, tmp_path):
    """The nightly composite over externally MAINTAINED artifacts: write
    both pair tables where an ingest pipeline would, register them, and
    the full audit summary must equal the session-rebuilt one — the
    end-to-end wiring a 100 TB deployment runs."""
    from zebra_spark.queries import dedup as dd

    want = zebra_spark.QUERIES["q_snapshot_audit"](spark, SF_ORACLE).toPandas()

    pair_p = str(tmp_path / "pairs")
    cos_p = str(tmp_path / "cosine_pairs")
    dd.pair_table(spark, SF_ORACLE).write.mode("overwrite").parquet(pair_p)
    dd.cosine_pair_table(spark, SF_ORACLE).write.mode("overwrite").parquet(cos_p)

    prev_pair = dd.register_maintained_table("minhash", SF_ORACLE, pair_p)
    prev_cos = dd.register_maintained_table("cosine", SF_ORACLE, cos_p)
    try:
        got = zebra_spark.QUERIES["q_snapshot_audit"](
            spark, SF_ORACLE
        ).toPandas()
    finally:
        if prev_pair is not None:
            dd.register_maintained_table("minhash", SF_ORACLE, prev_pair)
        if prev_cos is not None:
            dd.register_maintained_table("cosine", SF_ORACLE, prev_cos)
    from zebra_spark.caching import release_caches

    release_caches()
    assert got.equals(want)


def test_ingest_then_audit_equals_rebuild(spark, tmp_path):
    """VERDICT r7 #5: the one-call nightly tick — apply both delta
    paths, write maintained artifacts, audit over them — must be
    byte-equal to rebuild-then-audit, and the per-section frames must
    match the individually registered queries."""
    import pandas as pd

    import zebra_spark
    from zebra_spark.queries.audit import ingest_then_audit

    zebra_spark.load_all_queries()

    want = zebra_spark.QUERIES["q_snapshot_audit"](spark, SF_ORACLE).toPandas()
    got = zebra_spark.QUERIES["q_ingest_audit"](spark, SF_ORACLE).toPandas()
    from zebra_spark.caching import release_caches

    release_caches()
    pd.testing.assert_frame_equal(
        got.sort_values("section").reset_index(drop=True),
        want.sort_values("section").reset_index(drop=True),
    )

    # the returned frames stay readable after the registry restore
    frames = ingest_then_audit(spark, SF_ORACLE, str(tmp_path / "wd"))
    from zebra_spark.queries.audit import AUDIT_SECTIONS

    assert set(frames) == set(AUDIT_SECTIONS)
    for df in frames.values():
        assert df.count() >= 0
    # ADVICE r8: a kind with no prior registration must be UNREGISTERED
    # on exit, not left pointing at the (temp) work_dir for the session
    from zebra_spark.queries import dedup as dd

    wd = str(tmp_path / "wd")
    assert not any(
        isinstance(p, str) and p.startswith(wd)
        for p in dd._DERIVED.values()
    )
    release_caches()
