"""End-to-end export writer (r10, VERDICT r9 #3): per-shard parquet in
deterministic training order, file-level manifest, takedown coherence."""

from __future__ import annotations

import hashlib
from pathlib import Path

import pytest

from pyspark.sql import functions as F

import zebra_spark
from tests.conftest import SF_SMOKE
from zebra_spark.queries.text import (
    export_training_shards,
    shard_manifest_from_files,
)

zebra_spark.load_all_queries()


def _vhash(pdf):
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    rows = sorted(
        tuple(str(v) for v in r) for r in pdf.itertuples(index=False)
    )
    return hashlib.md5(str(rows).encode()).hexdigest()


def test_export_manifest_and_order_match_plan(spark, tmp_path):
    """The written files must carry exactly the planned export: the
    file-level manifest equals q_shard_manifest (computed from the
    corpus alone), the file-level (doc_id, shard, pos) equals
    q_train_order, and every parquet file is internally ascending by
    pos — the property a sequential training reader relies on."""
    out = str(tmp_path / "shards")
    manifest = export_training_shards(spark, SF_SMOKE, out).toPandas()
    want = zebra_spark.QUERIES["q_shard_manifest"](spark, SF_SMOKE).toPandas()
    assert _vhash(manifest) == _vhash(want)

    got_order = (
        spark.read.parquet(out)
        .select("doc_id", F.col("shard").cast("int").alias("shard"), "pos")
        .toPandas()
    )
    want_order = zebra_spark.QUERIES["q_train_order"](
        spark, SF_SMOKE
    ).toPandas()
    assert _vhash(got_order) == _vhash(want_order)

    import pyarrow.parquet as pq

    files = sorted(Path(out).glob("shard=*/*.parquet"))
    assert files, "no shard files written"
    for f in files:
        pos = pq.read_table(f, columns=["pos"]).column("pos").to_pylist()
        assert pos == sorted(pos), f"file {f} not in training order"


def test_export_after_takedown_is_coherent(spark, tmp_path):
    """Re-export after a takedown: removed docs are absent from every
    shard file, and the SURVIVORS' relative order within each shard is
    unchanged (the ordering key is a pure function of doc_id, so
    deletions cannot reorder what remains)."""
    out_full = str(tmp_path / "full")
    out_cut = str(tmp_path / "cut")
    export_training_shards(spark, SF_SMOKE, out_full)
    removed = (
        spark.read.parquet(out_full)
        .select("doc_id")
        .filter(F.col("doc_id") % 5 == 0)
    )
    manifest = export_training_shards(
        spark, SF_SMOKE, out_cut, removed_ids=removed
    )
    assert manifest.count() > 0

    full = (
        spark.read.parquet(out_full)
        .select("doc_id", F.col("shard").cast("int").alias("shard"), "pos")
        .toPandas()
    )
    cut = (
        spark.read.parquet(out_cut)
        .select("doc_id", F.col("shard").cast("int").alias("shard"), "pos")
        .toPandas()
    )
    assert not (cut["doc_id"] % 5 == 0).any()
    for shard, grp in cut.groupby("shard"):
        survivors = grp.sort_values("pos")["doc_id"].tolist()
        original = full[full["shard"] == shard].sort_values("pos")
        expected = [d for d in original["doc_id"].tolist() if d % 5 != 0]
        assert survivors == expected, f"shard {shard} reordered"
        # positions re-rank densely from 1
        assert grp["pos"].sort_values().tolist() == list(
            range(1, len(grp) + 1)
        )


def test_manifest_from_files_detects_mutation(spark, tmp_path):
    """shard_manifest_from_files reads what is ON DISK: deleting one
    shard's files changes the manifest (the publish-time check is not
    a re-statement of the plan)."""
    out = str(tmp_path / "shards")
    export_training_shards(spark, SF_SMOKE, out)
    before = shard_manifest_from_files(spark, out).count()
    import shutil

    victim = sorted(Path(out).glob("shard=*"))[0]
    shutil.rmtree(victim)
    after = shard_manifest_from_files(spark, out).count()
    assert after == before - 1


def test_export_dir_reused_across_invocations(spark):
    """r10 review: q_export_shards writes a full-corpus export per
    call; repeat invocations in one session (bench row, B8 suite,
    parity sweep, driver sim) must overwrite ONE session-scoped dir
    per dataset, not stack corpus-sized tempdir copies."""
    import zebra_spark
    from zebra_spark.queries.text import _EXPORT_DIRS

    zebra_spark.load_all_queries()
    from tests.conftest import SF_SMOKE

    n1 = zebra_spark.QUERIES["q_export_shards"](spark, SF_SMOKE).count()
    dirs_after_first = dict(_EXPORT_DIRS)
    n2 = zebra_spark.QUERIES["q_export_shards"](spark, SF_SMOKE).count()
    assert n1 == n2 > 0
    assert dict(_EXPORT_DIRS) == dirs_after_first  # same dir, rewritten


def test_restore_derived_registry_reclaims_disk(spark, tmp_path):
    """r10 review: restore_derived_registry must DELETE module-owned
    artifacts it pops (the bench's isolated trials call it dozens of
    times — popped keys whose corpus-sized parquet lingered until
    atexit could fill the disk mid-run), while externally registered
    maintained paths survive."""
    import os

    from zebra_spark.queries import dedup as dd
    from zebra_spark.queries.tick import _mirror_sf_dir
    from tests.conftest import SF_SMOKE

    mirror = _mirror_sf_dir(SF_SMOKE)  # private key space for this test
    snap = dd.derived_registry_snapshot()
    dd.tokset_table(spark, mirror)  # module-built artifact
    built = [
        p for k, p in dd.derived_registry_snapshot().items() if k not in snap
    ]
    assert built and all(os.path.exists(p) for p in built)

    # an externally registered maintained path must never be deleted
    ext = str(tmp_path / "ext_minhash")
    spark.createDataFrame(
        [], "doc_a bigint, doc_b bigint, n_common bigint, na bigint, nb bigint"
    ).write.mode("overwrite").parquet(ext)
    dd.register_maintained_table("minhash", mirror, ext)

    dd.restore_derived_registry(snap)
    assert all(not os.path.exists(p) for p in built)  # reclaimed now
    assert os.path.exists(ext)  # external path untouched
    # re-registration after a restore just rebuilds
    assert dd.tokset_table(spark, mirror).count() > 0


def test_epoch_append_equals_one_shot_order(spark, tmp_path):
    """The append-friendly export (r11, VERDICT r10 #2): three
    successive export_epoch_append calls — one per ingest epoch, the
    tick chain's doc_id % 3 split — must produce exactly the one-shot
    epoch-major order q_export_append_order computes over the union,
    with earlier epochs' files untouched by later appends, and a
    replay of a mid epoch (crash re-run) must REPLACE, not duplicate."""
    import os

    from zebra_spark.io import load
    from zebra_spark.queries.text import export_epoch_append

    out = str(tmp_path / "inc")
    docs = load(spark, SF_SMOKE, "documents").select(
        "doc_id", "text", "n_chars"
    )
    for k in range(3):
        export_epoch_append(
            spark, out, docs.filter(F.col("doc_id") % 3 == k), k
        )
        if k == 0:
            epoch0_files = {
                str(p): p.stat().st_mtime
                for p in Path(out).glob("epoch=0/**/*.parquet")
            }
    # later appends never touched epoch 0's files
    assert epoch0_files
    assert {
        str(p): p.stat().st_mtime
        for p in Path(out).glob("epoch=0/**/*.parquet")
    } == epoch0_files

    got = (
        spark.read.parquet(out)
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

    # crash replay of epoch 1: same batch re-appended — idempotent
    export_epoch_append(spark, out, docs.filter(F.col("doc_id") % 3 == 1), 1)
    again = (
        spark.read.parquet(out)
        .select(
            "doc_id",
            F.col("epoch").cast("int").alias("epoch"),
            F.col("shard").cast("int").alias("shard"),
            "pos",
        )
        .toPandas()
    )
    assert _vhash(again) == _vhash(want)
    assert not os.path.exists(f"{out}__epoch1_staging")


def test_tick_chain_then_export_composition(spark, tmp_path):
    """VERDICT r10 #2's composition pin: run the 3-tick chained
    maintenance, take down every non-representative via the chain's
    MAINTAINED cluster labels, and publish the deduped export — the
    file-level manifest must equal the from-corpus manifest over
    exactly the representative set.  This is the curate→dedup→tick→
    export pipeline end to end on persisted artifacts."""
    from zebra_spark.io import load
    from zebra_spark.queries.text import (
        N_SHARDS,
        export_training_shards,
        shard_hash_col,
    )
    from zebra_spark.queries.tick import chain_state

    labels = spark.read.parquet(
        f"{chain_state(spark, SF_SMOKE)}/clusters"
    )
    removed = labels.filter(F.col("doc_id") != F.col("cluster")).select(
        "doc_id"
    )
    out = str(tmp_path / "dedup_export")
    manifest = export_training_shards(
        spark, SF_SMOKE, out, removed_ids=removed
    ).toPandas()

    survivors = (
        load(spark, SF_SMOKE, "documents")
        .join(removed, "doc_id", "left_anti")
        .select(
            "doc_id",
            "n_chars",
            F.size(F.split("text", " ")).alias("n_tokens"),
            (shard_hash_col() % N_SHARDS).cast("int").alias("shard"),
        )
    )
    want = (
        survivors.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .toPandas()
    )
    assert _vhash(manifest) == _vhash(want)
    # the takedown actually cut something, and no removed doc shipped
    exported = spark.read.parquet(out).select("doc_id")
    assert exported.join(removed, "doc_id", "left_semi").count() == 0
    assert removed.count() > 0


def test_export_publish_is_atomic_over_stale_staging(spark, tmp_path):
    """r10: the export writes to a __staging sibling and renames over
    the published dir after job commit.  A prior crash (stale staging
    junk beside a complete previous export) must not corrupt the next
    run: staging is replaced, the published dir is the new complete
    export, and readers of the published path never see a mix."""
    import os

    from zebra_spark.queries.text import (
        export_training_shards,
        shard_manifest_from_files,
    )
    from tests.conftest import SF_SMOKE

    out = str(tmp_path / "export")
    m1 = export_training_shards(spark, SF_SMOKE, out).toPandas()
    assert not os.path.exists(f"{out}__staging")  # staging consumed

    # simulate a crashed half-export: junk staging beside the good one
    os.makedirs(f"{out}__staging/shard=0")
    with open(f"{out}__staging/shard=0/garbage", "w") as f:
        f.write("not parquet")

    m2 = export_training_shards(spark, SF_SMOKE, out).toPandas()
    assert not os.path.exists(f"{out}__staging")
    key = lambda pdf: sorted(  # noqa: E731
        tuple(r) for r in pdf.reindex(sorted(pdf.columns), axis=1)
        .itertuples(index=False)
    )
    assert key(m1) == key(m2)
    # the published dir re-reads clean
    assert (
        key(shard_manifest_from_files(spark, out).toPandas()) == key(m1)
    )


def _read_order(spark, out):
    return (
        spark.read.option("basePath", out)
        .parquet(out)
        .select(
            "doc_id",
            F.col("epoch").cast("int").alias("epoch"),
            F.col("shard").cast("int").alias("shard"),
            "pos",
        )
        .toPandas()
    )


def _build_epoch_export(spark, out):
    from zebra_spark.io import load
    from zebra_spark.queries.text import export_epoch_append

    docs = load(spark, SF_SMOKE, "documents").select(
        "doc_id", "text", "n_chars"
    )
    for k in range(3):
        export_epoch_append(
            spark, out, docs.filter(F.col("doc_id") % 3 == k), k
        )
    return docs


def test_epoch_takedown_stable_positions(spark, tmp_path):
    """r11: export_epoch_takedown rewrites ONLY the epoch dirs holding
    a taken-down doc; survivors keep the exact (shard, pos) they were
    published with (holes, not a dense renumber), and a later append
    continues above max(pos) with no position collisions."""
    from zebra_spark.queries.text import (
        export_epoch_append,
        export_epoch_takedown,
    )

    out = str(tmp_path / "inc")
    docs = _build_epoch_export(spark, out)
    before = _read_order(spark, out)
    untouched = {
        str(p): p.stat().st_mtime
        for e in (0, 2)
        for p in Path(out).glob(f"epoch={e}/**/*.parquet")
    }
    # a takedown confined to epoch 1 (doc_id % 3 == 1) by construction
    ids = docs.filter(
        (F.col("doc_id") % 3 == 1) & (F.col("doc_id") % 7 == 3)
    ).select("doc_id")
    n_removed = ids.count()
    assert n_removed > 0
    assert export_epoch_takedown(spark, out, ids) == [1]

    # epochs 0 and 2 were never rewritten
    assert {
        str(p): p.stat().st_mtime
        for e in (0, 2)
        for p in Path(out).glob(f"epoch={e}/**/*.parquet")
    } == untouched

    after = _read_order(spark, out)
    removed = set(r.doc_id for r in ids.collect())
    want = before[~before.doc_id.isin(removed)]
    assert _vhash(after) == _vhash(want)  # survivors: positions stable

    # append epoch 3 over the holes: no (shard, pos) collision, and
    # every new position lands strictly above the surviving max
    export_epoch_append(
        spark, out,
        docs.filter(F.col("doc_id") % 3 == 1).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            "text", "n_chars",
        ),
        3,
    )
    full = _read_order(spark, out)
    assert not full.duplicated(subset=["shard", "pos"]).any()
    old_max = after.groupby("shard")["pos"].max()
    new_min = full[full.epoch == 3].groupby("shard")["pos"].min()
    for s in new_min.index:
        assert new_min[s] > old_max.get(s, 0)


def test_epoch_takedown_matches_registry_oracle(spark):
    """The driver-gated q_export_append_takedown drives the same path
    through real files; its Spark side must equal the full-corpus
    order minus the fixture slice with ORIGINAL positions."""
    got = zebra_spark.QUERIES["q_export_append_takedown"](
        spark, SF_SMOKE
    ).toPandas()
    order = zebra_spark.QUERIES["q_export_append_order"](
        spark, SF_SMOKE
    ).toPandas()
    want = order[order.doc_id % 7 != 3]
    assert _vhash(got) == _vhash(want)


def test_epoch_compact_preserves_content_and_extends(spark, tmp_path):
    """r11: export_epoch_compact folds epoch dirs <= K into one dir
    with (doc_id, shard, pos) byte-identical and per-file read order
    preserved; appends and takedowns still work on the compacted
    tree."""
    import pyarrow.parquet as pq

    from zebra_spark.queries.text import (
        export_epoch_append,
        export_epoch_compact,
        export_epoch_takedown,
    )

    out = str(tmp_path / "inc")
    docs = _build_epoch_export(spark, out)
    before = _read_order(spark, out)

    assert export_epoch_compact(spark, out, 2) == 3
    assert sorted(
        d.name for d in Path(out).iterdir() if d.is_dir()
    ) == ["epoch=2"]
    after = _read_order(spark, out)
    # content identical; the epoch DIR value collapses to 2 (pos is
    # the order truth)
    assert _vhash(after.drop(columns=["epoch"])) == _vhash(
        before.drop(columns=["epoch"])
    )
    assert set(after.epoch) == {2}
    for f in sorted(Path(out).glob("epoch=2/shard=*/*.parquet")):
        pos = pq.read_table(f, columns=["pos"]).column("pos").to_pylist()
        assert pos == sorted(pos)

    # re-compacting is a no-op; append continues above max(pos)
    assert export_epoch_compact(spark, out, 2) == 0
    export_epoch_append(
        spark, out,
        docs.filter(F.col("doc_id") % 3 == 0).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            "text", "n_chars",
        ),
        3,
    )
    full = _read_order(spark, out)
    assert not full.duplicated(subset=["shard", "pos"]).any()
    assert len(full) == len(before) + (before.doc_id % 3 == 0).sum()

    # takedown on the compacted tree rewrites the (single) folded dir
    ids = docs.filter(F.col("doc_id") % 11 == 5).select("doc_id")
    assert export_epoch_takedown(spark, out, ids) == [2]
    assert ids.count() > 0
    left = _read_order(spark, out)
    assert len(left) == len(full) - ids.count()


def test_epoch_compact_crash_recovery(spark, tmp_path):
    """A crash between the compact marker landing and the staging
    publish must be repaired by the next export entry point: the
    recovery replays the swap tail (remove sources, publish staging,
    drop marker) and the tree reads complete."""
    import zebra_spark.fsutil as fsutil
    from zebra_spark.queries.text import (
        export_epoch_append,
        export_epoch_compact,
    )

    out = str(tmp_path / "inc")
    docs = _build_epoch_export(spark, out)
    before = _read_order(spark, out)

    real_rename = fsutil.rename
    def dying_rename(spark_, src, dst):
        if src.endswith("__compact_staging"):
            raise RuntimeError("simulated crash before publish")
        real_rename(spark_, src, dst)

    fsutil.rename = dying_rename
    try:
        import pytest as _pytest
        with _pytest.raises(RuntimeError, match="simulated crash"):
            export_epoch_compact(spark, out, 2)
    finally:
        fsutil.rename = real_rename

    # crashed state: marker + staging present, source dirs gone
    assert Path(f"{out}/_compact_commit").exists()
    assert Path(f"{out}__compact_staging").exists()

    # any entry point repairs it (appending epoch 3 here)
    export_epoch_append(
        spark, out,
        docs.filter(F.col("doc_id") % 3 == 0).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            "text", "n_chars",
        ),
        3,
    )
    assert not Path(f"{out}/_compact_commit").exists()
    assert not Path(f"{out}__compact_staging").exists()
    full = _read_order(spark, out)
    recovered = full[full.epoch == 2]
    assert _vhash(recovered.drop(columns=["epoch"])) == _vhash(
        before.drop(columns=["epoch"])
    )
    assert len(full) == len(before) + (before.doc_id % 3 == 0).sum()


def test_epoch_compact_clamps_target_and_empty_epochs(spark, tmp_path):
    """r11 review: (a) compacting with a target ABOVE the highest
    present epoch folds into the highest PRESENT one — a phantom
    higher number would sit above later appends' `epoch < K` offsets
    probe and silently re-issue occupied positions; (b) an empty
    epoch publishes NO dir (a part-less dir breaks later schema
    reads), and appends continue cleanly past it."""
    from zebra_spark.queries.text import (
        export_epoch_append,
        export_epoch_compact,
    )

    out = str(tmp_path / "inc")
    docs = _build_epoch_export(spark, out)
    before = _read_order(spark, out)

    assert export_epoch_compact(spark, out, 99) == 3
    assert sorted(
        d.name for d in Path(out).iterdir() if d.is_dir()
    ) == ["epoch=2"]

    # an empty epoch 3: nothing published, no phantom dir
    export_epoch_append(spark, out, docs.limit(0), 3)
    assert not Path(f"{out}/epoch=3").exists()

    # epoch 4 appends over the compacted + skipped epochs with
    # positions continuing above max(pos) — no collisions
    export_epoch_append(
        spark, out,
        docs.filter(F.col("doc_id") % 3 == 1).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            "text", "n_chars",
        ),
        4,
    )
    full = _read_order(spark, out)
    assert not full.duplicated(subset=["shard", "pos"]).any()
    assert len(full) == len(before) + (before.doc_id % 3 == 1).sum()
    old_max = before.groupby("shard")["pos"].max()
    new_min = full[full.epoch == 4].groupby("shard")["pos"].min()
    for s in new_min.index:
        assert new_min[s] > old_max.get(s, 0)


def test_epoch_offsets_manifest_consistency(spark, tmp_path):
    """r11: every published epoch dir's _offsets.json (the
    metadata-only probe source) must equal the actual per-shard
    max(pos) of its files — after appends, after a takedown rewrite,
    and after compaction — and a manifest-less legacy dir must still
    append correctly via the scan fallback."""
    import json
    import os

    from zebra_spark.queries.text import (
        _read_epoch_offsets,
        export_epoch_append,
        export_epoch_compact,
        export_epoch_takedown,
    )

    out = str(tmp_path / "inc")
    docs = _build_epoch_export(spark, out)

    def check_all():
        for d in sorted(Path(out).glob("epoch=*")):
            got = _read_epoch_offsets(spark, str(d))
            assert got is not None, d
            want = {
                int(r["shard"]): int(r["mx"])
                for r in spark.read.parquet(str(d))
                .groupBy(F.col("shard").cast("int").alias("shard"))
                .agg(F.max("pos").alias("mx"))
                .collect()
            }
            assert got == want, d

    check_all()
    export_epoch_takedown(
        spark, out,
        docs.filter(F.col("doc_id") % 7 == 3).select("doc_id"),
    )
    check_all()
    export_epoch_compact(spark, out, 2)
    check_all()

    # legacy dir without a manifest: append falls back to the scan and
    # still lands above every existing position
    os.remove(f"{out}/epoch=2/_offsets.json")
    export_epoch_append(
        spark, out,
        docs.filter(F.col("doc_id") % 3 == 0).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            "text", "n_chars",
        ),
        3,
    )
    full = _read_order(spark, out)
    assert not full.duplicated(subset=["shard", "pos"]).any()
    old_max = full[full.epoch == 2].groupby("shard")["pos"].max()
    new_min = full[full.epoch == 3].groupby("shard")["pos"].min()
    for s in new_min.index:
        assert new_min[s] > old_max.get(s, 0)


def test_pack_sequences_epoch_is_append_stable(spark):
    """r11: packing over the epoch-major order must be per-epoch
    extendable — the sequence assignment of every doc in epochs < K is
    unchanged by epoch K's arrival (its tokens pack strictly after),
    unlike the interleaved q_pack_sequences where one new doc shifts
    every later cum sum in its shard."""
    from zebra_spark.io import load
    from zebra_spark.queries.text import q_pack_sequences_epoch

    from zebra_spark.queries.text import (
        _EXPORT_EPOCHS,
        pack_sequences_epoch_df,
    )

    full = q_pack_sequences_epoch(spark, SF_SMOKE).toPandas()
    # recompute over only the first _EXPORT_EPOCHS-1 epochs through the
    # SAME implementation the query uses (pack_sequences_epoch_df)
    docs = load(spark, SF_SMOKE, "documents")
    prefix = pack_sequences_epoch_df(
        docs.filter(F.col("doc_id") % _EXPORT_EPOCHS < _EXPORT_EPOCHS - 1)
    ).toPandas()
    merged = full[full.doc_id % _EXPORT_EPOCHS < _EXPORT_EPOCHS - 1]
    assert _vhash(merged) == _vhash(prefix)
    assert len(prefix) > 0

def test_read_epoch_export_repairs_crash_window(spark, tmp_path):
    """ADVICE r11: a PURE READER landing in the crash window after the
    _compact_commit marker but before the staging publish must see the
    repaired tree — read_epoch_export runs _recover_epoch_compact
    first (the recover_state_swaps-before-read pattern), so no
    silently-missing rows; and a missing/empty export reads as an
    empty typed frame instead of a schema-inference error."""
    import zebra_spark.fsutil as fsutil
    from zebra_spark.queries.text import (
        export_epoch_compact,
        read_epoch_export,
    )

    out = str(tmp_path / "inc")
    _build_epoch_export(spark, out)
    before = _read_order(spark, out)

    real_rename = fsutil.rename

    def dying_rename(spark_, src, dst):
        if src.endswith("__compact_staging"):
            raise RuntimeError("simulated crash before publish")
        real_rename(spark_, src, dst)

    fsutil.rename = dying_rename
    try:
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="simulated crash"):
            export_epoch_compact(spark, out, 2)
    finally:
        fsutil.rename = real_rename

    assert Path(f"{out}/_compact_commit").exists()
    # the reader itself repairs and reads the COMPLETE folded tree
    got = (
        read_epoch_export(spark, out)
        .select("doc_id", "shard", "pos")
        .toPandas()
    )
    assert not Path(f"{out}/_compact_commit").exists()
    assert _vhash(got) == _vhash(before.drop(columns=["epoch"]))

    # missing dir: empty frame with the export schema, no exception
    empty = read_epoch_export(spark, str(tmp_path / "never_written"))
    assert empty.count() == 0
    assert set(empty.columns) == {
        "doc_id", "text", "n_chars", "shard", "pos", "epoch",
    }


def test_takedown_of_scrubbed_export_noops(spark, tmp_path):
    """ADVICE r11: export_epoch_takedown on a fully-scrubbed tree (a
    prior run removed every epoch dir) or a never-created dir returns
    [] instead of raising — the documented idempotent-retry story."""
    from zebra_spark.queries.text import export_epoch_takedown

    out = str(tmp_path / "inc")
    docs = _build_epoch_export(spark, out)
    all_ids = docs.select("doc_id")

    assert sorted(export_epoch_takedown(spark, out, all_ids)) == [0, 1, 2]
    assert not any(p.name.startswith("epoch=") for p in Path(out).iterdir())
    # the retry: every epoch already gone -> clean no-op
    assert export_epoch_takedown(spark, out, all_ids) == []
    # never-created export dir -> clean no-op too
    assert export_epoch_takedown(
        spark, str(tmp_path / "nowhere"), all_ids
    ) == []


def test_read_epoch_export_merges_mixed_nchars_widths(spark, tmp_path):
    """ADVICE r12: within ONE export tree, epoch dirs written by
    different producers can disagree on the n_chars parquet width
    (tick/stream sinks write F.length(text) = int; fixture-sourced
    exports carry the documents table's bigint).  read_epoch_export
    must read such a tree clean — the EXPLICIT read schema is what
    reconciles the widths (each file's INT32 upcasts into the declared
    BIGINT with no merge step at all); mergeSchema can NOT do it
    (Spark 4 refuses INT vs BIGINT merges with CANNOT_MERGE_SCHEMAS —
    measured, see read_epoch_export's docstring)."""
    from zebra_spark.io import load
    from zebra_spark.queries.text import export_epoch_append, read_epoch_export

    out = str(tmp_path / "mixed")
    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "text")
    # epoch 0: int n_chars (the tick/stream producer shape)
    export_epoch_append(
        spark, out,
        docs.filter(F.col("doc_id") % 2 == 0)
        .withColumn("n_chars", F.length("text")),
        0,
    )
    # epoch 1: bigint n_chars (the fixture-sourced producer shape)
    export_epoch_append(
        spark, out,
        docs.filter(F.col("doc_id") % 2 == 1)
        .withColumn("n_chars", F.length("text").cast("bigint")),
        1,
    )
    got = read_epoch_export(spark, out)
    assert dict(got.dtypes)["n_chars"] == "bigint"
    assert got.count() == docs.count()
    want = docs.withColumn("n_chars", F.length("text").cast("bigint"))
    assert _vhash(got.select("doc_id", "n_chars").toPandas()) == _vhash(
        want.select("doc_id", "n_chars").toPandas()
    )


def test_rebalance_export_uniform_shards_and_preserved_order(spark, tmp_path):
    """r13 (VERDICT r12 #6): rebalance_export rewrites the tree into
    one epoch of target_rows-row shards — every shard except the last
    exact, positions dense within each new shard, and the total order
    (new shard, pos) equal to the published (epoch, shard, pos) order
    it replaced.  A later append continues collision-free above the
    rebalanced max(pos)."""
    from zebra_spark.queries.text import (
        export_epoch_append,
        read_epoch_export,
        rebalance_export,
    )

    out = str(tmp_path / "inc")
    docs = _build_epoch_export(spark, out)
    before = _read_order(spark, out)
    n_docs = len(before)
    target = 97  # deliberately not a divisor of anything

    n_new = rebalance_export(spark, out, target)
    import math
    assert n_new == math.ceil(n_docs / target)

    after = read_epoch_export(spark, out).toPandas()
    assert len(after) == n_docs
    # one epoch dir (the highest that was present), uniform shards
    assert set(after.epoch) == {2}
    sizes = after.groupby("shard").size()
    assert sorted(sizes.index) == list(range(n_new))
    assert (sizes.iloc[:-1] == math.ceil(n_docs / n_new)).all()
    # dense positions within each new shard
    for _, grp in after.groupby("shard"):
        assert sorted(grp.pos) == list(range(1, len(grp) + 1))
    # total order preserved: old (epoch, shard, pos) == new (shard, pos)
    old_order = before.sort_values(
        ["epoch", "shard", "pos"]).doc_id.tolist()
    new_order = after.sort_values(["shard", "pos"]).doc_id.tolist()
    assert old_order == new_order

    # append continues above the rebalanced offsets, no collisions
    export_epoch_append(
        spark, out,
        spark.createDataFrame(
            [(10_000_000 + i, "extra doc", 9) for i in range(50)],
            "doc_id bigint, text string, n_chars bigint",
        ),
        3,
    )
    full = read_epoch_export(spark, out).toPandas()
    assert len(full) == n_docs + 50
    dupes = full.groupby(["shard", "pos"]).size()
    assert (dupes == 1).all(), "position collision after rebalance+append"


def test_rebalance_export_crash_recovery(spark, tmp_path):
    """rebalance_export reuses the compact marker/staging protocol, so
    a crash between the marker landing and the staging publish is
    repaired by the next export entry point with no rebalance-specific
    recovery code."""
    import zebra_spark.fsutil as fsutil
    from zebra_spark.queries.text import read_epoch_export, rebalance_export

    out = str(tmp_path / "inc")
    _build_epoch_export(spark, out)
    before = _read_order(spark, out)

    real_rename = fsutil.rename

    def dying_rename(spark_, src, dst):
        if src.endswith("__compact_staging"):
            raise RuntimeError("simulated crash before publish")
        real_rename(spark_, src, dst)

    fsutil.rename = dying_rename
    try:
        with pytest.raises(RuntimeError, match="simulated crash"):
            rebalance_export(spark, out, 97)
    finally:
        fsutil.rename = real_rename

    assert Path(f"{out}/_compact_commit").exists()
    assert Path(f"{out}__compact_staging").exists()

    # the read entry point repairs and sees the completed rebalance
    got = read_epoch_export(spark, out).toPandas()
    assert not Path(f"{out}/_compact_commit").exists()
    assert len(got) == len(before)
    old_order = before.sort_values(
        ["epoch", "shard", "pos"]).doc_id.tolist()
    new_order = got.sort_values(["shard", "pos"]).doc_id.tolist()
    assert old_order == new_order


def test_rebalance_export_edge_cases(spark, tmp_path):
    from zebra_spark.queries.text import rebalance_export

    with pytest.raises(ValueError, match="positive"):
        rebalance_export(spark, str(tmp_path / "x"), 0)
    # empty/missing tree: 0, no exception
    assert rebalance_export(spark, str(tmp_path / "never"), 100) == 0


def test_shard_balance_and_needs_rebalance_gate(spark, tmp_path):
    """r14 (VERDICT r13 #2): needs_rebalance is the measured trigger
    for rebalance_export — False on a freshly-published (uniform)
    tree, True once a takedown has skewed one shard far from the mean,
    True when a shard was scrubbed to a hole, False again after the
    rebalance it recommends."""
    from zebra_spark.queries.text import (
        export_epoch_takedown,
        needs_rebalance,
        rebalance_export,
        shard_balance_df,
    )

    out = str(tmp_path / "inc")
    docs = _build_epoch_export(spark, out)

    bal = shard_balance_df(spark, out).toPandas()
    assert len(bal) == 16
    assert bal["n_rows"].sum() == docs.count()
    # fresh hash-sharded tree: every imbalance ratio hugs 1
    assert bal["row_imbalance"].max() < 1.1
    assert not needs_rebalance(spark, out)

    # skew: take down ~90% of ONE shard's docs (keep a residue so the
    # shard stays present — the hole branch is tested separately)
    exp = __import__("zebra_spark.queries.text", fromlist=["read_epoch_export"])
    s0 = (
        exp.read_epoch_export(spark, out)
        .filter(F.col("shard") == 0)
        .select("doc_id")
    )
    # materialize BEFORE the takedown: the lazy frame reads the very
    # files the takedown replaces
    victims = s0.filter(F.col("doc_id") % 10 != 0).localCheckpoint()
    export_epoch_takedown(spark, out, victims)
    assert needs_rebalance(spark, out)
    # the full rewrite it recommends restores balance
    rebalance_export(spark, out, target_rows=30)
    assert not needs_rebalance(spark, out)

    # hole: scrub one low shard entirely
    exp2 = exp.read_epoch_export(spark, out)
    export_epoch_takedown(
        spark, out,
        exp2.filter(F.col("shard") == 1).select("doc_id").localCheckpoint(),
    )
    assert needs_rebalance(spark, out)

    # empty / missing trees are trivially balanced; bad threshold loud
    import pytest as _pytest

    assert not needs_rebalance(spark, str(tmp_path / "nowhere"))
    with _pytest.raises(ValueError, match="ratio"):
        needs_rebalance(spark, out, threshold=1.0)


def test_staged_epoch_empty_write_yields_zero(spark, tmp_path):
    """r17 optimization pass: _write_staged_epoch fuses the emptiness
    probe and the offsets manifest into the staged write's own job via
    an Observation.  Spark 4.1 collapses an ALL-EMPTY observed write to
    an empty scan and Observation.get trips a toPyRow assertion — the
    helper must survive that (fs-listing fallback), report 0 rows, and
    write no manifest; a non-empty frame must return its row count and
    a manifest byte-equal in content to the read-back computation."""
    import json

    from pyspark.sql import functions as F

    from zebra_spark.queries.text import (
        _OFFSETS_FILE,
        _read_epoch_offsets,
        _write_staged_epoch,
    )

    empty = spark.createDataFrame(
        [], "doc_id bigint, text string, n_chars bigint, shard int,"
        " pos bigint"
    )
    st0 = str(tmp_path / "st0")
    assert _write_staged_epoch(spark, empty, st0, range(4)) == 0
    from pathlib import Path

    assert not any(
        p.name.startswith("shard=") for p in Path(st0).iterdir()
    )
    assert not (Path(st0) / _OFFSETS_FILE).exists()

    rows = [(i, f"t{i}", 2, i % 3, 1 + i // 3) for i in range(9)]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, n_chars bigint, shard int,"
        " pos bigint"
    )
    st1 = str(tmp_path / "st1")
    assert _write_staged_epoch(spark, df, st1, range(4)) == 9
    got = _read_epoch_offsets(spark, st1)
    want = {
        r["shard"]: r["off"]
        for r in spark.read.parquet(st1)
        .groupBy(F.col("shard").cast("int").alias("shard"))
        .agg(F.max("pos").alias("off"))
        .collect()
    }
    assert got == want
