"""Structured Streaming tests (SURVEY §5.2.5): stream == batch for
tumbling windows, sliding/session windows run, streaming dedup drops
duplicate event_ids, late data beyond watermark handling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def chunked_events(spark, tmp_path_factory):
    """Split sf0.001 events into 4 parquet chunk files (micro-batches)."""
    from zebra_spark.io import load

    out = str(tmp_path_factory.mktemp("events_chunks"))
    ev = load(spark, SF_SMOKE, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    ev.withColumn("chunk", F.pmod("event_id", F.lit(4))).repartition(
        4, "chunk"
    ).drop("chunk").write.mode("overwrite").parquet(out)
    return out


def _batch_events(spark):
    from zebra_spark.io import load

    return load(spark, SF_SMOKE, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )


def _canon(pdf):
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    return pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)


def test_stream_tumbling_equals_batch(spark, chunked_events):
    from zebra_spark.streaming import (
        read_events_stream,
        run_to_completion,
        tumbling_counts,
    )

    stream = read_events_stream(spark, chunked_events)
    got = _canon(
        run_to_completion(tumbling_counts(stream), "t_tumbling").toPandas()
    )
    want = _canon(tumbling_counts(_batch_events(spark)).toPandas())
    assert got.equals(want), f"stream:\n{got.head()}\nbatch:\n{want.head()}"


def test_stream_anomaly_equals_batch(spark, chunked_events):
    """Streaming minute counts scored against a batch-built baseline ==
    the batch q_events_anomaly output: the full anomaly monitor
    (stream rollup -> broadcast stream-static stats join) is
    bit-identical to its hash-checked batch twin."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_SMOKE
    from zebra_spark.queries.temporal import q_events_anomaly
    from zebra_spark.streaming import (
        anomaly_scores,
        minute_counts,
        read_events_stream,
        run_to_completion,
    )

    stats = (
        minute_counts(_batch_events(spark))
        .groupBy("event_type")
        .agg(
            F.avg("n").alias("mu"),
            F.greatest(F.stddev_pop("n"), F.lit(1e-12)).alias("sd"),
        )
    )
    stream = read_events_stream(spark, chunked_events)
    got = _canon(
        anomaly_scores(
            run_to_completion(minute_counts(stream), "t_anomaly"), stats
        ).toPandas()
    )
    want = _canon(q_events_anomaly(spark, SF_SMOKE).toPandas())
    assert got.equals(want), f"stream:\n{got.head()}\nbatch:\n{want.head()}"


def test_stream_sliding_runs(spark, chunked_events):
    from zebra_spark.streaming import (
        read_events_stream,
        run_to_completion,
        sliding_counts,
    )

    stream = read_events_stream(spark, chunked_events)
    got = run_to_completion(sliding_counts(stream), "t_sliding").toPandas()
    want = sliding_counts(_batch_events(spark)).toPandas()
    assert len(got) == len(want) > 0


def test_stream_session_runs(spark, chunked_events):
    from zebra_spark.streaming import (
        read_events_stream,
        run_to_completion,
        session_counts,
    )

    stream = read_events_stream(spark, chunked_events)
    got = run_to_completion(session_counts(stream), "t_session").toPandas()
    assert len(got) > 0
    assert (got["n_events"] >= 1).all()


def test_stream_dedup(spark, tmp_path, chunked_events):
    from zebra_spark.streaming import (
        read_events_stream,
        run_to_completion,
        stream_dedup,
    )

    # duplicate every event across two files -> dedup must halve it
    dup_dir = str(tmp_path / "dup")
    ev = _batch_events(spark)
    ev.coalesce(1).write.mode("overwrite").parquet(dup_dir)
    ev.coalesce(1).write.mode("append").parquet(dup_dir)
    n = ev.count()
    stream = read_events_stream(spark, dup_dir)
    got = run_to_completion(
        stream_dedup(stream), "t_dedup", output_mode="append"
    )
    assert got.count() == n


def test_stateful_user_counts(spark, chunked_events):
    """applyInPandasWithState: final running counts equal batch counts."""
    from zebra_spark.streaming import read_events_stream, stateful_user_counts

    stream = read_events_stream(spark, chunked_events)
    q = (
        stateful_user_counts(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("t_stateful")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # last update per user is the running total
    got = (
        spark.sql(
            "SELECT user_id, max(n_events) AS n FROM t_stateful GROUP BY user_id"
        )
        .toPandas()
        .set_index("user_id")["n"]
    )
    want = (
        _batch_events(spark)
        .groupBy("user_id")
        .count()
        .toPandas()
        .set_index("user_id")["count"]
    )
    assert got.sort_index().equals(want.sort_index().astype(got.dtype))


def test_stream_ingest_texts(spark, tmp_path):
    """files arriving -> streaming embed+insert -> queryable database."""
    from zebra_spark.database import ZebraDatabase
    from zebra_spark.streaming import stream_ingest_texts

    src = tmp_path / "incoming"
    src.mkdir()
    for i, body in enumerate(
        ["red fox jumps", "blue whale sings", "green turtle swims"]
    ):
        (src / f"d{i}.txt").write_text(body)
    db = ZebraDatabase.create(spark, str(tmp_path / "sdb"), dim=32)
    q = stream_ingest_texts(spark, str(src), db, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert db.count() == 3
    res = db.query_texts(["red fox"], k=1, exact=True).toPandas()
    assert res.iloc[0]["doc"].strip() == "red fox jumps"


def test_stream_ingest_maintains_lsh_index(spark, tmp_path):
    """Composition of streaming ingest x incremental index maintenance
    (VERDICT r4 directive 7): stream_ingest_texts appends through
    insert_records, whose sink-side LSHIndex.add keeps the live index
    fresh without a rebuild — post-stream ANN search must match both a
    batch-built index over the same corpus and the exact oracle."""
    import numpy as np

    from zebra_spark.database import ZebraDatabase
    from zebra_spark.streaming import stream_ingest_texts

    initial = ["red fox jumps", "blue whale sings", "green turtle swims"]
    streamed = ["orange cat naps", "purple squid inks", "yellow finch calls"]

    sdb = ZebraDatabase.create(spark, str(tmp_path / "sdb"), dim=32)
    sdb.insert_texts(initial)
    sdb.index()  # build NOW: later inserts must maintain it incrementally
    appends_before = sdb._index.appends

    src = tmp_path / "incoming"
    src.mkdir()
    for i, body in enumerate(streamed):
        (src / f"d{i}.txt").write_text(body)
    q = stream_ingest_texts(spark, str(src), sdb, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert sdb.count() == len(initial) + len(streamed)
    # each micro-batch went through LSHIndex.add, never a rebuild
    assert sdb._index.appends > appends_before

    bdb = ZebraDatabase.create(spark, str(tmp_path / "bdb"), dim=32)
    bdb.insert_texts(initial)
    for t in streamed:  # one batch per text == one stream epoch per file
        bdb.insert_texts([t])

    queries = ["red fox", "purple squid", "yellow finch"]
    got = sdb.query_texts(queries, k=3).toPandas()
    want = bdb.query_texts(queries, k=3).toPandas()
    exact = sdb.query_texts(queries, k=3, exact=True).toPandas()
    for frame in (got, want, exact):
        frame.sort_values(["query_id", "rank"], inplace=True, ignore_index=True)
    assert list(got["doc"]) == list(want["doc"]) == list(exact["doc"])
    assert np.allclose(got["dist"], exact["dist"])


@pytest.mark.parametrize(
    "kind,opts",
    [
        ("lsh", {}),
        ("ivf", {"k_coarse": 4}),
        ("pq", {"m": 4, "k": 8}),
        ("ivfpq", {"k_coarse": 4, "m": 4, "k": 8, "nprobe": 4, "refine": 50}),
    ],
)
def test_stream_ingest_family_matrix(spark, tmp_path, kind, opts):
    """VERDICT r8 #7: streaming ingest x live-index maintenance for
    EVERY index family the facade fronts — the stream's micro-batches
    go through the family's add() on the live handle, the maintained
    index persists, and a RESTART (open() restoring the family from
    index_kind metadata) serves bit-identical searches plus the exact
    rank-1 self-hit."""
    from zebra_spark.database import ZebraDatabase
    from zebra_spark.streaming import stream_ingest_texts

    initial = [f"document number {i} about topic {i % 5}" for i in range(30)]
    streamed = [f"streamed doc {i} about topic {i % 5}" for i in range(6)]
    path = str(tmp_path / "sdb")
    db = ZebraDatabase.create(
        spark, path, dim=32, index_kind=kind, index_options=opts
    )
    db.insert_texts(initial)
    db.index()  # build NOW: the stream must maintain it incrementally

    src = tmp_path / "incoming"
    src.mkdir()
    for i, body in enumerate(streamed):
        (src / f"d{i}.txt").write_text(body)
    q = stream_ingest_texts(spark, str(src), db, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert db.count() == len(initial) + len(streamed)
    db.save_index()

    probe = [streamed[1], initial[3]]
    before = (
        db.query_texts(probe, k=3)
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    db2 = ZebraDatabase.open(spark, path)
    assert type(db2.index()).__name__.lower().startswith(
        {"lsh": "lsh", "ivf": "ivf", "pq": "pq", "ivfpq": "ivfpq"}[kind]
    )
    after = (
        db2.query_texts(probe, k=3)
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    assert before.equals(after), f"{kind}: search drifted across restart"
    # the streamed doc's rank-1 hit is itself, agreeing with exact
    exact = (
        db2.query_texts(probe, k=1, exact=True)
        .toPandas().sort_values("query_id").reset_index(drop=True)
    )
    got1 = (
        after[after["rank"] == 1]
        .sort_values("query_id").reset_index(drop=True)
    )
    assert list(got1.vec_id) == list(exact.vec_id), f"{kind}: rank-1 drifted"


def test_insert_rejects_wrong_dimension(spark, tmp_path):
    from zebra_spark.database import ZebraDatabase

    db = ZebraDatabase.create(spark, str(tmp_path / "dimdb"), dim=8)
    bad = spark.createDataFrame(
        [("doc", [1.0, 2.0, 3.0])], "doc string, embedding array<double>"
    )
    with pytest.raises(ValueError, match="dimension"):
        db.insert_records(bad)


def test_late_data_dropped_after_watermark(spark, tmp_path):
    """SURVEY §5.2.5: a row arriving beyond the watermark must be
    dropped from an append-mode windowed aggregation."""
    import datetime as dt

    from zebra_spark.streaming import read_events_stream, tumbling_counts

    d = str(tmp_path / "late")
    base = dt.datetime(2024, 6, 1, 10, 0, 0)

    def write_chunk(name, rows):
        spark.createDataFrame(
            rows, "event_id bigint, ts timestamp, user_id bigint,"
            " event_type string, value double, props string"
        ).coalesce(1).write.mode("append").parquet(d)

    # chunk 1: two events in the 10:00 window
    write_chunk("c1", [(1, base, 1, "click", 1.0, "{}"),
                       (2, base + dt.timedelta(minutes=5), 1, "click", 1.0, "{}")])
    stream = read_events_stream(spark, d)
    agg = tumbling_counts(stream, watermark="10 minutes")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_late")
        .start()
    )
    try:
        q.processAllAvailable()
        # chunk 2: far-future event advances the watermark past 10:00+1h
        write_chunk("c2", [(3, base + dt.timedelta(hours=3), 1, "view", 1.0, "{}")])
        q.processAllAvailable()
        # chunk 3: LATE event back in the (closed) 10:00 window
        write_chunk("c3", [(4, base + dt.timedelta(minutes=7), 1, "click", 9.0, "{}")])
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.sql(
        "SELECT * FROM t_late WHERE hour = '2024-06-01 10:00:00'"
    ).toPandas()
    # the 10:00 window was finalized with 2 events; the late 3rd is dropped
    assert len(out) == 1
    assert int(out.iloc[0]["n"]) == 2


def test_session_window_matches_batch_sessionization(spark, chunked_events):
    """The native session_window (streaming) and the lag+cumsum batch
    formulation (q_window_session) must find the same sessions: same
    count per user and same event-count multiset."""
    import zebra_spark
    from zebra_spark.streaming import (
        read_events_stream,
        run_to_completion,
        session_counts,
    )

    zebra_spark.load_all_queries()
    stream = read_events_stream(spark, chunked_events)
    # chunk files are split by event_id, not time, so micro-batches arrive
    # wildly out of event-time order — the watermark must exceed the full
    # disorder (one month of data) or legitimate events get dropped as late
    stream_sessions = run_to_completion(
        session_counts(stream, watermark="40 days"), "t_sess_cmp"
    ).toPandas()
    batch_sessions = zebra_spark.QUERIES["q_window_session"](
        spark, SF_SMOKE
    ).toPandas()

    a = (
        stream_sessions.groupby("user_id")["n_events"]
        .apply(lambda s: sorted(s))
        .to_dict()
    )
    b = (
        batch_sessions.groupby("user_id")["n_events"]
        .apply(lambda s: sorted(s))
        .to_dict()
    )
    assert a == b


def test_stream_static_join_enriches(spark, chunked_events):
    """Stream-static join: every micro-batch row picks up its dimension
    attributes; stream output == batch output."""
    from zebra_spark.streaming import (
        enrich_with_users,
        read_events_stream,
        run_to_completion,
    )

    users = spark.createDataFrame(
        [(u, "vip" if u % 3 == 0 else "free") for u in range(200)],
        "user_id bigint, segment string",
    )
    stream = read_events_stream(spark, chunked_events)
    got = _canon(
        run_to_completion(
            enrich_with_users(stream, users), "t_enrich", output_mode="append"
        ).toPandas()
    )
    want = _canon(enrich_with_users(_batch_events(spark), users).toPandas())
    assert got.equals(want)
    assert set(got["segment"]) <= {"vip", "free", "unknown"}


def test_stream_stream_join_matches_batch(spark, chunked_events):
    """Stream-stream interval join (purchase <- prior click within the
    horizon): the watermark+interval bounds make state finite, and the
    fully-processed stream equals the batch twin."""
    from zebra_spark.streaming import (
        purchases_with_prior_click,
        read_events_stream,
        run_to_completion,
    )

    # chunks are split by event_id, so event TIME arrives wildly out of
    # order — the watermark must cover the fixture's full disorder for
    # stream==batch equality (the join-horizon interval, not the
    # watermark, is what bounds the state size)
    wm = dict(click_watermark="90 days", purchase_watermark="90 days")
    stream = read_events_stream(spark, chunked_events)
    got = _canon(
        run_to_completion(
            purchases_with_prior_click(stream, **wm),
            "t_ssjoin",
            output_mode="append",
        ).toPandas()
    )
    want = _canon(
        purchases_with_prior_click(_batch_events(spark), **wm).toPandas()
    )
    assert len(got) > 0  # the fixture does contain attributable purchases
    assert got.equals(want)


def test_stream_neardup_screen_matches_batch(spark, tmp_path):
    """Streaming incremental-dedup screen: (a) stream == batch on the
    screen itself, (b) the distinct flagged doc set equals the batch
    q_dedup_incremental is_dup=1 set (the screen emits ALL matches >=
    threshold; the batch query keeps the argmax — same doc coverage)."""
    import zebra_spark
    from zebra_spark.io import load
    from zebra_spark.streaming import (
        build_screen_index,
        run_to_completion,
        screen_neardups,
    )

    zebra_spark.load_all_queries()

    # the "new batch": doc_id % 10 == 0, written as 3 micro-batch files
    src = str(tmp_path / "doc_chunks")
    batch_docs = (
        load(spark, SF_SMOKE, "documents")
        .filter(F.col("doc_id") % 10 == 0)
        .select("doc_id", "text")
    )
    batch_docs.withColumn("chunk", F.pmod("doc_id", F.lit(3))).repartition(
        3, "chunk"
    ).drop("chunk").write.mode("overwrite").parquet(src)

    index = build_screen_index(spark, SF_SMOKE)

    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    got = run_to_completion(
        screen_neardups(stream, index), "t_neardup_screen", output_mode="append"
    ).toPandas()
    want = screen_neardups(
        spark.read.parquet(src), index
    ).toPandas()
    assert _canon(got).equals(_canon(want))

    flagged = set(got["doc_id"])
    inc = zebra_spark.QUERIES["q_dedup_incremental"](spark, SF_SMOKE).toPandas()
    batch_dups = set(inc[inc["is_dup"] == 1]["doc_id"])
    assert flagged == batch_dups


def test_maintained_pair_table_equals_batch(spark, tmp_path):
    """Ingesting the corpus in 3 arbitrary batches through
    maintain_pair_tables yields a pairs/ table BIT-IDENTICAL to the
    batch pair_table build — the stream==batch contract for the shared
    near-dup artifact."""
    import hashlib

    from pyspark.sql import functions as F

    from zebra_spark.io import load
    from zebra_spark.queries import dedup as dd
    from zebra_spark.streaming import maintain_pair_tables
    from tests.conftest import SF_SMOKE

    def vhash(pdf):
        pdf = pdf.reindex(sorted(pdf.columns), axis=1)
        rows = sorted(
            tuple(str(v) for v in r) for r in pdf.itertuples(index=False)
        )
        return hashlib.md5(str(rows).encode()).hexdigest()

    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "text")
    state = str(tmp_path / "state")
    for part in range(3):
        batch = docs.filter(F.col("doc_id") % 3 == part)
        maintain_pair_tables(spark, state, batch)
    got = spark.read.parquet(f"{state}/pairs").toPandas()
    want = dd.pair_table(spark, SF_SMOKE).toPandas()
    from zebra_spark.caching import release_caches

    release_caches()
    assert len(got) == len(want) > 0
    assert vhash(got) == vhash(want)


def test_stream_maintain_pair_tables_end_to_end(spark, tmp_path):
    """The foreachBatch wiring: documents arriving as parquet files
    drive the same maintenance; the resulting pairs match the batch
    build over the same docs.  r12: the wrapper also threads the
    export + compaction-cadence knobs — the export must hold exactly
    the streamed corpus and the cadence must have bounded the epoch
    dir count below the uncompacted epoch total."""
    from pathlib import Path

    from pyspark.sql import functions as F

    from zebra_spark.io import load
    from zebra_spark.queries import dedup as dd
    from zebra_spark.queries.text import read_epoch_export
    from zebra_spark.streaming import stream_maintain_pair_tables
    from tests.conftest import SF_SMOKE

    src = tmp_path / "incoming"
    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "text")
    docs.repartition(8).write.parquet(str(src))
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 2)
        .parquet(str(src))
    )
    state = str(tmp_path / "state")
    export = str(tmp_path / "export")
    q = stream_maintain_pair_tables(
        spark, stream, state, str(tmp_path / "ckpt"),
        export_dir=export, compact_export_every=2,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = (
        spark.read.parquet(f"{state}/pairs")
        .groupBy().agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_common").alias("s"),
        ).collect()[0]
    )
    want = (
        dd.pair_table(spark, SF_SMOKE)
        .groupBy().agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_common").alias("s"),
        ).collect()[0]
    )
    # export: exactly the streamed corpus, no dropped/duplicated docs
    exp = read_epoch_export(spark, export)
    assert exp.count() == docs.count()
    assert exp.select("doc_id").distinct().count() == docs.count()
    # 8 files @ 2/trigger = 4 epochs; K=2 cadence folds at least once,
    # so strictly fewer epoch dirs than epochs were published
    n_dirs = sum(
        1 for d in Path(export).iterdir()
        if d.is_dir() and d.name.startswith("epoch=")
    )
    assert 1 <= n_dirs < 4
    from zebra_spark.caching import release_caches

    release_caches()
    assert (got.n, got.s) == (want.n, want.s) and got.n > 0


def test_epoch_mode_equals_batch_and_replay_idempotent(spark, tmp_path):
    """Exactly-once maintenance (r7): (a) ingesting the corpus in 3
    epoch-keyed batches yields pairs identical to the batch pair_table;
    (b) REPLAYING an epoch (the foreachBatch crash-recovery case)
    changes nothing — the replay recomputes the same delta from the
    same `epoch < N` state and overwrites its own directory."""
    import hashlib

    from pyspark.sql import functions as F

    from zebra_spark.io import load
    from zebra_spark.queries import dedup as dd
    from zebra_spark.streaming import maintain_pair_tables, read_pair_state
    from tests.conftest import SF_SMOKE

    def vhash(pdf):
        pdf = pdf.reindex(sorted(pdf.columns), axis=1)
        rows = sorted(
            tuple(str(v) for v in r) for r in pdf.itertuples(index=False)
        )
        return hashlib.md5(str(rows).encode()).hexdigest()

    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "text")
    state = str(tmp_path / "state")
    for part in range(3):
        batch = docs.filter(F.col("doc_id") % 3 == part)
        maintain_pair_tables(spark, state, batch, epoch_id=part)
    _, _, pairs = read_pair_state(spark, state)
    got = pairs.toPandas()
    want = dd.pair_table(spark, SF_SMOKE).toPandas()
    from zebra_spark.caching import release_caches

    release_caches()
    assert len(got) == len(want) > 0
    assert vhash(got) == vhash(want)

    # replay epoch 1 (as a restarted stream would) — bit-identical state
    maintain_pair_tables(
        spark, state, docs.filter(F.col("doc_id") % 3 == 1), epoch_id=1
    )
    _, _, pairs2 = read_pair_state(spark, state)
    assert vhash(pairs2.toPandas()) == vhash(want)


def test_compact_pair_state_idempotent(spark, tmp_path):
    """Compaction folds the per-epoch dirs into one epoch=-1 snapshot:
    rows unchanged, file count reduced, compacting twice == once, and a
    post-compaction epoch still maintains correctly on top."""
    import hashlib
    import os

    from pyspark.sql import functions as F

    from zebra_spark.io import load
    from zebra_spark.queries import dedup as dd
    from zebra_spark.streaming import (
        compact_pair_state,
        maintain_pair_tables,
        read_pair_state,
    )
    from tests.conftest import SF_SMOKE

    def vhash(pdf):
        pdf = pdf.reindex(sorted(pdf.columns), axis=1)
        rows = sorted(
            tuple(str(v) for v in r) for r in pdf.itertuples(index=False)
        )
        return hashlib.md5(str(rows).encode()).hexdigest()

    def n_parquet_files(p):
        return sum(
            1 for root, _, files in os.walk(p)
            for f in files if f.endswith(".parquet")
        )

    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "text")
    state = str(tmp_path / "state")
    # epochs 0..3 over 4 splits of the first 3 thirds... use 4 batches
    for part in range(4):
        batch = docs.filter(F.col("doc_id") % 4 == part)
        maintain_pair_tables(spark, state, batch, epoch_id=part)
    before = read_pair_state(spark, state)[2].toPandas()
    files_before = n_parquet_files(f"{state}/pairs")

    compact_pair_state(spark, state, n_files=2)
    after = read_pair_state(spark, state)[2].toPandas()
    assert vhash(after) == vhash(before)
    assert n_parquet_files(f"{state}/pairs") < files_before
    # epoch=-1, not 0: a fresh-checkpoint stream's first epoch (0) must
    # never be able to overwrite the folded history
    assert os.path.isdir(f"{state}/pairs/epoch=-1")

    compact_pair_state(spark, state, n_files=2)  # idempotent
    assert vhash(read_pair_state(spark, state)[2].toPandas()) == vhash(before)

    # the stream resumes: a later epoch on top of the snapshot still
    # sees the full state (epoch ids only grow past 0)
    extra = spark.createDataFrame(
        [(10_000_000, "a brand new document entirely")],
        "doc_id bigint, text string",
    )
    maintain_pair_tables(spark, state, extra, epoch_id=5)
    sigs, _, pairs3 = read_pair_state(spark, state)
    from zebra_spark.caching import release_caches

    release_caches()
    assert sigs.filter(F.col("doc_id") == 10_000_000).count() > 0
    assert len(pairs3.toPandas()) >= len(before)


def test_ingest_replay_after_meta_crash(spark, tmp_path):
    """The previously documented residual window — crash AFTER the
    batch-manifest rename but BEFORE the metadata write, then foreachBatch
    replays the epoch — must no longer duplicate rows: the epoch rides
    the manifest (atomic with the batch commit), and a restarted sink
    reads that floor from disk."""
    from zebra_spark.database import ZebraDatabase
    from zebra_spark.streaming import make_ingest_sink

    db = ZebraDatabase.create(spark, str(tmp_path / "db"), dim=32)
    sink = make_ingest_sink(db)
    batch = spark.createDataFrame([("alpha beta",), ("gamma delta",)], "doc string")
    sink(batch, 0)
    n_after_commit = db.count()
    assert n_after_commit == 2

    # simulate the crash: on-disk metadata regresses to the pre-epoch
    # state (as if _write_meta never ran), process restarts
    db.meta["last_stream_epoch"] = -1
    db._write_meta()
    db2 = ZebraDatabase.open(spark, str(tmp_path / "db"))
    assert db2.meta.get("last_stream_epoch", -1) == -1  # stale, as after a crash
    assert db2.last_manifest_epoch() == 0  # but the manifest proves epoch 0

    sink2 = make_ingest_sink(db2)
    sink2(batch, 0)  # the replay
    assert db2.count() == n_after_commit  # no duplicate rows

    # and a genuinely new epoch still applies
    sink2(spark.createDataFrame([("epsilon zeta",)], "doc string"), 1)
    assert db2.count() == n_after_commit + 1


def test_recover_state_swaps_crash_window(spark, tmp_path):
    """ADVICE r7 (medium): a crash inside compact_state's swap —
    between rename(p, __old) and rename(__compact, p) — leaves the live
    dir absent.  Every maintain/read entry must roll the swap forward
    (or back) instead of silently treating the state as empty."""
    import hashlib
    import os
    import shutil

    from pyspark.sql import functions as F

    from zebra_spark.io import load
    from zebra_spark.streaming import (
        maintain_pair_tables,
        read_pair_state,
    )
    from tests.conftest import SF_SMOKE

    def vhash(pdf):
        pdf = pdf.reindex(sorted(pdf.columns), axis=1)
        rows = sorted(
            tuple(str(v) for v in r) for r in pdf.itertuples(index=False)
        )
        return hashlib.md5(str(rows).encode()).hexdigest()

    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "text")
    state = str(tmp_path / "state")
    for part in range(2):
        maintain_pair_tables(
            spark, state, docs.filter(F.col("doc_id") % 2 == part),
            epoch_id=part,
        )
    want = vhash(read_pair_state(spark, state)[2].toPandas())

    # crash mid-swap: live dir renamed away, snapshot sits in __compact
    shutil.copytree(f"{state}/pairs", f"{state}/pairs__compact")
    os.rename(f"{state}/pairs", f"{state}/pairs__old")
    got = vhash(read_pair_state(spark, state)[2].toPandas())  # recovers
    assert got == want
    assert os.path.isdir(f"{state}/pairs")
    assert not os.path.exists(f"{state}/pairs__compact")
    assert not os.path.exists(f"{state}/pairs__old")

    # crash after rename(p, old) with __compact already promoted (or a
    # pre-compact crash): only __old remains — roll back
    os.rename(f"{state}/sigs", f"{state}/sigs__old")
    sigs = read_pair_state(spark, state)[0]
    assert sigs.count() > 0
    assert os.path.isdir(f"{state}/sigs")

    # a maintain call on a recovered dir still sees the state: the next
    # epoch's delta is computed against the FULL prior state, and the
    # post-recovery table equals the uncrashed twin
    os.rename(f"{state}/pairs", f"{state}/pairs__old")  # crash again
    extra = spark.createDataFrame(
        [(10_000_000, "a brand new document entirely")],
        "doc_id bigint, text string",
    )
    maintain_pair_tables(spark, state, extra, epoch_id=2)
    pairs = read_pair_state(spark, state)[2].toPandas()
    from zebra_spark.caching import release_caches

    release_caches()
    assert vhash(pairs[pairs.doc_b < 10_000_000]) == want


def test_mixed_state_layout_rejected(spark, tmp_path):
    """ADVICE r7 (low): backfill appends (flat part- files) and epoch
    mode (epoch=N subdirs) must not mix in one state_dir — the write
    that would corrupt the layout fails fast with a clear error."""
    import pytest
    from pyspark.sql import functions as F

    from zebra_spark.io import load
    from zebra_spark.streaming import compact_pair_state, maintain_pair_tables
    from tests.conftest import SF_SMOKE

    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "text")
    a, b = docs.filter(F.col("doc_id") % 2 == 0), docs.filter(
        F.col("doc_id") % 2 == 1
    )

    # backfill first, then an epoch write -> rejected
    flat = str(tmp_path / "flat")
    maintain_pair_tables(spark, flat, a, epoch_id=None)
    with pytest.raises(ValueError, match="backfill append"):
        maintain_pair_tables(spark, flat, b, epoch_id=7)
    # ... but compaction folds flat -> epoch layout, after which epoch
    # mode is legal (the documented migration path)
    compact_pair_state(spark, flat, n_files=1)
    maintain_pair_tables(spark, flat, b, epoch_id=7)

    # epoch mode first, then a backfill append -> rejected
    ep = str(tmp_path / "ep")
    maintain_pair_tables(spark, ep, a, epoch_id=0)
    with pytest.raises(ValueError, match="epoch mode"):
        maintain_pair_tables(spark, ep, b, epoch_id=None)


def test_ingest_sink_failure_unwinds_epoch_stamp(spark, tmp_path):
    """ADVICE r7 (low): if insert_documents RAISES (job failure, not a
    process crash), the in-memory last_stream_epoch must roll back —
    otherwise a retried/restarted stream reusing the same db object
    skips the replayed epoch and its rows are lost."""
    import pytest

    from zebra_spark.database import ZebraDatabase
    from zebra_spark.streaming import make_ingest_sink

    db = ZebraDatabase.create(spark, str(tmp_path / "db"), dim=32)
    sink = make_ingest_sink(db)

    bad = spark.createDataFrame([("alpha beta",)], "wrong_col string")
    with pytest.raises(Exception):
        sink(bad, 0)  # text_col="doc" missing -> the insert raises
    assert db.meta.get("last_stream_epoch", -1) == -1  # unwound

    good = spark.createDataFrame([("alpha beta",)], "doc string")
    sink(good, 0)  # the stream's retry of the SAME epoch must apply
    assert db.count() == 1
    assert db.meta["last_stream_epoch"] == 0


def _cosine_vhash(pdf):
    import hashlib

    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    rows = sorted(
        tuple(f"{v:.10f}" if isinstance(v, float) else str(v) for v in r)
        for r in pdf.itertuples(index=False)
    )
    return hashlib.md5(str(rows).encode()).hexdigest()


def test_maintain_cosine_tables_stream_equals_batch(spark, tmp_path):
    """VERDICT r7 #2: ingesting the corpus in any epoch split through
    maintain_cosine_tables yields a pairs/ table bit-identical to the
    batch cosine pair table built with the same frozen seeds; a
    replayed epoch recomputes the same delta (exactly-once), and
    compaction folds the epoch dirs without changing rows."""
    import os

    import pytest
    from pyspark.sql import functions as F

    from zebra_spark.io import embeddings_d
    from zebra_spark.queries import dedup as dd
    from zebra_spark.streaming import (
        compact_cosine_state,
        init_cosine_state,
        maintain_cosine_tables,
        read_cosine_state,
    )
    from tests.conftest import SF_ORACLE

    e = embeddings_d(spark, SF_ORACLE).select("vec_id", "emb")
    state = str(tmp_path / "cstate")

    with pytest.raises(ValueError, match="frozen seeds"):
        maintain_cosine_tables(spark, state, e.limit(1), epoch_id=0)

    init_cosine_state(spark, state, dd.cosine_seed_table(spark, SF_ORACLE))
    for part in range(3):
        maintain_cosine_tables(
            spark, state, e.filter(F.col("vec_id") % 3 == part),
            epoch_id=part,
        )
    vecs, assign, pairs = read_cosine_state(spark, state)
    got = pairs.toPandas()
    want = dd.cosine_pair_table(spark, SF_ORACLE).toPandas()
    want_assign = dd.cosine_assign_table(spark, SF_ORACLE).toPandas()
    from zebra_spark.caching import release_caches

    release_caches()
    assert len(got) == len(want) > 0
    assert _cosine_vhash(got) == _cosine_vhash(want)
    assert _cosine_vhash(assign.toPandas()) == _cosine_vhash(want_assign)
    assert vecs.count() == e.count()

    # replay epoch 1 (restarted stream) -> bit-identical state
    maintain_cosine_tables(
        spark, state, e.filter(F.col("vec_id") % 3 == 1), epoch_id=1
    )
    assert _cosine_vhash(
        read_cosine_state(spark, state)[2].toPandas()
    ) == _cosine_vhash(want)

    # compaction: rows unchanged, folded to epoch=-1, idempotent
    compact_cosine_state(spark, state, n_files=2)
    assert os.path.isdir(f"{state}/pairs/epoch=-1")
    assert _cosine_vhash(
        read_cosine_state(spark, state)[2].toPandas()
    ) == _cosine_vhash(want)
    compact_cosine_state(spark, state, n_files=2)
    assert _cosine_vhash(
        read_cosine_state(spark, state)[2].toPandas()
    ) == _cosine_vhash(want)

    # a post-compaction epoch continues on top of the folded snapshot
    extra = spark.createDataFrame(
        [(10_000_000, [0.0] * 64)], "vec_id bigint, emb array<double>"
    )
    maintain_cosine_tables(spark, state, extra, epoch_id=5)
    vecs2 = read_cosine_state(spark, state)[0]
    assert vecs2.filter(F.col("vec_id") == 10_000_000).count() == 1
    release_caches()


def test_stream_maintain_cosine_tables(spark, tmp_path):
    """The foreachBatch wiring end-to-end: a real file-source vector
    stream drained through stream_maintain_cosine_tables produces the
    same maintained pairs as the batch build (stream == batch for the
    semantic twin)."""
    from pyspark.sql import functions as F

    from zebra_spark.io import embeddings_d
    from zebra_spark.queries import dedup as dd
    from zebra_spark.streaming import (
        init_cosine_state,
        read_cosine_state,
        stream_maintain_cosine_tables,
    )
    from tests.conftest import SF_ORACLE

    e = embeddings_d(spark, SF_ORACLE).select("vec_id", "emb")
    chunks = str(tmp_path / "chunks")
    e.withColumn("chunk", F.pmod("vec_id", F.lit(4))).repartition(
        4, "chunk"
    ).drop("chunk").write.mode("overwrite").parquet(chunks)

    state = str(tmp_path / "cstate")
    init_cosine_state(spark, state, dd.cosine_seed_table(spark, SF_ORACLE))

    # label cadence wiring (r13): validated at wiring time...
    import pytest as _pytest
    from zebra_spark.queries.tick import init_label_state
    from zebra_spark.streaming import read_label_table

    stream = (
        spark.readStream.schema("vec_id bigint, emb array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(chunks)
    )
    with _pytest.raises(ValueError, match="init_label_state"):
        stream_maintain_cosine_tables(
            spark, stream, state, str(tmp_path / "ckpt_bad"),
            label_prop_every=1,
        )
    # ...and run per-epoch once the label state exists
    seeds = embeddings_d(spark, SF_ORACLE).filter(
        F.col("vec_id") % 50 == 0
    ).select(
        F.col("vec_id").alias("lab_id"), "label", F.col("emb").alias("le")
    )
    init_label_state(spark, state, seeds)
    q = stream_maintain_cosine_tables(
        spark, stream, state, str(tmp_path / "ckpt"),
        label_prop_every=1,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = read_cosine_state(spark, state)[2].toPandas()
    want = dd.cosine_pair_table(spark, SF_ORACLE).toPandas()
    # every committed vector carries a propagated label by stream end
    n_labeled = read_label_table(spark, state).count()
    n_vecs = read_cosine_state(spark, state)[0].count()
    from zebra_spark.caching import release_caches

    release_caches()
    assert len(got) == len(want) > 0
    assert _cosine_vhash(got) == _cosine_vhash(want)
    assert n_labeled == n_vecs > 0


def test_maintain_cosine_tables_empty_batch(spark, tmp_path):
    """An empty epoch (foreachBatch guards against it, but a direct
    caller may not) must not corrupt the state: the epoch dirs are
    written empty with schema intact, later reads and epochs work."""
    from pyspark.sql import functions as F

    from zebra_spark.io import embeddings_d
    from zebra_spark.queries import dedup as dd
    from zebra_spark.streaming import (
        init_cosine_state,
        maintain_cosine_tables,
        read_cosine_state,
    )
    from tests.conftest import SF_ORACLE

    e = embeddings_d(spark, SF_ORACLE).select("vec_id", "emb")
    state = str(tmp_path / "cstate")
    init_cosine_state(spark, state, dd.cosine_seed_table(spark, SF_ORACLE))
    maintain_cosine_tables(spark, state, e.limit(20), epoch_id=0)
    maintain_cosine_tables(spark, state, e.limit(0), epoch_id=1)  # empty
    maintain_cosine_tables(
        spark, state, e.filter(F.col("vec_id").between(30, 40)), epoch_id=2
    )
    vecs, assign, pairs = read_cosine_state(spark, state)
    from zebra_spark.caching import release_caches

    release_caches()
    assert vecs.count() == 31
    assert assign.columns == ["vec_id", "cell_id"]
    assert pairs.columns == ["id_a", "id_b", "dist"]


def test_drift_gated_ingest_reseeds_once(spark, tmp_path):
    """VERDICT r8 #2 — the automated reseed lifecycle: quiet batches
    leave the state dir untouched (maintained in place against the
    persisted baseline), a shifted batch triggers exactly one reseed
    into a fresh dir, and the post-reseed pairs equal a fresh build on
    the combined corpus; post-reseed, a batch from the SHIFTED
    distribution is quiet again (the new seeds fit it)."""
    import pytest
    from pyspark.sql import functions as F

    from zebra_spark.io import embeddings_d
    from zebra_spark.queries import dedup as dd
    from zebra_spark.queries.dedup import _cosine_seeds
    from zebra_spark.streaming import (
        compact_cosine_state,
        ingest_cosine_batch,
        init_cosine_state,
        maintain_cosine_tables,
        persist_drift_baseline,
        read_cosine_state,
        read_drift_baseline,
    )
    from tests.conftest import SF_ORACLE

    e = embeddings_d(spark, SF_ORACLE).select("vec_id", "emb")
    corpus = e.filter(F.col("vec_id") % 10 != 0)
    quiet_batch = e.filter(F.col("vec_id") % 10 == 0)
    shift = "transform(emb, x -> 3.0d * x + 1.0d)"
    # corpus-sized shifted cohort: after the reseed the combined
    # baseline is dominated by the shifted mass, so a LATER batch from
    # the shifted distribution lands near ratio 2 (< threshold) — the
    # adaptation the lifecycle exists to provide
    drift_batch = e.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.expr(shift).alias("emb"),
    )

    state = str(tmp_path / "cstate")
    init_cosine_state(spark, state, _cosine_seeds(corpus))
    maintain_cosine_tables(spark, state, corpus, epoch_id=0)
    with pytest.raises(ValueError, match="baseline"):
        ingest_cosine_batch(spark, state, quiet_batch, epoch_id=1)
    base = persist_drift_baseline(spark, state)
    assert base > 0

    # quiet batch: maintained in place, same active dir, no reseed
    active = ingest_cosine_batch(spark, state, quiet_batch, epoch_id=1)
    assert active == state
    n_after_quiet = read_cosine_state(spark, state)[0].count()
    assert n_after_quiet == e.count()

    # drifted batch without a reseed_dir: explicit, descriptive error
    with pytest.raises(ValueError, match="reseed_dir"):
        ingest_cosine_batch(spark, state, drift_batch, epoch_id=2)

    # drifted batch WITH a reseed_dir: exactly one reseed, batch rides
    reseed = str(tmp_path / "cstate_v2")
    active = ingest_cosine_batch(
        spark, state, drift_batch, epoch_id=2, reseed_dir=reseed
    )
    assert active == reseed
    # old state untouched (retired by the caller, not mutated)
    assert read_cosine_state(spark, state)[0].count() == n_after_quiet

    # post-reseed state == a fresh build on the combined corpus
    combined = e.unionByName(drift_batch)
    fresh = str(tmp_path / "fresh")
    init_cosine_state(spark, fresh, _cosine_seeds(combined))
    maintain_cosine_tables(spark, fresh, combined, epoch_id=None)
    compact_cosine_state(spark, fresh)
    got = read_cosine_state(spark, reseed)[2].toPandas()
    want = read_cosine_state(spark, fresh)[2].toPandas()
    assert len(got) == len(want) > 0
    assert _cosine_vhash(got) == _cosine_vhash(want)

    # the reseed persisted a fresh baseline, and a batch from the
    # SHIFTED distribution is now quiet — no second reseed
    assert read_drift_baseline(spark, reseed) is not None
    drift_batch2 = quiet_batch.select(
        (F.col("vec_id") + 2_000_000).alias("vec_id"),
        F.expr(shift).alias("emb"),
    )
    active = ingest_cosine_batch(spark, reseed, drift_batch2, epoch_id=0)
    assert active == reseed
    from zebra_spark.caching import release_caches

    release_caches()


def test_register_cosine_state_serves_consumers(spark, tmp_path):
    """register_cosine_state is the one-call consumer cutover: after a
    (compacted) reseed, registered consumers read the state's tables —
    q_cell_balance must reflect the state's assign/, and restoring the
    returned prevs must put the registry back."""
    from pyspark.sql import functions as F

    import zebra_spark
    from zebra_spark.io import embeddings_d
    from zebra_spark.queries import dedup as dd
    from zebra_spark.streaming import (
        init_cosine_state,
        maintain_cosine_tables,
        compact_cosine_state,
        register_cosine_state,
    )
    from tests.conftest import SF_ORACLE

    zebra_spark.load_all_queries()
    e = embeddings_d(spark, SF_ORACLE).select("vec_id", "emb").limit(80)
    state = str(tmp_path / "cstate")
    init_cosine_state(spark, state, dd.cosine_seed_table(spark, SF_ORACLE))
    maintain_cosine_tables(spark, state, e, epoch_id=0)
    compact_cosine_state(spark, state)

    want_before = zebra_spark.QUERIES["q_cell_balance"](
        spark, SF_ORACLE
    ).agg(F.sum("n_members")).collect()[0][0]
    prevs = register_cosine_state(spark, state, SF_ORACLE)
    try:
        got = zebra_spark.QUERIES["q_cell_balance"](
            spark, SF_ORACLE
        ).agg(F.sum("n_members")).collect()[0][0]
        # 80 vectors x NDUP_ASSIGN assignments in the registered state
        assert got == 80 * dd.NDUP_ASSIGN
        assert got != want_before
    finally:
        for kind, p in prevs.items():
            dd.register_maintained_table(kind, SF_ORACLE, p)
    back = zebra_spark.QUERIES["q_cell_balance"](
        spark, SF_ORACLE
    ).agg(F.sum("n_members")).collect()[0][0]
    assert back == want_before

    # at-rest enforcement (r9 review): a torn in-flight epoch must be
    # refused, not registered past the committed-epoch discipline
    import os

    maintain_cosine_tables(spark, state, e.limit(5), epoch_id=7)
    os.remove(f"{state}/pairs/epoch=7/_SUCCESS")
    with pytest.raises(ValueError, match="at-rest"):
        register_cosine_state(spark, state, SF_ORACLE)
    from zebra_spark.caching import release_caches

    release_caches()


def test_reseed_replay_idempotent(spark, tmp_path):
    """r9 self-review: a reseed re-run into the SAME half-written
    target (the stream replays its drifted epoch after a crash
    mid-reseed) must produce the identical state, not append the
    combined corpus a second time; reseeding into the source dir is
    rejected."""
    from pyspark.sql import functions as F

    from zebra_spark.io import embeddings_d
    from zebra_spark.queries import dedup as dd
    from zebra_spark.streaming import (
        init_cosine_state,
        maintain_cosine_tables,
        read_cosine_state,
        reseed_cosine_state,
    )
    from tests.conftest import SF_ORACLE

    e = embeddings_d(spark, SF_ORACLE).select("vec_id", "emb").limit(60)
    state = str(tmp_path / "cstate")
    init_cosine_state(spark, state, dd.cosine_seed_table(spark, SF_ORACLE))
    maintain_cosine_tables(spark, state, e, epoch_id=0)

    target = str(tmp_path / "v2")
    n1 = reseed_cosine_state(spark, state, target)
    want = read_cosine_state(spark, target)
    counts1 = tuple(df.count() for df in want)
    # replay: same call again into the already-populated target
    n2 = reseed_cosine_state(spark, state, target)
    got = read_cosine_state(spark, target)
    assert n1 == n2
    assert tuple(df.count() for df in got) == counts1

    with pytest.raises(ValueError, match="must differ"):
        reseed_cosine_state(spark, state, state)


def test_missing_success_markers_fail_loud(spark, tmp_path):
    """r9 self-review: at most one epoch per table can legitimately
    lack its _SUCCESS marker (a crash mid-write).  Two or more means
    the job-commit markers are off — the reader must refuse instead of
    silently treating every fully-written epoch as uncommitted (which
    would hand compaction an empty view to snapshot)."""
    import os

    from pyspark.sql import functions as F

    from zebra_spark.io import embeddings_d
    from zebra_spark.queries import dedup as dd
    from zebra_spark.streaming import (
        init_cosine_state,
        maintain_cosine_tables,
        read_cosine_state,
    )
    from tests.conftest import SF_ORACLE

    e = embeddings_d(spark, SF_ORACLE).select("vec_id", "emb")
    state = str(tmp_path / "cstate")
    init_cosine_state(spark, state, dd.cosine_seed_table(spark, SF_ORACLE))
    for part in range(3):
        maintain_cosine_tables(
            spark, state, e.filter(F.col("vec_id") % 3 == part),
            epoch_id=part,
        )
    # one missing marker = a normal crash-partial epoch: filtered out
    os.remove(f"{state}/pairs/epoch=2/_SUCCESS")
    vecs, _, pairs = read_cosine_state(spark, state)
    assert vecs.count() > 0
    # two missing markers cannot come from a crash — refuse loudly
    os.remove(f"{state}/pairs/epoch=1/_SUCCESS")
    with pytest.raises(ValueError, match="_SUCCESS"):
        read_cosine_state(spark, state)


def test_committed_epoch_with_empty_pairs_delta(spark, tmp_path):
    """ADVICE r8 (high): a fully committed epoch whose pairs delta is
    legitimately EMPTY (a batch with no cell collisions) must stay
    visible — committed epochs now come from the epoch=N directory
    listing + _SUCCESS marker (streaming._epoch_dirs), not from row
    values, so an empty-but-written partition counts.  Before the fix,
    readers hid that epoch's vecs/assign and compact_state permanently
    deleted them (the stream checkpoint had the epoch committed, so it
    never replayed — silent data loss)."""
    from pyspark.sql import functions as F

    from zebra_spark.streaming import (
        compact_cosine_state,
        init_cosine_state,
        maintain_cosine_tables,
        read_cosine_state,
    )

    # 10 far-apart one-hot seeds; NDUP_ASSIGN=5 nearest per vector.
    dim = 10
    seeds = spark.createDataFrame(
        [(i, [100.0 if j == i else 0.0 for j in range(dim)])
         for i in range(dim)],
        "cell_id bigint, ce array<double>",
    )
    lo = [50.0] * 5 + [0.0] * 5   # 5 nearest seeds = cells {0..4}
    hi = [0.0] * 5 + [50.0] * 5   # 5 nearest seeds = cells {5..9}
    state = str(tmp_path / "cstate")
    init_cosine_state(spark, state, seeds)
    # epoch 0: two cell-mates -> non-empty pairs delta
    maintain_cosine_tables(
        spark, state,
        spark.createDataFrame(
            [(1, lo), (2, lo)], "vec_id bigint, emb array<double>"
        ),
        epoch_id=0,
    )
    # epoch 1: one vector in disjoint cells -> EMPTY pairs delta,
    # non-empty vecs/assign — the case the row-value epoch sets lost
    maintain_cosine_tables(
        spark, state,
        spark.createDataFrame([(3, hi)], "vec_id bigint, emb array<double>"),
        epoch_id=1,
    )
    vecs, assign, pairs = read_cosine_state(spark, state)
    assert vecs.count() == 3  # reader sees the empty-delta epoch
    assert assign.filter(F.col("vec_id") == 3).count() == 5
    assert pairs.count() == 1
    # compaction must fold epoch 1 in, not drop it
    compact_cosine_state(spark, state, n_files=1)
    vecs, assign, pairs = read_cosine_state(spark, state)
    assert vecs.count() == 3
    assert assign.filter(F.col("vec_id") == 3).count() == 5
    assert pairs.count() == 1


def test_remove_from_pair_state_equals_rebuild(spark, tmp_path):
    """Takedown deletes: after remove_from_pair_state, every maintained
    lexical table is bit-identical to a from-scratch maintenance run
    over the surviving corpus — candidates depend only on surviving
    signatures, so no pair is lost or retained wrongly."""
    import hashlib

    from pyspark.sql import functions as F

    from zebra_spark.io import load
    from zebra_spark.streaming import (
        maintain_pair_tables,
        read_pair_state,
        remove_from_pair_state,
    )
    from tests.conftest import SF_SMOKE

    def vhash(pdf):
        pdf = pdf.reindex(sorted(pdf.columns), axis=1)
        rows = sorted(
            tuple(str(v) for v in r) for r in pdf.itertuples(index=False)
        )
        return hashlib.md5(str(rows).encode()).hexdigest()

    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "text")
    state = str(tmp_path / "state")
    for part in range(2):
        maintain_pair_tables(
            spark, state, docs.filter(F.col("doc_id") % 2 == part),
            epoch_id=part,
        )
    gone = docs.select("doc_id").filter(F.col("doc_id") % 7 == 3)
    remove_from_pair_state(spark, state, gone)

    rebuild = str(tmp_path / "rebuild")
    maintain_pair_tables(
        spark, rebuild, docs.join(gone, "doc_id", "left_anti"), epoch_id=0
    )
    got = read_pair_state(spark, state)
    want = read_pair_state(spark, rebuild)
    from zebra_spark.caching import release_caches

    release_caches()
    for g, w in zip(got, want):
        gp, wp = g.toPandas(), w.toPandas()
        assert len(gp) == len(wp) > 0
        assert vhash(gp) == vhash(wp)


def test_remove_from_cosine_state_equals_rebuild(spark, tmp_path):
    """The semantic twin: deletes propagate to vectors, assignments and
    pairs; the surviving state equals maintaining the surviving corpus
    against the SAME frozen seeds (seeds are a separate artifact, so a
    takedown never perturbs the blocking)."""
    import hashlib

    from pyspark.sql import functions as F

    from zebra_spark.io import embeddings_d
    from zebra_spark.queries import dedup as dd
    from zebra_spark.streaming import (
        init_cosine_state,
        maintain_cosine_tables,
        read_cosine_state,
        remove_from_cosine_state,
    )
    from tests.conftest import SF_ORACLE

    def vhash(pdf):
        pdf = pdf.reindex(sorted(pdf.columns), axis=1)
        rows = sorted(
            tuple(f"{v:.10f}" if isinstance(v, float) else str(v) for v in r)
            for r in pdf.itertuples(index=False)
        )
        return hashlib.md5(str(rows).encode()).hexdigest()

    e = embeddings_d(spark, SF_ORACLE).select("vec_id", "emb")
    seeds = dd.cosine_seed_table(spark, SF_ORACLE)
    state = str(tmp_path / "cstate")
    init_cosine_state(spark, state, seeds)
    for part in range(2):
        maintain_cosine_tables(
            spark, state, e.filter(F.col("vec_id") % 2 == part),
            epoch_id=part,
        )
    # seed vectors (vec_id < n_cells) cannot be taken down in place —
    # their embeddings live in seeds/ and the guard refuses (reseed
    # required); pick non-seed ids for the in-place path
    n_seeds = seeds.count()
    import pytest

    with pytest.raises(ValueError, match="frozen seed"):
        remove_from_cosine_state(
            spark, state, e.select("vec_id").filter(F.col("vec_id") == 3)
        )
    gone = e.select("vec_id").filter(
        (F.col("vec_id") % 7 == 3) & (F.col("vec_id") >= n_seeds)
    )
    remove_from_cosine_state(spark, state, gone)

    rebuild = str(tmp_path / "rebuild")
    init_cosine_state(spark, rebuild, seeds)
    maintain_cosine_tables(
        spark, rebuild, e.join(gone, "vec_id", "left_anti"), epoch_id=0
    )
    got = read_cosine_state(spark, state)
    want = read_cosine_state(spark, rebuild)
    from zebra_spark.caching import release_caches

    release_caches()
    for g, w in zip(got, want):
        gp, wp = g.toPandas(), w.toPandas()
        assert len(gp) == len(wp) > 0
        assert vhash(gp) == vhash(wp)


def test_register_state_dir_as_maintained_table(spark, tmp_path):
    """A streaming state's pairs/ dir (epoch=N layout) can be
    registered DIRECTLY as the maintained pair table: the epoch
    partition column is a write-side commit marker and must not leak
    into consumer schemas — q_dedup_minhash over the registered state
    equals the session build."""
    import hashlib

    from pyspark.sql import functions as F

    import zebra_spark
    from zebra_spark.io import load
    from zebra_spark.queries import dedup as dd
    from zebra_spark.streaming import maintain_pair_tables
    from tests.conftest import SF_ORACLE

    zebra_spark.load_all_queries()

    def vhash(pdf):
        pdf = pdf.reindex(sorted(pdf.columns), axis=1)
        rows = sorted(
            tuple(str(v) for v in r) for r in pdf.itertuples(index=False)
        )
        return hashlib.md5(str(rows).encode()).hexdigest()

    want = zebra_spark.QUERIES["q_dedup_minhash"](spark, SF_ORACLE).toPandas()

    docs = load(spark, SF_ORACLE, "documents").select("doc_id", "text")
    state = str(tmp_path / "state")
    for part in range(2):
        maintain_pair_tables(
            spark, state, docs.filter(F.col("doc_id") % 2 == part),
            epoch_id=part,
        )
    prev = dd.register_maintained_table("minhash", SF_ORACLE, f"{state}/pairs")
    try:
        got = zebra_spark.QUERIES["q_dedup_minhash"](spark, SF_ORACLE).toPandas()
    finally:
        from pathlib import Path

        key = ("minhash", str(Path(SF_ORACLE).resolve()),
               dd.N_HASHES, dd.N_BANDS, None)
        with dd._DERIVED_LOCK:
            if prev is not None:
                dd._DERIVED[key] = prev
            else:
                dd._DERIVED.pop(key, None)
    from zebra_spark.caching import release_caches

    release_caches()
    assert "epoch" not in got.columns
    assert vhash(got) == vhash(want)


def test_takedown_preserves_backfill_layout(spark, tmp_path):
    """A takedown on a backfill-mode state must not convert it to
    epoch layout — later backfill appends must keep working."""
    from pyspark.sql import functions as F

    from zebra_spark.io import load
    from zebra_spark.streaming import (
        maintain_pair_tables,
        read_pair_state,
        remove_from_pair_state,
    )
    from tests.conftest import SF_SMOKE

    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "text")
    state = str(tmp_path / "flat")
    maintain_pair_tables(
        spark, state, docs.filter(F.col("doc_id") % 2 == 0), epoch_id=None
    )
    remove_from_pair_state(
        spark, state, docs.select("doc_id").filter(F.col("doc_id") % 8 == 0)
    )
    # still a flat layout: another backfill append is accepted
    maintain_pair_tables(
        spark, state, docs.filter(F.col("doc_id") % 2 == 1), epoch_id=None
    )
    sigs, _, _ = read_pair_state(spark, state)
    assert "epoch" not in sigs.columns
    assert sigs.select("doc_id").distinct().count() > 0


def test_partial_epoch_invisible_until_replayed(spark, tmp_path):
    """A crash between one maintain call's per-table writes leaves a
    partial epoch; readers and compaction must not see it, and the
    stream's replay must converge to the uncrashed state."""
    import hashlib
    import shutil

    from pyspark.sql import functions as F

    from zebra_spark.io import load
    from zebra_spark.streaming import (
        compact_pair_state,
        maintain_pair_tables,
        read_pair_state,
    )
    from tests.conftest import SF_SMOKE

    def vhash(pdf):
        pdf = pdf.reindex(sorted(pdf.columns), axis=1)
        rows = sorted(
            tuple(str(v) for v in r) for r in pdf.itertuples(index=False)
        )
        return hashlib.md5(str(rows).encode()).hexdigest()

    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "text")
    state = str(tmp_path / "state")
    maintain_pair_tables(
        spark, state, docs.filter(F.col("doc_id") % 2 == 0), epoch_id=0
    )
    snap = vhash(read_pair_state(spark, state)[2].toPandas())

    # simulate the crash: epoch 1 written to sigs (the first table in
    # write order after vecs-equivalent) but NOT to toks/pairs
    batch1 = docs.filter(F.col("doc_id") % 2 == 1)
    bks = batch1.select(
        "doc_id", F.lit(7).cast("bigint").alias("bk")
    )
    bks.write.mode("overwrite").parquet(f"{state}/sigs/epoch=1")

    # readers: epoch 1 is NOT committed (absent from toks/pairs)
    sigs, _, pairs = read_pair_state(spark, state)
    assert sigs.filter(F.col("bk") == 7).count() == 0
    assert vhash(pairs.toPandas()) == snap

    # compaction must not bake the partial epoch in
    compact_pair_state(spark, state, n_files=2)
    sigs2, _, pairs2 = read_pair_state(spark, state)
    assert sigs2.filter(F.col("bk") == 7).count() == 0
    assert vhash(pairs2.toPandas()) == snap

    # the replay (the stream restarts epoch 1) converges to the
    # uncrashed twin
    maintain_pair_tables(spark, state, batch1, epoch_id=1)
    got = read_pair_state(spark, state)[2].toPandas()

    ref = str(tmp_path / "ref")
    maintain_pair_tables(
        spark, ref, docs.filter(F.col("doc_id") % 2 == 0), epoch_id=0
    )
    maintain_pair_tables(spark, ref, batch1, epoch_id=1)
    want = read_pair_state(spark, ref)[2].toPandas()
    from zebra_spark.caching import release_caches

    release_caches()
    assert vhash(got) == vhash(want)
    shutil.rmtree(state, ignore_errors=True)


def test_reseed_cosine_state(spark, tmp_path):
    """The reseed lifecycle: a takedown that hits seed vectors is
    refused in place, reseed_cosine_state builds the survivor state
    with FRESH seeds (removed embeddings gone from seeds/ too), and
    the new state accepts a fresh exactly-once stream epoch."""
    import hashlib

    from pyspark.sql import functions as F

    from zebra_spark.io import embeddings_d
    from zebra_spark.queries import dedup as dd
    from zebra_spark.streaming import (
        init_cosine_state,
        maintain_cosine_tables,
        read_cosine_state,
        remove_from_cosine_state,
        reseed_cosine_state,
    )
    from tests.conftest import SF_ORACLE

    def vhash(pdf):
        pdf = pdf.reindex(sorted(pdf.columns), axis=1)
        rows = sorted(
            tuple(f"{v:.10f}" if isinstance(v, float) else str(v) for v in r)
            for r in pdf.itertuples(index=False)
        )
        return hashlib.md5(str(rows).encode()).hexdigest()

    e = embeddings_d(spark, SF_ORACLE).select("vec_id", "emb")
    old = str(tmp_path / "old")
    init_cosine_state(spark, old, dd.cosine_seed_table(spark, SF_ORACLE))
    maintain_cosine_tables(spark, old, e, epoch_id=0)

    gone = e.select("vec_id").filter(F.col("vec_id") % 5 == 3)  # hits seeds
    with pytest.raises(ValueError, match="frozen seed"):
        remove_from_cosine_state(spark, old, gone)

    new = str(tmp_path / "new")
    n = reseed_cosine_state(spark, old, new, remove_ids=gone)
    survivors = e.join(gone, "vec_id", "left_anti")
    assert n == survivors.count()

    seeds = spark.read.parquet(f"{new}/seeds")
    assert seeds.join(
        gone.withColumnRenamed("vec_id", "cell_id"), "cell_id", "left_semi"
    ).count() == 0  # removed embeddings purged from the seed set too
    vecs, assign, pairs = read_cosine_state(spark, new)
    for df, cols in ((vecs, ["vec_id"]), (assign, ["vec_id"]),
                     (pairs, ["id_a", "id_b"])):
        for c in cols:
            assert df.join(
                gone.withColumnRenamed("vec_id", c), c, "left_semi"
            ).count() == 0

    # equals a fresh survivor build with the same (new) seed rule
    ref = str(tmp_path / "ref")
    init_cosine_state(spark, ref, dd._cosine_seeds(survivors))
    maintain_cosine_tables(spark, ref, survivors, epoch_id=0)
    want = read_cosine_state(spark, ref)[2].toPandas()
    assert vhash(pairs.toPandas()) == vhash(want)

    # a fresh stream's first epoch applies on top of the snapshot
    extra = spark.createDataFrame(
        [(10_000_000, [0.5] * 64)], "vec_id bigint, emb array<double>"
    )
    maintain_cosine_tables(spark, new, extra, epoch_id=0)
    assert read_cosine_state(spark, new)[0].filter(
        F.col("vec_id") == 10_000_000
    ).count() == 1
    from zebra_spark.caching import release_caches

    release_caches()


def test_fsutil_delete_handles_plain_files(spark, tmp_path):
    """ADVICE r10: rmtree's local branch (shutil.rmtree) silently
    no-ops on a regular file, so the reseed 'pure scratch' wipe left a
    stale drift_baseline.json beside emptied tables; fsutil.delete
    must remove files AND directories, and missing paths are no-ops."""
    from zebra_spark import fsutil

    f = tmp_path / "drift_baseline.json"
    f.write_text("{}")
    fsutil.delete(spark, str(f))
    assert not f.exists()

    d = tmp_path / "somedir"
    (d / "sub").mkdir(parents=True)
    fsutil.delete(spark, str(d))
    assert not d.exists()

    fsutil.delete(spark, str(tmp_path / "never_existed"))  # no-op


def test_epoch_dirs_with_glob_metachars_in_path(spark, tmp_path):
    """ADVICE r10: a state dir containing [, ], ? or * must not turn
    into glob syntax in the committed-epoch scan — previously every
    epoch=*/_SUCCESS went invisible and readers hid committed rows."""
    from zebra_spark import fsutil

    base = tmp_path / "st[at]e?*"
    marked = base / "tbl" / "epoch=0"
    marked.mkdir(parents=True)
    (marked / "_SUCCESS").write_text("")
    got = fsutil.glob_paths(spark, str(base / "tbl"), "epoch=*/_SUCCESS")
    assert got == [str(marked / "_SUCCESS")]
    # (a FULL maintain cycle in such a dir is impossible regardless:
    # spark.read.parquet globs its path argument too, so a metachar
    # state dir fails LOUDLY at the first Spark read — the fsutil fix
    # closes the one layer where the failure was silent)


def test_capped_out_of_order_backfill_refused(spark, tmp_path):
    """ADVICE r10: the capped stream==batch contract requires
    monotonically increasing vec_ids once a cell fills; an
    out-of-order backfill into an over-cap cell must raise (it would
    silently evict earlier-admitted prefix members and leave stale
    over-cap pairs no capped rebuild contains), while an out-of-order
    backfill whose cells all sit under the cap stays legal (the cap
    never binds, so it is bit-identical to a rebuild)."""
    import pytest
    from pyspark.sql import functions as F

    from zebra_spark.queries import dedup as dd
    from zebra_spark.streaming import (
        init_cosine_state,
        maintain_cosine_tables,
    )

    # the hot-cell fixture from test_cosine_max_cell_cap: cell 0
    # collects every vector, so cap=4 binds hard
    dim, cap = 10, 4
    rows = [(i, [100.0 if j == i else 0.0 for j in range(dim)], 0)
            for i in range(10)]
    rows += [(10 + k, [50.0] * 5 + [0.0] * 5, 0) for k in range(8)]
    d = str(tmp_path / "sf_hot")
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")

    e = dd.embeddings_d(spark, d).select("vec_id", "emb")
    state = str(tmp_path / "cstate")
    init_cosine_state(spark, state, dd.cosine_seed_table(spark, d))
    maintain_cosine_tables(
        spark, state, e.filter(F.col("vec_id") >= 14), epoch_id=0,
        max_cell=cap,
    )
    with pytest.raises(ValueError, match="monotonically increasing"):
        maintain_cosine_tables(
            spark, state, e.filter(F.col("vec_id") < 14), epoch_id=1,
            max_cell=cap,
        )
    # uncapped maintenance of the same out-of-order split stays legal
    state2 = str(tmp_path / "cstate_uncapped")
    init_cosine_state(spark, state2, dd.cosine_seed_table(spark, d))
    maintain_cosine_tables(
        spark, state2, e.filter(F.col("vec_id") >= 14), epoch_id=0,
        max_cell=None,
    )
    maintain_cosine_tables(
        spark, state2, e.filter(F.col("vec_id") < 14), epoch_id=1,
        max_cell=None,
    )
    # under-cap cells: out-of-order is benign and admitted
    state3 = str(tmp_path / "cstate_undercap")
    init_cosine_state(spark, state3, dd.cosine_seed_table(spark, d))
    maintain_cosine_tables(
        spark, state3, e.filter(F.col("vec_id").isin(15, 16)),
        epoch_id=0, max_cell=100,
    )
    maintain_cosine_tables(
        spark, state3, e.filter(F.col("vec_id").isin(11, 12)),
        epoch_id=1, max_cell=100,
    )
    from zebra_spark.caching import release_caches

    release_caches()


def test_cluster_labels_stream_equals_batch(spark, tmp_path):
    """Streaming-maintained cluster labels (r10, VERDICT r9 #2): with
    clusters=True the foreachBatch maintenance keeps a label snapshot
    that is bit-identical to batch connected components over the same
    corpus — across an arbitrary batch split, an epoch REPLAY, pair
    compaction, and a mid-stream TAKEDOWN."""
    import hashlib

    from pyspark.sql import functions as F

    from zebra_spark.graph import connected_components
    from zebra_spark.io import load
    from zebra_spark.queries import dedup as dd
    from zebra_spark.streaming import (
        compact_pair_state,
        maintain_pair_tables,
        read_cluster_labels,
        remove_from_cluster_state,
        remove_from_pair_state,
    )
    from tests.conftest import SF_SMOKE

    def vhash(pdf):
        pdf = pdf.reindex(sorted(pdf.columns), axis=1)
        rows = sorted(
            tuple(str(v) for v in r) for r in pdf.itertuples(index=False)
        )
        return hashlib.md5(str(rows).encode()).hexdigest()

    def batch_cc(doc_frame, pair_frame):
        return (
            connected_components(
                doc_frame.select(F.col("doc_id").alias("id")),
                dd.threshold_edges(pair_frame),
                edges_cheap=True,
            )
            .select(
                F.col("id").alias("doc_id"),
                F.col("component").alias("cluster"),
            )
            .toPandas()
        )

    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "text")
    state = str(tmp_path / "state")
    for part in range(3):
        maintain_pair_tables(
            spark, state, docs.filter(F.col("doc_id") % 3 == part),
            epoch_id=part, clusters=True,
        )
    got = read_cluster_labels(spark, state).toPandas()
    want = batch_cc(docs, dd.pair_table(spark, SF_SMOKE))
    assert len(got) == len(want) > 0
    assert vhash(got) == vhash(want)

    # replay an epoch (restarted stream): the re-merge is idempotent
    maintain_pair_tables(
        spark, state, docs.filter(F.col("doc_id") % 3 == 1),
        epoch_id=1, clusters=True,
    )
    assert vhash(read_cluster_labels(spark, state).toPandas()) == vhash(want)

    # pair compaction does not touch the label snapshot
    compact_pair_state(spark, state)
    assert vhash(read_cluster_labels(spark, state).toPandas()) == vhash(want)

    # mid-stream takedown: drop every 7th doc from pairs AND labels,
    # then ingest one more epoch on top of the post-takedown state —
    # final labels must equal a from-scratch CC over the surviving
    # corpus' pair graph
    removed = docs.select("doc_id").filter(F.col("doc_id") % 7 == 0)
    remove_from_cluster_state(spark, state, removed)
    remove_from_pair_state(spark, state, removed)
    survivors = docs.filter(F.col("doc_id") % 7 != 0)
    surviving_pairs = (
        dd.pair_table(spark, SF_SMOKE)
        .filter((F.col("doc_a") % 7 != 0) & (F.col("doc_b") % 7 != 0))
    )
    assert vhash(read_cluster_labels(spark, state).toPandas()) == vhash(
        batch_cc(survivors, surviving_pairs)
    )
    from zebra_spark.caching import release_caches

    release_caches()


def test_cluster_labels_backfill_and_empty_state(spark, tmp_path):
    """Backfill mode (epoch_id=None) maintains the same label snapshot,
    and reading a state that never carried clusters=True returns an
    empty (doc_id, cluster) frame instead of failing."""
    import hashlib

    from pyspark.sql import functions as F

    from zebra_spark.io import load
    from zebra_spark.queries import dedup as dd
    from zebra_spark.streaming import (
        maintain_pair_tables,
        read_cluster_labels,
    )
    from tests.conftest import SF_SMOKE

    def vhash(pdf):
        pdf = pdf.reindex(sorted(pdf.columns), axis=1)
        rows = sorted(
            tuple(str(v) for v in r) for r in pdf.itertuples(index=False)
        )
        return hashlib.md5(str(rows).encode()).hexdigest()

    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "text")
    bare = str(tmp_path / "bare")
    maintain_pair_tables(spark, bare, docs)  # clusters never maintained
    empty = read_cluster_labels(spark, bare)
    assert empty.columns == ["doc_id", "cluster"] and empty.count() == 0

    state = str(tmp_path / "state")
    for part in range(2):
        maintain_pair_tables(
            spark, state, docs.filter(F.col("doc_id") % 2 == part),
            clusters=True,
        )
    got = read_cluster_labels(spark, state).toPandas()
    want = dd.cluster_label_table(spark, SF_SMOKE).toPandas()
    from zebra_spark.caching import release_caches

    release_caches()
    assert vhash(got) == vhash(want)


def test_cluster_labels_enable_midstream_bootstraps(spark, tmp_path):
    """r10 review: flipping clusters=True on a state that already holds
    epochs must BOOTSTRAP the label snapshot from the full pair state
    (one-time closure), not start from empty labels — earlier docs and
    edges would otherwise be missing from the snapshot forever."""
    import hashlib

    from pyspark.sql import functions as F

    from zebra_spark.graph import connected_components
    from zebra_spark.io import load
    from zebra_spark.queries import dedup as dd
    from zebra_spark.streaming import (
        maintain_pair_tables,
        read_cluster_labels,
    )
    from tests.conftest import SF_SMOKE

    def vhash(pdf):
        pdf = pdf.reindex(sorted(pdf.columns), axis=1)
        rows = sorted(
            tuple(str(v) for v in r) for r in pdf.itertuples(index=False)
        )
        return hashlib.md5(str(rows).encode()).hexdigest()

    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "text")
    state = str(tmp_path / "state")
    # two epochs WITHOUT label maintenance, then the operator enables it
    for part in range(2):
        maintain_pair_tables(
            spark, state, docs.filter(F.col("doc_id") % 3 == part),
            epoch_id=part, clusters=False,
        )
    maintain_pair_tables(
        spark, state, docs.filter(F.col("doc_id") % 3 == 2),
        epoch_id=2, clusters=True,
    )
    got = read_cluster_labels(spark, state).toPandas()
    want = (
        connected_components(
            docs.select(F.col("doc_id").alias("id")),
            dd.threshold_edges(dd.pair_table(spark, SF_SMOKE)),
            edges_cheap=True,
        )
        .select(
            F.col("id").alias("doc_id"), F.col("component").alias("cluster")
        )
        .toPandas()
    )
    from zebra_spark.caching import release_caches

    release_caches()
    assert len(got) == len(want) > 0
    assert vhash(got) == vhash(want)


def test_capped_backfill_untouched_overcap_cell_allowed(spark, tmp_path):
    """r10 review: the out-of-order guard must only consider cells the
    BATCH assigns into — a historic over-cap cell the batch never
    touches cannot change any admitted prefix, and rejecting on it
    would permanently refuse every legal backfill once one cell
    fills."""
    from pyspark.sql import functions as F  # noqa: F401

    from zebra_spark.streaming import (
        init_cosine_state,
        maintain_cosine_tables,
    )

    dim, cap = 12, 4
    # 12 orthogonal seeds: vectors biased toward seeds {0..4} assign to
    # exactly those 5 cells (NDUP_ASSIGN=5); vectors biased toward
    # {7..11} assign to exactly those — the two groups share no cell
    seeds = spark.createDataFrame(
        [(j, [10.0 if i == j else 0.0 for i in range(dim)])
         for j in range(dim)],
        "cell_id bigint, ce array<float>",
    )

    def vec(main: int, minors: list[int]) -> list[float]:
        v = [0.0] * dim
        v[main] = 100.0
        for m in minors:
            v[m] = 1.0
        return v

    # epoch 0: 12 monotone vectors in the {0..4} region -> cells 0..4
    # each hold 12 members, far over cap
    g_a = [(100 + k, vec(0, [1, 2, 3, 4])) for k in range(12)]
    # epoch 1: an out-of-order backfill (ids BELOW state max) entirely
    # in the {7..11} region -> touched cells end at 4 members == cap
    g_b = [(k, vec(11, [7, 8, 9, 10])) for k in range(4)]
    # epoch 2: out-of-order AND touching the over-cap region -> refused
    g_c = [(50 + k, vec(0, [1, 2, 3, 4])) for k in range(2)]

    state = str(tmp_path / "cstate")
    init_cosine_state(spark, state, seeds)
    schema = "vec_id bigint, emb array<float>"
    maintain_cosine_tables(
        spark, state, spark.createDataFrame(g_a, schema), epoch_id=0,
        max_cell=cap,
    )
    # legal backfill: over-cap cells exist but are untouched
    maintain_cosine_tables(
        spark, state, spark.createDataFrame(g_b, schema), epoch_id=1,
        max_cell=cap,
    )
    import pytest

    with pytest.raises(ValueError, match="monotonically increasing"):
        maintain_cosine_tables(
            spark, state, spark.createDataFrame(g_c, schema), epoch_id=2,
            max_cell=cap,
        )
    from zebra_spark.caching import release_caches

    release_caches()


def test_cluster_label_merge_cadence(spark, tmp_path):
    """label_merge_every=K (r11, VERDICT r10 #7): the |V|-row snapshot
    rewrite defers to every K-th epoch — between merges the labels
    visibly LAG (deferred epochs' docs absent), flush_cluster_labels
    publishes them, and the final labels are bit-identical to per-epoch
    merging.  Backfill mode rejects K > 1 (no epoch numbering)."""
    import hashlib

    import pytest
    from pyspark.sql import functions as F

    from zebra_spark.io import load
    from zebra_spark.streaming import (
        flush_cluster_labels,
        maintain_pair_tables,
        read_cluster_labels,
    )
    from tests.conftest import SF_SMOKE

    def vhash(pdf):
        pdf = pdf.reindex(sorted(pdf.columns), axis=1)
        rows = sorted(
            tuple(str(v) for v in r) for r in pdf.itertuples(index=False)
        )
        return hashlib.md5(str(rows).encode()).hexdigest()

    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "text")
    lazy = str(tmp_path / "lazy")
    eager = str(tmp_path / "eager")
    for part in range(5):
        batch = docs.filter(F.col("doc_id") % 5 == part)
        maintain_pair_tables(
            spark, lazy, batch, epoch_id=part, clusters=True,
            label_merge_every=3,
        )
        maintain_pair_tables(
            spark, eager, batch, epoch_id=part, clusters=True,
        )
        if part == 1:
            # epoch 1 deferred (1 - wm(0) < 3): its docs are not in
            # the lagging snapshot yet — the write saving is real
            lag = read_cluster_labels(spark, lazy)
            assert (
                lag.join(batch.select("doc_id"), "doc_id", "left_semi")
                .count()
                == 0
            )
            assert lag.count() > 0  # epoch 0's bootstrap is there
        if part == 3:
            # epoch 3 merged the committed range (0, 3] — caught up
            n3 = read_cluster_labels(spark, lazy).count()
            assert n3 == read_cluster_labels(spark, eager).count()

    # epoch 4 deferred again; flush publishes the remaining range
    assert (
        read_cluster_labels(spark, lazy).count()
        < read_cluster_labels(spark, eager).count()
    )
    flush_cluster_labels(spark, lazy)
    got = read_cluster_labels(spark, lazy).toPandas()
    want = read_cluster_labels(spark, eager).toPandas()
    assert len(got) == len(want) > 0
    assert vhash(got) == vhash(want)
    # flush is idempotent / no-op when current
    flush_cluster_labels(spark, lazy)
    assert vhash(read_cluster_labels(spark, lazy).toPandas()) == vhash(want)

    # backfill appends cannot defer: no epoch numbering to range over —
    # and the refusal must land BEFORE any non-idempotent append, or a
    # caller's retry after fixing the knob double-applies the batch
    # (r11 review)
    import os

    with pytest.raises(ValueError, match="epoch"):
        maintain_pair_tables(
            spark, str(tmp_path / "bf"), docs.limit(10), clusters=True,
            label_merge_every=2,
        )
    assert not os.path.exists(str(tmp_path / "bf"))
    from zebra_spark.caching import release_caches

    release_caches()


def test_sink_extends_epoch_export(spark, tmp_path):
    """r11: maintain_pair_tables(export_dir=...) publishes each
    epoch's docs into the epoch-major training export under the
    STREAM'S epoch numbering — after the 3-epoch ingest the export is
    bit-identical to the one-shot epoch-major order (the fixture's
    doc_id % 3 convention matches the batch split), a replayed epoch
    REPLACES its export dir (idempotent), and backfill mode
    (epoch_id=None) refuses the export."""
    import hashlib

    import pytest as _pytest
    from pyspark.sql import functions as F

    import zebra_spark
    from zebra_spark.io import load
    from zebra_spark.streaming import maintain_pair_tables
    from tests.conftest import SF_SMOKE

    zebra_spark.load_all_queries()

    def vhash(pdf):
        pdf = pdf.reindex(sorted(pdf.columns), axis=1)
        rows = sorted(
            tuple(str(v) for v in r) for r in pdf.itertuples(index=False)
        )
        return hashlib.md5(str(rows).encode()).hexdigest()

    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "text")
    state = str(tmp_path / "state")
    export = str(tmp_path / "export")
    for part in range(3):
        maintain_pair_tables(
            spark, state, docs.filter(F.col("doc_id") % 3 == part),
            epoch_id=part, export_dir=export,
        )

    def read_export():
        return (
            spark.read.option("basePath", export)
            .parquet(export)
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
    assert vhash(read_export()) == vhash(want)

    # crash replay of epoch 1: state AND export both idempotent
    maintain_pair_tables(
        spark, state, docs.filter(F.col("doc_id") % 3 == 1),
        epoch_id=1, export_dir=export,
    )
    assert vhash(read_export()) == vhash(want)

    with _pytest.raises(ValueError, match="epoch mode"):
        maintain_pair_tables(
            spark, str(tmp_path / "state2"), docs.limit(1),
            export_dir=export,
        )
    from zebra_spark.caching import release_caches

    release_caches()


def test_compact_flushes_deferred_label_merges(spark, tmp_path):
    """r11 review: compact_pair_state folds the per-epoch pair dirs
    into one epoch=-1 snapshot, which the watermark-ranged label merge
    (`epoch > wm`) excludes forever — so compaction must FLUSH the
    deferred merges first, or every deferred-but-unmerged epoch's docs
    silently vanish from the labels for good."""
    import hashlib

    from pyspark.sql import functions as F

    from zebra_spark.io import load
    from zebra_spark.streaming import (
        compact_pair_state,
        maintain_pair_tables,
        read_cluster_labels,
    )
    from tests.conftest import SF_SMOKE

    def vhash(pdf):
        pdf = pdf.reindex(sorted(pdf.columns), axis=1)
        rows = sorted(
            tuple(str(v) for v in r) for r in pdf.itertuples(index=False)
        )
        return hashlib.md5(str(rows).encode()).hexdigest()

    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "text")
    lazy = str(tmp_path / "lazy")
    eager = str(tmp_path / "eager")
    for part in range(3):
        batch = docs.filter(F.col("doc_id") % 3 == part)
        maintain_pair_tables(
            spark, lazy, batch, epoch_id=part, clusters=True,
            label_merge_every=10,
        )
        maintain_pair_tables(
            spark, eager, batch, epoch_id=part, clusters=True,
        )
    # epochs 1-2 deferred: the lagging snapshot misses their docs
    assert (
        read_cluster_labels(spark, lazy).count()
        < read_cluster_labels(spark, eager).count()
    )
    compact_pair_state(spark, lazy)
    got = read_cluster_labels(spark, lazy).toPandas()
    want = read_cluster_labels(spark, eager).toPandas()
    assert len(got) == len(want) > 0
    assert vhash(got) == vhash(want)
    from zebra_spark.caching import release_caches

    release_caches()

def test_export_compact_cadence_matches_manual_fold(spark, tmp_path):
    """r12 (VERDICT r11 #3): compact_export_every=K folds the
    strictly-earlier epoch dirs every K-th epoch at the committed
    boundary — the resulting tree is IDENTICAL (epoch dirs, rows,
    offsets manifests) to running without the knob and calling
    export_epoch_compact manually at the same boundary, content is
    unchanged vs a never-compacted run, and the knob refuses to run
    without an export."""
    import hashlib
    import json as _json
    from pathlib import Path

    import pytest as _pytest
    from pyspark.sql import functions as F

    from zebra_spark.io import load
    from zebra_spark.queries.text import (
        _read_epoch_offsets,
        export_epoch_compact,
    )
    from zebra_spark.streaming import maintain_pair_tables
    from tests.conftest import SF_SMOKE

    def vhash(pdf):
        pdf = pdf.reindex(sorted(pdf.columns), axis=1)
        rows = sorted(
            tuple(str(v) for v in r) for r in pdf.itertuples(index=False)
        )
        return hashlib.md5(str(rows).encode()).hexdigest()

    def read_export(export):
        return (
            spark.read.option("basePath", export)
            .parquet(export)
            .select(
                "doc_id",
                F.col("epoch").cast("int").alias("epoch"),
                F.col("shard").cast("int").alias("shard"),
                "pos",
            )
            .toPandas()
        )

    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "text")
    exp_a = str(tmp_path / "exp_cadence")
    exp_b = str(tmp_path / "exp_manual")
    exp_c = str(tmp_path / "exp_never")
    for part in range(6):
        batch = docs.filter(F.col("doc_id") % 6 == part)
        maintain_pair_tables(
            spark, str(tmp_path / "st_a"), batch, epoch_id=part,
            export_dir=exp_a, compact_export_every=3,
        )
        maintain_pair_tables(
            spark, str(tmp_path / "st_b"), batch, epoch_id=part,
            export_dir=exp_b,
        )
        maintain_pair_tables(
            spark, str(tmp_path / "st_c"), batch, epoch_id=part,
            export_dir=exp_c,
        )
        if part == 3:
            # the manual fold at the SAME committed boundary the
            # cadence fires on (after epoch 3's publish, fold <= 2)
            export_epoch_compact(spark, exp_b, 2)

    # cadence fired exactly once: dirs 0,1,2 folded into 2
    assert sorted(
        d.name for d in Path(exp_a).iterdir() if d.is_dir()
    ) == ["epoch=2", "epoch=3", "epoch=4", "epoch=5"]
    a, b, c = read_export(exp_a), read_export(exp_b), read_export(exp_c)
    assert vhash(a) == vhash(b)  # epoch dirs AND rows identical
    assert vhash(a.drop(columns=["epoch"])) == vhash(
        c.drop(columns=["epoch"])
    )  # content/positions untouched by the fold

    # every surviving dir's offsets manifest still matches its files
    for d in sorted(Path(exp_a).glob("epoch=*")):
        got = _read_epoch_offsets(spark, str(d))
        want = {
            int(r["shard"]): int(r["mx"])
            for r in spark.read.parquet(str(d))
            .groupBy(F.col("shard").cast("int").alias("shard"))
            .agg(F.max("pos").alias("mx"))
            .collect()
        }
        assert got == want, d

    with _pytest.raises(ValueError, match="compact_export_every"):
        maintain_pair_tables(
            spark, str(tmp_path / "st_x"), docs.limit(1), epoch_id=0,
            compact_export_every=3,
        )
    from zebra_spark.caching import release_caches

    release_caches()


def test_stream_label_maintenance_idempotent_and_matches_kernel(
    spark, tmp_path
):
    """r13: the streaming label-maintenance trigger
    (maintain_label_table) labels the committed semantic state's
    backlog and appends — idempotent under replay by the anti-join
    (a re-trigger appends zero rows), final labels equal the kernel
    run with the SAME persisted index over the same corpus, takedown
    strips label rows, and a label-seed takedown is refused."""
    import pytest
    from pyspark.sql import functions as F

    from zebra_spark.index.ivf import IVFIndex
    from zebra_spark.io import embeddings_d
    from zebra_spark.queries import dedup as dd
    from zebra_spark.queries.tick import init_label_state
    from zebra_spark.queries.vector import label_prop_ann_df
    from zebra_spark.streaming import (
        init_cosine_state,
        maintain_cosine_tables,
        maintain_label_table,
        read_cosine_state,
        read_label_table,
        remove_from_cosine_state,
    )
    from tests.conftest import SF_ORACLE

    emb = embeddings_d(spark, SF_ORACLE)
    seeds = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("lab_id"), "label", F.col("emb").alias("le")
    )
    e = emb.filter(F.col("vec_id") % 10 != 0).select("vec_id", "emb")
    state = str(tmp_path / "cstate")

    init_cosine_state(spark, state, dd.cosine_seed_table(spark, SF_ORACLE))
    init_label_state(spark, state, seeds)

    # epoch 0 ingests half; trigger labels exactly that half
    maintain_cosine_tables(
        spark, state, e.filter(F.col("vec_id") % 2 == 0), epoch_id=0
    )
    maintain_label_table(spark, state)
    n_half = e.filter(F.col("vec_id") % 2 == 0).count()
    assert read_label_table(spark, state).count() == n_half

    # replay the trigger (restarted stream): zero-row append
    maintain_label_table(spark, state)
    assert read_label_table(spark, state).count() == n_half

    # epoch 1 ingests the rest; the next trigger labels the backlog
    maintain_cosine_tables(
        spark, state, e.filter(F.col("vec_id") % 2 == 1), epoch_id=1
    )
    maintain_label_table(spark, state)
    got = read_label_table(spark, state).toPandas()
    idx = IVFIndex.load(spark, f"{state}/labelidx")
    want = label_prop_ann_df(spark, seeds, e, index=idx).toPandas()
    assert len(got) == len(want) == e.count()
    assert _cosine_vhash(got) == _cosine_vhash(want)

    # takedown strips label rows; label-seed takedown refused.
    # victims must dodge the frozen COSINE seeds (cell_id = source
    # vec_id) or the cosine-seed guard fires first
    cos_seed_ids = spark.read.parquet(f"{state}/seeds").select(
        F.col("cell_id").alias("vec_id")
    )
    victim = (
        e.filter(F.col("vec_id") % 7 == 3)
        .join(cos_seed_ids, "vec_id", "left_anti")
        .limit(10)
        .select("vec_id")
        .localCheckpoint()
    )
    n_victim = victim.count()
    remove_from_cosine_state(spark, state, victim)
    left = read_label_table(spark, state)
    assert left.count() == e.count() - n_victim
    assert left.join(
        victim.withColumnRenamed("vec_id", "v"),
        left.vec_id == F.col("v"), "left_semi",
    ).count() == 0
    # a label seed that is NOT also a cosine seed, so the LABEL guard
    # (not the cosine one) is what fires
    lab_victim = (
        seeds.select(F.col("lab_id").alias("vec_id"))
        .join(cos_seed_ids, "vec_id", "left_anti")
        .limit(1)
        .localCheckpoint()
    )
    assert lab_victim.count() == 1
    with pytest.raises(ValueError, match="label seeds"):
        remove_from_cosine_state(spark, state, lab_victim)
    from zebra_spark.caching import release_caches

    release_caches()


def test_proplabels_swap_recovery(spark, tmp_path):
    """ADVICE r13: proplabels is swapped by the takedown path but is
    NOT in COSINE_STATE_TABLES, so its crashed swaps were never
    repaired — a crash mid-swap left the live dir absent with
    __compact residue forever: read_label_table then failed and the
    next maintain_label_table silently paid a full-corpus
    re-propagation.  All three entry points (read_label_table,
    maintain_label_table, remove_from_cosine_state) now front the
    proplabels swap recovery."""
    import shutil
    from pathlib import Path as _P

    from pyspark.sql import functions as F

    from zebra_spark.io import embeddings_d
    from zebra_spark.queries import dedup as dd
    from zebra_spark.queries.tick import init_label_state
    from zebra_spark.streaming import (
        init_cosine_state,
        maintain_cosine_tables,
        maintain_label_table,
        read_label_table,
        remove_from_cosine_state,
    )
    from tests.conftest import SF_SMOKE

    emb = embeddings_d(spark, SF_SMOKE)
    seeds = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("lab_id"), "label", F.col("emb").alias("le")
    )
    e = emb.filter(F.col("vec_id") % 10 != 0).select("vec_id", "emb")
    state = str(tmp_path / "cstate")
    init_cosine_state(spark, state, dd.cosine_seed_table(spark, SF_SMOKE))
    init_label_state(spark, state, seeds)
    maintain_cosine_tables(spark, state, e, epoch_id=0)
    maintain_label_table(spark, state)
    n = e.count()
    assert read_label_table(spark, state).count() == n

    p = _P(f"{state}/proplabels")

    def crash_mid_swap():
        # the _snapshot_and_swap window between rename(p, old) and
        # rename(tmp, p): staged snapshot complete, live dir absent
        shutil.copytree(p, f"{p}__compact")
        p.rename(f"{p}__old")

    # 1. reader lands in the window: repaired, not a missing-path error
    crash_mid_swap()
    assert read_label_table(spark, state).count() == n
    assert p.exists()
    assert not _P(f"{p}__compact").exists() and not _P(f"{p}__old").exists()

    # 2. maintainer lands in the window: repaired FIRST, so the backlog
    # anti-join sees the live table and appends zero rows instead of
    # re-propagating the whole corpus
    crash_mid_swap()
    maintain_label_table(spark, state)
    assert read_label_table(spark, state).count() == n
    assert not _P(f"{p}__compact").exists() and not _P(f"{p}__old").exists()

    # 3. the takedown path lands in the window: repaired, then swapped
    cos_seed_ids = spark.read.parquet(f"{state}/seeds").select(
        F.col("cell_id").alias("vec_id")
    )
    victim = (
        e.join(cos_seed_ids, "vec_id", "left_anti")
        .join(
            seeds.select(F.col("lab_id").alias("vec_id")),
            "vec_id", "left_anti",
        )
        .limit(5)
        .select("vec_id")
        .localCheckpoint()
    )
    n_victim = victim.count()
    crash_mid_swap()
    remove_from_cosine_state(spark, state, victim)
    assert read_label_table(spark, state).count() == n - n_victim
    assert not _P(f"{p}__compact").exists() and not _P(f"{p}__old").exists()

    # 4. post-commit residue (live dir present, stale __compact/__old
    # leftovers): discarded, rows unchanged
    shutil.copytree(p, f"{p}__compact")
    shutil.copytree(p, f"{p}__old")
    assert read_label_table(spark, state).count() == n - n_victim
    assert not _P(f"{p}__compact").exists() and not _P(f"{p}__old").exists()
    from zebra_spark.caching import release_caches

    release_caches()
