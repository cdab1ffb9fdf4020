"""Deduplication suite (north-star training-data ops): MinHash+LSH,
SimHash, character-n-gram Jaccard, embedding-cosine closest pairs.
Exact dedup lives in queries.vector (q_dedup_exact).

Every op here is deterministic and hash-checked against DuckDB: hash
permutations are explicit polynomials ((a_j*tid + b_j) mod p) over dense
token ids, not engine hash functions, so both engines compute identical
signatures.

Scale posture: MinHash is the scale path for near-dedup — candidate
pairs come from band-bucket equi-joins (shuffle on the band key), never
from a quadratic self-join; the quadratic token-join variant
(q_text_jaccard_pairs) is bounded by its blocking key.  Token ids are a
per-row polynomial string hash (word_hash_expr) computed identically on
both engines — no vocabulary join, no global window, embarrassingly
parallel at any corpus size.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile
import threading
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zebra_spark import functions as zf
from zebra_spark.functions import rnd
from zebra_spark.io import embeddings_d, spread_scan
from zebra_spark.queries.text import (
    _SQL_SHARD_HASH,
    N_SHARDS,
    sql_word_hash,
    tokens,
    word_hash_expr,
)
from zebra_spark.caching import cache_scope, tracked_persist
from zebra_spark.registry import QUERIES, query, sql_rnd

P = 2_147_483_647  # 2^31 - 1
N_HASHES = 16
N_BANDS = 4  # 4 rows per band
MINHASH_THRESHOLD = 0.5

_SQL_TOK = f"""
    tok AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS word
      FROM documents
    ),
    t2 AS (SELECT doc_id, {sql_word_hash('word')} AS tid FROM tok),
    params AS (
      SELECT CAST(j AS INTEGER) AS j, 2*j + 1 AS a, 17*j + 29 AS b
      FROM range(0, {{nh}}) t(j)
    )
"""


def _token_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = tokens(spark, sf_dir, distinct=True).select("doc_id", "word")
    return tok.select("doc_id", word_hash_expr("word").alias("tid"))


def _minhash_sigs(
    spark: SparkSession,
    sf_dir: str,
    n_hashes: int = N_HASHES,
    n_bands: int = N_BANDS,
) -> DataFrame:
    """(doc_id, band, key): banded MinHash signatures.

    Two formulations, picked by permutation count (both measured at
    sf0.1, bit-identical output):

    - n_hashes <= 32: PER-ROW native array expressions (token-id array
      materialized once per doc, then n_hashes array_min permutation
      scans) — ZERO shuffle; 0.97-2.67 s -> 0.24-0.43 s for the 16/4
      config.  Same expressions as the streaming screen, so batch and
      stream signatures are one code path.
    - wider configs: the explode -> crossJoin(params) -> two-groupBys
      chain.  At 128 permutations the per-row expression re-scans the
      token array 128 times per doc and LOSES to the shuffle it avoids
      (q_dedup_minhash128: 29 -> 41 s per-row, reverted) — per-row
      work scales with n_hashes x tokens, the grouped chain's shuffle
      scales with tokens only.

    The DuckDB oracle keeps the grouped formulation — same arithmetic,
    same results either way."""
    if n_hashes <= 32:
        from zebra_spark.io import load

        return batch_signatures(
            load(spark, sf_dir, "documents"), n_hashes, n_bands
        )
    t2 = _token_ids(spark, sf_dir)
    params = spark.createDataFrame(
        [(j, 2 * j + 1, 17 * j + 29) for j in range(n_hashes)],
        "j int, a bigint, b bigint",
    )
    mh = (
        t2.crossJoin(F.broadcast(params))
        .groupBy("doc_id", "j")
        .agg(F.min((F.col("a") * F.col("tid") + F.col("b")) % P).alias("mh"))
    )
    rows_per_band = n_hashes // n_bands
    return (
        mh.withColumn("band", F.floor(F.col("j") / rows_per_band).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("j", "mh"))),
                    lambda x: x.mh.cast("string"),
                ),
            ).alias("key")
        )
    )


_SQL_SIGS = f"""
    mh AS (
      SELECT doc_id, j, min((a * tid + b) % {P}) AS mh
      FROM t2 CROSS JOIN params
      GROUP BY doc_id, j
    ),
    sigs AS (
      SELECT doc_id, CAST(floor(j / {N_HASHES // N_BANDS}) AS INTEGER) AS band,
             string_agg(mh::VARCHAR, ',' ORDER BY j) AS key
      FROM mh GROUP BY doc_id, band
    )
"""

# sz/inter are AS MATERIALIZED (DuckDB): downstream oracles reference
# them 2-3x (the jaccard filter joins sz twice; the closure/pagerank/
# triangles class fans out over edges), and DuckDB 1.0 re-executes a
# plain CTE per reference — at sf0.1 that re-execution was the >80 GB
# spill that kept these oracles out of the full sweep (r15).
# MATERIALIZED only pins the execution strategy; results are identical.
_SQL_MINHASH_CORE = f"""
    {_SQL_SIGS.strip()},
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sigs a JOIN sigs b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    ),
    sz AS MATERIALIZED (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
    inter AS MATERIALIZED (
      SELECT c.doc_a, c.doc_b, count(*) AS n_common
      FROM cand c
      JOIN tok ta ON ta.doc_id = c.doc_a
      JOIN tok tb ON tb.doc_id = c.doc_b AND tb.word = ta.word
      GROUP BY c.doc_a, c.doc_b
    )
"""


@query(
    "q_dedup_minhash",
    oracle=f"""
    WITH {_SQL_TOK.format(nh=N_HASHES)},
    {_SQL_MINHASH_CORE}
    SELECT i.doc_a, i.doc_b, i.n_common,
           {sql_rnd("i.n_common * 1.0 / (sa.n + sb.n - i.n_common)")} AS jaccard
    FROM inter i
    JOIN sz sa ON sa.doc_id = i.doc_a
    JOIN sz sb ON sb.doc_id = i.doc_b
    WHERE i.n_common * 1.0 / (sa.n + sb.n - i.n_common) >= {MINHASH_THRESHOLD}
    """,
)
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH banding near-dedup: shingle(word)->minhash->band->
    bucket-join candidates->true-Jaccard verify.  16 explicit polynomial
    permutations, 4 bands x 4 rows."""
    return _minhash_pairs(spark, sf_dir, N_HASHES, N_BANDS)


def _minhash_scored(
    spark: SparkSession,
    sf_dir: str,
    n_hashes: int,
    n_bands: int,
    max_bucket: int | None = None,
) -> DataFrame:
    """(doc_a, doc_b, n_common, na, nb) for every verified band-join
    candidate pair — the shared core of q_dedup_minhash (Jaccard
    scoring) and q_text_containment (containment scoring)."""
    # Candidates via band-key EQUI-JOIN (not per-key member-list
    # explode): both shapes emit the same g^2/2 pairs per colliding
    # key, but the join lets AQE's skew-join splitting spread a hot
    # band key across tasks, while a groupBy/explode pins each key's
    # whole pair fan-out to one task (measured slower on the
    # saturation-dense fixture).  Both join sides read the sig_table
    # parquet (since r6) — a scan with stats, so every downstream
    # broadcast decision is preserved; the r3-r5 decision tree for this
    # frame (localCheckpoint REJECTED for stats loss, persist adopted,
    # then the parquet table) is recorded in ARCHITECTURE.md
    # "Materializing a twice-referenced frame".
    #
    # The join key is xxhash64(band, key) — a bigint — instead of the
    # ~40-char signature string: less shuffle volume and cheaper
    # compares (r4 interleaved A/B at sf0.1: candidates 12-15.7 s ->
    # 10.3 s).  A 2^-64 hash collision can only ADD a false candidate,
    # which the exact-Jaccard verify below then drops — correctness is
    # unaffected by construction.
    sigs = sig_table(spark, sf_dir, n_hashes, n_bands)
    keyed = sigs.select("doc_id", F.xxhash64("band", "key").alias("bk"))
    if max_bucket is not None:
        # Giant-bucket guard for extreme scale (SCALING.md "Near-dup
        # pipeline at 10x input"): a single g-member bucket emits
        # g(g-1)/2 candidate rows, so one degenerate key can dominate
        # the whole stage (measured: one 28.7k bucket = 412M of 1.88G
        # pair rows at 10x).  Buckets above the cap are dropped BEFORE
        # pair generation; a true near-dup pair that only collided in a
        # dropped bucket can still be found via its other n_bands-1
        # bands, so recall degrades by at most one band's worth —
        # measured on the planted-duplicate corpus in
        # scripts/dedup_scale_check.py.  None (the oracled default)
        # keeps exact all-pairs semantics.
        ok = (
            keyed.groupBy("bk")
            .agg(F.count(F.lit(1)).alias("g"))
            .filter(F.col("g") <= max_bucket)
            .select("bk")
        )
        keyed = keyed.join(ok, "bk", "left_semi")
    # probe side spread across the cluster BEFORE the g^2 band-bucket
    # expansion (see _spread) — the build side stays a plain scan so
    # its broadcast decision is untouched
    a = _spread(keyed, "doc_id").select(F.col("doc_id").alias("doc_a"), "bk")
    b = keyed.select(F.col("doc_id").alias("doc_b"), F.col("bk").alias("bk_b"))
    cand = (
        a.join(
            b,
            (F.col("bk") == F.col("bk_b")) & (F.col("doc_a") < F.col("doc_b")),
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    # verify: join each candidate pair to the two docs' token sets and
    # count the overlap — one row per pair through the join, instead of
    # exploding (pair x shared word) rows into a shuffle (the fixture
    # has ~100 shared words per pair, so that explode would be two
    # orders of magnitude more rows)
    return _verify_scored(cand, tokset_table(spark, sf_dir))


# --- shared near-dup pair table ---------------------------------------------
#
# The scored candidate-pair frame is the single most expensive artifact
# in the suite (~21 s at sf0.1) and FIVE consumers need it: the Jaccard
# threshold (q_dedup_minhash), containment scoring (q_text_containment),
# sketch calibration, connected components (q_dedup_clusters ->
# q_split_leakage_safe), and PageRank (q_graph_pagerank).  Recomputing
# it per query is correct but wasteful — at 100 TB the near-dup pair
# table is computed ONCE per corpus snapshot and every downstream op
# reads it (VERDICT r5 #1).  pair_table() materializes the scored frame
# to parquet once per (dataset, config) per session and hands every
# consumer a scan of the same files; results are bit-identical to the
# inline pipeline because the computation is deterministic and the
# parquet round-trip preserves exact values (longs + exact int sizes).

_DERIVED: dict[tuple, str] = {}
# paths whose parquet files THIS module materialized into its own
# tempdirs (vs externally registered maintained tables, which the
# registry must never delete) — restore_derived_registry reclaims
# these eagerly instead of leaving corpus-sized orphans until atexit
_OWNED_PATHS: set[str] = set()
# RLock: builds nest (pair_table's build reads sig_table/tokset_table),
# so the building thread re-enters; other threads still serialize
_DERIVED_LOCK = threading.RLock()


def _derived_table(spark: SparkSession, key: tuple, build) -> DataFrame:
    """Session-scoped derived-table registry: build() is materialized to
    parquet the first time `key` is seen and every later caller reads
    the same files.  The fixture datasets are immutable, so there is no
    invalidation concern; a pipeline over evolving data would key by
    corpus-snapshot id instead.  Thread-safe: the parity sweep and the
    bench suite run queries concurrently, and all consumers of one key
    must see a single build."""
    # double-checked: a built table's readers must not serialize behind
    # an unrelated key's (long) build — the registry dict is only ever
    # grown, and entries are published AFTER their files exist
    path = _DERIVED.get(key)
    if path is None:
        with _DERIVED_LOCK:
            path = _DERIVED.get(key)
            if path is None:
                base = tempfile.mkdtemp(prefix="zebra_derived_")
                atexit.register(shutil.rmtree, base, ignore_errors=True)
                path = f"{base}/data"
                _OWNED_PATHS.add(path)
                # the build's internal persists (signatures, token sets,
                # assignment blocks) are scoped to the build: the parquet
                # write is their terminal action, so they must not linger
                # until the caller's harness-level release
                with cache_scope():
                    build().write.mode("overwrite").parquet(path)
                _DERIVED[key] = path
    df = spark.read.parquet(path)
    if "epoch" in df.columns:
        # a register_maintained_table path may be a streaming state
        # table in the exactly-once epoch=N layout; the epoch is a
        # write-side commit marker, not part of any consumer's schema
        df = df.drop("epoch")
    return df


def _spread(df: DataFrame, *cols: str) -> DataFrame:
    """Hash-repartition a collision join's PROBE side to the session's
    default parallelism before the pair expansion (r17 optimization
    pass, guide §2.5 input skew / §2.2).

    Every bucket/cell-collision join in this module amplifies its probe
    rows by the colliding group's size (g(g-1)/2 pairs per g-member
    key), but the probe side is typically a compact scan — a few
    parquet row groups, or an AQE-coalesced tiny aggregate — so the
    ENTIRE multi-million-row expansion and its map-side dedup ran in
    1-2 tasks while the other 30 cores idled (measured at sf0.1: the
    full band-join candidate stage 9.7 s -> 0.7 s with this spread).
    The shuffle this adds moves only the narrow pre-expansion rows
    (16-24 B each) — negligible against the pair volume it
    parallelizes, at any scale — and hash partitioning by the row key
    spreads each bucket's members across tasks, which also de-skews
    hot buckets.  Deterministic (hash of the key columns, never
    round-robin), so results are unchanged."""
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, *[F.col(c) for c in cols])


def _verify_scored(cand: DataFrame, toksets: DataFrame) -> DataFrame:
    """(doc_a, doc_b, n_common, na, nb) for candidate pairs `cand`
    against the (doc_id, words) token sets — THE verify kernel shared
    by the full pair-table build (_minhash_scored) and the delta path
    (pair_table_delta), so the two cannot drift.

    r17 optimization pass (guide §2.3 "narrower types" + §1.2
    per-task work): the intersection runs over xxhash64(word) LONG
    arrays instead of the raw string arrays — array_intersect on
    longs avoids per-element UTF8 hashing/equality inside the hottest
    per-row kernel in the suite (~7.7M candidate pairs x ~100-element
    arrays at sf0.1; measured A/B in OPTIMIZATION_r17.md).  The
    transform runs once per doc on the (small, broadcast) tokset side,
    not per pair.  n_common is EXACT as long as xxhash64 is injective
    on the corpus vocabulary: tests/test_dedup.py::
    test_vocab_hash_collision_free pins that for every fixture corpus
    (so every oracle hash is byte-identical by construction), and at
    production scale a collision adds 2^-64-probability overcount to
    one pair's n_common — far below the sketch noise the Jaccard
    verify already tolerates.  na/nb are the array sizes, unchanged
    (transform preserves length; words are distinct per doc)."""
    hashed = toksets.select(
        "doc_id",
        F.transform("words", lambda w: F.xxhash64(w)).alias("wh"),
    )
    ta = hashed.select(F.col("doc_id").alias("doc_a"), F.col("wh").alias("wa"))
    tb = hashed.select(F.col("doc_id").alias("doc_b"), F.col("wh").alias("wb"))
    return (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("wa", "wb")).cast("bigint").alias("n_common"),
            F.size("wa").alias("na"),
            F.size("wb").alias("nb"),
        )
    )


def batch_signatures(
    docs: DataFrame,
    n_hashes: int = N_HASHES,
    n_bands: int = N_BANDS,
) -> DataFrame:
    """(doc_id, band, key): banded MinHash signatures for ONE frame of
    (doc_id, text, ...) rows — per-row native expressions (token-id
    array materialized once per row, then n_hashes array_min
    permutation scans), ZERO shuffle.  This is THE signature kernel:
    the full build (_minhash_sigs), the streaming screen
    (streaming.minhash_band_keys callers) and the chained tick's
    per-batch append (queries.tick) all produce rows through these
    expressions, so batch == stream == tick signatures by construction
    and an ingest batch's signatures are exactly the rows a full
    rebuild would hold for those docs."""
    from zebra_spark.streaming import minhash_band_keys, token_ids_expr

    return (
        docs.select("doc_id", token_ids_expr("text").alias("tids"))
        .select(
            "doc_id",
            F.explode(
                minhash_band_keys("tids", n_hashes, n_bands)
            ).alias("b"),
        )
        .select(
            "doc_id",
            F.col("b.band").alias("band"),
            F.col("b.key").alias("key"),
        )
    )


def batch_toksets(docs: DataFrame) -> DataFrame:
    """(doc_id, words sorted array): per-doc distinct token sets for
    ONE frame of (doc_id, text, ...) rows — the per-row twin of
    tokset_table's grouped build (array_distinct(split) == the distinct
    exploded words; array_sort fixes one order for both), shared by the
    full build and the chained tick's per-batch append so verify-stage
    inputs cannot drift between the two paths.  Per-row means ZERO
    shuffle: the grouped formulation's explode → groupBy(collect_set)
    re-shuffles every token, this touches none."""
    return docs.select(
        "doc_id",
        F.array_sort(F.array_distinct(F.split("text", " "))).alias("words"),
    )


def derived_registry_snapshot() -> dict:
    """Copy of the session's derived-table registry — pair with
    restore_derived_registry to drop everything registered AFTER a
    known point.  The bench harness uses this for isolated trials
    (VERDICT r9 #4): a hotspot trial that reads a derived artifact some
    EARLIER query materialized (e.g. cluster labels) prices a cache
    hit, not the query — so each trial restores the registry to the
    post-shared-builds snapshot first."""
    with _DERIVED_LOCK:
        return dict(_DERIVED)


def restore_derived_registry(snapshot: dict) -> None:
    """Drop every derived-table key not present in `snapshot`, and
    DELETE the dropped artifacts' files when this module owns them
    (module-built tempdirs; re-registration just rebuilds) — the
    bench's isolated trials call this dozens of times, and popping the
    key while leaving corpus-sized parquet behind until atexit can
    fill the disk mid-run (r10 review).  Externally registered
    maintained paths are never deleted.  Keys in the snapshot keep
    their paths — shared artifacts priced by their own build rows stay
    warm."""
    with _DERIVED_LOCK:
        for key in [k for k in _DERIVED if k not in snapshot]:
            path = _DERIVED.pop(key, None)
            if path in _OWNED_PATHS:
                _OWNED_PATHS.discard(path)
                # the owned layout is <tempdir>/data — reclaim the dir
                shutil.rmtree(str(Path(path).parent), ignore_errors=True)


def sig_table(
    spark: SparkSession,
    sf_dir: str,
    n_hashes: int = N_HASHES,
    n_bands: int = N_BANDS,
) -> DataFrame:
    """(doc_id, band, key): the banded MinHash signatures, materialized
    once per (dataset, config) per session.  Both sides of the
    candidate band-join and the incremental screen read these files; a
    parquet scan carries stats, so (unlike a localCheckpoint cut) every
    downstream broadcast decision is preserved."""
    key = ("sigs", str(Path(sf_dir).resolve()), n_hashes, n_bands)
    return _derived_table(
        spark, key, lambda: _minhash_sigs(spark, sf_dir, n_hashes, n_bands)
    )


def tokset_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, words sorted array): per-doc distinct token sets — the
    verify-stage input shared by the pair-table build and the
    incremental screen.  Built through the per-row batch_toksets kernel
    (r10): bit-identical to the earlier explode → collect_set →
    array_sort chain, but with zero shuffle — the distinct-and-sort
    happens inside each row."""

    def build() -> DataFrame:
        from zebra_spark.io import load

        return batch_toksets(load(spark, sf_dir, "documents"))

    key = ("toksets", str(Path(sf_dir).resolve()))
    return _derived_table(spark, key, build)


def pair_table(
    spark: SparkSession,
    sf_dir: str,
    n_hashes: int = N_HASHES,
    n_bands: int = N_BANDS,
    max_bucket: int | None = None,
) -> DataFrame:
    """(doc_a, doc_b, n_common, na, nb): the verified MinHash candidate
    pairs for `sf_dir`, materialized once per (dataset, sketch config)
    per session and shared by every consumer (see _derived_table)."""
    key = ("minhash", str(Path(sf_dir).resolve()), n_hashes, n_bands, max_bucket)
    return _derived_table(
        spark,
        key,
        lambda: _minhash_scored(spark, sf_dir, n_hashes, n_bands, max_bucket),
    )


def pair_table_delta(
    spark: SparkSession,
    sf_dir: str,
    new_ids: DataFrame,
    n_hashes: int = N_HASHES,
    n_bands: int = N_BANDS,
    max_bucket: int | None = None,
) -> DataFrame:
    """Incremental pair-table maintenance: the scored pairs INVOLVING at
    least one doc from `new_ids` (one column `doc_id`) — exactly the
    rows a full pair_table() rebuild would add for an ingest batch, so
    the maintained table is `old_pairs UNION delta` with no old-vs-old
    recompute.  Cost scales with |batch| x bucket sizes, never with
    |corpus|^2: the batch side of the band join is new signatures only,
    the corpus side reads the shared sig_table parquet.  Equivalence to
    the batch rebuild (delta == new-involving slice of the full table)
    is pinned by tests/test_dedup.py::test_pair_table_delta.

    At 100 TB this is the per-snapshot update path: signatures for the
    batch append to the signature table, this delta appends to the pair
    table, and every downstream consumer (clusters, PageRank, splits)
    re-reads the maintained tables.

    `max_bucket` applies the same giant-bucket guard as the capped
    rebuild (_minhash_scored), with bucket sizes counted over the FULL
    post-batch signature table — so the delta for a capped config is
    exactly the new-involving slice of a capped rebuild AT THIS
    SNAPSHOT (ADVICE r6: without the guard, batch docs landing in
    over-cap buckets emitted pairs a capped rebuild would drop).  One
    caveat is inherent to append-only maintenance: when a batch pushes
    a bucket OVER the cap, pairs that earlier deltas emitted from that
    bucket (while it was under cap) are not retracted — the maintained
    table is then a superset of the rebuild until the next
    compaction/rebuild.  The equivalence test covers both the uncapped
    default and a binding cap (tests/test_dedup.py)."""
    keyed = (
        sig_table(spark, sf_dir, n_hashes, n_bands)
        .select("doc_id", F.xxhash64("band", "key").alias("bk"))
    )
    if max_bucket is not None:
        ok = (
            keyed.groupBy("bk")
            .agg(F.count(F.lit(1)).alias("g"))
            .filter(F.col("g") <= max_bucket)
            .select("bk")
        )
        keyed = keyed.join(ok, "bk", "left_semi")
    # probe side spread before the band-bucket expansion (see _spread)
    newk = _spread(
        keyed.join(new_ids.select("doc_id"), "doc_id", "left_semi"),
        "doc_id",
    ).select(F.col("doc_id").alias("doc_n"), "bk")
    other = keyed.select(F.col("doc_id").alias("doc_o"), F.col("bk").alias("bk_o"))
    # band-collide new x all, normalize to (doc_a < doc_b); pairs where
    # BOTH endpoints are new appear from either side — distinct dedups
    cand = (
        newk.join(
            other,
            (F.col("bk") == F.col("bk_o")) & (F.col("doc_n") != F.col("doc_o")),
        )
        .select(
            F.least("doc_n", "doc_o").alias("doc_a"),
            F.greatest("doc_n", "doc_o").alias("doc_b"),
        )
        .distinct()
    )
    return _verify_scored(cand, tokset_table(spark, sf_dir))


@query(
    "q_pair_table_delta",
    oracle=f"""
    WITH {_SQL_TOK.format(nh=N_HASHES)},
    {_SQL_MINHASH_CORE}
    SELECT i.doc_a, i.doc_b, i.n_common, sa.n AS na, sb.n AS nb
    FROM inter i
    JOIN sz sa ON sa.doc_id = i.doc_a
    JOIN sz sb ON sb.doc_id = i.doc_b
    WHERE i.doc_a % 10 = 0 OR i.doc_b % 10 = 0
    """,
)
def q_pair_table_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incremental-maintenance path itself, driver-hash-checked:
    pair_table_delta for the doc_id % 10 == 0 ingest batch must equal
    the new-involving slice of a full rebuild — the oracle computes
    that slice from scratch (full band join, then the slice filter), so
    a delta that misses or invents a pair breaks the hash.  This
    promotes the r6 contract from pytest-only to the driver gate."""
    from zebra_spark.io import load

    new_ids = (
        load(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") % 10 == 0)
    )
    return pair_table_delta(spark, sf_dir, new_ids).select(
        "doc_a",
        "doc_b",
        "n_common",
        F.col("na").cast("bigint").alias("na"),
        F.col("nb").cast("bigint").alias("nb"),
    )


def _minhash_pairs(
    spark: SparkSession,
    sf_dir: str,
    n_hashes: int,
    n_bands: int,
    max_bucket: int | None = None,
) -> DataFrame:
    scored = pair_table(spark, sf_dir, n_hashes, n_bands, max_bucket)
    jac = F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common"))
    return (
        scored.filter(jac >= MINHASH_THRESHOLD)
        .select("doc_a", "doc_b", "n_common", rnd(jac).alias("jaccard"))
    )


@query(
    "q_sketch_calibration",
    oracle=f"""
    WITH {_SQL_TOK.format(nh=N_HASHES)},
    {_SQL_MINHASH_CORE},
    estp AS (
      SELECT c.doc_a, c.doc_b,
             CAST(sum(CASE WHEN ma.mh = mb.mh THEN 1 ELSE 0 END) AS DOUBLE)
               / {N_HASHES} AS est
      FROM cand c
      JOIN mh ma ON ma.doc_id = c.doc_a
      JOIN mh mb ON mb.doc_id = c.doc_b AND mb.j = ma.j
      GROUP BY c.doc_a, c.doc_b
    ),
    ex AS (
      SELECT i.doc_a, i.doc_b,
             i.n_common * 1.0 / (sa.n + sb.n - i.n_common) AS jac
      FROM inter i
      JOIN sz sa ON sa.doc_id = i.doc_a
      JOIN sz sb ON sb.doc_id = i.doc_b
    )
    SELECT e.est, count(*) AS n_pairs,
           {sql_rnd("avg(coalesce(x.jac, 0.0))")} AS mean_jaccard,
           {sql_rnd("avg(abs(e.est - coalesce(x.jac, 0.0)))")} AS mean_abs_err
    FROM estp e
    LEFT JOIN ex x ON x.doc_a = e.doc_a AND x.doc_b = e.doc_b
    GROUP BY e.est
    """,
)
def q_sketch_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch calibration: for every banded candidate pair, the MinHash
    ESTIMATE (matching signature components / {N_HASHES}) against the
    exact Jaccard, bucketed by estimate value — the measure-don't-guess
    audit of the sketch itself (is 16 permutations enough at this
    corpus's similarity distribution? what absolute error does each
    estimate level carry?).  At 100 TB this is how you justify the
    permutation count before a full dedup run: candidates come from the
    same banded equi-join as production, the signature vectors are
    per-row expressions, and the output is ≤ {N_HASHES}+1 bucket rows.

    The estimate buckets are exact multiples of 1/{N_HASHES} (discrete
    group-by key, no float binning); pairs whose candidate collision
    came from disjoint token sets score exact Jaccard 0.  Note: unlike
    the thresholded consumers (q_dedup_minhash / q_text_containment),
    this query keeps every candidate, so the xxhash64 band-key's
    false-candidate residual is not filtered out downstream — a 64-bit
    key collision (~2^-64 per signature pair) would add one pair row
    the string-keyed oracle lacks.  Accepted: it is astronomically
    rare, and a calibration histogram is statistics, not membership."""
    from zebra_spark.io import load
    from zebra_spark.streaming import token_ids_expr

    mh_exprs = ", ".join(
        f"array_min(transform(tids, t -> ({2 * j + 1} * t + {17 * j + 29})"
        f" % {P}))"
        for j in range(N_HASHES)
    )
    sig = load(spark, sf_dir, "documents").select(
        "doc_id", token_ids_expr("text").alias("tids")
    ).select("doc_id", F.expr(f"array({mh_exprs})").alias("sig"))
    scored = pair_table(spark, sf_dir, N_HASHES, N_BANDS)
    jac = F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common"))
    est = F.expr(
        "CAST(aggregate(zip_with(sa, sb,"
        " (x, y) -> CASE WHEN x = y THEN 1 ELSE 0 END),"
        f" 0, (acc, v) -> acc + v) AS DOUBLE) / {N_HASHES}"
    )
    pairs = (
        scored.join(
            sig.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sa")),
            "doc_a",
        )
        .join(
            sig.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sb")),
            "doc_b",
        )
        .select(est.alias("est"), jac.alias("jac"))
    )
    return pairs.groupBy("est").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        rnd(F.avg("jac")).alias("mean_jaccard"),
        rnd(F.avg(F.abs(F.col("est") - F.col("jac")))).alias("mean_abs_err"),
    )


CONTAINMENT_THRESHOLD = 0.9


@query(
    "q_text_containment",
    oracle=f"""
    WITH {_SQL_TOK.format(nh=N_HASHES)},
    {_SQL_MINHASH_CORE}
    SELECT i.doc_a, i.doc_b, i.n_common,
           {sql_rnd("i.n_common * 1.0 / least(sa.n, sb.n)")} AS containment
    FROM inter i
    JOIN sz sa ON sa.doc_id = i.doc_a
    JOIN sz sb ON sb.doc_id = i.doc_b
    WHERE i.n_common * 1.0 / least(sa.n, sb.n) >= {CONTAINMENT_THRESHOLD}
    """,
)
def q_text_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-CONTAINMENT detection: |A∩B| / min(|A|,|B|) over the same
    banded-MinHash candidate pairs as q_dedup_minhash — catches a short
    doc embedded in a longer one (quote farms, boilerplate wrappers,
    concatenated dumps), which symmetric Jaccard misses because the
    union is dominated by the longer side.  Same machinery end to end
    (signatures, band equi-join, array_intersect verify); only the
    final scoring expression differs, so the scale posture is identical
    to the flagship pipeline."""
    scored = pair_table(spark, sf_dir, N_HASHES, N_BANDS)
    cont = F.col("n_common") / F.least(F.col("na"), F.col("nb"))
    return (
        scored.filter(cont >= CONTAINMENT_THRESHOLD)
        .select("doc_a", "doc_b", "n_common", rnd(cont).alias("containment"))
    )


@query(
    "q_dedup_minhash128",
    oracle=f"""
    WITH {_SQL_TOK.format(nh=128)},
    {_SQL_MINHASH_CORE}
    SELECT i.doc_a, i.doc_b, i.n_common,
           {sql_rnd("i.n_common * 1.0 / (sa.n + sb.n - i.n_common)")} AS jaccard
    FROM inter i
    JOIN sz sa ON sa.doc_id = i.doc_a
    JOIN sz sb ON sb.doc_id = i.doc_b
    WHERE i.n_common * 1.0 / (sa.n + sb.n - i.n_common) >= {MINHASH_THRESHOLD}
    """,
)
def q_dedup_minhash128(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production-recall MinHash config: 128 permutations / 32 bands of
    4 rows — detection probability 1-(1-J^4)^32 (0.9997 at J=0.8, vs
    0.91 for the 16/4 demo config).  Everything else — hashed token
    ids, band equi-join candidates, array_intersect verify — is the
    same parameterized machinery as q_dedup_minhash; the cost delta is
    one wider (tokens x 128) map-side aggregation."""
    return _minhash_pairs(spark, sf_dir, n_hashes=128, n_bands=32)


# Giant-bucket guard caps.  MAX_BUCKET_DEFAULT is the measured
# production value (SCALING.md "giant-bucket problem": on the 10x
# saturation corpus 801.9 s -> 4.4 s; on the realistic planted-duplicate
# corpus the cap never fires and recall is unchanged at 0.869).
# CAPPED_BUCKET is deliberately smaller so the oracled twin's filter
# BINDS at the driver's sf0.01 gate (four 388-member band buckets are
# dropped there; 66,611 -> 1,420 pairs) — a cap the gate never exercises
# would pin nothing.
MAX_BUCKET_DEFAULT = 1000
CAPPED_BUCKET = 100

_SQL_MINHASH_CORE_CAPPED = f"""
    {_SQL_SIGS.strip()},
    okb AS (
      SELECT band, key FROM sigs GROUP BY band, key
      HAVING count(*) <= {CAPPED_BUCKET}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sigs a
      JOIN okb ON okb.band = a.band AND okb.key = a.key
      JOIN sigs b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    ),
    sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
    inter AS (
      SELECT c.doc_a, c.doc_b, count(*) AS n_common
      FROM cand c
      JOIN tok ta ON ta.doc_id = c.doc_a
      JOIN tok tb ON tb.doc_id = c.doc_b AND tb.word = ta.word
      GROUP BY c.doc_a, c.doc_b
    )
"""


@query(
    "q_dedup_minhash_capped",
    oracle=f"""
    WITH {_SQL_TOK.format(nh=N_HASHES)},
    {_SQL_MINHASH_CORE_CAPPED}
    SELECT i.doc_a, i.doc_b, i.n_common,
           {sql_rnd("i.n_common * 1.0 / (sa.n + sb.n - i.n_common)")} AS jaccard
    FROM inter i
    JOIN sz sa ON sa.doc_id = i.doc_a
    JOIN sz sb ON sb.doc_id = i.doc_b
    WHERE i.n_common * 1.0 / (sa.n + sb.n - i.n_common) >= {MINHASH_THRESHOLD}
    """,
)
def q_dedup_minhash_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_dedup_minhash with the giant-bucket guard ACTIVE — the
    production configuration for corpora where oversized band buckets
    are degenerate (boilerplate, empty docs, template spam): buckets
    with more than {CAPPED_BUCKET} members are dropped BEFORE the
    quadratic pair fan-out, on both engines, so the guard's exact
    semantics (filter on bucket size, not on pairs) are oracle-pinned
    rather than only scale-script-verified (VERDICT r5 #5).

    Recall bound (SCALING.md "giant-bucket problem"): a true near-dup
    pair that only collided inside a dropped bucket can still be found
    through any of its other {N_BANDS - 1} bands, so per-pair the loss
    is at most one band's detection mass; measured on the realistic
    planted-duplicate corpus the cap (at the production value
    {MAX_BUCKET_DEFAULT}) never fires and recall is identical to
    uncapped.  This oracled twin uses the smaller cap {CAPPED_BUCKET}
    so the filter demonstrably binds at the sf0.01 gate."""
    return _minhash_pairs(
        spark, sf_dir, N_HASHES, N_BANDS, max_bucket=CAPPED_BUCKET
    )


@query(
    "q_dedup_incremental",
    oracle=f"""
    WITH {_SQL_TOK.format(nh=N_HASHES)},
    {_SQL_SIGS.strip()},
    bs AS (SELECT * FROM sigs WHERE doc_id % 10 = 0),
    cs AS (SELECT * FROM sigs WHERE doc_id % 10 <> 0),
    cand AS (
      SELECT DISTINCT b.doc_id AS doc_b, c.doc_id AS doc_c
      FROM bs b JOIN cs c ON b.band = c.band AND b.key = c.key
    ),
    sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
    inter AS (
      SELECT c.doc_b, c.doc_c, count(*) AS n_common
      FROM cand c
      JOIN tok ta ON ta.doc_id = c.doc_b
      JOIN tok tb ON tb.doc_id = c.doc_c AND tb.word = ta.word
      GROUP BY c.doc_b, c.doc_c
    ),
    scored AS (
      SELECT i.doc_b, i.doc_c,
             i.n_common * 1.0 / (sa.n + sb.n - i.n_common) AS j
      FROM inter i
      JOIN sz sa ON sa.doc_id = i.doc_b
      JOIN sz sb ON sb.doc_id = i.doc_c
      WHERE i.n_common * 1.0 / (sa.n + sb.n - i.n_common)
            >= {MINHASH_THRESHOLD}
    ),
    best AS (
      SELECT doc_b, doc_c, j,
             row_number() OVER (PARTITION BY doc_b
                                ORDER BY j DESC, doc_c) AS rk
      FROM scored
    )
    SELECT d.doc_id,
           CAST(CASE WHEN b.doc_c IS NULL THEN 0 ELSE 1 END AS INTEGER)
             AS is_dup,
           coalesce(b.doc_c, -1) AS dup_of,
           {sql_rnd("coalesce(b.j, 0.0)")} AS jaccard
    FROM documents d
    LEFT JOIN (SELECT * FROM best WHERE rk = 1) b ON b.doc_b = d.doc_id
    WHERE d.doc_id % 10 = 0
    """,
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest near-dedup: screen a NEW batch (doc_id % 10
    == 0, ~10% of the corpus) against the EXISTING corpus (the other
    90%) and flag each new doc as a near-dup of its best corpus match
    (Jaccard >= 0.5) or as novel.

    The production shape for continuous pipelines: the corpus side's
    signatures are a precomputed index you append to (here recomputed
    from the fixture for oracle parity), and the batch side is small —
    so the band join is batch-sigs x corpus-index, NOT corpus x corpus.
    At 100 TB the corpus signature table is date-partitioned parquet
    and each ingest batch joins against it; cost scales with batch
    size, never with corpus size squared.  The per-batch-doc argmax is
    a window over candidate groups (bounded by band collisions).

    Since r7 this oracled query IS the maintained-delta code path: it
    routes through incremental_screen -> pair_table_delta, so the
    driver gate hash-checks the exact pipeline a production ingest
    runs (VERDICT r6 #5), not a parallel formulation."""
    from zebra_spark.io import load

    new_ids = (
        load(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") % 10 == 0)
    )
    return incremental_screen(spark, sf_dir, new_ids)


def incremental_screen(
    spark: SparkSession,
    sf_dir: str,
    new_ids: DataFrame,
    max_bucket: int | None = None,
) -> DataFrame:
    """(doc_id, is_dup, dup_of, jaccard) for every doc in `new_ids` (one
    column `doc_id`): the generic incremental-ingest screen, built on
    the SAME pair_table_delta that maintains the shared pair table — so
    the screen and the table maintenance cannot drift apart.

    The delta yields every scored pair involving a new doc; the screen
    keeps pairs with exactly ONE new endpoint (new-vs-corpus — new-vs-new
    pairs are the batch's internal dups, handled by the batch's own
    dedup), orients them (doc_b = new, doc_c = corpus), thresholds on
    true Jaccard, and takes the per-new-doc argmax."""
    delta = pair_table_delta(spark, sf_dir, new_ids, max_bucket=max_bucket)
    flags = new_ids.select("doc_id").distinct().withColumn("_n", F.lit(1))
    fa = flags.select(F.col("doc_id").alias("doc_a"), F.col("_n").alias("an"))
    fb = flags.select(F.col("doc_id").alias("doc_b"), F.col("_n").alias("bn"))
    oriented = (
        delta.join(fa, "doc_a", "left")
        .join(fb, "doc_b", "left")
        .filter(F.coalesce("an", F.lit(0)) != F.coalesce("bn", F.lit(0)))
        .select(
            F.when(F.col("an") == 1, F.col("doc_a"))
            .otherwise(F.col("doc_b"))
            .alias("doc_n"),
            F.when(F.col("an") == 1, F.col("doc_b"))
            .otherwise(F.col("doc_a"))
            .alias("doc_c"),
            "n_common",
            # Jaccard is symmetric in the two set sizes, so orientation
            # does not change the value (bit-identical to the pre-r7
            # direct formulation, preserving the driver hash)
            (
                F.col("n_common")
                / (F.col("na") + F.col("nb") - F.col("n_common"))
            ).alias("j"),
        )
        .filter(F.col("j") >= MINHASH_THRESHOLD)
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_n").orderBy(F.col("j").desc(), F.col("doc_c"))
    best = (
        oriented.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("doc_n", "doc_c", "j")
    )
    base = new_ids.select("doc_id").distinct()
    return base.join(best, base.doc_id == best.doc_n, "left").select(
        "doc_id",
        F.when(F.col("doc_c").isNull(), 0).otherwise(1).cast("int").alias("is_dup"),
        F.coalesce(F.col("doc_c"), F.lit(-1).cast("bigint")).alias("dup_of"),
        rnd(F.coalesce(F.col("j"), F.lit(0.0))).alias("jaccard"),
    )


@query(
    "q_dedup_simhash",
    oracle=f"""
    WITH {_SQL_TOK.format(nh=N_HASHES)},
    bits AS (
      SELECT t2.doc_id, params.j,
             CASE WHEN sum(CASE WHEN ((a * tid + b) % {P}) % 2 = 1
                               THEN 1 ELSE -1 END) > 0
                  THEN CAST(power(2, params.j) AS BIGINT) ELSE 0 END AS w
      FROM t2 CROSS JOIN params
      GROUP BY t2.doc_id, params.j
    )
    SELECT doc_id, CAST(sum(w) AS BIGINT) AS simhash
    FROM bits GROUP BY doc_id
    """,
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash fingerprint per document (unweighted tokens):
    bit_j = sign of the token-majority of hash-bit j."""
    t2 = _token_ids(spark, sf_dir)
    params = spark.createDataFrame(
        [(j, 2 * j + 1, 17 * j + 29, 1 << j) for j in range(N_HASHES)],
        "j int, a bigint, b bigint, w bigint",
    )
    bit = ((F.col("a") * F.col("tid") + F.col("b")) % P) % 2
    contrib = F.when(bit == 1, 1).otherwise(-1)
    bits = (
        t2.crossJoin(F.broadcast(params))
        .groupBy("doc_id", "j", "w")
        .agg(F.sum(contrib).alias("s"))
        .select(
            "doc_id",
            F.when(F.col("s") > 0, F.col("w")).otherwise(F.lit(0)).alias("wbit"),
        )
    )
    return bits.groupBy("doc_id").agg(F.sum("wbit").cast("bigint").alias("simhash"))


NGRAM = 3
NGRAM_THRESHOLD = 0.55
# Per-(source, gram) posting-list cap — same contract as
# text.JACCARD_DF_CAP: grams hotter than this never GENERATE candidate
# pairs (per-gram fan-out bounded by C(cap, 2) — 3-char grams like
# 'the' are maximal hot keys, so without this one skewed key owns the
# whole shuffle at scale), but every gram still COUNTS toward n_common,
# so reported Jaccard is the exact full-shingle-set value.  Fixture
# sources have <= 25 docs at the test SFs, so the cap is non-binding
# there (output identical to the uncapped operator over the FULL
# corpus — no demo subset).
NGRAM_DF_CAP = 64

_SQL_SHINGLES = f"""
    sh AS (
      SELECT DISTINCT doc_id, source,
             unnest(list_transform(
               range(1, greatest(length(text) - {NGRAM - 1}, 0) + 1),
               i -> substr(text, i, {NGRAM}))) AS gram
      FROM documents
    )
"""


@query(
    "q_text_ngram_jaccard",
    oracle=f"""
    WITH {_SQL_SHINGLES},
    pl AS (SELECT source, gram, count(*) AS n FROM sh GROUP BY source, gram),
    cand AS (
      SELECT DISTINCT a.source, a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sh a
      JOIN sh b ON a.gram = b.gram AND a.source = b.source
                AND a.doc_id < b.doc_id
      JOIN pl ON pl.source = a.source AND pl.gram = a.gram
      WHERE pl.n <= {NGRAM_DF_CAP}
    ),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT c.source, c.doc_a, c.doc_b, count(*) AS n_common
      FROM cand c
      JOIN sh ta ON ta.doc_id = c.doc_a
      JOIN sh tb ON tb.doc_id = c.doc_b AND tb.gram = ta.gram
      GROUP BY c.source, c.doc_a, c.doc_b
    )
    SELECT i.source, i.doc_a, i.doc_b, i.n_common,
           {sql_rnd("i.n_common * 1.0 / (sa.n + sb.n - i.n_common)")} AS jaccard
    FROM inter i
    JOIN sz sa ON sa.doc_id = i.doc_a
    JOIN sz sb ON sb.doc_id = i.doc_b
    WHERE i.n_common * 1.0 / (sa.n + sb.n - i.n_common) >= {NGRAM_THRESHOLD}
    """,
)
def q_text_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-3-gram Jaccard near-dup within source, full corpus.

    Two stages (the capped MinHash-verify shape, mirrored in the
    oracle):
      1. candidates from per-(source, gram) sorted posting lists of
         length <= NGRAM_DF_CAP — one groupBy shuffle, each unordered
         pair emitted once, hot grams dropped BEFORE the quadratic
         flatten so no skewed key can own a task;
      2. exact n_common over the FULL shingle sets (hot grams included)
         via one array_intersect per candidate pair — no (pair x gram)
         explode.
    Pairs whose entire overlap is stopgram-grade are excluded by
    design; q_dedup_minhash is the probabilistic full-recall path.
    """
    from zebra_spark.io import load

    sh = (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "source",
            F.explode(
                F.expr(
                    f"transform(sequence(1, greatest(length(text) - {NGRAM - 1}, 0)),"
                    f" i -> substring(text, i, {NGRAM}))"
                )
            ).alias("gram"),
        )
        .distinct()
    )
    grp = (
        sh.groupBy("source", "gram")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("docs"))
        .filter(F.size("docs") <= NGRAM_DF_CAP)
    )
    cand = (
        # spread the per-gram doc lists before the pair explosion
        # (same single-task-amplification fix as _cosine_candidates)
        _spread(grp, "source", "gram")
        .select(
            "source",
            F.explode(
                F.expr(
                    "flatten(transform(docs, (x, i) ->"
                    " transform(slice(docs, i + 2, size(docs)),"
                    " y -> struct(x AS doc_a, y AS doc_b))))"
                )
            ).alias("p"),
        )
        .select("source", "p.doc_a", "p.doc_b")
        .distinct()
    )
    gramsets = sh.groupBy("doc_id").agg(
        F.array_sort(F.collect_set("gram")).alias("grams")
    )
    ga = gramsets.select(F.col("doc_id").alias("doc_a"), F.col("grams").alias("gra"))
    gb = gramsets.select(F.col("doc_id").alias("doc_b"), F.col("grams").alias("grb"))
    scored = (
        cand.join(ga, "doc_a")
        .join(gb, "doc_b")
        .select(
            "source",
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("gra", "grb")).cast("bigint").alias("n_common"),
            F.size("gra").alias("na"),
            F.size("grb").alias("nb"),
        )
    )
    jac = F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common"))
    return (
        scored.filter(jac >= NGRAM_THRESHOLD)
        .select("source", "doc_a", "doc_b", "n_common", rnd(jac).alias("jaccard"))
    )


# IVF-style blocking for the closest-pairs query: every vector is
# assigned to its NDUP_ASSIGN nearest of C deterministic cells (seeds =
# first C corpus vectors, the q_ann_ivf quantizer); candidate pairs are
# pairs sharing >= 1 cell.  C grows with the corpus — C = max(10,
# n/NDUP_PER_CELL), identically on both engines — so candidate count
# ~ R^2 * n^2 / 2C stays near-linear in n.  At sf0.01 (n=500 -> C=10,
# R=5) candidate top-100 == all-pairs top-100 (recall 1.0, asserted in
# tests) because the fixture has no density gap; R/C trade recall for
# work at larger scales.
NDUP_CELLS = 10
NDUP_ASSIGN = 5
NDUP_PER_CELL = 50
# Giant-cell cap for the cosine blocking (VERDICT r8 #1 — the MinHash
# max_bucket guard's semantic-side twin): a cell with g members emits
# g(g-1)/2 candidate pairs, so one skew-hot cell can dominate the whole
# scoring stage at 100 TB.  Cells are capped to their MAX_CELL SMALLEST
# vec_ids (a deterministic prefix, NOT whole-cell drop like max_bucket):
# with monotonically increasing ingest ids a full cell's admitted set
# never changes afterwards, so the maintained pair table stays
# BIT-IDENTICAL to a capped rebuild — the delta==rebuild contract the
# whole maintenance loop pins.  Recall tradeoff mirrors max_bucket's:
# a pair blocked only by the over-cap tail of one cell can still meet
# in any of its other NDUP_ASSIGN-1 cells.  The default sits far above
# the fixtures' max cell size (278 at sf0.01/sf0.1, cells = n/50 by
# construction), so every oracle hash is unchanged; None disables.
NDUP_MAX_CELL: int | None = 4096


@query(
    "q_neardup_cosine",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    seeds AS (SELECT vec_id AS cell_id, emb AS ce FROM e
              WHERE vec_id < greatest({NDUP_CELLS},
                CAST(floor((SELECT count(*) FROM e) / {NDUP_PER_CELL}.0)
                     AS BIGINT))),
    assign AS (
      SELECT vec_id, cell_id FROM (
        SELECT e.vec_id, s.cell_id,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 {zf.sql_metric("l2sq", a="e.emb", b="s.ce", dim=64)}, s.cell_id)
                 AS rk
        FROM e CROSS JOIN seeds s
      ) WHERE rk <= {NDUP_ASSIGN}
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM assign a JOIN assign b
        ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
    ),
    d AS (
      SELECT c.id_a, c.id_b,
             {zf.sql_metric("cosine", a="ea.emb", b="eb.emb", dim=64)} AS dist
      FROM cand c
      JOIN e ea ON ea.vec_id = c.id_a
      JOIN e eb ON eb.vec_id = c.id_b
    )
    SELECT id_a, id_b, {sql_rnd("dist")} AS dist
    FROM d ORDER BY d.dist, id_a, id_b LIMIT 100
    """,
)
def q_neardup_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup, index-based: IVF multi-assign blocking
    (deterministic quantizer shared with q_ann_ivf) -> within-cell
    candidate pairs -> exact cosine re-rank -> global top-100.

    Plan shape (r3 rework — same output, ~4x less work than the r2
    assign self-join formulation):
      - seeds broadcast to one corpus pass; the top-R cell assignment
        is computed ONCE and pairs come from per-cell sorted member
        lists (one groupBy, each unordered pair emitted once) — the r2
        version referenced `assign` on both sides of an equi-join, so
        Spark recomputed the whole crossJoin+window twice;
      - per-vector norms are computed once in the corpus projection and
        joined to pairs, so the verify kernel is ONE sequential dot per
        pair instead of three (dot(a,b), dot(a,a), dot(b,b)) — same
        IEEE doubles (identical op order on identical data), so oracle
        hash parity is untouched;
      - final top-100 is TakeOrderedAndProject (per-partition partial
        top-k).  Locked by tests/test_plans.py.
    For bulk pair scoring where 4-decimal float parity is not required,
    `neardup_cosine_np` (Arrow/numpy kernel) scores the same candidate
    table faster."""
    return _neardup_cosine(spark, sf_dir, vectorized=False)


def neardup_cosine_np(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_neardup_cosine with the Arrow/numpy verify kernel
    (functions.cosine_np_udf) — same candidates, same top-100 at any
    realistic float margin; for bulk scoring, not the oracle gate."""
    return _neardup_cosine(spark, sf_dir, vectorized=True)


def _score_pairs(cand: DataFrame, e: DataFrame, vectorized: bool) -> DataFrame:
    """(id_a, id_b) candidate pairs -> (id_a, id_b, dist): exact cosine.
    Native path precomputes per-vector norms once so the verify kernel is
    ONE sequential dot per pair; vectorized path is the Arrow/numpy
    kernel (bulk scoring, not the oracle gate)."""
    if vectorized:
        cos_np = zf.cosine_np_udf()
        ea = e.select(F.col("vec_id").alias("id_a"), F.col("emb").alias("ea"))
        eb = e.select(F.col("vec_id").alias("id_b"), F.col("emb").alias("eb"))
        dist = cos_np(F.col("ea"), F.col("eb"))
    else:
        en = e.select(
            "vec_id", "emb", F.sqrt(zf.dot("emb", "emb")).alias("nrm")
        )
        ea = en.select(
            F.col("vec_id").alias("id_a"), F.col("emb").alias("ea"),
            F.col("nrm").alias("na"),
        )
        eb = en.select(
            F.col("vec_id").alias("id_b"), F.col("emb").alias("eb"),
            F.col("nrm").alias("nb"),
        )
        dist = F.when(
            (F.col("na") == 0.0) | (F.col("nb") == 0.0), F.lit(1.0)
        ).otherwise(
            F.lit(1.0)
            - zf.dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
        )
    return cand.join(ea, "id_a").join(eb, "id_b").select(
        "id_a", "id_b", dist.alias("dist")
    )


def cosine_pair_table(
    spark: SparkSession, sf_dir: str,
    max_cell: int | None = NDUP_MAX_CELL,
) -> DataFrame:
    """(id_a, id_b, dist): exact cosine distance for every IVF-blocked
    candidate pair — the embedding-space twin of pair_table(), shared
    by q_neardup_cosine (global top-100) and q_semantic_clusters
    (threshold -> connected components).  Scores are IEEE doubles from
    the native sequential-fold kernel; the parquet round-trip preserves
    them bit-exactly, so consumers match the inline pipeline.
    `max_cell` is the giant-cell guard (NDUP_MAX_CELL) and part of the
    derived-table key, like pair_table's max_bucket."""

    def build() -> DataFrame:
        cand, e = _cosine_candidates(spark, sf_dir, max_cell=max_cell)
        return _score_pairs(cand, e, vectorized=False)

    key = ("cosine", str(Path(sf_dir).resolve()), max_cell)
    return _derived_table(spark, key, build)


def _neardup_cosine(
    spark: SparkSession, sf_dir: str, vectorized: bool
) -> DataFrame:
    if not vectorized:
        scored = cosine_pair_table(spark, sf_dir)
    else:
        cand, e = _cosine_candidates(spark, sf_dir)
        scored = _score_pairs(cand, e, vectorized)
    return (
        scored.orderBy("dist", "id_a", "id_b")
        .limit(100)
        .select("id_a", "id_b", rnd(F.col("dist")).alias("dist"))
    )


def _cosine_seeds(e: DataFrame) -> DataFrame:
    """(cell_id, ce): the frozen IVF seeds of a corpus projection
    (vec_id, emb) — its vectors with vec_id < C, C = max(NDUP_CELLS,
    n / NDUP_PER_CELL).  Deterministic, so both engines and every
    later ingest batch see the same blocking.

    The `vec_id < C` THRESHOLD form is the rule the heldout-family
    oracles pin (_SQL_HELDOUT) — on an id space with holes it selects
    fewer than C rows, diverging from the "C smallest ids" RANK form
    the facade's stream_insert uses for its offset-id stores (ADVICE
    r15).  The two coincide exactly on dense-from-0 ids, which every
    fixture corpus and heldout slice here satisfies by construction;
    persisted seed tables (cosseeds / {path}/seeds) are always read
    back rather than re-derived, so the divergence never reaches a
    consumer of frozen state."""
    n_cells = max(NDUP_CELLS, e.count() // NDUP_PER_CELL)
    return e.filter(F.col("vec_id") < n_cells).select(
        F.col("vec_id").alias("cell_id"), F.col("emb").alias("ce")
    )


def _assign_to_seeds(
    e: DataFrame, seeds: DataFrame, spread: bool = False
) -> DataFrame:
    """(vec_id, cell_id): assign every vector of `e` to its NDUP_ASSIGN
    nearest FROZEN seeds — one broadcast of the seed matrix, one corpus
    pass (the IVFIndex.add kernel, index/ivf.py, expressed natively).
    Per-vector ranking is deterministic ((d_seed, cell_id) order) and
    independent of the other rows, which is exactly what makes
    assignment a delta-able artifact: assigning any batch split and
    unioning equals assigning the whole corpus (pinned by
    tests/test_dedup.py)."""
    from pyspark.sql import Window

    wv = Window.partitionBy("vec_id").orderBy("d_seed", "cell_id")
    # spread only the CORPUS-scale assignment pass (the full-table
    # build); batch deltas keep their natural partitioning — see
    # io.spread_scan's applicability note
    if spread:
        e = spread_scan(e, "vec_id")
    return (
        e.crossJoin(F.broadcast(seeds))
        .select(
            "vec_id",
            "cell_id",
            zf.l2sq(F.col("emb"), F.col("ce")).alias("d_seed"),
        )
        .withColumn("rk", F.row_number().over(wv))
        .filter(F.col("rk") <= NDUP_ASSIGN)
        .select("vec_id", "cell_id")
    )


def cosine_seed_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cell_id, ce): the corpus' frozen seed set as its own derived /
    maintainable artifact (registry kind 'cosseeds').  Freezing the
    seeds separately from the assignment is what lets a GENUINELY NEW
    batch be assigned without touching the corpus: the batch only needs
    this k x dim table broadcast (cosine_assign_delta)."""

    def build() -> DataFrame:
        return _cosine_seeds(embeddings_d(spark, sf_dir).select("vec_id", "emb"))

    key = ("cosseeds", str(Path(sf_dir).resolve()))
    return _derived_table(spark, key, build)


def cosine_assign_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, cell_id): the deterministic IVF multi-assignment behind
    the cosine near-dup surface, materialized once per dataset per
    session (same registry as sig_table/pair_table).  Keeping the
    assignment itself as a maintained artifact is what makes the
    embedding-space DELTA path possible: a new batch only needs ITS
    assignments joined against this table, never a corpus re-pass."""

    def build() -> DataFrame:
        return _assign_to_seeds(
            embeddings_d(spark, sf_dir).select("vec_id", "emb"),
            cosine_seed_table(spark, sf_dir),
            spread=True,
        )

    key = ("cosassign", str(Path(sf_dir).resolve()))
    return _derived_table(spark, key, build)


def cosine_assign_delta(
    spark: SparkSession, sf_dir: str, new_vectors: DataFrame,
    seeds: DataFrame | None = None,
) -> DataFrame:
    """(vec_id, cell_id): assign a batch of GENUINELY NEW vectors
    (vec_id, emb) against the corpus' FROZEN seeds — the ingest-side
    entry point of the semantic maintenance loop (VERDICT r7 #1).

    Cost is |batch| x |seeds| with the seed matrix broadcast: no corpus
    scan, no re-clustering — the frozen-centroid assignment kernel of
    IVFIndex.add (index/ivf.py) on the dedup blocking's seed set.  The
    output rows are exactly what assigning corpus ∪ batch against the
    SAME frozen seeds would add (determinism pinned by
    tests/test_dedup.py::test_cosine_assign_delta_equals_rebuild;
    seeds stay frozen between retrains — q_cell_drift is the retrain
    signal), so the maintained 'cosassign' artifact is `base ∪ delta`
    and cosine_pair_table_delta(new_vectors=batch) rides it directly."""
    if seeds is None:
        seeds = cosine_seed_table(spark, sf_dir)
    return _assign_to_seeds(new_vectors.select("vec_id", "emb"), seeds)


def _cosine_candidates(
    spark: SparkSession, sf_dir: str,
    max_cell: int | None = NDUP_MAX_CELL,
):
    """IVF multi-assign blocking shared by the cosine near-dup surface:
    returns (cand, e) — the within-cell candidate pairs and the corpus
    projection they score against.  Pairs come from per-cell sorted
    member lists (each unordered pair emitted once) over the shared
    assignment table; `max_cell` truncates each sorted list to its
    prefix (see NDUP_MAX_CELL — the giant-cell guard, same admitted
    set as _cell_collide_pairs' windowed cap, equality pinned by
    tests/test_dedup.py::test_cosine_max_cell_cap), bounding the
    per-cell pair fan-out at max_cell^2/2."""
    e = embeddings_d(spark, sf_dir).select("vec_id", "emb")
    assign = cosine_assign_table(spark, sf_dir)
    members = F.sort_array(F.collect_list("vec_id"))
    if max_cell is not None:
        members = F.slice(members, 1, max_cell)
    cand = (
        # spread the ~|cells| member-list rows across the cluster
        # BEFORE the per-cell pair explosion: AQE rightly coalesces the
        # tiny post-aggregate frame to one partition by size, but each
        # row then amplifies by |cell|^2/2 — the expansion must
        # parallelize by CELL, not by bytes (see _spread; same fix as
        # the band join's probe side)
        _spread(assign.groupBy("cell_id").agg(members.alias("members")),
                "cell_id")
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(members, (x, i) ->"
                    " transform(slice(members, i + 2, size(members)),"
                    " y -> struct(x AS id_a, y AS id_b))))"
                )
            ).alias("p")
        )
        .select("p.id_a", "p.id_b")
        .distinct()
    )
    return cand, e


def cosine_pair_table_delta(
    spark: SparkSession,
    sf_dir: str,
    new_ids: DataFrame | None = None,
    new_vectors: DataFrame | None = None,
    max_cell: int | None = NDUP_MAX_CELL,
    embeddings: DataFrame | None = None,
) -> DataFrame:
    """(id_a, id_b, dist): the embedding-space twin of pair_table_delta
    (VERDICT r6 #2) — the exact-cosine scored pairs INVOLVING at least
    one vector from `new_ids` (one column `vec_id`), i.e. exactly the
    rows a full cosine_pair_table() rebuild would add for this ingest
    batch, so the maintained table is `old_pairs UNION delta`.

    Cost scales with |batch| x cell sizes, never |corpus|^2: the batch
    side of the cell join is the batch's own assignments (semi-join
    against the maintained assignment table), the corpus side reads the
    same table's parquet, and only new-involving pairs reach the scoring
    kernel.  Equivalence to the rebuild slice is pinned by
    tests/test_dedup.py::test_cosine_pair_table_delta; consumers
    (q_semantic_clusters, q_emb_knn_purity) pick up a maintained table
    via register_maintained_table("cosine", ...).

    Two batch modes (r8, VERDICT r7 #1):
    - new_ids: the batch is ALREADY in the corpus snapshot and its
      assign-table rows (snapshot semantics — the original r7 path);
    - new_vectors (vec_id, emb): the batch is GENUINELY UNSEEN — its
      assignments come from cosine_assign_delta against the frozen
      seeds, the corpus side of the cell join is the maintained assign
      table PLUS those batch assignments (so new-new pairs form), and
      scoring reads corpus ∪ batch embeddings.  vec_ids must be
      disjoint from the corpus.  Equivalence to the same-seed rebuild
      slice is driver-hash-checked (q_cosine_delta_unseen).

    `embeddings` overrides the scoring source (vec_id, emb) — the lake
    by default.  A maintainer whose ingested vectors have not (all)
    landed in the lake passes its own maintained vectors here
    (queries/tick.py's vecs table); scoring inner-joins both pair
    endpoints, so an endpoint missing from the source would silently
    drop the pair (r10 review)."""
    if (new_vectors is None) == (new_ids is None):
        # validate BEFORE touching the derived-table registry: the
        # corpus assign build is the most expensive artifact and must
        # not run as a side effect of a call that then raises
        raise ValueError("pass exactly one of new_ids / new_vectors")
    assign = cosine_assign_table(spark, sf_dir)
    e = (
        embeddings if embeddings is not None else embeddings_d(spark, sf_dir)
    ).select("vec_id", "emb")
    if new_vectors is not None:
        batch = new_vectors.select("vec_id", "emb")
        batch_assign = cosine_assign_delta(spark, sf_dir, batch)
        other_assign = assign.unionByName(batch_assign)
        e = e.unionByName(batch)
    else:
        batch_assign = assign.join(
            new_ids.select("vec_id"), "vec_id", "left_semi"
        )
        other_assign = assign
    cand = _cell_collide_pairs(batch_assign, other_assign, max_cell=max_cell)
    return _score_pairs(cand, e, vectorized=False)


def _cell_collide_pairs(
    batch_assign: DataFrame, other_assign: DataFrame,
    max_cell: int | None = NDUP_MAX_CELL,
) -> DataFrame:
    """(id_a, id_b): candidate pairs from cell collisions between a
    batch's assignments (vec_id, cell_id) and the full assignment view
    — the ONE shared kernel behind cosine_pair_table_delta,
    q_cosine_delta_unseen and streaming.maintain_cosine_tables, so the
    giant-cell cap lands on all three at once and the pinned
    delta==rebuild equivalences cannot drift apart.  Normalized to
    id_a < id_b; new-new pairs appear from either side and multi-assign
    yields one row per shared cell — the trailing distinct collapses
    both.

    `max_cell` (NDUP_MAX_CELL) admits only each cell's max_cell
    SMALLEST vec_ids — the same admitted set as _cosine_candidates'
    sliced member lists.  Cost stays batch-proportional: the corpus
    view is first semi-joined to the BATCH'S OWN cells (a broadcast of
    <= NDUP_ASSIGN x |batch| distinct cell ids — pairs require a cell
    the batch touches, and each cell's admitted prefix depends only on
    that cell's members, so the restriction is exact), and only then
    ranked by a (cell_id, vec_id) window whose per-cell sort the
    following cell equi-join's shuffle reuses.  No corpus-wide pass,
    no giant per-cell array anywhere on this path."""
    if max_cell is not None:
        from pyspark.sql import Window

        batch_cells = batch_assign.select("cell_id").distinct()
        touched = other_assign.join(
            F.broadcast(batch_cells), "cell_id", "left_semi"
        )
        wc = Window.partitionBy("cell_id").orderBy("vec_id")
        admitted = (
            touched.withColumn("crk", F.row_number().over(wc))
            .filter(F.col("crk") <= max_cell)
            .drop("crk")
        )
        # batch side restricted to its ADMITTED assignments (an
        # over-cap batch row contributes no pairs, exactly as in the
        # capped rebuild); callers guarantee batch_assign ⊆ other_assign
        batch_assign = admitted.join(
            batch_assign.select("vec_id", "cell_id"),
            ["vec_id", "cell_id"],
            "left_semi",
        )
        other_assign = admitted
    # probe side spread before the cell-collision expansion (_spread)
    newa = _spread(batch_assign, "vec_id").select(
        F.col("vec_id").alias("id_n"), "cell_id"
    )
    other = other_assign.select(
        F.col("vec_id").alias("id_o"), F.col("cell_id").alias("cell_o")
    )
    return (
        newa.join(
            other,
            (F.col("cell_id") == F.col("cell_o"))
            & (F.col("id_n") != F.col("id_o")),
        )
        .select(
            F.least("id_n", "id_o").alias("id_a"),
            F.greatest("id_n", "id_o").alias("id_b"),
        )
        .distinct()
    )


_SQL_COSINE_ASSIGN = f"""
    e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    seeds AS (SELECT vec_id AS cell_id, emb AS ce FROM e
              WHERE vec_id < greatest({NDUP_CELLS},
                CAST(floor((SELECT count(*) FROM e) / {NDUP_PER_CELL}.0)
                     AS BIGINT))),
    assign AS (
      SELECT vec_id, cell_id FROM (
        SELECT e.vec_id, s.cell_id,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 {zf.sql_metric("l2sq", a="e.emb", b="s.ce", dim=64)},
                 s.cell_id) AS rk
        FROM e CROSS JOIN seeds s
      ) WHERE rk <= {NDUP_ASSIGN}
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM assign a JOIN assign b
        ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
    )
"""


@query(
    "q_cosine_table_delta",
    oracle=f"""
    WITH {_SQL_COSINE_ASSIGN.strip()}
    SELECT c.id_a, c.id_b,
           {sql_rnd(zf.sql_metric("cosine", a="ea.emb", b="eb.emb", dim=64))}
             AS dist
    FROM cand c
    JOIN e ea ON ea.vec_id = c.id_a
    JOIN e eb ON eb.vec_id = c.id_b
    WHERE c.id_a % 10 = 0 OR c.id_b % 10 = 0
    """,
)
def q_cosine_table_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space delta maintenance, driver-hash-checked (the
    cosine twin of q_pair_table_delta): cosine_pair_table_delta for the
    vec_id % 10 == 0 ingest batch must equal the oracle's from-scratch
    IVF-blocked candidate slice with exact cosine distances — so the
    maintained-table path q_semantic_clusters/q_emb_knn_purity consume
    via register_maintained_table is itself at the driver gate."""
    new_ids = (
        embeddings_d(spark, sf_dir)
        .select("vec_id")
        .filter(F.col("vec_id") % 10 == 0)
    )
    return cosine_pair_table_delta(spark, sf_dir, new_ids).select(
        "id_a", "id_b", rnd(F.col("dist")).alias("dist")
    )


# held-out split shared by the two unseen-batch driver gates: the
# vec_id % 10 == 0 vectors play a genuinely NEW ingest batch; the rest
# is the corpus whose count and prefix rows freeze the seed set.
_SQL_HELDOUT = f"""
    e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    corpus AS (SELECT * FROM e WHERE vec_id % 10 <> 0),
    batch  AS (SELECT * FROM e WHERE vec_id % 10 = 0),
    seeds AS (SELECT vec_id AS cell_id, emb AS ce FROM corpus
              WHERE vec_id < greatest({NDUP_CELLS},
                CAST(floor((SELECT count(*) FROM corpus) / {NDUP_PER_CELL}.0)
                     AS BIGINT)))
"""


def _heldout_split(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    e = embeddings_d(spark, sf_dir).select("vec_id", "emb")
    return (
        e.filter(F.col("vec_id") % 10 != 0),
        e.filter(F.col("vec_id") % 10 == 0),
    )


@query(
    "q_cosine_assign_delta",
    oracle=f"""
    WITH {_SQL_HELDOUT.strip()}
    SELECT vec_id, cell_id FROM (
      SELECT b.vec_id, s.cell_id,
             row_number() OVER (PARTITION BY b.vec_id ORDER BY
               {zf.sql_metric("l2sq", a="b.emb", b="s.ce", dim=64)},
               s.cell_id) AS rk
      FROM batch b CROSS JOIN seeds s
    ) WHERE rk <= {NDUP_ASSIGN}
    """,
)
def q_cosine_assign_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frozen-seed assignment of a genuinely UNSEEN batch, driver-hash-
    checked (VERDICT r7 #1): the vec_id % 10 == 0 vectors are held out
    of the corpus entirely — the seed set is frozen on the REMAINING
    corpus (its count, its prefix rows), and cosine_assign_delta must
    reproduce the oracle's from-scratch assignment of the batch against
    those seeds.  This is the ingest entry point of the semantic
    maintenance loop: its output appends to the maintained 'cosassign'
    artifact."""
    corpus, batch = _heldout_split(spark, sf_dir)
    return cosine_assign_delta(
        spark, sf_dir, batch, seeds=_cosine_seeds(corpus)
    )


@query(
    "q_cosine_delta_unseen",
    oracle=f"""
    WITH {_SQL_HELDOUT.strip()},
    assign AS (
      SELECT vec_id, cell_id FROM (
        SELECT a.vec_id, s.cell_id,
               row_number() OVER (PARTITION BY a.vec_id ORDER BY
                 {zf.sql_metric("l2sq", a="a.emb", b="s.ce", dim=64)},
                 s.cell_id) AS rk
        FROM e a CROSS JOIN seeds s
      ) WHERE rk <= {NDUP_ASSIGN}
    ),
    cand AS (
      SELECT DISTINCT least(a.vec_id, b.vec_id) AS id_a,
                      greatest(a.vec_id, b.vec_id) AS id_b
      FROM assign a JOIN assign b
        ON a.cell_id = b.cell_id AND a.vec_id <> b.vec_id
      WHERE a.vec_id % 10 = 0 OR b.vec_id % 10 = 0
    )
    SELECT c.id_a, c.id_b,
           {sql_rnd(zf.sql_metric("cosine", a="ea.emb", b="eb.emb", dim=64))}
             AS dist
    FROM cand c
    JOIN e ea ON ea.vec_id = c.id_a
    JOIN e eb ON eb.vec_id = c.id_b
    """,
)
def q_cosine_delta_unseen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end unseen-batch pair delta, driver-hash-checked: the
    held-out batch is assigned against the corpus-frozen seeds
    (cosine_assign_delta), cell-joined against corpus ∪ batch
    assignments, and exact-cosine scored — and must equal the oracle's
    same-seed full-corpus rebuild sliced to batch-involving pairs.
    This is cosine_pair_table_delta's new_vectors mode verbatim, with
    the corpus-side tables built over the held-out corpus (the
    production path's maintained artifacts play that role; equivalence
    of base ∪ delta to the full assignment is pinned by
    tests/test_dedup.py::test_cosine_assign_delta_equals_rebuild)."""
    corpus, batch = _heldout_split(spark, sf_dir)
    seeds = _cosine_seeds(corpus)
    corpus_assign = _assign_to_seeds(corpus, seeds, spread=True)
    batch_assign = _assign_to_seeds(batch, seeds)
    cand = _cell_collide_pairs(
        batch_assign, corpus_assign.unionByName(batch_assign)
    )
    e = corpus.unionByName(batch)
    return _score_pairs(cand, e, vectorized=False).select(
        "id_a", "id_b", rnd(F.col("dist")).alias("dist")
    )


def cell_drift_audit(
    spark: SparkSession, sf_dir: str, batch: DataFrame,
    label: str = "batch", seeds: DataFrame | None = None,
) -> DataFrame:
    """One row (split, n, mse) per call: mean distance-to-NEAREST-seed
    of `batch` (vec_id, emb) under the corpus' FROZEN seed set — the
    cosine-blocking analogue of PQIndex.drift_audit (index/pq.py).
    The seeds behind cosine_assign_table are corpus-prefix vectors
    frozen at build; under distribution drift the cells degrade
    silently (every batch still gets NDUP_ASSIGN cells, they are just
    far away), so the audit compares this mean against the corpus
    baseline: ratio ≈ 1 means the blocking still fits, sustained ≫ 1
    is the reseed signal.  One distributed pass — broadcast seed
    matrix, per-vector min, one global (n, avg) aggregate; nothing
    batch-proportional reaches the driver."""
    if seeds is None:
        seeds = cosine_seed_table(spark, sf_dir)
    return (
        batch.select("vec_id", "emb")
        .crossJoin(F.broadcast(seeds))
        .select(
            "vec_id",
            zf.l2sq(F.col("emb"), F.col("ce")).alias("d"),
        )
        .groupBy("vec_id")
        .agg(F.min("d").alias("dmin"))
        .agg(F.count(F.lit(1)).alias("n"), F.avg("dmin").alias("mse"))
        .select(F.lit(label).alias("split"), "n", "mse")
    )


@query(
    "q_cell_drift",
    oracle=f"""
    WITH {_SQL_HELDOUT.strip()},
    shifted AS (SELECT vec_id,
                       list_transform(emb, x -> 3.0 * x + 1.0) AS emb
                FROM batch),
    all3 AS (
      SELECT 'a_corpus_baseline' AS split, vec_id, emb FROM corpus
      UNION ALL SELECT 'b_batch_same_dist', vec_id, emb FROM batch
      UNION ALL SELECT 'c_batch_shifted', vec_id, emb FROM shifted
    ),
    nearest AS (
      SELECT a.split, a.vec_id,
             min({zf.sql_metric("l2sq", a="a.emb", b="s.ce", dim=64)})
               AS dmin
      FROM all3 a CROSS JOIN seeds s GROUP BY a.split, a.vec_id
    ),
    agg AS (SELECT split, count(*) AS n, avg(dmin) AS mse
            FROM nearest GROUP BY split)
    SELECT split, n, {sql_rnd("mse")} AS mse,
           {sql_rnd("mse / (SELECT mse FROM agg WHERE split = 'a_corpus_baseline')")}
             AS ratio
    FROM agg ORDER BY split
    """,
)
def q_cell_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seed-drift audit for the cosine blocking (VERDICT r7 #3), fully
    driver-hash-checked (the PQ twin q_index_drift is rows-only because
    k-means is not SQL-expressible; nearest-frozen-seed distance is):
    seeds are frozen on the 90% corpus, then the mean nearest-seed
    distance is scored for (a) the corpus itself (ratio 1 by
    construction), (b) the held-out same-distribution batch (ratio
    stays near 1), (c) the same batch synthetically shifted 3x + 1 —
    the reseed signal, ratio ≫ 1.  The binds contract (b < 2, c > 5)
    is additionally asserted in tests/test_dedup.py."""
    corpus, batch = _heldout_split(spark, sf_dir)
    seeds = _cosine_seeds(corpus)
    shifted = batch.select(
        "vec_id", F.expr("transform(emb, x -> 3.0d * x + 1.0d)").alias("emb")
    )
    rows = (
        cell_drift_audit(spark, sf_dir, corpus, "a_corpus_baseline", seeds)
        .unionByName(
            cell_drift_audit(spark, sf_dir, batch, "b_batch_same_dist", seeds)
        )
        .unionByName(
            cell_drift_audit(spark, sf_dir, shifted, "c_batch_shifted", seeds)
        )
    )
    base = rows.filter(F.col("split") == "a_corpus_baseline").select(
        F.col("mse").alias("base_mse")
    )
    return (
        rows.crossJoin(F.broadcast(base))
        .select(
            "split",
            "n",
            rnd(F.col("mse")).alias("mse"),
            rnd(F.col("mse") / F.col("base_mse")).alias("ratio"),
        )
        .orderBy("split")
    )


@query(
    "q_band_balance",
    oracle=f"""
    WITH {_SQL_TOK.format(nh=N_HASHES)},
    {_SQL_SIGS.strip()},
    buckets AS (
      SELECT band, key, count(*) AS n_members
      FROM sigs GROUP BY band, key
    )
    SELECT n_members AS bucket_size, count(*) AS n_buckets
    FROM buckets GROUP BY n_members
    """,
)
def q_band_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(bucket_size, n_buckets): the band-bucket size histogram over
    the maintained MinHash signature table — the LEXICAL twin of
    q_cell_balance.  Candidate fan-out per bucket is n_members^2/2, so
    this histogram is the evidence for choosing (or re-tuning) the
    giant-bucket cap max_bucket; one groupBy chain over the shared
    sig_table parquet, no pair generation."""
    return (
        sig_table(spark, sf_dir)
        .groupBy("band", "key")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .groupBy(F.col("n_members").alias("bucket_size"))
        .agg(F.count(F.lit(1)).alias("n_buckets"))
    )


def drift_baseline_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-row (n, mse): the corpus' mean nearest-seed distance under the
    frozen seeds — baseline_mse PERSISTED WITH the seed artifact
    (registry kind 'driftbase', maintained beside 'cosseeds', VERDICT
    r8 #2), so the nightly needs_reseed check prices one broadcast-seed
    pass over the BATCH only, never a corpus re-score."""

    def build() -> DataFrame:
        return cell_drift_audit(
            spark, sf_dir,
            embeddings_d(spark, sf_dir).select("vec_id", "emb"),
            "corpus",
        ).select("n", "mse")

    key = ("driftbase", str(Path(sf_dir).resolve()))
    return _derived_table(spark, key, build)


def drift_baseline(spark: SparkSession, sf_dir: str) -> float:
    """The persisted baseline_mse scalar (see drift_baseline_table)."""
    row = drift_baseline_table(spark, sf_dir).collect()[0]
    if row.mse is None:
        raise ValueError(
            "drift baseline is empty (no vectors scored against the "
            "seed table) — build the corpus state first"
        )
    return float(row.mse)


CAPPED_CELL = 64  # binding cap for the q_cosine_capped_pairs gate


@query(
    "q_cosine_capped_pairs",
    oracle=f"""
    WITH {_SQL_COSINE_ASSIGN.strip()},
    admitted AS (
      SELECT vec_id, cell_id FROM (
        SELECT vec_id, cell_id,
               row_number() OVER (PARTITION BY cell_id ORDER BY vec_id)
                 AS crk
        FROM assign
      ) WHERE crk <= {CAPPED_CELL}
    ),
    capcand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM admitted a JOIN admitted b
        ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
    )
    SELECT c.id_a, c.id_b,
           {sql_rnd(zf.sql_metric("cosine", a="ea.emb", b="eb.emb", dim=64))}
             AS dist
    FROM capcand c
    JOIN e ea ON ea.vec_id = c.id_a
    JOIN e eb ON eb.vec_id = c.id_b
    """,
)
def q_cosine_capped_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The giant-cell guard at the driver hash gate with a BINDING cap
    (VERDICT r8 #1): the capped cosine pair table at max_cell=64 — far
    below the fixture's ~250-member cells — must equal the oracle's
    per-cell prefix semantics exactly (each cell's 64 smallest vec_ids,
    all admitted pairs, exact cosine).  The default-cap paths are
    hash-gated unchanged under their existing names; this row pins the
    cap ARITHMETIC itself, shared verbatim by the build slice, the
    delta kernel's window, and the streaming maintainer
    (test_cosine_max_cell_cap pins their mutual equality)."""
    return cosine_pair_table(spark, sf_dir, max_cell=CAPPED_CELL).select(
        "id_a", "id_b", rnd(F.col("dist")).alias("dist")
    )


@query(
    "q_drift_baseline",
    oracle=f"""
    WITH {_SQL_COSINE_ASSIGN.strip()},
    nearest AS (
      SELECT e.vec_id,
             min({zf.sql_metric("l2sq", a="e.emb", b="s.ce", dim=64)})
               AS dmin
      FROM e CROSS JOIN seeds s GROUP BY e.vec_id
    )
    SELECT count(*) AS n, {sql_rnd("avg(dmin)")} AS mse FROM nearest
    """,
)
def q_drift_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PERSISTED reseed baseline at the driver hash gate (VERDICT
    r8 #2): the 1-row 'driftbase' artifact — corpus mean nearest-seed
    distance under the frozen seeds — must equal the oracle's
    from-scratch computation.  This is the scalar every nightly
    needs_reseed check compares a batch against without re-scoring the
    corpus."""
    return drift_baseline_table(spark, sf_dir).select(
        "n", rnd(F.col("mse")).alias("mse")
    )


def needs_reseed(
    spark: SparkSession,
    sf_dir: str,
    batch: DataFrame,
    ratio_threshold: float = 5.0,
    seeds: DataFrame | None = None,
    baseline_mse: float | None = None,
) -> bool:
    """Reseed trigger for the cosine blocking (the PQIndex.needs_retrain
    analogue): True when the batch's mean nearest-seed distance exceeds
    `ratio_threshold` x the corpus baseline — i.e. cell_drift_audit's
    ratio crossed the line and the frozen seeds no longer block this
    distribution well.  A reseed is a full rebuild (new seeds, new
    assignment, new pair table — a new state_dir for the streaming
    loop), so the threshold defaults high; pass the PERSISTED
    `baseline_mse` in production to avoid re-scoring the corpus per
    check (only two scalars ever reach the driver)."""
    if baseline_mse is None and seeds is None:
        # corpus-seed default: the baseline is the PERSISTED 1-row
        # 'driftbase' artifact (session-materialized / maintained), so
        # repeated nightly checks never re-score the corpus.  FUSED
        # (r17 optimization pass, guide §1.2): the baseline read and
        # the batch audit are both 1-row frames, so crossJoining them
        # answers the gate in ONE action instead of two sequential
        # collects — on the maintenance hot path (run_tick /
        # ingest_then_audit) that halves the gate's per-tick job count
        # with identical scalars reaching the driver.
        base = drift_baseline_table(spark, sf_dir).select(
            F.col("mse").alias("base_mse")
        )
        row = (
            cell_drift_audit(spark, sf_dir, batch, "batch")
            .crossJoin(F.broadcast(base))
            .collect()[0]
        )
        if row.base_mse is None:
            # same contract as drift_baseline(): an empty baseline is
            # a build-order error, never a quiet "no drift"
            raise ValueError(
                "drift baseline is empty (no vectors scored against "
                "the seed table) — build the corpus state first"
            )
        if row.mse is None:  # empty batch (a quiet tick) cannot drift
            return False
        return float(row.mse) > ratio_threshold * max(
            float(row.base_mse), 1e-12
        )
    if seeds is None:
        seeds = cosine_seed_table(spark, sf_dir)
    if baseline_mse is None:
        # custom seeds without a persisted baseline: score the corpus
        # under THOSE seeds (a baseline under different seeds would be
        # meaningless)
        base_row = cell_drift_audit(
            spark, sf_dir,
            embeddings_d(spark, sf_dir).select("vec_id", "emb"),
            "corpus", seeds,
        ).collect()[0]
        if base_row.mse is None:  # ADVICE r8: mirror the batch guard —
            # an empty corpus/seed table has no baseline to drift from
            raise ValueError(
                "needs_reseed: corpus baseline is empty (no vectors "
                "scored against the seed table) — pass a persisted "
                "baseline_mse or build the corpus state first"
            )
        baseline_mse = float(base_row.mse)
    row = cell_drift_audit(spark, sf_dir, batch, "batch", seeds).collect()[0]
    if row.mse is None:  # empty batch (a quiet tick) cannot drift
        return False
    return float(row.mse) > ratio_threshold * max(baseline_mse, 1e-12)


@query(
    "q_cell_balance",
    oracle=f"""
    WITH {_SQL_COSINE_ASSIGN.strip()}
    SELECT cell_id, count(*) AS n_members FROM assign GROUP BY cell_id
    """,
)
def q_cell_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cell_id, n_members): the blocking-health histogram over the
    maintained assignment table — the operational twin of q_cell_drift
    (drift says the seeds stopped FITTING; balance says a cell grew so
    large its within-cell candidate fan-out dominates the pair-table
    cost, the same failure mode the MinHash giant-bucket guard caps).
    One groupBy over the maintained artifact; at 100 TB this is the
    nightly check that decides giant-cell capping or a reseed."""
    return (
        cosine_assign_table(spark, sf_dir)
        .groupBy("cell_id")
        .agg(F.count(F.lit(1)).alias("n_members"))
    )


def register_maintained_table(
    kind: str,
    sf_dir: str,
    path: str | None,
    n_hashes: int = N_HASHES,
    n_bands: int = N_BANDS,
    max_bucket: int | None = None,
    max_cell: int | None = NDUP_MAX_CELL,
) -> str | None:
    """Point the session's derived-table registry at an externally
    MAINTAINED artifact — a parquet dir an ingest pipeline keeps
    current as `base ∪ deltas` (pair_table_delta /
    cosine_pair_table_delta output schema).  Every consumer
    (q_dedup_minhash, clusters, PageRank, q_semantic_clusters,
    q_emb_knn_purity, ...) then reads the maintained files instead of
    triggering a session rebuild — the 100 TB shape, where the table is
    an artifact of the corpus snapshot, not of the query run.

    kind: 'minhash' | 'cosine' | 'sigs' | 'toksets' | 'cosassign' |
    'cosseeds' | 'clusters' | 'driftbase'.
    Returns the previously registered path (None if the table would
    have been built fresh) so callers can restore it; restore a
    prev=None result by passing path=None, which UNREGISTERS the kind
    (ADVICE r8: restoring only non-None prevs leaked registrations
    pointing at deleted temp dirs for the rest of the session)."""
    resolved = str(Path(sf_dir).resolve())
    keys: dict[str, tuple] = {
        "minhash": ("minhash", resolved, n_hashes, n_bands, max_bucket),
        "cosine": ("cosine", resolved, max_cell),
        "sigs": ("sigs", resolved, n_hashes, n_bands),
        "toksets": ("toksets", resolved),
        "cosassign": ("cosassign", resolved),
        "cosseeds": ("cosseeds", resolved),
        "clusters": ("clusters", resolved),
        "driftbase": ("driftbase", resolved),
    }
    if kind not in keys:
        raise ValueError(f"unknown maintained-table kind {kind!r}")
    key = keys[kind]
    with _DERIVED_LOCK:
        prev = _DERIVED.get(key)
        if path is None:
            _DERIVED.pop(key, None)
        else:
            _DERIVED[key] = path
    return prev


# --- cluster dedup: connected components over the near-dup graph -----------

_SQL_MINHASH_PAIRS = (
    _SQL_MINHASH_CORE
    + f""",
    edges AS MATERIALIZED (
      SELECT i.doc_a, i.doc_b FROM inter i
      JOIN sz sa ON sa.doc_id = i.doc_a
      JOIN sz sb ON sb.doc_id = i.doc_b
      WHERE i.n_common * 1.0 / (sa.n + sb.n - i.n_common)
            >= {MINHASH_THRESHOLD}
    )
"""
)


_CLOSURE_K = 8  # doubling stages; sf0.1 converges by stage 5, sf0.01 by 2


def _closure_sql(id_alias: str = "doc_id", k: int = _CLOSURE_K) -> str:
    """Log-depth UNROLLED connected-components closure (VERDICT r14
    #1): the non-recursive replacement for the `WITH RECURSIVE reach`
    transitive closure, which DuckDB could not finish at sf0.1 (the
    all-pairs reach set is quadratic in component size — near-dup
    components are quasi-cliques, so the fixpoint materializes ~n²
    rows per family).  Mirrors the Spark side's pointer-doubled
    engine (zebra_spark.graph.connected_components): K hook+jump
    stages, each label <- least(own, min neighbor label, label of
    label), converging in O(log diameter) rounds.

    Expects a symmetric `sym(a, b)` CTE in scope and emits CTEs up to
    `labels({id_alias}, cluster)` — splice where reach/labels stood.
    Two cost levers make the stages ~free:
    - contraction: after the first min-neighbor round (cc0), stages
      run on the label-level graph `csym` (distinct cross-label
      edges — 1.9k rows where sym has 12.9M at sf0.1), then map back
      through cc0;
    - AS MATERIALIZED per stage, or DuckDB 1.0 re-executes the chain
      per reference (each stage reads its predecessor 3x -> 3^K).
    A converged hook step means every edge joins equal labels, so
    each component is label-constant; the min node m of a component
    always keeps lab(m)=m (labels only decrease, never below the
    component min), hence converged == exact component minimum —
    the `conv` CTE ASSERTS convergence (stage K == stage K-1) via
    DuckDB error(), so an under-provisioned K can never silently
    ship a wrong fixpoint."""
    parts = [
        """cc0 AS MATERIALIZED (
      SELECT a AS id, least(a, min(b)) AS lab FROM sym GROUP BY a
    )""",
        """csym AS MATERIALIZED (
      SELECT DISTINCT x.lab AS a, y.lab AS b
      FROM sym s JOIN cc0 x ON x.id = s.a JOIN cc0 y ON y.id = s.b
      WHERE x.lab <> y.lab
    )""",
        """k0 AS MATERIALIZED (
      SELECT a AS id, least(a, min(b)) AS lab FROM csym GROUP BY a
    )""",
    ]
    for i in range(1, k + 1):
        p = f"k{i - 1}"
        parts.append(f"""k{i} AS MATERIALIZED (
      SELECT p.id, least(p.lab, nb.mlab, pj.lab) AS lab
      FROM {p} p
      JOIN (SELECT s.a AS id, min(q.lab) AS mlab
            FROM csym s JOIN {p} q ON q.id = s.b
            GROUP BY s.a) nb ON nb.id = p.id
      JOIN {p} pj ON pj.id = p.lab
    )""")
    parts.append(f"""conv AS MATERIALIZED (
      SELECT count(*) AS n_diff FROM k{k} x JOIN k{k - 1} y
      ON x.id = y.id AND x.lab <> y.lab
    )""")
    parts.append(f"""labels AS (
      SELECT c.id AS {id_alias}, coalesce(kk.lab, c.lab) AS cluster
      FROM cc0 c LEFT JOIN k{k} kk ON kk.id = c.lab
      WHERE (SELECT CASE WHEN n_diff = 0 THEN 0
             ELSE error('closure not converged in {k} doubling stages'
                        ' - raise _CLOSURE_K') END FROM conv) = 0
    )""")
    return ",\n    ".join(parts)


_SQL_SYM = """sym AS MATERIALIZED (
      SELECT doc_a AS a, doc_b AS b FROM edges
      UNION ALL SELECT doc_b, doc_a FROM edges
    )"""


_SQL_CLUSTERS_ORACLE = f"""
    WITH {_SQL_TOK.format(nh=N_HASHES)},
    {_SQL_MINHASH_PAIRS},
    {_SQL_SYM},
    {_closure_sql("doc_id")}
    SELECT d.doc_id,
           coalesce(l.cluster, d.doc_id) AS cluster,
           CAST(CASE WHEN coalesce(l.cluster, d.doc_id) = d.doc_id
                THEN 1 ELSE 0 END AS INTEGER) AS keep
    FROM documents d LEFT JOIN labels l ON l.doc_id = d.doc_id
    """


def cluster_label_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, cluster): component labels over the thresholded MinHash
    near-dup graph — the CLUSTER artifact as a maintained table
    (registry kind 'clusters', VERDICT r8 #3), same registry as the
    pair tables.  Built fresh it is graph.connected_components over the
    shared pair table (materialized once per dataset per session); a
    nightly tick instead maintains it at DELTA cost via
    graph.incremental_components — star(old labels) ∪ thresholded pair
    delta, |V| + |delta| edges — and registers the result
    (queries.audit.ingest_then_audit), so cluster consumers
    (q_dedup_clusters, the audit's dup_clusters section, keep-best)
    read maintained labels instead of re-traversing the graph."""

    def build() -> DataFrame:
        from zebra_spark.graph import connected_components
        from zebra_spark.io import load

        pairs = QUERIES["q_dedup_minhash"](spark, sf_dir).select(
            F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
        )
        docs = load(spark, sf_dir, "documents").select(
            F.col("doc_id").alias("id")
        )
        # edges_cheap: the pair frame is a filter over the materialized
        # pair table — no expensive lineage for CC to cut
        comp = connected_components(docs, pairs, edges_cheap=True)
        return comp.select(
            F.col("id").alias("doc_id"), F.col("component").alias("cluster")
        )

    key = ("clusters", str(Path(sf_dir).resolve()))
    return _derived_table(spark, key, build)


@query("q_dedup_clusters", oracle=_SQL_CLUSTERS_ORACLE)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTER dedup: connected components over the MinHash
    pair graph, keep the min-id representative per component (keep=1).

    Spark side: zebra_spark.graph.connected_components — min-label
    propagation WITH pointer doubling, so rounds are O(log diameter)
    (a 60-hop near-dup chain converges in ~7 rounds, not 60) — behind
    the maintainable cluster_label_table, so a registered 'clusters'
    artifact serves this without recomputation.  Oracle side:
    recursive-CTE transitive closure — same fixpoint."""
    return cluster_label_table(spark, sf_dir).select(
        "doc_id",
        "cluster",
        F.when(F.col("cluster") == F.col("doc_id"), 1).otherwise(0)
        .cast("int")
        .alias("keep"),
    )


def jaccard_expr():
    """Verified-pair Jaccard over the pair-table schema — the ONE
    python-side copy of n_common / (na + nb - n_common) (the SQL
    oracles carry their own, compared at the hash gate)."""
    return F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common"))


def threshold_edges(pairs: DataFrame) -> DataFrame:
    """(src, dst): near-dup edges — verified pairs (pair_table /
    pair_table_delta schema) at MINHASH_THRESHOLD."""
    return pairs.filter(jaccard_expr() >= MINHASH_THRESHOLD).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )


def base_cluster_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(id, component): PRE-batch component labels over the non-batch
    (doc_id % 10 != 0) slice — the fixture's stand-in for a maintained
    label artifact, derived-cached and shared by q_cluster_delta and
    queries.audit.ingest_then_audit so the pinned incremental==rebuild
    equivalence has exactly one scaffolding implementation (r9
    self-review)."""

    def build() -> DataFrame:
        from zebra_spark.graph import connected_components
        from zebra_spark.io import load

        is_new = (F.col("doc_a") % 10 == 0) | (F.col("doc_b") % 10 == 0)
        base_edges = threshold_edges(
            pair_table(spark, sf_dir).filter(~is_new)
        )
        base_nodes = (
            load(spark, sf_dir, "documents")
            .select(F.col("doc_id").alias("id"))
            .filter(F.col("id") % 10 != 0)
        )
        return connected_components(base_nodes, base_edges, edges_cheap=True)

    key = ("clusters_base", str(Path(sf_dir).resolve()))
    return _derived_table(spark, key, build)


@query(
    "q_cluster_size_hist",
    oracle=f"""
    WITH {_SQL_TOK.format(nh=N_HASHES)},
    {_SQL_MINHASH_PAIRS},
    {_SQL_SYM},
    {_closure_sql("doc_id")},
    full_labels AS (
      SELECT d.doc_id, coalesce(l.cluster, d.doc_id) AS cluster
      FROM documents d LEFT JOIN labels l ON l.doc_id = d.doc_id
    ),
    sizes AS (
      SELECT cluster, count(*) AS cluster_size
      FROM full_labels GROUP BY cluster
    )
    SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters
    FROM sizes GROUP BY cluster_size
    """,
)
def q_cluster_size_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cluster_size, n_clusters): the duplication-FAMILY size
    distribution over the maintained cluster labels (r9) — the
    companion health view to the degree histogram: degree says how
    connected individual docs are, this says how big the transitive
    families actually get (one mega-family is the boilerplate signal
    the keep-best policy must survive).  Two groupBys over the
    maintained 'clusters' artifact — no graph traversal at query time,
    which is exactly why the labels are worth maintaining."""
    return (
        cluster_label_table(spark, sf_dir)
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
        .groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
    )


@query(
    "q_export_dedup_order",
    oracle=f"""
    WITH {_SQL_TOK.format(nh=N_HASHES)},
    {_SQL_MINHASH_PAIRS},
    {_SQL_SYM},
    {_closure_sql("doc_id")},
    reps AS (
      SELECT d.doc_id FROM documents d
      LEFT JOIN labels l ON l.doc_id = d.doc_id
      WHERE coalesce(l.cluster, d.doc_id) = d.doc_id
    ),
    h AS (SELECT doc_id, {_SQL_SHARD_HASH} AS hv FROM reps)
    SELECT doc_id,
           CAST(hv % {N_SHARDS} AS INTEGER) AS shard,
           CAST(row_number() OVER (PARTITION BY hv % {N_SHARDS}
                                   ORDER BY hv, doc_id) AS BIGINT) AS pos
    FROM h
    """,
)
def q_export_dedup_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEDUPED training order (r10): the export order of the corpus'
    cluster REPRESENTATIVES only — the keep-one-per-family policy
    (keep = doc_id == its component label, q_dedup_clusters' contract)
    composed with q_train_order's deterministic (shard, pos)
    assignment.  This is the curate -> dedup -> export composition a
    production run actually ships: positions are dense over the
    SURVIVORS (a fresh per-shard window over the filtered set, not a
    filter of the full-corpus positions).  Serving cost is one scan of
    the maintained 'clusters' artifact + the shard-key window the
    export writer pays anyway; no graph traversal at query time."""
    from pyspark.sql import Window

    from zebra_spark.queries.text import N_SHARDS, shard_hash_col

    reps = (
        cluster_label_table(spark, sf_dir)
        .filter(F.col("doc_id") == F.col("cluster"))
        .select("doc_id")
    )
    w = Window.partitionBy("shard").orderBy("hv", "doc_id")
    return (
        reps.select("doc_id", shard_hash_col().alias("hv"))
        .withColumn("shard", (F.col("hv") % N_SHARDS).cast("int"))
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .select("doc_id", "shard", "pos")
    )


EVAL_MOD = 50  # fixture eval-set membership: doc_id % 50 == 0 (~2%)


@query(
    "q_cluster_takedown",
    oracle=f"""
    WITH {_SQL_TOK.format(nh=N_HASHES)},
    {_SQL_MINHASH_PAIRS},
    kept_edges AS (
      SELECT doc_a, doc_b FROM edges
      WHERE doc_a % {EVAL_MOD} <> 0 AND doc_b % {EVAL_MOD} <> 0
    ),
    sym AS MATERIALIZED (
      SELECT doc_a AS a, doc_b AS b FROM kept_edges
      UNION ALL SELECT doc_b, doc_a FROM kept_edges
    ),
    {_closure_sql("doc_id")}
    SELECT d.doc_id, coalesce(l.cluster, d.doc_id) AS cluster
    FROM documents d LEFT JOIN labels l ON l.doc_id = d.doc_id
    WHERE d.doc_id % {EVAL_MOD} <> 0
    """,
)
def q_cluster_takedown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Takedown on the MAINTAINED cluster labels, hash-gated (r9):
    removing the doc_id % {EVAL_MOD} == 0 cohort via
    graph.remove_and_relabel — untouched clusters keep their labels
    verbatim, only components that CONTAINED a removed doc re-cluster
    over their induced subgraph — must equal the oracle's from-scratch
    closure over the surviving corpus.  Merging had incremental
    maintenance (q_cluster_delta); this closes the removal side, so
    the 'clusters' artifact now has the same takedown story as the
    pair tables (splits included, which star-union cannot express)."""
    from zebra_spark.graph import remove_and_relabel
    from zebra_spark.io import load

    docs = load(spark, sf_dir, "documents").select("doc_id")
    removed = docs.filter(F.col("doc_id") % EVAL_MOD == 0)
    labels = cluster_label_table(spark, sf_dir).select(
        F.col("doc_id").alias("id"), F.col("cluster").alias("component")
    )
    edges = threshold_edges(pair_table(spark, sf_dir))
    return remove_and_relabel(labels, edges, removed).select(
        F.col("id").alias("doc_id"), F.col("component").alias("cluster")
    )


@query("q_cluster_delta", oracle=_SQL_CLUSTERS_ORACLE)
def q_cluster_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental CLUSTER maintenance (r8): the post-batch component
    assignment computed from the PRE-batch labels plus the batch's pair
    DELTA — never re-traversing the full pair graph — must equal the
    full-rebuild clustering, and the oracle is q_dedup_clusters'
    from-scratch recursive closure verbatim, so the incremental path
    itself sits at the driver hash gate.

    Production shape: `labels` is a maintained artifact (like the pair
    tables); one ingest tick thresholds pair_table_delta into delta
    edges and runs graph.incremental_components over star(labels) ∪
    delta — |V| + |delta| edges with old components at diameter 1 —
    instead of CC over the whole maintained pair table.  The pre-batch
    labels come from base_cluster_labels (derived-cached fixture
    scaffolding, shared with the nightly tick), exactly like the other
    delta gates."""
    from zebra_spark.graph import incremental_components
    from zebra_spark.io import load

    docs = load(spark, sf_dir, "documents").select(F.col("doc_id").alias("id"))
    labels = base_cluster_labels(spark, sf_dir)

    batch = docs.filter(F.col("id") % 10 == 0)
    delta_edges = (
        threshold_edges(
            pair_table_delta(
                spark, sf_dir, batch.select(F.col("id").alias("doc_id"))
            )
        )
        .localCheckpoint()  # CC iterates over this frame; cut the
        # band-join lineage once instead of per round
    )
    merged = incremental_components(labels, delta_edges, batch)
    return merged.select(
        F.col("id").alias("doc_id"),
        F.col("component").alias("cluster"),
        F.when(F.col("component") == F.col("id"), 1).otherwise(0)
        .cast("int")
        .alias("keep"),
    )


DECON_THRESHOLD = 0.7  # containment level that flags contamination


@query(
    "q_eval_decontaminate",
    oracle=f"""
    WITH {_SQL_TOK.format(nh=N_HASHES)},
    {_SQL_MINHASH_CORE},
    scored AS (
      SELECT i.doc_a, i.doc_b,
             i.n_common * 1.0 / least(sa.n, sb.n) AS cont
      FROM inter i
      JOIN sz sa ON sa.doc_id = i.doc_a
      JOIN sz sb ON sb.doc_id = i.doc_b
    ),
    ev AS (
      SELECT CASE WHEN doc_a % {EVAL_MOD} = 0 THEN doc_a ELSE doc_b END
               AS eval_id,
             CASE WHEN doc_a % {EVAL_MOD} = 0 THEN doc_b ELSE doc_a END
               AS train_id,
             cont
      FROM scored
      WHERE (doc_a % {EVAL_MOD} = 0) <> (doc_b % {EVAL_MOD} = 0)
        AND cont >= {DECON_THRESHOLD}
    ),
    best AS (
      SELECT eval_id, train_id, cont,
             row_number() OVER (PARTITION BY eval_id
               ORDER BY cont DESC, train_id) AS rk
      FROM ev
    )
    SELECT d.doc_id AS eval_id,
           CAST(CASE WHEN b.train_id IS NULL THEN 0 ELSE 1 END AS INTEGER)
             AS contaminated,
           coalesce(b.train_id, -1) AS worst_train_id,
           {sql_rnd("coalesce(b.cont, 0.0)")} AS containment
    FROM documents d
    LEFT JOIN (SELECT * FROM best WHERE rk = 1) b ON b.eval_id = d.doc_id
    WHERE d.doc_id % {EVAL_MOD} = 0
    """,
)
def q_eval_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark DECONTAMINATION: flag every eval-set document (fixture
    membership: doc_id % {EVAL_MOD} == 0) whose token containment
    against ANY training document reaches {DECON_THRESHOLD} — the
    overlap audit run before training so benchmark answers don't leak
    into the corpus (the n-gram-overlap decontamination of the GPT-3 /
    Gopher appendices, on this engine's banded-MinHash candidates with
    exact containment verification).  Containment (|A∩B|/min) rather
    than Jaccard: a short eval item quoted inside a long training doc
    is exactly the case symmetric similarity misses.

    Reads the shared pair table, keeps only eval x train pairs, and
    takes a per-eval-doc argmax over candidate matches — at 100 TB the
    eval side is tiny, so this is a broadcast-filtered scan of the
    maintained pair table; unflagged eval docs are emitted with
    containment 0."""
    from zebra_spark.io import load
    from pyspark.sql import Window

    scored = pair_table(spark, sf_dir, N_HASHES, N_BANDS)
    cont = F.col("n_common") / F.least(F.col("na"), F.col("nb"))
    is_ev_a = F.col("doc_a") % EVAL_MOD == 0
    is_ev_b = F.col("doc_b") % EVAL_MOD == 0
    ev = (
        scored.withColumn("cont", cont)
        .filter(is_ev_a != is_ev_b)
        .filter(F.col("cont") >= DECON_THRESHOLD)
        .select(
            F.when(is_ev_a, F.col("doc_a")).otherwise(F.col("doc_b"))
            .alias("eval_id"),
            F.when(is_ev_a, F.col("doc_b")).otherwise(F.col("doc_a"))
            .alias("train_id"),
            "cont",
        )
    )
    w = Window.partitionBy("eval_id").orderBy(F.col("cont").desc(), "train_id")
    best = (
        ev.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("eval_id", "train_id", "cont")
    )
    eval_docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") % EVAL_MOD == 0)
    )
    return eval_docs.join(
        best, eval_docs.doc_id == best.eval_id, "left"
    ).select(
        F.col("doc_id").alias("eval_id"),
        F.when(F.col("train_id").isNull(), 0).otherwise(1).cast("int")
        .alias("contaminated"),
        F.coalesce("train_id", F.lit(-1).cast("bigint"))
        .alias("worst_train_id"),
        rnd(F.coalesce(F.col("cont"), F.lit(0.0))).alias("containment"),
    )


PR_ITERS = 3  # fixed power-iteration count (unrolled in the oracle)
PR_DAMP = 0.85


def _sql_pr_iter(prev: str, out: str) -> str:
    """One unrolled PageRank step over sym/deg/nn (DuckDB dialect).
    Each stage AS MATERIALIZED: DuckDB 1.0 re-executes a plain CTE per
    reference, so an un-materialized 3-step chain over the minhash
    edge derivation re-ran the whole upstream per step (>80 GB spill
    at sf0.1 — the reason this oracle sat on the sweep's exclusion
    list until r15)."""
    return f"""
    {out} AS MATERIALIZED (
      SELECT s.b AS id, (SELECT {1 - PR_DAMP} / n FROM nn)
               + {PR_DAMP} * sum({prev}.r / {prev}.d) AS r
      FROM sym s JOIN {prev} ON {prev}.id = s.a GROUP BY s.b
    ),
    {out}d AS MATERIALIZED (
      SELECT {out}.id, {out}.r, deg.d FROM {out}
      JOIN deg ON deg.id = {out}.id
    )"""


@query(
    "q_graph_pagerank",
    oracle=f"""
    WITH {_SQL_TOK.format(nh=N_HASHES)},
    {_SQL_MINHASH_PAIRS},
    {_SQL_SYM},
    deg AS MATERIALIZED (SELECT a AS id, count(*) AS d FROM sym GROUP BY a),
    nn AS (SELECT count(*) AS n FROM deg),
    r0d AS (SELECT id, (SELECT 1.0 / n FROM nn) AS r, d FROM deg),
    {','.join(_sql_pr_iter(f'r{i}d', f'r{i + 1}') for i in range(PR_ITERS))}
    SELECT f.id AS doc_id, CAST(f.d AS BIGINT) AS degree,
           {sql_rnd(f"f.r * (SELECT n FROM nn)")} AS pagerank
    FROM r{PR_ITERS}d f
    """,
)
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the MinHash near-dup graph ({PR_ITERS} power
    iterations, damping {PR_DAMP}) — ranks documents by how central they
    are in the duplication structure (a high-rank doc is the "template"
    a boilerplate family copies from; the curation signal for picking
    canonical representatives beyond min-id).  The graph is
    symmetrized, so every node has out-edges and there is no dangling
    mass; ranks are emitted scaled by n (mean 1.0) so the 4-decimal
    hash-normalization keeps resolution at any corpus size.

    Spark side: the textbook distributed formulation — ranks live in a
    (id, r, d) frame co-shuffled with the edge list on the source key
    each iteration, contributions aggregate on the destination key;
    per-iteration cost is two shuffles of the EDGE frame, state per
    node is one double (no driver-side structure).  The edge frame is
    tracked_persist()ed once and reused by all {PR_ITERS} iterations —
    without it every iteration would recompute the MinHash candidate
    pipeline.  Oracle: the same {PR_ITERS} steps unrolled as CTEs."""
    pairs = QUERIES["q_dedup_minhash"](spark, sf_dir)
    sym = tracked_persist(
        pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .unionAll(
            pairs.select(F.col("doc_b").alias("a"), F.col("doc_a").alias("b"))
        )
    )
    # deg is embedded in every iteration's ranks lineage (and in nn's);
    # unpersisted it re-shuffles the full edge frame ~2x per iteration
    # (measured at sf0.1: 36.0 -> 30.5 cold / 23.7 warm, the MinHash
    # pair-generation floor being ~21 s of that)
    deg = tracked_persist(
        sym.groupBy(F.col("a").alias("id")).agg(
            F.count(F.lit(1)).alias("d")
        )
    )
    nn = deg.agg(F.count(F.lit(1)).alias("n"))
    ranks = deg.crossJoin(F.broadcast(nn)).select(
        "id", (F.lit(1.0) / F.col("n")).alias("r"), "d"
    )
    for _ in range(PR_ITERS):
        contrib = (
            sym.join(ranks, sym["a"] == ranks["id"])
            .groupBy(F.col("b").alias("cid"))
            .agg(F.sum(F.col("r") / F.col("d")).alias("c"))
        )
        ranks = (
            deg.crossJoin(F.broadcast(nn))
            .join(contrib, F.col("id") == F.col("cid"))
            .select(
                "id",
                (
                    F.lit(1 - PR_DAMP) / F.col("n")
                    + F.lit(PR_DAMP) * F.col("c")
                ).alias("r"),
                "d",
            )
        )
        # Materialize each iteration (|nodes| rows — bounded): without
        # this, iteration i's lazy lineage re-executes iterations
        # 0..i-1 on every reference, an O(I^2) recompute (measured
        # 1.8/3.1/5.2 s for the three chains at sf0.1).  Same
        # lineage-cut discipline as graph.connected_components.
        ranks = tracked_persist(ranks)
        ranks.count()
    return ranks.crossJoin(F.broadcast(nn)).select(
        F.col("id").alias("doc_id"),
        F.col("d").cast("bigint").alias("degree"),
        rnd(F.col("r") * F.col("n")).alias("pagerank"),
    )


@query(
    "q_dedup_cross_lang",
    oracle=f"""
    WITH {_SQL_TOK.format(nh=N_HASHES)},
    {_SQL_MINHASH_PAIRS},
    m AS (
      SELECT least(la.lang, lb.lang) AS lang_1,
             greatest(la.lang, lb.lang) AS lang_2,
             count(*) AS n_pairs
      FROM edges e
      JOIN documents la ON la.doc_id = e.doc_a
      JOIN documents lb ON lb.doc_id = e.doc_b
      GROUP BY 1, 2
    )
    SELECT lang_1, lang_2, n_pairs,
           {sql_rnd("n_pairs * 1.0 / sum(n_pairs) OVER ()")} AS share
    FROM m
    """,
)
def q_dedup_cross_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-LANGUAGE near-dup contamination matrix: MinHash near-dup
    pairs bucketed by the (unordered) language pair of their endpoints,
    with each bucket's share of all near-dup mass.  Off-diagonal mass
    is the signal a multilingual corpus audit needs before training:
    machine-translated copies, code-switched scrapes, and
    language-mislabeled duplicates all show up as cross-lang near-dup
    pairs that per-language dedup would silently miss.  Reads the
    shared pair table (dedup.pair_table) + one documents (doc_id, lang)
    projection, so the audit is two broadcast-ready joins over |edges|
    regardless of corpus size; the share window runs over <= |langs|^2
    aggregated rows."""
    from zebra_spark.io import load
    from pyspark.sql import Window

    pairs = _minhash_pairs(spark, sf_dir, N_HASHES, N_BANDS)
    langs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    la = langs.select(F.col("doc_id").alias("doc_a"), F.col("lang").alias("ln_a"))
    lb = langs.select(F.col("doc_id").alias("doc_b"), F.col("lang").alias("ln_b"))
    m = (
        pairs.join(la, "doc_a")
        .join(lb, "doc_b")
        .select(
            F.least("ln_a", "ln_b").alias("lang_1"),
            F.greatest("ln_a", "ln_b").alias("lang_2"),
        )
        .groupBy("lang_1", "lang_2")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
    w = Window.partitionBy()
    return m.select(
        "lang_1",
        "lang_2",
        "n_pairs",
        rnd(F.col("n_pairs") / F.sum("n_pairs").over(w)).alias("share"),
    )


@query(
    "q_graph_degree_hist",
    oracle=f"""
    WITH {_SQL_TOK.format(nh=N_HASHES)},
    {_SQL_MINHASH_PAIRS},
    sym AS (
      SELECT doc_a AS a, doc_b AS b FROM edges
      UNION ALL SELECT doc_b, doc_a FROM edges
    ),
    deg AS (SELECT a AS doc_id, count(*) AS degree FROM sym GROUP BY a)
    SELECT CAST(coalesce(deg.degree, 0) AS BIGINT) AS degree,
           count(*) AS n_docs
    FROM documents d LEFT JOIN deg ON deg.doc_id = d.doc_id
    GROUP BY coalesce(deg.degree, 0)
    """,
)
def q_graph_degree_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup DEGREE histogram — the corpus-duplication health view:
    for every document, how many near-dup partners (MinHash edges,
    Jaccard >= {MINHASH_THRESHOLD}) it has, aggregated to (degree,
    n_docs) — isolated docs included at degree 0.  A heavy right tail
    here is the first warning of boilerplate/template families before
    any clustering runs; at 100 TB this reads the shared pair table
    (dedup.pair_table) plus one corpus id scan, so the audit costs two
    shuffles of |edges| + |docs| regardless of how the corpus grew."""
    from zebra_spark.io import load

    pairs = QUERIES["q_dedup_minhash"](spark, sf_dir)
    sym = pairs.select(F.col("doc_a").alias("id")).unionAll(
        pairs.select(F.col("doc_b").alias("id"))
    )
    deg = sym.groupBy("id").agg(F.count(F.lit(1)).alias("degree"))
    docs = load(spark, sf_dir, "documents").select("doc_id")
    return (
        docs.join(deg, docs.doc_id == deg.id, "left")
        .select(F.coalesce("degree", F.lit(0)).cast("bigint").alias("degree"))
        .groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


SEMC_TH = 0.65  # cosine-distance edge threshold for semantic clustering

_SQL_SEMC_ORACLE = f"""
    WITH
    e AS MATERIALIZED (
      SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    seeds AS (SELECT vec_id AS cell_id, emb AS ce FROM e
              WHERE vec_id < greatest({NDUP_CELLS},
                CAST(floor((SELECT count(*) FROM e) / {NDUP_PER_CELL}.0)
                     AS BIGINT))),
    assign AS (
      SELECT vec_id, cell_id FROM (
        SELECT e.vec_id, s.cell_id,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 {zf.sql_metric("l2sq", a="e.emb", b="s.ce", dim=64)}, s.cell_id)
                 AS rk
        FROM e CROSS JOIN seeds s
      ) WHERE rk <= {NDUP_ASSIGN}
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM assign a JOIN assign b
        ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
    ),
    edges AS MATERIALIZED (
      SELECT c.id_a, c.id_b
      FROM cand c
      JOIN e ea ON ea.vec_id = c.id_a
      JOIN e eb ON eb.vec_id = c.id_b
      WHERE {zf.sql_metric("cosine", a="ea.emb", b="eb.emb", dim=64)}
            <= {SEMC_TH}
    ),
    sym AS MATERIALIZED (
      SELECT id_a AS a, id_b AS b FROM edges
      UNION ALL SELECT id_b, id_a FROM edges
    ),
    {_closure_sql("vec_id")}
    SELECT v.vec_id,
           coalesce(l.cluster, v.vec_id) AS cluster,
           CAST(CASE WHEN coalesce(l.cluster, v.vec_id) = v.vec_id
                THEN 1 ELSE 0 END AS INTEGER) AS keep
    FROM e v LEFT JOIN labels l ON l.vec_id = v.vec_id
    """


@query("q_semantic_clusters", oracle=_SQL_SEMC_ORACLE)
def q_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC cluster dedup: connected components over the
    embedding-cosine near-dup graph (edges = IVF-blocked candidate
    pairs with exact cosine distance <= {SEMC_TH}), keep the min-id
    representative per component.

    The embedding-space twin of q_dedup_clusters: same pointer-doubling
    CC engine (zebra_spark.graph), different edge generator — IVF
    multi-assign blocking keeps candidate generation ~R^2 n^2 / 2C with
    C growing with n, so the edge stage never goes quadratic at scale.
    Together with the lexical pipeline this is the two-view dedup a
    training corpus needs: MinHash catches copies, cosine catches
    paraphrases."""
    from zebra_spark.graph import connected_components

    e = embeddings_d(spark, sf_dir).select("vec_id", "emb")
    edges = (
        cosine_pair_table(spark, sf_dir)
        .filter(F.col("dist") <= SEMC_TH)
        .select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    comp = connected_components(
        e.select(F.col("vec_id").alias("id")), edges, edges_cheap=True
    )
    return comp.select(
        F.col("id").alias("vec_id"),
        F.col("component").alias("cluster"),
        F.when(F.col("component") == F.col("id"), 1).otherwise(0)
        .cast("int")
        .alias("keep"),
    )


@query("q_semantic_cluster_delta", oracle=_SQL_SEMC_ORACLE)
def q_semantic_cluster_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SEMANTIC cluster maintenance — the embedding-space
    twin of q_cluster_delta: pre-batch labels (a maintained artifact in
    production) star-collapsed and merged with the batch's thresholded
    cosine pair delta through graph.incremental_components, hash-gated
    against q_semantic_clusters' from-scratch recursive closure.  With
    this, BOTH views' full chain — pair table, assignment, clusters —
    maintains per batch instead of rebuilding per snapshot."""
    from zebra_spark.graph import connected_components, incremental_components

    is_new = (F.col("id_a") % 10 == 0) | (F.col("id_b") % 10 == 0)
    ids = embeddings_d(spark, sf_dir).select(F.col("vec_id").alias("id"))

    base_edges = (
        cosine_pair_table(spark, sf_dir)
        .filter(~is_new)
        .filter(F.col("dist") <= SEMC_TH)
        .select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    base_nodes = ids.filter(F.col("id") % 10 != 0)
    labels = connected_components(base_nodes, base_edges, edges_cheap=True)

    batch = ids.filter(F.col("id") % 10 == 0)
    delta_edges = (
        cosine_pair_table_delta(
            spark, sf_dir, new_ids=batch.select(F.col("id").alias("vec_id"))
        )
        .filter(F.col("dist") <= SEMC_TH)
        .select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .localCheckpoint()  # cut the cell-join lineage once, not per CC round
    )
    merged = incremental_components(labels, delta_edges, batch)
    return merged.select(
        F.col("id").alias("vec_id"),
        F.col("component").alias("cluster"),
        F.when(F.col("component") == F.col("id"), 1).otherwise(0)
        .cast("int")
        .alias("keep"),
    )


@query(
    "q_emb_knn_purity",
    oracle=f"""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb
               FROM embeddings),
    seeds AS (SELECT vec_id AS cell_id, emb AS ce FROM e
              WHERE vec_id < greatest({NDUP_CELLS},
                CAST(floor((SELECT count(*) FROM e) / {NDUP_PER_CELL}.0)
                     AS BIGINT))),
    assign AS (
      SELECT vec_id, cell_id FROM (
        SELECT e.vec_id, s.cell_id,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 {zf.sql_metric("l2sq", a="e.emb", b="s.ce", dim=64)}, s.cell_id)
                 AS rk
        FROM e CROSS JOIN seeds s
      ) WHERE rk <= {NDUP_ASSIGN}
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM assign a JOIN assign b
        ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
    ),
    d AS (
      SELECT c.id_a, c.id_b,
             {zf.sql_metric("cosine", a="ea.emb", b="eb.emb", dim=64)} AS dist
      FROM cand c
      JOIN e ea ON ea.vec_id = c.id_a
      JOIN e eb ON eb.vec_id = c.id_b
    ),
    sym AS (
      SELECT id_a AS id, id_b AS nbr, dist FROM d
      UNION ALL SELECT id_b, id_a, dist FROM d
    ),
    t10 AS (
      SELECT id, nbr FROM (
        SELECT id, nbr,
               row_number() OVER (PARTITION BY id ORDER BY dist, nbr) AS rk
        FROM sym
      ) WHERE rk <= 10
    ),
    p AS (
      SELECT t.id,
             avg(CASE WHEN el.label = en.label THEN 1.0 ELSE 0.0 END)
               AS purity
      FROM t10 t
      JOIN e el ON el.vec_id = t.id
      JOIN e en ON en.vec_id = t.nbr
      GROUP BY t.id
    )
    SELECT el.label, count(*) AS n_vecs,
           {sql_rnd("avg(p.purity)")} AS mean_purity
    FROM p JOIN e el ON el.vec_id = p.id
    GROUP BY el.label
    """,
)
def q_emb_knn_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN label PURITY per class: for each vector, the fraction of its
    10 nearest neighbours (cosine, IVF-blocked candidates) sharing its
    label, averaged per label — the standard embedding-space health
    audit (a well-trained space has high neighborhood label
    consistency; a label with low purity is entangled or mislabeled).
    Reads the shared cosine pair table, symmetrizes it, and takes a
    per-vector windowed top-10 — bounded by candidate fan-out, never
    the n^2 all-pairs kNN; vectors with no blocked candidate drop out
    on both engines identically."""
    from pyspark.sql import Window

    from zebra_spark.io import load

    labels = load(spark, sf_dir, "embeddings").select("vec_id", "label")
    d = cosine_pair_table(spark, sf_dir)
    sym = d.select(
        F.col("id_a").alias("id"), F.col("id_b").alias("nbr"), "dist"
    ).unionAll(
        d.select(F.col("id_b").alias("id"), F.col("id_a").alias("nbr"), "dist")
    )
    w = Window.partitionBy("id").orderBy("dist", "nbr")
    t10 = (
        sym.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select("id", "nbr")
    )
    li = labels.select(F.col("vec_id").alias("id"), F.col("label").alias("l_i"))
    ln = labels.select(F.col("vec_id").alias("nbr"), F.col("label").alias("l_n"))
    per_vec = (
        t10.join(li, "id")
        .join(ln, "nbr")
        .groupBy("id", "l_i")
        .agg(
            F.avg(
                F.when(F.col("l_i") == F.col("l_n"), 1.0).otherwise(0.0)
            ).alias("purity")
        )
    )
    return per_vec.groupBy(F.col("l_i").alias("label")).agg(
        F.count(F.lit(1)).alias("n_vecs"),
        rnd(F.avg("purity")).alias("mean_purity"),
    )


@query(
    "q_dedup_keep_best",
    oracle=f"""
    WITH {_SQL_TOK.format(nh=N_HASHES)},
    bits AS (
      SELECT t2.doc_id, params.j,
             CASE WHEN sum(CASE WHEN ((a * tid + b) % {P}) % 2 = 1
                               THEN 1 ELSE -1 END) > 0
                  THEN CAST(power(2, params.j) AS BIGINT) ELSE 0 END AS w
      FROM t2 CROSS JOIN params
      GROUP BY t2.doc_id, params.j
    ),
    fp AS (
      SELECT doc_id, CAST(sum(w) AS BIGINT) AS simhash
      FROM bits GROUP BY doc_id
    ),
    ranked AS (
      SELECT d.doc_id, f.simhash, d.n_chars,
             row_number() OVER (PARTITION BY f.simhash
               ORDER BY d.n_chars DESC, d.doc_id) AS rk,
             count(*) OVER (PARTITION BY f.simhash) AS group_size
      FROM documents d JOIN fp f ON f.doc_id = d.doc_id
    )
    SELECT doc_id, simhash, CAST(n_chars AS BIGINT) AS n_chars,
           CAST(group_size AS BIGINT) AS group_size
    FROM ranked WHERE rk = 1
    """,
)
def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-representative selection: group documents by SimHash
    fingerprint and keep the BEST doc per group (longest text, id
    tie-break) — the 'which copy do we train on' step that follows any
    near-dup grouping.  One window over the fingerprint groups; at
    scale this is the standard keep-rule pattern (quality argmax per
    cluster), swap n_chars for any quality score."""
    from pyspark.sql import Window

    from zebra_spark.io import load

    fp = QUERIES["q_dedup_simhash"](spark, sf_dir)
    d = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    joined = d.join(fp, "doc_id")
    w = Window.partitionBy("simhash").orderBy(F.col("n_chars").desc(), "doc_id")
    wc = Window.partitionBy("simhash")
    return (
        joined.withColumn("rk", F.row_number().over(w))
        .withColumn("group_size", F.count(F.lit(1)).over(wc))
        .filter(F.col("rk") == 1)
        .select(
            "doc_id",
            "simhash",
            F.col("n_chars").cast("bigint").alias("n_chars"),
            F.col("group_size").cast("bigint").alias("group_size"),
        )
    )


SIMHASH_HAM_MAX = 3  # pairs within this Hamming distance are near-dups
SIMHASH_BLOCKS = 4  # 16-bit fingerprint split into 4 nibbles


@query(
    "q_dedup_simhash_pairs",
    oracle=f"""
    WITH {_SQL_TOK.format(nh=N_HASHES)},
    bits AS (
      SELECT t2.doc_id, params.j,
             CASE WHEN sum(CASE WHEN ((a * tid + b) % {P}) % 2 = 1
                               THEN 1 ELSE -1 END) > 0
                  THEN CAST(power(2, params.j) AS BIGINT) ELSE 0 END AS w
      FROM t2 CROSS JOIN params
      GROUP BY t2.doc_id, params.j
    ),
    fp AS (
      SELECT doc_id, CAST(sum(w) AS BIGINT) AS simhash
      FROM bits GROUP BY doc_id
    ),
    blocks AS (
      SELECT doc_id, simhash, CAST(blk AS INTEGER) AS blk,
             (simhash >> (blk * 4)) & 15 AS key
      FROM fp CROSS JOIN range(0, {SIMHASH_BLOCKS}) t(blk)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.simhash AS sh_a, b.simhash AS sh_b
      FROM blocks a JOIN blocks b
        ON a.blk = b.blk AND a.key = b.key AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(sh_a, sh_b)) AS INTEGER) AS hamming
    FROM cand
    WHERE bit_count(xor(sh_a, sh_b)) <= {SIMHASH_HAM_MAX}
    """,
)
def q_dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup PAIRS — the canonical web-scale design: split
    the fingerprint into {SIMHASH_BLOCKS} blocks; by pigeonhole, any
    pair within Hamming distance {SIMHASH_HAM_MAX} shares at least one
    whole block, so candidates come from per-block equi-joins (shuffle
    on the 4-bit block key — bounded fan-out per bucket), then an exact
    popcount(xor) verify.  No quadratic step; the miss rate is ZERO for
    ham <= blocks-1 (pigeonhole, not probabilistic)."""
    fp = QUERIES["q_dedup_simhash"](spark, sf_dir)
    blocks = fp.select(
        "doc_id",
        "simhash",
        F.explode(
            F.expr(
                f"transform(sequence(0, {SIMHASH_BLOCKS - 1}),"
                f" blk -> struct(CAST(blk AS INT) AS blk,"
                f" shiftright(simhash, blk * 4) % 16 AS key))"
            )
        ).alias("b"),
    ).select("doc_id", "simhash", "b.blk", "b.key")
    blocks = tracked_persist(blocks)
    # persist: both join sides below reference `blocks`, whose chain is
    # the full 16-hash fingerprint aggregation (same plan-preserving
    # materialization rationale as _minhash_pairs)
    a = blocks.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"),
        "blk", "key",
    )
    b = blocks.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"),
        F.col("blk").alias("blk_b"), F.col("key").alias("key_b"),
    )
    cand = (
        a.join(
            b,
            (F.col("blk") == F.col("blk_b"))
            & (F.col("key") == F.col("key_b"))
            & (F.col("doc_a") < F.col("doc_b")),
        )
        .select("doc_a", "doc_b", "sh_a", "sh_b")
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("int")
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= SIMHASH_HAM_MAX)
        .select("doc_a", "doc_b", "hamming")
    )


# --- end-to-end curation pipeline (flagship composition) --------------------

CUR_MIN_TOKENS = 25
CUR_MIN_TTR = 0.33
CUR_DOMAIN_CAP = 15

_SQL_SIMHASH_FP = f"""
    bits AS (
      SELECT t2.doc_id, params.j,
             CASE WHEN sum(CASE WHEN ((a * tid + b) % {P}) % 2 = 1
                               THEN 1 ELSE -1 END) > 0
                  THEN CAST(power(2, params.j) AS BIGINT) ELSE 0 END AS w
      FROM t2 CROSS JOIN params
      GROUP BY t2.doc_id, params.j
    ),
    fp AS (
      SELECT doc_id, CAST(sum(w) AS BIGINT) AS simhash
      FROM bits GROUP BY doc_id
    )
"""


@query(
    "q_curation_pipeline",
    oracle=f"""
    WITH {_SQL_TOK.format(nh=N_HASHES)},
    {_SQL_SIMHASH_FP.strip()},
    tokn AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ),
    q AS (
      SELECT doc_id, count(*) AS n_tokens,
             count(DISTINCT word) AS n_distinct
      FROM tokn GROUP BY doc_id
    ),
    base AS (
      SELECT d.doc_id, d.source, d.n_chars, q.n_tokens,
             CASE WHEN q.n_tokens < {CUR_MIN_TOKENS} THEN 1 ELSE 0 END
               AS f_short,
             CASE WHEN q.n_distinct * 1.0 / q.n_tokens < {CUR_MIN_TTR}
                  THEN 1 ELSE 0 END AS f_lowq
      FROM documents d JOIN q ON q.doc_id = d.doc_id
    ),
    p12 AS (
      SELECT b.doc_id, b.source, b.n_chars, f.simhash
      FROM base b JOIN fp f ON f.doc_id = b.doc_id
      WHERE b.f_short = 0 AND b.f_lowq = 0
    ),
    dd AS (
      SELECT doc_id, row_number() OVER (
               PARTITION BY simhash ORDER BY n_chars DESC, doc_id) AS rk
      FROM p12
    ),
    p3 AS (
      SELECT p12.doc_id, p12.source, p12.n_chars
      FROM p12 JOIN dd ON dd.doc_id = p12.doc_id WHERE dd.rk = 1
    ),
    cap AS (
      SELECT doc_id, row_number() OVER (
               PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rk
      FROM p3
    )
    SELECT b.doc_id,
           CASE WHEN b.f_short = 1 THEN 'short'
                WHEN b.f_lowq = 1 THEN 'low_quality'
                WHEN dd.rk > 1 THEN 'dup'
                WHEN cap.rk > {CUR_DOMAIN_CAP} THEN 'domain_cap'
                ELSE 'ok' END AS reason,
           CAST(CASE WHEN b.f_short = 0 AND b.f_lowq = 0 AND dd.rk = 1
                      AND cap.rk <= {CUR_DOMAIN_CAP}
                THEN 1 ELSE 0 END AS INTEGER) AS kept
    FROM base b
    LEFT JOIN dd ON dd.doc_id = b.doc_id
    LEFT JOIN cap ON cap.doc_id = b.doc_id
    """,
)
def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE end-to-end curation query: length filter -> quality (TTR)
    filter -> SimHash keep-best dedup -> per-source domain cap, emitting
    every document with its kept flag and FIRST failing stage as the
    reason — the whole corpus-curation decision as one declarative
    plan.

    Composition of already-verified stages (q_text_quality's stats,
    q_dedup_simhash's fingerprint, q_dedup_keep_best's window,
    q_domain_cap's rank) in one DAG: a bounded handful of
    column-pruned corpus scans (token stats, fingerprint, doc
    metadata — each branch reads only its columns), two ranking
    windows over bounded keys (fingerprint groups, sources), and
    nothing quadratic.  At 100 TB you'd additionally materialize the
    per-doc token stats as a maintained table to collapse the scans;
    the decision logic is unchanged."""
    from pyspark.sql import Window

    from zebra_spark.io import load

    fp = QUERIES["q_dedup_simhash"](spark, sf_dir)
    tok = tokens(spark, sf_dir, distinct=False).select("doc_id", "word")
    q = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("word").alias("n_distinct"),
    )
    d = load(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    base = d.join(q, "doc_id").select(
        "doc_id",
        "source",
        "n_chars",
        F.when(F.col("n_tokens") < CUR_MIN_TOKENS, 1).otherwise(0).alias(
            "f_short"
        ),
        F.when(
            F.col("n_distinct") / F.col("n_tokens") < CUR_MIN_TTR, 1
        ).otherwise(0).alias("f_lowq"),
    )
    p12 = (
        base.filter((F.col("f_short") == 0) & (F.col("f_lowq") == 0))
        .join(fp, "doc_id")
        .select("doc_id", "source", "n_chars", "simhash")
    )
    wd = Window.partitionBy("simhash").orderBy(F.col("n_chars").desc(), "doc_id")
    dd = p12.withColumn("rk", F.row_number().over(wd)).select(
        "doc_id", "source", "n_chars", F.col("rk").alias("dd_rk")
    )
    wc = Window.partitionBy("source").orderBy(F.col("n_chars").desc(), "doc_id")
    cap = (
        dd.filter(F.col("dd_rk") == 1)
        .withColumn("cap_rk", F.row_number().over(wc))
        .select("doc_id", "cap_rk")
    )
    out = base.join(
        dd.select("doc_id", "dd_rk"), "doc_id", "left"
    ).join(cap, "doc_id", "left")
    reason = (
        F.when(F.col("f_short") == 1, "short")
        .when(F.col("f_lowq") == 1, "low_quality")
        .when(F.col("dd_rk") > 1, "dup")
        .when(F.col("cap_rk") > CUR_DOMAIN_CAP, "domain_cap")
        .otherwise("ok")
    )
    kept = (
        (F.col("f_short") == 0)
        & (F.col("f_lowq") == 0)
        & (F.col("dd_rk") == 1)
        & (F.col("cap_rk") <= CUR_DOMAIN_CAP)
    )
    return out.select(
        "doc_id",
        reason.alias("reason"),
        F.when(kept, 1).otherwise(0).cast("int").alias("kept"),
    )


@query(
    "q_split_leakage_safe",
    oracle=f"""
    WITH {_SQL_TOK.format(nh=N_HASHES)},
    {_SQL_MINHASH_PAIRS},
    {_SQL_SYM},
    {_closure_sql("doc_id")},
    assigned AS (
      SELECT d.doc_id,
             coalesce(l.cluster, d.doc_id) AS cluster,
             ((coalesce(l.cluster, d.doc_id) % 2147483648)
              * 1103515245 + 12345) % 1000 AS h
      FROM documents d LEFT JOIN labels l ON l.doc_id = d.doc_id
    )
    SELECT doc_id, cluster,
           CASE WHEN h < 800 THEN 'train'
                WHEN h < 900 THEN 'valid'
                ELSE 'test' END AS split
    FROM assigned
    """,
)
def q_split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAKAGE-SAFE train/valid/test assignment: split by the near-dup
    CLUSTER representative's hash, not the document's — every member of
    a near-dup cluster lands in the SAME split, so paraphrased copies
    of a training document can never leak into the eval set (the
    standard failure mode of per-document random splits on
    near-duplicated corpora).

    Composition: q_dedup_clusters' connected components (same CC
    engine, same MinHash edge generator) + q_split_assign's
    deterministic LCG bucketing applied to the cluster id.  Splits
    remain a pure function of content: re-runs, re-partitioning, and
    engine changes reproduce the identical assignment."""
    from zebra_spark.queries.text import SPLIT_A, SPLIT_M

    clusters = QUERIES["q_dedup_clusters"](spark, sf_dir).select(
        "doc_id", "cluster"
    )
    h = ((F.col("cluster") % SPLIT_M) * F.lit(SPLIT_A) + F.lit(12345)) % F.lit(
        1000
    )
    return clusters.select(
        "doc_id",
        "cluster",
        F.when(h < 800, "train").when(h < 900, "valid").otherwise("test")
        .alias("split"),
    )


@query(
    "q_graph_triangles",
    oracle=f"""
    WITH {_SQL_TOK.format(nh=N_HASHES)},
    {_SQL_MINHASH_PAIRS},
    deg AS MATERIALIZED (
      SELECT node, count(*) AS d FROM (
        SELECT doc_a AS node FROM edges
        UNION ALL SELECT doc_b FROM edges
      ) GROUP BY node
    ),
    tsym AS MATERIALIZED (
      SELECT doc_a AS node, doc_b AS nb FROM edges
      UNION ALL SELECT doc_b, doc_a FROM edges
    ),
    words AS MATERIALIZED (
      SELECT node, nb // 64 AS w,
             bit_or((1::UBIGINT) << CAST(nb % 64 AS INTEGER)) AS bits
      FROM tsym GROUP BY node, nb // 64
    ),
    -- LEFT JOINs on purpose: inner joins are freely reorderable and
    -- DuckDB's estimator picks words-x-words on w first (a ~2e9-row
    -- blowup; measured 709 s vs 167 s at sf0.1).  LEFT JOIN pins the
    -- streaming order edges -> wa -> wb; an edge endpoint always has
    -- words, so the result is identical to the inner join.
    tri AS MATERIALIZED (
      SELECT CAST(coalesce(sum(bit_count(wa.bits & wb.bits)), 0) / 3
                  AS BIGINT) AS n_tri
      FROM edges e
      LEFT JOIN words wa ON wa.node = e.doc_a
      LEFT JOIN words wb ON wb.node = e.doc_b AND wb.w = wa.w
    )
    SELECT (SELECT count(*) FROM deg) AS n_nodes,
           (SELECT count(*) FROM edges) AS n_edges,
           (SELECT CAST(sum(d * (d - 1)) / 2 AS BIGINT) FROM deg) AS n_wedges,
           (SELECT n_tri FROM tri) AS n_triangles,
           {sql_rnd("(SELECT n_tri FROM tri) * 3.0 /"
                    " (SELECT sum(d * (d - 1)) / 2 FROM deg)")} AS global_cc
    """,
)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the near-dup graph: node/edge/wedge/triangle
    counts and the global clustering coefficient (3·triangles/wedges) —
    one row.  A high coefficient says near-dups arrive as tight cliques
    (template families, mirrored sites) rather than chains, which is
    what justifies cluster-level dedup (keep one rep per component)
    over pairwise removal.

    Scale shape (r15): edges come FROM THE SHARED PAIR TABLE (one
    scan, a<b unique rows); the triangle count is PACKED-BITSET
    intersection, not wedge enumeration — per-node neighbor bitsets
    as (node, word, bits64) rows, then per edge the common-neighbor
    count is popcount(bits_a & bits_b) summed over shared words, and
    every triangle is counted once per edge, so /3.  The near-dup
    graph is quasi-clique (52% dense at sf0.1: 6.4M edges over 5k
    nodes, 22.0e9 wedges), so the classic oriented two-join — fan-out
    = the wedge count — is 40x more element-ops AND materializes the
    wedge stream (DuckDB spilled >60 GB on it; measured r15).  The
    bitset form streams |edges| x words/node rows (~0.5e9 at sf0.1)
    through two BROADCAST word-table joins — map-side only, bounded
    memory, and the word table is |nodes| x degree/64 rows, far under
    the broadcast ceiling even at 100x nodes.  Output is five
    numbers; nothing corpus-sized leaves the executors."""
    edges = _minhash_pairs(spark, sf_dir, N_HASHES, N_BANDS).select(
        "doc_a", "doc_b"
    )
    # wedges centered anywhere: sum over nodes of C(deg, 2)
    deg = (
        edges.select(F.col("doc_a").alias("node"))
        .unionAll(edges.select(F.col("doc_b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        (F.sum(F.col("d") * (F.col("d") - 1)) / 2)
        .cast("bigint")
        .alias("n_wedges"),
    )
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    # packed-bitset count: (node, word, bits) neighbor bitsets, AND +
    # popcount per edge over shared words, each triangle hit 3x (once
    # per edge), all expressions JVM-native (bit_or/shiftleft/bit_count
    # inside whole-stage codegen — no UDF, no wedge materialization)
    sym = edges.select(
        F.col("doc_a").alias("node"), F.col("doc_b").alias("nb")
    ).unionAll(
        edges.select(F.col("doc_b").alias("node"), F.col("doc_a").alias("nb"))
    )
    words = sym.groupBy(
        "node", (F.col("nb") / 64).cast("bigint").alias("w")
    ).agg(
        F.bit_or(
            F.expr("shiftleft(1L, CAST(nb % 64 AS INT))")
        ).alias("bits")
    )
    wa = words.select(
        F.col("node").alias("na"), F.col("w").alias("wwa"),
        F.col("bits").alias("ba"),
    )
    wb = words.select(
        F.col("node").alias("nbn"), F.col("w").alias("wwb"),
        F.col("bits").alias("bb"),
    )
    tri = (
        edges.join(F.broadcast(wa), F.col("doc_a") == F.col("na"))
        .join(
            F.broadcast(wb),
            (F.col("doc_b") == F.col("nbn")) & (F.col("wwa") == F.col("wwb")),
        )
        .agg(
            (
                F.coalesce(
                    F.sum(F.bit_count(F.col("ba").bitwiseAND(F.col("bb")))),
                    F.lit(0),
                ) / 3
            )
            .cast("bigint")
            .alias("n_triangles")
        )
    )
    return (
        stats.crossJoin(F.broadcast(n_edges))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            rnd(
                F.col("n_triangles") * 3.0 / F.col("n_wedges")
            ).alias("global_cc"),
        )
    )


@query(
    "q_graph_local_cc_hist",
    oracle=f"""
    WITH {_SQL_TOK.format(nh=N_HASHES)},
    {_SQL_MINHASH_PAIRS},
    tsym AS MATERIALIZED (
      SELECT doc_a AS node, doc_b AS nb FROM edges
      UNION ALL SELECT doc_b, doc_a FROM edges
    ),
    words AS MATERIALIZED (
      SELECT node, nb // 64 AS w,
             bit_or((1::UBIGINT) << CAST(nb % 64 AS INTEGER)) AS bits
      FROM tsym GROUP BY node, nb // 64
    ),
    -- per-EDGE common-neighbor count, once per a<b pair (LEFT JOINs
    -- pin the streaming order, as in q_graph_triangles' tri CTE)
    ec AS MATERIALIZED (
      SELECT e.doc_a, e.doc_b,
             coalesce(sum(bit_count(wa.bits & wb.bits)), 0) AS c
      FROM edges e
      LEFT JOIN words wa ON wa.node = e.doc_a
      LEFT JOIN words wb ON wb.node = e.doc_b AND wb.w = wa.w
      GROUP BY e.doc_a, e.doc_b
    ),
    pernode AS MATERIALIZED (
      SELECT node, sum(c) AS tri2, count(*) AS d FROM (
        SELECT doc_a AS node, c FROM ec
        UNION ALL SELECT doc_b, c FROM ec
      ) GROUP BY node
    )
    SELECT CAST((10 * tri2) // (d * (d - 1)) AS INTEGER) AS cc_decile,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM pernode WHERE d >= 2
    GROUP BY 1
    """,
)
def q_graph_local_cc_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cc_decile, n_docs): histogram of the per-document LOCAL
    clustering coefficient over the near-dup graph — the per-doc twin
    of q_graph_triangles' global number.  cc(v) = triangles through v
    / C(deg v, 2); decile 10 is a doc whose neighbourhood is a closed
    clique (a template family member — safe to keep-one), low deciles
    are bridge documents stitching otherwise-unrelated families (the
    rows a takedown or threshold change swings, worth human eyes).
    Degree-1 docs have no defined coefficient and are excluded.

    Bucketing is INTEGER arithmetic end-to-end — decile =
    (10 * Σ_edge common-neighbors) intdiv (d·(d-1)), with the edge sum
    counting each triangle at v twice and C(d,2) doubled to match —
    so both engines bucket boundary values identically (no float
    round-trip at 0.x999...).

    Scale shape: reuses q_graph_triangles' packed-bitset machinery —
    per-edge common-neighbor counts from one broadcast-word-join
    stream (never wedge enumeration), then each edge's count credits
    BOTH endpoints (one union + groupBy on |edges| rows), so the
    per-node pass adds nothing corpus-quadratic."""
    edges = _minhash_pairs(spark, sf_dir, N_HASHES, N_BANDS).select(
        "doc_a", "doc_b"
    )
    sym = edges.select(
        F.col("doc_a").alias("node"), F.col("doc_b").alias("nb")
    ).unionAll(
        edges.select(F.col("doc_b").alias("node"), F.col("doc_a").alias("nb"))
    )
    words = sym.groupBy(
        "node", (F.col("nb") / 64).cast("bigint").alias("w")
    ).agg(
        F.bit_or(F.expr("shiftleft(1L, CAST(nb % 64 AS INT))")).alias("bits")
    )
    wa = words.select(
        F.col("node").alias("na"), F.col("w").alias("wwa"),
        F.col("bits").alias("ba"),
    )
    wb = words.select(
        F.col("node").alias("nbn"), F.col("w").alias("wwb"),
        F.col("bits").alias("bb"),
    )
    ec = (
        edges.join(F.broadcast(wa), F.col("doc_a") == F.col("na"))
        .join(
            F.broadcast(wb),
            (F.col("doc_b") == F.col("nbn")) & (F.col("wwa") == F.col("wwb")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(
            F.sum(F.bit_count(F.col("ba").bitwiseAND(F.col("bb"))))
            .alias("c")
        )
    )
    # degree from the TRUE edge list, triangle credits left-joined on:
    # a zero-overlap edge never reaches ec (the inner word join finds
    # no shared word index), but it still counts toward degree
    deg = sym.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    tric = (
        ec.select(F.col("doc_a").alias("node"), "c")
        .unionAll(ec.select(F.col("doc_b").alias("node"), "c"))
        .groupBy("node")
        .agg(F.sum("c").alias("tri2"))
    )
    pernode = (
        deg.join(tric, "node", "left")
        .withColumn("tri2", F.coalesce("tri2", F.lit(0)))
        .filter(F.col("d") >= 2)
    )
    return (
        pernode.select(
            F.expr("CAST((10 * tri2) DIV (d * (d - 1)) AS INT)")
            .alias("cc_decile")
        )
        .groupBy("cc_decile")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@query(
    "q_semantic_incremental",
    oracle=f"""
    WITH {_SQL_COSINE_ASSIGN.strip()},
    scored AS (
      SELECT c.id_a, c.id_b,
             {zf.sql_metric("cosine", a="ea.emb", b="eb.emb", dim=64)} AS dist
      FROM cand c
      JOIN e ea ON ea.vec_id = c.id_a
      JOIN e eb ON eb.vec_id = c.id_b
      WHERE (c.id_a % 10 = 0) <> (c.id_b % 10 = 0)
    ),
    oriented AS (
      SELECT CASE WHEN id_a % 10 = 0 THEN id_a ELSE id_b END AS vec_id,
             CASE WHEN id_a % 10 = 0 THEN id_b ELSE id_a END AS match_id,
             dist
      FROM scored WHERE dist <= {SEMC_TH}
    ),
    best AS (
      SELECT vec_id, match_id, dist,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY dist, match_id) AS rk
      FROM oriented
    )
    SELECT v.vec_id,
           CAST(CASE WHEN b.match_id IS NULL THEN 0 ELSE 1 END AS INTEGER)
             AS is_dup,
           coalesce(b.match_id, -1) AS dup_of,
           {sql_rnd("coalesce(b.dist, -1.0)")} AS cos_dist
    FROM (SELECT vec_id FROM e WHERE vec_id % 10 = 0) v
    LEFT JOIN (SELECT * FROM best WHERE rk = 1) b ON b.vec_id = v.vec_id
    """,
)
def q_semantic_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest SEMANTIC screen — the embedding-space twin of
    q_dedup_incremental: flag each new vector (vec_id % 10 == 0) as a
    paraphrase-duplicate of its closest corpus match (cosine distance
    <= {SEMC_TH}) or as novel.  Rides cosine_pair_table_delta, so the
    driver gate checks the same maintained-delta path a production
    semantic-dedup ingest runs; together with the lexical screen this
    is the two-view ingest gate (copies AND paraphrases)."""
    new_ids = (
        embeddings_d(spark, sf_dir)
        .select("vec_id")
        .filter(F.col("vec_id") % 10 == 0)
    )
    delta = cosine_pair_table_delta(spark, sf_dir, new_ids)
    flags = new_ids.withColumn("_n", F.lit(1))
    fa = flags.select(F.col("vec_id").alias("id_a"), F.col("_n").alias("an"))
    fb = flags.select(F.col("vec_id").alias("id_b"), F.col("_n").alias("bn"))
    oriented = (
        delta.join(fa, "id_a", "left")
        .join(fb, "id_b", "left")
        .filter(F.coalesce("an", F.lit(0)) != F.coalesce("bn", F.lit(0)))
        .select(
            F.when(F.col("an") == 1, F.col("id_a"))
            .otherwise(F.col("id_b"))
            .alias("vec_n"),
            F.when(F.col("an") == 1, F.col("id_b"))
            .otherwise(F.col("id_a"))
            .alias("match_id"),
            "dist",
        )
        .filter(F.col("dist") <= SEMC_TH)
    )
    from pyspark.sql import Window

    w = Window.partitionBy("vec_n").orderBy("dist", "match_id")
    best = (
        oriented.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("vec_n", "match_id", "dist")
    )
    return new_ids.join(best, new_ids.vec_id == best.vec_n, "left").select(
        "vec_id",
        F.when(F.col("match_id").isNull(), 0).otherwise(1).cast("int")
        .alias("is_dup"),
        F.coalesce(F.col("match_id"), F.lit(-1).cast("bigint")).alias("dup_of"),
        rnd(F.coalesce(F.col("dist"), F.lit(-1.0))).alias("cos_dist"),
    )
