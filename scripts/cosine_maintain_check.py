"""Exactly-once COSINE state maintenance at sf0.1 (r8): cost profile of
the epoch-keyed semantic streaming path vs the one-shot batch build —
the cosine twin of scripts/stream_maintain_check.py.

Ingests the sf0.1 embeddings corpus through maintain_cosine_tables in
N epoch batches (seeds frozen up front from the full corpus so the
final state is comparable to the batch build), recording per-epoch
wall-clock, an epoch replay (idempotence assert), compaction cost +
file counts, and final pairs/ equality vs cosine_pair_table.

Not part of the test suite (runtime); results recorded in SCALING.md.

    python scripts/cosine_maintain_check.py [n_epochs]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.1"


def _n_parquet_files(p: str) -> int:
    return sum(
        1 for _, _, files in os.walk(p) for f in files if f.endswith(".parquet")
    )


def main() -> None:
    n_epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 10

    from pyspark.sql import functions as F

    import zebra_spark
    from zebra_spark.caching import release_caches
    from zebra_spark.io import embeddings_d
    from zebra_spark.queries import dedup as dd
    from zebra_spark.session import get_spark
    from zebra_spark.streaming import (
        compact_cosine_state,
        init_cosine_state,
        maintain_cosine_tables,
        read_cosine_state,
    )

    zebra_spark.load_all_queries()
    spark = get_spark("cosine-maintain-check", cpus="32")
    e = embeddings_d(spark, SF_DIR).select("vec_id", "emb")
    state = tempfile.mkdtemp(prefix="cosine_check_") + "/state"

    out: dict[str, object] = {"n_epochs": n_epochs, "n_vecs": e.count()}
    t0 = time.perf_counter()
    init_cosine_state(spark, state, dd.cosine_seed_table(spark, SF_DIR))
    out["init_s"] = round(time.perf_counter() - t0, 2)

    epoch_times = []
    for ep in range(n_epochs):
        batch = e.filter(F.col("vec_id") % n_epochs == ep)
        t0 = time.perf_counter()
        maintain_cosine_tables(spark, state, batch, epoch_id=ep)
        epoch_times.append(round(time.perf_counter() - t0, 2))
    out["epoch_s"] = epoch_times

    def pair_stats():
        pairs = read_cosine_state(spark, state)[2]
        r = pairs.groupBy().agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.bit_xor(
                    F.xxhash64("id_a", "id_b", F.round("dist", 10))
                ),
                F.lit(0),
            ).alias("h"),
        ).collect()[0]
        return int(r.n), int(r.h)

    n1, h1 = pair_stats()
    t0 = time.perf_counter()
    maintain_cosine_tables(
        spark, state,
        e.filter(F.col("vec_id") % n_epochs == n_epochs - 1),
        epoch_id=n_epochs - 1,
    )
    out["replay_s"] = round(time.perf_counter() - t0, 2)
    out["replay_identical"] = pair_stats() == (n1, h1)

    out["files_before_compact"] = _n_parquet_files(f"{state}/pairs")
    t0 = time.perf_counter()
    compact_cosine_state(spark, state, n_files=8)
    out["compact_s"] = round(time.perf_counter() - t0, 2)
    out["files_after_compact"] = _n_parquet_files(f"{state}/pairs")
    out["compact_identical"] = pair_stats() == (n1, h1)

    want = dd.cosine_pair_table(spark, SF_DIR)
    r = want.groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.bit_xor(F.xxhash64("id_a", "id_b", F.round("dist", 10))),
            F.lit(0),
        ).alias("h"),
    ).collect()[0]
    out["pairs_rows"] = n1
    out["equals_batch_build"] = (n1, h1) == (int(r.n), int(r.h))
    release_caches()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
