"""Exactly-once pair-table maintenance at sf0.1 (r7): cost profile of
the epoch-keyed streaming path vs the one-shot batch build.

Ingests the sf0.1 documents corpus through maintain_pair_tables in
N epoch batches (the foreachBatch shape), recording

- per-epoch wall-clock (grows with accumulated state: each batch
  band-joins against all prior signatures);
- an epoch REPLAY (the crash-recovery case) and its cost — idempotent
  by construction, the check asserts pair equality;
- compaction cost + parquet file counts before/after;
- final pairs/ equality vs the batch pair_table (row count + checksum).

Not part of the test suite (runtime); results recorded in SCALING.md.

    python scripts/stream_maintain_check.py [n_epochs]
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
    from zebra_spark.io import load
    from zebra_spark.queries import dedup as dd
    from zebra_spark.session import get_spark
    from zebra_spark.streaming import (
        compact_pair_state,
        maintain_pair_tables,
        read_pair_state,
    )

    zebra_spark.load_all_queries()
    spark = get_spark("stream-maintain-check", cpus="32")
    docs = load(spark, SF_DIR, "documents").select("doc_id", "text")
    state = tempfile.mkdtemp(prefix="maintain_check_") + "/state"

    out: dict[str, object] = {"n_epochs": n_epochs, "n_docs": docs.count()}
    epoch_times = []
    for ep in range(n_epochs):
        batch = docs.filter(F.col("doc_id") % n_epochs == ep)
        t0 = time.perf_counter()
        maintain_pair_tables(spark, state, batch, epoch_id=ep)
        epoch_times.append(round(time.perf_counter() - t0, 2))
    out["epoch_s"] = epoch_times

    def pair_stats():
        _, _, pairs = read_pair_state(spark, state)
        r = pairs.groupBy().agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.bit_xor(F.xxhash64("doc_a", "doc_b", "n_common", "na", "nb")),
                F.lit(0),
            ).alias("h"),
        ).collect()[0]
        return int(r.n), int(r.h)

    n1, h1 = pair_stats()
    # replay the last epoch — crash-recovery case, must be a no-op
    t0 = time.perf_counter()
    maintain_pair_tables(
        spark, state,
        docs.filter(F.col("doc_id") % n_epochs == n_epochs - 1),
        epoch_id=n_epochs - 1,
    )
    out["replay_s"] = round(time.perf_counter() - t0, 2)
    n2, h2 = pair_stats()
    out["replay_identical"] = (n1, h1) == (n2, h2)

    out["files_before_compact"] = _n_parquet_files(f"{state}/pairs")
    t0 = time.perf_counter()
    compact_pair_state(spark, state, n_files=8)
    out["compact_s"] = round(time.perf_counter() - t0, 2)
    out["files_after_compact"] = _n_parquet_files(f"{state}/pairs")
    n3, h3 = pair_stats()
    out["compact_identical"] = (n1, h1) == (n3, h3)

    want = dd.pair_table(spark, SF_DIR)
    r = want.groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.bit_xor(F.xxhash64("doc_a", "doc_b", "n_common", "na", "nb")),
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
