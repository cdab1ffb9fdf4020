"""Chained steady-state tick cost (r10, VERDICT r9 #1): run a LONG
chain of equal-size ingest batches through queries.tick.run_tick —
each tick APPENDING its deltas to the previous tick's persisted
maintained parquet — and record the per-tick update cost as the
accumulated corpus grows.

This is the number the r9 tick harness could not produce: there,
every scale rebuilt base tables from session scaffolding, so the
steady-state append cost hid inside 45-144 s of cold-snapshot setup.
Here tick k's corpus is k x the (fixed) batch size, and the claim
under test is that update_s stays FLAT in k — the delta joins scale
with batch x bucket/cell sizes, the appends write only delta rows,
and the label merge iterates |V| + |delta| star edges (|V| grows
with the corpus but stays far below pair volume; its growth is the
one expected sub-component).

Usage (results recorded in SCALING.md):

    python scripts/tick_chain_scale.py [sf_dir] [n_ticks]
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_ticks = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from zebra_spark.io import embeddings_d, load
    from zebra_spark.queries.tick import (
        _mirror_sf_dir,
        init_tick_state,
        run_tick,
    )
    from zebra_spark.session import get_spark

    spark = get_spark("tick-chain-scale")
    mirror = _mirror_sf_dir(sf_dir)
    state = tempfile.mkdtemp(prefix="zebra_tick_chain_") + "/state"
    docs = load(spark, mirror, "documents").select("doc_id", "text")
    vecs = embeddings_d(spark, mirror).select("vec_id", "emb")

    t0 = time.perf_counter()
    init_tick_state(
        spark, mirror, state,
        seed_vecs=vecs.filter(F.col("vec_id") % n_ticks == 0),
    )
    init_s = round(time.perf_counter() - t0, 3)

    rows = []
    for k in range(n_ticks):
        timings: dict = {}
        t0 = time.perf_counter()
        run_tick(
            spark, mirror, state,
            docs.filter(F.col("doc_id") % n_ticks == k),
            vecs.filter(F.col("vec_id") % n_ticks == k),
            timings=timings,
        )
        rows.append(
            {
                "tick": k,
                "corpus_batches_before": k,
                "update_s": timings["update_s"],
                "wall_s": round(time.perf_counter() - t0, 3),
                "reseed": timings["reseed_triggered"],
            }
        )
        print(json.dumps(rows[-1]), flush=True)

    sizes = {
        kind: spark.read.parquet(f"{state}/{kind}").count()
        for kind in ("sigs", "minhash", "cosassign", "cosine", "clusters")
    }
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_ticks": n_ticks,
                "init_s": init_s,
                "ticks": rows,
                "final_rows": sizes,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
