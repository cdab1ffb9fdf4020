"""Isolated-median A/B for bench-row creep attribution (r12, VERDICT
r11 #5): q_ingest_audit's isolated median moved 26.5 -> 29.4 s and
q_ann_pq's 1.05 -> 1.55 s across r10 -> r11 with no plan/PQ diff —
this script reruns the EXACT bench isolation protocol (warm-ups,
shared pair/cosine/chain builds, derived-registry snapshot, restore +
cache release before each of 3 trials) for the named rows against an
arbitrary checkout, so protocol cost, machine noise, and real
regression can be separated by running it on two commits.

    python scripts/creep_ab.py [--repo DIR] [--sf DIR] [--trials N] name...

--repo points at a git worktree of another commit (defaults to this
repo); the target checkout's zebra_spark is imported, NOT the one
this file lives in.
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path


def main() -> None:
    repo = str(Path(__file__).resolve().parent.parent)
    sf_dir = "/root/testdata/sf0.1"
    trials = 3
    names = []
    for a in sys.argv[1:]:
        if a.startswith("--repo="):
            repo = a.split("=", 1)[1]
        elif a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        elif a.startswith("--trials="):
            trials = int(a.split("=", 1)[1])
        else:
            names.append(a)
    sys.path.insert(0, repo)

    import zebra_spark
    from zebra_spark.caching import release_caches
    from zebra_spark.queries.dedup import cosine_pair_table, pair_table

    # pre-r10 checkouts predate the derived-table registry — fall back
    # to no-op snapshot/restore so the A/B can still run against them
    # (ADVICE r12; same probe-don't-catch spirit as the with_audit
    # signature check below)
    try:
        from zebra_spark.queries.dedup import (
            derived_registry_snapshot,
            restore_derived_registry,
        )
    except ImportError:
        def derived_registry_snapshot():
            return None

        def restore_derived_registry(_snapshot):
            return None
    from zebra_spark.queries.tick import chain_state
    from zebra_spark.session import get_spark

    zebra_spark.load_all_queries()
    spark = get_spark("creep-ab", cpus="32")

    def consume(df) -> None:
        df.count()  # bench.py's _consume — same terminal action

    for warm in ("q_agg_hash", "q_window_sliding", "q_text_fingerprint"):
        consume(zebra_spark.QUERIES[warm](spark, sf_dir))

    t0 = time.perf_counter()
    pair_table(spark, sf_dir)
    cosine_pair_table(spark, sf_dir)
    import inspect

    # pre-r11 checkouts have no with_audit kwarg — probe the signature
    # rather than catching TypeError, which would also swallow a real
    # TypeError from inside the build and silently re-run half-warm
    if "with_audit" in inspect.signature(chain_state).parameters:
        chain_state(spark, sf_dir, with_audit=True)
    else:
        chain_state(spark, sf_dir)
    shared_s = round(time.perf_counter() - t0, 3)
    snapshot = derived_registry_snapshot()

    out = {
        "repo": repo,
        "sf_dir": sf_dir,
        "registry_size": len(zebra_spark.QUERIES),
        "snapshot_entries": len(snapshot),
        "shared_builds_s": shared_s,
    }
    for name in names:
        rows = []
        iso = []
        for _ in range(trials):
            t0 = time.perf_counter()
            restore_derived_registry(snapshot)
            release_caches()
            iso.append(round(time.perf_counter() - t0, 3))
            t0 = time.perf_counter()
            consume(zebra_spark.QUERIES[name](spark, sf_dir))
            rows.append(round(time.perf_counter() - t0, 3))
        restore_derived_registry(snapshot)
        release_caches()
        out[name] = {
            "median_s": round(statistics.median(rows), 3),
            "trials": rows,
            "isolate_overhead_s": iso,
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
