"""r18 profiling: q_ingest_audit internal split (VERDICT r17 #1).

Replicates the bench's isolated-trial context: shared builds first
(pair/cosine/cluster tables), registry snapshot, then timed
ingest_then_audit calls with the timings dict.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import zebra_spark
from zebra_spark.session import get_spark

SF = "/root/testdata/sf0.1"


def main() -> None:
    zebra_spark.load_all_queries()
    spark = get_spark("profile-ingest-audit", cpus="32")
    from zebra_spark.caching import release_caches
    from zebra_spark.queries.dedup import (
        cluster_label_table,
        cosine_pair_table,
        derived_registry_snapshot,
        pair_table,
        restore_derived_registry,
    )

    # shared builds (the bench's pre-snapshot state)
    for b in (pair_table, cosine_pair_table, cluster_label_table):
        b(spark, SF)
        release_caches()
    snap = derived_registry_snapshot()

    import tempfile, shutil
    from zebra_spark.queries.audit import ingest_then_audit

    for trial in range(3):
        restore_derived_registry(snap)
        release_caches()
        wd = tempfile.mkdtemp(prefix="zebra_prof_ia_")
        t: dict = {}
        t0 = time.perf_counter()
        frames = ingest_then_audit(spark, SF, wd, timings=t)
        # match q_ingest_audit: _summarize + count
        from zebra_spark.queries.audit import _summarize
        _summarize(frames).count()
        total = time.perf_counter() - t0
        print(f"trial {trial}: total={total:.2f}s timings={t}", flush=True)
        shutil.rmtree(wd, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
