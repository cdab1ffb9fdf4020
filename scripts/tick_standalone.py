"""Standalone half of the tick two-run confirmation protocol
(SCALING.md "Frozen tick-cost band"; r17, VERDICT r16 #1): N fresh
throwaway chain builds (tick.chain_trial — the exact primitive behind
bench.py's tick_update_s / tick_audit_s) in their own interpreter on
an otherwise-idle box, printing the medians plus the per-step
update_parts decomposition.  A ceiling breach is REAL only if both
this and the in-bench medians sit above it; above on only one is
session noise.

    python scripts/tick_standalone.py [sf_dir] [n_trials]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path
from statistics import median

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import zebra_spark
    from zebra_spark.queries.tick import chain_trial
    from zebra_spark.session import get_spark

    zebra_spark.load_all_queries()
    # same env lookup as bench.py (review r17): the two halves of the
    # two-run protocol must measure on identical parallelism or the
    # comparison is meaningless
    import os

    spark = get_spark(
        "tick-standalone", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    trials = [chain_trial(spark, sf_dir) for _ in range(n)]
    out = {
        "sf_dir": sf_dir,
        "n_trials": n,
        "tick_update_s": round(median(t["update_s"] for t in trials), 3),
        "tick_audit_s": round(median(t["audit_s"] for t in trials), 3),
        "update_s_all": [t["update_s"] for t in trials],
        "audit_s_all": [t["audit_s"] for t in trials],
    }
    if all("update_parts" in t for t in trials):
        keys = sorted(set().union(*(t["update_parts"] for t in trials)))
        out["tick_update_parts"] = {
            k: round(median(t["update_parts"].get(k, 0.0) for t in trials), 3)
            for k in keys
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
