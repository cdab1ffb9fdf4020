"""One-command scale ladder (r15, VERDICT r14 #5): run the whole
scripts/*_scale_check.py family — the beyond-fixture posture checks
that were previously run ad hoc — and render ONE markdown table, so
scale posture becomes a recorded per-round artifact like the bench
diff instead of scattered session lore.

Each rung is an existing standalone script, unchanged: this runner
only subprocesses them (fresh interpreter each — their Spark sessions
and synthetic corpora don't bleed into each other), times them, and
keeps the last printed line as the rung's summary (every rung already
ends with its verdict line; tick_scale10 ends with a JSON blob).  A
non-zero exit or a timeout is a FAIL row — the table never silently
drops a rung (the no-silent-caps rule).

Usage:
    python scripts/scale_ladder.py               # print the table
    python scripts/scale_ladder.py --record 15   # also append to
                                                 # SCALING.md under
                                                 # '## Scale ladder (r15)'
    python scripts/scale_ladder.py --only lsh,cc # subset while iterating

Do NOT run concurrently with bench.py or tick chain trials — the
rungs are timing-relevant and the box drifts under load (SCALING.md
drift evidence, r14).
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time
from pathlib import Path

HERE = Path(__file__).resolve().parent
REPO = HERE.parent

# rung -> (script, args, per-rung timeout seconds).  Sizes are each
# script's defaults — the recorded 10x-beyond-fixture posture.
LADDER: list[tuple[str, str, list[str], int]] = [
    ("lsh", "lsh_scale_check.py", [], 1200),
    # r16: the bounded-split-loop driver-RSS rung (500k rows, ~14x the
    # 50k rung's split count; corpus generated executor-side) — the
    # recorded evidence that the per-round cap bounds driver memory
    ("lsh_big_splits", "lsh_scale_check.py", ["--big-splits"], 1800),
    ("pq", "pq_scale_check.py", [], 1800),
    ("pca", "pca_scale_check.py", [], 1200),
    ("dedup", "dedup_scale_check.py", [], 1200),
    ("graph_span", "graph_span_scale_check.py", [], 1800),
    ("cc", "cc_scale_check.py", [], 1200),
    ("tick_x10", "tick_scale10.py", [], 3600),
]


def run_rung(script: str, args: list[str], timeout: int) -> tuple[str, str]:
    """(status, summary): status PASS/FAIL/TIMEOUT, summary = the
    rung's last non-empty stdout line (or the error tail)."""
    try:
        out = subprocess.run(
            [sys.executable, str(HERE / script), *args],
            capture_output=True,
            text=True,
            cwd=str(REPO),
            timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        return "TIMEOUT", f"no result within {timeout}s"
    lines = [l.strip() for l in out.stdout.splitlines() if l.strip()]
    if out.returncode != 0:
        tail = (out.stderr.strip().splitlines() or ["no stderr"])[-1]
        return "FAIL", tail[:200]
    return "PASS", (lines[-1] if lines else "no output")[:300]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--record", type=int, default=None, metavar="ROUND",
        help="append the table to SCALING.md under '## Scale ladder (rN)'",
    )
    ap.add_argument(
        "--only", default=None,
        help="comma-separated rung subset (names from the LADDER table)",
    )
    args = ap.parse_args()
    only = (
        {s.strip() for s in args.only.split(",") if s.strip()}
        if args.only
        else None
    )
    # ADVICE r15: a misspelled --only name used to run ZERO rungs and
    # exit 0 (all([]) is True) — the silent-drop failure mode this
    # script exists to prevent.  Unknown or empty selections are errors.
    known = {name for name, *_ in LADDER}
    if only is not None:
        unknown = sorted(only - known)
        if unknown:
            ap.error(
                f"--only names not in the ladder: {', '.join(unknown)} "
                f"(known: {', '.join(sorted(known))})"
            )
        if not only:
            ap.error("--only selected zero rungs")

    rows = []
    for name, script, rung_args, timeout in LADDER:
        if only is not None and name not in only:
            continue
        t0 = time.perf_counter()
        status, summary = run_rung(script, rung_args, timeout)
        wall = time.perf_counter() - t0
        rows.append((name, status, wall, summary))
        print(f"[{status}] {name} ({wall:.0f}s): {summary}", flush=True)

    table = [
        "| rung | status | wall s | last line |",
        "|---|---|---|---|",
    ] + [
        f"| {n} | {s} | {w:.0f} | {m.replace('|', '/')} |"
        for n, s, w, m in rows
    ]
    print()
    print("\n".join(table))

    if args.record is not None:
        scaling = REPO / "SCALING.md"
        block = (
            f"\n\n## Scale ladder (r{args.record})\n\n"
            f"One `scripts/scale_ladder.py --record {args.record}` run "
            "(each rung a fresh interpreter; sizes are the scripts' "
            "recorded defaults):\n\n" + "\n".join(table) + "\n"
        )
        with open(scaling, "a") as f:
            f.write(block)
        print(f"\nappended to {scaling}")
    return 0 if all(s == "PASS" for _, s, _, _ in rows) else 1


if __name__ == "__main__":
    raise SystemExit(main())
