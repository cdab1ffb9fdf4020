"""Per-query regression diff between two bench_full_r{N}.json files
(r14, VERDICT r13 #6): the recorded protocol step behind the one-sided
band's blind spot — the tick/hotspot ceilings only catch medians ABOVE
them, so silent sub-ceiling creep across many rows needs this table in
PROGRESS.md every round instead of ad-hoc judge labor.

A row is a REGRESSION when it slowed by more than --pct percent AND
more than --abs seconds (both, so noise on sub-second rows and on
naturally-wobbling heavy rows doesn't spam); the same double threshold
flags improvements, reported for context.  Compares the `queries` map
(single-shot in-suite), `frozen_medians`, and `hotspots_isolated`.

Usage:
    python scripts/bench_diff.py bench_full_r13.json bench_full_r14.json
    python scripts/bench_diff.py old.json new.json --pct 30 --abs 0.5
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def diff_map(
    old: dict[str, float], new: dict[str, float], pct: float, abs_s: float
) -> tuple[list[tuple], list[tuple]]:
    """(regressions, improvements): rows present in BOTH maps whose
    delta exceeds both thresholds, sorted by absolute delta."""
    regs, imps = [], []
    for name in sorted(set(old) & set(new)):
        o, n = old[name], new[name]
        d = n - o
        if o > 0 and abs(d) > abs_s and abs(d) / o * 100 > pct:
            (regs if d > 0 else imps).append((name, o, n, d))
    key = lambda r: -abs(r[3])  # noqa: E731
    return sorted(regs, key=key), sorted(imps, key=key)


def render(title: str, rows: list[tuple]) -> list[str]:
    if not rows:
        return [f"{title}: none"]
    out = [f"{title}:", "| query | old s | new s | delta |", "|---|---|---|---|"]
    out += [
        f"| {n} | {o:.2f} | {w:.2f} | {d:+.2f} |" for n, o, w, d in rows
    ]
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--pct", type=float, default=30.0)
    ap.add_argument("--abs", dest="abs_s", type=float, default=0.5)
    args = ap.parse_args()
    old = json.loads(Path(args.old).read_text())
    new = json.loads(Path(args.new).read_text())

    lines = [
        f"Bench diff {Path(args.old).name} -> {Path(args.new).name} "
        f"(flag: >{args.pct:.0f}% and >{args.abs_s}s, both directions)"
    ]
    for section, key in (
        ("in-suite (single-shot)", "queries"),
        ("frozen medians", "frozen_medians"),
        ("isolated hotspots", "hotspots_isolated"),
    ):
        o, n = old.get(key) or {}, new.get(key) or {}
        regs, imps = diff_map(o, n, args.pct, args.abs_s)
        lines.append("")
        lines += render(f"{section} — regressions", regs)
        if imps:
            lines += render(f"{section} — improvements", imps)
        dropped = sorted(set(o) - set(n))
        added = sorted(set(n) - set(o))
        if dropped:
            lines.append(f"{section} — rows dropped: {', '.join(dropped)}")
        if added:
            lines.append(f"{section} — rows added: {', '.join(added)}")
    for scalar in (
        "headline_frozen", "headline_frozen_median", "headline_full",
        "tick_update_s", "tick_audit_s", "suite_sf001",
    ):
        if scalar in old and scalar in new:
            lines.append(
                f"{scalar}: {old[scalar]} -> {new[scalar]} "
                f"({new[scalar] - old[scalar]:+.2f})"
            )
    print("\n".join(lines))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
