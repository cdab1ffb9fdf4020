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

Drift normalization (r15, VERDICT r14 #3): the r14 session proved
±40% machine drift across identical-HEAD runs, with CONTROL rows
(untouched code paths: knn_exact_100, q_agg_hash) moving in lockstep
with the flagged rows — every r13->r14 flag was hand-re-measured and
attributed to session noise.  This script now does that attribution
automatically: the control rows' median new/old ratio (clamped to
[0.67, 1.5] so a genuine control regression can't mask everything)
divides every new value before the thresholds apply, so a uniformly
slow run flags nothing while a single-row regression still does.  The
rendered table shows raw AND drift-adjusted values plus the factor.

Usage:
    python scripts/bench_diff.py bench_full_r13.json bench_full_r14.json
    python scripts/bench_diff.py old.json new.json --pct 30 --abs 0.5
"""

from __future__ import annotations

import argparse
import json
import statistics
from pathlib import Path

# untouched, stable code paths measured every round in both the
# in-suite map and the frozen medians — the same rows the r14 session
# used as manual drift evidence.
# r17 measurement-bug fix (declared in OPTIMIZATION_r17.md): the
# original pair was (knn_exact_100, q_agg_hash), but the r17
# optimization pass made knn_exact_100 itself ~2.4x faster
# (io.spread_scan on the scoring fan-out), so against a pre-r17
# reference the "control" conflates real optimization with box speed
# and the drift factor overcorrects every *_adj scalar by up to the
# clamp (~1.5x) — including in the driver's own artifact.  A control
# must be a row no optimization round targets: q_join_inner replaces
# knn_exact_100 (plain relational join, frozen-subset member, flat
# 0.45-0.55 s across r11-r17 on both boxes).
CONTROL_ROWS = ("q_join_inner", "q_agg_hash")
_CLAMP = (2 / 3, 1.5)


def control_ratio(old: dict, new: dict) -> float:
    """Raw (unclamped) median new/old ratio of the control rows across
    the in-suite and frozen-median maps (1.0 when no control is
    present in both)."""
    ratios = []
    for key in ("queries", "frozen_medians"):
        o, n = old.get(key) or {}, new.get(key) or {}
        for c in CONTROL_ROWS:
            if c in o and c in n and o[c] > 0 and n[c] > 0:
                ratios.append(n[c] / o[c])
    if not ratios:
        return 1.0
    return statistics.median(ratios)


def drift_factor(old: dict, new: dict) -> float:
    """control_ratio clamped to the attribution band — see main() for
    the loud-warning + raw-threshold fallback when the clamp binds
    (ADVICE r15: a clamped control regression scales every other row's
    delta down by up to 33%, so a co-occurring real regression could
    hide behind it)."""
    return min(max(control_ratio(old, new), _CLAMP[0]), _CLAMP[1])


def diff_map(
    old: dict[str, float],
    new: dict[str, float],
    pct: float,
    abs_s: float,
    factor: float = 1.0,
) -> tuple[list[tuple], list[tuple]]:
    """(regressions, improvements): rows present in BOTH maps whose
    DRIFT-ADJUSTED delta (new/factor vs old) exceeds both thresholds,
    sorted by absolute adjusted delta.  Control rows are never flagged
    against themselves."""
    regs, imps = [], []
    for name in sorted(set(old) & set(new)):
        if name in CONTROL_ROWS:
            continue
        o, n = old[name], new[name]
        adj = n / factor
        d = adj - o
        if o > 0 and abs(d) > abs_s and abs(d) / o * 100 > pct:
            (regs if d > 0 else imps).append((name, o, n, adj, d))
    key = lambda r: -abs(r[4])  # noqa: E731
    return sorted(regs, key=key), sorted(imps, key=key)


def render(title: str, rows: list[tuple]) -> list[str]:
    if not rows:
        return [f"{title}: none"]
    out = [
        f"{title}:",
        "| query | old s | new s | new/drift | delta |",
        "|---|---|---|---|---|",
    ]
    out += [
        f"| {n} | {o:.2f} | {w:.2f} | {a:.2f} | {d:+.2f} |"
        for n, o, w, a, d in rows
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

    raw = control_ratio(old, new)
    factor = drift_factor(old, new)
    clamped = abs(raw - factor) > 1e-9
    lines = [
        f"Bench diff {Path(args.old).name} -> {Path(args.new).name} "
        f"(flag: >{args.pct:.0f}% and >{args.abs_s}s, both directions; "
        f"drift factor {factor:.3f} from control rows "
        f"{', '.join(CONTROL_ROWS)})"
    ]
    if clamped:
        # the control rows themselves moved past the attribution band:
        # normalization can no longer be trusted to separate machine
        # drift from a real control-path regression, so say so loudly
        # and ALSO show what the thresholds flag with no normalization
        # at all (ADVICE r15 — a clamped factor scales every other
        # row's delta by up to 33%, masking co-occurring regressions)
        lines.append(
            f"WARNING: control ratio {raw:.3f} exceeds the clamp band "
            f"[{_CLAMP[0]:.3f}, {_CLAMP[1]:.3f}] — the CONTROL PATH "
            "itself regressed or the box is badly drifted; treat the "
            "adjusted table as unattributed and re-measure the control "
            "rows standalone.  Raw-threshold (factor 1.0) flags are "
            "appended below."
        )
    for section, key in (
        ("in-suite (single-shot)", "queries"),
        ("frozen medians", "frozen_medians"),
        ("isolated hotspots", "hotspots_isolated"),
    ):
        o, n = old.get(key) or {}, new.get(key) or {}
        regs, imps = diff_map(o, n, args.pct, args.abs_s, factor)
        lines.append("")
        lines += render(f"{section} — regressions", regs)
        if imps:
            lines += render(f"{section} — improvements", imps)
        if clamped:
            rregs, _ = diff_map(o, n, args.pct, args.abs_s, 1.0)
            lines += render(
                f"{section} — RAW-threshold regressions (no drift adj)",
                rregs,
            )
        dropped = sorted(set(o) - set(n))
        added = sorted(set(n) - set(o))
        if dropped:
            lines.append(f"{section} — rows dropped: {', '.join(dropped)}")
        if added:
            lines.append(f"{section} — rows added: {', '.join(added)}")
    for scalar in (
        "headline_frozen", "headline_frozen_median", "headline_full",
        "headline_full_adj", "headline_frozen_median_adj",
        "drift_factor", "tick_update_s", "tick_audit_s", "suite_sf001",
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
