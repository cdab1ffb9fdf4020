"""bench.py driver contract: one JSON line with the required keys, at a
small scale factor so the test stays fast."""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_bench_emits_contract_json(tmp_path):
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = "/root/testdata/sf0.001"
    env["SPARK_GRAFT_CPUS"] = "8"
    env["SPARK_GRAFT_BENCH_FULL"] = str(tmp_path / "bench_full.json")
    # fast subset: every row *kind* (registry query, knn special, lsh
    # build+query specials, ingest) without the heavy dedup pipeline —
    # the contract under test is the JSON shape, not the full suite
    env["SPARK_GRAFT_BENCH_QUERIES"] = ",".join(
        [
            "q_agg_hash", "q_join_inner", "q_dedup_exact", "q_sort_limit",
            "q_window_sliding", "q_text_fingerprint", "q_tpch_q9",
            "knn_exact_100", "lsh_build", "lsh_query_100", "ingest",
        ]
    )
    out = subprocess.run(
        [sys.executable, "bench.py"],
        capture_output=True,
        text=True,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    assert lines, out.stdout[-2000:]
    # COMPACT stdout line (VERDICT r10 #1): the driver's capture choked
    # on the grown full map, so the line carries only the headline
    # scalars + the BASELINE.md-mapped rows and must stay under 2 KB;
    # the full per-query map lands in the file named by "full".
    assert len(lines[-1]) <= 2000
    payload = json.loads(lines[-1])
    assert set(payload) >= {
        "metric", "value", "unit", "queries", "sf",
        "headline_frozen", "headline_full", "full", "n_queries",
    }
    assert payload["unit"] == "sec"
    # the frozen subset is a subset of the full suite, by construction
    assert payload["headline_frozen"] <= payload["headline_full"] + 1e-9
    assert payload["headline_full"] == payload["value"]
    assert payload["sf"] == 0.001
    assert payload["value"] > 0
    # the subset run covers 6 of the 8 baseline-mapped compact rows
    assert len(payload["queries"]) >= 6
    assert all(v >= 0 for v in payload["queries"].values())
    full = json.loads((tmp_path / "bench_full.json").read_text())
    assert set(full) >= {"metric", "value", "unit", "queries", "sf"}
    assert len(full["queries"]) >= 10
    assert full["queries"].keys() >= payload["queries"].keys()
    assert payload["n_queries"] == len(full["queries"])


def test_driver_gate_order_pins_rows_only():
    """__spark_entry__.queries() must lead with the _FORCE_FIRST names
    (VERDICT r5 #2: rows-only queries — q_emb_pca foremost — need
    guaranteed driver slots), and queries()/oracle_sql() must stay
    consistent."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "__spark_entry__.py",
        ),
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    names = list(m.queries())
    assert names[: len(m._FORCE_FIRST)] == m._FORCE_FIRST
    oracles = m.oracle_sql()
    assert set(oracles) <= set(names)


def test_bench_diff_drift_normalization():
    """r15 (VERDICT r14 #3): scripts/bench_diff.py scales flagged
    deltas by the control rows' same-run ratio before flagging, so a
    uniformly slow run (the r14 machine-drift pattern: every row
    ~1.4x including untouched controls) is auto-attributed to session
    noise, while a single-row regression against quiet controls still
    flags."""
    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts",
        ),
    )
    import bench_diff as bd

    base = {
        "queries": {
            "q_join_inner": 2.0, "q_agg_hash": 0.4,
            "q_dedup_clusters": 7.0, "q_text_tfidf": 3.0,
        },
        "frozen_medians": {"q_join_inner": 2.0, "q_agg_hash": 0.4},
    }

    # lockstep drift: EVERYTHING 1.4x, controls included -> factor
    # ~1.4, nothing flagged
    slow = {
        "queries": {k: v * 1.4 for k, v in base["queries"].items()},
        "frozen_medians": {
            k: v * 1.4 for k, v in base["frozen_medians"].items()
        },
    }
    f = bd.drift_factor(base, slow)
    assert abs(f - 1.4) < 1e-9
    regs, imps = bd.diff_map(
        base["queries"], slow["queries"], 30.0, 0.5, f
    )
    assert regs == [] and imps == []

    # single-row regression against QUIET controls: still flagged
    hot = {
        "queries": dict(base["queries"], q_dedup_clusters=11.0),
        "frozen_medians": dict(base["frozen_medians"]),
    }
    f2 = bd.drift_factor(base, hot)
    assert abs(f2 - 1.0) < 1e-9
    regs2, _ = bd.diff_map(base["queries"], hot["queries"], 30.0, 0.5, f2)
    assert [r[0] for r in regs2] == ["q_dedup_clusters"]

    # the clamp: a 3x control blowup is itself suspicious — the factor
    # stops at 1.5 so a real control regression can't absolve the run
    crazy = {
        "queries": {k: v * 3.0 for k, v in base["queries"].items()},
        "frozen_medians": {
            k: v * 3.0 for k, v in base["frozen_medians"].items()
        },
    }
    assert bd.drift_factor(base, crazy) == 1.5

    # controls are never flagged against themselves
    regs3, _ = bd.diff_map(
        base["queries"], crazy["queries"], 30.0, 0.5, 1.5
    )
    assert "q_join_inner" not in [r[0] for r in regs3]
    assert "q_agg_hash" not in [r[0] for r in regs3]

    # ADVICE r15: the raw (unclamped) control ratio is exposed so the
    # clamp case can be reported instead of silently absorbed
    assert abs(bd.control_ratio(base, crazy) - 3.0) < 1e-9


def test_bench_diff_clamp_warns_and_reports_raw(tmp_path):
    """ADVICE r15: when the control ratio exceeds the clamp band, the
    rendered diff must (a) warn loudly that attribution is broken and
    (b) append raw-threshold (factor 1.0) regression tables, so a real
    control-path regression can't scale every other row's delta down
    by up to 33% unannounced."""
    import json
    import subprocess
    import sys as _sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base = {
        "queries": {
            "knn_exact_100": 2.0, "q_agg_hash": 0.4,
            "q_dedup_clusters": 7.0,
        },
    }
    crazy = {
        "queries": {k: v * 3.0 for k, v in base["queries"].items()},
    }
    old_p, new_p = tmp_path / "old.json", tmp_path / "new.json"
    old_p.write_text(json.dumps(base))
    new_p.write_text(json.dumps(crazy))
    out = subprocess.run(
        [_sys.executable, os.path.join(repo, "scripts", "bench_diff.py"),
         str(old_p), str(new_p)],
        capture_output=True, text=True, check=True,
    ).stdout
    assert "WARNING: control ratio 3.000 exceeds the clamp band" in out
    assert "RAW-threshold regressions" in out
    # the raw table carries the non-control regression at factor 1.0
    assert out.count("q_dedup_clusters") >= 2  # adjusted + raw tables

    # quiet controls: no warning, no raw section
    calm = {"queries": dict(base["queries"], q_dedup_clusters=11.0)}
    new_p.write_text(json.dumps(calm))
    out2 = subprocess.run(
        [_sys.executable, os.path.join(repo, "scripts", "bench_diff.py"),
         str(old_p), str(new_p)],
        capture_output=True, text=True, check=True,
    ).stdout
    assert "WARNING" not in out2
    assert "RAW-threshold" not in out2


def test_scale_ladder_rejects_unknown_only():
    """ADVICE r15: a misspelled --only used to run zero rungs and exit
    0 — now it errors up front, naming the unknown rung."""
    import subprocess
    import sys as _sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [_sys.executable, os.path.join(repo, "scripts", "scale_ladder.py"),
         "--only", "nope"],
        capture_output=True, text=True,
    )
    assert r.returncode != 0
    assert "nope" in r.stderr


def test_build_row_ceilings_frozen():
    """VERDICT r16 #4: every priced build row must carry a one-sided
    regression ceiling in SCALING.md, and bench.py must still emit the
    row on a full run (source pin: the rows are spelled in the
    only_set-is-None path).  Parses the ceiling out of the table so a
    renamed/deleted entry fails loudly rather than leaving the row
    silently ungated."""
    import re
    from pathlib import Path

    root = Path(__file__).resolve().parent.parent
    scaling = (root / "SCALING.md").read_text()
    src = (root / "bench.py").read_text()
    for row in ("export_warm", "cluster_label_build"):
        m = re.search(
            rf"^\| {row} \| \*\*(\d+(?:\.\d+)?) s\*\* \|",
            scaling,
            re.MULTILINE,
        )
        assert m, f"no frozen ceiling entry for {row} in SCALING.md"
        assert float(m.group(1)) > 0
        assert f'"{row}"' in src, f"bench.py no longer prices {row}"
