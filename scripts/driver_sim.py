"""Bare-session driver simulation: reproduce the per-round CORRECTNESS
gate locally — load __spark_entry__ by file path exactly like the
driver, run entry() as the smoke check, then run the first N queries
of the gate order (default 50 — the prefix size every driver round
r12-r15 actually recorded; VERDICT r15 #3 flagged the old 56-row
simulation for over-promising freshness by six names; pass `all` for
the whole registry) at sf0.01 against their DuckDB oracles
with the driver's row-count + sorted-column value-hash compare.

    python scripts/driver_sim.py [N|all]

Prints one JSON line {"n": ..., "pass": ..., "rows_only_clean": ...,
"fail": {...}} — fail must be empty before a round ships.
"""

from __future__ import annotations

import hashlib
import importlib.util
import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

SF = "/root/testdata/sf0.01"


def vhash(pdf) -> str:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    rows = sorted(
        tuple(f"{v:.4f}" if isinstance(v, float) else str(v) for v in r)
        for r in pdf.itertuples(index=False)
    )
    return hashlib.md5(str(rows).encode()).hexdigest()[:12]


def main() -> None:
    arg = sys.argv[1] if len(sys.argv) > 1 else "50"

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", str(ROOT / "__spark_entry__.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    qs, osql = m.queries(), m.oracle_sql()
    names = list(qs) if arg == "all" else list(qs)[: int(arg)]

    from zebra_spark.session import get_spark

    spark = get_spark("driver-sim", cpus="8")
    entry_rows = m.entry(spark).count()

    import duckdb

    from zebra_spark.io import TABLES  # the one fixture-table list

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )

    from zebra_spark.caching import release_caches

    ok, rows_only, fail = 0, 0, {}
    for name in names:
        try:
            sp = qs[name](spark, SF).toPandas()
            if name not in osql:
                rows_only += 1  # driver records a rows-only row
                continue
            du = con.execute(osql[name]).fetchdf()
            # schema compare = sorted column names (the driver also
            # checks types; the STRICT type map lives in
            # tests/test_oracle_parity.py, green in the suite)
            if sorted(sp.columns) != sorted(du.columns):
                fail[name] = (
                    f"schema {sorted(sp.columns)} != {sorted(du.columns)}"
                )
            elif len(sp) == len(du) and vhash(sp) == vhash(du):
                ok += 1
            else:
                fail[name] = f"rows {len(sp)}/{len(du)} hash mismatch"
        except Exception as exc:  # noqa: BLE001 — record, keep going
            fail[name] = f"{type(exc).__name__}: {exc}"[:200]
        finally:
            release_caches()
    print(
        json.dumps(
            {
                "entry_rows": entry_rows,
                "n": len(names),
                "pass": ok,
                "rows_only_clean": rows_only,
                "fail": fail,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
