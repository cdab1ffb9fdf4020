"""Ad-hoc single-query parity check: Spark vs DuckDB at a given SF dir.

Usage: python scripts/quick_parity.py q_name [q_name2 ...] [--sf=DIR]
Mirrors tests/test_oracle_parity.canon (same cell canonicalization).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

import zebra_spark  # noqa: E402
from zebra_spark.session import get_spark  # noqa: E402

zebra_spark.load_all_queries()


def main() -> None:
    argv = sys.argv[1:]
    sf = "/root/testdata/sf0.001"
    args = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--sf="):
            sf = a.split("=", 1)[1]
        elif a == "--sf":
            i += 1
            if i >= len(argv):
                sys.exit("--sf requires a value")
            sf = argv[i]
        else:
            args.append(a)
        i += 1
    spark = get_spark()
    from tests.test_oracle_parity import canon

    con = duckdb.connect()
    for t in zebra_spark.io.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'"
        )
    from zebra_spark.caching import release_caches

    failed = []
    for name in args:
        sdf = zebra_spark.QUERIES[name](spark, sf)
        try:
            spk = canon(sdf.toPandas())
        finally:
            # mirror bench.py's per-query release so persisted frames
            # from one query never stay resident for the next (ADVICE r5)
            release_caches()
        ora = canon(con.execute(zebra_spark.ORACLES[name]).df())
        ok_rows = len(spk) == len(ora)
        ok_cols = list(spk.columns) == list(ora.columns)
        ok_vals = ok_rows and ok_cols and spk.equals(ora)
        print(f"{name}: rows {len(spk)}/{len(ora)} cols_ok={ok_cols} "
              f"vals_ok={ok_vals}")
        if not ok_vals:
            failed.append(name)
            if ok_rows and ok_cols:
                neq = (spk != ora).any(axis=1)
                print("  first diffs (spark vs oracle):")
                print(spk[neq].head(3).to_string())
                print(ora[neq].head(3).to_string())
            else:
                print("  spark cols:", list(spk.columns))
                print("  oracle cols:", list(ora.columns))
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
