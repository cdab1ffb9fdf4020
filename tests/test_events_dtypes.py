"""Fixture-dtype hardening for the event-time surface (VERDICT r3 #5).

Round 3 proved the parquet fixtures can regenerate between rounds with a
different `ts` physical type: TIMESTAMP(NANOS) became timestamp[us]
without UTC adjustment (Spark TIMESTAMP_NTZ) and five queries broke at
analysis time.  This sweep pins `io.load`'s normalization contract: for
every plausible on-disk encoding of the same instants — nanos, NTZ
micros, UTC-adjusted micros — `load()` must surface an identical
session-TZ TIMESTAMP column, and every event-time query must produce
identical results.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_SMOKE

EVENT_TIME_QUERIES = [
    "q_events_schema",
    "q_window_session",
    "q_window_sliding",
    "q_window_lag",
    "q_join_range",
    "q_join_asof",
    "q_window_tumbling",
]

VARIANTS = ["nanos", "ntz_us", "utc_us"]


def _rewrite_events(src_dir: str, dst_dir: str, variant: str) -> None:
    """Copy the sf fixture dir, re-encoding events.ts in the given
    physical type.  Instants are preserved exactly (all three encodings
    can represent the fixture's microsecond timestamps losslessly)."""
    os.makedirs(dst_dir, exist_ok=True)
    for name in os.listdir(src_dir):
        if name != "events.parquet" and name.endswith(".parquet"):
            link = os.path.join(dst_dir, name)
            if not os.path.exists(link):
                os.symlink(os.path.join(src_dir, name), link)
    t = pq.read_table(os.path.join(src_dir, "events.parquet"))
    target = {
        "nanos": pa.timestamp("ns"),
        "ntz_us": pa.timestamp("us"),
        "utc_us": pa.timestamp("us", tz="UTC"),
    }[variant]
    idx = t.schema.get_field_index("ts")
    ts = t.column("ts")
    if ts.type.tz is not None and target.tz is None:
        # arrow refuses tz-aware -> naive casts implicitly; fixture ts is
        # naive today, but stay robust if that flips again
        ts = ts.cast(pa.int64()).cast(pa.timestamp(ts.type.unit)).cast(target)
    else:
        ts = ts.cast(target)
    t = t.set_column(idx, pa.field("ts", target), ts)
    pq.write_table(t, os.path.join(dst_dir, "events.parquet"))


@pytest.fixture(scope="module")
def variant_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("events_dtypes")
    dirs = {}
    for v in VARIANTS:
        d = str(root / v)
        _rewrite_events(SF_SMOKE, d, v)
        dirs[v] = d
    yield dirs
    shutil.rmtree(root, ignore_errors=True)


def test_load_normalizes_every_ts_encoding(spark, variant_dirs):
    from zebra_spark.io import load

    for v, d in variant_dirs.items():
        df = load(spark, d, "events")
        assert dict(df.dtypes)["ts"] == "timestamp", (
            f"variant {v}: load() must surface a session-TZ TIMESTAMP"
        )


def test_no_table_surfaces_ntz(spark):
    """orders.o_orderdate / lineitem.l_shipdate are timestamp[us] NTZ on
    disk too — load() must normalize every NTZ column, not just
    events.ts, so no query can hit the r3 DATATYPE_MISMATCH class."""
    from zebra_spark.io import TABLES, load

    for t in TABLES:
        bad = [c for c, ty in load(spark, SF_SMOKE, t).dtypes
               if ty == "timestamp_ntz"]
        assert not bad, f"{t}: NTZ columns leaked through load(): {bad}"


@pytest.mark.parametrize("qname", EVENT_TIME_QUERIES)
def test_event_time_queries_dtype_invariant(spark, variant_dirs, qname):
    """Every event-time query returns bit-identical rows regardless of
    the fixture's on-disk ts encoding."""
    import zebra_spark

    zebra_spark.load_all_queries()
    fn = zebra_spark.QUERIES[qname]

    def rows(sf_dir):
        df = fn(spark, sf_dir)
        return sorted(
            tuple(r) for r in df.collect()
        )

    baseline = rows(variant_dirs["ntz_us"])  # the current fixture encoding
    assert len(baseline) > 0
    for v in ("nanos", "utc_us"):
        assert rows(variant_dirs[v]) == baseline, f"variant {v} diverged"
