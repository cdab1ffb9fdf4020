"""Source/sink format round-trips: the same table written and re-read
through every supported format must be value-identical to the parquet
original (schema carried explicitly for the schema-less formats)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE


def _canon(pdf):
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    return pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_orders_roundtrip(spark, tmp_path, fmt):
    from zebra_spark.io import load, read_table, write_table

    orig = load(spark, SF_SMOKE, "orders")
    schema = ", ".join(f"{n} {t}" for n, t in orig.dtypes)
    path = str(tmp_path / f"orders_{fmt}")
    write_table(orig, path, fmt)
    back = read_table(spark, path, fmt, schema=schema)
    assert back.dtypes == orig.dtypes
    assert _canon(back.toPandas()).equals(_canon(orig.toPandas()))


def test_events_timestamps_survive_csv(spark, tmp_path):
    """events.ts is the nasty column (nanos on disk, micros in-session):
    the ISO timestampFormat must preserve it through text formats."""
    from zebra_spark.io import load, read_table, write_table

    ev = load(spark, SF_SMOKE, "events").select("event_id", "ts")
    path = str(tmp_path / "ev_csv")
    write_table(ev, path, "csv")
    back = read_table(
        spark, path, "csv", schema="event_id bigint, ts timestamp"
    )
    a = _canon(ev.toPandas())
    b = _canon(back.toPandas())
    assert a.equals(b)


def test_unknown_format_rejected(spark, tmp_path):
    from zebra_spark.io import load, write_table

    with pytest.raises(ValueError, match="unsupported format"):
        write_table(load(spark, SF_SMOKE, "region"), str(tmp_path / "x"), "avro")
