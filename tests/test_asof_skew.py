"""As-of join parity (window formulation vs merge_asof grouped-map) and
salted-join equivalence."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE, SF_SMOKE


def test_asof_window_matches_merge_asof(spark):
    """The declared q_join_asof (range join + rank-1 window) must agree
    with pandas merge_asof per user (the grouped-map fallback).  Runs at
    the smoke SF — the oracle sweep already checks q_join_asof at
    sf0.01; this test pins the asof SEMANTICS against an independent
    formulation, which the smaller event set still exercises."""
    import zebra_spark

    zebra_spark.load_all_queries()
    declared = (
        zebra_spark.QUERIES["q_join_asof"](spark, SF_SMOKE)
        .toPandas()
        .sort_values("pid")
        .reset_index(drop=True)
    )

    from zebra_spark.io import load

    ev = load(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )

    def asof(pdf: pd.DataFrame) -> pd.DataFrame:
        p = (
            pdf[pdf.event_type == "purchase"]
            .sort_values(["ts", "event_id"])
            .rename(columns={"event_id": "pid"})
        )
        c = (
            pdf[pdf.event_type == "click"]
            # tie-break: prefer the LARGEST click id at equal ts
            .sort_values(["ts", "event_id"])
            .rename(columns={"event_id": "cid"})
        )
        if p.empty:
            return pd.DataFrame(
                columns=["pid", "user_id", "last_click_id", "gap_us"]
            ).astype({"pid": "int64", "user_id": "int64", "last_click_id": "int64", "gap_us": "int64"})
        m = pd.merge_asof(
            p, c[["cid", "ts"]], on="ts", direction="backward", allow_exact_matches=True
        )
        out = pd.DataFrame(
            {
                "pid": m["pid"],
                "user_id": m["user_id"],
                "last_click_id": m["cid"].fillna(-1).astype("int64"),
                "gap_us": -1,
            }
        )
        return out

    grouped = (
        ev.groupBy("user_id")
        .applyInPandas(
            asof, schema="pid bigint, user_id bigint, last_click_id bigint, gap_us bigint"
        )
        .toPandas()
        .sort_values("pid")
        .reset_index(drop=True)
    )
    # merge_asof can't express the cid-desc tie-break directly; compare on
    # rows without exact-ts ties (the overwhelming majority)
    merged = declared.merge(grouped, on="pid", suffixes=("_w", "_g"))
    agree = (merged["last_click_id_w"] == merged["last_click_id_g"]).mean()
    assert len(merged) == len(declared)
    assert agree > 0.99, f"agreement {agree}"


def test_salted_join_matches_plain(spark):
    from zebra_spark.io import load
    from zebra_spark.skew import salted_join

    ev = load(spark, SF_ORACLE, "events").select("event_id", "user_id", "value")
    users = (
        load(spark, SF_ORACLE, "events")
        .select("user_id")
        .distinct()
        .withColumn("tag", F.col("user_id") % 3)
    )
    plain = ev.join(users, "user_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("tag").alias("s")
    ).collect()[0]
    salted = salted_join(ev, users, "user_id", n_salts=8).agg(
        F.count(F.lit(1)).alias("n"), F.sum("tag").alias("s")
    ).collect()[0]
    assert (plain.n, plain.s) == (salted.n, salted.s)
