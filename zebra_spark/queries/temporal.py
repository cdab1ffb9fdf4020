"""Temporal / windowed aggregation surface (SURVEY §2.B).

Batch formulations here are the hash-checked contract; the same window
semantics run as Structured Streaming in zebra_spark.streaming (rows-only
tests, §5).  Timestamps are emitted as formatted strings (UTC both
engines) so value-hashes are engine-neutral.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from zebra_spark.functions import rnd
from zebra_spark.io import load
from zebra_spark.registry import query, sql_rnd

SESSION_GAP_US = 1_800_000_000  # 30 minutes


@query(
    "q_events_schema",
    oracle="""
    SELECT 'timestamp' AS ts_dtype,
           min(epoch_us(ts)) AS min_us,
           max(epoch_us(ts)) AS max_us,
           count(*) AS n
    FROM events
    """,
)
def q_events_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regression canary (VERDICT r3 #8): the sf fixtures regenerated
    between rounds with a different on-disk `ts` dtype (TIMESTAMP(NANOS)
    -> timestamp[us]/NTZ), silently breaking five event-time queries at
    once.  This row pins the post-`io.load` contract — `ts` must be a
    session-TZ TIMESTAMP with the exact instants DuckDB sees — so a
    future fixture dtype change turns into ONE obviously-red driver row
    instead of five confusing ones."""
    ev = load(spark, sf_dir, "events")
    ts_dtype = dict(ev.dtypes)["ts"]
    return ev.agg(
        F.min(F.unix_micros("ts")).alias("min_us"),
        F.max(F.unix_micros("ts")).alias("max_us"),
        F.count(F.lit(1)).alias("n"),
    ).select(F.lit(ts_dtype).alias("ts_dtype"), "min_us", "max_us", "n")


# The normalized (post-io.load) schema contract for every fixture
# table: sorted col:dtype pairs.  A fixture regeneration that changes
# any dtype or adds/drops a column turns into ONE red driver row.
EXPECTED_SCHEMAS = {
    "region": "r_name:string,r_regionkey:int",
    "nation": "n_name:string,n_nationkey:int,n_regionkey:int",
    "customer": "c_acctbal:double,c_custkey:bigint,c_mktsegment:string,"
                "c_name:string,c_nationkey:int",
    "supplier": "s_acctbal:double,s_name:string,s_nationkey:int,"
                "s_suppkey:bigint",
    "part": "p_brand:string,p_name:string,p_partkey:bigint,"
            "p_retailprice:double,p_size:int,p_type:string",
    "orders": "o_custkey:bigint,o_orderdate:timestamp,o_orderkey:bigint,"
              "o_orderpriority:string,o_orderstatus:string,"
              "o_totalprice:double",
    "lineitem": "l_discount:double,l_extendedprice:double,l_linenumber:int,"
                "l_linestatus:string,l_orderkey:bigint,l_partkey:bigint,"
                "l_quantity:double,l_returnflag:string,l_shipdate:timestamp,"
                "l_suppkey:bigint,l_tax:double",
    "events": "event_id:bigint,event_type:string,props:string,ts:timestamp,"
              "user_id:bigint,value:double",
    "documents": "doc_id:bigint,lang:string,n_chars:bigint,source:string,"
                 "text:string",
    "embeddings": "embedding:array<float>,label:int,vec_id:bigint",
}


@query(
    "q_schema_canary",
    oracle="\nUNION ALL\n".join(
        f"SELECT '{t}' AS table_name, '{s}' AS schema_str, count(*) AS n"
        f" FROM {t}"
        for t, s in sorted(EXPECTED_SCHEMAS.items())
    ),
)
def q_schema_canary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-fixture schema canary (generalizes q_events_schema): one
    row per table with its ACTUAL normalized schema string and row
    count; the oracle hardcodes the EXPECTED schema.  Any dtype drift
    the engine fails to normalize (the r3 NTZ incident) or a
    column-set change hash-mismatches exactly one obvious row."""
    frames = []
    for t in sorted(EXPECTED_SCHEMAS):
        df = load(spark, sf_dir, t)
        schema_str = ",".join(f"{c}:{d}" for c, d in sorted(df.dtypes))
        frames.append(
            df.agg(F.count(F.lit(1)).alias("n")).select(
                F.lit(t).alias("table_name"),
                F.lit(schema_str).alias("schema_str"),
                "n",
            )
        )
    out = frames[0]
    for f2 in frames[1:]:
        out = out.unionAll(f2)
    return out


@query(
    "q_window_tumbling",
    oracle=f"""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
           event_type,
           count(*) AS n,
           {sql_rnd("sum(CAST(value AS DECIMAL(18,6)))")} AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events per hour per type.  Batch ≙ streaming
    `groupBy(F.window('ts','1 hour'), 'event_type')` — zebra_spark.streaming
    asserts stream==batch on this exact shape."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "hour"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            rnd(F.sum(F.col("value").cast("decimal(18,6)"))).alias("total_value"),
        )
    )


@query(
    "q_window_session",
    oracle=f"""
    WITH g AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > {SESSION_GAP_US}
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, event_id, ts, value,
             CAST(sum(new_session) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
      FROM g
    )
    SELECT user_id, session_id,
           count(*) AS n_events,
           epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us,
           {sql_rnd("sum(CAST(value AS DECIMAL(18,6)))")} AS total_value
    FROM s
    GROUP BY user_id, session_id
    """,
)
def q_window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionize by 30-min inactivity gap: lag -> new-session flag ->
    running sum = session id -> per-session agg.  One shuffle on user_id;
    both windows and the final groupBy reuse that partitioning.  Streaming
    twin: `F.session_window(ts, '30 minutes')`."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    flagged = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > SESSION_GAP_US), 1).otherwise(0),
    )
    sessions = flagged.withColumn("session_id", F.sum("new_session").over(run))
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("dur_us"),
        rnd(F.sum(F.col("value").cast("decimal(18,6)"))).alias("total_value"),
    )


SLIDE_US = 900_000_000  # 15 minutes
WIN_SLOTS = 4  # 1h window / 15m slide -> each event lands in 4 windows


@query(
    "q_window_sliding",
    oracle=f"""
    WITH x AS (
      SELECT event_type, CAST(value AS DECIMAL(18,6)) AS v,
             (epoch_us(ts) - epoch_us(ts) % {SLIDE_US})
               - CAST(k AS BIGINT) * {SLIDE_US} AS start_us
      FROM events, unnest([0, 1, 2, 3]) t(k)
    )
    SELECT strftime(make_timestamp(start_us), '%Y-%m-%d %H:%M:%S')
             AS win_start,
           event_type,
           count(*) AS n,
           {sql_rnd("sum(v)")} AS total_value
    FROM x GROUP BY start_us, event_type
    """,
)
def q_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1h / 15m) in batch: explode each event into its 4
    covering windows (epoch-us arithmetic, engine-neutral), then a plain
    hash agg.  Streaming twin: F.window(ts, '1 hour', '15 minutes') —
    asserted row-count-equal in tests/test_streaming.py."""
    ev = load(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    t15 = us - (us % SLIDE_US)
    x = ev.select(
        "event_type",
        F.col("value").cast("decimal(18,6)").alias("v"),
        F.explode(F.array(*[F.lit(k) for k in range(WIN_SLOTS)])).alias("k"),
        t15.alias("t15"),
    ).select(
        "event_type",
        "v",
        (F.col("t15") - F.col("k").cast("bigint") * SLIDE_US).alias("start_us"),
    )
    return (
        x.groupBy("start_us", "event_type")
        .agg(F.count(F.lit(1)).alias("n"), rnd(F.sum("v")).alias("total_value"))
        .select(
            F.date_format(
                F.timestamp_micros("start_us"), "yyyy-MM-dd HH:mm:ss"
            ).alias("win_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@query(
    "q_events_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, min(epoch_us(ts)) AS t_view
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t_click
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND epoch_us(e.ts) >= v.t_view
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t_purchase
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= c.t_click
      GROUP BY e.user_id
    )
    SELECT v.user_id, v.t_view,
           coalesce(c.t_click, -1) AS t_click,
           coalesce(p.t_purchase, -1) AS t_purchase,
           CAST(CASE WHEN p.user_id IS NOT NULL THEN 3
                     WHEN c.user_id IS NOT NULL THEN 2
                     ELSE 1 END AS INTEGER) AS stage
    FROM v
    LEFT JOIN c ON c.user_id = v.user_id
    LEFT JOIN p ON p.user_id = v.user_id
    """,
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view -> click -> purchase: per user,
    the first view, the first click AT OR AFTER that view, and the
    first purchase at or after that click, with the stage reached.

    Three user-keyed aggregations chained by equi-joins — each stage
    reuses the user_id partitioning, and the stage frames only shrink
    (funnels are monotone), so at scale every join after the first is
    a small-side broadcast against the raw events scan."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("us") >= F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("us") >= F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t_purchase"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "t_view",
            F.coalesce("t_click", F.lit(-1).cast("bigint")).alias("t_click"),
            F.coalesce("t_purchase", F.lit(-1).cast("bigint")).alias(
                "t_purchase"
            ),
            F.when(F.col("t_purchase") != -1, 3)
            .when(F.col("t_click") != -1, 2)
            .otherwise(1)
            .cast("int")
            .alias("stage"),
        )
    )


@query(
    "q_rollup_time",
    oracle=f"""
    SELECT coalesce(strftime(date_trunc('day', ts), '%Y-%m-%d'), 'ALL')
             AS day,
           coalesce(strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S'),
                    'ALL') AS hour,
           count(*) AS n,
           {sql_rnd("sum(CAST(value AS DECIMAL(18,6)))")} AS total_value
    FROM events
    GROUP BY ROLLUP (date_trunc('day', ts), date_trunc('hour', ts))
    """,
)
def q_rollup_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style time rollup: hour- AND day-grain continuous
    aggregates plus the grand total from ONE pass over the events
    (ROLLUP on the truncation hierarchy plans a single Expand + hash
    agg — the one-scan replacement for maintaining per-granularity
    materialized views).  Streaming twin: the tumbling-window agg at
    the finest grain, with coarser grains derived downstream."""
    ev = load(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts")
    hour = F.date_trunc("hour", "ts")
    return (
        ev.rollup(day.alias("d"), hour.alias("h"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            rnd(F.sum(F.col("value").cast("decimal(18,6)"))).alias(
                "total_value"
            ),
        )
        .select(
            F.coalesce(F.date_format("d", "yyyy-MM-dd"), F.lit("ALL")).alias(
                "day"
            ),
            F.coalesce(
                F.date_format("h", "yyyy-MM-dd HH:mm:ss"), F.lit("ALL")
            ).alias("hour"),
            "n",
            "total_value",
        )
    )


@query(
    "q_events_retention",
    oracle="""
    WITH firstd AS (
      SELECT user_id, min(date_trunc('day', ts)) AS cohort FROM events
      GROUP BY user_id
    ),
    act AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events)
    SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_day,
           CAST(date_diff('day', f.cohort, a.d) AS BIGINT) AS day_offset,
           count(*) AS n_users
    FROM act a JOIN firstd f ON f.user_id = a.user_id
    GROUP BY 1, 2
    """,
)
def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity day,
    counted on each later active day — the product-analytics staple on
    the events stream.  Two bounded aggregations (per-user first day,
    distinct user-days) joined on user_id; output is |cohorts| x
    |offsets| rows regardless of event volume, and the user_id join is
    the only shuffle — no event-level self-join."""
    ev = load(spark, sf_dir, "events")
    firstd = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts")).alias("cohort")
    )
    act = ev.select("user_id", F.date_trunc("day", "ts").alias("d")).distinct()
    return (
        act.join(firstd, "user_id")
        .groupBy(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff(F.col("d"), F.col("cohort")).cast("bigint").alias(
                "day_offset"
            ),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


ANOM_Z = 3.0  # z-score threshold for rate anomalies


@query(
    "q_events_anomaly",
    oracle=f"""
    WITH m AS (
      SELECT event_type, date_trunc('minute', ts) AS minute, count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    s AS (
      SELECT event_type, avg(n) AS mu, greatest(stddev_pop(n), 1e-12) AS sd
      FROM m GROUP BY event_type
    )
    SELECT m.event_type,
           strftime(m.minute, '%Y-%m-%d %H:%M:%S') AS minute,
           m.n,
           {sql_rnd("(m.n - s.mu) / s.sd")} AS z,
           CASE WHEN (m.n - s.mu) / s.sd > {ANOM_Z} THEN 1 ELSE 0 END
             AS is_anomaly
    FROM m JOIN s ON s.event_type = m.event_type
    """,
)
def q_events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-rate anomaly detection: per-minute counts for each event
    type, z-scored against that type's own rate distribution — the
    monitoring primitive for ingest-pipeline spikes and stuck producers.
    Two bounded aggs: the minute-grain rollup (keyed by type x minute,
    the streaming tumbling window's batch twin) and a per-type stats
    frame of |event_types| rows broadcast back onto it.  No window over
    the raw stream, no event-level shuffle beyond the first rollup."""
    ev = load(spark, sf_dir, "events")
    m = ev.groupBy(
        "event_type", F.date_trunc("minute", "ts").alias("minute")
    ).agg(F.count(F.lit(1)).alias("n"))
    s = m.groupBy("event_type").agg(
        F.avg("n").alias("mu"),
        F.greatest(F.stddev_pop("n"), F.lit(1e-12)).alias("sd"),
    )
    z = (F.col("n") - F.col("mu")) / F.col("sd")
    return m.join(F.broadcast(s), "event_type").select(
        "event_type",
        F.date_format("minute", "yyyy-MM-dd HH:mm:ss").alias("minute"),
        "n",
        rnd(z).alias("z"),
        F.when(z > ANOM_Z, 1).otherwise(0).alias("is_anomaly"),
    )


@query(
    "q_events_gapfill",
    oracle="""
    WITH p AS (
      SELECT date_trunc('minute', ts) AS m, count(*) AS n
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    r AS (SELECT min(m) AS lo, max(m) AS hi FROM p),
    mins AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 MINUTE)) AS m FROM r
    )
    SELECT strftime(mins.m, '%Y-%m-%d %H:%M:%S') AS minute,
           CAST(coalesce(p.n, 0) AS BIGINT) AS n_events
    FROM mins LEFT JOIN p ON p.m = mins.m
    """,
)
def q_events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GAP-FILLED per-minute purchase rate: every minute between the
    first and last purchase appears, zero-filled where no event landed —
    the time-series hygiene step every downstream rate/anomaly model
    needs (a missing minute is a zero, not an absent row; q_events_
    anomaly-style z-scores silently skew without it).  The minute spine
    comes from a sequence() over ONE aggregated (lo, hi) row — its size
    is bounded by the time range (~526k rows/year), never by event
    volume, and the spine-side join key is unique so the left join
    broadcasts the aggregated counts at any corpus size."""
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(F.date_trunc("minute", "ts").alias("m"))
    )
    per = ev.groupBy("m").agg(F.count(F.lit(1)).alias("n"))
    rng = per.agg(F.min("m").alias("lo"), F.max("m").alias("hi"))
    mins = rng.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("interval 1 minute"))
        ).alias("m")
    )
    return mins.join(per, "m", "left").select(
        F.date_format("m", "yyyy-MM-dd HH:mm:ss").alias("minute"),
        F.coalesce("n", F.lit(0)).cast("bigint").alias("n_events"),
    )


# (an aggregate view->click->purchase funnel twin was added here in r6
# and then removed: it silently shadowed the richer per-user
# q_events_funnel above — same name, later registration wins.  The
# per-user funnel is the kept operator; count aggregates are one
# groupBy('stage') away from its output.)


ATTR_WINDOW_US = 1_800_000_000  # 30-minute attribution lookback


@query(
    "q_events_attribution",
    oracle=f"""
    WITH p AS (
      SELECT event_id, user_id, epoch_us(ts) AS pus FROM events
      WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT event_id, user_id, epoch_us(ts) AS cus FROM events
      WHERE event_type = 'click'
    ),
    m AS (
      SELECT p.event_id AS purchase_id, p.user_id, p.pus,
             c.event_id AS click_id, c.cus,
             row_number() OVER (PARTITION BY p.event_id
               ORDER BY c.cus DESC, c.event_id DESC) AS rk
      FROM p JOIN c ON c.user_id = p.user_id
        AND c.cus <= p.pus AND c.cus >= p.pus - {ATTR_WINDOW_US}
    ),
    best AS (SELECT * FROM m WHERE rk = 1)
    SELECT p.event_id AS purchase_id, p.user_id,
           coalesce(b.click_id, -1) AS click_id,
           CAST(coalesce(p.pus - b.cus, -1) AS BIGINT) AS gap_us
    FROM p LEFT JOIN best b ON b.purchase_id = p.event_id
    """,
)
def q_events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAST-TOUCH attribution: every purchase joined to the same user's
    most recent click within a 30-minute lookback (ties broken by click
    id), unattributed purchases kept with -1 — the batch twin of
    streaming.purchases_with_prior_click and the standard conversion-
    credit op.  The user-keyed range join is bounded by per-user event
    counts (AQE splits skewed users), and the per-purchase argmax is a
    window over the matched clicks only — never over the raw stream."""
    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id",
        F.col("us").alias("pus"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_uid"),
        F.col("us").alias("cus"),
    )
    m = p.join(
        c,
        (F.col("c_uid") == F.col("user_id"))
        & (F.col("cus") <= F.col("pus"))
        & (F.col("cus") >= F.col("pus") - ATTR_WINDOW_US),
    )
    w = Window.partitionBy("purchase_id").orderBy(
        F.col("cus").desc(), F.col("click_id").desc()
    )
    best = (
        m.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("purchase_id", "click_id", "cus")
    )
    return p.join(best, "purchase_id", "left").select(
        "purchase_id",
        "user_id",
        F.coalesce("click_id", F.lit(-1).cast("bigint")).alias("click_id"),
        F.coalesce(F.col("pus") - F.col("cus"), F.lit(-1))
        .cast("bigint")
        .alias("gap_us"),
    )
