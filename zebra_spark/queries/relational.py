"""Relational extension surface (SURVEY §2.B): scan/filter/agg/join/
window/set/string/date/math/array/json operators over the TPC-H-ish star
schema.  All stock DataFrame ops — Catalyst handles pushdown, pruning,
join selection; AQE handles skew and partition coalescing.

Float determinism: money aggregates are summed as DECIMAL(18,6) (exact,
order-insensitive — verified identical Spark vs DuckDB at sf0.1) and cast
to double + round(4) only at output.  Per-row double arithmetic is
bitwise identical across engines, so row-level computed columns are safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from zebra_spark.functions import _agg_sum as zf_agg_sum
from zebra_spark.functions import rnd
from zebra_spark.io import load
from zebra_spark.registry import query, sql_rnd

DEC = "decimal(18,6)"


def _dsum(c) -> F.Column:
    """Exact decimal sum of a double expression: per-row double result is
    cast to DECIMAL(18,6) then summed (order-insensitive, exact)."""
    return F.sum(c.cast(DEC))


def _sql_dsum(expr: str) -> str:
    return f"sum(CAST({expr} AS DECIMAL(18,6)))"


# --- scan / filter ----------------------------------------------------------


@query(
    "q_project_expr",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           {sql_rnd("l_extendedprice * (1 - l_discount)")} AS revenue,
           {sql_rnd("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS charge
    FROM lineitem
    """,
)
def q_project_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        rnd(rev).alias("revenue"),
        rnd(rev * (1 + F.col("l_tax"))).alias("charge"),
    )


@query(
    "q_filter_pred",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20
      AND l_returnflag IN ('A', 'R')
      AND l_linestatus LIKE 'F%'
      AND l_shipdate >= TIMESTAMP '1996-01-01'
    """,
)
def q_filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(10, 20)
        & F.col("l_returnflag").isin("A", "R")
        & F.col("l_linestatus").like("F%")
        & (F.col("l_shipdate") >= "1996-01-01")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")


# --- aggregation ------------------------------------------------------------


@query(
    "q_agg_hash",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_rnd(_sql_dsum("l_quantity"))} AS sum_qty,
           {sql_rnd(_sql_dsum("l_extendedprice"))} AS sum_base_price,
           {sql_rnd(_sql_dsum("l_extendedprice * (1 - l_discount)"))} AS sum_disc_price,
           {sql_rnd(_sql_dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)"))} AS sum_charge,
           {sql_rnd("CAST(" + _sql_dsum("l_quantity") + " AS DOUBLE) / count(*)")} AS avg_qty,
           {sql_rnd("CAST(" + _sql_dsum("l_extendedprice") + " AS DOUBLE) / count(*)")} AS avg_price,
           {sql_rnd("CAST(" + _sql_dsum("l_discount") + " AS DOUBLE) / count(*)")} AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: partial (map-side) aggregation then one shuffle on
    the tiny group key — the canonical scale-safe agg."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        rnd(_dsum(F.col("l_quantity"))).alias("sum_qty"),
        rnd(_dsum(F.col("l_extendedprice"))).alias("sum_base_price"),
        rnd(_dsum(disc_price)).alias("sum_disc_price"),
        rnd(_dsum(disc_price * (1 + F.col("l_tax")))).alias("sum_charge"),
        # exact averages: decimal sum / count (plain avg() folds doubles
        # in shuffle order — boundary-flake risk under 4dp rounding)
        rnd(_dsum(F.col("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
        rnd(_dsum(F.col("l_extendedprice")).cast("double") / F.count(F.lit(1))).alias("avg_price"),
        rnd(_dsum(F.col("l_discount")).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "q_agg_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_orderkey) AS n_orders,
           count(DISTINCT l_suppkey) AS n_supps,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


_ROLLUP_SELECT = f"""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           {sql_rnd(_sql_dsum("l_quantity"))} AS sum_qty,
           count(*) AS n
    FROM lineitem
"""


@query("q_agg_rollup", oracle=_ROLLUP_SELECT + "GROUP BY ROLLUP (l_returnflag, l_linestatus)")
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        rnd(_dsum(F.col("l_quantity"))).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    ).select(
        F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
        F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
        "sum_qty",
        "n",
    )


@query("q_agg_cube", oracle=_ROLLUP_SELECT + "GROUP BY CUBE (l_returnflag, l_linestatus)")
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        rnd(_dsum(F.col("l_quantity"))).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    ).select(
        F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
        F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
        "sum_qty",
        "n",
    )


@query(
    "q_agg_grouping_sets",
    oracle=_ROLLUP_SELECT
    + "GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))",
)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS — the general form rollup/cube specialize: here the
    two single-column marginals in ONE pass (Catalyst plans one Expand +
    one hash agg, vs two scans for the UNION ALL a user would hand-write
    at 100 TB)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag"], ["l_linestatus"]], "l_returnflag", "l_linestatus"
        )
        .agg(
            rnd(_dsum(F.col("l_quantity"))).alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n",
        )
    )


# --- joins ------------------------------------------------------------------


@query(
    "q_join_inner",
    oracle=f"""
    SELECT n_name,
           {sql_rnd(_sql_dsum("o_totalprice"))} AS total,
           count(*) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way equi join + agg.  customer and nation are dimension-sized:
    Catalyst broadcasts them (verified in plan), so the only shuffle is
    the final tiny groupBy."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            rnd(_dsum(F.col("o_totalprice"))).alias("total"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@query(
    "q_join_broadcast",
    oracle=f"""
    SELECT r_name,
           count(*) AS n_customers,
           {sql_rnd("CAST(" + _sql_dsum("c_acctbal") + " AS DOUBLE) / count(*)")} AS avg_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast of the dimension chain nation->region — zero
    shuffle for the joins regardless of fact-side size."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            rnd(_dsum(F.col("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("avg_bal"),
        )
    )


@query(
    "q_join_left",
    oracle="""
    SELECT c_custkey, c_mktsegment, count(o_orderkey) AS n_orders
    FROM customer
    LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey, c_mktsegment
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


@query(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS: customers with no high-value order."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


@query(
    "q_join_skew_salted",
    oracle=f"""
    WITH ua AS (
      SELECT user_id, avg(value) AS av FROM events GROUP BY user_id
    )
    SELECT e.user_id, e.event_type,
           count(*) AS n,
           CAST(count(*) FILTER (WHERE e.value > ua.av) AS BIGINT)
             AS n_above,
           {sql_rnd("avg(e.value - ua.av)")} AS avg_delta
    FROM events e JOIN ua ON ua.user_id = e.user_id
    GROUP BY e.user_id, e.event_type
    """,
)
def q_join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted fact-to-dim join, hash-checked IDENTICAL to the plain
    join the oracle computes: each event joined to its user's average
    value, then per-(user, type) above-average stats.

    zebra_spark.skew.salted_join spreads each hot user key over 8
    sub-keys (the fixture concentrates whole users onto single keys;
    at 100 TB one user can be 10%% of events) and replicates the
    150-row dim once per salt — no task ever owns a whole hot key,
    and the result is provably the plain inner join."""
    from zebra_spark.skew import salted_join

    ev = load(spark, sf_dir, "events")
    ua = ev.groupBy("user_id").agg(F.avg("value").alias("av"))
    joined = salted_join(ev, ua, on="user_id", n_salts=8)
    return joined.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("value") > F.col("av"), 1)).cast("bigint").alias(
            "n_above"
        ),
        rnd(F.avg(F.col("value") - F.col("av"))).alias("avg_delta"),
    )


@query(
    "q_join_range",
    oracle="""
    SELECT a.event_id AS id_a, b.event_id AS id_b,
           epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
    FROM events a
    JOIN events b
      ON a.user_id = b.user_id
     AND epoch_us(b.ts) > epoch_us(a.ts)
     AND epoch_us(b.ts) - epoch_us(a.ts) <= 3600000000
    """,
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (theta) join: same-user event pairs within one hour.  The
    equi part (user_id) keys the shuffle; the range predicate filters
    within partitions — scale-safe as long as per-user event counts are
    bounded (for unbounded keys, bucketize ts and equi-join on bucket)."""
    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", F.unix_micros("ts").alias("us")
    )
    a = ev.select(
        F.col("event_id").alias("id_a"), "user_id", F.col("us").alias("us_a")
    )
    b = ev.select(
        F.col("event_id").alias("id_b"),
        F.col("user_id").alias("user_b"),
        F.col("us").alias("us_b"),
    )
    return (
        a.join(
            b,
            (F.col("user_id") == F.col("user_b"))
            & (F.col("us_b") > F.col("us_a"))
            & (F.col("us_b") - F.col("us_a") <= 3_600_000_000),
        )
        .select("id_a", "id_b", (F.col("us_b") - F.col("us_a")).alias("gap_us"))
    )


# --- sort / window ----------------------------------------------------------


@query(
    "q_sort_limit",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 100
    """,
)
def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k -> TakeOrderedAndProject (per-partition partial top-k,
    no full sort)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.orderBy(
            F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber"
        )
        .limit(100)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


@query(
    "q_window_rank",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(row_number() OVER w AS INTEGER) AS rn,
           CAST(rank() OVER w AS INTEGER) AS rnk
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    QUALIFY rn <= 3
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer.  Spark 3.5+ pushes the rank<=3 limit
    into the shuffle (WindowGroupLimit)."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .withColumn("rnk", F.rank().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "rn", "rnk")
    )


@query(
    "q_window_running",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           {sql_rnd("sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")} AS running_total
    FROM orders
    """,
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        rnd(F.sum("o_totalprice").over(w)).alias("running_total"),
    )


@query(
    "q_window_lag",
    oracle="""
    SELECT event_id, user_id,
           coalesce(epoch_us(ts) - epoch_us(lag(ts) OVER
             (PARTITION BY user_id ORDER BY ts, event_id)), -1) AS gap_us
    FROM events
    """,
)
def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.coalesce(
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)), F.lit(-1)
        ).alias("gap_us"),
    )


# --- set operations ---------------------------------------------------------

_SET_A = "SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'"
# year-based operand: non-trivial intersect AND except at every fixture
# scale factor (a price threshold left except empty at sf0.001)
_SET_B = "SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995"


def _set_sides(spark: SparkSession, sf_dir: str):
    a = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("custkey"))
    )
    b = (
        load(spark, sf_dir, "orders")
        .filter(F.year("o_orderdate") == 1995)
        .select(F.col("o_custkey").alias("custkey"))
    )
    return a, b


@query("q_set_union", oracle=f"({_SET_A}) UNION ALL ({_SET_B})")
def q_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _set_sides(spark, sf_dir)
    return a.unionAll(b)


@query("q_set_intersect", oracle=f"({_SET_A}) INTERSECT ({_SET_B})")
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _set_sides(spark, sf_dir)
    return a.intersect(b)


@query("q_set_except", oracle=f"({_SET_A}) EXCEPT ({_SET_B})")
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _set_sides(spark, sf_dir)
    return a.subtract(b)


# --- scalar function families ----------------------------------------------


@query(
    "q_string_funcs",
    oracle="""
    SELECT c_custkey,
           lower(c_name) AS lname,
           substr(c_name, 1, 8) AS prefix,
           CAST(length(c_name) AS INTEGER) AS name_len,
           regexp_extract(c_name, '([0-9]+)', 1) AS digits
    FROM customer
    """,
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lower("c_name").alias("lname"),
        F.substring("c_name", 1, 8).alias("prefix"),
        F.length("c_name").alias("name_len"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("digits"),
    )


@query(
    "q_date_funcs",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS y,
           CAST(month(o_orderdate) AS INTEGER) AS m,
           count(*) AS n,
           {sql_rnd(_sql_dsum("o_totalprice"))} AS total
    FROM orders
    GROUP BY 1, 2
    """,
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("y"), F.month("o_orderdate").alias("m")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            rnd(_dsum(F.col("o_totalprice"))).alias("total"),
        )
    )


@query(
    "q_math_funcs",
    oracle=f"""
    SELECT o_orderkey,
           (CASE WHEN (floor(CAST(abs(o_totalprice) AS DOUBLE) * 100.0 + 0.5) / 100.0) = 0 THEN 0.0 ELSE (floor(CAST(abs(o_totalprice) AS DOUBLE) * 100.0 + 0.5) / 100.0) END) AS p2,
           {sql_rnd("sqrt(o_totalprice)")} AS sq,
           {sql_rnd("ln(o_totalprice)")} AS lnp,
           {sql_rnd("power(o_totalprice, 0.3)")} AS pw
    FROM orders
    WHERE o_totalprice > 0
    """,
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    return o.select(
        "o_orderkey",
        rnd(F.abs(F.col("o_totalprice")), 2).alias("p2"),
        rnd(F.sqrt("o_totalprice")).alias("sq"),
        rnd(F.log("o_totalprice")).alias("lnp"),
        rnd(F.pow("o_totalprice", F.lit(0.3))).alias("pw"),
    )


@query(
    "q_array_funcs",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings)
    SELECT vec_id,
           CAST(len(emb) AS INTEGER) AS n_dim,
           {sql_rnd("list_max(emb)")} AS mx,
           {sql_rnd("list_min(emb)")} AS mn,
           {sql_rnd("list_sort(emb)[3]")} AS third_smallest,
           {sql_rnd("list_sum(emb[1:5])")} AS head_sum
    FROM e
    """,
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from zebra_spark.io import embeddings_d

    e = embeddings_d(spark, sf_dir)
    return e.select(
        "vec_id",
        F.size("emb").alias("n_dim"),
        rnd(F.array_max("emb")).alias("mx"),
        rnd(F.array_min("emb")).alias("mn"),
        rnd(F.element_at(F.array_sort("emb"), 3)).alias("third_smallest"),
        rnd(zf_agg_sum(F.slice("emb", 1, 5))).alias("head_sum"),
    )


@query(
    "q_json_get",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int
    FROM events
    """,
)
def q_json_get(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return ev.select(
        "event_id",
        k.alias("k_str"),
        k.cast("int").alias("k_int"),
    )


@query(
    "q_group_zscore",
    oracle=f"""
    SELECT label, vec_id,
           {sql_rnd("CASE WHEN stddev_samp(head) OVER w = 0 OR stddev_samp(head) OVER w IS NULL THEN 0.0 ELSE (head - avg(head) OVER w) / stddev_samp(head) OVER w END")} AS zscore
    FROM (
      SELECT label, vec_id, CAST(embedding[1] AS DOUBLE) AS head
      FROM embeddings
    )
    WINDOW w AS (PARTITION BY label)
    """,
)
def q_group_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group normalization (grouped-map shape) in native window
    functions: z-score of the embedding head within each label.  The
    applyInPandas twin is asserted equal in tests/test_metrics.py —
    native wins at scale (no Python boundary), grouped-map is the
    fallback for logic SQL can't express."""
    from zebra_spark.io import embeddings_d

    e = embeddings_d(spark, sf_dir).select(
        "label", "vec_id", F.element_at("emb", 1).alias("head")
    )
    w = Window.partitionBy("label")
    mu = F.avg("head").over(w)
    sd = F.stddev_samp("head").over(w)
    z = F.when(sd.isNull() | (sd == 0.0), F.lit(0.0)).otherwise(
        (F.col("head") - mu) / sd
    )
    return e.select("label", "vec_id", rnd(z).alias("zscore"))


@query("q_agg_approx")
def q_agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++) per returnflag — rows-only entry
    (approximation is engine-specific, so no DuckDB hash check); the
    sanity bound vs exact count is asserted in tests."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.expr("percentile_approx(l_extendedprice, 0.5)").alias("p50_price"),
    )


@query(
    "q_subquery_scalar",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey,
           (CASE WHEN (floor(CAST(o.o_totalprice AS DOUBLE) * 100.0 + 0.5) / 100.0) = 0 THEN 0.0 ELSE (floor(CAST(o.o_totalprice AS DOUBLE) * 100.0 + 0.5) / 100.0) END) AS price
    FROM orders o
    WHERE o.o_totalprice > 1.5 * (
      SELECT avg(o2.o_totalprice) FROM orders o2
      WHERE o2.o_custkey = o.o_custkey
    )
    """,
)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: orders 1.5x above their customer's
    average.  Declared as a window-average + filter — Catalyst decorrelates
    the subquery form to the same aggregate-join shape."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    return (
        o.withColumn("cust_avg", F.avg("o_totalprice").over(w))
        .filter(F.col("o_totalprice") > 1.5 * F.col("cust_avg"))
        .select(
            "o_orderkey",
            "o_custkey",
            rnd(F.col("o_totalprice"), 2).alias("price"),
        )
    )


@query(
    "q_pivot",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) FILTER (WHERE l_linestatus = 'F') AS BIGINT) AS "F",
           CAST(count(*) FILTER (WHERE l_linestatus = 'O') AS BIGINT) AS "O"
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: linestatus counts as columns per returnflag (explicit value
    list so the output schema is static — required at scale and for
    oracle parity)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["F", "O"])
    )


@query(
    "q_join_asof",
    oracle="""
    WITH p AS (SELECT event_id AS pid, user_id, ts FROM events
               WHERE event_type = 'purchase'),
    c AS (SELECT event_id AS cid, user_id, ts FROM events
          WHERE event_type = 'click')
    SELECT pid, user_id,
           coalesce(cid, -1) AS last_click_id,
           coalesce(gap_us, -1) AS gap_us
    FROM (
      SELECT p.pid, p.user_id, c.cid,
             epoch_us(p.ts) - epoch_us(c.ts) AS gap_us,
             row_number() OVER (PARTITION BY p.pid
               ORDER BY c.ts DESC, c.cid DESC) AS rk
      FROM p LEFT JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts
    ) WHERE rk = 1
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (an operator Spark lacks natively): for each purchase,
    the most recent prior click by the same user.  Composed as
    range-join + per-key rank-1 window; ties broken by click id.

    Scale: the join shuffles on user_id (the equi key); per-user event
    counts bound the range fan-out.  The applyInPandas/merge_asof
    formulation (tested equal in tests/test_asof.py) is the fallback
    when per-key history is too long for the join fan-out.
    """
    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), "user_id", "ts"
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("cid"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    w = Window.partitionBy("pid").orderBy(
        F.col("c_ts").desc(), F.col("cid").desc()
    )
    return (
        p.join(
            c,
            (F.col("user_id") == F.col("c_user")) & (F.col("c_ts") <= F.col("ts")),
            "left",
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "pid",
            "user_id",
            F.coalesce("cid", F.lit(-1)).alias("last_click_id"),
            F.coalesce(
                F.unix_micros("ts") - F.unix_micros("c_ts"), F.lit(-1)
            ).alias("gap_us"),
        )
    )


@query(
    "q_tpch_q3",
    oracle=f"""
    SELECT l_orderkey,
           {sql_rnd(_sql_dsum("l_extendedprice * (1 - l_discount)"))} AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): selective dimension filter ->
    3-way join -> agg -> global top-10.  Catalyst broadcasts the
    filtered customer side; TakeOrderedAndProject caps the sort."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-03-15")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1995-03-15")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(rnd(_dsum(rev)).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
    )


@query(
    "q_tpch_q5",
    oracle=f"""
    SELECT n_name,
           {sql_rnd(_sql_dsum("l_extendedprice * (1 - l_discount)"))} AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local supplier volume): 6-way join with a
    same-nation co-location predicate, region filter pushed through the
    dimension chain."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(rnd(_dsum(rev)).alias("revenue"))
    )


@query(
    "q_tpch_q14",
    oracle=f"""
    SELECT CAST(year(l_shipdate) AS INTEGER) AS y,
           {sql_rnd(
               "100.0 * CAST(" + _sql_dsum(
                   "CASE WHEN p_type LIKE 'PROMO%%' THEN l_extendedprice * (1 - l_discount) ELSE 0 END"
               ) + " AS DOUBLE) / CAST(" + _sql_dsum(
                   "l_extendedprice * (1 - l_discount)"
               ) + " AS DOUBLE)"
           )} AS promo_revenue_pct,
           count(*) AS n
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY 1
    """,
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): fact-dimension join with
    conditional aggregation — promo revenue share per ship year.  The
    part side broadcasts; the CASE lives inside the decimal sum so the
    ratio is exact before the final double division."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.year("l_shipdate").alias("y"))
        .agg(
            rnd(
                F.lit(100.0)
                * _dsum(promo).cast("double")
                / _dsum(rev).cast("double")
            ).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "q_window_range_frame",
    oracle=f"""
    SELECT o_orderkey, o_custkey,
           {sql_rnd("sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY epoch_us(o_orderdate) RANGE BETWEEN 2592000000000 PRECEDING AND CURRENT ROW)")} AS trailing_30d
    FROM orders
    """,
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame: per customer, trailing-30-day order total (range on
    epoch-micros, so the frame is value-based, not row-based)."""
    # o_orderdate is TIMESTAMP_NTZ on disk; cast to TIMESTAMP (session is
    # UTC) so unix_micros matches DuckDB's epoch_us
    o = load(spark, sf_dir, "orders").withColumn(
        "odate_us", F.unix_micros(F.col("o_orderdate").cast("timestamp"))
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("odate_us")
        .rangeBetween(-2_592_000_000_000, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        rnd(F.sum("o_totalprice").over(w)).alias("trailing_30d"),
    )


@query(
    "q_window_analytics",
    oracle=f"""
    SELECT o_orderkey, o_custkey,
           first_value(o_orderkey) OVER w AS first_ok,
           last_value(o_orderkey) OVER w_full AS last_ok,
           nth_value(o_orderkey, 2) OVER w_full AS second_ok,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile,
           {sql_rnd("percent_rank() OVER w")} AS prank,
           {sql_rnd("cume_dist() OVER w")} AS cdist
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey),
           w_full AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window battery: first/last/nth value, ntile,
    percent_rank, cume_dist — deterministic via full tie-broken order."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_ok"),
        F.last("o_orderkey").over(wf).alias("last_ok"),
        F.nth_value("o_orderkey", 2).over(wf).alias("second_ok"),
        F.ntile(4).over(w).alias("quartile"),
        rnd(F.percent_rank().over(w)).alias("prank"),
        rnd(F.cume_dist().over(w)).alias("cdist"),
    )


@query(
    "q_string_funcs2",
    oracle="""
    SELECT c_custkey,
           concat_ws('|', c_mktsegment, c_name) AS tagged,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
           replace(c_name, 'Customer', 'Cust') AS replaced,
           reverse(c_mktsegment) AS rev,
           CAST(strpos(c_name, '0') AS INTEGER) AS zero_pos,
           repeat(left(c_mktsegment, 1), 3) AS tricked
    FROM customer
    """,
)
def q_string_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string battery: concat_ws, lpad, replace, reverse,
    position, repeat/left."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.concat_ws("|", "c_mktsegment", "c_name").alias("tagged"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("replaced"),
        F.reverse("c_mktsegment").alias("rev"),
        F.instr("c_name", "0").alias("zero_pos"),
        F.repeat(F.substring("c_mktsegment", 1, 1), 3).alias("tricked"),
    )


@query(
    "q_conditional_funcs",
    oracle=f"""
    SELECT o_orderkey,
           greatest(o_totalprice, 100000.0) AS hi,
           least(o_totalprice, 100000.0) AS lo,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
           CASE WHEN o_totalprice > 200000 THEN 'big'
                WHEN o_totalprice > 50000 THEN 'mid'
                ELSE 'small' END AS bucket,
           CAST(o_totalprice > 100000 AS BOOLEAN) AS is_large
    FROM orders
    """,
)
def q_conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional battery: greatest/least, nullif+coalesce, CASE
    ladder, boolean projection."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.greatest("o_totalprice", F.lit(100000.0)).alias("hi"),
        F.least("o_totalprice", F.lit(100000.0)).alias("lo"),
        F.coalesce(
            F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN")
        ).alias("status_or_open"),
        F.when(F.col("o_totalprice") > 200000, "big")
        .when(F.col("o_totalprice") > 50000, "mid")
        .otherwise("small")
        .alias("bucket"),
        (F.col("o_totalprice") > 100000).alias("is_large"),
    )


@query(
    "q_bitwise_funcs",
    oracle="""
    SELECT event_id,
           event_id & 255 AS low_byte,
           event_id | 4096 AS with_bit,
           xor(event_id, 1365) AS xored,
           event_id << 2 AS shifted,
           CAST(bit_count(event_id) AS INTEGER) AS popcount
    FROM events
    """,
)
def q_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise battery: and/or/xor/shift/popcount on ids."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.expr("event_id & 255").alias("low_byte"),
        F.expr("event_id | 4096").alias("with_bit"),
        F.expr("event_id ^ 1365").alias("xored"),
        F.expr("shiftleft(event_id, 2)").alias("shifted"),
        F.bit_count("event_id").alias("popcount"),
    )


@query(
    "q_agg_stats",
    oracle=f"""
    SELECT l_returnflag,
           {sql_rnd("stddev_samp(l_quantity)")} AS sd_qty,
           {sql_rnd("var_samp(l_discount)")} AS var_disc,
           {sql_rnd("corr(l_quantity, l_extendedprice)")} AS corr_qty_price,
           {sql_rnd("covar_samp(l_discount, l_tax)")} AS cov_disc_tax
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: stddev/variance/correlation/covariance.
    Columns chosen with small magnitudes so cross-engine accumulation
    error (~1e-9 relative) stays far below the 4-decimal rounding."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        rnd(F.stddev_samp("l_quantity")).alias("sd_qty"),
        rnd(F.var_samp("l_discount")).alias("var_disc"),
        rnd(F.corr("l_quantity", "l_extendedprice")).alias("corr_qty_price"),
        rnd(F.covar_samp("l_discount", "l_tax")).alias("cov_disc_tax"),
    )


@query(
    "q_tpch_q2_min_cost",
    oracle="""
    SELECT s.s_suppkey, s.s_name, n.n_name,
           CAST(cnt.n_parts AS BIGINT) AS n_parts
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN (
      SELECT l_suppkey, count(DISTINCT l_partkey) AS n_parts
      FROM lineitem GROUP BY l_suppkey
    ) cnt ON cnt.l_suppkey = s.s_suppkey
    WHERE s.s_acctbal >= (SELECT avg(s2.s_acctbal) FROM supplier s2)
    """,
)
def q_tpch_q2_min_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q2-flavoured shape: uncorrelated scalar subquery threshold
    (suppliers at/above the average balance) + dimension join + distinct
    count per supplier."""
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    li = load(spark, sf_dir, "lineitem")
    avg_bal = s.agg(F.avg("s_acctbal").alias("a"))
    cnt = li.groupBy("l_suppkey").agg(
        F.countDistinct("l_partkey").alias("n_parts")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(cnt, cnt.l_suppkey == s.s_suppkey)
        .crossJoin(F.broadcast(avg_bal))
        .filter(F.col("s_acctbal") >= F.col("a"))
        .select("s_suppkey", "s_name", "n_name", "n_parts")
    )


@query(
    "q_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'quantity' AS measure,
           l_quantity AS val FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide -> long) via stack(): three measures to
    (measure, val) rows — the melt primitive for feature tables."""
    li = load(spark, sf_dir, "lineitem")
    return li.selectExpr(
        "l_orderkey",
        "l_linenumber",
        "stack(3, 'quantity', l_quantity, 'discount', l_discount,"
        " 'tax', l_tax) AS (measure, val)",
    )


@query(
    "q_histogram",
    oracle="""
    SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
           count(*) AS n,
           min(o_totalprice) AS lo,
           max(o_totalprice) AS hi
    FROM orders
    GROUP BY 1
    """,
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (data profiling for pipeline QA): bucket by
    floor(value/step), per-bucket count and min/max (exact doubles)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.floor(F.col("o_totalprice") / 50000.0).cast("bigint").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )


@query(
    "q_null_semantics",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_rows,
           count(nullif(o_orderstatus, 'O')) AS n_nonopen,
           CAST(sum(CASE WHEN nullif(o_orderstatus, 'O') IS NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           coalesce(max(nullif(o_orderstatus, 'O')), 'NONE') AS max_status
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-semantics battery: count(col) skips nulls, count(*) doesn't;
    aggregate over a nullable derivation; coalesce fallback."""
    o = load(spark, sf_dir, "orders")
    nn = F.nullif("o_orderstatus", F.lit("O"))
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(nn).alias("n_nonopen"),
        F.sum(F.when(nn.isNull(), 1).otherwise(0)).cast("bigint").alias("n_null"),
        F.coalesce(F.max(nn), F.lit("NONE")).alias("max_status"),
    )


@query(
    "q_percentiles",
    oracle=f"""
    SELECT o_orderstatus,
           {sql_rnd("quantile_cont(o_totalprice, 0.5)")} AS median_price,
           {sql_rnd("quantile_cont(o_totalprice, 0.9)")} AS p90_price,
           {sql_rnd("min(o_totalprice)")} AS min_price
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear interpolation — identical arithmetic on
    both engines given the same sorted values)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        rnd(F.expr("percentile(o_totalprice, 0.5)")).alias("median_price"),
        rnd(F.expr("percentile(o_totalprice, 0.9)")).alias("p90_price"),
        rnd(F.min("o_totalprice")).alias("min_price"),
    )


@query(
    "q_date_funcs2",
    oracle="""
    SELECT o_orderkey,
           strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d')
             AS due_date,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d')
             AS month_end,
           CAST(date_diff('day', DATE '1995-01-01',
                CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since_95,
           CAST(dayofweek(o_orderdate) AS INTEGER) AS dow,
           CAST(quarter(o_orderdate) AS INTEGER) AS q
    FROM orders
    """,
)
def q_date_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-arithmetic battery: interval add, month end, day diff,
    day-of-week, quarter.  DuckDB dayofweek is 0=Sunday..6 while Spark
    dayofweek is 1=Sunday..7 — normalized to DuckDB's by -1."""
    o = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("due_date"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).alias("days_since_95"),
        (F.dayofweek(d) - 1).cast("int").alias("dow"),
        F.quarter(d).cast("int").alias("q"),
    )


@query(
    "q_join_full",
    oracle="""
    WITH hi AS (
      SELECT o_custkey, count(*) AS n_big FROM orders
      WHERE o_totalprice > 300000 GROUP BY o_custkey
    ),
    seg AS (SELECT c_custkey, c_mktsegment FROM customer
            WHERE c_mktsegment IN ('BUILDING', 'MACHINERY'))
    SELECT coalesce(seg.c_custkey, hi.o_custkey) AS custkey,
           coalesce(seg.c_mktsegment, 'UNKNOWN') AS segment,
           coalesce(hi.n_big, 0) AS n_big
    FROM seg FULL OUTER JOIN hi ON seg.c_custkey = hi.o_custkey
    """,
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join with both-sides null handling: selected segments
    vs high-value order counts."""
    hi = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_big"))
    )
    seg = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    ).select("c_custkey", "c_mktsegment")
    return (
        seg.join(hi, seg.c_custkey == hi.o_custkey, "full_outer")
        .select(
            F.coalesce("c_custkey", "o_custkey").alias("custkey"),
            F.coalesce("c_mktsegment", F.lit("UNKNOWN")).alias("segment"),
            F.coalesce("n_big", F.lit(0)).alias("n_big"),
        )
    )


@query(
    "q_order_nulls",
    oracle="""
    SELECT o_orderkey,
           CAST(row_number() OVER (PARTITION BY o_orderpriority
             ORDER BY nullif(o_orderstatus, 'O') ASC NULLS LAST,
                      o_orderkey) AS INTEGER) AS rn
    FROM orders
    QUALIFY rn <= 5
    """,
)
def q_order_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit null ordering: Spark defaults to NULLS FIRST on ASC,
    DuckDB to NULLS LAST — portable code must always pin it
    (asc_nulls_last here)."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.nullif("o_orderstatus", F.lit("O")).asc_nulls_last(),
        "o_orderkey",
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("o_orderkey", "rn")
    )


@query(
    "q_tpch_q6",
    oracle=f"""
    SELECT {sql_rnd(_sql_dsum("l_extendedprice * l_discount"))} AS revenue,
           count(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (forecast revenue): pure filter->agg, every
    predicate pushable to the parquet scan — a pushdown showcase; one
    partial+final agg, no shuffle beyond the final single-row merge."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        rnd(_dsum(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "q_tpch_q4",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    """,
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order priority checking), adapted to the fixture
    schema: EXISTS(lineitem shipped after the order date) -> LEFT SEMI
    join, then a tiny groupBy.  The semi join carries the correlated
    l_shipdate > o_orderdate predicate as a join condition."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-07-01")
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q_tpch_q12",
    oracle="""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_linestatus
    """,
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (priority split), adapted: join + conditional
    aggregation (sum of CASE), the canonical pivot-free two-way split."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


_PROFILE_COLS = [
    # (column, kind) — kind picks the numeric min/max expression;
    # strings get NULLs (no cross-engine float/string formatting risk)
    ("o_orderkey", "num"),
    ("o_custkey", "num"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "num"),
    ("o_orderdate", "ts"),
    ("o_orderpriority", "str"),
]


def _profile_oracle() -> str:
    parts = []
    for c, kind in _PROFILE_COLS:
        if kind == "num":
            mn = sql_rnd(f"min({c})")
            mx = sql_rnd(f"max({c})")
        elif kind == "ts":
            mn = sql_rnd(f"epoch_us(min({c})) / 86400000000.0")
            mx = sql_rnd(f"epoch_us(max({c})) / 86400000000.0")
        else:
            mn = mx = "CAST(NULL AS DOUBLE)"
        parts.append(
            f"SELECT '{c}' AS col_name, count(*) AS n_rows,"
            f" count(*) - count({c}) AS n_null,"
            f" count(DISTINCT {c}) AS n_distinct,"
            f" {mn} AS min_num, {mx} AS max_num FROM orders"
        )
    return " UNION ALL ".join(parts)


@query("q_table_profile", oracle=_profile_oracle())
def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column profile of the orders table: per column the
    row count, null count, exact distinct count, and numeric min/max
    (timestamps as epoch days; strings get NULL bounds so no
    cross-engine string/float formatting can perturb the hash) — the
    statistics block an optimizer or a data-quality monitor reads.

    Scale shape: ONE scan computes every column's aggregates in a
    single agg (the multi-distinct is Catalyst's expand — 6 distinct
    columns is a constant fan-out), then a stack() pivots the single
    row into one row per column.  No per-column re-scan."""
    t = load(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c, kind in _PROFILE_COLS:
        aggs.append(F.count(c).alias(f"{c}__nn"))
        aggs.append(F.countDistinct(c).alias(f"{c}__nd"))
        if kind == "num":
            aggs.append(rnd(F.min(c).cast("double")).alias(f"{c}__mn"))
            aggs.append(rnd(F.max(c).cast("double")).alias(f"{c}__mx"))
        elif kind == "ts":
            aggs.append(
                rnd(F.unix_micros(F.min(c)) / 86400000000.0).alias(f"{c}__mn")
            )
            aggs.append(
                rnd(F.unix_micros(F.max(c)) / 86400000000.0).alias(f"{c}__mx")
            )
        else:
            aggs.append(F.lit(None).cast("double").alias(f"{c}__mn"))
            aggs.append(F.lit(None).cast("double").alias(f"{c}__mx"))
    one = t.agg(*aggs)
    n = len(_PROFILE_COLS)
    stack = ", ".join(
        f"'{c}', n_rows - {c}__nn, {c}__nd, {c}__mn, {c}__mx"
        for c, _ in _PROFILE_COLS
    )
    return one.selectExpr(
        "n_rows",
        f"stack({n}, {stack}) AS (col_name, n_null, n_distinct, min_num, max_num)",
    ).select("col_name", "n_rows", "n_null", "n_distinct", "min_num", "max_num")


_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _corr_oracle() -> str:
    pairs = [
        (a, b)
        for i, a in enumerate(_CORR_COLS)
        for b in _CORR_COLS[i + 1 :]
    ]
    parts = [
        f"SELECT '{a}' AS col_a, '{b}' AS col_b,"
        f" {sql_rnd(f'corr({a}, {b})')} AS corr FROM lineitem"
        for a, b in pairs
    ]
    return " UNION ALL ".join(parts)


@query("q_corr_matrix", oracle=_corr_oracle())
def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation matrix over lineitem's numeric columns (the
    upper triangle, 6 pairs) — the statistics block behind feature
    selection and redundancy pruning.

    Scale shape: ONE scan computes every pairwise corr in a single agg
    (each is a co-moment aggregate with map-side partials), then
    stack() pivots the row — no per-pair re-scan, no driver math."""
    t = load(spark, sf_dir, "lineitem")
    pairs = [
        (a, b)
        for i, a in enumerate(_CORR_COLS)
        for b in _CORR_COLS[i + 1 :]
    ]
    aggs = [
        rnd(F.corr(a, b)).alias(f"c_{i}") for i, (a, b) in enumerate(pairs)
    ]
    one = t.agg(*aggs)
    stack = ", ".join(
        f"'{a}', '{b}', c_{i}" for i, (a, b) in enumerate(pairs)
    )
    return one.selectExpr(
        f"stack({len(pairs)}, {stack}) AS (col_a, col_b, corr)"
    )
