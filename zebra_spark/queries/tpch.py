"""TPC-H query-shape completion (SURVEY §2.B extension surface).

relational.py carries Q1 (as q_agg_hash), Q2 (q_tpch_q2_min_cost), Q3,
Q4, Q5, Q6, Q12, Q14; this module adds the remaining 14 shapes — Q7,
Q8, Q9, Q10, Q11, Q13, Q15..Q22 — adapted where the fixture schema lacks a
TPC-H column (no partsupp table, no l_commitdate / l_receiptdate /
l_shipmode / p_container / c_phone / comments).  Each adaptation keeps
the *query shape* (the join/subquery/aggregation structure Catalyst has
to optimize) and swaps only the filter column:

- Q9/Q16/Q20 rebuild the part-supplier relation from lineitem
  (l_partkey, l_suppkey) since partsupp does not exist.
- Q13's comment filter becomes an order-priority filter.
- Q21's late-delivery predicate (receipt > commit) becomes
  l_linestatus = 'O' inside an o_orderstatus = 'F' order.
- Q22's phone-prefix country code becomes c_nationkey % 10, and
  "has no orders" (empty on this fixture — every customer orders)
  becomes "has no URGENT orders".

Scale stance: all dimension sides (part, supplier, nation, region,
filtered customer) broadcast; correlated EXISTS / NOT EXISTS become
left-semi / left-anti joins carrying the correlation as the join
condition; scalar subqueries (Q15 max, Q17 per-part avg, Q22 global
threshold) become tiny aggregates joined back — never a
single-partition window.  Money sums go through DECIMAL(18,6) for
order-insensitive exactness (see relational.py module docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zebra_spark.functions import rnd
from zebra_spark.io import load
from zebra_spark.registry import query, sql_rnd

DEC = "decimal(18,6)"


def _dsum(c) -> F.Column:
    return F.sum(c.cast(DEC))


def _sql_dsum(expr: str) -> str:
    return f"sum(CAST({expr} AS DECIMAL(18,6)))"


_REV = "l_extendedprice * (1 - l_discount)"


def _rev() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# --- Q7: volume shipping between two nations --------------------------------


@query(
    "q_tpch_q7",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           {sql_rnd(_sql_dsum("volume"))} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INTEGER) AS l_year,
             {_REV} AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                           AND TIMESTAMP '1997-12-31'
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): nation self-join aliased twice — the
    supplier's and the customer's nation — with a symmetric pair filter.
    Both nation sides broadcast; the pair predicate prunes before the
    fact-fact join."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between("1996-01-01", "1997-12-31")
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin("NATION_1", "NATION_2"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(rnd(_dsum(_rev())).alias("revenue"))
    )


# --- Q8: national market share ----------------------------------------------


@query(
    "q_tpch_q8",
    oracle=f"""
    SELECT o_year,
           {sql_rnd(
               "CAST(" + _sql_dsum("CASE WHEN nation = 'NATION_1' THEN volume ELSE 0 END")
               + " AS DOUBLE) / CAST(" + _sql_dsum("volume") + " AS DOUBLE)"
           )} AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
             {_REV} AS volume,
             n2.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        AND o_orderdate BETWEEN TIMESTAMP '1995-01-01'
                            AND TIMESTAMP '1996-12-31'
    )
    GROUP BY o_year
    """,
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (market share): conditional-sum ratio — one nation's
    share of regional volume per year.  The ratio divides two exact
    decimal sums cast to double, so both engines see identical operands."""
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between("1995-01-01", "1996-12-31")
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    ).select(F.col("n_nationkey").alias("n1_key"))
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    vol = _rev().cast(DEC)
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            rnd(
                F.sum(F.when(F.col("nation") == "NATION_1", vol).otherwise(
                    F.lit(0).cast(DEC)
                )).cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share")
        )
    )


# --- Q9: product-type profit ------------------------------------------------


@query(
    "q_tpch_q9",
    oracle=f"""
    SELECT nation, o_year, {sql_rnd(_sql_dsum("amount"))} AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(year(o_orderdate) AS INTEGER) AS o_year,
             l_extendedprice * (1 - l_discount)
               - 0.6 * p_retailprice * l_quantity AS amount
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%widget%'
    )
    GROUP BY nation, o_year
    """,
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit), adapted: no partsupp table, so
    supply cost is modeled as 0.6 * p_retailprice (the shape — fact
    joined to part+supplier+orders, profit expression aggregated by
    nation and year — is unchanged)."""
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = load(spark, sf_dir, "nation")
    amount = _rev() - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(rnd(_dsum(amount)).alias("sum_profit"))
    )


# --- Q10: returned-item reporting -------------------------------------------


@query(
    "q_tpch_q10",
    oracle=f"""
    SELECT c_custkey, c_name, {sql_rnd(_sql_dsum(_REV))} AS revenue,
           {sql_rnd("c_acctbal")} AS c_acctbal, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned items): one-quarter order window, returned
    lineitems only, top-20 customers by lost revenue.  Global top-k is
    TakeOrderedAndProject (orderBy+limit), never a full sort."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-04-01")
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(rnd(_dsum(_rev())).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
        .select(
            "c_custkey", "c_name", "revenue",
            rnd(F.col("c_acctbal")).alias("c_acctbal"), "n_name",
        )
    )


# --- Q13: customer order-count distribution ---------------------------------


@query(
    "q_tpch_q13",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                      AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer distribution), adapted: the comment-pattern
    exclusion becomes an order-priority exclusion inside the LEFT JOIN
    condition (kept in the join, not a post-filter, so customers whose
    only orders are URGENT still count as zero).  Double aggregation:
    per-customer count, then histogram of counts."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


# --- Q15: top supplier ------------------------------------------------------


@query(
    "q_tpch_q15",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {_sql_dsum(_REV)} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           {sql_rnd("CAST(total_revenue AS DOUBLE)")} AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): revenue view + scalar-max subquery.
    The max is a 1-row aggregate broadcast back onto the revenue rows —
    not a global window — so the pattern survives any supplier count.
    Revenue stays DECIMAL through the max-equality (exact tie semantics
    on both engines), rounded only at output."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _dsum(_rev()).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name",
            rnd(F.col("total_revenue").cast("double")).alias("total_revenue"),
        )
    )


# --- Q16: part/supplier relationship ----------------------------------------


@query(
    "q_tpch_q16",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    """,
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (part/supplier relationship), adapted: the
    part-supplier relation is rebuilt from lineitem (no partsupp
    table), and the complaint-comment exclusion becomes a negative
    account balance.  NOT IN over a non-null key is a left-anti join."""
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 23, 36, 45, 49)
    )
    bad = load(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --- Q17: small-quantity-order revenue --------------------------------------


@query(
    "q_tpch_q17",
    oracle=f"""
    SELECT {sql_rnd("CAST(" + _sql_dsum("l_extendedprice") + " AS DOUBLE) / 7.0")}
             AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3' AND p_size <= 10
      AND l_quantity < (
        SELECT 0.2 * (sum(l2.l_quantity) / count(*))
        FROM lineitem l2 WHERE l2.l_partkey = p_partkey
      )
    GROUP BY ()
    """,
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity orders): correlated per-part average
    subquery -> per-part aggregate joined back (broadcast — one row per
    filtered part).  l_quantity is integer-valued double, so its sum is
    exact and 0.2 * (sum/count) is bit-identical across engines.  The
    p_container filter becomes p_size (fixture has no container)."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_size") <= 10)
    ).select("p_partkey")
    picked = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    thresh = picked.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.lit(0.2) * (F.sum("l_quantity") / F.count(F.lit(1)))).alias("qty_cut")
    )
    return (
        picked.join(F.broadcast(thresh), F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            rnd(
                _dsum(F.col("l_extendedprice")).cast("double") / F.lit(7.0)
            ).alias("avg_yearly")
        )
    )


# --- Q18: large-volume customers --------------------------------------------


@query(
    "q_tpch_q18",
    oracle=f"""
    SELECT c_custkey, c_name, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           {sql_rnd("o_totalprice")} AS o_totalprice,
           {sql_rnd(_sql_dsum("l_quantity"))} AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING sum(l_quantity) > 250
    )
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): IN(grouped-HAVING subquery)
    -> left-semi join against the qualifying-order aggregate; top-100 by
    order value via TakeOrderedAndProject."""
    li = load(spark, sf_dir, "lineitem")
    big = li.groupBy("l_orderkey").agg(
        F.sum("l_quantity").alias("sq")
    ).filter(F.col("sq") > 250).select(F.col("l_orderkey").alias("big_ok"))
    o = load(spark, sf_dir, "orders").join(
        big, F.col("o_orderkey") == F.col("big_ok"), "left_semi"
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(rnd(_dsum(F.col("l_quantity"))).alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
        .select(
            "c_custkey", "c_name", "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            rnd(F.col("o_totalprice")).alias("o_totalprice"),
            "total_qty",
        )
    )


# --- Q19: discounted revenue (OR'd predicate triplets) ----------------------


@query(
    "q_tpch_q19",
    oracle=f"""
    SELECT {sql_rnd(_sql_dsum(_REV))} AS revenue, count(*) AS n_rows
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): disjunction of brand/size/qty
    triplets spanning both join sides — the classic test that the
    optimizer extracts the common join key and pushes each side's
    residual (p_brand/p_size to part, l_quantity stays post-join
    because each disjunct couples the two sides)."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    t1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    )
    t2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    )
    t3 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(t1 | t2 | t3)
        .agg(
            rnd(_dsum(_rev())).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# --- Q20: potential part promotion ------------------------------------------


@query(
    "q_tpch_q20",
    oracle="""
    SELECT s_name, round(s_acctbal, 2) AS s_acctbal
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE '%widget%'
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_suppkey, l_partkey
      HAVING sum(l_quantity) > 40
    )
    ORDER BY s_name
    """,
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (part promotion), adapted: availability (partsupp
    ps_availqty) is rebuilt as shipped-quantity-per-(supplier, part)
    from lineitem; suppliers who moved > 40 units of any 'widget' part
    in 1996 qualify.  Nested IN -> grouped HAVING -> left-semi join."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    p = load(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%")
    ).select("p_partkey")
    qual = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 40)
        .select("l_suppkey")
    )
    s = load(spark, sf_dir, "supplier")
    # qual is distinct supplier keys — bounded by |supplier|, broadcast-safe
    return s.join(
        F.broadcast(qual), s.s_suppkey == qual.l_suppkey, "left_semi"
    ).select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))


# --- Q21: suppliers who kept orders waiting ---------------------------------


@query(
    "q_tpch_q21",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F' AND l1.l_linestatus = 'O'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_linestatus = 'O'
      )
    GROUP BY s_name
    """,
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting), adapted: "late"
    (l_receiptdate > l_commitdate, absent here) becomes "still open"
    (l_linestatus = 'O') within a finished ('F') order.  The correlated
    EXISTS / NOT EXISTS pair — another supplier participated, but no
    other supplier is still open — become a left-semi and a left-anti
    join, each carrying the suppkey-inequality correlation."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_linestatus"
    )
    l1 = li.filter(F.col("l_linestatus") == "O").select(
        F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sk")
    )
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    l1 = l1.join(o, F.col("ok") == F.col("o_orderkey"), "left_semi")
    l2 = li.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    )
    l3 = l1.select(
        F.col("ok").alias("ok3"), F.col("sk").alias("sk3")
    )
    waiting = l1.join(
        l2, (F.col("ok") == F.col("ok2")) & (F.col("sk") != F.col("sk2")),
        "left_semi",
    ).join(
        l3, (F.col("ok") == F.col("ok3")) & (F.col("sk") != F.col("sk3")),
        "left_anti",
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        waiting.join(F.broadcast(s), F.col("sk") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# --- Q22: global sales opportunity ------------------------------------------


@query(
    "q_tpch_q22",
    oracle=f"""
    WITH cand AS (
      SELECT c_custkey, c_nationkey % 10 AS cntrycode, c_acctbal
      FROM customer WHERE c_nationkey % 10 IN (1, 3, 5, 7, 9)
    ), thresh AS (
      SELECT {_sql_dsum("c_acctbal")} AS bal_sum,
             count(*) AS bal_cnt
      FROM cand WHERE c_acctbal > 0.0
    )
    SELECT cntrycode, count(*) AS numcust,
           {sql_rnd(_sql_dsum("c_acctbal"))} AS totacctbal
    FROM cand, thresh
    WHERE CAST(c_acctbal AS DECIMAL(18,6)) * bal_cnt > bal_sum
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
      )
    GROUP BY cntrycode
    """,
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity), adapted: country code =
    c_nationkey % 10 (no phone column) and the anti-join target is
    URGENT orders (every fixture customer has *some* order).  The
    above-average-balance threshold is compared exactly via
    cross-multiplication in DECIMAL — c_acctbal * count > sum — so no
    engine-dependent float division decides boundary rows."""
    cand = load(spark, sf_dir, "customer").filter(
        (F.col("c_nationkey") % 10).isin(1, 3, 5, 7, 9)
    ).select(
        "c_custkey",
        (F.col("c_nationkey") % 10).alias("cntrycode"),
        "c_acctbal",
    )
    thresh = cand.filter(F.col("c_acctbal") > 0.0).agg(
        _dsum(F.col("c_acctbal")).alias("bal_sum"),
        F.count(F.lit(1)).alias("bal_cnt"),
    )
    urgent = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_custkey")
    return (
        cand.join(F.broadcast(thresh))
        .filter(
            F.col("c_acctbal").cast(DEC) * F.col("bal_cnt") > F.col("bal_sum")
        )
        .join(urgent, cand.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            rnd(_dsum(F.col("c_acctbal"))).alias("totacctbal"),
        )
    )


@query(
    "q_tpch_q11",
    oracle=f"""
    WITH pv AS (
      SELECT l_partkey, {_sql_dsum(_REV)} AS value
      FROM lineitem GROUP BY l_partkey
    ),
    t AS (SELECT sum(value) AS total, count(*) AS n FROM pv)
    SELECT l_partkey AS p_partkey, {sql_rnd("value")} AS value
    FROM pv, t
    WHERE 5 * value * t.n > 6 * t.total
    """,
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape (important-stock scan): per-part value vs a global
    scalar threshold.  Adaptation: no partsupp table, so part value =
    lineitem revenue per partkey (the ps_supplycost * ps_availqty sum
    swaps to the same group-then-filter-by-global-fraction structure).

    The threshold is SCALE-INVARIANT — keep parts with value > 1.2x
    the mean part value (a fixed fraction of the total goes empty as
    the part count grows), written as the decimal comparison
    5*value*n > 6*total.  NOT bit-exact on Spark's side: decimal(28,6)
    * bigint exceeds the precision-38 cap, so Spark (with
    allowPrecisionLoss=true) reduces the scale and rounds at ~1e-5
    relative, while DuckDB evaluates the product exactly — safe here
    because no per-part value sits within ~1e-4 of its threshold at
    any tested SF (the decision margin dominates the rounding margin;
    ADVICE r4), and far safer than a double threshold's 1-ulp boundary
    flips.  The totals are
    resolved at plan-build time from the SAME aggregated frame (one
    corpus scan at execution; a lazy scalar subquery re-plans the
    whole per-part aggregation as a second scan — the
    q_text_surprisal lesson)."""
    li = load(spark, sf_dir, "lineitem")
    pv = li.groupBy("l_partkey").agg(_dsum(_rev()).alias("value"))
    total, n = pv.agg(
        F.sum("value").alias("t"), F.count(F.lit(1)).alias("n")
    ).first()
    return (
        pv.filter(
            F.lit(5) * F.col("value") * F.lit(n) > F.lit(6) * F.lit(total)
        )
        .select(F.col("l_partkey").alias("p_partkey"),
                rnd(F.col("value")).alias("value"))
    )
