"""TPC-H-derived query pack (SURVEY.md §2B — joins/aggs/subqueries).

The reference implements none of these (its only "join" is the
in-Python label ``list[idx]`` lookup, ``python/
predict_batch_threaded_local.py:159``); this module is the breadth of
the relational surface, adapted to the driver's TPC-H-ish schema
(no partsupp table — distinct (l_partkey, l_suppkey) pairs from
lineitem stand in; no l_commitdate/l_receiptdate — adapted
predicates noted per query).

Scale posture (100 TB):
- dim tables (region/nation/supplier/part/customer at these ratios)
  are broadcast by Catalyst under the adaptive broadcast threshold;
  fact-fact joins (orders⋈lineitem) shuffle on the join key with AQE
  skew splitting.
- every aggregate is partial+final (map-side combine) automatically;
  no driver-side collects anywhere.
- money sums are rounded to 2dp in BOTH engines so distributed
  accumulation order can't flip the driver's value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from swat_mapreduce_spark.functions import rounding as R
from swat_mapreduce_spark.queries import register
from swat_mapreduce_spark.sources.readers import read_table


def _t(spark, sf_dir, *names):
    return [read_table(spark, sf_dir, n) for n in names]


def _rev():
    # built lazily per call: F.col() needs an active SparkContext, and
    # this module must be importable (load_all/oracle_sql) before the
    # driver creates its session
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# --- Q2 (adapted): best supplier per part --------------------------------
# No partsupp table: the supplied-parts relation is the distinct
# (l_partkey, l_suppkey) projection of lineitem. Pick, per STANDARD
# part of size <= 15 supplied from ASIA, the supplier with the highest
# account balance (deterministic tiebreak on s_suppkey).
_Q2_ORACLE = """
WITH partsupp AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
ranked AS (
  SELECT p_partkey, p_type, p_size, s_suppkey, s_name,
         round(s_acctbal, 2) AS s_acctbal, n_name,
         row_number() OVER (PARTITION BY p_partkey
                            ORDER BY s_acctbal DESC, s_suppkey) AS rn
  FROM partsupp
  JOIN part ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE p_type = 'STANDARD' AND p_size <= 15 AND r_name = 'ASIA'
)
SELECT p_partkey, p_type, p_size, s_suppkey, s_name, s_acctbal, n_name
FROM ranked WHERE rn = 1
"""


@register("q2_best_supplier_per_part", oracle=_Q2_ORACLE)
def q2_best_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, part, supp, nation, region = _t(
        spark, sf_dir, "lineitem", "part", "supplier", "nation", "region"
    )
    partsupp = li.select("l_partkey", "l_suppkey").distinct()
    part_f = part.filter((F.col("p_type") == "STANDARD") & (F.col("p_size") <= 15))
    asia_supp = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region.filter(F.col("r_name") == "ASIA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    w = Window.partitionBy("p_partkey").orderBy(
        F.desc("s_acctbal"), F.asc("s_suppkey")
    )
    return (
        partsupp.join(part_f, partsupp.l_partkey == part_f.p_partkey)
        .join(asia_supp, partsupp.l_suppkey == F.col("s_suppkey"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "p_partkey", "p_type", "p_size", "s_suppkey", "s_name",
            R.r("s_acctbal", 2).alias("s_acctbal"), "n_name",
        )
    )


# --- Q4 (adapted): order priority checking (EXISTS → left-semi join) -----
# TPC-H Q4 uses l_commitdate < l_receiptdate (columns absent here);
# adapted predicate: a lineitem shipped strictly after the order date.
_Q4_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
"""


@register("q4_order_priority", oracle=_Q4_ORACLE)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, li = _t(spark, sf_dir, "orders", "lineitem")
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    # left-semi: Catalyst plans EXISTS as semi join; no row duplication
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# --- Q6: forecasting revenue change (scan-heavy scalar agg) --------------
_Q6_ORACLE = """
SELECT round(sum(CAST(l_extendedprice * l_discount AS DECIMAL(30,8))), 2)::DOUBLE AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("q6_forecast_revenue", oracle=_Q6_ORACLE)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(R.money_sum(F.col("l_extendedprice") * F.col("l_discount"))
             .alias("revenue"))
    )


# --- Q7: volume shipping between two nations per year --------------------
_Q7_ORACLE = """
SELECT supp_nation, cust_nation, l_year, round(sum(CAST(volume AS DECIMAL(30,8))), 2)::DOUBLE AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         EXTRACT(year FROM l_shipdate) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_10')
      OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_9'))
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


@register("q7_volume_shipping", oracle=_Q7_ORACLE)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, supp, orders, cust, nation = _t(
        spark, sf_dir, "lineitem", "supplier", "orders", "customer", "nation"
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == "NATION_9")
             & (F.col("cust_nation") == "NATION_10"))
            | ((F.col("supp_nation") == "NATION_10")
               & (F.col("cust_nation") == "NATION_9"))
        )
        .withColumn("l_year", F.year("l_shipdate").cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(R.money_sum(_rev()).alias("revenue"))
    )


# --- Q8: national market share within a region per year ------------------
_Q8_ORACLE = """
SELECT o_year,
       round(sum(CASE WHEN nation = 'NATION_2' THEN volume ELSE 0 END)
             / sum(volume), 4) AS mkt_share
FROM (
  SELECT EXTRACT(year FROM o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n1.n_name AS nation
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  JOIN region ON n2.n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
) all_nations
GROUP BY o_year
"""


@register("q8_market_share", oracle=_Q8_ORACLE)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, supp, orders, cust, nation, region = _t(
        spark, sf_dir, "lineitem", "supplier", "orders", "customer", "nation",
        "region",
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    asia = region.filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(asia), F.col("c_rk") == F.col("r_regionkey"))
        .withColumn("o_year", F.year("o_orderdate").cast("long"))
        .withColumn("volume", _rev())
        .groupBy("o_year")
        .agg(
            R.r(
                F.sum(F.when(F.col("nation") == "NATION_2", F.col("volume"))
                      .otherwise(F.lit(0.0)))
                / F.sum("volume"),
                4,
            ).alias("mkt_share")
        )
    )


# --- Q9 (adapted): product-type profit by nation and year ----------------
# No ps_supplycost: profit = revenue only, over PROMO parts.
_Q9_ORACLE = """
SELECT nation, o_year, round(sum(CAST(amount AS DECIMAL(30,8))), 2)::DOUBLE AS sum_profit
FROM (
  SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) AS amount
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN part ON p_partkey = l_partkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE p_type = 'PROMO'
) profit
GROUP BY nation, o_year
"""


@register("q9_product_profit", oracle=_Q9_ORACLE)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, supp, part, orders, nation = _t(
        spark, sf_dir, "lineitem", "supplier", "part", "orders", "nation"
    )
    promo = part.filter(F.col("p_type") == "PROMO").select("p_partkey")
    return (
        li.join(promo, li.l_partkey == F.col("p_partkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            _rev().alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(R.money_sum("amount").alias("sum_profit"))
    )


# --- Q10: returned-item reporting (top 20 customers by lost revenue) -----
_Q10_ORACLE = """
SELECT c_custkey, c_name,
       round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8))), 2)::DOUBLE AS revenue,
       round(c_acctbal, 2) AS c_acctbal, n_name
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-07-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("q10_returned_items", oracle=_Q10_ORACLE)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders, li, nation = _t(
        spark, sf_dir, "customer", "orders", "lineitem", "nation"
    )
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    l = li.filter(F.col("l_returnflag") == "R")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(cust, o.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(R.money_sum(_rev()).alias("revenue"))
        .select(
            "c_custkey", "c_name", "revenue",
            R.r("c_acctbal", 2).alias("c_acctbal"), "n_name",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# --- Q13: customer order-count distribution (outer join + double agg) ----
_Q13_ORACLE = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders ON c_custkey = o_custkey
       AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
"""


@register("q13_order_count_distribution", oracle=_Q13_ORACLE)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders = _t(spark, sf_dir, "customer", "orders")
    o = orders.filter(F.col("o_orderpriority") != "1-URGENT")
    return (
        cust.join(o, cust.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


# --- Q14: promotion revenue share in one month (conditional agg) ---------
_Q14_ORACLE = """
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                          THEN l_extendedprice * (1 - l_discount)
                          ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01'
  AND l_shipdate < TIMESTAMP '1997-04-01'
"""


@register("q14_promo_revenue", oracle=_Q14_ORACLE)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, part = _t(spark, sf_dir, "lineitem", "part")
    l = li.filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    return (
        l.join(part, l.l_partkey == part.p_partkey)
        .agg(
            R.r(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", _rev())
                        .otherwise(F.lit(0.0)))
                / F.sum(_rev()),
                4,
            ).alias("promo_revenue")
        )
    )


# --- Q15: top supplier(s) by quarterly revenue (agg + scalar-max join) ---
_Q15_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8))), 2)::DOUBLE AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


@register("q15_top_supplier", oracle=_Q15_ORACLE)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, supp = _t(spark, sf_dir, "lineitem", "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(R.money_sum(_rev()).alias("total_revenue"))
    )
    # scalar max as a 1-row agg broadcast-crossed in — no single-partition
    # window, stays partition-parallel at any scale
    max_rev = revenue.agg(F.max("total_revenue").alias("max_rev"))
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .join(supp, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --- Q16 (adapted): supplier count per part attribute group --------------
_Q16_ORACLE = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) partsupp
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
GROUP BY p_brand, p_type, p_size
"""


@register("q16_supplier_count", oracle=_Q16_ORACLE)
def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, part = _t(spark, sf_dir, "lineitem", "part")
    partsupp = li.select("l_partkey", "l_suppkey").distinct()
    p = part.filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
    )
    return (
        partsupp.join(p, partsupp.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


# --- Q17: small-quantity-order revenue (correlated avg via co-group) -----
_Q17_ORACLE = """
SELECT round(sum(CAST(l_extendedprice AS DECIMAL(30,8))) / 7.0, 2)::DOUBLE AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#21'
  AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
                    WHERE l2.l_partkey = lineitem.l_partkey)
"""


@register("q17_small_qty_revenue", oracle=_Q17_ORACLE)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, part = _t(spark, sf_dir, "lineitem", "part")
    brand_parts = part.filter(F.col("p_brand") == "Brand#21").select("p_partkey")
    # correlated scalar subquery → per-part pre-agg + equi-join
    # (decorrelation by hand keeps one shuffle on l_partkey)
    li_brand = li.join(brand_parts,
                       li.l_partkey == F.col("p_partkey"))
    avg_qty = li_brand.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (F.avg("l_quantity") * 0.2).alias("qty_threshold")
    )
    return (
        li_brand.join(avg_qty,
                      F.col("l_partkey") == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(F.round(F.sum(F.col("l_extendedprice").cast("decimal(30,8)")) / 7.0, 2).cast("double").alias("avg_yearly"))
    )


# --- Q18: large-volume customers (HAVING over fact-fact join) ------------
_Q18_ORACLE = """
SELECT c_custkey, c_name, o_orderkey, o_orderdate,
       round(o_totalprice, 2) AS o_totalprice,
       round(sum(l_quantity), 2) AS sum_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey HAVING sum(l_quantity) > 150)
GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
"""


@register("q18_large_volume_customers", oracle=_Q18_ORACLE)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders, li = _t(spark, sf_dir, "customer", "orders", "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        li.join(big, li.l_orderkey == F.col("big_orderkey"), "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate",
                 "o_totalprice")
        .agg(R.r(F.sum("l_quantity"), 2).alias("sum_qty"))
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            R.r("o_totalprice", 2).alias("o_totalprice"), "sum_qty",
        )
    )


# --- Q19: disjunctive multi-attribute predicates (OR-of-ANDs) ------------
_Q19_ORACLE = """
SELECT round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8))), 2)::DOUBLE AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 21)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 40)
"""


@register("q19_disjunctive_revenue", oracle=_Q19_ORACLE)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, part = _t(spark, sf_dir, "lineitem", "part")
    joined = li.join(part, li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 21))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 40))
    )
    return joined.filter(cond).agg(R.money_sum(_rev()).alias("revenue"))


# --- Q22 (adapted): rich customers with no RECENT orders (anti join) -----
# (every customer has some order in this testdata, so the classic
# "no orders at all" predicate would yield an empty — i.e. vacuous —
# result; "no orders since 2000" keeps the anti join observable)
_Q22_ORACLE = """
SELECT c_mktsegment, count(*) AS numcust,
       round(sum(CAST(c_acctbal AS DECIMAL(30,8))), 2)::DOUBLE AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_mktsegment
"""


@register("q22_rich_inactive_customers", oracle=_Q22_ORACLE)
def q22_rich_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders = _t(spark, sf_dir, "customer", "orders")
    # scalar subquery: tiny 1-row agg, crossJoin broadcasts it
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            orders.filter(
                F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
            ),
            cust.c_custkey == orders.o_custkey,
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            R.money_sum("c_acctbal").alias("totacctbal"),
        )
    )


# --- Q12 (adapted): late-shipment priority distribution ------------------
# No l_shipmode/l_commitdate: classify lineitems shipped >60/ >90 days
# after the order date, count high- vs low-priority orders per class —
# Q12's conditional-aggregation shape on the available columns.
_Q12_ORACLE = """
SELECT CASE WHEN datediff('day', o_orderdate, l_shipdate) > 90
            THEN 'very_late' ELSE 'late' END AS lateness,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
       sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE datediff('day', o_orderdate, l_shipdate) > 60
GROUP BY lateness
"""


@register("q12_late_shipment_priority", oracle=_Q12_ORACLE)
def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders = _t(spark, sf_dir, "lineitem", "orders")
    lag_days = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(lag_days > 60)
        .withColumn(
            "lateness",
            F.when(lag_days > 90, "very_late").otherwise("late"),
        )
        .groupBy("lateness")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --- Q20 (adapted): suppliers with excess shipped volume -----------------
# No partsupp.availqty: flag suppliers whose shipped quantity of PROMO
# parts in 1997 exceeds 0.22 of their total shipped quantity —
# Q20's nested-subquery shape (semi-join against a per-supplier agg).
_Q20_ORACLE = """
WITH promo_qty AS (
    SELECT l_suppkey, sum(CASE WHEN p_type = 'PROMO' THEN l_quantity
                               ELSE 0 END) AS promo_qty,
           sum(l_quantity) AS total_qty
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, round(s_acctbal, 2) AS s_acctbal
FROM supplier
WHERE EXISTS (SELECT 1 FROM promo_qty
              WHERE l_suppkey = s_suppkey
                AND promo_qty > 0.22 * total_qty)
"""


@register("q20_promo_heavy_suppliers", oracle=_Q20_ORACLE)
def q20_promo_heavy_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, part, supp = _t(spark, sf_dir, "lineitem", "part", "supplier")
    l97 = li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    per_supp = (
        l97.join(part, l97.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                F.when(F.col("p_type") == "PROMO", F.col("l_quantity"))
                .otherwise(F.lit(0.0))
            ).alias("promo_qty"),
            F.sum("l_quantity").alias("total_qty"),
        )
        # 0.22: PROMO is 1-of-6 part types (~0.17 mean share); 0.22
        # selects the promo-heavy tail non-vacuously at every sf
        .filter(F.col("promo_qty") > 0.22 * F.col("total_qty"))
    )
    return (
        supp.join(per_supp, supp.s_suppkey == per_supp.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name", R.r("s_acctbal", 2).alias("s_acctbal"))
    )


# --- Q11 (adapted): supplier value concentration -------------------------
# No partsupp value: per-supplier shipped revenue share, keeping
# suppliers above the mean supplier value — Q11's HAVING-against-
# global-scalar shape.
_Q11_ORACLE = """
WITH per_supp AS (
    SELECT l_suppkey,
           round(sum(CAST(l_extendedprice * (1 - l_discount)
                     AS DECIMAL(30,8))), 2)::DOUBLE AS value
    FROM lineitem GROUP BY l_suppkey
)
SELECT l_suppkey, value
FROM per_supp
WHERE value > (SELECT avg(value) FROM per_supp)
"""


@register("q11_supplier_concentration", oracle=_Q11_ORACLE)
def q11_supplier_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = _t(spark, sf_dir, "lineitem")
    per_supp = li.groupBy("l_suppkey").agg(
        R.money_sum(_rev()).alias("value")
    )
    # above-average cutoff: |suppliers| grows with sf, so any fixed
    # share fraction eventually selects nothing; the mean is scale-free
    total = per_supp.agg(F.avg("value").alias("cutoff"))
    return (
        per_supp.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.col("cutoff"))
        .select("l_suppkey", "value")
    )


# --- Q21 (adapted): sole-late supplier in multi-supplier orders ----------
# No l_receiptdate/commitdate: a line is "late" if shipped >90 days
# after the order date. Find suppliers who were the ONLY late supplier
# on an order involving 2+ suppliers — Q21's EXISTS/NOT-EXISTS double
# correlation, expressed as per-order supplier aggregates.
_Q21_ORACLE = """
WITH per_order AS (
    SELECT l_orderkey,
           count(DISTINCT l_suppkey) AS n_supp,
           count(DISTINCT CASE WHEN datediff('day', o_orderdate, l_shipdate)
                                    > 90
                               THEN l_suppkey END) AS n_late_supp,
           any_value(CASE WHEN datediff('day', o_orderdate, l_shipdate) > 90
                          THEN l_suppkey END) AS only_late_supp
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    GROUP BY l_orderkey
)
SELECT s_suppkey, s_name, count(*) AS numwait
FROM per_order
JOIN supplier ON s_suppkey = only_late_supp
WHERE n_supp >= 2 AND n_late_supp = 1
GROUP BY s_suppkey, s_name
"""


@register("q21_sole_late_supplier", oracle=_Q21_ORACLE)
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders, supp = _t(spark, sf_dir, "lineitem", "orders", "supplier")
    late = F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 90
    # two-level agg instead of multi-count_distinct: the (order,
    # supplier) pre-aggregate avoids Catalyst's Expand-based distinct
    # rewrite (which duplicates every input row per distinct column)
    per_order_supp = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late.cast("int")).alias("was_late"))
    )
    per_order = (
        per_order_supp.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_supp"),
            F.sum("was_late").alias("n_late_supp"),
            F.max(
                F.when(F.col("was_late") == 1, F.col("l_suppkey"))
            ).alias("only_late_supp"),
        )
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
    )
    return (
        per_order.join(
            supp, F.col("only_late_supp") == F.col("s_suppkey")
        )
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
