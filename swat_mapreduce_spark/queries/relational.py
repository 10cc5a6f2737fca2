"""General relational parity layer (SURVEY.md §2B).

The reference has NO joins/aggregations/windows — this module exposes
the full relational surface a user of a query engine expects, as named
queries over the TPC-H-ish testdata, each with a DuckDB oracle.

Scale posture: all dim joins (region/nation/customer-sized) are
broadcastable and Catalyst broadcasts them under the default 10 MB
threshold; fact-fact joins shuffle on their keys with AQE skew
handling; aggregations are partial+final automatically (map-side
combine). Money sums are rounded to 2dp in BOTH engines so the
accumulation-order noise of distributed summation can't flip the
driver's value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from swat_mapreduce_spark.functions import rounding as R

from swat_mapreduce_spark.queries import register
from swat_mapreduce_spark.sources.readers import read_table


def _t(spark, sf_dir, *names):
    return [read_table(spark, sf_dir, n) for n in names]


# --- TPC-H Q1: pricing summary (filter → groupBy agg, map-side combine) ----
_Q1_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {R.duck_money_sum('l_quantity')} AS sum_qty,
       {R.duck_money_sum('l_extendedprice')} AS sum_base_price,
       {R.duck_money_sum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {R.duck_money_sum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", oracle=_Q1_ORACLE)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            R.money_sum("l_quantity").alias("sum_qty"),
            R.money_sum("l_extendedprice").alias("sum_base_price"),
            R.money_sum(disc_price).alias("sum_disc_price"),
            R.money_sum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            R.r(F.avg("l_quantity"), 4).alias("avg_qty"),
            R.r(F.avg("l_extendedprice"), 4).alias("avg_price"),
            R.r(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --- TPC-H Q3: shipping priority (3-way join, agg, deterministic top-10) ---
_Q3_ORACLE = f"""
SELECT l_orderkey,
       {R.duck_money_sum('l_extendedprice * (1 - l_discount)')} AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("q3_shipping_priority", oracle=_Q3_ORACLE)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders, li = _t(spark, sf_dir, "customer", "orders", "lineitem")
    cutoff = F.lit("1998-03-15").cast("timestamp")
    return (
        cust.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < cutoff)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > cutoff)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            R.money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


# --- TPC-H Q5: local supplier volume (6-way join incl. 2 broadcast dims) ---
_Q5_ORACLE = f"""
SELECT n_name,
       {R.duck_money_sum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


@register("q5_local_supplier_volume", oracle=_Q5_ORACLE)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders, li, supp, nation, region = _t(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region"
    )
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        # supplier is SF-scaled — no broadcast hint (the size threshold
        # still broadcasts it at small SF; at 100 TB AQE picks the
        # shuffle strategy). Hints are reserved for bounded dims.
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(
            R.money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
    )


# --- join variants ---------------------------------------------------------
_ANTI_ORACLE = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_totalprice > 400000
)
"""


@register("join_left_anti", oracle=_ANTI_ORACLE)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders = _t(spark, sf_dir, "customer", "orders")
    big = orders.filter(F.col("o_totalprice") > 400000)
    return cust.join(
        big, cust.c_custkey == big.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


# NOT IN vs NOT EXISTS under NULLs — SQL's classic 3VL trap, and a
# distinct physical join: a NOT IN whose subquery can yield NULL plans
# as a null-aware anti join (BroadcastNestedLoopJoin in Spark), because
# one NULL in the probe set makes EVERY `x NOT IN (...)` UNKNOWN and
# the result empty. The query PLANTS a NULL (every o_orderkey % 7 = 0
# probe row) and reports all three semantics side by side, so the 3VL
# collapse is pinned non-vacuously (n_notin_with_nulls = 0 while the
# other two counts are positive and equal).
_NULL_AWARE_ANTI_ORACLE = """
WITH probe AS (
    SELECT CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_custkey END AS k
    FROM orders WHERE o_totalprice > 300000
),
a AS (
    SELECT count(*) AS n_notin_with_nulls FROM customer
    WHERE c_custkey NOT IN (SELECT k FROM probe)
),
b AS (
    SELECT count(*) AS n_notin_nulls_filtered FROM customer
    WHERE c_custkey NOT IN (SELECT k FROM probe WHERE k IS NOT NULL)
),
c AS (
    SELECT count(*) AS n_not_exists FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM probe p WHERE p.k = c_custkey)
)
SELECT a.n_notin_with_nulls, b.n_notin_nulls_filtered, c.n_not_exists
FROM a, b, c
"""


@register("null_aware_anti_join", oracle=_NULL_AWARE_ANTI_ORACLE)
def null_aware_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders = _t(spark, sf_dir, "customer", "orders")
    cust.createOrReplaceTempView("naaj_customer")
    orders.createOrReplaceTempView("naaj_orders")
    return spark.sql(
        """
WITH probe AS (
    SELECT CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_custkey END AS k
    FROM naaj_orders WHERE o_totalprice > 300000
),
a AS (
    SELECT count(*) AS n_notin_with_nulls FROM naaj_customer
    WHERE c_custkey NOT IN (SELECT k FROM probe)
),
b AS (
    SELECT count(*) AS n_notin_nulls_filtered FROM naaj_customer
    WHERE c_custkey NOT IN (SELECT k FROM probe WHERE k IS NOT NULL)
),
c AS (
    SELECT count(*) AS n_not_exists FROM naaj_customer
    WHERE NOT EXISTS (SELECT 1 FROM probe p WHERE p.k = c_custkey)
)
SELECT a.n_notin_with_nulls, b.n_notin_nulls_filtered, c.n_not_exists
FROM a, b, c
"""
    )


_SEMI_ORACLE = """
SELECT c_custkey, c_acctbal FROM customer
WHERE EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
          AND o_totalprice > 300000
)
"""


@register("join_left_semi", oracle=_SEMI_ORACLE)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders = _t(spark, sf_dir, "customer", "orders")
    urgent = orders.filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 300000)
    )
    return cust.join(
        urgent, cust.c_custkey == urgent.o_custkey, "left_semi"
    ).select("c_custkey", "c_acctbal")


_OUTER_ORACLE = """
SELECT c_custkey,
       count(o_orderkey) AS n_orders,
       round(coalesce(sum(o_totalprice), 0), 2) AS total_spend
FROM customer
LEFT JOIN orders ON o_custkey = c_custkey AND o_orderstatus = 'F'
GROUP BY c_custkey
"""


@register("join_left_outer_agg", oracle=_OUTER_ORACLE)
def join_left_outer_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders = _t(spark, sf_dir, "customer", "orders")
    fin = orders.filter(F.col("o_orderstatus") == "F")
    return (
        cust.join(fin, cust.c_custkey == fin.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            R.r(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias(
                "total_spend"
            ),
        )
    )


_FULL_ORACLE = """
WITH cn AS (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1),
sn AS (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY 1)
SELECT coalesce(cn.nk, sn.nk) AS nationkey,
       coalesce(n_cust, 0) AS n_cust,
       coalesce(n_supp, 0) AS n_supp
FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
"""


@register("join_full_outer", oracle=_FULL_ORACLE)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, supp = _t(spark, sf_dir, "customer", "supplier")
    cn = cust.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.count(F.lit(1)).alias("n_cust")
    )
    sn = supp.groupBy(F.col("s_nationkey").alias("nk")).agg(
        F.count(F.lit(1)).alias("n_supp")
    )
    return cn.join(sn, cn.nk == sn.nk, "full").select(
        F.coalesce(cn.nk, sn.nk).alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


# --- aggregation suite -----------------------------------------------------
_AGG_ORACLE = """
SELECT c_nationkey,
       count(*) AS n_cust,
       count(DISTINCT c_mktsegment) AS n_segments,
       round(sum(c_acctbal), 2) AS sum_bal,
       round(avg(c_acctbal), 4) AS avg_bal,
       round(min(c_acctbal), 2) AS min_bal,
       round(max(c_acctbal), 2) AS max_bal
FROM customer
GROUP BY c_nationkey
"""


@register("agg_stats_distinct", oracle=_AGG_ORACLE)
def agg_stats_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    (cust,) = _t(spark, sf_dir, "customer")
    return cust.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.count_distinct("c_mktsegment").alias("n_segments"),
        R.r(F.sum("c_acctbal"), 2).alias("sum_bal"),
        R.r(F.avg("c_acctbal"), 4).alias("avg_bal"),
        R.r(F.min("c_acctbal"), 2).alias("min_bal"),
        R.r(F.max("c_acctbal"), 2).alias("max_bal"),
    )


_ROLLUP_ORACLE = """
SELECT year(o_orderdate) AS o_year, o_orderstatus,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY ROLLUP (year(o_orderdate), o_orderstatus)
"""


@register("agg_rollup", oracle=_ROLLUP_ORACLE)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    return (
        orders.withColumn("o_year", F.year("o_orderdate").cast("long"))
        .rollup("o_year", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            R.r(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


_CUBE_ORACLE = """
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders,
       round(avg(o_totalprice), 4) AS avg_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


@register("agg_cube", oracle=_CUBE_ORACLE)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        R.r(F.avg("o_totalprice"), 4).alias("avg_price"),
    )


_GSETS_ORACLE = """
SELECT c_mktsegment, c_nationkey, count(*) AS n
FROM customer
GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
"""


@register("agg_grouping_sets", oracle=_GSETS_ORACLE)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    (cust,) = _t(spark, sf_dir, "customer")
    cust.createOrReplaceTempView("_gs_customer")
    return spark.sql(
        """
        SELECT c_mktsegment, c_nationkey, count(*) AS n
        FROM _gs_customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        """
    )


# --- window functions ------------------------------------------------------
_WRANK_ORACLE = """
SELECT * FROM (
    SELECT o_custkey, o_orderkey, o_totalprice,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey) AS rn,
           rank() OVER (PARTITION BY o_custkey
                        ORDER BY o_orderstatus) AS status_rank
    FROM orders
) WHERE rn <= 3
"""


@register("window_rank_topn", oracle=_WRANK_ORACLE)
def window_rank_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    w2 = Window.partitionBy("o_custkey").orderBy("o_orderstatus")
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
            F.rank().over(w2).cast("long").alias("status_rank"),
        )
        .filter(F.col("rn") <= 3)
    )


_WRUN_ORACLE = """
SELECT event_id, user_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
           AS running_value,
       round(lag(value, 1, 0.0) OVER (PARTITION BY user_id ORDER BY ts, event_id), 4)
           AS prev_value,
       lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next_type,
       ntile(4) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS quartile
FROM events
"""


@register("window_running_lag", oracle=_WRUN_ORACLE)
def window_running_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "event_id",
        "user_id",
        R.r(
            F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 4
        ).alias("running_value"),
        R.r(F.lag("value", 1, 0.0).over(w), 4).alias("prev_value"),
        F.lead("event_type").over(w).alias("next_type"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


# --- global top-k (TakeOrderedAndProject — no full sort at scale) ----------
_TOPK_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
"""


@register("topk_orders", oracle=_TOPK_ORACLE)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# --- set operations --------------------------------------------------------
_INTERSECT_ORACLE = """
SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
INTERSECT
SELECT s_nationkey FROM supplier
"""


@register("set_intersect", oracle=_INTERSECT_ORACLE)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, supp = _t(spark, sf_dir, "customer", "supplier")
    a = cust.filter(F.col("c_acctbal") > 9000).select(
        F.col("c_nationkey").alias("nationkey")
    )
    b = supp.select(F.col("s_nationkey").alias("nationkey"))
    return a.intersect(b)


# customers minus recently-active customers — non-vacuous at every
# scale factor (suppliers cover all nations, so the old nationkey
# difference was empty at sf>=0.1 and checked nothing)
_EXCEPT_ORACLE = """
SELECT c_custkey FROM customer
EXCEPT
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '2000-01-01'
"""


@register("set_except", oracle=_EXCEPT_ORACLE)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders = _t(spark, sf_dir, "customer", "orders")
    a = cust.select("c_custkey")
    b = orders.filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    ).select(F.col("o_custkey").alias("c_custkey"))
    return a.subtract(b)  # EXCEPT (set semantics), not EXCEPT ALL


_UNION_ORACLE = """
SELECT nationkey, count(*) AS n FROM (
    SELECT c_nationkey AS nationkey FROM customer
    UNION ALL
    SELECT s_nationkey FROM supplier
) GROUP BY nationkey
"""


@register("set_union_all", oracle=_UNION_ORACLE)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, supp = _t(spark, sf_dir, "customer", "supplier")
    u = cust.select(F.col("c_nationkey").alias("nationkey")).unionAll(
        supp.select(F.col("s_nationkey").alias("nationkey"))
    )
    return u.groupBy("nationkey").agg(F.count(F.lit(1)).alias("n"))


# --- scalar function packs -------------------------------------------------
_STR_ORACLE = """
SELECT p_partkey,
       upper(p_name) AS up_name,
       lower(p_brand) AS low_brand,
       length(p_name) AS name_len,
       substr(p_name, 1, 5) AS name5,
       reverse(p_type) AS rev_type,
       lpad(p_brand, 12, '*') AS pad_brand,
       replace(p_name, 'a', '@') AS repl_name,
       concat_ws('|', p_brand, p_type) AS brand_type
FROM part
"""


@register("string_funcs", oracle=_STR_ORACLE)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    (part,) = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("up_name"),
        F.lower("p_brand").alias("low_brand"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name5"),
        F.reverse("p_type").alias("rev_type"),
        F.lpad("p_brand", 12, "*").alias("pad_brand"),
        F.replace(F.col("p_name"), F.lit("a"), F.lit("@")).alias("repl_name"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
    )


_DATE_ORACLE = """
SELECT o_orderkey,
       year(o_orderdate) AS o_year,
       month(o_orderdate) AS o_month,
       day(o_orderdate) AS o_day,
       quarter(o_orderdate) AS o_quarter,
       date_trunc('month', o_orderdate) AS month_start,
       datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_epoch
FROM orders
WHERE o_orderkey % 10 = 0
"""


@register("date_funcs", oracle=_DATE_ORACLE)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("o_year"),
        F.month("o_orderdate").cast("long").alias("o_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("o_day"),
        F.quarter("o_orderdate").cast("long").alias("o_quarter"),
        # DuckDB date_trunc('month', TIMESTAMP) yields DATE (date32);
        # Spark's yields TIMESTAMP — cast so both engines emit DATE
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lit("1995-01-01").cast("date"),
        ).cast("long").alias("days_since_epoch"),
    )


_JSON_ORACLE = """
SELECT event_type,
       count(*) AS n,
       sum(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS sum_k,
       round(avg(json_extract_string(props, '$.k')::BIGINT), 4) AS avg_k
FROM events
GROUP BY event_type
"""


@register("json_extract_agg", oracle=_JSON_ORACLE)
def json_extract_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        R.r(F.avg(k), 4).alias("avg_k"),
    )


_ARRAY_ORACLE = """
SELECT vec_id,
       len(embedding) AS dim,
       round(sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))), 4)
           AS l2_norm,
       round(list_sum(list_transform(embedding, x -> x::DOUBLE)) / len(embedding), 4)
           + 0.0 AS mean_val,
       round(list_max(list_transform(embedding, x -> x::DOUBLE)), 4) AS max_val
FROM embeddings
"""


@register("array_funcs", oracle=_ARRAY_ORACLE)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from swat_mapreduce_spark.functions import arrays as A

    (emb,) = _t(spark, sf_dir, "embeddings")
    vec = A.as_double_array(F.col("embedding"))
    return emb.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        R.r(A.l2_norm(vec), 4).alias("l2_norm"),
        R.r(A.asum(vec) / F.size("embedding"), 4).alias("mean_val"),
        R.r(F.array_max(vec), 4).alias("max_val"),
    )
