"""Spark 4.1 SQL-language surfaces, each exercised end-to-end with a
DuckDB value oracle: recursive CTEs (WITH RECURSIVE), SQL-defined
scalar UDFs and table functions (CREATE FUNCTION ... RETURN), string
collations (COLLATE UTF8_LCASE), and SQL scripting
(BEGIN/DECLARE/WHILE).

These close the "can a user of the reference switch and run every
query they run today" gap from the OTHER side: the reference exposes
raw MR hooks; a Spark-first engine exposes the declarative SQL surface
— so the SQL-language features themselves are part of the engine's
API inventory and get the same oracle treatment as operators.

Scale posture: everything here compiles to ordinary Catalyst plans.
The recursive CTE iterates depth-of-hierarchy times (log10 of the key
domain — bounded) with one narrow transform per step; SQL UDF/TVF
bodies are inlined into the plan (no Python boundary, full codegen);
collation is an expression-level comparator; scripting's loop state is
one scalar DECLARE and each iteration aggregates a 31-row
driver-local relation (the kmeans bounded-iteration pattern).

Cross-engine rounding follows CLAUDE.md gotcha 13a: all money flows
through integer cents (round-to-integer on the exact double) or
DECIMAL(30,8) pre-sum casts of 2dp-exact products.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from swat_mapreduce_spark.queries import register
from swat_mapreduce_spark.sources.readers import read_table

# --- recursive CTE: integer-division part hierarchy rollup -------------------
# The testdata has no explicit hierarchy table, so the tree is derived
# deterministically from the key domain: parent(k) = k div 10 (root
# when k < 10) — a fan-out-10 forest over p_partkey, depth
# ceil(log10(max key)). The recursion walks every part to its root
# (rows per step shrink as branches terminate), then one aggregate
# rolls the subtree up: the BOM-explosion / org-chart shape that until
# Spark 4 required driver-side loops (cf. operators/dedup.py's
# label-propagation components, which remain the shape for
# data-dependent-depth graphs).
_RECURSIVE_ORACLE = """
WITH RECURSIVE walk(part, cur, depth) AS (
    SELECT p_partkey, p_partkey, 0 FROM part
    UNION ALL
    SELECT part, cur // 10, depth + 1 FROM walk WHERE cur >= 10
),
terminal AS (
    SELECT part, cur AS root, depth FROM walk WHERE cur < 10
)
SELECT t.root, count(*)::BIGINT AS n_parts, max(t.depth)::BIGINT AS max_depth,
       round(sum(CAST(p.p_retailprice AS DECIMAL(30,8))), 2)::DOUBLE
           AS subtree_price
FROM terminal t JOIN part p ON p.p_partkey = t.part
GROUP BY t.root
"""


@register("recursive_cte_part_rollup", oracle=_RECURSIVE_ORACLE)
def recursive_cte_part_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    read_table(spark, sf_dir, "part").createOrReplaceTempView(
        "swat_sql_part"
    )
    return spark.sql("""
WITH RECURSIVE walk(part, cur, depth) AS (
    SELECT p_partkey, p_partkey, 0 FROM swat_sql_part
    UNION ALL
    SELECT part, cur DIV 10, depth + 1 FROM walk WHERE cur >= 10
),
terminal AS (
    SELECT part, cur AS root, depth FROM walk WHERE cur < 10
)
SELECT t.root, count(*) AS n_parts, max(t.depth) AS max_depth,
       CAST(round(sum(CAST(p.p_retailprice AS DECIMAL(30,8))), 2) AS DOUBLE)
           AS subtree_price
FROM terminal t JOIN swat_sql_part p ON p.p_partkey = t.part
GROUP BY t.root
""")


# --- SQL-defined scalar UDFs (CREATE FUNCTION ... RETURN <expr>) -------------
# Spark 4.1 SQL UDFs are inlined into the Catalyst plan — a named,
# SQL-registered abstraction with ZERO UDF-boundary cost (contrast the
# Python surfaces in python_udf_surfaces.py, which pay the Arrow hop).
# Two functions: net revenue (the TPC-H idiom) and a discount band
# classifier; the rollup groups by (returnflag, band) and money-sums
# the function output through the DECIMAL(30,8) pre-sum cast.
_SQL_UDF_ORACLE = """
SELECT l_returnflag,
       CASE WHEN l_discount >= 0.05 THEN 'deep'
            WHEN l_discount > 0.0 THEN 'light'
            ELSE 'none' END AS band,
       count(*)::BIGINT AS n_rows,
       round(sum(CAST(l_extendedprice * (1.0 - l_discount)
                      AS DECIMAL(30,8))), 2)::DOUBLE AS net_revenue
FROM lineitem
GROUP BY 1, 2
"""


@register("sql_udf_margin_rollup", oracle=_SQL_UDF_ORACLE)
def sql_udf_margin_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.sql("""
CREATE OR REPLACE TEMPORARY FUNCTION swat_net_rev(price DOUBLE, disc DOUBLE)
RETURNS DOUBLE RETURN price * (1.0 - disc)
""")
    spark.sql("""
CREATE OR REPLACE TEMPORARY FUNCTION swat_disc_band(disc DOUBLE)
RETURNS STRING RETURN CASE WHEN disc >= 0.05 THEN 'deep'
                           WHEN disc > 0.0 THEN 'light'
                           ELSE 'none' END
""")
    read_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "swat_sql_lineitem"
    )
    return spark.sql("""
SELECT l_returnflag,
       swat_disc_band(l_discount) AS band,
       count(*) AS n_rows,
       CAST(round(sum(CAST(swat_net_rev(l_extendedprice, l_discount)
                           AS DECIMAL(30,8))), 2) AS DOUBLE) AS net_revenue
FROM swat_sql_lineitem
GROUP BY 1, 2
""")


# --- SQL table function + LATERAL: instalment proration ----------------------
# A SQL-defined TABLE function correlated per input row via LATERAL:
# split each order's total into 4 instalments in EXACT INTEGER CENTS
# (first n-1 get cents div n, the last absorbs the remainder — the
# classic penny-exact proration), then prove conservation by money-
# summing the instalments per priority. All arithmetic is
# round-to-integer on the exact double then integer division — zero
# cross-engine ambiguity (gotcha 13a).
_SQL_TVF_ORACLE = """
WITH inst AS (
    SELECT o.o_orderpriority,
           CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents, g.i
    FROM orders o, generate_series(1, 4) AS g(i)
)
SELECT o_orderpriority AS priority,
       count(*)::BIGINT AS n_instalments,
       round(sum(CAST(
           (CASE WHEN i < 4 THEN cents // 4
                 ELSE cents - 3 * (cents // 4) END) / 100.0
           AS DECIMAL(30,8))), 2)::DOUBLE AS total_paid,
       sum(CASE WHEN i = 4
                AND cents - 3 * (cents // 4) <> cents // 4
                THEN 1 ELSE 0 END)::BIGINT AS n_remainder_pennies
FROM inst
GROUP BY 1
"""


@register("sql_tvf_instalments", oracle=_SQL_TVF_ORACLE)
def sql_tvf_instalments(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.sql("""
CREATE OR REPLACE TEMPORARY FUNCTION swat_instalments(total DOUBLE, n INT)
RETURNS TABLE(inst_no INT, amount DOUBLE, is_remainder BOOLEAN)
RETURN
    SELECT i AS inst_no,
           CAST(CASE WHEN i < n THEN CAST(round(total * 100) AS BIGINT) DIV n
                     ELSE CAST(round(total * 100) AS BIGINT)
                          - (n - 1) * (CAST(round(total * 100) AS BIGINT) DIV n)
                END AS DOUBLE) / 100.0 AS amount,
           i = n AND CAST(round(total * 100) AS BIGINT) % n <> 0
               AS is_remainder
    FROM (SELECT explode(sequence(1, n)) AS i)
""")
    read_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "swat_sql_orders"
    )
    return spark.sql("""
SELECT o.o_orderpriority AS priority,
       count(*) AS n_instalments,
       CAST(round(sum(CAST(t.amount AS DECIMAL(30,8))), 2) AS DOUBLE)
           AS total_paid,
       sum(CASE WHEN t.is_remainder THEN 1 ELSE 0 END) AS n_remainder_pennies
FROM swat_sql_orders o, LATERAL swat_instalments(o.o_totalprice, 4) t
GROUP BY 1
""")


# --- collation-aware grouping (COLLATE UTF8_LCASE) ----------------------------
# Spark 4 string collations make case-insensitivity a TYPE property
# instead of a lower() rewrite — comparators, GROUP BY, and joins all
# honor it engine-side. The testdata is all-lowercase, so a
# deterministic case perturbation (even event_id → UPPER) plants the
# mixed-case reality; n_upper > 0 proves the groups genuinely merged
# mixed-case keys (CLAUDE.md gotcha 5 — a collation over already-
# uniform case would pass vacuously). Oracle mirrors with lower().
_COLLATED_ORACLE = """
SELECT lower(CASE WHEN event_id % 2 = 0 THEN upper(event_type)
                  ELSE event_type END) AS event_type,
       count(*)::BIGINT AS n,
       sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_upper
FROM events
GROUP BY 1
"""


@register("collated_event_type_stats", oracle=_COLLATED_ORACLE)
def collated_event_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("event_id") % 2 == 0, F.upper("event_type"))
        .otherwise(F.col("event_type"))
        .alias("et"),
    )
    ev.createOrReplaceTempView("swat_sql_events_cased")
    return spark.sql("""
SELECT lower(et COLLATE UTF8_LCASE) AS event_type,
       count(*) AS n,
       sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS n_upper
FROM swat_sql_events_cased
GROUP BY et COLLATE UTF8_LCASE
""")


# --- SQL scripting: iterative threshold search (BEGIN/DECLARE/WHILE) ---------
# Spark 4.1 SQL scripting runs procedural control flow engine-side:
# find the smallest power-of-2 daily-event threshold under which
# fewer than half the days are "busy", then emit the per-day
# classification. Loop state is ONE scalar; each iteration aggregates
# the 31-row day table, which is materialized to a driver-local
# relation first (bounded by the calendar — the kmeans iterative
# pattern, gotcha-free at any event volume). The oracle computes the
# same threshold closed-form over a powers-of-2 series; the loop
# predicate uses integer arithmetic only (2*busy < total), so both
# engines agree exactly.
_SCRIPTING_ORACLE = """
WITH daily AS (
    SELECT ts::DATE AS day, count(*) AS n_events FROM events GROUP BY 1
),
tot AS (SELECT count(*) AS n_days FROM daily),
powers AS (
    SELECT power(2, g.k)::BIGINT AS t
    FROM generate_series(0, 40) AS g(k)
),
thr AS (
    SELECT min(t) AS threshold FROM powers, tot
    WHERE 2 * (SELECT count(*) FROM daily WHERE n_events >= powers.t)
          < tot.n_days
)
SELECT d.day, d.n_events::BIGINT AS n_events,
       thr.threshold::BIGINT AS threshold,
       d.n_events >= thr.threshold AS busy
FROM daily d, thr
"""


@register("sql_scripting_threshold", oracle=_SCRIPTING_ORACLE)
def sql_scripting_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        read_table(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    # calendar-bounded: materialize the day table driver-side so each
    # WHILE-iteration aggregate runs on a local relation, not a scan
    rows = daily.collect()
    spark.createDataFrame(rows, daily.schema).createOrReplaceTempView(
        "swat_sql_daily"
    )
    return spark.sql("""
BEGIN
    DECLARE t BIGINT DEFAULT 1;
    WHILE 2 * (SELECT count(*) FROM swat_sql_daily WHERE n_events >= t)
          >= (SELECT count(*) FROM swat_sql_daily) DO
        SET t = t * 2;
    END WHILE;
    SELECT day, n_events, t AS threshold, n_events >= t AS busy
    FROM swat_sql_daily;
END
""")
