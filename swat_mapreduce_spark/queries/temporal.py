"""Temporal operators: as-of join, range join, sessionization.
DuckDB has native ASOF JOIN — a perfect independent oracle for our
union+window Spark formulation."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from swat_mapreduce_spark.functions import rounding as R

from swat_mapreduce_spark.operators.asof import asof_join, sessionize
from swat_mapreduce_spark.queries import register
from swat_mapreduce_spark.sources.readers import read_table


# --- as-of join: latest prior click for each purchase ----------------------
_ASOF_ORACLE = """
WITH purchases AS (
    SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
clicks AS (
    SELECT user_id, ts FROM events WHERE event_type = 'click'
)
SELECT p.event_id, p.user_id,
       c.ts AS asof_ts,
       datediff('microsecond', c.ts, p.ts) AS gap_us
FROM purchases p
ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
"""


@register("asof_join_click_purchase", oracle=_ASOF_ORACLE)
def asof_join_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts"
    )
    joined = asof_join(purchases, clicks, on="user_id")
    return joined.select(
        "event_id",
        "user_id",
        "asof_ts",
        (F.unix_micros("ts") - F.unix_micros("asof_ts")).alias("gap_us"),
    )


# --- range join: orders into price bands (broadcast nested-loop) -----------
_RANGE_ORACLE = """
WITH bands AS (
    SELECT g.b AS band_id,
           g.b * 100000.0 AS lo,
           (g.b + 1) * 100000.0 AS hi
    FROM generate_series(0, 5) AS g(b)
)
SELECT b.band_id, count(o_orderkey) AS n_orders,
       round(avg(o_totalprice), 4) AS avg_price
FROM bands b
LEFT JOIN orders ON o_totalprice >= b.lo AND o_totalprice < b.hi
GROUP BY b.band_id
"""


@register("range_join_price_bands", oracle=_RANGE_ORACLE)
def range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    bands = spark.range(0, 6).select(
        F.col("id").alias("band_id"),
        (F.col("id") * 100000.0).alias("lo"),
        ((F.col("id") + 1) * 100000.0).alias("hi"),
    )
    # tiny band dim broadcast → BroadcastNestedLoopJoin, single pass
    # over the fact side; at 100 TB this is the only sane range-join plan.
    return (
        F.broadcast(bands)
        .join(
            orders,
            (F.col("o_totalprice") >= F.col("lo"))
            & (F.col("o_totalprice") < F.col("hi")),
            "left",
        )
        .groupBy("band_id")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            R.r(F.avg("o_totalprice"), 4).alias("avg_price"),
        )
    )


# --- gap sessionization (batch stand-in for session windows) ---------------
_SESSION_ORACLE = """
WITH e AS (
    SELECT user_id, ts, event_id,
           CASE WHEN lag(ts) OVER w IS NULL
                     OR datediff('microsecond', lag(ts) OVER w, ts) >= 1800000000
                THEN 1 ELSE 0 END AS is_new
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
    SELECT user_id, ts, event_id,
           sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                             )::BIGINT AS session_num
    FROM e
)
SELECT user_id, session_num, count(*) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end
FROM s
GROUP BY user_id, session_num
"""


@register("sessionize_events", oracle=_SESSION_ORACLE)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    sess = sessionize(
        events, key="user_id", ts="ts", gap_seconds=1800,
        order_cols=["ts", "event_id"],
    )
    return sess.groupBy("user_id", "session_num").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


# --- hypertable-style continuous-aggregate rollup ------------------------
# One pass, three time granularities via grouping sets over
# date_trunc buckets — the batch form of a timeseries DB's
# hour/day/month continuous aggregates. Map-side partial aggregation
# means the fact table is read once; each grouping set shares the
# shuffle.
_TIMEBUCKET_ORACLE = """
WITH base AS (
    SELECT date_trunc('hour', ts) AS h, date_trunc('day', ts) AS d,
           date_trunc('month', ts) AS m, event_type, value
    FROM events
)
SELECT h AS bucket, 'hour' AS granularity, event_type,
       count(*) AS n, round(sum(value), 2) AS sum_value
FROM base GROUP BY h, event_type
UNION ALL
SELECT d, 'day', event_type, count(*), round(sum(value), 2)
FROM base GROUP BY d, event_type
UNION ALL
SELECT m, 'month', event_type, count(*), round(sum(value), 2)
FROM base GROUP BY m, event_type
"""


@register("time_bucket_rollup", oracle=_TIMEBUCKET_ORACLE)
def time_bucket_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity rollup in ONE scan + ONE shuffle: grouping
    sets over (hour, day, month) truncations, then the active bucket
    is selected per set — Spark plans grouping sets as a single
    Expand + hash aggregate, cheaper than 3 unioned scans at scale."""
    from swat_mapreduce_spark.sources.readers import read_table

    events = read_table(spark, sf_dir, "events")
    base = events.select(
        F.date_trunc("hour", "ts").alias("h"),
        F.date_trunc("day", "ts").alias("d"),
        F.date_trunc("month", "ts").alias("m"),
        "event_type",
        "value",
    )
    base.createOrReplaceTempView("_tb_base")
    rolled = spark.sql(
        """
        SELECT h, d, m, event_type,
               count(*) AS n,
               round(sum(value) * 100.0) / 100.0 AS sum_value
        FROM _tb_base
        GROUP BY GROUPING SETS ((h, event_type), (d, event_type),
                                (m, event_type))
        """
    )
    bucket = F.coalesce("h", "d", "m")
    gran = (
        F.when(F.col("h").isNotNull(), "hour")
        .when(F.col("d").isNotNull(), "day")
        .otherwise("month")
    )
    return rolled.select(
        bucket.alias("bucket"),
        gran.alias("granularity"),
        "event_type",
        "n",
        "sum_value",
    )


# --- date spine + gap fill (calendar left join) --------------------------
# The reporting staple: a generated daily spine left-joined to actual
# per-day aggregates, absent days filled with zero. sequence() +
# explode generates the spine JVM-side — no driver loop.
_DATE_SPINE_ORACLE = """
WITH spine AS (
    SELECT unnest(generate_series(DATE '2001-06-01', DATE '2001-07-31',
                                  INTERVAL 1 DAY))::DATE AS day
),
daily AS (
    SELECT o_orderdate::DATE AS day, count(*) AS n,
           round(sum(CAST(o_totalprice AS DECIMAL(30,8))), 2)::DOUBLE
               AS revenue
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '2001-06-01'
      AND o_orderdate < TIMESTAMP '2001-08-01'
    GROUP BY day
)
SELECT s.day, coalesce(d.n, 0) AS n, coalesce(d.revenue, 0.0) AS revenue
FROM spine s LEFT JOIN daily d ON d.day = s.day
"""


@register("date_spine_gap_fill", oracle=_DATE_SPINE_ORACLE)
def date_spine_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from swat_mapreduce_spark.sources.readers import read_table

    orders = read_table(spark, sf_dir, "orders")
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2001-06-01").cast("date"),
                F.lit("2001-07-31").cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day")
    )
    daily = (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("2001-06-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("2001-08-01").cast("timestamp"))
        )
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            R.money_sum("o_totalprice").alias("revenue"),
        )
    )
    return (
        spine.join(daily, "day", "left")
        .select(
            "day",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
        )
    )


# --- SCD2-style validity intervals ----------------------------------------
# Events → slowly-changing-dimension form: each user event is valid
# from its own timestamp until the user's next event (NULL = current).
# The standard CDC→dimension-snapshot derivation; one window shuffle
# keyed by user_id.
_SCD2_ORACLE = """
SELECT user_id, event_id, event_type,
       ts AS valid_from,
       lead(ts) OVER w AS valid_to,
       (lead(ts) OVER w IS NULL) AS is_current
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


@register("scd2_user_intervals", oracle=_SCD2_ORACLE)
def scd2_user_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return events.select(
        "user_id",
        "event_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


# --- ordered conversion funnel ---------------------------------------------
# signup -> click -> purchase, each step's FIRST occurrence must come
# strictly after the previous step's first occurrence. One aggregation
# (per-user min timestamps), then a tiny conditional rollup — the
# standard product-analytics funnel, no joins, one shuffle.

_FUNNEL_ORACLE = """
WITH firsts AS (
    SELECT user_id,
           min(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
           min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
           min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
    FROM events GROUP BY user_id
),
flags AS (
    SELECT user_id,
           (t_signup IS NOT NULL) AS s1,
           (t_signup IS NOT NULL AND t_click > t_signup) AS s2,
           (t_signup IS NOT NULL AND t_click > t_signup
            AND t_purchase > t_click) AS s3
    FROM firsts
)
SELECT count(*) FILTER (WHERE s1) AS n_signup,
       count(*) FILTER (WHERE s2) AS n_then_click,
       count(*) FILTER (WHERE s3) AS n_then_purchase
FROM flags
"""


@register("funnel_signup_click_purchase", oracle=_FUNNEL_ORACLE)
def funnel_signup_click_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    first_of = lambda t: F.min(  # noqa: E731 - tiny local alias
        F.when(F.col("event_type") == t, F.col("ts"))
    )
    firsts = ev.groupBy("user_id").agg(
        first_of("signup").alias("t_signup"),
        first_of("click").alias("t_click"),
        first_of("purchase").alias("t_purchase"),
    )
    s1 = F.col("t_signup").isNotNull()
    s2 = s1 & (F.col("t_click") > F.col("t_signup"))
    s3 = s2 & (F.col("t_purchase") > F.col("t_click"))
    count_if = lambda c: F.sum(c.cast("long"))  # noqa: E731
    return firsts.agg(
        count_if(s1).alias("n_signup"),
        count_if(s2).alias("n_then_click"),
        count_if(s3).alias("n_then_purchase"),
    )


# --- cohort retention ------------------------------------------------------
# Users grouped by first-seen WEEK; for each later week, how many of
# the cohort were active. Two aggregations (first-seen, then cohort x
# week distincts) — the churn/retention staple. Week buckets keep the
# output dense and the group count bounded.

_COHORT_ORACLE = """
WITH first_seen AS (
    -- ::TIMESTAMP: DuckDB's week-trunc yields DATE, Spark's yields
    -- TIMESTAMP — the type-aware hash would split on it
    SELECT user_id, date_trunc('week', min(ts))::TIMESTAMP AS cohort_week
    FROM events GROUP BY user_id
),
activity AS (
    SELECT DISTINCT e.user_id, f.cohort_week,
           date_trunc('week', e.ts)::TIMESTAMP AS active_week
    FROM events e JOIN first_seen f ON e.user_id = f.user_id
)
SELECT cohort_week, active_week,
       count(DISTINCT user_id) AS n_active
FROM activity
GROUP BY cohort_week, active_week
"""


@register("cohort_retention_weekly", oracle=_COHORT_ORACLE)
def cohort_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        ev.join(first_seen, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.date_trunc("week", "ts").alias("active_week"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "active_week").agg(
        F.count_distinct("user_id").alias("n_active")
    )


# --- deterministic A/B experiment analysis ---------------------------------
# Users hash into arms (md5 parity — reproducible assignment, the
# no-RNG rule every experiment pipeline needs for reanalysis); metric
# = per-user purchase rate, compared across arms. Exact integer
# counts; the only doubles are final ratios rounded with the shared
# formula.

_AB_ORACLE = """
WITH assign AS (
    SELECT user_id,
           CASE WHEN ('0x' || substr(md5(user_id || ':' || 'exp1'), 1, 8)
                )::BIGINT % 2 = 0 THEN 'A' ELSE 'B' END AS arm
    FROM (SELECT DISTINCT user_id FROM events)
),
m AS (
    SELECT a.arm, e.user_id,
           count(*) AS n_events,
           count(*) FILTER (WHERE e.event_type = 'purchase') AS n_purch
    FROM events e JOIN assign a USING (user_id)
    GROUP BY a.arm, e.user_id
)
SELECT arm,
       count(*) AS n_users,
       sum(n_events)::BIGINT AS n_events,
       sum(n_purch)::BIGINT AS n_purchases,
       round(sum(n_purch)::DOUBLE / sum(n_events), 6) AS purchase_rate
FROM m GROUP BY arm
"""


@register("ab_test_arms", oracle=_AB_ORACLE)
def ab_test_arms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from swat_mapreduce_spark.functions import hashing as H
    from swat_mapreduce_spark.functions import rounding as R

    ev = read_table(spark, sf_dir, "events")
    arm = F.when(
        H.hash_uint(F.col("user_id"), "exp1", 8) % 2 == 0, F.lit("A")
    ).otherwise(F.lit("B"))
    per_user = (
        ev.select("user_id", "event_type")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                (F.col("event_type") == "purchase").cast("long")
            ).alias("n_purch"),
        )
        .withColumn("arm", arm)
    )
    return per_user.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("n_events").alias("n_events"),
        F.sum("n_purch").alias("n_purchases"),
        R.r(
            F.sum("n_purch").cast("double") / F.sum("n_events"), 6
        ).alias("purchase_rate"),
    )


# --- RFM customer segmentation ---------------------------------------------
# Recency / frequency / monetary quartiles per customer from the order
# fact — the classic segmentation. One per-customer aggregate, then
# DISTRIBUTED ntile for each metric (operators/ranking.py: range-
# bucketed rank + the exact ntile size formula — a bare global ntile
# window would funnel every customer through one task). Deterministic
# tie-breaks by customer key keep assignment identical across engines.

_RFM_ORACLE = """
WITH m AS (
    SELECT o_custkey,
           max(o_orderdate) AS last_order,
           count(*) AS frequency,
           sum(CAST(o_totalprice AS DECIMAL(30,8))) AS monetary
    FROM orders GROUP BY o_custkey
),
t AS (
    SELECT o_custkey,
           ntile(4) OVER (ORDER BY last_order DESC, o_custkey) AS r_q,
           ntile(4) OVER (ORDER BY frequency DESC, o_custkey) AS f_q,
           ntile(4) OVER (ORDER BY monetary DESC, o_custkey) AS m_q
    FROM m
)
SELECT r_q, f_q, m_q, count(*) AS n_customers
FROM t GROUP BY r_q, f_q, m_q
"""


@register("rfm_segmentation", oracle=_RFM_ORACLE)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from swat_mapreduce_spark.operators.ranking import distributed_ntile_desc

    from pyspark import StorageLevel

    orders = read_table(spark, sf_dir, "orders")
    # persist the per-customer aggregate AND each tile stage (r13,
    # guide §5): every distributed_ntile_desc issues its own eager
    # actions (bucket-count collect + count()), so the unpersisted
    # chain replayed the orders fact scan + aggregation once per
    # action (~7 scans by the last tile); persisted, the fact is
    # scanned once and each stage's actions read the previous stage's
    # materialized rows (interleaved same-session A/B at sf0.1:
    # warmed 3.50-3.87 s vs 3.83-5.71 s shipped, identical hashes).
    # The bench clears cache between queries (the isotonic precedent).
    m = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(30,8)")).alias("monetary"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    key = F.col("o_custkey")
    # NTZ timestamps don't cast to double; epoch-seconds projection
    # keeps the bucket binning monotone
    last_num = F.col("last_order").cast("timestamp").cast("double")
    t = distributed_ntile_desc(
        m, F.col("last_order"), key, 4, out="r_q", num=last_num
    ).persist(StorageLevel.MEMORY_AND_DISK)
    t = distributed_ntile_desc(
        t, F.col("frequency"), key, 4, out="f_q"
    ).persist(StorageLevel.MEMORY_AND_DISK)
    t = distributed_ntile_desc(t, F.col("monetary"), key, 4, out="m_q")
    return t.groupBy("r_q", "f_q", "m_q").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


# --- day-of-week seasonality index -----------------------------------------
# Per event type: each weekday's share of activity vs a uniform week —
# the seasonality profile behind capacity planning and anomaly
# baselines. Exact integer counts; the index is a ratio of counts
# rounded with the shared formula. isodow keeps Mon=1..Sun=7 in both
# engines.

_SEASONAL_ORACLE = """
WITH c AS (
    SELECT event_type, isodow(ts) AS dow, count(*) AS n
    FROM events GROUP BY event_type, dow
),
tot AS (
    SELECT event_type, sum(n) AS total FROM c GROUP BY event_type
)
SELECT c.event_type, c.dow::BIGINT AS dow, c.n AS n,
       round(7.0 * c.n / t.total, 4) AS seasonality_index
FROM c JOIN tot t ON c.event_type = t.event_type
"""


@register("seasonality_dow_index", oracle=_SEASONAL_ORACLE)
def seasonality_dow_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    # Spark dayofweek: Sun=1..Sat=7; convert to ISO Mon=1..Sun=7
    isodow = ((F.dayofweek("ts") + 5) % 7) + 1
    c = ev.groupBy(
        "event_type", isodow.cast("long").alias("dow")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type")
    return c.select(
        "event_type",
        "dow",
        "n",
        R.r(7.0 * F.col("n") / F.sum("n").over(w), 4).alias(
            "seasonality_index"
        ),
    )


# --- point-in-time (time-travel) read over SCD2 intervals ------------------
# The read side of the SCD2 derivation above: reconstruct every user's
# state AS OF a fixed instant by selecting the interval containing it
# — the lakehouse "time travel by validity interval" query. Filter
# pushes to both interval bounds; one window shuffle to build the
# intervals, then a narrow filter (no join).

_ASOF_STATE_TS = "2024-01-15 00:00:00"

_ASOF_STATE_ORACLE = f"""
WITH iv AS (
    SELECT user_id, event_id, event_type,
           ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to
    FROM events
)
SELECT user_id, event_id, event_type, valid_from
FROM iv
WHERE valid_from <= TIMESTAMP '{_ASOF_STATE_TS}'
  AND (valid_to IS NULL OR valid_to > TIMESTAMP '{_ASOF_STATE_TS}')
"""


@register("scd2_asof_state", oracle=_ASOF_STATE_ORACLE)
def scd2_asof_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    at = F.lit(_ASOF_STATE_TS).cast("timestamp")
    iv = events.select(
        "user_id",
        "event_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
    )
    return iv.filter(
        (F.col("valid_from") <= at)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > at))
    ).select("user_id", "event_id", "event_type", "valid_from")


# --- time-series anomaly flags (daily-count z-scores) ----------------------
# Ops-monitoring staple: per event type, flag days whose event count
# deviates > 2 sigma from that type's daily mean. Two tiny aggregates
# (day-counts, then per-type moments over ~30 day rows) + a broadcast
# join back — the fact table is read once. Counts are exact ints;
# mean/std are computed from them identically in both engines.

_ANOMALY_ORACLE = """
WITH daily AS (
    SELECT event_type, date_trunc('day', ts)::TIMESTAMP AS day,
           count(*) AS n
    FROM events GROUP BY event_type, day
),
stats AS (
    SELECT event_type, avg(n) AS mu, stddev_samp(n) AS sigma
    FROM daily GROUP BY event_type
)
SELECT d.event_type, d.day, d.n,
       round((d.n - s.mu) / s.sigma, 4) AS zscore,
       (abs((d.n - s.mu) / s.sigma) > 2.0) AS is_anomaly
FROM daily d JOIN stats s ON d.event_type = s.event_type
"""


@register("anomaly_daily_zscore", oracle=_ANOMALY_ORACLE)
def anomaly_daily_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("day", "ts").cast("timestamp").alias("day"),
    ).agg(F.count(F.lit(1)).alias("n"))
    stats = daily.groupBy("event_type").agg(
        F.avg("n").alias("mu"), F.stddev_samp("n").alias("sigma")
    )
    joined = daily.join(F.broadcast(stats), "event_type")
    z = (F.col("n") - F.col("mu")) / F.col("sigma")
    return joined.select(
        "event_type",
        "day",
        "n",
        R.r(z, 4).alias("zscore"),
        (F.abs(z) > 2.0).alias("is_anomaly"),
    )


# --- last-touch attribution ------------------------------------------------
# Marketing-attribution shape: each purchase is credited to the user's
# most recent preceding click (carry-forward via last_value IGNORE
# NULLS over the per-user event stream), the click's props.k hashes to
# a channel, and purchase value rolls up per channel. Purchases with
# no prior click land in 'organic'.
# Plan shape: ONE shuffle on user_id for the window (per-user
# partitions are bounded by a user's event history), then a tiny
# per-channel regroup. The same carry-forward works under streaming
# watermarks; this is the batch twin.
_ATTRIB_ORACLE = """
WITH ev AS (
    SELECT user_id, ts, event_id, event_type, value,
           CAST(json_extract_string(props, '$.k') AS INT) AS k
    FROM events
),
flow AS (
    SELECT user_id, ts, event_id, event_type, value,
           last_value(CASE WHEN event_type = 'click' THEN k END
                      IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS last_click_k
    FROM ev
)
SELECT coalesce('ch_' || (last_click_k % 4), 'organic') AS channel,
       count(*)::BIGINT AS n_purchases,
       round(sum(CAST(value AS DECIMAL(30,8))), 2)::DOUBLE
           AS attributed_value
FROM flow
WHERE event_type = 'purchase'
GROUP BY 1
"""


@register("attribution_last_touch", oracle=_ATTRIB_ORACLE)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from swat_mapreduce_spark.functions import rounding as R

    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        "value",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flow = ev.withColumn(
        "last_click_k",
        F.last(
            F.when(F.col("event_type") == "click", F.col("k")),
            ignorenulls=True,
        ).over(w),
    )
    return (
        flow.filter(F.col("event_type") == "purchase")
        .groupBy(
            F.coalesce(
                F.concat(F.lit("ch_"), F.col("last_click_k") % 4),
                F.lit("organic"),
            ).alias("channel")
        )
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            R.money_sum(F.col("value")).alias("attributed_value"),
        )
    )


# --- resample + linear interpolation ---------------------------------------
# Time-series regularization: resample each user's purchase stream to
# an hourly grid and LINEARLY interpolate value between surrounding
# observations (date_spine_gap_fill zero-fills; this computes the
# between-points line — the feature-engineering primitive for
# irregular telemetry). Grid rows come from a per-user hour spine
# (sequence between that user's min/max hour — narrow 1→N, bounded by
# the user's own span); the bracketing observations arrive via
# last/first IGNORE NULLS windows over the merged grid+events stream.
# ONE shuffle on user_id; per-user partitions bound the window state.
_RESAMPLE_ORACLE = """
WITH p AS (
    SELECT user_id, ts, value FROM events
    WHERE event_type = 'purchase' AND user_id % 100 = 0
),
spine AS (
    SELECT user_id,
           unnest(generate_series(date_trunc('hour', min(ts)),
                                  date_trunc('hour', max(ts)),
                                  INTERVAL 1 HOUR)) AS grid_ts
    FROM p GROUP BY user_id
),
merged AS (
    SELECT user_id, grid_ts, NULL::DOUBLE AS v, NULL::TIMESTAMP AS ots,
           0 AS is_obs
    FROM spine
    UNION ALL
    SELECT user_id, ts AS grid_ts, value AS v, ts AS ots, 1 AS is_obs
    FROM p
),
br AS (
    SELECT user_id, grid_ts, is_obs, v,
           last_value(v IGNORE NULLS) OVER w AS prev_v,
           last_value(ots IGNORE NULLS) OVER w AS prev_ts,
           first_value(v IGNORE NULLS) OVER w2 AS next_v,
           first_value(ots IGNORE NULLS) OVER w2 AS next_ts
    FROM merged
    WINDOW w AS (PARTITION BY user_id ORDER BY grid_ts, is_obs DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           w2 AS (PARTITION BY user_id ORDER BY grid_ts, is_obs DESC
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, grid_ts,
       round((CASE
           WHEN prev_v IS NULL THEN next_v
           WHEN next_v IS NULL THEN prev_v
           WHEN next_ts = prev_ts THEN prev_v
           ELSE prev_v + (next_v - prev_v)
                * (epoch_us(grid_ts) - epoch_us(prev_ts))
                / (epoch_us(next_ts) - epoch_us(prev_ts))
       END) * 10000) / 10000 + 0.0 AS v_interp
FROM br
WHERE is_obs = 0
"""


@register("resample_interpolate_linear", oracle=_RESAMPLE_ORACLE)
def resample_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        read_table(spark, sf_dir, "events")
        .filter(
            (F.col("event_type") == "purchase")
            & (F.col("user_id") % 100 == 0)
        )
        .select("user_id", "ts", "value")
    )
    spine = p.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.date_trunc("hour", F.max("ts")).alias("t1"),
    ).select(
        "user_id",
        F.explode(
            F.sequence("t0", "t1", F.expr("INTERVAL 1 HOUR"))
        ).alias("grid_ts"),
    )
    grid = spine.select(
        "user_id",
        "grid_ts",
        F.lit(None).cast("double").alias("v"),
        F.lit(None).cast("timestamp").alias("ots"),
        F.lit(0).alias("is_obs"),
    )
    obs = p.select(
        "user_id",
        F.col("ts").alias("grid_ts"),
        F.col("value").alias("v"),
        F.col("ts").alias("ots"),
        F.lit(1).alias("is_obs"),
    )
    merged = grid.unionByName(obs)
    wb = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("grid_ts"), F.desc("is_obs"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("grid_ts"), F.desc("is_obs"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    br = merged.select(
        "user_id",
        "grid_ts",
        "is_obs",
        F.last("v", ignorenulls=True).over(wb).alias("prev_v"),
        F.last("ots", ignorenulls=True).over(wb).alias("prev_ts"),
        F.first("v", ignorenulls=True).over(wf).alias("next_v"),
        F.first("ots", ignorenulls=True).over(wf).alias("next_ts"),
    )
    frac = (
        (F.unix_micros("grid_ts") - F.unix_micros("prev_ts")).cast("double")
        / (F.unix_micros("next_ts") - F.unix_micros("prev_ts"))
    )
    interp = (
        F.when(F.col("prev_v").isNull(), F.col("next_v"))
        .when(F.col("next_v").isNull(), F.col("prev_v"))
        .when(F.col("next_ts") == F.col("prev_ts"), F.col("prev_v"))
        .otherwise(
            F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * frac
        )
    )
    return br.filter(F.col("is_obs") == 0).select(
        "user_id",
        "grid_ts",
        (F.round(interp * 10000.0) / 10000.0 + 0.0).alias("v_interp"),
    )


# --- gaps and islands ------------------------------------------------------
# The canonical interval-coalescing pattern: per user, consecutive
# ACTIVE DAYS merge into islands via the date-minus-dense-row-number
# trick (consecutive days share one anchor date). One shuffle on
# user_id; the per-user window is bounded by that user's history.
# Output: per-user island count, longest streak, total active days.
_ISLANDS_ORACLE = """
WITH days AS (
    SELECT DISTINCT user_id, date_trunc('day', ts)::DATE AS d
    FROM events
),
anch AS (
    SELECT user_id, d,
           d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                    AS INTEGER) AS anchor
    FROM days
),
isl AS (
    SELECT user_id, anchor, count(*) AS len
    FROM anch GROUP BY user_id, anchor
)
SELECT user_id,
       count(*)::BIGINT AS n_islands,
       max(len)::BIGINT AS longest_streak,
       sum(len)::BIGINT AS active_days
FROM isl
GROUP BY user_id
"""


@register("gaps_and_islands", oracle=_ISLANDS_ORACLE)
def gaps_and_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.to_date(F.date_trunc("day", F.col("ts"))).alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    anch = days.withColumn(
        "anchor",
        F.date_sub(F.col("d"), F.row_number().over(w)),
    )
    isl = anch.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).alias("len")
    )
    return isl.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.max("len").alias("longest_streak"),
        F.sum("len").alias("active_days"),
    )


# --- user-journey transition matrix ----------------------------------------
# First-order Markov view of the event stream: per user, each event's
# successor via lead(), then the (from, to) transition counts and
# row-normalized probabilities — the journey/Sankey input. One
# user_id shuffle for the window, one tiny regroup on the bounded
# (|event_types|²) transition space.
_TRANSITION_ORACLE = """
WITH seq AS (
    SELECT user_id, event_type AS from_type,
           lead(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS to_type
    FROM events
),
cnt AS (
    SELECT from_type, to_type, count(*) AS n
    FROM seq WHERE to_type IS NOT NULL
    GROUP BY from_type, to_type
),
tot AS (SELECT from_type, sum(n) AS t FROM cnt GROUP BY from_type)
SELECT c.from_type, c.to_type, c.n::BIGINT AS n,
       round(c.n * 10000.0 / t.t) / 10000 + 0.0 AS p
FROM cnt c JOIN tot t USING (from_type)
"""


@register("journey_transition_matrix", oracle=_TRANSITION_ORACLE)
def journey_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    cnt = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = cnt.groupBy("from_type").agg(F.sum("n").alias("t"))
    return cnt.join(F.broadcast(tot), "from_type").select(
        "from_type",
        "to_type",
        "n",
        (F.round(F.col("n") * 10000.0 / F.col("t")) / 10000.0 + 0.0).alias(
            "p"
        ),
    )


# --- in-session conversion -------------------------------------------------
# Session-scoped funnel: within each 30-min gap session, did a click
# happen and did a purchase follow it (strictly later ts, same
# session)? Aggregated into the session-quality report: session
# counts, click/purchase presence, click→purchase conversions, and
# the conversion rate among sessions that clicked. Reuses the
# sessionize operator; the per-session min-click-ts / max-purchase-ts
# comparison avoids any pair join inside the session.
_SESSCONV_ORACLE = """
WITH e AS (
    SELECT user_id, ts, event_id, event_type,
           CASE WHEN lag(ts) OVER w IS NULL
                     OR datediff('microsecond', lag(ts) OVER w, ts)
                        >= 1800000000
                THEN 1 ELSE 0 END AS is_new
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
    SELECT user_id, ts, event_type,
           sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW)::BIGINT AS session_num
    FROM e
),
per AS (
    SELECT user_id, session_num,
           min(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
           max(CASE WHEN event_type = 'purchase' THEN ts END)
               AS last_purchase
    FROM s
    GROUP BY user_id, session_num
)
SELECT count(*)::BIGINT AS n_sessions,
       count(first_click)::BIGINT AS n_with_click,
       count(last_purchase)::BIGINT AS n_with_purchase,
       count(*) FILTER (last_purchase > first_click)::BIGINT
           AS n_converted,
       round(count(*) FILTER (last_purchase > first_click) * 10000.0
             / count(first_click)) / 10000 + 0.0 AS conv_rate
FROM per
"""


@register("session_conversion_rate", oracle=_SESSCONV_ORACLE)
def session_conversion_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    sess = sessionize(
        events, key="user_id", ts="ts", gap_seconds=1800,
        order_cols=["ts", "event_id"],
    )
    per = sess.groupBy("user_id", "session_num").agg(
        F.min(
            F.when(F.col("event_type") == "click", F.col("ts"))
        ).alias("first_click"),
        F.max(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("last_purchase"),
    )
    converted = F.sum(
        F.when(
            F.col("last_purchase") > F.col("first_click"), 1
        ).otherwise(0)
    )
    n_click = F.count("first_click")
    return per.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        n_click.alias("n_with_click"),
        F.count("last_purchase").alias("n_with_purchase"),
        converted.cast("long").alias("n_converted"),
        (
            F.round(converted * 10000.0 / n_click) / 10000.0 + 0.0
        ).alias("conv_rate"),
    )


# --- supplier reliability scorecard ----------------------------------------
# The composite entity-scorecard shape BI teams publish: per supplier,
# volume, return rate, decimal-exact revenue, average ship delay, and
# a within-nation revenue rank — one fact scan, one agg shuffle, one
# dim broadcast, and a window bounded by the nation group (never a
# global unpartitioned rank).
_SCORECARD_ORACLE = """
WITH f AS (
    SELECT l.l_suppkey,
           count(*) AS n_items,
           count(*) FILTER (l.l_returnflag = 'R') AS n_returned,
           round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                 AS DECIMAL(30,8))), 2)::DOUBLE AS revenue,
           round(avg(datediff('day', o.o_orderdate::DATE,
                              l.l_shipdate::DATE)) * 10000) / 10000
               + 0.0 AS avg_ship_delay
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY l.l_suppkey
)
SELECT s.s_name, n.n_name,
       f.n_items::BIGINT AS n_items,
       round(f.n_returned * 10000.0 / f.n_items) / 10000 + 0.0
           AS return_rate,
       f.revenue, f.avg_ship_delay,
       rank() OVER (PARTITION BY n.n_name
                    ORDER BY f.revenue DESC, s.s_suppkey)
           ::BIGINT AS nation_revenue_rank
FROM f
JOIN supplier s ON s.s_suppkey = f.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
"""


@register("supplier_scorecard", oracle=_SCORECARD_ORACLE)
def supplier_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    f = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            ).alias("n_returned"),
            R.money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue"),
            (
                F.round(
                    F.avg(
                        F.datediff(
                            F.col("l_shipdate").cast("date"),
                            F.col("o_orderdate").cast("date"),
                        )
                    )
                    * 10000.0
                )
                / 10000.0
                + 0.0
            ).alias("avg_ship_delay"),
        )
    )
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    # supplier is SF-scaled — no hint (threshold/AQE decides); only the
    # constant-row nation dim keeps its hint
    joined = f.join(
        supp, f["l_suppkey"] == supp["s_suppkey"]
    ).join(
        F.broadcast(nation),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    w = Window.partitionBy("n_name").orderBy(
        F.desc("revenue"), F.asc("s_suppkey")
    )
    return joined.select(
        "s_name",
        "n_name",
        "n_items",
        (
            F.round(F.col("n_returned") * 10000.0 / F.col("n_items"))
            / 10000.0
            + 0.0
        ).alias("return_rate"),
        "revenue",
        "avg_ship_delay",
        F.rank().over(w).cast("long").alias("nation_revenue_rank"),
    )


# --- distribution drift: population stability index ------------------------
# The ML-ops drift monitor: bin the REFERENCE window's value range
# into 10 equal-width bins, histogram both windows, PSI =
# Σ (p−q)·ln(p/q) with Laplace smoothing (+0.5 per bin) so empty bins
# stay finite. All-JVM (two scans + two tiny aggregates); per-term
# DECIMAL(30,8) truncation before the sum kills last-ulp ln()
# differences between JVM Math.log and libm (the charlm convention).
# At 100 TB: histogramming is a map-side-combined count per
# (type, bin) — 50 rows of state; the PSI math runs on the driver-
# sized aggregate.
_PSI_SPLIT = "2024-01-16"
_PSI_ORACLE = f"""
WITH stats AS (
    SELECT event_type, min(value) AS mn, max(value) AS mx,
           count(*) AS n_ref
    FROM events WHERE ts < '{_PSI_SPLIT}' GROUP BY event_type
),
cur_n AS (
    SELECT event_type, count(*) AS n_cur
    FROM events WHERE ts >= '{_PSI_SPLIT}' GROUP BY event_type
),
binned_ref AS (
    SELECT e.event_type,
           least(9, greatest(0, floor((e.value - s.mn)
               / (((s.mx - s.mn) + 1e-9) / 10))))::BIGINT AS bin,
           count(*) AS c
    FROM events e JOIN stats s USING (event_type)
    WHERE e.ts < '{_PSI_SPLIT}' GROUP BY 1, 2
),
binned_cur AS (
    SELECT e.event_type,
           least(9, greatest(0, floor((e.value - s.mn)
               / (((s.mx - s.mn) + 1e-9) / 10))))::BIGINT AS bin,
           count(*) AS c
    FROM events e JOIN stats s USING (event_type)
    WHERE e.ts >= '{_PSI_SPLIT}' GROUP BY 1, 2
),
frame AS (
    SELECT s.event_type, s.n_ref, c.n_cur, g.bin
    FROM stats s
    JOIN cur_n c USING (event_type)
    CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS bin) g
),
terms AS (
    SELECT f.event_type, f.n_ref, f.n_cur,
           (coalesce(r.c, 0) + 0.5) / (f.n_ref + 5.0) AS p,
           (coalesce(cu.c, 0) + 0.5) / (f.n_cur + 5.0) AS q
    FROM frame f
    LEFT JOIN binned_ref r ON r.event_type = f.event_type AND r.bin = f.bin
    LEFT JOIN binned_cur cu ON cu.event_type = f.event_type AND cu.bin = f.bin
)
SELECT event_type, n_ref, n_cur,
       round(sum(CAST((p - q) * ln(p / q) AS DECIMAL(30,8)))::DOUBLE * 10000)
           / 10000 + 0.0 AS psi
FROM terms
GROUP BY event_type, n_ref, n_cur
"""


@register("drift_psi_events", oracle=_PSI_ORACLE)
def drift_psi_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    split = F.lit(_PSI_SPLIT).cast("timestamp")
    ref = ev.filter(F.col("ts") < split)
    cur = ev.filter(F.col("ts") >= split)
    stats = ref.groupBy("event_type").agg(
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
        F.count(F.lit(1)).alias("n_ref"),
    )
    cur_n = cur.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_cur"))

    def binned(side: DataFrame) -> DataFrame:
        b = F.least(
            F.lit(9),
            F.greatest(
                F.lit(0),
                F.floor(
                    (F.col("value") - F.col("mn"))
                    / ((F.col("mx") - F.col("mn") + F.lit(1e-9)) / 10)
                ),
            ),
        ).cast("bigint")
        return (
            side.join(F.broadcast(stats.select("event_type", "mn", "mx")),
                      "event_type")
            .select("event_type", b.alias("bin"))
            .groupBy("event_type", "bin")
            .agg(F.count(F.lit(1)).alias("c"))
        )
    binned_ref = binned(ref)
    binned_cur = binned(cur)
    frame = (
        stats.select("event_type", "n_ref")
        .join(cur_n, "event_type")
        .crossJoin(
            F.broadcast(
                stats.sparkSession.range(10).select(
                    F.col("id").alias("bin")
                )
            )
        )
    )
    terms = (
        frame.join(
            binned_ref.withColumnRenamed("c", "c_ref"),
            ["event_type", "bin"],
            "left",
        )
        .join(
            binned_cur.withColumnRenamed("c", "c_cur"),
            ["event_type", "bin"],
            "left",
        )
        .select(
            "event_type",
            "n_ref",
            "n_cur",
            (
                (F.coalesce(F.col("c_ref"), F.lit(0)) + 0.5)
                / (F.col("n_ref") + 5.0)
            ).alias("p"),
            (
                (F.coalesce(F.col("c_cur"), F.lit(0)) + 0.5)
                / (F.col("n_cur") + 5.0)
            ).alias("q"),
        )
    )
    p4 = F.lit(10000.0)
    return terms.groupBy("event_type", "n_ref", "n_cur").agg(
        (
            F.round(
                F.sum(
                    (
                        (F.col("p") - F.col("q"))
                        * F.log(F.col("p") / F.col("q"))
                    ).cast("decimal(30,8)")
                ).cast("double")
                * p4
            )
            / p4
            + 0.0
        ).alias("psi")
    )


# --- forward as-of with tolerance: time-to-conversion ----------------------
# For each click, the NEXT purchase by the same user within 2 hours
# (else unmatched-but-kept) — pandas merge_asof(direction='forward',
# tolerance=...) semantics, the canonical time-to-conversion query.
# Right side is pre-deduped to one purchase per (user, ts) (min
# event_id) so both engines pick a deterministic match. DuckDB's
# native forward ASOF (p.ts >= c.ts flipped) is the independent
# oracle for the union+window Spark formulation.
_ASOF_FWD_TOL_S = 7200

_ASOF_FWD_ORACLE = f"""
WITH clicks AS (
    SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
),
purchases AS (
    SELECT user_id, ts, min(event_id) AS p_id
    FROM events WHERE event_type = 'purchase'
    GROUP BY user_id, ts
),
m AS (
    SELECT c.event_id, c.user_id, c.ts,
           p.ts AS asof_ts, p.p_id
    FROM clicks c
    ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts <= p.ts
)
SELECT event_id, user_id,
       CASE WHEN datediff('microsecond', ts, asof_ts)
                 <= {_ASOF_FWD_TOL_S * 1000000}
            THEN asof_ts END AS next_purchase_ts,
       CASE WHEN datediff('microsecond', ts, asof_ts)
                 <= {_ASOF_FWD_TOL_S * 1000000}
            THEN p_id END AS next_purchase_id,
       CASE WHEN datediff('microsecond', ts, asof_ts)
                 <= {_ASOF_FWD_TOL_S * 1000000}
            THEN datediff('microsecond', ts, asof_ts) END AS delay_us
FROM m
"""


@register("asof_forward_next_purchase", oracle=_ASOF_FWD_ORACLE)
def asof_forward_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from swat_mapreduce_spark.operators.asof import asof_join_forward

    events = read_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.min("event_id").alias("p_id"))
    )
    j = asof_join_forward(
        clicks,
        purchases,
        on="user_id",
        right_cols=["p_id"],
        tolerance_seconds=_ASOF_FWD_TOL_S,
    )
    return j.select(
        "event_id",
        "user_id",
        F.col("asof_ts").alias("next_purchase_ts"),
        F.col("asof_p_id").alias("next_purchase_id"),
        (F.unix_micros("asof_ts") - F.unix_micros("ts")).alias("delay_us"),
    )


# --- pro-rated revenue recognition -----------------------------------------
# Accrual accounting over intervals: each lineitem's discounted
# revenue is earned uniformly per day from order date to ship date
# (inclusive) and recognized pro-rata into the calendar months the
# interval touches. The month explode is bounded by interval length
# (order→ship spans a few months), so row growth is a small constant —
# never a cross join; the rollup is one shuffle on month. Per-row
# proration is double math (deterministic, no accumulation); the month
# sums cast to decimal BEFORE summing (1e6+ magnitudes, CLAUDE.md
# gotcha 2). The synthetic testdata contains lineitems whose shipdate
# PRECEDES the order date, so the recognition interval is normalized
# to [least, greatest] in both engines.
_PRORATE_ORACLE = """
WITH li AS (
    SELECT l.l_orderkey,
           least(o.o_orderdate::DATE, l.l_shipdate::DATE) AS d0,
           greatest(o.o_orderdate::DATE, l.l_shipdate::DATE) AS d1,
           l.l_extendedprice * (1 - l.l_discount) AS rev
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
),
m AS (
    SELECT l_orderkey, d0, d1, rev,
           unnest(generate_series(date_trunc('month', d0),
                                  date_trunc('month', d1),
                                  INTERVAL 1 MONTH))::DATE AS month
    FROM li
),
ov AS (
    SELECT month,
           rev * (datediff('day', greatest(month, d0),
                           least(last_day(month), d1)) + 1)
               / (datediff('day', d0, d1) + 1) AS part,
           l_orderkey
    FROM m
)
SELECT month,
       round(sum(CAST(part AS DECIMAL(30,8))), 2)::DOUBLE AS revenue,
       count(DISTINCT l_orderkey)::BIGINT AS n_orders
FROM ov GROUP BY month
"""


@register("prorate_revenue_monthly", oracle=_PRORATE_ORACLE)
def prorate_revenue_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    base = li.join(
        orders, li["l_orderkey"] == orders["o_orderkey"]
    ).select(
        "l_orderkey",
        F.least(
            F.col("o_orderdate").cast("date"),
            F.col("l_shipdate").cast("date"),
        ).alias("d0"),
        F.greatest(
            F.col("o_orderdate").cast("date"),
            F.col("l_shipdate").cast("date"),
        ).alias("d1"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    months = base.select(
        "l_orderkey",
        "d0",
        "d1",
        "rev",
        F.explode(
            F.sequence(
                F.trunc("d0", "month"),
                F.trunc("d1", "month"),
                F.expr("INTERVAL 1 MONTH"),
            )
        ).alias("month"),
    )
    part = (
        F.col("rev")
        * (
            F.datediff(
                F.least(F.last_day("month"), F.col("d1")),
                F.greatest(F.col("month"), F.col("d0")),
            )
            + 1
        )
        / (F.datediff("d1", "d0") + 1)
    )
    return (
        months.select("month", part.alias("part"), "l_orderkey")
        .groupBy("month")
        .agg(
            F.round(F.sum(F.col("part").cast("decimal(30,8)")), 2)
            .cast("double")
            .alias("revenue"),
            F.count_distinct("l_orderkey").alias("n_orders"),
        )
    )


# --- cumulative distinct users (first-seen trick) --------------------------
# Daily active/new/cumulative-distinct users. The naive form —
# count(DISTINCT user) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) —
# re-scans history per day and Spark refuses DISTINCT in windows
# anyway. The scale form: mark each user's FIRST day (one aggregate),
# count firsts per day, running-sum the bounded daily table. The
# expensive shuffle is user-keyed once; the window runs over ~365
# rows/year, never over events.
_CUMDIST_ORACLE = """
WITH daily AS (
    SELECT date_trunc('day', ts)::DATE AS day,
           count(DISTINCT user_id) AS dau
    FROM events GROUP BY 1
),
firsts AS (
    SELECT user_id, min(date_trunc('day', ts)::DATE) AS first_day
    FROM events GROUP BY user_id
),
new_by_day AS (
    SELECT first_day AS day, count(*) AS new_users
    FROM firsts GROUP BY first_day
)
SELECT d.day, d.dau::BIGINT AS dau,
       coalesce(n.new_users, 0)::BIGINT AS new_users,
       sum(coalesce(n.new_users, 0))
           OVER (ORDER BY d.day ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW)::BIGINT AS cumulative_users
FROM daily d LEFT JOIN new_by_day n ON n.day = d.day
"""


@register("cumulative_distinct_users", oracle=_CUMDIST_ORACLE)
def cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).cast("date")
    daily = events.groupBy(day.alias("day")).agg(
        F.count_distinct("user_id").alias("dau")
    )
    firsts = events.groupBy("user_id").agg(F.min(day).alias("first_day"))
    new_by_day = firsts.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        daily.join(new_by_day, "day", "left")
        .select(
            "day",
            "dau",
            F.coalesce("new_users", F.lit(0)).alias("new_users"),
        )
        .withColumn(
            "cumulative_users",
            F.sum("new_users").over(w).cast("long"),
        )
    )


# --- winsorization ---------------------------------------------------------
# Robust-stats curation: clamp values to the [p1, p99] band per
# event_type and report how much mass moved — the standard outlier
# treatment before training on numeric features. Two passes: one
# exact-percentile aggregate (|types|-row broadcast), one clamp+stats
# scan. Spark's exact `percentile` interpolates identically to
# DuckDB's quantile_cont. Means are decimal-summed (value sums are
# ~5e6 at sf0.1 — CLAUDE.md gotcha 2).
_WINSOR_ORACLE = """
WITH p AS (
    SELECT event_type,
           quantile_cont(value, 0.01) AS p01,
           quantile_cont(value, 0.99) AS p99
    FROM events GROUP BY event_type
),
c AS (
    SELECT e.event_type, e.value, p.p01, p.p99,
           least(greatest(e.value, p.p01), p.p99) AS clamped
    FROM events e JOIN p USING (event_type)
)
SELECT event_type,
       round(any_value(p01) * 10000) / 10000 + 0.0 AS p01,
       round(any_value(p99) * 10000) / 10000 + 0.0 AS p99,
       count(*) FILTER (WHERE value < p01)::BIGINT AS n_low,
       count(*) FILTER (WHERE value > p99)::BIGINT AS n_high,
       round(sum(CAST(value AS DECIMAL(30,8)))::DOUBLE / count(*)
             * 10000) / 10000 + 0.0 AS mean_before,
       round(sum(CAST(clamped AS DECIMAL(30,8)))::DOUBLE / count(*)
             * 10000) / 10000 + 0.0 AS mean_after
FROM c GROUP BY event_type
"""


@register("winsorize_values", oracle=_WINSOR_ORACLE)
def winsorize_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    p = events.groupBy("event_type").agg(
        F.expr("percentile(value, 0.01)").alias("p01"),
        F.expr("percentile(value, 0.99)").alias("p99"),
    )
    c = events.join(F.broadcast(p), "event_type").select(
        "event_type",
        "value",
        "p01",
        "p99",
        F.least(F.greatest(F.col("value"), F.col("p01")), F.col("p99")).alias(
            "clamped"
        ),
    )
    n = F.count(F.lit(1))
    return c.groupBy("event_type").agg(
        R.r(F.any_value("p01"), 4).alias("p01"),
        R.r(F.any_value("p99"), 4).alias("p99"),
        F.count(F.when(F.col("value") < F.col("p01"), 1)).alias("n_low"),
        F.count(F.when(F.col("value") > F.col("p99"), 1)).alias("n_high"),
        (
            F.round(
                F.sum(F.col("value").cast("decimal(30,8)")).cast("double")
                / n
                * 10000.0
            )
            / 10000.0
            + 0.0
        ).alias("mean_before"),
        (
            F.round(
                F.sum(F.col("clamped").cast("decimal(30,8)")).cast("double")
                / n
                * 10000.0
            )
            / 10000.0
            + 0.0
        ).alias("mean_after"),
    )


# --- truncated EWMA (16-event lookback) ------------------------------------
# The streaming-friendly exponentially weighted moving average: the
# recursive s_t = a*v_t + (1-a)*s_{t-1} is inherently sequential, but
# truncating the memory to the last K events (weights below
# (1-a)^K ≈ 0.3% of mass at K=16, a=0.3) turns it into a bounded
# window fold — per-key ROWS frames of ≤16 values, no sequential
# dependency, which is the shape that parallelizes at 100 TB. Both
# engines fold the identical explicit weight formula over the
# frame-ordered value list.
_EWMA_A = 0.3
_EWMA_K = 16

_EWMA_ORACLE = f"""
WITH w AS (
    SELECT event_id, user_id, value,
           list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN {_EWMA_K - 1} PRECEDING
                             AND CURRENT ROW) AS vs
    FROM events
)
SELECT event_id, user_id,
       round(list_sum(list_transform(generate_series(1, len(vs)),
             i -> vs[i] * (CASE WHEN i = 1
                                THEN pow({1 - _EWMA_A}, len(vs) - 1)
                                ELSE {_EWMA_A}
                                     * pow({1 - _EWMA_A}, len(vs) - i)
                           END))) * 10000) / 10000 + 0.0 AS ewma
FROM w
"""


@register("ewma_lookback", oracle=_EWMA_ORACLE)
def ewma_lookback(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_EWMA_K - 1), 0)
    )
    with_list = events.select(
        "event_id",
        "user_id",
        F.collect_list("value").over(w).alias("vs"),
    ).withColumn("k", F.size("vs"))
    weighted = F.transform(
        F.sequence(F.lit(1), F.col("k")),
        lambda i: F.element_at(F.col("vs"), i)
        * F.when(i == 1, F.pow(F.lit(1 - _EWMA_A), F.col("k") - 1)).otherwise(
            F.lit(_EWMA_A) * F.pow(F.lit(1 - _EWMA_A), F.col("k") - i)
        ),
    )
    ewma = F.aggregate(weighted, F.lit(0.0), lambda acc, x: acc + x)
    return with_list.select(
        "event_id", "user_id", R.r(ewma, 4).alias("ewma")
    )


# --- nearest-direction as-of: closest error around each purchase -----------
# pandas merge_asof(direction='nearest') semantics — the incident-
# correlation query ("was there an error NEAR this purchase?"): for
# each purchase, the same user's closest error event in EITHER
# direction within 30 minutes; equidistant ties take the backward
# (earlier) error, pandas' convention. Errors are pre-deduped to one
# per (user, ts) (min event_id) for a deterministic match. Spark runs
# the one-shuffle union + dual-frame window (operators/asof.py
# asof_join_nearest: backward last() and forward first() share one
# WindowExec); the oracle composes DuckDB's NATIVE backward and
# forward ASOF joins and picks the closer — two independent
# formulations of the same semantics.
_ASOF_NEAR_TOL_S = 1800

_ASOF_NEAR_ORACLE = f"""
WITH purchases AS (
    SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
errors AS (
    SELECT user_id, ts, min(event_id) AS e_id
    FROM events WHERE event_type = 'error'
    GROUP BY user_id, ts
),
b AS (
    SELECT p.event_id, p.user_id, p.ts, e.ts AS b_ts, e.e_id AS b_id
    FROM purchases p
    ASOF LEFT JOIN errors e ON p.user_id = e.user_id AND p.ts >= e.ts
),
f AS (
    SELECT p.event_id, e.ts AS f_ts, e.e_id AS f_id
    FROM purchases p
    ASOF LEFT JOIN errors e ON p.user_id = e.user_id AND p.ts <= e.ts
),
m AS (
    SELECT b.event_id, b.user_id, b.ts,
           CASE WHEN b.b_ts IS NOT NULL AND (f.f_ts IS NULL
                     OR datediff('microsecond', b.ts, f.f_ts)
                        >= datediff('microsecond', b.b_ts, b.ts))
                THEN b.b_ts ELSE f.f_ts END AS n_ts,
           CASE WHEN b.b_ts IS NOT NULL AND (f.f_ts IS NULL
                     OR datediff('microsecond', b.ts, f.f_ts)
                        >= datediff('microsecond', b.b_ts, b.ts))
                THEN b.b_id ELSE f.f_id END AS n_id,
           CASE WHEN b.b_ts IS NULL AND f.f_ts IS NULL THEN NULL
                WHEN b.b_ts IS NOT NULL AND (f.f_ts IS NULL
                     OR datediff('microsecond', b.ts, f.f_ts)
                        >= datediff('microsecond', b.b_ts, b.ts))
                THEN 'backward' ELSE 'forward' END AS dir
    FROM b JOIN f ON f.event_id = b.event_id
)
SELECT event_id, user_id,
       CASE WHEN abs(datediff('microsecond', ts, n_ts))
                 <= {_ASOF_NEAR_TOL_S * 1000000}
            THEN n_ts END AS nearest_error_ts,
       CASE WHEN abs(datediff('microsecond', ts, n_ts))
                 <= {_ASOF_NEAR_TOL_S * 1000000}
            THEN n_id END AS nearest_error_id,
       CASE WHEN abs(datediff('microsecond', ts, n_ts))
                 <= {_ASOF_NEAR_TOL_S * 1000000}
            THEN dir END AS dir,
       CASE WHEN abs(datediff('microsecond', ts, n_ts))
                 <= {_ASOF_NEAR_TOL_S * 1000000}
            THEN datediff('microsecond', ts, n_ts) END AS gap_us
FROM m
"""


@register("asof_nearest_error_purchase", oracle=_ASOF_NEAR_ORACLE)
def asof_nearest_error_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from swat_mapreduce_spark.operators.asof import asof_join_nearest

    events = read_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    errors = (
        events.filter(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.min("event_id").alias("e_id"))
    )
    j = asof_join_nearest(
        purchases,
        errors,
        on="user_id",
        right_cols=["e_id"],
        tolerance_seconds=_ASOF_NEAR_TOL_S,
    )
    return j.select(
        "event_id",
        "user_id",
        F.col("asof_ts").alias("nearest_error_ts"),
        F.col("asof_e_id").alias("nearest_error_id"),
        F.col("asof_dir").alias("dir"),
        (F.unix_micros("asof_ts") - F.unix_micros("ts")).alias("gap_us"),
    )


# --- LTTB-style time-series downsampling ------------------------------------
# Largest-Triangle-Three-Buckets (Steinarsson 2013), the standard
# plot-100TB-of-metrics downsampler: per (series, day) keep the ONE
# point forming the largest triangle with the neighboring buckets'
# mean points. This is the bucketed-parallel LTTB variant — the exact
# algorithm anchors on the previously SELECTED point (inherently
# sequential); anchoring on the neighbor bucket MEANS (the paper's
# own right-anchor approximation, applied symmetrically) makes every
# bucket independent: one narrow per-bucket aggregate, lag/lead over
# the small bucket table, then a per-bucket argmax window. Boundary
# buckets (no neighbor on one side) are dropped.
#
# Cross-engine determinism: bucket means are built from EXACT integer
# sums only — sum(epoch_us) and sum(round(value*1e6)) (values
# µ-quantized at 1e-6) — so each engine performs the same two IEEE
# divisions on identical integers; the triangle cross-product then
# sees bit-identical inputs, and the argmax orders by the 4dp-rounded
# score with event_id as tie-break (CLAUDE.md gotchas 2/9: no
# accumulation-order doubles, no bare max_by keys).
_LTTB_ORACLE = """
WITH ds AS (
    SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS cnt,
           sum(CAST(epoch_us(ts) AS DECIMAL(38,0))) AS sx,
           sum(CAST(round(value * 1000000) AS DECIMAL(38,0))) AS sy6
    FROM events GROUP BY 1, 2
),
nb AS (
    SELECT event_type, day,
           lag(sx::DOUBLE / cnt) OVER w AS x_prev,
           lag((sy6::DOUBLE / cnt) / 1000000) OVER w AS y_prev,
           lead(sx::DOUBLE / cnt) OVER w AS x_next,
           lead((sy6::DOUBLE / cnt) / 1000000) OVER w AS y_next
    FROM ds
    WINDOW w AS (PARTITION BY event_type ORDER BY day)
),
cand AS (
    SELECT e.event_type, CAST(e.ts AS DATE) AS day, e.event_id, e.ts,
           e.value,
           round(abs((n.x_prev - n.x_next) * (e.value - n.y_prev)
                     - (n.x_prev - epoch_us(e.ts)::DOUBLE)
                       * (n.y_next - n.y_prev))
                 / 1000000000 * 10000) / 10000 + 0.0 AS tri_score
    FROM events e
    JOIN nb n ON n.event_type = e.event_type AND n.day = CAST(e.ts AS DATE)
    WHERE n.x_prev IS NOT NULL AND n.x_next IS NOT NULL
)
SELECT event_type, day, event_id, ts,
       round(value * 10000) / 10000 + 0.0 AS value,
       tri_score
FROM (SELECT *, row_number() OVER (
          PARTITION BY event_type, day
          ORDER BY tri_score DESC, event_id) AS rn
      FROM cand)
WHERE rn = 1
"""


@register("downsample_lttb_daily", oracle=_LTTB_ORACLE)
def downsample_lttb_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed LTTB: one narrow (event_type, day) aggregate, lag/lead
    over the |days|-bounded bucket table (broadcast back onto the
    facts — no fact shuffle for the join), one per-bucket argmax
    window. At 100 TB the only fact-sized shuffle is the argmax
    window's (event_type, day) partition; everything else moves
    |series|x|days| rows."""
    events = read_table(spark, sf_dir, "events")
    # select-then-group keeps the physical key named `day` (an inline
    # cast becomes an opaque _groupingexpression the broadcast-
    # boundedness auditor cannot classify — tools/planaudit.py)
    events = events.select(F.col("ts").cast("date").alias("day"), "*")
    ds = events.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("cnt"),
        # DECIMAL(38,0) sums: a bucket's sum(epoch_us) reaches 1.26e18
        # at sf0.1 (~7x headroom to int64 max) — a >~5.4k-event bucket
        # would overflow LongType while DuckDB's sum(BIGINT) promotes
        # to HUGEINT. Decimal accumulation is exact and overflow-free
        # on both engines at any bucket size (ADVICE r5, gotcha 2).
        F.sum(F.unix_micros("ts").cast("decimal(38,0)")).alias("sx"),
        F.sum(
            F.round(F.col("value") * 1000000).cast("decimal(38,0)")
        ).alias("sy6"),
    )
    w = Window.partitionBy("event_type").orderBy("day")
    ax = F.col("sx").cast("double") / F.col("cnt")
    ay = (F.col("sy6").cast("double") / F.col("cnt")) / 1000000
    nb = ds.select(
        F.col("event_type").alias("n_type"),
        F.col("day").alias("n_day"),
        F.lag(ax).over(w).alias("x_prev"),
        F.lag(ay).over(w).alias("y_prev"),
        F.lead(ax).over(w).alias("x_next"),
        F.lead(ay).over(w).alias("y_next"),
    ).filter(F.col("x_prev").isNotNull() & F.col("x_next").isNotNull())
    xi = F.unix_micros("ts").cast("double")
    tri = (
        F.abs(
            (F.col("x_prev") - F.col("x_next"))
            * (F.col("value") - F.col("y_prev"))
            - (F.col("x_prev") - xi) * (F.col("y_next") - F.col("y_prev"))
        )
        / 1000000000
    )
    cand = events.join(
        F.broadcast(nb),
        (F.col("n_type") == F.col("event_type"))
        & (F.col("n_day") == F.col("day")),
    ).select(
        "event_type",
        "day",
        "event_id",
        "ts",
        "value",
        R.r(tri, 4).alias("tri_score"),
    )
    w_pick = Window.partitionBy("event_type", "day").orderBy(
        F.desc("tri_score"), F.asc("event_id")
    )
    return (
        cand.withColumn("rn", F.row_number().over(w_pick))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            "day",
            "event_id",
            "ts",
            R.r("value", 4).alias("value"),
            "tri_score",
        )
    )


# --- position-based (U-shaped) multi-touch attribution ---------------------
# attribution_last_touch credits one click; the position-based model
# marketing stacks actually run splits each purchase's value across
# ALL clicks in its 7-day lookback: 100% to a lone touch, 50/50 for
# two, else 40% first + 40% last + 20% spread over the middles.
# Purchases with no prior click credit 'organic' in full (the LEFT
# join's null touch row flows through the same n=1 formula).
# Plan shape: one user-keyed equi-join with a range predicate (each
# user's touches are bounded), per-PURCHASE rank/count windows
# (partition = one purchase's touch list — bounded), then a
# |channels|-row rollup. Credited amounts are quantized to
# DECIMAL(30,8) per term before the money sum, so the rollup is
# accumulation-order-independent (CLAUDE.md gotcha 2).
_POSITION_ATTRIB_ORACLE = """
WITH p AS (
    SELECT user_id, event_id AS p_id, ts AS p_ts, value
    FROM events WHERE event_type = 'purchase'
),
t AS (
    SELECT user_id, event_id AS t_id, ts AS t_ts,
           CAST(json_extract_string(props, '$.k') AS INT) AS k
    FROM events WHERE event_type = 'click'
),
j AS (
    SELECT p.p_id, p.value, t.t_id, t.t_ts, t.k
    FROM p LEFT JOIN t
      ON t.user_id = p.user_id
     AND t.t_ts < p.p_ts
     AND t.t_ts >= p.p_ts - INTERVAL 7 DAYS
),
r AS (
    SELECT p_id, value, k, t_id,
           row_number() OVER w AS rn,
           count(*) OVER (PARTITION BY p_id) AS n
    FROM j
    WINDOW w AS (PARTITION BY p_id ORDER BY t_ts, t_id)
),
credited AS (
    SELECT coalesce('ch_' || (k % 4), 'organic') AS channel, p_id,
           CAST(value * (CASE WHEN n = 1 THEN 1.0
                              WHEN n = 2 THEN 0.5
                              WHEN rn = 1 OR rn = n THEN 0.4
                              ELSE 0.2 / (n - 2) END)
                AS DECIMAL(30,8)) AS credit
    FROM r
)
SELECT channel,
       count(*)::BIGINT AS n_credits,
       count(DISTINCT p_id)::BIGINT AS n_purchases,
       round(sum(credit), 2)::DOUBLE AS attributed_value
FROM credited
GROUP BY channel
"""


@register("attribution_position_based", oracle=_POSITION_ATTRIB_ORACLE)
def attribution_position_based(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("p_id"),
        F.col("ts").alias("p_ts"),
        "value",
    )
    t = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("t_user"),
        F.col("event_id").alias("t_id"),
        F.col("ts").alias("t_ts"),
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )
    j = p.join(
        t,
        (F.col("t_user") == F.col("user_id"))
        & (F.col("t_ts") < F.col("p_ts"))
        & (F.col("t_ts") >= F.col("p_ts") - F.expr("INTERVAL 7 DAYS")),
        "left",
    )
    w = Window.partitionBy("p_id").orderBy("t_ts", "t_id")
    wn = Window.partitionBy("p_id")
    r = j.select(
        "p_id",
        "value",
        "k",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    credit_frac = (
        F.when(F.col("n") == 1, F.lit(1.0))
        .when(F.col("n") == 2, F.lit(0.5))
        .when((F.col("rn") == 1) | (F.col("rn") == F.col("n")), F.lit(0.4))
        .otherwise(F.lit(0.2) / (F.col("n") - 2))
    )
    credited = r.select(
        F.coalesce(
            F.concat(F.lit("ch_"), (F.col("k") % 4).cast("string")),
            F.lit("organic"),
        ).alias("channel"),
        "p_id",
        (F.col("value") * credit_frac).cast("decimal(30,8)").alias("credit"),
    )
    return credited.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_credits"),
        F.count_distinct(F.col("p_id")).alias("n_purchases"),
        R.r(F.sum("credit").cast("double"), 2).alias("attributed_value"),
    )


# --- Markov next-event top-1 accuracy ---------------------------------------
# The eval half of journey_transition_matrix: how predictable is the
# event stream under the first-order argmax policy? Model = argmax
# successor per from_type (count desc, to_type asc ties — ONE window
# over the |event_types|²-bounded transition table); accuracy = share
# of transitions whose actual successor matches. In-sample by design
# (the model is a corpus descriptor, not a holdout eval — the
# point-in-time split lives in churn_feature_table).
_MARKOV_ACC_ORACLE = """
WITH seq AS (
    SELECT event_type AS from_type,
           lead(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS to_type
    FROM events
),
cnt AS (
    SELECT from_type, to_type, count(*)::BIGINT AS n
    FROM seq WHERE to_type IS NOT NULL
    GROUP BY from_type, to_type
),
best AS (
    SELECT from_type, to_type AS pred
    FROM cnt
    QUALIFY row_number() OVER (PARTITION BY from_type
                               ORDER BY n DESC, to_type) = 1
),
j AS (
    SELECT c.from_type, b.pred,
           sum(c.n)::BIGINT AS n_total,
           sum(CASE WHEN c.to_type = b.pred THEN c.n ELSE 0 END)::BIGINT
               AS n_correct
    FROM cnt c JOIN best b USING (from_type)
    GROUP BY c.from_type, b.pred
)
SELECT from_type, pred, n_total, n_correct,
       round(n_correct * 1.0 / n_total * 10000) / 10000 + 0.0 AS accuracy
FROM j
"""


@register("markov_next_event_accuracy", oracle=_MARKOV_ACC_ORACLE)
def markov_next_event_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    cnt = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    wb = Window.partitionBy("from_type").orderBy(
        F.desc("n"), F.asc("to_type")
    )
    best = (
        cnt.withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") == 1)
        .select("from_type", F.col("to_type").alias("pred"))
    )
    j = cnt.join(F.broadcast(best), "from_type").groupBy(
        "from_type", "pred"
    ).agg(
        F.sum("n").alias("n_total"),
        F.sum(
            F.when(F.col("to_type") == F.col("pred"), F.col("n")).otherwise(0)
        ).alias("n_correct"),
    )
    return j.select(
        "from_type",
        "pred",
        "n_total",
        "n_correct",
        R.r(F.col("n_correct") * 1.0 / F.col("n_total"), 4).alias("accuracy"),
    )


# --- point-in-time churn feature table --------------------------------------
# Leakage-safe ML feature engineering: features are computed ONLY from
# orders at or before the cutoff (corpus end − 180 days), the label
# ONLY from orders after it — the point-in-time-correctness contract
# every churn/LTV training table must satisfy. One per-customer
# aggregate for each side of the cut; the label side joins back
# left-outer (no post-cutoff order → churned=true). Monetary sums are
# decimal-exact (gotcha 2).
_CHURN_HORIZON_DAYS = 180

_CHURN_ORACLE = f"""
WITH mx AS (
    SELECT max(o_orderdate::DATE) - INTERVAL {_CHURN_HORIZON_DAYS} DAY
        AS cutoff FROM orders
),
pre AS (
    SELECT o_custkey,
           count(*)::BIGINT AS frequency,
           date_diff('day', max(o_orderdate::DATE), mx.cutoff)::BIGINT
               AS recency_days,
           date_diff('day', min(o_orderdate::DATE), mx.cutoff)::BIGINT
               AS tenure_days,
           round(sum(CAST(o_totalprice AS DECIMAL(30,8))), 2)::DOUBLE
               AS monetary
    FROM orders, mx
    WHERE o_orderdate::DATE <= mx.cutoff
    GROUP BY o_custkey, mx.cutoff
),
post AS (
    SELECT DISTINCT o_custkey FROM orders, mx
    WHERE o_orderdate::DATE > mx.cutoff
)
SELECT pre.o_custkey AS custkey, pre.recency_days, pre.tenure_days,
       pre.frequency, pre.monetary,
       (post.o_custkey IS NULL) AS churned
FROM pre LEFT JOIN post ON post.o_custkey = pre.o_custkey
"""


@register("churn_feature_table", oracle=_CHURN_ORACLE)
def churn_feature_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("d"),
        "o_totalprice",
    )
    mx = o.agg(
        F.date_sub(F.max("d"), _CHURN_HORIZON_DAYS).alias("cutoff")
    )
    oc = o.crossJoin(F.broadcast(mx))
    pre = oc.filter(F.col("d") <= F.col("cutoff")).groupBy(
        "o_custkey", "cutoff"
    ).agg(
        F.count(F.lit(1)).alias("frequency"),
        F.datediff(F.col("cutoff"), F.max("d")).cast("long").alias(
            "recency_days"
        ),
        F.datediff(F.col("cutoff"), F.min("d")).cast("long").alias(
            "tenure_days"
        ),
        R.money_sum(F.col("o_totalprice")).alias("monetary"),
    )
    post = (
        oc.filter(F.col("d") > F.col("cutoff"))
        .select(F.col("o_custkey").alias("pk"))
        .distinct()
    )
    return pre.join(
        post, pre.o_custkey == post.pk, "left"
    ).select(
        F.col("o_custkey").alias("custkey"),
        "recency_days",
        "tenure_days",
        "frequency",
        "monetary",
        F.col("pk").isNull().alias("churned"),
    )


# --- LTV cohort curve --------------------------------------------------------
# Cumulative revenue per customer by cohort age: customers cohort on
# their first-order month; revenue accumulates over months-since-
# cohort (capped at 12). The cumulative window is PARTITIONED by
# cohort over ≤ 13 age rows; revenue stays decimal-exact until the
# final per-customer division. The standard LTV payback input.
_LTV_MAX_AGE = 12

_LTV_ORACLE = f"""
WITH fo AS (
    SELECT o_custkey,
           min(date_trunc('month', o_orderdate)::DATE) AS cohort
    FROM orders GROUP BY 1
),
sz AS (SELECT cohort, count(*)::BIGINT AS cohort_size FROM fo GROUP BY 1),
rev AS (
    SELECT fo.cohort,
           date_diff('month', fo.cohort,
                     date_trunc('month', o.o_orderdate)::DATE)::BIGINT
               AS age,
           sum(CAST(o.o_totalprice AS DECIMAL(30,8))) AS r
    FROM orders o JOIN fo ON fo.o_custkey = o.o_custkey
    GROUP BY 1, 2
),
cum AS (
    SELECT cohort, age,
           sum(r) OVER (PARTITION BY cohort ORDER BY age
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cr
    FROM rev
)
SELECT c.cohort, c.age, s.cohort_size,
       round(c.cr, 2)::DOUBLE AS cum_revenue,
       round(c.cr::DOUBLE / s.cohort_size * 100) / 100 + 0.0
           AS ltv_per_customer
FROM cum c JOIN sz s USING (cohort)
WHERE c.age <= {_LTV_MAX_AGE}
"""


@register("ltv_cohort_curve", oracle=_LTV_ORACLE)
def ltv_cohort_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.date_trunc("month", "o_orderdate").cast("date").alias("m"),
        "o_totalprice",
    )
    fo = o.groupBy("o_custkey").agg(F.min("m").alias("cohort"))
    sz = fo.groupBy("cohort").agg(F.count(F.lit(1)).alias("cohort_size"))
    rev = (
        o.join(fo, "o_custkey")
        .groupBy(
            "cohort",
            F.months_between(F.col("m"), F.col("cohort"))
            .cast("long")
            .alias("age"),
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(30,8)")).alias("r"))
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = rev.withColumn("cr", F.sum("r").over(w))
    return (
        cum.join(F.broadcast(sz), "cohort")
        .filter(F.col("age") <= _LTV_MAX_AGE)
        .select(
            "cohort",
            "age",
            "cohort_size",
            F.round(F.col("cr"), 2).cast("double").alias("cum_revenue"),
            R.r(F.col("cr").cast("double") / F.col("cohort_size"), 2).alias(
                "ltv_per_customer"
            ),
        )
    )


# --- sequential-pattern support (a -> b within horizon) --------------------------
# The sequence-mining primitive (the 2-sequence core of
# PrefixSpan/SPADE): for every ORDERED event-type pair (a, b), the
# number of users with at least one a-event followed by a b-event
# within 1 hour — "what do users do next", with ordering and a time
# horizon (journey_transition_matrix counts only ADJACENT steps;
# market_basket is unordered). Support is an exact distinct-user
# count; share = support / total users, one IEEE division. Scale: the
# candidate join is user-keyed and horizon-bounded (per-user activity
# × |event types| — the as-of/interval-join family, never corpus²);
# the (a, b) output is |types|² bounded.
_SEQ_HORIZON_US = 3_600_000_000

_SEQPAT_ORACLE = f"""
WITH u AS (SELECT count(DISTINCT user_id)::BIGINT AS n_users FROM events),
hits AS (
    SELECT DISTINCT a.event_type AS type_a, b.event_type AS type_b,
           a.user_id
    FROM events a
    JOIN events b ON b.user_id = a.user_id
               AND b.ts > a.ts
               AND epoch_us(b.ts) - epoch_us(a.ts) <= {_SEQ_HORIZON_US}
)
SELECT h.type_a, h.type_b,
       count(*)::BIGINT AS n_users_support,
       round(count(*) * 10000.0 / u.n_users) / 10000 + 0.0
           AS support_share
FROM hits h, u
GROUP BY h.type_a, h.type_b, u.n_users
"""


@register("seq_pattern_support", oracle=_SEQPAT_ORACLE)
def seq_pattern_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    a = ev.select(
        F.col("user_id").alias("ua"),
        F.col("event_type").alias("type_a"),
        F.col("ts").alias("ts_a"),
    )
    b = ev.select(
        F.col("user_id").alias("ub"),
        F.col("event_type").alias("type_b"),
        F.col("ts").alias("ts_b"),
    )
    hits = (
        a.join(
            b,
            (F.col("ua") == F.col("ub"))
            & (F.col("ts_b") > F.col("ts_a"))
            & (
                F.unix_micros("ts_b") - F.unix_micros("ts_a")
                <= F.lit(_SEQ_HORIZON_US)
            ),
        )
        .select("type_a", "type_b", "ua")
        .distinct()
    )
    u = ev.agg(F.countDistinct("user_id").cast("long").alias("n_users"))
    return (
        hits.groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users_support"))
        .crossJoin(F.broadcast(u))
        .select(
            "type_a",
            "type_b",
            "n_users_support",
            (
                F.round(
                    F.col("n_users_support")
                    * F.lit(10000.0)
                    / F.col("n_users")
                )
                / 10000
                + F.lit(0.0)
            ).alias("support_share"),
        )
    )


# --- entropy rate of the event-type Markov chain ---------------------------------
# The information-theoretic sequel to journey_transition_matrix: the
# per-step entropy rate H = −Σ_i π_i Σ_j p_ij log2 p_ij of the
# first-order event-type chain, with the stationary distribution π
# from TWO power-iteration steps on the transition matrix starting
# uniform — "how predictable is the next user action". The chain is
# |types|² bounded metadata after one corpus window pass, so the
# iteration runs driver-side (kmeans pattern) on exact integer
# transition counts: every π update is a ratio of exact integer
# products snapped to 1e-8 units (multiply-round-divide, gotcha 13a),
# every plogp term snaps to 1e-6 units before the order-free sum; the
# oracle replays the identical two steps in SQL over the same counts.
_MKE_PI_U = 100_000_000  # 1e-8 pi units
_MKE_H_U = 1_000_000  # 1e-6 entropy-term units

_MKE_ORACLE = f"""
WITH seq AS (
    SELECT event_type AS a,
           lead(event_type) OVER (PARTITION BY user_id ORDER BY ts,
                                  event_id) AS b
    FROM events
),
c AS (
    SELECT a, b, count(*)::BIGINT AS n FROM seq WHERE b IS NOT NULL
    GROUP BY 1, 2
),
ra AS (SELECT a, sum(n)::BIGINT AS ra FROM c GROUP BY 1),
types AS (SELECT count(*)::BIGINT AS k FROM ra),
-- pi_0 uniform in 1e-8 units; two exact snapped updates
p1 AS (
    SELECT c.b AS t,
           sum(CAST(round(({_MKE_PI_U} / types.k) * (c.n::DOUBLE / ra.ra))
                    AS BIGINT))::BIGINT AS pi_u
    FROM c JOIN ra USING (a), types
    GROUP BY c.b
),
p2 AS (
    SELECT c.b AS t,
           sum(CAST(round(p1.pi_u * (c.n::DOUBLE / ra.ra)) AS BIGINT))
               ::BIGINT AS pi_u
    FROM c JOIN ra USING (a) JOIN p1 ON p1.t = c.a
    GROUP BY c.b
),
rowh AS (
    SELECT c.a,
           sum(CAST(round(-(c.n::DOUBLE / ra.ra)
                    * log2(c.n::DOUBLE / ra.ra) * {_MKE_H_U}) AS BIGINT))
               ::BIGINT AS h_u
    FROM c JOIN ra USING (a)
    GROUP BY c.a
)
SELECT p2.t AS event_type,
       round(p2.pi_u * 1.0 / {_MKE_PI_U} * 10000) / 10000 + 0.0
           AS stationary_pi,
       round(rowh.h_u * 1.0 / {_MKE_H_U} * 10000) / 10000 + 0.0
           AS row_entropy_bits,
       round((SELECT sum(CAST(round((q.pi_u * 1.0 / {_MKE_PI_U})
                     * rh.h_u) AS BIGINT))
              FROM p2 q JOIN rowh rh ON rh.a = q.t) * 1.0
             / {_MKE_H_U} * 10000) / 10000 + 0.0 AS entropy_rate_bits
FROM p2 JOIN rowh ON rowh.a = p2.t
"""


@register("markov_entropy_rate", oracle=_MKE_ORACLE)
def markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from swat_mapreduce_spark.queries.curation import _ri, _rp

    ev = read_table(spark, sf_dir, "events")
    seq = ev.select(
        F.col("event_type").alias("a"),
        F.lead("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("b"),
    )
    c = {
        (r["a"], r["b"]): int(r["n"])
        for r in seq.filter(F.col("b").isNotNull())
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }  # bounded driver state: |types|^2 cells
    ra: dict[str, int] = {}
    for (va, _), n in c.items():
        ra[va] = ra.get(va, 0) + n
    types = sorted(ra)
    k = len(types)
    # FLOAT division, mirroring the oracle's ({_MKE_PI_U} / k) double —
    # an integer // here would diverge whenever k does not divide 1e8
    pi: dict = {t: _MKE_PI_U / k for t in types}
    for _step in range(2):
        nxt = {t: 0 for t in types}
        for (va, vb), n in sorted(c.items()):
            nxt[vb] += _ri(pi[va] * (n / ra[va]), 0)
        pi = nxt
    rowh = {t: 0 for t in types}
    for (va, vb), n in sorted(c.items()):
        import math

        p = n / ra[va]
        rowh[va] += _ri(-p * math.log2(p) * _MKE_H_U, 0)
    rate_u = sum(
        _ri((pi[t] * 1.0 / _MKE_PI_U) * rowh[t], 0) for t in types
    )
    rows = [
        (
            t,
            _rp(pi[t] / _MKE_PI_U, 4) + 0.0,
            _rp(rowh[t] / _MKE_H_U, 4) + 0.0,
            _rp(rate_u / _MKE_H_U, 4) + 0.0,
        )
        for t in types
    ]
    return spark.createDataFrame(
        rows,
        "event_type string, stationary_pi double,"
        " row_entropy_bits double, entropy_rate_bits double",
    )
