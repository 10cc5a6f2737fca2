"""Survival analysis and classical time-series operators.

* ``survival_km_weekly`` — Kaplan-Meier curve of the inter-purchase
  interval: every consecutive order pair contributes an *event*
  duration (weeks until the next order); each customer's last order
  contributes a *right-censored* duration (still waiting at corpus
  end). THE survival-curve estimator (Kaplan & Meier 1958) — per-week
  at-risk counts, hazard factors 1 − d/n, and the cumulative-product
  survival curve S(w) = P(next order takes ≥ w weeks).
* ``holt_linear_forecast`` — Holt's linear-trend double exponential
  smoothing over monthly revenue (level+trend recursion, α=0.5,
  β=0.3) with a 3-month-ahead forecast. The sequential fold runs as
  ONE array fold over the calendar-bounded monthly series.
* ``seasonal_decompose_dow`` — classical additive decomposition of
  daily revenue: 7-day centered moving-average trend, day-of-week
  seasonal indices from the detrended series, residual RMSE.

Cross-engine determinism: every sequential recursion (KM cumulative
product, Holt level/trend) folds DECIMAL state with an explicit
round-to-fixed-scale after each step — both engines walk the same
ordered sequence of exact decimals, so the fold cannot drift
(CLAUDE.md gotchas 2/8); hazard factors and moving-average means snap
double divisions to decimals via the multiply-round-divide form
(gotcha 3) before they enter the fold.

100 TB posture: the corpus-wide work is ordinary groupBy aggregation
(per-customer min/max, per-day/month money sums) — one shuffle each.
Every window and fold after that runs over calendar- or
construction-bounded tables: ≤ ~350 duration-weeks, ≤ ~80 months,
≤ ~2,400 days. The partition-less windows are therefore bounded-input
by construction (census allowlist, tests/test_parity_utils.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from swat_mapreduce_spark.functions import rounding as R
from swat_mapreduce_spark.queries import register
from swat_mapreduce_spark.sources.readers import read_table

_MAX_WEEK = 52

_KM_ORACLE = f"""
WITH o AS (
    SELECT o_custkey, o_orderdate::DATE AS d,
           lead(o_orderdate::DATE) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate::DATE, o_orderkey) AS nd
    FROM orders
),
mx AS (SELECT max(o_orderdate::DATE) AS censor_d FROM orders),
de AS (
    SELECT (nd IS NOT NULL) AS ev,
           CAST(floor(CASE WHEN nd IS NOT NULL
                      THEN date_diff('day', d, nd)
                      ELSE date_diff('day', d, censor_d) END / 7)
                AS BIGINT) AS w
    FROM o, mx
),
wk AS (
    SELECT w,
           sum(CASE WHEN ev THEN 1 ELSE 0 END)::BIGINT AS d,
           sum(CASE WHEN ev THEN 0 ELSE 1 END)::BIGINT AS c
    FROM de GROUP BY 1
),
risk AS (
    SELECT w, d, c,
           sum(d + c) OVER (ORDER BY w
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)::BIGINT
               AS n_risk
    FROM wk
),
fct AS (
    SELECT w, d, c, n_risk,
           CAST(round((1.0 - d * 1.0 / n_risk) * 100000000) / 100000000
                AS DECIMAL(12,10)) AS f
    FROM risk WHERE d > 0
),
surv AS (
    SELECT w, d, c, n_risk,
           list_reduce(
               list_prepend(CAST(1 AS DECIMAL(12,10)),
                   list(f) OVER (ORDER BY w
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
               (acc, x) -> CAST(round(acc * x, 10) AS DECIMAL(12,10)))
               AS s
    FROM fct
)
SELECT w AS dur_week, n_risk, d AS n_churn, c AS n_censor,
       round(s::DOUBLE * 10000) / 10000 + 0.0 AS survival
FROM surv WHERE w <= {_MAX_WEEK}
"""


@register("survival_km_weekly", oracle=_KM_ORACLE)
def survival_km_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier over inter-purchase gaps: one per-customer lead
    window (partitioned — scales), then every remaining window runs
    over the ≤ ~350-row duration-week table (calendar-bounded — census
    allowlist). The survival cumulative product folds DECIMAL(12,10)
    hazard factors with a round-to-10dp after each multiply, exactly
    mirrored in the oracle's list_reduce."""
    dec = "decimal(12,10)"
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderdate").cast("date").alias("d"), "o_orderkey"
    )
    wc = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    gaps = o.withColumn("nd", F.lead("d").over(wc))
    mx = o.agg(F.max("d").alias("censor_d"))
    ev = F.col("nd").isNotNull()
    days = F.when(ev, F.datediff("nd", "d")).otherwise(
        F.datediff("censor_d", "d")
    )
    de = gaps.crossJoin(F.broadcast(mx)).select(
        ev.alias("ev"), F.floor(days / 7).alias("w")
    )
    wk = de.groupBy("w").agg(
        F.sum(F.when(F.col("ev"), 1).otherwise(0)).alias("d"),
        F.sum(F.when(F.col("ev"), 0).otherwise(1)).alias("c"),
    )
    # at-risk at week w = everyone whose duration reached w (events
    # and censored alike): suffix sum over the bounded week table
    w_fwd = Window.orderBy("w").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    risk = wk.withColumn("n_risk", F.sum(F.col("d") + F.col("c")).over(w_fwd))
    fct = risk.filter(F.col("d") > 0).withColumn(
        "f",
        R.r(
            F.lit(1.0) - F.col("d").cast("double") / F.col("n_risk").cast("double"),
            8,
        ).cast(dec),
    )
    w_cum = Window.orderBy("w").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    surv = fct.withColumn(
        "s",
        F.aggregate(
            F.collect_list("f").over(w_cum),
            F.lit(1).cast(dec),
            lambda acc, x: F.round(acc * x, 10).cast(dec),
        ),
    )
    return surv.filter(F.col("w") <= _MAX_WEEK).select(
        F.col("w").alias("dur_week"),
        "n_risk",
        F.col("d").alias("n_churn"),
        F.col("c").alias("n_censor"),
        R.r(F.col("s").cast("double"), 4).alias("survival"),
    )


# --- Holt linear-trend smoothing -------------------------------------------
# α=0.5 / β=0.3 as exact DECIMAL(2,1) literals; level/trend snapped to
# DECIMAL(20,6) after every step. DuckDB's list_reduce has no explicit
# init (v1.0), so each series element is encoded [y, 0] and the FIRST
# element doubles as the initial state [level=y1, trend=0]; Spark's
# F.aggregate folds elements 2..n over the same explicit init — the
# two engines walk identical decimal sequences.
_HOLT_ORACLE = """
WITH monthly AS (
    SELECT date_trunc('month', o_orderdate)::DATE AS m,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(30,8))), 2)::DOUBLE
                AS DECIMAL(20,6)) AS rev
    FROM orders GROUP BY 1
),
ser AS (
    SELECT list([rev, CAST(0 AS DECIMAL(20,6))] ORDER BY m) AS ys,
           max(m) AS last_m
    FROM monthly
),
st AS (
    SELECT last_m,
           list_reduce(ys, (acc, x) -> [
               CAST(round(CAST(0.5 AS DECIMAL(2,1)) * x[1]
                    + CAST(0.5 AS DECIMAL(2,1)) * (acc[1] + acc[2]), 6)
                    AS DECIMAL(20,6)),
               CAST(round(CAST(0.3 AS DECIMAL(2,1))
                    * (CAST(round(CAST(0.5 AS DECIMAL(2,1)) * x[1]
                         + CAST(0.5 AS DECIMAL(2,1)) * (acc[1] + acc[2]), 6)
                         AS DECIMAL(20,6)) - acc[1])
                    + CAST(0.7 AS DECIMAL(2,1)) * acc[2], 6)
                    AS DECIMAL(20,6))]) AS s
    FROM ser
)
SELECT h::BIGINT AS h,
       (last_m + to_months(h::INT))::DATE AS f_month,
       round((s[1] + h * s[2])::DOUBLE * 100) / 100 + 0.0
           AS forecast_revenue,
       round(s[1]::DOUBLE * 100) / 100 + 0.0 AS level,
       round(s[2]::DOUBLE * 100) / 100 + 0.0 AS trend
FROM st, (SELECT unnest(generate_series(1, 3)) AS h)
"""


@register("holt_linear_forecast", oracle=_HOLT_ORACLE)
def holt_linear_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt (1957) double exponential smoothing: the corpus-wide work
    is one monthly money-sum shuffle; the recursion folds the ≤ ~80
    calendar-bounded months in a single array fold (decimal state,
    per-step rounding — identical sequence to the oracle)."""
    dec = "decimal(20,6)"
    a = F.lit("0.5").cast("decimal(2,1)")
    b = F.lit("0.3").cast("decimal(2,1)")
    b1 = F.lit("0.7").cast("decimal(2,1)")
    o = read_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("m")
    ).agg(R.money_sum(F.col("o_totalprice")).cast(dec).alias("rev"))
    ser = monthly.agg(
        F.sort_array(F.collect_list(F.struct("m", "rev"))).alias("sm"),
        F.max("m").alias("last_m"),
    ).select(
        F.transform("sm", lambda s: s["rev"]).alias("ys"), "last_m"
    )

    def _level(acc, x):
        return F.round(a * x + a * (acc[0] + acc[1]), 6).cast(dec)

    def _merge(acc, x):
        lv = _level(acc, x)
        return F.array(
            lv, F.round(b * (lv - acc[0]) + b1 * acc[1], 6).cast(dec)
        )

    st = ser.select(
        "last_m",
        F.aggregate(
            F.slice(
                F.col("ys"), 2, F.greatest(F.lit(0), F.size("ys") - 1)
            ),
            F.array(
                F.element_at("ys", 1), F.lit(0).cast(dec)
            ),
            _merge,
        ).alias("s"),
    )
    hs = st.select(
        "last_m", "s", F.explode(F.sequence(F.lit(1), F.lit(3))).alias("h")
    )
    return hs.select(
        F.col("h").cast("long").alias("h"),
        F.add_months("last_m", F.col("h")).alias("f_month"),
        R.r(
            (F.element_at("s", 1) + F.col("h") * F.element_at("s", 2)).cast(
                "double"
            ),
            2,
        ).alias("forecast_revenue"),
        R.r(F.element_at("s", 1).cast("double"), 2).alias("level"),
        R.r(F.element_at("s", 2).cast("double"), 2).alias("trend"),
    )


# --- classical additive seasonal decomposition -----------------------------
_SEASONAL_ORACLE = """
WITH daily AS (
    SELECT o_orderdate::DATE AS day,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(30,8))), 2)::DOUBLE
                AS DECIMAL(20,6)) AS rev
    FROM orders GROUP BY 1
),
ma AS (
    SELECT day, rev,
           sum(rev) OVER w AS s7,
           count(*) OVER w AS n7
    FROM daily
    WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
detr AS (
    SELECT isodow(day)::BIGINT AS dow,
           rev - CAST(round(s7::DOUBLE / 7 * 1000000) / 1000000
                      AS DECIMAL(20,6)) AS dt
    FROM ma WHERE n7 = 7
),
sea AS (
    SELECT dow, count(*)::BIGINT AS n_days,
           CAST(round(sum(dt)::DOUBLE / count(*) * 1000000) / 1000000
                AS DECIMAL(20,6)) AS idx
    FROM detr GROUP BY 1
)
SELECT d.dow, s.n_days,
       round(s.idx::DOUBLE * 10000) / 10000 + 0.0 AS seasonal_index,
       round(sqrt(sum(CAST(round((d.dt - s.idx)::DOUBLE
                                 * (d.dt - s.idx)::DOUBLE)
                 AS DECIMAL(38,0)))::DOUBLE / s.n_days) * 100) / 100 + 0.0
           AS resid_rmse
FROM detr d JOIN sea s ON s.dow = d.dow
GROUP BY d.dow, s.n_days, s.idx
"""


@register("seasonal_decompose_dow", oracle=_SEASONAL_ORACLE)
def seasonal_decompose_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical decomposition: trend = 7-day centered moving average
    (full windows only), seasonal = per-ISO-dow mean of the detrended
    series, residual RMSE per dow. The MA window is partition-less but
    runs over the calendar-bounded per-day table (census allowlist);
    the 7-row seasonal table re-joins broadcast."""
    dec = "decimal(20,6)"
    o = read_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        R.money_sum(F.col("o_totalprice")).cast(dec).alias("rev")
    )
    w = Window.orderBy("day").rowsBetween(-3, 3)
    ma = daily.select(
        "day",
        "rev",
        F.sum("rev").over(w).alias("s7"),
        F.count(F.lit(1)).over(w).alias("n7"),
    )
    detr = ma.filter(F.col("n7") == 7).select(
        # isodow: Monday=1..Sunday=7 == Spark weekday()+1
        (F.weekday("day") + 1).cast("long").alias("dow"),
        (
            F.col("rev")
            - R.r(F.col("s7").cast("double") / 7, 6).cast(dec)
        ).alias("dt"),
    )
    sea = detr.groupBy("dow").agg(
        F.count(F.lit(1)).alias("n_days"),
        R.r(F.sum("dt").cast("double") / F.count(F.lit(1)), 6)
        .cast(dec)
        .alias("idx"),
    )
    resid = detr.join(F.broadcast(sea), "dow")
    # residuals are exact decimals on both engines, so their double
    # casts are bit-identical; square in double, snap to an integer
    # decimal, and sum exactly — immune to both accumulation order
    # (gotcha 2) and DuckDB's int64 decimal-multiply overflow
    rd = (F.col("dt") - F.col("idx")).cast("double")
    sq = R.r(rd * rd, 0).cast("decimal(38,0)")
    return resid.groupBy("dow", "n_days", "idx").agg(
        R.r(
            F.sqrt(F.sum(sq).cast("double") / F.col("n_days")),
            2,
        ).alias("resid_rmse")
    ).select(
        "dow",
        "n_days",
        R.r(F.col("idx").cast("double"), 4).alias("seasonal_index"),
        "resid_rmse",
    )


# --- CUSUM mean-shift changepoint -------------------------------------------
# Page's cumulative-sum statistic over daily revenue: S_t = Σ_{i<=t}
# (x_i − x̄); the |S| maximum marks the most likely single mean-shift
# point. Every sum is decimal-exact (the mean snaps to DECIMAL(20,6)
# once, so each term is exact on both engines); the argmax is a
# TakeOrdered(1) on (|S| desc, day asc). The cumulative window is
# partition-less but calendar-bounded (census allowlist).
_CUSUM_ORACLE = """
WITH daily AS (
    SELECT o_orderdate::DATE AS day,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(30,8))), 2)::DOUBLE
                AS DECIMAL(20,6)) AS rev
    FROM orders GROUP BY 1
),
m AS (
    SELECT CAST(round(sum(rev)::DOUBLE / count(*) * 1000000) / 1000000
                AS DECIMAL(20,6)) AS mu,
           count(*)::BIGINT AS n
    FROM daily
),
cs AS (
    SELECT day,
           sum(rev - m.mu) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
    FROM daily, m
)
SELECT cs.day AS changepoint_day,
       round(abs(cs.s)::DOUBLE * 100) / 100 + 0.0 AS cusum_abs,
       m.n AS n_days,
       round(m.mu::DOUBLE * 100) / 100 + 0.0 AS mean_daily
FROM cs, m
ORDER BY abs(cs.s) DESC, cs.day
LIMIT 1
"""


@register("cusum_changepoint_daily", oracle=_CUSUM_ORACLE)
def cusum_changepoint_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    dec = "decimal(20,6)"
    o = read_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        R.money_sum(F.col("o_totalprice")).cast(dec).alias("rev")
    )
    m = daily.agg(
        R.r(F.sum("rev").cast("double") / F.count(F.lit(1)), 6)
        .cast(dec)
        .alias("mu"),
        F.count(F.lit(1)).alias("n"),
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cs = daily.crossJoin(F.broadcast(m)).select(
        "day",
        "n",
        "mu",
        F.sum(F.col("rev") - F.col("mu")).over(w).alias("s"),
    )
    return (
        cs.orderBy(F.abs(F.col("s")).desc(), F.asc("day"))
        .limit(1)
        .select(
            F.col("day").alias("changepoint_day"),
            R.r(F.abs(F.col("s")).cast("double"), 2).alias("cusum_abs"),
            F.col("n").alias("n_days"),
            R.r(F.col("mu").cast("double"), 2).alias("mean_daily"),
        )
    )


# --- seasonal-residual outliers ----------------------------------------------
# The alerting output of seasonal_decompose_dow: after removing the
# 7-day MA trend AND the day-of-week index, which days still deviate
# most? Top-5 by |residual| (TakeOrdered — non-vacuous and bounded at
# every scale factor, unlike a fixed z threshold). Residuals are exact
# decimals end-to-end; the ordering key is the decimal |residual|
# with the day as tie-break.
_SEA_OUT_ORACLE = """
WITH daily AS (
    SELECT o_orderdate::DATE AS day,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(30,8))), 2)::DOUBLE
                AS DECIMAL(20,6)) AS rev
    FROM orders GROUP BY 1
),
ma AS (
    SELECT day, rev,
           sum(rev) OVER w AS s7, count(*) OVER w AS n7
    FROM daily
    WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
detr AS (
    SELECT day, isodow(day)::BIGINT AS dow, rev,
           rev - CAST(round(s7::DOUBLE / 7 * 1000000) / 1000000
                      AS DECIMAL(20,6)) AS dt
    FROM ma WHERE n7 = 7
),
sea AS (
    SELECT dow,
           CAST(round(sum(dt)::DOUBLE / count(*) * 1000000) / 1000000
                AS DECIMAL(20,6)) AS idx
    FROM detr GROUP BY 1
)
SELECT d.day, d.dow,
       round(d.rev::DOUBLE * 100) / 100 + 0.0 AS revenue,
       round((d.dt - s.idx)::DOUBLE * 100) / 100 + 0.0 AS residual
FROM detr d JOIN sea s USING (dow)
ORDER BY abs(d.dt - s.idx) DESC, d.day
LIMIT 5
"""


@register("seasonal_residual_outliers", oracle=_SEA_OUT_ORACLE)
def seasonal_residual_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    dec = "decimal(20,6)"
    o = read_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        R.money_sum(F.col("o_totalprice")).cast(dec).alias("rev")
    )
    w = Window.orderBy("day").rowsBetween(-3, 3)
    ma = daily.select(
        "day",
        "rev",
        F.sum("rev").over(w).alias("s7"),
        F.count(F.lit(1)).over(w).alias("n7"),
    )
    detr = ma.filter(F.col("n7") == 7).select(
        "day",
        (F.weekday("day") + 1).cast("long").alias("dow"),
        "rev",
        (
            F.col("rev") - R.r(F.col("s7").cast("double") / 7, 6).cast(dec)
        ).alias("dt"),
    )
    sea = detr.groupBy("dow").agg(
        R.r(F.sum("dt").cast("double") / F.count(F.lit(1)), 6)
        .cast(dec)
        .alias("idx")
    )
    resid = detr.join(F.broadcast(sea), "dow").select(
        "day",
        "dow",
        "rev",
        (F.col("dt") - F.col("idx")).alias("res"),
    )
    return (
        resid.orderBy(F.abs(F.col("res")).desc(), F.asc("day"))
        .limit(5)
        .select(
            "day",
            "dow",
            R.r(F.col("rev").cast("double"), 2).alias("revenue"),
            R.r(F.col("res").cast("double"), 2).alias("residual"),
        )
    )


# --- Holt-Winters additive seasonal smoothing (DOW cycle) -----------------------
# Triple exponential smoothing (Winters 1960) over daily revenue with
# a 7-day additive season — the forecasting upgrade of
# holt_linear_forecast for series with day-of-week structure. State =
# [level, trend, s_next..s_last] (9 decimals; the seasonal queue
# rotates one slot per step). Division-free init keeps every state
# decimal EXACT from day one: l0 = y7, b0 = 0, s_i = y_i − l0 over
# the first week; the fold then walks days 8..N with α=0.5, β=0.3,
# γ=0.4 (exact DECIMAL(2,1) literals), each component rounded to
# 6dp after every step — both engines walk identical decimal
# sequences (the holt_linear pattern). Forecast h=1..7 reads the
# rotated seasonal queue directly. Scale: one daily money-sum
# shuffle; the fold runs over the ≤ ~30-day calendar-bounded array.
_HW_ORACLE = """
WITH daily AS (
    SELECT o_orderdate::DATE AS day,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(30,8))), 2)::DOUBLE
                AS DECIMAL(20,6)) AS rev
    FROM orders GROUP BY 1
),
ser AS (
    SELECT list(rev ORDER BY day) AS ys, max(day) AS last_d,
           count(*)::BIGINT AS n
    FROM daily
),
init AS (
    SELECT ys, last_d, n,
           list_concat(
               [ys[7], CAST(0 AS DECIMAL(20,6))],
               list_transform(ys[1:7], y -> CAST(round(y - ys[7], 6)
                                                 AS DECIMAL(20,6)))) AS st0
    FROM ser
),
fin AS (
    -- DuckDB 1.0 list_reduce has no init arg: the fold list carries
    -- 9-element lists, with st0 as the first element and each later
    -- y encoded [y, 0×8] (the holt_linear [y, 0] trick generalized)
    SELECT last_d, n,
           list_reduce(list_prepend(st0,
               list_transform(ys[8:], v -> list_concat([v],
                   list_transform(generate_series(1, 8),
                                  z -> CAST(0 AS DECIMAL(20,6)))))),
               (acc, x) -> list_concat(
               [CAST(round(CAST(0.5 AS DECIMAL(2,1)) * (x[1] - acc[3])
                     + CAST(0.5 AS DECIMAL(2,1)) * (acc[1] + acc[2]), 6)
                     AS DECIMAL(20,6)),
                CAST(round(CAST(0.3 AS DECIMAL(2,1))
                     * (CAST(round(CAST(0.5 AS DECIMAL(2,1)) * (x[1] - acc[3])
                          + CAST(0.5 AS DECIMAL(2,1)) * (acc[1] + acc[2]),
                          6) AS DECIMAL(20,6)) - acc[1])
                     + CAST(0.7 AS DECIMAL(2,1)) * acc[2], 6)
                     AS DECIMAL(20,6))],
               list_concat(acc[4:9],
               [CAST(round(CAST(0.4 AS DECIMAL(2,1))
                     * (x[1] - CAST(round(CAST(0.5 AS DECIMAL(2,1))
                          * (x[1] - acc[3])
                          + CAST(0.5 AS DECIMAL(2,1)) * (acc[1] + acc[2]),
                          6) AS DECIMAL(20,6)))
                     + CAST(0.6 AS DECIMAL(2,1)) * acc[3], 6)
                     AS DECIMAL(20,6))]))) AS s
    FROM init
)
SELECT h::BIGINT AS h, (last_d + to_days(h::INT))::DATE AS f_day,
       round((s[1] + h * s[2] + s[2 + h])::DOUBLE * 100) / 100 + 0.0
           AS forecast_revenue,
       round(s[1]::DOUBLE * 100) / 100 + 0.0 AS level,
       round(s[2]::DOUBLE * 100) / 100 + 0.0 AS trend,
       round(s[2 + h]::DOUBLE * 100) / 100 + 0.0 AS seasonal
FROM fin, (SELECT unnest(generate_series(1, 7)) AS h)
"""


@register("holt_winters_dow_forecast", oracle=_HW_ORACLE)
def holt_winters_dow_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    dec = "decimal(20,6)"
    al = F.lit("0.5").cast("decimal(2,1)")
    al1 = F.lit("0.5").cast("decimal(2,1)")
    be = F.lit("0.3").cast("decimal(2,1)")
    be1 = F.lit("0.7").cast("decimal(2,1)")
    ga = F.lit("0.4").cast("decimal(2,1)")
    ga1 = F.lit("0.6").cast("decimal(2,1)")
    o = read_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(R.money_sum(F.col("o_totalprice")).cast(dec).alias("rev"))
    ser = daily.agg(
        F.sort_array(F.collect_list(F.struct("day", "rev"))).alias("sd"),
        F.max("day").alias("last_d"),
        F.count(F.lit(1)).alias("n"),
    ).select(
        F.transform("sd", lambda s: s["rev"]).alias("ys"), "last_d", "n"
    )
    y7 = F.element_at("ys", 7)
    init = ser.select(
        "ys",
        "last_d",
        "n",
        F.concat(
            F.array(y7, F.lit(0).cast(dec)),
            F.transform(
                F.slice("ys", 1, 7),
                lambda y: F.round(y - y7, 6).cast(dec),
            ),
        ).alias("st0"),
    )

    def _lvl(acc, y):
        return F.round(
            al * (y - F.element_at(acc, 3))
            + al1 * (F.element_at(acc, 1) + F.element_at(acc, 2)),
            6,
        ).cast(dec)

    def _step(acc, y):
        lv = _lvl(acc, y)
        tr = F.round(
            be * (lv - F.element_at(acc, 1)) + be1 * F.element_at(acc, 2),
            6,
        ).cast(dec)
        sn = F.round(
            ga * (y - lv) + ga1 * F.element_at(acc, 3), 6
        ).cast(dec)
        return F.concat(F.array(lv, tr), F.slice(acc, 4, 6), F.array(sn))

    fin = init.select(
        "last_d",
        "n",
        F.aggregate(
            F.slice(
                F.col("ys"), 8, F.greatest(F.lit(0), F.size("ys") - 7)
            ),
            F.col("st0"),
            _step,
        ).alias("s"),
    )
    hs = fin.select(
        "last_d", "s", F.explode(F.sequence(F.lit(1), F.lit(7))).alias("h")
    )
    sh = F.element_at("s", F.col("h").cast("int") + 2)
    return hs.select(
        F.col("h").cast("long").alias("h"),
        F.date_add("last_d", F.col("h").cast("int")).alias("f_day"),
        R.r(
            (
                F.element_at("s", 1)
                + F.col("h") * F.element_at("s", 2)
                + sh
            ).cast("double"),
            2,
        ).alias("forecast_revenue"),
        R.r(F.element_at("s", 1).cast("double"), 2).alias("level"),
        R.r(F.element_at("s", 2).cast("double"), 2).alias("trend"),
        R.r(sh.cast("double"), 2).alias("seasonal"),
    )


# --- 1-D Kalman filter (local-level model) over daily revenue -------------------
# The state-space smoothing primitive (Kalman 1960) next to the
# EWMA/Holt family: local-level model x_t = x_{t-1} + w (Q), y_t =
# x_t + v (R), filtered over the calendar-bounded daily revenue
# series. ALL state is INTEGER: x in exact cents, P/Q/R in exact
# cents² int64 (never decimal→double casts — gotcha 13a's fragile
# construct); R derives from the series itself (round((Σy/n/5)²) —
# one exact-int-derived IEEE expression), Q = R div 10. Per step the
# gain K = round(P'·1e6/(P'+R)) is an integer 1e-6 unit from an
# exact-int division, and the updates round once each:
# x += round((K/1e6)·(y−x)), P = round(((1e6−K)/1e6)·P') — identical
# IEEE sequences on both engines. The fold walks the ≤ ~30-day array;
# corpus work is one daily money-sum shuffle.
_KALMAN_ORACLE = """
WITH daily AS (
    SELECT o_orderdate::DATE AS day,
           sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS y
    FROM orders GROUP BY 1
),
ser AS (
    SELECT list(y ORDER BY day) AS ys, list(day ORDER BY day) AS ds,
           count(*)::BIGINT AS n, sum(y)::BIGINT AS sy
    FROM daily
),
prm AS (
    SELECT ys, ds, n,
           CAST(round((sy::DOUBLE / n / 5) * (sy::DOUBLE / n / 5))
                AS BIGINT) AS r,
           CAST(round((sy::DOUBLE / n / 5) * (sy::DOUBLE / n / 5))
                AS BIGINT) // 10 AS q
    FROM ser
),
walk AS (
    -- fold state [x, P, K_last]; each y encoded [y, 0, 0]
    SELECT ds, n, r, q,
           list_reduce(
               list_prepend([ys[1], r, CAST(0 AS BIGINT)],
                   list_transform(ys[2:], v -> [v, CAST(0 AS BIGINT),
                                                CAST(0 AS BIGINT)])),
               (acc, e) -> [
                   acc[1] + CAST(round(
                       (CAST(round((acc[2] + q) * 1000000.0
                                   / (acc[2] + q + r)) AS BIGINT)
                        / 1000000.0) * (e[1] - acc[1])) AS BIGINT),
                   CAST(round(((1000000 - CAST(round((acc[2] + q)
                        * 1000000.0 / (acc[2] + q + r)) AS BIGINT))
                        / 1000000.0) * (acc[2] + q)) AS BIGINT),
                   CAST(round((acc[2] + q) * 1000000.0
                              / (acc[2] + q + r)) AS BIGINT)]) AS st
    FROM prm
)
SELECT n AS n_days, ds[CAST(n AS INT)] AS last_day,
       round(st[1] / 100.0 * 100) / 100 + 0.0 AS filtered_level,
       round(st[2] / 100.0 / 100.0 * 100) / 100 + 0.0 AS error_var_dollars2,
       round(st[3] / 1000000.0 * 10000) / 10000 + 0.0 AS last_gain,
       round(r / 100.0 / 100.0 * 100) / 100 + 0.0 AS obs_var_dollars2
FROM walk
"""


@register("kalman_filter_daily", oracle=_KALMAN_ORACLE)
def kalman_filter_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("y")
    )
    ser = daily.agg(
        F.sort_array(F.collect_list(F.struct("day", "y"))).alias("sd"),
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.max("day").alias("last_day"),
    ).select(
        F.transform("sd", lambda s: s["y"]).alias("ys"),
        "n",
        "sy",
        "last_day",
    )
    rd = F.col("sy").cast("double") / F.col("n") / F.lit(5)
    prm = ser.select(
        "ys",
        "n",
        "last_day",
        F.round(rd * rd).cast("long").alias("r"),
        (F.round(rd * rd).cast("long") / F.lit(10))
        .cast("long")
        .alias("q"),
    )

    def _gain(acc):
        # K_u = round((P'+0)·1e6 / (P'+R)) with P' = P + Q
        return F.round(
            (F.element_at(acc, 2) + F.col("q"))
            * F.lit(1e6)
            / (F.element_at(acc, 2) + F.col("q") + F.col("r"))
        ).cast("long")

    def _step(acc, e):
        k = _gain(acc)
        x = F.element_at(acc, 1) + F.round(
            (k / F.lit(1e6)) * (F.element_at(e, 1) - F.element_at(acc, 1))
        ).cast("long")
        p = F.round(
            ((F.lit(1000000) - k) / F.lit(1e6))
            * (F.element_at(acc, 2) + F.col("q"))
        ).cast("long")
        return F.array(x, p, k)

    walk = prm.select(
        "n",
        "last_day",
        "r",
        F.aggregate(
            F.transform(
                F.slice("ys", 2, F.greatest(F.lit(0), F.size("ys") - 1)),
                lambda v: F.array(
                    v, F.lit(0).cast("long"), F.lit(0).cast("long")
                ),
            ),
            F.array(
                F.element_at("ys", 1), F.col("r"), F.lit(0).cast("long")
            ),
            _step,
        ).alias("st"),
    )
    hundredth = F.lit(100.0)
    return walk.select(
        F.col("n").cast("long").alias("n_days"),
        "last_day",
        (
            F.round(F.element_at("st", 1) / hundredth * 100) / 100
            + F.lit(0.0)
        ).alias("filtered_level"),
        (
            F.round(
                F.element_at("st", 2) / hundredth / hundredth * 100
            )
            / 100
            + F.lit(0.0)
        ).alias("error_var_dollars2"),
        (
            F.round(F.element_at("st", 3) / F.lit(1e6) * 10000) / 10000
            + F.lit(0.0)
        ).alias("last_gain"),
        (
            F.round(F.col("r") / hundredth / hundredth * 100) / 100
            + F.lit(0.0)
        ).alias("obs_var_dollars2"),
    )


# --- Fano-factor burstiness of per-user arrivals ---------------------------------
# Index of dispersion F = var/mean of each user's DAILY event counts
# (zero-filled over the observed calendar span) — the burstiness
# monitor separating Poisson-like users (F ≈ 1) from bursty ones
# (F > 1). EXACT moments: with d calendar days, per-user Σx and Σx²
# over NONZERO days are exact ints and the zero days contribute
# nothing, so var·d² = d·Σx² − (Σx)² is an exact integer — the Fano
# classification (F > 1 ⟺ d·(d·Σx² − (Σx)²) > (d−1)·d·Σx) compares
# exact int64 products, no floats in the decision. One corpus
# groupBy(user, day) pass, one per-user rollup, bounded summary.
_FANO_ORACLE = """
WITH span AS (
    SELECT (date_diff('day', min(ts::DATE), max(ts::DATE)) + 1)::BIGINT
        AS d
    FROM events
),
ud AS (
    SELECT user_id, ts::DATE AS day, count(*)::BIGINT AS x
    FROM events GROUP BY 1, 2
),
u AS (
    SELECT user_id, sum(x)::BIGINT AS sx,
           sum(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
           count(*)::BIGINT AS n_active_days
    FROM ud GROUP BY 1
),
f AS (
    SELECT u.user_id, u.sx, u.n_active_days, span.d,
           (span.d * u.sxx - CAST(u.sx AS DECIMAL(38,0)) * u.sx) AS vnum,
           -- F > 1  <=>  d*(d*sxx - sx^2) > (d-1)*d*sx
           (span.d * (span.d * u.sxx - CAST(u.sx AS DECIMAL(38,0)) * u.sx)
            > (span.d - 1) * span.d * CAST(u.sx AS DECIMAL(38,0)))
               AS bursty
    FROM u, span
)
SELECT count(*)::BIGINT AS n_users,
       any_value(d)::BIGINT AS n_days,
       sum(CASE WHEN bursty THEN 1 ELSE 0 END)::BIGINT AS n_bursty,
       round(sum(CASE WHEN bursty THEN 1 ELSE 0 END) * 10000.0
             / count(*)) / 10000 + 0.0 AS bursty_share,
       round(sum(CAST(round(vnum::DOUBLE / (d - 1) / d
                 / (sx * 1.0 / d) * 1000000) AS BIGINT)) * 1.0
             / count(*) / 1000000 * 10000) / 10000 + 0.0 AS mean_fano
FROM f
"""


@register("fano_burstiness_users", oracle=_FANO_ORACLE)
def fano_burstiness_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    span = ev.agg(
        (
            F.datediff(
                F.max(F.col("ts").cast("date")),
                F.min(F.col("ts").cast("date")),
            )
            + 1
        )
        .cast("long")
        .alias("d")
    )
    ud = ev.groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    u = ud.groupBy("user_id").agg(
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
        F.count(F.lit(1)).cast("long").alias("n_active_days"),
    )
    f = u.crossJoin(F.broadcast(span)).select(
        "sx",
        "d",
        (
            F.col("d") * F.col("sxx")
            - F.col("sx").cast("decimal(38,0)") * F.col("sx")
        ).alias("vnum"),
        (
            F.col("d")
            * (
                F.col("d") * F.col("sxx")
                - F.col("sx").cast("decimal(38,0)") * F.col("sx")
            )
            > (F.col("d") - 1)
            * F.col("d")
            * F.col("sx").cast("decimal(38,0)")
        ).alias("bursty"),
    )
    fano_u = F.round(
        F.col("vnum").cast("double")
        / (F.col("d") - 1)
        / F.col("d")
        / (F.col("sx") * F.lit(1.0) / F.col("d"))
        * F.lit(1000000)
    ).cast("long")
    return f.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.first("d").alias("n_days"),
        F.sum(F.when(F.col("bursty"), 1).otherwise(0))
        .cast("long")
        .alias("n_bursty"),
        (
            F.round(
                F.sum(F.when(F.col("bursty"), 1).otherwise(0))
                * F.lit(10000.0)
                / F.count(F.lit(1))
            )
            / 10000
            + F.lit(0.0)
        ).alias("bursty_share"),
        (
            F.round(
                F.sum(fano_u)
                * F.lit(1.0)
                / F.count(F.lit(1))
                / F.lit(1000000)
                * 10000
            )
            / 10000
            + F.lit(0.0)
        ).alias("mean_fano"),
    )


# --- Page-Hinkley drift detection over daily mean value --------------------------
# Page (1954) / Hinkley's sequential mean-shift detector — the
# streaming-drift test a training pipeline runs on a quality metric:
# m_T = Σ_t (x_t − x̄_t − δ) with running mean x̄_t, alarm when
# m_T − min_{t≤T} m_t > λ (δ=0.05, λ=2.0 dollars). Every increment is
# an exact-int-derived double (daily cents/count cumulatives) snapped
# to an integer 1e-4-dollar unit BEFORE the cumulative sum, so m_t,
# the running minimum, and the alarm comparison are exact int64
# arithmetic on both engines. Scale: one corpus scan to the
# calendar-bounded day table; the cumulatives are allowlisted
# bounded-input windows (sprt/cusum pattern).
_PH_DELTA = 0.05  # drift insensitivity (dollars)
_PH_LAMBDA_U = 20_000  # alarm threshold: 2.0 dollars in 1e-4 units
_PH_U = 10_000

_PH_ORACLE = f"""
WITH d AS (
    SELECT ts::DATE AS day, count(*)::BIGINT AS n,
           sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS c
    FROM events GROUP BY 1
),
cumd AS (
    SELECT day, n, c,
           sum(n) OVER w::BIGINT AS nn, sum(c) OVER w::BIGINT AS cc
    FROM d
    WINDOW w AS (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
inc AS (
    SELECT day, n, c, nn, cc,
           CAST(round((c::DOUBLE / (100.0 * n)
                       - cc::DOUBLE / (100.0 * nn)
                       - {_PH_DELTA}) * {_PH_U}) AS BIGINT) AS inc_u
    FROM cumd
),
m AS (
    SELECT day, n, c, inc_u,
           sum(inc_u) OVER w::BIGINT AS m_u
    FROM inc
    WINDOW w AS (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
mm AS (
    SELECT day, n, c, m_u,
           min(m_u) OVER w::BIGINT AS min_u
    FROM m
    WINDOW w AS (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT day,
       round(c::DOUBLE / (100.0 * n) * 10000) / 10000 + 0.0
           AS mean_value,
       round(m_u * 1.0 / {_PH_U} * 10000) / 10000 + 0.0 AS ph_m,
       round((m_u - min_u) * 1.0 / {_PH_U} * 10000) / 10000 + 0.0
           AS ph_gap,
       (m_u - min_u) > {_PH_LAMBDA_U} AS drift_alarm
FROM mm
"""


@register("page_hinkley_drift_daily", oracle=_PH_ORACLE)
def page_hinkley_drift_daily(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = (
        read_table(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("c"),
        )
    )
    wcum = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cumd = d.select(
        "day",
        "n",
        "c",
        F.sum("n").over(wcum).cast("long").alias("nn"),
        F.sum("c").over(wcum).cast("long").alias("cc"),
    )
    inc = cumd.withColumn(
        "inc_u",
        F.round(
            (
                F.col("c").cast("double") / (F.lit(100.0) * F.col("n"))
                - F.col("cc").cast("double")
                / (F.lit(100.0) * F.col("nn"))
                - F.lit(_PH_DELTA)
            )
            * F.lit(_PH_U)
        ).cast("long"),
    )
    m = inc.withColumn("m_u", F.sum("inc_u").over(wcum).cast("long"))
    mm = m.withColumn("min_u", F.min("m_u").over(wcum).cast("long"))
    return mm.select(
        "day",
        R.r(
            F.col("c").cast("double") / (F.lit(100.0) * F.col("n")), 4
        ).alias("mean_value"),
        R.r(F.col("m_u") * F.lit(1.0) / _PH_U, 4).alias("ph_m"),
        R.r(
            (F.col("m_u") - F.col("min_u")) * F.lit(1.0) / _PH_U, 4
        ).alias("ph_gap"),
        ((F.col("m_u") - F.col("min_u")) > F.lit(_PH_LAMBDA_U)).alias(
            "drift_alarm"
        ),
    )


# --- Hurst exponent via rescaled-range (R/S) analysis ----------------------------
# Hurst (1951) / Mandelbrot R/S — the long-range-dependence exponent
# of the daily value series (H≈0.5 random walk, H>0.5 persistent):
# for window sizes n ∈ {5, 10, 15} the 30-day series splits into
# exact full blocks; each block's range R comes from within-block
# cumulative deviations kept as EXACT integers in cents·n units
# (W_k = n·ΣC_k − k·S, so no rational mean ever enters the running
# max/min) and S is the population std from exact cents moments.
# Each block's R/S snaps to a 1e-6-unit integer, each window's
# log2(mean R/S) snaps to a 1e-6-unit integer (the MI/jsd log-grid
# margin), and H is the OLS slope over the 3 (log2 n, log2 R/S)
# points in PURE int64 arithmetic (3·Σxy − Σx·Σy)/(3·Σx² − (Σx)²) —
# the log2(n) abscissas are Python-computed integer literals embedded
# in both engines. Scale: one corpus scan to the calendar-bounded day
# table; all block windows are PARTITIONED by (n, block).
import math as _hmath

_HURST_NS = (5, 10, 15)
_HURST_U = 1_000_000
_HURST_X_U = {n: round(_hmath.log2(n) * 1_000_000) for n in _HURST_NS}

_HURST_ORACLE = f"""
WITH d AS (
    SELECT ts::DATE AS day,
           sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS c
    FROM events GROUP BY 1
),
idx AS (
    SELECT day, c,
           (day - (SELECT min(day) FROM d) + 1)::BIGINT AS i
    FROM d
),
rows_n AS (
    SELECT n.n, idx.i, idx.c,
           CAST(floor((idx.i - 1) / n.n::DOUBLE) AS BIGINT) AS blk,
           ((idx.i - 1) % n.n + 1)::BIGINT AS pos
    FROM idx CROSS JOIN (VALUES (5), (10), (15)) AS n(n)
),
cum AS (
    SELECT n, blk, pos, c,
           sum(c) OVER (PARTITION BY n, blk ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW)::BIGINT AS cc
    FROM rows_n
),
bt AS (
    SELECT n, blk, sum(c)::BIGINT AS s,
           sum(CAST(c AS DECIMAL(38,0)) * c) AS ss
    FROM rows_n GROUP BY 1, 2
),
w AS (
    SELECT cum.n, cum.blk,
           max(cum.n * cum.cc - cum.pos * bt.s)::BIGINT AS maxw,
           min(cum.n * cum.cc - cum.pos * bt.s)::BIGINT AS minw
    FROM cum JOIN bt ON bt.n = cum.n AND bt.blk = cum.blk
    GROUP BY 1, 2
),
rs AS (
    SELECT w.n, w.blk,
           CAST(round(((w.maxw - w.minw)::DOUBLE / w.n)
                / sqrt((bt.ss::DOUBLE - (bt.s::DOUBLE * bt.s) / w.n)
                       / w.n) * {_HURST_U}) AS BIGINT) AS rs_u
    FROM w JOIN bt ON bt.n = w.n AND bt.blk = w.blk
),
pern AS (
    SELECT n, count(*)::BIGINT AS nb, sum(rs_u)::BIGINT AS num,
           CAST(round(log2(sum(rs_u)::DOUBLE / (count(*) * {_HURST_U}.0))
                      * {_HURST_U}) AS BIGINT) AS y_u,
           (CASE n WHEN 5 THEN {_HURST_X_U[5]}
                   WHEN 10 THEN {_HURST_X_U[10]}
                   ELSE {_HURST_X_U[15]} END)::BIGINT AS x_u
    FROM rs GROUP BY 1
),
slope AS (
    SELECT (3 * sum(x_u * y_u) - sum(x_u) * sum(y_u))::BIGINT AS num,
           (3 * sum(x_u * x_u) - sum(x_u) * sum(x_u))::BIGINT AS den
    FROM pern
)
SELECT pern.n AS n_window, pern.nb AS n_blocks,
       round(pern.num::DOUBLE / (pern.nb * {_HURST_U}.0) * 10000)
           / 10000 + 0.0 AS mean_rs,
       round(pern.y_u * 1.0 / {_HURST_U} * 1000000) / 1000000 + 0.0
           AS log2_rs,
       round(slope.num::DOUBLE / slope.den * 1000000) / 1000000 + 0.0
           AS hurst_h
FROM pern, slope
"""


@register("hurst_exponent_rs", oracle=_HURST_ORACLE)
def hurst_exponent_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        read_table(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("c")
        )
    )
    mn = d.agg(F.min("day").alias("d0"))
    idx = d.crossJoin(F.broadcast(mn)).select(
        "c", (F.datediff(F.col("day"), F.col("d0")) + 1).alias("i")
    )
    ns = spark.createDataFrame([(n,) for n in _HURST_NS], "n long")
    rows_n = idx.crossJoin(F.broadcast(ns)).select(
        "n",
        "c",
        F.floor((F.col("i") - 1) / F.col("n").cast("double"))
        .cast("long")
        .alias("blk"),
        ((F.col("i") - 1) % F.col("n") + 1).cast("long").alias("pos"),
    )
    wb = Window.partitionBy("n", "blk").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = rows_n.withColumn("cc", F.sum("c").over(wb).cast("long"))
    bt = rows_n.groupBy("n", "blk").agg(
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c")).alias("ss"),
    )
    wdev = F.col("n") * F.col("cc") - F.col("pos") * F.col("s")
    w = (
        cum.join(bt, ["n", "blk"])
        .groupBy("n", "blk")
        .agg(
            F.max(wdev).cast("long").alias("maxw"),
            F.min(wdev).cast("long").alias("minw"),
        )
    )
    rs = w.join(bt, ["n", "blk"]).select(
        "n",
        F.round(
            (
                (F.col("maxw") - F.col("minw")).cast("double")
                / F.col("n")
            )
            / F.sqrt(
                (
                    F.col("ss").cast("double")
                    - (F.col("s").cast("double") * F.col("s"))
                    / F.col("n")
                )
                / F.col("n")
            )
            * F.lit(_HURST_U)
        )
        .cast("long")
        .alias("rs_u"),
    )
    xmap = F.create_map(
        *[
            c
            for n in _HURST_NS
            for c in (F.lit(n), F.lit(_HURST_X_U[n]))
        ]
    )
    pern = rs.groupBy("n").agg(
        F.count(F.lit(1)).cast("long").alias("nb"),
        F.sum("rs_u").cast("long").alias("num"),
    ).select(
        "n",
        "nb",
        "num",
        F.round(
            F.log2(
                F.col("num").cast("double")
                / (F.col("nb") * F.lit(float(_HURST_U)))
            )
            * F.lit(_HURST_U)
        )
        .cast("long")
        .alias("y_u"),
        xmap[F.col("n")].cast("long").alias("x_u"),
    )
    slope = pern.agg(
        (
            3 * F.sum(F.col("x_u") * F.col("y_u"))
            - F.sum("x_u") * F.sum("y_u")
        )
        .cast("long")
        .alias("snum"),
        (
            3 * F.sum(F.col("x_u") * F.col("x_u"))
            - F.sum("x_u") * F.sum("x_u")
        )
        .cast("long")
        .alias("sden"),
    )
    return pern.crossJoin(F.broadcast(slope)).select(
        F.col("n").alias("n_window"),
        F.col("nb").alias("n_blocks"),
        R.r(
            F.col("num").cast("double")
            / (F.col("nb") * F.lit(float(_HURST_U))),
            4,
        ).alias("mean_rs"),
        R.r(F.col("y_u") * F.lit(1.0) / _HURST_U, 6).alias("log2_rs"),
        R.r(
            F.col("snum").cast("double") / F.col("sden"), 6
        ).alias("hurst_h"),
    )


# --- Nelson-Aalen cumulative hazard -------------------------------------------
# The hazard-scale companion to survival_km_weekly over the same
# inter-purchase durations: H(w) = Σ_{w'<=w, d>0} d/n_risk. Each
# increment is an exact integer ratio snapped to 1e-8 units; the
# cumulative sum is an exact int64 prefix sum over the bounded
# duration-week table (same census-allowlisted window family as KM).

_NA_ORACLE = f"""
WITH o AS (
    SELECT o_custkey, o_orderdate::DATE AS d,
           lead(o_orderdate::DATE) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate::DATE, o_orderkey) AS nd
    FROM orders
),
mx AS (SELECT max(o_orderdate::DATE) AS censor_d FROM orders),
de AS (
    SELECT (nd IS NOT NULL) AS ev,
           CAST(floor(CASE WHEN nd IS NOT NULL
                      THEN date_diff('day', d, nd)
                      ELSE date_diff('day', d, censor_d) END / 7)
                AS BIGINT) AS w
    FROM o, mx
),
wk AS (
    SELECT w,
           sum(CASE WHEN ev THEN 1 ELSE 0 END)::BIGINT AS d,
           sum(CASE WHEN ev THEN 0 ELSE 1 END)::BIGINT AS c
    FROM de GROUP BY 1
),
risk AS (
    SELECT w, d, c,
           sum(d + c) OVER (ORDER BY w
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)::BIGINT
               AS n_risk
    FROM wk
),
inc AS (
    SELECT w, d, n_risk,
           CAST(round(d * 100000000.0 / n_risk) AS BIGINT) AS h_u
    FROM risk WHERE d > 0
),
cum AS (
    SELECT w, d, n_risk, h_u,
           sum(h_u) OVER (ORDER BY w
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
               AS ch_u
    FROM inc
)
SELECT w AS dur_week, n_risk, d AS n_events,
       round(h_u * 1.0 / 100000000 * 1000000) / 1000000 + 0.0
           AS hazard_inc,
       round(ch_u * 1.0 / 100000000 * 1000000) / 1000000 + 0.0
           AS cum_hazard
FROM cum WHERE w <= {_MAX_WEEK}
"""


@register("nelson_aalen_hazard", oracle=_NA_ORACLE)
def nelson_aalen_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderdate").cast("date").alias("d"),
        "o_orderkey",
    )
    wc = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    gaps = o.withColumn("nd", F.lead("d").over(wc))
    mx = o.agg(F.max("d").alias("censor_d"))
    ev = F.col("nd").isNotNull()
    days = F.when(ev, F.datediff("nd", "d")).otherwise(
        F.datediff("censor_d", "d")
    )
    de = gaps.crossJoin(F.broadcast(mx)).select(
        ev.alias("ev"), F.floor(days / 7).alias("w")
    )
    wk = de.groupBy("w").agg(
        F.sum(F.when(F.col("ev"), 1).otherwise(0)).alias("d"),
        F.sum(F.when(F.col("ev"), 0).otherwise(1)).alias("c"),
    )
    w_fwd = Window.orderBy("w").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    risk = wk.withColumn(
        "n_risk", F.sum(F.col("d") + F.col("c")).over(w_fwd)
    )
    inc = risk.filter(F.col("d") > 0).select(
        "w",
        "d",
        "n_risk",
        F.round(F.col("d") * F.lit(100000000.0) / F.col("n_risk"))
        .cast("long")
        .alias("h_u"),
    )
    w_cum = Window.orderBy("w").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = inc.withColumn(
        "ch_u", F.sum("h_u").over(w_cum).cast("long")
    )
    return cum.filter(F.col("w") <= _MAX_WEEK).select(
        F.col("w").alias("dur_week"),
        "n_risk",
        F.col("d").alias("n_events"),
        R.r(F.col("h_u") * F.lit(1.0) / 100000000, 6).alias("hazard_inc"),
        R.r(F.col("ch_u") * F.lit(1.0) / 100000000, 6).alias("cum_hazard"),
    )


# --- log-rank test: inter-purchase survival by customer-nation parity ---------
# Two-group survival comparison (Mantel 1966): groups are even/odd
# customer nations; per duration week the observed group-1 events are
# compared to the hypergeometric expectation E = d·n1/n with variance
# d·(n1/n)(1−n1/n)(n−d)/(n−1). E and V terms are snapped to integer
# 1e-8 units and summed exactly; weeks with a single subject at risk
# contribute no variance (guarded identically in both engines).

_LOGRANK_ORACLE = """
WITH o AS (
    SELECT o.o_custkey, (c.c_nationkey % 2 = 0) AS g1,
           o.o_orderdate::DATE AS d,
           lead(o.o_orderdate::DATE) OVER (
               PARTITION BY o.o_custkey
               ORDER BY o.o_orderdate::DATE, o.o_orderkey) AS nd
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
),
mx AS (SELECT max(d) AS censor_d FROM o),
de AS (
    SELECT g1, (nd IS NOT NULL) AS ev,
           CAST(floor(CASE WHEN nd IS NOT NULL
                      THEN date_diff('day', d, nd)
                      ELSE date_diff('day', d, censor_d) END / 7)
                AS BIGINT) AS w
    FROM o, mx
),
wk AS (
    SELECT w,
           sum(CASE WHEN ev THEN 1 ELSE 0 END)::BIGINT AS d,
           sum(CASE WHEN ev AND g1 THEN 1 ELSE 0 END)::BIGINT AS d1,
           count(*)::BIGINT AS total,
           sum(CASE WHEN g1 THEN 1 ELSE 0 END)::BIGINT AS total1
    FROM de GROUP BY 1
),
risk AS (
    SELECT w, d, d1,
           sum(total) OVER (ORDER BY w
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)::BIGINT
               AS n,
           sum(total1) OVER (ORDER BY w
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)::BIGINT
               AS n1
    FROM wk
),
terms AS (
    SELECT sum(d1)::BIGINT AS o1,
           sum(CAST(round(d * 100000000.0 * n1 / n) AS BIGINT))::BIGINT
               AS e1_u,
           sum(CASE WHEN n > 1 THEN
               CAST(round(d * (n1 * 1.0 / n) * (1.0 - n1 * 1.0 / n)
                          * (n - d) * 100000000.0 / (n - 1)) AS BIGINT)
               ELSE 0 END)::BIGINT AS v_u
    FROM risk WHERE d > 0
)
SELECT o1 AS observed_g1,
       round(e1_u * 1.0 / 100000000 * 10000) / 10000 + 0.0 AS expected_g1,
       round((o1 - e1_u * 1.0 / 100000000)
             * (o1 - e1_u * 1.0 / 100000000)
             / (v_u * 1.0 / 100000000) * 1000000) / 1000000 + 0.0
           AS chi2,
       (o1 - e1_u * 1.0 / 100000000) * (o1 - e1_u * 1.0 / 100000000)
       / (v_u * 1.0 / 100000000) > 3.8415 AS reject_equal_survival
FROM terms
"""


@register("logrank_test_survival", oracle=_LOGRANK_ORACLE)
def logrank_test_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        (F.col("c_nationkey") % 2 == 0).alias("g1"),
    )
    o = (
        read_table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            F.col("o_orderdate").cast("date").alias("d"),
            "o_orderkey",
        )
        .join(cust, "o_custkey")
    )
    wc = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    gaps = o.withColumn("nd", F.lead("d").over(wc))
    mx = o.agg(F.max("d").alias("censor_d"))
    ev = F.col("nd").isNotNull()
    days = F.when(ev, F.datediff("nd", "d")).otherwise(
        F.datediff("censor_d", "d")
    )
    de = gaps.crossJoin(F.broadcast(mx)).select(
        "g1", ev.alias("ev"), F.floor(days / 7).alias("w")
    )
    wk = de.groupBy("w").agg(
        F.sum(F.when(F.col("ev"), 1).otherwise(0)).cast("long").alias("d"),
        F.sum(F.when(F.col("ev") & F.col("g1"), 1).otherwise(0))
        .cast("long").alias("d1"),
        F.count(F.lit(1)).cast("long").alias("total"),
        F.sum(F.when(F.col("g1"), 1).otherwise(0)).cast("long")
        .alias("total1"),
    )
    w_fwd = Window.orderBy("w").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    risk = wk.select(
        "w",
        "d",
        "d1",
        F.sum("total").over(w_fwd).cast("long").alias("n"),
        F.sum("total1").over(w_fwd).cast("long").alias("n1"),
    )
    p1 = F.col("n1") * F.lit(1.0) / F.col("n")
    terms = risk.filter(F.col("d") > 0).agg(
        F.sum("d1").cast("long").alias("o1"),
        F.sum(
            F.round(F.col("d") * F.lit(100000000.0) * F.col("n1")
                    / F.col("n")).cast("long")
        ).cast("long").alias("e1_u"),
        F.sum(
            F.when(
                F.col("n") > 1,
                F.round(
                    F.col("d") * p1 * (F.lit(1.0) - p1)
                    * (F.col("n") - F.col("d"))
                    * F.lit(100000000.0)
                    / (F.col("n") - 1)
                ).cast("long"),
            ).otherwise(F.lit(0))
        ).cast("long").alias("v_u"),
    )
    e1 = F.col("e1_u") * F.lit(1.0) / 100000000
    v = F.col("v_u") * F.lit(1.0) / 100000000
    chi2 = (F.col("o1") - e1) * (F.col("o1") - e1) / v
    return terms.select(
        F.col("o1").alias("observed_g1"),
        R.r(e1, 4).alias("expected_g1"),
        R.r(chi2, 6).alias("chi2"),
        (chi2 > 3.8415).alias("reject_equal_survival"),
    )


# --- restricted mean survival time (RMST) --------------------------------------
# Area under the Kaplan-Meier step function up to τ = 26 weeks — the
# "average retained weeks per inter-purchase spell" number reported
# when median survival is undefined. The step integral is
# Σ S(w_i)·(min(w_{i+1}, τ) − w_i) plus the all-alive first interval,
# with S the same round-10dp DECIMAL cumulative product as
# survival_km_weekly — every area term is DECIMAL × integer (exact).

_RMST_TAU = 26

_RMST_ORACLE = f"""
WITH o AS (
    SELECT o_custkey, o_orderdate::DATE AS d,
           lead(o_orderdate::DATE) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate::DATE, o_orderkey) AS nd
    FROM orders
),
mx AS (SELECT max(o_orderdate::DATE) AS censor_d FROM orders),
de AS (
    SELECT (nd IS NOT NULL) AS ev,
           CAST(floor(CASE WHEN nd IS NOT NULL
                      THEN date_diff('day', d, nd)
                      ELSE date_diff('day', d, censor_d) END / 7)
                AS BIGINT) AS w
    FROM o, mx
),
wk AS (
    SELECT w,
           sum(CASE WHEN ev THEN 1 ELSE 0 END)::BIGINT AS d,
           sum(CASE WHEN ev THEN 0 ELSE 1 END)::BIGINT AS c
    FROM de GROUP BY 1
),
risk AS (
    SELECT w, d,
           sum(d + c) OVER (ORDER BY w
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)::BIGINT
               AS n_risk
    FROM wk
),
fct AS (
    SELECT w,
           CAST(round((1.0 - d * 1.0 / n_risk) * 100000000) / 100000000
                AS DECIMAL(12,10)) AS f
    FROM risk WHERE d > 0
),
surv AS (
    SELECT w,
           list_reduce(
               list_prepend(CAST(1 AS DECIMAL(12,10)),
                   list(f) OVER (ORDER BY w
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
               (acc, x) -> CAST(round(acc * x, 10) AS DECIMAL(12,10)))
               AS s,
           lead(w) OVER (ORDER BY w) AS nw
    FROM fct
),
first_w AS (SELECT min(w)::BIGINT AS w1 FROM fct),
area AS (
    SELECT sum(s * (least(coalesce(nw, {_RMST_TAU}), {_RMST_TAU}) - w))
               AS tail_area
    FROM surv WHERE w < {_RMST_TAU}
)
SELECT {_RMST_TAU}::BIGINT AS tau_weeks,
       least(first_w.w1, {_RMST_TAU})::BIGINT AS all_alive_weeks,
       round((least(first_w.w1, {_RMST_TAU})
              + coalesce(area.tail_area, 0))::DOUBLE * 10000) / 10000
           + 0.0 AS rmst_weeks
FROM first_w, area
"""


@register("rmst_survival", oracle=_RMST_ORACLE)
def rmst_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    dec = "decimal(12,10)"
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderdate").cast("date").alias("d"),
        "o_orderkey",
    )
    wc = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    gaps = o.withColumn("nd", F.lead("d").over(wc))
    mx = o.agg(F.max("d").alias("censor_d"))
    ev = F.col("nd").isNotNull()
    days = F.when(ev, F.datediff("nd", "d")).otherwise(
        F.datediff("censor_d", "d")
    )
    de = gaps.crossJoin(F.broadcast(mx)).select(
        ev.alias("ev"), F.floor(days / 7).alias("w")
    )
    wk = de.groupBy("w").agg(
        F.sum(F.when(F.col("ev"), 1).otherwise(0)).alias("d"),
        F.sum(F.when(F.col("ev"), 0).otherwise(1)).alias("c"),
    )
    w_fwd = Window.orderBy("w").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    risk = wk.withColumn(
        "n_risk", F.sum(F.col("d") + F.col("c")).over(w_fwd)
    )
    fct = risk.filter(F.col("d") > 0).select(
        "w",
        R.r(
            F.lit(1.0)
            - F.col("d").cast("double") / F.col("n_risk").cast("double"),
            8,
        ).cast(dec).alias("f"),
    )
    w_cum = Window.orderBy("w").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    surv = fct.select(
        "w",
        F.aggregate(
            F.collect_list("f").over(w_cum),
            F.lit(1).cast(dec),
            lambda acc, x: F.round(acc * x, 10).cast(dec),
        ).alias("s"),
        F.lead("w").over(Window.orderBy("w")).alias("nw"),
    )
    first_w = fct.agg(F.min("w").cast("long").alias("w1"))
    tau = F.lit(_RMST_TAU)
    area = surv.filter(F.col("w") < _RMST_TAU).agg(
        F.sum(
            F.col("s")
            * (F.least(F.coalesce(F.col("nw"), tau), tau) - F.col("w"))
        ).alias("tail_area")
    )
    return first_w.crossJoin(F.broadcast(area)).select(
        tau.cast("long").alias("tau_weeks"),
        F.least(F.col("w1"), tau).cast("long").alias("all_alive_weeks"),
        R.r(
            (
                F.least(F.col("w1"), tau)
                + F.coalesce(F.col("tail_area"), F.lit(0))
            ).cast("double"),
            4,
        ).alias("rmst_weeks"),
    )
