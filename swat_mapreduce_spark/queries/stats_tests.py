"""Nonparametric statistics for data-quality monitoring, all
cross-engine-exact by construction: Mann-Kendall trend test and
Theil-Sen slope over the daily value series, and Benjamini-Hochberg
FDR control across per-source KS drift tests.

These are the monitoring primitives a 100 TB ingest pipeline runs
daily: "is this metric trending?" (MK/Sen — rank-based, outlier-
robust, no normality assumption) and "which sources drifted, with
multiplicity control?" (KS + BH — 20 simultaneous tests need FDR, not
per-test alpha).

Determinism discipline (CLAUDE.md gotchas 2/13a): every comparison
feeding a sign/max/rank is either exact-integer (ECDF products, pair
counts) or exact-DECIMAL (daily sums cast before summing), so no
accumulation-order noise can flip a sign; the only transcendental
(exp in the KS p-value) is rounded through the shared
multiply-round-divide procedure at 8dp, where a sub-ulp libm
difference cannot move the rounded value except within ~1e-8 of a
boundary (negligible, and BH then compares identical rounded
doubles).

Scale posture: the daily table is calendar-bounded (30 rows → 435
pairs — broadcast self-join, no global window; the Sen median uses a
bounded sorted array, not a sort of the corpus); the KS grid is
|sources| x |distinct lengths| (bounded by the length domain), built
with one corpus scan + bounded-table windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from swat_mapreduce_spark.functions import rounding as R
from swat_mapreduce_spark.queries import register
from swat_mapreduce_spark.sources.readers import read_table

# --- Mann-Kendall trend test over daily event value ---------------------------
_MK_ORACLE = """
WITH daily AS (
    SELECT ts::DATE AS day,
           sum(CAST(value AS DECIMAL(30,8))) AS x
    FROM events GROUP BY 1
),
pairs AS (
    SELECT CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END AS sg
    FROM daily a JOIN daily b ON b.day > a.day
),
s AS (SELECT sum(sg)::BIGINT AS s_stat, count(*)::BIGINT AS n_pairs FROM pairs),
nn AS (SELECT count(*)::BIGINT AS n FROM daily),
ties AS (
    SELECT coalesce(sum(t * (t - 1) * (2 * t + 5)), 0)::BIGINT AS tie_term
    FROM (SELECT count(*)::BIGINT AS t FROM daily GROUP BY x HAVING count(*) > 1)
),
v AS (
    SELECT (nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tie_term) AS var18
    FROM nn, ties
)
SELECT nn.n AS n_days, s.n_pairs, s.s_stat,
       v.var18::DOUBLE / 18.0 AS var_s,
       round((CASE WHEN s.s_stat > 0 THEN (s.s_stat - 1)
                   WHEN s.s_stat < 0 THEN (s.s_stat + 1)
                   ELSE 0 END)::DOUBLE
             / sqrt(v.var18::DOUBLE / 18.0) * 1000000) / 1000000 + 0.0 AS z,
       CASE WHEN abs((CASE WHEN s.s_stat > 0 THEN (s.s_stat - 1)
                           WHEN s.s_stat < 0 THEN (s.s_stat + 1)
                           ELSE 0 END)::DOUBLE
                     / sqrt(v.var18::DOUBLE / 18.0)) < 1.96 THEN 'no_trend'
            WHEN s.s_stat > 0 THEN 'increasing' ELSE 'decreasing' END AS trend
FROM s, nn, v
"""


def _daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    # select-then-group (not groupBy(expr.alias())): grouping on a
    # projected attribute keeps the key named `day` in the physical
    # plan, where an inline cast becomes `_groupingexpression` — the
    # broadcast-boundedness auditor (tools/planaudit.py) proves
    # calendar-bounded aggregates through that key name
    return (
        read_table(spark, sf_dir, "events")
        .select(F.col("ts").cast("date").alias("day"), "value")
        .groupBy("day")
        .agg(F.sum(F.col("value").cast("decimal(30,8)")).alias("x"))
    )


@register("mann_kendall_daily_value", oracle=_MK_ORACLE)
def mann_kendall_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_value(spark, sf_dir)
    a = daily.select(F.col("day").alias("da"), F.col("x").alias("xa"))
    b = daily.select(F.col("day").alias("db"), F.col("x").alias("xb"))
    # calendar-bounded self-join (435 pairs at 30 days) — broadcast
    pairs = a.join(F.broadcast(b), F.col("db") > F.col("da")).select(
        F.when(F.col("xb") > F.col("xa"), 1)
        .when(F.col("xb") < F.col("xa"), -1)
        .otherwise(0)
        .alias("sg")
    )
    s = pairs.agg(
        F.sum("sg").cast("long").alias("s_stat"),
        F.count(F.lit(1)).alias("n_pairs"),
    )
    nn = daily.agg(F.count(F.lit(1)).alias("n"))
    ties = (
        daily.groupBy("x")
        .agg(F.count(F.lit(1)).alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    j = s.crossJoin(F.broadcast(nn)).crossJoin(F.broadcast(ties))
    var18 = (
        F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
        - F.col("tie_term")
    )
    num = (
        F.when(F.col("s_stat") > 0, F.col("s_stat") - 1)
        .when(F.col("s_stat") < 0, F.col("s_stat") + 1)
        .otherwise(0)
        .cast("double")
    )
    z_raw = num / F.sqrt(var18.cast("double") / F.lit(18.0))
    return j.select(
        F.col("n").alias("n_days"),
        "n_pairs",
        "s_stat",
        (var18.cast("double") / F.lit(18.0)).alias("var_s"),
        R.r(z_raw, 6).alias("z"),
        F.when(F.abs(z_raw) < 1.96, "no_trend")
        .when(F.col("s_stat") > 0, "increasing")
        .otherwise("decreasing")
        .alias("trend"),
    )


# --- Theil-Sen robust slope over the same daily series -------------------------
# Median of all pairwise slopes — the estimator is resistant to ~29%
# outliers where OLS (regr_slope, covered in regr_agg_funcs) is
# resistant to none. The slope list is calendar-bounded, so the exact
# median comes from ONE sorted bounded array (no distributed sort, no
# global window); daily sums are DECIMAL-exact before the one double
# division per pair.
_SEN_ORACLE = """
WITH daily AS (
    SELECT ts::DATE AS day,
           sum(CAST(value AS DECIMAL(30,8))) AS x
    FROM events GROUP BY 1
),
pairs AS (
    SELECT (b.x::DOUBLE - a.x::DOUBLE) / date_diff('day', a.day, b.day)
               AS slope
    FROM daily a JOIN daily b ON b.day > a.day
),
arr AS (
    SELECT list(slope ORDER BY slope) AS sl, count(*)::BIGINT AS n FROM pairs
)
SELECT n AS n_pairs,
       round((sl[CAST((n + 1) // 2 AS INT)]
              + sl[CAST((n + 2) // 2 AS INT)]) / 2.0 * 1000000) / 1000000
           + 0.0 AS sen_slope,
       (SELECT count(*) FROM pairs WHERE slope > 0)::BIGINT
           AS n_positive_pairs
FROM arr
"""


@register("theil_sen_daily_trend", oracle=_SEN_ORACLE)
def theil_sen_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_value(spark, sf_dir)
    a = daily.select(
        F.col("day").alias("da"), F.col("x").cast("double").alias("xa")
    )
    b = daily.select(
        F.col("day").alias("db"), F.col("x").cast("double").alias("xb")
    )
    pairs = a.join(F.broadcast(b), F.col("db") > F.col("da")).select(
        (
            (F.col("xb") - F.col("xa"))
            / F.datediff(F.col("db"), F.col("da")).cast("double")
        ).alias("slope")
    )
    arr = pairs.agg(
        F.array_sort(F.collect_list("slope")).alias("sl"),
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("slope") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_positive_pairs"),
    )
    mid1 = F.element_at("sl", ((F.col("n") + 1) / 2).cast("int"))
    mid2 = F.element_at("sl", ((F.col("n") + 2) / 2).cast("int"))
    return arr.select(
        F.col("n").alias("n_pairs"),
        R.r((mid1 + mid2) / F.lit(2.0), 6).alias("sen_slope"),
        "n_positive_pairs",
    )


# --- Benjamini-Hochberg FDR over per-source KS drift tests --------------------
# One KS test per source (its n_chars distribution vs the pooled rest)
# gives m=|sources| simultaneous p-values; BH step-up controls the
# false-discovery rate at alpha=0.05. The KS gap is EXACT-INTEGER:
# at each distinct length v, |cum_s(v)*(N-n_s) - (cum_all(v)-cum_s(v))*n_s|
# is an integer over the dense (source x distinct length) grid, so
# D_s = g_s/(n_s*(N-n_s)) and the asymptotic p = 2*exp(-2*lambda*D^2)
# has an exact rational exponent; p is snapped via round(x*1e8)/1e8
# before the BH comparison so both engines rank identical doubles.
_FDR_ALPHA = "0.05"

_FDR_ORACLE = f"""
WITH docs AS (SELECT source, n_chars FROM documents),
tot AS (SELECT count(*)::BIGINT AS n_all FROM docs),
per_src AS (SELECT source, count(*)::BIGINT AS n_s FROM docs GROUP BY 1),
vals AS (SELECT DISTINCT n_chars AS v FROM docs),
grid AS (SELECT p.source, p.n_s, v.v FROM per_src p, vals v),
cnt AS (
    SELECT source, n_chars AS v, count(*)::BIGINT AS c
    FROM docs GROUP BY 1, 2
),
cum AS (
    SELECT g.source, g.n_s, g.v,
           sum(coalesce(c.c, 0)) OVER (
               PARTITION BY g.source ORDER BY g.v
           )::BIGINT AS cum_s
    FROM grid g LEFT JOIN cnt c ON c.source = g.source AND c.v = g.v
),
cum_all_t AS (
    SELECT v, sum(c) OVER (ORDER BY v)::BIGINT AS cum_all
    FROM (SELECT n_chars AS v, count(*)::BIGINT AS c FROM docs GROUP BY 1)
),
gaps AS (
    SELECT cum.source, cum.n_s, tot.n_all,
           max(abs(cum.cum_s * (tot.n_all - cum.n_s)
                   - (ca.cum_all - cum.cum_s) * cum.n_s))::BIGINT AS g
    FROM cum JOIN cum_all_t ca ON ca.v = cum.v CROSS JOIN tot
    GROUP BY 1, 2, 3
),
tests AS (
    SELECT source, n_s, n_all, g,
           round(g::DOUBLE / (n_s * (n_all - n_s)) * 1000000) / 1000000
               + 0.0 AS d_stat,
           round(least(1.0,
               2.0 * exp(-2.0 * ((g::DOUBLE / (n_s * (n_all - n_s)))
                                 * (g::DOUBLE / (n_s * (n_all - n_s))))
                         * (n_s::DOUBLE * (n_all - n_s) / n_all)))
               * 100000000) / 100000000 + 0.0 AS p_value
    FROM gaps
),
m_t AS (SELECT count(*)::BIGINT AS m FROM tests),
ranked AS (
    SELECT t.*, m_t.m,
           row_number() OVER (ORDER BY t.p_value, t.source) AS bh_rank
    FROM tests t, m_t
),
kmax AS (
    SELECT coalesce(max(bh_rank), 0) AS k FROM ranked
    WHERE p_value * m <= bh_rank * {_FDR_ALPHA}
)
SELECT r.source, r.n_s, r.d_stat, r.p_value, r.bh_rank::BIGINT AS bh_rank,
       round(r.bh_rank * {_FDR_ALPHA} / r.m * 100000000) / 100000000 + 0.0
           AS bh_threshold,
       r.bh_rank <= kmax.k AS rejected
FROM ranked r, kmax
"""


@register("fdr_bh_source_length_tests", oracle=_FDR_ORACLE)
def fdr_bh_source_length_tests(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select(
        "source", "n_chars"
    )
    tot = docs.agg(F.count(F.lit(1)).alias("n_all"))
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_s")
    )
    vals = docs.select(F.col("n_chars").alias("v")).distinct()
    grid = per_src.crossJoin(F.broadcast(vals))
    cnt = docs.groupBy(
        "source", F.col("n_chars").alias("v")
    ).agg(F.count(F.lit(1)).alias("c"))
    cum = (
        grid.join(F.broadcast(cnt), ["source", "v"], "left")
        .withColumn(
            "cum_s",
            F.sum(F.coalesce("c", F.lit(0)))
            .over(Window.partitionBy("source").orderBy("v"))
            .cast("long"),
        )
    )
    cum_all = (
        docs.groupBy(F.col("n_chars").alias("v"))
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn(
            "cum_all",
            F.sum("c").over(Window.orderBy("v")).cast("long"),
        )
        .select("v", "cum_all")
    )
    gaps = (
        cum.join(F.broadcast(cum_all), "v")
        .crossJoin(F.broadcast(tot))
        .groupBy("source", "n_s", "n_all")
        .agg(
            F.max(
                F.abs(
                    F.col("cum_s") * (F.col("n_all") - F.col("n_s"))
                    - (F.col("cum_all") - F.col("cum_s")) * F.col("n_s")
                )
            )
            .cast("long")
            .alias("g")
        )
    )
    d_raw = F.col("g").cast("double") / (
        F.col("n_s") * (F.col("n_all") - F.col("n_s"))
    )
    lam = (
        F.col("n_s").cast("double")
        * (F.col("n_all") - F.col("n_s"))
        / F.col("n_all")
    )
    p_raw = F.least(
        F.lit(1.0), F.lit(2.0) * F.exp(F.lit(-2.0) * (d_raw * d_raw) * lam)
    )
    tests = gaps.select(
        "source",
        "n_s",
        R.r(d_raw, 6).alias("d_stat"),
        R.r(p_raw, 8).alias("p_value"),
    )
    m_t = tests.agg(F.count(F.lit(1)).alias("m"))
    w = Window.orderBy("p_value", "source")  # bounded: |sources| rows
    ranked = tests.crossJoin(F.broadcast(m_t)).withColumn(
        "bh_rank", F.row_number().over(w).cast("long")
    )
    alpha = float(_FDR_ALPHA)
    kmax = ranked.filter(
        F.col("p_value") * F.col("m") <= F.col("bh_rank") * F.lit(alpha)
    ).agg(F.coalesce(F.max("bh_rank"), F.lit(0)).alias("k"))
    return ranked.crossJoin(F.broadcast(kmax)).select(
        "source",
        "n_s",
        "d_stat",
        "p_value",
        "bh_rank",
        R.r(
            F.col("bh_rank") * F.lit(alpha) / F.col("m"), 8
        ).alias("bh_threshold"),
        (F.col("bh_rank") <= F.col("k")).alias("rejected"),
    )


# --- Wald-Wolfowitz runs test over daily up/down moves -------------------------
# Randomness check on the sign sequence of consecutive-day value
# changes: too FEW runs = momentum/trend, too MANY = oscillation.
# Consecutive days pair by date arithmetic (a self-join on day+1 — no
# window at all); zero-diffs are dropped per standard practice. The
# day-ordered sign sequence is calendar-bounded, so the run count is
# one array fold; R, n+, n- are exact integers and E[R]/Var(R) are
# the textbook rationals evaluated identically in IEEE on both
# engines.
_RUNS_ORACLE = """
WITH daily AS (
    SELECT ts::DATE AS day, sum(CAST(value AS DECIMAL(30,8))) AS x
    FROM events GROUP BY 1
),
diffs AS (
    SELECT b.day, CASE WHEN b.x > a.x THEN 1 ELSE -1 END AS sg
    FROM daily a JOIN daily b ON b.day = a.day + INTERVAL 1 DAY
    WHERE b.x <> a.x
),
arr AS (
    SELECT list(sg ORDER BY day) AS l,
           count(*)::BIGINT AS n,
           sum(CASE WHEN sg = 1 THEN 1 ELSE 0 END)::BIGINT AS n_plus
    FROM diffs
),
runs_t AS (
    SELECT n, n_plus, (n - n_plus) AS n_minus,
           (1 + len(list_filter(
                generate_series(2, len(l)),
                i -> l[i] <> l[i - 1])))::BIGINT AS runs
    FROM arr
)
SELECT n AS n_moves, n_plus, n_minus, runs,
       round((runs - (1.0 + 2.0 * n_plus * n_minus / n))
             / sqrt(2.0 * n_plus * n_minus
                    * (2.0 * n_plus * n_minus - n)
                    / (1.0 * n * n * (n - 1))) * 1000000) / 1000000 + 0.0
           AS z,
       abs((runs - (1.0 + 2.0 * n_plus * n_minus / n))
           / sqrt(2.0 * n_plus * n_minus
                  * (2.0 * n_plus * n_minus - n)
                  / (1.0 * n * n * (n - 1)))) < 1.96 AS random_walk
FROM runs_t
"""


@register("runs_test_daily_updown", oracle=_RUNS_ORACLE)
def runs_test_daily_updown(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_value(spark, sf_dir)
    a = daily.select(F.col("day").alias("da"), F.col("x").alias("xa"))
    b = daily.select(F.col("day").alias("db"), F.col("x").alias("xb"))
    diffs = (
        a.join(F.broadcast(b), F.col("db") == F.date_add(F.col("da"), 1))
        .filter(F.col("xb") != F.col("xa"))
        .select(
            "db",
            F.when(F.col("xb") > F.col("xa"), 1).otherwise(-1).alias("sg"),
        )
    )
    arr = diffs.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("db", "sg"))),
            lambda s: s["sg"],
        ).alias("l"),
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("sg") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_plus"),
    )
    # gotcha 10: guard the 2..n sequence against n < 2
    changes = F.when(
        F.col("n") >= 2,
        F.size(
            F.filter(
                F.sequence(F.lit(2), F.col("n").cast("int")),
                lambda i: F.element_at("l", i)
                != F.element_at("l", i - F.lit(1)),
            )
        ),
    ).otherwise(F.lit(0))
    t = arr.select(
        F.col("n").alias("n_moves"),
        "n_plus",
        (F.col("n") - F.col("n_plus")).alias("n_minus"),
        (F.lit(1) + changes).cast("long").alias("runs"),
    )
    e_r = F.lit(1.0) + F.lit(2.0) * F.col("n_plus") * F.col(
        "n_minus"
    ) / F.col("n_moves")
    var_r = (
        F.lit(2.0)
        * F.col("n_plus")
        * F.col("n_minus")
        * (
            F.lit(2.0) * F.col("n_plus") * F.col("n_minus")
            - F.col("n_moves")
        )
        / (
            F.lit(1.0)
            * F.col("n_moves")
            * F.col("n_moves")
            * (F.col("n_moves") - 1)
        )
    )
    z_raw = (F.col("runs") - e_r) / F.sqrt(var_r)
    return t.select(
        "n_moves",
        "n_plus",
        "n_minus",
        "runs",
        R.r(z_raw, 6).alias("z"),
        (F.abs(z_raw) < 1.96).alias("random_walk"),
    )


# --- deterministic randomization (permutation) test ---------------------------
# Two-sample mean-difference test between src0 and src1 document
# lengths, with the null distribution built from B=99 md5-derived
# relabelings (the Monte-Carlo permutation / randomization test,
# Fisher 1935 made hash-deterministic — no RNG state, identical draws
# on every engine). Every statistic comparison is EXACT-INTEGER: with
# sums s and counts n, |m0−m1| >= |m0b−m1b| iff
# |s0·n1 − s1·n0| · (n0b·n1b) >= |s0b·n1b − s1b·n0b| · (n0·n1), and
# p = (1 + #{b: stat_b >= obs})/(B+1) with the 5%-level decision
# 20·(1+cnt) <= B+1 — also integers. The cross products can exceed
# int64 beyond test scale (s ~ sum of n_chars), and Spark would wrap
# silently under non-ANSI mode while DuckDB raises — so BOTH sides
# compute the comparison in wide exact types (Spark DECIMAL(38,0)
# via decimal(19,0) operand casts; DuckDB HUGEINT/int128), which is
# exact to ~1e38 ≫ any reachable scale factor (ADVICE r7).
_PERM_B = 99

_PERM_ORACLE = f"""
WITH two AS (
    SELECT doc_id, source, n_chars FROM documents
    WHERE source IN ('src0', 'src1')
),
obs AS (
    SELECT sum(CASE WHEN source = 'src0' THEN n_chars ELSE 0 END)::BIGINT
               AS s0,
           sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)::BIGINT AS n0,
           sum(CASE WHEN source = 'src1' THEN n_chars ELSE 0 END)::BIGINT
               AS s1,
           sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END)::BIGINT AS n1
    FROM two
),
draws AS (
    SELECT b.b, t.n_chars,
           ('0x' || substr(md5(b.b || '_' || t.doc_id), 1, 15))::BIGINT % 2
               AS g
    FROM two t, (SELECT unnest(generate_series(0, {_PERM_B - 1})) AS b) b
),
perm AS (
    SELECT b,
           sum(CASE WHEN g = 0 THEN n_chars ELSE 0 END)::BIGINT AS s0b,
           sum(CASE WHEN g = 0 THEN 1 ELSE 0 END)::BIGINT AS n0b,
           sum(CASE WHEN g = 1 THEN n_chars ELSE 0 END)::BIGINT AS s1b,
           sum(CASE WHEN g = 1 THEN 1 ELSE 0 END)::BIGINT AS n1b
    FROM draws GROUP BY b
),
cmp AS (
    SELECT count(*)::BIGINT AS n_ge
    FROM perm p, obs o
    WHERE p.n0b > 0 AND p.n1b > 0
      AND abs(p.s0b::HUGEINT * p.n1b - p.s1b::HUGEINT * p.n0b)
              * (o.n0::HUGEINT * o.n1)
          >= abs(o.s0::HUGEINT * o.n1 - o.s1::HUGEINT * o.n0)
              * (p.n0b::HUGEINT * p.n1b)
)
SELECT o.n0, o.n1,
       round(o.s0 * 1.0 / o.n0 * 10000) / 10000 + 0.0 AS mean0,
       round(o.s1 * 1.0 / o.n1 * 10000) / 10000 + 0.0 AS mean1,
       round(abs(o.s0 * 1.0 / o.n0 - o.s1 * 1.0 / o.n1) * 10000) / 10000
           + 0.0 AS obs_diff,
       round((1 + c.n_ge) * 1.0 / {_PERM_B + 1} * 1000000) / 1000000 + 0.0
           AS p_value,
       20 * (1 + c.n_ge) <= {_PERM_B + 1} AS reject_5pct
FROM obs o, cmp c
"""


@register("permutation_test_mean_diff", oracle=_PERM_ORACLE)
def permutation_test_mean_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    two = (
        read_table(spark, sf_dir, "documents")
        .filter(F.col("source").isin("src0", "src1"))
        .select("doc_id", "source", "n_chars")
        .persist()
    )
    obs = two.agg(
        F.sum(F.when(F.col("source") == "src0", F.col("n_chars")).otherwise(0))
        .cast("long")
        .alias("s0"),
        F.sum(F.when(F.col("source") == "src0", 1).otherwise(0))
        .cast("long")
        .alias("n0"),
        F.sum(F.when(F.col("source") == "src1", F.col("n_chars")).otherwise(0))
        .cast("long")
        .alias("s1"),
        F.sum(F.when(F.col("source") == "src1", 1).otherwise(0))
        .cast("long")
        .alias("n1"),
    )
    draws = two.select(
        "doc_id",
        "n_chars",
        F.explode(F.sequence(F.lit(0), F.lit(_PERM_B - 1))).alias("b"),
    ).select(
        "b",
        "n_chars",
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "_",
                            F.col("b").cast("string"),
                            F.col("doc_id").cast("string"),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long"),
            F.lit(2),
        ).alias("g"),
    )
    perm = draws.groupBy("b").agg(
        F.sum(F.when(F.col("g") == 0, F.col("n_chars")).otherwise(0))
        .cast("long")
        .alias("s0b"),
        F.sum(F.when(F.col("g") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n0b"),
        F.sum(F.when(F.col("g") == 1, F.col("n_chars")).otherwise(0))
        .cast("long")
        .alias("s1b"),
        F.sum(F.when(F.col("g") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n1b"),
    )
    j = perm.crossJoin(F.broadcast(obs))

    # wide exact arithmetic: decimal(19,0) operands widen products to
    # DECIMAL(38,0) (scale 0 — no silent scale loss, gotcha 8). NOTE
    # on overflow past 1e38: with spark.sql.ansi.enabled unset (this
    # repo sets no ANSI conf) Spark returns NULL, which a filter
    # treats as false — the row silently drops from the count rather
    # than raising; the values here stay far below 1e38 at any
    # realistic SF (ADVICE r8 correction of the r7 comment)
    def _d(name: str):
        return F.col(name).cast("decimal(19,0)")

    n_ge = (
        j.filter(
            (F.col("n0b") > 0)
            & (F.col("n1b") > 0)
            & (
                F.abs(_d("s0b") * _d("n1b") - _d("s1b") * _d("n0b"))
                * (_d("n0") * _d("n1"))
                >= F.abs(_d("s0") * _d("n1") - _d("s1") * _d("n0"))
                * (_d("n0b") * _d("n1b"))
            )
        )
        .agg(F.count(F.lit(1)).alias("n_ge"))
    )
    out = obs.crossJoin(F.broadcast(n_ge))
    two.unpersist()
    return out.select(
        "n0",
        "n1",
        R.r(F.col("s0") * F.lit(1.0) / F.col("n0"), 4).alias("mean0"),
        R.r(F.col("s1") * F.lit(1.0) / F.col("n1"), 4).alias("mean1"),
        R.r(
            F.abs(
                F.col("s0") * F.lit(1.0) / F.col("n0")
                - F.col("s1") * F.lit(1.0) / F.col("n1")
            ),
            4,
        ).alias("obs_diff"),
        R.r(
            (F.lit(1) + F.col("n_ge")) * F.lit(1.0) / F.lit(_PERM_B + 1), 6
        ).alias("p_value"),
        (F.lit(20) * (F.lit(1) + F.col("n_ge")) <= F.lit(_PERM_B + 1)).alias(
            "reject_5pct"
        ),
    )


# --- paired-filter agreement: McNemar + Cohen's kappa --------------------------
# Two corpus filters disagree — is the disagreement systematic?
# Filter A: length >= corpus median (value-grid exact); Filter B:
# stopword ratio >= 8% (exact integer cross-multiplication — no
# float anywhere in either label). McNemar's chi-square (b-c)^2/(b+c)
# tests marginal homogeneity on the discordant cells; Cohen's kappa
# measures chance-corrected agreement from the same 2x2 table. Every
# ingredient is an exact integer count; the two divisions happen once
# at the end on identical integers.
_STOPS_SQL = "['the', 'a', 'of', 'and', 'to', 'in', 'is']"
_STOP_NUM = 8  # B: stop_count * 100 >= n_tokens * 8

_PAIRED_FILTER_DUCK = rf"""
toks AS (
    SELECT doc_id, n_chars,
           list_filter(string_split_regex(trim(text), '\s+'),
                       x -> len(x) > 0) AS tk
    FROM documents
),
med AS (
    SELECT min(v) AS m FROM (
        SELECT v, sum(c) OVER (ORDER BY v) AS cum, tot.n
        FROM (SELECT n_chars AS v, count(*)::BIGINT AS c
              FROM documents GROUP BY 1),
             (SELECT count(*)::BIGINT AS n FROM documents) tot
    ) WHERE cum * 2 >= n
),
lab AS (
    SELECT t.doc_id,
           (t.n_chars >= med.m) AS a,
           (len(list_filter(t.tk, x -> list_contains({_STOPS_SQL}, x)))
                * 100 >= len(t.tk) * {_STOP_NUM}) AS b
    FROM toks t, med
    WHERE len(t.tk) > 0
)
"""

_MCNEMAR_ORACLE = f"""
WITH {_PAIRED_FILTER_DUCK},
cells AS (
    SELECT sum(CASE WHEN a AND b THEN 1 ELSE 0 END)::BIGINT AS n11,
           sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END)::BIGINT AS n10,
           sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END)::BIGINT AS n01,
           sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END)::BIGINT AS n00
    FROM lab
)
SELECT n11, n10, n01, n00,
       round((n10 - n01) * (n10 - n01) * 1.0 / (n10 + n01) * 10000)
           / 10000 + 0.0 AS chi2,
       (n10 - n01) * (n10 - n01) * 100 > 384 * (n10 + n01)
           AS reject_5pct
FROM cells
"""

# kappa = (po - pe)/(1 - pe) reduces to ONE integer ratio:
# (n*(n11+n00) - pe_num) / (n*n - pe_num) with
# pe_num = (n11+n10)(n11+n01) + (n01+n00)(n10+n00)
_KAPPA_ORACLE = f"""
WITH {_PAIRED_FILTER_DUCK},
cells AS (
    SELECT count(*)::BIGINT AS n,
           sum(CASE WHEN a AND b THEN 1 ELSE 0 END)::BIGINT AS n11,
           sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END)::BIGINT AS n10,
           sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END)::BIGINT AS n01,
           sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END)::BIGINT AS n00
    FROM lab
)
SELECT n, n11, n10, n01, n00,
       round((n11 + n00) * 1.0 / n * 10000) / 10000 + 0.0 AS observed_agree,
       round(((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) * 1.0
             / (n * n) * 10000) / 10000 + 0.0 AS expected_agree,
       round((n * (n11 + n00)
              - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)))
             * 1.0
             / (n * n
                - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)))
             * 1000000) / 1000000 + 0.0 AS kappa
FROM cells
"""


@register("cohens_kappa_filters", oracle=_KAPPA_ORACLE)
def cohens_kappa_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    lab = _paired_filter_labels(spark, sf_dir)
    cells = lab.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("a") & F.col("b"), 1).otherwise(0))
        .cast("long")
        .alias("n11"),
        F.sum(F.when(F.col("a") & ~F.col("b"), 1).otherwise(0))
        .cast("long")
        .alias("n10"),
        F.sum(F.when(~F.col("a") & F.col("b"), 1).otherwise(0))
        .cast("long")
        .alias("n01"),
        F.sum(F.when(~F.col("a") & ~F.col("b"), 1).otherwise(0))
        .cast("long")
        .alias("n00"),
    )
    pe_num = (F.col("n11") + F.col("n10")) * (
        F.col("n11") + F.col("n01")
    ) + (F.col("n01") + F.col("n00")) * (F.col("n10") + F.col("n00"))
    return cells.select(
        "n",
        "n11",
        "n10",
        "n01",
        "n00",
        R.r(
            (F.col("n11") + F.col("n00")) * F.lit(1.0) / F.col("n"), 4
        ).alias("observed_agree"),
        R.r(pe_num * F.lit(1.0) / (F.col("n") * F.col("n")), 4).alias(
            "expected_agree"
        ),
        R.r(
            (F.col("n") * (F.col("n11") + F.col("n00")) - pe_num)
            * F.lit(1.0)
            / (F.col("n") * F.col("n") - pe_num),
            6,
        ).alias("kappa"),
    )


def _paired_filter_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from swat_mapreduce_spark.functions.text import ws_tokens

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", ws_tokens(F.col("text")).alias("tk")
    )
    lens = docs.select(F.col("n_chars").alias("v"))
    counts = sorted(
        (r["v"], r["c"])
        for r in lens.groupBy("v").agg(F.count(F.lit(1)).alias("c")).collect()
    )
    n = sum(c for _, c in counts)
    cum, med = 0, counts[-1][0]
    for v, c in counts:
        cum += c
        if cum * 2 >= n:
            med = v
            break
    stops = F.array(
        *[F.lit(w) for w in ["the", "a", "of", "and", "to", "in", "is"]]
    )
    nstop = F.size(F.filter("tk", lambda x: F.array_contains(stops, x)))
    return docs.filter(F.size("tk") > 0).select(
        "doc_id",
        (F.col("n_chars") >= F.lit(int(med))).alias("a"),
        (nstop * 100 >= F.size("tk") * _STOP_NUM).alias("b"),
    )


@register("mcnemar_two_filters", oracle=_MCNEMAR_ORACLE)
def mcnemar_two_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    lab = _paired_filter_labels(spark, sf_dir)
    cells = lab.agg(
        F.sum(F.when(F.col("a") & F.col("b"), 1).otherwise(0))
        .cast("long")
        .alias("n11"),
        F.sum(F.when(F.col("a") & ~F.col("b"), 1).otherwise(0))
        .cast("long")
        .alias("n10"),
        F.sum(F.when(~F.col("a") & F.col("b"), 1).otherwise(0))
        .cast("long")
        .alias("n01"),
        F.sum(F.when(~F.col("a") & ~F.col("b"), 1).otherwise(0))
        .cast("long")
        .alias("n00"),
    )
    d = F.col("n10") - F.col("n01")
    tot = F.col("n10") + F.col("n01")
    return cells.select(
        "n11",
        "n10",
        "n01",
        "n00",
        R.r(d * d * F.lit(1.0) / tot, 4).alias("chi2"),
        # exact-integer 5% decision: chi2 > 3.84 <=> 100*d^2 > 384*(b+c)
        (d * d * F.lit(100) > F.lit(384) * tot).alias("reject_5pct"),
    )


# --- Cochran-Armitage trend test across length deciles -------------------------
# Does the stopword-filter pass rate TREND with document length?
# Chi-square (chi2_independence_*) only says "dependent"; CA tests the
# ordered alternative. Length deciles come from exact value-grid cuts
# (cut_j = min v with 10*cum(v) >= j*n; bucket = #cuts <= v — no
# global window, no per-doc rank); scores s = bucket index. With
# integer aggregates A=Σs·k, B=Σs·n, C=Σs²·n, K, N:
# T = A − K·B/N, Var = (K(N−K)/N²)·(C − B²/N), z = T/√Var — the same
# fixed expression on both engines.
_CA_ORACLE = f"""
WITH {_PAIRED_FILTER_DUCK},
docs2 AS (
    SELECT l.doc_id, d.n_chars AS v, CASE WHEN l.b THEN 1 ELSE 0 END AS k
    FROM lab l JOIN documents d USING (doc_id)
),
grid AS (
    SELECT v, sum(c) OVER (ORDER BY v)::BIGINT AS cum, tot.n
    FROM (SELECT v, count(*)::BIGINT AS c FROM docs2 GROUP BY 1),
         (SELECT count(*)::BIGINT AS n FROM docs2) tot
),
cuts AS (
    SELECT j, min(v) AS cv
    FROM grid, (SELECT unnest(generate_series(1, 9)) AS j)
    WHERE cum * 10 >= j * n
    GROUP BY j
),
bucketed AS (
    SELECT d.doc_id, d.k,
           (SELECT count(*) FROM cuts c WHERE d.v >= c.cv)::BIGINT AS s
    FROM docs2 d
),
aggs AS (
    SELECT count(*)::BIGINT AS nn, sum(k)::BIGINT AS kk,
           sum(s * k)::BIGINT AS a, sum(s)::BIGINT AS b,
           sum(s * s)::BIGINT AS c
    FROM bucketed
)
SELECT nn AS n_docs, kk AS n_pass,
       round((a - kk * 1.0 * b / nn)
             / sqrt((kk * 1.0 * (nn - kk) / (nn * 1.0 * nn))
                    * (c - b * 1.0 * b / nn)) * 1000000) / 1000000 + 0.0
           AS z,
       abs((a - kk * 1.0 * b / nn)
           / sqrt((kk * 1.0 * (nn - kk) / (nn * 1.0 * nn))
                  * (c - b * 1.0 * b / nn))) >= 1.96 AS trend_5pct
FROM aggs
"""


@register("cochran_armitage_trend", oracle=_CA_ORACLE)
def cochran_armitage_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    lab = _paired_filter_labels(spark, sf_dir)
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").alias("v")
    )
    d2 = lab.join(docs, "doc_id").select(
        "doc_id", "v", F.when(F.col("b"), 1).otherwise(0).alias("k")
    )
    d2 = d2.persist()
    counts = sorted(
        (r["v"], r["c"])
        for r in d2.groupBy("v").agg(F.count(F.lit(1)).alias("c")).collect()
    )
    n = sum(c for _, c in counts)
    cuts = []
    cum = 0
    it = iter(counts)
    # exact value-grid cuts: cut_j = min v with 10*cum >= j*n
    cums = []
    cum = 0
    for v, c in counts:
        cum += c
        cums.append((v, cum))
    for j in range(1, 10):
        cuts.append(min(v for v, cm in cums if cm * 10 >= j * n))
    s_col = sum(
        [F.when(F.col("v") >= F.lit(int(cv)), 1).otherwise(0) for cv in cuts],
        F.lit(0),
    ).cast("long")
    aggs = d2.select(s_col.alias("s"), "k").agg(
        F.count(F.lit(1)).alias("nn"),
        F.sum("k").cast("long").alias("kk"),
        F.sum(F.col("s") * F.col("k")).cast("long").alias("a"),
        F.sum("s").cast("long").alias("b"),
        F.sum(F.col("s") * F.col("s")).cast("long").alias("c"),
    )
    d2.unpersist()
    t = F.col("a") - F.col("kk") * F.lit(1.0) * F.col("b") / F.col("nn")
    var = (
        F.col("kk")
        * F.lit(1.0)
        * (F.col("nn") - F.col("kk"))
        / (F.col("nn") * F.lit(1.0) * F.col("nn"))
    ) * (
        F.col("c") - F.col("b") * F.lit(1.0) * F.col("b") / F.col("nn")
    )
    z = t / F.sqrt(var)
    return aggs.select(
        F.col("nn").alias("n_docs"),
        F.col("kk").alias("n_pass"),
        R.r(z, 6).alias("z"),
        (F.abs(z) >= 1.96).alias("trend_5pct"),
    )


# --- autocorrelation function of the daily series ------------------------------
# ACF at lags 1..7 over the daily value sums — the seasonality /
# momentum fingerprint (a weekly cycle shows as a lag-7 peak). The
# series is calendar-bounded, so the whole computation is one sorted
# array fold: daily sums are DECIMAL-exact, the mean is the decimal
# sum divided once, and every product term is quantized to integer
# units before the order-free sums (gotcha 13a). r_k uses the
# standard biased estimator sum_{t<=n-k}(x_t-mu)(x_{t+k}-mu) /
# sum(x_t-mu)^2 with the same fixed expression on both engines.
_ACF_MAX_LAG = 7

_ACF_ORACLE = f"""
WITH daily AS (
    SELECT ts::DATE AS day, sum(CAST(value AS DECIMAL(30,8))) AS x
    FROM events GROUP BY 1
),
arr AS (
    SELECT list(x::DOUBLE ORDER BY day) AS xs, count(*)::BIGINT AS n,
           sum(x) AS sx
    FROM daily
),
m AS (SELECT xs, n, (sx::DOUBLE) / n AS mu FROM arr),
den AS (
    SELECT xs, n, mu,
           sum(CAST(round(((x - mu) * (x - mu)) * 100000000) AS BIGINT))
               ::DOUBLE / 100000000 AS d
    FROM m, unnest(xs) AS u(x)
    GROUP BY xs, n, mu
)
SELECT k.k AS lag,
       round((SELECT sum(CAST(round(((xs[i] - mu) * (xs[i + k.k] - mu))
                                    * 100000000) AS BIGINT))
              FROM unnest(generate_series(1, CAST(n - k.k AS INT))) AS g(i)
             )::DOUBLE / 100000000 / d * 1000000) / 1000000 + 0.0 AS acf
FROM den, generate_series(1, {_ACF_MAX_LAG}) AS k(k)
"""


@register("acf_daily_lags", oracle=_ACF_ORACLE)
def acf_daily_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_value(spark, sf_dir)
    arr = daily.agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct("day", F.col("x").cast("double").alias("x"))
                )
            ),
            lambda s: s["x"],
        ).alias("xs"),
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
    )
    mu = (F.col("sx").cast("double") / F.col("n")).alias("mu")
    m = arr.select("xs", "n", mu)

    def units(term):
        return F.round(term * F.lit(1e8)).cast("long")

    den = (
        F.aggregate(
            F.transform(
                F.col("xs"),
                lambda x: units((x - F.col("mu")) * (x - F.col("mu"))),
            ),
            F.lit(0).cast("long"),
            lambda acc, t: acc + t,
        ).cast("double")
        / F.lit(1e8)
    )
    base = m.select("xs", "n", "mu", den.alias("d"))
    lags = base.select(
        "xs",
        "n",
        "mu",
        "d",
        F.explode(
            F.sequence(F.lit(1), F.lit(_ACF_MAX_LAG))
        ).alias("lag"),
    )
    # guard: the 1..n-k index sequence needs n-k >= 1 (gotcha 10).
    # No otherwise(0): when n <= lag the oracle's generate_series is
    # empty so its sum — and acf — is NULL; a 0 here would be a
    # semantic divergence on very short daily series (ADVICE r7).
    num_units = F.when(
        F.col("n") > F.col("lag"),
        F.aggregate(
            F.transform(
                F.sequence(F.lit(1), (F.col("n") - F.col("lag")).cast("int")),
                lambda i: units(
                    (F.element_at("xs", i) - F.col("mu"))
                    * (
                        F.element_at("xs", i + F.col("lag").cast("int"))
                        - F.col("mu")
                    )
                ),
            ),
            F.lit(0).cast("long"),
            lambda acc, t: acc + t,
        ),
    )
    return lags.select(
        F.col("lag").cast("long"),
        R.r(num_units.cast("double") / F.lit(1e8) / F.col("d"), 6).alias(
            "acf"
        ),
    )


# --- exact 10% trimmed mean per group ------------------------------------------
# The robust-mean sibling of winsorize_values: drop the lowest and
# highest floor(n/10) observations per priority and average the rest —
# EXACTLY, on the cents grid: each distinct value's contribution to
# the trimmed tails is v * clamp(k - cum_before, 0, c) (ascending for
# the bottom tail, descending for the top), so ties straddling the
# trim boundary are cut partially and the kept sum is
# total - bottom - top in exact integers. Windows run per priority
# over the bounded value grid, never per row.
_TRIMMED_ORACLE = """
WITH cents_t AS (
    SELECT o_orderpriority AS priority,
           CAST(round(o_totalprice * 100) AS BIGINT) AS v
    FROM orders
),
grid AS (
    SELECT priority, v, count(*)::BIGINT AS c
    FROM cents_t GROUP BY 1, 2
),
tot AS (
    SELECT priority, sum(c)::BIGINT AS n, sum(v * c)::BIGINT AS s
    FROM grid GROUP BY 1
),
w AS (
    SELECT g.priority, g.v, g.c, t.n, t.s, (t.n // 10) AS k,
           coalesce(sum(g.c) OVER (PARTITION BY g.priority ORDER BY g.v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               ::BIGINT AS cum_lo,
           coalesce(sum(g.c) OVER (PARTITION BY g.priority ORDER BY g.v DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               ::BIGINT AS cum_hi
    FROM grid g JOIN tot t USING (priority)
),
trims AS (
    SELECT priority, n, s, k,
           sum(v * least(c, greatest(0, k - cum_lo)))::BIGINT AS bot,
           sum(v * least(c, greatest(0, k - cum_hi)))::BIGINT AS top
    FROM w GROUP BY 1, 2, 3, 4
)
SELECT priority, n, k AS n_trimmed_each_side,
       round(s * 1.0 / n / 100 * 10000) / 10000 + 0.0 AS mean,
       round((s - bot - top) * 1.0 / (n - 2 * k) / 100 * 10000) / 10000
           + 0.0 AS trimmed_mean
FROM trims
"""


@register("trimmed_mean_priority", oracle=_TRIMMED_ORACLE)
def trimmed_mean_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
    )
    grid = orders.groupBy("priority", "v").agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = grid.groupBy("priority").agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("v") * F.col("c")).cast("long").alias("s"),
    )
    w_lo = (
        Window.partitionBy("priority")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_hi = (
        Window.partitionBy("priority")
        .orderBy(F.desc("v"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w = (
        grid.join(tot, "priority")
        .withColumn("k", F.expr("n div 10"))
        .withColumn(
            "cum_lo", F.coalesce(F.sum("c").over(w_lo), F.lit(0)).cast("long")
        )
        .withColumn(
            "cum_hi", F.coalesce(F.sum("c").over(w_hi), F.lit(0)).cast("long")
        )
    )
    clamp_lo = F.least(
        F.col("c"), F.greatest(F.lit(0), F.col("k") - F.col("cum_lo"))
    )
    clamp_hi = F.least(
        F.col("c"), F.greatest(F.lit(0), F.col("k") - F.col("cum_hi"))
    )
    trims = w.groupBy("priority", "n", "s", "k").agg(
        F.sum(F.col("v") * clamp_lo).cast("long").alias("bot"),
        F.sum(F.col("v") * clamp_hi).cast("long").alias("top"),
    )
    return trims.select(
        "priority",
        "n",
        F.col("k").alias("n_trimmed_each_side"),
        R.r(F.col("s") * F.lit(1.0) / F.col("n") / F.lit(100), 4).alias(
            "mean"
        ),
        R.r(
            (F.col("s") - F.col("bot") - F.col("top"))
            * F.lit(1.0)
            / (F.col("n") - 2 * F.col("k"))
            / F.lit(100),
            4,
        ).alias("trimmed_mean"),
    )


# --- CUPED variance reduction (controlled experiments) --------------------------
# The standard A/B-test variance killer (Deng et al. 2013, CUPED):
# adjust each unit's post-period metric by theta times its PRE-period
# metric, theta = cov(x,y)/var(x) — removes the predictable
# between-user component. Variant = user_id % 2 (a deterministic
# hash split), pre = Jan 1-15, post = Jan 16-30. Group-adjusted means
# need NO per-user pass beyond the sums: adj_mean_g = mean_y_g -
# theta*(mean_x_g - mean_x), all from exact integer cents sums (the
# per-user x·y / x² cross-moments go through HUGEINT/DECIMAL so sf1+
# magnitudes fit exactly — CLAUDE.md gotcha on exact-integer sums;
# note past 38 digits non-ANSI Spark would return NULL, not raise).
# rho² = cov²/(var_x·var_y) reports the achievable variance reduction.
_CUPED_SPLIT = "2024-01-16"

_CUPED_ORACLE = f"""
WITH per_user AS (
    SELECT user_id,
           sum(CASE WHEN ts < TIMESTAMP '{_CUPED_SPLIT}'
                    THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
               AS x,
           sum(CASE WHEN ts >= TIMESTAMP '{_CUPED_SPLIT}'
                    THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
               AS y
    FROM events GROUP BY 1
),
m AS (
    SELECT count(*)::BIGINT AS n,
           sum(x::HUGEINT) AS sx, sum(y::HUGEINT) AS sy,
           sum(x::HUGEINT * x) AS sxx,
           sum(x::HUGEINT * y) AS sxy,
           sum(y::HUGEINT * y) AS syy
    FROM per_user
),
th AS (
    SELECT n, sx,
           (n * sxy - sx * sy)::DOUBLE / (n * sxx - sx * sx)::DOUBLE
               AS theta,
           ((n * sxy - sx * sy)::DOUBLE * (n * sxy - sx * sy)::DOUBLE)
               / ((n * sxx - sx * sx)::DOUBLE
                  * (n * syy - sy * sy)::DOUBLE) AS rho2
    FROM m
),
g AS (
    SELECT user_id % 2 AS variant, count(*)::BIGINT AS n_users,
           sum(x::HUGEINT) AS gx, sum(y::HUGEINT) AS gy
    FROM per_user GROUP BY 1
)
SELECT g.variant, g.n_users,
       round(gx::DOUBLE / g.n_users / 100 * 10000) / 10000 + 0.0
           AS mean_pre,
       round(gy::DOUBLE / g.n_users / 100 * 10000) / 10000 + 0.0
           AS mean_post,
       round((gy::DOUBLE / g.n_users
              - th.theta * (gx::DOUBLE / g.n_users
                            - th.sx::DOUBLE / th.n)) / 100 * 10000)
           / 10000 + 0.0 AS adjusted_mean,
       round(th.theta * 1000000) / 1000000 + 0.0 AS theta,
       round(th.rho2 * 1000000) / 1000000 + 0.0 AS rho2
FROM g, th
"""


@register("cuped_variance_reduction", oracle=_CUPED_ORACLE)
def cuped_variance_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from swat_mapreduce_spark.sources.readers import read_table as _rt

    ev = _rt(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    split = F.lit(_CUPED_SPLIT).cast("timestamp")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < split, F.col("cents")).otherwise(0))
        .cast("long")
        .alias("x"),
        F.sum(F.when(F.col("ts") >= split, F.col("cents")).otherwise(0))
        .cast("long")
        .alias("y"),
    )

    def _d(c):
        return F.col(c).cast("decimal(19,0)")

    m = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_d("x")).alias("sx"),
        F.sum(_d("y")).alias("sy"),
        F.sum(_d("x") * _d("x")).alias("sxx"),
        F.sum(_d("x") * _d("y")).alias("sxy"),
        F.sum(_d("y") * _d("y")).alias("syy"),
    )
    nn = F.col("n").cast("decimal(19,0)")
    cov_n = (nn * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    varx_n = (nn * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vary_n = (nn * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    th = m.select(
        "n",
        "sx",
        (cov_n / varx_n).alias("theta"),
        ((cov_n * cov_n) / (varx_n * vary_n)).alias("rho2"),
    )
    g = per_user.groupBy((F.col("user_id") % 2).alias("variant")).agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(_d("x")).alias("gx"),
        F.sum(_d("y")).alias("gy"),
    )
    j = g.crossJoin(F.broadcast(th))
    mean_pre_c = F.col("gx").cast("double") / F.col("n_users")
    mean_post_c = F.col("gy").cast("double") / F.col("n_users")
    grand_pre_c = F.col("sx").cast("double") / F.col("n")
    return j.select(
        F.col("variant").cast("long"),
        F.col("n_users").cast("long"),
        R.r(mean_pre_c / 100, 4).alias("mean_pre"),
        R.r(mean_post_c / 100, 4).alias("mean_post"),
        R.r(
            (mean_post_c - F.col("theta") * (mean_pre_c - grand_pre_c))
            / 100,
            4,
        ).alias("adjusted_mean"),
        R.r("theta", 6).alias("theta"),
        R.r("rho2", 6).alias("rho2"),
    )


# --- Welch's unequal-variance t-test ---------------------------------------
# The workhorse two-sample mean test (Welch 1947) the experimentation
# stack was missing: purchase value by variant (user_id % 2), UNEQUAL
# variances, Welch-Satterthwaite df. Determinism: group moments are
# exact integer cents sums (n, Σx, Σx² — the squared-cents sum goes
# through DECIMAL(38,0), gotcha 2/8); everything after is IEEE
# +,-,*,/,sqrt on exact-int-derived doubles — NO libm call anywhere,
# so both engines compute bit-identical t and df before the one final
# 4dp rounding. significant_z = |t| > 1.96 (normal approximation; the
# t CDF needs an incomplete beta neither engine exposes portably).
_WELCH_ORACLE = """
WITH v AS (
    SELECT (user_id % 2)::BIGINT AS variant,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events WHERE event_type = 'purchase'
),
m AS (
    SELECT variant,
           count(*)::BIGINT AS n,
           sum(cents)::BIGINT AS s,
           sum(CAST(cents AS DECIMAL(38,0)) * cents) AS ss
    FROM v GROUP BY 1
),
w AS (
    SELECT a.n AS na, b.n AS nb,
           a.s::DOUBLE / a.n AS ma, b.s::DOUBLE / b.n AS mb,
           (a.ss::DOUBLE - (a.s::DOUBLE * a.s::DOUBLE) / a.n)
               / (a.n - 1) AS va,
           (b.ss::DOUBLE - (b.s::DOUBLE * b.s::DOUBLE) / b.n)
               / (b.n - 1) AS vb
    FROM m a JOIN m b ON a.variant = 0 AND b.variant = 1
)
SELECT na, nb,
       round(ma / 100 * 10000) / 10000 + 0.0 AS mean_a,
       round(mb / 100 * 10000) / 10000 + 0.0 AS mean_b,
       round((ma - mb) / sqrt(va / na + vb / nb) * 10000) / 10000 + 0.0
           AS t_stat,
       round(((va / na + vb / nb) * (va / na + vb / nb))
             / ((va / na) * (va / na) / (na - 1)
                + (vb / nb) * (vb / nb) / (nb - 1)) * 100) / 100 + 0.0
           AS welch_df,
       abs((ma - mb) / sqrt(va / na + vb / nb)) > 1.96 AS significant_z
FROM w
"""


@register("welch_ttest_value_by_variant", oracle=_WELCH_ORACLE)
def welch_ttest_value_by_variant(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """One corpus scan to two moment rows; all test math on those.
    At 100 TB this is a single map-side-combined groupBy to 2 rows —
    the cheapest possible shuffle shape."""
    ev = read_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    v = ev.select(
        (F.col("user_id") % 2).cast("long").alias("variant"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    m = v.groupBy("variant").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").alias("s"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents")).alias(
            "ss"
        ),
    )
    a = m.filter(F.col("variant") == 0).select(
        F.col("n").alias("na"), F.col("s").alias("sa"),
        F.col("ss").alias("ssa"),
    )
    b = m.filter(F.col("variant") == 1).select(
        F.col("n").alias("nb"), F.col("s").alias("sb"),
        F.col("ss").alias("ssb"),
    )
    j = a.crossJoin(F.broadcast(b))
    ma = F.col("sa").cast("double") / F.col("na")
    mb = F.col("sb").cast("double") / F.col("nb")
    va = (
        F.col("ssa").cast("double")
        - (F.col("sa").cast("double") * F.col("sa").cast("double"))
        / F.col("na")
    ) / (F.col("na") - 1)
    vb = (
        F.col("ssb").cast("double")
        - (F.col("sb").cast("double") * F.col("sb").cast("double"))
        / F.col("nb")
    ) / (F.col("nb") - 1)
    sa2 = va / F.col("na") + vb / F.col("nb")
    t = (ma - mb) / F.sqrt(sa2)
    df = (sa2 * sa2) / (
        (va / F.col("na")) * (va / F.col("na")) / (F.col("na") - 1)
        + (vb / F.col("nb")) * (vb / F.col("nb")) / (F.col("nb") - 1)
    )
    return j.select(
        "na",
        "nb",
        R.r(ma / 100, 4).alias("mean_a"),
        R.r(mb / 100, 4).alias("mean_b"),
        R.r(t, 4).alias("t_stat"),
        R.r(df, 2).alias("welch_df"),
        (F.abs(t) > F.lit(1.96)).alias("significant_z"),
    )


# --- sequential probability ratio test (SPRT) over daily conversion -------------
# Wald's SPRT — the sequential A/B stopping rule a pipeline runs to
# stop an experiment EARLY: daily purchase-conversion counts feed a
# cumulative log-likelihood ratio for H1: p=0.20 vs H0: p=0.15, with
# Wald boundaries ln((1-β)/α) / ln(β/(1-α)) at α=β=0.05. NO runtime
# libm anywhere: the four log constants are PYTHON-COMPUTED integer
# 1e-8-unit literals embedded in both engines, so each day's LLR
# increment x·L1 + (n−x)·L0 and its running sum are exact int64
# arithmetic; only the final display division is floating point.
# Both the running state per day and the overall first-crossing
# decision are emitted. Scale: one corpus scan to the ≤ ~30-day
# count table; the cumulative window runs on that bounded table.
import math as _math

_SPRT_P0 = 0.15
_SPRT_P1 = 0.20
_SPRT_L1_U = round(_math.log(_SPRT_P1 / _SPRT_P0) * 1e8)  # per success
_SPRT_L0_U = round(
    _math.log((1 - _SPRT_P1) / (1 - _SPRT_P0)) * 1e8
)  # per failure
_SPRT_LNA_U = round(_math.log(0.95 / 0.05) * 1e8)  # accept H1 above
_SPRT_LNB_U = round(_math.log(0.05 / 0.95) * 1e8)  # accept H0 below

_SPRT_ORACLE = f"""
WITH d AS (
    SELECT ts::DATE AS day,
           count(*) FILTER (WHERE event_type = 'purchase')::BIGINT AS x,
           count(*)::BIGINT AS n
    FROM events GROUP BY 1
),
c AS (
    SELECT day, x, n,
           sum(x * {_SPRT_L1_U} + (n - x) * ({_SPRT_L0_U}))
               OVER (ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               ::BIGINT AS cum_u
    FROM d
),
s AS (
    SELECT day, x, n, cum_u,
           CASE WHEN cum_u >= {_SPRT_LNA_U} THEN 'accept_h1'
                WHEN cum_u <= {_SPRT_LNB_U} THEN 'accept_h0'
                ELSE 'continue' END AS state
    FROM c
)
SELECT s.day, s.x AS n_success, s.n AS n_trials,
       round(s.cum_u * 1.0 / 100000000 * 10000) / 10000 + 0.0 AS cum_llr,
       s.state,
       s.day = (SELECT min(day) FROM s WHERE state <> 'continue')
           AS is_decision_day
FROM s
"""


@register("sprt_sequential_conversion", oracle=_SPRT_ORACLE)
def sprt_sequential_conversion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = (
        read_table(spark, sf_dir, "events")
        .select(F.col("ts").cast("date").alias("day"), "*")
        .groupBy("day")
        .agg(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            .cast("long")
            .alias("x"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # bounded-input window: the daily table is calendar-bounded
    c = d.withColumn(
        "cum_u",
        F.sum(
            F.col("x") * F.lit(_SPRT_L1_U)
            + (F.col("n") - F.col("x")) * F.lit(_SPRT_L0_U)
        ).over(w),
    )
    state = (
        F.when(F.col("cum_u") >= _SPRT_LNA_U, "accept_h1")
        .when(F.col("cum_u") <= _SPRT_LNB_U, "accept_h0")
        .otherwise("continue")
    )
    s = c.withColumn("state", state)
    first = s.filter(F.col("state") != "continue").agg(
        F.min("day").alias("dec_day")
    )
    return s.crossJoin(F.broadcast(first)).select(
        "day",
        F.col("x").alias("n_success"),
        F.col("n").alias("n_trials"),
        R.r(F.col("cum_u").cast("double") / F.lit(1e8), 4).alias(
            "cum_llr"
        ),
        "state",
        (F.col("day") == F.col("dec_day")).alias("is_decision_day"),
    )


# --- 1-D Wasserstein (earth-mover) distance between length distributions --------
# The optimal-transport drift measure next to KS (max CDF gap) and PSI
# (binned KL): W1 = ∫|F_a − F_b| dv over the doc-length axis between
# the 'en' slice and the rest of the corpus — unlike KS it weighs HOW
# FAR mass must move, the right number for "did the length profile
# shift". EXACT arithmetic: on the sorted distinct-length grid,
# |F_a − F_b|·gap = |ca·nb − cb·na|·gap / (na·nb) has an integer
# numerator — summed as DECIMAL(38,0), divided ONCE at the end. The
# grid is bounded by the length domain (≤ ~600 rows at any corpus
# size), so the cumulative windows are bounded-input.
_W1_ORACLE = """
WITH v AS (
    SELECT length(text)::BIGINT AS len, (lang = 'en') AS a FROM documents
),
tot AS (
    SELECT sum(CASE WHEN a THEN 1 ELSE 0 END)::BIGINT AS na,
           sum(CASE WHEN a THEN 0 ELSE 1 END)::BIGINT AS nb
    FROM v
),
g AS (
    SELECT len,
           sum(CASE WHEN a THEN 1 ELSE 0 END)::BIGINT AS ca,
           sum(CASE WHEN a THEN 0 ELSE 1 END)::BIGINT AS cb
    FROM v GROUP BY len
),
c AS (
    SELECT len,
           sum(ca) OVER w AS fa, sum(cb) OVER w AS fb,
           lead(len) OVER (ORDER BY len) AS nxt
    FROM g WINDOW w AS (ORDER BY len
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
s AS (
    SELECT sum(CAST(abs(fa * t.nb - fb * t.na) AS DECIMAL(38,0))
               * (nxt - len)) AS num,
           count(*)::BIGINT AS n_grid
    FROM c, tot t WHERE nxt IS NOT NULL
)
SELECT t.na, t.nb, s.n_grid,
       round(s.num::DOUBLE / (t.na * t.nb) * 10000) / 10000 + 0.0
           AS w1_distance
FROM s, tot t
"""


@register("wasserstein1d_length_drift", oracle=_W1_ORACLE)
def wasserstein1d_length_drift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    v = read_table(spark, sf_dir, "documents").select(
        F.length("text").cast("long").alias("len"),
        (F.col("lang") == "en").alias("a"),
    )
    tot = v.agg(
        F.sum(F.when(F.col("a"), 1).otherwise(0)).cast("long").alias("na"),
        F.sum(F.when(F.col("a"), 0).otherwise(1)).cast("long").alias("nb"),
    )
    g = v.groupBy("len").agg(
        F.sum(F.when(F.col("a"), 1).otherwise(0)).cast("long").alias("ca"),
        F.sum(F.when(F.col("a"), 0).otherwise(1)).cast("long").alias("cb"),
    )
    w = Window.orderBy("len").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # bounded-input windows: the grid is the distinct-length domain
    c = g.select(
        "len",
        F.sum("ca").over(w).alias("fa"),
        F.sum("cb").over(w).alias("fb"),
        F.lead("len").over(Window.orderBy("len")).alias("nxt"),
    )
    s = (
        c.filter(F.col("nxt").isNotNull())
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                F.abs(
                    F.col("fa") * F.col("nb") - F.col("fb") * F.col("na")
                ).cast("decimal(38,0)")
                * (F.col("nxt") - F.col("len"))
            ).alias("num"),
            F.count(F.lit(1)).cast("long").alias("n_grid"),
        )
    )
    return s.crossJoin(F.broadcast(tot)).select(
        "na",
        "nb",
        "n_grid",
        R.r(
            F.col("num").cast("double") / (F.col("na") * F.col("nb")), 4
        ).alias("w1_distance"),
    )


# --- k-anonymity / l-diversity release audit -------------------------------------
# The governance check before releasing quasi-identifier columns
# (Sweeney 2002; Machanavajjhala 2007): group the corpus by the QI
# tuple (source, 100-char length bucket) and report how much of the
# corpus sits in groups smaller than k=5 (re-identifiable) and in
# groups whose sensitive attribute (lang) has fewer than l=2 distinct
# values (attribute-disclosable). All exact integer counts — one
# corpus groupBy to the bounded QI-cell table, one rollup.
_KANON_K = 5
_KANON_L = 2

_KANON_ORACLE = f"""
WITH q AS (
    SELECT source, (length(text) // 100)::BIGINT AS len_bucket,
           count(*)::BIGINT AS n,
           count(DISTINCT lang)::BIGINT AS l_div
    FROM documents GROUP BY 1, 2
)
SELECT count(*)::BIGINT AS n_groups,
       sum(n)::BIGINT AS n_rows,
       min(n)::BIGINT AS min_group_size,
       sum(CASE WHEN n < {_KANON_K} THEN 1 ELSE 0 END)::BIGINT
           AS n_groups_below_k,
       sum(CASE WHEN n < {_KANON_K} THEN n ELSE 0 END)::BIGINT
           AS n_rows_below_k,
       round(sum(CASE WHEN n < {_KANON_K} THEN n ELSE 0 END) * 10000.0
             / sum(n)) / 10000 + 0.0 AS share_below_k,
       min(l_div)::BIGINT AS min_l_diversity,
       sum(CASE WHEN l_div < {_KANON_L} THEN n ELSE 0 END)::BIGINT
           AS n_rows_below_l
FROM q
"""


@register("k_anonymity_audit", oracle=_KANON_ORACLE)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = (
        read_table(spark, sf_dir, "documents")
        .groupBy(
            "source",
            (F.length("text").cast("long") / 100)
            .cast("long")
            .alias("len_bucket"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.countDistinct("lang").cast("long").alias("l_div"),
        )
    )
    below_k = F.when(F.col("n") < _KANON_K, F.col("n")).otherwise(0)
    return q.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum("n").cast("long").alias("n_rows"),
        F.min("n").cast("long").alias("min_group_size"),
        F.sum(F.when(F.col("n") < _KANON_K, 1).otherwise(0))
        .cast("long")
        .alias("n_groups_below_k"),
        F.sum(below_k).cast("long").alias("n_rows_below_k"),
        (
            F.round(F.sum(below_k) * F.lit(10000.0) / F.sum("n"))
            / F.lit(10000.0)
            + F.lit(0.0)
        ).alias("share_below_k"),
        F.min("l_div").cast("long").alias("min_l_diversity"),
        F.sum(F.when(F.col("l_div") < _KANON_L, F.col("n")).otherwise(0))
        .cast("long")
        .alias("n_rows_below_l"),
    )


# --- UCB1 bandit allocation replay ------------------------------------------------
# The adaptive-experimentation primitive (Auer et al. 2002): replay
# the UCB1 policy over the daily two-arm conversion series (arm =
# user_id % 2) — each day the policy plays the arm with the highest
# upper confidence index mean + sqrt(2·ln t / plays) and observes
# that day's (conversions, trials). Days 1-2 force one play per arm.
# Determinism: means are IEEE divisions of exact int sums; the full
# index snaps to an INTEGER 1e-6 unit before the comparison (ties →
# arm 0), so the walk is identical on both engines — the Spark side
# folds the ≤ ~30-day bounded metadata driver-side with the shared
# Decimal-HALF_UP quantizer (gotcha 13a: never bare round()); the
# oracle replays the identical walk as a recursive CTE. Scale: one
# corpus scan to the |days|×|arms| count table; the walk is metadata.
_UCB_ORACLE = """
WITH RECURSIVE d AS (
    SELECT day, row_number() OVER (ORDER BY day) AS i, x0, n0, x1, n1
    FROM (
        SELECT ts::DATE AS day,
               sum(CASE WHEN user_id % 2 = 0 AND event_type = 'purchase'
                        THEN 1 ELSE 0 END)::BIGINT AS x0,
               sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT
                   AS n0,
               sum(CASE WHEN user_id % 2 = 1 AND event_type = 'purchase'
                        THEN 1 ELSE 0 END)::BIGINT AS x1,
               sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)::BIGINT
                   AS n1
        FROM events GROUP BY 1
    )
),
rec AS (
    SELECT d2.day, 2::BIGINT AS i, 1::BIGINT AS chosen,
           CAST(NULL AS BIGINT) AS i0_u, CAST(NULL AS BIGINT) AS i1_u,
           1::BIGINT AS p0, d1.x0 AS xs0, d1.n0 AS ns0,
           1::BIGINT AS p1, d2.x1 AS xs1, d2.n1 AS ns1
    FROM d d1, d d2 WHERE d1.i = 1 AND d2.i = 2
    UNION ALL
    SELECT d.day, d.i,
           CASE WHEN CAST(round((r.xs0 * 1.0 / r.ns0
                     + sqrt(2.0 * ln(d.i) / r.p0)) * 1000000) AS BIGINT)
                  >= CAST(round((r.xs1 * 1.0 / r.ns1
                     + sqrt(2.0 * ln(d.i) / r.p1)) * 1000000) AS BIGINT)
                THEN 0 ELSE 1 END,
           CAST(round((r.xs0 * 1.0 / r.ns0
                + sqrt(2.0 * ln(d.i) / r.p0)) * 1000000) AS BIGINT),
           CAST(round((r.xs1 * 1.0 / r.ns1
                + sqrt(2.0 * ln(d.i) / r.p1)) * 1000000) AS BIGINT),
           r.p0 + CASE WHEN CAST(round((r.xs0 * 1.0 / r.ns0
                     + sqrt(2.0 * ln(d.i) / r.p0)) * 1000000) AS BIGINT)
                  >= CAST(round((r.xs1 * 1.0 / r.ns1
                     + sqrt(2.0 * ln(d.i) / r.p1)) * 1000000) AS BIGINT)
                THEN 1 ELSE 0 END,
           r.xs0 + CASE WHEN CAST(round((r.xs0 * 1.0 / r.ns0
                     + sqrt(2.0 * ln(d.i) / r.p0)) * 1000000) AS BIGINT)
                  >= CAST(round((r.xs1 * 1.0 / r.ns1
                     + sqrt(2.0 * ln(d.i) / r.p1)) * 1000000) AS BIGINT)
                THEN d.x0 ELSE 0 END,
           r.ns0 + CASE WHEN CAST(round((r.xs0 * 1.0 / r.ns0
                     + sqrt(2.0 * ln(d.i) / r.p0)) * 1000000) AS BIGINT)
                  >= CAST(round((r.xs1 * 1.0 / r.ns1
                     + sqrt(2.0 * ln(d.i) / r.p1)) * 1000000) AS BIGINT)
                THEN d.n0 ELSE 0 END,
           r.p1 + CASE WHEN CAST(round((r.xs0 * 1.0 / r.ns0
                     + sqrt(2.0 * ln(d.i) / r.p0)) * 1000000) AS BIGINT)
                  >= CAST(round((r.xs1 * 1.0 / r.ns1
                     + sqrt(2.0 * ln(d.i) / r.p1)) * 1000000) AS BIGINT)
                THEN 0 ELSE 1 END,
           r.xs1 + CASE WHEN CAST(round((r.xs0 * 1.0 / r.ns0
                     + sqrt(2.0 * ln(d.i) / r.p0)) * 1000000) AS BIGINT)
                  >= CAST(round((r.xs1 * 1.0 / r.ns1
                     + sqrt(2.0 * ln(d.i) / r.p1)) * 1000000) AS BIGINT)
                THEN 0 ELSE d.x1 END,
           r.ns1 + CASE WHEN CAST(round((r.xs0 * 1.0 / r.ns0
                     + sqrt(2.0 * ln(d.i) / r.p0)) * 1000000) AS BIGINT)
                  >= CAST(round((r.xs1 * 1.0 / r.ns1
                     + sqrt(2.0 * ln(d.i) / r.p1)) * 1000000) AS BIGINT)
                THEN 0 ELSE d.n1 END
    FROM rec r JOIN d ON d.i = r.i + 1
)
SELECT day, i AS t, chosen AS chosen_arm,
       round(i0_u * 1.0 / 1000000 * 10000) / 10000 + 0.0 AS idx_arm0,
       round(i1_u * 1.0 / 1000000 * 10000) / 10000 + 0.0 AS idx_arm1,
       p0 AS plays_arm0, p1 AS plays_arm1
FROM rec
UNION ALL
SELECT d.day, 1, 0, NULL, NULL, 1, 0 FROM d WHERE d.i = 1
"""


@register("ucb1_arm_allocation_replay", oracle=_UCB_ORACLE)
def ucb1_arm_allocation_replay(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import math

    from swat_mapreduce_spark.queries.curation import _ri, _rp

    daily = (
        read_table(spark, sf_dir, "events")
        .select(F.col("ts").cast("date").alias("day"), "*")
        .groupBy("day")
        .agg(
            F.sum(
                F.when(
                    (F.col("user_id") % 2 == 0)
                    & (F.col("event_type") == "purchase"),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("x0"),
            F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0))
            .cast("long")
            .alias("n0"),
            F.sum(
                F.when(
                    (F.col("user_id") % 2 == 1)
                    & (F.col("event_type") == "purchase"),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("x1"),
            F.sum(F.when(F.col("user_id") % 2 == 1, 1).otherwise(0))
            .cast("long")
            .alias("n1"),
        )
        .orderBy("day")
        .collect()
    )  # bounded driver state: |days| rows
    rows = []
    if len(daily) >= 2:
        d1, d2 = daily[0], daily[1]
        rows.append((d1["day"], 1, 0, None, None, 1, 0))
        rows.append((d2["day"], 2, 1, None, None, 1, 1))
        p0, xs0, ns0 = 1, int(d1["x0"]), int(d1["n0"])
        p1, xs1, ns1 = 1, int(d2["x1"]), int(d2["n1"])
        for i in range(3, len(daily) + 1):
            d = daily[i - 1]
            i0 = _ri(xs0 / ns0 + math.sqrt(2.0 * math.log(i) / p0), 6)
            i1 = _ri(xs1 / ns1 + math.sqrt(2.0 * math.log(i) / p1), 6)
            if i0 >= i1:
                chosen = 0
                p0, xs0, ns0 = p0 + 1, xs0 + int(d["x0"]), ns0 + int(d["n0"])
            else:
                chosen = 1
                p1, xs1, ns1 = p1 + 1, xs1 + int(d["x1"]), ns1 + int(d["n1"])
            rows.append(
                (
                    d["day"],
                    i,
                    chosen,
                    _rp(i0 / 1e6, 4) + 0.0,
                    _rp(i1 / 1e6, 4) + 0.0,
                    p0,
                    p1,
                )
            )
    return spark.createDataFrame(
        rows,
        "day date, t long, chosen_arm long, idx_arm0 double,"
        " idx_arm1 double, plays_arm0 long, plays_arm1 long",
    )


# --- one-way ANOVA F-test: order value by priority -------------------------------
# The classic k-group mean test completing the Welch pair: does mean
# order value differ across the 5 priority classes? One corpus scan to
# k moment rows (n, Σcents BIGINT, Σcents² DECIMAL(38,0) — gotcha
# 2/8), then SSB/SSW assembled from per-group terms SNAPPED to integer
# 1e6-cents² units before the cross-group sum (a 5-double sum is
# accumulation-order-dependent; snapped int64 sums are not — the same
# discipline as markov_entropy_rate). F and η² are IEEE ratios of the
# exact snapped integers; significance compares the unrounded F
# against the embedded F(4,∞) 5% critical value — no libm anywhere.
# Scale: map-side-combined groupBy to 5 rows; nothing else moves.
_ANOVA_T_U = 1_000_000  # snap SSB/SSW terms to 1e6 cents^2 units
_ANOVA_F_CRIT = 2.3719  # F(4, inf) at alpha = 0.05

_ANOVA_ORACLE = f"""
WITH v AS (
    SELECT o_orderpriority AS priority,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
),
m AS (
    SELECT priority, count(*)::BIGINT AS n, sum(cents)::BIGINT AS s,
           sum(CAST(cents AS DECIMAL(38,0)) * cents) AS ss
    FROM v GROUP BY 1
),
g AS (
    SELECT sum(n)::BIGINT AS nn, sum(s)::BIGINT AS gs,
           count(*)::BIGINT AS k
    FROM m
),
terms AS (
    SELECT m.priority, m.n, m.s,
           CAST(round(m.n * (m.s::DOUBLE / m.n - g.gs::DOUBLE / g.nn)
                      * (m.s::DOUBLE / m.n - g.gs::DOUBLE / g.nn)
                      / {_ANOVA_T_U}) AS BIGINT) AS ssb_u,
           CAST(round((m.ss::DOUBLE
                       - (m.s::DOUBLE * m.s::DOUBLE) / m.n)
                      / {_ANOVA_T_U}) AS BIGINT) AS ssw_u
    FROM m, g
),
f AS (
    SELECT g.nn, g.k,
           sum(terms.ssb_u)::BIGINT AS ssb,
           sum(terms.ssw_u)::BIGINT AS ssw
    FROM terms, g GROUP BY 1, 2
)
SELECT t.priority, t.n AS n_orders,
       round(t.s::DOUBLE / t.n / 100 * 10000) / 10000 + 0.0
           AS mean_value,
       round((f.ssb::DOUBLE / (f.k - 1)) / (f.ssw::DOUBLE / (f.nn - f.k))
             * 10000) / 10000 + 0.0 AS f_stat,
       round(f.ssb::DOUBLE / (f.ssb + f.ssw) * 1000000) / 1000000 + 0.0
           AS eta_squared,
       (f.ssb::DOUBLE / (f.k - 1)) / (f.ssw::DOUBLE / (f.nn - f.k))
           > {_ANOVA_F_CRIT} AS significant
FROM terms t, f
"""


@register("anova_oneway_f", oracle=_ANOVA_ORACLE)
def anova_oneway_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One map-side-combined scan to 5 moment rows; every cross-group
    reduction is an exact snapped-int64 sum, so the plan is a single
    shuffle of 5 rows at any corpus size."""
    v = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    m = v.groupBy("priority").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents")).alias(
            "ss"
        ),
    )
    g = m.agg(
        F.sum("n").cast("long").alias("nn"),
        F.sum("s").cast("long").alias("gs"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    mj = F.col("s").cast("double") / F.col("n")
    gm = F.col("gs").cast("double") / F.col("nn")
    terms = m.crossJoin(F.broadcast(g)).select(
        "priority",
        "n",
        "s",
        "nn",
        "k",
        F.round(F.col("n") * (mj - gm) * (mj - gm) / F.lit(_ANOVA_T_U))
        .cast("long")
        .alias("ssb_u"),
        F.round(
            (
                F.col("ss").cast("double")
                - (F.col("s").cast("double") * F.col("s").cast("double"))
                / F.col("n")
            )
            / F.lit(_ANOVA_T_U)
        )
        .cast("long")
        .alias("ssw_u"),
    )
    f = terms.groupBy("nn", "k").agg(
        F.sum("ssb_u").cast("long").alias("ssb"),
        F.sum("ssw_u").cast("long").alias("ssw"),
    )
    fstat = (F.col("ssb").cast("double") / (F.col("k") - 1)) / (
        F.col("ssw").cast("double") / (F.col("nn") - F.col("k"))
    )
    return terms.select("priority", "n", "s").crossJoin(
        F.broadcast(f)
    ).select(
        "priority",
        F.col("n").alias("n_orders"),
        R.r(F.col("s").cast("double") / F.col("n") / 100, 4).alias(
            "mean_value"
        ),
        R.r(fstat, 4).alias("f_stat"),
        R.r(
            F.col("ssb").cast("double") / (F.col("ssb") + F.col("ssw")), 6
        ).alias("eta_squared"),
        (fstat > F.lit(_ANOVA_F_CRIT)).alias("significant"),
    )


# --- Kruskal-Wallis H: document length by language ------------------------------
# The k-group rank test (nonparametric ANOVA): does the n_chars
# distribution differ across languages? Ranks never touch per-row
# windows: midranks with ties live on the DISTINCT-LENGTH domain
# (rank2(v) = 2·cum_below(v) + t_v + 1, an exact integer in half-rank
# units), so the only ordered pass is a cumulative over the bounded
# length-domain table (global-window allowlist, same rationale as
# ks_two_sample_lengths). Per-group rank sums R2_g = Σ c_gv·rank2(v)
# go through DECIMAL(38,0) so the N² magnitude cannot wrap; the
# Σ R2_g²/n_g cross-group reduction snaps each term to integer units
# before summing (order-free). H = 3/(N(N+1))·ΣR2²/n − 3(N+1) (the
# half-unit algebra folds 12/4 → 3); the tie correction
# C = 1 − Σ(t³−t)/(N³−N) is a ratio of exact integers.
_KW_CHI2_CRIT = 9.4877  # chi2(4 df) at alpha = 0.05

_KW_ORACLE = f"""
WITH t AS (
    SELECT n_chars AS v, count(*)::BIGINT AS tv
    FROM documents GROUP BY 1
),
r AS (
    SELECT v, tv,
           (2 * (sum(tv) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tv)
            + tv + 1)::BIGINT AS rank2
    FROM t
),
c AS (
    SELECT lang, n_chars AS v, count(*)::BIGINT AS c
    FROM documents GROUP BY 1, 2
),
gr AS (
    SELECT c.lang, sum(c.c)::BIGINT AS n_g,
           sum(CAST(c.c AS DECIMAL(38,0)) * r.rank2) AS r2_g
    FROM c JOIN r USING (v) GROUP BY 1
),
nn AS (SELECT sum(n_g)::BIGINT AS n FROM gr),
hsum AS (
    SELECT sum(CAST(round(gr.r2_g::DOUBLE * gr.r2_g::DOUBLE / gr.n_g)
                    AS BIGINT))::BIGINT AS rq_u,
           count(*)::BIGINT AS k
    FROM gr
),
ties AS (
    SELECT coalesce(sum(CAST(tv AS DECIMAL(38,0)) * tv * tv - tv), 0)
               AS tie3
    FROM t WHERE tv > 1
),
h AS (
    SELECT nn.n, hsum.k,
           3.0 * hsum.rq_u / (nn.n * (nn.n + 1.0)) - 3.0 * (nn.n + 1)
               AS h_raw,
           1.0 - ties.tie3::DOUBLE
                 / (CAST(nn.n AS DECIMAL(38,0)) * nn.n * nn.n - nn.n)
                     ::DOUBLE AS cc
    FROM nn, hsum, ties
)
SELECT gr.lang, gr.n_g AS n_docs,
       round(gr.r2_g::DOUBLE / (2.0 * gr.n_g) * 10000) / 10000 + 0.0
           AS mean_rank,
       round(h.h_raw * 10000) / 10000 + 0.0 AS h_stat,
       round(h.h_raw / h.cc * 10000) / 10000 + 0.0 AS h_adjusted,
       (h.k - 1)::BIGINT AS df,
       h.h_raw / h.cc > {_KW_CHI2_CRIT} AS significant
FROM gr, h
"""


@register("kruskal_wallis_length_by_lang", oracle=_KW_ORACLE)
def kruskal_wallis_length_by_lang(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Two corpus scans collapse to the (length-domain) and
    (lang × length) count tables; every ordered pass runs on the
    bounded length domain, so rank math never shuffles documents."""
    docs = read_table(spark, sf_dir, "documents").select("lang", "n_chars")
    t = docs.groupBy(F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("tv")
    )
    r = t.withColumn(
        "rank2",
        (
            2
            * (
                F.sum("tv").over(
                    Window.orderBy("v").rowsBetween(
                        Window.unboundedPreceding, Window.currentRow
                    )
                )
                - F.col("tv")
            )
            + F.col("tv")
            + 1
        ).cast("long"),
    )
    c = docs.groupBy("lang", F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    gr = (
        c.join(F.broadcast(r.select("v", "rank2")), "v")
        .groupBy("lang")
        .agg(
            F.sum("c").cast("long").alias("n_g"),
            F.sum(
                F.col("c").cast("decimal(38,0)") * F.col("rank2")
            ).alias("r2_g"),
        )
    )
    nn = gr.agg(F.sum("n_g").cast("long").alias("n"))
    hsum = gr.agg(
        F.sum(
            F.round(
                F.col("r2_g").cast("double")
                * F.col("r2_g").cast("double")
                / F.col("n_g")
            ).cast("long")
        )
        .cast("long")
        .alias("rq_u"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    ties = t.filter(F.col("tv") > 1).agg(
        F.coalesce(
            F.sum(
                F.col("tv").cast("decimal(38,0)") * F.col("tv")
                * F.col("tv")
                - F.col("tv")
            ),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("tie3")
    )
    h = (
        nn.crossJoin(F.broadcast(hsum))
        .crossJoin(F.broadcast(ties))
        .select(
            "n",
            "k",
            (
                F.lit(3.0) * F.col("rq_u")
                / (F.col("n") * (F.col("n") + F.lit(1.0)))
                - F.lit(3.0) * (F.col("n") + 1)
            ).alias("h_raw"),
            (
                F.lit(1.0)
                - F.col("tie3").cast("double")
                / (
                    F.col("n").cast("decimal(38,0)") * F.col("n")
                    * F.col("n")
                    - F.col("n")
                ).cast("double")
            ).alias("cc"),
        )
    )
    return gr.crossJoin(F.broadcast(h)).select(
        "lang",
        F.col("n_g").alias("n_docs"),
        R.r(
            F.col("r2_g").cast("double") / (F.lit(2.0) * F.col("n_g")), 4
        ).alias("mean_rank"),
        R.r("h_raw", 4).alias("h_stat"),
        R.r(F.col("h_raw") / F.col("cc"), 4).alias("h_adjusted"),
        (F.col("k") - 1).cast("long").alias("df"),
        (F.col("h_raw") / F.col("cc") > F.lit(_KW_CHI2_CRIT)).alias(
            "significant"
        ),
    )


# --- Spearman rank correlation: daily event count vs daily value ----------------
# Monotone-association monitor between two daily metrics (how many
# events vs how much value). Midranks come from a SELF-JOIN on the
# calendar-bounded day table — r2_i = Σ_j (2·[m_j<m_i] + [m_j=m_i]) + 1
# in exact half-rank integer units, no window at all — and ρ is the
# Pearson form on those integers: every sum is exact int64, the only
# floating point is the final ratio/sqrt (IEEE, no libm), then one
# 6dp rounding. The daily value rank key is the exact DECIMAL(30,8)
# sum (gotcha 2), so rank comparisons cannot be flipped by double
# accumulation noise. Scale: one corpus scan to |days| rows; the
# O(|days|²) rank join is calendar-bounded metadata.
_SPEAR_ORACLE = """
WITH daily AS (
    SELECT ts::DATE AS day, count(*)::BIGINT AS m,
           sum(CAST(value AS DECIMAL(30,8))) AS x
    FROM events GROUP BY 1
),
rk AS (
    SELECT a.day,
           (sum(CASE WHEN b.m < a.m THEN 2
                     WHEN b.m = a.m THEN 1 ELSE 0 END) + 1)::BIGINT AS rm,
           (sum(CASE WHEN b.x < a.x THEN 2
                     WHEN b.x = a.x THEN 1 ELSE 0 END) + 1)::BIGINT AS rx
    FROM daily a, daily b GROUP BY a.day
),
s AS (
    SELECT count(*)::BIGINT AS n,
           sum(rm)::BIGINT AS sm, sum(rx)::BIGINT AS sx,
           sum(rm * rx)::BIGINT AS smx,
           sum(rm * rm)::BIGINT AS smm,
           sum(rx * rx)::BIGINT AS sxx
    FROM rk
)
SELECT n AS n_days,
       round((n * smx - sm * sx)::DOUBLE
             / sqrt((n * smm - sm * sm)::DOUBLE
                    * (n * sxx - sx * sx)::DOUBLE) * 1000000)
           / 1000000 + 0.0 AS rho_spearman,
       round((n * smx - sm * sx)::DOUBLE
             / sqrt((n * smm - sm * sm)::DOUBLE
                    * (n * sxx - sx * sx)::DOUBLE)
             * sqrt((n - 2) / (1.0
                 - ((n * smx - sm * sx)::DOUBLE
                    / sqrt((n * smm - sm * sm)::DOUBLE
                           * (n * sxx - sx * sx)::DOUBLE))
                   * ((n * smx - sm * sx)::DOUBLE
                      / sqrt((n * smm - sm * sm)::DOUBLE
                             * (n * sxx - sx * sx)::DOUBLE))))
             * 10000) / 10000 + 0.0 AS t_stat
FROM s
"""


@register("spearman_corr_daily", oracle=_SPEAR_ORACLE)
def spearman_corr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        read_table(spark, sf_dir, "events")
        .select(F.col("ts").cast("date").alias("day"), "*")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("m"),
            F.sum(F.col("value").cast("decimal(30,8)")).alias("x"),
        )
    )
    a = daily.select(
        F.col("day").alias("da"), F.col("m").alias("ma"),
        F.col("x").alias("xa"),
    )
    b = daily.select(F.col("m").alias("mb"), F.col("x").alias("xb"))
    rk = (
        a.crossJoin(F.broadcast(b))
        .groupBy("da")
        .agg(
            (
                F.sum(
                    F.when(F.col("mb") < F.col("ma"), 2)
                    .when(F.col("mb") == F.col("ma"), 1)
                    .otherwise(0)
                )
                + 1
            )
            .cast("long")
            .alias("rm"),
            (
                F.sum(
                    F.when(F.col("xb") < F.col("xa"), 2)
                    .when(F.col("xb") == F.col("xa"), 1)
                    .otherwise(0)
                )
                + 1
            )
            .cast("long")
            .alias("rx"),
        )
    )
    s = rk.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("rm").cast("long").alias("sm"),
        F.sum("rx").cast("long").alias("sx"),
        F.sum(F.col("rm") * F.col("rx")).cast("long").alias("smx"),
        F.sum(F.col("rm") * F.col("rm")).cast("long").alias("smm"),
        F.sum(F.col("rx") * F.col("rx")).cast("long").alias("sxx"),
    )
    num = (F.col("n") * F.col("smx") - F.col("sm") * F.col("sx")).cast(
        "double"
    )
    den = F.sqrt(
        (F.col("n") * F.col("smm") - F.col("sm") * F.col("sm")).cast(
            "double"
        )
        * (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
            "double"
        )
    )
    rho = num / den
    t = rho * F.sqrt((F.col("n") - 2) / (F.lit(1.0) - rho * rho))
    return s.select(
        F.col("n").alias("n_days"),
        R.r(rho, 6).alias("rho_spearman"),
        R.r(t, 4).alias("t_stat"),
    )


# --- Kendall tau-b: daily event count vs daily value ----------------------------
# The concordance twin of Spearman: tau-b with full tie correction
# over the same two daily metrics. All four pair classes (concordant,
# discordant, tied-in-m, tied-in-x) are exact integer counts from the
# day-pair join (calendar-bounded: |days|·(|days|−1)/2 pairs of
# metadata); tau_b = (C−D)/√((n0−n1)(n0−n2)) is the only floating
# point, computed identically in IEEE on both engines from the same
# int64 inputs. The value key is the exact DECIMAL daily sum, so tie
# detection is exact (gotcha 2).
_KT_ORACLE = """
WITH daily AS (
    SELECT ts::DATE AS day, count(*)::BIGINT AS m,
           sum(CAST(value AS DECIMAL(30,8))) AS x
    FROM events GROUP BY 1
),
p AS (
    SELECT CASE WHEN b.m > a.m THEN 1 WHEN b.m < a.m THEN -1 ELSE 0 END
               AS dm,
           CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END
               AS dx
    FROM daily a JOIN daily b ON b.day > a.day
),
s AS (
    SELECT count(*)::BIGINT AS n0,
           sum(CASE WHEN dm * dx > 0 THEN 1 ELSE 0 END)::BIGINT AS c,
           sum(CASE WHEN dm * dx < 0 THEN 1 ELSE 0 END)::BIGINT AS d,
           sum(CASE WHEN dm = 0 THEN 1 ELSE 0 END)::BIGINT AS n1,
           sum(CASE WHEN dx = 0 THEN 1 ELSE 0 END)::BIGINT AS n2
    FROM p
),
nn AS (SELECT count(*)::BIGINT AS n_days FROM daily)
SELECT nn.n_days, s.n0 AS n_pairs, s.c AS concordant, s.d AS discordant,
       round((s.c - s.d)::DOUBLE
             / sqrt((s.n0 - s.n1)::DOUBLE * (s.n0 - s.n2)::DOUBLE)
             * 1000000) / 1000000 + 0.0 AS tau_b
FROM s, nn
"""


@register("kendall_tau_daily", oracle=_KT_ORACLE)
def kendall_tau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        read_table(spark, sf_dir, "events")
        .select(F.col("ts").cast("date").alias("day"), "*")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("m"),
            F.sum(F.col("value").cast("decimal(30,8)")).alias("x"),
        )
    )
    a = daily.select(
        F.col("day").alias("da"), F.col("m").alias("ma"),
        F.col("x").alias("xa"),
    )
    b = daily.select(
        F.col("day").alias("db"), F.col("m").alias("mb"),
        F.col("x").alias("xb"),
    )
    dm = (
        F.when(F.col("mb") > F.col("ma"), 1)
        .when(F.col("mb") < F.col("ma"), -1)
        .otherwise(0)
    )
    dx = (
        F.when(F.col("xb") > F.col("xa"), 1)
        .when(F.col("xb") < F.col("xa"), -1)
        .otherwise(0)
    )
    p = a.join(F.broadcast(b), F.col("db") > F.col("da")).select(
        dm.alias("dm"), dx.alias("dx")
    )
    s = p.agg(
        F.count(F.lit(1)).cast("long").alias("n0"),
        F.sum(F.when(F.col("dm") * F.col("dx") > 0, 1).otherwise(0))
        .cast("long")
        .alias("c"),
        F.sum(F.when(F.col("dm") * F.col("dx") < 0, 1).otherwise(0))
        .cast("long")
        .alias("d"),
        F.sum(F.when(F.col("dm") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.sum(F.when(F.col("dx") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n2"),
    )
    nn = daily.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    return s.crossJoin(F.broadcast(nn)).select(
        "n_days",
        F.col("n0").alias("n_pairs"),
        F.col("c").alias("concordant"),
        F.col("d").alias("discordant"),
        R.r(
            (F.col("c") - F.col("d")).cast("double")
            / F.sqrt(
                (F.col("n0") - F.col("n1")).cast("double")
                * (F.col("n0") - F.col("n2")).cast("double")
            ),
            6,
        ).alias("tau_b"),
    )


# --- Brown-Forsythe variance-equality test: length by source --------------------
# Levene's test with group MEDIANS (Brown-Forsythe 1974) — are the
# document-length SPREADS equal across sources? Medians come from
# per-source cumulative counts on the (source × distinct-length) grid
# (a PARTITIONED window over bounded grid rows — never a per-document
# sort): med2_s = v@ceil(n/2) + v@(floor(n/2)+1) in exact half-unit
# integers, so z2 = |2·len − med2_s| is an exact integer per grid
# cell. Group moments Σc·z2 / Σc·z2² are exact int64; the two ANOVA
# reductions over the 20 group terms snap each term to 1e-4 units
# before the cross-group sum (order-free, same discipline as
# anova_oneway_f); W is an IEEE ratio of those snapped integers
# against the embedded F(19,∞) 5% critical value.
_BF_T_U = 10_000  # snap cross-group ANOVA terms to 1e-4 units
_BF_F_CRIT = 1.5865  # F(19, inf) at alpha = 0.05

_BF_ORACLE = f"""
WITH c AS (
    SELECT source, n_chars AS v, count(*)::BIGINT AS c
    FROM documents GROUP BY 1, 2
),
cum AS (
    SELECT source, v, c,
           sum(c) OVER (PARTITION BY source ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               ::BIGINT AS cm
    FROM c
),
ns AS (SELECT source, sum(c)::BIGINT AS n_s FROM c GROUP BY 1),
med AS (
    SELECT cum.source,
           (min(CASE WHEN cum.cm >=
                    CAST(floor((ns.n_s + 1) / 2.0) AS BIGINT)
                    THEN cum.v END)
            + min(CASE WHEN cum.cm >=
                    CAST(floor(ns.n_s / 2.0) AS BIGINT) + 1
                    THEN cum.v END))::BIGINT AS med2
    FROM cum JOIN ns USING (source) GROUP BY 1
),
z AS (
    SELECT c.source, ns.n_s,
           sum(c.c * abs(2 * c.v - med.med2))::BIGINT AS s1,
           sum(c.c * abs(2 * c.v - med.med2)
               * abs(2 * c.v - med.med2))::BIGINT AS s2
    FROM c JOIN med USING (source) JOIN ns USING (source)
    GROUP BY 1, 2
),
g AS (
    SELECT sum(n_s)::BIGINT AS nn, sum(s1)::BIGINT AS sz,
           count(*)::BIGINT AS k
    FROM z
),
terms AS (
    SELECT z.source, z.n_s, z.s1,
           CAST(round(z.n_s * (z.s1::DOUBLE / z.n_s - g.sz::DOUBLE / g.nn)
                      * (z.s1::DOUBLE / z.n_s - g.sz::DOUBLE / g.nn)
                      * {_BF_T_U}) AS BIGINT) AS num_u,
           CAST(round((z.s2 - (z.s1::DOUBLE * z.s1::DOUBLE) / z.n_s)
                      * {_BF_T_U}) AS BIGINT) AS den_u
    FROM z, g
),
w AS (
    SELECT g.nn, g.k, sum(terms.num_u)::BIGINT AS num,
           sum(terms.den_u)::BIGINT AS den
    FROM terms, g GROUP BY 1, 2
)
SELECT m.source, ns.n_s AS n_docs,
       round(m.med2 / 2.0 * 10) / 10 + 0.0 AS median_chars,
       round(t.s1::DOUBLE / (2.0 * ns.n_s) * 10000) / 10000 + 0.0
           AS mean_absdev,
       round(((w.nn - w.k)::DOUBLE / (w.k - 1)) * w.num / w.den
             * 10000) / 10000 + 0.0 AS w_stat,
       ((w.nn - w.k)::DOUBLE / (w.k - 1)) * w.num / w.den > {_BF_F_CRIT}
           AS significant
FROM med m JOIN ns USING (source) JOIN terms t ON t.source = m.source, w
"""


@register("brown_forsythe_length_by_source", oracle=_BF_ORACLE)
def brown_forsythe_length_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """One corpus scan to the (source × length) grid; the ordered pass
    is a PARTITIONED cumulative over grid rows, so no document-level
    sort or global window exists anywhere in the plan."""
    docs = read_table(spark, sf_dir, "documents").select(
        "source", "n_chars"
    )
    # NOTE (r13, VERDICT r12 #6): persist() on this grid measured
    # SLOWER at sf0.1 (same cache-serialization cost as the
    # theil_index_sources interleaved A/B — see the note there) and
    # was rejected; the cheap numeric groupBy re-derivations stay.
    c = docs.groupBy("source", F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    cum = c.withColumn(
        "cm",
        F.sum("c")
        .over(
            Window.partitionBy("source")
            .orderBy("v")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .cast("long"),
    )
    ns = c.groupBy("source").agg(F.sum("c").cast("long").alias("n_s"))
    med = (
        cum.join(F.broadcast(ns), "source")
        .groupBy("source")
        .agg(
            (
                F.min(
                    F.when(
                        F.col("cm")
                        >= F.floor((F.col("n_s") + 1) / F.lit(2.0)).cast(
                            "long"
                        ),
                        F.col("v"),
                    )
                )
                + F.min(
                    F.when(
                        F.col("cm")
                        >= F.floor(F.col("n_s") / F.lit(2.0)).cast("long")
                        + 1,
                        F.col("v"),
                    )
                )
            )
            .cast("long")
            .alias("med2")
        )
    )
    z2 = F.abs(2 * F.col("v") - F.col("med2"))
    z = (
        c.join(F.broadcast(med), "source")
        .join(F.broadcast(ns), "source")
        .groupBy("source", "n_s")
        .agg(
            F.sum(F.col("c") * z2).cast("long").alias("s1"),
            F.sum(F.col("c") * z2 * z2).cast("long").alias("s2"),
        )
    )
    g = z.agg(
        F.sum("n_s").cast("long").alias("nn"),
        F.sum("s1").cast("long").alias("sz"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    zbar_s = F.col("s1").cast("double") / F.col("n_s")
    zbar = F.col("sz").cast("double") / F.col("nn")
    terms = z.crossJoin(F.broadcast(g)).select(
        "source",
        "n_s",
        "s1",
        F.round(
            F.col("n_s") * (zbar_s - zbar) * (zbar_s - zbar)
            * F.lit(_BF_T_U)
        )
        .cast("long")
        .alias("num_u"),
        F.round(
            (
                F.col("s2")
                - (F.col("s1").cast("double") * F.col("s1").cast("double"))
                / F.col("n_s")
            )
            * F.lit(_BF_T_U)
        )
        .cast("long")
        .alias("den_u"),
    )
    w = terms.groupBy().agg(
        F.sum("num_u").cast("long").alias("num"),
        F.sum("den_u").cast("long").alias("den"),
    ).crossJoin(F.broadcast(g))
    wstat = (
        (F.col("nn") - F.col("k")).cast("double") / (F.col("k") - 1)
    ) * F.col("num") / F.col("den")
    return (
        med.join(F.broadcast(ns), "source")
        .join(
            F.broadcast(terms.select("source", "s1")), "source"
        )
        .crossJoin(F.broadcast(w))
        .select(
            "source",
            F.col("n_s").alias("n_docs"),
            R.r(F.col("med2") / F.lit(2.0), 1).alias("median_chars"),
            R.r(
                F.col("s1").cast("double") / (F.lit(2.0) * F.col("n_s")),
                4,
            ).alias("mean_absdev"),
            R.r(wstat, 4).alias("w_stat"),
            (wstat > F.lit(_BF_F_CRIT)).alias("significant"),
        )
    )


# --- Simpson's paradox audit: value-vs-time slope per priority vs pooled ---------
# The aggregation-reversal detector (Simpson 1951; Blyth 1972): does
# the ordinary-least-squares slope of order value against order date
# FLIP SIGN between the pooled corpus and the per-priority groups?
# (The classic trap when a pipeline trends a metric without
# conditioning on mix shift.) Every slope's SIGN is decided on the
# EXACT DECIMAL(38,0) numerator n·Σxy − Σx·Σy (denominator is
# positive), so the reversal flag can never be flipped by float noise;
# the displayed slopes are IEEE ratios of those exact decimals. Scale:
# one scan to 5 + 1 moment rows (map-side combined), nothing else.
_SIMPSON_ORACLE = """
WITH v AS (
    SELECT o_orderpriority AS priority,
           (o_orderdate::DATE - DATE '1995-01-01')::BIGINT AS x,
           CAST(round(o_totalprice * 100) AS BIGINT) AS y
    FROM orders
),
m AS (
    SELECT priority, count(*)::BIGINT AS n,
           sum(CAST(x AS DECIMAL(38,0))) AS sx,
           sum(CAST(y AS DECIMAL(38,0))) AS sy,
           sum(CAST(x AS DECIMAL(38,0)) * y) AS sxy,
           sum(CAST(x AS DECIMAL(38,0)) * x) AS sxx
    FROM v GROUP BY 1
),
p AS (
    SELECT sum(n)::BIGINT AS n, sum(sx) AS sx, sum(sy) AS sy,
           sum(sxy) AS sxy, sum(sxx) AS sxx
    FROM m
),
sl AS (
    SELECT m.priority, m.n,
           (m.n * m.sxy - m.sx * m.sy) AS g_num,
           (m.n * m.sxx - m.sx * m.sx) AS g_den,
           (p.n * p.sxy - p.sx * p.sy) AS p_num,
           (p.n * p.sxx - p.sx * p.sx) AS p_den
    FROM m, p
)
SELECT priority, n AS n_orders,
       round(g_num::DOUBLE / g_den::DOUBLE / 100 * 1000000) / 1000000
           + 0.0 AS slope_per_day,
       round(p_num::DOUBLE / p_den::DOUBLE / 100 * 1000000) / 1000000
           + 0.0 AS pooled_slope_per_day,
       (CASE WHEN g_num > 0 THEN 1 WHEN g_num < 0 THEN -1 ELSE 0 END)
       <> (CASE WHEN p_num > 0 THEN 1 WHEN p_num < 0 THEN -1 ELSE 0 END)
           AS sign_reversed
FROM sl
"""


@register("simpson_paradox_audit", oracle=_SIMPSON_ORACLE)
def simpson_paradox_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01")
        )
        .cast("long")
        .alias("x"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("y"),
    )
    dx = F.col("x").cast("decimal(38,0)")
    dy = F.col("y").cast("decimal(38,0)")
    m = v.groupBy("priority").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dx).alias("sx"),
        F.sum(dy).alias("sy"),
        F.sum(dx * F.col("y")).alias("sxy"),
        F.sum(dx * F.col("x")).alias("sxx"),
    )
    p = m.agg(
        F.sum("n").cast("long").alias("pn"),
        F.sum("sx").alias("psx"),
        F.sum("sy").alias("psy"),
        F.sum("sxy").alias("psxy"),
        F.sum("sxx").alias("psxx"),
    )
    g_num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    g_den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    p_num = F.col("pn") * F.col("psxy") - F.col("psx") * F.col("psy")
    p_den = F.col("pn") * F.col("psxx") - F.col("psx") * F.col("psx")
    sgn = lambda c: F.when(c > 0, 1).when(c < 0, -1).otherwise(0)  # noqa: E731
    return m.crossJoin(F.broadcast(p)).select(
        "priority",
        F.col("n").alias("n_orders"),
        R.r(g_num.cast("double") / g_den.cast("double") / 100, 6).alias(
            "slope_per_day"
        ),
        R.r(p_num.cast("double") / p_den.cast("double") / 100, 6).alias(
            "pooled_slope_per_day"
        ),
        (sgn(g_num) != sgn(p_num)).alias("sign_reversed"),
    )


# --- Gumbel extreme-value fit over daily maxima ----------------------------------
# Block-maxima EVT (Gumbel 1958): the daily maximum event value is
# fitted with a Gumbel distribution by method of moments
# (β = s·√6/π, μ = m − γ·β) and return levels x_p = μ − β·ln(−ln p)
# are reported for p ∈ {0.90, 0.95, 0.99} with the observed
# exceedance counts — the tail-risk audit for a metric pipeline.
# Determinism: daily maxima are exact integer cents (max of exact
# ints); m and s come from exact int64/DECIMAL moments; γ, √6/π and
# the three ln(−ln p) values are PYTHON-COMPUTED double literals
# embedded identically in both engines, so every product chain is
# identical IEEE arithmetic with no runtime libm. Scale: one corpus
# scan to the calendar-bounded day table; the fit is a 1-row moment
# aggregate joined to a 3-row literal table.
import math as _gmath

_GUM_GAMMA = 0.5772156649015329
_GUM_SQRT6_PI = _gmath.sqrt(6.0) / _gmath.pi
_GUM_PS = (0.90, 0.95, 0.99)
_GUM_LNLN = {p: _gmath.log(-_gmath.log(p)) for p in _GUM_PS}

_GUMBEL_ORACLE = f"""
WITH d AS (
    SELECT ts::DATE AS day,
           max(CAST(round(value * 100) AS BIGINT))::BIGINT AS mx
    FROM events GROUP BY 1
),
m AS (
    SELECT count(*)::BIGINT AS n, sum(mx)::BIGINT AS s,
           sum(CAST(mx AS DECIMAL(38,0)) * mx) AS ss
    FROM d
),
fit AS (
    SELECT n, s::DOUBLE / n AS mean_c,
           sqrt((ss::DOUBLE - (s::DOUBLE * s) / n) / n) AS std_c
    FROM m
),
ps AS (
    SELECT t.p::DOUBLE AS p, t.lnln
    FROM (VALUES (0.90, {_GUM_LNLN[0.90]!r}),
                 (0.95, {_GUM_LNLN[0.95]!r}),
                 (0.99, {_GUM_LNLN[0.99]!r})) AS t(p, lnln)
),
rl AS (
    SELECT ps.p, fit.n, fit.mean_c, fit.std_c,
           fit.std_c * {_GUM_SQRT6_PI!r} AS beta_c,
           fit.mean_c - {_GUM_GAMMA!r} * fit.std_c * {_GUM_SQRT6_PI!r}
               AS mu_c,
           (fit.mean_c - {_GUM_GAMMA!r} * fit.std_c * {_GUM_SQRT6_PI!r})
               - fit.std_c * {_GUM_SQRT6_PI!r} * ps.lnln AS x_c
    FROM fit, ps
)
SELECT rl.p, rl.n AS n_days,
       round(rl.mean_c / 100 * 10000) / 10000 + 0.0 AS mean_max,
       round(rl.std_c / 100 * 10000) / 10000 + 0.0 AS std_max,
       round(rl.mu_c / 100 * 10000) / 10000 + 0.0 AS gumbel_mu,
       round(rl.beta_c / 100 * 10000) / 10000 + 0.0 AS gumbel_beta,
       round(rl.x_c / 100 * 10000) / 10000 + 0.0 AS return_level,
       (SELECT count(*) FROM d WHERE d.mx > rl.x_c)::BIGINT AS n_exceed
FROM rl
"""


@register("gumbel_block_maxima_evt", oracle=_GUMBEL_ORACLE)
def gumbel_block_maxima_evt(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        read_table(spark, sf_dir, "events")
        .select(F.col("ts").cast("date").alias("day"), "*")
        .groupBy("day")
        .agg(
            F.max(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("mx")
        )
    )
    m = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("mx").cast("long").alias("s"),
        F.sum(F.col("mx").cast("decimal(38,0)") * F.col("mx")).alias("ss"),
    )
    mean_c = F.col("s").cast("double") / F.col("n")
    std_c = F.sqrt(
        (
            F.col("ss").cast("double")
            - (F.col("s").cast("double") * F.col("s")) / F.col("n")
        )
        / F.col("n")
    )
    fit = m.select(
        "n", mean_c.alias("mean_c"), std_c.alias("std_c")
    )
    ps = spark.createDataFrame(
        [(p, _GUM_LNLN[p]) for p in _GUM_PS], "p double, lnln double"
    )
    beta_c = F.col("std_c") * F.lit(_GUM_SQRT6_PI)
    mu_c = F.col("mean_c") - F.lit(_GUM_GAMMA) * beta_c
    x_c = mu_c - beta_c * F.col("lnln")
    rl = fit.crossJoin(F.broadcast(ps)).select(
        "p", "n", "mean_c", "std_c",
        beta_c.alias("beta_c"), mu_c.alias("mu_c"), x_c.alias("x_c"),
    )
    exceed = (
        rl.select("p", "x_c")
        .join(d)
        .groupBy("p")
        .agg(
            F.sum(F.when(F.col("mx") > F.col("x_c"), 1).otherwise(0))
            .cast("long")
            .alias("n_exceed")
        )
    )
    return rl.join(F.broadcast(exceed), "p").select(
        "p",
        F.col("n").alias("n_days"),
        R.r(F.col("mean_c") / 100, 4).alias("mean_max"),
        R.r(F.col("std_c") / 100, 4).alias("std_max"),
        R.r(F.col("mu_c") / 100, 4).alias("gumbel_mu"),
        R.r(F.col("beta_c") / 100, 4).alias("gumbel_beta"),
        R.r(F.col("x_c") / 100, 4).alias("return_level"),
        "n_exceed",
    )


# =============================================================================
# Round-9 regression diagnostics over the daily revenue-vs-time OLS.
# Shared discipline: the simple regression y = a + b·x over the
# calendar-bounded day table (x = day index, y = daily cents) is fit
# from EXACT DECIMAL(38,0) moments; a, b and every residual
# e_i = y_i − a − b·x_i are then identical IEEE doubles on both
# engines, and each residual SNAPS to an integer 1e-2-cent unit
# before any sum of squares — so all diagnostic statistics are ratios
# of exact int64/DECIMAL values. One corpus scan feeds all of it.
# =============================================================================
_DIAG_E_U = 100  # residual snap: 1e-2 cent units


def _diag_daily_sql() -> str:
    """Shared oracle CTE: day table + OLS fit + snapped residuals."""
    return f"""d AS (
    SELECT (ts::DATE - DATE '2024-01-01')::BIGINT AS x,
           sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS y
    FROM events GROUP BY 1
),
mom AS (
    SELECT count(*)::BIGINT AS n,
           sum(CAST(x AS DECIMAL(38,0))) AS sx,
           sum(CAST(y AS DECIMAL(38,0))) AS sy,
           sum(CAST(x AS DECIMAL(38,0)) * y) AS sxy,
           sum(CAST(x AS DECIMAL(38,0)) * x) AS sxx
    FROM d
),
fit AS (
    SELECT n, sx, sy,
           (n * sxy - sx * sy)::DOUBLE / (n * sxx - sx * sx)::DOUBLE
               AS b,
           (sy::DOUBLE - (n * sxy - sx * sy)::DOUBLE
                         / (n * sxx - sx * sx)::DOUBLE * sx::DOUBLE) / n
               AS a
    FROM mom
),
res AS (
    SELECT d.x, d.y, fit.n,
           CAST(round((d.y - fit.a - fit.b * d.x) * {_DIAG_E_U})
                AS BIGINT) AS e_u
    FROM d, fit
)"""


# --- Durbin-Watson serial-correlation test ----------------------------------------
# Durbin & Watson (1950): DW = Σ(e_t − e_{t−1})²/Σe_t² on the OLS
# residuals — DW≈2 means independent errors, <1.5 positive serial
# correlation (the "my daily metric has momentum the model misses"
# check). Consecutive days pair by date arithmetic (runs-test
# pattern, no window); both sums are exact int64 on snapped
# residuals. Scale: one corpus scan to the day table.
_DW_ORACLE = f"""
WITH {_diag_daily_sql()},
pairs AS (
    SELECT b.e_u - a.e_u AS de_u
    FROM res a JOIN res b ON b.x = a.x + 1
),
s AS (
    SELECT (SELECT sum(de_u * de_u) FROM pairs)::BIGINT AS num,
           sum(e_u * e_u)::BIGINT AS den,
           any_value(n)::BIGINT AS n
    FROM res
)
SELECT n AS n_days,
       round(num::DOUBLE / den * 10000) / 10000 + 0.0 AS dw_stat,
       CASE WHEN num::DOUBLE / den < 1.5 THEN 'positive_autocorr'
            WHEN num::DOUBLE / den > 2.5 THEN 'negative_autocorr'
            ELSE 'independent' END AS verdict
FROM s
"""


@register("durbin_watson_autocorr", oracle=_DW_ORACLE)
def durbin_watson_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = _diag_residuals(spark, sf_dir)
    a = res.select(F.col("x").alias("xa"), F.col("e_u").alias("ea"))
    b = res.select(F.col("x").alias("xb"), F.col("e_u").alias("eb"))
    num = (
        a.join(F.broadcast(b), F.col("xb") == F.col("xa") + 1)
        .agg(
            F.sum(
                (F.col("eb") - F.col("ea")) * (F.col("eb") - F.col("ea"))
            )
            .cast("long")
            .alias("num")
        )
    )
    s = res.agg(
        F.sum(F.col("e_u") * F.col("e_u")).cast("long").alias("den"),
        F.first("n").cast("long").alias("n"),
    )
    dw = F.col("num").cast("double") / F.col("den")
    return s.crossJoin(F.broadcast(num)).select(
        F.col("n").alias("n_days"),
        R.r(dw, 4).alias("dw_stat"),
        F.when(dw < 1.5, "positive_autocorr")
        .when(dw > 2.5, "negative_autocorr")
        .otherwise("independent")
        .alias("verdict"),
    )


def _diag_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared Spark side of _diag_daily_sql: (x, y, n, e_u)."""
    # select-then-group under the distinctive name day_x (calendar-
    # bounded day index) so the broadcast-boundedness auditor can
    # classify the aggregate; consumers keep seeing `x`
    d = (
        read_table(spark, sf_dir, "events")
        .select(
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01"))
            .cast("long")
            .alias("day_x"),
            "value",
        )
        .groupBy("day_x")
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("y")
        )
        .withColumnRenamed("day_x", "x")
    )
    dx = F.col("x").cast("decimal(38,0)")
    dy = F.col("y").cast("decimal(38,0)")
    mom = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dx).alias("sx"),
        F.sum(dy).alias("sy"),
        F.sum(dx * F.col("y")).alias("sxy"),
        F.sum(dx * F.col("x")).alias("sxx"),
    )
    bb = (
        F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    ).cast("double") / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    ).cast("double")
    fit = mom.select(
        "n",
        "sx",
        "sy",
        bb.alias("b"),
        (
            (F.col("sy").cast("double") - bb * F.col("sx").cast("double"))
            / F.col("n")
        ).alias("a"),
    )
    return d.crossJoin(F.broadcast(fit)).select(
        "x",
        "y",
        "n",
        F.round(
            (F.col("y") - F.col("a") - F.col("b") * F.col("x"))
            * F.lit(_DIAG_E_U)
        )
        .cast("long")
        .alias("e_u"),
    )


# --- Jarque-Bera normality test over daily revenue --------------------------------
# Jarque & Bera (1980): JB = n/6·(S² + (K−3)²/4) from skewness and
# kurtosis — is the daily revenue distribution normal enough for
# z-score monitors to be trusted? Standardized values
# u_i = (y_i − ȳ)/s snap to integer 1e-6 units before the third/
# fourth-moment sums (DECIMAL(38,0): u⁴ is 1e24-scale), so Σu³/Σu⁴
# are exact on both engines; ȳ and s are IEEE on exact cents moments.
# Scale: one corpus scan to the day table, one moment aggregate.
_JB_U = 1_000_000
_JB_CHI2_CRIT = 5.9915  # chi2(2 df) at alpha = 0.05

_JB_ORACLE = f"""
WITH d AS (
    SELECT ts::DATE AS day,
           sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS y
    FROM events GROUP BY 1
),
m AS (
    SELECT count(*)::BIGINT AS n, sum(y)::BIGINT AS s,
           sum(CAST(y AS DECIMAL(38,0)) * y) AS ss
    FROM d
),
fit AS (
    SELECT n, s::DOUBLE / n AS mean_c,
           sqrt((ss::DOUBLE - (s::DOUBLE * s) / n) / n) AS std_c
    FROM m
),
u AS (
    SELECT fit.n,
           CAST(round((d.y - fit.mean_c) / fit.std_c * {_JB_U})
                AS BIGINT) AS u_u
    FROM d, fit
),
agg AS (
    SELECT any_value(n)::BIGINT AS n,
           sum(CAST(u_u AS DECIMAL(38,0)) * u_u * u_u) AS s3,
           sum(CAST(u_u AS DECIMAL(38,0)) * u_u * u_u * u_u) AS s4
    FROM u
),
jb AS (
    SELECT n,
           s3::DOUBLE / (n * {_JB_U}.0 * {_JB_U} * {_JB_U}) AS skew,
           s4::DOUBLE / (n * {_JB_U}.0 * {_JB_U} * {_JB_U} * {_JB_U})
               AS kurt
    FROM agg
)
SELECT n AS n_days,
       round(skew * 1000000) / 1000000 + 0.0 AS skewness,
       round(kurt * 1000000) / 1000000 + 0.0 AS kurtosis,
       round(n / 6.0 * (skew * skew + (kurt - 3) * (kurt - 3) / 4)
             * 10000) / 10000 + 0.0 AS jb_stat,
       n / 6.0 * (skew * skew + (kurt - 3) * (kurt - 3) / 4)
           > {_JB_CHI2_CRIT} AS reject_normality
FROM jb
"""


@register("jarque_bera_normality", oracle=_JB_ORACLE)
def jarque_bera_normality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        read_table(spark, sf_dir, "events")
        .select(F.col("ts").cast("date").alias("day"), "*")
        .groupBy("day")
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("y")
        )
    )
    m = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y")).alias("ss"),
    )
    fit = m.select(
        "n",
        (F.col("s").cast("double") / F.col("n")).alias("mean_c"),
        F.sqrt(
            (
                F.col("ss").cast("double")
                - (F.col("s").cast("double") * F.col("s")) / F.col("n")
            )
            / F.col("n")
        ).alias("std_c"),
    )
    u = d.crossJoin(F.broadcast(fit)).select(
        "n",
        F.round(
            (F.col("y") - F.col("mean_c")) / F.col("std_c") * F.lit(_JB_U)
        )
        .cast("long")
        .alias("u_u"),
    )
    du = F.col("u_u").cast("decimal(38,0)")
    agg = u.agg(
        F.first("n").cast("long").alias("n"),
        F.sum(du * F.col("u_u") * F.col("u_u")).alias("s3"),
        F.sum(du * F.col("u_u") * F.col("u_u") * F.col("u_u")).alias("s4"),
    )
    uf = float(_JB_U)
    skew = F.col("s3").cast("double") / (F.col("n") * uf * uf * uf)
    kurt = F.col("s4").cast("double") / (
        F.col("n") * uf * uf * uf * uf
    )
    jb = F.col("n") / F.lit(6.0) * (
        skew * skew + (kurt - 3) * (kurt - 3) / 4
    )
    return agg.select(
        F.col("n").alias("n_days"),
        R.r(skew, 6).alias("skewness"),
        R.r(kurt, 6).alias("kurtosis"),
        R.r(jb, 4).alias("jb_stat"),
        (jb > F.lit(_JB_CHI2_CRIT)).alias("reject_normality"),
    )


# --- Breusch-Pagan heteroskedasticity test ----------------------------------------
# Breusch & Pagan (1979), Koenker's studentized form: BP = n·R² of
# the auxiliary regression of squared OLS residuals on x — does the
# daily revenue model's error VARIANCE drift over time? Squared
# snapped residuals g_i = e_u² are exact int64; the auxiliary-R²
# moments go through DECIMAL(38,0) (g² is 1e28-scale); BP compares
# against the embedded chi²(1) critical value. Scale: one corpus scan
# to the day table; two moment aggregates.
_BP_CHI2_CRIT = 3.8415  # chi2(1 df) at alpha = 0.05

_BP_ORACLE = f"""
WITH {_diag_daily_sql()},
g AS (SELECT x, n, CAST(e_u AS DECIMAL(38,0)) * e_u AS g FROM res),
aux AS (
    SELECT any_value(n)::BIGINT AS n,
           sum(CAST(x AS DECIMAL(38,0))) AS sx,
           sum(CAST(g AS DECIMAL(38,0))) AS sg,
           sum(CAST(x AS DECIMAL(38,0)) * g) AS sxg,
           sum(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
           sum(CAST(g AS DECIMAL(38,0)) * g) AS sgg
    FROM g
),
r2 AS (
    SELECT n,
           ((n * sxg - sx * sg)::DOUBLE * (n * sxg - sx * sg)::DOUBLE)
           / ((n * sxx - sx * sx)::DOUBLE * (n * sgg - sg * sg)::DOUBLE)
               AS r2
    FROM aux
)
SELECT n AS n_days,
       round(r2 * 1000000) / 1000000 + 0.0 AS aux_r2,
       round(n * r2 * 10000) / 10000 + 0.0 AS bp_stat,
       n * r2 > {_BP_CHI2_CRIT} AS heteroskedastic
FROM r2
"""


@register("breusch_pagan_heteroskedasticity", oracle=_BP_ORACLE)
def breusch_pagan_heteroskedasticity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    res = _diag_residuals(spark, sf_dir)
    g = res.select(
        "x",
        "n",
        (F.col("e_u").cast("decimal(38,0)") * F.col("e_u")).alias("g"),
    )
    dx = F.col("x").cast("decimal(38,0)")
    dg = F.col("g").cast("decimal(38,0)")
    aux = g.agg(
        F.first("n").cast("long").alias("n"),
        F.sum(dx).alias("sx"),
        F.sum(dg).alias("sg"),
        F.sum(dx * F.col("g")).alias("sxg"),
        F.sum(dx * F.col("x")).alias("sxx"),
        F.sum(dg * F.col("g")).alias("sgg"),
    )
    num = (
        F.col("n") * F.col("sxg") - F.col("sx") * F.col("sg")
    ).cast("double")
    r2 = (num * num) / (
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
            "double"
        )
        * (F.col("n") * F.col("sgg") - F.col("sg") * F.col("sg")).cast(
            "double"
        )
    )
    bp = F.col("n") * r2
    return aux.select(
        F.col("n").alias("n_days"),
        R.r(r2, 6).alias("aux_r2"),
        R.r(bp, 4).alias("bp_stat"),
        (bp > F.lit(_BP_CHI2_CRIT)).alias("heteroskedastic"),
    )


# --- Cook's distance: influential days in the daily revenue regression ------------
# Cook (1977): D_i = e_i²·h_i / (p·s²·(1−h_i)²) with the CLOSED-FORM
# simple-regression leverage h_i = 1/n + (x_i−x̄)²/Σ(x−x̄)² — which
# days single-handedly steer the revenue trend line? Residuals are
# the shared snapped integers (so e² and s² = Σe_u²/(n−2) live in the
# same exact units and cancel); leverages are IEEE rationals of exact
# integer moments; each D snaps to a 1e-8 integer unit so the top-10
# cut orders exactly with day tie-break. Flag: D > 4/n (the standard
# screening threshold). Scale: one corpus scan to the day table.
_COOK_U = 100_000_000
_COOK_TOPN = 10

_COOK_ORACLE = f"""
WITH {_diag_daily_sql()},
lev AS (
    SELECT res.x, res.e_u, res.n, mom.sx, mom.sxx,
           1.0 / res.n
           + (res.x - mom.sx::DOUBLE / res.n)
             * (res.x - mom.sx::DOUBLE / res.n)
             / (mom.sxx::DOUBLE - mom.sx::DOUBLE * mom.sx::DOUBLE
                                  / res.n) AS h
    FROM res, mom
),
s2 AS (
    SELECT sum(e_u * e_u)::DOUBLE / (any_value(n) - 2) AS s2 FROM res
),
dd AS (
    SELECT lev.x, lev.e_u, lev.h, lev.n,
           CAST(round(lev.e_u::DOUBLE * lev.e_u * lev.h
                      / (2.0 * s2.s2 * (1 - lev.h) * (1 - lev.h))
                      * {_COOK_U}) AS BIGINT) AS d_u
    FROM lev, s2
)
SELECT (DATE '2024-01-01' + INTERVAL (x) DAY)::DATE AS day,
       round(e_u * 1.0 / {_DIAG_E_U} / 100 * 10000) / 10000 + 0.0
           AS residual_dollars,
       round(h * 1000000) / 1000000 + 0.0 AS leverage,
       round(d_u * 1.0 / {_COOK_U} * 1000000) / 1000000 + 0.0
           AS cooks_d,
       d_u > CAST(round(4.0 / n * {_COOK_U}) AS BIGINT) AS influential
FROM dd
ORDER BY d_u DESC, x
LIMIT {_COOK_TOPN}
"""


@register("cooks_distance_daily", oracle=_COOK_ORACLE)
def cooks_distance_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = _diag_residuals(spark, sf_dir)
    mom = res.agg(
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum(
            F.col("x").cast("decimal(38,0)") * F.col("x")
        ).alias("sxx"),
    )
    xbar = F.col("sx").cast("double") / F.col("n")
    h = (
        F.lit(1.0) / F.col("n")
        + (F.col("x") - xbar)
        * (F.col("x") - xbar)
        / (
            F.col("sxx").cast("double")
            - F.col("sx").cast("double")
            * F.col("sx").cast("double")
            / F.col("n")
        )
    )
    lev = res.crossJoin(F.broadcast(mom)).select(
        "x", "e_u", "n", h.alias("h")
    )
    s2 = res.agg(
        (
            F.sum(F.col("e_u") * F.col("e_u")).cast("double")
            / (F.first("n") - 2)
        ).alias("s2")
    )
    d_u = F.round(
        F.col("e_u").cast("double")
        * F.col("e_u")
        * F.col("h")
        / (
            F.lit(2.0)
            * F.col("s2")
            * (1 - F.col("h"))
            * (1 - F.col("h"))
        )
        * F.lit(_COOK_U)
    ).cast("long")
    dd = lev.crossJoin(F.broadcast(s2)).select(
        "x", "e_u", "h", "n", d_u.alias("d_u")
    )
    return (
        dd.orderBy(F.col("d_u").desc(), "x")
        .limit(_COOK_TOPN)
        .select(
            F.date_add(F.lit("2024-01-01"), F.col("x").cast("int")).alias(
                "day"
            ),
            R.r(
                F.col("e_u") * F.lit(1.0) / _DIAG_E_U / 100, 4
            ).alias("residual_dollars"),
            R.r("h", 6).alias("leverage"),
            R.r(F.col("d_u") * F.lit(1.0) / _COOK_U, 6).alias("cooks_d"),
            (
                F.col("d_u")
                > F.round(F.lit(4.0) / F.col("n") * F.lit(_COOK_U)).cast(
                    "long"
                )
            ).alias("influential"),
        )
    )


# --- Cohen's d / Hedges' g effect size for the variant split ----------------------
# The effect-size companion to welch_ttest: standardized mean
# difference of purchase value between variants with the pooled-SD
# Cohen's d, small-sample Hedges' g correction J = 1 − 3/(4m−9), and
# the large-sample 95% CI on d. Group moments are the exact integer
# cents sums (squared cents through DECIMAL(38,0)); everything after
# is IEEE on exact ints + embedded literals — no runtime libm.
# Scale: one map-side-combined scan to 2 moment rows.
_EFF_ORACLE = """
WITH v AS (
    SELECT (user_id % 2)::BIGINT AS variant,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events WHERE event_type = 'purchase'
),
m AS (
    SELECT variant, count(*)::BIGINT AS n, sum(cents)::BIGINT AS s,
           sum(CAST(cents AS DECIMAL(38,0)) * cents) AS ss
    FROM v GROUP BY 1
),
w AS (
    SELECT a.n AS na, b.n AS nb,
           a.s::DOUBLE / a.n AS ma, b.s::DOUBLE / b.n AS mb,
           (a.ss::DOUBLE - (a.s::DOUBLE * a.s::DOUBLE) / a.n) AS ssa,
           (b.ss::DOUBLE - (b.s::DOUBLE * b.s::DOUBLE) / b.n) AS ssb
    FROM m a JOIN m b ON a.variant = 0 AND b.variant = 1
),
d AS (
    SELECT na, nb, ma, mb,
           (ma - mb) / sqrt((ssa + ssb) / (na + nb - 2)) AS d,
           1.0 - 3.0 / (4.0 * (na + nb) - 9) AS j,
           sqrt((na + nb)::DOUBLE / (na::DOUBLE * nb)
                + ((ma - mb) / sqrt((ssa + ssb) / (na + nb - 2)))
                  * ((ma - mb) / sqrt((ssa + ssb) / (na + nb - 2)))
                  / (2.0 * (na + nb))) AS se
    FROM w
)
SELECT na, nb,
       round((ma - mb) / 100 * 10000) / 10000 + 0.0 AS mean_diff,
       round(d * 1000000) / 1000000 + 0.0 AS cohens_d,
       round(d * j * 1000000) / 1000000 + 0.0 AS hedges_g,
       round((d - 1.96 * se) * 1000000) / 1000000 + 0.0 AS d_ci_low,
       round((d + 1.96 * se) * 1000000) / 1000000 + 0.0 AS d_ci_high,
       CASE WHEN abs(d) < 0.2 THEN 'negligible'
            WHEN abs(d) < 0.5 THEN 'small'
            WHEN abs(d) < 0.8 THEN 'medium' ELSE 'large' END
           AS magnitude
FROM d
"""


@register("cohens_d_effect_size", oracle=_EFF_ORACLE)
def cohens_d_effect_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            (F.col("user_id") % 2).cast("long").alias("variant"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    m = v.groupBy("variant").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.sum(
            F.col("cents").cast("decimal(38,0)") * F.col("cents")
        ).alias("ss"),
    )
    a = m.filter(F.col("variant") == 0).select(
        F.col("n").alias("na"), F.col("s").alias("sa"),
        F.col("ss").alias("ssa0"),
    )
    b = m.filter(F.col("variant") == 1).select(
        F.col("n").alias("nb"), F.col("s").alias("sb"),
        F.col("ss").alias("ssb0"),
    )
    j0 = a.crossJoin(F.broadcast(b))
    ma = F.col("sa").cast("double") / F.col("na")
    mb = F.col("sb").cast("double") / F.col("nb")
    ssa = F.col("ssa0").cast("double") - (
        F.col("sa").cast("double") * F.col("sa").cast("double")
    ) / F.col("na")
    ssb = F.col("ssb0").cast("double") - (
        F.col("sb").cast("double") * F.col("sb").cast("double")
    ) / F.col("nb")
    d = (ma - mb) / F.sqrt(
        (ssa + ssb) / (F.col("na") + F.col("nb") - 2)
    )
    jj = F.lit(1.0) - F.lit(3.0) / (
        F.lit(4.0) * (F.col("na") + F.col("nb")) - 9
    )
    se = F.sqrt(
        (F.col("na") + F.col("nb")).cast("double")
        / (F.col("na").cast("double") * F.col("nb"))
        + d * d / (F.lit(2.0) * (F.col("na") + F.col("nb")))
    )
    return j0.select(
        "na",
        "nb",
        R.r((ma - mb) / 100, 4).alias("mean_diff"),
        R.r(d, 6).alias("cohens_d"),
        R.r(d * jj, 6).alias("hedges_g"),
        R.r(d - F.lit(1.96) * se, 6).alias("d_ci_low"),
        R.r(d + F.lit(1.96) * se, 6).alias("d_ci_high"),
        F.when(F.abs(d) < 0.2, "negligible")
        .when(F.abs(d) < 0.5, "small")
        .when(F.abs(d) < 0.8, "medium")
        .otherwise("large")
        .alias("magnitude"),
    )


# --- A/B power analysis: MDE and required sample size -----------------------------
# The pre-registration arithmetic every experimentation pipeline
# needs: given the observed per-user purchase-value variance, (a) the
# minimum detectable effect at α=0.05 two-sided for power ∈
# {0.80, 0.90} at the CURRENT per-variant n, and (b) the per-variant
# n required to detect a $1.00 effect — MDE = (z_{α/2}+z_β)·√(2s²/n),
# n_req = 2s²(z_{α/2}+z_β)²/Δ². The z quantiles are embedded literals
# (1.959964, 0.841621, 1.281552); s² is pooled from exact integer
# cents moments; everything after is IEEE. Scale: one
# map-side-combined scan to 2 moment rows joined to a 2-row literal
# power table.
_PWR_Z_A = 1.959964  # z_{0.975}
_PWR_ZB = {0.80: 0.841621, 0.90: 1.281552}
_PWR_TARGET_C = 100.0  # $1.00 target effect in cents

_PWR_ORACLE = f"""
WITH v AS (
    SELECT (user_id % 2)::BIGINT AS variant,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events WHERE event_type = 'purchase'
),
m AS (
    SELECT variant, count(*)::BIGINT AS n, sum(cents)::BIGINT AS s,
           sum(CAST(cents AS DECIMAL(38,0)) * cents) AS ss
    FROM v GROUP BY 1
),
pool AS (
    SELECT sum(n)::BIGINT AS n_total,
           CAST(round(sum(n) / 2.0) AS BIGINT) AS n_arm,
           sum(ss::DOUBLE - (s::DOUBLE * s) / n) / (sum(n) - 2) AS s2
    FROM m
),
pw AS (
    SELECT t.power::DOUBLE AS power, t.zb
    FROM (VALUES (0.80, {_PWR_ZB[0.80]!r}),
                 (0.90, {_PWR_ZB[0.90]!r})) AS t(power, zb)
)
SELECT pw.power, pool.n_arm,
       round(sqrt(pool.s2) / 100 * 10000) / 10000 + 0.0 AS pooled_sd,
       round(({_PWR_Z_A} + pw.zb) * sqrt(2 * pool.s2 / pool.n_arm)
             / 100 * 10000) / 10000 + 0.0 AS mde_dollars,
       CAST(ceil(2 * pool.s2 * ({_PWR_Z_A} + pw.zb)
                 * ({_PWR_Z_A} + pw.zb)
                 / ({_PWR_TARGET_C} * {_PWR_TARGET_C})) AS BIGINT)
           AS n_per_arm_for_1dollar
FROM pool, pw
"""


@register("power_analysis_mde", oracle=_PWR_ORACLE)
def power_analysis_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            (F.col("user_id") % 2).cast("long").alias("variant"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    m = v.groupBy("variant").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.sum(
            F.col("cents").cast("decimal(38,0)") * F.col("cents")
        ).alias("ss"),
    )
    pool = m.agg(
        F.sum("n").cast("long").alias("n_total"),
        F.round(F.sum("n") / F.lit(2.0)).cast("long").alias("n_arm"),
        (
            F.sum(
                F.col("ss").cast("double")
                - (F.col("s").cast("double") * F.col("s").cast("double"))
                / F.col("n")
            )
            / (F.sum("n") - 2)
        ).alias("s2"),
    )
    pw = spark.createDataFrame(
        [(p, _PWR_ZB[p]) for p in (0.80, 0.90)], "power double, zb double"
    )
    mde = (F.lit(_PWR_Z_A) + F.col("zb")) * F.sqrt(
        2 * F.col("s2") / F.col("n_arm")
    )
    nreq = F.ceil(
        2
        * F.col("s2")
        * (F.lit(_PWR_Z_A) + F.col("zb"))
        * (F.lit(_PWR_Z_A) + F.col("zb"))
        / F.lit(_PWR_TARGET_C * _PWR_TARGET_C)
    ).cast("long")
    return pool.crossJoin(F.broadcast(pw)).select(
        "power",
        "n_arm",
        R.r(F.sqrt(F.col("s2")) / 100, 4).alias("pooled_sd"),
        R.r(mde / 100, 4).alias("mde_dollars"),
        nreq.alias("n_per_arm_for_1dollar"),
    )


# --- bias-corrected Cramér's V: lang × source association strength ----------------
# The EFFECT-SIZE companion to chi2_independence_lang_source:
# Bergsma's (2013) bias-corrected Cramér's V over the |langs|×|sources|
# contingency table — χ² tells you association exists; V tells you
# whether it is big enough to matter for stratification decisions.
# Each cell's (O−E)²/E term snaps to an integer 1e-6 unit before the
# order-free sum (E is an exact-integer ratio); the φ²/row/column
# corrections are IEEE rationals of exact counts. Scale: one scan to
# the bounded contingency grid.
_CV_U = 1_000_000

_CV_ORACLE = f"""
WITH cell AS (
    SELECT lang, source, count(*)::BIGINT AS o
    FROM documents GROUP BY 1, 2
),
rmar AS (SELECT lang, sum(o)::BIGINT AS rn FROM cell GROUP BY 1),
cmar AS (SELECT source, sum(o)::BIGINT AS cn FROM cell GROUP BY 1),
nn AS (
    SELECT sum(o)::BIGINT AS n,
           (SELECT count(*) FROM rmar)::BIGINT AS r,
           (SELECT count(*) FROM cmar)::BIGINT AS c
    FROM cell
),
grid AS (
    SELECT rmar.lang, cmar.source, rmar.rn, cmar.cn,
           coalesce(cell.o, 0)::BIGINT AS o
    FROM rmar CROSS JOIN cmar
    LEFT JOIN cell ON cell.lang = rmar.lang
                  AND cell.source = cmar.source
),
chi AS (
    SELECT sum(CAST(round(
               (grid.o - grid.rn::DOUBLE * grid.cn / nn.n)
               * (grid.o - grid.rn::DOUBLE * grid.cn / nn.n)
               / (grid.rn::DOUBLE * grid.cn / nn.n) * {_CV_U})
               AS BIGINT))::BIGINT AS chi_u
    FROM grid, nn
),
v AS (
    SELECT nn.n, nn.r, nn.c,
           chi.chi_u * 1.0 / {_CV_U} AS chi2,
           greatest(0.0, chi.chi_u * 1.0 / ({_CV_U}.0 * nn.n)
                    - (nn.r - 1.0) * (nn.c - 1) / (nn.n - 1)) AS phi2c,
           nn.r - (nn.r - 1.0) * (nn.r - 1) / (nn.n - 1) AS rt,
           nn.c - (nn.c - 1.0) * (nn.c - 1) / (nn.n - 1) AS ct
    FROM nn, chi
)
SELECT n AS n_docs, r AS n_langs, c AS n_sources,
       round(chi2 * 10000) / 10000 + 0.0 AS chi2_stat,
       round(sqrt(chi2 / (n * least(r - 1, c - 1))) * 1000000)
           / 1000000 + 0.0 AS cramers_v,
       round(sqrt(phi2c / least(rt - 1, ct - 1)) * 1000000) / 1000000
           + 0.0 AS cramers_v_corrected
FROM v
"""


@register("cramers_v_lang_source", oracle=_CV_ORACLE)
def cramers_v_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    cell = (
        read_table(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).cast("long").alias("o"))
    )
    rmar = cell.groupBy("lang").agg(F.sum("o").cast("long").alias("rn"))
    cmar = cell.groupBy("source").agg(
        F.sum("o").cast("long").alias("cn")
    )
    nn = cell.agg(F.sum("o").cast("long").alias("n")).crossJoin(
        F.broadcast(rmar.agg(F.count(F.lit(1)).cast("long").alias("r")))
    ).crossJoin(
        F.broadcast(cmar.agg(F.count(F.lit(1)).cast("long").alias("c")))
    )
    grid = (
        rmar.crossJoin(F.broadcast(cmar))
        .join(F.broadcast(cell), ["lang", "source"], "left")
        .select(
            "rn", "cn", F.coalesce(F.col("o"), F.lit(0)).alias("o")
        )
    )
    e = F.col("rn").cast("double") * F.col("cn") / F.col("n")
    chi = (
        grid.crossJoin(F.broadcast(nn))
        .select(
            F.round(
                (F.col("o") - e) * (F.col("o") - e) / e * F.lit(_CV_U)
            )
            .cast("long")
            .alias("t_u")
        )
        .agg(F.sum("t_u").cast("long").alias("chi_u"))
    )
    chi2 = F.col("chi_u") * F.lit(1.0) / _CV_U
    phi2c = F.greatest(
        F.lit(0.0),
        F.col("chi_u") * F.lit(1.0) / (F.lit(float(_CV_U)) * F.col("n"))
        - (F.col("r") - F.lit(1.0)) * (F.col("c") - 1) / (F.col("n") - 1),
    )
    rt = F.col("r") - (F.col("r") - F.lit(1.0)) * (F.col("r") - 1) / (
        F.col("n") - 1
    )
    ct = F.col("c") - (F.col("c") - F.lit(1.0)) * (F.col("c") - 1) / (
        F.col("n") - 1
    )
    return nn.crossJoin(F.broadcast(chi)).select(
        F.col("n").alias("n_docs"),
        F.col("r").alias("n_langs"),
        F.col("c").alias("n_sources"),
        R.r(chi2, 4).alias("chi2_stat"),
        R.r(
            F.sqrt(
                chi2
                / (F.col("n") * F.least(F.col("r") - 1, F.col("c") - 1))
            ),
            6,
        ).alias("cramers_v"),
        R.r(
            F.sqrt(phi2c / F.least(rt - 1, ct - 1)), 6
        ).alias("cramers_v_corrected"),
    )


# --- Anderson-Darling two-sample test: en vs rest document lengths ----------------
# Scholz & Stephens (1987) k-sample Anderson-Darling (k=2) in the
# tie-corrected midrank form — the TAIL-SENSITIVE complement to
# ks_two_sample_lengths (KS sees the middle of the distribution; AD
# weights the tails). With half-unit integers B2_j = 2·cum_j − l_j
# and M2_ij = 2·cum_ij − l_ij on the bounded distinct-length grid,
# every term is t_ij = l_j·Δ²/(N·(B2(2N−B2) − N·l_j)·n_i) with
# Δ = N·M2_ij − n_i·B2_j an exact int64 — each term snaps to a 1e-8
# integer unit before the order-free sum, and A² = (N−1)/N · Σ. The
# raw statistic has mean k−1 = 1 under H0; we flag against the
# asymptotic 5% point ≈ 2.492 of the unstandardized 2-sample A²
# (documented approximation — the exact cutoff needs the
# Scholz-Stephens variance machinery). Scale: the ks_two_sample
# shape — one scan to the (sample × length) grid, cumulatives on the
# bounded length domain (allowlisted).
_AD_U = 100_000_000
_AD_CRIT_APPROX = 2.492

_AD_ORACLE = f"""
WITH d AS (
    SELECT CASE WHEN lang = 'en' THEN 'en' ELSE 'rest' END AS g,
           n_chars AS v
    FROM documents
),
l AS (
    SELECT v, count(*)::BIGINT AS l,
           (2 * (sum(count(*)) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
            - count(*))::BIGINT AS b2
    FROM d GROUP BY v
),
ns AS (SELECT g, count(*)::BIGINT AS n_i FROM d GROUP BY 1),
nn AS (SELECT count(*)::BIGINT AS n FROM d),
cg AS (
    SELECT g, v, count(*)::BIGINT AS li FROM d GROUP BY 1, 2
),
mg AS (
    SELECT ns.g, l.v, l.l, l.b2, ns.n_i,
           (2 * sum(coalesce(cg.li, 0)) OVER (PARTITION BY ns.g
                 ORDER BY l.v ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW)
            - coalesce(cg.li, 0))::BIGINT AS m2
    FROM ns CROSS JOIN l
    LEFT JOIN cg ON cg.g = ns.g AND cg.v = l.v
),
terms AS (
    SELECT mg.g,
           CAST(round(
               mg.l * ((nn.n * mg.m2 - mg.n_i * mg.b2)::DOUBLE
                       * (nn.n * mg.m2 - mg.n_i * mg.b2))
               / (nn.n::DOUBLE * (mg.b2 * (2 * nn.n - mg.b2)
                                  - nn.n * mg.l) * mg.n_i)
               * {_AD_U}) AS BIGINT) AS t_u
    FROM mg, nn
    WHERE mg.b2 * (2 * nn.n - mg.b2) - nn.n * mg.l > 0
),
a2 AS (
    SELECT sum(t_u)::BIGINT AS s_u FROM terms
)
SELECT nn.n AS n_total,
       (SELECT n_i FROM ns WHERE g = 'en')::BIGINT AS n_en,
       (SELECT n_i FROM ns WHERE g = 'rest')::BIGINT AS n_rest,
       round((nn.n - 1.0) / nn.n * a2.s_u / {_AD_U} * 10000) / 10000
           + 0.0 AS a2_stat,
       (nn.n - 1.0) / nn.n * a2.s_u / {_AD_U} > {_AD_CRIT_APPROX}
           AS reject_same_dist
FROM nn, a2
"""


@register("anderson_darling_two_sample", oracle=_AD_ORACLE)
def anderson_darling_two_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = read_table(spark, sf_dir, "documents").select(
        F.when(F.col("lang") == "en", "en").otherwise("rest").alias("g"),
        F.col("n_chars").alias("v"),
    )
    wl = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    l = (
        d.groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("l"))
        .withColumn(
            "b2",
            (2 * F.sum("l").over(wl) - F.col("l")).cast("long"),
        )
    )
    ns = d.groupBy("g").agg(F.count(F.lit(1)).cast("long").alias("n_i"))
    nn = d.agg(F.count(F.lit(1)).cast("long").alias("n"))
    cg = d.groupBy("g", "v").agg(
        F.count(F.lit(1)).cast("long").alias("li")
    )
    wg = Window.partitionBy("g").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    mg = (
        ns.crossJoin(F.broadcast(l))
        .join(F.broadcast(cg), ["g", "v"], "left")
        .withColumn(
            "m2",
            (
                2 * F.sum(F.coalesce("li", F.lit(0))).over(wg)
                - F.coalesce("li", F.lit(0))
            ).cast("long"),
        )
    )
    delta = F.col("n") * F.col("m2") - F.col("n_i") * F.col("b2")
    den_i = F.col("b2") * (2 * F.col("n") - F.col("b2")) - F.col(
        "n"
    ) * F.col("l")
    terms = (
        mg.crossJoin(F.broadcast(nn))
        .filter(den_i > 0)
        .select(
            F.round(
                F.col("l")
                * (delta.cast("double") * delta)
                / (F.col("n").cast("double") * den_i * F.col("n_i"))
                * F.lit(_AD_U)
            )
            .cast("long")
            .alias("t_u")
        )
    )
    a2 = terms.agg(F.sum("t_u").cast("long").alias("s_u"))
    n_en = ns.filter(F.col("g") == "en").select(
        F.col("n_i").alias("n_en")
    )
    n_rest = ns.filter(F.col("g") == "rest").select(
        F.col("n_i").alias("n_rest")
    )
    stat = (
        (F.col("n") - F.lit(1.0))
        / F.col("n")
        * F.col("s_u")
        / F.lit(float(_AD_U))
    )
    return (
        nn.crossJoin(F.broadcast(a2))
        .crossJoin(F.broadcast(n_en))
        .crossJoin(F.broadcast(n_rest))
        .select(
            F.col("n").alias("n_total"),
            "n_en",
            "n_rest",
            R.r(stat, 4).alias("a2_stat"),
            (stat > F.lit(_AD_CRIT_APPROX)).alias("reject_same_dist"),
        )
    )


# --- quantile treatment effects: purchase value by variant -------------------------
# The distributional complement to the mean tests (welch/cohens_d):
# QTE(p) = Q_treat(p) − Q_control(p) at p ∈ {0.25, 0.50, 0.75} —
# does the variant shift the whole distribution or only a tail?
# Quantiles are the exact type-1 order statistic (smallest value with
# cum ≥ ceil(p·n)) read off per-variant cumulative counts on the
# bounded distinct-cents grid — integer thresholds via
# ceil-as-arithmetic, zero float comparisons anywhere; QTE is an
# exact integer cents difference. Scale: one scan to the
# (variant × cents) grid; cumulatives are PARTITIONED by variant.
_QTE_PS = (25, 50, 75)  # percent, exact integers

_QTE_ORACLE = f"""
WITH v AS (
    SELECT (user_id % 2)::BIGINT AS variant,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events WHERE event_type = 'purchase'
),
g AS (
    SELECT variant, cents, count(*)::BIGINT AS c FROM v GROUP BY 1, 2
),
cum AS (
    SELECT variant, cents, c,
           sum(c) OVER (PARTITION BY variant ORDER BY cents
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW)::BIGINT AS cm
    FROM g
),
ns AS (SELECT variant, sum(c)::BIGINT AS n FROM g GROUP BY 1),
p AS (SELECT unnest([{", ".join(str(p) for p in _QTE_PS)}]) AS p),
qq AS (
    SELECT p.p, cum.variant,
           min(CASE WHEN cum.cm * 100 >= p.p * ns.n
                    THEN cum.cents END)::BIGINT AS q
    FROM cum JOIN ns USING (variant), p
    GROUP BY 1, 2
)
SELECT a.p::BIGINT AS percentile,
       round(a.q / 100.0 * 100) / 100 + 0.0 AS q_variant0,
       round(b.q / 100.0 * 100) / 100 + 0.0 AS q_variant1,
       round((b.q - a.q) / 100.0 * 100) / 100 + 0.0 AS qte_dollars
FROM qq a JOIN qq b ON a.p = b.p AND a.variant = 0 AND b.variant = 1
"""


@register("quantile_treatment_effect", oracle=_QTE_ORACLE)
def quantile_treatment_effect(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    v = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            (F.col("user_id") % 2).cast("long").alias("variant"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    g = v.groupBy("variant", "cents").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    cum = g.withColumn(
        "cm",
        F.sum("c")
        .over(
            Window.partitionBy("variant")
            .orderBy("cents")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .cast("long"),
    )
    ns = g.groupBy("variant").agg(F.sum("c").cast("long").alias("n"))
    p = spark.createDataFrame([(x,) for x in _QTE_PS], "p long")
    qq = (
        cum.join(F.broadcast(ns), "variant")
        .crossJoin(F.broadcast(p))
        .groupBy("p", "variant")
        .agg(
            F.min(
                F.when(
                    F.col("cm") * 100 >= F.col("p") * F.col("n"),
                    F.col("cents"),
                )
            )
            .cast("long")
            .alias("q")
        )
    )
    a = qq.filter(F.col("variant") == 0).select(
        F.col("p").alias("pa"), F.col("q").alias("qa")
    )
    b = qq.filter(F.col("variant") == 1).select(
        F.col("p").alias("pb"), F.col("q").alias("qb")
    )
    return a.join(F.broadcast(b), F.col("pa") == F.col("pb")).select(
        F.col("pa").alias("percentile"),
        R.r(F.col("qa") / F.lit(100.0), 2).alias("q_variant0"),
        R.r(F.col("qb") / F.lit(100.0), 2).alias("q_variant1"),
        R.r((F.col("qb") - F.col("qa")) / F.lit(100.0), 2).alias(
            "qte_dollars"
        ),
    )


# --- Mantel-Haenszel common odds ratio across language strata ----------------------
# Mantel & Haenszel (1959) — the confounding-aware association test:
# is "even-numbered source" associated with "long document"
# (n_chars > 250) AFTER stratifying by language? OR_MH =
# Σ a·d/n / Σ b·c/n with the Cochran-MH chi-square (continuity-
# corrected) against chi²(1). Every 2×2 cell is an exact integer; the
# per-stratum rational terms (ad/n, bc/n, E, Var) snap to integer
# 1e-6 units before the order-free sums, so the pooled OR and the
# CMH decision are ratios/comparisons of exact int64 on both engines.
# Scale: one scan to |langs| strata cells; everything after is
# bounded metadata.
_MH_U = 1_000_000
_MH_CHI2_CRIT = 3.8415

_MH_ORACLE = f"""
WITH d AS (
    SELECT lang,
           (CAST(substr(source, 4) AS BIGINT) % 2 = 0) AS exposed,
           (n_chars > 250) AS long_doc
    FROM documents
),
s AS (
    SELECT lang,
           count(*) FILTER (WHERE exposed AND long_doc)::BIGINT AS a,
           count(*) FILTER (WHERE exposed AND NOT long_doc)::BIGINT AS b,
           count(*) FILTER (WHERE NOT exposed AND long_doc)::BIGINT AS c,
           count(*) FILTER (WHERE NOT exposed AND NOT long_doc)::BIGINT
               AS dd,
           count(*)::BIGINT AS n
    FROM d GROUP BY 1
),
t AS (
    SELECT lang, a, b, c, dd, n,
           CAST(round(a * dd * {_MH_U}.0 / n) AS BIGINT) AS adn_u,
           CAST(round(b * c * {_MH_U}.0 / n) AS BIGINT) AS bcn_u,
           CAST(round((a + b) * (a + c) * {_MH_U}.0 / n) AS BIGINT)
               AS e_u,
           CAST(round((a + b)::DOUBLE * (c + dd) * (a + c) * (b + dd)
                      * {_MH_U} / (n::DOUBLE * n * (n - 1))) AS BIGINT)
               AS var_u
    FROM s
),
pool AS (
    SELECT sum(adn_u)::BIGINT AS sad, sum(bcn_u)::BIGINT AS sbc,
           sum(a * {_MH_U} - e_u)::BIGINT AS dev_u,
           sum(var_u)::BIGINT AS svar
    FROM t
)
SELECT t.lang, t.a, t.b, t.c, t.dd AS d, 
       round(CASE WHEN t.b * t.c > 0
                  THEN (t.a::DOUBLE * t.dd) / (t.b::DOUBLE * t.c)
             END * 10000) / 10000 + 0.0 AS stratum_or,
       round(pool.sad * 1.0 / pool.sbc * 10000) / 10000 + 0.0 AS mh_or,
       round((abs(pool.dev_u * 1.0 / {_MH_U}) - 0.5)
             * (abs(pool.dev_u * 1.0 / {_MH_U}) - 0.5)
             / (pool.svar * 1.0 / {_MH_U}) * 10000) / 10000 + 0.0
           AS cmh_stat,
       (abs(pool.dev_u * 1.0 / {_MH_U}) - 0.5)
       * (abs(pool.dev_u * 1.0 / {_MH_U}) - 0.5)
       / (pool.svar * 1.0 / {_MH_U}) > {_MH_CHI2_CRIT} AS significant
FROM t, pool
"""


@register("mantel_haenszel_or", oracle=_MH_ORACLE)
def mantel_haenszel_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents").select(
        "lang",
        (F.substring("source", 4, 10).cast("long") % 2 == 0).alias(
            "exposed"
        ),
        (F.col("n_chars") > 250).alias("long_doc"),
    )
    s = d.groupBy("lang").agg(
        F.sum(
            F.when(F.col("exposed") & F.col("long_doc"), 1).otherwise(0)
        )
        .cast("long")
        .alias("a"),
        F.sum(
            F.when(F.col("exposed") & ~F.col("long_doc"), 1).otherwise(0)
        )
        .cast("long")
        .alias("b"),
        F.sum(
            F.when(~F.col("exposed") & F.col("long_doc"), 1).otherwise(0)
        )
        .cast("long")
        .alias("c"),
        F.sum(
            F.when(~F.col("exposed") & ~F.col("long_doc"), 1).otherwise(
                0
            )
        )
        .cast("long")
        .alias("dd"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    uf = float(_MH_U)
    t = s.select(
        "lang",
        "a",
        "b",
        "c",
        "dd",
        "n",
        F.round(F.col("a") * F.col("dd") * F.lit(uf) / F.col("n"))
        .cast("long")
        .alias("adn_u"),
        F.round(F.col("b") * F.col("c") * F.lit(uf) / F.col("n"))
        .cast("long")
        .alias("bcn_u"),
        F.round(
            (F.col("a") + F.col("b"))
            * (F.col("a") + F.col("c"))
            * F.lit(uf)
            / F.col("n")
        )
        .cast("long")
        .alias("e_u"),
        F.round(
            (F.col("a") + F.col("b")).cast("double")
            * (F.col("c") + F.col("dd"))
            * (F.col("a") + F.col("c"))
            * (F.col("b") + F.col("dd"))
            * F.lit(_MH_U)
            / (
                F.col("n").cast("double")
                * F.col("n")
                * (F.col("n") - 1)
            )
        )
        .cast("long")
        .alias("var_u"),
    )
    pool = t.agg(
        F.sum("adn_u").cast("long").alias("sad"),
        F.sum("bcn_u").cast("long").alias("sbc"),
        F.sum(F.col("a") * F.lit(_MH_U) - F.col("e_u"))
        .cast("long")
        .alias("dev_u"),
        F.sum("var_u").cast("long").alias("svar"),
    )
    dev = F.abs(F.col("dev_u") * F.lit(1.0) / _MH_U) - 0.5
    cmh = dev * dev / (F.col("svar") * F.lit(1.0) / _MH_U)
    return t.crossJoin(F.broadcast(pool)).select(
        "lang",
        "a",
        "b",
        "c",
        F.col("dd").alias("d"),
        R.r(
            F.when(
                F.col("b") * F.col("c") > 0,
                (F.col("a").cast("double") * F.col("dd"))
                / (F.col("b").cast("double") * F.col("c")),
            ),
            4,
        ).alias("stratum_or"),
        R.r(F.col("sad") * F.lit(1.0) / F.col("sbc"), 4).alias("mh_or"),
        R.r(cmh, 4).alias("cmh_stat"),
        (cmh > F.lit(_MH_CHI2_CRIT)).alias("significant"),
    )


# --- Pettitt rank-based changepoint test ------------------------------------------
# Pettitt (1979) — the nonparametric single-changepoint test (the
# rank-based cousin of CUSUM, robust to outliers): U_t = Σ_{i≤t,j>t}
# sgn(x_j − x_i) over the daily value series, changepoint at
# argmax |U_t|, significance via the closed-form approximation
# p ≈ 2·exp(−6K²/(n³+n²)). Every U_t is an exact integer from the
# calendar-bounded day-pair table (sign comparisons on DECIMAL-exact
# daily sums); the argmax breaks ties on the earlier day. The exp is
# the single transcendental, snapped at 8dp like the KS p-value.
# Scale: one corpus scan to |days| rows; pairs are bounded metadata.
_PETTITT_ORACLE = """
WITH d AS (
    SELECT ts::DATE AS day, sum(CAST(value AS DECIMAL(30,8))) AS x
    FROM events GROUP BY 1
),
u AS (
    SELECT t.day,
           sum(CASE WHEN b.x > a.x THEN 1
                    WHEN b.x < a.x THEN -1 ELSE 0 END)::BIGINT AS u_t
    FROM d t
    JOIN d a ON a.day <= t.day
    JOIN d b ON b.day > t.day
    GROUP BY t.day
),
nn AS (SELECT count(*)::BIGINT AS n FROM d),
k AS (
    SELECT u.day, abs(u.u_t)::BIGINT AS au, u.u_t
    FROM u ORDER BY abs(u.u_t) DESC, u.day LIMIT 1
)
SELECT k.day AS changepoint_day, k.u_t AS u_stat, nn.n AS n_days,
       round(least(1.0, 2 * exp(-6.0 * k.au * k.au
             / (nn.n::DOUBLE * nn.n * nn.n + nn.n::DOUBLE * nn.n)))
             * 100000000) / 100000000 + 0.0 AS p_approx,
       least(1.0, 2 * exp(-6.0 * k.au * k.au
             / (nn.n::DOUBLE * nn.n * nn.n + nn.n::DOUBLE * nn.n)))
           < 0.05 AS significant
FROM k, nn
"""


@register("pettitt_changepoint", oracle=_PETTITT_ORACLE)
def pettitt_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        read_table(spark, sf_dir, "events")
        .select(F.col("ts").cast("date").alias("day"), "*")
        .groupBy("day")
        .agg(F.sum(F.col("value").cast("decimal(30,8)")).alias("x"))
    )
    t = d.select(F.col("day").alias("td"))
    a = d.select(F.col("day").alias("da"), F.col("x").alias("xa"))
    b = d.select(F.col("day").alias("db"), F.col("x").alias("xb"))
    u = (
        t.join(F.broadcast(a), F.col("da") <= F.col("td"))
        .join(F.broadcast(b), F.col("db") > F.col("td"))
        .groupBy("td")
        .agg(
            F.sum(
                F.when(F.col("xb") > F.col("xa"), 1)
                .when(F.col("xb") < F.col("xa"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("u_t")
        )
    )
    nn = d.agg(F.count(F.lit(1)).cast("long").alias("n"))
    k = u.orderBy(F.abs(F.col("u_t")).desc(), "td").limit(1)
    nd = F.col("n").cast("double")
    p = F.least(
        F.lit(1.0),
        F.lit(2.0)
        * F.exp(
            F.lit(-6.0)
            * F.abs(F.col("u_t"))
            * F.abs(F.col("u_t"))
            / (nd * F.col("n") * F.col("n") + nd * F.col("n"))
        ),
    )
    return k.crossJoin(F.broadcast(nn)).select(
        F.col("td").alias("changepoint_day"),
        F.col("u_t").alias("u_stat"),
        F.col("n").alias("n_days"),
        R.r(p, 8).alias("p_approx"),
        (p < F.lit(0.05)).alias("significant"),
    )


# --- Granger causality: does daily event count predict next-day value? -------------
# Granger (1969), lag-1 bivariate form: does adding yesterday's event
# COUNT improve the autoregressive prediction of today's revenue?
# F = (SSE_r − SSE_u)/(SSE_u/(n−3)) comparing the restricted AR(1)
# against the unrestricted 2-regressor OLS, both solved in closed
# form from n-scaled centered moments (T11 = nΣuu − ΣuΣu, … — all
# EXACT DECIMAL(38,0) products of integer cents/counts; the scale
# cancels in F). Lag pairs come from date arithmetic (day+1 join, no
# window). The critical value 4.2252 = F(1, 26) at α=0.05 matches the
# 30-day series (n_obs = 29); it is embedded as a literal. Scale: one
# corpus scan to the day table; the regression is bounded metadata.
_GRANGER_F_CRIT = 4.2252

_GRANGER_ORACLE = """
WITH d AS (
    SELECT ts::DATE AS day, count(*)::BIGINT AS x,
           sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS y
    FROM events GROUP BY 1
),
p AS (
    SELECT b.y AS yt, a.y AS u, a.x AS v
    FROM d a JOIN d b ON b.day = a.day + INTERVAL 1 DAY
),
m AS (
    SELECT count(*)::BIGINT AS n,
           sum(CAST(u AS DECIMAL(38,0))) AS su,
           sum(CAST(v AS DECIMAL(38,0))) AS sv,
           sum(CAST(yt AS DECIMAL(38,0))) AS sy,
           sum(CAST(u AS DECIMAL(38,0)) * u) AS suu,
           sum(CAST(v AS DECIMAL(38,0)) * v) AS svv,
           sum(CAST(u AS DECIMAL(38,0)) * v) AS suv,
           sum(CAST(u AS DECIMAL(38,0)) * yt) AS suy,
           sum(CAST(v AS DECIMAL(38,0)) * yt) AS svy,
           sum(CAST(yt AS DECIMAL(38,0)) * yt) AS syy
    FROM p
),
t AS (
    SELECT n,
           (n * suu - su * su)::DOUBLE AS t11,
           (n * svv - sv * sv)::DOUBLE AS t22,
           (n * suv - su * sv)::DOUBLE AS t12,
           (n * suy - su * sy)::DOUBLE AS t1y,
           (n * svy - sv * sy)::DOUBLE AS t2y,
           (n * syy - sy * sy)::DOUBLE AS tyy
    FROM m
),
f AS (
    SELECT n, t1y, t2y,
           (t1y * t22 - t2y * t12) / (t11 * t22 - t12 * t12) AS b,
           (t2y * t11 - t1y * t12) / (t11 * t22 - t12 * t12) AS c,
           tyy - t1y * t1y / t11 AS sse_r,
           tyy - ((t1y * t22 - t2y * t12) / (t11 * t22 - t12 * t12))
                 * t1y
               - ((t2y * t11 - t1y * t12) / (t11 * t22 - t12 * t12))
                 * t2y AS sse_u
    FROM t
)
SELECT n AS n_obs,
       round(b * 1000000) / 1000000 + 0.0 AS ar_coef,
       round(c / 100 * 1000000) / 1000000 + 0.0
           AS count_coef_dollars,
       round((sse_r - sse_u) / (sse_u / (n - 3)) * 10000) / 10000 + 0.0
           AS f_stat,
       (sse_r - sse_u) / (sse_u / (n - 3)) > {CRIT} AS granger_causes
FROM f
""".replace("{CRIT}", str(_GRANGER_F_CRIT))


@register("granger_causality_daily", oracle=_GRANGER_ORACLE)
def granger_causality_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        read_table(spark, sf_dir, "events")
        .select(F.col("ts").cast("date").alias("day"), "*")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("x"),
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("y"),
        )
    )
    a = d.select(
        F.col("day").alias("da"), F.col("y").alias("u"),
        F.col("x").alias("v"),
    )
    b = d.select(F.col("day").alias("db"), F.col("y").alias("yt"))
    p = a.join(
        F.broadcast(b), F.col("db") == F.date_add(F.col("da"), 1)
    ).select("yt", "u", "v")
    dc = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = p.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dc("u")).alias("su"),
        F.sum(dc("v")).alias("sv"),
        F.sum(dc("yt")).alias("sy"),
        F.sum(dc("u") * F.col("u")).alias("suu"),
        F.sum(dc("v") * F.col("v")).alias("svv"),
        F.sum(dc("u") * F.col("v")).alias("suv"),
        F.sum(dc("u") * F.col("yt")).alias("suy"),
        F.sum(dc("v") * F.col("yt")).alias("svy"),
        F.sum(dc("yt") * F.col("yt")).alias("syy"),
    )
    t = m.select(
        "n",
        (F.col("n") * F.col("suu") - F.col("su") * F.col("su"))
        .cast("double")
        .alias("t11"),
        (F.col("n") * F.col("svv") - F.col("sv") * F.col("sv"))
        .cast("double")
        .alias("t22"),
        (F.col("n") * F.col("suv") - F.col("su") * F.col("sv"))
        .cast("double")
        .alias("t12"),
        (F.col("n") * F.col("suy") - F.col("su") * F.col("sy"))
        .cast("double")
        .alias("t1y"),
        (F.col("n") * F.col("svy") - F.col("sv") * F.col("sy"))
        .cast("double")
        .alias("t2y"),
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
        .cast("double")
        .alias("tyy"),
    )
    det = F.col("t11") * F.col("t22") - F.col("t12") * F.col("t12")
    bb = (F.col("t1y") * F.col("t22") - F.col("t2y") * F.col("t12")) / det
    cc = (F.col("t2y") * F.col("t11") - F.col("t1y") * F.col("t12")) / det
    sse_r = F.col("tyy") - F.col("t1y") * F.col("t1y") / F.col("t11")
    sse_u = F.col("tyy") - bb * F.col("t1y") - cc * F.col("t2y")
    fstat = (sse_r - sse_u) / (sse_u / (F.col("n") - 3))
    return t.select(
        F.col("n").alias("n_obs"),
        R.r(bb, 6).alias("ar_coef"),
        R.r(cc / 100, 6).alias("count_coef_dollars"),
        R.r(fstat, 4).alias("f_stat"),
        (fstat > F.lit(_GRANGER_F_CRIT)).alias("granger_causes"),
    )


# --- Tukey HSD post-hoc pairwise comparisons after the ANOVA ------------------------
# Tukey (1949) honestly-significant-difference — the post-hoc step
# anova_oneway_f motivates: which PAIRS of priority classes actually
# differ? |m_i − m_j| against HSD = q·√(MSW/2·(1/n_i+1/n_j)) with the
# studentized-range critical value q(5, ∞) = 3.858 embedded as a
# literal (5 groups, large df). MSW reuses the ANOVA's snapped
# 1e6-cents² within terms (exact int64); means are exact-int ratios;
# the 10 pairwise comparisons are bounded metadata. Scale: one
# map-side-combined scan to 5 moment rows.
_HSD_Q_CRIT = 3.858  # q(k=5, inf) at alpha = 0.05

_HSD_ORACLE = f"""
WITH v AS (
    SELECT o_orderpriority AS priority,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
),
m AS (
    SELECT priority, count(*)::BIGINT AS n, sum(cents)::BIGINT AS s,
           sum(CAST(cents AS DECIMAL(38,0)) * cents) AS ss
    FROM v GROUP BY 1
),
w AS (
    SELECT sum(CAST(round((ss::DOUBLE - (s::DOUBLE * s) / n)
                          / {_ANOVA_T_U}) AS BIGINT))::BIGINT AS ssw,
           sum(n)::BIGINT AS nn, count(*)::BIGINT AS k
    FROM m
),
pairs AS (
    SELECT a.priority AS priority_a, b.priority AS priority_b,
           a.n AS na, b.n AS nb,
           a.s::DOUBLE / a.n AS ma, b.s::DOUBLE / b.n AS mb,
           w.ssw::DOUBLE * {_ANOVA_T_U} / (w.nn - w.k) AS msw
    FROM m a JOIN m b ON a.priority < b.priority, w
)
SELECT priority_a, priority_b,
       round((ma - mb) / 100 * 10000) / 10000 + 0.0 AS mean_diff,
       round({_HSD_Q_CRIT} * sqrt(msw / 2 * (1.0 / na + 1.0 / nb))
             / 100 * 10000) / 10000 + 0.0 AS hsd_threshold,
       abs(ma - mb) > {_HSD_Q_CRIT} * sqrt(msw / 2 * (1.0 / na + 1.0 / nb))
           AS significant
FROM pairs
"""


@register("tukey_hsd_priorities", oracle=_HSD_ORACLE)
def tukey_hsd_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    m = v.groupBy("priority").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.sum(
            F.col("cents").cast("decimal(38,0)") * F.col("cents")
        ).alias("ss"),
    )
    w = m.agg(
        F.sum(
            F.round(
                (
                    F.col("ss").cast("double")
                    - (F.col("s").cast("double") * F.col("s").cast("double"))
                    / F.col("n")
                )
                / F.lit(_ANOVA_T_U)
            ).cast("long")
        )
        .cast("long")
        .alias("ssw"),
        F.sum("n").cast("long").alias("nn"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    a = m.select(
        F.col("priority").alias("priority_a"), F.col("n").alias("na"),
        F.col("s").alias("sa"),
    )
    b = m.select(
        F.col("priority").alias("priority_b"), F.col("n").alias("nb"),
        F.col("s").alias("sb"),
    )
    pairs = (
        a.join(F.broadcast(b), F.col("priority_a") < F.col("priority_b"))
        .crossJoin(F.broadcast(w))
    )
    ma = F.col("sa").cast("double") / F.col("na")
    mb = F.col("sb").cast("double") / F.col("nb")
    msw = (
        F.col("ssw").cast("double")
        * F.lit(_ANOVA_T_U)
        / (F.col("nn") - F.col("k"))
    )
    hsd = F.lit(_HSD_Q_CRIT) * F.sqrt(
        msw / 2 * (F.lit(1.0) / F.col("na") + F.lit(1.0) / F.col("nb"))
    )
    return pairs.select(
        "priority_a",
        "priority_b",
        R.r((ma - mb) / 100, 4).alias("mean_diff"),
        R.r(hsd / 100, 4).alias("hsd_threshold"),
        (F.abs(ma - mb) > hsd).alias("significant"),
    )


# --- Storey π₀ estimate + q-values over the per-source KS tests --------------------
# Storey (2002) / Storey-Tibshirani (2003) — the ADAPTIVE complement
# to fdr_bh_source_length_tests: estimate the null fraction
# π₀ = #{p > λ}/((1−λ)·m) at λ=0.5 from the same 20 per-source KS
# drift p-values, then q(p_(i)) = min_{j≥i} π₀·m·p_(j)/j (monotone
# suffix-min over the ranked bounded test table). The p-value
# pipeline is byte-identical to the BH query's (exact integer ECDF
# gap products, 8dp-snapped exp); π₀ is a ratio of exact integers and
# each candidate q snaps to 1e-8 before the suffix-min, so ordering
# and mins compare exact int64. Scale: identical to fdr_bh — grid on
# the bounded length domain, then 20-row metadata.
_STOREY_LAMBDA = 0.5
_STOREY_Q_U = 100_000_000

_STOREY_ORACLE = f"""
WITH docs AS (SELECT source, n_chars FROM documents),
tot AS (SELECT count(*)::BIGINT AS n_all FROM docs),
per_src AS (SELECT source, count(*)::BIGINT AS n_s FROM docs GROUP BY 1),
vals AS (SELECT DISTINCT n_chars AS v FROM docs),
grid AS (SELECT p.source, p.n_s, v.v FROM per_src p, vals v),
cnt AS (
    SELECT source, n_chars AS v, count(*)::BIGINT AS c
    FROM docs GROUP BY 1, 2
),
cum AS (
    SELECT g.source, g.n_s, g.v,
           sum(coalesce(c.c, 0)) OVER (
               PARTITION BY g.source ORDER BY g.v
           )::BIGINT AS cum_s
    FROM grid g LEFT JOIN cnt c ON c.source = g.source AND c.v = g.v
),
cum_all_t AS (
    SELECT v, sum(c) OVER (ORDER BY v)::BIGINT AS cum_all
    FROM (SELECT n_chars AS v, count(*)::BIGINT AS c FROM docs GROUP BY 1)
),
gaps AS (
    SELECT cum.source, cum.n_s, tot.n_all,
           max(abs(cum.cum_s * (tot.n_all - cum.n_s)
                   - (ca.cum_all - cum.cum_s) * cum.n_s))::BIGINT AS g
    FROM cum JOIN cum_all_t ca ON ca.v = cum.v CROSS JOIN tot
    GROUP BY 1, 2, 3
),
tests AS (
    SELECT source,
           round(least(1.0,
               2.0 * exp(-2.0 * ((g::DOUBLE / (n_s * (n_all - n_s)))
                                 * (g::DOUBLE / (n_s * (n_all - n_s))))
                         * (n_s::DOUBLE * (n_all - n_s) / n_all)))
               * 100000000) / 100000000 + 0.0 AS p_value
    FROM gaps
),
m_t AS (
    SELECT count(*)::BIGINT AS m,
           sum(CASE WHEN p_value > {_STOREY_LAMBDA} THEN 1 ELSE 0 END)
               ::BIGINT AS n_over
    FROM tests
),
ranked AS (
    SELECT t.source, t.p_value, m_t.m, m_t.n_over,
           row_number() OVER (ORDER BY t.p_value, t.source) AS rk
    FROM tests t, m_t
),
cand AS (
    SELECT source, p_value, m, n_over, rk,
           CAST(round(least(1.0,
               (n_over::DOUBLE / ((1 - {_STOREY_LAMBDA}) * m))
               * m * p_value / rk) * {_STOREY_Q_U}) AS BIGINT) AS cand_u
    FROM ranked
),
qv AS (
    SELECT source, p_value, m, n_over, rk,
           min(cand_u) OVER (ORDER BY rk DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW)::BIGINT AS q_u
    FROM cand
)
SELECT source, p_value, rk::BIGINT AS p_rank,
       round(n_over * 1.0 / ((1 - {_STOREY_LAMBDA}) * m) * 1000000)
           / 1000000 + 0.0 AS pi0_hat,
       round(q_u * 1.0 / {_STOREY_Q_U} * 100000000) / 100000000 + 0.0
           AS q_value,
       q_u <= CAST(round(0.05 * {_STOREY_Q_U}) AS BIGINT) AS discovery
FROM qv
"""


@register("storey_qvalue_ks_tests", oracle=_STOREY_ORACLE)
def storey_qvalue_ks_tests(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select(
        "source", "n_chars"
    )
    tot = docs.agg(F.count(F.lit(1)).alias("n_all"))
    per_src = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    vals = docs.select(F.col("n_chars").alias("v")).distinct()
    grid = per_src.crossJoin(F.broadcast(vals))
    cnt = docs.groupBy("source", F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).alias("c")
    )
    cum = grid.join(F.broadcast(cnt), ["source", "v"], "left").withColumn(
        "cum_s",
        F.sum(F.coalesce("c", F.lit(0)))
        .over(Window.partitionBy("source").orderBy("v"))
        .cast("long"),
    )
    cum_all = (
        docs.groupBy(F.col("n_chars").alias("v"))
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn(
            "cum_all", F.sum("c").over(Window.orderBy("v")).cast("long")
        )
        .select("v", "cum_all")
    )
    gaps = (
        cum.join(F.broadcast(cum_all), "v")
        .crossJoin(F.broadcast(tot))
        .groupBy("source", "n_s", "n_all")
        .agg(
            F.max(
                F.abs(
                    F.col("cum_s") * (F.col("n_all") - F.col("n_s"))
                    - (F.col("cum_all") - F.col("cum_s")) * F.col("n_s")
                )
            )
            .cast("long")
            .alias("g")
        )
    )
    d_raw = F.col("g").cast("double") / (
        F.col("n_s") * (F.col("n_all") - F.col("n_s"))
    )
    lam = (
        F.col("n_s").cast("double")
        * (F.col("n_all") - F.col("n_s"))
        / F.col("n_all")
    )
    p_raw = F.least(
        F.lit(1.0), F.lit(2.0) * F.exp(F.lit(-2.0) * (d_raw * d_raw) * lam)
    )
    tests = gaps.select("source", R.r(p_raw, 8).alias("p_value"))
    m_t = tests.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum(
            F.when(F.col("p_value") > F.lit(_STOREY_LAMBDA), 1).otherwise(
                0
            )
        )
        .cast("long")
        .alias("n_over"),
    )
    ranked = tests.crossJoin(F.broadcast(m_t)).withColumn(
        "rk",
        F.row_number().over(Window.orderBy("p_value", "source")).cast(
            "long"
        ),
    )
    pi0 = F.col("n_over").cast("double") / (
        (1 - _STOREY_LAMBDA) * F.col("m")
    )
    cand = ranked.withColumn(
        "cand_u",
        F.round(
            F.least(
                F.lit(1.0),
                pi0 * F.col("m") * F.col("p_value") / F.col("rk"),
            )
            * F.lit(_STOREY_Q_U)
        ).cast("long"),
    )
    qv = cand.withColumn(
        "q_u",
        F.min("cand_u")
        .over(
            Window.orderBy(F.col("rk").desc()).rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .cast("long"),
    )
    return qv.select(
        "source",
        "p_value",
        F.col("rk").alias("p_rank"),
        R.r(pi0, 6).alias("pi0_hat"),
        R.r(F.col("q_u") * F.lit(1.0) / _STOREY_Q_U, 8).alias("q_value"),
        (
            F.col("q_u")
            <= F.round(F.lit(0.05) * F.lit(_STOREY_Q_U)).cast("long")
        ).alias("discovery"),
    )


# --- Cochran's Q: do three quality filters have equal pass rates? ------------------
# Cochran (1950) — the k-filter generalization of McNemar: three
# binary document filters (length ≥ 50 tokens; distinct-token ratio
# ≥ 1/2; stopword ratio ≥ 1/20) applied to the SAME documents —
# equal marginal pass rates? Q = (k−1)·(k·ΣC_j² − (ΣC_j)²)
# / (k·ΣR_i − ΣR_i²) from exact integer column totals and per-doc row
# sums (C² through DECIMAL(38,0)); the filter predicates are pure
# integer comparisons (n_distinct·2 ≥ n, n_stop·20 ≥ n — no float
# thresholds anywhere). Scale: ONE corpus scan computing all three
# flags row-locally, then a 1-row moment aggregate.
_CQ_CHI2_CRIT = 5.9915  # chi2(2 df) at alpha = 0.05

_CQ_ORACLE = f"""
WITH f AS (
    SELECT doc_id,
           CASE WHEN len(toks) >= 50 THEN 1 ELSE 0 END AS f1,
           CASE WHEN len(list_distinct(toks)) * 2 >= len(toks)
                THEN 1 ELSE 0 END AS f2,
           CASE WHEN len(list_filter(toks, x -> list_contains(
                    ['the', 'a', 'of', 'and', 'to', 'in', 'is'], x)))
                    * 20 >= len(toks)
                THEN 1 ELSE 0 END AS f3
    FROM (
        SELECT doc_id,
               list_filter(string_split_regex(trim(text), '\\s+'),
                           x -> len(x) > 0) AS toks
        FROM documents
    ) WHERE len(toks) > 0
),
m AS (
    SELECT count(*)::BIGINT AS n,
           sum(f1)::BIGINT AS c1, sum(f2)::BIGINT AS c2,
           sum(f3)::BIGINT AS c3,
           sum(f1 + f2 + f3)::BIGINT AS sr,
           sum((f1 + f2 + f3) * (f1 + f2 + f3))::BIGINT AS sr2
    FROM f
),
q AS (
    SELECT n, c1, c2, c3,
           (2.0 * (3.0 * (CAST(c1 AS DECIMAL(38,0)) * c1
                          + CAST(c2 AS DECIMAL(38,0)) * c2
                          + CAST(c3 AS DECIMAL(38,0)) * c3)::DOUBLE
                   - (CAST(sr AS DECIMAL(38,0)) * sr)::DOUBLE))
           / (3.0 * sr - sr2) AS q_stat
    FROM m
)
SELECT n AS n_docs, c1 AS pass_length, c2 AS pass_diversity,
       c3 AS pass_stopword,
       round(q_stat * 10000) / 10000 + 0.0 AS q_stat,
       q_stat > {_CQ_CHI2_CRIT} AS significant
FROM q
"""


@register("cochran_q_filters", oracle=_CQ_ORACLE)
def cochran_q_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from swat_mapreduce_spark.functions.text import ws_tokens

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", ws_tokens(F.col("text")).alias("toks")
    ).filter(F.size("toks") > 0)
    stop_arr = F.array(
        *[F.lit(w) for w in ("the", "a", "of", "and", "to", "in", "is")]
    )
    f1 = F.when(F.size("toks") >= 50, 1).otherwise(0)
    f2 = F.when(
        F.size(F.array_distinct("toks")) * 2 >= F.size("toks"), 1
    ).otherwise(0)
    f3 = F.when(
        F.size(
            F.filter("toks", lambda x: F.array_contains(stop_arr, x))
        )
        * 20
        >= F.size("toks"),
        1,
    ).otherwise(0)
    f = docs.select(
        f1.alias("f1"), f2.alias("f2"), f3.alias("f3")
    )
    r = F.col("f1") + F.col("f2") + F.col("f3")
    m = f.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("f1").cast("long").alias("c1"),
        F.sum("f2").cast("long").alias("c2"),
        F.sum("f3").cast("long").alias("c3"),
        F.sum(r).cast("long").alias("sr"),
        F.sum(r * r).cast("long").alias("sr2"),
    )
    csq = (
        F.col("c1").cast("decimal(38,0)") * F.col("c1")
        + F.col("c2").cast("decimal(38,0)") * F.col("c2")
        + F.col("c3").cast("decimal(38,0)") * F.col("c3")
    ).cast("double")
    srsq = (F.col("sr").cast("decimal(38,0)") * F.col("sr")).cast("double")
    q = (F.lit(2.0) * (F.lit(3.0) * csq - srsq)) / (
        F.lit(3.0) * F.col("sr") - F.col("sr2")
    )
    return m.select(
        F.col("n").alias("n_docs"),
        F.col("c1").alias("pass_length"),
        F.col("c2").alias("pass_diversity"),
        F.col("c3").alias("pass_stopword"),
        R.r(q, 4).alias("q_stat"),
        (q > F.lit(_CQ_CHI2_CRIT)).alias("significant"),
    )


# --- Ljung-Box portmanteau test over daily-value autocorrelations ------------------
# Ljung & Box (1978) — the portmanteau whiteness test on top of
# acf_daily_lags: Q(m) = n(n+2)·Σ_{k≤m} r_k²/(n−k) for m = 1..7,
# each against its chi²(m) 5% critical value (literal map). Each r_k
# is the ACF's 1e-6-snapped integer (identical pipeline: exact
# DECIMAL daily sums, 1e-8-unit product terms), each r²/(n−k) term
# snaps to an integer 1e-12 unit, and the cumulative Σ runs over the
# bounded 7-row lag table — so every Q and every decision compares
# exact-int-derived doubles. Scale: one corpus scan to the day table;
# everything after is constant-size.
_LB_MAX_LAG = 7
_LB_CRIT = {1: 3.8415, 2: 5.9915, 3: 7.8147, 4: 9.4877,
            5: 11.0705, 6: 12.5916, 7: 14.0671}

_LB_ORACLE = f"""
WITH daily AS (
    SELECT ts::DATE AS day, sum(CAST(value AS DECIMAL(30,8))) AS x
    FROM events GROUP BY 1
),
arr AS (
    SELECT list(x::DOUBLE ORDER BY day) AS xs, count(*)::BIGINT AS n,
           sum(x) AS sx
    FROM daily
),
m AS (SELECT xs, n, (sx::DOUBLE) / n AS mu FROM arr),
den AS (
    SELECT xs, n, mu,
           sum(CAST(round(((x - mu) * (x - mu)) * 100000000) AS BIGINT))
               ::DOUBLE / 100000000 AS d
    FROM m, unnest(xs) AS u(x)
    GROUP BY xs, n, mu
),
r AS (
    SELECT k.k AS lag, den.n,
           CASE WHEN den.n > k.k AND den.d <> 0 THEN
           CAST(round((SELECT sum(CAST(round(((xs[i] - mu)
                           * (xs[i + k.k] - mu)) * 100000000) AS BIGINT))
                       FROM unnest(generate_series(1,
                           CAST(n - k.k AS INT))) AS g(i)
                      )::DOUBLE / 100000000 / d * 1000000) AS BIGINT)
           END AS r_u
    FROM den, generate_series(1, {_LB_MAX_LAG}) AS k(k)
),
t AS (
    SELECT lag, n, r_u,
           CAST(round(r_u::DOUBLE * r_u / (n - lag)) AS BIGINT) AS t_u
    FROM r
),
q AS (
    SELECT a.lag, a.n, a.r_u,
           sum(b.t_u)::BIGINT AS cum_u
    FROM t a JOIN t b ON b.lag <= a.lag
    GROUP BY a.lag, a.n, a.r_u
)
SELECT lag AS m_lags,
       round(r_u * 1.0 / 1000000 * 1000000) / 1000000 + 0.0 AS acf,
       round(n * (n + 2.0) * cum_u / 1e12 * 10000) / 10000 + 0.0
           AS q_stat,
       n * (n + 2.0) * cum_u / 1e12 >
           (CASE lag WHEN 1 THEN {_LB_CRIT[1]} WHEN 2 THEN {_LB_CRIT[2]}
                 WHEN 3 THEN {_LB_CRIT[3]} WHEN 4 THEN {_LB_CRIT[4]}
                 WHEN 5 THEN {_LB_CRIT[5]} WHEN 6 THEN {_LB_CRIT[6]}
                 ELSE {_LB_CRIT[7]} END) AS reject_whiteness
FROM q
"""


@register("ljung_box_daily", oracle=_LB_ORACLE)
def ljung_box_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_value(spark, sf_dir)
    arr = daily.agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct("day", F.col("x").cast("double").alias("x"))
                )
            ),
            lambda s: s["x"],
        ).alias("xs"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
    )
    m = arr.select(
        "xs", "n", (F.col("sx").cast("double") / F.col("n")).alias("mu")
    )

    def units(term):
        return F.round(term * F.lit(1e8)).cast("long")

    den_col = (
        F.aggregate(
            F.transform(
                F.col("xs"),
                lambda x: units((x - F.col("mu")) * (x - F.col("mu"))),
            ),
            F.lit(0).cast("long"),
            lambda acc, t: acc + t,
        ).cast("double")
        / F.lit(1e8)
    ).alias("d")
    den = m.select("xs", "n", "mu", den_col)
    lags = spark.createDataFrame(
        [(k,) for k in range(1, _LB_MAX_LAG + 1)], "lag long"
    )

    def num_u_col():
        # gotcha 10: only composed under the call-site F.when(n > lag)
        # CaseWhen branch, so the 1..n-lag sequence never descends; the
        # guard lives here too so the expression is safe standalone.
        idx = F.when(
            F.col("n") > F.col("lag"),
            F.sequence(F.lit(1), (F.col("n") - F.col("lag")).cast("int")),
        ).otherwise(F.array().cast("array<int>"))
        return F.aggregate(
            F.transform(
                idx,
                lambda i: units(
                    (F.element_at(F.col("xs"), i) - F.col("mu"))
                    * (
                        F.element_at(
                            F.col("xs"),
                            (i + F.col("lag")).cast("int"),
                        )
                        - F.col("mu")
                    )
                ),
            ),
            F.lit(0).cast("long"),
            lambda acc, t: acc + t,
        )
    # guard 1 (gotcha 10): the 1..n-lag index sequence needs
    # n - lag >= 1 or Spark's sequence DESCENDS where DuckDB's
    # generate_series is empty (NULL sum) — same guard as the acf
    # sibling. guard 2 (ADVICE r9): a constant series has d = 0 and
    # the ratio must be NULL on both engines, not NaN (aee9c3c class).
    r = den.crossJoin(F.broadcast(lags)).select(
        "lag",
        "n",
        F.when(
            (F.col("n") > F.col("lag")) & (F.col("d") != F.lit(0.0)),
            F.round(
                num_u_col().cast("double") / F.lit(1e8) / F.col("d")
                * F.lit(1e6)
            ),
        )
        .cast("long")
        .alias("r_u"),
    )
    t = r.select(
        "lag",
        "n",
        "r_u",
        F.round(
            F.col("r_u").cast("double") * F.col("r_u")
            / (F.col("n") - F.col("lag"))
        )
        .cast("long")
        .alias("t_u"),
    )
    a = t.select(
        F.col("lag").alias("la"), F.col("n").alias("n"),
        F.col("r_u").alias("r_u"),
    )
    b = t.select(F.col("lag").alias("lb"), F.col("t_u").alias("t_u"))
    q = (
        a.join(F.broadcast(b), F.col("lb") <= F.col("la"))
        .groupBy("la", "n", "r_u")
        .agg(F.sum("t_u").cast("long").alias("cum_u"))
    )
    crit = None
    for k in range(1, _LB_MAX_LAG + 1):
        br = F.when(F.col("la") == k, F.lit(_LB_CRIT[k]))
        crit = br if crit is None else crit.when(
            F.col("la") == k, F.lit(_LB_CRIT[k])
        )
    qv = F.col("n") * (F.col("n") + F.lit(2.0)) * F.col("cum_u") / F.lit(
        1e12
    )
    return q.select(
        F.col("la").alias("m_lags"),
        R.r(F.col("r_u") * F.lit(1.0) / 1e6, 6).alias("acf"),
        R.r(qv, 4).alias("q_stat"),
        (qv > crit).alias("reject_whiteness"),
    )
