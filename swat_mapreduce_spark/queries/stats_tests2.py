"""Round-10 statistics pack: block/paired designs and classical
homogeneity tests over the daily event series and the document corpus
— the experimentation primitives sitting between the existing
location tests (Welch/Mann-Whitney/Kruskal) and the trend/changepoint
family (MK/Pettitt/Page-Hinkley).

Cross-engine determinism discipline (CLAUDE.md gotchas 2/3/13a):

- Every rank is computed over EXACT keys (DECIMAL daily sums or int64
  lengths) with a deterministic tie-break column, so both engines
  assign identical ranks.
- Every variance/deviation moment goes through the ljung_box integer
  unit pattern: ``round(term * 10^d)`` as int64, summed exactly, then
  one division at the end — no accumulation-order noise.
- The sign test's binomial tail is EXACT in IEEE doubles: the
  recurrence C(n,k+1) = C(n,k)·(n−k)/(k+1) keeps every intermediate an
  exactly-representable integer < 2^53 (n ≤ 31 days), the partial sums
  are integers < 2^n, and the final division by 2^n (a power of two)
  is exact — both engines see the same rational number, no rounding
  procedure needed.
- ln() (Bartlett) is the only transcendental: both engines take ln of
  IDENTICAL doubles (built from exact integer moments) and the result
  is snapped to 8dp before any weighting, so a last-ulp libm
  divergence cannot propagate (same mitigation as the KS p-value).

Scale posture: every test reduces the corpus to a bounded moment /
count table in ONE shuffle (|days| = 30, |days|×|types| = 150,
|langs| = 5, |priorities|×|quantities| = 250 rows), then finishes with
broadcast arithmetic on that bounded table — no global windows on
unbounded inputs, no pair enumeration over raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from swat_mapreduce_spark.functions import rounding as R
from swat_mapreduce_spark.queries import register
from swat_mapreduce_spark.queries.stats_tests import _daily_value
from swat_mapreduce_spark.sources.readers import read_table

# --- Friedman rank test across event types blocked by day ------------------
# "Do the five event types carry systematically different daily value
# levels?" — the repeated-measures ANOVA alternative: rank the k=5
# treatment cells WITHIN each day block, compare rank-sum dispersion
# to the chi-square null. No-ties variant: the DECIMAL cell sums are
# continuous enough that ties are measure-zero, and the rank key
# carries event_type as a deterministic tie-break so both engines
# agree even if one occurs. Blocks missing a treatment are dropped
# (complete-block design), mirrored in the oracle.

_FRIEDMAN_K = 5
_CHI2_CRIT_DF4 = 9.4877  # chi-square 95th percentile, df = k-1 = 4

_FRIEDMAN_ORACLE = f"""
WITH cell AS (
    SELECT ts::DATE AS day, event_type,
           sum(CAST(value AS DECIMAL(30,8))) AS x
    FROM events GROUP BY 1, 2
),
ok AS (
    SELECT day FROM cell GROUP BY day
    HAVING count(*) = {_FRIEDMAN_K}
),
rk AS (
    SELECT day, event_type,
           rank() OVER (PARTITION BY day ORDER BY x, event_type) AS r
    FROM cell WHERE day IN (SELECT day FROM ok)
),
rs AS (
    SELECT event_type, sum(r)::BIGINT AS rank_sum FROM rk GROUP BY 1
),
nn AS (SELECT count(*)::BIGINT AS n FROM ok),
q AS (
    SELECT round((12.0 * sum(rank_sum * rank_sum)
                  / (nn.n * {_FRIEDMAN_K} * {_FRIEDMAN_K + 1})
                  - 3.0 * nn.n * {_FRIEDMAN_K + 1}) * 1000000) / 1000000
           + 0.0 AS q_stat
    FROM rs, nn GROUP BY nn.n
)
SELECT rs.event_type, rs.rank_sum,
       round(rs.rank_sum * 1.0 / nn.n * 10000) / 10000 + 0.0 AS mean_rank,
       q.q_stat, q.q_stat > {_CHI2_CRIT_DF4} AS reject_equal_treatment
FROM rs, nn, q
"""


@register("friedman_event_types", oracle=_FRIEDMAN_ORACLE)
def friedman_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    cell = ev.groupBy(
        F.col("ts").cast("date").alias("day"), "event_type"
    ).agg(F.sum(F.col("value").cast("decimal(30,8)")).alias("x"))
    ok = (
        cell.groupBy("day")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") == _FRIEDMAN_K)
        .select("day")
    )
    # |days|-bounded block table; the rank window partitions by day
    rk = cell.join(F.broadcast(ok), "day").select(
        "event_type",
        F.rank()
        .over(Window.partitionBy("day").orderBy("x", "event_type"))
        .alias("r"),
    )
    rs = rk.groupBy("event_type").agg(
        F.sum("r").cast("long").alias("rank_sum")
    )
    nn = ok.agg(F.count(F.lit(1)).cast("long").alias("n"))
    q = rs.crossJoin(F.broadcast(nn)).agg(
        R.r(
            F.lit(12.0)
            * F.sum(F.col("rank_sum") * F.col("rank_sum"))
            / (F.first("n") * _FRIEDMAN_K * (_FRIEDMAN_K + 1))
            - F.lit(3.0) * F.first("n") * (_FRIEDMAN_K + 1),
            6,
        ).alias("q_stat")
    )
    return (
        rs.crossJoin(F.broadcast(nn))
        .crossJoin(F.broadcast(q))
        .select(
            "event_type",
            "rank_sum",
            R.r(F.col("rank_sum") * F.lit(1.0) / F.col("n"), 4).alias(
                "mean_rank"
            ),
            "q_stat",
            (F.col("q_stat") > _CHI2_CRIT_DF4).alias(
                "reject_equal_treatment"
            ),
        )
    )


# --- Grubbs outlier statistic on the daily value series ---------------------
# G = max|x_i - mean| / s: "is the most extreme day an outlier?"
# Deviations are snapped to integer 1e-4 units of the exact DECIMAL
# daily sums before squaring (1e8-unit squared terms, |sum| < 2^63 at
# 30 days), so s is built from identical exact integers in both
# engines; sqrt is IEEE-correctly-rounded on identical input. The
# flagged day is elected by a 30-row window rank with a day tie-break.

_GRUBBS_ORACLE = """
WITH daily AS (
    SELECT ts::DATE AS day, sum(CAST(value AS DECIMAL(30,8))) AS x
    FROM events GROUP BY 1
),
m AS (
    SELECT count(*)::BIGINT AS n, (sum(x)::DOUBLE) / count(*) AS mu
    FROM daily
),
dev AS (
    SELECT day, CAST(round((x::DOUBLE - mu) * (x::DOUBLE - mu) * 10000)
                     AS BIGINT) AS sq_u,
           abs(x::DOUBLE - mu) AS ad, n
    FROM daily, m
),
s AS (
    SELECT n, sqrt((sum(sq_u)::DOUBLE / 10000) / (n - 1)) AS sd
    FROM dev GROUP BY n
),
top AS (
    SELECT day, ad FROM dev ORDER BY ad DESC, day LIMIT 1
)
SELECT s.n AS n_days, top.day AS outlier_day,
       round(top.ad / s.sd * 1000000) / 1000000 + 0.0 AS g_stat,
       top.ad / s.sd > 3.0 AS exceeds_three
FROM s, top
"""


@register("grubbs_outlier_daily", oracle=_GRUBBS_ORACLE)
def grubbs_outlier_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_value(spark, sf_dir)
    m = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (F.sum("x").cast("double") / F.count(F.lit(1))).alias("mu"),
    )
    dev = daily.crossJoin(F.broadcast(m)).select(
        "day",
        "n",
        F.round(
            (F.col("x").cast("double") - F.col("mu"))
            * (F.col("x").cast("double") - F.col("mu"))
            * F.lit(10000)
        )
        .cast("long")
        .alias("sq_u"),
        F.abs(F.col("x").cast("double") - F.col("mu")).alias("ad"),
    )
    s = dev.groupBy("n").agg(
        F.sqrt(
            (F.sum("sq_u").cast("double") / F.lit(10000)) / (F.col("n") - 1)
        ).alias("sd")
    )
    top = (
        dev.select(
            "day",
            "ad",
            F.row_number()
            .over(Window.orderBy(F.desc("ad"), F.asc("day")))
            .alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select("day", "ad")
    )
    return (
        s.crossJoin(F.broadcast(top))
        .select(
            F.col("n").alias("n_days"),
            F.col("day").alias("outlier_day"),
            R.r(F.col("ad") / F.col("sd"), 6).alias("g_stat"),
            (F.col("ad") / F.col("sd") > 3.0).alias("exceeds_three"),
        )
    )


# --- Mood's median test: document length by language ------------------------
# Nonparametric k-sample location test on counts above/at-or-below the
# grand median — fully integer until the final chi-square division.
# The grand median is defined EXPLICITLY (smallest length whose
# cumulative count reaches ceil(n/2) over the value-domain grid) so
# both engines compute the identical cut, independent of their
# percentile implementations.

_MOOD_ORACLE = f"""
WITH g AS (
    SELECT n_chars AS v, count(*)::BIGINT AS c FROM documents GROUP BY 1
),
tot AS (SELECT sum(c)::BIGINT AS n FROM g),
med AS (
    SELECT min(v) AS med FROM (
        SELECT v, sum(c) OVER (ORDER BY v) AS cum FROM g
    ), tot
    WHERE cum >= (tot.n + 1) // 2
),
cells AS (
    SELECT lang,
           sum(CASE WHEN n_chars > med.med THEN 1 ELSE 0 END)::BIGINT
               AS n_above,
           sum(CASE WHEN n_chars <= med.med THEN 1 ELSE 0 END)::BIGINT
               AS n_at_or_below
    FROM documents, med GROUP BY lang, med.med
),
tots AS (
    SELECT sum(n_above)::BIGINT AS ta, sum(n_at_or_below)::BIGINT AS tb,
           sum(n_above + n_at_or_below)::BIGINT AS n
    FROM cells
),
chi AS (
    SELECT round(sum(
               (n_above - (n_above + n_at_or_below) * 1.0 * ta / n)
               * (n_above - (n_above + n_at_or_below) * 1.0 * ta / n)
               / ((n_above + n_at_or_below) * 1.0 * ta / n)
               + (n_at_or_below - (n_above + n_at_or_below) * 1.0 * tb / n)
               * (n_at_or_below - (n_above + n_at_or_below) * 1.0 * tb / n)
               / ((n_above + n_at_or_below) * 1.0 * tb / n)
           ) * 1000000) / 1000000 + 0.0 AS chi2
    FROM cells, tots
)
SELECT cells.lang, cells.n_above, cells.n_at_or_below, med.med AS grand_median,
       chi.chi2, chi.chi2 > {_CHI2_CRIT_DF4} AS reject_equal_medians
FROM cells, med, chi
"""


@register("mood_median_test_lang", oracle=_MOOD_ORACLE)
def mood_median_test_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select("lang", "n_chars")
    g = docs.groupBy(F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    tot = g.agg(F.sum("c").cast("long").alias("n"))
    # value-domain grid (bounded by the length domain, like the KS grid)
    med = (
        g.select("v", F.sum("c").over(Window.orderBy("v")).alias("cum"))
        .crossJoin(F.broadcast(tot))
        # integer div mirrors the oracle's //: (n+1)/2 in Spark SQL is
        # a DOUBLE division and would shift the cut on even counts
        .filter(F.col("cum") >= F.expr("(n + 1) div 2"))
        .agg(F.min("v").alias("med"))
    )
    cells = docs.crossJoin(F.broadcast(med)).groupBy("lang", "med").agg(
        F.sum(F.when(F.col("n_chars") > F.col("med"), 1).otherwise(0))
        .cast("long")
        .alias("n_above"),
        F.sum(F.when(F.col("n_chars") <= F.col("med"), 1).otherwise(0))
        .cast("long")
        .alias("n_at_or_below"),
    )
    tots = cells.agg(
        F.sum("n_above").cast("long").alias("ta"),
        F.sum("n_at_or_below").cast("long").alias("tb"),
        F.sum(F.col("n_above") + F.col("n_at_or_below"))
        .cast("long")
        .alias("n"),
    )
    ea = (F.col("n_above") + F.col("n_at_or_below")) * F.lit(1.0) * F.col(
        "ta"
    ) / F.col("n")
    eb = (F.col("n_above") + F.col("n_at_or_below")) * F.lit(1.0) * F.col(
        "tb"
    ) / F.col("n")
    chi = (
        cells.crossJoin(F.broadcast(tots))
        .agg(
            R.r(
                F.sum(
                    (F.col("n_above") - ea) * (F.col("n_above") - ea) / ea
                    + (F.col("n_at_or_below") - eb)
                    * (F.col("n_at_or_below") - eb)
                    / eb
                ),
                6,
            ).alias("chi2")
        )
    )
    return (
        cells.crossJoin(F.broadcast(chi))
        .select(
            "lang",
            "n_above",
            "n_at_or_below",
            F.col("med").alias("grand_median"),
            "chi2",
            (F.col("chi2") > _CHI2_CRIT_DF4).alias("reject_equal_medians"),
        )
    )


# --- Wilcoxon signed-rank: afternoon vs morning daily value ------------------
# Paired design on the 30 days: d = PM sum − AM sum per day (exact
# DECIMAL difference), |d| ranked with a day tie-break (no-ties
# variant), W+ compared to the normal null. The halves are exact
# calendar halves (hour < 12), so the pairing is reproducible.

_WILCOXON_ORACLE = """
WITH halves AS (
    SELECT ts::DATE AS day,
           sum(CASE WHEN extract(hour FROM ts) < 12
                    THEN CAST(value AS DECIMAL(30,8))
                    ELSE CAST(0 AS DECIMAL(30,8)) END) AS am,
           sum(CASE WHEN extract(hour FROM ts) >= 12
                    THEN CAST(value AS DECIMAL(30,8))
                    ELSE CAST(0 AS DECIMAL(30,8)) END) AS pm
    FROM events GROUP BY 1
),
d AS (
    SELECT day, pm - am AS diff FROM halves WHERE pm <> am
),
rk AS (
    SELECT day, diff,
           rank() OVER (ORDER BY abs(diff), day) AS r
    FROM d
),
agg AS (
    SELECT count(*)::BIGINT AS n,
           sum(CASE WHEN diff > 0 THEN r ELSE 0 END)::BIGINT AS w_plus
    FROM rk
)
SELECT n AS n_pairs, w_plus,
       round((w_plus - n * (n + 1) / 4.0)
             / sqrt(n * (n + 1) * (2 * n + 1) / 24.0) * 1000000) / 1000000
           + 0.0 AS z,
       abs((w_plus - n * (n + 1) / 4.0)
           / sqrt(n * (n + 1) * (2 * n + 1) / 24.0)) > 1.96
           AS reject_symmetry
FROM agg
"""


def _halfday_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    dec = "decimal(30,8)"
    return ev.select(
        F.col("ts").cast("date").alias("day"), "*"
    ).groupBy("day").agg(
        F.sum(
            F.when(
                F.hour("ts") < 12, F.col("value").cast(dec)
            ).otherwise(F.lit(0).cast(dec))
        ).alias("am"),
        F.sum(
            F.when(
                F.hour("ts") >= 12, F.col("value").cast(dec)
            ).otherwise(F.lit(0).cast(dec))
        ).alias("pm"),
    )


@register("wilcoxon_signed_rank_halfday", oracle=_WILCOXON_ORACLE)
def wilcoxon_signed_rank_halfday(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = (
        _halfday_pairs(spark, sf_dir)
        .filter(F.col("pm") != F.col("am"))
        .select("day", (F.col("pm") - F.col("am")).alias("diff"))
    )
    rk = d.select(
        "diff",
        F.rank()
        .over(Window.orderBy(F.abs(F.col("diff")), F.col("day")))
        .alias("r"),
    )
    agg = rk.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("diff") > 0, F.col("r")).otherwise(0))
        .cast("long")
        .alias("w_plus"),
    )
    zc = (F.col("w_plus") - F.col("n") * (F.col("n") + 1) / F.lit(4.0)) / (
        F.sqrt(
            F.col("n")
            * (F.col("n") + 1)
            * (2 * F.col("n") + 1)
            / F.lit(24.0)
        )
    )
    return agg.select(
        F.col("n").alias("n_pairs"),
        "w_plus",
        R.r(zc, 6).alias("z"),
        (F.abs(zc) > 1.96).alias("reject_symmetry"),
    )


# --- Exact sign test on the same half-day pairing ---------------------------
# p = min(1, 2·P(Bin(n, 1/2) ≤ min(pos, neg))), computed EXACTLY: the
# binomial recurrence keeps every intermediate an integer < 2^53 and
# the final /2^n is a power-of-two division — both engines produce the
# bit-identical rational (see module docstring). The oracle replays
# the recurrence with a recursive CTE.

_SIGN_ORACLE = """
WITH RECURSIVE halves AS (
    SELECT ts::DATE AS day,
           sum(CASE WHEN extract(hour FROM ts) < 12
                    THEN CAST(value AS DECIMAL(30,8))
                    ELSE CAST(0 AS DECIMAL(30,8)) END) AS am,
           sum(CASE WHEN extract(hour FROM ts) >= 12
                    THEN CAST(value AS DECIMAL(30,8))
                    ELSE CAST(0 AS DECIMAL(30,8)) END) AS pm
    FROM events GROUP BY 1
),
counts AS (
    SELECT sum(CASE WHEN pm > am THEN 1 ELSE 0 END)::BIGINT AS pos,
           sum(CASE WHEN pm < am THEN 1 ELSE 0 END)::BIGINT AS neg
    FROM halves
),
params AS (
    SELECT pos, neg, pos + neg AS n, least(pos, neg) AS m FROM counts
),
binom(k, c, s) AS (
    SELECT 0::BIGINT, 1.0::DOUBLE, 1.0::DOUBLE
    UNION ALL
    SELECT k + 1, c * (p.n - k) / (k + 1), s + c * (p.n - k) / (k + 1)
    FROM binom, params p WHERE k < p.m
),
tail AS (
    SELECT s FROM binom, params p WHERE k = p.m
)
SELECT p.pos AS n_positive, p.neg AS n_negative, p.n AS n_pairs,
       round(least(1.0, 2.0 * tail.s
                        / ((1::BIGINT << CAST(p.n AS INT))::DOUBLE))
             * 100000000) / 100000000 + 0.0 AS p_two_sided,
       least(1.0, 2.0 * tail.s
                  / ((1::BIGINT << CAST(p.n AS INT))::DOUBLE)) < 0.05
           AS reject_no_shift
FROM params p, tail
"""


@register("sign_test_halfday", oracle=_SIGN_ORACLE)
def sign_test_halfday(spark: SparkSession, sf_dir: str) -> DataFrame:
    counts = _halfday_pairs(spark, sf_dir).agg(
        F.sum(F.when(F.col("pm") > F.col("am"), 1).otherwise(0))
        .cast("long")
        .alias("pos"),
        F.sum(F.when(F.col("pm") < F.col("am"), 1).otherwise(0))
        .cast("long")
        .alias("neg"),
    )
    p = counts.select(
        "pos",
        "neg",
        (F.col("pos") + F.col("neg")).alias("n"),
        F.least("pos", "neg").alias("m"),
    )
    # cumulative binomial tail via the exact integer-in-double fold;
    # k = 0 handled outside the fold (sequence(1, 0) would descend —
    # the m >= 1 CASE is the gotcha-10 guard)
    tail = F.expr(
        "1.0 + CASE WHEN m >= 1 THEN aggregate(sequence(1, cast(m as int)),"
        " named_struct('c', 1.0D, 's', 0.0D),"
        " (acc, k) -> named_struct("
        "   'c', acc.c * (n - k + 1) / k,"
        "   's', acc.s + acc.c * (n - k + 1) / k),"
        " acc -> acc.s) ELSE 0.0D END"
    )
    pv = F.least(
        F.lit(1.0),
        F.lit(2.0)
        * tail
        / F.expr("cast(shiftleft(1L, cast(n as int)) as double)"),
    )
    return p.select(
        F.col("pos").alias("n_positive"),
        F.col("neg").alias("n_negative"),
        F.col("n").alias("n_pairs"),
        R.r(pv, 8).alias("p_two_sided"),
        (pv < 0.05).alias("reject_no_shift"),
    )


# --- Cronbach's alpha over the five event types as "items" ------------------
# Internal-consistency reliability of the daily event-type panel:
# alpha = k/(k−1)·(1 − Σ item variances / variance of day totals).
# Variances from integer 1e-4-unit squared deviations of the exact
# DECIMAL (day, type) sums — both engines sum identical int64 terms.

_CRONBACH_ORACLE = f"""
WITH cell AS (
    SELECT ts::DATE AS day, event_type,
           sum(CAST(value AS DECIMAL(30,8))) AS x
    FROM events GROUP BY 1, 2
),
im AS (
    SELECT event_type, count(*)::BIGINT AS n,
           (sum(x)::DOUBLE) / count(*) AS mu
    FROM cell GROUP BY 1
),
iv AS (
    SELECT im.event_type,
           sum(CAST(round((x::DOUBLE - mu) * (x::DOUBLE - mu) * 10000)
                    AS BIGINT)) AS sq_u,
           min(im.n) AS n
    FROM cell JOIN im ON im.event_type = cell.event_type
    GROUP BY im.event_type
),
item_var AS (
    SELECT sum((sq_u::DOUBLE / 10000) / (n - 1)) AS sum_iv,
           min(n)::BIGINT AS n_days
    FROM iv
),
totals AS (
    SELECT day, sum(x) AS t FROM cell GROUP BY 1
),
tm AS (SELECT count(*)::BIGINT AS n, (sum(t)::DOUBLE) / count(*) AS mu
       FROM totals),
tv AS (
    SELECT (sum(CAST(round((t::DOUBLE - mu) * (t::DOUBLE - mu) * 10000)
                     AS BIGINT))::DOUBLE / 10000) / (tm.n - 1) AS var_tot
    FROM totals, tm GROUP BY tm.n
)
SELECT {_FRIEDMAN_K} AS k_items, item_var.n_days,
       round(item_var.sum_iv * 10000) / 10000 + 0.0 AS sum_item_var,
       round(tv.var_tot * 10000) / 10000 + 0.0 AS total_var,
       round(({_FRIEDMAN_K} / ({_FRIEDMAN_K} - 1.0))
             * (1.0 - item_var.sum_iv / tv.var_tot) * 1000000) / 1000000
           + 0.0 AS alpha
FROM item_var, tv
"""


@register("cronbach_alpha_event_types", oracle=_CRONBACH_ORACLE)
def cronbach_alpha_event_types(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    cell = ev.groupBy(
        F.col("ts").cast("date").alias("day"), "event_type"
    ).agg(F.sum(F.col("value").cast("decimal(30,8)")).alias("x"))
    cell = cell.persist()
    im = cell.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (F.sum("x").cast("double") / F.count(F.lit(1))).alias("mu"),
    )
    iv = (
        cell.join(F.broadcast(im), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(
                F.round(
                    (F.col("x").cast("double") - F.col("mu"))
                    * (F.col("x").cast("double") - F.col("mu"))
                    * F.lit(10000)
                ).cast("long")
            ).alias("sq_u"),
            F.min("n").alias("n"),
        )
    )
    item_var = iv.agg(
        F.sum(
            (F.col("sq_u").cast("double") / F.lit(10000)) / (F.col("n") - 1)
        ).alias("sum_iv"),
        F.min("n").cast("long").alias("n_days"),
    )
    totals = cell.groupBy("day").agg(F.sum("x").alias("t"))
    tm = totals.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (F.sum("t").cast("double") / F.count(F.lit(1))).alias("mu"),
    )
    tv = (
        totals.crossJoin(F.broadcast(tm))
        .groupBy("n")
        .agg(
            (
                (
                    F.sum(
                        F.round(
                            (F.col("t").cast("double") - F.col("mu"))
                            * (F.col("t").cast("double") - F.col("mu"))
                            * F.lit(10000)
                        ).cast("long")
                    ).cast("double")
                    / F.lit(10000)
                )
                / (F.col("n") - 1)
            ).alias("var_tot")
        )
    )
    k = float(_FRIEDMAN_K)
    return (
        item_var.crossJoin(F.broadcast(tv))
        .select(
            F.lit(_FRIEDMAN_K).cast("int").alias("k_items"),
            "n_days",
            R.r(F.col("sum_iv"), 4).alias("sum_item_var"),
            R.r(F.col("var_tot"), 4).alias("total_var"),
            R.r(
                F.lit(k / (k - 1.0))
                * (F.lit(1.0) - F.col("sum_iv") / F.col("var_tot")),
                6,
            ).alias("alpha"),
        )
    )


# --- Jonckheere-Terpstra ordered trend: quantity by order priority ----------
# "Does line quantity trend with order priority?" — the ordered-
# alternative k-sample test. The 600k (priority, quantity) rows reduce
# to a 5×50 count grid in ONE shuffle; U statistics come from exact
# integer cumulative counts on that grid (ties counted half, doubled
# into integer units: JT2 = 2·JT). The normal z uses the no-tie
# variance (documented proxy — quantity is heavily discrete); both
# engines compute it from the same exact integers.

_JT_ORACLE = """
WITH g AS (
    SELECT CAST(substr(o.o_orderpriority, 1, 1) AS BIGINT) AS p,
           CAST(l.l_quantity AS BIGINT) AS q, count(*)::BIGINT AS c
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY 1, 2
),
cum AS (
    SELECT p, q, c,
           coalesce(sum(c) OVER (PARTITION BY p ORDER BY q
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING), 0) AS below
    FROM g
),
u AS (
    SELECT sum(j.c * (2 * i.below + i.c))::BIGINT AS jt2
    FROM cum i JOIN cum j ON j.q = i.q AND j.p > i.p
),
n AS (
    SELECT p, sum(c)::BIGINT AS np FROM g GROUP BY 1
),
mv AS (
    SELECT sum(np)::BIGINT AS nn, sum(np * np)::BIGINT AS sq,
           sum(np * np * (2 * np + 3))::BIGINT AS cube_term
    FROM n
)
SELECT u.jt2, (mv.nn * mv.nn - mv.sq) // 2 AS mean2,
       round((u.jt2 - (mv.nn * mv.nn - mv.sq) // 2)
             / (2.0 * sqrt((mv.nn * mv.nn * (2 * mv.nn + 3)
                            - mv.cube_term) / 72.0))
             * 1000000) / 1000000 + 0.0 AS z,
       (u.jt2 - (mv.nn * mv.nn - mv.sq) // 2)
       / (2.0 * sqrt((mv.nn * mv.nn * (2 * mv.nn + 3)
                      - mv.cube_term) / 72.0)) > 1.645
           AS increasing_trend
FROM u, mv
"""


@register("jonckheere_terpstra_priority_qty", oracle=_JT_ORACLE)
def jonckheere_terpstra_priority_qty(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_quantity").cast("long").alias("q")
    )
    od = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.substring("o_orderpriority", 1, 1).cast("long").alias("p"),
    )
    g = li.join(od, "l_orderkey").groupBy("p", "q").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    w = (
        Window.partitionBy("p")
        .orderBy("q")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = g.select(
        "p", "q", "c", F.coalesce(F.sum("c").over(w), F.lit(0)).alias("below")
    )
    i = cum.select(
        F.col("p").alias("pi"), "q",
        F.col("c").alias("ci"), F.col("below").alias("bi"),
    )
    j = cum.select(
        F.col("p").alias("pj"), "q", F.col("c").alias("cj")
    )
    u = (
        i.join(F.broadcast(j), "q")
        .filter(F.col("pj") > F.col("pi"))
        .agg(
            F.sum(F.col("cj") * (2 * F.col("bi") + F.col("ci")))
            .cast("long")
            .alias("jt2")
        )
    )
    n = g.groupBy("p").agg(F.sum("c").cast("long").alias("np"))
    mv = n.agg(
        F.sum("np").cast("long").alias("nn"),
        F.sum(F.col("np") * F.col("np")).cast("long").alias("sq"),
        F.sum(F.col("np") * F.col("np") * (2 * F.col("np") + 3))
        .cast("long")
        .alias("cube_term"),
    )
    mean2 = (F.col("nn") * F.col("nn") - F.col("sq")) / F.lit(2)
    sd2 = F.lit(2.0) * F.sqrt(
        (
            F.col("nn") * F.col("nn") * (2 * F.col("nn") + 3)
            - F.col("cube_term")
        )
        / F.lit(72.0)
    )
    zc = (F.col("jt2") - mean2) / sd2
    return u.crossJoin(F.broadcast(mv)).select(
        "jt2",
        mean2.cast("long").alias("mean2"),
        R.r(zc, 6).alias("z"),
        (zc > 1.645).alias("increasing_trend"),
    )


# --- Hodges-Lehmann location estimate of the daily value --------------------
# Median of the 465 Walsh averages (x_i + x_j)/2, i <= j — the robust
# location estimator paired with the Wilcoxon test. Pair sums stay
# exact DECIMALs; the median is defined explicitly by row_number over
# (sum, day_i, day_j) so both engines pick identical middle rows.

_HL_ORACLE = """
WITH daily AS (
    SELECT ts::DATE AS day, sum(CAST(value AS DECIMAL(30,8))) AS x
    FROM events GROUP BY 1
),
pairs AS (
    SELECT a.day AS da, b.day AS db, a.x + b.x AS ws
    FROM daily a JOIN daily b ON b.day >= a.day
),
rk AS (
    SELECT ws, row_number() OVER (ORDER BY ws, da, db) AS rn,
           count(*) OVER () AS c
    FROM pairs
)
SELECT (SELECT count(*) FROM daily)::BIGINT AS n_days,
       min(c)::BIGINT AS n_pairs,
       round((sum(CASE WHEN rn = (c + 1) // 2 THEN ws ELSE 0 END)
              + sum(CASE WHEN rn = c // 2 + 1 THEN ws ELSE 0 END))::DOUBLE
             / 4 * 10000) / 10000 + 0.0 AS hl_estimate
FROM rk
"""


@register("hodges_lehmann_daily", oracle=_HL_ORACLE)
def hodges_lehmann_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_value(spark, sf_dir)
    a = daily.select(F.col("day").alias("da"), F.col("x").alias("xa"))
    b = daily.select(F.col("day").alias("db"), F.col("x").alias("xb"))
    pairs = a.join(F.broadcast(b), F.col("db") >= F.col("da")).select(
        "da", "db", (F.col("xa") + F.col("xb")).alias("ws")
    )
    rk = pairs.select(
        "ws",
        F.row_number().over(Window.orderBy("ws", "da", "db")).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("c"),
    )
    nd = daily.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    agg = rk.agg(
        F.min("c").cast("long").alias("n_pairs"),
        R.r(
            (
                F.sum(
                    F.when(
                        F.col("rn") == F.expr("(c + 1) div 2"), F.col("ws")
                    ).otherwise(F.lit(0).cast("decimal(31,8)"))
                )
                + F.sum(
                    F.when(
                        F.col("rn") == F.expr("c div 2 + 1"), F.col("ws")
                    ).otherwise(F.lit(0).cast("decimal(31,8)"))
                )
            ).cast("double")
            / F.lit(4),
            4,
        ).alias("hl_estimate"),
    )
    return nd.crossJoin(F.broadcast(agg)).select(
        "n_days", "n_pairs", "hl_estimate"
    )


# --- Difference-in-differences on the event value ---------------------------
# Treatment = odd user_id, post-period = day-of-month > 15: the 2×2
# panel DiD with means from exact DECIMAL sums / exact counts; the
# four cell means are snapped to 6dp in both engines BEFORE the
# double difference, so the estimate is arithmetic on identical
# doubles.

_DID_ORACLE = """
WITH cells AS (
    SELECT (user_id % 2 = 1) AS treat,
           (extract(day FROM ts) > 15) AS post,
           (sum(CAST(value AS DECIMAL(30,8)))::DOUBLE) / count(*) AS mu
    FROM events GROUP BY 1, 2
),
m AS (
    SELECT
      round(max(CASE WHEN treat AND NOT post THEN mu END) * 1000000)
          / 1000000 + 0.0 AS m_treat_pre,
      round(max(CASE WHEN treat AND post THEN mu END) * 1000000)
          / 1000000 + 0.0 AS m_treat_post,
      round(max(CASE WHEN NOT treat AND NOT post THEN mu END) * 1000000)
          / 1000000 + 0.0 AS m_ctrl_pre,
      round(max(CASE WHEN NOT treat AND post THEN mu END) * 1000000)
          / 1000000 + 0.0 AS m_ctrl_post
    FROM cells
)
SELECT m_treat_pre, m_treat_post, m_ctrl_pre, m_ctrl_post,
       round(((m_treat_post - m_treat_pre) - (m_ctrl_post - m_ctrl_pre))
             * 1000000) / 1000000 + 0.0 AS did
FROM m
"""


@register("diff_in_diff_value", oracle=_DID_ORACLE)
def diff_in_diff_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        (F.col("user_id") % 2 == 1).alias("treat"),
        (F.dayofmonth("ts") > 15).alias("post"),
    ).agg(
        (
            F.sum(F.col("value").cast("decimal(30,8)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mu")
    )

    def cell(t, p):
        return R.r(
            F.max(
                F.when((F.col("treat") == t) & (F.col("post") == p),
                       F.col("mu"))
            ),
            6,
        )

    m = cells.agg(
        cell(True, False).alias("m_treat_pre"),
        cell(True, True).alias("m_treat_post"),
        cell(False, False).alias("m_ctrl_pre"),
        cell(False, True).alias("m_ctrl_post"),
    )
    return m.select(
        "m_treat_pre",
        "m_treat_post",
        "m_ctrl_pre",
        "m_ctrl_post",
        R.r(
            (F.col("m_treat_post") - F.col("m_treat_pre"))
            - (F.col("m_ctrl_post") - F.col("m_ctrl_pre")),
            6,
        ).alias("did"),
    )


# --- Instrumental-variable Wald estimator ------------------------------------
# Instrument z = (user_id % 3 = 0), "exposure" x = purchase event,
# outcome y = value: LATE = (E[y|z1]−E[y|z0]) / (E[x|z1]−E[x|z0]).
# Means from exact DECIMAL sums and integer counts — identical doubles
# in both engines; one final snap.

_IV_ORACLE = """
WITH arms AS (
    SELECT (user_id % 3 = 0) AS z,
           count(*)::BIGINT AS n,
           (sum(CAST(value AS DECIMAL(30,8)))::DOUBLE) / count(*) AS mu_y,
           (sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            ::DOUBLE) / count(*) AS mu_x
    FROM events GROUP BY 1
),
w AS (
    SELECT max(CASE WHEN z THEN n END)::BIGINT AS n_encouraged,
           max(CASE WHEN NOT z THEN n END)::BIGINT AS n_control,
           max(CASE WHEN z THEN mu_y END)
               - max(CASE WHEN NOT z THEN mu_y END) AS itt_y,
           max(CASE WHEN z THEN mu_x END)
               - max(CASE WHEN NOT z THEN mu_x END) AS itt_x
    FROM arms
)
SELECT n_encouraged, n_control,
       round(itt_y * 100000000) / 100000000 + 0.0 AS itt_y,
       round(itt_x * 100000000) / 100000000 + 0.0 AS itt_x,
       round(itt_y / itt_x * 1000000) / 1000000 + 0.0 AS late_wald
FROM w
"""


@register("iv_wald_estimator", oracle=_IV_ORACLE)
def iv_wald_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    arms = ev.groupBy((F.col("user_id") % 3 == 0).alias("z")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (
            F.sum(F.col("value").cast("decimal(30,8)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mu_y"),
        (
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).cast("double")
            / F.count(F.lit(1))
        ).alias("mu_x"),
    )
    w = arms.agg(
        F.max(F.when(F.col("z"), F.col("n"))).cast("long")
        .alias("n_encouraged"),
        F.max(F.when(~F.col("z"), F.col("n"))).cast("long")
        .alias("n_control"),
        (
            F.max(F.when(F.col("z"), F.col("mu_y")))
            - F.max(F.when(~F.col("z"), F.col("mu_y")))
        ).alias("itt_y_raw"),
        (
            F.max(F.when(F.col("z"), F.col("mu_x")))
            - F.max(F.when(~F.col("z"), F.col("mu_x")))
        ).alias("itt_x_raw"),
    )
    return w.select(
        "n_encouraged",
        "n_control",
        R.r(F.col("itt_y_raw"), 8).alias("itt_y"),
        R.r(F.col("itt_x_raw"), 8).alias("itt_x"),
        R.r(F.col("itt_y_raw") / F.col("itt_x_raw"), 6).alias("late_wald"),
    )


# --- MASE evaluation of the seasonal-naive forecast --------------------------
# Forecast day t with the same-weekday value (t−7); scale errors by
# the in-sample one-step naive MAE (Hyndman's MASE). All differences
# are exact DECIMAL subtractions on the 30-row daily table; one final
# ratio.

_MASE_ORACLE = """
WITH daily AS (
    SELECT ts::DATE AS day, sum(CAST(value AS DECIMAL(30,8))) AS x
    FROM events GROUP BY 1
),
lags AS (
    SELECT day, x,
           lag(x, 7) OVER (ORDER BY day) AS x7,
           lag(x, 1) OVER (ORDER BY day) AS x1
    FROM daily
),
e AS (
    SELECT count(CASE WHEN x7 IS NOT NULL THEN 1 END)::BIGINT AS n_eval,
           (sum(abs(x - x7))::DOUBLE)
               / count(CASE WHEN x7 IS NOT NULL THEN 1 END) AS mae7,
           (sum(abs(x - x1))::DOUBLE)
               / count(CASE WHEN x1 IS NOT NULL THEN 1 END) AS mae1
    FROM lags
)
SELECT n_eval,
       round(mae7 * 10000) / 10000 + 0.0 AS mae_seasonal,
       round(mae1 * 10000) / 10000 + 0.0 AS mae_naive,
       round(mae7 / mae1 * 1000000) / 1000000 + 0.0 AS mase
FROM e
"""


@register("mase_seasonal_naive_eval", oracle=_MASE_ORACLE)
def mase_seasonal_naive_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_value(spark, sf_dir)
    w = Window.orderBy("day")
    lags = daily.select(
        "x",
        F.lag("x", 7).over(w).alias("x7"),
        F.lag("x", 1).over(w).alias("x1"),
    )
    e = lags.agg(
        F.count(F.when(F.col("x7").isNotNull(), 1)).cast("long")
        .alias("n_eval"),
        (
            F.sum(F.abs(F.col("x") - F.col("x7"))).cast("double")
            / F.count(F.when(F.col("x7").isNotNull(), 1))
        ).alias("mae7"),
        (
            F.sum(F.abs(F.col("x") - F.col("x1"))).cast("double")
            / F.count(F.when(F.col("x1").isNotNull(), 1))
        ).alias("mae1"),
    )
    return e.select(
        "n_eval",
        R.r(F.col("mae7"), 4).alias("mae_seasonal"),
        R.r(F.col("mae1"), 4).alias("mae_naive"),
        R.r(F.col("mae7") / F.col("mae1"), 6).alias("mase"),
    )


# --- Bartlett's test: length variance homogeneity across languages ----------
# Group variances from EXACT integer length moments (Σx, Σx² in
# DECIMAL(38,0)); each ln() output is snapped to 8dp before weighting
# so a last-ulp libm divergence cannot propagate (module docstring).

_BARTLETT_ORACLE = f"""
WITH g AS (
    SELECT lang, count(*)::BIGINT AS n,
           sum(CAST(n_chars AS DECIMAL(38,0))) AS sx,
           sum(CAST(n_chars AS DECIMAL(38,0))
               * CAST(n_chars AS DECIMAL(38,0))) AS sxx
    FROM documents GROUP BY 1
),
v AS (
    SELECT lang, n,
           (sxx::DOUBLE - (sx::DOUBLE) * (sx::DOUBLE) / n) / (n - 1) AS s2
    FROM g
),
t AS (
    SELECT sum(n)::BIGINT AS nn, count(*)::BIGINT AS k,
           sum((n - 1) * s2) AS pooled_num,
           sum((n - 1) * (round(ln(s2) * 100000000) / 100000000))
               AS sum_wlns,
           sum(1.0 / (n - 1)) AS sum_inv
    FROM v
),
b AS (
    SELECT nn, k,
           ((nn - k) * (round(ln(pooled_num / (nn - k)) * 100000000)
                        / 100000000) - sum_wlns)
           / (1.0 + (sum_inv - 1.0 / (nn - k)) / (3.0 * (k - 1)))
               AS t_stat
    FROM t
)
SELECT k AS k_groups, nn AS n_total,
       round(t_stat * 10000) / 10000 + 0.0 AS t_stat,
       t_stat > {_CHI2_CRIT_DF4} AS reject_equal_variance
FROM b
"""


@register("bartlett_variance_lang", oracle=_BARTLETT_ORACLE)
def bartlett_variance_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select("lang", "n_chars")
    d38 = "decimal(38,0)"
    g = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("n_chars").cast(d38)).alias("sx"),
        F.sum(
            F.col("n_chars").cast(d38) * F.col("n_chars").cast(d38)
        ).alias("sxx"),
    )
    v = g.select(
        "n",
        (
            (
                F.col("sxx").cast("double")
                - F.col("sx").cast("double")
                * F.col("sx").cast("double")
                / F.col("n")
            )
            / (F.col("n") - 1)
        ).alias("s2"),
    )
    ln8 = R.r(F.log(F.col("s2")), 8)
    t = v.agg(
        F.sum("n").cast("long").alias("nn"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum((F.col("n") - 1) * F.col("s2")).alias("pooled_num"),
        F.sum((F.col("n") - 1) * ln8).alias("sum_wlns"),
        F.sum(F.lit(1.0) / (F.col("n") - 1)).alias("sum_inv"),
    )
    tstat = (
        (F.col("nn") - F.col("k"))
        * R.r(F.log(F.col("pooled_num") / (F.col("nn") - F.col("k"))), 8)
        - F.col("sum_wlns")
    ) / (
        F.lit(1.0)
        + (F.col("sum_inv") - F.lit(1.0) / (F.col("nn") - F.col("k")))
        / (F.lit(3.0) * (F.col("k") - 1))
    )
    return t.select(
        F.col("k").alias("k_groups"),
        F.col("nn").alias("n_total"),
        R.r(tstat, 4).alias("t_stat"),
        (tstat > _CHI2_CRIT_DF4).alias("reject_equal_variance"),
    )


# --- t-closeness release audit ------------------------------------------------
# The distributional sibling of the registered k-anonymity/l-diversity
# audit (Li et al. 2007): per quasi-identifier group (source,
# 100-char length bucket), the variational distance between the
# group's sensitive-attribute (lang) distribution and the global one:
# t_g = ½·Σ_l |n_gl/n_g − N_l/N|. The t > 0.3 threshold is decided in
# EXACT integers (5·Σ|n_gl·N − N_l·n_g| > 3·n_g·N); zero-count langs
# participate via the full group × lang-domain grid.

_TCLOSE_T10 = 3  # threshold 0.3 as the exact rational 3/10


_TCLOSE_ORACLE = f"""
WITH q AS (
    SELECT source, (length(text) // 100)::BIGINT AS len_bucket, lang,
           count(*)::BIGINT AS n_gl
    FROM documents GROUP BY 1, 2, 3
),
grp AS (
    SELECT source, len_bucket, sum(n_gl)::BIGINT AS n_g
    FROM q GROUP BY 1, 2
),
gtot AS (SELECT lang, sum(n_gl)::BIGINT AS n_l FROM q GROUP BY 1),
tot AS (SELECT sum(n_l)::BIGINT AS n FROM gtot),
grid AS (
    SELECT g.source, g.len_bucket, g.n_g, gl.lang, gl.n_l,
           coalesce(q.n_gl, 0)::BIGINT AS n_gl
    FROM grp g CROSS JOIN gtot gl
    LEFT JOIN q ON q.source = g.source AND q.len_bucket = g.len_bucket
               AND q.lang = gl.lang
),
per_group AS (
    SELECT source, len_bucket, min(n_g)::BIGINT AS n_g,
           sum(abs(n_gl * tot.n - n_l * n_g))::BIGINT AS num
    FROM grid, tot GROUP BY source, len_bucket
),
flagged AS (
    SELECT n_g, num,
           num * 1.0 / (2.0 * n_g * tot.n) AS t,
           (5 * num > {_TCLOSE_T10} * n_g * tot.n) AS above
    FROM per_group, tot
)
SELECT count(*)::BIGINT AS n_groups, sum(n_g)::BIGINT AS n_rows,
       round(max(t) * 10000) / 10000 + 0.0 AS max_t,
       sum(CASE WHEN above THEN 1 ELSE 0 END)::BIGINT AS n_groups_above_t,
       sum(CASE WHEN above THEN n_g ELSE 0 END)::BIGINT AS n_rows_above_t,
       round(sum(CASE WHEN above THEN n_g ELSE 0 END) * 10000.0 / sum(n_g))
           / 10000 + 0.0 AS share_above_t
FROM flagged
"""


@register("t_closeness_audit", oracle=_TCLOSE_ORACLE)
def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    q = docs.groupBy(
        "source",
        F.expr("length(text) div 100").cast("long").alias("len_bucket"),
        "lang",
    ).agg(F.count(F.lit(1)).cast("long").alias("n_gl"))
    q = q.persist()
    grp = q.groupBy("source", "len_bucket").agg(
        F.sum("n_gl").cast("long").alias("n_g")
    )
    glob = q.groupBy("lang").agg(F.sum("n_gl").cast("long").alias("n_l"))
    tot = glob.agg(F.sum("n_l").cast("long").alias("n"))
    grid = (
        grp.crossJoin(F.broadcast(glob))
        .join(q, ["source", "len_bucket", "lang"], "left")
        .select(
            "source",
            "len_bucket",
            "n_g",
            "n_l",
            F.coalesce(F.col("n_gl"), F.lit(0)).cast("long").alias("n_gl"),
        )
    )
    per_group = (
        grid.crossJoin(F.broadcast(tot))
        .groupBy("source", "len_bucket")
        .agg(
            F.min("n_g").cast("long").alias("n_g"),
            F.sum(
                F.abs(F.col("n_gl") * F.col("n") - F.col("n_l") * F.col("n_g"))
            ).cast("long").alias("num"),
            F.min("n").cast("long").alias("n"),
        )
    )
    t = F.col("num") * F.lit(1.0) / (F.lit(2.0) * F.col("n_g") * F.col("n"))
    # t > 0.3 decided in exact integers: 5·num > 3·n_g·N
    above = 5 * F.col("num") > F.lit(_TCLOSE_T10) * F.col("n_g") * F.col("n")
    flagged = per_group.select(
        "n_g", t.alias("t"), above.alias("above")
    )
    return flagged.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum("n_g").cast("long").alias("n_rows"),
        R.r(F.max("t"), 4).alias("max_t"),
        F.sum(F.when(F.col("above"), 1).otherwise(0)).cast("long")
        .alias("n_groups_above_t"),
        F.sum(F.when(F.col("above"), F.col("n_g")).otherwise(0))
        .cast("long")
        .alias("n_rows_above_t"),
        R.r(
            F.sum(F.when(F.col("above"), F.col("n_g")).otherwise(0))
            * F.lit(1.0)
            / F.sum("n_g"),
            4,
        ).alias("share_above_t"),
    )


# --- PACF via Durbin-Levinson (lags 1..5) ------------------------------------
# Partial autocorrelations of the daily value series — the AR-order
# diagnostic next to the registered ACF/Ljung-Box. The autocovariance
# units are the exact int64 1e-8 sums of the acf family; r_k and every
# Durbin-Levinson intermediate is snapped to 8dp with the
# multiply-round-divide procedure (gotcha 13a) IN BOTH ENGINES, so the
# recursion — replayed UNROLLED in the oracle's CTE chain, in the
# driver in Python (bounded state: six longs) — sees bit-identical
# doubles at every step.

_PACF_MAX_LAG = 5


def _pacf_oracle() -> str:
    head = """
WITH daily AS (
    SELECT ts::DATE AS day, sum(CAST(value AS DECIMAL(30,8))) AS x
    FROM events GROUP BY 1
),
arr AS (
    SELECT list(x::DOUBLE ORDER BY day) AS xs, count(*)::BIGINT AS n,
           (sum(x)::DOUBLE) / count(*) AS mu
    FROM daily
),
cu AS (
    SELECT n,
           (SELECT sum(CAST(round((xs[i] - mu) * (xs[i] - mu) * 100000000)
                            AS BIGINT))
            FROM unnest(generate_series(1, CAST(n AS INT))) AS g(i)
           )::BIGINT AS c0_u,
"""
    lag_cols = ",\n".join(
        f"""           (SELECT sum(CAST(round((xs[i] - mu) * (xs[i + {k}] - mu)
                            * 100000000) AS BIGINT))
            FROM unnest(generate_series(1, CAST(n - {k} AS INT))) AS g(i)
           )::BIGINT AS c{k}_u"""
        for k in range(1, _PACF_MAX_LAG + 1)
    )
    rs = ",\n".join(
        f"           round(c{k}_u * 1.0 / c0_u * 100000000) / 100000000"
        f" AS r{k}"
        for k in range(1, _PACF_MAX_LAG + 1)
    )
    # unrolled Durbin-Levinson, snapping each phi at 8dp (mirrors the
    # Python recursion term-for-term and in the same + association)
    body = f"""
    FROM arr
),
r AS (
    SELECT
{rs}
    FROM cu
),
d1 AS (SELECT r.*, r1 AS p11 FROM r),
d2 AS (
    SELECT d1.*,
           round((r2 - p11 * r1) / (1 - p11 * r1) * 100000000)
               / 100000000 AS p22
    FROM d1
),
d2b AS (SELECT d2.*, round((p11 - p22 * p11) * 100000000) / 100000000
               AS p21 FROM d2),
d3 AS (
    SELECT d2b.*,
           round((r3 - (p21 * r2 + p22 * r1))
                 / (1 - (p21 * r1 + p22 * r2)) * 100000000) / 100000000
               AS p33
    FROM d2b
),
d3b AS (
    SELECT d3.*,
           round((p21 - p33 * p22) * 100000000) / 100000000 AS p31,
           round((p22 - p33 * p21) * 100000000) / 100000000 AS p32
    FROM d3
),
d4 AS (
    SELECT d3b.*,
           round((r4 - (p31 * r3 + p32 * r2 + p33 * r1))
                 / (1 - (p31 * r1 + p32 * r2 + p33 * r3)) * 100000000)
               / 100000000 AS p44
    FROM d3b
),
d4b AS (
    SELECT d4.*,
           round((p31 - p44 * p33) * 100000000) / 100000000 AS p41,
           round((p32 - p44 * p32) * 100000000) / 100000000 AS p42,
           round((p33 - p44 * p31) * 100000000) / 100000000 AS p43
    FROM d4
),
d5 AS (
    SELECT d4b.*,
           round((r5 - (p41 * r4 + p42 * r3 + p43 * r2 + p44 * r1))
                 / (1 - (p41 * r1 + p42 * r2 + p43 * r3 + p44 * r4))
                 * 100000000) / 100000000 AS p55
    FROM d4b
)
SELECT * FROM (
    SELECT 1::BIGINT AS lag, round(p11 * 1000000) / 1000000 + 0.0 AS pacf
    FROM d5
    UNION ALL SELECT 2, round(p22 * 1000000) / 1000000 + 0.0 FROM d5
    UNION ALL SELECT 3, round(p33 * 1000000) / 1000000 + 0.0 FROM d5
    UNION ALL SELECT 4, round(p44 * 1000000) / 1000000 + 0.0 FROM d5
    UNION ALL SELECT 5, round(p55 * 1000000) / 1000000 + 0.0 FROM d5
)
"""
    return head + lag_cols + body


@register("pacf_durbin_levinson", oracle=_pacf_oracle())
def pacf_durbin_levinson(spark: SparkSession, sf_dir: str) -> DataFrame:
    from swat_mapreduce_spark.queries.curation import _rp

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
    # the n > max-lag filter BEFORE the index expressions is the
    # gotcha-10 guard: every 1..n-k bound below stays >= 1
    mf = m.filter(F.col("n") > _PACF_MAX_LAG)

    def cov_u(k: int):
        # the acf-family unit sum; k=0 covers the full array
        if k == 0:
            idx = F.expr("sequence(1, cast(n as int))")
        else:
            idx = F.expr(f"sequence(1, cast(n - {k} as int))")
        return F.aggregate(
            F.transform(
                idx,
                lambda i: F.round(
                    (F.element_at(F.col("xs"), i) - F.col("mu"))
                    * (
                        F.element_at(
                            F.col("xs"), (i + F.lit(k)).cast("int")
                        )
                        - F.col("mu")
                    )
                    * F.lit(1e8)
                ).cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, t: acc + t,
        )

    collected = (
        mf
        .select(
            cov_u(0).alias("c0"),
            *[cov_u(k).alias(f"c{k}") for k in range(1, _PACF_MAX_LAG + 1)],
        )
        .collect()
    )
    if not collected:
        # series shorter than the max lag: the mf filter emptied the
        # frame — return the oracle's no-rows result instead of
        # IndexError-ing (ADVICE r10; cannot fire on current testdata)
        return spark.createDataFrame([], "lag long, pacf double")
    row = collected[0]
    c0 = row["c0"]
    r = {
        k: _rp(row[f"c{k}"] * 1.0 / c0, 8)
        for k in range(1, _PACF_MAX_LAG + 1)
    }
    p = {(1, 1): r[1]}
    for k in range(2, _PACF_MAX_LAG + 1):
        num = r[k] - sum(p[(k - 1, j)] * r[k - j] for j in range(1, k))
        den = 1 - sum(p[(k - 1, j)] * r[j] for j in range(1, k))
        p[(k, k)] = _rp(num / den, 8)
        for j in range(1, k):
            p[(k, j)] = _rp(
                p[(k - 1, j)] - p[(k, k)] * p[(k - 1, k - j)], 8
            )
    rows = [
        (k, _rp(p[(k, k)], 6) + 0.0) for k in range(1, _PACF_MAX_LAG + 1)
    ]
    return spark.createDataFrame(rows, "lag long, pacf double")


# --- Cliff's delta: document length, en vs non-en -----------------------------
# The nonparametric effect size companion to the registered rank-sum
# AUC: δ = (#{a>b} − #{a<b}) / (n_a·n_b), computed from the bounded
# length-domain grid (cumulative counts — no pair enumeration).
# Magnitude banding (Romano et al. thresholds) is decided in EXACT
# integers via cross-multiplication.

_CLIFF_ORACLE = """
WITH g AS (
    SELECT n_chars AS v,
           sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS ca,
           sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END)::BIGINT AS cb
    FROM documents GROUP BY 1
),
cum AS (
    SELECT v, ca, cb,
           coalesce(sum(cb) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               ::BIGINT AS b_below,
           coalesce(sum(cb) OVER (ORDER BY v
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0)
               ::BIGINT AS b_above
    FROM g
),
s AS (
    SELECT sum(ca)::BIGINT AS na, sum(cb)::BIGINT AS nb,
           sum(ca * (b_below - b_above))::BIGINT AS num
    FROM cum
)
SELECT na AS n_en, nb AS n_other,
       round(num * 1.0 / (na * nb) * 1000000) / 1000000 + 0.0
           AS cliffs_delta,
       CASE WHEN 1000 * abs(num) < 147 * na * nb THEN 'negligible'
            WHEN 1000 * abs(num) < 330 * na * nb THEN 'small'
            WHEN 1000 * abs(num) < 474 * na * nb THEN 'medium'
            ELSE 'large' END AS magnitude
FROM s
"""


@register("cliff_delta_lengths", oracle=_CLIFF_ORACLE)
def cliff_delta_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select("lang", "n_chars")
    g = docs.groupBy(F.col("n_chars").alias("v")).agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("long").alias("ca"),
        F.sum(F.when(F.col("lang") != "en", 1).otherwise(0))
        .cast("long").alias("cb"),
    )
    wb = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    wa = Window.orderBy("v").rowsBetween(1, Window.unboundedFollowing)
    cum = g.select(
        "ca",
        "cb",
        F.coalesce(F.sum("cb").over(wb), F.lit(0)).cast("long")
        .alias("b_below"),
        F.coalesce(F.sum("cb").over(wa), F.lit(0)).cast("long")
        .alias("b_above"),
    )
    s = cum.agg(
        F.sum("ca").cast("long").alias("na"),
        F.sum("cb").cast("long").alias("nb"),
        F.sum(F.col("ca") * (F.col("b_below") - F.col("b_above")))
        .cast("long")
        .alias("num"),
    )
    absn = F.abs(F.col("num")) * 1000
    nm = F.col("na") * F.col("nb")
    return s.select(
        F.col("na").alias("n_en"),
        F.col("nb").alias("n_other"),
        R.r(F.col("num") * F.lit(1.0) / nm, 6).alias("cliffs_delta"),
        F.when(absn < 147 * nm, "negligible")
        .when(absn < 330 * nm, "small")
        .when(absn < 474 * nm, "medium")
        .otherwise("large")
        .alias("magnitude"),
    )


# --- covariate balance audit (standardized mean differences) ------------------
# The diagnostic run after any treatment assignment (here the DiD
# arms): per covariate, SMD = (μ_t − μ_c) / sqrt((s_t² + s_c²)/2),
# |SMD| < 0.1 = balanced. Means from exact DECIMAL/integer sums;
# variances through the 1e-4-unit pattern; one corpus scan builds all
# three features' moments (feature rows unioned from one aggregate).

_SMD_ORACLE = """
WITH base AS (
    SELECT (user_id % 2 = 1) AS treat,
           CAST(value AS DECIMAL(30,8)) AS f_value,
           extract(hour FROM ts)::BIGINT AS f_hour,
           extract(day FROM ts)::BIGINT AS f_dom
    FROM events
),
arms AS (
    SELECT treat, count(*)::BIGINT AS n,
           (sum(f_value)::DOUBLE) / count(*) AS mu_value,
           (sum(f_hour)::DOUBLE) / count(*) AS mu_hour,
           (sum(f_dom)::DOUBLE) / count(*) AS mu_dom
    FROM base GROUP BY 1
),
devs AS (
    SELECT b.treat,
           sum(CAST(round((b.f_value::DOUBLE - a.mu_value)
                          * (b.f_value::DOUBLE - a.mu_value) * 10000)
                    AS BIGINT))::BIGINT AS sq_value,
           sum(CAST(round((b.f_hour - a.mu_hour)
                          * (b.f_hour - a.mu_hour) * 10000)
                    AS BIGINT))::BIGINT AS sq_hour,
           sum(CAST(round((b.f_dom - a.mu_dom)
                          * (b.f_dom - a.mu_dom) * 10000)
                    AS BIGINT))::BIGINT AS sq_dom,
           min(a.n)::BIGINT AS n
    FROM base b JOIN arms a ON a.treat = b.treat
    GROUP BY b.treat
),
m AS (
    SELECT a.treat, a.n, a.mu_value, a.mu_hour, a.mu_dom,
           (d.sq_value::DOUBLE / 10000) / (a.n - 1) AS v_value,
           (d.sq_hour::DOUBLE / 10000) / (a.n - 1) AS v_hour,
           (d.sq_dom::DOUBLE / 10000) / (a.n - 1) AS v_dom
    FROM arms a JOIN devs d ON d.treat = a.treat
),
w AS (
    SELECT f.feature,
           max(CASE WHEN treat THEN mu END)
               - max(CASE WHEN NOT treat THEN mu END) AS mu_diff,
           sqrt((max(CASE WHEN treat THEN v END)
                 + max(CASE WHEN NOT treat THEN v END)) / 2) AS sd_pool
    FROM (
        SELECT treat, 'value' AS feature, mu_value AS mu, v_value AS v
        FROM m
        UNION ALL
        SELECT treat, 'hour', mu_hour, v_hour FROM m
        UNION ALL
        SELECT treat, 'day_of_month', mu_dom, v_dom FROM m
    ) f
    GROUP BY f.feature
)
SELECT feature,
       round(mu_diff * 1000000) / 1000000 + 0.0 AS mean_diff,
       round(mu_diff / sd_pool * 1000000) / 1000000 + 0.0 AS smd,
       abs(mu_diff / sd_pool) < 0.1 AS balanced
FROM w
"""


@register("covariate_balance_smd", oracle=_SMD_ORACLE)
def covariate_balance_smd(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    base = ev.select(
        (F.col("user_id") % 2 == 1).alias("treat"),
        F.col("value").cast("decimal(30,8)").alias("f_value"),
        F.hour("ts").cast("long").alias("f_hour"),
        F.dayofmonth("ts").cast("long").alias("f_dom"),
    )
    arms = base.groupBy("treat").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (F.sum("f_value").cast("double") / F.count(F.lit(1)))
        .alias("mu_value"),
        (F.sum("f_hour").cast("double") / F.count(F.lit(1)))
        .alias("mu_hour"),
        (F.sum("f_dom").cast("double") / F.count(F.lit(1)))
        .alias("mu_dom"),
    )

    def sq(col, mu):
        d = F.col(col).cast("double") - F.col(mu)
        return F.sum(F.round(d * d * F.lit(10000)).cast("long")).cast(
            "long"
        )

    devs = base.join(F.broadcast(arms), "treat").groupBy("treat").agg(
        sq("f_value", "mu_value").alias("sq_value"),
        sq("f_hour", "mu_hour").alias("sq_hour"),
        sq("f_dom", "mu_dom").alias("sq_dom"),
        F.min("n").cast("long").alias("n"),
    )
    m = arms.join(devs.drop("n"), "treat").select(
        "treat",
        "n",
        "mu_value",
        "mu_hour",
        "mu_dom",
        ((F.col("sq_value").cast("double") / 10000) / (F.col("n") - 1))
        .alias("v_value"),
        ((F.col("sq_hour").cast("double") / 10000) / (F.col("n") - 1))
        .alias("v_hour"),
        ((F.col("sq_dom").cast("double") / 10000) / (F.col("n") - 1))
        .alias("v_dom"),
    )
    feats = None
    for name, mu_c, v_c in [
        ("value", "mu_value", "v_value"),
        ("hour", "mu_hour", "v_hour"),
        ("day_of_month", "mu_dom", "v_dom"),
    ]:
        part = m.select(
            "treat",
            F.lit(name).alias("feature"),
            F.col(mu_c).alias("mu"),
            F.col(v_c).alias("v"),
        )
        feats = part if feats is None else feats.unionAll(part)
    w = feats.groupBy("feature").agg(
        (
            F.max(F.when(F.col("treat"), F.col("mu")))
            - F.max(F.when(~F.col("treat"), F.col("mu")))
        ).alias("mu_diff"),
        F.sqrt(
            (
                F.max(F.when(F.col("treat"), F.col("v")))
                + F.max(F.when(~F.col("treat"), F.col("v")))
            )
            / 2
        ).alias("sd_pool"),
    )
    return w.select(
        "feature",
        R.r(F.col("mu_diff"), 6).alias("mean_diff"),
        R.r(F.col("mu_diff") / F.col("sd_pool"), 6).alias("smd"),
        (F.abs(F.col("mu_diff") / F.col("sd_pool")) < 0.1).alias(
            "balanced"
        ),
    )


# --- Gini decision stump on document length ----------------------------------
# The CART split primitive: the single n_chars <= t threshold that
# maximally purifies lang = 'en', chosen over the bounded length
# domain from cumulative integer counts. The split criterion
# (pl²+ql²)/nl + (pr²+qr²)/nr is computed as identical doubles from
# exact integers, snapped to 1e-9 units for a deterministic argmax
# (threshold tie-break).

_STUMP_ORACLE = """
WITH g AS (
    SELECT n_chars AS v,
           sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS p,
           count(*)::BIGINT AS n
    FROM documents GROUP BY 1
),
cum AS (
    SELECT v,
           sum(p) OVER (ORDER BY v)::BIGINT AS pl,
           sum(n) OVER (ORDER BY v)::BIGINT AS nl
    FROM g
),
tot AS (SELECT sum(p)::BIGINT AS pt, sum(n)::BIGINT AS nt FROM g),
cand AS (
    SELECT v, pl, nl, tot.pt - pl AS pr, tot.nt - nl AS nr,
           CAST(round(((pl * pl + (nl - pl) * (nl - pl)) * 1.0 / nl
                       + (tot.pt - pl) * (tot.pt - pl) * 1.0
                         / (tot.nt - nl)
                       + ((tot.nt - nl) - (tot.pt - pl))
                         * ((tot.nt - nl) - (tot.pt - pl)) * 1.0
                         / (tot.nt - nl)) * 1000000000) AS BIGINT)
               AS crit_u
    FROM cum, tot WHERE nl < tot.nt
),
best AS (
    SELECT v, pl, nl, pr, nr FROM cand
    ORDER BY crit_u DESC, v LIMIT 1
)
SELECT best.v AS threshold, best.nl AS n_left, best.nr AS n_right,
       round((1.0 - (tot.pt * 1.0 / tot.nt) * (tot.pt * 1.0 / tot.nt)
              - (1.0 - tot.pt * 1.0 / tot.nt)
                * (1.0 - tot.pt * 1.0 / tot.nt)) * 1000000) / 1000000
           + 0.0 AS gini_parent,
       round(((best.nl * 1.0 / tot.nt)
              * (1.0 - (best.pl * 1.0 / best.nl) * (best.pl * 1.0 / best.nl)
                 - (1.0 - best.pl * 1.0 / best.nl)
                   * (1.0 - best.pl * 1.0 / best.nl))
              + (best.nr * 1.0 / tot.nt)
              * (1.0 - (best.pr * 1.0 / best.nr) * (best.pr * 1.0 / best.nr)
                 - (1.0 - best.pr * 1.0 / best.nr)
                   * (1.0 - best.pr * 1.0 / best.nr))) * 1000000) / 1000000
           + 0.0 AS weighted_gini
FROM best, tot
"""


@register("gini_stump_split", oracle=_STUMP_ORACLE)
def gini_stump_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select("lang", "n_chars")
    g = docs.groupBy(F.col("n_chars").alias("v")).agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("long").alias("p"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = g.select(
        "v",
        F.sum("p").over(w).cast("long").alias("pl"),
        F.sum("n").over(w).cast("long").alias("nl"),
    )
    tot = g.agg(
        F.sum("p").cast("long").alias("pt"),
        F.sum("n").cast("long").alias("nt"),
    )
    c = cum.crossJoin(F.broadcast(tot)).filter(F.col("nl") < F.col("nt"))
    pr = F.col("pt") - F.col("pl")
    nr = F.col("nt") - F.col("nl")
    ql = F.col("nl") - F.col("pl")
    qr = nr - pr
    crit = (
        (F.col("pl") * F.col("pl") + ql * ql) * F.lit(1.0) / F.col("nl")
        + pr * pr * F.lit(1.0) / nr
        + qr * qr * F.lit(1.0) / nr
    )
    cand = c.select(
        "v",
        "pl",
        "nl",
        pr.alias("pr"),
        nr.alias("nr"),
        "pt",
        "nt",
        F.round(crit * F.lit(1000000000)).cast("long").alias("crit_u"),
    )
    best = (
        cand.orderBy(F.desc("crit_u"), F.asc("v")).limit(1)
    )
    p_t = F.col("pt") * F.lit(1.0) / F.col("nt")
    plr = F.col("pl") * F.lit(1.0) / F.col("nl")
    prr = F.col("pr") * F.lit(1.0) / F.col("nr")
    gini_parent = (
        F.lit(1.0) - p_t * p_t - (F.lit(1.0) - p_t) * (F.lit(1.0) - p_t)
    )
    wg = (F.col("nl") * F.lit(1.0) / F.col("nt")) * (
        F.lit(1.0) - plr * plr - (F.lit(1.0) - plr) * (F.lit(1.0) - plr)
    ) + (F.col("nr") * F.lit(1.0) / F.col("nt")) * (
        F.lit(1.0) - prr * prr - (F.lit(1.0) - prr) * (F.lit(1.0) - prr)
    )
    return best.select(
        F.col("v").alias("threshold"),
        F.col("nl").alias("n_left"),
        F.col("nr").alias("n_right"),
        R.r(gini_parent, 6).alias("gini_parent"),
        R.r(wg, 6).alias("weighted_gini"),
    )


# --- Holm-Bonferroni step-down over the per-source KS drift tests -------------
# The FWER-controlling sibling of the registered BH-FDR query, on the
# SAME 20 KS p-values: sort ascending, reject ranks 1..k* where k* is
# one before the first i with p_(i) > α/(m−i+1). The cutoff compare
# runs on the 8dp-snapped p-values both engines already share with
# fdr_bh_source_length_tests.

_HOLM_ALPHA = 0.05

_HOLM_ORACLE = f"""
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
m_t AS (SELECT count(*)::BIGINT AS m FROM tests),
ranked AS (
    SELECT t.*, m_t.m,
           row_number() OVER (ORDER BY t.p_value, t.source) AS holm_rank
    FROM tests t, m_t
),
kmin AS (
    SELECT coalesce(min(holm_rank), (SELECT m + 1 FROM m_t)) AS k
    FROM ranked
    WHERE p_value * (m - holm_rank + 1) > {_HOLM_ALPHA}
)
SELECT r.source, r.p_value, r.holm_rank::BIGINT AS holm_rank,
       round({_HOLM_ALPHA} / (r.m - r.holm_rank + 1) * 100000000)
           / 100000000 + 0.0 AS holm_threshold,
       r.holm_rank < kmin.k AS rejected
FROM ranked r, kmin
"""


@register("holm_bonferroni_tests", oracle=_HOLM_ORACLE)
def holm_bonferroni_tests(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select(
        "source", "n_chars"
    )
    tot = docs.agg(F.count(F.lit(1)).cast("long").alias("n_all"))
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_s")
    )
    vals = docs.select(F.col("n_chars").alias("v")).distinct()
    grid = per_src.crossJoin(F.broadcast(vals))
    cnt = docs.groupBy(
        "source", F.col("n_chars").alias("v")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    wsrc = Window.partitionBy("source").orderBy("v")
    cum = (
        grid.join(cnt, ["source", "v"], "left")
        .select(
            "source",
            "n_s",
            "v",
            F.sum(F.coalesce(F.col("c"), F.lit(0)))
            .over(wsrc)
            .cast("long")
            .alias("cum_s"),
        )
    )
    call = (
        docs.groupBy(F.col("n_chars").alias("v"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .select(
            "v",
            F.sum("c").over(Window.orderBy("v")).cast("long")
            .alias("cum_all"),
        )
    )
    gaps = (
        cum.join(F.broadcast(call), "v")
        .crossJoin(F.broadcast(tot))
        .groupBy("source", "n_s", "n_all")
        .agg(
            F.max(
                F.abs(
                    F.col("cum_s") * (F.col("n_all") - F.col("n_s"))
                    - (F.col("cum_all") - F.col("cum_s")) * F.col("n_s")
                )
            ).cast("long").alias("g")
        )
    )
    dn = F.col("g").cast("double") / (
        F.col("n_s") * (F.col("n_all") - F.col("n_s"))
    )
    pv = R.r(
        F.least(
            F.lit(1.0),
            F.lit(2.0)
            * F.exp(
                F.lit(-2.0)
                * dn
                * dn
                * (
                    F.col("n_s").cast("double")
                    * (F.col("n_all") - F.col("n_s"))
                    / F.col("n_all")
                )
            ),
        ),
        8,
    )
    tests = gaps.select("source", pv.alias("p_value"))
    m_t = tests.agg(F.count(F.lit(1)).cast("long").alias("m"))
    ranked = tests.crossJoin(F.broadcast(m_t)).select(
        "source",
        "p_value",
        "m",
        F.row_number()
        .over(Window.orderBy("p_value", "source"))
        .alias("holm_rank"),
    )
    # if NO p exceeds its step-down threshold the filter is empty and
    # min() is NULL: k must fall back to m+1 (reject everything) like
    # the oracle's scalar-subquery coalesce — m comes from the
    # broadcast m_t, never from the (possibly empty) filtered side
    kmin = (
        ranked.filter(
            F.col("p_value") * (F.col("m") - F.col("holm_rank") + 1)
            > _HOLM_ALPHA
        )
        .agg(F.min("holm_rank").alias("mink"))
        .crossJoin(F.broadcast(m_t))
        .select(
            F.coalesce(F.col("mink"), F.col("m") + 1).alias("k")
        )
    )
    return ranked.crossJoin(F.broadcast(kmin)).select(
        "source",
        "p_value",
        F.col("holm_rank").cast("long").alias("holm_rank"),
        R.r(
            F.lit(_HOLM_ALPHA) / (F.col("m") - F.col("holm_rank") + 1), 8
        ).alias("holm_threshold"),
        (F.col("holm_rank") < F.col("k")).alias("rejected"),
    )


# --- Chatterjee's xi rank correlation (daily trend dependence) ---------------
# The 2020 dependence coefficient: order the series by day, take the
# value ranks (day tie-break — no-ties variant), and
# ξ = 1 − 3·Σ|r_{i+1} − r_i| / (n² − 1). Detects ANY functional
# dependence, not just monotone (the Kendall/Spearman complement
# already registered). Exact integer ranks and sums end to end.

_XI_ORACLE = """
WITH daily AS (
    SELECT ts::DATE AS day, sum(CAST(value AS DECIMAL(30,8))) AS x
    FROM events GROUP BY 1
),
rk AS (
    SELECT day, rank() OVER (ORDER BY x, day) AS r FROM daily
),
seq AS (
    SELECT r, lead(r) OVER (ORDER BY day) AS rn FROM rk
),
s AS (
    SELECT count(*)::BIGINT AS n_minus1,
           sum(abs(rn - r))::BIGINT AS jumps
    FROM seq WHERE rn IS NOT NULL
)
SELECT n_minus1 + 1 AS n_days, jumps AS rank_jump_sum,
       round((1.0 - 3.0 * jumps / ((n_minus1 + 1) * (n_minus1 + 1) - 1))
             * 1000000) / 1000000 + 0.0 AS xi
FROM s
"""


@register("xi_correlation_chatterjee", oracle=_XI_ORACLE)
def xi_correlation_chatterjee(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_value(spark, sf_dir)
    rk = daily.select(
        "day", F.rank().over(Window.orderBy("x", "day")).alias("r")
    )
    seq = rk.select(
        "r", F.lead("r").over(Window.orderBy("day")).alias("rn")
    )
    s = seq.filter(F.col("rn").isNotNull()).agg(
        F.count(F.lit(1)).cast("long").alias("n_minus1"),
        F.sum(F.abs(F.col("rn") - F.col("r"))).cast("long").alias("jumps"),
    )
    n = F.col("n_minus1") + 1
    return s.select(
        n.alias("n_days"),
        F.col("jumps").alias("rank_jump_sum"),
        R.r(
            F.lit(1.0) - F.lit(3.0) * F.col("jumps") / (n * n - 1), 6
        ).alias("xi"),
    )


# --- Goodman-Kruskal gamma: priority × quantity ------------------------------
# Ordinal association on the same 5×50 count grid as the registered
# Jonckheere test: γ = (C − D)/(C + D) with concordant/discordant
# pair counts from cumulative grid sums — exact integers, no pair
# enumeration.

_GK_ORACLE = """
WITH g AS (
    SELECT CAST(substr(o.o_orderpriority, 1, 1) AS BIGINT) AS p,
           CAST(l.l_quantity AS BIGINT) AS q, count(*)::BIGINT AS c
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY 1, 2
),
cum AS (
    SELECT p, q, c,
           coalesce(sum(c) OVER (PARTITION BY p ORDER BY q
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               ::BIGINT AS below,
           coalesce(sum(c) OVER (PARTITION BY p ORDER BY q
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0)
               ::BIGINT AS above
    FROM g
),
cd AS (
    SELECT sum(j.c * i.below)::BIGINT AS conc,
           sum(j.c * i.above)::BIGINT AS disc
    FROM cum i JOIN cum j ON j.q = i.q AND j.p > i.p
)
SELECT conc AS concordant, disc AS discordant,
       round((conc - disc) * 1.0 / (conc + disc) * 1000000) / 1000000
           + 0.0 AS gamma
FROM cd
"""


@register("goodman_kruskal_gamma", oracle=_GK_ORACLE)
def goodman_kruskal_gamma(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_quantity").cast("long").alias("q")
    )
    od = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.substring("o_orderpriority", 1, 1).cast("long").alias("p"),
    )
    g = li.join(od, "l_orderkey").groupBy("p", "q").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    wb = (
        Window.partitionBy("p")
        .orderBy("q")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wa = (
        Window.partitionBy("p")
        .orderBy("q")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    cum = g.select(
        "p",
        "q",
        "c",
        F.coalesce(F.sum("c").over(wb), F.lit(0)).cast("long")
        .alias("below"),
        F.coalesce(F.sum("c").over(wa), F.lit(0)).cast("long")
        .alias("above"),
    )
    i = cum.select(
        F.col("p").alias("pi"), "q",
        F.col("below").alias("bi"), F.col("above").alias("ai"),
    )
    j = cum.select(F.col("p").alias("pj"), "q", F.col("c").alias("cj"))
    cd = (
        i.join(F.broadcast(j), "q")
        .filter(F.col("pj") > F.col("pi"))
        .agg(
            F.sum(F.col("cj") * F.col("bi")).cast("long").alias("conc"),
            F.sum(F.col("cj") * F.col("ai")).cast("long").alias("disc"),
        )
    )
    return cd.select(
        F.col("conc").alias("concordant"),
        F.col("disc").alias("discordant"),
        R.r(
            (F.col("conc") - F.col("disc"))
            * F.lit(1.0)
            / (F.col("conc") + F.col("disc")),
            6,
        ).alias("gamma"),
    )


# --- sample-ratio-mismatch (SRM) guardrail ------------------------------------
# The most-run experimentation check there is: does the odd/even
# user_id split actually land 50/50? χ² = (n₁ − n₀)²/n exactly (the
# 2-cell GOF collapses to this), decided against the df=1 critical
# value. Counts at USER grain (each user assigned once), fully exact.

_SRM_ORACLE = """
WITH u AS (SELECT DISTINCT user_id FROM events),
c AS (
    SELECT sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)::BIGINT AS n1,
           sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS n0
    FROM u
)
SELECT n1 AS n_treat, n0 AS n_ctrl,
       round((n1 - n0) * (n1 - n0) * 1.0 / (n1 + n0) * 1000000) / 1000000
           + 0.0 AS chi2,
       (n1 - n0) * (n1 - n0) * 1.0 / (n1 + n0) > 3.8415 AS srm_detected
FROM c
"""


@register("srm_sample_ratio_mismatch", oracle=_SRM_ORACLE)
def srm_sample_ratio_mismatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = read_table(spark, sf_dir, "events").select("user_id").distinct()
    c = u.agg(
        F.sum(F.when(F.col("user_id") % 2 == 1, 1).otherwise(0))
        .cast("long").alias("n1"),
        F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0))
        .cast("long").alias("n0"),
    )
    chi2 = (
        (F.col("n1") - F.col("n0"))
        * (F.col("n1") - F.col("n0"))
        * F.lit(1.0)
        / (F.col("n1") + F.col("n0"))
    )
    return c.select(
        F.col("n1").alias("n_treat"),
        F.col("n0").alias("n_ctrl"),
        R.r(chi2, 6).alias("chi2"),
        (chi2 > 3.8415).alias("srm_detected"),
    )


# --- QQ comparison at deciles: en vs non-en lengths ---------------------------
# Explicit grid quantiles (smallest value whose cumulative count
# reaches ceil(q·n/100) — the mood-test median rule generalized), so
# both engines pick identical cut values regardless of their
# percentile interpolation conventions. 9 rows, all exact integers.

_QQ_ORACLE = """
WITH g AS (
    SELECT n_chars AS v,
           sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS ca,
           sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END)::BIGINT AS cb
    FROM documents GROUP BY 1
),
cum AS (
    SELECT v,
           sum(ca) OVER (ORDER BY v)::BIGINT AS cum_a,
           sum(cb) OVER (ORDER BY v)::BIGINT AS cum_b
    FROM g
),
tot AS (SELECT sum(ca)::BIGINT AS na, sum(cb)::BIGINT AS nb FROM g),
d AS (SELECT unnest(generate_series(10, 90, 10)) AS pct),
qa AS (
    SELECT d.pct, min(cum.v) AS q_en
    FROM d, cum, tot
    WHERE cum.cum_a * 100 >= d.pct * tot.na
    GROUP BY d.pct
),
qb AS (
    SELECT d.pct, min(cum.v) AS q_other
    FROM d, cum, tot
    WHERE cum.cum_b * 100 >= d.pct * tot.nb
    GROUP BY d.pct
)
SELECT qa.pct::BIGINT AS percentile, qa.q_en, qb.q_other,
       (qa.q_en - qb.q_other)::BIGINT AS qq_gap
FROM qa JOIN qb ON qb.pct = qa.pct
"""


@register("qq_plot_deciles", oracle=_QQ_ORACLE)
def qq_plot_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select("lang", "n_chars")
    g = docs.groupBy(F.col("n_chars").alias("v")).agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("long").alias("ca"),
        F.sum(F.when(F.col("lang") != "en", 1).otherwise(0))
        .cast("long").alias("cb"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = g.select(
        "v",
        F.sum("ca").over(w).cast("long").alias("cum_a"),
        F.sum("cb").over(w).cast("long").alias("cum_b"),
    )
    tot = g.agg(
        F.sum("ca").cast("long").alias("na"),
        F.sum("cb").cast("long").alias("nb"),
    )
    d = spark.createDataFrame(
        [(p,) for p in range(10, 100, 10)], "pct long"
    )
    base = cum.crossJoin(F.broadcast(tot)).crossJoin(F.broadcast(d))
    qa = (
        base.filter(F.col("cum_a") * 100 >= F.col("pct") * F.col("na"))
        .groupBy("pct")
        .agg(F.min("v").alias("q_en"))
    )
    qb = (
        base.filter(F.col("cum_b") * 100 >= F.col("pct") * F.col("nb"))
        .groupBy("pct")
        .agg(F.min("v").alias("q_other"))
    )
    return qa.join(qb, "pct").select(
        F.col("pct").alias("percentile"),
        "q_en",
        "q_other",
        (F.col("q_en") - F.col("q_other")).cast("long").alias("qq_gap"),
    )


# --- mean-excess ladder (peaks-over-threshold diagnostic) ---------------------
# The EVT threshold-choice plot: e(u) = E[X − u | X > u] over a fixed
# price-threshold ladder — rising-linear mean excess indicates a
# heavy GPD tail (complements the registered Gumbel block-maxima
# query). Excesses are exact DECIMAL sums; one corpus scan covers the
# whole ladder.

_ME_THRESHOLDS = [100000, 200000, 300000, 400000]

_ME_ORACLE = f"""
WITH t AS (SELECT unnest([{", ".join(str(u) for u in _ME_THRESHOLDS)}]) AS u),
e AS (
    SELECT t.u, count(*)::BIGINT AS n_exceed,
           sum(CAST(o.o_totalprice AS DECIMAL(30,8)) - t.u) AS excess
    FROM orders o JOIN t ON o.o_totalprice > t.u
    GROUP BY t.u
)
SELECT u::BIGINT AS threshold, n_exceed,
       round(excess::DOUBLE / n_exceed * 10000) / 10000 + 0.0
           AS mean_excess
FROM e
"""


@register("mean_excess_pot_ladder", oracle=_ME_ORACLE)
def mean_excess_pot_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders").select("o_totalprice")
    t = spark.createDataFrame(
        [(u,) for u in _ME_THRESHOLDS], "u long"
    )
    e = (
        o.join(F.broadcast(t), F.col("o_totalprice") > F.col("u"))
        .groupBy("u")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_exceed"),
            F.sum(
                F.col("o_totalprice").cast("decimal(30,8)") - F.col("u")
            ).alias("excess"),
        )
    )
    return e.select(
        F.col("u").cast("long").alias("threshold"),
        "n_exceed",
        R.r(F.col("excess").cast("double") / F.col("n_exceed"), 4)
        .alias("mean_excess"),
    )


# --- Breslow-Day homogeneity of odds ratios ------------------------------------
# The companion the registered Mantel-Haenszel query needs before its
# common OR is trusted: are the per-language stratum ORs actually
# homogeneous? Same 2×2 cells as mantel_haenszel_or. Under the pooled
# MH odds ratio ψ (snapped at 8dp from the same 1e-6-unit MH sums),
# the expected exposed-positive count per stratum solves
# (1−ψ)·â² + [(n−r1−c1) + ψ(r1+c1)]·â − ψ·r1·c1 = 0; both engines take
# sqrt of the identical discriminant double and pick the admissible
# root by the same bounds check. BD = Σ (a−â)²/V̂ with
# V̂ = 1/(Σ 1/cell-hat); per-stratum terms snap to 1e-6 units.

_BD_CRIT = 9.4877  # chi-square 95th pct, df = strata-1 = 4


_BRESLOW_DAY_ORACLE = f"""
WITH d AS (
    SELECT lang,
           (CAST(substr(source, 4) AS BIGINT) % 2 = 0) AS exposed,
           (n_chars > 250) AS long_doc
    FROM documents
),
s AS (
    SELECT lang,
           count(*) FILTER (WHERE exposed AND long_doc)::BIGINT AS a,
           count(*) FILTER (WHERE exposed)::BIGINT AS r1,
           count(*) FILTER (WHERE long_doc)::BIGINT AS c1,
           count(*)::BIGINT AS n
    FROM d GROUP BY 1
),
mh AS (
    SELECT round(sum(CAST(round(a * (n - r1 - c1 + a) * 1000000.0 / n)
                          AS BIGINT)) * 1.0
                 / sum(CAST(round((r1 - a) * (c1 - a) * 1000000.0 / n)
                            AS BIGINT)) * 100000000) / 100000000 AS psi
    FROM s
),
q AS (
    SELECT s.*, mh.psi,
           (1 - mh.psi) AS qa,
           ((s.n - s.r1 - s.c1) + mh.psi * (s.r1 + s.c1)) AS qb,
           (-mh.psi * s.r1 * s.c1) AS qc
    FROM s, mh
),
roots AS (
    SELECT *,
           CASE WHEN abs(qa) < 1e-12 THEN -qc / qb
                ELSE (-qb + sqrt(qb * qb - 4 * qa * qc)) / (2 * qa)
           END AS root1,
           CASE WHEN abs(qa) < 1e-12 THEN -qc / qb
                ELSE (-qb - sqrt(qb * qb - 4 * qa * qc)) / (2 * qa)
           END AS root2
    FROM q
),
pick AS (
    SELECT *, CASE WHEN root1 >= greatest(0, r1 + c1 - n)
                    AND root1 <= least(r1, c1) THEN root1
                   ELSE root2 END AS a_hat
    FROM roots
),
terms AS (
    SELECT lang, a, r1, c1, n, a_hat,
           -- (a-â)² / V̂ with V̂ = 1/Σ(1/cell-hats), i.e. times Σ(1/cells)
           CAST(round((a - a_hat) * (a - a_hat)
                      * (1.0 / a_hat + 1.0 / (r1 - a_hat)
                         + 1.0 / (c1 - a_hat)
                         + 1.0 / (n - r1 - c1 + a_hat))
                      * 1000000) AS BIGINT) AS t_u
    FROM pick
),
bd AS (SELECT sum(t_u)::BIGINT AS bd_u FROM terms)
SELECT t.lang, t.a AS observed_a,
       round(t.a_hat * 10000) / 10000 + 0.0 AS expected_a,
       round(t.t_u * 1.0 / 1000000 * 10000) / 10000 + 0.0 AS bd_term,
       round(bd.bd_u * 1.0 / 1000000 * 10000) / 10000 + 0.0 AS bd_stat,
       bd.bd_u * 1.0 / 1000000 > {_BD_CRIT} AS reject_homogeneity
FROM terms t, bd
"""


@register("breslow_day_homogeneity", oracle=_BRESLOW_DAY_ORACLE)
def breslow_day_homogeneity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    d = docs.select(
        "lang",
        (F.substring("source", 4, 10).cast("long") % 2 == 0)
        .alias("exposed"),
        (F.col("n_chars") > 250).alias("long_doc"),
    )
    s = d.groupBy("lang").agg(
        F.sum(F.when(F.col("exposed") & F.col("long_doc"), 1).otherwise(0))
        .cast("long").alias("a"),
        F.sum(F.when(F.col("exposed"), 1).otherwise(0)).cast("long")
        .alias("r1"),
        F.sum(F.when(F.col("long_doc"), 1).otherwise(0)).cast("long")
        .alias("c1"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    s = s.persist()
    u6 = F.lit(1000000.0)
    mh = s.agg(
        R.r(
            F.sum(
                F.round(
                    F.col("a")
                    * (F.col("n") - F.col("r1") - F.col("c1") + F.col("a"))
                    * u6
                    / F.col("n")
                ).cast("long")
            )
            * F.lit(1.0)
            / F.sum(
                F.round(
                    (F.col("r1") - F.col("a"))
                    * (F.col("c1") - F.col("a"))
                    * u6
                    / F.col("n")
                ).cast("long")
            ),
            8,
        ).alias("psi")
    )
    q = s.crossJoin(F.broadcast(mh)).select(
        "lang", "a", "r1", "c1", "n", "psi",
        (1 - F.col("psi")).alias("qa"),
        (
            (F.col("n") - F.col("r1") - F.col("c1"))
            + F.col("psi") * (F.col("r1") + F.col("c1"))
        ).alias("qb"),
        (-F.col("psi") * F.col("r1") * F.col("c1")).alias("qc"),
    )
    disc = F.sqrt(F.col("qb") * F.col("qb") - 4 * F.col("qa") * F.col("qc"))
    lin = -F.col("qc") / F.col("qb")
    root1 = F.when(F.abs(F.col("qa")) < 1e-12, lin).otherwise(
        (-F.col("qb") + disc) / (2 * F.col("qa"))
    )
    root2 = F.when(F.abs(F.col("qa")) < 1e-12, lin).otherwise(
        (-F.col("qb") - disc) / (2 * F.col("qa"))
    )
    roots = q.select(
        "lang", "a", "r1", "c1", "n",
        root1.alias("root1"), root2.alias("root2"),
    )
    lo = F.greatest(F.lit(0.0), (F.col("r1") + F.col("c1") - F.col("n"))
                    .cast("double"))
    hi = F.least(F.col("r1"), F.col("c1")).cast("double")
    a_hat = F.when(
        (F.col("root1") >= lo) & (F.col("root1") <= hi), F.col("root1")
    ).otherwise(F.col("root2"))
    pick = roots.select("lang", "a", "r1", "c1", "n", a_hat.alias("a_hat"))
    inv_v = (
        F.lit(1.0) / F.col("a_hat")
        + F.lit(1.0) / (F.col("r1") - F.col("a_hat"))
        + F.lit(1.0) / (F.col("c1") - F.col("a_hat"))
        + F.lit(1.0)
        / (F.col("n") - F.col("r1") - F.col("c1") + F.col("a_hat"))
    )
    t_u = F.round(
        (F.col("a") - F.col("a_hat"))
        * (F.col("a") - F.col("a_hat"))
        * inv_v
        * u6
    ).cast("long")
    terms = pick.select("lang", "a", "a_hat", t_u.alias("t_u"))
    bd = terms.agg(F.sum("t_u").cast("long").alias("bd_u"))
    return terms.crossJoin(F.broadcast(bd)).select(
        "lang",
        F.col("a").alias("observed_a"),
        R.r(F.col("a_hat"), 4).alias("expected_a"),
        R.r(F.col("t_u") * F.lit(1.0) / 1000000, 4).alias("bd_term"),
        R.r(F.col("bd_u") * F.lit(1.0) / 1000000, 4).alias("bd_stat"),
        (F.col("bd_u") * F.lit(1.0) / 1000000 > _BD_CRIT)
        .alias("reject_homogeneity"),
    )


# --- Simpson diversity / dominance of the source mix ---------------------------
# The unbiased (finite-sample) Simpson index over per-source document
# counts: D = Σ n_i(n_i−1) / (N(N−1)), diversity = 1 − D, inverse
# Simpson = 1/D — the ecology triple next to the registered Shannon
# equitability. Exact integers until two final divisions.

_SIMPSON_ORACLE = """
WITH s AS (
    SELECT source, count(*)::BIGINT AS n FROM documents GROUP BY 1
),
t AS (
    SELECT count(*)::BIGINT AS k, sum(n)::BIGINT AS nn,
           sum(n * (n - 1))::BIGINT AS num
    FROM s
)
SELECT k AS n_sources, nn AS n_docs,
       round(num * 1.0 / (nn * (nn - 1)) * 1000000) / 1000000 + 0.0
           AS simpson_d,
       round((1.0 - num * 1.0 / (nn * (nn - 1))) * 1000000) / 1000000
           + 0.0 AS simpson_diversity,
       round((nn * 1.0 * (nn - 1)) / num * 10000) / 10000 + 0.0
           AS inverse_simpson
FROM t
"""


@register("simpson_diversity_sources", oracle=_SIMPSON_ORACLE)
def simpson_diversity_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = read_table(spark, sf_dir, "documents").groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    t = s.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("nn"),
        F.sum(F.col("n") * (F.col("n") - 1)).cast("long").alias("num"),
    )
    d = F.col("num") * F.lit(1.0) / (F.col("nn") * (F.col("nn") - 1))
    return t.select(
        F.col("k").alias("n_sources"),
        F.col("nn").alias("n_docs"),
        R.r(d, 6).alias("simpson_d"),
        R.r(F.lit(1.0) - d, 6).alias("simpson_diversity"),
        R.r(
            (F.col("nn") * F.lit(1.0) * (F.col("nn") - 1)) / F.col("num"),
            4,
        ).alias("inverse_simpson"),
    )


# --- Dixon Q extreme-value screen on the daily series --------------------------
# The small-n outlier quick check (n=30 daily sums): Q = gap between
# the extreme and its neighbor over the range, both ends reported.
# Sorting happens on the exact DECIMAL array; Q is one division of
# exact-difference doubles.

_DIXON_ORACLE = """
WITH daily AS (
    SELECT ts::DATE AS day, sum(CAST(value AS DECIMAL(30,8))) AS x
    FROM events GROUP BY 1
),
arr AS (
    SELECT list(x ORDER BY x, day) AS xs, count(*)::BIGINT AS n
    FROM daily
)
SELECT n AS n_days,
       round((xs[2] - xs[1])::DOUBLE
             / (xs[CAST(n AS INT)] - xs[1])::DOUBLE * 1000000) / 1000000
           + 0.0 AS q_low,
       round((xs[CAST(n AS INT)] - xs[CAST(n - 1 AS INT)])::DOUBLE
             / (xs[CAST(n AS INT)] - xs[1])::DOUBLE * 1000000) / 1000000
           + 0.0 AS q_high,
       greatest((xs[2] - xs[1])::DOUBLE, (xs[CAST(n AS INT)]
                - xs[CAST(n - 1 AS INT)])::DOUBLE)
           / (xs[CAST(n AS INT)] - xs[1])::DOUBLE > 0.29
           AS flag_extreme
FROM arr
"""


@register("dixon_q_outlier_daily", oracle=_DIXON_ORACLE)
def dixon_q_outlier_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_value(spark, sf_dir)
    arr = daily.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("x", "day"))),
            lambda s: s["x"],
        ).alias("xs"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    xs = F.col("xs")
    n = F.col("n").cast("int")
    first = F.element_at(xs, 1)
    second = F.element_at(xs, 2)
    last = F.element_at(xs, n)
    penult = F.element_at(xs, (F.col("n") - 1).cast("int"))
    rng = (last - first).cast("double")
    q_low = (second - first).cast("double") / rng
    q_high = (last - penult).cast("double") / rng
    return arr.select(
        F.col("n").alias("n_days"),
        R.r(q_low, 6).alias("q_low"),
        R.r(q_high, 6).alias("q_high"),
        (F.greatest(
            (second - first).cast("double"),
            (last - penult).cast("double"),
        ) / rng > 0.29).alias("flag_extreme"),
    )


# --- Somers' D: quantity | priority ---------------------------------------------
# The asymmetric ordinal association (the gamma sibling that charges
# ties on the DEPENDENT variable): D_{Y|X} = (C − D)/(C + D + T_Y),
# where T_Y = pairs differing on priority but tied on quantity — all
# from the same 5×50 cumulative count grid.

_SOMERS_ORACLE = """
WITH g AS (
    SELECT CAST(substr(o.o_orderpriority, 1, 1) AS BIGINT) AS p,
           CAST(l.l_quantity AS BIGINT) AS q, count(*)::BIGINT AS c
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY 1, 2
),
cum AS (
    SELECT p, q, c,
           coalesce(sum(c) OVER (PARTITION BY p ORDER BY q
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               ::BIGINT AS below,
           coalesce(sum(c) OVER (PARTITION BY p ORDER BY q
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0)
               ::BIGINT AS above
    FROM g
),
cd AS (
    SELECT sum(j.c * i.below)::BIGINT AS conc,
           sum(j.c * i.above)::BIGINT AS disc,
           sum(j.c * i.c)::BIGINT AS ty
    FROM cum i JOIN cum j ON j.q = i.q AND j.p > i.p
)
SELECT conc AS concordant, disc AS discordant, ty AS ties_y,
       round((conc - disc) * 1.0 / (conc + disc + ty) * 1000000)
           / 1000000 + 0.0 AS somers_d
FROM cd
"""


@register("somers_d_priority_qty", oracle=_SOMERS_ORACLE)
def somers_d_priority_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_quantity").cast("long").alias("q")
    )
    od = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.substring("o_orderpriority", 1, 1).cast("long").alias("p"),
    )
    g = li.join(od, "l_orderkey").groupBy("p", "q").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    wb = (
        Window.partitionBy("p").orderBy("q")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wa = (
        Window.partitionBy("p").orderBy("q")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    cum = g.select(
        "p", "q", "c",
        F.coalesce(F.sum("c").over(wb), F.lit(0)).cast("long")
        .alias("below"),
        F.coalesce(F.sum("c").over(wa), F.lit(0)).cast("long")
        .alias("above"),
    )
    i = cum.select(
        F.col("p").alias("pi"), "q", F.col("c").alias("ci"),
        F.col("below").alias("bi"), F.col("above").alias("ai"),
    )
    j = cum.select(F.col("p").alias("pj"), "q", F.col("c").alias("cj"))
    cd = (
        i.join(F.broadcast(j), "q")
        .filter(F.col("pj") > F.col("pi"))
        .agg(
            F.sum(F.col("cj") * F.col("bi")).cast("long").alias("conc"),
            F.sum(F.col("cj") * F.col("ai")).cast("long").alias("disc"),
            F.sum(F.col("cj") * F.col("ci")).cast("long").alias("ty"),
        )
    )
    return cd.select(
        F.col("conc").alias("concordant"),
        F.col("disc").alias("discordant"),
        F.col("ty").alias("ties_y"),
        R.r(
            (F.col("conc") - F.col("disc"))
            * F.lit(1.0)
            / (F.col("conc") + F.col("disc") + F.col("ty")),
            6,
        ).alias("somers_d"),
    )
