"""Round-11 statistics pack: Cramér–von Mises two-sample, the Quade
weighted-rank block test, generalized ESD (iterated Grubbs), and the
AMS F2 sign sketch.

Determinism follows the stats_tests2 discipline: every statistic is
built from exact integer counts (DECIMAL(38,0) where a term sum can
pass 2^63 — gotcha 13a), DECIMAL daily sums cast to double only as
whole values, squared deviations snapped to integer units BEFORE
summation (the grubbs pattern), sqrt on identical doubles (IEEE
correctly rounded), and every argmax/rank carries a day/event_type
tie-break. Scale: each op is one map-side-combined shuffle to a
bounded panel (|days| ≤ ~31, |lengths| domain, |vocab| counts), then
broadcast arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from swat_mapreduce_spark.functions import hashing as _H
from swat_mapreduce_spark.functions import rounding as R
from swat_mapreduce_spark.functions.text import ws_tokens
from swat_mapreduce_spark.queries import register
from swat_mapreduce_spark.queries.stats_tests import _daily_value
from swat_mapreduce_spark.sources.readers import read_table

# --- Cramér–von Mises two-sample: doc length, en vs non-en -------------------
# T = nm/(n+m)^2 · Σ_pooled (F_n − G_m)^2, evaluated on the bounded
# length-domain grid: per distinct length v with group counts
# (ca, cb) and cumulatives (CA, CB), the pooled sum is
# Σ_v (ca+cb)·(CA·m − CB·n)^2 / (n·m)^2, so
# T = S / (n·m·(n+m)^2) with S an exact integer (DECIMAL(38,0) sum —
# a single term reaches ~8e16 and the grid sum can pass 2^63).

_CVM_ORACLE = """
WITH g AS (
    SELECT n_chars AS v,
           sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS ca,
           sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END)::BIGINT AS cb
    FROM documents GROUP BY 1
),
c AS (
    SELECT v, ca, cb,
           sum(ca) OVER (ORDER BY v)::BIGINT AS cca,
           sum(cb) OVER (ORDER BY v)::BIGINT AS ccb
    FROM g
),
nn AS (SELECT sum(ca)::BIGINT AS n, sum(cb)::BIGINT AS m FROM g),
s AS (
    SELECT sum(CAST((c.ca + c.cb) AS DECIMAL(38,0))
               * CAST((c.cca * nn.m - c.ccb * nn.n)
                      * (c.cca * nn.m - c.ccb * nn.n)
                      AS DECIMAL(38,0))) AS su
    FROM c, nn
)
SELECT nn.n AS n_en, nn.m AS n_other,
       round(s.su::DOUBLE
             / (nn.n::DOUBLE * nn.m * (nn.n + nn.m) * (nn.n + nn.m))
             * 10000) / 10000 + 0.0 AS cvm_t
FROM s, nn
"""


@register("cramer_von_mises_two_sample", oracle=_CVM_ORACLE)
def cramer_von_mises_two_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    g = docs.groupBy(F.col("n_chars").alias("v")).agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("long")
        .alias("ca"),
        F.sum(F.when(F.col("lang") != "en", 1).otherwise(0))
        .cast("long")
        .alias("cb"),
    )
    # cumulative ECDFs over the bounded length-domain grid (the
    # ks_two_sample global-window shape, allowlisted)
    w = Window.orderBy("v")
    c = g.select(
        "ca",
        "cb",
        F.sum("ca").over(w).cast("long").alias("cca"),
        F.sum("cb").over(w).cast("long").alias("ccb"),
    )
    nn = g.agg(
        F.sum("ca").cast("long").alias("n"),
        F.sum("cb").cast("long").alias("m"),
    )
    d = F.col("cca") * F.col("m") - F.col("ccb") * F.col("n")
    s = (
        c.crossJoin(F.broadcast(nn))
        .select(
            (
                (F.col("ca") + F.col("cb")).cast("decimal(38,0)")
                * (d * d).cast("decimal(38,0)")
            ).alias("term"),
            "n",
            "m",
        )
        .groupBy("n", "m")
        .agg(F.sum("term").alias("su"))
    )
    return s.select(
        F.col("n").alias("n_en"),
        F.col("m").alias("n_other"),
        R.r(
            F.col("su").cast("double")
            / (
                F.col("n").cast("double")
                * F.col("m")
                * (F.col("n") + F.col("m"))
                * (F.col("n") + F.col("m"))
            ),
            4,
        ).alias("cvm_t"),
    )


# --- Quade weighted-rank block test ------------------------------------------
# Quade 1979: the Friedman companion that weights blocks by the rank
# of their range, gaining power when block scale varies. Blocks = days
# (complete over the k=5 event types, friedman's complete-block drop),
# within-block ranks r_ij on the DECIMAL cell sums with event_type
# tie-break, block weights Q_i = rank of the exact DECIMAL range with
# day tie-break. S_ij = Q_i·(r_ij − 3) is an exact integer;
# F = (n−1)·SB / (n·A − SB) with A = Σ S_ij², SB = Σ_j S_j² — an
# exact integer ratio snapped at the end.

_QUADE_K = 5

_QUADE_ORACLE = f"""
WITH cell AS (
    SELECT ts::DATE AS day, event_type,
           sum(CAST(value AS DECIMAL(30,8))) AS x
    FROM events GROUP BY 1, 2
),
full_blocks AS (
    SELECT day FROM cell GROUP BY day
    HAVING count(*) = {_QUADE_K}
),
c2 AS (
    SELECT c.day, c.event_type, c.x FROM cell c
    JOIN full_blocks fb ON fb.day = c.day
),
rk AS (
    SELECT day, event_type,
           row_number() OVER (PARTITION BY day
                              ORDER BY x, event_type) AS r
    FROM c2
),
rng AS (
    SELECT day, max(x) - min(x) AS rg FROM c2 GROUP BY 1
),
q AS (
    SELECT day, row_number() OVER (ORDER BY rg, day)::BIGINT AS q
    FROM rng
),
sij AS (
    SELECT rk.day, rk.event_type,
           q.q * (rk.r - 3) AS s
    FROM rk JOIN q ON q.day = rk.day
),
a AS (SELECT sum(s * s)::BIGINT AS a, count(DISTINCT day)::BIGINT AS n
      FROM sij),
sj AS (SELECT event_type, sum(s)::BIGINT AS sj FROM sij GROUP BY 1),
sb AS (SELECT sum(sj * sj)::BIGINT AS sb FROM sj)
SELECT a.n AS n_blocks, a.a AS a_stat, sb.sb AS sb_stat,
       round((a.n - 1) * sb.sb * 1.0 / (a.n * a.a - sb.sb) * 10000)
           / 10000 + 0.0 AS f_stat
FROM a, sb
"""


@register("quade_test_event_types", oracle=_QUADE_ORACLE)
def quade_test_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    cell = ev.groupBy(
        F.col("ts").cast("date").alias("day"), "event_type"
    ).agg(F.sum(F.col("value").cast("decimal(30,8)")).alias("x"))
    full_blocks = (
        cell.groupBy("day")
        .agg(F.count(F.lit(1)).alias("kk"))
        .filter(F.col("kk") == _QUADE_K)
        .select("day")
    )
    c2 = cell.join(F.broadcast(full_blocks), "day").persist()
    rk = c2.select(
        "day",
        "event_type",
        F.row_number()
        .over(Window.partitionBy("day").orderBy("x", "event_type"))
        .alias("r"),
    )
    rng = c2.groupBy("day").agg((F.max("x") - F.min("x")).alias("rg"))
    # block-weight rank over the calendar-bounded day table
    q = rng.select(
        "day",
        F.row_number()
        .over(Window.orderBy("rg", "day"))
        .cast("long")
        .alias("q"),
    )
    sij = rk.join(q, "day").select(
        "event_type", (F.col("q") * (F.col("r") - 3)).alias("s")
    )
    a = sij.agg(
        F.sum(F.col("s") * F.col("s")).cast("long").alias("a"),
    )
    n = full_blocks.agg(F.count(F.lit(1)).cast("long").alias("n"))
    sb = (
        sij.groupBy("event_type")
        .agg(F.sum("s").cast("long").alias("sj"))
        .agg(F.sum(F.col("sj") * F.col("sj")).cast("long").alias("sb"))
    )
    out = (
        a.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(sb))
        .select(
            F.col("n").alias("n_blocks"),
            F.col("a").alias("a_stat"),
            F.col("sb").alias("sb_stat"),
            R.r(
                (F.col("n") - 1)
                * F.col("sb")
                * F.lit(1.0)
                / (F.col("n") * F.col("a") - F.col("sb")),
                4,
            ).alias("f_stat"),
        )
    )
    rows = out.collect()
    c2.unpersist()
    return spark.createDataFrame(rows, out.schema)


# --- generalized ESD (Rosner 1983): iterated Grubbs, 3 rounds ----------------
# Round i removes the most extreme remaining day and reports
# R_i = max|x − mean_i| / s_i, each round recomputed on the surviving
# set — the multi-outlier extension of grubbs_outlier_daily, same
# snapped-deviation arithmetic (squared deviations in integer 1e-4
# units, sqrt on identical doubles), same (|dev| desc, day asc)
# election. Fixed 3 rounds on the ≤ ~31-row daily panel.

_ESD_ROUNDS = 3


def _esd_round_sql(src: str, i: int) -> str:
    return f"""
m{i} AS (
    SELECT count(*)::BIGINT AS n, (sum(x)::DOUBLE) / count(*) AS mu
    FROM {src}
),
dev{i} AS (
    SELECT day, x,
           CAST(round((x::DOUBLE - mu) * (x::DOUBLE - mu) * 10000)
                AS BIGINT) AS sq_u,
           abs(x::DOUBLE - mu) AS ad, n
    FROM {src}, m{i}
),
s{i} AS (
    SELECT n, sqrt((sum(sq_u)::DOUBLE / 10000) / (n - 1)) AS sd
    FROM dev{i} GROUP BY n
),
top{i} AS (SELECT day, ad FROM dev{i} ORDER BY ad DESC, day LIMIT 1),
r{i} AS (
    SELECT {i}::BIGINT AS round, s{i}.n AS n_remaining, top{i}.day
               AS outlier_day,
           round(top{i}.ad / s{i}.sd * 1000000) / 1000000 + 0.0 AS r_stat
    FROM s{i}, top{i}
),
d{i + 1} AS (
    SELECT d.day, d.x FROM {src} d, top{i} t WHERE d.day <> t.day
)"""


_ESD_ORACLE = (
    """
WITH d1 AS (
    SELECT ts::DATE AS day, sum(CAST(value AS DECIMAL(30,8))) AS x
    FROM events GROUP BY 1
),"""
    + ",".join(_esd_round_sql(f"d{i}", i) for i in range(1, _ESD_ROUNDS + 1))
    + """
SELECT * FROM r1 UNION ALL SELECT * FROM r2 UNION ALL SELECT * FROM r3
ORDER BY round
"""
)


@register("generalized_esd_daily", oracle=_ESD_ORACLE)
def generalized_esd_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_value(spark, sf_dir).persist()
    cur = daily
    out_rows = []
    schema = "round long, n_remaining long, outlier_day date, r_stat double"
    for i in range(1, _ESD_ROUNDS + 1):
        m = cur.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            (F.sum("x").cast("double") / F.count(F.lit(1))).alias("mu"),
        )
        dev = cur.crossJoin(F.broadcast(m)).select(
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
                (F.sum("sq_u").cast("double") / F.lit(10000))
                / (F.col("n") - 1)
            ).alias("sd")
        )
        top = (
            dev.orderBy(F.desc("ad"), F.asc("day"))
            .limit(1)
            .select("day", "ad")
        )
        row = (
            s.crossJoin(F.broadcast(top))
            .select(
                F.lit(i).cast("long").alias("round"),
                F.col("n").alias("n_remaining"),
                F.col("day").alias("outlier_day"),
                R.r(F.col("ad") / F.col("sd"), 6).alias("r_stat"),
            )
            .collect()
        )
        out_rows.extend(row)
        removed = row[0]["outlier_day"]
        cur = cur.filter(F.col("day") != F.lit(removed))
    daily.unpersist()
    return spark.createDataFrame(out_rows, schema)


# --- AMS F2 sign sketch over corpus token counts ------------------------------
# Alon-Matias-Szegedy 1996: the second frequency moment F2 = Σ c_t²
# estimated by 16 ±1-sign linear sketches z_j = Σ sign_j(t)·c_t,
# median of 4 means of 4 — EVERYTHING exact integers until the final
# /8 (the median of 4 values is the mean of the middle two group
# sums over 8). Signs derive from the shared md5 primitive (parity of
# one hash nibble per sketch), identical in both engines. One token
# shuffle builds the count table; the 16 sign aggregates ride the same
# single pass. True F2 is reported alongside for the accuracy audit.

_AMS_J = 16


def _ams_sign_duck(j: int) -> str:
    h = _H.duck_hash_uint(_H.sql_salted("t", f"'ams{j}'"), 1)
    return f"(1 - 2 * ({h} % 2))"


_AMS_ORACLE = (
    r"""
WITH tok AS (
    SELECT unnest(list_filter(string_split_regex(trim(text), '\s+'),
                              x -> len(x) > 0)) AS t
    FROM documents
),
cnt AS (SELECT t, count(*)::BIGINT AS c FROM tok GROUP BY 1),
z AS (
    SELECT
"""
    + ",\n".join(
        f"        sum({_ams_sign_duck(j)} * c)::BIGINT AS z{j}"
        for j in range(_AMS_J)
    )
    + """,
        sum(c * c)::BIGINT AS true_f2,
        sum(c)::BIGINT AS n_tokens
    FROM cnt
),
gm AS (
    SELECT n_tokens, true_f2,
           list_sort(["""
    + ", ".join(
        " + ".join(f"z{g * 4 + j} * z{g * 4 + j}" for j in range(4))
        for g in range(4)
    )
    + """]) AS gs
    FROM z
)
SELECT n_tokens, true_f2,
       round((gs[2] + gs[3]) / 8.0 * 10000) / 10000 + 0.0 AS est_f2,
       round(abs((gs[2] + gs[3]) / 8.0 - true_f2) / true_f2 * 10000)
           / 10000 + 0.0 AS rel_err
FROM gm
"""
)


@register("ams_f2_sketch_tokens", oracle=_AMS_ORACLE)
def ams_f2_sketch_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    cnt = (
        docs.select(F.explode(ws_tokens(F.col("text"))).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )

    def sign(j: int):
        return 1 - 2 * (_H.hash_uint(F.col("t"), f"ams{j}", 1) % 2)

    z = cnt.agg(
        *[
            F.sum(sign(j) * F.col("c")).cast("long").alias(f"z{j}")
            for j in range(_AMS_J)
        ],
        F.sum(F.col("c") * F.col("c")).cast("long").alias("true_f2"),
        F.sum("c").cast("long").alias("n_tokens"),
    )
    gs = F.array_sort(
        F.array(
            *[
                sum(
                    F.col(f"z{g * 4 + j}") * F.col(f"z{g * 4 + j}")
                    for j in range(4)
                )
                for g in range(4)
            ]
        )
    )
    est = (F.element_at(gs, 2) + F.element_at(gs, 3)) / 8.0
    return z.select(
        "n_tokens",
        "true_f2",
        R.r(est, 4).alias("est_f2"),
        R.r(F.abs(est - F.col("true_f2")) / F.col("true_f2"), 4).alias(
            "rel_err"
        ),
    )
