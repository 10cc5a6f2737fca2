"""Round-8 LLM-pipeline corpus-analysis operators.

* jsd_source_divergence — pairwise Jensen-Shannon divergence matrix
  between per-source character-unigram distributions: the standard
  bounded (0..1 bit) symmetric drift measure a mixing pipeline uses
  to pick which sources are near-duplicates of each other vs genuine
  diversity (DoReMi/DSIR report it alongside reweighting). Char
  tables are charset-bounded per source, the pair matrix is
  |sources|² bounded, and every per-(pair,char) contribution is
  snapped to an integer 1e-6 unit before the order-free sum
  (CLAUDE.md gotcha 13a; the 1e-6 grid is the charlm lesson — JVM vs
  libm log ULP differences get 100x more margin than at 1e-8).

Scale posture: ONE corpus scan to char counts (map-side combined,
charset-bounded result), then all pair math happens on |sources| x
|charset| metadata — never row-level volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from swat_mapreduce_spark.functions import rounding as R
from swat_mapreduce_spark.queries import register
from swat_mapreduce_spark.sources.readers import read_table

_JSD_ORACLE = """
WITH ch AS (
    SELECT source,
           unnest(list_transform(generate_series(1, length(text)),
                                 i -> substring(text, i, 1))) AS c
    FROM documents
),
cnt AS (
    SELECT source, c, count(*)::BIGINT AS n FROM ch GROUP BY 1, 2
),
tot AS (SELECT source, sum(n)::BIGINT AS t FROM cnt GROUP BY 1),
dom AS (SELECT DISTINCT c FROM cnt),
pairs AS (
    SELECT a.source AS src_a, a.t AS ta, b.source AS src_b, b.t AS tb
    FROM tot a JOIN tot b ON a.source < b.source
),
terms AS (
    SELECT p.src_a, p.src_b, p.ta, p.tb,
           coalesce(ca.n, 0)::DOUBLE / p.ta AS pa,
           coalesce(cb.n, 0)::DOUBLE / p.tb AS pb
    FROM pairs p
    CROSS JOIN dom d
    LEFT JOIN cnt ca ON ca.source = p.src_a AND ca.c = d.c
    LEFT JOIN cnt cb ON cb.source = p.src_b AND cb.c = d.c
    WHERE coalesce(ca.n, 0) + coalesce(cb.n, 0) > 0
),
units AS (
    SELECT src_a, src_b, ta, tb,
           CAST(round((
               (CASE WHEN pa = 0 THEN 0.0
                     ELSE 0.5 * pa * log2(2.0 * pa / (pa + pb)) END)
             + (CASE WHEN pb = 0 THEN 0.0
                     ELSE 0.5 * pb * log2(2.0 * pb / (pa + pb)) END)
           ) * 1000000) AS BIGINT) AS u
    FROM terms
)
SELECT src_a, src_b,
       min(ta) AS n_chars_a, min(tb) AS n_chars_b,
       round(sum(u) * 1.0 / 1000000 * 10000) / 10000 + 0.0 AS jsd
FROM units
GROUP BY src_a, src_b
"""


@register("jsd_source_divergence", oracle=_JSD_ORACLE)
def jsd_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from swat_mapreduce_spark.functions.text import char_array

    docs = read_table(spark, sf_dir, "documents").select("source", "text")
    # char_array: split('')-based codepoint array — O(len) where the
    # per-index substring transform re-scanned the string per char
    # (O(len²); measured 7x at sf0.1, r12). Empty-text guard inside
    # the helper keeps the old gotcha-10 semantics (no ''-char rows).
    ch = docs.select(
        "source",
        F.explode(char_array(F.col("text"))).alias("ch"),
        # ch: single character (charset-bounded key name
        # for the broadcast-boundedness domain dict)
    )
    cnt = ch.groupBy("source", "ch").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = cnt.groupBy("source").agg(F.sum("n").alias("t"))
    dom = cnt.select("ch").distinct()
    pairs = (
        tot.select(
            F.col("source").alias("src_a"), F.col("t").alias("ta")
        )
        .join(
            tot.select(
                F.col("source").alias("src_b"), F.col("t").alias("tb")
            ),
            F.col("src_a") < F.col("src_b"),
        )
    )
    terms = (
        pairs.crossJoin(F.broadcast(dom))
        .join(
            F.broadcast(
                cnt.select(
                    F.col("source").alias("src_a"),
                    "ch",
                    F.col("n").alias("na"),
                )
            ),
            ["src_a", "ch"],
            "left",
        )
        .join(
            F.broadcast(
                cnt.select(
                    F.col("source").alias("src_b"),
                    "ch",
                    F.col("n").alias("nb"),
                )
            ),
            ["src_b", "ch"],
            "left",
        )
        .filter(
            F.coalesce("na", F.lit(0)) + F.coalesce("nb", F.lit(0)) > 0
        )
        .select(
            "src_a",
            "src_b",
            "ta",
            "tb",
            (
                F.coalesce("na", F.lit(0)).cast("double") / F.col("ta")
            ).alias("pa"),
            (
                F.coalesce("nb", F.lit(0)).cast("double") / F.col("tb")
            ).alias("pb"),
        )
    )
    half = F.lit(0.5)
    ta_term = F.when(F.col("pa") == 0, F.lit(0.0)).otherwise(
        half
        * F.col("pa")
        * F.log2(F.lit(2.0) * F.col("pa") / (F.col("pa") + F.col("pb")))
    )
    tb_term = F.when(F.col("pb") == 0, F.lit(0.0)).otherwise(
        half
        * F.col("pb")
        * F.log2(F.lit(2.0) * F.col("pb") / (F.col("pa") + F.col("pb")))
    )
    units = terms.select(
        "src_a",
        "src_b",
        "ta",
        "tb",
        F.round((ta_term + tb_term) * F.lit(1e6)).cast("long").alias("u"),
    )
    return units.groupBy("src_a", "src_b").agg(
        F.min("ta").alias("n_chars_a"),
        F.min("tb").alias("n_chars_b"),
        R.r(F.sum("u").cast("double") / F.lit(1e6), 4).alias("jsd"),
    )


# --- differential-privacy noise calibration audit -------------------------------
# The governance primitive for releasing corpus statistics: per-source
# document counts with Laplace(1/eps) noise, eps = 1.0 — plus the
# utility audit (absolute error, 3b-bound coverage) a data steward
# checks before picking eps. The "randomness" is the repo's standard
# md5-derived uniform (functions/hashing.hash_unit — deterministic,
# reproducible, oracle-checkable; a production release would swap in a
# real CSPRNG, which is exactly one column swap). The inverse-CDF ln
# is snapped to integer 1e-6 units on both engines (charlm margin
# note); u is (h+0.5)/16^8 so u=1/2 and log(0) are unreachable.
_DP_EPS = 1.0

_DP_ORACLE = f"""
WITH n AS (
    SELECT source, count(*)::BIGINT AS n_docs FROM documents GROUP BY 1
),
u AS (
    SELECT source, n_docs,
           (('0x' || substr(md5(source || ':dp'), 1, 8))::BIGINT + 0.5)
               / 4294967296.0 AS u
    FROM n
),
noise AS (
    SELECT source, n_docs,
           round((CASE WHEN u >= 0.5 THEN -1.0 ELSE 1.0 END)
                 * (1.0 / {_DP_EPS})
                 * ln(1.0 - 2.0 * abs(u - 0.5)) * 1000000) / 1000000
               AS nz
    FROM u
)
SELECT source, n_docs,
       round((n_docs + nz) * 10000) / 10000 + 0.0 AS noisy_count,
       round(abs(nz) * 10000) / 10000 + 0.0 AS abs_err,
       abs(nz) <= 3.0 / {_DP_EPS} AS within_3b
FROM noise
"""


@register("dp_noisy_counts_audit", oracle=_DP_ORACLE)
def dp_noisy_counts_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from swat_mapreduce_spark.functions import hashing as H

    n = (
        read_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    u = (H.hash_uint(F.col("source"), salt="dp", nibbles=8) + F.lit(0.5)) / (
        float(16**8)
    )
    sign = F.when(u >= 0.5, F.lit(-1.0)).otherwise(F.lit(1.0))
    nz = (
        F.round(
            sign
            * F.lit(1.0 / _DP_EPS)
            * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(u - F.lit(0.5)))
            * F.lit(1e6)
        )
        / F.lit(1e6)
    )
    return n.select(
        "source",
        "n_docs",
        R.r(F.col("n_docs") + nz, 4).alias("noisy_count"),
        R.r(F.abs(nz), 4).alias("abs_err"),
        (F.abs(nz) <= F.lit(3.0 / _DP_EPS)).alias("within_3b"),
    )


# --- mutual information between lang and source ---------------------------------
# The dependence audit for mixture design: I(lang; source) in bits
# plus both marginal entropies and the normalized MI — "does source
# identity leak language (or vice versa)", the question before
# stratifying a split on either column. Cells are |langs| x |sources|
# bounded after one corpus groupBy; every plogp term is snapped to an
# integer 1e-6 unit before the order-free sum (the jsd pattern — the
# 1e-6 grid, NOT 1e-8, per this file's header: it gives JVM-vs-libm
# log ULP differences 100x margin; final roundings relax to 4dp so
# the grid keeps that margin over the output quantum — ADVICE r8),
# so MI/H/NMI are ratios of exact int64 sums.
_MI_ORACLE = """
WITH c AS (
    SELECT lang, source, count(*)::BIGINT AS n FROM documents GROUP BY 1, 2
),
nl AS (SELECT lang, sum(n)::BIGINT AS n_l FROM c GROUP BY 1),
ns AS (SELECT source, sum(n)::BIGINT AS n_s FROM c GROUP BY 1),
tot AS (SELECT sum(n)::BIGINT AS n_tot FROM c),
mi_u AS (
    SELECT sum(CAST(round((c.n::DOUBLE / t.n_tot)
               * log2((c.n::DOUBLE * t.n_tot) / (nl.n_l::DOUBLE * ns.n_s))
               * 1000000) AS BIGINT))::BIGINT AS u,
           count(*)::BIGINT AS n_cells
    FROM c JOIN nl USING (lang) JOIN ns USING (source), tot t
),
hl_u AS (
    SELECT sum(CAST(round(-(n_l::DOUBLE / t.n_tot)
               * log2(n_l::DOUBLE / t.n_tot) * 1000000) AS BIGINT))
               ::BIGINT AS u
    FROM nl, tot t
),
hs_u AS (
    SELECT sum(CAST(round(-(n_s::DOUBLE / t.n_tot)
               * log2(n_s::DOUBLE / t.n_tot) * 1000000) AS BIGINT))
               ::BIGINT AS u
    FROM ns, tot t
)
SELECT t.n_tot AS n_docs, m.n_cells,
       round(m.u * 1.0 / 1000000 * 10000) / 10000 + 0.0 AS mi_bits,
       round(hl.u * 1.0 / 1000000 * 10000) / 10000 + 0.0
           AS h_lang_bits,
       round(hs.u * 1.0 / 1000000 * 10000) / 10000 + 0.0
           AS h_source_bits,
       round(m.u * 1.0 / least(hl.u, hs.u) * 10000) / 10000 + 0.0
           AS nmi
FROM mi_u m, hl_u hl, hs_u hs, tot t
"""


@register("mi_lang_source_dependence", oracle=_MI_ORACLE)
def mi_lang_source_dependence(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        read_table(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    nl = c.groupBy("lang").agg(F.sum("n").alias("n_l"))
    ns = c.groupBy("source").agg(F.sum("n").alias("n_s"))
    tot = c.agg(F.sum("n").alias("n_tot"))
    j = (
        c.join(F.broadcast(nl), "lang")
        .join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(tot))
    )
    term = (
        (F.col("n").cast("double") / F.col("n_tot"))
        * F.log2(
            (F.col("n").cast("double") * F.col("n_tot"))
            / (F.col("n_l").cast("double") * F.col("n_s"))
        )
        * F.lit(1e6)
    )
    mi_u = j.agg(
        F.sum(F.round(term).cast("long")).alias("u"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
    )

    def h_units(cnt_df, col):
        p = F.col(col).cast("double") / F.col("n_tot")
        return cnt_df.crossJoin(F.broadcast(tot)).agg(
            F.sum(
                F.round(-p * F.log2(p) * F.lit(1e6)).cast("long")
            ).alias("u")
        )

    hl = h_units(nl, "n_l").select(F.col("u").alias("hl_u"))
    hs = h_units(ns, "n_s").select(F.col("u").alias("hs_u"))
    return (
        mi_u.crossJoin(F.broadcast(hl))
        .crossJoin(F.broadcast(hs))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("n_tot").cast("long").alias("n_docs"),
            "n_cells",
            R.r(F.col("u").cast("double") / F.lit(1e6), 4).alias("mi_bits"),
            R.r(F.col("hl_u").cast("double") / F.lit(1e6), 4).alias(
                "h_lang_bits"
            ),
            R.r(F.col("hs_u").cast("double") / F.lit(1e6), 4).alias(
                "h_source_bits"
            ),
            R.r(
                F.col("u").cast("double")
                / F.least(F.col("hl_u"), F.col("hs_u")).cast("double"),
                4,
            ).alias("nmi"),
        )
    )
