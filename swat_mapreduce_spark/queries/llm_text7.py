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
    docs = read_table(spark, sf_dir, "documents").select("source", "text")
    ch = docs.select(
        "source",
        F.explode(
            F.expr(
                "transform(sequence(1, length(text)), "
                "i -> substring(text, i, 1))"
            )
        ).alias("c"),
    )
    cnt = ch.groupBy("source", "c").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = cnt.groupBy("source").agg(F.sum("n").alias("t"))
    dom = cnt.select("c").distinct()
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
                    "c",
                    F.col("n").alias("na"),
                )
            ),
            ["src_a", "c"],
            "left",
        )
        .join(
            F.broadcast(
                cnt.select(
                    F.col("source").alias("src_b"),
                    "c",
                    F.col("n").alias("nb"),
                )
            ),
            ["src_b", "c"],
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
