"""Pairwise text-overlap metrics: ROUGE-2, smoothed log-BLEU-2,
chrF-3, and blocked Levenshtein record linkage — the measurement side
of a dedup/decontamination pipeline (how similar ARE the pairs the
LSH machinery surfaces?) and the classic fuzzy-linkage primitive.

Pair domain (gotcha 14 discipline): a FIXED-COUNT deterministic
sample — the 48 lowest documents under the shared md5-unit hash of
doc_id (salt 'ov'), consecutive-rank pairs (1,2)(3,4)… → exactly 24
pairs at every corpus size. The rank assignment is a row_number over
the LIMIT-48 subtree (TakeOrderedAndProject → 48-row global window —
bounded input by construction, allowlisted in the plan census).

Determinism: every overlap statistic is an exact integer count; the
only ratios are integer/integer snapped through functions/rounding.r
(multiply-round-divide), and BLEU's logs follow the llm_text9 pattern
— ln of identical exact rationals snapped to integer 1e-8 units
before any arithmetic. Levenshtein is the classic unweighted DP in
both engines (Spark `levenshtein` / DuckDB `levenshtein`).

Scale posture: the three overlap metrics touch 24 pairs of bounded
documents — O(1) beyond the TakeOrdered corpus scan. The linkage op
broadcasts a 32-probe sample against a brand-blocked corpus scan:
O(N·32/|brands|) candidate rows, one shuffle-free pass after the
broadcast, TakeOrdered(20) output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from swat_mapreduce_spark.functions import hashing as _H
from swat_mapreduce_spark.functions import rounding as R
from swat_mapreduce_spark.functions.text import ws_tokens
from swat_mapreduce_spark.queries import register
from swat_mapreduce_spark.sources.readers import read_table

_N_PAIR_DOCS = 48  # 24 pairs, fixed at every corpus size
_OV_HASH_DUCK = _H.duck_hash_uint(_H.sql_salted("doc_id", "'ov'"), 8)

_DUCK_TOKS = (
    r"list_filter(string_split_regex(trim(text), '\s+'), x -> len(x) > 0)"
)

# shared sampled-pair CTE (candidate = a / odd rank, reference = b)
_PAIR_CTE = f"""
samp AS (
    SELECT doc_id, text, h,
           row_number() OVER (ORDER BY h, doc_id) AS rn
    FROM (SELECT doc_id, text, {_OV_HASH_DUCK} AS h FROM documents
          ORDER BY h, doc_id LIMIT {_N_PAIR_DOCS}) s
),
pr AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           a.text AS ta, b.text AS tb
    FROM samp a JOIN samp b ON b.rn = a.rn + 1
    WHERE a.rn % 2 = 1
)
"""


def _pair_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    h = _H.hash_uint(F.col("doc_id"), "ov", 8)
    samp = (
        docs.select("doc_id", "text", h.alias("h"))
        .orderBy("h", "doc_id")
        .limit(_N_PAIR_DOCS)
    )
    # 48-row global window (bounded by the LIMIT upstream)
    samp = samp.withColumn(
        "rn", F.row_number().over(Window.orderBy("h", "doc_id"))
    )
    a = samp.filter(F.col("rn") % 2 == 1).select(
        F.col("rn").alias("ra"),
        F.col("doc_id").alias("doc_a"),
        F.col("text").alias("ta"),
    )
    b = samp.select(
        F.col("rn").alias("rb"),
        F.col("doc_id").alias("doc_b"),
        F.col("text").alias("tb"),
    )
    return a.join(b, F.col("rb") == F.col("ra") + 1).select(
        "doc_a", "doc_b", "ta", "tb"
    )


def _gram_counts(pairs: DataFrame, side: str, n: int) -> DataFrame:
    """(doc_a, doc_b, gram, c) for word n-grams of column ``side``."""
    tk = ws_tokens(F.col(side)).alias("tk")
    base = pairs.select("doc_a", "doc_b", tk)
    if n == 1:
        g = F.explode("tk").alias("gram")
        flat = base.filter(F.size("tk") >= 1).select("doc_a", "doc_b", g)
    else:
        # guard BEFORE the sequence so its upper bound stays >= lower
        flat = base.filter(F.size("tk") >= n).select(
            "doc_a",
            "doc_b",
            F.explode(
                F.expr(
                    f"transform(sequence({n}, size(tk)), "
                    f"i -> concat_ws(' ', slice(tk, i - {n - 1}, {n})))"
                )
            ).alias("gram"),
        )
    return flat.groupBy("doc_a", "doc_b", "gram").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )


def _clipped(pairs, n: int):
    """Per pair: clipped match count m, candidate total tc, reference
    total tr for word n-grams (exact integers)."""
    ca = _gram_counts(pairs, "ta", n)
    cb = _gram_counts(pairs, "tb", n).withColumnRenamed("c", "cb")
    m = (
        ca.join(cb, ["doc_a", "doc_b", "gram"])
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.least(F.col("c"), F.col("cb"))).alias("m"))
    )
    tc = ca.groupBy("doc_a", "doc_b").agg(F.sum("c").alias("tc"))
    tr = cb.groupBy("doc_a", "doc_b").agg(F.sum("cb").alias("tr"))
    return m, tc, tr


def _ngram_sql(src: str, n: int, out: str) -> str:
    """DuckDB per-pair word-n-gram counts CTE body over pr.{src}."""
    if n == 1:
        gram = "toks[i]"
        lo = "1"
    else:
        gram = " || ' ' || ".join(
            f"toks[i - {n - 1 - j}]" for j in range(n)
        )
        lo = str(n)
    return f"""
{out} AS (
    SELECT doc_a, doc_b, {gram} AS gram, count(*)::BIGINT AS c
    FROM (
        SELECT doc_a, doc_b, toks,
               unnest(generate_series({lo}, len(toks))) AS i
        FROM (SELECT doc_a, doc_b,
                     list_filter(string_split_regex(trim({src}), '\\s+'),
                                 x -> len(x) > 0) AS toks
              FROM pr) t
        WHERE len(toks) >= {n}
    ) g
    GROUP BY 1, 2, 3
)"""


# --- ROUGE-2 -----------------------------------------------------------------
# Lin 2004: recall = clipped bigram matches / reference bigrams; the
# F1 reduces to the exact integer ratio 2m/(tc+tr).

_ROUGE_ORACLE = f"""
WITH {_PAIR_CTE},
{_ngram_sql('ta', 2, 'ga')},
{_ngram_sql('tb', 2, 'gb')},
mt AS (
    SELECT ga.doc_a, ga.doc_b, sum(least(ga.c, gb.c))::BIGINT AS m
    FROM ga JOIN gb ON gb.doc_a = ga.doc_a AND gb.doc_b = ga.doc_b
                   AND gb.gram = ga.gram
    GROUP BY 1, 2
),
tc AS (SELECT doc_a, doc_b, sum(c)::BIGINT AS tc FROM ga GROUP BY 1, 2),
tr AS (SELECT doc_a, doc_b, sum(c)::BIGINT AS tr FROM gb GROUP BY 1, 2)
SELECT p.doc_a, p.doc_b,
       coalesce(mt.m, 0)::BIGINT AS n_match,
       coalesce(tc.tc, 0)::BIGINT AS n_cand,
       coalesce(tr.tr, 0)::BIGINT AS n_ref,
       CASE WHEN coalesce(tr.tr, 0) = 0 THEN 0.0
            ELSE round(coalesce(mt.m, 0) * 1.0 / tr.tr * 10000) / 10000
       END + 0.0 AS rouge2_recall,
       CASE WHEN coalesce(tc.tc, 0) + coalesce(tr.tr, 0) = 0 THEN 0.0
            ELSE round(2.0 * coalesce(mt.m, 0)
                       / (coalesce(tc.tc, 0) + coalesce(tr.tr, 0))
                       * 10000) / 10000
       END + 0.0 AS rouge2_f1
FROM pr p
LEFT JOIN mt ON mt.doc_a = p.doc_a AND mt.doc_b = p.doc_b
LEFT JOIN tc ON tc.doc_a = p.doc_a AND tc.doc_b = p.doc_b
LEFT JOIN tr ON tr.doc_a = p.doc_a AND tr.doc_b = p.doc_b
ORDER BY p.doc_a, p.doc_b
"""


@register("rouge2_pair_overlap", oracle=_ROUGE_ORACLE)
def rouge2_pair_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _pair_df(spark, sf_dir).persist()
    m, tc, tr = _clipped(pairs, 2)
    keys = ["doc_a", "doc_b"]
    out = (
        pairs.select(*keys)
        .join(m, keys, "left")
        .join(tc, keys, "left")
        .join(tr, keys, "left")
        .select(
            *keys,
            F.coalesce(F.col("m"), F.lit(0)).cast("long").alias("n_match"),
            F.coalesce(F.col("tc"), F.lit(0)).cast("long").alias("n_cand"),
            F.coalesce(F.col("tr"), F.lit(0)).cast("long").alias("n_ref"),
            F.when(F.coalesce(F.col("tr"), F.lit(0)) == 0, F.lit(0.0))
            .otherwise(
                R.r(F.coalesce(F.col("m"), F.lit(0)) * 1.0 / F.col("tr"), 4)
            )
            .alias("rouge2_recall"),
            F.when(
                F.coalesce(F.col("tc"), F.lit(0))
                + F.coalesce(F.col("tr"), F.lit(0))
                == 0,
                F.lit(0.0),
            )
            .otherwise(
                R.r(
                    F.lit(2.0)
                    * F.coalesce(F.col("m"), F.lit(0))
                    / (
                        F.coalesce(F.col("tc"), F.lit(0))
                        + F.coalesce(F.col("tr"), F.lit(0))
                    ),
                    4,
                )
            )
            .alias("rouge2_f1"),
        )
        .orderBy(*keys)
    )
    rows = out.collect()
    pairs.unpersist()
    return spark.createDataFrame(rows, out.schema)


# --- smoothed log-BLEU-2 ------------------------------------------------------
# Papineni 2002 with +1 smoothing on both modified precisions so zero
# matches stay finite: log BLEU-2 = ½(ln p1 + ln p2) + min(0, 1 − r/c).
# ln of identical exact rationals, snapped to integer 1e-8 units in
# both engines (the llm_text9 LM pattern); the brevity term is an
# exact-rational double, snapped the same way. Pairs whose candidate
# has no tokens are reported with NULL score (nothing to score).

_BLEU_ORACLE = f"""
WITH {_PAIR_CTE},
{_ngram_sql('ta', 1, 'ua')},
{_ngram_sql('tb', 1, 'ub')},
{_ngram_sql('ta', 2, 'ga')},
{_ngram_sql('tb', 2, 'gb')},
m1 AS (
    SELECT ua.doc_a, ua.doc_b, sum(least(ua.c, ub.c))::BIGINT AS m
    FROM ua JOIN ub ON ub.doc_a = ua.doc_a AND ub.doc_b = ua.doc_b
                   AND ub.gram = ua.gram GROUP BY 1, 2
),
m2 AS (
    SELECT ga.doc_a, ga.doc_b, sum(least(ga.c, gb.c))::BIGINT AS m
    FROM ga JOIN gb ON gb.doc_a = ga.doc_a AND gb.doc_b = ga.doc_b
                   AND gb.gram = ga.gram GROUP BY 1, 2
),
c1 AS (SELECT doc_a, doc_b, sum(c)::BIGINT AS t FROM ua GROUP BY 1, 2),
c2 AS (SELECT doc_a, doc_b, sum(c)::BIGINT AS t FROM ga GROUP BY 1, 2),
r1 AS (SELECT doc_a, doc_b, sum(c)::BIGINT AS t FROM ub GROUP BY 1, 2),
u AS (
    SELECT p.doc_a, p.doc_b,
           coalesce(m1.m, 0) AS m1, coalesce(c1.t, 0) AS c1,
           coalesce(m2.m, 0) AS m2, coalesce(c2.t, 0) AS c2,
           coalesce(r1.t, 0) AS r
    FROM pr p
    LEFT JOIN m1 ON m1.doc_a = p.doc_a AND m1.doc_b = p.doc_b
    LEFT JOIN m2 ON m2.doc_a = p.doc_a AND m2.doc_b = p.doc_b
    LEFT JOIN c1 ON c1.doc_a = p.doc_a AND c1.doc_b = p.doc_b
    LEFT JOIN c2 ON c2.doc_a = p.doc_a AND c2.doc_b = p.doc_b
    LEFT JOIN r1 ON r1.doc_a = p.doc_a AND r1.doc_b = p.doc_b
)
SELECT doc_a, doc_b, m1 AS n_match1, m2 AS n_match2,
       c1 AS n_cand_toks, r AS n_ref_toks,
       CASE WHEN c1 = 0 THEN NULL
            ELSE round((
              CAST(round(ln((m1 + 1.0) / (c1 + 1.0)) * 100000000) AS BIGINT)
            + CAST(round(ln((m2 + 1.0) / (c2 + 1.0)) * 100000000) AS BIGINT)
            + 2 * CAST(round(least(0.0, 1.0 - r * 1.0 / c1) * 100000000)
                       AS BIGINT)
            ) / 200000000.0 * 10000) / 10000 + 0.0
       END AS log_bleu2
FROM u
ORDER BY doc_a, doc_b
"""


@register("log_bleu2_pair_overlap", oracle=_BLEU_ORACLE)
def log_bleu2_pair_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _pair_df(spark, sf_dir).persist()
    m1, c1, r1 = _clipped(pairs, 1)
    m2, c2, _ = _clipped(pairs, 2)
    keys = ["doc_a", "doc_b"]

    def nz(c):
        return F.coalesce(c, F.lit(0))

    u = (
        pairs.select(*keys)
        .join(m1.withColumnRenamed("m", "m1"), keys, "left")
        .join(c1.withColumnRenamed("tc", "c1"), keys, "left")
        .join(r1.withColumnRenamed("tr", "r"), keys, "left")
        .join(m2.withColumnRenamed("m", "m2"), keys, "left")
        .join(c2.withColumnRenamed("tc", "c2"), keys, "left")
        .select(
            *keys,
            nz(F.col("m1")).alias("m1"),
            nz(F.col("c1")).alias("c1"),
            nz(F.col("m2")).alias("m2"),
            nz(F.col("c2")).alias("c2"),
            nz(F.col("r")).alias("r"),
        )
    )
    s1 = F.round(
        F.log((F.col("m1") + 1.0) / (F.col("c1") + 1.0)) * 1e8
    ).cast("long")
    s2 = F.round(
        F.log((F.col("m2") + 1.0) / (F.col("c2") + 1.0)) * 1e8
    ).cast("long")
    bp = F.round(
        F.least(F.lit(0.0), 1.0 - F.col("r") * 1.0 / F.col("c1")) * 1e8
    ).cast("long")
    out = u.select(
        *keys,
        F.col("m1").cast("long").alias("n_match1"),
        F.col("m2").cast("long").alias("n_match2"),
        F.col("c1").cast("long").alias("n_cand_toks"),
        F.col("r").cast("long").alias("n_ref_toks"),
        F.when(F.col("c1") == 0, F.lit(None).cast("double"))
        .otherwise(R.r((s1 + s2 + 2 * bp) / 2e8, 4))
        .alias("log_bleu2"),
    ).orderBy(*keys)
    rows = out.collect()
    pairs.unpersist()
    return spark.createDataFrame(rows, out.schema)


# --- chrF-3 (β = 2) -----------------------------------------------------------
# Popović 2015 on character 3-grams of the raw text: with P = m/tc and
# R = m/tr, F_{{β=2}} = 5PR/(4P+R) reduces to the EXACT integer ratio
# 5m/(4·tr + tc) — no transcendental anywhere.

_CHRF_ORACLE = f"""
WITH {_PAIR_CTE},
ka AS (
    SELECT doc_a, doc_b, substr(ta, i, 3) AS gram, count(*)::BIGINT AS c
    FROM (SELECT doc_a, doc_b, ta,
                 unnest(generate_series(1, len(ta) - 2)) AS i
          FROM pr WHERE len(ta) >= 3) t
    GROUP BY 1, 2, 3
),
kb AS (
    SELECT doc_a, doc_b, substr(tb, i, 3) AS gram, count(*)::BIGINT AS c
    FROM (SELECT doc_a, doc_b, tb,
                 unnest(generate_series(1, len(tb) - 2)) AS i
          FROM pr WHERE len(tb) >= 3) t
    GROUP BY 1, 2, 3
),
mt AS (
    SELECT ka.doc_a, ka.doc_b, sum(least(ka.c, kb.c))::BIGINT AS m
    FROM ka JOIN kb ON kb.doc_a = ka.doc_a AND kb.doc_b = ka.doc_b
                   AND kb.gram = ka.gram GROUP BY 1, 2
),
tc AS (SELECT doc_a, doc_b, sum(c)::BIGINT AS tc FROM ka GROUP BY 1, 2),
tr AS (SELECT doc_a, doc_b, sum(c)::BIGINT AS tr FROM kb GROUP BY 1, 2)
SELECT p.doc_a, p.doc_b,
       coalesce(mt.m, 0)::BIGINT AS n_match,
       coalesce(tc.tc, 0)::BIGINT AS n_cand,
       coalesce(tr.tr, 0)::BIGINT AS n_ref,
       CASE WHEN 4 * coalesce(tr.tr, 0) + coalesce(tc.tc, 0) = 0 THEN 0.0
            ELSE round(5.0 * coalesce(mt.m, 0)
                       / (4 * coalesce(tr.tr, 0) + coalesce(tc.tc, 0))
                       * 10000) / 10000
       END + 0.0 AS chrf3_beta2
FROM pr p
LEFT JOIN mt ON mt.doc_a = p.doc_a AND mt.doc_b = p.doc_b
LEFT JOIN tc ON tc.doc_a = p.doc_a AND tc.doc_b = p.doc_b
LEFT JOIN tr ON tr.doc_a = p.doc_a AND tr.doc_b = p.doc_b
ORDER BY p.doc_a, p.doc_b
"""


def _char_grams(pairs: DataFrame, side: str) -> DataFrame:
    return (
        pairs.filter(F.length(side) >= 3)
        .select(
            "doc_a",
            "doc_b",
            F.explode(
                F.expr(
                    f"transform(sequence(1, length({side}) - 2), "
                    f"i -> substr({side}, i, 3))"
                )
            ).alias("gram"),
        )
        .groupBy("doc_a", "doc_b", "gram")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


@register("chrf3_pair_overlap", oracle=_CHRF_ORACLE)
def chrf3_pair_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _pair_df(spark, sf_dir).persist()
    ka = _char_grams(pairs, "ta")
    kb = _char_grams(pairs, "tb").withColumnRenamed("c", "cb")
    keys = ["doc_a", "doc_b"]
    m = (
        ka.join(kb, keys + ["gram"])
        .groupBy(*keys)
        .agg(F.sum(F.least(F.col("c"), F.col("cb"))).alias("m"))
    )
    tc = ka.groupBy(*keys).agg(F.sum("c").alias("tc"))
    tr = kb.groupBy(*keys).agg(F.sum("cb").alias("tr"))
    nzm = F.coalesce(F.col("m"), F.lit(0))
    nzc = F.coalesce(F.col("tc"), F.lit(0))
    nzr = F.coalesce(F.col("tr"), F.lit(0))
    out = (
        pairs.select(*keys)
        .join(m, keys, "left")
        .join(tc, keys, "left")
        .join(tr, keys, "left")
        .select(
            *keys,
            nzm.cast("long").alias("n_match"),
            nzc.cast("long").alias("n_cand"),
            nzr.cast("long").alias("n_ref"),
            F.when(4 * nzr + nzc == 0, F.lit(0.0))
            .otherwise(R.r(F.lit(5.0) * nzm / (4 * nzr + nzc), 4))
            .alias("chrf3_beta2"),
        )
        .orderBy(*keys)
    )
    rows = out.collect()
    pairs.unpersist()
    return spark.createDataFrame(rows, out.schema)


# --- blocked Levenshtein linkage ----------------------------------------------
# The classic record-linkage primitive: a fixed 32-probe hash sample
# of part names, blocked on p_brand (never all-pairs), edit distance
# <= 3, top-20 closest matches with full deterministic tie-break.
# Both engines run the classic unweighted Wagner-Fischer DP.

_LEV_PROBES = 32
_LEV_MAX_DIST = 3
_LEV_TOPN = 20
_LEV_HASH_DUCK = _H.duck_hash_uint(_H.sql_salted("p_partkey", "'lev'"), 8)

_LEV_ORACLE = f"""
WITH probe AS (
    SELECT p_partkey AS probe_key, p_name AS probe_name,
           p_brand AS probe_brand
    FROM part
    ORDER BY {_LEV_HASH_DUCK}, p_partkey LIMIT {_LEV_PROBES}
),
cand AS (
    SELECT probe_key, probe_name, p.p_partkey AS match_key,
           p.p_name AS match_name,
           levenshtein(probe_name, p.p_name)::BIGINT AS dist
    FROM probe JOIN part p ON p.p_brand = probe_brand
                          AND p.p_partkey <> probe_key
)
SELECT probe_key, probe_name, match_key, match_name, dist
FROM cand
WHERE dist <= {_LEV_MAX_DIST}
ORDER BY dist, probe_key, match_key
LIMIT {_LEV_TOPN}
"""


@register("levenshtein_blocked_linkage", oracle=_LEV_ORACLE)
def levenshtein_blocked_linkage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    part = read_table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_brand"
    )
    probe = (
        part.orderBy(
            _H.hash_uint(F.col("p_partkey"), "lev", 8), F.asc("p_partkey")
        )
        .limit(_LEV_PROBES)
        .select(
            F.col("p_partkey").alias("probe_key"),
            F.col("p_name").alias("probe_name"),
            F.col("p_brand").alias("probe_brand"),
        )
    )
    cand = F.broadcast(probe).join(
        part,
        (F.col("p_brand") == F.col("probe_brand"))
        & (F.col("p_partkey") != F.col("probe_key")),
    )
    return (
        cand.select(
            "probe_key",
            "probe_name",
            F.col("p_partkey").alias("match_key"),
            F.col("p_name").alias("match_name"),
            F.levenshtein(F.col("probe_name"), F.col("p_name"))
            .cast("long")
            .alias("dist"),
        )
        .filter(F.col("dist") <= _LEV_MAX_DIST)
        .orderBy(F.asc("dist"), F.asc("probe_key"), F.asc("match_key"))
        .limit(_LEV_TOPN)
    )
