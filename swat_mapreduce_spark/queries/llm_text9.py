"""Round-10 text pack: n-gram backoff scoring, contrastive data
selection, readability, sliding lexical diversity, and multi-rater
agreement — filling the named-method gaps around the existing LM
(Kneser-Ney, Jelinek-Mercer, charlm) and quality families.

Determinism: every log-probability is snapped to integer 1e-8 units
(``round(ln(p)·1e8)`` as int64) before any weighted sum, the ln inputs
are identical exact rationals in both engines (integer count ratios),
and every top-k cut carries a doc_id tie-break. Scale: model tables
are corpus-count-bounded and joined by key (one shuffle each); per-doc
n-gram streams are exploded from the array domain with upstream size
filters guarding the sequence bounds (CLAUDE.md gotcha 10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from swat_mapreduce_spark.functions import rounding as R
from swat_mapreduce_spark.functions.text import ws_tokens
from swat_mapreduce_spark.queries import register
from swat_mapreduce_spark.sources.readers import read_table

_DUCK_TOKS = (
    r"list_filter(string_split_regex(trim(text), '\s+'), x -> len(x) > 0)"
)

# --- Stupid Backoff trigram scoring (Brants et al. 2007) --------------------
# The web-scale LM smoothing: no normalization, just score
# S(w3|w1w2) = c123/c12, backing off to 0.4·c23/c2, then 0.4²·c3/N.
# Model trained on the EVEN doc_ids, scored on the ODD half so the
# backoff path is actually exercised; trigrams whose w3 is out of the
# training vocab are counted (n_oov) and excluded from the mean
# (ln(0) is undefined on both engines).

_SB_ALPHA = 0.4

_SB_ORACLE = rf"""
WITH tk AS (
    SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents
),
train AS (
    SELECT doc_id, toks, unnest(generate_series(3, len(toks))) AS i
    FROM tk WHERE doc_id % 2 = 0 AND len(toks) >= 3
),
tri AS (
    SELECT toks[i-2] AS w1, toks[i-1] AS w2, toks[i] AS w3,
           count(*)::BIGINT AS c123
    FROM train GROUP BY 1, 2, 3
),
bi AS (
    SELECT w1, w2, sum(c123)::BIGINT AS c12 FROM tri GROUP BY 1, 2
),
bi23 AS (
    SELECT w2, w3, sum(c123)::BIGINT AS c23 FROM tri GROUP BY 1, 2
),
uni2 AS (SELECT w2, sum(c23)::BIGINT AS c2 FROM bi23 GROUP BY 1),
uni3 AS (SELECT w3, sum(c23)::BIGINT AS c3 FROM bi23 GROUP BY 1),
nn AS (SELECT sum(c3)::BIGINT AS n FROM uni3),
test AS (
    SELECT doc_id, toks, unnest(generate_series(3, len(toks))) AS i
    FROM tk WHERE doc_id % 2 = 1 AND len(toks) >= 3
),
flat AS (
    SELECT doc_id, toks[i-2] AS w1, toks[i-1] AS w2, toks[i] AS w3
    FROM test
),
scored AS (
    SELECT f.doc_id,
           CASE WHEN u3.c3 IS NULL THEN NULL
                WHEN t.c123 IS NOT NULL
                    THEN CAST(round(ln(t.c123 * 1.0 / b.c12) * 100000000)
                              AS BIGINT)
                WHEN b23.c23 IS NOT NULL
                    THEN CAST(round(ln({_SB_ALPHA} * b23.c23 / u2.c2)
                                    * 100000000) AS BIGINT)
                ELSE CAST(round(ln({_SB_ALPHA} * {_SB_ALPHA} * u3.c3
                                   / nn.n) * 100000000) AS BIGINT)
           END AS lp_u
    FROM flat f
    LEFT JOIN tri t ON t.w1 = f.w1 AND t.w2 = f.w2 AND t.w3 = f.w3
    LEFT JOIN bi b ON b.w1 = f.w1 AND b.w2 = f.w2
    LEFT JOIN bi23 b23 ON b23.w2 = f.w2 AND b23.w3 = f.w3
    LEFT JOIN uni2 u2 ON u2.w2 = f.w2
    LEFT JOIN uni3 u3 ON u3.w3 = f.w3
    CROSS JOIN nn
)
SELECT doc_id,
       count(lp_u)::BIGINT AS n_scored,
       (count(*) - count(lp_u))::BIGINT AS n_oov,
       round(-sum(lp_u)::DOUBLE / 100000000 / count(lp_u) * 10000) / 10000
           + 0.0 AS avg_nll
FROM scored
GROUP BY doc_id
"""


@register("stupid_backoff_trigram", oracle=_SB_ORACLE)
def stupid_backoff_trigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", ws_tokens(F.col("text")).alias("toks")
    )

    def trigrams(df):
        # upstream size filter is the gotcha-10 guard for sequence(3, n)
        return df.filter(F.size("toks") >= 3).select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(3, size(toks)), i -> struct("
                    "element_at(toks, i - 2) as w1,"
                    "element_at(toks, i - 1) as w2,"
                    "element_at(toks, i) as w3))"
                )
            ).alias("g"),
        ).select("doc_id", "g.w1", "g.w2", "g.w3")

    tri = (
        trigrams(docs.filter(F.col("doc_id") % 2 == 0))
        .groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).cast("long").alias("c123"))
    )
    tri = tri.persist()
    bi = tri.groupBy("w1", "w2").agg(F.sum("c123").cast("long").alias("c12"))
    bi23 = tri.groupBy("w2", "w3").agg(
        F.sum("c123").cast("long").alias("c23")
    )
    bi23 = bi23.persist()
    uni2 = bi23.groupBy("w2").agg(F.sum("c23").cast("long").alias("c2"))
    uni3 = bi23.groupBy("w3").agg(F.sum("c23").cast("long").alias("c3"))
    nn = uni3.agg(F.sum("c3").cast("long").alias("n"))
    flat = trigrams(docs.filter(F.col("doc_id") % 2 == 1))
    u = F.lit(100000000.0)
    lp_u = F.when(F.col("c3").isNull(), F.lit(None).cast("long")).when(
        F.col("c123").isNotNull(),
        F.round(F.log(F.col("c123") * F.lit(1.0) / F.col("c12")) * u)
        .cast("long"),
    ).when(
        F.col("c23").isNotNull(),
        F.round(F.log(F.lit(_SB_ALPHA) * F.col("c23") / F.col("c2")) * u)
        .cast("long"),
    ).otherwise(
        F.round(
            F.log(
                F.lit(_SB_ALPHA) * F.lit(_SB_ALPHA) * F.col("c3")
                / F.col("n")
            )
            * u
        ).cast("long")
    )
    scored = (
        flat.join(tri, ["w1", "w2", "w3"], "left")
        .join(bi, ["w1", "w2"], "left")
        .join(bi23, ["w2", "w3"], "left")
        .join(uni2, ["w2"], "left")
        .join(uni3, ["w3"], "left")
        .crossJoin(F.broadcast(nn))
        .select("doc_id", lp_u.alias("lp_u"))
    )
    return scored.groupBy("doc_id").agg(
        F.count("lp_u").cast("long").alias("n_scored"),
        (F.count(F.lit(1)) - F.count("lp_u")).cast("long").alias("n_oov"),
        R.r(
            -F.sum("lp_u").cast("double")
            / F.lit(100000000)
            / F.count("lp_u"),
            4,
        ).alias("avg_nll"),
    )


# --- Moore-Lewis contrastive selection (Moore & Lewis 2010) -----------------
# Select data "like the in-domain corpus": score every document by
# H_in(doc) − H_out(doc) under two Laplace-smoothed char-bigram LMs
# (in-domain = lang 'en'); the most negative scores are the most
# in-domain-like. V is the union bigram domain; unseen bigrams get
# (0+1)/(t+V) — exactly the situation Laplace exists for.

_ML_ORACLE = """
WITH bg AS (
    SELECT doc_id, lang,
           unnest(list_transform(generate_series(1, length(text) - 1),
                                 i -> substring(text, i, 2))) AS b
    FROM documents WHERE length(text) >= 2
),
dbc AS (
    SELECT doc_id, b, count(*)::BIGINT AS c FROM bg GROUP BY 1, 2
),
m_in AS (
    SELECT b, count(*)::BIGINT AS c FROM bg WHERE lang = 'en' GROUP BY 1
),
m_out AS (SELECT b, count(*)::BIGINT AS c FROM bg GROUP BY 1),
t_in AS (SELECT sum(c)::BIGINT AS t FROM m_in),
t_out AS (SELECT sum(c)::BIGINT AS t FROM m_out),
v AS (SELECT count(*)::BIGINT AS v FROM m_out),
scored AS (
    SELECT d.doc_id,
           sum(d.c)::BIGINT AS nb,
           sum(d.c * CAST(round(ln((coalesce(mi.c, 0) + 1.0)
                                   / (t_in.t + v.v)) * 100000000)
                          AS BIGINT))::BIGINT AS in_u,
           sum(d.c * CAST(round(ln((mo.c + 1.0) / (t_out.t + v.v))
                                * 100000000) AS BIGINT))::BIGINT AS out_u
    FROM dbc d
    LEFT JOIN m_in mi ON mi.b = d.b
    JOIN m_out mo ON mo.b = d.b
    CROSS JOIN t_in CROSS JOIN t_out CROSS JOIN v
    GROUP BY d.doc_id
),
fin AS (
    SELECT doc_id, nb,
           round(-in_u * 1.0 / 100000000 / nb * 1000000) / 1000000 + 0.0
               AS h_in,
           round(-out_u * 1.0 / 100000000 / nb * 1000000) / 1000000 + 0.0
               AS h_out
    FROM scored
)
SELECT doc_id, nb AS n_bigrams, h_in, h_out,
       round((h_in - h_out) * 1000000) / 1000000 + 0.0 AS ml_score
FROM fin
ORDER BY ml_score, doc_id LIMIT 20
"""


@register("moore_lewis_selection", oracle=_ML_ORACLE)
def moore_lewis_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    from swat_mapreduce_spark.functions import text as T

    # split('')-based bigrams (r12): O(len) zip_with vs the O(len²)
    # per-index substring transform
    bg = (
        docs.filter(F.length("text") >= 2)
        .withColumn("cs", T.char_array(F.col("text")))
        .select(
            "doc_id",
            "lang",
            F.explode(T.char_bigrams_from("cs")).alias("b"),
        )
    )
    bg = bg.persist()
    dbc = bg.groupBy("doc_id", "b").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    m_in = (
        bg.filter(F.col("lang") == "en")
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("long").alias("ci"))
    )
    m_out = bg.groupBy("b").agg(F.count(F.lit(1)).cast("long").alias("co"))
    t_in = m_in.agg(F.sum("ci").cast("long").alias("ti"))
    t_out = m_out.agg(F.sum("co").cast("long").alias("to"))
    v = m_out.agg(F.count(F.lit(1)).cast("long").alias("v"))
    u = F.lit(100000000.0)
    in_u = F.round(
        F.log(
            (F.coalesce(F.col("ci"), F.lit(0)) + F.lit(1.0))
            / (F.col("ti") + F.col("v"))
        )
        * u
    ).cast("long")
    out_u = F.round(
        F.log((F.col("co") + F.lit(1.0)) / (F.col("to") + F.col("v"))) * u
    ).cast("long")
    scored = (
        dbc.join(F.broadcast(m_in), dbc["b"] == m_in["b"], "left")
        .drop(m_in["b"])
        .join(F.broadcast(m_out), "b")
        .crossJoin(F.broadcast(t_in))
        .crossJoin(F.broadcast(t_out))
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("nb"),
            F.sum(F.col("c") * in_u).cast("long").alias("in_u"),
            F.sum(F.col("c") * out_u).cast("long").alias("out_u"),
        )
    )
    fin = scored.select(
        "doc_id",
        F.col("nb").alias("n_bigrams"),
        R.r(-F.col("in_u") * F.lit(1.0) / 100000000 / F.col("nb"), 6)
        .alias("h_in"),
        R.r(-F.col("out_u") * F.lit(1.0) / 100000000 / F.col("nb"), 6)
        .alias("h_out"),
    ).withColumn(
        "ml_score", R.r(F.col("h_in") - F.col("h_out"), 6)
    )
    return fin.orderBy(F.asc("ml_score"), F.asc("doc_id")).limit(20)


# --- Flesch reading ease (vowel-run syllable proxy) --------------------------
# FRE = 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words);
# syllables per word = max(1, count of [aeiouy]+ runs), sentences =
# max(1, count of [.!?]+ runs — the synthetic corpus has none, so the
# whole doc counts as one sentence; the formula degrades gracefully).
# All three inputs are exact integers; the per-doc score is identical
# double arithmetic, bucketed into the standard bands.

_FLESCH_ORACLE = rf"""
WITH t AS (
    SELECT doc_id, {_DUCK_TOKS} AS toks,
           greatest(1, len(regexp_extract_all(text, '[.!?]+')))::BIGINT
               AS sents
    FROM documents
),
syl AS (
    SELECT doc_id, sents, len(toks)::BIGINT AS words,
           list_sum(list_transform(toks,
               w -> greatest(1, len(regexp_extract_all(lower(w),
                                                       '[aeiouy]+')))))
               ::BIGINT AS syls
    FROM t WHERE len(toks) > 0
),
fre AS (
    SELECT doc_id,
           206.835 - 1.015 * (words * 1.0 / sents)
                   - 84.6 * (syls * 1.0 / words) AS fre
    FROM syl
),
banded AS (
    SELECT CASE WHEN fre >= 90 THEN 'very_easy'
                WHEN fre >= 70 THEN 'easy'
                WHEN fre >= 50 THEN 'medium'
                WHEN fre >= 30 THEN 'difficult'
                ELSE 'very_difficult' END AS band,
           CAST(round(fre * 1000000) AS BIGINT) AS fre_u
    FROM fre
)
SELECT band, count(*)::BIGINT AS n_docs,
       round(sum(fre_u)::DOUBLE / 1000000 / count(*) * 10000) / 10000
           + 0.0 AS avg_fre
FROM banded GROUP BY band
"""


@register("flesch_reading_ease", oracle=_FLESCH_ORACLE)
def flesch_reading_ease(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        ws_tokens(F.col("text")).alias("toks"),
        F.greatest(
            F.lit(1), F.expr("regexp_count(text, '[.!?]+')")
        ).cast("long").alias("sents"),
    ).filter(F.size("toks") > 0)
    syl = t.select(
        "doc_id",
        "sents",
        F.size("toks").cast("long").alias("words"),
        F.expr(
            "aggregate(transform(toks, w -> greatest(1, "
            "size(regexp_extract_all(lower(w), '[aeiouy]+', 0)))), "
            "0L, (a, x) -> a + x)"
        ).alias("syls"),
    )
    fre = (
        F.lit(206.835)
        - F.lit(1.015) * (F.col("words") * F.lit(1.0) / F.col("sents"))
        - F.lit(84.6) * (F.col("syls") * F.lit(1.0) / F.col("words"))
    )
    banded = syl.select(
        F.when(fre >= 90, "very_easy")
        .when(fre >= 70, "easy")
        .when(fre >= 50, "medium")
        .when(fre >= 30, "difficult")
        .otherwise("very_difficult")
        .alias("band"),
        F.round(fre * F.lit(1000000)).cast("long").alias("fre_u"),
    )
    return banded.groupBy("band").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        R.r(
            F.sum("fre_u").cast("double") / F.lit(1000000)
            / F.count(F.lit(1)),
            4,
        ).alias("avg_fre"),
    )


# --- MATTR sliding-window lexical diversity (Covington & McFall 2010) -------
# Moving-average type-token ratio at window w=16: the windowed answer
# to "TTR shrinks with length". Computed WITHOUT enumerating windows:
# token occurrence j is a first-occurrence in exactly
# max(0, min(j, L−w+1) − max(p_j+1, j−w+1, 1) + 1) windows (p_j = the
# previous position of the same token), so Σ over tokens = Σ over
# windows of the distinct count — all exact integers from one
# doc-keyed lag window.

_MATTR_W = 16

_MATTR_ORACLE = rf"""
WITH t AS (
    SELECT doc_id, source, {_DUCK_TOKS} AS toks FROM documents
),
pos AS (
    SELECT doc_id, source, len(toks)::BIGINT AS l,
           unnest(generate_series(1, len(toks))) AS j, toks
    FROM t WHERE len(toks) >= {_MATTR_W}
),
occ AS (
    SELECT doc_id, source, l, j,
           coalesce(lag(j) OVER (PARTITION BY doc_id, toks[j]
                                 ORDER BY j), 0) AS p
    FROM pos
),
contrib AS (
    SELECT doc_id, source, l,
           greatest(0, least(j, l - {_MATTR_W} + 1)
                       - greatest(p + 1, j - {_MATTR_W} + 1, 1) + 1)
               AS c
    FROM occ
),
per_doc AS (
    SELECT doc_id, source,
           CAST(round(sum(c) * 1.0
                      / ({_MATTR_W} * (min(l) - {_MATTR_W} + 1))
                      * 100000000) AS BIGINT) AS mattr_u
    FROM contrib GROUP BY doc_id, source
)
SELECT source, count(*)::BIGINT AS n_docs_scored,
       round(sum(mattr_u)::DOUBLE / 100000000 / count(*) * 1000000)
           / 1000000 + 0.0 AS mean_mattr
FROM per_doc GROUP BY source
"""


@register("mattr_lexical_diversity", oracle=_MATTR_ORACLE)
def mattr_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = _MATTR_W
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", ws_tokens(F.col("text")).alias("toks")
    )
    pos = docs.filter(F.size("toks") >= w).select(
        "doc_id",
        "source",
        F.size("toks").cast("long").alias("l"),
        F.posexplode("toks").alias("j0", "tok"),
    ).select(
        "doc_id", "source", "l", (F.col("j0") + 1).alias("j"), "tok"
    )
    occ = pos.select(
        "doc_id",
        "source",
        "l",
        "j",
        F.coalesce(
            F.lag("j").over(
                Window.partitionBy("doc_id", "tok").orderBy("j")
            ),
            F.lit(0),
        ).alias("p"),
    )
    contrib = occ.select(
        "doc_id",
        "source",
        "l",
        F.greatest(
            F.lit(0),
            F.least(F.col("j"), F.col("l") - w + 1)
            - F.greatest(F.col("p") + 1, F.col("j") - w + 1, F.lit(1))
            + 1,
        ).alias("c"),
    )
    per_doc = contrib.groupBy("doc_id", "source").agg(
        F.round(
            F.sum("c")
            * F.lit(1.0)
            / (F.lit(w) * (F.min("l") - w + 1))
            * F.lit(100000000)
        )
        .cast("long")
        .alias("mattr_u")
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs_scored"),
        R.r(
            F.sum("mattr_u").cast("double") / F.lit(100000000)
            / F.count(F.lit(1)),
            6,
        ).alias("mean_mattr"),
    )


# --- Fleiss' kappa across three quality filters ------------------------------
# Multi-rater chance-corrected agreement (the m>2 generalization of
# Cohen's kappa already registered): three deterministic binary
# "raters" — length >= 300 chars, stopword share >= 10%, token count
# >= 30 — over every document. All P terms are exact integer ratios.

_FK_STOPS = "('the','a','of','and','to','in','is')"

_FLEISS_ORACLE = rf"""
WITH t AS (
    SELECT doc_id, n_chars, {_DUCK_TOKS} AS tk FROM documents
),
r AS (
    SELECT (n_chars >= 300)::INT
           + (len(list_filter(tk, x -> x IN {_FK_STOPS})) * 10
              >= len(tk))::INT
           + (len(tk) >= 30)::INT AS yes
    FROM t WHERE len(tk) > 0
),
agg AS (
    SELECT count(*)::BIGINT AS n,
           sum(CASE WHEN yes = 0 THEN 1 ELSE 0 END)::BIGINT AS n_yes0,
           sum(CASE WHEN yes = 1 THEN 1 ELSE 0 END)::BIGINT AS n_yes1,
           sum(CASE WHEN yes = 2 THEN 1 ELSE 0 END)::BIGINT AS n_yes2,
           sum(CASE WHEN yes = 3 THEN 1 ELSE 0 END)::BIGINT AS n_yes3,
           sum(yes * (yes - 1) + (3 - yes) * (2 - yes))::BIGINT AS agree_u,
           sum(yes)::BIGINT AS tot_yes
    FROM r
),
k AS (
    SELECT n, n_yes0, n_yes1, n_yes2, n_yes3,
           agree_u * 1.0 / (n * 6) AS p_bar,
           (tot_yes * 1.0 / (3 * n)) * (tot_yes * 1.0 / (3 * n))
           + (1 - tot_yes * 1.0 / (3 * n))
             * (1 - tot_yes * 1.0 / (3 * n)) AS p_e
    FROM agg
)
SELECT n AS n_docs, n_yes0, n_yes1, n_yes2, n_yes3,
       round(p_bar * 1000000) / 1000000 + 0.0 AS p_bar,
       round(p_e * 1000000) / 1000000 + 0.0 AS p_e,
       round((p_bar - p_e) / (1 - p_e) * 1000000) / 1000000 + 0.0
           AS fleiss_kappa
FROM k
"""


@register("fleiss_kappa_filters", oracle=_FLEISS_ORACLE)
def fleiss_kappa_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", ws_tokens(F.col("text")).alias("tk")
    ).filter(F.size("tk") > 0)
    stops = F.array(
        *[F.lit(s) for s in ["the", "a", "of", "and", "to", "in", "is"]]
    )
    nstop = F.size(F.filter("tk", lambda x: F.array_contains(stops, x)))
    yes = (
        (F.col("n_chars") >= 300).cast("int")
        + (nstop * 10 >= F.size("tk")).cast("int")
        + (F.size("tk") >= 30).cast("int")
    )
    r = docs.select(yes.alias("yes"))
    agg = r.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("yes") == 0, 1).otherwise(0))
        .cast("long").alias("n_yes0"),
        F.sum(F.when(F.col("yes") == 1, 1).otherwise(0))
        .cast("long").alias("n_yes1"),
        F.sum(F.when(F.col("yes") == 2, 1).otherwise(0))
        .cast("long").alias("n_yes2"),
        F.sum(F.when(F.col("yes") == 3, 1).otherwise(0))
        .cast("long").alias("n_yes3"),
        F.sum(
            F.col("yes") * (F.col("yes") - 1)
            + (3 - F.col("yes")) * (2 - F.col("yes"))
        ).cast("long").alias("agree_u"),
        F.sum("yes").cast("long").alias("tot_yes"),
    )
    p_bar = F.col("agree_u") * F.lit(1.0) / (F.col("n") * 6)
    py = F.col("tot_yes") * F.lit(1.0) / (3 * F.col("n"))
    p_e = py * py + (1 - py) * (1 - py)
    return agg.select(
        F.col("n").alias("n_docs"),
        "n_yes0",
        "n_yes1",
        "n_yes2",
        "n_yes3",
        R.r(p_bar, 6).alias("p_bar"),
        R.r(p_e, 6).alias("p_e"),
        R.r((p_bar - p_e) / (1 - p_e), 6).alias("fleiss_kappa"),
    )


# --- UMass topic coherence per source ----------------------------------------
# Mimno et al. 2011: treat each source's top-10 tokens (by in-source
# count, token tie-break) as its "topic" and score
# Σ_{i<j} ln((D(w_i, w_j) + 1) / D(w_j)) over rank-ordered pairs,
# where D() are corpus document frequencies — the intrinsic coherence
# number a topic-model pipeline reports. Pair volume is
# |sources|·C(10,2) = 900; co-document counts come from the distinct
# doc-token table restricted to the ≤200 topic tokens (broadcast
# semi-join), so nothing quadratic touches the corpus. Each ln is an
# exact integer ratio snapped to 1e-8 units before the order-free sum.

_UMASS_TOPK = 10

_UMASS_ORACLE = rf"""
WITH tok AS (
    SELECT doc_id, source, unnest({_DUCK_TOKS}) AS tok FROM documents
),
sc AS (
    SELECT source, tok, count(*)::BIGINT AS cnt FROM tok GROUP BY 1, 2
),
topic AS (
    SELECT source, tok, rnk FROM (
        SELECT source, tok,
               row_number() OVER (PARTITION BY source
                                  ORDER BY cnt DESC, tok) AS rnk
        FROM sc
    ) WHERE rnk <= {_UMASS_TOPK}
),
dt AS (SELECT DISTINCT doc_id, tok FROM tok),
df AS (
    SELECT t.tok, count(*)::BIGINT AS d
    FROM dt JOIN (SELECT DISTINCT tok FROM topic) t ON t.tok = dt.tok
    GROUP BY 1
),
pairs AS (
    SELECT a.source, a.tok AS wi, b.tok AS wj
    FROM topic a JOIN topic b
      ON b.source = a.source AND b.rnk < a.rnk
),
needed AS (SELECT DISTINCT wi, wj FROM pairs),
cod AS (
    SELECT n.wi, n.wj, count(*)::BIGINT AS d_ij
    FROM needed n
    JOIN dt da ON da.tok = n.wi
    JOIN dt db ON db.tok = n.wj AND db.doc_id = da.doc_id
    GROUP BY 1, 2
),
scored AS (
    SELECT p.source,
           CAST(round(ln((coalesce(c.d_ij, 0) + 1.0) / df.d) * 100000000)
                AS BIGINT) AS u
    FROM pairs p
    LEFT JOIN cod c ON c.wi = p.wi AND c.wj = p.wj
    JOIN df ON df.tok = p.wj
)
SELECT source, count(*)::BIGINT AS n_pairs,
       round(sum(u)::DOUBLE / 100000000 * 10000) / 10000 + 0.0
           AS umass_coherence
FROM scored GROUP BY source
"""


@register("umass_topic_coherence", oracle=_UMASS_ORACLE)
def umass_topic_coherence(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", ws_tokens(F.col("text")).alias("toks")
    )
    tok = docs.select("doc_id", "source", F.explode("toks").alias("tok"))
    tok = tok.persist()
    sc = tok.groupBy("source", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    topic = (
        sc.select(
            "source",
            "tok",
            F.row_number()
            .over(
                Window.partitionBy("source").orderBy(
                    F.desc("cnt"), F.asc("tok")
                )
            )
            .alias("rnk"),
        )
        .filter(F.col("rnk") <= _UMASS_TOPK)
    )
    topic = topic.persist()
    dt = tok.select("doc_id", "tok").distinct()
    dt = dt.persist()
    topic_toks = topic.select("tok").distinct()
    df = (
        dt.join(F.broadcast(topic_toks), "tok", "left_semi")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    a = topic.select("source", F.col("tok").alias("wi"),
                     F.col("rnk").alias("ri"))
    b = topic.select(
        F.col("source").alias("sb"), F.col("tok").alias("wj"),
        F.col("rnk").alias("rj"),
    )
    pairs = a.join(
        b, (F.col("sb") == F.col("source")) & (F.col("rj") < F.col("ri"))
    ).select("source", "wi", "wj")
    needed = pairs.select("wi", "wj").distinct()
    da = dt.select(F.col("doc_id").alias("d1"), F.col("tok").alias("wi"))
    db = dt.select(F.col("doc_id").alias("d2"), F.col("tok").alias("wj"))
    cod = (
        needed.join(da, "wi")
        .join(db, (F.col("d2") == F.col("d1")) & (db["wj"] == needed["wj"]))
        .groupBy(needed["wi"], needed["wj"])
        .agg(F.count(F.lit(1)).cast("long").alias("d_ij"))
    )
    scored = (
        pairs.join(F.broadcast(cod), ["wi", "wj"], "left")
        .join(
            F.broadcast(df.select(F.col("tok").alias("wj"), "d")), "wj"
        )
        .select(
            "source",
            F.round(
                F.log(
                    (F.coalesce(F.col("d_ij"), F.lit(0)) + F.lit(1.0))
                    / F.col("d")
                )
                * F.lit(100000000)
            )
            .cast("long")
            .alias("u"),
        )
    )
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        R.r(F.sum("u").cast("double") / F.lit(100000000), 4).alias(
            "umass_coherence"
        ),
    )


# --- Hill tail-index of the token frequency distribution ----------------------
# The standard heavy-tail estimator over the k = 20 largest token
# frequencies: H = (1/k)·Σ ln(f_(i)/f_(k+1)), α = 1/H — the
# quantitative companion to the registered Zipf rank-frequency plot.
# Frequencies rank with a token tie-break; each ln of an exact integer
# ratio snaps to 1e-8 units before the exact sum.

_HILL_K = 20

_HILL_ORACLE = rf"""
WITH tok AS (
    SELECT unnest({_DUCK_TOKS}) AS tok FROM documents
),
freq AS (SELECT tok, count(*)::BIGINT AS f FROM tok GROUP BY 1),
top AS (
    SELECT f, row_number() OVER (ORDER BY f DESC, tok) AS rnk
    FROM freq
),
ref AS (SELECT f AS fk1 FROM top WHERE rnk = {_HILL_K + 1}),
h AS (
    SELECT sum(CAST(round(ln(top.f * 1.0 / ref.fk1) * 100000000)
                    AS BIGINT))::BIGINT AS h_u
    FROM top, ref WHERE top.rnk <= {_HILL_K}
)
SELECT {_HILL_K}::BIGINT AS k,
       round(h_u * 1.0 / 100000000 / {_HILL_K} * 1000000) / 1000000 + 0.0
           AS hill_h,
       CASE WHEN h_u > 0 THEN
           round({_HILL_K} * 100000000.0 / h_u * 1000000) / 1000000 + 0.0
       END AS tail_alpha
FROM h
"""


@register("hill_tail_index_tokens", oracle=_HILL_ORACLE)
def hill_tail_index_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select(
        ws_tokens(F.col("text")).alias("toks")
    )
    freq = docs.select(F.explode("toks").alias("tok")).groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("f")
    )
    # distributed top-(k+1) cut FIRST (TakeOrderedAndProject — never a
    # global window over the whole vocab); the rank window then runs
    # on the 21-row result (zipf_rank_frequency pattern)
    cut = freq.orderBy(F.desc("f"), F.asc("tok")).limit(_HILL_K + 1)
    top = cut.select(
        "f",
        F.row_number()
        .over(Window.orderBy(F.desc("f"), F.asc("tok")))
        .alias("rnk"),
    )
    ref = top.filter(F.col("rnk") == _HILL_K + 1).select(
        F.col("f").alias("fk1")
    )
    h = (
        top.filter(F.col("rnk") <= _HILL_K)
        .crossJoin(F.broadcast(ref))
        .agg(
            F.sum(
                F.round(
                    F.log(F.col("f") * F.lit(1.0) / F.col("fk1"))
                    * F.lit(100000000)
                ).cast("long")
            ).cast("long").alias("h_u")
        )
    )
    return h.select(
        F.lit(_HILL_K).cast("long").alias("k"),
        R.r(F.col("h_u") * F.lit(1.0) / 100000000 / _HILL_K, 6)
        .alias("hill_h"),
        F.when(
            F.col("h_u") > 0,
            R.r(F.lit(_HILL_K) * F.lit(100000000.0) / F.col("h_u"), 6),
        ).alias("tail_alpha"),
    )


# --- Gwet's AC1 over the three quality filters ---------------------------------
# The prevalence-robust agreement coefficient (Gwet 2008) on the SAME
# 3-rater panel as fleiss_kappa_filters — kappa collapses under
# skewed marginals (the "kappa paradox"); AC1's chance term
# 2π(1−π) with π the overall yes-rate does not. Exact integer ratios.

_AC1_ORACLE = rf"""
WITH t AS (
    SELECT doc_id, n_chars, {_DUCK_TOKS} AS tk FROM documents
),
r AS (
    SELECT (n_chars >= 300)::INT
           + (len(list_filter(tk, x -> x IN {_FK_STOPS})) * 10
              >= len(tk))::INT
           + (len(tk) >= 30)::INT AS yes
    FROM t WHERE len(tk) > 0
),
agg AS (
    SELECT count(*)::BIGINT AS n,
           sum(yes * (yes - 1) + (3 - yes) * (2 - yes))::BIGINT AS agree_u,
           sum(yes)::BIGINT AS tot_yes
    FROM r
),
k AS (
    SELECT n,
           agree_u * 1.0 / (n * 6) AS p_a,
           2.0 * (tot_yes * 1.0 / (3 * n))
               * (1 - tot_yes * 1.0 / (3 * n)) AS p_e_gamma
    FROM agg
)
SELECT n AS n_docs,
       round(p_a * 1000000) / 1000000 + 0.0 AS p_a,
       round(p_e_gamma * 1000000) / 1000000 + 0.0 AS p_e_gamma,
       round((p_a - p_e_gamma) / (1 - p_e_gamma) * 1000000) / 1000000
           + 0.0 AS gwet_ac1
FROM k
"""


@register("gwet_ac1_filters", oracle=_AC1_ORACLE)
def gwet_ac1_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", ws_tokens(F.col("text")).alias("tk")
    ).filter(F.size("tk") > 0)
    stops = F.array(
        *[F.lit(s) for s in ["the", "a", "of", "and", "to", "in", "is"]]
    )
    nstop = F.size(F.filter("tk", lambda x: F.array_contains(stops, x)))
    yes = (
        (F.col("n_chars") >= 300).cast("int")
        + (nstop * 10 >= F.size("tk")).cast("int")
        + (F.size("tk") >= 30).cast("int")
    )
    agg = docs.select(yes.alias("yes")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.col("yes") * (F.col("yes") - 1)
            + (3 - F.col("yes")) * (2 - F.col("yes"))
        ).cast("long").alias("agree_u"),
        F.sum("yes").cast("long").alias("tot_yes"),
    )
    p_a = F.col("agree_u") * F.lit(1.0) / (F.col("n") * 6)
    py = F.col("tot_yes") * F.lit(1.0) / (3 * F.col("n"))
    p_e = F.lit(2.0) * py * (1 - py)
    return agg.select(
        F.col("n").alias("n_docs"),
        R.r(p_a, 6).alias("p_a"),
        R.r(p_e, 6).alias("p_e_gamma"),
        R.r((p_a - p_e) / (1 - p_e), 6).alias("gwet_ac1"),
    )


# --- hashed linear quality scorer (r11) ---------------------------------------
# The fasttext-style quality gate shape: tokens hash into 64 feature
# buckets, each bucket carries a fixed signed integer weight (here
# derived from the shared md5 primitive — a deterministic stand-in for
# trained weights, exactly the FIXTURES.md §B3 logit pattern), and a
# document's score is the weight sum over its tokens. Docs with
# score > 0 pass the gate. Per-language audit table: kept counts and
# the exact-integer mean token weight. ONE token pass, all-integer
# arithmetic, |langs|-bounded output.

_HLQ_BUCKETS = 64


def _hlq_weight_duck() -> str:
    from swat_mapreduce_spark.functions import hashing as _H

    b = f"({_H.duck_hash_uint(_H.sql_salted('t', chr(39) + 'hb' + chr(39)), 4)} % {_HLQ_BUCKETS})"
    w = _H.duck_hash_uint(_H.sql_salted(b + "::VARCHAR", "'hw'"), 2)
    return f"(({w} % 7) - 3)"


_HLQ_ORACLE = rf"""
WITH tok AS (
    SELECT doc_id, lang,
           unnest({_DUCK_TOKS}) AS t
    FROM documents
),
sc AS (
    SELECT doc_id, lang,
           sum({_hlq_weight_duck()})::BIGINT AS score,
           count(*)::BIGINT AS n_toks
    FROM tok GROUP BY 1, 2
)
SELECT lang,
       count(*)::BIGINT AS n_docs,
       sum(CASE WHEN score > 0 THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       sum(score)::BIGINT AS total_score,
       round(sum(score) * 1.0 / sum(n_toks) * 10000) / 10000 + 0.0
           AS mean_token_weight
FROM sc GROUP BY lang
"""


@register("hashed_linear_quality_score", oracle=_HLQ_ORACLE)
def hashed_linear_quality_score(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from swat_mapreduce_spark.functions import hashing as _H

    docs = read_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "lang", F.explode(ws_tokens(F.col("text"))).alias("t")
    )
    bucket = _H.hash_uint(F.col("t"), "hb", 4) % _HLQ_BUCKETS
    weight = (
        _H.hash_uint(bucket.cast("string"), "hw", 2) % 7 - 3
    )
    sc = tok.groupBy("doc_id", "lang").agg(
        F.sum(weight).cast("long").alias("score"),
        F.count(F.lit(1)).cast("long").alias("n_toks"),
    )
    return sc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("score") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_kept"),
        F.sum("score").cast("long").alias("total_score"),
        R.r(F.sum("score") * F.lit(1.0) / F.sum("n_toks"), 4).alias(
            "mean_token_weight"
        ),
    )


# --- Rényi entropy spectrum of the token distribution (r11) --------------------
# H0 (Hartley / log-vocab), H2 (collision entropy, −ln Σp²) and H∞
# (min-entropy, −ln max p) — the spectrum a tokenizer audit reads
# around the registered Shannon token_entropy. Everything reduces to
# three exact integers (V, N, F2 = Σc², max c); each entropy is one
# ln of an exact rational snapped to integer 1e-6 units.

_RENYI_ORACLE = rf"""
WITH tok AS (
    SELECT unnest({_DUCK_TOKS}) AS t FROM documents
),
cnt AS (SELECT t, count(*)::BIGINT AS c FROM tok GROUP BY 1),
s AS (
    SELECT count(*)::BIGINT AS v, sum(c)::BIGINT AS n,
           sum(c * c)::BIGINT AS f2, max(c)::BIGINT AS cmax
    FROM cnt
)
SELECT v AS vocab_size, n AS n_tokens,
       round(ln(v) * 1000000) / 1000000 + 0.0 AS h0_hartley,
       round(ln(n::DOUBLE * n / f2) * 1000000) / 1000000 + 0.0
           AS h2_collision,
       round(ln(n::DOUBLE / cmax) * 1000000) / 1000000 + 0.0
           AS h_min
FROM s
"""


@register("renyi_entropy_tokens", oracle=_RENYI_ORACLE)
def renyi_entropy_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    cnt = (
        docs.select(F.explode(ws_tokens(F.col("text"))).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    s = cnt.agg(
        F.count(F.lit(1)).cast("long").alias("v"),
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("f2"),
        F.max("c").cast("long").alias("cmax"),
    )
    return s.select(
        F.col("v").alias("vocab_size"),
        F.col("n").alias("n_tokens"),
        R.r(F.log(F.col("v")), 6).alias("h0_hartley"),
        R.r(
            F.log(F.col("n").cast("double") * F.col("n") / F.col("f2")), 6
        ).alias("h2_collision"),
        R.r(F.log(F.col("n").cast("double") / F.col("cmax")), 6).alias(
            "h_min"
        ),
    )


# --- Coleman-Liau readability index (r11) ---------------------------------------
# CLI = 0.0588·L − 0.296·S − 15.8 with L = letters per 100 words and
# S = sentences per 100 words — the readability formula built from
# pure CHARACTER counts (no syllable heuristic), hence exactly
# mirrorable: letters = [A-Za-z] count, sentences = [.!?]+ runs
# (floored at 1 — this corpus has no sentence punctuation), words =
# the shared whitespace tokenization. Per-language aggregate over
# exact integer totals.

_CLI_ORACLE = rf"""
WITH d AS (
    SELECT lang,
           len(regexp_extract_all(text, '[A-Za-z]'))::BIGINT AS letters,
           greatest(1, len(regexp_extract_all(text, '[.!?]+')))::BIGINT
               AS sentences,
           len({_DUCK_TOKS})::BIGINT AS words
    FROM documents
),
s AS (
    SELECT lang, count(*)::BIGINT AS n_docs,
           sum(letters)::BIGINT AS l, sum(sentences)::BIGINT AS se,
           sum(words)::BIGINT AS w
    FROM d GROUP BY 1
)
SELECT lang, n_docs,
       round((0.0588 * (l::DOUBLE * 100 / w)
              - 0.296 * (se::DOUBLE * 100 / w) - 15.8) * 10000) / 10000
           + 0.0 AS coleman_liau_index
FROM s
"""


@register("coleman_liau_readability", oracle=_CLI_ORACLE)
def coleman_liau_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    d = docs.select(
        "lang",
        F.length(F.regexp_replace(F.col("text"), "[^A-Za-z]", ""))
        .cast("long")
        .alias("letters"),
        F.greatest(
            F.lit(1),
            F.regexp_count(F.col("text"), F.lit(r"[.!?]+")),
        )
        .cast("long")
        .alias("sentences"),
        F.size(ws_tokens(F.col("text"))).cast("long").alias("words"),
    )
    s = d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("letters").cast("long").alias("l"),
        F.sum("sentences").cast("long").alias("se"),
        F.sum("words").cast("long").alias("w"),
    )
    return s.select(
        "lang",
        "n_docs",
        R.r(
            0.0588 * (F.col("l").cast("double") * 100 / F.col("w"))
            - 0.296 * (F.col("se").cast("double") * 100 / F.col("w"))
            - 15.8,
            4,
        ).alias("coleman_liau_index"),
    )


# --- Gunning fog readability index (r11) -----------------------------------------
# fog = 0.4·(words/sentences + 100·complex/words), complex = tokens
# with ≥ 3 vowel groups ('[aeiou]+' runs on the lowercased token — a
# declared heuristic, identical regex both engines). Sentences floored
# at 1 as in coleman_liau. Per-language aggregate, one token pass.

_FOG_ORACLE = rf"""
WITH tk AS (
    SELECT doc_id, lang, {_DUCK_TOKS} AS toks,
           greatest(1, len(regexp_extract_all(text, '[.!?]+')))::BIGINT
               AS sentences
    FROM documents
),
d AS (
    SELECT lang, sentences, len(toks)::BIGINT AS words,
           len(list_filter(toks,
               x -> len(regexp_extract_all(lower(x), '[aeiou]+')) >= 3
           ))::BIGINT AS complex_words
    FROM tk
),
s AS (
    SELECT lang, count(*)::BIGINT AS n_docs,
           sum(words)::BIGINT AS w, sum(sentences)::BIGINT AS se,
           sum(complex_words)::BIGINT AS cx
    FROM d GROUP BY 1
)
SELECT lang, n_docs, cx AS n_complex_words,
       round(0.4 * (w::DOUBLE / se + 100.0 * cx / w) * 10000) / 10000
           + 0.0 AS gunning_fog_index
FROM s
"""


@register("gunning_fog_readability", oracle=_FOG_ORACLE)
def gunning_fog_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    toks = ws_tokens(F.col("text"))
    d = docs.select(
        "lang",
        F.greatest(
            F.lit(1),
            F.regexp_count(F.col("text"), F.lit(r"[.!?]+")),
        )
        .cast("long")
        .alias("sentences"),
        F.size(toks).cast("long").alias("words"),
        F.size(
            F.filter(
                toks,
                lambda x: F.regexp_count(
                    F.lower(x), F.lit(r"[aeiou]+")
                )
                >= 3,
            )
        )
        .cast("long")
        .alias("complex_words"),
    )
    s = d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("words").cast("long").alias("w"),
        F.sum("sentences").cast("long").alias("se"),
        F.sum("complex_words").cast("long").alias("cx"),
    )
    return s.select(
        "lang",
        "n_docs",
        F.col("cx").alias("n_complex_words"),
        R.r(
            0.4
            * (
                F.col("w").cast("double") / F.col("se")
                + 100.0 * F.col("cx") / F.col("w")
            ),
            4,
        ).alias("gunning_fog_index"),
    )
