"""Round-9 LLM-pipeline text-analysis operators.

* rake_keyword_extraction — RAKE (Rose et al. 2010): candidate
  phrases are maximal stopword-free token runs (length ≤ 4), word
  score = degree/frequency over the phrase table, phrase score =
  Σ word scores. The classic unsupervised keyword extractor a corpus
  pipeline runs for datacard topics.
* dunning_g2_collocations — Dunning (1993) log-likelihood-ratio
  collocation test over adjacent token bigrams: G² from the 2×2
  contingency table — the statistically sound replacement for raw
  PMI on sparse counts (pmi_top_bigrams is the companion).

Cross-engine determinism (CLAUDE.md gotcha 13a): every ln and every
per-word score is snapped to an INTEGER unit (1e-6 for RAKE word
scores, 1e-4 for G² cell terms) before any order-free sum, so ranks
and top-k cuts order by exact int64 keys with lexicographic
tie-breaks.

Scale posture: both ops are ONE corpus tokenize pass into bounded
aggregate tables (phrase strings / bigram vocab, MAX-bounded by the
token domain); the only windows are per-doc position islands
(partitioned by doc_id) and rank cuts over TakeOrdered tops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from swat_mapreduce_spark.queries import register
from swat_mapreduce_spark.sources.readers import read_table

_RAKE_STOPS = ("the", "a", "of", "and", "to", "in", "is")
_RAKE_MAX_LEN = 4
_RAKE_TOPN = 15

_RAKE_STOP_SQL = "[" + ", ".join(f"'{w}'" for w in _RAKE_STOPS) + "]"

_RAKE_ORACLE = f"""
WITH tok AS (
    SELECT doc_id, t.i AS pos, t.w
    FROM (
        SELECT doc_id,
               unnest(list_transform(
                   list_filter(string_split_regex(trim(text), '\\s+'),
                               x -> len(x) > 0),
                   (w, i) -> struct_pack(i := i, w := w))) AS t
        FROM documents
    )
),
ns AS (
    SELECT doc_id, pos, w,
           pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
               AS grp
    FROM tok WHERE NOT list_contains({_RAKE_STOP_SQL}, w)
),
phr AS (
    SELECT doc_id, grp, list(w ORDER BY pos) AS ws,
           count(*)::BIGINT AS plen
    FROM ns GROUP BY doc_id, grp
    HAVING count(*) <= {_RAKE_MAX_LEN}
),
wstat AS (
    SELECT u.w, count(*)::BIGINT AS freq, sum(p.plen)::BIGINT AS deg
    FROM phr p, unnest(p.ws) AS u(w)
    GROUP BY u.w
),
wscore AS (
    SELECT w, CAST(round(deg * 1000000.0 / freq) AS BIGINT) AS s_u
    FROM wstat
),
pscore AS (
    SELECT list_aggregate(p.ws, 'string_agg', ' ') AS phrase,
           any_value(p.plen) AS n_words,
           count(*)::BIGINT AS n_occurrences,
           any_value(sc.s) AS score_u
    FROM phr p
    JOIN (
        SELECT p2.doc_id, p2.grp, sum(ws2.s_u)::BIGINT AS s
        FROM phr p2, unnest(p2.ws) AS u2(w)
        JOIN wscore ws2 ON ws2.w = u2.w
        GROUP BY p2.doc_id, p2.grp
    ) sc ON sc.doc_id = p.doc_id AND sc.grp = p.grp
    GROUP BY list_aggregate(p.ws, 'string_agg', ' ')
)
SELECT phrase, n_words, n_occurrences,
       round(score_u * 1.0 / 1000000 * 10000) / 10000 + 0.0 AS rake_score
FROM pscore
ORDER BY score_u DESC, phrase
LIMIT {_RAKE_TOPN}
"""


@register("rake_keyword_extraction", oracle=_RAKE_ORACLE)
def rake_keyword_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from swat_mapreduce_spark.functions import rounding as R
    from swat_mapreduce_spark.functions.text import ws_tokens

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", ws_tokens(F.col("text")).alias("toks")
    )
    tok = docs.select(
        "doc_id", F.posexplode("toks").alias("pos0", "w")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "w")
    stop_arr = F.array(*[F.lit(w) for w in _RAKE_STOPS])
    ns = tok.filter(~F.array_contains(stop_arr, F.col("w"))).select(
        "doc_id",
        "pos",
        "w",
        (
            F.col("pos")
            - F.row_number().over(
                Window.partitionBy("doc_id").orderBy("pos")
            )
        ).alias("grp"),
    )
    phr = (
        ns.groupBy("doc_id", "grp")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "w"))),
                lambda s: s["w"],
            ).alias("ws"),
            F.count(F.lit(1)).cast("long").alias("plen"),
        )
        .filter(F.col("plen") <= _RAKE_MAX_LEN)
        .persist()
    )
    wstat = (
        phr.select("plen", F.explode("ws").alias("w"))
        .groupBy("w")
        .agg(
            F.count(F.lit(1)).cast("long").alias("freq"),
            F.sum("plen").cast("long").alias("deg"),
        )
    )
    wscore = wstat.select(
        "w",
        F.round(F.col("deg") * F.lit(1000000.0) / F.col("freq"))
        .cast("long")
        .alias("s_u"),
    )
    sc = (
        phr.select("doc_id", "grp", F.explode("ws").alias("w"))
        .join(F.broadcast(wscore), "w")
        .groupBy("doc_id", "grp")
        .agg(F.sum("s_u").cast("long").alias("s"))
    )
    pscore = (
        phr.join(sc, ["doc_id", "grp"])
        .select(
            F.array_join("ws", " ").alias("phrase"),
            "plen",
            "s",
        )
        .groupBy("phrase")
        .agg(
            F.first("plen").alias("n_words"),
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.first("s").alias("score_u"),
        )
    )
    out = (
        pscore.orderBy(F.desc("score_u"), F.asc("phrase"))
        .limit(_RAKE_TOPN)
        .select(
            "phrase",
            "n_words",
            "n_occurrences",
            R.r(F.col("score_u").cast("double") / F.lit(1e6), 4).alias(
                "rake_score"
            ),
        )
    )
    rows = out.collect()
    phr.unpersist()
    return spark.createDataFrame(rows, out.schema)


# --- Dunning G² collocations ------------------------------------------------------
_G2_MIN_COUNT = 5
_G2_TOPN = 20

_G2_ORACLE = f"""
WITH tok AS (
    SELECT doc_id,
           list_filter(string_split_regex(trim(text), '\\s+'),
                       x -> len(x) > 0) AS t
    FROM documents
),
bg AS (
    -- scalar-list generate_series (the jsd/charlm idiom): the TABLE
    -- form rejects lateral column bounds
    SELECT p.b[1] AS w1, p.b[2] AS w2
    FROM (
        SELECT unnest(list_transform(generate_series(1, len(t) - 1),
                                     i -> [t[i], t[i + 1]])) AS b
        FROM tok
    ) p
),
bc AS (SELECT w1, w2, count(*)::BIGINT AS k11 FROM bg GROUP BY 1, 2),
c1 AS (SELECT w1, sum(k11)::BIGINT AS r1 FROM bc GROUP BY 1),
c2 AS (SELECT w2, sum(k11)::BIGINT AS c1t FROM bc GROUP BY 1),
n AS (SELECT sum(k11)::BIGINT AS nn FROM bc),
cells AS (
    SELECT bc.w1, bc.w2, bc.k11,
           c1.r1, c2.c1t, n.nn,
           bc.k11 AS a, c1.r1 - bc.k11 AS b,
           c2.c1t - bc.k11 AS c,
           n.nn - c1.r1 - c2.c1t + bc.k11 AS d
    FROM bc JOIN c1 USING (w1) JOIN c2 USING (w2), n
    WHERE bc.k11 >= {_G2_MIN_COUNT}
),
terms AS (
    SELECT w1, w2, k11, r1, c1t, nn,
           (CASE WHEN a > 0 THEN CAST(round(a * ln((a * nn)::DOUBLE
                / ((r1)::DOUBLE * c1t)) * 10000) AS BIGINT) ELSE 0 END
          + CASE WHEN b > 0 THEN CAST(round(b * ln((b * nn)::DOUBLE
                / ((r1)::DOUBLE * (nn - c1t))) * 10000) AS BIGINT)
            ELSE 0 END
          + CASE WHEN c > 0 THEN CAST(round(c * ln((c * nn)::DOUBLE
                / ((nn - r1)::DOUBLE * c1t)) * 10000) AS BIGINT)
            ELSE 0 END
          + CASE WHEN d > 0 THEN CAST(round(d * ln((d * nn)::DOUBLE
                / ((nn - r1)::DOUBLE * (nn - c1t))) * 10000) AS BIGINT)
            ELSE 0 END) AS g_u
    FROM cells
)
SELECT w1, w2, k11 AS n_bigram,
       round(2 * g_u * 1.0 / 10000 * 100) / 100 + 0.0 AS g2
FROM terms
ORDER BY g_u DESC, w1, w2
LIMIT {_G2_TOPN}
"""


@register("dunning_g2_collocations", oracle=_G2_ORACLE)
def dunning_g2_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from swat_mapreduce_spark.functions.text import ws_tokens

    docs = read_table(spark, sf_dir, "documents").select(
        ws_tokens(F.col("text")).alias("t")
    )
    # adjacent bigrams inside the array domain (guarded sequence,
    # gotcha 10 — single-token docs produce no bigrams)
    bg = docs.select(
        F.explode(
            F.when(
                F.size("t") >= 2,
                F.expr(
                    "transform(sequence(1, size(t) - 1), "
                    "i -> struct(element_at(t, i) as w1, "
                    "element_at(t, i + 1) as w2))"
                ),
            ).otherwise(
                F.array().cast("array<struct<w1:string,w2:string>>")
            )
        ).alias("b")
    ).select(F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    bc = bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("k11")
    ).persist()
    c1 = bc.groupBy("w1").agg(F.sum("k11").cast("long").alias("r1"))
    c2 = bc.groupBy("w2").agg(F.sum("k11").cast("long").alias("c1t"))
    n = bc.agg(F.sum("k11").cast("long").alias("nn"))
    cells = (
        bc.filter(F.col("k11") >= _G2_MIN_COUNT)
        .join(F.broadcast(c1), "w1")
        .join(F.broadcast(c2), "w2")
        .crossJoin(F.broadcast(n))
    )

    def t(k, row, col):
        return F.when(
            k > 0,
            F.round(
                k
                * F.log(
                    (k * F.col("nn")).cast("double")
                    / (row.cast("double") * col)
                )
                * F.lit(10000)
            ).cast("long"),
        ).otherwise(F.lit(0).cast("long"))

    a = F.col("k11")
    b = F.col("r1") - F.col("k11")
    c = F.col("c1t") - F.col("k11")
    d = F.col("nn") - F.col("r1") - F.col("c1t") + F.col("k11")
    g_u = (
        t(a, F.col("r1"), F.col("c1t"))
        + t(b, F.col("r1"), F.col("nn") - F.col("c1t"))
        + t(c, F.col("nn") - F.col("r1"), F.col("c1t"))
        + t(d, F.col("nn") - F.col("r1"), F.col("nn") - F.col("c1t"))
    )
    out = (
        cells.select("w1", "w2", F.col("k11").alias("n_bigram"), g_u.alias("g_u"))
        .orderBy(F.desc("g_u"), F.asc("w1"), F.asc("w2"))
        .limit(_G2_TOPN)
        .select(
            "w1",
            "w2",
            "n_bigram",
            (
                F.round(2 * F.col("g_u") * F.lit(1.0) / 10000 * 100) / 100
                + F.lit(0.0)
            ).alias("g2"),
        )
    )
    rows = out.collect()
    bc.unpersist()
    return spark.createDataFrame(rows, out.schema)
