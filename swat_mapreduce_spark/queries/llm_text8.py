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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from swat_mapreduce_spark.queries import register
from swat_mapreduce_spark.sources.readers import read_table

_RAKE_STOPS = ("the", "a", "of", "and", "to", "in", "is")
_RAKE_MAX_LEN = 4
_RAKE_TOPN = 15

_RAKE_STOP_SQL = "[" + ", ".join(f"'{w}'" for w in _RAKE_STOPS) + "]"

# Spark-SQL array literal of the stop list, and the in-row non-stopword
# (pos, w) struct array over a materialized `toks` column (r12): the
# original 1-based position rides each surviving token, so downstream
# consumers need neither a posexplode-then-filter of every token nor a
# per-doc row_number window — the filtered array's own index IS the
# non-stopword rank. Nested SQL lambdas referencing the outer lambda's
# variable are engine-native here (Catalyst NamedLambdaVariable
# resolution); the PySpark Column-API lambda traps (CLAUDE.md gotcha 1)
# do not apply to SQL-string expressions.
_STOPS_SPARK_SQL = (
    "array(" + ", ".join(f"'{w}'" for w in _RAKE_STOPS) + ")"
)
_FW_EXPR = (
    "filter(transform(toks, (x, i) -> struct(i + 1 AS pos, x AS w)), "
    f"s -> NOT array_contains({_STOPS_SPARK_SQL}, s.w))"
)

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

    from swat_mapreduce_spark.sources.readers import fan_out

    docs = fan_out(
        read_table(spark, sf_dir, "documents").select(
            "doc_id", ws_tokens(F.col("text")).alias("toks")
        )
    )
    # stopword-run islands in-row (r12): the filtered (pos, w) array is
    # already pos-ordered, so row_number() == array index + 1 and
    # grp = pos - (i + 1) — the per-doc window (exchange + sort over
    # every token) disappears; grp values are bit-identical.
    ns = (
        docs.withColumn("fw", F.expr(_FW_EXPR))
        .select("doc_id", F.posexplode("fw").alias("i", "s"))
        .select(
            "doc_id",
            F.col("s.pos").alias("pos"),
            F.col("s.w").alias("w"),
            (F.col("s.pos") - F.col("i") - 1).alias("grp"),
        )
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


# --- Yule's K and Simpson's D: vocabulary richness per language -----------------
# Yule (1944) characteristic K = 10⁴·(Σc_w² − N)/N² and Simpson's
# repeat-rate D = Σc_w(c_w−1)/(N(N−1)) — the two classical lexical
# richness constants a corpus datacard reports per language. Both are
# ratios of EXACT integers (token counts and squared type counts —
# Σc² goes through DECIMAL(38,0) so web-scale type counts cannot
# wrap), so the only floating point is one final division per
# statistic. Scale: one tokenize pass into the (lang × word) count
# table (vocab-bounded shuffle, map-side combined), then a |langs|-row
# rollup.
_YULE_ORACLE = """
WITH tok AS (
    SELECT lang, u.w
    FROM documents,
         unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                            x -> len(x) > 0)) AS u(w)
),
c AS (
    SELECT lang, w, count(*)::BIGINT AS c FROM tok GROUP BY 1, 2
),
m AS (
    SELECT lang, sum(c)::BIGINT AS n, count(*)::BIGINT AS v,
           sum(CAST(c AS DECIMAL(38,0)) * c) AS c2,
           sum(CAST(c AS DECIMAL(38,0)) * (c - 1)) AS crep
    FROM c GROUP BY 1
)
SELECT lang, n AS n_tokens, v AS n_types,
       round((c2 - n)::DOUBLE / (n::DOUBLE * n) * 10000 * 10000) / 10000
           + 0.0 AS yule_k,
       CASE WHEN n > 1 THEN round(crep::DOUBLE / (n::DOUBLE * (n - 1))
            * 1000000) / 1000000 + 0.0 END AS simpson_d,
       round(v::DOUBLE / n * 1000000) / 1000000 + 0.0 AS ttr
FROM m
"""


@register("yule_k_vocab_richness", oracle=_YULE_ORACLE)
def yule_k_vocab_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from swat_mapreduce_spark.functions import rounding as R
    from swat_mapreduce_spark.functions.text import ws_tokens

    docs = read_table(spark, sf_dir, "documents").select(
        "lang", ws_tokens(F.col("text")).alias("toks")
    )
    tok = docs.select("lang", F.explode("toks").alias("w"))
    c = tok.groupBy("lang", "w").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    m = c.groupBy("lang").agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("v"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c")).alias("c2"),
        F.sum(
            F.col("c").cast("decimal(38,0)") * (F.col("c") - 1)
        ).alias("crep"),
    )
    return m.select(
        "lang",
        F.col("n").alias("n_tokens"),
        F.col("v").alias("n_types"),
        R.r(
            (F.col("c2") - F.col("n")).cast("double")
            / (F.col("n").cast("double") * F.col("n"))
            * 10000,
            4,
        ).alias("yule_k"),
        F.when(
            F.col("n") > 1,
            R.r(
                F.col("crep").cast("double")
                / (F.col("n").cast("double") * (F.col("n") - 1)),
                6,
            ),
        ).alias("simpson_d"),
        R.r(F.col("v").cast("double") / F.col("n"), 6).alias("ttr"),
    )


# --- MSTTR: mean segmental type-token ratio per language ------------------------
# Johnson (1944) MSTTR-25 — the length-robust lexical-diversity score
# (raw TTR shrinks with document length; segmenting at a fixed 25
# tokens removes the bias): split each document's token stream into
# consecutive FULL 25-token segments (trailing partial dropped, the
# standard convention), take each segment's distinct-type count, and
# average TTR over segments per language. Every segment TTR is an
# exact integer ratio (distinct count / 25 → 1e-6 units), so the
# language mean is a ratio of exact int64 sums. Scale: positions come
# from posexplode inside the array domain (no window at all); the
# (doc, segment) distinct-count is a map-side-combinable groupBy.
_MSTTR_SEG = 25
_MSTTR_U = 1_000_000

_MSTTR_ORACLE = f"""
WITH tok AS (
    SELECT doc_id, lang, t.i AS pos, t.w
    FROM (
        SELECT doc_id, lang,
               unnest(list_transform(
                   list_filter(string_split_regex(trim(text), '\\s+'),
                               x -> len(x) > 0),
                   (w, i) -> struct_pack(i := i, w := w))) AS t
        FROM documents
    )
),
nt AS (SELECT doc_id, count(*)::BIGINT AS n FROM tok GROUP BY 1),
seg AS (
    SELECT tok.doc_id, tok.lang,
           CAST(floor((tok.pos - 1) / {_MSTTR_SEG}.0) AS BIGINT) AS seg,
           tok.w
    FROM tok JOIN nt USING (doc_id)
    WHERE CAST(floor((tok.pos - 1) / {_MSTTR_SEG}.0) AS BIGINT)
          < CAST(floor(nt.n / {_MSTTR_SEG}.0) AS BIGINT)
),
sttr AS (
    SELECT lang, doc_id, seg,
           CAST(round(count(DISTINCT w) * {_MSTTR_U}.0 / {_MSTTR_SEG})
                AS BIGINT) AS ttr_u
    FROM seg GROUP BY 1, 2, 3
)
SELECT lang, count(*)::BIGINT AS n_segments,
       round(sum(ttr_u)::DOUBLE / count(*) / {_MSTTR_U} * 10000) / 10000
           + 0.0 AS msttr,
       round(min(ttr_u) * 1.0 / {_MSTTR_U} * 10000) / 10000 + 0.0
           AS min_seg_ttr,
       round(max(ttr_u) * 1.0 / {_MSTTR_U} * 10000) / 10000 + 0.0
           AS max_seg_ttr
FROM sttr GROUP BY 1
"""


@register("msttr_lexical_diversity", oracle=_MSTTR_ORACLE)
def msttr_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from swat_mapreduce_spark.functions import rounding as R
    from swat_mapreduce_spark.functions.text import ws_tokens

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", ws_tokens(F.col("text")).alias("toks")
    )
    tok = docs.select(
        "doc_id",
        "lang",
        F.size("toks").alias("n"),
        F.posexplode("toks").alias("pos0", "w"),
    )
    seg_col = F.floor(F.col("pos0") / F.lit(float(_MSTTR_SEG))).cast("long")
    full = F.floor(F.col("n") / F.lit(float(_MSTTR_SEG))).cast("long")
    seg = tok.filter(seg_col < full).select(
        "doc_id", "lang", seg_col.alias("seg"), "w"
    )
    sttr = seg.groupBy("lang", "doc_id", "seg").agg(
        F.round(
            F.countDistinct("w") * F.lit(float(_MSTTR_U)) / _MSTTR_SEG
        )
        .cast("long")
        .alias("ttr_u")
    )
    return sttr.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_segments"),
        R.r(
            F.sum("ttr_u").cast("double") / F.count(F.lit(1)) / _MSTTR_U,
            4,
        ).alias("msttr"),
        R.r(F.min("ttr_u") * F.lit(1.0) / _MSTTR_U, 4).alias(
            "min_seg_ttr"
        ),
        R.r(F.max("ttr_u") * F.lit(1.0) / _MSTTR_U, 4).alias(
            "max_seg_ttr"
        ),
    )


# --- Burrows' Delta: stylometric distance between sources -----------------------
# Burrows (2002) Delta — the standard authorship-attribution /
# style-drift measure: over the corpus's 20 most-frequent words, each
# source's relative frequency is z-scored across sources and
# Delta(s1,s2) = mean_w |z1 − z2|. The closest pairs flag sources
# with near-identical generation style (a provenance signal for
# training-data curation). Determinism: relative frequencies are
# integer 1e-6 units (round(c·1e6/T)), so Σf and Σf² across the 20
# sources are exact int64; σ is one sqrt on exact-int-derived doubles
# and each z snaps to integer 1e-6 units before the pair sum — the
# top-10 cut orders by an exact int64 key with lexicographic pair
# tie-break. Scale: one tokenize pass to the (source × word) count
# table; everything after lives on 20-source × 20-word metadata.
_BD_MFW = 20
_BD_F_U = 1_000_000  # relative frequency units
_BD_Z_U = 1_000_000  # z-score units
_BD_TOPN = 10

_BD_ORACLE = f"""
WITH tok AS (
    SELECT source, u.w
    FROM documents,
         unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                            x -> len(x) > 0)) AS u(w)
),
cw AS (SELECT source, w, count(*)::BIGINT AS c FROM tok GROUP BY 1, 2),
mfw AS (
    SELECT w FROM (
        SELECT w, sum(c)::BIGINT AS tot FROM cw GROUP BY 1
    ) ORDER BY tot DESC, w LIMIT {_BD_MFW}
),
ts AS (SELECT source, sum(c)::BIGINT AS t FROM cw GROUP BY 1),
f AS (
    SELECT s.source, m.w,
           CAST(round(coalesce(cw.c, 0) * {_BD_F_U}.0 / s.t) AS BIGINT)
               AS f_u
    FROM ts s CROSS JOIN mfw m
    LEFT JOIN cw ON cw.source = s.source AND cw.w = m.w
),
stat AS (
    SELECT w, count(*)::BIGINT AS k, sum(f_u)::BIGINT AS sf,
           sum(f_u * f_u)::BIGINT AS sff
    FROM f GROUP BY 1
),
z AS (
    SELECT f.source, f.w,
           CAST(round((f.f_u - stat.sf::DOUBLE / stat.k)
                      / sqrt(stat.sff::DOUBLE / stat.k
                             - (stat.sf::DOUBLE / stat.k)
                               * (stat.sf::DOUBLE / stat.k))
                      * {_BD_Z_U}) AS BIGINT) AS z_u
    FROM f JOIN stat USING (w)
),
pairs AS (
    SELECT a.source AS source_a, b.source AS source_b,
           sum(abs(a.z_u - b.z_u))::BIGINT AS dz_u,
           count(*)::BIGINT AS n_words
    FROM z a JOIN z b ON a.w = b.w AND a.source < b.source
    GROUP BY 1, 2
)
SELECT source_a, source_b,
       round(dz_u * 1.0 / n_words / {_BD_Z_U} * 10000) / 10000 + 0.0
           AS delta
FROM pairs
ORDER BY dz_u, source_a, source_b
LIMIT {_BD_TOPN}
"""


@register("burrows_delta_sources", oracle=_BD_ORACLE)
def burrows_delta_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    from swat_mapreduce_spark.functions import rounding as R
    from swat_mapreduce_spark.functions.text import ws_tokens

    docs = read_table(spark, sf_dir, "documents").select(
        "source", ws_tokens(F.col("text")).alias("toks")
    )
    from pyspark.storagelevel import StorageLevel

    # persist the (source × word) count grid (VERDICT r12 #6 / guide
    # §5): mfw, ts and f each re-derived it — 3 corpus token explodes
    # collapse to 1
    cw = (
        docs.select("source", F.explode("toks").alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    mfw = (
        cw.groupBy("w")
        .agg(F.sum("c").cast("long").alias("tot"))
        .orderBy(F.col("tot").desc(), "w")
        .limit(_BD_MFW)
        .select("w")
    )
    ts = cw.groupBy("source").agg(F.sum("c").cast("long").alias("t"))
    f = (
        ts.crossJoin(F.broadcast(mfw))
        .join(F.broadcast(cw.join(F.broadcast(mfw), "w")),
              ["source", "w"], "left")
        .select(
            "source",
            "w",
            F.round(
                F.coalesce(F.col("c"), F.lit(0))
                * F.lit(float(_BD_F_U))
                / F.col("t")
            )
            .cast("long")
            .alias("f_u"),
        )
    )
    stat = f.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("f_u").cast("long").alias("sf"),
        F.sum(F.col("f_u") * F.col("f_u")).cast("long").alias("sff"),
    )
    mu = F.col("sf").cast("double") / F.col("k")
    sd = F.sqrt(F.col("sff").cast("double") / F.col("k") - mu * mu)
    # persist the bounded (source × 150-MFW) z-score table: both
    # self-join sides re-derived the whole cw→f→stat chain otherwise
    z = (
        f.join(F.broadcast(stat), "w")
        .select(
            "source",
            "w",
            F.round((F.col("f_u") - mu) / sd * F.lit(_BD_Z_U))
            .cast("long")
            .alias("z_u"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    a = z.select(
        F.col("source").alias("source_a"),
        F.col("w").alias("w_a"),
        F.col("z_u").alias("za"),
    )
    b = z.select(
        F.col("source").alias("source_b"),
        F.col("w").alias("w_b"),
        F.col("z_u").alias("zb"),
    )
    pairs = (
        a.join(
            F.broadcast(b),
            (F.col("w_a") == F.col("w_b"))
            & (F.col("source_a") < F.col("source_b")),
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.sum(F.abs(F.col("za") - F.col("zb")))
            .cast("long")
            .alias("dz_u"),
            F.count(F.lit(1)).cast("long").alias("n_words"),
        )
    )
    return (
        pairs.orderBy("dz_u", "source_a", "source_b")
        .limit(_BD_TOPN)
        .select(
            "source_a",
            "source_b",
            R.r(
                F.col("dz_u") * F.lit(1.0) / F.col("n_words") / _BD_Z_U,
                4,
            ).alias("delta"),
        )
    )


# --- TextRank keywords: PageRank over the word co-occurrence graph --------------
# Mihalcea & Tarau (2004) TextRank — the graph-based sibling of RAKE:
# non-stopword tokens co-occurring within a 2-token window form an
# undirected weighted graph and two damped (d=0.85) PageRank steps
# from the uniform 1.0 start rank the vocabulary. Determinism is the
# pagerank_2iter discipline: scores live in integer 1e-8 units and
# EVERY per-edge contribution snaps to an integer unit
# (round(0.85·s_j·n_ji/W_j)) before the exact int64 in-sum, so both
# iterations and the top-15 cut order by exact integers with
# lexicographic tie-break; the oracle unrolls both steps in SQL.
# Scale: window-bounded edge volume (≤ 2 pairs per token position),
# vocab-bounded graph tables, TakeOrdered final cut.
_TR_S_U = 100_000_000  # 1e-8 score units
_TR_D = 0.85
_TR_BASE_U = 15_000_000  # (1 - d) in score units
_TR_TOPN = 15

_TR_ORACLE = f"""
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
    WHERE NOT list_contains({_RAKE_STOP_SQL}, t.w)
),
co AS (
    SELECT a.w AS wa, b.w AS wb, count(*)::BIGINT AS n
    FROM tok a JOIN tok b
      ON b.doc_id = a.doc_id AND b.pos > a.pos AND b.pos <= a.pos + 2
    WHERE a.w <> b.w
    GROUP BY 1, 2
),
e AS (
    SELECT wa AS src, wb AS dst, sum(n)::BIGINT AS n FROM (
        SELECT wa, wb, n FROM co
        UNION ALL
        SELECT wb AS wa, wa AS wb, n FROM co
    ) GROUP BY 1, 2
),
wd AS (SELECT src, sum(n)::BIGINT AS wdeg FROM e GROUP BY 1),
s1 AS (
    SELECT e.dst AS w,
           {_TR_BASE_U} + sum(CAST(round({_TR_D} * {_TR_S_U} * e.n
                                          / wd.wdeg) AS BIGINT))::BIGINT
               AS s_u
    FROM e JOIN wd ON wd.src = e.src
    GROUP BY 1
),
s2 AS (
    SELECT e.dst AS w,
           {_TR_BASE_U} + sum(CAST(round({_TR_D} * s1.s_u * e.n
                                          / wd.wdeg) AS BIGINT))::BIGINT
               AS s_u
    FROM e JOIN wd ON wd.src = e.src JOIN s1 ON s1.w = e.src
    GROUP BY 1
)
SELECT s2.w AS word,
       round(s2.s_u * 1.0 / {_TR_S_U} * 10000) / 10000 + 0.0
           AS textrank_score,
       (SELECT count(*) FROM e WHERE e.src = s2.w)::BIGINT
           AS n_neighbors,
       wd.wdeg AS w_degree
FROM s2 JOIN wd ON wd.src = s2.w
ORDER BY s2.s_u DESC, s2.w
LIMIT {_TR_TOPN}
"""


@register("textrank_keywords", oracle=_TR_ORACLE)
def textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from swat_mapreduce_spark.functions import rounding as R
    from swat_mapreduce_spark.functions.text import ws_tokens

    from swat_mapreduce_spark.sources.readers import fan_out

    docs = fan_out(
        read_table(spark, sf_dir, "documents").select(
            "doc_id", ws_tokens(F.col("text")).alias("toks")
        )
    )
    # window-2 co-occurrence pairs generated IN-ROW (r12, guide §2.4):
    # non-stopword positions strictly increase inside fw, so only the
    # next TWO filtered entries can sit within +2 original positions —
    # zipping fw against its own 1- and 2-shifted slices enumerates
    # exactly the old tok⋈tok range join's candidates without shuffling
    # the token table twice; the dp <= 2 filter reproduces the position
    # window across stopword gaps. Two FLAT zip_with calls, not a
    # nested transform-in-transform: Catalyst higher-order functions
    # are interpreted, and the nested form measured 2.3x SLOWER than
    # the join it replaced while this flat form measures ~2x faster
    # (checksum-identical pair multiset in both cases).
    z1 = (
        "zip_with(fw, slice(fw, 2, greatest(size(fw) - 1, 0)), "
        "(s, t) -> struct(s.w AS wa, t.w AS wb, t.pos - s.pos AS dp))"
    )
    z2 = (
        "zip_with(fw, slice(fw, 3, greatest(size(fw) - 2, 0)), "
        "(s, t) -> struct(s.w AS wa, t.w AS wb, t.pos - s.pos AS dp))"
    )
    co = (
        docs.withColumn("fw", F.expr(_FW_EXPR))
        .select(F.explode(F.expr(f"concat({z1}, {z2})")).alias("pr"))
        .filter(
            F.col("pr.dp").isNotNull()
            & (F.col("pr.dp") <= 2)
            & (F.col("pr.wa") != F.col("pr.wb"))
        )
        .select(F.col("pr.wa").alias("wa"), F.col("pr.wb").alias("wb"))
        .groupBy("wa", "wb")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    e = (
        co.select(F.col("wa").alias("src"), F.col("wb").alias("dst"), "n")
        .unionAll(
            co.select(
                F.col("wb").alias("src"), F.col("wa").alias("dst"), "n"
            )
        )
        .groupBy("src", "dst")
        .agg(F.sum("n").cast("long").alias("n"))
    )
    e = e.persist()
    wd = e.groupBy("src").agg(F.sum("n").cast("long").alias("wdeg"))

    def _step(scores: DataFrame | None) -> DataFrame:
        base = e.join(F.broadcast(wd), "src")
        if scores is None:
            term = F.round(
                F.lit(_TR_D) * F.lit(_TR_S_U) * F.col("n") / F.col("wdeg")
            )
        else:
            base = base.join(
                F.broadcast(scores.withColumnRenamed("w", "src")), "src"
            )
            term = F.round(
                F.lit(_TR_D) * F.col("s_u") * F.col("n") / F.col("wdeg")
            )
        return base.groupBy(F.col("dst").alias("w")).agg(
            (F.lit(_TR_BASE_U) + F.sum(term.cast("long")))
            .cast("long")
            .alias("s_u")
        )

    s2 = _step(_step(None))
    nb = e.groupBy(F.col("src").alias("w")).agg(
        F.count(F.lit(1)).cast("long").alias("n_neighbors")
    )
    out = (
        s2.join(F.broadcast(wd.withColumnRenamed("src", "w")), "w")
        .join(F.broadcast(nb), "w")
        .orderBy(F.col("s_u").desc(), "w")
        .limit(_TR_TOPN)
        .select(
            F.col("w").alias("word"),
            R.r(F.col("s_u") * F.lit(1.0) / _TR_S_U, 4).alias(
                "textrank_score"
            ),
            "n_neighbors",
            F.col("wdeg").alias("w_degree"),
        )
    )
    rows = out.collect()
    e.unpersist()
    return spark.createDataFrame(rows, out.schema)


# --- Good-Turing unseen mass + Chao1 vocabulary richness -------------------------
# The crawl-coverage audit: how much token probability mass belongs
# to vocabulary we have NOT yet seen? Good-Turing's missing-mass
# estimate P₀ = V₁/N (Good 1953) and Chao1's lower-bound richness
# V + V₁²/(2V₂) (Chao 1984), per language, from the
# frequency-of-frequencies table. Every ingredient is an EXACT
# integer (token total, singleton/doubleton type counts, V₁² through
# DECIMAL(38,0)); the only floating point is the final display
# divisions. Scale: one tokenize pass to the vocab-bounded
# (lang × word) count table, then a |langs|-row rollup — the same
# shape as yule_k_vocab_richness.
_GT_ORACLE = """
WITH tok AS (
    SELECT lang, u.w
    FROM documents,
         unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                            x -> len(x) > 0)) AS u(w)
),
c AS (
    SELECT lang, w, count(*)::BIGINT AS c FROM tok GROUP BY 1, 2
),
m AS (
    SELECT lang, sum(c)::BIGINT AS n, count(*)::BIGINT AS v,
           count(*) FILTER (WHERE c = 1)::BIGINT AS v1,
           count(*) FILTER (WHERE c = 2)::BIGINT AS v2
    FROM c GROUP BY 1
)
SELECT lang, n AS n_tokens, v AS n_types, v1 AS n_singletons,
       v2 AS n_doubletons,
       round(v1::DOUBLE / n * 1000000) / 1000000 + 0.0
           AS unseen_mass_gt,
       round((v + (CAST(v1 AS DECIMAL(38,0)) * (v1 - 1))::DOUBLE
              / (2.0 * (v2 + 1))) * 100) / 100 + 0.0 AS chao1_richness,
       round(v::DOUBLE
             / (v + (CAST(v1 AS DECIMAL(38,0)) * (v1 - 1))::DOUBLE
                    / (2.0 * (v2 + 1)))
             * 1000000) / 1000000 + 0.0 AS coverage_share
FROM m
"""


@register("good_turing_unseen_mass", oracle=_GT_ORACLE)
def good_turing_unseen_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    from swat_mapreduce_spark.functions import rounding as R
    from swat_mapreduce_spark.functions.text import ws_tokens

    docs = read_table(spark, sf_dir, "documents").select(
        "lang", ws_tokens(F.col("text")).alias("toks")
    )
    c = (
        docs.select("lang", F.explode("toks").alias("w"))
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    m = c.groupBy("lang").agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("v"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("long")
        .alias("v1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0))
        .cast("long")
        .alias("v2"),
    )
    chao_extra = (
        F.col("v1").cast("decimal(38,0)") * (F.col("v1") - 1)
    ).cast("double") / (F.lit(2.0) * (F.col("v2") + 1))
    return m.select(
        "lang",
        F.col("n").alias("n_tokens"),
        F.col("v").alias("n_types"),
        F.col("v1").alias("n_singletons"),
        F.col("v2").alias("n_doubletons"),
        R.r(F.col("v1").cast("double") / F.col("n"), 6).alias(
            "unseen_mass_gt"
        ),
        R.r(F.col("v") + chao_extra, 2).alias("chao1_richness"),
        R.r(
            F.col("v").cast("double") / (F.col("v") + chao_extra), 6
        ).alias("coverage_share"),
    )
