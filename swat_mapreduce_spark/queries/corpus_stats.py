"""Round-12 corpus-statistics pack: the reporting ops a large-scale
training-data pipeline runs AFTER its filters and dedup passes —
tokenizer fertility per language, verbatim-contamination run lengths,
Wilson keep-rate intervals, duplicate-cluster shape, the dedup yield
curve as the corpus grows, and lexical burstiness of the head tokens.

Determinism follows the house discipline: exact integer counts
everywhere, one identical IEEE expression tree per ratio on both
engines, `functions/rounding.r()` snaps (gotcha 3/13a), and every
rank/limit carries a deterministic tie-break. Scale posture: each op
is one corpus scan into a bounded panel (|langs|, |sources|, distinct
cluster sizes, 10 deciles, top-20 tokens) — no corpus-keyed broadcast
anywhere (CLAUDE.md gotcha 15); the only unbounded shuffles are
hash-keyed aggregates with map-side combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from swat_mapreduce_spark.functions import rounding as R
from swat_mapreduce_spark.functions.text import ws_tokens
from swat_mapreduce_spark.queries import register
from swat_mapreduce_spark.sources.readers import read_table

# --- tokenizer fertility by language -----------------------------------------
# Multilingual pipelines budget tokens, not documents: fertility
# (subword pieces per whitespace word) decides how much of the token
# budget each language actually consumes. The subword proxy is a
# fixed-width BPE stand-in — ceil(len(word)/4) pieces — declared
# identically on both engines (the container has no tokenizer
# libraries; the plumbing, not the merge table, is what this op
# exercises). All sums are exact integers; the two ratios are single
# IEEE divisions snapped to 4dp.

_FERT_ORACLE = """
WITH tok AS (
    SELECT lang,
           unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                              x -> len(x) > 0)) AS w
    FROM documents
),
agg AS (
    SELECT lang,
           count(*)::BIGINT AS n_words,
           sum((len(w) + 3) // 4)::BIGINT AS n_subwords,
           sum(len(w))::BIGINT AS n_word_chars
    FROM tok GROUP BY 1
),
nd AS (SELECT lang, count(*)::BIGINT AS n_docs FROM documents GROUP BY 1)
SELECT a.lang, nd.n_docs, a.n_words, a.n_subwords, a.n_word_chars,
       round(a.n_subwords * 1.0 / a.n_words * 10000) / 10000 + 0.0
           AS fertility,
       round(a.n_word_chars * 1.0 / a.n_subwords * 10000) / 10000 + 0.0
           AS chars_per_subword
FROM agg a JOIN nd ON nd.lang = a.lang
"""


@register("tokenizer_fertility_by_lang", oracle=_FERT_ORACLE)
def tokenizer_fertility_by_lang(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    tok = docs.select(
        "lang", F.explode(ws_tokens(F.col("text"))).alias("w")
    )
    agg = tok.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum(F.expr("(length(w) + 3) div 4")).cast("long").alias(
            "n_subwords"
        ),
        F.sum(F.length("w")).cast("long").alias("n_word_chars"),
    )
    nd = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    return agg.join(F.broadcast(nd), "lang").select(
        "lang",
        "n_docs",
        "n_words",
        "n_subwords",
        "n_word_chars",
        R.r(F.col("n_subwords") * F.lit(1.0) / F.col("n_words"), 4).alias(
            "fertility"
        ),
        R.r(
            F.col("n_word_chars") * F.lit(1.0) / F.col("n_subwords"), 4
        ).alias("chars_per_subword"),
    )


# --- verbatim-contamination run length ---------------------------------------
# decontaminate_vs_benchmark scores OVERLAP FRACTION; what it cannot
# distinguish is scattered shingle hits from a verbatim lifted span.
# This op measures the latter: per train doc, the LONGEST CONSECUTIVE
# RUN of benchmark-matching 3-gram shingles over the doc's POSITIONAL
# shingle sequence (no distinct — order matters), via the classic
# gaps-and-islands grouping pos − row_number(). Benchmark = the src0
# slice, hashed to 8-hex-nibble ints exactly as the decontaminate
# oracle does (dedup.py _DECON_ORACLE). Output: top-20 train docs by
# run length (doc_id tie-break). Scale: one positional shingle scan
# streamed against the broadcast benchmark set (externally fixed-size
# — the decontaminate allowlist rationale), islands group per doc.

_RUN_TOPN = 20

_RUN_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS t
    FROM documents
),
pos_sh AS (
    SELECT doc_id,
           unnest(generate_series(1, len(t) - 2)) AS pos
    FROM toks WHERE source <> 'src0'
),
train AS (
    SELECT p.doc_id, p.pos,
           ('0x' || substr(md5(array_to_string(tk.t[p.pos : p.pos + 2],
                                               ' ')), 1, 8))::BIGINT
               AS sh_h
    FROM pos_sh p JOIN toks tk ON tk.doc_id = p.doc_id
),
bench AS (
    SELECT DISTINCT ('0x' || substr(md5(array_to_string(t[i : i + 2],
                                                        ' ')), 1, 8))::BIGINT
               AS sh_h
    FROM (SELECT t, unnest(generate_series(1, len(t) - 2)) AS i
          FROM toks WHERE source = 'src0') b
),
m AS (SELECT tr.doc_id, tr.pos FROM train tr JOIN bench USING (sh_h)),
isl AS (
    SELECT doc_id,
           pos - row_number() OVER (PARTITION BY doc_id
                                    ORDER BY pos) AS grp
    FROM m
),
runs AS (
    SELECT doc_id, grp, count(*)::BIGINT AS run_len
    FROM isl GROUP BY 1, 2
),
per_doc AS (
    SELECT doc_id, max(run_len)::BIGINT AS longest_run,
           sum(run_len)::BIGINT AS n_matched
    FROM runs GROUP BY 1
)
SELECT doc_id, longest_run, n_matched
FROM per_doc
ORDER BY longest_run DESC, doc_id
LIMIT {_RUN_TOPN}
"""


@register("contamination_longest_run", oracle=_RUN_ORACLE)
def contamination_longest_run(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from swat_mapreduce_spark.functions.text import shingles_from_tokens
    from swat_mapreduce_spark.operators.dedup import shingle_uint
    from swat_mapreduce_spark.sources.readers import fan_out

    docs = fan_out(read_table(spark, sf_dir, "documents"))
    toked = docs.select(
        "doc_id", "source", ws_tokens(F.col("text")).alias("tk")
    )
    # POSITIONAL shingles (no array_distinct): posexplode gives the
    # 0-based index; +1 mirrors the oracle's generate_series positions
    sh = toked.select(
        "doc_id",
        "source",
        F.posexplode(shingles_from_tokens(F.col("tk"), 3)).alias(
            "i0", "shingle"
        ),
    ).select(
        "doc_id",
        "source",
        (F.col("i0") + 1).alias("pos"),
        shingle_uint(F.col("shingle")).alias("sh_h"),
    )
    bench = (
        sh.filter(F.col("source") == "src0")
        .select("sh_h")
        .distinct()
    )
    m = (
        sh.filter(F.col("source") != "src0")
        .join(F.broadcast(bench), "sh_h")
        .select("doc_id", "pos")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    isl = m.select(
        "doc_id", (F.col("pos") - F.row_number().over(w)).alias("grp")
    )
    runs = isl.groupBy("doc_id", "grp").agg(
        F.count(F.lit(1)).cast("long").alias("run_len")
    )
    return (
        runs.groupBy("doc_id")
        .agg(
            F.max("run_len").cast("long").alias("longest_run"),
            F.sum("run_len").cast("long").alias("n_matched"),
        )
        .orderBy(F.desc("longest_run"), F.asc("doc_id"))
        .limit(_RUN_TOPN)
    )


# --- Wilson score interval on per-source keep rates ---------------------------
# bootstrap_ci_keep_rate resamples the GLOBAL keep rate; per-source
# monitoring wants the closed-form interval pipelines actually chart.
# Wilson (1927) at z = 1.96 on the exact (kept, total) integers per
# source — the whole interval is one deterministic IEEE expression
# tree evaluated identically by both engines, snapped at 4dp.

_WILSON_Z = 1.96

_WILSON_ORACLE = f"""
WITH {{score_cte}},
keep_s AS (
    SELECT d.source,
           count(*)::BIGINT AS n,
           sum(CASE WHEN s.score >= 0.5 THEN 1 ELSE 0 END)::BIGINT AS k
    FROM scored s JOIN documents d ON d.doc_id = s.doc_id
    GROUP BY 1
)
SELECT source, n, k,
       round(k * 1.0 / n * 10000) / 10000 + 0.0 AS keep_rate,
       round(((k * 1.0 / n + {_WILSON_Z} * {_WILSON_Z} / (2 * n))
              / (1 + {_WILSON_Z} * {_WILSON_Z} / n)
              - {_WILSON_Z} * sqrt((k * 1.0 / n) * (1 - k * 1.0 / n) / n
                    + {_WILSON_Z} * {_WILSON_Z} / (4.0 * n * n))
                / (1 + {_WILSON_Z} * {_WILSON_Z} / n)) * 10000) / 10000
           + 0.0 AS wilson_lo,
       round(((k * 1.0 / n + {_WILSON_Z} * {_WILSON_Z} / (2 * n))
              / (1 + {_WILSON_Z} * {_WILSON_Z} / n)
              + {_WILSON_Z} * sqrt((k * 1.0 / n) * (1 - k * 1.0 / n) / n
                    + {_WILSON_Z} * {_WILSON_Z} / (4.0 * n * n))
                / (1 + {_WILSON_Z} * {_WILSON_Z} / n)) * 10000) / 10000
           + 0.0 AS wilson_hi
FROM keep_s
"""


def _wilson_oracle() -> str:
    from swat_mapreduce_spark.queries.model_evals import _SCORE_DUCK

    return _WILSON_ORACLE.format(score_cte=_SCORE_DUCK)


@register("wilson_ci_keep_rate", oracle=_wilson_oracle())
def wilson_ci_keep_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from swat_mapreduce_spark.queries.model_evals import _scored

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source"
    )
    scored = _scored(spark, sf_dir)
    ks = (
        scored.join(docs, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("score") >= 0.5, 1).otherwise(0))
            .cast("long")
            .alias("k"),
        )
    )
    z = F.lit(_WILSON_Z)
    p = F.col("k") * F.lit(1.0) / F.col("n")
    denom = F.lit(1.0) + z * z / F.col("n")
    center = (p + z * z / (F.lit(2) * F.col("n"))) / denom
    hw = (
        z
        * F.sqrt(
            p * (F.lit(1) - p) / F.col("n")
            + z * z / (F.lit(4.0) * F.col("n") * F.col("n"))
        )
        / denom
    )
    return ks.select(
        "source",
        "n",
        "k",
        R.r(p, 4).alias("keep_rate"),
        R.r(center - hw, 4).alias("wilson_lo"),
        R.r(center + hw, 4).alias("wilson_hi"),
    )


# --- duplicate-cluster size histogram ----------------------------------------
# The shape of exact duplication, not just its total: per cluster size
# s (md5(text) groups), how many clusters and how many documents sit
# at that size. The histogram is the number dedup reports actually
# quote ("X% of docs are in clusters of 2+"). Rows are bounded by the
# number of DISTINCT cluster sizes (≤ largest dup count). Exact
# integers; one scalar total broadcast.

_DUPHIST_ORACLE = """
WITH cl AS (
    SELECT md5(text) AS hsh, count(*)::BIGINT AS s
    FROM documents GROUP BY 1
),
tot AS (SELECT count(*)::BIGINT AS n FROM documents)
SELECT cl.s AS cluster_size,
       count(*)::BIGINT AS n_clusters,
       (cl.s * count(*))::BIGINT AS n_docs,
       round(cl.s * count(*) * 10000.0 / tot.n) / 10000 + 0.0
           AS share_docs
FROM cl, tot
GROUP BY cl.s, tot.n
"""


@register("dup_cluster_size_histogram", oracle=_DUPHIST_ORACLE)
def dup_cluster_size_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    cl = docs.groupBy(F.md5("text").alias("hsh")).agg(
        F.count(F.lit(1)).cast("long").alias("s")
    )
    tot = docs.agg(F.count(F.lit(1)).cast("long").alias("n"))
    return (
        cl.groupBy("s")
        .agg(F.count(F.lit(1)).cast("long").alias("n_clusters"))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("s").alias("cluster_size"),
            "n_clusters",
            (F.col("s") * F.col("n_clusters"))
            .cast("long")
            .alias("n_docs"),
            (
                F.round(
                    F.col("s")
                    * F.col("n_clusters")
                    * F.lit(10000.0)
                    / F.col("n")
                )
                / F.lit(10000.0)
                + F.lit(0.0)
            ).alias("share_docs"),
        )
    )


# --- dedup yield curve over corpus growth ------------------------------------
# "How much does exact dedup save as the corpus scales?" — bucket the
# corpus into 10 doc_id deciles (ingestion order proxy), mark each doc
# a duplicate iff it is NOT the min-doc_id holder of its md5(text)
# cluster, and report the per-decile duplicate rate. The rising curve
# is the capacity-planning number incremental dedup exists for. The
# firsts join is hash-keyed (corpus map — deliberately NO broadcast,
# gotcha 15); the decile cut uses one scalar max broadcast.

_YIELD_ORACLE = """
WITH mx AS (SELECT max(doc_id) + 1 AS m FROM documents),
d AS (
    SELECT doc_id, md5(text) AS hsh,
           least(9, doc_id * 10 // mx.m)::BIGINT AS decile
    FROM documents, mx
),
firsts AS (SELECT hsh, min(doc_id) AS fid FROM d GROUP BY 1)
SELECT d.decile,
       count(*)::BIGINT AS n_docs,
       sum(CASE WHEN d.doc_id <> f.fid THEN 1 ELSE 0 END)::BIGINT
           AS n_dups,
       round(sum(CASE WHEN d.doc_id <> f.fid THEN 1 ELSE 0 END)
             * 10000.0 / count(*)) / 10000 + 0.0 AS dup_rate
FROM d JOIN firsts f USING (hsh)
GROUP BY 1
"""


@register("dedup_yield_by_decile", oracle=_YIELD_ORACLE)
def dedup_yield_by_decile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", F.md5("text").alias("hsh")
    )
    mx = docs.agg((F.max("doc_id") + 1).cast("long").alias("m"))
    d = docs.crossJoin(F.broadcast(mx)).select(
        "doc_id",
        "hsh",
        F.least(
            F.lit(9), F.expr("doc_id * 10 div m")
        )
        .cast("long")
        .alias("decile"),
    )
    firsts = d.groupBy("hsh").agg(F.min("doc_id").alias("fid"))
    dup = F.when(F.col("doc_id") != F.col("fid"), 1).otherwise(0)
    return (
        d.join(firsts, "hsh")
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(dup).cast("long").alias("n_dups"),
            (
                F.round(F.sum(dup) * F.lit(10000.0) / F.count(F.lit(1)))
                / F.lit(10000.0)
                + F.lit(0.0)
            ).alias("dup_rate"),
        )
    )


# --- lexical burstiness of the head tokens ------------------------------------
# Church & Gale: token occurrences are bursty — a term that appears
# once in a document tends to appear again. For the top-20 tokens by
# corpus count (token tie-break): document frequency, mean occurrences
# WHEN PRESENT (total/df — the adaptation ratio), and the
# variance-to-mean ratio over containing documents ((ss/df − m²)/m,
# Fano factor > 1 = bursty). All inputs are exact integer sums; the
# two statistics are identical IEEE trees snapped at 4dp.

_BURST_TOPN = 20

_BURST_ORACLE = f"""
WITH tok AS (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                              x -> len(x) > 0)) AS w
    FROM documents
),
cnt AS (SELECT w, doc_id, count(*)::BIGINT AS c FROM tok GROUP BY 1, 2),
tot AS (
    SELECT w, sum(c)::BIGINT AS total, count(*)::BIGINT AS df,
           sum(c * c)::BIGINT AS ss
    FROM cnt GROUP BY 1
),
top AS (SELECT * FROM tot ORDER BY total DESC, w LIMIT {_BURST_TOPN})
SELECT w AS token, total, df AS n_docs,
       round(total * 1.0 / df * 10000) / 10000 + 0.0
           AS mean_when_present,
       round((ss * 1.0 / df - (total * 1.0 / df) * (total * 1.0 / df))
             / (total * 1.0 / df) * 10000) / 10000 + 0.0
           AS fano_when_present
FROM top
"""


@register("token_burstiness_topk", oracle=_BURST_ORACLE)
def token_burstiness_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    cnt = (
        docs.select(
            "doc_id", F.explode(ws_tokens(F.col("text"))).alias("w")
        )
        .groupBy("w", "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    tot = cnt.groupBy("w").agg(
        F.sum("c").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("ss"),
    )
    top = tot.orderBy(F.desc("total"), F.asc("w")).limit(_BURST_TOPN)
    mean = F.col("total") * F.lit(1.0) / F.col("df")
    return top.select(
        F.col("w").alias("token"),
        "total",
        F.col("df").alias("n_docs"),
        R.r(mean, 4).alias("mean_when_present"),
        R.r(
            (F.col("ss") * F.lit(1.0) / F.col("df") - mean * mean) / mean,
            4,
        ).alias("fano_when_present"),
    )
