"""Text-analysis queries for LLM data pipelines + DuckDB oracles:
language-ID heuristic, quality scoring, token counting, document
fingerprinting. All pure JVM expressions (no Python UDFs)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from swat_mapreduce_spark.functions import rounding as R

from swat_mapreduce_spark.functions.text import char_shingles, ws_tokens
from swat_mapreduce_spark.queries import register
from swat_mapreduce_spark.sources.readers import read_table

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is"]

# language marker tokens for the n-gram-ish language-ID heuristic;
# fixed priority order breaks ties (first wins).
LANG_MARKERS: list[tuple[str, list[str]]] = [
    ("en", ["the", "a", "is", "and"]),
    ("es", ["el", "la", "de", "que"]),
    ("de", ["der", "die", "und", "das"]),
    ("fr", ["le", "la", "et", "les"]),
    ("zh", ["的", "是", "了", "在"]),
]


# --- quality scoring -------------------------------------------------------
# quality = 0.4*len_score + 0.3*uniq_ratio + 0.3*(1 - punct_ratio)
# len_score = least(1, n_tokens/50)
_QUALITY_ORACLE = r"""
WITH t AS (
    SELECT doc_id, text, length(text) AS n_chars_calc,
           string_split_regex(trim(text), '\s+') AS toks
    FROM documents
),
m AS (
    SELECT doc_id, n_chars_calc,
           len(toks) AS n_tokens,
           len(list_distinct(toks)) AS n_uniq,
           length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS n_punct,
           len(list_filter(toks, x -> list_contains({SW}, x))) AS n_stop
    FROM t
)
SELECT doc_id, n_chars_calc, n_tokens, n_uniq, n_punct, n_stop,
       round(n_uniq::DOUBLE / n_tokens, 4) AS uniq_ratio,
       round(n_stop::DOUBLE / n_tokens, 4) AS stop_ratio,
       round(0.4 * least(1.0, n_tokens / 50.0)
             + 0.3 * (n_uniq::DOUBLE / n_tokens)
             + 0.3 * (1.0 - n_punct::DOUBLE / n_chars_calc), 4) AS quality
FROM m
""".replace("{SW}", "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]")


@register("text_quality", oracle=_QUALITY_ORACLE)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    toks = ws_tokens(F.col("text"))
    n_tokens = F.size(toks).cast("long")
    n_uniq = F.size(F.array_distinct(toks)).cast("long")
    n_chars = F.length("text").cast("long")
    n_punct = F.length(
        F.regexp_replace("text", r"[A-Za-z0-9\s]", "")
    ).cast("long")
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(
        F.filter(toks, lambda x: F.array_contains(stop_arr, x))
    ).cast("long")
    quality = (
        0.4 * F.least(F.lit(1.0), n_tokens / 50.0)
        + 0.3 * (n_uniq.cast("double") / n_tokens)
        + 0.3 * (1.0 - n_punct.cast("double") / n_chars)
    )
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars_calc"),
        n_tokens.alias("n_tokens"),
        n_uniq.alias("n_uniq"),
        n_punct.alias("n_punct"),
        n_stop.alias("n_stop"),
        R.r(n_uniq.cast("double") / n_tokens, 4).alias("uniq_ratio"),
        R.r(n_stop.cast("double") / n_tokens, 4).alias("stop_ratio"),
        R.r(quality, 4).alias("quality"),
    )


# --- language-ID heuristic -------------------------------------------------
def _langid_oracle() -> str:
    cnt_cols = []
    for lang, markers in LANG_MARKERS:
        arr = "[" + ", ".join(f"'{m}'" for m in markers) + "]"
        cnt_cols.append(
            f"len(list_filter(toks, x -> list_contains({arr}, x))) AS c_{lang}"
        )
    cases = " ".join(
        f"WHEN c_{lang} = m THEN '{lang}'" for lang, _ in LANG_MARKERS
    )
    return rf"""
WITH t AS (
    SELECT doc_id, lang, string_split_regex(trim(text), '\s+') AS toks
    FROM documents
),
c AS (
    SELECT doc_id, lang, {", ".join(cnt_cols)}
    FROM t
),
g AS (
    SELECT doc_id, lang,
           greatest({", ".join("c_" + lang for lang, _ in LANG_MARKERS)}) AS m,
           {", ".join("c_" + lang for lang, _ in LANG_MARKERS)}
    FROM c
)
SELECT doc_id, lang,
       CASE {cases} END AS lang_guess,
       (CASE {cases} END = lang) AS is_match
FROM g
"""


@register("text_langid", oracle=_langid_oracle())
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    toks = ws_tokens(F.col("text"))
    counts = {}

    def _contains_counter(arr):
        # NB: must return a ONE-arg lambda — F.filter treats a 2-arg
        # callable as (element, index).
        return lambda x: F.array_contains(arr, x)

    for lang, markers in LANG_MARKERS:
        arr = F.array(*[F.lit(m) for m in markers])
        counts[lang] = F.size(F.filter(toks, _contains_counter(arr))).cast(
            "long"
        )
    m = F.greatest(*counts.values())
    guess = None
    for lang, _ in reversed(LANG_MARKERS):
        if guess is None:
            guess = F.when(counts[lang] == m, F.lit(lang))
        else:
            guess = F.when(counts[lang] == m, F.lit(lang)).otherwise(guess)
    return docs.select(
        "doc_id",
        "lang",
        guess.alias("lang_guess"),
        (guess == F.col("lang")).alias("is_match"),
    )


# --- token counting --------------------------------------------------------
_TOKENS_ORACLE = r"""
SELECT doc_id,
       len(string_split_regex(trim(text), '\s+')) AS n_ws_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe_ish,
       ceil(length(text) / 4.0)::BIGINT AS est_tokens
FROM documents
"""


@register("token_count", oracle=_TOKENS_ORACLE)
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(ws_tokens(F.col("text"))).cast("long").alias("n_ws_tokens"),
        F.size(
            F.regexp_extract_all(
                "text", F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0
            )
        )
        .cast("long")
        .alias("n_bpe_ish"),
        F.ceil(F.length("text") / 4.0).cast("long").alias("est_tokens"),
    )


# --- document fingerprint (rolling-hash / winnowing-lite) ------------------
_FP_ORACLE = """
WITH fp_idx AS (
    SELECT doc_id, lower(text) AS t,
           unnest(generate_series(1, length(text) - 4)) AS i
    FROM documents
),
shing AS (
    SELECT doc_id, substr(t, i, 5) AS sh FROM fp_idx
)
SELECT doc_id,
       min(md5(sh)) AS fingerprint,
       ('0x' || substr(min(md5(sh)), 1, 8))::BIGINT AS fp64
FROM shing
GROUP BY doc_id
"""


@register("doc_fingerprint", oracle=_FP_ORACLE)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from swat_mapreduce_spark.functions.text import (
        char_array,
        char_shingles_from_array,
    )

    docs = read_table(spark, sf_dir, "documents")
    # lowercased CODEPOINT ARRAY materialized first (r12): the shingle
    # transform slices the array per position (O(len) total) instead
    # of per-index substring over the string (O(len²) per doc); the
    # materialized projection also keeps the split from re-evaluating
    # per shingle element (functions/text.py PERF note)
    lowered = docs.select(
        "doc_id", char_array(F.lower(F.col("text"))).alias("cs")
    )
    fp_t = lowered.select(
        "doc_id",
        F.array_min(
            F.transform(char_shingles_from_array("cs", 5), F.md5)
        ).alias("fp"),
    )
    return fp_t.select(
        "doc_id",
        F.col("fp").alias("fingerprint"),
        F.conv(F.substring("fp", 1, 8), 16, 10).cast("bigint").alias("fp64"),
    )


# --- end-to-end corpus cleaning: dedup → quality gate → stats ------------
# The composite a training-data pipeline actually runs: exact-dedup
# (keep lowest doc_id per identical text), drop low-quality and
# too-short docs, emit per-(lang, source) corpus stats. One window
# shuffle (dedup by text) + one agg shuffle; the quality math is the
# same JVM expression pack as text_quality.
_CORPUS_CLEAN_ORACLE = r"""
WITH keeper AS (
    SELECT doc_id, lang, source, text,
           row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
    FROM documents
),
q AS (
    SELECT doc_id, lang, source,
           len(string_split_regex(trim(text), '\s+')) AS n_tokens,
           0.4 * least(1.0, len(string_split_regex(trim(text), '\s+')) / 50.0)
           + 0.3 * (len(list_distinct(string_split_regex(trim(text), '\s+')))::DOUBLE
                    / len(string_split_regex(trim(text), '\s+')))
           + 0.3 * (1.0 - length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g'))::DOUBLE
                    / length(text)) AS quality
    FROM keeper WHERE rn = 1
)
SELECT lang, source,
       count(*) AS n_docs,
       round(avg(quality), 4) AS avg_quality,
       sum(n_tokens)::BIGINT AS total_tokens
FROM q
WHERE quality >= 0.5 AND n_tokens >= 5
GROUP BY lang, source
"""


@register("llm_corpus_clean", oracle=_CORPUS_CLEAN_ORACLE)
def llm_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = read_table(spark, sf_dir, "documents")
    # dedup key is md5(text), NOT text: windowing by the raw column
    # would shuffle full document bodies as partition keys at corpus
    # scale. 128-bit digest keeps collision odds negligible even at
    # 1e12 docs (a 64-bit hash would not: birthday bound ~5e4
    # expected collisions there).
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    kept = (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    toks = ws_tokens(F.col("text"))
    n_tokens = F.size(toks).cast("long")
    n_uniq = F.size(F.array_distinct(toks)).cast("long")
    n_chars = F.length("text").cast("long")
    n_punct = F.length(
        F.regexp_replace("text", r"[A-Za-z0-9\s]", "")
    ).cast("long")
    quality = (
        0.4 * F.least(F.lit(1.0), n_tokens / 50.0)
        + 0.3 * (n_uniq.cast("double") / n_tokens)
        + 0.3 * (1.0 - n_punct.cast("double") / n_chars)
    )
    return (
        kept.select("lang", "source", n_tokens.alias("n_tokens"),
                    quality.alias("quality"))
        .filter((F.col("quality") >= 0.5) & (F.col("n_tokens") >= 5))
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            R.r(F.avg("quality"), 4).alias("avg_quality"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )


# --- corpus token-count histogram (training-data analysis staple) --------
_TOKEN_HIST_ORACLE = r"""
WITH t AS (
    SELECT len(string_split_regex(trim(text), '\s+')) AS n_tokens
    FROM documents
)
SELECT (n_tokens // 10) * 10 AS bucket_lo,
       count(*) AS n_docs,
       sum(n_tokens)::BIGINT AS total_tokens
FROM t GROUP BY bucket_lo
"""


@register("corpus_token_histogram", oracle=_TOKEN_HIST_ORACLE)
def corpus_token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    n_tokens = F.size(ws_tokens(F.col("text"))).cast("long")
    return (
        docs.select((F.floor(n_tokens / 10) * 10).alias("bucket_lo"),
                    n_tokens.alias("n_tokens"))
        .groupBy("bucket_lo")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )


# --- deterministic stratified sampling (corpus mixture weighting) --------
# Per-source keep rates via the shared md5-unit hash — the reproducible
# form of sampleBy for corpus mixing: upweight src0/src1, downsample
# the rest, no RNG so reruns and the oracle agree exactly.
from swat_mapreduce_spark.functions import hashing as _H

_STRAT_H = f"({_H.duck_hash_uint(_H.sql_salted('doc_id', chr(39) + 'samp' + chr(39)), 8)} / {float(16 ** 8)})"
_STRAT_ORACLE = f"""
WITH keep AS (
    SELECT doc_id, source,
           {_STRAT_H} < CASE WHEN source IN ('src0', 'src1') THEN 0.9 ELSE 0.3 END
               AS kept
    FROM documents
)
SELECT source, count(*) AS n_kept
FROM keep WHERE kept GROUP BY source
"""


@register("stratified_sample_sources", oracle=_STRAT_ORACLE)
def stratified_sample_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    from swat_mapreduce_spark.functions import hashing as H

    docs = read_table(spark, sf_dir, "documents")
    rate = F.when(
        F.col("source").isin("src0", "src1"), F.lit(0.9)
    ).otherwise(F.lit(0.3))
    kept = docs.filter(H.hash_unit(F.col("doc_id"), "samp", 8) < rate)
    return kept.groupBy("source").agg(F.count(F.lit(1)).alias("n_kept"))


# --- language-ID confusion matrix -------------------------------------------
# The eval rollup of text_langid: true-lang × guessed-lang cell
# counts with per-true-lang recall shares — the |langs|²-bounded
# confusion matrix every classifier audit starts from. Reuses the
# marker-count heuristic (same tie rule) and reduces the corpus in
# ONE map-side-combined aggregate.
def _langid_confusion_oracle() -> str:
    base = _langid_oracle().strip()
    return f"""
WITH base AS ({base}),
cells AS (
    SELECT lang, lang_guess, count(*)::BIGINT AS n
    FROM base GROUP BY lang, lang_guess
),
tot AS (SELECT lang, sum(n)::BIGINT AS n_true FROM cells GROUP BY lang)
SELECT c.lang, c.lang_guess, c.n, t.n_true,
       round(c.n * 1.0 / t.n_true * 10000) / 10000 + 0.0 AS row_share,
       (c.lang = c.lang_guess) AS is_diagonal
FROM cells c JOIN tot t USING (lang)
"""


@register("langid_confusion_matrix", oracle=_langid_confusion_oracle())
def langid_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = text_langid(spark, sf_dir)
    cells = base.groupBy("lang", "lang_guess").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = cells.groupBy("lang").agg(F.sum("n").alias("n_true"))
    return cells.join(F.broadcast(tot), "lang").select(
        "lang",
        "lang_guess",
        "n",
        "n_true",
        R.r(F.col("n") * 1.0 / F.col("n_true"), 4).alias("row_share"),
        (F.col("lang") == F.col("lang_guess")).alias("is_diagonal"),
    )
