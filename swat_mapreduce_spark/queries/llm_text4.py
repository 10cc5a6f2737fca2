"""Corpus-analytics pack 4: novelty decay, domain-mix drift,
tokenizer fertility, dedup yield — the reporting layer a training-data
pipeline runs continuously over its corpus. All pure JVM DataFrame
ops; every aggregate output is bounded (deciles / sources / langs),
so driver and downstream state are constant at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from swat_mapreduce_spark.functions import rounding as R
from swat_mapreduce_spark.functions import text as T
from swat_mapreduce_spark.queries import register
from swat_mapreduce_spark.sources.readers import read_table

# Shared DuckDB CTE: distinct 3-word shingles per doc (same convention
# as queries/dedup.py's _SH_DUCK, without the lang column).
_SH4_DUCK = r"""
toks AS (
    SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
    FROM documents
),
tok_idx AS (
    SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
    FROM toks
),
sh AS (
    SELECT DISTINCT doc_id, array_to_string(t[i : i + 2], ' ') AS shingle
    FROM tok_idx
)
"""


# --- corpus novelty decay --------------------------------------------------
# "How fast does a crawl stop contributing new content?" — for docs in
# doc_id (ingestion) order, bucket into 10 deciles and report the
# fraction of each decile's distinct shingles whose FIRST corpus
# occurrence falls in that decile's own docs. A healthy fresh crawl
# stays high; a saturated/duplicated one decays toward 0 — the curve
# that decides when to stop crawling a source.
# Shape (r5 rewrite): ONE explode→distinct (shuffle on (doc,
# shingle)), ONE window — novel := doc_id = min(doc_id) OVER
# (PARTITION BY shingle) — on a shingle shuffle, then a per-doc
# aggregate and a 10-row rollup. Replaces the r4 agg+join-back form,
# which computed the shingle subtree TWICE (once per join leg);
# measured 4.5 s → ~3 s at sf0.1. All shingle-keyed — no
# corpus-squared term anywhere.
#
# r6 (VERDICT r5 #8): shingles are hashed to a 60-bit int (15 md5
# nibbles, the shared cross-engine hash) BEFORE the distinct + window,
# so both shuffles move 8-byte keys instead of ~20-byte strings —
# ~5x fewer shuffle bytes for long shingles. 60 bits keep the
# collision expectation ~n²/2^61 ≈ 4e-8 at a 10M-shingle corpus
# (and a collision would only merge two shingles' first-seen docs —
# a 1-ulp novelty_rate perturbation, identical on both engines since
# the hash is shared). Output verified bit-identical to the string
# form at sf0.01 AND sf0.1.
_NOVELTY_ORACLE = f"""
WITH {_SH4_DUCK},
shh AS (
    SELECT DISTINCT doc_id,
           ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS sh_h
    FROM sh
),
mx AS (SELECT max(doc_id) AS m FROM documents),
nov AS (
    SELECT doc_id,
           (doc_id = min(doc_id) OVER (PARTITION BY sh_h)) AS novel
    FROM shh
),
per_doc AS (
    SELECT doc_id,
           count(*) AS n_sh,
           count(*) FILTER (WHERE novel) AS n_novel
    FROM nov
    GROUP BY doc_id
)
SELECT (p.doc_id * 10 // (mx.m + 1))::INT AS decile,
       count(*)::BIGINT AS n_docs,
       sum(n_sh)::BIGINT AS n_shingles,
       sum(n_novel)::BIGINT AS n_novel,
       round(sum(n_novel) * 10000.0 / sum(n_sh)) / 10000 + 0.0
           AS novelty_rate
FROM per_doc p CROSS JOIN mx
GROUP BY 1
"""


@register("ngram_novelty_decay", oracle=_NOVELTY_ORACLE)
def ngram_novelty_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from swat_mapreduce_spark.functions import hashing as _H

    docs = read_table(spark, sf_dir, "documents")
    # Single-scan form: the r4 agg+join-back computed this explode→
    # distinct subtree twice (once per join leg); the window evaluates
    # min(doc_id) per shingle partition in-place, so the subtree runs
    # ONCE and persist-vs-recompute stops being a question at all.
    # Shingles hashed to 60-bit ints BEFORE the distinct so both the
    # distinct and window shuffles move 8-byte keys (r6, header note).
    # per-doc dedup happens NARROWLY via array_distinct before the
    # explode, so the post-explode rows are already (doc, shingle)-
    # distinct and no global distinct shuffle is needed — the window's
    # sh_h shuffle is the query's only shingle-volume exchange.
    # Hash inside the array (single-param lambda — safe per CLAUDE.md
    # gotcha 1; generators cannot nest in expressions so the hash
    # cannot wrap the explode directly).
    # tokens materialized in their own projection first: the inline
    # word_shingles(text) form re-evaluates the split per shingle
    # element (functions/text.py PERF note) — measured 4.4 s for the
    # bare scan at sf0.1 vs ~1 s with tokens materialized.
    toked = docs.select("doc_id", T.ws_tokens(F.col("text")).alias("toks"))
    sh = toked.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    T.shingles_from_tokens(F.col("toks")),
                    lambda s: _H.hash_uint(s, nibbles=15),
                )
            )
        ).alias("sh_h"),
    )
    novel = F.col("doc_id") == F.min("doc_id").over(
        Window.partitionBy("sh_h")
    )
    per_doc = (
        sh.select("doc_id", novel.alias("novel"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_sh"),
            F.count(F.when(F.col("novel"), 1)).alias("n_novel"),
        )
    )
    mx = docs.agg(F.max("doc_id").alias("m"))
    return (
        per_doc.crossJoin(F.broadcast(mx))
        .groupBy(
            (F.col("doc_id") * 10 / (F.col("m") + 1))
            .cast("long")
            .cast("int")
            .alias("decile")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_sh").alias("n_shingles"),
            F.sum("n_novel").alias("n_novel"),
            (
                F.round(F.sum("n_novel") * 10000.0 / F.sum("n_sh"))
                / 10000.0
                + 0.0
            ).alias("novelty_rate"),
        )
    )


# --- domain-mix drift (KL / total variation) -------------------------------
# Mix governance: has the source distribution drifted between the
# first and second half of the corpus (by ingestion order)? Reports
# per-source Laplace-smoothed shares p (first half) and q (second
# half) plus the per-source KL contribution, and the corpus-level
# KL(p‖q) and total-variation distance on every row (bounded
# |sources|-row output; the totals ride a broadcast 1-row aggregate).
_KL_ORACLE = """
WITH mx AS (SELECT max(doc_id) AS m FROM documents),
halves AS (
    SELECT source, doc_id * 2 < (SELECT m + 1 FROM mx) AS first_half
    FROM documents
),
c AS (
    SELECT source,
           count(*) FILTER (WHERE first_half) AS c1,
           count(*) FILTER (WHERE NOT first_half) AS c2
    FROM halves GROUP BY source
),
tot AS (SELECT sum(c1) AS n1, sum(c2) AS n2, count(*) AS s FROM c),
pq AS (
    SELECT c.source, c.c1, c.c2,
           (c.c1 + 1.0) / (t.n1 + t.s) AS p,
           (c.c2 + 1.0) / (t.n2 + t.s) AS q
    FROM c CROSS JOIN tot t
),
terms AS (
    SELECT source, c1, c2, p, q,
           p * ln(p / q) AS kl_term,
           abs(p - q) / 2 AS tv_term
    FROM pq
),
g AS (SELECT sum(kl_term) AS kl, sum(tv_term) AS tv FROM terms)
SELECT t.source,
       t.c1::BIGINT AS n_first, t.c2::BIGINT AS n_second,
       round(t.p * 1000000) / 1000000 + 0.0 AS p,
       round(t.q * 1000000) / 1000000 + 0.0 AS q,
       round(t.kl_term * 1000000) / 1000000 + 0.0 AS kl_term,
       round(g.kl * 1000000) / 1000000 + 0.0 AS total_kl,
       round(g.tv * 1000000) / 1000000 + 0.0 AS total_tv
FROM terms t CROSS JOIN g
"""


@register("domain_mix_kl_drift", oracle=_KL_ORACLE)
def domain_mix_kl_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    mx = docs.agg(F.max("doc_id").alias("m"))
    halves = docs.crossJoin(F.broadcast(mx)).select(
        "source", (F.col("doc_id") * 2 < F.col("m") + 1).alias("first_half")
    )
    c = halves.groupBy("source").agg(
        F.count(F.when(F.col("first_half"), 1)).alias("c1"),
        F.count(F.when(~F.col("first_half"), 1)).alias("c2"),
    )
    tot = c.agg(
        F.sum("c1").alias("n1"),
        F.sum("c2").alias("n2"),
        F.count(F.lit(1)).alias("s"),
    )
    pq = c.crossJoin(F.broadcast(tot)).select(
        "source",
        "c1",
        "c2",
        ((F.col("c1") + 1.0) / (F.col("n1") + F.col("s"))).alias("p"),
        ((F.col("c2") + 1.0) / (F.col("n2") + F.col("s"))).alias("q"),
    )
    terms = pq.select(
        "source",
        "c1",
        "c2",
        "p",
        "q",
        (F.col("p") * F.log(F.col("p") / F.col("q"))).alias("kl_term"),
        (F.abs(F.col("p") - F.col("q")) / 2).alias("tv_term"),
    )
    g = terms.agg(
        F.sum("kl_term").alias("kl"), F.sum("tv_term").alias("tv")
    )
    return terms.crossJoin(F.broadcast(g)).select(
        "source",
        F.col("c1").cast("long").alias("n_first"),
        F.col("c2").cast("long").alias("n_second"),
        R.r("p", 6).alias("p"),
        R.r("q", 6).alias("q"),
        R.r("kl_term", 6).alias("kl_term"),
        R.r("kl", 6).alias("total_kl"),
        R.r("tv", 6).alias("total_tv"),
    )


# --- tokenizer fertility audit ---------------------------------------------
# Tokenizer-selection staple: per language, how many BPE-ish subword
# tokens per whitespace word (fertility), characters per subword
# token, and the signed error of the industry "chars/4" estimate —
# the numbers that decide whether a vocab underserves a language.
# One aggregation shuffle on lang; all token math is narrow JVM regex.
_FERTILITY_ORACLE = r"""
WITH m AS (
    SELECT lang,
           len(string_split_regex(trim(text), '\s+')) AS n_ws,
           len(regexp_extract_all(text,
               '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe,
           length(text) AS n_chars,
           ceil(length(text) / 4.0)::BIGINT AS est
    FROM documents
)
SELECT lang,
       count(*)::BIGINT AS n_docs,
       sum(n_ws)::BIGINT AS ws_tokens,
       sum(n_bpe)::BIGINT AS bpe_tokens,
       round(sum(n_bpe) * 10000.0 / sum(n_ws)) / 10000 + 0.0
           AS fertility,
       round(sum(n_chars) * 10000.0 / sum(n_bpe)) / 10000 + 0.0
           AS chars_per_token,
       round((sum(est) - sum(n_bpe)) * 10000.0 / sum(n_bpe)) / 10000
           + 0.0 AS est_rel_err
FROM m GROUP BY lang
"""


@register("tokenizer_fertility_audit", oracle=_FERTILITY_ORACLE)
def tokenizer_fertility_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    m = docs.select(
        "lang",
        F.size(T.ws_tokens(F.col("text"))).alias("n_ws"),
        F.size(
            F.regexp_extract_all(
                F.col("text"),
                F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"),
                0,  # whole-match group (Spark defaults to group 1)
            )
        ).alias("n_bpe"),
        F.length("text").alias("n_chars"),
        F.ceil(F.length("text") / 4.0).cast("long").alias("est"),
    )
    return m.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_ws").alias("ws_tokens"),
        F.sum("n_bpe").alias("bpe_tokens"),
        (
            F.round(F.sum("n_bpe") * 10000.0 / F.sum("n_ws")) / 10000.0
            + 0.0
        ).alias("fertility"),
        (
            F.round(F.sum("n_chars") * 10000.0 / F.sum("n_bpe")) / 10000.0
            + 0.0
        ).alias("chars_per_token"),
        (
            F.round(
                (F.sum("est") - F.sum("n_bpe")) * 10000.0 / F.sum("n_bpe")
            )
            / 10000.0
            + 0.0
        ).alias("est_rel_err"),
    )


# --- dedup yield report ----------------------------------------------------
# The report a dedup pass publishes: per source, how many docs share a
# 5-token PREFIX with an earlier doc (keeper = min doc_id per prefix —
# title/boilerplate-prefix dedup, the cheap first pass crawl pipelines
# run before any fuzzy matching; exact-text dups are a strict subset)
# and how much character mass dedup reclaims. Prefix granularity keeps
# the report non-vacuous at every testdata scale (exact-text dups only
# exist at sf0.1 — CLAUDE.md gotcha 5). The keeper join runs on
# md5(prefix) — a fixed-width shuffle key instead of document bodies
# (at 100 TB the text column never moves through the exchange; md5
# agrees across both engines on the UTF-8 bytes).
_YIELD_PREFIX = 5
_YIELD_ORACLE = rf"""
WITH pre AS (
    SELECT doc_id, source, n_chars,
           md5(array_to_string(
               (string_split_regex(trim(text), '\s+'))[1:{_YIELD_PREFIX}],
               ' ')) AS h
    FROM documents
),
k AS (SELECT h, min(doc_id) AS keeper FROM pre GROUP BY h),
j AS (
    SELECT d.source, d.n_chars, d.doc_id <> k.keeper AS dropped
    FROM pre d JOIN k ON k.h = d.h
)
SELECT source,
       count(*)::BIGINT AS n_docs,
       count(*) FILTER (WHERE dropped)::BIGINT AS n_dropped,
       coalesce(sum(n_chars) FILTER (WHERE dropped), 0)::BIGINT
           AS chars_reclaimed,
       round(count(*) FILTER (WHERE dropped) * 10000.0 / count(*))
           / 10000 + 0.0 AS dup_pct
FROM j GROUP BY source
"""


@register("dedup_yield_report", oracle=_YIELD_ORACLE)
def dedup_yield_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    prefix = F.array_join(
        F.slice(T.ws_tokens(F.col("text")), 1, _YIELD_PREFIX), " "
    )
    hashed = docs.select(
        "source", "n_chars", "doc_id", F.md5(prefix).alias("h")
    )
    k = hashed.groupBy("h").agg(F.min("doc_id").alias("keeper"))
    j = hashed.join(k, "h").select(
        "source",
        "n_chars",
        (F.col("doc_id") != F.col("keeper")).alias("dropped"),
    )
    return j.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(F.col("dropped"), 1)).cast("long").alias("n_dropped"),
        F.coalesce(
            F.sum(F.when(F.col("dropped"), F.col("n_chars"))), F.lit(0)
        )
        .cast("long")
        .alias("chars_reclaimed"),
        (
            F.round(
                F.count(F.when(F.col("dropped"), 1))
                * 10000.0
                / F.count(F.lit(1))
            )
            / 10000.0
            + 0.0
        ).alias("dup_pct"),
    )


# --- corpus datacard -------------------------------------------------------
# The one-row summary a dataset release ships (datasheet/datacard):
# volume, diversity, token mass, length distribution, prefix-dup rate,
# dominant language and its share. Each statistic is a bounded
# aggregate; the composition is one wide single-row join of broadcast
# 1-row/`|langs|`-row subaggregates — the whole corpus is scanned a
# fixed small number of times and nothing unbounded ever reaches the
# driver.
_DATACARD_ORACLE = rf"""
WITH t AS (
    SELECT doc_id, lang, source,
           len(string_split_regex(trim(text), '\s+')) AS n_toks,
           md5(array_to_string(
               (string_split_regex(trim(text), '\s+'))[1:{_YIELD_PREFIX}],
               ' ')) AS pre_h
    FROM documents
),
base AS (
    SELECT count(*) AS n_docs,
           count(DISTINCT source) AS n_sources,
           count(DISTINCT lang) AS n_langs,
           sum(n_toks) AS total_tokens,
           round(quantile_cont(n_toks, 0.5) * 10000) / 10000 + 0.0
               AS p50_tokens
    FROM t
),
dup AS (
    SELECT count(*) - count(DISTINCT pre_h) AS n_prefix_dups FROM t
),
toplang AS (
    SELECT lang AS top_lang, count(*) AS c
    FROM t GROUP BY lang ORDER BY c DESC, lang LIMIT 1
)
SELECT b.n_docs::BIGINT AS n_docs,
       b.n_sources::BIGINT AS n_sources,
       b.n_langs::BIGINT AS n_langs,
       b.total_tokens::BIGINT AS total_tokens,
       round(b.total_tokens * 10000.0 / b.n_docs) / 10000 + 0.0
           AS mean_doc_tokens,
       b.p50_tokens,
       d.n_prefix_dups::BIGINT AS n_prefix_dups,
       round(d.n_prefix_dups * 10000.0 / b.n_docs) / 10000 + 0.0
           AS prefix_dup_rate,
       tl.top_lang,
       round(tl.c * 10000.0 / b.n_docs) / 10000 + 0.0 AS top_lang_share
FROM base b CROSS JOIN dup d CROSS JOIN toplang tl
"""


@register("corpus_datacard", oracle=_DATACARD_ORACLE)
def corpus_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    pre = F.md5(
        F.array_join(
            F.slice(T.ws_tokens(F.col("text")), 1, _YIELD_PREFIX), " "
        )
    )
    t = docs.select(
        "lang",
        "source",
        F.size(T.ws_tokens(F.col("text"))).alias("n_toks"),
        pre.alias("pre_h"),
    )
    base = t.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("source").alias("n_sources"),
        F.count_distinct("lang").alias("n_langs"),
        F.sum("n_toks").alias("total_tokens"),
        (
            F.round(F.expr("percentile(n_toks, 0.5)") * 10000.0) / 10000.0
            + 0.0
        ).alias("p50_tokens"),
    )
    dup = t.agg(
        (F.count(F.lit(1)) - F.count_distinct("pre_h")).alias(
            "n_prefix_dups"
        )
    )
    toplang = (
        t.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "lang")
        .limit(1)
        .select(F.col("lang").alias("top_lang"), "c")
    )
    return (
        base.crossJoin(F.broadcast(dup))
        .crossJoin(F.broadcast(toplang))
        .select(
            "n_docs",
            "n_sources",
            "n_langs",
            "total_tokens",
            (
                F.round(F.col("total_tokens") * 10000.0 / F.col("n_docs"))
                / 10000.0
                + 0.0
            ).alias("mean_doc_tokens"),
            "p50_tokens",
            F.col("n_prefix_dups").cast("long").alias("n_prefix_dups"),
            (
                F.round(
                    F.col("n_prefix_dups") * 10000.0 / F.col("n_docs")
                )
                / 10000.0
                + 0.0
            ).alias("prefix_dup_rate"),
            "top_lang",
            (
                F.round(F.col("c") * 10000.0 / F.col("n_docs")) / 10000.0
                + 0.0
            ).alias("top_lang_share"),
        )
    )


# --- BM25 ranked search ----------------------------------------------------
# The IR ranking layer over an inverted index (search_inverted_index
# is the boolean retrieval half): Okapi BM25 with the Lucene idf
# variant, k1=1.2, b=0.75, for a fixed 3-term query. Corpus stats
# (N, avgdl, per-term df) are 1-row / |terms|-row broadcast
# aggregates; per-doc tf is a narrow JVM array filter; the final
# top-10 is TakeOrderedAndProject. At 100 TB tf would come from the
# postings table (term-partitioned) instead of re-tokenizing — the
# scoring formula and plan shape are identical.
_BM25_TERMS = ("spark", "hash", "window")
_BM25_K1, _BM25_B = 1.2, 0.75


def bm25_scored_sql() -> str:
    """DuckDB CTE chain scoring EVERY document with the fixed-query
    BM25 (shared by the search-topk oracle and the RRF fusion oracle —
    one formula, two consumers)."""
    tf_cols = ", ".join(
        f"len(list_filter(t, x -> x = '{w}')) AS tf_{i}"
        for i, w in enumerate(_BM25_TERMS)
    )
    df_cols = ", ".join(
        f"count(*) FILTER (WHERE tf_{i} > 0) AS df_{i}"
        for i in range(len(_BM25_TERMS))
    )
    score = " + ".join(
        f"ln((s.n - s.df_{i} + 0.5) / (s.df_{i} + 0.5) + 1)"
        f" * tf_{i} * ({_BM25_K1} + 1)"
        f" / (tf_{i} + {_BM25_K1} * (1 - {_BM25_B}"
        f" + {_BM25_B} * dl / s.avgdl))"
        for i in range(len(_BM25_TERMS))
    )
    return rf"""toks AS (
    SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
    FROM documents
),
m AS (
    SELECT doc_id, len(t) AS dl, {tf_cols} FROM toks
),
s AS (
    SELECT count(*) AS n, avg(dl) AS avgdl, {df_cols} FROM m
),
bm25_scored AS (
    SELECT doc_id, round(({score}) * 10000) / 10000 + 0.0 AS bm25
    FROM m CROSS JOIN s
)"""


def _bm25_oracle() -> str:
    return f"""
WITH {bm25_scored_sql()}
SELECT doc_id, bm25 FROM bm25_scored
ORDER BY bm25 DESC, doc_id
LIMIT 10
"""


def bm25_scored(docs: DataFrame) -> DataFrame:
    """(doc_id, bm25) for every document — the Spark twin of
    :func:`bm25_scored_sql`."""
    toks = T.ws_tokens(F.col("text"))
    # closure factory binds each term (never a default-arg lambda in a
    # higher-order function — CLAUDE.md gotcha 1)
    def tf_of(word: str):
        return F.size(F.filter(toks, lambda x: x == F.lit(word)))

    tf_exprs = [
        tf_of(w).alias(f"tf_{i}") for i, w in enumerate(_BM25_TERMS)
    ]
    m = docs.select("doc_id", F.size(toks).alias("dl"), *tf_exprs)
    s = m.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("dl").alias("avgdl"),
        *[
            F.count(F.when(F.col(f"tf_{i}") > 0, 1)).alias(f"df_{i}")
            for i in range(len(_BM25_TERMS))
        ],
    )
    score = None
    for i in range(len(_BM25_TERMS)):
        idf = F.log(
            (F.col("n") - F.col(f"df_{i}") + 0.5)
            / (F.col(f"df_{i}") + 0.5)
            + 1
        )
        part = (
            idf
            * F.col(f"tf_{i}")
            * (_BM25_K1 + 1)
            / (
                F.col(f"tf_{i}")
                + _BM25_K1
                * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
            )
        )
        score = part if score is None else score + part
    return m.crossJoin(F.broadcast(s)).select(
        "doc_id", R.r(score, 4).alias("bm25")
    )


@register("bm25_search_topk", oracle=_bm25_oracle())
def bm25_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return (
        bm25_scored(docs)
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(10)
    )


# --- positional phrase search ----------------------------------------------
# Exact-phrase retrieval needs token POSITIONS, not just membership —
# the positional-index operation ("window join" as adjacent tokens).
# Positions are a per-row JVM lambda over the token array (at 100 TB
# they'd be read from a positional postings table, term-partitioned);
# output is matching docs with occurrence count and first position.
_PHRASE = ("window", "join")


def _phrase_oracle() -> str:
    w1, w2 = _PHRASE
    return rf"""
WITH toks AS (
    SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
    FROM documents
),
hits AS (
    SELECT doc_id,
           list_filter(generate_series(1, len(t) - 1),
                       i -> t[i] = '{w1}' AND t[i + 1] = '{w2}') AS pos
    FROM toks
)
SELECT doc_id,
       len(pos)::BIGINT AS n_occurrences,
       pos[1]::BIGINT AS first_pos
FROM hits WHERE len(pos) > 0
"""


@register("phrase_search_positions", oracle=_phrase_oracle())
def phrase_search_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    w1, w2 = _PHRASE
    docs = read_table(spark, sf_dir, "documents")
    toks = T.ws_tokens(F.col("text"))
    with_t = docs.select("doc_id", toks.alias("t"))
    # Guard the <2-token case: Spark's sequence(1, 0) defaults step to -1
    # and yields DESCENDING [1, 0], whose element_at(t, 0) throws
    # INVALID_INDEX_OF_ZERO; DuckDB's generate_series(1, 0) is empty, so
    # the engines would also diverge semantically (ADVICE r4, medium).
    pos = F.when(
        F.size("t") >= 2,
        F.filter(
            F.sequence(F.lit(1), F.size("t") - 1),
            lambda i: (F.element_at(F.col("t"), i) == w1)
            & (F.element_at(F.col("t"), i + 1) == w2),
        ),
    ).otherwise(F.array().cast("array<int>"))
    return (
        with_t.select(
            "doc_id",
            F.size(pos).cast("long").alias("n_occurrences"),
            F.element_at(pos, 1).cast("long").alias("first_pos"),
        )
        .filter(F.col("n_occurrences") > 0)
    )


# --- HTML tag stripping ----------------------------------------------------
# Boilerplate removal, the first step of every web-corpus cleaning
# pipeline. The testdata is plain text, so markup is PLANTED
# deterministically (wrap in <p>, inject a <script> block on every
# third doc) and then stripped: script/style blocks WITH their content
# first, then remaining tags — order matters, and the audit proves
# the planted markup is gone. All JVM regexp_replace, no shuffle
# before the final projection; both engines run the same patterns.
_HTML_SCRIPT_RE = "<script>[^<]*</script>"
_HTML_TAG_RE = "<[^>]*>"

_HTML_STRIP_ORACLE = f"""
WITH staged AS (
    SELECT doc_id,
           '<p>' || text || '</p>' ||
           CASE WHEN doc_id % 3 = 0
                THEN '<script>var tracker=1;</script>' ELSE '' END AS html
    FROM documents
),
clean AS (
    SELECT doc_id, html,
           regexp_replace(regexp_replace(html, '{_HTML_SCRIPT_RE}', '', 'g'),
                          '{_HTML_TAG_RE}', '', 'g') AS text_clean
    FROM staged
)
SELECT c.doc_id,
       length(c.html)::BIGINT AS n_html_chars,
       length(c.text_clean)::BIGINT AS n_clean_chars,
       (c.text_clean = d.text) AS roundtrip_exact,
       md5(c.text_clean) AS clean_md5
FROM clean c JOIN documents d ON d.doc_id = c.doc_id
"""


@register("html_tag_strip_clean", oracle=_HTML_STRIP_ORACLE)
def html_tag_strip_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    html = F.concat(
        F.lit("<p>"),
        F.col("text"),
        F.lit("</p>"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.lit("<script>var tracker=1;</script>"),
        ).otherwise(F.lit("")),
    )
    staged = docs.select("doc_id", "text", html.alias("html"))
    clean = F.regexp_replace(
        F.regexp_replace(F.col("html"), _HTML_SCRIPT_RE, ""),
        _HTML_TAG_RE,
        "",
    )
    return staged.select(
        "doc_id",
        F.length("html").cast("long").alias("n_html_chars"),
        F.length(clean).cast("long").alias("n_clean_chars"),
        (clean == F.col("text")).alias("roundtrip_exact"),
        F.md5(clean).alias("clean_md5"),
    )


# --- label balance audit ---------------------------------------------------
# Class-balance diagnostics over the embeddings labels: per-label
# share plus corpus-level Gini impurity (1 - Σp²), Shannon entropy
# (-Σ p ln p, nats), and max/min imbalance ratio — the numbers that
# decide whether training needs reweighting. One |labels|-row
# aggregate; totals ride a broadcast 1-row join.
_LABEL_BALANCE_ORACLE = """
WITH c AS (
    SELECT label, count(*) AS n FROM embeddings GROUP BY label
),
t AS (SELECT sum(n) AS tot, max(n) AS mx, min(n) AS mn FROM c),
p AS (SELECT c.label, c.n, c.n::DOUBLE / t.tot AS share FROM c CROSS JOIN t),
g AS (
    SELECT 1 - sum(share * share) AS gini,
           -sum(share * ln(share)) AS entropy
    FROM p
)
SELECT p.label, p.n::BIGINT AS n,
       round(p.share * 1000000) / 1000000 + 0.0 AS share,
       round(g.gini * 1000000) / 1000000 + 0.0 AS gini,
       round(g.entropy * 1000000) / 1000000 + 0.0 AS entropy,
       round(t.mx * 10000.0 / t.mn) / 10000 + 0.0 AS imbalance
FROM p CROSS JOIN g CROSS JOIN t
"""


@register("label_balance_audit", oracle=_LABEL_BALANCE_ORACLE)
def label_balance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    c = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(
        F.sum("n").alias("tot"), F.max("n").alias("mx"), F.min("n").alias("mn")
    )
    p = c.crossJoin(F.broadcast(t)).select(
        "label",
        "n",
        (F.col("n").cast("double") / F.col("tot")).alias("share"),
        "mx",
        "mn",
    )
    g = p.agg(
        (1 - F.sum(F.col("share") * F.col("share"))).alias("gini"),
        (-F.sum(F.col("share") * F.log(F.col("share")))).alias("entropy"),
    )
    return p.crossJoin(F.broadcast(g)).select(
        "label",
        F.col("n").cast("long").alias("n"),
        R.r("share", 6).alias("share"),
        R.r("gini", 6).alias("gini"),
        R.r("entropy", 6).alias("entropy"),
        (F.round(F.col("mx") * 10000.0 / F.col("mn")) / 10000.0 + 0.0).alias(
            "imbalance"
        ),
    )


# --- RM3 pseudo-relevance-feedback query expansion --------------------------------
# Lavrenko & Croft (2001) relevance models with RM3 interpolation
# (Abdul-Jaleel 2004) — the classic query-expansion step after a BM25
# first pass: the top-10 feedback documents' maximum-likelihood term
# distributions average into a relevance model P(w|R) (uniform
# feedback-document weights), interpolated with the original query
# model at λ=0.5. Stopwords are excluded from expansion candidates.
# Determinism: every P(w|d) = tf/dl snaps to an integer 1e-8 unit
# before the cross-document sum, the feedback cut reuses the shared
# 4dp-rounded BM25 score with doc_id tie-break, and the RM3 weight is
# IEEE arithmetic on exact ints snapped once more at 1e-8 — the
# top-15 cut orders by that exact integer with term tie-break.
# Scale: the feedback set is a FIXED-COUNT TakeOrdered top-10 (never
# a corpus fraction, CLAUDE.md gotcha 14); term stats come from one
# tokenize pass over 10 documents.
_RM3_LAMBDA = 0.5
_RM3_FB = 10
_RM3_TOPN = 15
_RM3_U = 100_000_000
_RM3_STOPS_SQL = "[" + ", ".join(
    f"'{w}'" for w in ("the", "a", "of", "and", "to", "in", "is")
) + "]"


def _rm3_oracle() -> str:
    return f"""
WITH {bm25_scored_sql()},
top10 AS (
    SELECT doc_id FROM bm25_scored ORDER BY bm25 DESC, doc_id
    LIMIT {_RM3_FB}
),
fb AS (
    -- dl > 0 guard (gotcha 10 family): an empty feedback doc would
    -- make P(w|d) divide by zero
    SELECT t.doc_id, u.w, len(t.t) AS dl
    FROM toks t JOIN top10 USING (doc_id), unnest(t.t) AS u(w)
    WHERE NOT list_contains({_RM3_STOPS_SQL}, u.w) AND len(t.t) > 0
),
pwd AS (
    SELECT doc_id, w,
           CAST(round(count(*) * {_RM3_U}.0 / any_value(dl)) AS BIGINT)
               AS p_u
    FROM fb GROUP BY doc_id, w
),
rm AS (
    SELECT w, sum(p_u)::BIGINT AS sum_u FROM pwd GROUP BY w
),
q AS (SELECT unnest(['spark', 'hash', 'window']) AS w),
rm3 AS (
    SELECT rm.w,
           q.w IS NOT NULL AS is_query_term,
           rm.sum_u,
           CAST(round({_RM3_LAMBDA}
                      * (CASE WHEN q.w IS NOT NULL
                              THEN {_RM3_U}.0 / 3 ELSE 0 END)
                      + (1 - {_RM3_LAMBDA})
                        * (rm.sum_u::DOUBLE / {_RM3_FB})) AS BIGINT)
               AS rm3_u
    FROM rm LEFT JOIN q ON q.w = rm.w
)
SELECT w AS term, is_query_term,
       round(sum_u::DOUBLE / ({_RM3_FB}.0 * {_RM3_U}) * 1000000)
           / 1000000 + 0.0 AS p_feedback,
       round(rm3_u * 1.0 / {_RM3_U} * 1000000) / 1000000 + 0.0
           AS rm3_weight
FROM rm3
ORDER BY rm3_u DESC, w
LIMIT {_RM3_TOPN}
"""


@register("rm3_expansion_terms", oracle=_rm3_oracle())
def rm3_expansion_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    top10 = (
        bm25_scored(docs)
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(_RM3_FB)
        .select("doc_id")
    )
    stops = ("the", "a", "of", "and", "to", "in", "is")
    stop_arr = F.array(*[F.lit(w) for w in stops])
    toks = docs.join(F.broadcast(top10), "doc_id", "semi").select(
        "doc_id", T.ws_tokens(F.col("text")).alias("t")
    )
    fb = (
        toks.select(
            "doc_id", F.size("t").alias("dl"), F.explode("t").alias("w")
        )
        .filter(~F.array_contains(stop_arr, F.col("w")))
        .filter(F.col("dl") > 0)
    )
    pwd = fb.groupBy("doc_id", "w").agg(
        F.round(
            F.count(F.lit(1)) * F.lit(float(_RM3_U)) / F.first("dl")
        )
        .cast("long")
        .alias("p_u")
    )
    rm = pwd.groupBy("w").agg(F.sum("p_u").cast("long").alias("sum_u"))
    q = spark.createDataFrame(
        [("spark",), ("hash",), ("window",)], "qw string"
    )
    rm3 = rm.join(
        F.broadcast(q), rm["w"] == q["qw"], "left"
    ).select(
        "w",
        F.col("qw").isNotNull().alias("is_query_term"),
        "sum_u",
        F.round(
            F.lit(_RM3_LAMBDA)
            * F.when(
                F.col("qw").isNotNull(), F.lit(float(_RM3_U)) / 3
            ).otherwise(F.lit(0.0))
            + (1 - _RM3_LAMBDA)
            * (F.col("sum_u").cast("double") / _RM3_FB)
        )
        .cast("long")
        .alias("rm3_u"),
    )
    return (
        rm3.orderBy(F.col("rm3_u").desc(), "w")
        .limit(_RM3_TOPN)
        .select(
            F.col("w").alias("term"),
            "is_query_term",
            R.r(
                F.col("sum_u").cast("double")
                / (F.lit(float(_RM3_FB)) * _RM3_U),
                6,
            ).alias("p_feedback"),
            R.r(F.col("rm3_u") * F.lit(1.0) / _RM3_U, 6).alias(
                "rm3_weight"
            ),
        )
    )
