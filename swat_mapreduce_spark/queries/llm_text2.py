"""Corpus-statistics + curation queries (round-2 widening of the
LLM-pipeline surface): vocabulary building, TF-IDF term extraction,
n-gram statistics, repetition-based quality rules, incremental dedup
of a new batch against an existing corpus, and LSH-bucket-blocked
embedding near-dup pairs.

All hot-path math is JVM expressions; every float the oracle compares
is either an exact integer ratio (one IEEE division of exact ints —
bit-identical across engines, unlike ln/exp whose libm rounding may
differ) or passes through functions/rounding.r.

Scale posture: token/shingle explodes are narrow maps feeding
partially-aggregated groupBys (the classic word-count shape — the
shuffle carries (key, partial count), never raw token streams);
per-doc top-k uses bounded windows keyed by doc_id; the dedup join is
an equi-join on shingle with DF bounded by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from swat_mapreduce_spark.functions import rounding as R
from swat_mapreduce_spark.functions.text import word_shingles, ws_tokens
from swat_mapreduce_spark.queries import register
from swat_mapreduce_spark.sources.readers import read_table


def _tok_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, tok, cnt) — per-document token frequencies. The
    explode is a narrow map; the groupBy shuffle moves partial counts
    only (map-side combine)."""
    return (
        docs.select("doc_id", F.explode(ws_tokens(F.col("text"))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


_TOK_CTE = r"""
tc AS (
    SELECT doc_id, tok, count(*) AS cnt
    FROM (SELECT doc_id,
                 unnest(string_split_regex(trim(text), '\s+')) AS tok
          FROM documents)
    GROUP BY doc_id, tok
)
"""


# --- corpus vocabulary (top-50 terms by occurrence) ------------------------
_VOCAB_ORACLE = f"""
WITH {_TOK_CTE}
SELECT tok AS term,
       sum(cnt)::BIGINT AS n_occurrences,
       count(*) AS doc_freq
FROM tc GROUP BY tok
ORDER BY n_occurrences DESC, term
LIMIT 50
"""


@register("vocab_corpus_terms", oracle=_VOCAB_ORACLE)
def vocab_corpus_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: occurrence count + document frequency per
    term, top-50. Two-level aggregation ((doc,tok) then tok) instead of
    count + countDistinct in one agg — avoids the Expand operator that
    doubles shuffle volume; the final top-50 is TakeOrderedAndProject
    (per-partition heaps), not a global sort."""
    docs = read_table(spark, sf_dir, "documents")
    return (
        _tok_counts(docs)
        .groupBy(F.col("tok").alias("term"))
        .agg(
            F.sum("cnt").alias("n_occurrences"),
            F.count(F.lit(1)).alias("doc_freq"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("term"))
        .limit(50)
    )


# --- per-document TF-IDF top terms -----------------------------------------
# score = tf * N / df with N, tf, df exact integers: the integer
# product is exact and the single division is correctly-rounded IEEE,
# so BOTH engines produce bit-identical doubles — no ln(), whose libm
# implementations are not guaranteed to agree at the last ulp (and the
# ranking, unlike the absolute score, is what TF-IDF is for).
_TFIDF_ORACLE = f"""
WITH {_TOK_CTE},
df AS (SELECT tok, count(*) AS df FROM tc GROUP BY tok),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
    SELECT tc.doc_id, tc.tok, tc.cnt AS tf, df.df,
           (tc.cnt * n.n_docs)::DOUBLE / df.df AS raw_score,
           row_number() OVER (PARTITION BY tc.doc_id
                              ORDER BY (tc.cnt * n.n_docs)::DOUBLE / df.df DESC,
                                       tc.tok) AS rn
    FROM tc JOIN df ON tc.tok = df.tok CROSS JOIN n
)
SELECT doc_id, tok AS term, tf, df,
       round(raw_score, 4) AS score
FROM scored WHERE rn <= 3
"""


@register("tfidf_top_terms", oracle=_TFIDF_ORACLE)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    tc = _tok_counts(docs)
    # df as a window count over tc (one tok-keyed shuffle) instead of
    # groupBy + equi-join back (two): same result, 3 total shuffles
    # instead of 4 — at corpus scale the saved shuffle is the whole
    # (tok, tf) table.
    w_tok = Window.partitionBy("tok")
    # 1-row corpus size: broadcast cross join, fully distributed (no
    # driver-side .count() parameterization)
    n_tbl = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    raw = (F.col("tf") * F.col("n_docs")).cast("double") / F.col("df")
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("raw_score"), F.asc("tok")
    )
    return (
        tc.withColumnRenamed("cnt", "tf")
        .withColumn("df", F.count(F.lit(1)).over(w_tok))
        .crossJoin(F.broadcast(n_tbl))
        .withColumn("raw_score", raw)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "doc_id",
            F.col("tok").alias("term"),
            "tf",
            "df",
            R.r("raw_score", 4).alias("score"),
        )
    )


# --- per-language top bigrams ----------------------------------------------
_BIGRAM_ORACLE = r"""
WITH bg AS (
    SELECT lang, unnest(list_apply(range(1, len(t)),
                                   i -> t[i] || ' ' || t[i + 1])) AS bigram
    FROM (SELECT lang, string_split_regex(trim(text), '\s+') AS t
          FROM documents)
),
c AS (SELECT lang, bigram, count(*) AS n FROM bg GROUP BY lang, bigram),
rk AS (
    SELECT lang, bigram, n,
           row_number() OVER (PARTITION BY lang
                              ORDER BY n DESC, bigram) AS rn
    FROM c
)
SELECT lang, bigram, n FROM rk WHERE rn <= 20
"""


@register("ngram_bigram_top20", oracle=_BIGRAM_ORACLE)
def ngram_bigram_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 bigrams per language. The bigram construction is a
    single zip_with over two slices (single-level lambda — safe per
    the higher-order-lambda rules); counting is the word-count shape
    with map-side partial aggregation."""
    docs = read_table(spark, sf_dir, "documents")
    t = ws_tokens(F.col("text"))
    bigrams = F.zip_with(
        F.slice(t, F.lit(1), F.size(t) - 1),
        F.slice(t, F.lit(2), F.size(t) - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("bigram"))
    return (
        docs.select("lang", F.explode(bigrams).alias("bigram"))
        .groupBy("lang", "bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("lang", "bigram", "n")
    )


# --- repetition-based quality rules (Gopher-style) -------------------------
# keep = top-token ratio <= 0.12 AND mean token length in [4.0, 5.0];
# thresholds picked against the testdata distribution so BOTH branches
# select rows at every scale factor (CLAUDE.md rule 5: a filter that
# keeps or drops everything is a vacuous oracle check).
_REPETITION_ORACLE = f"""
WITH {_TOK_CTE},
m AS (
    SELECT doc_id,
           sum(cnt)::BIGINT AS n_tokens,
           max(cnt)::DOUBLE / sum(cnt) AS top_ratio,
           sum(cnt * length(tok))::DOUBLE / sum(cnt) AS mean_len
    FROM tc GROUP BY doc_id
)
SELECT doc_id, n_tokens,
       round(top_ratio, 4) AS top_tok_ratio,
       round(mean_len, 4) AS mean_tok_len,
       (top_ratio <= 0.12 AND mean_len BETWEEN 4.0 AND 5.0) AS keep
FROM m
"""


@register("quality_repetition_rules", oracle=_REPETITION_ORACLE)
def quality_repetition_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    m = _tok_counts(docs).groupBy("doc_id").agg(
        F.sum("cnt").alias("n_tokens"),
        F.max("cnt").alias("max_cnt"),
        F.sum(F.col("cnt") * F.length("tok")).alias("len_sum"),
    )
    top_ratio = F.col("max_cnt").cast("double") / F.col("n_tokens")
    mean_len = F.col("len_sum").cast("double") / F.col("n_tokens")
    return m.select(
        "doc_id",
        "n_tokens",
        R.r(top_ratio, 4).alias("top_tok_ratio"),
        R.r(mean_len, 4).alias("mean_tok_len"),
        ((top_ratio <= 0.12) & mean_len.between(4.0, 5.0)).alias("keep"),
    )


# --- incremental dedup: new batch vs existing corpus -----------------------
# The production shape of "don't re-ingest what the corpus already
# holds": batch docs (doc_id % 10 >= 8 stands in for the new
# partition) are kept only if < 60% of their distinct 3-word shingles
# already appear anywhere in the corpus split. One equi-join on
# shingle against the distinct corpus-shingle set (itself the output
# of a partial-aggregated distinct) — no pairwise comparisons at all,
# so cost is linear in shingle volume, unlike the per-pair verify of
# dedup_ngram_jaccard.
_INCR_DEDUP_ORACLE = r"""
WITH toks AS (
    SELECT doc_id, lang, source, doc_id % 10 >= 8 AS is_batch,
           string_split_regex(trim(text), '\s+') AS t
    FROM documents
),
ti AS (SELECT doc_id, lang, source, is_batch, t,
              unnest(generate_series(1, len(t) - 2)) AS i
       FROM toks),
sh AS (SELECT DISTINCT doc_id, lang, source, is_batch,
              array_to_string(t[i : i + 2], ' ') AS shingle
       FROM ti),
corpus AS (SELECT DISTINCT shingle FROM sh WHERE NOT is_batch),
sizes AS (SELECT doc_id, any_value(lang) AS lang,
                 any_value(source) AS source, count(*) AS n
          FROM sh WHERE is_batch GROUP BY doc_id),
shared AS (
    SELECT b.doc_id, count(*) AS shared
    FROM sh b JOIN corpus c ON b.shingle = c.shingle
    WHERE b.is_batch GROUP BY b.doc_id
)
SELECT s.doc_id, s.lang, s.source,
       round(coalesce(sh.shared, 0)::DOUBLE / s.n, 4) AS overlap_ratio,
       coalesce(sh.shared, 0)::DOUBLE / s.n < 0.6 AS keep
FROM sizes s LEFT JOIN shared sh ON s.doc_id = sh.doc_id
"""


@register("incremental_dedup_vs_corpus", oracle=_INCR_DEDUP_ORACLE)
def incremental_dedup_vs_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from swat_mapreduce_spark.functions.text import shingles_from_tokens

    docs = read_table(spark, sf_dir, "documents")
    # tokens materialized in their own projection first — the inline
    # word_shingles(text) form re-evaluates the split per shingle
    # element (functions/text.py PERF note; found via the r6
    # ngram_novelty_decay profile, ~3x scan cost)
    toked = docs.select(
        "doc_id",
        "lang",
        "source",
        (F.col("doc_id") % 10 >= 8).alias("is_batch"),
        ws_tokens(F.col("text")).alias("toks"),
    )
    sh = toked.select(
        "doc_id",
        "lang",
        "source",
        "is_batch",
        F.explode(
            F.array_distinct(shingles_from_tokens(F.col("toks")))
        ).alias("shingle"),
    )
    batch = sh.filter("is_batch")
    corpus = sh.filter(~F.col("is_batch")).select("shingle").distinct()
    sizes = batch.groupBy("doc_id").agg(
        F.any_value("lang").alias("lang"),
        F.any_value("source").alias("source"),
        F.count(F.lit(1)).alias("n"),
    )
    shared = (
        batch.join(corpus, "shingle", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    ratio = F.coalesce(F.col("shared"), F.lit(0)).cast("double") / F.col("n")
    # emit ALL batch docs with the computed ratio + keep decision
    # rather than only survivors: at scale factors where the corpus
    # covers every shingle the filtered form returns 0 rows, which
    # hash-matches an empty oracle vacuously (CLAUDE.md rule 5)
    return sizes.join(shared, "doc_id", "left").select(
        "doc_id",
        "lang",
        "source",
        R.r(ratio, 4).alias("overlap_ratio"),
        (ratio < 0.6).alias("keep"),
    )


# --- embedding near-dup pairs, LSH-bucket-blocked --------------------------
# The scale path for embedding near-dup: block by the hyperplane-LSH
# bucket so the pairwise cosine verify runs only within buckets — the
# same candidate-generation-then-verify shape as MinHash LSH, but in
# embedding space. Complements neardup_cosine_pairs, which blocks on
# the label column. Corpus-scalable (r4): plane count grows with the
# corpus (lsh_planes_for) so expected bucket size stays near
# LSH_TARGET_BUCKET, and mega-buckets above LSH_MAX_BUCKET are dropped
# before the join — candidate volume is n_buckets * cap^2-bounded,
# never N^2/n_buckets (VERDICT r3 "What's wrong" #2).
def _lsh_neardup_oracle() -> str:
    from swat_mapreduce_spark.queries.similarity import _DIMS_DUCK
    from swat_mapreduce_spark.operators import similarity as S

    return f"""
WITH {_DIMS_DUCK},
{S.duck_lsh_planes()},
{S.duck_lsh_capped_buckets()},
pairs AS (
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
    FROM capped a JOIN capped b
      ON a.bucket = b.bucket AND a.vec_id < b.vec_id
),
nrm AS (
    SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM dims GROUP BY vec_id
),
cos AS (
    SELECT p.vec_a, p.vec_b,
           sum(da.x * db.x) AS dp
    FROM pairs p
    JOIN dims da ON da.vec_id = p.vec_a
    JOIN dims db ON db.vec_id = p.vec_b AND db.i = da.i
    GROUP BY p.vec_a, p.vec_b
)
SELECT c.vec_a, c.vec_b,
       round(c.dp / (na.nrm * nb.nrm), 4) AS cosine
FROM cos c
JOIN nrm na ON na.vec_id = c.vec_a
JOIN nrm nb ON nb.vec_id = c.vec_b
WHERE round(c.dp / (na.nrm * nb.nrm), 4) >= 0.2
"""


@register("embedding_neardup_lsh", oracle=_lsh_neardup_oracle())
def embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from swat_mapreduce_spark.functions import arrays as A
    from swat_mapreduce_spark.operators import similarity as S

    emb = read_table(spark, sf_dir, "embeddings")
    sel = S.lsh_tagged_capped(emb)  # persisted; self-joined below
    a, b = sel.alias("a"), sel.alias("b")
    # cosine_pre: norms ride the persisted tagged projection (r13,
    # guide §1.2) — bit-identical to the per-pair cosine
    cos = R.r(
        A.cosine_pre(
            F.col("a.v"), F.col("b.v"), F.col("a.nv"), F.col("b.nv")
        ),
        4,
    )
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.2)
    )


# --- corpus language rebalancing -------------------------------------------
# Downsample over-represented languages to the smallest language's
# count: keep_rate(lang) = min_lang_count / lang_count, gated by the
# shared md5-unit hash (no RNG — reruns and the oracle agree exactly).
# Fully declarative: per-lang counts and the global min are aggregates
# (broadcast back), never a driver-side collect.
from swat_mapreduce_spark.functions import hashing as _H

_REBALANCE_H = (
    f"({_H.duck_hash_uint(_H.sql_salted('doc_id', chr(39) + 'bal' + chr(39)), 8)}"
    f" / {float(16 ** 8)})"
)
_REBALANCE_ORACLE = f"""
WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
m AS (SELECT min(n) AS mn FROM c),
r AS (SELECT lang, n, (SELECT mn FROM m)::DOUBLE / n AS rate FROM c)
SELECT d.doc_id, d.lang,
       round(r.rate, 4) AS keep_rate,
       {_REBALANCE_H} < r.rate AS keep
FROM documents d JOIN r ON d.lang = r.lang
"""


@register("rebalance_langs", oracle=_REBALANCE_ORACLE)
def rebalance_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    mn = counts.agg(F.min("n").alias("mn"))
    rates = counts.crossJoin(F.broadcast(mn)).select(
        "lang", (F.col("mn").cast("double") / F.col("n")).alias("rate")
    )
    gate = _H.hash_unit(F.col("doc_id"), "bal", 8)
    return docs.join(F.broadcast(rates), "lang").select(
        "doc_id",
        "lang",
        R.r("rate", 4).alias("keep_rate"),
        (gate < F.col("rate")).alias("keep"),
    )


# --- mapInArrow token counting ---------------------------------------------
# The Arrow-native UDF surface (lower per-batch overhead than the
# pandas bridge: no to_pandas copy). Same n_ws_tokens semantics as the
# JVM token_count query, so the oracle pins the Arrow path to the SQL
# result.
_ARROW_TOKENS_ORACLE = r"""
SELECT doc_id,
       len(string_split_regex(trim(text), '\s+'))::BIGINT AS n_tokens
FROM documents
"""


@register("token_count_arrow", oracle=_ARROW_TOKENS_ORACLE)
def token_count_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    def count_tokens(batches):
        import pyarrow.compute as pc

        for batch in batches:
            toks = pc.utf8_split_whitespace(
                pc.utf8_trim_whitespace(batch.column("text"))
            )
            yield pa.RecordBatch.from_arrays(
                [batch.column("doc_id"), pc.list_value_length(toks).cast("int64")],
                ["doc_id", "n_tokens"],
            )

    docs = read_table(spark, sf_dir, "documents")
    return docs.select("doc_id", "text").mapInArrow(
        count_tokens, "doc_id long, n_tokens long"
    )


# --- dedup policy: keep NEWEST duplicate -----------------------------------
# The other curation policy: exact-dup groups keep the freshest copy
# (max doc_id as the recency proxy) instead of the earliest — what a
# recrawl pipeline wants when later fetches supersede older ones.
# Same digest-keyed single window shuffle as llm_corpus_clean.

_KEEP_NEWEST_ORACLE = """
WITH r AS (
    SELECT doc_id, lang, source,
           row_number() OVER (
               PARTITION BY md5(text) ORDER BY doc_id DESC
           ) AS rn
    FROM documents
)
SELECT lang, source, count(*) AS n_kept, max(doc_id) AS max_kept_id
FROM r WHERE rn = 1
GROUP BY lang, source
"""


@register("dedup_exact_keep_newest", oracle=_KEEP_NEWEST_ORACLE)
def dedup_exact_keep_newest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = read_table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5("text")).orderBy(F.col("doc_id").desc())
    kept = docs.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    return kept.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("doc_id").alias("max_kept_id"),
    )


# --- near-dup threshold sweep ----------------------------------------------
# Threshold tuning without re-running the pipeline: 3-gram-shingle
# Jaccard pair similarities are computed ONCE and bucketed against a
# threshold ladder in the same pass — conditional aggregation over
# the pair list, no extra joins. Candidates come from a SHINGLE
# inverted index (shingle document frequency is low, unlike unigrams
# whose stopword-like tokens relate everything to everything — the
# unigram form of this query took 200s at sf0.1; the shingle form
# takes 5s and its candidate volume scales with real near-dup mass).

from swat_mapreduce_spark.queries.dedup import _SH_DUCK

_SWEEP_ORACLE = f"""
WITH {_SH_DUCK.strip().rstrip()},
cand AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           count(*) AS n_shared
    FROM sh a JOIN sh b
      ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY doc_a, doc_b
    HAVING count(*) >= 5
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
pairs AS (
    SELECT c.n_shared::DOUBLE
           / (sa.n + sb.n - c.n_shared) AS sim
    FROM cand c
    JOIN sizes sa ON c.doc_a = sa.doc_id
    JOIN sizes sb ON c.doc_b = sb.doc_id
)
SELECT count(*) FILTER (WHERE sim >= 0.5) AS ge_050,
       count(*) FILTER (WHERE sim >= 0.7) AS ge_070,
       count(*) FILTER (WHERE sim >= 0.9) AS ge_090
FROM pairs
"""


@register("neardup_threshold_sweep", oracle=_SWEEP_ORACLE)
def neardup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle-set Jaccard over inverted-index candidates (shared-
    shingle floor >= 5 — no all-pairs), with the threshold ladder
    evaluated as conditional aggregates in one pass."""
    from swat_mapreduce_spark.operators.dedup import doc_shingle_arrays

    docs = read_table(spark, sf_dir, "documents")
    shingled = doc_shingle_arrays(docs, 3)  # (doc_id, sh_arr), fanned out
    sh = shingled.select(
        "doc_id", F.explode("sh_arr").alias("shingle")
    )
    cand = (
        sh.alias("a")
        .join(
            sh.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= 5)
    )
    sizes = shingled.select(
        "doc_id", F.size("sh_arr").alias("n")
    )
    sims = (
        cand.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")),
            "doc_b",
        )
        .select(
            (
                F.col("n_shared").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_shared"))
            ).alias("sim")
        )
    )
    ge = lambda t: F.sum((F.col("sim") >= t).cast("long"))  # noqa: E731
    return sims.agg(
        ge(0.5).alias("ge_050"),
        ge(0.7).alias("ge_070"),
        ge(0.9).alias("ge_090"),
    )
