"""Corpus-statistics pack 5: the two classical corpus-growth laws a
training-data pipeline monitors while ingesting — Heaps' law
(vocabulary growth: is new data still contributing new n-grams, or
has the corpus saturated?) and Zipf's law (rank-frequency shape: is
the token distribution natural-language-like or degenerate?). Both
run over word TRIGRAM shingles, not unigrams — the synthetic
testdata's word vocabulary is 31 terms (saturates in the first
document), while its trigram vocabulary is 16k-27k and exhibits a
real saturating growth curve at sf0.1 (16877 new shingles in decile
0 down to 24 in decile 9 — verified non-vacuous at every SF, gotcha
CLAUDE.md #5).

Scale posture: the shingle explode is a narrow map feeding partially
aggregated groupBys (word-count shape — shuffles carry (key, partial
count), never raw shingle streams); decile assignment is pure
row-local integer arithmetic against a broadcast 1-row min/max
aggregate; every window runs on the BOUNDED REPORT (10 deciles /
top-100 ranks), never on the corpus. Each query pays exactly ONE
shingle explode (Heaps' occurrence totals come from token counts —
arithmetic, not explosion).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from swat_mapreduce_spark.functions import rounding as R
from swat_mapreduce_spark.functions.text import shingles_from_tokens, ws_tokens
from swat_mapreduce_spark.queries import register
from swat_mapreduce_spark.sources.readers import fan_out, read_table

# Shingle OCCURRENCES (duplicates kept — these are frequency laws, so
# multiplicity matters, unlike the dedup family's distinct-set CTEs).
_OCC_DUCK = r"""
toks AS (
    SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
    FROM documents
),
occ AS (
    SELECT doc_id, array_to_string(t[i : i + 2], ' ') AS sh
    FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
          FROM toks)
)
"""


def _shingle_occurrences(docs: DataFrame, *extra: str) -> DataFrame:
    """(…extra, sh) — one row per trigram occurrence. Tokens are
    materialized first (functions/text.py PERF note) and the input is
    fanned out: shingling is the CPU hot path and a single-split
    source would run it in one task."""
    toked = fan_out(docs).select(
        *extra, ws_tokens(F.col("text")).alias("toks")
    )
    return toked.select(
        *extra,
        F.explode(shingles_from_tokens(F.col("toks"))).alias("sh"),
    )


# --- Heaps' law: vocabulary growth by corpus decile ------------------------
# Deciles are ingestion-order slices (doc_id ranges — DuckDB gotcha 9a:
# physical order isn't addressable from the views, but doc_id IS the
# generation order). Integer arithmetic throughout: bucket =
# least(9, (doc_id - min)*10 div span) is exact in both engines (div
# and // are integer floor division); cumulative sums are exact BIGINT;
# the one double is a single IEEE division of exact ints (bit-identical
# cross-engine) rounded via the shared multiply-round-divide procedure.
_HEAPS_ORACLE = f"""
WITH {_OCC_DUCK},
st AS (SELECT min(doc_id) AS mn, max(doc_id) - min(doc_id) + 1 AS span
       FROM documents),
db AS (
    SELECT least(9, ((doc_id - mn) * 10) // span) AS bucket,
           count(*) AS n_docs,
           sum(greatest(len(t) - 2, 0))::BIGINT AS occs
    FROM toks, st GROUP BY 1
),
ob AS (
    SELECT least(9, ((o.doc_id - st.mn) * 10) // st.span) AS bucket, o.sh
    FROM occ o, st
),
nv AS (
    SELECT fb AS bucket, count(*) AS new_vocab
    FROM (SELECT sh, min(bucket) AS fb FROM ob GROUP BY sh)
    GROUP BY fb
),
g AS (
    SELECT gs.b AS decile,
           coalesce(db.n_docs, 0) AS n_docs,
           coalesce(db.occs, 0) AS decile_shingles,
           coalesce(nv.new_vocab, 0) AS new_vocab
    FROM generate_series(0, 9) AS gs(b)
    LEFT JOIN db ON db.bucket = gs.b
    LEFT JOIN nv ON nv.bucket = gs.b
)
SELECT decile, n_docs, decile_shingles,
       (sum(decile_shingles) OVER w)::BIGINT AS cum_shingles,
       new_vocab,
       (sum(new_vocab) OVER w)::BIGINT AS cum_vocab,
       round(sum(new_vocab) OVER w * 1000.0
             / sum(decile_shingles) OVER w, 4) AS vocab_per_1k
FROM g
WINDOW w AS (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING
             AND CURRENT ROW)
"""


@register("heaps_vocab_growth", oracle=_HEAPS_ORACLE)
def heaps_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law audit: per doc_id-decile new/cumulative trigram
    vocabulary and occurrences — the "is new data still novel?"
    ingestion dashboard. The per-decile occurrence count never
    explodes anything: a doc contributes exactly max(0, n_tokens - 2)
    shingle occurrences, so it fuses with the doc count into ONE
    narrow aggregate; only the first-decile-per-shingle argmin pays
    the explode (one shuffle on sh carrying partial mins). The
    cumulative window runs on the 10-row report."""
    docs = read_table(spark, sf_dir, "documents")
    st = docs.agg(
        F.min("doc_id").alias("mn"),
        (F.max("doc_id") - F.min("doc_id") + 1).alias("span"),
    )
    bucketed = docs.join(F.broadcast(st)).select(
        "doc_id",
        "text",
        F.least(
            F.lit(9), F.expr("((doc_id - mn) * 10) div span")
        ).alias("bucket"),
    )
    # distinct join-key names per aggregate: db/nv share lineage (both
    # derive from `bucketed`), so a common `bucket` name would be
    # ambiguous after the first join
    db = bucketed.groupBy(F.col("bucket").alias("b1")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.greatest(F.size(ws_tokens(F.col("text"))) - 2, F.lit(0))
        ).alias("occs"),
    )
    nv = (
        _shingle_occurrences(bucketed, "bucket")
        .groupBy("sh")
        .agg(F.min("bucket").alias("b3"))
        .groupBy("b3")
        .agg(F.count(F.lit(1)).alias("new_vocab"))
    )
    g = (
        spark.range(10)
        .select(F.col("id").alias("decile"))
        .join(F.broadcast(db), F.col("decile") == F.col("b1"), "left")
        .join(F.broadcast(nv), F.col("decile") == F.col("b3"), "left")
        .select(
            "decile",
            F.coalesce("n_docs", F.lit(0)).alias("n_docs"),
            F.coalesce("occs", F.lit(0)).alias("decile_shingles"),
            F.coalesce("new_vocab", F.lit(0)).alias("new_vocab"),
        )
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return g.select(
        "decile",
        "n_docs",
        "decile_shingles",
        F.sum("decile_shingles").over(w).alias("cum_shingles"),
        "new_vocab",
        F.sum("new_vocab").over(w).alias("cum_vocab"),
        R.r(
            F.sum("new_vocab").over(w)
            * 1000.0
            / F.sum("decile_shingles").over(w),
            4,
        ).alias("vocab_per_1k"),
    )


# --- Zipf's law: rank-frequency of the top-100 shingles --------------------
# zipf_score = freq·rank / top_freq is ≈1 at every rank under ideal
# Zipf; its drift across ranks is the distribution-shape diagnostic.
# freq·rank is an exact integer product and the single division by
# top_freq is correctly-rounded IEEE — bit-identical cross-engine
# (same no-ln discipline as TF-IDF, queries/llm_text2.py).
_ZIPF_ORACLE = f"""
WITH {_OCC_DUCK},
freq AS (
    SELECT sh AS shingle, count(*) AS freq
    FROM occ GROUP BY sh
    ORDER BY freq DESC, shingle
    LIMIT 100
),
rk AS (
    SELECT shingle, freq,
           row_number() OVER (ORDER BY freq DESC, shingle) AS rank,
           max(freq) OVER () AS top
    FROM freq
)
SELECT rank, shingle, freq,
       round(freq::DOUBLE / top, 4) AS ratio_to_top,
       round((freq * rank)::DOUBLE / top, 4) AS zipf_score
FROM rk
"""


@register("zipf_rank_frequency", oracle=_ZIPF_ORACLE)
def zipf_rank_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency audit over the top-100 trigrams. The top-100
    cut is TakeOrderedAndProject (per-partition heaps, no global sort);
    rank/top windows run single-partition on the 100-row result only."""
    docs = read_table(spark, sf_dir, "documents")
    freq = (
        _shingle_occurrences(docs)
        .groupBy(F.col("sh").alias("shingle"))
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("shingle"))
        .limit(100)
    )
    w_rank = Window.orderBy(F.desc("freq"), F.asc("shingle"))
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return freq.select(
        F.row_number().over(w_rank).alias("rank"),
        "shingle",
        "freq",
        R.r(F.col("freq") / F.max("freq").over(w_all), 4).alias(
            "ratio_to_top"
        ),
        R.r(
            (F.col("freq") * F.row_number().over(w_rank))
            / F.max("freq").over(w_all),
            4,
        ).alias("zipf_score"),
    )


# --- approx_top_k sketch family (Spark 4.1) --------------------------------
# The mergeable heavy-hitter path: per-source token sketches
# (approx_top_k_accumulate — each shard tracks its own bounded-size
# frequency state), combined into one corpus sketch
# (approx_top_k_combine), then estimated (approx_top_k_estimate).
# This is THE 100 TB heavy-hitter architecture: per-partition state is
# capacity-bounded (here 10000 tracked items), merge is associative,
# and no raw token stream crosses the shuffle — only sketches.
# Determinism: the testdata vocabulary (31 distinct tokens) sits far
# under the tracked capacity, so sketch counts are EXACT and the
# DuckDB exact-count oracle matches; the estimate is pulled at full
# width and the top-10 cut is applied OURSELVES with a (count DESC,
# token ASC) row_number — the sketch's own k-cut has sketch-internal
# tie order. (At real scale the same plan is approximate for the
# tail but exact for true heavy hitters.) Complements
# countmin_heavy_hitters (DIY d×w CM sketch) with the built-in
# engine-native sketch aggregate.
_APPROX_TOPK_ORACLE = r"""
WITH w AS (
    SELECT unnest(list_filter(string_split_regex(trim(text), '\s+'),
                              x -> len(x) > 0)) AS tok
    FROM documents
),
c AS (SELECT tok, count(*) AS cnt FROM w GROUP BY tok)
SELECT tok, cnt::BIGINT AS cnt, rank
FROM (SELECT tok, cnt,
             row_number() OVER (ORDER BY cnt DESC, tok) AS rank
      FROM c)
WHERE rank <= 10
"""


@register("approx_topk_sketch_tokens", oracle=_APPROX_TOPK_ORACLE)
def approx_topk_sketch_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from swat_mapreduce_spark.sources.readers import read_table

    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", ws_tokens(F.col("text")).alias("toks")
    ).select("source", F.explode("toks").alias("tok"))
    # per-source sketches -> one combined sketch -> full-width estimate
    per_source = toks.groupBy("source").agg(
        F.expr("approx_top_k_accumulate(tok, 50)").alias("sk")
    )
    est = per_source.agg(
        F.expr(
            "approx_top_k_estimate(approx_top_k_combine(sk), 50)"
        ).alias("items")
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("tok"))
    return (
        est.select(F.explode("items").alias("it"))
        .select(
            F.col("it.item").alias("tok"),
            F.col("it.count").cast("bigint").alias("cnt"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
    )
