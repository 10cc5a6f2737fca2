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
    # (capacity 10000 matches the header; exact-vs-oracle depends on
    # distinct tokens staying under it — guarded by
    # tests/test_r7_fixes.py::test_approx_topk_capacity_headroom)
    per_source = toks.groupBy("source").agg(
        F.expr("approx_top_k_accumulate(tok, 10000)").alias("sk")
    )
    est = per_source.agg(
        F.expr(
            "approx_top_k_estimate(approx_top_k_combine(sk), 10000)"
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


# --- interpolated Kneser-Ney bigram LM --------------------------------------
# THE n-gram smoothing (Kneser & Ney 1995, interpolated form; what
# KenLM ships by default). Unlike Jelinek-Mercer (wordlm_
# interpolated_nll), the lower-order distribution is the CONTINUATION
# probability p_cont(w) = N1+(·,w)/N1+(·,·) — "how many contexts does
# w complete" — and the bigram term is absolute-discounted:
#   p(w|prev) = max(c(prev,w) − D, 0)/c(prev)
#             + D·N1+(prev,·)/c(prev) · p_cont(w).
# Every ingredient is a count aggregate (type counts N1+ are DISTINCT
# counts over the bigram-type table), so the whole model is
# oracle-able. Per-term log-probs snap to DECIMAL(30,8); scoring is
# the same shuffle-join shape as the JM query (vocab²-honest).
_KN_D = 0.75

_KN_ORACLE = rf"""
WITH t AS (
    SELECT doc_id,
           list_filter(string_split_regex(trim(text), '\s+'),
                       x -> len(x) > 0) AS toks
    FROM documents
),
bg AS (
    SELECT doc_id, toks, unnest(generate_series(2, len(toks))) AS i
    FROM t WHERE len(toks) >= 2
),
flat AS (SELECT doc_id, toks[i-1] AS prev, toks[i] AS w FROM bg),
big AS (SELECT prev, w, count(*) AS cb FROM flat GROUP BY prev, w),
prevc AS (
    SELECT prev, sum(cb) AS cp, count(*)::BIGINT AS n1_prev
    FROM big GROUP BY prev
),
contw AS (SELECT w, count(*)::BIGINT AS n1_w FROM big GROUP BY w),
n1all AS (SELECT count(*)::BIGINT AS n1 FROM big),
scored AS (
    SELECT f.doc_id,
           CAST(ln(greatest(b.cb - {_KN_D}, 0) / pc.cp
                   + {_KN_D} * pc.n1_prev / pc.cp
                     * (cw.n1_w * 1.0 / na.n1))
                AS DECIMAL(30,8)) AS lp
    FROM flat f
    JOIN big b ON b.prev = f.prev AND b.w = f.w
    JOIN prevc pc ON pc.prev = f.prev
    JOIN contw cw ON cw.w = f.w
    CROSS JOIN n1all na
)
SELECT doc_id,
       count(*)::BIGINT AS n_bigrams,
       round((-sum(lp)::DOUBLE / count(*)) * 10000) / 10000 + 0.0
           AS avg_nll
FROM scored
GROUP BY doc_id
"""


@register("kneser_ney_bigram_nll", oracle=_KN_ORACLE)
def kneser_ney_bigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", ws_tokens(F.col("text")).alias("toks")
    )
    bg = (
        docs.filter(F.size("toks") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(2, size(toks)), "
                    "i -> struct(toks[i-2] AS prev, toks[i-1] AS w))"
                )
            ).alias("p"),
        )
        .select(
            "doc_id", F.col("p.prev").alias("prev"), F.col("p.w").alias("w")
        )
    )
    big = bg.groupBy("prev", "w").agg(F.count(F.lit(1)).alias("cb"))
    prevc = big.groupBy("prev").agg(
        F.sum("cb").alias("cp"), F.count(F.lit(1)).alias("n1_prev")
    )
    contw = big.groupBy("w").agg(F.count(F.lit(1)).alias("n1_w"))
    n1all = big.agg(F.count(F.lit(1)).alias("n1"))
    p_kn = F.greatest(F.col("cb") - _KN_D, F.lit(0)) / F.col("cp") + (
        _KN_D * F.col("n1_prev") / F.col("cp")
    ) * (F.col("n1_w") * 1.0 / F.col("n1"))
    scored = (
        bg.join(big, ["prev", "w"])
        .join(prevc, "prev")
        .join(contw, "w")
        .crossJoin(F.broadcast(n1all))
        .select("doc_id", F.log(p_kn).cast("decimal(30,8)").alias("lp"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        R.r((-F.sum("lp").cast("double")) / F.count(F.lit(1)), 4).alias(
            "avg_nll"
        ),
    )


# --- greedy LM decode (deterministic generation walk) -----------------------
# The generation half of the n-gram stack: seed with the most frequent
# unigram, then repeatedly emit argmax_w c(prev, w) — a 16-token
# greedy decode. The model's per-context argmax table comes from ONE
# partitioned window (row_number over each prev's continuations,
# count desc / word asc ties); the walk itself is driver-coordinated
# 1-row state per step (the kmeans/BPE iterative pattern: O(steps)
# driver rows, never O(corpus)). The oracle replays the identical walk
# with a recursive CTE over the same argmax table, so every emitted
# token is value-pinned. Cycles are fine (the walk is deterministic);
# the walk stops early iff a token never occurs as a context.
_DECODE_STEPS = 15

_DECODE_ORACLE = rf"""
WITH RECURSIVE t AS (
    SELECT list_filter(string_split_regex(trim(text), '\s+'),
                       x -> len(x) > 0) AS toks
    FROM documents
),
uni AS (
    SELECT w, count(*) AS cu
    FROM (SELECT unnest(toks) AS w FROM t) GROUP BY w
),
seed AS (SELECT w FROM uni ORDER BY cu DESC, w LIMIT 1),
bg AS (
    SELECT toks, unnest(generate_series(2, len(toks))) AS i
    FROM t WHERE len(toks) >= 2
),
big AS (
    SELECT toks[i-1] AS prev, toks[i] AS w, count(*) AS cb
    FROM bg GROUP BY 1, 2
),
nxt AS (
    SELECT prev, w FROM big
    QUALIFY row_number() OVER (PARTITION BY prev
                               ORDER BY cb DESC, w) = 1
),
walk(step, tok) AS (
    SELECT 0::BIGINT, w FROM seed
    UNION ALL
    SELECT walk.step + 1, n.w
    FROM walk JOIN nxt n ON n.prev = walk.tok
    WHERE walk.step < {_DECODE_STEPS}
)
SELECT step, tok FROM walk
"""


@register("wordlm_greedy_decode", oracle=_DECODE_ORACLE)
def wordlm_greedy_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select(
        ws_tokens(F.col("text")).alias("toks")
    )
    uni = docs.select(F.explode("toks").alias("w")).groupBy("w").agg(
        F.count(F.lit(1)).alias("cu")
    )
    seed_row = uni.orderBy(F.desc("cu"), F.asc("w")).limit(1).collect()
    bg = (
        docs.filter(F.size("toks") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(2, size(toks)), "
                    "i -> struct(toks[i-2] AS prev, toks[i-1] AS w))"
                )
            ).alias("p")
        )
        .select(F.col("p.prev").alias("prev"), F.col("p.w").alias("w"))
    )
    big = bg.groupBy("prev", "w").agg(F.count(F.lit(1)).alias("cb"))
    wn = Window.partitionBy("prev").orderBy(F.desc("cb"), F.asc("w"))
    nxt = (
        big.withColumn("rn", F.row_number().over(wn))
        .filter(F.col("rn") == 1)
        .select("prev", "w")
        .persist()
    )
    walk: list[tuple[int, str]] = []
    if seed_row:
        cur = seed_row[0]["w"]
        walk.append((0, cur))
        for step in range(1, _DECODE_STEPS + 1):
            hit = nxt.filter(F.col("prev") == cur).collect()
            if not hit:
                break
            cur = hit[0]["w"]
            walk.append((step, cur))
    nxt.unpersist()
    return spark.createDataFrame(walk, "step long, tok string")
