"""LLM-corpus curation round 3: duplicated-span detection (Lee et al.
"Deduplicating Training Data Makes Language Models Better" — the
substring-level signal, approximated at span granularity), a
fixed-weight linear quality classifier (fasttext-style scorer without
the external model), and a character-bigram LM perplexity proxy
(KenLM-style perplexity filtering with a corpus-trained char model).

All pure JVM expressions; the only shuffles are the span/bigram
aggregations (bounded model tables) and the per-doc regroup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from swat_mapreduce_spark.functions import rounding as R
from swat_mapreduce_spark.functions.text import shingles_from_tokens, ws_tokens
from swat_mapreduce_spark.queries import register
from swat_mapreduce_spark.sources.readers import read_table

# --- duplicated-span detection --------------------------------------------
# Span width 3 tokens: wide enough to be a phrase, narrow enough that
# the synthetic corpus (≈40-word vocabulary) produces real cross-doc
# collisions at every SF (CLAUDE.md gotcha 5: verify non-vacuous).
# At 100 TB: one shuffle keyed by span hash to compute document
# frequency, one broadcast-free equi-join back, one per-doc regroup.
# A hot span (boilerplate appearing in 10^6 docs) only inflates the
# count/join linearly — there is no pair enumeration here, unlike
# ngram_jaccard_pairs, so no frequency cap is needed for safety.
SPAN_W = 3
SPAN_MIN_DF = 2  # span is "duplicated" if seen in >= 2 distinct docs
SPAN_FLAG_FRAC = 0.5

_SPANS_DUCK = rf"""
docs AS (
    SELECT doc_id,
           list_filter(string_split_regex(trim(text), '\s+'),
                       t -> len(t) > 0) AS toks
    FROM documents
),
spans AS (
    SELECT doc_id,
           md5(unnest(list_transform(
               generate_series(1, len(toks) - {SPAN_W - 1}),
               i -> array_to_string(toks[i:i+{SPAN_W - 1}], ' ')))) AS h
    FROM docs
    WHERE len(toks) >= {SPAN_W}
)
"""

_SUBSTR_ORACLE = f"""
WITH {_SPANS_DUCK},
df AS (
    SELECT h, count(DISTINCT doc_id) AS doc_freq FROM spans GROUP BY h
)
SELECT s.doc_id,
       count(*) AS n_spans,
       sum(CASE WHEN df.doc_freq >= {SPAN_MIN_DF} THEN 1 ELSE 0 END)
           ::BIGINT AS dup_spans,
       round(sum(CASE WHEN df.doc_freq >= {SPAN_MIN_DF} THEN 1 ELSE 0 END)
             * 10000.0 / count(*)) / 10000 + 0.0 AS dup_frac,
       (sum(CASE WHEN df.doc_freq >= {SPAN_MIN_DF} THEN 1 ELSE 0 END)
        >= {SPAN_FLAG_FRAC} * count(*)) AS flagged
FROM spans s JOIN df ON df.h = s.h
GROUP BY s.doc_id
"""


@register("dedup_substring_spans", oracle=_SUBSTR_ORACLE)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc duplicated-span fraction (span = {SPAN_W}-token window).

    Docs shorter than the span width are excluded on both engines
    (Spark's ``sequence(1, 0)`` would emit a descending range)."""
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", ws_tokens(F.col("text")).alias("toks")
    )
    spans = (
        docs.filter(F.size("toks") >= SPAN_W)
        .select(
            "doc_id",
            F.explode(shingles_from_tokens(F.col("toks"), SPAN_W)).alias(
                "span"
            ),
        )
        .select("doc_id", F.md5(F.col("span")).alias("h"))
    )
    df_tbl = spans.groupBy("h").agg(
        F.countDistinct("doc_id").alias("doc_freq")
    )
    dup = F.sum(
        F.when(F.col("doc_freq") >= SPAN_MIN_DF, 1).otherwise(0)
    )
    n = F.count(F.lit(1))
    return (
        spans.join(df_tbl, "h")
        .groupBy("doc_id")
        .agg(
            n.alias("n_spans"),
            dup.alias("dup_spans"),
            # mirror the oracle's exact op order (dup*1e4/n, round, /1e4)
            # so no last-ulp divergence can flip a rounding tie
            (F.round(dup * 10000.0 / n) / 10000.0 + 0.0).alias("dup_frac"),
            (dup >= F.lit(SPAN_FLAG_FRAC) * n).alias("flagged"),
        )
    )


# --- fixed-weight linear quality classifier --------------------------------
# Logistic scorer over cheap engineered features — the shape of a
# fasttext/linear quality filter with the learned weights replaced by
# fixed constants (no external model in this container). Entirely
# narrow after the tokenize projection; zero shuffles.
_QW = {"bias": -2.0, "len": 2.0, "uniq": 1.5, "stop": -1.0, "awl": 0.5}

_LINEAR_ORACLE = rf"""
WITH t AS (
    SELECT doc_id,
           list_filter(string_split_regex(trim(text), '\s+'),
                       t -> len(t) > 0) AS toks
    FROM documents
),
f AS (
    SELECT doc_id,
           least(1.0, len(toks) / 80.0) AS f_len,
           len(list_distinct(toks))::DOUBLE / len(toks) AS f_uniq,
           len(list_filter(toks, x -> list_contains(
               ['the', 'a', 'of', 'and', 'to', 'in', 'is'], x)))::DOUBLE
               / len(toks) AS f_stop,
           list_sum(list_transform(toks, x -> length(x)))::DOUBLE
               / len(toks) / 10.0 AS f_awl
    FROM t
)
SELECT doc_id,
       round(f_len * 10000) / 10000 + 0.0 AS f_len,
       round(f_uniq * 10000) / 10000 + 0.0 AS f_uniq,
       round(f_stop * 10000) / 10000 + 0.0 AS f_stop,
       round(f_awl * 10000) / 10000 + 0.0 AS f_awl,
       round((1.0 / (1.0 + exp(-({_QW['bias']} + {_QW['len']} * f_len
             + {_QW['uniq']} * f_uniq + {_QW['stop']} * f_stop
             + {_QW['awl']} * f_awl)))) * 10000) / 10000 + 0.0 AS prob,
       (1.0 / (1.0 + exp(-({_QW['bias']} + {_QW['len']} * f_len
             + {_QW['uniq']} * f_uniq + {_QW['stop']} * f_stop
             + {_QW['awl']} * f_awl))) >= 0.5) AS keep
FROM f
"""


@register("quality_linear_classifier", oracle=_LINEAR_ORACLE)
def quality_linear_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", ws_tokens(F.col("text")).alias("toks")
    )
    n = F.size("toks").cast("double")
    f_len = F.least(F.lit(1.0), n / 80.0)
    f_uniq = F.size(F.array_distinct("toks")).cast("double") / n
    stop_arr = F.array(
        *[F.lit(w) for w in ["the", "a", "of", "and", "to", "in", "is"]]
    )
    f_stop = (
        F.size(F.filter("toks", lambda x: F.array_contains(stop_arr, x)))
        .cast("double")
        / n
    )
    f_awl = (
        F.aggregate(
            F.transform("toks", lambda x: F.length(x).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).cast("double")
        / n
        / 10.0
    )
    feats = docs.select(
        "doc_id",
        f_len.alias("rf_len"),
        f_uniq.alias("rf_uniq"),
        f_stop.alias("rf_stop"),
        f_awl.alias("rf_awl"),
    )
    z = (
        F.lit(_QW["bias"])
        + _QW["len"] * F.col("rf_len")
        + _QW["uniq"] * F.col("rf_uniq")
        + _QW["stop"] * F.col("rf_stop")
        + _QW["awl"] * F.col("rf_awl")
    )
    prob = 1.0 / (1.0 + F.exp(-z))
    return feats.select(
        "doc_id",
        R.r("rf_len", 4).alias("f_len"),
        R.r("rf_uniq", 4).alias("f_uniq"),
        R.r("rf_stop", 4).alias("f_stop"),
        R.r("rf_awl", 4).alias("f_awl"),
        R.r(prob, 4).alias("prob"),
        (prob >= 0.5).alias("keep"),
    )


# --- char-bigram LM perplexity proxy ---------------------------------------
# KenLM-style perplexity filtering with the n-gram model trained on the
# corpus itself (one aggregation pass). The model table is bounded by
# charset² (≤ a few thousand rows at ANY corpus size) → broadcast by
# construction; scoring is a narrow broadcast join + one per-doc
# regroup. Per-doc log-prob sums go through DECIMAL(30,8) so
# accumulation order cannot move the 4dp rounding (CLAUDE.md gotcha 2).
# Cross-engine decimal shape (sf0.1 lesson): per-term log-probs are
# rounded to DECIMAL(20,6) and multiplied by DECIMAL(10,0) counts —
# product precision 31, scale 6, exact in BOTH engines. The earlier
# DECIMAL(30,8) x BIGINT product overflowed Spark's 38-digit cap,
# which silently *reduces the result scale*, de-synchronizing the sum
# from the oracle by just enough to flip one doc's 4dp rounding. The
# 1e-6 grid also gives JVM-vs-libm ln() ulp differences 100x more
# margin than 1e-8 did.
_CHARLM_ORACLE = """
WITH bg AS (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, length(text) - 1),
                                 i -> substring(text, i, 2))) AS b
    FROM documents
),
bgc AS (
    SELECT doc_id, b, count(*) AS cd FROM bg GROUP BY doc_id, b
),
model AS (
    SELECT b, sum(cd) AS c FROM bgc GROUP BY b
),
tot AS (SELECT sum(c)::DOUBLE AS t FROM model),
scored AS (
    SELECT bgc.doc_id, bgc.cd,
           CAST(ln(model.c / tot.t) AS DECIMAL(20,6))
               * CAST(bgc.cd AS DECIMAL(10,0)) AS lp
    FROM bgc JOIN model ON model.b = bgc.b CROSS JOIN tot
)
SELECT doc_id,
       sum(cd)::BIGINT AS n_bigrams,
       round((-sum(lp)::DOUBLE / sum(cd)) * 10000) / 10000 + 0.0
           AS avg_nll
FROM scored
GROUP BY doc_id
"""


@register("charlm_perplexity_proxy", oracle=_CHARLM_ORACLE)
def charlm_perplexity_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from swat_mapreduce_spark.functions import text as T

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    # split('')-based bigrams (r12): O(len) zip_with vs the O(len²)
    # per-index substring transform; <=1-char docs yield empty arrays
    # (the old gotcha-10 guard's semantics, now structural)
    bg = docs.withColumn("cs", T.char_array(F.col("text"))).select(
        "doc_id",
        F.explode(T.char_bigrams_from("cs")).alias("b"),
    )
    # Aggregate to per-doc bigram COUNTS first: the exploded stream is
    # O(corpus chars) but the counted table is charset²-bounded per doc
    # (~1e3 rows/doc), and it feeds BOTH the model build and the
    # scoring join — persisted so the explode runs once. Scoring
    # weights each distinct bigram's log-prob by its multiplicity;
    # decimal lp × integer count is exactly the per-occurrence sum.
    from pyspark import StorageLevel

    bgc = (
        bg.groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("cd"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    model = bgc.groupBy("b").agg(F.sum("cd").alias("c"))
    tot = model.agg(F.sum("c").cast("double").alias("t"))
    scored = (
        bgc.join(F.broadcast(model), "b")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "cd",
            (
                F.log(F.col("c") / F.col("t")).cast("decimal(20,6)")
                * F.col("cd").cast("decimal(10,0)")
            ).alias("lp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.sum("cd").alias("n_bigrams"),
        R.r(
            (-F.sum("lp").cast("double")) / F.sum("cd"), 4
        ).alias("avg_nll"),
    )


# --- corpus filter attrition funnel ----------------------------------------
# The "data funnel" report every corpus pipeline publishes (C4 /
# Gopher / RefinedWeb all report per-rule attrition): rules applied in
# a fixed order, each doc attributed to the FIRST rule it fails, then
# one tiny cumulative pass turns first-fail counts into the
# stage-by-stage n_dropped / n_remaining table. ONE corpus scan
# (narrow per-doc feature math + a first-fail classification), one
# |rules|-row aggregate — the cumulative window runs over 6 rows.
_FUNNEL_RULES = [
    ("min_tokens", "n_tokens < 20"),
    ("max_tokens", "n_tokens > 80"),
    ("uniq_ratio", "uniq_ratio < 0.35"),
    ("stop_ratio", "stop_ratio > 0.15"),
    ("mean_word_len", "mean_wl < 4.2 OR mean_wl > 4.8"),
]

_ATTRITION_ORACLE = rf"""
WITH t AS (
    SELECT doc_id,
           list_filter(string_split_regex(trim(text), '\s+'),
                       x -> len(x) > 0) AS toks
    FROM documents
),
f AS (
    SELECT doc_id,
           len(toks) AS n_tokens,
           len(list_distinct(toks))::DOUBLE / len(toks) AS uniq_ratio,
           len(list_filter(toks, x -> list_contains(
               ['the', 'a', 'of', 'and', 'to', 'in', 'is'], x)))::DOUBLE
               / len(toks) AS stop_ratio,
           list_sum(list_transform(toks, x -> length(x)))::DOUBLE
               / len(toks) AS mean_wl
    FROM t
),
ff AS (
    SELECT CASE
        {" ".join(f"WHEN {cond} THEN '{name}'" for name, cond in _FUNNEL_RULES)}
        ELSE 'kept' END AS first_fail
    FROM f
),
counts AS (
    SELECT first_fail, count(*) AS c FROM ff GROUP BY first_fail
),
stages AS (
    SELECT * FROM (VALUES
        {", ".join(f"({i}, '{name}')" for i, (name, _) in enumerate(_FUNNEL_RULES))}
    ) AS v(stage_no, stage)
)
SELECT s.stage_no, s.stage,
       (SELECT sum(c) FROM counts)::BIGINT
           - coalesce(sum(c2.c) OVER (ORDER BY s.stage_no
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0)::BIGINT AS n_in,
       coalesce(c2.c, 0)::BIGINT AS n_dropped
FROM stages s LEFT JOIN counts c2 ON c2.first_fail = s.stage
"""


@register("filter_attrition_funnel", oracle=_ATTRITION_ORACLE)
def filter_attrition_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", ws_tokens(F.col("text")).alias("toks")
    )
    n = F.size("toks").cast("double")
    stop_arr = F.array(
        *[F.lit(w) for w in ["the", "a", "of", "and", "to", "in", "is"]]
    )
    feats = docs.select(
        F.size("toks").cast("long").alias("n_tokens"),
        (F.size(F.array_distinct("toks")).cast("double") / n).alias(
            "uniq_ratio"
        ),
        (
            F.size(
                F.filter("toks", lambda x: F.array_contains(stop_arr, x))
            ).cast("double")
            / n
        ).alias("stop_ratio"),
        (
            F.aggregate(
                F.transform("toks", lambda x: F.length(x).cast("long")),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).cast("double")
            / n
        ).alias("mean_wl"),
    )
    first_fail = (
        F.when(F.col("n_tokens") < 20, "min_tokens")
        .when(F.col("n_tokens") > 80, "max_tokens")
        .when(F.col("uniq_ratio") < 0.35, "uniq_ratio")
        .when(F.col("stop_ratio") > 0.15, "stop_ratio")
        .when(
            (F.col("mean_wl") < 4.2) | (F.col("mean_wl") > 4.8),
            "mean_word_len",
        )
        .otherwise("kept")
    )
    counts = feats.select(first_fail.alias("first_fail")).groupBy(
        "first_fail"
    ).agg(F.count(F.lit(1)).alias("c"))
    stages = counts.sparkSession.createDataFrame(
        [(i, name) for i, (name, _) in enumerate(_FUNNEL_RULES)],
        "stage_no int, stage string",
    )
    total = counts.agg(F.sum("c").alias("total"))
    joined = (
        stages.join(
            counts, stages["stage"] == counts["first_fail"], "left"
        )
        .crossJoin(F.broadcast(total))
        .select(
            "stage_no",
            "stage",
            "total",
            F.coalesce(F.col("c"), F.lit(0)).alias("dropped"),
        )
    )
    w = (
        Window.orderBy("stage_no")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return joined.select(
        "stage_no",
        "stage",
        (
            F.col("total")
            - F.coalesce(F.sum("dropped").over(w), F.lit(0))
        ).cast("long").alias("n_in"),
        F.col("dropped").cast("long").alias("n_dropped"),
    )


# --- cross-source contamination matrix -------------------------------------
# Which sources share content with which: per-shingle distinct source
# list (bounded by |sources|, NOT by doc count — the aggregation
# collapses before any pair math), then per-shingle source pairs.
# A boilerplate shingle present in every source costs |sources|²/2
# pairs — a constant — so there is no hot-key blowup by construction.
_OVERLAP_ORACLE = r"""
WITH t AS (
    SELECT doc_id, source,
           list_filter(string_split_regex(trim(text), '\s+'),
                       x -> len(x) > 0) AS toks
    FROM documents
),
sh AS (
    SELECT DISTINCT source,
           md5(unnest(list_transform(generate_series(1, len(toks) - 2),
               i -> array_to_string(toks[i:i+2], ' ')))) AS h
    FROM t
    WHERE len(toks) >= 3
),
pairs AS (
    SELECT a.source AS source_a, b.source AS source_b, a.h
    FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source
),
per_src AS (SELECT source, count(*) AS n FROM sh GROUP BY source)
SELECT p.source_a, p.source_b,
       count(*)::BIGINT AS shared_shingles,
       round(count(*)::DOUBLE / (na.n + nb.n - count(*)) * 10000)
           / 10000 + 0.0 AS jaccard
FROM pairs p
JOIN per_src na ON na.source = p.source_a
JOIN per_src nb ON nb.source = p.source_b
GROUP BY p.source_a, p.source_b, na.n, nb.n
"""


@register("source_overlap_matrix", oracle=_OVERLAP_ORACLE)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from swat_mapreduce_spark.functions.arrays import explode_nonnull
    from swat_mapreduce_spark.sources.readers import fan_out

    # fan_out (r13): the shingle+md5 pipeline previously ran in the
    # single scan task up to the first exchange
    docs = fan_out(read_table(spark, sf_dir, "documents")).select(
        "doc_id", "source", ws_tokens(F.col("text")).alias("toks")
    )
    # explode_nonnull (gotcha 13, r13): the inferred size()>0 filter
    # re-inlined the whole shingle transform into the scan
    sh = (
        explode_nonnull(
            docs.filter(F.size("toks") >= SPAN_W),
            shingles_from_tokens(F.col("toks"), SPAN_W),
            "s",
            "source",
        )
        .select("source", F.md5(F.col("s")).alias("h"))
        .distinct()
    )
    # r13 (VERDICT r12 #3, guide §2.3 + the d47db6b in-row pair
    # recipe): the former sh⋈sh self-join on h shuffled the whole
    # distinct postings table TWICE into a sort-merge join. One
    # groupBy(h) instead collapses each shingle to its ≤|sources|
    # source list (a boilerplate shingle in every source costs
    # |sources|²/2 pairs — a constant), pairs are generated in-row
    # (posexplode + slice, lambda-free per gotcha 1), and per-source
    # totals fall out of the SAME grouped table — the corpus postings
    # are shuffled exactly once.
    srcs = sh.groupBy("h").agg(
        F.array_sort(F.collect_set("source")).alias("ss")
    )
    pairs = (
        srcs.filter(F.size("ss") >= 2)
        .select("ss", F.posexplode("ss").alias("i", "source_a"))
        .select(
            "source_a",
            F.explode(
                F.slice("ss", F.col("i") + 2, F.size("ss"))
            ).alias("source_b"),
        )
    )
    per_src = (
        srcs.select(F.explode("ss").alias("source"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    shared = pairs.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).alias("shared_shingles")
    )
    na = per_src.select(
        F.col("source").alias("source_a"), F.col("n").alias("na")
    )
    nb = per_src.select(
        F.col("source").alias("source_b"), F.col("n").alias("nb")
    )
    out = shared.join(F.broadcast(na), "source_a").join(
        F.broadcast(nb), "source_b"
    )
    denom = F.col("na") + F.col("nb") - F.col("shared_shingles")
    return out.select(
        "source_a",
        "source_b",
        "shared_shingles",
        (
            F.round(
                F.col("shared_shingles").cast("double") / denom * 10000.0
            )
            / 10000.0
            + 0.0
        ).alias("jaccard"),
    )


# --- BPE first-merge pair statistics ---------------------------------------
# The first iteration of byte-pair-encoding tokenizer training: build
# the word vocabulary WITH counts (one corpus shuffle that collapses
# to |vocab| rows), then count adjacent character pairs over the
# vocabulary weighted by word frequency — the corpus itself is never
# touched again, which is exactly why BPE training scales (all
# iterations run on the vocab table, not the corpus). Top-20 by
# count with lexicographic tie-break.
_BPE_ORACLE = r"""
WITH w AS (
    SELECT unnest(list_filter(string_split_regex(trim(text), '\s+'),
                              x -> len(x) > 0)) AS word
    FROM documents
),
vocab AS (SELECT word, count(*) AS cnt FROM w GROUP BY word),
prs AS (
    SELECT unnest(list_transform(generate_series(1, length(word) - 1),
                                 i -> substring(word, i, 2))) AS pair,
           cnt
    FROM vocab
    WHERE length(word) >= 2
)
SELECT pair, sum(cnt)::BIGINT AS n
FROM prs
GROUP BY pair
ORDER BY n DESC, pair
LIMIT 20
"""


@register("bpe_pair_stats", oracle=_BPE_ORACLE)
def bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select(
        ws_tokens(F.col("text")).alias("toks")
    )
    vocab = (
        docs.select(F.explode("toks").alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # 1-char words have no adjacent pairs; filtering them keeps both
    # engines off the sequence(1, 0) edge (descending in Spark, empty
    # in DuckDB)
    prs = vocab.filter(F.length("word") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(word) - 1), "
                "i -> substring(word, i, 2))"
            )
        ).alias("pair"),
        "cnt",
    )
    return (
        prs.groupBy("pair")
        .agg(F.sum("cnt").cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(20)
    )


# --- iterative BPE training (K merges) -------------------------------------
# Real tokenizer training iterates merge→re-pair: per iteration, count
# adjacent SYMBOL pairs over the word-frequency table, adopt the most
# frequent pair (lexicographic tie-break) as a merge, apply it to every
# word, repeat. K=3 here. Driver-side state is ONE (pair, count) row
# per iteration — constant in corpus size (the kmeans_lloyd_2iter
# pattern); the merge application itself is a distributed literal
# string replace over the vocab table.
#
# Words are held as space-joined symbol strings (" h e l l o ").
# Applying a merge is replace(' a b ' → ' ab ') run TWICE: a literal
# non-overlapping left-to-right scan merges the 1st, 3rd, … occurrence
# of each adjacency chain (the 2nd, 4th, … lose their shared boundary
# space to the preceding match); the second pass merges exactly those
# leftovers. For DISTINCT-symbol pairs two passes equal greedy
# left-to-right BPE (exhaustively property-tested,
# tests/test_properties.py); same-symbol pairs (x, x) under-merge long
# runs and are therefore excluded from merge adoption in both engines.
# Spark's replace() and DuckDB's replace() share the scan semantics —
# verified side-by-side on ' a b a b '.
#
# Per-iteration cost: one narrow char-explode over the (persisted)
# vocab table + one shuffle on pair + a 1-row TakeOrdered — the same
# shape at any corpus size, since the vocab table is |distinct words|,
# not |corpus|. Output: K rows (merge_rank, pair, merged, pair_count,
# symbols_after), symbols_after computed distributively AFTER each
# merge — pinning that the replace actually happened on every word.
_BPE_K = 3


def _bpe_cte() -> str:
    """Shared DuckDB WITH-body replaying the K-merge BPE training:
    s0 (char-spaced vocab) → per-iteration pair counts p{k}, adopted
    merge b{k}, merged vocab s{k}. ``word`` is carried through every
    s{k} so consumers (bpe_encode_corpus) can join encoded lengths
    back to the corpus."""
    parts = [
        r"""
WITH w AS (
    SELECT unnest(list_filter(string_split_regex(trim(text), '\s+'),
                              x -> len(x) > 0)) AS word
    FROM documents
),
vocab AS (SELECT word, count(*) AS cnt FROM w GROUP BY word),
s0 AS (
    SELECT word,
           ' ' || array_to_string(string_split(word, ''), ' ') || ' ' AS sp,
           cnt
    FROM vocab
)"""
    ]
    for k in range(1, _BPE_K + 1):
        parts.append(f""",
t{k} AS (SELECT string_split(trim(sp), ' ') AS t, cnt FROM s{k - 1}),
i{k} AS (
    SELECT t, cnt, unnest(generate_series(1, len(t) - 1)) AS i
    FROM t{k} WHERE len(t) >= 2
),
p{k} AS (
    SELECT t[i] || ' ' || t[i + 1] AS pair, sum(cnt)::BIGINT AS n
    FROM i{k} GROUP BY 1
),
b{k} AS (
    SELECT pair, n FROM p{k}
    WHERE string_split(pair, ' ')[1] <> string_split(pair, ' ')[2]
    ORDER BY n DESC, pair ASC LIMIT 1
),
s{k} AS (
    -- LEFT JOIN ON TRUE (not CROSS JOIN): when a round has no
    -- adoptable distinct-symbol pair, b{{k}} is empty and a cross
    -- join would collapse the whole vocab to 0 rows; the identity
    -- CASE carries s{{k-1}} through, matching the Spark trainer's
    -- early-break semantics (ADVICE r5).
    SELECT word,
           CASE WHEN b.pair IS NULL THEN sp
                ELSE replace(replace(sp,
                    ' ' || b.pair || ' ',
                    ' ' || replace(b.pair, ' ', '') || ' '),
                    ' ' || b.pair || ' ',
                    ' ' || replace(b.pair, ' ', '') || ' ')
           END AS sp,
           cnt
    FROM s{k - 1} LEFT JOIN b{k} b ON TRUE
)""")
    return "".join(parts)


def _bpe_train_oracle() -> str:
    selects = [
        f"""
SELECT {k} AS merge_rank, b{k}.pair AS pair,
       replace(b{k}.pair, ' ', '') AS merged, b{k}.n AS pair_count,
       (SELECT sum(cnt * len(string_split(trim(sp), ' ')))::BIGINT
        FROM s{k}) AS symbols_after
FROM b{k}"""
        for k in range(1, _BPE_K + 1)
    ]
    return _bpe_cte() + " UNION ALL ".join(selects)


def _learn_bpe(spark: SparkSession, sf_dir: str):
    """Run the K-merge BPE training loop. Returns
    ``(steps, final)`` where ``steps`` is a list of
    ``(pair, count, merged_vocab_df)`` per iteration (driver state:
    one pair+count per round — constant in corpus size) and ``final``
    is the fully merged vocab DataFrame ``(word, sp, cnt)``."""
    from pyspark import StorageLevel

    docs = read_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(ws_tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # the vocab table feeds every iteration (pair counts AND merge
    # application) — persist once; |distinct words| << |corpus|
    spaced = vocab.select(
        "word",
        F.concat(
            F.lit(" "), F.array_join(F.split("word", ""), " "), F.lit(" ")
        ).alias("sp"),
        "cnt",
    ).persist(StorageLevel.MEMORY_AND_DISK)
    cur = spaced
    steps = []
    for _k in range(1, _BPE_K + 1):
        pairs = (
            cur.select(F.split(F.trim(F.col("sp")), " ").alias("t"), "cnt")
            .filter(F.size("t") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(t) - 1), "
                        "i -> concat(element_at(t, i), ' ', "
                        "element_at(t, i + 1)))"
                    )
                ).alias("pair"),
                "cnt",
            )
            .groupBy("pair")
            .agg(F.sum("cnt").cast("long").alias("n"))
        )
        # Same-symbol pairs (x, x) are EXCLUDED from adoption in both
        # engines: the two-pass literal replace realizes greedy BPE
        # exactly for distinct-symbol pairs (property-tested,
        # tests/test_properties.py) but under-merges same-symbol runs
        # ('a a a a a a' → aa a aa a instead of aa aa aa) — rather
        # than ship a silently-wrong corner, the trainer restricts its
        # candidate set and documents it. pair stats (bpe_pair_stats)
        # still COUNT same-symbol pairs; they just cannot win a merge.
        # 1-row TakeOrderedAndProject → constant driver state per iter
        distinct_pair = F.element_at(F.split("pair", " "), 1) != F.element_at(
            F.split("pair", " "), 2
        )
        best_rows = (
            pairs.filter(distinct_pair)
            .orderBy(F.desc("n"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not best_rows:  # empty/degenerate corpus: no adoptable pair
            break
        best = best_rows[0]
        pair, n = best["pair"], int(best["n"])
        merged = pair.replace(" ", "")
        pat, rep = F.lit(f" {pair} "), F.lit(f" {merged} ")
        cur = cur.select(
            "word",
            F.replace(F.replace(F.col("sp"), pat, rep), pat, rep).alias("sp"),
            "cnt",
        )
        steps.append((pair, n, cur))
    return steps, cur


@register("bpe_train_kmerges", oracle=_bpe_train_oracle())
def bpe_train_kmerges(spark: SparkSession, sf_dir: str) -> DataFrame:
    steps, _final = _learn_bpe(spark, sf_dir)
    if not steps:  # empty/degenerate corpus: schema-correct 0 rows
        return spark.sql(
            "SELECT CAST(NULL AS INT) AS merge_rank,"
            " CAST(NULL AS STRING) AS pair,"
            " CAST(NULL AS STRING) AS merged,"
            " CAST(NULL AS BIGINT) AS pair_count,"
            " CAST(NULL AS BIGINT) AS symbols_after"
        ).limit(0)
    per_merge = []
    for k, (pair, n, cur) in enumerate(steps, start=1):
        per_merge.append(
            cur.agg(
                F.sum(
                    F.col("cnt") * F.size(F.split(F.trim(F.col("sp")), " "))
                )
                .cast("long")
                .alias("symbols_after")
            ).select(
                F.lit(k).alias("merge_rank"),
                F.lit(pair).alias("pair"),
                F.lit(pair.replace(" ", "")).alias("merged"),
                F.lit(n).cast("long").alias("pair_count"),
                "symbols_after",
            )
        )
    out = per_merge[0]
    for df in per_merge[1:]:
        out = out.unionByName(df)
    return out


# --- BPE corpus encoding (fertility report) --------------------------------
# The train loop's downstream half: apply the K learned merges to the
# WHOLE corpus and report per-language tokenizer fertility — BPE
# symbols per word, chars per BPE symbol — the numbers that decide
# whether a tokenizer is fit for a language mix. The corpus is touched
# once (per-(lang, word) counts); encoded symbol lengths come from the
# vocab-sized merged table via a word-keyed join, so everything after
# the corpus scan scales with |vocabulary|, not corpus bytes.
_BPE_ENCODE_ORACLE = (
    _bpe_cte()
    + f""",
wl AS (
    SELECT lang,
           unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                              x -> len(x) > 0)) AS word
    FROM documents
),
lw AS (SELECT lang, word, count(*) AS c FROM wl GROUP BY 1, 2),
enc AS (
    SELECT word, len(string_split(trim(sp), ' ')) AS n_sym
    FROM s{_BPE_K}
)
SELECT lang,
       sum(c)::BIGINT AS n_tokens,
       sum(c * length(word))::BIGINT AS n_chars,
       sum(c * n_sym)::BIGINT AS n_bpe_symbols,
       round((sum(c * n_sym)::DOUBLE / sum(c)) * 10000) / 10000 + 0.0
           AS fertility,
       round((sum(c * length(word))::DOUBLE / sum(c * n_sym)) * 10000)
           / 10000 + 0.0 AS chars_per_symbol
FROM lw JOIN enc USING (word)
GROUP BY lang
"""
)


@register("bpe_encode_corpus", oracle=_BPE_ENCODE_ORACLE)
def bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    _steps, final = _learn_bpe(spark, sf_dir)
    enc = final.select(
        "word", F.size(F.split(F.trim(F.col("sp")), " ")).alias("n_sym")
    )
    docs = read_table(spark, sf_dir, "documents")
    lw = (
        docs.select("lang", F.explode(ws_tokens(F.col("text"))).alias("word"))
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    j = lw.join(enc, "word")
    return j.groupBy("lang").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.sum(F.col("c") * F.length("word")).cast("long").alias("n_chars"),
        F.sum(F.col("c") * F.col("n_sym")).cast("long").alias("n_bpe_symbols"),
        (
            F.round(
                (
                    F.sum(F.col("c") * F.col("n_sym")).cast("double")
                    / F.sum("c")
                )
                * 10000.0
            )
            / 10000.0
            + 0.0
        ).alias("fertility"),
        (
            F.round(
                (
                    F.sum(F.col("c") * F.length("word")).cast("double")
                    / F.sum(F.col("c") * F.col("n_sym"))
                )
                * 10000.0
            )
            / 10000.0
            + 0.0
        ).alias("chars_per_symbol"),
    )


# --- per-document token entropy --------------------------------------------
# Shannon entropy of the within-doc token distribution — the
# information-theoretic repetition signal (a doc stuck on 3 tokens has
# ~1.5 bits; healthy prose runs 5-7): the entropy analog of the
# Gopher repetition rules. Shape: explode → (doc, token) count →
# per-doc entropy fold; both shuffles key on doc-sized groups, terms
# go through DECIMAL(30,8) so Spark's fold order and DuckDB's row
# order can't diverge at the rounding.
_ENTROPY_ORACLE = r"""
WITH w AS (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(trim(text), '\s+'),
                              x -> len(x) > 0)) AS tok
    FROM documents
),
cnt AS (
    SELECT doc_id, tok, count(*) AS c FROM w GROUP BY doc_id, tok
),
tot AS (SELECT doc_id, sum(c) AS n FROM cnt GROUP BY doc_id),
terms AS (
    SELECT c.doc_id,
           CAST(-(c.c::DOUBLE / t.n) * log2(c.c::DOUBLE / t.n)
                AS DECIMAL(30,8)) AS term
    FROM cnt c JOIN tot t ON t.doc_id = c.doc_id
)
SELECT doc_id,
       round(sum(term)::DOUBLE * 10000) / 10000 + 0.0 AS entropy_bits
FROM terms
GROUP BY doc_id
"""


@register("token_entropy", oracle=_ENTROPY_ORACLE)
def token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", ws_tokens(F.col("text")).alias("toks")
    )
    cnt = (
        docs.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = cnt.groupBy("doc_id").agg(F.sum("c").alias("n"))
    p = F.col("c").cast("double") / F.col("n")
    terms = cnt.join(tot, "doc_id").select(
        "doc_id",
        (-p * F.log2(p)).cast("decimal(30,8)").alias("term"),
    )
    return terms.groupBy("doc_id").agg(
        (
            F.round(F.sum("term").cast("double") * 10000.0) / 10000.0
            + 0.0
        ).alias("entropy_bits")
    )


# --- interpolated word-bigram LM scoring -----------------------------------
# Jelinek–Mercer interpolation: p(w|prev) = λ·p_bigram + (1-λ)·p_uni,
# the standard smoothing for n-gram LM quality scoring (what KenLM
# does with Kneser–Ney; JM is the oracle-able member of the family).
# Model tables are plain aggregates JOINED (not broadcast) onto the
# per-doc bigram stream — at web scale the bigram table is
# vocab²-shaped, so the shuffle join is the honest plan; Catalyst
# still broadcasts it when stats say it's small. Per-doc log-prob
# sums go through DECIMAL(30,8) (order-independent rounding).
_JM_LAMBDA = 0.7

_WORDLM_ORACLE = rf"""
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
uni AS (
    SELECT w, count(*) AS cu
    FROM (SELECT unnest(toks) AS w FROM t)
    GROUP BY w
),
n_tot AS (SELECT sum(cu)::DOUBLE AS n FROM uni),
big AS (
    SELECT prev, w, count(*) AS cb FROM flat GROUP BY prev, w
),
prevc AS (
    SELECT prev, sum(cb) AS cp FROM big GROUP BY prev
),
scored AS (
    SELECT f.doc_id,
           CAST(ln({_JM_LAMBDA} * (b.cb::DOUBLE / pc.cp)
                + {1 - _JM_LAMBDA} * (u.cu / n_tot.n))
                AS DECIMAL(30,8)) AS lp
    FROM flat f
    JOIN big b ON b.prev = f.prev AND b.w = f.w
    JOIN prevc pc ON pc.prev = f.prev
    JOIN uni u ON u.w = f.w
    CROSS JOIN n_tot
)
SELECT doc_id,
       count(*)::BIGINT AS n_bigrams,
       round((-sum(lp)::DOUBLE / count(*)) * 10000) / 10000 + 0.0
           AS avg_nll
FROM scored
GROUP BY doc_id
"""


@register("wordlm_interpolated_nll", oracle=_WORDLM_ORACLE)
def wordlm_interpolated_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        .select("doc_id", F.col("p.prev").alias("prev"), F.col("p.w").alias("w"))
    )
    uni = docs.select(F.explode("toks").alias("w")).groupBy("w").agg(
        F.count(F.lit(1)).alias("cu")
    )
    n_tot = uni.agg(F.sum("cu").cast("double").alias("n"))
    big = bg.groupBy("prev", "w").agg(F.count(F.lit(1)).alias("cb"))
    prevc = big.groupBy("prev").agg(F.sum("cb").alias("cp"))
    p_int = _JM_LAMBDA * (
        F.col("cb").cast("double") / F.col("cp")
    ) + (1 - _JM_LAMBDA) * (F.col("cu") / F.col("n"))
    scored = (
        bg.join(big, ["prev", "w"])
        .join(prevc, "prev")
        .join(uni, "w")
        .crossJoin(F.broadcast(n_tot))
        .select(
            "doc_id", F.log(p_int).cast("decimal(30,8)").alias("lp")
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        R.r((-F.sum("lp").cast("double")) / F.count(F.lit(1)), 4).alias(
            "avg_nll"
        ),
    )


# --- multi-granularity duplication report ----------------------------------
# The corpus-health overview a dedup pipeline publishes before
# choosing where to spend its budget: duplication measured at DOCUMENT
# (md5 of full text), CHUNK (8-token windows — paragraph_dedup's
# unit), and SPAN (3-token windows — dedup_substring_spans' unit)
# granularity, one row each. All three are hash-groupBy aggregates —
# digest keys, no pair math — unioned into one plan.
_MULTIGRAIN_ORACLE = rf"""
WITH t AS (
    SELECT doc_id, text,
           list_filter(string_split_regex(trim(text), '\s+'),
                       x -> len(x) > 0) AS toks
    FROM documents
),
doc_units AS (
    SELECT md5(text) AS h, count(*) AS n FROM t GROUP BY 1
),
chunk_units AS (
    SELECT h, count(*) AS n FROM (
        SELECT md5(array_to_string(toks[(j*8+1):(j*8+8)], ' ')) AS h
        FROM t, unnest(range(0, cast(ceil(len(toks) / 8.0) AS BIGINT)))
             AS u(j)
        WHERE len(toks) > 0) GROUP BY h
),
span_units AS (
    SELECT h, count(*) AS n FROM (
        SELECT md5(unnest(list_transform(
                   generate_series(1, len(toks) - 2),
                   i -> array_to_string(toks[i:i+2], ' ')))) AS h
        FROM t WHERE len(toks) >= 3) GROUP BY h
),
rep AS (
    SELECT 'document' AS granularity, sum(n) AS n_units,
           sum(CASE WHEN n >= 2 THEN n ELSE 0 END) AS n_duplicated
    FROM doc_units
    UNION ALL
    SELECT 'chunk_8tok', sum(n),
           sum(CASE WHEN n >= 2 THEN n ELSE 0 END)
    FROM chunk_units
    UNION ALL
    SELECT 'span_3tok', sum(n),
           sum(CASE WHEN n >= 2 THEN n ELSE 0 END)
    FROM span_units
)
SELECT granularity, n_units::BIGINT AS n_units,
       n_duplicated::BIGINT AS n_duplicated,
       round(n_duplicated * 10000.0 / n_units) / 10000 + 0.0
           AS dup_frac
FROM rep
"""


@register("multigranularity_dup_report", oracle=_MULTIGRAIN_ORACLE)
def multigranularity_dup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "text", ws_tokens(F.col("text")).alias("toks")
    )

    def report(units, name):
        grp = units.groupBy("h").agg(F.count(F.lit(1)).alias("n"))
        n_units = F.sum("n")
        n_dup = F.sum(F.when(F.col("n") >= 2, F.col("n")).otherwise(0))
        return grp.agg(
            F.lit(name).alias("granularity"),
            n_units.cast("long").alias("n_units"),
            n_dup.cast("long").alias("n_duplicated"),
            (
                F.round(n_dup * 10000.0 / n_units) / 10000.0 + 0.0
            ).alias("dup_frac"),
        )

    doc_u = docs.select(F.md5("text").alias("h"))
    n_chunks = F.ceil(F.size("toks") / 8.0).cast("long")
    chunk_u = (
        docs.filter(F.size("toks") > 0)
        .select(
            "toks",
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("j"),
        )
        .select(
            F.md5(
                F.array_join(
                    F.slice(F.col("toks"), F.col("j") * 8 + 1, F.lit(8)),
                    " ",
                )
            ).alias("h")
        )
    )
    span_u = (
        docs.filter(F.size("toks") >= SPAN_W)
        .select(
            F.explode(
                shingles_from_tokens(F.col("toks"), SPAN_W)
            ).alias("s")
        )
        .select(F.md5("s").alias("h"))
    )
    return (
        report(doc_u, "document")
        .unionAll(report(chunk_u, "chunk_8tok"))
        .unionAll(report(span_u, "span_3tok"))
    )
