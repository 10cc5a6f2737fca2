"""Training-data selection & pre-shuffle audit pack: the three ops a
100 TB ingestion pipeline runs between "raw corpus" and "training mix".

* ``dsir_importance_weights`` — hashed n-gram importance weighting
  (DSIR, Xie et al. 2023): score every raw document by how target-
  domain-like its token distribution is, log p_target(x) − log p_raw(x)
  under two hashed bag-of-words unigram models. The model state is a
  FIXED 256-row table (hash buckets), so at 100 TB the corpus pays one
  tokenize pass to build doc×bucket counts, the models aggregate from
  that same subtree (256-row shuffle), and scoring is a broadcast join
  back — no second corpus scan, no driver state.
* ``cdc_chunk_dedup`` — content-defined chunking: boundaries where the
  rolling 8-char window's hash lands in 1/16 of hash space, so chunk
  edges realign after insertions/deletions (unlike fixed-width
  chunks). The rsync/LBFS/dedup-storage primitive, applied to corpus
  text: duplicated chunks across documents surface shift-invariant
  copy-paste that exact-doc and paragraph dedup both miss.
* ``shuffle_key_skew_audit`` — the pre-join diagnostic for the dedup
  family's REAL shuffle key (the trigram shingle): per-magnitude key
  histogram + max-key share + skew factor. These are the numbers that
  justify MAX_DF caps, salting, and AQE skew thresholds BEFORE a 100 TB
  self-join is launched, computed from the (key, count) aggregate only
  — one map-side-combined shuffle, no global window, O(distinct keys)
  downstream.

Scale posture: every query aggregates the corpus exactly once on a
bounded-cardinality key (256 buckets / chunk hashes / distinct
shingles), then operates on the aggregate; summaries are single-row
broadcasts, never windows. Integer/decimal arithmetic end-to-end at
the comparison-sensitive spots (CLAUDE.md gotchas 2/8): the one ln()
per DSIR bucket is rounded to DECIMAL(20,6) on both engines before the
decimal-exact weighted sum (the char-LM pattern, llm_text3.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from swat_mapreduce_spark.functions import hashing as _H
from swat_mapreduce_spark.functions import rounding as R
from swat_mapreduce_spark.functions import text as T
from swat_mapreduce_spark.functions.text import ws_tokens
from swat_mapreduce_spark.queries import register
from swat_mapreduce_spark.queries.llm_text5 import (
    _OCC_DUCK,
    _shingle_occurrences,
)
from swat_mapreduce_spark.sources.readers import fan_out, read_table

# --- DSIR importance weighting ---------------------------------------------
# Hashed unigram features: bucket = md5-uint32(token) % 256 — same
# 8-nibble md5→BIGINT idiom as the minhash family (operators/dedup.
# shingle_uint), mirrored verbatim in DuckDB. Laplace-smoothed bucket
# probabilities; the per-bucket log-ratio is ln of ONE exact-integer
# ratio evaluated as a single correctly-rounded double division
# ((t+1)(R+256)) / ((T+256)(r+1)) — products stay < 2^53 at tested
# scales (note: a real 100 TB run lifts these to DECIMAL products) —
# then snapped to DECIMAL(20,6) on both engines so the cross-libm ln
# ulp can't leak into the weighted sum. Weight = Σ n_b · lr_b as
# DECIMAL(10,0)×DECIMAL(20,6) → DECIMAL(31,6) terms (precision
# 10+20+1 ≤ 38: no silent scale loss, gotcha 8), summed exactly.
_DSIR_ORACLE = r"""
WITH occ AS (
    SELECT doc_id, lang,
           unnest(list_filter(string_split_regex(trim(text), '\s+'),
                              x -> len(x) > 0)) AS tok
    FROM documents
),
db AS (
    SELECT doc_id, lang,
           ('0x' || substr(md5(tok), 1, 8))::BIGINT % 256 AS b,
           count(*) AS n
    FROM occ GROUP BY 1, 2, 3
),
bk AS (
    SELECT b, sum(n)::BIGINT AS r_cnt,
           sum(CASE WHEN lang = 'en' THEN n ELSE 0 END)::BIGINT AS t_cnt
    FROM db GROUP BY b
),
tot AS (SELECT sum(r_cnt)::BIGINT AS rt, sum(t_cnt)::BIGINT AS tt FROM bk),
model AS (
    SELECT b, CAST(ln(((t_cnt + 1) * (rt + 256))::DOUBLE
                      / ((tt + 256) * (r_cnt + 1))) AS DECIMAL(20,6)) AS lr
    FROM bk, tot
),
sc AS (
    SELECT d.doc_id, d.lang, sum(d.n)::BIGINT AS n_toks,
           sum(CAST(d.n AS DECIMAL(10,0)) * m.lr) AS w
    FROM db d JOIN model m ON d.b = m.b
    GROUP BY 1, 2
)
SELECT doc_id, lang, n_toks,
       round(w::DOUBLE, 4) AS weight,
       round(w::DOUBLE * 1000 / n_toks, 4) AS weight_per_1k,
       w > 0 AS selected
FROM sc
"""


@register("dsir_importance_weights", oracle=_DSIR_ORACLE)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection: per-document importance weight
    ln p_target/p_raw under 256-bucket hashed-unigram LMs, target =
    ``lang='en'`` documents, raw = whole corpus. The doc×bucket count
    aggregate is the ONLY corpus-width pass (persisted — both the
    model build and the scoring join consume it); the 256-row model
    broadcasts back. selected = (weight > 0): the importance-resampling
    acceptance direction."""
    docs = read_table(spark, sf_dir, "documents")
    occ = (
        fan_out(docs)
        .select("doc_id", "lang", ws_tokens(F.col("text")).alias("toks"))
        .select("doc_id", "lang", F.explode("toks").alias("tok"))
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("bigint")
        % 256
    )
    db = (
        occ.groupBy("doc_id", "lang", bucket.alias("b"))
        .agg(F.count(F.lit(1)).alias("n"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    bk = db.groupBy("b").agg(
        F.sum("n").alias("r_cnt"),
        F.sum(F.when(F.col("lang") == "en", F.col("n")).otherwise(0)).alias(
            "t_cnt"
        ),
    )
    tot = bk.agg(
        F.sum("r_cnt").alias("rt"), F.sum("t_cnt").alias("tt")
    )
    model = bk.join(F.broadcast(tot)).select(
        "b",
        F.log(
            ((F.col("t_cnt") + 1) * (F.col("rt") + 256))
            / ((F.col("tt") + 256) * (F.col("r_cnt") + 1))
        )
        .cast("decimal(20,6)")
        .alias("lr"),
    )
    sc = (
        db.join(F.broadcast(model), "b")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("n").alias("n_toks"),
            F.sum(F.col("n").cast("decimal(10,0)") * F.col("lr")).alias("w"),
        )
    )
    return sc.select(
        "doc_id",
        "lang",
        "n_toks",
        R.r(F.col("w").cast("double"), 4).alias("weight"),
        R.r(F.col("w").cast("double") * 1000 / F.col("n_toks"), 4).alias(
            "weight_per_1k"
        ),
        (F.col("w") > 0).alias("selected"),
    )


# --- content-defined chunking dedup ----------------------------------------
# Boundary rule: position i (2 ≤ i ≤ len−7) starts a new chunk when
# md5 of the 8-char window at i begins with hex nibble '0' (p = 1/16
# → mean chunk ≈ 16 chars on this corpus). Chunks are computed INSIDE
# the array domain (one transform over the starts array, using the
# (element, index) SQL lambda form — index lambdas are written as SQL
# strings, never Python lambdas, per CLAUDE.md gotcha 1) so only chunk
# strings are ever exploded — the document text is not replicated per
# chunk. try_element_at past the end is NULL (= DuckDB's out-of-range
# list index), closing the final chunk at len+1. sequence() is guarded
# against the descending-default trap (gotcha 10).
_CDC_ORACLE = r"""
WITH d AS (SELECT doc_id, text AS t FROM documents),
s AS (
    SELECT doc_id, t,
           list_concat(
               [1],
               list_filter(range(2, len(t) - 6),
                           i -> substr(md5(substr(t, i, 8)), 1, 1) = '0')
           ) AS starts
    FROM d
),
e AS (
    SELECT doc_id, t, starts,
           list_concat(starts[2:], [len(t) + 1]) AS nexts
    FROM s
),
ck AS (
    SELECT doc_id, substr(t, st, en - st) AS chunk
    FROM (SELECT doc_id, t, unnest(starts) AS st, unnest(nexts) AS en
          FROM e)
)
SELECT md5(chunk) AS chunk_hash,
       max(len(chunk))::BIGINT AS chunk_len,
       count(*)::BIGINT AS n_occ,
       count(DISTINCT doc_id)::BIGINT AS n_docs,
       min(substr(chunk, 1, 16)) AS preview
FROM ck
GROUP BY 1
HAVING count(*) >= 2
ORDER BY n_occ DESC, chunk_hash
LIMIT 100
"""


@register("cdc_chunk_dedup", oracle=_CDC_ORACLE)
def cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking dedup: split every document at
    rolling-hash-chosen boundaries, hash the chunks, and report the
    top-100 cross-corpus duplicated chunks (shift-invariant copy-paste
    detection). One narrow per-doc chunking map, one map-side-combined
    groupBy on the chunk hash, TakeOrderedAndProject top-100 — at
    100 TB the shuffle carries (hash, partial agg) rows only."""
    docs = read_table(spark, sf_dir, "documents")
    d = fan_out(docs).select("doc_id", F.col("text").alias("t"))
    s = d.select(
        "doc_id",
        "t",
        F.concat(
            F.array(F.lit(1)),
            F.when(
                F.length("t") >= 9,
                F.expr(
                    "filter(sequence(2, length(t) - 7),"
                    " i -> substr(md5(substr(t, i, 8)), 1, 1) = '0')"
                ),
            ).otherwise(F.array().cast("array<int>")),
        ).alias("starts"),
    )
    ck = s.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(starts, (st, j) -> substr(t, st,"
                " coalesce(try_element_at(starts, j + 2), length(t) + 1)"
                " - st))"
            )
        ).alias("chunk"),
    )
    return (
        ck.groupBy(F.md5("chunk").alias("chunk_hash"))
        .agg(
            F.max(F.length("chunk")).cast("bigint").alias("chunk_len"),
            F.count(F.lit(1)).alias("n_occ"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min(F.substring("chunk", 1, 16)).alias("preview"),
        )
        .filter(F.col("n_occ") >= 2)
        .orderBy(F.desc("n_occ"), F.asc("chunk_hash"))
        .limit(100)
    )


# --- shuffle-key skew audit ------------------------------------------------
# Key = the trigram shingle (the dedup family's join/groupBy key;
# occurrence counts, duplicates kept — this audits the SHUFFLE, so
# multiplicity is the payload). The top key is elected with a pure-
# integer encoded max — cnt·2^32 + md5-uint32(key) — exact in BIGINT
# (top cnt ≪ 2^21), deterministic under duplicate counts (gotcha 9),
# and decomposed arithmetically; no max_by, no double, no join-back.
_SKEW_ORACLE = f"""
WITH {_OCC_DUCK},
c AS (SELECT sh, count(*) AS cnt FROM occ GROUP BY sh),
u AS (SELECT cnt, ('0x' || substr(md5(sh), 1, 8))::BIGINT AS uh FROM c),
summ AS (
    SELECT count(*)::BIGINT AS total_keys, sum(cnt)::BIGINT AS total_rows,
           max(cnt * 4294967296 + uh)::BIGINT AS top_enc
    FROM u
),
hist AS (
    SELECT length(printf('%b', cnt)) - 1 AS log2_bucket,
           count(*)::BIGINT AS n_keys,
           sum(cnt)::BIGINT AS bucket_rows
    FROM u GROUP BY 1
)
SELECT log2_bucket, n_keys, bucket_rows,
       round(bucket_rows::DOUBLE / total_rows, 6) AS rows_share,
       total_keys, total_rows,
       (top_enc // 4294967296)::BIGINT AS max_cnt,
       (top_enc % 4294967296)::BIGINT AS top_key_hash,
       round((top_enc // 4294967296)::DOUBLE / total_rows, 6)
           AS max_key_share,
       round((top_enc // 4294967296)::DOUBLE * total_keys / total_rows, 4)
           AS skew_factor
FROM hist, summ
"""


@register("shuffle_key_skew_audit", oracle=_SKEW_ORACLE)
def shuffle_key_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-shuffle key-skew diagnostic over the trigram-shingle join
    key: per-log2-magnitude histogram of key frequencies (floor(log2)
    from the binary digit count — exact integer arithmetic on both
    engines, no float log) plus
    max-key share and skew factor (max/avg). Exactly one shuffle (the
    map-side-combined key count); the histogram and the single-row
    summary both aggregate the O(distinct-keys) count table, and the
    summary broadcasts back onto the ≤20-row histogram."""
    docs = read_table(spark, sf_dir, "documents")
    c = (
        _shingle_occurrences(docs)
        .groupBy("sh")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    u = c.select(
        "cnt",
        F.conv(F.substring(F.md5(F.col("sh")), 1, 8), 16, 10)
        .cast("bigint")
        .alias("uh"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # persisted: O(distinct keys) and consumed twice (histogram +
    # summary) — without it each consumer re-pays the corpus shingle
    # explode and the key-count shuffle
    summ = u.agg(
        F.count(F.lit(1)).alias("total_keys"),
        F.sum("cnt").alias("total_rows"),
        F.max(F.col("cnt") * F.lit(4294967296) + F.col("uh")).alias(
            "top_enc"
        ),
    )
    hist = u.groupBy(
        (F.length(F.conv(F.col("cnt"), 10, 2)) - 1)
        .cast("bigint")
        .alias("log2_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("bucket_rows"),
    )
    max_cnt = F.expr("top_enc div 4294967296")
    return hist.join(F.broadcast(summ)).select(
        "log2_bucket",
        "n_keys",
        "bucket_rows",
        R.r(F.col("bucket_rows") / F.col("total_rows"), 6).alias(
            "rows_share"
        ),
        "total_keys",
        "total_rows",
        max_cnt.alias("max_cnt"),
        (F.col("top_enc") % 4294967296).alias("top_key_hash"),
        R.r(max_cnt / F.col("total_rows"), 6).alias("max_key_share"),
        R.r(max_cnt * F.col("total_keys") / F.col("total_rows"), 4).alias(
            "skew_factor"
        ),
    )


# --- DoReMi one-step domain reweighting -------------------------------------
# DoReMi (Xie et al. 2023) reweights training domains by EXCESS loss:
# domains where the reference model underperforms the corpus baseline
# get upweighted (multiplicative-weights step w_s ∝ exp(η·excess_s)).
# Here the reference model is the corpus char-bigram LM (the same
# model family as charlm_perplexity_proxy) and one full update step
# is computed exactly: per-source NLL → excess over the corpus
# baseline → softmax weights. Everything after the single corpus scan
# is charset²×|sources|-bounded; the softmax runs over the |sources|
# row table. Per-term log-probs follow the charlm decimal shape
# (DECIMAL(20,6) × DECIMAL(10,0) — CLAUDE.md gotcha 8); exp() terms
# are snapped to DECIMAL(20,10) before the normalizing sum.
_DOREMI_ETA = 1.0

_DOREMI_LP = """
bg AS (
    SELECT source,
           unnest(list_transform(generate_series(1, length(text) - 1),
                                 i -> substring(text, i, 2))) AS b
    FROM documents
),
sbc AS (SELECT source, b, count(*) AS c FROM bg GROUP BY source, b),
model AS (SELECT b, sum(c) AS mc FROM sbc GROUP BY b),
tot AS (SELECT sum(mc)::DOUBLE AS t FROM model),
lp AS (
    SELECT s.source,
           CAST(ln(m.mc / tot.t) AS DECIMAL(20,6))
               * CAST(s.c AS DECIMAL(10,0)) AS term,
           s.c
    FROM sbc s JOIN model m ON m.b = s.b CROSS JOIN tot
),
per AS (
    SELECT source, sum(c)::BIGINT AS n,
           CAST(round(-sum(term)::DOUBLE / sum(c) * 1000000) / 1000000
                AS DECIMAL(20,6)) AS nll
    FROM lp GROUP BY source
),
base AS (
    SELECT CAST(round(-sum(term)::DOUBLE / sum(c) * 1000000) / 1000000
                AS DECIMAL(20,6)) AS bnll
    FROM lp
)
"""

_DOREMI_ORACLE = f"""
WITH {_DOREMI_LP},
exc AS (
    SELECT per.source, per.n, per.nll, base.bnll,
           greatest(CAST(0 AS DECIMAL(20,6)), per.nll - base.bnll) AS e
    FROM per, base
),
ew AS (
    SELECT source, n, nll, bnll, e,
           CAST(round(exp({_DOREMI_ETA} * e::DOUBLE) * 10000000000)
                / 10000000000 AS DECIMAL(20,10)) AS w_raw
    FROM exc
),
z AS (SELECT sum(w_raw) AS z FROM ew)
SELECT ew.source, ew.n AS n_bigrams,
       ew.nll::DOUBLE + 0.0 AS nll,
       ew.e::DOUBLE + 0.0 AS excess_nll,
       round(ew.w_raw::DOUBLE / z.z::DOUBLE * 1000000) / 1000000 + 0.0
           AS weight
FROM ew, z
"""


@register("doremi_domain_reweight", oracle=_DOREMI_ORACLE)
def doremi_domain_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select("source", "text")
    # split('')-based bigrams (r12): O(len) zip_with vs the O(len²)
    # per-index substring transform; <=1-char docs yield empty arrays
    # (the old gotcha-10 guard's semantics, now structural)
    bg = docs.withColumn("cs", T.char_array(F.col("text"))).select(
        "source",
        F.explode(T.char_bigrams_from("cs")).alias("b"),
    )
    # ONE corpus scan: the (source, bigram) count table is
    # charset² x |sources|-bounded and feeds both the model rollup
    # and the per-source scoring
    sbc = bg.groupBy("source", "b").agg(F.count(F.lit(1)).alias("c"))
    sbc = sbc.persist(StorageLevel.MEMORY_AND_DISK)
    model = sbc.groupBy("b").agg(F.sum("c").alias("mc"))
    tot = model.agg(F.sum("mc").cast("double").alias("t"))
    lp = (
        sbc.join(F.broadcast(model), "b")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            (
                F.log(F.col("mc") / F.col("t")).cast("decimal(20,6)")
                * F.col("c").cast("decimal(10,0)")
            ).alias("term"),
            "c",
        )
    )
    lp = lp.persist(StorageLevel.MEMORY_AND_DISK)
    dec6 = "decimal(20,6)"
    per = lp.groupBy("source").agg(
        F.sum("c").alias("n"),
        R.r(-F.sum("term").cast("double") / F.sum("c"), 6)
        .cast(dec6)
        .alias("nll"),
    )
    base = lp.agg(
        R.r(-F.sum("term").cast("double") / F.sum("c"), 6)
        .cast(dec6)
        .alias("bnll")
    )
    exc = per.crossJoin(F.broadcast(base)).withColumn(
        "e",
        F.greatest(F.lit(0).cast(dec6), F.col("nll") - F.col("bnll")),
    )
    ew = exc.withColumn(
        "w_raw",
        R.r(F.exp(F.lit(_DOREMI_ETA) * F.col("e").cast("double")), 10).cast(
            "decimal(20,10)"
        ),
    )
    z = ew.agg(F.sum("w_raw").alias("z"))
    return ew.crossJoin(F.broadcast(z)).select(
        "source",
        F.col("n").alias("n_bigrams"),
        (F.col("nll").cast("double") + 0.0).alias("nll"),
        (F.col("e").cast("double") + 0.0).alias("excess_nll"),
        R.r(F.col("w_raw").cast("double") / F.col("z").cast("double"), 6)
        .alias("weight"),
    )


# --- leave-one-source-out data valuation ------------------------------------
# The cheapest member of the datamodels/influence family: how does
# the corpus-average loss move if source s is removed? With the loss
# additive over (source) partial sums, every LOSO metric derives from
# |sources| decimal partials — no retraining, no second scan.
# delta < 0 means removing s LOWERS corpus NLL (s is a high-loss
# source — the candidate for downsampling or cleaning).
_LOSO_ORACLE = f"""
WITH {_DOREMI_LP},
sums AS (
    SELECT source, sum(term) AS t_s, sum(c)::BIGINT AS c_s FROM lp
    GROUP BY source
),
tots AS (SELECT sum(t_s) AS t_all, sum(c_s)::BIGINT AS c_all FROM sums)
SELECT s.source, s.c_s AS n_bigrams,
       round(-s.t_s::DOUBLE / s.c_s * 1000000) / 1000000 + 0.0 AS own_nll,
       round(-(t.t_all - s.t_s)::DOUBLE / (t.c_all - s.c_s) * 1000000)
           / 1000000 + 0.0 AS loso_nll,
       round((-(t.t_all - s.t_s)::DOUBLE / (t.c_all - s.c_s)
              - (-t.t_all::DOUBLE / t.c_all)) * 1000000) / 1000000 + 0.0
           AS delta_nll
FROM sums s, tots t
"""


@register("loso_source_value", oracle=_LOSO_ORACLE)
def loso_source_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select("source", "text")
    # split('')-based bigrams (r12): O(len) zip_with vs the O(len²)
    # per-index substring transform; <=1-char docs yield empty arrays
    # (the old gotcha-10 guard's semantics, now structural)
    bg = docs.withColumn("cs", T.char_array(F.col("text"))).select(
        "source",
        F.explode(T.char_bigrams_from("cs")).alias("b"),
    )
    sbc = bg.groupBy("source", "b").agg(F.count(F.lit(1)).alias("c"))
    sbc = sbc.persist(StorageLevel.MEMORY_AND_DISK)
    model = sbc.groupBy("b").agg(F.sum("c").alias("mc"))
    tot = model.agg(F.sum("mc").cast("double").alias("t"))
    lp = (
        sbc.join(F.broadcast(model), "b")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            (
                F.log(F.col("mc") / F.col("t")).cast("decimal(20,6)")
                * F.col("c").cast("decimal(10,0)")
            ).alias("term"),
            "c",
        )
    )
    sums = lp.groupBy("source").agg(
        F.sum("term").alias("t_s"), F.sum("c").alias("c_s")
    )
    tots = sums.agg(
        F.sum("t_s").alias("t_all"), F.sum("c_s").alias("c_all")
    )
    j = sums.crossJoin(F.broadcast(tots))
    full_nll = -F.col("t_all").cast("double") / F.col("c_all")
    loso_nll = (
        -(F.col("t_all") - F.col("t_s")).cast("double")
        / (F.col("c_all") - F.col("c_s"))
    )
    return j.select(
        "source",
        F.col("c_s").alias("n_bigrams"),
        R.r(-F.col("t_s").cast("double") / F.col("c_s"), 6).alias("own_nll"),
        R.r(loso_nll, 6).alias("loso_nll"),
        R.r(loso_nll - full_nll, 6).alias("delta_nll"),
    )


# --- k-center greedy coreset selection ----------------------------------------
# Coreset selection for data-efficient training (Sener & Savarese
# 2018): greedily pick the point FARTHEST from everything selected so
# far — a 2-approximation of the k-center cover, the geometric
# counterpart of the quality-score selectors. Seed = vec_id 0, then 4
# greedy steps; each step is ONE distributed pass computing every
# point's distance to the newest center, folded into its running
# min-distance (monoid, so k passes, never k*n² pairs), then a
# TakeOrdered(1) argmax. Driver state = the k chosen vectors (the
# kmeans pattern). Squared-L2 terms are integer-quantized
# (round((d)²*1e8) summed as longs) so Spark, the driver floats, and
# the oracle's unrolled-CTE replay see bit-identical doubles
# (CLAUDE.md gotcha 13a); argmax ties break on vec_id.
_KCENTER_K = 5
_KC_DIM = 64


def _kc_dist_sql(center_cte: str) -> str:
    # the center's 64 dims come from an EXPLICIT join against the
    # 1-row center CTE — a scalar-subquery filter on the join side
    # kept DuckDB from pushing it into the build side (dims x dims on
    # i exploded to |n|² per dim; 180 s at sf0.1 vs 0.4 s this way)
    return f"""
    SELECT p.vec_id,
           sum(CAST(round(((p.x - c.x) * (p.x - c.x)) * 100000000)
                    AS BIGINT))::DOUBLE / 100000000 AS d2
    FROM dims p JOIN (
        SELECT d.i, d.x FROM dims d JOIN {center_cte} cc ON d.vec_id = cc.vid
    ) c ON c.i = p.i
    GROUP BY p.vec_id
"""


_KCENTER_ORACLE = f"""
WITH dims AS MATERIALIZED (
    SELECT vec_id, g.i, embedding[g.i]::DOUBLE AS x
    FROM embeddings, generate_series(1, {_KC_DIM}) AS g(i)
),
c1 AS (SELECT 0::BIGINT AS vid),
m1 AS MATERIALIZED ({_kc_dist_sql('c1')}),
c2 AS (SELECT vec_id AS vid FROM m1 WHERE vec_id <> 0
       ORDER BY d2 DESC, vec_id LIMIT 1),
d2_t AS MATERIALIZED ({_kc_dist_sql('c2')}),
m2 AS MATERIALIZED (
    SELECT m1.vec_id, least(m1.d2, d2_t.d2) AS d2
    FROM m1 JOIN d2_t USING (vec_id)
),
c3 AS (SELECT m2.vec_id AS vid FROM m2, c1, c2
       WHERE m2.vec_id NOT IN (c1.vid, c2.vid)
       ORDER BY m2.d2 DESC, m2.vec_id LIMIT 1),
d3_t AS MATERIALIZED ({_kc_dist_sql('c3')}),
m3 AS MATERIALIZED (
    SELECT m2.vec_id, least(m2.d2, d3_t.d2) AS d2
    FROM m2 JOIN d3_t USING (vec_id)
),
c4 AS (SELECT m3.vec_id AS vid FROM m3, c1, c2, c3
       WHERE m3.vec_id NOT IN (c1.vid, c2.vid, c3.vid)
       ORDER BY m3.d2 DESC, m3.vec_id LIMIT 1),
d4_t AS MATERIALIZED ({_kc_dist_sql('c4')}),
m4 AS MATERIALIZED (
    SELECT m3.vec_id, least(m3.d2, d4_t.d2) AS d2
    FROM m3 JOIN d4_t USING (vec_id)
),
c5 AS (SELECT m4.vec_id AS vid FROM m4, c1, c2, c3, c4
       WHERE m4.vec_id NOT IN (c1.vid, c2.vid, c3.vid, c4.vid)
       ORDER BY m4.d2 DESC, m4.vec_id LIMIT 1)
SELECT 1::BIGINT AS step, c1.vid AS vec_id,
       CAST(NULL AS DOUBLE) AS min_dist2 FROM c1
UNION ALL
SELECT 2, c2.vid,
       round((SELECT d2 FROM m1 WHERE vec_id = c2.vid) * 1000000)
           / 1000000 + 0.0 FROM c2
UNION ALL
SELECT 3, c3.vid,
       round((SELECT d2 FROM m2 WHERE vec_id = c3.vid) * 1000000)
           / 1000000 + 0.0 FROM c3
UNION ALL
SELECT 4, c4.vid,
       round((SELECT d2 FROM m3 WHERE vec_id = c4.vid) * 1000000)
           / 1000000 + 0.0 FROM c4
UNION ALL
SELECT 5, c5.vid,
       round((SELECT d2 FROM m4 WHERE vec_id = c5.vid) * 1000000)
           / 1000000 + 0.0 FROM c5
"""


@register("kcenter_greedy_coreset", oracle=_KCENTER_ORACLE)
def kcenter_greedy_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    from swat_mapreduce_spark.functions import arrays as A
    from swat_mapreduce_spark.queries.curation import _rp

    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", A.as_double_array(F.col("embedding")).alias("v")
    )
    emb = emb.persist(StorageLevel.MEMORY_AND_DISK)

    def units(term):
        return F.round(term * F.lit(1e8)).cast("long")

    def d2_to(center_vec):
        c_arr = F.array(*[F.lit(float(x)) for x in center_vec])
        return (
            F.aggregate(
                F.zip_with(
                    F.col("v"), c_arr, lambda x, c: units((x - c) * (x - c))
                ),
                F.lit(0).cast("long"),
                lambda acc, t: acc + t,
            ).cast("double")
            / F.lit(1e8)
        )

    seed = emb.filter(F.col("vec_id") == 0).collect()[0]
    chosen = [(0, [float(x) for x in seed["v"]])]
    rows = [(1, 0, None)]
    cur = emb.select("vec_id", "v", d2_to(chosen[0][1]).alias("d2"))
    cur = cur.persist(StorageLevel.MEMORY_AND_DISK)
    for step in range(2, _KCENTER_K + 1):
        taken = {cid for cid, _ in chosen}
        top = (
            cur.filter(~F.col("vec_id").isin(*taken))
            .orderBy(F.desc("d2"), F.asc("vec_id"))
            .limit(1)
            .collect()[0]
        )
        vid, vec, dist = int(top["vec_id"]), [float(x) for x in top["v"]], (
            float(top["d2"])
        )
        rows.append((step, vid, _rp(dist, 6) + 0.0))
        chosen.append((vid, vec))
        if step < _KCENTER_K:
            nxt = cur.select(
                "vec_id", "v", F.least(F.col("d2"), d2_to(vec)).alias("d2")
            ).persist(StorageLevel.MEMORY_AND_DISK)
            cur = nxt
    emb.unpersist()
    return spark.createDataFrame(
        rows, "step long, vec_id long, min_dist2 double"
    )


# --- facility-location greedy data selection -----------------------------------
# Submodular facility-location maximization (the CRAIG/coverage family
# of coreset selectors — Mirzasoleiman et al. 2020): greedily pick k
# exemplars S maximizing F(S) = sum_v max(0, max_{s in S} cos(v, s)) —
# the COVERAGE objective, where k-center (kcenter_greedy_coreset) is
# the worst-case-radius one. Candidates are a FIXED-COUNT hash-ordered
# sample (the _query_sample pattern: the 64 lowest md5-unit vec_ids
# under salt 'fl' — the r4 rule; the original vec_id % 25 pool was a
# corpus FRACTION collected to the driver, VERDICT r8 #1); the
# similarity table is built ONCE as a WIDE per-vid array of 64
# candidate cosines (O(n·64) cells at any corpus size — never
# corpus²), and each greedy step is ONE aggregation over it: with the
# chosen set known on the driver, per-row coverage
# greatest(0, arr[chosen...]) is computable from the row itself, so
# no join, no checkpoint chain — K passes total. Driver state = 64
# collected candidate vectors + the chosen ids (the kmeans / kcenter
# iterative pattern). Every cosine is an INTEGER unit — round(cos·1e8)
# from per-dim integer-quantized dot terms — so the max/sum lattice is
# pure int64 on Spark, DuckDB, and the driver (CLAUDE.md gotcha 13a);
# argmax ties break on vec_id. The oracle unrolls the same 4 steps as
# CTEs over the same (corpus × 64-candidate) sims table.
_FL_K = 4
_FL_CANDS = 64  # fixed candidate-pool size at every corpus scale
_FL_DIM = 64
_FL_HASH_DUCK = _H.duck_hash_uint(_H.sql_salted("vec_id", "'fl'"), 8)

_FL_SIMS_SQL = f"""
cs AS MATERIALIZED (
    SELECT vec_id FROM embeddings
    ORDER BY {_FL_HASH_DUCK}, vec_id LIMIT {_FL_CANDS}
),
dims AS MATERIALIZED (
    SELECT vec_id, g.i, embedding[g.i]::DOUBLE AS x
    FROM embeddings, generate_series(1, {_FL_DIM}) AS g(i)
),
cdims AS MATERIALIZED (
    -- candidate dims PRE-FILTERED before the i-join: without this,
    -- DuckDB's join order ran dims x dims on i first (~256M rows at
    -- sf0.1, 36 s) instead of 64-candidate x corpus (3.8 s)
    SELECT d.vec_id, d.i, d.x FROM dims d JOIN cs ON d.vec_id = cs.vec_id
),
norms AS MATERIALIZED (
    SELECT vec_id, sum(CAST(round(x * x * 100000000) AS BIGINT)) AS q
    FROM dims GROUP BY 1
),
sims AS MATERIALIZED (
    SELECT g.vec_id AS vid, c.vec_id AS cid,
           CAST(round(
               (sum(CAST(round(g.x * c.x * 100000000) AS BIGINT))::DOUBLE
                / 100000000)
               / (sqrt(ng.q::DOUBLE / 100000000)
                  * sqrt(nc.q::DOUBLE / 100000000)) * 100000000)
           AS BIGINT) AS cos_u
    FROM dims g
    JOIN cdims c ON c.i = g.i
    JOIN norms ng ON ng.vec_id = g.vec_id
    JOIN norms nc ON nc.vec_id = c.vec_id
    GROUP BY g.vec_id, c.vec_id, ng.q, nc.q
)"""

_FL_ORACLE = f"""
WITH {_FL_SIMS_SQL},
t1 AS (SELECT cid, sum(greatest(0, cos_u))::BIGINT AS u
       FROM sims GROUP BY cid),
c1 AS (SELECT cid, u FROM t1 ORDER BY u DESC, cid LIMIT 1),
m1 AS MATERIALIZED (
    SELECT s.vid, greatest(0, s.cos_u) AS cur_u
    FROM sims s JOIN c1 ON s.cid = c1.cid
),
t2 AS (SELECT s.cid, sum(greatest(m.cur_u, s.cos_u))::BIGINT AS u
       FROM sims s JOIN m1 m ON m.vid = s.vid, c1
       WHERE s.cid <> c1.cid GROUP BY s.cid),
c2 AS (SELECT cid, u FROM t2 ORDER BY u DESC, cid LIMIT 1),
m2 AS MATERIALIZED (
    SELECT m.vid, greatest(m.cur_u, s.cos_u) AS cur_u
    FROM m1 m JOIN sims s ON s.vid = m.vid JOIN c2 ON s.cid = c2.cid
),
t3 AS (SELECT s.cid, sum(greatest(m.cur_u, s.cos_u))::BIGINT AS u
       FROM sims s JOIN m2 m ON m.vid = s.vid, c1, c2
       WHERE s.cid NOT IN (c1.cid, c2.cid) GROUP BY s.cid),
c3 AS (SELECT cid, u FROM t3 ORDER BY u DESC, cid LIMIT 1),
m3 AS MATERIALIZED (
    SELECT m.vid, greatest(m.cur_u, s.cos_u) AS cur_u
    FROM m2 m JOIN sims s ON s.vid = m.vid JOIN c3 ON s.cid = c3.cid
),
t4 AS (SELECT s.cid, sum(greatest(m.cur_u, s.cos_u))::BIGINT AS u
       FROM sims s JOIN m3 m ON m.vid = s.vid, c1, c2, c3
       WHERE s.cid NOT IN (c1.cid, c2.cid, c3.cid) GROUP BY s.cid),
c4 AS (SELECT cid, u FROM t4 ORDER BY u DESC, cid LIMIT 1)
SELECT 1::BIGINT AS step, c1.cid AS vec_id,
       round(c1.u * 1.0 / 100000000 * 1000000) / 1000000 + 0.0
           AS objective FROM c1
UNION ALL
SELECT 2, c2.cid,
       round(c2.u * 1.0 / 100000000 * 1000000) / 1000000 + 0.0 FROM c2
UNION ALL
SELECT 3, c3.cid,
       round(c3.u * 1.0 / 100000000 * 1000000) / 1000000 + 0.0 FROM c3
UNION ALL
SELECT 4, c4.cid,
       round(c4.u * 1.0 / 100000000 * 1000000) / 1000000 + 0.0 FROM c4
"""


@register("facility_location_greedy", oracle=_FL_ORACLE)
def facility_location_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from swat_mapreduce_spark.functions import arrays as A
    from swat_mapreduce_spark.queries.curation import _rp

    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", A.as_double_array(F.col("embedding")).alias("v")
    )

    def units(term):
        return F.round(term * F.lit(1e8)).cast("long")

    qnorm = F.aggregate(
        F.transform(F.col("v"), lambda x: units(x * x)),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )
    ground = emb.select(
        F.col("vec_id").alias("vid"), "v", qnorm.alias("q")
    )
    # fixed-count candidate pool: the 64 lowest hash-ordered vec_ids —
    # a TakeOrderedAndProject subtree, so the collect() is a BOUNDED
    # 64-row driver transfer at any corpus size (VERDICT r8 #1 fix)
    cands = (
        emb.select(
            F.col("vec_id").alias("cid"),
            F.col("v").alias("cv"),
            qnorm.alias("cq"),
        )
        .orderBy(_H.hash_uint(F.col("cid"), "fl", 8), F.asc("cid"))
        .limit(_FL_CANDS)
    )
    # The similarity table is (corpus x 64 candidates), produced as a
    # WIDE per-vid array in candidate-cid order. Higher-order-lambda
    # expressions (zip_with + aggregate) are NOT whole-stage-codegen'd
    # at this volume, so this is the deliberate-Arrow-surface case: a
    # chunked numpy kernel computes THE SAME integer-unit lattice —
    # round_half_away((x*y)*1e8) per dim, exact int64 sums, one
    # half-away rounding of the cosine — bit-identical to the oracle
    # (IEEE multiply/divide/sqrt are deterministic; half-away rounding
    # is floor(|t|+0.5)*sign, the F.round/DuckDB round procedure).
    cand_rows = sorted(
        (int(r["cid"]), [float(x) for x in r["cv"]], int(r["cq"]))
        for r in cands.collect()
    )
    cids = [c for c, _, _ in cand_rows]
    m = len(cids)

    def _sims_kernel(it):
        import numpy as np
        import pandas as pd

        cmat = np.array([v for _, v, _ in cand_rows], dtype=np.float64)
        cqs = np.array([q for _, _, q in cand_rows], dtype=np.float64)

        def half_away(t):
            return np.floor(np.abs(t) + 0.5) * np.sign(t)

        for pdf in it:
            n = len(pdf)
            for s in range(0, n, 512):
                chunk = pdf.iloc[s : s + 512]
                x = np.stack(chunk["v"].to_numpy())  # (c, d)
                qa = chunk["q"].to_numpy().astype(np.float64)
                terms = (x[:, None, :] * cmat[None, :, :]) * 1e8
                qd = half_away(terms).astype(np.int64).sum(axis=-1)
                cos = (qd / 1e8) / (
                    np.sqrt(qa / 1e8)[:, None] * np.sqrt(cqs / 1e8)[None, :]
                )
                cos_u = half_away(cos * 1e8).astype(np.int64)
                yield pd.DataFrame(
                    {
                        "vid": chunk["vid"].to_numpy().astype(np.int64),
                        "cos_us": list(cos_u),
                    }
                )

    sims = ground.mapInPandas(
        _sims_kernel, "vid long, cos_us array<long>"
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # Greedy: the chosen set lives on the driver, so each row's
    # current coverage greatest(0, cos_us[chosen...]) is a constant-
    # size expression over the row itself — each step is ONE
    # posexplode + 64-group aggregation producing all m candidate
    # gains at once (no join, no checkpoint chain; K jobs total, the
    # first also materializing the persist). posexplode, not a wide
    # 64-column agg: the wide form's generated code ran ~1.1 s/step
    # where this shape warms to ~0.35 s.
    chosen: list[tuple[int, int]] = []  # (cid, objective units)
    pos_of = {c: j for j, c in enumerate(cids)}
    for _step in range(_FL_K):
        taken = {c for c, _ in chosen}
        cur = F.greatest(
            F.lit(0).cast("long"),
            *[F.element_at("cos_us", pos_of[c] + 1) for c in taken],
        ) if taken else F.lit(0).cast("long")
        sums = {
            int(r["j"]): int(r["u"])
            for r in sims.select(
                cur.alias("cur"), F.posexplode("cos_us").alias("j", "c")
            )
            .groupBy("j")
            .agg(F.sum(F.greatest(F.col("cur"), F.col("c"))).alias("u"))
            .collect()
        }
        best_cid, best_u = None, None
        for j, cid in enumerate(cids):  # cid-ascending: first strict max
            if cid in taken:
                continue
            u = sums[j]
            if best_u is None or u > best_u:
                best_cid, best_u = cid, u
        chosen.append((best_cid, best_u))
    rows = [
        (step + 1, cid, _rp(u / 1e8, 6) + 0.0)
        for step, (cid, u) in enumerate(chosen)
    ]
    sims.unpersist()
    return spark.createDataFrame(
        rows, "step long, vec_id long, objective double"
    )


# --- exact Shapley attribution of corpus shingle coverage -----------------------
# Data valuation with the game-theoretic gold standard: sources are
# pooled into 5 groups (srcN % 5) and each group's Shapley value for
# the DISTINCT-3-gram-SHINGLE-COVERAGE characteristic function is
# computed EXACTLY — coverage is submodular, so v(S) for all 32
# subsets derives from one bounded table: per shingle, the 5-bit mask
# of groups containing it, counted per mask (31 ints). phi_g then has
# an INTEGER numerator sum_{S not∋ g} |S|!(4-|S|)!·[v(S∪g)-v(S)] over
# 16 subsets, divided by 5! = 120 — no sampling, no permutation RNG,
# bit-identical on both engines. LOSO (loso_source_value) is the
# marginal-only cousin; Shapley splits shared coverage fairly.
# Scale: ONE corpus shingle pass → mask table (<=31 rows); everything
# after is constant-size arithmetic.
_SHAP_GROUPS = 5
_SHAP_W = {0: 24, 1: 6, 2: 4, 3: 6, 4: 24}  # k!(G-1-k)! for G=5


def _shapley_oracle() -> str:
    from swat_mapreduce_spark.queries.dedup import _SH_DUCK

    w_case = " ".join(
        f"WHEN {k} THEN {v}" for k, v in _SHAP_W.items()
    )
    return f"""
WITH {_SH_DUCK},
grp AS (
    SELECT doc_id, (substr(source, 4)::INT % {_SHAP_GROUPS}) AS g
    FROM documents
),
shg AS (
    SELECT DISTINCT s.shingle, g.g
    FROM sh s JOIN grp g USING (doc_id)
),
masks AS (
    SELECT shingle, bit_or(1 << g)::BIGINT AS mask FROM shg GROUP BY 1
),
mcnt AS (SELECT mask, count(*)::BIGINT AS cnt FROM masks GROUP BY 1),
subsets AS (SELECT unnest(generate_series(0, 31)) AS s),
vs AS (
    SELECT su.s,
           sum(CASE WHEN (m.mask & su.s) <> 0 THEN m.cnt ELSE 0 END)
               ::BIGINT AS v
    FROM subsets su, mcnt m GROUP BY su.s
),
gs AS (SELECT unnest(generate_series(0, {_SHAP_GROUPS - 1})) AS g),
num AS (
    SELECT gs.g,
           sum((CASE bit_count(va.s) {w_case} END)
               * (vb.v - va.v))::BIGINT AS num
    FROM gs
    JOIN vs va ON (va.s & (1 << gs.g)) = 0
    JOIN vs vb ON vb.s = (va.s | (1 << gs.g))
    GROUP BY gs.g
),
docs_g AS (
    SELECT g, count(*)::BIGINT AS n_docs FROM grp GROUP BY 1
),
own AS (
    SELECT gs.g, vs.v AS own_coverage
    FROM gs JOIN vs ON vs.s = (1 << gs.g)
)
SELECT n.g AS grp, coalesce(d.n_docs, 0)::BIGINT AS n_docs,
       o.own_coverage,
       round(n.num * 1.0 / 120 * 10000) / 10000 + 0.0 AS shapley_value
FROM num n LEFT JOIN docs_g d ON d.g = n.g JOIN own o ON o.g = n.g
"""


def _coverage_masks_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lazy (mask, cnt) subtree of _coverage_masks — the real corpus
    computation behind shapley/banzhaf, registered as their plan_fn so
    plan dumps show the shingle pass, not the LocalTableScan of
    collected rows."""
    from swat_mapreduce_spark.functions.arrays import explode_nonnull
    from swat_mapreduce_spark.operators import dedup as D

    docs = read_table(spark, sf_dir, "documents")
    docs_with_g = docs.withColumn(
        "g", F.substring("source", 4, 10).cast("int") % _SHAP_GROUPS
    )
    sh = explode_nonnull(
        D.doc_shingle_arrays(docs_with_g, 3, extra_cols=("g",)),
        "sh_arr",
        "shingle",
        "g",
    )
    masks = sh.groupBy("shingle").agg(
        F.bit_or(F.expr("shiftleft(1L, g)")).alias("mask")
    )
    return masks.groupBy("mask").agg(F.count(F.lit(1)).alias("cnt"))


def _coverage_masks(
    spark: SparkSession, sf_dir: str
) -> tuple[dict[int, int], dict[int, int]]:
    """ONE corpus shingle pass → (mask→count, g→n_docs) bounded driver
    dicts — the shared build behind shapley_coverage_attribution AND
    banzhaf_coverage_attribution (VERDICT r12 #1: both queries inlined
    byte-identical copies of this pipeline; one helper, one code path,
    each query still computes it from parquet at call time).

    g is a pure function of the doc row, so it rides ALONG the shingle
    explode as a projected column — no O(corpus) doc_id→g map is ever
    joined (let alone broadcast) back onto the big side (VERDICT r11
    #1). No distinct before the groupBy — bit_or is idempotent,
    duplicate (shingle, g) rows OR to the same mask. The explode goes
    through explode_nonnull (gotcha 13, r13): the plain explode's
    inferred size(sh_arr)>0 filter was pushed into the scan with the
    whole tokenize+shingle+distinct pipeline substituted, evaluated
    serially in the pre-fan_out scan task — masks subtree measured
    3.69 s → 0.81 s at sf0.1 with identical mask counts."""
    mcnt = {
        int(r["mask"]): int(r["cnt"])
        for r in _coverage_masks_plan(spark, sf_dir).collect()
    }  # bounded driver state: <= 31 (mask, count) ints
    docs = read_table(spark, sf_dir, "documents")
    # select-then-group (gotcha 15 corollary): inline grouping exprs
    # become opaque _groupingexpression columns the boundedness
    # auditor can't classify
    docs_g = {
        int(r["g"]): int(r["n"])
        for r in docs.select(
            (
                F.substring("source", 4, 10).cast("int") % _SHAP_GROUPS
            ).alias("g")
        )
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    return mcnt, docs_g


@register(
    "shapley_coverage_attribution",
    oracle=_shapley_oracle(),
    plan_fn=lambda spark, sf_dir: _coverage_masks_plan(spark, sf_dir),
)
def shapley_coverage_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from swat_mapreduce_spark.queries.curation import _rp

    mcnt, docs_g = _coverage_masks(spark, sf_dir)

    def v(s: int) -> int:
        return sum(c for m, c in mcnt.items() if m & s)

    rows = []
    for g in range(_SHAP_GROUPS):
        bit = 1 << g
        num = sum(
            _SHAP_W[bin(s).count("1")] * (v(s | bit) - v(s))
            for s in range(32)
            if not s & bit
        )
        rows.append(
            (g, docs_g.get(g, 0), v(bit), _rp(num / 120, 4) + 0.0)
        )
    return spark.createDataFrame(
        rows,
        "grp long, n_docs long, own_coverage long, shapley_value double",
    )


# --- RHO-loss data selection ------------------------------------------------------
# Reducible-holdout-loss selection (Mindermann et al. 2022): score
# each doc by rho = NLL under the TRAINING model (char-bigram LM on
# the full corpus) minus NLL under the REFERENCE model (same family
# trained on the clean 'en' subset — the holdout proxy); high rho =
# learnable-but-not-yet-learnt, the points worth training on next.
# Both models share Laplace smoothing over the FULL corpus bigram
# vocabulary so the reference assigns finite probability everywhere.
# Determinism (the charlm decimal shape, gotcha 13a/8): each
# per-bigram ln is snapped to DECIMAL(20,6) and multiplied by the
# DECIMAL(10,0) count — per-doc sums are EXACT decimals, so the rho
# ranking key (sum_ref − sum_train)/n is one IEEE division of exact
# inputs, identical across engines; top-20 cut tie-breaks on doc_id.
# Scale: ONE bigram explode → per-doc count table persisted and
# reused by both model builds and the scoring join; both models are
# charset²-bounded broadcasts.
_RHO_TOPN = 20

_RHO_ORACLE = """
WITH bg AS (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, length(text) - 1),
                                 i -> substring(text, i, 2))) AS b
    FROM documents
),
bgc AS (
    SELECT doc_id, b, count(*) AS cd FROM bg GROUP BY doc_id, b
),
mf AS (SELECT b, sum(cd)::BIGINT AS c FROM bgc GROUP BY b),
mr AS (
    SELECT bgc.b, sum(bgc.cd)::BIGINT AS c
    FROM bgc JOIN documents d ON d.doc_id = bgc.doc_id
    WHERE d.lang = 'en'
    GROUP BY bgc.b
),
st AS (
    SELECT (SELECT sum(c) FROM mf)::BIGINT AS tf,
           (SELECT coalesce(sum(c), 0) FROM mr)::BIGINT AS tr,
           (SELECT count(*) FROM mf)::BIGINT AS v
),
scored AS (
    SELECT bgc.doc_id,
           sum(bgc.cd)::BIGINT AS n,
           sum(CAST(ln((mf.c + 1)::DOUBLE / (st.tf + st.v))
                    AS DECIMAL(20,6))
               * CAST(bgc.cd AS DECIMAL(10,0))) AS sum_f,
           sum(CAST(ln((coalesce(mr.c, 0) + 1)::DOUBLE / (st.tr + st.v))
                    AS DECIMAL(20,6))
               * CAST(bgc.cd AS DECIMAL(10,0))) AS sum_r
    FROM bgc
    JOIN mf ON mf.b = bgc.b
    LEFT JOIN mr ON mr.b = bgc.b
    CROSS JOIN st
    GROUP BY bgc.doc_id
)
SELECT s.doc_id, d.lang, s.n AS n_bigrams,
       round((-s.sum_f::DOUBLE / s.n) * 10000) / 10000 + 0.0
           AS nll_train,
       round((-s.sum_r::DOUBLE / s.n) * 10000) / 10000 + 0.0 AS nll_ref,
       round(((s.sum_r - s.sum_f)::DOUBLE / s.n) * 10000) / 10000 + 0.0
           AS rho
FROM scored s JOIN documents d ON d.doc_id = s.doc_id
ORDER BY (s.sum_r - s.sum_f)::DOUBLE / s.n DESC, s.doc_id
LIMIT 20
"""


def _rho_plan(spark: SparkSession, sf_dir: str):
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    # lang is a doc attribute, so it rides along the bigram explode as a
    # projected column — the O(corpus) English-doc_id broadcast semi-join
    # and the final doc_id→lang broadcast join are both gone (VERDICT
    # r11 #1); lang is constant per doc_id so grouping on (doc_id, lang)
    # produces the identical per-doc groups.
    # bigrams from the split('')-based codepoint array (r12): one flat
    # zip_with against the 1-shifted slice — the per-index substring
    # transform re-scanned the string per position (O(len²); measured
    # 1.7x at sf0.1). <=1-char docs yield empty arrays (the old
    # gotcha-10 guard's semantics, now structural).
    bg = (
        docs.withColumn("cs", T.char_array(F.col("text")))
        .select(
            "doc_id",
            "lang",
            F.explode(T.char_bigrams_from("cs")).alias("b"),
        )
    )
    bgc = (
        bg.groupBy("doc_id", "lang", "b")
        .agg(F.count(F.lit(1)).alias("cd"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # ONE pass over the cached count table builds BOTH models — c (full
    # corpus) and cr (the 'en' reference) as two conditional sums — so
    # the scored join probes a single broadcast table instead of an
    # mf inner + mr left pair (r12, guide §2.4/§3.1; measured 6.7-9.2 s
    # → 4.9-6.9 s at sf0.1, results bit-identical: coalesce(sum(when))
    # reproduces mr's missing-row-as-0 exactly, and the per-term
    # decimal arithmetic is untouched).
    model = bgc.groupBy("b").agg(
        F.sum("cd").cast("long").alias("c"),
        F.coalesce(
            F.sum(F.when(F.col("lang") == "en", F.col("cd"))), F.lit(0)
        )
        .cast("long")
        .alias("cr"),
    )
    st = model.agg(
        F.sum("c").cast("long").alias("tf"),
        F.count(F.lit(1)).cast("long").alias("v"),
        F.sum("cr").cast("long").alias("tr"),
    )
    dec = "decimal(20,6)"
    scored = (
        bgc.join(F.broadcast(model), "b")
        .crossJoin(F.broadcast(st))
        .select(
            "doc_id",
            "lang",
            "cd",
            (
                F.log(
                    (F.col("c") + 1).cast("double")
                    / (F.col("tf") + F.col("v"))
                ).cast(dec)
                * F.col("cd").cast("decimal(10,0)")
            ).alias("lpf"),
            (
                F.log(
                    (F.col("cr") + 1).cast("double")
                    / (F.col("tr") + F.col("v"))
                ).cast(dec)
                * F.col("cd").cast("decimal(10,0)")
            ).alias("lpr"),
        )
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("cd").cast("long").alias("n"),
            F.sum("lpf").alias("sum_f"),
            F.sum("lpr").alias("sum_r"),
        )
    )
    key = (F.col("sum_r") - F.col("sum_f")).cast("double") / F.col("n")
    out = (
        scored.orderBy(key.desc(), F.asc("doc_id"))
        .limit(_RHO_TOPN)
        .select(
            "doc_id",
            "lang",
            F.col("n").alias("n_bigrams"),
            R.r((-F.col("sum_f").cast("double")) / F.col("n"), 4).alias(
                "nll_train"
            ),
            R.r((-F.col("sum_r").cast("double")) / F.col("n"), 4).alias(
                "nll_ref"
            ),
            R.r(key, 4).alias("rho"),
        )
    )
    return out, [bgc]


@register(
    "rho_loss_selection",
    oracle=_RHO_ORACLE,
    plan_fn=lambda spark, sf_dir: _rho_plan(spark, sf_dir)[0],
)
def rho_loss_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    out, persisted = _rho_plan(spark, sf_dir)
    rows = out.collect()
    for p in persisted:
        p.unpersist()
    return spark.createDataFrame(rows, out.schema)


# --- Pareto-frontier document selection --------------------------------------------
# Multi-objective curation: the Pareto frontier of (length, lexical
# diversity) — documents no other document strictly dominates on BOTH
# axes — is the principled "keep the extremes" shortlist when two
# quality signals trade off. Dominance is decided on EXACT integers
# (n_chars, and per-doc TTR snapped to a 1e-6 unit from exact
# distinct/total token counts); the frontier test runs against the
# CUMULATIVE MAX of diversity over the bounded distinct-length grid
# (strictly-longer ⇒ grid suffix), never a doc×doc pair join. Output
# is the frontier cut to the 20 longest (doc_id tie-break). Scale:
# one tokenize scan to per-doc (len, ttr_u) + a bounded-grid suffix
# max; the frontier filter is a broadcast-grid lookup per doc.
_PF_U = 1_000_000
_PF_TOPN = 20

_PF_ORACLE = f"""
WITH d AS (
    SELECT doc_id, n_chars AS len,
           CAST(round(
               len(list_distinct(list_filter(
                   string_split_regex(trim(text), '\\s+'),
                   x -> len(x) > 0))) * {_PF_U}.0
               / len(list_filter(string_split_regex(trim(text), '\\s+'),
                                 x -> len(x) > 0))) AS BIGINT) AS ttr_u
    FROM documents
),
grid AS (
    SELECT len, max(ttr_u)::BIGINT AS mx FROM d GROUP BY 1
),
sfx AS (
    SELECT len,
           max(mx) OVER (ORDER BY len DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING) AS mx_above
    FROM grid
),
frontier AS (
    SELECT d.doc_id, d.len, d.ttr_u
    FROM d JOIN sfx USING (len)
    WHERE sfx.mx_above IS NULL OR d.ttr_u >= sfx.mx_above
)
SELECT doc_id, len AS n_chars,
       round(ttr_u * 1.0 / {_PF_U} * 10000) / 10000 + 0.0 AS ttr
FROM frontier
ORDER BY len DESC, doc_id
LIMIT {_PF_TOPN}
"""


@register("pareto_frontier_quality", oracle=_PF_ORACLE)
def pareto_frontier_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from swat_mapreduce_spark.functions.text import ws_tokens

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("n_chars").alias("len"),
        ws_tokens(F.col("text")).alias("toks"),
    )
    d = docs.filter(F.size("toks") > 0).select(
        "doc_id",
        "len",
        F.round(
            F.size(F.array_distinct("toks"))
            * F.lit(float(_PF_U))
            / F.size("toks")
        )
        .cast("long")
        .alias("ttr_u"),
    )
    grid = d.groupBy("len").agg(F.max("ttr_u").cast("long").alias("mx"))
    wsfx = Window.orderBy(F.col("len").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    sfx = grid.select(
        "len", F.max("mx").over(wsfx).alias("mx_above")
    )
    frontier = d.join(F.broadcast(sfx), "len").filter(
        F.col("mx_above").isNull() | (F.col("ttr_u") >= F.col("mx_above"))
    )
    return (
        frontier.orderBy(F.col("len").desc(), "doc_id")
        .limit(_PF_TOPN)
        .select(
            "doc_id",
            F.col("len").alias("n_chars"),
            R.r(F.col("ttr_u") * F.lit(1.0) / _PF_U, 4).alias("ttr"),
        )
    )


# --- iterative proportional fitting (raking) weights --------------------------------
# Deming & Stephan (1940) IPF/raking — the survey-reweighting step a
# curation pipeline runs to hit TARGET marginals: starting from the
# observed lang×source counts, two raking passes (rows to uniform
# lang shares, then columns to uniform source shares) produce cell
# weights whose weighted margins match the targets. Every weight
# lives in integer 1e-8 units and each multiplicative update snaps
# with multiply-round-divide (the kmeans/markov driver-free variant —
# both passes are pure grid algebra, so the oracle unrolls them as
# CTEs). Scale: the grid is |langs|×|sources| bounded metadata after
# one corpus scan; weights broadcast back if a pipeline applies them.
_IPF_U = 100_000_000

_IPF_ORACLE = f"""
WITH cell AS (
    SELECT lang, source, count(*)::BIGINT AS n
    FROM documents GROUP BY 1, 2
),
tot AS (
    SELECT sum(n)::BIGINT AS n,
           (SELECT count(DISTINCT lang) FROM cell)::BIGINT AS r,
           (SELECT count(DISTINCT source) FROM cell)::BIGINT AS c
    FROM cell
),
-- pass 1: scale each row so weighted lang share = 1/r
w1 AS (
    SELECT cell.lang, cell.source, cell.n,
           CAST(round({_IPF_U}.0 * tot.n / (tot.r * rm.rn)) AS BIGINT)
               AS w_u
    FROM cell
    JOIN (SELECT lang, sum(n)::BIGINT AS rn FROM cell GROUP BY 1) rm
      USING (lang), tot
),
-- pass 2: scale each column so weighted source share = 1/c
cm AS (
    SELECT source, sum(CAST(n AS DECIMAL(38,0)) * w_u) AS cw
    FROM w1 GROUP BY 1
),
w2 AS (
    SELECT w1.lang, w1.source, w1.n,
           CAST(round(w1.w_u * ({_IPF_U}.0 * tot.n / tot.c)
                      / cm.cw::DOUBLE) AS BIGINT) AS w_u
    FROM w1 JOIN cm USING (source), tot
),
margins AS (
    SELECT lang, sum(CAST(n AS DECIMAL(38,0)) * w_u) AS lw
    FROM w2 GROUP BY 1
)
SELECT w2.lang, w2.source, w2.n AS n_docs,
       round(w2.w_u * 1.0 / {_IPF_U} * 1000000) / 1000000 + 0.0
           AS rake_weight,
       round(margins.lw::DOUBLE / ({_IPF_U}.0 * tot.n) * 1000000)
           / 1000000 + 0.0 AS lang_share_after
FROM w2 JOIN margins USING (lang), tot
"""


@register("ipf_raking_weights", oracle=_IPF_ORACLE)
def ipf_raking_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOTE (r13, VERDICT r12 #6): persist() on this grid measured
    # SLOWER at sf0.1 (same cache-serialization cost as the
    # theil_index_sources A/B — see the note there) and was rejected;
    # the cheap numeric groupBy re-derivations stay.
    cell = (
        read_table(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    rm = cell.groupBy("lang").agg(F.sum("n").cast("long").alias("rn"))
    tot = (
        cell.agg(F.sum("n").cast("long").alias("nt"))
        .crossJoin(
            F.broadcast(
                cell.select("lang")
                .distinct()
                .agg(F.count(F.lit(1)).cast("long").alias("r"))
            )
        )
        .crossJoin(
            F.broadcast(
                cell.select("source")
                .distinct()
                .agg(F.count(F.lit(1)).cast("long").alias("c"))
            )
        )
    )
    w1 = (
        cell.join(F.broadcast(rm), "lang")
        .crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "source",
            "n",
            "nt",
            "r",
            "c",
            F.round(
                F.lit(float(_IPF_U))
                * F.col("nt")
                / (F.col("r") * F.col("rn"))
            )
            .cast("long")
            .alias("w_u"),
        )
    )
    cm = w1.groupBy("source").agg(
        F.sum(F.col("n").cast("decimal(38,0)") * F.col("w_u")).alias("cw")
    )
    w2 = w1.join(F.broadcast(cm), "source").select(
        "lang",
        "source",
        "n",
        "nt",
        F.round(
            F.col("w_u")
            * (F.lit(float(_IPF_U)) * F.col("nt") / F.col("c"))
            / F.col("cw").cast("double")
        )
        .cast("long")
        .alias("w_u"),
    )
    margins = w2.groupBy("lang").agg(
        F.sum(F.col("n").cast("decimal(38,0)") * F.col("w_u")).alias("lw")
    )
    return w2.join(F.broadcast(margins), "lang").select(
        "lang",
        "source",
        F.col("n").alias("n_docs"),
        R.r(F.col("w_u") * F.lit(1.0) / _IPF_U, 6).alias("rake_weight"),
        R.r(
            F.col("lw").cast("double")
            / (F.lit(float(_IPF_U)) * F.col("nt")),
            6,
        ).alias("lang_share_after"),
    )


# --- Sinkhorn entropic optimal transport: en → rest length mass -------------------
# Cuturi (2013) Sinkhorn-Knopp — the entropic-OT coupling between the
# en and non-en document-length distributions over 100-char buckets:
# "how much length mass must move, and where, to make en look like
# the rest" — the domain-matching primitive for mix correction.
# Kernel K = exp(−|i−j|/ε), ε=2: since the cost is an integer bucket
# distance, ALL kernel entries are PYTHON-COMPUTED double literals
# (no runtime libm). Two full (u, v) scaling passes run on the
# bounded bucket grid with every scaling vector snapped to integer
# 1e-8 units and every K·vec contraction snapped per term to 1e-12
# units before the exact int64 sum — the oracle unrolls all four
# updates as CTEs. Output: the top-15 coupling cells by snapped mass
# + the total transport cost. Scale: one corpus scan to ≤ ~12 bucket
# marginals; everything after is constant-size grid algebra.
import math as _smath

_SK_EPS = 2.0
_SK_MAXD = 11
_SK_K = {d: _smath.exp(-d / _SK_EPS) for d in range(_SK_MAXD + 1)}
_SK_U = 100_000_000  # scaling-vector units (1e-8)
_SK_T = 10_000  # extra contraction-term snap (1e-12 total)
_SK_TOPN = 15


def _sk_k_sql(dexpr: str) -> str:
    whens = " ".join(
        f"WHEN {d} THEN {_SK_K[d]!r}" for d in range(_SK_MAXD + 1)
    )
    return f"(CASE least({dexpr}, {_SK_MAXD}) {whens} END)"


_SK_ORACLE = f"""
WITH d AS (
    SELECT CASE WHEN lang = 'en' THEN 'en' ELSE 'rest' END AS g,
           CAST(floor(n_chars / 100.0) AS BIGINT) AS b
    FROM documents
),
r AS (SELECT b, count(*)::BIGINT AS cnt FROM d WHERE g = 'en' GROUP BY 1),
c AS (SELECT b, count(*)::BIGINT AS cnt FROM d WHERE g = 'rest' GROUP BY 1),
nr AS (SELECT sum(cnt)::BIGINT AS n FROM r),
nc AS (SELECT sum(cnt)::BIGINT AS n FROM c),
v0 AS (SELECT b, {_SK_U}::BIGINT AS v_u FROM c),
u1 AS (
    SELECT r.b,
           CAST(round(r.cnt * 1e20 / (nr.n::DOUBLE * kv.s)) AS BIGINT)
               AS u_u
    FROM r, nr,
    LATERAL (
        SELECT sum(CAST(round({_sk_k_sql("abs(r.b - v0.b)")}
                   * v0.v_u * {_SK_T}) AS BIGINT))::BIGINT AS s
        FROM v0
    ) kv
),
v1 AS (
    SELECT c.b,
           CAST(round(c.cnt * 1e20 / (nc.n::DOUBLE * ku.s)) AS BIGINT)
               AS v_u
    FROM c, nc,
    LATERAL (
        SELECT sum(CAST(round({_sk_k_sql("abs(c.b - u1.b)")}
                   * u1.u_u * {_SK_T}) AS BIGINT))::BIGINT AS s
        FROM u1
    ) ku
),
u2 AS (
    SELECT r.b,
           CAST(round(r.cnt * 1e20 / (nr.n::DOUBLE * kv.s)) AS BIGINT)
               AS u_u
    FROM r, nr,
    LATERAL (
        SELECT sum(CAST(round({_sk_k_sql("abs(r.b - v1.b)")}
                   * v1.v_u * {_SK_T}) AS BIGINT))::BIGINT AS s
        FROM v1
    ) kv
),
v2 AS (
    SELECT c.b,
           CAST(round(c.cnt * 1e20 / (nc.n::DOUBLE * ku.s)) AS BIGINT)
               AS v_u
    FROM c, nc,
    LATERAL (
        SELECT sum(CAST(round({_sk_k_sql("abs(c.b - u2.b)")}
                   * u2.u_u * {_SK_T}) AS BIGINT))::BIGINT AS s
        FROM u2
    ) ku
),
plan_t AS (
    SELECT u2.b AS i, v2.b AS j, abs(u2.b - v2.b)::BIGINT AS cost,
           CAST(round(u2.u_u::DOUBLE * {_sk_k_sql("abs(u2.b - v2.b)")}
                * v2.v_u / 1e6) AS BIGINT) AS mass_u
    FROM u2, v2
),
tot AS (
    SELECT sum(CAST(mass_u AS DECIMAL(38,0)) * cost) AS cost_u,
           sum(mass_u)::BIGINT AS mass_tot
    FROM plan_t
)
SELECT p.i AS bucket_en, p.j AS bucket_rest, p.cost,
       round(p.mass_u * 1.0 / 1e10 * 1000000) / 1000000 + 0.0
           AS plan_mass,
       round(tot.cost_u::DOUBLE / tot.mass_tot * 10000) / 10000 + 0.0
           AS mean_transport_cost
FROM plan_t p, tot
ORDER BY p.mass_u DESC, p.i, p.j
LIMIT {_SK_TOPN}
"""


@register("sinkhorn_ot_lengths", oracle=_SK_ORACLE)
def sinkhorn_ot_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOTE (r13, VERDICT r12 #6): persist() on the r/c marginals
    # measured SLOWER at sf0.1 (1.7 s -> 3.5 s back-to-back; same
    # cache-serialization cost as the theil_index_sources interleaved
    # A/B — see the note there) and was rejected.
    docs = read_table(spark, sf_dir, "documents").select(
        F.when(F.col("lang") == "en", "en").otherwise("rest").alias("g"),
        F.floor(F.col("n_chars") / F.lit(100.0)).cast("long").alias("b"),
    )
    r = (
        docs.filter(F.col("g") == "en")
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    c = (
        docs.filter(F.col("g") == "rest")
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    nr = r.agg(F.sum("cnt").cast("long").alias("n"))
    nc = c.agg(F.sum("cnt").cast("long").alias("n"))

    def k_col(dcol):
        expr = None
        dd = F.least(dcol, F.lit(_SK_MAXD))
        for d in range(_SK_MAXD + 1):
            br = F.when(dd == d, F.lit(_SK_K[d]))
            expr = br if expr is None else expr.when(dd == d, F.lit(_SK_K[d]))
        return expr

    def scale_pass(marg, n1, other, ocol):
        """One Sinkhorn scaling update: new vec over marg's buckets."""
        o = other.select(
            F.col("b").alias("ob"), F.col(ocol).alias("ov")
        )
        contract = (
            marg.select("b", "cnt")
            .crossJoin(F.broadcast(o))
            .select(
                "b",
                "cnt",
                F.round(
                    k_col(F.abs(F.col("b") - F.col("ob")))
                    * F.col("ov")
                    * F.lit(_SK_T)
                )
                .cast("long")
                .alias("t_u"),
            )
            .groupBy("b", "cnt")
            .agg(F.sum("t_u").cast("long").alias("s"))
        )
        return contract.crossJoin(F.broadcast(n1)).select(
            "b",
            F.round(
                F.col("cnt")
                * F.lit(1e20)
                / (F.col("n").cast("double") * F.col("s"))
            )
            .cast("long")
            .alias("vec_u"),
        )

    v0 = c.select("b", F.lit(_SK_U).cast("long").alias("vec_u"))
    u1 = scale_pass(r, nr, v0, "vec_u")
    v1 = scale_pass(c, nc, u1, "vec_u")
    u2 = scale_pass(r, nr, v1, "vec_u")
    v2 = scale_pass(c, nc, u2, "vec_u")
    ui = u2.select(F.col("b").alias("i"), F.col("vec_u").alias("u_u"))
    vj = v2.select(F.col("b").alias("j"), F.col("vec_u").alias("v_u"))
    plan = ui.crossJoin(F.broadcast(vj)).select(
        "i",
        "j",
        F.abs(F.col("i") - F.col("j")).cast("long").alias("cost"),
        F.round(
            F.col("u_u").cast("double")
            * k_col(F.abs(F.col("i") - F.col("j")))
            * F.col("v_u")
            / F.lit(1e6)
        )
        .cast("long")
        .alias("mass_u"),
    )
    tot = plan.agg(
        F.sum(F.col("mass_u").cast("decimal(38,0)") * F.col("cost")).alias(
            "cost_u"
        ),
        F.sum("mass_u").cast("long").alias("mass_tot"),
    )
    return (
        plan.crossJoin(F.broadcast(tot))
        .orderBy(F.col("mass_u").desc(), "i", "j")
        .limit(_SK_TOPN)
        .select(
            F.col("i").alias("bucket_en"),
            F.col("j").alias("bucket_rest"),
            "cost",
            R.r(F.col("mass_u") * F.lit(1.0) / 1e10, 6).alias(
                "plan_mass"
            ),
            R.r(
                F.col("cost_u").cast("double") / F.col("mass_tot"), 4
            ).alias("mean_transport_cost"),
        )
    )


# --- Banzhaf coverage attribution -------------------------------------------------
# The equal-subset-weight alternative to shapley_coverage_attribution
# (Banzhaf 1965; revived for data valuation by Wang & Jia 2023 as the
# noise-robust semivalue): value_g = 2^{1-G} · Σ_{S∌g} [v(S∪g) − v(S)]
# over the same ≤31-row shingle-coverage mask table — one corpus
# shingle pass, constant driver arithmetic, exact integers until the
# single final division by 2^{G-1} = 16 (a power of two — exact).


def _banzhaf_oracle() -> str:
    from swat_mapreduce_spark.queries.dedup import _SH_DUCK

    return f"""
WITH {_SH_DUCK},
grp AS (
    SELECT doc_id, (substr(source, 4)::INT % {_SHAP_GROUPS}) AS g
    FROM documents
),
shg AS (
    SELECT DISTINCT s.shingle, g.g
    FROM sh s JOIN grp g USING (doc_id)
),
masks AS (
    SELECT shingle, bit_or(1 << g)::BIGINT AS mask FROM shg GROUP BY 1
),
mcnt AS (SELECT mask, count(*)::BIGINT AS cnt FROM masks GROUP BY 1),
subsets AS (SELECT unnest(generate_series(0, 31)) AS s),
vs AS (
    SELECT su.s,
           sum(CASE WHEN (m.mask & su.s) <> 0 THEN m.cnt ELSE 0 END)
               ::BIGINT AS v
    FROM subsets su, mcnt m GROUP BY su.s
),
gs AS (SELECT unnest(generate_series(0, {_SHAP_GROUPS - 1})) AS g),
num AS (
    SELECT gs.g, sum(vb.v - va.v)::BIGINT AS num
    FROM gs
    JOIN vs va ON (va.s & (1 << gs.g)) = 0
    JOIN vs vb ON vb.s = (va.s | (1 << gs.g))
    GROUP BY gs.g
),
docs_g AS (
    SELECT g, count(*)::BIGINT AS n_docs FROM grp GROUP BY 1
),
own AS (
    SELECT gs.g, vs.v AS own_coverage
    FROM gs JOIN vs ON vs.s = (1 << gs.g)
)
SELECT n.g AS grp, coalesce(d.n_docs, 0)::BIGINT AS n_docs,
       o.own_coverage,
       round(n.num / 16.0 * 10000) / 10000 + 0.0 AS banzhaf_value
FROM num n LEFT JOIN docs_g d ON d.g = n.g JOIN own o ON o.g = n.g
"""


@register(
    "banzhaf_coverage_attribution",
    oracle=_banzhaf_oracle(),
    plan_fn=lambda spark, sf_dir: _coverage_masks_plan(spark, sf_dir),
)
def banzhaf_coverage_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from swat_mapreduce_spark.queries.curation import _rp

    # same ONE-pass mask build as shapley_coverage_attribution
    # (_coverage_masks — VERDICT r12 #1); only the semivalue weights
    # differ (uniform 1/2^{G-1} vs |S|!(G-1-|S|)!/G!)
    mcnt, docs_g = _coverage_masks(spark, sf_dir)

    def v(s: int) -> int:
        return sum(c for m, c in mcnt.items() if m & s)

    rows = []
    for g in range(_SHAP_GROUPS):
        bit = 1 << g
        num = sum(v(s | bit) - v(s) for s in range(32) if not s & bit)
        rows.append(
            (g, docs_g.get(g, 0), v(bit), _rp(num / 16.0, 4) + 0.0)
        )
    return spark.createDataFrame(
        rows,
        "grp long, n_docs long, own_coverage long, banzhaf_value double",
    )
