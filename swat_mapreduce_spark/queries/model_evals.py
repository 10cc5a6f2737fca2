r"""Classifier-evaluation and batching-efficiency operators.

* ``calibration_reliability_ece`` — reliability diagram + Expected
  Calibration Error for a fixed-weight logistic English detector
  (score = σ(−3 + 20·stopword_fraction), label = lang == 'en'):
  decile score bins, mean predicted vs observed positive rate per
  bin, |gap|, and the n-weighted ECE. The standard post-training
  calibration audit (Guo et al. 2017's ECE, fixed 10-bin variant).
* ``classifier_auc_ranksum`` — exact ROC-AUC via the Mann-Whitney
  rank-sum identity with proper tie handling: group by (4dp-snapped)
  score, cumulative negative counts below each score group, and
  AUC = Σ n_pos_s · (2·cum_neg_below + n_neg_s) / (2·P·N). All
  arithmetic stays in integers until the single final division.
* ``padding_waste_bucketing`` — padding-efficiency audit for
  fixed-size training batches (B=32, pad-to-longest): arrival-order
  batching vs length-sorted batching, with total padded tokens and
  waste share per strategy. Length-sorted ranks come from the
  range-bucketed distributed rank (operators/ranking.py) — no
  single-partition row_number over the corpus.

Cross-engine determinism: scores are snapped to DECIMAL(6,4) via
multiply-round-divide BEFORE any grouping or summing (CLAUDE.md
gotcha 3; the σ/exp risk class is shared with
quality_linear_classifier and bounded by the 4dp snap); every mean
is an exact decimal-or-integer sum divided once at the end.

100 TB posture: calibration reduces the corpus into ≤ 10 bins and
AUC into ≤ 10⁴ distinct 4dp score groups (both map-side-combined);
the only partition-less windows run over those construction-bounded
tables (census allowlist). Padding waste shuffles once per strategy
on batch id; the arrival strategy derives batch ids from the dense
doc_id key directly (see ``stable_row_ids`` for the general
non-dense case).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from swat_mapreduce_spark.functions import rounding as R
from swat_mapreduce_spark.functions.text import ws_tokens
from swat_mapreduce_spark.operators.ranking import distributed_global_rank
from swat_mapreduce_spark.queries import register
from swat_mapreduce_spark.sources.readers import read_table

# fixed-weight logistic English detector: stopword fraction is the
# single most separating cheap feature for en vs the rest
_EN_STOPS = ["the", "a", "of", "and", "to", "in", "is"]
_SCORE_BIAS = -3.0
_SCORE_W = 20.0

_SCORE_DUCK = rf"""
scored AS (
    SELECT doc_id, (lang = 'en') AS pos,
           CAST(round((1.0 / (1.0 + exp(-({_SCORE_BIAS} + {_SCORE_W}
                * len(list_filter(toks, x -> list_contains(
                      ['the', 'a', 'of', 'and', 'to', 'in', 'is'], x)))
                  * 1.0 / len(toks))))) * 10000) / 10000
                AS DECIMAL(6,4)) AS score
    FROM (
        SELECT doc_id, lang,
               list_filter(string_split_regex(trim(text), '\s+'),
                           t -> len(t) > 0) AS toks
        FROM documents
    ) WHERE len(toks) > 0
)
"""

_ECE_ORACLE = f"""
WITH {_SCORE_DUCK},
b AS (
    SELECT least(9, CAST(floor(score * 10) AS BIGINT)) AS bin,
           count(*)::BIGINT AS n,
           sum(score) AS sum_score,
           sum(CASE WHEN pos THEN 1 ELSE 0 END)::BIGINT AS n_pos
    FROM scored GROUP BY 1
),
g AS (
    SELECT bin, n, n_pos,
           CAST(round(sum_score::DOUBLE / n * 10000) / 10000
                AS DECIMAL(8,4)) AS mean_pred,
           CAST(round(n_pos * 1.0 / n * 10000) / 10000
                AS DECIMAL(8,4)) AS obs_rate
    FROM b
),
e AS (
    SELECT round(sum(CAST(n AS DECIMAL(20,0))
                     * abs(obs_rate - mean_pred))::DOUBLE
                 / sum(n) * 10000) / 10000 + 0.0 AS ece
    FROM g
)
SELECT g.bin, g.n, g.n_pos,
       g.mean_pred::DOUBLE + 0.0 AS mean_pred,
       g.obs_rate::DOUBLE + 0.0 AS obs_rate,
       abs(g.obs_rate - g.mean_pred)::DOUBLE + 0.0 AS abs_gap,
       e.ece
FROM g, e
"""


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", ws_tokens(F.col("text")).alias("toks")
    )
    stop_arr = F.array(*[F.lit(w) for w in _EN_STOPS])
    f_stop = (
        F.size(F.filter("toks", lambda x: F.array_contains(stop_arr, x)))
        * F.lit(1.0)
        / F.size("toks")
    )
    z = F.lit(_SCORE_BIAS) + F.lit(_SCORE_W) * f_stop
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return docs.filter(F.size("toks") > 0).select(
        "doc_id",
        (F.col("lang") == "en").alias("pos"),
        R.r(score, 4).cast("decimal(6,4)").alias("score"),
    )


@register("calibration_reliability_ece", oracle=_ECE_ORACLE)
def calibration_reliability_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-bin reliability diagram + ECE: the corpus reduces into ≤ 10
    decile bins in one map-side-combined aggregate; the single-row ECE
    re-joins broadcast. Scores enter the sums as DECIMAL(6,4)."""
    s = _scored(spark, sf_dir)
    b = s.groupBy(
        F.least(F.lit(9), F.floor(F.col("score") * 10).cast("long")).alias(
            "bin"
        )
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("score").alias("sum_score"),
        F.sum(F.when(F.col("pos"), 1).otherwise(0)).alias("n_pos"),
    )
    dec = "decimal(8,4)"
    g = b.select(
        "bin",
        "n",
        "n_pos",
        R.r(F.col("sum_score").cast("double") / F.col("n"), 4)
        .cast(dec)
        .alias("mean_pred"),
        R.r(F.col("n_pos") * F.lit(1.0) / F.col("n"), 4)
        .cast(dec)
        .alias("obs_rate"),
    )
    e = g.agg(
        R.r(
            F.sum(
                F.col("n").cast("decimal(20,0)")
                * F.abs(F.col("obs_rate") - F.col("mean_pred"))
            ).cast("double")
            / F.sum("n"),
            4,
        ).alias("ece")
    )
    return g.crossJoin(F.broadcast(e)).select(
        "bin",
        "n",
        "n_pos",
        (F.col("mean_pred").cast("double") + 0.0).alias("mean_pred"),
        (F.col("obs_rate").cast("double") + 0.0).alias("obs_rate"),
        (
            F.abs(F.col("obs_rate") - F.col("mean_pred")).cast("double") + 0.0
        ).alias("abs_gap"),
        "ece",
    )


_AUC_ORACLE = f"""
WITH {_SCORE_DUCK},
by_score AS (
    SELECT score,
           sum(CASE WHEN pos THEN 1 ELSE 0 END)::BIGINT AS np,
           sum(CASE WHEN pos THEN 0 ELSE 1 END)::BIGINT AS nn
    FROM scored GROUP BY 1
),
cum AS (
    SELECT score, np, nn,
           (coalesce(sum(nn) OVER (ORDER BY score
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))::BIGINT
               AS neg_below
    FROM by_score
),
tot AS (
    SELECT sum(np)::BIGINT AS p, sum(nn)::BIGINT AS n,
           sum(CAST(np * (2 * neg_below + nn) AS DECIMAL(38,0))) AS num2
    FROM cum
)
SELECT p AS n_pos, n AS n_neg,
       round(num2::DOUBLE / (2.0 * p * n) * 1000000) / 1000000 + 0.0 AS auc,
       round((num2::DOUBLE / (1.0 * p * n) - 1.0) * 1000000) / 1000000 + 0.0
           AS gini
FROM tot
"""


@register("classifier_auc_ranksum", oracle=_AUC_ORACLE)
def classifier_auc_ranksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact AUC with tie handling: P(s⁺>s⁻) + ½·P(s⁺=s⁻) summed per
    distinct 4dp score (≤ 10⁴ groups — the partition-less cumulative
    window is bounded by score granularity, census allowlist).
    Integer arithmetic throughout; one division at the end."""
    s = _scored(spark, sf_dir)
    by_score = s.groupBy("score").agg(
        F.sum(F.when(F.col("pos"), 1).otherwise(0)).alias("np"),
        F.sum(F.when(F.col("pos"), 0).otherwise(1)).alias("nn"),
    )
    w = Window.orderBy("score").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = by_score.withColumn(
        "neg_below", F.coalesce(F.sum("nn").over(w), F.lit(0))
    )
    tot = cum.agg(
        F.sum("np").alias("p"),
        F.sum("nn").alias("n"),
        # per-group terms approach P·N summed — decimal(38,0) so the
        # rank-sum numerator cannot overflow int64 at corpus scale
        F.sum(
            (F.col("np") * (2 * F.col("neg_below") + F.col("nn"))).cast(
                "decimal(38,0)"
            )
        ).alias("num2"),
    )
    num2d = F.col("num2").cast("double")
    return tot.select(
        F.col("p").alias("n_pos"),
        F.col("n").alias("n_neg"),
        R.r(num2d / (2.0 * F.col("p") * F.col("n")), 6).alias("auc"),
        R.r(num2d / (1.0 * F.col("p") * F.col("n")) - 1.0, 6).alias("gini"),
    )


# --- padding-waste batching audit ------------------------------------------
_BATCH = 32

_PAD_ORACLE = rf"""
WITH toks AS (
    SELECT doc_id,
           len(list_filter(string_split_regex(trim(text), '\s+'),
                           t -> len(t) > 0))::BIGINT AS n_toks
    FROM documents
),
arrival AS (
    SELECT doc_id // {_BATCH} AS batch, n_toks FROM toks
),
srt AS (
    SELECT (row_number() OVER (ORDER BY n_toks, doc_id) - 1) // {_BATCH}
               AS batch,
           n_toks
    FROM toks
),
pa AS (
    SELECT batch, max(n_toks) * count(*) AS padded, sum(n_toks) AS toks
    FROM arrival GROUP BY 1
),
ps AS (
    SELECT batch, max(n_toks) * count(*) AS padded, sum(n_toks) AS toks
    FROM srt GROUP BY 1
)
SELECT 'arrival' AS strategy, count(*)::BIGINT AS n_batches,
       sum(toks)::BIGINT AS n_tokens, sum(padded)::BIGINT AS padded_tokens,
       round((sum(padded) - sum(toks)) * 1.0 / sum(padded) * 10000) / 10000
           + 0.0 AS waste_pct
FROM pa
UNION ALL
SELECT 'length_sorted', count(*)::BIGINT, sum(toks)::BIGINT,
       sum(padded)::BIGINT,
       round((sum(padded) - sum(toks)) * 1.0 / sum(padded) * 10000) / 10000
           + 0.0
FROM ps
"""


@register("padding_waste_bucketing", oracle=_PAD_ORACLE)
def padding_waste_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pad-to-longest batch waste, arrival order vs length-sorted.
    The sorted strategy's global rank is the range-bucketed
    distributed rank (bounded per-bucket offset collect,
    operators/ranking.py) — parallelism survives at corpus scale where
    a bare row_number() window would funnel everything through one
    task. Integer sums; one division per output row."""
    toks = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(ws_tokens(F.col("text"))).cast("long").alias("n_toks"),
    )

    def _waste(batched: DataFrame, name: str) -> DataFrame:
        per = batched.groupBy("batch").agg(
            (F.max("n_toks") * F.count(F.lit(1))).alias("padded"),
            F.sum("n_toks").alias("toks"),
        )
        return per.agg(
            F.lit(name).alias("strategy"),
            F.count(F.lit(1)).alias("n_batches"),
            F.sum("toks").alias("n_tokens"),
            F.sum("padded").alias("padded_tokens"),
            R.r(
                (F.sum("padded") - F.sum("toks"))
                * 1.0
                / F.sum("padded"),
                4,
            ).alias("waste_pct"),
        )

    arrival = toks.select(
        (F.col("doc_id") / _BATCH).cast("long").alias("batch"), "n_toks"
    )
    ranked = distributed_global_rank(
        toks,
        value=F.col("n_toks"),
        tiebreak=F.col("doc_id"),
        out="_rank",
    )
    srt = ranked.select(
        ((F.col("_rank") - 1) / _BATCH).cast("long").alias("batch"),
        "n_toks",
    )
    return _waste(arrival, "arrival").unionAll(_waste(srt, "length_sorted"))


# --- split-conformal prediction coverage --------------------------------------
# Split conformal (Vovk; Angelopoulos & Bates 2021 tutorial form) on
# the fixed-weight en-detector: nonconformity s = 1-score if positive
# else score, calibration half = even doc_id, q-hat = the
# ceil((n_cal+1)*(1-alpha))-th smallest calibration score, and the
# guarantee is test coverage >= 1-alpha in expectation. Every
# ingredient is exact: scores live on the DECIMAL(6,4) grid, the order
# statistic comes from integer counts over the (distinct score value)
# table — bounded by the 4dp grid, no global sort of the corpus — and
# coverage is an exact count ratio.
_CONF_ALPHA_NUM = 1  # alpha = 0.1 handled as integers: 9/10
_CONFORMAL_ORACLE = f"""
WITH {_SCORE_DUCK},
nc AS (
    SELECT doc_id,
           CASE WHEN pos THEN CAST(1.0 AS DECIMAL(6,4)) - score
                ELSE score END AS s,
           (doc_id % 2 = 0) AS is_cal
    FROM scored
),
cal_n AS (SELECT count(*)::BIGINT AS n_cal FROM nc WHERE is_cal),
kq AS (
    SELECT ((9 * (n_cal + 1)) + 9) // 10 AS k, n_cal FROM cal_n
),
cal_vals AS (
    SELECT s, count(*)::BIGINT AS c FROM nc WHERE is_cal GROUP BY 1
),
cum AS (
    SELECT s, sum(c) OVER (ORDER BY s)::BIGINT AS cum FROM cal_vals
),
qhat AS (
    SELECT min(s) AS q FROM cum, kq WHERE cum.cum >= least(kq.k, (SELECT max(cum) FROM cum))
),
test_t AS (
    SELECT count(*)::BIGINT AS n_test,
           sum(CASE WHEN nc.s <= qhat.q THEN 1 ELSE 0 END)::BIGINT
               AS n_covered
    FROM nc, qhat WHERE NOT is_cal
)
SELECT kq.n_cal, t.n_test, kq.k AS q_rank,
       qhat.q::DOUBLE + 0.0 AS q_hat,
       t.n_covered,
       round(t.n_covered * 1.0 / t.n_test * 10000) / 10000 + 0.0
           AS coverage
FROM kq, qhat, test_t t
"""


@register("conformal_interval_coverage", oracle=_CONFORMAL_ORACLE)
def conformal_interval_coverage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    s = _scored(spark, sf_dir)
    nc = s.select(
        "doc_id",
        F.when(
            F.col("pos"),
            F.lit(1.0).cast("decimal(6,4)") - F.col("score"),
        )
        .otherwise(F.col("score"))
        .alias("s"),
        (F.col("doc_id") % 2 == 0).alias("is_cal"),
    )
    nc = nc.persist()
    cal = nc.filter("is_cal")
    n_cal = cal.count()
    k = (9 * (n_cal + 1) + 9) // 10
    # exact order statistic from integer counts over the bounded 4dp
    # score grid (collect is |distinct grid values| — bounded)
    vals = sorted(
        (r["s"], r["c"])
        for r in cal.groupBy("s").agg(F.count(F.lit(1)).alias("c")).collect()
    )
    cum, q = 0, vals[-1][0]
    kk = min(k, sum(c for _, c in vals))
    for v, c in vals:
        cum += c
        if cum >= kk:
            q = v
            break
    test = nc.filter(~F.col("is_cal")).agg(
        F.count(F.lit(1)).alias("n_test"),
        F.sum(
            F.when(F.col("s") <= F.lit(q).cast("decimal(6,4)"), 1).otherwise(
                0
            )
        )
        .cast("long")
        .alias("n_covered"),
    )
    nc.unpersist()
    return test.select(
        F.lit(n_cal).cast("long").alias("n_cal"),
        "n_test",
        F.lit(k).cast("long").alias("q_rank"),
        (F.lit(q).cast("double") + F.lit(0.0)).alias("q_hat"),
        "n_covered",
        R.r(F.col("n_covered") * F.lit(1.0) / F.col("n_test"), 4).alias(
            "coverage"
        ),
    )


# --- deterministic bootstrap CI on the corpus keep-rate ------------------------
# Percentile bootstrap (Efron) made reproducible at scale: B=40
# resamples of size n drawn WITH replacement through md5-derived
# indices — resample b picks doc j = H(b, i) mod n for i = 0..n-1, so
# every engine (and every rerun) draws the identical samples with no
# RNG state. Volume is B×n rows through ONE join against the per-doc
# keep flag (doc_id is contiguous 0..n-1 in the testdata; a real
# deployment would zipWithIndex/stable_row_ids first). Resample means
# are exact integer count ratios; the CI bounds are exact order
# statistics of the 40 means (ceil(0.025·B)=1st, ceil(0.975·B)=39th).
_BOOT_B = 40

_BOOT_ORACLE = f"""
WITH {_SCORE_DUCK},
keep_t AS (
    SELECT doc_id, CASE WHEN score >= 0.5 THEN 1 ELSE 0 END AS keep
    FROM scored
),
n_t AS (SELECT count(*)::BIGINT AS n, sum(keep)::BIGINT AS k FROM keep_t),
draws AS (
    SELECT b.b,
           ('0x' || substr(md5(b.b || '_' || kt.doc_id), 1, 15))::BIGINT
               % n_t.n AS j
    FROM keep_t kt, n_t,
         (SELECT unnest(generate_series(0, {_BOOT_B - 1})) AS b) b
),
means AS (
    SELECT d.b, sum(k2.keep)::BIGINT AS cnt, count(*)::BIGINT AS n
    FROM draws d JOIN keep_t k2 ON k2.doc_id = d.j
    GROUP BY d.b
),
arr AS (
    SELECT list(cnt * 1.0 / n ORDER BY cnt * 1.0 / n) AS ms FROM means
)
SELECT n_t.n AS n_docs, {_BOOT_B} AS n_resamples,
       round(n_t.k * 1.0 / n_t.n * 1000000) / 1000000 + 0.0 AS keep_rate,
       round(ms[1] * 1000000) / 1000000 + 0.0 AS boot_lo,
       round(ms[{_BOOT_B - 1}] * 1000000) / 1000000 + 0.0 AS boot_hi
FROM arr, n_t
"""


@register("bootstrap_ci_keep_rate", oracle=_BOOT_ORACLE)
def bootstrap_ci_keep_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _scored(spark, sf_dir)
    keep_t = s.select(
        "doc_id",
        F.when(F.col("score") >= 0.5, 1).otherwise(0).alias("keep"),
    ).persist()
    n_t = keep_t.agg(
        F.count(F.lit(1)).alias("n"), F.sum("keep").cast("long").alias("k")
    )
    draws = (
        keep_t.select("doc_id")
        .crossJoin(F.broadcast(n_t))
        .select(
            "doc_id",
            "n",
            F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b"),
        )
        .select(
            "b",
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                "_",
                                F.col("b").cast("string"),
                                F.col("doc_id").cast("string"),
                            )
                        ),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("long"),
                F.col("n"),
            ).alias("j"),
        )
    )
    means = (
        draws.join(
            keep_t.select(F.col("doc_id").alias("j"), "keep"), "j"
        )
        .groupBy("b")
        .agg(
            F.sum("keep").cast("long").alias("cnt"),
            F.count(F.lit(1)).alias("cn"),
        )
        .select((F.col("cnt") * F.lit(1.0) / F.col("cn")).alias("m"))
    )
    arr = means.agg(F.array_sort(F.collect_list("m")).alias("ms"))
    out = arr.crossJoin(F.broadcast(n_t))
    keep_t.unpersist()
    return out.select(
        F.col("n").alias("n_docs"),
        F.lit(_BOOT_B).alias("n_resamples"),
        R.r(F.col("k") * F.lit(1.0) / F.col("n"), 6).alias("keep_rate"),
        R.r(F.element_at("ms", 1), 6).alias("boot_lo"),
        R.r(F.element_at("ms", _BOOT_B - 1), 6).alias("boot_hi"),
    )


# --- grouped jackknife standard error of the keep rate --------------------------
# The delete-one-group jackknife (Quenouille/Tukey; the grouped form
# survey statisticians use) on the same estimand as the bootstrap:
# th_(i) = keep rate with source i removed — m=|sources| exact count
# ratios — then SE = sqrt((m-1)/m * sum (th_i - mean)^2) and bias
# (m-1)*(mean - th_hat). Replicate values are quantized to integer
# 1e-8 units and the squared deviations to 1e-12 units before summing
# (order-free exact integer sums over the m-row table, gotcha 13a);
# the bounded per-source count table comes from ONE corpus scan.
_JACK_ORACLE = f"""
WITH {_SCORE_DUCK},
keep_t AS (
    SELECT d.source, CASE WHEN s.score >= 0.5 THEN 1 ELSE 0 END AS keep
    FROM scored s JOIN documents d USING (doc_id)
),
per_src AS (
    SELECT source, count(*)::BIGINT AS n_i, sum(keep)::BIGINT AS k_i
    FROM keep_t GROUP BY 1
),
tot AS (SELECT sum(n_i)::BIGINT AS n, sum(k_i)::BIGINT AS k,
               count(*)::BIGINT AS m FROM per_src),
reps AS (
    SELECT p.source,
           CAST(round((tot.k - p.k_i) * 1.0 / (tot.n - p.n_i) * 100000000)
                AS BIGINT) AS u
    FROM per_src p, tot
),
mean_t AS (
    SELECT (sum(u)::DOUBLE / 100000000) / tot.m AS mu, tot.m, tot.n, tot.k
    FROM reps, tot GROUP BY tot.m, tot.n, tot.k
),
dev AS (
    SELECT sum(CAST(round(
               ((r.u::DOUBLE / 100000000 - m.mu)
                * (r.u::DOUBLE / 100000000 - m.mu)) * 1000000000000)
               AS BIGINT))::DOUBLE / 1000000000000 AS ss
    FROM reps r, mean_t m
)
SELECT m.m AS n_groups,
       round(m.k * 1.0 / m.n * 1000000) / 1000000 + 0.0 AS keep_rate,
       round(m.mu * 1000000) / 1000000 + 0.0 AS jack_mean,
       round(sqrt((m.m - 1.0) / m.m * d.ss) * 100000000) / 100000000 + 0.0
           AS jack_se,
       round((m.m - 1.0) * (m.mu - m.k * 1.0 / m.n) * 100000000)
           / 100000000 + 0.0 AS jack_bias
FROM mean_t m, dev d
"""


@register("jackknife_keep_rate_stderr", oracle=_JACK_ORACLE)
def jackknife_keep_rate_stderr(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    s = _scored(spark, sf_dir)
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source"
    )
    keep_t = s.join(docs, "doc_id").select(
        "source",
        F.when(F.col("score") >= 0.5, 1).otherwise(0).alias("keep"),
    )
    per_src = keep_t.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_i"),
        F.sum("keep").cast("long").alias("k_i"),
    )
    tot = per_src.agg(
        F.sum("n_i").cast("long").alias("n"),
        F.sum("k_i").cast("long").alias("k"),
        F.count(F.lit(1)).alias("m"),
    )
    reps = per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n",
        "k",
        "m",
        F.round(
            (F.col("k") - F.col("k_i"))
            * F.lit(1.0)
            / (F.col("n") - F.col("n_i"))
            * F.lit(1e8)
        )
        .cast("long")
        .alias("u"),
    )
    mean_t = reps.groupBy("n", "k", "m").agg(
        ((F.sum("u").cast("double") / F.lit(1e8)) / F.col("m")).alias("mu")
    )
    dev = (
        reps.join(F.broadcast(mean_t.select("m", "mu")), "m")
        .select(
            F.round(
                (
                    (F.col("u").cast("double") / F.lit(1e8) - F.col("mu"))
                    * (F.col("u").cast("double") / F.lit(1e8) - F.col("mu"))
                )
                * F.lit(1e12)
            )
            .cast("long")
            .alias("du")
        )
        .agg((F.sum("du").cast("double") / F.lit(1e12)).alias("ss"))
    )
    out = mean_t.crossJoin(F.broadcast(dev))
    rate = F.col("k") * F.lit(1.0) / F.col("n")
    return out.select(
        F.col("m").alias("n_groups"),
        R.r(rate, 6).alias("keep_rate"),
        R.r(F.col("mu"), 6).alias("jack_mean"),
        R.r(
            F.sqrt((F.col("m") - F.lit(1.0)) / F.col("m") * F.col("ss")), 8
        ).alias("jack_se"),
        R.r(
            (F.col("m") - F.lit(1.0)) * (F.col("mu") - rate), 8
        ).alias("jack_bias"),
    )


# --- propensity-score caliper matching (ATT) ------------------------------------
# Observational causal effect with the Rosenbaum-Rubin recipe:
# treatment = heavy pre-period signup activity (>= 7 signups in Jan
# 1-15 — deliberately CONFOUNDED with overall activity, which is what
# matching must correct), outcome = post-period purchase value.
# Propensity from a fixed-weight logistic on pre-period features; each
# treated user matches the nearest-propensity control within a +/-1
# CENTILE caliper (the textbook caliper, made scale-honest: candidate
# pairs are blocked on the centile grid +/-1 — never treated x control
# cartesian), nearest-with-replacement, ties broken through ONE
# exact scalar key |diff|*1e7 + control_id (< 2^53 — gotcha 9).
# The key is lexicographic (diff first, then id) ONLY while
# control_id < 1e7: |diff| is an integer count of 1e-6 propensity
# units, so adjacent diffs are 1e7 apart in key space. user_id tops
# out ~1.5e3 at current testdata (3+ orders of margin); the Spark side
# assert_true's the bound per candidate row so a larger future ID
# domain fails LOUDLY instead of silently picking an engine-dependent
# match (ADVICE r8).
# Determinism: propensity snapped to integer 1e-6 units (the one exp),
# ATT from exact cents sums.
_PSM_SPLIT = "2024-01-16"
_PSM_SIGNUPS = 7

_PSM_ORACLE = f"""
WITH pu AS (
    SELECT user_id,
           sum(CASE WHEN ts < TIMESTAMP '{_PSM_SPLIT}' THEN 1 ELSE 0 END)
               ::BIGINT AS n_pre,
           sum(CASE WHEN ts < TIMESTAMP '{_PSM_SPLIT}'
                    THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
               AS v_pre,
           sum(CASE WHEN ts < TIMESTAMP '{_PSM_SPLIT}'
                     AND event_type = 'signup' THEN 1 ELSE 0 END)
               ::BIGINT AS n_signup_pre,
           sum(CASE WHEN ts >= TIMESTAMP '{_PSM_SPLIT}'
                     AND event_type = 'purchase'
                    THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
               AS y
    FROM events GROUP BY 1
),
scored AS (
    SELECT user_id, y, (n_signup_pre >= {_PSM_SIGNUPS}) AS treated,
           CAST(round(1.0 / (1.0 + exp(-(-1.0 + 0.04 * n_pre
               + 0.005 * (CASE WHEN n_pre = 0 THEN 0.0
                               ELSE v_pre::DOUBLE / n_pre / 100 END))))
               * 1000000) AS BIGINT) AS p_u
    FROM pu
),
t AS (SELECT user_id, y, p_u, p_u // 10000 AS b FROM scored WHERE treated),
c AS (SELECT user_id, y, p_u, p_u // 10000 AS b FROM scored
      WHERE NOT treated),
cand AS (
    SELECT t.user_id AS t_id, t.y AS t_y, t.p_u AS t_p,
           c.user_id AS c_id, c.y AS c_y, c.p_u AS c_p,
           abs(t.p_u - c.p_u) * 10000000 + c.user_id AS k
    FROM t JOIN c ON c.b BETWEEN t.b - 1 AND t.b + 1
),
matched AS (
    SELECT t_id, min(t_y) AS t_y, min(t_p) AS t_p,
           min_by(c_y, k) AS c_y, min_by(c_p, k) AS c_p
    FROM cand GROUP BY t_id
)
SELECT (SELECT count(*) FROM t)::BIGINT AS n_treated,
       (SELECT count(*) FROM c)::BIGINT AS n_control,
       count(*)::BIGINT AS n_matched,
       round(sum(t_y - c_y) * 1.0 / count(*) / 100 * 10000) / 10000 + 0.0
           AS att,
       round(avg(t_p * 1.0) / 1000000 * 10000) / 10000 + 0.0
           AS mean_prop_treated,
       round(avg(c_p * 1.0) / 1000000 * 10000) / 10000 + 0.0
           AS mean_prop_matched_control
FROM matched
"""


@register("propensity_caliper_match_att", oracle=_PSM_ORACLE)
def propensity_caliper_match_att(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    split = F.lit(_PSM_SPLIT).cast("timestamp")
    pre = F.col("ts") < split
    pu = ev.groupBy("user_id").agg(
        F.sum(F.when(pre, 1).otherwise(0)).cast("long").alias("n_pre"),
        F.sum(F.when(pre, F.col("cents")).otherwise(0)).alias("v_pre"),
        F.sum(
            F.when(pre & (F.col("event_type") == "signup"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_signup_pre"),
        F.sum(
            F.when(
                (~pre) & (F.col("event_type") == "purchase"),
                F.col("cents"),
            ).otherwise(0)
        ).alias("y"),
    )
    v_mean = F.when(F.col("n_pre") == 0, F.lit(0.0)).otherwise(
        F.col("v_pre").cast("double") / F.col("n_pre") / F.lit(100.0)
    )
    z = F.lit(-1.0) + F.lit(0.04) * F.col("n_pre") + F.lit(0.005) * v_mean
    p_u = F.round(
        F.lit(1.0) / (F.lit(1.0) + F.exp(-z)) * F.lit(1e6)
    ).cast("long")
    scored = pu.select(
        "user_id",
        "y",
        (F.col("n_signup_pre") >= _PSM_SIGNUPS).alias("treated"),
        p_u.alias("p_u"),
    ).withColumn("b", F.expr("p_u div 10000"))
    t = scored.filter("treated").select(
        F.col("user_id").alias("t_id"),
        F.col("y").alias("t_y"),
        F.col("p_u").alias("t_p"),
        F.col("b").alias("t_b"),
    )
    c = scored.filter(~F.col("treated")).select(
        F.col("user_id").alias("c_id"),
        F.col("y").alias("c_y"),
        F.col("p_u").alias("c_p"),
        F.col("b").alias("c_b"),
    )
    cand = t.join(
        c,
        (F.col("c_b") >= F.col("t_b") - 1)
        & (F.col("c_b") <= F.col("t_b") + 1),
    ).select(
        "t_id",
        "t_y",
        "t_p",
        "c_y",
        "c_p",
        (
            F.abs(F.col("t_p") - F.col("c_p")) * F.lit(10_000_000)
            + F.col("c_id")
            # lexicographic-bound guard: assert_true yields NULL when
            # the bound holds (coalesce keeps it un-prunable) and
            # throws if a future ID domain ever reaches the 1e7
            # multiplier
            + F.coalesce(
                F.assert_true(F.col("c_id") < F.lit(10_000_000)).cast(
                    "long"
                ),
                F.lit(0),
            )
        ).alias("k"),
    )
    matched = cand.groupBy("t_id").agg(
        F.min("t_y").alias("t_y"),
        F.min("t_p").alias("t_p"),
        F.min_by("c_y", "k").alias("c_y"),
        F.min_by("c_p", "k").alias("c_p"),
    )
    nt = t.agg(F.count(F.lit(1)).alias("n_treated"))
    nc = c.agg(F.count(F.lit(1)).alias("n_control"))
    return (
        matched.agg(
            F.count(F.lit(1)).cast("long").alias("n_matched"),
            F.sum(F.col("t_y") - F.col("c_y")).alias("d_sum"),
            F.sum("t_p").alias("tp_sum"),
            F.sum("c_p").alias("cp_sum"),
        )
        .crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(nc))
        .select(
            F.col("n_treated").cast("long"),
            F.col("n_control").cast("long"),
            "n_matched",
            R.r(
                F.col("d_sum").cast("double")
                / F.col("n_matched")
                / F.lit(100.0),
                4,
            ).alias("att"),
            R.r(
                F.col("tp_sum").cast("double")
                / F.col("n_matched")
                / F.lit(1e6),
                4,
            ).alias("mean_prop_treated"),
            R.r(
                F.col("cp_sum").cast("double")
                / F.col("n_matched")
                / F.lit(1e6),
                4,
            ).alias("mean_prop_matched_control"),
        )
    )


# --- isotonic calibration (PAVA) of the quality classifier ----------------------
# Zadrozny-Elkan calibration: fit a MONOTONE score->P(label) map for
# the fixed-weight quality classifier (quality_linear_classifier,
# llm_text3.py — label = lang='en'). Scores land on a bounded
# centi-probability grid (<=101 cells), where the pool-adjacent-
# violators solution has the closed minimax form iso(i) =
# max_{j<=i} min_{k>=i} avg(pos[j..k] / n[j..k]) — so the "iterative"
# PAVA becomes grid³ interval arithmetic over exact integer prefix
# sums (bounded: all cumulative/interval tables are |grid|-sized
# self-joins, no windows, no iteration, nothing corpus-sized after
# the one scoring pass). Averages are exact-integer-derived doubles;
# min/max over bit-identical doubles is engine-free.
_ISO_ORACLE = rf"""
WITH t AS (
    SELECT doc_id, lang,
           list_filter(string_split_regex(trim(text), '\s+'),
                       t -> len(t) > 0) AS toks
    FROM documents
),
f AS (
    SELECT doc_id, lang,
           least(1.0, len(toks) / 80.0) AS f_len,
           len(list_distinct(toks))::DOUBLE / len(toks) AS f_uniq,
           len(list_filter(toks, x -> list_contains(
               ['the', 'a', 'of', 'and', 'to', 'in', 'is'], x)))::DOUBLE
               / len(toks) AS f_stop,
           list_sum(list_transform(toks, x -> length(x)))::DOUBLE
               / len(toks) / 10.0 AS f_awl
    FROM t
),
scored AS (
    SELECT CAST(round((1.0 / (1.0 + exp(-(-2.0 + 2.0 * f_len
               + 1.5 * f_uniq + -1.0 * f_stop + 0.5 * f_awl))))
               * 100) AS BIGINT) AS u,
           CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
    FROM f
),
grid AS (
    SELECT u, count(*)::BIGINT AS n, sum(y)::BIGINT AS pos
    FROM scored GROUP BY 1
),
cum AS (
    SELECT a.u, a.n, a.pos,
           sum(b.n)::BIGINT AS cn, sum(b.pos)::BIGINT AS cp
    FROM grid a JOIN grid b ON b.u <= a.u
    GROUP BY a.u, a.n, a.pos
),
iv AS (
    SELECT j.u AS ju, k.u AS ku,
           (k.cp - j.cp + j.pos)::DOUBLE
               / (k.cn - j.cn + j.n) AS avg_jk
    FROM cum j JOIN cum k ON j.u <= k.u
),
inner_min AS (
    SELECT g.u, iv.ju, min(iv.avg_jk) AS m
    FROM grid g JOIN iv ON iv.ju <= g.u AND iv.ku >= g.u
    GROUP BY g.u, iv.ju
),
iso AS (SELECT u, max(m) AS iso_rate FROM inner_min GROUP BY u)
SELECT g.u::BIGINT AS score_centi, g.n AS n_docs, g.pos AS n_pos,
       round(g.pos * 1.0 / g.n * 10000) / 10000 + 0.0 AS raw_rate,
       round(i.iso_rate * 1000000) / 1000000 + 0.0 AS iso_rate
FROM grid g JOIN iso i ON i.u = g.u
"""


@register("isotonic_calibration_pava", oracle=_ISO_ORACLE)
def isotonic_calibration_pava(spark: SparkSession, sf_dir: str) -> DataFrame:
    from swat_mapreduce_spark.queries.llm_text3 import _QW

    docs = read_table(spark, sf_dir, "documents").select(
        "lang", ws_tokens(F.col("text")).alias("toks")
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
    z = (
        F.lit(_QW["bias"])
        + _QW["len"] * f_len
        + _QW["uniq"] * f_uniq
        + _QW["stop"] * f_stop
        + _QW["awl"] * f_awl
    )
    scored = docs.select(
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)) * 100)
        .cast("long")
        .alias("su"),  # su: centi-snapped score grid (<=101 values; "u" would collide
        # with the graph node-key name in the broadcast-boundedness domain dict)
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    # persist the bounded centi-grid (≤101 rows — VERDICT r12 #6 /
    # guide §5): four consumer chains (cum, iv's j and k, inner_min's
    # anchor, the final join) each re-derived it from a fresh corpus
    # scan + the full tokenize/score pipeline — 6 document scans in the
    # unpersisted plan, 1 after
    from pyspark import StorageLevel

    grid = (
        scored.groupBy("su")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("y").cast("long").alias("pos"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    b = grid.select(
        F.col("su").alias("bsu"), F.col("n").alias("bn"), F.col("pos").alias("bp")
    )
    # broadcast hints: every non-equi self-join side here is the
    # bounded centi-grid (<=101 rows) or grid² intervals — hinting
    # keeps the planner on BroadcastNestedLoopJoin instead of a
    # CartesianProduct (no-cartesian census guarantee)
    cum = (
        grid.join(F.broadcast(b), F.col("bsu") <= F.col("su"))
        .groupBy("su", "n", "pos")
        .agg(F.sum("bn").alias("cn"), F.sum("bp").alias("cp"))
    )
    j = cum.select(
        F.col("su").alias("jsu"),
        F.col("n").alias("jn"),
        F.col("pos").alias("jp"),
        F.col("cn").alias("jcn"),
        F.col("cp").alias("jcp"),
    )
    k = cum.select(
        F.col("su").alias("ksu"),
        F.col("cn").alias("kcn"),
        F.col("cp").alias("kcp"),
    )
    iv = j.join(F.broadcast(k), F.col("jsu") <= F.col("ksu")).select(
        "jsu",
        "ksu",
        (
            (F.col("kcp") - F.col("jcp") + F.col("jp")).cast("double")
            / (F.col("kcn") - F.col("jcn") + F.col("jn"))
        ).alias("avg_jk"),
    )
    inner_min = (
        grid.select("su")
        .join(
            F.broadcast(iv),
            (F.col("jsu") <= F.col("su")) & (F.col("ksu") >= F.col("su")),
        )
        .groupBy("su", "jsu")
        .agg(F.min("avg_jk").alias("m"))
    )
    iso = inner_min.groupBy("su").agg(F.max("m").alias("iso_rate"))
    return grid.join(iso, "su").select(
        F.col("su").alias("score_centi"),
        F.col("n").alias("n_docs"),
        F.col("pos").alias("n_pos"),
        R.r(F.col("pos").cast("double") / F.col("n"), 4).alias("raw_rate"),
        R.r("iso_rate", 6).alias("iso_rate"),
    )


# --- unbiased pass@k estimator ---------------------------------------------------
# The HumanEval/Codex eval primitive (Chen et al. 2021): with n
# deterministic attempts per task and c successes, the UNBIASED
# estimator of pass@k is 1 − C(n−c, k)/C(n, k) — never the biased
# 1−(1−c/n)^k. Attempts are the repo's md5 stand-in for sampled
# generations: attempt i of doc d succeeds iff
# hash_uint(d:':pk:':i) % 100 < t_d, with per-doc difficulty
# t_d = 10 + hash_uint(d:':pd') % 61 (10..70%) so the c distribution
# is heterogeneous (uniform difficulty would make pass@k ≈ pass@1
# scaled — a vacuous check). EXACT arithmetic throughout: per doc the
# estimator times C(n,k) is the integer C(n,k) − C(n−c,k) (a CASE
# lookup of Python-computed binomials, identical literals in both
# engines), so the corpus mean is a ratio of exact int64 sums with
# one final double division. Scale: ONE corpus scan computing c
# row-locally (10 md5 calls/doc, no explode, no shuffle) then a
# 3-row bounded agg.
_PK_N = 10
_PK_KS = (1, 5, 10)


def _comb(n: int, k: int) -> int:
    import math as _m

    return _m.comb(n, k) if 0 <= k <= n else 0


def _pk_case(k: int, col: str) -> str:
    """SQL CASE mapping c -> C(n,k) - C(n-c,k) (the per-doc unbiased
    numerator times the constant denominator C(n,k))."""
    whens = " ".join(
        f"WHEN {c} THEN {_comb(_PK_N, k) - _comb(_PK_N - c, k)}"
        for c in range(_PK_N + 1)
    )
    return f"(CASE {col} {whens} END)"


_PK_ORACLE = f"""
WITH t AS (
    SELECT doc_id,
           (10 + ('0x' || substr(md5(doc_id || ':pd'), 1, 8))::BIGINT % 61)
               AS thr
    FROM documents
),
c AS (
    SELECT t.doc_id,
           sum(CASE WHEN ('0x' || substr(md5(t.doc_id || ':pk:' || g.i),
                          1, 8))::BIGINT % 100 < t.thr
                    THEN 1 ELSE 0 END)::BIGINT AS c
    FROM t, generate_series(0, {_PK_N - 1}) AS g(i)
    GROUP BY t.doc_id
),
k AS (SELECT unnest([{", ".join(str(k) for k in _PK_KS)}]) AS k),
agg AS (
    SELECT k.k,
           count(*)::BIGINT AS n_docs,
           sum(CASE k.k
               WHEN 1 THEN {_pk_case(1, "c.c")}
               WHEN 5 THEN {_pk_case(5, "c.c")}
               ELSE {_pk_case(10, "c.c")} END)::BIGINT AS num,
           sum(CASE WHEN c.c > 0 THEN 1 ELSE 0 END)::BIGINT AS n_any
    FROM c, k GROUP BY k.k
)
SELECT k AS at_k, n_docs, n_any AS n_docs_any_success,
       round(num * 1.0
             / (n_docs * (CASE k WHEN 1 THEN {_comb(_PK_N, 1)}
                          WHEN 5 THEN {_comb(_PK_N, 5)}
                          ELSE {_comb(_PK_N, 10)} END))
             * 10000) / 10000 + 0.0 AS pass_at_k
FROM agg
"""


@register("pass_at_k_estimator", oracle=_PK_ORACLE)
def pass_at_k_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    thr = (
        "10 + cast(conv(substr(md5(concat(cast(doc_id as string), ':pd')),"
        " 1, 8), 16, 10) as bigint) % 61"
    )
    succ = (
        "case when cast(conv(substr(md5(concat(cast(doc_id as string),"
        " ':pk:', cast(i as string))), 1, 8), 16, 10) as bigint) % 100"
        f" < ({thr}) then 1 else 0 end"
    )
    c = docs.selectExpr(
        "doc_id",
        "aggregate(transform(sequence(0, "
        f"{_PK_N - 1}), i -> {succ}), 0L, (a, x) -> a + x) as c",
    )
    outs = []
    for k in _PK_KS:
        case = _pk_case(k, "c")
        outs.append(
            c.selectExpr(
                f"{k}L as at_k",
                "c",
                f"cast({case} as bigint) as num",
            )
            .groupBy("at_k")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum(F.when(F.col("c") > 0, 1).otherwise(0))
                .cast("long")
                .alias("n_docs_any_success"),
                F.sum("num").alias("num"),
            )
            .select(
                "at_k",
                "n_docs",
                "n_docs_any_success",
                R.r(
                    F.col("num").cast("double")
                    / (F.col("n_docs") * F.lit(_comb(_PK_N, k))),
                    4,
                ).alias("pass_at_k"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


# --- best-of-n expected reward via order statistics --------------------------------
# The BoN scaling curve (Nakano et al. 2021 WebGPT appendix; the
# standard alignment-eval estimator): with n=8 deterministic stand-in
# reward scores per doc, the UNBIASED estimate of E[max of n_pick
# samples drawn WITHOUT replacement] is Σ_i s_(i)·C(i−1,k−1)/C(n,k)
# over the sorted scores — never the biased "mean of one random
# subset". Scores are md5 stand-ins (hash_uint % 10000), sorting and
# the weighted sum are ROW-LOCAL array ops (no explode, no shuffle),
# binomial weights are Python-computed literals embedded in both
# engines, and every per-doc numerator is an exact int64 — the corpus
# mean is one ratio of exact sums per k. Scale: ONE corpus scan + a
# 4-row bounded agg.
_BON_N = 8
_BON_KS = (1, 2, 4, 8)
_BON_SCALE = 10_000


def _bon_weights(k: int) -> list:
    import math as _m

    return [
        _m.comb(i - 1, k - 1) if i - 1 >= k - 1 else 0
        for i in range(1, _BON_N + 1)
    ]


_BON_ORACLE = f"""
WITH s AS (
    SELECT doc_id,
           list_sort(list_transform(generate_series(0, {_BON_N - 1}),
               i -> ('0x' || substr(md5(doc_id || ':bn:' || i), 1, 8))
                        ::BIGINT % {_BON_SCALE})) AS ls
    FROM documents
),
nums AS (
    SELECT doc_id,
{",".join(
    f"           list_sum(list_transform(generate_series(1, {_BON_N}),"
    f" i -> ls[i] * ({_bon_weights(k)}[i])))::BIGINT AS num_{k}"
    for k in _BON_KS
)}
    FROM s
),
k AS (SELECT unnest([{", ".join(str(k) for k in _BON_KS)}]) AS k),
agg AS (
    SELECT k.k, count(*)::BIGINT AS n_docs,
           sum(CASE k.k {" ".join(
               f"WHEN {k} THEN num_{k}" for k in _BON_KS)} END)::BIGINT
               AS num
    FROM nums, k GROUP BY k.k
)
SELECT k AS n_pick, n_docs,
       round(num * 1.0
             / (n_docs * (CASE k {" ".join(
                 f"WHEN {k} THEN {sum(_bon_weights(k))}"
                 for k in _BON_KS)} END))
             / {_BON_SCALE} * 100 * 10000) / 10000 + 0.0
           AS expected_best_score
FROM agg
"""


@register("best_of_n_expected_score", oracle=_BON_ORACLE)
def best_of_n_expected_score(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    s = docs.select(
        "doc_id",
        F.expr(
            f"array_sort(transform(sequence(0, {_BON_N - 1}), i ->"
            " cast(conv(substr(md5(concat(cast(doc_id as string),"
            " ':bn:', cast(i as string))), 1, 8), 16, 10) as bigint)"
            f" % {_BON_SCALE}))"
        ).alias("ls"),
    )
    num_cols = []
    for k in _BON_KS:
        ws = _bon_weights(k)
        warr = "array(" + ", ".join(
            f"{w}L" for w in ws
        ) + ")"
        num_cols.append(
            F.expr(
                f"cast(aggregate(zip_with(ls, {warr},"
                " (s, w) -> s * w), 0L, (acc, x) -> acc + x) as bigint)"
            ).alias(f"num_{k}")
        )
    nums = s.select("doc_id", *num_cols)
    kdf = spark.createDataFrame([(k,) for k in _BON_KS], "k long")
    case_num = None
    for k in _BON_KS:
        br = F.when(F.col("k") == k, F.col(f"num_{k}"))
        case_num = br if case_num is None else case_num.when(
            F.col("k") == k, F.col(f"num_{k}")
        )
    agg = (
        nums.crossJoin(F.broadcast(kdf))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(case_num).cast("long").alias("num"),
        )
    )
    den_case = None
    for k in _BON_KS:
        tot = sum(_bon_weights(k))
        br = F.when(F.col("k") == k, F.lit(tot))
        den_case = br if den_case is None else den_case.when(
            F.col("k") == k, F.lit(tot)
        )
    return agg.select(
        F.col("k").alias("n_pick"),
        "n_docs",
        R.r(
            F.col("num")
            * F.lit(1.0)
            / (F.col("n_docs") * den_case)
            / _BON_SCALE
            * 100,
            4,
        ).alias("expected_best_score"),
    )


# --- Matthews correlation of the thresholded en-detector ----------------------------
# Matthews (1975) / phi coefficient — the single-number binary score
# that stays honest under class imbalance (accuracy and F1 both
# inflate when one class dominates): threshold the shared
# fixed-weight logistic en-detector at 0.5 and score against the true
# label. The DECIMAL(6,4) score threshold comparison is exact; MCC,
# F1, balanced accuracy, and prevalence are ratios of the four exact
# integer confusion cells (TP·TN−FP·FN through DECIMAL(38,0) so
# web-scale cells cannot wrap). Scale: one corpus scan to 4 integers.
_MCC_THRESH = "0.5000"

_MCC_ORACLE = f"""
WITH {_SCORE_DUCK},
cells AS (
    SELECT count(*) FILTER (WHERE score >= {_MCC_THRESH} AND pos)
               ::BIGINT AS tp,
           count(*) FILTER (WHERE score >= {_MCC_THRESH} AND NOT pos)
               ::BIGINT AS fp,
           count(*) FILTER (WHERE score < {_MCC_THRESH} AND pos)
               ::BIGINT AS fn,
           count(*) FILTER (WHERE score < {_MCC_THRESH} AND NOT pos)
               ::BIGINT AS tn
    FROM scored
)
SELECT tp, fp, fn, tn,
       round((CAST(tp AS DECIMAL(38,0)) * tn
              - CAST(fp AS DECIMAL(38,0)) * fn)::DOUBLE
             / sqrt((tp + fp)::DOUBLE * (tp + fn) * (tn + fp)
                    * (tn + fn)) * 1000000) / 1000000 + 0.0 AS mcc,
       round(2.0 * tp / (2.0 * tp + fp + fn) * 1000000) / 1000000 + 0.0
           AS f1,
       round((tp::DOUBLE / (tp + fn) + tn::DOUBLE / (tn + fp)) / 2
             * 1000000) / 1000000 + 0.0 AS balanced_accuracy,
       round((tp + fn)::DOUBLE / (tp + fp + fn + tn) * 1000000)
           / 1000000 + 0.0 AS prevalence
FROM cells
"""


@register("mcc_en_detector", oracle=_MCC_ORACLE)
def mcc_en_detector(spark: SparkSession, sf_dir: str) -> DataFrame:
    sc = _scored(spark, sf_dir)
    thr = F.lit(_MCC_THRESH).cast("decimal(6,4)")
    cells = sc.agg(
        F.sum(F.when((F.col("score") >= thr) & F.col("pos"), 1).otherwise(0))
        .cast("long")
        .alias("tp"),
        F.sum(
            F.when((F.col("score") >= thr) & ~F.col("pos"), 1).otherwise(0)
        )
        .cast("long")
        .alias("fp"),
        F.sum(F.when((F.col("score") < thr) & F.col("pos"), 1).otherwise(0))
        .cast("long")
        .alias("fn"),
        F.sum(
            F.when((F.col("score") < thr) & ~F.col("pos"), 1).otherwise(0)
        )
        .cast("long")
        .alias("tn"),
    )
    num = (
        F.col("tp").cast("decimal(38,0)") * F.col("tn")
        - F.col("fp").cast("decimal(38,0)") * F.col("fn")
    ).cast("double")
    den = F.sqrt(
        (F.col("tp") + F.col("fp")).cast("double")
        * (F.col("tp") + F.col("fn"))
        * (F.col("tn") + F.col("fp"))
        * (F.col("tn") + F.col("fn"))
    )
    return cells.select(
        "tp",
        "fp",
        "fn",
        "tn",
        R.r(num / den, 6).alias("mcc"),
        R.r(
            F.lit(2.0)
            * F.col("tp")
            / (F.lit(2.0) * F.col("tp") + F.col("fp") + F.col("fn")),
            6,
        ).alias("f1"),
        R.r(
            (
                F.col("tp").cast("double") / (F.col("tp") + F.col("fn"))
                + F.col("tn").cast("double") / (F.col("tn") + F.col("fp"))
            )
            / 2,
            6,
        ).alias("balanced_accuracy"),
        R.r(
            (F.col("tp") + F.col("fn")).cast("double")
            / (F.col("tp") + F.col("fp") + F.col("fn") + F.col("tn")),
            6,
        ).alias("prevalence"),
    )


# --- cumulative gains / lift table for the en-detector ------------------------------
# The marketing-science eval for a ranking classifier: sort documents
# by detector score (desc) and report, at each decile prefix, the
# cumulative capture of positives (gains) and the lift over random.
# Prefixes are EXACT: cumulative doc/positive counts live on the
# bounded DECIMAL(6,4) score grid (ccnet value-level pattern, ≤ 10⁴
# rows — allowlisted global window), the decile cut is the smallest
# grid prefix with cum·10 ≥ k·n (integer arithmetic), and gains/lift
# are exact-integer ratios. Ties share a score cell, so the chosen
# prefix is deterministic on both engines. Scale: one corpus scan to
# the score grid.
_LIFT_ORACLE = f"""
WITH {_SCORE_DUCK},
g AS (
    SELECT score, count(*)::BIGINT AS c,
           sum(CASE WHEN pos THEN 1 ELSE 0 END)::BIGINT AS cp
    FROM scored GROUP BY 1
),
cum AS (
    SELECT score,
           sum(c) OVER (ORDER BY score DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW)::BIGINT AS n_cum,
           sum(cp) OVER (ORDER BY score DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)::BIGINT AS p_cum
    FROM g
),
tot AS (
    SELECT sum(c)::BIGINT AS n, sum(cp)::BIGINT AS p FROM g
),
k AS (SELECT unnest(generate_series(1, 10)) AS k),
cut AS (
    SELECT k.k, min(cum.score) AS cutoff_score,
           min(cum.n_cum) AS n_cum
    FROM k JOIN cum ON cum.n_cum * 10 >= k.k * (SELECT n FROM tot)
    GROUP BY k.k
),
dec AS (
    SELECT cut.k, cut.cutoff_score, cut.n_cum, cum.p_cum, tot.n, tot.p
    FROM cut JOIN cum ON cum.score = cut.cutoff_score, tot
)
SELECT k::BIGINT AS decile,
       cutoff_score::DOUBLE + 0.0 AS cutoff_score,
       n_cum, p_cum AS pos_cum,
       round(p_cum * 1.0 / p * 1000000) / 1000000 + 0.0 AS gain,
       round((p_cum * 1.0 / n_cum) / (p * 1.0 / n) * 10000) / 10000
           + 0.0 AS lift
FROM dec
"""


@register("lift_gains_en_detector", oracle=_LIFT_ORACLE)
def lift_gains_en_detector(spark: SparkSession, sf_dir: str) -> DataFrame:
    sc = _scored(spark, sf_dir)
    g = sc.groupBy("score").agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum(F.when(F.col("pos"), 1).otherwise(0))
        .cast("long")
        .alias("cp"),
    )
    wc = Window.orderBy(F.col("score").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = g.select(
        "score",
        F.sum("c").over(wc).cast("long").alias("n_cum"),
        F.sum("cp").over(wc).cast("long").alias("p_cum"),
    )
    tot = g.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum("cp").cast("long").alias("p"),
    )
    k = spark.createDataFrame([(i,) for i in range(1, 11)], "k long")
    cut = (
        k.crossJoin(F.broadcast(cum))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("n_cum") * 10 >= F.col("k") * F.col("n"))
        .groupBy("k")
        .agg(
            F.min("score").alias("cutoff_score"),
            F.min("n_cum").cast("long").alias("n_cum"),
        )
    )
    dec = (
        cut.join(
            F.broadcast(cum.select("score", "p_cum")),
            cut["cutoff_score"] == cum["score"],
        )
        .crossJoin(F.broadcast(tot))
    )
    return dec.select(
        F.col("k").alias("decile"),
        F.col("cutoff_score").cast("double").alias("cutoff_score"),
        "n_cum",
        F.col("p_cum").alias("pos_cum"),
        R.r(F.col("p_cum") * F.lit(1.0) / F.col("p"), 6).alias("gain"),
        R.r(
            (F.col("p_cum") * F.lit(1.0) / F.col("n_cum"))
            / (F.col("p") * F.lit(1.0) / F.col("n")),
            4,
        ).alias("lift"),
    )


# --- average precision (PR-AUC) of the quality classifier -------------------
# The class-imbalance-honest companion to classifier_auc_ranksum.
# Tie handling is explicit: distinct 4dp scores are processed in
# DESCENDING order as atomic steps; step g with tp_g positives at
# cumulative (cumTP_g, cumN_g) contributes (tp_g/P)·(cumTP_g/cumN_g)
# — the step-function convention, exact integer rationals. Each term
# is snapped to an integer 1e-8 unit of tp·precision before the
# order-free sum (≤ 10^4 distinct-score groups, the same bounded
# cumulative window as the AUC query).

_PR_AUC_ORACLE = f"""
WITH {_SCORE_DUCK},
by_score AS (
    SELECT score,
           sum(CASE WHEN pos THEN 1 ELSE 0 END)::BIGINT AS tp,
           count(*)::BIGINT AS n
    FROM scored GROUP BY 1
),
cum AS (
    SELECT score, tp, n,
           sum(tp) OVER (ORDER BY score DESC)::BIGINT AS cum_tp,
           sum(n) OVER (ORDER BY score DESC)::BIGINT AS cum_n
    FROM by_score
),
tot AS (
    SELECT sum(tp)::BIGINT AS p, sum(n - tp)::BIGINT AS neg,
           sum(CAST(round(tp * 100000000.0 * cum_tp / cum_n) AS BIGINT))
               ::BIGINT AS ap_u
    FROM cum
)
SELECT p AS n_pos, neg AS n_neg,
       round(ap_u * 1.0 / 100000000 / p * 1000000) / 1000000 + 0.0
           AS average_precision,
       round(p * 1000000.0 / (p + neg)) / 1000000 + 0.0 AS prevalence
FROM tot
"""


@register("pr_auc_average_precision", oracle=_PR_AUC_ORACLE)
def pr_auc_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _scored(spark, sf_dir)
    by_score = s.groupBy("score").agg(
        F.sum(F.when(F.col("pos"), 1).otherwise(0)).cast("long").alias("tp"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    w = Window.orderBy(F.desc("score")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = by_score.select(
        "tp",
        "n",
        F.sum("tp").over(w).cast("long").alias("cum_tp"),
        F.sum("n").over(w).cast("long").alias("cum_n"),
    )
    tot = cum.agg(
        F.sum("tp").cast("long").alias("p"),
        F.sum(F.col("n") - F.col("tp")).cast("long").alias("neg"),
        F.sum(
            F.round(
                F.col("tp") * F.lit(100000000.0) * F.col("cum_tp")
                / F.col("cum_n")
            ).cast("long")
        ).cast("long").alias("ap_u"),
    )
    return tot.select(
        F.col("p").alias("n_pos"),
        F.col("neg").alias("n_neg"),
        R.r(
            F.col("ap_u") * F.lit(1.0) / 100000000 / F.col("p"), 6
        ).alias("average_precision"),
        R.r(F.col("p") * F.lit(1.0) / (F.col("p") + F.col("neg")), 6)
        .alias("prevalence"),
    )


# --- Murphy decomposition of the Brier score ---------------------------------
# Brier = mean(score − y)² split into reliability − resolution +
# uncertainty over the 10 calibration deciles, plus the within-bin
# variance closing the identity exactly (forecasts inside a bin are
# not constant, so WBV = Brier − (REL − RES + UNC) is the bucketing
# residual). Scores are exact DECIMAL(6,4), so every per-doc (s−y)² is
# an exact 8dp rational summed in DECIMAL; per-bin means are identical
# doubles; the (gap)² terms snap to 1e-12 units before weighting.

_BRIER_ORACLE = f"""
WITH {_SCORE_DUCK},
per AS (
    SELECT least(9, CAST(floor(score * 10) AS BIGINT)) AS bin,
           score, (CASE WHEN pos THEN 1 ELSE 0 END)::BIGINT AS y,
           CAST((score - (CASE WHEN pos THEN 1 ELSE 0 END))
                * (score - (CASE WHEN pos THEN 1 ELSE 0 END))
                AS DECIMAL(12,8)) AS sq
    FROM scored
),
b AS (
    SELECT bin, count(*)::BIGINT AS n, sum(y)::BIGINT AS n_pos,
           (sum(score)::DOUBLE) / count(*) AS mean_s,
           sum(CAST(sq AS DECIMAL(38,8))) AS sum_sq
    FROM per GROUP BY 1
),
tot AS (
    SELECT sum(n)::BIGINT AS nn, sum(n_pos)::BIGINT AS np,
           (sum(sum_sq)::DOUBLE) / sum(n) AS brier
    FROM b
),
terms AS (
    SELECT sum(n * (CAST(round((mean_s - n_pos * 1.0 / n)
                                * (mean_s - n_pos * 1.0 / n)
                                * 1000000000000) AS BIGINT)))::BIGINT
               AS rel_u,
           sum(n * (CAST(round((n_pos * 1.0 / n - tot.np * 1.0 / tot.nn)
                                * (n_pos * 1.0 / n - tot.np * 1.0 / tot.nn)
                                * 1000000000000) AS BIGINT)))::BIGINT
               AS res_u
    FROM b, tot GROUP BY tot.nn, tot.np
)
SELECT tot.nn AS n_docs,
       round(tot.brier * 1000000) / 1000000 + 0.0 AS brier,
       round(terms.rel_u * 1.0 / 1000000000000 / tot.nn * 1000000)
           / 1000000 + 0.0 AS reliability,
       round(terms.res_u * 1.0 / 1000000000000 / tot.nn * 1000000)
           / 1000000 + 0.0 AS resolution,
       round((tot.np * 1.0 / tot.nn) * (1 - tot.np * 1.0 / tot.nn)
             * 1000000) / 1000000 + 0.0 AS uncertainty,
       round((tot.brier - (terms.rel_u * 1.0 / 1000000000000 / tot.nn
                           - terms.res_u * 1.0 / 1000000000000 / tot.nn
                           + (tot.np * 1.0 / tot.nn)
                             * (1 - tot.np * 1.0 / tot.nn)))
             * 1000000) / 1000000 + 0.0 AS within_bin_variance
FROM tot, terms
"""


@register("brier_score_decomposition", oracle=_BRIER_ORACLE)
def brier_score_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _scored(spark, sf_dir)
    y = F.when(F.col("pos"), 1).otherwise(0).cast("long")
    per = s.select(
        F.least(
            F.lit(9), F.floor(F.col("score") * 10).cast("long")
        ).alias("bin"),
        F.col("score"),
        y.alias("y"),
        (
            (F.col("score") - y) * (F.col("score") - y)
        ).cast("decimal(12,8)").alias("sq"),
    )
    b = per.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("n_pos"),
        (F.sum("score").cast("double") / F.count(F.lit(1))).alias("mean_s"),
        F.sum(F.col("sq").cast("decimal(38,8)")).alias("sum_sq"),
    )
    tot = b.agg(
        F.sum("n").cast("long").alias("nn"),
        F.sum("n_pos").cast("long").alias("np"),
        (F.sum("sum_sq").cast("double") / F.sum("n")).alias("brier"),
    )
    u12 = F.lit(1000000000000.0)
    obar_k = F.col("n_pos") * F.lit(1.0) / F.col("n")
    obar = F.col("np") * F.lit(1.0) / F.col("nn")
    terms = b.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            F.col("n")
            * F.round(
                (F.col("mean_s") - obar_k) * (F.col("mean_s") - obar_k)
                * u12
            ).cast("long")
        ).cast("long").alias("rel_u"),
        F.sum(
            F.col("n")
            * F.round((obar_k - obar) * (obar_k - obar) * u12).cast("long")
        ).cast("long").alias("res_u"),
    )
    rel = F.col("rel_u") * F.lit(1.0) / u12 / F.col("nn")
    res = F.col("res_u") * F.lit(1.0) / u12 / F.col("nn")
    unc = obar * (1 - obar)
    return tot.crossJoin(F.broadcast(terms)).select(
        F.col("nn").alias("n_docs"),
        R.r(F.col("brier"), 6).alias("brier"),
        R.r(rel, 6).alias("reliability"),
        R.r(res, 6).alias("resolution"),
        R.r(unc, 6).alias("uncertainty"),
        R.r(F.col("brier") - (rel - res + unc), 6)
        .alias("within_bin_variance"),
    )


# --- Youden J optimal threshold ----------------------------------------------
# The operating-point selection after AUC: over the distinct-score
# grid, maximize J = TPR − FPR with TPR/FPR from exact descending
# cumulative counts; argmax on 1e-8-unit integer J with a
# smallest-threshold tie-break.

_YOUDEN_ORACLE = f"""
WITH {_SCORE_DUCK},
by_score AS (
    SELECT score,
           sum(CASE WHEN pos THEN 1 ELSE 0 END)::BIGINT AS tp,
           sum(CASE WHEN pos THEN 0 ELSE 1 END)::BIGINT AS fp
    FROM scored GROUP BY 1
),
cum AS (
    SELECT score,
           sum(tp) OVER (ORDER BY score DESC)::BIGINT AS cum_tp,
           sum(fp) OVER (ORDER BY score DESC)::BIGINT AS cum_fp
    FROM by_score
),
tot AS (SELECT sum(tp)::BIGINT AS p, sum(fp)::BIGINT AS n FROM by_score),
j AS (
    SELECT score, cum_tp, cum_fp,
           CAST(round((cum_tp * 1.0 / tot.p - cum_fp * 1.0 / tot.n)
                      * 100000000) AS BIGINT) AS j_u
    FROM cum, tot
),
best AS (SELECT * FROM j ORDER BY j_u DESC, score LIMIT 1)
SELECT best.score::DOUBLE + 0.0 AS threshold,
       round(best.cum_tp * 1.0 / tot.p * 1000000) / 1000000 + 0.0 AS tpr,
       round(best.cum_fp * 1.0 / tot.n * 1000000) / 1000000 + 0.0 AS fpr,
       round(best.j_u * 1.0 / 100000000 * 1000000) / 1000000 + 0.0
           AS youden_j
FROM best, tot
"""


@register("youden_j_threshold", oracle=_YOUDEN_ORACLE)
def youden_j_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _scored(spark, sf_dir)
    by_score = s.groupBy("score").agg(
        F.sum(F.when(F.col("pos"), 1).otherwise(0)).cast("long").alias("tp"),
        F.sum(F.when(F.col("pos"), 0).otherwise(1)).cast("long").alias("fp"),
    )
    w = Window.orderBy(F.desc("score")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = by_score.select(
        "score",
        F.sum("tp").over(w).cast("long").alias("cum_tp"),
        F.sum("fp").over(w).cast("long").alias("cum_fp"),
    )
    tot = by_score.agg(
        F.sum("tp").cast("long").alias("p"),
        F.sum("fp").cast("long").alias("n"),
    )
    j = cum.crossJoin(F.broadcast(tot)).select(
        "score",
        "cum_tp",
        "cum_fp",
        "p",
        "n",
        F.round(
            (
                F.col("cum_tp") * F.lit(1.0) / F.col("p")
                - F.col("cum_fp") * F.lit(1.0) / F.col("n")
            )
            * F.lit(100000000)
        )
        .cast("long")
        .alias("j_u"),
    )
    best = j.orderBy(F.desc("j_u"), F.asc("score")).limit(1)
    return best.select(
        (F.col("score").cast("double") + F.lit(0.0)).alias("threshold"),
        R.r(F.col("cum_tp") * F.lit(1.0) / F.col("p"), 6).alias("tpr"),
        R.r(F.col("cum_fp") * F.lit(1.0) / F.col("n"), 6).alias("fpr"),
        R.r(F.col("j_u") * F.lit(1.0) / 100000000, 6).alias("youden_j"),
    )
