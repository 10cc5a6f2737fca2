"""Data-quality audit pack: label-noise detection, cluster-quality
scoring, and a forensic digit-distribution audit — the checks a
labeled-corpus pipeline runs before trusting its labels, its
clustering, and its numeric columns.

* ``knn_label_agreement`` — per-label k-NN label-agreement rate: for
  every vector, the share of its 10 nearest LSH-bucket neighbours
  that carry the SAME label. Low agreement for a label = label noise
  or genuinely overlapping classes; the standard cheap proxy for
  kNN-based label-error detection (Confident Learning's simplest
  ancestor). Candidates are bucket-local (the corpus-scaled
  `lsh_tagged_capped` machinery shared with `hard_negative_mining`),
  so pair volume is Σ bucket² — never corpus².
* ``embedding_silhouette_audit`` — simplified (centroid) silhouette
  per label: a = distance to own-label centroid, b = nearest
  other-label centroid, s = (b−a)/max(a,b), averaged per label. THE
  cluster-cohesion number for an IVF/SemDeDup partition before
  trusting it at scale. One corpus-wide (vec, label-centroid)
  distance aggregate — |labels| centroids, decimal-exact sums, no
  pairwise vector math.
* ``benford_digit_audit`` — leading-digit distribution of order
  totals vs Benford's law with a χ² distance. The classic fraud /
  synthetic-data forensic: one map-side-combined 9-group aggregate
  however many orders exist.

Scale posture: every query's reduce state is bounded (10 neighbours/
anchor inside capped buckets; |labels| centroids; 9 digits); averages
are decimal-term sums (order-independent, CLAUDE.md gotcha 2 class)
and every cross-engine transcendental (log10, sqrt-of-exact-decimal)
is snapped to decimal before it enters a sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from swat_mapreduce_spark.functions import arrays as A
from swat_mapreduce_spark.functions import hashing as H
from swat_mapreduce_spark.functions import rounding as R
from swat_mapreduce_spark.operators import similarity as S
from swat_mapreduce_spark.queries import register
from swat_mapreduce_spark.queries.similarity import _DIMS_DUCK
from swat_mapreduce_spark.sources.readers import read_table

_KNN_K = 10

# --- kNN label agreement ---------------------------------------------------
_KNN_AGREE_ORACLE = f"""
WITH {_DIMS_DUCK},
{S.duck_lsh_planes()},
{S.duck_lsh_capped_buckets()},
pairs AS (
    SELECT a.vec_id AS anchor, ea.label AS anchor_label,
           b.vec_id AS cand, eb.label AS cand_label
    FROM capped a JOIN capped b
      ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
    JOIN embeddings ea ON ea.vec_id = a.vec_id
    JOIN embeddings eb ON eb.vec_id = b.vec_id
),
scored AS (
    SELECT p.anchor, p.anchor_label, p.cand, p.cand_label,
           round(sum(da.x * db.x) / (sqrt(sum(da.x * da.x))
                 * sqrt(sum(db.x * db.x))) * 10000) / 10000 + 0.0 AS c
    FROM pairs p
    JOIN dims da ON da.vec_id = p.anchor
    JOIN dims db ON db.vec_id = p.cand AND db.i = da.i
    GROUP BY p.anchor, p.anchor_label, p.cand, p.cand_label
),
knn AS (
    SELECT anchor, anchor_label, cand_label
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY anchor
                               ORDER BY c DESC, cand) <= {_KNN_K}
),
per_anchor AS (
    SELECT anchor, anchor_label,
           count(*)::BIGINT AS n_nb,
           sum(CASE WHEN cand_label = anchor_label THEN 1 ELSE 0 END)::BIGINT
               AS n_same,
           CAST(sum(CASE WHEN cand_label = anchor_label THEN 1 ELSE 0
                    END)::DOUBLE / count(*) AS DECIMAL(30,8)) AS share
    FROM knn GROUP BY anchor, anchor_label
)
SELECT anchor_label AS label,
       count(*)::BIGINT AS n_anchors,
       sum(n_same)::BIGINT AS n_same,
       sum(n_nb)::BIGINT AS n_neighbors,
       round(sum(share)::DOUBLE / count(*), 4) AS avg_agreement
FROM per_anchor
GROUP BY anchor_label
"""


@register("knn_label_agreement", oracle=_KNN_AGREE_ORACLE)
def knn_label_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label average k-NN (k=10) label-agreement share within LSH
    buckets. The pair join, cosine, and per-anchor top-k mirror
    `hard_negative_mining` (bucket-bounded windows); per-anchor
    agreement shares are snapped to DECIMAL(30,8) before the per-label
    mean so the rollup is accumulation-order-free. Anchors in
    cap-dropped or singleton buckets contribute no row — same recall
    contract as every LSH op here."""
    emb = read_table(spark, sf_dir, "embeddings")
    tagged = S.lsh_tagged_capped(emb)  # persisted; self-joined below
    a = tagged.select(
        F.col("vec_id").alias("anchor"),
        F.col("label").alias("anchor_label"),
        F.col("v").alias("av"),
        F.col("nv").alias("an"),
        "bucket",
    )
    b = tagged.select(
        F.col("vec_id").alias("cand"),
        F.col("label").alias("cand_label"),
        F.col("v").alias("bv"),
        F.col("nv").alias("bn"),
        F.col("bucket").alias("bucket_b"),
    )
    pairs = a.join(
        b,
        (F.col("bucket") == F.col("bucket_b"))
        & (F.col("anchor") != F.col("cand")),
    )
    # cosine_pre: norms ride the persisted tagged projection (r13,
    # guide §1.2) — bit-identical to the per-pair cosine
    scored = pairs.select(
        "anchor",
        "anchor_label",
        "cand",
        "cand_label",
        R.r(
            A.cosine_pre(
                F.col("av"), F.col("bv"), F.col("an"), F.col("bn")
            ),
            4,
        ).alias("c"),
    )
    w = Window.partitionBy("anchor").orderBy(F.desc("c"), F.asc("cand"))
    knn = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _KNN_K)
        .select("anchor", "anchor_label", "cand_label")
    )
    agree = (F.col("cand_label") == F.col("anchor_label")).cast("int")
    per_anchor = knn.groupBy("anchor", "anchor_label").agg(
        F.count(F.lit(1)).alias("n_nb"),
        F.sum(agree).alias("n_same"),
        (F.sum(agree) / F.count(F.lit(1)))
        .cast("decimal(30,8)")
        .alias("share"),
    )
    return per_anchor.groupBy(F.col("anchor_label").alias("label")).agg(
        F.count(F.lit(1)).alias("n_anchors"),
        F.sum("n_same").alias("n_same"),
        F.sum("n_nb").alias("n_neighbors"),
        R.r(F.sum("share").cast("double") / F.count(F.lit(1)), 4).alias(
            "avg_agreement"
        ),
    )


# --- simplified (centroid) silhouette --------------------------------------
# Distances are sqrt of DECIMAL-exact squared-L2 sums — both engines
# take sqrt of the SAME exact decimal, so every distance double is
# bit-identical; min/argmin over them cannot diverge. The per-label
# silhouette mean uses decimal terms.
_SILHOUETTE_ORACLE = f"""
WITH {_DIMS_DUCK},
cent AS (
    SELECT e.label, d.i,
           sum(CAST(d.x AS DECIMAL(30,8)))::DOUBLE / count(*) AS m
    FROM dims d JOIN embeddings e ON e.vec_id = d.vec_id
    GROUP BY e.label, d.i
),
d2 AS (
    SELECT d.vec_id, c.label,
           sum(CAST((d.x - c.m) * (d.x - c.m) AS DECIMAL(30,8))) AS dd
    FROM dims d JOIN cent c ON c.i = d.i
    GROUP BY d.vec_id, c.label
),
ab AS (
    SELECT d2.vec_id, e.label,
           sqrt(min(CASE WHEN d2.label = e.label THEN dd END)::DOUBLE) AS a,
           sqrt(min(CASE WHEN d2.label <> e.label THEN dd END)::DOUBLE) AS b
    FROM d2 JOIN embeddings e ON e.vec_id = d2.vec_id
    GROUP BY d2.vec_id, e.label
),
sil AS (
    SELECT label,
           CAST((b - a) / greatest(a, b) AS DECIMAL(30,8)) AS s,
           CAST(a AS DECIMAL(30,8)) AS ad,
           CAST(b AS DECIMAL(30,8)) AS bd
    FROM ab
)
SELECT label,
       count(*)::BIGINT AS n_vectors,
       round(sum(s)::DOUBLE / count(*), 4) AS avg_silhouette,
       round(sum(ad)::DOUBLE / count(*), 4) AS avg_dist_own,
       round(sum(bd)::DOUBLE / count(*), 4) AS avg_dist_other
FROM sil
GROUP BY label
"""


@register("embedding_silhouette_audit", oracle=_SILHOUETTE_ORACLE)
def embedding_silhouette_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified silhouette per label over the |labels| centroids:
    one (vec × centroid) distance aggregate (corpus dims × |labels|
    rows into |vecs|·|labels| decimal groups — map-side combined),
    then a per-vector own-vs-nearest-other reduction and a per-label
    decimal-term mean. No pairwise vector math anywhere."""
    emb = read_table(spark, sf_dir, "embeddings")
    dec = "decimal(30,8)"
    dims = emb.select(
        "vec_id",
        F.col("label").alias("own"),
        F.posexplode(A.as_double_array(F.col("embedding"))).alias("i", "x"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # dims feeds the centroid build AND the distance aggregate —
    # persisted so the corpus is scanned once
    cent = (
        dims.groupBy(F.col("own").alias("clabel"), "i")
        .agg(
            (
                F.sum(F.col("x").cast(dec)).cast("double")
                / F.count(F.lit(1))
            ).alias("m")
        )
    )
    d2 = (
        dims.join(F.broadcast(cent), "i")
        .groupBy("vec_id", "own", "clabel")
        .agg(
            F.sum(
                ((F.col("x") - F.col("m")) * (F.col("x") - F.col("m"))).cast(
                    dec
                )
            ).alias("dd")
        )
    )
    ab = d2.groupBy("vec_id", F.col("own").alias("label")).agg(
        F.sqrt(
            F.min(F.when(F.col("clabel") == F.col("own"), F.col("dd")))
            .cast("double")
        ).alias("a"),
        F.sqrt(
            F.min(F.when(F.col("clabel") != F.col("own"), F.col("dd")))
            .cast("double")
        ).alias("b"),
    )
    sil = ab.select(
        "label",
        ((F.col("b") - F.col("a")) / F.greatest("a", "b"))
        .cast(dec)
        .alias("s"),
        F.col("a").cast(dec).alias("ad"),
        F.col("b").cast(dec).alias("bd"),
    )
    return sil.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        R.r(F.sum("s").cast("double") / F.count(F.lit(1)), 4).alias(
            "avg_silhouette"
        ),
        R.r(F.sum("ad").cast("double") / F.count(F.lit(1)), 4).alias(
            "avg_dist_own"
        ),
        R.r(F.sum("bd").cast("double") / F.count(F.lit(1)), 4).alias(
            "avg_dist_other"
        ),
    )


# --- Benford leading-digit audit -------------------------------------------
# Expected share log10(1 + 1/d) is snapped to DECIMAL(10,6) on both
# engines (cross-libm log10 can differ in the last ulp); χ² terms are
# computed in double FROM that snapped decimal and exact integer
# counts — bit-identical inputs, bit-identical terms — then summed as
# DECIMAL(30,8). χ² uses the count form Σ (obs − N·p)² / (N·p).
_BENFORD_ORACLE = """
WITH digits AS (SELECT unnest(generate_series(1, 9)) AS digit),
obs AS (
    SELECT substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                  1, 1)::BIGINT AS digit,
           count(*)::BIGINT AS n
    FROM orders GROUP BY 1
),
tot AS (SELECT sum(n)::BIGINT AS t FROM obs),
g AS (
    SELECT d.digit, coalesce(obs.n, 0) AS n, tot.t,
           CAST(round(log10(1 + 1.0 / d.digit), 6) AS DECIMAL(10,6)) AS p
    FROM digits d LEFT JOIN obs ON obs.digit = d.digit, tot
),
terms AS (
    SELECT digit, n, t, p,
           CAST((n - t * p::DOUBLE) * (n - t * p::DOUBLE)
                / (t * p::DOUBLE) AS DECIMAL(30,8)) AS term
    FROM g
)
SELECT digit, n AS n_orders,
       round(n::DOUBLE / t, 6) AS obs_share,
       p::DOUBLE AS benford_share,
       round((SELECT sum(term) FROM terms)::DOUBLE, 4) AS chi2
FROM terms
"""


@register("benford_digit_audit", oracle=_BENFORD_ORACLE)
def benford_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law forensic over order totals: leading-digit counts
    (one 9-group map-side-combined aggregate over however many
    orders), observed vs log10(1+1/d) expected share, and the χ²
    distance repeated on each of the 9 report rows."""
    orders = read_table(spark, sf_dir, "orders")
    obs = (
        orders.select(
            F.substring(
                F.floor(F.col("o_totalprice")).cast("bigint").cast("string"),
                1,
                1,
            )
            .cast("bigint")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # obs is 9 rows but feeds the total AND the report join — without
    # the persist each consumer re-scans the orders table
    tot = obs.agg(F.sum("n").alias("t"))
    digits = spark.range(1, 10).select(F.col("id").alias("digit"))
    g = (
        digits.join(F.broadcast(obs), "digit", "left")
        .join(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce("n", F.lit(0)).alias("n"),
            "t",
            R.r(F.log10(1 + 1.0 / F.col("digit")), 6)
            .cast("decimal(10,6)")
            .alias("p"),
        )
    )
    pd_ = F.col("p").cast("double")
    terms = g.select(
        "digit",
        "n",
        "t",
        "p",
        (
            (F.col("n") - F.col("t") * pd_)
            * (F.col("n") - F.col("t") * pd_)
            / (F.col("t") * pd_)
        )
        .cast("decimal(30,8)")
        .alias("term"),
    )
    chi2 = terms.agg(F.sum("term").alias("c2"))
    return terms.join(F.broadcast(chi2)).select(
        "digit",
        F.col("n").alias("n_orders"),
        R.r(F.col("n") / F.col("t"), 6).alias("obs_share"),
        pd_.alias("benford_share"),
        R.r(F.col("c2").cast("double"), 4).alias("chi2"),
    )


# --- Kolmogorov-Smirnov two-sample drift test -------------------------------
# Exact two-sample KS over document lengths between two sources: the
# distribution-drift significance test behind "did this ingest batch
# change shape?". D = max |F1 - F2| is computed as an INTEGER max
# (|cum1*n2 - cum2*n1|, DECIMAL(38,0)-safe at corpus scale) divided
# once at the end; the alpha=0.05 critical value c(alpha)=1.358 uses
# the large-sample approximation. The ECDF window is partition-less
# but bounded by the distinct-length domain (census allowlist).
_KS_SRC_A, _KS_SRC_B = "src0", "src1"

_KS_ORACLE = f"""
WITH v AS (
    SELECT n_chars AS val,
           sum(CASE WHEN source = '{_KS_SRC_A}' THEN 1 ELSE 0 END)::BIGINT
               AS c1,
           sum(CASE WHEN source = '{_KS_SRC_B}' THEN 1 ELSE 0 END)::BIGINT
               AS c2
    FROM documents WHERE source IN ('{_KS_SRC_A}', '{_KS_SRC_B}')
    GROUP BY 1
),
c AS (
    SELECT sum(c1) OVER w AS f1, sum(c2) OVER w AS f2
    FROM v
    WINDOW w AS (ORDER BY val
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
t AS (SELECT sum(c1)::BIGINT AS n1, sum(c2)::BIGINT AS n2 FROM v),
d AS (
    SELECT max(abs(CAST(c.f1 AS DECIMAL(18,0)) * t.n2
                   - CAST(c.f2 AS DECIMAL(18,0)) * t.n1)) AS dn
    FROM c, t
)
SELECT t.n1, t.n2,
       round(d.dn::DOUBLE / (1.0 * t.n1 * t.n2) * 1000000) / 1000000 + 0.0
           AS ks_stat,
       round(1.358 * sqrt((t.n1 + t.n2) * 1.0 / (1.0 * t.n1 * t.n2))
             * 1000000) / 1000000 + 0.0 AS ks_crit,
       (round(d.dn::DOUBLE / (1.0 * t.n1 * t.n2) * 1000000) / 1000000
        > round(1.358 * sqrt((t.n1 + t.n2) * 1.0 / (1.0 * t.n1 * t.n2))
                * 1000000) / 1000000) AS reject
FROM t, d
"""


@register("ks_two_sample_lengths", oracle=_KS_ORACLE)
def ks_two_sample_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample KS statistic: one map-side-combined count per
    distinct length, a cumulative window over the bounded length
    domain, and an integer max — no floats until the final division.
    reject compares the two ROUNDED doubles so the boundary cannot
    diverge cross-engine."""
    docs = read_table(spark, sf_dir, "documents").filter(
        F.col("source").isin(_KS_SRC_A, _KS_SRC_B)
    )
    v = docs.groupBy(F.col("n_chars").alias("val")).agg(
        F.sum(F.when(F.col("source") == _KS_SRC_A, 1).otherwise(0)).alias(
            "c1"
        ),
        F.sum(F.when(F.col("source") == _KS_SRC_B, 1).otherwise(0)).alias(
            "c2"
        ),
    )
    w = Window.orderBy("val").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = v.select(
        F.sum("c1").over(w).alias("f1"), F.sum("c2").over(w).alias("f2")
    )
    t = v.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    d = c.crossJoin(F.broadcast(t)).agg(
        F.max(
            F.abs(
                F.col("f1").cast("decimal(18,0)") * F.col("n2")
                - F.col("f2").cast("decimal(18,0)") * F.col("n1")
            )
        ).alias("dn")
    )
    ks = R.r(
        F.col("dn").cast("double") / (1.0 * F.col("n1") * F.col("n2")), 6
    )
    crit = R.r(
        1.358
        * F.sqrt((F.col("n1") + F.col("n2")) * 1.0 / (1.0 * F.col("n1") * F.col("n2"))),
        6,
    )
    return t.crossJoin(F.broadcast(d)).select(
        "n1",
        "n2",
        ks.alias("ks_stat"),
        crit.alias("ks_crit"),
        (ks > crit).alias("reject"),
    )


# --- leave-one-out target encoding ------------------------------------------
# The leakage-safe categorical encoder: replace each row's category
# with the mean label over OTHER rows of that category,
# (sum_cat − own) / (n_cat − 1) — plain target encoding leaks the
# row's own label into its feature; LOO is the standard fix. Label =
# (lang = 'en'), category = source. One groupBy + a broadcast join
# back; integer sums, one division per row, singleton categories get
# NULL (no peers to average).
_TE_ORACLE = """
WITH lab AS (
    SELECT doc_id, source,
           CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
    FROM documents
),
agg AS (
    SELECT source, sum(y)::BIGINT AS s, count(*)::BIGINT AS n
    FROM lab GROUP BY source
)
SELECT l.doc_id, l.source, l.y::BIGINT AS y,
       CASE WHEN a.n > 1
            THEN round((a.s - l.y) * 1.0 / (a.n - 1) * 10000) / 10000 + 0.0
            END AS te_loo,
       round(a.s * 1.0 / a.n * 10000) / 10000 + 0.0 AS te_naive
FROM lab l JOIN agg a USING (source)
"""


@register("target_encode_loo", oracle=_TE_ORACLE)
def target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    agg = docs.groupBy("source").agg(
        F.sum("y").alias("s"), F.count(F.lit(1)).alias("n")
    )
    j = docs.join(F.broadcast(agg), "source")
    return j.select(
        "doc_id",
        "source",
        F.col("y").cast("long").alias("y"),
        F.when(
            F.col("n") > 1,
            R.r((F.col("s") - F.col("y")) * 1.0 / (F.col("n") - 1), 4),
        ).alias("te_loo"),
        R.r(F.col("s") * 1.0 / F.col("n"), 4).alias("te_naive"),
    )


# --- inverse-propensity-weighted sample estimation ---------------------------
# Survey-style estimation under stratified sampling: each source is
# hash-sampled at its OWN deterministic rate (functions/hashing md5
# unit — reproducible, oracle-mirrored), and corpus totals are
# estimated from the sample with inverse-propensity weights 1/rate.
# The audit compares the IPW estimate to the exact total per lang —
# the correctness check a 100 TB pipeline runs before trusting
# sampled statistics. Rates differ by source parity so the weighting
# is non-trivial.
_IPW_RATE_EVEN, _IPW_RATE_ODD = 0.5, 0.25

_IPW_ORACLE = f"""
WITH d AS (
    SELECT doc_id, lang, source, n_chars,
           CASE WHEN CAST(substr(source, 4) AS BIGINT) % 2 = 0
                THEN {_IPW_RATE_EVEN} ELSE {_IPW_RATE_ODD} END AS rate,
           {H.duck_hash_uint("doc_id || ':ipw'")} / 4294967296.0 AS u
    FROM documents
),
samp AS (SELECT * FROM d WHERE u < rate),
est AS (
    SELECT lang,
           count(*)::BIGINT AS n_sampled,
           CAST(round(sum(CAST(1.0 / rate AS DECIMAL(20,10)))::DOUBLE)
                AS BIGINT) AS est_docs,
           CAST(round(sum(CAST(n_chars / rate AS DECIMAL(24,10)))::DOUBLE)
                AS BIGINT) AS est_chars
    FROM samp GROUP BY lang
),
exact AS (
    SELECT lang, count(*)::BIGINT AS true_docs,
           sum(n_chars)::BIGINT AS true_chars
    FROM d GROUP BY lang
)
SELECT e.lang, e.n_sampled, e.est_docs, x.true_docs,
       e.est_chars, x.true_chars,
       round(abs(e.est_docs - x.true_docs) * 1.0 / x.true_docs * 10000)
           / 10000 + 0.0 AS doc_rel_err
FROM est e JOIN exact x USING (lang)
"""


@register("ipw_sample_estimate", oracle=_IPW_ORACLE)
def ipw_sample_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    rate = F.when(
        F.substring("source", 4, 10).cast("long") % 2 == 0,
        F.lit(_IPW_RATE_EVEN),
    ).otherwise(F.lit(_IPW_RATE_ODD))
    u = H.hash_uint(
        F.concat(F.col("doc_id").cast("string"), F.lit(":ipw"))
    ) / float(16**8)
    d = docs.select("doc_id", "lang", "n_chars", rate.alias("rate"), u.alias("u"))
    samp = d.filter(F.col("u") < F.col("rate"))
    est = samp.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.round(
            F.sum((1.0 / F.col("rate")).cast("decimal(20,10)")).cast(
                "double"
            )
        )
        .cast("long")
        .alias("est_docs"),
        F.round(
            F.sum(
                (F.col("n_chars") / F.col("rate")).cast("decimal(24,10)")
            ).cast("double")
        )
        .cast("long")
        .alias("est_chars"),
    )
    exact = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("true_docs"),
        F.sum("n_chars").alias("true_chars"),
    )
    return est.join(exact, "lang").select(
        "lang",
        "n_sampled",
        "est_docs",
        "true_docs",
        "est_chars",
        "true_chars",
        R.r(
            F.abs(F.col("est_docs") - F.col("true_docs"))
            * 1.0
            / F.col("true_docs"),
            4,
        ).alias("doc_rel_err"),
    )


# --- quantile normalization across sources ----------------------------------
# The microarray/ML preprocessing classic: make every source's length
# distribution comparable by mapping each document onto the POOLED
# distribution at the same quantile. Exact integer construction:
# per-source mid-CDF deciles d = ⌊10·(2·cum_lt + cnt) / (2·n_s)⌋ from
# per-(source, value) counts (windows PARTITIONED by source), pooled
# mid-decile reference values from integer thresholds
# t_d = ⌈(2d+1)·N/20⌉ against the pooled cumulative (ONE
# partition-less window over the bounded length domain — census
# allowlist). Output is the bounded (source × decile) mapping table.
_QNORM_ORACLE = """
WITH v AS (
    SELECT source, n_chars AS val, count(*)::BIGINT AS cnt
    FROM documents GROUP BY source, n_chars
),
sn AS (SELECT source, sum(cnt)::BIGINT AS n_s FROM v GROUP BY source),
sc AS (
    SELECT source, val, cnt,
           coalesce(sum(cnt) OVER (PARTITION BY source ORDER BY val
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_lt
    FROM v
),
sd AS (
    SELECT sc.source, sc.val, sc.cnt,
           least(9, (10 * (2 * sc.cum_lt + sc.cnt)) // (2 * sn.n_s))
               AS dec
    FROM sc JOIN sn USING (source)
),
pv AS (SELECT val, sum(cnt)::BIGINT AS cnt FROM v GROUP BY val),
pc AS (
    SELECT val,
           sum(cnt) OVER (ORDER BY val
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
    FROM pv
),
nn AS (SELECT sum(cnt)::BIGINT AS n FROM pv),
bounds AS (
    SELECT d.d, min(pc.val) AS ref_val
    FROM (SELECT unnest(generate_series(0, 9)) AS d) d, nn, pc
    WHERE pc.cum >= ((2 * d.d + 1) * nn.n + 19) // 20
    GROUP BY d.d
)
SELECT sd.source, sd.dec::BIGINT AS decile,
       sum(sd.cnt)::BIGINT AS n_docs,
       round(sum(sd.val * sd.cnt) * 1.0 / sum(sd.cnt) * 100) / 100 + 0.0
           AS mean_raw,
       b.ref_val::BIGINT AS norm_value
FROM sd JOIN bounds b ON b.d = sd.dec
GROUP BY sd.source, sd.dec, b.ref_val
"""


@register("quantile_normalize_sources", oracle=_QNORM_ORACLE)
def quantile_normalize_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    v = docs.groupBy(
        "source", F.col("n_chars").alias("val")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    sn = v.groupBy("source").agg(F.sum("cnt").alias("n_s"))
    ws = (
        Window.partitionBy("source")
        .orderBy("val")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sc_ = v.withColumn(
        "cum_lt", F.coalesce(F.sum("cnt").over(ws), F.lit(0))
    )
    sd = sc_.join(sn, "source").select(
        "source",
        "val",
        "cnt",
        F.least(
            F.lit(9),
            F.floor(
                (10 * (2 * F.col("cum_lt") + F.col("cnt")))
                / (2 * F.col("n_s"))
            ),
        ).alias("dec"),
    )
    pv = v.groupBy("val").agg(F.sum("cnt").alias("cnt"))
    wp = Window.orderBy("val").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pc = pv.withColumn("cum", F.sum("cnt").over(wp))
    nn = pv.agg(F.sum("cnt").alias("n"))
    ds = nn.select(
        F.explode(F.sequence(F.lit(0), F.lit(9))).alias("d"), "n"
    )
    bounds = (
        ds.join(
            pc,
            F.col("cum")
            >= F.floor(((2 * F.col("d") + 1) * F.col("n") + 19) / 20),
        )
        .groupBy("d")
        .agg(F.min("val").alias("ref_val"))
    )
    return (
        sd.join(F.broadcast(bounds), sd.dec == bounds.d)
        .groupBy("source", "dec", "ref_val")
        .agg(
            F.sum("cnt").alias("n_docs"),
            R.r(
                F.sum(F.col("val") * F.col("cnt")) * 1.0 / F.sum("cnt"), 2
            ).alias("mean_raw"),
        )
        .select(
            "source",
            F.col("dec").cast("long").alias("decile"),
            "n_docs",
            "mean_raw",
            F.col("ref_val").cast("long").alias("norm_value"),
        )
    )


# --- Wilson score confidence intervals ---------------------------------------
# The correct small-n interval for a proportion (never escapes [0,1],
# unlike the naive normal interval): per-source English rate with the
# 95% Wilson bounds. Closed-form arithmetic over exact integer counts
# with z = 1.96 as an exact literal — both engines compute identical
# doubles; bounds snap to 6dp.
_WILSON_Z = 1.96

_WILSON_ORACLE = f"""
WITH a AS (
    SELECT source, count(*)::BIGINT AS n,
           sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS k
    FROM documents GROUP BY source
)
SELECT source, n, k,
       round(k * 1.0 / n * 10000) / 10000 + 0.0 AS rate,
       round((k * 1.0 / n + {_WILSON_Z} * {_WILSON_Z} / (2.0 * n)
              - {_WILSON_Z} * sqrt((k * 1.0 / n) * (1.0 - k * 1.0 / n) / n
                    + {_WILSON_Z} * {_WILSON_Z} / (4.0 * n * n)))
             / (1.0 + {_WILSON_Z} * {_WILSON_Z} / n) * 1000000) / 1000000
           + 0.0 AS wilson_lo,
       round((k * 1.0 / n + {_WILSON_Z} * {_WILSON_Z} / (2.0 * n)
              + {_WILSON_Z} * sqrt((k * 1.0 / n) * (1.0 - k * 1.0 / n) / n
                    + {_WILSON_Z} * {_WILSON_Z} / (4.0 * n * n)))
             / (1.0 + {_WILSON_Z} * {_WILSON_Z} / n) * 1000000) / 1000000
           + 0.0 AS wilson_hi
FROM a
"""


@register("wilson_interval_rates", oracle=_WILSON_ORACLE)
def wilson_interval_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    a = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("k"),
    )
    z = _WILSON_Z
    p = F.col("k") * 1.0 / F.col("n")
    half = z * F.sqrt(
        p * (1.0 - p) / F.col("n") + z * z / (4.0 * F.col("n") * F.col("n"))
    )
    center = p + z * z / (2.0 * F.col("n"))
    denom = 1.0 + z * z / F.col("n")
    return a.select(
        "source",
        "n",
        "k",
        R.r(p, 4).alias("rate"),
        R.r((center - half) / denom, 6).alias("wilson_lo"),
        R.r((center + half) / denom, 6).alias("wilson_hi"),
    )


# --- chi-square test of independence + Cramér's V ----------------------------
# Is language distribution independent of source? The contingency-table
# chi-square: expected(l,s) = row_total·col_total/N, χ² = Σ (obs−exp)²
# /exp over the |langs|×|sources| grid (bounded), with Cramér's
# V = sqrt(χ²/(N·min(r−1,c−1))) as the effect size. Expected counts
# are exact rationals computed as identical doubles (integer inputs);
# each χ² term snaps to DECIMAL(30,8) before the sum. One
# map-side-combined corpus aggregate; everything after is grid-sized.
_CHI2_ORACLE = """
WITH cells AS (
    SELECT lang, source, count(*)::BIGINT AS o
    FROM documents GROUP BY lang, source
),
rows_ AS (SELECT lang, sum(o)::BIGINT AS rl FROM cells GROUP BY lang),
cols_ AS (SELECT source, sum(o)::BIGINT AS cs FROM cells GROUP BY source),
nn AS (SELECT sum(o)::BIGINT AS n FROM cells),
grid AS (
    -- the FULL r x c grid: an absent (lang, source) cell still
    -- contributes its expected count to the statistic
    SELECT r.lang, l.source, r.rl, l.cs, coalesce(c.o, 0) AS o
    FROM rows_ r CROSS JOIN cols_ l
    LEFT JOIN cells c ON c.lang = r.lang AND c.source = l.source
),
terms AS (
    SELECT g.lang, g.source,
           CAST((g.o - g.rl * 1.0 * g.cs / nn.n)
                * (g.o - g.rl * 1.0 * g.cs / nn.n)
                / (g.rl * 1.0 * g.cs / nn.n) AS DECIMAL(30,8)) AS t
    FROM grid g CROSS JOIN nn
),
dims_ AS (
    SELECT (SELECT count(*) FROM rows_)::BIGINT AS r,
           (SELECT count(*) FROM cols_)::BIGINT AS c
)
SELECT round(sum(terms.t)::DOUBLE * 10000) / 10000 + 0.0 AS chi2,
       ((d.r - 1) * (d.c - 1))::BIGINT AS dof,
       nn.n AS n_docs,
       round(sqrt(sum(terms.t)::DOUBLE
                  / (nn.n * least(d.r - 1, d.c - 1))) * 10000) / 10000
           + 0.0 AS cramers_v
FROM terms, dims_ d, nn
GROUP BY d.r, d.c, nn.n
"""


@register("chi2_independence_lang_source", oracle=_CHI2_ORACLE)
def chi2_independence_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    cells = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("o")
    )
    rows_ = cells.groupBy("lang").agg(F.sum("o").alias("rl"))
    cols_ = cells.groupBy("source").agg(F.sum("o").alias("cs"))
    nn = cells.agg(F.sum("o").alias("n"))
    exp = F.col("rl") * 1.0 * F.col("cs") / F.col("n")
    # full r x c grid: absent cells still contribute their expected
    # count to the statistic
    grid = (
        rows_.crossJoin(cols_)
        .join(cells, ["lang", "source"], "left")
        .withColumn("o", F.coalesce(F.col("o"), F.lit(0)))
    )
    terms = grid.crossJoin(F.broadcast(nn)).select(
        ((F.col("o") - exp) * (F.col("o") - exp) / exp)
        .cast("decimal(30,8)")
        .alias("t"),
        "n",
    )
    dims_ = rows_.agg(F.count(F.lit(1)).alias("r")).crossJoin(
        cols_.agg(F.count(F.lit(1)).alias("c"))
    )
    agg = terms.groupBy("n").agg(F.sum("t").alias("chi2d"))
    return agg.crossJoin(F.broadcast(dims_)).select(
        R.r(F.col("chi2d").cast("double"), 4).alias("chi2"),
        ((F.col("r") - 1) * (F.col("c") - 1)).alias("dof"),
        F.col("n").alias("n_docs"),
        R.r(
            F.sqrt(
                F.col("chi2d").cast("double")
                / (F.col("n") * F.least(F.col("r") - 1, F.col("c") - 1))
            ),
            4,
        ).alias("cramers_v"),
    )


# --- Gini concentration of source contribution --------------------------------
# Inequality audit of the training mix: the Gini coefficient of
# per-source character contribution, G = 2*Σ i*x_(i) / (n*Σx) -
# (n+1)/n over ascending-sorted source totals (exact integers; ties
# broken by source name for a deterministic i). n = |sources| is
# bounded, so the sort is a bounded array — the corpus contributes one
# groupBy. The balanced synthetic mix gives G ≈ 0; a crawl-skewed
# production mix is exactly what this flags before temperature mixing.
_GINI_ORACLE = """
WITH per_src AS (
    SELECT source, sum(n_chars)::BIGINT AS x FROM documents GROUP BY 1
),
ranked AS (
    SELECT x, row_number() OVER (ORDER BY x, source) AS i FROM per_src
),
agg AS (
    SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS tot,
           sum(i * x)::BIGINT AS ix
    FROM ranked
)
SELECT n AS n_sources, tot AS total_chars,
       round((2.0 * ix / (n * 1.0 * tot) - (n + 1.0) / n) * 1000000)
           / 1000000 + 0.0 AS gini
FROM agg
"""


@register("gini_source_concentration", oracle=_GINI_ORACLE)
def gini_source_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from swat_mapreduce_spark.sources.readers import read_table

    per_src = (
        read_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.sum("n_chars").cast("long").alias("x"))
    )
    # bounded |sources| array: sort (x, source) and fold i*x exactly
    arr = per_src.agg(
        F.array_sort(F.collect_list(F.struct("x", "source"))).alias("s"),
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("long").alias("tot"),
    )
    ix = F.aggregate(
        F.zip_with(
            F.col("s"),
            F.sequence(F.lit(1), F.col("n").cast("int")),
            lambda e, i: e["x"] * i.cast("bigint"),
        ),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )
    g = (
        F.lit(2.0) * ix / (F.col("n") * F.lit(1.0) * F.col("tot"))
        - (F.col("n") + F.lit(1.0)) / F.col("n")
    )
    return arr.select(
        F.col("n").alias("n_sources"),
        F.col("tot").alias("total_chars"),
        R.r(g, 6).alias("gini"),
    )


# --- Theil index decomposition of char mass across sources -----------------------
# Theil (1967) entropy inequality index over document lengths, with
# the exact between/within decomposition T = T_between + T_within —
# the curation audit that answers "is corpus length inequality driven
# by source mix or by spread inside sources?". Grid discipline: every
# (v/μ)·ln(v/μ) term is computed once per distinct length cell (the
# bounded length domain / source×length grid — never per document)
# and snapped to an INTEGER 1e-6 unit before the order-free count-
# weighted sums (the MI/jsd log-grid convention, gotcha 13a); the
# between terms and the within mixture weights snap the same way, so
# the decomposition identity holds to the snapping grid on both
# engines. Scale: one corpus scan to the grid; everything after is
# |sources| + |lengths| metadata.
_THEIL_U = 1_000_000

_THEIL_ORACLE = f"""
WITH cell AS (
    SELECT source, n_chars AS v, count(*)::BIGINT AS c
    FROM documents GROUP BY 1, 2
),
src AS (
    SELECT source, sum(c)::BIGINT AS n_s, sum(c * v)::BIGINT AS x_s
    FROM cell GROUP BY 1
),
g AS (SELECT sum(n_s)::BIGINT AS n, sum(x_s)::BIGINT AS x FROM src),
tot AS (
    SELECT sum(cv.c * CAST(round((cv.v * g.n::DOUBLE / g.x)
               * ln(cv.v * g.n::DOUBLE / g.x) * {_THEIL_U}) AS BIGINT))
               ::BIGINT AS t_num
    FROM (SELECT v, sum(c)::BIGINT AS c FROM cell GROUP BY 1) cv, g
),
ws AS (
    SELECT cell.source,
           sum(cell.c * CAST(round((cell.v * src.n_s::DOUBLE / src.x_s)
               * ln(cell.v * src.n_s::DOUBLE / src.x_s) * {_THEIL_U})
               AS BIGINT))::BIGINT AS ts_num
    FROM cell JOIN src USING (source)
    GROUP BY 1
),
per AS (
    SELECT src.source, src.n_s, src.x_s, ws.ts_num,
           CAST(round((src.x_s::DOUBLE / g.x)
                * ln((src.x_s::DOUBLE / g.x) / (src.n_s::DOUBLE / g.n))
                * {_THEIL_U}) AS BIGINT) AS b_u,
           CAST(round(src.x_s::DOUBLE * ws.ts_num
                      / (g.x::DOUBLE * src.n_s)) AS BIGINT) AS w_u
    FROM src JOIN ws ON ws.source = src.source, g
),
roll AS (
    SELECT sum(b_u)::BIGINT AS tb_u, sum(w_u)::BIGINT AS tw_u FROM per
)
SELECT per.source, per.n_s AS n_docs,
       round(per.x_s::DOUBLE / per.n_s * 10000) / 10000 + 0.0
           AS mean_chars,
       round(per.ts_num::DOUBLE / (per.n_s * {_THEIL_U}.0) * 1000000)
           / 1000000 + 0.0 AS theil_within_s,
       round(per.b_u * 1.0 / {_THEIL_U} * 1000000) / 1000000 + 0.0
           AS between_term,
       round(tot.t_num::DOUBLE / (g.n * {_THEIL_U}.0) * 1000000)
           / 1000000 + 0.0 AS theil_total,
       round(roll.tb_u * 1.0 / {_THEIL_U} * 1000000) / 1000000 + 0.0
           AS theil_between,
       round(roll.tw_u * 1.0 / {_THEIL_U} * 1000000) / 1000000 + 0.0
           AS theil_within
FROM per, roll, tot, g
"""


@register("theil_index_sources", oracle=_THEIL_ORACLE)
def theil_index_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOTE (r13, VERDICT r12 #6): a persist() on this grid was built,
    # measured in an interleaved same-session A/B at sf0.1, and
    # REJECTED — 0.77 s -> 2.16 s. Cache materialization serializes the
    # otherwise-concurrent broadcast subtree builds and adds a job per
    # consumer, which dominates when the re-derived subtree is a cheap
    # numeric groupBy (contrast isotonic/burrows_delta, whose grids
    # re-derive corpus TEXT processing and where the persist measured
    # faster and ships). At 100 TB the re-scans are real I/O; revisit
    # with a cluster profile before re-adding.
    cell = (
        read_table(spark, sf_dir, "documents")
        .groupBy("source", F.col("n_chars").alias("v"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    src = cell.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_s"),
        F.sum(F.col("c") * F.col("v")).cast("long").alias("x_s"),
    )
    g = src.agg(
        F.sum("n_s").cast("long").alias("n"),
        F.sum("x_s").cast("long").alias("x"),
    )
    cv = cell.groupBy("v").agg(F.sum("c").cast("long").alias("c"))
    ratio_tot = F.col("v") * F.col("n").cast("double") / F.col("x")
    tot = (
        cv.crossJoin(F.broadcast(g))
        .select(
            (
                F.col("c")
                * F.round(ratio_tot * F.log(ratio_tot) * F.lit(_THEIL_U))
                .cast("long")
            ).alias("t_cell")
        )
        .agg(F.sum("t_cell").cast("long").alias("t_num"))
    )
    ratio_s = F.col("v") * F.col("n_s").cast("double") / F.col("x_s")
    ws = (
        cell.join(F.broadcast(src), "source")
        .select(
            "source",
            (
                F.col("c")
                * F.round(ratio_s * F.log(ratio_s) * F.lit(_THEIL_U))
                .cast("long")
            ).alias("w_cell"),
        )
        .groupBy("source")
        .agg(F.sum("w_cell").cast("long").alias("ts_num"))
    )
    share = F.col("x_s").cast("double") / F.col("x")
    per = (
        src.join(F.broadcast(ws), "source")
        .crossJoin(F.broadcast(g))
        .select(
            "source",
            "n_s",
            "x_s",
            "ts_num",
            "n",
            "x",
            F.round(
                share
                * F.log(share / (F.col("n_s").cast("double") / F.col("n")))
                * F.lit(_THEIL_U)
            )
            .cast("long")
            .alias("b_u"),
            F.round(
                F.col("x_s").cast("double")
                * F.col("ts_num")
                / (F.col("x").cast("double") * F.col("n_s"))
            )
            .cast("long")
            .alias("w_u"),
        )
    )
    roll = per.agg(
        F.sum("b_u").cast("long").alias("tb_u"),
        F.sum("w_u").cast("long").alias("tw_u"),
    )
    return (
        per.crossJoin(F.broadcast(roll))
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.col("n_s").alias("n_docs"),
            R.r(F.col("x_s").cast("double") / F.col("n_s"), 4).alias(
                "mean_chars"
            ),
            R.r(
                F.col("ts_num").cast("double")
                / (F.col("n_s") * F.lit(float(_THEIL_U))),
                6,
            ).alias("theil_within_s"),
            R.r(F.col("b_u") * F.lit(1.0) / _THEIL_U, 6).alias(
                "between_term"
            ),
            R.r(
                F.col("t_num").cast("double")
                / (F.col("n") * F.lit(float(_THEIL_U))),
                6,
            ).alias("theil_total"),
            R.r(F.col("tb_u") * F.lit(1.0) / _THEIL_U, 6).alias(
                "theil_between"
            ),
            R.r(F.col("tw_u") * F.lit(1.0) / _THEIL_U, 6).alias(
                "theil_within"
            ),
        )
    )


# --- Shannon equitability of the language mix per source ---------------------------
# Pielou (1966) evenness J = H/ln(k): is a source's language mix
# balanced (J→1) or dominated by one language (J→0)? The per-source
# entropy H = −Σ p·ln p uses the MI/jsd 1e-6-unit snapped plogp grid
# over exact integer (source × lang) counts; the normalizer ln(k) is
# a PYTHON-LITERAL lookup (k ≤ |langs| is tiny), so no runtime libm
# shapes the ratio. Sources with a single language get NULL evenness
# (ln 1 = 0), mirrored on both engines. Scale: one scan to the
# bounded (source × lang) grid, a |sources|-row rollup.
import math as _qmath

_EVEN_U = 1_000_000
_EVEN_MAX_K = 10
_EVEN_LNK = {k: _qmath.log(k) for k in range(2, _EVEN_MAX_K + 1)}


def _even_lnk_sql() -> str:
    whens = " ".join(
        f"WHEN {k} THEN {_EVEN_LNK[k]!r}"
        for k in range(2, _EVEN_MAX_K + 1)
    )
    return f"(CASE k {whens} END)::DOUBLE"


_EVEN_ORACLE = f"""
WITH c AS (
    SELECT source, lang, count(*)::BIGINT AS n
    FROM documents GROUP BY 1, 2
),
s AS (
    SELECT source, sum(n)::BIGINT AS ns, count(*)::BIGINT AS k FROM c
    GROUP BY 1
),
h AS (
    SELECT c.source, s.ns, s.k,
           sum(CAST(round(-(c.n::DOUBLE / s.ns)
                          * ln(c.n::DOUBLE / s.ns) * {_EVEN_U})
                    AS BIGINT))::BIGINT AS h_u
    FROM c JOIN s USING (source)
    GROUP BY 1, 2, 3
)
SELECT source, ns AS n_docs, k AS n_langs,
       round(h_u * 1.0 / {_EVEN_U} * 1000000) / 1000000 + 0.0
           AS entropy_nats,
       CASE WHEN k > 1
            THEN round(h_u * 1.0 / ({_EVEN_U} * {_even_lnk_sql()})
                       * 1000000) / 1000000 + 0.0 END AS evenness_j
FROM h
"""


@register("shannon_equitability_sources", oracle=_EVEN_ORACLE)
def shannon_equitability_sources(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    c = (
        read_table(spark, sf_dir, "documents")
        .groupBy("source", "lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    s = c.groupBy("source").agg(
        F.sum("n").cast("long").alias("ns"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    p = F.col("n").cast("double") / F.col("ns")
    h = (
        c.join(F.broadcast(s), "source")
        .select(
            "source",
            "ns",
            "k",
            F.round(-p * F.log(p) * F.lit(_EVEN_U))
            .cast("long")
            .alias("t_u"),
        )
        .groupBy("source", "ns", "k")
        .agg(F.sum("t_u").cast("long").alias("h_u"))
    )
    lnk = None
    for k in range(2, _EVEN_MAX_K + 1):
        br = F.when(F.col("k") == k, F.lit(_EVEN_LNK[k]))
        lnk = br if lnk is None else lnk.when(
            F.col("k") == k, F.lit(_EVEN_LNK[k])
        )
    return h.select(
        "source",
        F.col("ns").alias("n_docs"),
        F.col("k").alias("n_langs"),
        R.r(F.col("h_u") * F.lit(1.0) / _EVEN_U, 6).alias("entropy_nats"),
        F.when(
            F.col("k") > 1,
            R.r(
                F.col("h_u") * F.lit(1.0) / (F.lit(float(_EVEN_U)) * lnk),
                6,
            ),
        ).alias("evenness_j"),
    )


# --- birthday-collision audit of the doc-hash bucket space -------------------------
# The hash-quality sanity check behind every LSH/banding design
# decision: bucket documents by the md5-derived 16-bit hash
# (M = 65536 buckets) and compare OBSERVED collisions (n − distinct
# buckets) with the birthday-paradox expectation ≈ n²/2M (the
# second-order closed form — no runtime pow, every input exact).
# A healthy hash tracks the expectation; a ratio far above 1 means
# the bucket key is skewed and banding math is lying. Also audits the
# max bucket load vs the uniform mean. All counts exact integers; the
# two ratios are the only floating point. Scale: one scan to the
# bucket count table (≤ M rows).
_BD_M = 65536

_BD_ORACLE = f"""
WITH h AS (
    SELECT ('0x' || substr(md5(doc_id || ':bd'), 1, 8))::BIGINT
               % {_BD_M} AS b
    FROM documents
),
g AS (SELECT b, count(*)::BIGINT AS c FROM h GROUP BY 1),
m AS (
    SELECT sum(c)::BIGINT AS n, count(*)::BIGINT AS n_buckets,
           max(c)::BIGINT AS max_load
    FROM g
)
SELECT n AS n_docs, n_buckets, (n - n_buckets)::BIGINT AS collisions,
       round(n::DOUBLE * n / (2.0 * {_BD_M}) * 10000) / 10000 + 0.0
           AS expected_collisions,
       round((n - n_buckets) / (n::DOUBLE * n / (2.0 * {_BD_M}))
             * 10000) / 10000 + 0.0 AS collision_ratio,
       max_load,
       round(max_load / (n::DOUBLE / {_BD_M}) * 10000) / 10000 + 0.0
           AS max_load_vs_uniform
FROM m
"""


@register("birthday_collision_hash_audit", oracle=_BD_ORACLE)
def birthday_collision_hash_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from swat_mapreduce_spark.functions import hashing as _H

    h = read_table(spark, sf_dir, "documents").select(
        (_H.hash_uint(F.col("doc_id"), "bd", 8) % _BD_M).alias("b")
    )
    g = h.groupBy("b").agg(F.count(F.lit(1)).cast("long").alias("c"))
    m = g.agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.max("c").cast("long").alias("max_load"),
    )
    nd = F.col("n").cast("double")
    expc = nd * F.col("n") / (F.lit(2.0) * _BD_M)
    return m.select(
        F.col("n").alias("n_docs"),
        "n_buckets",
        (F.col("n") - F.col("n_buckets")).cast("long").alias("collisions"),
        R.r(expc, 4).alias("expected_collisions"),
        R.r((F.col("n") - F.col("n_buckets")) / expc, 4).alias(
            "collision_ratio"
        ),
        "max_load",
        R.r(
            F.col("max_load") / (nd / F.lit(float(_BD_M))), 4
        ).alias("max_load_vs_uniform"),
    )


# --- referential-integrity (FK orphan) audit ---------------------------------
# The relational DQ baseline: for every foreign-key edge of the
# schema, count child rows whose parent key is missing (anti-join per
# edge — each a key-hashed shuffle, parents broadcast where small).
# The synthetic TPC-H generator produces zero orphans; the audit's
# value is the per-edge row accounting (child counts are exact and
# non-vacuous at every SF) and the zero-orphan attestation itself.

_FK_ORACLE = """
SELECT 'lineitem->orders' AS fk_edge, count(*)::BIGINT AS n_child,
       sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)::BIGINT
           AS n_orphans
FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
UNION ALL
SELECT 'lineitem->part', count(*)::BIGINT,
       sum(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END)::BIGINT
FROM lineitem l LEFT JOIN part p ON p.p_partkey = l.l_partkey
UNION ALL
SELECT 'lineitem->supplier', count(*)::BIGINT,
       sum(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END)::BIGINT
FROM lineitem l LEFT JOIN supplier s ON s.s_suppkey = l.l_suppkey
UNION ALL
SELECT 'orders->customer', count(*)::BIGINT,
       sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT
FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
UNION ALL
SELECT 'customer->nation', count(*)::BIGINT,
       sum(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END)::BIGINT
FROM customer c LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey
UNION ALL
SELECT 'supplier->nation', count(*)::BIGINT,
       sum(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END)::BIGINT
FROM supplier s LEFT JOIN nation n ON n.n_nationkey = s.s_nationkey
UNION ALL
SELECT 'nation->region', count(*)::BIGINT,
       sum(CASE WHEN r.r_regionkey IS NULL THEN 1 ELSE 0 END)::BIGINT
FROM nation n LEFT JOIN region r ON r.r_regionkey = n.n_regionkey
"""


@register("fk_orphan_audit", oracle=_FK_ORACLE)
def fk_orphan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    def edge(name, child, ckey, parent, pkey, broadcast_parent=True):
        c = read_table(spark, sf_dir, child).select(F.col(ckey).alias("k"))
        p = (
            read_table(spark, sf_dir, parent)
            .select(F.col(pkey).alias("pk"))
            .distinct()
        )
        if broadcast_parent:
            p = F.broadcast(p)
        j = c.join(p, c["k"] == p["pk"], "left")
        return j.agg(
            F.lit(name).alias("fk_edge"),
            F.count(F.lit(1)).cast("long").alias("n_child"),
            F.sum(F.when(F.col("pk").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_orphans"),
        )

    # orders/part/customer parents are large at real scale: key-hashed
    # shuffle joins (no broadcast hint) so the plan survives 100x;
    # nation/region stay broadcast.
    edges = [
        edge("lineitem->orders", "lineitem", "l_orderkey",
             "orders", "o_orderkey", broadcast_parent=False),
        edge("lineitem->part", "lineitem", "l_partkey",
             "part", "p_partkey", broadcast_parent=False),
        edge("lineitem->supplier", "lineitem", "l_suppkey",
             "supplier", "s_suppkey", broadcast_parent=False),
        edge("orders->customer", "orders", "o_custkey",
             "customer", "c_custkey", broadcast_parent=False),
        edge("customer->nation", "customer", "c_nationkey",
             "nation", "n_nationkey"),
        edge("supplier->nation", "supplier", "s_nationkey",
             "nation", "n_nationkey"),
        edge("nation->region", "nation", "n_regionkey",
             "region", "r_regionkey"),
    ]
    out = edges[0]
    for e in edges[1:]:
        out = out.unionAll(e)
    return out


# --- Calinski-Harabasz cluster-validity index ---------------------------------
# The variance-ratio criterion over the embedding labels:
# CH = (SSB/(k−1)) / (SSW/(n−k)) — the cheap first look before the
# silhouette. One dims pass builds per-label and global per-dim means
# (DECIMAL-exact sums / exact counts); SSW/SSB accumulate integer
# 1e-8-unit squared deviations, so both engines sum identical int64
# terms. Bounded |labels|×dims tables everywhere.

_CH_ORACLE = f"""
WITH {{dims}},
cent AS (
    SELECT e.label, d.i, count(*)::BIGINT AS n_l,
           sum(CAST(d.x AS DECIMAL(30,8)))::DOUBLE / count(*) AS m
    FROM dims d JOIN embeddings e ON e.vec_id = d.vec_id
    GROUP BY e.label, d.i
),
gmean AS (
    SELECT i, sum(CAST(x AS DECIMAL(30,8)))::DOUBLE / count(*) AS g,
           count(*)::BIGINT AS n
    FROM dims GROUP BY i
),
ssw AS (
    SELECT sum(CAST(round((d.x - c.m) * (d.x - c.m) * 100000000)
                    AS BIGINT))::BIGINT AS ssw_u
    FROM dims d
    JOIN embeddings e ON e.vec_id = d.vec_id
    JOIN cent c ON c.label = e.label AND c.i = d.i
),
ssb AS (
    SELECT sum(c.n_l * CAST(round((c.m - g.g) * (c.m - g.g) * 100000000)
                            AS BIGINT))::BIGINT AS ssb_u,
           count(DISTINCT c.label)::BIGINT AS k,
           min(g.n)::BIGINT AS n
    FROM cent c JOIN gmean g ON g.i = c.i
)
SELECT ssb.n AS n_vectors, ssb.k AS k_clusters,
       round(ssw.ssw_u * 1.0 / 100000000 * 10000) / 10000 + 0.0 AS ssw,
       round(ssb.ssb_u * 1.0 / 100000000 * 10000) / 10000 + 0.0 AS ssb,
       round((ssb.ssb_u * 1.0 / (ssb.k - 1))
             / (ssw.ssw_u * 1.0 / (ssb.n - ssb.k)) * 10000) / 10000 + 0.0
           AS calinski_harabasz
FROM ssw, ssb
""".format(dims=_DIMS_DUCK)


@register("calinski_harabasz_embeddings", oracle=_CH_ORACLE)
def calinski_harabasz_embeddings(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    dec = "decimal(30,8)"
    dims = emb.select(
        "vec_id",
        F.col("label").alias("own"),
        F.posexplode(A.as_double_array(F.col("embedding"))).alias("i", "x"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    cent = dims.groupBy(F.col("own").alias("clabel"), "i").agg(
        F.count(F.lit(1)).cast("long").alias("n_l"),
        (F.sum(F.col("x").cast(dec)).cast("double") / F.count(F.lit(1)))
        .alias("m"),
    )
    glob = dims.groupBy("i").agg(
        (F.sum(F.col("x").cast(dec)).cast("double") / F.count(F.lit(1)))
        .alias("g"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    u8 = F.lit(100000000)
    ssw = (
        dims.join(
            F.broadcast(cent),
            (dims["own"] == cent["clabel"]) & (dims["i"] == cent["i"]),
        )
        .agg(
            F.sum(
                F.round(
                    (F.col("x") - F.col("m")) * (F.col("x") - F.col("m"))
                    * u8
                ).cast("long")
            ).cast("long").alias("ssw_u")
        )
    )
    ssb = (
        cent.join(F.broadcast(glob), "i")
        .agg(
            F.sum(
                F.col("n_l")
                * F.round(
                    (F.col("m") - F.col("g")) * (F.col("m") - F.col("g"))
                    * u8
                ).cast("long")
            ).cast("long").alias("ssb_u"),
            F.countDistinct("clabel").cast("long").alias("k"),
            F.min("n").cast("long").alias("n"),
        )
    )
    return ssw.crossJoin(F.broadcast(ssb)).select(
        F.col("n").alias("n_vectors"),
        F.col("k").alias("k_clusters"),
        R.r(F.col("ssw_u") * F.lit(1.0) / 100000000, 4).alias("ssw"),
        R.r(F.col("ssb_u") * F.lit(1.0) / 100000000, 4).alias("ssb"),
        R.r(
            (F.col("ssb_u") * F.lit(1.0) / (F.col("k") - 1))
            / (F.col("ssw_u") * F.lit(1.0) / (F.col("n") - F.col("k"))),
            4,
        ).alias("calinski_harabasz"),
    )


# --- Davies-Bouldin cluster-validity index -------------------------------------
# DB = (1/k)·Σ_i max_{j≠i} (s_i + s_j)/d_ij over the |labels|²
# centroid grid: s_l = mean member→centroid distance (sqrt of the
# DECIMAL-exact squared sums — the silhouette distance discipline),
# d_ij = centroid-centroid distance. Per-pair R snaps to 1e-8 units so
# the max and the final mean run on identical integers.

_DB_ORACLE = f"""
WITH {{dims}},
cent AS (
    SELECT e.label, d.i,
           sum(CAST(d.x AS DECIMAL(30,8)))::DOUBLE / count(*) AS m
    FROM dims d JOIN embeddings e ON e.vec_id = d.vec_id
    GROUP BY e.label, d.i
),
dv AS (
    SELECT d.vec_id, e.label,
           sqrt(sum(CAST(round((d.x - c.m) * (d.x - c.m) * 100000000)
                         AS BIGINT))::DOUBLE / 100000000) AS dist
    FROM dims d
    JOIN embeddings e ON e.vec_id = d.vec_id
    JOIN cent c ON c.label = e.label AND c.i = d.i
    GROUP BY d.vec_id, e.label
),
s AS (
    SELECT label, count(*)::BIGINT AS n_l,
           sum(CAST(round(dist * 100000000) AS BIGINT))::DOUBLE
               / 100000000 / count(*) AS s_l
    FROM dv GROUP BY 1
),
cd AS (
    SELECT a.label AS la, b.label AS lb,
           sqrt(sum(CAST(round((a.m - b.m) * (a.m - b.m) * 100000000)
                         AS BIGINT))::DOUBLE / 100000000) AS d_ij
    FROM cent a JOIN cent b ON b.i = a.i AND a.label <> b.label
    GROUP BY 1, 2
),
r AS (
    SELECT cd.la, max(CAST(round((sa.s_l + sb.s_l) / cd.d_ij * 100000000)
                           AS BIGINT))::BIGINT AS r_u
    FROM cd
    JOIN s sa ON sa.label = cd.la
    JOIN s sb ON sb.label = cd.lb
    GROUP BY cd.la
)
SELECT r.la AS label, s.n_l AS n_vectors,
       round(s.s_l * 10000) / 10000 + 0.0 AS avg_scatter,
       round(r.r_u * 1.0 / 100000000 * 10000) / 10000 + 0.0 AS worst_ratio,
       round((SELECT sum(r_u) * 1.0 / count(*) FROM r) / 100000000
             * 10000) / 10000 + 0.0 AS davies_bouldin
FROM r JOIN s ON s.label = r.la
""".format(dims=_DIMS_DUCK)


@register("davies_bouldin_embeddings", oracle=_DB_ORACLE)
def davies_bouldin_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    dec = "decimal(30,8)"
    u8 = F.lit(100000000)
    dims = emb.select(
        "vec_id",
        F.col("label").alias("own"),
        F.posexplode(A.as_double_array(F.col("embedding"))).alias("i", "x"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    cent = dims.groupBy(F.col("own").alias("clabel"), "i").agg(
        (F.sum(F.col("x").cast(dec)).cast("double") / F.count(F.lit(1)))
        .alias("m")
    )
    cent = cent.persist(StorageLevel.MEMORY_AND_DISK)
    dv = (
        dims.join(
            F.broadcast(cent),
            (dims["own"] == cent["clabel"]) & (dims["i"] == cent["i"]),
        )
        .groupBy("vec_id", "own")
        .agg(
            F.sqrt(
                F.sum(
                    F.round(
                        (F.col("x") - F.col("m"))
                        * (F.col("x") - F.col("m"))
                        * u8
                    ).cast("long")
                ).cast("double")
                / u8
            ).alias("dist")
        )
    )
    s = dv.groupBy(F.col("own").alias("label")).agg(
        F.count(F.lit(1)).cast("long").alias("n_l"),
        (
            F.sum(F.round(F.col("dist") * u8).cast("long")).cast("double")
            / u8
            / F.count(F.lit(1))
        ).alias("s_l"),
    )
    ca = cent.select(
        F.col("clabel").alias("la"), "i", F.col("m").alias("ma")
    )
    cb = cent.select(
        F.col("clabel").alias("lb"), "i", F.col("m").alias("mb")
    )
    cd = (
        ca.join(cb, "i")
        .filter(F.col("la") != F.col("lb"))
        .groupBy("la", "lb")
        .agg(
            F.sqrt(
                F.sum(
                    F.round(
                        (F.col("ma") - F.col("mb"))
                        * (F.col("ma") - F.col("mb"))
                        * u8
                    ).cast("long")
                ).cast("double")
                / u8
            ).alias("d_ij")
        )
    )
    sa = s.select(F.col("label").alias("la"), F.col("s_l").alias("sa"))
    sb = s.select(F.col("label").alias("lb"), F.col("s_l").alias("sb"))
    r = (
        cd.join(F.broadcast(sa), "la")
        .join(F.broadcast(sb), "lb")
        .groupBy("la")
        .agg(
            F.max(
                F.round((F.col("sa") + F.col("sb")) / F.col("d_ij") * u8)
                .cast("long")
            ).cast("long").alias("r_u")
        )
    )
    db = r.agg(
        (F.sum("r_u") * F.lit(1.0) / F.count(F.lit(1))).alias("db_u")
    )
    return (
        r.join(s, r["la"] == s["label"])
        .crossJoin(F.broadcast(db))
        .select(
            F.col("la").alias("label"),
            F.col("n_l").alias("n_vectors"),
            R.r(F.col("s_l"), 4).alias("avg_scatter"),
            R.r(F.col("r_u") * F.lit(1.0) / 100000000, 4)
            .alias("worst_ratio"),
            R.r(F.col("db_u") / 100000000, 4).alias("davies_bouldin"),
        )
    )
