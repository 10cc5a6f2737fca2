"""Similarity-search queries + DuckDB oracles.

Cosine math is done explicitly over unnested dimensions in the oracle
(double precision, same formula) rather than DuckDB's built-in
``list_cosine_similarity`` so both engines share one definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from swat_mapreduce_spark.functions import arrays as A
from swat_mapreduce_spark.functions import hashing as _H
from swat_mapreduce_spark.functions import rounding as R
from swat_mapreduce_spark.operators import similarity as S
from swat_mapreduce_spark.queries import register
from swat_mapreduce_spark.sources.readers import read_table

QUERY_VEC_ID = 0
DIM = 64

# dims CTE: (vec_id, i, x) — one row per vector component, double.
_DIMS_DUCK = f"""
dims AS (
    SELECT vec_id, g.i, embedding[g.i]::DOUBLE AS x
    FROM embeddings, generate_series(1, {DIM}) AS g(i)
)
"""

_ANN_ORACLE = f"""
WITH {_DIMS_DUCK},
q AS (SELECT i, x AS qx FROM dims WHERE vec_id = {QUERY_VEC_ID}),
scores AS (
    SELECT d.vec_id,
           sum(d.x * q.qx) / (sqrt(sum(d.x * d.x)) * sqrt(sum(q.qx * q.qx)))
               AS cos_raw
    FROM dims d JOIN q ON d.i = q.i
    WHERE d.vec_id <> {QUERY_VEC_ID}
    GROUP BY d.vec_id
)
SELECT s.vec_id, e.label, round(s.cos_raw, 4) AS cosine
FROM scores s JOIN embeddings e ON e.vec_id = s.vec_id
ORDER BY round(s.cos_raw, 4) DESC, s.vec_id
LIMIT 10
"""


@register("ann_topk_bruteforce", oracle=_ANN_ORACLE)
def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    qrow = (
        emb.filter(F.col("vec_id") == QUERY_VEC_ID)
        .select("embedding")
        .first()
    )
    if qrow is None:  # query vector absent (empty/regenerated data)
        return spark.sql(
            "SELECT CAST(NULL AS BIGINT) AS vec_id,"
            " CAST(NULL AS INT) AS label,"
            " CAST(NULL AS DOUBLE) AS cosine"
        ).limit(0)
    return S.cosine_topk(
        emb, [float(x) for x in qrow[0]], k=10, exclude_id=QUERY_VEC_ID
    )


_PAIRS_ORACLE = f"""
WITH {_DIMS_DUCK},
norms AS (
    SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM dims GROUP BY vec_id
),
pairs AS (
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
),
dots AS (
    SELECT p.vec_a, p.vec_b, sum(da.x * db.x) AS dp
    FROM pairs p
    JOIN dims da ON da.vec_id = p.vec_a
    JOIN dims db ON db.vec_id = p.vec_b AND db.i = da.i
    GROUP BY p.vec_a, p.vec_b
)
SELECT d.vec_a, d.vec_b,
       round(d.dp / (na.nrm * nb.nrm), 4) AS cosine
FROM dots d
JOIN norms na ON na.vec_id = d.vec_a
JOIN norms nb ON nb.vec_id = d.vec_b
WHERE round(d.dp / (na.nrm * nb.nrm), 4) >= 0.35
"""


@register("neardup_cosine_pairs", oracle=_PAIRS_ORACLE)
def neardup_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    # 0.35: the synthetic embeddings top out at ~0.47 intra-label
    # cosine, so 0.35 exercises the operator non-vacuously at every sf
    return S.cosine_pairs_blocked(emb, threshold=0.35, block_col="label")


def _lsh_oracle() -> str:
    comp = S.duck_plane_component("g.p", "d.i - 1")  # 0-based dim index
    return f"""
WITH {_DIMS_DUCK},
dots AS (
    SELECT d.vec_id, g.p, sum(d.x * ({comp})) AS dp
    FROM dims d, generate_series(0, {S.LSH_PLANES - 1}) AS g(p)
    GROUP BY d.vec_id, g.p
)
SELECT vec_id,
       sum(CASE WHEN dp > 0 THEN (1::BIGINT << p) ELSE 0 END)::BIGINT AS bucket
FROM dots
GROUP BY vec_id
"""


@register("ann_lsh_buckets", oracle=_lsh_oracle())
def ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    return S.lsh_buckets(emb)


_IVF_ORACLE = f"""
WITH {_DIMS_DUCK},
q AS (SELECT i, x AS qx FROM dims WHERE vec_id = {QUERY_VEC_ID}),
cent AS (
    SELECT e.label AS cell, d.i, avg(d.x) AS m
    FROM dims d JOIN embeddings e ON e.vec_id = d.vec_id
    GROUP BY e.label, d.i
),
cq AS (
    SELECT c.cell,
           sum(c.m * q.qx) / (sqrt(sum(c.m * c.m)) * sqrt(sum(q.qx * q.qx)))
               AS cqs
    FROM cent c JOIN q ON c.i = q.i
    GROUP BY c.cell
),
probe AS (SELECT cell FROM cq ORDER BY cqs DESC, cell LIMIT 2),
scores AS (
    SELECT d.vec_id,
           sum(d.x * q.qx) / (sqrt(sum(d.x * d.x)) * sqrt(sum(q.qx * q.qx)))
               AS cos_raw
    FROM dims d
    JOIN q ON d.i = q.i
    JOIN embeddings e ON e.vec_id = d.vec_id
    JOIN probe p ON e.label = p.cell
    WHERE d.vec_id <> {QUERY_VEC_ID}
    GROUP BY d.vec_id
)
SELECT s.vec_id, e.label, round(s.cos_raw, 4) AS cosine
FROM scores s JOIN embeddings e ON e.vec_id = s.vec_id
ORDER BY round(s.cos_raw, 4) DESC, s.vec_id
LIMIT 10
"""


@register("ann_ivf_topk", oracle=_IVF_ORACLE)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: probe the 2 nearest label-cells, search only there.
    Same k and query vector as ann_topk_bruteforce — diffing the two
    results shows the recall trade."""
    emb = read_table(spark, sf_dir, "embeddings")
    qrow = (
        emb.filter(F.col("vec_id") == QUERY_VEC_ID)
        .select("embedding")
        .first()
    )
    if qrow is None:  # query vector absent (empty/regenerated data)
        return spark.sql(
            "SELECT CAST(NULL AS BIGINT) AS vec_id,"
            " CAST(NULL AS INT) AS label,"
            " CAST(NULL AS DOUBLE) AS cosine"
        ).limit(0)
    return S.ivf_topk(
        emb, [float(x) for x in qrow[0]], k=10, nprobe=2,
        exclude_id=QUERY_VEC_ID,
    )


# --- batched ANN: many queries, one pass ----------------------------------
# The serving shape: a block of Q query vectors broadcast against the
# corpus, one scan computing all Q*N cosines, per-query top-k via a
# bounded window (WindowGroupLimit keeps per-partition heaps).
# For large Q the per-query IVF/LSH probe prunes first — this is the
# small-Q/batch path.
_BATCH_Q = 3
_BATCH_ORACLE = f"""
WITH {_DIMS_DUCK},
qs AS (SELECT vec_id AS q_id, i, x AS qx FROM dims WHERE vec_id < {_BATCH_Q}),
scores AS (
    SELECT q.q_id, d.vec_id,
           sum(d.x * q.qx) / (sqrt(sum(d.x * d.x)) * sqrt(sum(q.qx * q.qx)))
               AS cos_raw
    FROM dims d JOIN qs q ON d.i = q.i
    WHERE d.vec_id >= {_BATCH_Q}
    GROUP BY q.q_id, d.vec_id
),
rk AS (
    SELECT q_id, vec_id, round(cos_raw, 4) AS cosine,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY round(cos_raw, 4) DESC, vec_id) AS rn
    FROM scores
)
SELECT q_id, vec_id, cosine FROM rk WHERE rn <= 10
"""


@register("ann_batch_topk", oracle=_BATCH_ORACLE)
def ann_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from swat_mapreduce_spark.functions import arrays as A
    from swat_mapreduce_spark.functions import rounding as R

    emb = read_table(spark, sf_dir, "embeddings")
    # norms hoisted out of the Q×N fan-out (r13, guide §1.2): nq once
    # per query, nv once per corpus vector — bit-identical 4dp snap
    queries = emb.filter(F.col("vec_id") < _BATCH_Q).select(
        F.col("vec_id").alias("q_id"),
        A.as_double_array(F.col("embedding")).alias("qv"),
    ).withColumn("nq", A.l2_norm(F.col("qv")))
    data = emb.filter(F.col("vec_id") >= _BATCH_Q).select(
        "vec_id", A.as_double_array(F.col("embedding")).alias("v")
    ).withColumn("nv", A.l2_norm(F.col("v")))
    cos = R.r(
        A.cosine_pre(
            F.col("v"), F.col("qv"), F.col("nv"), F.col("nq")
        ),
        4,
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        data.crossJoin(F.broadcast(queries))
        .select("q_id", "vec_id", cos.alias("cosine"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("q_id", "vec_id", "cosine")
    )


# --- product-quantization ANN (ADC) ----------------------------------------
# The codebook-compression member of the ANN family (alongside brute /
# LSH / IVF / int8-rerank): split each vector into M=8 subvectors of 8
# dims, learn K=16 centroids per subspace (deterministic init =
# subvectors of vec_id<16, one Lloyd update — the kmeans_lloyd_2iter
# recipe), encode every vector as 8 one-byte codes, then answer the
# query via Asymmetric Distance Computation: an M×K lookup table of
# query→centroid squared-L2 distances, ADC(vec) = Σ_s lut[s, code_s].
# At 100 TB the codes table is 8 bytes/vector (512× smaller than the
# float64 corpus), the codebook/LUT are broadcast-tiny, and the scan
# is one narrow join + a per-vector 8-term sum → TakeOrdered
# shortlist; training touches the corpus twice (assign, mean-update)
# with all shuffles keyed per (vec, subspace). Serving shape: ADC
# top-50 shortlist → exact-cosine rerank → top-10 (measured shortlist
# recall 8/10 at sf0.001, 7/10 at sf0.01 — 4-bit×8 codes on
# near-orthogonal unit vectors). Argmin cuts use (dist, cid) /
# (dist, vec_id) orderings so ties break identically in both engines.
_PQ_M = 8  # subspaces
_PQ_DSUB = DIM // _PQ_M
_PQ_KC = 16  # centroids per subspace
_PQ_SHORTLIST = 50  # ADC candidates kept for the exact rerank

_PQ_ADC_ORACLE = f"""
WITH {_DIMS_DUCK},
norms AS (
    SELECT vec_id,
           sqrt(sum(CAST(x * x AS DECIMAL(30,8)))::DOUBLE) AS nrm
    FROM dims GROUP BY vec_id
),
sub AS (
    SELECT dims.vec_id, ((i - 1) // {_PQ_DSUB})::INT AS s,
           ((i - 1) % {_PQ_DSUB})::INT AS d, x / n.nrm AS x
    FROM dims JOIN norms n ON n.vec_id = dims.vec_id
),
init AS (SELECT vec_id::INT AS cid, s, d, x AS c FROM sub WHERE vec_id < {_PQ_KC}),
a0d AS (
    SELECT v.vec_id, v.s, i.cid, sum(CAST((v.x - i.c) * (v.x - i.c) AS DECIMAL(30,8))) AS dist
    FROM sub v JOIN init i ON i.s = v.s AND i.d = v.d
    GROUP BY v.vec_id, v.s, i.cid
),
a0 AS (
    SELECT vec_id, s, cid FROM (
        SELECT vec_id, s, cid,
               row_number() OVER (PARTITION BY vec_id, s
                                  ORDER BY dist, cid) AS rn
        FROM a0d) WHERE rn = 1
),
cb AS (
    SELECT a0.cid, v.s, v.d,
           sum(CAST(v.x AS DECIMAL(30,8)))::DOUBLE / count(*) AS c
    FROM sub v JOIN a0 ON a0.vec_id = v.vec_id AND a0.s = v.s
    GROUP BY a0.cid, v.s, v.d
),
a1d AS (
    SELECT v.vec_id, v.s, cb.cid, sum(CAST((v.x - cb.c) * (v.x - cb.c) AS DECIMAL(30,8))) AS dist
    FROM sub v JOIN cb ON cb.s = v.s AND cb.d = v.d
    GROUP BY v.vec_id, v.s, cb.cid
),
codes AS (
    SELECT vec_id, s, cid FROM (
        SELECT vec_id, s, cid,
               row_number() OVER (PARTITION BY vec_id, s
                                  ORDER BY dist, cid) AS rn
        FROM a1d) WHERE rn = 1
),
q AS (SELECT s, d, x AS qx FROM sub WHERE vec_id = {QUERY_VEC_ID}),
lut AS (
    SELECT cb.s, cb.cid, sum(CAST((cb.c - q.qx) * (cb.c - q.qx) AS DECIMAL(30,8))) AS ld
    FROM cb JOIN q ON q.s = cb.s AND q.d = cb.d
    GROUP BY cb.s, cb.cid
),
adc AS (
    SELECT c.vec_id, sum(l.ld) AS adc_dist  -- decimal sum: exact
    FROM codes c JOIN lut l ON l.s = c.s AND l.cid = c.cid
    WHERE c.vec_id <> {QUERY_VEC_ID}
    GROUP BY c.vec_id
),
top AS (
    SELECT vec_id, adc_dist FROM adc
    ORDER BY round(adc_dist::DOUBLE * 10000) / 10000, vec_id LIMIT {_PQ_SHORTLIST}
),
qf AS (SELECT i, x AS qx FROM dims WHERE vec_id = {QUERY_VEC_ID}),
ex AS (
    SELECT d.vec_id,
           sum(d.x * qf.qx) / (sqrt(sum(d.x * d.x)) * sqrt(sum(qf.qx * qf.qx)))
               AS cos_raw
    FROM dims d JOIN qf ON qf.i = d.i
    JOIN top t ON t.vec_id = d.vec_id
    GROUP BY d.vec_id
)
SELECT t.vec_id, e.label,
       round(t.adc_dist::DOUBLE * 10000) / 10000 + 0.0 AS adc_dist,
       round(ex.cos_raw, 4) AS cosine
FROM top t
JOIN ex ON ex.vec_id = t.vec_id
JOIN embeddings e ON e.vec_id = t.vec_id
ORDER BY round(ex.cos_raw, 4) DESC, t.vec_id
LIMIT 10
"""


@register("ann_pq_adc_topk", oracle=_PQ_ADC_ORACLE)
def ann_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from swat_mapreduce_spark.functions import arrays as A

    emb = read_table(spark, sf_dir, "embeddings")
    raw = emb.select(
        "vec_id", F.posexplode("embedding").alias("i", "xf")
    ).select(
        "vec_id",
        (F.col("i") / _PQ_DSUB).cast("int").alias("s"),
        (F.col("i") % _PQ_DSUB).cast("int").alias("d"),
        F.col("xf").cast("double").alias("x"),
    )
    # L2-normalize per vector so squared-L2 ADC ranking is monotone
    # with cosine (||a-b||^2 = 2 - 2cos on unit vectors) — without
    # this, PQ would rank by raw L2 while the exact rerank and the
    # brute-force twin rank by cosine, and recall comparisons would
    # measure metric mismatch, not quantization loss.
    dec = "decimal(30,8)"
    # every accumulation in the training chain goes through
    # DECIMAL(30,8) terms (the repo's order-independent cross-engine
    # sum pattern): norms, assignment distances, centroid means, the
    # LUT, and ADC itself. Double group-sums depend on accumulation
    # order, and a last-ulp centroid difference between engines could
    # assign a near-equidistant vector different codes — decimal sums
    # make codes, shortlist, and distances deterministic on both sides.
    norms = raw.groupBy("vec_id").agg(
        F.sqrt(
            F.sum((F.col("x") * F.col("x")).cast(dec)).cast("double")
        ).alias("nrm")
    )
    from pyspark import StorageLevel

    # sub feeds three consumers (init assign, centroid update, final
    # assign + query extract); cb feeds two (final assign, LUT); codes
    # feeds the ADC scan. Persisting them keeps the corpus scan count
    # at ONE for training + one for the exact rerank — the unexecuted
    # DAG would otherwise re-derive the posexplode subtree per consumer
    # (17 scans in the r5 census before this). In production the codes
    # table is a materialized artifact; persist is its session-scale
    # stand-in.
    sub = (
        raw.join(norms, "vec_id")
        .select("vec_id", "s", "d", (F.col("x") / F.col("nrm")).alias("x"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    init = sub.filter(F.col("vec_id") < _PQ_KC).select(
        F.col("vec_id").cast("int").alias("cid"), "s", "d",
        F.col("x").alias("c"),
    )

    def assign(points: DataFrame, codebook: DataFrame) -> DataFrame:
        dists = (
            points.join(F.broadcast(codebook), ["s", "d"])
            .groupBy("vec_id", "s", "cid")
            .agg(
                F.sum(
                    (
                        (F.col("x") - F.col("c"))
                        * (F.col("x") - F.col("c"))
                    ).cast("decimal(30,8)")
                ).alias("dist")
            )
        )
        # argmin via min(struct(dist, cid)): same (dist, cid) ordering
        # as the oracle's row_number window, but partial-aggregable
        # map-side — one combine-shuffle instead of a full sort-window
        return (
            dists.groupBy("vec_id", "s")
            .agg(F.min(F.struct("dist", "cid")).alias("m"))
            .select("vec_id", "s", F.col("m.cid").alias("cid"))
        )

    a0 = assign(sub, init)
    cb = (
        sub.join(a0, ["vec_id", "s"])
        .groupBy("cid", "s", "d")
        .agg(
            (
                F.sum(F.col("x").cast("decimal(30,8)")).cast("double")
                / F.count(F.lit(1))
            ).alias("c")
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    codes = assign(sub, cb).persist(StorageLevel.MEMORY_AND_DISK)
    q = sub.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        "s", "d", F.col("x").alias("qx")
    )
    lut = (
        cb.join(F.broadcast(q), ["s", "d"])
        .groupBy("s", "cid")
        .agg(
            F.sum(
                (
                    (F.col("c") - F.col("qx"))
                    * (F.col("c") - F.col("qx"))
                ).cast("decimal(30,8)")
            ).alias("ld")
        )
    )
    adc = (
        codes.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(lut), ["s", "cid"])
        .groupBy("vec_id")
        .agg(F.sum("ld").cast("decimal(30,8)").alias("adc_dist"))
    )
    # shortlist cut on the ROUNDED distance (+ vec_id tie-break), like
    # ann_topk's rounded-cosine ordering: sub-1e-4 accumulation-order
    # drift between engines then cannot move a vector across the
    # rank-50 boundary unless it sits exactly on a rounding tie
    top = adc.orderBy(
        R.r(F.col("adc_dist").cast("double"), 4), "vec_id"
    ).limit(_PQ_SHORTLIST)
    qrow = (
        emb.filter(F.col("vec_id") == QUERY_VEC_ID).select("embedding").first()
    )
    if qrow is None:  # query vector absent (empty/regenerated data)
        return spark.sql(
            "SELECT CAST(NULL AS BIGINT) AS vec_id, CAST(NULL AS INT) AS label,"
            " CAST(NULL AS DOUBLE) AS adc_dist, CAST(NULL AS DOUBLE) AS cosine"
        ).limit(0)
    qv = F.array(*[F.lit(float(v)) for v in qrow[0]])
    # query norm once driver-side (r13, guide §1.2; IEEE-identical)
    nq = F.lit(A.py_l2_norm([float(v) for v in qrow[0]]))
    vec_r = A.as_double_array(F.col("embedding"))
    exact = emb.join(F.broadcast(top), "vec_id").select(
        "vec_id",
        "label",
        # R.r, never bare F.round (CLAUDE.md gotcha 3): Java HALF_UP on
        # the double's decimal expansion and C round(x*1e4)/1e4 disagree
        # exactly on 4dp ties, and the oracle rounds C-style
        R.r(F.col("adc_dist").cast("double"), 4).alias("adc_dist"),
        R.r(
            A.cosine_pre(vec_r, qv, A.l2_norm(vec_r), nq), 4
        ).alias("cosine"),
    )
    return exact.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(10)


# --- int8 embedding quantization -------------------------------------------
# Vector-index compression: per-vector symmetric int8 quantization
# (scale = 127 / max|x|), the standard 4x memory cut for ANN serving.
# The query audits the compression: per-vector reconstruction error
# and the quantized self-dot-product drift — all narrow array math
# (one transform + aggregates per row, zero shuffles before the final
# stats rollup). Rounding to int8 uses the shared half-away-from-zero
# formula so both engines quantize identically.

_QUANT_ORACLE = f"""
WITH {_DIMS_DUCK},
s AS (
    SELECT vec_id, max(abs(x)) AS mx
    FROM dims GROUP BY vec_id
),
q AS (
    SELECT d.vec_id, d.i, d.x,
           CASE WHEN s.mx = 0 THEN 0
                ELSE greatest(-127, least(127,
                    (CASE WHEN d.x >= 0
                          THEN floor(abs(d.x) * 127.0 / s.mx + 0.5)
                          ELSE -floor(abs(d.x) * 127.0 / s.mx + 0.5)
                     END)::BIGINT))
           END AS qi,
           s.mx AS mx
    FROM dims d JOIN s USING (vec_id)
),
r AS (
    SELECT vec_id, i, x, qi,
           CASE WHEN mx = 0 THEN 0.0 ELSE qi * mx / 127.0 END AS xr
    FROM q
)
SELECT vec_id,
       round(max(abs(x - xr)), 6) AS max_abs_err,
       round(sum((x - xr) * (x - xr)) / {DIM}, 6) AS mse,
       sum(qi * qi)::BIGINT AS q_self_dot
FROM r
GROUP BY vec_id
"""


@register("embedding_quantize_int8", oracle=_QUANT_ORACLE)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    from swat_mapreduce_spark.functions import rounding as R

    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    mx = F.array_max(F.transform(F.col("e"), lambda x: F.abs(x)))
    with_scale = emb.select("vec_id", "e", mx.alias("mx"))
    # half-away-from-zero to int8, clamped: same formula as the oracle
    qarr = F.when(F.col("mx") == 0, F.transform(F.col("e"), lambda x: F.lit(0).cast("long"))).otherwise(
        F.transform(
            F.col("e"),
            lambda x: F.greatest(
                F.lit(-127),
                F.least(
                    F.lit(127),
                    (
                        F.signum(x)
                        * F.floor(F.abs(x) * 127.0 / F.col("mx") + 0.5)
                    ).cast("long"),
                ),
            ),
        )
    )
    quant = with_scale.select("vec_id", "e", "mx", qarr.alias("q"))
    recon = F.when(F.col("mx") == 0, F.transform(F.col("q"), lambda qi: qi.cast("double"))).otherwise(
        F.transform(F.col("q"), lambda qi: qi * F.col("mx") / 127.0)
    )
    diffs = F.zip_with(F.col("e"), recon, lambda x, xr: x - xr)
    return quant.select(
        "vec_id",
        R.r(
            F.array_max(F.transform(diffs, lambda d: F.abs(d))), 6
        ).alias("max_abs_err"),
        R.r(
            F.aggregate(
                F.transform(diffs, lambda d: d * d),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            / DIM,
            6,
        ).alias("mse"),
        F.aggregate(
            F.transform(F.col("q"), lambda qi: qi * qi),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias("q_self_dot"),
    )


# --- SemDeDup-style semantic dedup ----------------------------------------
# Abbas et al. "SemDeDup": cluster embeddings, keep one exemplar per
# cluster, drop members semantically too close to it. Cells are the
# deterministic label clusters (same stand-in as ivf_centroids — a
# trained k-means would be seed-dependent and un-oracle-able); the
# exemplar is the member closest to the cell centroid (rounded-4dp
# cosine, vec_id tiebreak — the same rank-on-rounded pattern as
# ann_topk_bruteforce).
# Plan shape: one centroid shuffle (element-wise aggregate, |cells|
# rows → broadcast), one per-cell window (cells bound the partition),
# one broadcast join of the |cells|-row exemplar table. No pairwise
# math: each member is compared to its exemplar only — O(n), not
# O(n²/cells).
SEMDEDUP_THRESHOLD = 0.35

_SEMDEDUP_ORACLE = f"""
WITH {_DIMS_DUCK},
cent AS (
    SELECT e.label, d.i, avg(d.x) AS c
    FROM dims d JOIN embeddings e USING (vec_id)
    GROUP BY e.label, d.i
),
cos_c AS (
    SELECT e.vec_id, e.label,
           round(sum(d.x * c.c) / (sqrt(sum(d.x * d.x))
                 * sqrt(sum(c.c * c.c))) * 10000) / 10000 + 0.0 AS cc
    FROM embeddings e
    JOIN dims d USING (vec_id)
    JOIN cent c ON c.label = e.label AND c.i = d.i
    GROUP BY e.vec_id, e.label
),
ranked AS (
    SELECT vec_id, label, cc,
           row_number() OVER (PARTITION BY label
                              ORDER BY cc DESC, vec_id) AS rn
    FROM cos_c
),
reps AS (SELECT label, vec_id AS rep_id FROM ranked WHERE rn = 1),
pair AS (
    SELECT m.vec_id, m.label, r.rep_id,
           sum(dm.x * dr.x) / (sqrt(sum(dm.x * dm.x))
               * sqrt(sum(dr.x * dr.x))) AS cr
    FROM ranked m
    JOIN reps r ON r.label = m.label
    JOIN dims dm ON dm.vec_id = m.vec_id
    JOIN dims dr ON dr.vec_id = r.rep_id AND dr.i = dm.i
    WHERE m.rn > 1
    GROUP BY m.vec_id, m.label, r.rep_id
)
SELECT vec_id, label, rep_id,
       round(cr * 10000) / 10000 + 0.0 AS cos_to_rep,
       (round(cr * 10000) / 10000 + 0.0 >= {SEMDEDUP_THRESHOLD})
           AS is_semdup
FROM pair
"""


@register("semdedup_embeddings", oracle=_SEMDEDUP_ORACLE)
def semdedup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = read_table(spark, sf_dir, "embeddings")
    # centroid norms hoisted onto the |cells|-row table (r13, guide
    # §1.2): the per-pair cosine recomputed sqrt(Σc²) per MEMBER row;
    # cosine_pre is bit-identical
    cents = S.ivf_centroids(emb).withColumn(
        "ncent", A.l2_norm(F.col("centroid"))
    )
    vec = A.as_double_array(F.col("embedding"))
    scored = emb.join(
        F.broadcast(cents), emb["label"] == cents["cell"]
    ).select(
        "vec_id",
        "label",
        "embedding",
        R.r(
            A.cosine_pre(
                vec, F.col("centroid"), A.l2_norm(vec), F.col("ncent")
            ),
            4,
        ).alias("cc"),
    )
    w = Window.partitionBy("label").orderBy(
        F.desc("cc"), F.asc("vec_id")
    )
    ranked = scored.withColumn("rn", F.row_number().over(w))
    reps = ranked.filter(F.col("rn") == 1).select(
        F.col("label").alias("r_label"),
        F.col("vec_id").alias("rep_id"),
        F.col("embedding").alias("rep_emb"),
        A.l2_norm(A.as_double_array(F.col("embedding"))).alias("n_rep"),
    )
    members = ranked.filter(F.col("rn") > 1)
    mvec = A.as_double_array(F.col("embedding"))
    # rep norm hoisted onto the per-label rep row (r13, guide §1.2)
    cr = A.cosine_pre(
        mvec,
        A.as_double_array(F.col("rep_emb")),
        A.l2_norm(mvec),
        F.col("n_rep"),
    )
    out = members.join(
        F.broadcast(reps), members["label"] == reps["r_label"]
    )
    rounded = R.r(cr, 4)
    return out.select(
        "vec_id",
        "label",
        "rep_id",
        rounded.alias("cos_to_rep"),
        (rounded >= SEMDEDUP_THRESHOLD).alias("is_semdup"),
    )


# --- corpus-calibrated uniform quantization audit -------------------------
# The PQ-pipeline building block that IS oracle-able without a trained
# codebook: per-dimension uniform quantizer calibrated on corpus
# min/max (16 levels = 4 bits/dim), reconstruction-error audit per
# label. Complements embedding_quantize_int8 (per-VECTOR max-abs
# scaling) with the per-DIMENSION corpus-calibrated scheme.
# Plan shape: one global min/max aggregate (1 row, broadcast), narrow
# quantize + error map, one per-label regroup. Error terms go through
# DECIMAL(30,8) (pagerank's exactness trick) so Spark's index-order
# fold and DuckDB's row-order sum cannot diverge at the rounding.
_PQ_LEVELS = 15  # max level index (16 levels)

_PQ_ORACLE = f"""
WITH {_DIMS_DUCK},
rng AS (SELECT i, min(x) AS mn, max(x) AS mx FROM dims GROUP BY i),
q AS (
    SELECT d.vec_id, d.x,
           r.mn + floor((d.x - r.mn) / (r.mx - r.mn) * {_PQ_LEVELS} + 0.5)
               * (r.mx - r.mn) / {_PQ_LEVELS} AS xq
    FROM dims d JOIN rng r USING (i)
),
e AS (
    SELECT emb.label, q.vec_id,
           CAST((q.x - q.xq) * (q.x - q.xq) AS DECIMAL(30,8)) AS t,
           abs(q.x - q.xq) AS a
    FROM q JOIN embeddings emb USING (vec_id)
)
SELECT label,
       count(DISTINCT vec_id)::BIGINT AS n_vecs,
       round(sum(t)::DOUBLE / count(*) * 1000000) / 1000000 + 0.0 AS mse,
       round(max(a) * 1000000) / 1000000 + 0.0 AS max_abs_err
FROM e
GROUP BY label
"""


@register("embedding_pq_audit", oracle=_PQ_ORACLE)
def embedding_pq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    vec = A.as_double_array(F.col("embedding"))
    rng = emb.agg(
        F.array(
            *[F.min(F.element_at(vec, i + 1)) for i in range(DIM)]
        ).alias("mn"),
        F.array(
            *[F.max(F.element_at(vec, i + 1)) for i in range(DIM)]
        ).alias("mx"),
    )
    with_rng = emb.select("vec_id", "label", vec.alias("v")).crossJoin(
        F.broadcast(rng)
    )

    def _xq(i):
        x = F.element_at(F.col("v"), i)
        mn = F.element_at(F.col("mn"), i)
        mx = F.element_at(F.col("mx"), i)
        return mn + F.floor(
            (x - mn) / (mx - mn) * _PQ_LEVELS + 0.5
        ) * (mx - mn) / _PQ_LEVELS

    idx = F.sequence(F.lit(1), F.lit(DIM))
    diffs = F.transform(
        idx, lambda i: F.element_at(F.col("v"), i) - _xq(i)
    )
    # re-cast inside the merge: Spark's decimal-addition typing widens
    # (38,8)+(30,8) to (38,7), which then fails the accumulator check
    dec_sum = F.aggregate(
        F.transform(diffs, lambda d: (d * d).cast("decimal(30,8)")),
        F.lit(0).cast("decimal(38,8)"),
        lambda acc, v: (acc + v).cast("decimal(38,8)"),
    )
    max_abs = F.array_max(F.transform(diffs, lambda d: F.abs(d)))
    per_vec = with_rng.select(
        "vec_id", "label", dec_sum.alias("ds"), max_abs.alias("ma")
    )
    n_elems = F.count(F.lit(1)) * DIM
    return per_vec.groupBy("label").agg(
        F.countDistinct("vec_id").alias("n_vecs"),
        (
            F.round(
                F.sum("ds").cast("double") / n_elems * 1000000.0
            )
            / 1000000.0
            + 0.0
        ).alias("mse"),
        (F.round(F.max("ma") * 1000000.0) / 1000000.0 + 0.0).alias(
            "max_abs_err"
        ),
    )


# --- cross-modal retrieval evaluation --------------------------------------
# The eval-metric op a multimodal training pipeline runs on its
# (text ↔ embedding) pairs: for a deterministic query sample, do
# brute-force cosine retrieval and score label-match hit@k / mean
# reciprocal rank. Shape (r4 rework of VERDICT r3 "What's wrong" #1):
# the query set is a FIXED-COUNT deterministic sample — the Q lowest
# md5-hash-ordered vec_ids — built as a TakeOrderedAndProject subtree
# and shipped via a broadcast nested-loop join, so driver memory and
# plan size are O(Q) constants and the scan is O(N*Q) with fixed Q at
# any corpus size (the old vec_id % 50 sample was a corpus FRACTION
# collected into a plan literal: O(N) driver, O(N^2/50) scan).
# ONE corpus pass scores all queries; per-query top-k via window over
# the Q*k candidate set.
_RETRIEVAL_K = 10
_RETRIEVAL_Q = 32  # fixed query-set size at every corpus scale
_QS_HASH_DUCK = _H.duck_hash_uint(_H.sql_salted("vec_id", "'qs'"), 8)

_RETRIEVAL_ORACLE = f"""
WITH {_DIMS_DUCK},
q AS (SELECT vec_id AS qid, label AS qlabel FROM embeddings
      ORDER BY {_QS_HASH_DUCK}, vec_id LIMIT {_RETRIEVAL_Q}),
scores AS (
    SELECT q.qid, q.qlabel, d.vec_id,
           round(sum(d.x * qd.x) / (sqrt(sum(d.x * d.x))
                 * sqrt(sum(qd.x * qd.x))) * 10000) / 10000 + 0.0 AS c
    FROM q
    JOIN dims qd ON qd.vec_id = q.qid
    JOIN dims d ON d.i = qd.i AND d.vec_id <> q.qid
    GROUP BY q.qid, q.qlabel, d.vec_id
),
ranked AS (
    SELECT qid, qlabel, vec_id, c,
           row_number() OVER (PARTITION BY qid
                              ORDER BY c DESC, vec_id) AS rnk
    FROM scores
),
hits AS (
    SELECT r.qid,
           max(CASE WHEN e.label = r.qlabel THEN 1 ELSE 0 END) AS hit,
           min(CASE WHEN e.label = r.qlabel THEN r.rnk END) AS first_rel
    FROM ranked r JOIN embeddings e ON e.vec_id = r.vec_id
    WHERE r.rnk <= {_RETRIEVAL_K}
    GROUP BY r.qid
)
SELECT count(*)::BIGINT AS n_queries,
       sum(hit)::BIGINT AS n_hits,
       round(sum(hit) * 10000.0 / count(*)) / 10000 + 0.0
           AS hit_rate_at_k,
       round(sum(CAST(coalesce(1.0 / first_rel, 0.0)
                 AS DECIMAL(30,8)))::DOUBLE * 10000 / count(*))
           / 10000 + 0.0 AS mrr_at_k
FROM hits
"""


def _query_sample(emb: DataFrame, q: int, cols: list) -> DataFrame:
    """Fixed-count deterministic query sample: the ``q`` lowest rows
    under the shared md5-unit hash of vec_id (salt 'qs'), tie-broken
    by vec_id. Plans as TakeOrderedAndProject — bounded at any corpus
    size — and is meant to be broadcast into the scoring join."""
    return (
        emb.select(*cols)
        .orderBy(_H.hash_uint(F.col("vec_id"), "qs", 8), F.asc("vec_id"))
        .limit(q)
    )


@register("crossmodal_retrieval_eval", oracle=_RETRIEVAL_ORACLE)
def crossmodal_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = read_table(spark, sf_dir, "embeddings")
    qdf = _query_sample(
        emb,
        _RETRIEVAL_Q,
        [
            F.col("vec_id").alias("qid"),
            F.col("label").alias("qlabel"),
            A.as_double_array(F.col("embedding")).alias("qv"),
        ],
    ).withColumn("nq", A.l2_norm(F.col("qv")))
    vec = A.as_double_array(F.col("embedding"))
    # norms hoisted out of the 16-way pair fan-out (r13, guide §1.2
    # — the map_retrieval_eval recipe): bit-identical 4dp snap
    scored = (
        emb.select("vec_id", "label", vec.alias("v"))
        .withColumn("nv", A.l2_norm(F.col("v")))
        .crossJoin(F.broadcast(qdf))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "qlabel",
            "vec_id",
            "label",
            R.r(
                A.cosine_pre(
                    F.col("v"), F.col("qv"), F.col("nv"), F.col("nq")
                ),
                4,
            ).alias("c"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("c"), F.asc("vec_id"))
    ranked = scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= _RETRIEVAL_K
    )
    hits = ranked.groupBy("qid").agg(
        F.max(
            F.when(F.col("label") == F.col("qlabel"), 1).otherwise(0)
        ).alias("hit"),
        F.min(
            F.when(F.col("label") == F.col("qlabel"), F.col("rnk"))
        ).alias("first_rel"),
    )
    n = F.count(F.lit(1))
    return hits.agg(
        n.alias("n_queries"),
        F.sum("hit").cast("long").alias("n_hits"),
        (F.round(F.sum("hit") * 10000.0 / n) / 10000.0 + 0.0).alias(
            "hit_rate_at_k"
        ),
        (
            F.round(
                F.sum(
                    F.coalesce(
                        F.lit(1.0) / F.col("first_rel"), F.lit(0.0)
                    ).cast("decimal(30,8)")
                ).cast("double")
                * 10000.0
                / n
            )
            / 10000.0
            + 0.0
        ).alias("mrr_at_k"),
    )


# --- IVF index-build audit: posting-list statistics ------------------------
# Before serving an IVF index you audit the partition it induces:
# posting-list sizes per cell, the imbalance factor (max/mean — the
# tail-latency predictor: a probe into the fattest cell costs
# imbalance× the average), and each cell's mean distance to centroid
# (quantization coarseness). One centroid shuffle + one assignment
# regroup; all |cells|-bounded output.
_IVF_STATS_ORACLE = f"""
WITH {_DIMS_DUCK},
cent AS (
    SELECT e.label AS cell, d.i, avg(d.x) AS m
    FROM dims d JOIN embeddings e ON e.vec_id = d.vec_id
    GROUP BY e.label, d.i
),
cc AS (
    SELECT e.vec_id, e.label AS cell,
           sum(d.x * c.m) / (sqrt(sum(d.x * d.x)) * sqrt(sum(c.m * c.m)))
               AS cos_c
    FROM embeddings e
    JOIN dims d ON d.vec_id = e.vec_id
    JOIN cent c ON c.cell = e.label AND c.i = d.i
    GROUP BY e.vec_id, e.label
),
per_cell AS (
    SELECT cell, count(*)::BIGINT AS posting_size,
           round(avg(cos_c) * 10000) / 10000 + 0.0 AS mean_cos_to_centroid
    FROM cc GROUP BY cell
),
tot AS (SELECT max(posting_size) AS mx,
               avg(posting_size) AS mean_sz FROM per_cell)
SELECT p.cell, p.posting_size, p.mean_cos_to_centroid,
       round(t.mx / t.mean_sz * 10000) / 10000 + 0.0 AS imbalance
FROM per_cell p CROSS JOIN tot t
"""


@register("ivf_posting_stats", oracle=_IVF_STATS_ORACLE)
def ivf_posting_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    # centroid norm hoisted onto the |cells|-row table (r13, guide
    # §1.2); cosine_pre is bit-identical
    cents = S.ivf_centroids(emb).withColumn(
        "ncent", A.l2_norm(F.col("centroid"))
    )
    vec = A.as_double_array(F.col("embedding"))
    cc = emb.join(
        F.broadcast(cents), emb["label"] == cents["cell"]
    ).select(
        "cell",
        A.cosine_pre(
            vec, F.col("centroid"), A.l2_norm(vec), F.col("ncent")
        ).alias("cos_c"),
    )
    per_cell = cc.groupBy("cell").agg(
        F.count(F.lit(1)).alias("posting_size"),
        (F.round(F.avg("cos_c") * 10000.0) / 10000.0 + 0.0).alias(
            "mean_cos_to_centroid"
        ),
    )
    tot = per_cell.agg(
        F.max("posting_size").alias("mx"),
        F.avg("posting_size").alias("mean_sz"),
    )
    return per_cell.crossJoin(F.broadcast(tot)).select(
        "cell",
        "posting_size",
        "mean_cos_to_centroid",
        (
            F.round(F.col("mx") / F.col("mean_sz") * 10000.0) / 10000.0
            + 0.0
        ).alias("imbalance"),
    )


# --- hard-negative mining --------------------------------------------------
# Contrastive-training data prep: for each anchor, the HARDEST
# negative (highest-cosine vector with a DIFFERENT label) found
# within its LSH bucket — the bucketed form of hard-negative mining:
# candidates are bucket-local (random-hyperplane signs), so the
# pairwise cosine work is Σ bucket² like every LSH op here, never
# corpus². Corpus-scalable (r4): plane count grows with corpus size
# (lsh_planes_for) and mega-buckets above LSH_MAX_BUCKET are dropped
# before the pair join, bounding candidates at n_buckets * cap².
# Anchors whose bucket holds no cross-label vector — or whose bucket
# was cap-dropped — get no row (mine from more buckets by re-hashing
# in production — the recall trade is the same one ann_lsh_buckets
# documents).
def _hardneg_oracle() -> str:
    return f"""
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
    WHERE ea.label <> eb.label
),
scored AS (
    SELECT p.anchor, p.anchor_label, p.cand, p.cand_label,
           round(sum(da.x * db.x) / (sqrt(sum(da.x * da.x))
                 * sqrt(sum(db.x * db.x))) * 10000) / 10000 + 0.0 AS c
    FROM pairs p
    JOIN dims da ON da.vec_id = p.anchor
    JOIN dims db ON db.vec_id = p.cand AND db.i = da.i
    GROUP BY p.anchor, p.anchor_label, p.cand, p.cand_label
)
SELECT anchor, anchor_label, cand AS hard_negative,
       cand_label AS negative_label, c AS cosine
FROM scored
QUALIFY row_number() OVER (PARTITION BY anchor
                           ORDER BY c DESC, cand) = 1
"""


@register("hard_negative_mining", oracle=_hardneg_oracle())
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

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
        & (F.col("anchor") != F.col("cand"))
        & (F.col("anchor_label") != F.col("cand_label")),
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
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "anchor",
            "anchor_label",
            F.col("cand").alias("hard_negative"),
            F.col("cand_label").alias("negative_label"),
            F.col("c").alias("cosine"),
        )
    )


# --- Matryoshka truncation audit -------------------------------------------
# MRL-style question: how much retrieval quality survives truncating
# embeddings to the first k dims (the memory/latency knob modern
# embedding models expose)? For each sampled query: top-10 by
# truncated cosine vs top-10 by full cosine, report the overlap.
# Same one-corpus-pass batch shape as crossmodal_retrieval_eval —
# and, like it (r4), the query set is a FIXED-COUNT hash-ordered
# sample shipped via broadcast join, never a corpus fraction
# collected into the plan; the scan is O(N*Q) with Q constant. The
# truncated scoring reads the SAME vectors (slice, don't re-store).
_MRL_DIM = 16
_MRL_Q = 16  # fixed query-set size at every corpus scale
_MRL_K = 10

_MRL_ORACLE = f"""
WITH {_DIMS_DUCK},
q AS (SELECT vec_id AS qid FROM embeddings
      ORDER BY {_QS_HASH_DUCK}, vec_id LIMIT {_MRL_Q}),
full_s AS (
    SELECT q.qid, d.vec_id,
           round(sum(d.x * qd.x) / (sqrt(sum(d.x * d.x))
                 * sqrt(sum(qd.x * qd.x))) * 10000) / 10000 + 0.0 AS c
    FROM q
    JOIN dims qd ON qd.vec_id = q.qid
    JOIN dims d ON d.i = qd.i AND d.vec_id <> q.qid
    GROUP BY q.qid, d.vec_id
),
trunc_s AS (
    SELECT q.qid, d.vec_id,
           round(sum(d.x * qd.x) / (sqrt(sum(d.x * d.x))
                 * sqrt(sum(qd.x * qd.x))) * 10000) / 10000 + 0.0 AS c
    FROM q
    JOIN dims qd ON qd.vec_id = q.qid AND qd.i <= {_MRL_DIM}
    JOIN dims d ON d.i = qd.i AND d.vec_id <> q.qid
    GROUP BY q.qid, d.vec_id
),
top_full AS (
    SELECT qid, vec_id FROM (
        SELECT qid, vec_id,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY c DESC, vec_id) AS rn
        FROM full_s) WHERE rn <= {_MRL_K}
),
top_trunc AS (
    SELECT qid, vec_id FROM (
        SELECT qid, vec_id,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY c DESC, vec_id) AS rn
        FROM trunc_s) WHERE rn <= {_MRL_K}
),
ov AS (
    SELECT f.qid, count(*) AS n_overlap
    FROM top_full f JOIN top_trunc t
      ON t.qid = f.qid AND t.vec_id = f.vec_id
    GROUP BY f.qid
)
SELECT q.qid, coalesce(ov.n_overlap, 0)::BIGINT AS overlap_at_k,
       round(coalesce(ov.n_overlap, 0) * 10000.0 / {_MRL_K}) / 10000
           + 0.0 AS recall_vs_full
FROM q LEFT JOIN ov ON ov.qid = q.qid
"""


@register("matryoshka_truncation_audit", oracle=_MRL_ORACLE)
def matryoshka_truncation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = read_table(spark, sf_dir, "embeddings")
    qdf = _query_sample(
        emb,
        _MRL_Q,
        [
            F.col("vec_id").alias("qid"),
            A.as_double_array(F.col("embedding")).alias("qv"),
        ],
    ).select(
        "qid",
        "qv",
        A.l2_norm(F.col("qv")).alias("nq"),
        F.slice(F.col("qv"), 1, _MRL_DIM).alias("qvt"),
        A.l2_norm(F.slice(F.col("qv"), 1, _MRL_DIM)).alias("nqt"),
    )
    vec = A.as_double_array(F.col("embedding"))
    # full AND truncated norms hoisted out of the Q-way fan-out (r13,
    # guide §1.2): each was recomputed per (vector, query) pair;
    # cosine_pre is bit-identical
    scored = (
        emb.select("vec_id", vec.alias("v"))
        .select(
            "vec_id",
            "v",
            A.l2_norm(F.col("v")).alias("nv"),
            F.slice(F.col("v"), 1, _MRL_DIM).alias("vt"),
            A.l2_norm(F.slice(F.col("v"), 1, _MRL_DIM)).alias("nvt"),
        )
        .crossJoin(F.broadcast(qdf))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            R.r(
                A.cosine_pre(
                    F.col("v"), F.col("qv"), F.col("nv"), F.col("nq")
                ),
                4,
            ).alias("c_full"),
            R.r(
                A.cosine_pre(
                    F.col("vt"), F.col("qvt"), F.col("nvt"), F.col("nqt")
                ),
                4,
            ).alias("c_trunc"),
        )
    )
    wf = Window.partitionBy("qid").orderBy(F.desc("c_full"), F.asc("vec_id"))
    wt = Window.partitionBy("qid").orderBy(F.desc("c_trunc"), F.asc("vec_id"))
    both = scored.select(
        "qid",
        "vec_id",
        F.row_number().over(wf).alias("rf"),
        F.row_number().over(wt).alias("rt"),
    )
    ov = (
        both.filter((F.col("rf") <= _MRL_K) & (F.col("rt") <= _MRL_K))
        .groupBy("qid")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return qdf.select("qid").join(ov, "qid", "left").select(
        "qid",
        F.coalesce(F.col("n_overlap"), F.lit(0)).cast("long").alias(
            "overlap_at_k"
        ),
        (
            F.round(
                F.coalesce(F.col("n_overlap"), F.lit(0))
                * 10000.0
                / _MRL_K
            )
            / 10000.0
            + 0.0
        ).alias("recall_vs_full"),
    )


# --- two-stage ANN: int8 coarse scan → exact rerank ------------------------
# The standard serving trade for vector search at scale: scan the
# corpus with CHEAP quantized integer dot products (4x less memory
# traffic, SIMD-friendly), keep a generous coarse top-C, then re-score
# only those C candidates in full double precision for the final
# top-k. Both stages are TakeOrderedAndProject (per-partition heaps +
# driver merge, no global sort); the second stage's input is C rows —
# constant — so the exact cosine math never touches the corpus. The
# int8 coarse dot is integer-exact in both engines (shared
# half-away-from-zero quantization, embedding_quantize_int8), so the
# candidate set is deterministic; no float-tie hazard at the cut.
_RERANK_COARSE = 50
_RERANK_K = 10

_RERANK_ORACLE = f"""
WITH {_DIMS_DUCK},
s AS (SELECT vec_id, max(abs(x)) AS mx FROM dims GROUP BY vec_id),
q8 AS (
    SELECT d.vec_id, d.i, d.x,
           CASE WHEN s.mx = 0 THEN 0
                ELSE greatest(-127, least(127,
                    (CASE WHEN d.x >= 0
                          THEN floor(abs(d.x) * 127.0 / s.mx + 0.5)
                          ELSE -floor(abs(d.x) * 127.0 / s.mx + 0.5)
                     END)::BIGINT))
           END AS qi
    FROM dims d JOIN s USING (vec_id)
),
qv AS (SELECT i, qi, x FROM q8 WHERE vec_id = {QUERY_VEC_ID}),
coarse AS (
    SELECT d.vec_id, sum(d.qi * qv.qi)::BIGINT AS coarse_dot
    FROM q8 d JOIN qv ON d.i = qv.i
    WHERE d.vec_id <> {QUERY_VEC_ID}
    GROUP BY d.vec_id
    ORDER BY coarse_dot DESC, d.vec_id
    LIMIT {_RERANK_COARSE}
),
exact AS (
    SELECT c.vec_id, c.coarse_dot,
           round(sum(d.x * qd.x) / (sqrt(sum(d.x * d.x))
                 * sqrt(sum(qd.x * qd.x))) * 10000) / 10000 + 0.0
               AS cosine
    FROM coarse c
    JOIN dims d ON d.vec_id = c.vec_id
    JOIN qv qd ON qd.i = d.i
    GROUP BY c.vec_id, c.coarse_dot
)
SELECT e.vec_id, emb.label, e.coarse_dot, e.cosine
FROM exact e JOIN embeddings emb ON emb.vec_id = e.vec_id
ORDER BY e.cosine DESC, e.vec_id
LIMIT {_RERANK_K}
"""


def _int8_quantized(emb: DataFrame) -> DataFrame:
    """(vec_id, label, e: array<double>, q: array<long>) — the shared
    half-away-from-zero per-vector symmetric quantization (same
    formula as embedding_quantize_int8 / its oracle)."""
    sel = emb.select(
        "vec_id", "label", A.as_double_array(F.col("embedding")).alias("e")
    )
    mx = F.array_max(F.transform(F.col("e"), lambda x: F.abs(x)))
    with_mx = sel.select("vec_id", "label", "e", mx.alias("mx"))
    qarr = F.when(
        F.col("mx") == 0,
        F.transform(F.col("e"), lambda x: F.lit(0).cast("long")),
    ).otherwise(
        F.transform(
            F.col("e"),
            lambda x: F.greatest(
                F.lit(-127),
                F.least(
                    F.lit(127),
                    (
                        F.signum(x)
                        * F.floor(F.abs(x) * 127.0 / F.col("mx") + 0.5)
                    ).cast("long"),
                ),
            ),
        )
    )
    return with_mx.select("vec_id", "label", "e", qarr.alias("q"))


@register("ann_rerank_twostage", oracle=_RERANK_ORACLE)
def ann_rerank_twostage(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    quant = _int8_quantized(emb)
    # query norm hoisted onto the 1-row broadcast side (r13, guide §1.2)
    qside = quant.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("e").alias("qe"),
        F.col("q").alias("qq"),
        A.l2_norm(F.col("e")).alias("nqe"),
    )
    coarse_dot = F.aggregate(
        F.zip_with(F.col("q"), F.col("qq"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    coarse = (
        quant.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(qside))
        .select(
            "vec_id", "label", "e", "qe", "nqe",
            coarse_dot.alias("coarse_dot"),
        )
        .orderBy(F.desc("coarse_dot"), F.asc("vec_id"))
        .limit(_RERANK_COARSE)
    )
    return (
        coarse.select(
            "vec_id",
            "label",
            "coarse_dot",
            R.r(
                A.cosine_pre(
                    F.col("e"),
                    F.col("qe"),
                    A.l2_norm(F.col("e")),
                    F.col("nqe"),
                ),
                4,
            ).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(_RERANK_K)
    )


# --- embedding centering / anisotropy audit --------------------------------
# The preprocessing check run before cosine retrieval is trusted:
# embedding spaces are notoriously anisotropic (variance concentrated
# in a few dims), which centering exposes. One element-wise aggregate
# computes per-dim mean and raw second moment; variance follows as
# E[x²]−E[x]² per dim (decimal-exact sums), reported as total
# variance, the top variance dims, and the anisotropy ratio
# max/mean — all O(dim) output at any corpus size.
_ANISO_ORACLE = f"""
WITH {_DIMS_DUCK},
m AS (
    SELECT i,
           sum(CAST(x AS DECIMAL(30,8)))::DOUBLE / count(*) AS mu,
           sum(CAST(x * x AS DECIMAL(30,8)))::DOUBLE / count(*) AS m2
    FROM dims GROUP BY i
),
v AS (SELECT i, m2 - mu * mu AS var FROM m),
tot AS (
    SELECT sum(var) AS total_var, max(var) AS max_var,
           avg(var) AS mean_var
    FROM v
)
SELECT v.i AS dim,
       round(v.var * 1000000) / 1000000 + 0.0 AS variance,
       round(t.total_var * 1000000) / 1000000 + 0.0 AS total_variance,
       round(t.max_var / t.mean_var * 10000) / 10000 + 0.0
           AS anisotropy
FROM v CROSS JOIN tot t
ORDER BY v.var DESC, v.i
LIMIT 5
"""


@register("embedding_anisotropy_audit", oracle=_ANISO_ORACLE)
def embedding_anisotropy_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    vec = A.as_double_array(F.col("embedding"))
    aggs = []
    for i in range(DIM):
        x = F.element_at(vec, i + 1)
        aggs.append(
            F.sum(x.cast("decimal(30,8)")).cast("double").alias(f"s{i}")
        )
        aggs.append(
            F.sum((x * x).cast("decimal(30,8)"))
            .cast("double")
            .alias(f"q{i}")
        )
    row = emb.agg(F.count(F.lit(1)).alias("n"), *aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("dim"),
                (
                    F.col(f"q{i}") / F.col("n")
                    - (F.col(f"s{i}") / F.col("n"))
                    * (F.col(f"s{i}") / F.col("n"))
                ).alias("var"),
            )
            for i in range(DIM)
        ]
    )
    v = row.select(F.explode(pairs).alias("p")).select(
        F.col("p.dim").alias("dim"), F.col("p.var").alias("var")
    )
    tot = v.agg(
        F.sum("var").alias("total_var"),
        F.max("var").alias("max_var"),
        F.avg("var").alias("mean_var"),
    )
    r6 = lambda c: F.round(c * 1000000.0) / 1000000.0 + 0.0  # noqa: E731
    return (
        v.crossJoin(F.broadcast(tot))
        .select(
            "dim",
            r6(F.col("var")).alias("variance"),
            r6(F.col("total_var")).alias("total_variance"),
            (
                F.round(F.col("max_var") / F.col("mean_var") * 10000.0)
                / 10000.0
                + 0.0
            ).alias("anisotropy"),
        )
        .orderBy(F.desc("variance"), F.asc("dim"))
        .limit(5)
    )


# --- Johnson-Lindenstrauss random-projection distortion audit ---------------
# The dimensionality-reduction scale path: project 64-dim embeddings
# to 16 dims with a deterministic ±1 sign matrix (Achlioptas 2003 —
# database-friendly random projections) and measure how well pairwise
# squared distances survive, the JL lemma's guarantee. The sign matrix
# is md5-derived, so BOTH engines (and this module at import time)
# reconstruct the identical matrix with no shipped state. Projection
# is row-local (a per-row fold against plan literals — at 100 TB the
# full corpus projects in one narrow map, no shuffle); the distortion
# AUDIT pairs only a fixed 32-vector hash-ordered sample (496 pairs,
# bounded at any corpus size — same sampling contract as the
# retrieval evals above).
_JL_K = 16
_JL_Q = 32


def _jl_sign(j: int, i: int) -> float:
    """+1/-1 from the first md5 hex nibble of 'j_i' — the same
    high-bit parity test simhash uses (operators/dedup.py)."""
    import hashlib

    h = hashlib.md5(f"{j}_{i}".encode()).hexdigest()
    return 1.0 if h[0] in "89abcdef" else -1.0


_JL_SIGNS = [
    [_jl_sign(j, i) for i in range(1, DIM + 1)] for j in range(1, _JL_K + 1)
]

_JL_HASH_DUCK = _H.duck_hash_uint(_H.sql_salted("vec_id", "'jl'"), 8)

_JL_ORACLE = f"""
WITH signs AS (
    SELECT j.j, i.i,
           CASE WHEN strpos('89abcdef',
                     substr(md5(j.j::VARCHAR || '_' || i.i::VARCHAR), 1, 1))
                     > 0
                THEN 1.0 ELSE -1.0 END AS s
    FROM generate_series(1, {_JL_K}) AS j(j),
         generate_series(1, {DIM}) AS i(i)
),
q AS (SELECT vec_id, embedding FROM embeddings
      ORDER BY {_JL_HASH_DUCK}, vec_id LIMIT {_JL_Q}),
dims AS (
    SELECT vec_id, g.i, embedding[g.i]::DOUBLE AS x
    FROM q, generate_series(1, {DIM}) AS g(i)
),
proj AS (
    SELECT d.vec_id, s.j, sum(s.s * d.x) / sqrt({_JL_K}.0) AS y
    FROM dims d JOIN signs s ON s.i = d.i
    GROUP BY d.vec_id, s.j
),
pairs AS (
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
    FROM q a JOIN q b ON a.vec_id < b.vec_id
),
o2 AS (
    SELECT p.vec_a, p.vec_b,
           sum((da.x - db.x) * (da.x - db.x)) AS d2o
    FROM pairs p
    JOIN dims da ON da.vec_id = p.vec_a
    JOIN dims db ON db.vec_id = p.vec_b AND db.i = da.i
    GROUP BY 1, 2
),
p2 AS (
    SELECT p.vec_a, p.vec_b,
           sum((pa.y - pb.y) * (pa.y - pb.y)) AS d2p
    FROM pairs p
    JOIN proj pa ON pa.vec_id = p.vec_a
    JOIN proj pb ON pb.vec_id = p.vec_b AND pb.j = pa.j
    GROUP BY 1, 2
)
SELECT o2.vec_a, o2.vec_b,
       round(o2.d2o * 10000) / 10000 + 0.0 AS d2_orig,
       round(p2.d2p * 10000) / 10000 + 0.0 AS d2_proj,
       CASE WHEN o2.d2o <> 0
            THEN round(p2.d2p / o2.d2o * 10000) / 10000 + 0.0
       END AS ratio
FROM o2 JOIN p2 ON p2.vec_a = o2.vec_a AND p2.vec_b = o2.vec_b
"""


@register("jl_projection_distortion", oracle=_JL_ORACLE)
def jl_projection_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL distortion report: (vec_a, vec_b, d2_orig, d2_proj, ratio)
    over the 496 sample pairs. The projection fold runs against the
    md5-derived ±1 matrix embedded as plan literals — row-local,
    whole-stage-codegen, zero shuffle; the pair join is a broadcast
    self-join of the 32-row sample."""
    emb = read_table(spark, sf_dir, "embeddings")
    sample = (
        emb.select(
            "vec_id", A.as_double_array(F.col("embedding")).alias("e")
        )
        .orderBy(_H.hash_uint(F.col("vec_id"), "jl", 8), F.asc("vec_id"))
        .limit(_JL_Q)
    )
    k_sqrt = float(_JL_K) ** 0.5
    proj = F.array(
        *[
            (
                F.aggregate(
                    F.zip_with(
                        F.array(*[F.lit(v) for v in row]),
                        F.col("e"),
                        lambda s, x: s * x,
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
                / k_sqrt
            )
            for row in _JL_SIGNS
        ]
    )
    projected = sample.select("vec_id", "e", proj.alias("y"))
    a = projected.select(
        F.col("vec_id").alias("vec_a"),
        F.col("e").alias("ea"),
        F.col("y").alias("ya"),
    )
    b = projected.select(
        F.col("vec_id").alias("vec_b"),
        F.col("e").alias("eb"),
        F.col("y").alias("yb"),
    )
    sq_dist = lambda u, v: F.aggregate(  # noqa: E731
        F.zip_with(u, v, lambda p, q: (p - q) * (p - q)),
        F.lit(0.0),
        lambda acc, d: acc + d,
    )
    d2o = sq_dist(F.col("ea"), F.col("eb"))
    d2p = sq_dist(F.col("ya"), F.col("yb"))
    return (
        a.join(F.broadcast(b), F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            d2o.alias("_d2o"),
            d2p.alias("_d2p"),
        )
        .select(
            "vec_a",
            "vec_b",
            R.r("_d2o", 4).alias("d2_orig"),
            R.r("_d2p", 4).alias("d2_proj"),
            F.when(
                F.col("_d2o") != 0, R.r(F.col("_d2p") / F.col("_d2o"), 4)
            ).alias("ratio"),
        )
    )


# --- IVF-PQ residual ANN (the production 100 TB composition) ---------------
# ann_ivf_topk prunes with coarse cells; ann_pq_adc_topk compresses
# with codebooks. The architecture real billion-scale indexes ship
# (FAISS IVFPQ, SCANN) COMPOSES them: a coarse quantizer picks nprobe
# cells, PQ is trained on the RESIDUAL (vector - its cell centroid)
# so the codebook spends its 4 bits/subspace on the within-cell
# spread instead of re-encoding cell positions, and ADC runs only
# inside the probed cells with a PER-CELL lookup table built from the
# query's residual against that cell's centroid. At 100 TB: centroids
# and codebook are broadcast-tiny, the codes table is 8 bytes/vector,
# and query cost is |probed cells| / |cells| of the corpus — the
# candidate volume is probe-bounded, never corpus-linear (SCALING.md).
# Determinism: every accumulation is a DECIMAL(30,8) term sum (the
# ann_pq_adc_topk pattern); probe and shortlist cuts order by rounded
# scores with cell/vec_id tie-breaks.
_IVFPQ_NPROBE = 2

_IVFPQ_ORACLE = f"""
WITH {_DIMS_DUCK},
norms AS (
    SELECT vec_id,
           sqrt(sum(CAST(x * x AS DECIMAL(30,8)))::DOUBLE) AS nrm
    FROM dims GROUP BY vec_id
),
unitv AS (
    SELECT dims.vec_id, dims.i, dims.x / n.nrm AS x
    FROM dims JOIN norms n ON n.vec_id = dims.vec_id
),
cellmap AS (SELECT vec_id, label AS cell FROM embeddings),
cent AS (
    SELECT cm.cell, u.i,
           sum(CAST(u.x AS DECIMAL(30,8)))::DOUBLE / count(*) AS m
    FROM unitv u JOIN cellmap cm ON cm.vec_id = u.vec_id
    GROUP BY cm.cell, u.i
),
qu AS (SELECT i, x AS qx FROM unitv WHERE vec_id = {QUERY_VEC_ID}),
cq AS (
    SELECT c.cell,
           sum(c.m * q.qx) / (sqrt(sum(c.m * c.m)) * sqrt(sum(q.qx * q.qx)))
               AS cqs
    FROM cent c JOIN qu q ON c.i = q.i
    GROUP BY c.cell
),
probe AS (
    SELECT cell FROM cq
    ORDER BY round(cqs * 10000) / 10000 DESC, cell LIMIT {_IVFPQ_NPROBE}
),
resid AS (
    SELECT u.vec_id, ((u.i - 1) // {_PQ_DSUB})::INT AS s,
           ((u.i - 1) % {_PQ_DSUB})::INT AS d, u.x - c.m AS r
    FROM unitv u
    JOIN cellmap cm ON cm.vec_id = u.vec_id
    JOIN cent c ON c.cell = cm.cell AND c.i = u.i
),
init AS (SELECT vec_id::INT AS cid, s, d, r AS c FROM resid WHERE vec_id < {_PQ_KC}),
a0d AS (
    SELECT v.vec_id, v.s, i.cid,
           sum(CAST((v.r - i.c) * (v.r - i.c) AS DECIMAL(30,8))) AS dist
    FROM resid v JOIN init i ON i.s = v.s AND i.d = v.d
    GROUP BY v.vec_id, v.s, i.cid
),
a0 AS (
    SELECT vec_id, s, cid FROM (
        SELECT vec_id, s, cid,
               row_number() OVER (PARTITION BY vec_id, s
                                  ORDER BY dist, cid) AS rn
        FROM a0d) WHERE rn = 1
),
cb AS (
    SELECT a0.cid, v.s, v.d,
           sum(CAST(v.r AS DECIMAL(30,8)))::DOUBLE / count(*) AS c
    FROM resid v JOIN a0 ON a0.vec_id = v.vec_id AND a0.s = v.s
    GROUP BY a0.cid, v.s, v.d
),
a1d AS (
    SELECT v.vec_id, v.s, cb.cid,
           sum(CAST((v.r - cb.c) * (v.r - cb.c) AS DECIMAL(30,8))) AS dist
    FROM resid v JOIN cb ON cb.s = v.s AND cb.d = v.d
    GROUP BY v.vec_id, v.s, cb.cid
),
codes AS (
    SELECT vec_id, s, cid FROM (
        SELECT vec_id, s, cid,
               row_number() OVER (PARTITION BY vec_id, s
                                  ORDER BY dist, cid) AS rn
        FROM a1d) WHERE rn = 1
),
qres AS (
    SELECT p.cell, ((qu.i - 1) // {_PQ_DSUB})::INT AS s,
           ((qu.i - 1) % {_PQ_DSUB})::INT AS d, qu.qx - c.m AS qr
    FROM qu
    JOIN probe p ON TRUE
    JOIN cent c ON c.cell = p.cell AND c.i = qu.i
),
lut AS (
    SELECT qr.cell, cb.s, cb.cid,
           sum(CAST((cb.c - qr.qr) * (cb.c - qr.qr) AS DECIMAL(30,8))) AS ld
    FROM cb JOIN qres qr ON qr.s = cb.s AND qr.d = cb.d
    GROUP BY qr.cell, cb.s, cb.cid
),
adc AS (
    SELECT c.vec_id, sum(l.ld) AS adc_dist
    FROM codes c
    JOIN cellmap cm ON cm.vec_id = c.vec_id
    JOIN lut l ON l.cell = cm.cell AND l.s = c.s AND l.cid = c.cid
    WHERE c.vec_id <> {QUERY_VEC_ID}
    GROUP BY c.vec_id
),
top AS (
    SELECT vec_id, adc_dist FROM adc
    ORDER BY round(adc_dist::DOUBLE * 10000) / 10000, vec_id
    LIMIT {_PQ_SHORTLIST}
),
qf AS (SELECT i, x AS qx FROM dims WHERE vec_id = {QUERY_VEC_ID}),
ex AS (
    SELECT d.vec_id,
           sum(d.x * qf.qx) / (sqrt(sum(d.x * d.x)) * sqrt(sum(qf.qx * qf.qx)))
               AS cos_raw
    FROM dims d JOIN qf ON qf.i = d.i
    JOIN top t ON t.vec_id = d.vec_id
    GROUP BY d.vec_id
)
SELECT t.vec_id, e.label,
       round(t.adc_dist::DOUBLE * 10000) / 10000 + 0.0 AS adc_dist,
       round(ex.cos_raw, 4) AS cosine
FROM top t
JOIN ex ON ex.vec_id = t.vec_id
JOIN embeddings e ON e.vec_id = t.vec_id
ORDER BY round(ex.cos_raw, 4) DESC, t.vec_id
LIMIT 10
"""


@register("ann_ivfpq_topk", oracle=_IVFPQ_ORACLE)
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    emb = read_table(spark, sf_dir, "embeddings")
    qrow = (
        emb.filter(F.col("vec_id") == QUERY_VEC_ID).select("embedding").first()
    )
    if qrow is None:  # query vector absent (empty/regenerated data)
        return spark.sql(
            "SELECT CAST(NULL AS BIGINT) AS vec_id, CAST(NULL AS INT) AS label,"
            " CAST(NULL AS DOUBLE) AS adc_dist, CAST(NULL AS DOUBLE) AS cosine"
        ).limit(0)
    dec = "decimal(30,8)"
    raw = emb.select(
        "vec_id",
        F.col("label").alias("cell"),
        F.posexplode("embedding").alias("i", "xf"),
    ).select("vec_id", "cell", "i", F.col("xf").cast("double").alias("x"))
    norms = raw.groupBy("vec_id").agg(
        F.sqrt(
            F.sum((F.col("x") * F.col("x")).cast(dec)).cast("double")
        ).alias("nrm")
    )
    # unit vectors -> squared-L2 ADC ranking is monotone with cosine
    # (same normalization argument as ann_pq_adc_topk). unitv feeds
    # three consumers (cent, qu, resid) and cent feeds three (cq,
    # resid, qres) -- persist both so the corpus is scanned ONCE for
    # training (the unexecuted DAG would re-derive the posexplode +
    # norm-join subtree per consumer; see the r5 ann_pq_adc_topk
    # census fix, 17 scans -> 4)
    unitv = (
        raw.join(norms, "vec_id")
        .select("vec_id", "cell", "i", (F.col("x") / F.col("nrm")).alias("x"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # coarse centroids: decimal-exact mean per (cell, dim) -> both
    # engines divide identical exact sums by identical counts
    cent = (
        unitv.groupBy("cell", "i")
        .agg(
            (
                F.sum(F.col("x").cast(dec)).cast("double")
                / F.count(F.lit(1))
            ).alias("m")
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    qu = unitv.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        "i", F.col("x").alias("qx")
    )
    cq = (
        cent.join(F.broadcast(qu), "i")
        .groupBy("cell")
        .agg(
            (
                F.sum(F.col("m") * F.col("qx"))
                / (
                    F.sqrt(F.sum(F.col("m") * F.col("m")))
                    * F.sqrt(F.sum(F.col("qx") * F.col("qx")))
                )
            ).alias("cqs")
        )
    )
    probe = cq.orderBy(F.desc(R.r("cqs", 4)), F.asc("cell")).limit(
        _IVFPQ_NPROBE
    )
    # residuals: PQ spends its 16 codes/subspace on the WITHIN-cell
    # spread; resid feeds four consumers (init, both assigns, centroid
    # update), so persist the subtree once (codes table = production
    # materialized artifact; see ann_pq_adc_topk)
    resid = (
        unitv.join(
            F.broadcast(cent.withColumnRenamed("m", "m_")),
            ["cell", "i"],
        )
        .select(
            "vec_id",
            "cell",
            (F.col("i") / _PQ_DSUB).cast("int").alias("s"),
            (F.col("i") % _PQ_DSUB).cast("int").alias("d"),
            (F.col("x") - F.col("m_")).alias("r"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    init = resid.filter(F.col("vec_id") < _PQ_KC).select(
        F.col("vec_id").cast("int").alias("cid"), "s", "d",
        F.col("r").alias("c"),
    )

    def assign(points: DataFrame, codebook: DataFrame) -> DataFrame:
        # argmin via min(struct(dist, cid)): partial-aggregable
        # map-side combine, same (dist, cid) order as the oracle window
        dists = (
            points.join(F.broadcast(codebook), ["s", "d"])
            .groupBy("vec_id", "s", "cid")
            .agg(
                F.sum(
                    (
                        (F.col("r") - F.col("c")) * (F.col("r") - F.col("c"))
                    ).cast(dec)
                ).alias("dist")
            )
        )
        return (
            dists.groupBy("vec_id", "s")
            .agg(F.min(F.struct("dist", "cid")).alias("m"))
            .select("vec_id", "s", F.col("m.cid").alias("cid"))
        )

    a0 = assign(resid, init)
    cb = (
        resid.join(a0, ["vec_id", "s"])
        .groupBy("cid", "s", "d")
        .agg(
            (
                F.sum(F.col("r").cast(dec)).cast("double")
                / F.count(F.lit(1))
            ).alias("c")
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # codes persisted like ann_pq_adc_topk's: the 4-bit code table is
    # the materialized production artifact, and the decimal-exact
    # assign behind it is the priciest stage -- without this a repeat
    # query re-pays it even though resid/cb are cached
    codes = assign(resid, cb).persist(StorageLevel.MEMORY_AND_DISK)
    # per-probed-cell query residual -> per-cell ADC lookup table
    qres = (
        F.broadcast(qu)
        .join(F.broadcast(probe.select("cell")), F.lit(True))
        .join(
            F.broadcast(cent.withColumnRenamed("m", "m_")), ["cell", "i"]
        )
        .select(
            "cell",
            (F.col("i") / _PQ_DSUB).cast("int").alias("s"),
            (F.col("i") % _PQ_DSUB).cast("int").alias("d"),
            (F.col("qx") - F.col("m_")).alias("qr"),
        )
    )
    lut = (
        cb.join(F.broadcast(qres), ["s", "d"])
        .groupBy("cell", "s", "cid")
        .agg(
            F.sum(
                ((F.col("c") - F.col("qr")) * (F.col("c") - F.col("qr"))).cast(
                    dec
                )
            ).alias("ld")
        )
    )
    # ADC inside probed cells only: the lut join on (cell, s, cid)
    # drops every vector outside the probe set -> candidate volume is
    # probe-bounded, not corpus-linear
    cellmap = emb.select("vec_id", F.col("label").alias("cell"))
    adc = (
        codes.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(cellmap, "vec_id")
        .join(F.broadcast(lut), ["cell", "s", "cid"])
        .groupBy("vec_id")
        .agg(F.sum("ld").cast(dec).alias("adc_dist"))
    )
    top = adc.orderBy(
        R.r(F.col("adc_dist").cast("double"), 4), "vec_id"
    ).limit(_PQ_SHORTLIST)
    qv = F.array(*[F.lit(float(v)) for v in qrow[0]])
    # query norm once driver-side (r13, guide §1.2; IEEE-identical)
    nq = F.lit(A.py_l2_norm([float(v) for v in qrow[0]]))
    vec_x = A.as_double_array(F.col("embedding"))
    exact = emb.join(F.broadcast(top), "vec_id").select(
        "vec_id",
        "label",
        R.r(F.col("adc_dist").cast("double"), 4).alias("adc_dist"),
        R.r(
            A.cosine_pre(vec_x, qv, A.l2_norm(vec_x), nq), 4
        ).alias("cosine"),
    )
    return exact.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(10)


# --- embedding centroid drift (snapshot monitor) ---------------------------
# Model/data drift guard for a continuously re-embedded corpus: per
# label, compare the centroid of the FIRST half of vec_ids (ingestion
# order) against the SECOND half — centroid cosine near 1 and a norm
# ratio near 1 mean the embedding distribution is stable; a dropping
# cosine is the classic silent re-embedding / upstream-model-change
# signal. Two element-wise aggregates (per (label, half, dim)) with
# decimal-exact sums, then a |labels|-row rollup — no pairwise math,
# no corpus-sized shuffle beyond the one groupBy. Both engines divide
# identical exact decimal sums by identical counts, so the centroid
# doubles (and everything derived) are bit-identical.
_CENTROID_DRIFT_ORACLE = f"""
WITH {_DIMS_DUCK},
mx AS (SELECT max(vec_id) AS m FROM embeddings),
halves AS (
    SELECT e.label, d.vec_id, d.i, d.x,
           (d.vec_id * 2 < (SELECT m + 1 FROM mx)) AS first_half
    FROM dims d JOIN embeddings e ON e.vec_id = d.vec_id
),
cent AS (
    SELECT label, first_half, i,
           sum(CAST(x AS DECIMAL(30,8)))::DOUBLE / count(*) AS m
    FROM halves GROUP BY label, first_half, i
),
paired AS (
    SELECT a.label, a.i, a.m AS ma, b.m AS mb
    FROM cent a JOIN cent b
      ON a.label = b.label AND a.i = b.i
    WHERE a.first_half AND NOT b.first_half
)
SELECT label,
       round(sum(ma * mb) / (sqrt(sum(ma * ma)) * sqrt(sum(mb * mb))), 4)
           AS centroid_cosine,
       round(sqrt(sum(ma * ma)), 4) AS norm_first,
       round(sqrt(sum(mb * mb)), 4) AS norm_second,
       round(sqrt(sum((ma - mb) * (ma - mb))), 4) AS centroid_l2_shift
FROM paired
GROUP BY label
"""


@register("embedding_centroid_drift", oracle=_CENTROID_DRIFT_ORACLE)
def embedding_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    mx = emb.agg(F.max("vec_id").alias("m"))
    halves = (
        emb.crossJoin(F.broadcast(mx))
        .select(
            "label",
            (F.col("vec_id") * 2 < F.col("m") + 1).alias("first_half"),
            F.posexplode(F.col("embedding").cast("array<double>")).alias(
                "i0", "x"
            ),
        )
        .select("label", "first_half", (F.col("i0") + 1).alias("i"), "x")
    )
    cent = halves.groupBy("label", "first_half", "i").agg(
        (
            F.sum(F.col("x").cast("decimal(30,8)")).cast("double")
            / F.count(F.lit(1))
        ).alias("m")
    )
    a = cent.filter(F.col("first_half")).select(
        "label", "i", F.col("m").alias("ma")
    )
    b = cent.filter(~F.col("first_half")).select(
        F.col("label").alias("lb"), F.col("i").alias("ib"),
        F.col("m").alias("mb"),
    )
    paired = a.join(
        b, (F.col("label") == F.col("lb")) & (F.col("i") == F.col("ib"))
    )
    return paired.groupBy("label").agg(
        R.r(
            F.sum(F.col("ma") * F.col("mb"))
            / (
                F.sqrt(F.sum(F.col("ma") * F.col("ma")))
                * F.sqrt(F.sum(F.col("mb") * F.col("mb")))
            ),
            4,
        ).alias("centroid_cosine"),
        R.r(F.sqrt(F.sum(F.col("ma") * F.col("ma"))), 4).alias("norm_first"),
        R.r(F.sqrt(F.sum(F.col("mb") * F.col("mb"))), 4).alias(
            "norm_second"
        ),
        R.r(
            F.sqrt(
                F.sum(
                    (F.col("ma") - F.col("mb")) * (F.col("ma") - F.col("mb"))
                )
            ),
            4,
        ).alias("centroid_l2_shift"),
    )


# --- contrastive embedding quality: alignment & uniformity ----------------------
# Wang & Isola (2020)'s two-number health check for a contrastive
# embedding space: ALIGNMENT = mean squared distance between positive
# (same-label) pairs — lower is better — and UNIFORMITY =
# log E[exp(-2·d²)] over ALL pairs — more negative means the space
# spreads mass over the hypersphere instead of collapsing. Computed on
# a FIXED-COUNT hash-ordered sample (the _query_sample pattern, r4 fix
# — the 64 lowest md5-unit vec_ids under salt 'au'): pair volume is a
# CONSTANT 64·63/2 = 2016 at every corpus size, where the original
# vec_id%10 fraction sample grew quadratically (VERDICT r8 #2).
# Determinism (gotcha 13a): d² = 2 - 2·cos with cos an
# integer 1e-8 unit from quantized per-dim dot terms; the alignment
# sum uses integer 1e-8 units of d², and each exp(-2d²) term is
# snapped to an integer 1e-12 unit before the order-free sum (the
# doremi DECIMAL-snapped-exp pattern), so the final ln sees the same
# exact rational on both engines.
_AU_Q = 64  # fixed sample size at every corpus scale
_AU_DIM = 64
_AU_HASH_DUCK = _H.duck_hash_uint(_H.sql_salted("vec_id", "'au'"), 8)

_AU_ORACLE = f"""
WITH samp AS (
    SELECT vec_id, label, embedding FROM embeddings
    ORDER BY {_AU_HASH_DUCK}, vec_id LIMIT {_AU_Q}
),
dims AS MATERIALIZED (
    SELECT vec_id, g.i, embedding[g.i]::DOUBLE AS x
    FROM samp, generate_series(1, {_AU_DIM}) AS g(i)
),
norms AS MATERIALIZED (
    SELECT vec_id, sum(CAST(round(x * x * 100000000) AS BIGINT)) AS q
    FROM dims GROUP BY 1
),
pairs AS MATERIALIZED (
    SELECT a.vec_id AS va, b.vec_id AS vb,
           2.0 - 2.0 * (CAST(round(
               (sum(CAST(round(a.x * b.x * 100000000) AS BIGINT))::DOUBLE
                / 100000000)
               / (sqrt(na.q::DOUBLE / 100000000)
                  * sqrt(nb.q::DOUBLE / 100000000)) * 100000000)
           AS BIGINT)::DOUBLE / 100000000) AS d2
    FROM dims a
    JOIN dims b ON b.i = a.i AND a.vec_id < b.vec_id
    JOIN norms na ON na.vec_id = a.vec_id
    JOIN norms nb ON nb.vec_id = b.vec_id
    GROUP BY a.vec_id, b.vec_id, na.q, nb.q
),
lab AS (
    SELECT p.va, p.vb, p.d2,
           (la.label = lb.label) AS pos,
           CAST(round(p.d2 * 100000000) AS BIGINT) AS d2_u,
           CAST(round(exp(-2.0 * p.d2) * 1000000000000) AS BIGINT) AS e_u
    FROM pairs p
    JOIN samp la ON la.vec_id = p.va
    JOIN samp lb ON lb.vec_id = p.vb
)
SELECT (SELECT count(*) FROM samp)::BIGINT AS n_sample,
       count(*)::BIGINT AS n_pairs,
       sum(CASE WHEN pos THEN 1 ELSE 0 END)::BIGINT AS n_pos_pairs,
       round(sum(CASE WHEN pos THEN d2_u ELSE 0 END) * 1.0
             / sum(CASE WHEN pos THEN 1 ELSE 0 END) / 100000000
             * 1000000) / 1000000 + 0.0 AS alignment,
       round(ln(sum(e_u) * 1.0 / count(*) / 1000000000000) * 1000000)
           / 1000000 + 0.0 AS uniformity
FROM lab
"""


@register("alignment_uniformity_audit", oracle=_AU_ORACLE)
def alignment_uniformity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.storagelevel import StorageLevel

    # fixed-count sample: TakeOrderedAndProject subtree, bounded at
    # any corpus size (never a corpus fraction — VERDICT r8 #2)
    samp = (
        read_table(spark, sf_dir, "embeddings")
        .select(
            "vec_id", "label", A.as_double_array(F.col("embedding")).alias("v")
        )
        .orderBy(_H.hash_uint(F.col("vec_id"), "au", 8), F.asc("vec_id"))
        .limit(_AU_Q)
    )

    def units(term):
        return F.round(term * F.lit(1e8)).cast("long")

    qnorm = F.aggregate(
        F.transform(F.col("v"), lambda x: units(x * x)),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )
    side = samp.select("vec_id", "label", "v", qnorm.alias("q")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    a = side.select(
        F.col("vec_id").alias("va"),
        F.col("label").alias("la"),
        F.col("v").alias("xa"),
        F.col("q").alias("qa"),
    )
    b = side.select(
        F.col("vec_id").alias("vb"),
        F.col("label").alias("lb"),
        F.col("v").alias("xb"),
        F.col("q").alias("qb"),
    )
    qdot = F.aggregate(
        F.zip_with(F.col("xa"), F.col("xb"), lambda x, y: units(x * y)),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )
    cos = (
        F.round(
            (qdot.cast("double") / F.lit(1e8))
            / (
                F.sqrt(F.col("qa").cast("double") / F.lit(1e8))
                * F.sqrt(F.col("qb").cast("double") / F.lit(1e8))
            )
            * F.lit(1e8)
        ).cast("long")
    ).cast("double") / F.lit(1e8)
    d2 = F.lit(2.0) - F.lit(2.0) * cos
    lab = (
        a.join(b, F.col("va") < F.col("vb"))
        .select(
            (F.col("la") == F.col("lb")).alias("pos"),
            F.round(d2 * F.lit(1e8)).cast("long").alias("d2_u"),
            F.round(F.exp(F.lit(-2.0) * d2) * F.lit(1e12))
            .cast("long")
            .alias("e_u"),
        )
    )
    n_sample = side.agg(F.count(F.lit(1)).alias("n_sample"))
    res = lab.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.when(F.col("pos"), 1).otherwise(0))
        .cast("long")
        .alias("n_pos_pairs"),
        F.sum(F.when(F.col("pos"), F.col("d2_u")).otherwise(0)).alias(
            "pos_d2"
        ),
        F.sum("e_u").alias("e_sum"),
    )
    out = res.crossJoin(F.broadcast(n_sample)).select(
        F.col("n_sample").cast("long"),
        "n_pairs",
        "n_pos_pairs",
        R.r(
            F.col("pos_d2").cast("double")
            / F.col("n_pos_pairs")
            / F.lit(1e8),
            6,
        ).alias("alignment"),
        R.r(
            F.log(
                F.col("e_sum").cast("double") / F.col("n_pairs") / F.lit(1e12)
            ),
            6,
        ).alias("uniformity"),
    )
    side.unpersist()
    return out


# --- NDCG of the truncated-embedding ranking --------------------------------
# The graded-relevance complement to matryoshka_truncation_audit
# (set overlap) and ranking_rbo_similarity (rank agreement): NDCG@10
# of the 16-dim-truncated cosine ranking, with gains taken from the
# FULL-dimension cosine (clamped at 0) — "how much of the ideal
# ranking's utility does the cheap ranking keep". Discount constants
# 1/log2(i+1) are PYTHON-COMPUTED double literals embedded in both
# engines (no runtime libm anywhere); every dcg term is
# round(gain·disc·1e8) summed as int64, so NDCG is a ratio of exact
# integers. Same fixed hash-ordered query sample + one corpus pass as
# the MRL audit; ranks from per-query partitioned windows (bounded by
# corpus x Q, never global).
_NDCG_K = 10
_NDCG_DISC = [1.0 / __import__("math").log2(i + 1) for i in range(1, 11)]


def _ndcg_disc_sql(rank_col: str) -> str:
    cases = " ".join(
        f"WHEN {i + 1} THEN {d!r}" for i, d in enumerate(_NDCG_DISC)
    )
    return f"(CASE {rank_col} {cases} END)"


_NDCG_ORACLE = f"""
WITH {{dims}},
q AS (SELECT vec_id AS qid FROM embeddings
      ORDER BY {{qhash}}, vec_id LIMIT {_MRL_Q}),
full_s AS (
    SELECT q.qid, d.vec_id,
           round(sum(d.x * qd.x) / (sqrt(sum(d.x * d.x))
                 * sqrt(sum(qd.x * qd.x))) * 10000) / 10000 + 0.0 AS c
    FROM q
    JOIN dims qd ON qd.vec_id = q.qid
    JOIN dims d ON d.i = qd.i AND d.vec_id <> q.qid
    GROUP BY q.qid, d.vec_id
),
trunc_s AS (
    SELECT q.qid, d.vec_id,
           round(sum(d.x * qd.x) / (sqrt(sum(d.x * d.x))
                 * sqrt(sum(qd.x * qd.x))) * 10000) / 10000 + 0.0 AS c
    FROM q
    JOIN dims qd ON qd.vec_id = q.qid AND qd.i <= {_MRL_DIM}
    JOIN dims d ON d.i = qd.i AND d.vec_id <> q.qid
    GROUP BY q.qid, d.vec_id
),
ranked AS (
    SELECT f.qid, f.vec_id, greatest(0.0, f.c) AS gain,
           row_number() OVER (PARTITION BY f.qid
                              ORDER BY f.c DESC, f.vec_id) AS rf,
           row_number() OVER (PARTITION BY f.qid
                              ORDER BY t.c DESC, t.vec_id) AS rt
    FROM full_s f JOIN trunc_s t
      ON t.qid = f.qid AND t.vec_id = f.vec_id
),
dcg AS (
    SELECT qid,
           sum(CASE WHEN rt <= {_NDCG_K} THEN CAST(round(
               gain * {_ndcg_disc_sql('rt')} * 100000000) AS BIGINT)
               ELSE 0 END) AS dcg_u,
           sum(CASE WHEN rf <= {_NDCG_K} THEN CAST(round(
               gain * {_ndcg_disc_sql('rf')} * 100000000) AS BIGINT)
               ELSE 0 END) AS idcg_u
    FROM ranked GROUP BY qid
)
SELECT qid, dcg_u::BIGINT AS dcg_u, idcg_u::BIGINT AS idcg_u,
       CASE WHEN idcg_u = 0 THEN NULL
            ELSE round(dcg_u * 1.0 / idcg_u * 1000000) / 1000000 + 0.0
       END AS ndcg_at_10
FROM dcg
"""


@register(
    "ndcg_truncation_eval",
    oracle=_NDCG_ORACLE.format(dims=_DIMS_DUCK, qhash=_QS_HASH_DUCK),
)
def ndcg_truncation_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = read_table(spark, sf_dir, "embeddings")
    qdf = _query_sample(
        emb,
        _MRL_Q,
        [
            F.col("vec_id").alias("qid"),
            A.as_double_array(F.col("embedding")).alias("qv"),
        ],
    ).select(
        "qid",
        "qv",
        A.l2_norm(F.col("qv")).alias("nq"),
        F.slice(F.col("qv"), 1, _MRL_DIM).alias("qvt"),
        A.l2_norm(F.slice(F.col("qv"), 1, _MRL_DIM)).alias("nqt"),
    )
    vec = A.as_double_array(F.col("embedding"))
    # full AND truncated norms hoisted out of the Q-way fan-out (r13,
    # guide §1.2) — bit-identical 4dp snaps
    scored = (
        emb.select("vec_id", vec.alias("v"))
        .select(
            "vec_id",
            "v",
            A.l2_norm(F.col("v")).alias("nv"),
            F.slice(F.col("v"), 1, _MRL_DIM).alias("vt"),
            A.l2_norm(F.slice(F.col("v"), 1, _MRL_DIM)).alias("nvt"),
        )
        .crossJoin(F.broadcast(qdf))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            R.r(
                A.cosine_pre(
                    F.col("v"), F.col("qv"), F.col("nv"), F.col("nq")
                ),
                4,
            ).alias("c_full"),
            R.r(
                A.cosine_pre(
                    F.col("vt"), F.col("qvt"), F.col("nvt"), F.col("nqt")
                ),
                4,
            ).alias("c_trunc"),
        )
    )
    wf = Window.partitionBy("qid").orderBy(F.desc("c_full"), F.asc("vec_id"))
    wt = Window.partitionBy("qid").orderBy(
        F.desc("c_trunc"), F.asc("vec_id")
    )
    gain = F.greatest(F.lit(0.0), F.col("c_full"))

    def disc_of(rank_col):
        e = F.when(F.col(rank_col) == 1, F.lit(_NDCG_DISC[0]))
        for i in range(1, _NDCG_K):
            e = e.when(F.col(rank_col) == i + 1, F.lit(_NDCG_DISC[i]))
        return e

    ranked = scored.select(
        "qid",
        gain.alias("gain"),
        F.row_number().over(wf).alias("rf"),
        F.row_number().over(wt).alias("rt"),
    )
    dcg = ranked.groupBy("qid").agg(
        F.sum(
            F.when(
                F.col("rt") <= _NDCG_K,
                F.round(
                    F.col("gain") * disc_of("rt") * F.lit(1e8)
                ).cast("long"),
            ).otherwise(0)
        ).alias("dcg_u"),
        F.sum(
            F.when(
                F.col("rf") <= _NDCG_K,
                F.round(
                    F.col("gain") * disc_of("rf") * F.lit(1e8)
                ).cast("long"),
            ).otherwise(0)
        ).alias("idcg_u"),
    )
    return dcg.select(
        "qid",
        "dcg_u",
        "idcg_u",
        F.when(F.col("idcg_u") == 0, F.lit(None).cast("double"))
        .otherwise(
            R.r(
                F.col("dcg_u").cast("double") / F.col("idcg_u"), 6
            )
        )
        .alias("ndcg_at_10"),
    )


# --- InfoNCE contrastive-loss audit ----------------------------------------------
# The NT-Xent/InfoNCE number (Oord et al. 2018; Chen et al. 2020) a
# contrastive-embedding trainer monitors, computed on the fixed
# 64-vector hash-ordered sample (salt 'nce' — constant 64·63 directed
# pairs at any corpus size, gotcha 14): per anchor, positive = the
# best same-label candidate, loss = ln Σ_j exp(cos_ij/τ) − ln e_pos,
# plus top-1 label accuracy. Determinism: cosines are integer 1e-8
# units (the AU lattice); each exp(cos·5) term is snapped to an
# INTEGER 1e-11 unit (max term exp(5)·1e11 ≈ 1.5e13, 63-term sums
# ≤ 9.3e14 — exact int64 AND exact as double under 2^53), so both
# engines take ln of identical exact rationals; per-anchor losses
# snap to 1e-6 units before the order-free mean. The positive's term
# is max(e_u | same label) — exp is monotone in the integer cosine,
# so the VALUE equals the max-cosine positive's term with no
# tie-break needed; accuracy compares max-same vs max-diff term
# values (ties count as correct on both engines).
_NCE_Q = 64
_NCE_TAU_INV = 5.0  # tau = 0.2
_NCE_HASH_DUCK = _H.duck_hash_uint(_H.sql_salted("vec_id", "'nce'"), 8)

_NCE_ORACLE = f"""
WITH samp AS (
    SELECT vec_id, label, embedding FROM embeddings
    ORDER BY {_NCE_HASH_DUCK}, vec_id LIMIT {_NCE_Q}
),
dims AS MATERIALIZED (
    SELECT vec_id, g.i, embedding[g.i]::DOUBLE AS x
    FROM samp, generate_series(1, {_AU_DIM}) AS g(i)
),
norms AS MATERIALIZED (
    SELECT vec_id, sum(CAST(round(x * x * 100000000) AS BIGINT)) AS q
    FROM dims GROUP BY 1
),
pairs AS MATERIALIZED (
    SELECT a.vec_id AS va, b.vec_id AS vb,
           CAST(round(
               (sum(CAST(round(a.x * b.x * 100000000) AS BIGINT))::DOUBLE
                / 100000000)
               / (sqrt(na.q::DOUBLE / 100000000)
                  * sqrt(nb.q::DOUBLE / 100000000)) * 100000000)
           AS BIGINT) AS cos_u
    FROM dims a
    JOIN dims b ON b.i = a.i AND a.vec_id <> b.vec_id
    JOIN norms na ON na.vec_id = a.vec_id
    JOIN norms nb ON nb.vec_id = b.vec_id
    GROUP BY a.vec_id, b.vec_id, na.q, nb.q
),
terms AS (
    SELECT p.va, (la.label = lb.label) AS same,
           CAST(round(exp((p.cos_u::DOUBLE / 100000000)
                          * {_NCE_TAU_INV}) * 100000000000) AS BIGINT)
               AS e_u
    FROM pairs p
    JOIN samp la ON la.vec_id = p.va
    JOIN samp lb ON lb.vec_id = p.vb
),
anch AS (
    SELECT va,
           sum(e_u)::BIGINT AS sum_e,
           max(CASE WHEN same THEN e_u END)::BIGINT AS pos_e,
           max(CASE WHEN NOT same THEN e_u END)::BIGINT AS neg_e
    FROM terms GROUP BY va
),
loss AS (
    SELECT va,
           CAST(round((ln(sum_e::DOUBLE) - ln(pos_e::DOUBLE)) * 1000000)
                AS BIGINT) AS l_u,
           (pos_e >= coalesce(neg_e, 0)) AS correct
    FROM anch WHERE pos_e IS NOT NULL
)
SELECT count(*)::BIGINT AS n_anchors,
       round(sum(l_u) * 1.0 / count(*) / 1000000 * 10000) / 10000 + 0.0
           AS mean_infonce,
       sum(CASE WHEN correct THEN 1 ELSE 0 END)::BIGINT AS n_top1_correct,
       round(sum(CASE WHEN correct THEN 1 ELSE 0 END) * 10000.0
             / count(*)) / 10000 + 0.0 AS top1_accuracy
FROM loss
"""


@register("infonce_temperature_audit", oracle=_NCE_ORACLE)
def infonce_temperature_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.storagelevel import StorageLevel

    samp = (
        read_table(spark, sf_dir, "embeddings")
        .select(
            "vec_id", "label", A.as_double_array(F.col("embedding")).alias("v")
        )
        .orderBy(_H.hash_uint(F.col("vec_id"), "nce", 8), F.asc("vec_id"))
        .limit(_NCE_Q)
    )

    def units(term):
        return F.round(term * F.lit(1e8)).cast("long")

    qnorm = F.aggregate(
        F.transform(F.col("v"), lambda x: units(x * x)),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )
    side = samp.select("vec_id", "label", "v", qnorm.alias("q")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    a = side.select(
        F.col("vec_id").alias("va"),
        F.col("label").alias("la"),
        F.col("v").alias("xa"),
        F.col("q").alias("qa"),
    )
    b = side.select(
        F.col("vec_id").alias("vb"),
        F.col("label").alias("lb"),
        F.col("v").alias("xb"),
        F.col("q").alias("qb"),
    )
    qdot = F.aggregate(
        F.zip_with(F.col("xa"), F.col("xb"), lambda x, y: units(x * y)),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )
    cos_u = (
        F.round(
            (qdot.cast("double") / F.lit(1e8))
            / (
                F.sqrt(F.col("qa").cast("double") / F.lit(1e8))
                * F.sqrt(F.col("qb").cast("double") / F.lit(1e8))
            )
            * F.lit(1e8)
        ).cast("long")
    )
    e_u = F.round(
        F.exp((cos_u.cast("double") / F.lit(1e8)) * F.lit(_NCE_TAU_INV))
        * F.lit(1e11)
    ).cast("long")
    terms = a.join(b, F.col("va") != F.col("vb")).select(
        "va",
        (F.col("la") == F.col("lb")).alias("same"),
        e_u.alias("e_u"),
    )
    anch = terms.groupBy("va").agg(
        F.sum("e_u").alias("sum_e"),
        F.max(F.when(F.col("same"), F.col("e_u"))).alias("pos_e"),
        F.max(F.when(~F.col("same"), F.col("e_u"))).alias("neg_e"),
    )
    loss = anch.filter(F.col("pos_e").isNotNull()).select(
        F.round(
            (
                F.log(F.col("sum_e").cast("double"))
                - F.log(F.col("pos_e").cast("double"))
            )
            * F.lit(1e6)
        )
        .cast("long")
        .alias("l_u"),
        (F.col("pos_e") >= F.coalesce(F.col("neg_e"), F.lit(0))).alias(
            "correct"
        ),
    )
    out = loss.agg(
        F.count(F.lit(1)).cast("long").alias("n_anchors"),
        R.r(
            F.sum("l_u").cast("double")
            / F.count(F.lit(1))
            / F.lit(1e6),
            4,
        ).alias("mean_infonce"),
        F.sum(F.when(F.col("correct"), 1).otherwise(0))
        .cast("long")
        .alias("n_top1_correct"),
        # mirror the oracle's exact IEEE ordering: round(s*1e4/n)/1e4
        (
            F.round(
                F.sum(F.when(F.col("correct"), 1).otherwise(0))
                * F.lit(10000.0)
                / F.count(F.lit(1))
            )
            / F.lit(10000.0)
            + F.lit(0.0)
        ).alias("top1_accuracy"),
    )
    rows = out.collect()
    side.unpersist()
    return spark.createDataFrame(rows, out.schema)


# --- kernel two-sample test: MMD embedding drift ---------------------------------
# Maximum Mean Discrepancy (Gretton et al. 2012) between two
# embedding slices — the kernel two-sample test a pipeline runs to ask
# "did the embedding distribution drift between groups" where KS/PSI
# only see scalars. Groups = label parity; each side is a FIXED-COUNT
# 32-vector hash-ordered sample (gotcha 14 — constant pair volume).
# Unbiased MMD² = mean_{i≠j∈A} k + mean_{i≠j∈B} k − 2·mean_{A×B} k
# with the RBF kernel k = exp(−d²), d² = 2−2cos on the integer 1e-8
# cosine lattice; every kernel term snaps to an INTEGER 1e-12 unit
# (the AU pattern) so the three means are ratios of exact int64 sums
# with one IEEE division each.
_MMD_Q = 32

_MMD_SAMP = """
samp AS (
    SELECT vec_id, label, embedding,
           (label % 2 = 0) AS grp_a,
           row_number() OVER (
               PARTITION BY label % 2
               ORDER BY ('0x' || substr(md5(vec_id || ':mmd'), 1, 8))::BIGINT,
                        vec_id) AS rn
    FROM embeddings
    QUALIFY rn <= 32
)"""

_MMD_ORACLE = f"""
WITH {_MMD_SAMP},
dims AS MATERIALIZED (
    SELECT vec_id, grp_a, g.i, embedding[g.i]::DOUBLE AS x
    FROM samp, generate_series(1, {_AU_DIM}) AS g(i)
),
norms AS MATERIALIZED (
    SELECT vec_id, sum(CAST(round(x * x * 100000000) AS BIGINT)) AS q
    FROM dims GROUP BY 1
),
pairs AS (
    SELECT a.vec_id AS va, b.vec_id AS vb,
           any_value(a.grp_a) AS ga, any_value(b.grp_a) AS gb,
           CAST(round(exp(-(2.0 - 2.0 * (CAST(round(
               (sum(CAST(round(a.x * b.x * 100000000) AS BIGINT))::DOUBLE
                / 100000000)
               / (sqrt(na.q::DOUBLE / 100000000)
                  * sqrt(nb.q::DOUBLE / 100000000)) * 100000000)
           AS BIGINT)::DOUBLE / 100000000))) * 1000000000000) AS BIGINT)
               AS k_u
    FROM dims a
    JOIN dims b ON b.i = a.i AND a.vec_id <> b.vec_id
    JOIN norms na ON na.vec_id = a.vec_id
    JOIN norms nb ON nb.vec_id = b.vec_id
    GROUP BY a.vec_id, b.vec_id, na.q, nb.q
),
agg AS (
    SELECT sum(CASE WHEN ga AND gb THEN k_u ELSE 0 END)::BIGINT AS saa,
           sum(CASE WHEN ga AND gb THEN 1 ELSE 0 END)::BIGINT AS naa,
           sum(CASE WHEN NOT ga AND NOT gb THEN k_u ELSE 0 END)::BIGINT
               AS sbb,
           sum(CASE WHEN NOT ga AND NOT gb THEN 1 ELSE 0 END)::BIGINT
               AS nbb,
           sum(CASE WHEN ga <> gb THEN k_u ELSE 0 END)::BIGINT AS sab,
           sum(CASE WHEN ga <> gb THEN 1 ELSE 0 END)::BIGINT AS nab
    FROM pairs
)
SELECT (SELECT count(*) FROM samp WHERE grp_a)::BIGINT AS n_a,
       (SELECT count(*) FROM samp WHERE NOT grp_a)::BIGINT AS n_b,
       round(saa * 1.0 / naa / 1000000000000 * 1000000) / 1000000 + 0.0
           AS mean_k_within_a,
       round(sbb * 1.0 / nbb / 1000000000000 * 1000000) / 1000000 + 0.0
           AS mean_k_within_b,
       round(sab * 1.0 / nab / 1000000000000 * 1000000) / 1000000 + 0.0
           AS mean_k_cross,
       round((saa * 1.0 / naa + sbb * 1.0 / nbb - 2.0 * (sab * 1.0 / nab))
             / 1000000000000 * 1000000) / 1000000 + 0.0 AS mmd2
FROM agg
"""


@register("mmd_embedding_drift", oracle=_MMD_ORACLE)
def mmd_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W
    from pyspark.storagelevel import StorageLevel

    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        (F.col("label") % 2 == 0).alias("grp_a"),
        A.as_double_array(F.col("embedding")).alias("v"),
    )
    rn = F.row_number().over(
        W.partitionBy("grp_a").orderBy(
            _H.hash_uint(F.col("vec_id"), "mmd", 8), F.asc("vec_id")
        )
    )
    samp = emb.withColumn("rn", rn).filter(F.col("rn") <= _MMD_Q)

    def units(term):
        return F.round(term * F.lit(1e8)).cast("long")

    qnorm = F.aggregate(
        F.transform(F.col("v"), lambda x: units(x * x)),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )
    side = samp.select(
        "vec_id", "grp_a", "v", qnorm.alias("q")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    a = side.select(
        F.col("vec_id").alias("va"),
        F.col("grp_a").alias("ga"),
        F.col("v").alias("xa"),
        F.col("q").alias("qa"),
    )
    b = side.select(
        F.col("vec_id").alias("vb"),
        F.col("grp_a").alias("gb"),
        F.col("v").alias("xb"),
        F.col("q").alias("qb"),
    )
    qdot = F.aggregate(
        F.zip_with(F.col("xa"), F.col("xb"), lambda x, y: units(x * y)),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )
    cos = (
        F.round(
            (qdot.cast("double") / F.lit(1e8))
            / (
                F.sqrt(F.col("qa").cast("double") / F.lit(1e8))
                * F.sqrt(F.col("qb").cast("double") / F.lit(1e8))
            )
            * F.lit(1e8)
        ).cast("long")
    ).cast("double") / F.lit(1e8)
    k_u = F.round(
        F.exp(-(F.lit(2.0) - F.lit(2.0) * cos)) * F.lit(1e12)
    ).cast("long")
    pairs = a.join(b, F.col("va") != F.col("vb")).select(
        "ga", "gb", k_u.alias("k_u")
    )
    agg = pairs.agg(
        F.sum(F.when(F.col("ga") & F.col("gb"), F.col("k_u")).otherwise(0))
        .alias("saa"),
        F.sum(F.when(F.col("ga") & F.col("gb"), 1).otherwise(0))
        .cast("long")
        .alias("naa"),
        F.sum(
            F.when(~F.col("ga") & ~F.col("gb"), F.col("k_u")).otherwise(0)
        ).alias("sbb"),
        F.sum(F.when(~F.col("ga") & ~F.col("gb"), 1).otherwise(0))
        .cast("long")
        .alias("nbb"),
        F.sum(
            F.when(F.col("ga") != F.col("gb"), F.col("k_u")).otherwise(0)
        ).alias("sab"),
        F.sum(F.when(F.col("ga") != F.col("gb"), 1).otherwise(0))
        .cast("long")
        .alias("nab"),
    )
    ns = side.agg(
        F.sum(F.when(F.col("grp_a"), 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(~F.col("grp_a"), 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
    )
    maa = F.col("saa") * F.lit(1.0) / F.col("naa")
    mbb = F.col("sbb") * F.lit(1.0) / F.col("nbb")
    mab = F.col("sab") * F.lit(1.0) / F.col("nab")
    out = agg.crossJoin(F.broadcast(ns)).select(
        "n_a",
        "n_b",
        R.r(maa / F.lit(1e12), 6).alias("mean_k_within_a"),
        R.r(mbb / F.lit(1e12), 6).alias("mean_k_within_b"),
        R.r(mab / F.lit(1e12), 6).alias("mean_k_cross"),
        R.r(
            (maa + mbb - F.lit(2.0) * mab) / F.lit(1e12), 6
        ).alias("mmd2"),
    )
    rows = out.collect()
    side.unpersist()
    return spark.createDataFrame(rows, out.schema)
