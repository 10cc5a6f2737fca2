"""Round-7 LLM-pipeline text/retrieval operators.

* boilerplate_segment_removal — CCNet-style boilerplate stripping at
  segment granularity: a fixed 10-token segment that appears verbatim
  in MORE THAN ONE document is boilerplate (headers, footers, license
  blurbs) and is removed from every document; per-doc accounting
  reports what a cleaning pass would delete. (The testdata has no
  newlines, so the "line" unit is a fixed token window — the
  doc-frequency machinery is the operator under test and is real.)
* mmr_diversified_topk — Maximal Marginal Relevance (Carbonell &
  Goldstein 1998): greedy top-k re-ranking trading relevance against
  redundancy, score = λ·rel(c) − (1−λ)·max_{s∈S} sim(c,s). The
  shortlist is a distributed TakeOrdered top-20; the 5-step greedy
  selection runs on the collected 20-row shortlist (bounded driver
  state — the kmeans/BPE iterative pattern) and the oracle replays
  the SAME greedy walk with a recursive CTE carrying the selected
  set as a list column.

Determinism (CLAUDE.md gotcha 13a): every cosine is built from
integer-quantized dot terms — round((x·y)·1e8) summed as
integers — so Spark, DuckDB, and the driver-side Python loop all see
bit-identical doubles; MMR argmax ties break on vec_id.

Scale posture: boilerplate is two shuffles of segment-table volume
(segment doc-frequency groupBy + the flag join back) — the
paragraph-dedup shape; MMR is TakeOrdered + O(k·shortlist) driver
work on 20 rows — candidate volume is shortlist-bounded, never
corpus-bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from swat_mapreduce_spark.functions.text import ws_tokens
from swat_mapreduce_spark.queries import register
from swat_mapreduce_spark.queries.curation import _ri, _rp
from swat_mapreduce_spark.sources.readers import read_table

_SEG = 10  # tokens per segment
# oracle-side series cap (docs are a few hundred tokens; the cap only
# bounds the DuckDB lateral-workaround join, never the Spark plan)
_SEG_CAP = 2000

_BOILER_ORACLE = f"""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(trim(text), '\\s+'),
                       x -> len(x) > 0) AS tk
    FROM documents
),
base AS (
    SELECT doc_id, tk, len(tk)::BIGINT AS n_tokens,
           (len(tk) // {_SEG})::BIGINT AS n_segments
    FROM toks
),
segs AS (
    SELECT b.doc_id, g.i AS seg_no,
           array_to_string(b.tk[(g.i*{_SEG}+1):(g.i*{_SEG}+{_SEG})], ' ')
               AS seg
    FROM base b, generate_series(0, {_SEG_CAP}) AS g(i)
    WHERE g.i < b.n_segments
),
df_t AS (
    SELECT seg, count(DISTINCT doc_id) AS df FROM segs GROUP BY 1
),
flagged AS (
    SELECT s.doc_id,
           count(*) FILTER (WHERE d.df >= 2)::BIGINT AS n_boiler,
           min(s.seg_no) FILTER (WHERE d.df >= 2) AS first_boiler_seg
    FROM segs s JOIN df_t d USING (seg)
    GROUP BY 1
)
SELECT b.doc_id, b.n_tokens, b.n_segments,
       coalesce(f.n_boiler, 0)::BIGINT AS n_boiler_segments,
       (b.n_tokens - {_SEG} * coalesce(f.n_boiler, 0))::BIGINT
           AS n_tokens_clean,
       f.first_boiler_seg::BIGINT AS first_boiler_seg
FROM base b LEFT JOIN flagged f USING (doc_id)
"""


@register("boilerplate_segment_removal", oracle=_BOILER_ORACLE)
def boilerplate_segment_removal(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", ws_tokens(F.col("text")).alias("tk")
    )
    base = docs.select(
        "doc_id",
        "tk",
        F.size("tk").cast("long").alias("n_tokens"),
        (F.size("tk").cast("long") / F.lit(_SEG))
        .cast("long")
        .alias("n_segments"),
    )
    # gotcha 10: sequence(0, n-1) descends when n_segments = 0
    idx = F.when(
        F.col("n_segments") >= 1,
        F.sequence(F.lit(0), F.col("n_segments") - 1),
    ).otherwise(F.array().cast("array<bigint>"))
    segs = base.select(
        "doc_id", F.explode(idx).alias("seg_no"), "tk"
    ).select(
        "doc_id",
        "seg_no",
        F.concat_ws(
            " ", F.slice("tk", (F.col("seg_no") * _SEG + 1).cast("int"), _SEG)
        ).alias("seg"),
    )
    segs = segs.persist()
    df_t = segs.groupBy("seg").agg(
        F.count_distinct("doc_id").alias("df")
    )
    flagged = (
        segs.join(df_t, "seg")
        .groupBy("doc_id")
        .agg(
            F.sum(F.when(F.col("df") >= 2, 1).otherwise(0))
            .cast("long")
            .alias("n_boiler"),
            F.min(F.when(F.col("df") >= 2, F.col("seg_no")))
            .cast("long")
            .alias("first_boiler_seg"),
        )
    )
    return (
        base.drop("tk")
        .join(flagged, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            "n_segments",
            F.coalesce("n_boiler", F.lit(0)).alias("n_boiler_segments"),
            (
                F.col("n_tokens")
                - F.lit(_SEG) * F.coalesce("n_boiler", F.lit(0))
            ).alias("n_tokens_clean"),
            "first_boiler_seg",
        )
    )


# --- Maximal Marginal Relevance diversified top-k ------------------------------
_MMR_LAMBDA = 0.7
_MMR_K = 5
_MMR_SHORTLIST = 20
_MMR_DIM = 64

_MMR_ORACLE = f"""
WITH RECURSIVE dims AS (
    SELECT vec_id, g.i, embedding[g.i]::DOUBLE AS x
    FROM embeddings, generate_series(1, {_MMR_DIM}) AS g(i)
),
norms AS (
    SELECT vec_id,
           sqrt(sum(CAST(round((x * x) * 100000000) AS BIGINT))::DOUBLE
                / 100000000) AS nrm
    FROM dims GROUP BY 1
),
qd AS (SELECT i, x FROM dims WHERE vec_id = 0),
rel_t AS (
    SELECT d.vec_id,
           (sum(CAST(round((d.x * q.x) * 100000000) AS BIGINT))::DOUBLE
            / 100000000) / (n.nrm * qn.nrm) AS rel
    FROM dims d JOIN qd q USING (i)
    JOIN norms n ON n.vec_id = d.vec_id
    CROSS JOIN (SELECT nrm FROM norms WHERE vec_id = 0) qn(nrm)
    WHERE d.vec_id <> 0
    GROUP BY d.vec_id, n.nrm, qn.nrm
),
shortlist AS (
    SELECT vec_id, rel FROM rel_t
    ORDER BY rel DESC, vec_id LIMIT {_MMR_SHORTLIST}
),
pairsims AS (
    SELECT a.vec_id AS a, b.vec_id AS b,
           (sum(CAST(round((da.x * db.x) * 100000000) AS BIGINT))::DOUBLE
            / 100000000) / (na.nrm * nb.nrm) AS sim
    FROM shortlist a JOIN shortlist b ON a.vec_id <> b.vec_id
    JOIN dims da ON da.vec_id = a.vec_id
    JOIN dims db ON db.vec_id = b.vec_id AND db.i = da.i
    JOIN norms na ON na.vec_id = a.vec_id
    JOIN norms nb ON nb.vec_id = b.vec_id
    GROUP BY a.vec_id, b.vec_id, na.nrm, nb.nrm
),
sel(step, picked, score, chosen) AS (
    (SELECT 1, vec_id, {_MMR_LAMBDA} * rel, [vec_id]
     FROM shortlist ORDER BY rel DESC, vec_id LIMIT 1)
    UNION ALL
    SELECT s.step + 1, x.vec_id, x.score, list_append(s.chosen, x.vec_id)
    FROM sel s, LATERAL (
        SELECT c.vec_id,
               {_MMR_LAMBDA} * c.rel - {1.0 - _MMR_LAMBDA} * (
                   SELECT max(p.sim) FROM pairsims p
                   WHERE p.a = c.vec_id AND list_contains(s.chosen, p.b)
               ) AS score
        FROM shortlist c
        WHERE NOT list_contains(s.chosen, c.vec_id)
        ORDER BY score DESC, c.vec_id LIMIT 1
    ) x
    WHERE s.step < {_MMR_K}
)
SELECT sel.step::BIGINT AS step, sel.picked AS vec_id,
       round(r.rel * 1000000) / 1000000 + 0.0 AS rel,
       round(sel.score * 1000000) / 1000000 + 0.0 AS mmr_score
FROM sel JOIN rel_t r ON r.vec_id = sel.picked
"""


@register("mmr_diversified_topk", oracle=_MMR_ORACLE)
def mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from swat_mapreduce_spark.functions import arrays as A

    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", A.as_double_array(F.col("embedding")).alias("v")
    )
    qrow = emb.filter(F.col("vec_id") == 0).collect()[0]
    q = [float(x) for x in qrow["v"]]

    def py_dot(a, b):
        return sum(_ri(a[i] * b[i], 8) for i in range(_MMR_DIM)) / 1e8

    def py_nrm(a):
        return math.sqrt(
            sum(_ri(a[i] * a[i], 8) for i in range(_MMR_DIM)) / 1e8
        )

    qn = py_nrm(q)
    q_arr = F.array(*[F.lit(x) for x in q])

    def units(term):
        return F.round(term * F.lit(1e8)).cast("long")

    dot = (
        F.aggregate(
            F.zip_with(F.col("v"), q_arr, lambda x, y: units(x * y)),
            F.lit(0).cast("long"),
            lambda acc, t: acc + t,
        ).cast("double")
        / F.lit(1e8)
    )
    nrm = F.sqrt(
        F.aggregate(
            F.transform(F.col("v"), lambda x: units(x * x)),
            F.lit(0).cast("long"),
            lambda acc, t: acc + t,
        ).cast("double")
        / F.lit(1e8)
    )
    rel = (dot / (nrm * F.lit(qn))).alias("rel")
    shortlist = (
        emb.filter(F.col("vec_id") != 0)
        .select("vec_id", "v", rel)
        .orderBy(F.desc("rel"), F.asc("vec_id"))
        .limit(_MMR_SHORTLIST)
        .collect()
    )
    cands = [
        (int(r["vec_id"]), [float(x) for x in r["v"]], float(r["rel"]))
        for r in shortlist
    ]
    nrms = {cid: py_nrm(v) for cid, v, _ in cands}
    sims = {}
    for cid, cv, _ in cands:
        for did, dv, _ in cands:
            if cid != did:
                sims[(cid, did)] = py_dot(cv, dv) / (nrms[cid] * nrms[did])
    chosen: list[int] = []
    rows = []
    rel_by_id = {cid: r for cid, _, r in cands}
    for step in range(1, _MMR_K + 1):
        best = None
        for cid, _, r in cands:
            if cid in chosen:
                continue
            if chosen:
                red = max(sims[(cid, s)] for s in chosen)
                score = _MMR_LAMBDA * r - (1.0 - _MMR_LAMBDA) * red
            else:
                score = _MMR_LAMBDA * r
            key = (score, -cid)
            if best is None or key > best[0]:
                best = (key, cid, score)
        _, pick, score = best
        chosen.append(pick)
        rows.append(
            (step, pick, _rp(rel_by_id[pick], 6) + 0.0, _rp(score, 6) + 0.0)
        )
    return spark.createDataFrame(
        rows, "step long, vec_id long, rel double, mmr_score double"
    )
