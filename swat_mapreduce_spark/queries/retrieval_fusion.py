"""Hybrid retrieval: Reciprocal Rank Fusion of a lexical (BM25) and a
semantic (embedding-cosine) ranking — the standard hybrid-search
combiner (Cormack, Clarke & Buettcher 2009; the default fusion in
production RAG stacks).

``hybrid_rrf_fusion``: the fixed 3-term BM25 query ranks documents
(formula shared with ``bm25_search_topk`` via
``llm_text4.bm25_scored``); the fixed query vector ranks embeddings
(same cosine shape as ``ann_topk_bruteforce``); each side keeps its
top-50 via TakeOrderedAndProject, the two 50-row lists full-outer
join on doc_id == vec_id (documents without an embedding row — most
of the corpus at sf0.1 — simply score from one list, exactly the
production partial-coverage case), and
RRF(d) = Σ_list 1/(60 + rank_list(d)) picks the fused top-10.

Cross-engine determinism: each 1/(60+r) term is an exact double
division snapped to DECIMAL(12,10) before the sum (CLAUDE.md gotcha
3); ranks come from identically tie-broken orderings (score desc,
id asc).

100 TB posture: both rankings reduce corpus-wide scans straight into
top-50 TakeOrdered cuts (no global sort materializes); the only
partition-less windows number the two 50-row cuts (census
allowlist), and the fusion join moves 100 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from swat_mapreduce_spark.functions import arrays as A
from swat_mapreduce_spark.functions import rounding as R
from swat_mapreduce_spark.queries import register
from swat_mapreduce_spark.queries.llm_text4 import bm25_scored, bm25_scored_sql
from swat_mapreduce_spark.queries.similarity import _DIMS_DUCK, QUERY_VEC_ID
from swat_mapreduce_spark.sources.readers import read_table

_TOPN = 50
_RRF_K = 60

_RRF_ORACLE = f"""
WITH {bm25_scored_sql()},
lex AS (
    SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r
    FROM bm25_scored
    QUALIFY r <= {_TOPN}
),
{_DIMS_DUCK},
q AS (SELECT i, x AS qx FROM dims WHERE vec_id = {QUERY_VEC_ID}),
sem_sc AS (
    SELECT d.vec_id,
           round(sum(d.x * q.qx) / (sqrt(sum(d.x * d.x))
                 * sqrt(sum(q.qx * q.qx))) * 10000) / 10000 + 0.0 AS cosine
    FROM dims d JOIN q ON d.i = q.i
    WHERE d.vec_id <> {QUERY_VEC_ID}
    GROUP BY d.vec_id
),
sem AS (
    SELECT vec_id, row_number() OVER (ORDER BY cosine DESC, vec_id) AS r
    FROM sem_sc
    QUALIFY r <= {_TOPN}
),
fused AS (
    SELECT coalesce(l.doc_id, s.vec_id) AS doc_id,
           l.r AS r_lex, s.r AS r_sem,
           coalesce(CAST(round(1.0 / ({_RRF_K} + l.r) * 100000000)
                         / 100000000 AS DECIMAL(12,10)),
                    CAST(0 AS DECIMAL(12,10)))
         + coalesce(CAST(round(1.0 / ({_RRF_K} + s.r) * 100000000)
                         / 100000000 AS DECIMAL(12,10)),
                    CAST(0 AS DECIMAL(12,10))) AS rrf
    FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.vec_id
)
SELECT doc_id, r_lex, r_sem,
       round(rrf::DOUBLE * 1000000) / 1000000 + 0.0 AS rrf_score
FROM fused
ORDER BY rrf DESC, doc_id
LIMIT 10
"""


@register("hybrid_rrf_fusion", oracle=_RRF_ORACLE)
def hybrid_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    emb = read_table(spark, sf_dir, "embeddings")
    dec = "decimal(12,10)"

    lex50 = (
        bm25_scored(docs)
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(_TOPN)
    )
    wl = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    lex = lex50.select(
        "doc_id", F.row_number().over(wl).cast("long").alias("r_lex")
    )

    qdf = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        A.as_double_array(F.col("embedding")).alias("qv")
    )
    sem_sc = (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(qdf))
        .select(
            "vec_id",
            R.r(
                A.cosine(A.as_double_array(F.col("embedding")), F.col("qv")),
                4,
            ).alias("cosine"),
        )
    )
    sem50 = sem_sc.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(_TOPN)
    ws = Window.orderBy(F.desc("cosine"), F.asc("vec_id"))
    sem = sem50.select(
        "vec_id", F.row_number().over(ws).cast("long").alias("r_sem")
    )

    def term(rank_col):
        return F.coalesce(
            R.r(F.lit(1.0) / (F.lit(_RRF_K) + rank_col), 8).cast(dec),
            F.lit(0).cast(dec),
        )

    fused = lex.join(sem, lex.doc_id == sem.vec_id, "full_outer").select(
        F.coalesce(F.col("doc_id"), F.col("vec_id")).alias("doc_id"),
        "r_lex",
        "r_sem",
        (term(F.col("r_lex")) + term(F.col("r_sem"))).alias("rrf"),
    )
    return (
        fused.orderBy(F.desc("rrf"), F.asc("doc_id"))
        .limit(10)
        .select(
            "doc_id",
            "r_lex",
            "r_sem",
            R.r(F.col("rrf").cast("double"), 6).alias("rrf_score"),
        )
    )
