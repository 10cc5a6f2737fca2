"""Multimodal-column queries. Metadata extraction has a DuckDB oracle
(digests over the same bytes); the mapInPandas decode stage is
rows-only (non-SQL-expressible) but deterministic — pytest asserts its
values independently."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from swat_mapreduce_spark.operators import multimodal as M
from swat_mapreduce_spark.queries import register
from swat_mapreduce_spark.sources.readers import read_table

# DuckDB's sha256/md5 over VARCHAR hash the UTF-8 bytes — identical to
# Spark hashing the encoded binary payload.
_META_ORACLE = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       sha256(text) AS sha256,
       md5(text) AS payload_md5
FROM documents
"""


@register("multimodal_meta", oracle=_META_ORACLE)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return M.with_binary_payload(docs).drop("payload")


# The fake decode is pure md5 arithmetic over the payload bytes
# (operators/multimodal.py:_fake_decode): digest bytes h[0],h[1],h[2]
# are hex chars 1-2 / 3-4 / 5-6 of md5(text) — fully DuckDB-expressible,
# so the mapInPandas stage gets a real value oracle, not rows-only.
_DECODE_ORACLE = """
SELECT doc_id,
       (64 + ('0x' || substr(md5(text), 1, 2))::INT % 192)::INT AS width,
       (64 + ('0x' || substr(md5(text), 3, 2))::INT % 192)::INT AS height,
       3::INT AS channels,
       ('0x' || substr(md5(text), 5, 2))::INT / 255.0 AS mean_pixel
FROM documents
"""


@register("multimodal_decode_features", oracle=_DECODE_ORACLE)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return M.fake_decode_features(M.with_binary_payload(docs))


# Frame sampling IS SQL-expressible over the char-sequence stand-in
# (substr slicing), so the mapInPandas 1→N stage gets a full value
# oracle: same frames, same md5, same mean-code-point brightness.
_FRAMES_ORACLE = f"""
WITH f AS (
    SELECT doc_id, text,
           unnest(range(0, len(text) // {M.FRAME_SIZE}, {M.FRAME_STRIDE}))
               AS frame_idx
    FROM documents
),
frames AS (
    SELECT doc_id, frame_idx,
           substr(text, frame_idx * {M.FRAME_SIZE} + 1, {M.FRAME_SIZE})
               AS frame
    FROM f
)
SELECT doc_id, frame_idx::INT AS frame_idx, md5(frame) AS frame_md5,
       (SELECT sum(unicode(c)) FROM unnest(string_split_regex(frame, ''))
            AS u(c)) / {M.FRAME_SIZE}.0 AS brightness
FROM frames
"""


@register("multimodal_frame_sample", oracle=_FRAMES_ORACLE)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return M.sample_frames(docs)


# Audio-style windowed features over the char-code "waveform": RMS and
# zero-crossing rate per overlapping 64-sample frame. All math is
# exact-int sums + one division + sqrt (IEEE-correctly-rounded), so
# the mapInPandas stage gets a full value oracle.
_AUDIO_ORACLE = f"""
WITH f AS (
    SELECT doc_id, text,
           unnest(range(0, (length(text) - {M.AUDIO_FRAME}) // {M.AUDIO_STRIDE}
                           + 1)) AS frame_idx
    FROM documents
    WHERE length(text) >= {M.AUDIO_FRAME}
),
w AS (
    SELECT doc_id, frame_idx,
           list_transform(
               string_split_regex(
                   substr(text, frame_idx * {M.AUDIO_STRIDE} + 1,
                          {M.AUDIO_FRAME}), ''),
               c -> unicode(c) - {M.AUDIO_CENTER}) AS s
    FROM f
)
SELECT doc_id, frame_idx::INT AS frame_idx,
       round(sqrt(list_sum(list_transform(s, x -> x * x))
                  / {M.AUDIO_FRAME}), 4) AS rms,
       round(len(list_filter(
                 list_apply(range(1, {M.AUDIO_FRAME}),
                            i -> s[i] * s[i + 1]),
                 p -> p < 0))::DOUBLE / {M.AUDIO_FRAME - 1}, 4)
           AS zero_crossing_rate
FROM w
"""


@register("multimodal_audio_energy", oracle=_AUDIO_ORACLE)
def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from swat_mapreduce_spark.functions import rounding as R
    from pyspark.sql import functions as F

    docs = read_table(spark, sf_dir, "documents")
    feats = M.audio_frame_energy(docs)
    return feats.select(
        "doc_id",
        "frame_idx",
        R.r("rms", 4).alias("rms"),
        R.r("zero_crossing_rate", 4).alias("zero_crossing_rate"),
    )


# --- video scene-cut detection ---------------------------------------------
# Temporal segmentation over the sampled frame stream: a cut is a
# frame whose brightness jumps >= CUT_THRESH from the previous sampled
# frame (per doc, frame order). One window shuffle keyed by doc_id on
# top of the narrow frame-sampling stage; brightness is an exact
# integer-sum / 64 double in both engines, so the threshold compare
# never straddles an ulp.

_CUT_THRESH = 4.0

_SCENE_CUTS_ORACLE = f"""
WITH f AS (
    SELECT doc_id, text,
           unnest(range(0, len(text) // {M.FRAME_SIZE}, {M.FRAME_STRIDE}))
               AS frame_idx
    FROM documents
),
frames AS (
    SELECT doc_id, frame_idx,
           (SELECT sum(unicode(c))
            FROM unnest(string_split_regex(
                substr(text, frame_idx * {M.FRAME_SIZE} + 1,
                       {M.FRAME_SIZE}), '')) AS u(c)
           ) / {M.FRAME_SIZE}.0 AS brightness
    FROM f
),
d AS (
    SELECT doc_id, frame_idx, brightness,
           abs(brightness - lag(brightness) OVER (
               PARTITION BY doc_id ORDER BY frame_idx)) AS delta
    FROM frames
)
SELECT doc_id,
       count(*) AS n_frames,
       count(*) FILTER (WHERE delta >= {_CUT_THRESH}) AS n_cuts,
       round(coalesce(max(delta), 0.0), 4) AS max_delta
FROM d GROUP BY doc_id
"""


@register("multimodal_scene_cuts", oracle=_SCENE_CUTS_ORACLE)
def multimodal_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from swat_mapreduce_spark.functions import rounding as R

    docs = read_table(spark, sf_dir, "documents")
    frames = M.sample_frames(docs)
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    delta = F.abs(
        F.col("brightness") - F.lag("brightness").over(w)
    )
    with_delta = frames.withColumn("delta", delta)
    return with_delta.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        # when/otherwise, not a bare cast: a single-frame doc has only
        # a NULL delta, and sum over all-NULL yields NULL where the
        # oracle's FILTER count yields 0
        F.sum(
            F.when(F.col("delta") >= _CUT_THRESH, F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
        ).alias("n_cuts"),
        R.r(F.coalesce(F.max("delta"), F.lit(0.0)), 4).alias("max_delta"),
    )


# --- modality coverage audit -----------------------------------------------
# The multimodal-curation bookkeeping query: which text documents have
# a paired embedding row (vec_id == doc_id) and which are text-only,
# per source — the "missing modality" audit run before training-mix
# assembly. Left join on ids + conditional counts; the embedding side
# projects only its key, so the join never moves vector payloads.

_MODALITY_ORACLE = """
SELECT d.source,
       count(*) AS n_docs,
       count(e.vec_id) AS n_with_embedding,
       count(*) - count(e.vec_id) AS n_text_only
FROM documents d
LEFT JOIN embeddings e ON d.doc_id = e.vec_id
GROUP BY d.source
"""


@register("modality_coverage_join", oracle=_MODALITY_ORACLE)
def modality_coverage_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "source")
    emb = read_table(spark, sf_dir, "embeddings").select("vec_id")
    joined = docs.join(emb, docs.doc_id == emb.vec_id, "left")
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count("vec_id").alias("n_with_embedding"),
        (F.count(F.lit(1)) - F.count("vec_id")).alias("n_text_only"),
    )
